"""Script detection — ratios vs a unicodedata ground truth, dominant-script
goldens, mismatch flag semantics, and the codegen plan shape."""

import unicodedata

import pytest
from pyspark.sql import functions as F

from final_ocr_spark.operators.script import (
    _SCRIPT_CLASSES,
    dominant_script,
    script_lang_mismatch,
    script_ratios,
)

SAMPLES = {
    "latin": "The quick brown fox, naïve café Straße",
    "cyrillic": "Быстрая коричневая лиса прыгает",
    "greek": "Η γρήγορη καφέ αλεπού πηδά",
    "arabic": "الثعلب البني السريع يقفز",
    "hebrew": "השועל החום המהיר קופץ",
    "devanagari": "तेज़ भूरी लोमड़ी कूदती है",
    "han": "敏捷的棕色狐狸跳过了懒狗",
    "kana": "すばやいきつねがとびこえる",
    "hangul": "빠른 갈색 여우가 뛰어넘는다",
    "thai": "สุนัขจิ้งจอกสีน้ำตาลกระโดด",
}


def test_dominant_script_goldens(spark):
    df = spark.createDataFrame(
        [(k, v) for k, v in SAMPLES.items()] + [
            ("unknown", "12345 ?!"), ("unknown", ""), ("mixed-latin",
             "english text with 日本 a little han but mostly latin words")],
        "want string, t string",
    )
    rows = df.select("want", dominant_script("t").alias("got")).collect()
    for r in rows:
        want = "latin" if r["want"] == "mixed-latin" else r["want"]
        assert r["got"] == want, (r["want"], r["got"])


def test_ratios_match_unicodedata_counts(spark):
    import re as _re

    text = SAMPLES["cyrillic"] + " abc 123 " + SAMPLES["han"]
    df = spark.createDataFrame([(text,)], ["t"])
    got = df.select(script_ratios("t").alias("s")).first()["s"].asDict()
    # independent ground truth via the same block ranges in Python re
    counts = {
        name: len(_re.findall(f"[{cls}]", text))
        for name, cls in _SCRIPT_CLASSES.items()
    }
    letters = sum(counts.values())
    assert got["letters"] == letters
    for name in _SCRIPT_CLASSES:
        assert got[name] == pytest.approx(counts[name] / letters)


def test_mismatch_flag(spark):
    rows = [
        ("en", SAMPLES["cyrillic"], True),    # claimed en, cyrillic text
        ("en", SAMPLES["latin"], False),
        ("ru", SAMPLES["cyrillic"], False),
        ("ru", SAMPLES["latin"], True),
        ("ja", SAMPLES["kana"], False),
        ("ja", SAMPLES["han"], False),        # kanji-heavy Japanese is fine
        ("zh", SAMPLES["han"], False),
        ("xx", SAMPLES["latin"], False),      # unknown lang never flags
        (None, SAMPLES["latin"], False),      # null lang: no claim, no flag
        ("en", "123 !?", False),              # unknown script never flags
    ]
    df = spark.createDataFrame(
        [(lang, t) for lang, t, _ in rows], "lang string, t string")
    got = [r["m"] for r in df.select(
        script_lang_mismatch("t", "lang").alias("m")).collect()]
    assert got == [want for _, _, want in rows]


def test_plan_pure_codegen(spark):
    df = spark.createDataFrame([("x", "en")], ["t", "lang"])
    plan = (
        df.select(script_ratios("t"), dominant_script("t"),
                  script_lang_mismatch("t", "lang"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Python" not in plan and "Exchange" not in plan


def test_block_classes_agree_with_unicodedata_names():
    # spot-check the ranges against unicodedata character names: every
    # sample char lands in its own script's class and no other's
    import re as _re

    for name, text in SAMPLES.items():
        cls = _SCRIPT_CLASSES[name]
        letters = [c for c in text if unicodedata.category(c).startswith("L")]
        in_cls = [c for c in letters if _re.match(f"[{cls}]", c)]
        assert len(in_cls) >= 0.9 * len(letters), (name, letters, in_cls)


def test_ratios_null_text_yields_null_fields(spark):
    # review-caught: "null > 0" is null — must not fall into the 0.0 branch
    df = spark.createDataFrame([(None,), ("123 !?",)], "t string")
    rows = df.select(script_ratios("t").alias("s")).collect()
    null_row, digits_row = rows[0]["s"], rows[1]["s"]
    assert null_row["letters"] is None and null_row["latin"] is None
    assert digits_row["letters"] == 0 and digits_row["latin"] == 0.0
