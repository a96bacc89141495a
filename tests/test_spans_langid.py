"""Unit tests for value-span labeling and language ID (no Spark)."""

from final_ocr_spark.extract.langid import detect_lang
from final_ocr_spark.extract.spans import label_value_spans


def test_date_id_amount_spans():
    text = "Invoice 10942693 dated 04/13/2013 total $ 6,204.19 due"
    spans = label_value_spans(text)
    kinds = {k for _, _, k in spans}
    assert kinds == {"date", "id", "amount"}
    for s, e, k in spans:
        frag = text[s:e]
        if k == "date":
            assert frag == "04/13/2013"
        if k == "id":
            assert frag == "10942693"
        if k == "amount":
            assert frag == "$ 6,204.19"


def test_spans_non_overlapping_and_sorted():
    text = "2024-01-02 123456789 99,999.99 and 1.5 more 12/31/99"
    spans = label_value_spans(text)
    for (s1, e1, _), (s2, e2, _) in zip(spans, spans[1:]):
        assert e1 <= s2  # sorted, no overlap


def test_date_precedence_over_id():
    # an 8-digit-adjacent date string must label as date, not id
    spans = label_value_spans("shipped 12/31/2024 ok")
    assert [k for _, _, k in spans] == ["date"]


def test_langid_scripts():
    assert detect_lang("这是一个中文测试文档 内容很多 " * 5) == "zh"
    assert detect_lang("هذا نص عربي طويل للاختبار " * 5) == "ar"
    assert detect_lang("это русский текст для проверки " * 5) == "ru"


def test_langid_stopwords():
    assert detect_lang("the cat sat on the mat and it was happy with all of this") == "en"
    assert detect_lang("der hund ist nicht in dem haus und die katze auch nicht") == "de"
    assert detect_lang("el perro y el gato en la casa de los abuelos por la tarde") == "es"


def test_langid_empty():
    assert detect_lang("") == "und"
    assert detect_lang("12345 67890") == "und"


def test_spans_unicode_digits_match_naive():
    """Round-2 review regression: the window prescan must cover Unicode
    digits (\\d), not just ASCII — spans in Arabic-Indic or fullwidth
    digits used to fall outside every window and vanish. Cross-checked
    against a windowless naive implementation over mixed corpora."""
    import bisect
    import re

    from final_ocr_spark.extract.spans import AMOUNT_RE, DATE_RE, ID_RE

    def naive(text):
        out, accepted = [], []
        for rx, kind in [(DATE_RE, "date"), (ID_RE, "id"), (AMOUNT_RE, "amount")]:
            for m in rx.finditer(text):
                s, e = m.span()
                if any(s < ae and as_ < e for as_, ae in accepted):
                    continue
                accepted.append((s, e))
                out.append((s, e, kind))
            accepted.sort()
        return sorted(out)

    cases = [
        "invoice ١٢٣٤٥٦ total",   # Arabic-Indic id
        "date ２０２４-０１-０２ end",  # fullwidth
        "mixed 123456 and ۱۲۳۴۵۶ ids",  # ext Arabic
        "plain 2024-01-02 $1,234.56 and 987654 tail",
        "no digits at all here",
    ]
    for text in cases:
        assert label_value_spans(text) == naive(text), text
    # the Arabic-Indic id must actually be FOUND (the old ASCII window lost it)
    assert label_value_spans(cases[0]) != []
