"""Unit tests for the XY-cut layout branch (no Spark)."""

from final_ocr_spark.extract.layout_xycut import extract_pdf_tokens


def _tok(word, x, y, w=None, h=10.0):
    w = w if w is not None else 6.0 * len(word)
    return f"{word} {x} {y} {x + w} {y + h}"


def test_single_column_reading_order():
    lines = ["%PDFTOK 1",
             _tok("alpha", 60, 60), _tok("beta", 94, 60),
             _tok("gamma", 60, 74), _tok("delta", 94, 74)]
    text, spans, n = extract_pdf_tokens("\n".join(lines).encode())
    assert text == "alpha beta gamma delta"
    assert n == 1


def test_two_columns_left_before_right():
    lines = ["%PDFTOK 1",
             # left column
             _tok("L1", 60, 60), _tok("L2", 60, 74),
             # right column (big x gap)
             _tok("R1", 400, 60), _tok("R2", 400, 74)]
    text, _, _ = extract_pdf_tokens("\n".join(lines).encode())
    assert text.index("L1") < text.index("L2") < text.index("R1") < text.index("R2")


def test_paragraph_gap_splits_blocks():
    lines = ["%PDFTOK 1",
             _tok("para1", 60, 60),
             _tok("para2", 60, 140)]  # 70pt gap >> 1.8×line height
    text, spans, n = extract_pdf_tokens("\n".join(lines).encode())
    assert text == "para1\npara2"
    assert n == 2


def test_hyphenation_merge():
    lines = ["%PDFTOK 1",
             _tok("exam-", 60, 60),
             _tok("ple", 60, 74)]
    text, _, _ = extract_pdf_tokens("\n".join(lines).encode())
    assert text == "example"


def test_malformed_lines_skipped():
    data = b"%PDFTOK 1\nnot enough fields\nword 1 2 3 notafloat\n" + _tok("ok", 60, 60).encode()
    text, _, _ = extract_pdf_tokens(data)
    assert text == "ok"


def test_empty_payload():
    text, spans, n = extract_pdf_tokens(b"%PDFTOK 1\n")
    assert text == "" and spans == [] and n == 0


def test_numpy_fast_path_differential_fuzz():
    """The numpy XY-cut must be BYTE-IDENTICAL to the pure-Python reference
    spec over a large synthetic layout corpus (multi-column, tables,
    hyphenation, malformed lines) — this is the guarantee that lets the
    fast path stand behind the frozen extraction goldens."""
    from final_ocr_spark.extract.layout_xycut import (
        extract_pdf_tokens, extract_pdf_tokens_ref)
    from final_ocr_spark.sources.synthetic_pages import LANGS, _gen_pdftok
    import random

    for i in range(400):
        rng = random.Random(1000 + i)
        lang = LANGS[i % len(LANGS)]
        data, _plain = _gen_pdftok(rng, lang, size_mult=1 + (i % 4) * 3)
        assert extract_pdf_tokens(data) == extract_pdf_tokens_ref(data), i

    # malformed payloads: truncation mid-line, junk coords, empty body,
    # and non-finite coordinates (float() parses 'nan'/'inf'; both paths
    # must reject those tokens identically — NaN geometry is ill-defined)
    base, _ = _gen_pdftok(random.Random(7), "en", 2)
    for payload in (base[: len(base) // 2],
                    b"%PDFTOK 1\nword 1 2 3 zzz\nok 0 0 5 5\n",
                    b"%PDFTOK 1\n",
                    b"%PDFTOK 1\n  \n\n",
                    b"%PDFTOK 1\nalpha 0 0 10 10\nweird nan 0 nan 10\n"
                    b"beta 100 0 110 10\ngamma 0 40 10 50\ndelta 100 40 110 50\n",
                    b"%PDFTOK 1\na inf 0 5 5\nb 0 0 5 5\nc -inf 9 9 nan\n"):
        assert extract_pdf_tokens(payload) == extract_pdf_tokens_ref(payload)

    # NaN tokens are dropped, not routed into one side of a cut
    t, _, _ = extract_pdf_tokens(
        b"%PDFTOK 1\nalpha 0 0 10 10\nweird nan 0 nan 10\nbeta 100 0 110 10\n")
    assert "weird" not in t and "alpha" in t and "beta" in t


def test_largest_gap_np_equals_spec_hypothesis():
    """Property: the vectorized gap finder equals the pure-Python spec on
    arbitrary finite interval lists (duplicates, overlaps, negatives,
    zero-width, equal starts with different ends)."""
    from hypothesis import given, settings, strategies as st

    from final_ocr_spark.extract.layout_xycut import (
        _largest_gap, _largest_gap_np)
    import numpy as np

    finite = st.floats(-1e6, 1e6, allow_nan=False, allow_infinity=False)

    @settings(max_examples=300, deadline=None)
    @given(st.lists(st.tuples(finite, finite), max_size=40),
           st.sampled_from([0.5, 14.0, 40.0]))
    def prop(pairs, min_gap):
        ivs = [(min(a, b), max(a, b)) for a, b in pairs]
        ref = _largest_gap(ivs, min_gap)
        s = np.array([a for a, _ in ivs], dtype=np.float64)
        e = np.array([b for _, b in ivs], dtype=np.float64)
        got = _largest_gap_np(s, e, min_gap)
        if ref is None:
            assert got is None
        else:
            assert got is not None and float(got) == ref  # bit-identical

    prop()
