"""Unit tests for the HTML main-content extractor (no Spark) — the
manual-text-bypass analog (ocr.py:1232-1261, SURVEY §5.2)."""

from final_ocr_spark.extract.html_main import extract_html

ARTICLE = (
    b"<html><head><title>Doc Title</title><script>var x=1;</script>"
    b"<style>.x{}</style></head><body>"
    b"<nav><a href='/a'>one</a> <a href='/b'>two</a> <a href='/c'>three</a></nav>"
    b"<article><h1>The Real Headline</h1>"
    b"<p>This is the first substantive paragraph of the article body with enough "
    b"characters to pass the density gate easily.</p>"
    b"<p>A second paragraph, also long enough to be kept by the scorer without "
    b"any special treatment at all.</p></article>"
    b"<footer><a href='/tos'>terms</a> copyright</footer>"
    b"</body></html>"
)


def test_boilerplate_stripped():
    text, spans, n = extract_html(ARTICLE)
    assert "first substantive paragraph" in text
    assert "second paragraph" in text
    assert "one" != text[:3]  # nav links gone
    assert "/tos" not in text and "terms" not in text and "copyright" not in text
    assert "var x=1" not in text and ".x{}" not in text


def test_title_and_spans():
    text, spans, n = extract_html(ARTICLE)
    assert text.startswith("The Real Headline")
    kinds = [k for _, _, k in spans]
    assert kinds[0] == "title"
    # spans index into the text exactly
    for s, e, _k in spans:
        assert 0 <= s < e <= len(text)
        assert text[s:e] == text[s:e].strip()


def test_title_fallback_to_title_tag():
    html = (b"<html><head><title>Only Title</title></head><body>"
            b"<p>Body paragraph long enough to be kept by the density scorer "
            b"for sure, with many words in it.</p></body></html>")
    text, spans, _ = extract_html(html)
    assert text.splitlines()[0] == "Only Title"
    assert spans[0][2] == "title"


def test_malformed_truncated_no_crash():
    text, spans, _ = extract_html(ARTICLE[: len(ARTICLE) // 2])
    assert isinstance(text, str)  # tolerates truncation
    text2, _, _ = extract_html(b"<p>unclosed <div><p>nested mess")
    assert isinstance(text2, str)


def test_entities_decoded():
    html = (b"<html><body><p>Fish &amp; chips &raquo; caf\xc3\xa9 menu with "
            b"plenty of additional words to satisfy the minimum block size.</p>"
            b"</body></html>")
    text, _, _ = extract_html(html)
    assert "Fish & chips" in text
    assert "café" in text


def test_link_density_drops_linkfarm():
    html = (b"<html><body><div>"
            + b" ".join(
                b'<a href="/l%d">link text number %d here</a>' % (i, i)
                for i in range(20)
            )
            + b"</div><p>Real content paragraph that is long enough to stay in "
              b"the output after scoring, clearly.</p></body></html>")
    text, _, _ = extract_html(html)
    assert "Real content paragraph" in text
    assert "link text number 7" not in text


def test_whitespace_canonicalization():
    html = (b"<html><body><p>  spaced    out\n\n   words   in a paragraph long "
            b"enough to be kept by the density scorer anyway  </p></body></html>")
    text, _, _ = extract_html(html)
    assert "spaced out words" in text
    assert "  " not in text


def test_deterministic():
    assert extract_html(ARTICLE) == extract_html(ARTICLE)
