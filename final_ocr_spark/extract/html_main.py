"""HTML main-content extraction: boilerplate stripping via text/link density.

Generalizes the reference's OCR text-recovery stage (extract_text_from_image,
ocr.py:45-98; multi-config best-of at ocr2.py:143-183) to web pages: instead of
Tesseract over a raster, we score DOM text blocks with Arc90/Boilerpipe-style
text-density + link-density features, smooth the block-score curve CETR-style
(neighbour window), and keep high-density low-link blocks as main content.

Design constraints (SURVEY §7 step 1, "hard parts"):

* stdlib ``html.parser`` only (lxml unavailable in sandbox); the parser below
  is a *streaming block segmenter* — it never requires balanced tags, so
  malformed Common-Crawl HTML (truncation, unclosed tags) degrades gracefully
  instead of erroring (mirrors the reference's per-doc error swallowing,
  ocr2.py:549-551).
* Fully deterministic: one canonical text-assembly spec — inline whitespace
  collapsed to single spaces, blocks joined by ``"\\n"``, no trailing
  whitespace — frozen by golden fixtures (byte-identity contract).
* Pure function of bytes: no clocks, no env, no randomness.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from html.parser import HTMLParser

# Tags whose entire subtree is never content.
_SKIP_TAGS = frozenset(
    {"script", "style", "noscript", "template", "svg", "head", "iframe", "object"}
)
# Structural boilerplate containers: contents are penalized, not hard-dropped
# (real pages occasionally put content in them; density still has to win).
_CHROME_TAGS = frozenset({"nav", "header", "footer", "aside"})
# Tags that open/close a text block.
_BLOCK_TAGS = frozenset(
    {
        "p", "div", "article", "section", "main", "body",
        "h1", "h2", "h3", "h4", "h5", "h6",
        "li", "ul", "ol", "dl", "dt", "dd",
        "table", "tr", "td", "th", "thead", "tbody",
        "blockquote", "pre", "figure", "figcaption", "br", "hr",
    }
)
# Void elements (never pushed on the open stack).
_VOID_TAGS = frozenset(
    {"br", "hr", "img", "input", "meta", "link", "area", "base", "col",
     "embed", "source", "track", "wbr"}
)

# Scoring thresholds — the engine's single pinned config (the reference's
# analogue is the clipLimit disagreement between variants, ocr.py:26 vs
# ocr2.py:93; we pin ONE value set and freeze it in goldens).
MIN_BLOCK_CHARS = 25
MAX_LINK_DENSITY = 0.33
MIN_TEXT_DENSITY = 8.0  # chars per tag within the block
SMOOTH_KEEP_BONUS = 0.5  # neighbour-keep weight in the CETR-style pass


@dataclass
class _Block:
    kind: str  # 'title' | 'heading' | 'paragraph' | 'list' | 'pre'
    chrome_depth: int  # >0 ⇒ inside nav/header/footer/aside
    pieces: list[str] = field(default_factory=list)
    link_chars: int = 0
    tag_count: int = 1
    _text: str | None = None

    def text(self) -> str:
        # canonical inline-whitespace collapse (assembly spec, frozen);
        # memoized — scoring/smoothing/assembly each re-read it
        if self._text is None:
            self._text = " ".join("".join(self.pieces).split())
        return self._text


class _BlockSegmenter(HTMLParser):
    """Streaming tolerant parse → flat sequence of scored text blocks."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[_Block] = []
        self.title_text: list[str] = []
        self._cur: _Block | None = None
        self._skip_depth = 0
        self._chrome_depth = 0
        self._link_depth = 0
        self._in_title = False
        self._pre_depth = 0

    # -- block lifecycle -------------------------------------------------
    def _open_block(self, tag: str) -> None:
        self._flush()
        if tag == "h1":
            kind = "title"
        elif tag in ("h2", "h3", "h4", "h5", "h6"):
            kind = "heading"
        elif tag in ("li", "dt", "dd"):
            kind = "list"
        elif tag == "pre":
            kind = "pre"
        else:
            kind = "paragraph"
        self._cur = _Block(kind=kind, chrome_depth=self._chrome_depth)

    def _flush(self) -> None:
        b = self._cur
        self._cur = None
        # pieces-empty fast path: text() would build "" through join+split
        if b is not None and b.pieces and b.text():
            self.blocks.append(b)

    # -- HTMLParser hooks ------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _SKIP_TAGS:
            if tag != "head":  # head handled leniently: title inside is kept
                self._skip_depth += 1
            return
        if self._skip_depth:
            return
        if tag == "title":
            self._in_title = True
            return
        if tag in _CHROME_TAGS:
            self._chrome_depth += 1
        if tag == "a":
            self._link_depth += 1
        if tag == "pre":
            self._pre_depth += 1
        if tag in _BLOCK_TAGS:
            self._open_block(tag)
        elif self._cur is not None:
            self._cur.tag_count += 1

    def handle_endtag(self, tag: str) -> None:
        # hot path ordered by frequency; branchy max(0, x-1) guards replaced
        # with an if (counters never go negative either way)
        if tag in _BLOCK_TAGS:
            if self._skip_depth:
                return
            if tag == "pre" and self._pre_depth:
                self._pre_depth -= 1
            self._flush()
            return
        if tag in _SKIP_TAGS and tag != "head":
            if self._skip_depth:
                self._skip_depth -= 1
            return
        if self._skip_depth:
            return
        if tag == "a":
            if self._link_depth:
                self._link_depth -= 1
        elif tag == "title":
            self._in_title = False
        elif tag in _CHROME_TAGS:
            if self._chrome_depth:
                self._chrome_depth -= 1

    def handle_startendtag(self, tag: str, attrs) -> None:
        if tag in ("br", "hr"):
            self._flush()

    def handle_data(self, data: str) -> None:
        if self._skip_depth:
            return
        if self._in_title:
            self.title_text.append(data)
            return
        if not data.strip():
            return
        if self._cur is None:
            self._cur = _Block(kind="paragraph", chrome_depth=self._chrome_depth)
        self._cur.pieces.append(data)
        if self._link_depth:
            self._cur.link_chars += len(" ".join(data.split()))

    def close(self) -> None:  # flush trailing block on truncated docs
        super().close()
        self._flush()


def _score_blocks(blocks: list[_Block]) -> list[bool]:
    """Arc90-style density gate + CETR-style neighbour smoothing.

    Raw keep: enough text, low link density, high text density, not chrome.
    Smoothing pass: a borderline block sandwiched between kept blocks is
    rescued (articles have short connective paragraphs); an isolated keep
    surrounded by drops with high link density is demoted.
    """
    n = len(blocks)
    raw = []
    for b in blocks:
        t = b.text()
        tl = len(t)
        ld = (b.link_chars / tl) if tl else 1.0
        td = tl / max(1, b.tag_count)
        is_heading = b.kind in ("title", "heading")
        keep = (
            b.chrome_depth == 0
            and ld <= MAX_LINK_DENSITY
            and (
                (tl >= MIN_BLOCK_CHARS and td >= MIN_TEXT_DENSITY)
                or (is_heading and tl >= 8 and ld == 0.0)
            )
        )
        raw.append(keep)

    # neighbour smoothing (one deterministic pass over the block curve)
    out = list(raw)
    for i in range(n):
        if raw[i]:
            continue
        b = blocks[i]
        if b.chrome_depth:
            continue
        t = b.text()
        tl = len(t)
        ld = (b.link_chars / tl) if tl else 1.0
        prev_keep = raw[i - 1] if i > 0 else False
        next_keep = raw[i + 1] if i + 1 < n else False
        neigh = (1.0 if prev_keep else 0.0) + (1.0 if next_keep else 0.0)
        if neigh * SMOOTH_KEEP_BONUS >= 1.0 and tl >= 8 and ld <= MAX_LINK_DENSITY:
            out[i] = True
    return out


def extract_html(html_bytes: bytes) -> tuple[str, list[tuple[int, int, str]], int]:
    """bytes → (extracted_text, block spans, n_blocks_kept).

    Span kinds here are structural: 'title' | 'heading' | 'paragraph' | 'list'
    | 'pre'. Record-level spans (date/id/amount) are added by
    final_ocr_spark.extract.spans.label_value_spans over the assembled text.
    """
    # charset decode: utf-8 with replacement — deterministic for any bytes
    text = html_bytes.decode("utf-8", errors="replace")
    seg = _BlockSegmenter()
    try:
        # fast tokenizer (same boundary regexes, no attr parsing; ~2× the
        # stdlib parse loop). Raises exactly where the stdlib raises; the
        # fallback replays through the stdlib parser so failure semantics —
        # including its partial-state output — are unchanged.
        from final_ocr_spark.extract.html_lexer import fast_feed

        fast_feed(seg, text)
        seg._flush()
    except Exception:
        seg = _BlockSegmenter()
        try:
            seg.feed(text)
            seg.close()
        except Exception:
            # html.parser very rarely raises; keep whatever blocks accumulated
            seg._flush()

    blocks = seg.blocks
    keep = _score_blocks(blocks)

    parts: list[str] = []
    spans: list[tuple[int, int, str]] = []
    pos = 0

    title = " ".join("".join(seg.title_text).split())
    # <h1> wins over <title> as the document title (closer to content)
    h1_blocks = [b for b, k in zip(blocks, keep) if k and b.kind == "title"]
    if not h1_blocks and title:
        parts.append(title)
        spans.append((0, len(title), "title"))
        pos = len(title) + 1

    for b, k in zip(blocks, keep):
        if not k:
            continue
        t = b.text()
        kind = b.kind if b.kind != "pre" else "paragraph"
        if b.kind == "heading":
            kind = "heading"
        parts.append(t)
        spans.append((pos, pos + len(t), kind))
        pos += len(t) + 1

    return "\n".join(parts), spans, len(parts)
