"""Magic-byte MIME sniffing: route binary payloads by what they ARE.

WARC-ingested corpora carry whatever the origin served: Content-Type
headers lie constantly (PDFs served as text/html, images as octet-stream),
and the pages schema stores one opaque ``html binary`` column. Routing —
HTML extraction vs PDF branch vs multimodal vs skip — must therefore come
from the payload's leading bytes, the same signature set every browser and
``file(1)`` uses.

Scale story: this is a PURE Column expression — a when/otherwise chain of
binary-prefix tests that compiles into whole-stage codegen and fuses into
the scan. Zero Python, zero shuffle, no UDF: sniffing a 100 TB corpus costs
branch-predictable byte compares riding a scan that was happening anyway.

Signatures (all public, from the respective format specs): PDF, the
engine's %PDFTOK token format, PNG, JPEG, GIF, WebP/WAV (RIFF
discriminated at offset 8), BMP, TIFF (both byte orders), MP4/ISO-BMFF
(``ftyp`` at offset 4), WebM/MKV (EBML), MP3 (ID3), Ogg, FLAC, gzip, zip,
zstd. Non-matching payloads: ``html`` when the (validated-UTF-8) head
looks like markup per a WHATWG-style tag sniff, ``text`` when the head is
valid UTF-8, else ``binary``.

The reference routes documents by file-extension glob (reference
ocr2.py:569-585); magic bytes are the content-addressed version of the
same dispatch.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (label, hex signature at offset 0) — order matters: first match wins,
# more specific prefixes listed before shorter ones that share a stem
_PREFIXES: list[tuple[str, str]] = [
    ("pdftok", b"%PDFTOK".hex()),
    ("pdf", b"%PDF-".hex()),
    ("png", "89504E470D0A1A0A"),
    ("jpeg", "FFD8FF"),
    ("gif", b"GIF87a".hex()),
    ("gif", b"GIF89a".hex()),
    ("tiff", "49492A00"),           # little-endian
    ("tiff", "4D4D002A"),           # big-endian
    ("bmp", b"BM".hex()),
    ("webm", "1A45DFA3"),           # EBML (webm/mkv)
    ("mp3", b"ID3".hex()),
    ("ogg", b"OggS".hex()),
    ("flac", b"fLaC".hex()),
    ("gzip", "1F8B"),
    ("zip", "504B0304"),
    ("zstd", "28B52FFD"),
]

# WHATWG-style markup sniff over the lowercased head (BOM/whitespace-led)
_HTML_HEAD_RE = (
    r"^(﻿)?\s*<(!doctype|html|head|body|script|iframe|h1|div|p[ >]|"
    r"title|meta|article|section|table|ul|ol|br|b[ >]|a[ >]|style|font|"
    r"center|!--|\?xml)"
)


def sniff_mime(data_col) -> Column:
    """Column: magic-byte label for a binary column — one of
    ``pdftok pdf png jpeg gif tiff bmp webp wav webm mp3 ogg flac mp4 gzip
    zip zstd html text binary``; null for null/empty input. Pure codegen —
    see module doc."""
    col = data_col if isinstance(data_col, Column) else F.col(data_col)

    # tail of the chain: textiness. Validate the first KB as UTF-8; a
    # multi-byte char split by the cut must not fail the whole head, so
    # accept if ANY of the 4 possible trims validates (ANSI-safe: the
    # try_ variant nulls instead of raising).
    valid_head = F.coalesce(
        *[
            F.call_function(
                "try_validate_utf8", F.substring(col, 1, 1024 - k)
            )
            for k in range(4)
        ]
    )
    looks_html = F.lower(valid_head.cast("string")).rlike(_HTML_HEAD_RE)
    sniffed = F.when(valid_head.isNull(), F.lit("binary")).otherwise(
        F.when(looks_html, F.lit("html")).otherwise(F.lit("text"))
    )

    # container formats discriminated past their shared stem
    is_riff = col.startswith(F.lit(b"RIFF"))
    sniffed = (
        F.when(is_riff & (F.substring(col, 9, 4) == F.lit(b"WEBP")), F.lit("webp"))
        .when(is_riff & (F.substring(col, 9, 4) == F.lit(b"WAVE")), F.lit("wav"))
        .when(F.substring(col, 5, 4) == F.lit(b"ftyp"), F.lit("mp4"))
        .otherwise(sniffed)
    )

    for label, hexs in reversed(_PREFIXES):
        sniffed = F.when(
            col.startswith(F.lit(bytes.fromhex(hexs))), F.lit(label)
        ).otherwise(sniffed)

    return F.when(
        col.isNull() | (F.length(col) == 0), F.lit(None).cast("string")
    ).otherwise(sniffed)


# sniffed label → pipeline route. html/text go to the extractor (it handles
# the text fallback), pdftok to the PDF layout branch, media to the
# multimodal plumbing, compressed containers to re-ingestion, true binary
# is quarantined by the extractor's error path.
_ROUTES = {
    "html": "extract_html", "text": "extract_html", "pdftok": "extract_pdf",
    "pdf": "extract_pdf",
    "png": "image", "jpeg": "image", "gif": "image", "tiff": "image",
    "bmp": "image", "webp": "image",
    "wav": "audio", "mp3": "audio", "ogg": "audio", "flac": "audio",
    "mp4": "video", "webm": "video",
    "gzip": "archive", "zip": "archive", "zstd": "archive",
    "binary": "quarantine",
}


def route_for_mime(mime_col) -> Column:
    """Column: map a sniff_mime label to its pipeline route — one of
    ``extract_html extract_pdf image audio video archive quarantine``
    (null label → null). A literal map lookup, still codegen."""
    col = mime_col if isinstance(mime_col, Column) else F.col(mime_col)
    mapping = F.create_map(
        *[F.lit(x) for kv in _ROUTES.items() for x in kv]
    )
    return mapping[col]


def sniff_pages(pages, data_col: str = "html"):
    """pages → pages + (mime, doc_route) columns, scan-fused."""
    m = sniff_mime(data_col)
    return pages.withColumn("mime", m).withColumn(
        "doc_route", route_for_mime(F.col("mime"))
    )
