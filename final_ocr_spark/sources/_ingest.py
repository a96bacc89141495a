"""Shared fetched-body ingest preamble for the XML-ish discovery sources
(sitemaps, feeds): gzip sniff + decompress and UTF-8 BOM strip, with the
quarantine-not-raise error contract both parsers follow."""

from __future__ import annotations

import gzip


def gunzip_and_strip_bom(body: bytes | None) -> tuple[bytes | None, str | None]:
    """(clean_body, error): decompress when gzip-magic'd, strip a UTF-8 BOM
    (common from Windows/.NET generators — it must not defeat downstream
    '<' sniffs). Returns (None, message) for empty/corrupt input; never
    raises."""
    if body is None or not body.strip():
        return None, "empty body"
    if body[:2] == b"\x1f\x8b":
        try:
            body = gzip.decompress(body)
        except Exception as e:
            return None, f"gzip: {e}"
    if body[:3] == b"\xef\xbb\xbf":
        body = body[3:]
    return body, None
