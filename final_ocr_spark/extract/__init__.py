"""Pure-Python extraction cores.

These are plain functions over bytes/str — no Spark imports — so they are
unit-testable standalone (the analog of the reference's ``manual_text`` bypass,
ocr.py:1232-1261). The Spark layer wraps them in Arrow-batched pandas UDFs
(final_ocr_spark.operators.extract_pages).
"""

from final_ocr_spark.extract.html_main import extract_html  # noqa: F401
from final_ocr_spark.extract.layout_xycut import extract_pdf_tokens  # noqa: F401
from final_ocr_spark.extract.dispatch import extract_document  # noqa: F401
