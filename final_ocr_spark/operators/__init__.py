from final_ocr_spark.operators.extract_pages import extract_pages  # noqa: F401
