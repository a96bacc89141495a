from final_ocr_spark.streaming.stream_extract import stream_extract_pages  # noqa: F401
