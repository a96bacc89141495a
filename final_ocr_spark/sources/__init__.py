from final_ocr_spark.sources.synthetic_pages import gen_pages, gen_page_row  # noqa: F401
