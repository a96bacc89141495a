from final_ocr_spark.plans.manifest import PartitionManifest, extract_with_resume  # noqa: F401
