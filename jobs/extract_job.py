"""Production entry point: spark-submit --py-files final_ocr_spark.zip jobs/extract_job.py

Example (cluster):
    python jobs/package.py   # builds dist/final_ocr_spark.zip
    spark-submit \\
        --py-files dist/final_ocr_spark.zip \\
        --conf spark.sql.adaptive.enabled=true \\
        jobs/extract_job.py \\
        --input /data/pages --output /data/extracted \\
        --num-parts 4096 --num-groups 64 --resume

Local smoke:
    python jobs/extract_job.py --synthetic 5000 --output /tmp/extracted_demo
"""

from __future__ import annotations

import argparse
import pathlib
import sys

# allow running directly (python jobs/extract_job.py) in addition to
# spark-submit --py-files; on a cluster the zip provides the package
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="pages parquet/table path")
    ap.add_argument("--synthetic", type=int, default=0,
                    help="generate N synthetic pages instead of --input")
    ap.add_argument("--output", required=True)
    ap.add_argument("--num-parts", type=int, default=256)
    ap.add_argument("--num-groups", type=int, default=16)
    ap.add_argument("--partitions", type=int, default=None,
                    help="salted pre-repartition for host-clustered inputs")
    ap.add_argument("--no-dedup", action="store_true")
    ap.add_argument("--no-resume", action="store_true",
                    help="single atomic write, no manifest checkpointing")
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    from final_ocr_spark.session import get_spark

    spark = get_spark(app_name="final-ocr-spark-extract")
    spark.sparkContext.setLogLevel("WARN")

    if args.synthetic:
        from final_ocr_spark.sources.synthetic_pages import gen_pages

        pages = gen_pages(spark, args.synthetic, seed=args.seed)
    elif args.input:
        pages = spark.read.parquet(args.input)
    else:
        ap.error("one of --input / --synthetic is required")

    if args.no_resume:
        from final_ocr_spark.operators.extract_pages import extract_pages

        ext = extract_pages(pages, dedup=not args.no_dedup, partitions=args.partitions)
        ext.sortWithinPartitions("url").write.mode("overwrite").parquet(args.output)
    else:
        from final_ocr_spark.plans.manifest import extract_with_resume

        extract_with_resume(
            spark, pages, args.output,
            num_parts=args.num_parts, num_groups=args.num_groups,
            dedup=not args.no_dedup,
        )

    n = spark.read.parquet(args.output).count()
    print(f"extracted rows: {n} -> {args.output}")
    spark.stop()


if __name__ == "__main__":
    main()
