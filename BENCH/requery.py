"""Re-measure a single bench query in an isolated fresh JVM.

VERDICT r2 flagged two bench regressions (q19 +23%, q25 +97%) that were
n<=2 measurements inside the full suite on a host with documented 4x
drift; suite ordering / JIT state was the suspected confounder. This
script removes the confounder: one query per JVM, a cheap q1 warm-up to
spin executors + codegen, then the target query timed twice.

Usage: python -m BENCH.requery <query> [sf_dir] [cpus]
Prints one JSON line {"query":..., "run1":..., "run2":..., "rows":...}.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    from final_ocr_spark.session import get_spark

    spark = get_spark(
        app_name=f"requery-{name}",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 16),
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    if name == "q19_full_only":
        def fn(spark, sf):
            return entrymod._verified_near_dup_pairs(
                entrymod._mutated_corpus(spark, sf)
            )
    else:
        fn = entrymod.queries()[name]

    # warm-up: executor spin-up + codegen paths, NOT the target query
    entrymod.queries()["q1_rollup"](spark, sf_dir).count()

    out = {"query": name, "sf_dir": sf_dir, "cpus": cpus}
    for run in ("run1", "run2"):
        t0 = time.monotonic()
        rows = fn(spark, sf_dir).count()
        out[run] = round(time.monotonic() - t0, 3)
        out["rows"] = rows
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
