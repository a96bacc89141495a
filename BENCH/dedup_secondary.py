"""Properly-sampled re-measurement of the SECONDARY scaling metric
(extract + latest-wins dedup shuffle).

The protocol of record (BENCH/scaling.py) times the dedup-appended pipeline
once per session vs six extract runs — enough to report the secondary, but
a 1-sample series makes the best-run estimator a lottery draw: the committed
round-5 run paired an 8-core dedup sample that landed in a fast host phase
(2127.7 docs/s, 28% above its sibling sessions) against 32-core sessions
that never caught that phase, reading 0.729 best-run while the
median-of-session-bests on the same data read 0.892. This script gives the
secondary metric the SAME sampling the headline gets: fresh taskset-pinned
JVMs per session, interleaved levels, warm-ups discarded, multiple timed
runs per session, both estimators reported.

Reuses scaling.py's corpus, session config, and child-process protocol so
the measured job is byte-identical to the protocol of record's secondary.

Usage:
    python BENCH/dedup_secondary.py             # orchestrate, print JSON,
                                                # write dedup_secondary_summary.json
    python BENCH/dedup_secondary.py --run 8     # one level (internal)

Env: DEDUP_SESSIONS (default 3), DEDUP_RUNS (default 4), DEDUP_WARMUPS (2).
"""

from __future__ import annotations

import json
import os
import pathlib
import shutil
import statistics
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import BENCH.scaling as sc  # noqa: E402

SESSIONS = int(os.environ.get("DEDUP_SESSIONS", 3))
RUNS = int(os.environ.get("DEDUP_RUNS", 4))
WARMUPS = int(os.environ.get("DEDUP_WARMUPS", 2))
OUT_JSON = REPO / "BENCH" / "dedup_secondary_summary.json"


def run_one_level(cpus: int) -> dict:
    """One fresh JVM: warm-ups + RUNS timed extract+dedup jobs (the exact
    job scaling.py times as its secondary — extract_pages(dedup=True))."""
    import time as _time

    from final_ocr_spark.operators.extract_pages import extract_pages
    from final_ocr_spark.session import get_spark

    spark = get_spark(
        app_name=f"dedup-secondary-local{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus * 2,
        extra_conf={"spark.sql.files.maxPartitionBytes": str(sc.SPLIT_BYTES)},
    )
    spark.sparkContext.setLogLevel("ERROR")

    def job() -> int:
        pages = spark.read.parquet(str(sc.CORPUS))
        return extract_pages(pages, dedup=True).count()

    for _ in range(WARMUPS):
        assert job() > 0
    times = []
    for _ in range(RUNS):
        t0 = _time.monotonic()
        rows = job()
        times.append(_time.monotonic() - t0)
    spark.stop()
    best = min(times)
    return {
        "cpus": cpus,
        "rows": rows,
        "times_sec": [round(t, 2) for t in times],
        "best_sec": round(best, 2),
        "docs_per_sec": round(sc.N_DOCS / best, 1),
    }


def orchestrate() -> dict:
    sc.ensure_corpus()
    all_sessions: dict[int, list[dict]] = {8: [], 32: []}
    for _round in range(SESSIONS):
        # interleave levels so host-throughput drift hits both equally
        for cpus in (8, 32):
            cmd = [sys.executable, str(REPO / "BENCH" / "dedup_secondary.py"),
                   "--run", str(cpus)]
            if shutil.which("taskset"):
                cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
            out = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO,
                                 timeout=2400)
            lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
            if out.returncode != 0 or not lines:
                raise RuntimeError(out.stderr[-2000:])
            all_sessions[cpus].append(json.loads(lines[-1]))
            time.sleep(10)

    summary: dict = {
        "n_docs": sc.N_DOCS,
        "sessions_per_level": SESSIONS,
        "runs_per_session": RUNS,
        "warmups_per_session": WARMUPS,
        "pinned": bool(shutil.which("taskset")),
    }
    per_level: dict[int, dict] = {}
    for cpus, sessions in all_sessions.items():
        bests = [s["docs_per_sec"] for s in sessions]
        per_level[cpus] = {
            "session_bests_docs_per_sec": bests,
            "all_times_sec": [s["times_sec"] for s in sessions],
            "best_docs_per_sec": max(bests),
            "median_of_session_bests": round(statistics.median(bests), 1),
        }
    summary["local8"] = per_level[8]
    summary["local32"] = per_level[32]
    eff_best = per_level[32]["best_docs_per_sec"] / (
        4.0 * per_level[8]["best_docs_per_sec"]
    )
    eff_med = per_level[32]["median_of_session_bests"] / (
        4.0 * per_level[8]["median_of_session_bests"]
    )
    summary["efficiency_best_run"] = round(eff_best, 3)
    summary["efficiency_median_of_session_bests"] = round(eff_med, 3)
    summary["gate"] = ">=0.8"
    summary["pass_best"] = eff_best >= 0.8
    summary["pass_median"] = eff_med >= 0.8
    return summary


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--run":
        print(json.dumps(run_one_level(int(sys.argv[2]))), flush=True)
    else:
        s = orchestrate()
        OUT_JSON.write_text(json.dumps(s, indent=1), encoding="utf-8")
        print(json.dumps(s), flush=True)
