"""spark-submit job entry points (subprocess smoke tests)."""

def test_stats_job_smoke(tmp_path):
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable, "jobs/stats_job.py", "--synthetic", "150",
         "--output", str(tmp_path / "stats"), "--tfidf-k", "2",
         "--top-k", "5", "--counters", "500"],
        capture_output=True, text=True, cwd="/root/repo", timeout=420,
    )
    assert out.returncode == 0, out.stderr[-1500:]
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("stats written")]
    assert len(lines) == 5 and all("rows=" in ln for ln in lines)
