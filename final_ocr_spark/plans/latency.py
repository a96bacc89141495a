"""Per-batch UDF-latency histogram accumulator (BASELINE.md protocol #4).

Percentile latencies can't come from a plain scalar accumulator (it only
sums) and a list-of-latencies accumulator is unbounded — at 10^12 docs it
would ship one float per Arrow batch back to the driver. This is the
bounded middle: a FIXED-SIZE log-scale histogram (48 buckets, quarter-
octave = ×2^0.25 spacing covering 1 ms … ~3.4 s and an overflow bucket),
merged associatively by Spark's accumulator machinery. p50/p99 read from
the histogram with ≤ +19% (one bucket width) upward error, which is ample
for a throughput dashboard; the size on the wire is 48 longs per task no
matter the corpus.

Executor-side cost when enabled: two ``perf_counter`` calls and one
list-add per Arrow batch (~512 rows) — unmeasurable next to the ~1 s of
extraction work a batch carries. Disabled (the default), the hot loop pays
a single ``is None`` test per batch, so scaling measurements (BENCH/
scaling.py) are unaffected.
"""

from __future__ import annotations

import math

from pyspark.accumulators import AccumulatorParam

N_BUCKETS = 48
# bucket 0: <= 1 ms; bucket i (1..46): (2^((i-1)/4), 2^(i/4)] ms;
# bucket 47: overflow (> ~2900 s is impossible; > bucket-46 edge ~ 2900 ms)


class _HistogramParam(AccumulatorParam):
    def zero(self, value):
        return [0] * N_BUCKETS

    def addInPlace(self, a, b):
        for i in range(N_BUCKETS):
            a[i] += b[i]
        return a


def latency_histogram(sc):
    """A histogram accumulator; pass to extract_pages(latency_acc=...)."""
    return sc.accumulator([0] * N_BUCKETS, _HistogramParam())


def bucket_of(ms: float) -> int:
    if ms <= 1.0:
        return 0
    return min(N_BUCKETS - 1, 1 + int(4 * math.log2(ms)))


def record_ms(acc, ms: float) -> None:
    h = [0] * N_BUCKETS
    h[bucket_of(ms)] = 1
    acc.add(h)


def _bucket_upper_ms(i: int) -> float:
    return 1.0 if i == 0 else 2.0 ** (i / 4.0)


def percentiles(counts: list[int], qs=(0.5, 0.99)) -> dict:
    """{'p50': ms, 'p99': ms, 'batches': n} from a histogram value.

    Each percentile reports its bucket's UPPER edge — a conservative
    (never-underestimating) figure with one-bucket (×2^0.25) resolution.
    A percentile landing in the open-ended overflow bucket has no upper
    edge and reports None; ``overflow`` carries that bucket's count so a
    None is attributable (reporting the overflow bucket's lower edge
    would silently UNDERestimate arbitrarily slow batches).
    """
    total = sum(counts)
    out = {"batches": total, "overflow": counts[N_BUCKETS - 1] if counts else 0}
    for q in qs:
        label = f"p{int(q * 100)}"
        if total == 0:
            out[label] = None
            continue
        target = math.ceil(q * total)
        cum = 0
        for i, c in enumerate(counts):
            cum += c
            if cum >= target:
                out[label] = (
                    None if i == N_BUCKETS - 1 else round(_bucket_upper_ms(i), 3)
                )
                break
    return out
