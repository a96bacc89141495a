"""Deterministic corpus sampling and per-group caps for training-data
pipelines.

The deterministic-selection family every Common-Crawl-scale pipeline
needs — all keyed on md5(salt ‖ key) so decisions are pure functions of the
row, stable under reruns/resume/repartitioning, and engine-exact for
oracles. Besides the two below: :func:`mixture_sample` (domain/language
reweighting), :func:`temperature_mixture` (XLM/mT5-style alpha-sampling —
the reweighting with corpus-derived weights), :func:`deterministic_split`
(disjoint-exhaustive named
train/val/test partition, scan-local CASE over the bucket), and
:func:`shuffle_order` (a 64-bit reproducible sort key for the pre-training
global shuffle — range-partition + sort within, never RNG state).

* :func:`deterministic_sample` — reproducible Bernoulli sampling keyed on a
  stable column: the keep decision is a pure function of (salt, key), so
  reruns, resumed jobs, and different cluster sizes select the SAME rows
  (``df.sample()`` is seed+partitioning dependent and unsuitable for
  lineage-stable corpus cuts). The hash is md5 (identical bytes on every
  engine — see PLANS.md: Spark ``md5(cast binary)`` == DuckDB
  ``md5(varchar)``), so the sample is oracle-checkable bit-for-bit.
* :func:`stratified_cap` — at most ``cap`` rows per group in a
  deterministic order (the C4/RefinedWeb per-domain cap; generalizes
  streaming/stateful.py:host_quota_batch). The naive single window over
  ``partitionBy(group)`` sorts every group in one task — a single
  mega-host at web scale becomes one straggler task sorting millions of
  rows. The two-phase salted form caps within (group, salt-bucket) first —
  any row with global rank <= cap also has rank <= cap inside its bucket,
  so phase 1 keeps a superset of the answer while shrinking a g-row group
  to at most cap * num_salts rows — then runs the exact window on the tiny
  survivor set. Identical output to the naive form, bounded task size.

The reference repo processes one directory per run and has no sampling;
these are the corpus-hygiene generalizations its pipeline needs at
10^12-document scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_RESOLUTION = 1 << 16  # sampling granularity: 1/65536


def md5_hex_bucket(col, salt: str = "", hex_chars: int = 4) -> Column:
    """Engine-independent uniform bucket: the first ``hex_chars`` hex chars
    of md5(salt || value), as the hex STRING — fixed-length lowercase hex
    compares lexicographically == numerically, so consumers compare against
    a hex threshold (or group on the string) and never parse integers. The
    expression is identical in any engine with md5 + substring; shared by
    the deterministic sampler here and the count-min sketch
    (operators/sketches.py)."""
    h = F.md5(F.concat(F.lit(salt), col.cast("string")).cast("binary"))
    return F.substring(h, 1, hex_chars)


def sample_bucket(key_col, salt: str = "") -> Column:
    """Uniform bucket in [0, 65536) as 4 hex chars (see md5_hex_bucket)."""
    return md5_hex_bucket(key_col, salt, 4)


def deterministic_sample(
    df: DataFrame, key: str, rate: float, salt: str = ""
) -> DataFrame:
    """Keep each row iff md5-bucket(key) < rate (resolution 1/65536).

    Stable under reruns, repartitioning, and resume; disjoint samples come
    from different salts. Pure Column filter — pushed to the scan, no
    shuffle, no RNG state."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError("rate must be in [0, 1]")
    thr = int(round(rate * _RESOLUTION))
    if thr >= _RESOLUTION:
        return df
    return df.filter(sample_bucket(F.col(key), salt) < F.lit(format(thr, "04x")))


def stratified_cap(
    df: DataFrame,
    group: str,
    order_by: list[str],
    cap: int,
    *,
    salt_buckets: int = 0,
    salt_key: str | None = None,
) -> DataFrame:
    """At most ``cap`` rows per ``group``, taking the first ``cap`` in
    ``order_by`` order (ties must be broken by the ordering columns —
    include a unique key last for full determinism).

    ``salt_buckets > 0`` enables the two-phase skew-safe plan: phase 1 caps
    within (group, md5-salt-bucket-of-``salt_key``) — keeping a provable
    superset — phase 2 applies the exact cap to the survivors. Output is
    identical to the naive plan; the largest single sort shrinks from
    max-group-size to ~max-group-size/salt_buckets (phase 1) plus
    cap*salt_buckets (phase 2).
    """
    ordering = [F.col(c) for c in order_by]
    if salt_buckets > 0:
        sk = salt_key or order_by[-1]
        bucket = F.pmod(F.xxhash64(F.col(sk).cast("string")), F.lit(salt_buckets))
        w1 = Window.partitionBy(F.col(group), bucket).orderBy(*ordering)
        df = (
            df.withColumn("_rn1", F.row_number().over(w1))
            .filter(F.col("_rn1") <= cap)
            .drop("_rn1")
        )
    w = Window.partitionBy(group).orderBy(*ordering)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= cap)
        .drop("_rn")
    )


def mixture_sample(
    df: DataFrame,
    group: str,
    weights: dict[str, float],
    key: str,
    *,
    budget: int | None = None,
    size_col: str | None = None,
    salt: str = "mixture",
) -> DataFrame:
    """Down-sample groups to a target mixture (the Pile/FineWeb-style
    domain/language reweighting step): after sampling, group ``g``'s share
    of the output approaches ``weights[g] / sum(weights)``.

    * ``budget`` — target output size (rows, or ``size_col`` units such as
      token counts). ``None`` picks the LARGEST budget achievable by pure
      down-sampling: ``B = min_g actual_g / share_g`` — the binding group
      keeps everything, every other group down-samples to match. An
      explicit larger budget caps over-full groups at keep-everything
      (mixture then holds only approximately; this is down-sampling, not
      up-sampling — documented deviation).
    * groups absent from ``weights`` are dropped (weight 0). In
      ``size_col`` mode a group whose sizes sum to 0 (or all-null) is also
      dropped: it cannot contribute budget, and leaving it in would both
      collapse the auto-budget ``min`` to 0 and divide by zero under ANSI
      mode (guarded by the ``_actual > 0`` filter below).
    * keep decisions are :func:`deterministic_sample`'s md5 rule per group —
      stable under reruns/repartitioning/resume and oracle-checkable
      bit-for-bit in any engine with md5.

    Scale shape: ONE pass over the corpus for per-group sizes (map-side
    partial agg of slim rows), a two-row-stage driver-free budget reduction
    (1-row aggregate, broadcast cross-join — the tf_idf lazy-count pattern),
    a broadcastable (group, rate) dimension joined back, and a scan-local
    md5 filter. The corpus text never shuffles.
    """
    if not weights:
        raise ValueError("weights must be non-empty")
    if any(w < 0 for w in weights.values()):
        raise ValueError("weights must be >= 0")
    total_w = float(sum(weights.values()))
    if total_w <= 0:
        raise ValueError("weights must sum > 0")

    spark = df.sparkSession
    wdf = spark.createDataFrame(
        [(g, w / total_w) for g, w in weights.items()], f"{group} string, _share double"
    )

    size = F.count(F.lit(1)) if size_col is None else F.sum(F.col(size_col))
    stats = (
        df.groupBy(group)
        .agg(size.cast("double").alias("_actual"))
        .join(F.broadcast(wdf), group)  # inner: weight-0 groups drop here
        .filter((F.col("_share") > 0) & (F.col("_actual") > 0))
    )
    return _apply_mixture_budget(df, group, key, stats, budget, salt)


def _apply_mixture_budget(
    df: DataFrame, group: str, key: str, stats: DataFrame,
    budget: int | None, salt: str,
) -> DataFrame:
    """Shared tail of :func:`mixture_sample` / :func:`temperature_mixture`:
    turn a (group, _share, _actual) stats frame (positive rows only) into
    per-group keep rates and apply the md5 keep rule."""
    if budget is None:
        # largest pure-down-sampling budget: min over groups of actual/share
        # — computed as a 1-row aggregate cross-joined back (no driver
        # action; the stats plan executes once inside this query)
        b = stats.agg(F.min(F.col("_actual") / F.col("_share")).alias("_budget"))
        rates = stats.crossJoin(F.broadcast(b))
    else:
        rates = stats.withColumn("_budget", F.lit(float(budget)))
    rates = rates.select(
        group,
        F.least(
            F.lit(1.0), (F.col("_share") * F.col("_budget")) / F.col("_actual")
        ).alias("_rate"),
    )

    # bround (HALF_EVEN) matches deterministic_sample's Python round() at
    # exact .5 ties; F.round is HALF_UP and would disagree on bucket 0x8000
    thr = F.bround(F.col("_rate") * _RESOLUTION).cast("int")
    out = (
        df.join(F.broadcast(rates), group)
        .withColumn("_thr", thr)
        .filter(
            # thr == RESOLUTION means keep-all; the hex compare below is
            # only valid for thr < RESOLUTION (4-char domain)
            (F.col("_thr") >= _RESOLUTION)
            | (
                sample_bucket(F.col(key), salt)
                < F.format_string("%04x", F.col("_thr"))
            )
        )
        .drop("_rate", "_thr")
    )
    return out


def temperature_mixture(
    df: DataFrame,
    group: str,
    key: str,
    *,
    alpha: float = 0.3,
    budget: int | None = None,
    size_col: str | None = None,
    salt: str = "temperature",
) -> DataFrame:
    """Temperature-based mixture sampling (the XLM/mT5 multilingual
    alpha-sampling rule): group ``g``'s output share is proportional to
    ``(its observed corpus share) ** alpha``, flattening the head so
    low-resource languages/domains aren't drowned by the biggest one.
    ``alpha=1`` keeps natural proportions (every row kept when
    ``budget=None``); ``alpha=0`` targets uniform shares; the common
    published settings are 0.3 (mT5) / 0.5-0.7 (XLM-R).

    Unlike :func:`mixture_sample`, the weights are COMPUTED from the corpus
    itself — no dict to supply: ONE per-group size aggregate (map-side
    partial on slim rows), then the shares normalize DRIVER-FREE — the
    same 1-row-aggregate + broadcast cross-join shape as
    :func:`mixture_sample`'s auto budget, so nothing is ever collected
    (group cardinality is caller-controlled; ``group=host`` would pull
    millions of skinny rows through a driver collect). A naive distributed
    double ``sum`` would make the total (and so the keep thresholds)
    depend on partition merge order, breaking this module's bit-stable
    rerun/resume/repartition contract — instead the O(#groups) weights are
    gathered into ONE aggregation buffer, sorted by group name
    (``array_sort`` over (group, weight) structs — binary/UTF-8 order,
    which equals code-point order), and left-folded: a fixed fold order is
    order-independent and exactly reproducible by a pure-Python twin or a
    SQL engine with an ordered ``list_reduce``. Rows with a NULL ``group``
    are dropped (they can't carry a share; same contract as
    mixture_sample's weight-0 groups).

    Cross-engine note: ``alpha`` ∈ {0, 0.5, 1} (the published settings'
    building blocks) use ``1`` / correctly-rounded ``sqrt`` / identity, so
    thresholds are bit-identical in any IEEE engine; other alphas go
    through ``pow``, which libms only guarantee to 1 ulp — still
    deterministic per platform, but pin goldens to one platform.

    ``budget``/``size_col``/determinism semantics are exactly
    :func:`mixture_sample`'s.
    """
    if alpha < 0:
        raise ValueError("alpha must be >= 0")
    size = F.count(F.lit(1)) if size_col is None else F.sum(F.col(size_col))
    a = F.col("_actual")
    if alpha == 0:
        pw = F.lit(1.0)
    elif alpha == 0.5:
        pw = F.sqrt(a)  # IEEE-correctly-rounded, unlike pow(x, 0.5)
    elif alpha == 1.0:
        pw = a
    else:
        pw = F.pow(a, F.lit(float(alpha)))
    sized = (
        df.filter(F.col(group).isNotNull())
        .groupBy(group)
        .agg(size.cast("double").alias("_actual"))
        .filter(F.col("_actual") > 0)
        .withColumn("_pw", pw)
    )
    tot = sized.agg(
        F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col(group).cast("string").alias("g"),
                        F.col("_pw").alias("p"),
                    )
                )
            ),
            F.lit(0.0),
            lambda acc, x: acc + x["p"],
        ).alias("_tot")
    )
    stats = sized.crossJoin(F.broadcast(tot)).select(
        group, (F.col("_pw") / F.col("_tot")).alias("_share"), "_actual"
    )
    return _apply_mixture_budget(df, group, key, stats, budget, salt)


def deterministic_split(
    df: DataFrame,
    key: str,
    fractions: dict[str, float],
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """df + ``split_col``: a named train/val/test-style partition of the
    corpus, keyed on md5(salt ‖ key) — reproducible across reruns, resumes,
    and cluster sizes, and DISJOINT/exhaustive by construction (each row
    lands in exactly one split). Fractions must sum to 1 within the
    16-bit bucket resolution; each split's share is exact to 1/65536.

    Scale shape: one scan-local Column expression (a chained CASE over the
    hex bucket) — no shuffle, no RNG state, pushed to the scan like
    deterministic_sample. Split names are assigned in SORTED name order so
    the (name → bucket range) mapping is itself deterministic, independent
    of dict insertion order.
    """
    if not fractions:
        raise ValueError("fractions must be non-empty")
    for name, frac in fractions.items():
        if not 0.0 < frac <= 1.0:
            raise ValueError(f"fraction for {name!r} must be in (0, 1], "
                             f"got {frac}")
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    # cumulative integer bucket boundaries in sorted-name order; the last
    # boundary is forced to the full range so float rounding can never
    # leave a row unassigned
    names = sorted(fractions)
    bounds: list[tuple[str, int]] = []
    acc = 0.0
    for name in names:
        acc += fractions[name]
        bounds.append((name, int(round(acc * _RESOLUTION))))
    bounds[-1] = (bounds[-1][0], _RESOLUTION)
    bucket = F.conv(md5_hex_bucket(F.col(key), salt, 4), 16, 10).cast("int")
    expr = F.lit(bounds[-1][0])
    for name, hi in reversed(bounds[:-1]):
        expr = F.when(bucket < hi, F.lit(name)).otherwise(expr)
    # null keys get a NULL split, never a silent assignment: a null bucket
    # makes every `when` condition falsy and would otherwise dump ALL
    # unkeyed rows into the lexicographically-last split name, silently
    # inflating that split (review-caught). NULL is loud — any
    # filter("split = ...") excludes them and the gap is countable.
    expr = F.when(F.col(key).isNotNull(), expr)
    return df.withColumn(split_col, expr)


def shuffle_order(key_col, salt: str = "") -> Column:
    """A deterministic pseudo-random sort key for TRAINING-ORDER shuffling:
    sort (or range-write) by this column and the corpus comes out in a
    reproducible, key-derived random order — the standard pre-training
    "global shuffle" without RNG state, stable under reruns and
    repartitioning. 16 hex chars = 64 bits, collision-free in practice;
    ties (astronomically rare) break by the key itself downstream.

    Scale note: consumers should `repartitionByRange` on this column and
    sort WITHIN partitions (one range exchange; each output file is a
    contiguous slice of the shuffled order) — a global orderBy collapses
    to the same range exchange + per-partition sort under Spark's
    TakeOrdered-free sort planner, but being explicit keeps the intent
    visible."""
    col = key_col if isinstance(key_col, Column) else F.col(key_col)
    return md5_hex_bucket(col, salt, 16)
