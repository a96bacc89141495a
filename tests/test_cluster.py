"""Distributed k-means (operators/cluster.py): numpy-twin differential on
the same deterministic init, planted-cluster recovery, guards, and the
slim-update plan shape."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from final_ocr_spark.operators.cluster import kmeans


def _planted(spark, n_per=40, dim=8, seed=7):
    """Three well-separated blobs; deterministic (seeded RandomState)."""
    rng = np.random.RandomState(seed)
    centers = np.array(
        [[10.0] + [0.0] * (dim - 1),
         [0.0] * (dim - 1) + [10.0],
         [-10.0] + [0.0] * (dim - 2) + [-10.0]]
    )
    rows, truth = [], {}
    for ci, c in enumerate(centers):
        for j in range(n_per):
            k = f"doc-{ci}-{j:03d}"
            v = (c + rng.randn(dim) * 0.3).tolist()
            rows.append((k, [float(x) for x in v]))
            truth[k] = ci
    df = spark.createDataFrame(rows, "url string, embedding array<double>")
    return df, truth


def _np_lloyd(X, init, max_iters, tol):
    """Pure-numpy twin of the Spark loop: same init matrix, same update
    rule (empty clusters keep their centroid), same stopping rule."""
    c = init.copy()
    for _ in range(max_iters):
        d = ((X[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        a = d.argmin(axis=1)
        new_c = c.copy()
        for i in range(len(c)):
            m = a == i
            if m.any():
                new_c[i] = X[m].mean(axis=0)
        shift = np.sqrt(((new_c - c) ** 2).sum(axis=1)).max()
        c = new_c
        if shift <= tol:
            break
    d = ((X[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
    return d.argmin(axis=1), c


def test_matches_numpy_twin_from_same_init(spark):
    df, _ = _planted(spark)
    assigns, cents, info = kmeans(
        df, 3, init="hash", max_iters=15, tol=1e-9, seed=1
    )
    got = {r["url"]: r["cluster"] for r in assigns.collect()}

    # rebuild the twin's input in the SAME deterministic hash init order
    rows = df.select(
        "url", "embedding", F.xxhash64(F.col("url"), F.lit(1)).alias("h")
    ).collect()
    by_key = {r["url"]: np.array(r["embedding"]) for r in rows}
    init_keys = [r["url"] for r in sorted(rows, key=lambda r: (r["h"], r["url"]))][:3]
    init = np.vstack([by_key[k] for k in init_keys])
    keys = sorted(by_key)
    X = np.vstack([by_key[k] for k in keys])
    want_a, want_c = _np_lloyd(X, init, max_iters=15, tol=1e-9)

    assert [got[k] for k in keys] == want_a.tolist()
    got_c = {
        r["cluster"]: np.array(r["centroid"])
        for r in cents.collect()
    }
    for i in range(3):
        assert np.allclose(got_c[i], want_c[i], atol=1e-9)
    assert info["converged"] and info["shift"] <= 1e-9
    assert info["inertia"] == pytest.approx(
        float(((X - want_c[want_a]) ** 2).sum()), rel=1e-9
    )


def test_recovers_planted_clusters_kmeanspp(spark):
    df, truth = _planted(spark)
    assigns, cents, info = kmeans(df, 3, max_iters=25, seed=0)
    got = {r["url"]: r["cluster"] for r in assigns.collect()}
    # cluster ids are arbitrary — check the PARTITION matches the planted one
    by_truth = {}
    for k, t in truth.items():
        by_truth.setdefault(t, set()).add(got[k])
    assert all(len(s) == 1 for s in by_truth.values())
    assert len({next(iter(s)) for s in by_truth.values()}) == 3
    assert info["converged"]
    sizes = {r["cluster"]: r["size"] for r in cents.collect()}
    assert sorted(sizes.values()) == [40, 40, 40]
    # unit sanity on distances: every point is close to ITS centroid
    assert assigns.agg(F.max("dist")).first()[0] < 5.0


def test_null_vectors_excluded_and_guards(spark):
    df = spark.createDataFrame(
        [("a", [1.0, 0.0]), ("b", [0.9, 0.1]), ("c", None)],
        "url string, embedding array<double>",
    )
    assigns, cents, _ = kmeans(df, 1, max_iters=2)
    assert {r["url"] for r in assigns.collect()} == {"a", "b"}
    assert cents.first()["size"] == 2

    with pytest.raises(ValueError, match="exceeds the 2 embeddable"):
        kmeans(df, 5, max_iters=1)
    with pytest.raises(ValueError, match="mixed embedding dims"):
        kmeans(
            spark.createDataFrame(
                [("a", [1.0]), ("b", [1.0, 2.0])],
                "url string, embedding array<double>",
            ),
            1,
        )
    with pytest.raises(ValueError, match="broadcast-closure cap"):
        kmeans(df, 3_000_000, max_iters=1, sample_size=1)
    with pytest.raises(ValueError, match="init must be"):
        kmeans(df, 1, init="random")


def test_update_agg_is_slim_not_vector_shuffle(spark):
    """The centroid update must shuffle (cluster, pos, partial-sum) rows
    with map-side combine — never the embedding arrays themselves. Pinned
    on the aggregation plan: partial_sum over the exploded value feeds the
    exchange, and the exchange key is (cluster, pos)."""
    df, _ = _planted(spark, n_per=10)
    vec_rows = df.select(
        F.col("url").alias("k"),
        F.col("embedding").cast("array<double>").alias("_v"),
    )
    agg = (
        vec_rows.withColumn("_c", F.lit(0))
        .select("_c", F.posexplode("_v").alias("_p", "_x"))
        .groupBy("_c", "_p")
        .agg(F.sum("_x").alias("_s"), F.count(F.lit(1)).alias("_n"))
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "partial_sum" in plan or "partial" in plan.lower()
    ex = [l for l in plan.splitlines() if "Exchange hashpartitioning" in l]
    assert ex and all("_v#" not in l for l in ex), ex


def test_prune_prototypes_exact_vs_python_twin(spark):
    """Exact mode drops floor(frac*size) per cluster in (dist, key) order —
    recomputed in Python from the same assignments."""
    from final_ocr_spark.operators.cluster import prune_prototypes

    df, _ = _planted(spark, n_per=20)
    assigns, _, _ = kmeans(df, 3, max_iters=15, seed=0)
    rows = assigns.collect()

    pruned = prune_prototypes(df, assigns, 0.25, mode="exact")
    kept = {r["url"] for r in pruned.collect()}

    by_c = {}
    for r in rows:
        by_c.setdefault(r["cluster"], []).append((r["dist"], r["url"]))
    want_drop = set()
    for members in by_c.values():
        members.sort()
        want_drop |= {u for _, u in members[: int(len(members) * 0.25)]}
    assert kept == {r["url"] for r in rows} - want_drop
    # the dropped ones are the most prototypical (smallest dist) per cluster
    dists = {r["url"]: r["dist"] for r in rows}
    for c, members in by_c.items():
        d_drop = [dists[u] for _, u in members if u in want_drop]
        d_keep = [dists[u] for _, u in members if u not in want_drop]
        assert max(d_drop) <= min(d_keep)


def test_prune_prototypes_approx_bounds_and_passthrough(spark):
    from final_ocr_spark.operators.cluster import prune_prototypes

    df, _ = _planted(spark, n_per=30)
    # an unassigned row (e.g. NULL embedding upstream) must pass through
    extra = spark.createDataFrame(
        [("novec", None)], "url string, embedding array<double>"
    )
    full = df.unionByName(extra)
    assigns, _, _ = kmeans(df, 3, max_iters=15, seed=0)

    pruned = prune_prototypes(full, assigns, 0.3, mode="approx")
    kept = {r["url"] for r in pruned.collect()}
    assert "novec" in kept
    n_in, n_kept = 90, len(kept) - 1
    dropped = n_in - n_kept
    # approx mode drops AT MOST frac (ties kept), and a sane amount of it
    assert 0 < dropped <= int(n_in * 0.3)

    # frac=0 is the identity
    assert prune_prototypes(full, assigns, 0.0).count() == full.count()

    import pytest as _pytest
    with _pytest.raises(ValueError, match="frac"):
        prune_prototypes(full, assigns, 1.0)
    with _pytest.raises(ValueError, match="mode"):
        prune_prototypes(full, assigns, 0.1, mode="median")


def test_d4_composition_dedup_then_prune(spark):
    """The full D4 recipe (Tirumala et al. 2023): semantic_dedup_kmeans →
    prune_prototypes composes end-to-end on planted blobs with a planted
    duplicate pair; the duplicate dies in stage 1, prototypes in stage 2."""
    from final_ocr_spark.operators.cluster import prune_prototypes
    from final_ocr_spark.operators.similarity import semantic_dedup_kmeans

    df, _ = _planted(spark, n_per=15)
    base = {r["url"]: r["embedding"] for r in df.collect()}
    dup = [(u + "-copy", [x + 1e-4 for x in v]) for u, v in list(base.items())[:2]]
    full = df.unionByName(
        spark.createDataFrame(dup, "url string, embedding array<double>")
    )

    deduped = semantic_dedup_kmeans(
        full, k=3, threshold=0.999, id_col="url", max_iters=15, seed=0
    )
    kept1 = {r["url"] for r in deduped.collect()}

    # ground truth group count: union-find over ALL pairs with cos >= the
    # threshold (cross-blob pairs can never reach it, so this equals the
    # operator's within-cluster pairing); the blobs also contain ACCIDENTAL
    # near-dups at 0.999, so the expected count is computed, not hardcoded
    vecs = {r["url"]: np.array(r["embedding"]) for r in full.collect()}
    keys = sorted(vecs)
    parent = {u: u for u in keys}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i, u in enumerate(keys):
        for v in keys[i + 1:]:
            a, b = vecs[u], vecs[v]
            cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
            if cos >= 0.999:
                parent[find(u)] = find(v)
    n_groups = len({find(u) for u in keys})
    assert len(kept1) == n_groups
    # each planted copy's group collapsed to one survivor
    for u, _ in dup:
        orig = u[: -len("-copy")]
        assert len({u, orig} & kept1) <= 1

    assigns, _, _ = kmeans(deduped, 3, max_iters=15, seed=0)
    sizes = [
        r["n"]
        for r in assigns.groupBy("cluster").agg(F.count(F.lit(1)).alias("n")).collect()
    ]
    final = prune_prototypes(deduped, assigns, 0.2, mode="exact")
    assert final.count() == len(kept1) - sum(int(n * 0.2) for n in sizes)
