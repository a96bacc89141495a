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
