"""Similarity-search operator tests: brute force is ground truth; batch and
LSH paths must agree with it (LSH: high recall on its candidate set)."""

from __future__ import annotations

import math
import random

import pytest


@pytest.fixture(scope="module")
def emb(spark):
    rng = random.Random(7)
    rows = []
    for i in range(400):
        rows.append((i, [rng.gauss(0, 1) for _ in range(16)]))
    # plant a near-exact neighbor of vec 0
    base = rows[0][1]
    rows.append((9000, [x + 0.01 for x in base]))
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def _brute(rows, q, k):
    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b)))

    scored = sorted(((cos(v, q), i) for i, v in rows), key=lambda t: (-t[0], t[1]))
    return [i for _, i in scored[:k]]


def test_cosine_topk_matches_python(spark, emb):
    from final_ocr_spark.operators.similarity import cosine_topk

    rows = [(r["vec_id"], list(r["embedding"])) for r in emb.collect()]
    q = dict(rows)[0]
    want = _brute(rows, q, 5)
    got = [r["vec_id"] for r in cosine_topk(emb, q, k=5).collect()]
    assert got == want
    assert got[0] == 0 and 9000 in got[:2]  # self + planted neighbor


def test_cosine_topk_batch(spark, emb):
    from final_ocr_spark.operators.similarity import cosine_topk_batch

    rows = [(r["vec_id"], list(r["embedding"])) for r in emb.collect()]
    by_id = dict(rows)
    queries = spark.createDataFrame(
        [(100, by_id[0]), (200, by_id[17])], ["query_id", "query_vec"]
    )
    got = cosine_topk_batch(emb, queries, k=5).collect()
    for qid, qv in [(100, by_id[0]), (200, by_id[17])]:
        want = _brute(rows, qv, 5)
        ids = [r["vec_id"] for r in sorted(
            (r for r in got if r["query_id"] == qid),
            key=lambda r: (-r["cos_sim"], r["vec_id"]))]
        assert ids == want, qid


def test_lsh_topk_finds_planted_neighbor(spark, emb):
    from final_ocr_spark.operators.similarity import lsh_topk

    q = [r["embedding"] for r in emb.filter("vec_id = 0").collect()][0]
    got = [r["vec_id"] for r in lsh_topk(emb, list(q), k=5, bits=8, multiprobe=1).collect()]
    assert 0 in got and 9000 in got  # near-identical vectors share the bucket


def test_ann_index_probe_matches_lsh(spark, emb, tmp_path):
    """build_ann_index + ann_index_topk must return the same result as the
    one-shot lsh_topk (same planes/probes), with partition-pruned scans."""
    from final_ocr_spark.operators.similarity import (
        ann_index_topk,
        build_ann_index,
        lsh_topk,
    )

    idx = build_ann_index(emb, str(tmp_path / "annidx"), dim=16, bits=8, seed=11)
    q = [r["embedding"] for r in emb.filter("vec_id = 0").collect()][0]
    got_idx = [
        r["vec_id"]
        for r in ann_index_topk(spark, idx, list(q), k=5, bits=8, seed=11,
                                multiprobe=1).collect()
    ]
    got_scan = [
        r["vec_id"]
        for r in lsh_topk(emb, list(q), k=5, bits=8, seed=11, multiprobe=1).collect()
    ]
    assert got_idx == got_scan
    assert 0 in got_idx and 9000 in got_idx
    # the probe must prune partitions, not scan the full index
    plan = ann_index_topk(spark, idx, list(q), k=5, bits=8, seed=11, multiprobe=1) \
        ._jdf.queryExecution().toString()
    assert "PartitionFilters: [bucket" in plan


def test_embedding_near_dups_key_only_explode(spark, emb):
    """The blocking explode must carry keys only — never the vector column
    (at 768-dim × 10^12 rows the vector payload would dominate the shuffle)."""
    from final_ocr_spark.operators.similarity import embedding_near_dups

    pairs = embedding_near_dups(emb, threshold=0.99, dim=16, bits=8)
    found = {(r["key_a"], r["key_b"]) for r in pairs.collect()}
    assert (0, 9000) in found
    plan = pairs._jdf.queryExecution().toString()
    gen = [l for l in plan.splitlines() if "Generate explode" in l and "Exchange" not in l]
    assert gen, "explode node missing from plan"
    # Generate's required child output (2nd bracket group) must not include v
    assert all(" v#" not in l and "[v#" not in l for l in gen), gen


def test_ivf_index_topk(spark, emb, tmp_path):
    """IVF: exact top-k must survive the nprobe pruning for the planted
    near-identical neighbor; the probe scan must be partition-pruned."""
    from final_ocr_spark.operators.similarity import build_ivf_index, ivf_topk

    idx = build_ivf_index(emb, str(tmp_path / "ivf"), n_lists=16,
                          sample_size=401, seed=11)
    q = [r["embedding"] for r in emb.filter("vec_id = 0").collect()][0]
    out = ivf_topk(spark, idx, list(q), k=5, nprobe=4)
    ids = [r["vec_id"] for r in out.collect()]
    assert 0 in ids and 9000 in ids  # self + planted near-dup recalled
    plan = out._jdf.queryExecution().toString()
    assert "PartitionFilters: [list_id" in plan


def test_lsh_prunes_candidates(spark, emb):
    from final_ocr_spark.operators.similarity import hyperplane_sketch
    from pyspark.sql import functions as F

    buckets = emb.select(
        hyperplane_sketch(F.col("embedding"), 16, bits=8).alias("b")
    ).groupBy("b").count().collect()
    assert len(buckets) > 10  # vectors actually spread across buckets


def test_append_ann_index_incremental(spark, emb, tmp_path):
    """Index maintenance without rebuild: appended vectors are probe-visible,
    replays are no-ops (idempotent append), and a mismatched sketch family
    is rejected via the _meta sidecar."""
    import pytest
    from pyspark.sql import functions as F

    from final_ocr_spark.operators.similarity import (
        ann_index_topk, append_ann_index, build_ann_index,
    )

    idx = build_ann_index(emb, str(tmp_path / "idx"), dim=16, bits=8, seed=11)
    base_ids = {r["vec_id"] for r in spark.read.parquet(idx).select("vec_id").collect()}

    # a new vector: exact copy of an existing one, new id — its top-1 by
    # cosine must be itself or the twin (score 1.0), proving the appended
    # row landed in the probed bucket
    twin_src = emb.limit(1).collect()[0]
    new = spark.createDataFrame(
        [(999001, twin_src["embedding"])], "vec_id long, embedding array<double>"
    )
    r = append_ann_index(new, idx)
    assert (r["rows_in"], r["rows_appended"]) == (1, 1)
    top = ann_index_topk(
        spark, idx, list(twin_src["embedding"]), k=2, bits=8, seed=11
    ).collect()
    assert {t["vec_id"] for t in top} == {twin_src["vec_id"], 999001}

    # replay: same batch again -> nothing appended
    r2 = append_ann_index(new, idx)
    assert (r2["rows_in"], r2["rows_appended"]) == (1, 0)
    ids = [r["vec_id"] for r in spark.read.parquet(idx).select("vec_id").collect()]
    assert len(ids) == len(set(ids)) == len(base_ids) + 1

    # family mismatch fails loudly
    with pytest.raises(ValueError, match="bits"):
        append_ann_index(new, idx, bits=10)
    with pytest.raises(ValueError, match="seed"):
        append_ann_index(new, idx, seed=7)

    # wrong-dimension batch refused (would zip against hyperplanes as null
    # and bucket everything into 0 — silent index corruption)
    short = spark.createDataFrame(
        [(999002, [1.0, 2.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="dimension"):
        append_ann_index(short, idx)

    # duplicate ids WITHIN a batch collapse deterministically (smallest
    # content-hash row wins) before the anti-join
    v_a = [float(i) for i in range(16)]
    v_b = [float(16 - i) for i in range(16)]
    dup = spark.createDataFrame(
        [(999003, v_a), (999003, v_b)], "vec_id long, embedding array<double>"
    )
    r3 = append_ann_index(dup, idx)
    assert (r3["rows_in"], r3["rows_unique"], r3["rows_appended"]) == (2, 1, 1)
    kept = spark.read.parquet(idx).filter(F.col("vec_id") == 999003).collect()
    assert len(kept) == 1

    # probe resolves bits/seed from the _meta sidecar when not given
    top2 = ann_index_topk(spark, idx, list(twin_src["embedding"]), k=2).collect()
    assert {t["vec_id"] for t in top2} == {twin_src["vec_id"], 999001}
    with pytest.raises(ValueError, match="bits"):
        ann_index_topk(spark, idx, list(twin_src["embedding"]), k=2, bits=10)


def test_append_ann_index_bloom_prefilter(spark, emb, tmp_path):
    """The append's idempotence anti-join is Bloom-prefiltered: the first
    bloom-enabled append bootstraps an id-Bloom sidecar from the index id
    column, an all-new batch SKIPS the exact anti-join entirely (stats
    prove the join never ran), an overlapping replay routes only the
    maybe-seen remainder through it and appends nothing, and a mixed-family
    sidecar is rejected loudly."""
    import pathlib

    import pytest

    from final_ocr_spark.operators.similarity import (
        ID_BLOOM_SUBDIR, append_ann_index, build_ann_index,
    )

    idx = build_ann_index(emb, str(tmp_path / "idx"), dim=16, bits=8, seed=11)

    # first append bootstraps append_id=0 (index ids) + writes append_id=1
    a = spark.createDataFrame(
        [(800001, [float(i) for i in range(16)])],
        "vec_id long, embedding array<double>",
    )
    r = append_ann_index(a, idx)
    assert r["bloom_prefilter"] and r["rows_appended"] == 1
    side = pathlib.Path(idx) / ID_BLOOM_SUBDIR

    def _parts():
        # data partitions only — slot-claim markers are dotfiles
        return {p.name for p in side.iterdir() if not p.name.startswith(".")}

    assert _parts() == {"append_id=0", "append_id=1"}

    # all-new batch: every id is "definitely new" -> the O(index) exact
    # anti-join is skipped (this is the 10^12-row contract)
    b = spark.createDataFrame(
        [(800002, [float(16 - i) for i in range(16)])],
        "vec_id long, embedding array<double>",
    )
    r2 = append_ann_index(b, idx)
    assert r2["bloom_prefilter"] and r2["exact_join_skipped"]
    assert (r2["maybe_seen_rows"], r2["rows_appended"]) == (0, 1)

    # replay of b: its id is maybe-seen (it IS seen) -> exact anti-join runs
    # over exactly that one row and drops it; nothing appended, no new
    # sidecar partition
    n_parts = len(_parts())
    r3 = append_ann_index(b, idx)
    assert not r3["exact_join_skipped"]
    assert (r3["maybe_seen_rows"], r3["rows_appended"]) == (1, 0)
    assert len(_parts()) == n_parts

    # ids stay unique across the whole dance
    ids = [x["vec_id"] for x in spark.read.parquet(idx).select("vec_id").collect()]
    assert len(ids) == len(set(ids))

    # mixed (m_bits, k) sidecar families refuse to merge
    from final_ocr_spark.operators.bloom import build_bloom

    build_bloom(a.select("vec_id"), "vec_id", m_bits=4096, k_hashes=3).write.mode(
        "overwrite"
    ).parquet(f"{idx}/{ID_BLOOM_SUBDIR}/append_id=99")
    with pytest.raises(ValueError, match="mixed"):
        append_ann_index(b, idx)


def test_append_ann_index_concurrent_slots_never_clobber(spark, emb, tmp_path):
    """Concurrent appends must land in DISTINCT Bloom-sidecar partitions:
    the slot is claimed via a filesystem CAS, so a stale writer that loaded
    the same sidecar state (same max append_id) moves to the next free slot
    instead of mode('overwrite')-clobbering the winner's filter — which
    would be a PERMANENT false negative re-admitting the loser's ids on
    every future append (review-caught race)."""
    import pathlib

    from final_ocr_spark.operators.similarity import (
        ID_BLOOM_SUBDIR, _claim_append_id, append_ann_index, build_ann_index,
    )

    idx = build_ann_index(emb, str(tmp_path / "idx"), dim=16, bits=8, seed=11)
    a = spark.createDataFrame(
        [(800001, [float(i) for i in range(16)])],
        "vec_id long, embedding array<double>",
    )
    append_ann_index(a, idx)  # bootstrap (slot 0) + batch (slot 1)
    side = pathlib.Path(idx) / ID_BLOOM_SUBDIR

    # writer A holds slot 2 (claimed, filter not yet visible — the race
    # window); writer B loaded the same sidecar state and would also
    # compute next=2 — the claim walks it to 3 and slot 2 stays untouched
    (side / ".claim-2").touch()
    b = spark.createDataFrame(
        [(800002, [float(16 - i) for i in range(16)])],
        "vec_id long, embedding array<double>",
    )
    r = append_ann_index(b, idx)
    assert r["rows_appended"] == 1
    names = {p.name for p in side.iterdir() if not p.name.startswith(".")}
    assert "append_id=3" in names and "append_id=2" not in names
    # committed slots release their claim markers (only the planted
    # in-flight .claim-2 remains) — markers never accumulate per append
    assert {p.name for p in side.glob(".claim-*")} == {".claim-2"}

    # a store copied WITHOUT dotfiles keeps partitions but loses markers —
    # the claim must still skip the existing data directories (0, 1, 3)
    # and hand out the genuinely-free slot 2 (its claimant never wrote)
    for m in side.glob(".claim-*"):
        m.unlink()
    assert _claim_append_id(spark, idx, 0) == 2

    # remote URI: no local CAS — degrades to the caller's start
    # (single-writer assumption, documented)
    assert _claim_append_id(spark, "hdfs://nn/warehouse/idx", 7) == 7

    # and b's id remains probe-visible through the merged filter: replaying
    # b appends nothing (no false negative from the race handling)
    r2 = append_ann_index(b, idx)
    assert r2["rows_appended"] == 0 and r2["maybe_seen_rows"] == 1


def test_append_ann_index_ignores_uncommitted_sidecar_partitions(
    spark, emb, tmp_path
):
    """A sidecar partition whose write job never COMMITTED (no _SUCCESS —
    a writer crashed mid-write, possibly leaving partial-but-visible files
    under a direct committer) must be EXCLUDED from the merged filter:
    trusting a partial filter would answer 'definitely new' for ids that
    ARE in the index and silently re-admit them (review-caught). Exclusion
    is safe under the sidecar-BEFORE-data ordering: an uncommitted batch
    filter means that batch's data never landed, and an uncommitted
    bootstrap aborts its append before any batch partition exists — so the
    committed partitions always cover every id actually in the index."""
    import pathlib

    from final_ocr_spark.operators.bloom import build_bloom
    from final_ocr_spark.operators.similarity import (
        ID_BLOOM_SUBDIR, append_ann_index, build_ann_index,
    )

    # --- scenario A: a BATCH append crashed mid-sidecar-write -----------
    idx = build_ann_index(emb, str(tmp_path / "idx"), dim=16, bits=8, seed=11)
    a = spark.createDataFrame(
        [(800001, [float(i) for i in range(16)])],
        "vec_id long, embedding array<double>",
    )
    append_ann_index(a, idx)  # bootstrap slot 0 + batch slot 1
    side = pathlib.Path(idx) / ID_BLOOM_SUBDIR

    # the crashed writer's partition: covers b's id, never committed, and
    # (per the write ordering) b's DATA never reached the index
    b = spark.createDataFrame(
        [(900001, [float(16 - i) for i in range(16)])],
        "vec_id long, embedding array<double>",
    )
    build_bloom(
        b.select("vec_id"), "vec_id", m_bits=1 << 20, k_hashes=5
    ).write.parquet(f"{idx}/{ID_BLOOM_SUBDIR}/append_id=2")
    (side / "append_id=2" / "_SUCCESS").unlink()

    # replaying the crashed batch: the partial filter is ignored (counted
    # in stats), so b lands — if the partial partition were trusted, the
    # outcome would still be correct here, but the committed filters must
    # keep working regardless
    r = append_ann_index(b, idx)
    assert r["sidecar_incomplete_parts"] == 1 and r["rows_appended"] == 1
    assert append_ann_index(a, idx)["rows_appended"] == 0  # still idempotent

    # --- scenario B: the BOOTSTRAP crashed mid-write ---------------------
    # (the dangerous case: a partial bootstrap is the only partition, and
    # it under-covers ids that ARE in the base index)
    idx2 = build_ann_index(emb, str(tmp_path / "idx2"), dim=16, bits=8, seed=11)
    side2 = pathlib.Path(idx2) / ID_BLOOM_SUBDIR
    ghost = spark.createDataFrame([(123456789,)], "vec_id long")
    build_bloom(
        ghost, "vec_id", m_bits=1 << 20, k_hashes=5
    ).write.parquet(f"{idx2}/{ID_BLOOM_SUBDIR}/append_id=0")
    (side2 / "append_id=0" / "_SUCCESS").unlink()

    # replay a batch of ids ALREADY in the base index: the loader must
    # refuse the partial filter (zero committed partitions -> fresh
    # bootstrap in a NEW slot) and append nothing
    base_batch = emb.limit(5).select("vec_id", "embedding")
    r2 = append_ann_index(base_batch, idx2)
    assert r2["bloom_prefilter"] and r2["rows_appended"] == 0
    assert r2["sidecar_incomplete_parts"] == 1
    committed = {p.parent.name for p in side2.glob("append_id=*/_SUCCESS")}
    assert committed == {"append_id=1"}  # fresh slot; slot 0 stays inert

    # the healed filter covers the base index: an all-new batch skips the
    # exact join, the base replay still appends nothing, ids stay unique
    r3 = append_ann_index(b, idx2)
    assert r3["exact_join_skipped"] and r3["rows_appended"] == 1
    assert append_ann_index(base_batch, idx2)["rows_appended"] == 0
    ids = [x["vec_id"] for x in spark.read.parquet(idx2).select("vec_id").collect()]
    assert len(ids) == len(set(ids))


def test_append_ann_index_bootstrap_reads_back_sidecar(spark, emb, tmp_path):
    """The bootstrap append materializes the index-id Bloom ONCE: downstream
    membership probes read the written parquet back instead of re-executing
    the O(index) build_bloom lineage (which an unmaterialized DataFrame
    would do on every action — meta lookup + broadcast = two extra full
    index id scans per bootstrap, review-caught). Pinned by counting rows
    EVALUATED through build_bloom's results with an accumulator: exactly
    one evaluation per written sidecar partition."""
    import pathlib

    import final_ocr_spark.operators.bloom as bloom_mod
    from final_ocr_spark.operators.similarity import (
        ID_BLOOM_SUBDIR, append_ann_index, build_ann_index,
    )

    idx = build_ann_index(emb, str(tmp_path / "idx"), dim=16, bits=8, seed=11)

    acc = spark.sparkContext.accumulator(0)
    real = bloom_mod.build_bloom

    def counting_build_bloom(df, key, **kw):
        out = real(df, key, **kw)

        def bump(batches):
            for pdf in batches:
                acc.add(len(pdf))
                yield pdf

        return out.mapInPandas(bump, out.schema)

    bloom_mod.build_bloom = counting_build_bloom
    try:
        batch = spark.createDataFrame(
            [(800001, [float(i) for i in range(16)])],
            "vec_id long, embedding array<double>",
        )
        r = append_ann_index(batch, idx)  # bootstrap + batch sidecar writes
    finally:
        bloom_mod.build_bloom = real
    assert r["bloom_prefilter"] and r["rows_appended"] == 1

    side = pathlib.Path(idx) / ID_BLOOM_SUBDIR
    written = spark.read.schema(
        "word_idx long, bits long, m_bits int, k int"
    ).parquet(str(side)).count()
    # every build_bloom result row was evaluated exactly once — by its own
    # write; re-executed lineage would multiply the bootstrap partition's
    # row count into the accumulator
    assert acc.value == written


def test_semantic_dedup_planted_groups(spark):
    """Planted semantic-duplicate groups collapse to their min-key member;
    brute-force cosine over the pair graph is the ground truth."""
    from final_ocr_spark.operators.similarity import semantic_dedup

    rng = random.Random(21)
    rows = [(i, [rng.gauss(0, 1) for _ in range(16)]) for i in range(120)]
    # group 1: two jittered copies of vec 3 (chain 3 ~ 9001 ~ 9002)
    rows.append((9001, [x + 0.001 for x in rows[3][1]]))
    rows.append((9002, [x - 0.001 for x in rows[3][1]]))
    # group 2: one copy of vec 7
    rows.append((9003, [x * 1.0005 for x in rows[7][1]]))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    kept = {r["vec_id"] for r in semantic_dedup(df, threshold=0.999).collect()}

    # ground truth: brute-force pairs >= threshold, transitive closure
    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b)))

    parent = {i: i for i, _ in rows}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for ai in range(len(rows)):
        for bi in range(ai + 1, len(rows)):
            if cos(rows[ai][1], rows[bi][1]) >= 0.999:
                parent[find(rows[ai][0])] = find(rows[bi][0])
    groups = {}
    for i, _ in rows:
        groups.setdefault(find(i), []).append(i)
    want = {min(g) for g in groups.values()}
    assert kept == want
    # sanity on the plant: dup group members are gone, originals survive
    assert {3, 7}.issubset(kept)
    assert not {9001, 9002, 9003} & kept


def test_semantic_dedup_kmeans_paper_semantics(spark):
    """Paper-faithful SemDeDup variant: k-means blocking, and the survivor
    of each duplicate group is the LEAST-PROTOTYPICAL member (lowest cosine
    to its k-means centroid = largest dist), not the min key."""
    from final_ocr_spark.operators.similarity import semantic_dedup_kmeans

    def unit(v):
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    rows = [
        # blob A: a dup group of three; a3 is the group's outlier (farthest
        # from the blob centroid) and must be the survivor
        ("a1", unit([1.0, 0.0, 0.0, 0.0])),
        ("a2", unit([0.9995, 0.001, 0.0, 0.0])),
        ("a3", unit([0.97, 0.05, 0.0, 0.0])),
        # blob B: a dup pair. solo (below) lands in the SAME k-means
        # cluster and pulls the centroid toward b2's side, so the
        # least-prototypical pair member is b1 — prototypicality is
        # measured against the CLUSTER centroid (all members), not the
        # dup group's own mean
        ("b1", unit([0.0, 0.0, 0.0, 1.0])),
        ("b2", unit([0.0, 0.0, 0.04, 0.998])),
        # solo in blob B's half-space but below threshold to both b's
        ("solo", unit([0.0, 0.0, 0.6, 0.8])),
        # no vector: kept unconditionally
        ("novec", None),
    ]
    df = spark.createDataFrame(rows, "vec_id string, embedding array<double>")

    kept = {
        r["vec_id"]
        for r in semantic_dedup_kmeans(
            df, k=2, threshold=0.99, max_iters=10, seed=0
        ).collect()
    }
    assert kept == {"a3", "b1", "solo", "novec"}

    # min_key mode: the engine's standard deterministic representative
    kept_min = {
        r["vec_id"]
        for r in semantic_dedup_kmeans(
            df, k=2, threshold=0.99, max_iters=10, seed=0, keep="min_key"
        ).collect()
    }
    assert kept_min == {"a1", "b1", "solo", "novec"}

    import pytest as _pytest
    with _pytest.raises(ValueError, match="keep must be"):
        semantic_dedup_kmeans(df, k=2, keep="random")


def test_semantic_dedup_kmeans_matches_lsh_partition_on_blocked_groups(spark):
    """On well-separated planted groups the kmeans and LSH variants must
    agree on WHICH docs are duplicates (group membership), differing only
    in the representative rule."""
    from final_ocr_spark.operators.similarity import (
        semantic_dedup, semantic_dedup_kmeans,
    )

    rng = random.Random(5)
    rows = [(f"r{i:03d}", [rng.gauss(0, 1) for _ in range(16)]) for i in range(60)]
    rows.append(("z-dup1", [x + 0.0005 for x in rows[10][1]]))
    rows.append(("z-dup2", [x - 0.0005 for x in rows[10][1]]))
    df = spark.createDataFrame(rows, "vec_id string, embedding array<double>")

    lsh_kept = {r["vec_id"] for r in semantic_dedup(df, threshold=0.999).collect()}
    km_kept = {
        r["vec_id"]
        for r in semantic_dedup_kmeans(
            df, k=4, threshold=0.999, max_iters=10, seed=1, keep="min_key"
        ).collect()
    }
    # both must drop exactly two of the three group members; kmeans can
    # only MISS a pair if k-means split the planted group across clusters
    # (not possible here: jitter 5e-4 vs inter-point distances ~5)
    assert len(lsh_kept) == len(km_kept) == 60  # 62 rows − 2 dropped dups
    assert lsh_kept == km_kept  # same group → same min-key representative
