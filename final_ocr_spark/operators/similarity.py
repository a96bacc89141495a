"""Similarity search over embedding columns (training-data pipeline op).

Three tiers, all deterministic:

* ``cosine_topk`` — brute-force cosine against ONE query vector, pure JVM
  array math (``zip_with``/``aggregate``), broadcast of the query. The
  correctness baseline; O(N·d) per query.
* ``cosine_topk_batch`` — many queries at once: Arrow-batched numpy matmul
  inside ``mapInPandas`` (the vectorized path — one BLAS call per batch),
  then a global top-k per query. The workhorse for bulk retrieval.
* ``lsh_topk`` — random-hyperplane LSH: 16-bit sign sketch JVM-side, probe
  the query's bucket ± multiprobe neighbors, exact re-rank inside the
  candidate set. The 10^12-row scale path: the bucket join prunes the
  candidate set by ~2^bits before any distance math.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, v: s + v))


def cosine_topk(
    emb: DataFrame, query_vec: list[float], k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k vs one literal query vector (JVM-side)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    v = F.col(vec_col).cast("array<double>")
    # |q| computed ONCE on the driver (r6): interpreted HOF folds are not
    # constant-folded, so _norm(q) re-ran a dim-element fold per row for a
    # literal. Python floats are IEEE doubles and this replays _norm's
    # exact sequence (s + x*x left-to-right, then sqrt) — bit-identical.
    nq = 0.0
    for x in query_vec:
        nq += float(x) * float(x)
    cos = _dot(v, q) / (_norm(v) * F.lit(math.sqrt(nq)))
    return (
        emb.select(F.col(id_col), cos.alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


def cosine_topk_batch(
    emb: DataFrame, queries: DataFrame, k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
    qid_col: str = "query_id", qvec_col: str = "query_vec",
) -> DataFrame:
    """Top-k per query for a (small, broadcastable) query set.

    Plan: collect queries to a numpy matrix (they are the small side by
    contract), broadcast into a ``mapInPandas`` over the embedding table —
    one matmul per Arrow batch — emit per-batch local top-k, then global
    top-k per query via one window over (n_batches × k × n_queries) rows.
    Embedding table is never shuffled; only candidate rows are.
    """
    import numpy as np
    import pandas as pd

    qrows = queries.select(qid_col, qvec_col).collect()
    qids = [r[qid_col] for r in qrows]
    qmat = np.array([list(r[qvec_col]) for r in qrows], dtype=np.float64)
    qmat = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
    sc = emb.sparkSession.sparkContext
    bc = sc.broadcast((qids, qmat))

    def score(batches):
        qids_, qmat_ = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            vm = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            vm = vm / np.maximum(np.linalg.norm(vm, axis=1, keepdims=True), 1e-12)
            sims = vm @ qmat_.T  # (batch, nq)
            out = []
            for qi, qid in enumerate(qids_):
                col = sims[:, qi]
                top = np.argsort(-col)[:k]
                out.append(pd.DataFrame({
                    "query_id": qid,
                    id_col: pdf[id_col].iloc[top].to_numpy(),
                    "cos_sim": col[top],
                }))
            yield pd.concat(out, ignore_index=True)

    local = emb.select(id_col, vec_col).mapInPandas(
        score, schema=f"query_id long, {id_col} long, cos_sim double"
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col(id_col))
    return (
        local.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def hyperplane_sketch(vec_col, dim: int, bits: int = 16, seed: int = 11):
    """Column expr: LSH sign sketch (int) of an embedding — bit i is the sign
    of dot(v, r_i) for seeded random hyperplanes r_i. JVM-side."""
    rng = random.Random(seed)
    planes = [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(bits)]
    v = vec_col.cast("array<double>")
    total = None
    for i, p in enumerate(planes):
        arr = F.array(*[F.lit(x) for x in p])
        bit = F.when(_dot(v, arr) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        total = bit if total is None else total + bit
    return total


def embedding_near_dups(
    emb: DataFrame, threshold: float = 0.95,
    id_col: str = "vec_id", vec_col: str = "embedding",
    dim: int | None = None, bits: int = 12, seed: int = 11,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (training-data dedup op).

    Scale path: hyperplane sign-sketch blocking — near-identical vectors land
    in the same bucket (or a 1-bit-flip neighbor) — then exact cosine only
    inside candidate groups. Blocking explodes each row into bits+1 probe
    buckets (own bucket + single-bit flips on the row side ensures any pair
    within hamming 1 of each other's sketch meets), so the self-join never
    goes all-pairs. Returns (key_a, key_b, cos_sim) with key_a < key_b.
    """
    if dim is None:
        first = emb.select(vec_col).first()
        dim = len(first[0])
    sk = hyperplane_sketch(F.col(vec_col), dim, bits, seed)
    # norm precomputed ONCE per vector (r6): the cosine below is an
    # interpreted HOF fold per pair, and computing |v| pair-side tripled
    # that work (1 dot + 2 norm folds per candidate). Same doubles, same
    # division — bit-identical cos_sim.
    v = F.col(vec_col).cast("array<double>")
    base = emb.select(
        F.col(id_col).alias("k"), v.alias("v"), _norm(v).alias("nv"),
        sk.alias("b"),
    ).localCheckpoint(eager=False)  # consumed by the blocking join AND the
    # verify rejoin; GC-cleaned, unlike persist (see dedup.minhash_near_dups)

    # KEY-ONLY blocking join: the exploded probe rows carry (k, bucket) only —
    # never the vector. At 768-dim × 10^12 rows, carrying vectors through the
    # (bits+1)-way explode would make the bucket-join shuffle payload
    # (bits+1)·dim doubles per row; keys-only is ~100× slimmer, and the full
    # vectors rejoin only for the surviving candidate pairs (same pattern as
    # dedup.py's minhash pair join).
    slim = base.select("k", "b")
    flips = F.array(
        F.col("b"), *[F.col("b").bitwiseXOR(F.lit(1 << i)) for i in range(bits)]
    )
    left = slim.select("k", F.explode(flips).alias("bucket"))
    right = slim.select(F.col("k").alias("k2"), F.col("b").alias("bucket"))
    cand = (
        left.join(right, "bucket")
        .filter(F.col("k") < F.col("k2"))
        .select("k", "k2")
        .dropDuplicates(["k", "k2"])
    )
    # rejoin vectors (+ precomputed norms) for the survivors only
    pairs = cand.join(base.select("k", "v", "nv"), "k").join(
        base.select(
            F.col("k").alias("k2"), F.col("v").alias("v2"),
            F.col("nv").alias("nv2"),
        ),
        "k2",
    )
    cos = _dot(F.col("v"), F.col("v2")) / (F.col("nv") * F.col("nv2"))
    return (
        pairs.select(
            F.col("k").alias("key_a"), F.col("k2").alias("key_b"),
            cos.alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def _query_bucket(query_vec: list[float], bits: int, seed: int) -> int:
    """Driver-side bucket of a query vector under the same seeded planes."""
    rng = random.Random(seed)
    dim = len(query_vec)
    planes = [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(bits)]
    qb = 0
    for i, p in enumerate(planes):
        if sum(a * b for a, b in zip(query_vec, p)) >= 0:
            qb |= 1 << i
    return qb


def _probe_set(qb: int, bits: int, multiprobe: int) -> list[int]:
    probes = {qb}
    if multiprobe >= 1:
        probes |= {qb ^ (1 << i) for i in range(bits)}
    if multiprobe >= 2:
        probes |= {qb ^ (1 << i) ^ (1 << j) for i in range(bits) for j in range(i)}
    return sorted(probes)


def build_ann_index(
    emb: DataFrame, out_dir: str,
    id_col: str = "vec_id", vec_col: str = "embedding",
    dim: int | None = None, bits: int = 12, seed: int = 11,
) -> str:
    """Materialize the ANN index: (id, vector, bucket) parquet PARTITIONED BY
    bucket. Build cost is one scan; after that every query is an index probe —
    the bucket filter becomes a partition filter (directory pruning), so a
    query reads ~N·(1+bits·multiprobe)/2^bits rows instead of N. This is the
    10^12-row shape: the round-1 ``lsh_topk`` recomputed the sketch over the
    FULL table per query (a full scan per query is not ANN at scale).
    """
    if dim is None:
        first = emb.select(vec_col).first()
        dim = len(first[0])
    sk = hyperplane_sketch(F.col(vec_col), dim, bits, seed)
    (
        emb.select(
            F.col(id_col), F.col(vec_col).cast("array<double>").alias(vec_col),
            sk.alias("bucket"),
        )
        .repartition("bucket")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(out_dir)
    )
    # sketch-family sidecar under an underscore path (parquet readers skip
    # `_*` dirs): append_ann_index validates against it — vectors bucketed
    # with different bits/seed/dim would silently land in garbage buckets
    emb.sparkSession.createDataFrame(
        [(int(dim), int(bits), int(seed))], "dim int, bits int, seed int"
    ).coalesce(1).write.mode("overwrite").parquet(f"{out_dir}/_meta")
    return out_dir


def _index_meta(spark, index_dir: str):
    """The (dim, bits, seed) sidecar row, or None for a pre-sidecar index."""
    from final_ocr_spark.sources.readers import read_optional

    meta = read_optional(spark, f"{index_dir}/_meta")
    return meta.first() if meta is not None else None


def _resolve_family(meta, bits, seed, index_dir: str, *, what: str):
    """bits/seed for an index operation: default from the _meta sidecar,
    VALIDATE against it when given explicitly, and for pre-sidecar indexes
    fall back to the caller's values (or the historical defaults 12/11,
    matching every index built before the sidecar existed)."""
    if meta is None:
        return (12 if bits is None else bits), (11 if seed is None else seed)
    mbits, mseed = int(meta["bits"]), int(meta["seed"])
    if bits is not None and bits != mbits:
        raise ValueError(
            f"index {index_dir} was built with bits={mbits}, {what} called "
            f"with bits={bits}: sketch families don't mix"
        )
    if seed is not None and seed != mseed:
        raise ValueError(
            f"index {index_dir} was built with seed={mseed}, {what} called "
            f"with seed={seed}: sketch families don't mix"
        )
    return mbits, mseed


ID_BLOOM_SUBDIR = "_id_bloom"
_ID_BLOOM_SCHEMA = "word_idx long, bits long, m_bits int, k int"


def _sidecar_partitions(spark, side_dir: str):
    """List the sidecar's ``append_id=N`` partition dirs via the Hadoop
    filesystem API (works on local paths AND hdfs://-style URIs), split by
    job-commit completeness: a partition is COMPLETE only if its write job
    committed (``_SUCCESS`` present). Returns
    ``(complete_paths, incomplete_names, max_id)`` with ``max_id = -1``
    when no partitions exist.

    TWO listings total (one ``globStatus`` for the markers, one
    ``listStatus`` for the dirs) regardless of how many appends exist — a
    per-partition ``exists`` probe would be O(total appends) sequential
    driver round-trips per append on an object store (review-caught).

    Portability notes: (a) the py4j ``_jvm`` access requires a classic
    (non-Connect) SparkSession — which :func:`session.get_spark` builds;
    (b) a store whose partitions were all written BEFORE this completeness
    gate existed, on a cluster with ``marksuccessfuljobs`` disabled, has no
    ``_SUCCESS`` anywhere: the first post-upgrade append safely (one-time)
    re-bootstraps, and the old partitions stay counted in ``n_incomplete``
    until the operator removes them — indistinguishable from crash litter
    by design, since a genuinely-partial partition looks identical."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(side_dir)
    fs = path.getFileSystem(conf)
    if not fs.exists(path):
        return [], [], -1
    committed = set()
    marks = fs.globStatus(
        jvm.org.apache.hadoop.fs.Path(side_dir + "/append_id=*/_SUCCESS")
    )
    if marks is not None:
        for st in marks:
            committed.add(st.getPath().getParent().getName())
    complete, incomplete, max_id = [], [], -1
    for st in fs.listStatus(path):
        name = st.getPath().getName()
        if not st.isDirectory() or not name.startswith("append_id="):
            continue
        try:
            max_id = max(max_id, int(name.split("=", 1)[1]))
        except ValueError:
            continue
        if name in committed:
            complete.append(str(st.getPath()))
        else:
            incomplete.append(name)
    return complete, incomplete, max_id


def _load_id_bloom(spark, index_dir: str):
    """(merged_bloom | None, bloom_meta | None, next_append_id,
    n_incomplete) from the ``_id_bloom`` sidecar — one Bloom partition per
    append, merged via one ``bit_or`` group-by (the filters are a few MB at
    billions of ids). Mixed (m_bits, k) families are rejected loudly:
    merging them would corrupt bits silently, including FALSE NEGATIVES.

    Partitions whose write job never COMMITTED (no ``_SUCCESS`` — a writer
    crashed mid-write, or a direct-commit task left partial files) are
    EXCLUDED from the merge: trusting a partial filter would report ids
    that ARE in the index as definitely-new (silent duplicates,
    review-caught). Excluding them is provably safe under the
    sidecar-BEFORE-data crash ordering: an uncommitted sidecar means that
    append's data never landed, so the complete partitions still cover
    every id actually in the index. With zero complete partitions the
    caller re-bootstraps from the index id column into a fresh slot and
    the filter heals automatically; stale partial partitions are inert
    litter, surfaced via ``n_incomplete`` for operator cleanup."""
    from final_ocr_spark.operators.bloom import merge_bloom_partitions

    side = f"{index_dir}/{ID_BLOOM_SUBDIR}"
    complete, incomplete, max_id = _sidecar_partitions(spark, side)
    next_id = max_id + 1
    if not complete:
        return None, None, next_id, len(incomplete)
    bl = spark.read.schema(_ID_BLOOM_SCHEMA).parquet(*complete)
    merged, meta = merge_bloom_partitions(
        bl,
        what=f"id-Bloom sidecar {side}",
        hint="; delete the sidecar (the next append rebuilds it from the "
        "index id column).",
    )
    if merged is None:
        return None, None, next_id, len(incomplete)
    return merged, meta, next_id, len(incomplete)


def _local_sidecar_dir(spark, index_dir: str):
    """Driver-local ``pathlib.Path`` of the sidecar dir IF it actually
    resolves to the local filesystem, else None.

    Path-syntax sniffing (``local_path``) is NOT enough here: a scheme-less
    ``/warehouse/idx`` on a cluster with ``fs.defaultFS=hdfs://nn`` is
    REMOTE — running the claim CAS against the driver's local disk would
    silently protect nothing while the data writes go to HDFS
    (review-caught). Explicit remote URIs are rejected cheaply by
    ``local_path`` (never instantiating a remote FileSystem client);
    local-LOOKING paths are confirmed through Hadoop's own resolution, so
    the claim lives on the same filesystem as the partitions it guards."""
    from final_ocr_spark.sources.readers import local_path

    side_dir = f"{index_dir}/{ID_BLOOM_SUBDIR}"
    if local_path(side_dir) is None:
        return None  # explicit remote URI
    import pathlib

    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(side_dir)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.getUri().getScheme() != "file":
        return None  # scheme-less path, but defaultFS is remote
    return pathlib.Path(fs.makeQualified(p).toUri().getPath())


def _claim_append_id(spark, index_dir: str, start: int) -> int:
    """Atomically claim a UNIQUE ``append_id`` partition slot for this
    writer's Bloom sidecar — the first free id >= ``start``, reserved by an
    ``O_CREAT|O_EXCL`` marker file (the same filesystem CAS the catalog's
    snapshot commit uses).

    Why a CAS and not max+1: two concurrent appends that both loaded the
    sidecar at max=N-1 would both compute N, and the SECOND
    ``mode('overwrite')`` write would clobber the first's Bloom partition —
    the clobbered append's ids would be in the index but permanently absent
    from the merged filter, a FALSE NEGATIVE that silently re-admits those
    ids on every future append (review-caught). With the claim, a stale
    writer discovers the taken slot at the filesystem and moves to the next
    one; both partitions survive and the bit_or merge covers both.

    The marker is a dotfile inside the sidecar dir, invisible to Spark's
    file listing. On a REMOTE sidecar (explicit hdfs://-style URI, or a
    scheme-less path whose ``fs.defaultFS`` is remote —
    :func:`_local_sidecar_dir` checks both) there is no local-FS atomic
    create — fall back to ``start`` and document the single-writer
    assumption, exactly like the catalog's commit CAS (SEAMS.md)."""
    import os

    side = _local_sidecar_dir(spark, index_dir)
    if side is None:
        return start  # remote store: single-writer assumption (SEAMS.md)
    side.mkdir(parents=True, exist_ok=True)
    n = start
    while True:
        try:
            fd = os.open(
                side / f".claim-{n}",
                os.O_CREAT | os.O_EXCL | os.O_WRONLY,
                0o644,
            )
            os.close(fd)
        except FileExistsError:
            n += 1
            continue
        # belt-and-suspenders: a store copied without dotfiles loses the
        # markers but keeps the partitions — never hand out a slot whose
        # data directory already exists (and drop the marker we just made,
        # so walking past taken slots never re-litters them)
        if (side / f"append_id={n}").exists():
            (side / f".claim-{n}").unlink(missing_ok=True)
            n += 1
            continue
        return n


def _finalize_sidecar_slot(spark, index_dir: str, slot: int) -> None:
    """Post-write commit tail for a sidecar partition: guarantee the
    ``_SUCCESS`` completeness marker (clusters that disable
    ``marksuccessfuljobs`` would otherwise make every partition look
    crashed to :func:`_sidecar_partitions`), then release the local claim
    marker — once the data directory is visible, the dir-exists check in
    :func:`_claim_append_id` protects the slot, so markers only persist for
    in-flight (or crashed-in-window) writers instead of accumulating one
    per append forever (review-caught)."""
    jvm = spark._jvm
    part = jvm.org.apache.hadoop.fs.Path(
        f"{index_dir}/{ID_BLOOM_SUBDIR}/append_id={slot}"
    )
    fs = part.getFileSystem(spark._jsc.hadoopConfiguration())
    marker = jvm.org.apache.hadoop.fs.Path(part, "_SUCCESS")
    if not fs.exists(marker):
        fs.create(marker, True).close()

    side = _local_sidecar_dir(spark, index_dir)
    if side is not None:
        (side / f".claim-{slot}").unlink(missing_ok=True)


def append_ann_index(
    emb: DataFrame, index_dir: str,
    id_col: str = "vec_id", vec_col: str = "embedding",
    bits: int | None = None, seed: int | None = None,
    skip_existing: bool = True,
    use_bloom: bool = True,
    bloom_m_bits: int = 1 << 20, bloom_k: int = 5,
) -> dict:
    """Append new vectors to an existing :func:`build_ann_index` table
    WITHOUT rebuilding it — the embeddings-side analog of the streaming
    corpus ingest: index maintenance cost is O(|new batch|), never O(index).

    * bits/seed default from the index's ``_meta`` sidecar and are
      VALIDATED against it when given; the batch's vector DIMENSION is
      validated too — a mismatched sketch family or dim would bucket new
      vectors into garbage partitions and silently break every probe.
      Pre-sidecar indexes require explicit bits/seed (dim inferred from
      the batch) — see :func:`_resolve_family`.
    * duplicate ids WITHIN the batch keep the smallest (xxhash64(vector))
      row (deterministic), and ``skip_existing=True`` makes the append
      idempotent: re-running the same batch after a crash adds nothing.
    * the idempotence check is Bloom-prefiltered (``use_bloom=True``): an
      id-Bloom sidecar (one partition per append under
      ``_id_bloom/append_id=<n>``, the exact shape of the streaming
      corpus's key Bloom) answers "definitely new" for most of the batch
      with zero false negatives, so the exact anti-join against the
      index's id column — a column-pruned scan, but O(index) — runs only
      over the ``maybe_seen`` remainder (true overlap + ~fpp of the
      batch), and is SKIPPED entirely for all-new batches. The first
      bloom-enabled append over a legacy index pays one id scan to
      bootstrap the sidecar (``append_id=0``); every later append is
      O(|batch|). ``bloom_m_bits``/``bloom_k`` size NEW sidecars (size for
      the expected TOTAL index — an undersized filter saturates and
      degrades gracefully to the full anti-join's cost, never to wrong
      results); an existing sidecar's family is adopted automatically.
    * crash ordering: the batch's Bloom partition is written BEFORE the
      data append, so a crash between the two leaves ids in the filter
      that are not in the index — false POSITIVES (the exact anti-join
      resolves them), never false negatives (which would re-admit
      duplicates). A partition whose write job never COMMITTED (no
      ``_SUCCESS`` — crashed writer, direct-commit partial) is EXCLUDED
      from the merge, which the same ordering makes safe: its append's
      data never landed, so the committed partitions still cover every id
      in the index; zero committed partitions re-bootstrap automatically.
      Concurrent appends get DISTINCT filter-partition slots via a
      filesystem CAS (:func:`_claim_append_id`) rather than max+1, so a
      racing writer can never overwrite another's filter partition (which
      would be a permanent false negative); on remote URIs the CAS degrades
      to a documented single-writer assumption, like the catalog's commit.
      The slot CAS protects only the FILTER: the index DATA append is a
      plain ``mode('append')`` into a shared parquet directory, which —
      like any non-table-format parquet dir — still assumes ONE writer at
      a time (concurrent data appends contend on the shared staging dir
      and can both admit the same id once). If that assumption is
      violated, the failure direction is extra/duplicate DATA rows or
      filter entries whose rows were lost — false POSITIVES the exact
      anti-join resolves — never a corrupted filter; true multi-writer
      appends belong behind the catalog's commit protocol.
      Once a sidecar exists it is maintained on EVERY append
      (even ``use_bloom=False`` / ``skip_existing=False`` calls), because
      a missing partition would be a false negative for every future
      probe.
    * new rows land in their bucket's partition directory via
      ``mode('append')``; probes (:func:`ann_index_topk`) see them with no
      further work — the bucket partition filter prunes the same way.

    Returns {'rows_in', 'rows_unique', 'rows_appended', 'bloom_prefilter',
    'maybe_seen_rows', 'exact_join_skipped', 'sidecar_incomplete_parts'}."""
    from pyspark.sql import Window

    from final_ocr_spark.operators.bloom import (
        build_bloom, split_new_vs_maybe_seen,
    )

    spark = emb.sparkSession
    meta = _index_meta(spark, index_dir)
    bits, seed = _resolve_family(meta, bits, seed, index_dir, what="append")
    if meta is not None:
        dim = int(meta["dim"])
    else:
        first = emb.select(vec_col).first()
        dim = len(first[0])

    sk = hyperplane_sketch(F.col(vec_col), dim, bits, seed)
    # checkpoint the sketched batch BEFORE any counting/joining: emb may be
    # an expensive upstream chain, and it must evaluate exactly once
    sketched = emb.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias(vec_col),
        sk.alias("bucket"),
    ).localCheckpoint(eager=False)
    st = sketched.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.size(vec_col) != dim).cast("long")).alias("bad_dim"),
    ).first()
    n_in = int(st["n"])
    if st["bad_dim"]:
        raise ValueError(
            f"{st['bad_dim']} of {n_in} batch vectors do not have the "
            f"index dimension {dim} ({index_dir}): a mismatched dim zips "
            "against the hyperplanes as null and every bit falls to 0 — "
            "silent index corruption. Refusing to append."
        )

    # deterministic within-batch id dedup (same rule as the corpus ingest:
    # smallest content hash wins, stable under any partitioning)
    w = Window.partitionBy(id_col).orderBy(F.xxhash64(F.col(vec_col)).asc_nulls_last())
    new = (
        sketched.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    n_unique = new.count()  # cheap: reads the checkpointed sketch, not emb

    id_bloom, bloom_meta, next_append_id, n_incomplete = _load_id_bloom(
        spark, index_dir
    )
    stats = {
        "rows_in": n_in,
        "bloom_prefilter": False,
        "maybe_seen_rows": None,
        "exact_join_skipped": False,
        "sidecar_incomplete_parts": n_incomplete,
    }
    if id_bloom is None and use_bloom and skip_existing:
        # bootstrap: one column-pruned id scan of the legacy index, written
        # BEFORE any probing so the filter covers everything already there
        boot_id = _claim_append_id(spark, index_dir, next_append_id)
        build_bloom(
            spark.read.parquet(index_dir).select(F.col(id_col)),
            id_col, m_bits=bloom_m_bits, k_hashes=bloom_k,
        ).write.mode("overwrite").parquet(
            f"{index_dir}/{ID_BLOOM_SUBDIR}/append_id={boot_id}"
        )
        _finalize_sidecar_slot(spark, index_dir, boot_id)
        # READ BACK the materialized sidecar: probing the unmaterialized
        # build_bloom DataFrame would re-execute its O(index) lineage on
        # every downstream action (meta lookup + membership broadcast =
        # two extra full index id scans per bootstrap, review-caught);
        # the parquet read costs a few MB
        id_bloom = spark.read.schema(_ID_BLOOM_SCHEMA).parquet(
            f"{index_dir}/{ID_BLOOM_SUBDIR}/append_id={boot_id}"
        )
        bloom_meta, next_append_id = (bloom_m_bits, bloom_k), boot_id + 1

    if skip_existing:
        if use_bloom and id_bloom is not None:
            stats["bloom_prefilter"] = True
            definitely_new, maybe = split_new_vs_maybe_seen(new, id_bloom, id_col)
            n_maybe = maybe.count()
            stats["maybe_seen_rows"] = n_maybe
            if n_maybe == 0:
                stats["exact_join_skipped"] = True
                new = definitely_new
            else:
                existing = spark.read.parquet(index_dir).select(id_col)
                new = definitely_new.unionByName(
                    maybe.join(existing, id_col, "left_anti")
                )
        else:
            existing = spark.read.parquet(index_dir).select(id_col)
            new = new.join(existing, id_col, "left_anti")
        new = new.localCheckpoint(eager=False)
        n_new = new.count()
    else:
        n_new = n_unique
    if n_new:
        if bloom_meta is not None:
            # sidecar BEFORE data (see docstring crash-ordering contract);
            # the slot is CLAIMED, not assumed from max+1 — a concurrent
            # append that loaded the same sidecar state lands in the next
            # free slot instead of overwriting this one (which would be a
            # permanent false negative for every id in the loser's batch)
            part_id = _claim_append_id(spark, index_dir, next_append_id)
            build_bloom(
                new.select(F.col(id_col)), id_col,
                m_bits=bloom_meta[0], k_hashes=bloom_meta[1],
            ).write.mode("overwrite").parquet(
                f"{index_dir}/{ID_BLOOM_SUBDIR}/append_id={part_id}"
            )
            _finalize_sidecar_slot(spark, index_dir, part_id)
        new.repartition("bucket").write.mode("append").partitionBy(
            "bucket"
        ).parquet(index_dir)
    return {**stats, "rows_unique": n_unique, "rows_appended": n_new}


def ann_index_topk(
    spark, index_dir: str, query_vec: list[float], k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
    bits: int | None = None, seed: int | None = None, multiprobe: int = 1,
) -> DataFrame:
    """ANN query against a :func:`build_ann_index` table: probe the query's
    bucket (± 1-bit / 2-bit flips per ``multiprobe``) via PARTITION PRUNING,
    exact cosine re-rank inside the candidate set only.

    bits/seed default from the index's ``_meta`` sidecar and are validated
    against it when given — probing with the wrong family computes bucket
    ids no partition holds and silently returns few/zero candidates. For a
    pre-sidecar index the caller's values (or the historical 12/11
    defaults) apply unchecked."""
    bits, seed = _resolve_family(
        _index_meta(spark, index_dir), bits, seed, index_dir, what="probe"
    )
    qb = _query_bucket(query_vec, bits, seed)
    probes = _probe_set(qb, bits, multiprobe)
    # bucket is a partition column → this filter prunes directories at plan
    # time (PartitionFilters in the scan node), never touching other buckets
    cands = spark.read.parquet(index_dir).filter(F.col("bucket").isin(probes))
    return cosine_topk(cands, query_vec, k, id_col=id_col, vec_col=vec_col)


def build_ivf_index(
    emb: DataFrame, out_dir: str, n_lists: int = 64,
    id_col: str = "vec_id", vec_col: str = "embedding",
    sample_size: int = 4096, iters: int = 5, seed: int = 11,
) -> str:
    """IVF (inverted-file) ANN index: spherical k-means centroids over a
    bounded seeded sample, then every vector assigned to its nearest centroid
    and written PARTITIONED BY list_id. The other classic ANN scale path
    next to hyperplane LSH (build_ann_index): a query probes only its
    ``nprobe`` nearest lists via partition pruning — ~N·nprobe/n_lists rows.

    Centroid training is driver-side numpy over ``sample_size`` rows — the
    standard IVF recipe (train on a sample, assign distributed); assignment
    is an Arrow-batched numpy matmul, never per-row Python. Deterministic:
    seeded sample, fixed Lloyd iterations, ties broken by argmax order.
    Centroids are stored beside the index for the probe side.
    """
    import json
    import pathlib

    import numpy as np
    import pandas as pd

    base = emb.select(id_col, F.col(vec_col).cast("array<double>").alias(vec_col))
    sample = [
        r[vec_col]
        for r in base.orderBy(F.xxhash64(F.col(id_col).cast("string"), F.lit(seed)))
        .limit(sample_size).collect()
    ]
    mat = np.array(sample, dtype=np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    rng = np.random.RandomState(seed)
    cent = mat[rng.choice(len(mat), size=min(n_lists, len(mat)), replace=False)]
    for _ in range(iters):  # spherical k-means: assign → mean → renormalize
        assign = (mat @ cent.T).argmax(axis=1)
        for li in range(len(cent)):
            members = mat[assign == li]
            if len(members):
                c = members.mean(axis=0)
                cent[li] = c / max(np.linalg.norm(c), 1e-12)
    sc = emb.sparkSession.sparkContext
    bc = sc.broadcast(cent)

    def assign_lists(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            vm = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            vm /= np.maximum(np.linalg.norm(vm, axis=1, keepdims=True), 1e-12)
            pdf = pdf.copy()
            pdf["list_id"] = (vm @ bc.value.T).argmax(axis=1).astype("int32")
            yield pdf

    # derive the id type from the input — hardcoding 'long' broke string
    # doc keys (round-2 review finding)
    id_type = base.schema[id_col].dataType.simpleString()
    assigned = base.mapInPandas(
        assign_lists,
        schema=f"{id_col} {id_type}, {vec_col} array<double>, list_id int",
    )
    (
        assigned.repartition("list_id")
        .write.mode("overwrite")
        .partitionBy("list_id")
        .parquet(out_dir)
    )
    meta = {"n_lists": int(len(cent)), "seed": seed,
            "centroids": [[float(x) for x in c] for c in cent]}
    p = pathlib.Path(out_dir) / "_ivf_centroids.json"
    p.write_text(json.dumps(meta), encoding="utf-8")
    return out_dir


def ivf_topk(
    spark, index_dir: str, query_vec: list[float], k: int = 10,
    nprobe: int = 4, id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """IVF query: rank centroids driver-side, read only the ``nprobe``
    nearest lists (partition pruning), exact cosine re-rank inside them."""
    import json
    import pathlib

    import numpy as np

    meta = json.loads(
        (pathlib.Path(index_dir) / "_ivf_centroids.json").read_text(encoding="utf-8")
    )
    cent = np.array(meta["centroids"], dtype=np.float64)
    q = np.array(query_vec, dtype=np.float64)
    q /= max(np.linalg.norm(q), 1e-12)
    probes = [int(i) for i in (cent @ q).argsort()[::-1][:nprobe]]
    cands = spark.read.parquet(index_dir).filter(F.col("list_id").isin(probes))
    return cosine_topk(cands, query_vec, k, id_col=id_col, vec_col=vec_col)


def lsh_topk(
    emb: DataFrame, query_vec: list[float], k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
    bits: int = 12, seed: int = 11, multiprobe: int = 1,
) -> DataFrame:
    """One-shot ANN without a prebuilt index: sketch the table once, probe the
    query's bucket neighborhood, exact cosine re-rank inside the candidates.

    This scans the input once, so it only makes sense for a single ad-hoc
    query over an unindexed table. For repeated queries — the actual ANN
    workload — use :func:`build_ann_index` once + :func:`ann_index_topk` per
    query (partition-pruned probes, no rescan).
    """
    dim = len(query_vec)
    sketch = hyperplane_sketch(F.col(vec_col), dim, bits, seed)
    qb = _query_bucket(query_vec, bits, seed)
    probes = _probe_set(qb, bits, multiprobe)
    cands = emb.withColumn("_b", sketch).filter(F.col("_b").isin(probes))
    return cosine_topk(cands, query_vec, k, id_col=id_col, vec_col=vec_col)


def semantic_dedup(
    emb: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 12,
    seed: int = 11,
    algorithm: str = "jump",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023): drop all
    but one of any group of documents whose EMBEDDINGS are near-identical —
    paraphrases, templated rewrites, translations-of-boilerplate that no
    lexical (MinHash/substring) dedup can see.

    Composition of three already-oracle-checked operators, no new
    semantics: hyperplane-blocked cosine pairs (:func:`embedding_near_dups`
    — key-only blocking explode, vectors rejoin for survivors), connected
    components over the pair graph (``dedup_clusters`` — min-label+pointer
    jumping, or large-star/small-star via ``algorithm="star"``), then
    ``keep_cluster_representatives`` (min-key member survives).

    Deviation from the paper, documented: SemDeDup blocks candidates with
    k-means clusters and keeps the member with LOWEST centroid similarity;
    this uses seeded hyperplane LSH blocking (no trained centroids to ship,
    recall bounded by the hamming-1 probe set) and the engine's standard
    deterministic min-key representative. Returns the input rows minus
    dropped members (schema preserved).
    """
    from final_ocr_spark.operators.dedup import (
        dedup_clusters,
        keep_cluster_representatives,
    )

    pairs = embedding_near_dups(
        emb, threshold=threshold, id_col=id_col, vec_col=vec_col,
        bits=bits, seed=seed,
    ).select("key_a", "key_b")
    clusters = dedup_clusters(pairs, algorithm=algorithm)
    return keep_cluster_representatives(emb, clusters, key=id_col)


def semantic_dedup_kmeans(
    emb: DataFrame,
    k: int,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    algorithm: str = "jump",
    max_iters: int = 10,
    seed: int = 0,
    keep: str = "least_prototypical",
) -> DataFrame:
    """Paper-faithful SemDeDup (Abbas et al. 2023): k-means blocking +
    within-cluster exact cosine + the paper's representative rule.

    :func:`semantic_dedup` blocks candidates with seeded hyperplane LSH (no
    trained state, hamming-1 recall bound — the right default for one-shot
    dedup). This variant is the paper's own construction, now expressible
    because the engine grew a distributed k-means (operators/cluster.py):

    1. cluster all embeddings with deterministic k-means (k ≈ n/expected
       cluster size bounds the within-cluster pair work to (n/k)² per
       cluster — the paper's cost model; candidate pairs can never cross a
       cluster boundary, which is the recall/cost trade the paper makes);
    2. within each cluster, exact cosine over (key-only-joined) candidate
       pairs — vectors rejoin only for candidates, as everywhere else;
    3. connected components over the ≥threshold pair graph;
    4. per duplicate group keep the LEAST PROTOTYPICAL member — the paper
       keeps the example with LOWEST cosine to its cluster centroid
       ("keeping outliers preserves diversity"); on unit vectors that is
       the member with the LARGEST squared-L2 ``dist`` from
       :func:`~final_ocr_spark.operators.cluster.kmeans` (key tiebreak).
       ``keep="min_key"`` selects the engine's standard deterministic
       min-key representative instead.

    Rows whose embedding is NULL are kept unconditionally (no vector, no
    judgment — the embedder's loud-absence contract). Returns the input
    rows minus dropped members, schema preserved.
    """
    if keep not in ("least_prototypical", "min_key"):
        raise ValueError(
            f"keep must be 'least_prototypical' or 'min_key', got {keep!r}"
        )
    from pyspark.sql import Window

    from final_ocr_spark.operators.cluster import kmeans
    from final_ocr_spark.operators.dedup import dedup_clusters

    assigns, _, _ = kmeans(
        emb, k, key=id_col, vec_col=vec_col, max_iters=max_iters, seed=seed
    )
    # consumed by the blocking join and the representative pick
    assigns = assigns.localCheckpoint(eager=False)
    # norm precomputed ONCE per vector (r6): see semantic_dedup — the
    # pair-side cosine folds are interpreted, and |v| per pair was 2/3 of
    # them. Same doubles, bit-identical cos_sim.
    v = F.col(vec_col).cast("array<double>")
    base = (
        emb.select(F.col(id_col).alias("k"), v.alias("v"))
        .filter(F.col("v").isNotNull())
        .withColumn("nv", _norm(F.col("v")))
        .localCheckpoint(eager=False)
    )

    # KEY-ONLY blocking join on the cluster id (same slimness rule as the
    # LSH variant: vectors rejoin candidates, never ride the blocking join)
    slim = assigns.select(F.col(id_col).alias("k"), "cluster")
    cand = (
        slim.join(slim.select(F.col("k").alias("k2"), "cluster"), "cluster")
        .filter(F.col("k") < F.col("k2"))
        .select("k", "k2")
    )
    pairs = cand.join(base, "k").join(
        base.select(
            F.col("k").alias("k2"), F.col("v").alias("v2"),
            F.col("nv").alias("nv2"),
        ),
        "k2",
    )
    cos = _dot(F.col("v"), F.col("v2")) / (F.col("nv") * F.col("nv2"))
    dup_pairs = pairs.select(
        F.col("k").alias("key_a"), F.col("k2").alias("key_b"),
        cos.alias("cos_sim"),
    ).filter(F.col("cos_sim") >= threshold).select("key_a", "key_b")

    groups = dedup_clusters(dup_pairs, algorithm=algorithm)
    if keep == "min_key":
        from final_ocr_spark.operators.dedup import keep_cluster_representatives

        return keep_cluster_representatives(emb, groups, key=id_col)
    else:
        ranked = groups.join(
            assigns.select(F.col(id_col).alias("key"), "dist"), "key"
        )
        w = Window.partitionBy("cluster_id").orderBy(
            F.col("dist").desc(), F.col("key").asc()
        )
        losers = (
            ranked.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") > 1)
            .select(F.col("key").alias(id_col))
        )
    return emb.join(losers, id_col, "left_anti")
