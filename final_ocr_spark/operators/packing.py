"""Sequence packing for LLM training: map a document corpus onto the
fixed-token-budget training chunks formed by concatenating all documents in
a deterministic order and slicing every ``budget`` tokens (the GPT-style
packing layout — documents may span chunk boundaries).

The core primitive is a **global prefix sum** over a 10^12-row table. A
single ``Window.orderBy(key)`` is one task sorting the world — the
canonical scale-killer — so this does the classic two-pass form instead:

1. ``repartitionByRange(key)`` — RangePartitioner gives ordered, disjoint
   key ranges on ascending partition ids;
2. per-partition cumulative sum (window partitioned by partition id — each
   task sorts only its own range);
3. partition TOTALS (one row per partition — thousands, not trillions) are
   prefix-summed on the driver and broadcast-joined back as offsets.

The only driver-side work is O(num_partitions) — the standard
justified-collect shape (PLANS.md), same as IVF centroid training.

The reference repo stops at per-document text; packing is what its output
feeds at training time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def global_prefix_sum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "offset",
    num_partitions: int | None = None,
) -> DataFrame:
    """df + ``out_col`` = sum of ``value_col`` over all rows strictly before
    this row in ``order_col`` order (exclusive prefix sum). ``order_col``
    must be unique for a deterministic result, and ``value_col`` must be
    NON-NEGATIVE (per-partition totals are taken as max of the running
    sum, which equals the final sum only when it never decreases — token
    counts and byte sizes qualify; signed deltas do not)."""
    n = num_partitions or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    d = df.repartitionByRange(int(n), F.col(order_col))
    d = d.withColumn("_pid", F.spark_partition_id())
    w = Window.partitionBy("_pid").orderBy(order_col)
    d = d.withColumn(
        "_cum_incl", F.sum(F.col(value_col).cast("long")).over(w)
    )
    # materialize BEFORE the totals collect: the collect below and the
    # returned join are two separate jobs — without a barrier each re-runs
    # repartitionByRange, whose sampled boundaries (and thus _pid
    # assignments) are not guaranteed identical across runs, silently
    # corrupting every offset. Checkpointing also halves the compute.
    d = d.localCheckpoint(eager=False)
    # one row per partition — driver-side prefix is O(num_partitions)
    totals = sorted(
        (r["_pid"], r["_t"])
        for r in d.groupBy("_pid").agg(F.max("_cum_incl").alias("_t")).collect()
    )
    prefix, acc = {}, 0
    for pid, t in totals:
        prefix[pid] = acc
        acc += t or 0
    pref_df = df.sparkSession.createDataFrame(
        [(pid, p) for pid, p in prefix.items()], "_pid int, _prefix long"
    )
    return (
        d.join(F.broadcast(pref_df), "_pid")
        .withColumn(
            out_col,
            F.col("_prefix") + F.col("_cum_incl") - F.col(value_col).cast("long"),
        )
        .drop("_pid", "_cum_incl", "_prefix")
    )


def pack_sequences(
    df: DataFrame,
    order_col: str,
    token_col: str,
    budget: int,
) -> DataFrame:
    """df + packing layout columns:

    * ``offset`` — global token offset of the document's first token,
    * ``chunk_id`` — training chunk containing that first token,
    * ``pos_in_chunk`` — position inside that chunk,
    * ``n_chunks`` — number of chunks the document spans.

    All integer arithmetic (``x - pmod(x, b)`` division — float division
    flips vs other engines, PLANS.md pitfall)."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    d = global_prefix_sum(df, order_col, token_col)
    b = F.lit(budget)
    off = F.col("offset")
    end = off + F.col(token_col).cast("long")  # exclusive
    # true integer division (`div`), never `/`: long/long `/` is DOUBLE
    # division, which loses exactness past 2^53 — real at 10^12-doc global
    # token offsets (and would diverge from the oracle's integer `//`).
    d = d.withColumn("_last_tok", F.greatest(end - 1, off))
    return (
        d.withColumn("chunk_id", F.expr(f"offset div {budget}"))
        .withColumn("pos_in_chunk", F.pmod(off, b))
        .withColumn(
            "n_chunks",
            F.expr(f"_last_tok div {budget}") - F.col("chunk_id") + 1,
        )
        .drop("_last_tok")
    )


def pack_chunks(
    df: DataFrame,
    order_col: str,
    ids_col: str,
    budget: int,
    *,
    eos_id: int | None = None,
    pad_id: int | None = None,
    drop_last: bool = True,
    provenance: bool = False,
) -> DataFrame:
    """Materialize the packing layout: token-id arrays → the actual
    fixed-length training chunks. Returns one row per chunk:

    * ``chunk_id`` — dense global chunk index,
    * ``input_ids`` — exactly ``budget`` ids (documents concatenated in
      ``order_col`` order, GPT-style: documents span chunk boundaries),
    * ``n_tokens`` — real (pre-padding) token count in the chunk,
    * ``n_docs`` — documents contributing ≥1 token to the chunk.

    ``eos_id`` appends a document separator to every document before
    packing (the standard causal-LM layout). The final short chunk is
    dropped by default (``drop_last``), or right-padded when ``pad_id``
    is given.

    ``provenance=True`` adds a ``docs`` column —
    ``array<struct<start,end,key>>`` sorted by start: per contributing
    document, its half-open [start, end) token span inside ``input_ids``
    (including the doc's trailing eos; padding belongs to no span; a doc
    spanning chunk boundaries appears in every chunk it touches). This is
    the governance/takedown map: given opt-out keys,
    :func:`chunk_taint` finds every affected chunk without re-packing.
    Costs the doc key riding the one materialization shuffle — OFF by
    default so the hot path stays key-free.

    Scale shape (r6, guide §8): the layout comes from :func:`pack_sequences`
    over the SLIM (key, n_tok) projection — the range repartition, window
    and checkpoint inside the prefix sum never see the token arrays, and
    the range partitioner's sampling pass re-reads 16-byte rows instead of
    re-evaluating the caller's ids expression. The arrays meet their
    offsets through one key join (broadcast when the layout fits, else the
    join exchange), each document then explodes into exactly the
    ≤ ``n_chunks`` slices it contributes (slice bounds are pure long
    arithmetic, ``F.slice`` on the already-loaded array), and the ONE
    groupBy(chunk_id) shuffle materializes the chunks. Per-chunk reassembly
    sorts ≤ (docs-per-chunk + 2) segments; the HOF lambda is an
    O(segments) pass, within the interpreted-HOF budget (PLANS.md).
    ``order_col`` must be unique (inherited from global_prefix_sum
    determinism)."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    from pyspark.sql.types import ArrayType

    dt = df.schema[ids_col].dataType
    if not isinstance(dt, ArrayType):
        raise TypeError(f"{ids_col} must be array<integral>, got {dt}")
    elem = dt.elementType

    # empty/null docs vanish BEFORE the separator: a doc with no tokens
    # must not contribute a lone eos to the stream
    d = df.filter(
        F.col(ids_col).isNotNull() & (F.size(ids_col) > 0)
    )
    ids = F.col(ids_col)
    if eos_id is not None:
        ids = F.concat(ids, F.array(F.lit(eos_id).cast(elem)))
    d = d.select(F.col(order_col).alias("_k"), ids.alias("_ids"))
    d = d.withColumn("_n_tok", F.size("_ids").cast("long"))
    # r6 (guide §8: decide with small rows, move big rows once): the packing
    # layout is a pure function of (_k, _n_tok), so the prefix sum runs over
    # that 16-byte projection and the offsets JOIN back by key — the token
    # arrays no longer ride the range repartition + window + checkpoint
    # inside global_prefix_sum. The barrier moves up to `d` itself because
    # it now has two consumers (slim layout + join-back) and its ids
    # expression is typically the caller's expensive tokenization — without
    # it, the range partitioner's sampling pass alone re-evaluated that
    # expression over the full corpus a second time.
    d = d.localCheckpoint(eager=False)
    layout = pack_sequences(
        d.select("_k", "_n_tok"), "_k", "_n_tok", budget
    ).select("_k", "offset", "chunk_id", "n_chunks")
    d = d.join(layout, "_k")

    b = F.lit(int(budget)).cast("long")
    seg = d.select(
        "_k", "_ids", "offset", "_n_tok",
        F.explode(
            F.sequence(
                F.col("chunk_id"),
                F.col("chunk_id") + F.col("n_chunks") - F.lit(1).cast("long"),
            )
        ).alias("_cid"),
    )
    start_g = F.greatest(F.col("offset"), F.col("_cid") * b)
    end_g = F.least(F.col("offset") + F.col("_n_tok"), (F.col("_cid") + 1) * b)
    seg = seg.select(
        "_cid",
        *(["_k"] if provenance else []),
        start_g.alias("_sg"),
        # chunk-local start: pure long arithmetic, computed BEFORE the
        # shuffle so the agg side never needs the grouping key inside a
        # lambda
        (start_g - F.col("_cid") * b).cast("int").alias("_sl"),
        F.slice(
            F.col("_ids"),
            (start_g - F.col("offset") + 1).cast("int"),
            (end_g - start_g).cast("int"),
        ).alias("_seg"),
    )
    aggs = [
        F.flatten(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct(
                        F.col("_sg").alias("s"),
                        F.col("_seg").alias("seg"),
                    ))
                ),
                lambda x: x["seg"],
            )
        ).alias("input_ids"),
        F.count(F.lit(1)).alias("n_docs"),
    ]
    if provenance:
        aggs.append(
            F.sort_array(
                F.collect_list(F.struct(
                    F.col("_sl").alias("start"),
                    (F.col("_sl") + F.size("_seg")).alias("end"),
                    F.col("_k").alias("key"),
                ))
            ).alias("docs")
        )
    chunks = (
        seg.groupBy(F.col("_cid").alias("chunk_id"))
        .agg(*aggs)
        .withColumn("n_tokens", F.size("input_ids"))
    )
    if pad_id is not None:
        chunks = chunks.withColumn(
            "input_ids",
            F.when(
                F.col("n_tokens") < budget,
                F.concat(
                    F.col("input_ids"),
                    F.array_repeat(
                        F.lit(pad_id).cast(elem),
                        (F.lit(budget) - F.col("n_tokens")).cast("int"),
                    ),
                ),
            ).otherwise(F.col("input_ids")),
        )
    elif drop_last:
        chunks = chunks.filter(F.col("n_tokens") == budget)
    cols = ["chunk_id", "input_ids", "n_tokens", "n_docs"]
    if provenance:
        cols.append("docs")
    return chunks.select(*cols)


def chunk_taint(chunks: DataFrame, keys: DataFrame, key_col: str | None = None) -> DataFrame:
    """Opt-out/takedown audit over provenance-enabled chunks: which
    ``chunk_id``s contain ≥1 token from any of the given document keys?
    ``chunks`` must come from :func:`pack_chunks` with ``provenance=True``;
    ``keys`` is a one-column frame (or name its column via ``key_col``).

    Scale shape: the provenance explode emits one slim (chunk_id, key) row
    per contributing doc×chunk (≈ docs-per-chunk rows per chunk, token
    arrays never touched — column pruning drops ``input_ids`` at the
    scan); the takedown list is broadcast (opt-out sets are small by
    nature) and probed with a left-semi, then a distinct on the ~matching
    chunk ids only. Re-packing the corpus minus the tainted docs is the
    caller's choice; this is the audit step that says what must be
    retired."""
    if "docs" not in chunks.columns:
        raise ValueError("chunks has no 'docs' column — pack with provenance=True")
    kc = key_col or keys.columns[0]
    member = chunks.select(
        "chunk_id", F.explode(F.col("docs.key")).alias("_key")
    )
    wanted = keys.select(F.col(kc).alias("_key"))
    return (
        member.join(F.broadcast(wanted), "_key", "left_semi")
        .select("chunk_id")
        .distinct()
    )


def tokenize_and_pack(
    corpus: DataFrame,
    merges,
    budget: int,
    *,
    text_col: str = "text",
    order_col: str = "url",
    lowercase: bool = True,
    pad: bool = False,
    provenance: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Text corpus → (training chunks, vocab): the full tokenize-and-pack
    tail of a training-data pipeline in one call. Builds a corpus-derived
    vocabulary with specials ``<pad>=0, <eos>=1, <unk>=2`` (fixed by
    construction — no driver lookup), BPE-encodes to ids (Arrow-batched,
    per-word memo), and packs with ``<eos>`` separating documents.
    ``pad=True`` pads the final chunk with ``<pad>`` instead of dropping
    it. The corpus is read twice (vocab agg + encode) — cache upstream if
    it is expensive to recompute."""
    from final_ocr_spark.operators.bpe import bpe_encode_ids, bpe_vocab

    if isinstance(merges, DataFrame):  # one collect, not one per consumer
        merges = [
            (r["left"], r["right"]) for r in merges.orderBy("rank").collect()
        ]
    # collect the dictionary-sized vocab ONCE and hand back a rebuilt local
    # DataFrame: encode needs the dict anyway, and returning the original
    # lazy plan would re-run the corpus-wide encode+agg every time the
    # caller consumes the vocab (a third full-corpus pass)
    vrows = bpe_vocab(
        corpus, merges, text_col, lowercase=lowercase,
        specials=("<pad>", "<eos>", "<unk>"),
    ).collect()
    vdict = {r["token"]: r["id"] for r in vrows}
    vocab = corpus.sparkSession.createDataFrame(
        sorted(vdict.items(), key=lambda kv: kv[1]), "token string, id int"
    )
    d = corpus.select(
        F.col(order_col),
        bpe_encode_ids(
            F.col(text_col), merges, vdict, lowercase=lowercase, unk_id=2
        ).alias("input_ids"),
    )
    chunks = pack_chunks(
        d, order_col, "input_ids", budget,
        eos_id=1, pad_id=0 if pad else None, provenance=provenance,
    )
    return chunks, vocab
