"""Sequence packing / scalable global prefix sum."""

from final_ocr_spark.operators.packing import global_prefix_sum, pack_sequences


def test_global_prefix_sum_matches_local(spark):
    vals = [(i, (i * 37) % 11 + 1) for i in range(200)]
    df = spark.createDataFrame(vals, ["k", "v"]).repartition(13)  # scrambled
    got = {r["k"]: r["offset"]
           for r in global_prefix_sum(df, "k", "v", num_partitions=7).collect()}
    acc, want = 0, {}
    for k, v in vals:
        want[k] = acc
        acc += v
    assert got == want


def test_pack_sequences_layout(spark):
    # docs of 3,4,5,6 tokens, budget 5: offsets 0,3,7,12
    df = spark.createDataFrame(
        [(0, 3), (1, 4), (2, 5), (3, 6)], ["k", "toks"])
    rows = {r["k"]: r for r in
            pack_sequences(df, "k", "toks", budget=5).collect()}
    assert [(rows[k]["offset"], rows[k]["chunk_id"], rows[k]["pos_in_chunk"],
             rows[k]["n_chunks"]) for k in range(4)] == [
        (0, 0, 0, 1),   # tokens 0-2 in chunk 0
        (3, 0, 3, 2),   # tokens 3-6 span chunks 0-1
        (7, 1, 2, 2),   # tokens 7-11 span chunks 1-2
        (12, 2, 2, 2),  # tokens 12-17 span chunks 2-3
    ]


def test_pack_sequences_zero_token_doc(spark):
    df = spark.createDataFrame([(0, 5), (1, 0), (2, 5)], ["k", "toks"])
    rows = {r["k"]: r for r in pack_sequences(df, "k", "toks", budget=5).collect()}
    assert rows[1]["offset"] == 5 and rows[1]["n_chunks"] == 1
    assert rows[2]["offset"] == 5 and rows[2]["chunk_id"] == 1


def _py_pack(docs, budget, *, eos=None, pad=None, drop_last=True):
    """Pure-Python twin: concatenate in key order, slice every budget."""
    stream = []
    for _, ids in sorted(docs):
        if not ids:
            continue
        stream.extend(ids)
        if eos is not None:
            stream.append(eos)
    chunks = [stream[i:i + budget] for i in range(0, len(stream), budget)]
    out = {}
    for cid, ch in enumerate(chunks):
        n = len(ch)
        if n < budget:
            if pad is not None:
                ch = ch + [pad] * (budget - n)
            elif drop_last:
                continue
        out[cid] = (ch, n)
    return out


def test_pack_chunks_differential(spark):
    """pack_chunks == the pure-Python concatenate-and-slice twin, on a
    corpus with docs both smaller and much larger than the budget (and one
    empty doc, which must vanish)."""
    from final_ocr_spark.operators.packing import pack_chunks

    docs = [(k, [(k * 100 + j) % 997 for j in range((k * 13) % 29)])
            for k in range(40)]
    df = spark.createDataFrame(docs, "k long, ids array<int>").repartition(7)

    for kwargs, py_kwargs in [
        (dict(), dict()),
        (dict(eos_id=9999), dict(eos=9999)),
        (dict(pad_id=-1, eos_id=9999), dict(pad=-1, eos=9999)),
        (dict(drop_last=False), dict(drop_last=False)),
    ]:
        got = {r["chunk_id"]: (r["input_ids"], r["n_tokens"])
               for r in pack_chunks(df, "k", "ids", 17, **kwargs).collect()}
        assert got == _py_pack(docs, 17, **py_kwargs), kwargs


def test_pack_chunks_n_docs_and_spanning(spark):
    """A doc 3× the budget spans 4 chunks; n_docs counts contributing
    docs per chunk."""
    from final_ocr_spark.operators.packing import pack_chunks

    docs = [(0, list(range(3))), (1, list(range(100, 117))), (2, [7, 8])]
    df = spark.createDataFrame(docs, "k long, ids array<int>")
    rows = {r["chunk_id"]: r
            for r in pack_chunks(df, "k", "ids", 5, drop_last=False).collect()}
    # stream = 3 + 17 + 2 = 22 tokens → chunks 0..4
    assert sorted(rows) == [0, 1, 2, 3, 4]
    assert rows[0]["input_ids"] == [0, 1, 2, 100, 101]
    assert rows[0]["n_docs"] == 2
    assert rows[1]["n_docs"] == 1          # mid-doc chunk
    assert rows[3]["input_ids"] == [112, 113, 114, 115, 116]
    assert rows[4]["input_ids"] == [7, 8]  # short tail kept (drop_last=False)
    assert rows[4]["n_docs"] == 1 and rows[4]["n_tokens"] == 2


def test_bpe_vocab_and_encode_ids_roundtrip(spark):
    """vocab ids are dense/deterministic with specials first; encode_ids
    equals encode mapped through the vocab; unknown pieces hit unk_id or
    raise in strict mode."""
    import pytest

    from final_ocr_spark.operators.bpe import (
        bpe_encode, bpe_encode_ids, bpe_vocab, train_bpe,
    )

    texts = [("u%d" % i, "the river bank and the data bank merge here %d" % i)
             for i in range(20)]
    corpus = spark.createDataFrame(texts, ["url", "text"])
    merges = train_bpe(corpus, n_merges=30)
    vocab = bpe_vocab(corpus, merges, specials=("<pad>", "<eos>", "<unk>"))
    vrows = {r["token"]: r["id"] for r in vocab.collect()}
    assert vrows["<pad>"] == 0 and vrows["<eos>"] == 1 and vrows["<unk>"] == 2
    nonspecial = sorted(t for t in vrows if t not in ("<pad>", "<eos>", "<unk>"))
    assert [vrows[t] for t in nonspecial] == list(range(3, 3 + len(nonspecial)))

    got = corpus.select(
        bpe_encode("text", merges).alias("toks"),
        bpe_encode_ids("text", merges, vocab, unk_id=2).alias("ids"),
    ).collect()
    for r in got:
        assert r["ids"] == [vrows[t] for t in r["toks"]]

    # unknown piece (unseen char) → unk_id, or a task error in strict mode
    new = spark.createDataFrame([("zzz £ zzz",)], ["text"])
    ids = new.select(
        bpe_encode_ids("text", merges, vocab, unk_id=2).alias("ids")
    ).collect()[0]["ids"]
    assert 2 in ids
    with pytest.raises(Exception, match="not in vocab"):
        new.select(
            bpe_encode_ids("text", merges, vocab).alias("ids")
        ).collect()


def test_tokenize_and_pack_end_to_end(spark):
    """text → chunks: every id decodes through the vocab, <eos> separates
    documents, all chunks are exactly budget long."""
    from final_ocr_spark.operators.packing import tokenize_and_pack
    from final_ocr_spark.operators.bpe import train_bpe

    texts = [("u%02d" % i,
              "packing the web corpus into training chunks item %d" % i)
             for i in range(12)]
    corpus = spark.createDataFrame(texts, ["url", "text"])
    merges = train_bpe(corpus, n_merges=40)
    chunks, vocab = tokenize_and_pack(corpus, merges, 32, pad=True)
    vrows = {r["id"]: r["token"] for r in vocab.collect()}
    rows = chunks.orderBy("chunk_id").collect()
    assert rows, "no chunks produced"
    all_ids = [i for r in rows for i in r["input_ids"]]
    assert all(len(r["input_ids"]) == 32 for r in rows)
    assert all(i in vrows for i in all_ids)
    assert all_ids.count(1) == 12           # one <eos> per doc
    # padding only in the last chunk, after its real tokens
    for r in rows[:-1]:
        assert r["n_tokens"] == 32
    tail = rows[-1]
    assert tail["input_ids"][tail["n_tokens"]:] == [0] * (32 - tail["n_tokens"])


def test_pack_chunks_fuzz_against_twin(spark):
    """Property fuzz: random doc-length profiles × budgets × tail modes all
    match the pure-Python twin (seeded stdlib random — one spark session,
    many profiles; hypothesis's per-example model fits poorly with a shared
    JVM fixture)."""
    import random

    from final_ocr_spark.operators.packing import pack_chunks

    rng = random.Random(20260818)
    for trial in range(6):
        budget = rng.choice([3, 7, 16, 64])
        docs = [
            (k, [rng.randrange(1000) for _ in range(rng.choice(
                [0, 1, budget - 1, budget, budget + 1, budget * 3,
                 rng.randrange(1, 2 * budget + 1)]))])
            for k in range(rng.randrange(1, 60))
        ]
        kwargs, py_kwargs = rng.choice([
            (dict(), dict()),
            (dict(eos_id=-7), dict(eos=-7)),
            (dict(pad_id=-1), dict(pad=-1)),
            (dict(drop_last=False), dict(drop_last=False)),
            (dict(eos_id=-7, pad_id=-1), dict(eos=-7, pad=-1)),
        ])
        df = spark.createDataFrame(docs, "k long, ids array<int>") \
                  .repartition(rng.choice([1, 3, 8]))
        got = {r["chunk_id"]: (r["input_ids"], r["n_tokens"])
               for r in pack_chunks(df, "k", "ids", budget, **kwargs)
               .collect()}
        assert got == _py_pack(docs, budget, **py_kwargs), (trial, budget,
                                                            kwargs)


def test_pack_chunks_provenance_spans_tile_and_match_source(spark):
    """provenance=True: each chunk's docs spans tile [0, n_tokens) exactly
    (sorted, disjoint, gap-free), every span's ids equal the source doc's
    (eos-appended) slice, and a boundary-spanning doc appears in every
    chunk it touches. chunk_taint maps opt-out keys to affected chunks."""
    from final_ocr_spark.operators.packing import chunk_taint, pack_chunks

    docs = [(0, list(range(3))), (1, list(range(100, 117))), (2, [7, 8])]
    df = spark.createDataFrame(docs, "k long, ids array<int>")
    rows = {r["chunk_id"]: r for r in pack_chunks(
        df, "k", "ids", 5, eos_id=999, drop_last=False, provenance=True,
    ).collect()}
    # eos-appended stream: doc0=4, doc1=18, doc2=3 tokens → 25 → 5 chunks
    src = {k: ids + [999] for k, ids in docs}
    seen_chunks_by_key: dict = {}
    consumed = {k: 0 for k in src}
    for cid in sorted(rows):
        r = rows[cid]
        spans = [(d["start"], d["end"], d["key"]) for d in r["docs"]]
        assert spans == sorted(spans)
        # tile [0, n_tokens) with no gaps/overlap
        pos = 0
        for s, e, k in spans:
            assert s == pos and e > s
            got_ids = r["input_ids"][s:e]
            want = src[k][consumed[k]:consumed[k] + (e - s)]
            assert got_ids == want, (cid, k)
            consumed[k] += e - s
            seen_chunks_by_key.setdefault(k, []).append(cid)
            pos = e
        assert pos == r["n_tokens"]
        assert r["n_docs"] == len(spans)
    assert all(consumed[k] == len(src[k]) for k in src)  # nothing lost
    assert seen_chunks_by_key[1] == [0, 1, 2, 3, 4]  # spans all 5 chunks

    taint = chunk_taint(
        rows_df := spark.createDataFrame(list(rows.values())),
        spark.createDataFrame([(2,)], "k long"),
    )
    assert sorted(r["chunk_id"] for r in taint.collect()) == \
        sorted(set(seen_chunks_by_key[2]))
    # no provenance → loud refusal
    import pytest

    plain = pack_chunks(df, "k", "ids", 5, drop_last=False)
    with pytest.raises(ValueError):
        chunk_taint(plain, spark.createDataFrame([(2,)], "k long"))


def test_pack_chunks_provenance_with_padding(spark):
    """Padding belongs to no span: the padded tail chunk's spans stop at
    n_tokens, not at the budget."""
    from final_ocr_spark.operators.packing import pack_chunks

    df = spark.createDataFrame([(0, [1, 2, 3])], "k long, ids array<int>")
    r = pack_chunks(df, "k", "ids", 8, pad_id=0, provenance=True).collect()[0]
    assert r["input_ids"] == [1, 2, 3, 0, 0, 0, 0, 0]
    assert r["n_tokens"] == 3
    assert [(d["start"], d["end"], d["key"]) for d in r["docs"]] == [(0, 3, 0)]
