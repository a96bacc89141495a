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
