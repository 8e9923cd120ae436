"""Sequence packing: budget boundaries, determinism under repartitioning."""

from pyspark.sql import functions as F

from confluent_kafka_vector_search_prompt_inference_spark.operators.packing import pack_sequences


def test_packing_fills_budget_in_order(spark):
    # one shard (shards=1) → pure in-order greedy fill at budget 10
    rows = [(1, 4), (2, 4), (3, 4), (4, 9), (5, 1)]
    df = spark.createDataFrame(rows, ["doc_id", "tokens"])
    out = {r.doc_id: r for r in pack_sequences(df, "doc_id", "tokens", budget=10, shards=1).collect()}
    # offsets: 0, 4, 8, 12, 21 → seqs 0, 0, 0, 1, 2
    assert [out[i].start_offset for i in (1, 2, 3, 4, 5)] == [0, 4, 8, 12, 21]
    assert [out[i].seq_id for i in (1, 2, 3, 4, 5)] == [0, 0, 0, 1, 2]


def test_packing_invariant_to_partitioning(spark):
    rows = [(i, (i * 37) % 90 + 10) for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "tokens"])
    a = pack_sequences(df.repartition(1), "doc_id", "tokens", budget=256, shards=4)
    b = pack_sequences(df.repartition(32, "tokens"), "doc_id", "tokens", budget=256, shards=4)
    pa = a.orderBy("doc_id").toPandas()
    pb = b.orderBy("doc_id").toPandas()
    assert pa[["doc_id", "shard", "seq_id", "start_offset"]].equals(
        pb[["doc_id", "shard", "seq_id", "start_offset"]]
    )


def test_oversize_document_starts_and_overflows_alone(spark):
    # a doc bigger than the budget occupies its own seq start; the next doc
    # starts a fresh sequence because the offset has crossed the boundary
    rows = [(1, 3), (2, 50), (3, 3)]
    df = spark.createDataFrame(rows, ["doc_id", "tokens"])
    out = {r.doc_id: r for r in pack_sequences(df, "doc_id", "tokens", budget=10, shards=1).collect()}
    assert out[2].seq_id == 0 and out[3].seq_id == 5
    assert out[3].start_offset == 53
