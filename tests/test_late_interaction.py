"""Late-interaction (MaxSim) retrieval: self-retrieval, multi-aspect
advantage over single-vector pooling, vocabulary-miss tolerance."""

import pytest
from pyspark.sql import functions as F

from confluent_kafka_vector_search_prompt_inference_spark.models import HashingEmbedder, ModelRegistry
from confluent_kafka_vector_search_prompt_inference_spark.operators.late_interaction import late_interaction_topk


@pytest.fixture(scope="module")
def setup(spark):
    rows = [
        (1, "spark shuffles data across the cluster"),
        (2, "broadcast joins avoid shuffles entirely"),
        (3, "vector search ranks documents by similarity"),
        (4, "spark vector pipelines embed documents"),  # covers both aspects
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    toks = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != ""))
        ).alias("token"),
    )
    registry = ModelRegistry()
    registry.create_model("vector_encoding", "embedding", HashingEmbedder(dim=32))
    vocab = toks.select("token").distinct().withColumn("content", F.col("token"))
    tv = registry.ml_predict(vocab, "vector_encoding", "content").select("token", "vector")
    return docs, toks, tv


def test_self_retrieval_ranks_first(setup):
    docs, toks, tv = setup
    q = toks.withColumnRenamed("doc_id", "query_id")
    out = late_interaction_topk(toks, q, tv, k=1).toPandas()
    assert all(r.query_id == r.doc_id for r in out.itertuples())


def test_multi_aspect_query_prefers_covering_doc(spark, setup):
    """A two-aspect query ('spark' + 'vector') must rank the doc covering
    BOTH aspects above single-aspect docs — the property single-vector
    mean-pooling dilutes."""
    docs, toks, tv = setup
    q = spark.createDataFrame([(99, "spark"), (99, "vector")], ["query_id", "token"])
    out = late_interaction_topk(toks, q, tv, k=4).toPandas().sort_values("rank")
    assert out.iloc[0].doc_id == 4


def test_out_of_vocabulary_tokens_ignored(spark, setup):
    docs, toks, tv = setup
    q = spark.createDataFrame(
        [(7, "spark"), (7, "zzzunknownzzz")], ["query_id", "token"]
    )
    out = late_interaction_topk(toks, q, tv, k=2).toPandas()
    # unknown token contributes nothing; known token still retrieves
    assert len(out) == 2 and (out.score > 0).all()


def test_persisted_token_vectors_identical_retrieval(spark, tmp_path):
    """Retrieval over saved+loaded token vectors equals the in-memory
    run — the embed-once lifecycle for the MaxSim tier."""
    from pyspark.sql import functions as F

    from confluent_kafka_vector_search_prompt_inference_spark.models import HashingEmbedder, ModelRegistry
    from confluent_kafka_vector_search_prompt_inference_spark.operators.late_interaction import (
        late_interaction_topk,
        load_token_vectors,
        save_token_vectors,
    )

    registry = ModelRegistry()
    registry.create_model("vector_encoding", "embedding", HashingEmbedder(dim=32))
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(200)
    toks = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != "")
            )
        ).alias("token"),
    )
    vocab = toks.select("token").distinct().withColumn("content", F.col("token"))
    tv = registry.ml_predict(vocab, "vector_encoding", "content").select("token", "vector")
    qtoks = toks.filter(F.col("doc_id") < 3).withColumnRenamed("doc_id", "query_id")

    mem = late_interaction_topk(toks, qtoks, tv, k=5, metric="dot")
    p = str(tmp_path / "tokvec")
    save_token_vectors(tv, p)
    disk = late_interaction_topk(toks, qtoks, load_token_vectors(spark, p), k=5, metric="dot")
    m = {(r.query_id, r.rank): r.doc_id for r in mem.collect()}
    d = {(r.query_id, r.rank): r.doc_id for r in disk.collect()}
    assert m == d
