"""t1 smoke (SURVEY.md §5): the reference's RAG pipeline end-to-end on
sf0.001 with deterministic providers; negative tests for the documented
failure modes (sink schema mismatch README.md:586-594, untyped object
README.md:552-594)."""

import json

import pytest
from pyspark.sql import functions as F

from confluent_kafka_vector_search_prompt_inference_spark.catalog import SinkSchemaMismatch, check_sink_schema
from confluent_kafka_vector_search_prompt_inference_spark.models import HashingEmbedder, ModelRegistry, TemplateLLM
from confluent_kafka_vector_search_prompt_inference_spark.streaming.rag import RagPipeline


@pytest.fixture(scope="module")
def pipe():
    registry = ModelRegistry()
    registry.create_model("vector_encoding", "embedding", HashingEmbedder(dim=32))
    registry.create_model("retail_assistant", "text_generation", TemplateLLM())
    return RagPipeline(registry, k=3)


@pytest.fixture(scope="module")
def questions(spark):
    rows = [
        ("user", "Find me a pair of mens formal shoes in medium size", "abc123", "u1@x.com"),
        ("user", "Show me little girl shoes in medium size", "abc124", "u2@x.com"),
        ("user", "Show me several options of a cheap read summer dress in medium size", "abc125", "u3@x.com"),
    ]  # the reference's canonical questions, README.md:111-113
    return spark.createDataFrame(rows, "role string, content string, sessionid string, email string")


@pytest.fixture(scope="module")
def corpus(spark, docs, pipe):
    products = docs.limit(200).select(
        F.col("doc_id").alias("product_id"), F.col("text").alias("content")
    )
    return pipe.registry.ml_predict(products, "vector_encoding", "content")


def test_end_to_end_answers(pipe, questions, corpus):
    answers = pipe.run_batch(questions, corpus)
    rows = answers.collect()
    assert answers.columns == ["role", "content", "sessionid", "json_response"]
    assert len(rows) == 3
    for r in rows:
        body = json.loads(r.json_response)
        assert body["role"] == "assistant"


def test_prompts_have_topk_products(pipe, questions, corpus):
    vec = pipe.embed_questions(questions)
    prompts = pipe.search_prompts(vec, corpus)
    rows = prompts.collect()
    assert all(len(r.products) == 3 for r in rows)
    # products ARRAY<STRUCT<content>> — reference README.md:413-421
    assert all(isinstance(r.products[0].content, str) for r in rows)


def test_email_never_reaches_prompt(pipe, questions, corpus):
    """PII guard: email is dropped by the embedding projection
    (reference README.md:244-247, 286-288)."""
    vec = pipe.embed_questions(questions)
    assert "email" not in vec.columns
    prompts = pipe.search_prompts(vec, corpus)
    with_prompt = prompts.withColumn("p", pipe.prompt_json())
    assert all("@x.com" not in r.p for r in with_prompt.select("p").collect())


def test_embedding_deterministic_across_runs(pipe, questions):
    a = pipe.embed_questions(questions).select("question_id", "vector").collect()
    b = pipe.embed_questions(questions).select("question_id", "vector").collect()
    assert sorted(map(str, a)) == sorted(map(str, b))


def test_sink_schema_mismatch_fails_before_run(spark):
    """Flink rejects INSERT with mismatched sink schema at analysis time
    (README.md:586-594) — so do we."""
    sink = spark.createDataFrame([], "role string, content string").schema
    query = spark.createDataFrame([], "role string, wrong int").schema
    with pytest.raises(SinkSchemaMismatch):
        check_sink_schema(sink, query)
    sink2 = spark.createDataFrame([], "role string, content string").schema
    query2 = spark.createDataFrame([], "content string, role string").schema
    check_sink_schema(sink2, query2)  # order-insensitive: OK


def test_untyped_json_object_rejected():
    """The ROW<> pitfall (README.md:552-594): untyped object in a contract
    must be rejected at DDL time."""
    from confluent_kafka_vector_search_prompt_inference_spark.sources.registry import json_schema_to_struct

    with pytest.raises(ValueError, match="ROW<>"):
        json_schema_to_struct('{"type":"object","properties":{"x":{"type":"object"}}}')


def test_hybrid_retrieval_mode(pipe, questions, corpus):
    """retrieval='hybrid' fuses the BM25 keyword leg with the vector leg
    (RRF) and keeps the reference's output contract — same schema, k
    products per question, end-to-end answerable."""
    hybrid = RagPipeline(pipe.registry, k=3, retrieval="hybrid")
    vec = hybrid.embed_questions(questions)
    prompts = hybrid.search_prompts(vec, corpus)
    rows = prompts.collect()
    assert all(len(r.products) == 3 for r in rows)
    answers = hybrid.run_batch(questions, corpus)
    assert answers.columns == ["role", "content", "sessionid", "json_response"]
    assert answers.count() == 3


def test_hybrid_rag_with_persisted_keyword_index(spark, pipe, questions, corpus):
    """RagPipeline(keyword_index=...) searches the saved term-bucketed BM25
    index for its keyword leg and produces answers identical to the live
    (postings-rebuilt-per-call) hybrid path — the steady-state streaming
    shape where query batches never rebuild the index."""
    from confluent_kafka_vector_search_prompt_inference_spark.operators.bm25 import save_bm25_index
    from confluent_kafka_vector_search_prompt_inference_spark.streaming.rag import RagPipeline

    live = RagPipeline(pipe.registry, k=2, retrieval="hybrid", strategy="broadcast_corpus")
    expected = {
        (r.sessionid, r.json_response)
        for r in live.run_batch(questions, corpus).collect()
    }
    save_bm25_index(
        corpus.select(F.col("product_id").alias("doc_id"), F.col("content").alias("text")),
        "rag_kw_idx_test",
    )
    try:
        indexed = RagPipeline(
            pipe.registry, k=2, retrieval="hybrid", strategy="broadcast_corpus",
            keyword_index="rag_kw_idx_test",
        )
        got = {
            (r.sessionid, r.json_response)
            for r in indexed.run_batch(questions, corpus).collect()
        }
    finally:
        spark.sql("DROP TABLE IF EXISTS rag_kw_idx_test")
        spark.sql("DROP TABLE IF EXISTS rag_kw_idx_test_stats")
    assert got == expected


def test_rag_over_persisted_ivf_index(spark, tmp_path):
    """RagPipeline(vector_index=...) retrieves from the saved IVF index —
    no corpus argument anywhere — and at full probe width returns exactly
    what the in-memory broadcast pipeline returns (same products, same
    order), pairing the query side with the always-indexed ingest side."""
    from pyspark.sql import functions as F

    from confluent_kafka_vector_search_prompt_inference_spark.models import HashingEmbedder, ModelRegistry, TemplateLLM
    from confluent_kafka_vector_search_prompt_inference_spark.operators.ivf import build_ivf_index, save_ivf_index
    from confluent_kafka_vector_search_prompt_inference_spark.streaming.rag import RagPipeline

    registry = ModelRegistry()
    registry.create_model("vector_encoding", "embedding", HashingEmbedder(dim=32))
    registry.create_model("retail_assistant", "text_generation", TemplateLLM())
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    corpus = registry.ml_predict(
        docs.select(F.col("doc_id").alias("product_id"), F.col("text").alias("content")),
        "vector_encoding",
        "content",
    )
    idx = str(tmp_path / "ivf")
    indexed, cents = build_ivf_index(corpus, "vector", n_clusters=8, seed=42)
    save_ivf_index(indexed, cents, idx)

    questions = docs.filter(F.col("doc_id") < 5).select(
        F.lit("user").alias("role"),
        F.col("text").alias("content"),
        F.concat(F.lit("s-"), F.col("doc_id")).alias("sessionid"),
    )
    plain = RagPipeline(registry, k=3, strategy="broadcast_corpus")
    via_index = RagPipeline(registry, k=3, vector_index=idx, n_probe=8)

    want = {
        r.sessionid: [p.content for p in r.products]
        for r in plain.search_prompts(
            plain.embed_questions(questions), corpus
        ).collect()
    }
    got = {
        r.sessionid: [p.content for p in r.products]
        for r in via_index.search_prompts(
            via_index.embed_questions(questions)
        ).collect()
    }
    assert got == want

    answers = via_index.run_batch(questions)
    assert answers.count() == 5

    with pytest.raises(ValueError, match="corpus is required"):
        plain.search_prompts(plain.embed_questions(questions))


def test_streaming_transform_staleness_contract_and_refresh(spark, pipe, tmp_path):
    """The prepared exact lane is a documented SNAPSHOT: a corpus append
    after stream start is invisible (identical retrievals), and
    transform.refresh() re-resolves + re-prepares so later micro-batches
    see the new rows — the explicit contract for the collect-once lane
    (the per-batch-reloading IVF lane sees appends immediately)."""
    path = str(tmp_path / "corpus")
    base = spark.createDataFrame(
        [(i, f"ordinary product number {i}") for i in range(40)],
        "product_id long, content string",
    )
    pipe.registry.ml_predict(base, "vector_encoding", "content").write.parquet(path)
    reader = lambda: spark.read.parquet(path)  # noqa: E731

    transform = pipe.streaming_transform(corpus_reader=reader)
    try:
        q = spark.createDataFrame(
            [("user", "super special widget", "s1")],
            "role string, content string, sessionid string",
        )
        out1 = transform(q).select("json_response").first()[0]

        # append a product whose text EQUALS the question — rank-1 once seen
        extra = spark.createDataFrame(
            [(1000, "super special widget")], "product_id long, content string"
        )
        pipe.registry.ml_predict(extra, "vector_encoding", "content").write.mode(
            "append"
        ).parquet(path)

        out2 = transform(q).select("json_response").first()[0]
        assert out2 == out1  # snapshot: append invisible until refresh

        transform.refresh()
        out3 = transform(q).select("json_response").first()[0]
        # retrieval changed → prompt changed → deterministic answer changed
        assert out3 != out1
    finally:
        if transform.prepared is not None:
            transform.prepared.unpersist()


def test_vector_index_load_cached_until_index_changes(spark, tmp_path):
    """The per-batch index load is fingerprint-cached: an UNCHANGED index
    dir reuses the previous corpus DataFrame (no re-listing / recovery /
    centroid re-collect per micro-batch), while any index mutation —
    here an append — moves the filesystem fingerprint and forces a fresh
    load whose new rows are immediately searchable (the append-visibility
    contract the per-batch reload existed for)."""
    from pyspark.sql import functions as F

    from confluent_kafka_vector_search_prompt_inference_spark.models import HashingEmbedder, ModelRegistry, TemplateLLM
    from confluent_kafka_vector_search_prompt_inference_spark.operators.ivf import build_ivf_index, ivf_append, save_ivf_index
    from confluent_kafka_vector_search_prompt_inference_spark.streaming.rag import RagPipeline

    registry = ModelRegistry()
    registry.create_model("vector_encoding", "embedding", HashingEmbedder(dim=32))
    registry.create_model("retail_assistant", "text_generation", TemplateLLM())
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    corpus = registry.ml_predict(
        docs.select(F.col("doc_id").alias("product_id"), F.col("text").alias("content")),
        "vector_encoding",
        "content",
    )
    idx = str(tmp_path / "ivf")
    indexed, cents = build_ivf_index(corpus, "vector", n_clusters=8, seed=42)
    save_ivf_index(indexed, cents, idx)

    pipe = RagPipeline(registry, k=3, vector_index=idx, n_probe=8)
    df1, c1, fp1 = pipe._load_index(spark)
    df2, c2, fp2 = pipe._load_index(spark)
    assert df2 is df1 and fp2 == fp1  # steady state: same snapshot reused

    # append moves the fingerprint -> fresh load, appended row searchable
    extra = corpus.filter(F.col("product_id") == 0).select(
        (F.col("product_id") + 1_000_000).alias("product_id"),
        F.concat(F.lit("APPENDED "), F.col("content")).alias("content"),
        "vector",
    )
    ivf_append(extra, idx)
    df3, c3, fp3 = pipe._load_index(spark)
    assert fp3 != fp1 and df3 is not df1
    assert df3.filter(F.col("product_id") == 1_000_000).count() == 1

    q = docs.filter(F.col("doc_id") == 0).select(
        F.lit("user").alias("role"),
        F.col("text").alias("content"),
        F.lit("s-0").alias("sessionid"),
    )
    prompts = pipe.search_prompts(pipe.embed_questions(q)).collect()
    contents = [p.content for r in prompts for p in r.products]
    assert any("APPENDED" in c for c in contents)  # identical text, +self
