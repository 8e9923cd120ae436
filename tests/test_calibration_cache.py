"""Calibration-curve caching: repeat calibrations against an unchanged
corpus run ZERO Spark jobs; any corpus/index mutation invalidates."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from confluent_kafka_vector_search_prompt_inference_spark.operators.calibration_cache import (
    CalibrationCache,
    dataframe_fingerprint,
    directory_fingerprint,
)
from confluent_kafka_vector_search_prompt_inference_spark.operators.topk_join import calibrate_recall_depth


@pytest.fixture()
def qc(embeddings):
    q = embeddings.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("vector")
    )
    c = embeddings.filter(F.col("vec_id") >= 20).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("vector")
    )
    return q, c


def _jobs_run(spark, group, fn):
    """Run fn under a named job group; return (result, number of Spark
    jobs the call scheduled) — the strongest 'zero corpus scans' assert:
    a cache hit may not launch ANY job."""
    sc = spark.sparkContext
    sc.setJobGroup(group, group)
    try:
        out = fn()
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    return out, len(sc.statusTracker().getJobIdsForGroup(group))


def test_depth_cache_hit_runs_zero_jobs(spark, qc, tmp_path):
    q, c = qc
    cache = CalibrationCache(str(tmp_path / "cal.json"))
    common = dict(
        strategy="binary", query_id="qid", corpus_id="cid", cache=cache
    )
    d1, r1 = calibrate_recall_depth(q, c, 5, recall_target=0.9, **common)
    assert os.path.exists(cache.path)

    (d2, r2), jobs = _jobs_run(
        spark, "cal-hit",
        lambda: calibrate_recall_depth(q, c, 5, recall_target=0.9, **common),
    )
    assert (d2, r2) == (d1, r1)
    assert jobs == 0

    # a DIFFERENT target against the same corpus is also a pure hit —
    # the full curve is cached, not just the chosen depth
    (d3, r3), jobs3 = _jobs_run(
        spark, "cal-hit2",
        lambda: calibrate_recall_depth(q, c, 5, recall_target=0.5, **common),
    )
    assert jobs3 == 0
    assert d3 <= d2


def test_depth_cache_invalidates_on_append(spark, qc, tmp_path):
    """An appended corpus changes the job-free fingerprint (plan-stats
    bytes), so the cached curve is NOT served — the calibration
    re-measures."""
    q, c = qc
    corpus_path = str(tmp_path / "corpus")
    c.write.parquet(corpus_path)
    c1 = spark.read.parquet(corpus_path)
    cache = CalibrationCache(str(tmp_path / "cal.json"))
    common = dict(
        strategy="binary", query_id="qid", corpus_id="cid", cache=cache
    )
    calibrate_recall_depth(q, c1, 5, recall_target=0.9, **common)

    # append rows → file footprint changes → fingerprint changes
    c.withColumn("cid", F.col("cid") + 100_000).write.mode("append").parquet(
        corpus_path
    )
    c2 = spark.read.parquet(corpus_path)
    assert dataframe_fingerprint(c2) != dataframe_fingerprint(c1)
    _, jobs = _jobs_run(
        spark, "cal-miss",
        lambda: calibrate_recall_depth(q, c2, 5, recall_target=0.9, **common),
    )
    assert jobs > 0  # re-measured against the grown corpus


def test_ivf_probe_cache_and_directory_invalidation(spark, embeddings, tmp_path):
    from confluent_kafka_vector_search_prompt_inference_spark.operators.ivf import (
        build_ivf_index,
        calibrate_ivf_n_probe,
        ivf_append,
        load_ivf_index,
        save_ivf_index,
    )

    corpus = embeddings.select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("vector")
    )
    q = embeddings.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("vector")
    )
    path = str(tmp_path / "idx")
    indexed, cents = build_ivf_index(corpus, "vector", n_clusters=8, seed=42)
    save_ivf_index(indexed, cents, path)
    loaded, cents = load_ivf_index(spark, path)
    cache = CalibrationCache(os.path.join(path, "_calibration.json"))
    common = dict(query_id="qid", corpus_id="cid", cache=cache)

    fp = directory_fingerprint(path)
    p1, r1 = calibrate_ivf_n_probe(
        q, loaded, cents, 5, recall_target=0.9, corpus_fingerprint=fp, **common
    )
    assert r1 >= 0.9
    # the cache file living inside the index does not change its own
    # fingerprint
    assert directory_fingerprint(path) == fp

    (p2, r2), jobs = _jobs_run(
        spark, "ivf-hit",
        lambda: calibrate_ivf_n_probe(
            q, loaded, cents, 5, recall_target=0.9,
            corpus_fingerprint=directory_fingerprint(path), **common,
        ),
    )
    assert (p2, r2) == (p1, r1)
    assert jobs == 0

    # append → file metadata moves → fingerprint differs → re-measure
    ivf_append(
        corpus.withColumn("cid", F.col("cid") + 100_000).limit(50), path
    )
    fp2 = directory_fingerprint(path)
    assert fp2 != fp
    loaded2, cents2 = load_ivf_index(spark, path)
    _, jobs2 = _jobs_run(
        spark, "ivf-miss",
        lambda: calibrate_ivf_n_probe(
            q, loaded2, cents2, 5, recall_target=0.9,
            corpus_fingerprint=fp2, **common,
        ),
    )
    assert jobs2 > 0


def test_rag_pipeline_recall_target_calibrates_once(spark, embeddings, tmp_path):
    """RagPipeline(vector_index=..., recall_target=) calibrates through
    the on-index cache: the curve lands in <index>/_calibration.json and
    the answers still flow."""
    from confluent_kafka_vector_search_prompt_inference_spark.models import (
        HashingEmbedder,
        ModelRegistry,
        TemplateLLM,
    )
    from confluent_kafka_vector_search_prompt_inference_spark.operators.ivf import build_ivf_index, save_ivf_index
    from confluent_kafka_vector_search_prompt_inference_spark.streaming.rag import RagPipeline

    registry = ModelRegistry()
    registry.create_model("vector_encoding", "embedding", HashingEmbedder(dim=16))
    registry.create_model("retail_assistant", "text_generation", TemplateLLM())
    docs = spark.createDataFrame(
        [(i, f"product number {i} with feature f{i % 7}") for i in range(60)],
        "product_id long, content string",
    )
    corpus = registry.ml_predict(docs, "vector_encoding", "content")
    path = str(tmp_path / "ragidx")
    indexed, cents = build_ivf_index(corpus, "vector", n_clusters=4, seed=42)
    save_ivf_index(indexed, cents, path)

    pipe = RagPipeline(registry, k=3, vector_index=path, recall_target=0.9)
    questions = spark.createDataFrame(
        [("user", f"tell me about feature f{i}", str(i)) for i in range(5)],
        "role string, content string, sessionid string",
    )
    out = pipe.run_batch(questions)
    assert out.count() == 5
    assert os.path.exists(os.path.join(path, "_calibration.json"))


def test_query_fingerprint_guards_workload_shift(spark, qc, tmp_path):
    """Round 8: the cached curve embeds the query sample's distribution.
    Folding a query fingerprint into the key makes a CHANGED query set
    miss (re-measure) while the same set still hits with zero jobs."""
    from confluent_kafka_vector_search_prompt_inference_spark.operators.calibration_cache import query_sample_fingerprint

    q, c = qc
    cache = CalibrationCache(str(tmp_path / "cal.json"))
    common = dict(
        strategy="binary", query_id="qid", corpus_id="cid", cache=cache
    )
    fp1 = query_sample_fingerprint(q, "qid", "vector")
    calibrate_recall_depth(
        q, c, 5, recall_target=0.9, query_fingerprint=fp1, **common
    )
    _, jobs_same = _jobs_run(
        spark, "qfp-hit",
        lambda: calibrate_recall_depth(
            q, c, 5, recall_target=0.9, query_fingerprint=fp1, **common
        ),
    )
    assert jobs_same == 0

    q2 = q.withColumn("qid", F.col("qid") + 1000)
    fp2 = query_sample_fingerprint(q2, "qid", "vector")
    assert fp2 != fp1
    _, jobs_shift = _jobs_run(
        spark, "qfp-miss",
        lambda: calibrate_recall_depth(
            q2, c, 5, recall_target=0.9, query_fingerprint=fp2, **common
        ),
    )
    assert jobs_shift > 0  # shifted workload re-measures


def test_recalibrate_bypasses_lookup_and_restores_hits(spark, qc, tmp_path):
    q, c = qc
    cache = CalibrationCache(str(tmp_path / "cal.json"))
    common = dict(
        strategy="binary", query_id="qid", corpus_id="cid", cache=cache
    )
    calibrate_recall_depth(q, c, 5, recall_target=0.9, **common)
    _, jobs_forced = _jobs_run(
        spark, "recal",
        lambda: calibrate_recall_depth(
            q, c, 5, recall_target=0.9, recalibrate=True, **common
        ),
    )
    assert jobs_forced > 0  # lookup bypassed, measured fresh
    _, jobs_after = _jobs_run(
        spark, "recal-hit",
        lambda: calibrate_recall_depth(q, c, 5, recall_target=0.9, **common),
    )
    assert jobs_after == 0  # ...and the fresh curve was stored


def test_query_fingerprint_deterministic_under_partitioning(spark, qc):
    """Round-8 review: the fingerprint (and the calibrators' sample)
    selects rows in hash order, not bare limit() order — the same
    workload must fingerprint identically regardless of how its
    DataFrame happens to be partitioned."""
    from confluent_kafka_vector_search_prompt_inference_spark.operators.calibration_cache import query_sample_fingerprint

    q, _corpus = qc
    q = q.select("qid", "vector")
    fp1 = query_sample_fingerprint(q, "qid", "vector")
    fp2 = query_sample_fingerprint(q.repartition(7), "qid", "vector")
    fp3 = query_sample_fingerprint(q.repartition(1).sort("vector"), "qid", "vector")
    assert fp1 == fp2 == fp3
