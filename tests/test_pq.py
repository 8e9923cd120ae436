"""Product quantization: encoding shape, reconstruction sanity, ADC recall
vs the exact scorer."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from confluent_kafka_vector_search_prompt_inference_spark.operators.pq import pq_encode, topk_pq, train_pq_codebooks
from confluent_kafka_vector_search_prompt_inference_spark.operators.topk_join import topk_similarity_join


@pytest.fixture(scope="module")
def pq_setup(spark, embeddings):
    corpus = embeddings.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("vector"))
    books = train_pq_codebooks(corpus, m=8, k=64, sample_rows=500)
    encoded = pq_encode(corpus, books).cache()
    return corpus, books, encoded


def test_codebook_and_code_shapes(pq_setup):
    corpus, books, encoded = pq_setup
    assert books.shape[0] == 8 and books.shape[2] == 8  # 64-dim / m=8
    row = encoded.select("pq_codes").first()
    assert len(row.pq_codes) == 8
    assert all(0 <= c < books.shape[1] for c in row.pq_codes)


def test_adc_recall_vs_exact(spark, embeddings, pq_setup):
    corpus, books, encoded = pq_setup
    q = embeddings.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("vector")
    )
    approx = topk_pq(q, encoded, books, k=10, query_id="qid", corpus_id="cid")
    exact = topk_similarity_join(
        q, corpus, k=10,
        query_id="qid", query_vec="vector",
        corpus_id="cid", corpus_vec="vector",
        metric="dot", strategy="shuffle",
    )
    a = approx.toPandas().groupby("qid").cid.apply(set)
    e = exact.toPandas().groupby("qid").cid.apply(set)
    recalls = [len(a[i] & e[i]) / 10 for i in a.index]
    # the fixture embeddings are near-uniform random — PQ's worst case
    # (no cluster structure to exploit). Chance top-10 overlap is
    # 10/500 = 0.02; ≥0.35 at 32× compression demonstrates real signal,
    # and clustered production embeddings sit far higher.
    assert np.mean(recalls) >= 0.35, recalls


def test_self_match_survives_quantization(spark, embeddings, pq_setup):
    corpus, books, encoded = pq_setup
    q = embeddings.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("vector")
    )
    out = topk_pq(q, encoded, books, k=10, query_id="qid", corpus_id="cid").toPandas()
    hits = out[out.qid == out.cid]
    assert len(hits) >= 8  # a vector's own code is (almost) always in its top-10


def test_pq_coarse_plus_exact_rescore_recovers_topk(spark, embeddings, pq_setup):
    """The production pattern: PQ ADC coarse top-50 (32× compressed scan)
    → full-precision rescore of the shortlist → top-10. Recovers nearly
    the exact top-10 despite the compressed first pass."""
    from confluent_kafka_vector_search_prompt_inference_spark.functions.vector import vec_dot
    from pyspark.sql import Window

    corpus, books, encoded = pq_setup
    q = embeddings.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("vector")
    )
    coarse = topk_pq(q, encoded, books, k=50, query_id="qid", corpus_id="cid")
    rescored = (
        coarse.select("qid", "cid")
        .join(corpus.withColumnRenamed("vector", "cv"), "cid")
        .join(q.withColumnRenamed("vector", "qv"), "qid")
        .select("qid", "cid", vec_dot("qv", "cv").alias("s"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("s"), F.asc("cid"))
    final = rescored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= 10)

    exact = topk_similarity_join(
        q, corpus, k=10,
        query_id="qid", query_vec="vector",
        corpus_id="cid", corpus_vec="vector",
        metric="dot", strategy="shuffle",
    )
    a = final.toPandas().groupby("qid").cid.apply(set)
    e = exact.toPandas().groupby("qid").cid.apply(set)
    recalls = [len(a[i] & e[i]) / 10 for i in a.index]
    import numpy as np
    assert np.mean(recalls) >= 0.8, recalls


def test_pq_string_ids_and_no_query_collect(spark, embeddings, pq_setup, monkeypatch):
    """Output id columns inherit their schema types (string corpus ids work —
    ADVICE r1 flagged the hardcoded ``long``), and the query side is never
    ``.collect()``-ed row-by-row into LUTs on the driver: results flow through
    the broadcast + partial-top-k path."""
    corpus, books, encoded = pq_setup
    enc_str = encoded.withColumn("cid", F.concat(F.lit("doc-"), F.col("cid")))
    q = embeddings.filter(F.col("vec_id") < 3).select(
        F.concat(F.lit("q-"), F.col("vec_id")).alias("qid"), F.col("embedding").alias("vector")
    )
    out = topk_pq(q, enc_str, books, k=5, query_id="qid", corpus_id="cid")
    assert dict(out.dtypes)["qid"] == "string" and dict(out.dtypes)["cid"] == "string"
    pdf = out.toPandas()
    assert set(pdf.qid) == {"q-0", "q-1", "q-2"}
    assert (pdf.groupby("qid").size() == 5).all()
    assert pdf.cid.str.startswith("doc-").all()


def test_codebooks_deterministic_per_seed(spark, embeddings):
    corpus = embeddings.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("vector"))
    a = train_pq_codebooks(corpus, m=4, k=16, sample_rows=200, seed=7)
    b = train_pq_codebooks(corpus, m=4, k=16, sample_rows=200, seed=7)
    c = train_pq_codebooks(corpus, m=4, k=16, sample_rows=200, seed=8)
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)


def test_pq_index_roundtrip_preserves_search(spark, embeddings, pq_setup, tmp_path):
    """Persisted PQ index (encoded corpus + codebook table) reloads to the
    identical codebook tensor and yields the identical search results —
    the encode-once / search-many operating mode."""
    from confluent_kafka_vector_search_prompt_inference_spark.operators.pq import load_pq_index, save_pq_index

    _, books, encoded = pq_setup
    path = str(tmp_path / "pq_index")
    save_pq_index(encoded, books, path)
    corpus2, books2 = load_pq_index(spark, path)
    assert books2.shape == books.shape
    assert np.allclose(books2, books)
    q = embeddings.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("vector")
    )
    fresh = topk_pq(q, encoded, books, k=5, query_id="qid", corpus_id="cid").toPandas()
    loaded = topk_pq(q, corpus2, books2, k=5, query_id="qid", corpus_id="cid").toPandas()
    key = ["qid", "rank"]
    assert (
        fresh.sort_values(key).reset_index(drop=True)[["qid", "cid", "rank"]]
        .equals(loaded.sort_values(key).reset_index(drop=True)[["qid", "cid", "rank"]])
    )


def test_pq_append_without_retraining(spark, embeddings, pq_setup, tmp_path):
    """pq_append encodes new vectors with the frozen codebooks and appends
    them to the saved corpus: codebooks unchanged, counts grow, and an
    appended exact copy scores identically to its original under ADC
    (same codes ⇒ same LUT sums)."""
    from confluent_kafka_vector_search_prompt_inference_spark.operators.pq import (
        load_pq_index,
        pq_append,
        save_pq_index,
    )

    _, books, encoded = pq_setup
    path = str(tmp_path / "pq_index")
    save_pq_index(encoded, books, path)
    new_rows = embeddings.filter(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 100000).alias("cid"), F.col("embedding").alias("vector")
    )
    pq_append(new_rows, path)
    corpus2, books2 = load_pq_index(spark, path)
    assert np.allclose(books2, books)  # frozen
    assert corpus2.count() == encoded.count() + 5
    # identical vector ⇒ identical codes ⇒ identical ADC score: both copies
    # appear in a top-k wide enough to hold the tie
    q = embeddings.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("vector")
    )
    out = topk_pq(q, corpus2, books2, k=3, query_id="qid", corpus_id="cid").toPandas()
    for qid, grp in out.groupby("qid"):
        both = grp[grp.cid.isin([qid, qid + 100000])]
        assert len(both) == 2
        assert both.score.nunique() == 1


def test_pq_append_rejects_schema_mismatch(spark, embeddings, pq_setup, tmp_path):
    import pytest as _pytest

    from confluent_kafka_vector_search_prompt_inference_spark.operators.pq import pq_append, save_pq_index

    _, books, encoded = pq_setup
    path = str(tmp_path / "pq_index")
    save_pq_index(encoded, books, path)
    wrong = embeddings.filter(F.col("vec_id") < 3).select(
        (F.col("vec_id") + 200000).alias("other_id"),
        F.col("embedding").alias("vector"),
    )
    with _pytest.raises(ValueError, match="schema mismatch"):
        pq_append(wrong, path)


def test_codebook_training_is_order_invariant(spark, sf_smoke):
    """Codebooks must not depend on physical row order: a skew-sorted
    corpus (the at-scale failure mode of prefix sampling — one partition's
    correlated rows) trains byte-identical codebooks to a shuffled one,
    because the sample is bottom-n by content hash."""
    emb = spark.read.parquet(f"{sf_smoke}/embeddings.parquet").select(
        "vec_id", "label", F.col("embedding").alias("vector")
    )
    skew_sorted = emb.orderBy("label", "vec_id").coalesce(2)
    shuffled = emb.orderBy(F.xxhash64("vec_id")).repartition(8)
    b1 = train_pq_codebooks(skew_sorted, "vector", m=4, sample_rows=200)
    b2 = train_pq_codebooks(shuffled, "vector", m=4, sample_rows=200)
    assert np.array_equal(b1, b2)


def test_pq_delete_and_vacuum(spark, embeddings, pq_setup, tmp_path):
    """Tombstoned ids vanish from loaded-corpus search immediately;
    vacuum reclaims them physically, clears tombstones, and search
    results are unchanged by vacuuming."""
    import os

    from confluent_kafka_vector_search_prompt_inference_spark.operators.pq import (
        load_pq_index,
        pq_delete,
        pq_vacuum,
        save_pq_index,
    )

    _, books, encoded = pq_setup
    path = str(tmp_path / "pq_del")
    save_pq_index(encoded, books, path)
    q = embeddings.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("vector")
    )
    corpus1, books1 = load_pq_index(spark, path)
    # self-ids are in the corpus (pq_setup encodes the full embeddings set)
    assert corpus1.filter(F.col("cid") < 5).count() == 5
    pq_delete(spark.createDataFrame([(i,) for i in range(5)], "cid long"), path)
    corpus2, books2 = load_pq_index(spark, path)
    assert corpus2.filter(F.col("cid") < 5).count() == 0
    before = {
        (r.qid, r.cid, r.rank)
        for r in topk_pq(
            q, corpus2, books2, k=3, query_id="qid", corpus_id="cid"
        ).collect()
    }
    n = pq_vacuum(spark, path)
    assert n == 5
    assert not os.path.isdir(os.path.join(path, "tombstones"))
    corpus3, books3 = load_pq_index(spark, path)
    assert corpus3.filter(F.col("cid") < 5).count() == 0
    after = {
        (r.qid, r.cid, r.rank)
        for r in topk_pq(
            q, corpus3, books3, k=3, query_id="qid", corpus_id="cid"
        ).collect()
    }
    assert before == after


def test_pq_index_stats_utilization(spark, embeddings, pq_setup, tmp_path):
    """Stats report per-segment code utilization: counts bounded by k,
    entropy positive for a spread distribution, one row per segment."""
    from confluent_kafka_vector_search_prompt_inference_spark.operators.pq import pq_index_stats, save_pq_index

    _, books, encoded = pq_setup
    path = str(tmp_path / "pq_stats")
    save_pq_index(encoded, books, path)
    rows = pq_index_stats(spark, path).collect()
    assert len(rows) == books.shape[0]
    for r in rows:
        assert 1 <= r.codes_used <= r.codes_total
        assert r.entropy_bits >= 0.0
        import math

        assert r.entropy_bits <= math.log2(r.codes_total) + 1e-6
