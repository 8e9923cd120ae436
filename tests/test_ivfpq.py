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


# ---------------------------------------------------------------------------
# drift-triggered maintenance (round 6): split oversized clusters
# ---------------------------------------------------------------------------

from confluent_kafka_vector_search_prompt_inference_spark.operators.ivfpq import (  # noqa: E402
    ivfpq_append,
    ivfpq_split_oversized,
)


def _pq_drifted(embeddings, lo, hi, shift):
    return embeddings.filter(
        (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
    ).select(
        (F.col("vec_id") + 100_000).alias("cid"),
        F.transform("embedding", lambda x: x + shift)
        .cast("array<float>")
        .alias("vector"),
    )


def _probe_recall_pq(spark, path, queries, k=10, n_probe=2):
    corpus, cents, books = load_ivfpq_index(spark, path)
    approx = topk_ivfpq(
        queries, corpus, cents, books, k=k,
        query_id="qid", corpus_id="cid", n_probe=n_probe,
    ).select("qid", "cid")
    exact = topk_similarity_join(
        queries,
        corpus.select("cid", "vector"), k,
        query_id="qid", corpus_id="cid", strategy="broadcast_queries",
    ).select("qid", "cid")
    hits = exact.join(approx, ["qid", "cid"]).count()
    return hits / exact.count()


def test_ivfpq_split_heals_drift_and_reencodes(spark, embeddings, ivfpq_setup, tmp_path):
    """Drifted appends pile into one cluster; the split must (a) reduce
    skew with one more cluster and no row loss, (b) RE-ENCODE the moved
    rows' residual codes against their new sub-centroid (ADC scores are
    q·c + LUT(residual) — stale codes would mis-score every moved row),
    (c) keep probe recall on the drifted queries within epsilon of a
    fresh rebuild, and (d) leave append/delete working."""
    from confluent_kafka_vector_search_prompt_inference_spark.operators.ivfpq import ivfpq_vacuum

    corpus, encoded, centroids, books = ivfpq_setup
    path = str(tmp_path / "pq_drift")
    save_ivfpq_index(encoded, centroids, books, path)
    ivfpq_append(_pq_drifted(embeddings, 0, 300, 8.0), path)

    before, _, _ = load_ivfpq_index(spark, path)
    counts_before = dict(
        before.groupBy("ivf_cluster").count().collect()
    )
    assert max(counts_before.values()) >= 2.0 * (
        sum(counts_before.values()) / len(centroids)
    ), "drift failed to skew"
    # snapshot the drifted rows' codes before the split
    codes_before = {
        r.cid: list(r.pq_codes)
        for r in before.filter(F.col("cid") >= 100_000).select("cid", "pq_codes").collect()
    }

    split = ivfpq_split_oversized(spark, path, max_skew=2.0, seed=7)
    assert split

    after, cents_after, books_after = load_ivfpq_index(spark, path)
    counts_after = dict(after.groupBy("ivf_cluster").count().collect())
    assert len(cents_after) > len(centroids)
    assert sum(counts_after.values()) == sum(counts_before.values())
    assert max(counts_after.values()) < max(counts_before.values())
    assert books_after.shape == books.shape  # codebooks frozen

    # moved rows were re-encoded: at least some drifted rows changed codes
    codes_after = {
        r.cid: list(r.pq_codes)
        for r in after.filter(F.col("cid") >= 100_000).select("cid", "pq_codes").collect()
    }
    assert codes_after.keys() == codes_before.keys()
    changed = sum(1 for cid in codes_after if codes_after[cid] != codes_before[cid])
    assert changed > 0, "split rewrote directories but not residual codes"

    dq = _pq_drifted(embeddings, 0, 40, 8.0).select(
        (F.col("cid") - 100_000).alias("qid"), "vector"
    )
    r_split = _probe_recall_pq(spark, path, dq)
    fresh = str(tmp_path / "pq_fresh")
    all_rows = after.select("cid", "vector")
    fr_enc, fr_cents, fr_books = build_ivfpq_index(
        all_rows, n_clusters=len(cents_after), m=8, k=32, seed=7, sample_rows=500
    )
    save_ivfpq_index(fr_enc, fr_cents, fr_books, fresh)
    r_fresh = _probe_recall_pq(spark, fresh, dq)
    assert r_split >= r_fresh - 0.15, (r_split, r_fresh)

    # lifecycle intact after the split
    ivfpq_append(_pq_drifted(embeddings, 300, 310, 8.0), path)
    from confluent_kafka_vector_search_prompt_inference_spark.operators._index_io import write_tombstones

    write_tombstones(spark.createDataFrame([(100_000,)], "cid long"), path)
    reloaded, _, _ = load_ivfpq_index(spark, path)
    assert reloaded.filter(F.col("cid") == 100_000).count() == 0
    assert reloaded.filter(F.col("cid") >= 100_300).count() == 10
    assert ivfpq_vacuum(spark, path) == 1


# ---------------------------------------------------------------------------
# recall_target= on the two-stage tier (calibrate_ivfpq / topk_ivfpq_rescore)
# ---------------------------------------------------------------------------

from confluent_kafka_vector_search_prompt_inference_spark.operators.calibration_cache import CalibrationCache  # noqa: E402
from confluent_kafka_vector_search_prompt_inference_spark.operators.ivfpq import (  # noqa: E402
    calibrate_ivfpq,
    topk_ivfpq_rescore,
)


def _exact_sets(q, corpus, k=10):
    exact = topk_similarity_join(
        q, corpus, k=k,
        query_id="qid", query_vec="vector",
        corpus_id="cid", corpus_vec="vector",
        metric="dot", strategy="broadcast_queries",
    ).toPandas()
    return exact.groupby("qid").cid.apply(set)


def test_calibrated_rung_meets_target_on_sample(spark, embeddings, ivfpq_setup):
    """The picked (n_probe, adc_width) must deliver >= the measured sample
    recall when the query set IS the calibration sample (the determinism
    construction every vec_topk_auto* entry uses)."""
    corpus, encoded, centroids, books = ivfpq_setup
    q = _queries(embeddings)  # 20 queries, inside the 32-query sample
    (n_probe, width), measured = calibrate_ivfpq(
        q, encoded, centroids, books, 10,
        recall_target=0.8, query_id="qid", corpus_id="cid",
        max_adc_width=2_000,
    )
    assert measured >= 0.8
    out = topk_ivfpq_rescore(
        q, encoded, centroids, books, 10,
        query_id="qid", corpus_id="cid", n_probe=n_probe, adc_width=width,
    ).toPandas()
    e = _exact_sets(q, corpus)
    a = out.groupby("qid").cid.apply(set)
    got = sum(len(a.get(i, set()) & e[i]) for i in e.index)
    possible = sum(len(e[i]) for i in e.index)
    assert got / possible >= 0.8


def test_curve_monotone_in_both_knobs(spark, embeddings, ivfpq_setup, tmp_path):
    """Recall is non-decreasing along each lattice axis (prefix-monotone
    probe lists; wider shortlists are supersets) — read off the cached
    curve so the assert covers exactly what a cache hit serves."""
    corpus, encoded, centroids, books = ivfpq_setup
    q = _queries(embeddings)
    cache = CalibrationCache(str(tmp_path / "cal.json"))
    calibrate_ivfpq(
        q, encoded, centroids, books, 10,
        recall_target=0.8, query_id="qid", corpus_id="cid",
        max_adc_width=2_000, cache=cache,
    )
    import json

    doc = json.load(open(cache.path))
    (curve,) = doc.values()
    rungs = {tuple(map(int, key.split(":"))): r for key, r in curve.items()}
    probes = sorted({p for p, _ in rungs})
    widths = sorted({w for _, w in rungs})
    # width axis: nested shortlist prefixes over the SAME candidate pool —
    # guaranteed monotone at every probe width
    for p in probes:
        vals = [rungs[(p, w)] for w in widths]
        assert vals == sorted(vals), f"width axis not monotone at probe {p}"
    # probe axis: only guaranteed monotone when the shortlist holds the
    # whole pool (width >= corpus) — at narrower widths, ADC-misranked
    # rows from a newly probed cluster may displace true hits, which is
    # exactly why the contract is MEASURED instead of assumed
    vals = [rungs[(p, widths[-1])] for p in probes]
    assert vals == sorted(vals), "probe axis not monotone at full width"
    # the deepest rung (all clusters probed, shortlist >= corpus) covers
    # the exact top-k entirely: two-stage recall there is 1.0
    assert rungs[(max(probes), max(widths))] == 1.0


def test_ivfpq_cache_hit_runs_zero_jobs(spark, embeddings, ivfpq_setup, tmp_path):
    corpus, encoded, centroids, books = ivfpq_setup
    q = _queries(embeddings)
    cache = CalibrationCache(str(tmp_path / "cal.json"))
    common = dict(
        query_id="qid", corpus_id="cid", max_adc_width=500, cache=cache,
        corpus_fingerprint="pinned-test-state",
    )
    r1 = calibrate_ivfpq(
        q, encoded, centroids, books, 10, recall_target=0.7, **common
    )
    sc = spark.sparkContext
    sc.setJobGroup("ivfpq-cal-hit", "ivfpq-cal-hit")
    try:
        r2 = calibrate_ivfpq(
            q, encoded, centroids, books, 10, recall_target=0.7, **common
        )
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    assert r2 == r1
    assert len(sc.statusTracker().getJobIdsForGroup("ivfpq-cal-hit")) == 0
    # a DIFFERENT target against the same corpus is also a pure hit
    sc.setJobGroup("ivfpq-cal-hit2", "ivfpq-cal-hit2")
    try:
        calibrate_ivfpq(
            q, encoded, centroids, books, 10, recall_target=0.95, **common
        )
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    assert len(sc.statusTracker().getJobIdsForGroup("ivfpq-cal-hit2")) == 0


def test_unreachable_target_raises_descriptively(spark, embeddings, ivfpq_setup):
    """A shortlist capped far below k x (what ADC misranking demands)
    cannot cover the exact top-k; the calibrator must name the measured
    ceiling instead of silently under-delivering."""
    corpus, encoded, centroids, books = ivfpq_setup
    q = _queries(embeddings)
    with pytest.raises(ValueError, match="unreachable.*ceiling"):
        calibrate_ivfpq(
            q, encoded, centroids, books, 10,
            recall_target=1.0, query_id="qid", corpus_id="cid",
            max_adc_width=10,  # shortlist == k: every ADC misrank is a miss
        )


def test_rescore_recall_target_end_to_end(spark, embeddings, ivfpq_setup):
    """topk_ivfpq_rescore(recall_target=) calibrates and delivers: final
    scores are exact (rescore), rank contract matches the other topk ops."""
    corpus, encoded, centroids, books = ivfpq_setup
    q = _queries(embeddings, n=5)
    out = topk_ivfpq_rescore(
        q, encoded, centroids, books, 10,
        query_id="qid", corpus_id="cid",
        recall_target=0.8, max_adc_width=2_000,
    ).toPandas()
    assert set(out.columns) == {"qid", "cid", "score", "rank"}
    assert (out.groupby("qid")["rank"].max() == 10).all()
    # exact-score contract: every returned score equals the true dot product
    import pandas as pd

    qv = {r.qid: np.asarray(r.vector, np.float64) for r in q.collect()}
    cv = {
        r.cid: np.asarray(r.vector, np.float64)
        for r in corpus.filter(F.col("cid").isin([int(c) for c in out.cid])).collect()
    }
    for row in out.itertuples():
        assert abs(row.score - round(float(qv[row.qid] @ cv[row.cid]), 6)) < 1e-9
