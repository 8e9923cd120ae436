"""Vector functions + top-k similarity join: strategies agree, numpy oracle,
LSH recall (SURVEY.md §5 property tests)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from confluent_kafka_vector_search_prompt_inference_spark.functions.vector import (
    vec_cosine,
    vec_dot,
    vec_l2_distance,
    vec_l2norm,
    vec_normalize,
)
from confluent_kafka_vector_search_prompt_inference_spark.operators.topk_join import topk_similarity_join


@pytest.fixture(scope="module")
def qc(embeddings):
    q = embeddings.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("vector")
    )
    c = embeddings.filter(F.col("vec_id") >= 20).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("vector")
    )
    return q, c


def _np_topk(embeddings_pdf, k=5):
    """Brute-force float64 oracle."""
    q = embeddings_pdf[embeddings_pdf.vec_id < 20]
    c = embeddings_pdf[embeddings_pdf.vec_id >= 20]
    qm = np.array([np.asarray(v, dtype=np.float64) for v in q.embedding])
    cm = np.array([np.asarray(v, dtype=np.float64) for v in c.embedding])
    cids = c.vec_id.to_numpy()
    scores = qm @ cm.T
    out = {}
    for i, qid in enumerate(q.vec_id.to_numpy()):
        order = np.lexsort((cids, -scores[i]))[:k]
        out[qid] = list(cids[order])
    return out


def test_vector_functions_vs_numpy(spark):
    a = [1.0, 2.0, 3.0]
    b = [4.0, -5.0, 6.0]
    df = spark.createDataFrame([(a, b)], "a array<float>, b array<float>")
    row = df.select(
        vec_dot("a", "b").alias("dot"),
        vec_cosine("a", "b").alias("cos"),
        vec_l2norm("a").alias("na"),
        vec_l2_distance("a", "b").alias("dist"),
        vec_normalize("a").alias("unit"),
    ).first()
    na, nb = np.array(a), np.array(b)
    assert row.dot == pytest.approx(float(na @ nb))
    assert row.cos == pytest.approx(float(na @ nb / (np.linalg.norm(na) * np.linalg.norm(nb))))
    assert row.na == pytest.approx(float(np.linalg.norm(na)))
    assert row.dist == pytest.approx(float(np.linalg.norm(na - nb)))
    assert np.allclose(row.unit, na / np.linalg.norm(na))


def test_normalize_zero_vector(spark):
    df = spark.createDataFrame([([0.0, 0.0],)], "a array<float>")
    assert df.select(vec_normalize("a").alias("u")).first().u == [0.0, 0.0]


@pytest.mark.parametrize("strategy", ["broadcast_corpus", "broadcast_queries", "shuffle"])
def test_exact_strategies_match_numpy(spark, embeddings, qc, strategy):
    q, c = qc
    out = topk_similarity_join(
        q, c, k=5, query_id="qid", query_vec="vector",
        corpus_id="cid", corpus_vec="vector", metric="dot", strategy=strategy,
    ).toPandas()
    oracle = _np_topk(embeddings.toPandas(), k=5)
    got = {
        qid: list(g.sort_values("rank").cid)
        for qid, g in out.groupby("qid")
    }
    assert got == oracle


def test_auto_picks_broadcast_for_small_corpus(spark, qc):
    q, c = qc
    out = topk_similarity_join(
        q, c, k=3, query_id="qid", query_vec="vector",
        corpus_id="cid", corpus_vec="vector", strategy="auto",
    )
    assert out.count() == q.count() * 3


def test_auto_picker_launches_no_jobs(spark, qc, monkeypatch):
    """Strategy choice reads Catalyst plan statistics only — no count/first/
    collect jobs on the (possibly 100 TB) inputs (VERDICT r1 scale-weak #1)."""
    from pyspark.sql import DataFrame

    from confluent_kafka_vector_search_prompt_inference_spark.operators import topk_join as tj

    def boom(self, *a, **kw):
        raise AssertionError("strategy picker must not launch a Spark job")

    monkeypatch.setattr(DataFrame, "count", boom)
    monkeypatch.setattr(DataFrame, "first", boom)
    monkeypatch.setattr(DataFrame, "collect", boom)
    q, c = qc
    assert tj._pick_strategy(q, c) == "broadcast_corpus"


def test_auto_escalates_to_ann_past_budgets(spark, qc, monkeypatch):
    """Past both exact broadcast budgets auto walks the quantization
    ladder quantized → binary → lsh (mirroring the reference's
    always-indexed search, README.md:355-366); exact_only caps the
    escalation at shuffle."""
    from confluent_kafka_vector_search_prompt_inference_spark.operators import topk_join as tj

    q, c = qc
    monkeypatch.setattr(tj, "_BROADCAST_BUDGET_BYTES", 0)
    assert tj._pick_strategy(q, c) == "lsh"
    assert tj._pick_strategy(q, c, exact_only=True) == "shuffle"
    cb = tj._plan_size_bytes(c)
    # budget window that fits the int8 codes but not the float32 matrix
    monkeypatch.setattr(tj, "_BROADCAST_BUDGET_BYTES", cb // 4)
    assert tj._pick_strategy(c, c) == "quantized"
    # window that fits only the 1-bit signatures
    monkeypatch.setattr(tj, "_BROADCAST_BUDGET_BYTES", cb // 32)
    assert tj._pick_strategy(c, c) == "binary"
    # cosine cannot use the sign-bit screen: auto falls through to lsh
    out = topk_similarity_join(
        q, c, k=1, query_id="qid", query_vec="vector",
        corpus_id="cid", corpus_vec="vector", metric="cosine",
        strategy="auto", num_candidates=50,
    )
    assert out.count() > 0


def test_auto_ann_switchover_still_answers(spark, embeddings, qc, monkeypatch):
    """End-to-end: with budgets forced to 0, auto runs the LSH path and the
    planted-copy queries still retrieve their originals."""
    from confluent_kafka_vector_search_prompt_inference_spark.operators import topk_join as tj

    monkeypatch.setattr(tj, "_BROADCAST_BUDGET_BYTES", 0)
    c = embeddings.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("vector"))
    q = c.filter(F.col("cid") < 3).select(F.col("cid").alias("qid"), "vector")
    out = topk_similarity_join(
        q, c, k=1, query_id="qid", query_vec="vector",
        corpus_id="cid", corpus_vec="vector", strategy="auto", num_candidates=50,
    ).toPandas()
    assert dict(zip(out.qid, out.cid)) == {0: 0, 1: 1, 2: 2}


def test_empty_corpus_returns_empty_frame(spark, qc):
    """Empty side → empty result with the declared schema (ADVICE r1: the
    old picker crashed in the matmul on a 0-d broadcast matrix)."""
    q, c = qc
    empty_c = c.filter(F.lit(False))
    for strategy in ("broadcast_corpus", "auto"):
        out = topk_similarity_join(
            q, empty_c, k=3, query_id="qid", query_vec="vector",
            corpus_id="cid", corpus_vec="vector", strategy=strategy,
        )
        assert out.count() == 0
        assert [f.name for f in out.schema.fields] == ["qid", "cid", "score", "rank"]
    # and the mirror image: empty query side
    out = topk_similarity_join(
        q.filter(F.lit(False)), c, k=3, query_id="qid", query_vec="vector",
        corpus_id="cid", corpus_vec="vector", strategy="broadcast_queries",
    )
    assert out.count() == 0


def test_lsh_finds_planted_neighbors(spark, embeddings):
    """LSH's contract is high-similarity retrieval: queries that are copies
    of corpus vectors must retrieve their original at rank 1."""
    c = embeddings.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("vector"))
    q = embeddings.filter(F.col("vec_id") < 30).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("vector")
    )
    out = topk_similarity_join(
        q, c, k=1, query_id="qid", query_vec="vector",
        corpus_id="cid", corpus_vec="vector", metric="cosine",
        strategy="lsh", num_candidates=50,
    ).toPandas()
    hits = sum(1 for r in out.itertuples() if r.qid == r.cid)
    assert hits >= 27, f"only {hits}/30 planted neighbors found at rank 1"


def test_lsh_recall_on_random_topk(spark, embeddings, qc):
    """On unstructured vectors LSH recall is inherently modest — assert the
    probe-width knob still buys reasonable recall (numCandidates semantics,
    reference README.md:364-368)."""
    q, c = qc
    exact = topk_similarity_join(
        q, c, k=5, query_id="qid", query_vec="vector",
        corpus_id="cid", corpus_vec="vector", strategy="broadcast_corpus",
    ).toPandas()
    approx = topk_similarity_join(
        q, c, k=5, query_id="qid", query_vec="vector",
        corpus_id="cid", corpus_vec="vector", strategy="lsh", num_candidates=200,
    ).toPandas()
    exact_pairs = set(zip(exact.qid, exact.cid))
    approx_pairs = set(zip(approx.qid, approx.cid))
    recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
    assert recall >= 0.5, f"LSH recall too low: {recall}"


def test_num_candidates_cap(spark, qc):
    from confluent_kafka_vector_search_prompt_inference_spark.operators.topk_join import NUM_CANDIDATES_CAP

    assert NUM_CANDIDATES_CAP == 10_000  # reference README.md:368


def test_k_larger_than_corpus(spark):
    q = spark.createDataFrame([(1, [1.0, 0.0])], "qid int, vector array<float>")
    c = spark.createDataFrame(
        [(10, [1.0, 0.0]), (11, [0.0, 1.0])], "cid int, vector array<float>"
    )
    out = topk_similarity_join(
        q, c, k=5, query_id="qid", query_vec="vector",
        corpus_id="cid", corpus_vec="vector", strategy="broadcast_corpus",
    )
    assert out.count() == 2  # clamps to corpus size


def test_quantize_int8_roundtrip_error_bound(spark):
    """Dequantized values differ from the original by at most scale/2
    (symmetric rounding), and zero vectors survive."""
    from pyspark.sql import functions as F
    from confluent_kafka_vector_search_prompt_inference_spark.functions.vector import vec_quantize_int8

    df = spark.createDataFrame(
        [(1, [0.5, -1.0, 0.25, 0.0]), (2, [0.0, 0.0, 0.0, 0.0])],
        "id int, v array<double>",
    )
    rows = df.select("id", "v", vec_quantize_int8("v").alias("qv")).collect()
    for r in rows:
        assert len(r.qv.q) == len(r.v)
        assert all(-127 <= x <= 127 for x in r.qv.q)
        for orig, q in zip(r.v, r.qv.q):
            assert abs(orig - q * r.qv.scale) <= r.qv.scale / 2 + 1e-12


def test_quantized_topk_recall_vs_exact(spark, sf_smoke):
    """Quantized top-3 recovers most of the exact top-3 (int8 keeps ~2
    decimal digits of the score; embeddings are well-spread)."""
    from pyspark.sql import Window, functions as F
    from confluent_kafka_vector_search_prompt_inference_spark.functions.vector import (
        vec_dot, vec_quantize_int8, vec_quantized_dot,
    )

    emb = spark.read.parquet(f"{sf_smoke}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    c = emb.filter(F.col("vec_id") >= 10).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("s"), F.asc("cid"))
    exact = (
        q.crossJoin(c).select("qid", "cid", vec_dot("qv", "cv").alias("s"))
        .withColumn("r", F.row_number().over(w)).filter("r <= 3")
    )
    quant = (
        q.select("qid", vec_quantize_int8("qv").alias("a"))
        .crossJoin(c.select("cid", vec_quantize_int8("cv").alias("b")))
        .select("qid", "cid", vec_quantized_dot("a", "b").alias("s"))
        .withColumn("r", F.row_number().over(w)).filter("r <= 3")
    )
    e = {(r.qid, r.cid) for r in exact.collect()}
    a = {(r.qid, r.cid) for r in quant.collect()}
    assert len(e & a) / len(e) >= 0.8


def test_quantized_strategy_with_rescore_recovers_exact_topk(spark, embeddings, qc):
    """strategy='quantized' + rescore_factor: the int8 coarse pass keeps
    r·k candidates, the float rescore recovers exactly the full-precision
    top-k (two-stage production recipe, now first-class in the join)."""
    q, c = qc
    out = topk_similarity_join(
        q, c, k=5, query_id="qid", query_vec="vector",
        corpus_id="cid", corpus_vec="vector", metric="dot",
        strategy="quantized", rescore_factor=8,
    ).toPandas()
    oracle = _np_topk(embeddings.toPandas(), k=5)
    got = {qid: list(g.sort_values("rank").cid) for qid, g in out.groupby("qid")}
    assert got == oracle


def test_quantized_strategy_without_rescore_has_high_recall(spark, embeddings, qc):
    q, c = qc
    approx = topk_similarity_join(
        q, c, k=5, query_id="qid", query_vec="vector",
        corpus_id="cid", corpus_vec="vector", metric="dot", strategy="quantized",
    ).toPandas()
    oracle = _np_topk(embeddings.toPandas(), k=5)
    hits = tot = 0
    for qid, g in approx.groupby("qid"):
        hits += len(set(g.cid) & set(oracle[qid]))
        tot += len(oracle[qid])
    assert hits / tot >= 0.8, hits / tot


# ---------------------------------------------------------------------------
# Matryoshka prefix-dim rescore + metadata-filtered search
# ---------------------------------------------------------------------------

def test_matryoshka_full_prefix_recovers_exact_topk(spark, embeddings, qc):
    """With the full dimensionality as the 'prefix' and a candidate pool
    covering the corpus, the two-stage result must EQUAL exact top-k —
    the plumbing invariant (slice/rescore/rank) with no approximation."""
    from confluent_kafka_vector_search_prompt_inference_spark.operators.topk_join import matryoshka_rescore_topk

    q, c = qc
    dim = len(q.first().vector)
    exact = topk_similarity_join(
        q, c, k=3, query_id="qid", corpus_id="cid", strategy="broadcast_corpus"
    )
    mrl = matryoshka_rescore_topk(
        q, c, k=3, query_id="qid", corpus_id="cid",
        coarse_dims=dim, rescore_factor=4,
    )
    e = {(r.qid, r.rank): r.cid for r in exact.collect()}
    m = {(r.qid, r.rank): r.cid for r in mrl.collect()}
    assert e == m


def test_matryoshka_recall_grows_with_prefix_width(spark, embeddings, qc):
    """Recall vs exact must grow with coarse_dims. The fixture embeddings
    are RANDOM (no MRL training), so information is spread uniformly
    across dims — the worst case for prefix truncation; absolute recall
    is therefore meaningless here, but the monotone width→recall relation
    and a sane floor at half-width are structural."""
    from confluent_kafka_vector_search_prompt_inference_spark.operators.topk_join import matryoshka_rescore_topk

    q, c = qc
    exact = topk_similarity_join(
        q, c, k=3, query_id="qid", corpus_id="cid", strategy="broadcast_corpus"
    )
    e = {(r.qid, r.cid) for r in exact.collect()}

    def recall(dims):
        m = {
            (r.qid, r.cid)
            for r in matryoshka_rescore_topk(
                q, c, k=3, query_id="qid", corpus_id="cid",
                coarse_dims=dims, rescore_factor=8,
            ).collect()
        }
        return len(e & m) / len(e)

    r8, r32 = recall(8), recall(32)
    assert r8 < r32
    assert r32 >= 0.5


def test_matryoshka_cosine_rejected(spark, qc):
    from confluent_kafka_vector_search_prompt_inference_spark.operators.topk_join import matryoshka_rescore_topk

    q, c = qc
    with pytest.raises(ValueError):
        matryoshka_rescore_topk(
            q, c, k=3, query_id="qid", corpus_id="cid",
            coarse_dims=8, metric="cosine",
        )


def test_filtered_search_composes_with_ivf(spark, embeddings):
    """A metadata predicate composes with the IVF index: filtering the
    indexed corpus before the probe (full probe width) returns exactly
    the filtered exact top-k — the filter can never starve top-k below k
    the way post-filtering a k-sized result would."""
    from confluent_kafka_vector_search_prompt_inference_spark.operators.ivf import build_ivf_index, topk_ivf

    q = embeddings.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("vector")
    )
    c = embeddings.filter(F.col("vec_id") >= 10).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("vector"), "label"
    )
    exact = topk_similarity_join(
        q, c.filter(F.col("label") == 2), k=3,
        query_id="qid", corpus_id="cid", strategy="broadcast_corpus",
    )
    indexed, cents = build_ivf_index(c, "vector", n_clusters=8, seed=42)
    approx = topk_ivf(
        q, indexed.filter(F.col("label") == 2), cents, k=3,
        query_id="qid", corpus_id="cid", metric="dot", n_probe=8,
    )
    e = {(r.qid, r.rank): r.cid for r in exact.collect()}
    a = {(r.qid, r.rank): r.cid for r in approx.collect()}
    assert e == a


def test_binary_quantize_hamming_matches_naive(spark):
    """Packed-word Hamming (XOR + bit_count over 64-bit words) equals the
    per-dimension sign-mismatch count, including non-multiple-of-64 dims
    (trailing pad bits must not contribute)."""
    from confluent_kafka_vector_search_prompt_inference_spark.functions.vector import vec_quantize_binary, vec_hamming
    import random

    random.seed(11)
    for dim in (3, 64, 70, 130):
        rows = [
            (
                [random.uniform(-1, 1) for _ in range(dim)],
                [random.uniform(-1, 1) for _ in range(dim)],
            )
            for _ in range(10)
        ]
        df = spark.createDataFrame(rows, "a array<double>, b array<double>")
        out = df.select(
            vec_hamming(vec_quantize_binary("a"), vec_quantize_binary("b")).alias("hp"),
            F.aggregate(
                F.zip_with(
                    "a", "b",
                    lambda x, y: F.when((x > 0) != (y > 0), F.lit(1).cast("bigint"))
                    .otherwise(F.lit(0).cast("bigint")),
                ),
                F.lit(0).cast("bigint"),
                lambda acc, x: acc + x,
            ).alias("hn"),
        ).collect()
        assert all(r.hp == r.hn for r in out), dim


def test_binary_quantize_zero_negative_convention(spark):
    """Zeros and negatives map to 0-bits; strict positives to 1-bits."""
    from confluent_kafka_vector_search_prompt_inference_spark.functions.vector import vec_quantize_binary

    df = spark.createDataFrame([([0.0, -1.0, 2.0, 0.5],)], "v array<double>")
    [r] = df.select(vec_quantize_binary("v").alias("w")).collect()
    assert r.w == [0b1100]


def test_binary_rescore_topk_recall_vs_exact(spark, qc):
    """On smoke embeddings the Hamming prefilter at rescore_factor=8
    recalls far above the random-candidate baseline (24 of ~1000 corpus
    rows ≈ 2% — we require ≥ 45% against exact top-3; unstructured
    random vectors are the worst case for 1-bit signatures, real
    embedding corpora cluster and do much better) — and the result is
    complete: exactly k rows per query, scores from the float rescore."""
    from confluent_kafka_vector_search_prompt_inference_spark.operators.topk_join import (
        binary_rescore_topk,
        topk_similarity_join,
    )

    q, c = qc
    exact = topk_similarity_join(
        q, c, k=3, query_id="qid", corpus_id="cid", strategy="broadcast_corpus"
    )
    bq = binary_rescore_topk(
        q, c, k=3, query_id="qid", corpus_id="cid", rescore_factor=8
    )
    e = {}
    for r in exact.collect():
        e.setdefault(r.qid, set()).add(r.cid)
    hits = total = 0
    for r in bq.collect():
        total += 1
        hits += r.cid in e[r.qid]
    assert total == 3 * len(e)
    assert hits / total >= 0.45


def test_threshold_join_binary_prefilter_matches_exact(spark, qc):
    """The sign-bit Hamming screen at the default margin keeps every pair
    the exact threshold join returns (conservative screening), and every
    returned score passes the threshold."""
    from confluent_kafka_vector_search_prompt_inference_spark.operators.topk_join import threshold_similarity_join

    q, c = qc
    kw = dict(
        query_id="qid", query_vec="vector",
        corpus_id="cid", corpus_vec="vector",
        metric="cosine", threshold=0.2, score_col="cos",
    )
    exact = threshold_similarity_join(q, c, prefilter=None, **kw)
    screened = threshold_similarity_join(q, c, prefilter="binary", **kw)
    e = {(r.qid, r.cid): r.cos for r in exact.collect()}
    s = {(r.qid, r.cid): r.cos for r in screened.collect()}
    assert e  # non-degenerate
    assert s == e
    assert all(v >= 0.2 for v in s.values())


def test_threshold_join_prefilter_requires_cosine(spark, qc):
    from confluent_kafka_vector_search_prompt_inference_spark.operators.topk_join import threshold_similarity_join

    q, c = qc
    with pytest.raises(ValueError, match="cosine"):
        threshold_similarity_join(
            q, c, query_id="qid", corpus_id="cid",
            metric="dot", threshold=0.5, prefilter="binary",
        ).collect()


# ---------------------------------------------------------------------------
# recall-contract calibration (recall_target=)
# ---------------------------------------------------------------------------

from confluent_kafka_vector_search_prompt_inference_spark.operators.topk_join import (  # noqa: E402
    calibrate_recall_depth,
)


def _agg_recall(result_pdf, oracle, k):
    """result vs brute-force oracle: fraction of true top-k recovered."""
    hits = 0
    possible = sum(len(v) for v in oracle.values())
    got = result_pdf.groupby("qid")["cid"].apply(set)
    for qid, true_ids in oracle.items():
        hits += len(set(true_ids) & got.get(qid, set()))
    return hits / possible


@pytest.mark.parametrize("strategy", ["binary", "lsh"])
def test_calibrated_depth_meets_target_on_sample(spark, embeddings, qc, strategy):
    """The round-6 contract: when the query set IS the calibration sample
    (≤ sample_queries rows), the calibrated depth guarantees aggregate
    recall@k ≥ recall_target on it — measured, not assumed."""
    q, c = qc
    k, target = 5, 0.8
    depth, measured = calibrate_recall_depth(
        q, c, k, strategy=strategy, recall_target=target,
        query_id="qid", corpus_id="cid", sample_queries=32,
    )
    assert measured >= target
    kwargs = dict(
        query_id="qid", corpus_id="cid", strategy=strategy, k=k,
        recall_target=target, calibration_sample=32,
    )
    res = topk_similarity_join(q, c, **kwargs).toPandas()
    oracle = _np_topk(embeddings.toPandas(), k=k)
    assert _agg_recall(res, oracle, k) >= target


def test_calibration_depth_monotone_in_target(spark, qc):
    """A stricter target can only deepen the probe (the ladder is walked
    smallest-first and recall is monotone in depth by prefix inclusion)."""
    q, c = qc
    d_loose, r_loose = calibrate_recall_depth(
        q, c, 5, strategy="binary", recall_target=0.3,
        query_id="qid", corpus_id="cid",
    )
    d_tight, r_tight = calibrate_recall_depth(
        q, c, 5, strategy="binary", recall_target=1.0,
        query_id="qid", corpus_id="cid",
    )
    assert d_tight >= d_loose
    assert r_tight == 1.0


def test_calibration_argument_contracts(spark, qc):
    q, c = qc
    with pytest.raises(ValueError, match="recall_target"):
        calibrate_recall_depth(
            q, c, 5, strategy="binary", recall_target=1.5,
            query_id="qid", corpus_id="cid",
        )
    with pytest.raises(ValueError, match="metric='dot'"):
        calibrate_recall_depth(
            q, c, 5, strategy="binary", recall_target=0.9, metric="cosine",
            query_id="qid", corpus_id="cid",
        )
    with pytest.raises(ValueError, match="exact tiers"):
        calibrate_recall_depth(
            q, c, 5, strategy="broadcast_corpus", recall_target=0.9,
            query_id="qid", corpus_id="cid",
        )
    # k so large even the shallowest rescore rung busts the candidates cap:
    # a clear contract error, not a bare IndexError off an empty ladder
    with pytest.raises(ValueError, match="numCandidates cap"):
        calibrate_recall_depth(
            q, c, 6000, strategy="binary", recall_target=0.9,
            query_id="qid", corpus_id="cid",
        )


def test_recall_target_skipped_on_exact_strategies(spark, qc, monkeypatch):
    """recall_target on an exact tier must not trigger calibration jobs."""
    from confluent_kafka_vector_search_prompt_inference_spark.operators import topk_join as tj

    def boom(*a, **kw):
        raise AssertionError("calibration ran for an exact strategy")

    monkeypatch.setattr(tj, "calibrate_recall_depth", boom)
    q, c = qc
    res = tj.topk_similarity_join(
        q, c, 3, query_id="qid", corpus_id="cid",
        strategy="broadcast_corpus", recall_target=0.99,
    )
    assert res.count() > 0


def test_explicit_depth_wins_over_calibration(spark, qc, monkeypatch):
    """An explicit rescore_factor/num_candidates is the caller's decision;
    recall_target must not override it with a calibration run."""
    from confluent_kafka_vector_search_prompt_inference_spark.operators import topk_join as tj

    def boom(*a, **kw):
        raise AssertionError("calibration ran despite explicit depth")

    monkeypatch.setattr(tj, "calibrate_recall_depth", boom)
    q, c = qc
    res = tj.topk_similarity_join(
        q, c, 3, query_id="qid", corpus_id="cid",
        strategy="binary", rescore_factor=4, recall_target=0.9,
    )
    assert res.count() > 0


def test_topk_prepared_equals_broadcast_strategy(spark, embeddings, qc):
    """PreparedCorpus (SparkFiles .npy + mmap scorer) must return exactly
    the per-call broadcast_corpus strategy's results — same ids, scores,
    ranks — and be reusable across calls (the streaming steady state)."""
    from confluent_kafka_vector_search_prompt_inference_spark.operators.topk_join import (
        prepare_broadcast_corpus,
        topk_prepared,
    )

    q, c = qc
    prepared = prepare_broadcast_corpus(c, corpus_id="cid")
    try:
        base = topk_similarity_join(
            q, c, 5, query_id="qid", corpus_id="cid", strategy="broadcast_corpus"
        ).toPandas().sort_values(["qid", "rank"]).reset_index(drop=True)
        for _ in range(2):  # reuse across calls, like micro-batches
            got = (
                topk_prepared(q, prepared, 5, query_id="qid")
                .toPandas()
                .sort_values(["qid", "rank"])
                .reset_index(drop=True)
            )
            assert got[["qid", "cid", "rank"]].equals(base[["qid", "cid", "rank"]])
            assert (got["score"] - base["score"]).abs().max() == 0.0
    finally:
        prepared.unpersist()


def test_prepare_broadcast_corpus_budget_gate(spark, qc):
    from confluent_kafka_vector_search_prompt_inference_spark.operators.topk_join import prepare_broadcast_corpus

    q, c = qc
    with pytest.raises(ValueError, match="IVF"):
        prepare_broadcast_corpus(c, corpus_id="cid", budget_bytes=64)


def test_prepare_broadcast_corpus_budget_prices_shipped_float64(spark, qc):
    """The gate prices the staged float64 .npy (what actually lands on
    every executor), not the float32 matrix: a corpus in the gap —
    float32 under budget, float64 over — raises deterministically."""
    from confluent_kafka_vector_search_prompt_inference_spark.operators.topk_join import prepare_broadcast_corpus

    _, c = qc
    rows = c.count()
    dim = len(c.select("vector").first()[0])
    f32 = rows * dim * 4
    # budget sits strictly between the float32 size and the 2× shipped size
    with pytest.raises(ValueError, match="float64"):
        prepare_broadcast_corpus(c, corpus_id="cid", budget_bytes=f32 + 1)
    # at exactly the shipped size the preparation succeeds
    prepared = prepare_broadcast_corpus(c, corpus_id="cid", budget_bytes=f32 * 2)
    prepared.unpersist()


def test_prepared_corpus_refreshed_sees_new_rows(spark, qc):
    """PreparedCorpus is a documented snapshot: appends are invisible
    until refreshed() re-prepares, after which the new rows rank."""
    from confluent_kafka_vector_search_prompt_inference_spark.operators.topk_join import (
        prepare_broadcast_corpus,
        topk_prepared,
    )

    q, c = qc
    one_q = q.limit(1)
    prepared = prepare_broadcast_corpus(c, corpus_id="cid")
    base = topk_prepared(one_q, prepared, 3, query_id="qid").toPandas()
    # a new corpus row identical to the query vector scores max
    clone = one_q.select(
        (F.col("qid") + 1_000_000).alias("cid"), F.col("vector")
    )
    grown = c.unionByName(clone)
    stale = topk_prepared(one_q, prepared, 3, query_id="qid").toPandas()
    assert sorted(stale.cid) == sorted(base.cid)  # snapshot: append invisible
    fresh = prepared.refreshed(grown)
    try:
        seen = topk_prepared(one_q, fresh, 3, query_id="qid").toPandas()
        assert (seen.cid >= 1_000_000).any()  # refresh made it visible
    finally:
        fresh.unpersist()
