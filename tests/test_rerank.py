"""MMR diversified rerank: pure-relevance degeneration, diversity pick,
and equivalence with an independent brute-force oracle."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from confluent_kafka_vector_search_prompt_inference_spark.operators.rerank import mmr_rerank


@pytest.fixture(scope="module")
def toy(spark):
    # A and B are near-duplicates, C is orthogonal and less relevant
    rows = [
        (1, 10, 1.00, [1.0, 0.0]),
        (1, 11, 0.99, [1.0, 0.01]),
        (1, 12, 0.50, [0.0, 1.0]),
        (2, 20, 0.30, [0.5, 0.5]),
        (2, 21, 0.90, [0.1, 0.9]),
    ]
    return spark.createDataFrame(
        rows, "query_id int, doc_id int, score double, vector array<double>"
    )


def test_lambda_one_is_pure_relevance_order(toy):
    out = mmr_rerank(toy, k=3, lam=1.0).toPandas()
    q1 = out[out.query_id == 1].sort_values("mmr_rank")
    assert list(q1.doc_id) == [10, 11, 12]
    q2 = out[out.query_id == 2].sort_values("mmr_rank")
    assert list(q2.doc_id) == [21, 20]


def test_diversity_prefers_orthogonal_over_near_duplicate(toy):
    out = mmr_rerank(toy, k=3, lam=0.5).toPandas()
    q1 = out[out.query_id == 1].sort_values("mmr_rank")
    # B (11) is ~identical to already-picked A (10): its redundancy wipes
    # out its relevance edge, so diverse C (12) goes second
    assert list(q1.doc_id) == [10, 12, 11]


def _mmr_oracle(ids, rel, vecs, k, lam):
    """Independent per-query greedy loop (no matrix ops)."""
    unit = []
    for v in vecs:
        v = np.asarray(v, dtype=np.float64)
        n = np.linalg.norm(v)
        unit.append(v / n if n else v)
    selected, remaining = [], sorted(range(len(ids)), key=lambda i: ids[i])
    for _ in range(min(k, len(ids))):
        best, best_score = None, None
        for i in remaining:
            red = max((float(unit[i] @ unit[j]) for j in selected), default=0.0)
            s = lam * rel[i] - (1 - lam) * red
            if best_score is None or s > best_score:
                best, best_score = i, s
        selected.append(best)
        remaining.remove(best)
    return [ids[i] for i in selected]


def test_matches_bruteforce_oracle_on_random_candidates(spark):
    rng = np.random.default_rng(42)
    rows = []
    for q in range(6):
        for d in range(30):
            rows.append(
                (q, d, float(np.round(rng.random(), 3)), [float(x) for x in rng.normal(size=8)])
            )
    df = spark.createDataFrame(
        rows, "query_id int, doc_id int, score double, vector array<double>"
    )
    out = mmr_rerank(df, k=8, lam=0.7).toPandas()
    by_q = {q: g.sort_values("mmr_rank").doc_id.tolist() for q, g in out.groupby("query_id")}
    for q in range(6):
        sub = [r for r in rows if r[0] == q]
        expect = _mmr_oracle(
            [r[1] for r in sub], [r[2] for r in sub], [r[3] for r in sub], 8, 0.7
        )
        assert by_q[q] == expect, f"query {q}"


def test_ranks_are_dense_and_scores_monotone_weakly(toy):
    out = mmr_rerank(toy, k=5, lam=0.7).toPandas()
    for _, g in out.groupby("query_id"):
        ranks = sorted(g.mmr_rank)
        assert ranks == list(range(1, len(g) + 1))


def test_cross_encoder_rerank_pair_scoring(spark):
    """The CE tier scores the PAIR: the query's own document gets Jaccard
    1.0 and rank 1; output is top-k per query with deterministic ties."""
    from confluent_kafka_vector_search_prompt_inference_spark.operators.rerank import cross_encoder_rerank

    docs = spark.createDataFrame(
        [
            (0, "red shoes for running fast"),
            (1, "red shoes for walking slow"),
            (2, "blue hats and winter coats"),
            (3, "running fast in red shoes"),
        ],
        ["doc_id", "text"],
    )
    queries = docs.filter(F.col("doc_id") == 0).select(
        F.col("doc_id").alias("query_id"), F.col("text").alias("query_text")
    )
    cands = spark.createDataFrame(
        [(0, 0), (0, 1), (0, 2), (0, 3)], ["query_id", "doc_id"]
    )
    out = cross_encoder_rerank(cands, queries, docs, k=3).toPandas()
    out = out.sort_values("ce_rank").reset_index(drop=True)
    assert list(out.doc_id)[:2] == [0, 3]  # identical text, then closest pair
    assert out.ce_score[0] == 1.0
    assert out.ce_score[1] == 0.666667  # {red,shoes,running,fast} / 6-token union
    assert len(out) == 3  # k bound holds
    # rank 1 vs 2 tie broke on ascending doc_id
    assert out.ce_rank.tolist() == [1, 2, 3]
    # parallelism invariance
    again = cross_encoder_rerank(
        cands.repartition(7), queries, docs.repartition(5), k=3
    ).toPandas().sort_values("ce_rank").reset_index(drop=True)
    assert again.doc_id.tolist() == out.doc_id.tolist()


def test_cross_encoder_corpus_never_shuffles(spark, sf_smoke):
    """The candidate list broadcasts into the corpus text-attach join —
    the corpus side must not exchange."""
    from confluent_kafka_vector_search_prompt_inference_spark.operators.rerank import cross_encoder_rerank
    from confluent_kafka_vector_search_prompt_inference_spark.plans import formatted_plan

    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet").select("doc_id", "text")
    queries = docs.filter(F.col("doc_id") < 2).select(
        F.col("doc_id").alias("query_id"), F.col("text").alias("query_text")
    )
    cands = spark.createDataFrame(
        [(q, d) for q in range(2) for d in range(10)], ["query_id", "doc_id"]
    )
    df = cross_encoder_rerank(cands, queries, docs, k=5)
    tree = formatted_plan(df).split("(1) Scan")[0]
    # the only data exchange allowed is the final per-query rank window
    n = sum(
        1 for line in tree.splitlines()
        if "Exchange" in line and "BroadcastExchange" not in line
    )
    assert n <= 1, tree
