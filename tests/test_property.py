"""Property tests (SURVEY.md §5): random inputs vs independent oracles."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from confluent_kafka_vector_search_prompt_inference_spark.functions.vector import vec_cosine, vec_dot, vec_l2norm
from confluent_kafka_vector_search_prompt_inference_spark.operators.topk_join import topk_similarity_join

finite_floats = st.floats(
    min_value=-100, max_value=100, allow_nan=False, allow_infinity=False, width=32
)


@settings(max_examples=15, deadline=None)
@given(
    st.lists(finite_floats, min_size=2, max_size=16),
    st.lists(finite_floats, min_size=2, max_size=16),
)
def test_vector_fns_match_numpy(spark, a, b):
    n = min(len(a), len(b))
    a, b = a[:n], b[:n]
    df = spark.createDataFrame([(a, b)], "a array<float>, b array<float>")
    row = df.select(
        vec_dot("a", "b").alias("dot"), vec_l2norm("a").alias("norm")
    ).first()
    na = np.asarray(a, dtype=np.float32).astype(np.float64)
    nb = np.asarray(b, dtype=np.float32).astype(np.float64)
    assert row.dot == pytest.approx(float(na @ nb), rel=1e-9, abs=1e-9)
    assert row.norm == pytest.approx(float(np.linalg.norm(na)), rel=1e-9, abs=1e-9)


@settings(max_examples=3, deadline=None)
@given(st.integers(min_value=1, max_value=50), st.integers(min_value=1, max_value=5))
def test_topk_strategies_agree_random(spark, n_corpus, k):
    rng = np.random.default_rng(n_corpus * 7 + k)
    q = spark.createDataFrame(
        [(int(i), [float(x) for x in rng.standard_normal(8)]) for i in range(3)],
        "qid bigint, vector array<float>",
    )
    c = spark.createDataFrame(
        [(int(i + 100), [float(x) for x in rng.standard_normal(8)]) for i in range(n_corpus)],
        "cid bigint, vector array<float>",
    )
    results = {}
    for strategy in ("broadcast_corpus", "broadcast_queries", "shuffle"):
        out = topk_similarity_join(
            q, c, k=k, query_id="qid", query_vec="vector",
            corpus_id="cid", corpus_vec="vector", strategy=strategy,
        ).toPandas()
        results[strategy] = sorted(zip(out.qid, out.cid, out["rank"]))
    assert results["broadcast_corpus"] == results["broadcast_queries"] == results["shuffle"]
