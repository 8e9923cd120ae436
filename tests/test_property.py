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
@pytest.mark.slow
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


# ---------------------------------------------------------------------------
# round-3 surfaces: schema evolution lattice, MinHash/LSH containment,
# near-dup matmul-vs-expression agreement
# ---------------------------------------------------------------------------

_types = st.sampled_from(["string", "bigint", "double"])
_names = st.lists(
    st.text(alphabet="abcdef", min_size=1, max_size=4), min_size=1, max_size=5,
    unique=True,
)


@settings(max_examples=25, deadline=None)
@given(_names, st.data())
def test_evolve_sink_schema_lattice(names, data):
    """evolve_sink_schema is exactly the add-only lattice: query ⊇ sink with
    equal types on the intersection → union in sink-then-query order;
    any drop or retype → SinkSchemaMismatch."""
    from pyspark.sql.types import StructField, StructType, _parse_datatype_string

    from confluent_kafka_vector_search_prompt_inference_spark.catalog import (
        SinkSchemaMismatch,
        evolve_sink_schema,
    )

    types = {n: data.draw(_types, label=f"type_{n}") for n in names}
    n_sink = data.draw(st.integers(1, len(names)), label="n_sink")
    sink_names = names[:n_sink]
    sink = StructType(
        [StructField(n, _parse_datatype_string(types[n])) for n in sink_names]
    )
    mutate = data.draw(st.sampled_from(["widen", "drop", "retype"]), label="mutate")
    if mutate == "widen":
        query = StructType(
            [StructField(n, _parse_datatype_string(types[n])) for n in names]
        )
        out = evolve_sink_schema(sink, query)
        assert [f.name for f in out.fields] == sink_names + names[n_sink:]
        # idempotent: evolving again with the same query is a no-op shape
        assert [f.name for f in evolve_sink_schema(out, query).fields] == [
            f.name for f in out.fields
        ]
    elif mutate == "drop":
        query = StructType(sink.fields[:-1])
        if len(sink.fields) == 1:
            query = StructType([])
        with pytest.raises(SinkSchemaMismatch):
            evolve_sink_schema(sink, query)
    else:
        flipped = {"string": "bigint", "bigint": "double", "double": "string"}
        query = StructType(
            [
                StructField(
                    f.name, _parse_datatype_string(flipped[f.dataType.simpleString()])
                )
                for f in sink.fields
            ]
        )
        with pytest.raises(SinkSchemaMismatch):
            evolve_sink_schema(sink, query)


@settings(max_examples=5, deadline=None)
@given(st.integers(min_value=0, max_value=10_000))
def test_minhash_verified_pairs_subset_of_exact(spark, seed):
    """For random near-dup corpora: the LSH-gated verified pair set is
    always a SUBSET of the exact Jaccard >= tau pair set (verification can
    only remove), and every planted exact copy is recovered (identical
    shingle sets collide in every band)."""
    import numpy as np

    from confluent_kafka_vector_search_prompt_inference_spark.operators.dedup import (
        minhash_lsh_candidates,
        minhash_signatures,
        ngram_jaccard_pairs,
    )

    rng = np.random.default_rng(seed)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]
    rows = []
    for i in range(12):
        words = [vocab[j] for j in rng.integers(0, len(vocab), size=12)]
        rows.append((i, " ".join(words)))
    rows += [(100 + i, rows[i][1]) for i in range(3)]  # planted exact copies
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    sigs = minhash_signatures(docs, "doc_id", "text", num_hashes=64, shingle_n=3)
    cands = minhash_lsh_candidates(
        sigs, "doc_id", bands=16, num_hashes=64, with_estimate=False
    )
    gated = ngram_jaccard_pairs(
        docs, "doc_id", "text", shingle_n=3, threshold=0.5, candidates=cands
    ).toPandas()
    exact = ngram_jaccard_pairs(
        docs, "doc_id", "text", shingle_n=3, threshold=0.5
    ).toPandas()
    g = set(zip(gated.id_a, gated.id_b))
    e = set(zip(exact.id_a, exact.id_b))
    assert g <= e
    assert {(i, 100 + i) for i in range(3)} <= g


@settings(max_examples=5, deadline=None)
@given(st.integers(min_value=0, max_value=10_000))
def test_embedding_near_dup_matmul_matches_expression(spark, seed):
    """The broadcast-matmul exact scorer agrees with a per-pair expression
    recomputation on random corpora (incl. a NULL row, which both drop)."""
    import numpy as np

    from confluent_kafka_vector_search_prompt_inference_spark.operators.dedup import (
        embedding_near_duplicates,
    )

    rng = np.random.default_rng(seed)
    rows = [
        (int(i), [float(x) for x in rng.standard_normal(8)]) for i in range(15)
    ]
    rows.append((100, rows[0][1]))  # exact duplicate pair (0, 100)
    rows.append((200, None))  # NULL vector must be dropped, not crash
    df = spark.createDataFrame(rows, "vec_id bigint, vector array<float>")
    got = embedding_near_duplicates(
        df, "vec_id", "vector", threshold=0.3, method="exact"
    ).toPandas()
    # independent recomputation with plain python
    import math

    vecs = {i: v for i, v in rows if v is not None}
    expect = set()
    for a in vecs:
        for b in vecs:
            if a < b:
                va = np.asarray(vecs[a], dtype=np.float32).astype(np.float64)
                vb = np.asarray(vecs[b], dtype=np.float32).astype(np.float64)
                na = float(np.linalg.norm(va)) or 1.0
                nb = float(np.linalg.norm(vb)) or 1.0
                if round(float(va @ vb) / (na * nb), 6) >= 0.3:
                    expect.add((a, b))
    assert set(zip(got.id_a, got.id_b)) == expect
    assert (0, 100) in expect


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.text(alphabet="abcdef", min_size=1, max_size=3),
        min_size=1, max_size=60,
    )
)
def test_countmin_never_undercounts_random_multisets(spark, terms):
    """For ANY multiset of terms, every point estimate >= the true count
    (collisions only add) and the sketch stays within depth×width cells."""
    from collections import Counter

    from confluent_kafka_vector_search_prompt_inference_spark.operators.sketches import countmin_build, countmin_lookup

    df = spark.createDataFrame([(t,) for t in terms], "term string")
    sketch = countmin_build(df, "term", depth=3, width=8)
    q = spark.createDataFrame([(t,) for t in set(terms)], "term string")
    est = {
        r.term: r.est
        for r in countmin_lookup(sketch, q, "term", depth=3, width=8).collect()
    }
    true = Counter(terms)
    assert all(est[t] >= c for t, c in true.items())
    assert sketch.count() <= 3 * 8


@settings(max_examples=8, deadline=None)
@given(st.integers(min_value=0, max_value=10_000))
def test_per_group_top_n_window_equivalence_random(spark, seed):
    """Salted two-phase top-N == single-window top-N on random data with
    random group skew."""
    import random

    from pyspark.sql import Window

    from confluent_kafka_vector_search_prompt_inference_spark.operators.sampling import per_group_top_n

    rng = random.Random(seed)
    n_groups = rng.randint(1, 5)
    rows = [
        (f"g{rng.randint(0, n_groups - 1)}", i, rng.random())
        for i in range(rng.randint(1, 300))
    ]
    n = rng.randint(1, 8)
    df = spark.createDataFrame(rows, "g string, id long, v double")
    got = {
        (r.g, r.id, r.rank)
        for r in per_group_top_n(
            df, ["g"], [F.desc("v"), F.asc("id")], n,
            salt_key="id", salt_parts=rng.choice([2, 4, 16]),
        ).collect()
    }
    w = Window.partitionBy("g").orderBy(F.desc("v"), F.asc("id"))
    want = {
        (r.g, r.id, r.rank)
        for r in df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= n)
        .collect()
    }
    assert got == want


@settings(max_examples=10, deadline=None)
@given(st.integers(min_value=0, max_value=10_000))
def test_packed_hamming_equals_naive_random(spark, seed):
    """vec_hamming over packed signatures == per-dimension sign-mismatch
    count for random dims (incl. non-multiples of 64) and values
    (incl. exact zeros, which must pack as 0-bits)."""
    import random

    from confluent_kafka_vector_search_prompt_inference_spark.functions.vector import vec_hamming, vec_quantize_binary

    rng = random.Random(seed)
    dim = rng.randint(1, 150)
    rows = [
        (
            [rng.choice([0.0, rng.uniform(-1, 1)]) for _ in range(dim)],
            [rng.choice([0.0, rng.uniform(-1, 1)]) for _ in range(dim)],
        )
        for _ in range(5)
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
    assert all(r.hp == r.hn for r in out)


def test_knn_label_eval_invariants(spark, sf_correct):
    """Aggregate invariants of the classifier-eval query: tp bounded by
    both marginals, micro-averaged tp total ≤ n queries, counts sum
    consistently."""
    import __spark_entry__ as entry

    out = entry.queries()["knn_label_eval"](spark, sf_correct).toPandas()
    assert (out.tp <= out.n_true).all() and (out.tp <= out.n_pred).all()
    assert out.n_true.sum() == out.n_pred.sum() == 100
    assert ((out.precision >= 0) & (out.precision <= 1)).all()
    assert ((out.recall >= 0) & (out.recall <= 1)).all()
    assert ((out.f1 >= 0) & (out.f1 <= 1)).all()
    # F1 is 0 exactly when precision+recall is 0
    zero = out[(out.precision + out.recall) == 0]
    assert (zero.f1 == 0).all()


def test_knn_vote_calibration_invariants(spark, sf_correct):
    import __spark_entry__ as entry

    out = entry.queries()["knn_vote_calibration"](spark, sf_correct).toPandas()
    assert out.n.sum() == 100
    assert set(out.votes) <= {1, 2, 3, 4, 5}
    assert ((out.accuracy >= 0) & (out.accuracy <= 1)).all()
    # gap == accuracy - confidence (to rounding grain)
    assert ((out.gap - (out.accuracy - out.confidence)).abs() < 2e-6).all()


def test_knn_eval_summary_consistent_with_per_label(spark, sf_correct):
    """The 1-row summary must be derivable from the per-label table."""
    import __spark_entry__ as entry

    per = entry.queries()["knn_label_eval"](spark, sf_correct).toPandas()
    s = entry.queries()["knn_eval_summary"](spark, sf_correct).toPandas().iloc[0]
    truth_side = per[per.n_true > 0]
    assert s.n_labels == len(truth_side)
    assert abs(s.micro_f1 - truth_side.tp.sum() / 100.0) < 2e-6
    # macro recall from the per-label table (unrounded source, 1e-6 grain)
    assert abs(s.macro_recall - (truth_side.tp / truth_side.n_true).mean()) < 2e-6


def test_gini_bounds_and_known_cases(spark):
    """Both Gini limits on synthetic spend: perfectly equal values give
    exactly 0; a single holder of everything approaches (n-1)/n."""
    from pyspark.sql import functions as F
    from confluent_kafka_vector_search_prompt_inference_spark.operators.sampling import scalable_cumsum

    def gini(rows):
        df = spark.createDataFrame(rows, "o_custkey bigint, v bigint").select(
            "v", "o_custkey", F.lit(1).alias("__one")
        )
        r = scalable_cumsum(df, ["v", "o_custkey"], "__one", out_col="__i")
        out = r.agg(
            (
                F.lit(2.0) * F.sum(F.col("__i") * F.col("v")).cast("double")
                / (F.count("*").cast("double") * F.sum("v").cast("double"))
                - (F.count("*") + F.lit(1)).cast("double") / F.count("*").cast("double")
            ).alias("g")
        ).first()
        return out.g

    # perfectly equal: G == 0 exactly
    assert abs(gini([(i, 100) for i in range(10)])) < 1e-12
    # one customer holds everything: G -> (n-1)/n = 0.9
    g = gini([(i, 1) for i in range(9)] + [(9, 10_000_000)])
    assert 0.88 < g < 0.9


def test_cumsum_tuple_rank_survives_huge_custkeys(spark):
    """The multi-column cumsum ranks by the TRUE tuple (v, custkey), so
    custkeys >= 1e7 — where the retired arithmetic composite key
    ``v*1e7 + custkey`` collides across different spend values — still
    produce the exact brute-force rank order. Regression test for the
    wrong-at-sf66 defect flagged in the round-4 verdict."""
    import random

    from pyspark.sql import functions as F
    from confluent_kafka_vector_search_prompt_inference_spark.operators.sampling import scalable_cumsum

    random.seed(41)
    # custkeys straddling 1e7; duplicate v values force tiebreak by key
    keys = random.sample(range(5_000_000, 60_000_000), 400)
    rows = [(k, random.randint(1, 5)) for k in keys]
    # brute-force oracle: sort by (v, custkey), rank = position
    want = {
        k: i + 1
        for i, (v, k) in enumerate(sorted((v, k) for k, v in rows))
    }
    # prove the old composite key WOULD have misordered this input
    old = sorted((v * 10_000_000 + k, k) for k, v in rows)
    assert [k for _, k in old] != [
        k for k, _ in sorted(want.items(), key=lambda kv: kv[1])
    ], "fixture must expose the composite-key collision"
    df = spark.createDataFrame(rows, "o_custkey bigint, v bigint").select(
        "v", "o_custkey", F.lit(1).alias("__one")
    )
    for parts in (1, 7, 32):
        got = {
            r["o_custkey"]: r["__i"]
            for r in scalable_cumsum(
                df, ["v", "o_custkey"], "__one", out_col="__i", n_parts=parts
            ).collect()
        }
        assert got == want, parts


def test_lorenz_deciles_invariants(spark, sf_correct):
    import __spark_entry__ as entry

    out = entry.queries()["customer_spend_lorenz"](spark, sf_correct).toPandas()
    assert list(out.decile) == list(range(1, 11))
    # equal-count bins (within 1 for the remainder)
    assert out.n_customers.max() - out.n_customers.min() <= 1
    # cumulative share is monotone, convex-ish (ascending order), ends at 1
    assert (out.cum_share.diff().dropna() > 0).all()
    assert abs(out.cum_share.iloc[-1] - 1.0) < 2e-6
    # ascending rank => later deciles hold more spend
    assert (out.decile_cents.diff().dropna() >= 0).all()
