"""BM25 retrieval + reciprocal-rank fusion: self-retrieval, idf ordering,
exact-duplicate tie behavior, and fusion arithmetic."""

import math

import pytest
from pyspark.sql import functions as F

from confluent_kafka_vector_search_prompt_inference_spark.operators.bm25 import (
    bm25_impacts,
    bm25_postings,
    bm25_search,
    rrf_fuse,
)


@pytest.fixture(scope="module")
def toy_docs(spark):
    rows = [
        (1, "spark shuffles data across the cluster"),
        (2, "broadcast joins avoid the shuffle entirely"),
        (3, "vector search ranks documents by similarity"),
        (4, "vector search ranks documents by similarity"),  # exact dup of 3
        (5, "the the the the the"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_postings_tf_and_dl(toy_docs):
    post = bm25_postings(toy_docs, "doc_id", "text").toPandas()
    row = post[(post.doc_id == 5) & (post.term == "the")].iloc[0]
    assert row.tf == 5 and row.dl == 5
    assert post[post.doc_id == 1].dl.unique().tolist() == [6]


def test_rare_term_outscores_common(toy_docs):
    imp = bm25_impacts(bm25_postings(toy_docs, "doc_id", "text")).toPandas()
    # "broadcast" appears in 1 doc, "the" in 4 → higher idf, higher impact.
    rare = imp[imp.term == "broadcast"].impact_n.max()
    common = imp[(imp.term == "the") & (imp.doc_id == 2)].impact_n.max()
    assert rare > common


def test_self_retrieval_ranks_first(toy_docs):
    queries = toy_docs.filter(F.col("doc_id") == 2).select(
        F.col("doc_id").alias("query_id"), F.col("text").alias("query_text")
    )
    top = bm25_search(toy_docs, queries, k=3).toPandas().sort_values("rank")
    assert top.iloc[0].doc_id == 2 and top.iloc[0]["rank"] == 1


def test_exact_duplicates_tie_break_on_id(toy_docs):
    queries = toy_docs.filter(F.col("doc_id") == 3).select(
        F.col("doc_id").alias("query_id"), F.col("text").alias("query_text")
    )
    top = bm25_search(toy_docs, queries, k=2).toPandas().sort_values("rank")
    # docs 3 and 4 are identical → identical integer scores, id ascending.
    assert top.doc_id.tolist() == [3, 4]
    assert top.score.iloc[0] == top.score.iloc[1]


def test_rrf_fuse_arithmetic(spark):
    a = spark.createDataFrame([(0, 10, 1), (0, 11, 2)], ["query_id", "doc_id", "rank"])
    b = spark.createDataFrame([(0, 11, 1), (0, 12, 2)], ["query_id", "doc_id", "rank"])
    out = {r.doc_id: r for r in rrf_fuse(a, b, k=10).collect()}
    # doc 11 in both lists → sum of reciprocals, ranks preserved per leg.
    assert out[11].rank == 1
    assert out[11].rrf_score == pytest.approx(1 / 61 + 1 / 62, abs=1e-6)
    assert out[11].rank_keyword == 2 and out[11].rank_vector == 1
    # single-leg docs get 0 for the missing leg, never NULL.
    assert out[10].rank_vector == 0 and out[12].rank_keyword == 0
    assert out[10].rrf_score == pytest.approx(1 / 61, abs=1e-6)


def test_bm25_matches_reference_formula(toy_docs):
    """One hand-computed cell: doc 2, term 'broadcast' (tf=1, df=1, N=5)."""
    post = bm25_postings(toy_docs, "doc_id", "text")
    imp = bm25_impacts(post).toPandas()
    dls = post.groupBy("doc_id").agg(F.first("dl").alias("dl")).toPandas()
    avgdl = dls.dl.sum() / len(dls)
    idf = math.log(1.0 + (5 - 1 + 0.5) / (1 + 0.5))
    expected = idf * (1 * 2.2) / (1 + 1.2 * (0.25 + 0.75 * 6 / avgdl))
    got = imp[(imp.doc_id == 2) & (imp.term == "broadcast")].impact_n.iloc[0]
    assert got == round(expected * 1e9)


def test_empty_corpus_returns_no_rows(spark):
    docs = spark.createDataFrame([], "doc_id long, text string")
    queries = spark.createDataFrame([(0, "anything")], ["query_id", "query_text"])
    assert bm25_search(docs, queries, k=5).count() == 0


def test_query_with_no_matching_terms(toy_docs):
    queries = toy_docs.sparkSession.createDataFrame(
        [(9, "zzz qqq unseen tokens")], ["query_id", "query_text"]
    )
    assert bm25_search(toy_docs, queries, k=5).count() == 0


def test_saved_index_search_matches_live(spark, sf_smoke):
    """save_bm25_index → bm25_search_indexed reproduces bm25_search exactly
    (same integer totals ⇒ same ranking), skips the index build at query
    time, and the bucketed term scan actually prunes buckets."""
    from confluent_kafka_vector_search_prompt_inference_spark.operators.bm25 import (
        bm25_search_indexed,
        save_bm25_index,
    )
    from confluent_kafka_vector_search_prompt_inference_spark.plans import formatted_plan

    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet").select("doc_id", "text")
    queries = docs.filter(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("query_id"), F.col("text").alias("query_text")
    )
    live = bm25_search(docs, queries, k=10).toPandas()
    save_bm25_index(docs, "bm25_idx_test", n_buckets=8)
    try:
        indexed_df = bm25_search_indexed(spark, "bm25_idx_test", queries, k=10)
        # bucket pruning must reach the scan (SelectedBucketsCount in plan)
        assert "SelectedBucketsCount" in formatted_plan(indexed_df)
        indexed = indexed_df.toPandas()
    finally:
        spark.sql("DROP TABLE IF EXISTS bm25_idx_test")
        spark.sql("DROP TABLE IF EXISTS bm25_idx_test_stats")
    key = ["query_id", "doc_id", "score", "rank"]
    a = live[key].sort_values(key).reset_index(drop=True)
    b = indexed[key].sort_values(key).reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)


def test_indexed_search_term_cap_falls_back_to_semi_join(spark, sf_smoke):
    """Over max_inlined_terms the indexed search must not inline a huge
    IN-literal (driver/plan guard on the streaming hot path): it degrades
    to a broadcast semi join with identical results."""
    from confluent_kafka_vector_search_prompt_inference_spark.operators.bm25 import (
        bm25_search_indexed,
        save_bm25_index,
    )

    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet").select("doc_id", "text")
    queries = docs.filter(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("query_id"), F.col("text").alias("query_text")
    )
    save_bm25_index(docs, "bm25_idx_cap_test", n_buckets=8)
    try:
        inlined = bm25_search_indexed(spark, "bm25_idx_cap_test", queries, k=10).toPandas()
        joined = bm25_search_indexed(
            spark, "bm25_idx_cap_test", queries, k=10, max_inlined_terms=1
        ).toPandas()
    finally:
        spark.sql("DROP TABLE IF EXISTS bm25_idx_cap_test")
        spark.sql("DROP TABLE IF EXISTS bm25_idx_cap_test_stats")
    key = ["query_id", "doc_id", "score", "rank"]
    import pandas as pd

    pd.testing.assert_frame_equal(
        inlined[key].sort_values(key).reset_index(drop=True),
        joined[key].sort_values(key).reset_index(drop=True),
    )


def test_raw_index_append_is_exact(spark, sf_smoke):
    """The raw-postings index scores exactly like bm25_search over the
    union corpus AFTER an append — the property the impact-baked index
    cannot have (its stored numbers freeze N/avgdl/df at build time)."""
    from confluent_kafka_vector_search_prompt_inference_spark.operators.bm25 import (
        bm25_raw_append,
        bm25_search,
        bm25_search_raw,
        save_bm25_raw_index,
    )

    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet").select("doc_id", "text")
    first = docs.filter(F.col("doc_id") % 2 == 0)
    second = docs.filter(F.col("doc_id") % 2 == 1)
    queries = docs.filter(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("query_id"), F.col("text").alias("query_text")
    )
    save_bm25_raw_index(first, "bm25_raw_test", n_buckets=8)
    try:
        bm25_raw_append(second, "bm25_raw_test")
        got = bm25_search_raw(spark, "bm25_raw_test", queries, k=10).toPandas()
    finally:
        spark.sql("DROP TABLE IF EXISTS bm25_raw_test")
        spark.sql("DROP TABLE IF EXISTS bm25_raw_test_stats")
    want = bm25_search(
        docs, queries, id_col="doc_id", text_col="text",
        query_id="query_id", query_text="query_text", k=10,
    ).toPandas()
    key = ["query_id", "doc_id", "score", "rank"]
    import pandas as pd

    pd.testing.assert_frame_equal(
        got[key].sort_values(key).reset_index(drop=True),
        want[key].sort_values(key).reset_index(drop=True),
    )


# --- conjunctive + phrase search ---------------------------------------


def _mini_docs(spark):
    rows = [
        (1, "the quick brown fox jumps"),
        (2, "the quick brown dog"),
        (3, "quick brown the fox"),        # all terms, different order
        (4, "the brown dog sleeps"),       # missing 'quick'
        (5, "quick the quick brown fox the quick brown"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_conjunctive_requires_all_terms(spark):
    from confluent_kafka_vector_search_prompt_inference_spark.operators.bm25 import conjunctive_search

    docs = _mini_docs(spark)
    q = spark.createDataFrame(
        [(100, "the quick brown")], "query_id bigint, query_text string"
    )
    got = conjunctive_search(docs, q, k=10).toPandas()
    # docs 1, 2, 3, 5 contain all three terms; 4 lacks 'quick'
    assert set(got.doc_id) == {1, 2, 3, 5}
    assert (got.query_id == 100).all()


def test_conjunctive_subset_of_disjunctive(spark, docs):
    from confluent_kafka_vector_search_prompt_inference_spark.operators.bm25 import bm25_search, conjunctive_search
    from pyspark.sql import functions as F

    d = docs.select("doc_id", "text")
    q = d.filter(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("query_id"), F.col("text").alias("query_text")
    )
    conj = conjunctive_search(d, q, k=1000).toPandas()
    disj = bm25_search(d, q, k=100000).toPandas()
    conj_pairs = set(zip(conj.query_id, conj.doc_id))
    disj_pairs = set(zip(disj.query_id, disj.doc_id))
    assert conj_pairs <= disj_pairs
    # scores agree where both match (same impacts, just filtered)
    merged = conj.merge(disj, on=["query_id", "doc_id"], suffixes=("_c", "_d"))
    assert (merged.score_c == merged.score_d).all()
    # self-match: a doc always contains all of its own terms
    assert all((int(i), int(i)) in conj_pairs for i in (0, 1, 2))


def test_phrase_consecutive_only(spark):
    from confluent_kafka_vector_search_prompt_inference_spark.operators.bm25 import phrase_search

    docs = _mini_docs(spark)
    q = spark.createDataFrame(
        [(100, "quick brown fox")], "query_id bigint, query_text string"
    )
    got = phrase_search(docs, q, k=10).toPandas()
    # doc 1 has it once; doc 3 has 'quick brown the fox' (NOT consecutive);
    # doc 5 has exactly one consecutive occurrence ('... the quick brown fox ...'?
    # no — 'quick the quick brown fox the quick brown': positions of
    # 'quick brown fox' = tokens 2,3,4 → one match)
    assert dict(zip(got.doc_id, got.n_matches)) == {1: 1, 5: 1}


def test_phrase_repeated_term_and_counts(spark):
    from confluent_kafka_vector_search_prompt_inference_spark.operators.bm25 import phrase_search

    docs = spark.createDataFrame(
        [
            (1, "a b a b a"),   # 'a b a' at anchors 0 and 2 -> 2 matches
            (2, "a b b a"),
            (3, "b a b a b"),   # 'a b a' at anchor 1 -> 1 match
        ],
        "doc_id bigint, text string",
    )
    q = spark.createDataFrame([(9, "a b a")], "query_id bigint, query_text string")
    got = phrase_search(docs, q, k=10).toPandas()
    assert dict(zip(got.doc_id, got.n_matches)) == {1: 2, 3: 1}
    assert list(got.sort_values("rank").doc_id) == [1, 3]


def test_tfidf_cosine_self_match_top(spark, docs):
    from confluent_kafka_vector_search_prompt_inference_spark.operators.bm25 import tfidf_cosine_search
    from pyspark.sql import functions as F

    d = docs.select("doc_id", "text")
    q = d.filter(F.col("doc_id") < 5).select(
        F.col("doc_id").alias("query_id"), F.col("text").alias("query_text")
    )
    got = tfidf_cosine_search(d, q, k=3).toPandas()
    top1 = got[got["rank"] == 1]
    # a document is its own cosine-1.0 nearest neighbor
    assert (top1.query_id == top1.doc_id).all()
    assert (top1.score == 1.0).all()
    assert (got.score <= 1.0 + 1e-9).all() and (got.score >= -1.0 - 1e-9).all()


def test_prf_expands_and_stays_deterministic(spark):
    from confluent_kafka_vector_search_prompt_inference_spark.operators.bm25 import bm25_prf_search, bm25_search

    # 'photovoltaic' appears in BOTH feedback docs (impacts sum across
    # them), so it outranks each doc's singleton terms in the expansion
    rows = [
        (1, "solar panels photovoltaic power"),
        (2, "solar panels photovoltaic energy"),
        (3, "photovoltaic installation"),
        (4, "wind power energy"),
        (5, "history of railways"),
        (6, "cooking recipes today"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    q = spark.createDataFrame(
        [(9, "solar panels")], "query_id bigint, query_text string"
    )
    base = bm25_search(docs, q, k=6).toPandas()
    prf = bm25_prf_search(docs, q, k=6, fb_docs=2, fb_terms=1).toPandas()
    # expansion mines 'photovoltaic' from docs 1-2, so doc 3 (no
    # original term) becomes reachable
    assert 3 not in set(base.doc_id)
    assert 3 in set(prf.doc_id)
    # determinism across invocations
    prf2 = bm25_prf_search(docs, q, k=6, fb_docs=2, fb_terms=1).toPandas()
    assert prf.sort_values(["query_id", "rank"]).values.tolist() == \
        prf2.sort_values(["query_id", "rank"]).values.tolist()


def test_prf_no_expansion_equals_base(spark, docs):
    from pyspark.sql import functions as F
    from confluent_kafka_vector_search_prompt_inference_spark.operators.bm25 import bm25_prf_search, bm25_search

    d = docs.select("doc_id", "text")
    q = d.filter(F.col("doc_id") < 2).select(
        F.col("doc_id").alias("query_id"), F.col("text").alias("query_text")
    )
    base = bm25_search(d, q, k=5).toPandas()
    prf = bm25_prf_search(d, q, k=5, fb_docs=3, fb_terms=0).toPandas()
    key = ["query_id", "doc_id", "score", "rank"]
    import pandas as pd

    pd.testing.assert_frame_equal(
        base[key].sort_values(key).reset_index(drop=True),
        prf[key].sort_values(key).reset_index(drop=True),
    )


def test_proximity_min_span_semantics(spark):
    from confluent_kafka_vector_search_prompt_inference_spark.operators.bm25 import proximity_search

    docs = spark.createDataFrame(
        [
            (1, "alpha x y z beta"),          # span 4
            (2, "alpha beta somewhere"),       # span 1
            (3, "beta then later alpha"),      # span 3 (order-insensitive)
            (4, "alpha only here"),            # missing beta
            (5, "x alpha y beta alpha"),       # spans |1-3|=2, |4-3|=1 -> 1
        ],
        "doc_id bigint, text string",
    )
    q = spark.createDataFrame(
        [(9, "alpha", "beta")], "query_id bigint, term1 string, term2 string"
    )
    got = proximity_search(docs, q, k=10).toPandas()
    assert dict(zip(got.doc_id, got.min_span)) == {1: 4, 2: 1, 3: 3, 5: 1}
    # rank: span asc, doc asc -> 2, 5, 3, 1
    assert list(got.sort_values("rank").doc_id) == [2, 5, 3, 1]
    # max_span filter
    tight = proximity_search(docs, q, k=10, max_span=2).toPandas()
    assert set(tight.doc_id) == {2, 5}
    # same-term queries are excluded
    qq = spark.createDataFrame(
        [(8, "alpha", "alpha")], "query_id bigint, term1 string, term2 string"
    )
    assert proximity_search(docs, qq, k=10).count() == 0


def test_positional_index_phrase_and_proximity_match_live(spark, sf_smoke):
    from confluent_kafka_vector_search_prompt_inference_spark.operators.bm25 import (
        phrase_search,
        phrase_search_indexed,
        positional_append,
        proximity_search,
        proximity_search_indexed,
        save_positional_index,
    )
    from confluent_kafka_vector_search_prompt_inference_spark.plans import formatted_plan

    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet").select("doc_id", "text")
    first = docs.filter(F.col("doc_id") % 2 == 0)
    second = docs.filter(F.col("doc_id") % 2 == 1)
    pq = docs.filter(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("query_id"),
        F.array_join(F.slice(F.split(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), " "), 1, 3), " ").alias("query_text"),
    )
    nq = docs.filter(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("query_id"),
        F.element_at(F.split(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), " "), 1).alias("term1"),
        F.element_at(F.split(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), " "), 4).alias("term2"),
    )
    save_positional_index(first, "pos_idx_test", n_buckets=8)
    try:
        positional_append(second, "pos_idx_test")
        ph_idx_df = phrase_search_indexed(spark, "pos_idx_test", pq, k=10)
        assert "SelectedBucketsCount" in formatted_plan(ph_idx_df)
        ph_idx = ph_idx_df.toPandas()
        nr_idx = proximity_search_indexed(
            spark, "pos_idx_test", nq, k=10, max_span=20
        ).toPandas()
    finally:
        spark.sql("DROP TABLE IF EXISTS pos_idx_test")
    ph_live = phrase_search(docs, pq, k=10).toPandas()
    nr_live = proximity_search(docs, nq, k=10, max_span=20).toPandas()
    import pandas as pd

    for got, want, key in [
        (ph_idx, ph_live, ["query_id", "doc_id", "n_matches", "rank"]),
        (nr_idx, nr_live, ["query_id", "doc_id", "min_span", "rank"]),
    ]:
        pd.testing.assert_frame_equal(
            got[key].sort_values(key).reset_index(drop=True),
            want[key].sort_values(key).reset_index(drop=True),
        )
