"""Dedup family: LSH candidates recover exact pairs; SimHash finds planted
duplicates; exact groups find planted copies."""

import pytest
from pyspark.sql import functions as F

from confluent_kafka_vector_search_prompt_inference_spark.operators.dedup import (
    dedup_exact,
    embedding_near_duplicates,
    exact_duplicate_groups,
    minhash_lsh_candidates,
    minhash_signatures,
    ngram_jaccard_pairs,
    semantic_dedup,
    simhash_near_duplicates,
    simhash_signatures,
)


@pytest.fixture(scope="module")
def docs_with_copies(docs):
    base = docs.select("doc_id", "text")
    copies = docs.filter(F.col("doc_id") < 30).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    return base.unionByName(copies)


def test_exact_groups_find_planted_copies(docs_with_copies):
    groups = exact_duplicate_groups(docs_with_copies, "doc_id", "text").toPandas()
    assert len(groups) == 30
    assert (groups.n_docs == 2).all()
    assert sorted(groups.keep_id) == list(range(30))


def test_dedup_exact_removes_copies(docs_with_copies):
    assert dedup_exact(docs_with_copies, ["text"]).count() == 500


def test_minhash_lsh_recovers_exact_jaccard_pairs(docs):
    """MinHash-LSH candidates + exact verify == brute-force exact pairs."""
    exact = ngram_jaccard_pairs(docs, "doc_id", "text", shingle_n=3, threshold=0.5).toPandas()
    sigs = minhash_signatures(docs, "doc_id", "text", num_hashes=64, shingle_n=3)
    cands = minhash_lsh_candidates(sigs, "doc_id", bands=16, est_threshold=0.2)
    verified = ngram_jaccard_pairs(
        docs, "doc_id", "text", shingle_n=3, threshold=0.5, candidates=cands
    ).toPandas()
    exact_set = set(zip(exact.id_a, exact.id_b))
    got_set = set(zip(verified.id_a, verified.id_b))
    # LSH may miss pairs (probabilistic) but must not hallucinate
    assert got_set <= exact_set
    recall = len(got_set) / max(len(exact_set), 1)
    assert recall >= 0.9, f"minhash recall {recall}"


def test_minhash_estimate_close_to_exact(docs):
    sigs = minhash_signatures(docs, "doc_id", "text", num_hashes=64, shingle_n=3)
    cands = minhash_lsh_candidates(sigs, "doc_id", bands=16).toPandas()
    exact = ngram_jaccard_pairs(
        docs, "doc_id", "text", shingle_n=3, threshold=0.0
    ).toPandas().set_index(["id_a", "id_b"]).jaccard
    errs = [
        abs(row.est_jaccard - exact.get((row.id_a, row.id_b), 0.0))
        for row in cands.itertuples()
        if (row.id_a, row.id_b) in exact.index
    ]
    assert errs, "no overlapping pairs to compare"
    assert sum(errs) / len(errs) < 0.15


def test_simhash_identical_docs_have_zero_hamming(docs_with_copies):
    sigs = simhash_signatures(docs_with_copies, "doc_id", "text")
    pairs = simhash_near_duplicates(sigs, "doc_id", max_hamming=0).toPandas()
    planted = {(i, i + 100000) for i in range(30)}
    got = set(zip(pairs.id_a, pairs.id_b))
    assert planted <= got


def test_embedding_near_dups_exact_vs_lsh(embeddings):
    base = embeddings.select("vec_id", F.col("embedding").alias("vector"))
    copies = embeddings.filter(F.col("vec_id") < 20).select(
        (F.col("vec_id") + 100000).alias("vec_id"), F.col("embedding").alias("vector")
    )
    corpus = base.unionByName(copies)
    exact = embedding_near_duplicates(corpus, "vec_id", "vector", threshold=0.99).toPandas()
    planted = {(i, i + 100000) for i in range(20)}
    assert planted <= set(zip(exact.id_a, exact.id_b))
    lsh = embedding_near_duplicates(
        corpus, "vec_id", "vector", threshold=0.99, method="lsh"
    ).toPandas()
    # identical vectors always share every LSH bucket → full recall on planted
    assert planted <= set(zip(lsh.id_a, lsh.id_b))
    assert set(zip(lsh.id_a, lsh.id_b)) <= set(zip(exact.id_a, exact.id_b))


def test_lsh_bucket_cap_bounds_candidates_keeps_planted_pairs(docs_with_copies):
    sigs = minhash_signatures(docs_with_copies, "doc_id", "text", num_hashes=64)
    uncapped = minhash_lsh_candidates(sigs, "doc_id", bands=16)
    capped = minhash_lsh_candidates(sigs, "doc_id", bands=16, max_bucket_size=8)
    n_uncapped, n_capped = uncapped.count(), capped.count()
    assert n_capped <= n_uncapped
    # exact copies agree on every band → they collide in ALL 16 buckets;
    # the cap must not lose them (their buckets hold just the pair family)
    copies = capped.filter(
        (F.col("id_b") - F.col("id_a") == 100000) & (F.col("est_jaccard") == 1.0)
    )
    assert copies.count() == 30


def test_semantic_dedup_drops_planted_copies_keeps_originals(embeddings):
    base = embeddings.select("vec_id", F.col("embedding").alias("vector"))
    copies = embeddings.filter(F.col("vec_id") < 20).select(
        (F.col("vec_id") + 100000).alias("vec_id"), F.col("embedding").alias("vector")
    )
    corpus = base.unionByName(copies)
    survivors = semantic_dedup(
        corpus, "vec_id", "vector", threshold=0.99, n_clusters=4
    ).toPandas()
    kept = set(survivors.vec_id)
    # an exact copy lands in the same k-means cluster as its original, so
    # greedy min-id pruning must drop every planted +100000 copy
    assert all(i + 100000 not in kept for i in range(20))
    # every original survives (synthetic corpus has no natural near-pairs)
    n_base = base.count()
    assert set(range(20)) <= kept and len(kept) == n_base
    # survivors carry their cluster assignment
    assert "cluster" in survivors.columns


def test_cdc_chunks_shift_resilient(spark):
    """The CDC property fixed-size chunking lacks: inserting a prefix
    changes only the chunk(s) around the edit — most chunk hashes of the
    original document reappear in the edited copy at shifted offsets."""
    import random

    from confluent_kafka_vector_search_prompt_inference_spark.operators.dedup import cdc_chunks

    random.seed(13)
    body = "".join(random.choice("abcdefgh ") for _ in range(4000))
    edited = "INSERTED PREFIX >>> " + body
    df = spark.createDataFrame(
        [(1, body), (2, edited)], "doc_id long, text string"
    )
    out = cdc_chunks(df, "doc_id", "text").collect()
    h1 = [r.chunk_hash for r in out if r.id == 1]
    h2 = {r.chunk_hash for r in out if r.id == 2}
    shared = sum(1 for h in h1 if h in h2)
    assert shared / len(h1) >= 0.8, f"only {shared}/{len(h1)} chunks survive the edit"
    # coverage: chunks tile each document exactly
    for rid, text in ((1, body), (2, edited)):
        rows = sorted((r for r in out if r.id == rid), key=lambda r: r.start)
        assert rows[0].start == 0
        assert sum(r.length for r in rows) == len(text.encode())
        for a, b in zip(rows, rows[1:]):
            assert b.start == a.start + a.length
    # length clamps hold
    assert all(16 <= r.length <= 256 or r.start + r.length in
               (len(body.encode()), len(edited.encode())) for r in out)


def test_cdc_chunks_deterministic_across_partitionings(spark):
    from confluent_kafka_vector_search_prompt_inference_spark.operators.dedup import cdc_chunks

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    a = {tuple(r) for r in cdc_chunks(docs.repartition(1), "doc_id", "text").collect()}
    b = {tuple(r) for r in cdc_chunks(docs.repartition(13), "doc_id", "text").collect()}
    assert a == b


def test_mutual_knn_pairs_reciprocity_and_hub_suppression(spark):
    import numpy as np
    from confluent_kafka_vector_search_prompt_inference_spark.operators.dedup import mutual_knn_pairs

    rng = np.random.default_rng(7)
    # two tight clusters + one "hub" vector near the global mean: the hub
    # shows up in many top-k lists, but its own top-k is cluster members
    # that don't reciprocate at small k
    a = rng.normal(0, 0.05, (6, 8)) + np.array([1.0] * 8)
    b = rng.normal(0, 0.05, (6, 8)) + np.array([-1.0] * 8)
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(np.vstack([a, b]))]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    out = mutual_knn_pairs(
        df, "vec_id", "embedding", k=3, metric="cosine", strategy="shuffle"
    ).toPandas()
    assert (out.id_a < out.id_b).all()
    # reciprocity: every pair is in both directions' top-3
    assert (out.rank_ab <= 3).all() and (out.rank_ba <= 3).all()
    # pairs stay within a cluster (cross-cluster cosine is ~-1)
    assert not ((out.id_a < 6) & (out.id_b >= 6)).any()


def test_mutual_knn_subset_of_one_directional(spark, embeddings):
    from pyspark.sql import functions as F
    from confluent_kafka_vector_search_prompt_inference_spark.operators.dedup import mutual_knn_pairs
    from confluent_kafka_vector_search_prompt_inference_spark.operators.topk_join import topk_similarity_join

    emb = embeddings.limit(100)
    mutual = mutual_knn_pairs(
        emb, "vec_id", "embedding", k=5, metric="cosine", strategy="shuffle"
    ).toPandas()
    corpus = emb.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("vector"))
    queries = emb.select(F.col("vec_id").alias("qid"), F.col("embedding").alias("vector"))
    oneway = (
        topk_similarity_join(
            queries, corpus, k=6,
            query_id="qid", query_vec="vector",
            corpus_id="cid", corpus_vec="vector",
            metric="cosine", strategy="shuffle",
        )
        .filter(F.col("qid") != F.col("cid"))
        .toPandas()
    )
    ow = set(zip(oneway.qid, oneway.cid))
    for r in mutual.itertuples():
        assert (r.id_a, r.id_b) in ow and (r.id_b, r.id_a) in ow


# ---------------------------------------------------------------------------
# repeated-span removal (substring-level dedup)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def span_corpus(spark):
    boiler = "subscribe to our newsletter for updates"  # 6 words > n=5
    rows = [
        (1, f"alpha beta gamma delta epsilon zeta {boiler} eta theta"),
        (2, f"one two three four five six {boiler} seven eight nine"),
        (3, "unique words that appear nowhere else in this corpus at all"),
        (4, "short doc"),  # < 5 words: no grams, untouched
        (5, "loop loop loop loop loop loop loop loop loop loop"),  # within-doc repeat
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_span_removal_cuts_shared_boilerplate_keeps_unique(span_corpus):
    from confluent_kafka_vector_search_prompt_inference_spark.operators.dedup import repeated_span_removal

    out = {
        r["doc_id"]: r
        for r in repeated_span_removal(span_corpus, "doc_id", "text").collect()
    }
    assert len(out) == 5  # every input doc keeps a row
    # the shared 6-word boilerplate vanishes from BOTH docs; their unique
    # prefixes/suffixes survive in original order
    assert out[1]["cleaned_text"] == "alpha beta gamma delta epsilon zeta eta theta"
    assert out[2]["cleaned_text"] == "one two three four five six seven eight nine"
    assert out[1]["n_removed"] == 6 and out[2]["n_removed"] == 6
    # unique doc untouched
    assert out[3]["n_removed"] == 0
    assert out[3]["cleaned_text"] == "unique words that appear nowhere else in this corpus at all"
    # sub-n doc has no grams — passes through
    assert out[4]["n_removed"] == 0 and out[4]["cleaned_text"] == "short doc"
    # within-doc repetition counts toward min_count (suffix-array view):
    # every position of the all-"loop" doc is covered
    assert out[5]["n_kept"] == 0 and out[5]["cleaned_text"] == ""
    assert out[5]["removed_frac"] == 1.0


def test_span_removal_partition_invariant(span_corpus):
    from confluent_kafka_vector_search_prompt_inference_spark.operators.dedup import repeated_span_removal

    a = sorted(
        (r["doc_id"], r["cleaned_text"], r["n_removed"])
        for r in repeated_span_removal(span_corpus, "doc_id", "text").collect()
    )
    b = sorted(
        (r["doc_id"], r["cleaned_text"], r["n_removed"])
        for r in repeated_span_removal(
            span_corpus.repartition(7), "doc_id", "text"
        ).collect()
    )
    assert a == b


def test_span_removal_min_count_threshold(spark):
    from confluent_kafka_vector_search_prompt_inference_spark.operators.dedup import repeated_span_removal

    phrase = "the quick brown fox jumps"
    df = spark.createDataFrame(
        [(1, f"{phrase} over something"), (2, f"{phrase} across nothing")],
        ["doc_id", "text"],
    )
    # at min_count=3 the twice-occurring phrase survives
    out = {
        r["doc_id"]: r["n_removed"]
        for r in repeated_span_removal(df, "doc_id", "text", min_count=3).collect()
    }
    assert out == {1: 0, 2: 0}


def test_span_tokenized_partition_spread_scales_and_overrides(spark):
    from confluent_kafka_vector_search_prompt_inference_spark.operators.dedup import span_tokenized

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta") for i in range(10)],
        "doc_id long, text string",
    )
    floor_n = max(32, int(spark.conf.get("spark.sql.shuffle.partitions")))
    assert span_tokenized(docs, "doc_id", "text").rdd.getNumPartitions() == floor_n
    assert (
        span_tokenized(docs, "doc_id", "text", num_partitions=7)
        .rdd.getNumPartitions()
        == 7
    )
