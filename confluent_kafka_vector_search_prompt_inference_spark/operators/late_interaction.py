"""Late-interaction (MaxSim) retrieval — ColBERT-style scoring over
token-level embeddings (Khattab & Zaharia, SIGIR 2020), §2.11 similarity
search family.

Where single-vector retrieval pools a document into one embedding before
scoring, late interaction keeps one vector PER TOKEN and scores

    score(q, d) = Σ_{t ∈ tokens(q)}  max_{u ∈ tokens(d)}  sim(v_t, v_u)

— each query token independently finds its best-matching document token,
so multi-aspect queries aren't averaged away. Not in the reference (its
only retrieval is single-vector ``FEDERATED_SEARCH``); this supplies the
quality tier between single-vector and cross-encoder reranking.

Spark-first shape, sized for a bounded query batch against a huge corpus:

- token vectors live in a VOCABULARY-sized table (token → vector): hash
  embedders derive them directly; learned models export one row per
  vocabulary entry. Zipf bounds the vocabulary, not the corpus.
- the dense (query-token × vocabulary) similarity block is computed ONCE
  per batch — |distinct query tokens| × |vocab| rows, independent of
  corpus size — and broadcast.
- per-document work is then a broadcast hash join from the corpus token
  postings (doc_id, token) onto that block + two partial aggregations
  (max per query-token, sum per document): the corpus-sized stages are
  exactly the BM25 scoring shape, shuffling ids and scores only, never
  vectors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from confluent_kafka_vector_search_prompt_inference_spark.functions.vector import vec_dot


def late_interaction_topk(
    doc_tokens: DataFrame,
    query_tokens: DataFrame,
    token_vectors: DataFrame,
    *,
    doc_id: str = "doc_id",
    query_id: str = "query_id",
    token_col: str = "token",
    vec_col: str = "vector",
    k: int = 10,
    metric: str = "dot",
) -> DataFrame:
    """Top-k MaxSim retrieval: ``(query_id, doc_id, score, rank)``.

    ``doc_tokens`` / ``query_tokens``: one row per (id, DISTINCT token).
    ``token_vectors``: the vocabulary table (token → embedding). Tokens
    absent from the vocabulary contribute nothing (inner joins). Scores
    are rounded to 6 decimals; ties break on ascending doc id.
    """
    tv = token_vectors.select(
        F.col(token_col).alias("__t"), F.col(vec_col).alias("__v")
    )
    q_vecs = (
        query_tokens.select(F.col(query_id).alias("__qid"), F.col(token_col).alias("__qt"))
        .join(tv, F.col("__qt") == F.col("__t"))
        .select("__qid", "__qt", F.col("__v").alias("__qv"))
    )
    sim = vec_dot(F.col("__qv"), F.col("__v"))
    if metric == "cosine":
        from confluent_kafka_vector_search_prompt_inference_spark.functions.vector import vec_cosine

        sim = vec_cosine(F.col("__qv"), F.col("__v"))
    # dense (query-token × vocabulary) block: corpus-size-independent
    block = (
        tv.crossJoin(F.broadcast(q_vecs))
        .select("__qid", "__qt", F.col("__t").alias("__dt"), sim.alias("__s"))
    )
    maxsim = (
        doc_tokens.select(F.col(doc_id).alias("__did"), F.col(token_col).alias("__dt"))
        .join(F.broadcast(block), "__dt")
        .groupBy("__qid", "__did", "__qt")
        .agg(F.max("__s").alias("__m"))
    )
    scored = (
        maxsim.groupBy("__qid", "__did")
        .agg(F.round(F.sum("__m"), 6).alias("score"))
    )
    w = Window.partitionBy("__qid").orderBy(F.desc("score"), F.asc("__did"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select(
            F.col("__qid").alias(query_id),
            F.col("__did").alias(doc_id),
            "score",
            "rank",
        )
    )


def chamfer_pair_scores(
    pairs: DataFrame,
    doc_tokens: DataFrame,
    token_vectors: DataFrame,
    *,
    id_a: str = "id_a",
    id_b: str = "id_b",
    doc_id: str = "doc_id",
    token_col: str = "token",
    vec_col: str = "vector",
    score_col: str = "chamfer",
) -> DataFrame:
    """Symmetric chamfer similarity for CANDIDATE document pairs:

        0.5 · ( mean_{t∈A} max_{u∈B} sim(t,u) + mean_{u∈B} max_{t∈A} sim(t,u) )

    — the multi-vector verifier for semantic near-dup candidates: where
    n-gram Jaccard verifies SURFACE overlap and single-vector cosine
    compares pooled summaries, chamfer matches every token of each doc
    to its best counterpart, so paraphrases with low lexical overlap
    still score high. MaxSim's doc-pair twin (same token-vector table).

    Scale shape: strictly pair-driven — token work is bounded by the
    candidate pairs' token products (candidates come from LSH/banding
    upstream, never all-pairs); the distinct needed (token, token) sims
    compute ONCE across all pairs and join back by token id. Means are
    DECIMAL sums of round-6 maxes over distinct tokens — deterministic
    at any parallelism, exactly reproducible in SQL.
    """
    toks = doc_tokens.select(F.col(doc_id), F.col(token_col)).distinct()
    ta = pairs.join(
        toks.withColumnRenamed(doc_id, id_a).withColumnRenamed(token_col, "__ta"),
        id_a,
    )
    tb = pairs.join(
        toks.withColumnRenamed(doc_id, id_b).withColumnRenamed(token_col, "__tb"),
        id_b,
    )
    tt = ta.join(tb, [id_a, id_b])
    needed = tt.select("__ta", "__tb").distinct()
    tv_a = token_vectors.select(
        F.col(token_col).alias("__ta"), F.col(vec_col).alias("__va")
    )
    tv_b = token_vectors.select(
        F.col(token_col).alias("__tb"), F.col(vec_col).alias("__vb")
    )
    sims = (
        needed.join(tv_a, "__ta")
        .join(tv_b, "__tb")
        .select("__ta", "__tb", F.round(vec_dot("__va", "__vb"), 6).alias("__s"))
    )
    scored = tt.join(sims, ["__ta", "__tb"])

    def side_mean(tok: str, out: str) -> DataFrame:
        mx = scored.groupBy(id_a, id_b, tok).agg(F.max("__s").alias("m"))
        return mx.groupBy(id_a, id_b).agg(
            (
                F.sum(F.col("m").cast("decimal(18,6)")).cast("double") / F.count("*")
            ).alias(out)
        )

    am = side_mean("__ta", "__am")
    bm = side_mean("__tb", "__bm")
    return am.join(bm, [id_a, id_b]).select(
        id_a,
        id_b,
        F.round((F.col("__am") + F.col("__bm")) / 2.0, 6).alias(score_col),
    )


def save_token_vectors(token_vectors: DataFrame, path: str) -> None:
    """Persist the vocabulary token-vector table — the late-interaction
    tier's 'index' (vocabulary-sized, not corpus-sized: Zipf bounds it).
    Embed the vocabulary once at ingest; every query batch afterwards
    loads metadata-cheap vectors instead of re-running the encoder."""
    token_vectors.write.mode("overwrite").parquet(path)


def load_token_vectors(spark, path: str) -> DataFrame:
    return spark.read.parquet(path)
