"""Fuzzy string joins (entity resolution): rarest-token blocking +
edit-distance verification.

The naive fuzzy join is all-pairs × levenshtein — quadratic in records.
The standard ER fix (token blocking, e.g. Papadakis et al., "Blocking
and Filtering Techniques for Entity Resolution", ACM CSUR 2020) only
compares records that share a block key. Blocking on EVERY token floods
common-token blocks ("the", "small"); blocking each record on its
RAREST tokens keeps blocks near-constant-size: a token shared by B
records yields B² candidate pairs, and rare tokens have tiny B by
construction.

Recall contract: a pair is found iff the two strings share one of their
``keys_per_record`` rarest tokens. Edits inside a rare token itself can
break the block (the classic blocking trade-off) — raise
``keys_per_record`` to trade candidates for recall; the verification
stage (JVM ``levenshtein``, whole-stage codegen) is exact on whatever
the blocks surface.

Spark shape, sized for 100 TB: token document frequencies are one
groupBy (vocabulary-sized, broadcast back); key selection is a per-record
rank window (id-partitioned — never global); the candidate join shuffles
(token, id) pairs only; names re-attach by id before the bounded
verification. No stage is all-pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from confluent_kafka_vector_search_prompt_inference_spark.functions.text import word_tokens


def _block_keys(
    records: DataFrame, id_col: str, text_col: str, dfreq: DataFrame, keys_per_record: int
) -> DataFrame:
    toks = records.select(
        F.col(id_col).alias("__id"),
        F.explode(F.array_distinct(word_tokens(text_col))).alias("token"),
    )
    w = Window.partitionBy("__id").orderBy(F.col("__df").asc(), F.col("token").asc())
    return (
        toks.join(F.broadcast(dfreq), "token")
        .withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= keys_per_record)
        .select("__id", "token")
    )


def blocked_levenshtein_self_join(
    records: DataFrame,
    *,
    id_col: str,
    text_col: str,
    max_dist: int = 2,
    keys_per_record: int = 2,
) -> DataFrame:
    """Near-duplicate record pairs within one table: ``(id_a, id_b,
    name_a, name_b, dist)`` with ``id_a < id_b`` and ``levenshtein ≤
    max_dist``, candidates restricted to pairs sharing one of each
    record's ``keys_per_record`` rarest tokens (ties on token text —
    fully deterministic)."""
    dfreq = (
        records.select(
            F.col(id_col).alias("__id"),
            F.explode(F.array_distinct(word_tokens(text_col))).alias("token"),
        )
        .groupBy("token")
        .agg(F.count("*").alias("__df"))
    )
    keys = _block_keys(records, id_col, text_col, dfreq, keys_per_record)
    cand = (
        keys.select(F.col("__id").alias("id_a"), "token")
        .join(keys.select(F.col("__id").alias("id_b"), "token"), "token")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    names = records.select(F.col(id_col).alias("__nid"), F.col(text_col).alias("__name"))
    return (
        cand.join(names.withColumnRenamed("__nid", "id_a").withColumnRenamed("__name", "name_a"), "id_a")
        .join(names.withColumnRenamed("__nid", "id_b").withColumnRenamed("__name", "name_b"), "id_b")
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("dist") <= max_dist)
        .select("id_a", "id_b", "name_a", "name_b", "dist")
    )


def sorted_neighborhood_self_join(
    records: DataFrame,
    *,
    id_col: str,
    text_col: str,
    window: int = 3,
    max_dist: int = 2,
) -> DataFrame:
    """Sorted-neighborhood ER (Hernández & Stolfo's merge/purge): rank
    the DISTINCT normalized keys globally, compare records whose keys sit
    within ``window`` rank positions, verify with ``levenshtein ≤
    max_dist`` — ``(id_a, id_b, name_a, name_b, dist)``, ``id_a < id_b``.

    The complementary blocking to rarest-token (:func:`blocked_levenshtein_self_join`):
    token blocking needs a SHARED token; the sorted neighborhood catches
    prefix-similar strings that share none. Candidates are |keys| ·
    window pairs — linear, never all-pairs.

    No global window anywhere: the global key rank comes from
    ``scalable_cumsum`` (range-partitioned two-phase running count), and
    the rank-band join is an EQUI join — each key explodes to its
    ``window`` forward target ranks (a ``sequence`` literal, w rows per
    key) instead of a non-equi range join. Same-key record groups
    (identical normalization) pair within rank distance zero.
    """
    from confluent_kafka_vector_search_prompt_inference_spark.functions.text import normalized_text
    from confluent_kafka_vector_search_prompt_inference_spark.operators.sampling import scalable_cumsum

    recs = records.select(
        F.col(id_col).alias("__id"),
        F.col(text_col).alias("__name"),
        normalized_text(text_col).alias("__key"),
    )
    keys = recs.select("__key").distinct().withColumn("__one", F.lit(1))
    ranked = scalable_cumsum(keys, "__key", "__one", out_col="__rank").select(
        "__key", "__rank"
    )
    # forward band: key at rank r targets ranks r..r+window (r itself
    # pairs same-key record groups); equi join on the target rank
    targets = ranked.select(
        F.col("__key").alias("key_a"),
        F.col("__rank").alias("rank_a"),
        F.explode(
            F.sequence(F.col("__rank"), F.col("__rank") + F.lit(window))
        ).alias("__rank"),
    )
    key_pairs = targets.join(ranked, "__rank").select(
        "key_a", F.col("__key").alias("key_b")
    )
    ra = recs.select(
        F.col("__id").alias("id_a"), F.col("__name").alias("name_a"),
        F.col("__key").alias("key_a"),
    )
    rb = recs.select(
        F.col("__id").alias("id_b"), F.col("__name").alias("name_b"),
        F.col("__key").alias("key_b"),
    )
    # each unordered KEY pair appears once (forward band), so the RECORD
    # pair must be id-normalized with least/greatest — an id_a < id_b
    # filter would drop cross-key pairs whose ids order against the keys
    a_first = F.col("id_a") < F.col("id_b")
    return (
        key_pairs.join(ra, "key_a")
        .join(rb, "key_b")
        .filter(F.col("id_a") != F.col("id_b"))
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("dist") <= max_dist)
        .select(
            F.least("id_a", "id_b").alias("id_a_n"),
            F.greatest("id_a", "id_b").alias("id_b_n"),
            F.when(a_first, F.col("name_a")).otherwise(F.col("name_b")).alias("name_a_n"),
            F.when(a_first, F.col("name_b")).otherwise(F.col("name_a")).alias("name_b_n"),
            "dist",
        )
        .toDF("id_a", "id_b", "name_a", "name_b", "dist")
        .distinct()
    )
