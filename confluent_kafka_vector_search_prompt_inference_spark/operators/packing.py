"""Sequence packing: fill fixed token budgets with documents.

Training pipelines concatenate documents into fixed-length sequences
(e.g. 512 or 8192 tokens) before batching; the packing decision must be
deterministic so a re-run (or a different engine) rebuilds byte-identical
training shards. Not in the reference (SURVEY.md §2.11 extension surface).

Spark-first shape for 100 TB: a single global greedy pack would serialize
into one ordered partition, so documents are first sharded by a portable
content hash (md5-based, engine-reproducible — see ``sampling.hash_bucket``)
and packed *within* each shard with one window pass: the running token
total before each document, integer-divided by the budget, is its sequence
number. Each shard sorts independently — the sort parallelism equals the
shard count, and no stage ever sees global order.

This is the streaming "contiguous fill" packing (documents longer than the
remaining room start the next sequence naturally because their start
offset crosses the budget boundary); it is the standard distributed
approximation of bin packing — first-fit-decreasing would need a global
greedy state that cannot scale out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from confluent_kafka_vector_search_prompt_inference_spark.operators.sampling import hash_bucket


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_col: str,
    *,
    budget: int = 512,
    shards: int = 8,
) -> DataFrame:
    """Assign every document a ``(shard, seq_id)`` packing slot.

    Deterministic in the content hash and document id alone — independent
    of partitioning, executor count, and input order. ``seq_id`` is the
    integer division of the document's start offset (the exact BIGINT
    running sum of earlier documents' tokens within its shard, ordered by
    id) by the token budget.
    """
    shard = hash_bucket(id_col, shards)
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev = F.coalesce(F.sum(token_col).over(w), F.lit(0))
    return (
        df.withColumn("shard", shard)
        .withColumn("start_offset", prev.cast("bigint"))
        .withColumn("seq_id", F.expr(f"start_offset div {int(budget)}"))
    )
