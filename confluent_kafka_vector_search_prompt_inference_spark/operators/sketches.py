"""Mergeable frequency sketches as plain DataFrames.

Not in the reference (SURVEY.md §2.11 — extension surface). A 100 TB
corpus-monitoring pipeline needs approximate term/entity frequencies with
bounded memory: exact per-term counts over a web-scale vocabulary are
themselves corpus-sized, while a count-min sketch (Cormode & Muthukrishnan,
J. Algorithms 2005) is ``depth × width`` counters regardless of corpus
size, mergeable across partitions, batches, and days by plain addition.

Design choices (all so the sketch is *deterministic and engine-portable*,
matching this repo's oracle discipline):

- The sketch IS a DataFrame ``(d, bucket, cnt)`` — not an opaque binary
  blob like Spark's built-in ``count_min_sketch`` aggregate. That keeps
  it queryable/joinable with SQL, trivially mergeable (union + sum), and
  exactly reproducible in DuckDB.
- Row ``d``'s hash is the repo-standard md5 bucket
  (:func:`~confluent_kafka_vector_search_prompt_inference_spark.operators.sampling.hash_bucket`) of ``"{d}#" + term`` —
  independent hash functions per row via the seed prefix, identical in
  any engine with md5.
- Build is one ``groupBy(d, bucket).sum`` — map-side partial aggregation
  bounds the shuffle at ``depth × width`` rows *per partition*, so the
  build cost at 100 TB is the token scan, not the shuffle.

Standard guarantees: point estimate ``est(t) >= true(t)`` always
(collisions only ever add), and ``est(t) <= true(t) + εN`` with
probability ``1 - δ`` for ``width = ⌈e/ε⌉``, ``depth = ⌈ln 1/δ⌉``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from confluent_kafka_vector_search_prompt_inference_spark.operators.sampling import hash_bucket


def _cm_bucket(term: Column, d: int, width: int) -> Column:
    """Bucket of ``term`` in sketch row ``d`` (md5 of the seed-prefixed
    term — the DuckDB twin is
    ``('0x' || substring(md5(CAST(d AS VARCHAR) || '#' || t), 1, 8))::UBIGINT % width``)."""
    return hash_bucket(F.concat(F.lit(f"{d}#"), term.cast("string")), width)


def countmin_build(
    items: DataFrame,
    term_col: str,
    *,
    depth: int = 4,
    width: int = 2048,
    weight_col: str | None = None,
) -> DataFrame:
    """Build a count-min sketch over one term per input row.

    Returns ``(d INT, bucket INT, cnt BIGINT)`` — at most ``depth×width``
    rows total. ``weight_col`` (optional BIGINT) makes it a weighted
    sketch; default weight is 1 per row.
    """
    term = F.col(term_col)
    w = F.col(weight_col).cast("bigint") if weight_col else F.lit(1).cast("bigint")
    rows = items.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        _cm_bucket(term, d, width).cast("int").alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("s"),
        w.alias("__w"),
    )
    return rows.groupBy(F.col("s.d").alias("d"), F.col("s.bucket").alias("bucket")).agg(
        F.sum("__w").alias("cnt")
    )


def countmin_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with identical ``(depth, width)``: union +
    re-sum. Associative and commutative — the streaming/daily-rollup
    merge is this one line."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("d", "bucket").agg(F.sum("cnt").alias("cnt"))


def countmin_lookup(
    sketch: DataFrame,
    queries: DataFrame,
    term_col: str,
    *,
    depth: int = 4,
    width: int = 2048,
) -> DataFrame:
    """Point-estimate each query term: ``min`` over rows of the counter at
    that row's bucket (absent counter = 0). Query terms are few by
    contract; the ``depth×width``-bounded sketch side gets the broadcast.

    Returns the ``queries`` columns plus ``est BIGINT``.
    """
    term = F.col(term_col)
    q = queries.select(
        "*",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        _cm_bucket(term, d, width).cast("int").alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("s"),
    ).select("*", F.col("s.d").alias("d"), F.col("s.bucket").alias("bucket")).drop("s")
    joined = q.join(F.broadcast(sketch), ["d", "bucket"], "left")
    keys = [c for c in queries.columns]
    return (
        joined.groupBy(*keys)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("bigint"))).alias("est"))
    )
