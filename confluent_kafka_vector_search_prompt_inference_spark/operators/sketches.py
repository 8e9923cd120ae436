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


# ---------------------------------------------------------------------------
# Quantile sketch: deterministic bottom-m hash sample
# ---------------------------------------------------------------------------
#
# The quantile companion to the count-min sketch above: threshold selection
# over a 100 TB corpus ("what length cuts the worst 5%?", "where is the
# p99 quality score?") needs distribution summaries with bounded state.
# Spark's approx_percentile is a per-job aggregate — not a MATERIALIZED,
# mergeable, engine-portable object a streaming sink can maintain. This one
# is: the sketch is the m rows with the SMALLEST seed-prefixed md5 hash of
# a unique row key (a bottom-m sketch, Cohen & Kaplan, PODC 2007). A
# bottom-m hash sample is a uniform simple random sample of the keys, so
# the sample's nearest-rank quantile estimates the population quantile with
# standard error ~ sqrt(q(1-q)/m) (±1.6% at q=0.5, m=1024); unlike a
# random reservoir it is DETERMINISTIC (exactly reproducible in DuckDB via
# the repo-standard md5 pattern — an EXACT value oracle, not a tolerance
# check) and mergeable: bottom-m(A ∪ B) = bottom-m(bottom-m(A) ∪
# bottom-m(B)), so per-epoch deltas fold by union + re-cap.


def _rank_hash(key: Column) -> Column:
    """60-bit deterministic rank of a row key: the first 15 hex digits of
    ``md5('q#' || key)`` as BIGINT. DuckDB twin:
    ``('0x' || substring(md5('q#' || CAST(k AS VARCHAR)), 1, 15))::UBIGINT``."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit("q#"), key.cast("string"))), 1, 15),
        16, 10,
    ).cast("bigint")


def quantile_sketch_build(
    items: DataFrame,
    value_col: str,
    key_col: str,
    *,
    m: int = 1024,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Build a bottom-m quantile sketch: ``(__h BIGINT, val DOUBLE)`` —
    the ``m`` rows whose ``key_col`` hashes smallest, totally ordered by
    ``(__h, val)`` so ties (60-bit collisions) resolve deterministically.

    ``key_col`` must uniquely identify an observation (doc id, event id):
    duplicate keys would enter or miss the sample together, biasing it.

    ``group_cols`` keeps one independent bottom-m sketch PER GROUP
    (per-domain thresholds — "p90 document length per source"): state is
    ``m × |groups|`` rows. The per-group bottom-m runs in TWO phases so
    a heavy-hitter group never lands whole on one window task: phase 1
    ranks within ``(group, salt)`` where the salt is ``pmod(__h, 64)``
    (deterministic — derived from the rank hash itself, so the survivor
    set is layout-independent), spreading a hot group over 64 tasks and
    emitting ≤ 64·m rows per group; phase 2 ranks within the group over
    that bounded partial. Same shape as the repo's salted skew joins.

    Ungrouped scale shape: ``orderBy(h).limit(m)`` plans a TakeOrdered —
    per-partition bottom-m map-side, ONE merge task receiving P·m rows.
    Fine at file-sized partition counts; a corpus arriving through a very
    wide upstream is first repartitioned as a narrow 16-byte (h, val)
    projection (upstream keeps its parallelism on the map side), bounding
    the merge at 64·m — the `_hash_bottom_sample` lesson from the 10M
    streaming-ladder rung."""
    rows = items.select(
        *(group_cols or []),
        _rank_hash(F.col(key_col)).alias("__h"),
        F.col(value_col).cast("double").alias("val"),
    )
    if group_cols:
        from pyspark.sql import Window

        # phase 1: bottom-m within (group, salt) — the salt spreads a
        # heavy-hitter group across 64 tasks; any row in the group's true
        # bottom-m is also in its salt-slice's bottom-m, so nothing the
        # final cap needs is lost
        w1 = Window.partitionBy(
            *group_cols, F.pmod(F.col("__h"), F.lit(64))
        ).orderBy("__h", "val")
        partial = (
            rows.withColumn("__rn", F.row_number().over(w1))
            .filter(F.col("__rn") <= m)
            .drop("__rn")
        )
        # phase 2: bottom-m within the group over the <= 64·m partial
        w2 = Window.partitionBy(*group_cols).orderBy("__h", "val")
        return (
            partial.withColumn("__rn", F.row_number().over(w2))
            .filter(F.col("__rn") <= m)
            .drop("__rn")
        )
    if rows.rdd.getNumPartitions() > 64:
        rows = rows.repartition(64)
    return rows.orderBy("__h", "val").limit(m)


def quantile_sketch_merge(
    *sketches: DataFrame,
    m: int = 1024,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Merge sketches built with the same key seed: union, drop exact
    duplicate rows (the same underlying observation arriving via two
    sketches — e.g. an epoch replay — must count once), re-cap at
    bottom-m (per group when ``group_cols`` is set). Associative and
    commutative; merging sketches of DISJOINT row sets loses nothing the
    cap wouldn't.

    Replay assumption: the dedup key is ``(group, __h, val)`` because
    the row key itself is not stored (it would ~triple sketch width) —
    a replayed observation is assumed to carry the SAME value both
    times. A late UPDATE (same key, changed value between epochs)
    therefore survives as two sample rows with the same ``__h``,
    double-representing that key. Insert-only / replay-idempotent
    streams (this engine's sink contract) satisfy the assumption by
    construction; if updates are expected, dedup upstream on
    ``(group, __h)`` keeping the latest value before merging. The
    residual risk for distinct keys is a joint 60-bit-hash AND value
    collision — ~2⁻⁶⁰ per pair, accepted."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    dedup_cols = [*(group_cols or []), "__h", "val"]
    out = out.dropDuplicates(dedup_cols)
    if group_cols:
        from pyspark.sql import Window

        w = Window.partitionBy(*group_cols).orderBy("__h", "val")
        return (
            out.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= m)
            .drop("__rn")
        )
    return out.orderBy("__h", "val").limit(m)


def sample_quantiles(
    sketch: DataFrame,
    qs: list[float],
    *,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Nearest-rank (lower) quantile estimates off a quantile sketch:
    one row per requested ``q`` (per group when ``group_cols`` is set) —
    ``(*group_cols, q DOUBLE, est DOUBLE)``, where ``est`` is the value
    at 1-based rank ``floor(q·(n−1)) + 1`` of the (group's) sample
    sorted by ``(val, __h)``. Windows are over at most ``m`` rows per
    group — bounded by construction, the one place a global window is
    safe (ungrouped sketches only)."""
    from pyspark.sql import Window

    g = list(group_cols or [])
    if g:
        w = Window.partitionBy(*g).orderBy("val", "__h")
        nw = Window.partitionBy(*g)
    else:
        w = Window.orderBy("val", "__h")
        nw = Window.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
    ranked = sketch.select(
        *g,
        "val",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(nw).alias("n"),
    )
    qdf = ranked.sparkSession.createDataFrame(
        [(float(q),) for q in qs], "q double"
    )
    return (
        ranked.crossJoin(F.broadcast(qdf))
        .filter(
            F.col("rn")
            == F.floor(F.col("q") * (F.col("n") - F.lit(1))).cast("int") + F.lit(1)
        )
        .select(*g, "q", F.col("val").alias("est"))
    )
