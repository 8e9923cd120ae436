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
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Build a count-min sketch over one term per input row.

    Returns ``(d INT, bucket INT, cnt BIGINT)`` — at most ``depth×width``
    rows total. ``weight_col`` (optional BIGINT) makes it a weighted
    sketch; default weight is 1 per row.

    ``group_cols`` (round 12) keeps one independent sketch PER GROUP —
    ``(*group_cols, d, bucket, cnt)``, ``depth×width`` rows per group
    (per-source vocabulary monitoring, the same consumer grouped MG/KMV
    serve). State is ``depth×width × |groups|``: fine for crawl domains
    (~10⁴ × 8k cells); a high-cardinality group column belongs in the
    term itself (``concat(group, '#', term)``), not in ``group_cols``.
    """
    g = list(group_cols or [])
    term = F.col(term_col)
    w = F.col(weight_col).cast("bigint") if weight_col else F.lit(1).cast("bigint")
    rows = items.select(
        *g,
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
    return rows.groupBy(
        *g, F.col("s.d").alias("d"), F.col("s.bucket").alias("bucket")
    ).agg(F.sum("__w").alias("cnt"))


def countmin_merge(
    *sketches: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """Merge sketches built with identical ``(depth, width)`` (and the
    same ``group_cols``): union + re-sum. Associative and commutative —
    the streaming/daily-rollup merge is this one line."""
    g = list(group_cols or [])
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy(*g, "d", "bucket").agg(F.sum("cnt").alias("cnt"))


def countmin_lookup(
    sketch: DataFrame,
    queries: DataFrame,
    term_col: str,
    *,
    depth: int = 4,
    width: int = 2048,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Point-estimate each query term: ``min`` over rows of the counter at
    that row's bucket (absent counter = 0). Query terms are few by
    contract; the ``depth×width``-bounded sketch side gets the broadcast.

    With ``group_cols`` (round 12) each query row must carry the group
    columns and is estimated against its group's sketch (NULL-SAFE
    group equality, so a null group key reads its own sketch instead of
    nothing). The broadcast stays sound while ``|groups| × depth ×
    width`` cells fit an executor — the same contract as the grouped
    bloom probe.

    Returns the ``queries`` columns plus ``est BIGINT``.
    """
    g = list(group_cols or [])
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
    sk = F.broadcast(
        sketch.select(
            *[F.col(c).alias(f"__g_{c}") for c in g], "d", "bucket", "cnt"
        )
    )
    cond = [q["d"] == sk["d"], q["bucket"] == sk["bucket"]] + [
        q[c].eqNullSafe(sk[f"__g_{c}"]) for c in g
    ]
    joined = q.join(sk, cond, "left").drop(sk["d"]).drop(sk["bucket"])
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


# ---------------------------------------------------------------------------
# KLL-style quantile sketch: deterministic rank-error bound
# ---------------------------------------------------------------------------
#
# The bottom-m sketch above is exactly-oracleable but its accuracy is
# PROBABILISTIC (SE ~ sqrt(q(1-q)/m)): fine for monitoring, not for "p99
# with guarantees". This tier is the deterministic companion: a
# Munro-Paterson-style compactor hierarchy (the deterministic ancestor of
# KLL — Munro & Paterson 1980; Karnin, Lang & Liberty, FOCS 2016 analyze
# the same compaction primitive) whose rank error is BOUNDED, not just
# likely: every compaction of a level-l buffer (item weight 2^l) into
# half at level l+1 shifts any value's rank by at most 2^l, so the sum of
# 2^l over compactions performed — tracked EXACTLY in the sketch itself,
# not estimated from a formula — is a hard ceiling on rank error. The
# repo's randomness discipline holds: compactions keep odd/even survivors
# by a parity that alternates with the per-level compaction count, ties
# break on the key's 60-bit hash — no RNG anywhere, so the sketch is a
# pure function of the input SET (layout-independent: per-shard grouping
# is by key hash, in-shard processing order is hash-sorted).
#
# Representation (engine-portable, queryable, mergeable — same design
# rules as count-min): a DataFrame ``(group..., level INT, val DOUBLE,
# __h BIGINT)``; item rows carry weight 2^level, and one meta row per
# group (``level = -1``, ``__h = 0``) carries the accumulated rank-error
# bound in ``val``. Merging = union + re-compaction (the meta rows ADD,
# then merge-time compactions add on top), so per-epoch streaming deltas
# fold exactly like the bottom-m ones.
#
# Scale shape: one ``applyInPandas`` pass over hash shards (each shard's
# compactor state is O(k log(n_shard/k)) — the full shard never sits in
# level 0), then one bounded merge task per group over the
# ``shards x k x levels`` partials. 100 TB: shards scale with the data,
# the merge input stays sketch-sized.

_KLL_META_LEVEL = -1


def _kll_compact_state(levels: dict, k: int, counts: dict) -> int:
    """Compact every overfull level in place (deterministic: sort by
    (val, hash), keep alternating parity by per-level compaction count).
    Returns the rank-error bound ADDED (sum of 2^l per compaction)."""
    import numpy as np

    added = 0
    lvl = 0
    while lvl <= max(levels, default=0):
        buf = levels.get(lvl)
        if buf is not None and len(buf[0]) > k:
            vals, hs = buf
            order = np.lexsort((hs, vals))
            # only an EVEN count compacts — two weight-w survivorship
            # candidates become one weight-2w survivor, so an odd buffer
            # would drift total represented weight (= the exact input
            # row count, which kll_quantiles reports as n). The largest
            # (val, __h) item stays behind at this level — any fixed
            # choice is deterministic; one leftover is always < k.
            if len(order) % 2:
                leftover, order = order[-1:], order[:-1]
            else:
                leftover = order[:0]
            parity = counts.get(lvl, 0) % 2
            counts[lvl] = counts.get(lvl, 0) + 1
            keep = order[parity::2]
            up = levels.setdefault(
                lvl + 1,
                (np.empty(0, dtype=np.float64), np.empty(0, dtype=np.int64)),
            )
            levels[lvl + 1] = (
                np.concatenate([up[0], vals[keep]]),
                np.concatenate([up[1], hs[keep]]),
            )
            levels[lvl] = (vals[leftover], hs[leftover])
            added += 2 ** lvl
        lvl += 1
    return added


def _kll_ingest(levels: dict, counts: dict, in_vals, in_hs, in_levels, k: int) -> int:
    """Feed (val, hash, level) triples into a compactor state in chunks
    of k (hash-sorted first, so the result is a pure function of the
    SET). Returns the rank-error bound added by compactions."""
    import numpy as np

    added = 0
    order = np.lexsort((in_vals, in_hs))  # deterministic processing order
    in_vals, in_hs, in_levels = in_vals[order], in_hs[order], in_levels[order]
    for lvl in np.unique(in_levels):
        lv = int(lvl)
        mask = in_levels == lvl
        vs, hs = in_vals[mask], in_hs[mask]
        for i in range(0, len(vs), max(k, 1)):
            cur = levels.setdefault(
                lv, (np.empty(0, dtype=np.float64), np.empty(0, dtype=np.int64))
            )
            levels[lv] = (
                np.concatenate([cur[0], vs[i : i + k]]),
                np.concatenate([cur[1], hs[i : i + k]]),
            )
            added += _kll_compact_state(levels, k, counts)
    return added


def _kll_state_to_pdf(levels: dict, err: float, group_key: tuple, group_cols: list):
    import numpy as np
    import pandas as pd

    out_levels, out_vals, out_hs = [], [], []
    for lvl, (vs, hs) in sorted(levels.items()):
        out_levels.extend([lvl] * len(vs))
        out_vals.extend(vs.tolist())
        out_hs.extend(hs.tolist())
    out_levels.append(_KLL_META_LEVEL)
    out_vals.append(float(err))
    out_hs.append(0)
    data = {c: [g] * len(out_levels) for c, g in zip(group_cols, group_key)}
    data.update(
        {
            "level": np.array(out_levels, dtype=np.int32),
            "val": np.array(out_vals, dtype=np.float64),
            "__h": np.array(out_hs, dtype=np.int64),
        }
    )
    return pd.DataFrame(data)


def _kll_reduce_pdf(pdf, k: int, group_cols: list):
    """One compactor pass over already-sketched (or raw level-0) rows of
    a single group: ingest item rows, sum meta rows into the error, add
    merge-compaction error on top."""
    import numpy as np

    meta = pdf[pdf["level"] == _KLL_META_LEVEL]
    items = pdf[pdf["level"] != _KLL_META_LEVEL]
    err = float(meta["val"].sum())
    levels: dict = {}
    counts: dict = {}
    err += _kll_ingest(
        levels, counts,
        items["val"].to_numpy(np.float64),
        items["__h"].to_numpy(np.int64),
        items["level"].to_numpy(np.int64),
        k,
    )
    key = tuple(pdf[c].iloc[0] for c in group_cols)
    return _kll_state_to_pdf(levels, err, key, group_cols)


def kll_sketch_build(
    items: DataFrame,
    value_col: str,
    key_col: str,
    *,
    k: int = 256,
    group_cols: list[str] | None = None,
    shards: int = 64,
) -> DataFrame:
    """Build the deterministic-error quantile sketch: ``(group...,
    level INT, val DOUBLE, __h BIGINT)`` — item rows weigh ``2^level``,
    the ``level = -1`` meta row's ``val`` is the sketch's hard rank-error
    bound (see the section comment). Two ``applyInPandas`` phases:
    per-(group, hash-shard) compactors (shard = ``pmod(xxhash64(key),
    shards)`` — layout-independent by construction), then one bounded
    merge-compaction per group over the ``<= shards x k x levels`` shard
    partials. ``key_col`` uniquely identifies an observation (it seeds
    the deterministic tie-break hash). Size ``shards`` so a shard's rows
    fit one task comfortably; the compactor state itself is
    ``O(k log(n/k))`` regardless."""
    from pyspark.sql.types import (
        DoubleType, IntegerType, LongType, StructField, StructType,
    )

    g = list(group_cols or [])
    schema_fields = [items.schema[c] for c in g] + [
        StructField("level", IntegerType()),
        StructField("val", DoubleType()),
        StructField("__h", LongType()),
    ]
    out_schema = StructType(schema_fields)

    def _shard_fn(pdf):
        return _kll_reduce_pdf(pdf.drop(columns=["__shard"]), k, g)

    def _merge_fn(pdf):
        return _kll_reduce_pdf(pdf, k, g)

    rows = items.select(
        *g,
        F.lit(0).cast("int").alias("level"),
        F.col(value_col).cast("double").alias("val"),
        _rank_hash(F.col(key_col)).alias("__h"),
        F.pmod(F.xxhash64(F.col(key_col).cast("string")), F.lit(shards))
        .cast("int")
        .alias("__shard"),
    )
    partials = rows.groupBy(*g, "__shard").applyInPandas(_shard_fn, out_schema)
    if g:
        return partials.groupBy(*g).applyInPandas(_merge_fn, out_schema)
    return (
        partials.withColumn("__g", F.lit(0))
        .groupBy("__g")
        .applyInPandas(
            lambda pdf: _kll_reduce_pdf(pdf.drop(columns=["__g"]), k, g),
            out_schema,
        )
    )


def kll_sketch_merge(
    *sketches: DataFrame,
    k: int = 256,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Merge sketches built with the same ``k``: union, then one
    compaction pass per group. The meta rows' error bounds ADD, and any
    compaction the merge itself performs adds its ``2^level`` on top —
    so the merged sketch's bound remains a hard ceiling (KLL/MP
    mergeability; the bound degrades additively, never silently).
    Associative and commutative up to the deterministic compaction
    schedule; the BOUND columns are order-independent."""
    from pyspark.sql.types import (
        DoubleType, IntegerType, LongType, StructField, StructType,
    )

    g = list(group_cols or [])
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    out_schema = StructType(
        [out.schema[c] for c in g]
        + [
            StructField("level", IntegerType()),
            StructField("val", DoubleType()),
            StructField("__h", LongType()),
        ]
    )
    if g:
        return out.groupBy(*g).applyInPandas(
            lambda pdf: _kll_reduce_pdf(pdf, k, g), out_schema
        )
    return (
        out.withColumn("__g", F.lit(0))
        .groupBy("__g")
        .applyInPandas(
            lambda pdf: _kll_reduce_pdf(pdf.drop(columns=["__g"]), k, g),
            out_schema,
        )
    )


def kll_quantiles(
    sketch: DataFrame,
    qs: list[float],
    *,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Quantile estimates with their deterministic guarantee, off a KLL
    sketch: one row per requested ``q`` (per group) —
    ``(*group_cols, q DOUBLE, est DOUBLE, n BIGINT, err_rank_bound
    BIGINT)``: ``est`` is the smallest sketch value whose cumulative
    weight reaches the nearest-rank target ``floor(q*(n-1)) + 1``
    (weights are ``2^level``; ties ordered by ``(val, __h)`` —
    deterministic), ``n`` the total represented weight (= exact input
    row count: compaction preserves total weight), and
    ``err_rank_bound`` the sketch's tracked hard bound — the TRUE rank
    of ``est`` is within ``err_rank_bound`` of the target, always, not
    with high probability. Windows run over sketch-sized groups
    (``O(k log(n/k))`` rows) — bounded by construction."""
    from pyspark.sql import Window

    g = list(group_cols or [])
    items = sketch.filter(F.col("level") != _KLL_META_LEVEL).withColumn(
        "__w", F.pow(F.lit(2.0), F.col("level")).cast("bigint")
    )
    meta = sketch.filter(F.col("level") == _KLL_META_LEVEL).select(
        *g, F.col("val").cast("bigint").alias("err_rank_bound")
    )
    if g:
        w = Window.partitionBy(*g).orderBy("val", "__h")
        nw = Window.partitionBy(*g)
    else:
        w = Window.orderBy("val", "__h")
        nw = Window.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
    ranked = items.select(
        *g,
        "val",
        F.sum("__w").over(w).alias("cw"),
        F.sum("__w").over(nw).alias("n"),
    )
    qdf = ranked.sparkSession.createDataFrame(
        [(float(q),) for q in qs], "q double"
    )
    targeted = ranked.crossJoin(F.broadcast(qdf)).withColumn(
        "__target",
        F.floor(F.col("q") * (F.col("n") - F.lit(1))).cast("bigint") + F.lit(1),
    )
    hit_w = (
        Window.partitionBy(*g, "q") if g else Window.partitionBy("q")
    ).orderBy("cw", "val")
    est = (
        targeted.filter(F.col("cw") >= F.col("__target"))
        .withColumn("__rn", F.row_number().over(hit_w))
        .filter(F.col("__rn") == 1)
        .select(*g, "q", F.col("val").alias("est"), "n")
    )
    if g:
        # null-safe: a NULL group key is a real group here and must not
        # drop through the inner join (see _ns_join)
        return _ns_join(est, meta, g)
    return est.crossJoin(F.broadcast(meta))


def _ns_join(
    left: DataFrame, right: DataFrame, on: list[str], how: str = "inner"
) -> DataFrame:
    """Group-column join with NULL-SAFE equality. The grouped sketch
    builds deliberately KEEP null group keys (pandas ``dropna=False``;
    Spark ``groupBy`` treats NULL as a group), but a plain
    ``.join(on=cols)`` compares with null-unsafe ``=`` — an inner join
    silently DROPS the entire null group from the output and a left
    join misses its match (round-11 advice: items under a null group
    key vanished from grouped summaries without error).
    ``eqNullSafe`` keeps the null group first-class; the right side's
    join columns are renamed then dropped so the output schema matches
    the plain using-join exactly."""
    renamed = {c: f"__r_{c}" for c in on}
    r = right
    for c, rc in renamed.items():
        r = r.withColumnRenamed(c, rc)
    cond = None
    for c, rc in renamed.items():
        e = left[c].eqNullSafe(r[rc])
        cond = e if cond is None else (cond & e)
    return left.join(r, cond, how).drop(*renamed.values())


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters (deterministic UNDERcount — count-min's dual)
# ---------------------------------------------------------------------------

def mg_sketch(
    df: DataFrame,
    item_col: str,
    *,
    k: int = 64,
    group_cols: list[str] | None = None,
    max_groups_per_partition: int | None = None,
) -> DataFrame:
    """Misra-Gries heavy-hitters summary — the sketch shelf's missing
    classic beside count-min: k counters, deterministic UNDERestimates
    (count-min only ever OVERcounts), and the guarantee that every item
    with true frequency above the tracked bound is present.

    Phase 1 of the mergeable-summaries construction (Agarwal et al.,
    PODS 2012): classic MG runs per INPUT PARTITION inside
    ``mapInPandas`` with bounded state and ZERO shuffle — the point at
    100 TB, where the exact ``groupBy(item).count()`` alternative
    shuffles one row per vocabulary entry. Each Arrow batch
    pre-aggregates with ``value_counts`` and folds in as weighted
    inserts; whenever the counter set exceeds k, the (k+1)-th largest
    value δ is subtracted from every counter (≤0 drop) and δ
    accumulates into the partition's EXACT decrement total — the error
    is tracked, not estimated (Berinde et al.: any reduce schedule
    preserves ``true − est ≤ Σδ``).

    Returns raw sketch rows: counter rows ``(item, cnt, 0, 0)`` plus one
    meta row per partition ``(NULL, 0, dec, n)``. Feed to
    :func:`mg_summary` (union raw sketches from several builds first to
    merge — the summary's reduction IS the merge operation). ``item`` is
    cast to string for engine portability.

    ``group_cols`` (round 11) runs an INDEPENDENT MG per group — the
    per-domain heavy-hitter form a curation audit actually consumes —
    with the same zero-shuffle contract: each input partition keeps k
    counters PER GROUP it sees (bounded state = k · |groups in
    partition|; meta rows are per (partition, group), so every
    guarantee below holds per group). Group columns are cast to string
    like ``item`` (engine-portable, and the mapInPandas output schema
    stays fixed).

    ``max_groups_per_partition`` (round 12) is the high-cardinality
    escape hatch: grouped state is ``k · |groups in partition|`` Python
    dict entries, fine for crawl domains (~10⁴) but unbounded for a
    user-id-like group column. With a cap set, each partition tracks MG
    state for the FIRST cap groups it sees; every further group SPILLS
    — its batch-preaggregated ``(item, weight)`` counts pass straight
    through as counter rows (plus a meta row carrying the batch's exact
    n), streamed out per Arrow batch, never held. Spilled rows are
    EXACT inputs to the reduction, so every guarantee below still holds
    for spilled groups (their partition dec contribution is 0; the only
    subtraction is the summary's own t) — the trade is OUTPUT size, not
    correctness: a spilled group emits ~distinct-items-per-batch rows
    instead of ≤ k+1, which downstream shuffles into the group-keyed
    summary. If most groups overflow, ``df.repartition(*group_cols)``
    first — co-locating a group's rows makes |groups per partition| ≈
    |groups| / partitions and turns the cap back into dead code."""
    import pandas as pd

    g = list(group_cols or [])
    if max_groups_per_partition is not None:
        if not g:
            raise ValueError(
                "max_groups_per_partition only applies to a grouped "
                "build (group_cols=...): ungrouped state is k counters, "
                "already bounded"
            )
        if max_groups_per_partition < 1:
            raise ValueError("max_groups_per_partition must be >= 1")
    src = df.select(
        *[F.col(c).cast("string").alias(c) for c in g],
        F.col(item_col).cast("string").alias("item"),
    )
    schema = (
        ", ".join(f"`{c}` string" for c in g)
        + (", " if g else "")
        + "item string, cnt long, dec long, n long"
    )

    def _build(batches):
        # state per group key (() for the ungrouped build)
        counters: dict[tuple, dict] = {}
        dec: dict[tuple, int] = {}
        n: dict[tuple, int] = {}
        for pdf in batches:
            pdf = pdf.dropna(subset=["item"])
            if g:
                grouped = pdf.groupby(g, dropna=False)["item"].value_counts()
                items_iter = (
                    (key if isinstance(key, tuple) else (key,), w)
                    for key, w in grouped.items()
                )
                # key is (g1, ..., gN, item); split off the item
                pairs = [((key[:-1]), key[-1], int(w)) for key, w in items_iter]
            else:
                pairs = [
                    ((), it, int(w))
                    for it, w in pdf["item"].value_counts().items()
                ]
            touched = set()
            spill_rows: list[tuple] = []
            spill_n: dict[tuple, int] = {}
            for gk, it, w in pairs:
                if (
                    max_groups_per_partition is not None
                    and gk not in counters
                    and len(counters) >= max_groups_per_partition
                ):
                    # overflow group: pass the batch-preaggregated count
                    # straight through as an EXACT counter row — no
                    # state held, guarantees preserved (dec stays 0)
                    spill_rows.append((*gk, it, w, 0, 0))
                    spill_n[gk] = spill_n.get(gk, 0) + w
                    continue
                c = counters.setdefault(gk, {})
                c[it] = c.get(it, 0) + w
                n[gk] = n.get(gk, 0) + w
                touched.add(gk)
            for gk in touched:
                c = counters[gk]
                if len(c) > k:
                    delta = sorted(c.values(), reverse=True)[k]
                    counters[gk] = {i: v - delta for i, v in c.items() if v > delta}
                    dec[gk] = dec.get(gk, 0) + delta
            if spill_rows:
                for gk, w in spill_n.items():
                    spill_rows.append((*gk, None, 0, 0, int(w)))
                yield pd.DataFrame(
                    spill_rows, columns=[*g, "item", "cnt", "dec", "n"]
                )
        rows = []
        for gk in counters:
            for it, v in counters[gk].items():
                rows.append((*gk, it, int(v), 0, 0))
            rows.append((*gk, None, 0, int(dec.get(gk, 0)), int(n.get(gk, 0))))
        yield pd.DataFrame(rows, columns=[*g, "item", "cnt", "dec", "n"])

    return src.mapInPandas(_build, schema)


def mg_compact(
    sketch: DataFrame, *, k: int = 64, group_cols: list[str] | None = None
) -> DataFrame:
    """Reduce raw :func:`mg_sketch` rows to ONE raw-format sketch — the
    mergeable-summaries merge emitting the input format, so it composes:
    ``mg_compact(a.union(b))`` is a valid raw sketch whose tracked
    decrement total already includes this reduction's t (bounds ADD).
    This is what a streaming fold applies to delta dirs
    (:func:`~confluent_kafka_vector_search_prompt_inference_spark.streaming.pipeline.mg_insert`): folding can never
    change what :func:`mg_summary` computes beyond tightening storage,
    because summary-of-compact ≡ summary-of-raw by the merge law.
    All inputs are sketch-scale; the (k+1)-th largest resolves via a
    k-bounded driver collect — or, for ``group_cols`` (a grouped
    :func:`mg_sketch`), through the same group-keyed rank window as
    :func:`mg_summary`, emitting one compacted raw sketch (counters +
    one meta row) PER GROUP with each group's reduction subtraction
    folded into its tracked bound."""
    g = list(group_cols or [])
    if g:
        from pyspark.sql import Window

        counters = (
            sketch.filter(F.col("item").isNotNull())
            .groupBy(*g, "item")
            .agg(F.sum("cnt").alias("s"))
        )
        w = Window.partitionBy(*g).orderBy(F.desc("s"), F.asc("item"))
        ranked = counters.withColumn("__rn", F.row_number().over(w))
        t_g = ranked.filter(F.col("__rn") == k + 1).select(
            *g, F.col("s").alias("__t")
        )
        meta = (
            sketch.filter(F.col("item").isNull())
            .groupBy(*g)
            .agg(
                F.coalesce(F.sum("dec"), F.lit(0)).alias("__dec"),
                F.coalesce(F.sum("n"), F.lit(0)).alias("__n"),
            )
        )
        kept = (
            _ns_join(ranked.filter(F.col("__rn") <= k), t_g, g, "left")
            .withColumn("__t", F.coalesce(F.col("__t"), F.lit(0)))
            .filter(F.col("s") > F.col("__t"))
            .select(
                *g,
                "item",
                (F.col("s") - F.col("__t")).cast("long").alias("cnt"),
                F.lit(0).cast("long").alias("dec"),
                F.lit(0).cast("long").alias("n"),
            )
        )
        meta_rows = (
            _ns_join(meta, t_g, g, "left")
            .select(
                *g,
                F.lit(None).cast("string").alias("item"),
                F.lit(0).cast("long").alias("cnt"),
                (F.col("__dec") + F.coalesce(F.col("__t"), F.lit(0)))
                .cast("long")
                .alias("dec"),
                F.col("__n").cast("long").alias("n"),
            )
        )
        return kept.unionByName(meta_rows)
    counters = (
        sketch.filter(F.col("item").isNotNull())
        .groupBy("item")
        .agg(F.sum("cnt").alias("s"))
    )
    top = counters.orderBy(F.desc("s"), F.asc("item")).limit(k + 1).collect()
    t = int(top[k]["s"]) if len(top) > k else 0
    meta = sketch.agg(
        F.coalesce(F.sum("dec"), F.lit(0)).alias("dec"),
        F.coalesce(F.sum("n"), F.lit(0)).alias("n"),
    ).collect()[0]
    spark = sketch.sparkSession
    meta_row = spark.createDataFrame(
        [(None, 0, int(meta["dec"]) + t, int(meta["n"]))],
        "item string, cnt long, dec long, n long",
    )
    return (
        counters.filter(F.col("s") > t)
        .select(
            "item",
            (F.col("s") - F.lit(t)).cast("long").alias("cnt"),
            F.lit(0).cast("long").alias("dec"),
            F.lit(0).cast("long").alias("n"),
        )
        .unionByName(meta_row)
    )


def mg_summary(
    sketch: DataFrame, *, k: int = 64, group_cols: list[str] | None = None
) -> DataFrame:
    """Reduce raw :func:`mg_sketch` rows (from one build, or a UNION of
    builds — this reduction IS the mergeable-summaries merge) to the
    final heavy-hitters table ``(item, est, bound, n)``:

    - ``est ≤ true`` for every retained item (MG never overcounts);
    - ``true − est ≤ bound`` for EVERY item, retained or not — bound =
      Σ per-partition decrements + t, where t is the (k+1)-th largest
      summed counter subtracted here (items tying t drop,
      deterministically);
    - every item with ``true > bound`` is retained (if true > Σdec + t
      then its summed counter exceeds t);
    - ``n`` is the EXACT total item count (free — the meta rows carry
      per-partition exact tallies).

    All inputs to the reduction are sketch-scale (≤ partitions × k
    rows); the (k+1)-th largest resolves via a k-bounded driver collect,
    the same bounded-collect discipline as every top-k final in this
    repo. The estimates are layout-dependent (as with any MG
    construction) — the GUARANTEES above are not, which is what the
    oracle and tests pin.

    ``group_cols`` reduces a GROUPED :func:`mg_sketch` per group —
    output ``(*group_cols, item, est, bound, n)`` with every guarantee
    holding per group. The (k+1)-th largest resolves through a
    group-keyed rank window over sketch-sized groups (≤ partitions·k
    rows per group) instead of a driver collect — the
    ``kll_grouped_quantiles`` discipline."""
    g = list(group_cols or [])
    if g:
        from pyspark.sql import Window

        counters = (
            sketch.filter(F.col("item").isNotNull())
            .groupBy(*g, "item")
            .agg(F.sum("cnt").alias("s"))
        )
        w = Window.partitionBy(*g).orderBy(F.desc("s"), F.asc("item"))
        ranked = counters.withColumn("__rn", F.row_number().over(w))
        t_g = ranked.filter(F.col("__rn") == k + 1).select(
            *g, F.col("s").alias("__t")
        )
        meta = (
            sketch.filter(F.col("item").isNull())
            .groupBy(*g)
            .agg(
                F.coalesce(F.sum("dec"), F.lit(0)).alias("__dec"),
                F.coalesce(F.sum("n"), F.lit(0)).alias("__n"),
            )
        )
        return (
            _ns_join(
                _ns_join(ranked.filter(F.col("__rn") <= k), t_g, g, "left")
                .withColumn("__t", F.coalesce(F.col("__t"), F.lit(0)))
                .filter(F.col("s") > F.col("__t")),
                meta,
                g,
            )
            .select(
                *g,
                "item",
                (F.col("s") - F.col("__t")).cast("long").alias("est"),
                (F.col("__dec") + F.col("__t")).cast("long").alias("bound"),
                F.col("__n").cast("long").alias("n"),
            )
        )
    counters = (
        sketch.filter(F.col("item").isNotNull())
        .groupBy("item")
        .agg(F.sum("cnt").alias("s"))
    )
    top = counters.orderBy(F.desc("s"), F.asc("item")).limit(k + 1).collect()
    t = int(top[k]["s"]) if len(top) > k else 0
    meta = sketch.agg(
        F.coalesce(F.sum("dec"), F.lit(0)).alias("dec"),
        F.coalesce(F.sum("n"), F.lit(0)).alias("n"),
    ).collect()[0]
    bound = int(meta["dec"]) + t
    return (
        counters.filter(F.col("s") > t)
        .select(
            "item",
            (F.col("s") - F.lit(t)).cast("long").alias("est"),
            F.lit(bound).cast("long").alias("bound"),
            F.lit(int(meta["n"])).cast("long").alias("n"),
        )
    )


# ---------------------------------------------------------------------------
# AMS / tug-of-war second-moment (F2) sketch — self-join size estimation
# ---------------------------------------------------------------------------

def ams_sketch(
    items: DataFrame,
    item_col: str,
    *,
    depth: int = 16,
    weight_col: str | None = None,
) -> DataFrame:
    """AMS "tug-of-war" sketch (Alon-Matias-Szegedy, STOC'96) of the
    second frequency moment F2 = Σ count(item)² — the self-join size,
    the optimizer statistic that says how explosive a key column joins
    with itself (and the standard repetitiveness scalar of a corpus).

    ``depth`` independent ±1 sign rows: row j's state is the single
    number S_j = Σ over input rows of sign_j(item)·w, where sign_j is
    the parity of the repo-standard md5 bucket of the ``"{j}#"``-seeded
    item — DETERMINISTIC, so unlike textbook AMS the whole sketch (and
    therefore the estimate) is a pure function of the input multiset,
    reproducible bit-for-bit in any engine with md5 (the oracle
    recomputes every S_j exactly). E[S_j²] = F2 and Var(S_j²) ≤ 2·F2²
    still hold over the hash family; :func:`ams_f2` uses the
    median-of-rows estimator.

    Scale shape: one ``groupBy(j).sum`` over a depth-way fanout —
    map-side partials bound the shuffle at ``depth`` rows per task, so
    a 100 TB column's F2 costs the scan (same contract as
    :func:`countmin_build`). Merge = union + re-sum per row
    (:func:`ams_merge` — signs are deterministic, so sketches of two
    corpus halves ADD)."""
    w = F.col(weight_col).cast("bigint") if weight_col else F.lit(1).cast("bigint")
    term = F.col(item_col)
    rows = items.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        (
                            F.lit(1)
                            - F.lit(2) * hash_bucket(F.concat_ws("#", F.lit(str(j)), term), 2)
                        ).cast("bigint").alias("sign"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("s"),
        w.alias("__w"),
    )
    return rows.groupBy(F.col("s.j").alias("j")).agg(
        F.sum(F.col("s.sign") * F.col("__w")).alias("s")
    )


def ams_merge(*sketches: DataFrame) -> DataFrame:
    """Merge AMS sketches built with identical depth: union + per-row
    re-sum. The signs are deterministic functions of the item, so the
    merged sketch equals the sketch of the concatenated input —
    associative, commutative, streaming-delta-safe."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("j").agg(F.sum("s").alias("s"))


def ams_f2(sketch: DataFrame, *, group: int = 8) -> DataFrame:
    """F2 estimate from an AMS sketch: the classic MEDIAN-OF-MEANS —
    rows bucket into groups of ``group`` consecutive j's, each group
    averages its S_j² (means beat single rows: Var/``group``), and the
    median over group means is the estimate. One row ``(f2_est
    BIGINT)``; everything is a bounded aggregation over ≤ depth rows.
    ``floor`` before the BIGINT cast on BOTH engines — Spark truncates
    a fractional cast while DuckDB rounds, so the shared floor keeps
    the oracle exact when the median interpolates two group means.

    Each row's S_j casts to DOUBLE **before** squaring: |S_j| can reach
    sqrt(F2) (~3.0e9 already for a single key with ~1e12 occurrences —
    squarely inside the 100 TB regime this sketch targets), and the
    non-ANSI BIGINT multiply would silently wrap there while the oracle
    kept computing in floats — a silent divergence. Squaring in DOUBLE
    is IEEE-identical in Spark and DuckDB (the oracle mirrors the cast
    order), and the estimate's own variance (~F2/sqrt(depth)) dwarfs
    the 2^-52 relative rounding.

    The final BIGINT narrow is GUARDED (round-12, advice r11): past
    F2 ~ 2^63 Spark's non-ANSI ``floor``/cast wraps to garbage or NULL
    while DuckDB's DOUBLE→BIGINT cast raises — the guard makes BOTH
    engines fail loudly at the same boundary. The estimate can't stay
    exact past 2^63 anyway (a double's 53-bit mantissa already owns
    it); keeping BIGINT-with-loud-overflow beats a DECIMAL(38,0)
    output because Spark's double→decimal conversion goes through
    Java's shortest-string repr while DuckDB expands the exact binary
    value — bit-DIFFERENT results above 2^53, a silent oracle split
    (measured: 9.2e24 → …0000000 in Spark vs …630901248 in DuckDB)."""
    means = sketch.groupBy(
        (F.col("j") / F.lit(group)).cast("int").alias("grp")
    ).agg(F.avg(F.col("s").cast("double") * F.col("s").cast("double")).alias("m"))
    med = F.expr("percentile(m, 0.5)")
    guarded = F.when(
        med >= F.lit(9.223372036854775808e18),
        F.raise_error(
            F.lit(
                "ams_f2: estimate exceeds BIGINT range (F2 >= 2^63); "
                "the DuckDB oracle's cast raises at the same boundary"
            )
        ).cast("double"),
    ).otherwise(med)
    return means.agg(F.floor(guarded).cast("bigint").alias("f2_est"))
