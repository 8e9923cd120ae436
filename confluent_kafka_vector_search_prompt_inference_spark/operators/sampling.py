"""Dataset sampling / splitting for training-data pipelines.

Not in the reference (SURVEY.md §2.11 — extension surface). Two primitives
a 100 TB curation pipeline needs:

- ``dataset_split`` — deterministic CONTENT-hash split (train/val/test).
  A row's split depends only on its key, never on partitioning, executor
  count, or visit order, so the same document lands in the same split
  across reruns, engines, and data relayouts — the property that matters
  when the corpus is re-sharded between runs. Pure Catalyst expressions
  (md5 → 32-bit bucket → range lookup): narrow, shuffle-free, codegen'd.
- ``stratified_sample`` — per-stratum Bernoulli sampling via ``sampleBy``
  (seeded, map-side, shuffle-free) for class-balancing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_BUCKETS = 1_000_000


def hash_bucket(key: Column | str, buckets: int = _BUCKETS) -> Column:
    """Deterministic bucket in ``[0, buckets)`` from the md5 of the key.

    Engine-portable: the first 8 hex digits of md5 read as an integer give
    the identical bucket in any system with md5 (the DuckDB oracle uses
    ``('0x' || substring(md5(k),1,8))::UBIGINT % buckets``).
    """
    c = F.col(key) if isinstance(key, str) else key
    return (
        F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10)
        .cast("bigint") % F.lit(buckets)
    )


def dataset_split(
    df: DataFrame,
    key: str,
    weights: dict[str, float],
    split_col: str = "split",
    buckets: int = _BUCKETS,
) -> DataFrame:
    """Assign each row to a named split by content hash of ``key``.

    ``weights`` maps split name → fraction (must sum to ~1). Rows with
    equal keys always land in the same split (the desired behavior for
    dedup-aware splitting: duplicate documents can never straddle
    train/test and leak).
    """
    total = sum(weights.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split weights must sum to 1, got {total}")
    bucket = hash_bucket(key, buckets)
    expr: Column | None = None
    upper = 0.0
    names = list(weights)
    for name in names[:-1]:
        upper += weights[name]
        cond = bucket < int(upper * buckets)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    return df.withColumn(split_col, expr)


def temperature_mix(
    df: DataFrame,
    domain_col: str,
    key: str,
    *,
    budget_frac: float = 0.5,
    buckets: int = _BUCKETS,
) -> DataFrame:
    """Temperature-weighted (α=0.5) domain mixing — the multilingual /
    multi-source rebalancing used by large-LM data pipelines (upsample the
    tail, downsample the head; cf. the α-smoothed sampling of XLM-R /
    mT5-style training mixes). Returns the selected rows.

    Target share of domain d ∝ ``isqrt(n_d)`` (α=0.5 as an *integer*
    square root), so a domain with 4× the rows gets only 2× the slots.
    With a total budget of ``floor(budget_frac · N)`` rows, domain d keeps
    ``p_d = min(1, budget · isqrt(n_d) / (S · n_d))`` of its rows
    (``S = Σ isqrt``), decided per row by content hash of ``key``.

    Exactness across engines/partitionings: every quantity stays integral
    — counts, isqrt, the hash bucket — and the keep decision is the pure
    DECIMAL(38) integer comparison ``bucket · S · n_d < budget · isqrt_d ·
    buckets`` (no float accumulation anywhere, so no reduction-order
    drift; DECIMAL(38) holds the product up to petabyte-scale counts:
    1e6 · ~5e6 · 1e12 ≈ 5e24 ≪ 1e38).

    Scale shape: one tiny per-domain count aggregate (rows = #domains)
    broadcast back onto the corpus; the keep decision is a narrow
    map-side expression. No corpus shuffle, no driver materialization.
    """
    if not 0.0 < budget_frac <= 1.0:
        raise ValueError(f"budget_frac must be in (0, 1], got {budget_frac}")
    counts = df.groupBy(F.col(domain_col).alias("__dom")).agg(
        F.count(F.lit(1)).alias("__n")
    )
    sqrts = counts.select(
        "__dom", "__n", F.floor(F.sqrt("__n")).cast("bigint").alias("__sq")
    )
    totals = sqrts.agg(
        F.sum("__sq").alias("__s"), F.sum("__n").alias("__total")
    )
    dims = F.broadcast(sqrts.crossJoin(F.broadcast(totals)))
    budget = F.floor(F.col("__total") * F.lit(budget_frac)).cast("bigint")
    dec = "decimal(38,0)"
    keep = (
        hash_bucket(key, buckets).cast(dec) * F.col("__s").cast(dec) * F.col("__n").cast(dec)
        < budget.cast(dec) * F.col("__sq").cast(dec) * F.lit(buckets).cast(dec)
    )
    return (
        df.join(dims, df[domain_col] == dims["__dom"])
        .filter(keep)
        .drop("__dom", "__n", "__sq", "__s", "__total")
    )


def epoch_shuffle(
    df: DataFrame,
    key: str,
    *,
    epoch: int,
    n_shards: int,
    shard_col: str = "shard",
    pos_col: str = "pos",
) -> DataFrame:
    """Deterministic global training order for one epoch, as (shard, pos).

    Each row gets an order hash ``h = md5(epoch ‖ key)``; its shard is
    ``h mod n_shards`` and its position is the rank of ``(h, key)`` within
    the shard. The global order is ``(shard, pos)`` — exactly how training
    readers consume sharded corpora (stream shards in order, or one shard
    per data-loader worker). Different epochs yield independent
    permutations from the same corpus with NO RNG state to checkpoint: a
    resumed job regenerates the identical order from (epoch, key) alone.

    Scale shape: the only wide operation is the rank window *partitioned
    by shard* — never a global single-partition sort. Pick ``n_shards ≈
    N / desired_shard_rows`` so each window partition is bounded (e.g.
    1e5 shards at 1e12 rows keeps shards at ~1e7 rows); skew is
    impossible because shard assignment is a uniform hash.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    c = F.col(key).cast("string")
    h = F.md5(F.concat(F.lit(f"{epoch}#"), c))
    shard = (
        F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % F.lit(n_shards)
    ).cast("int")
    w = Window.partitionBy(shard_col).orderBy(F.col("__h"), F.col(key))
    return (
        df.withColumn(shard_col, shard)
        .withColumn("__h", h)
        .withColumn(pos_col, F.row_number().over(w))
        .drop("__h")
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    seed: int = 42,
) -> DataFrame:
    """Per-stratum Bernoulli sample (class rebalancing). Map-side only —
    each partition filters locally with a seeded hash; no shuffle, no
    driver collect. Fractions are exact in expectation; for exact-count
    sampling, window-rank over ``rand(seed)`` per stratum instead."""
    return df.sampleBy(strata_col, fractions, seed=seed)


def per_group_top_n(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    n: int,
    *,
    salt_parts: int = 16,
    salt_key: str | None = None,
    rank_col: str = "rank",
) -> DataFrame:
    """Exact top-``n`` rows per group, skew-safe.

    A single ``Window.partitionBy(group)`` funnels every row of a hot
    group through one task — the classic quota-capping hazard when one
    domain is 90% of a 100 TB corpus. This computes the identical result
    in two bounded phases: phase 1 ranks within ``(group, salt)`` (fan-out
    ``salt_parts``× on the hot key) and keeps ``n`` per salt; phase 2
    ranks the ≤ ``n·salt_parts`` survivors per group. Any row outside a
    salt's top-``n`` can't be in the group's top-``n`` (the salt's own
    top-``n`` all beat it), so the two-phase result is exactly the
    one-window result, while no task ever sees more than its salt shard
    (phase 1) or ``n·salt_parts`` rows (phase 2).

    ``order_cols`` must be a total order (include a unique id tiebreak)
    for determinism. ``salt_key`` is REQUIRED and feeds the content-hash
    salt, keeping phase 1 deterministic under any physical row order. It
    must vary *within* groups (a unique row id is ideal): salting on a
    group column hashes every row of a group to ONE salt, silently
    disabling the very skew protection this function exists for — so a
    ``salt_key`` that is also a group column is rejected outright.
    """
    if salt_key is None:
        raise ValueError(
            "per_group_top_n requires salt_key: a column that varies within "
            "groups (e.g. a unique row id) to spread hot groups across salts"
        )
    if salt_key in group_cols:
        raise ValueError(
            f"salt_key {salt_key!r} is a group column - every row of a group "
            "would hash to one salt, disabling the skew fan-out"
        )
    key = salt_key
    salted = df.withColumn("__salt", hash_bucket(key, salt_parts))
    w1 = Window.partitionBy(*group_cols, "__salt").orderBy(*order_cols)
    phase1 = (
        salted.withColumn("__r1", F.row_number().over(w1))
        .filter(F.col("__r1") <= n)
        .drop("__r1", "__salt")
    )
    w2 = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return phase1.withColumn(rank_col, F.row_number().over(w2)).filter(
        F.col(rank_col) <= n
    )


def scalable_cumsum(
    df: DataFrame,
    order_col,
    value_col: str,
    *,
    out_col: str = "cum",
    n_parts: int | None = None,
    total_col: str | None = None,
) -> DataFrame:
    """Global running sum WITHOUT a single-partition window.

    ``Window.orderBy(...)`` with no partition key funnels every row
    through one task — the classic cumulative-sum scale-killer. This is
    the two-phase exact equivalent: range-partition by the order column
    (partition i holds strictly smaller keys than partition i+1), local
    running sums per partition, then add each partition's prefix offset
    (one metadata-sized collect of per-partition totals). Identical to
    the one-window result whenever the order key is unique per row
    (range boundaries then can't split an order position — dedupe to
    a value table first, which is also what bounds the input size).

    ``order_col`` may be a single column name or a list/tuple of names;
    a multi-column key orders lexicographically by the tuple, so callers
    needing ``(value, tiebreaker)`` ranks pass both columns instead of
    packing them into one arithmetic composite (which silently misorders
    once the tiebreaker outgrows its reserved digits).

    ``total_col``: when set, the output also carries the grand total of
    ``value_col`` as a literal column under that name. The per-partition
    totals are already collected on the driver to compute prefix offsets,
    so the grand total is their sum — zero extra jobs, zero extra
    exchanges, unlike a separate ``df.agg(sum(...))`` action.
    """
    if n_parts is None:
        # width follows the session (floored at 32): the two-phase cumsum
        # is exact at ANY partitioning, so this only sizes parallelism —
        # a hardcoded 32 would cap a 100 TB value table's cumsum at 32
        # tasks, while local 32-core runs keep the same layout as before
        n_parts = max(32, df.sparkSession.sparkContext.defaultParallelism)
    if n_parts < 1:
        raise ValueError("n_parts must be >= 1")
    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)
    if not order_cols:
        raise ValueError("order_col must name at least one column")
    d = df.repartitionByRange(n_parts, *[F.col(c).asc() for c in order_cols])
    d = d.withColumn("__pid", F.spark_partition_id())
    w = (
        Window.partitionBy("__pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # localCheckpoint (not persist): materializes once so the partition
    # ids seen by the totals collect and by the downstream plan are the
    # SAME physical partitioning, breaks lineage, and is reclaimed by the
    # ContextCleaner when the frame goes out of scope — no unpersist
    # bookkeeping forced on callers.
    d = d.withColumn("__local", F.sum(value_col).over(w)).localCheckpoint(eager=True)
    totals = {
        r["__pid"]: r["t"]
        for r in d.groupBy("__pid").agg(F.sum(value_col).alias("t")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += totals[pid]
    omap = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv]
    )
    out = d.withColumn(
        out_col, F.col("__local") + F.coalesce(omap[F.col("__pid")], F.lit(0))
    ).drop("__pid", "__local")
    if total_col is not None:
        out = out.withColumn(total_col, F.lit(acc))
    return out


# ---------------------------------------------------------------------------
# DSIR importance resampling (Xie et al. 2023, "Data Selection for
# Language Models via Importance Resampling")
# ---------------------------------------------------------------------------

def dsir_importance_weights(
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    n: int = 2,
    buckets: int = 8192,
) -> DataFrame:
    """Per-document DSIR importance weights: hashed word ``n``-gram
    features, Laplace-smoothed bucket distributions over the TARGET and
    RAW corpora, and each raw document scored by the summed log ratio
    of its gram occurrences — ``log ŵ(d) = Σ_g log(p̂_target[h(g)] /
    p̂_raw[h(g)])``. Documents whose hashed gram profile looks like the
    target distribution score high; generic or off-target text scores
    low. Returns ``(id_col, n_grams, logw_nanos)`` — one row per raw
    document, zero-gram docs at weight 0.

    Exactness contract (the BM25 fixed-point pattern): each BUCKET's
    log ratio is rounded into integer nano-units once, and per-doc
    scores are exact BIGINT sums of those — so the result is
    partitioning-independent and engine-portable (the md5 bucket hash
    and the double arithmetic reproduce in DuckDB; summation order
    cannot perturb an integer sum).

    Plan shape at 100 TB: two occurrence-scale bucket counts with
    map-side partials (the distributions), ONE broadcast of the
    ``buckets``-row weight table, one (doc, bucket)-keyed aggregate,
    one reduce to a row per doc. Nothing is driver-resident; the
    weight table is ``buckets`` rows by construction."""
    from confluent_kafka_vector_search_prompt_inference_spark.functions.text import word_tokens
    from confluent_kafka_vector_search_prompt_inference_spark.operators.repetition import _gram_col

    spark = raw.sparkSession
    b_lit = float(buckets)

    def occ(df: DataFrame) -> DataFrame:
        return df.select(
            F.col(id_col).alias("__id"),
            F.explode(_gram_col(word_tokens(text_col), n)).alias("__g"),
        ).select(
            "__id",
            hash_bucket(F.concat(F.lit("g#"), F.col("__g")), buckets).alias("__b"),
        )

    raw_occ = occ(raw)
    tgt_occ = occ(target)
    rc = raw_occ.groupBy("__b").agg(F.count("*").alias("__rc"))
    tc = tgt_occ.groupBy("__b").agg(F.count("*").alias("__tc"))
    rt = raw_occ.agg(F.count("*").alias("__rt"))
    tt = tgt_occ.agg(F.count("*").alias("__tt"))
    wb = (
        spark.range(buckets)
        .select(F.col("id").alias("__b"))
        .join(tc, "__b", "left")
        .join(rc, "__b", "left")
        .crossJoin(F.broadcast(tt))
        .crossJoin(F.broadcast(rt))
        .select(
            "__b",
            F.round(
                F.log(
                    (
                        (F.coalesce("__tc", F.lit(0)).cast("double") + F.lit(1.0))
                        / (F.col("__tt").cast("double") + F.lit(b_lit))
                    )
                    / (
                        (F.coalesce("__rc", F.lit(0)).cast("double") + F.lit(1.0))
                        / (F.col("__rt").cast("double") + F.lit(b_lit))
                    )
                )
                * F.lit(1e9)
            )
            .cast("bigint")
            .alias("__w"),
        )
    )
    dw = (
        raw_occ.groupBy("__id", "__b")
        .agg(F.count("*").alias("__c"))
        .join(F.broadcast(wb), "__b")
        .groupBy("__id")
        .agg(
            F.sum(F.col("__c") * F.col("__w")).alias("logw_nanos"),
            F.sum("__c").cast("bigint").alias("n_grams"),
        )
    )
    return (
        raw.select(F.col(id_col).alias("__id"))
        .join(dw, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            F.coalesce("n_grams", F.lit(0)).cast("bigint").alias("n_grams"),
            F.coalesce("logw_nanos", F.lit(0)).cast("bigint").alias("logw_nanos"),
        )
    )


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    k: int,
    n: int = 2,
    buckets: int = 8192,
    seed: str = "u#",
) -> DataFrame:
    """DSIR selection: Gumbel-top-k over the importance weights — the
    paper's sampling-without-replacement, made DETERMINISTIC by drawing
    each document's uniform from the md5 of its id (same doc, same
    draw, in any engine, at any parallelism). ``key = logw_nanos +
    round(gumbel(u) · 1e9)`` stays an exact BIGINT; the top-``k`` by
    key is a ``TakeOrderedAndProject`` (k-bounded, no global sort
    materialized). Returns ``(id_col, n_grams, logw_nanos,
    key_nanos)``, highest keys first, ties broken by ascending id."""
    w = dsir_importance_weights(
        raw, target, id_col, text_col, n=n, buckets=buckets
    )
    u = (
        hash_bucket(
            F.concat(F.lit(seed), F.col(id_col).cast("string")), 1_000_000
        ).cast("double")
        + F.lit(0.5)
    ) / F.lit(1_000_000.0)
    key = F.col("logw_nanos") + F.round(
        (-F.log(-F.log(u))) * F.lit(1e9)
    ).cast("bigint")
    return (
        w.withColumn("key_nanos", key)
        .orderBy(F.desc("key_nanos"), F.asc(id_col))
        .limit(k)
    )
