"""Portable membership & overlap sketches as plain DataFrames.

Not in the reference (SURVEY.md §2.11 — extension surface). Two sketch
families a 100 TB curation pipeline keeps ACROSS jobs and days, rounding
out the sketch shelf beside count-min (frequencies), bottom-m /
KLL (quantiles), and HLL (per-query distinct counts):

- **Bloom filter** — "have we seen this key before?" cheaper than the
  key set. The canonical use is cross-day gating: yesterday's seen-URL
  bloom filters today's crawl BEFORE the exact anti-join, so the join's
  big side shrinks by the already-seen fraction at the cost of a
  broadcast-sized bitmap (false positives only ever cause a redundant
  exact check — never a lost row).
- **KMV (k-minimum-values) distinct sketch** — distinct counts WITH SET
  ALGEBRA (Bayer/Haas/Reinwald/Sismanis, SIGMOD 2007; Beyer et al.,
  "On synopses for distinct-value estimation"). HLL answers "how many
  distinct"; KMV additionally answers "how many SHARED" — union,
  intersection, and Jaccard between two corpora (two crawl snapshots,
  two source mixes) from two k-row sketches, no join over the corpora.

Design choices (same discipline as ``operators/sketches.py`` — the
sketch is *deterministic and engine-portable*, so the oracle can
recompute it EXACTLY, not just tolerance-check it):

- Both sketches ARE DataFrames, not opaque binary blobs: the bloom is
  ``(word INT, bits BIGINT)`` — the bit array packed 32 bits per word,
  at most ``m_bits/32`` rows regardless of how many keys were inserted
  — and the KMV sketch is the ``k`` rows whose seed-prefixed md5 hash
  is smallest. Queryable, joinable, mergeable with one line of SQL.
- Hashes are the repo-standard md5 buckets
  (:func:`~confluent_kafka_vector_search_prompt_inference_spark.operators.sampling.hash_bucket` for bloom positions; the 60-bit
  ``md5('v#' || key)`` rank for KMV), identical in any engine with md5.
- Build is one ``groupBy().agg(bit_or)`` (bloom) / one dedup + bottom-k
  (KMV) — map-side partial aggregation bounds the shuffle at the
  SKETCH size per map task, so the 100 TB build cost is the scan.
- Merge is union + re-aggregate: bloom OR is associative/commutative/
  idempotent, and bottom-k(A ∪ B) = bottom-k(bottom-k(A) ∪ bottom-k(B))
  — per-day sketches fold into per-month sketches losslessly.

Guarantees: the bloom has NO false negatives ever; its false-positive
rate after ``n`` distinct inserts is ≈ ``(1 - e^(-k·n/m))^k`` (size at
``m ≈ 10·n`` bits with ``k=4`` for ~1.2%). The KMV estimate
``(k-1)/U_(k)`` (``U_(k)`` = k-th smallest hash normalized to (0,1])
is unbiased with relative standard error ``~1/sqrt(k-2)`` (±6.3% at
k=256), and is EXACT whenever the set has fewer than ``k`` distinct
keys (the sketch then holds every hash). Intersection and Jaccard come
from the union sketch: the k smallest hashes of A ∪ B are a uniform
sample of its distinct keys, so the fraction of them present in BOTH
input sketches estimates ``|A ∩ B| / |A ∪ B|``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from confluent_kafka_vector_search_prompt_inference_spark.operators.sampling import hash_bucket

#: bits per packed bloom word. 32 (not 64) so ``1 << bit`` never touches
#: a BIGINT's sign bit — the packed value stays non-negative and the
#: shift/AND arithmetic is identical in Spark and DuckDB with no
#: two's-complement edge case at bit 63.
_WORD_BITS = 32

#: the KMV hash space: 60-bit ranks (15 hex digits of md5), the same
#: space as the bottom-m quantile sketch's rank hash
_KMV_SPACE = float(1 << 60)


def _bloom_pos(key: Column, i: int, m_bits: int) -> Column:
    """Bit position of ``key`` under hash function ``i`` — md5 of the
    seed-prefixed key (DuckDB twin:
    ``('0x' || substring(md5('b{i}#' || CAST(key AS VARCHAR)), 1, 8))::UBIGINT % m_bits``)."""
    return hash_bucket(F.concat(F.lit(f"b{i}#"), key.cast("string")), m_bits)


def bloom_build(
    items: DataFrame,
    key_col: str,
    *,
    m_bits: int = 1 << 16,
    k: int = 4,
    set_cols: list[str] | None = None,
) -> DataFrame:
    """Build a bloom filter over ``key_col``.

    Returns ``(word INT, bits BIGINT)`` — at most ``m_bits/32`` rows
    total (words whose 32 bits are all zero are simply absent). One
    ``groupBy(word).agg(bit_or)``: map-side partial aggregation bounds
    the shuffle at ``m_bits/32`` rows per map task, so the build cost
    over a 100 TB key column is the scan, not the wire. Duplicate input
    keys are free (OR is idempotent) — no distinct pass needed.

    ``set_cols`` (round 12) builds one INDEPENDENT bloom per group —
    ``(set_cols…, word, bits)``, ≤ ``m_bits/32`` rows per group — the
    per-source membership form (each source's seen-URL bitmap in one
    table, the KMV ``set_cols`` sibling). NULL group keys are
    first-class groups (Spark ``groupBy`` keeps them; the grouped
    :func:`bloom_contains` joins them null-safely)."""
    sc = list(set_cols or [])
    key = F.col(key_col)
    pos = F.explode(
        F.array(*[_bloom_pos(key, i, m_bits).alias(f"p{i}") for i in range(k)])
    ).alias("pos")
    rows = items.select(*sc, pos).select(
        *sc,
        (F.col("pos") / F.lit(_WORD_BITS)).cast("int").alias("word"),
        # SQL form: the PySpark wrapper wants a literal shift count, the
        # SQL function takes a column
        F.expr(f"shiftleft(1L, cast(pos % {_WORD_BITS} as int))").alias("__bit"),
    )
    return rows.groupBy(*sc, "word").agg(F.bit_or("__bit").alias("bits"))


def bloom_merge(
    *blooms: DataFrame, set_cols: list[str] | None = None
) -> DataFrame:
    """Merge blooms built with identical ``(m_bits, k)``: union + OR.
    Associative, commutative, idempotent — the daily-rollup merge is
    this one line, and re-merging yesterday's sketch is a no-op.
    Grouped blooms merge per group (pass the build's ``set_cols``)."""
    sc = list(set_cols or [])
    out = blooms[0]
    for b in blooms[1:]:
        out = out.unionByName(b)
    return out.groupBy(*sc, "word").agg(F.bit_or("bits").alias("bits"))


def bloom_contains(
    bloom: DataFrame,
    probes: DataFrame,
    key_col: str,
    *,
    m_bits: int = 1 << 16,
    k: int = 4,
    set_cols: list[str] | None = None,
) -> DataFrame:
    """Append ``bloom_member BOOLEAN`` to ``probes``: TRUE iff every one
    of the key's ``k`` bits is set. The sketch side (≤ ``m_bits/32``
    rows) gets the broadcast; the probe side keeps its scan parallelism
    and is NEVER shuffled — this is the shape that lets a bitmap of
    yesterday's keys gate a 100 TB probe column in one map-side pass.

    Shape (round 11): the k bit tests run as k broadcast hash joins on
    the packed word id, ANDed in one projection — a pure map-side chain
    (plan-asserted: zero non-broadcast exchanges on the probe side). The
    previous implementation exploded k rows per probe and REGROUPED on
    the probe's full column tuple — a full shuffle of the probe table
    that contradicted the docstring's own scale claim in the
    corpus-probe regime (harmless only where the probe side was
    batch-sized). Row multiplicity is preserved: duplicate probe rows
    each keep their row (the old shape collapsed them as a side effect
    of the regroup). No false negatives, ever: a key that was inserted
    has all its bits set by construction.

    For a STORE-SCALED bloom (100+ MB packed) probed by a SMALL batch,
    semi-reduce it with :func:`bloom_needed_words` first so the k
    broadcasts ship ≤ ``|probes|·k`` words instead of the full bitmap.

    ``set_cols`` (round 12) probes a GROUPED build: each probe row
    tests membership in ITS OWN group's bloom — the k broadcast joins
    key on ``(set_cols…, word)`` with NULL-SAFE group equality (a null
    group key was a real group at build time; a null-unsafe join would
    read every one of its keys as absent = false negatives). Same
    zero-shuffle probe-side shape."""
    sc = list(set_cols or [])
    key = F.col(key_col)
    cols = list(probes.columns)
    out = probes
    hits = []
    for i in range(k):
        wn, bn, btn = f"__blw{i}", f"__blbits{i}", f"__blb{i}"
        # one md5 per hash function: materialize the position, derive
        # word + bit from it, drop it (the optimizer would otherwise be
        # free to compute the hash twice)
        out = (
            out.withColumn("__blpos", _bloom_pos(key, i, m_bits))
            .withColumn(wn, (F.col("__blpos") / F.lit(_WORD_BITS)).cast("int"))
            .withColumn(btn, (F.col("__blpos") % _WORD_BITS).cast("int"))
            .drop("__blpos")
        )
        if sc:
            bl = F.broadcast(
                bloom.select(
                    *[F.col(c).alias(f"__bls{i}_{j}") for j, c in enumerate(sc)],
                    F.col("word").alias(wn),
                    F.col("bits").alias(bn),
                )
            )
            cond = out[wn] == bl[wn]
            for j, c in enumerate(sc):
                cond = cond & out[c].eqNullSafe(bl[f"__bls{i}_{j}"])
            out = out.join(bl, cond, "left").drop(
                bl[wn], *[bl[f"__bls{i}_{j}"] for j in range(len(sc))]
            )
        else:
            out = out.join(
                F.broadcast(
                    bloom.select(F.col("word").alias(wn), F.col("bits").alias(bn))
                ),
                wn,
                "left",
            )
        hits.append(F.expr(f"shiftright(coalesce({bn}, 0L), {btn}) % 2 = 1"))
    member = hits[0]
    for h in hits[1:]:
        member = member & h
    return out.select(*cols, member.alias("bloom_member"))


def bloom_needed_words(
    probes: DataFrame,
    key_col: str,
    *,
    m_bits: int = 1 << 16,
    k: int = 4,
) -> DataFrame:
    """The distinct packed-word ids a probe set will touch —
    ``(word INT)``, at most ``|probes|·k`` rows. The small-probe /
    LARGE-bloom regime's reduction: :func:`bloom_contains` broadcasts
    the bloom, which is right when the bloom is sketch-sized and the
    probe column is a corpus — but a store-sized auto-grown bloom
    (100+ MB packed) must NOT ship to every task for a batch-sized
    probe set. Semi-join the bloom down to these words first (the words
    dropped are never looked up; absent words read as unset bits, so
    membership semantics are unchanged), then broadcast the ≤
    ``|probes|·k``-row remainder. Do NOT use this when the probe side
    is the corpus: the distinct here would shuffle it."""
    key = F.col(key_col)
    return (
        probes.select(
            F.explode(
                F.array(*[_bloom_pos(key, i, m_bits) for i in range(k)])
            ).alias("pos")
        )
        .select((F.col("pos") / F.lit(_WORD_BITS)).cast("int").alias("word"))
        .distinct()
    )


def bloom_fp_bound(n_inserted: Column, *, m_bits: int, k: int) -> Column:
    """The standard false-positive-rate ceiling ``(1 - e^(-k·n/m))^k``
    after ``n_inserted`` distinct keys — a Column so a query can grade
    its measured rate against theory inside the plan (and an oracle can
    recompute the identical double)."""
    return F.pow(
        F.lit(1.0)
        - F.exp(
            (F.lit(-float(k)) * n_inserted.cast("double")) / F.lit(float(m_bits))
        ),
        F.lit(float(k)),
    )


# ---------------------------------------------------------------------------
# KMV distinct sketch with set algebra
# ---------------------------------------------------------------------------


def kmv_hash(key: Column | str) -> Column:
    """60-bit deterministic KMV rank of a key: the first 15 hex digits
    of ``md5('v#' || key)`` as BIGINT. Seed-prefixed so it is
    independent of the quantile sketch's ``'q#'`` rank family. DuckDB
    twin: ``('0x' || substring(md5('v#' || CAST(key AS VARCHAR)), 1, 15))::UBIGINT``."""
    c = F.col(key) if isinstance(key, str) else key
    return F.conv(
        F.substring(F.md5(F.concat(F.lit("v#"), c.cast("string"))), 1, 15), 16, 10
    ).cast("bigint")


def kmv_sketch(
    items: DataFrame,
    key_col: str,
    *,
    k: int = 256,
    set_cols: list[str] | None = None,
) -> DataFrame:
    """Build a KMV sketch: the ``k`` smallest distinct key hashes,
    ``(set_cols…, __h BIGINT)`` — one independent sketch per
    ``set_cols`` group when given (per-source overlap matrices).

    Duplicate keys collapse via ``dropDuplicates`` on the hash (the
    hash is a function of the key; a 60-bit collision between two
    DISTINCT keys under-counts by one — ~2⁻⁶⁰ per pair, the same
    accepted risk as the quantile sketch). The bottom-k itself reuses
    the quantile sketch's scale shape: grouped builds run the salted
    TWO-PHASE window (phase 1 ranks within ``(set, pmod(__h, 64))`` so
    a heavy group spreads over 64 tasks; any row of the true bottom-k
    survives its salt slice's bottom-k), ungrouped builds plan a
    TakeOrdered over a ≤64-partition narrow projection."""
    rows = items.select(
        *(set_cols or []), kmv_hash(F.col(key_col)).alias("__h")
    ).dropDuplicates([*(set_cols or []), "__h"])
    if set_cols:
        from pyspark.sql import Window

        w1 = Window.partitionBy(*set_cols, F.pmod(F.col("__h"), F.lit(64))).orderBy(
            "__h"
        )
        partial = (
            rows.withColumn("__rn", F.row_number().over(w1))
            .filter(F.col("__rn") <= k)
            .drop("__rn")
        )
        w2 = Window.partitionBy(*set_cols).orderBy("__h")
        return (
            partial.withColumn("__rn", F.row_number().over(w2))
            .filter(F.col("__rn") <= k)
            .drop("__rn")
        )
    # bound the TakeOrdered fan-in (driver merges k rows per partition)
    # WITHOUT an RDD-conversion probe: after dropDuplicates the partition
    # count is at most the session's shuffle partitions, so the conf — a
    # free lookup — is the bound the old rdd.getNumPartitions() call
    # forced a conversion plan per invocation to learn
    if int(items.sparkSession.conf.get("spark.sql.shuffle.partitions")) > 64:
        rows = rows.repartition(64)
    return rows.orderBy("__h").limit(k)


def kmv_merge(
    *sketches: DataFrame, k: int = 256, set_cols: list[str] | None = None
) -> DataFrame:
    """Merge sketches built with the same seed and ``k``: union, drop
    duplicate hashes (the same key arriving via two sketches counts
    once — distinct-count semantics), re-cap at bottom-k. Associative
    and commutative; the result is exactly ``kmv_sketch`` of the
    concatenated inputs."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    out = out.dropDuplicates([*(set_cols or []), "__h"])
    if set_cols:
        from pyspark.sql import Window

        w = Window.partitionBy(*set_cols).orderBy("__h")
        return (
            out.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k)
            .drop("__rn")
        )
    return out.orderBy("__h").limit(k)


def kmv_distinct(
    sketch: DataFrame, *, k: int = 256, set_cols: list[str] | None = None
) -> DataFrame:
    """Distinct-count estimate per sketch: ``(set_cols…, n_distinct_est
    DOUBLE, is_exact BOOLEAN)``. A sketch holding fewer than ``k`` rows
    saw its WHOLE key set — the estimate is then the exact count; at
    ``k`` rows the estimator is ``(k-1) · 2^60 / h_(k)`` (unbiased,
    relative standard error ~1/sqrt(k-2))."""
    grp = sketch.groupBy(*(set_cols or [])) if set_cols else sketch.groupBy()
    agg = grp.agg(F.count("__h").alias("__n"), F.max("__h").alias("__hk"))
    est = F.when(
        F.col("__n") < k, F.col("__n").cast("double")
    ).otherwise(F.lit(float(k - 1)) * F.lit(_KMV_SPACE) / F.col("__hk").cast("double"))
    return agg.select(
        *(set_cols or []),
        F.round(est, 4).alias("n_distinct_est"),
        (F.col("__n") < k).alias("is_exact"),
    )


def kmv_overlap_matrix(
    sketches: DataFrame, *, k: int = 256, set_col: str = "set"
) -> DataFrame:
    """Pairwise set algebra across ALL sets from one grouped sketch
    table (``kmv_sketch(..., set_cols=[set_col])``): one row per
    unordered pair ``set_a < set_b`` with ``d_a_est, d_b_est,
    d_union_est, d_intersect_est, jaccard_est`` — the "which sources
    duplicate each other's content" matrix a corpus audit wants,
    computed WITHOUT touching the corpora.

    Shape: one aggregation per (pair, hash) builds each pair's union
    rows WITH side-membership flags (dedup and membership in the same
    groupBy), a pair-keyed window re-caps at bottom-k, and a final
    pair-keyed aggregation emits the estimates. Work is bounded by
    sketches, not data: |pairs| · 2k rows — 20 sources → ~190·2k; at
    thousands of sets, pre-filter the pair list (e.g. by a cheap
    per-set signature) before calling, like any all-pairs stage."""
    from pyspark.sql import Window

    sk = sketches.select(F.col(set_col).alias("__s"), "__h")
    sets = sk.select("__s").distinct()
    pairs = (
        sets.select(F.col("__s").alias("set_a"))
        .join(sets.select(F.col("__s").alias("set_b")))
        .filter(F.col("set_a") < F.col("set_b"))
    )
    # per-set stats -> per-set distinct estimate (sketch-sized, broadcast)
    d_est = kmv_distinct(
        sk.withColumnRenamed("__s", set_col), k=k, set_cols=[set_col]
    ).select(F.col(set_col).alias("__s"), F.col("n_distinct_est").alias("__d"))
    # pair union rows with side-membership, dedup by hash in the same agg
    rows = (
        F.broadcast(pairs)
        .join(sk, (F.col("__s") == F.col("set_a")) | (F.col("__s") == F.col("set_b")))
        .groupBy("set_a", "set_b", "__h")
        .agg(
            F.max((F.col("__s") == F.col("set_a")).cast("int")).alias("__in_a"),
            F.max((F.col("__s") == F.col("set_b")).cast("int")).alias("__in_b"),
        )
    )
    w = Window.partitionBy("set_a", "set_b").orderBy("__h")
    capped = rows.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= k)
    stats = capped.groupBy("set_a", "set_b").agg(
        F.count("__h").alias("__ku"),
        F.max("__h").alias("__hk"),
        F.sum(F.col("__in_a") * F.col("__in_b")).alias("__kb"),
    )
    d_union = F.when(
        F.col("__ku") < k, F.col("__ku").cast("double")
    ).otherwise(F.lit(float(k - 1)) * F.lit(_KMV_SPACE) / F.col("__hk").cast("double"))
    jac = F.col("__kb").cast("double") / F.col("__ku").cast("double")
    return (
        stats.join(
            F.broadcast(d_est.select(F.col("__s").alias("set_a"), F.col("__d").alias("d_a_est"))),
            "set_a",
        )
        .join(
            F.broadcast(d_est.select(F.col("__s").alias("set_b"), F.col("__d").alias("d_b_est"))),
            "set_b",
        )
        .select(
            "set_a",
            "set_b",
            "d_a_est",
            "d_b_est",
            F.round(d_union, 4).alias("d_union_est"),
            F.round(jac * F.round(d_union, 4), 4).alias("d_intersect_est"),
            F.round(jac, 4).alias("jaccard_est"),
        )
    )


def kmv_overlap(a: DataFrame, b: DataFrame, *, k: int = 256) -> DataFrame:
    """Set algebra between two (ungrouped) sketches — ONE row:
    ``d_a_est, d_b_est, d_union_est, d_intersect_est, jaccard_est``
    (DOUBLEs, rounded to 4 decimals so the engine/oracle float paths
    agree bit-for-bit).

    The union sketch (merge of the two, re-capped) is a KMV sketch of
    A ∪ B, and its rows are a uniform hash-sample of the union's
    distinct keys — so the fraction of them found in BOTH input
    sketches estimates Jaccard, and ``jaccard · |A ∪ B|`` estimates the
    intersection (Beyer et al., SIGMOD 2007). Every input here is
    ≤ k rows: the whole computation broadcasts, whatever the corpora
    weighed."""
    ua = kmv_merge(a, b, k=k)
    in_a = ua.join(F.broadcast(a.select("__h")), "__h", "semi")
    in_both = in_a.join(F.broadcast(b.select("__h")), "__h", "semi")

    def _d(sk: DataFrame, name: str) -> DataFrame:
        return kmv_distinct(sk, k=k).select(F.col("n_distinct_est").alias(name))

    stats = (
        ua.groupBy()
        .agg(F.count("__h").alias("__ku"))
        .crossJoin(in_both.groupBy().agg(F.count("__h").alias("__kb")))
        .crossJoin(_d(a, "d_a_est"))
        .crossJoin(_d(b, "d_b_est"))
        .crossJoin(_d(ua, "d_union_est"))
    )
    jac = F.col("__kb").cast("double") / F.col("__ku").cast("double")
    return stats.select(
        "d_a_est",
        "d_b_est",
        "d_union_est",
        F.round(jac * F.col("d_union_est"), 4).alias("d_intersect_est"),
        F.round(jac, 4).alias("jaccard_est"),
    )
