"""Membership & overlap sketches (operators/membership.py): bloom
filter and KMV distinct sketch — merge laws, the no-false-negative
theorem, bounded state, layout independence, and estimator accuracy."""

import pytest
from pyspark.sql import functions as F

from confluent_kafka_vector_search_prompt_inference_spark.operators.membership import (
    bloom_build,
    bloom_contains,
    bloom_fp_bound,
    bloom_merge,
    kmv_distinct,
    kmv_merge,
    kmv_overlap,
    kmv_overlap_matrix,
    kmv_sketch,
)

M_BITS, K_HASH = 4096, 4


def _keys(spark, lo, hi, prefix="u"):
    return spark.range(lo, hi).select(
        F.concat(F.lit(prefix), F.col("id")).alias("k")
    )


# ---------------------------------------------------------------------------
# bloom
# ---------------------------------------------------------------------------


def test_bloom_no_false_negatives_and_bounded_state(spark):
    inserted = _keys(spark, 0, 500)
    bl = bloom_build(inserted, "k", m_bits=M_BITS, k=K_HASH)
    # state bound: at most m/32 packed words no matter how many keys
    assert bl.count() <= M_BITS // 32
    flagged = bloom_contains(bl, inserted, "k", m_bits=M_BITS, k=K_HASH)
    # every inserted key MUST test positive — a theorem, not a tendency
    assert flagged.filter(~F.col("bloom_member")).count() == 0


def test_bloom_fp_rate_within_theory(spark):
    n = 500
    bl = bloom_build(_keys(spark, 0, n), "k", m_bits=M_BITS, k=K_HASH)
    non_members = _keys(spark, 10_000, 12_000)
    fp = (
        bloom_contains(bl, non_members, "k", m_bits=M_BITS, k=K_HASH)
        .filter("bloom_member")
        .count()
    )
    rate = fp / 2000
    bound = (
        spark.range(1)
        .select(bloom_fp_bound(F.lit(n), m_bits=M_BITS, k=K_HASH).alias("b"))
        .collect()[0]
        .b
    )
    # kn/m ~ 0.49 -> bound ~ 2.2%; allow 3x for binomial noise at 2k probes
    assert rate <= bound * 3 + 0.01, (rate, bound)


def test_bloom_needed_words_reduction_preserves_membership(spark):
    """The small-probe/large-bloom reduction: semi-filtering the bloom
    to the probe's needed words before bloom_contains gives the exact
    same membership verdicts as the full bloom (dropped words are never
    looked up; absent words read as unset)."""
    from confluent_kafka_vector_search_prompt_inference_spark.operators.membership import bloom_needed_words

    bl = bloom_build(_keys(spark, 0, 400), "k", m_bits=M_BITS, k=K_HASH)
    probes = _keys(spark, 350, 450)  # straddles members and non-members
    need = bloom_needed_words(probes, "k", m_bits=M_BITS, k=K_HASH)
    assert need.count() <= 100 * K_HASH
    reduced = bl.join(F.broadcast(need), "word", "left_semi")
    full = bloom_contains(bl, probes, "k", m_bits=M_BITS, k=K_HASH)
    slim = bloom_contains(reduced, probes, "k", m_bits=M_BITS, k=K_HASH)
    assert full.exceptAll(slim).count() == 0
    assert slim.exceptAll(full).count() == 0


def test_bloom_merge_law(spark):
    a, b = _keys(spark, 0, 300), _keys(spark, 200, 600)
    merged = bloom_merge(
        bloom_build(a, "k", m_bits=M_BITS, k=K_HASH),
        bloom_build(b, "k", m_bits=M_BITS, k=K_HASH),
    )
    direct = bloom_build(a.unionByName(b), "k", m_bits=M_BITS, k=K_HASH)
    # merge(build(A), build(B)) == build(A ∪ B), word for word
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0
    # idempotent: re-merging a sketch with itself changes nothing
    twice = bloom_merge(direct, direct)
    assert twice.exceptAll(direct).count() == 0


def test_bloom_layout_independence(spark):
    keys = _keys(spark, 0, 400)
    one = bloom_build(keys.coalesce(1), "k", m_bits=M_BITS, k=K_HASH)
    many = bloom_build(keys.repartition(7), "k", m_bits=M_BITS, k=K_HASH)
    assert one.exceptAll(many).count() == 0
    assert many.exceptAll(one).count() == 0


def test_bloom_duplicate_probe_rows_preserved(spark):
    """Round 11: the probe is a map-side projection, so duplicate probe
    rows keep their multiplicity (the old explode+regroup shape
    collapsed them as a side effect of its shuffle)."""
    bl = bloom_build(_keys(spark, 0, 10), "k", m_bits=M_BITS, k=K_HASH)
    probes = _keys(spark, 0, 3).unionByName(_keys(spark, 0, 3))
    out = bloom_contains(bl, probes, "k", m_bits=M_BITS, k=K_HASH)
    assert out.count() == 6
    assert out.filter("bloom_member").count() == 6


def test_bloom_contains_probe_side_never_shuffles(spark):
    """The docstring's 100 TB claim, plan-asserted: with the bloom
    pre-materialized, the probe plan holds ZERO non-broadcast exchanges
    — k BroadcastHashJoins ANDed in a projection."""
    from confluent_kafka_vector_search_prompt_inference_spark.plans import formatted_plan

    bl = spark.createDataFrame(
        bloom_build(_keys(spark, 0, 200), "k", m_bits=M_BITS, k=K_HASH).collect(),
        "word int, bits long",
    )
    out = bloom_contains(bl, _keys(spark, 100, 400), "k", m_bits=M_BITS, k=K_HASH)
    plan = formatted_plan(out)
    data_exchanges = [
        line
        for line in plan.splitlines()
        if "Exchange" in line and "BroadcastExchange" not in line
    ]
    assert data_exchanges == [], plan
    # formatted explain prints each node in the tree AND the detail list
    import re

    assert len(re.findall(r"\(\d+\) BroadcastHashJoin", plan)) == K_HASH


def test_bloom_contains_matches_reference_regroup_shape(spark):
    """Equivalence vs the pre-round-11 explode+regroup implementation:
    same (key → member) verdicts on a mixed member/non-member probe set
    (the shapes may only differ in row multiplicity, checked above)."""
    inserted = _keys(spark, 0, 300)
    bl = bloom_build(inserted, "k", m_bits=M_BITS, k=K_HASH)
    probes = _keys(spark, 150, 600)

    # the old shape, inlined as the reference oracle
    key = F.col("k")
    from confluent_kafka_vector_search_prompt_inference_spark.operators.membership import _WORD_BITS, _bloom_pos

    fanned = probes.select(
        "*",
        F.explode(
            F.array(*[_bloom_pos(key, i, M_BITS) for i in range(K_HASH)])
        ).alias("pos"),
    ).select(
        "k",
        (F.col("pos") / F.lit(_WORD_BITS)).cast("int").alias("word"),
        (F.col("pos") % _WORD_BITS).cast("int").alias("__bit"),
    )
    ref = (
        fanned.join(F.broadcast(bl), "word", "left")
        .groupBy("k")
        .agg(
            F.min(
                F.expr("shiftright(coalesce(bits, 0L), __bit) % 2 = 1").cast("int")
            ).alias("__all")
        )
        .select("k", (F.col("__all") == 1).alias("bloom_member"))
    )
    got = {
        r["k"]: r["bloom_member"]
        for r in bloom_contains(bl, probes, "k", m_bits=M_BITS, k=K_HASH).collect()
    }
    want = {r["k"]: r["bloom_member"] for r in ref.collect()}
    assert got == want


# ---------------------------------------------------------------------------
# KMV
# ---------------------------------------------------------------------------


def test_kmv_exact_below_k(spark):
    small = _keys(spark, 0, 100)
    # duplicates must not inflate the count
    dups = small.unionByName(small)
    est = kmv_distinct(kmv_sketch(dups, "k", k=256), k=256).collect()[0]
    assert est.is_exact and est.n_distinct_est == 100.0


def test_kmv_estimate_accuracy(spark):
    n, k = 20_000, 512
    est = kmv_distinct(kmv_sketch(_keys(spark, 0, n), "k", k=k), k=k).collect()[0]
    assert not est.is_exact
    # relative standard error ~ 1/sqrt(k-2) ~ 4.4%; assert 4 sigma
    assert abs(est.n_distinct_est / n - 1) <= 4 / (k - 2) ** 0.5


def test_kmv_merge_law_and_layout_independence(spark):
    a, b = _keys(spark, 0, 3000), _keys(spark, 1500, 4500)
    merged = kmv_merge(
        kmv_sketch(a, "k", k=128), kmv_sketch(b, "k", k=128), k=128
    )
    direct = kmv_sketch(a.unionByName(b), "k", k=128)
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0
    shuffled = kmv_sketch(a.unionByName(b).repartition(11), "k", k=128)
    assert shuffled.exceptAll(direct).count() == 0


def test_kmv_grouped_matches_per_group_build(spark):
    rows = _keys(spark, 0, 2000).withColumn(
        "g", (F.expr("cast(substring(k, 2, 10) as int)") % 3).cast("string")
    )
    grouped = kmv_sketch(rows, "k", k=64, set_cols=["g"])
    for g in ("0", "1", "2"):
        alone = kmv_sketch(rows.filter(F.col("g") == g), "k", k=64)
        got = grouped.filter(F.col("g") == g).select("__h")
        assert got.exceptAll(alone.select("__h")).count() == 0
        assert alone.select("__h").exceptAll(got).count() == 0


def test_kmv_overlap_identical_and_disjoint_sets(spark):
    a = _keys(spark, 0, 5000)
    sa = kmv_sketch(a, "k", k=256)
    same = kmv_overlap(sa, sa, k=256).collect()[0]
    assert same.jaccard_est == 1.0
    assert same.d_intersect_est == same.d_union_est
    sb = kmv_sketch(_keys(spark, 50_000, 55_000), "k", k=256)
    disjoint = kmv_overlap(sa, sb, k=256).collect()[0]
    assert disjoint.jaccard_est == 0.0 and disjoint.d_intersect_est == 0.0


def test_kmv_overlap_estimates_true_jaccard(spark):
    # |A| = |B| = 6000, |A ∩ B| = 3000 -> union 9000, jaccard 1/3
    a, b = _keys(spark, 0, 6000), _keys(spark, 3000, 9000)
    ov = kmv_overlap(
        kmv_sketch(a, "k", k=512), kmv_sketch(b, "k", k=512), k=512
    ).collect()[0]
    assert abs(ov.jaccard_est - 1 / 3) <= 4 * (0.25 / 512) ** 0.5 + 0.01
    assert abs(ov.d_union_est / 9000 - 1) <= 4 / 510**0.5
    assert abs(ov.d_intersect_est / 3000 - 1) <= 0.25


def test_kmv_overlap_matrix_matches_pairwise(spark):
    """The all-pairs matrix must agree with kmv_overlap run pair by
    pair — same union sketch, same estimator arithmetic, same rounding."""
    rows = _keys(spark, 0, 4000).withColumn(
        "g", (F.expr("cast(substring(k, 2, 10) as int)") % 3).cast("string")
    )
    k = 128
    grouped = kmv_sketch(rows, "k", k=k, set_cols=["g"])
    matrix = {
        (r.set_a, r.set_b): r
        for r in kmv_overlap_matrix(grouped, k=k, set_col="g").collect()
    }
    assert set(matrix) == {("0", "1"), ("0", "2"), ("1", "2")}
    for a, b in matrix:
        sa = kmv_sketch(rows.filter(F.col("g") == a), "k", k=k)
        sb = kmv_sketch(rows.filter(F.col("g") == b), "k", k=k)
        pair = kmv_overlap(sa, sb, k=k).collect()[0]
        got = matrix[(a, b)]
        assert got.d_a_est == pair.d_a_est and got.d_b_est == pair.d_b_est
        assert got.d_union_est == pair.d_union_est
        assert got.d_intersect_est == pair.d_intersect_est
        assert got.jaccard_est == pair.jaccard_est


def test_kmv_small_sets_fully_exact_overlap(spark):
    # both sets below k: every estimate collapses to the exact value
    a, b = _keys(spark, 0, 60), _keys(spark, 40, 100)
    ov = kmv_overlap(
        kmv_sketch(a, "k", k=256), kmv_sketch(b, "k", k=256), k=256
    ).collect()[0]
    assert ov.d_a_est == 60.0 and ov.d_b_est == 60.0
    assert ov.d_union_est == 100.0
    assert ov.d_intersect_est == pytest.approx(20.0)
    assert ov.jaccard_est == pytest.approx(0.2)
    # an EMPTY side degrades to zeros, not nulls (union = the other side)
    se = kmv_sketch(a.filter("1=0"), "k", k=256)
    ove = kmv_overlap(kmv_sketch(a, "k", k=256), se, k=256).collect()[0]
    assert ove.d_b_est == 0.0 and ove.jaccard_est == 0.0
    assert ove.d_intersect_est == 0.0 and ove.d_union_est == 60.0


# ---------------------------------------------------------------------------
# grouped bloom (round 12)
# ---------------------------------------------------------------------------


def test_bloom_grouped_membership_is_per_group(spark):
    """set_cols builds one independent bloom per group: a key inserted
    under source A is a member of A's bloom (no false negatives, per
    group) and — at this width — a non-member of B's; NULL group keys
    are first-class through build AND probe (null-safe join)."""
    rows = spark.createDataFrame(
        [("a", f"k{i}") for i in range(200)]
        + [("b", f"x{i}") for i in range(200)]
        + [(None, f"z{i}") for i in range(50)],
        "src string, k string",
    )
    bloom = bloom_build(rows, "k", m_bits=1 << 16, k=K_HASH, set_cols=["src"])
    # bounded state per group
    per = {r["src"]: r["c"] for r in bloom.groupBy("src").agg(F.count("*").alias("c")).collect()}
    assert set(per) == {"a", "b", None}
    assert all(c <= (1 << 16) // 32 for c in per.values())
    # every inserted (group, key) probes TRUE
    got = bloom_contains(
        bloom, rows, "k", m_bits=1 << 16, k=K_HASH, set_cols=["src"]
    )
    assert got.filter(~F.col("bloom_member")).count() == 0
    # cross-group probes: a's keys against b's bloom read absent
    cross = rows.filter(F.col("src") == "a").withColumn("src", F.lit("b"))
    fp = bloom_contains(
        bloom, cross, "k", m_bits=1 << 16, k=K_HASH, set_cols=["src"]
    ).filter(F.col("bloom_member")).count()
    assert fp <= 5  # fp-rate sized, never systematic


def test_bloom_grouped_merge_law(spark):
    """Grouped merge = grouped build of the concatenation."""
    a = spark.createDataFrame([("s1", f"k{i}") for i in range(100)], "src string, k string")
    b = spark.createDataFrame(
        [("s1", f"m{i}") for i in range(100)] + [("s2", f"n{i}") for i in range(100)],
        "src string, k string",
    )
    merged = bloom_merge(
        bloom_build(a, "k", m_bits=M_BITS, k=K_HASH, set_cols=["src"]),
        bloom_build(b, "k", m_bits=M_BITS, k=K_HASH, set_cols=["src"]),
        set_cols=["src"],
    )
    direct = bloom_build(a.union(b), "k", m_bits=M_BITS, k=K_HASH, set_cols=["src"])
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))


def test_bloom_insert_grouped_stream_face(spark, tmp_path):
    """bloom_insert(set_cols=): per-source membership maintained online —
    two epochs land, read_corpus_bloom(set_cols) merges per group, and
    every landed (source, key) probes TRUE while cross-source probes
    stay fp-rate-bounded."""
    import os

    from confluent_kafka_vector_search_prompt_inference_spark.streaming.pipeline import (
        bloom_insert,
        file_stream_reader,
        read_corpus_bloom,
    )
    from pyspark.sql.types import StringType, StructField, StructType

    schema = StructType([StructField("src", StringType()), StructField("k", StringType())])
    srcdir = str(tmp_path / "src")
    sink = str(tmp_path / "sink")

    def run(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(srcdir)
        q = bloom_insert(
            file_stream_reader(spark, srcdir, schema),
            sink, str(tmp_path / "ckpt"),
            key_col="k", m_bits=M_BITS, k=K_HASH, set_cols=["src"],
            trigger_once=True,
        )
        q.awaitTermination(120)

    run([("a", f"k{i}") for i in range(50)])
    run([("b", f"x{i}") for i in range(50)] + [("a", "late1")])
    bloom = read_corpus_bloom(spark, sink, set_cols=["src"])
    probes = spark.createDataFrame(
        [("a", f"k{i}") for i in range(50)] + [("a", "late1")]
        + [("b", f"x{i}") for i in range(50)],
        schema,
    )
    got = bloom_contains(bloom, probes, "k", m_bits=M_BITS, k=K_HASH, set_cols=["src"])
    assert got.filter(~F.col("bloom_member")).count() == 0
    # b's keys are not members of a's bloom (beyond fp noise)
    cross = spark.createDataFrame([("a", f"x{i}") for i in range(50)], schema)
    fp = bloom_contains(
        bloom, cross, "k", m_bits=M_BITS, k=K_HASH, set_cols=["src"]
    ).filter(F.col("bloom_member")).count()
    assert fp <= 5
