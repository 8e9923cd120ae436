"""Count-min sketch: mergeability, overcount-only errors, bounded size."""

import pytest
from pyspark.sql import functions as F

from confluent_kafka_vector_search_prompt_inference_spark.operators.sketches import (
    countmin_build,
    countmin_lookup,
    countmin_merge,
)

DEPTH, WIDTH = 4, 64  # tiny width so collisions actually occur


@pytest.fixture(scope="module")
def toks(spark, docs):
    return docs.select(
        F.explode(
            F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != "")
        ).alias("term")
    ).persist()


def test_estimate_never_undercounts(spark, toks):
    sketch = countmin_build(toks, "term", depth=DEPTH, width=WIDTH)
    true = toks.groupBy("term").agg(F.count("*").alias("true_cnt"))
    est = countmin_lookup(sketch, true, "term", depth=DEPTH, width=WIDTH)
    bad = est.filter(F.col("est") < F.col("true_cnt")).count()
    assert bad == 0
    # with width=64 over a real vocabulary, at least one collision exists
    assert est.filter(F.col("est") > F.col("true_cnt")).count() > 0


def test_sketch_size_is_bounded(spark, toks):
    sketch = countmin_build(toks, "term", depth=DEPTH, width=WIDTH)
    assert sketch.count() <= DEPTH * WIDTH
    assert set(sketch.columns) == {"d", "bucket", "cnt"}


def test_merge_of_halves_equals_whole(spark, toks):
    """The streaming/daily-rollup contract: sketch(A ∪ B) ==
    merge(sketch(A), sketch(B)) cell-for-cell."""
    with_id = toks.withColumn("__i", F.monotonically_increasing_id())
    a = with_id.filter(F.col("__i") % 2 == 0)
    b = with_id.filter(F.col("__i") % 2 == 1)
    merged = countmin_merge(
        countmin_build(a, "term", depth=DEPTH, width=WIDTH),
        countmin_build(b, "term", depth=DEPTH, width=WIDTH),
    )
    whole = countmin_build(toks, "term", depth=DEPTH, width=WIDTH)
    diff = (
        merged.withColumnRenamed("cnt", "cnt_m")
        .join(whole, ["d", "bucket"], "full")
        .filter(
            F.coalesce("cnt_m", F.lit(-1)) != F.coalesce("cnt", F.lit(-2))
        )
        .count()
    )
    assert diff == 0


def test_weighted_build(spark):
    df = spark.createDataFrame(
        [("a", 5), ("a", 3), ("b", 2)], "term string, w long"
    )
    sketch = countmin_build(df, "term", depth=DEPTH, width=WIDTH, weight_col="w")
    q = spark.createDataFrame([("a",), ("b",), ("zz",)], "term string")
    out = {r.term: r.est for r in countmin_lookup(
        sketch, q, "term", depth=DEPTH, width=WIDTH
    ).collect()}
    assert out["a"] >= 8 and out["b"] >= 2
    # an unseen term can only be overcounted by collisions, never negative
    assert out["zz"] >= 0


# ---------------------------------------------------------------------------
# Bottom-m quantile sketch
# ---------------------------------------------------------------------------

from confluent_kafka_vector_search_prompt_inference_spark.operators.sketches import (  # noqa: E402
    quantile_sketch_build,
    quantile_sketch_merge,
    sample_quantiles,
)


@pytest.fixture(scope="module")
def skewed_vals(spark):
    # lognormal-ish skew: quantiles differ strongly from the mean, so a
    # wrong rank rule or a biased sample shows up as a big error
    return spark.range(20_000).select(
        F.col("id").alias("key"),
        F.round(F.exp(F.xxhash64("id") % 1000 / 250.0), 6).alias("v"),
    ).persist()


def test_quantile_sketch_bounded_and_deterministic(spark, skewed_vals):
    sk = quantile_sketch_build(skewed_vals, "v", "key", m=256)
    rows = sk.collect()
    assert len(rows) == 256
    # deterministic under physical layout — same sketch from a repartition
    again = quantile_sketch_build(skewed_vals.repartition(13), "v", "key", m=256)
    assert sorted((r["__h"], r["val"]) for r in rows) == sorted(
        (r["__h"], r["val"]) for r in again.collect()
    )


def test_quantile_estimates_within_sampling_error(spark, skewed_vals):
    """Nearest-rank estimates off the m=1024 sample sit within a few
    standard errors (sqrt(q(1-q)/m) in RANK space) of the exact
    quantile's rank."""
    import math

    n = skewed_vals.count()
    exact_sorted = [r.v for r in skewed_vals.orderBy("v", "key").collect()]
    sk = quantile_sketch_build(skewed_vals, "v", "key", m=1024)
    est = {r.q: r.est for r in sample_quantiles(sk, [0.25, 0.5, 0.9, 0.99]).collect()}
    for q, e in est.items():
        # rank of the estimate within the EXACT distribution
        import bisect

        rank_lo = bisect.bisect_left(exact_sorted, e) / (n - 1)
        rank_hi = bisect.bisect_right(exact_sorted, e) / (n - 1)
        tol = 5 * math.sqrt(q * (1 - q) / 1024) + 1e-9
        assert rank_lo - tol <= q <= rank_hi + tol, (q, e, rank_lo, rank_hi, tol)


def test_quantile_sketch_merge_law_and_dedup(spark, skewed_vals):
    """bottom-m(A ∪ B) == merge(bottom-m(A), bottom-m(B)); re-merging an
    identical delta (an epoch replay) changes nothing."""
    a = skewed_vals.filter("key % 2 = 0")
    b = skewed_vals.filter("key % 2 = 1")
    whole = quantile_sketch_build(skewed_vals, "v", "key", m=128)
    merged = quantile_sketch_merge(
        quantile_sketch_build(a, "v", "key", m=128),
        quantile_sketch_build(b, "v", "key", m=128),
        m=128,
    )
    key = lambda df: sorted((r["__h"], r["val"]) for r in df.collect())  # noqa: E731
    assert key(whole) == key(merged)
    replayed = quantile_sketch_merge(
        merged, quantile_sketch_build(a, "v", "key", m=128), m=128
    )
    assert key(replayed) == key(merged)


def test_grouped_quantile_sketch_matches_per_group_build(spark, skewed_vals):
    """A grouped sketch equals building one ungrouped sketch per group;
    the grouped merge law holds with replay dedup."""
    g = skewed_vals.withColumn("grp", (F.col("key") % 3).cast("int"))
    grouped = quantile_sketch_build(g, "v", "key", m=64, group_cols=["grp"])
    key = lambda df: sorted(  # noqa: E731
        (r["grp"], r["__h"], r["val"]) for r in df.collect()
    )
    per_group = []
    for i in range(3):
        per_group.append(
            quantile_sketch_build(g.filter(F.col("grp") == i), "v", "key", m=64)
            .withColumn("grp", F.lit(i))
        )
    assert key(grouped) == key(
        per_group[0].unionByName(per_group[1]).unionByName(per_group[2])
    )
    halves = [g.filter("key % 2 = 0"), g.filter("key % 2 = 1")]
    merged = quantile_sketch_merge(
        *[
            quantile_sketch_build(h, "v", "key", m=64, group_cols=["grp"])
            for h in halves
        ],
        m=64,
        group_cols=["grp"],
    )
    assert key(merged) == key(grouped)
    replayed = quantile_sketch_merge(
        merged,
        quantile_sketch_build(halves[0], "v", "key", m=64, group_cols=["grp"]),
        m=64,
        group_cols=["grp"],
    )
    assert key(replayed) == key(grouped)
    # grouped estimates: one (q, est) pair per group, ests from the
    # group's own sample
    ests = sample_quantiles(grouped, [0.5], group_cols=["grp"]).collect()
    assert {r["grp"] for r in ests} == {0, 1, 2} and len(ests) == 3


# ---------------------------------------------------------------------------
# Round 9: KLL-style deterministic-error quantile sketch


def _kll_rank_window(spark, items_df, est, bound, q, n):
    """True-rank interval of ``est`` in the exact data vs the target."""
    import math

    lo = items_df.filter(F.col("v") < est).count()
    hi = items_df.filter(F.col("v") <= est).count()
    target = math.floor(q * (n - 1)) + 1
    return lo - bound <= target <= hi + bound


def test_kll_sketch_deterministic_and_weight_exact(spark, skewed_vals):
    from confluent_kafka_vector_search_prompt_inference_spark.operators.sketches import kll_sketch_build

    sk = kll_sketch_build(skewed_vals, "v", "key", k=128)
    rows = sk.collect()
    n = skewed_vals.count()
    # total represented weight is EXACTLY the input row count
    assert sum(2 ** r["level"] for r in rows if r["level"] >= 0) == n
    # exactly one meta row carrying the tracked bound
    metas = [r for r in rows if r["level"] == -1]
    assert len(metas) == 1 and metas[0]["val"] > 0
    # layout-independent: a pure function of the input SET
    again = kll_sketch_build(skewed_vals.repartition(13), "v", "key", k=128)
    assert sorted((r["level"], r["val"], r["__h"]) for r in rows) == sorted(
        (r["level"], r["val"], r["__h"]) for r in again.collect()
    )


def test_kll_bound_is_deterministic_guarantee(spark, skewed_vals):
    """The tracked rank-error ceiling HOLDS against the exact data for
    every quantile — a hard check, no probabilistic slack — and is tight
    enough to be useful (a vacuous bound of ~n would also 'hold')."""
    from confluent_kafka_vector_search_prompt_inference_spark.operators.sketches import (
        kll_quantiles,
        kll_sketch_build,
    )

    sk = kll_sketch_build(skewed_vals, "v", "key", k=128)
    for r in kll_quantiles(sk, [0.25, 0.5, 0.9, 0.99]).collect():
        assert _kll_rank_window(
            spark, skewed_vals, r["est"], r["err_rank_bound"], r["q"], r["n"]
        ), r
        assert r["err_rank_bound"] <= 0.10 * r["n"], r  # non-vacuous at k=128


def test_kll_merge_law(spark, skewed_vals):
    """merge(build(A), build(B)) is a valid sketch of A ∪ B: exact total
    weight, bounds ADD (the merged ceiling ≥ each part's, still a hard
    guarantee against the union), and estimates honor it."""
    from confluent_kafka_vector_search_prompt_inference_spark.operators.sketches import (
        kll_quantiles,
        kll_sketch_build,
        kll_sketch_merge,
    )

    a = skewed_vals.filter("key < 10000")
    b = skewed_vals.filter("key >= 10000")
    merged = kll_sketch_merge(
        kll_sketch_build(a, "v", "key", k=128),
        kll_sketch_build(b, "v", "key", k=128),
        k=128,
    )
    n = skewed_vals.count()
    rows = merged.collect()
    assert sum(2 ** r["level"] for r in rows if r["level"] >= 0) == n
    for r in kll_quantiles(merged, [0.5, 0.99]).collect():
        assert r["n"] == n
        assert _kll_rank_window(
            spark, skewed_vals, r["est"], r["err_rank_bound"], r["q"], r["n"]
        ), r


def test_kll_grouped_build(spark, skewed_vals):
    """Per-group sketches: exact per-group weight, per-group bounds hold."""
    from confluent_kafka_vector_search_prompt_inference_spark.operators.sketches import (
        kll_quantiles,
        kll_sketch_build,
    )

    g = skewed_vals.withColumn("grp", (F.col("key") % 3).cast("string"))
    sk = kll_sketch_build(g, "v", "key", k=64, group_cols=["grp"])
    for r in kll_quantiles(sk, [0.9], group_cols=["grp"]).collect():
        part = g.filter(F.col("grp") == r["grp"])
        assert r["n"] == part.count()
        assert _kll_rank_window(
            spark, part, r["est"], r["err_rank_bound"], r["q"], r["n"]
        ), r


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters
# ---------------------------------------------------------------------------

def _zipf_items(spark, n_rows=6000, seed=0):
    """Deterministic Zipf-ish stream: item 'h{j}' appears ~n/(j+1) times —
    real heavy hitters, unlike the uniform testdata."""
    return spark.range(n_rows).selectExpr(
        f"concat('h', cast(floor(pow(pmod(xxhash64(id, {seed}), 100000) / 100000.0, 3) * 40) as int)) as item"
    )


def _mg_invariants(spark, items, k):
    from confluent_kafka_vector_search_prompt_inference_spark.operators.sketches import mg_sketch, mg_summary

    summ = mg_summary(mg_sketch(items, "item", k=k), k=k).collect()
    exact = {r["item"]: r["cnt"] for r in items.groupBy("item").count().withColumnRenamed("count", "cnt").collect()}
    n_true = sum(exact.values())
    assert summ, "summary empty"
    bound = summ[0]["bound"]
    n = summ[0]["n"]
    assert n == n_true
    est = {r["item"]: r["est"] for r in summ}
    assert len(est) <= k
    for it, e in est.items():
        assert e <= exact[it], (it, e, exact[it])          # never overcounts
        assert exact[it] - e <= bound, (it, e, exact[it], bound)
    # EVERY item (retained or not) is within bound, and every true-heavy
    # item is retained
    for it, c in exact.items():
        assert c - est.get(it, 0) <= bound, (it, c, bound)
        if c > bound:
            assert it in est, f"heavy item {it} (true {c} > bound {bound}) missing"
    return est, bound, n


def test_mg_exact_when_vocab_fits(spark):
    from confluent_kafka_vector_search_prompt_inference_spark.operators.sketches import mg_sketch, mg_summary

    items = spark.range(1000).selectExpr("concat('v', pmod(id, 10)) as item")
    summ = {r["item"]: r for r in mg_summary(mg_sketch(items, "item", k=64), k=64).collect()}
    assert len(summ) == 10
    assert all(r["est"] == 100 and r["bound"] == 0 for r in summ.values())


def test_mg_zipf_guarantees_hold_under_any_layout(spark):
    items = _zipf_items(spark)
    for parts in (3, 17):
        est, bound, n = _mg_invariants(spark, items.repartition(parts), k=16)
        assert bound > 0  # decrements genuinely fired at k=16
        assert est  # and heavies survived them


def test_mg_merge_law_additive_bounds(spark):
    """Summary over the UNION of two halves' raw sketches = the merge;
    its guarantees hold against the WHOLE stream's exact counts, and n
    adds exactly."""
    from confluent_kafka_vector_search_prompt_inference_spark.operators.sketches import mg_sketch, mg_summary

    items = _zipf_items(spark, n_rows=8000)
    a = items.filter(F.pmod(F.xxhash64("item"), F.lit(2)) == 0)
    b = items.filter(F.pmod(F.xxhash64("item"), F.lit(2)) == 1)
    merged = mg_summary(
        mg_sketch(a, "item", k=16).unionByName(mg_sketch(b, "item", k=16)),
        k=16,
    ).collect()
    exact = {r["item"]: r["cnt"] for r in items.groupBy("item").count().withColumnRenamed("count", "cnt").collect()}
    bound = merged[0]["bound"]
    assert merged[0]["n"] == sum(exact.values())
    est = {r["item"]: r["est"] for r in merged}
    for it, c in exact.items():
        assert est.get(it, 0) <= c
        assert c - est.get(it, 0) <= bound
        if c > bound:
            assert it in est


# ---------------------------------------------------------------------------
# AMS / tug-of-war F2
# ---------------------------------------------------------------------------

def test_ams_merge_law_and_layout_independence(spark):
    from confluent_kafka_vector_search_prompt_inference_spark.operators.sketches import ams_merge, ams_sketch

    items = spark.range(4000).selectExpr("concat('w', pmod(id, 50)) as item")
    whole = {r["j"]: r["s"] for r in ams_sketch(items, "item", depth=8).collect()}
    a = items.filter(F.col("id") % 2 == 0)
    b = items.filter(F.col("id") % 2 == 1)
    merged = {
        r["j"]: r["s"]
        for r in ams_merge(
            ams_sketch(a, "item", depth=8), ams_sketch(b, "item", depth=8)
        ).collect()
    }
    assert merged == whole  # deterministic signs: halves ADD exactly
    relay = {
        r["j"]: r["s"]
        for r in ams_sketch(items.repartition(13), "item", depth=8).collect()
    }
    assert relay == whole  # pure function of the multiset


def test_ams_f2_estimates_selfjoin_size(spark):
    from confluent_kafka_vector_search_prompt_inference_spark.operators.sketches import ams_f2, ams_sketch

    # skewed: one hot key dominates F2, so a sign-sketch must see it
    items = spark.range(5000).selectExpr(
        "CASE WHEN id % 2 = 0 THEN 'hot' ELSE concat('c', id) END AS item"
    )
    true_f2 = (
        items.groupBy("item").count().selectExpr("sum(count * count) f").collect()[0]["f"]
    )
    est = ams_f2(ams_sketch(items, "item", depth=17)).collect()[0]["f2_est"]
    assert abs(est - true_f2) / true_f2 < 0.5, (est, true_f2)
    # weighted build equals unweighted over pre-aggregated counts
    from confluent_kafka_vector_search_prompt_inference_spark.operators.sketches import ams_merge  # noqa: F401

    agg = items.groupBy("item").agg(F.count("*").alias("w"))
    from confluent_kafka_vector_search_prompt_inference_spark.operators.sketches import ams_sketch as _sk

    sk_w = {r["j"]: r["s"] for r in _sk(agg, "item", depth=17, weight_col="w").collect()}
    sk_u = {r["j"]: r["s"] for r in _sk(items, "item", depth=17).collect()}
    assert sk_w == sk_u


def test_ams_f2_row_sums_square_in_double_not_bigint(spark):
    """A tail S_j near (or past) sqrt(BIGINT_MAX) must not wrap: the
    squaring runs in DOUBLE (IEEE-identical in Spark and DuckDB), so an
    s=4e9 row contributes +1.6e19 to its group mean instead of the
    two's-complement garbage the old BIGINT multiply produced."""
    from confluent_kafka_vector_search_prompt_inference_spark.operators.sketches import ams_f2

    rows = [(j, 4_000_000_000 if j == 0 else 0) for j in range(8)]
    rows += [(j, 1_000_000_000) for j in range(8, 16)]
    sketch = spark.createDataFrame(rows, "j int, s long")
    est = ams_f2(sketch, group=8).collect()[0]["f2_est"]
    # group 0 mean = 1.6e19/8 = 2e18; group 1 mean = 1e18; median = 1.5e18
    assert est == int(1.5e18), est


def test_mg_grouped_guarantees_per_group(spark):
    """Round 11 grouped MG: every Misra-Gries guarantee holds PER GROUP
    (est <= true; true - est <= bound; every item with true > bound
    retained; n exact per group; <= k counters per group), with the
    (k+1)-th-largest resolved through a group-keyed window, no driver
    collect."""
    from confluent_kafka_vector_search_prompt_inference_spark.operators.sketches import mg_sketch, mg_summary

    k = 8
    # two groups with different skew: group a's hot item is 'h', group
    # b's is 'g'; long tails force decrements at k=8
    items = spark.range(6000).selectExpr(
        "CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END AS grp",
        """CASE
             WHEN id % 2 = 0 AND id % 3 = 0 THEN 'h'
             WHEN id % 2 = 1 AND id % 3 = 0 THEN 'g'
             ELSE concat('t', pmod(id, 97))
           END AS item""",
    )
    summ = mg_summary(
        mg_sketch(items, "item", k=k, group_cols=["grp"]),
        k=k, group_cols=["grp"],
    )
    rows = summ.collect()
    true = {
        (r["grp"], r["item"]): r["c"]
        for r in items.groupBy("grp", "item").agg(F.count("*").alias("c")).collect()
    }
    n_true = {
        r["grp"]: r["c"]
        for r in items.groupBy("grp").agg(F.count("*").alias("c")).collect()
    }
    per_group: dict = {}
    for r in rows:
        per_group.setdefault(r["grp"], []).append(r)
        assert r["est"] <= true[(r["grp"], r["item"])]
        assert true[(r["grp"], r["item"])] - r["est"] <= r["bound"]
        assert r["n"] == n_true[r["grp"]]
    assert set(per_group) == {"a", "b"}
    for grp, rs in per_group.items():
        assert len(rs) <= k
        bound = rs[0]["bound"]
        retained = {r["item"] for r in rs}
        for (g2, it), c in true.items():
            if g2 == grp and c > bound:
                assert it in retained, (grp, it, c, bound)
        # the hot item clears the bound and must be retained
        hot = "h" if grp == "a" else "g"
        assert hot in retained


def test_mg_grouped_merge_law_preserves_guarantees(spark):
    """Union of two grouped raw sketches reduced once = a valid merged
    summary: guarantees still hold per group and n adds exactly."""
    from confluent_kafka_vector_search_prompt_inference_spark.operators.sketches import mg_sketch, mg_summary

    k = 6
    items = spark.range(4000).selectExpr(
        "CASE WHEN id % 2 = 0 THEN 'x' ELSE 'y' END AS grp",
        "CASE WHEN id % 5 = 0 THEN 'hot' ELSE concat('t', pmod(id, 53)) END AS item",
    )
    a = items.filter(F.col("id") < 2000)
    b = items.filter(F.col("id") >= 2000)
    merged = mg_summary(
        mg_sketch(a, "item", k=k, group_cols=["grp"]).unionByName(
            mg_sketch(b, "item", k=k, group_cols=["grp"])
        ),
        k=k, group_cols=["grp"],
    ).collect()
    true = {
        (r["grp"], r["item"]): r["c"]
        for r in items.groupBy("grp", "item").agg(F.count("*").alias("c")).collect()
    }
    n_true = {
        r["grp"]: r["c"]
        for r in items.groupBy("grp").agg(F.count("*").alias("c")).collect()
    }
    assert merged
    for r in merged:
        assert r["est"] <= true[(r["grp"], r["item"])]
        assert true[(r["grp"], r["item"])] - r["est"] <= r["bound"]
        assert r["n"] == n_true[r["grp"]]


def test_mg_grouped_null_group_is_first_class(spark):
    """Round 12 (advice r11): grouped builds deliberately KEEP null
    group keys, so the summary/compact reductions must not lose them to
    null-unsafe joins — a NULL-grp item set gets the same per-group
    guarantees as any other group, through both the raw reduction and
    a compact round-trip."""
    from confluent_kafka_vector_search_prompt_inference_spark.operators.sketches import (
        mg_compact,
        mg_sketch,
        mg_summary,
    )

    k = 6
    items = spark.range(3000).selectExpr(
        "CASE WHEN id % 3 = 0 THEN 'a' WHEN id % 3 = 1 THEN NULL ELSE 'b' END AS grp",
        "CASE WHEN id % 5 = 0 THEN 'hot' ELSE concat('t', pmod(id, 41)) END AS item",
    )
    true = {
        (r["grp"], r["item"]): r["c"]
        for r in items.groupBy("grp", "item").agg(F.count("*").alias("c")).collect()
    }
    n_true = {
        r["grp"]: r["c"]
        for r in items.groupBy("grp").agg(F.count("*").alias("c")).collect()
    }
    raw = mg_sketch(items, "item", k=k, group_cols=["grp"])

    def _check(summ_rows):
        per: dict = {}
        for r in summ_rows:
            per.setdefault(r["grp"], []).append(r)
            assert r["est"] <= true[(r["grp"], r["item"])]
            assert true[(r["grp"], r["item"])] - r["est"] <= r["bound"]
            assert r["n"] == n_true[r["grp"]]
        # the null group is PRESENT with a full guarantee set
        assert set(per) == {"a", "b", None}
        for grp, rs in per.items():
            assert len(rs) <= k
            bound = rs[0]["bound"]
            retained = {r["item"] for r in rs}
            for (g2, it), c in true.items():
                if g2 == grp and c > bound:
                    assert it in retained, (grp, it, c, bound)
            assert "hot" in retained

    _check(mg_summary(raw, k=k, group_cols=["grp"]).collect())
    # compact must also carry the null group (its meta row included),
    # and summary-of-compact keeps every guarantee
    compacted = mg_compact(raw, k=k, group_cols=["grp"])
    metas = compacted.filter(F.col("item").isNull() & (F.col("n") > 0)).collect()
    assert {r["grp"] for r in metas} == {"a", "b", None}
    _check(mg_summary(compacted, k=k, group_cols=["grp"]).collect())


def test_kll_grouped_null_group_is_first_class(spark):
    """Same advice item, KLL face: a NULL group key survives the
    grouped quantile join (est + err bound rows present for it)."""
    from confluent_kafka_vector_search_prompt_inference_spark.operators.sketches import (
        kll_quantiles,
        kll_sketch_build,
    )

    g = spark.range(2000).selectExpr(
        "CASE WHEN id % 2 = 0 THEN 'x' ELSE NULL END AS grp",
        "id AS key",
        "CAST(id AS DOUBLE) AS v",
    )
    sk = kll_sketch_build(g, "v", "key", k=64, group_cols=["grp"])
    rows = kll_quantiles(sk, [0.5], group_cols=["grp"]).collect()
    got = {r["grp"]: r for r in rows}
    assert set(got) == {"x", None}
    for r in rows:
        assert r["n"] == 1000
        assert r["err_rank_bound"] >= 0
        # median of each group's ~uniform ids sits mid-range
        assert 200.0 <= r["est"] <= 1800.0


def test_ams_f2_bigint_overflow_fails_loudly(spark):
    """Round 12 (advice r11): past F2 ~ 2^63 the estimate's BIGINT
    narrow RAISES on the engine side (matching the DuckDB oracle's
    conversion error) instead of Spark's silent non-ANSI NULL; below
    the boundary the value is unchanged."""
    from confluent_kafka_vector_search_prompt_inference_spark.operators.sketches import ams_f2

    # |S_j| = 3e9 -> S^2 = 9e18 < 2^63: fine, exact floor
    ok = spark.createDataFrame(
        [(j, 3_000_000_000) for j in range(8)], "j int, s long"
    )
    assert ams_f2(ok, group=8).collect()[0]["f2_est"] == 9_000_000_000_000_000_000

    # |S_j| = 4e9 -> S^2 = 1.6e19 >= 2^63: loud failure on BOTH engines
    over = spark.createDataFrame(
        [(j, 4_000_000_000) for j in range(8)], "j int, s long"
    )
    with pytest.raises(Exception, match="BIGINT range"):
        ams_f2(over, group=8).collect()


def test_mg_grouped_overflow_cap_preserves_guarantees(spark):
    """Round 12 escape hatch: with max_groups_per_partition set far
    below the group cardinality, overflow groups SPILL exact
    batch-preaggregated rows instead of holding state — and every MG
    guarantee still holds for every group, spilled or tracked. Spilled
    groups' partition decrement is zero, so their bound comes only from
    the summary's own t (never looser than the uncapped build)."""
    from confluent_kafka_vector_search_prompt_inference_spark.operators.sketches import mg_sketch, mg_summary

    k = 6
    n_groups = 40
    # hot fires once per 4 rows WITHIN each group (pmod(id,160)<40 hits
    # every group each 160-id cycle) — every group owns a heavy hitter,
    # so every group must survive into the summary
    items = spark.range(8000).selectExpr(
        f"concat('g', pmod(id, {n_groups})) AS grp",
        "CASE WHEN pmod(id, 160) < 40 THEN 'hot' ELSE concat('t', pmod(id, 29)) END AS item",
    ).coalesce(2)
    true = {
        (r["grp"], r["item"]): r["c"]
        for r in items.groupBy("grp", "item").agg(F.count("*").alias("c")).collect()
    }
    n_true = {
        r["grp"]: r["c"]
        for r in items.groupBy("grp").agg(F.count("*").alias("c")).collect()
    }
    summ = mg_summary(
        mg_sketch(
            items, "item", k=k, group_cols=["grp"],
            max_groups_per_partition=5,
        ),
        k=k, group_cols=["grp"],
    ).collect()
    per: dict = {}
    for r in summ:
        per.setdefault(r["grp"], []).append(r)
        assert r["est"] <= true[(r["grp"], r["item"])]
        assert true[(r["grp"], r["item"])] - r["est"] <= r["bound"]
        assert r["n"] == n_true[r["grp"]], (r["grp"], r["n"], n_true[r["grp"]])
    # no group vanished: overflow spills, it never drops
    assert set(per) == {f"g{i}" for i in range(n_groups)}
    for grp, rs in per.items():
        assert len(rs) <= k
        bound = rs[0]["bound"]
        retained = {r["item"] for r in rs}
        for (g2, it), c in true.items():
            if g2 == grp and c > bound:
                assert it in retained, (grp, it, c, bound)
        assert "hot" in retained


def test_mg_overflow_cap_argument_validation(spark):
    from confluent_kafka_vector_search_prompt_inference_spark.operators.sketches import mg_sketch

    df = spark.range(10).selectExpr("'a' AS grp", "CAST(id AS STRING) AS item")
    with pytest.raises(ValueError, match="grouped build"):
        mg_sketch(df, "item", k=4, max_groups_per_partition=5)
    with pytest.raises(ValueError, match=">= 1"):
        mg_sketch(df, "item", k=4, group_cols=["grp"], max_groups_per_partition=0)


# ---------------------------------------------------------------------------
# grouped count-min (round 12 — one sketch per group)
# ---------------------------------------------------------------------------

def test_grouped_cm_matches_per_group_builds(spark):
    """A grouped build is exactly the per-group builds stacked: filtering
    the grouped sketch to one group's rows gives the same cells as
    building over that group alone — and estimates answer against the
    group's OWN sketch, so a term flooded in group A cannot inflate
    group B beyond B's own collisions."""
    rows = (
        [("a", "x")] * 50 + [("a", "y")] * 3
        + [("b", "x")] * 2 + [("b", "z")] * 7
    )
    df = spark.createDataFrame(rows, ["src", "term"])
    g = countmin_build(df, "term", depth=DEPTH, width=WIDTH, group_cols=["src"])
    for s in ("a", "b"):
        solo = countmin_build(
            df.filter(F.col("src") == s), "term", depth=DEPTH, width=WIDTH
        )
        stacked = g.filter(F.col("src") == s).drop("src")
        diff = (
            stacked.withColumnRenamed("cnt", "c2")
            .join(solo, ["d", "bucket"], "full")
            .filter(F.coalesce("cnt", F.lit(-1)) != F.coalesce("c2", F.lit(-2)))
            .count()
        )
        assert diff == 0
    true = df.groupBy("src", "term").agg(F.count("*").alias("true_cnt"))
    est = countmin_lookup(
        g, true, "term", depth=DEPTH, width=WIDTH, group_cols=["src"]
    )
    rows_out = {(r.src, r.term): (r.true_cnt, r.est) for r in est.collect()}
    # never undercounts, per group
    assert all(e >= t for t, e in rows_out.values())
    # "x" has 50 hits in a but only 2 in b: b's estimate comes from b's
    # sketch (7+2 tokens total), so it is bounded by b's corpus size —
    # proof the groups are independent
    assert rows_out[("b", "x")][1] <= 9
    assert rows_out[("a", "x")][1] >= 50


def test_grouped_cm_merge_law_and_null_group(spark):
    """Merge across an arbitrary row split equals the one-shot grouped
    build (associative cells), and a NULL group key keeps its own
    sketch — lookups against it hit via null-safe equality."""
    rows = [
        (i, "a" if i < 5 else None, "x" if i < 16 else "q")
        for i in range(18)
    ]  # a: 5×"x"; null group: 11×"x" + 2×"q"
    df = spark.createDataFrame(rows, ["i", "src", "term"])
    half1, half2 = df.filter(F.col("i") < 9), df.filter(F.col("i") >= 9)
    merged = countmin_merge(
        countmin_build(half1, "term", depth=DEPTH, width=WIDTH, group_cols=["src"]),
        countmin_build(half2, "term", depth=DEPTH, width=WIDTH, group_cols=["src"]),
        group_cols=["src"],
    )
    whole = countmin_build(df, "term", depth=DEPTH, width=WIDTH, group_cols=["src"])
    # compare via collected dicts — a plain join(on=[cols]) would drop
    # the null group's rows under null-unsafe equality
    m = {(r.src, r.d, r.bucket): r.cnt for r in merged.collect()}
    w = {(r.src, r.d, r.bucket): r.cnt for r in whole.collect()}
    assert m == w and len(w) > 0
    true = df.groupBy("src", "term").agg(F.count("*").alias("true_cnt"))
    est = countmin_lookup(
        whole, true, "term", depth=DEPTH, width=WIDTH, group_cols=["src"]
    )
    out = {(r.src, r.term): r.est for r in est.collect()}
    assert out[(None, "x")] >= 11  # null group answered from its own sketch
    assert out[("a", "x")] == 5  # a's sketch holds only its 5 tokens
