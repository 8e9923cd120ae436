"""Sampling / split / connected-components operators (SURVEY.md §2.11)."""

import pytest
from pyspark.sql import functions as F

from confluent_kafka_vector_search_prompt_inference_spark.operators.components import (
    connected_components,
    dedup_clusters,
)
from confluent_kafka_vector_search_prompt_inference_spark.operators.sampling import (
    dataset_split,
    hash_bucket,
    stratified_sample,
)


def test_dataset_split_deterministic_and_complete(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "k")
    s1 = dataset_split(df, "k", {"train": 0.8, "val": 0.1, "test": 0.1})
    s2 = dataset_split(df.repartition(7), "k", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r.split: r.n for r in s1.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 2000
    # proportions near the weights (content hash, not exact allocation)
    assert abs(counts["train"] / 2000 - 0.8) < 0.05
    assert abs(counts["val"] / 2000 - 0.1) < 0.03
    # identical assignment regardless of partitioning
    a = {r.k: r.split for r in s1.collect()}
    b = {r.k: r.split for r in s2.collect()}
    assert a == b


def test_dataset_split_duplicate_keys_never_straddle(spark):
    df = spark.createDataFrame([("x",), ("x",), ("y",)], "k string")
    out = dataset_split(df, "k", {"train": 0.5, "test": 0.5}).collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r.k, set()).add(r.split)
    assert all(len(v) == 1 for v in by_key.values())


def test_dataset_split_bad_weights_rejected(spark):
    import pytest

    df = spark.range(10)
    with pytest.raises(ValueError):
        dataset_split(df, "id", {"a": 0.5, "b": 0.2})


def test_hash_bucket_range(spark):
    df = spark.range(0, 500)
    rows = df.select(hash_bucket("id", 100).alias("b")).collect()
    assert all(0 <= r.b < 100 for r in rows)


def test_stratified_sample_fractions(spark):
    df = spark.range(0, 4000).select(
        (F.when(F.col("id") % 2 == 0, "a").otherwise("b")).alias("s"), "id"
    )
    out = stratified_sample(df, "s", {"a": 0.5, "b": 0.1}, seed=7)
    counts = {r.s: r.n for r in out.groupBy("s").agg(F.count("*").alias("n")).collect()}
    assert abs(counts["a"] / 2000 - 0.5) < 0.08
    assert abs(counts.get("b", 0) / 2000 - 0.1) < 0.05


def test_connected_components_two_clusters_and_chain(spark):
    # {1,2,3} triangle-ish, {10,11,12,13} chain — min label wins everywhere
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (10, 11), (11, 12), (12, 13)], "src bigint, dst bigint"
    )
    comp = {r.node: r.component for r in connected_components(edges).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 13: 10}


def test_dedup_clusters_singletons_kept(spark):
    pairs = spark.createDataFrame([(5, 3)], "id_a bigint, id_b bigint")
    ids = spark.createDataFrame([(1,), (3,), (5,)], "doc_id bigint")
    out = {r.id: (r.canonical_id, r.is_duplicate)
           for r in dedup_clusters(pairs, ids, "doc_id").collect()}
    assert out == {1: (1, False), 3: (3, False), 5: (3, True)}


def _star_cc(spark, edges):
    return connected_components(edges, algorithm="star")


def _ground_truth_components(pairs, n_nodes):
    # independent union-find oracle
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min-id canonical labels
    return {x: find(x) for x in range(n_nodes)}


def test_star_components_path_graph_converges_in_log_rounds(spark):
    """A 50-node path is the min-label worst case (Θ(n) rounds); the
    star algorithm must close it within an O(log n) iteration budget."""
    n = 50
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src bigint, dst bigint"
    )
    comp = {
        r.node: r.component
        for r in connected_components(edges, algorithm="star", max_iterations=8).collect()
    }
    assert comp == {i: 0 for i in range(n)}


@pytest.mark.slow
def test_star_equals_label_on_random_graphs(spark):
    """Property: star and min-label produce identical (node, component)
    maps, both matching a union-find oracle, across random graph shapes."""
    import random

    rng = random.Random(1234)
    for trial in range(4):
        n = rng.randint(10, 60)
        m = rng.randint(0, n * 2)
        pairs = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
        pairs = [(a, b) for a, b in pairs if a != b]
        if not pairs:
            continue
        edges = spark.createDataFrame(pairs, "src bigint, dst bigint")
        star = {
            r.node: r.component
            for r in connected_components(edges, algorithm="star").collect()
        }
        label = {
            r.node: r.component
            for r in connected_components(edges, algorithm="label").collect()
        }
        truth = _ground_truth_components(pairs, n)
        touched = {x for p in pairs for x in p}
        want = {x: truth[x] for x in touched}
        assert star == label == want, f"trial {trial} diverged"


def test_auto_escalates_to_star_on_long_path(spark):
    """algorithm='auto' with a tight label budget must still return exact
    components on a path longer than the budget — via star escalation."""
    n = 40
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src bigint, dst bigint"
    )
    comp = {
        r.node: r.component
        for r in connected_components(
            edges, algorithm="auto", label_round_budget=3, max_iterations=10
        ).collect()
    }
    assert comp == {i: 0 for i in range(n)}


# ---------------------------------------------------------------------------
# temperature_mix / epoch_shuffle
# ---------------------------------------------------------------------------

def _skewed_domains(spark):
    rows = (
        [(i, "head") for i in range(1600)]
        + [(1600 + i, "mid") for i in range(400)]
        + [(2000 + i, "tail") for i in range(100)]
    )
    return spark.createDataFrame(rows, "k bigint, dom string")


def test_temperature_mix_flattens_the_head(spark):
    from confluent_kafka_vector_search_prompt_inference_spark.operators.sampling import temperature_mix

    df = _skewed_domains(spark)
    out = temperature_mix(df, "dom", "k", budget_frac=0.5)
    kept = {r.dom: r.n for r in out.groupBy("dom").agg(F.count("*").alias("n")).collect()}
    src = {"head": 1600, "mid": 400, "tail": 100}
    rates = {d: kept.get(d, 0) / n for d, n in src.items()}
    # alpha=0.5 keeps proportionally MORE of the tail than the head
    assert rates["tail"] > rates["mid"] > rates["head"]
    # total lands near the budget (hash-Bernoulli, not exact allocation)
    total = sum(kept.values())
    assert abs(total - 1050) / 1050 < 0.1
    # head share shrinks toward sqrt-proportionality (1600/2100 = 76% of
    # rows, but sqrt weights give head 40/(40+20+10) = 57% of the budget)
    assert kept["head"] / total < 0.65


def test_temperature_mix_partition_invariant(spark):
    from confluent_kafka_vector_search_prompt_inference_spark.operators.sampling import temperature_mix

    df = _skewed_domains(spark)
    a = {r.k for r in temperature_mix(df, "dom", "k", budget_frac=0.5).collect()}
    b = {r.k for r in temperature_mix(df.repartition(13), "dom", "k", budget_frac=0.5).collect()}
    assert a == b


def test_temperature_mix_budget_one_keeps_tail_whole(spark):
    from confluent_kafka_vector_search_prompt_inference_spark.operators.sampling import temperature_mix

    df = _skewed_domains(spark)
    out = temperature_mix(df, "dom", "k", budget_frac=1.0)
    kept = {r.dom: r.n for r in out.groupBy("dom").agg(F.count("*").alias("n")).collect()}
    # p_tail = min(1, budget*w/n) hits the cap: every tail row survives
    assert kept["tail"] == 100


def test_temperature_mix_bad_budget_rejected(spark):
    import pytest

    from confluent_kafka_vector_search_prompt_inference_spark.operators.sampling import temperature_mix

    with pytest.raises(ValueError):
        temperature_mix(spark.range(5), "id", "id", budget_frac=0.0)


def test_epoch_shuffle_positions_contiguous_and_deterministic(spark):
    from confluent_kafka_vector_search_prompt_inference_spark.operators.sampling import epoch_shuffle

    df = spark.range(0, 1000).withColumnRenamed("id", "k")
    out = epoch_shuffle(df, "k", epoch=1, n_shards=8)
    rows = out.collect()
    assert len(rows) == 1000
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r.pos)
    assert set(by_shard) <= set(range(8))
    for positions in by_shard.values():
        assert sorted(positions) == list(range(1, len(positions) + 1))
    # identical order regardless of input partitioning
    again = {(r.k, r.shard, r.pos) for r in epoch_shuffle(df.repartition(7), "k", epoch=1, n_shards=8).collect()}
    assert again == {(r.k, r.shard, r.pos) for r in rows}


def test_epoch_shuffle_epochs_are_different_permutations(spark):
    from confluent_kafka_vector_search_prompt_inference_spark.operators.sampling import epoch_shuffle

    df = spark.range(0, 500).withColumnRenamed("id", "k")
    e1 = {r.k: (r.shard, r.pos) for r in epoch_shuffle(df, "k", epoch=1, n_shards=4).collect()}
    e2 = {r.k: (r.shard, r.pos) for r in epoch_shuffle(df, "k", epoch=2, n_shards=4).collect()}
    assert set(e1) == set(e2)  # same corpus
    moved = sum(1 for k in e1 if e1[k] != e2[k])
    assert moved > 400  # essentially every row lands elsewhere


def test_epoch_shuffle_bad_shards_rejected(spark):
    import pytest

    from confluent_kafka_vector_search_prompt_inference_spark.operators.sampling import epoch_shuffle

    with pytest.raises(ValueError):
        epoch_shuffle(spark.range(5), "id", epoch=1, n_shards=0)


def test_per_group_top_n_equals_single_window(spark):
    """Two-phase salted top-N is exactly the single-window result,
    including on a heavily skewed group (90% of rows in one key)."""
    import random

    from pyspark.sql import Window

    from confluent_kafka_vector_search_prompt_inference_spark.operators.sampling import per_group_top_n

    random.seed(3)
    rows = [
        ("hot" if i % 10 else f"g{i % 7}", i, random.random())
        for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "g string, id long, score double")
    got = per_group_top_n(
        df, ["g"], [F.desc("score"), F.asc("id")], 5, salt_key="id"
    )
    w = Window.partitionBy("g").orderBy(F.desc("score"), F.asc("id"))
    want = df.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= 5)
    g = {(r.g, r.id, r.rank) for r in got.collect()}
    e = {(r.g, r.id, r.rank) for r in want.collect()}
    assert g == e


def test_per_group_top_n_small_groups_complete(spark):
    """Groups smaller than n keep every row, ranked."""
    from confluent_kafka_vector_search_prompt_inference_spark.operators.sampling import per_group_top_n

    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 3)], "g string, id long"
    )
    out = per_group_top_n(df, ["g"], [F.asc("id")], 10, salt_key="id")
    assert out.count() == 3


def test_scalable_cumsum_equals_single_window(spark):
    """Two-phase range-partitioned cumsum == the unpartitioned-window
    cumsum on unique keys, across partition counts."""
    import random

    from pyspark.sql import Window

    from confluent_kafka_vector_search_prompt_inference_spark.operators.sampling import scalable_cumsum

    random.seed(9)
    rows = [(float(k), random.randint(1, 9)) for k in random.sample(range(10000), 500)]
    df = spark.createDataFrame(rows, "k double, c long")
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    want = {r.k: r.cum for r in df.withColumn("cum", F.sum("c").over(w)).collect()}
    for parts in (1, 4, 32):
        got = {
            r.k: r.cum
            for r in scalable_cumsum(df, "k", "c", n_parts=parts).collect()
        }
        assert got == want, parts


def test_per_group_top_n_requires_useful_salt_key(spark):
    """salt_key is mandatory and must vary within groups: omitting it or
    salting on a group column would silently collapse a hot group onto
    one salt, disabling the skew fan-out (round-4 advice)."""
    import pytest

    from confluent_kafka_vector_search_prompt_inference_spark.operators.sampling import per_group_top_n

    df = spark.createDataFrame([("a", 1)], "g string, id long")
    with pytest.raises(ValueError, match="requires salt_key"):
        per_group_top_n(df, ["g"], [F.asc("id")], 1)
    with pytest.raises(ValueError, match="group column"):
        per_group_top_n(df, ["g"], [F.asc("id")], 1, salt_key="g")


# ---------------------------------------------------------------------------
# DSIR importance resampling (round 12)
# ---------------------------------------------------------------------------

def test_dsir_weights_match_bruteforce(spark):
    """Engine weights equal a plain-Python mirror of the paper's
    hashed-bigram estimator (same md5 buckets, same smoothing, same
    nano-unit rounding) on a small corpus."""
    import hashlib
    import math

    from confluent_kafka_vector_search_prompt_inference_spark.operators.sampling import dsir_importance_weights

    raw_rows = [
        (1, "alpha beta gamma alpha beta"),
        (2, "delta epsilon zeta"),
        (3, "alpha beta alpha beta alpha"),
        (4, "x"),  # shorter than a bigram -> weight 0
    ]
    tgt_rows = [(10, "alpha beta gamma"), (11, "alpha beta")]
    B = 64
    raw = spark.createDataFrame(raw_rows, ["doc_id", "text"])
    tgt = spark.createDataFrame(tgt_rows, ["doc_id", "text"])
    got = {
        r.doc_id: (r.n_grams, r.logw_nanos)
        for r in dsir_importance_weights(raw, tgt, n=2, buckets=B).collect()
    }

    def bucket(g):
        return int(hashlib.md5(f"g#{g}".encode()).hexdigest()[:8], 16) % B

    def occs(rows):
        out = []
        for _, text in rows:
            w = text.split()
            out += [bucket(" ".join(w[i:i + 2])) for i in range(len(w) - 1)]
        return out

    ro, to = occs(raw_rows), occs(tgt_rows)
    wb = {}
    for b in range(B):
        pt = (to.count(b) + 1.0) / (len(to) + float(B))
        pr = (ro.count(b) + 1.0) / (len(ro) + float(B))
        wb[b] = round(math.log(pt / pr) * 1e9)
    for doc_id, text in raw_rows:
        w = text.split()
        grams = [" ".join(w[i:i + 2]) for i in range(len(w) - 1)]
        exp = sum(wb[bucket(g)] for g in grams)
        assert got[doc_id] == (len(grams), exp), doc_id


def test_dsir_self_target_is_flat_and_selection_deterministic(spark):
    """target == raw makes every bucket ratio 1 (weight exactly 0), and
    dsir_select is a pure function of ids — same top-k on re-run, keys
    descending, on-target docs outrank off-target ones."""
    from confluent_kafka_vector_search_prompt_inference_spark.operators.sampling import dsir_select, dsir_importance_weights

    rows = [(i, ("spark sql " * 5 if i % 2 else "cats dogs " * 5).strip())
            for i in range(20)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    flat = dsir_importance_weights(df, df, buckets=128)
    assert flat.filter(F.col("logw_nanos") != 0).count() == 0

    tgt = df.filter(F.col("doc_id") % 2 == 1)  # the "spark sql" half
    a = dsir_select(df, tgt, k=8, buckets=128).collect()
    b = dsir_select(df, tgt, k=8, buckets=128).collect()
    assert [r.doc_id for r in a] == [r.doc_id for r in b]
    keys = [r.key_nanos for r in a]
    assert keys == sorted(keys, reverse=True)
    # every selected doc is from the on-target half: the off-target
    # half's grams are heavily down-weighted
    assert all(r.doc_id % 2 == 1 for r in a)
