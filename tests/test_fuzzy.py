"""Fuzzy blocking join: edit-distance bounds, blocking recall, no
all-pairs explosion."""

from pyspark.sql import functions as F

from confluent_kafka_vector_search_prompt_inference_spark.operators.fuzzy import blocked_levenshtein_self_join


def _recs(spark, rows):
    return spark.createDataFrame(rows, "id bigint, name string")


def test_finds_typo_pairs(spark):
    rows = [
        (1, "acme widgets inc"),
        (2, "acme widgets incx"),   # dist 1 from 1
        (3, "acme widgetz inc"),    # dist 1 from 1
        (4, "zenith gears ltd"),
        (5, "totally different co"),
    ]
    out = blocked_levenshtein_self_join(
        _recs(spark, rows), id_col="id", text_col="name", max_dist=2
    ).toPandas()
    pairs = set(zip(out.id_a, out.id_b))
    assert (1, 2) in pairs and (1, 3) in pairs
    assert all(4 not in p and 5 not in p for p in pairs)
    assert (out.dist <= 2).all()


def test_exact_duplicates_dist_zero(spark):
    rows = [(1, "red widget"), (2, "red widget"), (3, "blue bolt")]
    out = blocked_levenshtein_self_join(
        _recs(spark, rows), id_col="id", text_col="name", max_dist=2
    ).toPandas()
    assert set(zip(out.id_a, out.id_b, out.dist)) == {(1, 2, 0)}


def test_blocking_requires_shared_rare_token(spark):
    # names within dist 2 but sharing NO token: the documented recall
    # trade-off — blocked join must NOT return them
    rows = [(1, "ab cd"), (2, "ab ce"), (3, "xy zw")]
    out = blocked_levenshtein_self_join(
        _recs(spark, rows), id_col="id", text_col="name", max_dist=4
    ).toPandas()
    pairs = set(zip(out.id_a, out.id_b))
    assert (1, 2) in pairs            # share token 'ab'
    assert all(3 not in p for p in pairs)


def test_candidate_count_bounded_by_blocks(spark):
    # 40 records, two families; candidates stay family-local
    rows = [(i, f"alpha beta{i % 4} v{i}") for i in range(20)] + [
        (100 + i, f"gamma delta{i % 4} w{i}") for i in range(20)
    ]
    out = blocked_levenshtein_self_join(
        _recs(spark, rows), id_col="id", text_col="name", max_dist=10
    ).toPandas()
    assert len(out) > 0
    assert not ((out.id_a < 100) & (out.id_b >= 100)).any()


def test_sorted_neighborhood_prefix_similarity(spark):
    from confluent_kafka_vector_search_prompt_inference_spark.operators.fuzzy import sorted_neighborhood_self_join

    rows = [
        (1, "acme corp"),
        (2, "acme corpx"),      # sorts adjacent to 1, dist 1
        (3, "acme corq"),       # adjacent-ish, dist 1 from 1
        (4, "zenith ltd"),
        (5, "acme corp"),       # exact dup of 1 (same key)
    ]
    out = sorted_neighborhood_self_join(
        _recs(spark, rows), id_col="id", text_col="name", window=3, max_dist=2
    ).toPandas()
    pairs = set(zip(out.id_a, out.id_b))
    assert (1, 2) in pairs and (1, 3) in pairs and (2, 3) in pairs
    assert (1, 5) in pairs          # same-key record group
    assert all(4 not in p for p in pairs)
    assert (out.id_a < out.id_b).all()
    d = dict(zip(zip(out.id_a, out.id_b), out.dist))
    assert d[(1, 5)] == 0 and d[(1, 2)] == 1


def test_sorted_neighborhood_window_limits_candidates(spark):
    from confluent_kafka_vector_search_prompt_inference_spark.operators.fuzzy import sorted_neighborhood_self_join

    # keys sort as k00..k19; with window=1 only adjacent keys compare
    rows = [(i, f"k{i:02d}") for i in range(20)]
    out = sorted_neighborhood_self_join(
        _recs(spark, rows), id_col="id", text_col="name", window=1, max_dist=4
    ).toPandas()
    assert (out.id_b - out.id_a == 1).all()
    assert len(out) == 19


def test_sorted_neighborhood_id_order_independent_of_key_order(spark):
    from confluent_kafka_vector_search_prompt_inference_spark.operators.fuzzy import sorted_neighborhood_self_join

    # record with the LARGER id sorts FIRST by key: pair must still appear
    rows = [(10, "aab"), (2, "aac")]
    out = sorted_neighborhood_self_join(
        _recs(spark, rows), id_col="id", text_col="name", window=1, max_dist=2
    ).toPandas()
    assert set(zip(out.id_a, out.id_b)) == {(2, 10)}
    assert out.name_a.iloc[0] == "aac" and out.name_b.iloc[0] == "aab"
