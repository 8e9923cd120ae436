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
