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
