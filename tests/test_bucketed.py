"""Bucketed tables: the co-located join truly has no shuffle, and results
match the plain join."""

import pytest
from pyspark.sql import functions as F

from confluent_kafka_vector_search_prompt_inference_spark.plans import formatted_plan
from confluent_kafka_vector_search_prompt_inference_spark.sources.bucketed import write_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_smoke):
    # warehouse dir is static (set in session.py defaults → /tmp)
    orders = spark.read.parquet(f"{sf_smoke}/orders.parquet")
    li = spark.read.parquet(f"{sf_smoke}/lineitem.parquet")
    write_bucketed(orders, "orders_b", ["o_orderkey"], n_buckets=8)
    write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"), "lineitem_b",
        ["o_orderkey"], n_buckets=8,
    )
    yield
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
    try:
        joined = spark.table("lineitem_b").join(spark.table("orders_b"), "o_orderkey")
        plan = formatted_plan(joined)
        assert "Exchange" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_bucketed_join_matches_plain(spark, sf_smoke, bucketed_tables):
    plain = (
        spark.read.parquet(f"{sf_smoke}/lineitem.parquet")
        .join(
            spark.read.parquet(f"{sf_smoke}/orders.parquet"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .count()
    )
    bucketed = spark.table("lineitem_b").join(spark.table("orders_b"), "o_orderkey").count()
    assert plain == bucketed


def test_bucketed_agg_skips_shuffle(spark, bucketed_tables):
    agg = spark.table("lineitem_b").groupBy("o_orderkey").agg(F.count("*").alias("n"))
    plan = formatted_plan(agg)
    assert "Exchange" not in plan, plan
