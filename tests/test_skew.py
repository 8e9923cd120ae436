"""Salted join: identical results to a plain join, spread over salts."""

from pyspark.sql import functions as F

from confluent_kafka_vector_search_prompt_inference_spark.operators.skew import salted_join


def test_salted_join_matches_plain(spark, sf_smoke):
    orders = spark.read.parquet(f"{sf_smoke}/orders.parquet")
    cust = spark.read.parquet(f"{sf_smoke}/customer.parquet").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    plain = orders.join(cust, "o_custkey").select("o_orderkey", "c_name")
    salted = salted_join(orders, cust, "o_custkey", salt=8).select("o_orderkey", "c_name")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_hot_keys_only(spark, sf_smoke):
    orders = spark.read.parquet(f"{sf_smoke}/orders.parquet")
    cust = spark.read.parquet(f"{sf_smoke}/customer.parquet").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    hot = [r.o_custkey for r in orders.groupBy("o_custkey").count().orderBy(F.desc("count")).limit(3).collect()]
    plain = orders.join(cust, "o_custkey").select("o_orderkey", "c_name")
    salted = salted_join(orders, cust, "o_custkey", salt=4, hot_keys=hot).select(
        "o_orderkey", "c_name"
    )
    assert plain.count() == salted.count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
