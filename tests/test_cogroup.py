"""Cogrouped applyInPandas attribution vs an independent join-based oracle."""

from pyspark.sql import functions as F

from confluent_kafka_vector_search_prompt_inference_spark.operators.cogroup import conversion_lag_stats
from tests.conftest import load_events


def _events(spark):
    return load_events(spark, "/root/testdata/sf0.001")


def test_counts_and_lags_match_join_oracle(spark):
    ev = _events(spark)
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts")
    out = conversion_lag_stats(clicks, purchases).toPandas().set_index("user_id")

    # oracle: per purchase, latest prior click via join + window
    from pyspark.sql import Window

    j = purchases.alias("p").join(
        clicks.alias("c"),
        (F.col("p.user_id") == F.col("c.user_id")) & (F.col("c.ts") <= F.col("p.ts")),
        "left",
    )
    w = Window.partitionBy("p.user_id", "p.ts").orderBy(F.col("c.ts").desc())
    best = (
        j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("p.user_id").alias("user_id"),
            (F.unix_timestamp("p.ts") - F.unix_timestamp("c.ts")).alias("lag"),
        )
    )
    oracle = (
        best.groupBy("user_id")
        .agg(
            F.count("*").alias("n_purchases"),
            F.count("lag").alias("n_attributed"),
            F.avg("lag").alias("mean_lag_s"),
        )
        .toPandas()
        .set_index("user_id")
    )
    merged = out.join(oracle, rsuffix="_o", how="outer")
    assert (merged.n_purchases == merged.n_purchases_o).all()
    assert (merged.n_attributed == merged.n_attributed_o).all()
    both = merged.dropna(subset=["mean_lag_s", "mean_lag_s_o"])
    # pandas lag uses sub-second precision, the oracle whole seconds
    assert (both.mean_lag_s - both.mean_lag_s_o).abs().max() <= 1.0


def test_user_with_no_clicks_counts_unattributed(spark):
    rows_c = [(1, "2024-01-01 10:00:00")]
    rows_p = [(1, "2024-01-01 11:00:00"), (2, "2024-01-01 09:00:00")]
    clicks = spark.createDataFrame(rows_c, ["user_id", "ts"]).withColumn("ts", F.to_timestamp("ts"))
    purchases = spark.createDataFrame(rows_p, ["user_id", "ts"]).withColumn("ts", F.to_timestamp("ts"))
    out = {r.user_id: r for r in conversion_lag_stats(clicks, purchases).collect()}
    assert out[1].n_attributed == 1 and out[1].mean_lag_s == 3600.0
    assert out[2].n_purchases == 1 and out[2].n_attributed == 0
