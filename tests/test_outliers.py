"""Grouped-map applyInPandas outlier scoring vs an exact built-in oracle."""

import numpy as np
from pyspark.sql import functions as F

from confluent_kafka_vector_search_prompt_inference_spark.operators.outliers import label_centroid_outliers


def test_distances_match_explode_based_computation(spark, embeddings):
    out = label_centroid_outliers(embeddings).toPandas().set_index("vec_id")

    # independent computation: posexplode → per-(label, dim) mean → rejoin
    exploded = embeddings.select(
        "vec_id", "label", F.posexplode("embedding").alias("dim", "v")
    )
    cent = exploded.groupBy("label", "dim").agg(F.avg("v").alias("c"))
    dist = (
        exploded.join(cent, ["label", "dim"])
        .groupBy("vec_id")
        .agg(F.sqrt(F.sum((F.col("v") - F.col("c")) ** 2)).alias("dist"))
        .toPandas()
        .set_index("vec_id")
    )
    joined = out.join(dist, rsuffix="_oracle")
    assert np.allclose(joined.dist, joined.dist_oracle, atol=1e-9)


def test_planted_outlier_gets_extreme_z(spark):
    import random

    random.seed(7)
    rows = [(i, [random.gauss(0, 0.05) for _ in range(8)], 1) for i in range(40)]
    rows.append((99, [5.0] * 8, 1))  # far from the cluster
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    out = label_centroid_outliers(df).toPandas().set_index("vec_id")
    assert out.loc[99].z == out.z.max()
    assert out.loc[99].z > 3.0


def test_every_row_scored_once(spark, embeddings):
    n = embeddings.count()
    out = label_centroid_outliers(embeddings)
    assert out.count() == n
    assert out.select("vec_id").distinct().count() == n
