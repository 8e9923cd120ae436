import pytest

from confluent_kafka_vector_search_prompt_inference_spark import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("spark-graft-tests")
    yield spark


@pytest.fixture(scope="session")
def sf_smoke():
    return SF_SMOKE


@pytest.fixture(scope="session")
def sf_correct():
    return SF_CORRECT


def load_events(spark, sf_dir):
    """Read the events table with a schema-version-tolerant ts column.

    Older driver testdata stored ts as TIMESTAMP(NANOS) (Spark reads it as
    raw INT64 under nanosAsLong); newer drops to timestamp[us] directly.
    """
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts_type = dict(ev.dtypes).get("ts")
    if ts_type == "bigint":
        ev = ev.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        # Watermarks require TIMESTAMP (tz-aware); parquet timestamp[us]
        # without a zone arrives as TIMESTAMP_NTZ.
        ev = ev.withColumn("ts", F.col("ts").cast("timestamp"))
    return ev


@pytest.fixture(scope="session")
def docs(spark, sf_smoke):
    return spark.read.parquet(f"{sf_smoke}/documents.parquet")


@pytest.fixture(scope="session")
def embeddings(spark, sf_smoke):
    return spark.read.parquet(f"{sf_smoke}/embeddings.parquet")
