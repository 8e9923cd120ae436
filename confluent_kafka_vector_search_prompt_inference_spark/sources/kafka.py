"""Kafka source/sink configuration builders.

The reference's tables *are* Kafka topics (``README.md:101-105``; retention
1h/1GB, 1 partition ``README.md:102``). Spark's kafka connector provides the
scan; these helpers centralize options so batch (``spark.read``) and
streaming (``spark.readStream``) use identical configs. No broker exists in
the test environment, so tests cover option construction and the
JSON-decode path (``sources/registry.py``) over Kafka-shaped DataFrames;
against a real cluster the returned readers work unchanged.

Scale notes: ``minPartitions`` lets a 1-partition topic (the reference's
shape) still fan out across executors; ``maxOffsetsPerTrigger`` bounds
micro-batch size so state and sink pressure stay stable at high ingest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import DataStreamReader


def kafka_reader(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    *,
    starting_offsets: str = "earliest",
    ending_offsets: str = "latest",
):
    """Batch Kafka scan (``spark.read.format('kafka')``)."""
    return (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("endingOffsets", ending_offsets)
    )


def kafka_stream_reader(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    *,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = 100_000,
    min_partitions: int | None = None,
) -> DataStreamReader:
    """Streaming Kafka scan — the reference's unbounded topic-as-table
    (``README.md:219``) as ``readStream``."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    if min_partitions:
        reader = reader.option("minPartitions", str(min_partitions))
    return reader


def kafka_sink_options(bootstrap_servers: str, topic: str) -> dict[str, str]:
    """Options for ``writeStream.format('kafka')`` — the continuous
    INSERT-INTO-topic sink (``README.md:438-446``)."""
    return {"kafka.bootstrap.servers": bootstrap_servers, "topic": topic}


def to_kafka_shape(df: DataFrame, key_col: str | None, value_cols: list[str]) -> DataFrame:
    """Project columns into the ``key BYTES, value BYTES`` wire shape with
    JSON-registry-style serialization (``'value.format'='json-registry'``,
    ``README.md:272``)."""
    from pyspark.sql import functions as F

    value = F.to_json(F.struct(*[F.col(c) for c in value_cols])).cast("binary")
    key = F.col(key_col).cast("binary") if key_col else F.lit(None).cast("binary")
    return df.select(key.alias("key"), value.alias("value"))
