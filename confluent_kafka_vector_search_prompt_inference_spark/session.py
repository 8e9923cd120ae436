"""SparkSession bootstrap tuned for both local testing and cluster scale.

The reference runs on Confluent's managed Flink (SURVEY.md §3); there is no
session code to mirror. These settings encode the 100 TB design decisions:

- AQE on (runtime re-plan, skew-join splitting, partition coalescing);
- Arrow on (every model-inference / vector UDF is Arrow-batched);
- shuffle partitions sized by env (32 locally; a real cluster overrides via
  ``spark.sql.shuffle.partitions`` — AQE coalesces down when small);
- broadcast threshold raised to 64 MB: the dimension tables of a star schema
  and the vector-search corpus metadata are the small sides of every join in
  this workload, and broadcasting them removes the dominant shuffles.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _default_shuffle_partitions() -> str:
    """Shuffle width follows the session's core count, floored at 32.

    A constant 32 made the 8-vs-32-core bench pair indistinguishable by
    partitioning (core count changed task slots but not layout) and would
    cap every shuffle at 32 tasks on a real cluster. ``max(32, cores)``
    keeps the two local bench points (8 and 32 cores) on the identical
    32-partition layout — so round-over-round comparisons stay valid —
    while a 512-core cluster gets 512. ``SPARK_GRAFT_SHUFFLE`` still
    overrides outright, and AQE coalesces down when partitions run small.
    """
    explicit = os.environ.get("SPARK_GRAFT_SHUFFLE")
    if explicit:
        return explicit
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "")
    try:
        n = int(cpus)
    except ValueError:
        n = os.cpu_count() or 32
    return str(max(32, n))


_DEFAULTS: dict[str, str] = {
    "spark.sql.shuffle.partitions": _default_shuffle_partitions(),
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    # Split-size floor for SMALL files: the default 4 MB floor collapses a
    # 10 MB table to 3 splits, idling 29 of 32 local cores. At cluster scale
    # bytes-per-core >> maxPartitionBytes, so this floor never binds there.
    "spark.sql.files.openCostInBytes": str(256 * 1024),
    "spark.sql.parquet.filterPushdown": "true",
    # Join-strategy size estimates start from ON-DISK parquet bytes, but
    # snappy+dictionary text/array columns decompress ~8-17×: at sf10 a
    # 59 MB documents file slipped under the 64 MB broadcast threshold
    # and Catalyst broadcast the corpus-sized shingle table — a ~1 GiB
    # allocation that killed the JVM (found empirically by SCALECHECK,
    # round 4). Scaling file estimates by the compression factor keeps
    # auto-broadcast for genuinely small dimensions while corpus-sized
    # relations fall back to shuffle joins; explicit broadcast() hints
    # (every query-bounded side in this engine) are unaffected.
    "spark.sql.sources.fileCompressionFactor": "8.0",
    "spark.sql.session.timeZone": "UTC",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    "spark.ui.enabled": "false",
    "spark.sql.warehouse.dir": os.environ.get(
        "SPARK_GRAFT_WAREHOUSE", "/tmp/spark-graft-warehouse"
    ),
    "spark.sql.streaming.schemaInference": "false",
}


def get_spark(app_name: str = "confluent-kafka-vector-search-prompt-inference-spark", **overrides: str) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (all cores when
    unset); on a real cluster the caller's spark-submit master wins because
    an existing active session is reused untouched.
    """
    active = SparkSession.getActiveSession()
    if active is not None:
        return active
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = SparkSession.builder.appName(app_name).master(
        os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    )
    conf = dict(_DEFAULTS)
    conf.update({k: str(v) for k, v in overrides.items()})
    for key, value in conf.items():
        builder = builder.config(key, value)
    return builder.getOrCreate()


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
