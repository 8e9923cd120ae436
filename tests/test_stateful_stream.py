"""run_stateful_stream (round 13): native stateful window aggregations
drain with a state-store partition count sized to the state, not the
session's corpus shuffle width — and the output is unchanged by it.
"""

import json
import os

from pyspark.sql import functions as F

from confluent_kafka_vector_search_prompt_inference_spark.streaming.pipeline import (
    file_stream_reader,
    run_stateful_stream,
)


def _events(spark, n=2000):
    return (
        spark.range(n)
        .select(
            F.timestamp_micros((F.lit(1_700_000_000_000_000) + F.col("id") * 60_000_000)).alias("ts"),
            (F.col("id") % 7).alias("event_type"),
            (F.col("id") % 13).cast("double").alias("value"),
        )
    )


def test_state_partitions_pinned_and_output_exact(spark, tmp_path):
    ev = _events(spark)
    src = str(tmp_path / "src")
    ev.repartition(4).write.parquet(src)

    def agg(df):
        return (
            df.withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 hour", "30 minutes"), "event_type")
            .agg(F.count("*").alias("n"), F.sum("value").alias("sv"))
            .select(F.col("window.start").alias("ws"), "event_type", "n", "sv")
        )

    before = spark.conf.get("spark.sql.shuffle.partitions")
    ckpt = str(tmp_path / "ckpt")
    q = run_stateful_stream(
        agg(file_stream_reader(spark, src, ev.schema)),
        str(tmp_path / "sink"),
        ckpt,
        state_partitions=4,
    )
    assert q.lastProgress is not None
    # the session conf is restored after the drain
    assert spark.conf.get("spark.sql.shuffle.partitions") == before
    # the checkpoint pins the requested state width for every restart
    offsets_dir = os.path.join(ckpt, "offsets")
    first = sorted(f for f in os.listdir(offsets_dir) if f.isdigit())[0]
    meta = None
    with open(os.path.join(offsets_dir, first)) as fh:
        for line in fh:
            line = line.strip()
            if line.startswith("{") and "shuffle.partitions" in line:
                meta = json.loads(line)
                break
    assert meta is not None
    assert meta["conf"]["spark.sql.shuffle.partitions"] == "4"

    # the claim the bench lanes rely on: the state width never changes
    # what a keyed aggregation emits. Same source files, same batch
    # sequence, different store count → identical rows.
    q16 = run_stateful_stream(
        agg(file_stream_reader(spark, src, ev.schema)),
        str(tmp_path / "sink16"),
        str(tmp_path / "ckpt16"),
        state_partitions=16,
    )
    assert q16.lastProgress is not None
    got4 = spark.read.parquet(str(tmp_path / "sink"))
    got16 = spark.read.parquet(str(tmp_path / "sink16"))
    assert got4.count() > 0
    assert got4.count() == got16.count()
    assert got4.exceptAll(got16).count() == 0
    assert got16.exceptAll(got4).count() == 0
