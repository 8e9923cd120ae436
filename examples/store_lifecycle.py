"""The near-dedup history store's full maintenance lifecycle, end to end.

The reference's continuous INSERT-SELECT runs forever (``README.md:435``)
and its topics carry retention (1 h / 1 GB, ``README.md:102``) — so any
state the engine keeps beside the stream needs a story for UNBOUNDED
arrival and BOUNDED retention. The near-dedup lane's bucket store is
that state: every landed document's ``(id, band-bucket)`` pairs, read by
every micro-batch. This example walks the four maintenance moments of
its life on one tiny stream:

1. **stream** — ``near_dedup_insert`` drops near-copies against landed
   history; the store accumulates one flat delta per epoch;
2. **compact** — ``tiered_compact_sink`` folds the flat tail into
   ``__bpart``-partitioned runs that merge GEOMETRICALLY (amortized
   O(log history) rewrite per batch, never a full refold);
3. **rebucket** — ``rebucket_bucket_store`` migrates the store's pinned
   partition count when history outgrows the creation-time guess (the
   saturated-regime escape, crash-safe shadow swap);
4. **retire + prune** — ``enforce_retention`` deletes old sink epochs
   (forgetting IS the semantics), then ``prune_bucket_store`` drops the
   retired documents' now-dead bucket rows so the store tracks the LIVE
   corpus, not everything ever landed.

``python examples/store_lifecycle.py`` prints the store's shape after
each moment and proves dedup still works at the end.
"""

from __future__ import annotations

import glob
import os
import tempfile

from pyspark.sql import SparkSession


def _store_shape(buckets_dir: str) -> dict:
    dirs = sorted(glob.glob(os.path.join(buckets_dir, "_batch=*")))
    runs = [d for d in dirs if glob.glob(os.path.join(d, "__bpart=*"))]
    return {"epoch_dirs": len(dirs), "partitioned_runs": len(runs)}


def run(spark: SparkSession, verbose: bool = False):
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from confluent_kafka_vector_search_prompt_inference_spark.streaming.pipeline import (
        bucket_store_partitions,
        enforce_retention,
        file_stream_reader,
        near_dedup_insert,
        prune_bucket_store,
        read_sink,
        rebucket_bucket_store,
        tiered_compact_sink,
    )

    work = tempfile.mkdtemp(prefix="store_lifecycle_")
    src = os.path.join(work, "src")
    sink = os.path.join(work, "sink")
    buckets = os.path.join(sink, "_buckets")
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    texts = {
        1: "the quick brown fox jumps over the lazy dog while the cat "
           "watches from the warm windowsill in the late afternoon sun",
        2: "schema registries attach late bound data contracts to kafka "
           "topics so raw bytes decode into typed tables for every consumer",
        3: "tiered compaction folds the flat tail into partitioned runs "
           "that merge geometrically bounding the amortized rewrite cost",
    }

    def stream_batch(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        q = near_dedup_insert(
            file_stream_reader(spark, src, schema),
            sink, os.path.join(work, "ckpt"),
            id_col="doc_id", text_col="text", threshold=0.5,
            bucket_partitions=4, compact_every=2, trigger_once=True,
        )
        q.awaitTermination(600)

    out = {}
    # 1. stream: three docs land; a near-copy of doc 1 is dropped mid-way
    stream_batch([(1, texts[1])])
    stream_batch([(10, texts[1].replace("quick", "swift")), (2, texts[2])])
    stream_batch([(3, texts[3])])
    out["landed_after_stream"] = sorted(
        r.doc_id for r in read_sink(spark, sink).collect()
    )
    # 2. compact (near_dedup_insert triggers this itself past
    #    compact_every; calling it directly shows the maintenance face)
    tiered_compact_sink(spark, buckets, keep_batches=1, partition_by=["__bpart"])
    out["shape_after_compact"] = _store_shape(buckets)
    # 3. rebucket: 4 -> 16 partitions through the crash-safe shadow swap
    rebucket_bucket_store(spark, buckets, 16)
    out["partitions_after_rebucket"] = bucket_store_partitions(buckets, 4)
    # 4. retire the oldest epoch, prune its dead bucket rows
    out["retired_epochs"] = enforce_retention(sink, max_batches=2)
    prune_bucket_store(spark, sink, id_col="doc_id")
    out["landed_after_retire"] = sorted(
        r.doc_id for r in read_sink(spark, sink).collect()
    )
    # dedup still works against the compacted+rebucketed+pruned history:
    # a near-copy of LIVE doc 2 drops; a near-copy of RETIRED doc 1 lands
    stream_batch([(20, texts[2].replace("schema", "scheme")),
                  (21, texts[1].replace("dog", "hound"))])
    out["landed_final"] = sorted(
        r.doc_id for r in read_sink(spark, sink).collect()
    )
    if verbose:
        for k, v in out.items():
            print(f"{k:26s} {v}")
    return out


def run_online(spark: SparkSession, verbose: bool = False):
    """The SAME lifecycle with zero stop-the-world moments (round 9):
    retention lands TOMBSTONES (``enforce_retention_tombstoned``) and a
    partition migration is a REQUEST (``request_rebucket_online``) —
    both drain through the stream's own per-batch maintenance
    (``maintain_bucket_store`` riding the geometric compaction merges)
    while documents keep landing. The offline one-shots of :func:`run`
    remain for stopped stores; a forever-running pipeline
    (``README.md:435``) never needs them."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from confluent_kafka_vector_search_prompt_inference_spark.streaming.pipeline import (
        _live_tombstones,
        bucket_store_partitions,
        enforce_retention_tombstoned,
        file_stream_reader,
        near_dedup_insert,
        read_bucket_maintenance,
        read_bucket_store,
        read_sink,
        request_rebucket_online,
    )

    work = tempfile.mkdtemp(prefix="store_lifecycle_online_")
    src = os.path.join(work, "src")
    sink = os.path.join(work, "sink")
    buckets = os.path.join(sink, "_buckets")
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    texts = {
        1: "the quick brown fox jumps over the lazy dog while the cat "
           "watches from the warm windowsill in the late afternoon sun",
        2: "schema registries attach late bound data contracts to kafka "
           "topics so raw bytes decode into typed tables for every consumer",
        3: "tiered compaction folds the flat tail into partitioned runs "
           "that merge geometrically bounding the amortized rewrite cost",
        4: "retirement tombstones drain through the same merges so the "
           "forever running pipeline never stops for a store rewrite",
    }

    def stream_batch(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        q = near_dedup_insert(
            file_stream_reader(spark, src, schema),
            sink, os.path.join(work, "ckpt"),
            id_col="doc_id", text_col="text", threshold=0.5,
            bucket_partitions=4, compact_every=1, trigger_once=True,
        )
        q.awaitTermination(600)

    out = {}
    # 1. stream three docs
    stream_batch([(1, texts[1])])
    stream_batch([(2, texts[2])])
    stream_batch([(3, texts[3])])
    # 2. retention retires the oldest epoch — tombstone lands BEFORE the
    #    delete; the stream is never stopped
    out["retired_epochs"] = enforce_retention_tombstoned(
        spark, sink, id_col="doc_id", max_batches=2
    )
    out["tombstones_live"] = len(_live_tombstones(buckets))
    # 3. a migration request: nothing is rewritten yet
    request_rebucket_online(buckets, 16)
    out["pending"] = read_bucket_maintenance(buckets)
    # 4. the stream just keeps running — each batch's maintenance call
    #    applies the tombstone and rewrites one stale run at the target N
    stream_batch([(4, texts[4])])
    stream_batch([(5, texts[3].replace("compaction", "compression"))])
    stream_batch([(6, texts[4] + " with a trailing clause appended")])
    out["pending_after"] = read_bucket_maintenance(buckets)
    out["partitions_after"] = bucket_store_partitions(buckets, 4)
    out["tombstones_after"] = len(_live_tombstones(buckets))
    out["store_ids"] = sorted(
        {r["doc_id"] for r in read_bucket_store(spark, buckets, "doc_id").collect()}
    )
    # 5. dedup semantics through it all: a near-copy of LIVE doc 2 drops,
    #    a near-copy of the RETIRED doc 1 lands
    stream_batch([(20, texts[2].replace("schema", "scheme")),
                  (21, texts[1].replace("dog", "hound"))])
    out["landed_final"] = sorted(
        r.doc_id for r in read_sink(spark, sink).collect()
    )
    if verbose:
        for k, v in out.items():
            print(f"{k:26s} {v}")
    return out


if __name__ == "__main__":
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    run(spark, verbose=True)
    run_online(spark, verbose=True)
