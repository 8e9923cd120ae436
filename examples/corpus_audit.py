"""The membership-sketch shelf answering a corpus audit, end to end.

A training-data pipeline keeps asking set questions about corpora it
cannot afford to join: *how much do two crawl snapshots share?* *which
sources duplicate each other?* *have we seen this URL before?* This
example walks the round-10 membership sketches
(``operators/membership.py``) through one tiny two-day crawl:

1. **day 1 streams in** — ``bloom_insert`` lands the rows AND maintains
   a bloom of every URL ever landed (≤ m/32 packed words, whatever the
   key count), while ``kmv_insert`` maintains a KMV distinct sketch
   (bottom-k hashes) beside it;
2. **day 2 is gated** — ``read_corpus_bloom`` + ``bloom_contains``
   split day 2's URLs into *definitely new* (bloom-negative: provably
   never landed, no exact check needed) and *maybe seen* (the sliver
   that takes the exact anti-join);
3. **overlap without a join** — day 1's and day 2's KMV sketches give
   union / intersection / Jaccard of the URL sets (``kmv_overlap``)
   from two k-row tables;
4. **the source matrix** — one grouped sketch per source, then EVERY
   pairwise source overlap at once (``kmv_overlap_matrix``) — the
   "which sources mirror each other" answer a 190-pair audit wants.

``python examples/corpus_audit.py`` prints each answer beside its
exact ground truth (affordable here, corpus-sized in production — the
contrast IS the point).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def run(spark: SparkSession, verbose: bool = False):
    from confluent_kafka_vector_search_prompt_inference_spark.operators.membership import (
        bloom_contains,
        kmv_overlap,
        kmv_overlap_matrix,
        kmv_sketch,
    )
    from confluent_kafka_vector_search_prompt_inference_spark.streaming.pipeline import (
        bloom_insert,
        file_stream_reader,
        kmv_insert,
        read_corpus_bloom,
        read_corpus_kmv,
        read_sink,
    )

    m_bits, kk, k = 1 << 14, 4, 128
    work = tempfile.mkdtemp(prefix="corpus_audit_")
    out: dict = {}

    # day 1: 600 URLs over 3 sources; day 2: 600 URLs, half re-crawled
    def urls(lo, hi, day):
        return spark.range(lo, hi).select(
            F.concat(F.lit("https://s"), (F.col("id") % 3).cast("string"),
                     F.lit(".example/p"), F.col("id")).alias("url"),
            (F.col("id") % 3).cast("string").alias("source"),
            F.lit(day).alias("day"),
        )

    day1 = urls(0, 600, 1)
    day2 = urls(300, 900, 2)  # 300..599 re-crawled, 600..899 new

    # 1. day 1 streams in with both sketch faces maintained per epoch
    src1 = os.path.join(work, "day1_src")
    day1.repartition(3).write.parquet(src1)
    sink = os.path.join(work, "sink")
    for face, fn in (("bloom", bloom_insert), ("kmv", kmv_insert)):
        q = fn(
            file_stream_reader(spark, src1, day1.schema),
            sink if face == "bloom" else os.path.join(work, "kmv_sink"),
            os.path.join(work, f"{face}_ckpt"),
            key_col="url",
            trigger_once=True,
            **({"m_bits": m_bits, "k": kk} if face == "bloom" else {"k": k}),
        )
        q.awaitTermination(120)
    out["day1_landed"] = read_sink(spark, sink).count()

    # 2. gate day 2: bloom-negative URLs are PROVABLY new. This is the
    # corpus-probe regime the probe shape is built for: day 2 is the BIG
    # side and is never shuffled — bloom_contains runs k broadcast
    # bit-tests ANDed in a projection (plan-asserted in
    # tests/test_membership.py), so at 100 TB the gate costs one
    # map-side pass over the scan
    bloom = read_corpus_bloom(spark, sink)
    flagged = bloom_contains(
        bloom, day2.select("url").distinct(), "url", m_bits=m_bits, k=kk
    )
    new = flagged.filter(~F.col("bloom_member")).count()
    maybe = flagged.filter(F.col("bloom_member")).count()
    truly_seen = (
        day2.select("url").distinct()
        .join(read_sink(spark, sink).select("url").distinct(), "url", "semi")
        .count()
    )
    out["day2_definitely_new"] = new
    out["day2_maybe_seen"] = maybe
    out["day2_truly_seen"] = truly_seen          # no false negatives:
    out["no_false_negatives"] = maybe >= truly_seen  # maybe ⊇ seen

    # 3. day-over-day overlap from two k-row sketches, no URL join
    sk1 = read_corpus_kmv(spark, os.path.join(work, "kmv_sink"), k=k)
    sk2 = kmv_sketch(day2, "url", k=k)
    ov = kmv_overlap(sk1, sk2, k=k).collect()[0]
    out["overlap_est"] = {
        "jaccard": ov.jaccard_est,
        "intersection": ov.d_intersect_est,
        "union": ov.d_union_est,
    }
    out["overlap_exact"] = {"jaccard": round(300 / 900, 4), "intersection": 300}

    # 4. the all-pairs source matrix from ONE grouped sketch table
    both = day1.unionByName(day2)
    grouped = kmv_sketch(both, "url", k=k, set_cols=["source"])
    matrix = kmv_overlap_matrix(grouped, k=k, set_col="source").orderBy(
        "set_a", "set_b"
    )
    out["matrix"] = [
        (r.set_a, r.set_b, r.jaccard_est) for r in matrix.collect()
    ]

    # 5. per-source membership ONLINE (round 12): one GROUPED bloom
    # (``bloom_insert(set_cols=['source'])``) answers the question the
    # global bloom of step 2 cannot — "has THIS source itself carried
    # this URL", distinguishing a source re-crawling its own pages from
    # a different source mirroring them. Same zero-shuffle probe, the k
    # broadcast joins keyed on (source, word) with null-safe groups.
    gsink = os.path.join(work, "gsink")
    q = bloom_insert(
        file_stream_reader(spark, src1, day1.schema),
        gsink,
        os.path.join(work, "gbloom_ckpt"),
        key_col="url",
        m_bits=m_bits,
        k=kk,
        set_cols=["source"],
        trigger_once=True,
    )
    q.awaitTermination(120)
    gb = read_corpus_bloom(spark, gsink, set_cols=["source"])
    own = bloom_contains(
        gb, day2.select("source", "url"), "url",
        m_bits=m_bits, k=kk, set_cols=["source"],
    )
    out["day2_seen_by_own_source"] = own.filter("bloom_member").count()
    # cross-source probe: source 0's day-2 URLs asked against source
    # 1's bloom — a per-source bitmap holds only its own keys, so this
    # reads (near) empty where the global bloom would say "seen"
    cross = day2.filter("source = '0'").withColumn("source", F.lit("1"))
    out["cross_source_hits"] = (
        bloom_contains(
            gb, cross.select("source", "url"), "url",
            m_bits=m_bits, k=kk, set_cols=["source"],
        )
        .filter("bloom_member")
        .count()
    )
    if verbose:
        print(out)
    return out


if __name__ == "__main__":
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .appName("corpus-audit")
        .getOrCreate()
    )
    try:
        run(spark, verbose=True)
    finally:
        spark.stop()
