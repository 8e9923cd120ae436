"""The crawl-curation pipeline, end to end — batch and streaming.

This is the chain a web-scale training corpus is actually built through
(Common Crawl ships WARC; the reference's analog is its own end-to-end
RAG chain, reference ``README.md:286-288, 438-446, 724-732``):

1. **ingest** — ``sources/warc.read_warc`` turns crawl archives into
   typed records (``mapInPandas`` over archive blobs, zero shuffle —
   the archive FILE is the 100 TB parallelism unit);
2. **gate fetch status** — only 200-responses proceed;
3. **extract** — ``functions/text.html_to_text`` (script/style blocks
   whole, comments, tags, entities, whitespace) and ``canonical_url``
   (lowercased authority, fragment and tracking params dropped), both
   pure-Catalyst regexp chains, zero UDF;
4. **exact dedup on the canonical URL** — re-crawls of the same page
   collapse (batch: min doc_id per key; streaming: first-arrived-wins
   against the sink's narrow ``_ids`` key sidecars);
5. **near-dedup on the extracted text** — MinHash-LSH candidates,
   exact-Jaccard verify, banded buckets (never all-pairs);
6. **quality gates** — word count and the heuristic quality score;
7. **span-clean + pack** — whole-doc dedup can't touch the footer
   boilerplate EVERY page shares (each landed page is textually
   distinct), so ``operators/dedup.repeated_span_removal`` cuts the
   corpus-repeated 5-grams out of the survivors, and
   ``operators/packing.pack_sequences`` fills the 512-token training
   shards from the CLEANED token counts.

``python examples/crawl_curation.py`` runs a tiny corpus through the
streaming lane (``near_dedup_insert(transform=, exact_key_col=)``) and
prints what landed and why the rest dropped. The oracled batch query is
``__spark_entry__.crawl_curation_pipeline``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

DOC_FOX = (
    "the quick brown fox jumps over the lazy dog while the cat "
    "watches from the warm windowsill in the late afternoon sun"
)
DOC_KAFKA = (
    "schema registries attach late bound data contracts to kafka "
    "topics so raw bytes decode into typed tables for downstream jobs"
)
DOC_MERGE = (
    "geometric merge policies bound the amortized rewrite cost of an "
    "append only store to a logarithm of its total landed history"
)


#: the footer every crawled page carries — exactly what survives
#: whole-doc dedup (each page is otherwise distinct) and what the
#: span-removal stage exists to cut
BOILER = "subscribe to the crawl newsletter for weekly corpus updates"


def _blob(doc_id: int, page: str, text: str, status: int = 200):
    """One single-response WARC archive: HTML wrapping the text plus the
    site-wide footer, a URI whose query is all trackers (canonicalization
    collapses re-crawls)."""
    from confluent_kafka_vector_search_prompt_inference_spark.sources.warc import http_response, warc_encode

    html = (
        f"<html><body><p>{text}</p><!-- crawler -->"
        f"<p>{BOILER}</p></body></html>"
    )
    uri = f"HTTPS://Crawl.Example/{page}?utm_source=x&gclid={doc_id}#frag"
    return (
        f"warc://{doc_id}",
        warc_encode(
            [{"type": "response", "uri": uri,
              "payload": http_response(html.encode(), status=status)}],
            gzip_members=doc_id % 2 == 1,
        ),
    )


def curate(df):
    """The per-batch transform: parse → status gate → extract →
    canonicalize. Plain batch operators — usable on a static DataFrame
    or inside the streaming lane's ``foreachBatch``."""
    from confluent_kafka_vector_search_prompt_inference_spark.functions.text import canonical_url, html_to_text
    from confluent_kafka_vector_search_prompt_inference_spark.sources.warc import read_warc

    recs = read_warc(df).filter(
        (F.col("record_type") == "response") & (F.col("http_status") == 200)
    )
    return recs.select(
        F.regexp_extract("path", r"warc://(\d+)", 1).cast("bigint").alias("doc_id"),
        html_to_text(F.decode(F.col("body"), "UTF-8")).alias("text"),
        canonical_url(F.col("uri")).alias("canon_url"),
    )


def run(spark: SparkSession, verbose: bool = False) -> dict:
    import glob
    import tempfile

    from pyspark.sql.types import BinaryType, StringType, StructField, StructType

    from confluent_kafka_vector_search_prompt_inference_spark.streaming.pipeline import (
        file_stream_reader,
        near_dedup_insert,
        read_sink,
    )

    work = tempfile.mkdtemp(prefix="crawl_curation_example_")
    src = os.path.join(work, "src")
    sink = os.path.join(work, "sink")
    ckpt = os.path.join(work, "ckpt")
    schema = StructType(
        [StructField("path", StringType()), StructField("content", BinaryType())]
    )

    def stream_batch(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        q = near_dedup_insert(
            file_stream_reader(spark, src, schema),
            sink, ckpt,
            id_col="doc_id", text_col="text", threshold=0.5,
            bucket_partitions=4, compact_every=2, trigger_once=True,
            transform=curate, exact_key_col="canon_url",
        )
        q.awaitTermination(120)

    out: dict = {}
    # batch 1: two fetches of pageA (first-arrived wins), one 404
    stream_batch([
        _blob(1, "pageA", DOC_FOX),
        _blob(2, "pageA", DOC_KAFKA),          # same page → URL dedup
        _blob(6, "pageZ", DOC_MERGE, status=404),  # fetch failed → gate
    ])
    out["landed_batch1"] = sorted(r.doc_id for r in read_sink(spark, sink).collect())
    # batch 2: pageA again (landed key), a textual near-copy on a new
    # page (near-dedup), and a genuinely new page+text
    stream_batch([
        _blob(3, "pageA", DOC_MERGE),                        # landed URL
        _blob(4, "pageB", DOC_FOX.replace("quick", "swift")),  # near-copy
        _blob(5, "pageC", DOC_KAFKA),                        # new page+text
    ])
    out["landed_final"] = sorted(r.doc_id for r in read_sink(spark, sink).collect())
    out["ids_sidecars"] = len(glob.glob(os.path.join(sink, "_ids", "_batch=*")))
    # stage 7: the landed survivors still each carry the site-wide footer
    # (whole-doc dedup can't see it) — cut the corpus-repeated spans, then
    # pack the CLEANED token counts into training shards
    from confluent_kafka_vector_search_prompt_inference_spark.functions.text import token_count
    from confluent_kafka_vector_search_prompt_inference_spark.operators.dedup import repeated_span_removal
    from confluent_kafka_vector_search_prompt_inference_spark.operators.packing import pack_sequences

    cleaned = repeated_span_removal(
        read_sink(spark, sink).select("doc_id", "text"), "doc_id", "text"
    )
    out["cleaned"] = {
        r["doc_id"]: (r["n_removed"], r["cleaned_text"]) for r in cleaned.collect()
    }
    packed = pack_sequences(
        cleaned.filter(F.col("n_kept") > 0).select(
            "doc_id", token_count("cleaned_text").cast("bigint").alias("tokens")
        ),
        "doc_id", "tokens", budget=512, shards=2,
    )
    out["packed_docs"] = packed.count()
    if verbose:
        for k, v in out.items():
            print(f"{k:16s} {v}")
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
