"""The recall contract, end to end, on every approximate search tier.

The reference exposes one retrieval-quality knob: ``numCandidates``, a
number you guess (``README.md:364`` sets 20, ``README.md:368`` caps it
at 10,000). This engine generalizes the knob into a contract you
DECLARE — ``recall_target=`` — and every approximate tier calibrates
its own knob against a measured sample recall curve:

=====================  ==========================  =====================
tier                   calibrated knob             calibrator
=====================  ==========================  =====================
binary (1-bit) rescore rescore depth               calibrate_recall_depth
SRP-LSH                probe depth                 calibrate_recall_depth
persisted IVF          n_probe (probe width)       calibrate_ivf_n_probe
two-stage IVF-PQ       (n_probe, adc_width)        calibrate_ivfpq
=====================  ==========================  =====================

Each calibration costs TWO corpus scans (one exact ground-truth pass,
one approximate pass at the deepest rung — prefix-monotone candidate
pools price the whole ladder from that single pass), and the measured
curve persists in a ``CalibrationCache`` keyed by a job-free corpus
fingerprint: repeat calls against an unchanged corpus run ZERO Spark
jobs, and any append/vacuum/split moves the fingerprint and
re-measures.

``python examples/recall_contract.py`` prints, per tier, the knob the
calibration chose and the sample recall it measured.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def run(spark: SparkSession, verbose: bool = False):
    import numpy as np

    # deterministic corpus: 2,000 vectors, 32 dims; 32 query vectors
    rng_rows = spark.range(2032).select(
        F.col("id").alias("vid"),
        F.transform(
            F.sequence(F.lit(0), F.lit(31)),
            lambda i: (
                F.pmod(F.xxhash64(F.col("id"), i), F.lit(1000)) / 500.0 - 1.0
            ),
        ).alias("vector"),
    )
    queries = rng_rows.filter(F.col("vid") < 32).select(
        F.col("vid").alias("qid"), "vector"
    )
    corpus = rng_rows.filter(F.col("vid") >= 32).select(
        F.col("vid").alias("cid"), "vector"
    )
    out = {}

    # --- binary (1-bit) tier: calibrate the exact-rescore depth --------
    from confluent_kafka_vector_search_prompt_inference_spark.operators.calibration_cache import (
        CalibrationCache,
    )
    from confluent_kafka_vector_search_prompt_inference_spark.operators.topk_join import calibrate_recall_depth

    cache = CalibrationCache(os.path.join(tempfile.gettempdir(), "recall_curves.json"))
    depth, recall = calibrate_recall_depth(
        queries, corpus, k=10, recall_target=0.9, strategy="binary",
        query_id="qid", query_vec="vector", corpus_id="cid",
        corpus_vec="vector", metric="dot", cache=cache,
    )
    out["binary"] = (f"rescore_depth={depth}", recall)

    # --- LSH tier: calibrate the probe depth ---------------------------
    depth, recall = calibrate_recall_depth(
        queries, corpus, k=10, recall_target=0.8, strategy="lsh",
        query_id="qid", query_vec="vector", corpus_id="cid",
        corpus_vec="vector", metric="dot", cache=cache,
    )
    out["lsh"] = (f"probe_depth={depth}", recall)

    # --- persisted IVF tier: calibrate n_probe -------------------------
    from confluent_kafka_vector_search_prompt_inference_spark.operators.ivf import (
        build_ivf_index,
        calibrate_ivf_n_probe,
        topk_ivf,
    )

    indexed, cents = build_ivf_index(corpus, "vector", n_clusters=16, seed=42)
    n_probe, recall = calibrate_ivf_n_probe(
        queries, indexed, cents, 10, recall_target=0.95,
        query_id="qid", query_vec="vector", corpus_id="cid",
        corpus_vec="vector", metric="dot", cache=cache,
    )
    out["ivf"] = (f"n_probe={n_probe}", recall)
    # ...or let the search itself carry the contract:
    hits = topk_ivf(
        queries, indexed, cents, 10,
        query_id="qid", corpus_id="cid", metric="dot",
        recall_target=0.95, calibration_cache=cache,
    )
    assert hits.count() == 32 * 10

    # --- two-stage IVF-PQ tier: calibrate (n_probe, adc_width) ---------
    from confluent_kafka_vector_search_prompt_inference_spark.operators.ivfpq import (
        build_ivfpq_index,
        calibrate_ivfpq,
    )

    encoded, pq_cents, books = build_ivfpq_index(
        corpus, "vector", n_clusters=8, m=8, k=32, sample_rows=1000, max_iter=5,
    )
    (n_probe, adc_width), recall = calibrate_ivfpq(
        queries, encoded, pq_cents, books, 10, recall_target=0.85,
        query_id="qid", query_vec="vector", corpus_id="cid",
        corpus_vec="vector", max_adc_width=4000, cache=cache,
    )
    out["ivfpq"] = (f"n_probe={n_probe}, adc_width={adc_width}", recall)

    if verbose:
        for tier, (knob, r) in out.items():
            print(f"{tier:8s} -> {knob:28s} measured sample recall {r:.3f}")
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
