"""Per-phase decomposition of the streaming IVF RAG lane's batch cost.

The round-7 ladder measured `rag_transform_ivf` slowing 2.86× from 1M→3M
corpus rows where the lane's √n cost model predicted ~1.73× — unexplained
super-model growth on the lane that carries 100 TB deployments. This tool
attributes one micro-batch's cost to its phases, per rung:

- ``fingerprint``: the job-free ``directory_fingerprint`` metadata walk
  (O(#index files) = O(√n) at one file per cluster) — paid EVERY batch;
- ``load``: ``load_ivf_index`` — recovery checks + partition discovery
  (a one-task-per-cluster-dir listing job) + centroid collect — paid only
  on a fingerprint MISS (first batch / after drift);
- ``probe_cold``: one full ``topk_ivf`` pass over a batch of questions
  with the corpus read from PARQUET — what every batch paid before the
  round-8 index persist;
- ``probe_warm``: the same pass with the corpus DataFrame persisted —
  what steady-state batches pay after it;
- ``transform``: the full RAG transform (embed + probe + content attach +
  prompt + LLM) on the warm index, for the end-to-end per-batch number
  the ladder's rows/sec reflects.

The hypothesis this tool was built to check: at ladder batch sizes
(500 queries × n_probe=8 ≥ n_clusters), the "pruned" probe scan touches
essentially EVERY cluster, so the per-batch parquet read converges to the
full corpus — linear in n, not √n. The probe_cold column measures exactly
that scan; probe_warm shows what removing the re-read (the persist)
recovers.

Output: merged into SCALECHECK.json under streaming.rag_transform_ivf_phases.
Usage: python tools/ivf_lane_phases.py [rung ...]   (default 100k 1M 3M)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from stream_scalecheck import _synth_docs  # noqa: E402  (sibling tool)

RUNGS = [100_000, 1_000_000, 3_000_000]
BATCH_QUESTIONS = 500  # one ladder micro-batch (2,000 rows / 4 batches)


def _phase_rung(spark, rung: int, work: str) -> dict:
    from pyspark.sql import functions as F

    from confluent_kafka_vector_search_prompt_inference_spark.models import (
        HashingEmbedder,
        ModelRegistry,
        TemplateLLM,
    )
    from confluent_kafka_vector_search_prompt_inference_spark.operators.calibration_cache import (
        directory_fingerprint,
    )
    from confluent_kafka_vector_search_prompt_inference_spark.operators.ivf import (
        build_ivf_index,
        load_ivf_index,
        save_ivf_index,
        topk_ivf,
    )
    from confluent_kafka_vector_search_prompt_inference_spark.streaming.rag import RagPipeline

    registry = ModelRegistry()
    registry.create_model("vector_encoding", "embedding", HashingEmbedder(dim=64))
    registry.create_model("retail_assistant", "text_generation", TemplateLLM())
    # same duplex-deadlock mitigation as the ladder's _rag_ivf_rung: cap
    # per-task row volume through the Arrow python runner — ~312k-row
    # embed tasks at the 10M rung reproduce the documented socket-buffer
    # deadlock this tool would otherwise hang on at the very rung the
    # phase analysis is chasing
    corpus_docs = _synth_docs(spark, rung, seed=2).repartition(
        max(32, min(4096, rung // 4_000)), "doc_id"
    ).select(
        F.col("doc_id").alias("product_id"), F.col("text").alias("content")
    )
    corpus = registry.ml_predict(corpus_docs, "vector_encoding", "content")
    idx = os.path.join(work, f"phase_idx_{rung}")
    n_clusters = max(64, int(rung ** 0.5))  # same √n sizing as the ladder
    indexed, cents = build_ivf_index(corpus, "vector", n_clusters=n_clusters, seed=42)
    save_ivf_index(indexed, cents, idx)

    questions = _synth_docs(spark, BATCH_QUESTIONS, id_offset=10_000_000, seed=3)
    q_vec = registry.ml_predict(
        questions.select(
            F.col("doc_id").alias("question_id"), F.col("text").alias("content")
        ),
        "vector_encoding",
        "content",
    ).localCheckpoint(eager=True)

    out: dict[str, float] = {"n_clusters": n_clusters}

    t0 = time.time()
    fp = directory_fingerprint(idx)
    out["fingerprint_s"] = round(time.time() - t0, 3)

    t0 = time.time()
    loaded, centroids = load_ivf_index(spark, idx)
    out["load_s"] = round(time.time() - t0, 3)

    def _probe(df):
        t0 = time.time()
        topk_ivf(
            q_vec, df, centroids, 3,
            query_id="question_id", query_vec="vector",
            corpus_id="product_id", corpus_vec="vector",
            metric="dot", n_probe=8,
        ).write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3)

    out["probe_cold_s"] = _probe(loaded)
    persisted = loaded.persist()
    persisted.count()  # materialize outside the timed warm pass
    out["probe_warm_s"] = _probe(persisted)

    # end-to-end transform on the warm index, through RagPipeline's own
    # load cache (second call hits the persisted snapshot)
    pipe = RagPipeline(registry, k=3, vector_index=idx, n_probe=8)
    batch = questions.select(
        F.lit("user").alias("role"),
        F.col("text").alias("content"),
        F.col("doc_id").cast("string").alias("sessionid"),
    ).localCheckpoint(eager=True)
    pipe.run_batch(batch).write.format("noop").mode("overwrite").save()  # warm load
    t0 = time.time()
    pipe.run_batch(batch).write.format("noop").mode("overwrite").save()
    out["transform_warm_s"] = round(time.time() - t0, 3)
    pipe.release()
    persisted.unpersist()
    assert fp == directory_fingerprint(idx)
    return out


def main() -> int:
    from confluent_kafka_vector_search_prompt_inference_spark import get_spark

    rungs = [int(a) for a in sys.argv[1:]] or RUNGS
    spark = get_spark("spark-graft-ivf-phases")
    spark.sparkContext.setLogLevel("ERROR")
    # one Arrow OUTPUT batch must fit the loopback socket buffer (see
    # stream_scalecheck.py's deadlock note) — same 2k-row cap
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2000")
    work = tempfile.mkdtemp(prefix="spark_graft_ivf_phases_")
    results: dict[str, dict] = {}
    try:
        for rung in rungs:
            results[str(rung)] = _phase_rung(spark, rung, work)
            print(f"rag_ivf phases @ {rung:>9,}: {results[str(rung)]}")
    finally:
        shutil.rmtree(work, ignore_errors=True)

    path = "/root/repo/SCALECHECK.json"
    doc = {}
    if os.path.exists(path):
        with open(path) as fh:
            doc = json.load(fh)
    section = doc.setdefault("streaming", {}).setdefault(
        "rag_transform_ivf_phases", {}
    )
    section["note"] = (
        "one 500-question micro-batch decomposed per rung: fingerprint = "
        "per-batch O(sqrt n) metadata walk; load = fingerprint-miss index "
        "load (partition discovery + centroid collect); probe_cold = "
        "topk_ivf with the corpus re-read from parquet (pre-round-8 every "
        "batch paid this); probe_warm = same probe on the persisted "
        "snapshot (steady state after the round-8 _load_index persist); "
        "transform_warm = full RAG batch on the warm index."
    )
    for rung, row in results.items():
        section[rung] = row
    with open(path, "w") as fh:
        json.dump(doc, fh, indent=1)
    print("wrote SCALECHECK.json rag_transform_ivf_phases")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
