"""Empirical scale validation: run the heavy dedup/retrieval queries up a
10×/100× data ladder and record observed scaling exponents.

sf0.1 is the driver's bench testdata (5k docs / 2k vectors); sf1 and
sf10 come from tools/gen_scale_data.py (same distributional shape, 10×
and 100×). For each query we record wall time per scale factor, the
log10 time ratio per 10× data step (exponent ≈ 1.0 → linear, ≥ 2 →
quadratic — a banded/bucketed design that silently degenerated to
all-pairs), and the number of single-task stages the run scheduled
(from the status tracker via per-query job groups; k-bounded finals
legitimately use one task, so the signal is a single-task count that
GROWS with sf or an exponent blowup, not a nonzero count).

The single-task count is SIZE-FILTERED: a stage only counts if it
moved >= MIN_SINGLE_TASK_BYTES (64 MiB — the session's AQE advisory
partition size) of input + shuffle-read bytes, fetched from the UI REST
API (the session here runs with the UI on for exactly this). Rationale:
AQE deliberately coalesces any post-shuffle stage under the advisory
size to ONE task — that is the optimizer working, not a scale defect —
and iterative loops (CC label rounds) produce dozens of such small
stages whose count grows with rounds, not data; unfiltered they drowned
the alarm in noise (round-4 verdict: dedup_cluster_assignments reported
40-55 at every SF). A stage that one task genuinely cannot hold — a
corpus-sized sort/window — moves far more than one advisory partition
and still fires the alarm. Stages a HEALTHY metrics endpoint does not
know (evicted past spark.ui.retainedStages, or untracked) are reported
separately as single_task_stages_unknown — never silently dropped; if
the endpoint is down entirely, every single-task stage counts
(fail loud).

Writes SCALECHECK.json at the repo root.

Usage: python tools/scalecheck.py [query ...]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, "/root/repo")

HEAVIES = [
    "minhash_lsh_dups",
    "dedup_cluster_assignments",
    "semantic_dedup_survivors",
    "training_set_selection",
    "late_interaction_maxsim_topk",
    "bm25_keyword_topk",
    "hybrid_rrf_topk",
    "cross_encoder_rerank_topk",
    "vec_quantized_rescore_topk",
    "sequence_packing",
    "vec_bq_topk",
    "trigram_lm_quality",
    "countmin_term_freqs",
    "domain_quota_cap",
    "crossdoc_duplicate_spans",
    "span_dedup_cleaned_docs",
    "gram_heavy_hitters_mg",
    "quality_percentile_gate",
    "chunk_meanpool_embeddings",
    "bm25_raw_index_topk",
    # relational heavies (the generator now emits events/orders/lineitem)
    "part_pagerank",
    "user_event_transcripts",
    "customer_rfm_segments",
    "events_rolling_anomalies",
    "cohort_retention",
    # round-4 third wave: graph + keyword-retrieval additions
    "part_triangle_counts",
    "tfidf_cosine_topk",
    "conjunctive_keyword_topk",
    "phrase_search_topk",
    "bm25_prf_topk",
    # round-6 additions
    "knn_label_vote",
    # round-10: the composed crawl-curation chain (WARC encode+parse,
    # extraction, URL dedup, LSH near-dedup, quality gates in one plan)
    "crawl_curation_pipeline",
    # round-10: membership & overlap sketches (bloom + KMV) — each entry
    # carries its exact ground-truth contrast, so the ladder measures
    # sketch AND exact paths together (the exact side is what the sketch
    # replaces at corpus scale)
    "corpus_overlap_kmv",
    "bloom_returning_users",
    # round-12: tokenizer training — the one-round merge ranking whose
    # hot stage is vocabulary-sized, not corpus-sized (the exponent
    # should track the word-count shuffle, near 1.0)
    "bpe_merge_candidates",
    # round-12 second wave: the repetition family — line counting is
    # (group, line)-keyed (line-scale rows, exponent should track the
    # line explode near 1.0); the Gopher gates are (doc, gram)-keyed
    "line_boilerplate_removal",
    "gopher_repetition_quality",
    # round-12: DSIR — two occurrence-scale bucket counts + one
    # broadcast weight table; exponent should track the gram explode
    "dsir_selected_docs",
]

SF_DIRS = {
    "0.1": "/root/testdata/sf0.1",
    "1": "/root/repo/.scaledata/sf1",
    "10": "/root/repo/.scaledata/sf10",
}


MIN_SINGLE_TASK_BYTES = 64 * 1024 * 1024  # = AQE advisory partition size


def _stage_bytes(ui_url: str, app_id: str) -> tuple[dict[int, int], bool]:
    """(stageId → bytes moved (input + shuffle read), endpoint_ok) from
    the UI REST API. No status filter: completed, failed, and skipped
    stages all report (skipped/cached subtrees report 0 bytes, which the
    size filter correctly excludes). ``endpoint_ok=False`` means the UI
    itself was unreachable — callers then fail open and count every
    single-task stage. An EMPTY-but-healthy response is ``({}, True)``,
    distinguishable from endpoint-down (round-5 advice: the two used to
    collapse into one dict, flipping the alarm mode silently)."""
    import urllib.request

    try:
        with urllib.request.urlopen(
            f"{ui_url}/api/v1/applications/{app_id}/stages",
            timeout=10,
        ) as fh:
            stages = json.load(fh)
    except Exception:  # noqa: BLE001 — metrics are best-effort
        return {}, False
    return {
        s["stageId"]: int(s.get("inputBytes", 0))
        + int(s.get("shuffleReadBytes", 0))
        for s in stages
    }, True


def main() -> int:
    import __spark_entry__ as entry
    from confluent_kafka_vector_search_prompt_inference_spark import get_spark

    names = sys.argv[1:] or HEAVIES
    spark = get_spark(
        "spark-graft-scalecheck",
        **{"spark.ui.enabled": "true", "spark.ui.retainedStages": "20000"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    ui_url = sc.uiWebUrl
    app_id = sc.applicationId
    qs = entry.queries()

    # warm-up: JIT/codegen once so sf0.1 timings aren't first-run noise
    qs[names[0]](spark, SF_DIRS["0.1"]).write.format("noop").mode("overwrite").save()
    entry.release_persisted()

    results: dict[str, dict] = {n: {"sec": {}, "single_task_stages": {}} for n in names}
    for sf, d in SF_DIRS.items():
        if not os.path.exists(os.path.join(d, "documents.parquet")):
            print(f"skipping sf{sf}: {d} missing (run tools/gen_scale_data.py)")
            continue
        for name in names:
            group = f"scalecheck_{name}_{sf}"
            sc.setJobGroup(group, name)
            t0 = time.time()
            try:
                qs[name](spark, d).write.format("noop").mode("overwrite").save()
            except Exception as e:  # noqa: BLE001 — a query that dies at scale IS the finding
                results[name].setdefault("error", {})[sf] = str(e).splitlines()[0][:300]
                print(f"sf{sf:>4} {name}: ERROR {str(e).splitlines()[0][:200]}")
                sc.setJobGroup("", "")
                entry.release_persisted()
                continue
            elapsed = round(time.time() - t0, 2)
            sc.setJobGroup("", "")
            entry.release_persisted()
            st = sc.statusTracker()
            stage_ids = set()
            for jid in st.getJobIdsForGroup(group):
                info = st.getJobInfo(jid)
                if info:
                    stage_ids.update(info.stageIds)
            bytes_by_stage, rest_ok = (
                _stage_bytes(ui_url, app_id) if ui_url else ({}, False)
            )
            single = 0
            unknown = 0
            for sid in stage_ids:
                sinfo = st.getStageInfo(sid)
                if sinfo and sinfo.numTasks == 1:
                    # a single task holding less than one AQE advisory
                    # partition is the coalescer working as designed
                    # (metadata collects, k-row finals, CC label rounds);
                    # only advisory-exceeding ones indicate a scale
                    # problem. Three distinct cases (round-5 advice):
                    # endpoint DOWN → fail open, count everything;
                    # stage absent from a HEALTHY response (evicted past
                    # spark.ui.retainedStages, or untracked) → report
                    # separately as unknown, never silently excluded;
                    # stage present → apply the size filter.
                    if not rest_ok:
                        single += 1
                    elif sid not in bytes_by_stage:
                        unknown += 1
                    elif bytes_by_stage[sid] >= MIN_SINGLE_TASK_BYTES:
                        single += 1
            results[name]["sec"][sf] = elapsed
            results[name]["single_task_stages"][sf] = single
            if unknown:
                results[name].setdefault("single_task_stages_unknown", {})[sf] = unknown
            tag = f" ({unknown} unknown to REST)" if unknown else ""
            print(f"sf{sf:>4} {name}: {elapsed}s ({single} single-task stages{tag})")

    for name, r in results.items():
        s = r["sec"]
        if "1" in s and "10" in s and s["1"] > 0:
            r["exponent_1_to_10"] = round(math.log10(max(s["10"], 0.01) / s["1"]), 2)
        if "0.1" in s and "1" in s and s["0.1"] > 0:
            r["exponent_01_to_1"] = round(math.log10(max(s["1"], 0.01) / s["0.1"]), 2)

    # merge-don't-overwrite: a subset run (query names as argv) must not
    # drop the ladder results of queries it didn't re-measure — NOR any
    # OTHER tool's sections (round 10 lost the whole `streaming` section
    # to a run of this tool that rebuilt the document from scratch; every
    # top-level key this tool doesn't own now passes through verbatim)
    doc: dict = {}
    if os.path.exists("/root/repo/SCALECHECK.json"):
        try:
            with open("/root/repo/SCALECHECK.json") as fh:
                doc = json.load(fh)
        except Exception:  # noqa: BLE001 — a corrupt file is replaced
            doc = {}
    prior = doc.get("queries", {})
    prior.update(results)
    out = dict(doc)
    out.update({
        "ladder": {sf: d for sf, d in SF_DIRS.items()},
        "note": (
            "exponent = log10(time ratio) per 10x data step after fixed "
            "overhead; 1.0=linear, 2.0=quadratic. Low exponents at small "
            "times are overhead-dominated (floor, not superlinearity). "
            "single_task_stages counts only stages that moved >= 64 MiB "
            "(input + shuffle-read bytes, UI REST metrics - the AQE "
            "advisory partition size): one task under the advisory size "
            "is the coalescer working as designed, so metadata collects "
            "and iterative-loop rounds are excluded and the alarm tracks "
            "genuinely unpartitionable data-carrying stages. Single-task "
            "stages a healthy REST endpoint does not know (evicted/"
            "untracked) are reported separately as "
            "single_task_stages_unknown; if the endpoint is down, every "
            "single-task stage counts (fail open)."
        ),
        "queries": prior,
    })
    with open("/root/repo/SCALECHECK.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print("wrote SCALECHECK.json")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
