"""Streaming scale ladder: measure the continuous lanes against GROWING
landed state — the axis the per-round streaming bench never moves.

The batch SCALECHECK ladders input size; these lanes' cost driver is
different: ``near_dedup_insert`` joins every micro-batch against the
LANDED-signature table (history), and ``rag_transform`` retrieves
against the indexed corpus. Both run forever in the reference's model
(continuous INSERT-SELECT, reference ``README.md:435``), so their
steady-state throughput at year-2 history is the number that matters —
not their throughput into an empty sink.

Method per rung (10k / 100k / 1M):

- ``near_dedup_insert``: pre-land ``rung`` synthetic docs WITH their
  MinHash signatures directly into the sink's reserved ``_batch=-1``
  epoch (the exact layout the writer produces), then stream a FIXED
  2,000-doc increment through in 4 micro-batches. 1% of incoming rows
  are planted near-copies of landed rows (same token stream + one extra
  token ⇒ shingle Jaccard ≈ 0.9), so the landed-verify path does real
  work. Rows/sec is metered on the fixed increment, so a drop across
  rungs isolates the cost of HISTORY, not input.
- ``rag_transform``: index ``rung`` docs as the retrieval corpus
  (HashingEmbedder, cached, built outside the timed loop — index build
  is amortized in production), then stream the same fixed 2,000
  questions through the full RAG transform in 4 micro-batches.
- ``rag_transform_ivf``: the same questions over the PERSISTED
  √n-clustered IVF index (``vector_index=``, reloaded per batch so
  appends stay visible) — measures where the probe lane crosses over
  the exact broadcast lane (observed: ~1M rows on this hardware).
- ``ivf_insert`` / ``sketch_insert``: the CONTROL lanes. Both are
  history-independent per batch by design (ivf reads only the tiny
  centroid table; sketch state is depth×width cells and deltas are
  written, never read, on the insert path), so their rungs should stay
  FLAT — a measured baseline separating micro-batch overhead from the
  genuine history cost the first two lanes carry.

Measurement discipline: run this on an otherwise-idle box. The rungs
are wall-clock rows/sec; a concurrent pytest/parity run visibly
deflates whichever rung it overlaps (observed ~2× on a 1M rung).

Output: a ``streaming`` section in SCALECHECK.json — per lane, per rung:
rows/sec, p50/p95 batch ms, landed/dropped sanity counts, and the
derived per-10×-state slowdown factor (1.0 = history-free; ``rung``/
``slowdown`` relationships far under 10× per decade = sub-linear in
history).

Usage: python tools/stream_scalecheck.py [rung ...]
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

RUNGS = [10_000, 100_000, 1_000_000]
INCOMING_ROWS = 2_000
N_BATCHES = 4
PLANT_EVERY = 100  # 1% of incoming rows are near-copies of landed rows
_ID_OFFSET = 10_000_000


def _synth_docs(spark, n: int, *, id_offset: int = 0, seed: int = 0,
                n_tokens: int = 30, vocab: int = 2_000):
    """Deterministic synthetic corpus: doc i = n_tokens words drawn by
    hash from a vocab-word space. Distinct seeds ⇒ disjoint shingle
    space (no accidental near-dups); same seed + same id ⇒ identical
    text (the handle planted dups are built from)."""
    from pyspark.sql import functions as F

    return spark.range(n).select(
        (F.col("id") + id_offset).alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(0), F.lit(n_tokens - 1)),
                lambda i: F.concat(
                    F.lit("w"),
                    F.pmod(F.xxhash64(F.col("id"), i, F.lit(seed)), F.lit(vocab)),
                ),
            ),
        ).alias("text"),
    )


def _progress_stats(query, wall_sec: float, source_rows: int) -> dict:
    prog = [p for p in (query.recentProgress or []) if p.get("numInputRows", 0) > 0]
    durs = sorted(p["durationMs"]["triggerExecution"] for p in prog)
    if not durs:
        return {"batches": 0}
    return {
        "batches": len(durs),
        "rows": source_rows,
        "rows_per_sec": round(source_rows / wall_sec, 1),
        "p50_batch_ms": int(statistics.median(durs)),
        "p95_batch_ms": int(durs[min(len(durs) - 1, int(len(durs) * 0.95))]),
    }


def _near_dedup_rung(
    spark,
    rung: int,
    work: str,
    *,
    compact_every: int = 16,
    rebucket_to: int | None = None,
    stale: str | None = None,
    tag: str = "",
    n_batches: int = N_BATCHES,
    tombstone_ghosts: bool = False,
    monitor_runs: bool = False,
    bloom: bool | None = None,
) -> dict:
    """The history-joined lane. Variants measured off the same harness:

    - ``compact_every=2, n_batches=16`` (lane ``near_dedup_compact``):
      tiered compaction FIRES inside the measured window — the base
      ladder never triggers it (rungs pre-land an already-compacted
      base), so the round-7 full-refold cost was invisible. Round 9
      widened the window from 4 to 16 batches so the GEOMETRIC RUN-RUN
      MERGES (not just tail folds) fire mid-rung: a monitor thread
      samples the store's run count while the stream runs
      (``runs_timeline`` / ``max_runs_observed``) and the per-batch
      trigger durations are recorded raw (``batch_ms``) so the merge
      spikes and their amortized cost are both visible beside the
      embedded no-fold ``control``;
    - ``tombstone_ghosts=True`` (lane ``near_dedup_online_prune``): the
      ghost rows additionally get a retirement TOMBSTONE
      (:func:`retire_tombstone`), so the stream's own maintenance folds
      (``maintain_bucket_store`` nudges, one run per batch) drain the
      dead width IN-WINDOW — the round-9 online replacement for the
      stop-the-world ``prune_bucket_store``; the lane records store
      rows before/after and whether the tombstone was GC'd;
    - ``rebucket_to=4096`` (lane ``near_dedup_rebucket``): the pre-landed
      N=64 store is migrated through ``rebucket_bucket_store`` before
      streaming — the saturated-regime escape data point (SCALING.md:
      2k-row batches × 16 bands ≈ 8k distinct buckets touch all 64
      partitions; at N=4096 the expected touch fraction is
      1−exp(−8k/4096) ≈ 86%, so the scan prunes ~14% and, more
      importantly, the op itself is exercised at rung scale);
    - ``stale='retired'`` / ``'pruned'`` (lanes ``near_dedup_retired``/
      ``near_dedup_pruned``): the store additionally carries ``rung``
      GHOST docs' bucket pairs — rows whose documents are not in the
      sink, exactly what ``enforce_retention`` leaves behind (50% of
      the store stale). The ``retired`` lane streams against that
      bloated store; the ``pruned`` lane first runs
      ``prune_bucket_store`` (timed) and streams against the reclaimed
      one — the measured payoff of the retention-interplay op;
    - ``bloom=True`` (round 11, lane ``near_dedup_bloom``): the
      band-bucket-VALUES bloom gate, pre-landed for the converged shape
      like the store run; records the deterministic mechanism metric
      (touched ``__bpart`` partitions for the first batch, gated vs
      ungated, plus the bloom-positive bucket fraction) beside the wall
      numbers — local warm disk underprices directory opens, an object
      store prices them per request, which is the 100 TB lever.
    """
    from pyspark.sql import functions as F

    from confluent_kafka_vector_search_prompt_inference_spark.operators.dedup import minhash_signatures
    from confluent_kafka_vector_search_prompt_inference_spark.streaming.pipeline import (
        band_buckets,
        bucket_store_partitions,
        file_stream_reader,
        near_dedup_insert,
        read_sink,
        write_bucket_delta,
    )

    sink = os.path.join(work, f"nd{tag}_sink_{rung}")
    ckpt = os.path.join(work, f"nd{tag}_ckpt_{rung}")
    # --- pre-land `rung` docs with signatures, exactly the writer's
    # layout (rows + the materialized bucket store). Epoch -1: the
    # stream's own epochs start at 0, and the idempotent writer SKIPS an
    # epoch whose dir is already committed — landing history as _batch=0
    # would silently swallow the first micro-batch.
    # pre-land parallelism: 32 range partitions put ~312k rows through
    # each signature task at the 10M rung — one observed run deadlocked
    # in the Arrow python-runner duplex protocol with both socket
    # buffers full (JVM epoll-waiting, worker in tcp_sendmsg) at exactly
    # that per-task volume. Smaller tasks keep each worker's in-flight
    # Arrow stream ~10× smaller and the pre-land is setup, not the
    # measured window, so the spread is free.
    landed = _synth_docs(spark, rung, seed=0).repartition(
        max(32, min(4096, rung // 4_000)), "doc_id"
    )
    sigs = minhash_signatures(landed, "doc_id", "text", num_hashes=64)
    # write-then-reread, NOT localCheckpoint(eager): the checkpoint holds
    # the whole keyed table (text + 64-long signature arrays) in the
    # block manager — ~7 GB at the 10M rung, which GCLocker-thrashes the
    # shared 8g local-mode heap to death. The sink epoch write is needed
    # anyway; re-reading it to derive the bucket delta costs one extra
    # scan of on-disk parquet and ZERO heap.
    landed.join(
        sigs.withColumnRenamed("minhash", "__minhash"), "doc_id"
    ).write.mode("overwrite").parquet(os.path.join(sink, "_batch=-1"))
    keyed = spark.read.parquet(os.path.join(sink, "_batch=-1"))
    # pre-land the bucket store through the writer's own helper, in the
    # PARTITIONED base layout — a long-running stream's history converges
    # to a compacted __bpart-partitioned base (the flat tail is only the
    # last compact_every micro-batches), so that is the honest shape for
    # rung-sized history
    buckets_dir = os.path.join(sink, "_buckets")
    write_bucket_delta(
        keyed.select(
            "doc_id",
            F.explode(
                band_buckets(F.col("__minhash"), num_hashes=64, bands=16)
            ).alias("__bucket"),
        ),
        buckets_dir,
        -1,
        num_partitions=bucket_store_partitions(buckets_dir, 64),
        layout="partitioned",
    )
    m_auto = None
    if bloom:
        # pre-land the gate bloom over the store's bucket VALUES with the
        # SAME auto-sized width the writer will compute — a mismatched
        # pre-land would reset + rebuild inside the timed window
        from confluent_kafka_vector_search_prompt_inference_spark.operators.membership import bloom_build
        from confluent_kafka_vector_search_prompt_inference_spark.streaming.pipeline import bloom_gate_auto_m_bits

        m_auto = bloom_gate_auto_m_bits(buckets_dir)
        bloom_build(
            keyed.select(
                F.explode(
                    band_buckets(F.col("__minhash"), num_hashes=64, bands=16)
                ).alias("__bucket")
            ).dropDuplicates(["__bucket"]),
            "__bucket", m_bits=m_auto, k=4,
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(sink, "_bloomgate", "_batch=-1")
        )
        with open(os.path.join(sink, "_bloomgate", "_bloom_meta.json"), "w") as fh:
            json.dump({"m_bits": m_auto, "k": 4}, fh)

    # --- fixed increment: fresh docs (seed 1) + 1% planted near-copies of
    # landed rows (seed 0 text of id mod rung, one token appended).
    # Micro-batch SIZE is held at 500 rows regardless of window length
    # (incoming scales with n_batches) so per-batch numbers stay
    # comparable across lanes with different window lengths.
    inc_rows = (INCOMING_ROWS // N_BATCHES) * n_batches
    inc = spark.range(inc_rows)
    fresh = _synth_docs(spark, inc_rows, id_offset=_ID_OFFSET, seed=1)
    planted_src = _synth_docs(spark, inc_rows, seed=0).select(
        F.col("doc_id").alias("__pid"), F.col("text").alias("__ptext")
    )
    incoming = (
        inc.select(
            F.col("id"),
            (F.col("id") + _ID_OFFSET).alias("doc_id"),
            F.pmod(F.col("id"), F.lit(min(rung, inc_rows))).alias("__pid"),
        )
        .join(F.broadcast(planted_src), "__pid")
        .join(
            fresh.select(F.col("doc_id"), F.col("text").alias("__ftext")), "doc_id"
        )
        .select(
            "doc_id",
            F.when(
                F.col("id") % PLANT_EVERY == 0,
                F.concat(F.col("__ptext"), F.lit(" zextra")),
            )
            .otherwise(F.col("__ftext"))
            .alias("text"),
        )
    )
    src = os.path.join(work, f"nd{tag}_src_{rung}")
    incoming.repartition(n_batches).write.parquet(src)
    schema = spark.read.parquet(src).schema

    mech = None
    if bloom:
        # deterministic mechanism metric on the real first batch BEFORE
        # streaming: touched __bpart partition dirs, ungated vs gated,
        # plus the bloom-positive bucket fraction. Wall time on warm
        # local disk underprices dir opens; an object store prices them
        # per request — the 100 TB lever the gate exists for.
        from confluent_kafka_vector_search_prompt_inference_spark.operators.membership import bloom_contains
        from confluent_kafka_vector_search_prompt_inference_spark.streaming.pipeline import _bloomgate_batch_reduced

        first = incoming.limit(inc_rows // n_batches)
        fsigs = minhash_signatures(first, "doc_id", "text", num_hashes=64)
        bvals = fsigs.select(
            F.explode(
                band_buckets(F.col("minhash"), num_hashes=64, bands=16)
            ).alias("__bucket")
        ).dropDuplicates(["__bucket"]).persist()
        n_parts = bucket_store_partitions(buckets_dir, 64)
        ungated = bvals.select(F.pmod("__bucket", F.lit(n_parts))).distinct().count()
        bl = _bloomgate_batch_reduced(
            spark, os.path.join(sink, "_bloomgate"), bvals, "__bucket",
            m_bits=m_auto, k=4,
        )
        pos = bloom_contains(
            bl, bvals, "__bucket", m_bits=m_auto, k=4
        ).filter("bloom_member").persist()
        gated = pos.select(F.pmod("__bucket", F.lit(n_parts))).distinct().count()
        mech = {
            "m_bits": m_auto,
            "batch_buckets": bvals.count(),
            "bloom_positive_buckets": pos.count(),
            "touched_parts_ungated": ungated,
            "touched_parts_gated": gated,
        }
        bvals.unpersist()
        pos.unpersist()

    if stale is not None:
        # ghost bucket rows: `rung` docs' worth of (id, band-bucket)
        # pairs whose ids exist nowhere in the sink — the exact residue
        # enforce_retention leaves when it retires sink epochs. Same 16
        # pairs per doc as real rows; ids offset far past every other
        # id family. Landed as their own partitioned epoch (-2).
        ghost = spark.range(rung).select(
            (F.col("id") + 900_000_000).alias("doc_id"),
            F.explode(
                F.array(*[F.xxhash64("id", F.lit(b)) for b in range(16)])
            ).alias("__bucket"),
        )
        write_bucket_delta(
            ghost, buckets_dir, -2,
            num_partitions=bucket_store_partitions(buckets_dir, 64),
            layout="partitioned",
        )
        prune_s = None
        if stale == "pruned":
            from confluent_kafka_vector_search_prompt_inference_spark.streaming.pipeline import prune_bucket_store

            t0 = time.time()
            prune_bucket_store(spark, sink, id_col="doc_id")
            prune_s = round(time.time() - t0, 1)

    if rebucket_to is not None:
        from confluent_kafka_vector_search_prompt_inference_spark.streaming.pipeline import rebucket_bucket_store

        t0 = time.time()
        rebucket_bucket_store(spark, buckets_dir, rebucket_to)
        rebucket_s = round(time.time() - t0, 1)

    store_rows_before = None
    if tombstone_ghosts:
        # retire the ghost docs ONLINE: land their tombstone and let the
        # stream's own maintenance folds drain the dead width in-window —
        # no prune_bucket_store, no stop
        from confluent_kafka_vector_search_prompt_inference_spark.streaming.pipeline import (
            read_bucket_store,
            retire_tombstone,
        )

        retire_tombstone(
            spark, sink,
            spark.range(rung).select(
                (F.col("id") + 900_000_000).alias("doc_id")
            ),
            id_col="doc_id", verified=True,
        )
        store_rows_before = read_bucket_store(
            spark, buckets_dir, "doc_id"
        ).count()

    def _run_count() -> int:
        from confluent_kafka_vector_search_prompt_inference_spark.streaming.pipeline import (
            _committed_batch_dirs,
            _is_compacted_run,
        )

        return sum(
            1 for d in _committed_batch_dirs(buckets_dir) if _is_compacted_run(d)
        )

    runs_timeline: list[int] = []
    stop_monitor = False
    monitor = None
    if monitor_runs:
        import threading

        def _poll():
            while not stop_monitor:
                try:
                    runs_timeline.append(_run_count())
                except OSError:
                    pass  # raced a fold's delete-then-rename window
                time.sleep(0.5)

        monitor = threading.Thread(target=_poll, daemon=True)
        monitor.start()

    t0 = time.time()
    q = near_dedup_insert(
        file_stream_reader(spark, src, schema),
        sink, ckpt,
        id_col="doc_id", text_col="text",
        compact_every=compact_every, bloom_gate=bloom, trigger_once=True,
    )
    q.awaitTermination(1800)
    wall = time.time() - t0
    if monitor is not None:
        stop_monitor = True
        monitor.join(2)
    stats = _progress_stats(q, wall, inc_rows)
    landed_after = read_sink(spark, sink).count()
    stats["landed_rows"] = landed_after - rung
    stats["dropped_rows"] = inc_rows - stats["landed_rows"]
    if mech is not None:
        stats["mechanism"] = mech
    if rebucket_to is not None:
        stats["rebucket_to"] = rebucket_to
        stats["rebucket_s"] = rebucket_s
    if stale is not None:
        stats["stale_ghost_docs"] = rung
        if stale == "pruned":
            stats["prune_s"] = prune_s
    if compact_every != 16:
        stats["compact_every"] = compact_every
        stats["bucket_runs"] = _run_count()  # bounded-run-count evidence
    if n_batches != N_BATCHES:
        stats["n_batches"] = n_batches
    if monitor_runs:
        # raw per-batch trigger durations: the merge spikes and the flat
        # batches around them, not just the p50/p95 compression
        prog = [
            p for p in (q.recentProgress or []) if p.get("numInputRows", 0) > 0
        ]
        stats["batch_ms"] = [
            int(p["durationMs"]["triggerExecution"]) for p in prog
        ]
        # run-length-encoded [run_count, consecutive_samples@2Hz]: the
        # raw 0.5 s samples are long and repetitive; the transitions are
        # the evidence (merges = count dropping, folds = count rising)
        rle: list[list[int]] = []
        for v in runs_timeline:
            if rle and rle[-1][0] == v:
                rle[-1][1] += 1
            else:
                rle.append([v, 1])
        stats["runs_timeline_rle"] = rle
        stats["max_runs_observed"] = max(runs_timeline, default=0)
    if tombstone_ghosts:
        from confluent_kafka_vector_search_prompt_inference_spark.streaming.pipeline import (
            _live_tombstones,
            read_bucket_store,
        )

        stats["store_rows_before"] = store_rows_before
        stats["store_rows_after"] = read_bucket_store(
            spark, buckets_dir, "doc_id"
        ).count()
        stats["tombstones_remaining"] = len(_live_tombstones(buckets_dir))
    return stats


def _exact_dedup_rung(
    spark, rung: int, work: str, *, prune: bool = True, bloom: bool = False,
    tag: str = "e",
) -> dict:
    """Round 10: dedup_insert's seen-set rides the bucket store
    (``__bucket = xxhash64(key)``) with partition-pruned reads. This
    rung pre-lands ``rung`` keys (sink rows + a partitioned store run,
    the long-running stream's converged shape), then streams the fixed
    2,000-row increment (1% exact re-deliveries of landed texts — rows
    the anti-join must DROP) through 4 micro-batches.
    ``prune=False`` is the A/B control: the same store scanned in full
    per batch — the pre-round-10 cost shape. ``bloom=True`` adds the
    landed-keys bloom gate (pre-landed for the converged shape, like
    the store run): only the bloom-positive sliver of each batch drives
    the candidate read, so with pruning on, the touched-partition count
    per batch falls from ~|batch| to ~(re-deliveries + fp)."""
    from pyspark.sql import functions as F

    from confluent_kafka_vector_search_prompt_inference_spark.operators.membership import bloom_build
    from confluent_kafka_vector_search_prompt_inference_spark.streaming.pipeline import (
        bucket_store_partitions,
        dedup_insert,
        file_stream_reader,
        read_sink,
        write_bucket_delta,
        write_ids_sidecar,
    )

    sink = os.path.join(work, f"xd{tag}_sink_{rung}")
    ckpt = os.path.join(work, f"xd{tag}_ckpt_{rung}")
    landed = _synth_docs(spark, rung, seed=0).select(
        "doc_id", "text", F.md5("text").alias("__fp")
    )
    landed.repartition(max(32, min(4096, rung // 20_000))).write.mode(
        "overwrite"
    ).parquet(os.path.join(sink, "_batch=-1"))
    keyed = spark.read.parquet(os.path.join(sink, "_batch=-1"))
    buckets_dir = os.path.join(sink, "_buckets")
    write_bucket_delta(
        keyed.select("__fp", F.xxhash64("__fp").alias("__bucket")).dropDuplicates(
            ["__fp"]
        ),
        buckets_dir, -1,
        num_partitions=bucket_store_partitions(buckets_dir, 1024),
        layout="partitioned",
    )
    write_ids_sidecar(spark, sink, -1, ["__fp"])
    m_auto = None
    if bloom:
        # (m_bits, k) must match what dedup_insert will compute — a
        # mismatched pre-land would reset + rebuild inside the timed
        # window (and a HARD mismatch would probe different bit
        # positions); the shared auto-sizing helper guarantees agreement
        from confluent_kafka_vector_search_prompt_inference_spark.streaming.pipeline import bloom_gate_auto_m_bits

        m_auto = bloom_gate_auto_m_bits(buckets_dir)
        bloom_build(keyed, "__fp", m_bits=m_auto, k=4).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(sink, "_bloomgate", "_batch=-1"))
        with open(os.path.join(sink, "_bloomgate", "_bloom_meta.json"), "w") as fh:
            json.dump({"m_bits": m_auto, "k": 4}, fh)

    inc = spark.range(INCOMING_ROWS)
    fresh = _synth_docs(spark, INCOMING_ROWS, id_offset=_ID_OFFSET, seed=1)
    planted_src = _synth_docs(spark, INCOMING_ROWS, seed=0).select(
        F.col("doc_id").alias("__pid"), F.col("text").alias("__ptext")
    )
    incoming = (
        inc.select(
            F.col("id"),
            (F.col("id") + _ID_OFFSET).alias("doc_id"),
            F.pmod(F.col("id"), F.lit(min(rung, INCOMING_ROWS))).alias("__pid"),
        )
        .join(F.broadcast(planted_src), "__pid")
        .join(fresh.select("doc_id", F.col("text").alias("__ftext")), "doc_id")
        .select(
            "doc_id",
            F.when(F.col("id") % PLANT_EVERY == 0, F.col("__ptext"))
            .otherwise(F.col("__ftext"))
            .alias("text"),
        )
    )
    src = os.path.join(work, f"xd{tag}_src_{rung}")
    incoming.repartition(N_BATCHES).write.parquet(src)
    schema = spark.read.parquet(src).schema

    mech = None
    if bloom:
        # deterministic mechanism metric, measured on the real first
        # batch BEFORE streaming: how many __bpart partition dirs the
        # batch's candidate read must open, ungated vs bloom-gated.
        # Wall time on local disk underprices this (dir opens are
        # ~free warm); an object store prices it per request, which is
        # the 100 TB lever the gate exists for.
        from confluent_kafka_vector_search_prompt_inference_spark.operators.membership import (
            bloom_contains,
            bloom_needed_words,
        )

        first = incoming.limit(INCOMING_ROWS // N_BATCHES).select(
            F.md5("text").alias("__fp")
        ).dropDuplicates(["__fp"])
        hashed = first.select("__fp", F.xxhash64("__fp").alias("__bucket"))
        ungated = (
            hashed.select(F.pmod("__bucket", F.lit(1024))).distinct().count()
        )
        need = bloom_needed_words(hashed, "__fp", m_bits=m_auto, k=4)
        bl = (
            spark.read.parquet(os.path.join(sink, "_bloomgate", "_batch=-1"))
            .join(F.broadcast(need), "word", "left_semi")
            .groupBy("word")
            .agg(F.bit_or("bits").alias("bits"))
        )
        pos = bloom_contains(
            bl, hashed, "__fp", m_bits=m_auto, k=4
        ).filter("bloom_member")
        gated = (
            pos.select(F.pmod("__bucket", F.lit(1024))).distinct().count()
        )
        mech = {
            "m_bits": m_auto,
            "batch_keys": first.count(),
            "bloom_positive_keys": pos.count(),
            "touched_parts_ungated": ungated,
            "touched_parts_gated": gated,
        }

    t0 = time.time()
    q = dedup_insert(
        file_stream_reader(spark, src, schema),
        sink, ckpt,
        key_expr=F.md5("text"), bucket_partitions=1024,
        prune_store_read=prune, bloom_gate=bloom, trigger_once=True,
    )
    q.awaitTermination(1800)
    stats = _progress_stats(q, time.time() - t0, INCOMING_ROWS)
    landed_after = read_sink(spark, sink).count()
    stats["landed_rows"] = landed_after - rung
    stats["dropped_rows"] = INCOMING_ROWS - stats["landed_rows"]
    if mech is not None:
        stats["mechanism"] = mech
    return stats


def _maintain_width_rung(spark, rung: int, work: str) -> dict:
    """Round 10: tombstone re-verify cost vs sink ROW WIDTH. The
    re-verify anti-join reads the sink's live ids every maintain call
    while a tombstone is unapplied; a 100 TB sink's rows are wide and
    its history is MANY epochs (one per micro-batch between retention
    bounds), and the question is whether re-verify cost rides along.
    Fixture per width ({narrow, ~2KB-filler rows}): ``rung`` docs landed
    as 128 committed epochs — the long-running stream's real shape —
    plus a tombstone for ``rung/10`` retired ghosts. Timed (min-of-2,
    SAME fixture for both paths so nothing else varies): the re-verify
    anti-join through (a) the full-sink projection (the pre-round-10
    path: per-epoch wide-file footers + column chunks), (b) the `_ids`
    sidecars (one tiny id file per epoch). The claim graded: (b) is
    flat across widths; (a) grows with width. Kill counts are asserted
    equal across paths — the A/B never trades exactness."""
    from pyspark.sql import functions as F

    from confluent_kafka_vector_search_prompt_inference_spark.operators.dedup import minhash_signatures
    from confluent_kafka_vector_search_prompt_inference_spark.streaming.pipeline import (
        _committed_batch_dirs,
        band_buckets,
        bucket_store_partitions,
        read_sink,
        read_sink_ids,
        retire_tombstone,
        write_bucket_delta,
        write_ids_sidecar,
    )

    epochs = 128
    ghosts = max(rung // 10, 1)
    out: dict = {
        "epochs": epochs, "ghost_docs": ghosts, "wide_filler_bytes": 2000,
        "note": (
            "measured twice on this host: the sidecar read is 1.4-2x "
            "cheaper than the full-sink projection at both widths; row "
            "width itself moves the fallback little here because parquet "
            "column pruning already skips the wide column's bytes at 128 "
            "files — the sidecar's 100 TB levers are footer size, file "
            "open count, and object-store latency, which local disk "
            "under-prices"
        ),
    }
    for width, filler in (("narrow", 0), ("wide", 2000)):
        sink = os.path.join(work, f"mw_{width}_{rung}")
        buckets_dir = os.path.join(sink, "_buckets")
        landed = _synth_docs(spark, rung, seed=0)
        if filler:
            landed = landed.withColumn("filler", F.repeat(F.lit("x"), filler))
        sigs = minhash_signatures(
            landed.repartition(max(32, min(4096, rung // 4_000)), "doc_id"),
            "doc_id", "text", num_hashes=64,
        )
        keyed = landed.join(
            sigs.withColumnRenamed("minhash", "__minhash"), "doc_id"
        ).withColumn(
            "__epoch", F.pmod(F.xxhash64("doc_id"), F.lit(epochs)).cast("int")
        )
        # one write job, split into per-epoch committed dirs afterwards
        # (a real stream writes them one by one; the layout is identical)
        staged = os.path.join(work, f"mw_stage_{width}_{rung}")
        keyed.repartition(epochs, "__epoch").write.partitionBy(
            "__epoch"
        ).mode("overwrite").parquet(staged)
        os.makedirs(sink, exist_ok=True)
        for e in range(epochs):
            src = os.path.join(staged, f"__epoch={e}")
            dst = os.path.join(sink, f"_batch={e - epochs}")
            os.rename(src, dst)
            open(os.path.join(dst, "_SUCCESS"), "w").close()
        shutil.rmtree(staged, ignore_errors=True)
        write_bucket_delta(
            read_sink(spark, sink).select(
                "doc_id",
                F.explode(
                    band_buckets(F.col("__minhash"), num_hashes=64, bands=16)
                ).alias("__bucket"),
            ),
            buckets_dir, -1,
            num_partitions=bucket_store_partitions(buckets_dir, 64),
            layout="partitioned",
        )
        retire_tombstone(
            spark, sink,
            spark.range(ghosts).select(
                (F.col("id") + 900_000_000).alias("doc_id")
            ),
            id_col="doc_id", verified=True,
        )
        import glob as _glob

        tomb = spark.read.parquet(
            *sorted(_glob.glob(os.path.join(buckets_dir, "_tombstones", "t=*")))
        ).select("doc_id")

        def _time_kill(live_df) -> tuple[float, int]:
            best, count = float("inf"), -1
            for _ in range(2):
                t0 = time.time()
                count = tomb.join(live_df, "doc_id", "left_anti").count()
                best = min(best, time.time() - t0)
            return round(best, 2), count

        fb_s, fb_n = _time_kill(read_sink(spark, sink).select("doc_id"))
        for e in range(epochs):
            write_ids_sidecar(spark, sink, e - epochs, ["doc_id"])
        sc_s, sc_n = _time_kill(read_sink_ids(spark, sink, ["doc_id"]))
        assert fb_n == sc_n == ghosts, (fb_n, sc_n, ghosts)
        assert len(_committed_batch_dirs(sink)) == epochs
        out[f"{width}_fallback_reverify_s"] = fb_s
        out[f"{width}_sidecar_reverify_s"] = sc_s
        shutil.rmtree(sink, ignore_errors=True)
    return out


def _rebucket_drain_rung(spark, rung: int, work: str) -> dict:
    """Round 10: `max_nudges_per_call` drains a deep online migration
    proportionally faster. The store is pre-landed as 8 compacted runs
    of rung/8 docs' bucket pairs; a rebucket to 512 partitions is
    requested; maintenance calls run back to back at budget 1 vs 4 —
    calls-to-drain and wall seconds recorded (the budget trades batch
    latency for drain wall-clock; per-call work stays bounded)."""
    from pyspark.sql import functions as F

    from confluent_kafka_vector_search_prompt_inference_spark.streaming.pipeline import (
        bucket_store_partitions,
        maintain_bucket_store,
        request_rebucket_online,
        write_bucket_delta,
    )

    runs = 8
    per = max(rung // runs, 1)
    out: dict = {"runs": runs, "target_partitions": 512}
    for budget in (1, 4):
        sink = os.path.join(work, f"rd_{budget}_{rung}")
        buckets_dir = os.path.join(sink, "_buckets")
        os.makedirs(sink, exist_ok=True)
        for e in range(runs):
            pairs = spark.range(per).select(
                (F.col("id") + e * per).alias("doc_id"),
                F.explode(
                    F.array(*[F.xxhash64("id", F.lit(b)) for b in range(16)])
                ).alias("__bucket"),
            )
            write_bucket_delta(
                pairs, buckets_dir, e - runs,
                num_partitions=bucket_store_partitions(buckets_dir, 64),
                layout="partitioned",
            )
        request_rebucket_online(buckets_dir, 512)
        calls = 0
        t0 = time.time()
        while True:
            stats = maintain_bucket_store(
                spark, sink, id_col="doc_id", bucket_partitions=64,
                compact_every=10**9, max_nudges_per_call=budget,
            )
            calls += 1
            if stats["nudged"] == 0 or calls > 100:
                break
        out[f"budget_{budget}"] = {
            "calls_to_drain": calls,
            "wall_s": round(time.time() - t0, 2),
        }
        shutil.rmtree(sink, ignore_errors=True)
    return out


def _synth_vectors(spark, n: int, *, id_offset: int = 0, seed: int = 0, dim: int = 64):
    from pyspark.sql import functions as F

    return spark.range(n).select(
        (F.col("id") + id_offset).alias("cid"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: (
                F.pmod(F.xxhash64(F.col("id"), i, F.lit(seed)), F.lit(1000)) / 500.0
                - 1.0
            ),
        )
        .cast("array<float>")
        .alias("vector"),
    )


def _ivf_rung(spark, rung: int, work: str) -> dict:
    """History CONTROL lane: ivf_insert reads only the tiny centroid
    table per batch (assign + append), so its throughput should be FLAT
    in landed history — a measured baseline that separates 'history
    cost' (near_dedup) from 'micro-batch overhead' (this)."""
    from pyspark.sql import functions as F

    from confluent_kafka_vector_search_prompt_inference_spark.operators.ivf import build_ivf_index, save_ivf_index
    from confluent_kafka_vector_search_prompt_inference_spark.streaming.pipeline import file_stream_reader, ivf_insert

    idx = os.path.join(work, f"ivf_idx_{rung}")
    ckpt = os.path.join(work, f"ivf_ckpt_{rung}")
    # pre-land `rung` vectors exactly as the lane's own epochs would:
    # centroids table + epoch dirs under corpus/_batch=<neg>/cluster=*
    landed = _synth_vectors(spark, rung, seed=4)
    indexed, cents = build_ivf_index(landed, "vector", n_clusters=16, seed=42)
    save_ivf_index(indexed, cents, os.path.join(work, f"ivf_seed_{rung}"))
    os.makedirs(os.path.join(idx))
    os.rename(
        os.path.join(work, f"ivf_seed_{rung}", "centroids"),
        os.path.join(idx, "centroids"),
    )
    os.makedirs(os.path.join(idx, "corpus"), exist_ok=True)
    os.rename(
        os.path.join(work, f"ivf_seed_{rung}", "corpus"),
        os.path.join(idx, "corpus", "_batch=-1"),
    )
    open(os.path.join(idx, "corpus", "_batch=-1", "_SUCCESS"), "a").close()

    inc = _synth_vectors(spark, INCOMING_ROWS, id_offset=_ID_OFFSET, seed=5)
    src = os.path.join(work, f"ivf_src_{rung}")
    inc.repartition(N_BATCHES).write.parquet(src)
    schema = spark.read.parquet(src).schema
    t0 = time.time()
    q = ivf_insert(
        file_stream_reader(spark, src, schema), idx, ckpt,
        vec_col="vector", n_clusters=16, trigger_once=True,
    )
    q.awaitTermination(1800)
    return _progress_stats(q, time.time() - t0, INCOMING_ROWS)


def _sketch_rung(spark, rung: int, work: str) -> dict:
    """Second control lane: sketch state is depth×width cells regardless
    of history (deltas are written, never read, on the insert path)."""
    from pyspark.sql import functions as F

    from confluent_kafka_vector_search_prompt_inference_spark.operators.sketches import countmin_build
    from confluent_kafka_vector_search_prompt_inference_spark.streaming.pipeline import file_stream_reader, sketch_insert

    sink = os.path.join(work, f"sk_sink_{rung}")
    ckpt = os.path.join(work, f"sk_ckpt_{rung}")
    terms_of = lambda df: df.select(  # noqa: E731
        "doc_id",
        F.explode(
            F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != "")
        ).alias("term"),
    )
    landed = terms_of(_synth_docs(spark, rung, seed=6))
    landed.write.mode("overwrite").parquet(os.path.join(sink, "_batch=-1"))
    countmin_build(landed, "term", depth=4, width=2048).write.mode(
        "overwrite"
    ).parquet(os.path.join(sink, "_sketch", "_batch=-1"))

    inc = terms_of(_synth_docs(spark, INCOMING_ROWS, id_offset=_ID_OFFSET, seed=7))
    n_inc = inc.count()
    src = os.path.join(work, f"sk_src_{rung}")
    inc.repartition(N_BATCHES).write.parquet(src)
    schema = spark.read.parquet(src).schema
    t0 = time.time()
    q = sketch_insert(
        file_stream_reader(spark, src, schema), sink, ckpt,
        term_col="term", trigger_once=True,
    )
    q.awaitTermination(1800)
    return _progress_stats(q, time.time() - t0, n_inc)


def _rag_rung(spark, rung: int, work: str) -> dict:
    from pyspark.sql import functions as F

    from confluent_kafka_vector_search_prompt_inference_spark.models import (
        HashingEmbedder,
        ModelRegistry,
        TemplateLLM,
    )
    from confluent_kafka_vector_search_prompt_inference_spark.streaming.pipeline import (
        continuous_insert,
        file_stream_reader,
    )
    from confluent_kafka_vector_search_prompt_inference_spark.streaming.rag import RagPipeline

    registry = ModelRegistry()
    registry.create_model("vector_encoding", "embedding", HashingEmbedder(dim=64))
    registry.create_model("retail_assistant", "text_generation", TemplateLLM())
    pipe = RagPipeline(registry, k=3)
    corpus_docs = _synth_docs(spark, rung, seed=2).select(
        F.col("doc_id").alias("product_id"), F.col("text").alias("content")
    )
    corpus = registry.ml_predict(corpus_docs, "vector_encoding", "content").cache()
    corpus.count()  # index build cost stays out of the timed loop

    questions = _synth_docs(spark, INCOMING_ROWS, id_offset=_ID_OFFSET, seed=3).select(
        F.lit("user").alias("role"),
        F.col("text").alias("content"),
        F.col("doc_id").cast("string").alias("sessionid"),
    )
    src = os.path.join(work, f"rag_src_{rung}")
    questions.repartition(N_BATCHES).write.parquet(src)
    schema = spark.read.parquet(src).schema

    # transform construction prepares the corpus broadcast — one-time
    # index-build-shaped cost, outside the timed loop like the .cache()
    transform = pipe.streaming_transform(corpus)
    t0 = time.time()
    q = continuous_insert(
        file_stream_reader(spark, src, schema),
        os.path.join(work, f"rag_sink_{rung}"),
        os.path.join(work, f"rag_ckpt_{rung}"),
        transform=transform,
        trigger_once=True,
    )
    q.awaitTermination(1800)
    stats = _progress_stats(q, time.time() - t0, INCOMING_ROWS)
    corpus.unpersist()
    if getattr(transform, "prepared", None) is not None:
        transform.prepared.unpersist()  # don't leak rung broadcasts
    return stats


def _rag_ivf_rung(spark, rung: int, work: str) -> dict:
    """The documented steady-state lane past the exact-broadcast wall:
    RAG retrieval over a PERSISTED IVF index (``vector_index=``) — the
    probe reads ``n_probe/n_clusters`` of the corpus via partition
    pruning instead of matmul-scanning a broadcast, so this lane is the
    one that should stay fast at 1M where exact ``rag_transform``
    hits its matmul ceiling."""
    from pyspark.sql import functions as F

    from confluent_kafka_vector_search_prompt_inference_spark.models import (
        HashingEmbedder,
        ModelRegistry,
        TemplateLLM,
    )
    from confluent_kafka_vector_search_prompt_inference_spark.operators.ivf import build_ivf_index, save_ivf_index
    from confluent_kafka_vector_search_prompt_inference_spark.streaming.pipeline import (
        continuous_insert,
        file_stream_reader,
    )
    from confluent_kafka_vector_search_prompt_inference_spark.streaming.rag import RagPipeline

    registry = ModelRegistry()
    registry.create_model("vector_encoding", "embedding", HashingEmbedder(dim=64))
    registry.create_model("retail_assistant", "text_generation", TemplateLLM())
    # same per-task-volume cap as the near-dedup pre-land: the corpus
    # embeds through an Arrow python runner, and ~312k-row tasks at the
    # 10M rung risk the duplex-buffer deadlock documented there
    corpus_docs = _synth_docs(spark, rung, seed=2).repartition(
        max(32, min(4096, rung // 4_000)), "doc_id"
    ).select(
        F.col("doc_id").alias("product_id"), F.col("text").alias("content")
    )
    corpus = registry.ml_predict(corpus_docs, "vector_encoding", "content")
    idx = os.path.join(work, f"ragivf_idx_{rung}")
    # n_clusters ≈ √n (the standard IVF sizing): probe cost per query is
    # n_probe/n_clusters of the corpus, so a cluster count that doesn't
    # grow with the corpus silently degrades the probe into a near-scan
    # (measured: 64 clusters at 1M rows = 12.5% of the corpus re-scored
    # per query through the Catalyst dot product — slower than BLAS
    # matmul over 100%)
    n_clusters = max(64, int(rung ** 0.5))
    indexed, cents = build_ivf_index(corpus, "vector", n_clusters=n_clusters, seed=42)
    save_ivf_index(indexed, cents, idx)

    pipe = RagPipeline(registry, k=3, vector_index=idx, n_probe=8)
    questions = _synth_docs(spark, INCOMING_ROWS, id_offset=_ID_OFFSET, seed=3).select(
        F.lit("user").alias("role"),
        F.col("text").alias("content"),
        F.col("doc_id").cast("string").alias("sessionid"),
    )
    src = os.path.join(work, f"ragivf_src_{rung}")
    questions.repartition(N_BATCHES).write.parquet(src)
    schema = spark.read.parquet(src).schema
    transform = pipe.streaming_transform()
    t0 = time.time()
    q = continuous_insert(
        file_stream_reader(spark, src, schema),
        os.path.join(work, f"ragivf_sink_{rung}"),
        os.path.join(work, f"ragivf_ckpt_{rung}"),
        transform=transform,
        trigger_once=True,
    )
    q.awaitTermination(1800)
    stats = _progress_stats(q, time.time() - t0, INCOMING_ROWS)
    pipe.release()  # drop the rung's persisted index snapshot
    return stats


def _add_slowdowns(rows: dict) -> None:
    """Per-decade slowdown factors: rps(rung)/rps(10·rung). 10.0 would be
    linear-in-history; ≪ 10 is the sub-linear target. Non-rung keys
    (notes, the phase-decomposition section's fields) are ignored."""
    rungs = sorted(int(r) for r in rows if r.lstrip("-").isdigit())
    for lo, hi in zip(rungs, rungs[1:]):
        a, b = rows[str(lo)], rows[str(hi)]
        if a.get("rows_per_sec") and b.get("rows_per_sec"):
            rows[f"slowdown_{lo}_to_{hi}"] = round(
                a["rows_per_sec"] / b["rows_per_sec"], 2
            )


def _spanclean_rung(
    spark, rung: int, work: str, *, prune: bool | None = None, tag: str = "sp",
    carrier: bool = False,
) -> dict:
    """Round 10 streaming span removal (`spanclean_insert`): pre-land
    ``rung`` docs and their CONVERGED gram store (one partitioned base
    run — the shape a long-running stream's folds converge to), then
    stream the fixed 2,000-row increment through 4 micro-batches. 1% of
    incoming rows are verbatim re-deliveries of landed TEXTS — every
    gram already carried, so the whole doc must land fully cut
    (``n_kept = 0``); the mechanism columns record that check beside the
    throughput. ``prune`` forces the store-read mode: ``None`` means
    pruning is ALWAYS OFF for the gram store (``spanclean_insert`` has
    no size gate by design — a batch's ~13k gram hashes touch every
    partition, so the prune machinery can never win; see its docstring),
    ``True`` forces the dead machinery on (the A/B control).
    ``carrier=True`` (round 11, lane ``spanclean_carrier``) runs the
    retention-integrated CARRIER-COUNTED store: the pre-land carries
    per-gram carrier counts and the batch path pays the extra long
    column plus the candidate-bounded count-sum — this rung prices that
    against the uncounted default."""
    import glob as _glob

    from pyspark.sql import functions as F

    from confluent_kafka_vector_search_prompt_inference_spark.operators.dedup import (
        gram_occurrences,
        span_tokenized,
    )
    from confluent_kafka_vector_search_prompt_inference_spark.streaming.pipeline import (
        file_stream_reader,
        spanclean_insert,
        write_bucket_delta,
    )

    sink = os.path.join(work, f"{tag}_sink_{rung}")
    ckpt = os.path.join(work, f"{tag}_ckpt_{rung}")
    landed = _synth_docs(spark, rung, seed=0)
    landed.repartition(max(32, min(4096, rung // 20_000))).write.mode(
        "overwrite"
    ).parquet(os.path.join(sink, "_batch=-1"))
    rows = spark.read.parquet(os.path.join(sink, "_batch=-1"))
    occ_pre = gram_occurrences(span_tokenized(rows, "doc_id", "text"), 5)
    if carrier:
        delta_pre = occ_pre.groupBy("__s").agg(
            F.count_distinct("__id").cast("long").alias("__cnt")
        ).withColumn("__bucket", F.xxhash64("__s"))
        os.makedirs(os.path.join(sink, "_grams"), exist_ok=True)
        with open(os.path.join(sink, "_grams", "_mode.json"), "w") as fh:
            json.dump({"carrier_counts": True}, fh)
    else:
        delta_pre = (
            occ_pre.select("__s")
            .dropDuplicates(["__s"])
            .withColumn("__bucket", F.xxhash64("__s"))
        )
    write_bucket_delta(
        delta_pre,
        os.path.join(sink, "_grams"), -1,
        num_partitions=64, layout="partitioned",
    )

    inc = spark.range(INCOMING_ROWS)
    fresh = _synth_docs(spark, INCOMING_ROWS, id_offset=_ID_OFFSET, seed=1)
    planted_src = _synth_docs(spark, INCOMING_ROWS, seed=0).select(
        F.col("doc_id").alias("__pid"), F.col("text").alias("__ptext")
    )
    incoming = (
        inc.select(
            F.col("id"),
            (F.col("id") + _ID_OFFSET).alias("doc_id"),
            F.pmod(F.col("id"), F.lit(min(rung, INCOMING_ROWS))).alias("__pid"),
        )
        .join(F.broadcast(planted_src), "__pid")
        .join(fresh.select("doc_id", F.col("text").alias("__ftext")), "doc_id")
        .select(
            "doc_id",
            F.when(F.col("id") % PLANT_EVERY == 0, F.col("__ptext"))
            .otherwise(F.col("__ftext"))
            .alias("text"),
        )
    )
    src = os.path.join(work, f"{tag}_src_{rung}")
    incoming.repartition(N_BATCHES).write.parquet(src)
    schema = spark.read.parquet(src).schema

    t0 = time.time()
    q = spanclean_insert(
        file_stream_reader(spark, src, schema),
        sink, ckpt,
        id_col="doc_id", text_col="text",
        prune_store_read=prune, carrier_counts=carrier, trigger_once=True,
    )
    q.awaitTermination(1800)
    stats = _progress_stats(q, time.time() - t0, INCOMING_ROWS)
    new_dirs = [
        d
        for d in _glob.glob(os.path.join(sink, "_batch=*"))
        if not d.endswith("=-1") and os.path.exists(os.path.join(d, "_SUCCESS"))
    ]
    out = spark.read.parquet(*new_dirs)
    planted = out.filter(F.pmod(F.col("doc_id") - _ID_OFFSET, F.lit(PLANT_EVERY)) == 0)
    stats["planted_docs"] = planted.count()
    stats["planted_docs_fully_cut"] = planted.filter(F.col("n_kept") == 0).count()
    return stats


def _upsert_rung(
    spark, rung: int, work: str, *, compacted: bool = True, tag: str = "up",
    shed: bool | None = None,
) -> dict:
    """Round 10 keyed upsert (`keyed_upsert_insert`): the rung is TOTAL
    HISTORICAL UPDATE VOLUME over a fixed 10k-key space — the axis log
    compaction exists for. ``compacted=True`` pre-lands the converged
    base (latest-per-key, ~10k rows — what the lane's folds produce);
    the control pre-lands the SAME history unreduced (``rung`` rows),
    which is what an append-only sink would make every read aggregate.
    Streams the fixed 2,000-update increment through 4 batches, then
    times one ``read_upserted`` materialization. The claim under test:
    with compaction, per-batch cost and read cost are bounded by |keys|
    + tail, FLAT in update volume; without it they grow linearly.

    ``shed`` (round 11, lane ``keyed_upsert_shed``): 20% of the
    increment's rows are TOMBSTONES; ``shed=True`` runs with
    ``shed_tombstones_after=0`` (seq here is monotone, so every
    dominated tombstone sheds at the next fold), ``shed=False`` keeps
    them forever (the pre-round-11 default) — the recorded
    ``base_rows`` / ``base_tombstones`` pair is the convergence claim:
    shed ≈ |live keys|, unshed ≈ |live + dead keys|."""
    from pyspark.sql import functions as F

    from confluent_kafka_vector_search_prompt_inference_spark.streaming.pipeline import (
        file_stream_reader,
        keyed_upsert_insert,
        read_upserted,
    )

    n_keys = 10_000
    sink = os.path.join(work, f"{tag}_sink_{rung}")
    ckpt = os.path.join(work, f"{tag}_ckpt_{rung}")
    hist = spark.range(rung).select(
        F.pmod(F.xxhash64("id"), F.lit(n_keys)).alias("k"),
        F.col("id").alias("seq"),
        F.concat(F.lit("v"), F.col("id")).alias("val"),
        F.lit(False).alias("dead"),
        F.lit(-1).cast("long").alias("__epoch"),
    )
    if compacted:
        hist = (
            hist.groupBy("k")
            .agg(F.max(F.struct("seq", "__epoch", F.struct("k", "seq", "val", "dead", "__epoch").alias("r"))).alias("t"))
            .select("t.r.*")
        )
    hist.repartition(max(8, min(512, rung // 50_000))).write.mode(
        "overwrite"
    ).parquet(os.path.join(sink, "_batch=-1"))

    incoming = spark.range(INCOMING_ROWS).select(
        F.pmod(F.xxhash64(F.col("id") + 7), F.lit(n_keys)).alias("k"),
        (F.col("id") + rung).alias("seq"),
        F.concat(F.lit("u"), F.col("id")).alias("val"),
        (
            (F.pmod(F.col("id"), F.lit(5)) == 0)
            if shed is not None
            else F.lit(False)
        ).alias("dead"),
    )
    src = os.path.join(work, f"{tag}_src_{rung}")
    incoming.repartition(N_BATCHES).write.parquet(src)
    schema = spark.read.parquet(src).schema

    t0 = time.time()
    q = keyed_upsert_insert(
        file_stream_reader(spark, src, schema),
        sink, ckpt,
        key_col="k", seq_cols=["seq"], tombstone_col="dead",
        shed_tombstones_after=(0 if shed else None),
        compact_every=(2 if compacted else 10**9),
        trigger_once=True,
    )
    q.awaitTermination(1800)
    stats = _progress_stats(q, time.time() - t0, INCOMING_ROWS)
    t0 = time.time()
    live = read_upserted(
        spark, sink, key_col="k", seq_cols=["seq"], tombstone_col="dead"
    ).count()
    stats["read_sec"] = round(time.time() - t0, 2)
    stats["live_keys"] = live
    if shed is not None:
        from confluent_kafka_vector_search_prompt_inference_spark.streaming.pipeline import _committed_batch_dirs

        base = spark.read.parquet(_committed_batch_dirs(sink)[0])
        stats["base_rows"] = base.count()
        stats["base_tombstones"] = base.filter("dead").count()
    return stats


def _stateful_window_rung(
    spark, rung: int, work: str, *, session: bool = False, tag: str = "sw",
    n_rows: int = 200_000,
) -> dict:
    """Round 12: state-growth rungs for the NATIVE stateful event-time
    window lanes (bench ``events_sliding_stream`` / ``events_session_stream``
    carry one bench point each — this ladders their actual 100 TB risk,
    STATE-STORE growth). The rung is KEY CARDINALITY; the INPUT is
    FIXED (200k rows, 4 event-time-ordered micro-batches): rows/sec
    movement across rungs therefore isolates the cost of state, not
    input — the fixed-input design IS the control, and the recorded
    ``state_rows_max`` (max ``stateOperators.numRowsTotal`` over the
    progress log) proves the state actually grew with the rung.

    Sliding: 1 h windows sliding 30 m over a ~5.5 h event-time span,
    watermark 1 h — each key holds its in-flight window set until the
    per-batch watermark advance evicts behind it. Session: 5-minute-gap
    sessions — at low rungs every key re-fires inside the gap (one long
    open session per key); at high rungs per-key gaps exceed 5 m and
    sessions close as the watermark passes, so open-session count
    tracks the rung either way."""
    from pyspark.sql import functions as F

    from confluent_kafka_vector_search_prompt_inference_spark.streaming.pipeline import (
        file_stream_reader,
        idempotent_batch_writer,
    )

    keys = min(rung, n_rows)
    src = os.path.join(work, f"{tag}_src_{rung}")
    sink = os.path.join(work, f"{tag}_sink_{rung}")
    ckpt = os.path.join(work, f"{tag}_ckpt_{rung}")
    base_ts = 1_700_000_000
    ev = spark.range(n_rows).select(
        "id",
        F.timestamp_seconds(F.lit(base_ts) + F.col("id") / F.lit(10.0)).alias(
            "ts"
        ),
        F.concat(F.lit("k"), F.pmod(F.xxhash64("id"), F.lit(keys))).alias(
            "key"
        ),
        (F.col("id") % 100).cast("double").alias("value"),
    )
    # event-time-ordered slices written sequentially: the file source
    # picks them up oldest-first, so the watermark advances per batch
    # and eviction actually runs (a shuffled split would hold ALL state
    # to the end and measure nothing but the final flush)
    for b in range(N_BATCHES):
        lo = b * n_rows // N_BATCHES
        hi = (b + 1) * n_rows // N_BATCHES
        (
            ev.filter((F.col("id") >= lo) & (F.col("id") < hi))
            .drop("id")
            .coalesce(1)
            .write.mode("append")
            .parquet(src)
        )
    schema = spark.read.parquet(src).schema
    stream = file_stream_reader(spark, src, schema).withWatermark("ts", "1 hour")
    if session:
        out_df = (
            stream.groupBy(
                F.session_window("ts", "5 minutes").alias("w"), "key"
            )
            .agg(F.count("*").alias("n"))
            .select(F.col("w.start").alias("ws"), "key", "n")
        )
    else:
        out_df = (
            stream.groupBy(
                F.window("ts", "1 hour", "30 minutes").alias("w"), "key"
            )
            .agg(F.count("*").alias("n"), F.sum("value").alias("sv"))
            .select(F.col("w.start").alias("ws"), "key", "n", "sv")
        )
    t0 = time.time()
    q = (
        out_df.writeStream.outputMode("append")
        .foreachBatch(idempotent_batch_writer(sink))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(1800)
    stats = _progress_stats(q, time.time() - t0, n_rows)
    state_rows = 0
    for p in q.recentProgress or []:
        for so in p.get("stateOperators", []) or []:
            state_rows = max(state_rows, int(so.get("numRowsTotal", 0)))
    stats["state_rows_max"] = state_rows
    stats["distinct_keys"] = keys
    return stats


def _mg_groups_rung(
    spark, rung: int, work: str, *, cap: int | None = None, tag: str = "mgg",
    n_rows: int = 200_000,
) -> dict:
    """Round 12: the grouped-MG GROUP-CARDINALITY axis over a FIXED
    200k-item input (4 batches) — pricing the round-11 caveat that
    per-partition Python state is ``k · |groups seen|`` dict entries
    with no bound. ``cap`` runs the round-12 escape hatch
    (``max_groups_per_partition``): overflow groups spill exact
    batch-preaggregated rows instead of holding state — the recorded
    ``delta_rows`` makes the spill's output-size trade visible next to
    the wall numbers."""
    from pyspark.sql import functions as F

    from confluent_kafka_vector_search_prompt_inference_spark.streaming.pipeline import (
        _committed_batch_dirs,
        file_stream_reader,
        mg_insert,
        read_corpus_mg,
    )

    groups = min(rung, n_rows)
    src = os.path.join(work, f"{tag}_src_{rung}")
    sink = os.path.join(work, f"{tag}_sink_{rung}")
    ckpt = os.path.join(work, f"{tag}_ckpt_{rung}")
    rows = spark.range(n_rows).select(
        F.concat(F.lit("g"), F.pmod(F.xxhash64("id"), F.lit(groups))).alias(
            "g"
        ),
        F.concat(
            F.lit("t"), F.pmod(F.xxhash64(F.col("id") + 3), F.lit(97))
        ).alias("item"),
    )
    rows.repartition(N_BATCHES).write.parquet(src)
    schema = spark.read.parquet(src).schema
    t0 = time.time()
    q = mg_insert(
        file_stream_reader(spark, src, schema),
        sink,
        ckpt,
        item_col="item",
        k=16,
        group_cols=["g"],
        max_groups_per_partition=cap,
        trigger_once=True,
    )
    q.awaitTermination(1800)
    stats = _progress_stats(q, time.time() - t0, n_rows)
    stats["delta_rows"] = spark.read.parquet(
        *_committed_batch_dirs(os.path.join(sink, "_mg"))
    ).count()
    t0 = time.time()
    stats["summary_rows"] = read_corpus_mg(
        spark, sink, k=16, group_cols=["g"]
    ).count()
    stats["summary_sec"] = round(time.time() - t0, 2)
    stats["distinct_groups"] = groups
    return stats


def _kmv_groups_rung(
    spark, rung: int, work: str, tag: str = "kvg", n_rows: int = 200_000
) -> dict:
    """Round 12: the grouped-KMV SET-CARDINALITY axis over a FIXED
    200k-key input (4 batches) — the per-source distinct/overlap store
    maintained online (``kmv_insert(set_cols=)``); deltas are ≤ k rows
    PER SET, so the recorded ``delta_rows`` should track rung · k and
    the read-side merge (grouped rank window over sketch-scale rows)
    prices the summary."""
    from pyspark.sql import functions as F

    from confluent_kafka_vector_search_prompt_inference_spark.operators.membership import kmv_distinct
    from confluent_kafka_vector_search_prompt_inference_spark.streaming.pipeline import (
        _committed_batch_dirs,
        file_stream_reader,
        kmv_insert,
        read_corpus_kmv,
    )

    sets = min(rung, n_rows)
    src = os.path.join(work, f"{tag}_src_{rung}")
    sink = os.path.join(work, f"{tag}_sink_{rung}")
    ckpt = os.path.join(work, f"{tag}_ckpt_{rung}")
    k = 64
    rows = spark.range(n_rows).select(
        F.concat(F.lit("s"), F.pmod(F.xxhash64("id"), F.lit(sets))).alias("g"),
        F.concat(F.lit("u"), F.col("id")).alias("key"),
    )
    rows.repartition(N_BATCHES).write.parquet(src)
    schema = spark.read.parquet(src).schema
    t0 = time.time()
    q = kmv_insert(
        file_stream_reader(spark, src, schema),
        sink,
        ckpt,
        key_col="key",
        k=k,
        set_cols=["g"],
        trigger_once=True,
    )
    q.awaitTermination(1800)
    stats = _progress_stats(q, time.time() - t0, n_rows)
    stats["delta_rows"] = spark.read.parquet(
        *_committed_batch_dirs(os.path.join(sink, "_kmv"))
    ).count()
    t0 = time.time()
    stats["summary_rows"] = kmv_distinct(
        read_corpus_kmv(spark, sink, k=k, set_cols=["g"]),
        k=k,
        set_cols=["g"],
    ).count()
    stats["summary_sec"] = round(time.time() - t0, 2)
    stats["distinct_sets"] = sets
    return stats


def _lineclean_rung(
    spark, rung: int, work: str, tag: str = "lc", n_sites: int = 20
) -> dict:
    """Round 12: streaming line-level boilerplate removal
    (``lineclean_insert``): pre-land ``rung`` multi-line pages across
    ``n_sites`` sites and their CONVERGED line store (per-site nav
    header + copyright footer each carried by rung/n_sites docs — far
    over the 0.25 gate — plus 3 unique body lines per doc, the store's
    unbounded part), then stream the fixed 2,000-page increment through
    4 micro-batches. Mechanism check: every incoming page must land
    with BOTH site boilerplate lines cut (``boilerplate_cut_rows``)
    and all 3 body lines kept — recorded beside the throughput, so a
    store-scan regression and a semantics regression are separately
    visible."""
    from pyspark.sql import functions as F

    from confluent_kafka_vector_search_prompt_inference_spark.streaming.pipeline import (
        _lineclean_tables,
        file_stream_reader,
        lineclean_insert,
        read_bucket_store,
        read_sink,
        write_bucket_delta,
    )

    sink = os.path.join(work, f"{tag}_sink_{rung}")
    ckpt = os.path.join(work, f"{tag}_ckpt_{rung}")

    def pages(n: int, *, id_offset: int = 0, seed: int = 0):
        site = F.concat(
            F.lit("s"), F.pmod(F.col("doc_id"), F.lit(n_sites))
        ).alias("site")
        body = F.transform(
            F.sequence(F.lit(0), F.lit(2)),
            lambda i: F.concat(
                F.lit("body "),
                F.pmod(F.xxhash64(F.col("doc_id"), i, F.lit(seed)), F.lit(1 << 40)),
            ),
        )
        return spark.range(n).select(
            (F.col("id") + id_offset).alias("doc_id")
        ).select(
            "doc_id",
            site,
        ).select(
            "doc_id",
            "site",
            F.array_join(
                F.concat(
                    F.array(F.concat(F.lit("nav "), F.col("site"), F.lit(" home"))),
                    body,
                    F.array(F.concat(F.lit("copyright "), F.col("site"))),
                ),
                "\n",
            ).alias("page"),
        )

    landed = pages(rung, seed=0)
    landed.repartition(max(32, min(4096, rung // 20_000))).write.mode(
        "overwrite"
    ).parquet(os.path.join(sink, "_batch=-1"))
    rows = spark.read.parquet(os.path.join(sink, "_batch=-1"))
    _, _, binc, btot = _lineclean_tables(rows, "doc_id", "page", ["site"], "\n")
    write_bucket_delta(
        binc, os.path.join(sink, "_lines"), -1,
        num_partitions=64, layout="partitioned",
    )
    write_bucket_delta(
        btot, os.path.join(sink, "_linetotals"), -1,
        num_partitions=1, layout="partitioned",
    )

    incoming = pages(INCOMING_ROWS, id_offset=_ID_OFFSET, seed=1)
    src = os.path.join(work, f"{tag}_src_{rung}")
    incoming.repartition(N_BATCHES).write.parquet(src)
    schema = spark.read.parquet(src).schema
    t0 = time.time()
    q = lineclean_insert(
        file_stream_reader(spark, src, schema),
        sink,
        ckpt,
        id_col="doc_id",
        text_col="page",
        group_cols=["site"],
        min_docs=2,
        max_doc_frac=0.25,
        trigger_once=True,
    )
    q.awaitTermination(1800)
    stats = _progress_stats(q, time.time() - t0, INCOMING_ROWS)
    inc_rows = read_sink(spark, sink).filter(F.col("doc_id") >= _ID_OFFSET)
    stats["inc_rows"] = inc_rows.count()
    stats["boilerplate_cut_rows"] = inc_rows.filter(
        (F.col("n_removed") == 2) & (F.col("n_kept") == 3)
    ).count()
    stats["line_store_rows"] = read_bucket_store(
        spark, os.path.join(sink, "_lines"), "__line", extra_cols=("site",)
    ).count()
    return stats


def _cm_groups_rung(
    spark, rung: int, work: str, tag: str = "cmg", n_rows: int = 200_000
) -> dict:
    """Round 12: the grouped count-min GROUP-CARDINALITY axis over a
    FIXED 200k-token input (4 batches) — per-source vocabulary sketches
    maintained online (``sketch_insert(group_cols=)``). State is
    depth×width cells PER GROUP, so ``delta_rows`` should saturate at
    min(batch tokens · depth, groups · depth · width) and the read-side
    merge (one grouped sum over cell-scale rows) prices the summary."""
    from pyspark.sql import functions as F

    from confluent_kafka_vector_search_prompt_inference_spark.streaming.pipeline import (
        _committed_batch_dirs,
        file_stream_reader,
        read_corpus_sketch,
        sketch_insert,
    )

    groups = min(rung, n_rows)
    src = os.path.join(work, f"{tag}_src_{rung}")
    sink = os.path.join(work, f"{tag}_sink_{rung}")
    ckpt = os.path.join(work, f"{tag}_ckpt_{rung}")
    rows = spark.range(n_rows).select(
        F.concat(F.lit("s"), F.pmod(F.xxhash64("id"), F.lit(groups))).alias("g"),
        F.concat(
            F.lit("t"), F.pmod(F.xxhash64("id", F.lit(7)), F.lit(5_000))
        ).alias("term"),
    )
    rows.repartition(N_BATCHES).write.parquet(src)
    schema = spark.read.parquet(src).schema
    t0 = time.time()
    q = sketch_insert(
        file_stream_reader(spark, src, schema),
        sink,
        ckpt,
        term_col="term",
        depth=4,
        width=256,
        group_cols=["g"],
        trigger_once=True,
    )
    q.awaitTermination(1800)
    stats = _progress_stats(q, time.time() - t0, n_rows)
    stats["delta_rows"] = spark.read.parquet(
        *_committed_batch_dirs(os.path.join(sink, "_sketch"))
    ).count()
    t0 = time.time()
    stats["summary_rows"] = read_corpus_sketch(
        spark, sink, group_cols=["g"]
    ).count()
    stats["summary_sec"] = round(time.time() - t0, 2)
    stats["distinct_groups"] = groups
    return stats


def main() -> int:
    from confluent_kafka_vector_search_prompt_inference_spark import get_spark

    def _compact_rung(s, r, w):
        # 16-batch window, compact_every=2: tail folds AND geometric
        # run-run merges fire mid-rung (monitored). The embedded control
        # is the identical window with folds disabled — the amortized
        # cost of the whole cascade is the delta between the two,
        # recorded IN the same JSON entry (round-9 A/B discipline:
        # controls live in the artifact, not in SCALING.md prose).
        out = _near_dedup_rung(
            s, r, w, compact_every=2, n_batches=16, monitor_runs=True, tag="c"
        )
        out["control"] = dict(
            _near_dedup_rung(
                s, r, w, compact_every=10**9, n_batches=16, tag="cc"
            ),
            what="same 16-batch window, folds disabled (compact_every=1e9)",
        )
        return out

    def _online_prune_rung(s, r, w):
        # the round-9 online prune: ghost rows + a tombstone, drained by
        # the stream's own maintenance folds while it runs. Control: the
        # same bloated store, same window and fold cadence, NO tombstone
        # (the dead width stays).
        out = _near_dedup_rung(
            s, r, w, stale="retired", tombstone_ghosts=True,
            compact_every=2, n_batches=16, tag="o",
        )
        out["control"] = dict(
            _near_dedup_rung(
                s, r, w, stale="retired", compact_every=2, n_batches=16,
                tag="oc",
            ),
            what="same ghost-bloated store and window, no tombstone",
        )
        return out

    lanes = {
        "near_dedup_insert": _near_dedup_rung,
        "near_dedup_compact": _compact_rung,
        "near_dedup_online_prune": _online_prune_rung,
        "near_dedup_rebucket": lambda s, r, w: _near_dedup_rung(
            s, r, w, rebucket_to=4096, tag="r"
        ),
        "near_dedup_retired": lambda s, r, w: _near_dedup_rung(
            s, r, w, stale="retired", tag="x"
        ),
        # round 11: the band-bucket-VALUES bloom gate, forced on with a
        # forced-off control (the shipped default only engages past the
        # measured prune-crossover store size — these rungs price the
        # mechanism, the default keeps small stores out of it)
        "near_dedup_bloom": lambda s, r, w: dict(
            _near_dedup_rung(s, r, w, bloom=True, tag="nb"),
            control=dict(
                _near_dedup_rung(s, r, w, bloom=False, tag="nc"),
                what="same pre-landed store, gate forced off "
                "(the pre-round-11 shape)",
            ),
        ),
        "near_dedup_pruned": lambda s, r, w: _near_dedup_rung(
            s, r, w, stale="pruned", tag="p"
        ),
        "rag_transform": _rag_rung,
        "rag_transform_ivf": _rag_ivf_rung,
        "ivf_insert": _ivf_rung,
        "sketch_insert": _sketch_rung,
        "maintain_reverify_width": _maintain_width_rung,
        "rebucket_drain_nudges": _rebucket_drain_rung,
        # a discarded 1k warm-up rung runs first: an A/A probe measured the
        # session's FIRST streaming lane ~30% slow (codegen/JIT warm-up,
        # 105 -> 138 rows/s back to back), which had masqueraded as the
        # control winning — order-fairness costs ~20 s per invocation
        "spanclean_insert": lambda s, r, w: (
            _spanclean_rung(s, 1_000, w, prune=None, tag="spw" + str(r))
            and dict(
                _spanclean_rung(s, r, w, prune=None, tag="sp"),
                control=dict(
                    _spanclean_rung(s, r, w, prune=True, tag="spp"),
                    what="forced prune machinery on — the touched-parts "
                    "probe job runs and its list degenerates to None (a "
                    "batch's ~13k gram hashes touch every partition), so "
                    "this is the dead-overhead A/B for the default's skip",
                ),
            )
        ),
        "keyed_upsert_insert": lambda s, r, w: (
            _upsert_rung(s, 1_000, w, compacted=True, tag="upw" + str(r))
            and dict(
                _upsert_rung(s, r, w, compacted=True, tag="up"),
                control=dict(
                    _upsert_rung(s, r, w, compacted=False, tag="upc"),
                    what="same update history UNREDUCED (append-only sink "
                    "shape, folds disabled): every read and every batch's "
                    "merge aggregates the full history",
                ),
            )
        ),
        # round 11: the retention-integrated carrier-counted gram store —
        # prices the extra count column + candidate-bounded sum against
        # the uncounted default (cross-control below)
        "spanclean_carrier": lambda s, r, w: (
            _spanclean_rung(s, 1_000, w, carrier=True, tag="scw" + str(r))
            and _spanclean_rung(s, r, w, carrier=True, tag="sc")
        ),
        # round 11: the seq-watermark tombstone shed — 20% of the
        # increment tombstones; base_rows/base_tombstones record the
        # convergence (shed ≈ |live keys|, unshed carries dead forever)
        "keyed_upsert_shed": lambda s, r, w: (
            _upsert_rung(s, 1_000, w, compacted=True, tag="usw" + str(r))
            and dict(
                _upsert_rung(s, r, w, compacted=True, shed=True, tag="us"),
                control=dict(
                    _upsert_rung(s, r, w, compacted=True, shed=False, tag="usc"),
                    what="same tombstoned increment, shed off (keep-forever "
                    "default): the base carries every dead key",
                ),
            )
        ),
        "exact_dedup_insert": lambda s, r, w: dict(
            _exact_dedup_rung(s, r, w, prune=True, bloom=True, tag="eb"),
            control=dict(
                _exact_dedup_rung(s, r, w, prune=False, tag="ec"),
                what="same store, no pruning, no bloom (full scan/batch)",
            ),
            control_pruned_ungated=dict(
                _exact_dedup_rung(s, r, w, prune=True, tag="e"),
                what="pruned read without the bloom gate (round-10 pre-gate shape)",
            ),
        ),
        # round 12: STATE-growth ladders — the rung is state cardinality
        # (keys / groups / sets), the input is FIXED at 200k rows, so
        # cross-rung movement isolates state cost from input cost by
        # construction. Run these with their own rung list, e.g.
        #   --lanes events_sliding_state,events_session_state 1000 10000 100000
        # each pays a small DISCARDED warm pass first (the generic
        # session warm-up doesn't reach these lanes' stateful-window /
        # mapInPandas codegen paths — the first metered pass of a
        # session measured ~1.5x slow, inverting the state-growth story
        # at the smallest rung)
        "events_sliding_state": lambda s, r, w: (
            _stateful_window_rung(s, 100, w, tag="slw" + str(r), n_rows=20_000)
            and _stateful_window_rung(s, r, w, tag="sl")
        ),
        "events_session_state": lambda s, r, w: (
            _stateful_window_rung(
                s, 100, w, session=True, tag="ssw" + str(r), n_rows=20_000
            )
            and _stateful_window_rung(s, r, w, session=True, tag="ss")
        ),
        "mg_grouped_insert": lambda s, r, w: (
            _mg_groups_rung(s, 100, w, tag="mgw" + str(r), n_rows=20_000)
            and dict(
                _mg_groups_rung(s, r, w, cap=None, tag="mgg"),
                control=dict(
                    _mg_groups_rung(s, r, w, cap=1024, tag="mgc"),
                    what="max_groups_per_partition=1024: overflow groups "
                    "spill exact rows, per-partition dict state capped",
                ),
            )
        ),
        "kmv_grouped_insert": lambda s, r, w: (
            _kmv_groups_rung(s, 100, w, tag="kvw" + str(r), n_rows=20_000)
            and _kmv_groups_rung(s, r, w)
        ),
        # round 12 second wave: grouped count-min joins the grouped
        # streaming matrix (MG/KMV/bloom already laddered)
        "cm_grouped_insert": lambda s, r, w: (
            _cm_groups_rung(s, 100, w, tag="cmw" + str(r), n_rows=20_000)
            and _cm_groups_rung(s, r, w)
        ),
        # round 12 second wave: online line-boilerplate removal against
        # a converged line store (rung = pre-landed page count)
        "lineclean_insert": lambda s, r, w: (
            _lineclean_rung(s, 1_000, w, tag="lw" + str(r))
            and _lineclean_rung(s, r, w)
        ),
    }
    # lanes whose natural control is ANOTHER lane run in the same
    # session: cross-attach that lane's same-rung numbers as `control`
    # so the artifact carries both sides of the A/B without re-running
    CROSS_CONTROLS = {
        "spanclean_carrier": (
            "spanclean_insert",
            "uncounted gram store (the never-forget default)",
        ),
        "near_dedup_rebucket": ("near_dedup_insert", "plain store, N=64"),
        "near_dedup_pruned": (
            "near_dedup_retired",
            "same ghost-bloated store, not pruned",
        ),
    }
    argv = sys.argv[1:]
    if argv and argv[0] == "--lanes":
        # subset re-run (e.g. one extra-large rung for the two RAG lanes
        # only — the control lanes are flat by design and need no 10M
        # point); merged into SCALECHECK.json alongside retained rungs
        names = argv[1].split(",")
        unknown = [n for n in names if n not in lanes]
        if unknown:
            raise SystemExit(f"unknown lanes {unknown}; have {sorted(lanes)}")
        lanes = {n: lanes[n] for n in names}
        argv = argv[2:]
    rungs = [int(a) for a in argv] or RUNGS
    spark = get_spark("spark-graft-stream-scalecheck")
    spark.sparkContext.setLogLevel("ERROR")
    # Arrow batches small enough that one python-worker OUTPUT batch
    # always fits the loopback socket buffer. Spark 4.1's single-threaded
    # duplex python runner prioritizes its pending INPUT write; if the
    # worker blocks mid-way through sending a large output batch (64-long
    # signature arrays at the default 10k rows/batch ≈ 5 MB — bigger than
    # the kernel's autotuned rcvbuf) while the JVM is itself blocked
    # writing input, neither side ever drains: observed twice at the 10M
    # pre-land as a hard deadlock (JVM epoll-waiting, worker in
    # tcp_sendmsg, both queues full). 2k rows ≈ 1 MB output per batch
    # breaks the cycle; the measured micro-batches are 500 rows anyway,
    # so rung numbers are unaffected.
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2000")
    work = tempfile.mkdtemp(prefix="spark_graft_stream_ladder_")
    results: dict[str, dict] = {name: {} for name in lanes}
    try:
        # session-level warm-up (discarded): an A/A probe measured the
        # FIRST streaming lane of a session ~30% slow (codegen/JIT,
        # 105 -> 138 rows/s back to back) — enough to masquerade as a
        # lane-vs-control difference. One tiny foreachBatch stream pays
        # it before anything is measured; the spanclean/upsert lanes
        # keep their own per-lane warm-ups as belt-and-braces.
        warm = _synth_docs(spark, 500, seed=9)
        wsrc = os.path.join(work, "_warmup_src")
        warm.repartition(2).write.parquet(wsrc)
        from confluent_kafka_vector_search_prompt_inference_spark.streaming.pipeline import (
            continuous_insert as _ci,
            file_stream_reader as _fsr,
        )

        _ci(
            _fsr(spark, wsrc, warm.schema, max_files_per_trigger=1),
            os.path.join(work, "_warmup_sink"),
            os.path.join(work, "_warmup_ckpt"),
            trigger_once=True,
        ).awaitTermination(120)
        for rung in rungs:
            for name, fn in lanes.items():
                s = fn(spark, rung, work)
                results[name][str(rung)] = s
                print(f"{name:18s} @ {rung:>9,}: {s}")
            for name, (ctrl, what) in CROSS_CONTROLS.items():
                got = results.get(name, {}).get(str(rung))
                ctrl_got = results.get(ctrl, {}).get(str(rung))
                if got is not None and ctrl_got is not None:
                    got["control"] = dict(ctrl_got, what=f"{ctrl}: {what}")
    finally:
        shutil.rmtree(work, ignore_errors=True)

    path = "/root/repo/SCALECHECK.json"
    doc = {}
    if os.path.exists(path):
        with open(path) as fh:
            doc = json.load(fh)
    streaming = doc.setdefault("streaming", {})
    streaming["note"] = (
        "fixed 2k-row increment streamed in 4 micro-batches against a "
        "pre-landed sink (near_dedup_insert) / pre-indexed corpus "
        "(rag_transform) of rung rows; rows_per_sec meters the increment, "
        "so movement across rungs isolates the cost of landed HISTORY. "
        "slowdown_A_to_B = rps(A)/rps(B); 10.0 per decade would be "
        "linear-in-history, the target is far under. Every run since "
        "round 10 pays a discarded session-level warm-up stream before "
        "any lane is metered (A/A measured the session's FIRST lane ~30% "
        "slow from codegen/JIT); the 10k/100k/1M rungs were re-recorded "
        "behind it in round 11 and the ENTIRE 10M tier in round 12 — no "
        "retained rung predates the warm-up discipline anymore. The "
        "round-12 10M re-run moved two conclusions: the rebucketed "
        "store's 10M win and the ghost-prune's break-even both read as "
        "LOSSES warm-measured on local disk (see SCALING.md round-12 "
        "notes; both remain object-store-regime levers)."
    )
    for lane, rows in results.items():
        streaming.setdefault(lane, {}).update(rows)
    # slowdowns derive from the MERGED rungs (a subset re-run must refresh
    # them against the retained rungs, not leave stale pre-merge ratios)
    for lane, rows in streaming.items():
        if lane == "note":
            continue
        for k in [k for k in rows if k.startswith("slowdown_")]:
            del rows[k]
        _add_slowdowns(rows)
    with open(path, "w") as fh:
        json.dump(doc, fh, indent=1)
    print("wrote SCALECHECK.json streaming section")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
