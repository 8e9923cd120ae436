"""Top-k similarity join — the engine-native form of ``FEDERATED_SEARCH``.

Reference semantics (SURVEY.md §2.3 J2): each query row carries a vector;
for each, return the k most-similar corpus rows by dot product
(``FEDERATED_SEARCH('mongodb_vector_search', 3, vector)``, reference
``README.md:403-407``; metric dotProduct ``README.md:380``; per-index
candidate pool ``numCandidates`` with a 10,000 cap ``README.md:364, 368``).

Physical strategies (SURVEY.md §4.1), selected by ``strategy=`` or ``auto``:

- ``broadcast_corpus`` — corpus (id + float32 matrix) broadcast to executors;
  ``mapInPandas`` over the *queries* does a NumPy matmul + argpartition per
  Arrow batch. Zero shuffle; exact. Right when the corpus fits the broadcast
  budget (a 10M × 256-dim float32 corpus is ~10 GB — beyond it, see below).
- ``broadcast_queries`` — the mirror image for huge corpora: queries
  broadcast, ``mapInPandas`` over *corpus partitions* emits a per-partition
  partial top-k per query (≤ k rows × partitions), then one small shuffle
  (``Window`` by query id) takes the global top-k. Exact; scales with corpus
  size because the corpus is never moved — only k·P candidate rows shuffle.
- ``shuffle`` — crossJoin + score + ranked window. Exact, fully distributed,
  O(|Q|·|C|) — the fallback when both sides are huge and ANN is not allowed.
- ``quantized`` — int8-quantized corpus broadcast (4× smaller than float32,
  so the broadcast path stays viable 4× longer); exact integer dots rescaled
  by per-vector scales. ``rescore_factor=r`` adds the two-stage recipe:
  keep r·k coarse candidates, full-precision-rescore only those.
- ``lsh`` — sign-random-projection bucketing (see ``operators/ann.py``):
  join queries to corpus within matching hash buckets only, rescore exactly,
  top-k. ``num_candidates`` maps to probe width (multi-band OR), mirroring
  the reference's recall knob (``README.md:364, 368``).

Ties break deterministically on ascending corpus id, so results are stable
across strategies and match the SQL oracle's ``ORDER BY score DESC, id``.
"""

from __future__ import annotations

import math
import os
from collections.abc import Iterator, Sequence

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, IntegerType, StructField, StructType

from confluent_kafka_vector_search_prompt_inference_spark.functions.vector import (
    vec_dot,
    vec_cosine,
    vec_quantize_binary,
    vec_hamming,
)

#: hard cap on the LSH candidate pool, mirroring Atlas' numCandidates cap
#: (reference ``README.md:368``).
NUM_CANDIDATES_CAP = 10_000

#: float32 bytes beyond which auto mode stops broadcasting a side.
_BROADCAST_BUDGET_BYTES = 512 * 1024 * 1024


def _metric_score(metric: str, qv, cv):
    if metric == "dot":
        return vec_dot(qv, cv)
    if metric == "cosine":
        return vec_cosine(qv, cv)
    raise ValueError(f"unknown metric {metric!r} (want 'dot' or 'cosine')")


def topk_similarity_join(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 3,
    *,
    query_id: str,
    query_vec: str = "vector",
    corpus_id: str,
    corpus_vec: str = "vector",
    metric: str = "dot",
    strategy: str = "auto",
    num_candidates: int | None = None,
    score_col: str = "score",
    rank_col: str = "rank",
    rescore_factor: int | None = None,
    exact_only: bool = False,
    recall_target: float | None = None,
    calibration_sample: int = 32,
) -> DataFrame:
    """Return ``(query_id, corpus_id, score, rank)`` with rank 1..k per query.

    Callers join payload columns back on the two id columns — keeping the
    join output narrow means only ids and scores ever shuffle, regardless of
    how wide the query/corpus rows are.

    ``strategy='auto'`` sizes both sides from Catalyst plan statistics (file
    footers — no Spark job) and escalates broadcast → quantized-broadcast →
    LSH as the data outgrows each budget, mirroring the reference engine's
    always-indexed search (``README.md:355-366``). Pass ``exact_only=True``
    to cap the escalation at the exact ``shuffle`` fallback instead.

    ``recall_target=``: the caller's contract for the recall-CHANGING tiers
    (``binary`` past its rescore depth, ``lsh``) — the generalization of the
    reference's ``numCandidates`` knob (``README.md:364, 368``) from "a
    number you guess" to "a floor you declare". When the picker (or an
    explicit strategy) lands on one of those tiers and no explicit depth
    was passed, :func:`calibrate_recall_depth` measures recall@k on a
    ``calibration_sample``-query sample against the exact top-k and picks
    the smallest depth on the ladder whose SAMPLE recall meets the target
    (raises if even the ``NUM_CANDIDATES_CAP`` depth misses it — lower the
    target, pass ``exact_only=True``, or force an exact strategy). The
    exact tiers (broadcast/shuffle/quantized-with-rescore) satisfy any
    target by construction and skip calibration. The contract is measured
    on the sample, so full-set recall is an estimate — size the sample to
    the workload's homogeneity.
    """
    if num_candidates is not None:
        num_candidates = min(num_candidates, NUM_CANDIDATES_CAP)
    if strategy == "auto":
        strategy = _pick_strategy(queries, corpus, exact_only=exact_only)
        if strategy == "quantized" and rescore_factor is None:
            rescore_factor = 4  # auto mode keeps the result exact-after-rescore
        if strategy == "binary" and metric != "dot":
            strategy = "lsh"  # the sign-bit screen is a dot-product identity
    if recall_target is not None and strategy in ("binary", "lsh"):
        if strategy == "binary" and rescore_factor is None:
            rescore_factor, _ = calibrate_recall_depth(
                queries, corpus, k, strategy="binary",
                recall_target=recall_target,
                query_id=query_id, query_vec=query_vec,
                corpus_id=corpus_id, corpus_vec=corpus_vec,
                metric=metric, sample_queries=calibration_sample,
            )
        elif strategy == "lsh" and num_candidates is None:
            num_candidates, _ = calibrate_recall_depth(
                queries, corpus, k, strategy="lsh",
                recall_target=recall_target,
                query_id=query_id, query_vec=query_vec,
                corpus_id=corpus_id, corpus_vec=corpus_vec,
                metric=metric, sample_queries=calibration_sample,
            )
    if strategy == "broadcast_corpus":
        return _topk_numpy_broadcast(
            queries, corpus, k, query_id, query_vec, corpus_id, corpus_vec,
            metric, score_col, rank_col, broadcast_side="corpus",
        )
    if strategy == "broadcast_queries":
        return _topk_numpy_broadcast(
            queries, corpus, k, query_id, query_vec, corpus_id, corpus_vec,
            metric, score_col, rank_col, broadcast_side="queries",
        )
    if strategy == "shuffle":
        return _topk_shuffle(
            queries, corpus, k, query_id, query_vec, corpus_id, corpus_vec,
            metric, score_col, rank_col,
        )
    if strategy == "quantized":
        return _topk_quantized(
            queries, corpus, k, query_id, query_vec, corpus_id, corpus_vec,
            metric, score_col, rank_col, rescore_factor,
        )
    if strategy == "binary":
        if metric != "dot":
            raise ValueError("strategy='binary' supports metric='dot' only")
        return binary_rescore_topk(
            queries, corpus, k,
            query_id=query_id, query_vec=query_vec,
            corpus_id=corpus_id, corpus_vec=corpus_vec,
            rescore_factor=rescore_factor or 4,
            score_col=score_col, rank_col=rank_col,
        )
    if strategy == "lsh":
        from confluent_kafka_vector_search_prompt_inference_spark.operators.ann import topk_lsh

        return topk_lsh(
            queries, corpus, k,
            query_id=query_id, query_vec=query_vec,
            corpus_id=corpus_id, corpus_vec=corpus_vec,
            metric=metric, num_candidates=num_candidates or 20,
            score_col=score_col, rank_col=rank_col,
        )
    raise ValueError(f"unknown strategy {strategy!r}")


def _plan_size_bytes(df: DataFrame) -> int:
    """Catalyst's optimized-plan size estimate — file-footer bytes for scans,
    propagated through projections/filters. Reads catalog statistics only;
    launches NO job, so the picker costs nothing even when the inputs are
    100 TB scans with long upstream lineage."""
    return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())


def _pick_strategy(queries: DataFrame, corpus: DataFrame, *, exact_only: bool = False) -> str:
    """Choose a physical strategy from plan statistics (no jobs — the old
    eager ``.count()`` probe re-ran the full upstream lineage twice just to
    pick a path). Prefer broadcasting the corpus (keeps query payload
    columns on their original partitions); past both exact broadcast
    budgets, escalate down the quantization ladder — int8 broadcast (4×
    smaller, exact after rescore), then 1-bit sign signatures (32×
    smaller; Hamming screen + exact rescore), finally banded LSH — the
    reference engine likewise switches to its ANN index rather than
    scanning (``README.md:355-366``)."""
    c_bytes = _plan_size_bytes(corpus)
    if c_bytes <= _BROADCAST_BUDGET_BYTES:
        return "broadcast_corpus"
    q_bytes = _plan_size_bytes(queries)
    if q_bytes <= _BROADCAST_BUDGET_BYTES:
        return "broadcast_queries"
    if exact_only:
        return "shuffle"
    if c_bytes // 4 <= _BROADCAST_BUDGET_BYTES:
        return "quantized"
    if c_bytes // 32 <= _BROADCAST_BUDGET_BYTES:
        return "binary"
    return "lsh"


#: rescore-factor ladder for ``binary`` calibration (candidate pool =
#: depth·k) and probe-width ladder for ``lsh`` calibration (pool = depth).
_BINARY_DEPTH_LADDER = (2, 4, 8, 16, 32, 64, 128)
_LSH_DEPTH_LADDER = (20, 50, 100, 200, 500, 1000, 2000, 5000, 10000)


def calibrate_recall_depth(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    *,
    strategy: str,
    recall_target: float,
    query_id: str,
    query_vec: str = "vector",
    corpus_id: str,
    corpus_vec: str = "vector",
    metric: str = "dot",
    sample_queries: int = 32,
    bands: int = 16,
    rows_per_band: int = 4,
    cache=None,
    corpus_fingerprint: str | None = None,
    query_fingerprint: str | None = None,
    recalibrate: bool = False,
) -> tuple[int, float]:
    """Measured-recall depth selection for the approximate tiers.

    Picks the smallest depth on the strategy's ladder whose recall@k on a
    ``sample_queries``-query sample meets ``recall_target``, and returns
    ``(depth, measured_recall)`` — depth is ``rescore_factor`` for
    ``binary`` and ``num_candidates`` for ``lsh``. Raises ``ValueError``
    with the full measured curve when even the ``NUM_CANDIDATES_CAP``-
    bounded deepest rung misses the target.

    Cost shape (the reason this is viable at 100 TB): the sample is
    pinned with ``localCheckpoint`` (``limit`` alone is not stable across
    jobs), ground truth is ONE exact pass with the sample broadcast and
    the corpus streamed (``broadcast_queries`` — corpus bytes never
    move), and because both candidate pools are MONOTONE in depth
    (prefix-ordered by Hamming rank / LSH probe rank), every rung of the
    ladder is evaluated from ONE candidate pass at the deepest rung —
    the whole calibration is two corpus scans plus driver-side pandas
    over ≤ sample·max_depth·k rows, not one scan per rung.

    ``cache`` (an ``operators.calibration_cache.CalibrationCache``)
    amortizes even those two scans across invocations: the FULL measured
    curve is stored against the calibration inputs plus a job-free
    corpus fingerprint (``corpus_fingerprint`` when the caller has a
    better one — e.g. a persisted-index directory walk — else Catalyst
    plan-stats bytes), so a repeat call against an unchanged corpus runs
    ZERO Spark jobs, including for a different ``recall_target``. The
    cached curve was measured on that call's query sample; reuse assumes
    a stationary query distribution — the same assumption the sample
    itself makes. Callers whose workload DOES shift have two guards:
    ``query_fingerprint`` folds a caller-supplied fingerprint of the
    query distribution into the cache key (a changed workload then
    misses and re-measures — leave it None for streams whose batches
    vary but whose distribution is stationary, or every micro-batch
    would re-pay the scans), and ``recalibrate=True`` bypasses the
    lookup for one call while still storing the fresh curve."""
    if not 0.0 < recall_target <= 1.0:
        raise ValueError(f"recall_target must be in (0, 1], got {recall_target}")
    if strategy == "binary" and metric != "dot":
        raise ValueError("binary calibration requires metric='dot'")
    if strategy not in ("binary", "lsh"):
        raise ValueError(
            f"strategy {strategy!r} has no recall depth to calibrate "
            "(exact tiers satisfy any target by construction)"
        )
    if strategy == "binary":
        depths = [d for d in _BINARY_DEPTH_LADDER if d * k <= NUM_CANDIDATES_CAP]
        if not depths:
            raise ValueError(
                f"k={k} leaves no calibratable rescore depth: even the "
                f"shallowest rung ({_BINARY_DEPTH_LADDER[0]}·k = "
                f"{_BINARY_DEPTH_LADDER[0] * k} candidates) exceeds the "
                f"numCandidates cap {NUM_CANDIDATES_CAP}. Lower k or force "
                "an exact strategy."
            )
    else:
        depths = [d for d in _LSH_DEPTH_LADDER if d <= NUM_CANDIDATES_CAP]

    cache_key = None
    if cache is not None:
        from confluent_kafka_vector_search_prompt_inference_spark.operators.calibration_cache import dataframe_fingerprint

        cache_key = {
            "op": "topk_depth",
            "strategy": strategy,
            "k": k,
            "metric": metric,
            "sample_queries": sample_queries,
            "bands": bands,
            "rows_per_band": rows_per_band,
            "corpus": corpus_fingerprint or dataframe_fingerprint(corpus),
        }
        if query_fingerprint is not None:
            cache_key["queries"] = query_fingerprint
        cached = None if recalibrate else cache.lookup(cache_key)
        if cached is not None and all(d in cached for d in depths):
            return _pick_calibrated_depth(cached, depths, recall_target, strategy)

    # deterministic sample: a bare limit() takes whichever partitions
    # answer first, so the measured curve (and query_sample_fingerprint,
    # which mirrors this ordering) would drift across sessions for an
    # identical workload — spurious cache misses and a fingerprint that
    # can cover different rows than the curve was measured on
    sample = (
        queries.select(F.col(query_id), F.col(query_vec))
        .orderBy(F.xxhash64(F.col(query_id), F.col(query_vec)), F.col(query_id))
        .limit(sample_queries)
        .localCheckpoint(eager=True)
    )
    exact = topk_similarity_join(
        sample, corpus, k,
        query_id=query_id, query_vec=query_vec,
        corpus_id=corpus_id, corpus_vec=corpus_vec,
        metric=metric, strategy="broadcast_queries",
    ).select(query_id, corpus_id).toPandas()
    if exact.empty:
        raise ValueError("cannot calibrate recall on an empty query sample")

    if strategy == "binary":
        pool = hamming_candidates(
            sample, corpus, depths[-1] * k,
            query_id=query_id, query_vec=query_vec,
            corpus_id=corpus_id, corpus_vec=corpus_vec,
            crank_col="__depth_rank",
        )
        cap_of = lambda d: d * k  # noqa: E731
    else:
        from confluent_kafka_vector_search_prompt_inference_spark.operators.ann import lsh_probe_candidates

        pool = lsh_probe_candidates(
            sample, corpus,
            query_id=query_id, query_vec=query_vec,
            corpus_id=corpus_id, corpus_vec=corpus_vec,
            num_candidates=depths[-1],
            bands=bands, rows_per_band=rows_per_band,
            probe_col="__depth_rank",
        )
        cap_of = lambda d: d  # noqa: E731

    # exact-rescore the pooled candidates once (vectors re-attach by id;
    # the sample·depth·k-row pool side broadcasts — without the explicit
    # hint Catalyst may plan a full corpus shuffle here, and the docstring
    # promise of "two corpus scans" becomes two scans plus a shuffle)
    scored = (
        F.broadcast(
            pool.join(
                F.broadcast(
                    sample.select(F.col(query_id), F.col(query_vec).alias("__qv"))
                ),
                query_id,
            )
        )
        .join(
            corpus.select(F.col(corpus_id), F.col(corpus_vec).alias("__cv")),
            corpus_id,
        )
        .select(
            query_id,
            corpus_id,
            "__depth_rank",
            F.round(_metric_score(metric, F.col("__qv"), F.col("__cv")), 6).alias(
                "__escore"
            ),
        )
        .toPandas()
    )

    truth = {
        q: set(g[corpus_id]) for q, g in exact.groupby(query_id, sort=False)
    }
    possible = len(exact)  # Σ per-query true-top-k sizes (≤ k each)
    # measure EVERY rung (driver-side pandas over the one pooled pass —
    # rungs past the first passing one cost microseconds and make the
    # cached curve reusable for any future recall_target)
    curve: dict[int, float] = {}
    for depth in depths:
        sub = scored[scored["__depth_rank"] <= cap_of(depth)]
        sub = sub.sort_values(
            [query_id, "__escore", corpus_id], ascending=[True, False, True]
        )
        topk = sub.groupby(query_id, sort=False).head(k)
        hits = sum(
            cid in truth.get(qid, ())
            for qid, cid in zip(topk[query_id], topk[corpus_id])
        )
        curve[depth] = hits / possible
    if cache is not None:
        cache.store(cache_key, curve)
    return _pick_calibrated_depth(curve, depths, recall_target, strategy)


def _pick_calibrated_depth(
    curve: dict[int, float],
    depths: Sequence[int],
    recall_target: float,
    strategy: str,
) -> tuple[int, float]:
    """Smallest ladder rung whose measured recall meets the target —
    shared by the live-measure and cached paths so both fail with the
    same contract error."""
    for depth in depths:
        if curve[depth] >= recall_target:
            return depth, curve[depth]
    raise ValueError(
        f"recall_target={recall_target} unreachable for strategy "
        f"{strategy!r} within the numCandidates cap {NUM_CANDIDATES_CAP}: "
        f"measured sample recall curve {curve}. Lower the target, pass "
        "exact_only=True, or force an exact strategy."
    )


def _collect_matrix(df: DataFrame, id_col: str, vec_col: str) -> tuple[np.ndarray, np.ndarray]:
    """Collect (ids, float32 matrix) — only for a side that passed the
    broadcast budget check."""
    pdf = df.select(id_col, vec_col).toPandas()
    ids = pdf[id_col].to_numpy()
    mat = np.asarray([np.asarray(v, dtype=np.float32) for v in pdf[vec_col]], dtype=np.float32)
    return ids, mat


def _rowwise_topk(scores: np.ndarray, ids: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-row top-k with deterministic (−score, id) ordering.

    ``argpartition`` first (O(n) per row) so full sorts only touch k
    candidates — the difference between O(n log n) and O(n + k log k) per
    query matters when n is the corpus."""
    n = scores.shape[1]
    kk = min(k, n)
    part = np.argpartition(-scores, kk - 1, axis=1)[:, :kk]
    out_idx = np.empty((scores.shape[0], kk), dtype=np.int64)
    for r in range(scores.shape[0]):
        cand = part[r]
        order = np.lexsort((ids[cand], -scores[r, cand]))
        out_idx[r] = cand[order]
    return out_idx, scores[np.arange(scores.shape[0])[:, None], out_idx]


class PreparedCorpus:
    """A corpus collected and broadcast ONCE for repeated broadcast-side
    top-k joins — the streaming steady state, where every micro-batch
    searches the SAME corpus. Without it, each ``foreachBatch`` call of
    :func:`topk_similarity_join` re-collects and re-broadcasts the
    unchanged matrix: measured on the round-6 streaming ladder, that
    re-collect took ``rag_transform`` from 251 rows/s at a 10k corpus to
    7.4 rows/s at 1M (p50 batch 72s — nearly all of it corpus collect).
    The matrix itself travels as a SparkFiles ``.npy`` (mmap-shared per
    host), not through the pickled broadcast — see
    :func:`prepare_broadcast_corpus`. Search with :func:`topk_prepared`.

    STALENESS CONTRACT: the matrix is a SNAPSHOT of the corpus at
    preparation time. Rows appended afterwards are invisible to
    :func:`topk_prepared` until :meth:`refreshed` re-prepares — this is
    deliberate (the exact-broadcast lane trades freshness for the
    collect-once win; the persisted-IVF lane reloads per batch for the
    opposite trade). ``refreshed(corpus)`` returns a NEW PreparedCorpus
    from the given (re-resolved) corpus and releases this one — note a
    path-backed DataFrame pins its file listing at creation, so pass a
    freshly-read DataFrame, not the one prepared from.

    ``unpersist`` releases the id/norm broadcast; the staged ``.npy``
    under the driver tempdir is OS-managed (executor SparkFiles copies
    are cleaned with the application)."""

    def __init__(
        self,
        bc,
        corpus_id: str,
        id_type,
        metric: str,
        corpus_vec: str = "vector",
        budget_bytes: int | None = None,
    ) -> None:
        self.bc = bc
        self.corpus_id = corpus_id
        self.id_type = id_type
        self.metric = metric
        self.corpus_vec = corpus_vec
        self.budget_bytes = budget_bytes
        #: row count of the prepared snapshot (set by
        #: prepare_broadcast_corpus; the RagPipeline crossover guard
        #: compares it against the measured exact-lane ceiling)
        self.n_rows: int | None = None

    def refreshed(self, corpus: DataFrame) -> "PreparedCorpus":
        """Re-prepare from ``corpus`` (same id/vec/metric/budget recipe),
        releasing this snapshot's broadcast. The caller swaps the
        returned object in; in-flight batches holding the old one still
        complete (the broadcast survives until GC after unpersist)."""
        fresh = prepare_broadcast_corpus(
            corpus,
            corpus_id=self.corpus_id,
            corpus_vec=self.corpus_vec,
            metric=self.metric,
            **(
                {"budget_bytes": self.budget_bytes}
                if self.budget_bytes is not None
                else {}
            ),
        )
        self.unpersist()
        return fresh

    def unpersist(self) -> None:
        self.bc.unpersist()


def prepare_broadcast_corpus(
    corpus: DataFrame,
    *,
    corpus_id: str,
    corpus_vec: str = "vector",
    metric: str = "dot",
    budget_bytes: int = _BROADCAST_BUDGET_BYTES,
) -> PreparedCorpus:
    """Collect the corpus matrix once and ship it PRE-TRANSPOSED in
    float64 as an ``.npy`` file via ``sc.addFile`` — NOT through the
    Python broadcast. A pickled broadcast is deserialized per Python
    worker (32 workers × 512 MB at a 1M×64 corpus, re-paid whenever
    memory pressure recycles a worker — the round-6 ladder's remaining
    variance source); ``SparkFiles`` distributes ONE file per executor
    and every worker ``np.load``s it ``mmap_mode='r'``, so all workers
    on a host share a single page-cache copy with zero deserialization,
    and BLAS reads pages on demand. Only the (small) id array and norms
    travel in the broadcast. Memory: the staged file is float64 — 8
    bytes/dim, for bit-identical scores with the per-call broadcast path
    (whose workers also widen to float64 before the matmul) — and the
    ``budget_bytes`` gate prices those SHIPPED float64 bytes: the staged
    ``.npy`` is the artifact that actually lands on every executor's
    disk/page cache, so the gate must price what ships, not the float32
    size the per-call pickled broadcast would have moved. Eligibility is
    therefore 2× stricter than the per-call ``broadcast_corpus`` tier —
    a corpus in the gap (float32 under budget, float64 over) raises here
    deterministically and still works per-call; past both budgets the
    right path is the persisted IVF index."""
    import tempfile
    import uuid

    ids, mat = _collect_matrix(corpus, corpus_id, corpus_vec)
    shipped = mat.nbytes * 2  # the staged .npy is float64 = 2× the float32 matrix
    if shipped > budget_bytes:
        raise ValueError(
            f"prepared corpus would stage {shipped} float64 bytes "
            f"(> budget {budget_bytes}); use the per-call broadcast path or a "
            "persisted IVF index (vector_index=) instead"
        )
    if metric == "cosine":
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
    else:
        norms = None
    sc = corpus.sparkSession.sparkContext
    matT = np.ascontiguousarray(mat.T.astype(np.float64))
    fname = f"spark_graft_prepared_{uuid.uuid4().hex}.npy"
    fpath = os.path.join(tempfile.gettempdir(), fname)
    np.save(fpath, matT)
    sc.addFile(fpath)
    bc = sc.broadcast((ids, fname, norms))
    prepared = PreparedCorpus(
        bc,
        corpus_id,
        corpus.schema[corpus_id].dataType,
        metric,
        corpus_vec=corpus_vec,
        budget_bytes=budget_bytes,
    )
    prepared.n_rows = int(len(ids))  # lane-selection stat (RagPipeline guard)
    return prepared


def topk_prepared(
    queries: DataFrame,
    prepared: PreparedCorpus,
    k: int,
    *,
    query_id: str,
    query_vec: str = "vector",
    score_col: str = "score",
    rank_col: str = "rank",
    parallelism: int | None = None,
) -> DataFrame:
    """Exact broadcast-corpus top-k against a :class:`PreparedCorpus` —
    identical result to ``strategy='broadcast_corpus'``, but the corpus
    collect/broadcast was paid once at preparation time, not per call.

    The query batch is repartitioned to ``parallelism`` (default: the
    cluster's default parallelism) before the scan: streaming
    micro-batches arrive as one or two file splits, and a single-split
    batch runs the whole |Q|×|C| matmul in ONE task — at a 1M-row corpus
    that serialized 50+ s/batch on the round-6 ladder. Queries are narrow
    (id + vector), so the spread shuffle is kilobytes."""
    sc = queries.sparkSession.sparkContext
    n_parts = parallelism or sc.defaultParallelism
    return _broadcast_scan(
        queries.select(query_id, query_vec).repartition(n_parts),
        stream_id=query_id,
        stream_vec=query_vec,
        bc=prepared.bc,
        metric=prepared.metric,
        k=k,
        query_id=query_id,
        q_type=queries.schema[query_id].dataType,
        corpus_id=prepared.corpus_id,
        c_type=prepared.id_type,
        score_col=score_col,
        rank_col=rank_col,
        broadcast_side="corpus",
        pre_transposed=True,
    )


def _topk_numpy_broadcast(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    query_id: str,
    query_vec: str,
    corpus_id: str,
    corpus_vec: str,
    metric: str,
    score_col: str,
    rank_col: str,
    broadcast_side: str,
) -> DataFrame:
    """Exact top-k via broadcast matrix + Arrow-batched NumPy matmul.

    ``broadcast_corpus``: stream over query partitions, k rows out per query.
    ``broadcast_queries``: stream over corpus partitions emitting *partial*
    top-k per (query, partition); a final Window takes the global k — the
    classic partial-aggregation shape, so corpus bytes never shuffle.
    """
    spark = queries.sparkSession
    if broadcast_side == "corpus":
        b_ids, b_mat = _collect_matrix(corpus, corpus_id, corpus_vec)
        stream_df, stream_id, stream_vec = queries.select(query_id, query_vec), query_id, query_vec
    else:
        b_ids, b_mat = _collect_matrix(queries, query_id, query_vec)
        stream_df, stream_id, stream_vec = corpus.select(corpus_id, corpus_vec), corpus_id, corpus_vec

    if metric == "cosine":
        b_norm = np.linalg.norm(b_mat, axis=1)
        b_norm[b_norm == 0] = 1.0
    else:
        b_norm = None
    bc = spark.sparkContext.broadcast((b_ids, b_mat, b_norm))
    return _broadcast_scan(
        stream_df,
        stream_id=stream_id,
        stream_vec=stream_vec,
        bc=bc,
        metric=metric,
        k=k,
        query_id=query_id,
        q_type=queries.schema[query_id].dataType,
        corpus_id=corpus_id,
        c_type=corpus.schema[corpus_id].dataType,
        score_col=score_col,
        rank_col=rank_col,
        broadcast_side=broadcast_side,
    )


def _broadcast_scan(
    stream_df: DataFrame,
    *,
    stream_id: str,
    stream_vec: str,
    bc,
    metric: str,
    k: int,
    query_id: str,
    q_type,
    corpus_id: str,
    c_type,
    score_col: str,
    rank_col: str,
    broadcast_side: str,
    pre_transposed: bool = False,
) -> DataFrame:

    out_schema = StructType(
        [
            StructField(query_id, q_type),
            StructField(corpus_id, c_type),
            StructField(score_col, DoubleType()),
            StructField(rank_col, IntegerType()),
        ]
    )

    partial = broadcast_side == "queries"

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, mat, norms = bc.value
        if len(ids) == 0:  # empty broadcast side → empty result, not a crash
            return
        if isinstance(mat, str):
            # SparkFiles-shipped .npy (prepare_broadcast_corpus):
            # mmap-shared across every worker on the host, zero unpickle
            from pyspark import SparkFiles

            matT = np.load(SparkFiles.get(mat), mmap_mode="r")
        else:
            matT = mat if pre_transposed else mat.T.astype(np.float64)
        for pdf in batches:
            if pdf.empty:
                continue
            S = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[stream_vec]]
            )  # (batch, d)
            scores = S @ matT  # (batch, |broadcast|)
            if metric == "cosine":
                s_norm = np.linalg.norm(S, axis=1)
                s_norm[s_norm == 0] = 1.0
                scores = scores / s_norm[:, None] / norms[None, :]
            s_ids = pdf[stream_id].to_numpy()
            if broadcast_side == "corpus":
                idx, top = _rowwise_topk(scores, ids, k)
                kk = idx.shape[1]
                yield pd.DataFrame(
                    {
                        query_id: np.repeat(s_ids, kk),
                        corpus_id: ids[idx].ravel(),
                        score_col: top.ravel(),
                        rank_col: np.tile(np.arange(1, kk + 1, dtype=np.int32), len(s_ids)),
                    }
                )
            else:
                # scores: (corpus_batch, |queries|) — partial top-k per query
                # over this corpus slice; ranks finalized post-shuffle.
                idx, top = _rowwise_topk(scores.T, s_ids, k)
                kk = idx.shape[1]
                yield pd.DataFrame(
                    {
                        query_id: np.repeat(ids, kk),
                        corpus_id: s_ids[idx].ravel(),
                        score_col: top.ravel(),
                        rank_col: np.zeros(len(ids) * kk, dtype=np.int32),
                    }
                )

    result = stream_df.mapInPandas(compute, schema=out_schema)
    if partial:
        w = Window.partitionBy(query_id).orderBy(F.desc(score_col), F.asc(corpus_id))
        result = (
            result.withColumn(rank_col, F.row_number().over(w))
            .filter(F.col(rank_col) <= k)
        )
    return result


def matryoshka_rescore_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 3,
    *,
    query_id: str,
    query_vec: str = "vector",
    corpus_id: str,
    corpus_vec: str = "vector",
    coarse_dims: int,
    rescore_factor: int = 4,
    metric: str = "dot",
    strategy: str = "broadcast_corpus",
    score_col: str = "score",
    rank_col: str = "rank",
) -> DataFrame:
    """Matryoshka (MRL) two-stage retrieval: coarse top-``r·k`` on the first
    ``coarse_dims`` prefix of each vector, then a full-precision rescore of
    ONLY those candidates.

    Matryoshka-trained embeddings front-load information into the vector
    prefix, so a ``d/coarse_dims``× smaller representation preserves
    neighborhood structure (Kusupati et al., "Matryoshka Representation
    Learning", NeurIPS 2022). This is the dimensionality twin of the int8
    ``rescore_factor`` recipe in :func:`topk_similarity_join` — orthogonal
    levers on the same broadcast budget: int8 shrinks bytes/dim 4×, the
    prefix shrinks dims (64→16 is another 4×), and they compose.

    Scale shape: the coarse stage broadcasts/streams only the sliced
    prefix matrix (the full corpus vectors never leave their partitions);
    the rescore stage broadcasts the |Q|·r·k candidate id list and streams
    the corpus past it, exactly like the quantized rescore — so the float
    pass at full width touches r·k rows per query instead of the corpus.
    """
    if metric != "dot":
        raise ValueError("matryoshka_rescore_topk supports metric='dot' only")
    qs = queries.select(
        F.col(query_id),
        F.slice(F.col(query_vec), 1, coarse_dims).alias("__qp"),
    )
    cs = corpus.select(
        F.col(corpus_id),
        F.slice(F.col(corpus_vec), 1, coarse_dims).alias("__cp"),
    )
    cands = topk_similarity_join(
        qs, cs, k=rescore_factor * k,
        query_id=query_id, query_vec="__qp",
        corpus_id=corpus_id, corpus_vec="__cp",
        metric=metric, strategy=strategy,
        score_col="__cscore", rank_col="__crank",
    ).select(query_id, corpus_id)
    # Re-attach full-width vectors by id: candidate list (+ query vectors)
    # broadcasts, the corpus is neither shuffled nor broadcast at full width.
    cands_q = cands.join(
        queries.select(F.col(query_id), F.col(query_vec).alias("__qv")), query_id
    )
    exact = corpus.select(F.col(corpus_id), F.col(corpus_vec).alias("__cv")).join(
        F.broadcast(cands_q), corpus_id
    )
    w = Window.partitionBy(query_id).orderBy(F.desc(score_col), F.asc(corpus_id))
    return (
        exact.select(
            query_id,
            corpus_id,
            F.round(vec_dot("__qv", "__cv"), 6).alias(score_col),
        )
        .withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def hamming_candidates(
    queries: DataFrame,
    corpus: DataFrame,
    max_candidates: int,
    *,
    query_id: str,
    query_vec: str = "vector",
    corpus_id: str,
    corpus_vec: str = "vector",
    crank_col: str = "__crank",
) -> DataFrame:
    """Coarse binary-screen candidate pool: ``(query_id, corpus_id,
    crank_col)`` with crank 1..max_candidates ranked by ascending Hamming
    distance of packed sign-bit signatures, corpus id ascending. Monotone:
    the pool at depth d is a strict prefix of the pool at depth D > d, so
    :func:`calibrate_recall_depth` can evaluate every rescore depth from
    one pass at the deepest. The scan is whole-stage-codegen integer ops
    (XOR + bit_count) over 1-bit/dim signatures — 32× less data than
    float32."""
    qs = queries.select(
        F.col(query_id), vec_quantize_binary(query_vec).alias("__qsig")
    )
    cs = corpus.select(
        F.col(corpus_id), vec_quantize_binary(corpus_vec).alias("__csig")
    )
    coarse = F.broadcast(qs).crossJoin(cs).select(
        query_id, corpus_id, vec_hamming("__qsig", "__csig").alias("__ham")
    )
    wc = Window.partitionBy(query_id).orderBy(F.asc("__ham"), F.asc(corpus_id))
    return (
        coarse.withColumn(crank_col, F.row_number().over(wc))
        .filter(F.col(crank_col) <= max_candidates)
        .select(query_id, corpus_id, crank_col)
    )


def binary_rescore_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 3,
    *,
    query_id: str,
    query_vec: str = "vector",
    corpus_id: str,
    corpus_vec: str = "vector",
    rescore_factor: int = 4,
    score_col: str = "score",
    rank_col: str = "rank",
) -> DataFrame:
    """Binary-quantized two-stage retrieval: Hamming prefilter on packed
    sign-bit signatures (:func:`~confluent_kafka_vector_search_prompt_inference_spark.functions.vector.vec_quantize_binary`,
    1 bit/dim — 32× smaller than float32), then exact full-precision
    rescore of the top ``rescore_factor·k`` candidates per query.

    The most aggressive point on the quantization ladder (float → int8 →
    PQ → binary): sign-random-projection theory gives E[hamming/d] =
    θ/π, so ascending Hamming ranks candidates by angular proximity.
    Scale shape: the coarse pass broadcasts only the |Q|-row packed
    query matrix and streams packed corpus signatures (whole-stage
    codegen: XOR + bit_count, no floats, no Python); the rescore stage
    broadcasts the |Q|·r·k candidate id list and re-attaches full-width
    vectors by id — the float corpus is never shuffled or broadcast.
    Candidate order is integer-exact (hamming, corpus_id), so the
    result is deterministic and engine-portable.
    """
    qs = queries.select(
        F.col(query_id),
        F.col(query_vec).alias("__qv"),
        vec_quantize_binary(query_vec).alias("__qsig"),
    )
    cands = hamming_candidates(
        queries, corpus, rescore_factor * k,
        query_id=query_id, query_vec=query_vec,
        corpus_id=corpus_id, corpus_vec=corpus_vec,
    ).select(query_id, corpus_id)
    cands_q = cands.join(qs.select(query_id, "__qv"), query_id)
    exact = corpus.select(F.col(corpus_id), F.col(corpus_vec).alias("__cv")).join(
        F.broadcast(cands_q), corpus_id
    )
    w = Window.partitionBy(query_id).orderBy(F.desc(score_col), F.asc(corpus_id))
    return (
        exact.select(
            query_id,
            corpus_id,
            F.round(vec_dot("__qv", "__cv"), 6).alias(score_col),
        )
        .withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def threshold_similarity_join(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    query_id: str,
    query_vec: str = "vector",
    corpus_id: str,
    corpus_vec: str = "vector",
    metric: str = "dot",
    threshold: float,
    score_col: str = "score",
    prefilter: str | None = "binary",
    prefilter_margin: float = 0.25,
) -> DataFrame:
    """Radius / similarity-threshold join: every (query, corpus) pair with
    ``score >= threshold`` — the "all matches above τ" twin of the top-k
    join (alerting, linkage, near-neighbor harvesting), with no rank
    window at all: the output is exactly the scored-filtered pairs, so
    the plan is scan → score → filter, embarrassingly parallel.

    ``prefilter='binary'`` (cosine only) inserts the packed sign-bit
    Hamming screen ahead of the float score: pairs whose Hamming
    fraction exceeds ``acos-margin`` are discarded on integer ops alone
    (sign-random-projection: E[ham/d] = θ/π; the margin keeps the screen
    conservative on finite dims). The float pass then touches only
    survivors, and the final filter keeps the result EXACT-minus-recall
    of the screen — pass ``prefilter=None`` for the fully exact scan,
    which is what the oracle checks. At 100 TB the screen is the
    difference between streaming 1-bit signatures and streaming float32.
    """
    import math as _math

    q = queries.select(
        F.col(query_id),
        F.col(query_vec).alias("__qv"),
        *(
            [vec_quantize_binary(query_vec).alias("__qsig")]
            if prefilter == "binary"
            else []
        ),
    )
    c = corpus.select(
        F.col(corpus_id),
        F.col(corpus_vec).alias("__cv"),
        *(
            [vec_quantize_binary(corpus_vec).alias("__csig")]
            if prefilter == "binary"
            else []
        ),
    )
    pairs = F.broadcast(q).crossJoin(c)
    if prefilter == "binary":
        if metric != "cosine":
            raise ValueError("binary prefilter requires metric='cosine'")
        # cos θ >= τ ⟺ θ <= acos τ ⟹ E[ham] <= d·θ/π; screen at the
        # margin-padded bound so finite-dim variance doesn't cost recall
        theta = _math.acos(max(-1.0, min(1.0, threshold)))
        frac = min(1.0, theta / _math.pi + prefilter_margin)
        d = F.size("__qv")
        pairs = pairs.filter(
            vec_hamming("__qsig", "__csig") <= (d.cast("double") * F.lit(frac)).cast("bigint")
        )
    score = (
        vec_dot(F.col("__qv"), F.col("__cv"))
        if metric == "dot"
        else vec_cosine(F.col("__qv"), F.col("__cv"))
    )
    return pairs.select(
        query_id, corpus_id, F.round(score, 6).alias(score_col)
    ).filter(F.col(score_col) >= threshold)


def _topk_shuffle(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    query_id: str,
    query_vec: str,
    corpus_id: str,
    corpus_vec: str,
    metric: str,
    score_col: str,
    rank_col: str,
) -> DataFrame:
    """crossJoin → JVM-side score → ranked window. Exact fallback; the score
    expression is pure Catalyst (``zip_with``/``aggregate``), so the only
    Python-free plan survives whole-stage codegen."""
    q = queries.select(F.col(query_id), F.col(query_vec).alias("__qv"))
    c = corpus.select(F.col(corpus_id), F.col(corpus_vec).alias("__cv"))
    scored = q.crossJoin(c).select(
        query_id,
        corpus_id,
        F.round(_metric_score(metric, F.col("__qv"), F.col("__cv")), 6).alias(score_col),
    )
    w = Window.partitionBy(query_id).orderBy(F.desc(score_col), F.asc(corpus_id))
    return scored.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)


def _topk_quantized(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    query_id: str,
    query_vec: str,
    corpus_id: str,
    corpus_vec: str,
    metric: str,
    score_col: str,
    rank_col: str,
    rescore_factor: int | None,
) -> DataFrame:
    """int8-quantized broadcast scoring — the 4×-smaller-corpus memory
    lever (the broadcast strategy stays viable 4× longer before falling
    back to shuffle). Scores are exact integer dots rescaled by the two
    per-vector scales; for ``metric='cosine'`` both sides L2-normalize
    BEFORE quantization so the quantized dot approximates cosine. With
    ``rescore_factor=r``, the quantized pass keeps r·k candidates and a
    full-precision pass rescores ONLY those — the two-stage production
    recipe that recovers the exact top-k at a fraction of the float work.
    Without it, the quantized scores are final (approximate, but
    bit-identical across engines and partitionings)."""
    from confluent_kafka_vector_search_prompt_inference_spark.functions.vector import (
        vec_normalize,
        vec_quantize_int8,
        vec_quantized_dot,
    )

    qv = vec_normalize(query_vec) if metric == "cosine" else F.col(query_vec)
    cv = vec_normalize(corpus_vec) if metric == "cosine" else F.col(corpus_vec)
    q = queries.select(
        F.col(query_id), qv.alias("__qv"), vec_quantize_int8(qv).alias("__qa")
    )
    # Broadcast ONLY the int8 codes (+ per-vector scale inside the struct) —
    # the whole point of the strategy is that the broadcast is 4× smaller
    # than float32; the full-precision corpus vectors never leave their
    # partitions (rescore re-attaches them by id below).
    c = corpus.select(F.col(corpus_id), vec_quantize_int8(cv).alias("__qb"))
    # the pair stage carries ids + one integer-derived score ONLY — at
    # |Q|·|C| rows, a per-pair float array payload dominates the rank
    # window's shuffle (measured 92s → linear at sf10 when dropped); the
    # query vector re-attaches by id to the r·k survivors below
    coarse = q.select(query_id, "__qa").crossJoin(F.broadcast(c)).select(
        query_id,
        corpus_id,
        vec_quantized_dot("__qa", "__qb").alias("__qs"),
    )
    wq = Window.partitionBy(query_id).orderBy(F.desc("__qs"), F.asc(corpus_id))
    if rescore_factor is None:
        return (
            coarse.select(
                query_id, corpus_id, F.round("__qs", 6).alias(score_col)
            )
            .withColumn(
                rank_col,
                F.row_number().over(
                    Window.partitionBy(query_id).orderBy(
                        F.desc(score_col), F.asc(corpus_id)
                    )
                ),
            )
            .filter(F.col(rank_col) <= k)
        )
    cands = (
        coarse.withColumn("__crank", F.row_number().over(wq))
        .filter(F.col("__crank") <= rescore_factor * k)
        .join(q.select(query_id, "__qv"), query_id)
    )
    # Exact rescore touches candidates only: broadcast the small candidate
    # list (|Q|·r·k ids) and stream the corpus past it — the big side is
    # neither shuffled nor broadcast.
    exact = corpus.select(F.col(corpus_id), cv.alias("__cv")).join(
        F.broadcast(cands.select(query_id, corpus_id, "__qv")), corpus_id
    )
    wf = Window.partitionBy(query_id).orderBy(F.desc(score_col), F.asc(corpus_id))
    return (
        exact.select(
            query_id,
            corpus_id,
            F.round(vec_dot("__qv", "__cv"), 6).alias(score_col),
        )
        .withColumn(rank_col, F.row_number().over(wf))
        .filter(F.col(rank_col) <= k)
    )
