"""The reference's end-to-end RAG pipeline, Spark-first.

Reference dataflow (SURVEY.md §3, reference ``README.md:19-24``):

1. ``user_questions`` topic → embed each question
   (``INSERT INTO user_questions_vector SELECT ... , LATERAL TABLE(
   ml_predict('vector_encoding', content))``, ``README.md:286-288``);
2. top-3 dot-product vector search against the product corpus, laterally
   joined (``FEDERATED_SEARCH('mongodb_vector_search', 3, vector)``,
   ``README.md:438-446``) → ``user_prompts`` with
   ``products ARRAY<ROW<content STRING>>`` (``README.md:413-421``);
3. JSON prompt assembly (``json_object`` + ``CAST(products AS STRING)``,
   ``README.md:726-730``) → LLM → ``llm_answers`` (``README.md:487-495``).

Spark translation: embedding is an Arrow-batched UDF column (not a join);
the vector search is the engine's ``topk_similarity_join`` with the corpus
broadcast (no shuffle of question rows); prompt assembly is pure Catalyst
(``to_json(struct(...))``). Batch and streaming share the same transform —
the streaming variant wraps it in ``foreachBatch``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from confluent_kafka_vector_search_prompt_inference_spark.functions.json_fns import json_object
from confluent_kafka_vector_search_prompt_inference_spark.models import ModelRegistry
from confluent_kafka_vector_search_prompt_inference_spark.operators.topk_join import (
    PreparedCorpus,
    prepare_broadcast_corpus,
    topk_prepared,
    topk_similarity_join,
)

#: Measured exact-broadcast-lane crossover (SCALECHECK.json streaming
#: rungs, local[32]): at a 100k-row corpus the exact matmul lane and the
#: persisted-IVF probe lane tie (242 vs 234 rows/s); at 1M the probe lane
#: is 3.2× faster (183 vs 57) and the gap widens with corpus size — the
#: exact lane's per-batch cost is a full |Q|×|C| matmul by construction.
#: streaming_transform warns once past this row count: the deployment
#: should ride a persisted index (``vector_index=``). Geometric midpoint
#: of the two measured rungs ON THE REFERENCE BOX — see
#: :func:`exact_lane_crossover_rows` for how it is rescaled to the
#: host actually running (round 9: the raw constant was only right on
#: the hardware it was laddered on).
EXACT_LANE_CROSSOVER_ROWS = 300_000

#: The reference box's measured ratio between one fixed small Spark
#: job's wall time and one fixed NumPy matmul's wall time (the two unit
#: costs whose BALANCE sets the crossover — see
#: :func:`exact_lane_crossover_rows`). Measured (warmed, min-of-5 job /
#: min-of-3 matmul) on the otherwise-idle box the 300k crossover was
#: laddered on: 58-76 across repeats, median ~66 — the ±25% repeat
#: spread bounds the derived threshold's precision, adequate for a
#: warning whose stated fidelity is order-of-magnitude.
_CROSSOVER_REF_RATIO = 66.0


def _host_speed_ratio(spark) -> float:
    """One-time (per process) micro-probe of the two unit costs that set
    the exact-lane crossover:

    - the exact lane's per-row cost is a dense matmul (NumPy/BLAS
      inside the scoring UDF) — probed by a fixed ``2000×64 @ 64×2000``
      float32 matmul;
    - the probe lane's small-corpus cost is dominated by fixed per-batch
      Spark work (job scheduling, a tiny shuffle, index metadata) —
      probed by a fixed ``range(200k) → pmod groupBy → count`` job.

    If BOTH scale together (a uniformly faster host), the crossover in
    ROWS is unchanged — which is why the probe measures their RATIO, not
    absolute speed: a host with fast BLAS relative to its JVM overhead
    amortizes scheduling over a bigger matmul, moving the crossover UP,
    and vice versa. min-of-3 each; memoized so streaming prepare pays it
    once per process (~1 s), never per micro-batch."""
    import time

    import numpy as np
    from pyspark.sql import functions as F

    a = np.random.default_rng(0).standard_normal((2000, 64)).astype(np.float32)
    (a @ a.T).sum()  # warm-up: the first BLAS call pays thread-pool
    #                  setup (measured 10x the steady 5.5 ms)
    t_mm = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        (a @ a.T).sum()
        t_mm = min(t_mm, time.perf_counter() - t0)

    def _job() -> None:
        (
            spark.range(200_000)
            .groupBy(F.pmod(F.col("id"), F.lit(64)).alias("k"))
            .count()
            .count()
        )

    _job()  # warm-up: a cold session's FIRST job pays one-off scheduler/
    #         codegen setup that a min cannot wash out (measured +45%)
    t_job = float("inf")
    for _ in range(5):  # the job side carries ±40% scheduler noise;
        #                 min-of-5 estimates its floor
        t0 = time.perf_counter()
        _job()
        t_job = min(t_job, time.perf_counter() - t0)
    return t_job / max(t_mm, 1e-6)


import weakref as _weakref

#: session → measured host-speed ratio. WEAK keys: an ``id(spark)`` key
#: would both leak entries for stopped sessions and — worse — alias a
#: NEW session onto a dead one's address, silently reusing a stale
#: ratio without probing.
_crossover_cache: "_weakref.WeakKeyDictionary" = _weakref.WeakKeyDictionary()


def exact_lane_crossover_rows(spark) -> int:
    """The exact-broadcast-lane crossover scaled to THIS host:
    ``EXACT_LANE_CROSSOVER_ROWS × (host ratio / reference ratio)``, the
    scaling factor clamped to [1/32, 32] so a pathological probe sample
    can only move the warning threshold, never effectively disable it in
    either direction. The formula: the crossover sits where the exact
    lane's linear-in-corpus
    matmul cost overtakes the probe lane's fixed per-batch overhead, so
    it scales with overhead/matmul-unit-cost — the ratio
    :func:`_host_speed_ratio` measures (SCALING.md, round 9). This is a
    warning threshold: order-of-magnitude fidelity is the goal, which is
    why a 2-point micro-probe is enough where a full re-ladder would be
    the honest answer for a new production cluster. The memo holds the
    measured RATIO (weak-keyed per session), not the derived threshold,
    so the reference constants stay live."""
    if spark not in _crossover_cache:
        _crossover_cache[spark] = _host_speed_ratio(spark)
    factor = min(
        32.0, max(1.0 / 32.0, _crossover_cache[spark] / _CROSSOVER_REF_RATIO)
    )
    return int(EXACT_LANE_CROSSOVER_ROWS * factor)


@dataclass
class RagPipeline:
    registry: ModelRegistry
    embed_model: str = "vector_encoding"
    llm_model: str = "retail_assistant"
    k: int = 3
    question_id: str = "question_id"
    strategy: str = "auto"
    #: "vector" (the reference's FEDERATED_SEARCH semantics) or "hybrid"
    #: (vector ⊕ BM25 keyword legs fused by reciprocal rank — the
    #: engine's extension; same output schema either way).
    retrieval: str = "vector"
    #: Optional saved BM25 index table name (``operators.bm25.
    #: save_bm25_index``). When set, the hybrid keyword leg searches the
    #: persisted term-bucketed index (bucket-pruned scan, zero per-batch
    #: postings build) instead of rebuilding postings from the corpus —
    #: the steady-state streaming shape: the corpus and its index are
    #: maintained by the ingest side; query batches only read.
    keyword_index: str | None = None
    #: Optional saved IVF index path (``operators.ivf.save_ivf_index`` /
    #: the streaming ``ivf_insert`` sink). When set, the vector leg probes
    #: the PERSISTED index (cluster-pruned scan, ``n_probe`` clusters per
    #: query) instead of scoring a passed-in corpus — the steady-state
    #: pairing with the always-indexed ingest side; ``corpus`` may then be
    #: omitted, and product content comes from the index rows themselves.
    vector_index: str | None = None
    n_probe: int = 4
    #: Declared recall floor for the persisted-index leg — the
    #: ``recall_target=`` contract reaching the tier streaming
    #: deployments actually ride past the broadcast crossover. When set,
    #: ``n_probe`` is CALIBRATED (``operators.ivf.calibrate_ivf_n_probe``)
    #: instead of taken from the ``n_probe`` field, and the measured
    #: curve is cached INSIDE the index directory keyed by a filesystem
    #: fingerprint: the steady state pays the two calibration scans once,
    #: every later micro-batch is a pure cache hit, and any index
    #: append/vacuum/split automatically re-calibrates (drift
    #: invalidation via file metadata).
    recall_target: float | None = None
    #: (fingerprint, corpus DataFrame, centroids) of the last
    #: ``vector_index`` load — see :meth:`_load_index`.
    _index_cache: tuple | None = field(default=None, repr=False, compare=False)

    def _load_index(self, spark):
        """Load ``vector_index``, cached against a filesystem-metadata
        fingerprint: a micro-batch whose index is UNCHANGED reuses the
        previous DataFrame (and its pinned file listing) instead of
        re-paying recovery checks, directory re-listing (a
        one-task-per-cluster-dir partition-discovery job — 1,732 tasks
        per batch at a 3M-row index on the streaming ladder), and the
        centroid collect. Any append/vacuum/split/compact touches files,
        moves the fingerprint, and forces a fresh load — so appends stay
        visible batch-to-batch exactly as before, the cache only
        eliminates the steady-state cost of NOTHING having changed. The
        same fingerprint keys the recall-calibration cache, so both
        caches invalidate on the same drift signal.

        Round 8: the unchanged corpus DataFrame is also PERSISTED
        (MEMORY_AND_DISK_DESER) — the phase decomposition of the
        streaming ladder attributed the probe lane's super-√n per-batch
        cost to re-reading the probed cluster files from parquet every
        micro-batch (a 500-query batch at n_probe=8 touches most of a
        √n-cluster index, so the 'pruned' scan converges to the full
        corpus as batch size approaches n_clusters/n_probe). Persisting
        is exactly what a long-running cluster job does with a hot
        index: bounded by executor storage memory, spills to local disk,
        evicted LRU — never a correctness dependency. The persist is
        released on drift (fingerprint change) and by :meth:`release`."""
        from confluent_kafka_vector_search_prompt_inference_spark.operators.calibration_cache import directory_fingerprint
        from confluent_kafka_vector_search_prompt_inference_spark.operators.ivf import load_ivf_index

        fp = directory_fingerprint(self.vector_index)
        if self._index_cache is not None and self._index_cache[0] == fp:
            return self._index_cache[1], self._index_cache[2], fp
        if self._index_cache is not None:
            self._index_cache[1].unpersist()  # drift: release the old snapshot
        indexed, cents = load_ivf_index(spark, self.vector_index)
        indexed = indexed.persist()  # MEMORY_AND_DISK: hot-index steady state
        self._index_cache = (fp, indexed, cents)
        return indexed, cents, fp

    def release(self) -> None:
        """Release the persisted index snapshot (benches, ladders, tests
        — anything that tears pipelines down inside one Spark session)."""
        if self._index_cache is not None:
            self._index_cache[1].unpersist()
            self._index_cache = None

    def _ensure_id(self, questions: DataFrame) -> DataFrame:
        """Questions need a stable unique id for the top-k join; derive one
        from content+sessionid when absent (deterministic, unlike
        ``monotonically_increasing_id``)."""
        if self.question_id in questions.columns:
            return questions
        return questions.withColumn(
            self.question_id,
            F.md5(F.concat_ws("\x1f", F.col("content"), F.col("sessionid"))),
        )

    def embed_questions(self, questions: DataFrame) -> DataFrame:
        """Stage 1 → ``user_questions_vector`` (``README.md:286-288``); the
        projection drops ``email`` — PII never reaches the LLM
        (``README.md:244-247``)."""
        q = self._ensure_id(questions)
        embedded = self.registry.ml_predict(q, self.embed_model, "content")
        keep = [c for c in ("role", "content", "sessionid", self.question_id) if c in embedded.columns]
        return embedded.select(*keep, "vector")

    def search_prompts(
        self,
        questions_vec: DataFrame,
        corpus: DataFrame | None = None,
        *,
        prepared: PreparedCorpus | None = None,
    ) -> DataFrame:
        """Stage 2 → ``user_prompts`` (``README.md:438-446``): top-k corpus
        rows per question, packed as ``products ARRAY<STRUCT<content>>``
        ordered by similarity rank (``README.md:413-421``).

        ``prepared`` (a :class:`PreparedCorpus`) short-circuits the vector
        leg to a pre-broadcast matrix scan — the streaming steady state
        where the same corpus is searched every micro-batch (see
        :meth:`streaming_transform`)."""
        if self.vector_index is not None:
            if self.retrieval == "hybrid":
                raise ValueError(
                    "vector_index currently pairs with retrieval='vector' "
                    "(the hybrid keyword leg has its own keyword_index)"
                )
            import os

            from confluent_kafka_vector_search_prompt_inference_spark.operators.ivf import topk_ivf

            spark = questions_vec.sparkSession
            indexed, cents, index_fp = self._load_index(spark)
            recall_kwargs = {}
            if self.recall_target is not None:
                from confluent_kafka_vector_search_prompt_inference_spark.operators.calibration_cache import (
                    CalibrationCache,
                )

                recall_kwargs = dict(
                    recall_target=self.recall_target,
                    calibration_cache=CalibrationCache(
                        os.path.join(self.vector_index, "_calibration.json")
                    ),
                    corpus_fingerprint=index_fp,
                )
            hits = topk_ivf(
                questions_vec, indexed, cents, self.k,
                query_id=self.question_id, query_vec="vector",
                corpus_id="product_id", corpus_vec="vector",
                metric="dot", n_probe=self.n_probe,
                **recall_kwargs,
            )
            corpus = indexed
        elif corpus is None:
            raise ValueError("corpus is required unless vector_index is set")
        elif self.retrieval == "hybrid":
            hits = self._hybrid_hits(questions_vec, corpus)
        elif prepared is not None:
            hits = topk_prepared(
                questions_vec, prepared, self.k,
                query_id=self.question_id, query_vec="vector",
            )
        else:
            hits = topk_similarity_join(
                questions_vec,
                corpus,
                self.k,
                query_id=self.question_id,
                query_vec="vector",
                corpus_id="product_id",
                corpus_vec="vector",
                metric="dot",
                strategy=self.strategy,
            )
        # content attaches by broadcasting the SMALL side: hits are k·|Q|
        # (id, rank) rows, the corpus content column is corpus-sized — at
        # 1M products the old corpus-side broadcast shipped ~hundreds of
        # MB per micro-batch; the hits-side broadcast ships kilobytes and
        # the corpus is scanned in place.
        products = (
            corpus.select("product_id", "content")
            .join(F.broadcast(hits), "product_id")
            .groupBy(self.question_id)
            .agg(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("rank", F.col("content").alias("content")))),
                    lambda s: F.struct(s["content"].alias("content")),
                ).alias("products")
            )
        )
        return questions_vec.join(products, self.question_id, "left").select(
            "role",
            F.col("content"),
            "sessionid",
            self.question_id,
            F.coalesce("products", F.array().cast("array<struct<content:string>>")).alias(
                "products"
            ),
        )

    def _hybrid_hits(self, questions_vec: DataFrame, corpus: DataFrame) -> DataFrame:
        """Hybrid retrieval: vector and BM25 keyword top-pool legs fused by
        reciprocal rank, cut to k — catches lexical matches the embedding
        misses and vice versa. Pool = max(4k, 20) per leg before fusion."""
        from confluent_kafka_vector_search_prompt_inference_spark.operators.bm25 import (
            bm25_search,
            bm25_search_indexed,
            rrf_fuse,
        )

        pool = max(self.k * 4, 20)
        vec = topk_similarity_join(
            questions_vec, corpus, pool,
            query_id=self.question_id, query_vec="vector",
            corpus_id="product_id", corpus_vec="vector",
            metric="dot", strategy=self.strategy,
        ).select(
            F.col(self.question_id).alias("query_id"),
            F.col("product_id").alias("doc_id"),
            "rank",
        )
        kw_queries = questions_vec.select(
            F.col(self.question_id).alias("query_id"),
            F.col("content").alias("query_text"),
        )
        if self.keyword_index is not None:
            kw = bm25_search_indexed(
                questions_vec.sparkSession, self.keyword_index, kw_queries, k=pool
            )
        else:
            kw = bm25_search(
                corpus.select(F.col("product_id").alias("doc_id"), F.col("content").alias("text")),
                kw_queries,
                k=pool,
            )
        fused = rrf_fuse(kw, vec, k=self.k)
        return fused.select(
            F.col("query_id").alias(self.question_id),
            F.col("doc_id").alias("product_id"),
            "rank",
        )

    def prompt_json(self) -> F.Column:
        """Stage-3 prompt assembly (``README.md:726-730``): a JSON *string*
        via ``json_object`` semantics — nested products stringified like the
        reference's ``CAST(products AS STRING)``."""
        return json_object(
            prompt=F.col("content"),
            products=F.to_json(F.col("products")),
        )

    def answer_prompts(self, prompts: DataFrame) -> DataFrame:
        """Stage 3 → ``llm_answers`` (``README.md:487-495, 724-732``)."""
        with_prompt = prompts.withColumn("__prompt", self.prompt_json())
        answered = self.registry.ml_predict(with_prompt, self.llm_model, "__prompt")
        return answered.select("role", "content", "sessionid", "json_response")

    def run_batch(
        self,
        questions: DataFrame,
        corpus: DataFrame | None = None,
        *,
        prepared: PreparedCorpus | None = None,
    ) -> DataFrame:
        """Full pipeline: questions → embedded → retrieved → answered."""
        vec = self.embed_questions(questions)
        prompts = self.search_prompts(vec, corpus, prepared=prepared)
        return self.answer_prompts(prompts)

    def streaming_transform(self, corpus: DataFrame | None = None, *, corpus_reader=None):
        """Per-micro-batch transform for ``foreachBatch`` — identical logic
        to :meth:`run_batch`, reproducing the reference's three continuous
        statements as one restart-safe streaming job.

        The corpus matrix is prepared ONCE here (collect + broadcast,
        :func:`prepare_broadcast_corpus`) and reused by every micro-batch:
        re-collecting an unchanged corpus per batch was the round-6
        streaming-ladder finding (251 → 7.4 rows/s from a 10k → 1M corpus,
        p50 batch 72 s — almost all of it per-batch corpus collect). Over
        the broadcast budget, preparation declines and the per-batch auto
        picker runs as before — at that size the right answer is the
        persisted IVF index (``vector_index=``), which skips this path
        entirely.

        STALENESS CONTRACT (round 7): the prepared matrix — and, for a
        path-backed corpus, the DataFrame's pinned file listing — is a
        SNAPSHOT. Rows appended to the corpus after stream start are NOT
        visible to the exact lane until the caller invokes
        ``transform.refresh()``; this is the documented trade against
        the per-batch-reloading IVF lane (``vector_index=``), which sees
        appends immediately. ``refresh()`` re-resolves the corpus via
        ``corpus_reader`` (a zero-arg callable returning a FRESH
        DataFrame, e.g. ``lambda: spark.read.parquet(path)`` — required
        for file-backed corpora, whose original DataFrame pins its file
        listing at creation) and re-prepares the matrix; subsequent
        micro-batches search the new snapshot. Without ``corpus_reader``,
        ``refresh()`` re-collects the ORIGINAL DataFrame — enough for
        corpora whose lineage re-reads mutable upstream state, and a
        documented no-op for pinned file listings."""
        state = {"corpus": corpus, "prepared": None}
        if corpus is None and corpus_reader is not None:
            state["corpus"] = corpus_reader()

        def _prepare(c: DataFrame | None):
            if (
                c is not None
                and self.vector_index is None
                and self.retrieval == "vector"
                and self.strategy in ("auto", "broadcast_corpus")
            ):
                try:
                    prepared = prepare_broadcast_corpus(
                        c, corpus_id="product_id", corpus_vec="vector",
                        metric="dot",
                    )
                except ValueError:
                    return None  # over budget — per-batch auto handles it
                # crossover guard: the exact lane silently decays past the
                # measured ~100k–1M crossover (SCALECHECK: 57 rows/s at 1M
                # vs the IVF lane's 183) long before the broadcast budget
                # refuses it — warn at prepare time, once, so the decay is
                # a choice rather than a surprise.
                crossover = exact_lane_crossover_rows(c.sparkSession)
                if (
                    prepared.n_rows is not None
                    and prepared.n_rows > crossover
                ):
                    import warnings

                    warnings.warn(
                        f"RagPipeline exact broadcast lane prepared over a "
                        f"{prepared.n_rows}-row corpus — past the "
                        f"host-scaled exact-lane crossover "
                        f"(~{crossover} rows; reference "
                        f"{EXACT_LANE_CROSSOVER_ROWS}, SCALING.md): "
                        "every micro-batch pays a full corpus matmul. Use "
                        "a persisted IVF index (vector_index=) for this "
                        "corpus size.",
                        stacklevel=3,
                    )
                return prepared
            return None

        state["prepared"] = _prepare(state["corpus"])

        def transform(batch_df: DataFrame) -> DataFrame:
            return self.run_batch(
                batch_df, state["corpus"], prepared=state["prepared"]
            )

        def refresh() -> None:
            fresh = corpus_reader() if corpus_reader is not None else state["corpus"]
            old = state["prepared"]
            state["corpus"] = fresh
            state["prepared"] = _prepare(fresh)
            transform.prepared = state["prepared"]
            if old is not None:
                old.unpersist()

        # callers that tear streams down (benches, ladders, tests) can
        # release the broadcast: transform.prepared.unpersist()
        transform.prepared = state["prepared"]
        transform.refresh = refresh
        return transform
