"""IVF-PQ: coarse clustering + residual product quantization — the
composed scale path for billion-vector search (the FAISS ``IVFADC``
recipe, Jégou et al., "Product Quantization for Nearest Neighbor
Search", TPAMI 2011).

The two indexes this repo already ships compose multiplicatively:

- IVF (``operators/ivf.py``) prunes WHICH rows are scanned — a probe
  touches ``n_probe / n_clusters`` of the corpus via the cluster-id
  partition key.
- PQ (``operators/pq.py``) shrinks WHAT is scanned — m one-byte codes
  per row instead of d floats, scored by LUT gather-adds.

IVF-PQ applies PQ to the *residual* ``x − centroid(x)`` rather than the
raw vector: residuals concentrate near zero with far lower variance than
raw vectors, so the same codebook budget quantizes them with much less
error (the core observation of IVFADC). For dot-product scoring the
decomposition is exact before quantization::

    q · x  =  q · c(x)  +  q · (x − c(x))
            = (tiny per-cluster term)  +  (ADC over residual codes)

so a probe scores ``q·c`` once per (query, cluster) — nq × n_clusters
doubles, driver-trivial — and gather-adds residual LUTs per row.

Spark shape, sized for 100 TB:
- Training (coarse centroids AND residual codebooks) is driver-side on
  an order-invariant hash sample — constant cost, identical for any
  physical row order (same rationale as ``train_pq_codebooks``).
- Indexing is ONE Arrow-batched pass: assign → residual → encode, no
  shuffle; the output (id, cluster, codes) is columnar metadata ~1% the
  corpus width.
- Search is ONE ``mapInPandas`` scan over (id, cluster, codes): the
  query block (ids + matrix + probe sets + q·c terms) broadcasts, each
  partition emits a ≤ k·nq partial top-k, and only those candidate rows
  shuffle into the final window — corpus scale never enters the shuffle.
  Rows outside a query's probe set are masked BEFORE the gather, so the
  per-row work tracks n_probe/n_clusters exactly; on a saved index the
  same probe set becomes a partition-pruning filter on the cluster
  directory key, so pruned clusters are never read off storage at all.
- Exact rescoring of the short-list (two-stage) recovers full precision,
  identical to the quantized-rescore pattern.

Reference anchor: the vector-search index the reference queries through
``numCandidates`` (README.md:364-368) is exactly this shape — a
clustered, quantized index probed per query with a rescored short-list.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    ShortType,
    StructField,
    StructType,
)


def build_ivfpq_index(
    corpus: DataFrame,
    vec_col: str = "vector",
    *,
    n_clusters: int = 16,
    m: int = 8,
    k: int = 32,
    seed: int = 42,
    max_iter: int = 10,
    sample_rows: int = 16_384,
    cluster_col: str = "ivf_cluster",
    code_col: str = "pq_codes",
) -> tuple[DataFrame, np.ndarray, np.ndarray]:
    """Train coarse + residual quantizers, encode the corpus.

    Returns ``(encoded, centroids, codebooks)`` where ``encoded`` carries
    the original columns plus ``cluster_col INT`` and ``code_col
    ARRAY<SMALLINT>``, ``centroids`` is ``(n_clusters, d)`` and
    ``codebooks`` is ``(m, k, d/m)`` — both driver-side metadata shipped
    to queries via broadcast.

    One hash sample feeds both trainers: coarse centroids from the raw
    sample, residual codebooks from the same sample's residuals against
    those centroids — so train cost is a single bounded ``collect``
    regardless of corpus size, and the result is invariant to physical
    row order (``xxhash64`` sample, not a file-prefix ``limit``).
    """
    from confluent_kafka_vector_search_prompt_inference_spark.operators._kmeans import kmeans_fit

    from confluent_kafka_vector_search_prompt_inference_spark.operators.ivf import _hash_bottom_sample

    X = _hash_bottom_sample(corpus, vec_col, sample_rows)
    centroids = kmeans_fit(X, n_clusters, seed=seed, max_iter=max_iter)

    # Residuals of the SAME sample train the subspace codebooks.
    d2 = (
        (X**2).sum(axis=1)[:, None]
        - 2.0 * X @ centroids.T
        + (centroids**2).sum(axis=1)[None, :]
    )
    resid = X - centroids[d2.argmin(axis=1)]
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    k_eff = min(k, len(resid))
    codebooks = np.stack(
        [
            kmeans_fit(resid[:, j * sub : (j + 1) * sub], k_eff, seed=seed + 1 + j, max_iter=max_iter)
            for j in range(m)
        ]
    )

    encoded = corpus.withColumn(
        "__assigned", _assign_encode_udf(centroids, codebooks)(F.col(vec_col))
    )
    encoded = (
        encoded.withColumn(cluster_col, F.col("__assigned").getField("cluster"))
        .withColumn(code_col, F.col("__assigned").getField("codes"))
        .drop("__assigned")
    )
    return encoded, centroids, codebooks


def _assign_encode_udf(centroids: np.ndarray, codebooks: np.ndarray):
    """ONE Arrow pass: nearest coarse centroid + residual PQ codes."""
    cent = centroids.astype(np.float64)
    cent_sq = (cent**2).sum(axis=1)
    books = codebooks.astype(np.float64)
    m, _k, sub = books.shape

    out_t = StructType(
        [
            StructField("cluster", IntegerType()),
            StructField("codes", ArrayType(ShortType())),
        ]
    )

    @F.pandas_udf(out_t)
    def enc(vs: pd.Series) -> pd.DataFrame:
        X = np.asarray([np.asarray(v, dtype=np.float64) for v in vs])
        d2 = (X**2).sum(axis=1)[:, None] - 2.0 * X @ cent.T + cent_sq[None, :]
        cl = d2.argmin(axis=1)
        R = X - cent[cl]
        codes = np.empty((len(X), m), dtype=np.int16)
        for j in range(m):
            seg = R[:, j * sub : (j + 1) * sub]
            dj = (
                (seg**2).sum(axis=1)[:, None]
                - 2.0 * seg @ books[j].T
                + (books[j] ** 2).sum(axis=1)[None, :]
            )
            codes[:, j] = dj.argmin(axis=1)
        return pd.DataFrame({"cluster": cl.astype(np.int32), "codes": list(codes)})

    return enc


def save_ivfpq_index(
    encoded: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    path: str,
    *,
    cluster_col: str = "ivf_cluster",
) -> None:
    """Persist codes PARTITIONED BY cluster id (probe ⇒ partition pruning,
    same layout contract as :func:`~confluent_kafka_vector_search_prompt_inference_spark.operators.ivf.save_ivf_index`)
    plus the two metadata tensors."""
    spark = encoded.sparkSession
    # repartition by cluster first: one file per cluster instead of one
    # per (task, cluster) pair — see save_ivf_index's file-count note
    encoded.repartition(F.col(cluster_col)).write.partitionBy(cluster_col).mode(
        "overwrite"
    ).parquet(os.path.join(path, "corpus"))
    cent_pdf = pd.DataFrame(
        {
            "cluster_id": [int(i) for i in range(len(centroids))],
            "centroid": [[float(x) for x in c] for c in centroids],
        }
    )
    spark.createDataFrame(
        cent_pdf, schema="cluster_id int, centroid array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(path, "centroids"))
    m, kk, sub = codebooks.shape
    book_pdf = pd.DataFrame(
        {
            "subspace": np.repeat(np.arange(m), kk).astype(int),
            "code": np.tile(np.arange(kk), m).astype(int),
            "centroid": [
                [float(x) for x in codebooks[j, c]] for j in range(m) for c in range(kk)
            ],
        }
    )
    spark.createDataFrame(
        book_pdf, schema="subspace int, code int, centroid array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(path, "codebooks"))


def load_ivfpq_index(
    spark: SparkSession, path: str
) -> tuple[DataFrame, np.ndarray, np.ndarray]:
    """(encoded corpus, centroids, codebooks) from disk. The corpus reader
    keeps ``ivf_cluster`` as the partition key, so a probe-set filter on it
    prunes directories before any IO. Tombstoned ids
    (``catalog.forget`` / ``_index_io.write_tombstones``) are anti-joined
    out exactly as in ``load_ivf_index``/``load_pq_index`` — an erasure
    against an IVF-PQ index is honored by every subsequent probe, not
    silently ignored; a vacuum crash is finished on load."""
    from confluent_kafka_vector_search_prompt_inference_spark.operators._index_io import (
        apply_tombstones,
        recover_vacuum,
    )
    from confluent_kafka_vector_search_prompt_inference_spark.operators.ivf import recover_split

    recover_vacuum(path)
    recover_split(path)
    corpus = apply_tombstones(
        spark, spark.read.parquet(os.path.join(path, "corpus")), path
    )
    cent_rows = (
        spark.read.parquet(os.path.join(path, "centroids")).orderBy("cluster_id").collect()
    )
    centroids = np.asarray([np.asarray(r.centroid, dtype=np.float64) for r in cent_rows])
    book_rows = (
        spark.read.parquet(os.path.join(path, "codebooks"))
        .orderBy("subspace", "code")
        .collect()
    )
    m = 1 + max(r.subspace for r in book_rows)
    kk = 1 + max(r.code for r in book_rows)
    sub = len(book_rows[0].centroid)
    codebooks = np.empty((m, kk, sub))
    for r in book_rows:
        codebooks[r.subspace, r.code] = np.asarray(r.centroid, dtype=np.float64)
    return corpus, centroids, codebooks


def topk_ivfpq(
    queries: DataFrame,
    encoded: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    k: int = 10,
    *,
    query_id: str,
    query_vec: str = "vector",
    corpus_id: str,
    cluster_col: str = "ivf_cluster",
    code_col: str = "pq_codes",
    n_probe: int = 4,
    score_col: str = "score",
    rank_col: str = "rank",
) -> DataFrame:
    """Approximate dot-product top-k: probe-masked residual ADC in one
    corpus scan (module docstring). Emits ``(query_id, corpus_id, score,
    rank)``; scores are ``q·c + ADC(residual)`` — exact iff the residual
    quantization is (i.e. never, which is why callers two-stage rescore).
    """
    from confluent_kafka_vector_search_prompt_inference_spark.operators.topk_join import (
        _collect_matrix,
        _rowwise_topk,
    )

    cent = centroids.astype(np.float64)
    books = codebooks.astype(np.float64)
    m, _nk, sub = books.shape
    n_clusters = len(cent)
    n_probe = min(n_probe, n_clusters)

    spark = queries.sparkSession
    q_ids, Q = _collect_matrix(queries, query_id, query_vec)
    # Per-query coarse terms and probe sets: nq × n_clusters doubles —
    # driver-trivial at any corpus scale (clusters number in the tens of
    # thousands even at 100 TB).
    qdotc = Q.astype(np.float64) @ cent.T  # (nq, n_clusters)
    q_cent_d2 = (
        (Q.astype(np.float64) ** 2).sum(axis=1)[:, None]
        - 2.0 * qdotc
        + (cent**2).sum(axis=1)[None, :]
    )
    probe_mask = np.zeros_like(qdotc, dtype=bool)  # (nq, n_clusters)
    probed = np.argpartition(q_cent_d2, n_probe - 1, axis=1)[:, :n_probe]
    np.put_along_axis(probe_mask, probed, True, axis=1)
    # (nq, m, k) residual LUTs — built once driver-side, broadcast.
    luts = np.stack(
        [Q.astype(np.float64)[:, j * sub : (j + 1) * sub] @ books[j].T for j in range(m)],
        axis=1,
    )
    bc = spark.sparkContext.broadcast((q_ids, qdotc, probe_mask, luts))

    out_schema = StructType(
        [
            StructField(query_id, queries.schema[query_id].dataType),
            StructField(corpus_id, encoded.schema[corpus_id].dataType),
            StructField(score_col, DoubleType()),
        ]
    )

    def score(batches):
        qids, qc, mask, lut = bc.value
        if len(qids) == 0:
            return
        for pdf in batches:
            if pdf.empty:
                continue
            codes = np.asarray(list(pdf[code_col]), dtype=np.int64)  # (n, m)
            clusters = pdf[cluster_col].to_numpy(dtype=np.int64)  # (n,)
            cids = pdf[corpus_id].to_numpy()
            scores = qc[:, clusters].copy()  # (nq, n): the q·c term
            for j in range(m):
                scores += lut[:, j, codes[:, j]]
            # Rows outside a query's probe set never become candidates.
            scores[~mask[:, clusters]] = -np.inf
            idx, top = _rowwise_topk(scores, cids, k)
            kk = idx.shape[1]
            keep = np.isfinite(top.ravel())
            yield pd.DataFrame(
                {
                    query_id: np.repeat(qids, kk)[keep],
                    corpus_id: cids[idx].ravel()[keep],
                    score_col: top.ravel()[keep],
                }
            )

    narrow = encoded.select(corpus_id, cluster_col, code_col)
    # On a saved (cluster-partitioned) index this filter IS the probe's
    # partition pruning: only probed directories are listed and read.
    probed_clusters = sorted({int(c) for row in probed for c in row})
    if len(probed_clusters) < n_clusters:
        narrow = narrow.filter(F.col(cluster_col).isin(probed_clusters))
    partial = narrow.mapInPandas(score, out_schema)
    w = Window.partitionBy(query_id).orderBy(F.desc(score_col), F.asc(corpus_id))
    return (
        partial.withColumn(rank_col, F.row_number().over(w).cast("int"))
        .filter(F.col(rank_col) <= k)
        .select(query_id, corpus_id, F.round(score_col, 6).alias(score_col), rank_col)
    )


def topk_ivfpq_rescore(
    queries: DataFrame,
    encoded: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    k: int = 10,
    *,
    query_id: str,
    query_vec: str = "vector",
    corpus_id: str,
    corpus_vec: str = "vector",
    cluster_col: str = "ivf_cluster",
    code_col: str = "pq_codes",
    n_probe: int = 4,
    adc_width: int = 100,
    score_col: str = "score",
    rank_col: str = "rank",
    recall_target: float | None = None,
    calibration_sample: int = 32,
    max_adc_width: int | None = None,
    calibration_cache=None,
    corpus_fingerprint: str | None = None,
    query_fingerprint: str | None = None,
    recalibrate: bool = False,
) -> DataFrame:
    """Two-stage IVF-PQ search — the deployed shape of this tier (module
    docstring; the reference's index scan + rescore, ``README.md:364-368``):
    ADC shortlist of ``adc_width`` candidates per query, then EXACT
    rescoring of the shortlist against the raw vectors ``encoded`` still
    carries. Final scores are exact; the approximation only decides WHICH
    rows reach the rescore, so recall@k equals shortlist coverage of the
    exact top-k.

    ``recall_target=`` extends the measured-recall contract (the
    ``numCandidates`` generalization, and the last approximate tier to
    get it — binary/LSH/IVF gained it earlier this round) to IVF-PQ:
    :func:`calibrate_ivfpq` measures the (n_probe, adc_width) rung
    lattice on a query sample and picks the cheapest rung whose sample
    recall@k meets the target; ``n_probe``/``adc_width`` are then
    ignored. Unlike plain IVF this tier has TWO error sources (probe
    misses and ADC misranking), so a target can be unreachable under
    ``max_adc_width`` — the calibrator raises descriptively rather than
    silently under-delivering."""
    if recall_target is not None:
        (n_probe, adc_width), _ = calibrate_ivfpq(
            queries, encoded, centroids, codebooks, k,
            recall_target=recall_target,
            query_id=query_id, query_vec=query_vec,
            corpus_id=corpus_id, corpus_vec=corpus_vec,
            cluster_col=cluster_col, code_col=code_col,
            sample_queries=calibration_sample,
            max_adc_width=max_adc_width,
            cache=calibration_cache, corpus_fingerprint=corpus_fingerprint,
            query_fingerprint=query_fingerprint, recalibrate=recalibrate,
        )
    cand = topk_ivfpq(
        queries, encoded, centroids, codebooks, k=adc_width,
        query_id=query_id, query_vec=query_vec,
        corpus_id=corpus_id, cluster_col=cluster_col, code_col=code_col,
        n_probe=n_probe,
    ).select(query_id, corpus_id)
    from confluent_kafka_vector_search_prompt_inference_spark.functions.vector import vec_dot

    qv = queries.select(query_id, F.col(query_vec).alias("__qv"))
    raw = encoded.select(corpus_id, F.col(corpus_vec).alias("__cv"))
    w = Window.partitionBy(query_id).orderBy(F.desc(score_col), F.asc(corpus_id))
    # the shortlist (≤ adc_width·nq rows) broadcasts; the corpus side
    # streams past it — the established exact-rescore join shape
    return (
        F.broadcast(cand).join(raw, corpus_id)
        .join(F.broadcast(qv), query_id)
        .select(
            query_id, corpus_id,
            F.round(vec_dot(F.col("__qv"), F.col("__cv")), 6).alias(score_col),
        )
        .withColumn(rank_col, F.row_number().over(w).cast("int"))
        .filter(F.col(rank_col) <= k)
    )


def _adc_width_ladder(k: int, max_adc_width: int) -> list[int]:
    """Shortlist-width rungs: k·2^i, topped by ``max_adc_width``."""
    ladder = []
    wd = k
    while wd < max_adc_width:
        ladder.append(wd)
        wd *= 2
    ladder.append(max_adc_width)
    return ladder


def calibrate_ivfpq(
    queries: DataFrame,
    encoded: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    k: int,
    *,
    recall_target: float,
    query_id: str,
    query_vec: str = "vector",
    corpus_id: str,
    corpus_vec: str = "vector",
    cluster_col: str = "ivf_cluster",
    code_col: str = "pq_codes",
    sample_queries: int = 32,
    max_adc_width: int | None = None,
    cache=None,
    corpus_fingerprint: str | None = None,
    query_fingerprint: str | None = None,
    recalibrate: bool = False,
) -> tuple[tuple[int, int], float]:
    """Measured-recall rung selection for two-stage IVF-PQ: returns
    ``((n_probe, adc_width), measured_recall)`` — the cheapest rung on the
    (probe ladder × width ladder) lattice whose recall@k on a
    ``sample_queries``-query sample meets the target. "Cheapest" orders by
    probe width first (it sets the fraction of the corpus scanned — the
    dominant cost at scale), then shortlist width (it only sizes the
    k·nq-row rescore join).

    Same TWO-corpus-scan cost shape as the other calibrators: one exact
    ground-truth pass (sample broadcast, corpus streamed), and one ADC
    pass at FULL probe width that pools, per (query, cluster), the top
    ``max_adc_width`` candidates by ADC score. Probe lists are
    distance-ordered (prefix-monotone in ``n_probe``) and a width-w
    shortlist at probe p lives inside the union of per-cluster top-w over
    the p nearest clusters, so every lattice rung is priced from that one
    pooled pass with driver-side pandas bounded by
    sample·n_clusters·max_adc_width rows.

    Because rescore is exact, two-stage recall@k IS shortlist coverage of
    the exact top-k — the curve measures exactly what the user receives.
    Both error sources (probe misses, ADC misranking) are inside the
    measurement; if even the deepest rung misses the target the raise
    names the measured ceiling (remedy: raise ``max_adc_width``, retrain
    with more codebook bits, or drop to the IVF tier whose deepest rung
    is the exact scan).

    ``cache`` (:class:`~confluent_kafka_vector_search_prompt_inference_spark.operators.calibration_cache.CalibrationCache`)
    persists the full lattice curve against a job-free corpus
    fingerprint — repeat calibrations against an unchanged index run
    zero Spark jobs, any append/vacuum/split invalidates."""
    from confluent_kafka_vector_search_prompt_inference_spark.operators.topk_join import topk_similarity_join

    if not 0.0 < recall_target <= 1.0:
        raise ValueError(f"recall_target must be in (0, 1], got {recall_target}")
    n_clusters = len(centroids)
    from confluent_kafka_vector_search_prompt_inference_spark.operators.ivf import _probe_ladder

    probe_rungs = _probe_ladder(n_clusters)
    if max_adc_width is None:
        max_adc_width = 32 * k
    width_rungs = _adc_width_ladder(k, max_adc_width)
    lattice = [(p, wd) for p in probe_rungs for wd in width_rungs]

    cache_key = None
    if cache is not None:
        from confluent_kafka_vector_search_prompt_inference_spark.operators.calibration_cache import dataframe_fingerprint

        m_sub = codebooks.shape[0]
        cache_key = {
            "op": "ivfpq",
            "k": k,
            "sample_queries": sample_queries,
            "n_clusters": n_clusters,
            "m": int(m_sub),
            "max_adc_width": max_adc_width,
            "corpus": corpus_fingerprint or dataframe_fingerprint(encoded),
        }
        if query_fingerprint is not None:
            cache_key["queries"] = query_fingerprint
        cached = None if recalibrate else cache.lookup(cache_key)
        if cached is not None and all(f"{p}:{wd}" in cached for p, wd in lattice):
            curve = {(p, wd): cached[f"{p}:{wd}"] for p, wd in lattice}
            return _pick_ivfpq_rung(curve, lattice, recall_target)

    # deterministic sample (hash-ordered, mirrored by
    # query_sample_fingerprint) — a bare limit() drifts across sessions
    sample = (
        queries.select(F.col(query_id), F.col(query_vec))
        .orderBy(F.xxhash64(F.col(query_id), F.col(query_vec)), F.col(query_id))
        .limit(sample_queries)
        .localCheckpoint(eager=True)
    )
    exact = topk_similarity_join(
        sample, encoded.select(F.col(corpus_id), F.col(corpus_vec)), k,
        query_id=query_id, query_vec=query_vec,
        corpus_id=corpus_id, corpus_vec=corpus_vec,
        metric="dot", strategy="broadcast_queries",
    ).select(query_id, corpus_id).toPandas()
    if exact.empty:
        raise ValueError("cannot calibrate recall on an empty query sample")

    from confluent_kafka_vector_search_prompt_inference_spark.operators.topk_join import _collect_matrix

    q_ids, Q = _collect_matrix(sample, query_id, query_vec)
    cent = centroids.astype(np.float64)
    books = codebooks.astype(np.float64)
    m, _nk, sub = books.shape
    qdotc = Q.astype(np.float64) @ cent.T
    q_cent_d2 = (
        (Q.astype(np.float64) ** 2).sum(axis=1)[:, None]
        - 2.0 * qdotc
        + (cent**2).sum(axis=1)[None, :]
    )
    # rank_mat[qi, c] = 1-based rank of cluster c in query qi's
    # centroid-distance order — the prefix key every lattice rung prunes on
    order = np.argsort(q_cent_d2, axis=1, kind="stable")
    rank_mat = np.empty_like(order)
    np.put_along_axis(
        rank_mat, order, np.tile(np.arange(1, n_clusters + 1), (len(q_ids), 1)), axis=1
    )
    luts = np.stack(
        [Q.astype(np.float64)[:, j * sub : (j + 1) * sub] @ books[j].T for j in range(m)],
        axis=1,
    )
    spark = queries.sparkSession
    bc = spark.sparkContext.broadcast((q_ids, qdotc, rank_mat, luts))
    nq = len(q_ids)
    w_cap = max_adc_width

    out_schema = StructType(
        [
            StructField(query_id, sample.schema[query_id].dataType),
            StructField(corpus_id, encoded.schema[corpus_id].dataType),
            StructField("__crank", IntegerType()),
            StructField("__adc", DoubleType()),
        ]
    )

    def pool_pass(batches):
        qids, qc, ranks, lut = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            codes = np.asarray(list(pdf[code_col]), dtype=np.int64)
            clusters = pdf[cluster_col].to_numpy(dtype=np.int64)
            cids = pdf[corpus_id].to_numpy()
            scores = qc[:, clusters].copy()
            for j in range(m):
                scores += lut[:, j, codes[:, j]]
            frames = []
            for c in np.unique(clusters):
                rows = np.flatnonzero(clusters == c)
                sc = scores[:, rows]  # (nq, |rows in cluster c|)
                if len(rows) > w_cap:
                    top = np.argpartition(-sc, w_cap - 1, axis=1)[:, :w_cap]
                else:
                    top = np.tile(np.arange(len(rows)), (nq, 1))
                sel = rows[top]  # (nq, w) row indices into this batch
                kk = sel.shape[1]
                frames.append(
                    pd.DataFrame(
                        {
                            query_id: np.repeat(qids, kk),
                            corpus_id: cids[sel].ravel(),
                            "__crank": np.repeat(
                                ranks[:, c].astype(np.int32), kk
                            ),
                            "__adc": np.take_along_axis(sc, top, axis=1).ravel(),
                        }
                    )
                )
            if frames:
                yield pd.concat(frames, ignore_index=True)

    narrow = encoded.select(corpus_id, cluster_col, code_col)
    partial = narrow.mapInPandas(pool_pass, out_schema)
    # exact per-(query, cluster) top-w across partitions, then the bounded
    # pandas pull (≤ sample·n_clusters·max_adc_width rows)
    wqc = Window.partitionBy(query_id, "__crank").orderBy(
        F.desc("__adc"), F.asc(corpus_id)
    )
    pool = (
        partial.withColumn("__r", F.row_number().over(wqc))
        .filter(F.col("__r") <= w_cap)
        .drop("__r")
        .toPandas()
    )

    truth = {q: set(g[corpus_id]) for q, g in exact.groupby(query_id, sort=False)}
    possible = len(exact)
    curve: dict[tuple[int, int], float] = {}
    for p in probe_rungs:
        sub_pool = pool[pool["__crank"] <= p]
        sub_pool = sub_pool.sort_values(
            [query_id, "__adc", corpus_id], ascending=[True, False, True]
        )
        grouped = sub_pool.groupby(query_id, sort=False)
        for wd in width_rungs:
            short = grouped.head(wd)
            hits = sum(
                cid in truth.get(qid, ())
                for qid, cid in zip(short[query_id], short[corpus_id])
            )
            curve[(p, wd)] = hits / possible
    if cache is not None:
        cache.store(cache_key, {f"{p}:{wd}": r for (p, wd), r in curve.items()})
    return _pick_ivfpq_rung(curve, lattice, recall_target)


def _pick_ivfpq_rung(
    curve: dict[tuple[int, int], float],
    lattice: list[tuple[int, int]],
    recall_target: float,
) -> tuple[tuple[int, int], float]:
    for rung in lattice:  # probe-major: scan fraction dominates cost
        if curve[rung] >= recall_target:
            return rung, curve[rung]
    best = max(curve.values())
    raise ValueError(
        f"recall_target={recall_target} unreachable on this IVF-PQ index: "
        f"measured ceiling {best:.3f} at the deepest rung {lattice[-1]} "
        "(probe misses + ADC misranking). Raise max_adc_width, retrain "
        "with more codebook bits (m/k), or use the IVF tier whose deepest "
        "rung is the exact scan."
    )


def ivfpq_vacuum(
    spark: SparkSession, path: str, *, cluster_col: str = "ivf_cluster"
) -> int:
    """Physically rewrite the encoded corpus minus tombstones, preserving
    the cluster partitioning, and clear the tombstone set. Crash-safe —
    ``operators/_index_io.vacuum`` publishes ``corpus_tmp`` before the
    swap and ``load_ivfpq_index`` finishes an interrupted swap. Returns
    the number of tombstoned ids reclaimed."""
    from confluent_kafka_vector_search_prompt_inference_spark.operators._index_io import vacuum

    return vacuum(
        spark,
        path,
        lambda: load_ivfpq_index(spark, path)[0],  # already tombstone-filtered
        lambda df, tmp: df.repartition(F.col(cluster_col))
        .write.partitionBy(cluster_col)
        .mode("overwrite")
        .parquet(tmp),
    )


def ivfpq_split_oversized(
    spark: SparkSession,
    path: str,
    *,
    max_skew: float = 2.0,
    sample_rows: int = 4096,
    seed: int = 42,
    max_iter: int = 10,
    vec_col: str = "vector",
    code_col: str = "pq_codes",
    cluster_col: str = "ivf_cluster",
) -> list[int]:
    """Drift-triggered maintenance for the composed index — the IVF-PQ
    twin of :func:`~confluent_kafka_vector_search_prompt_inference_spark.operators.ivf.ivf_split_oversized`.

    Per cluster past ``max_skew``× the balanced share: 2-means on a hash
    sample of that cluster's RAW vectors (the saved corpus keeps them for
    exact rescoring, so no reconstruction error enters), then one Arrow
    pass re-assigns the cluster's rows between the two sub-centroids and
    re-encodes their residuals against the FROZEN codebooks
    (:func:`_assign_encode_udf` with the 2-row sub-centroid matrix).
    Residual codes must change when the centroid changes — ADC scores
    ``q·c + LUT(residual)`` — which is why a split here rewrites codes,
    not just directory membership. Codebooks stay frozen: residual
    distributions shrink after a split, so frozen books only get easier
    to hit (rebuild with :func:`build_ivfpq_index` remains the lever for
    codebook-quality drift).

    Commit/crash protocol, stats, and degenerate handling are shared
    with the IVF implementation (``recover_split`` replays from any
    crash point on every load; one cluster's rows rewritten, never the
    corpus). Returns the split cluster ids."""
    import json
    import shutil

    from confluent_kafka_vector_search_prompt_inference_spark.operators._kmeans import kmeans_fit

    split: list[int] = []
    unsplittable: set[int] = set()
    touched: set[int] = set()  # clusters whose dirs this pass rewrote/created
    # ONE corpus aggregation for the whole pass; counts then update
    # incrementally from each split's measured halves (see
    # ivf.ivf_split_oversized — same shape, same reasoning)
    corpus, centroids, codebooks = load_ivfpq_index(spark, path)
    counts = {
        int(r[cluster_col]): r["n"]
        for r in corpus.groupBy(cluster_col).agg(F.count("*").alias("n")).collect()
    }
    while True:
        n_clusters = len(centroids)
        total = sum(counts.values())
        if not total:
            return split
        balanced = total / n_clusters
        over = [
            (c, n)
            for c, n in counts.items()
            if n >= max_skew * balanced and n >= 2 and c not in unsplittable
        ]
        if not over:
            return split
        c = max(over, key=lambda t: t[1])[0]
        if c in touched:
            # an earlier split in this pass rewrote/created this cluster's
            # directory — re-list before filtering into it (untouched
            # clusters keep riding the original load's file index)
            corpus, centroids, codebooks = load_ivfpq_index(spark, path)
            touched.clear()
        rows_c = corpus.filter(F.col(cluster_col) == c)
        from confluent_kafka_vector_search_prompt_inference_spark.operators.ivf import _hash_bottom_sample

        X = _hash_bottom_sample(rows_c, vec_col, sample_rows)
        sub = kmeans_fit(X, 2, seed=seed, max_iter=max_iter)
        b = n_clusters
        reenc = _assign_encode_udf(sub, codebooks)
        halves = (
            rows_c.withColumn("__re", reenc(F.col(vec_col)))
            .withColumn("__half", F.col("__re").getField("cluster"))
            .withColumn(code_col, F.col("__re").getField("codes"))
            .drop("__re")
            .localCheckpoint(eager=True)  # assign+encode runs once
        )
        n_b = halves.filter(F.col("__half") == 1).count()
        if n_b == 0 or n_b == counts[c]:
            unsplittable.add(int(c))
            continue
        st = os.path.join(path, "split_tmp")
        shutil.rmtree(st, ignore_errors=True)
        os.makedirs(st)
        data_cols = [col for col in corpus.columns if col != cluster_col]
        halves.filter(F.col("__half") == 0).select(*data_cols).write.parquet(
            os.path.join(st, "newc")
        )
        halves.filter(F.col("__half") == 1).select(*data_cols).write.parquet(
            os.path.join(st, "newb")
        )
        new_cent = np.vstack([centroids, sub[1][None, :]])
        new_cent[c] = sub[0]
        cent_pdf = pd.DataFrame(
            {
                "cluster_id": [int(i) for i in range(len(new_cent))],
                "centroid": [[float(x) for x in row] for row in new_cent],
            }
        )
        spark.createDataFrame(
            cent_pdf, schema="cluster_id int, centroid array<double>"
        ).coalesce(1).write.mode("overwrite").parquet(os.path.join(st, "centroids"))
        with open(os.path.join(st, "plan.json"), "w") as fh:
            json.dump(
                {
                    "cluster": int(c),
                    "new_cluster": int(b),
                    "cluster_col": cluster_col,
                },
                fh,
            )
        with open(os.path.join(st, "_COMMIT"), "w"):
            pass
        from confluent_kafka_vector_search_prompt_inference_spark.operators.ivf import recover_split

        recover_split(path, cluster_col=cluster_col)
        split.append(int(c))
        centroids = new_cent
        counts[int(b)] = n_b
        counts[int(c)] = counts[int(c)] - n_b
        touched.update((int(c), int(b)))


def ivfpq_append(
    new_rows: DataFrame,
    path: str,
    *,
    vec_col: str = "vector",
    cluster_col: str = "ivf_cluster",
) -> None:
    """Incrementally add vectors to a saved IVF-PQ index WITHOUT
    retraining — the add-vs-train split both component indexes already
    honor (:func:`~confluent_kafka_vector_search_prompt_inference_spark.operators.ivf.ivf_append`,
    :func:`~confluent_kafka_vector_search_prompt_inference_spark.operators.pq.pq_append`): new vectors are assigned
    and residual-encoded in ONE Arrow pass against the frozen
    centroids/codebooks and appended into their cluster's partition
    directory, so probe-side partition pruning keeps holding. Frozen
    quantizers drift as the distribution moves — monitor per-cluster
    skew / code utilization and rebuild with :func:`build_ivfpq_index`,
    the same maintenance trade as FAISS.

    Analysis-time schema guard: ``mode('append')`` would happily land
    differently-shaped files and a later single-footer read would
    silently null them out — fail loudly here instead."""
    spark = new_rows.sparkSession
    _corpus, centroids, codebooks = load_ivfpq_index(spark, path)
    encoded = new_rows.withColumn(
        "__assigned", _assign_encode_udf(centroids, codebooks)(F.col(vec_col))
    )
    encoded = (
        encoded.withColumn(cluster_col, F.col("__assigned").getField("cluster"))
        .withColumn("pq_codes", F.col("__assigned").getField("codes"))
        .drop("__assigned")
    )
    existing = spark.read.parquet(os.path.join(path, "corpus")).schema
    got = {f.name: f.dataType for f in encoded.schema.fields}
    want = {f.name: f.dataType for f in existing.fields}
    if got != want:
        raise ValueError(
            f"ivfpq_append schema mismatch: index corpus has "
            f"{sorted((n, t.simpleString()) for n, t in want.items())}, "
            f"append would write "
            f"{sorted((n, t.simpleString()) for n, t in got.items())}"
        )
    encoded.select(*[f.name for f in existing.fields]).repartition(
        F.col(cluster_col)
    ).write.partitionBy(cluster_col).mode("append").parquet(
        os.path.join(path, "corpus")
    )
