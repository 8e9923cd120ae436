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

    rows = (
        corpus.select(vec_col)
        .orderBy(F.xxhash64(F.col(vec_col)))
        .limit(sample_rows)
        .collect()
    )
    X = np.asarray([np.asarray(r[0], dtype=np.float64) for r in rows])
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
        rows = (
            rows_c.select(vec_col)
            .orderBy(F.xxhash64(F.col(vec_col)))
            .limit(sample_rows)
            .collect()
        )
        X = np.asarray([np.asarray(r[0], dtype=np.float64) for r in rows])
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
