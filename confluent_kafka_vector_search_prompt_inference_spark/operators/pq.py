"""Product quantization (PQ): codebook compression for vector corpora.

The memory lever beyond int8 (``functions/vector.py``): split each d-dim
vector into ``m`` subvectors, k-means each subspace into 256 centroids,
and store a vector as ``m`` uint8 codes — d×4 bytes becomes m bytes
(e.g. 64-dim float32 → 8 bytes at m=8, 32×). Search uses asymmetric
distance computation (ADC): per query, a tiny (m × 256) lookup table of
query-subvector · centroid dot products; a corpus row's approximate score
is the sum of m table lookups — no float math per row at scan time.

Spark shape, sized for 100 TB:
- Training samples the corpus (codebooks need thousands of rows, not
  billions) and runs m independent Spark ML KMeans fits.
- Encoding is one Arrow-batched pandas pass: vectorized argmin against
  the (m, 256, d/m) codebook tensor, broadcast via closure.
- Search broadcasts only the (m, 256) LUT per query batch; scoring is a
  NumPy gather-and-sum over the code matrix inside ``mapInPandas`` —
  the same partition-parallel pattern as the broadcast top-k join.
- Like IVF, the index persists as plain columns (``pq_codes
  ARRAY<SMALLINT>``) next to the data, so any engine can store it.

Approximate by construction (quantization error) — verified by recall
tests against the exact scorer, not a SQL oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    ShortType,
    StructField,
    StructType,
)


def train_pq_codebooks(
    corpus: DataFrame,
    vec_col: str = "vector",
    *,
    m: int = 8,
    k: int = 256,
    sample_rows: int = 10_000,
    seed: int = 42,
    max_iter: int = 10,
) -> np.ndarray:
    """Train ``(m, k, d/m)`` codebooks from a corpus sample.

    Codebooks train DRIVER-SIDE on a sample, deliberately: PQ codebooks
    need thousands of representative rows, not the corpus — sampling to
    the driver and running m tiny seeded Lloyd's iterations in NumPy is
    milliseconds, where distributing m k-means jobs pays Spark job
    overhead ×m for no quality gain. (This mirrors how IVF/PQ indexes
    are trained in production vector stores.) Small corpora shrink k to
    the sample size so every centroid is occupied.

    The sample is the ``sample_rows`` vectors with the smallest content
    hash (``orderBy(xxhash64(vec)).limit(n)`` — per-partition top-n
    heaps, one scan). A bare ``limit`` would take the first file's
    prefix: at scale that is one partition's potentially time- or
    key-correlated rows, silently degrading ADC recall corpus-wide.
    Bottom-n-by-hash is uniform in content and *order-invariant* — the
    same corpus in any physical row order trains identical codebooks."""
    from confluent_kafka_vector_search_prompt_inference_spark.operators.ivf import _hash_bottom_sample

    X = _hash_bottom_sample(corpus, vec_col, sample_rows)
    n, d = X.shape
    if d % m != 0:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub = d // m
    k = min(k, n)
    rng = np.random.RandomState(seed)

    def _kmeanspp_init(seg: np.ndarray) -> np.ndarray:
        # k-means++ D² seeding — matches distributed k-means|| quality on
        # sample-sized inputs and keeps codebooks deterministic per seed.
        cent = np.empty((k, seg.shape[1]))
        cent[0] = seg[rng.randint(len(seg))]
        d2 = ((seg - cent[0]) ** 2).sum(axis=1)
        for c in range(1, k):
            probs = d2 / d2.sum() if d2.sum() > 0 else None
            idx = rng.choice(len(seg), p=probs)
            cent[c] = seg[idx]
            d2 = np.minimum(d2, ((seg - cent[c]) ** 2).sum(axis=1))
        return cent

    books = np.empty((m, k, sub))
    for j in range(m):
        seg = X[:, j * sub : (j + 1) * sub]
        cent = _kmeanspp_init(seg)
        for _ in range(max_iter):
            d2 = (
                (seg**2).sum(axis=1)[:, None]
                - 2.0 * seg @ cent.T
                + (cent**2).sum(axis=1)[None, :]
            )
            assign = d2.argmin(axis=1)
            for c in range(k):
                members = seg[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
                else:  # re-seed empty clusters from a random point
                    cent[c] = seg[rng.randint(n)]
        books[j] = cent
    return books


def pq_encode(corpus: DataFrame, codebooks: np.ndarray, vec_col: str = "vector") -> DataFrame:
    """Append ``pq_codes ARRAY<SMALLINT>`` (m entries in [0, k))."""
    books = codebooks.astype(np.float64)
    m, k, sub = books.shape

    @F.pandas_udf(ArrayType(ShortType()))
    def encode(vs: pd.Series) -> pd.Series:
        X = np.asarray([np.asarray(v, dtype=np.float64) for v in vs])
        codes = np.empty((len(X), m), dtype=np.int16)
        for j in range(m):
            seg = X[:, j * sub : (j + 1) * sub]
            # (n, k) squared distances via ||x||² - 2x·c + ||c||²
            d2 = (
                (seg**2).sum(axis=1)[:, None]
                - 2.0 * seg @ books[j].T
                + (books[j] ** 2).sum(axis=1)[None, :]
            )
            codes[:, j] = d2.argmin(axis=1)
        return pd.Series(list(codes))

    return corpus.withColumn("pq_codes", encode(F.col(vec_col)))


def topk_pq(
    queries: DataFrame,
    encoded_corpus: DataFrame,
    codebooks: np.ndarray,
    k: int = 10,
    *,
    query_id: str,
    query_vec: str = "vector",
    corpus_id: str,
    code_col: str = "pq_codes",
    score_col: str = "score",
    rank_col: str = "rank",
) -> DataFrame:
    """Approximate dot-product top-k by ADC over PQ codes.

    The query block is *broadcast* (ids + float matrix, once per executor —
    not a per-task closure, not a driver-side LUT tensor); each corpus
    partition builds the (nq, m, 256) LUTs locally and emits a per-partition
    **partial top-k** (≤ k rows per query per partition). Only k·P candidate
    rows per query ever shuffle into the final ranking window — the same
    shape as ``_topk_numpy_broadcast``'s broadcast-queries mode, so corpus
    scale drops out of the shuffle entirely. Exact rescoring of the
    short-list (see the quantized-rescore pattern) recovers full precision
    when needed."""
    from confluent_kafka_vector_search_prompt_inference_spark.operators.topk_join import (
        _collect_matrix,
        _rowwise_topk,
    )

    books = codebooks.astype(np.float64)
    m, _nk, sub = books.shape
    spark = queries.sparkSession
    q_ids, Q = _collect_matrix(queries, query_id, query_vec)
    bc = spark.sparkContext.broadcast((q_ids, Q))

    out_schema = StructType(
        [
            StructField(query_id, queries.schema[query_id].dataType),
            StructField(corpus_id, encoded_corpus.schema[corpus_id].dataType),
            StructField(score_col, DoubleType()),
        ]
    )

    def score(batches):
        qids, Qm = bc.value
        if Qm.size == 0:
            return
        # (nq, m, k) lookup tables: query subvector · centroid — built once
        # per partition task from the broadcast matrix.
        luts = np.stack(
            [Qm.astype(np.float64)[:, j * sub : (j + 1) * sub] @ books[j].T for j in range(m)],
            axis=1,
        )
        for pdf in batches:
            if pdf.empty:
                continue
            codes = np.asarray(list(pdf[code_col]), dtype=np.int64)  # (n, m)
            cids = pdf[corpus_id].to_numpy()
            scores = np.zeros((len(qids), len(pdf)))  # (nq, n)
            for j in range(m):
                scores += luts[:, j, codes[:, j]]
            idx, top = _rowwise_topk(scores, cids, k)
            kk = idx.shape[1]
            yield pd.DataFrame(
                {
                    query_id: np.repeat(qids, kk),
                    corpus_id: cids[idx].ravel(),
                    score_col: top.ravel(),
                }
            )

    partial = encoded_corpus.select(corpus_id, code_col).mapInPandas(score, out_schema)
    w = Window.partitionBy(query_id).orderBy(F.desc(score_col), F.asc(corpus_id))
    return (
        partial.withColumn(rank_col, F.row_number().over(w).cast("int"))
        .filter(F.col(rank_col) <= k)
        .select(query_id, corpus_id, F.round(score_col, 6).alias(score_col), rank_col)
    )


def save_pq_index(
    encoded_corpus: DataFrame,
    codebooks: np.ndarray,
    path: str,
) -> None:
    """Persist the PQ index: the encoded corpus (codes travel as plain
    ``ARRAY<SMALLINT>`` columns next to the data) plus the codebook tensor
    flattened to a (segment, code, centroid) table. Encoding happens once;
    every later search ships only the m×256 codebooks back to the driver
    — same operating mode as the IVF index (encode once, search many),
    which is what makes PQ viable as an *index* at 100 TB rather than a
    per-job recompute."""
    import os

    spark = encoded_corpus.sparkSession
    encoded_corpus.write.mode("overwrite").parquet(os.path.join(path, "corpus"))
    m, k, sub = codebooks.shape
    # pandas + explicit schema → Arrow path (a list-of-rows createDataFrame
    # pickles through the Python RDD path: ~4s of worker round-trips for a
    # metadata-sized table)
    pdf = pd.DataFrame(
        {
            "segment": [int(j) for j in range(m) for _ in range(k)],
            "code": [int(c) for _ in range(m) for c in range(k)],
            "centroid": [
                [float(x) for x in codebooks[j, c]]
                for j in range(m)
                for c in range(k)
            ],
        }
    )
    spark.createDataFrame(
        pdf, schema="segment int, code int, centroid array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(path, "codebooks"))


def pq_append(new_rows: DataFrame, path: str, *, vec_col: str = "vector") -> None:
    """Incrementally add vectors to a saved PQ index WITHOUT retraining.

    New vectors are encoded with the FROZEN codebooks (one Arrow pass)
    and appended to the corpus parquet; search code is untouched — the
    same add-vs-train split as :func:`~confluent_kafka_vector_search_prompt_inference_spark.operators.
    ivf.ivf_append`, matching the reference's continuously-inserted,
    always-indexed corpus. Quantization error can grow as the data
    distribution drifts from the training sample; rebuild codebooks with
    :func:`train_pq_codebooks` when ADC recall degrades."""
    import os

    spark = new_rows.sparkSession
    rows = (
        spark.read.parquet(os.path.join(path, "codebooks"))
        .orderBy("segment", "code")
        .collect()
    )
    m = max(r.segment for r in rows) + 1
    k = max(r.code for r in rows) + 1
    sub = len(rows[0].centroid)
    books = np.empty((m, k, sub))
    for r in rows:
        books[r.segment, r.code] = np.asarray(r.centroid, dtype=np.float64)
    encoded = pq_encode(new_rows, books, vec_col=vec_col)
    # analysis-time schema check — see ivf_append: a silent append of a
    # different shape corrupts later plain (non-mergeSchema) reads
    existing = spark.read.parquet(os.path.join(path, "corpus")).schema
    got = {f.name: f.dataType for f in encoded.schema.fields}
    want = {f.name: f.dataType for f in existing.fields}
    if got != want:
        raise ValueError(
            f"pq_append schema mismatch: index corpus has "
            f"{sorted((n, t.simpleString()) for n, t in want.items())}, "
            f"append would write "
            f"{sorted((n, t.simpleString()) for n, t in got.items())}"
        )
    encoded.select(*[f.name for f in existing.fields]).write.mode("append").parquet(
        os.path.join(path, "corpus")
    )


def pq_delete(ids: DataFrame, path: str) -> None:
    """Delete vectors from a saved PQ index by id — same tombstone
    contract as :func:`~confluent_kafka_vector_search_prompt_inference_spark.operators.ivf.ivf_delete`
    (``operators/_index_io.py``): ids land under ``<path>/tombstones``,
    :func:`load_pq_index` anti-joins them out immediately,
    :func:`pq_vacuum` reclaims physically."""
    from confluent_kafka_vector_search_prompt_inference_spark.operators._index_io import write_tombstones

    write_tombstones(ids, path)


def pq_vacuum(spark, path: str) -> int:
    """Physically rewrite the encoded corpus minus tombstones and clear
    the tombstone set; crash-safe (``operators/_index_io.vacuum``).
    Returns the number of tombstoned ids reclaimed."""
    from confluent_kafka_vector_search_prompt_inference_spark.operators._index_io import vacuum

    return vacuum(
        spark,
        path,
        lambda: load_pq_index(spark, path)[0],
        lambda df, tmp: df.write.mode("overwrite").parquet(tmp),
    )


def pq_index_stats(spark, path: str) -> DataFrame:
    """Per-segment codebook utilization of a saved PQ index: distinct
    codes in use (of k=256) and the Shannon entropy of the code
    distribution in bits — the drift signal the frozen-codebook
    append lifecycle needs (entropy well below log2(codes_used) or
    utilization collapsing toward a few codes means the data has moved
    off the training sample: rebuild with train_pq_codebooks). One
    explode + one (segment, code) aggregation over SMALLINT codes."""
    from pyspark.sql import functions as F

    corpus, books = load_pq_index(spark, path)
    m = books.shape[0]
    codes = corpus.select(F.posexplode("pq_codes").alias("segment", "code"))
    dist = codes.groupBy("segment", "code").agg(F.count("*").alias("n"))
    tot = dist.groupBy("segment").agg(F.sum("n").alias("tot"))
    ent = (
        dist.join(tot, "segment")
        .withColumn("p", F.col("n") / F.col("tot"))
        .groupBy("segment")
        .agg(
            F.count("*").alias("codes_used"),
            F.round(-F.sum(F.col("p") * F.log2("p")), 4).alias("entropy_bits"),
        )
    )
    return ent.withColumn("codes_total", F.lit(int(books.shape[1])))


def load_pq_index(spark, path: str) -> tuple[DataFrame, np.ndarray]:
    """(encoded corpus DataFrame, (m, k, d/m) codebook tensor) from disk.
    Tombstoned ids (:func:`pq_delete`) are anti-joined out."""
    import os

    from confluent_kafka_vector_search_prompt_inference_spark.operators._index_io import (
        apply_tombstones,
        recover_vacuum,
    )

    recover_vacuum(path)
    corpus = apply_tombstones(
        spark, spark.read.parquet(os.path.join(path, "corpus")), path
    )
    rows = (
        spark.read.parquet(os.path.join(path, "codebooks"))
        .orderBy("segment", "code")
        .collect()
    )
    m = max(r.segment for r in rows) + 1
    k = max(r.code for r in rows) + 1
    sub = len(rows[0].centroid)
    books = np.empty((m, k, sub))
    for r in rows:
        books[r.segment, r.code] = np.asarray(r.centroid, dtype=np.float64)
    return corpus, books
