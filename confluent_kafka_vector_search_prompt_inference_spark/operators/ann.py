"""Approximate nearest neighbor via sign-random-projection (SRP) LSH.

The reference's vector index is MongoDB Atlas' ANN with a ``numCandidates``
probe-pool knob (reference ``README.md:355-368``). The Spark-native analog:
hash every vector into ``bands`` bucket ids (each from ``rows_per_band``
hyperplane sign bits), join queries to corpus *within buckets only*, rescore
the survivors exactly, and take top-k. Two vectors collide in a band with
probability ``((1 - θ/π)) ** rows_per_band``, so bands×rows trade recall for
candidate count — ``num_candidates`` caps the rescored pool per query,
mirroring the reference's semantics (cap 10,000, ``README.md:368``).

Signatures are computed in one Arrow-batched pandas UDF (a single NumPy
matmul per batch); bucketing, the bucket join, and exact rescoring are all
JVM-side DataFrame ops, so the plan scales like any hash join: corpus and
queries shuffle once on (band, bucket) — no all-pairs work anywhere.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

from confluent_kafka_vector_search_prompt_inference_spark.functions.vector import vec_dot, vec_cosine

DEFAULT_SEED = 42


def _plane_matrix(dim: int, bands: int, rows_per_band: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((bands * rows_per_band, dim)).astype(np.float32)


def srp_band_hashes(
    df: DataFrame,
    vec_col: str,
    *,
    dim: int,
    bands: int = 16,
    rows_per_band: int = 4,
    seed: int = DEFAULT_SEED,
    out_col: str = "band_hashes",
) -> DataFrame:
    """Append ``out_col: ARRAY<BIGINT>`` — one bucket id per band.

    Bucket id packs (band index, sign bits) so ids never collide across
    bands; both sides of a later join must use identical (dim, bands,
    rows_per_band, seed)."""
    planes = _plane_matrix(dim, bands, rows_per_band, seed)
    weights = (1 << np.arange(rows_per_band, dtype=np.int64))

    @F.pandas_udf(ArrayType(LongType()))
    def _hashes(vs: pd.Series) -> pd.Series:
        M = np.asarray([np.asarray(v, dtype=np.float32) for v in vs])
        bits = (M @ planes.T) > 0  # (n, bands*rows)
        out = []
        for row in bits:
            words = row.reshape(bands, rows_per_band) @ weights  # (bands,)
            out.append([int(b * (1 << rows_per_band) + w) for b, w in enumerate(words)])
        return pd.Series(out)

    return df.withColumn(out_col, _hashes(F.col(vec_col)))


def lsh_probe_candidates(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    query_id: str,
    query_vec: str,
    corpus_id: str,
    corpus_vec: str,
    num_candidates: int,
    bands: int = 16,
    rows_per_band: int = 4,
    seed: int = DEFAULT_SEED,
    probe_col: str = "__probe",
) -> DataFrame:
    """The LSH candidate pool: ``(query_id, corpus_id, probe_col)`` with
    ``probe_col`` = 1..num_candidates ranked by most matching bands first,
    corpus id ascending. Monotone by construction — the pool at width w is
    a strict prefix of the pool at width W > w — which is what lets recall
    calibration (``topk_join.calibrate_recall_depth``) evaluate every probe
    width from one pass at the widest."""
    dim_row = corpus.select(F.size(corpus_vec).alias("d")).first()
    dim = int(dim_row["d"])
    # The bucket join moves ONLY (id, bucket): exploding bands× before a
    # shuffle must not multiply vector bytes. Vectors are re-attached to the
    # surviving candidate pairs afterwards by id (narrow hash joins).
    q = srp_band_hashes(
        queries.select(F.col(query_id), F.col(query_vec).alias("__qv")), "__qv",
        dim=dim, bands=bands, rows_per_band=rows_per_band, seed=seed,
    ).select(query_id, F.explode("band_hashes").alias("__bucket"))
    c = srp_band_hashes(
        corpus.select(F.col(corpus_id), F.col(corpus_vec).alias("__cv")), "__cv",
        dim=dim, bands=bands, rows_per_band=rows_per_band, seed=seed,
    ).select(corpus_id, F.explode("band_hashes").alias("__bucket"))

    matches = (
        q.join(c, on="__bucket")
        .groupBy(query_id, corpus_id)
        .agg(F.count("*").alias("__nbands"))
    )
    probe = Window.partitionBy(query_id).orderBy(F.desc("__nbands"), F.asc(corpus_id))
    return (
        matches.withColumn(probe_col, F.row_number().over(probe))
        .filter(F.col(probe_col) <= num_candidates)
        .select(query_id, corpus_id, probe_col)
    )


def topk_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    *,
    query_id: str,
    query_vec: str,
    corpus_id: str,
    corpus_vec: str,
    metric: str = "dot",
    num_candidates: int = 20,
    bands: int = 16,
    rows_per_band: int = 4,
    seed: int = DEFAULT_SEED,
    score_col: str = "score",
    rank_col: str = "rank",
) -> DataFrame:
    """Bucketed approximate top-k (see module docstring).

    Candidate pool per query = up to ``num_candidates`` corpus rows, chosen
    by most matching bands first (better LSH agreement ⇒ more likely a true
    neighbor), then rescored exactly with the JVM dot/cosine expression.
    """
    candidates = (
        lsh_probe_candidates(
            queries, corpus,
            query_id=query_id, query_vec=query_vec,
            corpus_id=corpus_id, corpus_vec=corpus_vec,
            num_candidates=num_candidates,
            bands=bands, rows_per_band=rows_per_band, seed=seed,
        )
        .join(queries.select(F.col(query_id), F.col(query_vec).alias("__qv")), query_id)
        .join(corpus.select(F.col(corpus_id), F.col(corpus_vec).alias("__cv")), corpus_id)
    )
    score = vec_dot(F.col("__qv"), F.col("__cv")) if metric == "dot" else vec_cosine(
        F.col("__qv"), F.col("__cv")
    )
    rescored = candidates.select(query_id, corpus_id, F.round(score, 6).alias(score_col))
    w = Window.partitionBy(query_id).orderBy(F.desc(score_col), F.asc(corpus_id))
    return rescored.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)
