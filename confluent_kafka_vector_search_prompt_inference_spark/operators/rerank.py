"""Diversified reranking — maximal marginal relevance (MMR) over per-query
candidate lists (SURVEY.md §2.11 similarity-search family; Carbonell &
Goldstein 1998).

MMR greedily re-orders a retrieved candidate list so each pick balances
relevance against redundancy with what was already picked:

    pick = argmax_c  λ·rel(c) − (1−λ)·max_{s∈selected} cos(c, s)

The greedy loop is inherently sequential *per query* but embarrassingly
parallel *across queries* — exactly the shape ``groupBy(query).applyInPandas``
distributes. Scale design: MMR always runs AFTER a top-N retrieval stage
(N in the hundreds), so each group is a few hundred rows regardless of
corpus size; the only shuffle is the group-by on query_id, and each group's
similarity matrix is an O(N²) numpy matmul on one executor core. Ties break
on ascending candidate id so output is deterministic at any parallelism.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def mmr_rerank(
    candidates: DataFrame,
    *,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rel_col: str = "score",
    vec_col: str = "vector",
    k: int = 10,
    lam: float = 0.7,
) -> DataFrame:
    """Rerank each query's candidates with MMR; returns
    ``(query_col, id_col, mmr_rank, mmr_score)`` with ranks 1..k.

    ``candidates`` must hold one row per (query, candidate) with the
    candidate's relevance score and embedding vector. ``lam=1`` degenerates
    to pure relevance order; ``lam=0`` to pure diversity.
    """
    out_fields = candidates.select(query_col, id_col).schema.fields
    schema = (
        f"{out_fields[0].name} {out_fields[0].dataType.simpleString()}, "
        f"{out_fields[1].name} {out_fields[1].dataType.simpleString()}, "
        "mmr_rank int, mmr_score double"
    )

    def _mmr(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        rel = pdf[rel_col].to_numpy(dtype=np.float64)
        vecs = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
        norms = np.linalg.norm(vecs, axis=1)
        norms[norms == 0.0] = 1.0
        unit = vecs / norms[:, None]
        sim = unit @ unit.T
        n = len(pdf)
        kk = min(k, n)
        selected: list[int] = []
        remaining = np.ones(n, dtype=bool)
        scores = np.empty(n, dtype=np.float64)
        for _ in range(kk):
            if selected:
                redundancy = sim[:, selected].max(axis=1)
            else:
                redundancy = np.zeros(n)
            mmr = lam * rel - (1.0 - lam) * redundancy
            mmr[~remaining] = -np.inf
            # np.argmax takes the first (lowest-index) maximum; rows are
            # pre-sorted by candidate id, so ties break on ascending id
            pick = int(np.argmax(mmr))
            scores[pick] = mmr[pick]
            selected.append(pick)
            remaining[pick] = False
        return pd.DataFrame(
            {
                query_col: pdf[query_col].iloc[selected].to_numpy(),
                id_col: pdf[id_col].iloc[selected].to_numpy(),
                "mmr_rank": np.arange(1, kk + 1, dtype=np.int32),
                "mmr_score": np.round(scores[selected], 6),
            }
        )

    return candidates.groupBy(query_col).applyInPandas(_mmr, schema=schema)


def lexical_cross_encoder():
    """Deterministic stand-in for a neural cross-encoder: an Arrow-batched
    ``pandas_udf`` over the (query_text, doc_text) PAIR — the defining
    property of the cross-encoder tier: the score is a function of the
    pair jointly, never of two independently-produced embeddings.

    Score = Jaccard overlap of the distinct normalized word sets,
    rounded to 6 — engine-portable closed form, so the whole rerank
    oracles exactly in SQL. Swapping in a real model (e.g. a MiniLM
    cross-encoder) replaces only this UDF; the batched pair-scoring
    plumbing is identical."""
    import re

    from pyspark.sql.types import DoubleType

    def _toks(s: str) -> set:
        # mirrors the engine's _SQL_WORDS normalization exactly:
        # lower → collapse whitespace → trim → split on single space
        return set(re.sub(r"\s+", " ", (s or "").lower()).strip().split(" "))

    @F.pandas_udf(DoubleType())
    def score(q: pd.Series, d: pd.Series) -> pd.Series:
        out = np.empty(len(q))
        for i, (a, b) in enumerate(zip(q, d)):
            ta, tb = _toks(a), _toks(b)
            union = len(ta | tb)
            out[i] = round(len(ta & tb) / union, 6) if union else 0.0
        return pd.Series(out)

    return score


def cross_encoder_rerank(
    candidates: DataFrame,
    queries: DataFrame,
    corpus: DataFrame,
    *,
    query_id: str = "query_id",
    doc_id: str = "doc_id",
    query_text: str = "query_text",
    doc_text: str = "text",
    k: int = 5,
    scorer=None,
    score_col: str = "ce_score",
    rank_col: str = "ce_rank",
) -> DataFrame:
    """Final tier of the retrieval-quality ladder (single-vector → MaxSim
    → cross-encoder): re-score a first-stage top-N candidate list with a
    pair scorer and keep the top-k per query.

    Scale shape: ``candidates`` is already k-bounded per query (queries ×
    N rows total, corpus-size-independent), so the candidate list plus
    query texts BROADCAST into one pass over the corpus to attach doc
    text — the corpus never shuffles, exactly like the broadcast top-k
    join. The expensive model call runs on queries × N pairs only, which
    is the entire economic point of a cross-encoder as a *re*-ranker.
    Ties break on ascending doc id, deterministic at any parallelism."""
    scorer = scorer or lexical_cross_encoder()
    cand = candidates.select(query_id, doc_id).join(
        queries.select(query_id, query_text), query_id
    )
    paired = corpus.select(F.col(doc_id), F.col(doc_text).alias("__dtext")).join(
        F.broadcast(cand), doc_id
    )
    scored = paired.select(
        query_id, doc_id, scorer(F.col(query_text), F.col("__dtext")).alias(score_col)
    )
    w = Window.partitionBy(query_id).orderBy(F.desc(score_col), F.asc(doc_id))
    return (
        scored.withColumn(rank_col, F.row_number().over(w).cast("int"))
        .filter(F.col(rank_col) <= k)
    )
