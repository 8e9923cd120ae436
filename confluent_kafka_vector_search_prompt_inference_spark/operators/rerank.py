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

from pyspark.sql import DataFrame
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
