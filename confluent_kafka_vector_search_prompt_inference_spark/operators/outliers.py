"""Per-group embedding outlier scoring via grouped-map ``applyInPandas``.

The batch grouped-map surface (SURVEY.md §2.10 — shipped alongside the
scalar/agg pandas UDFs): each label's vectors arrive as ONE pandas frame,
get reduced with vectorized NumPy, and leave as a per-row score. This is
the template for any per-group computation Spark's built-ins can't
express — the group is the unit of distribution, so skewed labels are the
scaling hazard (mitigate by pre-splitting giant groups on a salt and
merging their centroids weighted by count).

Semantics: for every vector, its cosine-space L2 distance to its label's
centroid, plus the group z-score of that distance — the cheap per-cluster
outlier filter for embedding-table hygiene (mislabeled rows, collapsed
embeddings).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    LongType,
    IntegerType,
    StructField,
    StructType,
)


def label_centroid_outliers(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """``(vec_id, label, dist, z)`` per input row, grouped by label.

    ``dist`` is the L2 distance to the group's mean vector; ``z`` is
    ``(dist - mean_dist) / std_dist`` within the group (0 when the group
    is degenerate). Arrow moves each group as columnar batches; the NumPy
    reduction is vectorized over the whole group at once.
    """
    out_schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("label", IntegerType()),
            StructField("dist", DoubleType()),
            StructField("z", DoubleType()),
        ]
    )

    def score(pdf: pd.DataFrame) -> pd.DataFrame:
        mat = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
        centroid = mat.mean(axis=0)
        dist = np.sqrt(((mat - centroid) ** 2).sum(axis=1))
        std = dist.std()
        z = (dist - dist.mean()) / std if std > 0 else np.zeros_like(dist)
        return pd.DataFrame(
            {
                "vec_id": pdf[id_col].to_numpy(),
                "label": pdf[label_col].to_numpy(),
                "dist": dist,
                "z": z,
            }
        )

    return emb.groupBy(label_col).applyInPandas(score, out_schema)
