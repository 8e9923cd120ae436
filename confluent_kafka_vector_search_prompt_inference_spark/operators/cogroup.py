"""Co-grouped pandas merge: per-key custom fusion of two DataFrames.

Completes the pandas API surface (SURVEY.md §2.10) next to scalar
``pandas_udf``, grouped-map ``applyInPandas``, and ``mapInPandas``: both
sides shuffle once on the key, and each key's two partitions arrive as two
pandas frames — the escape hatch for per-key logic a join can't express
(ordered interleaving, custom matching, windowed attribution).

Scale note: the unit of memory is the per-key pair of groups, so the same
skew rules as grouped-map apply — salt giant keys upstream.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import DoubleType, LongType, StructField, StructType


def conversion_lag_stats(
    clicks: DataFrame,
    purchases: DataFrame,
    *,
    key: str = "user_id",
    ts: str = "ts",
) -> DataFrame:
    """Per-user click→purchase attribution: for every purchase, the lag to
    the most recent prior click (first-touch within the user), reduced to
    per-user stats. The pandas body does an ordered ``merge_asof`` — the
    classic example of per-key logic that is painful as a join but three
    lines on two sorted frames."""
    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("n_purchases", LongType()),
            StructField("n_attributed", LongType()),
            StructField("mean_lag_s", DoubleType()),
        ]
    )

    def merge(c: pd.DataFrame, p: pd.DataFrame) -> pd.DataFrame:
        if p.empty:
            return pd.DataFrame(columns=[f.name for f in out_schema.fields]).astype(
                {"user_id": "int64", "n_purchases": "int64", "n_attributed": "int64"}
            )
        uid = int(p[key].iloc[0]) if not p.empty else int(c[key].iloc[0])
        p = p.sort_values(ts)
        if c.empty:
            lag = pd.Series([], dtype="float64")
        else:
            c = c.sort_values(ts)
            m = pd.merge_asof(
                p[[ts]], c[[ts]].rename(columns={ts: "click_ts"}),
                left_on=ts, right_on="click_ts", direction="backward",
            )
            lag = (m[ts] - m.click_ts).dt.total_seconds().dropna()
        return pd.DataFrame(
            {
                "user_id": [uid],
                "n_purchases": [len(p)],
                "n_attributed": [len(lag)],
                "mean_lag_s": [float(lag.mean()) if len(lag) else None],
            }
        )

    return clicks.groupBy(key).cogroup(purchases.groupBy(key)).applyInPandas(
        merge, out_schema
    )
