"""As-of join: for each left row, the most recent right row at-or-before it.

Not in the reference (SURVEY.md §2.3 notes its absence); shipped because
time-series enrichment ("what was the last click before this purchase") is
a core capability of the extension surface. DuckDB/kdb call this ASOF JOIN;
Spark has no built-in.

Spark-first plan — the union-window trick, one shuffle total:

1. tag left rows (``__side=1``) and right rows (``__side=0``);
2. union by key/time columns (right payload nulled on left rows and vice
   versa);
3. one window ``partitionBy(key).orderBy(ts, __side)`` with
   ``last(payload, ignorenulls=True)`` over unbounded-preceding rows — each
   left row picks up the latest right payload at-or-before its timestamp
   (right sorts before left at equal ts, so exact-tie rows match);
4. keep left rows.

This is a single hash-partition shuffle on the key + a sort within
partitions — the same cost profile as any keyed window, no range join, no
per-key collect. Skewed keys are handled by AQE; a tolerance bound
(``within``) filters stale matches afterwards.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    ts: str,
    right_cols: list[str] | None = None,
    suffix: str = "_right",
    within: str | None = None,
) -> DataFrame:
    """Left as-of join: latest ``right`` row with ``right.ts <= left.ts``
    per ``on`` key. ``within`` (e.g. ``"1 hour"``) drops matches older than
    the tolerance; unmatched left rows keep NULL right columns."""
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, ts)]
    out_names = {c: f"{c}{suffix}" if c in left.columns else c for c in right_cols}

    l_tagged = left.select(
        *left.columns,
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(out_names[c]) for c in right_cols],
        F.lit(None).cast(right.schema[ts].dataType).alias("__rts"),
    )
    r_tagged = right.select(
        *[
            F.col(c).alias(out_names[c]) if c in right_cols else F.col(c)
            for c in right.columns
            if c in right_cols or c in (on, ts)
        ],
        F.lit(0).alias("__side"),
        F.col(ts).alias("__rts"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in (on, ts)],
    )
    unioned = l_tagged.unionByName(r_tagged)

    w = (
        Window.partitionBy(on)
        .orderBy(F.asc(ts), F.asc("__side"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carry = [F.last(out_names[c], ignorenulls=True).over(w).alias(out_names[c]) for c in right_cols]
    carry_ts = F.last("__rts", ignorenulls=True).over(w).alias("__rts_filled")
    result = (
        unioned.select(
            *[c for c in left.columns], "__side", carry_ts, *carry
        )
        .filter(F.col("__side") == 1)
        .drop("__side")
    )
    if within is not None:
        cond = F.col("__rts_filled") >= F.col(ts) - F.expr(f"INTERVAL {within}")
        result = result.select(
            *[c for c in left.columns],
            *[
                F.when(cond, F.col(out_names[c])).otherwise(F.lit(None)).alias(out_names[c])
                for c in right_cols
            ],
            F.when(cond, F.col("__rts_filled")).alias("__rts_filled"),
        )
    return result.withColumnRenamed("__rts_filled", f"{ts}{suffix}")
