"""Data layout for scan-time skipping: clustered (range + sorted) writes.

Parquet readers (Spark, DuckDB, Trino, ...) skip whole row groups whose
min/max statistics exclude a filter — but only if the writer made those
statistics tight. Randomly-ordered data gives every row group the full
value range (nothing skips); range-partitioning by the cluster columns and
sorting within partitions gives near-disjoint row-group ranges, so a
point or range predicate touches O(selectivity) of the file bytes instead
of all of them. This is the single cheapest lever for interactive scans
over 100 TB fact tables and the moral equivalent of Delta/Iceberg
clustering, expressed with stock Spark writers.

``repartitionByRange`` samples the column to build balanced range bounds
(one shuffle); ``sortWithinPartitions`` is a partition-local sort feeding
the parquet writer in order, so each row group's span is a narrow slice.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame


def clustered_write(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    *,
    num_files: int | None = None,
    max_records_per_file: int | None = None,
) -> None:
    """Write ``df`` as parquet clustered on ``cluster_cols``."""
    if not cluster_cols:
        raise ValueError("cluster_cols must name at least one column")
    out = (
        df.repartitionByRange(num_files, *cluster_cols)
        if num_files
        else df.repartitionByRange(*cluster_cols)
    )
    writer = out.sortWithinPartitions(*cluster_cols).write.mode("overwrite")
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.parquet(path)


def row_group_ranges(path: str, column: str) -> list[tuple[object, object]]:
    """(min, max) statistics of ``column`` for every row group under
    ``path`` — the layout-quality probe used by tests and ops checks."""
    import pyarrow.parquet as pq

    ranges: list[tuple[object, object]] = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        ci = names[column]
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(ci).statistics
            ranges.append((st.min, st.max))
    return ranges


def clustering_overlap(ranges: list[tuple[object, object]]) -> float:
    """Mean row-group span as a fraction of the global span (1.0 = every
    group covers everything — no skipping possible; → 1/n_groups for a
    perfect layout)."""
    lo = min(r[0] for r in ranges)
    hi = max(r[1] for r in ranges)
    total = (hi - lo) or 1
    spans = [(r[1] - r[0]) / total for r in ranges]
    return sum(spans) / len(spans)


def zorder_value(x, y, *, x_min, x_max, y_min, y_max, bits: int = 16):
    """Morton (Z-order) key of two numeric columns: each value min-max
    normalizes to ``bits`` bits, then the bits interleave — so sorting by
    the single key keeps BOTH dimensions locally clustered. Pure integer
    Catalyst expressions (shifts + masks unrolled per bit), no UDF.

    Min/max normalization is the standard engineering trade (Delta's
    OPTIMIZE ZORDER does the same): heavy skew in a dimension wastes its
    bit budget — quantile-normalize upstream if a dimension is
    pathological."""
    from pyspark.sql import functions as F

    def norm(c, lo, hi):
        span = float(hi) - float(lo)
        if span <= 0:
            return F.lit(0).cast("bigint")
        scaled = (
            (c.cast("double") - F.lit(float(lo))) / F.lit(span) * F.lit(float(2**bits - 1))
        )
        return F.least(
            F.lit(2**bits - 1).cast("bigint"),
            F.greatest(F.lit(0).cast("bigint"), F.round(scaled).cast("bigint")),
        )

    xb, yb = norm(x, x_min, x_max), norm(y, y_min, y_max)
    z = F.lit(0).cast("bigint")
    for b in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(xb, b).bitwiseAND(F.lit(1)), 2 * b)
            + F.shiftleft(F.shiftright(yb, b).bitwiseAND(F.lit(1)), 2 * b + 1)
        )
    return z


def zorder_write(
    df: DataFrame,
    path: str,
    col_x: str,
    col_y: str,
    *,
    num_files: int | None = None,
    bits: int = 16,
) -> None:
    """Write parquet Z-ordered on two columns: range-partition + sort by
    the Morton key, so row-group min/max stats are tight in BOTH
    dimensions and a predicate on EITHER column skips most of the file
    bytes — single-column clustering gives this for one dimension and
    nothing for the other. One stats pass (min/max agg — metadata-cheap)
    + one range shuffle, the same cost shape as ``clustered_write``."""
    from pyspark.sql import functions as F

    stats = df.agg(
        F.min(col_x).alias("x_min"), F.max(col_x).alias("x_max"),
        F.min(col_y).alias("y_min"), F.max(col_y).alias("y_max"),
    ).first()
    z = zorder_value(
        df[col_x], df[col_y],
        x_min=stats.x_min, x_max=stats.x_max,
        y_min=stats.y_min, y_max=stats.y_max,
        bits=bits,
    )
    zdf = df.withColumn("__z", z)
    out = (
        zdf.repartitionByRange(num_files, "__z")
        if num_files
        else zdf.repartitionByRange("__z")
    )
    out.sortWithinPartitions("__z").drop("__z").write.mode("overwrite").parquet(path)


def zorder_value_n(cols, bounds, *, bits: int = 16):
    """N-column Morton key: each column min-max normalizes to ``bits``
    bits, then bits interleave round-robin (bit b of column j lands at
    position ``b * n + j``). ``bounds`` is [(min, max), ...] per column.
    Generalizes :func:`zorder_value` (the 2-column case) for layouts
    where three or more predicates need row-group locality; total key
    width is ``bits × n`` and must stay ≤ 63 for BIGINT (bits=16 → up to
    3 columns; drop to bits=12 for 5)."""
    from pyspark.sql import functions as F

    n = len(cols)
    if n * bits > 63:
        raise ValueError(f"{n} cols × {bits} bits exceeds a BIGINT key")

    def norm(c, lo, hi):
        span = float(hi) - float(lo)
        if span <= 0:
            return F.lit(0).cast("bigint")
        scaled = (
            (c.cast("double") - F.lit(float(lo))) / F.lit(span) * F.lit(float(2**bits - 1))
        )
        return F.least(
            F.lit(2**bits - 1).cast("bigint"),
            F.greatest(F.lit(0).cast("bigint"), F.round(scaled).cast("bigint")),
        )

    normed = [norm(c, lo, hi) for c, (lo, hi) in zip(cols, bounds)]
    z = F.lit(0).cast("bigint")
    for b in range(bits):
        for j, xb in enumerate(normed):
            z = z + F.shiftleft(
                F.shiftright(xb, b).bitwiseAND(F.lit(1)), b * n + j
            )
    return z


def zorder_write_n(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    *,
    num_files: int | None = None,
    bits: int | None = None,
) -> None:
    """N-column :func:`zorder_write` (one min/max stats pass, one range
    shuffle). ``bits`` defaults to the widest per-column budget that fits
    a BIGINT key."""
    from pyspark.sql import functions as F

    n = len(cluster_cols)
    if n < 2:
        raise ValueError("zorder needs >= 2 columns (use clustered_write for 1)")
    b = bits or (63 // n)
    aggs = []
    for c in cluster_cols:
        aggs += [F.min(c).alias(f"{c}__lo"), F.max(c).alias(f"{c}__hi")]
    st = df.agg(*aggs).first()
    z = zorder_value_n(
        [df[c] for c in cluster_cols],
        [(st[f"{c}__lo"], st[f"{c}__hi"]) for c in cluster_cols],
        bits=b,
    )
    zdf = df.withColumn("__z", z)
    out = (
        zdf.repartitionByRange(num_files, "__z")
        if num_files
        else zdf.repartitionByRange("__z")
    )
    out.sortWithinPartitions("__z").drop("__z").write.mode("overwrite").parquet(path)
