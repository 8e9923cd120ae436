"""Bucketed (pre-shuffled) tables: co-located joins with zero exchange.

At 100 TB the dominant cost of the fact⋈fact join (lineitem⋈orders in the
test schema; questions⋈corpus-partition in the RAG workload) is the
shuffle. Spark's native bucketing writes each table pre-hash-partitioned
on the join key; a join of two tables bucketed the same way needs NO
Exchange — the scan itself satisfies the distribution requirement
(asserted in tests/test_bucketed.py by plan inspection).

This costs one shuffle at WRITE time and pays it back on every subsequent
join/aggregation on the bucket key — the right trade for tables joined
repeatedly, which is exactly the star-schema fact tables and any corpus
keyed by cluster/bucket id (``operators/ivf.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    *,
    n_buckets: int = 16,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed managed table (Parquet).

    ``sort_cols`` additionally sorts within buckets — sort-merge joins on
    the key then skip their sort too."""
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def bucketed_join_ready(spark: SparkSession, left: str, right: str) -> bool:
    """True if both managed tables exist (helper for guarded plans)."""
    tables = {t.name for t in spark.catalog.listTables()}
    return left in tables and right in tables
