"""Dataset sampling / splitting for training-data pipelines.

Not in the reference (SURVEY.md §2.11 — extension surface). Two primitives
a 100 TB curation pipeline needs:

- ``dataset_split`` — deterministic CONTENT-hash split (train/val/test).
  A row's split depends only on its key, never on partitioning, executor
  count, or visit order, so the same document lands in the same split
  across reruns, engines, and data relayouts — the property that matters
  when the corpus is re-sharded between runs. Pure Catalyst expressions
  (md5 → 32-bit bucket → range lookup): narrow, shuffle-free, codegen'd.
- ``stratified_sample`` — per-stratum Bernoulli sampling via ``sampleBy``
  (seeded, map-side, shuffle-free) for class-balancing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = 1_000_000


def hash_bucket(key: Column | str, buckets: int = _BUCKETS) -> Column:
    """Deterministic bucket in ``[0, buckets)`` from the md5 of the key.

    Engine-portable: the first 8 hex digits of md5 read as an integer give
    the identical bucket in any system with md5 (the DuckDB oracle uses
    ``('0x' || substring(md5(k),1,8))::UBIGINT % buckets``).
    """
    c = F.col(key) if isinstance(key, str) else key
    return (
        F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10)
        .cast("bigint") % F.lit(buckets)
    )


def dataset_split(
    df: DataFrame,
    key: str,
    weights: dict[str, float],
    split_col: str = "split",
    buckets: int = _BUCKETS,
) -> DataFrame:
    """Assign each row to a named split by content hash of ``key``.

    ``weights`` maps split name → fraction (must sum to ~1). Rows with
    equal keys always land in the same split (the desired behavior for
    dedup-aware splitting: duplicate documents can never straddle
    train/test and leak).
    """
    total = sum(weights.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split weights must sum to 1, got {total}")
    bucket = hash_bucket(key, buckets)
    expr: Column | None = None
    upper = 0.0
    names = list(weights)
    for name in names[:-1]:
        upper += weights[name]
        cond = bucket < int(upper * buckets)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    return df.withColumn(split_col, expr)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    seed: int = 42,
) -> DataFrame:
    """Per-stratum Bernoulli sample (class rebalancing). Map-side only —
    each partition filters locally with a seeded hash; no shuffle, no
    driver collect. Fractions are exact in expectation; for exact-count
    sampling, window-rank over ``rand(seed)`` per stratum instead."""
    return df.sampleBy(strata_col, fractions, seed=seed)
