"""Vector column functions over ``ARRAY<FLOAT>`` / ``ARRAY<DOUBLE>`` columns.

The reference's only similarity metric is the dot product over 1536-dim
embedding arrays (MongoDB Atlas index ``similarity: dotProduct``, reference
``README.md:380``; dims ``README.md:170``). These helpers implement dot /
cosine / L2 with Catalyst higher-order functions (``zip_with`` +
``aggregate``) so the hot path stays JVM-side — no Python in the plan, the
expressions participate in whole-stage codegen, and filter/limit around them
still push down.

Accumulation is forced to DOUBLE regardless of the array element type: each
element is cast before multiply-add, so results are deterministic and
engine-portable (the DuckDB oracle computes the same IEEE sequence).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def vec_dot(a: Column | str, b: Column | str) -> Column:
    """Dot product, sequential double accumulation (left-to-right)."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def vec_l2norm(a: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(vec_dot(a, a))


def vec_cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; NULL-safe only insofar as inputs are non-empty."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    return vec_dot(a, b) / (vec_l2norm(a) * vec_l2norm(b))


def vec_l2_distance(a: Column | str, b: Column | str) -> Column:
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    diff = F.zip_with(_as_double(a), _as_double(b), lambda x, y: x - y)
    return F.sqrt(F.aggregate(diff, F.lit(0.0), lambda acc, x: acc + x * x))


def vec_normalize(a: Column | str) -> Column:
    """Unit-normalize (double elements). Zero vectors normalize to zeros."""
    a = F.col(a) if isinstance(a, str) else a
    norm = vec_l2norm(a)
    return F.when(norm == 0.0, _as_double(a)).otherwise(
        F.transform(_as_double(a), lambda x: x / norm)
    )
