"""Skew-aware join: explicit key salting for when AQE isn't enough.

AQE's skew-join splitting (on by default, ``session.py``) handles most
skew at runtime by splitting oversized shuffle partitions. Salting is the
complementary *plan-level* tool for pathological keys — a handful of keys
holding a double-digit percentage of the fact table (the classic "null
key" / "megacustomer" shapes):

- fact side: append a random salt in ``[0, salt)`` to each row's key;
- dim side: replicate each row ``salt`` times (explode), once per salt;
- join on (key, salt) — the hot key's rows now spread over ``salt``
  reducers instead of one.

Replication multiplies the build side by ``salt``, so salt only the keys
that need it: ``salted_join`` takes an optional hot-key list and salts
just those, joining the rest normally — the standard two-path plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    *,
    salt: int = 8,
    hot_keys: list | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join ``fact ⋈ dim`` on column ``on`` with salt-spread hot keys.

    ``hot_keys=None`` salts every key (fine when dim is small); otherwise
    only the listed keys are salted and the remainder joins directly, then
    the two paths union. Row-level results are identical to a plain join."""
    if hot_keys is None:
        return _salt_all(fact, dim, on, salt, how)
    hot = F.col(on).isin(*hot_keys)
    salted = _salt_all(fact.filter(hot), dim.filter(hot), on, salt, how)
    plain = fact.filter(~hot | F.col(on).isNull()).join(
        dim.filter(~hot | F.col(on).isNull()), on, how
    )
    return salted.unionByName(plain)


def _salt_all(fact: DataFrame, dim: DataFrame, on: str, salt: int, how: str) -> DataFrame:
    f = fact.withColumn("__salt", (F.rand(seed=42) * salt).cast("int"))
    d = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = f.join(d, [on, "__salt"], how)
    return out.drop("__salt")
