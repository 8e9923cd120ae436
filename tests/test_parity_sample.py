"""Rotating oracle-parity sample: driver-window rotation insurance.

The driver's correctness gate hashes only the FIRST 50 ``queries()``
entries; positions 51+ are verified by ``tools/parity.py`` runs, which
happen between rounds, not in CI. This test closes that gap: every
pytest run re-verifies a pseudo-random 20-query sample drawn from the
entries OUTSIDE the driver window, rotated daily (seeded by the date),
so a parity regression in the long tail cannot hide until the next full
parity sweep. Full-suite equivalence still comes from
``tools/parity.py``; this is the canary, not the census.
"""

from __future__ import annotations

import datetime
import os
import random
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo/tools")

import __spark_entry__ as entry
from parity import DRIVER_WINDOW, SF_DIR, TABLES, normalize

SAMPLE_SIZE = 20


def _seed() -> int:
    """Date-rotated by default; pin via PARITY_SAMPLE_SEED to reproduce.

    A red canary must be re-runnable the next day: the parametrize ids
    embed the seed (``name@seed``), so copy the seed from the failing
    test id into ``PARITY_SAMPLE_SEED=<seed> pytest ...`` to replay the
    exact same 20-query sample byte-for-byte.
    """
    env = os.environ.get("PARITY_SAMPLE_SEED")
    if env:
        return int(env)
    return int(datetime.date.today().strftime("%Y%m%d"))


def _sample_names() -> list[str]:
    names = list(entry.queries())
    oracles = entry.oracle_sql()
    # the driver already hashes the first DRIVER_WINDOW entries every
    # round; sample the tail beyond its reach
    tail = [n for n in names[DRIVER_WINDOW:] if n in oracles]
    seed = _seed()
    picked = sorted(random.Random(seed).sample(tail, min(SAMPLE_SIZE, len(tail))))
    # seed travels in the test id so a failure names its own repro
    return [f"{n}@{seed}" for n in picked]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", _sample_names())
def test_parity_sample(spark, duck, name):
    name = name.rsplit("@", 1)[0]
    spdf = entry.queries()[name](spark, SF_DIR).toPandas()
    odf = duck.execute(entry.oracle_sql()[name]).df()
    entry.release_persisted()
    a, b = normalize(spdf), normalize(odf)
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b)
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
