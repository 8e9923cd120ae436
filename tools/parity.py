"""Local mimic of the driver's correctness gate.

Runs every ``queries()`` entry at sf0.01 and compares against
``oracle_sql()`` via DuckDB: row count, column names, and order-insensitive
exact value equality (stricter than a hash — shows the first differing
cell). Queries without an oracle get a rows-only smoke run.

Usage: python tools/parity.py [name ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.01"
# Width of the driver's correctness-gate prefix: the driver hashes the
# FIRST this-many ``queries()`` entries each round. Shared with
# tests/test_parity_sample.py so the canary's tail slice tracks the real
# window if it ever changes.
DRIVER_WINDOW = 50
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v))
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main() -> int:
    import __spark_entry__ as entrymod
    args = sys.argv[1:]
    if "--vanilla" in args:
        # mimic the real driver even closer: a stock SparkSession without
        # any of our tuned configs (catches hidden config dependence)
        args.remove("--vanilla")
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.master("local[8]").getOrCreate()
    else:
        from confluent_kafka_vector_search_prompt_inference_spark import get_spark

        spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    only = set(args) - {a for a in args if a.startswith("--")}
    unknown = only - set(qs)
    if unknown:
        print(f"unknown query names: {sorted(unknown)}")
        return 2
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            spdf = sdf.toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only, {len(spdf)} rows ({time.time()-t0:.1f}s)")
            entrymod.release_persisted()
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: oracle error: {e}")
            continue
        a, b = normalize(spdf), normalize(odf)
        status = None
        if list(a.columns) != list(b.columns):
            status = f"columns differ: spark={list(a.columns)} oracle={list(b.columns)}"
        elif len(a) != len(b):
            status = f"rowcount differs: spark={len(a)} oracle={len(b)}"
        else:
            try:
                pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
            except AssertionError as e:
                status = f"values differ: {str(e)[:400]}"
        if status:
            failures.append(name)
            print(f"FAIL {name}: {status}")
        else:
            print(f"ok   {name}: {len(a)} rows exact-match ({time.time()-t0:.1f}s)")
        # leak discipline: no net-new persisted RDDs after the sweep —
        # every query runs cold, and cross-query cache luck can't mask a
        # perf regression
        entrymod.release_persisted()
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
