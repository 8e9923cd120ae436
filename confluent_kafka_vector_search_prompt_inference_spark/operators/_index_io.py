"""Shared index-lifecycle plumbing for the persisted vector indexes
(IVF, PQ): id-tombstone deletes and crash-safe physical vacuum.

Deletes are tombstones, not rewrites (the LSM/Iceberg shape — at 100 TB a
delete batch must not rewrite the corpus): distinct ids land as parquet
under ``<path>/tombstones`` and every load anti-joins them out
(broadcast; the tombstone side is id-only and deletes-sized). Vacuum
rewrites the corpus minus tombstones under ``corpus_tmp`` FIRST, publishes
by rename, and clears tombstones last — a crash at any point either keeps
the old corpus+tombstones (still correct via the load-time anti-join) or
is finished by :func:`recover_vacuum` on the next load.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_tombstones(ids: DataFrame, path: str) -> None:
    """Append distinct ids to ``<path>/tombstones``. ``ids`` must be a
    one-column DataFrame whose column name matches a corpus column; the
    id type must match any existing tombstones."""
    if len(ids.columns) != 1:
        raise ValueError(f"ids must have exactly one column, got {ids.columns}")
    id_col = ids.columns[0]
    spark = ids.sparkSession
    corpus_fields = {
        f.name: f.dataType
        for f in spark.read.parquet(os.path.join(path, "corpus")).schema.fields
    }
    if id_col not in corpus_fields:
        raise ValueError(
            f"id column {id_col!r} not in index corpus columns "
            f"{sorted(corpus_fields)}"
        )
    tomb = os.path.join(path, "tombstones")
    if os.path.isdir(tomb):
        got = ids.schema.fields[0].dataType
        want = spark.read.parquet(tomb).schema.fields[0].dataType
        if got != want:
            raise ValueError(
                f"tombstone id type mismatch: existing {want.simpleString()}, "
                f"new {got.simpleString()}"
            )
    ids.select(id_col).distinct().coalesce(1).write.mode("append").parquet(tomb)


def apply_tombstones(spark: SparkSession, corpus: DataFrame, path: str) -> DataFrame:
    """Anti-join the tombstone set (if any) out of a loaded corpus."""
    tomb = os.path.join(path, "tombstones")
    if os.path.isdir(tomb):
        dead = spark.read.parquet(tomb)
        corpus = corpus.join(F.broadcast(dead), dead.columns[0], "left_anti")
    return corpus


def recover_vacuum(path: str) -> None:
    """Finish a vacuum that crashed between deleting the old corpus and
    publishing the new one: a complete ``corpus_tmp`` (_SUCCESS present)
    with no ``corpus`` is published; an incomplete one is garbage."""
    tmp = os.path.join(path, "corpus_tmp")
    corpus = os.path.join(path, "corpus")
    if not os.path.isdir(tmp):
        return
    if os.path.exists(os.path.join(tmp, "_SUCCESS")) and not os.path.isdir(corpus):
        os.rename(tmp, corpus)
        tomb = os.path.join(path, "tombstones")
        if os.path.isdir(tomb):
            shutil.rmtree(tomb)
    else:
        shutil.rmtree(tmp)


def vacuum(
    spark: SparkSession,
    path: str,
    load_corpus: Callable[[], DataFrame],
    write_corpus: Callable[[DataFrame, str], None],
) -> int:
    """Generic crash-safe vacuum: ``load_corpus()`` must return the
    already-tombstone-filtered corpus; ``write_corpus(df, tmp_path)``
    persists it (preserving whatever layout the index needs). Returns
    the number of tombstoned ids reclaimed."""
    recover_vacuum(path)
    tomb = os.path.join(path, "tombstones")
    if not os.path.isdir(tomb):
        return 0
    n = spark.read.parquet(tomb).distinct().count()
    corpus = load_corpus()
    tmp = os.path.join(path, "corpus_tmp")
    write_corpus(corpus, tmp)
    shutil.rmtree(os.path.join(path, "corpus"))
    os.rename(tmp, os.path.join(path, "corpus"))
    shutil.rmtree(tomb)
    return n
