"""Table catalog: name → DataFrame over Parquet (or any path-based format).

Mirrors the reference's model where "tables" are late-bound named datasets
(Kafka topics with schema-registry contracts, reference ``README.md:223-252``,
or external MongoDB collections, ``README.md:334-346``). Here a catalog maps
logical table names to storage paths; schemas are read from Parquet footers
(self-describing) or supplied explicitly for schemaless JSON, reproducing the
"data contract attached after the fact" flow (``README.md:225-252``).

Sink writes are schema-checked at analysis time before any data moves,
reproducing the reference's analysis-time sink validation — a mismatched
INSERT fails before running (``README.md:586-594``).
"""

from __future__ import annotations

import contextlib
import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


class SinkSchemaMismatch(ValueError):
    """Raised before execution when an insert does not match the sink schema.

    Reference behavior: Flink fails the statement at analysis time with
    "Column types of query result and sink ... do not match"
    (``README.md:586-594``)."""


@dataclass
class VectorIndex:
    """Vector-index metadata on a corpus table — the engine-level analog of
    the reference's external-table index options (``mongodb.index``,
    ``mongodb.path``, ``mongodb.numCandidates``, reference
    ``README.md:334-346, 355-366``; metric ``README.md:380``)."""

    column: str = "vector"
    id_column: str = "product_id"
    metric: str = "dot"
    num_candidates: int = 20  # README.md:364; capped at 10,000 (README.md:368)
    #: Declared recall floor — the engine's generalization of
    #: ``numCandidates`` from "a number you guess" to "a floor you
    #: declare": when set, searches through this index calibrate their
    #: candidate depth (``operators.topk_join.calibrate_recall_depth``)
    #: instead of trusting ``num_candidates``.
    recall_target: float | None = None


@dataclass
class TextIndex:
    """Keyword-index metadata on a corpus table — the BM25 analog of
    :class:`VectorIndex` (extension surface; the reference only indexes
    vectors). ``k1``/``b`` are the standard BM25 shape parameters."""

    column: str = "content"
    id_column: str = "product_id"
    k1: float = 1.2
    b: float = 0.75


@dataclass
class Catalog:
    """Logical tables over a directory of Parquet files.

    ``Catalog.for_dir("/root/testdata/sf0.01")`` registers each
    ``<name>.parquet`` as table ``<name>`` and as a temp view, so both the
    DataFrame API and ``spark.sql`` resolve them.
    """

    spark: SparkSession
    paths: dict[str, str] = field(default_factory=dict)
    schemas: dict[str, StructType] = field(default_factory=dict)
    vector_indexes: dict[str, VectorIndex] = field(default_factory=dict)
    text_indexes: dict[str, TextIndex] = field(default_factory=dict)

    def register_vector_index(self, table: str, **opts) -> VectorIndex:
        """Attach index metadata (column/id/metric/numCandidates) to a
        corpus table; ``FEDERATED_SEARCH`` resolves it at call time."""
        idx = VectorIndex(**opts)
        self.vector_indexes[table] = idx
        return idx

    def vector_index(self, table: str) -> VectorIndex:
        return self.vector_indexes.get(table, VectorIndex())

    def register_text_index(self, table: str, **opts) -> TextIndex:
        """Attach BM25 keyword-index metadata to a corpus table;
        ``TEXT_SEARCH`` resolves it at call time."""
        idx = TextIndex(**opts)
        self.text_indexes[table] = idx
        return idx

    def text_index(self, table: str) -> TextIndex:
        return self.text_indexes.get(table, TextIndex())

    @classmethod
    def for_dir(cls, spark: SparkSession, sf_dir: str, register_views: bool = True) -> "Catalog":
        cat = cls(spark)
        for name in sorted(os.listdir(sf_dir)):
            if name.endswith(".parquet"):
                cat.add_table(name[: -len(".parquet")], os.path.join(sf_dir, name))
        if register_views:
            cat.register_views()
        return cat

    def add_table(self, name: str, path: str, schema: StructType | None = None) -> None:
        self.paths[name] = path
        if schema is not None:
            self.schemas[name] = schema

    def table(self, name: str) -> DataFrame:
        if name not in self.paths:
            raise KeyError(f"Table '{name}' not found in catalog (have: {sorted(self.paths)})")
        recover_forget(self.paths[name])
        # mergeSchema: a sink directory that has been schema-evolved holds
        # files written under different contract versions; the union schema
        # is the table (reference README.md:610-612 — "the table will
        # automatically update"). Cost note for 100 TB: merging reads every
        # file footer at planning time, so evolved sinks should keep file
        # counts bounded via compaction; unevolved tables pay nothing (all
        # footers agree).
        reader = self.spark.read.option("mergeSchema", "true")
        if name in self.schemas:
            reader = reader.schema(self.schemas[name])
        return reader.parquet(self.paths[name])

    def register_views(self) -> None:
        for name in self.paths:
            self.table(name).createOrReplaceTempView(name)

    def schema(self, name: str) -> StructType:
        return self.schemas.get(name) or self.table(name).schema

    def insert_into(
        self, name: str, df: DataFrame, mode: str = "append", evolve: bool = False
    ) -> None:
        """Schema-checked write (analysis-time, like the reference's sink check).

        ``evolve=True`` reproduces the reference's contract-evolution flow
        (``README.md:610-612``: on a data-contract change "the table will
        automatically update"): an insert whose schema ADDS columns — while
        every pre-existing column keeps its exact type — widens the sink
        instead of failing. The new file lands with the wider schema, the
        catalog contract updates to the union, and earlier files keep their
        old footprint (read back as NULL in the new columns via
        ``mergeSchema``). Type changes and column drops are still rejected:
        that is a breaking contract change in the registry model too."""
        target = self.schema(name)
        if evolve:
            evolved = evolve_sink_schema(target, df.schema, sink_name=name)
            if [f.name for f in evolved.fields] != [f.name for f in target.fields]:
                self.schemas[name] = evolved
                target = evolved
            out_cols = [f.name for f in df.schema.fields]
        else:
            check_sink_schema(target, df.schema, sink_name=name)
            out_cols = [f.name for f in target.fields]
        df.select(*out_cols).write.mode(mode).parquet(self.paths[name])


def evolve_sink_schema(
    sink: StructType, query: StructType, sink_name: str = "sink"
) -> StructType:
    """Union the sink schema with a widening insert schema, or raise.

    Allowed evolution: the query carries every sink column with its exact
    type plus zero or more NEW columns (appended to the schema in query
    order). Anything else — dropped columns, type changes — raises
    :class:`SinkSchemaMismatch`, mirroring the registry's
    backward-compatibility rule."""
    sink_cols = {f.name: f.dataType for f in sink.fields}
    query_cols = {f.name: f.dataType for f in query.fields}
    missing = set(sink_cols) - set(query_cols)
    if missing:
        raise SinkSchemaMismatch(
            f"Evolving insert into '{sink_name}' drops columns {sorted(missing)} — "
            "contract evolution may only add columns"
        )
    for col, sink_type in sink_cols.items():
        if query_cols[col] != sink_type:
            raise SinkSchemaMismatch(
                f"Evolving insert into '{sink_name}' changes type of column "
                f"'{col}': query={query_cols[col].simpleString()} "
                f"sink={sink_type.simpleString()} — contract evolution may only "
                "add columns"
            )
    new_fields = [f for f in query.fields if f.name not in sink_cols]
    return StructType(list(sink.fields) + new_fields)


def check_sink_schema(sink: StructType, query: StructType, sink_name: str = "sink") -> None:
    """Fail-before-run validation of query result vs sink table schema.

    Column name set and per-column types must match (order-insensitive, since
    inserts carry a column list — reference ``README.md:438-446``). Raises
    :class:`SinkSchemaMismatch` with a Flink-style message otherwise
    (``README.md:586-594``)."""
    sink_cols = {f.name: f.dataType for f in sink.fields}
    query_cols = {f.name: f.dataType for f in query.fields}
    if set(sink_cols) != set(query_cols):
        raise SinkSchemaMismatch(
            f"Column sets of query result and sink '{sink_name}' do not match.\n"
            f"query columns: {sorted(query_cols)}\nsink columns:  {sorted(sink_cols)}"
        )
    for col, sink_type in sink_cols.items():
        if query_cols[col] != sink_type:
            raise SinkSchemaMismatch(
                f"Column types of query result and sink '{sink_name}' do not match "
                f"at column '{col}': query={query_cols[col].simpleString()} "
                f"sink={sink_type.simpleString()}"
            )


@contextlib.contextmanager
def _swap_lock(path: str):
    """Exclusive advisory lock serializing :func:`forget` swaps with
    :func:`recover_forget` on the same table path.

    Without it, a reader that lands inside a LIVE forget swap window
    (between the two renames) sees ``path`` missing, publishes tmp and
    deletes old, so the swapper's own ``rename(tmp, path)`` raises — and
    two concurrent crash-recoverers race each other the same way. The
    lock is a zero-byte ``<path>.__forget_lock`` sibling held via
    ``flock`` (never deleted — unlinking would race the lock itself).
    Best-effort: on an unwritable parent directory (read-only catalog)
    there is nothing to swap or recover, so we proceed unlocked."""
    import fcntl

    fd = None
    try:
        try:
            fd = os.open(path + ".__forget_lock", os.O_CREAT | os.O_RDWR, 0o644)
            fcntl.flock(fd, fcntl.LOCK_EX)
        except OSError:
            if fd is not None:
                os.close(fd)
                fd = None
        yield
    finally:
        if fd is not None:
            fcntl.flock(fd, fcntl.LOCK_UN)
            os.close(fd)


def recover_forget(path: str) -> None:
    """Finish a :func:`forget` table swap that crashed mid-window.

    The swap is ``rename(path, old)`` then ``rename(tmp, path)``; a crash
    between the two leaves NO table at ``path``. Recovery is
    deterministic from what survives: a complete ``__forget_tmp``
    (``_SUCCESS`` present) is the post-erasure table — publish it; an
    incomplete tmp means the write itself died — restore ``__forget_old``
    (the erasure re-runs). No-op when ``path`` exists (stale side dirs
    are cleaned by the next successful forget). Called on every catalog
    read and at the top of each per-table swap.

    Concurrency: the missing-``path`` check re-runs under
    :func:`_swap_lock`, so a reader cannot mistake a live swap's
    mid-rename window for a crash (the swapper holds the lock across
    both renames), and of two readers recovering the same real crash
    exactly one acts — the loser re-checks, sees ``path``, and returns.
    Rename failures are swallowed iff ``path`` exists afterwards
    (someone else completed the publish)."""
    import shutil

    if os.path.exists(path):
        return
    tmp = path + ".__forget_tmp"
    old = path + ".__forget_old"
    with _swap_lock(path):
        if os.path.exists(path):
            return
        if os.path.isdir(tmp) and os.path.exists(os.path.join(tmp, "_SUCCESS")):
            try:
                os.rename(tmp, path)
            except OSError:
                if not os.path.exists(path):
                    raise
            shutil.rmtree(old, ignore_errors=True)
        elif os.path.isdir(old):
            shutil.rmtree(tmp, ignore_errors=True)
            try:
                os.rename(old, path)
            except OSError:
                if not os.path.exists(path):
                    raise


def forget(
    catalog: Catalog,
    key_col: str,
    ids: DataFrame,
    *,
    tables: list[str] | None = None,
    index_paths: list[str] | None = None,
    dry_run: bool = False,
) -> dict[str, int]:
    """Right-to-be-forgotten cascade: remove every row whose ``key_col``
    is in ``ids`` from every catalog table that carries that column —
    the erasure primitive a training-data platform owes its users
    (GDPR/CCPA deletion requests propagated through raw, derived, and
    sink tables in one operation).

    Returns table → rows removed (or rows THAT WOULD be removed with
    ``dry_run=True`` — audit-before-erase). Mechanics per table: the
    deletion set is id-only and broadcast into a left-anti join, the
    survivors rewrite to ``<path>.__forget_tmp`` FIRST, and the swap is
    rename-based; the instant between the two renames (no table at
    ``path``) is healed by :func:`recover_forget`, invoked on every
    catalog read and before each swap — so a crash anywhere leaves
    either the old data (re-run the request) or the new (done), never a
    missing or half table. At 100 TB the rewrite is the
    unavoidable cost of physical erasure on immutable files; route
    frequent deletes through tombstones (``operators/_index_io``) and
    fold them into the periodic compaction instead, reserving this for
    the legal-erasure deadline.
    """
    import shutil

    if len(ids.columns) != 1:
        raise ValueError(f"ids must have exactly one column, got {ids.columns}")
    from pyspark.sql import functions as F

    dead = ids.withColumnRenamed(ids.columns[0], key_col).distinct()
    removed: dict[str, int] = {}
    names = tables if tables is not None else sorted(catalog.paths)
    for name in names:
        df = catalog.table(name)
        if key_col not in df.columns:
            continue
        n = df.join(F.broadcast(dead), key_col, "left_semi").count()
        removed[name] = n
        if dry_run or n == 0:
            continue
        path = catalog.paths[name]
        recover_forget(path)
        tmp = path + ".__forget_tmp"
        survivors = df.join(F.broadcast(dead), key_col, "left_anti")
        survivors.write.mode("overwrite").parquet(tmp)
        old = path + ".__forget_old"
        shutil.rmtree(old, ignore_errors=True)
        # the lock pins concurrent recover_forget() readers OUTSIDE the
        # two-rename window; tolerate a recover that already published
        # tmp (possible if this process previously crashed mid-swap and
        # a reader healed it before we re-entered)
        with _swap_lock(path):
            if os.path.isdir(tmp):
                os.rename(path, old)
                os.rename(tmp, path)
            elif not os.path.exists(path):
                raise FileNotFoundError(
                    f"forget('{name}'): neither table nor tmp present at {path}"
                )
        shutil.rmtree(old, ignore_errors=True)
    # persisted vector indexes hold COPIES of the data (embeddings keyed
    # by id) — erasure that skips them is not erasure. Tombstone each
    # index (search excludes immediately); physical reclamation is the
    # owner's vacuum/compact cycle, which the tombstones survive into.
    for ipath in index_paths or []:
        dead_ids = ids.withColumnRenamed(ids.columns[0], key_col).distinct()
        n = dead_ids.count()
        removed[f"index:{ipath}"] = n
        if not dry_run and n:
            from confluent_kafka_vector_search_prompt_inference_spark.operators._index_io import write_tombstones

            write_tombstones(dead_ids, ipath)
    return removed
