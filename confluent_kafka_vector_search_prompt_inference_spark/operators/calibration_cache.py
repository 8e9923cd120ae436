"""Persisted recall-calibration curves — pay the two calibration scans
once per corpus STATE, not once per query.

``calibrate_recall_depth`` / ``calibrate_ivf_n_probe`` measure a
(depth → sample recall) curve with two corpus passes. A long-lived
workload (the reference's forever-running statements, ``README.md:435``)
re-pays those scans on every invocation even though the curve only moves
when the corpus does. This module stores the MEASURED curve keyed by the
calibration parameters plus a corpus fingerprint; a later call with the
same key reads the curve and picks its depth with ZERO Spark jobs — and
because the full curve is cached (not just the chosen depth), a call
with a *different* ``recall_target`` against the same corpus is also a
pure cache hit.

Fingerprints are deliberately job-free:

- :func:`dataframe_fingerprint` — Catalyst's optimized-plan size
  estimate (file-footer bytes propagated through the plan; no job).
  Appends/compactions move the byte count, invalidating the entry.
- :func:`directory_fingerprint` — a metadata walk of a persisted index
  directory (relative path, size, mtime); any append / vacuum / split /
  compaction touches files and invalidates. This is the drift signal
  ``ivf_index_stats`` monitors, read straight off the filesystem.

The cache file is human-readable JSON, written atomically (tmp +
rename); concurrent writers last-write-win on the whole file, which is
safe because entries are append-only measurements keyed by their inputs
— losing one races a re-measure, never a wrong answer.
"""

from __future__ import annotations

import hashlib
import json
import os


class CalibrationCache:
    """A small JSON store of measured recall curves.

    ``lookup(key)`` returns the stored ``{depth: recall}`` curve (depths
    as ints) or ``None``; ``store(key, curve)`` persists one. Keys are
    dicts of the calibration inputs (strategy, k, metric, sample size,
    corpus fingerprint, …) — serialized order-insensitively."""

    def __init__(self, path: str) -> None:
        self.path = path

    @staticmethod
    def _key(key: dict) -> str:
        return json.dumps(key, sort_keys=True, default=str)

    def _load(self) -> dict:
        if not os.path.exists(self.path):
            return {}
        try:
            with open(self.path) as fh:
                return json.load(fh)
        except (json.JSONDecodeError, OSError):
            return {}  # a torn/corrupt cache re-measures, never crashes

    def lookup(self, key: dict) -> dict | None:
        entry = self._load().get(self._key(key))
        if entry is None:
            return None
        # single-knob curves key by int depth/width; composite-knob curves
        # (IVF-PQ's (n_probe, width) rungs) key by strings like "4:100"
        def _parse(d: str):
            try:
                return int(d)
            except ValueError:
                return d

        return {_parse(d): float(r) for d, r in entry.items()}

    def store(self, key: dict, curve: dict[int, float]) -> None:
        doc = self._load()
        doc[self._key(key)] = {str(d): float(r) for d, r in curve.items()}
        d = os.path.dirname(self.path)
        if d:
            os.makedirs(d, exist_ok=True)
        tmp = self.path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(doc, fh, indent=1)
        os.replace(tmp, self.path)


def dataframe_fingerprint(df) -> str:
    """Job-free fingerprint of a DataFrame-shaped corpus: Catalyst's
    optimized-plan size estimate (file footers for scans). Appends and
    rewrites move the byte count; a same-size adversarial rewrite would
    not — callers with a persisted index should prefer
    :func:`directory_fingerprint`, which sees mtimes."""
    from confluent_kafka_vector_search_prompt_inference_spark.operators.topk_join import _plan_size_bytes

    return f"plan:{_plan_size_bytes(df)}"


def query_sample_fingerprint(
    queries, query_id: str, query_vec: str, *, n: int = 32
) -> str:
    """Fingerprint of the query WORKLOAD for the calibrators'
    ``query_fingerprint=`` knob: sha1 over the first ``n`` rows of
    ``(query_id, query_vec)`` — named separately, in the calibrators'
    exact order, BECAUSE the mirror is the contract: the calibration
    sample orders by ``xxhash64(query_id, query_vec)``, and a caller
    passing the columns reversed (as a round-8 free-form ``cols`` list
    allowed) would silently fingerprint a DIFFERENT 32-row subset than
    the rows the cached curve was measured on — a cache whose hits and
    misses no longer track workload drift.

    This one COSTS a job (an n-row limit+collect — tiny, but not free
    like the corpus fingerprints): a query distribution lives in data,
    not metadata. Use it when the workload genuinely shifts between
    calibrations; for a stationary stream, leave the calibrators'
    ``query_fingerprint`` as None — fingerprinting every micro-batch
    would make each one a cache miss and re-pay the calibration scans
    the cache exists to amortize.

    The ``n`` rows are selected in the SAME deterministic hash order the
    calibrators use for their sample (``orderBy(xxhash64(query_id,
    query_vec), query_id).limit(n)``) — a bare ``limit`` takes whichever
    partitions answer first, so the fingerprint would drift across
    sessions for an identical stationary workload (spurious cache
    misses) and could cover different rows than the curve was measured
    on."""
    from pyspark.sql import functions as F

    cols = [query_id, query_vec]
    h = hashlib.sha1()
    ordered = queries.select(*cols).orderBy(
        F.xxhash64(*[F.col(c) for c in cols]), F.col(cols[0])
    )
    for row in ordered.limit(n).collect():
        for c in cols:
            h.update(repr(row[c]).encode())
            h.update(b"\x1f")
        h.update(b"\x1e")
    return f"queries:{h.hexdigest()}"


def directory_fingerprint(path: str) -> str:
    """Filesystem-metadata fingerprint of a persisted index directory:
    sha1 over the sorted (relative path, size, mtime_ns) walk. No Spark
    job; any append / vacuum / split / compact touches files and changes
    it. Files whose basename starts with ``_calibration`` are excluded so
    the cache living INSIDE the index directory doesn't invalidate
    itself by being written."""
    h = hashlib.sha1()
    for root, dirs, files in sorted(os.walk(path)):
        dirs.sort()
        for name in sorted(files):
            if name.startswith("_calibration"):
                continue
            p = os.path.join(root, name)
            st = os.stat(p)
            rec = f"{os.path.relpath(p, path)}|{st.st_size}|{st.st_mtime_ns}\n"
            h.update(rec.encode())
    return f"dir:{h.hexdigest()}"
