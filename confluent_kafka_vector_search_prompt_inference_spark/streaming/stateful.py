"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference keeps all state in external systems (topics, MongoDB —
SURVEY.md §7 "streaming state"); the engine's extension surface needs
in-engine keyed state for running aggregates a windowed groupBy can't
express. The canonical example here: a per-key running profile (count,
sum, exponential moving average) that emits an updated row per micro-batch
and expires idle keys with a processing-time timeout — state the size of
one row per live key, the pattern that scales to millions of keys under
the RocksDB state store.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

RUNNING_PROFILE_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("n_events", LongType()),
        StructField("total", DoubleType()),
        StructField("ema", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("total", DoubleType()),
        StructField("ema", DoubleType()),
    ]
)


def running_profile(
    stream: DataFrame,
    key_col: str,
    value_col: str,
    *,
    alpha: float = 0.2,
    idle_timeout_ms: int | None = None,
) -> DataFrame:
    """Per-key running (count, sum, EMA) over an unbounded stream.

    Emits one updated profile row per key per micro-batch that touched it.
    With ``idle_timeout_ms``, keys silent for that long are dropped from
    the state store (the emitted row carries their final profile)."""

    def update(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            n, total, ema = state.get
            state.remove()
            yield pd.DataFrame(
                {"key": [str(key[0])], "n_events": [n], "total": [total], "ema": [ema]}
            )
            return
        n, total, ema = state.get if state.exists else (0, 0.0, None)
        for pdf in pdfs:
            for v in pdf[value_col]:
                v = float(v)
                n += 1
                total += v
                ema = v if ema is None else alpha * v + (1 - alpha) * ema
        state.update((n, total, ema))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            {"key": [str(key[0])], "n_events": [n], "total": [total], "ema": [ema]}
        )

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return (
        stream.groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=RUNNING_PROFILE_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=timeout,
        )
    )


# ---------------------------------------------------------------------------
# transformWithStateInPandas (Spark 4 stateful API): typed state variables +
# TTL managed by the engine, the forward path for custom operators (the
# applyInPandasWithState form above remains for 3.x compatibility).
# ---------------------------------------------------------------------------

KEYED_COUNTER_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("n_events", LongType()),
        StructField("total", DoubleType()),
    ]
)


def keyed_totals_tws(
    stream: DataFrame,
    key_col: str,
    value_col: str,
    *,
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """Per-key running (count, total) via ``transformWithStateInPandas``.

    State is a single typed ValueState row per key; with ``state_ttl_ms``
    the store expires idle keys itself (no manual timer bookkeeping, the
    operational contract for millions of keys under RocksDB).

    Requirements: the RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass``) and the
    ``protobuf`` package (the TWS state-server wire protocol) — when
    either is unavailable, use :func:`running_profile`
    (``applyInPandasWithState``), which has no extra dependencies."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    value_col_name = value_col

    class KeyedTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "totals", "n_events BIGINT, total DOUBLE", ttlDurationMs=state_ttl_ms
            )

        def handleInputRows(self, key, rows, timerValues):
            n, total = self._state.get() if self._state.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf[value_col_name].astype("float64").sum())
            self._state.update((n, total))
            yield pd.DataFrame({"key": [str(key[0])], "n_events": [n], "total": [total]})

        def close(self) -> None:
            pass

    return (
        stream.groupBy(key_col)
        .transformWithStateInPandas(
            KeyedTotals(),
            outputStructType=KEYED_COUNTER_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )


TRANSITIONS_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("cur", StringType()),
        StructField("nxt", StringType()),
    ]
)

_TRANS_STATE = StructType([StructField("last_type", StringType())])


def transition_steps(
    stream: DataFrame,
    key_col: str,
    type_col: str,
    ts_col: str,
    id_col: str,
) -> DataFrame:
    """Streaming twin of the batch lag-window transition matrix: emits one
    ``(cur → nxt)`` row per consecutive event pair per key, bridging
    micro-batch boundaries with one row of keyed state (the key's last
    event type). Downstream, a plain ``groupBy(cur, nxt).count()`` — or an
    idempotent sink plus batch re-aggregation — yields exactly the counts
    the batch ``LEAD() OVER (PARTITION BY key ORDER BY ts, id)`` query
    produces, provided arrival order respects event time per key (enforce
    with a watermark + sorted replay, or run the batch form for backfill).
    State is O(1) per live key — the minimal footprint for sequence
    features over millions of keys on the RocksDB store."""

    def update(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        rows = pd.concat(list(pdfs), ignore_index=True)
        prev = state.get[0] if state.exists else None
        curs: list[str] = []
        nxts: list[str] = []
        if not rows.empty:
            rows = rows.sort_values([ts_col, id_col])
            for t in rows[type_col]:
                if prev is not None:
                    curs.append(prev)
                    nxts.append(str(t))
                prev = str(t)
        state.update((prev,))
        yield pd.DataFrame(
            {"key": [str(key[0])] * len(curs), "cur": curs, "nxt": nxts}
        )

    return stream.groupBy(key_col).applyInPandasWithState(
        update,
        TRANSITIONS_SCHEMA,
        _TRANS_STATE,
        "append",
        GroupStateTimeout.NoTimeout,
    )
