"""Custom stateful streaming operator via applyInPandasWithState.

The reference's only cross-record state is driver-local Python mutation
(self.page counter, cached dims — kafka_s.py:71,126-137; SURVEY.md T5).
The engine's equivalent is real managed state: per-key state rows in the
state store, checkpointed, partitioned by key across executors — the
``applyInPandasWithState`` surface (E9's custom-state half; the declarative
half is session_window in plans.gaps).

Operator: per-user running stats (event count + value sum, plus the count
of processed micro-batches that touched the key). State is one tiny row
per user; at 100 TB the state store shards by user_id with the shuffle,
and a processing-time timeout (configurable) evicts idle keys.
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
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
        StructField("n_batches", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
        StructField("n_batches", LongType()),
    ]
)


def _update(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, total, batches = state.get if state.exists else (0, 0.0, 0)
    batch_rows = 0
    for pdf in pdfs:
        batch_rows += len(pdf)
        n += len(pdf)
        total += float(pdf["value"].sum())
    if batch_rows:
        batches += 1
    state.update((n, total, batches))
    yield pd.DataFrame(
        [{"user_id": user_id, "n_events": n, "sum_value": total, "n_batches": batches}]
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """(streaming) events → per-user running aggregates, emitted each
    micro-batch that touches the user. State survives restarts via the
    checkpoint like any stateful operator."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        # append: emitted rows are final for this batch (the running totals
        # emitted later supersede by content, not by sink-side update) —
        # required by append-only sinks like parquet
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
        StructField("closed", LongType()),
    ]
)

SESSION_STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)


def _session_update(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        # idle key: emit the terminal row and EVICT the state — this is
        # the path that keeps the state store bounded on 100 TB streams
        n, total = state.get
        state.remove()
        yield pd.DataFrame(
            [{"user_id": user_id, "n_events": n, "sum_value": total, "closed": 1}]
        )
        return
    n, total = state.get if state.exists else (0, 0.0)
    max_ts_ms = 0
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        max_ts_ms = max(
            max_ts_ms, int(pdf["ts"].max().value // 1_000_000)
        )
    state.update((n, total))
    # close the session when the WATERMARK passes last-event + 30 min —
    # deterministic event-time idleness, not wall clock
    state.setTimeoutTimestamp(max_ts_ms + SESSION_IDLE_MS)
    yield pd.DataFrame(
        [{"user_id": user_id, "n_events": n, "sum_value": total, "closed": 0}]
    )


SESSION_IDLE_MS = 30 * 60 * 1000


def expiring_user_sessions(events: DataFrame) -> DataFrame:
    """(streaming) running per-user totals with EVENT-TIME TIMEOUT: a key
    whose last event is >30 min older than the watermark is closed out
    (terminal row, ``closed=1``) and its state REMOVED. The
    bounded-state twin of running_user_stats — NoTimeout state grows
    with the key universe; timeout-evicted state tracks only the active
    working set. Event-time timers (vs processing-time) keep the
    operator deterministic and replayable, and they compose with
    Trigger.AvailableNow (wall-clock timers would keep an
    availableNow drain alive forever)."""
    return events.withWatermark("ts", "10 minutes").groupBy(
        "user_id"
    ).applyInPandasWithState(
        _session_update,
        outputStructType=SESSION_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
