"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState`` (the streaming analog of the batch q33
sessionization, SURVEY §2.11 generalized).

Why ``applyInPandasWithState`` and not ``groupBy(session_window(...))``:
Spark's built-in session window only aggregates; the reference-style session
needs custom per-session payload (first/last event types, value sum, event
count) AND explicit control over when a session is considered closed — a
per-key state machine. State is one open session per user: O(active users)
memory, genuinely bounded because idle keys time out — a processing-time
timeout of the session gap flushes the open session and ``state.remove()``s
the key, so a user who never returns doesn't pin state forever. Emitted
rows are *closed* sessions, so downstream consumers (MERGE, metrics) see
append-only finalized facts.

At scale: state is hash-partitioned by user_id across executors (the same
shuffle a groupBy would pay), checkpointed via the streaming checkpoint dir;
skewed users cost one state row like anyone else — the operator's memory is
per-key constant, not per-event.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", IntegerType()),
        StructField("total_value", DoubleType()),
    ]
)

# open-session state: (start_epoch_us, end_epoch_us, n_events, total_value)
STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("n_events", IntegerType()),
        StructField("total_value", DoubleType()),
    ]
)

_US = 1_000_000


def _closed_frame(user_id: Any, closed: list[tuple[int, int, int, float]]) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [user_id] * len(closed),
            "session_start": [pd.Timestamp(c[0], unit="us") for c in closed],
            "session_end": [pd.Timestamp(c[1], unit="us") for c in closed],
            "n_events": [c[2] for c in closed],
            "total_value": [round(c[3], 2) for c in closed],
        }
    )


def _sessionize_group(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    gap_minutes: float,
) -> Iterator[pd.DataFrame]:
    gap_us = int(gap_minutes * 60 * _US)
    gap_ms = max(int(gap_minutes * 60 * 1000), 1)

    if state.hasTimedOut:
        # No new events for this user within the gap (processing time):
        # the open session is final — emit it and free the state slot.
        if state.exists:
            start_us, end_us, n_events, total_value = state.get
            state.remove()
            if start_us is not None:
                yield _closed_frame(key[0], [(start_us, end_us, n_events, total_value)])
        return

    rows = pd.concat(list(pdfs), ignore_index=True).sort_values("ts")
    ts_us = (rows["ts"].astype("int64")).tolist()  # ns → we convert below
    ts_us = [t // 1000 for t in ts_us]
    values = rows["value"].tolist()

    if state.exists:
        start_us, end_us, n_events, total_value = state.get
    else:
        start_us = end_us = None
        n_events = 0
        total_value = 0.0

    closed: list[tuple[int, int, int, float]] = []
    for t, v in zip(ts_us, values):
        if start_us is None:
            start_us, end_us, n_events, total_value = t, t, 1, float(v)
        elif t - end_us > gap_us:
            closed.append((start_us, end_us, n_events, total_value))
            start_us, end_us, n_events, total_value = t, t, 1, float(v)
        else:
            end_us = t
            n_events += 1
            total_value += float(v)

    state.update((start_us, end_us, n_events, total_value))
    # Re-arm the idle timer: if no further event for this user arrives
    # within the gap, the hasTimedOut branch above emits the open session.
    state.setTimeoutDuration(gap_ms)

    if closed:
        yield _closed_frame(key[0], closed)


def sessionize_stream(events: DataFrame, gap_minutes: float = 30.0) -> DataFrame:
    """Gap-based sessionization over a stream of ``(user_id, ts, value)``.

    Emits one row per CLOSED session. A session closes two ways: a new
    event from the same user more than ``gap_minutes`` after the previous
    one (event-time gap), or ``gap_minutes`` of processing time passing
    with no new events for that user (idle timeout — emits the open
    session and removes the state, keeping state size O(active users)
    rather than O(all users ever seen)).
    """

    def fn(key, pdfs, state):
        return _sessionize_group(key, pdfs, state, gap_minutes)

    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
