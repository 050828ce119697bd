"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2.4 stateful-ops row — the reference's only state is an
in-memory upload-task list, /root/reference/lib/RedshiftLoader.ts:37-40).

``running_user_stats`` keeps a per-user (count, total value) state
across micro-batches — the canonical custom-stateful shape (sessionized
counters, fraud scores, rate limits). State lives in the state store,
sized per key, not per event: this is what scales to a billion users.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id BIGINT, n_events BIGINT, total_value DOUBLE"
STATE_SCHEMA = "n BIGINT, total DOUBLE"


def _update_user_stats(
    key: Tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "total_value": [round(total, 2)]}
    )


SESSION_OUTPUT = (
    "user_id BIGINT, session_start TIMESTAMP, session_end TIMESTAMP, n_events BIGINT"
)
SESSION_STATE = "start TIMESTAMP, last TIMESTAMP, n BIGINT"
SESSION_GAP_S = 30 * 60


def _close_sessions(
    key: Tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    """Emit a session row only when the event-time timeout fires —
    i.e. the watermark passed last_event + gap, proving the session
    can no longer grow. The state store holds one (start, last, n)
    triple per open session per user."""
    import datetime as _dt

    (user_id,) = key
    if state.hasTimedOut:
        start, last, n = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "session_start": [start],
                "session_end": [last],
                "n_events": [n],
            }
        )
        return
    start, last, n = state.get if state.exists else (None, None, 0)
    for pdf in batches:
        ts = pd.to_datetime(pdf["ts"])
        lo, hi = ts.min(), ts.max()
        start = lo.to_pydatetime() if start is None else min(start, lo.to_pydatetime())
        last = hi.to_pydatetime() if last is None else max(last, hi.to_pydatetime())
        n += len(pdf)
    state.update((start, last, n))
    timeout_at = last + _dt.timedelta(seconds=SESSION_GAP_S)
    state.setTimeoutTimestamp(int(timeout_at.timestamp() * 1000))
    yield pd.DataFrame(
        {"user_id": [], "session_start": [], "session_end": [], "n_events": []}
    ).astype(
        {
            "user_id": "int64",
            "session_start": "datetime64[us]",
            "session_end": "datetime64[us]",
            "n_events": "int64",
        }
    )


def sessionize_stateful(events: DataFrame, watermark: str = "0 seconds") -> DataFrame:
    """Custom stateful sessionization with EVENT-TIME TIMEOUT: unlike
    the built-in ``session_window`` aggregation, arbitrary per-session
    logic can run at close time (here: emit the completed session;
    in production: score it, write a feature row, fire an alert).
    State is evicted by the timeout, so memory is O(open sessions)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _close_sessions,
            outputStructType=SESSION_OUTPUT,
            stateStructType=SESSION_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """Per-user running event count + value total, updated each
    micro-batch; emits the refreshed rows for keys seen in the batch."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_stats,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
