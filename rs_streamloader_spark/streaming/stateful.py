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
    tz_name: str = "UTC",
) -> Iterable[pd.DataFrame]:
    """Emit a session row only when the event-time timeout fires —
    i.e. the watermark passed last_event + gap, proving the session
    can no longer grow. The state store holds one (start, last, n)
    triple per open session per user. ``tz_name`` is the SESSION
    timezone (bound by :func:`sessionize_stateful`): Arrow hands the
    pandas UDF tz-naive datetimes localized to
    ``spark.sql.session.timeZone``, so the epoch for the timeout must
    be computed in that zone — not UTC blindly, and never the OS-local
    zone."""
    import datetime as _dt

    try:
        from zoneinfo import ZoneInfo

        tzinfo = ZoneInfo(tz_name)
    except Exception:
        tzinfo = _dt.timezone.utc

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
    # Segment this batch's events (plus the open session carried in
    # state) on SESSION_GAP_S: two events of one key more than the gap
    # apart — in the same micro-batch, or replayed together by an
    # availableNow backfill before the event-time timeout ever fires —
    # are DIFFERENT sessions and must not be min/max-merged into one
    # row spanning the gap. Sessions closed by an in-data gap are
    # emitted immediately; only the trailing open session stays in
    # state awaiting its timeout.
    gap = _dt.timedelta(seconds=SESSION_GAP_S)
    items: list[list] = []  # [start, last, n]
    if state.exists:
        s0, l0, n0 = state.get
        items.append([s0, l0, n0])
    items += [
        [t, t, 1]
        for pdf in batches
        for t in (x.to_pydatetime() for x in pd.to_datetime(pdf["ts"]))
    ]
    if not items:  # defensive: no state and an empty batch
        return
    items.sort(key=lambda x: (x[0], x[1]))
    segments = [items[0]]
    for st, en, c in items[1:]:
        cur = segments[-1]
        if st <= cur[1] + gap:
            cur[1] = max(cur[1], en)
            cur[2] += c
        else:
            segments.append([st, en, c])
    closed, (start, last, n) = segments[:-1], segments[-1]
    state.update((start, last, n))
    timeout_at = last + gap
    # epoch-ms computed in the session timezone the naive values are
    # expressed in, clamped above the current watermark: a watermark
    # delay larger than SESSION_GAP_S would otherwise make the timeout
    # <= the watermark, which GroupState rejects and kills the query
    timeout_ms = int(timeout_at.replace(tzinfo=tzinfo).timestamp() * 1000)
    state.setTimeoutTimestamp(max(state.getCurrentWatermarkMs() + 1, timeout_ms))
    yield pd.DataFrame(
        {
            "user_id": [user_id] * len(closed),
            "session_start": [c[0] for c in closed],
            "session_end": [c[1] for c in closed],
            "n_events": [c[2] for c in closed],
        }
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
    State is evicted by the timeout, so memory is O(open sessions).

    The session timezone is captured HERE (driver side) and bound into
    the state function: the worker receives naive session-local
    timestamps and must anchor the timeout epoch in that same zone."""
    import functools

    from pyspark.sql.types import TimestampNTZType

    # TIMESTAMP (instant) values reach pandas localized to the session
    # timezone; TIMESTAMP_NTZ values are wall-clock and their watermark
    # epoch treats them as UTC — anchor the timeout accordingly
    ts_type = events.schema["ts"].dataType
    if isinstance(ts_type, TimestampNTZType):
        tz_name = "UTC"
    else:
        tz_name = (
            events.sparkSession.conf.get("spark.sql.session.timeZone") or "UTC"
        )
    fn = functools.partial(_close_sessions, tz_name=tz_name)
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
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
