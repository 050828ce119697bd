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
SESSION_STATE = (
    "starts ARRAY<TIMESTAMP>, lasts ARRAY<TIMESTAMP>, ns ARRAY<BIGINT>"
)
SESSION_GAP_S = 30 * 60


def _tzinfo_for(tz_name: str):
    """tzinfo for a Spark session-timezone string. Spark accepts both
    region ids (zoneinfo) and JVM fixed-offset ids ('GMT+8',
    'UTC+05:30') that zoneinfo rejects — parse those explicitly; a
    silent UTC fallback would shift every timeout by the offset."""
    import datetime as _dt
    import re as _re

    try:
        from zoneinfo import ZoneInfo

        return ZoneInfo(tz_name)
    except Exception:
        m = _re.fullmatch(
            r"(?:GMT|UTC)?\s*([+-])(\d{1,2})(?::?(\d{2}))?", tz_name.strip()
        )
        if m:
            sign = 1 if m.group(1) == "+" else -1
            offset = _dt.timedelta(
                hours=int(m.group(2)), minutes=int(m.group(3) or 0)
            )
            return _dt.timezone(sign * offset)
        raise ValueError(f"unrecognized session timezone: {tz_name!r}")


def merge_segments(items: list, gap) -> list:
    """Gap-merge: sorted interval union of ``[start, last, n]`` items
    (points are ``[t, t, 1]``). Two items belong to one session iff
    their intervals are within ``gap``; counts add. Pure — the
    sessionization invariants (order-insensitive, count-preserving,
    inter-segment gaps > gap) are property-tested. Empty input merges
    to no segments (exported API: callers must not need to guard)."""
    if not items:
        return []
    items = [list(x) for x in items]
    items.sort(key=lambda x: (x[0], x[1]))
    segments = [items[0]]
    for st, en, c in items[1:]:
        cur = segments[-1]
        if st <= cur[1] + gap:
            cur[1] = max(cur[1], en)
            cur[2] += c
        else:
            segments.append([st, en, c])
    return segments


def _close_sessions(
    key: Tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
    tz_name: str = "UTC",
) -> Iterable[pd.DataFrame]:
    """Watermark-gated sessionization. The state store holds EVERY
    segment that could still change — the open tail AND gap-closed
    segments the watermark has not passed yet — so a late event (legal
    under the watermark delay) still merges into the session it
    belongs to; emitting a gap-closed segment immediately would freeze
    it in the append-mode output with no way to retract. A segment is
    emitted exactly when ``last + gap < watermark``: from then on no
    admissible event can extend it (anything that could is already
    below the watermark and dropped upstream).

    ``tz_name`` is the SESSION timezone (bound by
    :func:`sessionize_stateful`): Arrow hands the pandas UDF tz-naive
    datetimes localized to ``spark.sql.session.timeZone``, so segment
    epochs must be computed in that zone — not UTC blindly, and never
    the OS-local zone."""
    import datetime as _dt

    tzinfo = _tzinfo_for(tz_name)
    gap = _dt.timedelta(seconds=SESSION_GAP_S)
    gap_ms = SESSION_GAP_S * 1000
    (user_id,) = key

    items: list[list] = []  # [start, last, n]
    if state.exists:
        starts, lasts, ns = state.get
        items += [
            [pd.Timestamp(s).to_pydatetime(), pd.Timestamp(l).to_pydatetime(), int(n)]
            for s, l, n in zip(starts, lasts, ns)
        ]
    if not state.hasTimedOut:
        items += [
            [t, t, 1]
            for pdf in batches
            for t in (x.to_pydatetime() for x in pd.to_datetime(pdf["ts"]))
        ]
    if not items:  # defensive: no state and an empty batch
        return
    # gap-merge: sorted interval union over held segments + new points
    # (late events merge into HELD segments here — the whole point of
    # keeping them in state until the watermark passes)
    segments = merge_segments(items, gap)

    wm_ms = state.getCurrentWatermarkMs()

    def ms(dt) -> int:
        # DST note: replace(tzinfo=...) resolves an ambiguous wall time
        # (the fall-back overlap hour) as fold=0 — the FIRST occurrence,
        # i.e. the pre-transition offset. That is the same resolution
        # Java's ZoneRules (and therefore Spark's own wall→instant
        # conversion feeding the watermark) applies to overlaps, so the
        # timeout epoch and the watermark agree even in that hour.
        return int(dt.replace(tzinfo=tzinfo).timestamp() * 1000)

    emit = [s for s in segments if ms(s[1]) + gap_ms < wm_ms]
    keep = [s for s in segments if ms(s[1]) + gap_ms >= wm_ms]
    if keep:
        state.update(
            (
                [s[0] for s in keep],
                [s[1] for s in keep],
                [s[2] for s in keep],
            )
        )
        # wake when the earliest held segment becomes emittable;
        # clamped above the watermark (GroupState rejects <= wm)
        next_ms = min(ms(s[1]) for s in keep) + gap_ms
        state.setTimeoutTimestamp(max(wm_ms + 1, next_ms))
    else:
        state.remove()
    yield pd.DataFrame(
        {
            "user_id": [user_id] * len(emit),
            "session_start": [s[0] for s in emit],
            "session_end": [s[1] for s in emit],
            "n_events": [s[2] for s in emit],
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
