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
