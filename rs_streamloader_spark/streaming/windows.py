"""Streaming window aggregations with watermarks (SURVEY.md §2.4
streaming rows — absent from the reference, which rejects late adds
outright: /root/reference/lib/RedshiftLoader.ts:137-142).

Each builder takes any streaming (or batch) DataFrame with an event
time column and returns the windowed aggregation; watermarking bounds
state for late data at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_window_agg(
    events: DataFrame,
    ts_col: str = "ts",
    window_size: str = "1 hour",
    watermark: str = "10 minutes",
    group_cols: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    df = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        df.groupBy(F.window(ts_col, window_size).alias("win"), *group_cols)
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *group_cols,
            "n_events",
            "total_value",
        )
    )


def sliding_window_agg(
    events: DataFrame,
    ts_col: str = "ts",
    window_size: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    df = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        df.groupBy(F.window(ts_col, window_size, slide).alias("win"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "n_events",
        )
    )


def streaming_dedup(
    events: DataFrame,
    keys: tuple[str, ...] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup with bounded state:
    ``dropDuplicatesWithinWatermark`` keeps each key only until the
    watermark passes it, so state is O(events per watermark window) —
    the streaming form of the batch ``dedup_exact`` operator, and the
    idempotency guard for at-least-once upstream sources (e.g. a
    replayed Kinesis shard). Duplicates arriving within the watermark
    horizon are suppressed; later ones are by definition beyond the
    source's redelivery window."""
    if events.isStreaming:
        return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            list(keys)
        )
    return events.dropDuplicates(list(keys))


def session_window_agg(
    events: DataFrame,
    ts_col: str = "ts",
    gap: str = "5 minutes",
    key_col: str = "user_id",
    watermark: str = "10 minutes",
) -> DataFrame:
    df = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        df.groupBy(F.session_window(ts_col, gap).alias("win"), key_col)
        .agg(F.count("*").alias("n_events"))
        .select(
            key_col,
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
        )
    )
