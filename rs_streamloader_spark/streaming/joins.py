"""Stream-stream joins with watermark-bounded state (SURVEY.md §2.4
streaming rows; absent from the reference, which has no join surface).

The canonical attribution shape: purchases joined to the clicks that
preceded them within an attribution window. Both sides carry
watermarks and the join condition time-bounds the buffered state, so
each side's state store holds only ``watermark + window`` worth of
events — the requirement for an unbounded 100 TB/day stream pair."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attribution_join(
    clicks: DataFrame,
    purchases: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    attribution_window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Inner join: each purchase matched to every click by the same
    ``key`` in the preceding ``attribution_window``. State eviction
    needs BOTH the watermarks and the two-sided time bound."""
    c = clicks
    p = purchases
    if c.isStreaming:
        c = c.withWatermark(ts_col, watermark)
    if p.isStreaming:
        p = p.withWatermark(ts_col, watermark)
    c = c.select(
        F.col(key).alias("c_key"),
        F.col(ts_col).alias("click_ts"),
        F.col(id_col).alias("click_id"),
    )
    p = p.select(
        F.col(key).alias("p_key"),
        F.col(ts_col).alias("purchase_ts"),
        F.col(id_col).alias("purchase_id"),
    )
    return p.join(
        c,
        (F.col("p_key") == F.col("c_key"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (
            F.col("click_ts")
            >= F.col("purchase_ts") - F.expr(f"INTERVAL {attribution_window}")
        ),
    ).select(
        F.col("p_key").alias("user_id"),
        "purchase_id",
        "purchase_ts",
        "click_id",
        "click_ts",
    )


def attribution_join_outer(
    clicks: DataFrame,
    purchases: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    attribution_window: str = "1 hour",
    watermark: str = "10 minutes",
) -> DataFrame:
    """LEFT OUTER variant: every purchase is emitted — matched rows as
    they join, organic (click-less) purchases with NULL click columns
    once the watermark passes their join window and no click can
    still arrive. The NULL-side emission delay IS the correctness
    contract: emitting earlier could produce a false 'organic' for a
    click that is merely late."""
    c = clicks.withWatermark(ts_col, watermark) if clicks.isStreaming else clicks
    p = (
        purchases.withWatermark(ts_col, watermark)
        if purchases.isStreaming
        else purchases
    )
    c = c.select(
        F.col(key).alias("c_key"),
        F.col(ts_col).alias("click_ts"),
        F.col(id_col).alias("click_id"),
    )
    p = p.select(
        F.col(key).alias("p_key"),
        F.col(ts_col).alias("purchase_ts"),
        F.col(id_col).alias("purchase_id"),
    )
    return p.join(
        c,
        (F.col("p_key") == F.col("c_key"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (
            F.col("click_ts")
            >= F.col("purchase_ts") - F.expr(f"INTERVAL {attribution_window}")
        ),
        "left_outer",
    ).select(
        F.col("p_key").alias("user_id"),
        "purchase_id",
        "purchase_ts",
        "click_id",
        "click_ts",
    )


def stream_static_enrich_agg(
    stream: DataFrame,
    dim: DataFrame,
    key: str = "user_id",
    dim_key: str = "c_custkey",
    segment_col: str = "c_mktsegment",
    ts_col: str = "ts",
    watermark: str = "2 hours",
    window: str = "1 hour",
) -> DataFrame:
    """Stream-static enrichment join + watermarked tumbling aggregate:
    each micro-batch inner-joins the stream against a STATIC dimension
    (no state — the dim is re-resolvable per batch, broadcast when
    small), then counts/sums per (window, segment, event_type).

    The watermark attaches to the stream BEFORE the join, so rows the
    inner join drops (unmatched keys, e.g. a flush sentinel) still
    advance event time and close windows. On a cluster the static side
    is a broadcast hash join per micro-batch — no shuffle of the
    stream, no state store for the join itself; only the windowed agg
    keeps state, bounded by the watermark."""
    s = stream
    if s.isStreaming:
        s = s.withWatermark(ts_col, watermark)
    d = F.broadcast(dim.select(F.col(dim_key).alias(key), segment_col))
    return (
        s.join(d, key)
        .groupBy(
            F.window(ts_col, window).alias("win"),
            F.col(segment_col).alias("segment"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "segment",
            "event_type",
            "n_events",
            "total_value",
        )
    )
