"""Event-time windowed aggregation over the events stream.

The reference has no event-time processing (SURVEY.md §2.8) — its only
"streams" are the ops log and a 100 ms config poll
(shardkv/server.go:368-385). These are the Spark-native streaming
analytics a complete engine provides: tumbling / sliding / session
windows with watermarked late-data handling, batch-equivalent by
construction (same functions run on a batch DataFrame in
operators/analytics.events_windowed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-(window, event_type) counts + value sums with late-data bound.

    The watermark bounds state: windows older than max(event_time) -
    watermark are finalized and evicted — the streaming analog of the
    reference's log-compaction bound (K6).
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_rates(
    events: DataFrame,
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Overlapping windows — each event lands in window/slide buckets."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("win"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
        )
    )


def session_windows(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Gap-based session windows per user (F.session_window).

    The streaming twin of the batch `user_sessions` query (registry):
    a session closes when a user is idle for `gap`.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("win"), "user_id")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


def interval_join(
    clicks: DataFrame,
    purchases: DataFrame,
    within: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-STREAM inner join: purchases attributed to a preceding
    click by the same user within ``within`` (the conversion-attribution
    join, both sides unbounded).

    The event-time range condition plus per-side watermarks is what
    bounds join state at scale: each side buffers only rows younger
    than watermark + interval — without the time bound the state store
    grows forever. Batch-equivalent by construction: the same predicate
    over two batch DataFrames is the oracle.
    """
    c = clicks.select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("click_ts")
    ).withWatermark("click_ts", watermark)
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purch_ts"),
        F.col("value").alias("purch_value"),
    ).withWatermark("purch_ts", watermark)
    return c.join(
        p,
        F.expr(
            f"c_user = p_user AND purch_ts >= click_ts "
            f"AND purch_ts <= click_ts + interval {within}"
        ),
        "inner",
    )
