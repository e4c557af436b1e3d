"""Streaming event-time windows (SURVEY.md X6, §2.7 gap-fill).

The reference has no event-time semantics at all; the north star mandates
them. These helpers run the SAME window logic as the batch queries
(q30-q32) under Structured Streaming with watermarks:

- tumbling/sliding: ``F.window`` + ``withWatermark`` - late rows beyond
  the watermark drop, on-time aggregates finalize exactly once (append
  mode).
- session windows: ``F.session_window`` - Spark's native gap-merging
  stateful operator (the streaming twin of the batch lag+prefix-sum in
  q32).

State scales with open windows per key, not with history - at 100 TB of
daily events the state store only holds the watermark horizon.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window_size: str = "1 hour",
    watermark: str = "2 hours",
    keys: list[str] | None = None,
) -> DataFrame:
    """Watermarked tumbling-window counts/sums; works on both batch and
    streaming frames (identical plan modulo the stateful exchange)."""
    group_cols = [F.window(F.col(ts_col), window_size).alias("win")] + [
        F.col(k) for k in (keys or [])
    ]
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(*group_cols)
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("win").start.alias("window_start"),
            F.col("win").end.alias("window_end"),
            *[F.col(k) for k in (keys or [])],
            "n_events",
            "sum_value",
        )
    )


def session_aggregate(
    events: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    key: str = "user_id",
) -> DataFrame:
    """Native session windows with an inactivity gap (stateful merge under
    streaming; plain groupBy under batch)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("sess"), F.col(key))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col(key),
            F.col("sess").start.alias("session_start"),
            F.col("sess").end.alias("session_end"),
            "n_events",
        )
    )


def streaming_ohlc(
    ticks: DataFrame,
    ts_col: str = "ts",
    price_col: str = "price",
    window_size: str = "1 minute",
    watermark: str = "5 minutes",
    keys: list[str] | None = None,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Watermarked tumbling OHLC candles - the streaming twin of
    ``operators.timeseries.ohlc_bars`` (same min_by/max_by-over-
    (ts, tiebreak) open/close semantics, same NULL-price exclusion).
    On-time bars finalize exactly once in append mode when the
    watermark passes the bar end; state per (key, open window) is the
    five partial aggregates, not the ticks. Works on batch frames too
    (identical plan modulo the stateful exchange), so a batch replay
    of the same ticks produces the same candles."""
    from ..operators.timeseries import ohlc_price_aggs

    if "bucket" in (keys or []):
        raise ValueError(
            "'bucket' is the output column; rename the group"
        )
    _price, aggs = ohlc_price_aggs(ts_col, price_col, tiebreak_col)
    group_cols = [
        F.window(F.col(ts_col), window_size).alias("win")
    ] + [F.col(k) for k in (keys or [])]
    return (
        ticks.withWatermark(ts_col, watermark)
        .groupBy(*group_cols)
        .agg(*aggs)
        .select(
            F.col("win").start.alias("bucket"),
            *[F.col(k) for k in (keys or [])],
            "open",
            "high",
            "low",
            "close",
            "n_ticks",
        )
    )
