"""Event-time windowing over the events table (SURVEY §2.9 ST1-ST5).

Each function takes any DataFrame with an event-time column and returns
a declarative aggregation that works identically on a batch scan and on
a ``readStream`` source (add ``withWatermark`` upstream for streaming —
see ``tests/test_streaming.py``). Double-typed sums accumulate in
DECIMAL for oracle exactness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_window_counts(
    df: DataFrame, duration: str = "10 minutes", ts_col: str = "ts"
) -> DataFrame:
    """ST1: fixed (tumbling) event-time windows per event_type."""
    return (
        df.groupBy(F.window(ts_col, duration), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(27,6)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_window_counts(
    df: DataFrame,
    duration: str = "10 minutes",
    slide: str = "5 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """ST2: overlapping (sliding) windows — each event lands in
    duration/slide windows."""
    return (
        df.groupBy(F.window(ts_col, duration, slide))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "n_events",
        )
    )


def sessionize(
    df: DataFrame, gap: str = "30 minutes", key_col: str = "user_id", ts_col: str = "ts"
) -> DataFrame:
    """ST3: session windows — per-key sessions closed after ``gap`` of
    inactivity. ``session_window`` end = last event + gap."""
    return (
        df.groupBy(F.session_window(ts_col, gap), F.col(key_col))
        .agg(
            F.count("*").alias("n_events"),
            F.min("event_id").alias("first_event_id"),
        )
        .select(
            F.col(key_col),
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "first_event_id",
        )
    )


def dedup_first_event(df: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """ST5: streaming-style dedup in its deterministic batch form — keep
    the FIRST event (min event_id / earliest ts) per key. In a live
    stream this is ``dropDuplicates(keys)`` with a watermark bounding
    state; the batch form pins which duplicate survives so the oracle
    can reproduce it."""
    keys = keys or ["user_id", "event_type"]
    return df.groupBy(*keys).agg(
        F.min("event_id").alias("first_event_id"),
        F.min("ts").alias("first_ts"),
        F.count("*").alias("n_duplicates"),
    )


def drop_late_events(df: DataFrame, lateness: str = "1 hour") -> DataFrame:
    """ST4: watermark semantics in batch form — drop events older than
    (max event time − lateness), i.e. what a stream with
    ``withWatermark(ts, lateness)`` would refuse to admit at end of
    input."""
    cutoff = df.agg(
        (F.max("ts") - F.expr(f"INTERVAL {lateness}")).alias("cutoff")
    )
    return df.crossJoin(F.broadcast(cutoff)).filter(F.col("ts") >= F.col("cutoff")).drop(
        "cutoff"
    )
