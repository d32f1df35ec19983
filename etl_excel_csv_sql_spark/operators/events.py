"""Event-time operators over the events stream table.

The reference has no event-time semantics (its incremental behavior is
file-mtime-based, SURVEY §2.8); these are the north-star extensions. The
window aggregations have Structured Streaming twins in
streaming/windows.py that reuse these exact functions (plus a watermark);
the lag-based sessionize() is batch-only by shape — its streaming twin is
session_window_agg(), which streaming/windows.py wraps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tumbling_window_agg(
    df: DataFrame,
    ts_col: str = "ts",
    width: str = "1 hour",
    group_cols: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Fixed (tumbling) window aggregation via F.window — the same
    expression works under readStream with a watermark. One shuffle on
    (window, groups); partials are map-side."""
    return (
        df.groupBy(F.window(F.col(ts_col), width).alias("w"), *group_cols)
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            *group_cols,
            "n_events",
            "sum_value",
        )
    )


def sliding_window_agg(
    df: DataFrame,
    ts_col: str = "ts",
    width: str = "30 minutes",
    slide: str = "10 minutes",
    group_cols: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Sliding windows: each event lands in width/slide windows (explode is
    handled by F.window itself)."""
    return (
        df.groupBy(F.window(F.col(ts_col), width, slide).alias("w"), *group_cols)
        .agg(F.count("*").alias("n_events"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            *group_cols,
            "n_events",
        )
    )


def sessionize(
    df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap_minutes: int = 30,
) -> DataFrame:
    """Gap-based sessionization via lag + running sum (the batch equivalent
    of F.session_window): a new session starts when the gap to the previous
    event of the same user exceeds ``gap_minutes``.

    One shuffle on user_id (both window specs share it — Spark reuses the
    exchange). Skewed power-users are bounded by per-user event counts, not
    corpus size. Output: one row per session with bounds and counts.
    """
    order = [F.col(ts_col).asc(), F.col("event_id").asc()]
    w = Window.partitionBy(user_col).orderBy(*order)
    gap_s = gap_minutes * 60
    prev_ts = F.lag(F.col(ts_col)).over(w)
    is_new = F.when(
        prev_ts.isNull()
        | ((F.unix_micros(F.col(ts_col)) - F.unix_micros(prev_ts)) > gap_s * 1_000_000),
        1,
    ).otherwise(0)
    with_sess = df.withColumn("session_seq", F.sum(is_new).over(w))
    return (
        with_sess.groupBy(user_col, "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            F.date_format(F.min(ts_col), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format(F.max(ts_col), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        )
    )


def session_window_agg(
    df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap: str = "30 minutes",
) -> DataFrame:
    """Native F.session_window variant — identical semantics to
    sessionize() for batch, and directly usable under readStream with
    withWatermark for streaming late-data handling."""
    return (
        df.groupBy(F.session_window(F.col(ts_col), gap).alias("w"), F.col(user_col))
        .agg(F.count("*").alias("n_events"))
        .select(
            user_col,
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format(F.col("w.end"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "n_events",
        )
    )


def extract_props_key(
    df: DataFrame, key: str = "k", props_col: str = "props"
) -> DataFrame:
    """JSON prop extraction (get_json_object — JVM-side JSON path)."""
    return df.withColumn(
        f"prop_{key}",
        F.get_json_object(F.col(props_col), f"$.{key}").cast("int"),
    )
