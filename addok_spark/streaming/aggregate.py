"""Structured Streaming analytics over transcript/event streams.

The reference has no streaming path (its incremental unit is the
per-document ``_action``); these operators are the Spark-native
extension for continuous corpora: watermarked tumbling/sliding
windows and session windows with late-data handling, usable both on
``readStream`` sources and (identically) on batch DataFrames — the
same code, which is how correctness is oracle-checked
(``entry_queries.events_hourly`` / ``events_sessionize`` are the
batch twins)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_turn_counts(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "role",
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling (or sliding) windowed counts per key with a watermark
    for late data. On a stream: emits append-mode results once the
    watermark passes; on a batch df: same aggregation, no watermark
    semantics needed."""
    src = df
    if df.isStreaming:
        src = df.withWatermark(ts_col, watermark)
    win = (
        F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    )
    return (
        src.groupBy(win.alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col,
            "n",
        )
    )


def session_windows(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "conv_id",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Gap-based session windows per key (built-in session_window —
    the declarative form of applyInPandasWithState sessionization)."""
    src = df
    if df.isStreaming:
        src = df.withWatermark(ts_col, watermark)
    return (
        src.groupBy(F.session_window(ts_col, gap).alias("s"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            key_col,
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_events",
        )
    )


def event_context(
    df: DataFrame,
    n: int = 3,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "event_type",
) -> DataFrame:
    """Previous-``n`` context assembly per event — the training-pair
    construction pattern (each turn paired with its preceding
    conversation window) recast over the events table.

    One window over (key, ts, id) with a bounded ROWS frame: the
    shuffle is the window's partitioning on ``key_col`` (many small
    groups — users/conversations — so parallelism follows key
    cardinality and no task ever holds more than one key's run; at
    100 TB this is the same per-conversation locality the index build
    already exploits). The frame order is total ((ts, id) with id
    unique), so the concatenated context string is deterministic on
    any engine. Returns (event_id, user_id, n_prev, prev_context).
    """
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, id_col)
        .rowsBetween(-n, -1)
    )
    ctx = F.collect_list(value_col).over(w)
    return df.select(
        F.col(id_col),
        F.col(key_col),
        F.size(ctx).cast("long").alias("n_prev"),
        F.concat_ws(" ", ctx).alias("prev_context"),
    )


def run_stream_to_memory(stream_df: DataFrame, name: str, checkpoint: str):
    """availableNow-triggered run into an in-memory sink (tests /
    smoke); production targets writeTo(iceberg)/kafka the same way."""
    # complete mode: bounded test data never advances the watermark
    # far enough for append-mode windows to finalize
    return (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
