"""Time-window operators over the ``events`` stream table.

The reference is batch-only (SURVEY §2.2 'Streaming'); this module adds the
Structured-Streaming slice of the north star. Every windowed aggregation is
defined ONCE as a transformation function and applied identically to a
batch DataFrame (for the DuckDB-oracle correctness gate) and a streaming
DataFrame (``readStream`` + watermark; tested with the memory sink in
``tests/test_streaming.py``) — the same Catalyst plan serves both, which is
the point of Structured Streaming.

Scale notes: tumbling/sliding aggregation is a single keyed shuffle with
partial aggregation; the watermark bounds state size for late data;
sessionization in batch is a window-function pass (shuffle on user), in
streaming it maps to ``session_window`` with the same gap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyarrow_ops_spark.sources.tables import stream_table


def _windowed(df: DataFrame, duration: str, slide: str | None = None) -> DataFrame:
    win = F.window("ts", duration, slide) if slide else F.window("ts", duration)
    return (
        df.groupBy(win.alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def tumbling_counts(df: DataFrame, duration: str = "1 hour") -> DataFrame:
    """Tumbling-window counts/sums per event_type."""
    return _windowed(df, duration)


def sliding_counts(df: DataFrame, duration: str = "1 hour", slide: str = "30 minutes") -> DataFrame:
    """Sliding-window counts/sums per event_type (each event lands in
    duration/slide windows)."""
    return _windowed(df, duration, slide)


def sessionize_batch(df: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Batch sessionization: a new session starts when the gap since the
    user's previous event exceeds ``gap_minutes``. One shuffle on user_id;
    streaming equivalent is ``F.session_window(ts, gap)``."""
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # microsecond epoch keeps sub-second gaps exact (cast-to-seconds would
    # truncate and disagree with fractional-second engines). unix_micros
    # requires an instant (rejects TIMESTAMP_NTZ, which parquet scans can
    # yield); under the session's pinned UTC zone the NTZ->LTZ cast is the
    # identity on the wall-clock value, so gaps are unaffected.
    micros = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    gap = micros - F.lag(micros).over(w)
    new_session = F.when(
        gap.isNull() | (gap > gap_minutes * 60 * 1_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    sessioned = df.withColumn(
        "session_seq",
        F.sum(new_session).over(
            W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
                W.unboundedPreceding, W.currentRow
            )
        ),
    )
    return (
        sessioned.groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


def stream_tumbling_counts(
    spark,
    sf_dir: str,
    duration: str = "1 hour",
    watermark: str = "2 hours",
):
    """Streaming variant: parquet source streamed file-by-file, watermarked
    tumbling aggregation. Returns the streaming DataFrame (caller attaches
    a sink; tests use format('memory') + processAllAvailable)."""
    stream = stream_table(spark, "events", sf_dir)
    return tumbling_counts(stream.withWatermark("ts", watermark), duration)


def stream_dedup(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming deduplication: keep the first arrival per key, dropping
    re-deliveries that arrive within the watermark horizon
    (``dropDuplicatesWithinWatermark``). This is the streaming twin of
    ``operators.dedup.drop_duplicates(keep='first')`` and the standard
    guard for at-least-once sources (Kafka replays, file re-lists).

    Scale/state story: unlike plain ``dropDuplicates`` on a stream (whose
    state grows forever), the watermark bounds state to keys seen within
    the horizon — state size tracks key arrival rate x horizon, not stream
    length. Works on any batch DataFrame too (falls back to plain
    dropDuplicates semantics at the watermark boundary)."""
    return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(key_cols)
