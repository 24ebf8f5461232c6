"""Stream-stream joins with watermark-bounded state.

The reference has no streaming at all (SURVEY §2.2); this is the
Structured-Streaming completion of the interval-join surface
(`operators/asof.py`, `interval_join_attribution`): the SAME declarative
join runs on batch DataFrames and on two live streams — Spark picks
StreamingSymmetricHashJoinExec for the latter and uses the watermarks plus
the time-range join condition to evict state.

Scale/state story: without the time bound, a stream-stream join must keep
EVERY past row of both sides forever. With `p_ts BETWEEN v_ts AND v_ts +
window` and watermarks on both inputs, each side's state is bounded by
(arrival rate x (watermark + window)) — constant in stream length. That is
the difference between a join that survives a year of uptime and one that
OOMs in an hour.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyarrow_ops_spark.sources.tables import load_table, stream_table


def attribution_join(
    views: DataFrame,
    purchases: DataFrame,
    user_col: str = "user_id",
    window: str = "1 hour",
) -> DataFrame:
    """Attribute each purchase to the views by the same user in the
    preceding ``window``. Works identically on batch and streaming inputs
    (for streams, apply ``withWatermark`` to both sides first — see
    ``stream_events_by_type``); the time-range predicate is what lets the
    streaming join evict state.

    Expects the prefixed shape produced by ``_prefix`` (``v_ts``/``p_ts``
    etc.) so the self-join of the events table is clash-free.
    """
    cond = (
        (views["v_user"] == purchases["p_user"])
        & (purchases["p_ts"] >= views["v_ts"])
        & (purchases["p_ts"] <= views["v_ts"] + F.expr(f"INTERVAL {window}"))
    )
    return views.join(purchases, cond, "inner").select(
        F.col("v_user").alias(user_col),
        "v_event_id",
        "p_event_id",
        "v_ts",
        "p_ts",
    )


def _prefix(df: DataFrame, tag: str) -> DataFrame:
    return df.select(
        F.col("user_id").alias(f"{tag}_user"),
        F.col("event_id").alias(f"{tag}_event_id"),
        F.col("ts").alias(f"{tag}_ts"),
    )


def events_by_type_batch(spark, sf_dir: str, event_type: str, tag: str) -> DataFrame:
    """Batch twin of ``stream_events_by_type`` — same filter, same shape."""
    ev = load_table(spark, "events", sf_dir)
    return _prefix(ev.filter(F.col("event_type") == event_type), tag)


def stream_events_by_type(
    spark,
    sf_dir: str,
    event_type: str,
    tag: str,
    watermark: str = "2 hours",
) -> DataFrame:
    """File-streamed events of one type, prefixed and watermarked, ready
    for ``attribution_join``. Timestamp handling is conditional on the
    on-disk parquet type, exactly like the batch loader (``stream_table``)."""
    stream = stream_table(spark, "events", sf_dir)
    filtered = _prefix(stream.filter(F.col("event_type") == event_type), tag)
    return filtered.withWatermark(f"{tag}_ts", watermark)
