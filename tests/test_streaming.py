"""Structured Streaming slice: the streaming windowed aggregation must
produce the same result as its batch twin (same transformation, memory
sink, processAllAvailable)."""

from __future__ import annotations

import pytest

from pyarrow_ops_spark.sources.tables import load_table
from pyarrow_ops_spark.streaming.windows import (
    sessionize_batch,
    sliding_counts,
    stream_tumbling_counts,
    tumbling_counts,
)
from tests.conftest import SF_DIR


def rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_stream_tumbling_equals_batch(spark):
    batch = tumbling_counts(load_table(spark, "events", SF_DIR), "1 hour")
    stream = stream_tumbling_counts(spark, SF_DIR, "1 hour", watermark="10 hours")
    q = (
        stream.writeStream.outputMode("complete")
        .format("memory")
        .queryName("tumbling_out")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql("SELECT * FROM tumbling_out")
        assert rows(got) == rows(batch)
    finally:
        q.stop()


def test_sliding_windows_multiply_events(spark):
    ev = load_table(spark, "events", SF_DIR)
    tumb = tumbling_counts(ev, "1 hour")
    slide = sliding_counts(ev, "1 hour", "30 minutes")
    # every event lands in exactly 2 sliding windows
    n_t = sum(r.n_events for r in tumb.collect())
    n_s = sum(r.n_events for r in slide.collect())
    assert n_s == 2 * n_t


def test_sessionize_covers_all_events(spark):
    ev = load_table(spark, "events", SF_DIR)
    sess = sessionize_batch(ev, gap_minutes=30)
    assert sum(r.n_events for r in sess.collect()) == ev.count()
    # session bounds are ordered
    assert all(r.session_start <= r.session_end for r in sess.collect())


def test_stateful_running_totals_match_batch(spark):
    from pyspark.sql import functions as F
    from pyarrow_ops_spark.streaming.stateful import (
        running_user_totals,
        stream_events,
    )

    ev = load_table(spark, "events", SF_DIR)
    batch = {
        r.user_id: (r.n, round(r.total, 4))
        for r in ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    stream = running_user_totals(stream_events(spark, SF_DIR))
    q = (
        stream.writeStream.outputMode("update")
        .format("memory")
        .queryName("stateful_out")
        .start()
    )
    try:
        q.processAllAvailable()
        # last emission per user == final state == batch totals
        got = spark.sql(
            "SELECT user_id, max_by(n_events, n_events) AS n, "
            "max_by(sum_value, n_events) AS total "
            "FROM stateful_out GROUP BY user_id"
        )
        final = {r.user_id: (r.n, round(r.total, 4)) for r in got.collect()}
        assert final == batch
    finally:
        q.stop()


def test_stream_session_window_covers_all_events(spark):
    from pyarrow_ops_spark.streaming.stateful import stream_session_windows

    ev = load_table(spark, "events", SF_DIR)
    stream = stream_session_windows(spark, SF_DIR, gap="30 minutes", watermark="10 hours")
    q = (
        stream.writeStream.outputMode("complete")
        .format("memory")
        .queryName("session_out")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql("SELECT * FROM session_out").collect()
        assert sum(r.n_events for r in got) == ev.count()
        assert all(r.session_start < r.session_end for r in got)
    finally:
        q.stop()


def test_stream_dedup_within_watermark_drops_redeliveries(spark, tmp_path):
    """Re-delivered events (same event_id, two micro-batches) survive only
    once; distinct ids all survive."""
    from pyarrow_ops_spark.streaming.windows import stream_dedup

    base = [(i, "2024-01-01 10:00:00", float(i)) for i in range(10)]
    redelivered = [(i, "2024-01-01 10:00:00", float(i)) for i in range(5)]
    fresh = [(i, "2024-01-01 10:30:00", float(i)) for i in range(10, 15)]
    schema = "event_id long, ts_s string, value double"
    d = str(tmp_path / "stream_src")
    spark.createDataFrame(base, schema).coalesce(1).write.parquet(d)
    spark.createDataFrame(redelivered + fresh, schema).coalesce(1).write.mode(
        "append"
    ).parquet(d)

    raw = (
        spark.readStream.schema(spark.read.parquet(d).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(d)
    )
    from pyspark.sql import functions as F

    events = raw.withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
    deduped = stream_dedup(events, ["event_id"], "ts", watermark="2 hours")
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .start()
    )
    try:
        q.processAllAvailable()
        got = sorted(r.event_id for r in spark.sql("SELECT event_id FROM dedup_out").collect())
    finally:
        q.stop()
    assert got == list(range(15))


def test_stream_stream_join_equals_batch(spark):
    """Watermarked stream-stream interval join == the same join on batch:
    every purchase attributed to same-user views in the prior hour."""
    from pyarrow_ops_spark.streaming.joins import (
        attribution_join,
        events_by_type_batch,
        stream_events_by_type,
    )

    batch = attribution_join(
        events_by_type_batch(spark, SF_DIR, "view", "v"),
        events_by_type_batch(spark, SF_DIR, "purchase", "p"),
        window="1 hour",
    )
    stream = attribution_join(
        stream_events_by_type(spark, SF_DIR, "view", "v", watermark="10 hours"),
        stream_events_by_type(spark, SF_DIR, "purchase", "p", watermark="10 hours"),
        window="1 hour",
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("ss_join_out")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql("SELECT * FROM ss_join_out")
        assert rows(got) == rows(batch)
        assert batch.count() > 0  # non-vacuous
    finally:
        q.stop()
