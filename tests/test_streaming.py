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
