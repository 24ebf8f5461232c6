"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference has zero streaming (SURVEY §2.2); this is the Structured
Streaming extension point for operators the built-in windowed aggregations
can't express: arbitrary per-key state carried across micro-batches.

``running_user_totals`` keeps (n_events, sum_value) per user and emits the
updated totals every micro-batch — the canonical "running counter" shape.
State lives in the state store (RocksDB/HDFS-backed on a cluster), sized by
#distinct keys, not by events seen: the 100 TB story is that state is
O(users), the stream is unbounded, and a watermark-based timeout
(``GroupStateTimeout``) evicts idle keys.

The UDF closure is fully self-contained (pandas only) so executors that
don't have this repo on sys.path can deserialize it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from pyarrow_ops_spark.sources.tables import stream_table

_OUT_SCHEMA = "user_id bigint, n_events bigint, sum_value double"
_STATE_SCHEMA = "n bigint, total double"


def _update_totals(key, pdfs, state: GroupState):
    import pandas as pd

    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "sum_value": [round(total, 4)]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum(value)) maintained in keyed state.
    Works on a streaming DataFrame; each micro-batch emits the keys it
    touched with their new totals (update output mode)."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_totals,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def stream_events(spark, sf_dir: str, max_files_per_trigger: int = 1) -> DataFrame:
    """The events table as a file-source stream (same conditional
    timestamp handling as the batch loader — see ``stream_table``)."""
    return stream_table(spark, "events", sf_dir, max_files_per_trigger)


def stream_session_windows(
    spark,
    sf_dir: str,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming gap-based sessionization via the built-in
    ``session_window`` — the declarative twin of ``sessionize_batch``;
    the watermark lets Spark finalize and evict closed sessions."""
    ev = stream_events(spark, sf_dir).withWatermark("ts", watermark)
    return (
        ev.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


_SESS_OUT_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events bigint, sum_value double"
)
_SESS_STATE_SCHEMA = "start long, last long, n bigint, total double"


def _update_sessions(key, pdfs, state: GroupState):
    """Gap-based sessionization with ONE open session per key in state,
    closed either by an observed gap (later same-key data proves it —
    final when the source is globally time-ordered) or by an
    EVENT-TIME TIMEOUT once the watermark passes last_ts + gap.

    Self-contained (pandas only) so executors without this repo on
    sys.path can deserialize it. Timestamps travel as epoch micros in
    state; the 30-minute gap is inlined (1800 s)."""
    import pandas as pd

    GAP_US = 1_800 * 1_000_000

    def emit(start_us, last_us, n, total):
        return pd.DataFrame(
            {
                "user_id": [key[0]],
                "session_start": [pd.Timestamp(start_us, unit="us")],
                "session_end": [pd.Timestamp(last_us + GAP_US, unit="us")],
                "n_events": [n],
                "sum_value": [round(total, 4)],
            }
        )

    if state.hasTimedOut:
        start, last, n, total = state.get
        state.remove()
        yield emit(start, last, n, total)
        return

    rows = pd.concat(list(pdfs), ignore_index=True).sort_values("ts_us")
    cur = list(state.get) if state.exists else None
    for ts_us, value in zip(rows["ts_us"], rows["value"]):
        ts_us = int(ts_us)
        if cur is None:
            cur = [ts_us, ts_us, 1, float(value)]
        elif ts_us - cur[1] >= GAP_US:
            yield emit(*cur)
            cur = [ts_us, ts_us, 1, float(value)]
        else:
            cur[1] = ts_us
            cur[2] += 1
            cur[3] += float(value)
    state.update(tuple(cur))
    state.setTimeoutTimestamp((cur[1] + GAP_US) // 1000)


def session_totals_event_timeout(events: DataFrame) -> DataFrame:
    """CUSTOM stateful sessionization via ``applyInPandasWithState`` with
    ``GroupStateTimeout.EventTimeTimeout`` — the extension point beyond
    the built-in ``session_window``: arbitrary per-session state and an
    explicit watermark-driven eviction contract. Sessions close when
    later same-key data proves a >= 30 min gap, or when the event-time
    timeout fires (watermark > last_ts + gap) — so state is bounded by
    OPEN sessions only, and idle keys are evicted by the engine, not by
    a scan. Expects columns (user_id, value, ts_us, ts) with a watermark
    already applied on ``ts``."""
    return (
        events.select("user_id", "value", "ts_us", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_sessions,
            outputStructType=_SESS_OUT_SCHEMA,
            stateStructType=_SESS_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
