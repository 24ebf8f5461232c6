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
