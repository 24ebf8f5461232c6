"""Streaming sinks: foreachBatch bridging and availableNow backfill.

The reference is batch-only (SURVEY §2.2 'Streaming'); these helpers
complete the ``readStream -> transform -> writeStream`` loop for sinks
Structured Streaming doesn't speak natively.

- ``foreach_batch_sink``: run any BATCH writer (an arbitrary
  ``DataFrame -> None`` callable — JDBC upserts, dedup-merge writes,
  multi-table fan-out) once per micro-batch. The batch_id makes retried
  micro-batches idempotent: a sink that records (batch_id) can skip
  replays, which is how exactly-once lands on at-least-once storage.
- ``run_available_now``: process everything currently in the source, then
  stop — the standard backfill/catch-up trigger (``Trigger.AvailableNow``)
  that runs a streaming pipeline as a finite job with the SAME code,
  watermarks, and state semantics as the continuous deployment. At 100 TB
  this is the nightly "drain the new files" mode: checkpointed progress
  means each run reads only files not yet committed.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame


def foreach_batch_sink(
    stream: DataFrame,
    batch_writer: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
    output_mode: str = "append",
    query_name: str | None = None,
):
    """Attach a batch-writer sink to a streaming DataFrame.

    ``batch_writer(batch_df, batch_id)`` is invoked on the driver once per
    micro-batch with a BATCH DataFrame — every batch API (writers,
    ``write.jdbc``, merges, multiple actions) is legal inside. Returns the
    started ``StreamingQuery`` (caller awaits/stops it).

    The checkpoint directory is mandatory, not optional: it holds the
    offset log that makes restarts resume instead of reprocess, and the
    commit log that pairs with idempotent writers for exactly-once."""
    writer = (
        stream.writeStream.foreachBatch(batch_writer)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
    )
    if query_name:
        writer = writer.queryName(query_name)
    return writer.start()


def run_available_now(
    stream: DataFrame,
    checkpoint_dir: str,
    batch_writer: Callable[[DataFrame, int], None] | None = None,
    format: str = "memory",
    query_name: str = "available_now",
    output_mode: str = "append",
    timeout_sec: int = 300,
) -> None:
    """Drain everything currently available in the source and stop
    (``trigger(availableNow=True)``) — streaming semantics (watermarks,
    state, exactly-once bookkeeping) as a finite batch-style job.

    With ``batch_writer`` the sink is foreachBatch; otherwise ``format``
    (default the in-memory table ``query_name``, for tests/inspection)."""
    writer = stream.writeStream.trigger(availableNow=True).option(
        "checkpointLocation", checkpoint_dir
    )
    if batch_writer is not None:
        writer = writer.foreachBatch(batch_writer)
    else:
        writer = writer.format(format).queryName(query_name)
    q = writer.outputMode(output_mode).start()
    # awaitTermination(timeout) returns False on timeout with the query
    # STILL RUNNING — returning then would leak the stream and let callers
    # read a partially-drained sink as if the backfill completed. Stop the
    # query and fail loudly instead.
    if not q.awaitTermination(timeout_sec):
        q.stop()
        raise TimeoutError(
            f"availableNow drain did not finish within {timeout_sec}s; "
            "query stopped — sink contents are partial"
        )
