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


def latest_snapshot_path(base_path: str) -> "str | None":
    """Path of the highest-version snapshot under ``base_path`` (dirs named
    ``v=<n>``), or None before the first commit. Local-FS listing here; on
    an object store this is one prefix listing (or a manifest read — the
    piece Delta/Iceberg add on top of exactly this layout)."""
    import os
    import re

    if not os.path.isdir(base_path):
        return None
    best, best_v = None, -1
    for name in os.listdir(base_path):
        m = re.fullmatch(r"v=(\d+)", name)
        if not m or int(m.group(1)) <= best_v:
            continue
        path = os.path.join(base_path, name)
        # only COMMITTED snapshots count — a torn dir (crash mid-write,
        # no _SUCCESS marker) must never become the merge base
        if os.path.exists(os.path.join(path, "_SUCCESS")):
            best_v, best = int(m.group(1)), path
    return best


def stream_upsert_sink(
    updates: DataFrame,
    base_path: str,
    key_cols: "list[str]",
    checkpoint_dir: str,
    delete_col: "str | None" = None,
    timeout_sec: int = 300,
) -> None:
    """Apply a CDC update stream onto a parquet snapshot — MERGE INTO as a
    streaming sink, no table format required. Each micro-batch reads the
    latest ``v=<n>`` snapshot, merges the batch with ``upsert`` (replace /
    insert / optional delete-flag), and commits snapshot ``v=<batch_id>``.

    Exactly-once: snapshots are named by batch_id, so a REPLAYED
    micro-batch (restart after a sink-side crash) finds its own ``v=``
    dir already present and skips — the idempotent-writer pattern
    ``foreach_batch_sink`` documents. Writes go to a fresh directory, so
    readers of the previous snapshot are never torn. Micro-batches run
    serially in Structured Streaming, so read-latest/merge/commit is
    race-free by construction. Drains with availableNow (finite CDC
    catch-up job); call again as new updates land — the checkpoint
    resumes from unread source files only.

    At 100 TB: each merge is the broadcast-anti-join plan ``upsert`` pins
    (small delta, no base shuffle); compact old ``v=`` dirs with
    ``compact_files`` and garbage-collect superseded versions on the
    retention schedule a real lakehouse would."""
    import os

    from pyarrow_ops_spark.operators.diff import upsert

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        out = os.path.join(base_path, f"v={batch_id}")
        # committed = _SUCCESS marker present, not mere directory existence:
        # Spark creates the dir (and partial part-files) BEFORE the job
        # commits, so a crash mid-write leaves a torn v= dir — treating it
        # as committed would base every later merge on corrupt data. Torn
        # dirs are removed and rewritten.
        if os.path.exists(os.path.join(out, "_SUCCESS")):
            return  # replayed batch: already committed
        if os.path.isdir(out):
            import shutil

            shutil.rmtree(out)
        spark = batch_df.sparkSession
        latest = latest_snapshot_path(base_path)
        data_cols = [c for c in batch_df.columns if c != delete_col]
        if latest is None:
            base = batch_df.sparkSession.createDataFrame(
                [], batch_df.select(*data_cols).schema
            )
        else:
            base = spark.read.parquet(latest)
        merged = upsert(base, batch_df, key_cols, delete_col=delete_col)
        merged.write.mode("overwrite").parquet(out)

    run_available_now(
        updates,
        checkpoint_dir=checkpoint_dir,
        batch_writer=apply,
        timeout_sec=timeout_sec,
    )
