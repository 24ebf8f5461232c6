"""Continuous-ingestion dedup: a document stream anti-joined against the
persistent digest index, with survivors enrolled batch-by-batch.

This is the streaming composition of two separately-certified lifecycles
(`functions.dedup.build_dedup_index` / `dedup_against_index` and the
Structured-Streaming IPC bridge): the production shape for a crawl
pipeline that ingests forever — every micro-batch checks its normalized
fingerprints against history, keeps only the unseen ones, and APPENDS
those digests to the index so later batches (and later RESTARTS — the
checkpoint carries the source offset) dedup against them without
rescanning history.

Scale/state story: the stream is unbounded but the mutable state is the
digest index — 16 bytes per distinct document, a partitioned parquet
dataset, never rescanned as text. Each batch costs one fingerprint
projection + one anti-join against the (broadcastable while small,
shuffled when not) digest set. Idempotence: re-delivered input (an
at-least-once source, a replayed file) is absorbed by the same anti-join
that handles real duplicates, so the EFFECT is exactly-once even when
delivery is not — the property that makes the pipeline restartable at
100 TB.

The reference has no streaming and no persisted index (SURVEY §2.2);
both are extension surfaces, composed here.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyarrow_ops_spark.functions.text import fingerprint


def stream_dedup_enroll(
    stream_df: DataFrame,
    index_path: str,
    sink_path: str,
    checkpoint: str,
    text_col: str = "text",
) -> None:
    """Run ``stream_df`` (availableNow) through per-batch
    dedup-against-index + enroll; surviving digests append to
    ``sink_path`` as parquet rows ``(fp)``.

    Per batch: distinct normalized fingerprints -> anti-join the index ->
    stage the survivors -> enroll the staged rows into the INDEX FIRST,
    then append them to the sink (never the lazy plan — enrolling a
    still-lazy survivor frame re-evaluates it against the index it is
    appending to; same discipline as ``dedup_index_lifecycle``). A digest
    therefore emits at most once across the whole stream, no matter how
    batches slice: its first batch enrolls it, every later occurrence
    anti-joins away.

    Crash-replay semantics (index-before-sink is deliberate): foreachBatch
    is at-least-once, so a crash mid-batch replays the batch. With the
    index written first, a replay after a partial batch finds the digests
    already enrolled and SUPPRESSES them — the sink never sees a digest
    twice (the dedup contract downstream consumers rely on). The cost is
    the dual window: a crash between the two writes loses that batch's
    sink rows (at-most-once for the sink over that window). The reverse
    order would instead re-emit the batch to the sink on replay —
    duplicate output from a dedup operator, the worse failure. Exactly-
    once for BOTH writes needs a transactional sink (e.g. a table format
    with atomic multi-file commit), out of scope for plain parquet."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_fp = batch_df.select(
            fingerprint(text_col).alias("fp")
        ).distinct()
        # refresh: this session appended to the index in earlier batches
        spark.catalog.refreshByPath(index_path)
        idx = spark.read.parquet(index_path).select("fp").distinct()
        survivors = batch_fp.join(idx, "fp", "anti")
        stage = tempfile.mkdtemp(prefix="spark_graft_ingest_stage_")
        try:
            survivors.write.mode("overwrite").parquet(stage)
            written = spark.read.parquet(stage)
            # index BEFORE sink: see the crash-replay note in the docstring
            written.write.mode("append").parquet(index_path)
            written.write.mode("append").parquet(sink_path)
        finally:
            shutil.rmtree(stage, ignore_errors=True)

    q = (
        stream_df.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
