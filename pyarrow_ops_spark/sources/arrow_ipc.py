"""Arrow IPC (Feather v2) file format as a Spark 4 Python DataSource.

The reference's whole world is ``pyarrow.Table`` files; Spark speaks
parquet/orc/csv/json natively but NOT the Arrow IPC file format. The
Python DataSource API (Spark 4) closes that gap without any JVM code:
the reader yields ``pyarrow.RecordBatch`` objects straight off the
memory-mapped file — zero row-wise Python, Arrow end-to-end — and the
writer emits one IPC file per partition.

Scale shape: one input partition per file (the IPC file format is not
block-splittable like parquet, so the file is the parallelism unit —
write many; the writer does, one per task). Batches stream through the
Arrow reader without materializing whole tables. Schema comes from the
first file's footer (metadata-only read).

Usage::

    register_arrow_ipc(spark)
    df = spark.read.format("arrowipc").load("/data/events_ipc")
    df.write.format("arrowipc").mode("append").save("/out/ipc")
"""

from __future__ import annotations

import glob as _glob
import os
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

_EXTS = (".arrow", ".feather", ".ipc")


def _list_files(path: str) -> list[str]:
    if os.path.isdir(path):
        out: list[str] = []
        for ext in _EXTS:
            out += _glob.glob(os.path.join(path, f"*{ext}"))
        return sorted(out)
    if any(ch in path for ch in "*?["):
        return sorted(_glob.glob(path))
    return [path]


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class ArrowIPCReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("arrowipc requires a path")
        self.files = _list_files(self.path)
        if not self.files:
            raise ValueError(f"no Arrow IPC files under {self.path!r}")

    def partitions(self):
        # one partition per file: IPC files are not block-splittable, so
        # the file is the unit of parallelism (the writer emits one per
        # task for exactly this reason)
        return [_FilePartition(f) for f in self.files]

    def read(self, partition):
        import pyarrow as pa
        import pyarrow.ipc as ipc

        # memory-map and stream record batches — Arrow end-to-end, no
        # per-row Python objects anywhere
        with pa.memory_map(partition.path, "r") as source:
            reader = ipc.open_file(source)
            for i in range(reader.num_record_batches):
                yield reader.get_batch(i)


class ArrowIPCWriter(DataSourceArrowWriter):
    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("arrowipc requires a path")
        self.overwrite = overwrite

    def write(self, iterator):
        import pyarrow as pa
        import pyarrow.ipc as ipc
        from pyspark import TaskContext

        os.makedirs(self.path, exist_ok=True)
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx else 0
        out = os.path.join(
            self.path, f"part-{pid:05d}-{uuid.uuid4().hex[:8]}.arrow"
        )
        # DataSourceArrowWriter hands the iterator over as RecordBatches —
        # Arrow on both sides of the exchange, no per-row Python
        writer = None
        try:
            for batch in iterator:
                if writer is None:
                    writer = ipc.new_file(out, batch.schema)
                writer.write_batch(batch)
        finally:
            if writer is not None:
                writer.close()
        return WriterCommitMessage()


class ArrowIPCDataSource(DataSource):
    """``spark.read.format("arrowipc")`` / ``df.write.format("arrowipc")``."""

    @classmethod
    def name(cls) -> str:
        return "arrowipc"

    def schema(self) -> StructType:
        import pyarrow.ipc as ipc

        from pyspark.sql.pandas.types import from_arrow_schema

        files = _list_files(self.options.get("path", ""))
        if not files:
            raise ValueError("arrowipc requires a path with IPC files")
        with ipc.open_file(files[0]) as r:
            return from_arrow_schema(r.schema)

    def reader(self, schema: StructType) -> ArrowIPCReader:
        return ArrowIPCReader(self.options)

    def writer(self, schema: StructType, overwrite: bool) -> ArrowIPCWriter:
        return ArrowIPCWriter(self.options, overwrite)


def register_arrow_ipc(spark) -> None:
    """Register the ``arrowipc`` format on this session (idempotent)."""
    spark.dataSource.register(ArrowIPCDataSource)


def read_arrow_ipc(spark, path: str):
    """Read Arrow IPC/Feather files as a DataFrame (registers on use)."""
    register_arrow_ipc(spark)
    return spark.read.format("arrowipc").load(path)
