"""Parquet sources for the synthetic star schema (see TESTDATA.md).

The reference library has no I/O layer at all — tables arrive via
``pa.Table.from_pydict`` in caller code (reference ``test_func.py:5-8``);
file reading is delegated to pyarrow outside the repo. Here the scan IS the
engine's front door: ``spark.read.parquet`` gives columnar reads, predicate
pushdown, column pruning, and partition pruning for free, all of which
matter at 100 TB (the reference's eager whole-table materialization cannot
scale past one node's RAM).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Dimension tables small enough to broadcast at any realistic scale factor
# (region=5 rows, nation=25 rows even at 100 TB — they are fixed-cardinality).
BROADCASTABLE = frozenset({"region", "nation", "supplier", "part", "customer"})


def _nanos_timestamp_columns(path: str) -> list[str]:
    """Columns stored as TIMESTAMP(NANOS) — Spark reads them as int64 ns
    (``spark.sql.legacy.parquet.nanosAsLong``); we restore them to µs
    timestamps. Footer-only read, negligible cost."""
    import pyarrow.parquet as pq
    import pyarrow.types as pat

    try:
        schema = pq.read_schema(path)
    except Exception:
        return []
    return [
        f.name
        for f in schema
        if pat.is_timestamp(f.type) and f.type.unit == "ns"
    ]


# Auto-scaled shuffle width: 256 KiB of on-disk (zstd) parquet per initial
# shuffle partition, capped. Rationale (benchmarks/keep_drop_ab_r9.json):
# at sf10 (~863 MB lineitem) a 2048-wide start holds dedup_keep_drop's
# task-time exponent at 1.08 vs 1.22 at the fixed 256 default — per-task
# aggregate state must stay bounded as input grows, and AQE coalesces the
# wide start back down for free at small scale. 256 KiB/partition puts
# sf10 lineitem at ~3.3k initial partitions (the proven arm's regime)
# while sf0.1 (~11 MB) stays at the session default.
_BYTES_PER_INITIAL_PARTITION = 256 * 1024
_MAX_INITIAL_PARTITIONS = 4096
_INITIAL_PARTITIONS_CONF = (
    "spark.sql.adaptive.coalescePartitions.initialPartitionNum"
)


_INPUT_BYTES_CACHE: dict[str, int] = {}


def _input_bytes(path: str) -> int:
    """On-disk bytes under ``path``, memoized per resolved path — the
    warehouse tables are immutable within a run, and re-walking a
    many-file directory on every ``load_table`` call is measurable
    filesystem churn. (A process that rewrites a table in place can
    clear ``_INPUT_BYTES_CACHE``; nothing in this repo does.)"""
    key = os.path.abspath(path)
    cached = _INPUT_BYTES_CACHE.get(key)
    if cached is not None:
        return cached
    total = _input_bytes_uncached(path)
    _INPUT_BYTES_CACHE[key] = total
    return total


def _input_bytes_uncached(path: str) -> int:
    if os.path.isdir(path):
        total = 0
        for root, _dirs, files in os.walk(path):
            for fn in files:
                if not fn.startswith(("_", ".")):
                    try:
                        total += os.path.getsize(os.path.join(root, fn))
                    except OSError:
                        pass
        return total
    try:
        return os.path.getsize(path)
    except OSError:
        return 0


def _autoscale_initial_partitions(spark: SparkSession, path: str) -> None:
    """Ratchet AQE's initial shuffle width up with input size (monotone
    per session, never down — AQE coalescing makes over-width free while
    under-width is a measured super-linear cliff). Skipped when the user
    pinned SPARK_GRAFT_INITIAL_PARTITIONS explicitly."""
    if os.environ.get("SPARK_GRAFT_INITIAL_PARTITIONS"):
        return
    target = min(
        _MAX_INITIAL_PARTITIONS, _input_bytes(path) // _BYTES_PER_INITIAL_PARTITION
    )
    if target <= 0:
        return
    try:
        current = int(spark.conf.get(_INITIAL_PARTITIONS_CONF))
    except Exception:
        # unset on plain sessions: AQE falls back to shuffle.partitions
        try:
            current = int(spark.conf.get("spark.sql.shuffle.partitions"))
        except Exception:
            current = 200
    if target > current:
        spark.conf.set(_INITIAL_PARTITIONS_CONF, str(target))


def load_table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    """Load one star-schema table from parquet.

    SESSION-WIDE SIDE EFFECT: loading a table ratchets
    ``spark.sql.adaptive.coalescePartitions.initialPartitionNum`` up with
    the table's on-disk size (monotone, never down) — one sf10 load in a
    shared session permanently widens the initial shuffle width for later
    small queries too. Benign under AQE (coalescing shrinks over-wide
    starts for free) but surprising in A/B harnesses: pin arms with
    ``SPARK_GRAFT_INITIAL_PARTITIONS`` (disables the ratchet) instead of
    ``spark.conf.set``, which the next ``load_table`` out-ratchets."""
    sf_dir = sf_dir or DEFAULT_SF_DIR
    path = os.path.join(sf_dir, f"{name}.parquet")
    # Defensive runtime confs — the caller's session may not come from our
    # factory (e.g. the correctness driver builds its own). Both are
    # runtime-settable SQL confs.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    _autoscale_initial_partitions(spark, path)
    ns_cols = _nanos_timestamp_columns(path)
    if ns_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    for c in ns_cols:
        # integer division keeps full precision (ns values exceed 2^53)
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    # Schema parity with stream_table: parquet timestamp[us] reads back as
    # TIMESTAMP_NTZ; cast to TIMESTAMP (LTZ) exactly like the streaming
    # twin so batch/stream comparisons share one schema. Under the pinned
    # UTC session zone the cast is the identity on the wall-clock value.
    for f in df.schema.fields:
        if isinstance(f.dataType, T.TimestampNTZType):
            df = df.withColumn(f.name, F.col(f.name).cast("timestamp"))
    return df


def stream_table(
    spark: SparkSession,
    name: str,
    sf_dir: str | None = None,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """The file-source streaming twin of ``load_table``: same path, same
    schema, same timestamp handling. Timestamp conversion is CONDITIONAL,
    exactly like the batch loader — only columns whose on-disk parquet type
    is TIMESTAMP(NANOS) (which Spark reads back as int64 under
    ``nanosAsLong``) get the ``timestamp_micros(div 1000)`` wrap; columns
    already stored as timestamp[us] (every driver-generated
    ``events.parquet``) stream through untouched."""
    sf_dir = sf_dir or DEFAULT_SF_DIR
    path = os.path.join(sf_dir, f"{name}.parquet")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ns_cols = _nanos_timestamp_columns(path)
    if ns_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = spark.read.parquet(path).schema
    stream = (
        spark.readStream.schema(raw_schema)
        .format("parquet")
        .option("pathGlobFilter", f"{name}.parquet")
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .load(sf_dir)
    )
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    for c in ns_cols:
        stream = stream.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    # Watermarks require TIMESTAMP (with local time zone); parquet
    # timestamp[us] reads back as TIMESTAMP_NTZ. Under the pinned UTC
    # session zone the NTZ->LTZ cast is the identity on the wall-clock
    # value, so windows/gaps are unaffected.
    for f in stream.schema.fields:
        if isinstance(f.dataType, T.TimestampNTZType):
            stream = stream.withColumn(f.name, F.col(f.name).cast("timestamp"))
    return stream


def load_tables(
    spark: SparkSession, sf_dir: str | None = None, names: tuple[str, ...] = TABLE_NAMES
) -> dict[str, DataFrame]:
    return {name: load_table(spark, name, sf_dir) for name in names}


def register_views(
    spark: SparkSession, sf_dir: str | None = None, names: tuple[str, ...] = TABLE_NAMES
) -> None:
    """Register each table as a temp view so operators can be written in SQL."""
    for name in names:
        load_table(spark, name, sf_dir).createOrReplaceTempView(name)


# ---------------------------------------------------------------------------
# Generic sources/sinks (the reference has none — SURVEY §2.2)
# ---------------------------------------------------------------------------

_FORMATS = ("parquet", "csv", "json", "orc", "text")


def read_source(
    spark: SparkSession,
    path: str,
    format: str = "parquet",
    schema=None,
    **options,
) -> DataFrame:
    """Read a file source. CSV defaults to header+inferSchema only when no
    explicit schema is given — at scale ALWAYS pass a schema: inference
    runs an extra full scan of the data before the real job.

    ``format='text'`` is the raw-corpus path: one row per line in a
    ``value`` string column (pass ``wholetext='true'`` for one row per
    FILE — the file-per-document crawl layout; pair with
    ``read_binary_files`` when you also need paths/sizes). Line splitting
    happens at arbitrary byte offsets per HDFS-style split, so text scans
    parallelize like any other file source."""
    if format not in _FORMATS:
        raise ValueError(f"unsupported source format {format!r}; one of {_FORMATS}")
    reader = spark.read.format(format)
    if format == "csv":
        reader = reader.option("header", options.pop("header", "true"))
        if schema is None:
            reader = reader.option("inferSchema", "true")
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def write_sink(
    df: DataFrame,
    path: str,
    format: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    **options,
) -> None:
    """Write a DataFrame to a file sink. ``partition_by`` produces
    hive-style directory partitioning — the layout that enables partition
    pruning on later scans (the 100 TB reason to partition by a low-
    cardinality filter column like date)."""
    if format not in _FORMATS:
        raise ValueError(f"unsupported sink format {format!r}; one of {_FORMATS}")
    writer = df.write.format(format).mode(mode)
    if format == "csv":
        writer = writer.option("header", options.pop("header", "true"))
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save(path)


def sql(spark: SparkSession, query: str, sf_dir: str | None = None,
        names: tuple[str, ...] = TABLE_NAMES) -> DataFrame:
    """The SQL front door: register the warehouse tables as temp views and
    run ``query`` through ``spark.sql``. Any ANSI query that runs here runs
    unchanged on another SQL engine over the same parquet — the
    ``sql_frontend_*`` registry entries execute byte-identical text on
    Spark and the DuckDB oracle. View registration is metadata-only (no
    scan); Catalyst sees through views, so pushdown/pruning/broadcast all
    apply exactly as in the DataFrame API."""
    register_views(spark, sf_dir, names)
    return spark.sql(query)


def read_binary_files(
    spark: SparkSession,
    path: str,
    pattern: str | None = None,
    recursive: bool = False,
) -> DataFrame:
    """Ingest raw media/blob files as rows via Spark's ``binaryFile``
    source: (path, modificationTime, length, content binary) — the
    ingestion front of the multimodal pipeline (pair with
    ``functions.multimodal.with_media_metadata`` / ``extract_features``).

    Scale notes: the source parallelizes across files (one file is never
    split), so many small blobs beat one giant tar; metadata-only queries
    (path/length filters) still read file contents — filter on
    ``pathGlobFilter`` here instead so pruning happens at listing time."""
    reader = spark.read.format("binaryFile")
    if pattern:
        reader = reader.option("pathGlobFilter", pattern)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    return reader.load(path)


def write_training_shards(
    df: DataFrame,
    path: str,
    order_col: str = "train_order",
    n_shards: int = 16,
    mode: str = "overwrite",
) -> None:
    """Persist an ordered corpus (see ``curriculum_order`` /
    ``deterministic_shuffle``) as ``n_shards`` parquet files, each holding
    a CONTIGUOUS ``order_col`` range in sorted order — the layout a
    training data loader wants: shard k streams sequentially, shards
    together cover the epoch exactly once, and global order is
    reconstructable by concatenating shards in file order.

    One range exchange + within-partition sort (the cost of any
    distributed ORDER BY-write); no single-partition funnel, no driver
    materialization. At 100 TB pick ``n_shards`` so each file lands in
    the 0.5-2 GB band object stores and loaders like."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    (
        df.repartitionByRange(n_shards, F.col(order_col))
        .sortWithinPartitions(order_col)
        .write.mode(mode)
        .parquet(path)
    )
