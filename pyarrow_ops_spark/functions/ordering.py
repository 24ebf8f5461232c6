"""Training-data ordering: contiguous row ids, deterministic corpus
shuffle, token-budget sequence packing.

The three operations every large-scale training pipeline needs between
"curated corpus" and "data loader":

- ``assign_row_ids``: contiguous global ids 0..n-1 in a given order — the
  naive ``row_number() OVER (ORDER BY ...)`` is a single-partition sort
  that dies at scale; this is the two-job distributed version.
- ``deterministic_shuffle``: a reproducible global permutation (training
  epoch order) derived from a content hash, not an RNG — the same
  permutation on any cluster size, auditable across reruns.
- ``pack_token_batches``: assign documents to fixed token-budget batches
  (sequence-packing approximation) shard-locally, so packing parallelizes
  across shards instead of serializing on a global cumulative sum.
"""

from __future__ import annotations

from typing import Iterator, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql import Window as W

_ROW_ID = "row_id"


def assign_row_ids(
    df: DataFrame,
    order_by: Sequence[str],
    id_col: str = _ROW_ID,
) -> DataFrame:
    """Contiguous global row ids 0..n-1 in ``order_by`` order, WITHOUT a
    single-partition sort.

    Plan: range-repartition + sort within partitions (the same shape as a
    distributed ORDER BY — each partition holds a contiguous key range),
    persist to pin the partition layout, then one tiny job counts rows per
    partition to build exclusive prefix offsets (driver state is one long
    per partition — bounded by partition count, not data), and a map-only
    ``mapInPandas`` adds offset + local index. Equivalent to
    ``row_number() OVER (ORDER BY ...) - 1`` (the oracle) but the sort,
    counting, and id-stamping all run distributed; nothing larger than the
    offsets array ever reaches the driver.

    ``order_by`` must be a total order (include a unique tiebreaker
    column) or ids within ties are partition-placement-dependent.
    """
    from pyspark import StorageLevel, TaskContext

    # Range partition count: NOT pinned to a constant (r14). An explicit
    # ``defaultParallelism`` was wrong at both ends — 32 fixed-overhead
    # tasks per stage for a corpus numpy sorts in milliseconds locally,
    # and far too few partitions at warehouse scale. With no explicit
    # count, AQE sizes the range exchange from the data (coalescing
    # adjacent ranges toward the advisory partition size), which
    # preserves the global order and scales both directions; the persist
    # then pins the chosen layout so the offsets job and the stamping
    # pass see identical partition ids.
    d = (
        df.repartitionByRange(*[F.col(c) for c in order_by])
        .sortWithinPartitions(*order_by)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    counts = {
        r["pid"]: r["n"]
        for r in d.select(F.spark_partition_id().alias("pid"))
        .groupBy("pid")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(id_col, T.LongType(), False)]
    )

    def stamp(batches: Iterator) -> Iterator:
        # offsets is a small dict captured by value (driver-proof closure);
        # the iterator preserves the partition's sorted order, so the
        # running local index is the within-partition rank.
        pid = TaskContext.get().partitionId()
        base = offsets.get(pid, 0)
        seen = 0
        for pdf in batches:
            pdf[id_col] = range(base + seen, base + seen + len(pdf))
            seen += len(pdf)
            yield pdf

    return d.mapInPandas(stamp, schema=out_schema)


def shuffle_key(key_cols: Sequence[str], seed: str = "") -> Column:
    """The permutation key: md5 over the salted, joined key columns.
    Pure content hash — no RNG, no partition dependence; any engine
    computes the same order (DuckDB oracles run the same expression)."""
    parts = [F.lit(seed)] if seed else []
    parts += [F.col(c).cast("string") for c in key_cols]
    return F.md5(F.concat_ws("|", *parts))


def deterministic_shuffle(
    df: DataFrame,
    key_cols: Sequence[str],
    seed: str = "",
    id_col: str = _ROW_ID,
) -> DataFrame:
    """Reproducible global shuffle: permute rows by content hash and assign
    contiguous epoch ids. ``seed`` rotates the permutation per epoch.
    Scale shape = ``assign_row_ids`` over the hash order (range shuffle +
    map-only stamping); nothing collects beyond per-partition counts."""
    keyed = df.withColumn("__shuffle_key", shuffle_key(key_cols, seed))
    return assign_row_ids(keyed, ["__shuffle_key"], id_col=id_col).drop(
        "__shuffle_key"
    )


def pack_token_batches(
    df: DataFrame,
    token_col: str,
    budget: int,
    key_cols: Sequence[str],
    n_shards: int = 16,
    seed: str = "",
) -> DataFrame:
    """Assign each document to a (shard, batch_id) so every batch holds
    consecutive documents whose ``token_col`` sum stays near ``budget`` —
    the greedy sequence-packing approximation used to build fixed-size
    training batches.

    A single global cumulative sum would serialize the whole corpus
    through one partition; instead documents hash into ``n_shards`` shards
    (first hex chars of the content hash — engine-reproducible like
    ``operators/sample.py``) and the running sum + batch split runs as a
    window WITHIN each shard, parallel across shards. batch_id =
    floor((cumsum - tokens) / budget): a document starts a new batch when
    the budget is already consumed, and oversized documents get a batch of
    their own rather than being dropped.
    """
    if n_shards < 1 or n_shards > 256:
        raise ValueError("n_shards must be in [1, 256]")
    # shard = hex-prefix of the hash, so the actual shard count rounds up
    # to 16 (1 char) or 256 (2 chars) — string prefixes keep the shard
    # derivation engine-reproducible (no hex->int conversion needed)
    hexlen = 1 if n_shards <= 16 else 2
    key = shuffle_key(key_cols, seed)
    shard = F.substring(key, 1, hexlen).alias("shard")
    d = df.withColumn("__pack_key", key).withColumn("shard", shard)
    w = (
        W.partitionBy("shard")
        .orderBy("__pack_key")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cumsum = F.sum(F.col(token_col)).over(w)
    return (
        d.withColumn(
            "batch_id",
            F.floor((cumsum - F.col(token_col)) / F.lit(budget)).cast("bigint"),
        )
        .drop("__pack_key")
    )


def curriculum_order(
    df: DataFrame,
    score_col: str,
    key_cols: Sequence[str],
    n_buckets: int = 4,
    *,
    descending: bool = True,
    seed: str = "",
    id_col: str = "train_order",
) -> DataFrame:
    """Curriculum training order: band documents by a NORMALIZED score in
    [0, 1] (e.g. ``quality_score``) into ``n_buckets`` fixed-width bands,
    emit the bands in curriculum order (``descending=True`` = cleanest
    first), deterministically shuffled WITHIN each band so the model
    never sees a secondary sort artifact. Appends ``curriculum_bucket``
    and contiguous ``id_col`` ids 0..n-1.

    Fixed-width bands (``floor(score*n) `` clamped to n-1), NOT quantile
    bands: banding stays a map-only expression any engine reproduces
    bit-for-bit, where quantile cutoffs are order statistics whose
    last-ulp interpolation differs across engines and whose exact
    computation is a global sort. Id assignment rides
    ``assign_row_ids`` (range shuffle + per-partition offsets — no
    single-partition ORDER BY); the within-band order is the same
    content-hash permutation as ``deterministic_shuffle``, so the whole
    order is a pure function of row content + seed."""
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    b = F.least(
        F.floor(F.col(score_col) * n_buckets).cast("int"), F.lit(n_buckets - 1)
    )
    b = F.greatest(b, F.lit(0))
    pos = (F.lit(n_buckets - 1) - b) if descending else b
    keyed = (
        df.withColumn("curriculum_bucket", b)
        .withColumn("__cpos", pos)
        .withColumn("__csk", shuffle_key(key_cols, seed))
    )
    return assign_row_ids(keyed, ["__cpos", "__csk"], id_col=id_col).drop(
        "__cpos", "__csk"
    )
