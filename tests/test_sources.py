"""Source/sink round-trips: parquet, csv, json, orc, and partitioned
writes with partition pruning."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from pyarrow_ops_spark.sources.tables import load_table, read_source, write_sink
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def nation(spark):
    return load_table(spark, "nation", SF_DIR)


def rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("fmt", ["parquet", "csv", "json", "orc"])
def test_roundtrip(spark, nation, tmp_path_factory, fmt):
    path = str(tmp_path_factory.mktemp("sink") / f"nation_{fmt}")
    write_sink(nation, path, format=fmt)
    back = read_source(spark, path, format=fmt, schema=nation.schema)
    assert rows(back) == rows(nation)


def test_bad_format_raises(spark, nation):
    with pytest.raises(ValueError):
        write_sink(nation, "/tmp/x", format="avro")
    with pytest.raises(ValueError):
        read_source(spark, "/tmp/x", format="avro")


def test_partitioned_write_prunes(spark, tmp_path_factory):
    orders = load_table(spark, "orders", SF_DIR).withColumn(
        "o_year", F.year("o_orderdate")
    )
    path = str(tmp_path_factory.mktemp("sink") / "orders_by_year")
    write_sink(orders, path, partition_by=["o_year"])
    # hive-style layout exists
    years = [d for d in os.listdir(path) if d.startswith("o_year=")]
    assert len(years) > 1
    back = read_source(spark, path).filter(F.col("o_year") == 1995)
    plan = back._jdf.queryExecution().executedPlan().toString()
    # partition pruning: the scan reads only the matching directory
    assert back.count() == orders.filter(F.col("o_year") == 1995).count()
    assert "PartitionFilters: [isnotnull(o_year" in plan or "o_year#" in plan


def test_read_binary_files_roundtrip(spark, tmp_path):
    from pyarrow_ops_spark.sources.tables import read_binary_files
    from pyarrow_ops_spark.functions.multimodal import with_media_metadata

    payloads = {f"blob_{i}.bin": bytes([i]) * (10 + i) for i in range(4)}
    (tmp_path / "skip.txt").write_text("not a blob")
    for name, data in payloads.items():
        (tmp_path / name).write_bytes(data)

    df = read_binary_files(spark, str(tmp_path), pattern="*.bin")
    assert set(df.columns) == {"path", "modificationTime", "length", "content"}
    rows = {r.path.rsplit("/", 1)[-1]: bytes(r.content) for r in df.collect()}
    assert rows == payloads

    meta = with_media_metadata(df, "content", mime="application/x-blob")
    got = {
        r.path.rsplit("/", 1)[-1]: r.content_meta.n_bytes for r in meta.collect()
    }
    assert got == {k: len(v) for k, v in payloads.items()}


def test_write_training_shards_contiguous_sorted(spark, tmp_path):
    from pyarrow_ops_spark.sources.tables import load_table, write_training_shards
    from pyarrow_ops_spark.functions.ordering import deterministic_shuffle

    docs = load_table(spark, "documents", SF_DIR).select("doc_id", "text")
    ordered = deterministic_shuffle(docs, ["doc_id"], id_col="train_order")
    path = str(tmp_path / "shards")
    write_training_shards(ordered, path, n_shards=4)

    import glob
    files = sorted(glob.glob(f"{path}/part-*.parquet"))
    assert len(files) == 4
    import pyarrow.parquet as pq
    ranges = []
    total = 0
    for f in files:
        t = pq.read_table(f, columns=["train_order"])
        vals = t["train_order"].to_pylist()
        assert vals == sorted(vals), f"shard {f} not internally sorted"
        ranges.append((min(vals), max(vals)))
        total += len(vals)
    assert total == docs.count()
    # shards cover contiguous disjoint ranges in file order
    ranges.sort()
    flat = []
    for lo, hi in ranges:
        flat.append((lo, hi))
    for (l1, h1), (l2, h2) in zip(flat, flat[1:]):
        assert h1 < l2
    assert flat[0][0] == 0
    assert flat[-1][1] == total - 1


def test_write_training_shards_rejects_bad_shards(spark):
    from pyarrow_ops_spark.sources.tables import write_training_shards

    df = spark.createDataFrame([(1,)], "train_order long")
    import pytest as _pytest
    with _pytest.raises(ValueError):
        write_training_shards(df, "/tmp/x", n_shards=0)
