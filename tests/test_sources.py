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


def test_autoscale_initial_partitions_ratchet(spark, tmp_path, monkeypatch):
    """load_table must widen AQE's initial shuffle width with input size
    (monotone, capped, env-pinnable) — the dedup_keep_drop sf10 exponent
    fix (benchmarks/keep_drop_ab_r9.json: 2048-wide start -> 1.08 vs 1.22
    at the fixed 256 default)."""
    from pyarrow_ops_spark.sources.tables import (
        _BYTES_PER_INITIAL_PARTITION,
        _INITIAL_PARTITIONS_CONF,
        _MAX_INITIAL_PARTITIONS,
        _autoscale_initial_partitions,
        _input_bytes,
    )

    monkeypatch.delenv("SPARK_GRAFT_INITIAL_PARTITIONS", raising=False)
    big = tmp_path / "big.parquet"
    big.mkdir()
    n_parts = 600
    (big / "part-0.bin").write_bytes(b"x" * (n_parts * _BYTES_PER_INITIAL_PARTITION))
    assert _input_bytes(str(big)) == n_parts * _BYTES_PER_INITIAL_PARTITION

    before = spark.conf.get(_INITIAL_PARTITIONS_CONF)
    try:
        spark.conf.set(_INITIAL_PARTITIONS_CONF, "256")
        _autoscale_initial_partitions(spark, str(big))
        assert int(spark.conf.get(_INITIAL_PARTITIONS_CONF)) == n_parts

        # monotone: a smaller input never narrows the session back down
        small = tmp_path / "small.parquet"
        small.write_bytes(b"y" * 1024)
        _autoscale_initial_partitions(spark, str(small))
        assert int(spark.conf.get(_INITIAL_PARTITIONS_CONF)) == n_parts

        # capped
        spark.conf.set(_INITIAL_PARTITIONS_CONF, "256")
        huge = tmp_path / "huge.parquet"
        huge.mkdir()
        (huge / "part-0.bin").write_bytes(b"z")
        import pyarrow_ops_spark.sources.tables as tbl

        monkeypatch.setattr(
            tbl, "_input_bytes", lambda p: 10**15, raising=True
        )
        _autoscale_initial_partitions(spark, str(huge))
        assert int(spark.conf.get(_INITIAL_PARTITIONS_CONF)) == _MAX_INITIAL_PARTITIONS

        # explicit env pin disables the ratchet
        spark.conf.set(_INITIAL_PARTITIONS_CONF, "256")
        monkeypatch.setenv("SPARK_GRAFT_INITIAL_PARTITIONS", "2048")
        _autoscale_initial_partitions(spark, str(big))
        assert int(spark.conf.get(_INITIAL_PARTITIONS_CONF)) == 256
    finally:
        spark.conf.set(_INITIAL_PARTITIONS_CONF, before)


def test_text_roundtrip_and_wholetext(spark, tmp_path):
    """format='text': the raw-corpus path — one row per LINE on the way
    in/out (sink requires a single string column), and wholetext='true'
    reads one row per FILE (file-per-document crawl layout)."""
    docs = spark.createDataFrame(
        [("alpha line",), ("beta line",), ("gamma line",)], "value string"
    )
    path = str(tmp_path / "corpus_txt")
    write_sink(docs, path, format="text")
    back = read_source(spark, path, format="text")
    assert back.columns == ["value"]
    assert {r.value for r in back.collect()} == {
        "alpha line", "beta line", "gamma line"
    }
    whole = read_source(spark, path, format="text", wholetext="true")
    rows = [r.value for r in whole.collect()]
    # one row per part-file; every line is inside exactly one of them
    assert sum(v.count("line") for v in rows) == 3
