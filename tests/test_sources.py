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
