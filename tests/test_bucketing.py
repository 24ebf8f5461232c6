"""Bucketed tables must join and aggregate with NO exchange on the bucket
key — the co-location contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyarrow_ops_spark.plans.inspect import formatted_plan, shuffle_count
from pyarrow_ops_spark.sources.bucketing import read_bucketed, write_bucketed
from pyarrow_ops_spark.sources.tables import load_table
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "")
    orders = load_table(spark, "orders", SF_DIR).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    li = load_table(spark, "lineitem", SF_DIR).select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    write_bucketed(orders, "b_orders", ["o_orderkey"], n_buckets=8,
                   sort_by=["o_orderkey"])
    write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem", ["o_orderkey"], n_buckets=8, sort_by=["o_orderkey"],
    )
    yield spark
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    assert warehouse == spark.conf.get("spark.sql.warehouse.dir", "")


def test_bucketed_join_no_exchange(bucketed, spark):
    # disable broadcast so the join would otherwise need a full shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = read_bucketed(spark, "b_orders").join(
            read_bucketed(spark, "b_lineitem"), on="o_orderkey"
        )
        plan = formatted_plan(j)
        assert "SortMergeJoin" in plan
        assert shuffle_count(j) == 0, plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_groupby_no_exchange(bucketed, spark):
    agg = (
        read_bucketed(spark, "b_lineitem")
        .groupBy("o_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    assert shuffle_count(agg) == 0


def test_bucketed_join_matches_plain(bucketed, spark):
    j = read_bucketed(spark, "b_orders").join(
        read_bucketed(spark, "b_lineitem"), on="o_orderkey"
    )
    orders = load_table(spark, "orders", SF_DIR)
    li = load_table(spark, "lineitem", SF_DIR)
    plain = orders.join(li, orders.o_orderkey == li.l_orderkey)
    assert j.count() == plain.count()
