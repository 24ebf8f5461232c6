"""Resample/gap-fill: bucket math, dense grids, fill modes, gap report."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from pyarrow_ops_spark.operators.resample import gaps, resample, time_bucket


@pytest.fixture(scope="module")
def ts_df(spark):
    rows = [
        # group a: events at 00:05, 00:40, 03:10 -> buckets 00, 00, 03
        ("a", datetime(2024, 1, 1, 0, 5), 1.0),
        ("a", datetime(2024, 1, 1, 0, 40), 2.0),
        ("a", datetime(2024, 1, 1, 3, 10), 4.0),
        # group b: single event
        ("b", datetime(2024, 1, 1, 5, 59), 8.0),
    ]
    return spark.createDataFrame(rows, ["g", "ts", "v"])


def test_time_bucket_floors(spark):
    df = spark.createDataFrame(
        [(datetime(2024, 1, 1, 12, 34, 56),)], ["ts"]
    )
    out = df.select(time_bucket("ts", 3600).alias("b")).collect()[0]["b"]
    assert out == datetime(2024, 1, 1, 12, 0, 0)


def test_dense_grid_and_zero_fill(ts_df):
    out = resample(
        ts_df, "ts", 3600,
        {"n": F.count(F.lit(1)), "s": F.sum("v")},
        group_cols=["g"], fill="zero",
    ).collect()
    rows = {(r["g"], r["bucket"].hour): (r["n"], r["s"]) for r in out}
    # group a spans buckets 0..3 -> 4 rows; b has 1 row
    assert len(out) == 5
    assert rows[("a", 0)] == (2, 3.0)
    assert rows[("a", 1)] == (0, 0.0)  # generated gap, zero-filled
    assert rows[("a", 2)] == (0, 0.0)
    assert rows[("a", 3)] == (1, 4.0)
    assert rows[("b", 5)] == (1, 8.0)


def test_ffill_carries_last_observation(ts_df):
    out = resample(
        ts_df, "ts", 3600, {"s": F.sum("v")}, group_cols=["g"], fill="ffill"
    ).collect()
    rows = {(r["g"], r["bucket"].hour): r["s"] for r in out}
    assert rows[("a", 1)] == 3.0  # carried from bucket 0
    assert rows[("a", 2)] == 3.0
    assert rows[("a", 3)] == 4.0  # real observation overrides


def test_null_fill_leaves_gaps_null(ts_df):
    out = resample(
        ts_df, "ts", 3600, {"s": F.sum("v")}, group_cols=["g"], fill=None
    ).collect()
    rows = {(r["g"], r["bucket"].hour): r["s"] for r in out}
    assert rows[("a", 1)] is None


def test_gaps_report(ts_df):
    out = gaps(ts_df, "ts", 3600, group_cols=["g"]).collect()
    got = sorted((r["g"], r["bucket"].hour) for r in out)
    assert got == [("a", 1), ("a", 2)]


def test_no_groups_global_grid(spark):
    df = spark.createDataFrame(
        [(datetime(2024, 1, 1, 0, 1), 1.0), (datetime(2024, 1, 1, 2, 1), 2.0)],
        ["ts", "v"],
    )
    out = resample(df, "ts", 3600, {"n": F.count(F.lit(1))}, fill="zero").collect()
    assert len(out) == 3


def test_validation(ts_df):
    with pytest.raises(ValueError):
        resample(ts_df, "ts", 0, {"n": F.count(F.lit(1))})
    with pytest.raises(ValueError):
        resample(ts_df, "ts", 60, {"n": F.count(F.lit(1))}, fill="bogus")


def test_time_bucket_floors_pre_1970(spark):
    from pyarrow_ops_spark.operators.resample import time_bucket

    df = spark.createDataFrame(
        [("1969-12-31 23:59:55",), ("1970-01-01 00:00:05",)], "s string"
    )
    out = [
        str(r.b)
        for r in df.select(
            time_bucket(F.to_timestamp("s"), 3600).alias("b")
        ).collect()
    ]
    # both must FLOOR to their containing hour, not round toward zero
    assert out == ["1969-12-31 23:00:00", "1970-01-01 00:00:00"]
