"""Shared pytest fixtures: one SparkSession per test run, DuckDB oracle."""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyarrow_ops_spark import get_spark  # noqa: E402
from pyarrow_ops_spark.sources.tables import TABLE_NAMES  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
ORACLE_SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="pyarrow_ops_spark_tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for sf_dir, prefix in ((SF_DIR, ""), (ORACLE_SF_DIR, "o_")):
        for name in TABLE_NAMES:
            path = os.path.join(sf_dir, f"{name}.parquet")
            if os.path.exists(path):
                con.execute(
                    f"CREATE VIEW {prefix}{name} AS SELECT * FROM read_parquet('{path}')"
                )
    yield con
    con.close()


def canon(value):
    """Canonicalize a cell for order-insensitive comparison."""
    if isinstance(value, float):
        if math.isnan(value):
            return "NaN"
        return f"{value:.6g}"
    if hasattr(value, "isoformat"):
        return value.isoformat().replace("+00:00", "")
    if isinstance(value, (list, tuple)):
        return tuple(canon(v) for v in value)
    if isinstance(value, dict):
        return tuple(sorted((k, canon(v)) for k, v in value.items()))
    return value


def rows_to_set(colnames, rows):
    """Sorted-column, order-insensitive multiset of rows."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = {}
    for row in rows:
        key = tuple(canon(row[i]) for i in order)
        out[key] = out.get(key, 0) + 1
    return out


def assert_matches_oracle(sdf, duck_con, sql, check_names=True):
    """Compare a Spark DataFrame against a DuckDB query result,
    order-insensitively, the way the driver's correctness gate does."""
    spark_cols = list(sdf.columns)
    spark_rows = [tuple(r) for r in sdf.collect()]
    res = duck_con.execute(sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    if check_names:
        assert sorted(spark_cols) == sorted(duck_cols), (
            f"column mismatch: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
        )
    assert len(spark_rows) == len(duck_rows), (
        f"row count mismatch: spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    s = rows_to_set(spark_cols, spark_rows)
    d = rows_to_set(duck_cols, duck_rows)
    only_s = {k: v for k, v in s.items() if d.get(k) != v}
    only_d = {k: v for k, v in d.items() if s.get(k) != v}
    assert s == d, (
        f"value mismatch; spark-only sample: {list(only_s.items())[:3]}; "
        f"duck-only sample: {list(only_d.items())[:3]}"
    )
