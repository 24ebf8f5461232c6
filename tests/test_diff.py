"""Keyed snapshot diff: classification, null safety, column pruning."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyarrow_ops_spark.operators.diff import diff_summary, diff_tables


def _snapshots(spark):
    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None), (4, "d", 40.0)],
        ["k", "name", "val"],
    )
    new = spark.createDataFrame(
        [(2, "b", 25.0), (3, "c", None), (4, "D", 40.0), (5, "e", 50.0)],
        ["k", "name", "val"],
    )
    return old, new


def test_classification(spark):
    old, new = _snapshots(spark)
    out = {r["k"]: r["diff_status"] for r in diff_tables(old, new, ["k"]).collect()}
    # 1 removed, 5 added, 2 changed (val), 4 changed (name); 3 unchanged
    # (NULL == NULL under eqNullSafe) and filtered out by default.
    assert out == {1: "removed", 2: "changed", 4: "changed", 5: "added"}


def test_include_unchanged_and_values(spark):
    old, new = _snapshots(spark)
    rows = {
        r["k"]: r
        for r in diff_tables(old, new, ["k"], include_unchanged=True).collect()
    }
    assert rows[3]["diff_status"] == "unchanged"
    assert rows[2]["old_val"] == 20.0 and rows[2]["new_val"] == 25.0
    assert rows[1]["new_val"] is None and rows[1]["old_val"] == 10.0


def test_compare_cols_pruning(spark):
    old, new = _snapshots(spark)
    # comparing only val: key 4's name change becomes 'unchanged'
    out = {
        r["k"]: r["diff_status"]
        for r in diff_tables(old, new, ["k"], compare_cols=["val"]).collect()
    }
    assert 4 not in out
    assert out == {1: "removed", 2: "changed", 5: "added"}


def test_summary_counts(spark):
    old, new = _snapshots(spark)
    got = {
        r["diff_status"]: r["n_keys"]
        for r in diff_summary(old, new, ["k"]).collect()
    }
    assert got == {"added": 1, "removed": 1, "changed": 2, "unchanged": 1}
