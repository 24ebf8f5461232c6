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


class TestUpsert:
    def _base(self, spark):
        return spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
            "k long, name string, v double",
        )

    def test_update_insert_delete(self, spark):
        from pyarrow_ops_spark.operators.diff import upsert

        base = self._base(spark)
        updates = spark.createDataFrame(
            [(2, "b2", 25.0, False), (4, "d", 40.0, False), (3, "c", 0.0, True)],
            "k long, name string, v double, is_delete boolean",
        )
        out = {r.k: r for r in upsert(base, updates, ["k"], delete_col="is_delete").collect()}
        assert set(out) == {1, 2, 4}
        assert out[2].name == "b2" and out[2].v == 25.0  # replaced
        assert out[4].name == "d"                        # inserted
        assert out[1].name == "a"                        # untouched

    def test_no_delete_col_replaces_and_inserts(self, spark):
        from pyarrow_ops_spark.operators.diff import upsert

        base = self._base(spark)
        updates = spark.createDataFrame(
            [(1, "a9", 99.0), (9, "z", 9.0)], "k long, name string, v double"
        )
        out = {r.k: r.v for r in upsert(base, updates, ["k"]).collect()}
        assert out == {1: 99.0, 2: 20.0, 3: 30.0, 9: 9.0}

    def test_null_delete_flag_means_keep(self, spark):
        from pyarrow_ops_spark.operators.diff import upsert

        base = self._base(spark)
        updates = spark.createDataFrame(
            [(1, "a1", 11.0, None)], "k long, name string, v double, is_delete boolean"
        )
        out = {r.k: r.name for r in upsert(base, updates, ["k"], delete_col="is_delete").collect()}
        assert out[1] == "a1"

    def test_empty_keys_rejected(self, spark):
        from pyarrow_ops_spark.operators.diff import upsert

        base = self._base(spark)
        import pytest as _pytest
        with _pytest.raises(ValueError):
            upsert(base, base, [])


class TestUpsertHistory:
    def test_scd2_close_insert_passthrough(self, spark):
        from pyarrow_ops_spark.operators.diff import upsert_history

        history = spark.createDataFrame(
            [
                (1, "a", "2023-01-01", None, True),
                (2, "b", "2023-01-01", None, True),
                # an already-closed old version of key 1
                (1, "a0", "2022-01-01", "2023-01-01", False),
            ],
            "k long, val string, valid_from string, valid_to string, is_current boolean",
        )
        updates = spark.createDataFrame(
            [(1, "a2", "2024-06-01"), (9, "z", "2024-06-01")],
            "k long, val string, ts string",
        )
        out = upsert_history(history, updates, ["k"], ts_col="ts").collect()
        rows = {(r.k, r.val): r for r in out}
        assert len(out) == 5
        closed = rows[(1, "a")]
        assert closed.valid_to == "2024-06-01" and not closed.is_current
        assert closed.valid_from == "2023-01-01"  # old version preserved
        new = rows[(1, "a2")]
        assert new.valid_from == "2024-06-01" and new.valid_to is None and new.is_current
        inserted = rows[(9, "z")]
        assert inserted.is_current and inserted.valid_from == "2024-06-01"
        untouched = rows[(2, "b")]
        assert untouched.is_current and untouched.valid_to is None
        past = rows[(1, "a0")]
        assert not past.is_current and past.valid_to == "2023-01-01"

    def test_current_rows_unique_per_updated_key(self, spark):
        from pyarrow_ops_spark.operators.diff import upsert_history
        from pyspark.sql import functions as F

        history = spark.createDataFrame(
            [(i, f"v{i}", "2023-01-01", None, True) for i in range(10)],
            "k long, val string, valid_from string, valid_to string, is_current boolean",
        )
        updates = spark.createDataFrame(
            [(i, "new", "2024-01-01") for i in range(0, 10, 2)],
            "k long, val string, ts string",
        )
        out = upsert_history(history, updates, ["k"], ts_col="ts")
        cur = out.filter(F.col("is_current")).groupBy("k").count().collect()
        assert all(r["count"] == 1 for r in cur)
        assert out.count() == 15  # 10 original versions + 5 new opens

    def test_empty_keys_rejected(self, spark):
        from pyarrow_ops_spark.operators.diff import upsert_history

        df = spark.createDataFrame([(1, "2024-01-01")], "k long, ts string")
        import pytest as _pytest
        with _pytest.raises(ValueError):
            upsert_history(df, df, [], ts_col="ts")


class TestNullKeys:
    """NULL key values are ordinary values (null-safe key equality) and a
    NULL is_current rides the closed slice — the silent-duplication /
    vanishing-row classes flagged in round-4 advice."""

    def test_upsert_null_key_replaces_not_duplicates(self, spark):
        from pyspark.sql import functions as F

        from pyarrow_ops_spark.operators.diff import upsert

        base = spark.createDataFrame(
            [(1, "a"), (None, "b"), (2, "c")], "k long, val string"
        )
        updates = spark.createDataFrame(
            [(None, "B2"), (3, "d")], "k long, val string"
        )
        out = upsert(base, updates, ["k"])
        assert out.count() == 4  # keys stay unique, incl. the NULL key
        got = {r.val for r in out.filter(F.col("k").isNull()).collect()}
        assert got == {"B2"}

    def test_upsert_history_null_key_and_null_is_current(self, spark):
        from pyspark.sql import functions as F

        from pyarrow_ops_spark.operators.diff import upsert_history

        history = spark.createDataFrame(
            [
                (None, "n0", "2023-01-01", None, True),
                (1, "v1", "2023-01-01", None, None),  # NULL is_current
            ],
            "k long, val string, valid_from string, valid_to string,"
            " is_current boolean",
        )
        updates = spark.createDataFrame(
            [(None, "n1", "2024-01-01")], "k long, val string, ts string"
        )
        out = upsert_history(history, updates, ["k"], ts_col="ts")
        # NULL-key open row closed + new open row; NULL is_current row
        # preserved in the closed slice — nothing vanishes, no duplicate
        # open rows for the NULL key
        assert out.count() == 3
        nk = out.filter(F.col("k").isNull())
        opens = nk.filter(F.coalesce("is_current", F.lit(False))).collect()
        assert len(opens) == 1 and opens[0].val == "n1"
        closed = nk.filter(~F.coalesce("is_current", F.lit(True))).collect()
        assert len(closed) == 1 and closed[0].valid_to == "2024-01-01"
        kept = out.filter(F.col("k") == 1).collect()
        assert len(kept) == 1 and kept[0].val == "v1"


def test_schema_drift_detects_add_remove_retype(spark):
    from pyarrow_ops_spark.operators.diff import schema_drift

    a = spark.createDataFrame([(1, "x", 1.0)], "id long, name string, v double")
    b = spark.createDataFrame([(1, "x", 2, "new")], "id long, name string, v int, extra string")
    got = {r["column"]: r for r in schema_drift(a, b).collect()}
    assert set(got) == {"v", "extra"}
    assert got["v"]["change"] == "type_changed"
    assert (got["v"]["type_a"], got["v"]["type_b"]) == ("double", "int")
    assert got["extra"]["change"] == "added" and got["extra"]["type_a"] is None
    rev = {r["column"]: r for r in schema_drift(b, a).collect()}
    assert rev["extra"]["change"] == "removed"
    assert schema_drift(a, a).count() == 0
