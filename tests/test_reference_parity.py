"""Parity tests against the reference's own demo fixtures (FIXTURES.md 1-2,
7-9): exact expected outputs derived from reference semantics, compared
order-insensitively."""

from __future__ import annotations

import numpy as np
import pytest

from pyarrow_ops_spark import drop_duplicates, filters, groupby, join


@pytest.fixture(scope="module")
def animals(spark):
    return spark.createDataFrame(
        [
            ("Falcon", 380.0),
            ("Falcon", 370.0),
            ("Parrot", 24.0),
            ("Parrot", 26.0),
            ("Parrot", 24.0),
        ],
        ["Animal", "Max Speed"],
    )


def rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_filters_single_tuple(animals):
    assert rows(filters(animals, ("Animal", "=", "Falcon"))) == [
        ("Falcon", 370.0),
        ("Falcon", 380.0),
    ]


def test_filters_conjunction_not_in(animals):
    out = filters(
        animals, [("Animal", "not in", ["Falcon", "Duck"]), ("Max Speed", "<", 25)]
    )
    assert rows(out) == [("Parrot", 24.0), ("Parrot", 24.0)]


def test_filters_unknown_op_raises(animals):
    with pytest.raises(ValueError, match="not implemented"):
        filters(animals, ("Animal", "~", "x"))


def test_drop_duplicates_default_all_columns(animals):
    assert rows(drop_duplicates(animals)) == [
        ("Falcon", 370.0),
        ("Falcon", 380.0),
        ("Parrot", 24.0),
        ("Parrot", 26.0),
    ]


def test_drop_duplicates_keep_first_deterministic(animals):
    out = drop_duplicates(animals, on=["Animal"], keep="first", order_by=["Max Speed"])
    assert rows(out) == [("Falcon", 370.0), ("Parrot", 24.0)]


def test_drop_duplicates_keep_last_deterministic(animals):
    out = drop_duplicates(animals, on=["Animal"], keep="last", order_by=["Max Speed"])
    assert rows(out) == [("Falcon", 380.0), ("Parrot", 26.0)]


def test_drop_duplicates_keep_drop(spark):
    df = spark.createDataFrame(
        [("a", 1), ("b", 2), ("b", 3), ("c", 4)], ["k", "v"]
    )
    out = drop_duplicates(df, on=["k"], keep="drop")
    assert rows(out) == [("a", 1), ("c", 4)]


def test_drop_duplicates_keep_drop_duplicate_column_names(spark):
    """Post-join DataFrames can carry duplicate column names; keep='drop'
    must fall back to the window-count shape there (the aggregate shape's
    struct expansion would collide)."""
    left = spark.createDataFrame([("a", 1), ("b", 2), ("b", 3)], ["k", "v"])
    right = spark.createDataFrame([("a", 9), ("b", 8)], ["k", "v"])
    joined = left.join(right, on="k")  # columns: k, v, v
    assert joined.columns == ["k", "v", "v"]
    out = drop_duplicates(joined, on=["k"], keep="drop")
    assert out.columns == ["k", "v", "v"]
    assert [tuple(r) for r in out.collect()] == [("a", 1, 9)]


def test_groupby_named_aggs_bare_names(animals):
    # reference: output columns keep the input names (group.py:44-47)
    med = groupby(animals, ["Animal"]).median()
    assert med.columns == ["Animal", "Max Speed"]
    assert rows(med) == [("Falcon", 375.0), ("Parrot", 24.0)]
    s = groupby(animals, ["Animal"]).sum()
    assert rows(s) == [("Falcon", 750.0), ("Parrot", 74.0)]
    mn = groupby(animals, ["Animal"]).min()
    assert rows(mn) == [("Falcon", 370.0), ("Parrot", 24.0)]
    mx = groupby(animals, ["Animal"]).agg({"Max Speed": "max"})
    assert rows(mx) == [("Falcon", 380.0), ("Parrot", 26.0)]


def test_groupby_duplicate_on_deduped(animals):
    # reference dedups the key list (helpers.py:19) — we keep user order
    g = groupby(animals, ["Animal", "Animal"])
    assert g.by == ["Animal"]


def test_groupby_unknown_agg_raises(animals):
    with pytest.raises(KeyError):
        groupby(animals, ["Animal"]).agg({"Max Speed": "nope"})


def test_groupby_aggregate_callable(animals):
    out = groupby(animals, ["Animal"]).aggregate({"Max Speed": np.mean})
    got = dict(rows(out))
    assert got["Falcon"] == 375.0
    assert abs(got["Parrot"] - 74.0 / 3) < 1e-9


def test_groupby_aggregate_callable_string_col_and_explicit_type(animals):
    # string column: the probe must not fabricate numerics; and an explicit
    # return_types entry must override probing entirely (needed for
    # callables whose type depends on actual values)
    out = groupby(animals, ["Animal"]).aggregate(
        {"Max Speed": lambda a: float(a.max())},
        return_types={"Max Speed": "double"},
    )
    got = dict(rows(out))
    assert got["Falcon"] == 380.0
    from pyspark.sql import functions as F

    str_agg = groupby(
        animals.withColumn("tag", F.concat(F.col("Animal"), F.lit("!"))), ["Animal"]
    ).aggregate({"tag": lambda a: max(a)})
    tags = dict(rows(str_agg))
    assert tags["Falcon"] == "Falcon!"


def test_groupby_iteration(animals):
    seen = {}
    for key, sub in groupby(animals, ["Animal"]):
        seen[key["Animal"]] = sub.count()
    assert seen == {"Falcon": 2, "Parrot": 3}


def test_join_mxn_fanout(spark, animals):
    right = spark.createDataFrame([("Falcon", 10), ("Parrot", 20)], ["Animal", "Age"])
    out = join(animals, right, on=["Animal"])
    assert out.columns == ["Animal", "Max Speed", "Age"]
    assert out.count() == 5  # 2*1 + 3*1


def test_join_right_clash_column_dropped(spark):
    # reference align_tables: right's clashing non-key column is dropped
    left = spark.createDataFrame([("a", 1)], ["k", "v"])
    right = spark.createDataFrame([("a", 9, "x")], ["k", "v", "w"])
    out = join(left, right, on=["k"])
    assert out.columns == ["k", "v", "w"]
    assert rows(out) == [("a", 1, "x")]  # left's v wins


def test_join_null_keys_match_by_default(spark):
    # reference parity: hash(None)==hash(None) → None joins None (§1.4.2)
    left = spark.createDataFrame([(None, 1), ("a", 2)], "k string, v long")
    right = spark.createDataFrame([(None, 10), ("a", 20)], "k string, w long")
    parity = join(left, right, on=["k"])
    assert parity.count() == 2
    sql_mode = join(left, right, on=["k"], null_equals_null=False)
    assert sql_mode.count() == 1  # ANSI: NULL = NULL is false


def test_join_hash_collision_keys_stay_distinct(spark):
    # CPython hash(-1) == hash(-2) wrongly merges keys in the reference
    # (SURVEY §1.4.1); Spark compares real values — they must NOT join.
    left = spark.createDataFrame([(-1, "a")], "k long, v string")
    right = spark.createDataFrame([(-2, "b")], "k long, w string")
    assert join(left, right, on=["k"]).count() == 0


def test_join_zero_overlap(spark):
    left = spark.createDataFrame([("a", 1)], ["k", "v"])
    right = spark.createDataFrame([("z", 2)], ["k", "w"])
    assert join(left, right, on=["k"]).count() == 0


def test_empty_table_all_operators(spark, animals):
    empty = animals.filter("`Max Speed` > 1e9")
    assert filters(empty, ("Animal", "=", "x")).count() == 0
    assert drop_duplicates(empty, on=["Animal"]).count() == 0
    assert groupby(empty, ["Animal"]).sum().count() == 0
    right = spark.createDataFrame([("Falcon", 1)], ["Animal", "Age"])
    assert join(empty, right, on=["Animal"]).count() == 0


def test_head_prints_rows_and_empty_message(spark, animals, capsys):
    from pyarrow_ops_spark import head

    head(animals, n=2)
    out = capsys.readouterr().out
    assert "Animal" in out and out.count("\n") >= 4  # header + 2 rows boxed
    head(animals.filter("`Max Speed` > 1e9"))
    assert "No data in table" in capsys.readouterr().out


def test_head_caps_line_width(spark, capsys):
    from pyarrow_ops_spark import head

    wide = spark.createDataFrame([("x" * 500, 1)], "wide string, n long")
    head(wide, max_width=40)
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    # reference ops.py:79 truncates every rendered line to max_width chars
    # after the 5-char row-label prefix
    assert all(len(l) <= 45 for l in lines)
    assert lines[0].startswith("Row  ")
