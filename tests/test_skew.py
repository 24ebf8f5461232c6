"""Salted aggregation/join must be semantics-preserving vs the plain plans,
including on a deliberately skewed key distribution."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyarrow_ops_spark.operators.skew import salted_agg, salted_join
from pyarrow_ops_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def rows(df):
    out = []
    for r in df.collect():
        out.append(tuple(round(v, 6) if isinstance(v, float) else v for v in r))
    return sorted(out)


@pytest.fixture(scope="module")
def skewed(spark):
    # ~90% of lineitem rows collapse onto one hot key
    li = load_table(spark, "lineitem", SF_DIR)
    return li.withColumn(
        "k", F.when(F.col("l_orderkey") % 10 != 0, F.lit(0)).otherwise(F.col("l_orderkey"))
    )


def test_salted_agg_equals_plain(spark, skewed):
    plain = skewed.groupBy("k").agg(
        F.sum("l_quantity").alias("total"),
        F.count(F.lit(1)).alias("n"),
        F.min("l_extendedprice").alias("lo"),
        F.max("l_extendedprice").alias("hi"),
        F.avg("l_discount").alias("avg_disc"),
    )
    salted = salted_agg(
        skewed,
        ["k"],
        {
            "total": "sum(l_quantity)",
            "n": "count()",
            "lo": "min(l_extendedprice)",
            "hi": "max(l_extendedprice)",
            "avg_disc": "avg(l_discount)",
        },
        n_salts=8,
    )
    assert rows(salted.select("k", "total", "n", "lo", "hi", "avg_disc")) == rows(
        plain.select("k", "total", "n", "lo", "hi", "avg_disc")
    )


def test_salted_agg_null_semantics(spark, skewed):
    """count(col) skips nulls and avg(col) averages non-null values only —
    the SQL semantics a plain groupBy produces (ADVICE r1: the old partials
    counted null rows, deflating avg and inflating count on null columns)."""
    with_nulls = skewed.withColumn(
        "v", F.when(F.col("l_linenumber") % 3 == 0, F.col("l_quantity"))
    )  # ~2/3 of v is NULL
    plain = with_nulls.groupBy("k").agg(
        F.count("v").alias("n_v"),
        F.count(F.lit(1)).alias("n_rows"),
        F.avg("v").alias("avg_v"),
        F.sum("v").alias("sum_v"),
    )
    salted = salted_agg(
        with_nulls,
        ["k"],
        {
            "n_v": "count(v)",
            "n_rows": "count(*)",
            "avg_v": "avg(v)",
            "sum_v": "sum(v)",
        },
        n_salts=8,
    )
    cols = ["k", "n_v", "n_rows", "avg_v", "sum_v"]
    assert rows(salted.select(*cols)) == rows(plain.select(*cols))


def test_salted_agg_all_null_group_avg_is_null(spark):
    df = spark.createDataFrame(
        [(1, None), (1, None), (2, 4.0), (2, None)], "k int, v double"
    )
    out = {r["k"]: r for r in salted_agg(
        df, ["k"], {"n": "count(v)", "a": "avg(v)"}, n_salts=4
    ).collect()}
    assert out[1]["n"] == 0 and out[1]["a"] is None
    assert out[2]["n"] == 1 and out[2]["a"] == 4.0


def test_salted_agg_rejects_nonmergeable(spark, skewed):
    with pytest.raises(ValueError):
        salted_agg(skewed, ["k"], {"m": "median(l_quantity)"})


def test_salted_join_equals_plain(spark, skewed):
    left = skewed.select("k", "l_quantity")
    right = (
        skewed.groupBy("k").agg(F.count(F.lit(1)).alias("k_rows"))
    )
    plain = left.join(right, on=["k"])
    salted = salted_join(left, right, on=["k"], n_salts=8)
    assert salted.count() == plain.count()
    assert rows(salted.groupBy("k").agg(F.sum("k_rows").alias("s"))) == rows(
        plain.groupBy("k").agg(F.sum("k_rows").alias("s"))
    )


def test_salted_join_left_keeps_unmatched(spark, skewed):
    left = skewed.select("k", "l_quantity").limit(100)
    right = (
        skewed.groupBy("k")
        .agg(F.count(F.lit(1)).alias("k_rows"))
        .filter(F.col("k") != 0)  # drop the hot key from the right side
    )
    out = salted_join(left, right, on=["k"], n_salts=4, how="left")
    assert out.count() == 100
    assert out.filter(F.col("k_rows").isNull()).count() == left.filter(
        F.col("k") == 0
    ).count()


def test_key_skew_report_hot_key(spark):
    from pyarrow_ops_spark.operators.skew import key_skew_report

    rows = [("hot",)] * 90 + [("a",)] * 5 + [("b",)] * 5
    df = spark.createDataFrame(rows, "k string")
    out = key_skew_report(df, ["k"], k=3).collect()
    assert out[0].rank == 1 and out[0].k == "hot"
    assert out[0].n_rows == 90
    assert abs(out[0].share - 0.9) < 1e-9
    # mean per key = 100/3; skew = 90/(100/3) = 2.7
    assert abs(out[0].skew - 2.7) < 1e-9
    assert [r.rank for r in out] == [1, 2, 3]


def test_key_skew_report_uniform_keys_near_one(spark):
    from pyarrow_ops_spark.operators.skew import key_skew_report

    rows = [(f"k{i % 4}",) for i in range(100)]
    df = spark.createDataFrame(rows, "k string")
    out = key_skew_report(df, ["k"], k=4).collect()
    for r in out:
        assert abs(r.skew - 1.0) < 1e-9


def test_key_skew_report_bad_k(spark):
    from pyarrow_ops_spark.operators.skew import key_skew_report

    df = spark.createDataFrame([("a",)], "k string")
    with pytest.raises(ValueError):
        key_skew_report(df, ["k"], k=0)


def test_salted_first_n_equals_single_window(spark):
    # row-identity holds when order_cols is a TOTAL order per key (the
    # documented contract — the synthetic lineitem has duplicate
    # (l_orderkey, l_linenumber) pairs, so a unique id frame is used);
    # 90% of rows collapse onto hot key 0
    from pyspark.sql import Window

    from pyarrow_ops_spark.operators.skew import salted_first_n_per_key

    df = spark.range(20_000).select(
        F.when(F.col("id") % 10 != 0, F.lit(0)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("seq"),
        (F.col("id") % 97).cast("double").alias("v"),
    )
    w = Window.partitionBy("k").orderBy("seq")
    plain = (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= 7)
        .drop("__rn")
    )
    salted = salted_first_n_per_key(df, ["k"], ["seq"], 7)
    assert rows(salted) == rows(plain)
    # rank_col matches the plain window's rank
    ranked = salted_first_n_per_key(df, ["k"], ["seq"], 7, rank_col="rn")
    plain_rn = df.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= 7
    )
    assert rows(ranked) == rows(plain_rn)


def test_salted_first_n_plan_shape(spark, skewed):
    """Plan hygiene: stage 1 windows over (key, salt=content hash) so the
    hot key never funnels through one task with its full row set and the
    slice assignment is retry-deterministic; stage 2's window input is
    already truncated."""
    from pyarrow_ops_spark.operators.skew import salted_first_n_per_key

    df = skewed.select("k", "l_orderkey", "l_linenumber")
    out = salted_first_n_per_key(df, ["k"], ["l_orderkey", "l_linenumber"], 5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("row_number") >= 2
    assert "xxhash64" in plan  # deterministic content-derived salt
    assert "spark_partition_id" not in plan.lower()
    # both filters sit below their consumers: two Window nodes present
    assert plan.count("Window") >= 2


def test_top_user_paths_salted_equals_plain(spark):
    import datetime as dt

    from pyarrow_ops_spark.operators.events import top_user_paths

    t0 = dt.datetime(2024, 1, 1)
    data = []
    # bot user 1 with 500 events; normal users 2..40 with short paths
    for i in range(500):
        data.append((i, t0 + dt.timedelta(seconds=i), 1, f"e{i % 4}"))
    for u in range(2, 41):
        for i, ty in enumerate(["a", "b"] if u % 2 else ["b", "a"]):
            data.append((u * 1000 + i, t0 + dt.timedelta(minutes=i), u, ty))
    ev = spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id long, event_type string"
    )
    plain = [(r.path, r.n_users) for r in top_user_paths(ev, k=5, max_steps=6).collect()]
    salted = [
        (r.path, r.n_users)
        for r in top_user_paths(ev, k=5, max_steps=6, salt_skew=True).collect()
    ]
    assert salted == plain
