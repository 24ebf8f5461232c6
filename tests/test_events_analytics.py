"""Funnel and retention-cohort operator contracts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyarrow_ops_spark.operators.events import funnel_steps, retention_cohorts


def test_funnel_orders_matter(spark):
    rows = [
        # user 1 completes the whole ordered funnel
        (1, "view", "2024-01-01 10:00:00"),
        (1, "click", "2024-01-01 10:01:00"),
        (1, "purchase", "2024-01-01 10:02:00"),
        # user 2 clicked BEFORE viewing: click must not count
        (2, "click", "2024-01-01 09:00:00"),
        (2, "view", "2024-01-01 10:00:00"),
        # user 3 only views
        (3, "view", "2024-01-01 11:00:00"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts_s string"
    ).withColumn("ts", F.to_timestamp("ts_s"))
    out = {r.step: r for r in funnel_steps(df, ["view", "click", "purchase"]).collect()}
    assert out[0].n_users == 3
    assert out[1].n_users == 1  # only user 1's post-view click
    assert out[2].n_users == 1
    assert out[0].conversion is None
    assert abs(out[1].conversion - round(1 / 3, 4)) < 1e-9
    assert abs(out[2].overall - round(1 / 3, 4)) < 1e-9


def test_funnel_rejects_bad_steps(spark):
    df = spark.createDataFrame([(1, "a", "2024-01-01")], "user_id long, event_type string, ts string")
    with pytest.raises(ValueError):
        funnel_steps(df, [])
    with pytest.raises(ValueError):
        funnel_steps(df, ["a", "a"])


def test_retention_triangle(spark):
    rows = [
        # user 1: first activity week 0, returns week 1
        (1, "2024-01-01 10:00:00"),
        (1, "2024-01-08 10:00:00"),
        # user 2: week 0 only
        (2, "2024-01-02 10:00:00"),
        # user 3: cohort one week later, returns two weeks after that
        (3, "2024-01-10 10:00:00"),
        (3, "2024-01-24 10:00:00"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts_s string").withColumn(
        "ts", F.to_timestamp("ts_s")
    )
    got = {
        (str(r.cohort), r.period_offset): (r.n_users, r.retention)
        for r in retention_cohorts(df).collect()
    }
    # 2024-01-01 is a Monday -> cohort anchors are Mondays
    assert got[("2024-01-01", 0)] == (2, 1.0)
    assert got[("2024-01-01", 1)] == (1, 0.5)
    assert got[("2024-01-08", 0)] == (1, 1.0)
    assert got[("2024-01-08", 2)] == (1, 1.0)
    # offset-0 retention is 1.0 for every cohort by construction
    for (c, off), (n, r) in got.items():
        if off == 0:
            assert r == 1.0


def test_retention_rejects_bad_period(spark):
    df = spark.createDataFrame([(1, "2024-01-01")], "user_id long, ts string")
    with pytest.raises(ValueError):
        retention_cohorts(df, period_days=0)


def test_funnel_conversion_window(spark):
    rows = [
        (1, "view", "2024-01-01 10:00:00"),
        (1, "click", "2024-01-01 10:00:30"),   # within 60s
        (2, "view", "2024-01-01 10:00:00"),
        (2, "click", "2024-01-01 11:00:00"),   # way past the window
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts_s string"
    ).withColumn("ts", F.to_timestamp("ts_s"))
    out = {r.step: r.n_users
           for r in funnel_steps(df, ["view", "click"], max_gap_seconds=60).collect()}
    assert out == {0: 2, 1: 1}
    # without the window both clicks count
    out2 = {r.step: r.n_users
            for r in funnel_steps(df, ["view", "click"]).collect()}
    assert out2 == {0: 2, 1: 2}


def test_top_user_paths_orders_and_truncates(spark):
    from pyarrow_ops_spark.operators.events import top_user_paths
    from pyspark.sql import functions as F
    import datetime as dt

    rows = []
    t0 = dt.datetime(2024, 1, 1)
    # users 1,2 share path a>b; user 3 does b>a; user 4 emits 25 events
    for u, types in [(1, ["a", "b"]), (2, ["a", "b"]), (3, ["b", "a"])]:
        for i, ty in enumerate(types):
            rows.append((u * 100 + i, t0 + dt.timedelta(minutes=i), u, ty))
    for i in range(25):
        rows.append((400 + i, t0 + dt.timedelta(minutes=i), 4, "x"))
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = top_user_paths(ev, k=3, max_steps=20)
    got = [(r.path, r.n_users) for r in out.collect()]
    assert got[0] == ("a > b", 2)
    # user 4's path truncates at 20 steps
    x20 = " > ".join(["x"] * 20)
    assert (x20, 1) in got
    assert ("b > a", 1) in got


def test_top_user_paths_tie_order_deterministic(spark):
    from pyarrow_ops_spark.operators.events import top_user_paths
    import datetime as dt

    t = dt.datetime(2024, 1, 1)
    # same ts -> event_id breaks the tie: 10 before 11
    ev = spark.createDataFrame(
        [(11, t, 1, "late"), (10, t, 1, "early")],
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    out = top_user_paths(ev, k=1)
    assert out.collect()[0].path == "early > late"


def test_top_user_paths_bounded_state_on_power_user(spark):
    """A 100k-event bot key must not ride the aggregation buffer: the
    plan truncates to max_steps with a (spillable) row_number window
    BEFORE the collect_list groupBy, so per-user agg state is bounded."""
    from pyarrow_ops_spark.operators.events import top_user_paths
    from pyspark.sql import functions as F

    ev = (
        spark.range(100_000)
        .select(
            F.col("id").alias("event_id"),
            F.timestamp_seconds(F.lit(1704067200) + F.col("id")).alias("ts"),
            F.lit(1).alias("user_id"),
            F.concat(F.lit("e"), F.col("id") % 3).alias("event_type"),
        )
    )
    out = top_user_paths(ev, k=1, max_steps=5)
    rows = out.collect()
    assert rows[0].path == "e0 > e1 > e2 > e0 > e1"
    assert rows[0].n_users == 1
    # plan hygiene: the row_number truncation window sits BELOW the
    # collect_list aggregate (tree walk, not plan-string index math —
    # rendering order varies across Spark versions and AQE settings)
    from pyarrow_ops_spark.plans.inspect import node_has_descendant

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "row_number" in plan
    assert node_has_descendant(out, "HashAggregate", "Window")


def test_rfm_segments_scores_and_determinism(spark):
    import datetime as dt

    from pyarrow_ops_spark.operators.segments import rfm_segments

    rows = []
    base = dt.date(2024, 1, 1)
    # customer c gets c orders of 100*c, last order at day c -> monotone
    # R (later last order = fewer recency days = higher r), F, M
    oid = 0
    for c in range(1, 9):
        for i in range(c):
            rows.append((oid, c, base + dt.timedelta(days=c), 100.0 * c))
            oid += 1
    orders = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderdate date, o_totalprice double"
    )
    out = {r.customer: r for r in rfm_segments(orders).collect()}
    assert out[8].segment == "444" and out[1].segment == "111"
    # quartiles of 1..8: strict > cuts -> two customers per bucket
    fs = [out[c].f_score for c in range(1, 9)]
    assert fs == [1, 1, 2, 2, 3, 3, 4, 4]
    assert out[8].recency_days == 0 and out[1].recency_days == 7
