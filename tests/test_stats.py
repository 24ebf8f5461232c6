"""zscore / outlier_filter / quantile_rank unit tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyarrow_ops_spark.functions.stats import (
    ks_drift,
    psi_drift,
    outlier_filter,
    quantile_rank,
    zscore,
)


def test_zscore_global(spark):
    df = spark.createDataFrame([(1, 2.0), (2, 4.0), (3, 6.0)], ["k", "v"])
    # mean 4, stddev_pop sqrt(8/3)
    out = {r["k"]: r["v_z"] for r in zscore(df, "v").collect()}
    sd = (8 / 3) ** 0.5
    assert out[1] == pytest.approx(-2 / sd)
    assert out[2] == pytest.approx(0.0)
    assert out[3] == pytest.approx(2 / sd)


def test_zscore_grouped_and_zero_variance(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", 5.0), ("b", 5.0)], ["g", "v"]
    )
    out = {(r["g"], r["v"]): r["v_z"] for r in zscore(df, "v", ["g"]).collect()}
    assert out[("a", 1.0)] == pytest.approx(-1.0)
    assert out[("a", 3.0)] == pytest.approx(1.0)
    assert out[("b", 5.0)] is None  # zero variance -> null, not inf


def test_outlier_filter(spark):
    rows = [("a", float(v)) for v in [10, 11, 9, 10, 11, 9, 10, 100]]
    df = spark.createDataFrame(rows, ["g", "v"])
    inl = outlier_filter(df, "v", ["g"], k=2.0).collect()
    assert all(r["v"] != 100.0 for r in inl) and len(inl) == 7
    outl = outlier_filter(df, "v", ["g"], k=2.0, keep="outliers").collect()
    assert [r["v"] for r in outl] == [100.0]
    with pytest.raises(ValueError):
        outlier_filter(df, "v", keep="bogus")


def test_outlier_filter_zero_variance_keeps_all(spark):
    df = spark.createDataFrame([("a", 5.0)] * 4, ["g", "v"])
    assert outlier_filter(df, "v", ["g"]).count() == 4


def test_quantile_rank(spark):
    df = spark.createDataFrame(
        [("a", 10.0), ("a", 20.0), ("a", 30.0), ("b", 7.0)], ["g", "v"]
    )
    out = {(r["g"], r["v"]): r["v_qrank"] for r in quantile_rank(df, "v", ["g"]).collect()}
    assert out[("a", 10.0)] == 0.0
    assert out[("a", 20.0)] == 0.5
    assert out[("a", 30.0)] == 1.0
    assert out[("b", 7.0)] == 0.0  # single-row group


def test_zscore_plan_has_no_window_exchange(spark):
    # the moments attach via broadcast join, not Window.partitionBy
    df = spark.range(100).select((F.col("id") % 5).alias("g"), F.col("id").cast("double").alias("v"))
    plan = zscore(df, "v", ["g"])._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan


def test_zscore_keeps_null_group_rows(spark):
    from pyarrow_ops_spark.functions.stats import zscore, outlier_filter

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), (None, 10.0), (None, 20.0), (None, 30.0)],
        "g string, v double",
    )
    z = zscore(df, "v", by=["g"])
    assert z.count() == 5  # NULL-group rows must not vanish
    nulls = {r.v: r.v_z for r in z.filter(F.col("g").isNull()).collect()}
    assert len(nulls) == 3
    # stats computed within the NULL group: mean 20, std ~8.165
    assert abs(nulls[20.0]) < 1e-9
    assert nulls[10.0] < 0 < nulls[30.0]
    assert outlier_filter(df, "v", by=["g"], k=3.0).count() == 5


class TestWinsorize:
    def test_global_clip(self, spark):
        from pyarrow_ops_spark.functions.stats import winsorize
        from pyspark.sql import functions as F

        df = spark.createDataFrame([(i, float(i)) for i in range(1, 101)], "id long, v double")
        out = winsorize(df, "v", lower=0.1, upper=0.9)
        rows = {r.id: r.v_w for r in out.collect()}
        # exact interpolated p10/p90 of 1..100 = 10.9 / 90.1
        assert rows[1] == pytest.approx(10.9)
        assert rows[100] == pytest.approx(90.1)
        assert rows[50] == pytest.approx(50.0)

    def test_grouped_and_nulls(self, spark):
        from pyarrow_ops_spark.functions.stats import winsorize
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [("a", 1.0), ("a", 2.0), ("a", 100.0), ("b", 5.0), ("b", None)],
            "g string, v double",
        )
        out = winsorize(df, "v", by=["g"], lower=0.0, upper=0.5)
        rows = {(r.g, r.v): r.v_w for r in out.collect()}
        # group a: p50 of (1,2,100) = 2 -> 100 clips to 2
        assert rows[("a", 100.0)] == pytest.approx(2.0)
        assert rows[("a", 1.0)] == pytest.approx(1.0)
        # null passes through unclipped
        assert rows[("b", None)] is None

    def test_bad_bounds_rejected(self, spark):
        from pyarrow_ops_spark.functions.stats import winsorize

        df = spark.createDataFrame([(1.0,)], "v double")
        with pytest.raises(ValueError):
            winsorize(df, "v", lower=0.9, upper=0.1)


class TestRobustZscore:
    def test_outlier_cannot_corrupt_baseline(self, spark):
        from pyarrow_ops_spark.functions.stats import robust_zscore

        # 9 values near 10, one at 1000: the classic mean/std z hides the
        # outlier (it inflates sigma); median/MAD flags it hard
        vals = [9.0, 9.5, 10.0, 10.0, 10.0, 10.5, 10.5, 11.0, 11.0, 1000.0]
        df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "id long, v double")
        out = {r.id: r.v_rz for r in robust_zscore(df, "v").collect()}
        # med = 10.25, mad = 0.5 -> outlier rz ~ 1335
        assert out[9] > 100
        assert abs(out[0]) < 3

    def test_zero_mad_yields_null(self, spark):
        from pyarrow_ops_spark.functions.stats import robust_zscore

        df = spark.createDataFrame([(1, 5.0), (2, 5.0), (3, 5.0)], "id long, v double")
        out = robust_zscore(df, "v").collect()
        assert all(r.v_rz is None for r in out)


def test_profile_table_exact_and_approx(spark):
    from pyarrow_ops_spark.functions.stats import profile_table

    df = spark.createDataFrame(
        [(1, "a", None), (2, "b", 5.0), (3, None, 5.0), (4, "b", 7.5)],
        "id long, s string, v double",
    )
    prof = {r.column: r for r in profile_table(df, exact_distinct=True).collect()}
    assert set(prof) == {"id", "s", "v"}
    assert prof["id"].n_rows == 4 and prof["id"].n_nulls == 0
    assert prof["id"].n_distinct == 4
    assert prof["id"].min_value == "1" and prof["id"].max_value == "4"
    assert prof["s"].n_nulls == 1 and prof["s"].n_distinct == 2
    assert prof["v"].n_nulls == 1 and prof["v"].n_distinct == 2
    assert prof["v"].min_value == "5.0" and prof["v"].max_value == "7.5"
    # approx mode: same shape, HLL distincts within standard error on 4 rows
    ap = {r.column: r for r in profile_table(df).collect()}
    assert ap["id"].n_distinct == 4
    # single pass, no shuffle of the table: plan has exactly one pair of
    # hash aggregates and no Exchange keyed on data columns
    plan = (
        profile_table(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange hashpartitioning" not in plan


def test_profile_table_empty_columns_raises(spark):
    import pytest as _pytest

    from pyarrow_ops_spark.functions.stats import profile_table

    df = spark.range(3)
    with _pytest.raises(ValueError):
        profile_table(df, [])


def test_histogram_equidepth_balanced_and_complete(spark):
    from pyarrow_ops_spark.functions.stats import histogram_equidepth

    df = spark.range(1000).select((F.col("id") * 3 % 997).alias("v"))
    out = histogram_equidepth(df, "v", n_buckets=10).collect()
    assert sum(r.n_rows for r in out) == 1000
    # equal depth within interpolation slack
    assert all(80 <= r.n_rows <= 120 for r in out), out
    # buckets tile the range in order without overlap
    rows = sorted(out, key=lambda r: r.bucket)
    for a, b in zip(rows, rows[1:]):
        assert a.hi <= b.lo


def test_histogram_equidepth_nulls_dropped_and_bad_k(spark):
    import pytest as _pytest

    from pyarrow_ops_spark.functions.stats import histogram_equidepth

    df = spark.createDataFrame([(1.0,), (None,), (2.0,), (3.0,), (4.0,)], "v double")
    out = histogram_equidepth(df, "v", n_buckets=2).collect()
    assert sum(r.n_rows for r in out) == 4
    with _pytest.raises(ValueError):
        histogram_equidepth(df, "v", n_buckets=1)


def test_histogram_equidepth_awkward_column_name(spark):
    # names needing backticks (spaces, hyphens) must resolve as ONE
    # identifier inside the percentile expr, not misparse
    from pyarrow_ops_spark.functions.stats import histogram_equidepth

    df = spark.createDataFrame(
        [(float(i),) for i in range(20)], ["total price-usd"]
    )
    out = histogram_equidepth(df, "total price-usd", n_buckets=4).collect()
    assert sum(r.n_rows for r in out) == 20
    assert len(out) == 4


def test_ks_drift_identical_and_disjoint(spark):
    a = spark.createDataFrame([(float(v),) for v in range(100)], ["v"])
    same = ks_drift(a, a, "v").collect()[0]
    # identical slices: every cumulative fraction matches exactly
    assert same["ks_d"] == 0.0 and same["n_a"] == 100 and same["n_b"] == 100
    b = spark.createDataFrame([(float(v) + 1000.0,) for v in range(100)], ["v"])
    far = ks_drift(a, b, "v").collect()[0]
    # disjoint supports: the CDF gap reaches 1 at the boundary
    assert far["ks_d"] == 1.0


def test_ks_drift_degenerate_constant_column(spark):
    a = spark.createDataFrame([(5.0,), (5.0,)], ["v"])
    b = spark.createDataFrame([(5.0,), (5.0,), (5.0,)], ["v"])
    row = ks_drift(a, b, "v").collect()[0]
    # mn == mx collapses to bin 0 where both CDFs hit 1 together
    assert row["ks_bin"] == 0 and row["ks_d"] == 0.0
    with pytest.raises(ValueError):
        ks_drift(a, b, "v", bins=1)


def test_ks_drift_matches_scipy_style_exact(spark):
    # a shifted distribution: exact two-sample KS on the raw values is
    # max gap over pooled points; the 256-bin statistic must lower-bound
    # it and sit within one bin's mass of it
    av = [float(v) for v in range(50)]
    bv = [float(v) + 10.0 for v in range(50)]
    a = spark.createDataFrame([(v,) for v in av], ["v"])
    b = spark.createDataFrame([(v,) for v in bv], ["v"])
    got = ks_drift(a, b, "v").collect()[0]["ks_d"]
    import bisect

    pooled = sorted(set(av + bv))
    exact = max(
        abs(
            bisect.bisect_right(sorted(av), x) / len(av)
            - bisect.bisect_right(sorted(bv), x) / len(bv)
        )
        for x in pooled
    )
    assert got <= exact + 1e-9
    assert got >= exact - (1.0 / 50) - 1e-9  # within one sample point's mass


def test_psi_drift_identical_and_shifted(spark):
    a = spark.createDataFrame([(float(v),) for v in range(1000)], ["v"])
    rows = psi_drift(a, a, "v").collect()
    # identical slices: every bin's proportions match -> each psi_bin == 0
    assert len(rows) == 8
    assert all(r["psi_bin"] == 0.0 for r in rows)
    assert sum(r["c_a"] for r in rows) == 1000
    b = spark.createDataFrame([(float(v) + 600.0,) for v in range(1000)], ["v"])
    shifted = psi_drift(a, b, "v").collect()
    total = sum(r["psi_bin"] for r in shifted)
    # a 60% shift is a "major" drift: PSI far above the 0.25 alert bar
    assert total > 0.25
    with pytest.raises(ValueError):
        psi_drift(a, b, "v", bins=1)


def test_psi_drift_empty_bin_is_finite(spark):
    a = spark.createDataFrame([(float(v),) for v in range(80)], ["v"])
    # b entirely in a's top bin: 7 of a's bins are empty on the b side
    b = spark.createDataFrame([(79.0,)] * 40, ["v"])
    rows = psi_drift(a, b, "v").collect()
    assert all(r["psi_bin"] is not None for r in rows)
    import math

    assert all(math.isfinite(r["psi_bin"]) for r in rows)


def test_psi_drift_matches_duckdb_formula(spark, duck):
    """Engine congruence against the exact SQL mirror (the future oracle):
    equi-depth cuts on the reference via quantile_cont (same linear
    interpolation as Spark's percentile; i/8 fractions exact binary),
    <=-CASE assignment, greatest(c, 0.5)/n continuity clamp, one shared
    rounded psi expression."""
    from pyarrow_ops_spark.sources.tables import load_table
    from tests.conftest import ORACLE_SF_DIR, rows_to_set

    orders = load_table(spark, "orders", ORACLE_SF_DIR)
    got = psi_drift(
        orders.filter(F.col("o_orderstatus") == "F"),
        orders.filter(F.col("o_orderstatus") == "O"),
        "o_totalprice",
    )
    sql = """
    WITH c AS (
        SELECT quantile_cont(o_totalprice,
                             [0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875])
                   AS cuts
        FROM o_orders WHERE o_orderstatus = 'F' AND o_totalprice IS NOT NULL
    ),
    u AS (
        SELECT CAST(o_totalprice AS DOUBLE) AS v, 0 AS s FROM o_orders
        WHERE o_orderstatus = 'F' AND o_totalprice IS NOT NULL
        UNION ALL
        SELECT CAST(o_totalprice AS DOUBLE) AS v, 1 AS s FROM o_orders
        WHERE o_orderstatus = 'O' AND o_totalprice IS NOT NULL
    ),
    assigned AS (
        SELECT CASE WHEN v <= cuts[1] THEN 0
                    WHEN v <= cuts[2] THEN 1
                    WHEN v <= cuts[3] THEN 2
                    WHEN v <= cuts[4] THEN 3
                    WHEN v <= cuts[5] THEN 4
                    WHEN v <= cuts[6] THEN 5
                    WHEN v <= cuts[7] THEN 6
                    ELSE 7 END AS bin, s
        FROM u CROSS JOIN c WHERE v IS NOT NULL
    ),
    cnt AS (
        SELECT bin,
               sum(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS ca,
               sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS cb
        FROM assigned GROUP BY bin
    ),
    tot AS (
        SELECT bin, ca, cb,
               sum(ca) OVER () AS na, sum(cb) OVER () AS nb
        FROM cnt
    )
    SELECT CAST(bin AS INT) AS bin,
           CAST(ca AS BIGINT) AS c_a, CAST(cb AS BIGINT) AS c_b,
           round( (greatest(CAST(ca AS DOUBLE), 0.5) / na
                   - greatest(CAST(cb AS DOUBLE), 0.5) / nb)
                  * ln( (greatest(CAST(ca AS DOUBLE), 0.5) / na)
                        / (greatest(CAST(cb AS DOUBLE), 0.5) / nb) ), 6)
               AS psi_bin
    FROM tot ORDER BY bin
    """
    scols = list(got.columns)
    srows = [tuple(r) for r in got.collect()]
    res = duck.execute(sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(scols) == sorted(dcols)
    assert rows_to_set(scols, srows) == rows_to_set(dcols, drows)


def test_ks_drift_by_group(spark):
    rows = (
        [("s1", float(v)) for v in range(100)]            # s1 slice-a
        + [("s2", float(v)) for v in range(100)]          # s2 slice-a
    )
    a = spark.createDataFrame(rows, ["g", "v"])
    b = spark.createDataFrame(
        [("s1", float(v)) for v in range(100)]            # s1 identical
        + [("s2", float(v) + 1000.0) for v in range(100)],  # s2 disjoint
        ["g", "v"],
    )
    out = {r["g"]: r for r in ks_drift(a, b, "v", by=["g"]).collect()}
    assert out["s1"]["ks_d"] == 0.0
    assert out["s2"]["ks_d"] == 1.0
    assert out["s1"]["n_a"] == 100 and out["s1"]["n_b"] == 100


def test_ks_drift_by_matches_duckdb_formula(spark, duck):
    """Per-group congruence against the exact SQL mirror (the future
    per-source oracle): group-wise min/max bounds, partitioned CDF
    windows, per-group argmax by (rounded gap desc, bin)."""
    from pyarrow_ops_spark.sources.tables import load_table
    from tests.conftest import ORACLE_SF_DIR, rows_to_set

    docs = load_table(spark, "documents", ORACLE_SF_DIR)
    got = ks_drift(
        docs.filter(F.col("lang") == "en"),
        docs.filter(F.col("lang") != "en"),
        "n_chars",
        bins=64,
        by=["source"],
    )
    sql = """
    WITH u AS (
        SELECT source, CAST(n_chars AS DOUBLE) AS v, 0 AS s FROM o_documents
        WHERE lang = 'en' AND n_chars IS NOT NULL
        UNION ALL
        SELECT source, CAST(n_chars AS DOUBLE) AS v, 1 AS s FROM o_documents
        WHERE lang != 'en' AND n_chars IS NOT NULL
    ),
    st AS (SELECT source, min(v) AS mn, max(v) AS mx FROM u GROUP BY source),
    b AS (SELECT u.source,
                 CASE WHEN mx = mn THEN 0
                      ELSE greatest(0, least(63,
                               CAST(floor((v - mn) * 64 / (mx - mn))
                                    AS BIGINT)))
                 END AS bin, s
          FROM u JOIN st ON u.source = st.source),
    c AS (SELECT source, bin,
                 sum(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS ca,
                 sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS cb
          FROM b GROUP BY source, bin),
    g AS (SELECT source, bin,
                 sum(ca) OVER (PARTITION BY source ORDER BY bin) AS cuma,
                 sum(cb) OVER (PARTITION BY source ORDER BY bin) AS cumb,
                 sum(ca) OVER (PARTITION BY source) AS na,
                 sum(cb) OVER (PARTITION BY source) AS nb
          FROM c),
    d AS (SELECT source,
                 CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
                 CAST(bin AS INT) AS ks_bin,
                 round(abs(CAST(cuma AS DOUBLE) / na
                           - CAST(cumb AS DOUBLE) / nb), 6) AS ks_d,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY round(abs(CAST(cuma AS DOUBLE) / na
                                              - CAST(cumb AS DOUBLE) / nb), 6)
                                             DESC, bin) AS rn
          FROM g WHERE na > 0 AND nb > 0)
    SELECT source, n_a, n_b, ks_bin, ks_d FROM d WHERE rn = 1
    """
    scols = list(got.columns)
    srows = [tuple(r) for r in got.collect()]
    res = duck.execute(sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(scols) == sorted(dcols)
    assert len(srows) == len(drows)
    assert rows_to_set(scols, srows) == rows_to_set(dcols, drows)


def test_psi_drift_by_group(spark):
    a = spark.createDataFrame(
        [("s1", float(v)) for v in range(200)]
        + [("s2", float(v)) for v in range(200)],
        ["g", "v"],
    )
    b = spark.createDataFrame(
        [("s1", float(v)) for v in range(200)]              # identical
        + [("s2", float(v) + 150.0) for v in range(200)]    # shifted
        + [("s3", 1.0)],                                     # no reference
        ["g", "v"],
    )
    rows = psi_drift(a, b, "v", by=["g"]).collect()
    groups = {r["g"] for r in rows}
    assert groups == {"s1", "s2"}  # s3 has no reference cuts -> dropped
    s1_total = sum(r["psi_bin"] for r in rows if r["g"] == "s1")
    s2_total = sum(r["psi_bin"] for r in rows if r["g"] == "s2")
    assert s1_total == 0.0
    assert s2_total > 0.25


def test_ks_drift_one_sided_groups_dropped(spark):
    # r11 ADVICE: a group present in only one slice used to surface a NaN
    # ks_d row (cum/0 -> NaN, and NaN sorts above all doubles in Spark's
    # desc order) — one-sided groups are now dropped before the argmax
    a = spark.createDataFrame(
        [("both", float(v)) for v in range(50)]
        + [("a_only", float(v)) for v in range(50)],
        ["g", "v"],
    )
    b = spark.createDataFrame(
        [("both", float(v) + 5.0) for v in range(50)]
        + [("b_only", float(v)) for v in range(50)],
        ["g", "v"],
    )
    rows = ks_drift(a, b, "v", by=["g"]).collect()
    assert {r["g"] for r in rows} == {"both"}
    import math

    assert all(math.isfinite(r["ks_d"]) for r in rows)


def test_ks_drift_empty_slice_yields_empty(spark):
    a = spark.createDataFrame([(float(v),) for v in range(20)], ["v"])
    empty = spark.createDataFrame([], "v double")
    assert ks_drift(a, empty, "v").count() == 0
    assert ks_drift(empty, a, "v").count() == 0


def test_psi_drift_b_only_empty_dropped(spark):
    # r11 ADVICE: a by-group with reference rows but ZERO comparison rows
    # used to emit pb = Inf -> NaN/-Inf psi_bin rows; now dropped,
    # symmetric to the no-reference-cuts drop for b-only groups
    a = spark.createDataFrame(
        [("both", float(v)) for v in range(80)]
        + [("a_only", float(v)) for v in range(80)],
        ["g", "v"],
    )
    b = spark.createDataFrame([("both", float(v)) for v in range(80)], ["g", "v"])
    rows = psi_drift(a, b, "v", by=["g"]).collect()
    assert {r["g"] for r in rows} == {"both"}
    import math

    assert all(math.isfinite(r["psi_bin"]) for r in rows)
    # and a globally empty comparison slice yields an empty result
    empty = spark.createDataFrame([], "v double")
    a_plain = spark.createDataFrame([(float(v),) for v in range(80)], ["v"])
    assert psi_drift(a_plain, empty, "v").count() == 0


def test_chi2_drift_identical_and_shifted(spark):
    from pyarrow_ops_spark.functions.stats import chi2_drift

    rows = [(["en", "de", "fr"][v % 3],) for v in range(300)]
    a = spark.createDataFrame(rows, ["lang"])
    same = chi2_drift(a, a, "lang").collect()[0]
    assert same["chi2"] == 0.0
    assert same["n_a"] == same["n_b"] == 300
    assert same["n_categories"] == 3
    # b collapses entirely onto one category: massive drift
    b = spark.createDataFrame([("en",)] * 300, ["lang"])
    shifted = chi2_drift(a, b, "lang").collect()[0]
    assert shifted["chi2"] > 100.0
    assert shifted["n_categories"] == 3  # de/fr occupied by slice a


def test_chi2_drift_nulls_dropped_and_one_sided_groups(spark):
    from pyarrow_ops_spark.functions.stats import chi2_drift

    a = spark.createDataFrame(
        [("g1", "en"), ("g1", "de"), ("g1", None), ("g2", "en")],
        "g string, lang string",
    )
    b = spark.createDataFrame(
        [("g1", "en"), ("g1", "de"), ("g3", "fr")], "g string, lang string"
    )
    rows = {r["g"]: r for r in chi2_drift(a, b, "lang", by=["g"]).collect()}
    # g2 (a-only) and g3 (b-only) dropped; null category not counted
    assert set(rows) == {"g1"}
    assert rows["g1"]["n_a"] == 2 and rows["g1"]["n_b"] == 2
    assert rows["g1"]["chi2"] == 0.0


def test_chi2_drift_matches_scipy_formula(spark):
    """Cross-check the statistic against the straight textbook formula
    computed in Python on the same contingency table."""
    from pyarrow_ops_spark.functions.stats import chi2_drift

    ca = {"en": 50, "de": 30, "fr": 20}
    cb = {"en": 30, "de": 30, "fr": 40}
    a = spark.createDataFrame([(k,) for k, n in ca.items() for _ in range(n)], ["lang"])
    b = spark.createDataFrame([(k,) for k, n in cb.items() for _ in range(n)], ["lang"])
    got = chi2_drift(a, b, "lang").collect()[0]
    na, nb = sum(ca.values()), sum(cb.values())
    expect = 0.0
    for k in ca:
        tot = ca[k] + cb[k]
        ea, eb = na * tot / (na + nb), nb * tot / (na + nb)
        expect += (ca[k] - ea) ** 2 / ea + (cb[k] - eb) ** 2 / eb
    assert got["chi2"] == pytest.approx(expect, abs=1e-5)


def test_chi2_drift_matches_duckdb_formula(spark, duck):
    """Engine congruence of the registry oracle pattern: per-group chi2
    over the documents source mix, exact BIGINT-scaled term sum."""
    from pyarrow_ops_spark.functions.stats import chi2_drift
    from pyarrow_ops_spark.sources.tables import load_table
    from tests.conftest import ORACLE_SF_DIR, rows_to_set

    docs = load_table(spark, "documents", ORACLE_SF_DIR)
    got = chi2_drift(
        docs.filter(F.col("doc_id") % 2 == 0),
        docs.filter(F.col("doc_id") % 2 == 1),
        "source",
        by=["lang"],
    )
    sql = """
    WITH u AS (
        SELECT lang, CAST(source AS VARCHAR) AS cat, 0 AS s FROM o_documents
        WHERE doc_id % 2 = 0 AND source IS NOT NULL
        UNION ALL
        SELECT lang, CAST(source AS VARCHAR) AS cat, 1 AS s FROM o_documents
        WHERE doc_id % 2 = 1 AND source IS NOT NULL
    ),
    c AS (SELECT lang, cat,
                 sum(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS ca,
                 sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS cb
          FROM u GROUP BY lang, cat),
    t AS (SELECT lang, cat, ca, cb,
                 sum(ca) OVER (PARTITION BY lang) AS na,
                 sum(cb) OVER (PARTITION BY lang) AS nb
          FROM c),
    f AS (SELECT * FROM t WHERE na > 0 AND nb > 0),
    x AS (SELECT lang, na, nb,
                 CAST(floor(
                   ( ((ca - (CAST(na AS DOUBLE) * (ca + cb)) / (na + nb))
                      * (ca - (CAST(na AS DOUBLE) * (ca + cb)) / (na + nb)))
                     / ((CAST(na AS DOUBLE) * (ca + cb)) / (na + nb))
                   + ((cb - (CAST(nb AS DOUBLE) * (ca + cb)) / (na + nb))
                      * (cb - (CAST(nb AS DOUBLE) * (ca + cb)) / (na + nb)))
                     / ((CAST(nb AS DOUBLE) * (ca + cb)) / (na + nb))
                   ) * 1000000000.0) AS BIGINT) AS ci
          FROM f)
    SELECT lang, CAST(max(na) AS BIGINT) AS n_a, CAST(max(nb) AS BIGINT) AS n_b,
           CAST(count(*) AS BIGINT) AS n_categories,
           round(CAST(sum(ci) AS DOUBLE) / 1000000000.0, 6) AS chi2
    FROM x GROUP BY lang
    """
    scols = list(got.columns)
    srows = [tuple(r) for r in got.collect()]
    res = duck.execute(sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(scols) == sorted(dcols)
    assert len(srows) == len(drows)
    assert rows_to_set(scols, srows) == rows_to_set(dcols, drows)


def test_embedding_drift_identical_and_shifted(spark):
    from pyarrow_ops_spark.functions.stats import embedding_drift

    import random

    rng = random.Random(7)
    vecs = [[rng.uniform(-1, 1) for _ in range(8)] for _ in range(200)]
    a = spark.createDataFrame([(v,) for v in vecs], ["emb"])
    same = embedding_drift(a, a, "emb").collect()[0]
    assert same["centroid_cos"] == 1.0
    assert same["norm_ks_d"] == 0.0
    assert same["n_a"] == same["n_b"] == 200
    # scale every vector 3x AND flip sign of the first coordinate:
    # norms shift (KS fires), centroid direction moves (cos < 1)
    shifted = [[-3.0 * v[0]] + [3.0 * x for x in v[1:]] for v in vecs]
    b = spark.createDataFrame([(v,) for v in shifted], ["emb"])
    moved = embedding_drift(a, b, "emb").collect()[0]
    assert moved["norm_ks_d"] > 0.9  # 3x norm scale = near-total separation
    assert moved["centroid_cos"] < 1.0


def test_embedding_drift_null_element_vectors_excluded(spark):
    """NULL contract (r13 ADVICE #1): a vector containing a NULL ELEMENT
    is excluded from BOTH statistics up front — without the forall guard
    Spark's higher-order aggregate folds a NULL norm (dropping the row
    from the norm-KS only) while DuckDB's list_sum skips the element and
    keeps the row, a latent engine/oracle divergence. The statistic over
    a corpus with NULL-element vectors must equal the statistic over the
    clean subset, and n_a/n_b must count only clean vectors."""
    from pyarrow_ops_spark.functions.stats import embedding_drift

    import random

    rng = random.Random(11)
    clean = [[rng.uniform(-1, 1) for _ in range(6)] for _ in range(80)]
    a_rows = [(v,) for v in clean[:40]] + [([0.5, None, 0.5, 0.5, 0.5, 0.5],)] * 3
    b_rows = [(v,) for v in clean[40:]] + [([None] * 6,), (None,)]
    schema = "emb array<double>"
    a, b = (spark.createDataFrame(r, schema) for r in (a_rows, b_rows))
    a_clean = spark.createDataFrame([(v,) for v in clean[:40]], schema)
    b_clean = spark.createDataFrame([(v,) for v in clean[40:]], schema)
    got = embedding_drift(a, b, "emb").collect()[0]
    want = embedding_drift(a_clean, b_clean, "emb").collect()[0]
    assert tuple(got) == tuple(want)
    assert (got["n_a"], got["n_b"]) == (40, 40)


def test_embedding_drift_matches_numpy(spark):
    from pyarrow_ops_spark.functions.stats import embedding_drift

    import numpy as np

    rng = np.random.RandomState(3)
    va = rng.randn(150, 6)
    vb = rng.randn(150, 6) + 0.5
    a = spark.createDataFrame([(list(map(float, v)),) for v in va], ["emb"])
    b = spark.createDataFrame([(list(map(float, v)),) for v in vb], ["emb"])
    got = embedding_drift(a, b, "emb").collect()[0]
    ca, cb = va.mean(axis=0), vb.mean(axis=0)
    cos = float(ca @ cb / (np.linalg.norm(ca) * np.linalg.norm(cb)))
    assert got["centroid_cos"] == pytest.approx(cos, abs=1e-3)
    assert 0.0 <= got["norm_ks_d"] <= 1.0


def test_emd_drift_identity_shift_and_degenerate(spark):
    from pyarrow_ops_spark.functions.stats import emd_drift

    a = spark.createDataFrame([(float(v),) for v in range(100)], ["v"])
    same = emd_drift(a, a, "v").collect()[0]
    assert same["emd"] == 0.0 and same["emd_norm"] == 0.0
    # shift by exactly 10 with FIXED bounds wide enough to hold both:
    # W1 of a pure translation is the shift size; binned reading within
    # one bin width (range 110 / 64 bins ~ 1.72)
    b = spark.createDataFrame([(float(v) + 10.0,) for v in range(100)], ["v"])
    got = emd_drift(a, b, "v", bins=64, lo=0.0, hi=110.0).collect()[0]
    assert abs(got["emd"] - 10.0) <= 110.0 / 64 + 1e-6
    assert got["n_a"] == got["n_b"] == 100
    # degenerate single-value slices still emit a zero row
    c = spark.createDataFrame([(5.0,)] * 10, ["v"])
    deg = emd_drift(c, c, "v").collect()[0]
    assert deg["emd"] == 0.0 and deg["emd_norm"] == 0.0


def test_emd_drift_matches_numpy_integral(spark):
    """Binned W1 equals the numpy trapz-free rectangle integral of
    |CDF_a - CDF_b| computed on the same binning."""
    import numpy as np

    from pyarrow_ops_spark.functions.stats import emd_drift

    rng = np.random.RandomState(11)
    va = np.round(rng.uniform(0, 100, 400), 3)
    vb = np.round(rng.uniform(20, 140, 300), 3)
    a = spark.createDataFrame([(float(v),) for v in va], ["v"])
    b = spark.createDataFrame([(float(v),) for v in vb], ["v"])
    bins = 128
    got = emd_drift(a, b, "v", bins=bins).collect()[0]
    mn, mx = min(va.min(), vb.min()), max(va.max(), vb.max())
    w = (mx - mn) / bins
    idx = lambda v: np.minimum(  # noqa: E731
        bins - 1, np.maximum(0, np.floor((v - mn) * bins / (mx - mn)))
    ).astype(int)
    ca = np.bincount(idx(va), minlength=bins)
    cb = np.bincount(idx(vb), minlength=bins)
    gaps = np.abs(np.cumsum(ca) / len(va) - np.cumsum(cb) / len(vb))
    expect = float(gaps[:-1].sum() * w)  # each gap persists one bin width
    assert got["emd"] == pytest.approx(expect, abs=1e-4)


def test_emd_drift_by_group_and_one_sided(spark):
    from pyarrow_ops_spark.functions.stats import emd_drift

    a = spark.createDataFrame(
        [("g1", float(v)) for v in range(50)]
        + [("g2", float(v)) for v in range(50)]
        + [("only_a", 1.0)],
        "g string, v double",
    )
    b = spark.createDataFrame(
        [("g1", float(v)) for v in range(50)]          # identical
        + [("g2", float(v) + 25.0) for v in range(50)],  # shifted
        "g string, v double",
    )
    rows = {r["g"]: r for r in emd_drift(a, b, "v", by=["g"]).collect()}
    assert set(rows) == {"g1", "g2"}
    assert rows["g1"]["emd"] == 0.0
    assert rows["g2"]["emd"] > 10.0


def test_emd_drift_matches_duckdb_formula(spark, duck):
    """Engine congruence of the binned-W1 formula (the future oracle):
    same binning expression, lead() spans over occupied bins, BIGINT-
    scaled term sum."""
    from pyarrow_ops_spark.functions.stats import emd_drift
    from pyarrow_ops_spark.sources.tables import load_table
    from tests.conftest import ORACLE_SF_DIR, rows_to_set

    orders = load_table(spark, "orders", ORACLE_SF_DIR)
    got = emd_drift(
        orders.filter(F.col("o_orderstatus") == "F"),
        orders.filter(F.col("o_orderstatus") == "O"),
        "o_totalprice",
        bins=64,
    )
    sql = """
    WITH u AS (
        SELECT CAST(o_totalprice AS DOUBLE) AS v, 0 AS s FROM o_orders
        WHERE o_orderstatus = 'F' AND o_totalprice IS NOT NULL
        UNION ALL
        SELECT CAST(o_totalprice AS DOUBLE) AS v, 1 AS s FROM o_orders
        WHERE o_orderstatus = 'O' AND o_totalprice IS NOT NULL
    ),
    st AS (SELECT min(v) AS mn, max(v) AS mx FROM u),
    b AS (SELECT CASE WHEN mx = mn THEN 0
                      ELSE greatest(0, least(63,
                               CAST(floor((v - mn) * 64 / (mx - mn))
                                    AS BIGINT)))
                 END AS bin, (mx - mn) / 64 AS w, s
          FROM u CROSS JOIN st),
    c AS (SELECT bin, max(w) AS w,
                 sum(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS ca,
                 sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS cb
          FROM b GROUP BY bin),
    g AS (SELECT bin, w,
                 sum(ca) OVER (ORDER BY bin) AS cuma,
                 sum(cb) OVER (ORDER BY bin) AS cumb,
                 sum(ca) OVER () AS na, sum(cb) OVER () AS nb,
                 coalesce(lead(bin) OVER (ORDER BY bin), bin) AS nxt
          FROM c),
    x AS (SELECT na, nb, w * 64 AS rng,
                 CAST(floor(abs(CAST(cuma AS DOUBLE) / na
                                - CAST(cumb AS DOUBLE) / nb)
                            * (nxt - bin) * w * 1000000000.0) AS BIGINT) AS ti
          FROM g WHERE na > 0 AND nb > 0)
    SELECT CAST(max(na) AS BIGINT) AS n_a, CAST(max(nb) AS BIGINT) AS n_b,
           round(CAST(sum(ti) AS DOUBLE) / 1000000000.0, 6) AS emd,
           round(CASE WHEN max(rng) > 0
                      THEN (CAST(sum(ti) AS DOUBLE) / 1000000000.0) / max(rng)
                      ELSE 0.0 END, 6) AS emd_norm
    FROM x
    """
    scols = list(got.columns)
    srows = [tuple(r) for r in got.collect()]
    res = duck.execute(sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(scols) == sorted(dcols)
    assert rows_to_set(scols, srows) == rows_to_set(dcols, drows)


def test_drift_report_long_format(spark):
    from pyarrow_ops_spark.functions.stats import drift_report

    a = spark.createDataFrame(
        [(float(v), ["en", "de"][v % 2]) for v in range(200)], "n double, lang string"
    )
    b = spark.createDataFrame(
        [(float(v) + 100.0, "en") for v in range(200)], "n double, lang string"
    )
    rows = drift_report(a, b, numeric=["n"], categorical=["lang"]).collect()
    got = {(r["column"], r["metric"]): r for r in rows}
    assert set(got) == {("n", "ks_d"), ("n", "psi"), ("n", "emd_norm"), ("lang", "chi2")}
    # a 50% translation: every monitor fires
    assert got[("n", "ks_d")]["value"] > 0.3
    assert got[("n", "psi")]["value"] > 0.25
    assert got[("n", "emd_norm")]["value"] > 0.2
    assert got[("lang", "chi2")]["value"] > 50.0
    assert all(r["n_a"] == 200 and r["n_b"] == 200 for r in rows)
    # identity: every metric reads 0
    same = drift_report(a, a, numeric=["n"], categorical=["lang"]).collect()
    assert all(r["value"] == 0.0 for r in same)
    with pytest.raises(ValueError):
        drift_report(a, b)


def test_drift_report_one_sided_is_empty(spark):
    from pyarrow_ops_spark.functions.stats import drift_report

    a = spark.createDataFrame([(float(v), "en") for v in range(20)], "n double, lang string")
    empty = spark.createDataFrame([], "n double, lang string")
    assert drift_report(a, empty, numeric=["n"], categorical=["lang"]).count() == 0


def test_drift_report_psi_total_is_bigint_scaled_sum(spark):
    """r12 verdict: drift_report's psi must follow the family standard —
    BIGINT-scale each per-bin term before the sum. Pinned BIT-EXACTLY
    against the same Spark expression evaluated over psi_drift's output
    (not approx: both sides sum exact integers, so == holds)."""
    from pyarrow_ops_spark.functions.stats import drift_report, psi_drift

    a = spark.createDataFrame([(float(v),) for v in range(500)], ["n"])
    b = spark.createDataFrame([(float(v) * 1.3 + 40.0,) for v in range(500)], ["n"])
    got = {
        r["metric"]: r["value"]
        for r in drift_report(a, b, numeric=["n"]).collect()
    }
    expected = psi_drift(a, b, "n", bins=8).agg(
        F.round(
            F.sum(F.floor(F.col("psi_bin") * F.lit(1e9)).cast("long")).cast(
                "double"
            )
            / F.lit(1e9),
            6,
        ).alias("psi")
    ).collect()[0]["psi"]
    assert got["psi"] == expected


def test_drift_report_equals_per_column_monitors(spark):
    """The r14 shared-scan rewrite (melt + by=['column'] group mode) must
    be BIT-IDENTICAL to composing the single-column monitors — group mode
    computes each column's own min/max / cuts / totals through the same
    expressions, so == holds, not approx. Four numeric + two categorical
    columns, including a column with NULLs and one with a different
    scale, so per-column bounds/cuts genuinely differ."""
    from pyarrow_ops_spark.functions.stats import (
        chi2_drift,
        drift_report,
        emd_drift,
        ks_drift,
        psi_drift,
    )

    import random

    rng = random.Random(42)
    rows_a = [
        (
            float(v),
            rng.uniform(0, 1e4),
            float(v % 17),
            rng.gauss(0, 1) if v % 7 else None,
            ["en", "de", "fr"][v % 3],
            ["web", "pdf"][v % 2],
        )
        for v in range(400)
    ]
    rows_b = [
        (
            float(v) * 1.2 + 30.0,
            rng.uniform(100, 2e4),
            float(v % 23),
            rng.gauss(0.5, 2) if v % 5 else None,
            ["en", "de", "fr", "es"][v % 4],
            ["web", "pdf", "ocr"][v % 3],
        )
        for v in range(300)
    ]
    schema = "n1 double, n2 double, n3 double, n4 double, c1 string, c2 string"
    a = spark.createDataFrame(rows_a, schema)
    b = spark.createDataFrame(rows_b, schema)
    got = {
        (r["column"], r["metric"]): (r["n_a"], r["n_b"], r["value"])
        for r in drift_report(
            a, b, numeric=["n1", "n2", "n3", "n4"], categorical=["c1", "c2"]
        ).collect()
    }
    assert len(got) == 4 * 3 + 2
    for col in ["n1", "n2", "n3", "n4"]:
        ks = ks_drift(a, b, col, bins=64).collect()[0]
        assert got[(col, "ks_d")] == (ks["n_a"], ks["n_b"], ks["ks_d"]), col
        emd = emd_drift(a, b, col, bins=64).collect()[0]
        assert got[(col, "emd_norm")] == (
            emd["n_a"], emd["n_b"], emd["emd_norm"],
        ), col
        prows = psi_drift(a, b, col, bins=8).collect()
        n_a = sum(r["c_a"] for r in prows)
        n_b = sum(r["c_b"] for r in prows)
        import math

        psi = round(
            sum(math.floor(r["psi_bin"] * 1e9) for r in prows) / 1e9, 6
        )
        assert got[(col, "psi")] == (n_a, n_b, psi), col
    for col in ["c1", "c2"]:
        chi = chi2_drift(a, b, col).collect()[0]
        assert got[(col, "chi2")] == (chi["n_a"], chi["n_b"], chi["chi2"]), col


def test_drift_report_embeddings_arm_matches_duckdb(spark, duck):
    """The r14 embeddings arm: drift_report(embeddings=['embedding'])
    emits the two embedding_drift statistics as long-format rows, engine-
    congruent with the DuckDB oracle (same exact-integer arithmetic as
    the certified stats_embedding_drift row, reshaped to the report's
    (column, metric, n_a, n_b, value) shape)."""
    from pyarrow_ops_spark.functions.stats import drift_report
    from pyarrow_ops_spark.sources.tables import load_table
    from tests.conftest import ORACLE_SF_DIR, rows_to_set

    emb = load_table(spark, "embeddings", ORACLE_SF_DIR)
    got = drift_report(
        emb.filter(F.col("vec_id") % 2 == 0),
        emb.filter(F.col("vec_id") % 2 == 1),
        embeddings=["embedding"],
    )
    sql = """
    WITH base AS (
        SELECT vec_id % 2 AS s, embedding AS v FROM o_embeddings
        WHERE embedding IS NOT NULL
          AND len(list_filter(embedding, x -> x IS NULL)) = 0
    ),
    e AS (
        SELECT s, unnest(v) AS x, unnest(range(0, len(v))) AS pos FROM base
    ),
    m AS (
        SELECT s, pos,
               CAST(sum(CAST(floor(CAST(x AS DOUBLE) * 10000000.0)
                             AS BIGINT)) AS DOUBLE)
                   / count(*) / 10000000.0 AS m
        FROM e GROUP BY s, pos
    ),
    cosv AS (
        SELECT round(
            (CAST(sum(CAST(floor(a.m * b.m * 1000000000.0) AS BIGINT))
                  AS DOUBLE) / 1000000000.0)
            / sqrt((CAST(sum(CAST(floor(a.m * a.m * 1000000000.0) AS BIGINT))
                         AS DOUBLE) / 1000000000.0)
                   * (CAST(sum(CAST(floor(b.m * b.m * 1000000000.0) AS BIGINT))
                           AS DOUBLE) / 1000000000.0)),
            4) AS centroid_cos
        FROM (SELECT pos, m FROM m WHERE s = 0) a
        JOIN (SELECT pos, m FROM m WHERE s = 1) b USING (pos)
    ),
    n AS (
        SELECT s,
               sqrt(CAST(list_sum(list_transform(v,
                        x -> CAST(floor(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
                                        * 1000000000.0) AS BIGINT)))
                    AS DOUBLE) / 1000000000.0) AS nv
        FROM base
    ),
    st AS (SELECT min(nv) AS mn, max(nv) AS mx FROM n),
    b2 AS (SELECT CASE WHEN mx = mn THEN 0
                       ELSE greatest(0, least(63,
                                CAST(floor((nv - mn) * 64 / (mx - mn))
                                     AS BIGINT)))
                  END AS bin, s
           FROM n CROSS JOIN st),
    c2 AS (SELECT bin,
                  sum(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS ca,
                  sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS cb
           FROM b2 GROUP BY bin),
    g AS (SELECT bin,
                 sum(ca) OVER (ORDER BY bin) AS cuma,
                 sum(cb) OVER (ORDER BY bin) AS cumb,
                 sum(ca) OVER () AS na, sum(cb) OVER () AS nb
          FROM c2),
    ks AS (
        SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
               round(abs(CAST(cuma AS DOUBLE) / na
                         - CAST(cumb AS DOUBLE) / nb), 6) AS norm_ks_d
        FROM g WHERE na > 0 AND nb > 0
        ORDER BY norm_ks_d DESC, bin LIMIT 1
    )
    SELECT 'embedding' AS "column", 'centroid_cos' AS metric,
           n_a, n_b, centroid_cos AS value
    FROM ks CROSS JOIN cosv
    UNION ALL
    SELECT 'embedding', 'norm_ks_d', n_a, n_b, norm_ks_d FROM ks
    """
    scols = list(got.columns)
    srows = [tuple(r) for r in got.collect()]
    res = duck.execute(sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(scols) == sorted(dcols)
    assert len(srows) == len(drows) == 2
    assert rows_to_set(scols, srows) == rows_to_set(dcols, drows)


def test_chi2_drift_high_cardinality_bounded_plan(spark):
    """r12 verdict: a high-distinct category column must not funnel
    through a one-partition window — slice totals are a broadcast
    aggregate now, so cardinality only widens the distributed category
    aggregate. 150k distinct categories complete with a window-free
    plan."""
    from pyarrow_ops_spark.functions.stats import chi2_drift

    a = spark.range(0, 100_000).select(F.col("id").cast("string").alias("c"))
    b = spark.range(50_000, 150_000).select(F.col("id").cast("string").alias("c"))
    out = chi2_drift(a, b, "c")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    row = out.collect()[0]
    assert row["n_categories"] == 150_000
    assert row["n_a"] == row["n_b"] == 100_000
    assert row["chi2"] > 0.0


def test_psi_drift_approx_mode(spark):
    """approx=True uses the approx_percentile sketch for the reference
    cuts — same plan, memory-bounded at scale. At default accuracy on
    small data the sketch is exact-rank, so the score must agree with
    exact mode to well under the 0.1 'stable' threshold."""
    from pyarrow_ops_spark.functions.stats import psi_drift

    a = spark.createDataFrame([(float(v),) for v in range(2000)], ["v"])
    b = spark.createDataFrame([(float(v) + 400.0,) for v in range(2000)], ["v"])
    exact = sum(r["psi_bin"] for r in psi_drift(a, b, "v").collect())
    approx = sum(r["psi_bin"] for r in psi_drift(a, b, "v", approx=True).collect())
    assert approx == pytest.approx(exact, abs=0.02)
    same = psi_drift(a, a, "v", approx=True).collect()
    assert all(r["psi_bin"] == 0.0 for r in same)


def test_drift_report_matches_duckdb_union(spark, duck):
    """Engine congruence of the full one-call report (the future r14
    oracle): the long-format output equals a UNION of the four certified
    oracle shapes — KS (64 equal-width bins), PSI total (8 equi-depth
    reference cuts, per-bin round-6 then BIGINT-scaled sum, matching
    drift_report's floor(psi_bin*1e9) path), normalized EMD, and chi2 —
    over the even/odd documents split."""
    from pyarrow_ops_spark.functions.stats import drift_report
    from pyarrow_ops_spark.sources.tables import load_table
    from tests.conftest import ORACLE_SF_DIR, rows_to_set

    docs = load_table(spark, "documents", ORACLE_SF_DIR)
    got = drift_report(
        docs.filter(F.col("doc_id") % 2 == 0),
        docs.filter(F.col("doc_id") % 2 == 1),
        numeric=["n_chars"],
        categorical=["lang"],
        bins=64,
        psi_bins=8,
    )
    sql = """
    WITH u AS (
        SELECT CAST(n_chars AS DOUBLE) AS v, 0 AS s FROM o_documents
        WHERE doc_id % 2 = 0 AND n_chars IS NOT NULL
        UNION ALL
        SELECT CAST(n_chars AS DOUBLE) AS v, 1 AS s FROM o_documents
        WHERE doc_id % 2 = 1 AND n_chars IS NOT NULL
    ),
    -- KS arm (64 equal-width bins over pooled min/max)
    st AS (SELECT min(v) AS mn, max(v) AS mx FROM u),
    kb AS (SELECT CASE WHEN mx = mn THEN 0
                       ELSE greatest(0, least(63,
                                CAST(floor((v - mn) * 64 / (mx - mn))
                                     AS BIGINT)))
                  END AS bin, s
           FROM u CROSS JOIN st),
    kc AS (SELECT bin,
                  sum(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS ca,
                  sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS cb
           FROM kb GROUP BY bin),
    kg AS (SELECT bin,
                  sum(ca) OVER (ORDER BY bin) AS cuma,
                  sum(cb) OVER (ORDER BY bin) AS cumb,
                  sum(ca) OVER () AS na, sum(cb) OVER () AS nb
           FROM kc),
    ks AS (SELECT 'n_chars' AS "column", 'ks_d' AS metric,
                  CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
                  round(abs(CAST(cuma AS DOUBLE) / na
                            - CAST(cumb AS DOUBLE) / nb), 6) AS value
           FROM kg WHERE na > 0 AND nb > 0
           ORDER BY value DESC, bin LIMIT 1),
    -- PSI arm (8 equi-depth reference cuts; per-bin round-6 then
    -- BIGINT-scaled sum, the drift_report total path)
    pc AS (SELECT quantile_cont(n_chars,
                   [0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875]) AS cuts
           FROM o_documents WHERE doc_id % 2 = 0 AND n_chars IS NOT NULL),
    pa AS (SELECT CASE WHEN v <= cuts[1] THEN 0
                       WHEN v <= cuts[2] THEN 1
                       WHEN v <= cuts[3] THEN 2
                       WHEN v <= cuts[4] THEN 3
                       WHEN v <= cuts[5] THEN 4
                       WHEN v <= cuts[6] THEN 5
                       WHEN v <= cuts[7] THEN 6
                       ELSE 7 END AS bin, s
           FROM u CROSS JOIN pc),
    pcnt AS (SELECT bin,
                    sum(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS ca,
                    sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS cb
             FROM pa GROUP BY bin),
    pt AS (SELECT bin, ca, cb,
                  sum(ca) OVER () AS na, sum(cb) OVER () AS nb
           FROM pcnt),
    pterm AS (SELECT ca, cb, na, nb,
                     round( (greatest(CAST(ca AS DOUBLE), 0.5) / na
                             - greatest(CAST(cb AS DOUBLE), 0.5) / nb)
                            * ln( (greatest(CAST(ca AS DOUBLE), 0.5) / na)
                                  / (greatest(CAST(cb AS DOUBLE), 0.5) / nb) ),
                            6) AS psi_bin
              FROM pt WHERE na > 0 AND nb > 0),
    psi AS (SELECT 'n_chars' AS "column", 'psi' AS metric,
                   CAST(sum(ca) AS BIGINT) AS n_a,
                   CAST(sum(cb) AS BIGINT) AS n_b,
                   round(CAST(sum(CAST(floor(psi_bin * 1000000000.0)
                                       AS BIGINT)) AS DOUBLE)
                         / 1000000000.0, 6) AS value
            FROM pterm
            HAVING sum(ca) IS NOT NULL),
    -- EMD arm (same 64-bin binning as KS, lead()-span gap integral)
    eg AS (SELECT bin, (SELECT (mx - mn) / 64 FROM st) AS w,
                  sum(ca) OVER (ORDER BY bin) AS cuma,
                  sum(cb) OVER (ORDER BY bin) AS cumb,
                  sum(ca) OVER () AS na, sum(cb) OVER () AS nb,
                  coalesce(lead(bin) OVER (ORDER BY bin), bin) AS nxt
           FROM kc),
    ex AS (SELECT na, nb, w * 64 AS rng,
                  CAST(floor(abs(CAST(cuma AS DOUBLE) / na
                                 - CAST(cumb AS DOUBLE) / nb)
                             * (nxt - bin) * w * 1000000000.0) AS BIGINT)
                      AS ti
           FROM eg WHERE na > 0 AND nb > 0),
    emd AS (SELECT 'n_chars' AS "column", 'emd_norm' AS metric,
                   CAST(max(na) AS BIGINT) AS n_a,
                   CAST(max(nb) AS BIGINT) AS n_b,
                   round(CASE WHEN max(rng) > 0
                              THEN (CAST(sum(ti) AS DOUBLE) / 1000000000.0)
                                   / max(rng)
                              ELSE 0.0 END, 6) AS value
            FROM ex
            HAVING max(na) IS NOT NULL),
    -- chi2 arm (categorical lang mix)
    cu AS (
        SELECT CAST(lang AS VARCHAR) AS cat, 0 AS s FROM o_documents
        WHERE doc_id % 2 = 0 AND lang IS NOT NULL
        UNION ALL
        SELECT CAST(lang AS VARCHAR) AS cat, 1 AS s FROM o_documents
        WHERE doc_id % 2 = 1 AND lang IS NOT NULL
    ),
    cc AS (SELECT cat,
                  sum(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS ca,
                  sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS cb
           FROM cu GROUP BY cat),
    ct AS (SELECT cat, ca, cb,
                  sum(ca) OVER () AS na, sum(cb) OVER () AS nb
           FROM cc),
    cf AS (SELECT * FROM ct WHERE na > 0 AND nb > 0),
    cx AS (SELECT na, nb,
                  CAST(floor(
                    ( ((ca - (CAST(na AS DOUBLE) * (ca + cb)) / (na + nb))
                       * (ca - (CAST(na AS DOUBLE) * (ca + cb)) / (na + nb)))
                      / ((CAST(na AS DOUBLE) * (ca + cb)) / (na + nb))
                    + ((cb - (CAST(nb AS DOUBLE) * (ca + cb)) / (na + nb))
                       * (cb - (CAST(nb AS DOUBLE) * (ca + cb)) / (na + nb)))
                      / ((CAST(nb AS DOUBLE) * (ca + cb)) / (na + nb))
                    ) * 1000000000.0) AS BIGINT) AS ci
           FROM cf),
    chi AS (SELECT 'lang' AS "column", 'chi2' AS metric,
                   CAST(max(na) AS BIGINT) AS n_a,
                   CAST(max(nb) AS BIGINT) AS n_b,
                   round(CAST(sum(ci) AS DOUBLE) / 1000000000.0, 6) AS value
            FROM cx
            HAVING max(na) IS NOT NULL)
    SELECT * FROM ks
    UNION ALL SELECT * FROM psi
    UNION ALL SELECT * FROM emd
    UNION ALL SELECT * FROM chi
    """
    scols = list(got.columns)
    srows = [tuple(r) for r in got.collect()]
    res = duck.execute(sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(scols) == sorted(dcols)
    assert len(srows) == len(drows) == 4
    assert rows_to_set(scols, srows) == rows_to_set(dcols, drows)


def test_two_sample_drift_statistics_are_symmetric(spark):
    """KS, chi2, and EMD are symmetric in their two slices (|gap| and the
    chi2 term are invariant under side swap; only n_a/n_b swap). PSI is
    intentionally NOT symmetric (equi-depth cuts come from the REFERENCE
    side) — pinned here so a refactor can't silently 'fix' it."""
    from pyarrow_ops_spark.functions.stats import (
        chi2_drift,
        emd_drift,
        ks_drift,
        psi_drift,
    )

    a = spark.createDataFrame(
        [(float(v), ["en", "de"][v % 2]) for v in range(300)],
        "v double, lang string",
    )
    b = spark.createDataFrame(
        [(float(v) * 1.4 + 30.0, ["en", "de", "fr"][v % 3]) for v in range(200)],
        "v double, lang string",
    )
    ks_ab = ks_drift(a, b, "v").collect()[0]
    ks_ba = ks_drift(b, a, "v").collect()[0]
    assert (ks_ab["ks_d"], ks_ab["ks_bin"]) == (ks_ba["ks_d"], ks_ba["ks_bin"])
    assert (ks_ab["n_a"], ks_ab["n_b"]) == (ks_ba["n_b"], ks_ba["n_a"])
    emd_ab = emd_drift(a, b, "v").collect()[0]
    emd_ba = emd_drift(b, a, "v").collect()[0]
    assert emd_ab["emd"] == emd_ba["emd"]
    assert emd_ab["emd_norm"] == emd_ba["emd_norm"]
    chi_ab = chi2_drift(a, b, "lang").collect()[0]
    chi_ba = chi2_drift(b, a, "lang").collect()[0]
    assert chi_ab["chi2"] == chi_ba["chi2"]
    assert chi_ab["n_categories"] == chi_ba["n_categories"] == 3
    psi_ab = sum(r["psi_bin"] for r in psi_drift(a, b, "v").collect())
    psi_ba = sum(r["psi_bin"] for r in psi_drift(b, a, "v").collect())
    assert psi_ab != psi_ba  # reference-anchored by design
