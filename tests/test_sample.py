"""Deterministic sampling: partitioning-invariance, fraction edges, strata."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyarrow_ops_spark.operators.sample import sample_hash, sample_stratified


@pytest.fixture(scope="module")
def nums(spark):
    return spark.range(0, 5000).withColumn(
        "grp", (F.col("id") % 4).cast("string")
    )


def test_sample_hash_partitioning_invariant(spark, nums):
    a = sorted(r.id for r in sample_hash(nums, 0.2, ["id"]).collect())
    b = sorted(
        r.id for r in sample_hash(nums.repartition(17), 0.2, ["id"]).collect()
    )
    assert a == b and len(a) > 0


def test_sample_hash_rate_close(spark, nums):
    n = sample_hash(nums, 0.25, ["id"]).count()
    assert abs(n / 5000 - 0.25) < 0.03


def test_sample_hash_edges(spark, nums):
    assert sample_hash(nums, 1.0, ["id"]).count() == 5000
    assert sample_hash(nums, 0.0, ["id"]).count() == 0
    with pytest.raises(ValueError):
        sample_hash(nums, 1.5, ["id"])


def test_sample_hash_seed_rotates(spark, nums):
    a = {r.id for r in sample_hash(nums, 0.2, ["id"]).collect()}
    b = {r.id for r in sample_hash(nums, 0.2, ["id"], seed="v2").collect()}
    assert a != b  # independent draws
    # same seed -> same rows
    c = {r.id for r in sample_hash(nums, 0.2, ["id"], seed="v2").collect()}
    assert b == c


def test_sample_stratified_rates_and_default(spark, nums):
    out = sample_stratified(
        nums, "grp", {"0": 1.0, "1": 0.5, "2": 0.0}, ["id"]
    )
    by_grp = {
        r.grp: r.n
        for r in out.groupBy("grp").agg(F.count("*").alias("n")).collect()
    }
    assert by_grp.get("0") == 1250  # fraction 1.0 keeps every row
    assert by_grp.get("2") is None  # fraction 0.0 keeps none
    assert by_grp.get("3") is None  # default_fraction=0.0
    assert abs(by_grp["1"] / 1250 - 0.5) < 0.06


def test_sample_stratified_consistent_with_plain(spark, nums):
    """A stratum sampled at rate r contains exactly sample_hash(r) rows."""
    strat = {
        r.id
        for r in sample_stratified(nums, "grp", {"1": 0.3}, ["id"]).collect()
    }
    plain = {
        r.id
        for r in sample_hash(nums.filter(F.col("grp") == "1"), 0.3, ["id"]).collect()
    }
    assert strat == plain


# ---------------------------------------------------------------------------
# mix_sources: integer-weight mixture rebalancing
# ---------------------------------------------------------------------------


def test_mix_sources_ratio_and_drop(spark):
    from pyarrow_ops_spark.operators.sample import mix_sources

    rows = (
        [(i, "web") for i in range(4000)]
        + [(i + 10_000, "code") for i in range(1000)]
        + [(i + 20_000, "books") for i in range(500)]
    )
    df = spark.createDataFrame(rows, "id long, domain string")
    out = mix_sources(df, "domain", {"web": 2, "code": 1}, ["id"])
    counts = {
        r["domain"]: r["n"]
        for r in out.groupBy("domain").agg(F.count("id").alias("n")).collect()
    }
    # books has no weight -> dropped entirely
    assert "books" not in counts
    # K = min(4000//2, 1000//1) = 1000 -> targets web 2000, code 1000;
    # realized counts are approximate (hash variance + 2^-16 granularity)
    assert abs(counts["web"] - 2000) < 200
    assert abs(counts["code"] - 1000) < 120
    # no stratum oversampled
    assert counts["web"] <= 4000 and counts["code"] <= 1000


def test_mix_sources_infeasible_raises(spark):
    from pyarrow_ops_spark.operators.sample import mix_sources

    rows = [(i, "web") for i in range(100)] + [(i + 1000, "code") for i in range(5)]
    df = spark.createDataFrame(rows, "id long, domain string")
    with pytest.raises(ValueError, match="infeasible"):
        mix_sources(df, "domain", {"web": 2, "code": 100}, ["id"])


def test_mix_sources_missing_stratum_raises(spark):
    from pyarrow_ops_spark.operators.sample import mix_sources

    df = spark.createDataFrame([(1, "web")], "id long, domain string")
    with pytest.raises(ValueError, match="absent"):
        mix_sources(df, "domain", {"nope": 1}, ["id"])


def test_mix_sources_deterministic(spark):
    from pyarrow_ops_spark.operators.sample import mix_sources

    rows = [(i, "a" if i % 3 else "b") for i in range(3000)]
    df = spark.createDataFrame(rows, "id long, domain string")
    a = sorted(r.id for r in mix_sources(df, "domain", {"a": 1, "b": 1}, ["id"]).collect())
    b = sorted(
        r.id
        for r in mix_sources(
            df.repartition(7), "domain", {"a": 1, "b": 1}, ["id"]
        ).collect()
    )
    assert a == b


def test_mix_sources_exact_counts(spark):
    from pyarrow_ops_spark.operators.sample import mix_sources

    # small strata: the r3 ADVICE case where hash variance realizes 8 of a
    # 10-row target — exact mode must hit the targets dead on
    rows = (
        [(i, "web") for i in range(50)]
        + [(i + 1000, "code") for i in range(37)]
        + [(i + 2000, "books") for i in range(11)]
    )
    df = spark.createDataFrame(rows, "id long, domain string")
    out = mix_sources(df, "domain", {"web": 2, "code": 1}, ["id"], exact=True)
    counts = {
        r["domain"]: r["n"]
        for r in out.groupBy("domain").agg(F.count("id").alias("n")).collect()
    }
    # K = min(50//2, 37//1) = 25 -> web exactly 50, code exactly 25
    assert counts == {"web": 50, "code": 25}


def test_mix_sources_exact_deterministic_across_partitioning(spark):
    from pyarrow_ops_spark.operators.sample import mix_sources

    rows = [(i, "a" if i % 3 else "b") for i in range(300)]
    df = spark.createDataFrame(rows, "id long, domain string")
    a = sorted(
        r.id
        for r in mix_sources(df, "domain", {"a": 2, "b": 1}, ["id"], exact=True).collect()
    )
    b = sorted(
        r.id
        for r in mix_sources(
            df.repartition(7), "domain", {"a": 2, "b": 1}, ["id"], exact=True
        ).collect()
    )
    assert a == b


class TestWeightedSample:
    def test_exact_k_and_determinism(self, spark):
        from pyarrow_ops_spark.operators.sample import weighted_sample
        from pyspark.sql import functions as F

        df = spark.range(1000).select(
            F.col("id").alias("k"), (F.col("id") % 7 + 1).cast("double").alias("w")
        )
        a = weighted_sample(df, 50, "w", ["k"])
        b = weighted_sample(df, 50, "w", ["k"])
        ra, rb = a.collect(), b.collect()
        assert len(ra) == 50
        assert sorted(r["k"] for r in ra) == sorted(r["k"] for r in rb)

    def test_weights_bias_selection(self, spark):
        from pyarrow_ops_spark.operators.sample import weighted_sample
        from pyspark.sql import functions as F

        # half the rows weight 10, half weight 1 -> heavy rows dominate
        df = spark.range(2000).select(
            F.col("id").alias("k"),
            F.when(F.col("id") < 1000, 10.0).otherwise(1.0).alias("w"),
        )
        got = weighted_sample(df, 200, "w", ["k"]).collect()
        heavy = sum(1 for r in got if r["k"] < 1000)
        assert heavy > 150  # E[heavy] ~ 183 of 200

    def test_nonpositive_weights_excluded(self, spark):
        from pyarrow_ops_spark.operators.sample import weighted_sample
        from pyspark.sql import functions as F

        df = spark.range(10).select(
            F.col("id").alias("k"),
            F.when(F.col("id") < 5, -1.0).otherwise(1.0).alias("w"),
        )
        got = weighted_sample(df, 10, "w", ["k"]).collect()
        assert len(got) == 5 and all(r["k"] >= 5 for r in got)

    def test_validation(self, spark):
        import pytest
        from pyarrow_ops_spark.operators.sample import weighted_sample
        from pyspark.sql import functions as F

        df = spark.range(5).select(F.col("id").alias("k"), F.lit(1.0).alias("w"))
        with pytest.raises(ValueError):
            weighted_sample(df, 0, "w", ["k"])
