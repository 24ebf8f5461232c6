"""Semantics of the big×big grid-bucketed range join: row-identical to
the naive interval predicate across the boundary cases the grid mapping
could get wrong (inclusive lo, exclusive hi, intervals spanning several
cells, interval edges landing exactly on cell edges)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyarrow_ops_spark.operators.join import range_join, range_join_bucketed


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def sides(spark):
    # values at and around every cell edge for width=10
    vals = [0, 1, 9, 10, 11, 19, 20, 25, 30, 99, 100]
    left = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "lid int, v long")
    # intervals: sub-cell, exact-cell, multi-cell, edge-aligned, empty-ish
    ivals = [
        (0, 0, 10),    # exactly one cell, hi on the edge (exclusive)
        (1, 5, 15),    # straddles an edge
        (2, 10, 40),   # three cells, both edges aligned
        (3, 7, 8),     # sub-cell
        (4, 95, 105),  # straddles at the top of the domain
        (5, 20, 21),   # minimal width at an edge
    ]
    right = spark.createDataFrame(ivals, "rid int, lo long, hi long")
    return left, right


def test_bucketed_equals_naive(spark, sides):
    left, right = sides
    naive = range_join(left, right, "v", "lo", "hi", broadcast_right=False).select(
        "lid", "rid"
    )
    bucketed = range_join_bucketed(left, right, "v", "lo", "hi", bucket_width=10).select(
        "lid", "rid"
    )
    assert _rows(bucketed) == _rows(naive)
    assert len(_rows(bucketed)) > 0


def test_bucketed_width_not_dividing(spark, sides):
    left, right = sides
    for w in (3, 7, 1000):
        naive = range_join(left, right, "v", "lo", "hi", broadcast_right=False)
        bucketed = range_join_bucketed(left, right, "v", "lo", "hi", bucket_width=w)
        assert _rows(bucketed.select("lid", "rid")) == _rows(naive.select("lid", "rid"))


def test_bucketed_extra_on(spark):
    left = spark.createDataFrame(
        [(1, "a", 5), (2, "b", 5), (3, "a", 25)], "lid int, k string, v long"
    )
    right = spark.createDataFrame(
        [(10, "a", 0, 10), (11, "b", 0, 10), (12, "a", 20, 30)],
        "rid int, k string, lo long, hi long",
    )
    out = range_join_bucketed(
        left, right, "v", "lo", "hi", bucket_width=10, extra_on=["k"]
    )
    assert _rows(out.select("lid", "rid")) == [(1, 10), (2, 11), (3, 12)]


def test_bucketed_bad_width(spark, sides):
    left, right = sides
    with pytest.raises(ValueError):
        range_join_bucketed(left, right, "v", "lo", "hi", bucket_width=0)


def test_bucketed_reserved_column(spark, sides):
    left, right = sides
    with pytest.raises(ValueError):
        range_join_bucketed(
            left.withColumn("__cell__", F.lit(1)), right, "v", "lo", "hi", 10
        )
