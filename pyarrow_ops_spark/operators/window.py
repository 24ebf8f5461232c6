"""Window-function operators — the reference's open TODO ("Add window
functions on groupby", reference README.md:94), implemented on Spark's
native window exec.

Each helper is a thin, tested composition: one shuffle on the partition
keys, sort within partitions, no Python in the path.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def _order_cols(order_by: Sequence[str | Column], descending: bool) -> list[Column]:
    cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    return [c.desc() for c in cols] if descending else cols


def top_k(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[str | Column],
    k: int,
    descending: bool = True,
    rank_col: str | None = None,
) -> DataFrame:
    """Top-k rows per group by row_number (deterministic iff order_by is a
    total order within each partition)."""
    w = W.partitionBy(*partition_by).orderBy(*_order_cols(order_by, descending))
    out = df.withColumn("__rank__", F.row_number().over(w)).filter(
        F.col("__rank__") <= k
    )
    return out.withColumnRenamed("__rank__", rank_col) if rank_col else out.drop("__rank__")


def running_agg(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[str | Column],
    agg_col: str,
    fn=F.sum,
    out_col: str = "running",
) -> DataFrame:
    """Cumulative aggregate from the partition start to the current row."""
    w = (
        W.partitionBy(*partition_by)
        .orderBy(*_order_cols(order_by, False))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return df.withColumn(out_col, fn(agg_col).over(w))


def lag_lead(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[str | Column],
    col: str,
    offsets: Sequence[int] = (1,),
) -> DataFrame:
    """lag (positive offsets) / lead (negative) columns for ``col``."""
    w = W.partitionBy(*partition_by).orderBy(*_order_cols(order_by, False))
    out = df
    for off in offsets:
        name = f"{col}_lag{off}" if off > 0 else f"{col}_lead{-off}"
        expr = F.lag(col, off).over(w) if off > 0 else F.lead(col, -off).over(w)
        out = out.withColumn(name, expr)
    return out
