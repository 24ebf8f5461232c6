"""Time-series resampling: fixed-step rollups with dense (gap-filled)
time grids — the hypertable/`time_bucket` rollup surface.

An event stream aggregated per hour has HOLES where nothing happened;
downstream consumers (dashboards, forecasting, joins against other grids)
need one row per step. The dense grid here is generated DISTRIBUTED — a
``sequence()`` of bucket timestamps per group exploded into rows, never a
driver-side date loop — and the observed aggregates left-join onto it.

Scale shape: one shuffle for the bucket aggregation (map-side combined),
one broadcast-able single-row (or per-group) min/max agg for the grid
bounds, one join grid⋈observed on (group, bucket). Forward-fill is a
window ``last(ignorenulls)`` per group ordered by bucket — the same
exchange the join already produced.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def time_bucket(ts: Column | str, step_seconds: int) -> Column:
    """Floor a timestamp to a fixed step: the `time_bucket` primitive.
    Integer epoch math (engine-portable; the DuckDB oracle replays it)."""
    c = F.col(ts) if isinstance(ts, str) else ts
    epoch = F.unix_timestamp(c)
    # pmod, not %: Spark's % takes the dividend's sign, so a pre-1970
    # (negative-epoch) timestamp would round UP toward zero — one step
    # late — where the oracle's time_bucket floors. pmod floors for both
    # signs identically.
    return F.timestamp_seconds(
        (epoch - F.pmod(epoch, F.lit(step_seconds))).cast("long")
    )


def resample(
    df: DataFrame,
    ts_col: str,
    step_seconds: int,
    aggs: Mapping[str, Column],
    group_cols: Sequence[str] = (),
    fill: str | None = None,
    bucket_col: str = "bucket",
) -> DataFrame:
    """Aggregate ``df`` into fixed ``step_seconds`` buckets and densify the
    grid so every step between each group's min and max bucket has a row.

    ``aggs`` maps output name -> aggregate Column. ``fill`` controls what
    lands on generated gap rows: ``None`` leaves nulls, ``"zero"`` puts 0,
    ``"ffill"`` carries the last observed value forward (window
    ``last(ignorenulls)`` per group — gaps before the first observation
    stay null).

    The grid is built per group with ``sequence(min_bucket, max_bucket,
    step)`` exploded distributed — no driver-side time loop, no collect;
    a group spanning years at 1s steps produces its rows on executors.
    """
    if fill not in (None, "zero", "ffill"):
        raise ValueError(f"fill must be None, 'zero' or 'ffill', got {fill!r}")
    if step_seconds <= 0:
        raise ValueError(f"step_seconds must be positive, got {step_seconds}")
    gcols = list(group_cols)
    bucketed = df.withColumn(bucket_col, time_bucket(ts_col, step_seconds))
    observed = bucketed.groupBy(*gcols, bucket_col).agg(
        *[c.alias(name) for name, c in aggs.items()]
    )

    grid = (
        bucketed.groupBy(*gcols)
        .agg(
            F.min(bucket_col).alias("__lo"),
            F.max(bucket_col).alias("__hi"),
        )
        .select(
            *gcols,
            F.explode(
                F.sequence(
                    "__lo",
                    "__hi",
                    F.expr(f"INTERVAL {int(step_seconds)} SECOND"),
                )
            ).alias(bucket_col),
        )
    )
    out = grid.join(observed, on=[*gcols, bucket_col], how="left")

    if fill == "zero":
        out = out.select(
            *gcols,
            bucket_col,
            *[F.coalesce(F.col(n), F.lit(0)).alias(n) for n in aggs],
        )
    elif fill == "ffill":
        w = (
            Window.partitionBy(*gcols)
            .orderBy(bucket_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        out = out.select(
            *gcols,
            bucket_col,
            *[F.last(F.col(n), ignorenulls=True).over(w).alias(n) for n in aggs],
        )
    return out


def gaps(
    df: DataFrame,
    ts_col: str,
    step_seconds: int,
    group_cols: Sequence[str] = (),
    bucket_col: str = "bucket",
) -> DataFrame:
    """The missing buckets only: each group's dense grid minus its
    observed buckets (anti-join) — monitoring's "which intervals have no
    data" question. Same distributed grid generation as ``resample``."""
    dense = resample(
        df, ts_col, step_seconds, {"__n": F.count(F.lit(1))}, group_cols,
        fill=None, bucket_col=bucket_col,
    )
    return dense.filter(F.col("__n").isNull()).select(*group_cols, bucket_col)
