"""As-of (most-recent-match) join — absent in both the reference and core
Spark; composed from union + window, the scalable formulation.

Semantics: for each left row, attach the right row with the greatest
``right_ts <= left_ts`` within the same key group (direction='backward';
'forward' mirrors it). This is DuckDB's ``ASOF JOIN`` / pandas
``merge_asof``.

Scale design: the naive formulation (inequality join + per-row max) is a
range join that degenerates to O(n·m) per key. Instead we union both
sides, hash-shuffle ONCE on the key, sort within partitions by timestamp,
and carry the latest right-side value forward with ``last_value(...)
IGNORE NULLS`` — one shuffle, one sort, linear scan; no broadcast, no
quadratic blowup, skew handled by AQE like any window.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str] | None = None,
    direction: str = "backward",
    suffix: str = "_asof",
) -> DataFrame:
    """Attach to each left row the latest preceding (or earliest following)
    right row per key. Right columns arrive as ``{name}{suffix}``."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    on = list(on)
    value_cols = list(value_cols) if value_cols else [
        c for c in right.columns if c not in on and c != right_ts
    ]

    l_tagged = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("__is_left__"),
        F.col(left_ts).alias("__ts__"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}__") for c in value_cols],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("__r_ts__"),
    )
    r_tagged = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in on],
        *[F.col(c) for c in on],
        F.lit(0).alias("__is_left__"),
        F.col(right_ts).alias("__ts__"),
        *[F.col(c).alias(f"__r_{c}__") for c in value_cols],
        F.col(right_ts).alias("__r_ts__"),
    ).select(*l_tagged.columns)  # align column order

    unioned = l_tagged.unionByName(r_tagged)

    if direction == "backward":
        # right rows sort BEFORE left rows at equal ts, so an exact-ts match
        # is visible to the left row (ASOF >= semantics)
        w = (
            W.partitionBy(*on)
            .orderBy(F.col("__ts__"), F.col("__is_left__"))
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
    else:
        w = (
            W.partitionBy(*on)
            .orderBy(F.col("__ts__").desc(), F.col("__is_left__"))
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )

    filled = unioned.select(
        *[c for c in unioned.columns if not c.startswith("__r_") ],
        *[
            F.last(F.col(f"__r_{c}__"), ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in value_cols
        ],
        F.last(F.col("__r_ts__"), ignorenulls=True).over(w).alias(f"{right_ts}{suffix}"),
    )
    return (
        filled.filter(F.col("__is_left__") == 1)
        .drop("__is_left__", "__ts__")
    )
