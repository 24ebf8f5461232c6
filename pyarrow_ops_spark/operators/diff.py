"""Keyed snapshot diff: what changed between two versions of a table.

The data-engineering primitive behind incremental pipelines and audits:
given yesterday's and today's snapshot, classify every key as added /
removed / changed / unchanged, comparing a chosen set of value columns.

Scale shape: ONE full outer join on the key (each side shuffled once on
the key — the minimum possible for this question), with the value
comparison as a post-join projection. For very wide rows pass
``compare_cols`` to prune the compared (and therefore shuffled) columns;
the scan pushes the projection down.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def diff_tables(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str] | None = None,
    status_col: str = "diff_status",
    include_unchanged: bool = False,
) -> DataFrame:
    """Classify every key across two snapshots.

    Returns one row per key present in either side: the key columns, a
    ``status_col`` in {'added', 'removed', 'changed', 'unchanged'}, and
    the old/new values of each compared column (``old_<c>`` / ``new_<c>``).
    ``compare_cols`` defaults to all shared non-key columns. Null-safe:
    a value moving between NULL and non-NULL counts as changed, NULL on
    both sides as equal (eqNullSafe semantics).

    Duplicate keys within one snapshot are the caller's contract to
    prevent (dedup first); the join would multiply them.
    """
    keys = list(key_cols)
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in set(keys)]
    cmp_cols = list(compare_cols)

    o = old.select(*keys, *[F.col(c).alias(f"old_{c}") for c in cmp_cols]).withColumn(
        "__in_old", F.lit(True)
    )
    n = new.select(*keys, *[F.col(c).alias(f"new_{c}") for c in cmp_cols]).withColumn(
        "__in_new", F.lit(True)
    )
    j = o.join(n, on=keys, how="full_outer")

    same = F.lit(True)
    for c in cmp_cols:
        same = same & F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
    status = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    out = j.select(
        *keys,
        status.alias(status_col),
        *[F.col(f"old_{c}") for c in cmp_cols],
        *[F.col(f"new_{c}") for c in cmp_cols],
    )
    if not include_unchanged:
        out = out.filter(F.col(status_col) != "unchanged")
    return out


def diff_summary(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Counts per diff status (including 'unchanged') — the audit headline.
    Same single-join cost as ``diff_tables``."""
    d = diff_tables(
        old, new, key_cols, compare_cols, include_unchanged=True
    )
    return d.groupBy("diff_status").agg(F.count(F.lit(1)).alias("n_keys"))
