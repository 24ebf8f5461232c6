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


def _null_safe_key_cond(left_alias: str, right_alias: str, keys: Sequence[str]):
    """Conjunctive null-safe (``<=>``) equality over the key columns of two
    aliased relations — NULL keys match NULL keys. Catalyst treats
    EqualNullSafe as a hash-join key, so this costs the same as ``on=keys``."""
    cond = None
    for k in keys:
        c = F.col(f"{left_alias}.{k}").eqNullSafe(F.col(f"{right_alias}.{k}"))
        cond = c if cond is None else (cond & c)
    return cond


def upsert(
    base: DataFrame,
    updates: DataFrame,
    key_cols: Sequence[str],
    delete_col: str | None = None,
) -> DataFrame:
    """Batch MERGE (SCD-1 semantics) without a table format: rows in
    ``updates`` REPLACE base rows sharing their key, unmatched update rows
    INSERT, and — when ``delete_col`` names a boolean column — update rows
    with it true DELETE the key instead. The Spark-only answer to Delta/
    Iceberg ``MERGE INTO`` for plain-parquet pipelines (pair with
    ``write_training_shards``/``write_sink`` to persist the new snapshot).

    Plan: one left-anti join keeps base rows whose key has no update (the
    minimum shuffle for the question — both sides exchange on the key
    once), unioned with the surviving update rows (a map-only filter).
    The base payload never joins row-to-row against updates, so wide rows
    shuffle once and AQE can broadcast a small update side, making the
    common incremental case (tiny delta vs huge base) a broadcast
    anti-join with NO base shuffle at all.

    Duplicate keys within ``updates`` are the caller's contract to
    prevent (dedup first — e.g. keep the latest by version); schema of
    ``updates`` must cover base's columns (plus ``delete_col``).

    NULL key values are ordinary values: the anti-join matches with
    null-safe equality (``<=>``), so a NULL-key update row REPLACES the
    NULL-key base row instead of silently duplicating it (plain ``=``
    never matches NULL, which would keep the base row AND union in the
    update). EqualNullSafe is a hash-join key to Catalyst, so the plan
    shape is unchanged."""
    keys = list(key_cols)
    if not keys:
        raise ValueError("key_cols must be non-empty")
    survivors = base.alias("b").join(
        updates.select(*keys).alias("u"),
        on=_null_safe_key_cond("b", "u", keys),
        how="anti",
    )
    incoming = updates
    if delete_col is not None:
        incoming = incoming.filter(
            ~F.coalesce(F.col(delete_col), F.lit(False))
        ).drop(delete_col)
    return survivors.unionByName(incoming.select(*base.columns))


def upsert_history(
    history: DataFrame,
    updates: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    current_col: str = "is_current",
) -> DataFrame:
    """SCD-2 MERGE: apply ``updates`` (one row per key, effective at its
    ``ts_col``) onto a versioned ``history`` table, PRESERVING the old
    versions — the warehouse pattern for "what did this row say at time
    t". For each updated key the open row closes (``valid_to`` = the
    update's timestamp, ``current_col`` false) and a new open row
    appends; unmatched keys insert as new open rows; untouched history
    passes through unchanged.

    ``history`` carries ``valid_from``/``valid_to`` (null = open) and
    ``current_col``; ``updates`` carries the key + attribute columns +
    ``ts_col``. One row per key in ``updates`` is the caller's contract
    (dedup to the latest first).

    Plan shape: the update keys join the OPEN history slice only (a
    filter pushed to the scan), once — closed history never shuffles;
    with a small delta both the close-join and the pass-through anti-join
    broadcast, so the common incremental case moves no history at all.

    NULL handling: key matching is null-safe (``<=>``) like :func:`upsert`
    — a NULL-key update closes and replaces the NULL-key open row instead
    of duplicating it — and a NULL ``current_col`` is treated as *not
    current* (the row rides the closed-history slice) rather than
    vanishing from both slices as a plain boolean filter would have it."""
    keys = list(key_cols)
    if not keys:
        raise ValueError("key_cols must be non-empty")
    attr_cols = [c for c in history.columns if c not in (valid_from, valid_to, current_col)]
    is_cur = F.coalesce(F.col(current_col), F.lit(False))
    cur = history.filter(is_cur)

    # close the open row of every updated key at the update's timestamp
    closed = (
        cur.alias("c")
        .join(
            updates.select(*keys, F.col(ts_col).alias("__close_ts")).alias("u"),
            on=_null_safe_key_cond("c", "u", keys),
        )
        .select(
            *[F.col(f"c.{c}") for c in attr_cols],
            F.col(f"c.{valid_from}"),
            F.col("__close_ts").alias(valid_to),
            F.lit(False).alias(current_col),
        )
    )
    untouched_current = cur.alias("c").join(
        updates.select(*keys).alias("u"),
        on=_null_safe_key_cond("c", "u", keys),
        how="anti",
    )
    past = history.filter(~is_cur)
    new_open = updates.select(
        *[F.col(c) for c in attr_cols],
        F.col(ts_col).alias(valid_from),
        F.lit(None).cast(history.schema[valid_to].dataType).alias(valid_to),
        F.lit(True).alias(current_col),
    )
    ordered = [*attr_cols, valid_from, valid_to, current_col]
    return (
        past.select(*ordered)
        .unionByName(closed.select(*ordered))
        .unionByName(untouched_current.select(*ordered))
        .unionByName(new_open.select(*ordered))
    )


def schema_drift(df_a: DataFrame, df_b: DataFrame) -> DataFrame:
    """Schema-level drift between two table snapshots — the check that
    runs BEFORE any data-level monitor ("did the upstream team add a
    column, drop one, or change a type?"): one row per differing column,
    ``(column, change, type_a, type_b)`` with ``change`` in
    {'added', 'removed', 'type_changed'} ('added' = present only in
    ``df_b``, the newer snapshot). Identical schemas yield an empty
    result.

    Purely METADATA: schemas come from the catalog/parquet footers, so
    this never scans a row of either table — it is exactly as cheap at
    100 TB as at 100 rows. Returned as a DataFrame so it composes with
    the rest of the drift family (union into a monitor sink, join
    against an allowlist)."""
    ta = {f.name: f.dataType.simpleString() for f in df_a.schema.fields}
    tb = {f.name: f.dataType.simpleString() for f in df_b.schema.fields}
    rows = []
    for name in sorted(set(ta) | set(tb)):
        if name not in tb:
            rows.append((name, "removed", ta[name], None))
        elif name not in ta:
            rows.append((name, "added", None, tb[name]))
        elif ta[name] != tb[name]:
            rows.append((name, "type_changed", ta[name], tb[name]))
    spark = df_a.sparkSession
    return spark.createDataFrame(
        rows, "column string, change string, type_a string, type_b string"
    )
