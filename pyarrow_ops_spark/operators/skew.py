"""Skew mitigation: salted aggregation and salted joins.

AQE (``spark.sql.adaptive.skewJoin``) splits skewed partitions at runtime
and is the first line of defense — these explicit rewrites are for the
cases AQE can't fix:

- ``salted_agg``: a single hot group (one key holding 10% of 100 TB) still
  lands on one reducer even after AQE splits the partition, because the
  final aggregation needs all rows of a key together. Salting splits the
  key into ``n_salts`` sub-keys, aggregates partially, then merges the
  sub-aggregates — the hot key's work spreads over ``n_salts`` reducers and
  the final pass only touches #groups × n_salts rows.
- ``salted_join``: a big⋈medium join where one left key dominates and the
  right side is too big to broadcast. The left side gets a random salt in
  [0, n_salts); the right side is replicated n_salts times with every salt
  value; joining on (key, salt) spreads the hot key across reducers at the
  cost of an n_salts× replication of the right side. Only worth it for
  genuine hot keys — measure first.

Both are semantics-preserving: tests assert equality with the unsalted
plans. Only algebraic aggregates (sum/count/min/max) can be merged in
``salted_agg``; avg is derived as sum/count.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt__"

# (partial expr, merge fn) per supported aggregate. count("") / count("*") /
# count("1") count rows; count(col) counts non-null values of col, matching
# SQL COUNT semantics so the result equals a plain df.groupBy(by).agg(...).
_MERGEABLE = {
    "sum": (F.sum, F.sum),
    "count": (
        lambda c: F.count(F.lit(1)) if c in ("", "*", "1") else F.count(c),
        F.sum,
    ),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    by: Sequence[str],
    aggs: dict[str, str],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage skew-proof aggregation: ``aggs`` maps output column ->
    "fn(col)" with fn in sum/count/min/max/avg (e.g. {"total": "sum(x)"}).
    Result columns match a plain ``df.groupBy(by).agg(...)``."""
    parsed = {}
    for out, spec in aggs.items():
        fn, _, col = spec.rstrip(")").partition("(")
        if fn not in _MERGEABLE and fn != "avg":
            raise ValueError(f"unsupported salted agg {fn!r}")
        parsed[out] = (fn, col)

    salted = df.withColumn(
        _SALT, F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    )
    partial_exprs, final_exprs = [], []
    for out, (fn, col) in parsed.items():
        if fn == "avg":  # derive from mergeable sum + non-null count
            partial_exprs += [
                F.sum(col).alias(f"{out}__s"),
                F.count(col).alias(f"{out}__c"),
            ]
            final_exprs += [
                (F.sum(f"{out}__s") / F.sum(f"{out}__c")).alias(out)
            ]
        else:
            partial, merge = _MERGEABLE[fn]
            partial_exprs.append(partial(col).alias(f"{out}__p"))
            final_exprs.append(merge(f"{out}__p").alias(out))
    partial = salted.groupBy(*by, _SALT).agg(*partial_exprs)
    return partial.groupBy(*by).agg(*final_exprs)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Inner/left equi-join with the left side's hot keys spread across
    ``n_salts`` reducers; the right side is exploded ``n_salts``×."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (right side is replicated)")
    on = list(on)
    # Salt from the full left row (deterministic per row content); which
    # salt a row gets is irrelevant — the right side carries every salt.
    l = left.withColumn(
        _SALT, F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(n_salts))
    )
    r = right.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i).cast("long") for i in range(n_salts)]))
    )
    return l.join(r, on=on + [_SALT], how=how).drop(_SALT)


def salted_first_n_per_key(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    n: int,
    rank_col: str | None = None,
    n_slices: int = 32,
) -> DataFrame:
    """Skew-proof "first ``n`` rows per key by ``order_cols``" — the
    two-stage rewrite of ``row_number() OVER (PARTITION BY key ORDER BY
    order) <= n`` for bot-key distributions.

    A single window funnels EVERY row of a hot key through one task: the
    state is bounded (row_number streams), but the task's input is not —
    a 10M-event bot user serializes one reducer. Stage 1 here partitions
    by (key, salt) with the salt derived from the ROW CONTENT
    (``pmod(xxhash64(all cols), n_slices)``): the hot key's rows spread
    across ``n_slices`` reducers and each slice keeps only its local
    first ``n``. A content hash — not ``spark_partition_id()`` or
    ``rand()`` — because a task retry over nondeterministic upstream
    lineage (e.g. round-robin repartition) re-assigns partition ids; a
    partial stage recomputation could then move rows between salt slices
    AFTER the stage-1 rank filter and silently drop global first-N rows.
    The content hash gives every row a stable slice under any retry.
    Stage 2 runs the plain per-key window on the survivors — at most
    ``n × n_slices`` rows per key, a bounded constant. The global first
    ``n`` of a key is always within the union of its per-slice first
    ``n`` (any row-functional slice assignment works), so the result is
    row-identical to the single-window plan (asserted in tests) PROVIDED
    ``order_cols`` is a total order within each key. With ties at the
    cut, both the plain window and this rewrite keep an arbitrary row
    among the tied ones — and not necessarily the SAME arbitrary row —
    exactly as two runs of the plain window may disagree with each
    other; add a tiebreaker column when row-level determinism matters.

    Only worth the second shuffle when a skew report shows genuine hot
    keys; the mergeable aggregates (min/max/sum/count — funnels,
    retention cohorts) never need this, because partial aggregation
    already combines map-side. Reach for it when the operation is
    ORDER-SENSITIVE (first-N, top-N-per-key, collect_list prefixes).

    ``rank_col`` optionally keeps the final per-key rank (1..n) as a
    column, saving callers a third window when they need it."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if n_slices < 1:
        raise ValueError(f"n_slices must be >= 1, got {n_slices}")
    from pyspark.sql import Window

    keys = [F.col(c) for c in key_cols]
    order = [F.col(c) for c in order_cols]
    w1 = Window.partitionBy(*keys, F.col(_SALT)).orderBy(*order)
    w2 = Window.partitionBy(*keys).orderBy(*order)
    rn2 = rank_col or "__rn2"
    out = (
        df.withColumn(
            _SALT,
            F.pmod(
                F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_slices)
            ),
        )
        .withColumn("__rn1", F.row_number().over(w1))
        .filter(F.col("__rn1") <= n)
        .drop(_SALT, "__rn1")
        .withColumn(rn2, F.row_number().over(w2))
        .filter(F.col(rn2) <= n)
    )
    return out if rank_col else out.drop(rn2)


def key_skew_report(
    df: DataFrame,
    key_cols: "list[str]",
    k: int = 10,
) -> DataFrame:
    """The diagnostic you run BEFORE reaching for ``salted_agg``/
    ``salted_join``: the ``k`` heaviest keys with their row share and
    skew factor (count / mean-count-per-key). A skew factor near 1 means
    salting buys nothing; a hot key at 1000x means any shuffle keyed on
    these columns funnels 1000x the average partition load through one
    task.

    Output: (rank, <key_cols...>, n_rows, share, skew), heaviest first.
    One map-side-combined count per key, a two-value global aggregate
    (total rows, distinct keys) attached as a broadcast single-row join,
    and a TakeOrderedAndProject for the top-k — no full sort, nothing
    driver-side beyond k rows."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyspark import StorageLevel

    # counts feeds both the totals aggregate and the ranking — persist so
    # the corpus-wide count runs once, not once per consumer branch
    counts = (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    totals = counts.agg(
        F.sum("n_rows").alias("__total"), F.count(F.lit(1)).alias("__nkeys")
    )
    ranked = (
        counts.crossJoin(F.broadcast(totals))
        .select(
            *key_cols,
            "n_rows",
            F.round(F.col("n_rows") / F.col("__total"), 4).alias("share"),
            F.round(
                F.col("n_rows") / (F.col("__total") / F.col("__nkeys")), 4
            ).alias("skew"),
        )
        .orderBy(F.col("n_rows").desc(), *[F.col(c) for c in key_cols])
        .limit(k)
    )
    from pyspark.sql import Window

    # input is already .limit(k): a literal partition key makes the
    # single-partition rank explicit and silences WindowExec's "No
    # Partition Defined" log noise
    w = Window.partitionBy(F.lit(0)).orderBy(
        F.col("n_rows").desc(), *[F.col(c) for c in key_cols]
    )
    return ranked.withColumn("rank", F.row_number().over(w)).select(
        "rank", *key_cols, "n_rows", "share", "skew"
    )
