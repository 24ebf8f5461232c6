"""Product-analytics operators over event streams: ordered funnels and
retention cohorts — the two queries every event warehouse answers daily.

The reference has no event operators (SURVEY §2: its surface is five
relational ops); these extend the north-star surface the same way the
streaming module does, and share its batch/stream table model (the
``events`` table: user_id, event_type, ts).

Scale design: funnels are k-1 self-joins keyed on the user (each shuffle
carries (user, ts) pairs for ONE step's events, not the corpus); cohorts
are two hash aggregates plus one join on user_id. Nothing driver-side,
no windows over the raw table, no explode.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel_steps(
    df: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    max_gap_seconds: int | None = None,
    truncate_lineage: bool = True,
) -> DataFrame:
    """Ordered-funnel completion: a user completes step i at the EARLIEST
    event of ``steps[i]`` that happens strictly after their step i-1
    completion time (the standard product-analytics funnel semantics —
    order matters, revisits don't).

    Output, one row per step in order: (step, event_type, n_users,
    conversion, overall) where ``conversion`` is n_i / n_{i-1} and
    ``overall`` n_i / n_0, both rounded to 4. ``max_gap_seconds`` adds
    the usual conversion window: a step only counts when it happens
    within that many seconds of the previous step's completion.

    Plan shape: step 0 is one hash aggregate (per-user min ts of the
    step-0 event); each later step joins the previous step's per-user
    completion times against ONLY that step's events (filter pushed to
    the scan) and takes the conditional min — k-1 co-keyed shuffle joins
    whose payload is (user, ts), independent of total event width. The
    final counts are k tiny aggregates unioned on the driver plan (k
    rows total)."""
    if not steps:
        raise ValueError("steps must be non-empty")
    if len(set(steps)) != len(steps):
        raise ValueError(f"steps must be distinct, got {list(steps)}")

    u = F.col(user_col)
    completions: list[DataFrame] = []
    prev: DataFrame | None = None
    for i, step in enumerate(steps):
        ev = df.filter(F.col(type_col) == step).select(
            u.alias("__u"), F.col(ts_col).alias("__ts")
        )
        if prev is None:
            cur = ev.groupBy("__u").agg(F.min("__ts").alias("__t"))
        else:
            after = F.col("__ts") > F.col("__pt")
            if max_gap_seconds is not None:
                # cast-to-double keeps sub-second precision; unix_timestamp
                # truncates to whole seconds and would admit events up to
                # ~1s past the window
                after = after & (
                    F.col("__ts").cast("double") - F.col("__pt").cast("double")
                    <= float(max_gap_seconds)
                )
            cur = (
                ev.join(prev.select("__u", F.col("__t").alias("__pt")), on="__u")
                .filter(after)
                .groupBy("__u")
                .agg(F.min("__ts").alias("__t"))
            )
        # each step's completions feed BOTH the next step's join and the
        # final count — without truncation step 0's events scan re-executes
        # once per downstream consumer (compounding along the chain).
        # (``truncate_lineage=False`` keeps the full plan visible for
        # plan-shape inspection/tests.)
        if truncate_lineage:
            cur = cur.localCheckpoint(eager=False)
        completions.append(cur)
        prev = cur

    counts = None
    for i, (step, cur) in enumerate(zip(steps, completions)):
        row = cur.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(i).cast("int").alias("step"),
            F.lit(step).alias("event_type"),
            F.col("n_users").cast("long"),
        )
        counts = row if counts is None else counts.unionByName(row)

    from pyspark.sql import Window

    # input is one row per funnel step (a handful): partition by a literal
    # so the single-partition window is explicit and WindowExec's "No
    # Partition Defined" warning doesn't pollute driver logs
    w = Window.partitionBy(F.lit(0)).orderBy("step")
    first = F.first("n_users").over(
        Window.partitionBy(F.lit(0))
        .orderBy("step")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return counts.select(
        "step",
        "event_type",
        "n_users",
        F.round(F.try_divide(F.col("n_users"), F.lag("n_users", 1).over(w)), 4).alias(
            "conversion"
        ),
        F.round(F.try_divide(F.col("n_users"), first), 4).alias("overall"),
    )


def retention_cohorts(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period_days: int = 7,
) -> DataFrame:
    """Retention triangle: users grouped by first-activity period
    (cohort), counted in each subsequent period they return.

    Output: (cohort, period_offset, n_users, retention) where cohort is
    the first period's start date, ``period_offset`` counts periods since
    it (0 = the cohort period itself, retention 1.0 by construction), and
    ``retention`` = returned users / cohort size, rounded to 4.

    Periods are fixed ``period_days`` windows anchored at each user's
    COHORT (epoch-floored), not calendar weeks — engine-exact integer
    math, no locale/week-start dependence. Two hash aggregates (per-user
    first day; distinct user-period activity) + one co-keyed join + one
    final aggregate; shuffles carry (user, date) pairs only."""
    if period_days < 1:
        raise ValueError(f"period_days must be >= 1, got {period_days}")
    day = F.to_date(F.col(ts_col))
    acts = df.select(F.col(user_col).alias("__u"), day.alias("__d"))
    firsts = acts.groupBy("__u").agg(F.min("__d").alias("__first"))
    # cohort = global-epoch-floored period of the user's first day
    cohort = F.date_sub(
        F.col("__first"),
        F.pmod(F.datediff(F.col("__first"), F.to_date(F.lit("1970-01-05"))), period_days),
    )
    from pyspark import StorageLevel

    # cohorts feeds the activity join AND the size aggregate — persist so
    # the per-user first-day aggregation runs once
    cohorts = firsts.select("__u", cohort.alias("__cohort")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    joined = acts.dropDuplicates(["__u", "__d"]).join(cohorts, on="__u")
    offset = F.floor(
        F.datediff(F.col("__d"), F.col("__cohort")) / period_days
    ).cast("int")
    per_user_period = joined.select(
        "__u", "__cohort", offset.alias("__off")
    ).dropDuplicates(["__u", "__cohort", "__off"])
    sizes = cohorts.groupBy("__cohort").agg(F.count(F.lit(1)).alias("__size"))
    out = (
        per_user_period.groupBy("__cohort", "__off")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .join(F.broadcast(sizes), on="__cohort")
    )
    return out.select(
        F.col("__cohort").alias("cohort"),
        F.col("__off").alias("period_offset"),
        F.col("n_users").cast("long").alias("n_users"),
        F.round(F.col("n_users") / F.col("__size"), 4).alias("retention"),
    )


def top_user_paths(
    events: DataFrame,
    k: int = 10,
    max_steps: int = 20,
    user_col: str = "user_id",
    type_col: str = "event_type",
    order_cols: Sequence[str] = ("ts", "event_id"),
    sep: str = " > ",
    salt_skew: bool = False,
) -> DataFrame:
    """The k most common user journeys: each user's first ``max_steps``
    events (ordered deterministically by ``order_cols``) joined into a
    path string, counted, top-k by (count desc, path) — the product-
    analytics "what do users actually do" report.

    Plan shape: a row_number() window over (user) keeps only each user's
    first ``max_steps`` events BEFORE any aggregation — window state is
    streaming/spillable, so a 10M-event bot key never materializes in an
    aggregation buffer; then ONE groupBy(user) collects the <=max_steps
    surviving (order, type) structs (aggregation state is genuinely
    bounded per user), a count-by-path aggregate (map-side combined),
    and a TakeOrderedAndProject for the top k.

    ``salt_skew=True`` swaps the truncation window for the two-stage
    ``skew.salted_first_n_per_key`` rewrite: same rows, but a bot key's
    events spread across content-hash salt slices in stage 1 instead
    of funnelling through one window task — use it when
    ``key_skew_report`` on ``user_col`` shows genuine hot keys."""
    if k < 1 or max_steps < 1:
        raise ValueError(f"k and max_steps must be >= 1, got {k}, {max_steps}")
    slim = events.select(
        F.col(user_col),
        F.col(type_col),
        *[F.col(c) for c in order_cols],
    )
    if salt_skew:
        from pyarrow_ops_spark.operators.skew import salted_first_n_per_key

        truncated = salted_first_n_per_key(
            slim, [user_col], list(order_cols), max_steps, rank_col="__rn"
        )
    else:
        w = Window.partitionBy(F.col(user_col)).orderBy(
            *[F.col(c) for c in order_cols]
        )
        truncated = slim.withColumn("__rn", F.row_number().over(w)).filter(
            F.col("__rn") <= max_steps
        )
    ordered = F.array_sort(
        F.collect_list(F.struct(F.col("__rn"), F.col(type_col)))
    )
    path = F.array_join(
        F.transform(ordered, lambda s: s[type_col]),
        sep,
    )
    paths = truncated.groupBy(F.col(user_col)).agg(path.alias("path"))
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy(F.col("n_users").desc(), F.col("path"))
        .limit(k)
    )
