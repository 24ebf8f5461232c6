"""Distribution-aware column statistics: z-scores, outlier filtering,
quantile ranks — the numeric-quality primitives of a curation pipeline
("drop documents whose length is 3 sigma off their source's distribution").

Scale design: per-group moments come from ONE map-side-combined aggregate
whose result is |groups| rows joined back broadcast — NOT a
``Window.partitionBy`` over the raw rows, which would shuffle the entire
table just to attach two numbers per group (and melt on a hot group).
Global variants attach as a broadcast single-row cross join. Quantile
ranks genuinely need the per-group sort, so ``quantile_rank`` is the one
window here and says so.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _group_stats(
    df: DataFrame, col: str, by: Sequence[str]
) -> DataFrame:
    aggs = [
        F.avg(F.col(col)).alias("__mean"),
        F.stddev_pop(F.col(col)).alias("__std"),
    ]
    return df.groupBy(*by).agg(*aggs) if by else df.agg(*aggs)


def zscore(
    df: DataFrame,
    col: str,
    by: Sequence[str] = (),
    out: str | None = None,
) -> DataFrame:
    """Append ``out`` (default ``<col>_z``) = (x - mean) / stddev, with
    mean/stddev computed per ``by`` group (population stddev). A
    zero-variance group yields null (0/0), not ±inf. One aggregate +
    broadcast join — the raw table is never shuffled."""
    out = out or f"{col}_z"
    stats = _group_stats(df, col, by)
    if by:
        # null-SAFE equality on the group keys: groupBy collects NULL-key
        # rows into their own stats row, and a plain equi-join would then
        # silently DROP every NULL-key input row (NULL = NULL is never
        # true) — rows must keep their z, whatever their group key is
        s = stats
        cond = None
        for c in by:
            s = s.withColumnRenamed(c, f"__g_{c}")
            this = F.col(c).eqNullSafe(F.col(f"__g_{c}"))
            cond = this if cond is None else (cond & this)
        joined = df.join(F.broadcast(s), on=cond)
    else:
        joined = df.crossJoin(F.broadcast(stats))
    z = F.when(
        F.col("__std") > 0, (F.col(col) - F.col("__mean")) / F.col("__std")
    )
    return joined.select(*[df[c] for c in df.columns], z.alias(out))


def outlier_filter(
    df: DataFrame,
    col: str,
    by: Sequence[str] = (),
    k: float = 3.0,
    keep: str = "inliers",
) -> DataFrame:
    """Keep rows within ``k`` standard deviations of their group mean
    (``keep='inliers'``), or only the tails (``keep='outliers'``). Rows in
    zero-variance groups are inliers by definition. Same one-aggregate +
    broadcast-join shape as ``zscore``."""
    if keep not in ("inliers", "outliers"):
        raise ValueError(f"keep must be 'inliers' or 'outliers', got {keep!r}")
    z = zscore(df, col, by, out="__zs")
    inlier = F.col("__zs").isNull() | (F.abs(F.col("__zs")) <= k)
    cond = inlier if keep == "inliers" else ~inlier
    return z.filter(cond).drop("__zs")


def winsorize(
    df: DataFrame,
    col: str,
    by: Sequence[str] = (),
    lower: float = 0.01,
    upper: float = 0.99,
    out: str | None = None,
) -> DataFrame:
    """Append ``out`` (default ``<col>_w``) = the value clipped to its
    group's exact [lower, upper] quantiles — the classic heavy-tail
    taming step before scaling or training ("cap document length at the
    per-source p99").

    EXACT interpolated quantiles (Spark ``percentile``; DuckDB
    ``quantile_cont`` uses the same linear interpolation, so oracles
    hash-match). Same scale shape as :func:`zscore`: ONE percentile
    aggregate produces |groups| rows that broadcast-join back — the raw
    table is never shuffled; the order statistics are computed inside the
    aggregate buffer, not via a per-group sort window. Null values pass
    through unclipped (null stays null)."""
    if not 0.0 <= lower <= upper <= 1.0:
        raise ValueError(f"need 0 <= lower <= upper <= 1, got {lower}, {upper}")
    out = out or f"{col}_w"
    aggs = [
        F.expr(f"percentile({col}, {lower!r})").alias("__lo"),
        F.expr(f"percentile({col}, {upper!r})").alias("__hi"),
    ]
    stats = df.groupBy(*by).agg(*aggs) if by else df.agg(*aggs)
    if by:
        # null-safe group-key join, same reasoning as zscore
        s = stats
        cond = None
        for c in by:
            s = s.withColumnRenamed(c, f"__g_{c}")
            this = F.col(c).eqNullSafe(F.col(f"__g_{c}"))
            cond = this if cond is None else (cond & this)
        joined = df.join(F.broadcast(s), on=cond)
    else:
        joined = df.crossJoin(F.broadcast(stats))
    # least/greatest SKIP nulls in Spark (a null value would "clip" to the
    # lower bound) — null passes through explicitly
    clipped = F.when(
        F.col(col).isNotNull(),
        F.least(
            F.greatest(F.col(col).cast("double"), F.col("__lo")), F.col("__hi")
        ),
    )
    return joined.select(*[df[c] for c in df.columns], clipped.alias(out))


def robust_zscore(
    df: DataFrame,
    col: str,
    by: Sequence[str] = (),
    out: str | None = None,
) -> DataFrame:
    """Append ``out`` (default ``<col>_rz``) = the MEDIAN/MAD z-score
    (x - median) / (1.4826 * MAD) — the outlier signal that a handful of
    extreme values cannot corrupt, unlike the mean/stddev z-score whose
    own baseline the outliers drag (one 10 GB document inflates sigma
    enough to hide every 100 MB one).

    1.4826 makes MAD a consistent sigma estimator under normality, so
    thresholds transfer from :func:`zscore`. Zero-MAD groups yield null.

    Two exact-percentile aggregates (medians are order statistics, so one
    pass computes the median, a second the median absolute deviation
    around it) — each |groups| rows broadcast back; the corpus is scanned
    twice but never shuffled."""
    out = out or f"{col}_rz"
    med_agg = [F.expr(f"percentile({col}, 0.5)").alias("__med")]
    med = df.groupBy(*by).agg(*med_agg) if by else df.agg(*med_agg)

    def _join_back(base: DataFrame, stats: DataFrame) -> DataFrame:
        if not by:
            return base.crossJoin(F.broadcast(stats))
        s = stats
        cond = None
        for c in by:
            s = s.withColumnRenamed(c, f"__g_{c}")
            this = F.col(c).eqNullSafe(F.col(f"__g_{c}"))
            cond = this if cond is None else (cond & this)
        return base.join(F.broadcast(s), on=cond)

    with_med = _join_back(df, med)
    dev = with_med.select(
        *by, (F.abs(F.col(col) - F.col("__med"))).alias("__dev")
    )
    mad_agg = [F.expr("percentile(__dev, 0.5)").alias("__mad")]
    mad = dev.groupBy(*by).agg(*mad_agg) if by else dev.agg(*mad_agg)
    joined = _join_back(with_med.select(*df.columns, "__med"), mad)
    rz = F.when(
        F.col("__mad") > 0,
        (F.col(col) - F.col("__med")) / (F.lit(1.4826) * F.col("__mad")),
    )
    return joined.select(*[df[c] for c in df.columns], rz.alias(out))


def quantile_rank(
    df: DataFrame,
    col: str,
    by: Sequence[str] = (),
    out: str | None = None,
) -> DataFrame:
    """Append ``out`` (default ``<col>_qrank``) = percent_rank of the value
    within its ``by`` group (0 for the min, 1 for the max; ties share a
    rank). This one IS a per-group sort — percent ranks are order
    statistics and cannot come from moments; at scale prefer
    ``approx_percentile`` buckets when an approximate rank suffices."""
    out = out or f"{col}_qrank"
    w = Window.partitionBy(*by).orderBy(F.col(col))
    return df.withColumn(out, F.percent_rank().over(w))


def profile_table(
    df: DataFrame,
    columns: "Sequence[str] | None" = None,
    exact_distinct: bool = False,
) -> DataFrame:
    """Column-level profile — the ANALYZE-style diagnostic every ingest
    runs before trusting a new drop: one output row per column with
    (column, n_rows, n_nulls, n_distinct, min_value, max_value), min/max
    cast to string so heterogeneous column types share one schema.

    Plan shape: ONE corpus pass building every statistic in a single
    aggregate (map-side combined partials), then a driver-plan reshape of
    the single result row into |columns| rows — the table is never
    shuffled, only the fixed-width partial-agg state is. With the
    default ``exact_distinct=False`` the distinct counts are HLL
    (``approx_count_distinct``), which keeps the aggregate a plain
    partial+final pair; ``exact_distinct=True`` is the certification
    mode — Spark expands the input once per distinct-agg, so reserve it
    for sf-small oracle comparison or single-column profiles.

    Reference has no profiling surface (SURVEY §2.2); extension per
    BASELINE.json."""
    cols = list(columns) if columns is not None else list(df.columns)
    if not cols:
        raise ValueError("profile_table needs at least one column")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        distinct = (
            F.count_distinct(F.col(c))
            if exact_distinct
            else F.approx_count_distinct(c)
        )
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__nul_{c}"),
            distinct.alias(f"__d_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
        ]
    one = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n").cast("long").alias("n_rows"),
                F.col(f"__nul_{c}").cast("long").alias("n_nulls"),
                F.col(f"__d_{c}").cast("long").alias("n_distinct"),
                F.col(f"__min_{c}").alias("min_value"),
                F.col(f"__max_{c}").alias("max_value"),
            )
            for c in cols
        ]
    )
    return one.select(F.explode(rows).alias("p")).select("p.*")


def histogram_equidepth(
    df: DataFrame,
    col: str,
    n_buckets: int = 10,
) -> DataFrame:
    """Equi-DEPTH histogram: ``n_buckets`` buckets holding ~equal row
    counts, the shape optimizers and skew reports want when the value
    distribution is long-tailed (a fixed-width histogram puts 99% of rows
    in one bar). Output per non-empty bucket: (bucket, lo, hi, n_rows),
    where lo/hi are the observed min/max inside the bucket.

    Bucket assignment is DETERMINISTIC across engines: cut points are
    exact interpolated percentiles i/n (i=1..n-1), and a value lands in
    the smallest bucket whose upper cut is >= it (strictly-ordered CASE
    over the broadcast cut row) — the same rule a DuckDB oracle writes
    with quantile_cont, so ties on a cut boundary bucket identically.

    Plan shape: ONE percentile aggregate produces a single (n-1)-value
    row, broadcast back as a literal-free cross join; assignment is then
    a map-only expression and the final count is a partial+final
    aggregate over at most n groups. The corpus shuffles zero times; the
    sort work hides inside the percentile partial-aggregates. At 100 TB
    swap the exact percentile for approx_percentile (same plan shape,
    sketch-mergeable partials) when a ±epsilon bucket boundary is
    acceptable."""
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    # nulls carry no position in the value order: drop them (the CASE
    # chain would otherwise silently dump them in the last bucket)
    df = df.filter(F.col(col).isNotNull())
    fracs = [i / n_buckets for i in range(1, n_buckets)]
    # backtick-quote the column so names with dots/spaces/hyphens resolve
    # as one identifier instead of misparsing inside the expr string
    quoted = "`" + col.replace("`", "``") + "`"
    cuts = df.agg(
        F.expr(
            f"percentile({quoted}, array({', '.join(str(f) for f in fracs)}))"
        ).alias("__cuts")
    )
    assigned = df.select(F.col(col)).crossJoin(F.broadcast(cuts))
    bucket = F.lit(n_buckets - 1)
    # smallest bucket whose cut >= value; built right-to-left so the CASE
    # tests cuts in ascending order
    for i in range(n_buckets - 2, -1, -1):
        bucket = F.when(
            F.col(col) <= F.col("__cuts").getItem(i), F.lit(i)
        ).otherwise(bucket)
    return (
        assigned.select(F.col(col), bucket.cast("int").alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.round(F.min(col), 4).alias("lo"),
            F.round(F.max(col), 4).alias("hi"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        )
    )


def ks_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    col: str,
    bins: int = 256,
    lo: float | None = None,
    hi: float | None = None,
    by: Sequence[str] = (),
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift statistic between the ``col``
    distributions of two slices, computed on ``bins`` equal-width bins —
    the train-vs-incoming-batch distribution monitor of an ingestion
    pipeline ("did this crawl snapshot's doc-length distribution move?").

    Output is ONE row ``(n_a, n_b, ks_bin, ks_d)``: the slice sizes, the
    bin index where the empirical-CDF gap peaks, and the gap itself
    (rounded to 6, ties broken by bin asc — deterministic across
    engines). Binning makes the statistic a lower bound on the exact KS
    D with error <= max per-bin mass; 256 bins is plenty for drift
    alerting.

    Plan shape (100 TB): one union pass computes the pooled min/max as a
    single-row aggregate broadcast back, a second union pass does the
    map-only bin assignment into one ``bins``-bounded groupBy — two scans
    per slice, the floor for data-derived bounds. Pass fixed ``lo``/``hi``
    (production drift monitors pin bin edges to the reference/training
    distribution) and the stats pass disappears entirely: ONE scan per
    slice. Slice sizes come from full-frame sums over the bounded counts
    relation, never a second stats pass. The running-sum window that
    turns bin counts into CDFs orders a relation of at most ``bins``
    rows, so the single-partition window is bounded by construction,
    never by the data. Bins empty in BOTH slices are absent from the
    counts relation; the CDF is constant across them, so the max gap is
    unaffected. Values outside a fixed [lo, hi] clamp into the edge bins
    (floor + least keeps them in range), preserving CDF mass.

    Pass ``by`` (e.g. ``["source"]``) for a PER-GROUP drift report: one
    row per group, bins computed over each group's own min/max (fixed
    lo/hi stay global). The per-group stats relation is |groups| rows
    broadcast back (null-safe keys, same idiom as ``zscore``); every
    window partitions on the group so its frame stays <= ``bins`` rows.

    One-sided slices/groups are DROPPED, not reported: a group present in
    only one slice has no two-sample statistic (its empirical CDF gap is
    cum/0), so rows with ``n_a = 0`` or ``n_b = 0`` are filtered out
    before the argmax — an empty input slice yields an empty result, and
    a group missing from either slice is absent from the report (check
    slice membership with a plain anti-join if you need that alert).
    """
    if bins < 2:
        raise ValueError(f"bins must be >= 2, got {bins}")
    if (lo is None) != (hi is None):
        raise ValueError("pass both lo and hi, or neither")
    by = list(by)
    u = df_a.select(
        *[F.col(c) for c in by],
        F.col(col).cast("double").alias("__v"),
        F.lit(0).alias("__s"),
    ).unionAll(
        df_b.select(
            *[F.col(c) for c in by],
            F.col(col).cast("double").alias("__v"),
            F.lit(1).alias("__s"),
        )
    ).filter(F.col("__v").isNotNull())
    if lo is None:
        aggs = [F.min("__v").alias("__mn"), F.max("__v").alias("__mx")]
        st = u.groupBy(*by).agg(*aggs) if by else u.agg(*aggs)
    elif by:
        st = None  # fixed global bounds: no stats relation needed
    else:
        st = u.sparkSession.range(1).select(
            F.lit(float(lo)).alias("__mn"), F.lit(float(hi)).alias("__mx")
        )
    # bin = greatest(0, least(bins-1, floor((v - mn) * bins / (mx - mn)))):
    # the DuckDB oracle evaluates the SAME left-associated double
    # expression, so the assignment is bit-identical across engines (IEEE
    # 754 is exact about each op); a degenerate mn == mx slice collapses
    # to bin 0; with fixed lo/hi the clamps fold out-of-range values into
    # the edge bins
    if st is None:
        with_bounds = u.withColumn("__mn", F.lit(float(lo))).withColumn(
            "__mx", F.lit(float(hi))
        )
    elif by:
        # null-safe group-key broadcast join, same idiom as zscore
        s = st
        cond = None
        for c in by:
            s = s.withColumnRenamed(c, f"__g_{c}")
            this = F.col(c).eqNullSafe(F.col(f"__g_{c}"))
            cond = this if cond is None else (cond & this)
        with_bounds = u.join(F.broadcast(s), on=cond)
    else:
        with_bounds = u.crossJoin(F.broadcast(st))
    binned = with_bounds.select(
        *[F.col(c) for c in by],
        F.when(F.col("__mx") == F.col("__mn"), F.lit(0))
        .otherwise(
            F.greatest(
                F.lit(0),
                F.least(
                    F.lit(bins - 1),
                    F.floor(
                        (F.col("__v") - F.col("__mn"))
                        * bins
                        / (F.col("__mx") - F.col("__mn"))
                    ),
                ),
            )
        )
        .cast("int")
        .alias("bin"),
        "__s",
    )
    counts = binned.groupBy(*by, "bin").agg(
        F.sum(F.when(F.col("__s") == 0, 1).otherwise(0)).alias("__ca"),
        F.sum(F.when(F.col("__s") == 1, 1).otherwise(0)).alias("__cb"),
    )
    part = Window.partitionBy(*by) if by else Window
    w = part.orderBy("bin").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wfull = part.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = counts.select(
        *[F.col(c) for c in by],
        "bin",
        F.sum("__ca").over(w).alias("__cuma"),
        F.sum("__cb").over(w).alias("__cumb"),
        F.sum("__ca").over(wfull).alias("__na"),
        F.sum("__cb").over(wfull).alias("__nb"),
    ).filter((F.col("__na") > 0) & (F.col("__nb") > 0))
    gaps = cum.select(
        *[F.col(c) for c in by],
        F.col("__na").cast("long").alias("n_a"),
        F.col("__nb").cast("long").alias("n_b"),
        F.col("bin").alias("ks_bin"),
        F.round(
            F.abs(
                F.col("__cuma").cast("double") / F.col("__na")
                - F.col("__cumb").cast("double") / F.col("__nb")
            ),
            6,
        ).alias("ks_d"),
    )
    if by:
        pick = Window.partitionBy(*by).orderBy(
            F.col("ks_d").desc(), F.col("ks_bin")
        )
        return (
            gaps.withColumn("__rn", F.row_number().over(pick))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    return gaps.orderBy(F.col("ks_d").desc(), F.col("ks_bin")).limit(1)


def psi_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    col: str,
    bins: int = 8,
    by: Sequence[str] = (),
    approx: bool = False,
    accuracy: int = 10000,
) -> DataFrame:
    """Population Stability Index between a reference slice ``df_a`` and a
    comparison slice ``df_b`` — the standard ML-monitoring drift score
    (PSI < 0.1 stable, 0.1-0.25 moderate, > 0.25 major shift). Bins are
    EQUI-DEPTH on the reference (exact interpolated percentiles), the
    production convention: each reference bin holds ~1/bins of mass, so
    the score reacts to where the comparison's mass actually moved.

    Output: one row per OCCUPIED bin ``(bin, c_a, c_b, psi_bin)`` with
    ``psi_bin = (p_a - p_b) * ln(p_a / p_b)`` rounded to 6; total PSI is
    the sum. Proportions take the standard continuity clamp
    ``p = greatest(c, 0.5) / n`` so a bin empty in ONE slice contributes
    a finite, deterministic penalty instead of ±inf. Occupied-bins-only
    is a deliberate semantics choice: a bin empty in BOTH slices is
    absent from the output, so its clamp-only term
    ``(0.5/n_a - 0.5/n_b) * ln(n_b/n_a)`` (nonzero when the slice sizes
    differ) is NOT part of the total — with equi-depth reference cuts a
    both-empty bin requires duplicate-heavy cut collapse, and scoring
    mass that exists in neither slice adds noise, not signal. The DuckDB
    oracle mirrors the same occupied-bins rule, so engines agree.

    One-sided inputs are DROPPED, not reported: a comparison slice (or,
    with ``by``, a group) with zero rows has no proportions to compare
    (``p_b`` would be 0.5/0), so groups with ``n_b = 0`` are filtered out
    — symmetric to the b-only drop below (groups absent from the
    reference have no cuts and no PSI).

    Engine congruence: default ``bins=8`` keeps the percentile fractions
    (i/8) exact binary doubles, so the interpolated cut arithmetic is
    bit-identical across engines (same argument as the certified
    equi-depth histogram row); assignment is the same <=-CASE chain, and
    the psi expression is one shared double formula rounded before
    comparison.

    Plan shape (100 TB): one percentile aggregate over the reference
    (sketch-mergeable partials; ``approx=True`` swaps in
    ``approx_percentile(..., accuracy)`` for a memory-bounded cut pass at
    extreme scale, same plan) broadcast back as a single row, map-only bin
    assignment on one union scan, one <=bins-group aggregate carrying
    (c_a, c_b) partials, then a bins-bounded full-frame window for the
    slice totals. No corpus shuffle, no collect. With ``by`` the cuts
    relation is |groups| rows (group-wise percentiles) joined back
    null-safe, and the totals window partitions on the group — frames
    stay <= ``bins`` rows per group.
    """
    if bins < 2:
        raise ValueError(f"bins must be >= 2, got {bins}")
    by = list(by)
    fracs = [i / bins for i in range(1, bins)]
    quoted = "`" + col.replace("`", "``") + "`"
    # approx=True swaps the exact interpolated percentile for the
    # KLL/GK-style approx_percentile sketch — SAME plan shape (one
    # partial+final aggregate broadcast back), but the cut pass stays
    # memory-bounded on any reference size; cuts move by at most
    # 1/accuracy of rank, which only re-labels values within a hair of a
    # bin edge (PSI is threshold-read, not hash-read, at that point —
    # approx mode is for production scale, certification uses exact)
    if approx:
        cut_agg = F.expr(
            f"approx_percentile({quoted}, "
            f"array({', '.join(str(f) for f in fracs)}), {accuracy})"
        ).alias("__cuts")
    else:
        cut_agg = F.expr(
            f"percentile({quoted}, array({', '.join(str(f) for f in fracs)}))"
        ).alias("__cuts")
    ref = df_a.filter(F.col(col).isNotNull())
    cuts = ref.groupBy(*by).agg(cut_agg) if by else ref.agg(cut_agg)
    u = df_a.select(
        *[F.col(c) for c in by],
        F.col(col).cast("double").alias("__v"),
        F.lit(0).alias("__s"),
    ).unionAll(
        df_b.select(
            *[F.col(c) for c in by],
            F.col(col).cast("double").alias("__v"),
            F.lit(1).alias("__s"),
        )
    ).filter(F.col("__v").isNotNull())
    if by:
        # null-safe group-key broadcast join, same idiom as zscore; groups
        # present only in df_b have no reference cuts and are dropped (a
        # PSI against an absent reference is undefined)
        s_ = cuts
        cond = None
        for c in by:
            s_ = s_.withColumnRenamed(c, f"__g_{c}")
            this = F.col(c).eqNullSafe(F.col(f"__g_{c}"))
            cond = this if cond is None else (cond & this)
        assigned = u.join(F.broadcast(s_), on=cond)
    else:
        assigned = u.crossJoin(F.broadcast(cuts))
    bucket = F.lit(bins - 1)
    for i in range(bins - 2, -1, -1):
        bucket = F.when(
            F.col("__v") <= F.col("__cuts").getItem(i), F.lit(i)
        ).otherwise(bucket)
    counts = (
        assigned.select(
            *[F.col(c) for c in by], bucket.cast("int").alias("bin"), "__s"
        )
        .groupBy(*by, "bin")
        .agg(
            F.sum(F.when(F.col("__s") == 0, 1).otherwise(0)).alias("__ca"),
            F.sum(F.when(F.col("__s") == 1, 1).otherwise(0)).alias("__cb"),
        )
    )
    part = Window.partitionBy(*by) if by else Window
    wfull = part.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    with_totals = counts.select(
        *[F.col(c) for c in by],
        "bin",
        "__ca",
        "__cb",
        F.sum("__ca").over(wfull).alias("__na"),
        F.sum("__cb").over(wfull).alias("__nb"),
    ).filter((F.col("__na") > 0) & (F.col("__nb") > 0))
    pa = F.greatest(F.col("__ca").cast("double"), F.lit(0.5)) / F.col("__na")
    pb = F.greatest(F.col("__cb").cast("double"), F.lit(0.5)) / F.col("__nb")
    return with_totals.select(
        *[F.col(c) for c in by],
        "bin",
        F.col("__ca").cast("long").alias("c_a"),
        F.col("__cb").cast("long").alias("c_b"),
        F.round((pa - pb) * F.log(pa / pb), 6).alias("psi_bin"),
    ).orderBy(*by, "bin")


def chi2_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    col: str,
    by: Sequence[str] = (),
) -> DataFrame:
    """Chi-squared homogeneity drift statistic between the CATEGORICAL
    ``col`` distributions of two slices — the categorical sibling of
    ``ks_drift``/``psi_drift`` (those want numeric columns; this is the
    monitor for language mix, source mix, label mix, file-type mix).

    Output is ONE row ``(n_a, n_b, n_categories, chi2)`` per group (or a
    single row without ``by``): slice sizes, the number of categories
    occupied by either slice, and the two-sample chi-squared statistic
    ``sum_c (o_ac - e_ac)^2/e_ac + (o_bc - e_bc)^2/e_bc`` with expected
    counts ``e_xc = n_x * (o_ac + o_bc) / (n_a + n_b)`` (always > 0 on
    occupied categories, so no continuity clamp is needed). Degrees of
    freedom for a significance test = ``n_categories - 1``.

    Engine congruence: each category's term is ONE shared left-associated
    double formula (bit-identical across engines), then scaled to an
    exact integer ``floor(term * 10^9)`` and summed in BIGINT — exact and
    order-insensitive, the same trick as ``rrf_fuse`` (a plain double sum
    over categories would depend on engine execution order in the last
    ulp). The surfaced ``chi2`` is ``sum / 10^9`` rounded to 6; the
    1e-9-per-category quantization is three orders below the rounding
    grain even at thousands of categories.

    Plan shape (100 TB): one union scan into a groupBy bounded by
    |groups| x |categories| (map-side combine shrinks the shuffle to
    category cardinality, not row count), slice totals as a SECOND
    bounded aggregate (<= |groups| rows) broadcast back onto the counts
    relation — the zscore idiom, NOT a full-frame window: a window here
    would funnel every category of a group (all of them, in global mode)
    through one partition, fine at language-mix cardinality but a cliff
    if someone passes a million-distinct column — then a map-only chi2
    expression and a final <=|groups|-row aggregate. No corpus shuffle,
    no single-partition funnel, no collect, at ANY category cardinality.
    NULL categories are dropped (same rule as the numeric monitors);
    groups present in only one slice are dropped (no two-sample
    statistic).
    """
    by = list(by)
    u = df_a.select(
        *[F.col(c) for c in by],
        F.col(col).cast("string").alias("__cat"),
        F.lit(0).alias("__s"),
    ).unionAll(
        df_b.select(
            *[F.col(c) for c in by],
            F.col(col).cast("string").alias("__cat"),
            F.lit(1).alias("__s"),
        )
    ).filter(F.col("__cat").isNotNull())
    counts = u.groupBy(*by, "__cat").agg(
        F.sum(F.when(F.col("__s") == 0, 1).otherwise(0)).alias("__ca"),
        F.sum(F.when(F.col("__s") == 1, 1).otherwise(0)).alias("__cb"),
    )
    # slice totals: a <=|groups|-row aggregate broadcast back (null-safe
    # keys, the zscore idiom) — totals are exact BIGINT sums either way,
    # so the certified statistic is unchanged; only the plan improves
    taggs = [F.sum("__ca").alias("__na"), F.sum("__cb").alias("__nb")]
    if by:
        s = counts.groupBy(*by).agg(*taggs)
        cond = None
        for c in by:
            s = s.withColumnRenamed(c, f"__g_{c}")
            this = F.col(c).eqNullSafe(F.col(f"__g_{c}"))
            cond = this if cond is None else (cond & this)
        with_totals = counts.join(F.broadcast(s), on=cond)
    else:
        with_totals = counts.crossJoin(F.broadcast(counts.agg(*taggs)))
    with_totals = with_totals.filter((F.col("__na") > 0) & (F.col("__nb") > 0))
    # one shared double formula, mirrored verbatim in the DuckDB oracle:
    # e_x = (CAST(n_x AS DOUBLE) * (ca + cb)) / (na + nb);
    # term = ((ca - e_a) * (ca - e_a)) / e_a + ((cb - e_b) * (cb - e_b)) / e_b
    tot = F.col("__ca") + F.col("__cb")
    grand = F.col("__na") + F.col("__nb")
    ea = F.col("__na").cast("double") * tot / grand
    eb = F.col("__nb").cast("double") * tot / grand
    term = ((F.col("__ca") - ea) * (F.col("__ca") - ea)) / ea + (
        (F.col("__cb") - eb) * (F.col("__cb") - eb)
    ) / eb
    scaled = with_totals.select(
        *[F.col(c) for c in by],
        "__na",
        "__nb",
        F.floor(term * F.lit(1e9)).cast("long").alias("__ci"),
    )
    return scaled.groupBy(*by).agg(
        F.max("__na").cast("long").alias("n_a"),
        F.max("__nb").cast("long").alias("n_b"),
        F.count(F.lit(1)).cast("long").alias("n_categories"),
        F.round(F.sum("__ci").cast("double") / F.lit(1e9), 6).alias("chi2"),
        # global mode aggregates an EMPTY relation to one all-null row when
        # an input slice had no rows — drop it (one-sided inputs yield an
        # empty result, matching ks/psi)
    ).filter(F.col("n_a").isNotNull())


def embedding_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    vec_col: str,
    norm_bins: int = 64,
) -> DataFrame:
    """Embedding-space drift report between two corpus slices — the
    monitor an embedding-backed pipeline runs when the encoder, the
    corpus mix, or an upstream preprocessing step changes: ONE row
    ``(n_a, n_b, centroid_cos, norm_ks_bin, norm_ks_d)`` where
    ``centroid_cos`` is the cosine similarity of the two slices' mean
    vectors (1.0 = same direction; drops as the population direction
    moves) and ``norm_ks_*`` is the :func:`ks_drift` statistic over the
    per-vector L2 norms (catches magnitude/scale drift that direction
    alone misses, e.g. a normalization bug).

    Engine congruence (hash-stable end to end — no raw-double group sums
    anywhere, the family standard): per-dim centroid means come from
    exact element sums ``sum(floor(x * 1e7))`` carried as DECIMAL(38,0)
    (overflow-free to 1e38 — a raw-double sum is engine-order-sensitive
    in the last ulp), divided once; the dot/norm2 reductions over the
    dim-bounded means BIGINT-scale each term ``floor(term * 1e9)`` (the
    rrf_fuse trick); per-vector squared norms are exact BIGINT folds
    ``sum(floor(x*x * 1e9))`` so the norms feeding :func:`ks_drift` are
    bit-identical across engines (a last-ulp norm difference could flip
    a bin assignment on an exact edge). Quantization: <= 1e-7 per
    element on means, <= 1e-9 absolute on squared norms — three-plus
    orders below the round-4/round-6 surfacing grains. Exactness
    headroom: |x| up to ~1.5e3 at 4096 dims for the norm fold (long),
    ~1e12 rows x |x|<=10 for the DECIMAL element sums.

    Plan shape (100 TB): centroids via posexplode + partial-sum hash
    aggregate — map-side combine collapses the rows x dim fan-out to
    2 x dim partial sums per task, so the shuffle is ~constant in corpus
    size; the dim-bounded centroid relations reduce to ONE row through a
    dim-row aggregate; norms are a map-only higher-order ``aggregate``
    riding the same scans ks_drift makes anyway. No corpus shuffle, no
    collect, no cartesian beyond broadcast one-row joins.

    NULL contract: NULL vectors AND vectors containing a NULL ELEMENT
    are filtered up front (map-only ``forall`` guard riding the same
    scan). Without the guard the two engines silently diverge on a NULL
    element — Spark's higher-order ``aggregate`` folds ``acc + NULL``
    into a NULL norm (dropping the row from the norm-KS only) while
    DuckDB's ``list_sum`` skips NULL elements and keeps the row, and the
    centroid mean would count the NULL position in its denominator on
    both sides. A partially-NULL vector has no well-defined norm or
    centroid contribution, so it is excluded from BOTH statistics, on
    BOTH engines, by contract.
    """
    whole = F.col("__v").isNotNull() & F.forall(
        "__v", lambda x: x.isNotNull()
    )
    u = df_a.select(F.col(vec_col).alias("__v"), F.lit(0).alias("__s")).unionAll(
        df_b.select(F.col(vec_col).alias("__v"), F.lit(1).alias("__s"))
    ).filter(whole)
    cent = (
        u.select("__s", F.posexplode("__v").alias("__pos", "__x"))
        .groupBy("__s", "__pos")
        .agg(
            F.sum(
                F.floor(F.col("__x").cast("double") * F.lit(1e7)).cast(
                    "decimal(38,0)"
                )
            ).alias("__sx"),
            F.count(F.lit(1)).alias("__n"),
        )
        # one shared expression, mirrored verbatim in the DuckDB oracle:
        # CAST(sum AS DOUBLE) / n / 1e7, left-associated
        .select(
            "__s",
            "__pos",
            (F.col("__sx").cast("double") / F.col("__n") / F.lit(1e7)).alias(
                "__m"
            ),
        )
    )
    a = cent.filter(F.col("__s") == 0).select("__pos", F.col("__m").alias("__ma"))
    b = cent.filter(F.col("__s") == 1).select("__pos", F.col("__m").alias("__mb"))

    def _ti(c):  # BIGINT-scaled dim term: exact, order-insensitive sum
        return F.floor(c * F.lit(1e9)).cast("long")

    cos = (
        a.join(b, on="__pos")
        .agg(
            F.sum(_ti(F.col("__ma") * F.col("__mb"))).alias("__dot"),
            F.sum(_ti(F.col("__ma") * F.col("__ma"))).alias("__na2"),
            F.sum(_ti(F.col("__mb") * F.col("__mb"))).alias("__nb2"),
        )
        .select(
            F.round(
                (F.col("__dot").cast("double") / F.lit(1e9))
                / F.sqrt(
                    (F.col("__na2").cast("double") / F.lit(1e9))
                    * (F.col("__nb2").cast("double") / F.lit(1e9))
                ),
                4,
            ).alias("centroid_cos")
        )
    )
    norm = F.sqrt(
        F.aggregate(
            "__v",
            F.lit(0).cast("long"),
            lambda acc, x: acc
            + F.floor(x.cast("double") * x.cast("double") * F.lit(1e9)).cast(
                "long"
            ),
        ).cast("double")
        / F.lit(1e9)
    )
    ks = ks_drift(
        df_a.select(F.col(vec_col).alias("__v")).filter(whole).select(norm.alias("__n")),
        df_b.select(F.col(vec_col).alias("__v")).filter(whole).select(norm.alias("__n")),
        "__n",
        bins=norm_bins,
    ).select(
        "n_a",
        "n_b",
        F.col("ks_bin").alias("norm_ks_bin"),
        F.col("ks_d").alias("norm_ks_d"),
    )
    return ks.crossJoin(F.broadcast(cos)).select(
        "n_a", "n_b", "centroid_cos", "norm_ks_bin", "norm_ks_d"
    )


def emd_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    col: str,
    bins: int = 256,
    lo: float | None = None,
    hi: float | None = None,
    by: Sequence[str] = (),
) -> DataFrame:
    """Earth mover's (Wasserstein-1) drift distance between the ``col``
    distributions of two slices, on the same ``bins`` equal-width binning
    as :func:`ks_drift` — KS answers "how far apart do the CDFs GET",
    EMD answers "how much mass moved HOW far" (a small shift of all mass
    and a large shift of a little mass can tie on KS; EMD separates
    them). W1 = integral of |CDF_a - CDF_b|; binned here, error <= one
    bin's width per unit mass.

    Output: one row per group ``(n_a, n_b, emd, emd_norm)`` where
    ``emd`` is in the column's units and ``emd_norm = emd / (mx - mn)``
    is scale-free in [0, 1] (0 when the slice range is degenerate).

    Engine congruence: the CDF gap persists unchanged across bins that
    are empty in BOTH slices (absent from the counts relation), so each
    occupied bin contributes ``|gap| * (next_occupied_bin - bin) *
    width`` via a lead() over the bounded counts relation — the final
    occupied bin's gap is exactly 0 (both CDFs reach 1) and is excluded.
    Each term is one shared left-associated double product, scaled to
    exact BIGINT ``floor(term * 10^9)`` and summed order-insensitively
    (the rrf_fuse trick), surfaced as ``sum / 10^9`` rounded to 6.

    Plan shape (100 TB): identical to :func:`ks_drift` — one bounds pass
    (skipped under fixed ``lo``/``hi``), one map-only binning pass into a
    ``bins``-bounded groupBy, then lead/sum windows over <= ``bins`` rows
    per group. In global mode (no ``by``) the cumulative window is
    deliberately UNPARTITIONED, and that is safe by construction, not by
    data: its input is the post-aggregate counts relation whose key is
    the clamped ``greatest(0, least(bins-1, ...))`` bin — at most
    ``bins`` rows can exist regardless of corpus size, so the
    single-partition frame never sees more than ``bins`` rows (pinned in
    tests/test_plan_hygiene.py::test_emd_drift_scan_floor_and_pushdown).
    One-sided groups/slices are dropped, same rule as the rest of the
    drift family.
    """
    if bins < 2:
        raise ValueError(f"bins must be >= 2, got {bins}")
    if (lo is None) != (hi is None):
        raise ValueError("pass both lo and hi, or neither")
    by = list(by)
    u = df_a.select(
        *[F.col(c) for c in by],
        F.col(col).cast("double").alias("__v"),
        F.lit(0).alias("__s"),
    ).unionAll(
        df_b.select(
            *[F.col(c) for c in by],
            F.col(col).cast("double").alias("__v"),
            F.lit(1).alias("__s"),
        )
    ).filter(F.col("__v").isNotNull())
    if lo is None:
        aggs = [F.min("__v").alias("__mn"), F.max("__v").alias("__mx")]
        st = u.groupBy(*by).agg(*aggs) if by else u.agg(*aggs)
        if by:
            s = st
            cond = None
            for c in by:
                s = s.withColumnRenamed(c, f"__g_{c}")
                this = F.col(c).eqNullSafe(F.col(f"__g_{c}"))
                cond = this if cond is None else (cond & this)
            with_bounds = u.join(F.broadcast(s), on=cond)
        else:
            with_bounds = u.crossJoin(F.broadcast(st))
    else:
        with_bounds = u.withColumn("__mn", F.lit(float(lo))).withColumn(
            "__mx", F.lit(float(hi))
        )
    binned = with_bounds.select(
        *[F.col(c) for c in by],
        F.when(F.col("__mx") == F.col("__mn"), F.lit(0))
        .otherwise(
            F.greatest(
                F.lit(0),
                F.least(
                    F.lit(bins - 1),
                    F.floor(
                        (F.col("__v") - F.col("__mn"))
                        * bins
                        / (F.col("__mx") - F.col("__mn"))
                    ),
                ),
            )
        )
        .cast("int")
        .alias("bin"),
        ((F.col("__mx") - F.col("__mn")) / bins).alias("__w"),
        "__s",
    )
    counts = binned.groupBy(*by, "bin").agg(
        F.sum(F.when(F.col("__s") == 0, 1).otherwise(0)).alias("__ca"),
        F.sum(F.when(F.col("__s") == 1, 1).otherwise(0)).alias("__cb"),
        F.max("__w").alias("__w"),
    )
    part = Window.partitionBy(*by) if by else Window
    worder = part.orderBy("bin")
    w = worder.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wfull = worder.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = counts.select(
        *[F.col(c) for c in by],
        "bin",
        "__w",
        F.sum("__ca").over(w).alias("__cuma"),
        F.sum("__cb").over(w).alias("__cumb"),
        F.sum("__ca").over(wfull).alias("__na"),
        F.sum("__cb").over(wfull).alias("__nb"),
        # last occupied bin: no successor -> span 0 -> term 0 (its CDF gap
        # is exactly 0 anyway); keeping the row (instead of filtering it)
        # means a single-bin degenerate distribution still emits emd = 0
        F.coalesce(F.lead("bin").over(worder), F.col("bin")).alias("__nxt"),
    ).filter((F.col("__na") > 0) & (F.col("__nb") > 0))
    # term = |cuma/na - cumb/nb| * (nxt - bin) * w, one shared product
    term = (
        F.abs(
            F.col("__cuma").cast("double") / F.col("__na")
            - F.col("__cumb").cast("double") / F.col("__nb")
        )
        * (F.col("__nxt") - F.col("bin"))
        * F.col("__w")
    )
    scaled = cum.select(
        *[F.col(c) for c in by],
        "__na",
        "__nb",
        (F.col("__w") * bins).alias("__range"),
        F.floor(term * F.lit(1e9)).cast("long").alias("__ti"),
    )
    emd = F.sum("__ti").cast("double") / F.lit(1e9)
    return scaled.groupBy(*by).agg(
        F.max("__na").cast("long").alias("n_a"),
        F.max("__nb").cast("long").alias("n_b"),
        F.round(emd, 6).alias("emd"),
        F.round(
            F.when(F.max("__range") > 0, emd / F.max("__range")).otherwise(
                F.lit(0.0)
            ),
            6,
        ).alias("emd_norm"),
        # same empty-global-aggregate drop as chi2_drift: one-sided inputs
        # yield an empty result, not an all-null row
    ).filter(F.col("n_a").isNotNull())


def _melt(df: DataFrame, cols: Sequence[str], cast: str) -> DataFrame:
    """Map-only long-format melt: one scan emits ``(column, __val)``
    rows for every listed column — ``inline`` over a literal
    struct-array stays inside whole-stage codegen, no shuffle, no UDF.
    The melt is what lets :func:`drift_report` score C columns with the
    monitors' ``by``-group machinery at a column-count-independent
    number of passes."""
    return df.select(
        F.inline(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(c).cast(cast).alias("__val"),
                    )
                    for c in cols
                ]
            )
        )
    )


def drift_report(
    df_a: DataFrame,
    df_b: DataFrame,
    numeric: Sequence[str] = (),
    categorical: Sequence[str] = (),
    embeddings: Sequence[str] = (),
    bins: int = 64,
    psi_bins: int = 8,
) -> DataFrame:
    """One-call drift report between two table snapshots — the entry
    point an ingestion pipeline actually schedules per batch: every
    ``numeric`` column gets the three numeric monitors (KS max-gap, PSI
    total, normalized EMD), every ``categorical`` column gets the
    chi-squared mix statistic, and every ``embeddings`` column (an
    ``array<float/double>`` vector) gets the two :func:`embedding_drift`
    statistics, all in ONE long-format result:

        (column, metric, n_a, n_b, value)

    with ``metric`` in {'ks_d', 'psi', 'emd_norm', 'chi2',
    'centroid_cos', 'norm_ks_d'}. Thresholds are the monitors' standard
    ones (PSI > 0.25 major shift; KS/EMD are scale-free in [0, 1]; chi2
    against a chi2(n_categories-1) quantile; centroid_cos ~1.0 means no
    direction drift).

    Shared-scan plan (r14 — previously ~3C bounded passes for C numeric
    columns): the numeric columns are MELTED once into a long
    ``(column, value)`` relation (map-only ``inline``, one scan) and
    each monitor runs in its certified ``by=['column']`` group mode, so
    KS costs one bounds pass + one binning pass, EMD the same, and PSI
    one reference-cuts pass + one binning pass — a COLUMN-COUNT-
    INDEPENDENT ~6 bounded-aggregate passes per report instead of ~6C
    (categorical columns likewise melt into one chi2 pass for all
    columns). Per-column statistics are BIT-IDENTICAL to the
    single-column monitors (pinned by ``tests/test_stats.py::
    test_drift_report_equals_per_column_monitors``): group mode computes
    each column's own min/max / cuts / totals, which in the melted
    relation ARE the per-column values, through the same expressions.
    Every intermediate stays bounded (|columns x bins| count relations,
    windows partitioned per column), so the report is 100 TB-safe by the
    same construction as its constituents. One-sided inputs yield an
    empty report (same drop rule as every family member).
    """
    numeric = list(numeric)
    categorical = list(categorical)
    embeddings = list(embeddings)
    if not numeric and not categorical and not embeddings:
        raise ValueError(
            "pass at least one numeric, categorical, or embeddings column"
        )
    parts: list[DataFrame] = []

    def _shape(df: DataFrame, metric: str, value_col) -> DataFrame:
        return df.select(
            F.col("column"),
            F.lit(metric).alias("metric"),
            F.col("n_a"),
            F.col("n_b"),
            F.col(value_col).cast("double").alias("value"),
        )

    if numeric:
        m_a = _melt(df_a, numeric, "double")
        m_b = _melt(df_b, numeric, "double")
        parts.append(
            _shape(
                ks_drift(m_a, m_b, "__val", bins=bins, by=["column"]),
                "ks_d",
                "ks_d",
            )
        )
        psi_total = (
            psi_drift(m_a, m_b, "__val", bins=psi_bins, by=["column"])
            .groupBy("column")
            .agg(
                F.sum(F.col("c_a")).cast("long").alias("n_a"),
                F.sum(F.col("c_b")).cast("long").alias("n_b"),
                # family standard (rrf_fuse trick): BIGINT-scale each
                # per-bin term before summing — a raw-double sum of the
                # rounded psi_bin values would be engine-order-sensitive
                # in the last ulp
                F.round(
                    F.sum(
                        F.floor(F.col("psi_bin") * F.lit(1e9)).cast("long")
                    ).cast("double")
                    / F.lit(1e9),
                    6,
                ).alias("psi"),
            )
            # an empty per-bin relation (one-sided input) must yield no
            # report row, not a null-valued one
            .filter(F.col("psi").isNotNull())
        )
        parts.append(_shape(psi_total, "psi", "psi"))
        parts.append(
            _shape(
                emd_drift(m_a, m_b, "__val", bins=bins, by=["column"]),
                "emd_norm",
                "emd_norm",
            )
        )
    if categorical:
        c_a = _melt(df_a, categorical, "string")
        c_b = _melt(df_b, categorical, "string")
        parts.append(
            _shape(
                chi2_drift(c_a, c_b, "__val", by=["column"]), "chi2", "chi2"
            )
        )
    for col in embeddings:
        ed = embedding_drift(df_a, df_b, col)
        for metric in ("centroid_cos", "norm_ks_d"):
            parts.append(
                ed.select(
                    F.lit(col).alias("column"),
                    F.lit(metric).alias("metric"),
                    F.col("n_a"),
                    F.col("n_b"),
                    F.col(metric).cast("double").alias("value"),
                )
            )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out
