"""Streaming drift alerting: every micro-batch's column distribution is
compared against a FIXED reference profile and the one-row statistic
appended to a monitor sink — the continuous form of the batch drift
family ("page when a crawl snapshot's doc-length distribution moves"),
composed from two separately-certified pieces: the batch monitors and
the Structured-Streaming IPC bridge. Four monitors, matching the batch
family: KS (numeric, equal-width bins), EMD/Wasserstein-1 (same bins,
same profile relation as KS — run both off one saved profile), PSI
(numeric, equi-depth reference cuts), chi2 (categorical mix).

Scale/state story: production drift monitors pin bin edges to the
reference/training distribution (fixed ``lo``/``hi`` — REQUIRED here), so
the reference reduces ONCE to its binned counts: a <= ``bins``-row
relation computed at monitor start and persisted. Per micro-batch the
stream pays exactly one map-only binning pass over ITS OWN rows plus a
join against the bounded profile — the reference corpus is never
rescanned, no matter how long the stream runs, and monitor state is
O(bins), not O(stream). The per-batch statistic is identical to
``ks_drift(reference, batch, col, bins, lo, hi)`` (pytest-pinned
equivalence), so alert thresholds transfer between batch backfills and
the live monitor.

The reference has no streaming (SURVEY §2.2); this is extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _bin_col(col: str, bins: int, lo: float, hi: float):
    """The SAME left-associated binning expression as ks_drift's fixed-
    bounds mode: out-of-range values clamp into the edge bins."""
    v = F.col(col).cast("double")
    return (
        F.when(F.lit(float(hi)) == F.lit(float(lo)), F.lit(0))
        .otherwise(
            F.greatest(
                F.lit(0),
                F.least(
                    F.lit(bins - 1),
                    F.floor(
                        (v - F.lit(float(lo)))
                        * bins
                        / (F.lit(float(hi)) - F.lit(float(lo)))
                    ),
                ),
            )
        )
        .cast("int")
        .alias("bin")
    )


def reference_bin_profile(
    df: DataFrame, col: str, bins: int, lo: float, hi: float
) -> DataFrame:
    """One pass over the reference -> its fixed-bounds bin counts
    ``(bin, ref_n)``: the <= ``bins``-row relation the monitor joins
    every micro-batch against instead of rescanning the reference."""
    return (
        df.filter(F.col(col).isNotNull())
        .select(_bin_col(col, bins, lo, hi))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("ref_n"))
    )


def ks_against_profile(
    profile: DataFrame, batch_df: DataFrame, col: str, bins: int, lo: float, hi: float
) -> DataFrame:
    """One-row ``(n_a, n_b, ks_bin, ks_d)`` between the profiled
    reference (side a) and ``batch_df`` (side b) — numerically identical
    to ``ks_drift(reference, batch, col, bins, lo, hi)`` (the cum/gap
    stage replayed over pre-aggregated reference counts; pytest pins the
    equivalence). Empty batches yield an empty result (one-sided rule)."""
    bc = (
        batch_df.filter(F.col(col).isNotNull())
        .select(_bin_col(col, bins, lo, hi))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("bat_n"))
    )
    counts = (
        profile.withColumnRenamed("ref_n", "__ca")
        .join(bc.withColumnRenamed("bat_n", "__cb"), on="bin", how="full_outer")
        .select(
            "bin",
            F.coalesce(F.col("__ca"), F.lit(0)).alias("__ca"),
            F.coalesce(F.col("__cb"), F.lit(0)).alias("__cb"),
        )
    )
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wfull = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = counts.select(
        "bin",
        F.sum("__ca").over(w).alias("__cuma"),
        F.sum("__cb").over(w).alias("__cumb"),
        F.sum("__ca").over(wfull).alias("__na"),
        F.sum("__cb").over(wfull).alias("__nb"),
    ).filter((F.col("__na") > 0) & (F.col("__nb") > 0))
    gaps = cum.select(
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
    return gaps.orderBy(F.col("ks_d").desc(), F.col("ks_bin")).limit(1)


def stream_drift_monitor(
    stream_df: DataFrame,
    reference_df: DataFrame | None,
    col: str,
    sink_path: str,
    checkpoint: str,
    bins: int = 64,
    lo: float | None = None,
    hi: float | None = None,
    profile: DataFrame | None = None,
) -> None:
    """Run ``stream_df`` (availableNow) through per-micro-batch KS drift
    against ``reference_df``; each batch appends one parquet row
    ``(batch_id, n_a, n_b, ks_bin, ks_d)`` to ``sink_path``. Fixed
    ``lo``/``hi`` bounds are REQUIRED (production drift monitors pin bin
    edges to the reference distribution; data-derived bounds would change
    meaning batch to batch and force a reference rescan). Batches with no
    non-null values append nothing (the family's one-sided rule). Replay
    semantics: foreachBatch is at-least-once, so a crash can re-append a
    batch's row — consumers should read the LATEST row per batch_id
    (max-ts or any-of; the statistic is deterministic, so replays carry
    identical values).

    Pass ``profile`` (a persisted ``reference_bin_profile`` result read
    back from parquet) to make the monitor RESTART-STABLE: a monitor that
    recomputes its profile from ``reference_df`` on every start silently
    shifts its alert baseline if the reference dataset moved between
    runs; a saved profile pins the baseline to the exact distribution the
    thresholds were tuned on. ``bins``/``lo``/``hi`` must be the values
    the profile was built with (they define its bin space). A passed
    ``profile`` is used as-is — its storage level belongs to the caller
    (the monitor only persists/unpersists profiles it computed itself,
    so a profile shared across monitors keeps its cached status)."""
    if lo is None or hi is None:
        raise ValueError("stream_drift_monitor requires fixed lo/hi bounds")
    created_here = profile is None
    if created_here:
        if reference_df is None:
            raise ValueError("pass reference_df or a saved profile")
        profile = reference_bin_profile(reference_df, col, bins, lo, hi)
        profile = profile.persist()
        profile.count()  # materialize once; <= bins rows

    def process(batch_df: DataFrame, batch_id: int) -> None:
        stat = ks_against_profile(profile, batch_df, col, bins, lo, hi)
        stat.select(
            F.lit(batch_id).cast("long").alias("batch_id"),
            "n_a",
            "n_b",
            "ks_bin",
            "ks_d",
        ).write.mode("append").parquet(sink_path)

    try:
        q = (
            stream_df.writeStream.foreachBatch(process)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if created_here:
            profile.unpersist()


def reference_psi_profile(
    df: DataFrame, col: str, bins: int = 8
) -> tuple[DataFrame, DataFrame]:
    """One pass over the reference -> its PSI profile: the equi-depth cut
    array (one-row relation, exact interpolated percentiles — the same
    convention as ``functions.stats.psi_drift``) and the reference's own
    per-bin counts ``(bin, ref_n)``. Both are <= ``bins``-row relations;
    the monitor joins every micro-batch against them instead of
    rescanning the reference."""
    fracs = [i / bins for i in range(1, bins)]
    quoted = "`" + col.replace("`", "``") + "`"
    ref = df.filter(F.col(col).isNotNull())
    cuts = ref.agg(
        F.expr(
            f"percentile({quoted}, array({', '.join(str(f) for f in fracs)}))"
        ).alias("__cuts")
    )
    assigned = ref.select(F.col(col).cast("double").alias("__v")).crossJoin(
        F.broadcast(cuts)
    )
    bucket = F.lit(bins - 1)
    for i in range(bins - 2, -1, -1):
        bucket = F.when(
            F.col("__v") <= F.col("__cuts").getItem(i), F.lit(i)
        ).otherwise(bucket)
    counts = (
        assigned.select(bucket.cast("int").alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("ref_n"))
    )
    return cuts, counts


def psi_against_profile(
    cuts: DataFrame,
    ref_counts: DataFrame,
    batch_df: DataFrame,
    col: str,
    bins: int = 8,
) -> DataFrame:
    """One-row ``(n_a, n_b, psi)`` between the profiled reference (side a)
    and ``batch_df`` (side b): the same <=-CASE assignment, occupied-bins
    rule (full-outer join of the two bounded count relations), and
    ``greatest(c, 0.5)/n`` continuity clamp as ``psi_drift`` — the total
    is pytest-pinned to match ``sum(psi_bin)`` from the batch monitor
    within the test's 1e-5 tolerance (this path sums BIGINT-scaled RAW
    terms, the batch monitor surfaces round-6 per-bin terms, so the two
    totals can differ by up to ~0.5e-6 per bin). Per-bin terms are
    BIGINT-scaled (``floor(term * 1e9)``) before the sum, so the total is
    engine-order-insensitive. Empty batches yield an empty result
    (one-sided rule)."""
    b = batch_df.filter(F.col(col).isNotNull()).select(
        F.col(col).cast("double").alias("__v")
    ).crossJoin(F.broadcast(cuts))
    bucket = F.lit(bins - 1)
    for i in range(bins - 2, -1, -1):
        bucket = F.when(
            F.col("__v") <= F.col("__cuts").getItem(i), F.lit(i)
        ).otherwise(bucket)
    bc = (
        b.select(bucket.cast("int").alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("bat_n"))
    )
    counts = (
        ref_counts.withColumnRenamed("ref_n", "__ca")
        .join(bc.withColumnRenamed("bat_n", "__cb"), on="bin", how="full_outer")
        .select(
            "bin",
            F.coalesce(F.col("__ca"), F.lit(0)).alias("__ca"),
            F.coalesce(F.col("__cb"), F.lit(0)).alias("__cb"),
        )
    )
    wfull = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    tot = counts.select(
        "__ca",
        "__cb",
        F.sum("__ca").over(wfull).alias("__na"),
        F.sum("__cb").over(wfull).alias("__nb"),
    ).filter((F.col("__na") > 0) & (F.col("__nb") > 0))
    pa = F.greatest(F.col("__ca").cast("double"), F.lit(0.5)) / F.col("__na")
    pb = F.greatest(F.col("__cb").cast("double"), F.lit(0.5)) / F.col("__nb")
    scaled = tot.select(
        "__na",
        "__nb",
        F.floor((pa - pb) * F.log(pa / pb) * F.lit(1e9)).cast("long").alias("__ti"),
    )
    return scaled.groupBy().agg(
        F.max("__na").cast("long").alias("n_a"),
        F.max("__nb").cast("long").alias("n_b"),
        F.round(F.sum("__ti").cast("double") / F.lit(1e9), 6).alias("psi"),
    ).filter(F.col("n_a").isNotNull())


def stream_psi_monitor(
    stream_df: DataFrame,
    reference_df: DataFrame | None,
    col: str,
    sink_path: str,
    checkpoint: str,
    bins: int = 8,
    profile: tuple[DataFrame, DataFrame] | None = None,
) -> None:
    """Per-micro-batch PSI against a fixed reference: the reference
    reduces ONCE to its equi-depth cuts + per-bin counts (both <= ``bins``
    rows, persisted); each batch pays one map-only assignment pass over
    its own rows and appends one parquet row
    ``(batch_id, n_a, n_b, psi)`` to ``sink_path`` (PSI > 0.25 = major
    shift, the standard alert bar). Same replay semantics as
    ``stream_drift_monitor``: at-least-once appends of a deterministic
    row. Batches with no non-null values append nothing. Pass ``profile``
    (a saved ``reference_psi_profile`` pair read back from parquet) for a
    restart-stable baseline — same reasoning as ``stream_drift_monitor``;
    as there, a passed profile's storage level belongs to the caller (the
    monitor only persists/unpersists profiles it computed itself)."""
    created_here = profile is None
    if not created_here:
        cuts, ref_counts = profile
    else:
        if reference_df is None:
            raise ValueError("pass reference_df or a saved profile")
        cuts, ref_counts = reference_psi_profile(reference_df, col, bins)
        cuts = cuts.persist()
        ref_counts = ref_counts.persist()
        cuts.count()
        ref_counts.count()

    def process(batch_df: DataFrame, batch_id: int) -> None:
        stat = psi_against_profile(cuts, ref_counts, batch_df, col, bins)
        stat.select(
            F.lit(batch_id).cast("long").alias("batch_id"), "n_a", "n_b", "psi"
        ).write.mode("append").parquet(sink_path)

    try:
        q = (
            stream_df.writeStream.foreachBatch(process)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if created_here:
            cuts.unpersist()
            ref_counts.unpersist()


def reference_chi2_profile(df: DataFrame, col: str) -> DataFrame:
    """One pass over the reference -> its per-category counts
    ``(cat, ref_n)``: the cardinality-bounded relation the chi2 monitor
    joins every micro-batch against instead of rescanning the reference.
    Intended for CATEGORICAL columns (language/source/label/file-type
    mixes) whose cardinality is profile-sized; NULL categories are
    dropped, the family rule."""
    return (
        df.filter(F.col(col).isNotNull())
        .select(F.col(col).cast("string").alias("cat"))
        .groupBy("cat")
        .agg(F.count(F.lit(1)).alias("ref_n"))
    )


def chi2_against_profile(
    profile: DataFrame, batch_df: DataFrame, col: str
) -> DataFrame:
    """One-row ``(n_a, n_b, n_categories, chi2)`` between the profiled
    reference (side a) and ``batch_df`` (side b) — numerically identical
    to ``functions.stats.chi2_drift(reference, batch, col)`` (pytest pins
    the equivalence): full-outer join of the two bounded count relations
    (occupied-categories rule), the SAME shared left-associated chi2 term
    formula, BIGINT-scaled ``floor(term * 1e9)`` order-insensitive sum.
    Slice totals come from a bounded aggregate broadcast back (window-
    free, the r13 chi2_drift idiom). Empty batches yield an empty result
    (one-sided rule)."""
    bc = (
        batch_df.filter(F.col(col).isNotNull())
        .select(F.col(col).cast("string").alias("cat"))
        .groupBy("cat")
        .agg(F.count(F.lit(1)).alias("bat_n"))
    )
    counts = (
        profile.withColumnRenamed("ref_n", "__ca")
        .join(bc.withColumnRenamed("bat_n", "__cb"), on="cat", how="full_outer")
        .select(
            "cat",
            F.coalesce(F.col("__ca"), F.lit(0)).alias("__ca"),
            F.coalesce(F.col("__cb"), F.lit(0)).alias("__cb"),
        )
    )
    tot = counts.agg(
        F.sum("__ca").alias("__na"), F.sum("__cb").alias("__nb")
    )
    with_totals = counts.crossJoin(F.broadcast(tot)).filter(
        (F.col("__na") > 0) & (F.col("__nb") > 0)
    )
    # identical shared formula to chi2_drift (functions/stats.py):
    # e_x = (CAST(n_x AS DOUBLE) * (ca + cb)) / (na + nb)
    t = F.col("__ca") + F.col("__cb")
    grand = F.col("__na") + F.col("__nb")
    ea = F.col("__na").cast("double") * t / grand
    eb = F.col("__nb").cast("double") * t / grand
    term = ((F.col("__ca") - ea) * (F.col("__ca") - ea)) / ea + (
        (F.col("__cb") - eb) * (F.col("__cb") - eb)
    ) / eb
    scaled = with_totals.select(
        "__na",
        "__nb",
        F.floor(term * F.lit(1e9)).cast("long").alias("__ci"),
    )
    return scaled.groupBy().agg(
        F.max("__na").cast("long").alias("n_a"),
        F.max("__nb").cast("long").alias("n_b"),
        F.count(F.lit(1)).cast("long").alias("n_categories"),
        F.round(F.sum("__ci").cast("double") / F.lit(1e9), 6).alias("chi2"),
    ).filter(F.col("n_a").isNotNull())


def stream_chi2_monitor(
    stream_df: DataFrame,
    reference_df: DataFrame | None,
    col: str,
    sink_path: str,
    checkpoint: str,
    profile: DataFrame | None = None,
) -> None:
    """Per-micro-batch chi-squared mix drift against a fixed reference —
    the CATEGORICAL member completing the streaming monitor family
    (KS = numeric equal-width, PSI = numeric equi-depth, chi2 =
    language/source/label mix). The reference reduces ONCE to its
    per-category counts (cardinality-bounded, persisted); each batch pays
    one map-only pass over its own rows plus a join against the bounded
    profile, appending one parquet row
    ``(batch_id, n_a, n_b, n_categories, chi2)`` to ``sink_path``.
    Monitor state is O(|categories|), never O(stream); the reference is
    never rescanned. Same replay semantics as ``stream_drift_monitor``
    (at-least-once appends of a deterministic row) and the same
    saved-profile restart story: pass ``profile`` (a persisted
    ``reference_chi2_profile`` read back from parquet) to pin the alert
    baseline; a passed profile's storage level belongs to the caller.
    Batches with no non-null values append nothing (one-sided rule)."""
    created_here = profile is None
    if created_here:
        if reference_df is None:
            raise ValueError("pass reference_df or a saved profile")
        profile = reference_chi2_profile(reference_df, col)
        profile = profile.persist()
        profile.count()  # materialize once; |categories| rows

    def process(batch_df: DataFrame, batch_id: int) -> None:
        stat = chi2_against_profile(profile, batch_df, col)
        stat.select(
            F.lit(batch_id).cast("long").alias("batch_id"),
            "n_a",
            "n_b",
            "n_categories",
            "chi2",
        ).write.mode("append").parquet(sink_path)

    try:
        q = (
            stream_df.writeStream.foreachBatch(process)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if created_here:
            profile.unpersist()


def emd_against_profile(
    profile: DataFrame, batch_df: DataFrame, col: str, bins: int, lo: float, hi: float
) -> DataFrame:
    """One-row ``(n_a, n_b, emd, emd_norm)`` between the profiled
    reference (side a) and ``batch_df`` (side b) — numerically identical
    to ``functions.stats.emd_drift(reference, batch, col, bins, lo, hi)``
    (pytest pins exact ==): same full-outer occupied-bins join as the KS
    monitor (the SAME ``reference_bin_profile`` relation serves both —
    one profile, two statistics), lead()-span CDF-gap integral with
    BIGINT-scaled ``floor(term * 1e9)`` terms. With fixed bounds the bin
    width is the constant ``(hi - lo) / bins``. The unpartitioned
    cumulative window is bounded by construction: its input is the
    full-outer join of two bin-keyed relations whose key is clamped to
    [0, bins-1], so at most ``bins`` rows exist regardless of reference
    or batch size. Empty batches yield an empty result (one-sided
    rule)."""
    width = (float(hi) - float(lo)) / bins
    bc = (
        batch_df.filter(F.col(col).isNotNull())
        .select(_bin_col(col, bins, lo, hi))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("bat_n"))
    )
    counts = (
        profile.withColumnRenamed("ref_n", "__ca")
        .join(bc.withColumnRenamed("bat_n", "__cb"), on="bin", how="full_outer")
        .select(
            "bin",
            F.coalesce(F.col("__ca"), F.lit(0)).alias("__ca"),
            F.coalesce(F.col("__cb"), F.lit(0)).alias("__cb"),
        )
    )
    worder = Window.orderBy("bin")
    w = worder.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wfull = worder.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = counts.select(
        "bin",
        F.sum("__ca").over(w).alias("__cuma"),
        F.sum("__cb").over(w).alias("__cumb"),
        F.sum("__ca").over(wfull).alias("__na"),
        F.sum("__cb").over(wfull).alias("__nb"),
        F.coalesce(F.lead("bin").over(worder), F.col("bin")).alias("__nxt"),
    ).filter((F.col("__na") > 0) & (F.col("__nb") > 0))
    term = (
        F.abs(
            F.col("__cuma").cast("double") / F.col("__na")
            - F.col("__cumb").cast("double") / F.col("__nb")
        )
        * (F.col("__nxt") - F.col("bin"))
        * F.lit(width)
    )
    scaled = cum.select(
        "__na",
        "__nb",
        F.floor(term * F.lit(1e9)).cast("long").alias("__ti"),
    )
    emd = F.sum("__ti").cast("double") / F.lit(1e9)
    rng = width * bins
    return scaled.groupBy().agg(
        F.max("__na").cast("long").alias("n_a"),
        F.max("__nb").cast("long").alias("n_b"),
        F.round(emd, 6).alias("emd"),
        F.round(
            F.when(F.lit(rng) > 0, emd / F.lit(rng)).otherwise(F.lit(0.0)), 6
        ).alias("emd_norm"),
    ).filter(F.col("n_a").isNotNull())


def stream_emd_monitor(
    stream_df: DataFrame,
    reference_df: DataFrame | None,
    col: str,
    sink_path: str,
    checkpoint: str,
    bins: int = 64,
    lo: float | None = None,
    hi: float | None = None,
    profile: DataFrame | None = None,
) -> None:
    """Per-micro-batch Wasserstein-1 drift against a fixed reference —
    the how-much-mass-moved-how-far companion to ``stream_drift_monitor``
    (KS reads the peak CDF gap; a broad small shift and a narrow large
    one can tie on KS, EMD separates them). Shares the KS monitor's
    profile format (``reference_bin_profile`` — run BOTH monitors off one
    saved profile), its REQUIRED fixed ``lo``/``hi`` bounds, its replay
    semantics, its caller-owned-persistence contract, and its O(bins)
    state; each batch appends one parquet row
    ``(batch_id, n_a, n_b, emd, emd_norm)``. The statistic is pinned
    exactly == batch ``emd_drift(reference, batch, col, bins, lo, hi)``."""
    if lo is None or hi is None:
        raise ValueError("stream_emd_monitor requires fixed lo/hi bounds")
    created_here = profile is None
    if created_here:
        if reference_df is None:
            raise ValueError("pass reference_df or a saved profile")
        profile = reference_bin_profile(reference_df, col, bins, lo, hi)
        profile = profile.persist()
        profile.count()  # materialize once; <= bins rows

    def process(batch_df: DataFrame, batch_id: int) -> None:
        stat = emd_against_profile(profile, batch_df, col, bins, lo, hi)
        stat.select(
            F.lit(batch_id).cast("long").alias("batch_id"),
            "n_a",
            "n_b",
            "emd",
            "emd_norm",
        ).write.mode("append").parquet(sink_path)

    try:
        q = (
            stream_df.writeStream.foreachBatch(process)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if created_here:
            profile.unpersist()
