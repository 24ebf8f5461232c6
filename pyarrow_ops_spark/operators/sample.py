"""Deterministic, engine-reproducible sampling.

``df.sample`` draws from a per-partition RNG, so the sampled row set depends
on partitioning and differs run-to-run once AQE or a repartition moves rows.
At 100 TB that nondeterminism makes sampled pipelines unauditable: an A/B
comparison of two curation runs can't share a sample. These operators derive
the keep decision from a content hash of key columns instead — the same rows
fall out on any engine, any partitioning, any cluster size. (The reference
gets reproducibility from numpy's seeded RNG on one machine; a distributed
engine needs the decision to be a pure function of the row.)

Scale design: the predicate is a map-only Catalyst expression (md5 + a
string compare) — no shuffle, no RNG state, fuses into the scan stage and
composes with pushdown of sargable predicates around it.

The hash is the first 16 bits of ``md5(concat_ws('|', keys))`` compared
against ``floor(fraction * 2**16)`` rendered as 4 lowercase hex digits —
byte-identical semantics in any engine with md5 (the DuckDB oracles in
entry_queries.py run the same expression), with ~2**-16 fraction
granularity.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HASH_BITS = 16


def _bucket(key_cols: Sequence[str], seed: str) -> Column:
    """First 4 hex chars of md5 over the salted, '|'-joined key columns."""
    salted = [F.lit(seed)] if seed else []
    salted += [F.col(c).cast("string") for c in key_cols]
    return F.substring(F.md5(F.concat_ws("|", *salted)), 1, 4)


def _threshold(fraction: float) -> str:
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    n = int(fraction * (1 << _HASH_BITS))
    # 'g' sorts after every 4-digit hex string, so fraction=1.0 keeps all
    # rows ('10000' would NOT: it is 5 chars and '1' < 'f' lexicographically)
    return "g" if n >= (1 << _HASH_BITS) else format(n, "04x")


def sample_hash(
    df: DataFrame,
    fraction: float,
    key_cols: Sequence[str],
    seed: str = "",
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen deterministically per key content.

    Rows with equal keys always land together (in or out) — giving
    consistent entity-level samples across tables that share the key.
    ``seed`` rotates to an independent sample without touching the keys.
    """
    threshold = _threshold(fraction)  # validates range even when keeping all
    if fraction >= 1.0:
        return df
    return df.filter(_bucket(key_cols, seed) < F.lit(threshold))


def sample_stratified(
    df: DataFrame,
    strata_col: str,
    fractions: Mapping[str, float],
    key_cols: Sequence[str],
    default_fraction: float = 0.0,
    seed: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling (the hash analog of ``sampleBy``).

    ``fractions`` maps a stratum value to its keep rate; strata absent from
    the map keep ``default_fraction``. One map-only predicate — the CASE
    picks the threshold, the hash picks the row — so a 100-stratum sample
    still costs a single scan with no shuffle.
    """
    thresh = F.lit(_threshold(default_fraction))
    for value, fraction in sorted(fractions.items()):
        thresh = F.when(
            F.col(strata_col) == F.lit(value), F.lit(_threshold(fraction))
        ).otherwise(thresh)
    return df.filter(_bucket(key_cols, seed) < thresh)


def sample_per_key(
    df: DataFrame,
    key_cols: Sequence[str],
    k: int,
    order_cols: Sequence[str],
    seed: str = "",
) -> DataFrame:
    """Keep EXACTLY min(k, group size) rows per key group — the
    deterministic analog of per-key reservoir sampling (k examples per
    user / per domain / per class for eval sets and few-shot pools).

    Rows within a group are ranked by (content hash of ``order_cols``,
    ``order_cols``) so the draw is a pure function of row content: any
    engine, any partitioning, any cluster size picks the same rows, and
    ``seed`` rotates to an independent draw. A true streaming reservoir
    (Vitter's R) is RNG-state-dependent and irreproducible across runs —
    the wrong trade at audit time.

    Scale shape: one hash-partitioned exchange on ``key_cols`` + in-group
    sort. Spark's WindowGroupLimit pushes the ``rank <= k`` limit map-side
    before the exchange, so each partition ships at most k rows per local
    group rather than the whole group.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    from pyspark.sql import Window

    from pyarrow_ops_spark.functions.ordering import shuffle_key

    win = Window.partitionBy(*key_cols).orderBy(
        shuffle_key(order_cols, seed), *[F.col(c) for c in order_cols]
    )
    return (
        df.withColumn("__rk", F.row_number().over(win))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )


def token_budget_sample(
    df: DataFrame,
    strata_col: str,
    budget: int,
    token_col: str,
    key_cols: Sequence[str],
    seed: str = "",
    cum_col: str | None = None,
) -> DataFrame:
    """Keep documents per stratum until a token budget fills — "take 1B
    tokens of web, 1B of code" — the budgeted form of ``mix_sources``
    (which balances row counts; training mixtures are specified in
    tokens).

    Rows are consumed in deterministic content-hash order (same
    reproducibility contract as ``sample_hash``); a row is kept while the
    running token total INCLUDING it is <= ``budget``, so the realized
    total never overshoots and undershoots only by the straddling
    document. ``cum_col`` optionally exposes the running total.

    Scale shape: one exchange on ``strata_col`` + in-group sort for the
    running-sum window — the same shape as any cumulative metric; no
    driver materialization, no second pass. With S strata and ~uniform
    document sizes the exchange carries only (hash, tokens)-ordered rows;
    heavily skewed strata sort within the stratum's executors. For
    web-scale strata where a total sort is too hot, pre-filter with
    ``sample_hash`` at fraction ≈ budget/stratum_tokens first and
    budget-trim the survivors — same result distribution, 1/fraction less
    data through the window.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    from pyspark.sql import Window

    from pyarrow_ops_spark.functions.ordering import shuffle_key

    win = (
        Window.partitionBy(strata_col)
        .orderBy(shuffle_key(key_cols, seed), *[F.col(c) for c in key_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df.withColumn("__cum", F.sum(F.col(token_col).cast("long")).over(win))
    out = out.filter(F.col("__cum") <= budget)
    return out.withColumnRenamed("__cum", cum_col) if cum_col else out.drop("__cum")


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    key_cols: Sequence[str],
    seed: str = "",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement: keep ``k`` rows where each
    row's inclusion odds scale with ``weight_col`` — the
    Efraimidis-Spirakis A-ES scheme (priority = u^(1/w), keep the k
    largest), with the uniform ``u`` derived from a content hash instead
    of RNG state so the draw is a pure function of row content: any
    engine, any partitioning picks the same rows, and ``seed`` rotates to
    an independent draw. Used for quality-weighted coreset selection
    ("sample 1M docs proportional to quality score").

    Rows with non-positive weight are excluded (they have zero mass).
    Ranking uses ln(u)/w (monotone in u^(1/w), no pow-precision cliff);
    u gets 52 md5 bits -> (0,1) exactly representable in a double.

    Scale shape: map-only priority computation + TakeOrderedAndProject —
    each partition keeps its local top-k, the driver merges k-sized heaps;
    no full sort, no shuffle of the data."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    salted = [F.lit(seed)] if seed else []
    salted += [F.col(c).cast("string") for c in key_cols]
    u = (
        F.conv(F.substring(F.md5(F.concat_ws("|", *salted)), 1, 13), 16, 10)
        .cast("double")
        + 0.5
    ) / float(1 << 52)
    pri = F.log(u) / F.col(weight_col).cast("double")
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("__pri", pri)
        .orderBy(F.col("__pri").desc(), *[F.col(c) for c in key_cols])
        .limit(k)
        .drop("__pri")
    )


def split_by_key(
    df: DataFrame,
    key_cols: Sequence[str],
    splits: Mapping[str, int],
    seed: str = "",
    out: str = "split",
) -> DataFrame:
    """Assign every row a split label ('train'/'valid'/'test'/...) such
    that ALL rows sharing ``key_cols`` land in the SAME split — the
    leakage-safe form of train/test splitting. Splitting independent rows
    (``TableCleaner.split``, reference ``ml.py:120-128``) leaks when
    near-duplicate or same-entity rows straddle the boundary; keying the
    split by document cluster / user / domain guarantees disjointness by
    construction.

    ``splits`` maps label -> integer weight (e.g. ``{"train": 8,
    "valid": 1, "test": 1}``). The assignment is the same md5 content-hash
    bucket as ``sample_hash`` cut at cumulative integer thresholds —
    map-only, no shuffle, no RNG state, byte-identical in any engine with
    md5 (the DuckDB oracle runs the same CASE), and ``seed`` rotates to an
    independent split. Expected proportions are weight/total with ~2^-16
    granularity; realized proportions deviate by hash variance over KEYS
    (not rows — a 1000-row cluster moves together, by design).
    """
    if not splits:
        raise ValueError("splits must be non-empty")
    if any(w <= 0 for w in splits.values()):
        raise ValueError(f"split weights must be positive integers, got {splits}")
    total = sum(splits.values())
    bucket = _bucket(key_cols, seed)
    # Label order is the mapping's insertion order: the first label owns
    # the low hash buckets ({"train": 8, "valid": 1, "test": 1} puts train
    # at [0, 8/10)), and the WHEN chain tests thresholds low-to-high.
    expr = F.lit(None).cast("string")
    cum = 0
    thresholds = []
    for label, w in splits.items():
        cum += w
        thresholds.append((label, _hex_threshold(cum, total)))
    for label, hi in reversed(thresholds):
        expr = F.when(bucket < F.lit(hi), F.lit(label)).otherwise(expr)
    return df.withColumn(out, expr)


def _hex_threshold(numer: int, denom: int) -> str:
    """Hex compare-threshold for keep-fraction numer/denom, derived with
    pure integer arithmetic (floor((numer << 16) / denom)) so any engine
    reproduces it exactly — no float rounding at the boundary."""
    n = (numer << _HASH_BITS) // denom
    return "g" if n >= (1 << _HASH_BITS) else format(n, "04x")


def mix_sources(
    df: DataFrame,
    strata_col: str,
    weights: Mapping[str, int],
    key_cols: Sequence[str],
    seed: str = "",
    exact: bool = False,
) -> DataFrame:
    """Rebalance a corpus to an integer weight mixture by downsampling —
    the domain-mixing step of a training-data pipeline ("2 parts web, 1
    part code, 1 part books"). Strata absent from ``weights`` are dropped.

    The largest feasible output targets ``w_s * K`` rows of stratum ``s``
    where ``K = min_s floor(n_s / w_s)`` — no stratum is oversampled. Kept
    counts are APPROXIMATE, not exact: the per-stratum keep decision is
    the same content-hash predicate as ``sample_hash`` with threshold
    ``floor(w_s*K*2^16/n_s)``, so realized counts deviate by hash variance
    plus the ~2^-16 threshold granularity; mixture ratios converge only
    for large strata (an exact count would need a rank-based top-K per
    stratum, i.e. a per-stratum sort). Integer math end-to-end, so the
    DuckDB oracle derives identical thresholds from its own counts.

    Raises ``ValueError`` when any weighted stratum has fewer rows than
    its weight (``K`` would be 0 and the output silently empty).

    ``exact=True`` keeps EXACTLY ``w_s * K`` rows per stratum: rows are
    ranked within each stratum by (full content hash, key columns) and
    the top ``w_s * K`` kept — still deterministic and engine-reproducible
    (the rank order is a pure function of row content), at the cost of one
    shuffle+sort on ``strata_col``. Use it when strata are small enough
    that hash variance matters (a 50-row stratum can realize 8 rows where
    10 were targeted); prefer the default map-only mode for web-scale
    strata where the deviation is ~sqrt(n) and a per-stratum sort of a
    multi-TB stratum (plus its key skew) is the real cost. The hash-first
    sort key also means the exact sample is NOT nested inside the
    approximate one — they are independent deterministic draws.

    Scale design (default mode): one count-per-stratum aggregation
    (map-side combined; result is #strata rows, collected to the driver
    like any dimension stat), then a single map-only CASE+hash filter over
    the corpus — no shuffle of the data itself, composes with scan
    pushdown.
    """
    if not weights:
        raise ValueError("weights must be non-empty")
    if any(w <= 0 for w in weights.values()):
        raise ValueError(f"weights must be positive integers, got {weights}")
    counts = {
        r[0]: r[1]
        for r in df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("n")).collect()
        if r[0] in weights
    }
    missing = sorted(set(weights) - set(counts))
    if missing:
        raise ValueError(f"strata absent from data: {missing}")
    k = min(counts[s] // w for s, w in weights.items())
    if k == 0:
        starved = sorted(s for s, w in weights.items() if counts[s] < w)
        raise ValueError(
            f"mixture infeasible: strata {starved} have fewer rows than their "
            f"weight (counts={ {s: counts[s] for s in starved} }); the largest "
            "feasible mixture multiple K is 0, which would keep nothing"
        )
    if exact:
        from pyspark.sql import Window

        from pyarrow_ops_spark.functions.ordering import shuffle_key

        win = Window.partitionBy(strata_col).orderBy(
            shuffle_key(key_cols, seed), *[F.col(c) for c in key_cols]
        )
        target = F.lit(None).cast("long")
        for value, w in sorted(weights.items()):
            target = F.when(
                F.col(strata_col) == F.lit(value), F.lit(w * k)
            ).otherwise(target)
        return (
            df.withColumn("__rk", F.row_number().over(win))
            .filter(F.col("__rk") <= target)
            .drop("__rk")
        )
    thresh = F.lit(None).cast("string")
    for value, w in sorted(weights.items()):
        thresh = F.when(
            F.col(strata_col) == F.lit(value),
            F.lit(_hex_threshold(w * k, counts[value])),
        ).otherwise(thresh)
    return df.filter(_bucket(key_cols, seed) < thresh)


def mixture_weights(
    df: DataFrame,
    strata_col: str,
    alpha: float = 0.5,
) -> DataFrame:
    """Temperature-scaled mixture weights over the strata of a corpus —
    the alpha-sampling rule multilingual/multi-domain training uses to
    boost low-resource strata without drowning high-resource ones
    (q_s ∝ p_s^alpha; alpha=1 keeps natural proportions, alpha=0 is
    uniform, ~0.3-0.7 typical).

    Output, one row per stratum: (stratum, n_rows, share, weight, boost)
    where ``share`` is the natural proportion n_s/N, ``weight`` the
    renormalized p^alpha sampling probability, and ``boost`` =
    weight/share (the up/down-sampling factor a pipeline applies, e.g.
    via ``sample_hash`` per stratum or epoch repetition).

    Fully in-plan: one map-side-combined count per stratum, then two
    broadcast joins against single-row totals — no collect, no window;
    the shuffled payload is |strata| rows regardless of corpus size.
    All values round to 4 decimals for engine-portable comparison."""
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    from pyspark import StorageLevel

    # persist: the counts relation (|strata| rows) feeds both the totals
    # aggregate and the weight projection — without it each cross-join
    # branch re-executes the corpus-wide count (plan audit showed 4
    # executions of the raw-table scan)
    counts = (
        df.groupBy(F.col(strata_col).alias("stratum"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # algebraic collapse: z = sum_s (n_s/total)^alpha = sum_s n_s^alpha
    # / total^alpha — so ONE totals aggregate (total, sum n^alpha)
    # suffices; no second normalization pass over the strata
    totals = counts.agg(
        F.sum("n_rows").alias("__total"),
        F.sum(F.pow(F.col("n_rows").cast("double"), F.lit(alpha))).alias("__sa"),
    )
    share = F.col("n_rows") / F.col("__total")
    weight = F.pow(F.col("n_rows").cast("double"), F.lit(alpha)) / F.col("__sa")
    return counts.crossJoin(F.broadcast(totals)).select(
        "stratum",
        "n_rows",
        F.round(share, 4).alias("share"),
        F.round(weight, 4).alias("weight"),
        F.round(weight / share, 4).alias("boost"),
    )
