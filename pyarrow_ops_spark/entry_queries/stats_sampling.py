"""Sampling, ordering/curriculum, statistics, histograms, skew.

Split from the former monolithic entry_queries.py (round 8); the
registry contract and driver-cap ordering live in the package
__init__.
"""
from __future__ import annotations

import pandas as pd  # module-level so stringified UDF type hints resolve

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from pyarrow_ops_spark.operators.filters import filters
from pyarrow_ops_spark.operators.dedup import drop_duplicates
from pyarrow_ops_spark.operators.group import groupby
from pyarrow_ops_spark.operators.join import join
from pyarrow_ops_spark.functions.jsons import str_to_table
from pyarrow_ops_spark.sources.tables import load_table

from pyarrow_ops_spark.entry_queries._registry import folded_query, query




@query(
    "skew_salted_join",
    """
    SELECT e.user_id, s.first_signup,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(e.value), 4) AS sum_value
    FROM events e
    JOIN (SELECT user_id, min(ts) AS first_signup FROM events
          WHERE event_type = 'signup' GROUP BY user_id) s
      ON e.user_id = s.user_id
    GROUP BY e.user_id, s.first_signup
    """,
)
def q_skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted equi-join certification: the fact side's rows are spread
    across 8 salt slices by a CONTENT hash (deterministic under task
    retry), the dim side is exploded 8×, and the join runs on
    (user_id, salt) — a hot user's rows land on 8 reducers instead of
    one. Row-identity with the plain join is the invariant (also
    asserted against literal equality in tests/test_skew.py); the oracle
    is the unsalted SQL join. Completes the skew-helper family's driver
    coverage (salted_agg and salted first-N already certified). At real
    skew, prefer AQE's skew-join split for sort-merge plans and this
    rewrite when the skew is concentrated in few known-hot keys."""
    from pyarrow_ops_spark.operators.skew import salted_join

    ev = load_table(spark, "events", sf_dir)
    signups = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_signup"))
    )
    joined = salted_join(
        ev.select("user_id", "value"), signups, on=["user_id"], n_salts=8
    )
    return joined.groupBy("user_id", "first_signup").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )



@query(
    "skew_salted_agg",
    """
    WITH s AS (
        SELECT CASE WHEN l_orderkey % 10 != 0 THEN 0 ELSE l_orderkey END AS k,
               l_quantity, l_extendedprice
        FROM lineitem
    )
    SELECT k, sum(l_quantity) AS total, CAST(count(*) AS BIGINT) AS n,
           max(l_extendedprice) AS hi
    FROM s GROUP BY k
    """,
)
def q_skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-stage aggregation on a 90%-hot key — identical results
    to a plain GROUP BY (the oracle), but the hot key's partial
    aggregation spreads over n_salts reducers instead of one."""
    from pyarrow_ops_spark.operators.skew import salted_agg

    li = load_table(spark, "lineitem", sf_dir).select(
        F.when(F.col("l_orderkey") % 10 != 0, F.lit(0))
        .otherwise(F.col("l_orderkey"))
        .alias("k"),
        "l_quantity",
        "l_extendedprice",
    )
    return salted_agg(
        li,
        ["k"],
        {"total": "sum(l_quantity)", "n": "count()", "hi": "max(l_extendedprice)"},
        n_salts=8,
    )



@query(
    "stats_corr_covar",
    """
    SELECT l_returnflag,
           ROUND(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
           ROUND(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qty_price,
           ROUND(var_samp(l_discount), 6) AS var_disc,
           ROUND(stddev_samp(l_tax), 6) AS std_tax
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_stats_corr_covar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate statistical aggregates (Pearson corr, sample covariance)
    plus sample variance/stddev — all single-pass partial-aggregable
    moments, so map-side combine applies like any sum."""
    li = load_table(spark, "lineitem", sf_dir)
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias(
            "covar_qty_price"
        ),
        F.round(F.var_samp("l_discount"), 6).alias("var_disc"),
        F.round(F.stddev_samp("l_tax"), 6).alias("std_tax"),
    )



# ---------------------------------------------------------------------------
# Deterministic sampling (operators/sample.py) — engine-reproducible samples
# ---------------------------------------------------------------------------


@query(
    "sample_hash_orders",
    """
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders
    WHERE substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 4) < '1999'
    """,
)
def q_sample_hash_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10% deterministic sample: keep iff md5(key)[:4] < floor(0.1*2^16)
    in hex. Unlike df.sample's partition-RNG draw, the SAME rows survive on
    any engine/partitioning — the oracle literally runs the same predicate.
    Map-only, no shuffle; composes with scan pushdown of other filters."""
    from pyarrow_ops_spark.operators.sample import sample_hash

    orders = load_table(spark, "orders", sf_dir)
    return sample_hash(orders, 0.1, ["o_orderkey"]).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )



@query(
    "sample_stratified_events",
    """
    SELECT event_id, event_type, value
    FROM events
    WHERE substring(md5(CAST(event_id AS VARCHAR)), 1, 4) <
          CASE event_type
              WHEN 'click' THEN '8000'
              WHEN 'error' THEN '0ccc'
              WHEN 'view' THEN '4000'
              ELSE '0000'
          END
    """,
)
def q_sample_stratified_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum deterministic sampling (hash analog of sampleBy):
    50% of clicks, 5% of errors, 25% of views, 0% otherwise — one map-only
    CASE predicate, single scan, no shuffle, for any number of strata."""
    from pyarrow_ops_spark.operators.sample import sample_stratified

    ev = load_table(spark, "events", sf_dir)
    return sample_stratified(
        ev,
        "event_type",
        {"click": 0.5, "error": 0.05, "view": 0.25},
        ["event_id"],
    ).select("event_id", "event_type", "value")



# ---------------------------------------------------------------------------
# Distribution analytics: fixed-width histogram, windowed quantile buckets
# ---------------------------------------------------------------------------


@folded_query(
    "histogram_totalprice",
    """
    SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           round(min(o_totalprice), 2) AS lo,
           round(max(o_totalprice), 2) AS hi
    FROM orders GROUP BY 1
    """,
)
def q_histogram_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram as a groupBy over floor(x/width) — fully
    map-side-combined, so the shuffle carries one row per bucket per task
    no matter the input size. (floor of an IEEE division is deterministic;
    bucket ids match across engines exactly.)"""
    orders = load_table(spark, "orders", sf_dir)
    return (
        orders.groupBy(
            F.floor(F.col("o_totalprice") / 50000).cast("bigint").alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
    )



@query(
    "histogram_equidepth_totalprice",
    """
    WITH c AS (
        SELECT quantile_cont(o_totalprice,
                             [0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875])
                   AS cuts
        FROM orders
    ),
    assigned AS (
        SELECT o_totalprice AS v,
               CASE WHEN o_totalprice <= cuts[1] THEN 0
                    WHEN o_totalprice <= cuts[2] THEN 1
                    WHEN o_totalprice <= cuts[3] THEN 2
                    WHEN o_totalprice <= cuts[4] THEN 3
                    WHEN o_totalprice <= cuts[5] THEN 4
                    WHEN o_totalprice <= cuts[6] THEN 5
                    WHEN o_totalprice <= cuts[7] THEN 6
                    ELSE 7 END AS bucket
        FROM orders CROSS JOIN c
    )
    SELECT CAST(bucket AS INT) AS bucket,
           round(min(v), 4) AS lo, round(max(v), 4) AS hi,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM assigned GROUP BY bucket
    """,
)
def q_histogram_equidepth_totalprice(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Equi-depth 8-bucket histogram of order value — exact interpolated
    percentile cuts broadcast back, map-only CASE assignment, a <=8-group
    final aggregate; the corpus never shuffles. Engine-deterministic even
    at cut boundaries: an interpolated cut lies strictly between adjacent
    data values (so last-ulp differences can't move a row), and a cut
    that lands ON a data value is that exact value in both engines; the
    1/8 fractions are exact binary, keeping the rank arithmetic
    identical. Complements the fixed-width histogram_totalprice row."""
    from pyarrow_ops_spark.functions.stats import histogram_equidepth

    orders = load_table(spark, "orders", sf_dir)
    return histogram_equidepth(orders, "o_totalprice", n_buckets=8)



# ---------------------------------------------------------------------------
# Training-data ordering (functions/ordering.py): contiguous ids,
# deterministic epoch shuffle, token-budget sequence packing
# ---------------------------------------------------------------------------


@query(
    "order_assign_row_ids",
    """
    SELECT doc_id,
           CAST(row_number() OVER (ORDER BY doc_id) - 1 AS BIGINT) AS row_id
    FROM documents
    """,
)
def q_order_assign_row_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous global row ids without a single-partition sort: range
    repartition + per-partition counts -> offsets + map-only stamping.
    The oracle is the naive row_number() the distributed plan replaces."""
    from pyarrow_ops_spark.functions.ordering import assign_row_ids

    docs = load_table(spark, "documents", sf_dir).select("doc_id")
    return assign_row_ids(docs, ["doc_id"])



@query(
    "order_deterministic_shuffle",
    """
    SELECT doc_id,
           CAST(row_number() OVER (
               ORDER BY md5('epoch1' || '|' || CAST(doc_id AS VARCHAR)), doc_id
           ) - 1 AS BIGINT) AS row_id
    FROM documents
    """,
)
def q_order_deterministic_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible epoch shuffle: permutation = content hash order, ids
    contiguous — same order on any engine/cluster size; the seed rotates
    epochs. (The md5 keys are unique in practice; doc_id tiebreak in the
    oracle only guards the theoretical collision.)"""
    from pyarrow_ops_spark.functions.ordering import deterministic_shuffle

    docs = load_table(spark, "documents", sf_dir).select("doc_id")
    return deterministic_shuffle(docs, ["doc_id"], seed="epoch1")



@query(
    "order_pack_token_batches",
    """
    WITH s AS (
        SELECT doc_id, n_chars,
               md5(CAST(doc_id AS VARCHAR)) AS pk,
               substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS shard
        FROM documents
    )
    SELECT doc_id, shard,
           CAST(floor((sum(n_chars) OVER (
                    PARTITION BY shard ORDER BY pk
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                ) - n_chars) / 2000.0) AS BIGINT) AS batch_id
    FROM s
    """,
)
def q_order_pack_token_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget sequence packing, shard-local: documents hash into 16
    shards (hex-prefix, engine-reproducible) and the running-sum batch
    split windows WITHIN each shard — parallel across shards instead of
    serializing the corpus through one global cumulative sum."""
    from pyarrow_ops_spark.functions.ordering import pack_token_batches

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "n_chars")
    packed = pack_token_batches(
        docs, "n_chars", budget=2000, key_cols=["doc_id"], n_shards=16
    )
    return packed.select("doc_id", "shard", "batch_id")



@query(
    "sample_per_key_events",
    """
    WITH r AS (
        SELECT event_id, user_id, event_type,
               row_number() OVER (
                   PARTITION BY user_id
                   ORDER BY md5(CAST(event_id AS VARCHAR)), event_id
               ) AS rk
        FROM events
    )
    SELECT event_id, user_id, event_type FROM r WHERE rk <= 3
    """,
)
def q_sample_per_key_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-per-key sampling (the reproducible reservoir): keep
    exactly min(3, group size) events per user, ranked by content hash so
    any engine draws the same rows. WindowGroupLimit pushes the rank<=k
    cut map-side before the exchange."""
    from pyarrow_ops_spark.operators.sample import sample_per_key

    ev = load_table(spark, "events", sf_dir)
    return sample_per_key(ev, ["user_id"], 3, ["event_id"]).select(
        "event_id", "user_id", "event_type"
    )



@query(
    "sample_token_budget",
    r"""
    WITH t AS (
        SELECT doc_id, source,
               len(string_split_regex(trim(text), '\s+')) AS n_tokens
        FROM documents
    ),
    c AS (
        SELECT doc_id, source, n_tokens,
               sum(n_tokens) OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                   ROWS UNBOUNDED PRECEDING
               ) AS cum
        FROM t
    )
    SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(cum AS BIGINT) AS cum_tokens
    FROM c WHERE cum <= 1000
    """,
)
def q_sample_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budgeted mixture: consume documents per source in
    deterministic hash order until 1000 tokens fill — training mixtures
    are specified in tokens, not rows (`mix_sources`' budgeted twin).
    Never overshoots; one exchange on the stratum column."""
    from pyarrow_ops_spark.functions.text import token_count
    from pyarrow_ops_spark.operators.sample import token_budget_sample

    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id", "source", token_count("text").cast("long").alias("n_tokens")
    )
    return token_budget_sample(
        docs, "source", 1000, "n_tokens", ["doc_id"], cum_col="cum_tokens"
    )



@query(
    "sample_weighted_events",
    """
    SELECT event_id, event_type, value FROM (
        SELECT event_id, event_type, value,
               ln((CAST(concat('0x', substring(md5(CAST(event_id AS VARCHAR)), 1, 13))
                        AS UBIGINT) + 0.5) / 4503599627370496.0) / value AS pri
        FROM events WHERE value > 0
    ) ORDER BY pri DESC, event_id LIMIT 200
    """,
)
def q_sample_weighted_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Efraimidis-Spirakis weighted sampling without replacement, top-200
    by value-weighted priority. The uniform comes from 52 md5 bits of the
    key (not RNG state), so the identical rows fall out in any engine —
    the oracle replays ln(u)/w verbatim. Map-only + TakeOrdered; no
    shuffle of the data."""
    from pyarrow_ops_spark.operators.sample import weighted_sample

    events = load_table(spark, "events", sf_dir)
    return weighted_sample(events, 200, "value", ["event_id"]).select(
        "event_id", "event_type", "value"
    )



@query(
    "stats_outlier_docs",
    """
    WITH s AS (
        SELECT source, avg(n_chars) AS m, stddev_pop(n_chars) AS sd
        FROM documents GROUP BY source
    )
    SELECT d.doc_id, d.source, d.n_chars,
           round((d.n_chars - s.m) / s.sd, 4) AS z
    FROM documents d JOIN s USING (source)
    WHERE s.sd > 0 AND abs((d.n_chars - s.m) / s.sd) > 2
    """,
)
def q_stats_outlier_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source length outliers (|z| > 2): group moments from ONE
    map-side-combined aggregate broadcast back — the raw table is never
    shuffled (vs Window.partitionBy, which would exchange every row to
    attach two numbers per group)."""
    from pyarrow_ops_spark.functions.stats import zscore

    docs = load_table(spark, "documents", sf_dir)
    z = zscore(docs, "n_chars", ["source"], out="z")
    return (
        z.filter(F.abs(F.col("z")) > 2)
        .select("doc_id", "source", "n_chars", F.round("z", 4).alias("z"))
    )



@query(
    "stats_quantile_rank_orders",
    """
    SELECT o_orderkey, o_orderpriority,
           round(percent_rank() OVER (
               PARTITION BY o_orderpriority ORDER BY o_totalprice
           ), 6) AS qrank
    FROM orders
    """,
)
def q_stats_quantile_rank_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank of order value within its priority class — an order
    statistic, so this one IS a per-group sort (documented as the
    exception to the moments-broadcast pattern)."""
    from pyarrow_ops_spark.functions.stats import quantile_rank

    orders = load_table(spark, "orders", sf_dir)
    return quantile_rank(orders, "o_totalprice", ["o_orderpriority"], out="qrank").select(
        "o_orderkey", "o_orderpriority", F.round("qrank", 6).alias("qrank")
    )



@query(
    "order_curriculum",
    r"""
    WITH m AS (
        SELECT doc_id,
               len(string_split_regex(trim(text), '\s+')) AS n_tokens,
               length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))::DOUBLE
                   / length(text) AS lr,
               length(regexp_replace(text, '\s+', '', 'g'))::DOUBLE
                   / len(string_split_regex(trim(text), '\s+')) AS wl
        FROM documents
    ),
    q AS (
        SELECT doc_id,
               round(0.4 * least(n_tokens / 64.0, 1.0)
                     + 0.3 * lr
                     + 0.3 * greatest(0.0, 1.0 - abs(wl - 5.0) / 5.0), 4)
                   AS quality
        FROM m
    ),
    b AS (
        SELECT doc_id, quality,
               greatest(least(CAST(floor(quality * 4) AS INT), 3), 0)
                   AS curriculum_bucket
        FROM q
    )
    SELECT doc_id, curriculum_bucket,
           CAST(row_number() OVER (
               ORDER BY 3 - curriculum_bucket, md5(doc_id::VARCHAR), doc_id
           ) - 1 AS BIGINT) AS train_order
    FROM b
    """,
)
def q_order_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum training order over the quality score: fixed-width
    score bands (cleanest first), content-hash shuffle within each band,
    contiguous train ids via the distributed range-shuffle id assigner —
    equivalent to one global ROW_NUMBER (the oracle) with no
    single-partition sort."""
    from pyarrow_ops_spark.functions.ordering import curriculum_order
    from pyarrow_ops_spark.functions.text import quality_score

    docs = load_table(spark, "documents", sf_dir)
    scored = docs.select("doc_id", quality_score("text").alias("q"))
    out = curriculum_order(scored, "q", ["doc_id"], n_buckets=4)
    return out.select("doc_id", "curriculum_bucket", "train_order")



@query(
    "skew_key_report",
    """
    WITH c AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows
        FROM events GROUP BY event_type
    ),
    t AS (
        SELECT CAST(sum(n_rows) AS DOUBLE) AS total,
               CAST(count(*) AS DOUBLE) AS nkeys
        FROM c
    )
    SELECT CAST(row_number() OVER (ORDER BY n_rows DESC, event_type) AS INT)
               AS rank,
           event_type, n_rows,
           round(n_rows / total, 4) AS share,
           round(n_rows / (total / nkeys), 4) AS skew
    FROM c CROSS JOIN t
    ORDER BY n_rows DESC, event_type LIMIT 5
    """,
)
def q_skew_key_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key diagnostic (run before reaching for salting): top-5
    heaviest keys with share and skew factor — map-side-combined counts,
    broadcast single-row totals, TakeOrderedAndProject top-k."""
    from pyarrow_ops_spark.operators.skew import key_skew_report

    ev = load_table(spark, "events", sf_dir)
    return key_skew_report(ev, ["event_type"], k=5)



@query(
    "skew_first_n_salted",
    """
    SELECT user_id, event_id, event_type, CAST(rn AS INT) AS rn FROM (
        SELECT user_id, event_id, event_type,
               row_number() OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events
    ) WHERE rn <= 3
    """,
)
def q_skew_first_n_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each user's first 3 events through the TWO-STAGE salted rewrite
    (`salted_first_n_per_key`): stage 1 windows over (user, content-hash
    salt — retry-deterministic, unlike partition-id or rand salting) so a
    bot key's rows spread across slices, stage 2 re-ranks the bounded
    survivors. The oracle is
    the plain single-window SQL — the rewrite is row-identical by
    construction (the global first-n of a key is always within the union
    of its per-slice first-n), so the hash certifies the equivalence the
    skew docs promise."""
    from pyarrow_ops_spark.operators.skew import salted_first_n_per_key

    ev = load_table(spark, "events", sf_dir).select(
        "user_id", "event_id", "event_type", "ts"
    )
    out = salted_first_n_per_key(
        ev, ["user_id"], ["ts", "event_id"], 3, rank_col="rn"
    )
    return out.select("user_id", "event_id", "event_type", "rn")



@query(
    "stats_percentiles_exact",
    """
    SELECT o_orderpriority,
           round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
           round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
           round(quantile_cont(o_totalprice, 0.75), 4) AS p75,
           CAST(count(*) AS BIGINT) AS n
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_stats_percentiles_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT interpolated quartiles per group (Spark ``percentile``, not
    approx_percentile) — both engines use the same linear interpolation,
    so the values hash-match. The per-group sort this implies is the
    documented cost of exact order statistics; approx_percentile (r2's
    rows-only sketch query) is the 100 TB default, with this as the
    ground-truth twin."""
    orders = load_table(spark, "orders", sf_dir)
    return orders.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.25)"), 4).alias("p25"),
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.75)"), 4).alias("p75"),
        F.count(F.lit(1)).alias("n"),
    )



@query(
    "stats_profile_documents",
    """
    SELECT * FROM (
        SELECT 'doc_id' AS "column", CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_nulls,
               CAST(count(DISTINCT doc_id) AS BIGINT) AS n_distinct,
               CAST(min(doc_id) AS VARCHAR) AS min_value,
               CAST(max(doc_id) AS VARCHAR) AS max_value
        FROM documents
        UNION ALL
        SELECT 'lang', CAST(count(*) AS BIGINT),
               CAST(sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               CAST(count(DISTINCT lang) AS BIGINT),
               CAST(min(lang) AS VARCHAR), CAST(max(lang) AS VARCHAR)
        FROM documents
        UNION ALL
        SELECT 'source', CAST(count(*) AS BIGINT),
               CAST(sum(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               CAST(count(DISTINCT source) AS BIGINT),
               CAST(min(source) AS VARCHAR), CAST(max(source) AS VARCHAR)
        FROM documents
        UNION ALL
        SELECT 'n_chars', CAST(count(*) AS BIGINT),
               CAST(sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               CAST(count(DISTINCT n_chars) AS BIGINT),
               CAST(min(n_chars) AS VARCHAR), CAST(max(n_chars) AS VARCHAR)
        FROM documents
    ) ORDER BY "column"
    """,
)
def q_stats_profile_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style table profile (one row per column: n_rows, nulls,
    distincts, min/max as strings) over the ingest-safe columns of
    documents — ONE corpus pass, map-side-combined partials, the table
    itself never shuffles. Certification uses exact_distinct=True so the
    DuckDB oracle matches exactly; production default is HLL distincts
    (no Expand). Text/float columns are excluded from the certified set
    only because engines format float/long-string extremes differently —
    the operator itself profiles any column."""
    from pyarrow_ops_spark.functions.stats import profile_table

    docs = load_table(spark, "documents", sf_dir)
    return profile_table(
        docs, ["doc_id", "lang", "source", "n_chars"], exact_distinct=True
    ).orderBy("column")



@query(
    "stats_winsorize_docs",
    """
    WITH s AS (
        SELECT source, quantile_cont(n_chars, 0.05) AS lo,
               quantile_cont(n_chars, 0.95) AS hi
        FROM documents GROUP BY source
    )
    SELECT d.doc_id, d.source, d.n_chars,
           round(least(greatest(CAST(d.n_chars AS DOUBLE), s.lo), s.hi), 4)
               AS n_chars_w
    FROM documents d JOIN s USING (source)
    """,
)
def q_stats_winsorize_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source winsorization of document length at [p05, p95] — exact
    interpolated quantiles (Spark ``percentile`` == DuckDB
    ``quantile_cont``, the stats_percentiles_exact parity), computed in
    ONE aggregate whose |groups| rows broadcast back; the corpus never
    shuffles."""
    from pyarrow_ops_spark.functions.stats import winsorize

    docs = load_table(spark, "documents", sf_dir)
    w = winsorize(
        docs, "n_chars", ["source"], lower=0.05, upper=0.95, out="n_chars_w"
    )
    return w.select(
        "doc_id",
        "source",
        "n_chars",
        F.round("n_chars_w", 4).alias("n_chars_w"),
    )



@query(
    "stats_robust_z_docs",
    """
    WITH m AS (
        SELECT source, quantile_cont(n_chars, 0.5) AS med
        FROM documents GROUP BY source
    ),
    d AS (
        SELECT doc_id, source, n_chars, med
        FROM documents JOIN m USING (source)
    ),
    md AS (
        SELECT source, quantile_cont(abs(n_chars - med), 0.5) AS mad
        FROM d GROUP BY source
    )
    SELECT d.doc_id, d.source, d.n_chars,
           CASE WHEN md.mad > 0
                THEN round((d.n_chars - d.med) / (1.4826 * md.mad), 4)
           END AS rz
    FROM d JOIN md USING (source)
    """,
)
def q_stats_robust_z_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD robust z-score of document length per source — the
    outlier signal extreme values can't corrupt (one huge document drags
    the mean/stddev baseline; it cannot move the median). Two exact-
    percentile aggregates broadcast back; the corpus never shuffles. The
    oracle replays the identical (x-med)/(1.4826*mad) expression on
    DuckDB's quantile_cont (== Spark percentile interpolation)."""
    from pyarrow_ops_spark.functions.stats import robust_zscore

    docs = load_table(spark, "documents", sf_dir)
    out = robust_zscore(docs, "n_chars", ["source"], out="rz")
    return out.select(
        "doc_id", "source", "n_chars", F.round("rz", 4).alias("rz")
    )


@query(
    "stats_ks_drift",
    """
    WITH u AS (
        SELECT CAST(o_totalprice AS DOUBLE) AS v, 0 AS s FROM orders
        WHERE o_orderstatus = 'F' AND o_totalprice IS NOT NULL
        UNION ALL
        SELECT CAST(o_totalprice AS DOUBLE) AS v, 1 AS s FROM orders
        WHERE o_orderstatus = 'O' AND o_totalprice IS NOT NULL
    ),
    st AS (SELECT min(v) AS mn, max(v) AS mx FROM u),
    b AS (SELECT CASE WHEN mx = mn THEN 0
                      ELSE greatest(0, least(255,
                               CAST(floor((v - mn) * 256 / (mx - mn))
                                    AS BIGINT)))
                 END AS bin, s
          FROM u CROSS JOIN st),
    c AS (SELECT bin,
                 sum(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS ca,
                 sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS cb
          FROM b GROUP BY bin),
    g AS (SELECT bin,
                 sum(ca) OVER (ORDER BY bin) AS cuma,
                 sum(cb) OVER (ORDER BY bin) AS cumb,
                 sum(ca) OVER () AS na,
                 sum(cb) OVER () AS nb
          FROM c)
    SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
           CAST(bin AS INT) AS ks_bin,
           round(abs(CAST(cuma AS DOUBLE) / na - CAST(cumb AS DOUBLE) / nb),
                 6) AS ks_d
    FROM g
    WHERE na > 0 AND nb > 0
    ORDER BY ks_d DESC, ks_bin LIMIT 1
    """,
)
def q_stats_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample KS drift statistic between fulfilled ('F') and open
    ('O') orders' totalprice distributions, on 256 equal-width bins —
    the distribution monitor a training-data ingestion pipeline runs on
    every new snapshot. Both engines evaluate the identical
    left-associated double binning expression, so bin assignment is
    bit-congruent; the gap is ranked rounded-6 with a bin tiebreak. The
    CDF window orders at most 256 rows (bounded by construction, never
    by the data); slice sizes come from full-frame sums over the same
    bounded relation, so each slice is scanned exactly twice (min/max
    pass + binning pass — the floor for data-derived bounds; fixed
    lo/hi drops it to one)."""
    from pyarrow_ops_spark.functions.stats import ks_drift

    orders = load_table(spark, "orders", sf_dir)
    return ks_drift(
        orders.filter(F.col("o_orderstatus") == "F"),
        orders.filter(F.col("o_orderstatus") == "O"),
        "o_totalprice",
        bins=256,
    )


@query(
    "stats_psi_drift",
    """
    WITH c AS (
        SELECT quantile_cont(o_totalprice,
                             [0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875])
                   AS cuts
        FROM orders WHERE o_orderstatus = 'F' AND o_totalprice IS NOT NULL
    ),
    u AS (
        SELECT CAST(o_totalprice AS DOUBLE) AS v, 0 AS s FROM orders
        WHERE o_orderstatus = 'F' AND o_totalprice IS NOT NULL
        UNION ALL
        SELECT CAST(o_totalprice AS DOUBLE) AS v, 1 AS s FROM orders
        WHERE o_orderstatus = 'O' AND o_totalprice IS NOT NULL
    ),
    assigned AS (
        SELECT CASE WHEN v <= cuts[1] THEN 0
                    WHEN v <= cuts[2] THEN 1
                    WHEN v <= cuts[3] THEN 2
                    WHEN v <= cuts[4] THEN 3
                    WHEN v <= cuts[5] THEN 4
                    WHEN v <= cuts[6] THEN 5
                    WHEN v <= cuts[7] THEN 6
                    ELSE 7 END AS bin, s
        FROM u CROSS JOIN c
    ),
    cnt AS (
        SELECT bin,
               sum(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS ca,
               sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS cb
        FROM assigned GROUP BY bin
    ),
    tot AS (
        SELECT bin, ca, cb,
               sum(ca) OVER () AS na, sum(cb) OVER () AS nb
        FROM cnt
    )
    SELECT CAST(bin AS INT) AS bin,
           CAST(ca AS BIGINT) AS c_a, CAST(cb AS BIGINT) AS c_b,
           round( (greatest(CAST(ca AS DOUBLE), 0.5) / na
                   - greatest(CAST(cb AS DOUBLE), 0.5) / nb)
                  * ln( (greatest(CAST(ca AS DOUBLE), 0.5) / na)
                        / (greatest(CAST(cb AS DOUBLE), 0.5) / nb) ), 6)
               AS psi_bin
    FROM tot WHERE na > 0 AND nb > 0 ORDER BY bin
    """,
)
def q_stats_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between fulfilled ('F', the reference)
    and open ('O') orders' totalprice distributions on 8 equi-depth
    reference bins — the standard ML-monitoring drift score (> 0.25 =
    major shift). Engine congruence leans on three pinned facts: i/8
    percentile fractions are exact binary doubles, so DuckDB's
    quantile_cont and Spark's percentile interpolate identical cuts (the
    certified equi-depth-histogram argument); bin assignment is the same
    <=-CASE chain in both engines; and the psi expression is ONE shared
    double formula with the greatest(c, 0.5)/n continuity clamp, rounded
    to 6 before comparison. Plan: one percentile aggregate over the
    reference broadcast back as a single row, map-only assignment on one
    union scan, one <=8-group aggregate, then an 8-row full-frame window
    for slice totals — no corpus shuffle, no collect (see
    functions/stats.py:psi_drift for the 100 TB notes)."""
    from pyarrow_ops_spark.functions.stats import psi_drift

    orders = load_table(spark, "orders", sf_dir)
    return psi_drift(
        orders.filter(F.col("o_orderstatus") == "F"),
        orders.filter(F.col("o_orderstatus") == "O"),
        "o_totalprice",
        bins=8,
    )


@query(
    "stats_ks_drift_by_source",
    """
    WITH u AS (
        SELECT source, CAST(n_chars AS DOUBLE) AS v, 0 AS s FROM documents
        WHERE lang = 'en' AND n_chars IS NOT NULL
        UNION ALL
        SELECT source, CAST(n_chars AS DOUBLE) AS v, 1 AS s FROM documents
        WHERE lang != 'en' AND n_chars IS NOT NULL
    ),
    st AS (SELECT source, min(v) AS mn, max(v) AS mx FROM u GROUP BY source),
    b AS (SELECT u.source,
                 CASE WHEN mx = mn THEN 0
                      ELSE greatest(0, least(63,
                               CAST(floor((v - mn) * 64 / (mx - mn))
                                    AS BIGINT)))
                 END AS bin, s
          FROM u JOIN st ON u.source IS NOT DISTINCT FROM st.source),
    c AS (SELECT source, bin,
                 sum(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS ca,
                 sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS cb
          FROM b GROUP BY source, bin),
    g AS (SELECT source, bin,
                 sum(ca) OVER (PARTITION BY source ORDER BY bin) AS cuma,
                 sum(cb) OVER (PARTITION BY source ORDER BY bin) AS cumb,
                 sum(ca) OVER (PARTITION BY source) AS na,
                 sum(cb) OVER (PARTITION BY source) AS nb
          FROM c),
    d AS (SELECT source,
                 CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
                 CAST(bin AS INT) AS ks_bin,
                 round(abs(CAST(cuma AS DOUBLE) / na
                           - CAST(cumb AS DOUBLE) / nb), 6) AS ks_d,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY round(abs(CAST(cuma AS DOUBLE) / na
                                              - CAST(cumb AS DOUBLE) / nb), 6)
                                             DESC, bin) AS rn
          FROM g WHERE na > 0 AND nb > 0)
    SELECT source, n_a, n_b, ks_bin, ks_d FROM d WHERE rn = 1
    """,
)
def q_stats_ks_drift_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER-GROUP two-sample KS drift: for every document source, how far
    has the length distribution of non-English docs drifted from the
    English reference? One row per source — the per-slice variant a
    crawl-ingestion monitor runs so a single drifted source can't hide
    inside the global statistic. Per-group min/max bounds come from ONE
    |sources|-row aggregate broadcast back null-safe; every window
    (CDF running sum, slice totals, gap argmax) partitions on source so
    frames stay <= 64 rows; sources present in only one slice are
    dropped (no two-sample statistic exists). Both engines evaluate the
    identical left-associated double binning expression — bit-congruent
    assignment — and rank the gap rounded-6 with a bin tiebreak."""
    from pyarrow_ops_spark.functions.stats import ks_drift

    docs = load_table(spark, "documents", sf_dir)
    return ks_drift(
        docs.filter(F.col("lang") == "en"),
        docs.filter(F.col("lang") != "en"),
        "n_chars",
        bins=64,
        by=["source"],
    )


@query(
    "stats_chi2_drift",
    """
    WITH u AS (
        SELECT CAST(lang AS VARCHAR) AS cat, 0 AS s FROM documents
        WHERE doc_id % 2 = 0 AND lang IS NOT NULL
        UNION ALL
        SELECT CAST(lang AS VARCHAR) AS cat, 1 AS s FROM documents
        WHERE doc_id % 2 = 1 AND lang IS NOT NULL
    ),
    c AS (SELECT cat,
                 sum(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS ca,
                 sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS cb
          FROM u GROUP BY cat),
    t AS (SELECT cat, ca, cb,
                 sum(ca) OVER () AS na, sum(cb) OVER () AS nb
          FROM c),
    f AS (SELECT * FROM t WHERE na > 0 AND nb > 0),
    x AS (SELECT na, nb,
                 CAST(floor(
                   ( ((ca - (CAST(na AS DOUBLE) * (ca + cb)) / (na + nb))
                      * (ca - (CAST(na AS DOUBLE) * (ca + cb)) / (na + nb)))
                     / ((CAST(na AS DOUBLE) * (ca + cb)) / (na + nb))
                   + ((cb - (CAST(nb AS DOUBLE) * (ca + cb)) / (na + nb))
                      * (cb - (CAST(nb AS DOUBLE) * (ca + cb)) / (na + nb)))
                     / ((CAST(nb AS DOUBLE) * (ca + cb)) / (na + nb))
                   ) * 1000000000.0) AS BIGINT) AS ci
          FROM f)
    SELECT CAST(max(na) AS BIGINT) AS n_a, CAST(max(nb) AS BIGINT) AS n_b,
           CAST(count(*) AS BIGINT) AS n_categories,
           round(CAST(sum(ci) AS DOUBLE) / 1000000000.0, 6) AS chi2
    FROM x
    HAVING max(na) IS NOT NULL
    """,
)
def q_stats_chi2_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-squared homogeneity drift of the language mix between even-id
    and odd-id document snapshots — the CATEGORICAL drift monitor
    completing the KS (numeric, equal-width) / PSI (numeric, equi-depth)
    family: "did this crawl batch's language/source/label distribution
    move?". Each category's chi2 term is one shared left-associated
    double formula evaluated identically on both engines, then scaled to
    exact BIGINT floor(term * 1e9) and summed order-insensitively (the
    rrf_fuse trick — a plain double sum over categories is engine-order-
    dependent in the last ulp). Plan: one union scan into a
    |categories|-bounded groupBy (map-side combine carries category
    counts, not rows), slice totals as a bounded aggregate broadcast
    back (r13: window-free — safe at any category cardinality; the
    totals agg reuses the counts exchange, so still one scan per slice),
    map-only chi2 expression, one final one-row aggregate — no corpus
    shuffle, no collect (functions/stats.py:chi2_drift)."""
    from pyarrow_ops_spark.functions.stats import chi2_drift

    docs = load_table(spark, "documents", sf_dir)
    return chi2_drift(
        docs.filter(F.col("doc_id") % 2 == 0),
        docs.filter(F.col("doc_id") % 2 == 1),
        "lang",
    )


@query(
    "stats_drift_report",
    """
    WITH u AS (
        SELECT CAST(n_chars AS DOUBLE) AS v, 0 AS s FROM documents
        WHERE doc_id % 2 = 0 AND n_chars IS NOT NULL
        UNION ALL
        SELECT CAST(n_chars AS DOUBLE) AS v, 1 AS s FROM documents
        WHERE doc_id % 2 = 1 AND n_chars IS NOT NULL
    ),
    st AS (SELECT min(v) AS mn, max(v) AS mx FROM u),
    kb AS (SELECT CASE WHEN mx = mn THEN 0
                       ELSE greatest(0, least(63,
                                CAST(floor((v - mn) * 64 / (mx - mn))
                                     AS BIGINT)))
                  END AS bin, s
           FROM u CROSS JOIN st),
    kc AS (SELECT bin,
                  sum(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS ca,
                  sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS cb
           FROM kb GROUP BY bin),
    kg AS (SELECT bin,
                  sum(ca) OVER (ORDER BY bin) AS cuma,
                  sum(cb) OVER (ORDER BY bin) AS cumb,
                  sum(ca) OVER () AS na, sum(cb) OVER () AS nb
           FROM kc),
    ks AS (SELECT 'n_chars' AS "column", 'ks_d' AS metric,
                  CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
                  round(abs(CAST(cuma AS DOUBLE) / na
                            - CAST(cumb AS DOUBLE) / nb), 6) AS value
           FROM kg WHERE na > 0 AND nb > 0
           ORDER BY value DESC, bin LIMIT 1),
    pc AS (SELECT quantile_cont(CAST(n_chars AS DOUBLE),
                   [0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875]) AS cuts
           FROM documents WHERE doc_id % 2 = 0 AND n_chars IS NOT NULL),
    pa AS (SELECT CASE WHEN v <= cuts[1] THEN 0
                       WHEN v <= cuts[2] THEN 1
                       WHEN v <= cuts[3] THEN 2
                       WHEN v <= cuts[4] THEN 3
                       WHEN v <= cuts[5] THEN 4
                       WHEN v <= cuts[6] THEN 5
                       WHEN v <= cuts[7] THEN 6
                       ELSE 7 END AS bin, s
           FROM u CROSS JOIN pc),
    pcnt AS (SELECT bin,
                    sum(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS ca,
                    sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS cb
             FROM pa GROUP BY bin),
    pt AS (SELECT bin, ca, cb,
                  sum(ca) OVER () AS na, sum(cb) OVER () AS nb
           FROM pcnt),
    pterm AS (SELECT ca, cb, na, nb,
                     round( (greatest(CAST(ca AS DOUBLE), 0.5) / na
                             - greatest(CAST(cb AS DOUBLE), 0.5) / nb)
                            * ln( (greatest(CAST(ca AS DOUBLE), 0.5) / na)
                                  / (greatest(CAST(cb AS DOUBLE), 0.5) / nb) ),
                            6) AS psi_bin
              FROM pt WHERE na > 0 AND nb > 0),
    psi AS (SELECT 'n_chars' AS "column", 'psi' AS metric,
                   CAST(sum(ca) AS BIGINT) AS n_a,
                   CAST(sum(cb) AS BIGINT) AS n_b,
                   round(CAST(sum(CAST(floor(psi_bin * 1000000000.0)
                                       AS BIGINT)) AS DOUBLE)
                         / 1000000000.0, 6) AS value
            FROM pterm
            HAVING sum(ca) IS NOT NULL),
    eg AS (SELECT bin, (SELECT (mx - mn) / 64 FROM st) AS w,
                  sum(ca) OVER (ORDER BY bin) AS cuma,
                  sum(cb) OVER (ORDER BY bin) AS cumb,
                  sum(ca) OVER () AS na, sum(cb) OVER () AS nb,
                  coalesce(lead(bin) OVER (ORDER BY bin), bin) AS nxt
           FROM kc),
    ex AS (SELECT na, nb, w * 64 AS rng,
                  CAST(floor(abs(CAST(cuma AS DOUBLE) / na
                                 - CAST(cumb AS DOUBLE) / nb)
                             * (nxt - bin) * w * 1000000000.0) AS BIGINT)
                      AS ti
           FROM eg WHERE na > 0 AND nb > 0),
    emd AS (SELECT 'n_chars' AS "column", 'emd_norm' AS metric,
                   CAST(max(na) AS BIGINT) AS n_a,
                   CAST(max(nb) AS BIGINT) AS n_b,
                   round(CASE WHEN max(rng) > 0
                              THEN (CAST(sum(ti) AS DOUBLE) / 1000000000.0)
                                   / max(rng)
                              ELSE 0.0 END, 6) AS value
            FROM ex
            HAVING max(na) IS NOT NULL),
    cu AS (
        SELECT CAST(lang AS VARCHAR) AS cat, 0 AS s FROM documents
        WHERE doc_id % 2 = 0 AND lang IS NOT NULL
        UNION ALL
        SELECT CAST(lang AS VARCHAR) AS cat, 1 AS s FROM documents
        WHERE doc_id % 2 = 1 AND lang IS NOT NULL
    ),
    cc AS (SELECT cat,
                  sum(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS ca,
                  sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS cb
           FROM cu GROUP BY cat),
    ct AS (SELECT cat, ca, cb,
                  sum(ca) OVER () AS na, sum(cb) OVER () AS nb
           FROM cc),
    cf AS (SELECT * FROM ct WHERE na > 0 AND nb > 0),
    cx AS (SELECT na, nb,
                  CAST(floor(
                    ( ((ca - (CAST(na AS DOUBLE) * (ca + cb)) / (na + nb))
                       * (ca - (CAST(na AS DOUBLE) * (ca + cb)) / (na + nb)))
                      / ((CAST(na AS DOUBLE) * (ca + cb)) / (na + nb))
                    + ((cb - (CAST(nb AS DOUBLE) * (ca + cb)) / (na + nb))
                       * (cb - (CAST(nb AS DOUBLE) * (ca + cb)) / (na + nb)))
                      / ((CAST(nb AS DOUBLE) * (ca + cb)) / (na + nb))
                    ) * 1000000000.0) AS BIGINT) AS ci
           FROM cf),
    chi AS (SELECT 'lang' AS "column", 'chi2' AS metric,
                   CAST(max(na) AS BIGINT) AS n_a,
                   CAST(max(nb) AS BIGINT) AS n_b,
                   round(CAST(sum(ci) AS DOUBLE) / 1000000000.0, 6) AS value
            FROM cx
            HAVING max(na) IS NOT NULL)
    SELECT * FROM ks
    UNION ALL SELECT * FROM psi
    UNION ALL SELECT * FROM emd
    UNION ALL SELECT * FROM chi
    """,
)
def q_stats_drift_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ONE-CALL drift report an ingestion pipeline actually schedules
    per snapshot — every individually-certified monitor in one
    long-format result (column, metric, n_a, n_b, value): KS max-gap +
    PSI total + normalized EMD for each numeric column, chi-squared for
    each categorical column (metric in {'ks_d','psi','emd_norm','chi2'};
    an embeddings arm emits 'centroid_cos'/'norm_ks_d' rows, pytest-
    certified against DuckDB separately since the documents table has no
    vector column). Values are BIT-IDENTICAL to the constituent monitors
    (tests/test_stats.py::test_drift_report_equals_per_column_monitors):
    the numeric columns MELT once into a long (column, value) relation
    (map-only inline, one scan) and each monitor runs in its certified
    by=['column'] group mode, so the report over C numeric columns costs
    a column-count-INDEPENDENT ~6 bounded passes (KS bounds+binning, EMD
    the same, PSI cuts+binning) instead of the pre-r14 ~6C. Every
    intermediate is bounded (|columns x bins| counts, per-column
    windows); PSI's total BIGINT-scales each per-bin term before the sum
    (rrf_fuse trick). The oracle is the UNION of the four certified
    oracle shapes (functions/stats.py:drift_report)."""
    from pyarrow_ops_spark.functions.stats import drift_report

    docs = load_table(spark, "documents", sf_dir)
    return drift_report(
        docs.filter(F.col("doc_id") % 2 == 0),
        docs.filter(F.col("doc_id") % 2 == 1),
        numeric=["n_chars"],
        categorical=["lang"],
        bins=64,
        psi_bins=8,
    )


@query(
    "stats_emd_drift",
    """
    WITH u AS (
        SELECT CAST(o_totalprice AS DOUBLE) AS v, 0 AS s FROM orders
        WHERE o_orderstatus = 'F' AND o_totalprice IS NOT NULL
        UNION ALL
        SELECT CAST(o_totalprice AS DOUBLE) AS v, 1 AS s FROM orders
        WHERE o_orderstatus = 'O' AND o_totalprice IS NOT NULL
    ),
    st AS (SELECT min(v) AS mn, max(v) AS mx FROM u),
    b AS (SELECT CASE WHEN mx = mn THEN 0
                      ELSE greatest(0, least(63,
                               CAST(floor((v - mn) * 64 / (mx - mn))
                                    AS BIGINT)))
                 END AS bin, (mx - mn) / 64 AS w, s
          FROM u CROSS JOIN st),
    c AS (SELECT bin, max(w) AS w,
                 sum(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS ca,
                 sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS cb
          FROM b GROUP BY bin),
    g AS (SELECT bin, w,
                 sum(ca) OVER (ORDER BY bin) AS cuma,
                 sum(cb) OVER (ORDER BY bin) AS cumb,
                 sum(ca) OVER () AS na, sum(cb) OVER () AS nb,
                 coalesce(lead(bin) OVER (ORDER BY bin), bin) AS nxt
          FROM c),
    x AS (SELECT na, nb, w * 64 AS rng,
                 CAST(floor(abs(CAST(cuma AS DOUBLE) / na
                                - CAST(cumb AS DOUBLE) / nb)
                            * (nxt - bin) * w * 1000000000.0) AS BIGINT) AS ti
          FROM g WHERE na > 0 AND nb > 0)
    SELECT CAST(max(na) AS BIGINT) AS n_a, CAST(max(nb) AS BIGINT) AS n_b,
           round(CAST(sum(ti) AS DOUBLE) / 1000000000.0, 6) AS emd,
           round(CASE WHEN max(rng) > 0
                      THEN (CAST(sum(ti) AS DOUBLE) / 1000000000.0) / max(rng)
                      ELSE 0.0 END, 6) AS emd_norm
    FROM x
    HAVING max(na) IS NOT NULL
    """,
)
def q_stats_emd_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Earth mover's (Wasserstein-1) drift between fulfilled ('F') and
    open ('O') orders' totalprice distributions on the same 64
    equal-width bins as the KS row — KS reads how far apart the CDFs
    GET, EMD reads how much mass moved HOW FAR (a small shift of all
    mass and a large shift of a little mass can tie on KS; EMD separates
    them). The CDF gap persists unchanged across bins empty in BOTH
    slices, so each occupied bin contributes |gap| * span * width via a
    lead() over the bounded counts relation; every term is one shared
    left-associated double product, BIGINT-scaled floor(term * 1e9) and
    summed order-insensitively (the rrf_fuse trick), surfaced round-6.
    Plan: identical to ks_drift — one bounds pass + one map-only binning
    pass per slice into a 64-bounded groupBy, then lead/sum windows over
    <= 64 rows. No corpus shuffle, no collect
    (functions/stats.py:emd_drift; congruence pytest
    tests/test_stats.py:test_emd_drift_matches_duckdb_formula)."""
    from pyarrow_ops_spark.functions.stats import emd_drift

    orders = load_table(spark, "orders", sf_dir)
    return emd_drift(
        orders.filter(F.col("o_orderstatus") == "F"),
        orders.filter(F.col("o_orderstatus") == "O"),
        "o_totalprice",
        bins=64,
    )


@query(
    "stats_embedding_drift",
    """
    WITH base AS (
        SELECT vec_id % 2 AS s, embedding AS v FROM embeddings
        WHERE embedding IS NOT NULL
          AND len(list_filter(embedding, x -> x IS NULL)) = 0
    ),
    e AS (
        SELECT s, unnest(v) AS x, unnest(range(0, len(v))) AS pos FROM base
    ),
    m AS (
        SELECT s, pos,
               CAST(sum(CAST(floor(CAST(x AS DOUBLE) * 10000000.0)
                             AS BIGINT)) AS DOUBLE)
                   / count(*) / 10000000.0 AS m
        FROM e GROUP BY s, pos
    ),
    cosv AS (
        SELECT round(
            (CAST(sum(CAST(floor(a.m * b.m * 1000000000.0) AS BIGINT))
                  AS DOUBLE) / 1000000000.0)
            / sqrt((CAST(sum(CAST(floor(a.m * a.m * 1000000000.0) AS BIGINT))
                         AS DOUBLE) / 1000000000.0)
                   * (CAST(sum(CAST(floor(b.m * b.m * 1000000000.0) AS BIGINT))
                           AS DOUBLE) / 1000000000.0)),
            4) AS centroid_cos
        FROM (SELECT pos, m FROM m WHERE s = 0) a
        JOIN (SELECT pos, m FROM m WHERE s = 1) b USING (pos)
    ),
    n AS (
        SELECT s,
               sqrt(CAST(list_sum(list_transform(v,
                        x -> CAST(floor(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
                                        * 1000000000.0) AS BIGINT)))
                    AS DOUBLE) / 1000000000.0) AS nv
        FROM base
    ),
    st AS (SELECT min(nv) AS mn, max(nv) AS mx FROM n),
    b2 AS (SELECT CASE WHEN mx = mn THEN 0
                       ELSE greatest(0, least(63,
                                CAST(floor((nv - mn) * 64 / (mx - mn))
                                     AS BIGINT)))
                  END AS bin, s
           FROM n CROSS JOIN st),
    c2 AS (SELECT bin,
                  sum(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS ca,
                  sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS cb
           FROM b2 GROUP BY bin),
    g AS (SELECT bin,
                 sum(ca) OVER (ORDER BY bin) AS cuma,
                 sum(cb) OVER (ORDER BY bin) AS cumb,
                 sum(ca) OVER () AS na, sum(cb) OVER () AS nb
          FROM c2),
    ks AS (
        SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
               CAST(bin AS INT) AS norm_ks_bin,
               round(abs(CAST(cuma AS DOUBLE) / na
                         - CAST(cumb AS DOUBLE) / nb), 6) AS norm_ks_d
        FROM g WHERE na > 0 AND nb > 0
        ORDER BY norm_ks_d DESC, norm_ks_bin LIMIT 1
    )
    SELECT n_a, n_b, centroid_cos, norm_ks_bin, norm_ks_d
    FROM ks CROSS JOIN cosv
    """,
)
def q_stats_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space drift between even-id and odd-id vector snapshots:
    centroid cosine (direction drift) + KS over per-vector L2 norms
    (magnitude drift) in one row — the monitor an embedding-backed
    pipeline runs when the encoder or corpus mix changes. Hash-stable
    end to end with NO raw-double group sums: per-dim centroid means are
    exact element sums sum(floor(x * 1e7)) carried as DECIMAL(38,0)
    divided once (both engines convert the same exact integer); the
    dot/norm2 reductions over the 64 dim-bounded means BIGINT-scale each
    term floor(term * 1e9); per-vector squared norms are exact BIGINT
    folds sum(floor(x*x * 1e9)) so the norms feeding the KS binning are
    bit-identical across engines (a last-ulp norm difference could flip
    a bin on an exact edge). Plan: posexplode + partial-sum hash
    aggregate collapses the rows x dim fan-out map-side (shuffle ~
    2 x dim partial sums per task, constant in corpus size); the norm is
    a map-only higher-order aggregate riding the ks_drift scans; one-row
    relations broadcast-join at the end. No corpus shuffle, no collect
    (functions/stats.py:embedding_drift). NULL contract (r14): vectors
    containing a NULL ELEMENT are excluded up front on BOTH engines
    (engine forall guard, oracle list_filter) — without it Spark's
    aggregate folds a NULL norm while DuckDB's list_sum skips the
    element, a latent hash divergence."""
    from pyarrow_ops_spark.functions.stats import embedding_drift

    emb = load_table(spark, "embeddings", sf_dir)
    return embedding_drift(
        emb.filter(F.col("vec_id") % 2 == 0),
        emb.filter(F.col("vec_id") % 2 == 1),
        "embedding",
        norm_bins=64,
    )
