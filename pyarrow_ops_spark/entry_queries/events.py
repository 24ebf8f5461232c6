"""Event analytics: windowed aggs, sessionize, funnel/retention,
as-of/interval/range joins, pagerank, z-order.

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

from pyarrow_ops_spark.entry_queries._registry import query




# ---------------------------------------------------------------------------
# North star: streaming-shaped windowed aggregation over events
# ---------------------------------------------------------------------------


@query(
    "events_tumbling_agg",
    """
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 4) AS sum_value
    FROM events GROUP BY 1, 2
    """,
)
def q_events_tumbling_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1h windows per event_type — the same transformation the
    streaming path runs with a watermark (see streaming/windows.py)."""
    from pyarrow_ops_spark.streaming.windows import tumbling_counts

    ev = load_table(spark, "events", sf_dir)
    return tumbling_counts(ev, "1 hour")



@query(
    "events_sessionize",
    """
    WITH gaps AS (
        SELECT user_id, event_id, ts, value,
               CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                         OR lag(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
        SELECT user_id, ts, value,
               CAST(sum(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
        FROM gaps
    )
    SELECT user_id, session_seq,
           CAST(count(*) AS BIGINT) AS n_events,
           min(ts) AS session_start,
           max(ts) AS session_end,
           round(sum(value), 4) AS sum_value
    FROM sessions GROUP BY user_id, session_seq
    """,
)
def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30 min) via lag + running sum — the batch
    twin of streaming session_window."""
    from pyarrow_ops_spark.streaming.windows import sessionize_batch

    ev = load_table(spark, "events", sf_dir)
    return sessionize_batch(ev, gap_minutes=30)



@query(
    "events_sliding_agg",
    """
    WITH shifted AS (
        SELECT time_bucket(INTERVAL '30 minutes', ts) - (k * INTERVAL '30 minutes') AS window_start,
               event_type, value
        FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k) ks
        WHERE ts < time_bucket(INTERVAL '30 minutes', ts) - (k * INTERVAL '30 minutes') + INTERVAL '1 hour'
    )
    SELECT window_start, event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 4) AS sum_value
    FROM shifted GROUP BY 1, 2
    """,
)
def q_events_sliding_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1h/30m windows (each event lands in 2 windows)."""
    from pyarrow_ops_spark.streaming.windows import sliding_counts

    ev = load_table(spark, "events", sf_dir)
    return sliding_counts(ev, "1 hour", "30 minutes")



# ---------------------------------------------------------------------------
# As-of join (absent in reference AND core Spark — composed from
# union + window; DuckDB validates with its native ASOF JOIN)
# ---------------------------------------------------------------------------


@query(
    "asof_join_clicks",
    """
    WITH clicks AS (
        SELECT user_id, ts, max(event_id) AS click_id
        FROM events WHERE event_type = 'click' GROUP BY user_id, ts
    ),
    purchases AS (
        SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id, p.ts, p.value,
           c.click_id AS click_id_asof, c.ts AS ts_asof
    FROM purchases p ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def q_asof_join_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every purchase, the user's most recent click at-or-before it —
    single shuffle + window scan (no quadratic range join); checked against
    DuckDB's native ASOF JOIN."""
    from pyarrow_ops_spark.operators.asof import asof_join

    ev = load_table(spark, "events", sf_dir)
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    return asof_join(
        purchases,
        clicks,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        value_cols=["click_id"],
        direction="backward",
    )



@query(
    "interval_join_attribution",
    """
    SELECT p.event_id, p.user_id, p.ts,
           CAST(count(c.event_id) AS BIGINT) AS clicks_30m
    FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id
     AND c.ts > p.ts - INTERVAL '30 minutes' AND c.ts <= p.ts
    GROUP BY p.event_id, p.user_id, p.ts
    """,
)
def q_interval_join_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution-window interval join: clicks in the 30 min before each
    purchase. The equi-key (user_id) drives a hash join; the time bounds
    are post-conditions — NOT a nested-loop: per-user data co-locates in
    one shuffle and the interval check is a filter."""
    ev = load_table(spark, "events", sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_event_id"),
        F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("c_ts"),
    )
    j = purchases.join(
        clicks,
        (purchases.user_id == clicks.c_user_id)
        & (clicks.c_ts > purchases.ts - F.expr("INTERVAL 30 MINUTES"))
        & (clicks.c_ts <= purchases.ts),
        how="left",
    )
    return j.groupBy("event_id", "user_id", "ts").agg(
        F.count("c_event_id").alias("clicks_30m")
    )



@query(
    "range_join_bucketed_events",
    """
    SELECT p.event_id, CAST(count(c.c_ts) AS BIGINT) AS any_clicks_5m
    FROM (SELECT event_id, ts FROM events WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT ts AS c_ts FROM events WHERE event_type = 'click') c
      ON c.c_ts >= p.ts AND c.c_ts < p.ts + INTERVAL '5 minutes'
    GROUP BY p.event_id
    """,
)
def q_range_join_bucketed_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FACT×FACT pure range join (NO equi-key: clicks by ANY user within 5
    minutes after each purchase) via the grid-bucket rewrite — the big×big
    case range_join's broadcast nested loop cannot scale to. Both sides
    map to 5-minute grid cells over unix_micros (each interval overlaps
    ≤ 2 cells), the join is a plain equi-join on cell id with the exact
    interval predicate as a post-filter — shuffles linear in rows, plan
    asserted nested-loop-free (tests/test_plan_hygiene.py). Left
    semantics (purchases with zero clicks kept) come from aggregating the
    inner pair set and joining back — the documented composition for
    outer variants. bucket_width is OMITTED here to exercise the auto
    path (median interval length — all intervals are exactly 5 min, so
    the derived width equals the r7-certified explicit width and the
    result is width-invariant anyway, property-tested in
    tests/test_range_join_bucketed.py). Ref: SURVEY §2.2 'Joins' gap;
    the reference has inner equi-join only (join.py:15-47)."""
    from pyarrow_ops_spark.operators.join import range_join_bucketed

    ev = load_table(spark, "events", sf_dir)
    five_min_us = 5 * 60 * 1_000_000
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id",
        F.unix_micros(F.col("ts")).alias("lo_us"),
        (F.unix_micros(F.col("ts")) + F.lit(five_min_us)).alias("hi_us"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.unix_micros(F.col("ts")).alias("c_us")
    )
    pairs = range_join_bucketed(clicks, purchases, "c_us", "lo_us", "hi_us")
    counts = pairs.groupBy("event_id").agg(
        F.count(F.lit(1)).alias("__n")
    )
    return purchases.select("event_id").join(counts, "event_id", "left").select(
        "event_id",
        F.coalesce(F.col("__n"), F.lit(0)).cast("long").alias("any_clicks_5m"),
    )



def _zorder_oracle() -> str:
    from pyarrow_ops_spark.sources.zorder import morton_sql, scale_sql

    sa = scale_sql("user_id", "stats.ulo", "stats.uhi", 8)
    sb = scale_sql("event_id", "stats.elo", "stats.ehi", 8)
    z = morton_sql(["sa", "sb"], 8)
    return f"""
    WITH stats AS (
        SELECT min(user_id) AS ulo, max(user_id) AS uhi,
               min(event_id) AS elo, max(event_id) AS ehi
        FROM events
    ),
    scaled AS (
        SELECT event_id AS eid, {sa} AS sa, {sb} AS sb
        FROM events CROSS JOIN stats
    )
    SELECT eid AS event_id, {z} AS zvalue FROM scaled
    """



@query("zorder_events", _zorder_oracle())
def q_zorder_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton (Z-order) clustering key over (user_id, event_id) — the sort
    key behind data-skipping layouts (Delta OPTIMIZE ZORDER): writing
    range-partitioned on this key gives every file tight min/max on BOTH
    columns, so filters on either prune files at scan time. Pure Catalyst
    bit math over globally min/max-scaled longs (stats attach as a
    broadcast single-row join, no collect); the oracle replays the
    identical scale + interleave expressions."""
    from pyarrow_ops_spark.sources.zorder import zorder_key

    events = load_table(spark, "events", sf_dir)
    return zorder_key(events, ["user_id", "event_id"], bits=8).select(
        "event_id", "zvalue"
    )



@query(
    "resample_events_dense",
    """
    WITH obs AS (
        SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS bucket,
               CAST(count(*) AS BIGINT) AS n_events,
               round(sum(value), 2) AS total_value
        FROM events GROUP BY 1, 2
    ),
    bounds AS (
        SELECT event_type, min(bucket) AS lo, max(bucket) AS hi
        FROM obs GROUP BY event_type
    ),
    grid AS (
        SELECT event_type,
               unnest(generate_series(lo, hi, INTERVAL '1 hour')) AS bucket
        FROM bounds
    )
    SELECT g.event_type, g.bucket,
           coalesce(o.n_events, 0) AS n_events,
           coalesce(o.total_value, 0) AS total_value
    FROM grid g
    LEFT JOIN obs o ON g.event_type = o.event_type AND g.bucket = o.bucket
    """,
)
def q_resample_events_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style rollup: hourly per-type aggregates on a DENSE time
    grid (every step between each group's min and max bucket gets a row,
    zero-filled). The grid is generated distributed — per-group
    ``sequence()`` exploded on executors, no driver time loop — and the
    observed aggregates left-join onto it. One map-side-combined bucket
    agg + one grid join."""
    from pyarrow_ops_spark.operators.resample import resample

    ev = load_table(spark, "events", sf_dir)
    return resample(
        ev,
        "ts",
        3600,
        {"n_events": F.count(F.lit(1)), "total_value": F.round(F.sum("value"), 2)},
        group_cols=["event_type"],
        fill="zero",
    )



@query(
    "events_rate_anomaly",
    """
    WITH c AS (
        SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS window_start,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    ),
    s AS (
        SELECT event_type, avg(n) AS m, stddev_pop(n) AS sd
        FROM c GROUP BY event_type
    )
    SELECT c.event_type, c.window_start, c.n,
           round((c.n - s.m) / s.sd, 4) AS z,
           (abs(round((c.n - s.m) / s.sd, 4)) > 2.0) AS is_anomaly
    FROM c JOIN s USING (event_type)
    WHERE s.sd > 0
    """,
)
def q_events_rate_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-rate anomaly detection: hourly counts per event_type,
    z-scored against that type's own rate distribution (zscore's
    one-aggregate + broadcast-join shape), anomaly-flagged on the ROUNDED
    score so engine ulp differences cannot flip membership. The batch
    twin of a streaming rate monitor."""
    from pyarrow_ops_spark.functions.stats import zscore

    ev = load_table(spark, "events", sf_dir)
    counts = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("window_start")
    ).agg(F.count(F.lit(1)).alias("n"))
    z = zscore(counts, "n", by=["event_type"], out="__z")
    return (
        z.filter(F.col("__z").isNotNull())
        .select(
            "event_type",
            "window_start",
            "n",
            F.round("__z", 4).alias("z"),
            (F.abs(F.round("__z", 4)) > 2.0).alias("is_anomaly"),
        )
    )



@query(
    "events_attribution_lasttouch",
    """
    WITH c AS (
        SELECT user_id, ts, max(event_id) AS click_id
        FROM events WHERE event_type = 'click' GROUP BY user_id, ts
    ),
    p AS (
        SELECT user_id, event_id, ts FROM events
        WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id,
           (SELECT c.click_id FROM c
            WHERE c.user_id = p.user_id AND c.ts <= p.ts
              AND c.ts >= p.ts - INTERVAL 1 HOUR
            ORDER BY c.ts DESC LIMIT 1) AS click_id
    FROM p
    """,
)
def q_events_attribution_lasttouch(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Last-touch attribution: each purchase credits the user's most
    recent click within a 1-hour lookback — the as-of join put to its
    canonical marketing use, with the attribution window as a post-join
    predicate (outside the window -> unattributed NULL, the row is
    kept). Clicks are pre-collapsed to one per (user, ts) with a max-id
    tiebreak so equal-timestamp ties are engine-deterministic. Plan:
    one union+window pass (the asof operator — no per-purchase scan),
    map-only window arithmetic after it; the DuckDB oracle is the
    correlated-subquery formulation of the same rule."""
    from pyarrow_ops_spark.operators.asof import asof_join

    ev = load_table(spark, "events", sf_dir)
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    j = asof_join(
        purchases,
        clicks,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        value_cols=["click_id"],
        direction="backward",
    )
    in_window = F.col("ts_asof") >= F.col("ts") - F.expr("INTERVAL 1 HOUR")
    return j.select(
        "event_id",
        "user_id",
        F.when(in_window, F.col("click_id_asof")).alias("click_id"),
    )



@query(
    "events_conversion_firsttouch",
    """
    WITH p AS (
        SELECT user_id, ts, min(event_id) AS purchase_id
        FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
    ),
    c AS (
        SELECT user_id, event_id, ts FROM events
        WHERE event_type = 'click'
    )
    SELECT c.event_id, c.user_id,
           (SELECT p.purchase_id FROM p
            WHERE p.user_id = c.user_id AND p.ts >= c.ts
              AND p.ts <= c.ts + INTERVAL 1 HOUR
            ORDER BY p.ts ASC LIMIT 1) AS purchase_id
    FROM c
    """,
)
def q_events_conversion_firsttouch(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """First-touch conversion: each click credits the user's EARLIEST
    purchase within the next hour — the FORWARD direction of the as-of
    join (events_attribution_lasttouch certifies backward), same
    union+window plan mirrored, window bound as a post-join predicate,
    unconverted clicks kept with NULL. Purchases pre-collapsed per
    (user, ts) with a min-id tiebreak for engine-deterministic ties."""
    from pyarrow_ops_spark.operators.asof import asof_join

    ev = load_table(spark, "events", sf_dir)
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.min("event_id").alias("purchase_id"))
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts"
    )
    j = asof_join(
        clicks,
        purchases,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        value_cols=["purchase_id"],
        direction="forward",
    )
    in_window = F.col("ts_asof") <= F.col("ts") + F.expr("INTERVAL 1 HOUR")
    return j.select(
        "event_id",
        "user_id",
        F.when(in_window, F.col("purchase_id_asof")).alias("purchase_id"),
    )



@query(
    "events_funnel",
    """
    WITH s0 AS (
        SELECT user_id AS u, min(ts) AS t FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    s1 AS (
        SELECT e.user_id AS u, min(e.ts) AS t
        FROM events e JOIN s0 ON e.user_id = s0.u AND e.ts > s0.t
        WHERE e.event_type = 'click' GROUP BY e.user_id
    ),
    s2 AS (
        SELECT e.user_id AS u, min(e.ts) AS t
        FROM events e JOIN s1 ON e.user_id = s1.u AND e.ts > s1.t
        WHERE e.event_type = 'purchase' GROUP BY e.user_id
    ),
    c AS (
        SELECT 0 AS step, 'view' AS event_type,
               (SELECT count(*) FROM s0) AS n_users
        UNION ALL
        SELECT 1, 'click', (SELECT count(*) FROM s1)
        UNION ALL
        SELECT 2, 'purchase', (SELECT count(*) FROM s2)
    )
    SELECT CAST(step AS INT) AS step, event_type,
           CAST(n_users AS BIGINT) AS n_users,
           round(CAST(n_users AS DOUBLE)
                 / lag(n_users) OVER (ORDER BY step), 4) AS conversion,
           round(CAST(n_users AS DOUBLE)
                 / first_value(n_users) OVER (
                     ORDER BY step
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
                 ), 4) AS overall
    FROM c
    """,
)
def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered view -> click -> purchase funnel: each step's completion
    is the earliest qualifying event strictly after the previous step's —
    k-1 co-keyed (user, ts) joins with the step filter pushed to the
    scan; the oracle replays the chained conditional-min construction."""
    from pyarrow_ops_spark.operators.events import funnel_steps

    ev = load_table(spark, "events", sf_dir)
    return funnel_steps(ev, ["view", "click", "purchase"])



@query(
    "events_retention_cohorts",
    """
    WITH acts AS (
        SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS d FROM events
    ),
    firsts AS (SELECT u, min(d) AS f FROM acts GROUP BY u),
    cohorts AS (
        SELECT u,
               f - CAST((datediff('day', DATE '1970-01-05', f) % 7 + 7) % 7
                        AS INTEGER) AS cohort
        FROM firsts
    ),
    per_period AS (
        SELECT DISTINCT a.u, c.cohort,
               CAST(floor(datediff('day', c.cohort, a.d) / 7.0) AS INT)
                   AS period_offset
        FROM acts a JOIN cohorts c ON a.u = c.u
    ),
    sizes AS (SELECT cohort, count(*) AS sz FROM cohorts GROUP BY cohort)
    SELECT p.cohort, p.period_offset,
           CAST(count(*) AS BIGINT) AS n_users,
           round(CAST(count(*) AS DOUBLE) / any_value(s.sz), 4) AS retention
    FROM per_period p JOIN sizes s ON p.cohort = s.cohort
    GROUP BY p.cohort, p.period_offset
    """,
)
def q_events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention triangle: cohort = epoch-anchored 7-day window of
    each user's first activity (fixed-width integer date math, no
    locale-dependent calendar weeks), retention = returning users /
    cohort size. Two hash aggregates + one co-keyed join; shuffles carry
    (user, date) pairs only."""
    from pyarrow_ops_spark.operators.events import retention_cohorts

    ev = load_table(spark, "events", sf_dir)
    return retention_cohorts(ev)



@query(
    "graph_pagerank_events",
    """
    WITH ue AS (
        SELECT DISTINCT 'u:' || CAST(user_id AS VARCHAR) AS s,
               't:' || event_type AS t
        FROM events
    ),
    e AS (SELECT s, t FROM ue UNION SELECT t, s FROM ue),
    nodes AS (SELECT s AS node FROM e UNION SELECT t FROM e),
    nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
    outdeg AS (SELECT s, count(*) AS d FROM e GROUP BY s),
    r0 AS (SELECT node, 1.0 / n AS rank FROM nodes CROSS JOIN nn),
    c1 AS (SELECT e.t, sum(r0.rank / outdeg.d) AS inflow
           FROM e JOIN r0 ON e.s = r0.node JOIN outdeg ON e.s = outdeg.s
           GROUP BY e.t),
    r1 AS (SELECT node, 0.15 / n + 0.85 * coalesce(inflow, 0) AS rank
           FROM nodes CROSS JOIN nn LEFT JOIN c1 ON node = c1.t),
    c2 AS (SELECT e.t, sum(r1.rank / outdeg.d) AS inflow
           FROM e JOIN r1 ON e.s = r1.node JOIN outdeg ON e.s = outdeg.s
           GROUP BY e.t),
    r2 AS (SELECT node, 0.15 / n + 0.85 * coalesce(inflow, 0) AS rank
           FROM nodes CROSS JOIN nn LEFT JOIN c2 ON node = c2.t),
    c3 AS (SELECT e.t, sum(r2.rank / outdeg.d) AS inflow
           FROM e JOIN r2 ON e.s = r2.node JOIN outdeg ON e.s = outdeg.s
           GROUP BY e.t),
    r3 AS (SELECT node, 0.15 / n + 0.85 * coalesce(inflow, 0) AS rank
           FROM nodes CROSS JOIN nn LEFT JOIN c3 ON node = c3.t)
    SELECT node, round(rank, 6) AS rank FROM r3
    """,
)
def q_graph_pagerank_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Damped PageRank (3 fixed iterations, d=0.85) over the bipartite
    user <-> event-type interaction graph — one co-keyed join + one
    aggregation per iteration, lineage truncated between rounds; the
    fixed iteration count makes the result a pure function of the edge
    list, so the oracle replays it by unrolling the three rounds."""
    from pyarrow_ops_spark.functions.graph import pagerank

    ev = load_table(spark, "events", sf_dir)
    ue = ev.select(
        F.concat(F.lit("u:"), F.col("user_id").cast("string")).alias("src"),
        F.concat(F.lit("t:"), F.col("event_type")).alias("dst"),
    ).distinct()
    edges = ue.unionByName(
        ue.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    return pagerank(edges, iterations=3)



@query(
    "events_top_user_paths",
    """
    WITH p AS (
        SELECT user_id,
               array_to_string(
                   (list(event_type ORDER BY ts, event_id))[1:20], ' > '
               ) AS path
        FROM events GROUP BY user_id
    )
    SELECT path, CAST(count(*) AS BIGINT) AS n_users
    FROM p GROUP BY path
    ORDER BY n_users DESC, path LIMIT 10
    """,
)
def q_events_top_user_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 user journeys (first 20 events per user, ordered by
    (ts, event_id) so ties are deterministic, joined into a path string).
    One groupBy(user) builds the ordered path from a (ts, id, type)
    struct list — never the payload row — then a map-side-combined path
    count and TakeOrderedAndProject."""
    from pyarrow_ops_spark.operators.events import top_user_paths

    ev = load_table(spark, "events", sf_dir)
    return top_user_paths(ev, k=10, max_steps=20)
