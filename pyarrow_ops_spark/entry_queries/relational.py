"""Core relational surface: filters, dedup-keep, groupby, joins,
windows, set ops, rollup/cube/pivot, UDF/UDAF/UDTF, scalar functions.

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




# ---------------------------------------------------------------------------
# Reference surface §2.1 #1-2: filters (conjunctive predicate pushdown)
# ---------------------------------------------------------------------------


@query(
    "filters_conjunction",
    """
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag, l_linestatus
    FROM lineitem
    WHERE l_returnflag = 'A' AND l_quantity < 30 AND l_linestatus IN ('F', 'O')
      AND l_discount >= 0.02
    """,
)
def q_filters_conjunction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-AND tuple filters (reference ops.py:34-42) — one Catalyst Filter,
    fully pushed to the parquet scan."""
    li = load_table(spark, "lineitem", sf_dir)
    out = filters(
        li,
        [
            ("l_returnflag", "=", "A"),
            ("l_quantity", "<", 30),
            ("l_linestatus", "in", ["F", "O"]),
            ("l_discount", ">=", 0.02),
        ],
    )
    return out.select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_returnflag", "l_linestatus"
    )



@query(
    "filters_not_in_or",
    """
    SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
    FROM orders
    WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
      AND (o_totalprice > 150000 OR o_orderstatus = 'F')
    """,
)
def q_filters_not_in_or(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'not in' plus the OR/boolean-dict extension (the reference is
    AND-only — SURVEY §2.2 'Predicates')."""
    orders = load_table(spark, "orders", sf_dir)
    out = filters(
        orders,
        [
            ("o_orderpriority", "not in", ["1-URGENT", "2-HIGH"]),
            {"or": [("o_totalprice", ">", 150000), ("o_orderstatus", "=", "F")]},
        ],
    )
    return out.select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")



# ---------------------------------------------------------------------------
# Reference surface §2.1 #3: drop_duplicates (first / last / drop)
# ---------------------------------------------------------------------------

_ORDERS_COLS = "o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority"



@folded_query(
    "dedup_keep_first",
    f"""
    SELECT {_ORDERS_COLS} FROM (
        SELECT *, row_number() OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
        FROM orders) t
    WHERE rn = 1
    """,
)
def q_dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """keep='first' made deterministic via explicit order (SURVEY §4.3.2:
    the reference's unstable argsort makes its 'first' arbitrary; we upgrade
    to row_number over a caller-supplied ordering — one shuffle on the key)."""
    orders = load_table(spark, "orders", sf_dir)
    return drop_duplicates(
        orders, on=["o_custkey"], keep="first", order_by=["o_orderdate", "o_orderkey"]
    )



@folded_query(
    "dedup_keep_last",
    f"""
    SELECT {_ORDERS_COLS} FROM (
        SELECT *, row_number() OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM orders) t
    WHERE rn = 1
    """,
)
def q_dedup_keep_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    return drop_duplicates(
        orders, on=["o_custkey"], keep="last", order_by=["o_orderdate", "o_orderkey"]
    )



@query(
    "dedup_keep_drop",
    """
    SELECT * FROM lineitem
    QUALIFY count(*) OVER (PARTITION BY l_orderkey) = 1
    """,
)
def q_dedup_keep_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """keep='drop' (reference ops.py:51-57): only keys with group size 1
    survive — a window count, single shuffle, no self-join."""
    li = load_table(spark, "lineitem", sf_dir)
    return drop_duplicates(li, on=["l_orderkey"], keep="drop")



# ---------------------------------------------------------------------------
# Reference surface §2.1 #5-10: groupby + named aggs
# ---------------------------------------------------------------------------


@query(
    "groupby_sum_all",
    """
    SELECT l_returnflag, l_linestatus,
           sum(l_quantity) AS l_quantity,
           CAST(sum(l_linenumber) AS BIGINT) AS l_linenumber
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
)
def q_groupby_sum_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """No-arg .sum(): aggregate ALL non-key columns, outputs keep bare input
    names (reference group.py:14-16, 44-47)."""
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_returnflag", "l_linestatus", "l_quantity", "l_linenumber"
    )
    return groupby(li, ["l_returnflag", "l_linestatus"]).sum()



@query(
    "groupby_median",
    """
    SELECT l_returnflag, median(l_quantity) AS l_quantity
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_groupby_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median (F.median) — matches the reference's interpolating
    np.median; percentile_approx would NOT (SURVEY §4.3.4)."""
    li = load_table(spark, "lineitem", sf_dir)
    return groupby(li, "l_returnflag").median(["l_quantity"])



@query(
    "groupby_agg_dict",
    """
    SELECT l_returnflag,
           avg(l_quantity) AS l_quantity,
           CAST(count(DISTINCT l_orderkey) AS BIGINT) AS l_orderkey,
           max(l_shipdate) AS l_shipdate
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_groupby_agg_dict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dict-style .agg({col: name}) with bare-name outputs (reference
    group.py:50-52), extended with count_distinct (absent in reference)."""
    li = load_table(spark, "lineitem", sf_dir)
    return groupby(li, "l_returnflag").agg(
        {"l_quantity": "mean", "l_orderkey": "count_distinct", "l_shipdate": "max"}
    )



# ---------------------------------------------------------------------------
# Reference surface §2.1 #11-13: join
# ---------------------------------------------------------------------------


@query(
    "join_inner_mxn",
    """
    SELECT l.l_orderkey, l.l_linenumber, l.l_quantity, o.o_totalprice, o.o_orderstatus
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    """,
)
def q_join_inner_mxn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join with M×N duplicate-key fan-out (reference
    join.py:15-47). Key renamed right-side so the key column appears once
    (align_tables rule)."""
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    orders = load_table(spark, "orders", sf_dir).select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice", "o_orderstatus"
    )
    return join(li, orders, on=["l_orderkey"])



@query(
    "join_broadcast_agg",
    """
    SELECT p.p_brand, sum(l.l_quantity) AS sum_qty,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    """,
)
def q_join_broadcast_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⋈dim with an explicit broadcast hint: at 100 TB the part dim
    stays small — broadcasting avoids shuffling the whole fact table."""
    li = load_table(spark, "lineitem", sf_dir).select("l_partkey", "l_quantity")
    part = load_table(spark, "part", sf_dir).select(
        F.col("p_partkey").alias("l_partkey"), "p_brand"
    )
    j = join(li, part, on=["l_partkey"], broadcast=True)
    return j.groupBy("p_brand").agg(
        F.sum("l_quantity").alias("sum_qty"), F.count(F.lit(1)).alias("n_lines")
    )



@query(
    "join_left",
    """
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    """,
)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join — on the reference's TODO list, free in Spark
    (reference README.md:95)."""
    cust = load_table(spark, "customer", sf_dir).select("c_custkey", "c_name")
    orders = load_table(spark, "orders", sf_dir).select(
        F.col("o_custkey").alias("c_custkey"), "o_orderkey", "o_totalprice"
    )
    out = join(cust, orders, on=["c_custkey"], how="left")
    return out.select("c_custkey", "c_name", "o_orderkey", "o_totalprice")



@query(
    "join_semi_anti",
    """
    SELECT c_custkey, c_mktsegment, 'has_big_order' AS tag FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
    UNION ALL
    SELECT c_custkey, c_mktsegment, 'no_big_order' AS tag FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
    """,
)
def q_join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi + anti joins (EXISTS / NOT EXISTS) — absent in the reference."""
    cust = load_table(spark, "customer", sf_dir).select("c_custkey", "c_mktsegment")
    big = (
        load_table(spark, "orders", sf_dir)
        .filter(F.col("o_totalprice") > 200000)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    semi = join(cust, big, on=["c_custkey"], how="semi").withColumn(
        "tag", F.lit("has_big_order")
    )
    anti = join(cust, big, on=["c_custkey"], how="anti").withColumn(
        "tag", F.lit("no_big_order")
    )
    return semi.unionByName(anti)



# ---------------------------------------------------------------------------
# Reference surface §2.1 #21: str_to_table (JSON string column)
# ---------------------------------------------------------------------------


@query(
    "json_str_to_table",
    """
    SELECT event_id, event_type, CAST(json_extract(props, '$.k') AS BIGINT) AS k
    FROM events
    """,
)
def q_json_str_to_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON parse with first-record schema inference (reference
    jsons.py:5-8); one distributed from_json pass."""
    ev = load_table(spark, "events", sf_dir).select("event_id", "event_type", "props")
    return str_to_table(ev, "props", schema="first")



# ---------------------------------------------------------------------------
# compare.py micro-pipeline analog: join -> dedup -> groupby mean
# ---------------------------------------------------------------------------


@query(
    "micro_pipeline",
    """
    WITH j AS (
        SELECT o.o_custkey, l.l_orderkey, l.l_linenumber, l.l_quantity
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ),
    d AS (
        SELECT * FROM j
        QUALIFY row_number() OVER (
            PARTITION BY l_orderkey ORDER BY l_linenumber, l_quantity) = 1
    )
    SELECT o_custkey, avg(l_quantity) AS l_quantity
    FROM d GROUP BY o_custkey
    """,
)
def q_micro_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's compare.py harness sequence (compare.py:22-34):
    inner join -> drop_duplicates -> groupby mean, on the star schema."""
    orders = load_table(spark, "orders", sf_dir).select(
        F.col("o_orderkey").alias("l_orderkey"), "o_custkey"
    )
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    j = join(orders, li, on=["l_orderkey"]).select(
        "o_custkey", "l_orderkey", "l_linenumber", "l_quantity"
    )
    d = drop_duplicates(
        j, on=["l_orderkey"], keep="first", order_by=["l_linenumber", "l_quantity"]
    )
    return groupby(d, "o_custkey").mean(["l_quantity"])



# ---------------------------------------------------------------------------
# Window functions (reference TODO README.md:94) + sort/limit + set ops
# ---------------------------------------------------------------------------


@query(
    "window_topk",
    f"""
    SELECT {_ORDERS_COLS}, rank FROM (
        SELECT *, CAST(row_number() OVER (
            PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rank
        FROM orders) t
    WHERE rank <= 3
    """,
)
def q_window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer — row_number window, one shuffle on the
    partition key."""
    from pyarrow_ops_spark.operators.window import top_k

    orders = load_table(spark, "orders", sf_dir)
    return top_k(
        orders,
        partition_by=["o_custkey"],
        order_by=[F.col("o_totalprice").desc(), F.col("o_orderkey")],
        k=3,
        descending=False,  # explicit desc already encoded in order_by
        rank_col="rank",
    )



@query(
    "window_running_sum",
    """
    SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
           sum(l_quantity) OVER w AS running_qty,
           lag(l_quantity) OVER w AS qty_lag1,
           lead(l_quantity) OVER w AS qty_lead1
    FROM lineitem
    WINDOW w AS (
        PARTITION BY l_suppkey
        ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def q_window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative sum + lag/lead per supplier over ship order (total order
    via the unique-ish suffix keys so both engines agree on prefix sums and
    offsets; l_quantity is integral-valued so the sums are FP-exact). One
    window spec → one shuffle + one sort serves all three functions."""
    from pyarrow_ops_spark.operators.window import lag_lead, running_agg

    li = load_table(spark, "lineitem", sf_dir)
    part, order = ["l_suppkey"], ["l_shipdate", "l_orderkey", "l_linenumber", "l_quantity"]
    out = running_agg(
        li,
        partition_by=part,
        order_by=order,
        agg_col="l_quantity",
        out_col="running_qty",
    )
    out = lag_lead(
        out, partition_by=part, order_by=order, col="l_quantity", offsets=[1, -1]
    )
    return out.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        "running_qty",
        F.col("l_quantity_lag1").alias("qty_lag1"),
        F.col("l_quantity_lead1").alias("qty_lead1"),
    )



@query(
    "window_range_frame",
    """
    SELECT o_orderkey, o_custkey, o_orderdate,
           round(sum(o_totalprice) OVER (
               PARTITION BY o_custkey
               ORDER BY epoch_us(o_orderdate)
               RANGE BETWEEN 2592000000000 PRECEDING AND CURRENT ROW), 2)
               AS trailing_30d
    FROM orders
    """,
)
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window: each order's trailing-30-day spend per customer.
    RANGE frames include peer rows (equal order keys) identically in both
    engines, so the result is deterministic without a total order."""
    us_30d = 30 * 86400 * 1_000_000
    # o_orderdate is TIMESTAMP_NTZ; the session is pinned to UTC so the
    # cast to an instant is the identity — unix_micros then gives the
    # numeric ordering a RANGE frame needs
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.unix_micros(F.col("o_orderdate").cast("timestamp_ltz")))
        .rangeBetween(-us_30d, 0)
    )
    orders = load_table(spark, "orders", sf_dir)
    return orders.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.round(F.sum("o_totalprice").over(w), 2).alias("trailing_30d"),
    )



@query(
    "sort_limit_topn",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def q_sort_limit_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-N: Spark plans TakeOrderedAndProject — per-partition
    top-N then a k-row merge on the driver, no full sort at any scale."""
    orders = load_table(spark, "orders", sf_dir)
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )



@query(
    "setops_intersect_except",
    """
    WITH big AS (SELECT DISTINCT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 150000),
         urgent AS (SELECT DISTINCT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
    SELECT c_custkey, 'both' AS tag FROM (SELECT * FROM big INTERSECT SELECT * FROM urgent)
    UNION ALL
    SELECT c_custkey, 'big_only' AS tag FROM (SELECT * FROM big EXCEPT SELECT * FROM urgent)
    """,
)
def q_setops_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """intersect / except / union — absent in the reference (SURVEY §2.2
    'Set ops'), native in Spark."""
    orders = load_table(spark, "orders", sf_dir)
    big = (
        orders.filter(F.col("o_totalprice") > 150000)
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )
    urgent = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )
    both = big.intersect(urgent).withColumn("tag", F.lit("both"))
    big_only = big.exceptAll(urgent).withColumn("tag", F.lit("big_only"))
    return both.unionByName(big_only)



@query(
    "rollup_agg",
    """
    SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollup grouping sets — absent in the reference (SURVEY §2.2
    'Aggregations')."""
    li = load_table(spark, "lineitem", sf_dir)
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").alias("sum_qty"), F.count(F.lit(1)).alias("n_rows")
    )



@query(
    "pivot_linestatus",
    """
    SELECT l_returnflag,
           sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END) AS O,
           sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END) AS F
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_pivot_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with an explicit value list (never let Spark scan for distinct
    pivot values at 100 TB)."""
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum("l_quantity"))
    )



@query(
    "having_filter_after_groupby",
    """
    SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(o_totalprice), 2) AS total_spent
    FROM orders GROUP BY o_custkey
    HAVING count(*) >= 15
    """,
)
def q_having_filter_after_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING — the reference composes filters() after groupby (SURVEY
    §2.2); same composition here, one aggregation + post-filter."""
    orders = load_table(spark, "orders", sf_dir)
    agg = groupby(orders, "o_custkey").df.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_spent"),
    )
    return filters(agg, ("n_orders", ">=", 15))



@query(
    "cube_agg",
    """
    SELECT o_orderstatus, o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_rows,
           round(sum(o_totalprice), 2) AS total
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def q_cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets over orders."""
    orders = load_table(spark, "orders", sf_dir)
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )



@query(
    "union_distinct",
    """
    SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 9000
    UNION
    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 300000
    """,
)
def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """union + distinct (SURVEY §2.2 'Set ops')."""
    a = (
        load_table(spark, "customer", sf_dir)
        .filter(F.col("c_acctbal") > 9000)
        .select(F.col("c_custkey").alias("custkey"))
    )
    b = (
        load_table(spark, "orders", sf_dir)
        .filter(F.col("o_totalprice") > 300000)
        .select(F.col("o_custkey").alias("custkey"))
    )
    return a.unionByName(b).distinct()



# ---------------------------------------------------------------------------
# Arbitrary-callable aggregation + approximate aggs (rows-only: not
# SQL-expressible / approximate by design)
# ---------------------------------------------------------------------------


@query(
    "groupby_aggregate_callable",
    """
    SELECT l_returnflag,
           round(quantile_cont(l_quantity, 0.5), 4) AS med_qty,
           round(quantile_cont(l_discount, 0.9), 4) AS p90_disc
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_groupby_aggregate_callable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's de-facto UDAF (group.py:39-48): arbitrary numpy
    callable per group via applyInPandas. Oracle-checkable because
    np.median / np.quantile use the same linear interpolation as DuckDB's
    quantile_cont."""
    import numpy as np

    li = load_table(spark, "lineitem", sf_dir).select(
        "l_returnflag", "l_quantity", "l_discount"
    )
    out = groupby(li, "l_returnflag").aggregate(
        {"l_quantity": np.median, "l_discount": lambda a: float(np.quantile(a, 0.9))}
    )
    return out.select(
        "l_returnflag",
        F.round("l_quantity", 4).alias("med_qty"),
        F.round("l_discount", 4).alias("p90_disc"),
    )



@query(
    "udtf_lateral_tokens",
    r"""
    WITH toks AS (
        SELECT doc_id,
               unnest(list_filter(
                   regexp_split_to_array(trim(text), '\s+'), t -> t <> ''))
                   AS token,
               generate_subscripts(list_filter(
                   regexp_split_to_array(trim(text), '\s+'), t -> t <> ''), 1)
                   - 1 AS pos
        FROM documents WHERE doc_id % 10 = 0
    )
    SELECT doc_id, CAST(pos AS INT) AS pos, token
    FROM toks WHERE pos < 5
    """,
)
def q_udtf_lateral_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The formal Python UDTF extension point (SURVEY §2.2 'UDF/UDAF/
    UDTF') certified through the driver hash: a table function expanding
    each document into (pos, token) rows, invoked with SQL LATERAL over
    the documents table — one input row to many output rows through the
    arrow-serialized UDTF protocol, compared against DuckDB's
    unnest+subscripts formulation of the same tokenization (Python
    str.split == regexp split on whitespace runs with empties dropped).
    Every tenth doc, first five tokens, keeps the certified row set
    sharp. UDTFs are the Python-row path — fine for expansion logic like
    this; bulk token work stays in Catalyst (see functions/text.py)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos: int, token: string")
    class SplitTokens:
        def eval(self, text: str):
            if text is None:
                return
            for i, tok in enumerate(text.split()):
                if i >= 5:
                    break
                yield i, tok

    spark.udtf.register("split_tokens_udtf", SplitTokens)
    docs = load_table(spark, "documents", sf_dir).filter(
        F.col("doc_id") % 10 == 0
    )
    docs.createOrReplaceTempView("docs_for_udtf")
    return spark.sql(
        """
        SELECT d.doc_id, t.pos, t.token
        FROM docs_for_udtf d, LATERAL split_tokens_udtf(d.text) t
        """
    )



@query(
    "udaf_grouped_agg_geomean",
    """
    SELECT l_returnflag, l_linestatus,
           round(exp(avg(ln(l_quantity + 1))), 4) AS geo_mean_qty,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
)
def q_udaf_grouped_agg_geomean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Formal Python UDAF surface (SURVEY §2.2's last bullet): a
    GROUPED_AGG ``pandas_udf`` (Series -> scalar, Arrow-batched) computing
    the shifted geometric mean of l_quantity per (returnflag, linestatus),
    used directly inside ``agg`` alongside a built-in count. Oracle =
    the closed form exp(avg(ln(x+1))) in DuckDB. Scale guidance in the
    docstring of record: a GROUPED_AGG UDAF materializes each group on
    one executor and gets NO partial aggregation — fine for
    |groups|-bounded analytics like this; for corpus-scale hot paths
    prefer the equivalent expression rewrite (exp(avg(ln(x+1))) via
    built-ins), which partial-aggregates map-side. The reference's only
    aggregate extension point is the per-group Python callable
    (pyarrow_ops/group.py:39-48), certified via groupby_aggregate_callable;
    this row certifies the vectorized formal twin."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def geo_mean_p1(v: pd.Series) -> float:
        import numpy as np

        return float(np.exp(np.log(v.to_numpy(dtype="float64") + 1.0).mean()))

    # a GROUPED_AGG pandas UDF cannot share an agg() with JVM aggregates
    # (INVALID_PANDAS_UDF_PLACEMENT), so the row count is a second pandas
    # UDAF — both evaluate in one Arrow pass over each group
    @pandas_udf("long")
    def n_rows_udaf(v: pd.Series) -> int:
        return len(v)

    li = load_table(spark, "lineitem", sf_dir)
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(geo_mean_p1("l_quantity"), 4).alias("geo_mean_qty"),
        n_rows_udaf("l_quantity").alias("n_rows"),
    )



@query(
    "approx_distinct_quantile",
    """
    SELECT l_returnflag, TRUE AS distinct_ok, TRUE AS median_ok,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_approx_distinct_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregates (HLL++ count-distinct, GK quantile sketch) —
    the 100 TB substitutes for exact distinct/median. The raw estimates
    can't hash-match an exact engine, so the query VERIFIES them in-plan:
    each group returns booleans asserting the approximations land within
    5% of the exact values (sketches are deterministic for fixed input, so
    this is a stable oracle row, not a flaky bound)."""
    li = load_table(spark, "lineitem", sf_dir)
    agg = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_orders"),
        F.count_distinct("l_orderkey").alias("exact_orders"),
        F.percentile_approx("l_extendedprice", 0.5).alias("approx_median"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact_median"),
        F.count(F.lit(1)).alias("n"),
    )
    rel_err = lambda a, e: F.abs(F.col(a) - F.col(e)) / F.col(e)  # noqa: E731
    return agg.select(
        "l_returnflag",
        # 3-sigma bounds on the sketch accuracy (rsd=0.02 HLL, 1e-4-ish GK
        # quantile drift) — deterministic for fixed input, generous enough
        # to hold at any sf
        (rel_err("approx_orders", "exact_orders") <= 0.06).alias("distinct_ok"),
        (rel_err("approx_median", "exact_median") <= 0.01).alias("median_ok"),
        "n",
    )



@query(
    "explode_word_count",
    r"""
    SELECT word, CAST(count(*) AS BIGINT) AS n
    FROM (SELECT unnest(string_split_regex(lower(text), '\s+')) AS word FROM documents)
    WHERE regexp_matches(word, '^[a-z]+$')
    GROUP BY word
    """,
)
def q_explode_word_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus word frequencies: explode (lateral array flatten) + hash agg
    — the generator/UNNEST surface (absent in the reference)."""
    docs = load_table(spark, "documents", sf_dir)
    return (
        docs.select(F.explode(F.split(F.lower("text"), r"\s+")).alias("word"))
        .filter(F.col("word").rlike("^[a-z]+$"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )



@query(
    "filters_like_between_null",
    """
    SELECT p_partkey, p_name, p_type, p_size, p_retailprice
    FROM part
    WHERE p_type LIKE '%ECO%'
      AND p_size BETWEEN 10 AND 30
      AND p_name IS NOT NULL
      AND NOT (p_retailprice < 950)
    """,
)
def q_filters_like_between_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE / BETWEEN / null-test / NOT predicates — beyond the
    reference's 9 ops (SURVEY §2.2 'Predicates'); still ONE Catalyst
    Filter, pushed to the scan."""
    part = load_table(spark, "part", sf_dir)
    out = filters(
        part,
        [
            ("p_type", "like", "%ECO%"),
            ("p_size", "between", (10, 30)),
            ("p_name", "is not null", None),
            {"not": ("p_retailprice", "<", 950)},
        ],
    )
    return out.select("p_partkey", "p_name", "p_type", "p_size", "p_retailprice")



@query(
    "groupby_collect_sorted",
    """
    SELECT l_returnflag,
           array_to_string(list_sort(list(DISTINCT l_linestatus)), ',')
               AS statuses,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_groupby_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set into a sorted array — array-valued aggregation (absent
    in the reference; sorted so both engines agree exactly). The driver row
    emits the array as a ','-joined string: the correctness harness
    canonicalizes rows via pandas hashing, which cannot hash list cells
    (the r3 'unhashable type' err) — array_join preserves exactly the
    same information (order and elements) in a hashable scalar."""
    li = load_table(spark, "lineitem", sf_dir)
    return li.groupBy("l_returnflag").agg(
        F.array_join(F.array_sort(F.collect_set("l_linestatus")), ",").alias(
            "statuses"
        ),
        F.count_distinct("l_suppkey").alias("n_suppliers"),
    )



@query(
    "window_lag_lead",
    """
    SELECT user_id, event_id, value,
           lag(event_id) OVER w AS event_id_lag1,
           lead(event_id) OVER w AS event_id_lead1
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead over a total per-user order — one shuffle on user_id."""
    from pyarrow_ops_spark.operators.window import lag_lead

    ev = load_table(spark, "events", sf_dir)
    out = lag_lead(
        ev,
        partition_by=["user_id"],
        order_by=["ts", "event_id"],
        col="event_id",
        offsets=[1, -1],
    )
    return out.select(
        "user_id", "event_id", "value", "event_id_lag1", "event_id_lead1"
    )



# ---------------------------------------------------------------------------
# Range join, Q6, extended aggs, cross/full joins, date & string functions
# ---------------------------------------------------------------------------

_PRICE_BANDS = [
    ("p0_100k", 0.0, 100_000.0),
    ("p100_200k", 100_000.0, 200_000.0),
    ("p200_300k", 200_000.0, 300_000.0),
    ("p300k_up", 300_000.0, 1e12),
]



@query(
    "range_join_price_bands",
    f"""
    SELECT b.band, CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(o.o_totalprice), 2) AS total
    FROM orders o JOIN (VALUES {", ".join(f"('{n}', {lo}, {hi})" for n, lo, hi in _PRICE_BANDS)})
         b(band, lo, hi)
      ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
    GROUP BY b.band
    """,
)
def q_range_join_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (band) join against a broadcast interval dim — map-only
    BroadcastNestedLoopJoin, no fact-side shuffle (SURVEY §2.2 'Joins')."""
    from pyarrow_ops_spark.operators.join import range_join

    orders = load_table(spark, "orders", sf_dir).select("o_totalprice")
    # VALUES → a JVM LocalRelation: range_join's disjointness analysis
    # collects the dim driver-side, and a createDataFrame(list) dim is a
    # defaultParallelism-sliced Python RDD whose executeTake costs ~32
    # Python-worker launches (~6 s task at sf0.1) to fetch four rows; the
    # LocalRelation collect is a driver-local copy (r15, guide §4).
    bands = spark.sql(
        "SELECT band, CAST(lo AS DOUBLE) AS lo, CAST(hi AS DOUBLE) AS hi "
        "FROM VALUES "
        + ", ".join(f"('{n}', {lo}, {hi})" for n, lo, hi in _PRICE_BANDS)
        + " AS t(band, lo, hi)"
    )
    j = range_join(orders, bands, "o_totalprice", "lo", "hi")
    return j.groupBy("band").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )



@query(
    "groupby_stddev_minmax",
    """
    SELECT l_returnflag,
           round(stddev(l_extendedprice), 4) AS price_sd,
           min(l_extendedprice) AS price_min,
           max(l_extendedprice) AS price_max
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_groupby_stddev_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extended agg registry beyond the reference's five: sample stddev +
    min/max in one hash aggregation."""
    li = load_table(spark, "lineitem", sf_dir)
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev("l_extendedprice"), 4).alias("price_sd"),
        F.min("l_extendedprice").alias("price_min"),
        F.max("l_extendedprice").alias("price_max"),
    )



@query(
    "cross_join_dims",
    """
    SELECT r.r_name, n.n_name,
           CAST(r.r_regionkey = n.n_regionkey AS BOOLEAN) AS is_member
    FROM region r CROSS JOIN nation n
    """,
)
def q_cross_join_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product of two (small) dims — the reference never shipped
    cross join (README TODO); only ever sane between broadcast-size
    inputs."""
    from pyarrow_ops_spark.operators.join import join

    region = load_table(spark, "region", sf_dir).select("r_name", "r_regionkey")
    nation = load_table(spark, "nation", sf_dir).select("n_name", "n_regionkey")
    out = join(region, nation, on=[], how="cross")
    return out.select(
        "r_name",
        "n_name",
        (F.col("r_regionkey") == F.col("n_regionkey")).alias("is_member"),
    )



@query(
    "join_full_outer",
    """
    SELECT coalesce(c.ck, o.ck) AS c_custkey, c.c_name, o.o_orderkey
    FROM (SELECT c_custkey AS ck, c_name FROM customer WHERE c_custkey % 3 = 0) c
    FULL JOIN (SELECT o_custkey AS ck, o_orderkey FROM orders WHERE o_custkey % 3 = 1) o
      ON c.ck = o.ck
    """,
)
def q_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join with disjoint key slices so both null sides appear;
    the key column is coalesced to appear once (align_tables rule carried
    to outer joins)."""
    cust = (
        load_table(spark, "customer", sf_dir)
        .filter(F.col("c_custkey") % 3 == 0)
        .select(F.col("c_custkey"), "c_name")
    )
    orders = (
        load_table(spark, "orders", sf_dir)
        .filter(F.col("o_custkey") % 3 == 1)
        .select(F.col("o_custkey").alias("c_custkey"), "o_orderkey")
    )
    out = join(cust, orders, on=["c_custkey"], how="full")
    return out.select("c_custkey", "c_name", "o_orderkey")



@query(
    "date_parts_agg",
    """
    SELECT CAST(year(o_orderdate) AS INT) AS yr,
           CAST(month(o_orderdate) AS INT) AS mo,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(o_totalprice), 2) AS total
    FROM orders GROUP BY 1, 2
    """,
)
def q_date_parts_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-function surface (year/month extraction) + agg — the reference
    has zero date functions (SURVEY §2.2 'Scalar functions')."""
    orders = load_table(spark, "orders", sf_dir)
    return (
        orders.groupBy(
            F.year("o_orderdate").alias("yr"), F.month("o_orderdate").alias("mo")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )



@query(
    "string_funcs",
    """
    SELECT c_custkey,
           upper(substr(c_name, 1, 8)) AS name_prefix,
           CAST(length(c_name) AS INT) AS name_len,
           concat(c_mktsegment, '#', lpad(CAST(c_custkey AS VARCHAR), 8, '0')) AS seg_key,
           regexp_extract(c_name, '([0-9]+)', 1) AS name_digits,
           CAST(contains(c_mktsegment, 'BUIL') AS BOOLEAN) AS is_building
    FROM customer
    """,
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function surface: upper/substr/length/concat/lpad/
    regexp_extract/contains — all JVM-side codegen expressions."""
    cust = load_table(spark, "customer", sf_dir)
    return cust.select(
        "c_custkey",
        F.upper(F.substring("c_name", 1, 8)).alias("name_prefix"),
        F.length("c_name").cast("int").alias("name_len"),
        F.concat(
            F.col("c_mktsegment"),
            F.lit("#"),
            F.lpad(F.col("c_custkey").cast("string"), 8, "0"),
        ).alias("seg_key"),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("name_digits"),
        F.col("c_mktsegment").contains("BUIL").alias("is_building"),
    )



_SQL_GROUPING_SETS = """
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
           CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls,
           SUM(l_quantity) AS sum_qty,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                            (l_returnflag), (l_linestatus), ())
"""



@query("grouping_sets_agg", _SQL_GROUPING_SETS)
def q_grouping_sets_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with GROUPING() markers (rollup/cube's
    general form — one Expand + one aggregation, not four scans)."""
    from pyarrow_ops_spark.sources.tables import sql

    return sql(spark, _SQL_GROUPING_SETS, sf_dir, names=("lineitem",))



@query(
    "unpivot_metrics",
    """
    WITH m AS (
        SELECT 'l_quantity' AS metric, l_quantity AS value FROM lineitem
        UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
        UNION ALL SELECT 'l_discount', l_discount FROM lineitem
        UNION ALL SELECT 'l_tax', l_tax FROM lineitem
    )
    SELECT metric, ROUND(AVG(value), 4) AS avg_value,
           CAST(COUNT(value) AS BIGINT) AS n
    FROM m GROUP BY metric
    """,
)
def q_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unpivot/melt (wide -> long), then a per-metric profile. Spark's
    unpivot is a single Expand node — one scan fans out to all metrics
    (the SQL-oracle UNION ALL shape would scan the table once per
    metric)."""
    li = load_table(spark, "lineitem", sf_dir)
    melted = li.unpivot(
        ["l_orderkey"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "metric",
        "value",
    )
    return melted.groupBy("metric").agg(
        F.round(F.avg("value"), 4).alias("avg_value"),
        F.count("value").alias("n"),
    )



@query(
    "hll_sketch_distinct",
    """
    SELECT l_returnflag, TRUE AS within_bound
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_hll_sketch_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datasketches-HLL distinct counting: the 100 TB cardinality path.
    Unlike count(DISTINCT x) (a full shuffle of x), the sketch is a
    fixed-size partial aggregate — and the BINARY sketch itself is
    re-aggregatable across partitions/days via hll_union_agg, which exact
    distinct counts are not. Oracle is the invariant-check pattern: the
    estimate must land within 5% of exact (HLL lgConfigK=12 gives ~1.6%
    standard error)."""
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("l_orderkey")).alias("est"),
            F.count_distinct("l_orderkey").alias("exact"),
        )
        .select(
            "l_returnflag",
            (
                F.abs(F.col("est") - F.col("exact"))
                <= 0.05 * F.col("exact")
            ).alias("within_bound"),
        )
    )



@query(
    "window_ntile_quartiles",
    """
    WITH t AS (
        SELECT o_orderpriority, o_totalprice,
               ntile(4) OVER (PARTITION BY o_orderpriority
                              ORDER BY o_totalprice, o_orderkey) AS quartile
        FROM orders
    )
    SELECT o_orderpriority, CAST(quartile AS INT) AS quartile,
           CAST(count(*) AS BIGINT) AS n,
           round(min(o_totalprice), 2) AS lo,
           round(max(o_totalprice), 2) AS hi
    FROM t GROUP BY 1, 2
    """,
)
def q_window_ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile(4) per order priority + per-quartile stats. The window sorts
    within each of the 5 priority partitions (parallel across them); the
    (o_totalprice, o_orderkey) total order makes tile assignment
    deterministic across engines. For GLOBAL quantiles at 100 TB use
    approx_percentile/percentile_approx — a single-partition ntile window
    does not scale; the partitioned form here does."""
    orders = load_table(spark, "orders", sf_dir)
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    t = orders.withColumn("quartile", F.ntile(4).over(w))
    return t.groupBy("o_orderpriority", "quartile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(F.min("o_totalprice"), 2).alias("lo"),
        F.round(F.max("o_totalprice"), 2).alias("hi"),
    )
