"""Query registry: every implemented operator exposed as a (spark, sf_dir) ->
DataFrame callable plus a DuckDB oracle SQL string.

This is the driver-facing catalog consumed by ``__spark_entry__.py``. Each
entry demonstrates one operator from SURVEY.md §2 (or a north-star
extension) on the synthetic star schema. Column names are aliased
identically in the Spark code and the oracle SQL so the driver's
sorted-by-name value-hash comparison holds.

Float policy: aggregates over non-integral doubles are rounded to 4
decimals on BOTH sides (summation order differs between engines in the last
ulp); pass-through columns and integral-valued doubles (e.g. l_quantity)
are compared exactly.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from pyarrow_ops_spark.operators.filters import filters
from pyarrow_ops_spark.operators.dedup import drop_duplicates
from pyarrow_ops_spark.operators.group import groupby
from pyarrow_ops_spark.operators.join import join
from pyarrow_ops_spark.functions.jsons import str_to_table
from pyarrow_ops_spark.sources.tables import load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


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


@query(
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


@query(
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
# Flagship: TPC-H Q1 analog (filters + groupby + derived columns)
# ---------------------------------------------------------------------------


@query(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           sum(l_quantity) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 4) AS avg_qty,
           round(avg(l_extendedprice), 4) AS avg_price,
           round(avg(l_discount), 4) AS avg_disc,
           CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 analog — the Phase-1 end-to-end slice (SURVEY §7):
    predicate pushdown into the scan + partial/final hash aggregation."""
    li = load_table(spark, "lineitem", sf_dir)
    f = filters(li, ("l_shipdate", "<=", "1998-09-02"))
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        f.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


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
