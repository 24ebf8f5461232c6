"""TPC-H-shaped analytical queries (q1..q22 subset) + SQL frontend rows.

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



@query(
    "sql_frontend_q4",
    """
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_returnflag = 'R')
    GROUP BY o_orderpriority
    """,
)
def q_sql_frontend_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 analog through the SQL front door: identical text runs on
    the registered views (spark.sql) and on DuckDB — the engine has a full
    SQL surface, not just the DataFrame API. EXISTS plans as a left-semi
    hash join."""
    from pyarrow_ops_spark.sources.tables import register_views

    register_views(spark, sf_dir, names=("orders", "lineitem"))
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_returnflag = 'R')
        GROUP BY o_orderpriority
        """
    )



# ---------------------------------------------------------------------------
# Deeper TPC-H-style multi-join analytics
# ---------------------------------------------------------------------------


@query(
    "q3_shipping_priority",
    """
    SELECT l.l_orderkey,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           o.o_orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate
    """,
)
def q_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 analog: 3-way join with filters pushed to all scans; the
    customer dim is broadcast."""
    cust = (
        load_table(spark, "customer", sf_dir)
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = (
        load_table(spark, "orders", sf_dir)
        .filter(F.col("o_orderdate") < "1995-03-15")
        .select("o_orderkey", "o_custkey", "o_orderdate")
    )
    li = (
        load_table(spark, "lineitem", sf_dir)
        .filter(F.col("l_shipdate") > "1995-03-15")
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    j = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey).join(
        li, li.l_orderkey == orders.o_orderkey
    )
    return j.groupBy("l_orderkey", "o_orderdate").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        )
    ).select("l_orderkey", "revenue", "o_orderdate")



@query(
    "q5_nation_revenue",
    """
    SELECT n.n_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name IN ('AMERICA', 'ASIA')
    GROUP BY n.n_name
    """,
)
def q_q5_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style star join: fact table joins broadcast dims
    (customer/nation/region); only the orders⋈lineitem join shuffles."""
    cust = load_table(spark, "customer", sf_dir).select("c_custkey", "c_nationkey")
    orders = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_custkey")
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    nation = load_table(spark, "nation", sf_dir).select(
        "n_nationkey", "n_regionkey", "n_name"
    )
    region = load_table(spark, "region", sf_dir).filter(
        F.col("r_name").isin("AMERICA", "ASIA")
    )
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return j.groupBy("n_name").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        )
    )



@query(
    "q14_promo_revenue",
    """
    SELECT round(
        100.0 * sum(CASE WHEN p.p_type LIKE 'PROMO%'
                         THEN l.l_extendedprice * (1 - l.l_discount) END)
        / sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1995-09-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1995-10-01 00:00:00'
    """,
)
def q_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 analog: conditional-aggregation ratio over a broadcast
    dim join — the filter prunes lineitem at the scan, part broadcasts,
    one global aggregation."""
    li = (
        load_table(spark, "lineitem", sf_dir)
        .filter(
            (F.col("l_shipdate") >= "1995-09-01") & (F.col("l_shipdate") < "1995-10-01")
        )
        .select("l_partkey", "l_extendedprice", "l_discount")
    )
    part = load_table(spark, "part", sf_dir).select("p_partkey", "p_type")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").like("PROMO%"), rev)
    return j.agg(
        F.round(100.0 * F.sum(promo) / F.sum(rev), 4).alias("promo_pct")
    )



@query(
    "q7_nation_volume",
    """
    SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
           CAST(year(l.l_shipdate) AS INT) AS yr,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS volume
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation cn ON c.c_nationkey = cn.n_nationkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation sn ON s.s_nationkey = sn.n_nationkey
    WHERE cn.n_name IN ('NATION_1', 'NATION_2') AND sn.n_name IN ('NATION_1', 'NATION_2')
      AND cn.n_name != sn.n_name
    GROUP BY cn.n_name, sn.n_name, 3
    """,
)
def q_q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 analog: shipping volume between two nations by year — two
    independent broadcast dim chains (customer-side and supplier-side
    nation) hang off the one fact⋈orders shuffle join."""
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_custkey")
    cust = load_table(spark, "customer", sf_dir).select("c_custkey", "c_nationkey")
    supp = load_table(spark, "supplier", sf_dir).select("s_suppkey", "s_nationkey")
    nation = load_table(spark, "nation", sf_dir).select("n_nationkey", "n_name")
    cn = nation.filter(F.col("n_name").isin("NATION_1", "NATION_2")).select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    sn = nation.filter(F.col("n_name").isin("NATION_1", "NATION_2")).select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .filter(F.col("cust_nation") != F.col("supp_nation"))
    )
    return j.groupBy(
        "cust_nation", "supp_nation", F.year("l_shipdate").alias("yr")
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "volume"
        )
    )



@query(
    "q18_large_orders",
    """
    WITH big AS (
        SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        HAVING sum(l_quantity) > 150
    )
    SELECT c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           sum(l.l_quantity) AS total_qty
    FROM orders o
    JOIN big ON o.o_orderkey = big.l_orderkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    GROUP BY c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
    """,
)
def q_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 analog: aggregate → HAVING → semi-style join back to the
    fact — the 'big orders' set is tiny after the HAVING, so it broadcasts
    and the lineitem table is filtered before the wide join."""
    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .filter(F.col("sq") > 150)
        .select("l_orderkey")
    )
    orders = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = load_table(spark, "customer", sf_dir).select("c_custkey", "c_name")
    j = (
        li.join(F.broadcast(big), on="l_orderkey")
        .join(orders, F.col("l_orderkey") == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    )
    return j.groupBy("c_name", "o_orderkey", "o_orderdate", "o_totalprice").agg(
        F.sum("l_quantity").alias("total_qty")
    )



@query(
    "supplier_nation_revenue",
    """
    SELECT n.n_name, s.s_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name, s.s_name
    """,
)
def q_supplier_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier-rollup revenue: fact ⋈ broadcast supplier ⋈ broadcast
    nation — only the aggregation shuffles, keyed by (nation, supplier)."""
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_suppkey", "l_extendedprice", "l_discount"
    )
    supp = load_table(spark, "supplier", sf_dir).select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    nation = load_table(spark, "nation", sf_dir).select("n_nationkey", "n_name")
    j = li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey).join(
        F.broadcast(nation), supp.s_nationkey == nation.n_nationkey
    )
    return j.groupBy("n_name", "s_name").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        ),
        F.count(F.lit(1)).alias("n_lines"),
    )



@query(
    "q6_forecast_revenue",
    """
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 analog: pure filter + global agg — every predicate pushes
    to the parquet scan, result is one row (partial aggs, no shuffle of
    data rows)."""
    li = load_table(spark, "lineitem", sf_dir)
    f = filters(
        li,
        [
            ("l_shipdate", ">=", "1996-01-01"),
            ("l_shipdate", "<", "1997-01-01"),
            ("l_discount", ">=", 0.05),
            ("l_discount", "<=", 0.07),
            ("l_quantity", "<", 24),
        ],
    )
    return f.agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue")
    )



_SQL_FRONTEND_WINDOW = """
    SELECT s_nationkey, s_suppkey, s_acctbal,
           CAST(RANK() OVER (PARTITION BY s_nationkey
                             ORDER BY s_acctbal DESC, s_suppkey) AS BIGINT)
               AS bal_rank,
           ROUND(s_acctbal - AVG(s_acctbal) OVER (PARTITION BY s_nationkey), 2)
               AS bal_vs_nation_avg
    FROM supplier
"""



@folded_query("sql_frontend_window", _SQL_FRONTEND_WINDOW)
def q_sql_frontend_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window analytics through the SQL front door — the SAME string object
    runs on spark.sql and on DuckDB. RANK + a partition-frame AVG in one
    Window spec: a single shuffle on s_nationkey serves both functions."""
    from pyarrow_ops_spark.sources.tables import sql

    return sql(spark, _SQL_FRONTEND_WINDOW, sf_dir, names=("supplier",))



_SQL_FRONTEND_TOPN = """
    WITH ranked AS (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    )
    SELECT c.c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_top_orders,
           ROUND(AVG(r.o_totalprice), 2) AS avg_top_price
    FROM ranked r JOIN customer c ON r.o_custkey = c.c_custkey
    WHERE r.rn <= 3
    GROUP BY c.c_mktsegment
"""



@folded_query("sql_frontend_topn", _SQL_FRONTEND_TOPN)
def q_sql_frontend_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CTE + per-group top-N + join + aggregate, byte-identical SQL on both
    engines. Catalyst turns the rn <= 3 post-filter into a map-side
    WindowGroupLimit before the window shuffle, and AQE broadcast-joins the
    customer side — declarative SQL gets the same physical plan quality as
    the hand-built DataFrame queries."""
    from pyarrow_ops_spark.sources.tables import sql

    return sql(spark, _SQL_FRONTEND_TOPN, sf_dir, names=("orders", "customer"))



_SQL_Q17 = """
    SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#23'
      AND l_quantity < (SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
                        WHERE l2.l_partkey = p_partkey)
"""



@query("q17_small_quantity_revenue", _SQL_Q17)
def q_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 analog: correlated scalar subquery (per-part average
    quantity) gating a fact-side filter. Catalyst de-correlates the
    subquery into an aggregate + join — no per-row re-execution, which is
    the difference between O(n) and O(n·parts) at 100 TB. Byte-identical
    SQL on both engines."""
    from pyarrow_ops_spark.sources.tables import sql

    return sql(spark, _SQL_Q17, sf_dir, names=("lineitem", "part"))



# ---------------------------------------------------------------------------
# TPC-H plan-shape analogs: outer-join distributions, scalar subqueries,
# anti-joins, disjunctive join predicates, correlated-subquery-as-window
# ---------------------------------------------------------------------------


@query(
    "q13_order_count_distribution",
    """
    WITH c_orders AS (
        SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
        FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY c.c_custkey
    )
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM c_orders GROUP BY c_count
    """,
)
def q_q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: outer join + double aggregation. count(o_orderkey)
    over the left join yields 0 (not null) for order-less customers — the
    outer-join/COUNT(col) interaction Q13 exists to test. First agg shuffles
    on c_custkey; the distribution agg shuffles a few hundred count values."""
    cust = load_table(spark, "customer", sf_dir).select("c_custkey")
    orders = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_custkey")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("bigint").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).cast("bigint").alias("custdist")
    )



@query(
    "q22_sales_opportunity",
    """
    SELECT c.c_nationkey,
           CAST(count(*) AS BIGINT) AS numcust,
           round(sum(c.c_acctbal), 2) AS totacctbal
    FROM customer c
    WHERE c.c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY c.c_nationkey
    """,
)
def q_q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar subquery + NOT EXISTS anti-join (rich
    customers with no RECENT orders). The scalar avg is a 1-row broadcast
    cross join (no driver collect — the value never leaves the cluster);
    NOT EXISTS is left_anti against the date-filtered orders key projection
    — the filter pushes to the orders scan, and both anti-join sides
    shuffle only their key column."""
    cust = load_table(spark, "customer", sf_dir).select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    orders = (
        load_table(spark, "orders", sf_dir)
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("__avg_bal")
    )
    rich = cust.join(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("__avg_bal")
    )
    no_orders = rich.join(
        orders, rich.c_custkey == orders.o_custkey, "left_anti"
    )
    return no_orders.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("numcust"),
        F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
    )



@query(
    "q19_disjunctive_filter",
    """
    SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def q_q19_disjunctive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-conjunctions across both join sides. Catalyst
    factors the single-side conjuncts out of the disjunction (CNF
    conversion), so part gets p_brand IN (...) pushed to its scan and
    lineitem gets the l_quantity range union pushed to its scan; only the
    cross-side residual evaluates post-join. part broadcasts."""
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    part = load_table(spark, "part", sf_dir).select("p_partkey", "p_brand", "p_size")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(1, 25)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 35)
        & F.col("l_quantity").between(20, 30)
    )
    return j.filter(cond).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        ),
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
    )



@query(
    "q9_profit_by_nation_year",
    """
    SELECT n.n_name AS nation,
           CAST(year(o.o_orderdate) AS INT) AS o_year,
           round(sum(l.l_extendedprice * (1 - l.l_discount)
                     - 0.8 * p.p_retailprice * l.l_quantity), 2) AS sum_profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY 1, 2
    """,
)
def q_q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (profit per nation per year; supply cost proxied as
    80% of retail price — the synthetic schema has no partsupp). Three dims
    broadcast (part filtered by LIKE before the join, supplier, nation);
    the only shuffle joins lineitem to orders on orderkey."""
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount",
    )
    part = (
        load_table(spark, "part", sf_dir)
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey", "p_retailprice")
    )
    supp = load_table(spark, "supplier", sf_dir).select("s_suppkey", "s_nationkey")
    nation = load_table(spark, "nation", sf_dir).select("n_nationkey", "n_name")
    orders = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_orderdate")
    j = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
    )
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.8 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        j.groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.round(F.sum(profit), 2).alias("sum_profit"))
    )



@query(
    "q10_returned_top_customers",
    """
    SELECT c.c_custkey, c.c_name, n.n_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def q_q10_returned_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue, top 20 customers. The
    l_returnflag filter pushes to the lineitem scan; customer/nation
    broadcast; TakeOrderedAndProject keeps the global sort at top-k cost
    (per-partition heap + driver merge of 20-row heads, no full sort).
    Tie-break on c_custkey makes the LIMIT deterministic across engines."""
    cust = load_table(spark, "customer", sf_dir).select(
        "c_custkey", "c_name", "c_nationkey"
    )
    orders = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_custkey")
    li = (
        load_table(spark, "lineitem", sf_dir)
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    nation = load_table(spark, "nation", sf_dir).select("n_nationkey", "n_name")
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    )
    return (
        j.groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )



@query(
    "q2_min_cost_supplier",
    """
    WITH costs AS (
        SELECT l_partkey, l_suppkey,
               min(l_extendedprice / l_quantity) AS unit_cost
        FROM lineitem GROUP BY 1, 2
    ),
    best AS (
        SELECT l_partkey, l_suppkey, unit_cost,
               min(unit_cost) OVER (PARTITION BY l_partkey) AS best_cost
        FROM costs
    )
    SELECT p.p_partkey, s.s_name, round(b.unit_cost, 4) AS unit_cost
    FROM best b
    JOIN part p ON p.p_partkey = b.l_partkey
    JOIN supplier s ON s.s_suppkey = b.l_suppkey
    WHERE b.unit_cost = b.best_cost AND p.p_size <= 5
    """,
)
def q_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: the correlated min-subquery (cheapest supplier per
    part) rewritten as a window min. Two exchanges, both cheap: the first
    runs AFTER map-side partial aggregation (each task emits at most one
    row per (part,supplier) it saw, not raw lineitems); the second
    repartitions the already-aggregated ~|part|x|supplier-per-part| relation
    for the per-part window. Collapsing to one shuffle (repartition by
    l_partkey up front) would move RAW rows with no combine — worse at
    100 TB. The unit_cost = best_cost equality is exact: min() returns an
    actual computed value and IEEE division is deterministic, so both
    engines keep identical rows."""
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    part = (
        load_table(spark, "part", sf_dir)
        .filter(F.col("p_size") <= 5)
        .select("p_partkey")
    )
    supp = load_table(spark, "supplier", sf_dir).select("s_suppkey", "s_name")
    costs = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    w = W.partitionBy("l_partkey")
    best = costs.withColumn("best_cost", F.min("unit_cost").over(w)).filter(
        F.col("unit_cost") == F.col("best_cost")
    )
    return (
        best.join(F.broadcast(part), best.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), best.l_suppkey == supp.s_suppkey)
        .select("p_partkey", "s_name", F.round("unit_cost", 4).alias("unit_cost"))
    )



@query(
    "q8_market_share",
    """
    SELECT CAST(year(l.l_shipdate) AS BIGINT) AS o_year,
           round(sum(CASE WHEN n.n_name = 'NATION_5'
                          THEN l.l_extendedprice * (1 - l.l_discount)
                          ELSE 0 END)
                 / sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS mkt_share
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY year(l.l_shipdate)
    """,
)
def q_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 analog (market share): one nation's revenue fraction within
    its region per year. Fact scans once; supplier/nation/region broadcast
    (three dims, zero fact shuffles before the single year-keyed agg);
    the share is a conditional-sum ratio inside the same aggregate."""
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    supp = load_table(spark, "supplier", sf_dir).select("s_suppkey", "s_nationkey")
    nation = load_table(spark, "nation", sf_dir).select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    region = load_table(spark, "region", sf_dir).filter(
        F.col("r_name") == "ASIA"
    ).select("r_regionkey")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    j = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return (
        j.groupBy(F.year("l_shipdate").cast("long").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("n_name") == "NATION_5", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("mkt_share")
        )
    )



@query(
    "q11_important_parts",
    """
    WITH pv AS (
        SELECT l.l_partkey, sum(l.l_extendedprice) AS value
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        WHERE n.n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
        GROUP BY l.l_partkey
    )
    SELECT l_partkey, round(value, 2) AS value
    FROM pv
    WHERE value > (SELECT avg(value) * 2 FROM pv)
    """,
)
def q_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 analog (important stock): parts whose revenue through a
    nation group exceeds twice the group average (scale-invariant) — a HAVING against
    a GLOBAL scalar aggregate. The per-part aggregate computes once and
    feeds both sides: the threshold attaches as a broadcast single-row
    cross join, not a second scan or a collect."""
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    supp = load_table(spark, "supplier", sf_dir).select("s_suppkey", "s_nationkey")
    nation = load_table(spark, "nation", sf_dir).filter(
        F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3")
    ).select("n_nationkey")
    pv = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("l_partkey")
        .agg(F.sum("l_extendedprice").alias("value"))
    )
    thresh = pv.agg((F.avg("value") * 2).alias("__t"))
    return (
        pv.crossJoin(F.broadcast(thresh))
        .filter(F.col("value") > F.col("__t"))
        .select("l_partkey", F.round("value", 2).alias("value"))
    )



_Q15_SQL = """
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               sum(l_extendedprice * (1 - l_discount)) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1998-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, round(r.total_revenue, 2) AS total_revenue
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
"""



@query("q15_top_supplier", _Q15_SQL)
def q_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 analog (top supplier) through the SQL front door: the
    identical text runs on Spark and DuckDB. The CTE materializes one
    supplier-keyed aggregate; the scalar max subquery broadcasts back as a
    single-row filter — Catalyst rewrites it, no second fact scan."""
    from pyarrow_ops_spark.sources.tables import register_views

    register_views(spark, sf_dir, names=("supplier", "lineitem"))
    return spark.sql(_Q15_SQL)



_Q21_SQL = """
    SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 10
"""



@query("q21_sole_return_supplier", _Q21_SQL)
def q_q21_sole_return_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 analog (suppliers solely responsible for returns on
    multi-supplier orders): correlated EXISTS + NOT EXISTS with a non-equi
    correlate (different supplier, same order) — planned as left-semi and
    left-anti hash joins on the order key, never a nested loop. Top-10 is
    a TakeOrderedAndProject with a deterministic tie-break."""
    from pyarrow_ops_spark.sources.tables import register_views

    register_views(spark, sf_dir, names=("supplier", "lineitem", "orders"))
    return spark.sql(_Q21_SQL)



@query(
    "q12_priority_by_linestatus",
    """
    SELECT l.l_linestatus,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE year(l.l_shipdate) = 1997
    GROUP BY l.l_linestatus
    """,
)
def q_q12_priority_by_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 analog: conditional priority counts per line status for
    one shipment year. Year predicate prunes at the lineitem scan; the
    orders join carries only (orderkey, priority); one status-keyed agg."""
    li = load_table(spark, "lineitem", sf_dir).filter(
        F.year("l_shipdate") == 1997
    ).select("l_orderkey", "l_linestatus")
    o = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
    )



@query(
    "q16_supplier_counts",
    """
    SELECT p.p_brand, p.p_size,
           CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
    WHERE l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
    )
    GROUP BY p.p_brand, p.p_size
    """,
)
def q_q16_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 analog: distinct supplier counts per (brand, size),
    excluding a supplier blocklist via NOT IN — planned as a broadcast
    null-aware anti join against the tiny supplier subquery, then a
    two-phase distinct aggregate."""
    li = load_table(spark, "lineitem", sf_dir).select("l_partkey", "l_suppkey")
    part = load_table(spark, "part", sf_dir).select("p_partkey", "p_brand", "p_size")
    bad = load_table(spark, "supplier", sf_dir).filter(
        F.col("s_acctbal") < 0
    ).select(F.col("s_suppkey").alias("l_suppkey"))
    return (
        li.join(F.broadcast(bad), on="l_suppkey", how="anti")
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.count_distinct("l_suppkey").cast("long").alias("supplier_cnt"))
    )



@query(
    "q20_heavy_suppliers",
    """
    WITH eco AS (
        SELECT l.l_suppkey, sum(l.l_quantity) AS qty
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_type = 'ECONOMY'
        GROUP BY l.l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, round(e.qty, 2) AS qty
    FROM supplier s JOIN eco e ON s.s_suppkey = e.l_suppkey
    WHERE e.qty > (SELECT avg(qty) FROM eco)
    """,
)
def q_q20_heavy_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 analog: suppliers whose shipped quantity of one part
    class exceeds the class average — the per-supplier aggregate computes
    once and feeds both the output and the scalar average (broadcast
    single-row join), then joins supplier names broadcast."""
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    part = load_table(spark, "part", sf_dir).filter(
        F.col("p_type") == "ECONOMY"
    ).select("p_partkey")
    supp = load_table(spark, "supplier", sf_dir).select("s_suppkey", "s_name")
    eco = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    avg_qty = eco.agg(F.avg("qty").alias("__avg"))
    return (
        eco.crossJoin(F.broadcast(avg_qty))
        .filter(F.col("qty") > F.col("__avg"))
        .join(F.broadcast(supp), eco.l_suppkey == supp.s_suppkey)
        .select("s_suppkey", "s_name", F.round("qty", 2).alias("qty"))
    )
