"""Differential pipeline fuzzing (SQLsmith-style, seeded): random
filter → (join) → groupby-agg pipelines composed through the PUBLIC
operator surface (`filters` / `join` / `groupby().agg`) are mirrored
into ANSI SQL and compared against DuckDB with the same
order-insensitive canonicalization as the oracle gate.

The point is the COMPOSITION: the per-operator oracles certify each
operator alone; the fuzzer exercises random stackings of them (predicate
pools over both fact tables, optional fact×fact join, random key sets
and agg dicts) where bugs live in the seams — clash-drop after a join,
agg over a filtered join, bare-name agg aliasing, null semantics.

Determinism rules (same policy as entry_queries): aggregation columns
are restricted to exact-valued expressions — count, min/max (order
statistics), sum/mean over INTEGRAL columns (exact in IEEE doubles at
this scale) — so no rounding slack is needed and any mismatch is a real
bug, not float noise. Seeds are fixed: a failure reproduces exactly.
"""

from __future__ import annotations

import random

import pytest

from pyarrow_ops_spark.operators.filters import filters
from pyarrow_ops_spark.operators.group import groupby
from pyarrow_ops_spark.operators.join import join
from pyarrow_ops_spark.sources.tables import load_table
from tests.conftest import ORACLE_SF_DIR, rows_to_set

# predicate pools: (column, op, literal-sampler)
ORDERS_PREDS = [
    ("o_orderstatus", "=", lambda r: r.choice(["F", "O", "P"])),
    ("o_orderstatus", "!=", lambda r: r.choice(["F", "O"])),
    ("o_orderkey", "<", lambda r: r.randrange(1_000, 60_000)),
    ("o_orderkey", ">=", lambda r: r.randrange(0, 30_000)),
    ("o_custkey", ">", lambda r: r.randrange(0, 1_500)),
    ("o_totalprice", ">", lambda r: float(r.randrange(10_000, 300_000))),
    ("o_totalprice", "<=", lambda r: float(r.randrange(100_000, 500_000))),
    (
        "o_orderpriority",
        "in",
        lambda r: r.sample(
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
            r.randrange(1, 3),
        ),
    ),
]
LINEITEM_PREDS = [
    ("l_quantity", "<=", lambda r: float(r.randrange(5, 50))),
    ("l_quantity", ">", lambda r: float(r.randrange(1, 40))),
    ("l_returnflag", "=", lambda r: r.choice(["A", "N", "R"])),
    ("l_returnflag", "not in", lambda r: [r.choice(["A", "N", "R"])]),
    ("l_linestatus", "in", lambda r: r.sample(["F", "O"], r.randrange(1, 3))),
    ("l_linenumber", ">=", lambda r: r.randrange(1, 5)),
    ("l_partkey", "<", lambda r: r.randrange(100, 2_000)),
]
ORDERS_KEYS = ["o_orderstatus", "o_orderpriority"]
LINEITEM_KEYS = ["l_returnflag", "l_linestatus", "l_linenumber"]
# (column, allowed aggs) — exact-valued only (see module docstring)
ORDERS_AGGS = [
    ("o_orderkey", ["count", "min", "max"]),
    ("o_custkey", ["count", "min", "max", "sum"]),
    ("o_totalprice", ["count", "min", "max"]),
]
LINEITEM_AGGS = [
    ("l_quantity", ["sum", "min", "max", "mean", "count"]),
    ("l_partkey", ["count", "min", "max", "sum"]),
    ("l_extendedprice", ["min", "max", "count"]),
]


def _sql_lit(v) -> str:
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, float):
        return repr(v)
    return str(v)


def _sql_pred(col: str, op: str, val) -> str:
    if op in ("in", "not in"):
        items = ", ".join(_sql_lit(v) for v in val)
        return f"{col} {'NOT IN' if op == 'not in' else 'IN'} ({items})"
    return f"{col} {op} {_sql_lit(val)}"


_SQL_AGG = {
    "count": "count({c})",
    "sum": "sum({c})",
    "min": "min({c})",
    "max": "max({c})",
    "mean": "avg({c})",
}


def _build_case(rng: random.Random):
    """One random pipeline spec -> (tables, preds, keys, aggs, sql)."""
    shape = rng.choice(["orders", "lineitem", "join"])
    if shape == "orders":
        pred_pool, key_pool, agg_pool = ORDERS_PREDS, ORDERS_KEYS, ORDERS_AGGS
        from_sql = "o_orders"
    elif shape == "lineitem":
        pred_pool, key_pool, agg_pool = LINEITEM_PREDS, LINEITEM_KEYS, LINEITEM_AGGS
        from_sql = "o_lineitem"
    else:
        pred_pool = ORDERS_PREDS + LINEITEM_PREDS
        key_pool = ORDERS_KEYS + LINEITEM_KEYS
        # post-join both tables' agg columns are available (minus the
        # dropped right key); exclude o_orderkey itself for clarity
        agg_pool = ORDERS_AGGS[1:] + LINEITEM_AGGS
        from_sql = "o_orders JOIN o_lineitem ON o_orderkey = l_orderkey"

    preds = []
    for col, op, sampler in rng.sample(pred_pool, rng.randrange(1, 3)):
        preds.append((col, op, sampler(rng)))
    keys = rng.sample(key_pool, rng.randrange(1, min(3, len(key_pool) + 1)))
    aggs = {}
    for col, allowed in rng.sample(agg_pool, rng.randrange(1, 3)):
        aggs[col] = rng.choice(allowed)

    # a HAVING-style post-agg filter on one of the agg outputs (the
    # filter-after-aggregate seam), half the time: count >= k is always
    # integer-exact in both engines
    having = None
    if rng.random() < 0.5:
        hcol = rng.choice([c for c, n in aggs.items() if n == "count"] or list(aggs))
        if aggs[hcol] == "count":
            having = (hcol, ">=", rng.randrange(1, 20))

    where = " AND ".join(_sql_pred(*p) for p in preds)
    select = ", ".join(keys) + ", " + ", ".join(
        _SQL_AGG[name].format(c=col) + f" AS {col}" for col, name in aggs.items()
    )
    sql = (
        f"SELECT {select} FROM {from_sql} WHERE {where} "
        f"GROUP BY {', '.join(keys)}"
    )
    if having is not None:
        sql += f" HAVING {_SQL_AGG[aggs[having[0]]].format(c=having[0])} >= {having[2]}"
    return shape, preds, keys, aggs, having, sql


@pytest.mark.parametrize("seed", range(25))
def test_fuzzed_pipeline_matches_duckdb(spark, duck, seed):
    rng = random.Random(seed)
    shape, preds, keys, aggs, having, sql = _build_case(rng)

    if shape == "orders":
        base = load_table(spark, "orders", ORACLE_SF_DIR)
    elif shape == "lineitem":
        base = load_table(spark, "lineitem", ORACLE_SF_DIR)
    else:
        orders = load_table(spark, "orders", ORACLE_SF_DIR)
        li = load_table(spark, "lineitem", ORACLE_SF_DIR).withColumnRenamed(
            "l_orderkey", "o_orderkey"
        )
        base = join(orders, li, on=["o_orderkey"])

    got = groupby(filters(base, preds), keys).agg(aggs)
    if having is not None:
        got = filters(got, having)  # filter-after-aggregate == HAVING
    scols = list(got.columns)
    srows = [tuple(r) for r in got.collect()]
    res = duck.execute(sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(scols) == sorted(dcols), (seed, sql)
    assert len(srows) == len(drows), (seed, sql, len(srows), len(drows))
    assert rows_to_set(scols, srows) == rows_to_set(dcols, drows), (seed, sql)
