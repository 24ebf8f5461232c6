"""Registry primitives for the per-family query modules.

QUERIES/ORACLES are populated by the @query decorator as each
family module imports; the package __init__ fixes driver-cap
order afterwards (see _reorder_registry there).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

# Folded rows (cap-capacity policy, ARCHITECTURE.md): near-redundant
# query/oracle pairs consolidated OUT of the driver-facing registry after
# >=2 driver-green certs, freeing rotation slots. They keep FULL
# differential coverage — tests/test_oracle_queries.py runs every folded
# row against its DuckDB oracle each CI run, and the builder sweeps
# include them — they just no longer consume driver-cap certification
# slots (each has a surviving sibling row exercising the same engine
# path in the driver registry).
FOLDED_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
FOLDED_ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def folded_query(name: str, oracle: str | None = None):
    """Register a consolidated row: oracle-checked by pytest/builder
    sweeps, absent from the driver registry (see FOLDED_QUERIES)."""

    def deco(fn):
        FOLDED_QUERIES[name] = fn
        if oracle is not None:
            FOLDED_ORACLES[name] = oracle
        return fn

    return deco
