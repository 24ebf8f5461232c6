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


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
