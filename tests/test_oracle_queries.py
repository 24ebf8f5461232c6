"""Differential test: every registered query vs its DuckDB oracle at sf0.01.

Mimics the driver's correctness gate (row-count + column names +
order-insensitive value comparison) so failures surface here first.
FOLDED rows (cap-capacity policy) stay in this gate forever — folding
removes a row from the driver registry, never from differential
coverage.
"""

from __future__ import annotations

import pytest

from pyarrow_ops_spark.entry_queries import (
    ALL_ORACLES,
    ALL_QUERIES,
    ORACLES,
    QUERIES,
)
from tests.conftest import ORACLE_SF_DIR, assert_matches_oracle

ORACLE_CASES = sorted(ALL_ORACLES)


@pytest.mark.parametrize("name", ORACLE_CASES)
def test_query_matches_oracle(spark, duck, name):
    sdf = ALL_QUERIES[name](spark, ORACLE_SF_DIR)
    # rewrite table refs to the sf0.01-prefixed views registered in conftest
    sql = ALL_ORACLES[name]
    for t in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ):
        sql = _rewrite_table(sql, t)
    assert_matches_oracle(sdf, duck, sql)


def _rewrite_table(sql: str, table: str) -> str:
    import re

    # FROM/JOIN table -> FROM/JOIN o_table (sf0.01 views)
    return re.sub(
        rf"\b(FROM|JOIN)\s+{table}\b", rf"\1 o_{table}", sql, flags=re.IGNORECASE
    )


@pytest.mark.parametrize("name", sorted(set(ALL_QUERIES) - set(ALL_ORACLES)))
def test_query_runs_rows_only(spark, name):
    sdf = ALL_QUERIES[name](spark, ORACLE_SF_DIR)
    assert sdf.count() >= 0


def test_architecture_doc_counts_in_sync():
    """ARCHITECTURE.md's correctness section states the registry size; the
    r4 verdict flagged it rotting. Parse and compare so doc and code
    can't drift again."""
    import os
    import re

    doc = open(
        os.path.join(os.path.dirname(__file__), "..", "ARCHITECTURE.md")
    ).read()
    m = re.search(r"exposes (\d+) queries \((\d+) oracle-backed", doc)
    assert m, "ARCHITECTURE.md correctness section missing the counts line"
    assert int(m.group(1)) == len(QUERIES), (
        f"ARCHITECTURE.md says {m.group(1)} queries, registry has "
        f"{len(QUERIES)} — update the doc"
    )
    assert int(m.group(2)) == len(ORACLES), (
        f"ARCHITECTURE.md says {m.group(2)} oracle-backed, registry has "
        f"{len(ORACLES)} — update the doc"
    )
