"""as-of join semantics: backward/forward, exact-ts inclusion, no-match."""

from __future__ import annotations

import datetime as dt

import pytest

from pyarrow_ops_spark.operators.asof import asof_join


def ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def trades_quotes(spark):
    trades = spark.createDataFrame(
        [
            ("A", ts("2024-01-01 10:00:05"), 100.0),
            ("A", ts("2024-01-01 10:00:10"), 101.0),
            ("B", ts("2024-01-01 10:00:03"), 50.0),
            ("C", ts("2024-01-01 10:00:03"), 7.0),  # no quotes at all
        ],
        "sym string, t timestamp, px double",
    )
    quotes = spark.createDataFrame(
        [
            ("A", ts("2024-01-01 10:00:04"), 99.5),
            ("A", ts("2024-01-01 10:00:10"), 100.5),  # exact-ts match
            ("B", ts("2024-01-01 10:00:09"), 49.0),  # only after B's trade
        ],
        "sym string, t timestamp, bid double",
    )
    return trades, quotes


def test_backward_asof(trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(trades, quotes, on=["sym"], left_ts="t", right_ts="t")
    got = {(r.sym, r.px): r.bid_asof for r in out.collect()}
    assert got[("A", 100.0)] == 99.5
    assert got[("A", 101.0)] == 100.5  # exact ts included
    assert got[("B", 50.0)] is None  # quote only exists later
    assert got[("C", 7.0)] is None  # no right rows for key


def test_forward_asof(trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(
        trades, quotes, on=["sym"], left_ts="t", right_ts="t", direction="forward"
    )
    got = {(r.sym, r.px): r.bid_asof for r in out.collect()}
    assert got[("A", 100.0)] == 100.5  # next quote at/after 10:00:05
    assert got[("B", 50.0)] == 49.0
    assert got[("C", 7.0)] is None


def test_bad_direction_raises(trades_quotes):
    trades, quotes = trades_quotes
    with pytest.raises(ValueError, match="direction"):
        asof_join(trades, quotes, on=["sym"], left_ts="t", right_ts="t", direction="x")
