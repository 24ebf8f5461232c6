"""Machine-check the driver-cert staleness-rotation policy.

The grading driver hash-certifies only the FIRST 50 registry entries per
round (see the _DRIVER_CAP_PRIORITY note in pyarrow_ops_spark/
entry_queries/__init__.py). The rotation discipline — refresh
oldest-first so no row's most recent driver cert ages past PERIOD
rounds — used to live only in a comment block; this test makes it a
failing check (the round-7 verdict's #1 ask).

Invariant (forward-looking, so it gates the FROZEN tree before the
upcoming driver round runs): once round R+1 completes, every registry
row must have a driver-green cert within the last PERIOD rounds
{R+2-PERIOD .. R+1}. Rows already green in that window need nothing;
every other row — including rows added this round that have never been
certified — must sit inside the first CAP entries of the registry so the
upcoming round certifies it. When this test fails, the fix is to rotate
the named rows into _DRIVER_CAP_PRIORITY (oldest-first), not to touch
the test.
"""

from __future__ import annotations

import glob
import json
import os
import re

CAP = 50
PERIOD = 4  # 185 rows / 50 slots per round -> period 4 is achievable

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _last_green_by_row() -> tuple[dict[str, int], int]:
    """Latest round each registry row was driver-green, and the latest
    round on disk. Green = no error, row counts match, and neither the
    schema nor the value-hash comparison failed (rows-only weak checks
    record nulls there, which still count as green-at-that-strength)."""
    last: dict[str, int] = {}
    latest = 0
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        # same guard as the registry loader: skip stray glob matches
        # (e.g. CORRECTNESS_r9_old.json) so both loaders stay congruent
        m = re.search(r"r(\d+)\.json$", path)
        if m is None:
            continue
        rnd = int(m.group(1))
        latest = max(latest, rnd)
        for name, rec in json.load(open(path)).items():
            green = (
                rec.get("err") is None
                and rec.get("rows_match") is True
                and rec.get("schema_match") is not False
                and rec.get("hash_match") is not False
            )
            if green:
                last[name] = max(last.get(name, 0), rnd)
    assert latest > 0, "no CORRECTNESS_r*.json found"
    return last, latest


def test_no_row_ages_past_period_after_upcoming_round():
    from pyarrow_ops_spark.entry_queries import QUERIES

    last, latest = _last_green_by_row()
    cap_rows = set(list(QUERIES)[:CAP])
    # after round latest+1 completes the allowed window is the last
    # PERIOD rounds, i.e. last_green >= floor below (cap rows get
    # latest+1 by construction)
    floor = latest + 2 - PERIOD
    stale = sorted(
        name
        for name in QUERIES
        if name not in cap_rows and last.get(name, 0) < floor
    )
    assert not stale, (
        f"{len(stale)} registry rows would exceed the {PERIOD}-round cert "
        f"staleness budget after round {latest + 1} and are not scheduled "
        f"in the driver cap — rotate them into _DRIVER_CAP_PRIORITY "
        f"(oldest-first): {stale}"
    )


def test_new_rows_enter_the_cap_immediately():
    """Any row added in round N (never driver-certified) must be
    certified by round N+1, i.e. sit in the upcoming cap."""
    from pyarrow_ops_spark.entry_queries import QUERIES

    last, _ = _last_green_by_row()
    cap_rows = set(list(QUERIES)[:CAP])
    never = sorted(n for n in QUERIES if n not in last and n not in cap_rows)
    assert not never, (
        f"never-certified rows outside the driver cap: {never}"
    )


def test_rotation_survives_synthetic_next_round():
    """The derived rotation must stay green when the NEXT round's
    CORRECTNESS file lands (the round-boundary red that recurred in r8 and
    r9). Simulate: assume the current cap goes green at round latest+1,
    re-derive the cap with that synthetic state, and assert both staleness
    invariants hold — repeatedly, PERIOD+2 rounds into the future."""
    from pyarrow_ops_spark.entry_queries import QUERIES, derive_cap_order

    last, latest = _last_green_by_row()
    names = list(QUERIES)
    green = dict(last)
    rnd = latest
    order = names
    for _ in range(PERIOD + 2):
        order = derive_cap_order(names, green, rnd, claims=[])
        cap_rows = set(order[:CAP])
        floor = rnd + 2 - PERIOD
        stale = [n for n in names if n not in cap_rows and green.get(n, 0) < floor]
        assert not stale, f"round {rnd + 1} derivation leaves stale rows: {stale}"
        # the synthetic driver round lands green for the cap rows
        rnd += 1
        for n in cap_rows:
            green[n] = rnd


def test_rotation_stays_feasible_next_round():
    """The NEXT round's mandatory load (rows that will be due once this
    round's cap lands green) must itself fit the cap — otherwise the
    policy is already doomed a round out and the period needs raising
    now, not then."""
    from pyarrow_ops_spark.entry_queries import QUERIES

    last, latest = _last_green_by_row()
    cap_rows = set(list(QUERIES)[:CAP])
    # post-upcoming-round state: cap rows green at latest+1
    post = {n: (latest + 1 if n in cap_rows else last.get(n, 0)) for n in QUERIES}
    next_floor = latest + 3 - PERIOD
    due_next = [n for n, g in post.items() if g < next_floor]
    assert len(due_next) <= CAP, (
        f"round {latest + 2} would owe {len(due_next)} refreshes > cap {CAP}"
    )


def test_derivation_degrades_instead_of_raising_on_overflow():
    """A driver round full of transient reds can make the mandatory set
    exceed the cap; the import-time derivation must DEGRADE (schedule the
    oldest cap-many rows) rather than raise — raising would brick every
    import, including the driver's entry(), exactly when recovery needs
    it. This test simulates 60 rows all past the window."""
    from pyarrow_ops_spark.entry_queries import derive_cap_order

    names = [f"q{i:03d}" for i in range(60)]
    last = {n: 1 for n in names}  # everything ancient
    order = derive_cap_order(names, last, latest_round=10, claims=["q059"])
    assert len(order) == 60  # full registry preserved
    assert order[:CAP] == sorted(names)[:CAP]  # oldest (tie: name) first
    assert len(set(order)) == 60


def test_capacity_policy_feasible_through_r16():
    """Cap-capacity policy (round-11, ARCHITECTURE.md; horizon extended
    r12->r14->r16 per the r13 verdict ask #4): the registry must fit the
    rotation with working slack through at least round 16.

    Feasibility has two faces:
    1. STATIC: R + GROWTH_BUDGET × rounds_to_14 <= CAP × PERIOD — the
       rotation can keep every row inside the window even if the registry
       grows at the full budget every round.
    2. DYNAMIC: simulate those rounds (cap goes green each round, the
       registry gains GROWTH_BUDGET synthetic never-certified rows per
       round) and assert the derived cap never leaves a stale row
       unscheduled AND always has >= GROWTH_BUDGET free slots after the
       mandatory set (new rows must enter the cap immediately).
    When this fails, fold more twice-certified rows (preferred) or raise
    PERIOD with the tradeoff documented — BEFORE the driver round, not
    after."""
    from pyarrow_ops_spark.entry_queries import QUERIES, derive_cap_order

    GROWTH_BUDGET = 3  # net new driver rows per round (additions - folds)
    TARGET_ROUND = 16

    last, latest = _last_green_by_row()
    names = list(QUERIES)
    rounds = max(0, TARGET_ROUND - latest)
    assert len(names) + GROWTH_BUDGET * rounds <= CAP * PERIOD, (
        f"registry {len(names)} + {GROWTH_BUDGET}/round × {rounds} rounds "
        f"exceeds the {CAP}×{PERIOD} certifiable ceiling — fold more rows"
    )

    green = dict(last)
    rnd = latest
    synth = list(names)
    for step in range(rounds):
        order = derive_cap_order(synth, green, rnd, claims=[])
        cap_rows = set(order[:CAP])
        floor = rnd + 2 - PERIOD
        stale = [n for n in synth if n not in cap_rows and green.get(n, 0) < floor]
        assert not stale, f"synthetic round {rnd + 1}: stale rows {stale}"
        mandatory = [n for n in synth if green.get(n, 0) < floor]
        # +1: one free slot per round is reserved for the folded
        # spot-recert row (cap-capacity policy, "folded != forgotten")
        assert len(mandatory) + GROWTH_BUDGET + 1 <= CAP, (
            f"synthetic round {rnd + 1}: mandatory load {len(mandatory)} "
            f"leaves < {GROWTH_BUDGET} free slots + 1 spot-recert slot"
        )
        # r13 verdict ask #4's banked-slack bar: the FIRST simulated
        # round (the upcoming round's successor, e.g. r15 when judged at
        # the r14 boundary) must owe <= 45 mandatory refreshes, i.e. the
        # folds must bank real slack, not just squeak under the cap
        if step == 1:
            assert len(mandatory) <= 45, (
                f"round {rnd + 1} mandatory load {len(mandatory)} > 45 — "
                f"fold more twice-certified rows this round"
            )
        rnd += 1
        for n in cap_rows:
            green[n] = rnd
        synth = synth + [f"__synthetic_r{rnd}_{i}" for i in range(GROWTH_BUDGET)]
