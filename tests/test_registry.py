"""Freeze the query-registry surface across the round-8 package split.

entry_queries was split from one 7,400-line module into per-family
modules (entry_queries/{relational,tpch,text,dedup,similarity,events,
pipeline_ml,stats_sampling,streaming_sources}.py) that populate the same
QUERIES/ORACLES dicts. These tests pin that the split changed NOTHING a
consumer can see: the exact 187-name set (frozen as a hash so an
accidental drop/rename fails loudly), every query oracle-backed, and the
driver-cap ordering contract intact.

When ADDING a query: update N_QUERIES and NAMES_SHA256 below (print the
new hash from the assertion message) — that is the deliberate act the
freeze exists to force.
"""

from __future__ import annotations

import hashlib

# sha256 over "\n".join(sorted(names)) — round 14:
# +stats_drift_report (the one-call long-format report, r14 shared-scan
# melt + by=['column'] engine, oracled as the UNION of the four
# certified oracle shapes), +dedup_leakage_free_split (map-only
# dedup-aware train/test split, md5-of-fingerprint bucket arithmetic),
# +streaming_chi2_monitor_ipc (categorical mirror of the certified KS
# streaming row: two availableNow runs, one checkpoint) — the three
# named r13-verdict candidates, exactly the <=3 budget. Folds -3 (the
# cap-capacity banking the r13 verdict asked for): dedup_minhash_lsh
# (engine path survives inside dedup_clusters_lsh), pipeline_llm_curation
# (superseded by pipeline_curation_v2 + perplexity_filter; constituents
# all individually certified), similarity_knn_label_probe (the indexed
# probe certifies the same output against the SAME oracle). Net growth 0;
# folded set 15 -> 18.
NAMES_SHA256 = "dec082c6c9d53ca6d232a6cf5a89da6d667f08e214e8ad8086413f8b783a18b0"
N_QUERIES = 186
FOLDED_SHA256 = "d184685e18a2f3ae1d29c107daced327172fb9deecc6bc1db812bb339822e8f7"
N_FOLDED = 18


def _names_hash(names) -> str:
    return hashlib.sha256("\n".join(sorted(names)).encode()).hexdigest()


def test_registry_name_set_frozen():
    # the driver-facing dict carries the 182 frozen rows PLUS the one
    # rotating folded spot-recert row (cap-capacity policy, "folded !=
    # forgotten") — the freeze applies to the surface minus that row
    from pyarrow_ops_spark.entry_queries import QUERIES, SPOT_RECERT_ROW

    names = set(QUERIES) - ({SPOT_RECERT_ROW} if SPOT_RECERT_ROW else set())
    got = _names_hash(names)
    assert len(names) == N_QUERIES and got == NAMES_SHA256, (
        f"registry surface changed: {len(names)} names, hash {got} — if "
        f"deliberate, update N_QUERIES/NAMES_SHA256 in this test"
    )


def test_spot_recert_row_is_the_oldest_folded_cert():
    """One folded row per round re-enters the driver registry in a free
    cap slot so folded driver certs stay bounded (~|folded|-round cycle).
    Pin: the selected row is the folded row with the OLDEST driver cert
    (name tiebreak) — except that a folded row named in the changed-path
    claims outranks vintage (its code changed; r15 policy extension) —
    it is oracle-backed, and it sits inside the cap."""
    from pyarrow_ops_spark.entry_queries import (
        FOLDED_QUERIES,
        ORACLES,
        QUERIES,
        SPOT_RECERT_ROW,
        _CHANGED_PATH_CLAIMS,
        pick_spot_recert,
    )
    from tests.test_cert_staleness import _last_green_by_row

    last, _ = _last_green_by_row()
    expected = pick_spot_recert(
        list(FOLDED_QUERIES), last, _CHANGED_PATH_CLAIMS
    )
    assert SPOT_RECERT_ROW == expected
    assert SPOT_RECERT_ROW in FOLDED_QUERIES
    assert SPOT_RECERT_ROW in ORACLES
    cap_rows = list(QUERIES)[:50]
    assert SPOT_RECERT_ROW in cap_rows


def test_every_query_is_oracle_backed():
    from pyarrow_ops_spark.entry_queries import ORACLES, QUERIES

    missing = sorted(set(QUERIES) - set(ORACLES))
    assert not missing, f"queries without a DuckDB oracle: {missing}"
    orphaned = sorted(set(ORACLES) - set(QUERIES))
    assert not orphaned, f"oracles without a query: {orphaned}"


def test_folded_rows_frozen_and_disjoint():
    """The folded set is a deliberate, frozen list: every folded row is
    oracle-backed, disjoint from the driver registry, and stays covered
    by the pytest oracle gate (test_oracle_queries iterates ALL_ORACLES)."""
    from pyarrow_ops_spark.entry_queries import (
        FOLDED_ORACLES,
        FOLDED_QUERIES,
        QUERIES,
    )

    from pyarrow_ops_spark.entry_queries import SPOT_RECERT_ROW

    got = _names_hash(FOLDED_QUERIES)
    assert len(FOLDED_QUERIES) == N_FOLDED and got == FOLDED_SHA256, (
        f"folded surface changed: {len(FOLDED_QUERIES)} names, hash {got} — "
        f"if deliberate, update N_FOLDED/FOLDED_SHA256"
    )
    # the only overlap allowed is the rotating spot-recert row
    overlap = set(FOLDED_QUERIES) & set(QUERIES)
    assert overlap == ({SPOT_RECERT_ROW} if SPOT_RECERT_ROW else set())
    assert set(FOLDED_ORACLES) == set(FOLDED_QUERIES)


def test_folded_rows_were_certified_twice_before_folding():
    """Fold eligibility (cap-capacity policy): a row may leave the driver
    registry only after >=2 driver-green certs on disk — folding is a
    certification graduation, never an escape hatch for a red row."""
    import glob
    import json
    import os
    import re

    from pyarrow_ops_spark.entry_queries import FOLDED_QUERIES, _repo_root

    greens: dict[str, int] = {}
    for path in glob.glob(os.path.join(_repo_root(), "CORRECTNESS_r*.json")):
        if re.search(r"r(\d+)\.json$", path) is None:
            continue
        for name, rec in json.load(open(path)).items():
            ok = (
                rec.get("err") is None
                and rec.get("rows_match") is True
                and rec.get("schema_match") is not False
                and rec.get("hash_match") is not False
            )
            if ok:
                greens[name] = greens.get(name, 0) + 1
    under = sorted(n for n in FOLDED_QUERIES if greens.get(n, 0) < 2)
    assert not under, f"folded rows with < 2 driver-green certs: {under}"


def test_driver_cap_prefix_matches_derived_order():
    """The registry prefix must equal the derived rotation (cap is no
    longer a hand list — it is computed from the CORRECTNESS files)."""
    from pyarrow_ops_spark.entry_queries import (
        _CHANGED_PATH_CLAIMS,
        _last_green_by_row,
        _repo_root,
        derive_cap_order,
        QUERIES,
        SPOT_RECERT_ROW,
    )

    last, latest = _last_green_by_row(_repo_root())
    assert latest > 0
    names = list(QUERIES)
    expected = derive_cap_order(
        sorted(names), last, latest, _CHANGED_PATH_CLAIMS, spot=SPOT_RECERT_ROW
    )
    assert names[:50] == expected[:50]
    assert len(set(names[:50])) == 50
    # claims must reference real registry rows (typos would silently no-op)
    assert set(_CHANGED_PATH_CLAIMS) <= set(names)


def test_family_modules_stay_under_size_budget():
    """The split's point: no module regrows into a monolith."""
    import os

    import pyarrow_ops_spark.entry_queries as eq

    pkg_dir = os.path.dirname(eq.__file__)
    for fn in os.listdir(pkg_dir):
        if not fn.endswith(".py"):
            continue
        n = sum(1 for _ in open(os.path.join(pkg_dir, fn)))
        assert n <= 1500, f"{fn} is {n} lines — split it further"
