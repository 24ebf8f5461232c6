"""Pin the bench/trend surface contracts (r7 verdict asks #3 and #7).

- Every benched batch query must have a 10x scale-trend entry, so the
  sublinearity evidence can't silently lag behind bench coverage again
  (29 queries had no trend entry at the r7 audit).
- Every bench and trend name must exist in the registry — a renamed
  query that orphans its bench entry fails here instead of silently
  shrinking the benched set (bench.py filters unknown names).
"""

from __future__ import annotations


def test_every_benched_batch_query_has_a_trend_entry():
    from bench import BENCH_QUERIES
    from benchmarks.scale_trend import DEFAULT_QUERIES as TREND

    # streaming flows are benched separately (streaming_throughput in
    # bench_full.json) — availableNow over a fixed drop dir is not a
    # batch scan/shuffle trend
    missing = [
        q for q in BENCH_QUERIES
        if not q.startswith("streaming_") and q not in TREND
    ]
    assert not missing, f"benched queries without a 10x trend entry: {missing}"


def test_bench_and_trend_names_resolve_in_registry():
    from bench import BENCH_QUERIES
    from benchmarks.scale_trend import DEFAULT_QUERIES as TREND
    from pyarrow_ops_spark.entry_queries import ALL_QUERIES

    unknown = sorted((set(BENCH_QUERIES) | set(TREND)) - set(ALL_QUERIES))
    assert not unknown, f"bench/trend names not in the registry: {unknown}"


def test_no_duplicate_bench_or_trend_entries():
    from bench import BENCH_QUERIES
    from benchmarks.scale_trend import DEFAULT_QUERIES as TREND

    assert len(BENCH_QUERIES) == len(set(BENCH_QUERIES))
    assert len(TREND) == len(set(TREND))
