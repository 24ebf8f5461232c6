"""Scale-trend benchmark: the headline queries at sf0.1 AND a derived
10x scale factor ("sf1"), to show how wall-time grows with data size.

The driver ships testdata only up to sf0.1, so the sf1 input is derived:
each table is unioned with itself 10x, shifting every id-like key by a
disjoint offset per replica (text/embedding payloads repeat, keys stay
unique — join/agg cardinalities scale like real data; dedup-family
queries see 10x corpora with 10x the planted-duplicate structure). Data
is staged once as parquet under /tmp/spark_graft_sf1 and reused.

For a linear-scale engine, per-query time at 10x data should grow well
under 10x on a fixed 32-core box ONLY for queries whose sf0.1 cost is
dominated by fixed overhead (job floor, codegen); scan/shuffle-bound
queries should grow ~linearly. Superlinear growth flags a plan that
would not survive 100 TB.

Run:  python benchmarks/scale_trend.py [query ...]
Prints one JSON line:
  {"sf0.1": {q: sec}, "sf1": {q: sec}, "ratio": {q: x}}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pyarrow_ops_spark.session import get_spark  # noqa: E402
from pyarrow_ops_spark.entry_queries import ALL_QUERIES as QUERIES  # noqa: E402
from pyarrow_ops_spark.sources.tables import TABLE_NAMES, load_table  # noqa: E402

SF01 = "/root/testdata/sf0.1"
SF1 = "/tmp/spark_graft_sf1"
REPLICAS = 10

# id-like columns to shift per replica so keys stay unique and join/agg
# cardinalities scale (FK columns shift with their PK so joins still hit)
_SHIFT = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey"],  # part/supp keys keep dims joinable
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    # region/nation: fixed-cardinality dims, replicated rows deduped
}

_OFFSET = 10_000_000


def build_sf1(spark) -> None:
    os.makedirs(SF1, exist_ok=True)
    for name in TABLE_NAMES:
        out = os.path.join(SF1, f"{name}.parquet")
        if os.path.exists(os.path.join(out, "_SUCCESS")):
            continue
        base = load_table(spark, name, SF01)
        if name in ("region", "nation"):
            base.write.mode("overwrite").parquet(out)
            continue
        shift_cols = _SHIFT.get(name, [])
        parts = []
        for r in range(REPLICAS):
            df = base
            for c in shift_cols:
                df = df.withColumn(c, F.col(c) + F.lit(r * _OFFSET))
            parts.append(df)
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        u.write.mode("overwrite").parquet(out)


DEFAULT_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q9_profit_by_nation_year",
    "join_inner_mxn",
    "groupby_sum_all",
    "window_topk",
    "dedup_exact_docs",
    "dedup_minhash_lsh",
    "dedup_winnow_pairs",
    "dedup_clusters_lsh",
    "embedding_near_dup_lsh",
    "similarity_threshold_join_lsh",
    "text_stats",
    "text_repetition_stats",
    "text_chunk_documents",
    "pipeline_llm_curation",
    "mix_sources_events",
    "order_pack_token_batches",
    # round-4 mid-round additions
    "search_bm25_topk",
    "text_unigram_nll",
    "zorder_events",
    "sample_weighted_events",
    "resample_events_dense",
    "diff_order_snapshots",
    "q21_sole_return_supplier",
    # round-4 session additions
    "semantic_dedup_planted",
    "search_tfidf_topk",
    "dedup_exact_normalized",
    "text_char_entropy",
    "order_curriculum",
    "events_rate_anomaly",
    "embedding_random_projection",
    # round-5/6 additions (r6 verdict ask #7): every non-streaming
    # first-time cert joins the trend set. Excluded with reasons:
    # dedup_simhash (its all-pairs certification harness is deliberately
    # sf-capped — production runs only the banded path, already trended
    # via dedup_minhash_lsh's shape), dedup_index_lifecycle (one-time
    # persisted-index build, not a scan/shuffle trend),
    # ml_cleaner_dict_roundtrip (driver-side serialization roundtrip),
    # streaming_* (availableNow over a fixed 4-file drop).
    "ml_nb_classifier",
    "orders_rfm_segments",
    "stats_winsorize_docs",
    "stats_robust_z_docs",
    "dedup_resolve_longest",
    "events_top_user_paths",
    "multimodal_dedup_binary",
    "text_bigram_pmi",
    "skew_first_n_salted",
    "stats_profile_documents",
    "histogram_equidepth_totalprice",
    "events_attribution_lasttouch",
    "events_conversion_firsttouch",
    "text_contamination_score",
    "text_strip_repeated_lines",
    "similarity_topk_ivf",
    "similarity_topk_lsh",
    # round-7 additions: bucketed fact×fact range join, salted join,
    # GROUPED_AGG pandas UDAF (per-group materialization is the shape
    # that deserves a 10x check; groups stay |returnflag×linestatus|)
    "range_join_bucketed_events",
    "skew_salted_join",
    "udaf_grouped_agg_geomean",
    # round-8 (r7 verdict ask #3): EVERY benched batch query gets a trend
    # entry — the 29 that were missing. With this block, trend coverage
    # == bench coverage (asserted by tests/test_registry.py's sibling
    # check in tests/test_bench_surface.py).
    "micro_pipeline",
    "join_broadcast_agg",
    "dedup_keep_first",
    "dedup_keep_drop",
    "groupby_median",
    "filters_conjunction",
    "json_str_to_table",
    "q5_nation_revenue",
    "q6_forecast_revenue",
    "supplier_nation_revenue",
    "range_join_price_bands",
    "asof_join_clicks",
    "events_sessionize",
    "similarity_topk_bruteforce",
    "sql_frontend_topn",
    "skew_salted_agg",
    "q13_order_count_distribution",
    "sample_stratified_events",
    "histogram_totalprice",
    "embedding_centroids",
    "mix_sources_exact",
    "multimodal_sample_frames",
    "mixture_weights_alpha",
    "merge_upsert_orders",
    "merge_scd2_orders",
    "events_funnel",
    "events_retention_cohorts",
    "skew_key_report",
    "pipeline_perplexity_filter",
    "dedup_cdc_chunks",
    "multimodal_audio_features",
    "similarity_knn_label_probe",
    "dedup_split_leakage",
    "dedup_decontaminate_near",
    # round-11: IVF-shortlist kNN probe (partition-pruned cell joins are
    # exactly the shape a 10x check should watch), hybrid RRF retrieval
    # (two ranker scans + bounded fusion), KS drift (union scan + one
    # bins-bounded aggregate)
    "similarity_knn_probe_indexed",
    "search_hybrid_rrf",
    "stats_ks_drift",
    # round-12: the drift-family completion — PSI (percentile agg +
    # bounded bin windows), per-group KS (grouped bounds broadcast +
    # partitioned bounded windows), chi2 (category-bounded groupBy)
    "stats_psi_drift",
    "stats_ks_drift_by_source",
    "stats_chi2_drift",
    # round-13: Wasserstein-1 (ks-shaped bounds+binning passes) and
    # embedding drift (posexplode partial-sum centroids + norm-KS)
    "stats_emd_drift",
    "stats_embedding_drift",
    # round-14: the one-call shared-scan drift report (melt + by-mode
    # monitors) and the map-only leakage-free split
    "stats_drift_report",
    "dedup_leakage_free_split",
]


def timed(spark, name: str, sf_dir: str) -> float:
    best = None
    for _ in range(2):  # record the steady-state (second) run, like bench.py
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = time.perf_counter() - t0
    spark.catalog.clearCache()
    return round(best, 3)


def main() -> None:
    names = sys.argv[1:] or DEFAULT_QUERIES
    spark = get_spark(app_name="scale_trend")
    build_sf1(spark)
    r01, r1, ratio = {}, {}, {}
    for n in names:
        r01[n] = timed(spark, n, SF01)
        r1[n] = timed(spark, n, SF1)
        ratio[n] = round(r1[n] / r01[n], 2) if r01[n] else None
    print(json.dumps({"sf0.1": r01, "sf1": r1, "ratio": ratio}))
    spark.stop()


if __name__ == "__main__":
    main()
