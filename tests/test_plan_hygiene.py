"""Plan-shape assertions: the scale contract of each operator.

These tests pin the physical plan properties that make the engine viable
at 100 TB — if a refactor silently un-pushes a filter or turns a broadcast
join into a shuffle, they fail."""

from __future__ import annotations

import pytest

from pyarrow_ops_spark.entry_queries import ALL_QUERIES, QUERIES
from pyarrow_ops_spark.plans.inspect import (
    formatted_plan,
    has_broadcast_join,
    pushed_filters,
    shuffle_count,
)
from tests.conftest import SF_DIR


def test_filters_reach_parquet_scan(spark):
    df = QUERIES["filters_conjunction"](spark, SF_DIR)
    pushed = pushed_filters(df)
    assert "EqualTo(l_returnflag,A)" in pushed
    assert "LessThan(l_quantity,30.0)" in pushed
    assert "In(l_linestatus" in pushed


def test_q1_scan_prunes_columns(spark):
    df = QUERIES["q1_pricing_summary"](spark, SF_DIR)
    plan = formatted_plan(df)
    # only the 7 needed columns are read, not all 11
    assert "l_orderkey" not in plan.split("ReadSchema")[1].split("\n")[0]
    assert "LessThanOrEqual(l_shipdate" in pushed_filters(df)


def test_q1_single_shuffle(spark):
    # partial + final hash aggregate → exactly one exchange
    df = QUERIES["q1_pricing_summary"](spark, SF_DIR)
    assert shuffle_count(df) == 1


def test_dim_join_broadcasts(spark):
    assert has_broadcast_join(QUERIES["join_broadcast_agg"](spark, SF_DIR))
    assert has_broadcast_join(QUERIES["q5_nation_revenue"](spark, SF_DIR))


def test_dedup_uses_window_group_limit(spark):
    # Spark 3.5+ pushes a WindowGroupLimit below the exchange for
    # row_number()<=k — map-side pre-filtering of the dedup window
    df = ALL_QUERIES["dedup_keep_first"](spark, SF_DIR)
    assert "WindowGroupLimit" in formatted_plan(df)


def test_keep_drop_is_aggregate_not_window(spark):
    # keep='drop' must be the map-side-combinable aggregate, never the
    # unbounded-frame window count (no WindowGroupLimit pushdown exists
    # for aggregation frames; the window shape measured 37x task at 10x
    # data in the r8 sf1 validation). first(struct) carries a
    # struct-typed buffer, so Spark compiles it to a partial+final
    # SortAggregate — still no per-group window buffers, and the partial
    # side collapses duplicate mass before the exchange.
    df = QUERIES["dedup_keep_drop"](spark, SF_DIR)
    plan = formatted_plan(df)
    assert "Window" not in plan
    assert "SortAggregate" in plan or "HashAggregate" in plan


def test_curation_dedup_is_hash_aggregate_not_window(spark):
    # the fingerprint-dedup stage rides min_by(struct, doc_id) — one
    # hash aggregate; a window row_number here pays sort + per-group
    # buffers over millions of tiny fp groups (r8 sf10 validation)
    df = ALL_QUERIES["pipeline_llm_curation"](spark, SF_DIR)
    assert "Window" not in formatted_plan(df)


def test_sort_limit_is_take_ordered(spark):
    df = QUERIES["sort_limit_topn"](spark, SF_DIR)
    assert "TakeOrderedAndProject" in formatted_plan(df)


def test_exact_dedup_shuffles_digest_not_text(spark):
    from pyarrow_ops_spark.plans.inspect import plan_nodes

    df = QUERIES["dedup_exact_docs"](spark, SF_DIR)
    # the exchange carries the md5 fingerprint, not the text column
    exchanges = [b for name, b in plan_nodes(df) if name == "Exchange"]
    assert exchanges, "expected a hash exchange in the plan"
    assert all("text#" not in b for b in exchanges)


def test_asof_join_single_shuffle(spark):
    # union + window ⇒ one hash exchange on the key, no range join blowup
    df = QUERIES["asof_join_clicks"](spark, SF_DIR)
    plan = formatted_plan(df)
    assert "Window" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_q6_all_predicates_pushed(spark):
    df = QUERIES["q6_forecast_revenue"](spark, SF_DIR)
    pushed = pushed_filters(df)
    for frag in ("l_shipdate", "l_discount", "LessThan(l_quantity,24.0)"):
        assert frag in pushed, f"{frag} not pushed: {pushed}"


def test_range_join_broadcasts_interval_dim(spark):
    # fact side must NOT shuffle: the price bands are disjoint, so the
    # r15 rewrite computes the band index via a codegen CASE chain and
    # plans a Broadcast HASH join (the interpreted nested loop was
    # 12.6 s of task time at sf0.1), then one exchange for the final
    # aggregation
    df = QUERIES["range_join_price_bands"](spark, SF_DIR)
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert shuffle_count(df) == 1


def test_supplier_rollup_broadcasts_both_dims(spark):
    from pyarrow_ops_spark.plans.inspect import plan_nodes

    df = QUERIES["supplier_nation_revenue"](spark, SF_DIR)
    joins = [n for n, _ in plan_nodes(df) if "Join" in n]
    assert joins == ["BroadcastHashJoin", "BroadcastHashJoin"]
    assert shuffle_count(df) == 1  # only the final aggregation shuffles


def test_string_funcs_map_only(spark):
    # pure scalar expressions: no exchange anywhere in the plan
    df = QUERIES["string_funcs"](spark, SF_DIR)
    assert shuffle_count(df) == 0


def test_ml_impute_transform_map_only(spark):
    # after fit, the transform is a map-only projection over the scan
    df = QUERIES["ml_impute_clip"](spark, SF_DIR)
    assert shuffle_count(df) == 0


def test_embedding_lsh_near_dup_no_quadratic_join(spark):
    # the LSH decision path must never fall back to a cartesian/nested-loop
    # pair join — candidates come from the bucket-local explode
    df = QUERIES["embedding_near_dup_lsh"](spark, SF_DIR)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_sql_frontend_topn_window_group_limit_and_broadcast(spark):
    # the SQL front door gets the same physical plan quality as the
    # DataFrame API: map-side WindowGroupLimit below the window shuffle,
    # broadcast join on the customer dim
    df = ALL_QUERIES["sql_frontend_topn"](spark, SF_DIR)
    plan = formatted_plan(df)
    assert "WindowGroupLimit" in plan
    assert "BroadcastHashJoin" in plan


def test_ngram_overlap_broadcasts_eval_grams(spark):
    # eval-side gram set broadcasts: the train corpus must NOT shuffle its
    # exploded grams to meet the eval set — only the per-doc match counts
    # go through an exchange (1 for the broadcast-build distinct + 1 agg)
    df = QUERIES["dedup_ngram_overlap"](spark, SF_DIR)
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_sample_per_key_window_group_limit(spark):
    # rank<=k is pushed map-side below the key exchange: each partition
    # ships at most k rows per local group, not whole groups
    df = QUERIES["sample_per_key_events"](spark, SF_DIR)
    assert "WindowGroupLimit" in formatted_plan(df)


def test_token_budget_single_exchange(spark):
    # one hash exchange on the stratum column for the running-sum window;
    # everything else is map-side
    df = QUERIES["sample_token_budget"](spark, SF_DIR)
    assert shuffle_count(df) == 1


def test_quality_filter_map_only(spark):
    # pure scalar rules: no aggregation/sort exchange anywhere. The single
    # permitted exchange is spread()'s RoundRobin repartition, which fires
    # only when the scan can't saturate the cores (true at test SF, a
    # no-op at 100 TB where the scan has plenty of splits).
    df = ALL_QUERIES["text_quality_filter"](spark, SF_DIR)
    plan = formatted_plan(df)
    assert shuffle_count(df) <= 1
    assert "hashpartitioning" not in plan and "rangepartitioning" not in plan
    assert "Sort" not in plan and "HashAggregate" not in plan


def test_winnow_pairs_no_quadratic_join(spark):
    # candidates come from the fingerprint inverted index, never a
    # cartesian pair join
    df = QUERIES["dedup_winnow_pairs"](spark, SF_DIR)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_duplicated_spans_shuffles_hashes_not_text(spark):
    # the positional-gram exchange carries (xxhash64, id, pos) — gram text
    # and document text must never reach a shuffle; no pairwise joins
    from pyarrow_ops_spark.plans.inspect import plan_nodes

    df = QUERIES["dedup_duplicated_spans"](spark, SF_DIR)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    exchanges = [b for name, b in plan_nodes(df) if name == "Exchange"]
    assert exchanges, "expected hash exchanges in the plan"
    assert all("text#" not in b and "gram#" not in b for b in exchanges)


def test_decontaminate_bloom_clean_path_never_shuffles_text(spark):
    # the non-candidate branch is scan -> bloom probe -> filter (map-only);
    # only Bloom candidates reach the digest anti-join, and that join key
    # is the md5 fingerprint, not the text
    from pyarrow_ops_spark.plans.inspect import plan_nodes

    df = QUERIES["dedup_decontaminate_bloom"](spark, SF_DIR)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    exchanges = [b for name, b in plan_nodes(df) if name == "Exchange"]
    assert all("text#" not in b for b in exchanges)


def test_dynamic_partition_pruning_fires(spark, tmp_path):
    """Joining a partitioned fact to a filtered dim must inject a dynamic
    partition pruning subquery — at 100 TB this is the difference between
    scanning every date partition and only the ones the dim selects."""
    import os
    from pyspark.sql import functions as F
    from tests.conftest import SF_DIR

    orders = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))
    fact = str(tmp_path / "orders_by_year")
    orders.withColumn("o_year", F.year("o_orderdate")).write.partitionBy(
        "o_year"
    ).parquet(fact)
    dim_path = str(tmp_path / "year_dim")
    spark.createDataFrame(
        [(y, "keep" if y == 1996 else "drop") for y in range(1995, 2002)],
        ["o_year", "tag"],
    ).write.parquet(dim_path)

    # DPP preconditions: the partitioned fact must be the PROBE side (keep
    # it off the broadcast path) and the dim must carry a selective filter
    # and be broadcast (reuseBroadcastOnly, the default, reuses the dim's
    # broadcast as the pruning subquery).
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1KB")
        dim = spark.read.parquet(dim_path).filter(F.col("tag") == "keep")
        f = spark.read.parquet(fact)
        j = f.join(F.broadcast(dim), on="o_year").groupBy("tag").count()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "dynamicpruning" in plan.lower(), plan[:2000]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_upsert_small_delta_broadcasts_anti_join(spark):
    # incremental merge: tiny delta vs big base must be a broadcast
    # anti-join (no base shuffle), not a sort-merge exchange of the base
    from pyarrow_ops_spark.operators.diff import upsert
    from pyarrow_ops_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    orders = load_table(spark, "orders", SF_DIR)
    delta = orders.filter(F.col("o_orderkey") % 1000 == 0)
    merged = upsert(orders, delta, ["o_orderkey"])
    plan = formatted_plan(merged)
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "SortMergeJoin" not in plan


def test_funnel_step_filters_pushed_to_scan(spark):
    # build with lineage intact: the production localCheckpoint hides the
    # scans from the inspected plan once a previous test materialized it
    from pyarrow_ops_spark.operators.events import funnel_steps
    from pyarrow_ops_spark.sources.tables import load_table

    ev = load_table(spark, "events", SF_DIR)
    df = funnel_steps(
        ev, ["view", "click", "purchase"], truncate_lineage=False
    )
    pushed = pushed_filters(df)
    # each funnel stage scans only its own event type
    assert "EqualTo(event_type,view)" in pushed
    assert "EqualTo(event_type,click)" in pushed
    assert "EqualTo(event_type,purchase)" in pushed


def test_mixture_weights_no_raw_table_shuffle(spark):
    # the raw table shuffles ONCE (the per-stratum count agg); the only
    # other exchanges are SinglePartition scalar folds over |strata| rows
    # and broadcasts of the single-row totals — never a join shuffle
    df = QUERIES["mixture_weights_alpha"](spark, SF_DIR)
    plan = formatted_plan(df)
    assert "SortMergeJoin" not in plan
    assert shuffle_count(df) <= 3
    assert plan.count("BroadcastExchange") >= 2


def test_scd2_closed_history_not_joined(spark):
    # the close join must sit above the is_current filter, and a small
    # update side must broadcast
    df = QUERIES["merge_scd2_orders"](spark, SF_DIR)
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_range_join_bucketed_is_equi_join(spark):
    # the big×big rewrite must plan a hash/sort-merge EQUI-join on the
    # grid cell — never a nested loop or cartesian — with the interval
    # predicate applied as a post-join filter
    df = QUERIES["range_join_bucketed_events"](spark, SF_DIR)
    plan = formatted_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) or (
        "BroadcastHashJoin" in plan
    )


def test_runtime_bloom_filter_injects_on_selective_join(spark):
    # the 100 TB shape: a selectively-filtered build side injects a
    # bloom runtime filter into the probe-side SCAN, so a sort-merge
    # join reads a fraction of the fact table. Enabled by default in the
    # session factory (Spark 4 default); thresholds lowered here because
    # sf0.1 scans are below the production applicationSide threshold.
    from pyspark.sql import functions as F

    from pyarrow_ops_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        orders = load_table(spark, "orders", SF_DIR).filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        li = load_table(spark, "lineitem", SF_DIR)
        j = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_banded_dedup_plans_are_arrow_batched_and_observed(spark):
    """Round-9 scale contract: both banded pair generators run their
    dense numeric stage as ONE Arrow batch (MapInPandas — never
    interpreted per-element lambdas), carry the bucket-drop Observation
    (CollectMetrics), and contain no cartesian product."""
    from pyarrow_ops_spark.functions.dedup import minhash_lsh_pairs, winnow_pairs
    from pyarrow_ops_spark.sources.tables import load_table

    docs = load_table(spark, "documents", SF_DIR)
    for fn, kwargs in (
        (minhash_lsh_pairs, dict(threshold=0.8, n=5)),
        (winnow_pairs, dict(threshold=0.5, k=16, window=16)),
    ):
        plan = (
            fn(docs, assume_dups=False, **kwargs)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "MapInPandas" in plan, fn.__name__
        assert "CollectMetrics" in plan, fn.__name__
        assert "CartesianProduct" not in plan, fn.__name__


def test_knn_probe_exact_is_one_block_cartesian_gemm(spark):
    """Round-10 verdict ask #6: the exact kNN probe's plan must stay the
    block-matrix shape — exactly ONE cartesian (of the two BLOCK
    relations, each ~n/block_size rows, never raw rows) feeding an Arrow
    GEMM stage (MapInPandas). A refactor that reintroduces the
    interpreted Catalyst self-join (52 s at sf0.1 vs ~2 s) fails here."""
    from pyarrow_ops_spark.functions.similarity import knn_label_probe
    from pyarrow_ops_spark.sources.tables import load_table

    emb = load_table(spark, "embeddings", SF_DIR)
    plan = (
        knn_label_probe(emb, k=5, n_rows=500)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the block cross join compiles to CartesianProduct or, when one
    # block relation is small enough to broadcast, BroadcastNestedLoopJoin
    n_cross = plan.count("CartesianProduct") + plan.count(
        "BroadcastNestedLoopJoin"
    )
    assert n_cross == 1, plan
    assert "MapInPandas" in plan


def test_knn_probe_exact_n_rows_skips_count_job(spark):
    """Passing n_rows must build the plan with ZERO jobs run (the r10
    verdict's extra-count nit): track jobs via the statusTracker."""
    from pyarrow_ops_spark.functions.similarity import knn_label_probe
    from pyarrow_ops_spark.sources.tables import load_table

    emb = load_table(spark, "embeddings", SF_DIR)
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    knn_label_probe(emb, k=5, n_rows=500)  # plan only, no action
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert after == before


def test_knn_probe_indexed_has_no_cartesian(spark, tmp_path):
    """The IVF-shortlist probe joins blocks ON THE CELL KEY: no cartesian
    anywhere, Arrow GEMM present, centroids broadcast."""
    from pyarrow_ops_spark.functions.similarity import (
        build_ivf_index,
        knn_label_probe_indexed,
    )
    from pyarrow_ops_spark.sources.tables import load_table

    emb = load_table(spark, "embeddings", SF_DIR)
    idx = str(tmp_path / "ivf_probe_idx")
    build_ivf_index(emb, idx, n_clusters=4)
    plan = (
        knn_label_probe_indexed(spark, idx, emb, k=5, n_probe=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # no non-broadcast cartesian anywhere; the only cross joins are the
    # centroid probes (broadcast build side = n_clusters rows)
    assert "CartesianProduct" not in plan
    for line in plan.splitlines():
        if "BroadcastNestedLoopJoin" in line:
            assert "Cross" in line and "Build" in line, line
    assert "MapInPandas" in plan
    assert "BroadcastExchange" in plan
    # the block pairing is an EQUI join on the cell key
    import re

    assert re.search(r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \[cluster", plan)


def test_ks_drift_scan_floor_and_pushdown(spark):
    """stats_ks_drift: the slice filters reach the parquet scan and the
    plan holds the two-scans-per-slice floor (min/max pass + binning
    pass; slice sizes come from the bounded counts relation, never a
    third stats pass). Fixed lo/hi bounds drop to one scan per slice."""
    from pyarrow_ops_spark.entry_queries import ALL_QUERIES
    from pyarrow_ops_spark.functions.stats import ks_drift
    from pyarrow_ops_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    plan = (
        ALL_QUERIES["stats_ks_drift"](spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("FileScan parquet") == 4
    assert "o_orderstatus" in plan.split("FileScan")[1]  # filter pushed
    assert "CartesianProduct" not in plan

    o = load_table(spark, "orders", SF_DIR)
    fixed = ks_drift(
        o.filter(F.col("o_orderstatus") == "F"),
        o.filter(F.col("o_orderstatus") == "O"),
        "o_totalprice",
        lo=0.0,
        hi=1e6,
    )
    fplan = fixed._jdf.queryExecution().executedPlan().toString()
    assert fplan.count("FileScan parquet") == 2


def test_hybrid_rrf_no_cartesian_bounded_windows(spark):
    """search_hybrid_rrf: per-ranker cuts are TakeOrderedAndProject (the
    distributed top-k), no cartesian (the cosine ranker's query side is a
    broadcast), and each row_number window consumes a LIMIT relation so
    the single-partition windows are bounded by construction."""
    from pyarrow_ops_spark.entry_queries import ALL_QUERIES

    plan = (
        ALL_QUERIES["search_hybrid_rrf"](spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert plan.count("TakeOrderedAndProject") >= 3
    for line in plan.splitlines():
        if "BroadcastNestedLoopJoin" in line:
            assert "Cross" in line and "Build" in line, line


def test_psi_drift_scan_floor_and_pushdown(spark):
    """stats_psi_drift: slice filters reach the scan, and the plan holds
    the one-percentile-pass + one-binning-pass floor (reference scanned
    twice — cuts + union arm — comparison once); the cuts relation joins
    back broadcast, never a cartesian."""
    from pyarrow_ops_spark.entry_queries import ALL_QUERIES

    plan = (
        ALL_QUERIES["stats_psi_drift"](spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("FileScan parquet") == 3
    assert "o_orderstatus" in plan.split("FileScan")[1]  # filter pushed
    assert "CartesianProduct" not in plan
    assert "BroadcastExchange" in plan


def test_chi2_drift_bounded_shuffle_and_pushdown(spark):
    """stats_chi2_drift: one scan per slice, category counts come from a
    map-side-combinable HashAggregate (partial_sum before the exchange),
    and slice totals broadcast back onto the counts relation — NO window
    anywhere (r12 verdict: the old unpartitioned full-frame window
    funneled every category through one partition; fine at language-mix
    cardinality, a cliff on a million-distinct column) and no
    corpus-keyed exchange after the category aggregate. The totals agg
    consumes the SAME category-aggregate exchange as the counts side
    (ReuseExchange), so the corpus is still scanned exactly once per
    slice — asserted on the POST-EXECUTION final adaptive plan, where
    the reuse is materialized."""
    from pyarrow_ops_spark.entry_queries import ALL_QUERIES

    df = ALL_QUERIES["stats_chi2_drift"](spark, SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert "CartesianProduct" not in plan
    assert "partial_sum" in plan  # map-side combine on category counts
    assert "Window" not in plan  # totals are a broadcast agg, not a funnel
    assert "BroadcastExchange" in plan
    # the duplicated counts subtree dedupes to one physical exchange:
    # scan + partial agg run once, shared by counts and totals
    assert "ReusedExchange" in plan


def test_emd_drift_scan_floor_and_pushdown(spark):
    """stats_emd_drift: the ks_drift plan shape — one bounds pass + one
    binning pass per slice (4 scans total, the floor for data-derived
    bounds), slice filters pushed to the scan, bounds broadcast back
    (never a cartesian), and exactly ONE window operator over the
    64-bounded counts relation (lead + cum/total sums share it)."""
    from pyarrow_ops_spark.entry_queries import ALL_QUERIES

    plan = (
        ALL_QUERIES["stats_emd_drift"](spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("FileScan parquet") == 4
    assert "o_orderstatus" in plan.split("FileScan")[1]  # filter pushed
    assert "CartesianProduct" not in plan
    assert "BroadcastExchange" in plan
    assert plan.count("Window") == 1  # bins-bounded, never corpus-keyed
    # the unpartitioned window's bound is STRUCTURAL, not data-dependent:
    # its input subtree is the aggregate keyed on the clamped bin column
    # (bin = greatest(0, least(bins-1, ...)) -> <= bins rows can exist),
    # so the single-partition frame never exceeds `bins` rows
    lines = plan.splitlines()
    widx = next(i for i, ln in enumerate(lines) if "Window" in ln)
    below = "\n".join(lines[widx:])
    assert "keys=[bin" in below  # window consumes the bin-keyed aggregate


def test_drift_report_scan_count_is_column_count_independent(spark):
    """The r14 shared-scan contract: a drift_report over C numeric
    columns costs the SAME number of scans as over one column — the melt
    (map-only inline) rides each monitor's existing passes, so the plan
    holds 11 FileScans (KS bounds+binning = 4, EMD the same = 4, PSI
    cuts+binning = 3) whether C = 1 or C = 4, with every window
    per-column-partitioned over bounded counts and no cartesian. The
    pre-r14 per-column dispatch scanned ~11C times."""
    from pyarrow_ops_spark.functions.stats import drift_report
    from pyarrow_ops_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    li = load_table(spark, "lineitem", SF_DIR)
    a = li.filter(F.col("l_returnflag") == "N")
    b = li.filter(F.col("l_returnflag") != "N")
    counts = {}
    for cols in (
        ["l_quantity"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
    ):
        plan = (
            drift_report(a, b, numeric=cols)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        counts[len(cols)] = plan.count("FileScan parquet")
        assert "CartesianProduct" not in plan
    assert counts[1] == counts[4] == 11


def test_embedding_drift_partial_agg_and_no_cartesian(spark):
    """stats_embedding_drift: the posexplode fan-out collapses through a
    map-side partial aggregate BEFORE any exchange (the shuffle carries
    ~2 x dim partial sums per task, constant in corpus size), the
    one-row cos relation attaches via broadcast (no cartesian), and the
    only window runs over the <=64-row binned-norm counts."""
    from pyarrow_ops_spark.entry_queries import ALL_QUERIES

    plan = (
        ALL_QUERIES["stats_embedding_drift"](spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Generate" in plan  # posexplode present...
    assert "partial_sum" in plan  # ...but partially aggregated map-side
    assert "CartesianProduct" not in plan
    assert "BroadcastExchange" in plan
    assert plan.count("Window") == 1
