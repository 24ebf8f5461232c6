"""pyarrow_ops_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of TomScheffers/pyarrow_ops, re-expressed
Spark-first.

The reference (``/root/reference``, pyarrow_ops v0.0.8) exposes five
relational operators over eager in-memory ``pyarrow.Table``s
(``pyarrow_ops/__init__.py:1-4`` in the reference): ``filters``,
``drop_duplicates``, ``groupby``, ``join``, ``head`` — plus a JSON-string
parser (``jsons.py``) and an ML preprocessing class ``TableCleaner``
(``ml.py``). This package re-expresses those *semantics* over lazy,
distributed ``pyspark.sql.DataFrame``s: every operator builds a Catalyst
logical plan and lets the optimizer pick the physical strategy (predicate
pushdown, broadcast-vs-sort-merge joins, partial aggregation, AQE).

Beyond the reference surface it adds the operators a large-scale
training-data pipeline needs: exact and near-duplicate detection (MinHash-
LSH, SimHash, n-gram Jaccard), embedding similarity search, text analysis,
multimodal (binary) column plumbing, and a Structured Streaming slice.
"""

from pyarrow_ops_spark.session import get_spark, stop_spark
from pyarrow_ops_spark.sources.tables import (
    load_table,
    load_tables,
    register_views,
    read_binary_files,
    sql,
    read_source,
    write_sink,
    write_training_shards,
)
from pyarrow_ops_spark.sources.bucketing import read_bucketed, write_bucketed
from pyarrow_ops_spark.operators.filters import filters, compile_predicate
from pyarrow_ops_spark.operators.dedup import drop_duplicates
from pyarrow_ops_spark.operators.group import groupby, Grouping
from pyarrow_ops_spark.operators.join import join, range_join
from pyarrow_ops_spark.operators.asof import asof_join
from pyarrow_ops_spark.operators.skew import key_skew_report, salted_agg, salted_join
from pyarrow_ops_spark.operators.head import head
from pyarrow_ops_spark.functions.jsons import str_to_table
from pyarrow_ops_spark.ml.cleaner import TableCleaner
from pyarrow_ops_spark.operators.window import top_k, running_agg, lag_lead
from pyarrow_ops_spark.functions.dedup import (
    dedup_exact,
    exact_duplicates,
    jaccard_pairs,
    minhash_lsh_pairs,
    minhash_lsh_edges,
    dedup_clusters,
    simhash,
    winnow_pairs,
    simhash_pairs,
    decontaminate,
    build_dedup_index,
    dedup_against_index,
    decontaminate_bloom,
    duplicated_spans,
    strip_duplicated_spans,
    ngram_overlap,
    ngram_decontaminate,
)
from pyarrow_ops_spark.operators.sample import (
    sample_hash,
    sample_stratified,
    sample_per_key,
    token_budget_sample,
    mix_sources,
    mixture_weights,
    split_by_key,
    weighted_sample,
)
from pyarrow_ops_spark.functions.ordering import (
    assign_row_ids,
    deterministic_shuffle,
    shuffle_key,
    pack_token_batches,
    curriculum_order,
)
from pyarrow_ops_spark.functions.search import (
    bm25_topk,
    bm25_topk_indexed,
    build_text_index,
    tfidf_topk,
    unigram_nll,
    bigram_nll,
)
from pyarrow_ops_spark.sources.zorder import (
    zorder_key,
    write_zordered,
    morton_interleave,
    compact_files,
)
from pyarrow_ops_spark.operators.resample import (
    resample,
    time_bucket,
    gaps,
)
from pyarrow_ops_spark.operators.diff import diff_tables, diff_summary, upsert, upsert_history
from pyarrow_ops_spark.operators.events import funnel_steps, retention_cohorts
from pyarrow_ops_spark.functions.graph import pagerank
from pyarrow_ops_spark.sources.arrow_ipc import read_arrow_ipc, register_arrow_ipc
from pyarrow_ops_spark.functions.stats import (
    zscore,
    outlier_filter,
    quantile_rank,
    ks_drift,
    psi_drift,
    chi2_drift,
    emd_drift,
    embedding_drift,
    drift_report,
)
from pyarrow_ops_spark.functions.similarity import (
    lsh_threshold_join,
    quantize_embeddings,
    cosine_topk,
    similarity_join,
    lsh_topk,
    ivf_topk,
    build_ivf_index,
    ivf_topk_indexed,
    embedding_near_dup,
    embedding_lsh_pairs,
    embedding_lsh_edges,
    embedding_dedup_clusters,
    semantic_dedup,
    semantic_dedup_pairs,
    project_embeddings,
    random_projection_matrix,
)
from pyarrow_ops_spark.functions.text import (
    winnowed_fingerprints,
    vocab_topk,
    text_stats,
    token_count,
    quality_score,
    quality_filter,
    lang_guess,
    fingerprint,
    normalize_text,
    source_report,
    char_entropy,
)
from pyarrow_ops_spark.functions.multimodal import (
    with_media_metadata,
    extract_features,
)
from pyarrow_ops_spark.streaming.windows import (
    tumbling_counts,
    sliding_counts,
    sessionize_batch,
    stream_tumbling_counts,
    stream_dedup,
)
from pyarrow_ops_spark.streaming.stateful import (
    running_user_totals,
    stream_events,
    stream_session_windows,
)

__all__ = [
    "get_spark",
    "stop_spark",
    "load_table",
    "load_tables",
    "register_views",
    "sql",
    "lsh_threshold_join",
    "winnow_pairs",
    "quantize_embeddings",
    "vocab_topk",
    "winnowed_fingerprints",
    "read_source",
    "read_binary_files",
    "write_sink",
    "write_training_shards",
    "read_bucketed",
    "write_bucketed",
    "filters",
    "compile_predicate",
    "drop_duplicates",
    "groupby",
    "Grouping",
    "join",
    "range_join",
    "asof_join",
    "salted_agg",
    "key_skew_report",
    "salted_join",
    "head",
    "str_to_table",
    "TableCleaner",
    "top_k",
    "running_agg",
    "lag_lead",
    "dedup_exact",
    "exact_duplicates",
    "decontaminate",
    "build_dedup_index",
    "dedup_against_index",
    "decontaminate_bloom",
    "duplicated_spans",
    "strip_duplicated_spans",
    "ngram_overlap",
    "ngram_decontaminate",
    "sample_hash",
    "sample_stratified",
    "sample_per_key",
    "token_budget_sample",
    "split_by_key",
    "weighted_sample",
    "assign_row_ids",
    "deterministic_shuffle",
    "shuffle_key",
    "pack_token_batches",
    "curriculum_order",
    "bm25_topk",
    "bm25_topk_indexed",
    "build_text_index",
    "tfidf_topk",
    "unigram_nll",
    "bigram_nll",
    "zorder_key",
    "write_zordered",
    "morton_interleave",
    "compact_files",
    "resample",
    "time_bucket",
    "gaps",
    "diff_tables",
    "upsert",
    "upsert_history",
    "funnel_steps",
    "pagerank",
    "read_arrow_ipc",
    "register_arrow_ipc",
    "retention_cohorts",
    "diff_summary",
    "zscore",
    "outlier_filter",
    "quantile_rank",
    "ks_drift",
    "psi_drift",
    "chi2_drift",
    "emd_drift",
    "embedding_drift",
    "drift_report",
    "mix_sources",
    "mixture_weights",
    "quality_filter",
    "jaccard_pairs",
    "minhash_lsh_pairs",
    "minhash_lsh_edges",
    "dedup_clusters",
    "simhash",
    "simhash_pairs",
    "cosine_topk",
    "similarity_join",
    "lsh_topk",
    "ivf_topk",
    "build_ivf_index",
    "ivf_topk_indexed",
    "embedding_near_dup",
    "embedding_lsh_pairs",
    "embedding_lsh_edges",
    "embedding_dedup_clusters",
    "semantic_dedup",
    "project_embeddings",
    "random_projection_matrix",
    "semantic_dedup_pairs",
    "text_stats",
    "token_count",
    "quality_score",
    "lang_guess",
    "fingerprint",
    "normalize_text",
    "char_entropy",
    "source_report",
    "with_media_metadata",
    "extract_features",
    "tumbling_counts",
    "sliding_counts",
    "sessionize_batch",
    "stream_tumbling_counts",
    "stream_dedup",
    "running_user_totals",
    "stream_events",
    "stream_session_windows",
]

__version__ = "0.1.0"
