"""ML cleaner flows, curation pipelines, merges (SCD), mixtures,
segmentation.

Split from the former monolithic entry_queries.py (round 8); the
registry contract and driver-cap ordering live in the package
__init__.
"""
from __future__ import annotations

import pandas as pd  # module-level so stringified UDF type hints resolve

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from pyarrow_ops_spark.operators.filters import filters
from pyarrow_ops_spark.operators.dedup import drop_duplicates
from pyarrow_ops_spark.operators.group import groupby
from pyarrow_ops_spark.operators.join import join
from pyarrow_ops_spark.functions.jsons import str_to_table
from pyarrow_ops_spark.sources.tables import load_table

from pyarrow_ops_spark.entry_queries._registry import folded_query, query




# ---------------------------------------------------------------------------
# ML cleaner as a query (encode paths are deterministic SQL)
# ---------------------------------------------------------------------------


@query(
    "ml_clean_encode",
    """
    SELECT c_custkey,
           CASE c_mktsegment
             WHEN 'AUTOMOBILE' THEN 1 WHEN 'BUILDING' THEN 2 WHEN 'FURNITURE' THEN 3
             ELSE 0 END AS c_mktsegment,
           c_mktsegment = 'AUTOMOBILE' AS c_mktsegment_AUTOMOBILE,
           c_mktsegment = 'BUILDING' AS c_mktsegment_BUILDING,
           c_mktsegment = 'FURNITURE' AS c_mktsegment_FURNITURE,
           c_mktsegment = 'HOUSEHOLD' AS c_mktsegment_HOUSEHOLD,
           c_mktsegment = 'MACHINERY' AS c_mktsegment_MACHINERY
    FROM customer
    """,
)
def q_ml_clean_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TableCleaner label + one-hot encoding over customer (explicit
    categories → fully deterministic; fit-free plan, map-only stage)."""
    from pyarrow_ops_spark.ml.cleaner import TableCleaner

    cust = load_table(spark, "customer", sf_dir)
    cleaner = TableCleaner()
    cleaner.register_label(
        "c_mktsegment", categories=["AUTOMOBILE", "BUILDING", "FURNITURE"]
    )
    cleaner.register_one_hot(
        "c_mktsegment",
        categories=[
            "AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY",
        ],
    )
    return _ml_with_key(cust, cleaner)



def _ml_with_key(cust: DataFrame, cleaner) -> DataFrame:
    """Keep the key column alongside the cleaned outputs."""
    exprs = [F.col("c_custkey")]
    for col in cleaner.columns:
        for out_name, expr in col.transform_exprs():
            exprs.append(expr.alias(out_name))
    return cust.select(*exprs)



@query(
    "ml_cleaner_dict_roundtrip",
    """
    SELECT c_custkey,
           CASE c_mktsegment
             WHEN 'AUTOMOBILE' THEN 1 WHEN 'BUILDING' THEN 2 WHEN 'FURNITURE' THEN 3
             ELSE 0 END AS c_mktsegment,
           c_mktsegment = 'AUTOMOBILE' AS c_mktsegment_AUTOMOBILE,
           c_mktsegment = 'BUILDING' AS c_mktsegment_BUILDING,
           c_mktsegment = 'FURNITURE' AS c_mktsegment_FURNITURE,
           c_mktsegment = 'HOUSEHOLD' AS c_mktsegment_HOUSEHOLD,
           c_mktsegment = 'MACHINERY' AS c_mktsegment_MACHINERY
    FROM customer
    """,
)
def q_ml_cleaner_dict_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TableCleaner serialization certified through the driver hash: fit
    the same cleaner as ml_clean_encode, round-trip it through
    ``to_dict`` -> JSON -> ``from_dict`` (the persistence format a
    production pipeline ships between fit and serve jobs), and transform
    with the RECONSTRUCTED cleaner. The oracle is identical to
    ml_clean_encode's — any drift introduced by serialization (lost
    categories, reordered label ids, dropped columns) hash-mismatches.
    Ref: reference ml.py to_dict/from_dict (§2.1 #28), previously
    pytest-only."""
    import json as _json

    from pyarrow_ops_spark.ml.cleaner import TableCleaner

    cust = load_table(spark, "customer", sf_dir)
    cleaner = TableCleaner()
    cleaner.register_label(
        "c_mktsegment", categories=["AUTOMOBILE", "BUILDING", "FURNITURE"]
    )
    cleaner.register_one_hot(
        "c_mktsegment",
        categories=[
            "AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY",
        ],
    )
    wire = _json.dumps(cleaner.to_dict())  # through a real JSON boundary
    rebuilt = TableCleaner().from_dict(_json.loads(wire))
    return _ml_with_key(cust, rebuilt)



@query(
    "ml_impute_clip",
    """
    WITH src AS (
        SELECT event_id, CASE WHEN value < 0.2 THEN NULL ELSE value END AS v
        FROM events
    ),
    stats AS (SELECT avg(v) AS m, min(v) AS lo, max(v) AS hi FROM src)
    SELECT event_id,
           round(least(greatest(coalesce(v, stats.m), stats.lo), stats.hi), 4) AS v
    FROM src, stats
    """,
)
def q_ml_impute_clip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TableCleaner numeric path: fit (one aggregation scan) learns
    mean/min/max over a column with planted nulls; transform is a map-only
    coalesce+clip expression (reference ml.py:6-7, 38-41)."""
    from pyarrow_ops_spark.ml.cleaner import TableCleaner

    ev = load_table(spark, "events", sf_dir).select(
        "event_id",
        F.when(F.col("value") < 0.2, None).otherwise(F.col("value")).alias("v"),
    )
    cleaner = TableCleaner()
    cleaner.register_numeric("v", impute="mean", clip=True)
    cleaner.fit(ev)
    (name, expr) = cleaner.columns[0].transform_exprs()[0]
    return ev.select("event_id", F.round(expr, 4).alias(name))



# FOLDED r14 (6 driver certs r2-r11): every constituent is certified on
# its own row (quality/lang/token metrics via the text_* family, exact
# fp-dedup via dedup_exact_docs, accounting aggregates everywhere) and
# the surviving pipeline_curation_v2 + pipeline_perplexity_filter rows
# (both r13-green) certify the composite curation shape end to end; this
# flagship stays the scale-harness anchor via ALL_QUERIES and
# pytest-oracled every run via ALL_ORACLES.
@folded_query(
    "pipeline_llm_curation",
    r"""
    WITH u AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + (SELECT max(doc_id) + 1 FROM documents) AS doc_id, text
        FROM documents
        WHERE doc_id % 10 = 0
    ),
    m AS (
        SELECT doc_id, text,
               round(0.4 * least(len(string_split_regex(trim(text), '\s+')) / 64.0, 1.0)
                     + 0.3 * (length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))::DOUBLE
                              / length(text))
                     + 0.3 * greatest(0.0, 1.0 -
                           abs((length(regexp_replace(text, '\s+', '', 'g'))::DOUBLE
                                / len(string_split_regex(trim(text), '\s+'))) - 5.0)
                           / 5.0), 4) AS q,
               len(regexp_extract_all(text, '\b(der|die|und|das|ist)\b')) AS s_de,
               len(regexp_extract_all(text, '\b(the|and|of|to|in)\b')) AS s_en,
               len(regexp_extract_all(text, '\b(el|la|de|que|los)\b')) AS s_es,
               len(regexp_extract_all(text, '\b(le|la|et|les|des)\b')) AS s_fr,
               len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS toks,
               md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
        FROM u
    ),
    g AS (
        SELECT *,
               CASE
                 WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
                 WHEN s_de = greatest(s_de, s_en, s_es, s_fr) THEN 'de'
                 WHEN s_en = greatest(s_de, s_en, s_es, s_fr) THEN 'en'
                 WHEN s_es = greatest(s_de, s_en, s_es, s_fr) THEN 'es'
                 ELSE 'fr'
               END AS lang_guessed
        FROM m
    ),
    f AS (SELECT * FROM g WHERE q >= 0.5 AND lang_guessed <> 'und'),
    keep AS (SELECT min(doc_id) AS doc_id FROM f GROUP BY fp)
    SELECT lang_guessed,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(toks) AS BIGINT) AS total_tokens,
           round(avg(q), 4) AS avg_quality
    FROM f WHERE doc_id IN (SELECT doc_id FROM keep)
    GROUP BY lang_guessed
    """,
)
def q_pipeline_llm_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLAGSHIP composite: the end-to-end training-data curation pipeline —
    quality scoring + language ID (map-only metrics), quality/language
    filtering, exact dedup on normalized-text fingerprints (planted copies
    in-query so the dedup stage is non-vacuous), per-language corpus
    accounting. One shuffle for the digest dedup, one for the final
    aggregate; every metric fuses into the scan stage. This is the query
    shape a 100 TB curation run executes per snapshot."""
    return curation_stage_frames(spark, sf_dir)["final"]


def curation_stage_frames(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """The curation pipeline's cumulative stage frames, exposed so the
    scale harness can attribute task time per stage (metrics map vs
    fp-dedup aggregate vs final aggregate): ``filtered`` ends at the
    map+filter, ``kept`` adds the fingerprint min_by dedup shuffle,
    ``final`` adds the per-language accounting aggregate."""
    from pyarrow_ops_spark.functions.text import (
        bpe_ish_token_count,
        fingerprint,
        lang_guess,
        quality_score,
    )

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    # Planted copies get ids offset by max(doc_id)+1, so they can never
    # collide with base ids at ANY corpus size (the min_by dedup below
    # relies on doc_id uniqueness for determinism). The offset is a
    # broadcast one-row aggregate — no driver collect, and the extra scan
    # is column-pruned to doc_id only.
    off = docs.agg((F.max("doc_id") + F.lit(1)).alias("__off__"))
    planted = (
        docs.filter(F.col("doc_id") % 10 == 0)
        .crossJoin(F.broadcast(off))
        .select((F.col("doc_id") + F.col("__off__")).alias("doc_id"), "text")
    )
    u = docs.unionByName(planted)
    m = u.select(
        "doc_id",
        quality_score("text").alias("q"),
        lang_guess("text").alias("lang_guessed"),
        bpe_ish_token_count("text").alias("toks"),
        fingerprint("text").alias("fp"),
    )
    f = m.filter((F.col("q") >= 0.5) & (F.col("lang_guessed") != "und"))
    # dedup via one map-side-combinable AGGREGATE, not a self-semi-join
    # (that would
    # re-run the regex-heavy metrics map over the corpus) and not a
    # window row_number (WindowExec pays a sort plus per-group buffer
    # management across millions of ~10-row fingerprint groups — the
    # sf10 scale check measured the window shape at 18x task for 10x
    # data). min_by(struct, doc_id) keeps the min-id row per fingerprint
    # in one map-side-combinable pass over the 5 narrow metric columns
    # (text is already projected away); doc_id is unique, so the winner
    # is exactly the window's rn=1 row.
    kept = (
        f.groupBy("fp")
        .agg(
            F.min_by(
                F.struct("doc_id", "lang_guessed", "toks", "q"), F.col("doc_id")
            ).alias("__k__")
        )
        .select("__k__.*")
    )
    final = kept.groupBy("lang_guessed").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("toks").cast("bigint").alias("total_tokens"),
        F.round(F.avg("q"), 4).alias("avg_quality"),
    )
    return {"filtered": f, "kept": kept, "final": final}



@query(
    "diff_order_snapshots",
    """
    WITH old AS (
        SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 13 != 0
    ),
    new AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 7 = 0 THEN round(o_totalprice + 1.5, 2)
                    ELSE o_totalprice END AS o_totalprice
        FROM orders WHERE o_orderkey % 10 != 0
    )
    SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
           CASE WHEN o.o_orderkey IS NULL THEN 'added'
                WHEN n.o_orderkey IS NULL THEN 'removed'
                ELSE 'changed' END AS diff_status,
           o.o_totalprice AS old_o_totalprice,
           n.o_totalprice AS new_o_totalprice
    FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
    WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
       OR o.o_totalprice IS DISTINCT FROM n.o_totalprice
    """,
)
def q_diff_order_snapshots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed snapshot diff (added/removed/changed) between two derived
    versions of the orders table — ONE full outer join on the key (the
    minimum shuffle for the question), null-safe value comparison as a
    post-join projection. The incremental-pipeline audit primitive."""
    from pyarrow_ops_spark.operators.diff import diff_tables

    orders = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_totalprice")
    old = orders.filter(F.col("o_orderkey") % 13 != 0)
    new = orders.filter(F.col("o_orderkey") % 10 != 0).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 7 == 0, F.round(F.col("o_totalprice") + 1.5, 2)
        ).otherwise(F.col("o_totalprice")),
    )
    return diff_tables(old, new, ["o_orderkey"], ["o_totalprice"])



@query(
    "source_quality_report",
    r"""
    WITH m AS (
        SELECT source, doc_id, text,
               md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
               len(string_split_regex(trim(text), '\s+')) AS n_tokens,
               length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))::DOUBLE
                   / length(text) AS lr,
               length(regexp_replace(text, '\s+', '', 'g'))::DOUBLE
                   / len(string_split_regex(trim(text), '\s+')) AS wl
        FROM documents
    ),
    q AS (
        SELECT source, fp, length(text) AS n_chars, n_tokens,
               round(0.4 * least(n_tokens / 64.0, 1.0)
                     + 0.3 * lr
                     + 0.3 * greatest(0.0, 1.0 - abs(wl - 5.0) / 5.0), 4)
                   AS quality
        FROM m
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT fp) AS BIGINT) AS n_distinct_texts,
           round(1.0 - count(DISTINCT fp) / count(*), 4) AS dup_rate,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           round(avg(n_tokens), 4) AS avg_tokens,
           round(avg(quality), 4) AS avg_quality
    FROM q GROUP BY source
    """,
)
def q_source_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source curation dashboard (volume, exact-dup mass, mean
    length/quality) — ONE hash aggregate keyed by source; count_distinct
    carries 16-byte digests, so the shuffle is |sources|-bound regardless
    of corpus width."""
    from pyarrow_ops_spark.functions.text import source_report

    docs = load_table(spark, "documents", sf_dir)
    return source_report(docs)



@query(
    "mixture_weights_alpha",
    """
    WITH c AS (
        SELECT source AS stratum, CAST(count(*) AS BIGINT) AS n_rows
        FROM documents GROUP BY source
    ),
    t AS (SELECT CAST(sum(n_rows) AS DOUBLE) AS total,
                 sum(pow(CAST(n_rows AS DOUBLE), 0.5)) AS sa
          FROM c)
    SELECT stratum, n_rows,
           round(n_rows / total, 4) AS share,
           round(pow(CAST(n_rows AS DOUBLE), 0.5) / sa, 4) AS weight,
           round((pow(CAST(n_rows AS DOUBLE), 0.5) / sa)
                 / (n_rows / total), 4) AS boost
    FROM c CROSS JOIN t
    """,
)
def q_mixture_weights_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled (alpha=0.5) mixture weights over document
    sources — the alpha-sampling rule that boosts low-resource domains.
    One count-per-stratum aggregate + two broadcast single-row joins; the
    shuffled payload is |strata| rows regardless of corpus size. The
    oracle replays the SAME collapsed normalizer the operator computes
    (sum(pow(n_rows, alpha)), not sum(pow(n_rows/total, alpha))): the two
    are algebraically equal but not FP-identical, and a last-ulp delta at
    a round(.,4) boundary would flake the hash certification."""
    from pyarrow_ops_spark.operators.sample import mixture_weights

    docs = load_table(spark, "documents", sf_dir)
    return mixture_weights(docs, "source", alpha=0.5)



@query(
    "merge_upsert_orders",
    """
    WITH updates AS (
        SELECT o_orderkey, round(o_totalprice + 1000.0, 2) AS o_totalprice,
               'U' AS o_orderstatus, FALSE AS is_delete
        FROM orders WHERE o_orderkey % 10 = 0
        UNION ALL
        SELECT o_orderkey, o_totalprice, o_orderstatus, TRUE AS is_delete
        FROM orders WHERE o_orderkey % 10 = 1
        UNION ALL
        SELECT o_orderkey + 100000000 AS o_orderkey, o_totalprice,
               'N' AS o_orderstatus, FALSE AS is_delete
        FROM orders WHERE o_orderkey % 10 = 2
    )
    SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice, o_orderstatus
    FROM orders
    WHERE o_orderkey NOT IN (SELECT o_orderkey FROM updates)
    UNION ALL
    SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice, o_orderstatus
    FROM updates WHERE NOT is_delete
    """,
)
def q_merge_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch MERGE INTO semantics on plain parquet: a derived delta
    (10% price bumps, 10% deletes, 10% inserts at offset keys) applied
    via one anti-join + union — the base never row-joins the delta, so
    wide rows shuffle once and a small delta broadcasts. Oracle replays
    the merge as NOT IN + UNION ALL."""
    from pyarrow_ops_spark.operators.diff import upsert

    orders = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"),
        "o_orderstatus",
    )
    updates = (
        orders.filter(F.col("o_orderkey") % 10 == 0)
        .select(
            "o_orderkey",
            F.round(F.col("o_totalprice") + 1000.0, 2).alias("o_totalprice"),
            F.lit("U").alias("o_orderstatus"),
            F.lit(False).alias("is_delete"),
        )
        .unionByName(
            orders.filter(F.col("o_orderkey") % 10 == 1).select(
                "o_orderkey", "o_totalprice", "o_orderstatus",
                F.lit(True).alias("is_delete"),
            )
        )
        .unionByName(
            orders.filter(F.col("o_orderkey") % 10 == 2).select(
                (F.col("o_orderkey") + 100_000_000).alias("o_orderkey"),
                "o_totalprice",
                F.lit("N").alias("o_orderstatus"),
                F.lit(False).alias("is_delete"),
            )
        )
    )
    merged = upsert(orders, updates, ["o_orderkey"], delete_col="is_delete")
    return merged.select(
        "o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"),
        "o_orderstatus",
    )



@query(
    "pipeline_perplexity_filter",
    """
    WITH toks AS (
        SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t
        FROM documents
    ),
    counts AS (SELECT t, count(*) AS c FROM toks GROUP BY t),
    vocab AS (SELECT t, c FROM counts ORDER BY c DESC, t LIMIT 500),
    totals AS (
        SELECT CAST(sum(c) AS DOUBLE) AS total,
               least(count(*), 500) AS v
        FROM counts
    ),
    nll AS (
        SELECT doc_id,
               round(avg(-ln((coalesce(vocab.c, 0) + 1.0)
                             / (totals.total + 1.0 * (totals.v + 1)))), 4)
                   AS nll
        FROM toks LEFT JOIN vocab USING (t) CROSS JOIN totals
        GROUP BY doc_id
    ),
    ranked AS (
        SELECT d.source, n.doc_id, n.nll,
               percent_rank() OVER (
                   PARTITION BY d.source ORDER BY n.nll, n.doc_id
               ) AS pr
        FROM nll n JOIN documents d USING (doc_id)
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_kept,
           round(avg(nll), 4) AS avg_nll
    FROM ranked
    WHERE pr >= 0.1 AND pr <= 0.9
    GROUP BY source
    """,
)
def q_pipeline_perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CCNet-style perplexity-band filter as an end-to-end composite:
    score every document with the corpus-trained unigram LM, rank within
    its source, keep the middle [0.1, 0.9] band (head = boilerplate-ish
    too-predictable text, tail = junk), report per-source survivors.
    Ranking uses the ROUNDED nll with doc_id tiebreak so the band cut is
    engine-deterministic. One bounded-vocab NLL pass + one per-source
    window + one aggregate."""
    from pyarrow_ops_spark.functions.search import unigram_nll

    docs = load_table(spark, "documents", sf_dir)
    nll = unigram_nll(docs, vocab_size=500).select(
        "doc_id", F.round("nll", 4).alias("nll")
    )
    joined = nll.join(docs.select("doc_id", "source"), on="doc_id")
    w = W.partitionBy("source").orderBy("nll", "doc_id")
    ranked = joined.withColumn("pr", F.percent_rank().over(w))
    return (
        ranked.filter((F.col("pr") >= 0.1) & (F.col("pr") <= 0.9))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.round(F.avg("nll"), 4).alias("avg_nll"),
        )
    )



@query(
    "merge_scd2_orders",
    """
    WITH base AS (
        SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS o_totalprice
        FROM orders
    ),
    upd AS (
        SELECT o_orderkey, 'X' AS o_orderstatus,
               round(o_totalprice, 2) AS o_totalprice, o_orderdate AS ts
        FROM orders WHERE o_orderkey % 7 = 0
    )
    SELECT b.o_orderkey, b.o_orderstatus, b.o_totalprice,
           DATE '2023-01-01' AS valid_from,
           u.ts AS valid_to,
           (u.o_orderkey IS NULL) AS is_current
    FROM base b LEFT JOIN upd u USING (o_orderkey)
    UNION ALL
    SELECT o_orderkey, o_orderstatus, o_totalprice,
           ts AS valid_from, CAST(NULL AS DATE) AS valid_to, TRUE
    FROM upd
    """,
)
def q_merge_scd2_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-2 merge: every 7th order gets a status update effective at its
    order date — the open row closes at that date (old values preserved)
    and a new open row appends. Closed history never shuffles; the close
    join touches the open slice only. Oracle replays the version split
    as a LEFT JOIN + UNION ALL."""
    from pyarrow_ops_spark.operators.diff import upsert_history

    orders = load_table(spark, "orders", sf_dir)
    base = orders.select(
        "o_orderkey", "o_orderstatus",
        F.round("o_totalprice", 2).alias("o_totalprice"),
    )
    history = base.select(
        "*",
        F.to_date(F.lit("2023-01-01")).alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    updates = orders.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey",
        F.lit("X").alias("o_orderstatus"),
        F.round("o_totalprice", 2).alias("o_totalprice"),
        F.col("o_orderdate").alias("ts"),
    )
    return upsert_history(history, updates, ["o_orderkey"], ts_col="ts")



@query(
    "pipeline_curation_v2",
    r"""
    WITH norm AS (
        SELECT doc_id, source, text,
               md5(trim(regexp_replace(
                   regexp_replace(
                       regexp_replace(lower(text), '[0-9]', '0', 'g'),
                       '[^a-z0-9A-Z\s]', ' ', 'g'),
                   '\s+', ' ', 'g'))) AS fp
        FROM documents
    ),
    kept AS (  -- one canonical doc per normalized text (min doc_id)
        SELECT n.doc_id, n.source, n.text
        FROM norm n
        JOIN (SELECT fp, min(doc_id) AS canonical_id FROM norm GROUP BY fp) w
          ON n.doc_id = w.canonical_id
    ),
    q AS (
        SELECT doc_id, source,
               round(0.4 * least(len(string_split_regex(trim(text), '\s+')) / 64.0, 1.0)
                     + 0.3 * (length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))::DOUBLE
                              / length(text))
                     + 0.3 * greatest(0.0, 1.0 - abs(
                           length(regexp_replace(text, '\s+', '', 'g'))::DOUBLE
                           / len(string_split_regex(trim(text), '\s+')) - 5.0) / 5.0),
                     4) AS quality
        FROM kept
    ),
    survivors AS (SELECT * FROM q WHERE quality >= 0.3),
    c AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                 round(avg(quality), 4) AS avg_quality
          FROM survivors GROUP BY source),
    t AS (SELECT CAST(sum(n_docs) AS DOUBLE) AS total,
                 sum(pow(CAST(n_docs AS DOUBLE), 0.5)) AS sa
          FROM c)
    SELECT source, n_docs, avg_quality,
           round(pow(CAST(n_docs AS DOUBLE), 0.5) / sa, 4) AS weight
    FROM c CROSS JOIN t
    """,
)
def q_pipeline_curation_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capstone curation composite from this round's operators:
    normalized exact dedup (digit-zeroed canonical form, digest-only
    shuffle) -> quality-score gate -> per-source survivor counts ->
    alpha-sampling mixture weights over the surviving distribution. One
    linear pass per layer; the oracle replays every layer's exact
    formula."""
    from pyarrow_ops_spark.functions.text import normalize_text, quality_score
    from pyarrow_ops_spark.operators.sample import mixture_weights

    docs = load_table(spark, "documents", sf_dir)
    fp = F.md5(normalize_text("text", zero_digits=True))
    norm = docs.select("doc_id", "source", "text", fp.alias("fp"))
    winners = norm.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    kept = norm.join(winners.select("doc_id"), on="doc_id", how="semi")
    from pyspark import StorageLevel

    # survivors feed the per-source stats AND the mixture weights —
    # persist so the dedup join + quality scan run once, not twice
    survivors = (
        kept.withColumn("quality", quality_score("text"))
        .filter(F.col("quality") >= 0.3)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    per_source = survivors.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("quality"), 4).alias("avg_quality"),
    )
    weights = mixture_weights(
        survivors.select("source"), "source", alpha=0.5
    ).select(F.col("stratum").alias("source"), "weight")
    return per_source.join(weights, on="source").select(
        "source", "n_docs", "avg_quality", "weight"
    )



@query(
    "ml_nb_classifier",
    """
    WITH train AS (SELECT lang, text FROM documents WHERE doc_id % 5 = 0),
    eval AS (SELECT doc_id, text FROM documents WHERE doc_id % 5 != 0),
    ttok AS (
        SELECT lang, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
        FROM train
    ),
    wc AS (SELECT lang, w, count(*) AS c FROM ttok GROUP BY lang, w),
    cls AS (SELECT lang, count(*) AS n_tokens FROM ttok GROUP BY lang),
    priors AS (SELECT lang, CAST(count(*) AS DOUBLE) AS n_docs
               FROM train GROUP BY lang),
    tot AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM train),
    vocab AS (SELECT CAST(count(DISTINCT w) AS DOUBLE) AS v FROM wc),
    etok AS (
        SELECT doc_id, w, CAST(count(*) AS DOUBLE) AS k FROM (
            SELECT doc_id,
                   unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
            FROM eval
        ) GROUP BY doc_id, w
    ),
    edoc AS (
        SELECT e.doc_id, coalesce(t.kk, 0.0) AS kk
        FROM eval e LEFT JOIN (
            SELECT doc_id, sum(k) AS kk FROM etok GROUP BY doc_id
        ) t USING (doc_id)
    ),
    known AS (
        SELECT e.doc_id, wc.lang, sum(e.k * ln(wc.c + 1.0)) AS s
        FROM etok e JOIN wc ON wc.w = e.w
        GROUP BY e.doc_id, wc.lang
    ),
    scored AS (
        SELECT d.doc_id, c.lang,
               ln(p.n_docs / t.n)
               - d.kk * ln(c.n_tokens + vb.v)
               + coalesce(k.s, 0.0) AS logp
        FROM edoc d
        CROSS JOIN cls c
        LEFT JOIN known k ON k.doc_id = d.doc_id AND k.lang = c.lang
        JOIN priors p ON p.lang = c.lang
        CROSS JOIN tot t CROSS JOIN vocab vb
    )
    SELECT doc_id, lang AS predicted, round(logp, 4) AS logp FROM (
        SELECT *, row_number() OVER (
            PARTITION BY doc_id ORDER BY logp DESC, lang) AS rn
        FROM scored
    ) WHERE rn = 1
    """,
)
def q_ml_nb_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes lifecycle, fully hash-certified: TRAIN on
    every 5th document (label = lang) and CLASSIFY the rest, with the
    DuckDB oracle replaying both the count-based training and the
    factored smoothed scoring formula expression-for-expression (see
    ml/nb.py). The argmax margins are sampling-noise-sized (>> reorder
    ulp) and ties break on the label, so the prediction column is
    engine-stable."""
    from pyarrow_ops_spark.ml.nb import nb_fit, nb_predict

    docs = load_table(spark, "documents", sf_dir)
    train = docs.filter(F.col("doc_id") % 5 == 0).select(
        F.col("lang").alias("label"), "text"
    )
    evals = docs.filter(F.col("doc_id") % 5 != 0).select("doc_id", "text")
    model = nb_fit(train)
    out = nb_predict(model, evals)
    return out.select("doc_id", "predicted", F.round("logp", 4).alias("logp"))



@query(
    "orders_rfm_segments",
    """
    WITH cust AS (
        SELECT o_custkey AS customer, max(o_orderdate) AS last_d,
               CAST(count(*) AS BIGINT) AS frequency,
               round(sum(o_totalprice), 2) AS monetary
        FROM orders GROUP BY o_custkey
    ),
    anchor AS (SELECT max(o_orderdate) AS a FROM orders),
    base AS (
        SELECT customer, CAST(date_diff('day', last_d, a) AS BIGINT)
                   AS recency_days,
               frequency, monetary
        FROM cust CROSS JOIN anchor
    ),
    cuts AS (
        SELECT quantile_cont(recency_days, 0.25) AS r1,
               quantile_cont(recency_days, 0.5) AS r2,
               quantile_cont(recency_days, 0.75) AS r3,
               quantile_cont(frequency, 0.25) AS f1,
               quantile_cont(frequency, 0.5) AS f2,
               quantile_cont(frequency, 0.75) AS f3,
               quantile_cont(monetary, 0.25) AS m1,
               quantile_cont(monetary, 0.5) AS m2,
               quantile_cont(monetary, 0.75) AS m3
        FROM base
    )
    SELECT customer, recency_days, frequency, monetary,
           CAST(5 - (1 + (recency_days > r1)::INT + (recency_days > r2)::INT
                       + (recency_days > r3)::INT) AS INT) AS r_score,
           CAST(1 + (frequency > f1)::INT + (frequency > f2)::INT
                  + (frequency > f3)::INT AS INT) AS f_score,
           CAST(1 + (monetary > m1)::INT + (monetary > m2)::INT
                  + (monetary > m3)::INT AS INT) AS m_score,
           concat(
               5 - (1 + (recency_days > r1)::INT + (recency_days > r2)::INT
                      + (recency_days > r3)::INT),
               1 + (frequency > f1)::INT + (frequency > f2)::INT
                 + (frequency > f3)::INT,
               1 + (monetary > m1)::INT + (monetary > m2)::INT
                 + (monetary > m3)::INT
           ) AS segment
    FROM base CROSS JOIN cuts
    """,
)
def q_orders_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation over orders: per-customer aggregate, one
    nine-cut exact-percentile aggregate broadcast back, map-only quartile
    scoring (4 = best) — no ntile window (global sort) anywhere; strict-
    greater bucket edges make every score engine-deterministic."""
    from pyarrow_ops_spark.operators.segments import rfm_segments

    orders = load_table(spark, "orders", sf_dir)
    return rfm_segments(orders)
