"""Text analysis: stats, quality, tokenization, winnowing, BM25/TF-IDF,
language models, PII scrub, chunking.

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
from pyarrow_ops_spark.entry_queries._shared import _cached_index




# ---------------------------------------------------------------------------
# North star: text analysis over documents
# ---------------------------------------------------------------------------


@query(
    "text_stats",
    r"""
    SELECT doc_id, lang, source,
           len(string_split_regex(trim(text), '\s+')) AS n_tokens,
           length(text) AS n_chars_actual,
           round(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))::DOUBLE / length(text), 4) AS letter_ratio,
           round(length(regexp_replace(text, '\s+', '', 'g'))::DOUBLE
                 / len(string_split_regex(trim(text), '\s+')), 4) AS avg_word_len,
           md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
    FROM documents
    """,
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token/char/letter-ratio metrics + md5 fingerprint —
    pure column expressions, map-only, spread across cores with each
    shared regex subtree evaluated once (functions/text.py:text_stats)."""
    from pyarrow_ops_spark.functions.text import text_stats

    docs = load_table(spark, "documents", sf_dir)
    return text_stats(docs).select(
        "doc_id",
        "lang",
        "source",
        "n_tokens",
        "n_chars_actual",
        "letter_ratio",
        "avg_word_len",
        "fp",
    )



@query(
    "text_lang_guess",
    r"""
    WITH s AS (
        SELECT doc_id, lang,
               len(regexp_extract_all(text, '\b(der|die|und|das|ist)\b')) AS s_de,
               len(regexp_extract_all(text, '\b(the|and|of|to|in)\b')) AS s_en,
               len(regexp_extract_all(text, '\b(el|la|de|que|los)\b')) AS s_es,
               len(regexp_extract_all(text, '\b(le|la|et|les|des)\b')) AS s_fr
        FROM documents
    )
    SELECT doc_id, lang,
           CASE
             WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
             WHEN s_de = greatest(s_de, s_en, s_es, s_fr) THEN 'de'
             WHEN s_en = greatest(s_de, s_en, s_es, s_fr) THEN 'en'
             WHEN s_es = greatest(s_de, s_en, s_es, s_fr) THEN 'es'
             ELSE 'fr'
           END AS guessed
    FROM s
    """,
)
def q_text_lang_guess(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-vote language heuristic (ties resolve in alphabetical
    language order in both engines); each language's hit-count regex runs
    once per row (lang_guess_table's nested projection)."""
    from pyarrow_ops_spark.functions.text import lang_guess_table

    docs = load_table(spark, "documents", sf_dir)
    return lang_guess_table(docs).select("doc_id", "lang", "guessed")



# ---------------------------------------------------------------------------
# BPE-ish token counting (north-star text analysis)
# ---------------------------------------------------------------------------


@query(
    "text_quality",
    r"""
    WITH m AS (
        SELECT doc_id,
               len(string_split_regex(trim(text), '\s+')) AS n_tokens,
               length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))::DOUBLE / length(text) AS lr,
               length(regexp_replace(text, '\s+', '', 'g'))::DOUBLE
                   / len(string_split_regex(trim(text), '\s+')) AS wl
        FROM documents
    )
    SELECT doc_id,
           round(0.4 * least(n_tokens / 64.0, 1.0)
                 + 0.3 * lr
                 + 0.3 * greatest(0.0, 1.0 - abs(wl - 5.0) / 5.0), 4) AS quality
    FROM m
    """,
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality score (length credit + letter ratio + word-length
    credit) — the filter column a training pipeline thresholds on. Runs
    through text_stats' nested projection (each base regex once/row)."""
    from pyarrow_ops_spark.functions.text import text_stats

    docs = load_table(spark, "documents", sf_dir)
    return text_stats(docs).select("doc_id", "quality")



@query(
    "text_bpe_tokens",
    r"""
    SELECT doc_id,
           len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS n_pieces,
           len(string_split_regex(trim(text), '\s+')) AS n_words
    FROM documents
    """,
)
def q_text_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-style piece counting (letter runs / digit runs /
    punctuation) next to whitespace word counts."""
    from pyarrow_ops_spark.functions.text import (
        bpe_ish_token_count,
        spread,
        token_count,
    )

    docs = spread(load_table(spark, "documents", sf_dir))
    return docs.select(
        "doc_id",
        bpe_ish_token_count("text").alias("n_pieces"),
        token_count("text").alias("n_words"),
    )



@query(
    "text_winnow_fingerprints",
    r"""
    WITH h AS (
        SELECT doc_id,
               [list_reduce(list_transform(range(0, 8),
                                           j -> CAST(ascii(substr(text, i + j, 1)) AS BIGINT)),
                            (a, b) -> a * 31 + b) % 1000000007
                for i in range(1, greatest(length(text) - 7, 1) + 1)] AS hashes
        FROM documents
    ),
    f AS (
        SELECT doc_id,
               list_sort(list_distinct(
                   [list_min(hashes[i : i + 15])
                    for i in range(1, greatest(len(hashes) - 15, 1) + 1)])) AS fps
        FROM h
    )
    SELECT doc_id, unnest(fps) AS fp
    FROM f
    """,
)
def q_text_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing rolling-hash fingerprints (k=8-gram Rabin-Karp, window 16)
    — the substring-overlap sketch for plagiarism-style near-dup detection.
    The DuckDB oracle evaluates the IDENTICAL polynomial (no overflow below
    2^63 for k=8, so end-mod equals Spark's per-step mod). Emitted as
    scalar (doc_id, fp) rows — one row per distinct fingerprint — so the
    driver canonicalizer can hash the result (array columns are not
    hashable pandas values)."""
    from pyarrow_ops_spark.functions.text import winnowed_fingerprints

    docs = load_table(spark, "documents", sf_dir)
    return docs.select(
        "doc_id",
        F.explode(winnowed_fingerprints("text", k=8, window=16)).alias("fp"),
    )



@query(
    "text_vocab_topk",
    r"""
    SELECT token, CAST(COUNT(*) AS BIGINT) AS n
    FROM (SELECT unnest(regexp_extract_all(lower(text),
                        '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS token
          FROM documents)
    GROUP BY token
    ORDER BY n DESC, token
    LIMIT 100
    """,
)
def q_text_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary building: top-100 tokens by corpus frequency with a
    deterministic (count desc, token) tie-break. Map-side combine bounds
    the shuffle by vocab size; TakeOrderedAndProject avoids a full sort."""
    from pyarrow_ops_spark.functions.text import vocab_topk

    docs = load_table(spark, "documents", sf_dir)
    return vocab_topk(docs, "text", k=100).select(
        "token", F.col("n").cast("bigint").alias("n")
    )



@query(
    "text_contamination_score",
    r"""
    WITH norm AS (
        SELECT doc_id,
               list_filter(
                   regexp_split_to_array(
                       trim(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g')),
                       '\s+'),
                   t -> t <> '') AS w
        FROM documents
    ),
    gl AS (
        SELECT doc_id,
               list_distinct(
                   [array_to_string(w[i:i+2], ' ')
                    for i in range(1, greatest(len(w) - 2, 0) + 1)]) AS grams
        FROM norm
    ),
    ev AS (
        SELECT DISTINCT unnest(grams) AS g FROM gl WHERE doc_id % 37 = 0
    ),
    tot AS (
        SELECT doc_id, CAST(len(grams) AS BIGINT) AS n_grams
        FROM gl WHERE doc_id % 37 <> 0
    ),
    m AS (
        SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_matched
        FROM (SELECT doc_id, unnest(grams) AS g FROM gl
              WHERE doc_id % 37 <> 0) t
        JOIN ev USING (g) GROUP BY t.doc_id
    )
    SELECT t.doc_id, t.n_grams,
           COALESCE(m.n_matched, 0) AS n_matched,
           round(COALESCE(m.n_matched, 0) /
                 CAST(CASE WHEN t.n_grams = 0 THEN 1 ELSE t.n_grams END
                      AS DOUBLE), 4) AS score
    FROM tot t LEFT JOIN m USING (doc_id)
    """,
)
def q_text_contamination_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document contamination REPORT (the audit twin of
    dedup_ngram_overlap): every train doc gets (n_grams, n_matched,
    score) including clean docs at 0.0 — the distribution a curation run
    inspects before choosing a drop threshold. Same broadcast-gram plan
    as the overlap query; the only shuffle is the per-doc count pair."""
    from pyarrow_ops_spark.functions.dedup import contamination_score

    docs = load_table(spark, "documents", sf_dir)
    ev = docs.filter(F.col("doc_id") % 37 == 0)
    tr = docs.filter(F.col("doc_id") % 37 != 0)
    return contamination_score(tr, ev, id_col="doc_id", text_col="text", n=3)



@query(
    "text_strip_repeated_lines",
    """
    WITH aug AS (
        SELECT doc_id,
               text || chr(10) || substr(text, 1, 30) || chr(10) ||
               substr(text, 1, 30) || chr(10) || text AS t
        FROM documents
    ),
    parts AS (
        SELECT doc_id,
               unnest(string_split(t, chr(10))) AS part,
               generate_subscripts(string_split(t, chr(10)), 1) AS pos
        FROM aug
    ),
    firsts AS (
        SELECT doc_id, part, min(pos) AS pos
        FROM parts GROUP BY doc_id, part
    )
    SELECT doc_id,
           string_agg(part, chr(10) ORDER BY pos) AS text
    FROM firsts GROUP BY doc_id
    """,
)
def q_text_strip_repeated_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document line dedup (C4-style boilerplate removal) on a
    PLANTED construction: each doc becomes [text, first-30-chars,
    first-30-chars, text] joined by newlines, so every row carries real
    repetition for the operator to strip — the survivors must be exactly
    the first occurrences in order. Spark side is the map-only
    split -> array_distinct (first-occurrence order by contract) ->
    array_join chain; the oracle replays it positionally (min-position
    per line, reassembled in position order)."""
    from pyarrow_ops_spark.functions.text import strip_repeated_lines

    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.col("text"),
            F.substring("text", 1, 30),
            F.substring("text", 1, 30),
            F.col("text"),
        ).alias("text"),
    )
    return strip_repeated_lines(docs, "text")



@query(
    "text_scrub_pii",
    r"""
    WITH aug AS (
        SELECT doc_id,
               text || CASE
                   WHEN doc_id % 7 = 0
                       THEN ' contact bob' || CAST(doc_id AS VARCHAR) || '@example.com now'
                   WHEN doc_id % 11 = 0
                       THEN ' see https://ex.com/p/' || CAST(doc_id AS VARCHAR)
                   WHEN doc_id % 5 = 0
                       THEN ' ref 1234 5678 9012'
                   ELSE ''
               END AS text
        FROM documents
    )
    SELECT doc_id,
           regexp_replace(
               regexp_replace(
                   regexp_replace(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                   'https?://[^\s]+', '<URL>', 'g'),
               '[0-9][0-9 \-]{6,}[0-9]', '<NUM>', 'g') AS scrubbed
    FROM aug
    """,
)
def q_text_scrub_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: emails/URLs/long digit runs redacted with a pure
    Catalyst regexp chain (map-only, fuses into the scan). PII spans are
    planted in-query (deterministic per doc_id) so the scrub is
    non-vacuous; the oracle runs the same three regexes."""
    from pyarrow_ops_spark.functions.text import scrub_pii

    docs = load_table(spark, "documents", sf_dir)
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(
                    F.lit(" contact bob"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com now"),
                ),
            )
            .when(
                F.col("doc_id") % 11 == 0,
                F.concat(
                    F.lit(" see https://ex.com/p/"), F.col("doc_id").cast("string")
                ),
            )
            .when(F.col("doc_id") % 5 == 0, F.lit(" ref 1234 5678 9012"))
            .otherwise(F.lit("")),
        ).alias("text"),
    )
    return aug.select("doc_id", scrub_pii("text").alias("scrubbed"))



@query(
    "text_chunk_documents",
    r"""
    WITH w AS (
        SELECT doc_id,
               CASE WHEN text IS NULL OR trim(text) = '' THEN CAST([] AS VARCHAR[])
                    ELSE regexp_split_to_array(trim(text), '\s+') END AS words
        FROM documents
    ),
    s AS (
        SELECT doc_id, words,
               unnest(range(0, greatest(len(words) - 9, 0) + 1, 24)) AS start
        FROM w
        WHERE len(words) > 0
    )
    SELECT doc_id,
           CAST(start // 24 AS BIGINT) AS chunk_id,
           array_to_string(words[start + 1 : start + 32], ' ') AS chunk_text,
           CAST(len(words[start + 1 : start + 32]) AS BIGINT) AS n_tokens
    FROM s
    """,
)
def q_text_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking: overlapping 32-word chunks with 8-word
    overlap (step 24), no fully-redundant tail chunk (starts capped at
    n_words - overlap - 1), empty docs emit nothing. Split -> posexplode
    -> slice: map-only modulo the generate, fuses with the scan."""
    from pyarrow_ops_spark.functions.text import chunk_documents

    docs = load_table(spark, "documents", sf_dir)
    return chunk_documents(docs, chunk_words=32, overlap=8)



@query(
    "text_repetition_stats",
    r"""
    WITH w AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS words
        FROM documents
    ),
    wc AS (
        SELECT doc_id, w, count(*) AS c
        FROM (SELECT doc_id, unnest(words) AS w FROM w)
        GROUP BY 1, 2
    ),
    ws AS (
        SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
               CAST(count(*) AS BIGINT) AS n_distinct, max(c) AS top_w
        FROM wc GROUP BY 1
    ),
    bg AS (
        SELECT w.doc_id, words[i] || ' ' || words[i + 1] AS b
        FROM w, unnest(range(1, len(words))) AS t(i)
    ),
    bs AS (
        SELECT doc_id, sum(c) AS n_bi, max(c) AS top_b
        FROM (SELECT doc_id, b, count(*) AS c FROM bg GROUP BY 1, 2)
        GROUP BY 1
    )
    SELECT ws.doc_id, n_words, n_distinct,
           round((n_words - n_distinct) / CAST(n_words AS DOUBLE), 4) AS dup_word_frac,
           round(top_w / CAST(n_words AS DOUBLE), 4) AS top_word_frac,
           round(coalesce(top_b / CAST(n_bi AS DOUBLE), 0.0), 4) AS top_bigram_frac
    FROM ws LEFT JOIN bs ON ws.doc_id = bs.doc_id
    """,
)
def q_text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition metrics (dup-word / top-word / top-bigram
    fractions) — the boilerplate/spam signals of a curation pipeline. Two
    explode->count aggs with map-side combine; shuffle carries distinct
    grams per doc, not corpus tokens."""
    from pyarrow_ops_spark.functions.text import repetition_stats

    docs = load_table(spark, "documents", sf_dir)
    return repetition_stats(docs)



@folded_query(
    "text_quality_filter",
    r"""
    WITH m AS (
        SELECT doc_id,
               len(string_split_regex(trim(text), '\s+')) AS nt,
               length(text) AS nc,
               length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS nl,
               length(regexp_replace(text, '\s+', '', 'g')) AS ns
        FROM documents
    ),
    r AS (
        SELECT doc_id,
               CASE WHEN nt < 16 THEN 'too_short'
                    WHEN nt > 100000 THEN 'too_long'
                    WHEN ns::DOUBLE / nt < 2.0 OR ns::DOUBLE / nt > 4.6
                        THEN 'word_length'
                    WHEN nl::DOUBLE / nc < 0.815 THEN 'letter_ratio'
               END AS reject_reason
        FROM m
    )
    SELECT doc_id, reject_reason IS NULL AS keep, reject_reason FROM r
    """,
)
def q_text_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style rule filter: keep/reject with the first failing rule
    named per document (reject-reason audit before committing to a drop).
    Thresholds here are tightened to the synthetic corpus so every rule
    branch fires; map-only, regexes computed once per row."""
    from pyarrow_ops_spark.functions.text import quality_filter

    docs = load_table(spark, "documents", sf_dir)
    return quality_filter(
        docs,
        min_tokens=16,
        max_tokens=100_000,
        min_avg_word_len=2.0,
        max_avg_word_len=4.6,
        min_letter_ratio=0.815,
    ).select("doc_id", "keep", "reject_reason")



@folded_query(
    "search_bm25_topk",
    """
    WITH base AS (
        SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        FROM documents
    ),
    stats AS (SELECT count(*) AS n, avg(len(toks)) AS avgdl FROM base),
    tf AS (
        SELECT doc_id, dl, t, count(*) AS tf FROM (
            SELECT doc_id, len(toks) AS dl, unnest(toks) AS t FROM base
        ) WHERE t IN ('data', 'model', 'pipeline', 'the')
        GROUP BY doc_id, dl, t
    ),
    dfreq AS (SELECT t, count(*) AS df FROM tf GROUP BY t),
    scored AS (
        SELECT tf.doc_id,
               sum( ln(1.0 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
                    * (tf.tf * 2.2)
                    / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * tf.dl / stats.avgdl)) )
                   AS score
        FROM tf JOIN dfreq USING (t) CROSS JOIN stats
        GROUP BY tf.doc_id
    )
    SELECT doc_id, round(score, 4) AS score FROM scored
    ORDER BY score DESC, doc_id LIMIT 10
    """,
)
def q_search_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-free Okapi BM25 top-10 for 'the data pipeline model'. Doc
    length is size() of the token array (map-only, never exploded); only
    query-term matches become rows; corpus stats broadcast as a single-row
    join; final top-k is a TakeOrderedAndProject. The oracle replays the
    identical formula over the identical tokenizer."""
    from pyarrow_ops_spark.functions.search import bm25_topk

    docs = load_table(spark, "documents", sf_dir)
    out = bm25_topk(docs, "the data pipeline model", k=10)
    return out.select("doc_id", F.round("score", 4).alias("score"))



@query(
    "text_unigram_nll",
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
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           round(avg(-ln((coalesce(vocab.c, 0) + 1.0)
                         / (totals.total + 1.0 * (totals.v + 1)))), 4) AS nll
    FROM toks LEFT JOIN vocab USING (t) CROSS JOIN totals
    GROUP BY doc_id
    """,
)
def q_text_unigram_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean NLL under an add-1-smoothed corpus unigram LM with
    a top-500 vocab (OOV shares one count-0 bucket) — the cheap analog of
    CCNet/RefinedWeb perplexity quality filtering. Vocab is a bounded
    TakeOrdered over map-side-combined counts, broadcast back; scoring is
    one explode + per-doc agg. Vocab boundary ties break by token in both
    engines."""
    from pyarrow_ops_spark.functions.search import unigram_nll

    docs = load_table(spark, "documents", sf_dir)
    out = unigram_nll(docs, vocab_size=500, alpha=1.0)
    return out.select("doc_id", "n_tokens", F.round("nll", 4).alias("nll"))



@query(
    "split_by_key_docs",
    """
    SELECT doc_id, source,
           CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'cccc'
                    THEN 'train'
                WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'e666'
                    THEN 'valid'
                ELSE 'test' END AS split
    FROM documents
    """,
)
def q_split_by_key_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe 8/1/1 split assignment keyed on doc_id: all rows with
    one key land in one split (split the KEY, not the row — splitting rows
    leaks near-duplicates across train/test). Same md5 bucket as
    sample_hash cut at cumulative integer thresholds (8/10 -> 'cccc',
    9/10 -> 'e666'); map-only, engine-reproducible, no RNG state."""
    from pyarrow_ops_spark.operators.sample import split_by_key

    docs = load_table(spark, "documents", sf_dir)
    return split_by_key(
        docs, ["doc_id"], {"train": 8, "valid": 1, "test": 1}
    ).select("doc_id", "source", "split")



@query(
    "text_bigram_nll",
    """
    WITH base AS (
        SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        FROM documents
    ),
    tok AS (
        SELECT doc_id, toks[i] AS w,
               CASE WHEN i > 1 THEN toks[i - 1] END AS prev
        FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks))) AS i
              FROM base)
    ),
    c1 AS (SELECT w, count(*) AS c1 FROM tok GROUP BY w),
    c2 AS (SELECT prev, w, count(*) AS c2 FROM tok
           WHERE prev IS NOT NULL GROUP BY prev, w),
    totals AS (SELECT CAST(sum(c1) AS DOUBLE) AS t,
                      CAST(count(*) AS DOUBLE) AS v FROM c1),
    scored AS (
        SELECT tok.doc_id,
               CASE WHEN tok.prev IS NULL
                    THEN (c1.c1 + 1.0) / (totals.t + 1.0 * (totals.v + 1))
                    ELSE 0.7 * (coalesce(c2.c2, 0) / cp.c1)
                         + 0.3 * ((c1.c1 + 1.0)
                                  / (totals.t + 1.0 * (totals.v + 1)))
               END AS p
        FROM tok
        JOIN c1 ON tok.w = c1.w
        LEFT JOIN c2 ON tok.prev = c2.prev AND tok.w = c2.w
        LEFT JOIN c1 cp ON tok.prev = cp.w
        CROSS JOIN totals
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
           round(avg(-ln(p)), 4) AS nll
    FROM scored GROUP BY doc_id
    """,
)
def q_text_bigram_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated bigram-LM NLL (lam=0.7, add-1 unigram back-off) — word
    ORDER now matters, unlike the unigram score. Unigram/bigram count
    relations are plain map-side-combined aggregates re-joined by SHUFFLE
    join on the token/bigram key (an uncapped vocabulary cannot broadcast
    at scale); only the scalar (T, V) row broadcasts."""
    from pyarrow_ops_spark.functions.search import bigram_nll

    docs = load_table(spark, "documents", sf_dir)
    out = bigram_nll(docs, alpha=1.0, lam=0.7)
    return out.select("doc_id", "n_tokens", F.round("nll", 4).alias("nll"))



# ---------------------------------------------------------------------------
# Session additions: normalization, TF-IDF retrieval, per-source report,
# SemDeDup (KMeans-partitioned embedding dedup)
# ---------------------------------------------------------------------------


@query(
    "text_normalize",
    r"""
    SELECT doc_id,
           trim(regexp_replace(
               regexp_replace(
                   regexp_replace(lower(text), '[0-9]', '0', 'g'),
                   '[^a-z0-9A-Z\s]', ' ', 'g'),
               '\s+', ' ', 'g')) AS norm_text
    FROM documents
    """,
)
def q_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style canonical text form (lower, digits zeroed, punctuation
    to spaces, whitespace collapsed) — a map-only regexp_replace chain that
    rides the scan; the oracle replays the identical portable regexes with
    the 'g' flag."""
    from pyarrow_ops_spark.functions.text import normalize_text

    docs = load_table(spark, "documents", sf_dir)
    return docs.select(
        "doc_id", normalize_text("text", zero_digits=True).alias("norm_text")
    )



@query(
    "search_tfidf_topk",
    """
    WITH base AS (
        SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        FROM documents
    ),
    stats AS (SELECT count(*) AS n FROM base),
    tf AS (
        SELECT doc_id, t, count(*) AS tf FROM (
            SELECT doc_id, unnest(toks) AS t FROM base
        ) WHERE t IN ('data', 'model', 'pipeline', 'the')
        GROUP BY doc_id, t
    ),
    dfreq AS (SELECT t, count(*) AS df FROM tf GROUP BY t),
    scored AS (
        SELECT tf.doc_id,
               sum(tf.tf * pow(ln((stats.n + 1.0) / (dfreq.df + 1.0)) + 1.0, 2))
                   AS score
        FROM tf JOIN dfreq USING (t) CROSS JOIN stats
        GROUP BY tf.doc_id
    )
    SELECT doc_id, round(score, 4) AS score FROM scored
    ORDER BY score DESC, doc_id LIMIT 10
    """,
)
def q_search_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF (smooth-idf, squared for the query weight) top-10 for 'the
    data pipeline model' — same index-free plan shape as BM25: tokenize
    map-only, filter to query terms BEFORE explode, broadcast the tiny
    document-frequency and corpus-size relations, TakeOrderedAndProject
    the final top-k. The oracle replays the identical formula."""
    from pyarrow_ops_spark.functions.search import tfidf_topk

    docs = load_table(spark, "documents", sf_dir)
    out = tfidf_topk(docs, "the data pipeline model", k=10)
    return out.select("doc_id", F.round("score", 4).alias("score"))



@query(
    "text_char_entropy",
    r"""
    WITH ch AS (
        SELECT doc_id, unnest(string_split(text, '')) AS c
        FROM documents WHERE length(text) > 0
    ),
    cc AS (SELECT doc_id, c, CAST(count(*) AS DOUBLE) AS k
           FROM ch GROUP BY doc_id, c)
    SELECT doc_id,
           CAST(sum(k) AS BIGINT) AS n_chars,
           round((ln(sum(k)) - sum(k * ln(k)) / sum(k)) / ln(2.0), 4)
               AS entropy
    FROM cc GROUP BY doc_id
    """,
)
def q_text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Shannon character entropy (bits) via the one-aggregate
    identity H = log2(n) - Σ k·log2(k)/n — flags degenerate repetition
    (low) and binary junk (high). Shuffle carries (doc, char) partial
    counts only."""
    from pyarrow_ops_spark.functions.text import char_entropy

    docs = load_table(spark, "documents", sf_dir)
    return char_entropy(docs)



@query(
    "search_bm25_indexed",
    """
    WITH base AS (
        SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        FROM documents
    ),
    stats AS (SELECT count(*) AS n, avg(len(toks)) AS avgdl FROM base),
    tf AS (
        SELECT doc_id, dl, t, count(*) AS tf FROM (
            SELECT doc_id, len(toks) AS dl, unnest(toks) AS t FROM base
        ) WHERE t IN ('data', 'model', 'pipeline', 'the')
        GROUP BY doc_id, dl, t
    ),
    dfreq AS (SELECT t, count(*) AS df FROM tf GROUP BY t),
    scored AS (
        SELECT tf.doc_id,
               sum( ln(1.0 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
                    * (tf.tf * 2.2)
                    / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * tf.dl / stats.avgdl)) )
                   AS score
        FROM tf JOIN dfreq USING (t) CROSS JOIN stats
        GROUP BY tf.doc_id
    )
    SELECT doc_id, round(score, 4) AS score FROM scored
    ORDER BY score DESC, doc_id LIMIT 10
    """,
)
def q_search_bm25_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 through the PERSISTED postings index: build (term-bucket-
    partitioned postings + dfreq + stats) then query with partition-
    pruned bucket reads. The oracle is the index-free formula — indexed
    and index-free scoring are provably identical, so this row hash-
    certifies the whole build/probe lifecycle. The index build is a
    deterministic side effect under /tmp, content-keyed by the source
    parquet fingerprint and atomically promoted (see _cached_index)."""
    from pyarrow_ops_spark.functions.search import (
        bm25_topk_indexed,
        build_text_index,
    )

    docs = load_table(spark, "documents", sf_dir)
    idx = _cached_index(
        sf_dir, "text_index", "documents", lambda d: build_text_index(docs, d)
    )
    out = bm25_topk_indexed(spark, idx, "the data pipeline model", k=10)
    return out.select("doc_id", F.round("score", 4).alias("score"))



@query(
    "text_bigram_pmi",
    """
    WITH toks AS (
        SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
        FROM documents
    ),
    bi AS (
        SELECT t[i] AS w1, t[i + 1] AS w2, count(*) AS c_ab
        FROM (SELECT doc_id, t,
                     unnest(generate_series(1, len(t) - 1)) AS i
              FROM toks)
        GROUP BY w1, w2
    ),
    uni AS (
        SELECT w, count(*) AS c FROM (
            SELECT unnest(t) AS w FROM toks
        ) GROUP BY w
    ),
    tot AS (SELECT CAST(sum(c) AS DOUBLE) AS n FROM uni)
    SELECT concat(w1, ' ', w2) AS bigram, CAST(c_ab AS BIGINT) AS c_ab,
           round(ln(c_ab * n / (ua.c * ub.c)), 4) AS pmi
    FROM bi
    JOIN uni ua ON ua.w = bi.w1
    JOIN uni ub ON ub.w = bi.w2
    CROSS JOIN tot
    WHERE c_ab >= 5
    ORDER BY pmi DESC, bigram LIMIT 20
    """,
)
def q_text_bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 collocations by PMI (min count 5) — the phrase-mining pass
    behind tokenizer merges. Both engines evaluate the one collapsed
    expression ln(c_ab*N/(c_a*c_b)) and rank on the ROUNDED pmi with the
    bigram tiebreak, so the top-k cut is engine-deterministic. Counts are
    vocabulary-bounded map-side-combined aggregates."""
    from pyarrow_ops_spark.functions.text import bigram_pmi_topk

    docs = load_table(spark, "documents", sf_dir)
    return bigram_pmi_topk(docs, k=20, min_count=5)


@query(
    "search_hybrid_rrf",
    """
    WITH base AS (
        SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        FROM documents
    ),
    stats AS (SELECT count(*) AS n, avg(len(toks)) AS avgdl FROM base),
    tf AS (
        SELECT doc_id, dl, t, count(*) AS tf FROM (
            SELECT doc_id, len(toks) AS dl, unnest(toks) AS t FROM base
        ) WHERE t IN ('data', 'model', 'quality', 'training')
        GROUP BY doc_id, dl, t
    ),
    dfreq AS (SELECT t, count(*) AS df FROM tf GROUP BY t),
    bm AS (
        SELECT tf.doc_id,
               round(sum( ln(1.0 + (stats.n - dfreq.df + 0.5)
                                   / (dfreq.df + 0.5))
                          * (tf.tf * 2.2)
                          / (tf.tf + 1.2 * (1 - 0.75
                                            + 0.75 * tf.dl / stats.avgdl)) ),
                     4) AS rs
        FROM tf JOIN dfreq USING (t) CROSS JOIN stats
        GROUP BY tf.doc_id
    ),
    bmr AS (SELECT doc_id,
                   row_number() OVER (ORDER BY rs DESC, doc_id) AS r
            FROM bm),
    e AS (SELECT vec_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings),
    q AS (SELECT v AS qv FROM e WHERE vec_id = 3),
    cs AS (SELECT e.vec_id AS doc_id,
                  round(list_cosine_similarity(e.v, qv), 4) AS rs
           FROM e CROSS JOIN q WHERE e.vec_id != 3),
    csr AS (SELECT doc_id,
                   row_number() OVER (ORDER BY rs DESC, doc_id) AS r
            FROM cs),
    contrib AS (
        SELECT doc_id, CAST(floor(1000000000000.0 / (60 + r)) AS BIGINT) AS c
        FROM bmr WHERE r <= 50
        UNION ALL
        SELECT doc_id, CAST(floor(1000000000000.0 / (60 + r)) AS BIGINT) AS c
        FROM csr WHERE r <= 50
    )
    SELECT doc_id, round(CAST(sum(c) AS DOUBLE) / 1000000000000.0, 6) AS rrf
    FROM contrib
    GROUP BY doc_id ORDER BY rrf DESC, doc_id LIMIT 10
    """,
)
def q_search_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 keyword ranking over documents fused with
    an embedding cosine ranking (query = vec_id 3) by reciprocal-rank
    fusion (c=60, top_n=50 per ranker, fused top-10) — the standard
    two-tower shortlist merge of a retrieval/decontamination pipeline.
    Every cut and rank on BOTH engines is taken on the rounded score
    with an id tiebreak, and each contribution is the exact integer
    floor(10^12/(c+rank)) summed in BIGINT — order-insensitive for any
    ranker count, so the fused hash is engine-stable.
    The per-ranker cuts are TakeOrderedAndProject; the fusion touches
    2 x 50 rows."""
    from pyarrow_ops_spark.functions.search import bm25_scores, rrf_fuse
    from pyarrow_ops_spark.functions.similarity import cosine_topk

    docs = load_table(spark, "documents", sf_dir)
    emb = load_table(spark, "embeddings", sf_dir)
    bm = bm25_scores(docs, "model training data quality")
    cos = cosine_topk(emb, emb.filter(F.col("vec_id") == 3), k=50).select(
        F.col("vec_id").alias("doc_id"), F.col("sim").alias("score")
    )
    return rrf_fuse([bm, cos], k=10)
