"""Keyword retrieval and statistical LM quality scoring (north-star surface).

Training-data curation needs lightweight retrieval (find corpus documents
matching an eval query — decontamination triage, targeted inspection) and a
corpus-statistics quality score (unigram LM negative log-likelihood — the
cheap cousin of the KenLM perplexity filters used by CCNet/RefinedWeb).
The reference has no text operators at all; this extends the surface per
BASELINE.json's north star.

Scale design (100 TB):
- BM25 never builds a persistent index: doc length is ``size()`` of the
  token array (map-only, no explode), only QUERY-TERM matches are exploded
  into rows, and corpus stats (N, avgdl) travel as a broadcast single-row
  join, not a ``.collect()``. The shuffle carries (doc, term) partial
  counts for matching docs only — output-bound, not corpus-bound.
- The unigram LM caps the vocabulary at top-V (TakeOrderedAndProject over
  map-side-combined counts — bounded by V, not corpus size) and joins it
  back as a broadcast; everything else is one explode + one per-doc agg.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Engine-portable word tokenizer: lowercase alnum runs. The DuckDB oracles
# run the same regex via regexp_extract_all, so token streams are
# byte-identical across engines.
WORD_RE = r"[a-z0-9]+"


def _tokens(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(F.lower(c), F.lit(WORD_RE), 0)


def bm25_scores(
    df: DataFrame,
    query: Sequence[str] | str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 scores for every query-matching document, index-free.

    Returns ``(id_col, score)`` for each document containing at least one
    query term (non-matching documents are absent, not zero-scored).
    ``query`` is a list of terms or a string run through the same
    tokenizer as the corpus. ``bm25_topk`` wraps this with the top-k cut;
    rank-fusion callers (``rrf_fuse``) take the scored relation directly
    so the cut happens on the fusion's deterministic rounded-score order.

    Plan shape: one map-only pass computes each doc's token array and
    length; query-term matches (an ``F.filter`` on the array BEFORE
    explode, so non-matching tokens never become rows) aggregate to
    per-(doc, term) term frequencies; document frequencies per term and
    corpus stats (N, avgdl) are tiny aggregates broadcast back. No
    cartesian, no collect, no full-corpus explode — the only corpus-sized
    work is the scan itself.
    """
    if isinstance(query, str):
        import re

        terms = sorted(set(re.findall(WORD_RE, query.lower())))
    else:
        terms = sorted({t.lower() for t in query})
    if not terms:
        raise ValueError("query produced no terms")

    base = df.select(
        F.col(id_col),
        _tokens(text_col).alias("__toks"),
    ).select(
        id_col, "__toks", F.size("__toks").alias("__dl")
    )

    # Corpus stats as a broadcast single-row join (kept in-plan; at 100 TB
    # this agg is map-side combined and its result is one row).
    stats = base.agg(
        F.count(F.lit(1)).alias("__n"),
        F.avg("__dl").alias("__avgdl"),
    )

    term_lit = F.array(*[F.lit(t) for t in terms])
    tf = (
        base.select(
            id_col,
            "__dl",
            F.explode(
                F.filter("__toks", lambda x: F.array_contains(term_lit, x))
            ).alias("__term"),
        )
        .groupBy(id_col, "__dl", "__term")
        .agg(F.count(F.lit(1)).alias("__tf"))
    )

    # Document frequency per term: (doc, term) rows are already distinct.
    dfreq = tf.groupBy("__term").agg(F.count(F.lit(1)).alias("__df"))

    scored = (
        tf.join(F.broadcast(dfreq), "__term")
        .crossJoin(F.broadcast(stats))
        .select(
            id_col,
            (
                F.log(
                    1.0
                    + (F.col("__n") - F.col("__df") + 0.5)
                    / (F.col("__df") + 0.5)
                )
                * (F.col("__tf") * (k1 + 1))
                / (
                    F.col("__tf")
                    + k1
                    * (1 - b + b * F.col("__dl") / F.col("__avgdl"))
                )
            ).alias("__s"),
        )
        .groupBy(id_col)
        .agg(F.sum("__s").alias("score"))
    )
    return scored


def bm25_topk(
    df: DataFrame,
    query: Sequence[str] | str,
    k: int = 10,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 top-k retrieval (``bm25_scores`` + TakeOrderedAndProject
    cut, ties broken by id)."""
    scored = bm25_scores(
        df, query, id_col=id_col, text_col=text_col, k1=k1, b=b
    )
    return scored.orderBy(F.col("score").desc(), F.col(id_col)).limit(k)


def rrf_fuse(
    rankings: Sequence[DataFrame],
    *,
    id_col: str = "doc_id",
    score_col: str = "score",
    k: int = 10,
    c: int = 60,
    top_n: int = 50,
) -> DataFrame:
    """Reciprocal-rank fusion of scored rankings — the standard hybrid-
    retrieval merge (keyword BM25 + embedding cosine): each ranking
    contributes ``1/(c + rank)`` for its top ``top_n`` ids, summed per id,
    top ``k`` fused ids returned as ``(id_col, rrf)``.

    Determinism across engines: every per-ranking cut and rank is taken
    on ``(round(score, 4) DESC, id ASC)`` — never on raw doubles, whose
    last ulp can differ between engines — and each contribution is the
    exact integer ``floor(10^12 / (c + rank))`` ("picounit" reciprocal):
    ``10^12 / (c + rank)`` is ONE IEEE division of exactly-representable
    doubles (correctly rounded, bit-identical on any engine), and the
    per-id sum is then BIGINT arithmetic — exact and order-insensitive
    for ANY number of rankings, not just two (a plain double sum of 3+
    contributions depends on engine execution order in the last ulp).
    The fused score surfaces as ``sum / 10^12`` rounded to 6 before the
    final (rrf DESC, id ASC) top-k; the 1e-12-per-term quantization is
    five orders below the rounding grain. Headroom: contributions are
    <= 10^12/(c+1), so BIGINT overflow needs ~5.6e8 rankings at c=60.

    Plan shape (100 TB): each ranking's top-``top_n`` cut is a
    TakeOrderedAndProject over the ranker's scored relation (distributed
    partial top-k per partition, merged on the driver); the row_number
    window then orders at most ``top_n`` rows, so the single-partition
    window is bounded by construction. The fusion itself touches
    ``len(rankings) × top_n`` rows.
    """
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    from pyspark.sql import Window as W

    contribs = []
    for r in rankings:
        rounded = r.select(
            F.col(id_col), F.round(F.col(score_col), 4).alias("__rs")
        )
        top = rounded.orderBy(F.col("__rs").desc(), F.col(id_col)).limit(top_n)
        w = W.orderBy(F.col("__rs").desc(), F.col(id_col))
        contribs.append(
            top.withColumn("__rank", F.row_number().over(w)).select(
                id_col,
                F.floor(F.lit(1e12) / (F.lit(c) + F.col("__rank")))
                .cast("long")
                .alias("__c"),
            )
        )
    u = contribs[0]
    for extra in contribs[1:]:
        u = u.unionAll(extra)
    fused = u.groupBy(id_col).agg(
        F.round(F.sum("__c").cast("double") / F.lit(1e12), 6).alias("rrf")
    )
    return fused.orderBy(F.col("rrf").desc(), F.col(id_col)).limit(k)


def tfidf_topk(
    df: DataFrame,
    query: Sequence[str] | str,
    k: int = 10,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """TF-IDF top-k retrieval (smooth-idf, sklearn convention): score(d) =
    sum over query terms t of ``tf(t,d) * idf(t)^2`` with ``idf =
    ln((N+1)/(df+1)) + 1`` — the squared idf is the classic lnc.ltc query
    weight collapsed for unit query term frequency.

    Same index-free plan shape as ``bm25_topk`` (its cheaper cousin for
    corpora where length normalization matters less): map-only tokenize,
    filter to query terms BEFORE explode, per-(doc, term) counts, tiny
    broadcast document-frequency and corpus-size relations, one final
    top-k. Corpus-sized work is the scan only — no cartesian, no collect.
    """
    if isinstance(query, str):
        import re

        terms = sorted(set(re.findall(WORD_RE, query.lower())))
    else:
        terms = sorted({t.lower() for t in query})
    if not terms:
        raise ValueError("query produced no terms")

    base = df.select(F.col(id_col), _tokens(text_col).alias("__toks"))
    stats = base.agg(F.count(F.lit(1)).alias("__n"))

    term_lit = F.array(*[F.lit(t) for t in terms])
    tf = (
        base.select(
            id_col,
            F.explode(
                F.filter("__toks", lambda x: F.array_contains(term_lit, x))
            ).alias("__term"),
        )
        .groupBy(id_col, "__term")
        .agg(F.count(F.lit(1)).alias("__tf"))
    )
    dfreq = tf.groupBy("__term").agg(F.count(F.lit(1)).alias("__df"))

    idf = F.log((F.col("__n") + 1.0) / (F.col("__df") + 1.0)) + 1.0
    scored = (
        tf.join(F.broadcast(dfreq), "__term")
        .crossJoin(F.broadcast(stats))
        .select(id_col, (F.col("__tf") * idf * idf).alias("__s"))
        .groupBy(id_col)
        .agg(F.sum("__s").alias("score"))
    )
    return scored.orderBy(F.col("score").desc(), F.col(id_col)).limit(k)


def bigram_nll(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 1.0,
    lam: float = 0.7,
) -> DataFrame:
    """Per-document mean NLL under an interpolated bigram LM trained on the
    corpus itself — one step closer to the KenLM filters than
    ``unigram_nll``: fluent word ORDER now scores better than a bag of
    frequent words.

    Model: ``p(w_i | w_{i-1}) = lam * c2(w_{i-1}, w_i)/c1(w_{i-1}) +
    (1-lam) * (c1(w_i)+alpha)/(T+alpha*V)`` with full (uncapped) corpus
    counts, ``T`` total tokens, ``V`` distinct tokens; a document's first
    token scores by the smoothed unigram term alone. Unseen bigrams get
    probability mass only from the unigram back-off, so the score never
    hits -inf. Returns ``(id_col, n_tokens, nll)``; zero-token docs drop.

    Scale shape: unigram and bigram count relations are plain map-side-
    combined aggregates; scoring joins them back by SHUFFLE join on the
    token / bigram key (co-keyed, linear) — deliberately NOT broadcast,
    because an uncapped corpus vocabulary does not fit a broadcast at
    100 TB. The scalar (T, V) row is the only broadcast.
    """
    # (token, prev-token) rows straight from the array — posexplode gives
    # the position, element_at(pos) reads the predecessor from the same
    # array in one generate stage (no self-join, no window).
    base = df.select(F.col(id_col), _tokens(text_col).alias("__toks"))
    toks = base.select(
        id_col,
        F.col("__toks"),
        F.posexplode("__toks").alias("__pos", "__w"),
    ).select(
        id_col,
        "__pos",
        "__w",
        F.when(
            F.col("__pos") > 0, F.element_at("__toks", F.col("__pos"))
        ).alias("__prev"),
    )

    c1 = toks.groupBy("__w").agg(F.count(F.lit(1)).alias("__c1"))
    c2 = (
        toks.filter(F.col("__prev").isNotNull())
        .groupBy("__prev", "__w")
        .agg(F.count(F.lit(1)).alias("__c2"))
    )
    totals = c1.agg(
        F.sum("__c1").cast("double").alias("__t"),
        F.count(F.lit(1)).cast("double").alias("__v"),
    )

    uni = toks.join(c1, on="__w").crossJoin(F.broadcast(totals)).select(
        id_col,
        "__pos",
        "__w",
        "__prev",
        (
            (F.col("__c1") + F.lit(alpha))
            / (F.col("__t") + F.lit(alpha) * (F.col("__v") + 1))
        ).alias("__pu"),
    )
    prev_counts = c1.select(F.col("__w").alias("__prev"), F.col("__c1").alias("__cprev"))
    scored = (
        uni.join(c2, on=["__prev", "__w"], how="left")
        .join(prev_counts, on="__prev", how="left")
        .select(
            id_col,
            F.when(
                F.col("__prev").isNull(), F.col("__pu")
            ).otherwise(
                F.lit(lam)
                * (F.coalesce(F.col("__c2"), F.lit(0)) / F.col("__cprev"))
                + F.lit(1 - lam) * F.col("__pu")
            ).alias("__p"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.avg(-F.log("__p")).alias("nll"),
    )


def unigram_nll(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_size: int = 1000,
    alpha: float = 1.0,
) -> DataFrame:
    """Per-document mean negative log-likelihood under a corpus unigram LM
    — the cheap analog of the KenLM perplexity quality filters in
    CCNet-style curation (high NLL = unusual token mix = gibberish or
    off-distribution; low NLL = fluent, in-distribution text).

    The model is add-``alpha``-smoothed over the corpus's top-``vocab_size``
    tokens; everything outside the vocab shares one OOV count-0 bucket:
    ``p(t) = (count_vocab(t) + alpha) / (total_tokens + alpha*(V+1))``.

    Returns ``(id_col, n_tokens, nll)`` with ``nll`` the mean ``-ln p``
    over the doc's tokens (docs with zero tokens are dropped — they have
    no likelihood). Deterministic: vocab boundary ties break by token.

    Plan shape: vocab = explode -> map-side-combined count -> TakeOrdered
    (bounded by V); total-token count rides the same aggregate tree; the
    scoring pass is one explode + broadcast-join(vocab) + per-doc agg.
    The broadcast is V rows regardless of corpus size.
    """
    toks = df.select(F.col(id_col), F.explode(_tokens(text_col)).alias("__t"))
    counts = toks.groupBy("__t").agg(F.count(F.lit(1)).alias("__c"))
    vocab = counts.orderBy(F.col("__c").desc(), "__t").limit(vocab_size)
    totals = counts.agg(
        F.sum("__c").alias("__total"),
        F.least(F.count(F.lit(1)), F.lit(vocab_size)).alias("__v"),
    )
    return (
        toks.join(F.broadcast(vocab), "__t", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            id_col,
            (
                -F.log(
                    (F.coalesce(F.col("__c"), F.lit(0)) + F.lit(alpha))
                    / (F.col("__total") + F.lit(alpha) * (F.col("__v") + 1))
                )
            ).alias("__nl"),
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.avg("__nl").alias("nll"),
        )
    )


N_TERM_BUCKETS = 64


def build_text_index(
    df: DataFrame,
    path: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Persist a BM25 postings index: (term, doc, tf, doc-length) rows
    PARTITIONED BY a hash bucket of the term, plus the corpus stats
    (N, avgdl) and per-term document frequencies. A query then reads
    ONLY the buckets its terms hash into — partition pruning over the
    postings, the inverted-index analog of the IVF cell layout. Rebuild
    as the corpus changes (or append new docs' postings and accept
    slightly stale df/avgdl, like any search engine's segment model)."""
    base = df.select(
        F.col(id_col), _tokens(text_col).alias("__toks")
    ).select(id_col, "__toks", F.size("__toks").alias("dl"))
    postings = (
        base.select(id_col, "dl", F.explode("__toks").alias("term"))
        .groupBy(id_col, "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn(
            "bucket", F.pmod(F.xxhash64("term"), F.lit(N_TERM_BUCKETS))
        )
    )
    postings.write.mode("overwrite").partitionBy("bucket").parquet(
        f"{path}/postings"
    )
    spark = df.sparkSession
    spark.catalog.refreshByPath(f"{path}/postings")
    written = spark.read.parquet(f"{path}/postings")
    dfreq = written.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    dfreq.write.mode("overwrite").parquet(f"{path}/dfreq")
    base.agg(
        F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl")
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/stats")


def bm25_topk_indexed(
    spark,
    path: str,
    query: "Sequence[str] | str",
    k: int = 10,
    *,
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 top-k against a PERSISTED index (``build_text_index``):
    the postings scan prunes to the query terms' hash buckets — at most
    |terms| directories open regardless of corpus size — and the term
    filter inside each bucket pushes to parquet. Scoring math and
    tie-breaks match the index-free ``bm25_topk`` exactly."""
    if isinstance(query, str):
        import re

        terms = sorted(set(re.findall(WORD_RE, query.lower())))
    else:
        terms = sorted({t.lower() for t in query})
    if not terms:
        raise ValueError("query produced no terms")

    # the query terms' buckets, via the SAME xxhash64 the index used — a
    # one-row-per-term Spark job (|terms| values to the driver), since
    # Spark's xxhash64 has no portable Python twin
    tdf = spark.createDataFrame([(t,) for t in terms], "term string")
    buckets = sorted(
        {
            r.b
            for r in tdf.select(
                F.pmod(F.xxhash64("term"), F.lit(N_TERM_BUCKETS)).alias("b")
            ).collect()
        }
    )
    spark.catalog.refreshByPath(f"{path}/postings")
    postings = (
        spark.read.parquet(f"{path}/postings")
        .filter(F.col("bucket").isin(buckets))  # partition pruning
        .filter(F.col("term").isin(terms))      # pushed within buckets
    )
    dfreq = spark.read.parquet(f"{path}/dfreq").filter(
        F.col("term").isin(terms)
    )
    stats = spark.read.parquet(f"{path}/stats")
    scored = (
        postings.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            id_col,
            (
                F.log(
                    1.0
                    + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                )
                * (F.col("tf") * (k1 + 1))
                / (
                    F.col("tf")
                    + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
                )
            ).alias("__s"),
        )
        .groupBy(id_col)
        .agg(F.sum("__s").alias("score"))
    )
    return scored.orderBy(F.col("score").desc(), F.col(id_col)).limit(k)
