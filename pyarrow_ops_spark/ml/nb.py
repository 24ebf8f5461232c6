"""Multinomial Naive Bayes text classifier as pure Catalyst aggregations.

The fastText-shaped step of a curation pipeline — score/route documents
by a token-count model (quality tiers, domain routing, language ID) —
with a property MLlib models can't offer: training AND inference are
closed-form count arithmetic, so a SQL engine can replay both and the
whole lifecycle hash-certifies against a DuckDB oracle (no planted
invariant needed; the probabilities themselves are checked).

Scoring uses the FACTORED log form

    logp(c | d) = ln(P(c)) - K_d * ln(N_c + V) + Σ_{w∈d, c_wc>0} k_w * ln(c_wc + 1)

which is algebraically the Laplace-smoothed multinomial NB but (a) makes
absent (token, class) pairs contribute exactly 0 — no per-class
complement join for smoothing — and (b) is the byte-identical expression
the oracle replays, so engines agree to the last ulp class margin (the
ADVICE float-boundary discipline: same collapsed formula on both sides,
not just algebraic equality).

Scale shape: training is two map-side-combined aggregates (per-class
token counts shuffle on (class, token); class totals on class). The
model is |vocab| x |classes| count rows plus a |classes|-row stats
relation and two scalars (train size, vocab size). Inference joins eval
tokens to the count relation ON THE TOKEN (one linear shuffle; broadcast
when the vocab is capped), aggregates per (doc, class), and takes the
per-doc argmax over |classes| rows — nothing is ever quadratic in corpus
size and no text leaves the executors.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TOKEN_PATTERN = "[a-z0-9]+"


def _tokens(text_col: str) -> "F.Column":
    return F.expr(f"regexp_extract_all(lower({text_col}), '{_TOKEN_PATTERN}', 0)")


@dataclass
class NBModel:
    """Fitted NB: per-(class, token) counts, per-class stats, scalars."""

    word_counts: DataFrame  # (label, w, c)
    class_stats: DataFrame  # (label, n_tokens, n_docs)
    n_train_docs: float
    vocab_size: float


def nb_fit(
    train: DataFrame, label_col: str = "label", text_col: str = "text"
) -> NBModel:
    """Fit multinomial NB with add-one smoothing from a labeled corpus.

    Two aggregates over the exploded token stream; the only driver-side
    values are two scalars (train row count, distinct-vocab size)."""
    from pyspark import StorageLevel

    tok = train.select(
        F.col(label_col).alias("label"), F.explode(_tokens(text_col)).alias("w")
    )
    wc = tok.groupBy("label", "w").agg(F.count(F.lit(1)).alias("c")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    n_tokens = tok.groupBy("label").agg(F.count(F.lit(1)).alias("n_tokens"))
    n_docs = train.groupBy(F.col(label_col).alias("label")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    stats = n_tokens.join(n_docs, on="label")
    # two bounded scalars; wc is materialized once by the vocab count
    vocab = wc.select("w").distinct().count()
    n_train = train.count()
    return NBModel(wc, stats, float(n_train), float(vocab))


def nb_predict(
    model: NBModel,
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score and classify: (id, predicted, logp) — predicted is the argmax
    class (ties broken by label order), logp its smoothed log joint.

    Documents with zero tokens score on priors + the smoothing mass alone
    (K_d = 0), so every input row gets a prediction."""
    etok = (
        df.select(F.col(id_col), F.explode(_tokens(text_col)).alias("w"))
        .groupBy(id_col, "w")
        .agg(F.count(F.lit(1)).cast("double").alias("k"))
    )
    edoc = df.select(id_col).join(
        etok.groupBy(id_col).agg(F.sum("k").alias("kk")), on=id_col, how="left"
    ).fillna({"kk": 0.0})
    known = (
        etok.join(model.word_counts, on="w")
        .groupBy(id_col, "label")
        .agg(F.sum(F.col("k") * F.log(F.col("c") + F.lit(1.0))).alias("s"))
    )
    scored = (
        edoc.crossJoin(F.broadcast(model.class_stats))
        .join(known, on=[id_col, "label"], how="left")
        .select(
            F.col(id_col),
            F.col("label"),
            (
                F.log(F.col("n_docs") / F.lit(model.n_train_docs))
                - F.col("kk")
                * F.log(F.col("n_tokens") + F.lit(model.vocab_size))
                + F.coalesce(F.col("s"), F.lit(0.0))
            ).alias("logp"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.col("logp").desc(), F.col("label"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(F.col(id_col), F.col("label").alias("predicted"), "logp")
    )
