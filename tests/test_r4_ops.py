"""Round-4 operators: n-gram eval decontamination, per-key exact sampling,
token-budget mixtures, quality rule filter."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyarrow_ops_spark.functions import dedup as D
from pyarrow_ops_spark.functions import text as TX
from pyarrow_ops_spark.operators import sample as SM
from pyarrow_ops_spark.sources.tables import load_table
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, "documents", SF_DIR)


@pytest.fixture(scope="module")
def events(spark):
    return load_table(spark, "events", SF_DIR)


# -- ngram decontamination --------------------------------------------------


def test_word_ngrams_short_doc_empty(spark):
    df = spark.createDataFrame([("a b",), ("",), (None,)], ["text"])
    rows = df.select(D.word_ngrams("text", 3).alias("g")).collect()
    assert rows[0].g == []
    assert rows[1].g == []
    # null text degrades to the empty gram set (the WHEN guard's null
    # comparison falls through to the otherwise branch), not a crash
    assert rows[2].g == []


def test_word_ngrams_normalizes_case_and_punct(spark):
    df = spark.createDataFrame([("The  QUICK, brown-fox jumps!",)], ["text"])
    (row,) = df.select(D.word_ngrams("text", 3).alias("g")).collect()
    assert row.g == ["the quick brown", "quick brown fox", "brown fox jumps"]


def test_ngram_decontaminate_drops_planted_contamination(spark, docs):
    # plant one eval doc verbatim inside train under a fresh id
    ev = docs.limit(1)
    leak = ev.withColumn("doc_id", F.col("doc_id") + 1_000_000)
    train = docs.filter(F.col("doc_id") > 100).unionByName(leak)
    cleaned = D.ngram_decontaminate(train, ev, n=5)
    kept_ids = {r.doc_id for r in cleaned.select("doc_id").collect()}
    assert (leak.first().doc_id) not in kept_ids
    # overlap counts are positive only for the leak (plus any organic hits)
    flagged = D.ngram_overlap(train, ev, n=5)
    leak_row = flagged.filter(F.col("doc_id") == leak.first().doc_id).first()
    assert leak_row is not None and leak_row.n_matched >= 1


def test_ngram_overlap_counts_distinct_grams_once(spark):
    # train doc repeats the same contaminated trigram -> counted once
    ev = spark.createDataFrame([(1, "alpha beta gamma")], ["doc_id", "text"])
    tr = spark.createDataFrame(
        [(2, "alpha beta gamma and alpha beta gamma again")], ["doc_id", "text"]
    )
    (row,) = D.ngram_overlap(tr, ev, n=3).collect()
    # shared distinct trigrams: 'alpha beta gamma' only
    assert (row.doc_id, row.n_matched) == (2, 1)


# -- per-key exact sampling -------------------------------------------------


def test_sample_per_key_exact_counts(spark, events):
    out = SM.sample_per_key(events, ["user_id"], 3, ["event_id"])
    sizes = (
        events.groupBy("user_id").count().withColumnRenamed("count", "n")
    )
    got = out.groupBy("user_id").count().withColumnRenamed("count", "k")
    joined = sizes.join(got, "user_id", "left").fillna(0, ["k"])
    bad = joined.filter(
        F.col("k") != F.least(F.lit(3), F.col("n"))
    ).count()
    assert bad == 0


def test_sample_per_key_deterministic_under_repartition(spark, events):
    a = SM.sample_per_key(events, ["user_id"], 2, ["event_id"])
    b = SM.sample_per_key(events.repartition(7), ["user_id"], 2, ["event_id"])
    assert a.select("event_id").exceptAll(b.select("event_id")).count() == 0


def test_sample_per_key_rejects_bad_k(spark, events):
    with pytest.raises(ValueError):
        SM.sample_per_key(events, ["user_id"], 0, ["event_id"])


def test_sample_per_key_seed_rotates_draw(spark, events):
    a = SM.sample_per_key(events, ["user_id"], 1, ["event_id"])
    b = SM.sample_per_key(events, ["user_id"], 1, ["event_id"], seed="r2")
    assert a.select("event_id").exceptAll(b.select("event_id")).count() > 0


# -- token-budget sampling --------------------------------------------------


def test_token_budget_never_overshoots(spark, docs):
    d = docs.select("doc_id", "source", TX.token_count("text").alias("t"))
    out = SM.token_budget_sample(d, "source", 500, "t", ["doc_id"])
    totals = out.groupBy("source").agg(F.sum("t").alias("total"))
    assert totals.filter(F.col("total") > 500).count() == 0
    # and the budget is actually approached: adding the next doc would
    # overshoot, so every stratum is at least half full for 500-token
    # budgets over ~50-token docs
    assert totals.filter(F.col("total") < 250).count() == 0


def test_token_budget_keeps_prefix_of_hash_order(spark, docs):
    d = docs.select("doc_id", "source", TX.token_count("text").alias("t"))
    out = SM.token_budget_sample(d, "source", 500, "t", ["doc_id"], cum_col="cum")
    # cum column is a strict running total consistent with kept tokens
    bad = out.filter(F.col("cum") > 500).count()
    assert bad == 0


def test_token_budget_rejects_bad_budget(spark, docs):
    d = docs.select("doc_id", "source", TX.token_count("text").alias("t"))
    with pytest.raises(ValueError):
        SM.token_budget_sample(d, "source", 0, "t", ["doc_id"])


# -- quality filter ---------------------------------------------------------


def test_quality_filter_empty_text_rejected(spark):
    df = spark.createDataFrame([(1, ""), (2, "short text")], ["doc_id", "text"])
    rows = {r.doc_id: r for r in TX.quality_filter(df).collect()}
    assert rows[1].keep is False and rows[1].reject_reason == "too_short"
    assert rows[2].keep is False and rows[2].reject_reason == "too_short"


def test_quality_filter_rule_precedence(spark):
    # symbol soup long enough to pass the length gate fails word_length
    soup = " ".join(["xxxxxxxxxxxxxxxxxxxxxxxxxxxxxx"] * 20)
    ok = " ".join(["plain words flow here nicely"] * 10)
    df = spark.createDataFrame([(1, soup), (2, ok)], ["doc_id", "text"])
    rows = {r.doc_id: r for r in TX.quality_filter(df).collect()}
    assert rows[1].reject_reason == "word_length"
    assert rows[2].keep is True and rows[2].reject_reason is None


def test_quality_filter_letter_ratio(spark):
    digits = " ".join(["1234 567 89 000 12 345"] * 10)
    df = spark.createDataFrame([(1, digits)], ["doc_id", "text"])
    (row,) = TX.quality_filter(df).collect()
    assert row.keep is False and row.reject_reason == "letter_ratio"


# -- duplicated spans (Lee et al. substring dedup) --------------------------


def test_duplicated_spans_finds_shared_boilerplate(spark):
    # two docs share an 8-token license header, then diverge entirely
    header = "this work is licensed under the creative commons"
    df = spark.createDataFrame(
        [
            (1, header + " apples oranges pears bananas kiwi melon"),
            (2, header + " zebra yak xerus wombat vole urchin"),
            (3, "completely unrelated text with no overlap at all present"),
        ],
        ["doc_id", "text"],
    )
    out = D.duplicated_spans(df, n=5, min_df=2)
    rows = {r.doc_id: r for r in out.collect()}
    # the header is 8 tokens -> 5-gram positions 1..4 merge into one span
    assert rows[1].span_start == 1 and rows[1].span_end == 8
    assert rows[1].n_dup_grams == 4
    assert rows[2].span_start == 1 and rows[2].span_end == 8
    assert 3 not in rows


def test_duplicated_spans_merges_adjacent_and_splits_gapped(spark):
    shared_a = "one two three four five"
    shared_b = "alpha beta gamma delta epsilon"
    # doc 1: shared_a ... long unique gap ... shared_b -> TWO spans
    gap = "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10"
    df = spark.createDataFrame(
        [
            (1, f"{shared_a} {gap} {shared_b}"),
            (2, shared_a),
            (3, shared_b),
        ],
        ["doc_id", "text"],
    )
    out = D.duplicated_spans(df, n=5, min_df=2)
    doc1 = sorted(
        [(r.span_start, r.span_end) for r in out.filter(F.col("doc_id") == 1).collect()]
    )
    assert doc1 == [(1, 5), (16, 20)]


def test_duplicated_spans_within_doc_repeat_not_cross_doc(spark):
    # a gram repeated inside ONE doc only (docfreq=1) is not a duplicate
    df = spark.createDataFrame(
        [(1, "echo echo echo echo echo echo echo echo"), (2, "nothing shared here at all today")],
        ["doc_id", "text"],
    )
    assert D.duplicated_spans(df, n=5, min_df=2).count() == 0


def test_strip_duplicated_spans_cuts_shared_text_only(spark):
    header = "this work is licensed under the creative commons"
    df = spark.createDataFrame(
        [
            (1, header + " apples oranges pears bananas kiwi"),
            (2, header + " zebra yak xerus wombat vole"),
            (3, "completely unrelated text with no overlap at all present"),
        ],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in D.strip_duplicated_spans(df, n=5, min_df=2).collect()}
    assert rows[1].clean_text == "apples oranges pears bananas kiwi"
    assert rows[2].clean_text == "zebra yak xerus wombat vole"
    assert rows[1].n_tokens == 13 and rows[1].n_tokens_kept == 5
    # untouched doc keeps every token
    assert rows[3].n_tokens_kept == rows[3].n_tokens
    assert rows[3].clean_text.startswith("completely unrelated")


# -- bloom decontamination --------------------------------------------------


def test_decontaminate_bloom_equals_exact(spark, docs):
    test = docs.filter(F.col("doc_id") % 9 == 0)
    exact = D.decontaminate(docs, test).select("doc_id")
    bloom = D.decontaminate_bloom(docs, test).select("doc_id")
    assert exact.exceptAll(bloom).count() == 0
    assert bloom.exceptAll(exact).count() == 0


def test_decontaminate_bloom_tiny_filter_still_exact(spark, docs):
    # pathologically small bitmap -> many false positives -> the exact
    # verify join must still produce the precise answer
    test = docs.filter(F.col("doc_id") % 17 == 0)
    exact = D.decontaminate(docs, test).select("doc_id")
    bloom = D.decontaminate_bloom(docs, test, num_bits=1 << 10, num_hashes=2).select(
        "doc_id"
    )
    assert exact.exceptAll(bloom).count() == 0
    assert bloom.exceptAll(exact).count() == 0


def test_decontaminate_bloom_empty_eval_keeps_all(spark, docs):
    test = docs.filter(F.lit(False))
    assert D.decontaminate_bloom(docs, test).count() == docs.count()


def test_decontaminate_bloom_many_partitions_one_driver_bitmap(spark, docs):
    # The eval side at 50 partitions exercises the executor-side tree OR:
    # the in-function assert guarantees the driver receives exactly one
    # m/8-byte bitmap (collecting per-partition partials would be
    # n_partitions x 512 KiB at the default size); the result must still
    # equal the exact path.
    test = docs.filter(F.col("doc_id") % 9 == 0).repartition(50)
    exact = D.decontaminate(docs, test).select("doc_id")
    bloom = D.decontaminate_bloom(docs, test).select("doc_id")
    assert exact.exceptAll(bloom).count() == 0
    assert bloom.exceptAll(exact).count() == 0
