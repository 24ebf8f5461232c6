"""Unit tests for BM25 retrieval, unigram-LM NLL, and leakage-safe splits."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from pyarrow_ops_spark.functions.search import bm25_topk, unigram_nll
from pyarrow_ops_spark.operators.sample import split_by_key


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [
            (1, "spark engine spark engine spark"),
            (2, "spark is a distributed engine"),
            (3, "cats and dogs and cats"),
            (4, "the quick brown fox"),
            (5, ""),
        ],
        ["doc_id", "text"],
    )


class TestBM25:
    def test_tf_and_rarity_ranking(self, corpus):
        rows = bm25_topk(corpus, "spark", k=10).collect()
        # Only docs containing 'spark' are returned, best tf first.
        assert [r["doc_id"] for r in rows] == [1, 2]
        assert rows[0]["score"] > rows[1]["score"] > 0

    def test_multi_term_sums_scores(self, corpus):
        one = {r["doc_id"]: r["score"] for r in bm25_topk(corpus, "spark", k=10).collect()}
        both = {r["doc_id"]: r["score"] for r in bm25_topk(corpus, "spark engine", k=10).collect()}
        assert both[2] > one[2]  # extra matched term adds score

    def test_hand_computed_single_term(self, corpus):
        # Corpus: N=5 docs, dl = [5, 5, 5, 4, 0], avgdl = 19/5.
        # 'fox': df=1, tf=1 in doc 4 (dl=4).
        rows = bm25_topk(corpus, "fox", k=10).collect()
        assert len(rows) == 1 and rows[0]["doc_id"] == 4
        avgdl = 19 / 5
        idf = math.log(1 + (5 - 1 + 0.5) / (1 + 0.5))
        expected = idf * (1 * 2.2) / (1 + 1.2 * (1 - 0.75 + 0.75 * 4 / avgdl))
        assert rows[0]["score"] == pytest.approx(expected, rel=1e-12)

    def test_query_string_tokenized_like_corpus(self, corpus):
        # Punctuation/case in the query string is normalized away.
        a = bm25_topk(corpus, "SPARK, engine!", k=10).collect()
        b = bm25_topk(corpus, ["spark", "engine"], k=10).collect()
        assert [(r["doc_id"], r["score"]) for r in a] == [
            (r["doc_id"], r["score"]) for r in b
        ]

    def test_k_limits(self, corpus):
        assert len(bm25_topk(corpus, "and spark the", k=2).collect()) == 2

    def test_empty_query_raises(self, corpus):
        with pytest.raises(ValueError):
            bm25_topk(corpus, "!!!", k=5)


class TestUnigramNLL:
    def test_hand_computed(self, spark):
        df = spark.createDataFrame([(1, "a a b"), (2, "c")], ["doc_id", "text"])
        # counts: a=2, b=1, c=1; total=4, V=3 (cap 500 unused), alpha=1.
        out = {r["doc_id"]: r for r in unigram_nll(df, vocab_size=500).collect()}
        denom = 4 + 1.0 * (3 + 1)
        nll1 = -(2 * math.log(3 / denom) + math.log(2 / denom)) / 3
        nll2 = -math.log(2 / denom)
        assert out[1]["n_tokens"] == 3 and out[1]["nll"] == pytest.approx(nll1)
        assert out[2]["n_tokens"] == 1 and out[2]["nll"] == pytest.approx(nll2)

    def test_oov_scores_worse_than_vocab(self, spark):
        rows = [(i, "common words common words") for i in range(20)]
        rows.append((100, "zzyzx qwfp"))
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        out = {r["doc_id"]: r["nll"] for r in unigram_nll(df, vocab_size=2).collect()}
        assert out[100] > out[0]  # OOV-only doc is least likely

    def test_empty_docs_dropped(self, spark):
        df = spark.createDataFrame([(1, "a"), (2, "")], ["doc_id", "text"])
        assert [r["doc_id"] for r in unigram_nll(df).collect()] == [1]


class TestSplitByKey:
    def test_keys_never_straddle_splits(self, spark):
        # 3 rows per key; every key's rows must share one split label.
        df = spark.range(300).select(
            (F.col("id") % 100).alias("k"), F.col("id").alias("v")
        )
        out = split_by_key(df, ["k"], {"train": 8, "valid": 1, "test": 1})
        per_key = out.groupBy("k").agg(F.countDistinct("split").alias("n")).collect()
        assert all(r["n"] == 1 for r in per_key)

    def test_total_coverage_and_rough_proportions(self, spark):
        df = spark.range(5000).select(F.col("id").alias("k"))
        out = split_by_key(df, ["k"], {"train": 8, "valid": 1, "test": 1})
        counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
        assert sum(counts.values()) == 5000
        assert counts["train"] == pytest.approx(4000, rel=0.05)
        assert counts["valid"] == pytest.approx(500, rel=0.25)
        assert counts["test"] == pytest.approx(500, rel=0.25)

    def test_seed_rotates_assignment(self, spark):
        df = spark.range(1000).select(F.col("id").alias("k"))
        a = split_by_key(df, ["k"], {"train": 1, "test": 1}, seed="a")
        b = split_by_key(df, ["k"], {"train": 1, "test": 1}, seed="b")
        moved = (
            a.alias("a")
            .join(b.alias("b"), F.col("a.k") == F.col("b.k"))
            .filter(F.col("a.split") != F.col("b.split"))
            .count()
        )
        assert moved > 100  # independent draws disagree on ~half

    def test_validation(self, spark):
        df = spark.range(10).select(F.col("id").alias("k"))
        with pytest.raises(ValueError):
            split_by_key(df, ["k"], {})
        with pytest.raises(ValueError):
            split_by_key(df, ["k"], {"train": 0})


class TestBigramNLL:
    def test_hand_computed(self, spark):
        import math
        from pyarrow_ops_spark.functions.search import bigram_nll

        df = spark.createDataFrame([(1, "a b a"), (2, "b a")], ["doc_id", "text"])
        # c1: a=3 b=2; T=5 V=2; c2: (a,b)=1 (b,a)=2
        pu_a = 4 / 8
        pu_b = 3 / 8
        out = {r["doc_id"]: r for r in bigram_nll(df).collect()}
        p_doc1 = [pu_a, 0.7 * (1 / 3) + 0.3 * pu_b, 0.7 * (2 / 2) + 0.3 * pu_a]
        nll1 = -sum(math.log(p) for p in p_doc1) / 3
        assert out[1]["n_tokens"] == 3
        assert out[1]["nll"] == pytest.approx(nll1, rel=1e-12)
        p_doc2 = [pu_b, 0.7 * (2 / 2) + 0.3 * pu_a]
        nll2 = -sum(math.log(p) for p in p_doc2) / 2
        assert out[2]["nll"] == pytest.approx(nll2, rel=1e-12)

    def test_word_order_matters(self, spark):
        from pyarrow_ops_spark.functions.search import bigram_nll

        # fluent repeated phrase vs the same words shuffled: the corpus is
        # dominated by "the quick fox", so the in-order doc scores lower NLL
        rows = [(i, "the quick fox") for i in range(20)]
        rows += [(100, "the quick fox"), (101, "fox the quick")]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        out = {r["doc_id"]: r["nll"] for r in bigram_nll(df).collect()}
        assert out[100] < out[101]

    def test_empty_docs_dropped(self, spark):
        from pyarrow_ops_spark.functions.search import bigram_nll

        df = spark.createDataFrame([(1, "a b"), (2, "!!!")], ["doc_id", "text"])
        assert [r["doc_id"] for r in bigram_nll(df).collect()] == [1]


class TestTfidf:
    def test_hand_computed_single_doc(self, spark):
        from pyarrow_ops_spark.functions.search import tfidf_topk
        import math

        df = spark.createDataFrame(
            [(1, "spark spark flink"), (2, "flink beam"), (3, "ray")],
            "doc_id long, text string",
        )
        out = {r.doc_id: r.score for r in tfidf_topk(df, "spark", k=3).collect()}
        # spark: tf=2 in doc 1 only; df=1, N=3
        idf = math.log((3 + 1) / (1 + 1)) + 1
        assert out.keys() == {1}
        assert abs(out[1] - 2 * idf * idf) < 1e-9

    def test_rarity_beats_frequency(self, spark):
        from pyarrow_ops_spark.functions.search import tfidf_topk

        rows = [(i, "common filler words here") for i in range(10)]
        rows.append((100, "rareterm appears once"))
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = tfidf_topk(df, "common rareterm", k=1).collect()
        assert out[0].doc_id == 100  # idf of rareterm dominates

    def test_k_and_ties(self, spark):
        from pyarrow_ops_spark.functions.search import tfidf_topk

        df = spark.createDataFrame(
            [(i, "same text") for i in range(5)], "doc_id long, text string"
        )
        out = tfidf_topk(df, "same", k=3).collect()
        assert [r.doc_id for r in out] == [0, 1, 2]  # id tie-break


class TestIndexedBM25:
    def test_indexed_matches_index_free(self, spark, tmp_path):
        from pyarrow_ops_spark.functions.search import (
            bm25_topk,
            bm25_topk_indexed,
            build_text_index,
        )
        from pyarrow_ops_spark.sources.tables import load_table
        from tests.conftest import SF_DIR

        docs = load_table(spark, "documents", SF_DIR)
        idx = str(tmp_path / "text_index")
        build_text_index(docs, idx)
        q = "the data pipeline model"
        free = [(r.doc_id, round(r.score, 4)) for r in bm25_topk(docs, q, k=10).collect()]
        indexed = [
            (r.doc_id, round(r.score, 4))
            for r in bm25_topk_indexed(spark, idx, q, k=10).collect()
        ]
        assert indexed == free

    def test_postings_partitioned_by_bucket(self, spark, tmp_path):
        import glob
        from pyarrow_ops_spark.functions.search import build_text_index
        from pyarrow_ops_spark.sources.tables import load_table
        from tests.conftest import SF_DIR

        docs = load_table(spark, "documents", SF_DIR).limit(50)
        idx = str(tmp_path / "ti2")
        build_text_index(docs, idx)
        assert len(glob.glob(f"{idx}/postings/bucket=*")) > 1

    def test_empty_query_raises(self, spark, tmp_path):
        from pyarrow_ops_spark.functions.search import bm25_topk_indexed

        with pytest.raises(ValueError):
            bm25_topk_indexed(spark, str(tmp_path), "!!!")


class TestRrfFuse:
    def _rank(self, spark, pairs):
        return spark.createDataFrame(pairs, ["doc_id", "score"])

    def test_fusion_math_exact(self, spark):
        from pyarrow_ops_spark.functions.search import rrf_fuse

        r1 = self._rank(spark, [(1, 3.0), (2, 2.0), (3, 1.0)])
        r2 = self._rank(spark, [(3, 9.0), (1, 8.0), (4, 7.0)])
        out = {r["doc_id"]: r["rrf"] for r in rrf_fuse([r1, r2], k=10, c=60).collect()}
        # ranks: r1 -> 1:1, 2:2, 3:3 ; r2 -> 3:1, 1:2, 4:3
        assert out[1] == round(1 / 61 + 1 / 62, 6)
        assert out[3] == round(1 / 63 + 1 / 61, 6)
        assert out[2] == round(1 / 62, 6)
        assert out[4] == round(1 / 63, 6)

    def test_top_n_cut_on_rounded_score(self, spark):
        from pyarrow_ops_spark.functions.search import rrf_fuse

        # 5 docs, top_n=3: ids ranked by (round(score,4) desc, id asc) —
        # the two raw-score ties at 1.00001/1.00004 round to the SAME
        # 1.0, so the cut falls to the id tiebreak, doc 4 in, doc 5 out
        r = self._rank(
            spark,
            [(1, 2.0), (2, 1.5), (3, 1.2), (4, 1.00004), (5, 1.00001)],
        )
        out = {row["doc_id"] for row in rrf_fuse([r], k=10, top_n=3).collect()}
        assert out == {1, 2, 3}
        out4 = {row["doc_id"] for row in rrf_fuse([r], k=10, top_n=4).collect()}
        assert out4 == {1, 2, 3, 4}

    def test_single_ranker_identity_order(self, spark):
        from pyarrow_ops_spark.functions.search import rrf_fuse

        r = self._rank(spark, [(i, float(100 - i)) for i in range(20)])
        rows = rrf_fuse([r], k=5).collect()
        assert [x["doc_id"] for x in rows] == [0, 1, 2, 3, 4]
        with pytest.raises(ValueError):
            rrf_fuse([])

    def test_hybrid_entry_plan_has_no_unbounded_window(self, spark):
        """The fusion's row_number windows must consume LIMIT top_n
        relations (TakeOrderedAndProject feeds each window), so the
        single-partition window is bounded by construction."""
        from pyarrow_ops_spark.entry_queries import ALL_QUERIES
        from tests.conftest import SF_DIR

        plan = ALL_QUERIES["search_hybrid_rrf"](spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan


def test_rrf_fuse_three_rankers_matches_duckdb(spark, duck):
    """3+ rankers used to rely on engine addition order in the last ulp;
    contributions are now exact BIGINT floor(1e12/(c+rank)) so the fused
    hash is engine-stable for any ranker count — proven here against a
    DuckDB mirror of the full fusion on three synthetic rankings."""
    from pyarrow_ops_spark.functions.search import rrf_fuse
    from tests.conftest import rows_to_set

    base = spark.range(100).select(F.col("id").cast("long").alias("doc_id"))
    rankers = [
        base.select("doc_id", ((F.col("doc_id") * 37) % 101).cast("double").alias("score")),
        base.select("doc_id", ((F.col("doc_id") * 53 + 7) % 97).cast("double").alias("score")),
        base.select("doc_id", ((F.col("doc_id") * 29 + 11) % 89).cast("double").alias("score")),
    ]
    got = rrf_fuse(rankers, k=15, c=60, top_n=50)
    sql = """
    WITH ids AS (SELECT range AS doc_id FROM range(100)),
    r1 AS (SELECT doc_id, CAST((doc_id * 37) % 101 AS DOUBLE) AS s FROM ids),
    r2 AS (SELECT doc_id, CAST((doc_id * 53 + 7) % 97 AS DOUBLE) AS s FROM ids),
    r3 AS (SELECT doc_id, CAST((doc_id * 29 + 11) % 89 AS DOUBLE) AS s FROM ids),
    k1 AS (SELECT doc_id, row_number() OVER (ORDER BY round(s, 4) DESC, doc_id) AS r FROM r1),
    k2 AS (SELECT doc_id, row_number() OVER (ORDER BY round(s, 4) DESC, doc_id) AS r FROM r2),
    k3 AS (SELECT doc_id, row_number() OVER (ORDER BY round(s, 4) DESC, doc_id) AS r FROM r3),
    contrib AS (
        SELECT doc_id, CAST(floor(1000000000000.0 / (60 + r)) AS BIGINT) AS c
        FROM k1 WHERE r <= 50
        UNION ALL
        SELECT doc_id, CAST(floor(1000000000000.0 / (60 + r)) AS BIGINT) AS c
        FROM k2 WHERE r <= 50
        UNION ALL
        SELECT doc_id, CAST(floor(1000000000000.0 / (60 + r)) AS BIGINT) AS c
        FROM k3 WHERE r <= 50
    )
    SELECT doc_id, round(CAST(sum(c) AS DOUBLE) / 1000000000000.0, 6) AS rrf
    FROM contrib GROUP BY doc_id ORDER BY rrf DESC, doc_id LIMIT 15
    """
    scols = list(got.columns)
    srows = [tuple(r) for r in got.collect()]
    res = duck.execute(sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(scols) == sorted(dcols)
    assert len(srows) == len(drows) == 15
    assert rows_to_set(scols, srows) == rows_to_set(dcols, drows)
