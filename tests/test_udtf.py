"""Python UDTF surface (Spark 3.5+): one input row -> many output rows via
a user table function — the formal UDTF extension point the reference
lacks (SURVEY §2.2 'UDF/UDAF/UDTF')."""

from __future__ import annotations

from pyspark.sql.functions import lit, udtf


def test_udtf_explodes_words(spark):
    # defined inside the test so cloudpickle ships it by value
    @udtf(returnType="word: string, pos: int")
    class SplitWords:
        def eval(self, text: str):
            for i, w in enumerate(text.split()):
                yield w, i

    out = SplitWords(lit("a b c")).collect()
    assert [(r.word, r.pos) for r in out] == [("a", 0), ("b", 1), ("c", 2)]


def test_udtf_lateral_join_over_table(spark):
    @udtf(returnType="word: string")
    class Words:
        def eval(self, text: str):
            for w in set(text.split()):
                yield (w,)

    spark.udtf.register("words_udtf", Words)
    spark.createDataFrame(
        [(1, "the quick fox"), (2, "lazy dog")], "id int, txt string"
    ).createOrReplaceTempView("docs_udtf")
    rows = spark.sql(
        "SELECT d.id, w.word FROM docs_udtf d, LATERAL words_udtf(d.txt) w"
    ).collect()
    assert len(rows) == 5
    assert {(r.id, r.word) for r in rows} == {
        (1, "the"), (1, "quick"), (1, "fox"), (2, "lazy"), (2, "dog"),
    }
