"""TableCleaner parity vs the reference's test_ml.py flow (FIXTURES 3-4):
exact expected codes/imputes/clips, dict round-trip, deterministic split."""

from __future__ import annotations

import pytest

from pyarrow_ops_spark import TableCleaner


@pytest.fixture(scope="module")
def train(spark):
    return spark.createDataFrame(
        [
            ("Falcon", 380.0, 2000),
            ("Falcon", 370.0, 1500),
            ("Parrot", None, 10),
            ("Parrot", 26.0, 30),
            ("Parrot", 24.0, 20),
        ],
        "Animal string, `Max Speed` double, Value long",
    )


@pytest.fixture(scope="module")
def fitted(train):
    cleaner = TableCleaner()
    cleaner.register_numeric("Max Speed", impute="min", clip=True)
    cleaner.register_label("Animal", categories=["Goose", "Falcon"])
    cleaner.register_one_hot("Animal")
    cleaner.clean_table(train)  # implicit fit (reference parity)
    return cleaner


def test_fit_learns_stats(fitted):
    num = fitted.columns[0]
    assert num.min == 24.0 and num.max == 380.0 and num.mean == 200.0


def test_clean_train_exact(fitted, train):
    X = fitted.clean_table(train).drop("__rid__")
    assert X.columns == ["Max Speed", "Animal", "Animal_Falcon", "Animal_Parrot"]
    got = sorted(tuple(r) for r in X.collect())
    # impute min (24.0) for the null; label: Goose=1, Falcon=2, unknown=0
    assert got == sorted(
        [
            (380.0, 2, True, False),
            (370.0, 2, True, False),
            (24.0, 0, False, True),
            (26.0, 0, False, True),
            (24.0, 0, False, True),
        ]
    )


def test_dict_roundtrip_on_unseen_data(spark, fitted):
    predict = spark.createDataFrame(
        [("Falcon", 380.0), ("Goose", 10.0), ("Parrot", None), ("Parrot", 26.0)],
        "Animal string, `Max Speed` double",
    )
    restored = TableCleaner().from_dict(fitted.to_dict())
    X = restored.clean_table(predict).drop("__rid__")
    got = sorted(tuple(r) for r in X.collect())
    # 10.0 clips up to train-min 24.0; null imputes to 24.0; Goose=1
    assert got == sorted(
        [
            (380.0, 2, True, False),
            (24.0, 1, False, False),
            (24.0, 0, False, True),
            (26.0, 0, False, True),
        ]
    )


def test_label_split_and_deterministic_split(fitted, train):
    X, y = fitted.clean_table(train, label="Value")
    out = fitted.split(X, y, test_size=0.4, seed=7)
    assert len(out) == 4
    X_train, X_test, y_train, y_test = out
    assert X_train.count() + X_test.count() == 5
    assert X_train.count() == y_train.count()
    assert X_test.count() == y_test.count()
    # determinism: same seed → same partition
    X_train2, X_test2, _, _ = fitted.split(X, y, test_size=0.4, seed=7)
    assert X_train2.count() == X_train.count()


def test_invalid_impute_raises():
    cleaner = TableCleaner()
    with pytest.raises(Exception, match="not a valid impute"):
        cleaner.register_numeric("x", impute="banana")


def test_fit_categoricals_single_pass(spark, train):
    """Fitting k categoricals costs ONE aggregation query (the stacked
    explode), not k distinct-scans: the Spark job count must not grow with
    the number of registered categoricals (AQE splits one query into a few
    stage-jobs, so compare counts rather than pinning an absolute)."""

    def job_count(group: str, cleaner: TableCleaner) -> int:
        sc = spark.sparkContext
        sc.setJobGroup(group, group)
        try:
            cleaner.fit(train)
        finally:
            sc.setJobGroup(None, None)
        return len(sc.statusTracker().getJobIdsForGroup(group))

    one = TableCleaner()
    one.register_label("Animal")
    two = TableCleaner()
    two.register_label("Animal")
    two.register_one_hot("Animal")
    n_one = job_count("fit-one-cat", one)
    n_two = job_count("fit-two-cats", two)
    assert n_two == n_one, f"2 categoricals ran {n_two} jobs vs {n_one} for 1"
    assert two.columns[0].categories == ["Unknown", "Falcon", "Parrot"]
    assert two.columns[1].categories == ["Falcon", "Parrot"]


def test_split_alignment_survives_nondeterministic_source(spark, train):
    """X/y row ids are content hashes, so a sampled (nondeterministic)
    source still yields aligned train/test features and labels."""
    src = train.sample(0.9, seed=7)
    cleaner = TableCleaner()
    cleaner.register_numeric("Max Speed", impute="mean", clip=True)
    X, y = cleaner.clean_table(src, label="Animal")
    X_train, X_test, y_train, y_test = cleaner.split(X, y, test_size=0.4)
    assert X_train.count() == y_train.count()
    assert X_test.count() == y_test.count()
    assert X_train.count() + X_test.count() == src.count()


class TestNaiveBayes:
    def test_planted_separable_classes(self, spark):
        from pyspark.sql import functions as F

        from pyarrow_ops_spark.ml.nb import nb_fit, nb_predict

        rows = []
        for i in range(30):
            marker = "alpha" if i % 2 == 0 else "beta"
            rows.append((i, marker, f"common words here {marker} {marker}"))
        df = spark.createDataFrame(rows, "doc_id long, label string, text string")
        model = nb_fit(df.filter("doc_id < 20"), "label", "text")
        pred = nb_predict(model, df.filter("doc_id >= 20"), "doc_id", "text")
        got = {r.doc_id: r.predicted for r in pred.collect()}
        assert all(
            got[i] == ("alpha" if i % 2 == 0 else "beta") for i in range(20, 30)
        )

    def test_empty_token_doc_gets_prior_argmax(self, spark):
        from pyarrow_ops_spark.ml.nb import nb_fit, nb_predict

        train = spark.createDataFrame(
            [("a", "x x x"), ("a", "x y"), ("b", "z z")],
            "label string, text string",
        )
        model = nb_fit(train)
        evals = spark.createDataFrame([(1, "???"), (2, "z z z")],
                                      "doc_id long, text string")
        pred = {r.doc_id: r.predicted for r in nb_predict(model, evals).collect()}
        # tokenless doc scores on priors alone: P(a)=2/3 wins
        assert pred[1] == "a"
        assert pred[2] == "b"
