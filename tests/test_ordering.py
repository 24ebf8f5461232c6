"""Ordering ops: contiguous ids, shuffle determinism, packing invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyarrow_ops_spark.functions.ordering import (
    assign_row_ids,
    deterministic_shuffle,
    pack_token_batches,
)


def test_assign_row_ids_contiguous_and_ordered(spark):
    df = spark.range(0, 3000).select(
        (F.col("id") * 7919 % 3000).alias("k")  # permuted distinct keys
    )
    out = assign_row_ids(df, ["k"]).collect()
    ids = sorted(r.row_id for r in out)
    assert ids == list(range(3000))  # contiguous 0..n-1
    by_id = sorted(out, key=lambda r: r.row_id)
    ks = [r.k for r in by_id]
    assert ks == sorted(ks)  # id order == key order


def test_assign_row_ids_partitioning_invariant(spark):
    df = spark.range(0, 500).select(F.col("id").alias("k"))
    a = {(r.k, r.row_id) for r in assign_row_ids(df, ["k"]).collect()}
    b = {
        (r.k, r.row_id)
        for r in assign_row_ids(df.repartition(13), ["k"]).collect()
    }
    assert a == b


def test_deterministic_shuffle_reproducible_and_permutes(spark):
    df = spark.range(0, 1000).select(F.col("id").alias("k"))
    a = [(r.k, r.row_id) for r in deterministic_shuffle(df, ["k"], "s1").collect()]
    b = [(r.k, r.row_id) for r in deterministic_shuffle(df, ["k"], "s1").collect()]
    assert sorted(a) == sorted(b)  # same permutation on rerun
    c = {r.k: r.row_id for r in deterministic_shuffle(df, ["k"], "s2").collect()}
    amap = dict(sorted(a))
    assert any(amap[k] != c[k] for k in amap)  # different seed, different order
    assert sorted(amap.values()) == list(range(1000))


def test_pack_token_batches_budget_invariant(spark):
    df = spark.range(0, 2000).select(
        F.col("id").alias("k"), (F.col("id") % 700 + 1).alias("toks")
    )
    out = pack_token_batches(df, "toks", budget=1000, key_cols=["k"]).collect()
    assert len(out) == 2000  # no rows lost
    sums: dict[tuple, list] = {}
    for r in out:
        sums.setdefault((r.shard, r.batch_id), []).append(r.toks)
    for (shard, batch), toks in sums.items():
        # a batch either fits the budget or is a single oversized document
        assert sum(toks) <= 1000 + max(toks) - 1 or len(toks) == 1


class TestCurriculumOrder:
    def test_bands_and_contiguity(self, spark):
        from pyarrow_ops_spark.functions.ordering import curriculum_order

        df = spark.createDataFrame(
            [(1, 0.95), (2, 0.10), (3, 0.55), (4, 0.97), (5, 0.30)],
            "doc_id long, q double",
        )
        out = curriculum_order(df, "q", ["doc_id"], n_buckets=4).collect()
        ids = sorted(r.train_order for r in out)
        assert ids == list(range(5))
        by_id = {r.doc_id: r for r in out}
        # cleanest first: bucket 3 docs (0.95, 0.97) take orders 0-1
        assert {by_id[1].train_order, by_id[4].train_order} == {0, 1}
        assert by_id[2].curriculum_bucket == 0
        assert by_id[2].train_order == 4  # dirtiest last

    def test_score_clamped_to_last_bucket(self, spark):
        from pyarrow_ops_spark.functions.ordering import curriculum_order

        df = spark.createDataFrame(
            [(1, 1.0), (2, -0.2), (3, 1.7)], "doc_id long, q double"
        )
        out = {r.doc_id: r.curriculum_bucket
               for r in curriculum_order(df, "q", ["doc_id"]).collect()}
        assert out[1] == 3 and out[3] == 3 and out[2] == 0

    def test_deterministic_and_seed_rotates(self, spark):
        from pyarrow_ops_spark.functions.ordering import curriculum_order

        df = spark.createDataFrame(
            [(i, 0.5) for i in range(50)], "doc_id long, q double"
        )
        a = {r.doc_id: r.train_order
             for r in curriculum_order(df, "q", ["doc_id"]).collect()}
        b = {r.doc_id: r.train_order
             for r in curriculum_order(df, "q", ["doc_id"]).collect()}
        c = {r.doc_id: r.train_order
             for r in curriculum_order(df, "q", ["doc_id"], seed="ep2").collect()}
        assert a == b
        assert a != c


class TestMixtureWeights:
    def test_hand_computed(self, spark):
        import math
        from pyarrow_ops_spark.operators.sample import mixture_weights

        rows = [("web",)] * 80 + [("code",)] * 16 + [("books",)] * 4
        df = spark.createDataFrame(rows, "source string")
        out = {r.stratum: r for r in mixture_weights(df, "source", 0.5).collect()}
        pa = {s: math.sqrt(n / 100) for s, n in (("web", 80), ("code", 16), ("books", 4))}
        z = sum(pa.values())
        for s, n in (("web", 80), ("code", 16), ("books", 4)):
            assert out[s].n_rows == n
            assert abs(out[s].weight - round(pa[s] / z, 4)) < 1e-9
        # weights sum to ~1 and low-resource strata are boosted
        assert abs(sum(r.weight for r in out.values()) - 1.0) < 1e-3
        assert out["books"].boost > 1.0 > out["web"].boost

    def test_alpha_one_is_natural_alpha_zero_uniform(self, spark):
        from pyarrow_ops_spark.operators.sample import mixture_weights

        rows = [("a",)] * 30 + [("b",)] * 10
        df = spark.createDataFrame(rows, "source string")
        nat = {r.stratum: r.weight for r in mixture_weights(df, "source", 1.0).collect()}
        uni = {r.stratum: r.weight for r in mixture_weights(df, "source", 0.0).collect()}
        assert abs(nat["a"] - 0.75) < 1e-9 and abs(nat["b"] - 0.25) < 1e-9
        assert abs(uni["a"] - 0.5) < 1e-9 and abs(uni["b"] - 0.5) < 1e-9

    def test_negative_alpha_rejected(self, spark):
        from pyarrow_ops_spark.operators.sample import mixture_weights

        df = spark.createDataFrame([("a",)], "source string")
        import pytest as _pytest
        with _pytest.raises(ValueError):
            mixture_weights(df, "source", -0.5)
