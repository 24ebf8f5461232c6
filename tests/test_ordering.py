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
