"""Z-order clustering: bit math, key determinism, and the data-skipping
contract (tight per-file min/max on every interleaved column)."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from pyarrow_ops_spark.sources.zorder import (
    morton_interleave,
    morton_sql,
    scale_sql,
    write_zordered,
    zorder_key,
)
from tests.conftest import SF_DIR


class TestMorton:
    def test_known_values(self, spark):
        df = spark.createDataFrame(
            [(0, 0), (1, 0), (0, 1), (1, 1), (3, 1)], ["a", "b"]
        )
        out = df.select(
            "a", "b", morton_interleave([F.col("a"), F.col("b")], 2).alias("z")
        ).collect()
        got = {(r["a"], r["b"]): r["z"] for r in out}
        # bit layout a1 b1 a0 b0
        assert got[(0, 0)] == 0
        assert got[(1, 0)] == 0b10
        assert got[(0, 1)] == 0b01
        assert got[(1, 1)] == 0b11
        assert got[(3, 1)] == 0b1011

    def test_sql_twin_matches(self, spark, duck):
        rows = [(i, (i * 7) % 13) for i in range(50)]
        df = spark.createDataFrame(rows, ["a", "b"])
        got = {
            r["a"]: r["z"]
            for r in df.select(
                "a", morton_interleave([F.col("a"), F.col("b")], 6).alias("z")
            ).collect()
        }
        expr = morton_sql(["a", "b"], 6)
        for a, b in rows:
            sql = expr.replace("a >>", f"{a} >>").replace("b >>", f"{b} >>")
            (z,) = duck.execute(f"SELECT {sql}").fetchone()
            assert z == got[a], (a, b)

    def test_locality(self, spark):
        # Morton keys of nearby points are closer than far points on average:
        # check the curve orders the 4-cell grid as z-shape.
        df = spark.createDataFrame(
            [(x, y) for x in range(4) for y in range(4)], ["x", "y"]
        )
        rows = df.select(
            "x", "y", morton_interleave([F.col("x"), F.col("y")], 2).alias("z")
        ).collect()
        zs = {(r["x"], r["y"]): r["z"] for r in rows}
        assert sorted(zs.values()) == list(range(16))  # bijective on the grid
        # each 2x2 quadrant occupies one contiguous z range
        q00 = {zs[(x, y)] for x in (0, 1) for y in (0, 1)}
        assert max(q00) - min(q00) == 3


class TestZorderKey:
    def test_scaling_and_determinism(self, spark):
        df = spark.range(100).select(
            F.col("id").alias("a"), (F.lit(99) - F.col("id")).alias("b")
        )
        out = zorder_key(df, ["a", "b"], bits=4)
        assert out.columns == ["a", "b", "zvalue"]
        vals = out.orderBy("a").select("zvalue").collect()
        again = zorder_key(df, ["a", "b"], bits=4).orderBy("a").select("zvalue").collect()
        assert vals == again
        # a=0 -> scaled 0, b=99 -> scaled 15 -> z interleaves to 0b01010101
        first = out.filter(F.col("a") == 0).collect()[0]["zvalue"]
        assert first == 0b01010101

    def test_degenerate_range(self, spark):
        df = spark.range(10).select(F.lit(7).alias("a"), F.col("id").alias("b"))
        out = zorder_key(df, ["a", "b"], bits=4).select("zvalue").collect()
        assert all(r["zvalue"] >= 0 for r in out)

    def test_validation(self, spark):
        df = spark.range(2).select(F.col("id").alias("a"))
        with pytest.raises(ValueError):
            zorder_key(df, [])


class TestWriteZordered:
    def test_per_file_ranges_tight_on_both_columns(self, spark, tmp_path):
        events = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
        zpath = str(tmp_path / "z")
        spath = str(tmp_path / "s")
        write_zordered(events, ["user_id", "event_id"], zpath, num_files=16)
        # baseline: cluster on event_id only — user_id locality destroyed
        (
            events.repartitionByRange(16, "event_id")
            .sortWithinPartitions("event_id")
            .write.mode("overwrite")
            .parquet(spath)
        )

        def spans(path, col):
            total = 0.0
            files = [f for f in glob.glob(path + "/*.parquet")]
            assert files
            for f in files:
                md = pq.read_metadata(f)
                lo = min(
                    md.row_group(i).column(
                        [md.schema.column(j).name for j in range(md.num_columns)].index(col)
                    ).statistics.min
                    for i in range(md.num_row_groups)
                )
                hi = max(
                    md.row_group(i).column(
                        [md.schema.column(j).name for j in range(md.num_columns)].index(col)
                    ).statistics.max
                    for i in range(md.num_row_groups)
                )
                total += hi - lo
            return total / len(files)

        stats = events.agg(
            (F.max("user_id") - F.min("user_id")).alias("u"),
            (F.max("event_id") - F.min("event_id")).alias("e"),
        ).collect()[0]
        # z-ordered files: BOTH columns' average per-file span is a strict
        # subset of the global range; the single-column sort keeps event_id
        # tight but leaves user_id near the full range.
        # 16 files = 2^4 curve cuts -> each dimension splits ~4x
        assert spans(zpath, "user_id") < 0.45 * stats["u"]
        assert spans(zpath, "event_id") < 0.45 * stats["e"]
        assert spans(spath, "user_id") > 0.8 * stats["u"]
        # and the rows are unchanged
        assert spark.read.parquet(zpath).count() == events.count()


class TestCompaction:
    def test_compact_reduces_files_and_preserves_rows(self, spark, tmp_path):
        events = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
        src = str(tmp_path / "small")
        events.repartition(40).write.parquet(src)
        assert len(glob.glob(src + "/*.parquet")) == 40

        from pyarrow_ops_spark.sources.zorder import compact_files

        total = sum(os.path.getsize(f) for f in glob.glob(src + "/*.parquet"))
        out = str(tmp_path / "compact")
        n = compact_files(spark, src, out, target_file_bytes=total // 4 + 1)
        assert n == 4
        assert len(glob.glob(out + "/*.parquet")) == 4
        assert spark.read.parquet(out).count() == events.count()

    def test_compact_with_zorder(self, spark, tmp_path):
        events = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
        src = str(tmp_path / "small")
        events.repartition(20).write.parquet(src)

        from pyarrow_ops_spark.sources.zorder import compact_files

        out = str(tmp_path / "zcompact")
        n = compact_files(
            spark, src, out, target_file_bytes=1 << 16,
            zorder_cols=["user_id", "event_id"],
        )
        got = spark.read.parquet(out)
        assert got.count() == events.count()
        assert len(glob.glob(out + "/*.parquet")) <= n + 1


def test_scale_survives_microsecond_epoch_span(spark):
    # span ~2^50: the exact-long branch would overflow (v-lo)*65535; the
    # wide-double branch must keep keys in [0, 2^bits) and monotone
    from pyarrow_ops_spark.sources.zorder import zorder_key

    lo, hi = 0, 1 << 50
    vals = [lo, hi // 4, hi // 2, (3 * hi) // 4, hi]
    df = spark.createDataFrame([(v, 0) for v in vals], "a long, b long")
    out = (
        zorder_key(df, ["a", "b"], bits=16)
        .orderBy("a")
        .select("a", "zvalue")
        .collect()
    )
    zs = [r.zvalue for r in out]
    assert all(z >= 0 for z in zs), zs
    assert zs == sorted(zs), zs          # monotone in a (b constant)
    assert zs[0] == 0
    assert zs[-1] > 0


def test_scale_wide_branch_matches_duckdb_twin(spark):
    import duckdb
    from pyarrow_ops_spark.sources.zorder import scale_sql, zorder_key

    lo, hi = 5, (1 << 50) + 5
    vals = [lo, 123456789012345, hi - 1, hi]
    df = spark.createDataFrame([(v, 0) for v in vals], "a long, b long")
    spark_keys = {
        r.a: r.zvalue for r in zorder_key(df, ["a", "b"], bits=16).collect()
    }
    con = duckdb.connect()
    expr = scale_sql("a", str(lo), str(hi), 16)
    # b spans 0..0 -> scales to 0, so zvalue = interleave(scaled_a, 0)
    from pyarrow_ops_spark.sources.zorder import morton_sql

    sql = f"SELECT a, ({morton_sql([expr, '0'], 16)}) AS z FROM (SELECT unnest({vals}) AS a)"
    duck_keys = dict(con.execute(sql).fetchall())
    assert spark_keys == duck_keys


def test_interleave_bit_budget_raises(spark):
    from pyarrow_ops_spark.sources.zorder import zorder_key

    df = spark.createDataFrame([(1, 2, 3, 4)], "a long, b long, c long, d long")
    with pytest.raises(ValueError, match="interleaved bits"):
        zorder_key(df, ["a", "b", "c", "d"], bits=16)
