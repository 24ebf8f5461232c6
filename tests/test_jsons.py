"""str_to_table semantics vs the reference (jsons.py:5-8): first-record
keys, all-values types."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from pyarrow_ops_spark.functions.jsons import str_to_table


def _df(spark, records):
    return spark.createDataFrame([(i, r) for i, r in enumerate(records)], "id long, js string")


def test_first_mode_numeric_widening(spark):
    # int first, float later: reference (pyarrow value inference) keeps the
    # column as double; a naive first-record LongType would null the 2.5
    out = str_to_table(_df(spark, ['{"k": 1}', '{"k": 2.5}']), "js", schema="first")
    assert dict(out.dtypes)["k"] == "double"
    vals = [r["k"] for r in out.orderBy("id").collect()]
    assert vals == [1.0, 2.5]


def test_first_mode_all_int_stays_long(spark):
    out = str_to_table(_df(spark, ['{"k": 1}', '{"k": 2}']), "js", schema="first")
    assert dict(out.dtypes)["k"] == "bigint"
    assert [r["k"] for r in out.orderBy("id").collect()] == [1, 2]


def test_first_mode_drops_late_keys(spark):
    # keys come from the FIRST record only (reference arr[0])
    out = str_to_table(
        _df(spark, ['{"a": 1}', '{"a": 2, "late": "x"}']), "js", schema="first"
    )
    assert out.columns == ["id", "a"]


def test_first_mode_missing_key_is_null(spark):
    out = str_to_table(_df(spark, ['{"a": 1, "b": "x"}', '{"a": 2}']), "js", schema="first")
    rows = out.orderBy("id").collect()
    assert rows[1]["b"] is None


def test_infer_mode_keeps_late_keys(spark):
    out = str_to_table(
        _df(spark, ['{"a": 1}', '{"a": 2, "late": "x"}']), "js", schema="infer"
    )
    assert set(out.columns) == {"id", "a", "late"}


def test_explicit_schema_no_inference(spark):
    schema = T.StructType([T.StructField("k", T.DoubleType(), True)])
    out = str_to_table(_df(spark, ['{"k": 1}', '{"k": 2.5}']), "js", schema=schema)
    assert [r["k"] for r in out.orderBy("id").collect()] == [1.0, 2.5]
