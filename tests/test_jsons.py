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


def test_first_mode_null_field_widens_via_inference(spark):
    # a null in the first record leaves the type unknown — full inference
    # must resolve it from later records instead of guessing string
    from pyarrow_ops_spark.functions.jsons import str_to_table

    df = spark.createDataFrame(
        [('{"name": "x", "score": null}',), ('{"name": "y", "score": 2.5}',)],
        "payload string",
    )
    out = str_to_table(df, "payload")
    assert dict(out.dtypes)["score"] == "double"
    vals = {r.name: r.score for r in out.collect()}
    assert vals == {"x": None, "y": 2.5}


def test_first_mode_empty_list_widens_via_inference(spark):
    from pyarrow_ops_spark.functions.jsons import str_to_table

    df = spark.createDataFrame(
        [('{"tags": []}',), ('{"tags": [1, 2]}',)], "payload string"
    )
    out = str_to_table(df, "payload")
    assert dict(out.dtypes)["tags"] in ("array<bigint>", "array<double>")


def test_first_mode_float_string_record_skips_inference_scan(spark):
    # all-final types in the first record: the driver-only path must keep
    # types without any full scan (behavioral check: types stay as-is)
    from pyarrow_ops_spark.functions.jsons import str_to_table

    df = spark.createDataFrame(
        [('{"a": 1.5, "b": "s"}',), ('{"a": 2.5, "b": "t"}',)], "payload string"
    )
    out = str_to_table(df, "payload")
    assert dict(out.dtypes) == {"a": "double", "b": "string"}
