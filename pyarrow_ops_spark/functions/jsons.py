"""Parse a string column of JSON objects into typed columns.

Reference semantics (``/root/reference/pyarrow_ops/jsons.py:5-8``):
``str_to_table`` builds the schema from the FIRST record only — keys that
appear only in later records are silently dropped; keys missing from a
record become null.

Spark-first re-expression:

- ``schema='first'`` (reference parity): infer with ``F.schema_of_json`` on
  the first non-null record, then ``F.from_json`` over the whole column —
  one distributed pass, schema resolved at plan time.
- ``schema='infer'`` (documented improvement, SURVEY §4.3.3): full-column
  inference via ``spark.read.json`` sampling every record, so late-appearing
  keys survive.
- explicit ``StructType``/DDL string: no inference pass at all — the right
  choice at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_PARSED = "__parsed__"


def _type_of(value) -> T.DataType:
    if isinstance(value, bool):
        return T.BooleanType()
    if isinstance(value, int):
        return T.LongType()
    if isinstance(value, float):
        return T.DoubleType()
    if isinstance(value, dict):
        return T.StructType(
            [T.StructField(k, _type_of(v), True) for k, v in value.items()]
        )
    if isinstance(value, list):
        elem = _type_of(value[0]) if value else T.StringType()
        return T.ArrayType(elem, True)
    return T.StringType()  # str and null


def _schema_from_record(record_json: str) -> T.StructType:
    """Schema of one JSON object string, inferred driver-side."""
    import json

    obj = json.loads(record_json)
    if not isinstance(obj, dict):
        raise ValueError(f"expected a JSON object, got: {record_json[:80]!r}")
    return T.StructType([T.StructField(k, _type_of(v), True) for k, v in obj.items()])


def str_to_table(
    df: DataFrame,
    col: str,
    schema: str | T.StructType = "first",
    keep_input: bool = False,
) -> DataFrame:
    """Expand JSON strings in ``df[col]`` into top-level columns."""
    if isinstance(schema, T.StructType) or (
        isinstance(schema, str) and schema not in ("first", "infer")
    ):
        resolved = schema
    elif schema == "first":
        first = df.select(col).filter(F.col(col).isNotNull()).limit(1).collect()
        if not first:
            return df if keep_input else df.drop(col)
        # first-record inference in pure Python (no extra Spark job) — this
        # IS the reference's semantics: columns come from the first
        # record's keys (jsons.py:8)
        resolved = _schema_from_record(first[0][0])
    else:  # 'infer': sample all records like spark.read.json
        resolved = (
            df.sparkSession.read.json(
                df.select(col).filter(F.col(col).isNotNull()).rdd.map(lambda r: r[0])
            ).schema
        )

    parsed = df.withColumn(_PARSED, F.from_json(F.col(col), resolved))
    out_cols = [c for c in df.columns if keep_input or c != col]
    return parsed.select(*out_cols, f"{_PARSED}.*")
