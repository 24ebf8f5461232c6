"""Parse a string column of JSON objects into typed columns.

Reference semantics (``/root/reference/pyarrow_ops/jsons.py:5-8``):
``str_to_table`` takes its COLUMNS from the first record's keys — keys that
appear only in later records are silently dropped; keys missing from a
record become null — but its TYPES from every record's values (the column
lists go through ``pa.Table.from_pydict``, so pyarrow promotes an
int-then-float key to double instead of nulling the floats).

Spark-first re-expression:

- ``schema='first'`` (reference parity): key set + order from the first
  non-null record, field types from a full-column JVM-side inference pass
  (``DataFrameReader.json`` over the string column — the same promotion
  rules as pyarrow's value-based inference: all-int stays long, mixed
  int/float widens to double, late nulls stay nullable). Then one
  distributed ``F.from_json`` over the whole column. The inference scan is
  an extra pass; at 100 TB pass an explicit schema instead.
- ``schema='infer'`` (documented improvement, SURVEY §4.3.3): full-column
  inference via ``spark.read.json`` sampling every record, so late-appearing
  keys survive too.
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


def _needs_full_inference(value) -> bool:
    """True when the first record leaves a field's type AMBIGUOUS, so the
    full-column inference pass must resolve it: an integral (may widen to
    double), a JSON null (type unknown — ``_type_of`` can only guess
    string), or an empty array/object (element/field types unknown).
    Floats and strings are already their final first-record type."""
    if value is None:
        return True
    if isinstance(value, bool):
        return False
    if isinstance(value, int):
        return True
    if isinstance(value, dict):
        return not value or any(_needs_full_inference(v) for v in value.values())
    if isinstance(value, list):
        return not value or any(_needs_full_inference(v) for v in value)
    return False


def _infer_full(df: DataFrame, col: str) -> T.StructType:
    """Full-column JSON schema inference, JVM-side when possible."""
    strings = df.select(F.col(col).cast("string").alias("value")).filter(
        F.col("value").isNotNull()
    )
    try:
        # Stay JVM-side: hand the string column to DataFrameReader.json
        # as a Dataset[String] via py4j — the inference scan runs fully
        # in the JVM (no Python row pickling, Arrow path intact).
        spark = df.sparkSession
        jds = getattr(strings._jdf, "as")(
            spark._jvm.org.apache.spark.sql.Encoders.STRING()
        )
        jschema = spark._jsparkSession.read().json(jds).schema()
        return T._parse_datatype_json_string(jschema.json())
    except Exception:
        # Spark Connect / API drift fallback: the pickled-RDD path
        return df.sparkSession.read.json(strings.rdd.map(lambda r: r[0])).schema


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
        # Reference semantics split (jsons.py:8): columns = the FIRST
        # record's keys, types = inference over ALL values (so an
        # int-then-float key widens to double instead of nulling floats).
        # The full-column inference pass runs ONLY when the first record
        # leaves a type ambiguous — an integral field (may widen to
        # double), a null, or an empty array/object (whose true type only
        # the other records know). A first record of floats/strings
        # already has its final types and the default path stays a
        # driver-only first-record parse (zero extra jobs).
        # NOTE: at 100 TB pass an explicit schema; with ambiguity present
        # this mode scans the whole column once before the real job.
        import json as _json

        first_schema = _schema_from_record(first[0][0])
        if _needs_full_inference(_json.loads(first[0][0])):
            inferred = {f.name: f for f in _infer_full(df, col).fields}
            resolved = T.StructType(
                [inferred.get(f.name, f) for f in first_schema.fields]
            )
        else:
            resolved = first_schema
    else:  # 'infer': sample all records like spark.read.json
        resolved = _infer_full(df, col)

    parsed = df.withColumn(_PARSED, F.from_json(F.col(col), resolved))
    out_cols = [c for c in df.columns if keep_input or c != col]
    return parsed.select(*out_cols, f"{_PARSED}.*")
