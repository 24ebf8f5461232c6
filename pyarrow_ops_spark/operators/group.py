"""groupby with the reference's ``Grouping`` surface over Spark aggregation.

Reference semantics (``/root/reference/pyarrow_ops/group.py``):

- ``groupby(table, by)`` returns a ``Grouping`` (``group.py:54-55``).
- Named aggs ``sum/max/min/mean/median`` (registry ``group.py:6-12``); with
  no arguments they aggregate ALL non-key columns (``group.py:14-16``).
- ``.agg({col: 'name'})`` — dict-style named aggregation (``group.py:50-52``);
  unknown names raise ``KeyError``.
- ``.aggregate({col: callable})`` — arbitrary Python callable applied to
  each group's values (``group.py:39-48``): the reference's de-facto UDAF.
- Iteration yields ``(key_dict, sub_table)`` per group (``group.py:29-32``).
- Output columns keep their bare input names — no ``sum(x)`` renaming
  (``group.py:44-47``).

Spark-first re-expression: named aggs map to JVM-side ``F.sum/max/min/mean/
median`` inside ``HashAggregateExec`` — partial (map-side) + final
aggregation, exactly the split the single-node reference lacks. ``median``
is Spark's exact median (the reference uses interpolating ``np.median``;
``percentile_approx`` would NOT match — SURVEY §4.3.4). Arbitrary callables
run as Arrow-batched grouped-map pandas UDFs (``applyInPandas``), the
scalable path for per-group Python. Iteration is a driver-side convenience
capped by ``max_groups`` — on a distributed engine, per-group Python should
go through ``apply`` instead.
"""

from __future__ import annotations

from typing import Any, Callable, Iterator, Mapping, Sequence

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# name -> (Column fn, result type fn) for reference parity; extended with the
# aggregates the reference lists as absent (SURVEY §2.2) — count, distinct,
# stddev, first/last, collect_list — which Spark provides natively.
_AGG_FUNCS: dict[str, Callable[[str], Any]] = {
    "sum": F.sum,
    "max": F.max,
    "min": F.min,
    "mean": F.mean,
    "avg": F.avg,
    "median": F.median,
    "count": F.count,
    "count_distinct": F.count_distinct,
    "approx_count_distinct": F.approx_count_distinct,
    "stddev": F.stddev,
    "variance": F.variance,
    "first": F.first,
    "last": F.last,
    "collect_list": F.collect_list,
    "collect_set": F.collect_set,
}

# numpy result-dtype behavior the reference inherits (SURVEY §4.3.5): sum of
# int stays int (Spark F.sum(long)->long matches), mean/median of int become
# float (Spark matches for mean; median of bigint returns double in Spark 4).


class Grouping:
    """Lazy stand-in for the reference's eager ``Grouping`` (``group.py:20``).

    Construction is free — no hashing, no sort; the shuffle happens when an
    aggregation is executed, and Spark's planner inserts map-side partial
    aggregation automatically.
    """

    def __init__(self, df: DataFrame, by: Sequence[str] | str):
        by = [by] if isinstance(by, str) else list(by)
        # Reference dedups key columns via set() (group.py:22); keep user order.
        self.by = list(dict.fromkeys(by))
        self.df = df
        self.agg_columns = [c for c in df.columns if c not in self.by]

    # -- named aggregations -------------------------------------------------

    def _named_agg(self, name: str, agg_columns: Sequence[str] | None = None) -> DataFrame:
        cols = list(agg_columns) if agg_columns else self.agg_columns
        fn = _AGG_FUNCS[name]
        # bare-name aliasing for reference parity (group.py:44-47)
        return self.df.groupBy(*self.by).agg(*[fn(c).alias(c) for c in cols])

    def sum(self, agg_columns: Sequence[str] | None = None) -> DataFrame:
        return self._named_agg("sum", agg_columns)

    def max(self, agg_columns: Sequence[str] | None = None) -> DataFrame:
        return self._named_agg("max", agg_columns)

    def min(self, agg_columns: Sequence[str] | None = None) -> DataFrame:
        return self._named_agg("min", agg_columns)

    def mean(self, agg_columns: Sequence[str] | None = None) -> DataFrame:
        return self._named_agg("mean", agg_columns)

    def median(self, agg_columns: Sequence[str] | None = None) -> DataFrame:
        return self._named_agg("median", agg_columns)

    def count(self) -> DataFrame:
        return self.df.groupBy(*self.by).count()

    def agg(self, methods: Mapping[str, str | Sequence[str]]) -> DataFrame:
        """Dict-style aggregation ``{column: agg_name}`` (reference
        ``group.py:50-52``). Also accepts ``{column: [name, ...]}`` for
        multiple aggs per column (beyond reference). Unknown agg names raise
        ``KeyError`` (parity: ``group.py:51``).
        """
        exprs = []
        for col, names in methods.items():
            if isinstance(names, str):
                # single agg keeps the bare column name (reference parity)
                exprs.append(_AGG_FUNCS[names](col).alias(col))
            else:
                for name in names:
                    exprs.append(_AGG_FUNCS[name](col).alias(f"{col}_{name}"))
        return self.df.groupBy(*self.by).agg(*exprs)

    # -- arbitrary-callable aggregation (the reference's de-facto UDAF) -----

    def aggregate(
        self,
        methods: Mapping[str, Callable[[Any], Any]],
        return_types: Mapping[str, T.DataType | str] | None = None,
    ) -> DataFrame:
        """Apply an arbitrary Python callable to each group's values of each
        column (reference ``group.py:39-48``).

        Runs as a grouped-map pandas UDF: each group's column values arrive
        as a numpy array (matching the reference's ``np.split`` slices), the
        callable reduces them to a scalar. Arrow-batched; scales as long as
        single groups fit in executor memory.

        ``return_types`` pins the output Spark type per column (DDL string
        or DataType) — REQUIRED for callables with side effects, callables
        whose return type depends on the actual values, or exotic input
        types; columns not listed fall back to probing the callable with a
        tiny fabricated array of the input column's dtype.
        """
        import numpy as np

        by = self.by
        items = list(methods.items())
        return_types = dict(return_types or {})

        # Result dtype mirrors the reference's behavior of letting the
        # callable's numpy result drive the output type (group.py:45-47).
        out_fields = [self.df.schema[c] for c in by]
        for c, fn in items:
            if c in return_types:
                rt = return_types[c]
                spark_t = (
                    T._parse_datatype_string(rt) if isinstance(rt, str) else rt
                )
                out_fields.append(T.StructField(c, spark_t, True))
                continue
            in_type = self.df.schema[c].dataType
            if isinstance(in_type, (T.LongType, T.IntegerType, T.ShortType)):
                probe = np.array([1, 2], dtype="int64")
            elif isinstance(in_type, T.StringType):
                probe = np.array(["a", "b"], dtype=object)
            elif isinstance(in_type, (T.TimestampType, T.TimestampNTZType)):
                probe = np.array(
                    ["2000-01-01T00:00:00", "2000-01-01T00:00:01"],
                    dtype="datetime64[us]",
                )
            elif isinstance(in_type, T.BooleanType):
                probe = np.array([True, False])
            else:
                probe = np.array([1.0, 2.0], dtype="float64")
            probed = fn(probe)
            if isinstance(probed, (bool, np.bool_)):
                spark_t = T.BooleanType()
            elif isinstance(probed, (int, np.integer)):
                spark_t = T.LongType()
            elif isinstance(probed, str):
                spark_t = T.StringType()
            elif isinstance(probed, np.datetime64):
                spark_t = T.TimestampNTZType()
            else:
                spark_t = T.DoubleType()
            out_fields.append(T.StructField(c, spark_t, True))
        schema = T.StructType(out_fields)

        def reduce_group(pdf: pd.DataFrame) -> pd.DataFrame:
            row = {k: [pdf[k].iloc[0]] for k in by}
            for c, fn in items:
                row[c] = [fn(pdf[c].to_numpy())]
            return pd.DataFrame(row)

        return self.df.groupBy(*by).applyInPandas(reduce_group, schema=schema)

    def apply(self, fn: Callable[[pd.DataFrame], pd.DataFrame], schema) -> DataFrame:
        """Scalable per-group transform: ``applyInPandas`` passthrough."""
        return self.df.groupBy(*self.by).applyInPandas(fn, schema=schema)

    # -- iteration ----------------------------------------------------------

    def __iter__(self) -> Iterator[tuple[dict, DataFrame]]:
        """Yield ``(key_dict, sub_dataframe)`` per group (reference
        ``group.py:29-32``).

        Driver-side convenience: key values are collected (one distinct
        query), each sub-DataFrame is a filtered view (lazy — no data moves
        until acted on). Capped at ``max_groups`` distinct keys to protect
        the driver; use ``.apply`` for per-group compute at scale.
        """
        return self.iter_groups()

    def iter_groups(self, max_groups: int = 10_000) -> Iterator[tuple[dict, DataFrame]]:
        keys = self.df.select(*self.by).distinct().limit(max_groups + 1).collect()
        if len(keys) > max_groups:
            raise ValueError(
                f"more than {max_groups} groups; use .apply(applyInPandas) instead"
            )
        for row in keys:
            key = row.asDict()
            cond = None
            for k, v in key.items():
                c = F.col(k).eqNullSafe(F.lit(v))
                cond = c if cond is None else (cond & c)
            yield key, self.df.filter(cond)


def groupby(df: DataFrame, by: Sequence[str] | str) -> Grouping:
    """Entry point matching reference ``group.py:54-55``."""
    return Grouping(df, by)
