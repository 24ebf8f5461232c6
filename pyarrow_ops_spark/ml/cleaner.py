"""TableCleaner — ML preprocessing with the reference's fit/transform surface.

Reference semantics (``/root/reference/pyarrow_ops/ml.py``):

- ``register_numeric(name, impute='mean'|'min'|'max', clip=True)``: learn
  mean/min/max from the FIRST table cleaned (``ml.py:38-41``, implicit fit,
  ``ml.py:54-55``); impute nulls/NaN with the learned statistic, then clip
  to the learned ``[min, max]`` (``ml.py:6-7``). Invalid impute raises
  (``ml.py:51``).
- ``register_label(name, categories=[...])``: label-encode. With given
  categories, code = position + 1 and stored categories become
  ``['Unknown'] + categories``; unknown and null → 0 (``ml.py:9-17``).
  Without, categories are learned in order of first appearance.
- ``register_one_hot(name)``: boolean column per category named
  ``{col}_{category}``, nulls → False; categories learned as first-appearance
  order of non-null uniques (``ml.py:19-26``, fan-out ``ml.py:107-108``).
- ``clean_table(table, label=...)`` → ``X`` or ``(X, y)`` (``ml.py:112-121``).
- ``split(X, y, test_size)`` → train/test tables (``ml.py:123-128``).
- ``to_dict()/from_dict()`` round-trips fitted state (``ml.py:83-93``).

Spark-first re-expression: fitting is ONE aggregation job over all
unmeasured columns (single scan — the reference does one pass per column);
transforms are pure Catalyst ``Column`` expressions (``coalesce`` /
``least``/``greatest`` / ``when``-chains / boolean equality) — fully
JVM-side, codegen-fused, no UDFs, so cleaning 100 TB is a single map-only
stage. "First appearance" order is made deterministic by ordering learned
categories on ``min(monotonically_increasing_id())``. ``split`` uses a
deterministic hash-based mask over a hidden row id so X and y partition
identically without a join.
"""

from __future__ import annotations

from typing import Any, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_RID = "__rid__"
_IMPUTES = ("mean", "min", "max")


class NumericalColumn:
    def __init__(
        self,
        name: str,
        impute: str = "mean",
        clip: bool = True,
        v_min: float | None = None,
        v_mean: float | None = None,
        v_max: float | None = None,
    ):
        self.name, self.impute, self.clip = name, impute, clip
        # reference quirk kept: all-zero stats count as unmeasured (ml.py:33)
        self.measured = any([v_min, v_mean, v_max])
        self.mean, self.min, self.max = (v_mean or 0.0), (v_min or 0.0), (v_max or 0.0)
        if impute not in _IMPUTES:
            raise Exception(f"{impute} is not a valid impute method")

    def to_dict(self) -> dict[str, Any]:
        return {
            "name": self.name,
            "type": "numerical",
            "impute": self.impute,
            "clip": self.clip,
            "v_min": self.min,
            "v_mean": self.mean,
            "v_max": self.max,
        }

    def fit_exprs(self) -> list[Column]:
        c = F.col(self.name).cast("double")
        return [
            F.mean(c).alias(f"{self.name}__mean"),
            F.min(c).alias(f"{self.name}__min"),
            F.max(c).alias(f"{self.name}__max"),
        ]

    def set_stats(self, row: dict[str, Any]) -> None:
        self.mean = float(row[f"{self.name}__mean"])
        self.min = float(row[f"{self.name}__min"])
        self.max = float(row[f"{self.name}__max"])
        self.measured = True

    def impute_value(self) -> float:
        return {"mean": self.mean, "min": self.min, "max": self.max}[self.impute]

    def transform_exprs(self) -> list[tuple[str, Column]]:
        c = F.col(self.name).cast("double")
        cleaned = F.when(c.isNull() | F.isnan(c), F.lit(self.impute_value())).otherwise(c)
        if self.clip:
            cleaned = F.least(F.greatest(cleaned, F.lit(self.min)), F.lit(self.max))
        return [(self.name, cleaned)]


class CategoricalColumn:
    def __init__(self, name: str, method: str, categories: Sequence[str] | None = None):
        self.name, self.method = name, method
        self.categories = list(categories or [])
        self.measured = bool(self.categories)

    def to_dict(self) -> dict[str, Any]:
        return {
            "name": self.name,
            "type": "categorical",
            "method": self.method,
            "categories": self.categories,
        }

    def set_categories(self, learned: Sequence[str]) -> None:
        if self.method == "label":
            # reference clean_cat: stored categories are ['Unknown'] + data
            # categories, codes = position in that list (ml.py:17)
            self.categories = ["Unknown"] + [c for c in learned if c is not None]
        else:
            self.categories = [c for c in learned if c is not None]
        self.measured = True

    def _code_categories(self) -> list[str]:
        """Categories in code order, code = position + 1, 0 = Unknown."""
        if self.categories and self.categories[0] == "Unknown":
            return self.categories[1:]
        return self.categories

    def transform_exprs(self) -> list[tuple[str, Column]]:
        c = F.col(self.name).cast("string")
        if self.method == "label":
            cats = self._code_categories()
            expr: Column = F.lit(0)
            for i, cat in enumerate(cats):
                expr = F.when(c == F.lit(cat), F.lit(i + 1)).otherwise(expr)
            return [(self.name, expr.cast("int"))]
        # one_hot: boolean column per category, nulls -> False
        return [
            (f"{self.name}_{cat}", F.coalesce(c == F.lit(cat), F.lit(False)))
            for cat in self.categories
        ]


class TableCleaner:
    """Fit/transform preprocessing registry over Spark DataFrames."""

    def __init__(self) -> None:
        self.columns: list[NumericalColumn | CategoricalColumn] = []

    # -- registration (reference ml.py:95-102) ------------------------------

    def register_numeric(self, name: str, impute: str = "mean", clip: bool = True) -> None:
        self.columns.append(NumericalColumn(name, impute, clip))

    def register_label(self, name: str, categories: Sequence[str] | None = None) -> None:
        self.columns.append(CategoricalColumn(name, "label", categories))

    def register_one_hot(self, name: str, categories: Sequence[str] | None = None) -> None:
        self.columns.append(CategoricalColumn(name, "one_hot", categories))

    # -- persistence (reference ml.py:83-93) --------------------------------

    def to_dict(self) -> list[dict[str, Any]]:
        return [col.to_dict() for col in self.columns]

    def from_dict(self, columns: list[dict[str, Any]]) -> "TableCleaner":
        for column in columns:
            column = dict(column)
            t = column.pop("type")
            if t == "numerical":
                self.columns.append(NumericalColumn(**column))
            else:
                self.columns.append(CategoricalColumn(**column))
        return self

    # -- fit ----------------------------------------------------------------

    def fit(self, df: DataFrame) -> "TableCleaner":
        """Learn statistics/categories for all unmeasured columns.

        One aggregation job covers every numeric column; each unmeasured
        categorical needs one distinct-scan (first-appearance order via
        ``min(monotonically_increasing_id())``).
        """
        num_exprs: list[Column] = []
        for col in self.columns:
            if isinstance(col, NumericalColumn) and not col.measured:
                num_exprs.extend(col.fit_exprs())
        if num_exprs:
            stats = df.agg(*num_exprs).collect()[0].asDict()
            for col in self.columns:
                if isinstance(col, NumericalColumn) and not col.measured:
                    col.set_stats(stats)
        # ONE job learns every unmeasured categorical: stack (column, value)
        # pairs with a map-side explode, then a single grouped aggregation
        # finds each value's first appearance. The old shape ran one
        # distinct-scan per column — k registered categoricals cost k full
        # passes over the table.
        unmeasured = [
            col
            for col in self.columns
            if isinstance(col, CategoricalColumn) and not col.measured
        ]
        if unmeasured:
            stacked = df.withColumn(_RID, F.monotonically_increasing_id()).select(
                F.col(_RID),
                F.explode(
                    F.array(*[
                        F.struct(
                            F.lit(col.name).alias("col"),
                            F.col(col.name).cast("string").alias("cat"),
                        )
                        for col in unmeasured
                    ])
                ).alias("kv"),
            )
            learned = (
                stacked.filter(F.col("kv.cat").isNotNull())
                .groupBy("kv.col", "kv.cat")
                .agg(F.min(_RID).alias("first_seen"))
                .orderBy("first_seen")
                .collect()
            )
            by_col: dict[str, list[str]] = {}
            for r in learned:
                by_col.setdefault(r["col"], []).append(r["cat"])
            for col in unmeasured:
                col.set_categories(by_col.get(col.name, []))
        return self

    # -- transform (reference ml.py:104-121) --------------------------------

    def clean_table(
        self, df: DataFrame, label: str | None = None
    ) -> DataFrame | tuple[DataFrame, DataFrame]:
        """Apply all registered transforms; implicit fit on first use
        (reference parity ``ml.py:54-55``/``75-76``).

        Returns ``X`` or ``(X, y)``; both carry a hidden deterministic row
        id so ``split`` can partition them consistently without a join.
        """
        if any(not col.measured for col in self.columns):
            self.fit(df)
        exprs: list[Column] = []
        for col in self.columns:
            for out_name, expr in col.transform_exprs():
                exprs.append(expr.alias(out_name))
        # Row id = content hash, NOT monotonically_increasing_id: X and y are
        # separate plans evaluated in separate jobs, and mono ids are only
        # stable when the upstream plan is deterministic and shuffle-free —
        # sample()/AQE-coalesced inputs would silently misalign features and
        # labels. A hash of the full row depends on values alone, so both
        # evaluations agree under any physical plan.
        with_rid = df.withColumn(
            _RID, F.xxhash64(*[F.col(c) for c in df.columns])
        )
        X = with_rid.select(*exprs, F.col(_RID))
        if label:
            return X, with_rid.select(F.col(label), F.col(_RID))
        return X

    # -- split (reference ml.py:123-128) ------------------------------------

    def split(
        self,
        X: DataFrame,
        y: DataFrame | None = None,
        test_size: float = 0.2,
        seed: int = 42,
    ) -> tuple[DataFrame, ...]:
        """Deterministic random train/test split.

        A hash of the hidden row id (xxhash64, seeded) gives every row the
        same train/test assignment in X and y without any join or shuffle —
        a map-only split that scales to any size. The row id from
        ``clean_table`` is a content hash, so the X/y assignments agree
        under any physical plan (AQE, sampling, shuffles).
        """
        if _RID not in X.columns:
            # standalone-X fallback: content-hash the visible columns
            X = X.withColumn(_RID, F.xxhash64(*[F.col(c) for c in X.columns]))
        threshold = int((1.0 - test_size) * (2**32))
        mask = (F.pmod(F.xxhash64(F.col(_RID), F.lit(seed)), F.lit(2**32))) < threshold
        X_train = X.filter(mask).drop(_RID)
        X_test = X.filter(~mask).drop(_RID)
        if y is None:
            return X_train, X_test
        if _RID not in y.columns:
            raise ValueError("y must come from clean_table(label=...) to share row ids")
        y_train = y.filter(mask).drop(_RID)
        y_test = y.filter(~mask).drop(_RID)
        return X_train, X_test, y_train, y_test
