"""Pretty-print the first rows of a DataFrame.

Reference semantics (``/root/reference/pyarrow_ops/ops.py:62-80``): print
first ``n`` rows width-capped, or ``"No data in table"`` when empty.

Spark-first: ``df.limit(n)`` keeps the row slice distributed (Catalyst
pushes LocalLimit below the exchange); only the n surviving rows cross to
the driver. We check emptiness via the limited slice itself — never a full
count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def head(df: DataFrame, n: int = 5, max_width: int = 100, truncate: bool = True) -> None:
    rows = df.limit(n).collect()
    if not rows:
        print("No data in table")
        return
    # Reuse Spark's own renderer on the already-fetched slice.
    df.sparkSession.createDataFrame(rows, df.schema).show(n=n, truncate=truncate)
