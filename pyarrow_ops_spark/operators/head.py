"""Pretty-print the first rows of a DataFrame.

Reference semantics (``/root/reference/pyarrow_ops/ops.py:62-80``): print
the first ``n`` rows as left-justified columns under a ``Row`` header,
every rendered line hard-capped at ``max_width`` characters, or
``"No data in table"`` when empty.

Spark-first: ``df.limit(n)`` keeps the row slice distributed (Catalyst
pushes LocalLimit below the exchange); only the n surviving rows cross to
the driver. We check emptiness via the limited slice itself — never a full
count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def head(df: DataFrame, n: int = 5, max_width: int = 100) -> None:
    rows = df.limit(n).collect()
    if not rows:
        print("No data in table")
        return
    cols = df.columns
    rendered = {c: [str(r[c]) for r in rows] for c in cols}
    col_width = [len(c) for c in cols]
    data_width = [max(len(v) for v in rendered[c]) for c in cols]
    data = [list(cols)] + [[rendered[c][i] for c in cols] for i in range(len(rows))]
    for i, line in enumerate(data):
        adjust = [
            w.ljust(max(cw, dw) + 2)
            for w, cw, dw in zip(line, col_width, data_width)
        ]
        # reference parity: each LINE is truncated to max_width chars
        print(("Row  " if i == 0 else str(i - 1).ljust(5)) + "".join(adjust)[:max_width])
    print("\n")
