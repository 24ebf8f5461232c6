"""r14 measurement (r13 verdict ask #6): the shared-scan drift_report
must make a multi-column report cost ~one set of monitor passes, not one
set PER column.

A/B at $SPARK_GRAFT_SF_DIR (default sf0.1), lineitem split by
l_returnflag, FOUR numeric columns (l_quantity, l_extendedprice,
l_discount, l_tax):

- arm "shared" — drift_report(numeric=[4 cols]) (the r14 melt +
  by=['column'] engine, 11 FileScans total);
- arm "per_column" — the pre-r14 dispatch replayed faithfully: the union
  of four single-column monitor stacks (ks_drift + psi_drift-total +
  emd_drift per column, ~11 scans PER column = 44).

Both arms materialize through the noop sink; min of N_PASSES interleaved
passes (bench.py methodology — the min squeezes out shared-VM stalls).
Writes drift_report_shared_scan_r14.json.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pyarrow_ops_spark.session import get_spark  # noqa: E402
from pyarrow_ops_spark.functions.stats import (  # noqa: E402
    drift_report,
    emd_drift,
    ks_drift,
    psi_drift,
)

COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
N_PASSES = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3"))


def per_column_report(a, b):
    """The pre-r14 dispatch: one monitor stack per column."""
    parts = []

    def shape(df, col, metric, value_col):
        return df.select(
            F.lit(col).alias("column"),
            F.lit(metric).alias("metric"),
            F.col("n_a"),
            F.col("n_b"),
            F.col(value_col).cast("double").alias("value"),
        )

    for col in COLS:
        parts.append(shape(ks_drift(a, b, col, bins=64), col, "ks_d", "ks_d"))
        psi_total = (
            psi_drift(a, b, col, bins=8)
            .agg(
                F.sum(F.col("c_a")).cast("long").alias("n_a"),
                F.sum(F.col("c_b")).cast("long").alias("n_b"),
                F.round(
                    F.sum(
                        F.floor(F.col("psi_bin") * F.lit(1e9)).cast("long")
                    ).cast("double")
                    / F.lit(1e9),
                    6,
                ).alias("psi"),
            )
            .filter(F.col("psi").isNotNull())
        )
        parts.append(shape(psi_total, col, "psi", "psi"))
        parts.append(
            shape(emd_drift(a, b, col, bins=64), col, "emd_norm", "emd_norm")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="drift_report_shared_scan_r14")
    from pyarrow_ops_spark.sources.tables import load_table

    li = load_table(spark, "lineitem", sf_dir)
    a = li.filter(F.col("l_returnflag") == "N")
    b = li.filter(F.col("l_returnflag") != "N")

    arms = {
        "shared": lambda: drift_report(a, b, numeric=COLS),
        "per_column": lambda: per_column_report(a, b),
    }
    # value identity first: the rewrite must change the plan, not the report
    srows = sorted(tuple(r) for r in arms["shared"]().collect())
    prows = sorted(tuple(r) for r in arms["per_column"]().collect())
    assert srows == prows, "shared-scan report diverged from per-column"

    wall: dict[str, list[float]] = {k: [] for k in arms}
    for _ in range(N_PASSES):
        for name, build in arms.items():
            t0 = time.perf_counter()
            build().write.format("noop").mode("overwrite").save()
            wall[name].append(round(time.perf_counter() - t0, 3))
    scans = {
        name: build()
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
        .count("FileScan parquet")
        for name, build in arms.items()
    }
    out = {
        "sf_dir": sf_dir,
        "columns": COLS,
        "rows_match": True,
        "walls": wall,
        "min_wall": {k: min(v) for k, v in wall.items()},
        "file_scans": scans,
        "speedup_shared_over_per_column": round(
            min(wall["per_column"]) / min(wall["shared"]), 3
        ),
    }
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "drift_report_shared_scan_r14.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
