"""Data-skipping evidence for Z-order clustering.

Writes the sf0.1 events table (a) Z-ordered on (user_id, event_id),
(b) range-sorted on event_id only, and (c) unsorted, each as N parquet
files; then, for range predicates on EACH dimension, counts how many
files a min/max-stats-based reader must touch (the pruning decision
Spark/Delta/Iceberg make from footer stats). Prints one JSON line.

The point: a single-column sort gives perfect pruning on its own column
and ZERO pruning on any other; Z-order gives strong pruning on every
interleaved column — the property that matters when 100 TB is queried
along more than one axis.
"""

from __future__ import annotations

import glob
import json
import os
import sys

import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pyarrow_ops_spark.session import get_spark  # noqa: E402
from pyarrow_ops_spark.sources.zorder import write_zordered  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = "/tmp/spark_graft_zorder_bench"
N_FILES = 64


def files_touched(path: str, col: str, lo: int, hi: int) -> tuple[int, int]:
    """(files whose [min,max] intersects [lo,hi], total files)."""
    touched = total = 0
    for f in glob.glob(path + "/*.parquet"):
        md = pq.read_metadata(f)
        names = [md.schema.column(j).name for j in range(md.num_columns)]
        idx = names.index(col)
        fmin = min(md.row_group(i).column(idx).statistics.min for i in range(md.num_row_groups))
        fmax = max(md.row_group(i).column(idx).statistics.max for i in range(md.num_row_groups))
        total += 1
        if fmax >= lo and fmin <= hi:
            touched += 1
    return touched, total


def main() -> None:
    spark = get_spark(app_name="zorder_pruning")
    events = spark.read.parquet(os.path.join(SF, "events.parquet"))
    zpath, spath, upath = f"{OUT}/z", f"{OUT}/s", f"{OUT}/u"
    write_zordered(events, ["user_id", "event_id"], zpath, num_files=N_FILES)
    (
        events.repartitionByRange(N_FILES, "event_id")
        .sortWithinPartitions("event_id")
        .write.mode("overwrite").parquet(spath)
    )
    events.repartition(N_FILES).write.mode("overwrite").parquet(upath)

    stats = events.agg(
        F.min("user_id").alias("ulo"), F.max("user_id").alias("uhi"),
        F.min("event_id").alias("elo"), F.max("event_id").alias("ehi"),
    ).collect()[0]
    # a 5%-wide range predicate on each dimension
    u_span = stats["uhi"] - stats["ulo"]
    e_span = stats["ehi"] - stats["elo"]
    preds = {
        "user_id": (stats["ulo"] + u_span // 2, stats["ulo"] + u_span // 2 + u_span // 20),
        "event_id": (stats["elo"] + e_span // 2, stats["elo"] + e_span // 2 + e_span // 20),
    }
    out: dict = {"n_files": N_FILES, "predicate_width": "5%", "layouts": {}}
    for name, path in (("zorder", zpath), ("sort_event_id", spath), ("unsorted", upath)):
        layout = {}
        for col, (lo, hi) in preds.items():
            t, total = files_touched(path, col, lo, hi)
            layout[col] = {"files_touched": t, "of": total}
        out["layouts"][name] = layout
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
