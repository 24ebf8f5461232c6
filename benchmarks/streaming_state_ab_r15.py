"""r15 A/B (r14 verdict ask #7): stream-stream join throughput at the 10x
point vs the state-store partition count.

The state-store partition count of a stateful streaming query is fixed at
checkpoint creation from ``spark.sql.shuffle.partitions`` (AQE is disabled
for stateful workloads, so no coalescing applies). Each bench invocation
starts a FRESH checkpoint, so flipping the session conf between runs is a
faithful A/B of the cluster-side knob.

Run:  python benchmarks/streaming_state_ab_r15.py
Prints one JSON line:
  {"streaming_join_ipc": {"8": {...}, "32": {...}, "64": {...}},
   "streaming_tumbling_ipc": {...}}
with min-of-2 wall seconds and rows/s of 10x source data per setting.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyarrow_ops_spark.session import get_spark  # noqa: E402
from pyarrow_ops_spark.entry_queries import ALL_QUERIES as QUERIES  # noqa: E402
from benchmarks.scale_trend import SF1, build_sf1  # noqa: E402

PARTITION_COUNTS = [8, 32, 64]
QUERY_SIDES = {"streaming_join_ipc": 2, "streaming_tumbling_ipc": 1}


def main() -> None:
    spark = get_spark(app_name="streaming_state_ab_r15")
    build_sf1(spark)
    n10 = spark.read.parquet(os.path.join(SF1, "events.parquet")).count()

    out: dict = {}
    for name, sides in QUERY_SIDES.items():
        out[name] = {}
        for parts in PARTITION_COUNTS:
            spark.conf.set("spark.sql.shuffle.partitions", str(parts))
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                QUERIES[name](spark, SF1).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.perf_counter() - t0)
                spark.catalog.clearCache()
            rows = n10 * sides
            out[name][str(parts)] = {
                "wall_sec": round(best, 3),
                "input_rows": rows,
                "rows_per_sec": int(rows / best),
            }
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
