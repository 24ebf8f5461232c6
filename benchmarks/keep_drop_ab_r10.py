"""Same-session interleaved A/B proving the AUTOSCALED default start
width gives dedup_keep_drop the wide-arm task exponent (round-9 verdict
ask #3: the r9 A/B measured 1.08 at 2048 initial partitions vs 1.22 at
the fixed 256 default; load_table now ratchets initialPartitionNum with
input bytes, so the wide start IS the default — this harness certifies
that under the r9 A/B's controlled protocol).

Arms: 'fixed256' (the old session default, set per query) vs 'auto' (the
value the load_table ratchet chose for this session — sf10 lineitem
~863 MB -> ~3.3k). One session, arms interleaved every pass, min-of-N.

Run:  python benchmarks/keep_drop_ab_r10.py [n_passes]
Writes benchmarks/keep_drop_ab_r10.json.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyarrow_ops_spark.session import get_spark  # noqa: E402
from pyarrow_ops_spark.entry_queries import QUERIES  # noqa: E402
from bench import _StageTaskTime  # noqa: E402
from benchmarks.scale_trend import SF1  # noqa: E402
from benchmarks.sf10_validate import SF10, build_sf10  # noqa: E402

CONF = "spark.sql.adaptive.coalescePartitions.initialPartitionNum"
QUERY = "dedup_keep_drop"


def run_once(spark, tracker, sf_dir: str, width: int) -> tuple[float, float]:
    spark.conf.set(CONF, str(width))
    tracker.delta()
    t0 = time.perf_counter()
    QUERIES[QUERY](spark, sf_dir).write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    task = tracker.delta()
    spark.catalog.clearCache()
    return wall, task


def main() -> None:
    n_passes = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark(app_name="keep_drop_ab_r10")
    spark.sparkContext.setLogLevel("ERROR")
    build_sf10(spark)
    tracker = _StageTaskTime(spark.sparkContext)

    # the ratchet ran during build_sf10's load_table calls; this session's
    # conf now holds the auto-scaled width for the sf10 inputs
    auto_width = int(spark.conf.get(CONF))
    arms = {"fixed256": 256, "auto": auto_width}
    print(json.dumps({"auto_width": auto_width}), flush=True)

    run_once(spark, tracker, SF1, auto_width)  # warmup
    run_once(spark, tracker, SF10, auto_width)

    raw = {
        sf: {a: {"wall": [], "task": []} for a in arms}
        for sf in ("sf1", "sf10")
    }
    for _ in range(n_passes):
        for sf_name, sf_dir in (("sf1", SF1), ("sf10", SF10)):
            for arm, width in arms.items():
                w, t = run_once(spark, tracker, sf_dir, width)
                raw[sf_name][arm]["wall"].append(round(w, 3))
                raw[sf_name][arm]["task"].append(round(t, 3))

    out: dict = {"passes": n_passes, "auto_width": auto_width, "arms": {}}
    for arm in arms:
        rec: dict = {"width": arms[arm]}
        for sf_name in ("sf1", "sf10"):
            rec[sf_name] = {
                "wall_min": min(raw[sf_name][arm]["wall"]),
                "task_min": min(raw[sf_name][arm]["task"]),
                "all": raw[sf_name][arm],
            }
        rec["task_ratio"] = round(
            rec["sf10"]["task_min"] / rec["sf1"]["task_min"], 2
        )
        rec["task_exponent"] = round(math.log10(rec["task_ratio"]), 2)
        rec["wall_ratio"] = round(
            rec["sf10"]["wall_min"] / rec["sf1"]["wall_min"], 2
        )
        rec["wall_exponent"] = round(math.log10(rec["wall_ratio"]), 2)
        out["arms"][arm] = rec
        print(
            json.dumps(
                {
                    "arm": arm,
                    "width": arms[arm],
                    **{
                        k: rec[k]
                        for k in (
                            "task_ratio",
                            "task_exponent",
                            "wall_ratio",
                            "wall_exponent",
                        )
                    },
                    "sf10_task_min": rec["sf10"]["task_min"],
                }
            ),
            flush=True,
        )

    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "keep_drop_ab_r10.json"
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps({"detail": path}))
    spark.stop()


if __name__ == "__main__":
    main()
