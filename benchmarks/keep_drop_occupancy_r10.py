"""Occupancy-equalized sf1/sf10 exponent for dedup_keep_drop (round-9
verdict ask #3 closure).

Prior facts, r9+r10 A/Bs (keep_drop_ab_r9.json, keep_drop_ab_r10.json):
sf10 TASK time is flat across every start-width arm (256 / 2048 / auto ≈
114-120 s) — the knob does not move large-scale cost; the r9 "1.08 wide
vs 1.22 default" split came entirely from the sf1 DENOMINATOR (a wide
start adds small-scale task overhead: 9.6 s vs 7.1 s at sf1), and wall
exponents read 0.78-0.80 everywhere. The residual ~1.2 task exponent is
therefore suspected to be the same occupancy-weighted accounting
artifact proven for the curation map (curation_map_contention_r10.json):
sf1's aggregate underfills the 32 threads while sf10 saturates them.

Test: run the SAME keep='drop' aggregate over an explicitly
repartition(32)-ed lineitem at both scales (equal concurrent-task
occupancy, one session, interleaved, min-of-N). Task ratio ~10-12x =>
artifact confirmed; the plan itself is linear.

Run:  python benchmarks/keep_drop_occupancy_r10.py [n_passes]
Writes benchmarks/keep_drop_occupancy_r10.json.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyarrow_ops_spark.session import get_spark  # noqa: E402
from pyarrow_ops_spark.operators.dedup import drop_duplicates  # noqa: E402
from pyarrow_ops_spark.sources.tables import load_table  # noqa: E402
from bench import _StageTaskTime  # noqa: E402
from benchmarks.scale_trend import SF1  # noqa: E402
from benchmarks.sf10_validate import SF10, build_sf10  # noqa: E402

WIDTH = 32


def run_once(spark, tracker, sf_dir: str) -> tuple[float, float]:
    li = load_table(spark, "lineitem", sf_dir).repartition(WIDTH)
    out = drop_duplicates(li, on=["l_orderkey"], keep="drop")
    tracker.delta()
    t0 = time.perf_counter()
    out.write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    task = tracker.delta()
    spark.catalog.clearCache()
    return wall, task


def main() -> None:
    n_passes = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark(app_name="keep_drop_occupancy_r10")
    spark.sparkContext.setLogLevel("ERROR")
    build_sf10(spark)
    tracker = _StageTaskTime(spark.sparkContext)

    run_once(spark, tracker, SF1)  # warmup
    run_once(spark, tracker, SF10)

    raw = {sf: {"wall": [], "task": []} for sf in ("sf1", "sf10")}
    for _ in range(n_passes):
        for sf_name, sf_dir in (("sf1", SF1), ("sf10", SF10)):
            w, t = run_once(spark, tracker, sf_dir)
            raw[sf_name]["wall"].append(round(w, 3))
            raw[sf_name]["task"].append(round(t, 3))

    t1, t10 = min(raw["sf1"]["task"]), min(raw["sf10"]["task"])
    out = {
        "passes": n_passes,
        "width": WIDTH,
        "sf1_task": t1,
        "sf10_task": t10,
        "task_ratio": round(t10 / max(t1, 1e-9), 2),
        "task_exponent": round(math.log10(t10 / max(t1, 1e-9)), 2),
        "sf1_wall": min(raw["sf1"]["wall"]),
        "sf10_wall": min(raw["sf10"]["wall"]),
        "all": raw,
    }
    print(json.dumps({k: out[k] for k in ("task_ratio", "task_exponent", "sf1_task", "sf10_task")}), flush=True)
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "keep_drop_occupancy_r10.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps({"detail": path}))
    spark.stop()


if __name__ == "__main__":
    main()
