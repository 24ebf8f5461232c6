"""Controlled same-session A/B for the dedup_keep_drop sf10 task-time
exponent (r8 verdict ask #2).

The r8 sf10 readings for keep_drop swung ~2.5x across sessions under
identical config (136.6 s vs 314-336 s), so the exponent-1.42 reading
could not be attributed: VM contention vs per-task shuffle state. This
harness removes the session variable: ONE session, two
``initialPartitionNum`` arms (the session default 256 vs 2048) set via
``spark.conf.set`` per query, arms interleaved A/B/A/B (never blocked),
min-of-N per (arm, sf), exponent computed within the same session.

``spark.sql.adaptive.coalescePartitions.initialPartitionNum`` is a
runtime SQL conf — AQE reads it when planning each query's shuffles, so
per-query setting is valid (verified: the executed plan's initial
shuffle width follows the conf).

Run:  python benchmarks/keep_drop_ab_r9.py [n_passes]
Writes benchmarks/keep_drop_ab_r9.json and prints one JSON line per arm.
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
ARMS = [256, 2048]
QUERY = "dedup_keep_drop"


def run_once(spark, tracker, sf_dir: str, arm: int) -> tuple[float, float]:
    spark.conf.set(CONF, str(arm))
    tracker.delta()
    t0 = time.perf_counter()
    QUERIES[QUERY](spark, sf_dir).write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    task = tracker.delta()
    spark.catalog.clearCache()
    return wall, task


def main() -> None:
    n_passes = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark(app_name="keep_drop_ab_r9")
    spark.sparkContext.setLogLevel("ERROR")
    build_sf10(spark)
    tracker = _StageTaskTime(spark.sparkContext)
    default_arm = int(spark.conf.get(CONF))

    # warmup (JIT/codegen/scan caches) — one pass per scale, default arm
    run_once(spark, tracker, SF1, default_arm)
    run_once(spark, tracker, SF10, default_arm)

    raw: dict[str, dict[int, dict[str, list[float]]]] = {
        "sf1": {a: {"wall": [], "task": []} for a in ARMS},
        "sf10": {a: {"wall": [], "task": []} for a in ARMS},
    }
    for _ in range(n_passes):
        for sf_name, sf_dir in (("sf1", SF1), ("sf10", SF10)):
            for arm in ARMS:  # interleaved: 256 then 2048, every pass
                w, t = run_once(spark, tracker, sf_dir, arm)
                raw[sf_name][arm]["wall"].append(round(w, 3))
                raw[sf_name][arm]["task"].append(round(t, 3))

    out: dict = {"passes": n_passes, "default_arm": default_arm, "arms": {}}
    for arm in ARMS:
        rec = {}
        for sf_name in ("sf1", "sf10"):
            rec[sf_name] = {
                "wall_min": min(raw[sf_name][arm]["wall"]),
                "task_min": min(raw[sf_name][arm]["task"]),
                "wall_all": raw[sf_name][arm]["wall"],
                "task_all": raw[sf_name][arm]["task"],
            }
        rec["task_ratio"] = round(rec["sf10"]["task_min"] / rec["sf1"]["task_min"], 2)
        rec["task_exponent"] = round(math.log10(rec["task_ratio"]), 2)
        rec["wall_ratio"] = round(rec["sf10"]["wall_min"] / rec["sf1"]["wall_min"], 2)
        rec["wall_exponent"] = round(math.log10(rec["wall_ratio"]), 2)
        out["arms"][arm] = rec
        print(json.dumps({"arm": arm, **{k: rec[k] for k in ("task_ratio", "task_exponent", "wall_ratio", "wall_exponent")}, "sf10_task_min": rec["sf10"]["task_min"]}), flush=True)

    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "keep_drop_ab_r9.json"
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps({"detail": path}))
    spark.stop()


if __name__ == "__main__":
    main()
