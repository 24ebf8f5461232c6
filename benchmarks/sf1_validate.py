"""Solo sf1 spot-validation of the most task-expensive queries (r7
verdict ask #2): one decade above the certification scale, on a QUIET
box, min-of-3, recording wall AND executor task time plus the 0.1->1
scaling exponent.

"sf1" is the derived 10x of sf0.1 (scale_trend.build_sf1: ~6M-row
lineitem, 50k documents, 20k embeddings — fits the 128 GiB box). The
exponent is log10(t_sf1 / t_sf0.1): 1.0 = linear, < 1 sublinear,
> 1 super-linear (a plan that would not survive 100 TB and needs a plan
diff before the number is believed — but first re-measure: this VM's
contention can fake a 3x swing, see .claude/skills/verify/SKILL.md).

Run:  python benchmarks/sf1_validate.py [query ...]
Writes benchmarks/sf1_validation_r9.json and prints one JSON line.
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
from benchmarks.scale_trend import SF01, SF1, build_sf1  # noqa: E402

# the 10 most task-expensive queries of the r7 driver bench run
DEFAULT = [
    "dedup_clusters_lsh",
    "dedup_winnow_pairs",
    "dedup_minhash_lsh",
    "order_curriculum",
    "embedding_near_dup_lsh",
    "range_join_price_bands",
    "dedup_keep_drop",
    "events_retention_cohorts",
    "pipeline_llm_curation",
    "text_stats",
    "dedup_winnow_clusters",
]

N_PASSES = 3


def measure(spark, tracker, name: str, sf_dir: str) -> dict:
    wall, task = [], []
    for _ in range(N_PASSES):
        tracker.delta()
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall.append(time.perf_counter() - t0)
        task.append(tracker.delta())
        spark.catalog.clearCache()
    return {"wall_sec": round(min(wall), 3), "task_sec": round(min(task), 3)}


def main() -> None:
    names = sys.argv[1:] or DEFAULT
    spark = get_spark(app_name="sf1_validate")
    spark.sparkContext.setLogLevel("ERROR")
    build_sf1(spark)
    tracker = _StageTaskTime(spark.sparkContext)
    out: dict[str, dict] = {}
    for n in names:
        m01 = measure(spark, tracker, n, SF01)
        m1 = measure(spark, tracker, n, SF1)
        out[n] = {
            "sf0.1": m01,
            "sf1": m1,
            "wall_ratio": round(m1["wall_sec"] / m01["wall_sec"], 2),
            "task_ratio": round(m1["task_sec"] / max(m01["task_sec"], 1e-9), 2),
            "wall_exponent": round(
                math.log10(m1["wall_sec"] / m01["wall_sec"]), 2
            ),
            "task_exponent": round(
                math.log10(m1["task_sec"] / max(m01["task_sec"], 1e-9)), 2
            ),
        }
        print(n, json.dumps(out[n]), flush=True)
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "sf1_validation_r9.json"
    )
    merged: dict = {"passes": N_PASSES, "queries": {}}
    if os.path.exists(path):
        try:
            merged = json.load(open(path))
        except Exception:
            pass
    merged.setdefault("queries", {}).update(out)
    with open(path, "w") as f:
        json.dump(merged, f, indent=1, sort_keys=True)
    print(json.dumps({"detail": path, "n": len(out)}))
    spark.stop()


if __name__ == "__main__":
    main()
