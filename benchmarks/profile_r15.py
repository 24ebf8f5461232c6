"""Round-15 optimization profiler: per-query stage/shuffle accounting.

For each named query (default: the full bench list), runs one warm pass
then one measured pass through the noop sink and records wall seconds,
executor task time, stage count, shuffle read/write bytes, and input
bytes — the §1 "measure first" numbers the optimization round works
from. Also dumps ``.explain("formatted")`` for each query to
``plans/r15/<query>_<tag>.txt``.

Usage: python benchmarks/profile_r15.py [tag] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyarrow_ops_spark.session import get_spark  # noqa: E402
from pyarrow_ops_spark.entry_queries import ALL_QUERIES as QUERIES  # noqa: E402
from pyarrow_ops_spark.plans.inspect import formatted_plan  # noqa: E402
from bench import BENCH_QUERIES, _StageTaskTime  # noqa: E402


class _StageStats(_StageTaskTime):
    """Adds stage counts and shuffle/input byte deltas."""

    def delta_full(self) -> dict:
        stages = self._store.stageList(
            self._empty, False, False, self._darr, self._empty
        )
        out = {"stages": 0, "task_sec": 0.0, "shuffle_read": 0,
               "shuffle_write": 0, "input_bytes": 0, "tasks": 0}
        it = stages.iterator()
        while it.hasNext():
            s = it.next()
            key = s.stageId() * 1000 + s.attemptId()
            if key in self._seen:
                continue
            if s.status().toString() == "ACTIVE":
                continue
            self._seen.add(key)
            out["stages"] += 1
            out["task_sec"] += s.executorRunTime() / 1000.0
            out["shuffle_read"] += s.shuffleReadBytes()
            out["shuffle_write"] += s.shuffleWriteBytes()
            out["input_bytes"] += s.inputBytes()
            out["tasks"] += s.numCompleteTasks()
        out["task_sec"] = round(out["task_sec"], 3)
        return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or [n for n in BENCH_QUERIES if n in QUERIES]

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    plans_dir = os.path.join(repo, "plans", "r15")
    os.makedirs(plans_dir, exist_ok=True)

    spark = get_spark(app_name="profile_r15")
    tracker = _StageStats(spark.sparkContext)
    results: dict[str, dict] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"profile:{name}")
        # warm pass (plan compile + codegen), then measured pass
        df = QUERIES[name](spark, sf_dir)
        with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(formatted_plan(df))
        df.write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        tracker.delta_full()
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        wall = time.perf_counter() - t0
        stats = tracker.delta_full()
        stats["wall_sec"] = round(wall, 3)
        results[name] = stats
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(None)

    out_path = os.path.join(repo, "benchmarks", f"profile_r15_{tag}.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
    worst = sorted(results.items(), key=lambda kv: -kv[1]["wall_sec"])[:10]
    for n, s in worst:
        print(
            f"{n:35s} wall {s['wall_sec']:7.3f}  task {s['task_sec']:8.3f}"
            f"  stages {s['stages']:3d}  tasks {s['tasks']:4d}"
            f"  shW {s['shuffle_write']>>10:6d}K  in {s['input_bytes']>>20}M"
        )
    print(json.dumps({"total_wall": round(sum(r["wall_sec"] for r in results.values()), 2),
                      "n": len(results), "detail": out_path}))
    spark.stop()


if __name__ == "__main__":
    main()
