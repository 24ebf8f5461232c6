"""Root-cause experiment for pipeline_llm_curation's superlinear sf10
TASK exponent (benchmarks/curation_stages_r10.json: the map+filter stage
is 22.4x task at 10x data; the two aggregates are marginal noise).

Hypothesis: occupancy skew, not plan shape. A row-local regex map is
linear in rows by construction; but sf1's 3.5 MB scan splits into ~13-20
natural tasks (machine underfilled — each task gets uncontended cores)
while sf10 saturates all 32 threads (each task-second counts SMT/memory-
bandwidth-contended cycles, ~2x slower). Task-seconds measure OCCUPANCY-
WEIGHTED time, not work.

Test: equalize occupancy via explicit repartition width at BOTH scales,
one session, interleaved passes. If the task ratio collapses to ~10x
(linear) at equal width — both at low width (4, machine idle both) and
at saturating width (32, machine contended both) — the exponent is an
artifact of unequal machine occupancy, not a plan defect.

Run:  python benchmarks/curation_map_contention_r10.py [n_passes]
Writes benchmarks/curation_map_contention_r10.json.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pyarrow_ops_spark.session import get_spark  # noqa: E402
from pyarrow_ops_spark.sources.tables import load_table  # noqa: E402
from bench import _StageTaskTime  # noqa: E402
from benchmarks.scale_trend import SF1  # noqa: E402
from benchmarks.sf10_validate import SF10, build_sf10  # noqa: E402

WIDTHS = [4, 32]


def metrics_map(spark, sf_dir: str, width: int):
    from pyarrow_ops_spark.functions.text import (
        bpe_ish_token_count,
        fingerprint,
        lang_guess,
        quality_score,
    )

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    docs = docs.repartition(width)
    m = docs.select(
        "doc_id",
        quality_score("text").alias("q"),
        lang_guess("text").alias("lang_guessed"),
        bpe_ish_token_count("text").alias("toks"),
        fingerprint("text").alias("fp"),
    )
    return m.filter((F.col("q") >= 0.5) & (F.col("lang_guessed") != "und"))


def run_once(spark, tracker, sf_dir: str, width: int) -> tuple[float, float]:
    f = metrics_map(spark, sf_dir, width)
    tracker.delta()
    t0 = time.perf_counter()
    f.write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    task = tracker.delta()
    return wall, task


def main() -> None:
    n_passes = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark(app_name="curation_map_contention_r10")
    spark.sparkContext.setLogLevel("ERROR")
    build_sf10(spark)
    tracker = _StageTaskTime(spark.sparkContext)

    run_once(spark, tracker, SF1, 32)  # warmup
    run_once(spark, tracker, SF10, 32)

    raw = {
        sf: {w: {"wall": [], "task": []} for w in WIDTHS}
        for sf in ("sf1", "sf10")
    }
    for _ in range(n_passes):
        for sf_name, sf_dir in (("sf1", SF1), ("sf10", SF10)):
            for w in WIDTHS:
                wall, task = run_once(spark, tracker, sf_dir, w)
                raw[sf_name][w]["wall"].append(round(wall, 3))
                raw[sf_name][w]["task"].append(round(task, 3))

    out: dict = {"passes": n_passes, "widths": {}}
    for w in WIDTHS:
        t1 = min(raw["sf1"][w]["task"])
        t10 = min(raw["sf10"][w]["task"])
        rec = {
            "sf1_task": t1,
            "sf10_task": t10,
            "task_ratio": round(t10 / max(t1, 1e-9), 2),
            "task_exponent": round(math.log10(t10 / max(t1, 1e-9)), 2),
            "sf1_wall": min(raw["sf1"][w]["wall"]),
            "sf10_wall": min(raw["sf10"][w]["wall"]),
            "all": {sf: raw[sf][w] for sf in ("sf1", "sf10")},
        }
        out["widths"][w] = rec
        print(json.dumps({"width": w, **{k: rec[k] for k in ("sf1_task", "sf10_task", "task_ratio", "task_exponent")}}), flush=True)

    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "curation_map_contention_r10.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps({"detail": path}))
    spark.stop()


if __name__ == "__main__":
    main()
