"""Second-decade scale check: sf1 -> sf10 (100x the certification
scale; ~60M-row lineitem, 500k documents with 100-way exact-clone mass,
200k embeddings) for the structural queries whose 100 TB story the
engine leans on. Complements sf1_validate.py (sf0.1 -> sf1): together
they give TWO decades of measured scaling on the same plans.

sf10 is derived from the staged sf1 (benchmarks/scale_trend.build_sf1)
by unioning 10 id-shifted replicas: sf1 ids stay < 100M, replicas shift
by r*100M, so keys stay unique and long-safe while text/vector payloads
repeat (dedup families see 100x corpora with 100x planted-duplicate
mass — the adversarial case for any pair-generation step).

Run:  python benchmarks/sf10_validate.py [query ...]
Writes benchmarks/sf10_validation_r14.json and prints one JSON line.

Round-11 (r10 verdict ask #4): every query now reports BOTH a raw and an
EQUAL-OCCUPANCY exponent. Raw task-seconds are occupancy-weighted: sf1's
small natural scan splits underfill the 32 threads (uncontended cycles)
while sf10 saturates them (SMT/bandwidth-contended cycles, measured
~2-3.7x slower for the identical map) — two rounds of forensics
(curation_map_contention_r10.json, keep_drop_occupancy_r10.json) showed
map-heavy queries reading exponent ~1.2-1.35 through this lens while
being exactly linear (1.01) at equalized occupancy. The equal arm pins
both scales to the SAME saturating width: scan splits via
spark.sql.files.maxPartitionBytes = table_bytes/256 per scale, shuffle
width 256 with AQE coalescing off (256 is the proven spill-safe width
for the keep_drop aggregate at sf10 — NARROW equalization (32) hits the
genuine agg-state cliff the auto-ratchet exists to avoid, 1358 task-s in
keep_drop_occupancy_r10.json, and must not be used here). Wall exponents
remain the headline scale signal; the equal-occupancy task exponent is
the honest work-scaling number.
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
from pyarrow_ops_spark.entry_queries import QUERIES  # noqa: E402
from pyarrow_ops_spark.sources.tables import TABLE_NAMES, load_table  # noqa: E402
from bench import _StageTaskTime  # noqa: E402
from benchmarks.scale_trend import SF1, build_sf1, _SHIFT  # noqa: E402

SF10 = "/tmp/spark_graft_sf10"
REPLICAS = 10
_OFFSET = 100_000_000  # sf1 ids < 100M (10 replicas x 10M + base < 1M)

# structural queries: the LSH dedup flagship, both round-8 scale fixes,
# a pure scan+agg baseline, and the map-heavy curation composite
DEFAULT = [
    "q1_pricing_summary",
    "dedup_keep_drop",
    "dedup_minhash_lsh",
    "embedding_near_dup_lsh",
    "pipeline_llm_curation",
    "dedup_winnow_pairs",
    "dedup_winnow_clusters",
    "pipeline_drift_report",
]

N_PASSES = 2

# r12 verdict ask #5: the one-call drift_report is the API users actually
# schedule per snapshot, so it gets measured (not inferred) scale
# evidence. Not a registry row (the constituent monitors are certified
# individually); injected locally so the sf1->sf10 harness can run it.


def _q_drift_report(spark, sf_dir):
    from pyarrow_ops_spark.functions.stats import drift_report
    from pyarrow_ops_spark.sources.tables import load_table as _lt

    docs = _lt(spark, "documents", sf_dir)
    return drift_report(
        docs.filter(F.col("doc_id") % 2 == 0),
        docs.filter(F.col("doc_id") % 2 == 1),
        numeric=["n_chars"],
        categorical=["lang", "source"],
    )


# equal-occupancy arm: one saturating width for both scales (see module
# docstring — wide enough to avoid the sf10 agg-state cliff, concurrent
# enough to saturate 32 threads at sf1)
EQUAL_WIDTH = 256
_EQ_CONFS = (
    "spark.sql.files.maxPartitionBytes",
    "spark.sql.shuffle.partitions",
    "spark.sql.adaptive.coalescePartitions.enabled",
    "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
)


def _dir_bytes(sf_dir: str) -> int:
    total = 0
    for root, _d, files in os.walk(sf_dir):
        for fn in files:
            if not fn.startswith(("_", ".")):
                try:
                    total += os.path.getsize(os.path.join(root, fn))
                except OSError:
                    pass
    return total


def _pin_equal_occupancy(spark, sf_dir: str) -> dict:
    """Pin the session so BOTH scales run ~EQUAL_WIDTH concurrent tasks in
    every stage: scan splits sized to the sf dir's dominant table, shuffle
    width fixed, AQE coalescing off (it would shrink the small scale back
    below saturation), and the load_table auto-ratchet disabled via its
    env pin. Returns the prior conf values for restore."""
    prior = {}
    for c in _EQ_CONFS:
        try:
            prior[c] = spark.conf.get(c)
        except Exception:
            prior[c] = None
    mpb = max(128 * 1024, _dir_bytes(sf_dir) // EQUAL_WIDTH)
    os.environ["SPARK_GRAFT_INITIAL_PARTITIONS"] = str(EQUAL_WIDTH)
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(mpb))
    spark.conf.set("spark.sql.shuffle.partitions", str(EQUAL_WIDTH))
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    spark.conf.set(
        "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        str(EQUAL_WIDTH),
    )
    return prior


def _unpin_equal_occupancy(spark, prior: dict) -> None:
    os.environ.pop("SPARK_GRAFT_INITIAL_PARTITIONS", None)
    for c, v in prior.items():
        if v is None:
            try:
                spark.conf.unset(c)
            except Exception:
                pass
        else:
            spark.conf.set(c, v)


def build_sf10(spark) -> None:
    build_sf1(spark)
    os.makedirs(SF10, exist_ok=True)
    for name in TABLE_NAMES:
        out = os.path.join(SF10, f"{name}.parquet")
        if os.path.exists(os.path.join(out, "_SUCCESS")):
            continue
        base = load_table(spark, name, SF1)
        if name in ("region", "nation"):
            base.write.mode("overwrite").parquet(out)
            continue
        shift_cols = _SHIFT.get(name, [])
        parts = []
        for r in range(REPLICAS):
            df = base
            for c in shift_cols:
                df = df.withColumn(c, F.col(c) + F.lit(r * _OFFSET))
            parts.append(df)
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        u.write.mode("overwrite").parquet(out)


def measure(spark, tracker, name: str, sf_dir: str, passes: int) -> dict:
    wall, task = [], []
    for _ in range(passes):
        tracker.delta()
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall.append(time.perf_counter() - t0)
        task.append(tracker.delta())
        spark.catalog.clearCache()
    return {"wall_sec": round(min(wall), 3), "task_sec": round(min(task), 3)}


def _exponents(m1: dict, m10: dict) -> dict:
    return {
        "wall_ratio": round(m10["wall_sec"] / m1["wall_sec"], 2),
        "task_ratio": round(m10["task_sec"] / max(m1["task_sec"], 1e-9), 2),
        "wall_exponent": round(math.log10(m10["wall_sec"] / m1["wall_sec"]), 2),
        "task_exponent": round(
            math.log10(m10["task_sec"] / max(m1["task_sec"], 1e-9)), 2
        ),
    }


def main() -> None:
    QUERIES["pipeline_drift_report"] = _q_drift_report
    names = sys.argv[1:] or DEFAULT
    spark = get_spark(app_name="sf10_validate")
    spark.sparkContext.setLogLevel("ERROR")
    build_sf10(spark)
    tracker = _StageTaskTime(spark.sparkContext)
    out: dict[str, dict] = {}
    for n in names:
        # raw arm: production confs (auto-ratchet, AQE coalescing)
        m1 = measure(spark, tracker, n, SF1, N_PASSES + 1)
        m10 = measure(spark, tracker, n, SF10, N_PASSES)
        # equal-occupancy arm: both scales pinned to EQUAL_WIDTH
        prior = _pin_equal_occupancy(spark, SF1)
        try:
            e1 = measure(spark, tracker, n, SF1, N_PASSES)
            _unpin_equal_occupancy(spark, prior)
            prior = _pin_equal_occupancy(spark, SF10)
            e10 = measure(spark, tracker, n, SF10, N_PASSES)
        finally:
            _unpin_equal_occupancy(spark, prior)
        out[n] = {
            "sf1": m1,
            "sf10": m10,
            **_exponents(m1, m10),
            "equal_occupancy": {
                "width": EQUAL_WIDTH,
                "sf1": e1,
                "sf10": e10,
                **_exponents(e1, e10),
            },
        }
        print(n, json.dumps(out[n]), flush=True)
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "sf10_validation_r14.json"
    )
    # merge with any prior partial run so the artifact accumulates across
    # split invocations (long queries run in their own process)
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
