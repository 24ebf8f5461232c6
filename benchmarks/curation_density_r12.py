"""Clone-density isolation for pipeline_llm_curation (r11 verdict ask #5).

The replica-built scale corpora confound two variables: sf1 documents =
10 replicas of sf0.1 (10-way exact-clone groups), sf10 = 100 replicas
(100-way groups) — so clone GROUP SIZE grows 10x per decade alongside
corpus size. The r10/r11 sf10 validations read an equal-occupancy task
exponent of ~1.2 for the curation composite; the open hypothesis is that
the extra work tracks planted-duplicate DENSITY (pair/group mass in the
fingerprint dedup stage), not scale.

This experiment separates them: build CLONE-FREE variants of both scales
— same row counts, same text length distribution, but every replica's
text carries a unique suffix so cross-replica fingerprints never collide
(clone group size stays CONSTANT with scale: only group count grows,
which is the realistic uniform-density scale-up). Then measure the
curation query on both arms under one equal-occupancy protocol:

  clone arm:    SF1 (10-way groups)      -> SF10 (100-way groups)
  noclone arm:  SF1_NC (1-way + planted) -> SF10_NC (1-way + planted)

Both arms keep the query's own in-query planted 10% duplicates, so the
dedup stage stays non-vacuous at uniform relative density.

Protocol notes: the curation query reads ONLY documents, so the
equal-occupancy pin sizes scan splits from the documents.parquet bytes
of each cell (256 target splits), shuffle width 256, AQE coalescing off,
auto-ratchet env-pinned — identical treatment in all four cells.

Decision rule (written before running): if the noclone equal-occupancy
task exponent reads <= ~1.05 while the clone arm reproduces ~1.2, the
r10/r11 watch-list reading is clone-density, not scale — close the item
(real corpora do not grow clone group size 10x per decade; and if one
did, the tree already has exact-clone collapse as the scale-safe path).
If the noclone arm also reads ~1.2, the curation plan has a genuine
superlinear stage and needs profiling.

Run:  python benchmarks/curation_density_r12.py
Writes benchmarks/curation_density_r12.json.
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
from pyarrow_ops_spark.sources.tables import load_table  # noqa: E402
from bench import _StageTaskTime  # noqa: E402
from benchmarks.scale_trend import SF01, SF1, build_sf1  # noqa: E402
from benchmarks.sf10_validate import SF10, build_sf10  # noqa: E402

SF1_NC = "/tmp/spark_graft_sf1_noclone"
SF10_NC = "/tmp/spark_graft_sf10_noclone"
_OFFSET = 10_000_000
EQUAL_WIDTH = 256
N_PASSES = 2
QUERY = "pipeline_llm_curation"


def _build_noclone(spark, out_dir: str, replicas: int) -> None:
    """Union `replicas` id-shifted copies of the sf0.1 documents, each
    replica's text suffixed with a unique token so cross-replica
    fingerprints (md5 of whitespace-normalized lowered text) can never
    collide. Suffixing EVERY replica (including r=0) keeps the treatment
    uniform; a ~7-char suffix moves the length distribution <1%."""
    out = os.path.join(out_dir, "documents.parquet")
    if os.path.exists(os.path.join(out, "_SUCCESS")):
        return
    os.makedirs(out_dir, exist_ok=True)
    base = load_table(spark, "documents", SF01).select("doc_id", "text")
    parts = []
    for r in range(replicas):
        parts.append(
            base.select(
                (F.col("doc_id") + F.lit(r * _OFFSET)).alias("doc_id"),
                F.concat(F.col("text"), F.lit(f" zqdf{r}")).alias("text"),
            )
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    u.write.mode("overwrite").parquet(out)


def _docs_bytes(sf_dir: str) -> int:
    total = 0
    d = os.path.join(sf_dir, "documents.parquet")
    for root, _dirs, files in os.walk(d):
        for fn in files:
            if not fn.startswith(("_", ".")):
                try:
                    total += os.path.getsize(os.path.join(root, fn))
                except OSError:
                    pass
    return total


_EQ_CONFS = (
    "spark.sql.files.maxPartitionBytes",
    "spark.sql.shuffle.partitions",
    "spark.sql.adaptive.coalescePartitions.enabled",
    "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
)


def _pin(spark, sf_dir: str) -> dict:
    prior = {}
    for c in _EQ_CONFS:
        try:
            prior[c] = spark.conf.get(c)
        except Exception:
            prior[c] = None
    mpb = max(128 * 1024, _docs_bytes(sf_dir) // EQUAL_WIDTH)
    os.environ["SPARK_GRAFT_INITIAL_PARTITIONS"] = str(EQUAL_WIDTH)
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(mpb))
    spark.conf.set("spark.sql.shuffle.partitions", str(EQUAL_WIDTH))
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    spark.conf.set(
        "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        str(EQUAL_WIDTH),
    )
    return prior


def _unpin(spark, prior: dict) -> None:
    os.environ.pop("SPARK_GRAFT_INITIAL_PARTITIONS", None)
    for c, v in prior.items():
        if v is None:
            try:
                spark.conf.unset(c)
            except Exception:
                pass
        else:
            spark.conf.set(c, v)


def _measure(spark, tracker, sf_dir: str, passes: int) -> dict:
    wall, task = [], []
    for _ in range(passes):
        tracker.delta()
        t0 = time.perf_counter()
        QUERIES[QUERY](spark, sf_dir).write.format("noop").mode("overwrite").save()
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
    spark = get_spark(app_name="curation_density_r12")
    spark.sparkContext.setLogLevel("ERROR")
    build_sf1(spark)
    build_sf10(spark)
    _build_noclone(spark, SF1_NC, 10)
    _build_noclone(spark, SF10_NC, 100)

    # corpus sanity: equal row counts per scale, clone mass differs
    counts = {}
    for label, d in (
        ("sf1", SF1), ("sf10", SF10), ("sf1_nc", SF1_NC), ("sf10_nc", SF10_NC)
    ):
        docs = load_table(spark, "documents", d)
        fp = F.md5(F.regexp_replace(F.lower(F.trim("text")), r"\s+", " "))
        row = docs.agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct(fp).alias("n_fp"),
        ).collect()[0]
        counts[label] = {"rows": row["n"], "distinct_fp": row["n_fp"]}
        print(label, counts[label], flush=True)
    assert counts["sf1"]["rows"] == counts["sf1_nc"]["rows"]
    assert counts["sf10"]["rows"] == counts["sf10_nc"]["rows"]

    tracker = _StageTaskTime(spark.sparkContext)
    cells: dict[str, dict] = {}
    # interleave arms so host drift cannot masquerade as an arm effect
    for label, d in (
        ("sf1_clone", SF1), ("sf1_noclone", SF1_NC),
        ("sf10_clone", SF10), ("sf10_noclone", SF10_NC),
    ):
        prior = _pin(spark, d)
        try:
            cells[label] = _measure(spark, tracker, d, N_PASSES)
        finally:
            _unpin(spark, prior)
        print(label, cells[label], flush=True)

    out = {
        "query": QUERY,
        "protocol": {
            "equal_width": EQUAL_WIDTH,
            "passes": N_PASSES,
            "pin": "scan splits = documents bytes / 256 per cell, shuffle 256, AQE coalesce off",
        },
        "corpora": counts,
        "cells": cells,
        "clone_arm": _exponents(cells["sf1_clone"], cells["sf10_clone"]),
        "noclone_arm": _exponents(cells["sf1_noclone"], cells["sf10_noclone"]),
    }
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "curation_density_r12.json"
    )
    json.dump(out, open(path, "w"), indent=1)
    print(json.dumps({"clone": out["clone_arm"], "noclone": out["noclone_arm"]}))
    spark.stop()


if __name__ == "__main__":
    main()
