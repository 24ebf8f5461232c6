"""Per-stage drill-down for one query: run it once warm, once measured,
and dump every stage the measured run scheduled — task time, shuffle
bytes, row counts, and the first lines of the stage's RDD call sites —
sorted by executor task time. This is the §1 "which stage is slow"
answer when the aggregate profiler says a query is task-heavy but the
plan alone does not say where the seconds go.

Usage: python benchmarks/stage_drill.py <query> [<query> ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyarrow_ops_spark.session import get_spark  # noqa: E402
from pyarrow_ops_spark.entry_queries import ALL_QUERIES as QUERIES  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:]
    spark = get_spark(app_name="stage_drill")
    sc = spark.sparkContext
    store = sc._jsc.sc().statusStore()
    jvm, gw = sc._jvm, sc._gateway
    empty = jvm.java.util.Collections.emptyList()
    darr = gw.new_array(jvm.double, 0)

    def stage_ids() -> set[int]:
        out = set()
        it = store.stageList(empty, False, False, darr, empty).iterator()
        while it.hasNext():
            s = it.next()
            out.add(s.stageId() * 1000 + s.attemptId())
        return out

    for name in names:
        # warm pass
        QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        spark.catalog.clearCache()
        before = stage_ids()
        QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        spark.catalog.clearCache()
        rows = []
        it = store.stageList(empty, False, False, darr, empty).iterator()
        while it.hasNext():
            s = it.next()
            key = s.stageId() * 1000 + s.attemptId()
            if key in before:
                continue
            desc = (s.description().isDefined()
                    and s.description().get() or s.name())
            rows.append(
                (
                    s.executorRunTime() / 1000.0,
                    s.stageId(),
                    s.numCompleteTasks(),
                    s.shuffleReadBytes() >> 10,
                    s.shuffleWriteBytes() >> 10,
                    s.outputBytes() >> 10,
                    s.inputBytes() >> 10,
                    str(desc)[:80],
                    str(s.name())[:60],
                )
            )
        rows.sort(reverse=True)
        total = sum(r[0] for r in rows)
        print(f"\n=== {name}: {len(rows)} stages, task {total:.2f}s ===")
        for t, sid, nt, shr, shw, ob, ib, desc, nm in rows[:18]:
            print(
                f"  task {t:7.2f}s  stage {sid:5d}  tasks {nt:3d} "
                f" shR {shr:7d}K shW {shw:7d}K in {ib:6d}K  {nm}"
            )
    spark.stop()


if __name__ == "__main__":
    main()
