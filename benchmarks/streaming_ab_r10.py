"""Interleaved r8-vs-r9-tree A/B for the streaming tumbling throughput
drop (round-9 verdict ask #6: BENCH_r08 123.6k rows/s -> BENCH_r09
102.6k at the 10x point, join path flat).

Prior fact: `git diff 29070f9 4fa9b56` touches NOTHING in the streaming
execution path — streaming/, sources/arrow_ipc.py,
entry_queries/streaming_sources.py, sources/tables.py and session.py are
bit-identical between the two measured trees. A code regression in the
streaming path is therefore impossible; the remaining suspects are VM
noise and in-suite measurement context (r9's bench added bounded
adaptive re-runs that execute 12 extra queries immediately before the
streaming section).

This harness removes the in-suite context: each arm checks out its tree
in a git worktree and runs ONLY streaming_tumbling_ipc at the 10x point
(fresh process per run, one in-process warmup + steady reading, arms
interleaved A/B/A/B on the same machine state). Verdict rule per the
ask: min-wall ratio within ~±5% across interleaved runs = VM/in-suite
noise, not a regression.

Run:  python benchmarks/streaming_ab_r10.py [n_passes]
Writes benchmarks/streaming_ab_r10.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ARMS = {"r8": "29070f9", "r9": "4fa9b56"}
SF1 = "/tmp/spark_graft_sf1"

RUNNER = r"""
import sys, time
tree = sys.argv[1]
sys.path.insert(0, tree)
from pyarrow_ops_spark.session import get_spark
from pyarrow_ops_spark.entry_queries import QUERIES

spark = get_spark(app_name="streaming_ab")
spark.sparkContext.setLogLevel("ERROR")
walls = []
for _ in range(2):  # first pays drop-dir/codegen warmup, second is steady
    t0 = time.perf_counter()
    QUERIES["streaming_tumbling_ipc"](spark, "%s").write.format("noop").mode(
        "overwrite"
    ).save()
    walls.append(time.perf_counter() - t0)
    spark.catalog.clearCache()
print("WALLS", " ".join(f"{w:.3f}" for w in walls), flush=True)
spark.stop()
""" % SF1


def ensure_worktree(name: str, ref: str) -> str:
    path = f"/tmp/spark_graft_ab_{name}"
    if not os.path.isdir(os.path.join(path, "pyarrow_ops_spark")):
        subprocess.run(
            ["git", "worktree", "add", "--detach", path, ref],
            cwd=REPO,
            check=True,
            capture_output=True,
        )
    return path


def run_arm(runner_path: str, tree: str) -> list[float]:
    out = subprocess.run(
        [sys.executable, runner_path, tree],
        capture_output=True,
        text=True,
        timeout=900,
    )
    for line in out.stdout.splitlines():
        if line.startswith("WALLS"):
            return [float(x) for x in line.split()[1:]]
    raise RuntimeError(f"no WALLS line; stderr tail: {out.stderr[-500:]}")


def main() -> None:
    n_passes = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    trees = {name: ensure_worktree(name, ref) for name, ref in ARMS.items()}
    with tempfile.NamedTemporaryFile(
        "w", suffix=".py", delete=False
    ) as f:
        f.write(RUNNER)
        runner_path = f.name

    n_rows = None
    raw: dict[str, list[list[float]]] = {n: [] for n in ARMS}
    for _ in range(n_passes):
        for name in ARMS:
            raw[name].append(run_arm(runner_path, trees[name]))
            print(json.dumps({"arm": name, "walls": raw[name][-1]}), flush=True)

    # count rows once for rows/s
    import duckdb

    n_rows = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF1}/events.parquet/*.parquet')"
    ).fetchone()[0]

    out: dict = {"passes": n_passes, "n_rows_10x": n_rows, "arms": {}}
    for name in ARMS:
        steady = [w[-1] for w in raw[name]]
        best = min(steady)
        out["arms"][name] = {
            "steady_walls": steady,
            "wall_min": round(best, 3),
            "rows_per_sec": int(n_rows / best),
            "all": raw[name],
        }
    ratio = out["arms"]["r9"]["wall_min"] / out["arms"]["r8"]["wall_min"]
    out["r9_over_r8_wall_ratio"] = round(ratio, 3)
    out["within_5pct"] = abs(ratio - 1.0) <= 0.05
    path = os.path.join(REPO, "benchmarks", "streaming_ab_r10.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps({k: out[k] for k in ("r9_over_r8_wall_ratio", "within_5pct")} | {"detail": path}))


if __name__ == "__main__":
    main()
