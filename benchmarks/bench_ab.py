"""Same-machine worktree A/B: HEAD vs a boundary commit (r11 verdict ask
#4 made this a protocol requirement: the probe set must include the
CURRENT bench's top-3 wall queries by construction — r11 adjudicated its
top wall entry by family analogy because the hand-picked A/B set missed
it — plus one interleaved streaming pass to retire throughput questions
the way streaming_ab_r10 did).

Usage:
    python benchmarks/bench_ab.py <boundary_commit> [--out PATH] [query ...]
    python benchmarks/bench_ab.py --child <sf_dir> <query ...>   (internal)

Default probe set: the top-3 wall queries from bench_full.json (written
by the latest bench run), q1_pricing_summary as a cheap anchor, and
streaming_tumbling_ipc as the streaming pass. Each tree runs the child
in its own process (cwd = tree root so arrowipc workers import that
tree's package), TWO interleaved batches per tree (A B A B), min-of-2
walls per batch, per-query min across batches — host drift shows up as
batch spread, not as an arm effect.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ANCHOR = "q1_pricing_summary"
STREAMING = "streaming_tumbling_ipc"


def child(sf_dir: str, names: list[str]) -> None:
    import time

    sys.path.insert(0, os.getcwd())
    from pyarrow_ops_spark.session import get_spark
    from pyarrow_ops_spark.entry_queries import ALL_QUERIES

    spark = get_spark(app_name="bench_ab")
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for n in names:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            ALL_QUERIES[n](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.perf_counter() - t0)
            spark.catalog.clearCache()
        out[n] = round(best, 3)
    print("ABRESULT " + json.dumps(out), flush=True)
    spark.stop()


def _top3_from_bench_full(repo: str) -> list[str]:
    path = os.path.join(repo, "bench_full.json")
    data = json.load(open(path))
    queries = data.get("queries", data)
    items = sorted(
        ((v, k) for k, v in queries.items() if isinstance(v, (int, float))),
        reverse=True,
    )
    return [k for _v, k in items[:3]]


def _run_child(tree: str, names: list[str]) -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = tree
    # always HEAD's copy of this script (a boundary commit may predate it);
    # cwd + PYTHONPATH pin which tree's PACKAGE the child imports
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--child", SF_DIR, *names],
        cwd=tree, env=env, capture_output=True, text=True, timeout=3600,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("ABRESULT "):
            return json.loads(line[len("ABRESULT "):])
    raise RuntimeError(
        f"child in {tree} produced no result:\n{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}"
    )


def main() -> None:
    if sys.argv[1] == "--child":
        child(sys.argv[2], sys.argv[3:])
        return
    boundary = sys.argv[1]
    args = sys.argv[2:]
    out_path = None
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--out":
            out_path = args[i + 1]
            i += 2
        else:
            names.append(args[i])
            i += 1
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if not names:
        top3 = _top3_from_bench_full(repo)
        names = top3 + [n for n in (ANCHOR, STREAMING) if n not in top3]
    out_path = out_path or os.path.join(repo, "benchmarks", "bench_ab_out.json")

    wt = f"/tmp/ab_boundary_{boundary[:8]}"
    if not os.path.exists(wt):
        subprocess.run(
            ["git", "worktree", "add", "--detach", wt, boundary],
            cwd=repo, check=True,
        )
    results = {"boundary": {}, "head": {}}
    for batch in range(2):  # interleave A B A B
        for label, tree in (("boundary", wt), ("head", repo)):
            got = _run_child(tree, names)
            for n, v in got.items():
                prev = results[label].get(n)
                results[label][n] = v if prev is None else min(prev, v)
            print(f"batch {batch} {label}: {got}", flush=True)
    ratios = {
        n: round(results["head"][n] / results["boundary"][n], 3)
        for n in names
        if results["boundary"].get(n)
    }
    artifact = {
        "what": (
            f"Same-machine worktree A/B: HEAD vs {boundary} at {SF_DIR}; "
            "two interleaved batches per tree (A B A B), min-of-2 walls per "
            "batch, per-query min across batches. Probe set = current "
            "bench_full.json top-3 wall queries by construction + anchor + "
            "one streaming pass (r11 verdict ask #4)."
        ),
        "queries": names,
        f"boundary_{boundary[:8]}": results["boundary"],
        "head": results["head"],
        "head_over_boundary_ratio": ratios,
    }
    json.dump(artifact, open(out_path, "w"), indent=2)
    print(json.dumps(ratios))


if __name__ == "__main__":
    main()
