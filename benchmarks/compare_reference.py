"""Head-to-head vs the reference on ITS OWN benchmark workload.

Recreates the reference's ``compare.py`` harness (left 1e4 rows with unique
``id``; right 1e5 rows with ``id`` sampled with replacement; inner join on
``id`` -> drop_duplicates -> groupby mean; see
``/root/reference/compare.py:6-34``) and times the reference library
against this engine on identical data.

The reference's Cython kernel (``cjoin.pyx``) is not built in this
container (no Cython); a vectorized-numpy shim with identical semantics
stands in — its per-key gather is NumPy-vectorized, slightly slower than
the nogil Cython loop, so read the reference arm as a lower bound and the
comparison as indicative, not exact.

Run: python benchmarks/compare_reference.py
Prints one JSON line: {"reference": {...}, "spark": {...}} (seconds).
"""

from __future__ import annotations

import json
import os
import sys
import time
import types

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference"


def _install_cjoin_shim() -> None:
    """Provide ``cjoin.inner_join`` (semantics of /root/reference/
    pyarrow_ops/cjoin.pyx:10-44) so the un-built Cython module resolves."""

    def inner_join(l_idxs, r_idxs, l_counts, r_counts, l_bidxs, r_bidxs):
        lc = l_counts.astype(np.int64)
        rc = r_counts.astype(np.int64)
        sizes = lc * rc
        total = int(sizes.sum())
        l_align = np.empty(total, dtype=np.int64)
        r_align = np.empty(total, dtype=np.int64)
        out = 0
        for i in range(len(lc)):
            n = sizes[i]
            if n == 0:
                continue
            ls = l_idxs[l_bidxs[i] : l_bidxs[i] + lc[i]]
            rs = r_idxs[r_bidxs[i] : r_bidxs[i] + rc[i]]
            l_align[out : out + n] = np.repeat(ls, rc[i])
            r_align[out : out + n] = np.tile(rs, lc[i])
            out += n
        return l_align, r_align

    mod = types.ModuleType("cjoin")
    mod.inner_join = inner_join
    sys.modules["cjoin"] = mod


def bench_reference(dfl_pd, dfr_pd) -> dict[str, float]:
    import pyarrow as pa

    _install_cjoin_shim()
    sys.path.insert(0, REF)
    from pyarrow_ops import join as ref_join  # noqa: E402
    from pyarrow_ops import drop_duplicates as ref_dd  # noqa: E402
    from pyarrow_ops import groupby as ref_groupby  # noqa: E402

    tl = pa.Table.from_pandas(dfl_pd)
    tr = pa.Table.from_pandas(dfr_pd)
    out: dict[str, float] = {}
    t0 = time.perf_counter()
    j = ref_join(tl, tr, on=["id"])
    out["join"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    ref_dd(j, on=["id"])
    out["drop_duplicates"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    ref_groupby(j, by=["id"]).agg({"age_children": "mean"})
    out["groupby_mean"] = round(time.perf_counter() - t0, 3)
    out["total"] = round(sum(out.values()), 3)
    return out


def bench_spark(dfl_pd, dfr_pd) -> dict[str, float]:
    import tempfile

    from pyarrow_ops_spark import drop_duplicates, get_spark, groupby, join

    spark = get_spark(app_name="compare_reference")
    # Stage inputs as parquet and SCAN them — the engine's native front
    # door. A driver-local relation (createDataFrame) would re-serialize
    # all rows from the driver on every action, benchmarking the wrong
    # thing; the reference arm equivalently starts from its native
    # in-memory pa.Table.
    tmp = tempfile.mkdtemp(prefix="cmp_ref_")
    dfl_pd.to_parquet(os.path.join(tmp, "left.parquet"))
    dfr_pd.to_parquet(os.path.join(tmp, "right.parquet"))
    left = spark.read.parquet(os.path.join(tmp, "left.parquet"))
    right = spark.read.parquet(os.path.join(tmp, "right.parquet"))
    # warm the JVM so the comparison measures the pipeline, not session
    # startup (the reference arm pays no equivalent cost)
    left.limit(1).write.format("noop").mode("overwrite").save()

    out: dict[str, float] = {}
    # The reference runs each op on a MATERIALIZED intermediate (its join
    # returns an in-memory pa.Table that dedup/groupby then consume), so
    # the Spark arm must match: persist the join inside the join timing
    # (materialization is part of producing the result, as it is for the
    # reference) and let the downstream ops read the cache. Without this
    # the lazy plan re-executes the join inside BOTH downstream timings,
    # triple-counting it — the r10 "reference wins drop_duplicates" read
    # was exactly that artifact.
    t0 = time.perf_counter()
    j = join(left, right, on=["id"]).persist()
    j.write.format("noop").mode("overwrite").save()
    out["join"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    drop_duplicates(j, on=["id"]).write.format("noop").mode("overwrite").save()
    out["drop_duplicates"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    groupby(j, ["id"]).agg({"age_children": "mean"}).write.format("noop").mode(
        "overwrite"
    ).save()
    out["groupby_mean"] = round(time.perf_counter() - t0, 3)
    out["total"] = round(sum(out.values()), 3)
    j.unpersist()
    return out


def main() -> None:
    # the reference harness's data shape (compare.py:6-20), deterministic
    rng = np.random.default_rng(7)
    import pandas as pd

    scale = float(os.environ.get("COMPARE_SCALE", "1"))
    nl, nr = int(1e4 * scale), int(1e5 * scale)
    dfl = pd.DataFrame(
        {"id": np.arange(nl), "salary": rng.integers(0, 10_000, nl).astype(float)}
    )
    dfr = pd.DataFrame(
        {
            "id": rng.choice(nl, nr, replace=True),
            "age_children": rng.integers(0, 20, nr).astype(float),
        }
    )
    ref = bench_reference(dfl, dfr)
    spk = bench_spark(dfl, dfr)
    print(json.dumps({"scale": scale, "reference": ref, "spark": spk}))


if __name__ == "__main__":
    main()
