"""Shared helpers used by more than one family module.

Split from the former monolithic entry_queries.py (round 8); the
registry contract and driver-cap ordering live in the package
__init__.
"""
from __future__ import annotations

import pandas as pd  # module-level so stringified UDF type hints resolve

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from pyarrow_ops_spark.operators.filters import filters
from pyarrow_ops_spark.operators.dedup import drop_duplicates
from pyarrow_ops_spark.operators.group import groupby
from pyarrow_ops_spark.operators.join import join
from pyarrow_ops_spark.functions.jsons import str_to_table
from pyarrow_ops_spark.sources.tables import load_table

from pyarrow_ops_spark.entry_queries._registry import query




def _cached_index(sf_dir: str, kind: str, source: str, build) -> str:
    """Content-addressed persisted-index cache for the two indexed queries.

    The cache key folds in a fingerprint (mtime_ns + size) of the source
    parquet, so regenerated data at the same sf_dir gets a fresh build
    instead of silently serving a stale index. The build lands in a
    unique temp directory and is promoted by a single atomic
    ``os.rename``: concurrent sessions (bench + driver emulation) may
    both build, but exactly one rename wins, the loser discards its copy,
    and no reader can ever observe a torn half-written index — the old
    "skip if the stats subdir exists" check could."""
    import hashlib
    import os
    import shutil
    import tempfile

    src = os.path.join(sf_dir, f"{source}.parquet")
    if os.path.isdir(src):
        h = hashlib.md5()
        for p in sorted(os.listdir(src)):
            st = os.stat(os.path.join(src, p))
            h.update(f"{p}:{st.st_mtime_ns}:{st.st_size};".encode())
        fp = h.hexdigest()[:16]
    else:
        st = os.stat(src)
        fp = f"{st.st_mtime_ns}-{st.st_size}"
    key = hashlib.md5(f"{sf_dir}|{fp}".encode()).hexdigest()[:12]
    idx = f"/tmp/spark_graft_{kind}_{key}"
    if not os.path.exists(idx):
        tmp = tempfile.mkdtemp(prefix=f"spark_graft_{kind}_build_", dir="/tmp")
        build(tmp)
        try:
            os.rename(tmp, idx)
        except OSError:
            # either another session promoted its build first (fine — use
            # theirs) or the rename itself failed (permissions, cross-
            # device): only swallow the error if a promoted index exists.
            shutil.rmtree(tmp, ignore_errors=True)
            if not os.path.exists(idx):
                raise
    return idx
