"""Z-order (Morton curve) clustering for data-skipping parquet layouts.

At 100 TB the cheapest query is the one that never reads the file: parquet
row-group and file pruning works off min/max statistics, but min/max is
only selective if the data is CLUSTERED on the filter columns. A single
``sortBy`` clusters one column and destroys locality on the others;
interleaving the bits of several columns (the Morton / Z-order curve, the
same technique behind Delta Lake's ``OPTIMIZE ZORDER BY`` and DB2/Teradata
multi-dimensional clustering) gives every interleaved column bounded
min/max ranges per file, so filters on ANY of them prune.

Everything here is pure Catalyst integer arithmetic — map-only bit math,
one range exchange for the write — and engine-portable (the DuckDB oracle
replays the identical expression; see ``morton_sql``).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# spans above this threshold switch to the double-scaling branch:
# (v - lo) * (2^16 - 1) must stay under 2^63, so exact long arithmetic is
# only safe while span < 2^47 — beyond it the multiply would silently wrap
# negative (Spark's non-ANSI long math) and every Z-key would be garbage
_EXACT_SPAN_LIMIT = 1 << 47


def _scale_long(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Map a long column into [0, 2^bits) by linear scaling:
    ``floor((v - lo) * (2^bits - 1) / (hi - lo))``. For spans under 2^47
    the numerator stays in exact long arithmetic; wider spans (e.g. epoch
    MICROsecond columns, span ~2^50) would overflow the multiply, so they
    scale in IEEE double instead — ``floor((v-lo)/span * top)`` — which
    both engines round identically (the oracle replays the same branch,
    see ``scale_sql``). Degenerate range (lo == hi) maps everything to
    0."""
    span = hi - lo
    top = (1 << bits) - 1
    exact = F.floor(((col - lo) * top) / span)
    wide = F.floor(
        (col - lo).cast("double") / span.cast("double") * F.lit(float(top))
    )
    return (
        F.when(span <= 0, F.lit(0))
        .otherwise(F.when(span < _EXACT_SPAN_LIMIT, exact).otherwise(wide))
        .cast("long")
    )


def scale_sql(expr: str, lo: str, hi: str, bits: int) -> str:
    """DuckDB twin of ``_scale_long`` over SQL subexpressions (same
    exact-long vs wide-double branch at the same span threshold)."""
    top = (1 << bits) - 1
    span = f"({hi} - {lo})"
    return (
        f"CASE WHEN {span} <= 0 THEN 0 "
        f"WHEN {span} < {_EXACT_SPAN_LIMIT} THEN "
        f"CAST(floor((({expr} - {lo}) * {top}) / {span}) AS BIGINT) "
        f"ELSE CAST(floor(CAST({expr} - {lo} AS DOUBLE) / "
        f"CAST({span} AS DOUBLE) * {float(top)}) AS BIGINT) END"
    )


def morton_interleave(cols: Sequence[Column], bits: int) -> Column:
    """Interleave ``bits`` low bits of each column round-robin into one
    long: with cols (a, b) and bits=2 the result is a1 b1 a0 b0. Unrolled
    shift/and/or Catalyst expressions — codegen-fused, no UDF."""
    n = len(cols)
    if n * bits > 63:
        # a real exception, not an assert: asserts vanish under -O and the
        # shiftleft would then silently push bits into the sign bit
        raise ValueError(
            f"{n} cols x {bits} bits = {n * bits} interleaved bits; must "
            "fit a signed long (<= 63) — lower bits or drop a column"
        )
    out = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1))
            out = out.bitwiseOR(
                F.shiftleft(bit, i * n + (n - 1 - j)).cast("long")
            )
    return out


def morton_sql(col_exprs: Sequence[str], bits: int) -> str:
    """The DuckDB/ANSI twin of ``morton_interleave`` over pre-scaled
    integer SQL expressions — used to build oracle strings that replay
    the exact bit math."""
    n = len(col_exprs)
    terms = []
    for i in range(bits):
        for j, e in enumerate(col_exprs):
            shift = i * n + (n - 1 - j)
            terms.append(f"((({e} >> {i}) & 1) << {shift})")
    return " | ".join(terms)


def zorder_key(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 16,
    out: str = "zvalue",
) -> DataFrame:
    """Append the Morton key over ``cols`` (long-castable columns).

    Each column is scaled into [0, 2^bits) against its GLOBAL min/max —
    computed in one aggregate and attached as a broadcast single-row join,
    not a ``.collect()`` — then bit-interleaved. Linear scaling keeps the
    math engine-exact; for heavily skewed columns, pre-bucket with a
    quantile transform before calling (documented trade: Delta's zorder
    uses range partition ids for the same reason).
    """
    if not 1 <= len(cols) <= 4:
        raise ValueError("zorder over 1-4 columns")
    if len(cols) * bits > 63:
        raise ValueError(
            f"{len(cols)} cols x {bits} bits = {len(cols) * bits} "
            "interleaved bits; must fit a signed long (<= 63) — e.g. use "
            "bits=15 for 4 columns"
        )
    aggs = []
    for c in cols:
        aggs += [
            F.min(F.col(c).cast("long")).alias(f"__lo_{c}"),
            F.max(F.col(c).cast("long")).alias(f"__hi_{c}"),
        ]
    stats = df.agg(*aggs)
    scaled = [
        _scale_long(
            F.col(c).cast("long"),
            F.col(f"__lo_{c}"),
            F.col(f"__hi_{c}"),
            bits,
        )
        for c in cols
    ]
    joined = df.crossJoin(F.broadcast(stats))
    return joined.select(*df.columns, morton_interleave(scaled, bits).alias(out))


def compact_files(
    spark,
    path: str,
    out_path: str,
    target_file_bytes: int = 128 << 20,
    zorder_cols: Sequence[str] | None = None,
    bits: int = 16,
) -> int:
    """Rewrite a parquet directory into ~``target_file_bytes`` files —
    the OPTIMIZE/compaction maintenance step of a long-lived table. A
    streaming ingest or over-parallel job leaves thousands of small files;
    at 100 TB the per-file open/footer cost and the scheduler's per-split
    bookkeeping dominate scans long before the bytes do.

    File count = ceil(input_bytes / target), derived from filesystem
    metadata (no data pass). Plain compaction uses ``coalesce`` (no
    shuffle — partitions merge map-side); with ``zorder_cols`` the rewrite
    range-partitions on the Morton key instead, buying multi-axis data
    skipping with the shuffle the rewrite was already paying. Returns the
    number of files written."""
    df = spark.read.parquet(path)
    total = sum(
        int(r.length)
        for r in spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.parquet")
        .load(path)
        .select("length")
        .collect()
    )
    n = max(1, -(-total // target_file_bytes))
    if zorder_cols:
        write_zordered(df, zorder_cols, out_path, num_files=n, bits=bits)
    else:
        df.coalesce(n).write.mode("overwrite").parquet(out_path)
    return n


def write_zordered(
    df: DataFrame,
    cols: Sequence[str],
    path: str,
    num_files: int = 32,
    bits: int = 16,
) -> None:
    """Write ``df`` as parquet clustered on the Z-order curve of ``cols``:
    range-partition on the Morton key (one exchange — the same cost as any
    global sort-write), sort within partitions, drop the key, write.
    Every output file then carries tight min/max ranges on ALL ``cols``,
    so scans filtering any of them skip most files/row-groups. Verify
    with footer stats (see tests) — pruning selectivity is the contract.
    """
    keyed = zorder_key(df, cols, bits=bits, out="__z")
    (
        keyed.repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
