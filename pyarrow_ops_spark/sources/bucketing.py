"""Bucketed tables: shuffle-free co-located joins and aggregations.

At 100 TB the dominant cost of a fact⋈fact equi-join is shuffling both
sides. Writing both tables bucketed by the join key (same bucket count)
pre-partitions the data on disk; Spark's scan then reports the bucket
hash-partitioning and the sort-merge join needs NO exchange on either side
— the join runs bucket-by-bucket, co-located. Same for groupBy on the
bucket key: the partial/final aggregation collapses to one stage.

Bucketing requires the table catalog (``saveAsTable``) — plain
``.parquet(path)`` writes lose the bucket metadata. The helpers here wrap
that contract; ``tests/test_bucketing.py`` pins the no-Exchange plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: list[str],
    n_buckets: int = 32,
    sort_by: list[str] | None = None,
    format: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) catalog table.

    ``n_buckets`` should divide evenly into the cluster's parallelism and
    keep each bucket's data under a few hundred MB at the target scale —
    buckets are the unit of join parallelism."""
    writer = df.write.format(format).mode(mode).bucketBy(n_buckets, *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table (scan exposes the bucket partitioning to the
    planner, enabling exchange-free joins/aggs on the bucket key)."""
    return spark.table(table)
