"""Graph algorithms as DataFrame iterations.

``connected_components`` (functions/dedup.py) covers the dedup-cluster
decision; this module adds PageRank — the standard importance measure
over an edge relation, used in curation to weight documents by link
centrality (e.g. a crawl graph) or to rank entities in a bipartite
interaction graph.

Scale shape per iteration: one shuffle join of the rank relation against
the out-degree-normalized edge list (co-keyed on the source node) plus
one aggregation keyed by destination — the textbook MapReduce PageRank;
state between iterations is one (node, rank) relation, lineage-truncated
via localCheckpoint exactly like connected_components (swap in a
reliable ``checkpoint`` dir on a real cluster).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """PageRank over a directed edge list; returns (node, rank).

    Standard damped formulation: rank'(v) = (1-d)/N + d * Σ_{u→v}
    rank(u)/outdeg(u), initialized uniform. A FIXED iteration count
    (not convergence detection) keeps the computation a pure function of
    the input — reproducible on any engine, which is what lets a SQL
    oracle replay it by unrolling the iterations. Mass from sink nodes
    (no out-edges) is not redistributed — the usual simplification;
    ranks then sum to < 1, which is fine for ranking purposes.

    Ranks round to 6 decimals: values are O(1/N) and per-engine
    sum-order noise compounds over iterations (large in-degree groups sum
    in different orders on different engines), so the rounding margin is
    kept several orders above the worst-case reorder error rather than
    the single-sum ulp."""
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    if not 0.0 <= damping <= 1.0:
        raise ValueError(f"damping must be in [0, 1], got {damping}")

    from pyspark import StorageLevel

    # nodes and the normalized edge list feed every iteration — persist
    # both so the distinct-edges shuffle and degree aggregate run once,
    # not once per consumer per round
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("t")).distinct()
    nodes = (
        e.select(F.col("s").alias("node"))
        .unionByName(e.select(F.col("t").alias("node")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    outdeg = e.groupBy("s").agg(F.count(F.lit(1)).alias("d"))
    norm = e.join(outdeg, on="s").persist(StorageLevel.MEMORY_AND_DISK)

    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    base = (1.0 - damping) / n
    for _ in range(iterations):
        contribs = (
            norm.join(ranks, on=F.col("s") == F.col("node"))
            .select("t", (F.col("rank") / F.col("d")).alias("c"))
            .groupBy("t")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            nodes.join(contribs, on=F.col("node") == F.col("t"), how="left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce(F.col("inflow"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks.select("node", F.round("rank", 6).alias("rank"))
