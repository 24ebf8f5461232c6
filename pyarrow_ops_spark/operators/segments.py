"""Customer segmentation: RFM (recency / frequency / monetary) scoring —
the warehouse classic behind lifecycle marketing and LTV cohorts.

Scale design: one per-customer aggregate (shuffle on the customer key,
map-side combined), ONE exact-percentile aggregate producing all nine
quartile cut points as a single broadcast row, then map-only score
assignment. No ntile window: ntile needs a global sort (single-partition
at scale) and its equal-bucket-size semantics make scores depend on
corpus size rather than value thresholds; percentile cuts give the same
quartile interpretation, shuffle nothing, and replay exactly on any
engine (Spark ``percentile`` == DuckDB ``quantile_cont`` interpolation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rfm_segments(
    orders: DataFrame,
    customer_col: str = "o_custkey",
    date_col: str = "o_orderdate",
    amount_col: str = "o_totalprice",
) -> DataFrame:
    """Score every customer 1-4 on Recency, Frequency, Monetary.

    Output: (customer, recency_days, frequency, monetary, r_score,
    f_score, m_score, segment) where recency counts days from the
    customer's last order to the corpus's last order date, scores are
    quartile buckets (4 = best: most recent / most frequent / highest
    spend; cut points are the exact interpolated quartiles over
    customers), and ``segment`` is the concatenated "rfm" code.

    Bucket rule: score = 1 + (v > q1) + (v > q2) + (v > q3) on the rounded
    monetary (strict >, so a value equal to a cut point stays in the
    lower bucket — deterministic on both engines); recency inverts (lower
    days = better)."""
    cust = orders.groupBy(F.col(customer_col).alias("customer")).agg(
        F.max(F.col(date_col)).alias("__last"),
        F.count(F.lit(1)).cast("long").alias("frequency"),
        F.round(F.sum(amount_col), 2).alias("monetary"),
    )
    anchor = orders.agg(F.max(F.col(date_col)).alias("__anchor"))
    base = cust.crossJoin(F.broadcast(anchor)).select(
        "customer",
        F.datediff(F.col("__anchor"), F.col("__last")).cast("long").alias(
            "recency_days"
        ),
        "frequency",
        "monetary",
    )
    cuts = base.agg(
        *[
            F.expr(f"percentile({m}, {q!r})").alias(f"__{m}_{i}")
            for m in ("recency_days", "frequency", "monetary")
            for i, q in ((1, 0.25), (2, 0.5), (3, 0.75))
        ]
    )

    def bucket(m: str) -> F.Column:
        v = F.col(m)
        return (
            F.lit(1)
            + (v > F.col(f"__{m}_1")).cast("int")
            + (v > F.col(f"__{m}_2")).cast("int")
            + (v > F.col(f"__{m}_3")).cast("int")
        )

    scored = base.crossJoin(F.broadcast(cuts)).select(
        "customer",
        "recency_days",
        "frequency",
        "monetary",
        # recency inverts: fewer days since last order = better = 4
        (F.lit(5) - bucket("recency_days")).cast("int").alias("r_score"),
        bucket("frequency").cast("int").alias("f_score"),
        bucket("monetary").cast("int").alias("m_score"),
    )
    return scored.withColumn(
        "segment",
        F.concat(
            F.col("r_score").cast("string"),
            F.col("f_score").cast("string"),
            F.col("m_score").cast("string"),
        ),
    )
