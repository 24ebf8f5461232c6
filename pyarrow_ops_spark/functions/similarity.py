"""Embedding similarity search over an array<float> column.

Two paths, per the scale story:

- **Brute-force cosine top-k** — exact baseline: broadcast the (small)
  query set against the corpus; one map-side pass computes similarities,
  one shuffle ranks top-k per query. Linear in corpus size; correct for
  any k.
- **Random-hyperplane LSH top-k** — the scale path: each vector gets a
  b-bit signature from fixed pseudo-random hyperplanes; candidates must
  share the signature bucket (or a banded chunk of it), shrinking the
  search from |corpus| to the bucket. Approximate — recall depends on
  bits/bands.

Dot products stay JVM-side via ``F.zip_with`` + ``F.aggregate`` over
double-cast arrays (no UDF). Hyperplanes are generated deterministically
from xxhash64 of (dim, bit) — no stored model, identical across runs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def _as_double(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
) -> DataFrame:
    """Exact top-k by cosine for every query vector.

    ``queries`` is broadcast (query sets are small by construction); the
    corpus is scanned once. Ranking uses (similarity desc, id asc) so ties
    are deterministic. Output: (q_id, vec_id, sim)."""
    query_id_col = query_id_col or id_col
    q = queries.select(
        F.col(query_id_col).alias("q_id"), _as_double(vec_col).alias("q_vec")
    )
    c = corpus.select(F.col(id_col), _as_double(vec_col).alias("c_vec"))
    sims = c.crossJoin(F.broadcast(q)).filter(F.col("q_id") != F.col(id_col)).select(
        "q_id",
        id_col,
        # rank on the ROUNDED similarity + id: deterministic across engines
        # (raw doubles can differ in the last ulp between implementations)
        F.round(cosine(F.col("q_vec"), F.col("c_vec")), 4).alias("sim"),
    )
    w = W.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col(id_col))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .drop("rank")
    )


def similarity_join(
    corpus: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs with cosine >= threshold (exact self-join baseline).
    Output: (id_a, id_b, sim). At scale, swap the cross join for the LSH
    candidate generation in ``lsh_topk`` — the verification stays the same."""
    e = corpus.select(F.col(id_col).alias("id"), _as_double(vec_col).alias("v"))
    a = e.select(F.col("id").alias("id_a"), F.col("v").alias("v_a"))
    b = e.select(F.col("id").alias("id_b"), F.col("v").alias("v_b"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    sim = cosine(F.col("v_a"), F.col("v_b"))
    return (
        pairs.select("id_a", "id_b", F.round(sim, 4).alias("sim"))
        .filter(F.col("sim") >= threshold)
    )


def embedding_near_dup(
    corpus: DataFrame,
    threshold: float = 0.8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate assignment: every vector maps to a
    canonical id = the smallest id among its neighbors with cosine >=
    threshold (itself included, so every row appears exactly once).

    Output: (vec_id, canonical_id, n_neighbors, is_duplicate). This is the
    single-hop union-find approximation used by training-data dedup: rows
    with ``is_duplicate`` are dropped, keeping one representative per
    near-dup cluster. The exact self-join baseline is quadratic; at scale
    the pair generation swaps in ``lsh_signature`` bucketing (see
    ``lsh_topk``) with identical verification semantics."""
    e = corpus.select(F.col(id_col).alias("id"), _as_double(vec_col).alias("v"))
    a = e.select(F.col("id").alias("id_a"), F.col("v").alias("v_a"))
    b = e.select(F.col("id").alias("id_b"), F.col("v").alias("v_b"))
    sim = F.round(cosine(F.col("v_a"), F.col("v_b")), 4)
    pairs = a.join(b, sim >= F.lit(threshold)).select(
        F.col("id_a").alias(id_col), F.col("id_b").alias("nbr")
    )
    return pairs.groupBy(id_col).agg(
        F.min("nbr").alias("canonical_id"),
        F.count(F.lit(1)).alias("n_neighbors"),
    ).withColumn("is_duplicate", F.col("canonical_id") != F.col(id_col))


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_clusters: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
    train_fraction: float = 1.0,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k via an IVF (inverted-file) index: KMeans centroids
    partition the corpus; each query probes only the ``n_probe`` nearest
    cells and ranks candidates by exact cosine.

    Scale story: train KMeans on a sample (``train_fraction``), assign the
    full corpus in one map pass, and persist the assignment as the index —
    the per-query scan drops from |corpus| to ~n_probe/n_clusters of it.
    Centroids live on the driver (n_clusters × dim floats) and broadcast.
    Recall < 1 by design; pytest checks recall against ``cosine_topk``."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    query_id_col = query_id_col or id_col
    c = corpus.select(F.col(id_col), _as_double(vec_col).alias("c_vec"))
    feats = c.withColumn("fv", array_to_vector("c_vec"))
    train = feats if train_fraction >= 1.0 else feats.sample(train_fraction, seed=seed)
    model = KMeans(
        k=n_clusters, seed=seed, featuresCol="fv", predictionCol="cluster"
    ).fit(train)
    assigned = model.transform(feats).select(id_col, "c_vec", "cluster")

    spark = corpus.sparkSession
    centers = spark.createDataFrame(
        [(i, [float(x) for x in ctr]) for i, ctr in enumerate(model.clusterCenters())],
        "cluster int, center array<double>",
    )
    q = queries.select(
        F.col(query_id_col).alias("q_id"), _as_double(vec_col).alias("q_vec")
    )
    probe_w = W.partitionBy("q_id").orderBy(F.col("centroid_sim").desc(), F.col("cluster"))
    probes = (
        q.crossJoin(F.broadcast(centers))
        .select(
            "q_id", "q_vec", "cluster",
            cosine(F.col("q_vec"), F.col("center")).alias("centroid_sim"),
        )
        .withColumn("probe_rank", F.row_number().over(probe_w))
        .filter(F.col("probe_rank") <= n_probe)
        .select("q_id", "q_vec", "cluster")
    )
    cands = assigned.join(F.broadcast(probes), on="cluster").filter(
        F.col("q_id") != F.col(id_col)
    )
    sims = cands.select(
        "q_id",
        F.col(id_col),
        F.round(cosine(F.col("q_vec"), F.col("c_vec")), 4).alias("sim"),
    )
    w = W.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col(id_col))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .drop("rank")
    )


def _hyperplane(dim: int, bit: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane component values in
    [-1, 1), derived from a splitmix-style integer mix of (dim, bit) — no
    RNG state, same on every executor."""
    out = []
    for d in range(dim):
        x = (d * 1_000_003 + bit * 7_919 + 12_345) & 0xFFFFFFFFFFFFFFFF
        x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9 & 0xFFFFFFFFFFFFFFFF
        x = (x ^ (x >> 27)) * 0x94D049BB133111EB & 0xFFFFFFFFFFFFFFFF
        x = x ^ (x >> 31)
        out.append((x / 2**63) - 1.0)
    return out


def lsh_signature(vec: Column, dim: int, bits: int = 16) -> Column:
    """Random-hyperplane signature: bit i = sign(vec · h_i)."""
    sig = F.lit(0).cast("long")
    for i in range(bits):
        plane = F.array(*[F.lit(v) for v in _hyperplane(dim, i)])
        sig = sig + F.when(dot(vec, plane) > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return sig


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    bits: int = 16,
    bands: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
) -> DataFrame:
    """Approximate top-k: candidates must share >= 1 of ``bands`` chunks of
    the hyperplane signature; exact cosine ranks the candidates. At 100 TB
    the candidate join replaces the full corpus scan per query."""
    query_id_col = query_id_col or id_col
    chunk_bits = bits // bands

    def banded(df: DataFrame, idc: str, vecc: str, prefix: str) -> DataFrame:
        v = _as_double(vecc)
        sig = lsh_signature(v, dim, bits)
        return df.select(
            F.col(idc).alias(f"{prefix}id"), v.alias(f"{prefix}vec"), sig.alias("sig")
        ).select(
            f"{prefix}id",
            f"{prefix}vec",
            F.explode(
                F.array(*[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(F.col("sig"), b * chunk_bits)
                        .bitwiseAND(F.lit((1 << chunk_bits) - 1))
                        .alias("val"),
                    )
                    for b in range(bands)
                ])
            ).alias("c"),
        ).select(f"{prefix}id", f"{prefix}vec", "c.band", "c.val")

    qb = banded(queries, query_id_col, vec_col, "q_")
    cb = banded(corpus, id_col, vec_col, "c_")
    cands = (
        qb.join(cb, on=["band", "val"])
        .filter(F.col("q_id") != F.col("c_id"))
        .select("q_id", "q_vec", "c_id", "c_vec")
        .distinct()
    )
    sims = cands.select(
        "q_id",
        F.col("c_id").alias(id_col),
        F.round(cosine(F.col("q_vec"), F.col("c_vec")), 4).alias("sim"),
    )
    w = W.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col(id_col))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .drop("rank")
    )
