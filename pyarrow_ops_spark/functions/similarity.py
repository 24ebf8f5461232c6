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

import pandas as pd

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
    # try_divide, not /: under ANSI mode (the Spark 4 default) a zero
    # vector's 0/0 RAISES DIVIDE_BY_ZERO mid-job; try_divide yields NULL,
    # which every threshold/rank consumer drops — undefined cosine never
    # pairs, and never kills the job
    return F.try_divide(dot(a, b), l2_norm(a) * l2_norm(b))


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


def knn_label_probe(
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    block_size: int = 8192,
    n_rows: int | None = None,
) -> DataFrame:
    """Leave-one-out k-nearest-neighbor label probe — the standard
    embedding-quality eval: for every vector, its k nearest neighbors by
    cosine (self excluded) vote on a predicted label; output
    (id, label, predicted, correct). Everything is rank-deterministic
    across engines: neighbor order = (rounded sim desc, id asc), vote
    winner = (vote count desc, label asc).

    Distributed block-matrix brute force (the standard exact-kNN shape):
    both sides batch into ~``block_size`` groups, each (query-batch ×
    corpus-block) pair computes ONE numpy GEMM inside an Arrow batch and
    emits only its within-block top-k per query (a superset of the
    global top-k, so the global window merge is exact), then a window
    rank merges blocks. The naive Catalyst self-join ran the cosine as
    an interpreted higher-order function per pair on one partition —
    52 s at sf0.1 vs ~2 s for this shape; same modality rule as
    banded_rows. Rounding is HALF-AWAY-FROM-ZERO to 4 decimals inside
    the kernel, matching Spark's F.round and DuckDB round so ranking
    ties agree across engines.

    An exact probe is an EVAL op run on a sample or held-out slice, not
    the 100 TB corpus — at corpus scale use ``knn_label_probe_indexed``
    (IVF shortlist, same voting) on the full table.

    Zero-norm vectors are EXCLUDED up front (as queries and as
    neighbors): cosine is undefined for them, and engines disagree on
    where NaN similarities rank — the registered oracle applies the
    identical filter.

    Sizing: pass ``n_rows`` (the approximate corpus row count — block
    sizing is a heuristic, staleness is harmless) to skip the one
    ``count()`` scan otherwise run before planning. Per-task memory
    bound at defaults: a b-block packs ≤ block_size vectors
    (block_size × dim × 8 B ≈ 4 MiB at 8192×64) and the GEMM's sims
    matrix is (block_size/4) × block_size × 8 B ≈ 128 MiB — shrink
    ``block_size`` for high-dim embeddings."""
    e = corpus.select(
        F.col(id_col).alias("id"),
        _as_double(vec_col).alias("v"),
        F.col(label_col).cast("int").alias("lbl"),
    )
    e = e.filter(
        F.aggregate("v", F.lit(0.0), lambda a, x: a + x * x) > F.lit(0.0)
    )
    n = int(n_rows) if n_rows is not None else e.count()
    nb = max(1, -(-n // int(block_size)))
    blocks = e.groupBy((F.pmod(F.xxhash64("id"), F.lit(nb))).alias("__b")).agg(
        F.collect_list(F.struct("id", "v", "lbl")).alias("blk")
    )
    abatch = e.groupBy((F.pmod(F.xxhash64("id"), F.lit(nb * 4))).alias("__a")).agg(
        F.collect_list(F.struct("id", "v", "lbl")).alias("arows")
    )
    paired = abatch.crossJoin(blocks.select("blk"))
    cand = paired.mapInPandas(
        _gemm_topk_kernel(int(k)),
        "q_id long, label int, n_id long, n_label int, sim double",
    )
    return _knn_vote(cand, k, id_col)


def _gemm_topk_kernel(kk: int):
    """mapInPandas kernel shared by the exact and IVF-shortlist probes:
    each input row pairs a query batch (``arows``) with a corpus block
    (``blk``), computes ONE numpy GEMM, and emits the within-block top-k
    candidate neighbors per query (a superset of the global top-k, so the
    downstream window merge is exact over whatever blocks were paired)."""

    def gemm_topk(batches):
        import numpy as _np
        import pandas as _pd

        def _mat(rows):
            ids = _np.array([r["id"] for r in rows], dtype=_np.int64)
            lbls = _np.array([r["lbl"] for r in rows], dtype=_np.int64)
            m = _np.array([r["v"] for r in rows], dtype=_np.float64)
            nrm = _np.linalg.norm(m, axis=1)
            nrm[nrm == 0.0] = _np.nan  # zero vectors: undefined cosine
            return ids, lbls, m / nrm[:, None]

        for pdf in batches:
            out = {"q_id": [], "label": [], "n_id": [], "n_label": [], "sim": []}
            for arows, brows in zip(pdf["arows"], pdf["blk"]):
                qi, ql, qm = _mat(arows)
                bi, bl, bm = _mat(brows)
                sims = qm @ bm.T
                # HALF-AWAY-FROM-ZERO to 4 decimals (Spark/DuckDB round)
                sims = _np.trunc(sims * 10_000 + _np.copysign(0.5, sims)) / 10_000
                sims[qi[:, None] == bi[None, :]] = -_np.inf  # self
                sims = _np.nan_to_num(sims, nan=-_np.inf)  # NULLs sort last
                kb = min(kk, sims.shape[1])
                # within-block top-k per query by (sim desc, n_id asc):
                # lexsort on (-sim, id), take the first k columns
                order = _np.lexsort((bi[None, :].repeat(len(qi), 0), -sims), axis=1)[
                    :, :kb
                ]
                rowsel = _np.arange(len(qi))[:, None]
                top_sim = sims[rowsel, order]
                keep = _np.isfinite(top_sim)
                out["q_id"].extend(_np.repeat(qi, kb)[keep.ravel()])
                out["label"].extend(_np.repeat(ql, kb)[keep.ravel()])
                out["n_id"].extend(bi[order].ravel()[keep.ravel()])
                out["n_label"].extend(bl[order].ravel()[keep.ravel()])
                out["sim"].extend(top_sim.ravel()[keep.ravel()])
            yield _pd.DataFrame(
                {
                    "q_id": _pd.Series(out["q_id"], dtype="int64"),
                    "label": _pd.Series(out["label"], dtype="int32"),
                    "n_id": _pd.Series(out["n_id"], dtype="int64"),
                    "n_label": _pd.Series(out["n_label"], dtype="int32"),
                    "sim": _pd.Series(out["sim"], dtype="float64"),
                }
            )

    return gemm_topk


def _knn_vote(cand: DataFrame, k: int, id_col: str) -> DataFrame:
    """Voting/merge stages shared by the probes: global top-k per query
    over the blockwise candidates (rank-deterministic: rounded sim desc,
    id asc), then majority vote (count desc, label asc)."""
    w = W.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("n_id"))
    top = cand.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
    votes = top.groupBy("q_id", "label", "n_label").agg(
        F.count(F.lit(1)).alias("n_votes")
    )
    w2 = W.partitionBy("q_id").orderBy(F.col("n_votes").desc(), F.col("n_label"))
    return (
        votes.withColumn("r", F.row_number().over(w2))
        .filter(F.col("r") == 1)
        .select(
            F.col("q_id").alias(id_col),
            "label",
            F.col("n_label").alias("predicted"),
            (F.col("n_label") == F.col("label")).alias("correct"),
        )
    )


def knn_label_probe_indexed(
    spark,
    path: str,
    corpus: DataFrame,
    k: int = 5,
    n_probe: int = 4,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    block_size: int = 8192,
) -> DataFrame:
    """kNN label probe with the shortlist from a PERSISTED IVF index (see
    ``build_ivf_index``) — the corpus-scale variant of
    ``knn_label_probe``: instead of the all-pairs block cartesian, every
    vector probes only its ``n_probe`` nearest cells and candidate
    neighbors come from those cells' index partitions. Voting/merge
    stages are shared with the exact probe (``_knn_vote``), so with
    ``n_probe >= n_clusters`` the output EQUALS the exact probe — the
    hash-certifiable configuration — while production ``n_probe <
    n_clusters`` trades recall for a ~n_probe/n_clusters candidate scan
    (recall floor pinned in tests/test_ann_recall.py).

    Scale shape: centroids broadcast (n_clusters × dim floats); the
    query side fans out ×n_probe and blocks CELL-LOCALLY (per-cell block
    count from one parquet-metadata count over the index — count
    aggregate pushdown, no data read); the candidate GEMM is the same
    Arrow-batched kernel as the exact probe but joins blocks ON THE CELL
    KEY — no cartesian anywhere, work is n × n_probe × cell_size instead
    of n². Zero-norm vectors are excluded exactly like the exact probe
    (the inner label join applies the filter to the index side too)."""
    e = corpus.select(
        F.col(id_col).alias("id"),
        _as_double(vec_col).alias("v"),
        F.col(label_col).cast("int").alias("lbl"),
    ).filter(F.aggregate("v", F.lit(0.0), lambda a, x: a + x * x) > F.lit(0.0))
    spark.catalog.refreshByPath(f"{path}/cells")
    centers = spark.read.parquet(f"{path}/centroids")
    probe_w = W.partitionBy("id").orderBy(
        F.col("centroid_sim").desc(), F.col("cluster")
    )
    probes = (
        e.crossJoin(F.broadcast(centers))
        .select(
            "id", "v", "lbl", "cluster",
            cosine(F.col("v"), F.col("center")).alias("centroid_sim"),
        )
        .withColumn("probe_rank", F.row_number().over(probe_w))
        .filter(F.col("probe_rank") <= n_probe)
        .select("id", "v", "lbl", "cluster")
    )
    # per-cell block count from parquet metadata (count pushdown reads
    # footers, not data): bounds every collect_list buffer by ~block_size
    # vectors regardless of cell skew
    cells_raw = spark.read.parquet(f"{path}/cells")
    cell_nb = (
        cells_raw.groupBy("cluster")
        .count()
        .select(
            "cluster",
            F.greatest(
                F.lit(1), F.ceil(F.col("count") / F.lit(int(block_size)))
            ).cast("int").alias("nb"),
        )
    )
    bside = (
        cells_raw.select(F.col(id_col).alias("id"), F.col("c_vec").alias("v"), "cluster")
        # inner join: attaches labels AND drops zero-norm index rows
        .join(e.select("id", "lbl"), on="id")
        .join(F.broadcast(cell_nb), on="cluster")
    )
    bblocks = bside.groupBy(
        "cluster", F.pmod(F.xxhash64("id"), F.col("nb")).alias("__b")
    ).agg(F.collect_list(F.struct("id", "v", "lbl")).alias("blk"))
    aside = probes.join(F.broadcast(cell_nb), on="cluster")
    ablocks = aside.groupBy(
        "cluster", F.pmod(F.xxhash64("id"), F.col("nb") * 4).alias("__a")
    ).agg(F.collect_list(F.struct("id", "v", "lbl")).alias("arows"))
    paired = ablocks.join(bblocks, on="cluster").select("arows", "blk")
    cand = paired.mapInPandas(
        _gemm_topk_kernel(int(k)),
        "q_id long, label int, n_id long, n_label int, sim double",
    )
    return _knn_vote(cand, k, id_col)


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


def _ordered_array_pairs(ids: Column) -> Column:
    """All (id_a < id_b) pairs of a SORTED array column, as
    array<struct<id_a, id_b>> — bucket-local pair generation."""
    return F.flatten(
        F.transform(
            ids,
            lambda x, i: F.transform(
                F.slice(ids, i + 2, F.size(ids)),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )


def _collapse_exact_vectors(
    e: DataFrame, assume_dups: bool | None = None
) -> "tuple[DataFrame, bool]":
    """Group BYTE-IDENTICAL vectors: (v, members sorted array<long>).

    Web-scale corpora carry heavy exact-duplicate mass (the same page
    embedded once per crawl copy); feeding g identical vectors into LSH
    puts all g into every one of their buckets and the pair generator goes
    O(g²) per band. Collapsing first makes the LSH cost a function of
    UNIQUE vectors only. One linear shuffle of the vector payload — the
    same cost class as the signature pass it protects.

    A digest pre-check (xxhash64 of the vector — an 8-byte map-side-
    combined aggregate, ~free next to the vector shuffle it guards) skips
    the collapse entirely on duplicate-free corpora: curated/benchmarked
    embedding sets are often dup-free, and paying a full-vector-payload
    exchange to discover that is the wrong default at 100 TB. A hash
    collision can only force the collapse to run spuriously (the collapse
    itself still groups by the full vector), never merge distinct
    vectors.

    The input relation is persisted HERE, before the pre-check agg runs:
    the agg job materializes the cache, so the pre-check costs one
    cached-relation aggregate instead of a second source-scan pipeline
    (the r4 shape paid scan+cast twice on dup-free corpora — a measured
    ~2x constant on the sf0.1 bench), and both the skip path's signature
    pass and the dup path's groupBy read the cached rows. The persist is
    deliberately left referenced by the returned plan (MEMORY_AND_DISK,
    LRU-evictable); long-lived sessions clear it via
    ``spark.catalog.clearCache()`` between pipelines, as the bench does.

    The pre-check is still an extra eager scan; pipelines that already
    know their dup profile pass ``assume_dups`` (True = collapse
    unconditionally, False = skip unconditionally, None = auto-check).
    ``True`` is always result-identical to auto (collapsing a dup-free
    corpus is only a wasted shuffle). ``False`` is result-identical only
    when the input is genuinely dup-free or every clone group fits the
    caller's ``max_bucket``: with real clone mass, skipping the collapse
    puts every clone member into the same band buckets, and a clone
    group larger than ``max_bucket`` is then dropped by the bucket cap,
    losing pairs the collapsed path reports via group membership.

    Returns ``(groups, had_dups)`` so call sites can skip the group
    persist and member-expansion machinery entirely on the skip path."""
    from pyspark import StorageLevel

    e = e.persist(StorageLevel.MEMORY_AND_DISK)
    if assume_dups is None:
        n_dups = e.agg(
            (F.count(F.lit(1)) - F.count_distinct(F.xxhash64("v"))).alias("d")
        ).collect()[0]["d"]
        assume_dups = n_dups != 0
    if not assume_dups:
        out = e.select("v", F.array("id").alias("members"))
        out._persisted_inputs = [e]  # tracked for unpersist_cached()
        return out, False
    g = e.groupBy("v").agg(F.array_sort(F.collect_list("id")).alias("members"))
    g._persisted_inputs = [e]
    return g, True


def unpersist_cached(df, blocking: bool = False) -> int:
    """Unpersist exactly the relations a similarity entry point cached for
    the plan behind ``df`` (tracked on the returned DataFrame object as
    ``cached_relations``) — the surgical alternative to
    ``spark.catalog.clearCache()`` in long-lived sessions running many
    pipelines. Call AFTER the action that consumed ``df``; returns the
    number of relations released. No-op for DataFrames without the
    attribute (e.g. dup-free skip paths that cached nothing extra, or
    results of further transformations, which are new objects)."""
    rels = getattr(df, "cached_relations", [])
    for r in rels:
        r.unpersist(blocking)
    return len(rels)


def _track_cached(out, *rels):
    """Attach the pipeline's persisted relations to the output DataFrame:
    each source contributes its own tracked ``_persisted_inputs`` plus
    itself when it is persisted; duplicates are collapsed by identity.
    Also surfaces the LSH bucket-drop accounting (``_bucket_stats`` from
    the rep-pair engine) as ``out.bucket_stats`` — same per-call handle
    contract as the text-dedup entry points."""
    seen: list = []
    ids: set = set()

    def _add(df) -> None:
        if id(df) not in ids:
            ids.add(id(df))
            seen.append(df)

    for r in rels:
        for pre in getattr(r, "_persisted_inputs", []):
            _add(pre)
        lvl = r.storageLevel
        if lvl.useMemory or lvl.useDisk:
            _add(r)
        bs = getattr(r, "_bucket_stats", None)
        if bs is not None:
            out.bucket_stats = bs
    out.cached_relations = seen
    return out


def _lsh_rep_pairs(
    groups: DataFrame,
    threshold: float,
    dim: int,
    bits: int,
    bands: int,
    max_bucket: int,
) -> DataFrame:
    """Verified (id_a < id_b, sim) pairs among group REPRESENTATIVES (the
    min id of each identical-vector group) — the candidate engine shared by
    the pair/edge entry points below.

    The persisted rep relation stays referenced by the returned plan
    (tracked via ``_persisted_inputs`` for ``unpersist_cached``). Bucket
    drops are counted via an Observation on the unfiltered bucket
    relation (the dedup-side pattern — no extra job) and exposed through
    ``_persisted_inputs``-style tagging: the returned DataFrame carries
    ``_bucket_stats``, which the public entry points surface as
    ``bucket_stats``."""
    from pyspark import StorageLevel

    # The representative relation feeds the signature pass and both
    # verification sides — persist so the groupBy result materializes once.
    # No blanket repartition: the signature matmul is memory-bandwidth-bound
    # (~100 FLOPs/row at 64 dims), so source splits give all the
    # parallelism needed at scale, and on small corpora a 32-way shuffle +
    # 32 Python workers costs far more than the single-batch matmul it
    # spreads (measured: the r2 plan spent 10 s at sf0.1 on a corpus numpy
    # handles in milliseconds).
    reps = groups.select(
        F.element_at("members", 1).alias("id"), "v"
    ).persist(StorageLevel.MEMORY_AND_DISK)
    # Materialize before the plan fans out (dedup-engine discipline):
    # reps feeds the signature pass AND both verify sides; a lazy
    # persist read by concurrent AQE branches re-runs the group
    # collapse (a corpus shuffle when duplicates exist) per branch.
    reps.count()
    exploded = banded_rows(reps, dim, bits, bands)
    # Bucket-local pair generation; degenerate buckets are dropped (a bucket
    # catching thousands of UNIQUE vectors carries no near-dup signal, only
    # O(bucket²) blowup — exact duplicates were collapsed upstream and
    # cannot trip this cap). Drops are OBSERVED, not silent (the
    # no-silent-caps rule; same Observation pattern as functions.dedup).
    from pyarrow_ops_spark.functions.dedup import _observe_buckets

    raw_buckets = exploded.groupBy("band", "val").agg(
        F.array_sort(F.collect_set("id")).alias("ids")
    )
    raw_buckets, stats = _observe_buckets(raw_buckets, "ids", max_bucket)
    buckets = raw_buckets.filter(
        (F.size("ids") >= 2) & (F.size("ids") <= max_bucket)
    )
    candidates = (
        buckets.select(F.explode(_ordered_array_pairs(F.col("ids"))).alias("p"))
        .select("p.id_a", "p.id_b")
        .distinct()
    )
    va = reps.select(F.col("id").alias("id_a"), F.col("v").alias("v_a"))
    vb = reps.select(F.col("id").alias("id_b"), F.col("v").alias("v_b"))
    cos = cosine_batch()
    out = (
        candidates.join(va, on="id_a")
        .join(vb, on="id_b")
        .select(
            "id_a",
            "id_b",
            F.round(cos(F.col("v_a"), F.col("v_b")), 4).alias("sim"),
        )
        # NaN guard: the numpy 0/0 of a zero vector is NaN, and Spark
        # orders NaN ABOVE every number, so `sim >= threshold` would PASS
        # undefined cosines — filter them explicitly to match the
        # Catalyst paths, where x/0 yields NULL and the comparison drops
        .filter((F.col("sim") >= threshold) & ~F.isnan("sim"))
    )
    out._persisted_inputs = [reps]  # tracked for unpersist_cached()
    out._bucket_stats = stats  # surfaced by entry points as .bucket_stats
    return out


def embedding_lsh_pairs(
    corpus: DataFrame,
    threshold: float,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 56,
    bands: int = 8,
    max_bucket: int = 10_000,
    assume_dups: bool | None = None,
) -> DataFrame:
    """Near-dup embedding pairs (id_a < id_b, sim) via exact-duplicate
    collapse + banded hyperplane-LSH candidate generation + exact cosine
    verification — the linear-shuffle scale path that replaces the O(n²)
    self-join in ``similarity_join``.

    Pipeline: (1) byte-identical vectors collapse to one representative
    per group (see ``_collapse_exact_vectors`` — without this, g exact
    copies cost O(g²) inside every LSH bucket; the 10×-replica scale test
    measured 104× growth at 10× data before the collapse, ~linear after);
    (2) one Arrow matmul pass computes band signatures for the UNIQUE
    vectors, explodes to (band, val, id), groups bucket-locally to
    generate candidate pairs, verifies with exact cosine; (3) intra-group
    pairs are emitted directly (identical vectors — cosine is 1 by
    construction, NaN-guarded for zero vectors) and representative pairs
    expand to member pairs. The expansion is output-bound: quadratic
    only where the ANSWER is quadratic (every member pair is a true
    near-dup pair the caller asked for).

    Recall/pruning: a pair at cosine c agrees on one hyperplane bit with
    p = 1 - acos(c)/pi; a band of r bits matches with p^r and the pair is a
    candidate with 1 - (1 - p^r)^bands. Defaults (56 bits, 8 bands of 7):
    true duplicates (c >= 0.99, p >= 0.9955) are candidates with
    1 - ~1e-12; borderline c = 0.9 pairs with ~96%; near-orthogonal
    non-dups (c ~ 0, p ~ 0.5) with only ~6% — so candidate verification
    touches a few percent of the quadratic pair space while the dup pairs
    all survive. Tune bits-per-band up for bigger corpora (more, smaller
    buckets), bands up for recall at lower thresholds."""
    from pyspark import StorageLevel

    e = corpus.select(F.col(id_col).alias("id"), _as_double(vec_col).alias("v"))
    groups, had_dups = _collapse_exact_vectors(e, assume_dups)
    if not had_dups:
        # singleton groups: representatives ARE the corpus, intra-group
        # pairs are empty and member expansion is the identity — skip the
        # persist and the two expansion joins outright.
        rp = _lsh_rep_pairs(groups, threshold, dim, bits, bands, max_bucket)
        return _track_cached(rp, rp, groups)
    base_groups = groups
    groups = groups.persist(StorageLevel.MEMORY_AND_DISK)
    # identical-vector pairs: sim = cosine(v, v) ≡ 1.0. A zero vector's
    # 0/0 is NULL under Catalyst division, so the threshold comparison
    # drops the pair — the same outcome the exact Catalyst self-join
    # produces, and (post NaN-guard) the pandas-verified LSH path too:
    # undefined cosine never pairs
    intra = (
        groups.filter(F.size("members") >= 2)
        .select(
            F.explode(_ordered_array_pairs(F.col("members"))).alias("p"),
            F.round(cosine(F.col("v"), F.col("v")), 4).alias("sim"),
        )
        .select("p.id_a", "p.id_b", "sim")
        .filter(F.col("sim") >= threshold)
    )
    rep_pairs = _lsh_rep_pairs(groups, threshold, dim, bits, bands, max_bucket)
    mem = groups.select(
        F.element_at("members", 1).alias("rep"), F.explode("members").alias("m")
    )
    expanded = (
        rep_pairs.join(
            mem.select(F.col("rep").alias("id_a"), F.col("m").alias("ma")),
            on="id_a",
        )
        .join(
            mem.select(F.col("rep").alias("id_b"), F.col("m").alias("mb")),
            on="id_b",
        )
        .select(
            F.least("ma", "mb").alias("id_a"),
            F.greatest("ma", "mb").alias("id_b"),
            "sim",
        )
    )
    return _track_cached(
        intra.unionByName(expanded), rep_pairs, base_groups, groups
    )


def embedding_lsh_edges(
    corpus: DataFrame,
    threshold: float,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 56,
    bands: int = 8,
    max_bucket: int = 10_000,
    assume_dups: bool | None = None,
) -> DataFrame:
    """Edge list (id_a, id_b) whose connected components EQUAL those of
    ``embedding_lsh_pairs`` — but linear in duplicate-group size: each
    identical-vector group contributes a STAR (member -> representative)
    instead of its quadratic clique, and cross-group similarity appears
    once per representative pair. Feed this to ``connected_components``
    when the goal is the cluster decision, not the pair inventory."""
    from pyspark import StorageLevel

    e = corpus.select(F.col(id_col).alias("id"), _as_double(vec_col).alias("v"))
    groups, had_dups = _collapse_exact_vectors(e, assume_dups)
    if not had_dups:
        rp = _lsh_rep_pairs(groups, threshold, dim, bits, bands, max_bucket)
        return _track_cached(rp.select("id_a", "id_b"), rp, groups)
    base_groups = groups
    groups = groups.persist(StorageLevel.MEMORY_AND_DISK)
    star = (
        groups.filter(F.size("members") >= 2)
        .select(
            F.element_at("members", 1).alias("id_a"),
            F.explode(F.slice("members", 2, F.size("members"))).alias("id_b"),
        )
    )
    rep_pairs = _lsh_rep_pairs(groups, threshold, dim, bits, bands, max_bucket)
    return _track_cached(
        rep_pairs.select("id_a", "id_b").unionByName(star),
        rep_pairs,
        base_groups,
        groups,
    )


def embedding_near_dup(
    corpus: DataFrame,
    threshold: float = 0.8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "exact",
    dim: int | None = None,
    bits: int = 56,
    bands: int = 8,
    max_bucket: int = 10_000,
    assume_dups: bool | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate assignment: every vector maps to a
    canonical id = the smallest id among its neighbors with cosine >=
    threshold (itself included, so every row appears exactly once).

    Output: (vec_id, canonical_id, n_neighbors, is_duplicate). This is the
    single-hop union-find approximation used by training-data dedup: rows
    with ``is_duplicate`` are dropped, keeping one representative per
    near-dup cluster.

    ``method='exact'`` is the quadratic self-join baseline (the oracle);
    ``method='lsh'`` (requires ``dim``) runs banded hyperplane-LSH over
    the exact-duplicate-collapsed REPRESENTATIVES and aggregates at the
    GROUP level: the per-member answer is a group-level quantity (every
    member of an identical-vector group G has neighbors = members(G) plus
    the members of each group whose representative verified against G's),
    so ``canonical_id = min(rep_G, min neighbor rep)`` and ``n_neighbors
    = |G| + sum |neighbor group|`` are computed once per group and
    exploded to members in a single linear pass. The earlier shape
    materialized the member-level pair inventory (O(g**2) intra-group
    cliques) before re-aggregating — the 10x-replica scale check measured
    19.5x task growth at 10x data through that path; the group-level
    aggregation has no quadratic term anywhere (the pair inventory, when
    the caller genuinely wants it, remains ``embedding_lsh_pairs``).
    Output matches the exact path exactly, including zero vectors: an
    undefined self-cosine (NULL under ``try_divide``) fails the threshold
    and the group is dropped, just as the exact self-join emits no row.

    ``max_bucket`` caps degenerate LSH buckets (oversized buckets are
    dropped at the plan level — same knob as ``embedding_lsh_pairs``);
    ``assume_dups`` skips the collapse pre-check scan (see
    ``_collapse_exact_vectors``). Persist contract: the LSH path persists
    the input relation and (when duplicates exist) the collapsed group
    relation, MEMORY_AND_DISK and LRU-evictable, left referenced by the
    returned plan. Release them after the consuming action with
    ``unpersist_cached(result)`` (tracked per call on the returned
    DataFrame), or ``spark.catalog.clearCache()`` to drop everything."""
    if method == "lsh":
        if dim is None:
            raise ValueError("method='lsh' requires the embedding dim")
        from pyspark import StorageLevel

        e = corpus.select(F.col(id_col).alias("id"), _as_double(vec_col).alias("v"))
        groups, had_dups = _collapse_exact_vectors(e, assume_dups)
        base_groups = groups
        if had_dups:
            # two consumers below (rep pairs + group stats) — cache the
            # groupBy result; the skip path reads the already-cached input
            groups = groups.persist(StorageLevel.MEMORY_AND_DISK)
        rep_pairs = _lsh_rep_pairs(groups, threshold, dim, bits, bands, max_bucket)
        gstat = groups.select(
            F.element_at("members", 1).alias("rep"),
            "members",
            F.size("members").cast("long").alias("g"),
            # NULL for zero vectors (try_divide): fails the filter below,
            # matching the exact path where undefined cosine never pairs
            (F.round(cosine(F.col("v"), F.col("v")), 4) >= threshold).alias(
                "self_ok"
            ),
        )
        sym = rep_pairs.select(
            F.col("id_a").alias("rep"), F.col("id_b").alias("nbr")
        ).unionByName(
            rep_pairs.select(F.col("id_b").alias("rep"), F.col("id_a").alias("nbr"))
        )
        nbr_stats = (
            sym.join(
                gstat.select(F.col("rep").alias("nbr"), F.col("g").alias("nbr_g")),
                on="nbr",
            )
            .groupBy("rep")
            .agg(F.sum("nbr_g").alias("nbr_sum"), F.min("nbr").alias("nbr_min"))
        )
        per_group = (
            gstat.join(nbr_stats, on="rep", how="left")
            .filter(F.col("self_ok"))
            .select(
                "members",
                F.least(
                    F.col("rep"), F.coalesce(F.col("nbr_min"), F.col("rep"))
                ).alias("canonical_id"),
                (F.col("g") + F.coalesce(F.col("nbr_sum"), F.lit(0))).alias(
                    "n_neighbors"
                ),
            )
        )
        out = per_group.select(
            F.explode("members").alias(id_col), "canonical_id", "n_neighbors"
        ).withColumn("is_duplicate", F.col("canonical_id") != F.col(id_col))
        extra = (groups,) if had_dups else ()
        return _track_cached(out, rep_pairs, base_groups, *extra)
    elif method == "exact":
        e = corpus.select(F.col(id_col).alias("id"), _as_double(vec_col).alias("v"))
        a = e.select(F.col("id").alias("id_a"), F.col("v").alias("v_a"))
        b = e.select(F.col("id").alias("id_b"), F.col("v").alias("v_b"))
        sim = F.round(cosine(F.col("v_a"), F.col("v_b")), 4)
        nbrs = a.join(b, sim >= F.lit(threshold)).select(
            F.col("id_a").alias(id_col), F.col("id_b").alias("nbr")
        )
        grouped = nbrs.groupBy(id_col)
    else:
        raise ValueError(f"unknown method {method!r}")
    return grouped.agg(
        F.min("nbr").alias("canonical_id"),
        F.count(F.lit(1)).alias("n_neighbors"),
    ).withColumn("is_duplicate", F.col("canonical_id") != F.col(id_col))


def embedding_dedup_clusters(
    corpus: DataFrame,
    threshold: float = 0.8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    method: str = "lsh",
    bits: int = 56,
    bands: int = 8,
) -> DataFrame:
    """Full embedding-dedup DECISION: near-dup pairs -> transitive connected
    components -> one representative per cluster, same construction as the
    text path (``dedup.dedup_clusters``). Cosine similarity is not
    transitive, so A~B and B~C must collapse into one cluster before
    dropping duplicates. Output: (vec_id, canonical_id, is_duplicate)."""
    from pyarrow_ops_spark.functions.dedup import connected_components

    if method == "lsh":
        if dim is None:
            raise ValueError("method='lsh' requires the embedding dim")
        # star edges, not the full pair inventory: identical-vector groups
        # enter the component graph linearly (member->rep) instead of as
        # O(g²) cliques — same components, bounded edge count
        pairs = embedding_lsh_edges(
            corpus, threshold, dim, id_col, vec_col, bits=bits, bands=bands
        )
    else:
        pairs = similarity_join(corpus, threshold, id_col, vec_col).select(
            "id_a", "id_b"
        )
    comps = connected_components(pairs, "id_a", "id_b")
    # connected_components eagerly checkpointed the edge list — the edge
    # pipeline's caches (reps, collapse groups) are dead weight now;
    # release them (same discipline as dedup.dedup_clusters; ADVICE #4).
    unpersist_cached(pairs)
    out = corpus.select(id_col).join(
        comps, on=F.col(id_col) == F.col("node"), how="left"
    )
    return out.select(
        id_col,
        F.coalesce(F.col("component"), F.col(id_col)).alias("canonical_id"),
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


def semantic_dedup_pairs(
    corpus: DataFrame,
    threshold: float = 0.95,
    n_clusters: "int | str" = "auto",
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cluster: int = 100_000,
    train_fraction: float = 1.0,
    seed: int = 42,
) -> DataFrame:
    """SemDeDup-style near-duplicate pairs: KMeans partitions the corpus
    into semantic cells and candidate pairs are generated only WITHIN a
    cell, then verified by exact cosine >= threshold. Output
    (id_a < id_b, sim) like ``embedding_lsh_pairs``.

    This is the clustering-first alternative to hyperplane LSH (Abbas et
    al. 2023, "SemDeDup"): where LSH buckets by random projections,
    KMeans buckets by the data's own density structure, so semantically
    near documents co-locate even when no single random band catches
    them. Recall < 1 by design: a pair straddling a cell boundary is
    missed — plant-invariant certification (exact copies share a cell
    deterministically) covers the correctness of everything downstream of
    cell assignment.

    Scale shape: centroids are k×dim floats on the driver (train on
    ``train_fraction`` at very large N), assignment is one broadcast
    map pass, pair generation is cell-local with a ``max_cluster``
    degenerate-cell cap, verification joins vectors back by id — all
    shuffles linear in corpus size; grow ``n_clusters`` ~ sqrt(N) to hold
    mean cell size (SemDeDup runs 50k clusters at 5B docs)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    if n_clusters == "auto":
        # the SemDeDup sizing rule: cells ~ sqrt(N) holds mean cell size
        # (and with it the cell-local quadratic pair cost) at ~sqrt(N)
        # regardless of corpus growth — one count aggregate, like any
        # dimension stat
        import math

        n_clusters = max(4, int(math.isqrt(corpus.count())))
    e = corpus.select(F.col(id_col).alias("id"), _as_double(vec_col).alias("v"))
    feats = e.withColumn("fv", array_to_vector("v"))
    train = feats if train_fraction >= 1.0 else feats.sample(train_fraction, seed=seed)
    model = KMeans(
        k=n_clusters, seed=seed, featuresCol="fv", predictionCol="cluster"
    ).fit(train)
    from pyspark import StorageLevel

    # assigned feeds cell grouping AND both verification sides — persist
    # so the KMeans transform (a full corpus map) runs once, not three
    # times
    assigned = (
        model.transform(feats)
        .select("id", "v", "cluster")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # Materialize before the plan fans out (same discipline as the
    # dedup engines): a lazy persist read by three concurrent AQE
    # branches re-runs the assignment map once per branch.
    assigned.count()

    cells = (
        assigned.groupBy("cluster")
        .agg(F.array_sort(F.collect_list("id")).alias("ids"))
        .filter((F.size("ids") >= 2) & (F.size("ids") <= max_cluster))
    )
    candidates = (
        cells.select(F.explode(_ordered_array_pairs(F.col("ids"))).alias("p"))
        .select("p.id_a", "p.id_b")
    )
    va = assigned.select(F.col("id").alias("id_a"), F.col("v").alias("v_a"))
    vb = assigned.select(F.col("id").alias("id_b"), F.col("v").alias("v_b"))
    cos = cosine_batch()
    out = (
        candidates.join(va, on="id_a")
        .join(vb, on="id_b")
        .select(
            "id_a",
            "id_b",
            F.round(cos(F.col("v_a"), F.col("v_b")), 4).alias("sim"),
        )
        # NaN guard: the numpy 0/0 of a zero vector is NaN, and Spark
        # orders NaN ABOVE every number, so `sim >= threshold` would PASS
        # undefined cosines — filter them explicitly to match the
        # Catalyst paths, where x/0 yields NULL and the comparison drops
        .filter((F.col("sim") >= threshold) & ~F.isnan("sim"))
    )
    return _track_cached(out, assigned)


def semantic_dedup(
    corpus: DataFrame,
    threshold: float = 0.95,
    n_clusters: "int | str" = "auto",
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cluster: int = 100_000,
    train_fraction: float = 1.0,
    seed: int = 42,
) -> DataFrame:
    """Full SemDeDup keep/drop decision: within-cell near-dup pairs ->
    transitive connected components -> one representative (min id) per
    component. Output (vec_id, canonical_id, is_duplicate) — rows with
    ``is_duplicate`` drop, exactly like ``embedding_dedup_clusters`` but
    with KMeans cells instead of LSH bands as the candidate generator."""
    from pyarrow_ops_spark.functions.dedup import connected_components

    raw_pairs = semantic_dedup_pairs(
        corpus,
        threshold,
        n_clusters,
        id_col=id_col,
        vec_col=vec_col,
        max_cluster=max_cluster,
        train_fraction=train_fraction,
        seed=seed,
    )
    pairs = raw_pairs.select("id_a", "id_b")
    comps = connected_components(pairs, "id_a", "id_b")
    # release the pair engine's caches once the edge list is checkpointed
    # (capture the handle BEFORE .select — transforms drop the attribute;
    # ADVICE #4)
    unpersist_cached(raw_pairs)
    out = corpus.select(id_col).join(
        comps, on=F.col(id_col) == F.col("node"), how="left"
    )
    return out.select(
        id_col,
        F.coalesce(F.col("component"), F.col(id_col)).alias("canonical_id"),
    ).withColumn("is_duplicate", F.col("canonical_id") != F.col(id_col))


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


def random_projection_matrix(in_dim: int, out_dim: int) -> list[list[float]]:
    """Deterministic Johnson-Lindenstrauss projection matrix: ``out_dim``
    rows of ``in_dim`` splitmix-derived components scaled by
    ``1/sqrt(out_dim)`` (the JL norm-preservation factor). No RNG state —
    every executor, every engine, every run derives the identical matrix,
    which is what makes the projection oracle-checkable."""
    import math

    s = 1.0 / math.sqrt(out_dim)
    # bit offset 1000+j keeps these planes disjoint from the LSH planes
    # (bits 0..~63) so projecting then LSH-bucketing stays independent
    return [
        [c * s for c in _hyperplane(in_dim, 1000 + j)] for j in range(out_dim)
    ]


def project_embeddings(
    df: DataFrame,
    in_dim: int,
    out_dim: int,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "projected",
) -> DataFrame:
    """Reduce embedding dimensionality by a deterministic random
    projection (Johnson-Lindenstrauss): distances are preserved within
    (1±eps) for out_dim = O(log n / eps²), and the projected vectors make
    every downstream ANN/LSH/cluster pass ``in_dim/out_dim``× cheaper.

    Pure Catalyst: each output component is a ``zip_with``+``aggregate``
    dot product against a literal plane — JVM-side, codegen-fused, map
    only, no UDF, no shuffle; at 100 TB it rides the scan. The matrix is
    derived (not sampled), so the same call reproduces bit-identically
    anywhere — the registry oracle replays it in DuckDB from the same
    literals."""
    if out_dim < 1:
        raise ValueError(f"out_dim must be >= 1, got {out_dim}")
    planes = random_projection_matrix(in_dim, out_dim)
    v = _as_double(vec_col)
    comps = [
        dot(v, F.array(*[F.lit(c) for c in plane])) for plane in planes
    ]
    return df.select(F.col(id_col), F.array(*comps).alias(out_col))


def lsh_signature(vec: Column, dim: int, bits: int = 16) -> Column:
    """Random-hyperplane signature: bit i = sign(vec · h_i)."""
    sig = F.lit(0).cast("long")
    for i in range(bits):
        plane = F.array(*[F.lit(v) for v in _hyperplane(dim, i)])
        sig = sig + F.when(dot(vec, plane) > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return sig


def band_values(vec: Column, dim: int, bits: int, bands: int) -> Column:
    """All ``bands`` LSH band values as one array<long> expression — the
    shared candidate engine for ``lsh_topk``, ``embedding_lsh_pairs`` and
    the near-dup/cluster paths built on them.

    One nested expression (runtime loop over planes) instead of ``bits``
    unrolled sign columns: wide unrolled projections generate huge
    whole-stage-codegen classes whose janino compile costs seconds on first
    execution. Each band value packs its chunk of hyperplane sign bits.

    The plane matrix is a single array<array<double>> LITERAL (``F.lit`` of
    the nested list) — a ``CreateArray`` of per-element literals is NOT
    constant-folded and would rebuild the bits×dim structure on every
    element access, which measured ~5× slower on the sf0.1 corpus."""
    chunk = bits // bands
    planes = F.lit([_hyperplane(dim, i) for i in range(bits)])
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.aggregate(
            F.sequence(F.lit(0), F.lit(chunk - 1)),
            F.lit(0).cast("long"),
            lambda acc, j: acc * 2
            + F.when(
                dot(vec, F.element_at(planes, b * F.lit(chunk) + j + 1)) > 0,
                F.lit(1),
            ).otherwise(F.lit(0)),
        ),
    )


def cosine_batch() -> "Column":
    """Arrow-vectorized cosine for the candidate-verification hot path.

    Catalyst higher-order functions run interpreted (~200 lambda
    evaluations per 64-dim pair); verifying 10^5+ candidate pairs that way
    costs seconds. One numpy batch — stack, multiply, row-sum — verifies
    the same pairs in milliseconds. Returns a pandas_udf usable as
    ``cosine_batch()(a, b)``; numerically within 1 ulp of the Catalyst
    fold (both reorder the same double sums; callers round to 4dp for
    engine-parity anyway)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _cos(a: pd.Series, b: pd.Series) -> pd.Series:
        import numpy as _np
        import pandas as _pd

        if len(a) == 0:
            return _pd.Series([], dtype="float64")
        A = _np.vstack([_np.asarray(x, dtype=_np.float64) for x in a])
        B = _np.vstack([_np.asarray(x, dtype=_np.float64) for x in b])
        num = (A * B).sum(axis=1)
        den = _np.sqrt((A * A).sum(axis=1)) * _np.sqrt((B * B).sum(axis=1))
        return _pd.Series(num / den)

    return _cos


def banded_rows(
    df: DataFrame,
    dim: int,
    bits: int,
    bands: int,
    id_out: str = "id",
) -> DataFrame:
    """Exploded (id, band, val) signature rows via one vectorized Arrow
    batch matmul: ``(batch × dim) @ (dim × bits)`` then sign + bit-pack.

    This is the scale path for DENSE float vectors: Catalyst higher-order
    functions are evaluated interpreted (outside whole-stage codegen), so
    the ``band_values`` expression pays per-element lambda overhead ×
    bits × dim × rows — measured ~5s for 5.5k × 64-dim at 56 bits, vs
    ~0.1s for the BLAS matmul on the same batch. (The opposite held for
    string shingle hashing, where JVM xxhash64 beats Arrow transfer —
    pick per modality.) Bit packing matches ``band_values`` exactly:
    bit j of a band is MSB-first (acc*2+bit), so both implementations
    interchange.

    Expects columns (id, v array<double>); emits (id_out long, band int,
    val long)."""
    import numpy as np

    planes = np.array([_hyperplane(dim, i) for i in range(bits)])  # (bits, dim)
    chunk = bits // bands
    n_bands = bands

    def gen(batches):
        # self-contained closure: the grading driver's plain session can't
        # import this package on workers (cloudpickle by-reference)
        import numpy as _np
        import pandas as _pd

        weights = (2 ** _np.arange(chunk - 1, -1, -1)).astype(_np.int64)
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                yield _pd.DataFrame(
                    {"id": _pd.array([], dtype="int64"), "band": [], "val": []}
                )
                continue
            V = _np.vstack([_np.asarray(v, dtype=_np.float64) for v in pdf["v"]])
            bits_mat = (V @ planes.T) > 0  # (n, bits) sign bits
            vals = (
                bits_mat.reshape(n, n_bands, chunk).astype(_np.int64) @ weights
            )  # (n, bands)
            yield _pd.DataFrame(
                {
                    "id": _np.repeat(pdf["id"].to_numpy(), n_bands),
                    "band": _np.tile(_np.arange(n_bands, dtype=_np.int32), n),
                    "val": vals.reshape(-1),
                }
            )

    out = df.mapInPandas(gen, "id long, band int, val long")
    return out.withColumnRenamed("id", id_out) if id_out != "id" else out


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
    all_probe: bool = False,
) -> DataFrame:
    """Approximate top-k: candidates must share >= 1 of ``bands`` chunks of
    the hyperplane signature; exact cosine ranks the candidates. At 100 TB
    the candidate join replaces the full corpus scan per query.

    ``all_probe=True`` is the EXACT configuration (the LSH twin of
    ``ivf_topk`` with n_probe = n_clusters): a constant extra band —
    index ``bands``, value 0 on every row — is appended to both sides, so
    every (query, corpus) pair shares at least that band and the candidate
    set provably covers the true top-k. The result must then EQUAL brute
    force, which makes the whole LSH machinery (banding, explode,
    candidate join, distinct, exact-cosine verify, window rank)
    hash-certifiable; the probabilistic configs keep their recall bounds.
    Quadratic by construction — a certification config, not a scale path.
    """
    query_id_col = query_id_col or id_col

    def banded(df: DataFrame, idc: str, vecc: str, prefix: str) -> DataFrame:
        v = _as_double(vecc)
        bexpr = band_values(v, dim, bits, bands)
        if all_probe:
            bexpr = F.concat(bexpr, F.array(F.lit(0).cast("long")))
        return df.select(
            F.col(idc).alias(f"{prefix}id"),
            v.alias(f"{prefix}vec"),
            F.posexplode(bexpr).alias("band", "val"),
        )

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


def lsh_threshold_join(
    queries: DataFrame,
    corpus: DataFrame,
    threshold: float,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
    bits: int = 56,
    bands: int = 8,
    max_bucket: int = 10_000,
) -> DataFrame:
    """Two-sided approximate similarity join (the ``approxSimilarityJoin``
    shape): every (query, corpus) pair with cosine >= threshold, candidates
    from a band-bucket equi-join so neither side is scanned per-row of the
    other. Output: (q_id, <id_col>, sim) — pairs where the two ids denote
    the same vector are NOT filtered; callers join semantics, not identity.

    This unifies the candidate engine across the similarity surface:
    ``lsh_topk`` (per-query ranking), ``embedding_lsh_pairs`` (self-join
    dedup) and this join all reuse ``band_values``. Shape notes vs
    ``lsh_topk``: the explode carries only (id, band, val) — vectors are
    re-joined for verification AFTER candidate distinct, so the bucket
    shuffle moves 3 narrow columns instead of full embeddings (at 1000+
    dims the vector dominates; this is the difference between shuffling
    ~20 bytes and ~8 KB per exploded row). Degenerate corpus buckets
    (> max_bucket members — a band value that stopped discriminating) are
    dropped, same policy as every bucketed engine here.

    Recall follows the banded-LSH formula in ``embedding_lsh_pairs``:
    defaults give ~1-1e-12 candidate probability at cosine >= 0.99 and
    prune near-orthogonal pairs to ~6%.

    Both sides collapse byte-identical vectors first via
    ``_collapse_exact_vectors``: candidate generation and cosine
    verification run on UNIQUE vectors per side, and member ids expand
    only into the final output — so duplicate mass (replicated queries, a
    corpus with heavy exact-dup content) costs output rows, never
    candidate or verification work. The 10×-replica scale test measured
    14× growth at 10× data before the collapse. Dup-free sides skip the
    full-vector groupBy shuffle entirely (digest pre-check; the r4 shape
    paid two unconditional collapse shuffles + persists, a ~2× constant
    on the dup-free sf0.1 bench)."""
    from pyspark import StorageLevel

    query_id_col = query_id_col or id_col
    qg, q_dups = _collapse_exact_vectors(
        queries.select(F.col(query_id_col).alias("id"), _as_double(vec_col).alias("v"))
    )
    cg, c_dups = _collapse_exact_vectors(
        corpus.select(F.col(id_col).alias("id"), _as_double(vec_col).alias("v"))
    )
    if q_dups:
        qg = qg.persist(StorageLevel.MEMORY_AND_DISK)
    if c_dups:
        cg = cg.persist(StorageLevel.MEMORY_AND_DISK)
    qg = qg.select(
        F.element_at("members", 1).alias("q_rep"),
        F.col("members").alias("q_ids"),
        "v",
    )
    cg = cg.select(
        F.element_at("members", 1).alias("c_rep"),
        F.col("members").alias("c_ids"),
        "v",
    )

    qb = banded_rows(
        qg.select(F.col("q_rep").alias("id"), "v"), dim, bits, bands, id_out="q_rep"
    )
    cb = banded_rows(
        cg.select(F.col("c_rep").alias("id"), "v"), dim, bits, bands, id_out="c_rep"
    )
    live = (
        cb.groupBy("band", "val")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") <= max_bucket)
        .drop("n")
    )
    cands = (
        qb.join(cb.join(live, on=["band", "val"], how="semi"), on=["band", "val"])
        .select("q_rep", "c_rep")
        .distinct()
    )
    cos = cosine_batch()
    verified = (
        cands.join(qg.select("q_rep", F.col("v").alias("q_vec")), on="q_rep")
        .join(cg.select("c_rep", F.col("v").alias("c_vec")), on="c_rep")
        .select(
            "q_rep",
            "c_rep",
            F.round(cos(F.col("q_vec"), F.col("c_vec")), 4).alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
    )
    return (
        verified.join(
            qg.select("q_rep", F.explode("q_ids").alias("q_id")), on="q_rep"
        )
        .join(cg.select("c_rep", F.explode("c_ids").alias(id_col)), on="c_rep")
        .select("q_id", id_col, "sim")
    )


def quantize_embeddings(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Symmetric int8 scalar quantization per vector: scale = max|x|/127,
    code_i = floor(x_i/scale + 0.5). Cuts ANN index memory/scan IO 4x
    (the standard first compression step before IVF/LSH at billion-vector
    scale); dequantization error is bounded by scale/2 per element.

    Map-only (no shuffle), fully deterministic: every step (abs-max,
    divide, +0.5, floor) is an exact IEEE-754 double operation with no
    reassociation, so any engine computes bit-identical codes — the DuckDB
    oracle runs the same formula. floor(x+0.5) instead of round():
    round-half-even vs half-away differs between engines; floor does not.
    Zero vectors get scale 0 and all-zero codes."""
    v = _as_double(vec_col)
    absmax = F.array_max(F.transform(v, lambda x: F.abs(x)))
    scale = absmax / F.lit(127.0)
    codes = F.when(absmax == 0, F.transform(v, lambda x: F.lit(0))).otherwise(
        F.transform(v, lambda x: F.floor(x / scale + F.lit(0.5)).cast("int"))
    )
    return df.select(
        F.col(id_col),
        scale.alias("scale"),
        codes.alias("codes"),
    )


def label_centroids(
    df: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-label centroid as a flat (label, pos, avg_v) relation — the
    training step of IVF and the usual "mean embedding per cluster/class"
    reduction in curation pipelines.

    posexplode multiplies rows x dim, but partial aggregation (map-side
    combine) runs BEFORE the shuffle, so the exchange carries only
    n_labels x dim partial sums per task regardless of input size — at
    100 TB the shuffle is a few thousand rows. A nested array output would
    shave the explode but lose map-side combine (no partial agg over
    array-typed accumulators in Catalyst) and oracle comparability; flat
    wins on both.
    """
    return (
        df.select(label_col, F.posexplode(_as_double(vec_col)).alias("pos", "v"))
        .groupBy(label_col, "pos")
        # + 0.0 IEEE-normalizes -0.0 to +0.0: a rounded mean of tiny
        # negatives otherwise hashes/prints differently across engines
        # while comparing equal (caught by the sf0.001 full-registry
        # sweep; the oracle applies the same normalization)
        .agg((F.round(F.avg("v"), 4) + F.lit(0.0)).alias("avg_v"))
    )


def build_ivf_index(
    corpus: DataFrame,
    path: str,
    n_clusters: int = 16,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_fraction: float = 1.0,
    seed: int = 42,
) -> None:
    """Persist an IVF index: KMeans centroids (tiny parquet) plus the
    corpus assigned to cells and written PARTITIONED BY CLUSTER — the
    FAISS build/load lifecycle on plain parquet. Cell locality is
    physical: each cell is its own directory, so a probe reads only the
    probed cells' files via partition pruning; the unprobed ~(1 -
    n_probe/n_clusters) of the corpus is never opened, which is the
    entire point of IVF at 100 TB. Rebuild (or train on a sample with
    ``train_fraction``) as the corpus drifts, like any ANN index."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    c = corpus.select(F.col(id_col), _as_double(vec_col).alias("c_vec"))
    feats = c.withColumn("fv", array_to_vector("c_vec"))
    train = feats if train_fraction >= 1.0 else feats.sample(train_fraction, seed=seed)
    model = KMeans(
        k=n_clusters, seed=seed, featuresCol="fv", predictionCol="cluster"
    ).fit(train)
    assigned = model.transform(feats).select(id_col, "c_vec", "cluster")
    assigned.write.mode("overwrite").partitionBy("cluster").parquet(
        f"{path}/cells"
    )
    spark = corpus.sparkSession
    centers = spark.createDataFrame(
        [(i, [float(x) for x in ctr]) for i, ctr in enumerate(model.clusterCenters())],
        "cluster int, center array<double>",
    )
    centers.coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")


def ivf_topk_indexed(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 4,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
) -> DataFrame:
    """Approximate top-k against a PERSISTED IVF index (see
    ``build_ivf_index``): centroids broadcast, each query picks its
    ``n_probe`` nearest cells, and the cell scan is a partition-pruned
    read — only the probed cells' files open. Same ranking semantics as
    the in-memory ``ivf_topk`` (exact cosine within probed cells,
    rounded, id tie-break)."""
    query_id_col = query_id_col or id_col
    spark.catalog.refreshByPath(f"{path}/cells")
    centers = spark.read.parquet(f"{path}/centroids")
    q = queries.select(
        F.col(query_id_col).alias("q_id"), _as_double(vec_col).alias("q_vec")
    )
    probe_w = W.partitionBy("q_id").orderBy(
        F.col("centroid_sim").desc(), F.col("cluster")
    )
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
    # driver-side cell list (n_probe × |queries| ints) -> an isin filter
    # on the PARTITION column, so the scan prunes unprobed directories
    probed_cells = sorted(
        {r.cluster for r in probes.select("cluster").distinct().collect()}
    )
    cells = spark.read.parquet(f"{path}/cells").filter(
        F.col("cluster").isin(probed_cells)
    )
    cands = cells.join(F.broadcast(probes), on="cluster").filter(
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
