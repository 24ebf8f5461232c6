"""Embedding similarity: cosine top-k (exact/IVF/LSH), near-dup,
SemDeDup, projections, quantization, multimodal.

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

from pyarrow_ops_spark.entry_queries._registry import folded_query, query
from pyarrow_ops_spark.entry_queries._shared import _cached_index




# ---------------------------------------------------------------------------
# North star: embedding similarity search
# ---------------------------------------------------------------------------


@folded_query(
    "similarity_join_threshold",
    """
    WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(a.v, b.v), 4) AS sim
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE round(list_cosine_similarity(a.v, b.v), 4) >= 0.45
    """,
)
def q_similarity_join_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine self-join above a threshold (JVM-side zip_with/
    aggregate fold over double arrays — no UDF)."""
    from pyarrow_ops_spark.functions.similarity import similarity_join

    emb = load_table(spark, "embeddings", sf_dir)
    return similarity_join(emb, threshold=0.45)



@query(
    "similarity_topk_bruteforce",
    """
    WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings)
    SELECT q_id, vec_id, sim FROM (
        SELECT q.vec_id AS q_id, c.vec_id AS vec_id,
               round(list_cosine_similarity(q.v, c.v), 4) AS sim,
               row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY round(list_cosine_similarity(q.v, c.v), 4) DESC, c.vec_id) AS rn
        FROM e q JOIN e c ON q.vec_id != c.vec_id
        WHERE q.vec_id < 5) t
    WHERE rn <= 5
    """,
)
def q_similarity_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 by cosine for query vectors vec_id<5 — broadcast the
    query set, rank on the rounded similarity (deterministic across
    engines)."""
    from pyarrow_ops_spark.functions.similarity import cosine_topk

    emb = load_table(spark, "embeddings", sf_dir)
    queries = emb.filter(F.col("vec_id") < 5)
    return cosine_topk(emb, queries, k=5)



_KNN_PROBE_ORACLE = """
    WITH e0 AS (SELECT vec_id, label,
                       list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                FROM embeddings),
    -- zero-norm vectors excluded on BOTH engines: cosine is undefined for
    -- them and engines disagree on where NaN similarities rank
    e AS (SELECT * FROM e0 WHERE list_dot_product(v, v) > 0),
    sims AS (
        SELECT q.vec_id AS q_id, q.label AS label,
               n.vec_id AS n_id, n.label AS n_label,
               round(list_cosine_similarity(q.v, n.v), 4) AS sim
        FROM e q JOIN e n ON q.vec_id != n.vec_id
    ),
    top AS (
        SELECT * FROM (
            SELECT *, row_number() OVER (
                PARTITION BY q_id ORDER BY sim DESC, n_id) AS rn
            FROM sims) t
        WHERE rn <= 5
    ),
    votes AS (
        SELECT q_id, label, n_label, count(*) AS n_votes
        FROM top GROUP BY q_id, label, n_label
    )
    SELECT q_id AS vec_id, label, n_label AS predicted,
           n_label = label AS correct
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY q_id ORDER BY n_votes DESC, n_label) AS r
        FROM votes) v
    WHERE r = 1
    """


# FOLDED r14 (2 driver certs r10-r11): similarity_knn_probe_indexed
# certifies the SAME voting output against the SAME oracle (n_probe =
# n_clusters makes the shortlist exhaustive) while also exercising the
# corpus-scale IVF path — the exact block-GEMM probe stays pytest-oracled
# every run via ALL_ORACLES and plan-pinned in test_plan_hygiene.
@folded_query("similarity_knn_label_probe", _KNN_PROBE_ORACLE)
def q_similarity_knn_label_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out kNN label probe (k=5) — the standard embedding-quality
    eval: nearest neighbors by cosine vote on each vector's label, all
    ranking deterministic across engines (rounded sim desc + id asc;
    vote count desc + label asc)."""
    from pyarrow_ops_spark.functions.similarity import knn_label_probe

    emb = load_table(spark, "embeddings", sf_dir)
    return knn_label_probe(emb, k=5)


@query("similarity_knn_probe_indexed", _KNN_PROBE_ORACLE)
def q_similarity_knn_probe_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN-shortlist kNN label probe against the persisted IVF index in
    its EXACT configuration (n_probe = n_clusters): every vector's
    shortlist covers all cells, so the output must equal the exact
    leave-one-out probe — hash-certifying the whole corpus-scale shape
    (centroid probe fan-out, per-cell parquet-metadata block sizing,
    cell-local Arrow GEMM, shared voting) against the same DuckDB oracle
    as ``similarity_knn_label_probe``, independent of which centroids
    KMeans found. Production n_probe < n_clusters configs are pinned by
    the agreement-rate floor in tests/test_ann_recall.py (recall < 1 by
    design). Unlike the exact probe's block cartesian, work here is
    n × n_probe × cell_size — the probe a user CAN run on the full
    corpus."""
    from pyarrow_ops_spark.functions.similarity import (
        build_ivf_index,
        knn_label_probe_indexed,
    )

    emb = load_table(spark, "embeddings", sf_dir)
    idx = _cached_index(
        sf_dir,
        "ivf_index",
        "embeddings",
        lambda d: build_ivf_index(emb, d, n_clusters=8),
    )
    return knn_label_probe_indexed(spark, idx, emb, k=5, n_probe=8)



@query(
    "similarity_near_dup",
    """
    WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
    p AS (
        SELECT a.vec_id, b.vec_id AS nbr
        FROM e a JOIN e b ON round(list_cosine_similarity(a.v, b.v), 4) >= 0.8
    )
    SELECT vec_id, min(nbr) AS canonical_id,
           CAST(count(*) AS BIGINT) AS n_neighbors,
           min(nbr) != vec_id AS is_duplicate
    FROM p GROUP BY vec_id
    """,
)
def q_similarity_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup assignment: canonical id = min id among
    cosine>=0.8 neighbors (self included) — the training-data dedup rule."""
    from pyarrow_ops_spark.functions.similarity import embedding_near_dup

    emb = load_table(spark, "embeddings", sf_dir)
    return embedding_near_dup(emb, threshold=0.8)



# The synthetic embeddings are near-orthogonal (max pairwise cosine ~0.51),
# so a near-dup query on the raw table is vacuous. The near-dup queries
# plant deterministic perturbed copies (per-element jitter, cos ~0.9999 to
# the original) IN the query — identically in Spark and the DuckDB oracle —
# so genuine is_duplicate=true rows flow through the whole decision path.
_PLANT_SQL = """
        SELECT vec_id + 100000 AS vec_id,
               list_transform(embedding,
                   x -> CAST(x * (1 + 0.01 * sin(CAST(x AS DOUBLE) * 100)) AS FLOAT))
                   AS embedding
        FROM embeddings WHERE vec_id % 10 = 0
"""



def _with_planted_dups(spark: SparkSession, sf_dir: str, offsets=(100_000,)) -> DataFrame:
    emb = load_table(spark, "embeddings", sf_dir).select("vec_id", "embedding")
    out = emb
    for off in offsets:
        pert = emb.filter(F.col("vec_id") % 10 == 0).select(
            (F.col("vec_id") + off).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x: (
                    x * (1 + 0.01 * F.sin(x.cast("double") * 100))
                ).cast("float"),
            ).alias("embedding"),
        )
        out = out.unionByName(pert)
    return out



@query(
    "embedding_near_dup_lsh",
    f"""
    WITH u AS (
        SELECT vec_id, embedding FROM embeddings
        UNION ALL {_PLANT_SQL}
    ),
    e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM u),
    p AS (
        SELECT a.vec_id, b.vec_id AS nbr
        FROM e a JOIN e b ON round(list_cosine_similarity(a.v, b.v), 4) >= 0.9
    )
    SELECT vec_id, min(nbr) AS canonical_id,
           CAST(count(*) AS BIGINT) AS n_neighbors,
           min(nbr) != vec_id AS is_duplicate
    FROM p GROUP BY vec_id
    """,
)
def q_embedding_near_dup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCALE path for embedding near-dup: banded hyperplane-LSH
    candidate pairs + exact cosine verification (the candidate join prunes
    ~94% of the quadratic pair space on this near-orthogonal corpus),
    checked against the quadratic oracle. Planted copies sit at cos ~0.9999
    where the per-pair LSH miss probability is ~1e-12 (56 bits / 8 bands),
    so the decision output equals the exact baseline deterministically."""
    from pyarrow_ops_spark.functions.similarity import embedding_near_dup

    u = _with_planted_dups(spark, sf_dir)
    return embedding_near_dup(u, threshold=0.9, method="lsh", dim=64)



@query(
    "embedding_clusters_lsh",
    f"""
    WITH RECURSIVE u AS (
        SELECT vec_id, embedding FROM embeddings
        UNION ALL {_PLANT_SQL}
        UNION ALL {_PLANT_SQL.replace("+ 100000", "+ 200000")}
    ),
    e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM u),
    p AS (
        SELECT a.vec_id AS src, b.vec_id AS dst
        FROM e a JOIN e b ON a.vec_id != b.vec_id
        WHERE round(list_cosine_similarity(a.v, b.v), 4) >= 0.9
    ),
    reach(node, r) AS (
        SELECT vec_id, vec_id FROM u
        UNION
        SELECT reach.node, p.dst FROM reach JOIN p ON reach.r = p.src
    )
    SELECT node AS vec_id, min(r) AS canonical_id, min(r) != node AS is_duplicate
    FROM reach GROUP BY node
    """,
)
def q_embedding_clusters_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-dedup DECISION: LSH pairs -> transitive connected
    components -> one representative per cluster (same min-label
    propagation as the text dedup path). Two planted copies per selected
    original form 3-node clusters, so transitivity is actually exercised;
    oracle = DuckDB recursive-CTE reachability over the exact cosine pair
    set."""
    from pyarrow_ops_spark.functions.similarity import embedding_dedup_clusters

    u = _with_planted_dups(spark, sf_dir, offsets=(100_000, 200_000))
    return embedding_dedup_clusters(u, threshold=0.9, dim=64, method="lsh")



def _recall_bound_row(
    emb: DataFrame, queries: DataFrame, approx: DataFrame, k: int, bound: float
) -> DataFrame:
    """Shared recall@k gate for the approx-ANN certification rows: join
    the approx result against the exact brute-force top-k (both computed
    in Spark — the exact twin queries certify the brute force itself
    against DuckDB), average per-query recall over ALL queries (a query
    with zero surviving candidates counts 0, not absent), and emit one
    row asserting the bound. Bound 0.3 = the cross-sf measured floor
    (avg 0.32-0.64 across sf0.001-sf0.1 for both ANN paths; 0.48-0.52
    at the sf0.01 certification point) minus a jitter margin; sabotaged
    configs measure 0.0-0.16, so a collapse (broken bucketing, probe
    pruning, candidate ranking) goes red with real headroom. A tighter
    per-sf pin (>= 0.4 at sf0.01) lives in tests/test_ann_recall.py,
    which also proves the gate flips under sabotage."""
    from pyarrow_ops_spark.functions.similarity import cosine_topk

    exact = cosine_topk(emb, queries, k=k).select("q_id", "vec_id")
    hits = (
        approx.select("q_id", "vec_id")
        .join(exact, ["q_id", "vec_id"])
        .groupBy("q_id")
        .agg(F.count(F.lit(1)).alias("__hits"))
    )
    per_q = (
        queries.select(F.col("vec_id").alias("q_id"))
        .join(hits, "q_id", "left")
        .select(
            (F.coalesce(F.col("__hits"), F.lit(0)) / F.lit(k)).alias("__r")
        )
    )
    return per_q.agg(
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        F.lit(k).cast("int").alias("k"),
        (F.avg("__r") >= F.lit(bound)).alias("avg_recall_ge_bound"),
    )



@folded_query(
    # Folded r11 (cap-capacity policy, ARCHITECTURE.md): certified r6+r7;
    # survivor similarity_topk_ivf_indexed runs the SAME IVF engine path
    # through the persisted index, and the recall floor is pinned in
    # tests/test_ann_recall.py. Still oracle-gated by pytest every run.
    "similarity_topk_ivf",
    """
    SELECT CAST(5 AS BIGINT) AS n_queries, CAST(5 AS INT) AS k,
           TRUE AS avg_recall_ge_bound
    """,
)
def q_similarity_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-5 (KMeans cells, n_probe=4 of 16) certified by
    a RECALL BOUND instead of exact rows: approx output joined against
    the Spark brute-force top-k (itself DuckDB-certified via
    similarity_topk_bruteforce / _ivf_exact), per-query recall averaged,
    one-row assertion avg >= 0.3. Production probe configs have recall
    < 1 by design, so exact-row hashing is impossible — but a recall
    collapse is exactly the regression this gate exists to catch."""
    from pyarrow_ops_spark.functions.similarity import ivf_topk

    emb = load_table(spark, "embeddings", sf_dir)
    queries = emb.filter(F.col("vec_id") < 5)
    approx = ivf_topk(emb, queries, k=5, n_clusters=16, n_probe=4)
    return _recall_bound_row(emb, queries, approx, k=5, bound=0.3)



@folded_query(
    # Folded r11 (cap-capacity policy): certified r6+r7; survivor
    # similarity_topk_lsh_exact certifies the same LSH engine exactly
    # (all-probe config), recall floor pinned in tests/test_ann_recall.py.
    "similarity_topk_lsh",
    """
    SELECT CAST(5 AS BIGINT) AS n_queries, CAST(5 AS INT) AS k,
           TRUE AS avg_recall_ge_bound
    """,
)
def q_similarity_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH approximate top-5 certified by the same
    recall-bound gate as similarity_topk_ivf (avg recall >= 0.3 vs the
    certified brute force; measured 0.32-0.64 across sfs). The seeded
    hyperplanes make the approx output deterministic; the bound-style
    oracle makes the row certifiable without pretending recall is 1."""
    from pyarrow_ops_spark.functions.similarity import lsh_topk

    emb = load_table(spark, "embeddings", sf_dir)
    queries = emb.filter(F.col("vec_id") < 5)
    approx = lsh_topk(emb, queries, dim=64, k=5, bits=16, bands=4)
    return _recall_bound_row(emb, queries, approx, k=5, bound=0.3)



@query(
    "similarity_topk_lsh_exact",
    """
    WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings)
    SELECT q_id, vec_id, sim FROM (
        SELECT q.vec_id AS q_id, c.vec_id AS vec_id,
               round(list_cosine_similarity(q.v, c.v), 4) AS sim,
               row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY round(list_cosine_similarity(q.v, c.v), 4) DESC, c.vec_id) AS rn
        FROM e q JOIN e c ON q.vec_id != c.vec_id
        WHERE q.vec_id < 5) t
    WHERE rn <= 5
    """,
)
def q_similarity_topk_lsh_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH top-k in its exact configuration (all_probe: a constant band
    shared by every row makes the candidate set provably cover the true
    top-k), so the result must EQUAL brute force — the LSH twin of
    similarity_topk_ivf_exact. Hash-certifies the banding/explode/
    candidate-join/verify/rank machinery against the same DuckDB oracle
    as the brute-force query, independent of the hyperplane draw; the
    production recall<1 config keeps its recall-bound row above."""
    from pyarrow_ops_spark.functions.similarity import lsh_topk

    emb = load_table(spark, "embeddings", sf_dir)
    queries = emb.filter(F.col("vec_id") < 5)
    return lsh_topk(emb, queries, dim=64, k=5, bits=16, bands=4, all_probe=True)



# ---------------------------------------------------------------------------
# North star: multimodal binary columns
# ---------------------------------------------------------------------------


@query(
    "multimodal_features",
    """
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_bytes,
           md5(text) AS digest,
           CAST(1 + ('0x' || substr(md5(text), 1, 2))::INTEGER AS INT) AS width,
           CAST(1 + ('0x' || substr(md5(text), 3, 2))::INTEGER AS INT) AS height,
           round(('0x' || substr(md5(text), 5, 2))::INTEGER / 255.0, 6) AS mean_luma
    FROM documents
    """,
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column plumbing: text bytes stand in for media payloads;
    mapInPandas feature extraction with the deterministic fake decode
    (real decode is stubbed — no media libs in this container)."""
    from pyarrow_ops_spark.functions.multimodal import extract_features

    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    return extract_features(docs, "payload", "doc_id", fake_decode=True)



@query(
    "multimodal_audio_features",
    """
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_bytes,
           md5(text) AS digest,
           CAST(8000 * (1 + ('0x' || substr(md5(text), 1, 2))::INTEGER % 6) AS INT)
               AS sample_rate,
           CAST(1 + ('0x' || substr(md5(text), 3, 2))::INTEGER % 2 AS INT)
               AS n_channels,
           CAST(length(text) AS BIGINT) AS n_samples,
           length(text)::DOUBLE /
               (8000 * (1 + ('0x' || substr(md5(text), 1, 2))::INTEGER % 6))
               AS duration_sec,
           round(('0x' || substr(md5(text), 5, 2))::INTEGER / 255.0, 6) AS rms
    FROM documents
    """,
)
def q_multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-column plumbing: the deterministic fake decode (every feature
    derived from md5(payload) + byte length) exercises the Arrow batch
    shape end-to-end; the REAL path of the same function decodes RIFF/WAVE
    via the stdlib wave module (pytest-exercised — no optional libs)."""
    from pyarrow_ops_spark.functions.multimodal import extract_audio_features

    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    return extract_audio_features(docs, "payload", "doc_id", fake_decode=True)



@query(
    "multimodal_sample_frames",
    """
    WITH v AS (
        SELECT doc_id, text, 1 + strlen(text) % 256 AS n_frames
        FROM documents
    )
    SELECT doc_id,
           CAST(f.idx AS INT) AS frame_idx,
           CAST(n_frames AS INT) AS n_frames,
           md5(text || ':' || CAST(f.idx AS VARCHAR)) AS frame_digest
    FROM v, LATERAL unnest(range(0, n_frames, 30)) AS f(idx)
    """,
)
def q_multimodal_sample_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame stride-sampling plumbing: one payload row expands to one row
    per sampled frame (stride 30) via mapInPandas. The deterministic fake
    decode (n_frames = 1 + n_bytes % 256, per-frame digest
    md5(payload||':'||idx)) makes the expansion arithmetic exactly
    oracle-checkable — the DuckDB oracle reproduces stride, bounds, and
    digests from the same text bytes."""
    from pyarrow_ops_spark.functions.multimodal import sample_frames

    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    return sample_frames(docs, "payload", "doc_id", every_n=30)



@query(
    "similarity_threshold_join_lsh",
    f"""
    WITH q AS ({_PLANT_SQL}),
    eq AS (SELECT vec_id AS q_id,
                  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM q),
    e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings)
    SELECT eq.q_id, e.vec_id,
           round(list_cosine_similarity(eq.v, e.v), 4) AS sim
    FROM eq JOIN e ON round(list_cosine_similarity(eq.v, e.v), 4) >= 0.9
    """,
)
def q_similarity_threshold_join_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided LSH threshold join (approxSimilarityJoin shape): planted
    perturbed copies as the query side against the full corpus, banded
    hyperplane candidates + exact cosine verify, checked against the
    quadratic DuckDB cross join. Each planted query matches exactly its
    source vector (cos ~0.9999, per-pair LSH miss ~1e-12); cross pairs on
    this near-orthogonal corpus stay far below the 0.9 threshold."""
    from pyarrow_ops_spark.functions.similarity import lsh_threshold_join

    emb = load_table(spark, "embeddings", sf_dir).select("vec_id", "embedding")
    q = emb.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 100_000).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x: (x * (1 + 0.01 * F.sin(x.cast("double") * 100))).cast("float"),
        ).alias("embedding"),
    )
    return lsh_threshold_join(q, emb, threshold=0.9, dim=64, query_id_col="vec_id")



@query(
    "embedding_quantize_int8",
    """
    WITH q AS (
        SELECT vec_id,
               list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))
                   / 127.0 AS scale,
               CASE WHEN list_max(list_transform(embedding,
                                                 x -> abs(CAST(x AS DOUBLE)))) = 0
                    THEN list_transform(embedding, x -> 0)
                    ELSE list_transform(embedding,
                        x -> CAST(floor(CAST(x AS DOUBLE) /
                             (list_max(list_transform(embedding,
                                                      y -> abs(CAST(y AS DOUBLE))))
                              / 127.0) + 0.5) AS INT))
               END AS codes
        FROM embeddings
    )
    SELECT vec_id, scale,
           CAST(generate_subscripts(codes, 1) - 1 AS INT) AS pos,
           unnest(codes) AS code
    FROM q
    """,
)
def q_embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 scalar quantization (scale = max|x|/127,
    code = floor(x/scale + 0.5)): the 4x memory/IO compression step before
    billion-vector ANN. Every step is an exact IEEE double op with no
    reassociation, so Spark and DuckDB produce BIT-IDENTICAL codes — the
    oracle is exact, not rounded.

    The driver row flattens the codes array via posexplode to
    (vec_id, scale, pos, code): the correctness harness canonicalizes
    rows with pandas hashing, which cannot hash list cells (the r3
    'unhashable type' err). Flat rows carry identical information; the
    library function ``quantize_embeddings`` keeps the array form (see
    label_centroids in functions/similarity.py for why flat beats nested
    at the comparison boundary)."""
    from pyarrow_ops_spark.functions.similarity import quantize_embeddings

    emb = load_table(spark, "embeddings", sf_dir)
    return quantize_embeddings(emb).select(
        "vec_id", "scale", F.posexplode("codes").alias("pos", "code")
    )



# ---------------------------------------------------------------------------
# Embedding centroids (functions/similarity.py label_centroids)
# ---------------------------------------------------------------------------


@query(
    "embedding_centroids",
    """
    WITH e AS (
        SELECT label,
               unnest(embedding) AS v,
               unnest(range(0, len(embedding))) AS pos
        FROM embeddings
    )
    SELECT label, CAST(pos AS INT) AS pos, round(avg(v), 4) + 0.0 AS avg_v
    FROM e GROUP BY 1, 2
    """,
)
def q_embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroids as a flat (label, pos, avg) relation — the IVF
    training step / mean-embedding-per-class reduction. posexplode fans out
    rows x dim but map-side combine collapses them before the exchange:
    the shuffle carries n_labels x dim partial sums per task, ~constant."""
    from pyarrow_ops_spark.functions.similarity import label_centroids

    emb = load_table(spark, "embeddings", sf_dir)
    return label_centroids(emb, "label", "embedding")



@folded_query(
    "similarity_topk_ivf_exact",
    """
    WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings)
    SELECT q_id, vec_id, sim FROM (
        SELECT q.vec_id AS q_id, c.vec_id AS vec_id,
               round(list_cosine_similarity(q.v, c.v), 4) AS sim,
               row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY round(list_cosine_similarity(q.v, c.v), 4) DESC, c.vec_id) AS rn
        FROM e q JOIN e c ON q.vec_id != c.vec_id
        WHERE q.vec_id < 5) t
    WHERE rn <= 5
    """,
)
def q_similarity_topk_ivf_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-k in its exact configuration (n_probe = n_clusters): every
    cell is probed, so the result must EQUAL brute force — which makes the
    IVF machinery (KMeans train, cell assignment, probe selection,
    candidate ranking) hash-certifiable against the same DuckDB oracle as
    the brute-force query, independent of which centroids KMeans found.
    The production recall<1 configs stay rows-only with pytest recall
    bounds (recall depends on the learned cells by design)."""
    from pyarrow_ops_spark.functions.similarity import ivf_topk

    emb = load_table(spark, "embeddings", sf_dir)
    queries = emb.filter(F.col("vec_id") < 5)
    return ivf_topk(emb, queries, k=5, n_clusters=8, n_probe=8)



@query(
    "semantic_dedup_planted",
    """
    SELECT vec_id AS id_a,
           vec_id + 1000000 AS id_b,
           CAST(1.0 AS DOUBLE) AS sim
    FROM embeddings WHERE vec_id % 10 = 0
    """,
)
def q_semantic_dedup_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-certifiable SemDeDup invariant: plant an EXACT copy of every
    10th embedding at vec_id + 1e6 and run the full KMeans-partitioned
    pipeline (fit -> cell assignment -> cell-local pair generation ->
    exact-cosine verify at threshold 0.999). An identical vector maps to
    the identical nearest centroid deterministically (fixed seed), so each
    plant lands in its source's cell and the pipeline MUST emit
    (v, v+1e6, sim=1.0) for every planted vector; original ids are < 1e6,
    so pairs at exactly 1e6 offset are plant/source pairs and nothing
    else. A broken fit/assign/pair/verify stage loses planted pairs; a
    cosine bug shifts the 1.0. Recall on ORGANIC pairs (cell-straddling
    neighbors) is < 1 by design — pytest bounds it against the exact
    self-join instead."""
    from pyarrow_ops_spark.functions.similarity import semantic_dedup_pairs

    emb = load_table(spark, "embeddings", sf_dir).select("vec_id", "embedding")
    planted = emb.unionByName(
        emb.filter(F.col("vec_id") % 10 == 0).select(
            (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
        )
    )
    pairs = semantic_dedup_pairs(planted, threshold=0.999)  # n_clusters auto: sqrt(N) cells
    return pairs.filter(F.col("id_b") - F.col("id_a") == 1_000_000).select(
        "id_a", "id_b", F.col("sim").cast("double").alias("sim")
    )



def _projection_oracle_sql(in_dim: int = 64, out_dim: int = 8) -> str:
    """Build the DuckDB oracle for the JL projection by inlining the SAME
    deterministic matrix the Spark path derives — the projection is a pure
    function of (in_dim, out_dim), so the oracle replays it exactly."""
    from pyarrow_ops_spark.functions.similarity import random_projection_matrix

    planes = random_projection_matrix(in_dim, out_dim)
    selects = []
    for j, plane in enumerate(planes):
        lits = ", ".join(repr(c) for c in plane)
        selects.append(
            f"SELECT vec_id, CAST({j} AS INT) AS pos, "
            f"round(list_dot_product(list_transform(embedding, "
            f"x -> CAST(x AS DOUBLE)), [{lits}]), 4) AS val FROM embeddings"
        )
    return "\nUNION ALL\n".join(selects)



@query("embedding_random_projection", _projection_oracle_sql())
def q_embedding_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64->8 dim Johnson-Lindenstrauss reduction as pure Catalyst
    zip_with/aggregate dot products against a derived (not sampled)
    matrix — map-only, no UDF, no shuffle. Output flattened to
    (vec_id, pos, val) scalar rows for driver hashing (nested-array
    outputs are uncanonicalizable — same pattern as label_centroids);
    the oracle inlines the identical matrix literals."""
    from pyarrow_ops_spark.functions.similarity import project_embeddings

    emb = load_table(spark, "embeddings", sf_dir)
    proj = project_embeddings(emb, 64, 8)
    return proj.select(
        "vec_id", F.posexplode("projected").alias("pos", "val")
    ).select(
        "vec_id",
        F.col("pos").cast("int").alias("pos"),
        F.round("val", 4).alias("val"),
    )



@query(
    "similarity_topk_ivf_indexed",
    """
    WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings)
    SELECT q_id, vec_id, sim FROM (
        SELECT q.vec_id AS q_id, c.vec_id AS vec_id,
               round(list_cosine_similarity(q.v, c.v), 4) AS sim,
               row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY round(list_cosine_similarity(q.v, c.v), 4) DESC, c.vec_id) AS rn
        FROM e q JOIN e c ON q.vec_id != c.vec_id
        WHERE q.vec_id < 5) t
    WHERE rn <= 5
    """,
)
def q_similarity_topk_ivf_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PERSISTED IVF index in its exact configuration (n_probe =
    n_clusters, every cell-partition read): the result must equal brute
    force, so the whole on-disk lifecycle — KMeans train, cell-partitioned
    write, centroid persistence, partition-pruned probe, candidate
    ranking — hash-certifies against the brute-force oracle. Production
    n_probe < n_clusters configs stay rows-only (recall < 1 by design,
    pytest parity vs the in-memory path). Index build is a deterministic
    side effect under /tmp, content-keyed by the source parquet
    fingerprint and atomically promoted (see _cached_index)."""
    from pyarrow_ops_spark.functions.similarity import (
        build_ivf_index,
        ivf_topk_indexed,
    )

    emb = load_table(spark, "embeddings", sf_dir)
    idx = _cached_index(
        sf_dir,
        "ivf_index",
        "embeddings",
        lambda d: build_ivf_index(emb, d, n_clusters=8),
    )
    queries = emb.filter(F.col("vec_id") < 5)
    return ivf_topk_indexed(spark, idx, queries, k=5, n_probe=8)



@query(
    "multimodal_dedup_binary",
    """
    WITH d AS (SELECT doc_id, md5(text) AS digest FROM documents),
    g AS (
        SELECT digest, CAST(min(doc_id) AS BIGINT) AS canonical_id,
               CAST(count(*) AS BIGINT) AS n_copies
        FROM d GROUP BY digest
    )
    SELECT d.doc_id, d.digest, g.canonical_id, g.n_copies,
           d.doc_id != g.canonical_id AS is_duplicate
    FROM d JOIN g USING (digest)
    """,
)
def q_multimodal_dedup_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-exact dedup of BINARY media payloads through the multimodal
    feature-extraction path: payloads (here the utf-8 bytes of each
    document, standing in for image/audio blobs) flow through the
    Arrow-batched ``extract_features`` mapInPandas (Python md5 per
    payload), then a digest-only groupBy assigns canonicals. The DuckDB
    oracle computes md5 over the same utf-8 bytes JVM-free, so the hash
    certifies the binary column plumbing, the Arrow batch boundary, AND
    the digest arithmetic — the dedup decision a crawl pipeline applies
    to raw media before any decode. Payloads never shuffle (digest-only
    exchange); see functions/multimodal.py for the batch shape."""
    from pyarrow_ops_spark.functions.multimodal import extract_features

    docs = load_table(spark, "documents", sf_dir)
    media = docs.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    feats = extract_features(media, "payload", "doc_id").select(
        "doc_id", "digest"
    )
    groups = feats.groupBy("digest").agg(
        F.min("doc_id").alias("canonical_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )
    return feats.join(groups, on="digest").select(
        "doc_id",
        "digest",
        "canonical_id",
        "n_copies",
        (F.col("doc_id") != F.col("canonical_id")).alias("is_duplicate"),
    )
