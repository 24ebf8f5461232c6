"""Document dedup: exact/normalized, MinHash-LSH, SimHash, spans,
decontamination, source mixing.

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




# ---------------------------------------------------------------------------
# North star: deduplication over documents
# ---------------------------------------------------------------------------

_JACCARD_ORACLE = r"""
    WITH sh AS (
        SELECT doc_id,
               list_distinct([substr(text, i, 5) for i in range(1, length(text) - 3)]) AS grams
        FROM documents
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(len(list_intersect(a.grams, b.grams))::DOUBLE /
                 (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams))), 4) AS jaccard
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE round(len(list_intersect(a.grams, b.grams))::DOUBLE /
                (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams))), 4) >= 0.8
    """



@query(
    "dedup_exact_docs",
    """
    SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
           min(doc_id) AS canonical_id,
           CAST(count(*) AS BIGINT) AS n_copies
    FROM documents GROUP BY 1
    """,
)
def q_dedup_exact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on the normalized fingerprint — the
    shuffle carries 16-byte digests, never the documents."""
    from pyarrow_ops_spark.functions.dedup import exact_duplicates

    docs = load_table(spark, "documents", sf_dir)
    return exact_duplicates(docs)



@folded_query("dedup_jaccard_brute", _JACCARD_ORACLE)
def q_dedup_jaccard_brute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force 5-gram Jaccard pairs >= 0.8 (O(n²) baseline — the
    oracle semantics for the LSH path below)."""
    from pyarrow_ops_spark.functions.dedup import jaccard_pairs

    docs = load_table(spark, "documents", sf_dir)
    return jaccard_pairs(docs, threshold=0.8, n=5)



# FOLDED r14 (7 driver certs r1-r11): the surviving dedup_clusters_lsh
# row builds its star edges from THIS row's banded-LSH candidate +
# exact-verify pairs engine (near_dup_pairs), so the engine path stays
# driver-rotated; the pairs output itself stays pytest-oracled every run
# via ALL_ORACLES and in bench/sweeps via ALL_QUERIES.
@folded_query("dedup_minhash_lsh", _JACCARD_ORACLE)
def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs, exact-verified — same oracle as the
    brute-force: with 80 hashes / 16 bands (r=5) the per-pair miss
    probability at j>=0.9 is ~8e-7, so LSH output == brute force on this
    corpus, while the banded candidate join is linear in corpus size (the
    100 TB path). 5-gram shingles keep the word-soup baseline similarity
    (<=0.35) far from the banding threshold."""
    from pyarrow_ops_spark.functions.dedup import minhash_lsh_pairs

    docs = load_table(spark, "documents", sf_dir)
    # assume_dups=True: the curation corpus is known to carry exact
    # copies, so skip the dup pre-check scan (result-identical by the
    # _collapse_exact_texts contract; saves one full corpus pass).
    return minhash_lsh_pairs(docs, threshold=0.8, n=5, assume_dups=True)



@query(
    "dedup_clusters_lsh",
    r"""
    WITH RECURSIVE sh AS (
        SELECT doc_id,
               list_distinct([substr(text, i, 5) for i in range(1, length(text) - 3)]) AS grams
        FROM documents
    ),
    p AS (
        SELECT a.doc_id AS src, b.doc_id AS dst
        FROM sh a JOIN sh b ON a.doc_id != b.doc_id
        WHERE round(len(list_intersect(a.grams, b.grams))::DOUBLE /
              (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams))), 4) >= 0.8
    ),
    reach(node, r) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT reach.node, p.dst FROM reach JOIN p ON reach.r = p.src
    )
    SELECT node AS doc_id, min(r) AS canonical_id, min(r) != node AS is_duplicate
    FROM reach GROUP BY node
    """,
)
def q_dedup_clusters_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full dedup DECISION: LSH pairs -> transitive connected
    components (iterative min-label propagation) -> one representative per
    cluster. Oracle = DuckDB recursive-CTE reachability over the exact
    Jaccard pair set — similarity is not transitive, so this is strictly
    stronger than the pair queries above."""
    from pyarrow_ops_spark.functions.dedup import dedup_clusters

    docs = load_table(spark, "documents", sf_dir)
    # assume_dups=True: skip the dup pre-check scan (see q_dedup_minhash_lsh)
    return dedup_clusters(docs, threshold=0.8, assume_dups=True)



@query(
    "dedup_simhash",
    """
    SELECT CAST(4 AS INT) AS bands, CAST(3 AS INT) AS max_hamming,
           TRUE AS equals_bruteforce
    """,
)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash banded candidates, certified by the PIGEONHOLE THEOREM:
    with 4 bands of 16 bits, any signature pair within Hamming distance 3
    differs in at most 3 bands, so at least one band matches and the pair
    MUST surface as a candidate — banding at max_hamming=3 has recall
    exactly 1, deterministically, at every scale. The banded pipeline's
    emitted pair set is therefore provably EQUAL to the brute-force
    all-pairs Hamming filter over the same signatures; this query runs
    both and hash-certifies the equality (a broken band split, bucket
    join, or verify filter flips the boolean). The all-pairs side is the
    sf-small certification harness only — production runs just the banded
    path (bucket-local, linear shuffles). The bit-vote signature itself
    is not SQL-expressible, so the oracle is the invariant, not the
    bits; see dedup_simhash_planted for the planted-copy certification
    of the signature function."""
    from pyspark import StorageLevel

    from pyarrow_ops_spark.functions.dedup import simhash, simhash_pairs

    docs = load_table(spark, "documents", sf_dir)
    # one signature pass, shared by both brute-force sides AND the banded
    # pipeline (passed through simhash_pairs) — without the persist the
    # corpus-wide text scan + pandas-UDF vote would run three times
    sigs = simhash(docs).persist(StorageLevel.MEMORY_AND_DISK)
    # the all-pairs side is O(N^2): hard-stop rather than quadratically
    # blow up if someone points this certification row at a big corpus
    n_docs = sigs.count()
    if n_docs > 100_000:
        raise ValueError(
            f"dedup_simhash certification runs an all-pairs brute force; "
            f"corpus has {n_docs} docs (max 100000). Run simhash_pairs "
            f"directly for production-scale banding."
        )
    a, b = sigs.alias("a"), sigs.alias("b")
    brute = (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .filter(
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))) <= 3
        )
        .select(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
    )
    emitted = simhash_pairs(docs, max_hamming=3, signatures=sigs).select(
        F.least("id_a", "id_b").alias("id_a"),
        F.greatest("id_a", "id_b").alias("id_b"),
    )
    sym_diff = brute.exceptAll(emitted).union(emitted.exceptAll(brute))
    # materialize the single-row verdict EAGERLY so the corpus-wide
    # signature cache can be released here instead of staying pinned in
    # executor storage for the rest of the session (round-8 advice fix);
    # the returned frame is a 1-row literal rebuild of the same schema
    n_diff = sym_diff.count()
    sigs.unpersist()
    return spark.range(1).select(
        F.lit(4).cast("int").alias("bands"),
        F.lit(3).cast("int").alias("max_hamming"),
        F.lit(n_diff == 0).alias("equals_bruteforce"),
    )



@folded_query(
    "dedup_simhash_planted",
    """
    SELECT doc_id AS id_a,
           doc_id + 1000000 AS id_b,
           CAST(0 AS INT) AS hamming
    FROM documents WHERE doc_id % 10 = 0
    """,
)
def q_dedup_simhash_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-certifiable SimHash invariant: plant an EXACT copy of every
    10th document at doc_id + 1e6 and run the full banded SimHash pipeline
    (xxhash64 shingles -> bit-vote signature -> 4x16-bit chunk buckets ->
    bucket-local pairs -> exact Hamming verify). Identical text gives an
    identical signature deterministically — no probabilistic miss — so the
    pipeline MUST emit (d, d+1e6, hamming=0) for every planted doc, and
    those are the only pairs whose ids differ by exactly 1e6 (original ids
    are < 1e6, so an id >= 1e6 is a plant; a plant pairs at offset-1e6
    only with its own source). The DuckDB oracle is the planted-pair
    construction itself — xxhash64 never needs a DuckDB twin. The filter
    keeps the certification sharp: a broken vote/banding/verify stage
    loses planted pairs (missing rows), a Hamming bug shifts the 0."""
    from pyarrow_ops_spark.functions.dedup import simhash_pairs

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    planted = docs.unionByName(
        docs.filter(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
        )
    )
    pairs = simhash_pairs(planted, max_hamming=3)
    return pairs.filter(F.col("id_b") - F.col("id_a") == 1_000_000).select(
        "id_a", "id_b", F.col("hamming").cast("int").alias("hamming")
    )



@query(
    "dedup_winnow_pairs",
    r"""
    WITH h AS (
        SELECT doc_id,
               CASE WHEN length(text) >= 16 THEN
                   [list_reduce(list_transform(range(0, 16),
                                               j -> CAST(ascii(substr(text, i + j, 1)) AS BIGINT)),
                                (a, b) -> (a * 31 + b) % 1000000007)
                    for i in range(1, length(text) - 15 + 1)]
               ELSE
                   -- texts shorter than k hash as ONE length-n polynomial
                   -- (no zero-padding), exactly like the engine; ''
                   -- degenerates to [0] via ascii('') = 0
                   [list_reduce(list_transform(range(0, greatest(length(text), 1)),
                                               j -> CAST(ascii(substr(text, 1 + j, 1)) AS BIGINT)),
                                (a, b) -> (a * 31 + b) % 1000000007)]
               END AS hashes
        FROM documents
    ),
    fps AS (
        SELECT doc_id,
               list_distinct(
                   [list_min(hashes[i : i + 15])
                    for i in range(1, greatest(len(hashes) - 15, 1) + 1)]) AS fps
        FROM h
    ),
    pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               len(list_intersect(a.fps, b.fps)) AS inter,
               len(a.fps) AS na, len(b.fps) AS nb
        FROM fps a JOIN fps b ON a.doc_id < b.doc_id
    )
    SELECT id_a, id_b,
           ROUND(CAST(inter AS DOUBLE) / (na + nb - inter), 4) AS winnow_jaccard
    FROM pairs
    WHERE ROUND(CAST(inter AS DOUBLE) / (na + nb - inter), 4) >= 0.5
    """,
)
def q_dedup_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-fingerprint near-dup pairs via prefix filtering (PPJoin
    family): frequency-ordered prefixes index only each document's rarest
    grams, bucket-local candidate pairs, exact fingerprint-Jaccard verify.
    Candidates are an EXACT superset of qualifying pairs (prefix lemma), so
    the quadratic DuckDB oracle matches deterministically. k=16 grams: on
    boilerplate-heavy corpora the 8-gram space is too small (2.9k distinct
    fps for 5k docs -> 30M+ naive candidates); 16-grams give 79k distinct
    fps and prefix filtering cuts candidates to ~14k at sf0.1."""
    from pyarrow_ops_spark.functions.dedup import winnow_pairs

    docs = load_table(spark, "documents", sf_dir)
    # assume_dups=True: skip the dup pre-check scan (see q_dedup_minhash_lsh)
    return winnow_pairs(docs, threshold=0.5, k=16, window=16, assume_dups=True)



@query(
    "dedup_winnow_clusters",
    r"""
    WITH RECURSIVE h AS (
        SELECT doc_id,
               CASE WHEN length(text) >= 16 THEN
                   [list_reduce(list_transform(range(0, 16),
                                               j -> CAST(ascii(substr(text, i + j, 1)) AS BIGINT)),
                                (a, b) -> (a * 31 + b) % 1000000007)
                    for i in range(1, length(text) - 15 + 1)]
               ELSE
                   -- texts shorter than k hash as ONE length-n polynomial
                   -- (no zero-padding), exactly like the engine; ''
                   -- degenerates to [0] via ascii('') = 0
                   [list_reduce(list_transform(range(0, greatest(length(text), 1)),
                                               j -> CAST(ascii(substr(text, 1 + j, 1)) AS BIGINT)),
                                (a, b) -> (a * 31 + b) % 1000000007)]
               END AS hashes
        FROM documents
    ),
    fps AS (
        SELECT doc_id,
               list_distinct(
                   [list_min(hashes[i : i + 15])
                    for i in range(1, greatest(len(hashes) - 15, 1) + 1)]) AS fps
        FROM h
    ),
    p AS (
        SELECT a.doc_id AS src, b.doc_id AS dst
        FROM fps a JOIN fps b ON a.doc_id != b.doc_id
        WHERE ROUND(CAST(len(list_intersect(a.fps, b.fps)) AS DOUBLE) /
                    (len(a.fps) + len(b.fps) - len(list_intersect(a.fps, b.fps))), 4) >= 0.5
    ),
    reach(node, r) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT reach.node, p.dst FROM reach JOIN p ON reach.r = p.src
    )
    SELECT node AS doc_id, min(r) AS canonical_id, min(r) != node AS is_duplicate
    FROM reach GROUP BY node
    """,
)
def q_dedup_winnow_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The substring-overlap dedup DECISION: exact winnowing prefix-filter
    edges (star over byte-identical clone groups — LINEAR in clone mass
    where dedup_winnow_pairs's inventory is output-quadratic) -> transitive
    connected components -> one representative per cluster. Oracle = DuckDB
    recursive-CTE reachability over the exact winnow-Jaccard pair set, the
    same pattern as dedup_clusters_lsh but with a deterministic (not
    probabilistic) candidate engine."""
    from pyarrow_ops_spark.functions.dedup import winnow_clusters

    docs = load_table(spark, "documents", sf_dir)
    return winnow_clusters(docs, threshold=0.5, k=16, window=16)



@query(
    "dedup_split_leakage",
    r"""
    WITH h AS (
        SELECT doc_id,
               CASE WHEN length(text) >= 16 THEN
                   [list_reduce(list_transform(range(0, 16),
                                               j -> CAST(ascii(substr(text, i + j, 1)) AS BIGINT)),
                                (a, b) -> (a * 31 + b) % 1000000007)
                    for i in range(1, length(text) - 15 + 1)]
               ELSE
                   [list_reduce(list_transform(range(0, greatest(length(text), 1)),
                                               j -> CAST(ascii(substr(text, 1 + j, 1)) AS BIGINT)),
                                (a, b) -> (a * 31 + b) % 1000000007)]
               END AS hashes
        FROM documents
    ),
    fps AS (
        SELECT doc_id,
               list_distinct(
                   [list_min(hashes[i : i + 15])
                    for i in range(1, greatest(len(hashes) - 15, 1) + 1)]) AS fps
        FROM h
    ),
    p AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM fps a JOIN fps b ON a.doc_id < b.doc_id
        WHERE ROUND(CAST(len(list_intersect(a.fps, b.fps)) AS DOUBLE) /
                    (len(a.fps) + len(b.fps) - len(list_intersect(a.fps, b.fps))), 4) >= 0.5
    ),
    s AS (
        SELECT doc_id,
               substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '1999' AS is_test
        FROM documents
    ),
    cp AS (
        SELECT p.id_a, p.id_b, sa.is_test AS t_a, sb.is_test AS t_b
        FROM p
        JOIN s sa ON p.id_a = sa.doc_id
        JOIN s sb ON p.id_b = sb.doc_id
        WHERE sa.is_test != sb.is_test
    )
    SELECT
        (SELECT CAST(count(*) AS BIGINT) FROM s WHERE NOT is_test) AS n_train,
        (SELECT CAST(count(*) AS BIGINT) FROM s WHERE is_test) AS n_test,
        CAST(count(*) AS BIGINT) AS leaky_pairs,
        CAST(count(DISTINCT CASE WHEN t_a THEN id_a ELSE id_b END) AS BIGINT)
            AS contaminated_test_docs
    FROM cp
    """,
)
def q_dedup_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-split contamination: deterministic 10% hash split, then count
    exact winnow-Jaccard near-dup pairs crossing the train/test boundary
    and the distinct test documents contaminated — the near-dup leakage
    check exact-fingerprint decontamination misses. One row out."""
    from pyarrow_ops_spark.functions.dedup import split_leakage_report

    docs = load_table(spark, "documents", sf_dir)
    # assume_dups=True: skip the dup pre-check scan (see q_dedup_minhash_lsh)
    return split_leakage_report(
        docs, test_frac=0.1, threshold=0.5, k=16, window=16, assume_dups=True
    )



@query(
    "dedup_cdc_chunks",
    r"""
    WITH RECURSIVE h AS (
      SELECT doc_id, text, length(text) AS n,
        CASE WHEN length(text) >= 8 THEN
          [i + 7 for i in range(1, length(text) - 7 + 1) if
             list_reduce(list_transform(range(0, 8),
                                        j -> CAST(ascii(substr(text, i + j, 1)) AS BIGINT)),
                         (a, b) -> (a * 31 + b) % 1000000007) % 64 = 0]
        ELSE CAST([] AS BIGINT[]) END AS cands
      FROM documents
    ),
    -- sequential bounded-cut selection (min_len=24, max_len=128): from
    -- chunk start s, cut at the smallest hash boundary e with
    -- 24 <= e-s <= 128, else force-cut at least(n, s+128); tail may be
    -- shorter than min_len. Mirrors cdc_chunk_rows' _cut_ends exactly.
    st AS (
      SELECT doc_id, text, n, cands,
             CAST(0 AS BIGINT) AS start,
             coalesce(
               list_min(list_filter(cands, e -> e - 0 >= 24 AND e - 0 <= 128)),
               least(n, 0 + 128)) AS cut
      FROM h
      UNION ALL
      SELECT doc_id, text, n, cands, cut AS start,
             coalesce(
               list_min(list_filter(cands, e -> e - cut >= 24 AND e - cut <= 128)),
               least(n, cut + 128)) AS cut
      FROM st WHERE cut < n
    ),
    chunks AS (
      SELECT doc_id,
             md5(substr(text, CAST(start + 1 AS INT),
                        CAST(cut - start AS INT))) AS chunk_digest
      FROM st
    ),
    freq AS (
      SELECT chunk_digest, count(DISTINCT doc_id) AS nd
      FROM chunks GROUP BY chunk_digest
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared
    FROM chunks JOIN freq USING (chunk_digest)
    GROUP BY doc_id
    """,
)
def q_dedup_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking dedup: Rabin-Karp CDC boundaries
    (functions/text.py cdc_chunk_rows — Arrow-batched sliding-window dot,
    boundaries re-synchronize across byte insertions) with the production
    min/max clamps (min_len=24, max_len=128 — r10 verdict ask #5: bounds
    the chunk-row blowup on pathological boundary densities), chunk
    digests, cross-document shared-chunk accounting. The storage/corpus
    dedup primitive: per document, how many of its content-defined chunks
    also appear in another document. One digest-only shuffle for the
    frequency relation, one for the per-doc aggregate — text never
    shuffles. The oracle replays the bounded cut selection with a
    recursive CTE over the same boundary candidates."""
    from pyarrow_ops_spark.functions.text import cdc_chunk_rows

    docs = load_table(spark, "documents", sf_dir)
    chunks = cdc_chunk_rows(docs, "doc_id", "text", min_len=24, max_len=128)
    freq = chunks.groupBy("chunk_digest").agg(
        F.count_distinct("doc_id").alias("nd")
    )
    return (
        chunks.join(freq, on="chunk_digest")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
            F.sum((F.col("nd") > 1).cast("long")).cast("bigint").alias("n_shared"),
        )
    )



# ---------------------------------------------------------------------------
# Decontamination + PII scrubbing (functions/dedup.py, functions/text.py)
# ---------------------------------------------------------------------------


@query(
    "dedup_decontaminate_near",
    r"""
    WITH h AS (
        SELECT doc_id,
               CASE WHEN length(text) >= 16 THEN
                   [list_reduce(list_transform(range(0, 16),
                                               j -> CAST(ascii(substr(text, i + j, 1)) AS BIGINT)),
                                (a, b) -> (a * 31 + b) % 1000000007)
                    for i in range(1, length(text) - 15 + 1)]
               ELSE
                   [list_reduce(list_transform(range(0, greatest(length(text), 1)),
                                               j -> CAST(ascii(substr(text, 1 + j, 1)) AS BIGINT)),
                                (a, b) -> (a * 31 + b) % 1000000007)]
               END AS hashes
        FROM documents
    ),
    fps AS (
        SELECT doc_id,
               list_distinct(
                   [list_min(hashes[i : i + 15])
                    for i in range(1, greatest(len(hashes) - 15, 1) + 1)]) AS fps
        FROM h
    ),
    test AS (
        SELECT doc_id FROM documents
        WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '0ccc'
    ),
    dirty AS (
        SELECT DISTINCT a.doc_id
        FROM fps a JOIN fps b ON b.doc_id IN (SELECT doc_id FROM test)
        WHERE ROUND(CAST(len(list_intersect(a.fps, b.fps)) AS DOUBLE) /
                    (len(a.fps) + len(b.fps) - len(list_intersect(a.fps, b.fps))), 4) >= 0.5
    )
    SELECT doc_id, n_chars FROM documents
    WHERE doc_id NOT IN (SELECT doc_id FROM dirty)
    """,
)
def q_dedup_decontaminate_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAR-duplicate benchmark decontamination: drop every train document
    whose winnow-Jaccard similarity to any eval document (the same
    deterministic 5% hash sample as dedup_decontaminate) reaches 0.5 —
    including the eval members themselves (self-similarity 1.0) and their
    near-copies, which exact fingerprint decontamination misses."""
    from pyarrow_ops_spark.functions.dedup import decontaminate_near
    from pyarrow_ops_spark.operators.sample import sample_hash

    docs = load_table(spark, "documents", sf_dir)
    test = sample_hash(docs, 0.05, ["doc_id"])
    # assume_dups=True: skip the dup pre-check scan (see q_dedup_minhash_lsh)
    return decontaminate_near(
        docs, test, threshold=0.5, k=16, window=16, assume_dups=True
    ).select("doc_id", "n_chars")



@query(
    "dedup_decontaminate",
    r"""
    WITH test AS (
        SELECT DISTINCT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
        FROM documents
        WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '0ccc'
    )
    SELECT doc_id, n_chars FROM documents
    WHERE md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
          NOT IN (SELECT fp FROM test)
    """,
)
def q_dedup_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: drop every train document whose
    normalized-text fingerprint appears in the eval set (here a
    deterministic 5% hash sample, so the overlap is genuine and
    reproducible). Anti-join on 16-byte digests; the small distinct test
    side broadcasts, making train a single map-side pass."""
    from pyarrow_ops_spark.functions.dedup import decontaminate
    from pyarrow_ops_spark.operators.sample import sample_hash

    docs = load_table(spark, "documents", sf_dir)
    test = sample_hash(docs, 0.05, ["doc_id"])
    return decontaminate(docs, test).select("doc_id", "n_chars")



@query(
    "mix_sources_events",
    """
    WITH counts AS (
        SELECT event_type AS s, count(*) AS n
        FROM events
        WHERE event_type IN ('click', 'error', 'view')
        GROUP BY 1
    ),
    w AS (
        SELECT s, n,
               CASE s WHEN 'click' THEN 2 WHEN 'error' THEN 1 WHEN 'view' THEN 2 END AS w
        FROM counts
    ),
    kk AS (SELECT min(n // w) AS k FROM w),
    th AS (
        SELECT s,
               CASE WHEN (w * k * 65536) // n >= 65536 THEN 'g'
                    ELSE printf('%04x', (w * k * 65536) // n) END AS thr
        FROM w, kk
    )
    SELECT event_id, event_type, value
    FROM events e JOIN th ON e.event_type = th.s
    WHERE substring(md5(CAST(event_id AS VARCHAR)), 1, 4) < thr
    """,
)
def q_mix_sources_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture rebalancing: downsample strata to integer weights
    (2 click : 1 error : 2 view), dropping other strata. One #strata-row
    count agg to the driver, then a single map-only CASE+hash filter —
    integer-math thresholds so the oracle derives identical cutoffs."""
    from pyarrow_ops_spark.operators.sample import mix_sources

    ev = load_table(spark, "events", sf_dir)
    return mix_sources(
        ev, "event_type", {"click": 2, "error": 1, "view": 2}, ["event_id"]
    ).select("event_id", "event_type", "value")



@folded_query(
    "mix_sources_exact",
    """
    WITH counts AS (
        SELECT event_type AS s, count(*) AS n
        FROM events
        WHERE event_type IN ('click', 'error', 'view')
        GROUP BY 1
    ),
    w AS (
        SELECT s, n,
               CASE s WHEN 'click' THEN 2 WHEN 'error' THEN 1 WHEN 'view' THEN 2 END AS w
        FROM counts
    ),
    kk AS (SELECT min(n // w) AS k FROM w),
    r AS (
        SELECT event_id, event_type, value,
               row_number() OVER (
                   PARTITION BY event_type
                   ORDER BY md5(CAST(event_id AS VARCHAR)), event_id
               ) AS rk
        FROM events
        WHERE event_type IN ('click', 'error', 'view')
    )
    SELECT event_id, event_type, value
    FROM r, kk
    WHERE rk <= kk.k * CASE event_type WHEN 'click' THEN 2
                                       WHEN 'error' THEN 1
                                       WHEN 'view' THEN 2 END
    """,
)
def q_mix_sources_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-count domain mixture: rank rows per stratum by content hash
    and keep exactly w_s*K — deterministic, engine-reproducible (the DuckDB
    oracle derives the same K and the same hash ranking). Costs one
    shuffle+sort on the stratum column vs the map-only approximate mode;
    the right trade when strata are small (ADVICE r3: a 50-row stratum
    realized 8 of a 10-row target under hash variance)."""
    from pyarrow_ops_spark.operators.sample import mix_sources

    ev = load_table(spark, "events", sf_dir)
    return mix_sources(
        ev,
        "event_type",
        {"click": 2, "error": 1, "view": 2},
        ["event_id"],
        exact=True,
    ).select("event_id", "event_type", "value")



# ---------------------------------------------------------------------------
# Round-4 additions: n-gram eval decontamination, per-key exact sampling,
# token-budget mixtures, Gopher-style quality rule filter
# ---------------------------------------------------------------------------


@query(
    "dedup_ngram_overlap",
    r"""
    WITH norm AS (
        SELECT doc_id,
               list_filter(
                   regexp_split_to_array(
                       trim(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g')),
                       '\s+'),
                   t -> t <> '') AS w
        FROM documents
    ),
    grams AS (
        SELECT doc_id,
               unnest(list_distinct(
                   [array_to_string(w[i:i+2], ' ')
                    for i in range(1, greatest(len(w) - 2, 0) + 1)])) AS g
        FROM norm
    ),
    ev AS (SELECT DISTINCT g FROM grams WHERE doc_id % 37 = 0),
    tr AS (SELECT doc_id, g FROM grams WHERE doc_id % 37 <> 0)
    SELECT tr.doc_id, CAST(count(*) AS BIGINT) AS n_matched
    FROM tr JOIN ev USING (g)
    GROUP BY tr.doc_id
    """,
)
def q_dedup_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-3-style n-gram eval-overlap decontamination: per-train-document
    count of distinct word n-grams shared with an eval split (here every
    37th doc plays the benchmark; n=3 instead of the production default 5
    so the short synthetic docs exercise real overlap volume). The exact
    `decontaminate` op catches verbatim copies; this catches partial
    inclusions. Eval grams broadcast; train text never shuffles — only the
    per-doc match counts do."""
    from pyarrow_ops_spark.functions.dedup import ngram_overlap

    docs = load_table(spark, "documents", sf_dir)
    ev = docs.filter(F.col("doc_id") % 37 == 0)
    tr = docs.filter(F.col("doc_id") % 37 != 0)
    return ngram_overlap(tr, ev, id_col="doc_id", text_col="text", n=3)



@query(
    "dedup_duplicated_spans",
    r"""
    WITH norm AS (
        SELECT doc_id,
               list_filter(
                   regexp_split_to_array(
                       trim(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g')),
                       '\s+'),
                   t -> t <> '') AS w
        FROM documents
    ),
    grams AS (
        SELECT doc_id,
               unnest(range(1, greatest(len(w) - 4, 0) + 1)) AS pos,
               unnest([array_to_string(w[i:i+4], ' ')
                       for i in range(1, greatest(len(w) - 4, 0) + 1)]) AS g
        FROM norm
    ),
    dup AS (SELECT g FROM grams GROUP BY g HAVING count(DISTINCT doc_id) >= 2),
    hits AS (SELECT DISTINCT doc_id, pos FROM grams JOIN dup USING (g)),
    brk AS (
        SELECT doc_id, pos,
               CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 5
                    THEN 1 ELSE 0 END AS b
        FROM hits
    ),
    isl AS (
        SELECT doc_id, pos,
               sum(b) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS UNBOUNDED PRECEDING) AS gid
        FROM brk
    )
    SELECT doc_id,
           CAST(min(pos) AS BIGINT) AS span_start,
           CAST(max(pos) + 4 AS BIGINT) AS span_end,
           CAST(count(*) AS BIGINT) AS n_dup_grams
    FROM isl GROUP BY doc_id, gid
    """,
)
def q_dedup_duplicated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level exact dedup (Lee et al. duplicated-span detection):
    maximal token ranges whose word 5-grams occur in >= 2 distinct
    documents — boilerplate/quotes invisible to whole-document dedup. The
    Spark side shuffles (xxhash64, id, pos) triples, never gram text; the
    oracle rebuilds the same spans from the gram strings themselves, so a
    hash-match also certifies the hashed plan collision-free on this
    corpus."""
    from pyarrow_ops_spark.functions.dedup import duplicated_spans

    docs = load_table(spark, "documents", sf_dir)
    return duplicated_spans(docs, id_col="doc_id", text_col="text", n=5, min_df=2)



@query(
    "dedup_strip_spans",
    r"""
    WITH norm AS (
        SELECT doc_id,
               list_filter(
                   regexp_split_to_array(
                       trim(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g')),
                       '\s+'),
                   t -> t <> '') AS w
        FROM documents
    ),
    grams AS (
        SELECT doc_id,
               unnest(range(1, greatest(len(w) - 4, 0) + 1)) AS pos,
               unnest([array_to_string(w[i:i+4], ' ')
                       for i in range(1, greatest(len(w) - 4, 0) + 1)]) AS g
        FROM norm
    ),
    dup AS (SELECT g FROM grams GROUP BY g HAVING count(DISTINCT doc_id) >= 2),
    hits AS (SELECT DISTINCT doc_id, pos FROM grams JOIN dup USING (g)),
    brk AS (
        SELECT doc_id, pos,
               CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 5
                    THEN 1 ELSE 0 END AS b
        FROM hits
    ),
    isl AS (
        SELECT doc_id, pos,
               sum(b) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS UNBOUNDED PRECEDING) AS gid
        FROM brk
    ),
    spans AS (
        SELECT doc_id, min(pos) AS s, max(pos) + 4 AS e
        FROM isl GROUP BY doc_id, gid
    ),
    sp AS (SELECT doc_id, list({'s': s, 'e': e}) AS spans FROM spans GROUP BY doc_id),
    kept AS (
        SELECT n.doc_id, n.w,
               list_filter(
                   n.w,
                   (x, i) -> coalesce(
                       len(list_filter(sp.spans, q -> i >= q.s AND i <= q.e)), 0
                   ) = 0) AS kw
        FROM norm n LEFT JOIN sp USING (doc_id)
    )
    SELECT doc_id,
           CAST(len(w) AS BIGINT) AS n_tokens,
           CAST(len(kw) AS BIGINT) AS n_tokens_kept,
           coalesce(array_to_string(kw, ' '), '') AS clean_text
    FROM kept
    """,
)
def q_dedup_strip_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The *apply* half of substring-level dedup: cut every cross-document
    duplicated 5-gram span out of each document, keep the unique
    remainder. The oracle rebuilds the exact cleaned text token-by-token
    (DuckDB indexed-lambda filter), so the hash certifies the full string
    output, not just the counts."""
    from pyarrow_ops_spark.functions.dedup import strip_duplicated_spans

    docs = load_table(spark, "documents", sf_dir)
    return strip_duplicated_spans(docs, n=5, min_df=2).select(
        "doc_id", "n_tokens", "n_tokens_kept", "clean_text"
    )



@query(
    "dedup_decontaminate_bloom",
    r"""
    WITH test AS (
        SELECT DISTINCT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
        FROM documents
        WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '1999'
    )
    SELECT doc_id, lang, n_chars FROM documents
    WHERE md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
          NOT IN (SELECT fp FROM test)
    """,
)
def q_dedup_decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered decontamination: the eval split (a deterministic
    10% hash sample, so overlap is genuine) is compressed to a 512 KiB
    broadcast Bloom bitmap; train rows missing the filter are provably
    clean and never shuffle, and only Bloom candidates reach the exact
    digest anti-join — so the result is EXACT (identical to
    ``decontaminate``) and the oracle is the plain NOT IN. The scale case:
    an eval side too large to broadcast as a digest set."""
    from pyarrow_ops_spark.functions.dedup import decontaminate_bloom
    from pyarrow_ops_spark.operators.sample import sample_hash

    docs = load_table(spark, "documents", sf_dir)
    test = sample_hash(docs, 0.1, ["doc_id"])
    return decontaminate_bloom(docs, test, num_bits=1 << 22, num_hashes=7).select(
        "doc_id", "lang", "n_chars"
    )



@folded_query(
    "dedup_exact_normalized",
    r"""
    WITH norm AS (
        SELECT doc_id,
               md5(trim(regexp_replace(
                   regexp_replace(
                       regexp_replace(lower(text), '[0-9]', '0', 'g'),
                       '[^a-z0-9A-Z\s]', ' ', 'g'),
                   '\s+', ' ', 'g'))) AS fp
        FROM documents
    )
    SELECT fp, min(doc_id) AS canonical_id,
           CAST(count(*) AS BIGINT) AS n_copies
    FROM norm GROUP BY fp
    """,
)
def q_dedup_exact_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup under aggressive normalization: '12 cats!' and '34
    Cats' collapse (digits zeroed, case/punctuation erased) — the
    near-exact tier between byte-identical dedup and MinHash. Shuffles
    16-byte digests only, same plan shape as dedup_exact."""
    from pyarrow_ops_spark.functions.text import normalize_text

    docs = load_table(spark, "documents", sf_dir)
    return (
        docs.select(
            "doc_id",
            F.md5(normalize_text("text", zero_digits=True)).alias("fp"),
        )
        .groupBy("fp")
        .agg(
            F.min("doc_id").alias("canonical_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )



@query(
    "dedup_resolve_longest",
    r"""
    WITH RECURSIVE sh AS (
        SELECT doc_id,
               list_distinct([substr(text, i, 5) for i in range(1, length(text) - 3)]) AS grams
        FROM documents
    ),
    p AS (
        SELECT a.doc_id AS src, b.doc_id AS dst
        FROM sh a JOIN sh b ON a.doc_id != b.doc_id
        WHERE round(len(list_intersect(a.grams, b.grams))::DOUBLE /
              (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams))), 4) >= 0.8
    ),
    reach(node, r) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT reach.node, p.dst FROM reach JOIN p ON reach.r = p.src
    ),
    clusters AS (
        SELECT node AS doc_id, min(r) AS canonical_id FROM reach GROUP BY node
    ),
    ranked AS (
        SELECT c.canonical_id, d.doc_id,
               row_number() OVER (PARTITION BY c.canonical_id
                                  ORDER BY d.n_chars DESC, d.doc_id) AS rn
        FROM clusters c JOIN documents d ON c.doc_id = d.doc_id
    ),
    reps AS (SELECT canonical_id, doc_id AS rep_id FROM ranked WHERE rn = 1)
    SELECT c.doc_id, c.canonical_id, r.rep_id,
           c.doc_id != r.rep_id AS is_duplicate
    FROM clusters c JOIN reps r ON c.canonical_id = r.canonical_id
    """,
)
def q_dedup_resolve_longest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Policy-based cluster resolution: near-dup clusters (MinHash-LSH ->
    connected components, the certified dedup_clusters_lsh construction)
    keep their LONGEST member (ties -> smallest doc_id) instead of the
    min-id canonical — what curation pipelines actually do. The
    representative comes from a map-side-combinable max_by aggregate +
    key join, not a per-cluster sort window; the oracle replays clusters
    via the recursive-CTE reachability and the policy via a window."""
    from pyarrow_ops_spark.functions.dedup import (
        dedup_clusters,
        resolve_cluster_representatives,
    )

    docs = load_table(spark, "documents", sf_dir)
    clusters = dedup_clusters(docs, threshold=0.8, assume_dups=True)
    joined = clusters.join(docs.select("doc_id", "n_chars"), on="doc_id")
    out = resolve_cluster_representatives(
        joined, "canonical_id", "doc_id", F.col("n_chars")
    )
    return out.select("doc_id", "canonical_id", "rep_id", "is_duplicate")


@query(
    "dedup_leakage_free_split",
    r"""
    SELECT doc_id,
           CASE WHEN substring(md5(md5(regexp_replace(lower(trim(text)),
                                                      '\s+', ' ', 'g'))),
                          1, 4) < '4000'
                THEN 'test' ELSE 'train' END AS split
    FROM documents
    """,
)
def q_dedup_leakage_free_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-AWARE train/test split — the PREVENTION half of the leakage
    story whose measurement (dedup_split_leakage) and cleanup
    (dedup_decontaminate_*) halves are already certified: the side is
    decided by md5 of the document's duplicate-GROUP key (the
    normalized-text fingerprint — md5 of md5, matching the exact-dedup
    relation), never its id, so every copy of a document lands on the
    same side BY CONSTRUCTION and exact copies can never straddle the
    boundary. A plain id-hash split sprays copies across it — exactly
    the contamination the measurement row counts. Same bucket arithmetic
    as sample_hash (md5[:4] < floor(frac * 2^16) in hex, test_frac=0.25
    -> '4000'), mirrored verbatim by the oracle. Map-only: one scalar
    md5 chain per row, NO shuffle, NO group materialization — composes
    with scan pushdown and costs nothing at 100 TB (plan pinned map-only
    in tests/test_llm_ops.py::TestLeakageFreeSplit)
    (functions/dedup.py:leakage_free_split)."""
    from pyarrow_ops_spark.functions.dedup import leakage_free_split

    docs = load_table(spark, "documents", sf_dir)
    return leakage_free_split(docs, 0.25).select("doc_id", "split")
