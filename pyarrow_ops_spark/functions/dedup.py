"""Document deduplication for training-data pipelines: exact, n-gram
Jaccard, MinHash-LSH, and SimHash (north-star surface; the reference's only
dedup is row-level ``drop_duplicates``).

Scale design (the point of each variant):

- **Exact**: hash-groupBy on a normalized fingerprint — one shuffle on the
  16-byte digest, never on the document text.
- **Brute-force Jaccard**: O(n²) pair join — correct but only for small n;
  kept as the oracle/baseline.
- **MinHash-LSH**: the 100 TB path. Shingle → k minhashes → b bands; a
  candidate pair must share a band bucket, so the join key is the (band,
  signature) pair and the shuffle is linear in corpus size, not quadratic.
  Candidates are then verified with exact Jaccard, so the output equals the
  brute-force result with probability 1 - (1 - t^r)^b per pair (~1e-8 miss
  at t=0.9 with k=64, b=16, r=4).
- **SimHash**: 64-bit signature whose Hamming distance tracks cosine
  similarity of the shingle sets; banded by 4×16-bit chunks for candidate
  generation. Shingle hashing stays JVM-side (xxhash64); only the
  bit-vote is a vectorized pandas UDF.

All hash functions are fixed-seed and engine-deterministic.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pyarrow_ops_spark.functions.text import fingerprint


# ---------------------------------------------------------------------------
# shingling
# ---------------------------------------------------------------------------


def char_shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct character n-grams of the raw text (positions 1..len-n+1),
    as an array<string> column — pure Catalyst (sequence + transform)."""
    c = F.col(col) if isinstance(col, str) else col
    idx = F.sequence(F.lit(1), F.greatest(F.length(c) - F.lit(n - 1), F.lit(1)))
    return F.array_distinct(F.transform(idx, lambda i: c.substr(i, F.lit(n))))


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard similarity of two array columns (as double).

    The intersection size is BOUND once per row (``text._bind``):
    referencing the ``array_intersect`` subtree in both numerator and
    denominator re-evaluates it twice per row — it is the dominant term
    of every candidate-verification stage (r14: halved that stage's
    expression cost; value-identical, both forms divide the same
    integers in double)."""
    from pyarrow_ops_spark.functions.text import _bind

    return _bind(
        F.size(F.array_intersect(a, b)),
        lambda i: i.cast("double") / (F.size(a) + F.size(b) - i),
    )


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_duplicates(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One row per distinct normalized text: (fp, canonical_id, n_copies).
    Shuffles only (digest, id) pairs — the text never moves."""
    return (
        df.select(F.col(id_col), fingerprint(text_col).alias("fp"))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def dedup_exact(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep one document per normalized text (the lowest id)."""
    winners = exact_duplicates(df, id_col, text_col).select(
        F.col("canonical_id").alias(id_col)
    )
    return df.join(winners, on=id_col, how="semi")


# ---------------------------------------------------------------------------
# brute-force n-gram Jaccard pairs (baseline / oracle)
# ---------------------------------------------------------------------------


def jaccard_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """All pairs with shingle-Jaccard >= threshold via an O(n²) self-join.
    Baseline only — use minhash_lsh_pairs at scale."""
    from pyspark import StorageLevel

    # both join sides reuse the shingle relation — materialize it once
    sh = df.select(
        F.col(id_col).alias("id"), char_shingles(text_col, n).alias("grams")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    a = sh.select(F.col("id").alias("id_a"), F.col("grams").alias("grams_a"))
    b = sh.select(F.col("id").alias("id_b"), F.col("grams").alias("grams_b"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    j = jaccard(F.col("grams_a"), F.col("grams_b"))
    out = (
        pairs.select("id_a", "id_b", F.round(j, 4).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )
    out.cached_relations = [sh]  # release via unpersist_cached
    return out


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signature(grams: Column, num_hashes: int = 64) -> list[Column]:
    """k minhash values with fixed seeds 0..k-1 — deterministic across runs
    and engines.

    Takes the string-shingle array; for repeated use prefer hashing the
    shingles once into longs and calling ``_minhash_from_hashes``."""
    base = F.transform(grams, lambda g: F.xxhash64(g))
    return [
        F.array_min(F.transform(base, lambda h: F.xxhash64(h, F.lit(i)))).alias(f"mh_{i}")
        for i in range(num_hashes)
    ]


def _minhash_from_hashes(hashes: Column, num_hashes: int) -> list[Column]:
    return [
        F.array_min(F.transform(hashes, lambda h: F.xxhash64(h, F.lit(i)))).alias(f"mh_{i}")
        for i in range(num_hashes)
    ]


class BucketStats:
    """Deferred bucket-cap observability for the banded pair generators.

    Wraps a :class:`pyspark.sql.Observation` attached to the bucket
    relation BEFORE the ``size <= max_bucket`` filter, so the metrics are
    collected during whatever action materializes the pair output — zero
    extra jobs (the no-silent-caps rule: degenerate buckets are dropped at
    the plan level, and this is the receipt). Call :meth:`get` AFTER an
    action on the returned DataFrame; it delegates to ``Observation.get``.

    Fallback: when the observation never fired — AQE's empty-relation
    propagation ELIMINATES the observe node from the executed plan
    whenever the downstream result is empty (e.g. every bucket capped
    away), and the resolved metrics row then has no schema — :meth:`get`
    recomputes the identical metrics from the raw bucket relation with
    one small aggregate job. (The build-then-act-then-get ordering still
    applies: before any action ``Observation.get`` blocks.)"""

    def __init__(
        self, observation, max_bucket: int, raw=None, ids_col: str | None = None
    ) -> None:
        self._observation = observation
        self._raw = raw
        self._ids_col = ids_col
        self.max_bucket = max_bucket

    def _fallback_row(self):
        sz = F.size(self._ids_col)
        over = (sz > self.max_bucket).cast("long")
        return self._raw.agg(
            F.count(F.lit(1)).alias("total_buckets"),
            F.sum(over).alias("dropped_buckets"),
            F.sum(over * sz.cast("long")).alias("dropped_ids"),
            F.max(sz).alias("max_bucket_size"),
        ).collect()[0]

    def get(self) -> dict:
        try:
            row = self._observation.get
        except Exception as exc:
            # Narrow catch: ONLY the known AQE empty-relation failure —
            # the eliminated observe node leaves a schema-less metrics row
            # that dies in PythonSQLUtils.toPyRow (a Py4JJavaError naming
            # toPyRow). Anything else (analysis errors, connection
            # failures, user bugs) re-raises: silently recomputing there
            # would both mask the real failure and charge an extra job.
            if self._raw is None or "toPyRow" not in str(exc):
                raise
            row = self._fallback_row()
        return {
            "max_bucket": self.max_bucket,
            "total_buckets": row["total_buckets"] or 0,
            "dropped_buckets": row["dropped_buckets"] or 0,
            "dropped_ids": row["dropped_ids"] or 0,
            "max_bucket_size": row["max_bucket_size"] or 0,
        }


def _expose_bucket_stats(out: DataFrame, fn, stats: "BucketStats") -> DataFrame:
    """Expose drop accounting two ways: ``out.bucket_stats`` (a per-call
    handle on the returned DataFrame object — use this when building
    several pipelines before acting on them) and ``fn.last_bucket_stats``
    (process-global convenience: LAST BUILD WINS, not thread-safe —
    building a second pipeline overwrites the first's handle). Either
    way, read with ``.get()`` only AFTER an action on the returned
    DataFrame; ``Observation.get`` blocks until the first action
    completes. The attribute lives on this exact DataFrame object —
    further transformations return new objects without it."""
    out.bucket_stats = stats
    fn.last_bucket_stats = stats
    return out


def _track_dedup_caches(out: DataFrame, *rels) -> DataFrame:
    """Attach the pipeline's persisted relations to the returned frame as
    ``out.cached_relations`` so long-lived sessions can release them with
    :func:`unpersist_cached` after the consuming action — the same
    contract as the similarity entry points (whose ``_track_cached`` is
    reused, not copied). Cache lifetime: the eager materializations
    (``sh.count()``/``fps.count()``) are load-bearing against concurrent
    AQE branches recomputing the fingerprint DAG, so the caches exist by
    the time this returns and stay until ``unpersist_cached(out)`` or
    ``spark.catalog.clearCache()``."""
    from pyarrow_ops_spark.functions.similarity import _track_cached

    bs = getattr(out, "bucket_stats", None)
    out = _track_cached(out, *rels)
    if bs is not None:
        out.bucket_stats = bs
    return out


def unpersist_cached(df: DataFrame, blocking: bool = False) -> int:
    """Release the relations a dedup entry point persisted for the plan
    behind ``df`` (``df.cached_relations``) — call after the consuming
    action. Shared implementation with the similarity entry points."""
    from pyarrow_ops_spark.functions.similarity import (
        unpersist_cached as _u,
    )

    return _u(df, blocking)


def _observe_buckets(
    raw: DataFrame, ids_col: str, max_bucket: int
) -> "tuple[DataFrame, BucketStats]":
    """Attach drop accounting to an unfiltered bucket relation
    (``ids_col``: array of member ids). Returns the observed DataFrame
    (filter it afterwards) and the stats handle."""
    from pyspark.sql import Observation

    obs = Observation()
    sz = F.size(ids_col)
    over = (sz > max_bucket).cast("long")
    observed = raw.observe(
        obs,
        F.count(F.lit(1)).alias("total_buckets"),
        F.sum(over).alias("dropped_buckets"),
        F.sum(over * sz.cast("long")).alias("dropped_ids"),
        F.max(sz).alias("max_bucket_size"),
    )
    return observed, BucketStats(obs, max_bucket, raw=raw, ids_col=ids_col)


def _collapse_exact_texts(
    df: DataFrame, id_col: str, text_col: str, assume_dups: bool | None = None
) -> "tuple[DataFrame, bool]":
    """Group BYTE-IDENTICAL documents: (__t raw text, members sorted ids).

    The text twin of ``similarity._collapse_exact_vectors``: g exact copies
    of a page land in every one of their MinHash band buckets and the
    bucket pair generator goes O(g²); collapsing first makes LSH cost a
    function of UNIQUE documents. Keyed on md5 of the RAW text (not the
    normalized ``fingerprint`` — case/whitespace variants have different
    shingle sets and must stay distinct here); the digest-keyed shuffle
    carries 16 bytes + ids, and one representative text per group survives
    via ``first`` (all group members are byte-identical by construction).
    Null-text rows are excluded — they produce no shingles and can never
    pair (matching the uncollapsed pipeline, where their signature rows
    are null and never explode).

    A digest pre-check (count vs distinct xxhash64 — an 8-byte map-side-
    combined aggregate) skips the collapse on duplicate-free corpora, so
    dup-free inputs never pay the text-payload exchange; a hash collision
    can only run the collapse spuriously, never merge distinct texts.
    The pre-check is an extra eager scan — at 100 TB a pipeline that
    already knows its dup profile can skip it with ``assume_dups``:
    ``True`` collapses unconditionally (always result-identical to auto —
    collapsing a dup-free corpus is only a wasted shuffle), ``False``
    skips the collapse unconditionally, ``None`` (auto) runs the check.
    CAVEAT on ``False``: it is result-identical only when the input is
    genuinely dup-free (or every clone group fits ``max_bucket``) —
    with real clone mass, skipping the collapse puts every clone member
    into the same band buckets, and a clone group larger than
    ``max_bucket`` is then dropped by the bucket cap, losing the
    Jaccard-1.0 pairs/edges the collapsed path emits as intra-group
    output.

    Returns ``(groups, had_dups)`` so call sites can skip the group
    persist and member-expansion machinery entirely on the skip path."""
    base = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("__t")).filter(
        F.col("__t").isNotNull()
    )
    if assume_dups is None:
        n_dups = base.agg(
            (F.count(F.lit(1)) - F.count_distinct(F.xxhash64("__t"))).alias("d")
        ).collect()[0]["d"]
        assume_dups = n_dups != 0
    if not assume_dups:
        return base.select(F.array("id").alias("members"), "__t"), False
    return (
        base.withColumn("__k", F.md5(F.col("__t")))
        .groupBy("__k")
        .agg(
            F.array_sort(F.collect_list("id")).alias("members"),
            F.first("__t").alias("__t"),
        )
    ), True


def minhash_lsh_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    num_hashes: int = 80,
    bands: int = 16,
    max_bucket: int = 10_000,
    assume_dups: bool | None = None,
) -> DataFrame:
    """Near-duplicate pairs via exact-duplicate collapse + banded
    MinHash-LSH + exact verification.

    Pipeline: byte-identical documents collapse to one representative per
    group (intra-group pairs are emitted directly at Jaccard 1.0 — their
    shingle sets are equal — and representative pairs expand to member
    pairs at the end; without the collapse, g exact copies cost O(g²)
    inside every band bucket). Representatives then: shingle -> k
    minhashes -> b band signatures (hash of r consecutive minhashes) ->
    explode to (band, sig, id) -> bucket-local pair generation -> distinct
    candidate pairs -> exact Jaccard filter.

    The candidate shuffle carries only band signatures (linear in UNIQUE
    corpus); exact verification re-joins the shingle arrays for candidates
    only; the member expansion is output-bound (quadratic only where the
    answer is).

    ``assume_dups`` skips the collapse pre-check scan (see
    ``_collapse_exact_texts``); ``max_bucket`` caps degenerate band
    buckets, with drop accounting on the returned frame. FOOT-GUN:
    ``.bucket_stats`` is a Python attribute on THIS DataFrame object —
    any further transform returns a new object without it, so capture
    the handle first::

        pairs = minhash_lsh_pairs(df, 0.8)
        stats = pairs.bucket_stats          # capture BEFORE transforms
        pairs.filter(...).count()           # any action materializes it
        stats.get()

    (``minhash_lsh_pairs.last_bucket_stats`` remains as a last-build-wins
    convenience for single-pipeline scripts.)
    """
    from pyspark import StorageLevel

    groups, had_dups = _collapse_exact_texts(df, id_col, text_col, assume_dups)
    if not had_dups:
        out = _minhash_rep_pairs(groups, threshold, n, num_hashes, bands, max_bucket)
        out = _expose_bucket_stats(out, minhash_lsh_pairs, out._bucket_stats)
        return _track_dedup_caches(out, out)
    groups = groups.persist(StorageLevel.MEMORY_AND_DISK)
    intra = (
        groups.filter(F.size("members") >= 2)
        .select(F.explode(_ordered_pairs_expr(F.col("members"))).alias("p"))
        .select("p.id_a", "p.id_b", F.lit(1.0).alias("jaccard"))
    )
    rep_pairs = _minhash_rep_pairs(groups, threshold, n, num_hashes, bands, max_bucket)
    stats = rep_pairs._bucket_stats
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
            "jaccard",
        )
    )
    out = _expose_bucket_stats(
        intra.unionByName(expanded), minhash_lsh_pairs, stats
    )
    return _track_dedup_caches(out, groups, rep_pairs)


def minhash_lsh_edges(
    df: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    num_hashes: int = 80,
    bands: int = 16,
    max_bucket: int = 10_000,
    assume_dups: bool | None = None,
) -> DataFrame:
    """Edge list (id_a, id_b) with the same connected components as
    ``minhash_lsh_pairs`` but LINEAR in duplicate-group size: each
    byte-identical group contributes a star (member -> representative)
    instead of its quadratic clique. Feed to ``connected_components`` for
    the cluster decision. Bucket-drop accounting:
    ``minhash_lsh_edges.last_bucket_stats.get()`` after an action."""
    from pyspark import StorageLevel

    groups, had_dups = _collapse_exact_texts(df, id_col, text_col, assume_dups)
    if not had_dups:
        rp = _minhash_rep_pairs(groups, threshold, n, num_hashes, bands, max_bucket)
        out = _expose_bucket_stats(
            rp.select("id_a", "id_b"), minhash_lsh_edges, rp._bucket_stats
        )
        return _track_dedup_caches(out, rp)
    groups = groups.persist(StorageLevel.MEMORY_AND_DISK)
    star = groups.filter(F.size("members") >= 2).select(
        F.element_at("members", 1).alias("id_a"),
        F.explode(F.slice("members", 2, F.size("members"))).alias("id_b"),
    )
    rep_pairs = _minhash_rep_pairs(groups, threshold, n, num_hashes, bands, max_bucket)
    out = _expose_bucket_stats(
        rep_pairs.select("id_a", "id_b").unionByName(star),
        minhash_lsh_edges,
        rep_pairs._bucket_stats,
    )
    return _track_dedup_caches(out, groups, rep_pairs)


def _minhash_band_rows(
    hashed: DataFrame, num_hashes: int, bands: int
) -> DataFrame:
    """Exploded (id, band, sig) MinHash band signatures via one vectorized
    Arrow batch per partition — the numeric-slot-mixing twin of
    ``similarity.banded_rows``.

    Input: (id long, hashes array<long>) — xxhash64 of each distinct
    shingle, computed JVM-side. Per document, slot i's minhash is
    ``min over shingles of splitmix64(h ^ key_i)`` where ``key_i`` is the
    splitmix64 stream at index i (golden-gamma increments); a band's
    signature chains its ``rows`` slot minima through the same finalizer.
    One (k × n_shingles) broadcasted mix + a min per axis — no
    interpreted per-element lambdas. Deterministic: fixed published
    constants, no seeds, no RNG. Empty/null shingle arrays yield no
    output rows (such documents can never pair — matches the expression
    path, where array_min of an empty array is null and the null
    signature still groups only with nulls; representatives with no
    shingles produce no candidates either way). Closure is
    self-contained for plain-session cloudpickle.

    Vectorized ACROSS the batch (r14): every document's hashes
    concatenate into one flat vector and each slot's per-document minima
    come from ``np.minimum.reduceat`` over the document offsets — the
    per-document loop ran ~35 small numpy calls per doc (~190k calls for
    the sf0.1 corpus; measured ~20 s of the banding stage's task time),
    the batch form runs k call-groups per Arrow batch for the identical
    arithmetic, so signatures are bit-identical."""
    n_bands, n_rows = int(bands), int(num_hashes // bands)

    def gen(batches):
        import numpy as _np
        import pandas as _pd

        M1 = _np.uint64(0xBF58476D1CE4E5B9)
        M2 = _np.uint64(0x94D049BB133111EB)
        GAMMA = _np.uint64(0x9E3779B97F4A7C15)

        def _mix(z):
            z = z.copy()
            z ^= z >> _np.uint64(30)
            z *= M1
            z ^= z >> _np.uint64(27)
            z *= M2
            z ^= z >> _np.uint64(31)
            return z

        k = n_bands * n_rows
        slot_keys = _mix(
            (_np.arange(1, k + 1, dtype=_np.uint64)) * GAMMA
        )  # (k,) per-slot xor keys
        empty = _pd.DataFrame(
            {
                "id": _pd.Series([], dtype="int64"),
                "band": _pd.Series([], dtype="int32"),
                "sig": _pd.Series([], dtype="int64"),
            }
        )

        for pdf in batches:
            ids, arrs = [], []
            for id_, hashes in zip(pdf["id"], pdf["hashes"]):
                if hashes is None or len(hashes) == 0:
                    continue
                ids.append(id_)
                arrs.append(_np.asarray(hashes, dtype=_np.int64))
            if not ids:
                yield empty
                continue
            n_docs = len(arrs)
            flat = _np.concatenate(arrs).view(_np.uint64)
            lens = _np.fromiter(
                (a.size for a in arrs), dtype=_np.int64, count=n_docs
            )
            offsets = _np.zeros(n_docs, dtype=_np.int64)
            _np.cumsum(lens[:-1], out=offsets[1:])
            mins = _np.empty((k, n_docs), dtype=_np.uint64)
            for i in range(k):
                mins[i] = _np.minimum.reduceat(_mix(flat ^ slot_keys[i]), offsets)
            # (n_docs, n_bands, n_rows): fold each band's slot minima
            # through the same finalizer, all documents at once
            m3 = mins.T.reshape(n_docs, n_bands, n_rows)
            acc = _np.zeros((n_docs, n_bands), dtype=_np.uint64)
            for j in range(n_rows):
                acc = _mix(acc ^ m3[:, :, j])
            yield _pd.DataFrame(
                {
                    "id": _np.repeat(
                        _np.asarray(ids, dtype=_np.int64), n_bands
                    ),
                    "band": _np.tile(
                        _np.arange(n_bands, dtype=_np.int32), n_docs
                    ),
                    "sig": acc.view(_np.int64).reshape(-1),
                }
            )

    return hashed.mapInPandas(gen, "id long, band int, sig long")


def _minhash_doc_rows(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    num_hashes: int,
    bands: int,
) -> DataFrame:
    """Fused shingle-hash + MinHash-band kernel: one Arrow pass over the
    raw text emits ``(id, hashes, sigs)`` — ``hashes`` the sorted
    distinct 64-bit gram-hash set (feeding exact-Jaccard verification)
    and ``sigs`` the ``bands`` band signatures (``_minhash_band_rows``
    arithmetic over those hashes, bit-identical to feeding them through
    that kernel).

    Hash: a position-weighted codepoint sum in wrapping uint64 (fixed
    splitmix-derived odd weights per offset) through a splitmix64
    finalizer — deterministic, no RNG, self-contained closure. Grams are
    codepoint windows, exactly ``char_shingles``'s substr windows (text
    shorter than ``n`` — including empty — is one whole-text gram, like
    ``substr(1, n)``). Distinct HASHES stand in for distinct STRING
    grams everywhere downstream: two distinct grams of one document
    colliding would perturb a Jaccard denominator, at probability
    ~len²·2⁻⁶⁴ ≈ 1e-13 per document — the certs compare the verified
    pair output against the string-gram DuckDB oracle, so the synthetic
    corpora prove the family collision-free there.

    Fusing matters because the two-stage split paid the Python boundary
    twice: the banding stage re-shipped every document's hash array
    JVM→Arrow→JVM, and that transfer — not the vectorized math — was
    ~90% of its task time (measured 13-15 s per A/B variant at sf0.1
    regardless of which side computed the hashes). Here the hash arrays
    are born in the worker, the signature math reuses them in place, and
    only one batch crossing happens. Null-text rows emit nothing."""
    nn, n_bands, n_rows = int(n), int(bands), int(num_hashes // bands)
    idc, txc = id_col, text_col

    def gen(batches):
        import numpy as _np
        import pandas as _pd
        from numpy.lib.stride_tricks import sliding_window_view as _svw

        M1 = _np.uint64(0xBF58476D1CE4E5B9)
        M2 = _np.uint64(0x94D049BB133111EB)
        GAMMA = _np.uint64(0x9E3779B97F4A7C15)

        def _mix(z):
            z = z.copy()
            z ^= z >> _np.uint64(30)
            z *= M1
            z ^= z >> _np.uint64(27)
            z *= M2
            z ^= z >> _np.uint64(31)
            return z

        k = n_bands * n_rows
        slot_keys = _mix(_np.arange(1, k + 1, dtype=_np.uint64) * GAMMA)
        weights = _mix(
            _np.arange(1, nn + 1, dtype=_np.uint64) * GAMMA
        ) | _np.uint64(1)

        def _codes(text):
            if text.isascii():
                return _np.frombuffer(text.encode(), dtype=_np.uint8).astype(
                    _np.uint64
                )
            return _np.array([ord(c) for c in text], dtype=_np.uint64)

        def _hashes(text):
            codes = _codes(text)
            if codes.size >= nn:
                wins = _svw(codes, nn)
                acc = wins[:, 0] * weights[0]
                for j in range(1, nn):
                    acc = acc + wins[:, j] * weights[j]
            else:
                acc = _np.zeros(1, dtype=_np.uint64)
                for j in range(codes.size):
                    acc = acc + codes[j] * weights[j]
            return _np.unique(_mix(acc))

        for pdf in batches:
            ids, arrs = [], []
            for id_, text in zip(pdf[idc], pdf[txc]):
                if text is None:
                    continue
                ids.append(id_)
                arrs.append(_hashes(text))
            if not ids:
                yield _pd.DataFrame(
                    {"id": _pd.Series([], dtype="int64"), "hashes": [],
                     "sigs": []}
                )
                continue
            n_docs = len(arrs)
            flat = _np.concatenate(arrs)
            lens = _np.fromiter(
                (a.size for a in arrs), dtype=_np.int64, count=n_docs
            )
            offsets = _np.zeros(n_docs, dtype=_np.int64)
            _np.cumsum(lens[:-1], out=offsets[1:])
            mins = _np.empty((k, n_docs), dtype=_np.uint64)
            for i in range(k):
                mins[i] = _np.minimum.reduceat(
                    _mix(flat ^ slot_keys[i]), offsets
                )
            m3 = mins.T.reshape(n_docs, n_bands, n_rows)
            acc = _np.zeros((n_docs, n_bands), dtype=_np.uint64)
            for j in range(n_rows):
                acc = _mix(acc ^ m3[:, :, j])
            sigs = acc.view(_np.int64)
            yield _pd.DataFrame(
                {
                    "id": _pd.Series(ids, dtype="int64"),
                    "hashes": [a.view(_np.int64) for a in arrs],
                    "sigs": list(sigs),
                }
            )

    out = df.select(id_col, text_col).mapInPandas(
        gen, "id long, hashes array<long>, sigs array<long>"
    )
    return out.withColumnRenamed("id", id_col) if id_col != "id" else out


def _ordered_pairs_expr(ids: Column) -> Column:
    """All (id_a < id_b) pairs of a SORTED array column — single shared
    implementation (similarity.py owns it; a drifted copy here would
    silently desynchronize the text and embedding pair generators)."""
    from pyarrow_ops_spark.functions.similarity import _ordered_array_pairs

    return _ordered_array_pairs(ids)


def _minhash_rep_pairs(
    groups: DataFrame,
    threshold: float,
    n: int,
    num_hashes: int,
    bands: int,
    max_bucket: int = 10_000,
) -> DataFrame:
    """Verified (id_a < id_b, jaccard) pairs among group representatives —
    the banded-MinHash candidate engine shared by the pair/edge entry
    points above."""
    from pyspark import StorageLevel

    from pyarrow_ops_spark.functions.text import spread

    reps = groups.select(F.element_at("members", 1).alias("id"), "__t")
    # Spread the hash-heavy signature computation across all cores: a small
    # single-file scan arrives as ONE partition; at real scale the file
    # splits provide this parallelism for free, so ``spread`` skips the
    # shuffle when the scan already has enough splits.
    # The fused doc relation (id, hashes, sigs) feeds THREE branches of
    # one DAG (signature explode → candidates, plus both sides of the
    # exact-Jaccard verification) — persist it so the text pass runs
    # once, spilling to disk if it outgrows executor memory (at 100 TB
    # you'd checkpoint this to storage instead). r14: the whole shingle
    # path (substr windows + distinct + hash + band signatures) runs in
    # ONE vectorized Arrow pass over the raw text (``_minhash_doc_rows``)
    # — the previous split (Catalyst char_shingles + array_distinct +
    # xxhash64-transform feeding a separate numpy banding stage) paid
    # three interpreted HOF passes over ~1000-element arrays per
    # document plus a SECOND Python boundary crossing of every hash
    # array, together ~80% of the signature cost; and string-gram
    # storage made the verification intersect ~4x slower than the int64
    # form. Distinct 64-bit gram hashes are what every consumer needs:
    # the minhash slots re-mix them, and Jaccard over the hash SETS
    # equals string-set Jaccard absent 64-bit collisions (~1e-13/doc;
    # the DuckDB-oracle certs pin the equality on the synthetic
    # corpora). The slot/gram mixer is splitmix64 — a published-constant
    # 64-bit finalizer, deterministic across runs and engines; the certs
    # compare verified PAIRS against exact Jaccard, so any uniform hash
    # family yields the same output (per-pair miss prob ~1e-7 at the
    # banding configs used).
    sh = _minhash_doc_rows(
        spread(reps), "id", "__t", n, num_hashes, bands
    ).persist(StorageLevel.MEMORY_AND_DISK)
    # Materialize the cache BEFORE the plan fans out: AQE kicks off the
    # two verification-side broadcast exchanges CONCURRENTLY with the
    # signature shuffle stage, and a lazily-persisted relation is then
    # computed once per concurrent branch (measured 3x the kernel's task
    # time at sf0.1 — the same race the connected_components docstring
    # pins for union branches). One eager pass, every branch reads cache.
    sh.count()
    exploded = sh.select(
        "id", F.posexplode("sigs").alias("band", "sig")
    )
    # Bucket-local pair generation instead of a self-join: ONE pass over the
    # signatures (a self-join would execute the whole signature pipeline
    # twice), one shuffle on (band, sig), pairs generated inside each
    # bucket. Degenerate buckets (>max_bucket ids) are dropped — a bucket
    # that catches thousands of docs carries no near-dup signal, only
    # O(bucket²) pair blowup. Drops are counted via an Observation on the
    # unfiltered relation (collected during the caller's action — no extra
    # job) and exposed through the public entry points' last_bucket_stats.
    raw_buckets = exploded.groupBy("band", "sig").agg(
        F.array_sort(F.collect_set("id")).alias("ids")
    )
    raw_buckets, stats = _observe_buckets(raw_buckets, "ids", max_bucket)
    buckets = raw_buckets.filter(
        (F.size("ids") >= 2) & (F.size("ids") <= max_bucket)
    )
    pair_expr = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + 2, F.size(F.col("ids"))),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    candidates = (
        buckets.select(F.explode(pair_expr).alias("p"))
        .select("p.id_a", "p.id_b")
        .distinct()
    )
    # verify candidates with exact Jaccard over the hashed shingle sets
    # (re-joined per side). Catalyst array_intersect over int64 arrays is
    # the fastest verifier measured (5 s task vs 21 s for a pandas-UDF
    # merge-intersect — per-row Python overhead — and 22 s for the old
    # string-gram intersect, 35k candidates at sf0.1); it also stays
    # inside the JVM, so the verify stage ships no arrays to Python.
    grams_a = sh.select(F.col("id").alias("id_a"), F.col("hashes").alias("h_a"))
    grams_b = sh.select(F.col("id").alias("id_b"), F.col("hashes").alias("h_b"))
    verified = (
        candidates.join(grams_a, on="id_a").join(grams_b, on="id_b")
        .select(
            "id_a",
            "id_b",
            F.round(jaccard(F.col("h_a"), F.col("h_b")), 4).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    # Per-call handle ON THE RETURNED FRAME (thread-safe: two concurrent
    # pipeline builds each see their own stats; the old round-trip through
    # a function attribute was last-build-wins even across threads).
    verified._bucket_stats = stats
    verified._persisted_inputs = [sh]  # release via unpersist_cached
    return verified


# ---------------------------------------------------------------------------
# connected components: near-dup pairs -> dedup clusters
# ---------------------------------------------------------------------------


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Connected components by iterative min-label propagation:
    ``(node, component)`` where component = the smallest node id reachable
    through the edge set.

    Near-dup PAIRS are not a dedup decision — similarity is not
    transitive, so A~B and B~C must collapse into one cluster {A,B,C}
    with a single kept representative. This is the standard large-scale
    construction (MapReduce-CC / GraphFrames do the same shape): each
    iteration is one join + one aggregation, converging in O(graph
    diameter) rounds — near-dup clusters are tiny and tight, so 3-5
    rounds in practice.

    The edge relation carries SELF-LOOPS (one per node), so each round is
    exactly ``labels_{i+1}(n) = min over m in N(n) ∪ {n} of labels_i(m)``
    — one join + one aggregation, no per-round left-join/coalesce back
    onto the previous labels (r14: that third exchange per round was pure
    plan weight — the self-loop row delivers the node's own label through
    the same join). Round one needs no join at all (``labels_0`` is the
    identity, so ``labels_1 = min(m) per n`` is a plain aggregate over the
    edge relation). The relation is persisted PRE-PARTITIONED on the join
    key ``m``, so every round's join reads it exchange-free and only the
    (tiny) label relation shuffles.

    Lineage is truncated each round: with ``checkpoint_dir`` set, via a
    RELIABLE checkpoint to that storage path (survives executor loss —
    what a 1000-executor run wants; set
    ``spark.cleaner.referenceTracking.cleanCheckpoints=true`` to have the
    ContextCleaner delete checkpoint files once their DataFrames are
    garbage-collected — they accumulate otherwise); otherwise via
    ``localCheckpoint`` (executor-local blocks, fine single-node). The
    previously-configured checkpoint directory is restored on exit.
    Truncation — not a bare persist — is load-bearing for the loop
    (r14, measured): a per-round persist keeps the FULL lineage, so (a)
    every round re-plans a logical tree one cached-join layer deeper
    (driver latency grows with round count), and (b) releasing an old
    round's cache leaves any later block loss nothing to rebuild from
    but the entire upstream pair-generation DAG — an A/B batch caught
    exactly that as a 3x wall outlier. Checkpoint rounds stay O(1) in
    plan size and recompute depth.

    Convergence is detected by the per-round sum of labels: min-label
    propagation only ever lowers a label, so an unchanged sum means a
    fixed point. The round's checkpoint is LAZY and the convergence agg is
    the action that materializes it — ONE job per iteration (an eager
    checkpoint plus a separate agg was two full passes per round).

    After the call, ``connected_components.last_stats`` holds
    ``{"iterations": n, "converged": bool}`` for observability.
    """
    from pyspark import StorageLevel

    sc = edges.sparkSession.sparkContext
    prev_checkpoint_dir = sc.getCheckpointDir()
    if checkpoint_dir is not None:
        sc.setCheckpointDir(checkpoint_dir)

    def _truncate(df: DataFrame, eager: bool = True) -> DataFrame:
        if checkpoint_dir is not None:
            return df.checkpoint(eager=eager)
        return df.localCheckpoint(eager=eager)

    try:
        # Materialize the edge list BEFORE mirroring it: the union's two
        # branches are otherwise two full executions of the (potentially
        # expensive) upstream pair-generation DAG — for the LSH dedup
        # pipelines that doubled the whole candidate+verify cost. An eager
        # checkpoint (not a lazy persist) guarantees exactly-once execution:
        # lazy cache blocks fill per-partition DURING the first job, so the
        # two union branches race and each can recompute the DAG.
        edges_p = _truncate(
            edges.select(F.col(src).alias("n"), F.col(dst).alias("m"))
        )
        nodes = (
            edges_p.select("n")
            .unionByName(edges_p.select(F.col("m").alias("n")))
            .distinct()
        )
        both = (
            edges_p.unionByName(
                edges_p.select(F.col("m").alias("n"), F.col("n").alias("m"))
            )
            .unionByName(nodes.select("n", F.col("n").alias("m")))
            .repartition(F.col("m"))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        # round one: labels_0 is the identity, so the first propagation
        # is a plain aggregate (self-loops make min(m) include n itself).
        # Lazy truncation: the sum agg below is the materializing action.
        labels = _truncate(
            both.groupBy("n").agg(F.min("m").alias("label")), eager=False
        )
        # decimal accumulator: exact at any node count (sum(long) could
        # overflow)
        def _sum(lbls: DataFrame):
            return lbls.agg(
                F.sum(F.col("label").cast("decimal(38,0)")).alias("s")
            ).collect()[0]["s"]

        label_sum = _sum(labels)
        iterations, converged = 1, False
        for _ in range(max_iter - 1):
            iterations += 1
            lbl_m = labels.select(F.col("n").alias("lm"), "label")
            labels = _truncate(
                both.join(lbl_m, on=F.col("m") == F.col("lm"), how="inner")
                .groupBy("n")
                .agg(F.min("label").alias("label")),
                eager=False,
            )
            new_sum = _sum(labels)
            if new_sum == label_sum:
                converged = True
                break
            label_sum = new_sum
        connected_components.last_stats = {
            "iterations": iterations,
            "converged": converged,
        }
        both.unpersist()
        return labels.select(
            F.col("n").alias("node"), F.col("label").alias("component")
        )
    finally:
        if checkpoint_dir is not None:
            sc.setCheckpointDir(prev_checkpoint_dir)


def dedup_clusters(
    df: DataFrame,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    num_hashes: int = 80,
    bands: int = 16,
    max_bucket: int = 10_000,
    assume_dups: bool | None = None,
) -> DataFrame:
    """Full near-dup dedup decision: MinHash-LSH edges -> transitive
    clusters -> one row per document with its cluster representative.
    Output: (doc_id, canonical_id, is_duplicate); documents with no
    near-dup keep themselves. Uses the star-edge list (see
    ``minhash_lsh_edges``): identical-document groups enter the component
    graph linearly instead of as O(g²) cliques — same components.
    ``num_hashes``/``bands``/``max_bucket``/``assume_dups`` pass through
    to the edge generator (same knobs as ``winnow_clusters``)."""
    pairs = minhash_lsh_edges(
        df, threshold, id_col, text_col, n, num_hashes, bands, max_bucket,
        assume_dups,
    )
    comps = connected_components(pairs, "id_a", "id_b")
    # connected_components eagerly checkpointed the edge list — the edge
    # pipeline's caches (signatures, collapse groups) are dead weight now;
    # release them instead of letting them squat on storage memory for
    # the rest of the session (r15, ADVICE #4).
    unpersist_cached(pairs)
    out = df.select(id_col).join(
        comps, on=F.col(id_col) == F.col("node"), how="left"
    )
    return out.select(
        id_col,
        F.coalesce(F.col("component"), F.col(id_col)).alias("canonical_id"),
    ).withColumn("is_duplicate", F.col("canonical_id") != F.col(id_col))


def resolve_cluster_representatives(
    df: DataFrame,
    cluster_col: str,
    id_col: str,
    score,
    rep_col: str = "rep_id",
) -> DataFrame:
    """Pick each cluster's representative by POLICY instead of min-id:
    the row with the highest ``score`` (a Column — e.g. ``F.col
    ("n_chars")`` keeps the longest document, a quality score keeps the
    best), ties broken by smallest id. Appends ``rep_col`` plus an
    ``is_duplicate`` flag (true for every non-representative member).

    Curation pipelines rarely want "keep the smallest doc_id" — they keep
    the longest / highest-quality / newest member of each near-dup
    cluster. Compose with :func:`dedup_clusters` /
    ``embedding_dedup_clusters`` (their ``canonical_id`` is the cluster
    key) and filter ``~is_duplicate``.

    Scale shape: a map-side-combinable ``max_by`` aggregate produces one
    row per cluster, joined back on the cluster key — no per-cluster sort
    window over the corpus. The argmax payload is (score, id), not the
    row, so wide rows never ride the aggregate buffer. Numeric ids use a
    single max_by over (score, -id); string ids (crawl doc hashes) take
    a two-aggregate path — per-cluster max score, then min id among the
    max-score rows — since string ids cannot be order-negated."""
    from pyspark.sql.types import NumericType

    if isinstance(df.schema[id_col].dataType, NumericType):
        tie = F.struct(
            score.alias("__s"), (-F.col(id_col)).alias("__tb")
        )
        reps = df.groupBy(cluster_col).agg(
            F.max_by(F.col(id_col), tie).alias(rep_col)
        )
    else:
        scored = df.select(
            F.col(cluster_col), F.col(id_col), score.alias("__s")
        )
        smax = scored.groupBy(cluster_col).agg(F.max("__s").alias("__s"))
        reps = (
            scored.join(smax, on=[cluster_col, "__s"])
            .groupBy(cluster_col)
            .agg(F.min(F.col(id_col)).alias(rep_col))
        )
    return df.join(reps, on=cluster_col).withColumn(
        "is_duplicate", F.col(id_col) != F.col(rep_col)
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """64-bit SimHash per document.

    Shingle hashing is JVM-side (xxhash64 over the shingle array); the
    per-bit majority vote runs as a vectorized pandas UDF over the hash
    arrays (numpy bit unpacking), Arrow-batched.
    """
    import numpy as np

    hashed = df.select(
        F.col(id_col),
        F.transform(char_shingles(text_col, n), lambda g: F.xxhash64(g)).alias("hashes"),
    )

    def vote(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Vectorized across the whole Arrow batch: flatten every document's
        # hash array into one vector, unpack bits once, and segment-reduce
        # the votes per document with add.reduceat — no per-document Python
        # loop (each doc's shingle hashes are contiguous in the flattened
        # order, so reduceat's segment offsets are exact).
        for pdf in batches:
            arrs = [np.asarray(a, dtype=np.uint64) for a in pdf["hashes"]]
            if not arrs:
                yield pd.DataFrame({id_col: pdf[id_col], "simhash": []})
                continue
            lens = np.fromiter((len(a) for a in arrs), dtype=np.int64, count=len(arrs))
            flat = np.concatenate(arrs)
            # (total_shingles, 64) of {-1, +1}
            bits = ((flat[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1))
            votes_all = 2 * bits.astype(np.int64) - 1
            offsets = np.zeros(len(arrs), dtype=np.int64)
            np.cumsum(lens[:-1], out=offsets[1:])
            votes = np.add.reduceat(votes_all, offsets, axis=0)  # (n_docs, 64)
            sig_bits = (votes > 0).astype(np.uint64)
            sigs = (sig_bits << np.arange(64, dtype=np.uint64)).sum(
                axis=1, dtype=np.uint64
            )
            yield pd.DataFrame(
                {id_col: pdf[id_col], "simhash": sigs.astype(np.int64)}
            )

    return hashed.mapInPandas(vote, schema=f"{id_col} long, simhash long")


def simhash_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    signatures: DataFrame | None = None,
) -> DataFrame:
    """Candidate near-dup pairs by SimHash banding (4 × 16-bit chunks: any
    pair within Hamming distance 3 shares at least one chunk), verified by
    exact Hamming distance.

    ``signatures`` optionally supplies a precomputed (id, simhash) frame
    (e.g. persisted and shared with other consumers) so the signature
    pass — the corpus-wide text scan — runs once, not once per use."""
    sig = signatures if signatures is not None else simhash(df, id_col, text_col)
    chunks = sig.select(
        F.col(id_col).alias("id"),
        "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("chunk"),
                    F.shiftrightunsigned(F.col("simhash"), 16 * i)
                    .bitwiseAND(F.lit(0xFFFF))
                    .alias("val"),
                )
                for i in range(4)
            ])
        ).alias("c"),
    ).select("id", "simhash", "c.chunk", "c.val")
    # bucket-local pair generation (same rationale as minhash_lsh_pairs:
    # one pass over the signature pipeline, no self-join recompute)
    buckets = (
        chunks.groupBy("chunk", "val")
        .agg(
            F.array_sort(
                F.collect_set(F.struct(F.col("id"), F.col("simhash")))
            ).alias("members")
        )
        .filter(F.size("members") >= 2)
    )
    pair_expr = F.flatten(
        F.transform(
            F.col("members"),
            lambda x, i: F.transform(
                F.slice(F.col("members"), i + 2, F.size(F.col("members"))),
                lambda y: F.struct(
                    x["id"].alias("id_a"),
                    y["id"].alias("id_b"),
                    x["simhash"].alias("sh_a"),
                    y["simhash"].alias("sh_b"),
                ),
            ),
        )
    )
    cands = (
        buckets.select(F.explode(pair_expr).alias("p"))
        .select("p.id_a", "p.id_b", "p.sh_a", "p.sh_b")
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cands.select("id_a", "id_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# Winnowing fingerprint pairs (substring-overlap near-dup)
# ---------------------------------------------------------------------------


def winnow_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    window: int = 16,
    max_bucket: int = 10_000,
    assume_dups: bool | None = None,
) -> DataFrame:
    """Near-duplicate pairs by winnowing-fingerprint Jaccard: (id_a, id_b,
    winnow_jaccard) for every pair with fingerprint-set Jaccard >= threshold.

    Unlike MinHash-LSH this candidate engine is EXACT, not probabilistic —
    it uses prefix filtering (Bayardo et al., "Scaling Up All Pairs
    Similarity Search", WWW'07; the PPJoin family): order every document's
    fingerprints by ascending GLOBAL frequency and index only the first
    ``n - ceil(t*n) + 1`` of them. Lemma: for J(A,B) >= t, the globally
    smallest element of A∩B lies in BOTH prefixes — so prefix-bucket
    candidates are a superset of all qualifying pairs, and exact
    verification makes the output equal the O(n²) baseline.

    Frequency ordering is what makes this scale on real corpora: boilerplate
    grams shared by most documents (one fingerprint here covers 70%+ of the
    synthetic corpus — a naive shared-any-fingerprint index generates 30M+
    candidate pairs from 5k docs) sort LAST in every document, so they are
    never indexed; prefixes hold each document's rarest grams and buckets
    stay near the true near-dup pairs. Cost: one extra narrow shuffle to
    count fingerprint frequencies (at warehouse scale, precompute/cache the
    frequency relation like any statistics table).

    Byte-identical documents collapse to one representative first (same
    construction as ``minhash_lsh_pairs``): clone members share the exact
    fingerprint set, so intra-group pairs are emitted directly at Jaccard
    1.0 and representative pairs expand to member pairs at the end —
    candidate generation, frequency counting, and exact verification all
    run over UNIQUE texts. Note the pair INVENTORY itself stays
    output-quadratic in clone-group size by definition — a g-clone group
    owes g(g-1)/2 rows; callers that want a dedup DECISION should use
    ``winnow_edges`` + ``connected_components`` (or ``winnow_clusters``),
    which is linear in clone mass.

    Bucket-drop accounting rides on the returned frame: capture
    ``out.bucket_stats`` BEFORE any further transform (the attribute
    does not survive ``.filter()``/``.select()`` — they return new
    objects) and call ``.get()`` after an action.
    ``winnow_pairs.last_bucket_stats`` remains as a last-build-wins
    convenience. ``assume_dups`` skips the collapse pre-check scan.
    """
    from pyspark import StorageLevel

    groups, had_dups = _collapse_exact_texts(df, id_col, text_col, assume_dups)
    if not had_dups:
        out = _winnow_rep_pairs(groups, threshold, k, window, max_bucket)
        out = _expose_bucket_stats(out, winnow_pairs, out._bucket_stats)
        return _track_dedup_caches(out, out)
    groups = groups.persist(StorageLevel.MEMORY_AND_DISK)
    intra = (
        groups.filter(F.size("members") >= 2)
        .select(F.explode(_ordered_pairs_expr(F.col("members"))).alias("p"))
        .select("p.id_a", "p.id_b", F.lit(1.0).alias("winnow_jaccard"))
    )
    rep_pairs = _winnow_rep_pairs(groups, threshold, k, window, max_bucket)
    stats = rep_pairs._bucket_stats
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
            "winnow_jaccard",
        )
    )
    out = _expose_bucket_stats(intra.unionByName(expanded), winnow_pairs, stats)
    return _track_dedup_caches(out, groups, rep_pairs)


def winnow_edges(
    df: DataFrame,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    window: int = 16,
    max_bucket: int = 10_000,
    assume_dups: bool | None = None,
) -> DataFrame:
    """Edge list (id_a, id_b) with the same connected components as
    ``winnow_pairs`` but LINEAR in duplicate-group size: each
    byte-identical group contributes a star (member -> representative)
    instead of its quadratic clique — the winnow twin of
    ``minhash_lsh_edges``. Feed to ``connected_components`` for the
    cluster decision (or use ``winnow_clusters`` directly)."""
    from pyspark import StorageLevel

    groups, had_dups = _collapse_exact_texts(df, id_col, text_col, assume_dups)
    if not had_dups:
        rp = _winnow_rep_pairs(groups, threshold, k, window, max_bucket)
        out = _expose_bucket_stats(
            rp.select("id_a", "id_b"), winnow_edges, rp._bucket_stats
        )
        return _track_dedup_caches(out, rp)
    groups = groups.persist(StorageLevel.MEMORY_AND_DISK)
    star = groups.filter(F.size("members") >= 2).select(
        F.element_at("members", 1).alias("id_a"),
        F.explode(F.slice("members", 2, F.size("members"))).alias("id_b"),
    )
    rep_pairs = _winnow_rep_pairs(groups, threshold, k, window, max_bucket)
    out = _expose_bucket_stats(
        rep_pairs.select("id_a", "id_b").unionByName(star),
        winnow_edges,
        rep_pairs._bucket_stats,
    )
    return _track_dedup_caches(out, groups, rep_pairs)


def winnow_clusters(
    df: DataFrame,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    window: int = 16,
    max_bucket: int = 10_000,
    assume_dups: bool | None = None,
) -> DataFrame:
    """Substring-overlap dedup DECISION: winnowing prefix-filtered edges ->
    transitive connected components -> one row per document with its
    cluster representative. Output: (doc_id, canonical_id, is_duplicate) —
    same shape and construction as ``dedup_clusters`` with the exact
    winnow candidate engine instead of probabilistic MinHash. Linear in
    clone mass (star edges), so this is the 100 TB path where
    ``winnow_pairs``'s pair inventory is output-quadratic."""
    edges = winnow_edges(
        df, threshold, id_col, text_col, k, window, max_bucket, assume_dups
    )
    comps = connected_components(edges, "id_a", "id_b")
    # same cache-release discipline as dedup_clusters: the eager edge
    # checkpoint inside connected_components obsoletes the fingerprint
    # and collapse caches (r15, ADVICE #4)
    unpersist_cached(edges)
    out = df.select(id_col).join(
        comps, on=F.col(id_col) == F.col("node"), how="left"
    )
    return out.select(
        id_col,
        F.coalesce(F.col("component"), F.col(id_col)).alias("canonical_id"),
    ).withColumn("is_duplicate", F.col("canonical_id") != F.col(id_col))


def split_leakage_report(
    df: DataFrame,
    test_frac: float = 0.1,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    window: int = 16,
    seed: str = "",
    assume_dups: bool | None = None,
) -> DataFrame:
    """Eval-split contamination check: after a deterministic hash split
    (``operators.sample.sample_hash`` semantics), count near-duplicate
    pairs that CROSS the train/test boundary — each one is a test
    document whose near-copy the model trains on, silently inflating
    eval scores. The check every training-data pipeline owes its eval
    sets; exact-dedup decontamination misses near-copies entirely.

    Near-dup relation: exact winnow-Jaccard pairs (``winnow_pairs`` —
    deterministic, so the quadratic DuckDB oracle matches exactly).
    Output is ONE row: (n_train, n_test, leaky_pairs,
    contaminated_test_docs) — counts shuffle as longs, text never
    leaves the pair generator."""
    from pyarrow_ops_spark.operators.sample import _bucket, _threshold

    is_test = _bucket([id_col], seed) < F.lit(_threshold(test_frac))
    labeled = df.select(F.col(id_col).alias("id"), is_test.alias("is_test"))
    pairs = winnow_pairs(
        df, threshold=threshold, id_col=id_col, text_col=text_col, k=k,
        window=window, assume_dups=assume_dups,
    ).select("id_a", "id_b")
    lab = (
        pairs.join(
            labeled.select(F.col("id").alias("id_a"), F.col("is_test").alias("t_a")),
            on="id_a",
        ).join(
            labeled.select(F.col("id").alias("id_b"), F.col("is_test").alias("t_b")),
            on="id_b",
        )
    ).filter(F.col("t_a") != F.col("t_b"))
    leaky = lab.agg(
        F.count(F.lit(1)).cast("bigint").alias("leaky_pairs"),
        F.count_distinct(
            F.when(F.col("t_a"), F.col("id_a")).otherwise(F.col("id_b"))
        )
        .cast("bigint")
        .alias("contaminated_test_docs"),
    )
    totals = labeled.agg(
        F.sum((~F.col("is_test")).cast("long")).cast("bigint").alias("n_train"),
        F.sum(F.col("is_test").cast("long")).cast("bigint").alias("n_test"),
    )
    return totals.crossJoin(leaky)


def leakage_free_split(
    df: DataFrame,
    test_frac: float = 0.1,
    text_col: str = "text",
    group_col: str | None = None,
    seed: str = "",
    out: str = "split",
) -> DataFrame:
    """Deterministic train/test split that CANNOT leak duplicated content
    across the boundary: the side is decided by a hash of the document's
    duplicate-GROUP key, never its id, so every copy of a document lands
    on the same side. A plain id-hash split (``TableCleaner.split``,
    ``sample_hash``) sprays exact copies across the boundary — exactly the
    contamination ``split_leakage_report`` measures and the
    decontamination family then has to clean up; this operator prevents
    it at split time.

    Group key: the normalized-text ``fingerprint`` (case/whitespace
    variants count as copies — the exact-dedup relation), or pass
    ``group_col`` to split on a precomputed grouping — e.g. a cluster id
    from ``dedup_clusters``/``winnow_clusters`` for NEAR-dup-safe splits,
    or a source/site key for domain-held-out splits. ``seed`` rotates to
    an independent split; the fraction is ~``test_frac`` of GROUPS
    (weighted by nothing), so heavy clone mass can tilt row proportions —
    that is the point: the boundary follows content, not row count.

    Output: ``df`` plus ``out`` ('train'/'test'). Map-only — one scalar
    md5 chain per row, NO shuffle, NO group materialization (the md5 of
    the group key decides the side directly), so it composes with scan
    pushdown and costs nothing at 100 TB. Same bucket arithmetic as
    ``operators.sample.sample_hash`` (md5[:4] < floor(frac * 2^16) in
    hex), mirrored exactly by the DuckDB oracle.

    NULL keys: a NULL ``group_col`` (or NULL ``text_col``) makes
    ``concat_ws`` collapse the salted key to the bare seed — the empty
    string when ``seed`` is '' — so ALL NULL-key rows deterministically
    travel together on one side (which side depends on seed and
    test_frac). That is the leakage-safe reading of an unknowable key
    (rows you can't tell apart must not straddle the boundary), but it
    can dump every NULL-key row into one split — filter or impute NULL
    keys first if that mass matters.
    """
    from pyarrow_ops_spark.operators.sample import _threshold

    threshold = _threshold(test_frac)
    if group_col is not None:
        key = F.col(group_col).cast("string")
    else:
        key = fingerprint(text_col)
    salted = F.concat_ws("|", *( [F.lit(seed)] if seed else [] ), key)
    is_test = F.substring(F.md5(salted), 1, 4) < F.lit(threshold)
    return df.withColumn(
        out, F.when(is_test, F.lit("test")).otherwise(F.lit("train"))
    )


def _winnow_rep_pairs(
    groups: DataFrame,
    threshold: float,
    k: int,
    window: int,
    max_bucket: int,
) -> DataFrame:
    """Verified (id_a < id_b, winnow_jaccard) pairs among group
    representatives — the prefix-filtered candidate engine shared by the
    winnow pair/edge entry points above. Exact (prefix lemma holds for any
    consistent total order of fingerprints, so frequency counts over
    representatives are valid) — output equals the O(n²) baseline.

    Fingerprints come from the Arrow-batched
    ``winnowed_fingerprint_rows`` (value-identical to the Catalyst
    expression, ~25x cheaper — the rolling-hash HOF was 2.9 s of the
    3.15 s sf0.1 query)."""
    from pyspark import StorageLevel

    from pyarrow_ops_spark.functions.text import (
        spread,
        winnowed_fingerprint_rows,
    )

    reps = groups.select(F.element_at("members", 1).alias("id"), "__t")
    fps = winnowed_fingerprint_rows(
        spread(reps), "id", "__t", k=k, window=window
    ).persist(StorageLevel.MEMORY_AND_DISK)
    # Materialize the cache BEFORE the plan fans out (same discipline as
    # _minhash_rep_pairs): fps feeds the prefix index AND both verify
    # sides; AQE runs those branches concurrently, and a lazily-persisted
    # relation is computed once per concurrent branch — the stage drill
    # measured the whole upstream (scan → digest collapse → fingerprint
    # kernel) running three times per query before this.
    fps.count()

    ex = fps.select("id", F.explode("fps").alias("fp"))
    # Frequency attachment stays the groupBy + join-back form — an r15
    # window-count rewrite (count(*) OVER (PARTITION BY fp), "one
    # exchange instead of two") was A/B-measured 10-20% SLOWER and
    # reverted: the aggregated freqs relation is small enough that AQE
    # already plans the join-back as a BroadcastHashJoin (no second
    # exchange of `ex` exists), while WindowExec forces a full exchange
    # PLUS a sort of the exploded relation that the hash aggregate never
    # pays. At warehouse scale the frequency relation is the documented
    # precompute point (a statistics table); recomputing per call here
    # is what keeps the bench honest (no cross-run caching).
    freqs = ex.groupBy("fp").agg(F.count(F.lit(1)).alias("n_docs"))
    # per-doc fingerprints ordered by (global frequency asc, value asc) —
    # a consistent total order across all documents, rarest first
    ordered = (
        ex.join(freqs, on="fp")
        .groupBy("id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("n_docs", "fp"))),
                lambda s: s["fp"],
            ).alias("ofps")
        )
    )
    prefix_len = (
        F.size("ofps")
        - F.ceil(F.lit(float(threshold)) * F.size("ofps")).cast("int")
        + F.lit(1)
    )
    raw_buckets = (
        ordered.select(
            "id", F.explode(F.slice("ofps", 1, prefix_len)).alias("fp")
        )
        .groupBy("fp")
        .agg(F.array_sort(F.collect_set("id")).alias("ids"))
    )
    raw_buckets, stats = _observe_buckets(raw_buckets, "ids", max_bucket)
    buckets = raw_buckets.filter(
        (F.size("ids") >= 2) & (F.size("ids") <= max_bucket)
    )
    pair_expr = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + 2, F.size(F.col("ids"))),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    candidates = (
        buckets.select(F.explode(pair_expr).alias("p"))
        .select("p.id_a", "p.id_b")
        .distinct()
    )
    fps_a = fps.select(F.col("id").alias("id_a"), F.col("fps").alias("fps_a"))
    fps_b = fps.select(F.col("id").alias("id_b"), F.col("fps").alias("fps_b"))
    j = jaccard(F.col("fps_a"), F.col("fps_b"))
    out = (
        candidates.join(fps_a, on="id_a").join(fps_b, on="id_b")
        .select("id_a", "id_b", F.round(j, 4).alias("winnow_jaccard"))
        .filter(F.col("winnow_jaccard") >= threshold)
    )
    # per-call handle on the returned frame (thread-safe; see
    # _minhash_rep_pairs)
    out._bucket_stats = stats
    out._persisted_inputs = [fps]  # release via unpersist_cached
    return out


def word_ngrams(col: Column | str, n: int = 5) -> Column:
    """Normalized word ``n``-grams of the text as ``array<string>``.

    Normalization (lowercase, strip non-alphanumerics, whitespace split) is
    the standard eval-decontamination canonicalization: punctuation and
    casing differences between a benchmark prompt and a crawled page must
    not hide an overlap. Documents shorter than ``n`` words yield an empty
    array. Pure Catalyst (regex + slice/transform) — no UDF.
    """
    c = F.col(col) if isinstance(col, str) else col
    toks = F.filter(
        F.split(F.trim(F.regexp_replace(F.lower(c), r"[^a-z0-9\s]", " ")), r"\s+"),
        lambda t: t != F.lit(""),
    )

    def grams(ts: Column) -> Column:
        return F.when(
            F.size(ts) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(ts) - F.lit(n - 1)),
                lambda i: F.array_join(F.slice(ts, i, n), " "),
            ),
        ).otherwise(F.array().cast("array<string>"))

    # bind the token array once (see text._bind): referencing `toks` three
    # times would re-run the regex split per reference
    return F.element_at(F.transform(F.array(toks), grams), 1)


def ngram_overlap(
    train: DataFrame,
    test: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    test_text_col: str | None = None,
) -> DataFrame:
    """Per-train-document count of distinct word ``n``-grams shared with
    ``test`` — the GPT-3-style n-gram eval-overlap check (exact
    ``decontaminate`` catches verbatim copies; this catches partial
    inclusions, e.g. a benchmark question quoted inside a page).

    Returns ``(id_col, n_matched)`` for contaminated documents only
    (``n_matched >= 1``).

    Scale shape: the test side (eval benchmarks — MBs, not TBs) collapses
    to a distinct gram set and broadcasts; the train side explodes its
    per-document ``array_distinct`` gram array map-side, hits the broadcast
    hash join with no shuffle of train data, and the only exchange is the
    partial-aggregated per-doc match count (rows ≈ contaminated docs, not
    grams). Train text itself never shuffles.
    """
    test_grams = (
        test.select(
            F.explode(word_ngrams(test_text_col or text_col, n)).alias("__gram")
        )
        .distinct()
    )
    train_grams = train.select(
        id_col,
        F.explode(F.array_distinct(word_ngrams(text_col, n))).alias("__gram"),
    )
    return (
        train_grams.join(F.broadcast(test_grams), on="__gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_matched"))
    )


def ngram_decontaminate(
    train: DataFrame,
    test: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    min_matches: int = 1,
    test_text_col: str | None = None,
) -> DataFrame:
    """Drop from ``train`` every document sharing at least ``min_matches``
    distinct word ``n``-grams with ``test``. The partial-overlap
    complement of :func:`decontaminate` (which is exact-normalized-text).

    ``min_matches`` trades recall for precision: 1 is the aggressive
    standard for eval decontamination; raise it when short boilerplate
    grams cause collateral drops.
    """
    flagged = ngram_overlap(train, test, id_col, text_col, n, test_text_col)
    if min_matches > 1:
        flagged = flagged.filter(F.col("n_matched") >= min_matches)
    return train.join(flagged.select(id_col), on=id_col, how="left_anti")


def positional_word_ngrams(col: Column | str, n: int = 5) -> Column:
    """Word ``n``-grams WITH their 1-based token position, as
    ``array<struct<pos:int, gram:string>>`` — same normalization as
    :func:`word_ngrams` (that one discards positions; span detection needs
    them). Documents shorter than ``n`` words yield an empty array. Pure
    Catalyst."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.filter(
        F.split(F.trim(F.regexp_replace(F.lower(c), r"[^a-z0-9\s]", " ")), r"\s+"),
        lambda t: t != F.lit(""),
    )

    def grams(ts: Column) -> Column:
        return F.when(
            F.size(ts) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(ts) - F.lit(n - 1)),
                lambda i: F.struct(
                    i.cast("int").alias("pos"),
                    F.array_join(F.slice(ts, i, n), " ").alias("gram"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<pos:int,gram:string>>"))

    return F.element_at(F.transform(F.array(toks), grams), 1)


def duplicated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    min_df: int = 2,
) -> DataFrame:
    """Exact duplicated-SPAN detection (the substring-level dedup of Lee et
    al., "Deduplicating Training Data Makes Language Models Better"):
    find every maximal token range of a document whose word ``n``-grams all
    occur in at least ``min_df`` distinct documents — boilerplate headers,
    license blocks, quoted passages that whole-document dedup (exact or
    MinHash) cannot see because the surrounding text differs.

    Returns ``(id_col, span_start, span_end, n_dup_grams)`` with 1-based
    inclusive token positions; overlapping/adjacent duplicated grams are
    merged into one span (gaps-and-islands over the gram positions).

    Scale shape: per-doc positional grams explode map-side and immediately
    collapse to ``(gram_hash, doc, pos)`` — the shuffle carries an 8-byte
    xxhash64, an id and an int, never gram text. Document frequency is one
    hash-aggregation; the hit join is linear (AQE broadcasts the dup-gram
    side when small); span merging is a per-document window (bounded
    partitions — documents, not the corpus). No pairwise anything: cost is
    linear in total tokens at any corpus size.
    """
    pg = df.select(
        F.col(id_col),
        F.explode(positional_word_ngrams(text_col, n)).alias("pg"),
    ).select(
        id_col,
        F.col("pg.pos").alias("pos"),
        F.xxhash64(F.col("pg.gram")).alias("gh"),
    )
    dup = (
        pg.groupBy("gh")
        .agg(F.countDistinct(F.col(id_col)).alias("docfreq"))
        .filter(F.col("docfreq") >= min_df)
        .select("gh")
    )
    hits = pg.join(dup, on="gh").select(id_col, "pos").distinct()

    from pyspark.sql import Window as W

    w = W.partitionBy(id_col).orderBy("pos")
    brk = F.when(F.col("pos") - F.lag("pos").over(w) > n, 1).otherwise(0)
    islands = hits.withColumn("brk", brk).withColumn("gid", F.sum("brk").over(w))
    return (
        islands.groupBy(id_col, "gid")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") + F.lit(n - 1)).cast("long").alias("span_end"),
            F.count(F.lit(1)).alias("n_dup_grams"),
        )
        .drop("gid")
    )


def strip_duplicated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    min_df: int = 2,
    out_col: str = "clean_text",
) -> DataFrame:
    """Remove every cross-document duplicated span (see
    :func:`duplicated_spans`) from each document, keeping the surrounding
    unique text — the *apply* half of substring-level dedup: boilerplate
    and quoted passages are cut while the document survives.

    Returns ``df``'s columns plus ``out_col`` (the normalized text with
    duplicated token ranges removed), ``n_tokens`` and ``n_tokens_kept``.
    Documents with no duplicated span keep all their tokens.

    Scale shape: :func:`duplicated_spans` (linear, hash-only shuffles)
    plus one aggregation of spans per doc (rows = spans, tiny) and one
    join back to the corpus on the id — the document text is touched only
    map-side, in the final per-row token filter.
    """
    spans = duplicated_spans(df, id_col, text_col, n, min_df)
    per_doc = spans.groupBy(id_col).agg(
        F.collect_list(
            F.struct(F.col("span_start").alias("s"), F.col("span_end").alias("e"))
        ).alias("__spans")
    )

    c = F.col(text_col)
    toks = F.filter(
        F.split(F.trim(F.regexp_replace(F.lower(c), r"[^a-z0-9\s]", " ")), r"\s+"),
        lambda t: t != F.lit(""),
    )
    empty_spans = F.array().cast("array<struct<s:bigint,e:bigint>>")

    out = df.join(per_doc, on=id_col, how="left").withColumn(
        "__spans", F.coalesce(F.col("__spans"), empty_spans)
    )
    kept = F.filter(
        toks,
        lambda t, i: ~F.exists(
            F.col("__spans"),
            lambda sp: (i + F.lit(1) >= sp["s"]) & (i + F.lit(1) <= sp["e"]),
        ),
    )
    return (
        out.withColumn("n_tokens", F.size(toks).cast("long"))
        .withColumn(out_col, F.array_join(kept, " "))
        .withColumn("n_tokens_kept", F.size(kept).cast("long"))
        .drop("__spans")
    )


def decontaminate_near(
    train: DataFrame,
    test: DataFrame,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    test_id_col: str | None = None,
    test_text_col: str | None = None,
    k: int = 8,
    window: int = 16,
    max_bucket: int = 10_000,
    assume_dups: bool | None = None,
) -> DataFrame:
    """NEAR-duplicate decontamination: remove from ``train`` every
    document whose winnow-Jaccard similarity to ANY ``test`` document
    reaches ``threshold`` — the near-copy leakage that exact-fingerprint
    decontamination (:func:`decontaminate`) misses, applied as a drop
    decision (the actionable sibling of ``split_leakage_report``).

    Shape: union both corpora with an origin flag (test ids are never
    emitted, so id collisions across corpora are fine — test rows get
    negated-offset ids internally), run the exact prefix-filtered winnow
    pair engine ONCE over the union, keep cross-origin pairs, anti-join
    their train side out. Same cost class as winnow_pairs on
    train+test; text never shuffles past the pair generator. Requires
    non-negative train ids (the origin flag lives in the sign)."""
    test_id_col = test_id_col or id_col
    test_text_col = test_text_col or text_col
    # internal ids: train >= 0 keeps its own id space; test ids map to
    # negatives (-(id)-1), so origin is recoverable from the sign and no
    # cross-corpus collision is possible
    tr = train.select(
        F.col(id_col).cast("long").alias("id"), F.col(text_col).alias("__t")
    )
    te = test.select(
        (-F.col(test_id_col).cast("long") - F.lit(1)).alias("id"),
        F.col(test_text_col).alias("__t"),
    )
    u = tr.unionByName(te)
    pairs = winnow_pairs(
        u, threshold=threshold, id_col="id", text_col="__t",
        k=k, window=window, max_bucket=max_bucket, assume_dups=assume_dups,
    ).select("id_a", "id_b")
    # cross-origin pairs: exactly one side negative
    cross = pairs.filter((F.col("id_a") < 0) != (F.col("id_b") < 0))
    dirty = cross.select(
        F.greatest("id_a", "id_b").alias("id")  # the non-negative train side
    ).distinct()
    return train.join(
        dirty, on=F.col(id_col).cast("long") == F.col("id"), how="left_anti"
    )


def decontaminate_bloom(
    train: DataFrame,
    test: DataFrame,
    text_col: str = "text",
    test_text_col: str | None = None,
    num_bits: int = 1 << 22,
    num_hashes: int = 7,
) -> DataFrame:
    """Exact decontamination (same result as :func:`decontaminate`) with a
    broadcast **Bloom-filter prefilter**: when the eval side is too big to
    broadcast as a digest set (multi-benchmark suites, contamination
    sweeps), its Bloom bitmap is ``num_bits/8`` bytes regardless of row
    count. Train rows whose digest misses the filter are provably clean
    (no false negatives) and never shuffle; only Bloom *candidates* (true
    overlaps + the ~``(1-e^{-kn/m})^k`` false-positive sliver) reach the
    exact digest anti-join that makes the final result exact.

    Bit positions use double hashing ``(h1 + i*h2) mod m`` over two
    fixed-seed xxhash64 digests computed JVM-side, so build and probe agree
    by construction; the probe is an Arrow-batched pandas UDF against the
    broadcast numpy bitmap.
    """
    import numpy as np

    norm_train = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    norm_test = F.regexp_replace(
        F.lower(F.trim(F.col(test_text_col or text_col))), r"\s+", " "
    )

    def hashed(df: DataFrame, norm: Column) -> DataFrame:
        return df.withColumn("__h1", F.xxhash64(norm)).withColumn(
            "__h2", F.xxhash64(norm, F.lit("bloom-salt"))
        )

    test_h = hashed(test, norm_test).select("__h1", "__h2")

    m, k = num_bits, num_hashes

    def _positions(h1: "np.ndarray", h2: "np.ndarray") -> "np.ndarray":
        # double hashing in uint64 (wrapping mul/add), then mod m
        pos = (
            h1[:, None].astype(np.uint64)
            + np.arange(k, dtype=np.uint64)[None, :] * h2[:, None].astype(np.uint64)
        ) % np.uint64(m)
        return pos.reshape(-1)

    def _partial_bloom(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bm = np.zeros(m // 8, dtype=np.uint8)
        seen = False
        for b in batches:
            if len(b):
                seen = True
                p = _positions(
                    b["__h1"].to_numpy(np.int64), b["__h2"].to_numpy(np.int64)
                )
                np.bitwise_or.at(bm, p >> 3, (1 << (p & 7)).astype(np.uint8))
        yield pd.DataFrame({"bits": [bm.tobytes()]} if seen else {"bits": []})

    def _or_combine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = None
        for b in batches:
            for buf in b["bits"]:
                arr = np.frombuffer(buf, dtype=np.uint8)
                acc = arr.copy() if acc is None else (acc | arr)
        yield pd.DataFrame({"bits": [acc.tobytes()]} if acc is not None else {"bits": []})

    # Executor-side tree OR of the per-partition partial bitmaps: the
    # driver receives exactly ONE m/8-byte bitmap regardless of eval-side
    # partition count. Collecting the partials directly would move
    # n_partitions x m/8 bytes through the driver (~5 GiB at 10k
    # partitions x 2^22 bits) for a 512 KiB result. The two repartition
    # levels are shuffle barriers on purpose — a narrow coalesce here
    # would propagate up and collapse the scan/hash parallelism to the
    # reduced slot count.
    parts = (
        test_h.mapInPandas(_partial_bloom, "bits binary")
        .repartition(64)
        .mapInPandas(_or_combine, "bits binary")
        .repartition(1)
        .mapInPandas(_or_combine, "bits binary")
        .collect()
    )
    if parts:
        bitmap = np.frombuffer(parts[0]["bits"], dtype=np.uint8).copy()
    else:
        bitmap = np.zeros(m // 8, dtype=np.uint8)
    assert len(parts) <= 1, f"tree OR must yield one bitmap, got {len(parts)}"
    bc = train.sparkSession.sparkContext.broadcast(bitmap.tobytes())

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("boolean")
    def might_contain(h1: pd.Series, h2: pd.Series) -> pd.Series:
        bm = np.frombuffer(bc.value, dtype=np.uint8)
        p = _positions(h1.to_numpy(np.int64), h2.to_numpy(np.int64)).reshape(-1, k)
        hit = ((bm[p >> 3] >> (p & 7)) & 1).astype(bool).all(axis=1)
        return pd.Series(hit)

    train_h = hashed(train, norm_train).withColumn(
        "__cand", might_contain(F.col("__h1"), F.col("__h2"))
    )
    clean_fast = train_h.filter(~F.col("__cand"))
    test_fps = test.select(
        fingerprint(test_text_col or text_col).alias("__fp")
    ).distinct()
    verified = (
        train_h.filter(F.col("__cand"))
        .withColumn("__fp", fingerprint(text_col))
        .join(test_fps, on="__fp", how="left_anti")
        .drop("__fp")
    )
    return clean_fast.unionByName(verified).drop("__h1", "__h2", "__cand")


def decontaminate(
    train: DataFrame,
    test: DataFrame,
    text_col: str = "text",
    test_text_col: str | None = None,
) -> DataFrame:
    """Remove from ``train`` every document whose normalized-text
    fingerprint appears in ``test`` — benchmark/eval decontamination, the
    cross-corpus twin of exact dedup.

    Scale shape: the anti-join ships 16-byte digests only (text never
    shuffles), and the distinct test-side fingerprint set is tiny relative
    to train, so AQE turns the anti-join into a broadcast — train is a
    single map-side pass. Near-dup decontamination (paraphrased leaks)
    composes the same way from ``minhash_lsh_pairs`` over the union.
    """
    from pyarrow_ops_spark.functions.text import fingerprint

    test_fps = (
        test.select(fingerprint(test_text_col or text_col).alias("__fp"))
        .distinct()
    )
    keyed = train.withColumn("__fp", fingerprint(text_col))
    return keyed.join(test_fps, on="__fp", how="left_anti").drop("__fp")


def build_dedup_index(
    df: DataFrame,
    path: str,
    text_col: str = "text",
    mode: str = "overwrite",
) -> None:
    """Persist the corpus's normalized-text fingerprint set as a parquet
    digest index — the durable state of INCREMENTAL dedup: build once
    over the existing corpus, then every new batch dedups against it
    (``dedup_against_index``) without rescanning history.

    The index is 16 bytes/distinct-document regardless of text width
    (billions of docs fit in tens of GB), partitioned like any parquet
    dataset; ``mode='append'`` extends it with a new batch's digests —
    duplicate digests in the index are harmless (the consumer anti-joins
    on a distinct build side)."""
    from pyarrow_ops_spark.functions.text import fingerprint

    df.select(fingerprint(text_col).alias("fp")).distinct().write.mode(
        mode
    ).parquet(path)


def dedup_against_index(
    df: DataFrame,
    path: str,
    text_col: str = "text",
) -> DataFrame:
    """Drop every document whose fingerprint is already in the digest
    index at ``path`` — the incremental-ingest step: new crawl batches
    check in against the historical corpus without touching it. Digest
    anti-join only (16-byte payload); a small-enough index broadcasts
    under AQE so the new batch never shuffles. Compose with
    ``build_dedup_index(mode='append')`` to enroll survivors — but
    PERSIST the survivor batch first (write it, or checkpoint): enrolling
    a still-lazy survivor plan re-evaluates it against the very index it
    is appending to (and Spark's file-listing cache makes the outcome
    timing-dependent); the ingest flow is dedup -> write -> enroll the
    written rows."""
    from pyarrow_ops_spark.functions.text import fingerprint

    spark = df.sparkSession
    # drop the shared FileStatusCache entry for the index path: a
    # build_dedup_index(mode='append') in this session otherwise leaves a
    # stale file listing and the new digests are silently invisible
    spark.catalog.refreshByPath(path)
    idx = spark.read.parquet(path).select("fp").distinct()
    keyed = df.withColumn("__fp", fingerprint(text_col))
    return keyed.join(
        idx, on=keyed["__fp"] == idx["fp"], how="anti"
    ).drop("__fp")


def contamination_score(
    train: DataFrame,
    test: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    test_text_col: "str | None" = None,
) -> DataFrame:
    """Per-train-document contamination REPORT: ``(id, n_grams,
    n_matched, score)`` for EVERY train document (score = matched /
    distinct grams, 0.0 when clean, rounded to 4) — the audit step a
    curation pipeline runs before deciding a drop threshold, where
    :func:`ngram_decontaminate` is the act-on-it step.

    Scale shape follows :func:`ngram_overlap`: the eval side collapses to
    a distinct broadcast gram set; train explodes its per-document
    ``array_distinct`` grams map-side into the broadcast join, and the
    only shuffled relation is the per-doc (total, matched) count pair —
    train text itself never moves. Documents too short to form one
    ``n``-gram report (0, 0, 0.0)."""
    test_grams = (
        test.select(
            F.explode(word_ngrams(test_text_col or text_col, n)).alias("__gram")
        )
        .distinct()
    )
    train_grams = train.select(
        id_col,
        F.explode_outer(F.array_distinct(word_ngrams(text_col, n))).alias(
            "__gram"
        ),
    )
    hit = F.when(F.col("__hit").isNotNull(), 1).otherwise(0)
    scored = (
        train_grams.join(
            F.broadcast(test_grams.withColumn("__hit", F.lit(1))),
            on="__gram",
            how="left",
        )
        .groupBy(id_col)
        .agg(
            F.sum(
                F.when(F.col("__gram").isNotNull(), 1).otherwise(0)
            ).cast("long").alias("n_grams"),
            F.sum(hit).cast("long").alias("n_matched"),
        )
    )
    return scored.select(
        id_col,
        "n_grams",
        "n_matched",
        F.round(
            F.when(F.col("n_grams") > 0,
                   F.col("n_matched") / F.col("n_grams")).otherwise(0.0),
            4,
        ).alias("score"),
    )
