"""Property-based tests (SURVEY §5.3): algebraic invariants every operator
must satisfy on arbitrary small inputs, including nulls and duplicate keys.

Example counts are small (each example runs real Spark jobs); the value is
in hypothesis finding edge-case key/null combinations, not in volume.
"""

from __future__ import annotations

from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from pyarrow_ops_spark import (
    TableCleaner,
    drop_duplicates,
    filters,
    groupby,
    join,
)

KEYS = st.one_of(st.none(), st.integers(min_value=-3, max_value=3))
VALS = st.integers(min_value=-100, max_value=100)
ROWS = st.lists(st.tuples(KEYS, VALS), min_size=0, max_size=12)

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k int, v int") if rows else (
        spark.createDataFrame([], "k int, v int")
    )


@SETTINGS
@given(rows=ROWS)
def test_dedup_subset_and_unique_keys(spark, rows):
    df = _df(spark, rows)
    out = drop_duplicates(df, on=["k"], keep="first", order_by=["v"]).collect()
    src = Counter((r[0], r[1]) for r in rows)
    assert all(src[(r.k, r.v)] > 0 for r in out)  # dedup ⊆ input
    keys = [r.k for r in out]
    assert len(keys) == len(set(keys))  # one row per key
    assert set(keys) == {r[0] for r in rows}  # every key survives


@SETTINGS
@given(left=ROWS, right=ROWS)
def test_join_rowcount_is_sum_of_products(spark, left, right):
    l, r = _df(spark, left), _df(spark, right)
    out = join(l, r.withColumnRenamed("v", "w"), on=["k"]).count()
    lc = Counter(row[0] for row in left)
    rc = Counter(row[0] for row in right)
    # reference semantics: None matches None (eqNullSafe default)
    assert out == sum(lc[k] * rc.get(k, 0) for k in lc)


@SETTINGS
@given(rows=ROWS, cut=st.integers(min_value=-100, max_value=100))
def test_filter_conjunction_is_intersection(spark, rows, cut):
    df = _df(spark, rows)
    a = {(r.k, r.v) for r in filters(df, ("v", ">=", cut)).collect()}
    b = {(r.k, r.v) for r in filters(df, ("v", "<", cut + 50)).collect()}
    both = filters(df, [("v", ">=", cut), ("v", "<", cut + 50)]).collect()
    got = {(r.k, r.v) for r in both}
    assert got == (a & b)
    assert len(both) == sum(1 for k, v in rows if cut <= v < cut + 50)


@SETTINGS
@given(rows=st.lists(st.tuples(st.integers(0, 100), VALS), min_size=1,
                     max_size=10, unique_by=lambda t: t[0]))
def test_groupby_singleton_groups_identity(spark, rows):
    # unique keys → every group has one row → sum == the row's value
    df = _df(spark, rows)
    out = {r.k: r.v for r in groupby(df, "k").sum(["v"]).collect()}
    assert out == {k: v for k, v in rows}


@SETTINGS
@given(rows=st.lists(st.tuples(st.sampled_from(["a", "b", "c"]),
                               st.one_of(st.none(), st.floats(-10, 10))),
                     min_size=2, max_size=10))
def test_cleaner_roundtrip_determinism(spark, rows):
    df = spark.createDataFrame(rows, "cat string, x double")
    c1 = TableCleaner()
    c1.register_numeric("x", impute="mean")
    c1.register_label("cat")
    try:
        X1 = c1.clean_table(df).drop("__rid__").collect()
    except Exception:
        # all-null numeric column has no stats — reference also fails there
        assert all(v is None for _, v in rows)
        return
    c2 = TableCleaner().from_dict(c1.to_dict())
    X2 = c2.clean_table(df).drop("__rid__").collect()
    assert sorted(map(tuple, X1)) == sorted(map(tuple, X2))


# ---------------------------------------------------------------------------
# round-4 operator laws: merge idempotence, normalization idempotence,
# mixture normalization
# ---------------------------------------------------------------------------

MERGE_ROWS = st.lists(
    st.tuples(st.integers(min_value=0, max_value=6), VALS),
    min_size=0, max_size=8,
)


@given(base=MERGE_ROWS, upd=MERGE_ROWS)
@SETTINGS
def test_upsert_idempotent_and_key_unique(spark, base, upd):
    from pyarrow_ops_spark.operators.diff import upsert

    b = spark.createDataFrame(
        [(k, v) for k, v in {k: v for k, v in base}.items()], "k long, v long"
    ) if base else spark.createDataFrame([], "k long, v long")
    u = spark.createDataFrame(
        [(k, v) for k, v in {k: v for k, v in upd}.items()], "k long, v long"
    ) if upd else spark.createDataFrame([], "k long, v long")
    once = upsert(b, u, ["k"])
    twice = upsert(once, u, ["k"])
    r1 = sorted(map(tuple, once.collect()))
    r2 = sorted(map(tuple, twice.collect()))
    assert r1 == r2  # applying the same delta again changes nothing
    ks = [r[0] for r in r1]
    assert len(ks) == len(set(ks))  # keys stay unique
    # every update key carries the update's value
    uvals = {k: v for k, v in {k: v for k, v in upd}.items()}
    got = dict(r1)
    for k, v in uvals.items():
        assert got[k] == v


TEXTS = st.lists(
    st.text(
        alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd", "Po", "Zs")),
        max_size=24,
    ),
    min_size=1, max_size=6,
)


@given(texts=TEXTS)
@SETTINGS
def test_normalize_text_idempotent(spark, texts):
    from pyarrow_ops_spark.functions.text import normalize_text

    df = spark.createDataFrame([(t,) for t in texts], "t string")
    out = df.select(
        normalize_text("t", zero_digits=True).alias("once")
    ).select(
        "once", normalize_text("once", zero_digits=True).alias("twice")
    ).collect()
    for r in out:
        assert r.once == r.twice  # canonical form is a fixed point


@given(rows=st.lists(st.sampled_from(["a", "b", "c"]), min_size=1, max_size=20),
       alpha=st.sampled_from([0.0, 0.3, 0.5, 1.0]))
@SETTINGS
def test_mixture_weights_normalized(spark, rows, alpha):
    from pyarrow_ops_spark.operators.sample import mixture_weights

    df = spark.createDataFrame([(s,) for s in rows], "source string")
    out = mixture_weights(df, "source", alpha).collect()
    assert abs(sum(r.weight for r in out) - 1.0) < 1e-2  # 4dp rounding slack
    assert sum(r.n_rows for r in out) == len(rows)
    for r in out:
        assert r.weight > 0


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),   # key (few -> collisions)
            st.integers(min_value=0, max_value=50),  # order value
        ),
        min_size=1,
        max_size=30,
    ),
    n=st.sampled_from([1, 2, 5]),
)
@SETTINGS
def test_salted_first_n_property_equals_plain(spark, rows, n):
    """The two-stage salted first-N is row-identical to the single-window
    plan on arbitrary key/order distributions (ties broken by a unique
    second order column, so both plans are deterministic)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from pyarrow_ops_spark.operators.skew import salted_first_n_per_key

    data = [(k, o, i) for i, (k, o) in enumerate(rows)]
    df = spark.createDataFrame(data, "k long, o long, uid long")
    w = Window.partitionBy("k").orderBy("o", "uid")
    plain = sorted(
        (r.k, r.o, r.uid)
        for r in df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
        .collect()
    )
    salted = sorted(
        (r.k, r.o, r.uid)
        for r in salted_first_n_per_key(df, ["k"], ["o", "uid"], n).collect()
    )
    assert salted == plain


@given(
    vals=st.lists(
        st.integers(min_value=-1000, max_value=1000), min_size=4, max_size=40
    ),
    k=st.sampled_from([2, 4]),
)
@SETTINGS
def test_histogram_equidepth_property(spark, vals, k):
    """Counts sum to the input size, buckets tile the range in order, and
    each bucket's lo <= hi."""
    from pyarrow_ops_spark.functions.stats import histogram_equidepth

    df = spark.createDataFrame([(float(v),) for v in vals], "v double")
    rows = sorted(
        histogram_equidepth(df, "v", n_buckets=k).collect(),
        key=lambda r: r.bucket,
    )
    assert sum(r.n_rows for r in rows) == len(vals)
    for r in rows:
        assert r.lo <= r.hi
    for a, b in zip(rows, rows[1:]):
        assert a.hi <= b.lo


@given(
    rows=st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(min_value=0, max_value=5)),
            st.one_of(st.none(), st.sampled_from(["a", "b", "c"])),
        ),
        min_size=1,
        max_size=25,
    )
)
@SETTINGS
def test_profile_table_property(spark, rows):
    """Null counts and exact distincts match Python ground truth."""
    from pyarrow_ops_spark.functions.stats import profile_table

    df = spark.createDataFrame(rows, "x long, s string")
    prof = {r.column: r for r in profile_table(df, exact_distinct=True).collect()}
    xs = [r[0] for r in rows]
    ss = [r[1] for r in rows]
    assert prof["x"].n_rows == len(rows)
    assert prof["x"].n_nulls == sum(1 for v in xs if v is None)
    assert prof["x"].n_distinct == len({v for v in xs if v is not None})
    assert prof["s"].n_nulls == sum(1 for v in ss if v is None)
    assert prof["s"].n_distinct == len({v for v in ss if v is not None})


INTERVALS = st.lists(
    st.tuples(
        st.integers(min_value=-50, max_value=50),   # lo
        st.integers(min_value=0, max_value=40),     # length (hi = lo + len)
    ),
    min_size=0,
    max_size=8,
)
POINTS = st.lists(st.integers(min_value=-60, max_value=60), min_size=0, max_size=12)
WIDTHS = st.integers(min_value=1, max_value=17)


@SETTINGS
@given(points=POINTS, intervals=INTERVALS, width=WIDTHS)
def test_range_join_bucketed_equals_predicate(spark, points, intervals, width):
    """The grid-bucket rewrite must emit EXACTLY the pairs satisfying
    lo <= v < hi for arbitrary points, intervals (including empty,
    zero-length, and overlapping), and bucket widths (including widths
    that don't divide interval edges)."""
    from pyarrow_ops_spark.operators.join import range_join_bucketed

    left = (
        spark.createDataFrame([(i, v) for i, v in enumerate(points)], "lid int, v long")
        if points else spark.createDataFrame([], "lid int, v long")
    )
    ivals = [(i, lo, lo + ln) for i, (lo, ln) in enumerate(intervals)]
    right = (
        spark.createDataFrame(ivals, "rid int, lo long, hi long")
        if ivals else spark.createDataFrame([], "rid int, lo long, hi long")
    )
    got = {
        (r.lid, r.rid)
        for r in range_join_bucketed(left, right, "v", "lo", "hi", width).collect()
    }
    want = {
        (i, j)
        for i, v in enumerate(points)
        for j, lo, hi in ivals
        if lo <= v < hi
    }
    assert got == want


# --- round-9 Arrow-batch twins: property equality with the expressions ---

TEXTS = st.lists(
    st.one_of(
        st.none(),
        st.text(max_size=40),  # arbitrary unicode incl. astral planes
        st.text(alphabet="ab \n", max_size=60),  # high-overlap ASCII
    ),
    min_size=1,
    max_size=8,
)


@SETTINGS
@given(texts=TEXTS)
def test_winnow_batch_fingerprints_equal_expression(spark, texts):
    """The Arrow-batched winnow fingerprint path is value-identical to
    the Catalyst expression on ARBITRARY text (nulls, empties, unicode,
    astral codepoints, whitespace runs)."""
    from pyarrow_ops_spark.functions.text import (
        winnowed_fingerprint_rows,
        winnowed_fingerprints,
    )

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    expr = {
        r.doc_id: r.f
        for r in df.select(
            "doc_id", winnowed_fingerprints("text", k=4, window=3).alias("f")
        ).collect()
    }
    batch = {
        r.doc_id: r.fps
        for r in winnowed_fingerprint_rows(df, k=4, window=3).collect()
    }
    assert expr == batch


HASH_ARRS = st.lists(
    st.one_of(
        st.none(),
        st.lists(
            st.integers(min_value=-(2**63), max_value=2**63 - 1), max_size=12
        ),
    ),
    min_size=1,
    max_size=6,
)


@SETTINGS
@given(arrs=HASH_ARRS)
def test_minhash_band_rows_set_semantics(spark, arrs):
    """Band signatures are a pure function of the shingle-hash SET:
    permuting or duplicating the array must not change any signature
    (minhash is a min over the set), and null/empty arrays emit no rows."""
    import random

    from pyarrow_ops_spark.functions.dedup import _minhash_band_rows

    rng = random.Random(0)
    base = list(enumerate(arrs))
    permuted = [
        (i, (lambda a: rng.sample(a, len(a)) + rng.sample(a, len(a)))(a)
         if a else a)
        for i, a in base
    ]
    df1 = spark.createDataFrame(base, "id long, hashes array<long>")
    df2 = spark.createDataFrame(permuted, "id long, hashes array<long>")
    s1 = {(r.id, r.band): r.sig for r in _minhash_band_rows(df1, 20, 4).collect()}
    s2 = {(r.id, r.band): r.sig for r in _minhash_band_rows(df2, 20, 4).collect()}
    assert s1 == s2
    expected_ids = {i for i, a in base if a}
    assert {i for i, _ in s1} == expected_ids


# --- drift-monitor family invariants (round 12) ------------------------------

DRIFT_VALS = st.lists(
    st.integers(min_value=-50, max_value=50), min_size=1, max_size=15
)


def _vdf(spark, vals):
    return spark.createDataFrame([(float(v),) for v in vals], "v double")


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(a=DRIFT_VALS, b=DRIFT_VALS)
def test_ks_drift_bounded_and_zero_on_identity(spark, a, b):
    from pyarrow_ops_spark.functions.stats import ks_drift

    same = ks_drift(_vdf(spark, a), _vdf(spark, a), "v", bins=16).collect()
    assert len(same) == 1 and same[0]["ks_d"] == 0.0
    row = ks_drift(_vdf(spark, a), _vdf(spark, b), "v", bins=16).collect()[0]
    assert 0.0 <= row["ks_d"] <= 1.0
    assert row["n_a"] == len(a) and row["n_b"] == len(b)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(a=DRIFT_VALS, b=DRIFT_VALS)
def test_psi_drift_terms_nonnegative_zero_on_identity(spark, a, b):
    # (p_a - p_b) * ln(p_a / p_b) has matching signs in both factors, so
    # every bin term is >= 0 for ANY pair of slices; identity -> all 0
    from pyarrow_ops_spark.functions.stats import psi_drift

    same = psi_drift(_vdf(spark, a), _vdf(spark, a), "v", bins=4).collect()
    assert same and all(r["psi_bin"] == 0.0 for r in same)
    rows = psi_drift(_vdf(spark, a), _vdf(spark, b), "v", bins=4).collect()
    assert rows and all(r["psi_bin"] >= 0.0 for r in rows)
    assert sum(r["c_a"] for r in rows) == len(a)
    assert sum(r["c_b"] for r in rows) == len(b)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(a=DRIFT_VALS, b=DRIFT_VALS)
def test_chi2_drift_nonnegative_zero_on_identity(spark, a, b):
    from pyarrow_ops_spark.functions.stats import chi2_drift

    # map ints onto a handful of category labels
    cat = lambda v: f"c{abs(v) % 4}"  # noqa: E731
    adf = spark.createDataFrame([(cat(v),) for v in a], "lang string")
    bdf = spark.createDataFrame([(cat(v),) for v in b], "lang string")
    same = chi2_drift(adf, adf, "lang").collect()[0]
    assert same["chi2"] == 0.0
    row = chi2_drift(adf, bdf, "lang").collect()[0]
    assert row["chi2"] >= 0.0
    assert row["n_a"] == len(a) and row["n_b"] == len(b)
    assert 1 <= row["n_categories"] <= 4


def test_minhash_doc_rows_matches_reference_path(spark):
    """r15 (judge ask #3): pin the fused ``_minhash_doc_rows`` kernel
    against the retained reference path on pair/jaccard-relevant output.
    Two halves of the r14 rewrite are pinned separately:

    1. BANDING: the fused kernel's ``sigs`` must be bit-identical to
       feeding its own ``hashes`` through the reference
       ``_minhash_band_rows`` kernel (same splitmix64 arithmetic).
    2. GRAM HASHING: Jaccard over the fused kernel's distinct HASH sets
       must equal exact Jaccard over distinct STRING gram sets
       (char_shingles -> array_distinct) for every document pair — i.e.
       the 64-bit gram-hash family is collision-free on this corpus and
       the codepoint windows match char_shingles' substr windows
       (including the shorter-than-n whole-text gram).
    """
    from itertools import combinations

    from pyspark.sql import functions as F

    from pyarrow_ops_spark.functions.dedup import (
        _minhash_band_rows,
        _minhash_doc_rows,
        char_shingles,
    )

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumped over the lazy dog",  # near-dup
        "pack my box with five dozen liquor jugs",
        "pack my box with five dozen liquor jugs",       # exact dup
        "ab",                                            # shorter than n
        "",                                              # empty
        "naïve café — unicode ≠ ascii ✓",                # non-ascii
        "aaaaaaaaaaaaaaaa",                              # degenerate repeats
    ]
    n, num_hashes, bands = 3, 20, 4
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    doc = {
        r.doc_id: (list(r.hashes), list(r.sigs))
        for r in _minhash_doc_rows(
            df, "doc_id", "text", n, num_hashes, bands
        ).collect()
    }
    assert set(doc) == set(range(len(texts)))  # no null texts dropped here

    # 1. banding arithmetic == reference kernel over the same hash sets
    hashed = spark.createDataFrame(
        [(i, doc[i][0]) for i in doc], "id long, hashes array<long>"
    )
    ref_sigs = {}
    for r in _minhash_band_rows(hashed, num_hashes, bands).collect():
        ref_sigs.setdefault(r.id, {})[r.band] = r.sig
    for i in doc:
        assert doc[i][1] == [ref_sigs[i][b] for b in range(bands)], (
            f"doc {i}: fused sigs diverge from _minhash_band_rows"
        )

    # 2. hash-set Jaccard == string-gram-set Jaccard for every pair
    grams = {
        r.doc_id: set(r.g)
        for r in df.select(
            "doc_id", F.array_distinct(char_shingles("text", n)).alias("g")
        ).collect()
    }
    hsets = {i: set(doc[i][0]) for i in doc}
    for i in doc:
        assert len(hsets[i]) == len(grams[i]), (
            f"doc {i}: gram-hash collision or window mismatch "
            f"({len(hsets[i])} hashes vs {len(grams[i])} grams)"
        )
    for a, b in combinations(sorted(doc), 2):
        inter_g = len(grams[a] & grams[b])
        union_g = len(grams[a] | grams[b])
        inter_h = len(hsets[a] & hsets[b])
        union_h = len(hsets[a] | hsets[b])
        jg = inter_g / union_g if union_g else None
        jh = inter_h / union_h if union_h else None
        assert jg == jh, f"pair ({a},{b}): hash jaccard {jh} != gram {jg}"
