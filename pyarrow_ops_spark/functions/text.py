"""Text-analysis operators for training-data pipelines (north-star surface).

All metrics are pure Catalyst column expressions — JVM-side, codegen-fused,
no Python in the hot path — so they run as a single map-only stage over any
corpus size. The reference has no text operators at all; this extends the
surface per BASELINE.json's north star.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword language
# heuristic. Deliberately minimal and deterministic.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "la", "de", "que", "los"],
}


def spread(df: DataFrame) -> DataFrame:
    """Spread a CPU-heavy map stage across cores. A small single-file scan
    arrives as ONE partition (or as byte-range splits of a single row
    group, only one of which yields rows), so every regex/hash in the map
    projection runs on one core; at real scale parquet row-group splits
    provide the parallelism for free, so this repartitions only when the
    optimizer's size estimate says the scan cannot saturate the cluster
    (< 64 MiB per core) — on a big input it is a no-op (no shuffle).

    Deliberately avoids ``df.rdd``: the DF->RDD conversion costs ~1 s of
    py4j/plan warmup on first use, raises on Spark Connect, and partition
    COUNT is the wrong signal anyway (byte-range splits of one row group
    count as partitions but carry no rows). Plan-stats probing failures
    (Connect, API drift) fall back to a no-op — under-parallelism on a
    tiny input is benign; an unconditional shuffle at 100 TB is not."""
    try:
        parallelism = df.sparkSession.sparkContext.defaultParallelism
        size = int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except Exception:
        return df
    if size >= parallelism * (64 << 20):
        return df
    # small-by-bytes but already wide: a many-small-files scan (e.g. 3000
    # files on a 2048-core cluster) has all the parallelism it needs — a
    # repartition would shuffle the whole text payload to buy nothing.
    # inputFiles() is a metadata listing (no job); non-scan plans return
    # [] and fall through to the repartition, which is the intent there.
    try:
        if len(df.inputFiles()) >= parallelism:
            return df
    except Exception:
        pass
    return df.repartition(parallelism)


def token_count(col: Column | str) -> Column:
    """Whitespace token count."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.split(F.trim(c), r"\s+"))


def bpe_ish_token_count(col: Column | str) -> Column:
    """BPE-flavored proxy: count word pieces + digits + punctuation runs.

    A deterministic regex segmentation (letter runs split every 4 chars is
    NOT done — just runs), standing in for a real tokenizer: words, numbers
    and punctuation each count as one token. ``regexp_count`` instead of
    ``size(regexp_extract_all(...))``: same non-overlapping scan, but no
    per-match string array is materialized just to be counted (~25% off
    this expression, the curation pipeline's hottest regex at sf10).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"))


def letter_count(col: Column | str) -> Column:
    """Number of ASCII-letter characters.

    Kept as ``length(regexp_replace(...))`` deliberately: a single-char
    ``regexp_count("[a-zA-Z]")`` measured ~2x SLOWER (one regex-engine
    match cycle per character vs one replace pass) — the opposite of the
    multi-char token patterns where regexp_count wins."""
    c = F.col(col) if isinstance(col, str) else col
    return F.length(F.regexp_replace(c, "[^a-zA-Z]", ""))


def nonspace_count(col: Column | str) -> Column:
    """Number of non-whitespace characters (see letter_count on why this
    is a replace, not a regexp_count)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.length(F.regexp_replace(c, r"\s+", ""))


def letter_ratio(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    # try_divide: empty text is 0/0 — NULL, not an ANSI-mode job abort
    return F.try_divide(letter_count(c), F.length(c))


def avg_word_length(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.try_divide(nonspace_count(c), token_count(c))


def quality_score(col: Column | str) -> Column:
    """Composite quality heuristic in [0, 1]: length credit (up to 64
    tokens), letter ratio, and closeness of mean word length to 5.

    The token count feeds both the length credit and the mean word
    length; ``_bind`` evaluates the split ONCE per row (Catalyst has no
    let-expression, and whole-stage codegen's subexpression elimination
    does not reach into the round/when tree reliably)."""
    c = F.col(col) if isinstance(col, str) else col

    def from_nt(nt: Column) -> Column:
        len_credit = F.least(nt / F.lit(64.0), F.lit(1.0))
        wl = F.try_divide(nonspace_count(c), nt)
        wl_credit = F.greatest(
            F.lit(0.0), F.lit(1.0) - F.abs(wl - F.lit(5.0)) / F.lit(5.0)
        )
        return F.round(
            0.4 * len_credit + 0.3 * letter_ratio(c) + 0.3 * wl_credit, 4
        )

    return _bind(token_count(c), from_nt)


def stopword_hits(col: Column | str, words: list[str]) -> Column:
    """Number of tokens that are in ``words`` (exact word matches)."""
    c = F.col(col) if isinstance(col, str) else col
    pattern = r"\b(" + "|".join(words) + r")\b"
    return F.regexp_count(c, F.lit(pattern))


def lang_guess(col: Column | str) -> Column:
    """Stopword-vote language heuristic: the language with the most
    stopword hits wins; ties and zero hits resolve to 'und' (undetermined).
    Deterministic; resolves ties in fixed language order."""
    c = F.col(col) if isinstance(col, str) else col
    scores = [(lang, stopword_hits(c, words)) for lang, words in sorted(STOPWORDS.items())]
    best = F.greatest(*[s for _, s in scores])
    # build from last to first so earlier languages win ties
    expr: Column = F.lit("und")
    for lang, score in reversed(scores):
        expr = F.when((score == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr


def fingerprint(col: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of the
    whitespace-normalized, lower-cased text (identical in any engine)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.regexp_replace(F.lower(F.trim(c)), r"\s+", " "))


def normalize_text(
    col: Column | str,
    *,
    lower: bool = True,
    strip_punct: bool = True,
    zero_digits: bool = False,
    collapse_whitespace: bool = True,
) -> Column:
    """CCNet-style canonical text form for aggressive near-exact dedup:
    lower-case, punctuation stripped to spaces, optionally digits zeroed
    (so '12 cats' and '34 cats' collapse), whitespace collapsed.

    Pure Catalyst ``regexp_replace`` chain — map-only, codegen-fused, no
    shuffle; at 100 TB it rides the scan for free. The regexes use only
    syntax shared by Java regex and RE2 so a DuckDB oracle (with the 'g'
    flag) produces byte-identical output. Accent folding is deliberately
    out of scope (no portable regex form); pair with a Pandas-UDF
    ``unicodedata`` pass if needed.

    Reference has no text ops (SURVEY §2.2); extension per BASELINE.json.
    """
    c = F.col(col) if isinstance(col, str) else col
    if lower:
        c = F.lower(c)
    if zero_digits:
        c = F.regexp_replace(c, r"[0-9]", "0")
    if strip_punct:
        # anything outside letters/digits/whitespace becomes a space so
        # punctuation splits words instead of gluing them together
        c = F.regexp_replace(c, r"[^a-z0-9A-Z\s]", " ")
    if collapse_whitespace:
        c = F.trim(F.regexp_replace(c, r"\s+", " "))
    return c


def _bind(col: Column, fn) -> Column:
    """Evaluate ``col`` once per row and hand the bound value to ``fn``.

    Catalyst has no let-expression: referencing an array-valued subtree N
    times inside a lambda re-evaluates it N times per row (O(len²) for the
    window loops below). A one-element ``transform`` evaluates it once and
    binds it to the lambda variable."""
    return F.element_at(F.transform(F.array(col), fn), 1)


def rolling_hashes(col: Column | str, k: int = 8, mod: int = 1_000_000_007) -> Column:
    """Rabin-Karp k-gram rolling hashes of the text as array<long>: position
    i holds hash(text[i..i+k)) = sum_j code(i+j)*31^j mod ``mod``.

    Pure Catalyst (nested HOFs, small codegen); modular arithmetic stays
    below 2^63 so the same formula runs unmodified in any 64-bit engine
    (the DuckDB oracle uses the identical expression). O(len·k) per
    document — the windowed-subtraction O(len) form needs stateful
    iteration that SQL lacks, and k is small. The text is exploded to a
    code-point array ONCE (split + transform); the window loop then works
    on array slices — per-character ``substr`` inside the nested loop
    measured ~100× slower (each access re-walked the string)."""
    c = F.col(col) if isinstance(col, str) else col
    codes = F.transform(F.split(c, ""), lambda ch: F.ascii(ch).cast("long"))
    return _bind(
        codes,
        lambda cs: F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(cs) - F.lit(k - 1), F.lit(1))),
            lambda i: F.aggregate(
                F.slice(cs, i, F.lit(k)),
                F.lit(0).cast("long"),
                lambda acc, x: (acc * 31 + x) % mod,
            ),
        ),
    )


def winnowed_fingerprints(
    col: Column | str, k: int = 8, window: int = 16, mod: int = 1_000_000_007
) -> Column:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD 2003): the
    distinct minima of each ``window`` consecutive k-gram rolling hashes,
    sorted. Guarantees any shared substring of length >= window+k-1 between
    two documents yields a shared fingerprint — the standard
    plagiarism/near-dup sketch, ~|text|/window values per document."""
    hashes = rolling_hashes(col, k, mod)

    def mins(h: Column) -> Column:
        n_h = F.size(h)
        n_windows = F.greatest(n_h - F.lit(window - 1), F.lit(1))
        return F.array_sort(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), n_windows),
                    lambda i: F.array_min(
                        F.slice(h, i, F.least(F.lit(window), n_h))
                    ),
                )
            )
        )

    return _bind(hashes, mins)


def winnowed_fingerprint_rows(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    window: int = 16,
    mod: int = 1_000_000_007,
) -> DataFrame:
    """Arrow-batched twin of ``winnowed_fingerprints``: (id, fps) rows via
    one numpy pass per batch — value-identical to the Catalyst expression
    (pytest-pinned, including ""->[0], null->[null], short-text and
    non-ASCII/astral cases; text is a CODEPOINT sequence — Spark's
    UTF8String-backed ``split("")`` + ``ascii`` yield one piece per
    codepoint, which is exactly Python ``ord``; ASCII text takes a
    zero-copy uint8 view).

    Why it exists: the expression form is a nested higher-order function
    (O(len·k) interpreted lambda evaluations per document — ~90M for the
    sf0.1 corpus), measured 2.9 s where this batch path runs the same
    math vectorized in ~0.1 s across cores. Same modality rule as
    ``similarity.banded_rows``: dense numeric inner loops go to Arrow
    batches; string hashing stays JVM-side. The rolling polynomial hash
    is computed as a sliding-window dot with 31^j mod p (congruent to the
    expression's stepwise acc*31+x mod p); terms stay < 2^60, no
    overflow. The closure is self-contained (numpy/pandas imports only)
    so the grading driver's plain session can pickle it by value."""
    kk, ww, md = int(k), int(window), int(mod)
    idc, txc = id_col, text_col

    def gen(batches):
        import numpy as _np
        import pandas as _pd
        from numpy.lib.stride_tricks import sliding_window_view as _svw

        pw_cache: dict = {}

        def _pw(n: int):
            if n not in pw_cache:
                pw_cache[n] = _np.array(
                    [pow(31, n - 1 - j, md) for j in range(n)], dtype=_np.int64
                )
            return pw_cache[n]

        def _fps(text):
            if text is None:
                return [None]
            if text.isascii():
                codes = _np.frombuffer(
                    text.encode(), dtype=_np.uint8
                ).astype(_np.int64)
            else:
                codes = _np.array([ord(c) for c in text], dtype=_np.int64)
            if codes.size == 0:
                # Catalyst: split('', '') -> [''], ascii('') = 0
                codes = _np.zeros(1, dtype=_np.int64)
            n = codes.size
            if n >= kk:
                h = (_svw(codes, kk) * _pw(kk)).sum(axis=1) % md
            else:
                h = _np.array([(codes * _pw(n)).sum() % md], dtype=_np.int64)
            mins = _svw(h, ww).min(axis=1) if h.size >= ww else h.min(keepdims=True)
            # numpy array, NOT .tolist(): Arrow converts an int64 ndarray
            # via the buffer protocol, where a list boxes every
            # fingerprint into a Python int first (r14: the boxing was
            # the visible cost of the whole kernel stage at sf0.1 —
            # ~3M objects per batch).
            return _np.unique(mins)

        for pdf in batches:
            yield _pd.DataFrame(
                {"id": pdf[idc], "fps": [_fps(t) for t in pdf[txc]]}
            )

    out = df.select(id_col, text_col).mapInPandas(gen, "id long, fps array<long>")
    return out.withColumnRenamed("id", id_col) if id_col != "id" else out


def cdc_chunk_rows(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    mask: int = 63,
    mod: int = 1_000_000_007,
    min_len: int | None = None,
    max_len: int | None = None,
) -> DataFrame:
    """Content-defined chunking (Rabin-Karp CDC): split each document at
    positions where the k-gram rolling hash ≡ 0 mod ``mask+1`` (expected
    chunk length ≈ mask+1 characters) and emit one row per chunk —
    (id, chunk_idx, chunk_digest, chunk_len). The storage/corpus dedup
    primitive: byte-insertions shift fixed-width blocks but CDC
    boundaries re-synchronize, so shared content yields shared chunk
    digests regardless of offset.

    Semantics (mirrored EXACTLY by the DuckDB oracle, same discipline as
    ``winnowed_fingerprint_rows``): 1-based position i ∈ [k, n] closes a
    chunk when hash(text[i-k+1..i]) % (mask+1) == 0 (the same
    ``(acc*31+code) % mod`` polynomial as ``rolling_hashes``); the final
    chunk always closes at n; texts shorter than k (including empty) are
    one whole-text chunk (subject to ``max_len`` forced cuts). Digest =
    md5 of the chunk's UTF-8 bytes; text is a CODEPOINT sequence (Spark
    ``split('')``/DuckDB ``substr`` agree).

    ``min_len``/``max_len`` are the production CDC clamps (FastCDC-style
    normalization): a hash boundary closer than ``min_len`` to the chunk
    start is skipped, and a chunk is FORCE-closed at ``max_len`` when no
    eligible boundary arrives — bounding the worst-case chunk-row blowup
    on pathological inputs (a text of all-identical characters is one
    giant boundary run without the clamps). Selection rule (mirrored
    EXACTLY by the DuckDB oracle's recursive CTE): from chunk start s,
    cut at the smallest hash boundary e with min_len <= e-s <= max_len,
    else at min(n, s+max_len); the final tail may be shorter than
    ``min_len``. ``None`` (both) preserves the unbounded semantics
    certified through r10.

    Arrow-batched mapInPandas (the modality rule: the rolling hash is a
    sliding-window dot, ~10-25× faster in numpy than interpreted HOF
    lambdas); the closure is self-contained so plain driver sessions can
    pickle it by value. One narrow output row per ~(mask+1) input chars;
    at 100 TB the chunk-digest relation shuffles 16-byte digests, never
    text."""
    kk, mm, md = int(k), int(mask) + 1, int(mod)
    if min_len is not None and max_len is not None and min_len > max_len:
        raise ValueError(f"min_len {min_len} > max_len {max_len}")
    lo = int(min_len) if min_len is not None else 1
    hi = int(max_len) if max_len is not None else None
    idc, txc = id_col, text_col

    def gen(batches):
        import hashlib as _hl

        import numpy as _np
        import pandas as _pd
        from numpy.lib.stride_tricks import sliding_window_view as _svw

        pw = _np.array(
            [pow(31, kk - 1 - j, md) for j in range(kk)], dtype=_np.int64
        )

        def _cut_ends(cands, n):
            # bounded boundary selection: smallest eligible hash boundary
            # per chunk, else a forced cut at start+max_len (see docstring)
            ends, start, i = [], 0, 0
            while True:
                cut = None
                while i < len(cands):
                    e = cands[i]
                    if e - start < lo:
                        i += 1  # too close — never eligible again
                        continue
                    if hi is not None and e - start > hi:
                        break  # stays a candidate for later chunks
                    cut = e
                    i += 1
                    break
                if cut is None:
                    cut = n if hi is None else min(n, start + hi)
                ends.append(cut)
                if cut >= n:
                    return ends
                start = cut

        def _chunks(text):
            if text is None:
                return []
            n = len(text)
            if text.isascii():
                codes = _np.frombuffer(
                    text.encode(), dtype=_np.uint8
                ).astype(_np.int64)
            else:
                codes = _np.array([ord(c) for c in text], dtype=_np.int64)
            if n >= kk:
                h = (_svw(codes, kk) * pw).sum(axis=1) % md
                # window starting at 0-based j ends at 1-based i = j + k
                cands = (_np.nonzero(h % mm == 0)[0] + kk).tolist()
            else:
                cands = []
            if lo > 1 or hi is not None:
                ends = _cut_ends(cands, n)
            else:
                ends = cands
                if not ends or ends[-1] != n:
                    ends = ends + [n]
            out, start = [], 0
            for idx, e in enumerate(ends):
                chunk = text[start:e]
                out.append(
                    (idx, _hl.md5(chunk.encode()).hexdigest(), e - start)
                )
                start = e
            return out

        for pdf in batches:
            ids, idxs, digs, lens = [], [], [], []
            for id_, t in zip(pdf[idc], pdf[txc]):
                for idx, dig, ln in _chunks(t):
                    ids.append(id_)
                    idxs.append(idx)
                    digs.append(dig)
                    lens.append(ln)
            yield _pd.DataFrame(
                {
                    "id": _pd.Series(ids, dtype="int64"),
                    "chunk_idx": _pd.Series(idxs, dtype="int32"),
                    "chunk_digest": _pd.Series(digs, dtype="object"),
                    "chunk_len": _pd.Series(lens, dtype="int32"),
                }
            )

    out = df.select(id_col, text_col).mapInPandas(
        gen, "id long, chunk_idx int, chunk_digest string, chunk_len int"
    )
    return out.withColumnRenamed("id", id_col) if id_col != "id" else out


def text_stats(df: DataFrame, col: str = "text") -> DataFrame:
    """One row per document with the full metric set.

    Two-step projection: the regex-backed base counts (tokens, letters,
    non-space chars) are computed ONCE in an inner Project and every
    derived metric references the alias. Catalyst's CollapseProject leaves
    multi-referenced non-cheap aliases in place, so each regex runs once
    per row — the flat single-projection form re-evaluated ``token_count``
    3× and ``letter_ratio`` 2× per row (the whole cost of this map stage
    is the regexes). Input is ``spread`` across cores first."""
    c = F.col(col)
    base = spread(df).select(
        *df.columns,
        token_count(col).alias("__n_tokens"),
        F.length(c).alias("__n_chars"),
        letter_count(c).alias("__n_letters"),
        nonspace_count(c).alias("__n_nonspace"),
    )
    lr = F.col("__n_letters") / F.col("__n_chars")
    wl = F.col("__n_nonspace") / F.col("__n_tokens")
    len_credit = F.least(F.col("__n_tokens") / F.lit(64.0), F.lit(1.0))
    wl_credit = F.greatest(
        F.lit(0.0), F.lit(1.0) - F.abs(wl - F.lit(5.0)) / F.lit(5.0)
    )
    return base.select(
        *df.columns,
        F.col("__n_tokens").alias("n_tokens"),
        F.col("__n_chars").alias("n_chars_actual"),
        F.round(lr, 4).alias("letter_ratio"),
        F.round(wl, 4).alias("avg_word_len"),
        F.round(0.4 * len_credit + 0.3 * lr + 0.3 * wl_credit, 4).alias("quality"),
        fingerprint(col).alias("fp"),
    )


def quality_filter(
    df: DataFrame,
    col: str = "text",
    min_tokens: int = 16,
    max_tokens: int = 100_000,
    min_avg_word_len: float = 2.0,
    max_avg_word_len: float = 12.0,
    min_letter_ratio: float = 0.5,
) -> DataFrame:
    """Gopher-style rule filter: append ``keep`` (boolean) and
    ``reject_reason`` (first failing rule name, NULL when kept) to each
    document. Rules, in precedence order:

    * ``too_short`` / ``too_long`` — whitespace token count outside
      [min_tokens, max_tokens]
    * ``word_length`` — mean non-space chars per token outside
      [min_avg_word_len, max_avg_word_len] (symbol soup / agglutinated
      junk)
    * ``letter_ratio`` — alphabetic chars / total chars below
      ``min_letter_ratio`` (markup, tables, binary-ish residue)

    Keeping rejected rows with their reason (instead of filtering) is
    deliberate: pipelines audit per-reason reject rates before committing
    to a drop, and the filter composes as ``.filter("keep")``.

    Scale shape: map-only — the three regex-backed base counts are
    computed once per row in an inner Project (the text_stats pattern)
    and every rule references the alias; fuses into the scan stage.
    """
    c = F.col(col)
    base = spread(df).select(
        *df.columns,
        token_count(col).alias("__n_tokens"),
        F.length(c).alias("__n_chars"),
        letter_count(c).alias("__n_letters"),
        nonspace_count(c).alias("__n_nonspace"),
    )
    nt = F.col("__n_tokens")
    wl = F.col("__n_nonspace") / nt
    lr = F.col("__n_letters") / F.col("__n_chars")
    reason = (
        F.when(nt < min_tokens, F.lit("too_short"))
        .when(nt > max_tokens, F.lit("too_long"))
        .when(
            (wl < min_avg_word_len) | (wl > max_avg_word_len),
            F.lit("word_length"),
        )
        .when(lr < min_letter_ratio, F.lit("letter_ratio"))
        .otherwise(F.lit(None).cast("string"))
    )
    return base.select(
        *df.columns,
        reason.isNull().alias("keep"),
        reason.alias("reject_reason"),
    )


def lang_guess_table(
    df: DataFrame, col: str = "text", out: str = "guessed"
) -> DataFrame:
    """DataFrame form of ``lang_guess``: the per-language stopword hit
    counts are computed once each in an inner Project (4 regexes/row);
    the vote CASE references the aliases. The column form evaluates every
    score twice (once in ``greatest``, once per WHEN)."""
    langs = sorted(STOPWORDS)
    base = spread(df).select(
        *df.columns,
        *[
            stopword_hits(col, STOPWORDS[lang]).alias(f"__s_{lang}")
            for lang in langs
        ],
    )
    best = F.greatest(*[F.col(f"__s_{lang}") for lang in langs])
    expr: Column = F.lit("und")
    for lang in reversed(langs):
        expr = F.when(
            (F.col(f"__s_{lang}") == best) & (best > 0), F.lit(lang)
        ).otherwise(expr)
    return base.select(*df.columns, expr.alias(out))


def vocab_topk(df: DataFrame, col: str = "text", k: int = 100) -> DataFrame:
    """Corpus vocabulary: top-k tokens by frequency, ties broken by token —
    the vocab-building pass of a tokenizer-training pipeline. Tokens are
    the BPE-ish pieces (letter runs / digit runs / single punctuation) of
    the lowercased text.

    Plan shape: explode -> partial-count -> final count -> TakeOrdered.
    The shuffle carries (token, partial_count) — bounded by vocabulary
    size per partition, not corpus token count (map-side combine), and
    top-k is a TakeOrderedAndProject, never a full sort."""
    toks = df.select(
        F.explode(
            F.regexp_extract_all(
                F.lower(F.col(col)), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), 0
            )
        ).alias("token")
    )
    return (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "token")
        .limit(k)
    )


def bigram_pmi_topk(
    df: DataFrame, col: str = "text", k: int = 20, min_count: int = 5
) -> DataFrame:
    """Top-k collocations by pointwise mutual information: adjacent token
    pairs whose co-occurrence beats chance — the phrase-mining pass that
    feeds tokenizer merges and stop-phrase lists.

    PMI = ln( (c_ab / N) / ((c_a / N) * (c_b / N)) ) computed in the
    collapsed form ln(c_ab * N / (c_a * c_b)) so both engines evaluate
    one identical expression; ``min_count`` drops the unstable low-count
    tail (a pair seen twice has meaningless PMI). Ranking is on the
    ROUNDED pmi (4 dp) with the bigram string as tiebreak, so the top-k
    cut is engine-deterministic.

    Plan shape: one explode with a posexplode-free adjacent zip
    (arrays_zip of the token array with itself shifted), map-side-combined
    bigram and unigram counts (both bounded by vocabulary, not corpus
    size), broadcast of the single-row total, TakeOrderedAndProject."""
    toks = F.expr(f"regexp_extract_all(lower({col}), '[a-z0-9]+', 0)")
    pairs = F.filter(
        F.zip_with(
            toks,
            F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(1))),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        ),
        lambda s: s["w2"].isNotNull(),
    )
    bi = (
        df.select(F.explode(pairs).alias("p"))
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c_ab"))
    )
    uni = (
        df.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = uni.agg(F.sum("c").cast("double").alias("n"))
    # no broadcast hint on the unigram joins: vocabulary is uncapped at
    # corpus scale (AQE broadcasts when it fits); the single-row total is
    # always broadcast
    scored = (
        bi.filter(F.col("c_ab") >= min_count)
        .join(uni.select(F.col("w").alias("w1"), F.col("c").alias("c_a")), on="w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("c").alias("c_b")), on="w2")
        .crossJoin(F.broadcast(tot))
        .select(
            F.concat_ws(" ", "w1", "w2").alias("bigram"),
            F.col("c_ab"),
            F.round(
                F.log(F.col("c_ab") * F.col("n") / (F.col("c_a") * F.col("c_b"))),
                4,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.col("pmi").desc(), "bigram").limit(k)


def scrub_pii(col: Column | str) -> Column:
    """Redact common PII-shaped spans: emails -> <EMAIL>, URLs -> <URL>,
    long digit runs (phones, ids, card numbers) -> <NUM>. Pure Catalyst
    regexp_replace chain — map-only, fuses into the scan, no shuffle.
    The patterns are deliberately engine-portable (no lookarounds): the
    same three regexes run verbatim in the DuckDB oracle (global-replace
    flag there; Spark replaces globally by default)."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>")
    c = F.regexp_replace(c, r"https?://[^\s]+", "<URL>")
    c = F.regexp_replace(c, r"[0-9][0-9 \-]{6,}[0-9]", "<NUM>")
    return c


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_words: int = 32,
    overlap: int = 8,
) -> DataFrame:
    """Split documents into overlapping fixed-size word chunks — the context-
    window packing precursor of a training pipeline (long doc -> N training
    examples of <= ``chunk_words`` tokens, consecutive chunks sharing
    ``overlap`` words).

    Plan shape: split -> sequence of chunk starts -> posexplode -> slice.
    Map-only modulo the explode (no shuffle, no Python): a 100 TB corpus
    chunks in one generate-stage that fuses with the scan, and output size
    is input size * (1 + overlap/(chunk-overlap)) — linear, bounded.

    The final chunk of a document may be shorter than ``chunk_words``;
    every word lands in at least one chunk. No chunk is fully redundant:
    a start inside the previous chunk's trailing ``overlap`` would emit a
    chunk entirely contained in its predecessor (duplicated training
    data), so the start sequence is capped at ``n_words - overlap - 1``.
    Empty / whitespace-only / null documents emit no chunks at all.
    """
    if not 0 <= overlap < chunk_words:
        raise ValueError(f"need 0 <= overlap < chunk_words, got {overlap}/{chunk_words}")
    step = chunk_words - overlap
    # split('') yields [''] — map blank text to an empty word array so
    # empty docs produce zero chunks instead of one phantom '' chunk
    words = F.when(
        F.length(F.trim(F.col(text_col))) == 0, F.array().cast("array<string>")
    ).otherwise(F.split(F.trim(F.col(text_col)), r"\s+"))
    # a start s emits only already-seen words iff s >= n_words - overlap,
    # so cap the last start at n_words - overlap - 1 (floor 0 keeps the
    # first chunk of short docs)
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.size(words) - F.lit(overlap + 1), F.lit(0)),
        F.lit(step),
    )
    exploded = df.select(
        F.col(id_col), words.alias("__words"), F.posexplode(starts).alias("chunk_id", "__start")
    ).filter(F.size(F.col("__words")) > 0)
    piece = F.slice(F.col("__words"), F.col("__start") + F.lit(1), chunk_words)
    return exploded.select(
        id_col,
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.array_join(piece, " ").alias("chunk_text"),
        F.size(piece).cast("long").alias("n_tokens"),
    )


def repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style within-document repetition metrics: duplicate-word
    fraction, top-word fraction, and top-bigram fraction per document —
    the signals used to drop boilerplate/spam before training.

    Plan shape: two explode -> (doc, gram) count -> per-doc roll-ups,
    joined on ``id_col``. Both aggregations get map-side partial combine,
    so the shuffle carries (doc, distinct-gram, count) — bounded by
    distinct grams per doc, not corpus tokens. No Python, no windows over
    unordered rows (bigrams come from the word array, preserving order).
    """
    words_arr = F.split(F.trim(F.col(text_col)), r"\s+")

    words = df.select(F.col(id_col), F.explode(words_arr).alias("w"))
    wc = words.groupBy(id_col, "w").agg(F.count(F.lit(1)).alias("c"))
    ws = wc.groupBy(id_col).agg(
        F.sum("c").cast("long").alias("n_words"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        F.max("c").alias("__top_w"),
    )

    bigrams = F.when(
        F.size(words_arr) >= 2,
        _bind(
            words_arr,
            lambda ws_: F.transform(
                F.sequence(F.lit(1), F.size(ws_) - F.lit(1), F.lit(1)),
                lambda i: F.concat_ws(
                    " ", F.element_at(ws_, i), F.element_at(ws_, i + F.lit(1))
                ),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    bg = df.select(F.col(id_col), F.explode(bigrams).alias("b"))
    bc = bg.groupBy(id_col, "b").agg(F.count(F.lit(1)).alias("c"))
    bs = bc.groupBy(id_col).agg(
        F.sum("c").alias("__n_bi"), F.max("c").alias("__top_b")
    )

    out = ws.join(bs, on=id_col, how="left")
    return out.select(
        id_col,
        "n_words",
        "n_distinct",
        F.round((F.col("n_words") - F.col("n_distinct")) / F.col("n_words"), 4).alias(
            "dup_word_frac"
        ),
        F.round(F.col("__top_w") / F.col("n_words"), 4).alias("top_word_frac"),
        F.round(
            F.coalesce(F.col("__top_b") / F.col("__n_bi"), F.lit(0.0)), 4
        ).alias("top_bigram_frac"),
    )


def source_report(
    df: DataFrame,
    *,
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-source curation dashboard: the first thing a data team looks at
    before setting mixture weights. One row per source with volume,
    exact-duplicate mass, and mean length/quality.

    Output: (source, n_docs, n_distinct_texts, dup_rate, total_chars,
    avg_tokens, avg_quality). Duplicate detection uses ``fingerprint``
    (md5 of whitespace-normalized lower-cased text) so 'the same page
    crawled twice' counts as one distinct text.

    Scale shape: ONE hash aggregate keyed by source — every metric is
    map-side combinable (count_distinct carries 16-byte digests, not
    text), so the shuffle is |sources| × digests, independent of corpus
    row width. No joins, no window, no collect."""
    t = F.col(text_col)
    return (
        df.groupBy(F.col(source_col).alias("source"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct(fingerprint(text_col)).alias("n_distinct_texts"),
            F.sum(F.length(t)).alias("total_chars"),
            F.round(F.avg(token_count(text_col)), 4).alias("avg_tokens"),
            F.round(F.avg(quality_score(text_col)), 4).alias("avg_quality"),
        )
        .withColumn(
            "dup_rate",
            F.round(1.0 - F.col("n_distinct_texts") / F.col("n_docs"), 4),
        )
        .select(
            "source", "n_docs", "n_distinct_texts", "dup_rate",
            "total_chars", "avg_tokens", "avg_quality",
        )
    )


def char_entropy(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document Shannon character entropy in bits — the cheap stand-in
    for the compression-ratio quality signal (Gopher): near-zero entropy
    flags degenerate repetition ('aaaa…'), unusually high entropy flags
    binary junk/mojibake; clean prose sits in a narrow band (~4-4.5 bits
    for English).

    Output: (id_col, n_chars, entropy). Plan: explode to (doc, char)
    counts (map-side combined, shuffle keyed by doc+char — linear in
    corpus size, 1-char payload), then one per-doc aggregate folds
    -Σ p·log2 p. Empty documents drop (entropy undefined)."""
    ch = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), "")).alias("__ch")
    ).filter(F.col("__ch") != "")  # split("") yields [""] — drop, not count
    counts = ch.groupBy(id_col, "__ch").agg(F.count(F.lit(1)).alias("__k"))
    # H = log2(n) - (Σ k·log2 k)/n — one aggregate, no second pass for n
    n = F.sum("__k")
    klogk = F.sum(F.col("__k") * F.log(F.col("__k")))
    ln2 = F.log(F.lit(2.0))
    return counts.groupBy(id_col).agg(
        n.alias("n_chars"),
        F.round((F.log(n) - klogk / n) / ln2, 4).alias("entropy"),
    )


def strip_repeated_lines(
    df: DataFrame,
    text_col: str = "text",
    out: str | None = None,
    sep: str = "\n",
) -> DataFrame:
    """C4-style INTRA-document line dedup: split each document on ``sep``,
    keep each line's FIRST occurrence in order, and reassemble — the
    fix for boilerplate that repeats inside a single page (cookie
    banners, nav text, chorus lines), where cross-document dedup never
    looks.

    Pure Catalyst map-only chain (``split`` -> ``array_distinct`` ->
    ``array_join``): ``array_distinct`` preserves first-occurrence order
    by contract, so the result is deterministic and an engine-neutral
    oracle can replay it with a min-position window. Rides the scan at
    100 TB — no shuffle, no state.

    ``sep`` is a literal separator (regex-escaped before the split)."""
    import re as _re

    c = F.col(text_col)
    deduped = F.array_join(
        F.array_distinct(F.split(c, _re.escape(sep))), sep
    )
    return df.withColumn(out or text_col, deduped)
