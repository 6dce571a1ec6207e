"""Text analysis for training-data pipelines over the ``documents`` table:
language-ID, quality scoring, token counting, fingerprinting.

All hot-path logic is JVM-side expressions (split/regexp/aggregate) — no
Python per row — so each operator is a single scan that scales linearly to
100 TB of documents.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WS = r"\s+"


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization of trimmed text."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), WS)


def token_count(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.when(F.length(F.trim(c)) == 0, F.lit(0)).otherwise(F.size(tokens(c)))


def bpe_ish_token_count(col: Column | str) -> Column:
    """BPE-flavored token estimate: word pieces + digits + punctuation
    counted separately (a cheap deterministic proxy for a real tokenizer —
    words longer than 4 chars count one extra piece per 4 chars)."""
    c = F.col(col) if isinstance(col, str) else col
    words = token_count(c)
    # extra pieces for long words: total alnum chars / 4 beyond first piece
    alnum_chars = F.length(F.regexp_replace(c, r"[^\p{L}\p{N}]", ""))
    punct = F.length(F.regexp_replace(c, r"[\p{L}\p{N}\s]", ""))
    return (words + (alnum_chars / F.lit(4)).cast("long") + punct).cast("long")


def char_count(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.length(c)


#: tiny per-language stopword lists for the n-gram/stopword language-ID
#: heuristic. Deterministic and dependency-free; a real pipeline swaps in
#: fastText — the *plumbing* (scored argmax over expression columns) stays.
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "zu"],
    "fr": ["le", "la", "et", "les", "des", "est", "un", "une"],
    "es": ["el", "la", "de", "que", "y", "los", "es", "una"],
    "zh": ["的", "是", "了", "在", "我", "有", "和", "不"],
}


def _stopword_hits_toks(ltoks: Column, words: list[str]) -> Column:
    """Stopword hits over an ALREADY lowercase-tokenized array — callers
    that score several languages share one tokenization (r16: the
    higher-order filter is CodegenFallback, so an inline ``split`` child
    re-evaluates per filter per row)."""
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(ltoks, lambda t: F.array_contains(arr, t)))


def _stopword_hits(col: Column, words: list[str]) -> Column:
    return _stopword_hits_toks(tokens(F.lower(col)), words)


def lang_scores(col: Column | str) -> dict[str, Column]:
    c = F.col(col) if isinstance(col, str) else col
    return {lang: _stopword_hits(c, words) for lang, words in LANG_STOPWORDS.items()}


def lang_id(col: Column | str, default: str = "unknown") -> Column:
    """argmax over language scores via greatest-of-structs — ties broken by
    language name (ascending) deterministically; all-zero scores →
    ``default``."""
    scores = lang_scores(col)
    # struct(score, reverse-alphabetical tiebreak string) — greatest picks
    # max score, then max of the reversed name = min alphabetical name.
    structs = [
        F.struct(
            s.alias("score"),
            F.lit("".join(chr(255 - ord(ch)) for ch in lang)).alias("revname"),
            F.lit(lang).alias("lang"),
        )
        for lang, s in scores.items()
    ]
    best = F.greatest(*structs)
    return F.when(best.getField("score") > 0, best.getField("lang")).otherwise(
        F.lit(default)
    )


def quality_features(col: Column | str) -> dict[str, Column]:
    """Deterministic quality-signal features: length, mean word length,
    punctuation ratio, stopword ratio, uppercase ratio, digit ratio."""
    c = F.col(col) if isinstance(col, str) else col
    n_chars = F.length(c).cast("double")
    n_tokens = token_count(c).cast("double")
    punct = F.length(F.regexp_replace(c, r"[^.,;:!?'\"()\-]", "")).cast("double")
    digits = F.length(F.regexp_replace(c, r"[^0-9]", "")).cast("double")
    uppers = F.length(F.regexp_replace(c, r"[^A-Z]", "")).cast("double")
    en_stop = _stopword_hits(c, LANG_STOPWORDS["en"]).cast("double")
    safe = F.when(n_chars > 0, n_chars).otherwise(F.lit(1.0))
    safe_t = F.when(n_tokens > 0, n_tokens).otherwise(F.lit(1.0))
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "mean_word_len": n_chars / safe_t,
        "punct_ratio": punct / safe,
        "digit_ratio": digits / safe,
        "upper_ratio": uppers / safe,
        "stopword_ratio": en_stop / safe_t,
    }


def quality_score(col: Column | str) -> Column:
    """Composite [0,1] quality score from the features — monotone in
    token count (saturating), penalized by punct/digit excess. The exact
    weights are a policy, not a truth; the shape (bounded, deterministic,
    single-pass expressions) is the engine contract."""
    f = quality_features(col)
    len_term = F.least(f["n_tokens"] / F.lit(64.0), F.lit(1.0))
    punct_pen = F.greatest(F.lit(0.0), F.lit(1.0) - f["punct_ratio"] * 4)
    digit_pen = F.greatest(F.lit(0.0), F.lit(1.0) - f["digit_ratio"] * 4)
    stop_term = F.least(f["stopword_ratio"] * 4, F.lit(1.0))
    return (
        len_term * F.lit(0.4)
        + punct_pen * F.lit(0.2)
        + digit_pen * F.lit(0.2)
        + stop_term * F.lit(0.2)
    )


def normalize_text(col: Column | str) -> Column:
    """Canonical form for dedup: lowercase, collapse whitespace, strip."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), WS, " "))


def fingerprint_md5(col: Column | str) -> Column:
    """Content fingerprint = md5 of normalized text (cross-engine
    reproducible)."""
    return F.md5(normalize_text(col))


def rolling_hash_fingerprint(col: Column | str, base: int = 257, mod: int = 1_000_000_007) -> Column:
    """Polynomial rolling hash of the normalized text, computed JVM-side by
    folding over the character array — a document fingerprint that is cheap,
    order-sensitive, and identical on any engine that implements the same
    fold."""
    c = normalize_text(col)
    chars = F.split(c, "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * base + F.ascii(ch)) % mod,
    )


def ngrams_of_tokens(toks: Column, n: int) -> Column:
    """Word n-grams from an already-tokenized array column.

    Built by zipping ``n`` shifted slices of the token array
    (``zip_with(slice(toks,1,m), slice(toks,2,m), concat)`` …) instead of
    materializing a fresh sub-array per gram
    (``transform(idx, i -> concat_ws(slice(toks, i+1, n)))``): higher-order
    functions run interpreted, and the per-gram slice allocation made the
    old form ~9x slower (measured 3.3 s -> 0.4 s for 5k docs at sf0.1).
    Docs shorter than ``n`` tokens degrade to one whole-text pseudo-gram
    (callers that need strict n-grams guard on token count)."""
    cnt = F.size(toks)
    m = cnt - n + 1
    arr = F.slice(toks, 1, m)
    for k in range(1, n):
        arr = F.zip_with(arr, F.slice(toks, k + 1, m), lambda a, b: F.concat_ws(" ", a, b))
    return F.when(cnt >= n, arr).otherwise(F.array(F.concat_ws(" ", toks)))


def word_ngrams(col: Column | str, n: int = 3) -> Column:
    """Array of word n-grams (shingles) — building block for Jaccard/MinHash
    dedup. JVM-side zip of shifted token-array slices; no UDF."""
    return ngrams_of_tokens(tokens(col), n)


def char_ngrams(col: Column | str, n: int = 5) -> Column:
    c = normalize_text(col)
    ln = F.length(c)
    idx = F.sequence(F.lit(1), F.greatest(ln - n + 1, F.lit(1)))
    return F.when(ln >= n, F.transform(idx, lambda i: F.substring(c, i, n))).otherwise(
        F.array(c)
    )


def chunk_tokens(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_tokens: int = 16,
    overlap: int = 4,
) -> DataFrame:
    """Split each document into overlapping token-window chunks — the
    context-window segmentation step of a training/RAG pipeline
    (HF-tokenizer ``return_overflowing_tokens``-style: fixed stride =
    max_tokens − overlap, last chunk may be short, a doc shorter than one
    window is one chunk).

    Output: one row per (doc, chunk): ``chunk_id`` (0-based),
    ``n_chunk_tokens``, ``chunk_text``.

    100 TB shape: tokenize once, generate chunk starts as an in-row
    sequence, ``posexplode`` — all narrow (zero shuffles); chunk count
    per row is ceil((n−overlap)/stride), bounded by doc length, so task
    memory stays a constant factor of input rows."""
    if not 0 <= overlap < max_tokens:
        raise ValueError("need 0 <= overlap < max_tokens")
    stride = max_tokens - overlap
    c = F.col(text_col)
    base = df.where(F.length(F.trim(c)) > 0).select(
        F.col(id_col), tokens(c).alias("__toks")
    )
    n = F.size("__toks")
    starts = F.sequence(
        F.lit(0), F.greatest(n - overlap - 1, F.lit(0)), F.lit(stride)
    )
    ex = base.select(
        id_col, "__toks", F.posexplode(starts).alias("chunk_id", "__start")
    )
    chunk = F.slice("__toks", F.col("__start") + 1, max_tokens)
    return ex.select(
        F.col(id_col),
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.size(chunk).cast("long").alias("n_chunk_tokens"),
        F.concat_ws(" ", chunk).alias("chunk_text"),
    )


def vocab_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 50,
    lowercase: bool = True,
    min_count: int = 1,
) -> DataFrame:
    """Corpus vocabulary: top-``k`` tokens by term frequency, with document
    frequency — the seed statistics for a BPE-style tokenizer vocabulary
    and for IDF weighting.

    100 TB shape: explode(whitespace tokens) → one grouped aggregation on
    the token. ``count(*)`` partial-aggregates map-side, so hot tokens
    ("the") collapse before the shuffle; the exact ``countDistinct(doc)``
    makes Catalyst plan a two-stage (token, doc) → (token) aggregation —
    also partial, also skew-safe (a token's doc set is spread over input
    partitions). Top-k is ``orderBy().limit(k)`` → TakeOrderedAndProject:
    each task keeps a k-row heap, no global sort materializes. Ties are
    impossible in the (tf DESC, token ASC) order — token is unique per
    group — so the k rows are deterministic in any engine."""
    c = F.col(text_col)
    if lowercase:
        c = F.lower(c)
    toks = df.where(F.length(F.trim(F.col(text_col))) > 0).select(
        F.col(id_col).alias("__doc"), F.explode(tokens(c)).alias("token")
    ).where(F.col("token") != "")
    agg = toks.groupBy("token").agg(
        F.count("*").alias("tf"), F.countDistinct("__doc").alias("df")
    )
    if min_count > 1:
        agg = agg.where(F.col("tf") >= min_count)
    return agg.orderBy(F.col("tf").desc(), F.col("token").asc()).limit(k)


def _top_run(sorted_arr: Column) -> Column:
    """(value, count) of the most frequent element of a SORTED string
    array, as a struct — computed by a single JVM fold (no explode, no
    shuffle): walk the array counting runs; strict ``>`` keeps the FIRST
    (= lexicographically smallest) value on count ties, matching a
    ``count DESC, value ASC`` SQL argmax."""
    init = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best_run"),
        F.lit("").alias("best"),
    )

    def step(acc, x):
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1).cast("long"))
        better = run > acc["best_run"]
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.when(better, run).otherwise(acc["best_run"]).alias("best_run"),
            F.when(better, x).otherwise(acc["best"]).alias("best"),
        )

    return F.aggregate(
        sorted_arr,
        init,
        step,
        lambda acc: F.struct(acc["best"].alias("value"), acc["best_run"].alias("count")),
    )


def repetition_profile(
    df: DataFrame, id_col: str, text_col: str, keep_cols: "Sequence[str]" = ()
) -> DataFrame:
    """Gopher-style repetition signals per document (Rae et al. 2021,
    "Scaling Language Models", table A1 — the repetition-removal rules a
    training-data pipeline applies before dedup):

    - ``dup_word_frac``    — fraction of token occurrences that repeat an
      earlier token: (n_tokens − n_distinct_tokens) / n_tokens.
    - ``dup_word_char_frac`` — same, weighted by token length (the
      character mass carried by repeated occurrences).
    - ``top_bigram`` / ``top_bigram_char_frac`` — the most frequent word
      2-gram and the fraction of characters it covers
      (count × len(gram) / n_chars, Gopher's definition — may exceed 1
      for degenerate texts because occurrences overlap).
    - ``top_trigram_char_frac`` — same for 3-grams.
    - ``passes_gopher`` — the composite keep/drop flag with Gopher's
      published thresholds (top-2-gram ≤ 0.20, top-3-gram ≤ 0.18), plus a
      dup-word bound standing in for the line-level rules (this corpus
      has no newlines).

    100 TB shape: ONE scan, zero shuffles — every signal is a JVM array
    expression (array_sort + fold for the per-doc n-gram mode instead of
    an explode/groupBy, so corpus-sized gram lists never hit a shuffle);
    flags compare ROUNDED values so the cut is reproducible cross-engine.
    The expensive pieces (tokenize, distinct, gram folds) are STAGED into
    their own projections so each is evaluated once per row — Catalyst's
    CollapseProject inlines only cheap or once-used expressions, and
    higher-order functions run interpreted, so an inline reference is a
    re-execution (measured 16 s -> 1 s on the sf0.1 battery arm).

    ``keep_cols`` carries extra source columns through the staged
    projections, so a pipeline can filter on ``passes_gopher`` inline —
    one narrow scan, no join back to the source.
    """
    keep = [k for k in keep_cols if k != id_col]
    c = F.col(text_col)
    toks, dis = F.col("__toks"), F.col("__dis")
    staged = (
        df.where(F.length(F.trim(c)) > 0)
        .select(
            F.col(id_col),
            *keep,
            tokens(F.lower(c)).alias("__toks"),
            F.length(normalize_text(c)).cast("double").alias("__nchars"),
        )
        .select(
            id_col,
            *keep,
            "__nchars",
            "__toks",
            F.array_distinct(toks).alias("__dis"),
            _top_run(F.array_sort(ngrams_of_tokens(toks, 2))).alias("__t2"),
            _top_run(F.array_sort(ngrams_of_tokens(toks, 3))).alias("__t3"),
        )
        .select(
            id_col,
            *keep,
            "__nchars",
            "__t2",
            "__t3",
            F.size(toks).cast("double").alias("__n"),
            F.size(dis).cast("double").alias("__nd"),
            F.aggregate(toks, F.lit(0).cast("long"), lambda a, x: a + F.length(x))
            .cast("double")
            .alias("__tc"),
            F.aggregate(dis, F.lit(0).cast("long"), lambda a, x: a + F.length(x))
            .cast("double")
            .alias("__dc"),
        )
    )
    n_tok, n_chars = F.col("__n"), F.col("__nchars")
    top2, top3 = F.col("__t2"), F.col("__t3")
    out = staged.select(
        F.col(id_col),
        *keep,
        F.round((n_tok - F.col("__nd")) / n_tok, 6).alias("dup_word_frac"),
        F.round((F.col("__tc") - F.col("__dc")) / F.col("__tc"), 6).alias(
            "dup_word_char_frac"
        ),
        F.when(n_tok >= 2, top2["value"]).alias("top_bigram"),
        F.round(
            F.when(
                n_tok >= 2,
                top2["count"].cast("double") * F.length(top2["value"]) / n_chars,
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("top_bigram_char_frac"),
        F.round(
            F.when(
                n_tok >= 3,
                top3["count"].cast("double") * F.length(top3["value"]) / n_chars,
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("top_trigram_char_frac"),
    )
    return out.withColumn(
        "passes_gopher",
        (F.col("top_bigram_char_frac") <= 0.20)
        & (F.col("top_trigram_char_frac") <= 0.18)
        & (F.col("dup_word_frac") <= 0.80),
    )


def gopher_filter(
    df: DataFrame, id_col: str, text_col: str, keep_cols: "Sequence[str]" = ()
) -> DataFrame:
    """Keep only rows passing the Gopher repetition thresholds
    (repetition_profile's ``passes_gopher``), returning ``id_col`` +
    ``keep_cols``.

    The filter predicate also references a nondeterministic fence column
    (``monotonically_increasing_id() >= 0``, always true): without it,
    Catalyst's predicate pushdown SUBSTITUTES the flag's whole expression
    tree through every staged projection into a pre-projection Filter —
    re-executing the gram sorts and folds (measured 0.99 s → 4.6 s on the
    sf0.1 corpus; fenced: 1.25 s). The fence must be referenced by the
    predicate, or column pruning deletes it and the pushdown returns.

    CALLER WARNING — the fence is a pushdown BARRIER for everything
    downstream: a nondeterministic predicate stops Catalyst from moving
    ANY later filter below this point, so a cheap scan-pushable predicate
    (lang == 'en', length bounds, quality gates) composed AFTER
    gopher_filter will NOT reach the parquet scan as a PushedFilter.
    Order caller-pushable predicates BEFORE the gopher stage — which is
    also cheaper outright, since the gram folds then run only on
    surviving rows (corpus_build_pipeline does this). A plan test
    (tests/test_plan_shapes.py) watches for the Catalyst behavior change
    that would retire the fence."""
    rp = repetition_profile(df, id_col, text_col, keep_cols=keep_cols)
    kept = (
        rp.withColumn("__fence", F.monotonically_increasing_id())
        .where(F.col("passes_gopher") & (F.col("__fence") >= 0))
    )
    return kept.select(id_col, *[k for k in keep_cols if k != id_col])


#: cross-engine PII patterns — a dialect subset that parses and matches
#: identically under Java regex (Spark) and RE2-ish (DuckDB): literal
#: classes, bounded repetition, no lookaround/backrefs.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?[0-9]{1,3}[- ][0-9]{3}[- ][0-9]{3,4}[- ][0-9]{4}",
    "ipv4": r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
    "ssn": r"[0-9]{3}-[0-9]{2}-[0-9]{4}",
}


def pii_counts(col: Column | str, patterns: dict[str, str] | None = None) -> dict[str, Column]:
    """Per-row match counts for each PII pattern — ``regexp_count`` is a
    JVM expression, one scan, no Python."""
    c = F.col(col) if isinstance(col, str) else col
    pats = patterns or PII_PATTERNS
    return {name: F.regexp_count(c, F.lit(p)) for name, p in pats.items()}


def pii_redact(col: Column | str, patterns: dict[str, str] | None = None) -> Column:
    """Replace every PII match with ``<NAME>`` tags, applied in sorted
    pattern-name order (deterministic composition — e.g. ssn would also
    match inside phone-shaped strings, so application order is part of
    the contract)."""
    c = F.col(col) if isinstance(col, str) else col
    pats = patterns or PII_PATTERNS
    for name in sorted(pats):
        c = F.regexp_replace(c, pats[name], f"<{name.upper()}>")
    return c


def text_profile(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One row per document: token stats + quality + language guess +
    fingerprint. Single scan.

    Shaped as staged projections sharing the expensive per-row
    intermediates (r16): the lowered token array feeds SIX interpreted
    higher-order filters (five language scores + the en stopword
    ratio), and the token/regex counts feed several ratios — inlined,
    each consumer re-evaluated its own ``split``/``regexp_replace``
    per row because higher-order functions are CodegenFallback (no
    codegen subexpression elimination across that boundary). Multi-
    referenced non-cheap aliases survive CollapseProject, so each
    intermediate computes once per row. Every output expression is the
    same arithmetic over the same values as the single-projection form
    — results are bit-identical (oracle hash unchanged)."""
    c = F.col(text_col)
    base = df.select(
        F.col(id_col),
        tokens(F.lower(c)).alias("__ltoks"),
        F.length(c).cast("double").alias("__nc"),
        token_count(c).cast("double").alias("__nt"),
        F.length(F.regexp_replace(c, r"[^.,;:!?'\"()\-]", ""))
        .cast("double").alias("__punct"),
        F.length(F.regexp_replace(c, r"[^0-9]", ""))
        .cast("double").alias("__digits"),
        fingerprint_md5(c).alias("fingerprint"),
    )
    stage = base.select(
        F.col(id_col),
        "__nc", "__nt", "__punct", "__digits", "fingerprint",
        *[
            _stopword_hits_toks(F.col("__ltoks"), words).alias(f"__sc_{lang}")
            for lang, words in LANG_STOPWORDS.items()
        ],
    )
    safe = F.when(F.col("__nc") > 0, F.col("__nc")).otherwise(F.lit(1.0))
    safe_t = F.when(F.col("__nt") > 0, F.col("__nt")).otherwise(F.lit(1.0))
    punct_ratio = F.col("__punct") / safe
    digit_ratio = F.col("__digits") / safe
    stop_ratio = F.col("__sc_en").cast("double") / safe_t
    len_term = F.least(F.col("__nt") / F.lit(64.0), F.lit(1.0))
    punct_pen = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio * 4)
    digit_pen = F.greatest(F.lit(0.0), F.lit(1.0) - digit_ratio * 4)
    stop_term = F.least(stop_ratio * 4, F.lit(1.0))
    score = (
        len_term * F.lit(0.4)
        + punct_pen * F.lit(0.2)
        + digit_pen * F.lit(0.2)
        + stop_term * F.lit(0.2)
    )
    structs = [
        F.struct(
            F.col(f"__sc_{lang}").alias("score"),
            F.lit("".join(chr(255 - ord(ch)) for ch in lang)).alias("revname"),
            F.lit(lang).alias("lang"),
        )
        for lang in LANG_STOPWORDS
    ]
    best = F.greatest(*structs)
    return stage.select(
        F.col(id_col),
        F.col("__nc").cast("long").alias("n_chars"),
        F.col("__nt").cast("long").alias("n_tokens"),
        F.round(F.col("__nc") / safe_t, 6).alias("mean_word_len"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(score, 6).alias("quality_score"),
        F.when(best.getField("score") > 0, best.getField("lang"))
        .otherwise(F.lit("unknown")).alias("lang_guess"),
        F.col("fingerprint"),
    )


def bm25_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: "list[str]",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 6,
) -> DataFrame:
    """Okapi BM25 document ranking for a term query — the retrieval-
    scoring primitive a training-data pipeline uses for quality-targeted
    subcorpus selection (and the classic lexical-search baseline).

    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·|d|/avgdl)),
    idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)).

    Scale shape: ONE corpus scan tokenizes (lowercase, whitespace — the
    vocab_topk convention); the explode is filtered to the QUERY TERMS
    immediately, so every aggregate downstream is query-sized, not
    corpus-sized: per-(doc, term) tf (one shuffle over matching tokens),
    term df (tiny, broadcast back), corpus N/avgdl (1-row broadcast
    cross). Top-k orders by the ROUNDED score with an id tiebreak —
    TakeOrderedAndProject per-task heaps, no global sort — and rounding
    first makes the boundary deterministic across engines (ulp-level ln/
    division differences cannot reorder equal rounded scores).
    """
    terms = [t.lower() for t in query_terms]
    lt = df.where(F.length(F.trim(F.col(text_col))) > 0).select(
        F.col(id_col), tokens(F.lower(F.col(text_col))).alias("__toks")
    )
    dl = lt.select(id_col, F.size("__toks").alias("__dl"), "__toks")
    stats = dl.agg(
        F.count(F.lit(1)).cast("double").alias("__n_docs"),
        F.avg("__dl").alias("__avgdl"),
    )
    tf = (
        dl.select(id_col, "__dl", F.explode("__toks").alias("__t"))
        .where(F.col("__t").isin(terms))
        .groupBy(id_col, "__dl", "__t")
        .agg(F.count(F.lit(1)).cast("double").alias("__tf"))
    )
    dfreq = tf.groupBy("__t").agg(F.count(F.lit(1)).cast("double").alias("__df"))
    parts = tf.join(F.broadcast(dfreq), "__t").crossJoin(F.broadcast(stats))
    idf = F.log(
        F.lit(1.0)
        + (F.col("__n_docs") - F.col("__df") + 0.5) / (F.col("__df") + 0.5)
    )
    denom = F.col("__tf") + k1 * (
        1.0 - b + b * F.col("__dl").cast("double") / F.col("__avgdl")
    )
    contrib = idf * F.col("__tf") * (k1 + 1.0) / denom
    scored = parts.groupBy(id_col).agg(
        F.round(F.sum(contrib), round_to).alias("bm25")
    )
    return scored.orderBy(F.col("bm25").desc(), F.col(id_col).asc()).limit(k)
