"""Deduplication for training-data pipelines: exact, n-gram Jaccard,
MinHash+LSH, SimHash, embedding-cosine near-dup.

Scale architecture (the part that matters at 100 TB):
- exact: hash-groupBy on a fingerprint — one shuffle, keys are 16-byte
  digests, skew-free.
- MinHash+LSH: shingles → k minhashes → band buckets → candidate pairs
  only *within* buckets → exact Jaccard verification on candidates. The
  candidate join is on band-hash (uniform), never on raw shingles, so the
  explosion of "every doc containing 'the'" never happens.
- SimHash: 64-bit signature; near-dup = small Hamming distance; banding on
  signature chunks bounds the pair search the same way.

Hash determinism: minhash/simhash use md5-derived 64-bit integers rather
than ``xxhash64`` so the exact same signatures are computable by any other
engine (the DuckDB oracle included).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..det import idsum
from .text import char_ngrams, fingerprint_md5, normalize_text, tokens, word_ngrams


def ensure_parallel(df: DataFrame) -> DataFrame:
    """Spread a narrow input across the cluster before expression-heavy
    per-document work. The testdata ships one parquet file per table — a
    single input partition — and signature/shingle expressions are
    interpreted (higher-order functions skip codegen), so without this the
    whole corpus hashes in ONE task (observed: 25 s single-task vs ~1 s
    across 32). At production scale inputs arrive multi-partition and this
    is a no-op."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    # Estimate input parallelism WITHOUT df.rdd (which eagerly builds the
    # RDD lineage — a full analysis round-trip per call): for file-backed
    # plans the file count bounds the scan tasks (single-row-group files,
    # the testdata shape, cannot split further); non-file plans (already
    # shuffled/derived) are assumed spread. Only the provably-narrow case
    # repartitions.
    try:
        files = df.inputFiles()
    except Exception:
        return df
    if files and len(files) < max(2, target // 2):
        return df.repartition(target)
    return df


def md5_long(col: Column, seed: int = 0) -> Column:
    """Deterministic 63-bit positive hash from md5 (first 15 hex chars).
    Seeded by prefixing the input — reproducible in any engine with md5."""
    seeded = F.concat(F.lit(f"s{seed}:"), col)
    return F.conv(F.substring(F.md5(seeded), 1, 15), 16, 10).cast("long")


def exact_dedup(df: DataFrame, id_col: str, text_col: str, keep: str = "min") -> DataFrame:
    """Exact dedup on normalized-text fingerprint: keep one id per content
    hash. One shuffle on the digest."""
    keep_fn = F.min if keep == "min" else F.max
    return (
        df.select(F.col(id_col), fingerprint_md5(text_col).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(keep_fn(id_col).alias(id_col), F.count("*").alias("n_copies"))
    )


def drop_duplicates(
    df: DataFrame,
    subset,
    order_by=None,
    keep: str = "first",
) -> DataFrame:
    """pandas ``drop_duplicates(subset, keep=)`` with DETERMINISTIC keep
    semantics: pandas keeps by input position, which a shuffled engine
    cannot reproduce, so 'first'/'last' here mean the extreme row per
    ``subset`` group under an explicit ``order_by`` (required).
    ``keep=False`` drops every group with more than one row and needs no
    order. Plan: one shuffle on the subset key — row_number (or a
    group-count window) then filter; Spark pushes the rank filter into
    the window sort (WindowGroupLimit), so only the kept row per group
    survives the sort for 'first'/'last'."""
    subset = [subset] if isinstance(subset, str) else list(subset)
    if keep is False:
        w = Window.partitionBy(*subset)
        return (
            df.withColumn("__n", F.count("*").over(w))
            .where(F.col("__n") == 1)
            .drop("__n")
        )
    if keep not in ("first", "last"):
        raise ValueError(f"keep must be 'first', 'last', or False, got {keep!r}")
    if not order_by:
        raise ValueError(
            "keep='first'/'last' needs an explicit order_by: pandas keeps by "
            "input position, which is not defined after a shuffle"
        )
    order = [F.col(c).asc() if keep == "first" else F.col(c).desc() for c in order_by]
    w = Window.partitionBy(*subset).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def duplicated(
    df: DataFrame,
    subset,
    order_by=None,
    keep: str = "first",
    out_col: str = "duplicated",
) -> DataFrame:
    """pandas ``duplicated(subset, keep=)`` — a boolean MARKER column
    instead of row removal (same determinism contract as
    :func:`drop_duplicates`: 'first'/'last' need an explicit
    ``order_by``; ``keep=False`` marks every member of any multi-row
    group). Plan: the identical one-shuffle window; downstream filters
    on the marker reduce to the drop_duplicates plan."""
    subset = [subset] if isinstance(subset, str) else list(subset)
    if keep is False:
        w = Window.partitionBy(*subset)
        return df.withColumn(out_col, F.count("*").over(w) > 1)
    if keep not in ("first", "last"):
        raise ValueError(f"keep must be 'first', 'last', or False, got {keep!r}")
    if not order_by:
        raise ValueError(
            "keep='first'/'last' needs an explicit order_by: pandas marks by "
            "input position, which is not defined after a shuffle"
        )
    order = [F.col(c).asc() if keep == "first" else F.col(c).desc() for c in order_by]
    w = Window.partitionBy(*subset).orderBy(*order)
    return df.withColumn(out_col, F.row_number().over(w) > 1)


def cluster_pairs(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """Connected components over a duplicate-pair edge list — the step that
    turns pairwise near-dup hits (minhash/simhash/embedding) into CLUSTERS
    with one canonical survivor each, i.e. the actual corpus-dedup output
    a training pipeline consumes.

    Algorithm: iterative min-label propagation on the symmetrized edges
    with a POINTER-JUMPING step per round (label <- label-of-label, the
    path-halving trick from Hash-to-Min / large-star–small-star CC): each
    round every node takes the min of its own, its neighbors', and its
    current label's label. Propagation distance doubles per round, so a
    chain of length d converges in O(log d) rounds instead of O(d) —
    max_iter=50 now covers components 2^50 hops across, not 50. Near-dup
    components are dense (band-collision cliques), so 2-3 rounds in
    practice. Labels are min(doc_id) of the component — deterministic on
    any cluster layout, and SQL-replayable by a recursive-CTE oracle.
    Each round is localCheckpointed: the loop would otherwise stack lineage
    and replan O(iter²) at scale.

    Returns one row per node that appears in ANY pair:
    ``(doc_id, cluster_id, cluster_size, is_canonical)`` — singleton docs
    (no duplicate edges) are intentionally absent; the caller left-joins
    and treats NULL cluster_id as "unique".
    """
    edges = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    edges = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct().localCheckpoint(eager=True)
    labels = (
        edges.select(F.col("src").alias("v")).distinct()
        .withColumn("lbl", F.col("v"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        nbr = (
            edges.join(labels, edges["dst"] == labels["v"])
            .groupBy("src").agg(F.min("lbl").alias("nl"))
        )
        stepped = labels.join(nbr, labels["v"] == nbr["src"], "left").select(
            labels["v"],
            F.least(F.col("lbl"), F.coalesce(F.col("nl"), F.col("lbl"))).alias("lbl"),
        )
        # pointer jumping: lbl <- lbl(lbl). Every label is itself a node
        # id, so the self-join always resolves; this halves remaining
        # chain distance each round (O(log d) total rounds)
        new = (
            stepped.alias("x")
            .join(
                stepped.select(
                    F.col("v").alias("jv"), F.col("lbl").alias("jlbl")
                ),
                F.col("x.lbl") == F.col("jv"),
                "left",
            )
            .select(
                F.col("x.v").alias("v"),
                F.least(F.col("x.lbl"), F.coalesce(F.col("jlbl"), F.col("x.lbl"))).alias("lbl"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new.alias("n")
            .join(labels.alias("o"), F.col("n.v") == F.col("o.v"))
            .where(F.col("n.lbl") != F.col("o.lbl"))
            .count()
        )
        # rebinding drops the only reference to the previous round's
        # checkpoint; its blocks are reference-cleaned by the context
        # cleaner, so storage stays O(1) rounds, not O(diameter)
        labels = new
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"cluster_pairs did not converge in {max_iter} rounds — with "
            f"pointer jumping that needs a component ~2^{max_iter} hops "
            f"across; pass a larger max_iter= if the pair graph really is "
            f"that pathological"
        )
    w = Window.partitionBy("cluster_id")
    return (
        labels.select(F.col("v").alias("doc_id"), F.col("lbl").alias("cluster_id"))
        .withColumn("cluster_size", F.count("*").over(w))
        .withColumn("is_canonical", F.col("doc_id") == F.col("cluster_id"))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    use_chars: bool = False,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for all pairs sharing >=1 shingle.

    explode(distinct shingles) → self-join on shingle → |A∩B| per pair →
    |A∪B| = |A|+|B|-|A∩B|. Output: (id_a, id_b, jaccard) with id_a < id_b,
    jaccard >= threshold.

    This is the *verification* primitive; at 100 TB you never run it on all
    pairs — run :func:`minhash_lsh_candidates` first and verify only
    candidates. On its own it is safe when shingles are selective (word
    n-grams, n>=3).
    """
    df = ensure_parallel(df)
    grams = (char_ngrams if use_chars else word_ngrams)(text_col, n)
    sh = df.select(
        F.col(id_col).alias("id"), F.explode(F.array_distinct(grams)).alias("shingle")
    )
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnsRenamed({"id": "id_a", "sz": "sz_a"}), "id_a")
        .join(sizes.withColumnsRenamed({"id": "id_b", "sz": "sz_b"}), "id_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )
    return out


def ngram_contamination(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    min_shared: int = 1,
) -> DataFrame:
    """Train/eval overlap detection (benchmark DECONTAMINATION — the
    standard n-gram check public LLM pipelines run before training):
    for every (train doc, eval doc) pair sharing ≥ ``min_shared``
    distinct word ``n``-grams, emit the shared-gram count and the
    train-side overlap fraction.

    Plan: explode distinct n-grams on both sides, hash each gram to a
    16-byte digest (join key is the digest, never the raw gram — no
    wide-string shuffle), inner-join train grams to eval grams. The eval
    side is benchmark-sized (thousands of docs, not the corpus), so
    Spark broadcasts it and the join is ONE pass over the train grams
    with no train-side shuffle; the per-pair count then groups on
    (train, eval) pairs that actually collided — output-sized, not
    corpus-sized. Long word n-grams (n≥5 default) are near-unique, so
    no hot-gram explosion; lower n only with a stop-gram filter."""
    tg = ensure_parallel(train).select(
        F.col(id_col).alias("train_id"),
        F.explode(
            F.array_distinct(word_ngrams(text_col, n))
        ).alias("gram"),
    ).select("train_id", F.md5(F.col("gram")).alias("g"))
    eg = eval_df.select(
        F.col(id_col).alias("eval_id"),
        F.explode(
            F.array_distinct(word_ngrams(text_col, n))
        ).alias("gram"),
    ).select("eval_id", F.md5(F.col("gram")).alias("g"))
    tsz = tg.groupBy("train_id").agg(F.count("*").alias("n_train_grams"))
    pairs = (
        tg.join(F.broadcast(eg), "g")
        .groupBy("train_id", "eval_id")
        .agg(F.count("*").alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )
    return pairs.join(tsz, "train_id").select(
        "train_id",
        "eval_id",
        "n_shared",
        F.round(F.col("n_shared") / F.col("n_train_grams"), 6).alias(
            "train_overlap_frac"
        ),
    )


_MERSENNE31 = 2_147_483_647  # 2^31 - 1


def minhash_coeffs(num_hashes: int) -> tuple[list[int], list[int]]:
    """Deterministic universal-hash coefficients (odd a, arbitrary b) —
    fixed integers, embedded identically in the oracle SQL."""
    a = [((i + 1) * 2_654_435_761 % _MERSENNE31) | 1 for i in range(num_hashes)]
    b = [(i + 1) * 97_531 % _MERSENNE31 for i in range(num_hashes)]
    return a, b


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, num_hashes: int = 32, n: int = 3
) -> DataFrame:
    """k-permutation MinHash signature per document, all JVM-side.

    ONE md5 per shingle (the expensive part), reduced mod 2^31−1, then the
    k permutations are cheap universal hashes h_i = (a_i·h + b_i) mod p in
    pure 64-bit-safe integer arithmetic — identical in any engine, ~k×
    cheaper than k independent md5 evaluations. One scan, no shuffle; the
    signature column is an array<long> of width k."""
    a, b = minhash_coeffs(num_hashes)
    grams = F.array_distinct(word_ngrams(text_col, n))
    base = F.transform(grams, lambda g: md5_long(g, seed=0) % _MERSENNE31)

    def _perm(ai: int, bi: int) -> Column:
        # closure, NOT a default-arg lambda: F.transform reads lambda arity,
        # and a 2-parameter lambda would bind the array index instead
        return F.array_min(
            F.transform(base, lambda h: (F.lit(ai) * h + F.lit(bi)) % _MERSENNE31)
        )

    sig = F.array(*[_perm(a[i], b[i]) for i in range(num_hashes)])
    return df.select(F.col(id_col).alias("id"), sig.alias("signature"))


def minhash_signatures_arrow(
    df: DataFrame, id_col: str, text_col: str, num_hashes: int = 32, n: int = 3
) -> DataFrame:
    """Bit-identical to :func:`minhash_signatures`, computed in a
    vectorized Arrow batch: hashlib md5 per DISTINCT shingle (memoized per
    batch) + one numpy (k × grams) min-reduction per document — avoids the
    interpreted higher-order expression tree on the hot path."""
    import hashlib

    import numpy as np
    import pandas as pd

    a, b = minhash_coeffs(num_hashes)
    av = np.array(a, dtype=np.int64)[:, None]
    bv = np.array(b, dtype=np.int64)[:, None]

    def batch(batches):
        for pdf in batches:
            memo: dict[str, int] = {}

            def h(g: str) -> int:
                v = memo.get(g)
                if v is None:
                    v = int(hashlib.md5(f"s0:{g}".encode()).hexdigest()[:15], 16) % _MERSENNE31
                    memo[g] = v
                return v

            sigs = []
            for text in pdf[text_col]:
                toks = str(text).strip().split()
                if len(toks) >= n:
                    grams = {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}
                else:
                    grams = {" ".join(toks)}
                base = np.array([h(g) for g in grams], dtype=np.int64)[None, :]
                sig = ((av * base + bv) % _MERSENNE31).min(axis=1)
                sigs.append(sig.tolist())
            yield pd.DataFrame({"id": pdf[id_col], "signature": sigs})

    return df.select(id_col, text_col).mapInPandas(
        batch, f"id long, signature array<long>"
    )


def _banded_keys(sigs: DataFrame, bands: int, rows_per_band: int) -> DataFrame:
    """(id, band, bucket) LSH band keys from a signature frame — the
    shape shared by the self-join candidates, the persisted standing
    band index, and the incremental feed-vs-standing probe."""
    return sigs.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.md5(
                            F.concat_ws(
                                ",",
                                *[
                                    F.col("signature")[b * rows_per_band + r].cast("string")
                                    for r in range(rows_per_band)
                                ],
                            )
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")


def minhash_lsh_candidates(
    sigs: DataFrame, bands: int = 8, rows_per_band: int = 4
) -> DataFrame:
    """LSH banding: split the signature into ``bands`` chunks of
    ``rows_per_band`` hashes; docs agreeing on any whole band become a
    candidate pair. Join key is (band_index, band_hash) — uniformly
    distributed, so the self-join is skew-free by construction."""
    width = bands * rows_per_band
    # Materialization barrier: without it Catalyst collapses projections
    # and inlines the whole signature expression into EVERY sig[i]
    # extraction on BOTH sides of the self-join (higher-order exprs run
    # interpreted — observed 40x slowdown). The exchange carries only
    # (id, k longs) and is reused by both join branches, so signatures
    # are computed exactly once.
    sigs = sigs.repartition(F.col("id"))
    banded = _banded_keys(sigs, bands, rows_per_band)
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """Full MinHash+LSH near-dup pipeline: signatures → band candidates →
    exact-Jaccard verification of candidates only. Output matches
    :func:`ngram_jaccard_pairs` (id_a, id_b, jaccard) for pairs above
    threshold — i.e. LSH prunes, exact verification decides, so the result
    is *exact* given the candidates (recall bounded by the LSH S-curve)."""
    rows_per_band = num_hashes // bands
    df = ensure_parallel(df)
    sigs = minhash_signatures_arrow(df, id_col, text_col, num_hashes, n)
    cands = minhash_lsh_candidates(sigs, bands, rows_per_band)

    # verification re-shingles ONLY candidate documents (semi-join first):
    # at scale the candidate set is orders of magnitude smaller than the
    # corpus, and re-deriving shingles for non-candidates is pure waste
    cand_ids = (
        cands.select(F.col("id_a").alias("__cid"))
        .union(cands.select(F.col("id_b").alias("__cid")))
        .distinct()
    )
    needed = df.join(
        F.broadcast(cand_ids), F.col(id_col) == F.col("__cid"), "left_semi"
    )
    grams = needed.select(
        F.col(id_col).alias("id"),
        F.array_distinct(word_ngrams(text_col, n)).alias("grams"),
    ).repartition(F.col("id"))  # barrier: shingle arrays computed once
    ga = grams.withColumnsRenamed({"id": "id_a", "grams": "grams_a"})
    gb = grams.withColumnsRenamed({"id": "id_b", "grams": "grams_b"})
    verified = (
        cands.join(ga, "id_a")
        .join(gb, "id_b")
        .withColumn("inter", F.size(F.array_intersect("grams_a", "grams_b")))
        .withColumn(
            "jaccard",
            F.col("inter")
            / (F.size("grams_a") + F.size("grams_b") - F.col("inter")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )
    return verified


def minhash_band_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
) -> DataFrame:
    """The persistable standing BAND INDEX — (id, band, bucket), bands
    rows per document — that makes near-dup screening INCREMENTAL: a
    daily feed probes this index instead of re-signing the corpus. Build
    it once with the corpus, append the feed's own band keys after each
    ingest (same function over the feed); the index is corpus×bands rows
    of three small columns, the standard companion artifact to the
    deduplicated corpus."""
    rows_per_band = num_hashes // bands
    df = ensure_parallel(df)
    sigs = minhash_signatures_arrow(df, id_col, text_col, num_hashes, n)
    return _banded_keys(sigs, bands, rows_per_band)


def minhash_neardup_against_standing(
    standing: DataFrame,
    feed: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    standing_index: DataFrame | None = None,
) -> DataFrame:
    """Incremental near-dup screening: all MinHash near-duplicate pairs
    that involve at least one FEED document — (feed × standing) and
    (feed × feed) — without ever re-signing or shuffling the standing
    corpus. Equals :func:`minhash_dedup_pairs` over ``standing ∪ feed``
    restricted to pairs touching the feed (pinned in tests): signatures
    are per-document, so cohort membership cannot change any value.

    Plan shape (fenced in tests): the feed's band keys BROADCAST against
    the standing index (index scanned, never shuffled — pass
    ``standing_index`` read from storage; it is computed from
    ``standing`` when omitted); feed×feed candidates self-join the
    feed's own keys (feed-sized); exact-Jaccard verification re-shingles
    only candidate documents, extracted from each side with broadcast
    semi-joins, and the verify joins broadcast the candidate-sized gram
    frames. Contract: feed ids are NEW documents (route re-ingests
    through CDC delete+insert upstream)."""
    rows_per_band = num_hashes // bands
    feed = ensure_parallel(feed)
    # localCheckpoint (not a repartition — an exchange does NOT stop
    # plan-level recompute): fband feeds the standing probe, BOTH sides
    # of the feed self-join, and transitively every downstream consumer;
    # without a true barrier each re-derives the Arrow signature pass
    # (measured 3x the full pipeline at sf0.01 when first driver-armed)
    fband = _banded_keys(
        minhash_signatures_arrow(feed, id_col, text_col, num_hashes, n),
        bands, rows_per_band,
    ).localCheckpoint(eager=False)
    if standing_index is None:
        standing_index = minhash_band_index(
            standing, id_col, text_col, n, num_hashes, bands
        )
    cross = (
        standing_index.alias("s")
        .join(
            F.broadcast(fband.alias("f")),
            (F.col("s.band") == F.col("f.band"))
            & (F.col("s.bucket") == F.col("f.bucket"))
            & (F.col("s.id") != F.col("f.id")),
        )
        .select(
            F.least("s.id", "f.id").alias("id_a"),
            F.greatest("s.id", "f.id").alias("id_b"),
        )
    )
    a = fband.alias("a")
    b = fband.alias("b")
    ff = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
    )
    # candidate pairs feed cand_ids (twice), both gram semi-joins, and
    # the final verify join — materialize the (feed-bounded) set once
    cands = cross.unionByName(ff).distinct().localCheckpoint(eager=False)
    cand_ids = (
        cands.select(F.col("id_a").alias("__cid"))
        .union(cands.select(F.col("id_b").alias("__cid")))
        .distinct()
    )

    def _grams(docs: DataFrame) -> DataFrame:
        needed = docs.join(
            F.broadcast(cand_ids), F.col(id_col) == F.col("__cid"), "left_semi"
        )
        return needed.select(
            F.col(id_col).alias("id"),
            F.array_distinct(word_ngrams(text_col, n)).alias("grams"),
        )

    # true barrier: candidate shingles computed once, reused by both
    # verify sides (candidate-sized by the broadcast semi-joins above)
    grams = _grams(standing).unionByName(_grams(feed)).localCheckpoint(
        eager=False
    )
    ga = grams.withColumnsRenamed({"id": "id_a", "grams": "grams_a"})
    gb = grams.withColumnsRenamed({"id": "id_b", "grams": "grams_b"})
    return (
        cands.join(F.broadcast(ga), "id_a")
        .join(F.broadcast(gb), "id_b")
        .withColumn("inter", F.size(F.array_intersect("grams_a", "grams_b")))
        .withColumn(
            "jaccard",
            F.col("inter")
            / (F.size("grams_a") + F.size("grams_b") - F.col("inter")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def simhash(col: Column, bits: int = 60) -> Column:
    """SimHash signature of the token multiset: per-token md5-derived hash;
    each bit position votes +1/-1; sign of the tally sets the bit.
    Pure expressions: tokens → hashes → fold bit tallies → assemble bits.

    ``bits`` ≤ 63: bit 63 would need 2^63, exceeding signed LongType
    (and md5_long only yields 60 deterministic bits anyway)."""
    assert 1 <= bits <= 63, "simhash bits must be <= 63 (signed long range)"
    toks = tokens(normalize_text(col))
    hashes = F.transform(toks, lambda t: md5_long(t, seed=1))

    def _vote(i: int) -> Column:
        # bind i via closure — the merge lambda must take EXACTLY two
        # parameters (a default-arg third parameter breaks pyspark's
        # lambda-arity inspection)
        return F.aggregate(
            hashes,
            F.lit(0).cast("long"),
            lambda acc, h: acc
            + F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )

    bit_exprs = []
    for i in range(bits):
        vote = _vote(i)
        bit_exprs.append(
            F.when(vote > 0, F.lit(1).cast("long") * F.lit(2**i).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        )
    out = bit_exprs[0]
    for e in bit_exprs[1:]:
        out = out + e
    return out


def simhash_signatures_arrow(
    df: DataFrame, id_col: str, text_col: str, bits: int = 60
) -> DataFrame:
    """Bit-identical to :func:`simhash`, computed in a vectorized Arrow
    batch instead of 60 interpreted vote-folds per token (~50x faster:
    hashlib md5 per DISTINCT token memoized per batch, then one numpy
    popcount-style matrix reduction per document)."""
    import hashlib

    import numpy as np
    import pandas as pd

    def batch(batches):
        for pdf in batches:
            memo: dict[str, int] = {}

            def h(tok: str) -> int:
                v = memo.get(tok)
                if v is None:
                    v = int(hashlib.md5(f"s1:{tok}".encode()).hexdigest()[:15], 16)
                    memo[tok] = v
                return v

            shifts = np.arange(bits, dtype=np.int64)
            sigs = []
            for text in pdf[text_col]:
                toks = " ".join(str(text).lower().split()).split(" ")
                hs = np.array([h(t) for t in toks], dtype=np.int64)
                votes = (((hs[:, None] >> shifts) & 1) * 2 - 1).sum(axis=0)
                sig = int(((votes > 0).astype(np.int64) << shifts).sum())
                sigs.append(sig)
            yield pd.DataFrame({"id": pdf[id_col], "sig": sigs})

    return df.select(id_col, text_col).mapInPandas(batch, "id long, sig long")


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    bits: int = 60,
    bands: int = 4,
    use_arrow: bool = True,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance <= max_hamming.

    Pigeonhole banding: if two signatures differ in <= max_hamming bits and
    we split into ``bands`` > max_hamming chunks, they agree exactly on at
    least one chunk — join on (chunk_idx, chunk_value), verify Hamming on
    candidates with bit_count(xor). No full cross join at any scale."""
    assert bands > max_hamming, "need bands > max_hamming for exact recall"
    chunk = bits // bands
    df = ensure_parallel(df)
    if use_arrow:
        sigs = simhash_signatures_arrow(df, id_col, text_col, bits)
    else:
        sigs = df.select(
            F.col(id_col).alias("id"), simhash(F.col(text_col), bits).alias("sig")
        )
    # same materialization barrier as minhash_lsh_candidates: compute the
    # 60-bit signature once, not per chunk extraction per join side
    sigs = sigs.repartition(F.col("id"))
    banded = sigs.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("sig"), b * chunk)
                        .bitwiseAND(F.lit((1 << chunk) - 1))
                        .alias("chunkval"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "sig", "bb.band", "bb.chunkval")
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.chunkval") == F.col("b.chunkval"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(F.col("a.sig").bitwiseXOR(F.col("b.sig"))).alias("hamming"),
        )
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    num_planes: int = 8,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Embedding near-duplicates: cosine >= threshold, candidates bucketed
    by random-hyperplane LSH (sign bits of ``num_planes`` projections) so
    pair scoring is per-bucket, not all-pairs (one grouped Arrow task per
    bucket — see :func:`_exact_pairs_within`). All products computed in
    double (a float32*float32 product would round twice and diverge from
    any double-side replay).

    Pass ``dim`` explicitly when known — inferring it costs an extra job
    and an empty corpus would otherwise raise instead of returning empty.
    """
    import numpy as np

    if dim is None:
        first = df.select(F.size(vec_col).alias("d")).first()
        if first is None:
            return df.sparkSession.createDataFrame(
                [], "id_a long, id_b long, cosine double"
            )
        dim = first["d"]
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((num_planes, dim))

    def bucket_expr(vc):
        bits = []
        for p in range(num_planes):
            arr = F.array(*[F.lit(float(x)) for x in planes[p]])
            dot = F.aggregate(
                F.zip_with(vc, arr, lambda a, b: a.cast("double") * b),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            bits.append(F.when(dot >= 0, F.lit(1 << p)).otherwise(F.lit(0)))
        out = bits[0]
        for e in bits[1:]:
            out = out + e
        return out

    vecs = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        bucket_expr(F.col(vec_col)).alias("grp"),
        F.exists(F.col(vec_col), lambda x: x.isNull()).alias("__hasnull"),
    )
    return _exact_pairs_within(vecs, threshold)


def _exact_pairs_within(
    vecs: DataFrame, threshold: float, round_to: int = 6
) -> DataFrame:
    """Exact-cosine pairs >= ``threshold`` WITHIN each ``grp`` — the
    shared verify kernel of :func:`embedding_neardup_pairs` (LSH buckets)
    and :func:`semantic_cluster_pairs` (centroid clusters). ``vecs`` is
    (id, v, grp, __hasnull).

    r10 rewrite, found by the sf1 sweep wall split: the former
    per-bucket SELF-JOIN materialized every candidate pair row carrying
    BOTH full vectors (~1 KB/pair — 12 GB of exchange at sf1's 12.5M
    candidates) and scored each with an interpreted HOF fold. Now ONE
    shuffle groups each bucket/cluster into an ``applyInPandas`` task
    that scores all its pairs as d vectorized outer-product
    accumulations. BIT-parity with the fold expressions is preserved the
    same way as the PQ/quantized scorers: the dot accumulates
    SEQUENTIALLY over dims (vectorized across pairs, ordered over j —
    the identical ((0+t0)+t1)+… IEEE association as F.aggregate and
    DuckDB's list_sum), norms fold the same way before sqrt, and the
    divide is acc/(na*nb) in the same op order — so the SQL oracles
    replay unchanged. The threshold filter mirrors Spark comparison
    semantics (NaN compares GREATEST, so a NaN cosine passes); rounding
    stays in the same Spark F.round expression as before.

    Memory contract: one group (bucket/cluster) lives in one task —
    size num_planes/num_centroids so groups fit executor memory, the
    same knob the join form needed for its per-bucket quadratic
    candidate count (the SemDeDup contract: candidate sets are bounded
    by construction)."""
    import numpy as np
    import pandas as pd

    id_t = vecs.schema["id"].dataType.simpleString()

    def pairs_fn(pdf):
        empty = pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
        if len(pdf) < 2:
            return empty
        # undecodable vectors (NULL / null-element) score NULL in the
        # fold path and NULL never passes >= — drop them here (null
        # elements flatten to NaN on Arrow, hence the JVM flag). A pair
        # of UNEQUAL lengths also scores NULL under zip_with (the pad
        # side is NULL), but two vectors of the SAME non-modal length
        # score normally — so cohort by length instead of electing one
        # modal dim (self-review r10: the modal election silently
        # dropped equal-length minority cohorts the fold would score).
        lens = pdf["v"].map(lambda x: -1 if x is None else len(x))
        clean = ~pdf["__hasnull"].to_numpy(dtype=bool)
        frames = []
        for d in sorted(set(lens[lens > 0])):
            ok = (lens == d).to_numpy() & clean
            if int(ok.sum()) < 2:
                continue
            sub = pdf[ok]
            n = len(sub)
            mat = np.array([list(x) for x in sub["v"]], dtype=np.float64)
            ids = sub["id"].to_numpy()
            # sequential-over-dims accumulation == the F.aggregate fold
            acc = np.zeros((n, n))
            nrm = np.zeros(n)
            for j in range(int(d)):
                cj = mat[:, j]
                acc += cj[:, None] * cj[None, :]
                nrm += cj * cj
            na = np.sqrt(nrm)
            den = na[:, None] * na[None, :]
            with np.errstate(divide="ignore", invalid="ignore"):
                raw = acc / den
            # engine parity for the keep-filter: Spark/DuckDB division
            # by ZERO yields NULL (dropped by >=), while NaN INPUTS
            # propagate to a NaN cosine that compares GREATEST and
            # passes — numpy's 0/0=NaN and x/0=inf must not be kept
            # (self-review r10: an all-zero embedding otherwise emits
            # phantom pairs the fold path and the oracle both drop)
            ia, ib = np.nonzero(
                (den != 0)
                & (np.isnan(raw) | (raw >= threshold))
                & (ids[:, None] < ids[None, :])
            )
            frames.append(pd.DataFrame(
                {"id_a": ids[ia], "id_b": ids[ib], "cosine": raw[ia, ib]}
            ))
        if not frames:
            return empty
        return pd.concat(frames, ignore_index=True)

    return (
        vecs.groupBy("grp")
        .applyInPandas(pairs_fn, f"id_a {id_t}, id_b {id_t}, cosine double")
        .select("id_a", "id_b", F.round("cosine", round_to).alias("cosine"))
    )


def bloom_anti_join(
    new_df: DataFrame,
    seen_df: DataFrame,
    on: str | Sequence[str],
    num_buckets: int = 1 << 22,
) -> DataFrame:
    """Incremental-corpus dedup: rows of ``new_df`` whose key does NOT
    appear in ``seen_df`` — EXACTLY a left-anti join (the oracle), but
    with a Bloom-style prefilter so the big corpus is only joined by
    probable hits.

    Mechanics: the seen keys hash into ``num_buckets`` buckets (xxhash64,
    one-hash Bloom); the DISTINCT bucket set (<= num_buckets longs, tiny
    vs the corpus) broadcasts. New rows missing their bucket are
    DEFINITELY new (no false negatives — same key, same bucket) and skip
    the exact join entirely, shuffling nothing; only rows whose bucket is
    occupied (~ occupancy-rate fraction, <= 1-exp(-n_seen/num_buckets))
    proceed to the exact anti-join that removes hash collisions. At
    100 TB the exact join's shuffle carries the collision candidates and
    the matching seen keys, not |new| + |seen|.

    Size ``num_buckets`` >= a few x expected distinct seen keys; the
    bucket set stays broadcast-sized (8 bytes per OCCUPIED bucket).

    The bucket set is materialized EAGERLY (``localCheckpoint``): it
    feeds two broadcast joins (anti for definite-new, semi for
    candidates), and without the checkpoint each consumer re-runs the
    distinct aggregation — at 100 TB the seen-keys scan is the expensive
    side, so the double scan is the dominant waste (r6 verdict #5). The
    returned plan therefore contains exactly ONE scan of ``seen_df``
    (the exact-key side of the collision anti-join); the bucket-set scan
    happens once, at call time.
    """
    cols = [on] if isinstance(on, str) else list(on)
    bucket = (F.xxhash64(*[F.col(c) for c in cols]) % num_buckets).alias("__bkt")
    seen_buckets = seen_df.select(bucket).distinct().localCheckpoint()
    new_b = new_df.withColumn("__bkt", bucket)
    definite_new = new_b.join(
        F.broadcast(seen_buckets), "__bkt", "left_anti"
    ).drop("__bkt")
    candidates = new_b.join(
        F.broadcast(seen_buckets), "__bkt", "left_semi"
    ).drop("__bkt")
    survivors = candidates.join(
        seen_df.select(*cols).distinct(), cols, "left_anti"
    )
    return definite_new.unionByName(survivors)


def repeated_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    span_tokens: int = 6,
    min_docs: int = 2,
) -> DataFrame:
    """Exact repeated-span detection across the corpus — the signal
    behind exact-substring dedup (Lee et al. 2021, "Deduplicating
    Training Data Makes Language Models Better"): every ``span_tokens``-
    token window that occurs in ≥ ``min_docs`` DISTINCT documents, with
    how many documents carry it and an id checksum locating them. A
    pipeline uses the output to cut boilerplate spans (headers, license
    blocks, templates) that whole-document dedup can't see. Documents
    shorter than one span contribute their whole text as a single span
    (short exact duplicates surface here too).

    100 TB shape: ONE scan; per-doc DISTINCT spans computed inside the
    row (array_distinct — so a doc repeating its own span counts once);
    the explode carries only (16-byte digest, doc id); the digest
    groupBy partial-aggregates map-side and its key is uniform by
    construction (a hash), so the shuffle is skew-free. Same digest-not-
    raw-text discipline as the decontamination join."""
    c = F.col(text_col)
    spans = F.array_distinct(word_ngrams(c, span_tokens))
    ex = df.where(F.length(F.trim(c)) > 0).select(
        F.explode(spans).alias("__span"), F.col(id_col)
    ).select(F.md5("__span").alias("span_h"), id_col)
    return (
        ex.groupBy("span_h")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min(id_col).alias("first_doc"),
            F.max(id_col).alias("last_doc"),
            idsum(id_col).alias("sum_doc_ids"),
        )
        .where(F.col("n_docs") >= min_docs)
    )


#: target mean cluster population for the derived centroid count: the
#: per-cluster Arrow kernel scores (docs/cluster)² candidate pairs, so
#: ~4k docs/cluster keeps each task at ~16M dot products (sub-second at
#: 64-d) while leaving clusters big enough to be semantically coherent.
_SEM_DOCS_PER_CLUSTER = 4096


def semantic_centroid_count(rows: int) -> int:
    """Derived coarse-quantizer size from MEASURED corpus rows (the
    vecstore shard-sizing rule applied to clustering): ceil(rows / 4096),
    floored at 16 so tiny corpora keep multi-cluster behavior. At 100 TB
    this is what actually keeps the (n/K)² per-cluster cost bounded — a
    static K silently degrades toward all-pairs as the corpus grows."""
    return max(16, -(-int(rows) // _SEM_DOCS_PER_CLUSTER))


def semantic_cluster_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.35,
    num_centroids: int | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Cluster-then-threshold SEMANTIC dedup — the standard LLM-corpus
    companion to hyperplane-LSH near-dup (:func:`embedding_neardup_pairs`,
    whose buckets are random projections): assign every vector to its
    nearest coarse centroid (the deterministic md5-sampled IVF quantizer,
    ``similarity.ivf_centroids`` — a trained k-means slots in unchanged),
    then emit exact-cosine pairs >= ``threshold`` WITHIN each cluster.
    SemDeDup-style semantics: near-duplicates are sought among
    semantically close documents, so the candidate set is data-adaptive
    rather than projection-random.

    Scale shape (plan-tested): clusters are disjoint and pair scoring is
    grouped BY cluster (one shuffle, one Arrow task per cluster — see
    :func:`_exact_pairs_within`), so nothing goes all-pairs — per-cluster
    cost is (n/num_centroids)² instead of n², and num_centroids grows
    with the corpus: the default (``num_centroids=None``) derives K from
    the MEASURED corpus row count via :func:`semantic_centroid_count`
    (~4k docs per cluster — the vecstore measured-sizing rule); pass an
    explicit K for oracle comparability or a tuned quantizer. The
    centroid argmin uses the same rank-equivalent −2·v·c + ‖c‖²
    expression and (dist, cid) tiebreak as the IVF oracle, and the pair
    kernel keeps fold bit-parity, so the SQL oracle replays every
    value."""
    from .similarity import ivf_assign, ivf_centroids

    if num_centroids is None:
        num_centroids = semantic_centroid_count(df.count())
    cents = ivf_centroids(df, id_col, vec_col, num_centroids)
    vecs = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        ivf_assign(F.col(vec_col), cents).alias("grp"),
        F.exists(F.col(vec_col), lambda x: x.isNull()).alias("__hasnull"),
    )
    return _exact_pairs_within(vecs, threshold, round_to)
