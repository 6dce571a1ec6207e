"""Round-7 surface: Gopher repetition signals, PII detect/redact, the
dyadic weight quantizer, and the DECIMAL(38,0) scaled-sum accumulator —
each twinned against an independent Python/pandas computation.

Reference scope note: the repetition/PII operators extend the engine
beyond the reference (training-data pipeline ops); the repetition
definitions follow Rae et al. 2021 (Gopher) appendix A1.
"""

import math
import re
from collections import Counter

import pandas as pd
import pytest
from pyspark.sql import functions as F

from parallel_pandas_spark import det
from parallel_pandas_spark.operators import text


# ------------------------------------------------------- repetition_profile
def _py_repetition(doc_id, s):
    """Straight-line Python twin of text.repetition_profile."""
    toks = s.strip().lower().split()
    n, nd = len(toks), len(set(toks))
    tc = sum(len(t) for t in toks)
    dc = sum(len(t) for t in set(toks))
    n_chars = len(" ".join(s.lower().split()))
    row = {
        "doc_id": doc_id,
        "dup_word_frac": round((n - nd) / n, 6),
        "dup_word_char_frac": round((tc - dc) / tc, 6),
    }
    for nn, col in ((2, "top_bigram_char_frac"), (3, "top_trigram_char_frac")):
        if n >= nn:
            grams = [" ".join(toks[i : i + nn]) for i in range(n - nn + 1)]
            cnt = Counter(grams)
            best = max(cnt, key=lambda g: (cnt[g], [-ord(c) for c in g]))
            row[col] = round(cnt[best] * len(best) / n_chars, 6)
            if nn == 2:
                row["top_bigram"] = best
        else:
            row[col] = 0.0
            if nn == 2:
                row["top_bigram"] = None
    row["passes_gopher"] = (
        row["top_bigram_char_frac"] <= 0.20
        and row["top_trigram_char_frac"] <= 0.18
        and row["dup_word_frac"] <= 0.80
    )
    return row


REP_DOCS = [
    (0, "the cat sat on the mat the cat sat again"),
    (1, "a a a a a a a a"),                      # degenerate repetition
    (2, "unique words only here today friend"),  # no repetition
    (3, "single"),                               # 1 token: no n-grams
    (4, "two tokens"),                           # bigram only
    (5, "x y x y x y x y z"),                    # tied-ish runs
    (6, "alpha beta alpha beta gamma alpha beta"),
]


def test_repetition_profile_vs_python(spark):
    sdf = spark.createDataFrame(
        [(i, s) for i, s in REP_DOCS], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r.asDict()
        for r in text.repetition_profile(sdf, "doc_id", "text").collect()
    }
    for i, s in REP_DOCS:
        want = _py_repetition(i, s)
        g = got[i]
        assert set(g) == set(want)
        for k, wv in want.items():
            if isinstance(wv, float):
                assert g[k] == pytest.approx(wv, abs=1e-12), (i, k, g[k], wv)
            else:
                assert g[k] == wv, (i, k, g[k], wv)


def test_repetition_profile_tie_is_lexicographic(spark):
    # 'b b' and 'a a' both occur twice; smallest gram must win in the fold
    sdf = spark.createDataFrame(
        [(0, "b b b a a a")], "doc_id long, text string"
    )
    row = text.repetition_profile(sdf, "doc_id", "text").collect()[0]
    assert row["top_bigram"] == "a a"


# ------------------------------------------------------------- PII ops
PII_SAMPLES = [
    "contact jane.doe+spam@mail.example.co or 10.0.0.1",
    "call +1-555-123-4567 | ssn 123-45-6789 end",
    "no pii here at all",
    "two mails: a@b.io c.d@e-f.org and ip 192.168.001.255",
    "edge 999-99-9999 and 1-234-567-8901",
]


def test_pii_counts_vs_python_re(spark):
    sdf = spark.createDataFrame(
        [(i, s) for i, s in enumerate(PII_SAMPLES)], "i long, t string"
    )
    counts = text.pii_counts("t")
    got = {
        r["i"]: r.asDict()
        for r in sdf.select(
            "i", *[c.alias(n) for n, c in counts.items()]
        ).collect()
    }
    for i, s in enumerate(PII_SAMPLES):
        for name, pat in text.PII_PATTERNS.items():
            want = len(re.findall(pat, s))
            assert got[i][name] == want, (i, name, got[i][name], want, s)


def test_pii_redact_vs_python_re(spark):
    sdf = spark.createDataFrame(
        [(i, s) for i, s in enumerate(PII_SAMPLES)], "i long, t string"
    )
    got = {
        r["i"]: r["red"]
        for r in sdf.select("i", text.pii_redact("t").alias("red")).collect()
    }
    for i, s in enumerate(PII_SAMPLES):
        want = s
        for name in sorted(text.PII_PATTERNS):
            want = re.sub(text.PII_PATTERNS[name], f"<{name.upper()}>", want)
        assert got[i] == want, (i, got[i], want)
        assert "@" not in got[i].replace("<EMAIL>", "")


# ------------------------------------------------------------- det.dyadic
def test_dyadic_values_are_exact_doubles():
    vals = [0.2, 0.3, 0.5, 1 / 3, math.pi / 10, 1e-9, 0.0, 1.0]
    q = det.dyadic(vals)
    for v, d in zip(vals, q):
        # exactly representable: scaling by 2^38 yields an integer
        assert (d * (1 << 38)) == int(d * (1 << 38))
        assert abs(v - d) <= 2.0 ** -39  # nearest-grid rounding bound


def test_dyadic_dot_products_fold_exactly():
    # with 6-bit integer data and dyadic weights, the fold is exact: any
    # association order gives the same double
    w = det.dyadic([0.12345, 0.54321, 0.33333])
    xs = [17.0, 50.0, 3.0]
    terms = [wi * xi for wi, xi in zip(w, xs)]
    left = (terms[0] + terms[1]) + terms[2]
    right = terms[0] + (terms[1] + terms[2])
    assert left == right
    # and matches an exact-arithmetic evaluation
    from fractions import Fraction

    exact = sum(Fraction(wi) * Fraction(xi) for wi, xi in zip(w, xs))
    assert Fraction(left) == exact


# -------------------------------------------------- lsum decimal accumulator
def test_lsum_does_not_wrap_past_2_63(spark):
    # 2000 values of 9e12: scaled by 1e6 -> 9e18 each partial step crosses
    # 2^63 ~ 9.22e18 almost immediately; a LONG accumulator wraps negative
    n, v = 2000, 9.0e12
    sdf = spark.range(n).select(F.lit(v).alias("x"))
    out = sdf.agg(det.lsum("x").alias("s")).collect()[0]["s"]
    assert int(out) == n * int(v * 1e6)
    assert int(out) > 2**63  # the point: the true sum exceeds LONG range


def test_fsum_matches_exact_sum_at_scale(spark):
    # per-VALUE magnitudes stay inside lsum's caller contract
    # (|x|*10^6 < 2^62) while the ACCUMULATED scaled sum crosses 2^63
    n, step = 1500, 4.000001e9
    sdf = spark.range(n).select((F.col("id").cast("double") * step).alias("x"))
    got = sdf.agg(det.fsum("x").alias("s")).collect()[0]["s"]
    want = sum(i * step for i in range(n))
    assert sum(int(i * step * 1e6) for i in range(n)) > 2**63
    assert got == pytest.approx(want, rel=1e-12)


def test_repetition_profile_fuzz_vs_python(spark):
    """Randomized word-soup docs over a tiny alphabet (forces repeats,
    gram ties, and short docs) vs the straight-line Python twin."""
    import random

    rng = random.Random(707)
    vocab = ["a", "bb", "ccc", "dd", "e"]
    docs = []
    for i in range(60):
        n = rng.choice([1, 2, 3, 4, 7, 15, 40])
        docs.append((i, " ".join(rng.choice(vocab) for _ in range(n))))
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: r.asDict()
        for r in text.repetition_profile(sdf, "doc_id", "text").collect()
    }
    for i, s in docs:
        want = _py_repetition(i, s)
        for k, wv in want.items():
            gv = got[i][k]
            if isinstance(wv, float):
                assert gv == pytest.approx(wv, abs=1e-12), (i, k, gv, wv, s)
            else:
                assert gv == wv, (i, k, gv, wv, s)


# ------------------------------------------------------------- chunk_tokens
def _py_chunks(s, max_tokens, overlap):
    toks = s.strip().split()
    stride = max_tokens - overlap
    starts = list(range(0, max(len(toks) - overlap, 1), stride))
    return [
        (ci, toks[st : st + max_tokens]) for ci, st in enumerate(starts)
    ]


@pytest.mark.parametrize("max_tokens,overlap", [(16, 4), (8, 0), (5, 4)])
def test_chunk_tokens_vs_python(spark, max_tokens, overlap):
    docs = [
        (0, "one"),                                   # shorter than window
        (1, " ".join(f"w{i}" for i in range(16))),    # exactly one window
        (2, " ".join(f"w{i}" for i in range(17))),    # one token past
        (3, " ".join(f"w{i}" for i in range(100))),   # many chunks
        (4, " ".join(f"w{i}" for i in range(20))),    # tail shorter than overlap
    ]
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    got = {}
    rows = text.chunk_tokens(
        sdf, "doc_id", "text", max_tokens=max_tokens, overlap=overlap
    ).collect()
    for r in rows:
        got[(r["doc_id"], r["chunk_id"])] = (r["n_chunk_tokens"], r["chunk_text"])
    want_total = 0
    for i, s in docs:
        for ci, chunk in _py_chunks(s, max_tokens, overlap):
            want_total += 1
            assert got[(i, ci)] == (len(chunk), " ".join(chunk)), (i, ci)
    assert len(rows) == want_total


def test_chunk_tokens_rejects_bad_overlap(spark):
    sdf = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        text.chunk_tokens(sdf, "doc_id", "text", max_tokens=4, overlap=4)


# ----------------------------------------------------- real BMP/WAV decode
def test_bmp_roundtrip_exact():
    from parallel_pandas_spark.operators import multimodal as mm

    for i, w, h in [(0, 4, 3), (6, 10, 7), (2, 11, 4)]:  # odd strides too
        blob = mm.encode_bmp(w, h, lambda x, y, c: (i + 11*x + 7*y + 3*c) % 256)
        d = mm.decode_bmp(blob)
        vals = [
            ((i + 11*x + 7*y + 3*c) % 256, x, y, c)
            for x in range(w) for y in range(h) for c in range(3)
        ]
        assert (d["width"], d["height"]) == (w, h)
        assert d["n_bytes"] == 54 + ((3*w + 3)//4*4) * h == len(blob)
        assert d["mean"] == sum(v for v, *_ in vals) / (w*h*3)
        assert d["wsum"] == sum(v * (1 + x + 2*y + 5*c) for v, x, y, c in vals)


def test_wav_roundtrip_exact():
    import math

    from parallel_pandas_spark.operators import multimodal as mm

    samples = [((7*31 + 7*k) % 1000) - 500 for k in range(83)]
    d = mm.decode_wav(mm.encode_wav(20000, samples))
    assert (d["sample_rate"], d["n_samples"]) == (20000, 83)
    assert d["mean"] == sum(samples) / 83
    assert d["rms"] == math.sqrt(sum(s*s for s in samples) / 83)
    assert d["wsum"] == sum(s * (1 + k) for k, s in enumerate(samples))


def test_decoders_reject_garbage():
    from parallel_pandas_spark.operators import multimodal as mm

    with pytest.raises(ValueError):
        mm.decode_bmp(b"not a bitmap at all....")
    with pytest.raises(ValueError):
        mm.decode_wav(b"RIFFxxxxNOPE")
    # truncated-but-valid-magic BMP must not silently decode
    good = mm.encode_bmp(4, 3, lambda x, y, c: 0)
    with pytest.raises(Exception):
        mm.decode_bmp(good[:30])


def test_resize_bmp_mean_pool_exact():
    import numpy as np

    from parallel_pandas_spark.operators import multimodal as mm

    i, w, h = 4, 10, 7  # crops to 10x6 at factor 2
    blob = mm.encode_bmp(w, h, lambda x, y, c: (i + 11*x + 7*y + 3*c) % 256)
    out = mm.resize_bmp(blob, 2)
    px = mm._bmp_pixels(out)
    assert px.shape == (3, 5, 3)
    src = np.array(
        [[[(i + 11*x + 7*y + 3*c) % 256 for c in range(3)]
          for x in range(w)] for y in range(h)], dtype=np.int64
    )
    want = src[:6, :10].reshape(3, 2, 5, 2, 3).sum(axis=(1, 3)) // 4
    assert (px.astype(np.int64) == want).all()
    with pytest.raises(ValueError):
        mm.resize_bmp(mm.encode_bmp(3, 3, lambda x, y, c: 0), 4)


def test_resize_media_distributed(spark):
    from parallel_pandas_spark.operators import multimodal as mm

    blobs = [(i, mm.encode_bmp(8, 6, lambda x, y, c, i=i: (i + x + y + c) % 256))
             for i in range(6)]
    sdf = spark.createDataFrame(blobs, "doc_id long, blob binary")
    got = {r["doc_id"]: bytes(r["resized"])
           for r in mm.resize_media(sdf, "doc_id", "blob", factor=2).collect()}
    for i, blob in blobs:
        assert got[i] == mm.resize_bmp(blob, 2), i
        d = mm.decode_bmp(got[i])
        assert (d["width"], d["height"]) == (4, 3)


# ---------------------------------------------------- embedding quantization
def test_quantize_embeddings_roundtrip_error_bound(spark):
    import numpy as np

    from parallel_pandas_spark.operators import similarity

    rng = np.random.default_rng(9)
    vecs = [(i, [float(x) for x in rng.normal(0, 1, 16)]) for i in range(20)]
    vecs.append((20, [0.0] * 16))  # zero vector: scale 0, codes 0
    sdf = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    rows = similarity.quantize_embeddings(sdf, "vec_id", "embedding").collect()
    by_id = {r["vec_id"]: r for r in rows}
    for i, v in vecs:
        r = by_id[i]
        s = max(abs(x) for x in v)
        assert r["scale"] == pytest.approx(s, abs=0)
        for x, code in zip(v, r["codes"]):
            assert abs(code) <= 127
            if s:
                # dequantization error bounded by half a quantization step
                assert abs(code * s / 127.0 - x) <= s / 127.0 / 2 + 1e-12
            else:
                assert code == 0


def test_quantized_topk_recall_vs_exact(spark, sf_small):
    from parallel_pandas_spark.operators import similarity
    from parallel_pandas_spark.sources import load_table

    emb = load_table(spark, sf_small, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    exact = similarity.cosine_topk(emb, queries, "vec_id", "embedding", k=5)
    quant = similarity.quantized_cosine_topk(emb, queries, "vec_id", "embedding", k=5)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    q = {(r["query_id"], r["neighbor_id"]) for r in quant.collect()}
    recall = len(e & q) / len(e)
    # int8 quantization is near-lossless for top-k ranking
    assert recall >= 0.9, recall


def test_quantized_topk_vectorized_matches_fold(spark, sf_small):
    """The Arrow-matmul score path (r8) must be BIT-identical to the
    JVM zip_with fold path: both compute the same exact int64 dots, and
    divide/sqrt/round run in the same Spark expressions."""
    from parallel_pandas_spark.operators import similarity
    from parallel_pandas_spark.sources import load_table

    emb = load_table(spark, sf_small, "embeddings")
    queries = emb.where(F.col("vec_id") < 8)
    vec = similarity.quantized_cosine_topk(
        emb, queries, "vec_id", "embedding", k=5, vectorized=True
    )
    fold = similarity.quantized_cosine_topk(
        emb, queries, "vec_id", "embedding", k=5, vectorized=False
    )
    v = {(r["query_id"], r["rank"]): (r["neighbor_id"], r["qcosine"])
         for r in vec.collect()}
    f = {(r["query_id"], r["rank"]): (r["neighbor_id"], r["qcosine"])
         for r in fold.collect()}
    assert v == f


def test_quantize_embeddings_scale_staged_once(spark):
    """The scale (array_max fold) must appear ONCE in the optimized plan:
    inlined into the per-element code lambda it would be re-evaluated per
    element — O(d^2) per row (the repetition_profile staging lesson).
    Control: if Catalyst's CollapseProject ever starts substituting the
    staged column back into the lambda, this count rises and the staging
    needs a fence."""
    from parallel_pandas_spark.operators import similarity

    sdf = spark.createDataFrame(
        [(1, [1.0, -2.0, 3.0])], "vec_id long, embedding array<double>"
    )
    out = similarity.quantize_embeddings(sdf, "vec_id", "embedding")
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("array_max") == 1, plan


def test_pii_patterns_three_way_dialect_fuzz(spark):
    """The pii oracle assumes Java regex (Spark), RE2 (DuckDB), and
    Python re agree on PII_PATTERNS. Fuzz that assumption directly:
    random strings over a PII-shaped alphabet, counts compared across
    all three engines."""
    import random

    import duckdb

    rng = random.Random(4242)
    alphabet = list("ab9@.-+ 0127|x")
    frags = ["a@b.co", "1-23", "10.0.0.1", "123-45-6789", "+1-555-123-4567",
             "@", "..", "--", " "]
    docs = []
    for i in range(120):
        parts = [
            "".join(rng.choice(alphabet) for _ in range(rng.randrange(1, 9)))
            if rng.random() < 0.6 else rng.choice(frags)
            for _ in range(rng.randrange(1, 8))
        ]
        docs.append((i, rng.choice(["", " "]).join(parts)))

    sdf = spark.createDataFrame(docs, "i long, t string")
    counts = text.pii_counts("t")
    got_spark = {
        r["i"]: r.asDict()
        for r in sdf.select("i", *[c.alias(n) for n, c in counts.items()]).collect()
    }
    con = duckdb.connect()
    pdf = pd.DataFrame(docs, columns=["i", "t"])
    con.register("df", pdf)
    for name, pat in text.PII_PATTERNS.items():
        duck = dict(con.execute(
            "SELECT i, len(regexp_extract_all(t, ?)) FROM df", [pat]
        ).fetchall())
        for i, s in docs:
            py = len(re.findall(pat, s))
            assert got_spark[i][name] == py == duck[i], (name, i, s,
                                                         got_spark[i][name], py, duck[i])


# -------------------------------------------------------- repeated spans
def test_repeated_spans_vs_python(spark):
    from collections import defaultdict

    from parallel_pandas_spark.operators import dedup

    docs = [
        (0, "the quick brown fox jumps over the lazy dog today"),
        (1, "we saw the quick brown fox jumps over a fence"),   # shares a 5-span? no: 6-token windows
        (2, "the quick brown fox jumps over the lazy dog today"),  # exact dup of 0
        (3, "short doc"),
        (4, "short doc"),                                       # whole-text span dup
        (5, "totally different words in this one here now ok"),
    ]
    span_n = 6
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["span_h"]: (r["n_docs"], r["first_doc"], r["last_doc"], r["sum_doc_ids"])
        for r in dedup.repeated_spans(sdf, "doc_id", "text",
                                      span_tokens=span_n, min_docs=2).collect()
    }
    # python twin
    import hashlib

    byspan = defaultdict(list)
    for i, s in docs:
        toks = s.split()
        if len(toks) >= span_n:
            spans = {" ".join(toks[j:j+span_n]) for j in range(len(toks)-span_n+1)}
        else:
            spans = {" ".join(toks)}
        for sp in spans:
            byspan[sp].append(i)
    want = {
        hashlib.md5(sp.encode()).hexdigest(): (len(ids), min(ids), max(ids), sum(ids))
        for sp, ids in byspan.items() if len(ids) >= 2
    }
    assert got == want
    # doc 1 shares words but no 6-token window with doc 0; docs 0/2 share
    # all windows; docs 3/4 collide on the whole-text pseudo-span
    assert any(v[0] == 2 and v[1] == 0 and v[2] == 2 for v in got.values())
    assert any(v[1] == 3 and v[2] == 4 for v in got.values())
