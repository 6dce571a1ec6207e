"""Round-9 surface: dirty-corpus semantics of the vectorized quantized
scorer, deterministic streaming drain (see test_streaming.py for the
stress tests), and the r9 operators."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402


def _emb_with_dirt(spark):
    """8 clean 4-d vectors + one NULL + one ragged (3-d) corpus row."""
    rows = [(i, [float(i + j) for j in range(4)]) for i in range(8)]
    rows.append((100, None))
    rows.append((101, [1.0, 2.0, 3.0]))
    return spark.createDataFrame(
        rows,
        T.StructType(
            [
                T.StructField("vec_id", T.LongType()),
                T.StructField("embedding", T.ArrayType(T.DoubleType())),
            ]
        ),
    )


def test_quantized_vectorized_dirty_corpus_matches_fold(spark):
    """r8 ADVICE (medium): a null or ragged corpus vector must NOT fail
    the vectorized matmul path — it degrades to a NULL qcosine for that
    pair, exactly like the zip_with fold path. Asserted by full top-k
    equality between vectorized=True and vectorized=False on a corpus
    containing both a NULL and a wrong-dimension vector."""
    from parallel_pandas_spark.operators import similarity

    emb = _emb_with_dirt(spark)
    queries = emb.where(F.col("vec_id") < 3)
    vec = similarity.quantized_cosine_topk(
        emb, queries, "vec_id", "embedding", k=9, vectorized=True
    )
    fold = similarity.quantized_cosine_topk(
        emb, queries, "vec_id", "embedding", k=9, vectorized=False
    )
    v = {(r["query_id"], r["rank"]): (r["neighbor_id"], r["qcosine"])
         for r in vec.collect()}
    f = {(r["query_id"], r["rank"]): (r["neighbor_id"], r["qcosine"])
         for r in fold.collect()}
    assert v == f and len(v) > 0


def test_quantized_vectorized_null_element_matches_fold(spark):
    """r9 review finding: a NULL ELEMENT inside a correct-length vector
    flattens to NaN on the Arrow transfer, so the vectorized path used
    to score it NaN (sorts FIRST) where the fold path scores it NULL
    (sorts last) — the dirty row surfaced as rank 1. The JVM __hasnull
    flag restores fold parity; asserted for null elements on BOTH the
    corpus and the query side, plus a genuine-NaN element which must
    keep its (distinct) NaN semantics in both paths."""
    rows = [(i, [float(i + j) for j in range(4)]) for i in range(6)]
    rows.append((50, [1.0, None, 3.0, 4.0]))  # null element, right length
    rows.append((51, [float("nan"), 1.0, 2.0, 3.0]))  # true NaN element
    df = spark.createDataFrame(
        rows,
        T.StructType(
            [
                T.StructField("vec_id", T.LongType()),
                T.StructField("embedding", T.ArrayType(T.DoubleType())),
            ]
        ),
    )
    from parallel_pandas_spark.operators import similarity

    queries = df.where((F.col("vec_id") < 2) | (F.col("vec_id") == 50))
    vec = similarity.quantized_cosine_topk(
        df, queries, "vec_id", "embedding", k=8, vectorized=True
    )
    fold = similarity.quantized_cosine_topk(
        df, queries, "vec_id", "embedding", k=8, vectorized=False
    )

    def canon(rows_):
        # NaN != NaN breaks tuple equality; compare via repr
        return sorted(
            (r["query_id"], r["rank"], r["neighbor_id"], repr(r["qcosine"]))
            for r in rows_
        )

    v, f = canon(vec.collect()), canon(fold.collect())
    assert v == f and len(v) > 0


def test_pq_topk_dirty_inputs_no_crash(spark):
    """r9 review finding: null/ragged/null-element QUERY vectors made
    pq_topk throw at DataFrame-construction time, and a dirty corpus
    vector in the md5 sample broke pq_codebooks. Both now follow the
    documented drop policy."""
    rows = [(i, [float(i + j) for j in range(8)]) for i in range(30)]
    rows += [(100, None), (101, [1.0] * 3), (102, [1.0, None] + [2.0] * 6)]
    df = spark.createDataFrame(
        rows,
        T.StructType(
            [
                T.StructField("vec_id", T.LongType()),
                T.StructField("embedding", T.ArrayType(T.DoubleType())),
            ]
        ),
    )
    from parallel_pandas_spark.operators import similarity

    queries = df.where((F.col("vec_id") < 2) | (F.col("vec_id") >= 100))
    out = similarity.pq_topk(
        df, queries, "vec_id", "embedding", k=3, m=4, ks=8, dim=8, pool=10
    )
    got = out.collect()
    qids = {r["query_id"] for r in got}
    assert qids == {0, 1}, qids  # dirty queries dropped, clean ones served
    assert all(r["neighbor_id"] < 100 for r in got)  # dirty corpus dropped


def test_quantized_vectorized_null_query_matches_fold(spark):
    """A NULL query vector produces NULL qcosine pairs in both paths
    (never a driver-side TypeError building the query matrix)."""
    from parallel_pandas_spark.operators import similarity

    emb = _emb_with_dirt(spark).where(F.col("vec_id") < 8)
    queries = _emb_with_dirt(spark).where(
        (F.col("vec_id") < 2) | (F.col("vec_id") == 100)
    )
    vec = similarity.quantized_cosine_topk(
        emb, queries, "vec_id", "embedding", k=9, vectorized=True
    )
    fold = similarity.quantized_cosine_topk(
        emb, queries, "vec_id", "embedding", k=9, vectorized=False
    )
    assert sorted(map(tuple, vec.collect())) == sorted(map(tuple, fold.collect()))


def test_quantize_arrow_bit_parity_fixture(spark, sf_small):
    """The Arrow quantizer must be BIT-identical to the HOF expression
    path on real fixture embeddings: same scale doubles, same int codes,
    and the fused norm equal to the _int_norm fold."""
    from parallel_pandas_spark.operators import similarity
    from parallel_pandas_spark.sources import load_table

    emb = load_table(spark, sf_small, "embeddings")
    hof = similarity.quantize_embeddings(emb, "vec_id", "embedding")
    hof = hof.select(
        "vec_id", "scale", "codes",
        similarity._int_norm(F.col("codes")).alias("norm"),
    )
    arrow = similarity._quantize_arrow(emb, "vec_id", "embedding", with_norm=True)
    h = {r["vec_id"]: (r["scale"], list(r["codes"]), r["norm"]) for r in hof.collect()}
    a = {r["vec_id"]: (r["scale"], list(r["codes"]), r["norm"]) for r in arrow.collect()}
    assert h == a and len(h) > 0


def test_quantize_arrow_bit_parity_edges(spark):
    """Null vector, empty vector, zero vector, negative-tie values (the
    HALF_UP boundary: -2.5/5*127 = -63.5 must round AWAY from zero),
    and ragged lengths — all bit-equal to the HOF path."""
    from parallel_pandas_spark.operators import similarity

    rows = [
        (0, [1.0, -2.5, 5.0, 0.5]),
        (1, None),
        (2, []),
        (3, [0.0, 0.0]),
        (4, [-1.0, 1.0, 1.0]),
        (5, [63.5, -63.5, 127.0, -127.0, 1e-30]),
    ]
    df = spark.createDataFrame(
        rows,
        T.StructType(
            [
                T.StructField("vec_id", T.LongType()),
                T.StructField("embedding", T.ArrayType(T.DoubleType())),
            ]
        ),
    )
    hof = similarity.quantize_embeddings(df, "vec_id", "embedding")
    arrow = similarity._quantize_arrow(df, "vec_id", "embedding")
    h = {r["vec_id"]: (r["scale"], None if r["codes"] is None else list(r["codes"]))
         for r in hof.collect()}
    a = {r["vec_id"]: (r["scale"], None if r["codes"] is None else list(r["codes"]))
         for r in arrow.collect()}
    assert h == a


w = None  # set lazily to avoid importing pyspark modules at collection


def _w(*a, **k):
    from parallel_pandas_spark.operators import windows

    return windows.win_type_weights(*a, **k)


def test_lanczos_closed_form():
    """sinc(2i/(M−1) − 1) at M=5: x = −1, −1/2, 0, 1/2, 1 →
    [0, 2/π, 1, 2/π, 0] exactly."""
    import math

    got = _w("lanczos", 5)
    assert got == pytest.approx([0.0, 2 / math.pi, 1.0, 2 / math.pi, 0.0], abs=1e-15)


def test_general_cosine_twins_named_shapes():
    """general_cosine with a named shape's published coefficients must be
    bit-equal to that shape (scipy defines the named windows THROUGH
    general_cosine)."""
    assert _w("general_cosine", 7, a=[0.54, 0.46]) == _w("hamming", 7)
    assert _w("general_cosine", 8, a=[0.42, 0.5, 0.08]) == _w("blackman", 8)


def test_general_hamming_twin():
    # approx, not bit-equal: general_hamming computes 1−alpha at runtime
    # (0.45999999999999996) while the named table stores the 0.46
    # literal — the same last-ulp difference scipy itself has
    assert _w("general_hamming", 9, alpha=0.54) == pytest.approx(
        _w("hamming", 9), abs=1e-15
    )
    # alpha=0.5 is hann
    assert _w("general_hamming", 6, alpha=0.5) == pytest.approx(_w("hann", 6), abs=0)


def test_general_gaussian_twin():
    """p=1 degenerates to the plain gaussian."""
    assert _w("general_gaussian", 7, p=1.0, sig=2.0) == pytest.approx(
        _w("gaussian", 7, std=2.0), abs=1e-15
    )
    # p=0.5 is the Poisson/exponential shape family: exp(−0.5|n/sig|)
    import math

    got = _w("general_gaussian", 5, p=0.5, sig=2.0)
    exp = [math.exp(-0.5 * abs((i - 2.0) / 2.0)) for i in range(5)]
    assert got == pytest.approx(exp, abs=1e-15)


def _dtft_mag(weights, n_freq=4096):
    import numpy as np

    w_ = np.asarray(weights)
    n = np.arange(len(w_))
    om = np.linspace(0, np.pi, n_freq)
    return np.abs(np.exp(-1j * np.outer(om, n)) @ w_)


def test_chebwin_equiripple_property():
    """The DEFINING Dolph-Chebyshev property, checked independently of
    the FFT construction: every sidelobe of the DTFT sits at exactly
    −at dB relative to the mainlobe (equiripple), and the window is
    symmetric with max 1."""
    import numpy as np

    for M, at in [(11, 40.0), (12, 60.0), (21, 50.0)]:
        got = _w("chebwin", M, at=at)
        assert len(got) == M
        assert got == pytest.approx(got[::-1], abs=1e-9), "not symmetric"
        assert max(got) == pytest.approx(1.0, abs=0)
        mag = _dtft_mag(got)
        main = mag[0]
        # find local maxima beyond the main lobe
        lobes = [
            mag[i]
            for i in range(2, len(mag) - 1)
            if mag[i] >= mag[i - 1] and mag[i] >= mag[i + 1]
        ]
        assert lobes, "no sidelobes found"
        want = main * 10.0 ** (-at / 20.0)
        for lv in lobes:
            # sampled maxima sit AT or just below the true lobe peak
            # (grid resolution), never above the equiripple level
            assert lv <= want * (1 + 1e-9)
            assert lv >= want * (1 - 1e-3)


def test_taylor_properties():
    """norm=True pins the center sample of an odd window to exactly 1;
    the first nbar−1 sidelobes sit near −sll dB (the design target) and
    the window is symmetric."""
    got = _w("taylor", 21, nbar=4, sll=30.0)
    assert got == pytest.approx(got[::-1], abs=1e-12)
    assert got[10] == pytest.approx(1.0, abs=1e-12)
    mag = _dtft_mag(got)
    main = mag[0]
    lobes = [
        mag[i]
        for i in range(2, len(mag) - 1)
        if mag[i] >= mag[i - 1] and mag[i] >= mag[i + 1]
    ]
    import math

    first = 20.0 * math.log10(lobes[0] / main)
    assert first == pytest.approx(-30.0, abs=1.5), first
    # unnormalized form is exactly the normalized one scaled by its own
    # center value W((M-1)/2) — element-wise, not just at the center
    raw = _w("taylor", 21, nbar=4, sll=30.0, norm=False)
    assert raw[10] > 1.0  # W(center) > 1 for sll=30/nbar=4
    assert raw == pytest.approx([v * raw[10] for v in got], rel=1e-12)


def test_dpss_concentration_optimality():
    """The DEFINING Slepian property, independent of the eigensolve: the
    dpss window maximizes spectral energy concentration in [−W, W] among
    ALL length-M sequences — so its concentration ratio must beat every
    other shape in the catalog at the same M, and it must satisfy its
    own eigen-equation."""
    import numpy as np

    M, NW = 21, 2.5
    W = NW / M
    got = np.array(_w("dpss", M, NW=NW))
    assert got.max() == pytest.approx(1.0, abs=0)
    assert got == pytest.approx(got[::-1], abs=1e-9), "not symmetric"

    def concentration(w):
        w = np.asarray(w, dtype=float)
        n = np.arange(M)
        # lambda = (wᵀ A w)/(wᵀ w) with A[i,j] = sin(2πW(i−j))/(π(i−j))
        diffs = n[:, None] - n[None, :]
        with np.errstate(invalid="ignore", divide="ignore"):
            A = np.where(
                diffs == 0, 2.0 * W, np.sin(2 * np.pi * W * diffs) / (np.pi * diffs)
            )
        return float(w @ A @ w) / float(w @ w)

    lam = concentration(got)
    assert lam > 0.99  # NW=2.5 concentrates essentially all energy
    others = {
        "hann": _w("hann", M),
        "hamming": _w("hamming", M),
        "blackman": _w("blackman", M),
        "kaiser": _w("kaiser", M, beta=8.0),
        "gaussian": _w("gaussian", M, std=3.0),
        "chebwin": _w("chebwin", M, at=60.0),
        "taylor": _w("taylor", M),
        "boxcar": _w("boxcar", M),
    }
    for name, w in others.items():
        assert lam >= concentration(w) - 1e-12, name

    # eigen-residual: T v = λ v for the tridiagonal concentration matrix
    i = np.arange(M)
    import math

    diag = ((M - 1 - 2.0 * i) / 2.0) ** 2 * math.cos(2.0 * math.pi * W)
    off = i[1:] * (M - i[1:]) / 2.0
    T = np.diag(diag) + np.diag(off, 1) + np.diag(off, -1)
    v = got / np.linalg.norm(got)
    tv = T @ v
    ray = float(v @ tv)
    assert np.allclose(tv, ray * v, atol=1e-8)


def test_pq_topk_recall_and_exact_values(spark, sf_small):
    """PQ/ADC + exact re-rank: (1) recall@5 vs the exact arm clears a
    floor at iters=0 and does not degrade with Lloyd refinement (the
    fixture is deterministic, so both numbers are stable); (2) every
    returned cosine is the EXACT rounded cosine — the approximation may
    only affect WHICH pairs are returned, never their values."""
    from parallel_pandas_spark.operators import similarity
    from parallel_pandas_spark.sources import load_table

    emb = load_table(spark, sf_small, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    exact_all = similarity.cosine_topk(
        emb, queries, "vec_id", "embedding", k=1_000_000, include_self=False
    )
    truth = {
        (r["query_id"], r["neighbor_id"]): r["cosine"] for r in exact_all.collect()
    }
    top5 = similarity.cosine_topk(emb, queries, "vec_id", "embedding", k=5)
    e = {(r["query_id"], r["neighbor_id"]) for r in top5.collect()}

    recalls = {}
    for iters in (0, 2):
        pq = similarity.pq_topk(
            emb, queries, "vec_id", "embedding", k=5, pool=50, iters=iters
        )
        rows = pq.collect()
        p = {(r["query_id"], r["neighbor_id"]) for r in rows}
        recalls[iters] = len(e & p) / len(e)
        for r in rows:  # exactness of values
            assert truth[(r["query_id"], r["neighbor_id"])] == r["cosine"]
    assert recalls[0] >= 0.3, recalls
    assert recalls[2] >= recalls[0], recalls


def test_pq_encode_code_range(spark, sf_small):
    """Codes are in [0, ks) for every subspace — one scan, no shuffle."""
    from parallel_pandas_spark.operators import similarity
    from parallel_pandas_spark.sources import load_table

    emb = load_table(spark, sf_small, "embeddings")
    books = similarity.pq_codebooks(emb, "vec_id", "embedding", m=8, ks=16)
    codes = similarity.pq_encode(emb, books, "vec_id", "embedding")
    agg = codes.agg(
        *[F.min(f"c{s}").alias(f"lo{s}") for s in range(8)],
        *[F.max(f"c{s}").alias(f"hi{s}") for s in range(8)],
    ).collect()[0]
    for s in range(8):
        assert 0 <= agg[f"lo{s}"] and agg[f"hi{s}"] <= 15


def test_quantized_prune_lossless_multipartition(spark):
    """The map-side top-k prune (r9) must be LOSSLESS across partitions:
    random vectors engineered with many near-ties (values quantized to a
    coarse grid so rounded-score ties + id tiebreaks actually occur),
    spread over 8 partitions so every batch prunes independently — the
    pruned vectorized result must equal the unpruned fold path exactly."""
    import random

    rnd = random.Random(421)
    rows = []
    for i in range(300):
        # coarse grid → frequent exact ties in the rounded cosine
        rows.append((i, [float(rnd.choice([-2, -1, 0, 1, 2])) for _ in range(8)]))
    rows.append((900, None))  # dirty row exercises the NULL tail
    df = spark.createDataFrame(
        rows,
        T.StructType(
            [
                T.StructField("vec_id", T.LongType()),
                T.StructField("embedding", T.ArrayType(T.DoubleType())),
            ]
        ),
    ).repartition(8)
    from parallel_pandas_spark.operators import similarity

    queries = df.where(F.col("vec_id") < 6)
    vec = similarity.quantized_cosine_topk(
        df, queries, "vec_id", "embedding", k=7, vectorized=True
    )
    fold = similarity.quantized_cosine_topk(
        df, queries, "vec_id", "embedding", k=7, vectorized=False
    )
    v = sorted(map(tuple, vec.collect()))
    f = sorted(map(tuple, fold.collect()))
    assert v == f and len(v) > 0


# --- baseline JPEG codec -------------------------------------------------


def _mm():
    from parallel_pandas_spark.operators import multimodal

    return multimodal


def test_jpeg_dc_only_lossless_roundtrip():
    """The fixture construction is lossless BY DESIGN: DC-only blocks
    with q[0,0]=8 survive quantize→huffman→decode bit-for-bit, including
    the 4:2:0 chroma upsampling layout."""
    import numpy as np

    mm = _mm()
    for i, ln in [(0, 0), (3, 1), (4, 3), (7, 2)]:
        w, h = 16 * (1 + i % 2), 16 * (1 + ln % 2)

        def dcb(v):
            b = [[0] * 8 for _ in range(8)]
            b[0][0] = v - 128
            return b

        yb = {(by, bx): dcb((i + 7 * bx + 11 * by) % 256)
              for by in range(h // 8) for bx in range(w // 8)}
        cb = {(my, mx): dcb((i + 3 * mx + 5 * my) % 256)
              for my in range(h // 16) for mx in range(w // 16)}
        cr = {(my, mx): dcb((2 * i + mx + 7 * my) % 256)
              for my in range(h // 16) for mx in range(w // 16)}
        planes, W, H = mm._jpeg_planes(mm.encode_jpeg_coeffs(w, h, yb, cb, cr))
        assert (W, H) == (w, h)
        exp_y = np.array([[(i + 7 * (x // 8) + 11 * (y // 8)) % 256
                           for x in range(w)] for y in range(h)])
        exp_cb = np.array([[(i + 3 * (x // 16) + 5 * (y // 16)) % 256
                            for x in range(w)] for y in range(h)])
        exp_cr = np.array([[(2 * i + (x // 16) + 7 * (y // 16)) % 256
                            for x in range(w)] for y in range(h)])
        assert np.array_equal(planes[0], exp_y)
        assert np.array_equal(planes[1], exp_cb)
        assert np.array_equal(planes[2], exp_cr)


def test_jpeg_idct_basis_closed_form():
    """A single AC basis coefficient IDCTs to the published cosine
    pattern — checked against an independent direct evaluation, so the
    matrix construction can't self-confirm a transposed basis."""
    import math

    import numpy as np

    mm = _mm()
    for (u, v) in [(0, 1), (1, 0), (2, 3), (7, 7)]:
        coef = np.zeros((8, 8))
        coef[u, v] = 64.0
        got = mm._idct2(coef)
        cu = (1 / math.sqrt(2)) if u == 0 else 1.0
        cv = (1 / math.sqrt(2)) if v == 0 else 1.0
        exp = np.array([
            [64.0 * 0.25 * cu * cv
             * math.cos((2 * y + 1) * u * math.pi / 16)
             * math.cos((2 * x + 1) * v * math.pi / 16)
             for x in range(8)] for y in range(8)
        ])
        assert np.allclose(got, exp, atol=1e-12)


def test_jpeg_general_coeffs_roundtrip_fuzz():
    """Hypothesis fuzz of the GENERAL entropy path (runs, ZRL, EOB, sign
    extension, predictor chain): random quantized coefficient blocks and
    quant tables roundtrip to exactly the reference dequant+IDCT+clamp
    pixels — grayscale and 4:2:0 color."""
    import numpy as np
    from hypothesis import given, settings, strategies as st

    mm = _mm()

    @settings(max_examples=25, deadline=None)
    @given(st.data())
    def run(data):
        rng_seed = data.draw(st.integers(0, 2**31 - 1))
        rng = np.random.default_rng(rng_seed)
        color = data.draw(st.booleans())
        mcu = 16 if color else 8
        w = mcu * data.draw(st.integers(1, 2))
        h = mcu * data.draw(st.integers(1, 2))
        qt = rng.integers(1, 33, size=(8, 8)).tolist()

        def rblock():
            b = np.zeros((8, 8), dtype=np.int64)
            nnz = rng.integers(0, 12)
            for _ in range(int(nnz)):
                b[rng.integers(0, 8), rng.integers(0, 8)] = rng.integers(-500, 500)
            return b

        yb = {(by, bx): rblock().tolist()
              for by in range(h // 8) for bx in range(w // 8)}
        if color:
            cbb = {(my, mx): rblock().tolist()
                   for my in range(h // 16) for mx in range(w // 16)}
            crb = {(my, mx): rblock().tolist()
                   for my in range(h // 16) for mx in range(w // 16)}
            blob = mm.encode_jpeg_coeffs(w, h, yb, cbb, crb, qt_luma=qt, qt_chroma=qt)
        else:
            blob = mm.encode_jpeg_coeffs(w, h, yb, qt_luma=qt)
        planes, W, H = mm._jpeg_planes(blob)
        assert (W, H) == (w, h)
        qtn = np.array(qt)

        def ref_plane(blocks, bw, bh):
            p = np.zeros((bh * 8, bw * 8))
            for (by, bx), c in blocks.items():
                px = np.clip(
                    np.round(mm._idct2(np.array(c, dtype=float) * qtn) + 128.0),
                    0, 255,
                )
                p[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] = px
            return p.astype(np.uint8)

        assert np.array_equal(planes[0], ref_plane(yb, w // 8, h // 8))
        if color:
            up = lambda p: np.repeat(np.repeat(p, 2, axis=0), 2, axis=1)
            assert np.array_equal(planes[1], up(ref_plane(cbb, w // 16, h // 16)))
            assert np.array_equal(planes[2], up(ref_plane(crb, w // 16, h // 16)))

    run()


def test_jpeg_error_paths():
    """Named raises: non-baseline SOF, restart intervals, foreign bytes,
    truncated entropy stream."""
    mm = _mm()

    def dcb(v):
        b = [[0] * 8 for _ in range(8)]
        b[0][0] = v
        return b

    blob = bytearray(mm.encode_jpeg_coeffs(8, 8, {(0, 0): dcb(10)}))
    # flip SOF0 (0xC0) to SOF2 (progressive)
    i = blob.find(b"\xff\xc0")
    prog = bytes(blob[:i + 1]) + b"\xc2" + bytes(blob[i + 2:])
    with pytest.raises(ValueError, match="SOF0"):
        mm._jpeg_planes(prog)
    with pytest.raises(ValueError, match="not a JPEG"):
        mm._jpeg_planes(b"\x00\x01\x02")
    with pytest.raises(ValueError, match="truncated|marker"):
        mm._jpeg_planes(bytes(blob[:-8]))


def test_mp4_container_roundtrip_closed_form():
    """encode_mp4 → mp4_sample_table resolves every sample's (offset,
    size) back to exactly the closed-form payload; decode_mp4's weighted
    checksum matches the independent recomputation."""
    mm = _mm()
    for i in (0, 3, 4, 8):
        n = 4 + i % 5
        sizes = [7 + (i + s) % 9 for s in range(n)]

        def mk(s, i=i, sizes=sizes):
            return bytes((i + 5 * s + 3 * j) % 256 for j in range(sizes[s]))

        blob = mm.encode_mp4(sizes, mk)
        st = mm.mp4_sample_table(blob)
        assert st["n_samples"] == n and st["sizes"] == sizes
        assert st["timescale"] == 1000 and st["duration"] == 40 * n
        for s in range(n):
            off, sz = st["offsets"][s], st["sizes"][s]
            assert blob[off : off + sz] == mk(s)
        d = mm.decode_mp4(blob)
        want = sum(
            ((i + 5 * s + 3 * j) % 256) * (1 + j + 7 * s)
            for s in range(n)
            for j in range(sizes[s])
        )
        assert d["wsum"] == want and d["kind"] == "mp4"


def test_mp4_multi_chunk_stsc_resolution():
    """The stsc expansion must handle MULTI-chunk layouts (the fixture
    writes one chunk; real files don't): hand-build a two-chunk file by
    patching stco/stsc and check the resolved ranges."""
    import struct

    mm = _mm()
    sizes = [4, 4, 4, 4, 4]
    payload = b"".join(bytes([s]) * 4 for s in range(5))

    def box(tag, body):
        return struct.pack(">I", len(body) + 8) + tag + body

    ftyp = box(b"ftyp", b"isom\x00\x00\x02\x00")
    # mdat: chunk 1 (samples 0-2) right at the body start, 10 junk bytes,
    # then chunk 2 (samples 3-4) — non-adjacent chunks exercise the math
    c1_off = len(ftyp) + 8
    c2_off = c1_off + 12 + 10
    mdat = box(b"mdat", payload[:12] + b"\xee" * 10 + payload[12:])
    mdhd = box(b"mdhd", struct.pack(">B3x", 0) + struct.pack(">IIII", 0, 0, 90000, 123)
               + struct.pack(">HH", 0x55C4, 0))
    stsz = box(b"stsz", struct.pack(">B3xII", 0, 0, 5)
               + b"".join(struct.pack(">I", s) for s in sizes))
    stsc = box(b"stsc", struct.pack(">B3xI", 0, 2)
               + struct.pack(">III", 1, 3, 1) + struct.pack(">III", 2, 2, 1))
    stco = box(b"stco", struct.pack(">B3xI", 0, 2) + struct.pack(">II", c1_off, c2_off))
    stbl = box(b"stbl", stsz + stsc + stco)
    moov = box(b"moov", box(b"trak", box(b"mdia", mdhd + box(b"minf", stbl))))
    blob = ftyp + mdat + moov
    st = mm.mp4_sample_table(blob)
    assert st["offsets"] == [c1_off, c1_off + 4, c1_off + 8, c2_off, c2_off + 4]
    assert st["timescale"] == 90000 and st["duration"] == 123
    for s in range(5):
        off = st["offsets"][s]
        assert blob[off : off + 4] == bytes([s]) * 4


def test_mp4_frame_sampling_spark(spark):
    """sample_mp4_frames extracts every 2nd sample with the closed-form
    checksum, 1->N rows through iterator mapInPandas."""
    mm = _mm()
    df = spark.range(6).select(
        F.col("id").alias("doc_id"), (F.col("id") * 2).alias("n_chars")
    )
    blobs = mm.synth_mp4_blobs(df, "doc_id", "n_chars")
    out = mm.sample_mp4_frames(blobs, "doc_id", "blob", every_k=2)
    rows = {(r["doc_id"], r["frame_index"]): (r["frame_bytes"], r["checksum"])
            for r in out.collect()}
    for i in range(6):
        n = 4 + i % 5
        for s in range(0, n, 2):
            sz = 7 + (i + s) % 9
            ck = sum(((i + 5 * s + 3 * j) % 256) * (1 + j) for j in range(sz))
            assert rows[(i, s)] == (sz, ck)
    assert len(rows) == sum(len(range(0, 4 + i % 5, 2)) for i in range(6))


def test_mp4_error_paths():
    mm = _mm()
    with pytest.raises(ValueError, match="not an ISO BMFF"):
        mm.mp4_sample_table(b"\x00\x01\x02\x03")
    with pytest.raises(ValueError, match="missing required box"):
        mm.mp4_sample_table(b"\x00\x00\x00\x10ftypisom\x00\x00\x02\x00")


def test_ycbcr_to_rgb_known_values():
    """Pure-gray (Cb=Cr=128) maps to R=G=B=Y; full-red chroma matches the
    published BT.601 coefficients with half-away rounding."""
    import numpy as np

    mm = _mm()
    y = np.full((2, 2), 77, dtype=np.uint8)
    n = np.full((2, 2), 128, dtype=np.uint8)
    rgb = mm.ycbcr_to_rgb(y, n, n)
    assert (rgb == 77).all()
    cr = np.full((2, 2), 255, dtype=np.uint8)
    rgb2 = mm.ycbcr_to_rgb(y, n, cr)
    assert int(rgb2[0, 0, 0]) == min(255, round(77 + 1.402 * 127))


def test_decode_media_dispatches_jpeg(spark):
    """decode_media sniffs the SOI marker and routes to the JPEG decoder
    inside mapInPandas."""
    from pyspark.sql import functions as F  # noqa: F811

    mm = _mm()
    df = spark.range(4).select(
        F.col("id").alias("doc_id"), (F.col("id") * 3).alias("n_chars")
    )
    blobs = mm.synth_jpeg_blobs(df, "doc_id", "n_chars")
    out = mm.decode_media(blobs, "doc_id", "blob")
    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == 4
    for i, r in rows.items():
        assert r["kind"] == "jpeg"
        assert r["width"] == 16 * (1 + i % 2)


def test_quantized_vectorized_ragged_queries_raise(spark):
    """Mixed query dimensions can't form one matmul — a clear ValueError
    pointing at vectorized=False, not a shape error mid-job."""
    from parallel_pandas_spark.operators import similarity

    emb = _emb_with_dirt(spark).where(F.col("vec_id") < 8)
    queries = _emb_with_dirt(spark).where(
        (F.col("vec_id") == 0) | (F.col("vec_id") == 101)
    )
    with pytest.raises(ValueError, match="vectorized=False"):
        similarity.quantized_cosine_topk(
            emb, queries, "vec_id", "embedding", k=3, vectorized=True
        )
