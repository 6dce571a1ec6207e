"""Round-8 surface: the scipy win_type tail (boxcar, nuttall, flattop,
tukey, cosine, exponential, barthann), the PNG stdlib decode, and the
multimodal decode error hardening.

Expected window values are scipy.signal.get_window(name, M, fftbins=False)
semantics, hand-derived from the published closed forms so the suite has
no scipy dependency (same convention as test_new_surface_r4)."""

from __future__ import annotations

import math
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parallel_pandas_spark.operators import windows  # noqa: E402

w = windows.win_type_weights


def test_boxcar():
    assert w("boxcar", 4) == [1.0, 1.0, 1.0, 1.0]
    assert w("boxcar", 1) == [1.0]


def test_nuttall_closed_form():
    a = (0.3635819, 0.4891775, 0.1365995, 0.0106411)
    # edge: alternating sum; center (M odd): plain sum = 1.0
    e0 = a[0] - a[1] + a[2] - a[3]
    e1 = a[0] - a[2]  # cos(πk/2) kills odd k at i=1, M=5
    got = w("nuttall", 5)
    assert got == pytest.approx([e0, e1, a[0] + a[1] + a[2] + a[3], e1, e0], abs=1e-12)


def test_flattop_closed_form():
    a = (0.21557895, 0.41663158, 0.277263158, 0.083578947, 0.006947368)
    e0 = a[0] - a[1] + a[2] - a[3] + a[4]
    e1 = a[0] - a[2] + a[4]
    ctr = sum(a)
    got = w("flattop", 5)
    assert got == pytest.approx([e0, e1, ctr, e1, e0], abs=1e-12)
    assert got[0] < 0  # flattop's signature negative edge lobes


def test_barthann_closed_form():
    # fac = |i/(M−1) − 0.5|: published shape hits exactly [0, .5, 1, .5, 0]
    assert w("barthann", 5) == pytest.approx([0.0, 0.5, 1.0, 0.5, 0.0], abs=1e-12)


def test_cosine_closed_form():
    got = w("cosine", 5)
    exp = [math.sin(math.pi * (i + 0.5) / 5) for i in range(5)]
    assert got == pytest.approx(exp, abs=0)
    assert got[2] == 1.0


def test_tukey_closed_form():
    # alpha=0.5, M=9: width=2 → [0, .5, 1, 1, 1, 1, 1, .5, 0]
    assert w("tukey", 9, alpha=0.5) == pytest.approx(
        [0.0, 0.5, 1.0, 1.0, 1.0, 1.0, 1.0, 0.5, 0.0], abs=1e-12
    )
    # degenerate ends of the alpha range
    assert w("tukey", 5, alpha=0.0) == [1.0] * 5
    assert w("tukey", 5, alpha=1.0) == pytest.approx(w("hann", 5), abs=1e-12)


def test_exponential_closed_form():
    got = w("exponential", 5, tau=2.0)
    e = [math.exp(-abs(i - 2.0) / 2.0) for i in range(5)]
    assert got == pytest.approx(e, abs=0)
    # default tau=1.0
    assert w("exponential", 3) == pytest.approx(
        [math.exp(-1.0), 1.0, math.exp(-1.0)], abs=0
    )


def test_all_shapes_symmetric_peak_center():
    shapes = [
        ("boxcar", {}), ("nuttall", {}), ("flattop", {}), ("barthann", {}),
        ("cosine", {}), ("tukey", {"alpha": 0.5}), ("exponential", {"tau": 3.0}),
    ]
    for name, kw in shapes:
        ws = w(name, 9, **kw)
        assert len(ws) == 9
        assert np.allclose(ws, ws[::-1]), name
        assert max(ws) == pytest.approx(ws[4], abs=1e-12), name


def test_weighted_window_accepts_new_shapes(spark):
    """End-to-end: the new shapes feed weighted_window and match a pandas
    rolling dot product."""
    import pandas as pd

    pdf = pd.DataFrame(
        {"g": ["a"] * 20, "i": range(20),
         "v": [float((x * 7) % 11) for x in range(20)]}
    )
    sdf = spark.createDataFrame(pdf)
    for name, kw in (("nuttall", {}), ("tukey", {"alpha": 0.5}), ("cosine", {})):
        wts = w(name, 5, **kw)
        out = windows.weighted_window(
            sdf, "v", 5, wts, ["i"], ["g"], func="mean", out_col="wm"
        ).orderBy("i").toPandas()
        ref = (
            pdf["v"].rolling(5).apply(lambda a: np.dot(a, wts) / sum(wts), raw=True)
        )
        got = out["wm"]
        assert np.allclose(
            got[4:], ref[4:], rtol=1e-12, atol=1e-12, equal_nan=True
        ), name
        assert got[:4].isna().all()


# ------------------------------------------------------------------ PNG codec
def test_png_roundtrip_all_filters():
    """encode→decode identity for every PNG filter type (0-4), mixed
    per-row filters, RGB and RGBA — proves the sub/up/average/paeth
    un-filtering, not just the chunk walk."""
    from parallel_pandas_spark.operators import multimodal as mm

    for ch in (3, 4):
        for base in (0, 7, 200):
            w, h = 7, 9

            def pix(x, y, c, base=base):
                return (base + 13 * x + 5 * y + 9 * c) % 256

            want = np.array(
                [[[pix(x, y, c) for c in range(ch)] for x in range(w)]
                 for y in range(h)],
                dtype=np.uint8,
            )
            for filters in (0, 1, 2, 3, 4, [(base + y) % 5 for y in range(h)]):
                blob = mm.encode_png(w, h, pix, channels=ch, filters=filters)
                assert blob[:8] == mm.PNG_MAGIC
                assert (mm._png_pixels(blob) == want).all(), (ch, base, filters)

            meta = mm.decode_png(mm.encode_png(w, h, pix, channels=ch, filters=4))
            v = want.astype(np.int64)
            yw = 2 * np.arange(h)[:, None, None]
            xw = np.arange(w)[None, :, None]
            cw = 5 * np.arange(ch)[None, None, :]
            assert (meta["width"], meta["height"]) == (w, h)
            assert meta["wsum"] == int((v * (1 + xw + yw + cw)).sum())
            assert meta["mean"] == pytest.approx(v.sum() / (w * h * ch), abs=1e-12)


def test_png_rejects_unsupported_variants():
    from parallel_pandas_spark.operators import multimodal as mm

    with pytest.raises(ValueError, match="not a PNG"):
        mm._png_pixels(b"\x00" * 32)
    with pytest.raises(ValueError, match="missing IHDR"):
        mm._png_pixels(mm.PNG_MAGIC + b"\x00\x00\x00\x00IEND\x00\x00\x00\x00")
    # 16-bit depth / palette / interlaced must raise, not mis-parse
    import struct as st

    for depth, ctype, interlace in ((16, 2, 0), (8, 3, 0), (8, 2, 1)):
        ihdr = st.pack(">IIBBBBB", 4, 3, depth, ctype, 0, 0, interlace)
        blob = mm.PNG_MAGIC + mm._png_chunk(b"IHDR", ihdr)
        with pytest.raises(ValueError, match="unsupported PNG variant"):
            mm._png_pixels(blob + mm._png_chunk(b"IDAT", b"x"))


def test_decode_media_error_paths(spark):
    """ADVICE r7: an empty/foreign blob must get a DISTINCT error (not
    'not a WAV'), and a compressed BMP must raise instead of mis-parsing
    as BI_RGB."""
    import struct as st

    from parallel_pandas_spark.operators import multimodal as mm

    sdf = spark.createDataFrame([(1, bytearray(b""))], "doc_id long, blob binary")
    with pytest.raises(Exception, match="empty or unrecognized"):
        mm.decode_media(sdf, "doc_id", "blob").collect()

    # BI_BITFIELDS (compression=3) 24-bit BMP: same bpp, different layout
    bmp = bytearray(mm.encode_bmp(2, 2, lambda x, y, c: 10))
    st.pack_into("<I", bmp, 30, 3)
    with pytest.raises(ValueError, match="unsupported BMP variant"):
        mm._bmp_pixels(bytes(bmp))


def test_decode_media_dispatches_png(spark):
    from parallel_pandas_spark.operators import multimodal as mm

    blob = mm.encode_png(4, 3, lambda x, y, c: (x + y + c) % 256)
    sdf = spark.createDataFrame([(7, bytearray(blob))], "doc_id long, blob binary")
    row = mm.decode_media(sdf, "doc_id", "blob").collect()[0]
    assert row["kind"] == "png"
    assert (row["width"], row["height"]) == (4, 3)
    assert row["sample_rate"] is None


def test_png_roundtrip_hypothesis_fuzz():
    """Property fuzz: encode→decode identity over random dims, channels,
    per-row filter assignments, and pixel content (including the
    all-equal and max-value planes where average/paeth carries differ)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from parallel_pandas_spark.operators import multimodal as mm

    @settings(max_examples=40, deadline=None)
    @given(
        st.integers(min_value=1, max_value=12),       # width
        st.integers(min_value=1, max_value=10),       # height
        st.sampled_from([3, 4]),                      # channels
        st.integers(min_value=0, max_value=2**31 - 1),  # pixel seed
        st.data(),
    )
    def check(w, h, ch, seed, data):
        filters = data.draw(
            st.lists(st.integers(min_value=0, max_value=4),
                     min_size=h, max_size=h)
        )

        def pix(x, y, c):
            return (seed + 31 * x + 17 * y + 7 * c) % 256

        blob = mm.encode_png(w, h, pix, channels=ch, filters=filters)
        px = mm._png_pixels(blob)
        assert px.shape == (h, w, ch)
        for y in range(h):
            for x in range(w):
                for c in range(ch):
                    assert px[y, x, c] == pix(x, y, c), (x, y, c, filters)

    check()
