"""Property-based twin checks (hypothesis): for arbitrary data, the det
builders and their SQL twins must agree bit-for-bit between Spark and
DuckDB — not just on the shipped testdata."""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parallel_pandas_spark import det  # noqa: E402
from parallel_pandas_spark.sources import from_pandas  # noqa: E402

# values on a 2-decimal grid up to ~1e5, like prices/quantities — the
# regime the scale bounds are documented for
_vals = st.lists(
    st.integers(min_value=-9_999_999, max_value=9_999_999).map(lambda v: v / 100.0),
    min_size=2,
    max_size=200,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_vals)
def test_fsum_dvar_twins_bit_exact(spark, xs):
    pdf = pd.DataFrame({"x": xs})
    sdf = from_pandas(spark, pdf)
    got = sdf.agg(
        det.fsum("x", 2).alias("fs"),
        det.dsum("x", 2).alias("ds"),
        det.dvar("x", 2, 0).alias("dv"),
    ).collect()[0]

    con = duckdb.connect()
    con.register("t", pdf)
    want = con.execute(
        f"SELECT {det.fsum_sql('x', 2)} AS fs, {det.dsum_sql('x', 2)} AS ds, "
        f"{det.dvar_sql('x', 2, 0)} AS dv FROM t"
    ).fetchone()
    con.close()

    assert got["fs"] == want[0]
    assert got["ds"] == want[1]
    assert got["dv"] == want[2] or (
        got["dv"] != got["dv"] and want[2] != want[2]  # both NaN (var of consts=0 ok)
    )


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_vals)
def test_kurt_cross_twins_bit_exact(spark, xs):
    """x⁴·10² reaches ~1e22 ≫ 2^53 — exercises the hi/lo split path where
    the old CAST(…AS DECIMAL) scheme drifted between engines."""
    pdf = pd.DataFrame({"x": xs, "y": list(reversed(xs))})
    if pdf["x"].nunique() < 4:
        return
    sdf = from_pandas(spark, pdf)
    got = sdf.agg(
        det.dkurt("x", 2).alias("ku"),
        det.cross_sum("x", "y", 2).alias("xy"),
        det.dcorr("x", "y", 2, 2, 2).alias("r"),
    ).collect()[0]
    con = duckdb.connect()
    con.register("t", pdf)
    want = con.execute(
        f"SELECT {det.dkurt_sql('x', 2)} AS ku, {det.cross_sum_sql('x', 'y', 2)} AS xy, "
        f"{det.dcorr_sql('x', 'y', 2, 2, 2)} AS r FROM t"
    ).fetchone()
    con.close()
    for g, w in zip(got, want):
        assert g == w or (g != g and w != w)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_vals)
def test_skew_twin_bit_exact(spark, xs):
    pdf = pd.DataFrame({"x": xs})
    if pdf["x"].nunique() < 3:
        return  # skew undefined / zero variance
    sdf = from_pandas(spark, pdf)
    got = sdf.agg(det.dskew("x", 2).alias("sk")).collect()[0]["sk"]
    con = duckdb.connect()
    con.register("t", pdf)
    want = con.execute(f"SELECT {det.dskew_sql('x', 2)} AS sk FROM t").fetchone()[0]
    con.close()
    assert got == want or (got != got and want != want)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_vals)
def test_compact_long_path_bit_identical(spark, xs):
    """The nmax opt-in (det._long_ok): below the caller-declared bound the
    plain-LONG accumulator must produce the BIT-IDENTICAL double to the
    DECIMAL(38,0) accumulator — this is the contract that makes the perf
    opt-in safe to apply in the entry queries."""
    pdf = pd.DataFrame({"x": xs})
    sdf = from_pandas(spark, pdf)
    xmax, nmax = 1e5, 1e6  # 1e5*10^2*1e6 = 1e13 < 2^62: long path elected
    assert det._long_ok(xmax, 1, 2, nmax)
    got = sdf.agg(
        det.fsum("x", 2).alias("dec_fs"),
        det.fsum("x", 2, xmax=xmax, nmax=nmax).alias("lng_fs"),
        det.dvar("x", 2, 0, xmax=xmax).alias("dec_dv"),
        det.dvar("x", 2, 0, xmax=xmax, nmax=nmax).alias("lng_dv"),
        det.dskew("x", 2, xmax=xmax).alias("dec_sk"),
        det.dskew("x", 2, xmax=xmax, nmax=nmax).alias("lng_sk"),
    ).collect()[0]
    for a, b in [("dec_fs", "lng_fs"), ("dec_dv", "lng_dv"), ("dec_sk", "lng_sk")]:
        ga, gb = got[a], got[b]
        assert ga == gb or (ga != ga and gb != gb), (a, ga, b, gb)


def test_long_ok_bound_rejects(spark):
    """_long_ok must refuse exactly the configurations that can wrap."""
    assert not det._long_ok(None, 1, 6, 1e6)        # no value bound
    assert not det._long_ok(100.0, 1, 6, None)      # no row bound
    assert not det._long_ok(1e6, 2, 6, 1e7)         # 1e12*1e6*1e7 >= 2^62
    assert det._long_ok(100.0, 1, 6, 1e7)           # 1e8*1e7 = 1e15 < 2^62
    # the r7 corr_spearman wrap shape: rank^2 sums at sf1 must be rejected
    assert not det._long_ok(2.44e7, 2, 0, 6.1e6)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.integers(min_value=-(2**40), max_value=2**40),
        min_size=1, max_size=60, unique=True,
    ),
    st.integers(min_value=0, max_value=9),
)
def test_sampling_gate_twin_bit_exact(spark, ids, seed):
    """The md5 sampling gate (sampling._gate / _gate_sql) must agree
    engine-for-engine on arbitrary keys — it decides corpus membership,
    so a single divergent row breaks sample reproducibility."""
    from parallel_pandas_spark.operators import sampling

    def hexfold(hexcol):
        return " + ".join(
            f"(STRPOS('0123456789abcdef', SUBSTR({hexcol},{i + 1},1))-1)*{16 ** (14 - i)}"
            for i in range(15)
        )

    pdf = pd.DataFrame({"id": ids})
    sdf = from_pandas(spark, pdf)
    got = {
        r["id"]: r["g"]
        for r in sdf.select("id", sampling._gate(["id"], seed).alias("g")).collect()
    }
    con = duckdb.connect()
    con.register("t", pdf)
    want = dict(
        con.execute(
            f"SELECT id, {sampling._gate_sql(['id'], seed, hexfold)} AS g FROM t"
        ).fetchall()
    )
    con.close()
    assert got == want
