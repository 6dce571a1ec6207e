"""Deterministic aggregates: bit-identical across cluster topologies AND
across engines.

Problem: ``SUM(double)`` depends on partial-aggregate merge order, which
changes with partitioning — a 100 TB job re-run on a different executor
count produces last-ulp-different sums, and a reference engine (the DuckDB
correctness oracle) differs too. Solution: aggregate in fixed-point —
quantize each row with pure IEEE-754 double ops (bit-identical in every
engine; see the power-sums section for why ``CAST(x AS DECIMAL)`` is NOT
engine-portable for computed values) and accumulate as exact integer sums,
which are order-independent. Two paths: compact (default) quantizes
straight into a LONG summed as DECIMAL(38,0) — valid while the caller
declares ``|x|·10^s < 2^62`` — and ``wide=True`` splits the quantized
value into hi/lo 32-bit words for magnitudes up to 2^90.
Higher statistics (var/std/sem/skew/kurt/corr) are then *closed-form scalar
functions of exact power sums*, so they are deterministic end to end.

Scale selection: the per-row cast is faithful while |x|·10^s < 2^53; pick
``s`` so the largest power of the column still fits (e.g. s=6 for
quantities ≤ 50, s=4 for prices ≤ 1e5 squared). Each builder takes the
scale explicitly.

Every builder has a twin ``*_sql`` emitting the equivalent ANSI SQL, used
to generate the DuckDB oracle from the same spec — the expressions cannot
drift apart.

Reference parity: these implement the same statistics as the reference's
ParallelizeStatFunc family (/root/reference/parallel_pandas/
parallel_dataframe.py:714-861) with pandas sample-estimator semantics
(ddof=1, adjusted G1/G2).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _nobs(col: Column | str) -> Column:
    """Observation count matching the quantized sums: the quantizer maps
    NaN to NULL (floor(NaN) is NaN, cast to long is NULL), so sums SKIP
    NaN — pandas skipna, by construction. Counts must skip it too, or
    every mean/variance divides by an inflated n when a float column
    carries true NaN."""
    return F.count(F.nanvl(_c(col).cast("double"), F.lit(None).cast("double")))


def _nobs_sql(col: str) -> str:
    return f"COUNT(CASE WHEN NOT isnan(CAST({col} AS DOUBLE)) THEN {col} END)"


# --- power sums ------------------------------------------------------------
# Per-row quantization must NOT go through CAST(double AS DECIMAL): Spark
# rounds the double's shortest decimal representation (BigDecimal.valueOf)
# while DuckDB rounds differently — for *computed* values (x², x³, a*b) the
# two can land on adjacent grid points (e.g. 26168.39³ → …59 vs …60 at
# scale 2). Instead quantize with pure IEEE-754 double ops, which every
# engine executes bit-identically:
#
#     v  = x_pow·10^s + 0.5                (mul+add, identical everywhere)
#     q  = floor(v)                        (exact floor via fmod + sign fix;
#                                           floor — NOT trunc — so negative
#                                           values round half-up like lsum's
#                                           floor(x·10^s + 0.5) path)
#     hi = floor(q / 2^32); lo = q - hi·2^32   (both exact: /2^32 is a
#                                           power-of-two scale; floor keeps
#                                           lo in [0, 2^32), a representable
#                                           integer)
#
# hi and lo are integer-valued doubles (|hi| < 2^63 for |q| < 2^95, |lo| <
# 2^32), cast exactly to BIGINT, and accumulated as DECIMAL(38,0) /
# HUGEINT — exact, order-independent sums. The final combine is again pure
# double arithmetic on correctly-rounded int→double casts. Quantization is
# *faithful* (≤0.5·10^-s error) while |x^p|·10^s < 2^53; beyond that it
# degrades gracefully but stays engine-identical up to |x^p|·10^s < 2^90.


_W = 4294967296.0  # 2^32


def _long_ok(xmax: float | None, power: int, scale: int, nmax: float | None) -> bool:
    """True when a plain-LONG accumulator provably cannot wrap: the caller
    declares both a value bound (``|x|``max) and a ROW-COUNT bound
    (``nmax``), and ``|x|^power · 10^scale · nmax < 2^62``.

    This is the opt-in that recovers the DECIMAL(38,0) exactness tax
    (measured +60% per sum, r7): below the bound the long and decimal
    accumulators hold the same exact integer, so the result is
    bit-identical — guarded by a hypothesis test (test_det_properties) and
    the sf1 oracle sweep. Either bound omitted → False (decimal path);
    correctness never rests on an undeclared bound. Same contract as the
    window kernels' ``compact_sums=True`` precedent (windows.py)."""
    if xmax is None or nmax is None:
        return False
    return (abs(xmax) ** power) * (10 ** scale) * nmax < float(2 ** 62)


def _floor_d(v: Column) -> Column:
    """Exact floor of a double at any magnitude (fmod is IEEE-exact).

    ``v - v % 1.0`` truncates toward zero; subtract 1 when the remainder is
    negative to get the true floor (toward -inf). Spark's ``F.floor`` is NOT
    usable here: it casts to LONG and overflows beyond 2^63, while this stays
    exact to 2^95. (fmod(-2.0, 1.0) = -0.0, and -0.0 < 0 is false, so exact
    negative integers pass through unchanged.)
    """
    r = v % F.lit(1.0)
    t = v - r
    return F.when(r < F.lit(0.0), t - F.lit(1.0)).otherwise(t)


def _floor_d_sql(v: str) -> str:
    r = f"({v} % 1.0)"
    t = f"({v} - {r})"
    return f"(CASE WHEN {r} < 0.0 THEN {t} - 1.0 ELSE {t} END)"


def _qsplit(x: Column, scale: int) -> tuple[Column, Column]:
    """Per-row engine-exact quantize of x·10^s into (hi, lo) long words.

    floor (not trunc) in both places: q = floor(x·10^s + 0.5) matches the
    round-half-up semantics of :func:`lsum` for negative values, and
    hi = floor(q/2^32) keeps lo in [0, 2^32).
    """
    v = x * F.lit(float(10**scale)) + F.lit(0.5)
    q = _floor_d(v)
    h = _floor_d(q / F.lit(_W))
    lo = q - h * F.lit(_W)
    return h.cast("long"), lo.cast("long")


def _qsplit_sql(x: str, scale: int) -> tuple[str, str]:
    # the CASE guard matches Spark's non-ANSI CAST(NaN AS BIGINT) -> NULL
    # (DuckDB raises on that cast), so NaN rows drop out of both engines'
    # sums identically
    ten = repr(float(10**scale))
    xs = f"(CASE WHEN isnan(CAST({x} AS DOUBLE)) THEN NULL ELSE CAST({x} AS DOUBLE) END)"
    v = f"({xs}*{ten} + 0.5)"
    q = _floor_d_sql(v)
    h = _floor_d_sql(f"({q}/{_W!r})")
    lo = f"({q} - {h}*{_W!r})"
    return f"CAST({h} AS BIGINT)", f"CAST({lo} AS BIGINT)"


def qsum(
    x: Column, scale: int, wide: bool = False,
    xmax: float | None = None, nmax: float | None = None,
) -> Column:
    """Engine-exact sum of round(x·10^s)/10^s over rows, as DOUBLE.

    Use for any *computed* expression (products, differences, powers) —
    unlike ``SUM(CAST(expr AS DECIMAL))`` the result is bit-identical
    across Spark/DuckDB and across partitionings.

    Default (compact) path: the caller asserts ``|x|·10^s < 2^62``, so
    ``floor(x·10^s + 0.5)`` is one exact IEEE multiply+floor landing in a
    LONG, accumulated as DECIMAL(38,0) — exact for any row count, one agg
    buffer, and a per-row expression of ~10 nodes instead of the ~700-node
    hi/lo word split. (Column expressions are trees, not DAGs: the closed
    forms in dskew/dkurt reference each power sum many times, so per-use
    tree size multiplies into driver-side analysis seconds — measured 8 s
    to *plan* a 3-column skew/kurt agg on the wide path.) Pass
    ``wide=True`` for magnitudes up to 2^90, where the quantized value
    itself exceeds LONG range and is split into exact hi/lo 32-bit words.

    ``xmax``/``nmax``: declaring BOTH a value bound and a row-count bound
    with ``|x|·10^s·nmax < 2^62`` selects a plain-LONG accumulator — the
    same exact integer as the decimal path below the bound, without the
    per-row BigDecimal add (see :func:`_long_ok`).
    """
    if wide:
        hi, lo = _qsplit(x, scale)
        shi = F.sum(hi.cast("decimal(38,0)")).cast("double")
        slo = F.sum(lo.cast("decimal(38,0)")).cast("double")
        return (shi * F.lit(_W) + slo) / F.lit(float(10**scale))
    q = F.floor(x * F.lit(float(10**scale)) + F.lit(0.5))  # exact; LONG
    if _long_ok(xmax, 1, scale, nmax):
        return F.sum(q).cast("double") / F.lit(float(10**scale))
    return F.sum(q.cast("decimal(38,0)")).cast("double") / F.lit(float(10**scale))


def qsum_sql(x: str, scale: int, wide: bool = False) -> str:
    ten = repr(float(10**scale))
    if wide:
        hi, lo = _qsplit_sql(x, scale)
        shi = f"CAST(SUM({hi}) AS DOUBLE)"
        slo = f"CAST(SUM({lo}) AS DOUBLE)"
        return f"(({shi}*{_W!r} + {slo}) / {ten})"
    q = (f"CAST(CASE WHEN isnan(CAST({x} AS DOUBLE)) THEN NULL ELSE "
        f"FLOOR(CAST({x} AS DOUBLE)*{ten} + 0.5) END AS BIGINT)")
    return f"(CAST(SUM({q}) AS DOUBLE) / {ten})"


def psum(
    col, power: int = 1, scale: int = 6, wide: bool = False,
    xmax: float | None = None, nmax: float | None = None,
) -> Column:
    """Exact order-independent sum of x^power, returned as DOUBLE.

    Compact-path bound (default): ``max|x|^power · 10^scale < 2^62`` — the
    callers pick ``scale`` from known column ranges already, so they own
    the assertion; pass ``wide=True`` when the bound cannot be promised.
    ``xmax``+``nmax`` additionally select the LONG accumulator per power
    when ``|x|^power·10^s·nmax < 2^62`` (see :func:`_long_ok`).
    """
    c = _c(col).cast("double")
    x = c
    for _ in range(power - 1):
        x = x * c
    exmax = None if xmax is None else abs(xmax) ** power
    return qsum(x, scale, wide=wide, xmax=exmax, nmax=nmax)


def psum_sql(
    col: str, power: int = 1, scale: int = 6, wide: bool = False,
    xmax: float | None = None, nmax: float | None = None,
) -> str:
    # xmax/nmax accepted for signature symmetry with psum and IGNORED:
    # DuckDB promotes SUM(BIGINT) to HUGEINT, so below the caller's bound
    # the emitted accumulator equals both Spark paths exactly.
    c = f"CAST({col} AS DOUBLE)"
    x = c if power == 1 else "(" + "*".join([c] * power) + ")"
    return qsum_sql(x, scale, wide=wide)


def cross_sum(
    a, b, scale: int = 6, wide: bool = False,
    abmax: float | None = None, nmax: float | None = None,
) -> Column:
    """Exact order-independent sum of a*b (for covariances/correlations).

    ``abmax`` declares max|a·b| for the LONG-accumulator opt-in."""
    return qsum(
        _c(a).cast("double") * _c(b).cast("double"), scale, wide=wide,
        xmax=abmax, nmax=nmax,
    )


def cross_sum_sql(
    a: str, b: str, scale: int = 6, wide: bool = False,
    abmax: float | None = None, nmax: float | None = None,
) -> str:
    return qsum_sql(f"(CAST({a} AS DOUBLE)*CAST({b} AS DOUBLE))", scale, wide=wide)


# --- scaled-long sums --------------------------------------------------------
# Per-row quantization stays pure long/double arithmetic inside
# whole-stage codegen: floor(x·10^s + 0.5) is one IEEE multiply + floor
# (identical in any engine; ties at exact .5 cannot occur when x is
# within <0.5 ulp-scaled of a decimal grid point, which quantized source
# data guarantees). The ACCUMULATOR is DECIMAL(38,0), not LONG: this
# family previously summed raw longs with a caller-owned
# |expr|·10^scale·rows < 2^63 bound, and the r7 sf1 oracle sweep caught
# corr_spearman silently violating it (Spark SUM(BIGINT) WRAPS in
# non-ANSI mode; DuckDB promotes to HUGEINT — a one-engine wrong answer
# that only appears when the data grows). A row-count-dependent bound is
# exactly the contract a 100 TB engine must not offer; the decimal
# accumulator costs one BigDecimal add per row in these single-row
# aggregations (scan-dominated queries, unmeasurable at sf1) and is
# exact to 1e38.


def dyadic(values, bits: int = 38) -> list[float]:
    """Round each value to the nearest multiple of 2^-bits (a DYADIC
    rational, exactly representable in binary64).

    Purpose: weighted dot products over integer-valued data. With
    weights on a 2^-38 grid and |x| < 2^k integers, every product
    w·x (k+38 bits) and every ≤2^m-term partial sum (k+m+38 bits ≤ 53)
    is EXACT — so the accumulated dot product is one specific double on
    every engine, even where a C++ engine contracts multiply+add into
    FMA (fma of exactly-representable operands whose result fits is the
    same value as round-after-multiply-then-add). Found necessary by the
    r7 sf1 sweep: full-precision gaussian weights left the weighted-var
    chain 1 ulp apart between Spark (strict JVM FP) and DuckDB on ~1 row
    in 6M, exactly on a ROUND .5 boundary. The ≤2^-38 (~4e-12) weight
    perturbation is orders below every published tolerance."""
    scale = float(1 << bits)
    return [round(float(v) * scale) / scale for v in values]


def lsum(col, scale: int = 6, xmax: float | None = None, nmax: float | None = None) -> Column:
    """Exact scaled-long sum of an expression.

    The per-VALUE bound is the caller's contract (|x|·10^s < 2^62); the
    SUM accumulates as DECIMAL(38,0), NOT as LONG — Spark's SUM(BIGINT)
    silently WRAPS past 2^63 in non-ANSI mode while DuckDB's SUM(BIGINT)
    promotes to HUGEINT, so a long accumulator diverges exactly when the
    data gets big (found by the r7 sf1 oracle sweep: Σ(2·rank)² over 6M
    rows ≈ 2.9e20 went negative). DECIMAL(38,0) holds sums to 1e38 —
    ~1e17 rows at the per-value bound — and stays exact integer
    arithmetic on both engines. Declaring ``xmax``+``nmax`` with
    ``|x|·10^s·nmax < 2^62`` opts in to a LONG accumulator (same exact
    integer below the bound, no BigDecimal per-row add); the long path
    returns LONG, the decimal path DECIMAL(38,0) — descale via
    :func:`fsum` for a type-stable DOUBLE."""
    c = _c(col).cast("double")
    q = F.floor(c * F.lit(float(10**scale)) + F.lit(0.5)).cast("long")
    if _long_ok(xmax, 1, scale, nmax):
        return F.sum(q)
    return F.sum(q.cast("decimal(38,0)"))


def lsum_sql(expr: str, scale: int = 6, xmax: float | None = None, nmax: float | None = None) -> str:
    # DECIMAL(38,0) accumulator for symmetry with :func:`lsum` — a BIGINT
    # accumulator happened to be safe here only because DuckDB promotes
    # SUM(BIGINT) to HUGEINT; emitting decimal keeps the twin honest on
    # any ANSI engine that (like non-ANSI Spark) would wrap instead.
    return (
        f"SUM(CAST(CASE WHEN isnan(CAST({expr} AS DOUBLE)) THEN NULL ELSE "
        f"FLOOR(CAST({expr} AS DOUBLE)*{float(10**scale)!r} + 0.5) END AS DECIMAL(38,0)))"
    )


# --- id checksums ------------------------------------------------------------


def idsum(col) -> Column:
    """Order-insensitive integer checksum of an id column, safe at any
    row count: accumulate as DECIMAL(38,0) (exact to 1e38 — ~1e26 rows of
    1e12-scale ids), surface as DOUBLE (correctly-rounded from the exact
    decimal in both Spark and DuckDB, so the twins stay bit-identical).

    Raw ``SUM(BIGINT)`` is NOT a valid checksum: non-ANSI Spark silently
    wraps past 2^63 while DuckDB promotes to HUGEINT — the corr_spearman
    bug class found by the r7 sf1 sweep, which realistic 1e12-scale doc
    ids reproduce in any popular-group checksum."""
    return F.sum(_c(col).cast("decimal(38,0)")).cast("double")


def idsum_sql(expr: str) -> str:
    """SQL twin of :func:`idsum` (ANSI; DuckDB SUM(DECIMAL(38,0)) is exact)."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(38,0))) AS DOUBLE)"


def fsum(col, scale: int = 6, xmax: float | None = None, nmax: float | None = None) -> Column:
    """Exact order-independent sum via scaled longs, descaled to DOUBLE."""
    return lsum(col, scale, xmax=xmax, nmax=nmax).cast("double") / F.lit(float(10**scale))


def fsum_sql(expr: str, scale: int = 6, xmax: float | None = None, nmax: float | None = None) -> str:
    return f"CAST({lsum_sql(expr, scale)} AS DOUBLE)/{float(10**scale)!r}"


# --- first/second moments --------------------------------------------------


def dsum(col, scale: int = 6, xmax: float | None = None, nmax: float | None = None) -> Column:
    return psum(col, 1, scale, xmax=xmax, nmax=nmax)


def dsum_sql(col: str, scale: int = 6, xmax: float | None = None, nmax: float | None = None) -> str:
    return psum_sql(col, 1, scale)


def dmean(col, scale: int = 6, xmax: float | None = None, nmax: float | None = None) -> Column:
    return psum(col, 1, scale, xmax=xmax, nmax=nmax) / _nobs(col)


def dmean_sql(col: str, scale: int = 6, xmax: float | None = None, nmax: float | None = None) -> str:
    return f"{psum_sql(col, 1, scale)} / {_nobs_sql(col)}"


def _wide_for(xmax: float | None, power: int, scale: int) -> bool:
    """True when the compact scaled-long path cannot hold |x|^power·10^s.

    ``xmax=None`` (unknown magnitude) always selects the wide hi/lo path —
    correctness never depends on an undeclared bound."""
    if xmax is None:
        return True
    return (abs(xmax) ** power) * (10**scale) >= float(2**62)


def dvar(
    col, scale: int = 6, sq_scale: int = 4, ddof: int = 1,
    xmax: float | None = None, nmax: float | None = None,
) -> Column:
    """Sample variance from exact power sums: (S2 - S1^2/n) / (n - ddof).

    ``xmax`` declares max|x| so each power sum can take the compact
    scaled-long path (see :func:`qsum`); omit it for the always-safe wide
    path. ``nmax`` additionally declares a row-count bound selecting the
    LONG accumulator per power sum where it provably cannot wrap."""
    n = _nobs(col).cast("double")
    s1 = psum(col, 1, scale, wide=_wide_for(xmax, 1, scale), xmax=xmax, nmax=nmax)
    s2 = psum(col, 2, sq_scale, wide=_wide_for(xmax, 2, sq_scale), xmax=xmax, nmax=nmax)
    return (s2 - s1 * s1 / n) / (n - ddof)


def dvar_sql(
    col: str, scale: int = 6, sq_scale: int = 4, ddof: int = 1,
    xmax: float | None = None, nmax: float | None = None,
) -> str:
    s1 = psum_sql(col, 1, scale, wide=_wide_for(xmax, 1, scale))
    s2 = psum_sql(col, 2, sq_scale, wide=_wide_for(xmax, 2, sq_scale))
    n = f"CAST({_nobs_sql(col)} AS DOUBLE)"
    return f"(({s2}) - ({s1})*({s1})/({n})) / (({n}) - {ddof})"


def dstd(
    col, scale: int = 6, sq_scale: int = 4, ddof: int = 1,
    xmax: float | None = None, nmax: float | None = None,
) -> Column:
    return F.sqrt(dvar(col, scale, sq_scale, ddof, xmax, nmax=nmax))


def dstd_sql(
    col: str, scale: int = 6, sq_scale: int = 4, ddof: int = 1,
    xmax: float | None = None, nmax: float | None = None,
) -> str:
    return f"SQRT({dvar_sql(col, scale, sq_scale, ddof, xmax)})"


def dsem(
    col, scale: int = 6, sq_scale: int = 4,
    xmax: float | None = None, nmax: float | None = None,
) -> Column:
    """Standard error of the mean, ddof=1 (pandas default)."""
    return F.sqrt(dvar(col, scale, sq_scale, 1, xmax, nmax=nmax) / _nobs(col))


def dsem_sql(
    col: str, scale: int = 6, sq_scale: int = 4,
    xmax: float | None = None, nmax: float | None = None,
) -> str:
    return f"SQRT(({dvar_sql(col, scale, sq_scale, 1, xmax)}) / {_nobs_sql(col)})"


# --- skew / kurt (pandas G1/G2 sample estimators) ---------------------------


def dskew(col, scale: int = 6, xmax: float | None = None, nmax: float | None = None) -> Column:
    # NOTE: no POW anywhere — pow(x, 1.5) is not correctly-rounded and
    # JVM Math.pow vs DuckDB libm drift by an ulp value-dependently.
    # x^1.5 = x*sqrt(x): multiply and sqrt ARE exactly rounded (IEEE754),
    # so the twins are bit-identical across engines.
    n = _nobs(col).cast("double")
    s1, s2, s3 = (
        psum(col, p, scale, wide=_wide_for(xmax, p, scale), xmax=xmax, nmax=nmax)
        for p in (1, 2, 3)
    )
    m = s1 / n
    m2 = s2 / n - m * m
    m3 = s3 / n - 3 * m * s2 / n + 2 * m * m * m
    g1 = m3 / (m2 * F.sqrt(m2))
    return g1 * F.sqrt(n * (n - 1)) / (n - 2)


def dskew_sql(col: str, scale: int = 6, xmax: float | None = None, nmax: float | None = None) -> str:
    s1, s2, s3 = (psum_sql(col, p, scale, wide=_wide_for(xmax, p, scale)) for p in (1, 2, 3))
    n = f"CAST({_nobs_sql(col)} AS DOUBLE)"
    m = f"(({s1})/({n}))"
    m2 = f"(({s2})/({n}) - {m}*{m})"
    m3 = f"(({s3})/({n}) - 3*{m}*({s2})/({n}) + 2*{m}*{m}*{m})"
    g1 = f"({m3} / ({m2} * SQRT({m2})))"
    return f"{g1} * SQRT(({n})*(({n})-1)) / (({n})-2)"


def dkurt(col, scale: int = 6, xmax: float | None = None, nmax: float | None = None) -> Column:
    n = _nobs(col).cast("double")
    s1, s2, s3, s4 = (
        psum(col, p, scale, wide=_wide_for(xmax, p, scale), xmax=xmax, nmax=nmax)
        for p in (1, 2, 3, 4)
    )
    m = s1 / n
    m2 = s2 / n - m * m
    # m^4 via explicit left-assoc multiplication (exactly rounded; POW is not)
    m4 = s4 / n - 4 * m * s3 / n + 6 * m * m * s2 / n - 3 * (m * m * m * m)
    g2 = m4 / (m2 * m2) - 3
    return ((n + 1) * g2 + 6) * (n - 1) / ((n - 2) * (n - 3))


def dkurt_sql(col: str, scale: int = 6, xmax: float | None = None, nmax: float | None = None) -> str:
    s1, s2, s3, s4 = (psum_sql(col, p, scale, wide=_wide_for(xmax, p, scale)) for p in (1, 2, 3, 4))
    n = f"CAST({_nobs_sql(col)} AS DOUBLE)"
    m = f"(({s1})/({n}))"
    m2 = f"(({s2})/({n}) - {m}*{m})"
    m4 = f"(({s4})/({n}) - 4*{m}*({s3})/({n}) + 6*{m}*{m}*({s2})/({n}) - 3*({m}*{m}*{m}*{m}))"
    g2 = f"({m4} / ({m2}*{m2}) - 3)"
    # IMPORTANT: mirror dkurt's exact association order —
    # ((n+1)*g2 + 6) * (n-1) / ((n-2)*(n-3)) — a distributed form like
    # (n+1)*g2*(n-1)/D + 6*(n-1)/D is algebraically equal but last-ulp
    # different in IEEE754, which breaks the bit-identical contract.
    return f"(((({n})+1)*{g2} + 6) * (({n})-1)) / (((({n})-2))*((({n})-3)))"


def dcorr(
    a, b, scale_a: int = 6, scale_b: int = 6, scale_ab: int = 6,
    amax: float | None = None, bmax: float | None = None,
    nmax: float | None = None,
) -> Column:
    """Pearson correlation from exact sums:
    (n·Sab − Sa·Sb) / sqrt((n·Saa − Sa²)(n·Sbb − Sb²))."""
    n = _nobs(a).cast("double")
    abmax = None if (amax is None or bmax is None) else abs(amax) * abs(bmax)
    sa = psum(a, 1, scale_a, wide=_wide_for(amax, 1, scale_a), xmax=amax, nmax=nmax)
    sb = psum(b, 1, scale_b, wide=_wide_for(bmax, 1, scale_b), xmax=bmax, nmax=nmax)
    saa = psum(a, 2, max(scale_a - 2, 0), wide=_wide_for(amax, 2, max(scale_a - 2, 0)), xmax=amax, nmax=nmax)
    sbb = psum(b, 2, max(scale_b - 2, 0), wide=_wide_for(bmax, 2, max(scale_b - 2, 0)), xmax=bmax, nmax=nmax)
    sab = cross_sum(a, b, scale_ab, wide=_wide_for(abmax, 1, scale_ab), abmax=abmax, nmax=nmax)
    num = n * sab - sa * sb
    den = F.sqrt((n * saa - sa * sa) * (n * sbb - sb * sb))
    return num / den


def dcorr_sql(
    a: str, b: str, scale_a: int = 6, scale_b: int = 6, scale_ab: int = 6,
    amax: float | None = None, bmax: float | None = None,
    nmax: float | None = None,
) -> str:
    n = f"CAST({_nobs_sql(a)} AS DOUBLE)"
    abmax = None if (amax is None or bmax is None) else abs(amax) * abs(bmax)
    sa = psum_sql(a, 1, scale_a, wide=_wide_for(amax, 1, scale_a))
    sb = psum_sql(b, 1, scale_b, wide=_wide_for(bmax, 1, scale_b))
    saa = psum_sql(a, 2, max(scale_a - 2, 0), wide=_wide_for(amax, 2, max(scale_a - 2, 0)))
    sbb = psum_sql(b, 2, max(scale_b - 2, 0), wide=_wide_for(bmax, 2, max(scale_b - 2, 0)))
    sab = cross_sum_sql(a, b, scale_ab, wide=_wide_for(abmax, 1, scale_ab))
    num = f"(({n})*({sab}) - ({sa})*({sb}))"
    den = f"SQRT((({n})*({saa}) - ({sa})*({sa})) * (({n})*({sbb}) - ({sb})*({sb})))"
    return f"{num} / {den}"


# --- windowed (per-group) deterministic expressions -------------------------


def wqsum(x: Column, window, scale: int = 6, wide: bool = False) -> Column:
    """Engine-exact windowed sum of round(x·10^s)/10^s.

    Same compact/wide split as :func:`qsum`; the integer accumulation also
    sidesteps DuckDB's segment-tree double window sums, which are NOT
    bit-identical to Spark's running doubles.
    """
    if wide:
        hi, lo = _qsplit(x, scale)
        shi = F.sum(hi.cast("decimal(38,0)")).over(window).cast("double")
        slo = F.sum(lo.cast("decimal(38,0)")).over(window).cast("double")
        return (shi * F.lit(_W) + slo) / F.lit(float(10**scale))
    q = F.floor(x * F.lit(float(10**scale)) + F.lit(0.5))
    s = F.sum(q.cast("decimal(38,0)")).over(window).cast("double")
    return s / F.lit(float(10**scale))


def wqsum_sql(x: str, over: str, scale: int = 6, wide: bool = False) -> str:
    """SQL twin of :func:`wqsum`; ``over`` is e.g. ``"OVER w"``."""
    ten = repr(float(10**scale))
    if wide:
        hi, lo = _qsplit_sql(x, scale)
        shi = f"CAST(SUM({hi}) {over} AS DOUBLE)"
        slo = f"CAST(SUM({lo}) {over} AS DOUBLE)"
        return f"(({shi}*{_W!r} + {slo}) / {ten})"
    q = (f"CAST(CASE WHEN isnan(CAST({x} AS DOUBLE)) THEN NULL ELSE "
        f"FLOOR(CAST({x} AS DOUBLE)*{ten} + 0.5) END AS BIGINT)")
    return f"(CAST(SUM({q}) {over} AS DOUBLE) / {ten})"


def wsum(col, window, scale: int = 6) -> Column:
    """Deterministic windowed sum (engine-exact hi/lo quantized)."""
    return wqsum(_c(col).cast("double"), window, scale)


def wmean(col, window, scale: int = 6) -> Column:
    return wsum(col, window, scale) / _nobs(col).over(window)


def wstd(col, window, scale: int = 6, sq_scale: int = 4, ddof: int = 1) -> Column:
    c = _c(col).cast("double")
    n = _nobs(col).over(window).cast("double")
    s1 = wsum(col, window, scale)
    s2 = wqsum(c * c, window, sq_scale)
    return F.sqrt((s2 - s1 * s1 / n) / (n - ddof))
