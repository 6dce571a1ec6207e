"""Rolling / expanding / EWM windows (SURVEY.md §2.6, ops #26-#30).

The reference chunks with overlap = window-1 rows (or a timedelta) and runs
real pandas rolling per chunk
(/root/reference/parallel_pandas/parallel_window.py:30-203, tools.py:8-36).
Spark's ``WindowExec`` subsumes the overlap bookkeeping entirely:
``rowsBetween`` for count windows, ``rangeBetween`` over epoch seconds for
time windows. Grouped variants prepend ``partitionBy`` — each group is an
independent, perfectly-parallel ordered scan (the scalable shape; global
windows serialize into one task and are kept only for pandas parity).

EWM and weighted windows are recursive / non-frame-expressible — those take
the Arrow ``applyInPandas`` path per group, which is also how the grouped
reference variants behave (one chunk per group, parallel_window.py:216-255).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, WindowSpec
from pyspark.sql import functions as F
from pyspark.sql import types as T

def _w_skew(c, w):
    # sample G1 from windowed population skewness — the compound must apply
    # .over() to EACH aggregate; .over() on the compound itself is invalid
    n = F.count(c).over(w).cast("double")
    return F.skewness(c).over(w) * F.sqrt(n * (n - 1)) / (n - 2)


def _w_kurt(c, w):
    n = F.count(c).over(w).cast("double")
    g2 = F.kurtosis(c).over(w)
    return ((n + 1) * g2 + 6) * (n - 1) / ((n - 2) * (n - 3))


def _w_sem(c, w):
    # pandas WINDOW sem (Rolling/Expanding.sem, ddof=1) divides by
    # sqrt(n − ddof), unlike Series.sem's sqrt(n) — a genuine pandas
    # asymmetry, verified empirically; reductions.sem keeps the Series form
    return F.stddev_samp(c).over(w) / F.sqrt(F.count(c).over(w) - F.lit(1))


#: stat -> (col, windowspec) -> windowed Column. Simple aggregates apply
#: .over directly; skew/kurt/sem are compounds of several windowed aggs.
_ROLL_FNS = {
    "mean": lambda c, w: F.avg(c).over(w),
    "sum": lambda c, w: F.sum(c).over(w),
    "min": lambda c, w: F.min(c).over(w),
    "max": lambda c, w: F.max(c).over(w),
    "std": lambda c, w: F.stddev_samp(c).over(w),
    "var": lambda c, w: F.var_samp(c).over(w),
    # Spark 4 rejects median() with a window frame
    # (INVALID_WINDOW_SPEC_FOR_AGGREGATION_FUNC); percentile(c, 0.5) is
    # the same exact interpolated median and IS frame-composable
    "median": lambda c, w: F.expr(f"percentile(`{c}`, 0.5)").over(w),
    "count": lambda c, w: F.count(c).over(w),
    "skew": _w_skew,
    "kurt": _w_kurt,
    "sem": _w_sem,
}

#: stat -> base window aggregate(s) it derives from. The rolling kernels
#: project each distinct base aggregate ONCE per (column, frame) and
#: derive the stat from the projected attribute (r16): every textual
#: ``agg(x).over(w)`` reference becomes its OWN frame processor inside
#: WindowExec — a sliding frame re-aggregates the whole frame per row per
#: processor, so the min_periods guard's count plus a compound like skew
#: (which mentions n three times) paid 4x the count and the moment twice
#: (measured: rolling_cov_corr 19 frame processors where 6 suffice).
#: Values are unchanged — same aggregates over the same frame, the
#: derivation arithmetic is untouched.
_ROLL_BASE = {
    "mean": F.avg,
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
    "std": F.stddev_samp,
    "var": F.var_samp,
    "median": lambda c: F.expr(f"percentile(`{c}`, 0.5)"),
    "count": F.count,
    "skew": F.skewness,
    "kurt": F.kurtosis,
    "sem": F.stddev_samp,
}


def _roll_multi(
    out: DataFrame,
    cols: Sequence[str],
    funcs: Sequence[str],
    w: WindowSpec,
    mp: int,
    fin: dict,
    nn: dict,
    suffix: str,
) -> DataFrame:
    """Shared body of rolling / rolling_time / expanding: one projection
    of deduplicated raw window aggregates, then a plain derive projection
    (identical arithmetic to the former inline ``_ROLL_FNS`` compounds,
    so outputs are bit-identical)."""
    raw: dict[str, F.Column] = {}

    def _base(key: str, expr: F.Column) -> F.Column:
        alias = f"__rwagg_{key}"
        if alias not in raw:
            raw[alias] = expr.over(w)
        return F.col(alias)

    derived: list[tuple[str, F.Column]] = []
    for c in cols:
        cnt_fin = lambda: _base(f"cnt_{fin[c]}", F.count(fin[c]))  # noqa: B023
        for fn in funcs:
            if fn == "count":
                g = _base("cntall", F.count(F.lit(1))) >= mp
                e = _base(f"count_{nn[c]}", F.count(nn[c]))
            else:
                g = cnt_fin() >= mp
                b = _base(f"{fn}_{fin[c]}", _ROLL_BASE[fn](fin[c]))
                if fn == "skew":
                    n = cnt_fin().cast("double")
                    e = b * F.sqrt(n * (n - 1)) / (n - 2)
                elif fn == "kurt":
                    n = cnt_fin().cast("double")
                    e = ((n + 1) * b + 6) * (n - 1) / ((n - 2) * (n - 3))
                elif fn == "sem":
                    e = b / F.sqrt(cnt_fin() - F.lit(1))
                else:
                    e = b
            derived.append((f"{c}{suffix}{fn}", F.when(g, e)))
    staged = out.select("*", *[e.alias(n) for n, e in raw.items()])
    return staged.select(
        *out.columns, *[e.alias(n) for n, e in derived]
    )


def _ordered_window(order_by, partition_by) -> WindowSpec:
    w = Window.partitionBy(*(partition_by or []))
    return w.orderBy(*[F.col(c) for c in order_by])


# canonical mask helpers (masks.py): the window kernels use the
# FINITE contract — pandas windowed aggregations treat NaN and ±inf
# alike as missing, unlike its full-frame reductions (masks.nan_safe).
from .masks import finite as _finite  # noqa: E402
from .masks import is_floating as _is_floating  # noqa: E402
from .masks import non_nan as _non_nan  # noqa: E402


def _window_obs(df: DataFrame, cols: Sequence[str]):
    """Project per-column masked companions for the window kernels:
    ``fin[c]`` (finite only — the aggregation input and min_periods
    basis) and ``nn[c]`` (NaN-masked, inf kept — the ``count`` input).
    Integer columns cannot hold non-finite values and pass through.

    REUSES a mask PAIR that already exists by name: combined with
    ``keep_obs=True`` on the kernels, a chain of window calls over the
    same columns adds its masks ONCE, so the later calls' Window nodes
    are ADJACENT in the logical plan and CollapseWindow fuses them into
    one WindowExec pass (a fresh mask Project between windows blocks the
    rule — the r6 window-pass-discipline finding, SCALE.md).

    Caller contract for ``keep_obs`` chains: do NOT overwrite ``c``
    between calls — an existing ``__fin_c``/``__nn_c`` pair is trusted
    to reflect the current column (that trust is what buys the fusion).
    Reuse requires BOTH masks present; a half-pair is rebuilt."""
    out = df
    fin: dict[str, str] = {}
    nn: dict[str, str] = {}
    temps: list[str] = []
    for c in cols:
        if _is_floating(out, c):
            fin[c], nn[c] = f"__fin_{c}", f"__nn_{c}"
            if not (fin[c] in out.columns and nn[c] in out.columns):
                out = out.withColumn(fin[c], _finite(F.col(c)))
                out = out.withColumn(nn[c], _non_nan(F.col(c)))
                temps += [fin[c], nn[c]]
        else:
            fin[c], nn[c] = c, c
    return out, fin, nn, temps


def fixed_frame_bounds(window: int, center: bool = False, closed: str | None = None) -> tuple[int, int]:
    """pandas FixedWindowIndexer frame bounds as (start, end) row offsets
    relative to the current row, both inclusive (``rowsBetween`` form).

    The model (verified empirically vs pandas 2.2, all 20 combinations of
    window∈{3,4} × center × closed): label offset ``(w−1)//2`` when
    centered, then ``closed`` widens/narrows the edges — 'both' adds the
    row before the frame (w+1 rows), 'left' shifts the whole frame one row
    back, 'neither' drops the current row (w−1 rows). 'right' (the pandas
    default) is the plain trailing frame."""
    closed = closed or "right"
    if closed not in ("right", "left", "both", "neither"):
        raise ValueError(f"closed must be right/left/both/neither, got {closed!r}")
    end = (window - 1) // 2 if center else 0
    start = end - window + 1
    if closed in ("left", "both"):
        start -= 1
    if closed in ("left", "neither"):
        end -= 1
    return start, end


def rolling(
    df: DataFrame,
    cols: Sequence[str],
    window: int,
    order_by: Sequence[str],
    funcs: Sequence[str] = ("mean",),
    partition_by: Sequence[str] | None = None,
    min_periods: int | None = None,
    center: bool = False,
    closed: str | None = None,
    keep_obs: bool = False,
) -> DataFrame:
    """Count-based rolling window (reference ParallelRolling,
    parallel_window.py:30-203; the reference snapshots every pandas ctor
    arg — ``center``/``closed`` included — and replays it per chunk,
    parallel_window.py:91-100). pandas default ``min_periods=window`` →
    rows with fewer observations yield NULL (test_window.py:9-13).

    ``keep_obs=True`` leaves the ``__fin_*``/``__nn_*`` mask columns in
    the output so the NEXT rolling call over the same columns reuses
    them (see ``_window_obs``) — chained frames then fuse into one
    WindowExec pass. Callers select their final columns anyway, which
    prunes the masks."""
    mp = window if min_periods is None else min_periods
    start, end = fixed_frame_bounds(window, center, closed)
    if end < start:  # e.g. window=1, closed='neither': frame is empty
        out = df
        for c in cols:
            for fn in funcs:
                out = out.withColumn(f"{c}_roll_{fn}", F.lit(None).cast("double"))
        return out
    w = _ordered_window(order_by, partition_by).rowsBetween(start, end)
    out, fin, nn, temps = _window_obs(df, cols)
    # pandas asymmetry (verified 2.2): .count() applies min_periods to
    # the frame ROW count, NaN rows included — every other agg counts
    # valid (finite) observations; both guards live in _roll_multi
    out = _roll_multi(out, cols, funcs, w, mp, fin, nn, "_roll_")
    return out if keep_obs else out.drop(*temps)


def rolling_global(
    df: DataFrame,
    cols: Sequence[str],
    window: int,
    order_col: str,
    funcs: Sequence[str] = ("mean",),
    buckets: int | None = None,
) -> DataFrame:
    """Exact UNPARTITIONED rolling over a global row order WITHOUT a
    single-reducer sort — the scale path for pandas'
    ``df.rolling(w).mean()`` over the whole frame (the reference
    README's 1M x 1000 benchmark, README.md:183-193): a plain
    ``Window.orderBy`` with no partitionBy collapses the entire frame
    into ONE task, which at 100 TB is not slow, it is impossible.

    Contract: ``order_col`` is a DENSE integer row index (pandas'
    RangeIndex twin — exactly the order the reference benchmark rolls
    over), verified with the same single aggregate that sizes the
    buckets (count == max-min+1; refused loudly otherwise). Rows are
    range-bucketed into contiguous index spans, each bucket's last
    ``window-1`` rows are REPLICATED into the next bucket as
    context-only rows, the per-bucket window runs fully parallel, and
    context rows drop from the output. Every frame therefore sees
    exactly the rows the single-partition window would — results are
    bit-equal (pinned in tests), including pandas' min_periods=window
    NULL head. Cost: one tiny agg job + a hash exchange on the bucket
    id; replication is (window-1) * n_buckets rows, metadata-sized."""
    stats = df.agg(
        F.min(order_col).alias("mn"), F.max(order_col).alias("mx"),
        F.count("*").alias("n"),
    ).first()
    if stats["n"] == 0:
        out = df
        for c in cols:
            for fn in funcs:
                out = out.withColumn(
                    f"{c}_roll_{fn}", F.lit(None).cast("double"))
        return out
    mn, mx, n = int(stats["mn"]), int(stats["mx"]), int(stats["n"])
    if mx - mn + 1 != n:
        raise ValueError(
            f"rolling_global: {order_col!r} is not a dense integer index "
            f"(span {mx - mn + 1} != rows {n}) — bucket-context "
            "replication needs row-count-exact spans; use rolling() with "
            "an explicit partition, or densify the index first"
        )
    if buckets is None:
        buckets = max(1, df.sparkSession.sparkContext.defaultParallelism)
    width = max((n + buckets - 1) // buckets, window)
    bucket = F.floor((F.col(order_col) - F.lit(mn)) / F.lit(width))
    base = df.withColumn("__bkt", bucket).withColumn("__ctx", F.lit(0))
    ctx = (
        df.where(
            ((F.col(order_col) - F.lit(mn)) % F.lit(width))
            >= F.lit(width - (window - 1))
        )
        .withColumn("__bkt", bucket + F.lit(1))
        .withColumn("__ctx", F.lit(1))
    )
    both = base.unionByName(ctx)
    w = (
        Window.partitionBy("__bkt")
        .orderBy(F.col(order_col).asc())
        .rowsBetween(-(window - 1), 0)
    )
    out, fin, nn, temps = _window_obs(both, cols)
    for c in cols:
        guard = F.count(fin[c]).over(w) >= window
        rows_guard = F.count(F.lit(1)).over(w) >= window
        for fn in funcs:
            g = rows_guard if fn == "count" else guard
            src = nn[c] if fn == "count" else fin[c]
            out = out.withColumn(
                f"{c}_roll_{fn}", F.when(g, _ROLL_FNS[fn](src, w))
            )
    return (
        out.where(F.col("__ctx") == 0)
        .drop("__bkt", "__ctx", *temps)
    )


def rolling_cov_corr(
    df: DataFrame,
    col_a: str,
    col_b: str,
    window: int,
    order_by: Sequence[str],
    partition_by: Sequence[str] | None = None,
    min_periods: int | None = None,
    ddof: int = 1,
    scale_a: int = 6,
    scale_b: int = 6,
    out_prefix: str | None = None,
    compact_sums: bool = False,
) -> DataFrame:
    """Rolling pairwise covariance + Pearson correlation (reference
    ``rolling.p_cov`` dispatch, parallel_window.py:180-185) as pure JVM
    window expressions — no UDF: cov = (Sab − Sa·Sb/n)/(n−ddof) and
    corr = (n·Sab − Sa·Sb)/√((n·Saa−Sa²)(n·Sbb−Sb²)) over the frame,
    with engine-exact scaled-long window sums (det.wqsum) so the result
    is bit-stable across partitionings and engines. ``scale_a``/
    ``scale_b`` follow the det contract: |a|·10^scale_a < 2^62 etc.;
    the cross/square sums use scale_a+scale_b−2-style reductions chosen
    by the caller's magnitudes.

    ``compact_sums=True``: the caller additionally asserts
    ``window · max|x·10^scale| < 2^63`` for every sum input, and the five
    quantized values are projected ONCE per row and window-summed as plain
    LONGs. Identical integers (no overflow ⇒ exact in both engines; SQL
    twins sum BIGINT exactly too), but ~2× faster: DECIMAL(38,0) window
    buffers re-convert and carry 128-bit state per frame-row add, which
    dominates this operator's cost under a sliding frame (measured 1.69 s
    → 0.80 s, sf0.1 lineitem, window 10)."""
    from .. import det

    pre = out_prefix or f"{col_a}_{col_b}"
    mp = window if min_periods is None else min_periods
    w = _ordered_window(order_by, partition_by).rowsBetween(-(window - 1), 0)
    # pandas pairwise-complete semantics: a row where EITHER side is
    # missing contributes to no sum — and the window kernels treat
    # non-finite values as missing (see _finite), so mask both sides on
    # (null | NaN | ±inf) of either
    def _ok(c: str) -> F.Column:
        col = F.col(c)
        if _is_floating(df, c):
            return col.isNotNull() & ~F.isnan(col) & (F.abs(col) != F.lit(float("inf")))
        return col.isNotNull()

    both = _ok(col_a) & _ok(col_b)
    a = F.when(both, F.col(col_a).cast("double"))
    b = F.when(both, F.col(col_b).cast("double"))
    n = F.count(F.when(both, 1)).over(w).cast("double")
    scales = {
        "a": (a, scale_a),
        "b": (b, scale_b),
        "aa": (a * a, max(scale_a - 2, 0)),
        "bb": (b * b, max(scale_b - 2, 0)),
        "ab": (a * b, max(min(scale_a, scale_b) - 1, 0)),
    }
    if compact_sums:
        # r16: project the count and the five window sums ONCE and derive
        # cov/corr from the projected attributes — inline references made
        # every mention of a sum its own frame processor (19 where 6
        # suffice; a sliding frame re-aggregates per row per processor)
        # and split cov/corr into two Window nodes. Same aggregates, same
        # frame, same derivation arithmetic -> bit-identical doubles.
        for k, (x, s) in scales.items():
            df = df.withColumn(
                f"__rcc_{k}", F.floor(x * F.lit(float(10**s)) + F.lit(0.5)).cast("long")
            )
        staged = df.select(
            "*",
            n.alias("__rcc_n"),
            *[F.sum(f"__rcc_{k}").over(w).alias(f"__rcc_s_{k}") for k in scales],
        )
        n = F.col("__rcc_n")
        sums = {
            k: F.col(f"__rcc_s_{k}").cast("double") / F.lit(float(10**s))
            for k, (_, s) in scales.items()
        }
        sa, sb = sums["a"], sums["b"]
        saa, sbb, sab = sums["aa"], sums["bb"], sums["ab"]
        guard = n >= mp
        cov = (sab - sa * sb / n) / (n - ddof)
        corr = (n * sab - sa * sb) / F.sqrt(
            (n * saa - sa * sa) * (n * sbb - sb * sb)
        )
        return (
            staged.withColumn(f"{pre}_roll_cov", F.when(guard, cov))
            .withColumn(f"{pre}_roll_corr", F.when(guard, corr))
            .drop("__rcc_n", *[f"__rcc_s_{k}" for k in scales],
                  *[f"__rcc_{k}" for k in scales])
        )
    sums = {k: det.wqsum(x, w, s) for k, (x, s) in scales.items()}
    sa, sb = sums["a"], sums["b"]
    saa, sbb, sab = sums["aa"], sums["bb"], sums["ab"]
    guard = n >= mp
    cov = (sab - sa * sb / n) / (n - ddof)
    corr = (n * sab - sa * sb) / F.sqrt((n * saa - sa * sa) * (n * sbb - sb * sb))
    return df.withColumn(f"{pre}_roll_cov", F.when(guard, cov)).withColumn(
        f"{pre}_roll_corr", F.when(guard, corr)
    )


def rolling_cov_corr_sql(
    col_a: str,
    col_b: str,
    over: str,
    min_periods: int,
    ddof: int = 1,
    scale_a: int = 6,
    scale_b: int = 6,
) -> tuple[str, str]:
    """SQL twins of :func:`rolling_cov_corr` (cov_expr, corr_expr); the
    caller supplies the matching ``OVER`` clause and wraps with the
    min_periods CASE guard."""
    from .. import det

    both = f"{col_a} IS NOT NULL AND {col_b} IS NOT NULL"
    a = f"(CASE WHEN {both} THEN CAST({col_a} AS DOUBLE) END)"
    b = f"(CASE WHEN {both} THEN CAST({col_b} AS DOUBLE) END)"
    n = f"CAST(COUNT(CASE WHEN {both} THEN 1 END) {over} AS DOUBLE)"
    sa = det.wqsum_sql(a, over, scale_a)
    sb = det.wqsum_sql(b, over, scale_b)
    saa = det.wqsum_sql(f"({a}*{a})", over, max(scale_a - 2, 0))
    sbb = det.wqsum_sql(f"({b}*{b})", over, max(scale_b - 2, 0))
    sab = det.wqsum_sql(f"({a}*{b})", over, max(min(scale_a, scale_b) - 1, 0))
    cov = f"(({sab}) - ({sa})*({sb})/({n})) / (({n}) - {ddof})"
    corr = (
        f"(({n})*({sab}) - ({sa})*({sb}))"
        f" / SQRT((({n})*({saa}) - ({sa})*({sa})) * (({n})*({sbb}) - ({sb})*({sb})))"
    )
    return cov, corr


def time_frame_bounds_us(window_seconds: float, closed: str | None = None) -> tuple[int, int]:
    """pandas VariableWindowIndexer frame bounds in MICROSECONDS, both
    inclusive (``rangeBetween`` form over a ``unix_micros`` ordering).

    pandas' time-rolling default ``closed='right'`` is the LEFT-OPEN
    interval ``(t−w, t]`` — a row sitting exactly at ``t−w`` is excluded
    (verified vs pandas 2.2). At microsecond resolution that is exactly
    ``[−(w_us−1), 0]``; 'both' = ``[−w_us, 0]``, 'left' = ``[−w_us, −1]``,
    'neither' = ``[−(w_us−1), −1]``."""
    closed = closed or "right"
    if closed not in ("right", "left", "both", "neither"):
        raise ValueError(f"closed must be right/left/both/neither, got {closed!r}")
    us = int(round(window_seconds * 1_000_000))
    start = -us if closed in ("left", "both") else -(us - 1)
    end = -1 if closed in ("left", "neither") else 0
    return start, end


def rolling_time(
    df: DataFrame,
    cols: Sequence[str],
    window_seconds: int,
    ts_col: str,
    funcs: Sequence[str] = ("mean",),
    partition_by: Sequence[str] | None = None,
    min_periods: int = 1,
    closed: str | None = None,
    epoch_unit: str | None = None,
) -> DataFrame:
    """Time-based rolling window ('3D'-style freq strings in the reference,
    tools.py:8-36). ``rangeBetween`` over epoch MICROSECONDS with pandas
    ``closed`` semantics — the default 'right' frame is the left-open
    ``(t − window, t]``, so a row exactly ``window`` old is excluded (the
    pre-r6 epoch-second form silently included it: a boundary-tie parity
    bug). pandas time-rolling default min_periods=1.

    Known divergence (deliberate): pandas frames DUPLICATE timestamps
    positionally — each duplicate sees only the duplicates before it —
    while a RANGE frame is value-based, so all equal-``ts`` peers are
    included for every one of them. The value-based form is the only
    partition-order-independent definition a distributed engine can give
    (pandas' positional frame depends on input row order, which a shuffle
    does not preserve)."""
    start, end = time_frame_bounds_us(window_seconds, closed)
    # NTZ parquet timestamps need an explicit cast for unix_micros; the
    # session is pinned UTC so the NTZ->TZ cast is deterministic.
    # Scale path: ``ts_col`` may instead be a PRE-COMPUTED epoch-
    # microsecond integer column — then every rolling_time call in a
    # chain orders by the SAME attribute, so EnsureRequirements proves
    # the sort satisfied and the whole stack runs on ONE Sort (measured
    # r6: 7 sorts -> 1 on the closed-variants battery). An ordering
    # EXPRESSION gets a fresh attribute per call and re-sorts every time.
    from pyspark.sql import types as T

    if isinstance(df.schema[ts_col].dataType, (T.LongType, T.IntegerType)):
        # An integer epoch column is AMBIGUOUS (seconds vs microseconds is
        # a silent 1e6x window-width change) — require the caller to
        # declare the unit rather than guessing.
        if epoch_unit == "us":
            epoch = F.col(ts_col)
        elif epoch_unit == "s":
            epoch = F.col(ts_col).cast("long") * F.lit(1_000_000)
        else:
            raise ValueError(
                f"integer ts_col {ts_col!r} is ambiguous: pass "
                "epoch_unit='us' (epoch microseconds) or epoch_unit='s' "
                "(epoch seconds)"
            )
    else:
        epoch = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = (
        Window.partitionBy(*(partition_by or []))
        .orderBy(epoch)
        .rangeBetween(start, end)
    )
    out, fin, nn, temps = _window_obs(df, cols)
    out = _roll_multi(out, cols, funcs, w, min_periods, fin, nn, "_roll_")
    return out.drop(*temps)


def rolling_quantile(
    df: DataFrame,
    col: str,
    window: int,
    q: float,
    order_by: Sequence[str],
    partition_by: Sequence[str] | None = None,
    min_periods: int | None = None,
    out_col: str | None = None,
    center: bool = False,
    closed: str | None = None,
    interpolation: str = "linear",
) -> DataFrame:
    """Exact quantile over a moving frame — one-q convenience over
    :func:`rolling_quantiles`."""
    return rolling_quantiles(
        df,
        col,
        window,
        {out_col or f"{col}_roll_q{q}": q},
        order_by,
        partition_by,
        min_periods,
        center=center,
        closed=closed,
        interpolation=interpolation,
    )


def rolling_quantiles(
    df: DataFrame,
    col: str,
    window: int,
    qs: dict[str, float],
    order_by: Sequence[str],
    partition_by: Sequence[str] | None = None,
    min_periods: int | None = None,
    center: bool = False,
    closed: str | None = None,
    interpolation: str = "linear",
    _frame: tuple[int, int] | None = None,
) -> DataFrame:
    """Exact quantiles over a moving frame, every requested ``q`` from ONE
    frame materialization: ``collect_list`` over the frame, one
    ``array_sort``, then each quantile is Spark ``Percentile``'s own
    interpolation ((hi−pos)·lower + (pos−lo)·higher, exact value when the
    position is integral) on the sorted array — values bit-identical to
    ``percentile(col, q).over(w)``. ``interpolation`` supports the full
    pandas set: linear/lower/higher/nearest/midpoint (r6 — the reference
    forwards Rolling.quantile's interpolation arg).

    Why not ``percentile().over(w)`` directly: Percentile is an imperative
    (ObjectAggregate) function, so a sliding frame rebuilds its
    counts-hashmap and re-sorts it for EVERY ROW and every q. Sharing one
    sorted array across all q's measured ~4× faster for 2 quantiles at
    window 7 (sf0.1 lineitem), and the gap grows with the number of q's.
    The sort cost is O(window log window) per row either way — for large
    windows prefer rolling_apply (pandas' O(1)-amortized sliding skiplist).
    """
    mp = window if min_periods is None else min_periods
    start, end = _frame if _frame is not None else fixed_frame_bounds(window, center, closed)
    if end < start:
        out = df
        for out_col in qs:
            out = out.withColumn(out_col, F.lit(None).cast("double"))
        return out
    w = _ordered_window(order_by, partition_by).rowsBetween(start, end)
    src = _finite(F.col(col)) if _is_floating(df, col) else F.col(col)
    # one window evaluation, one sort: each lives in its OWN projection so
    # CollapseProject cannot inline (and so duplicate) them per consumer
    out = df.withColumn("__rq_vals", F.collect_list(src).over(w))
    out = out.withColumn("__rq_srt", F.array_sort(F.col("__rq_vals")))
    if interpolation not in ("linear", "lower", "higher", "nearest", "midpoint"):
        raise ValueError(f"unknown interpolation {interpolation!r}")
    srt = F.col("__rq_srt")
    n = F.size(srt)
    for out_col, q in qs.items():
        pos = F.lit(float(q)) * (n - 1).cast("double")
        lo = F.floor(pos).cast("long")
        hi = F.ceil(pos).cast("long")
        lower = F.element_at(srt, (lo + 1).cast("int")).cast("double")
        higher = F.element_at(srt, (hi + 1).cast("int")).cast("double")
        exact = hi == lo
        if interpolation == "linear":
            between = (hi.cast("double") - pos) * lower + (pos - lo.cast("double")) * higher
        elif interpolation == "lower":
            between = lower
        elif interpolation == "higher":
            between = higher
        elif interpolation == "midpoint":
            between = (lower + higher) / 2.0
        else:  # nearest: round-half-to-EVEN index, numpy/pandas convention
            frac = pos - lo.cast("double")
            pick_hi = (frac > 0.5) | ((frac == 0.5) & (hi % 2 == 0))
            between = F.when(pick_hi, higher).otherwise(lower)
        out = out.withColumn(
            out_col, F.when(n >= mp, F.when(exact, lower).otherwise(between))
        )
    return out.drop("__rq_vals", "__rq_srt")


def rolling_rank(
    df: DataFrame,
    col: str,
    window: int,
    order_by: Sequence[str],
    partition_by: Sequence[str] | None = None,
    min_periods: int | None = None,
    out_col: str | None = None,
    center: bool = False,
    closed: str | None = None,
    method: str = "average",
    pct: bool = False,
    _frame: tuple[int, int] | None = None,
) -> DataFrame:
    """pandas ``rolling.rank(method=, pct=)`` (r6: full arg surface —
    'average'/'min'/'max' and the pct fraction-of-frame form): the rank
    of the FRAME'S LAST element among the frame's values — pinned
    empirically; with ``center``/``closed`` frames the ranked element is
    the frame-end row, NOT the current row (e.g. closed='left' ranks the
    previous row's value within the lagged frame). No window primitive
    compares frame rows to a chosen row, so the frame is materialized
    with ``collect_list`` (O(window) per row — fine for small windows; use
    rolling_apply for large ones) and the average rank is
    count_less + (count_equal + 1)/2 via array filters — all JVM-side.
    NaNs in the frame are excluded from ranking (collect_list drops
    NULLs); a NULL frame-end value yields NULL, like pandas.

    Known divergence (deliberate): at the LAST ``end`` rows of a
    partition, a lookahead frame (center=True, or closed frames with a
    FOLLOWING edge) clips — we rank the clipped frame's actual last
    element. pandas 2.2 instead repeats the rank computed at the last
    position where its streaming skiplist inserted a value (removals
    never refresh it), emitting stale ranks that can EXCEED the window
    size (rolling(3, center=True).rank() returns 4.0 on monotonic data).
    That is internal-state leakage, not a semantics worth replicating."""
    mp = window if min_periods is None else min_periods
    out_col = out_col or f"{col}_roll_rank"
    start, end = _frame if _frame is not None else fixed_frame_bounds(window, center, closed)
    if end < start:
        return df.withColumn(out_col, F.lit(None).cast("double"))
    w = _ordered_window(order_by, partition_by).rowsBetween(start, end)
    src = _finite(F.col(col)) if _is_floating(df, col) else F.col(col)
    # r16: project the frame list (and frame-end value) ONCE — the rank
    # expression references the list 3-4 times (two filters, the size
    # guard, the pct denominator) and each inline reference was its own
    # collect_list frame processor building the same array per row.
    vals_a, cur_a = f"__rr_vals_{col}", f"__rr_cur_{col}"
    raws = [F.collect_list(src).over(w).alias(vals_a)]  # frame-ordered, non-finite dropped
    if end != 0:
        # the frame-end ROW's value: last() over the SAME frame keeps the
        # partition-edge clipping pandas applies (a lead() would overshoot
        # past the partition tail and return NULL where pandas ranks the
        # clipped frame's own last row)
        raws.append(F.last(src, ignorenulls=False).over(w).alias(cur_a))
    df = df.select("*", *raws)
    vals = F.col(vals_a)
    cur = src if end == 0 else F.col(cur_a)
    less = F.size(F.filter(vals, lambda v: v < cur))
    eq = F.size(F.filter(vals, lambda v: v == cur))
    if method == "average":
        rank = less.cast("double") + (eq.cast("double") + 1.0) / 2.0
    elif method == "min":
        rank = less.cast("double") + 1.0
    elif method == "max":
        rank = less.cast("double") + eq.cast("double")
    else:
        raise ValueError(f"rank method must be average/min/max, got {method!r}")
    if pct:
        rank = rank / F.size(vals).cast("double")
    guard = F.size(vals) >= mp
    return df.withColumn(out_col, F.when(guard & cur.isNotNull(), rank)).drop(
        vals_a, *([cur_a] if end != 0 else [])
    )


def expanding(
    df: DataFrame,
    cols: Sequence[str],
    order_by: Sequence[str],
    funcs: Sequence[str] = ("sum",),
    partition_by: Sequence[str] | None = None,
    min_periods: int = 1,
    keep_obs: bool = False,
) -> DataFrame:
    """Expanding window (reference ParallelExpanding,
    parallel_window.py:262-275): frame = start..current row.
    ``keep_obs`` as in :func:`rolling` — mask-column reuse for chained
    window fusion."""
    w = _ordered_window(order_by, partition_by).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    out, fin, nn, temps = _window_obs(df, cols)
    out = _roll_multi(out, cols, funcs, w, min_periods, fin, nn, "_exp_")
    return out if keep_obs else out.drop(*temps)


#: "unbounded preceding .. current row" as a rowsBetween pair, usable as
#: the _frame override of the rolling quantile/rank kernels
_EXPANDING_FRAME = (Window.unboundedPreceding, 0)


def expanding_quantile(
    df: DataFrame,
    col: str,
    q: float,
    order_by: Sequence[str],
    partition_by: Sequence[str] | None = None,
    min_periods: int = 1,
    out_col: str | None = None,
    interpolation: str = "linear",
) -> DataFrame:
    """pandas ``Expanding.quantile`` — the rolling quantile kernel on the
    unbounded-preceding frame (reference ROLL_AND_EXP_OPS applies the
    same op set to Expanding, main.py:44-46)."""
    return rolling_quantiles(
        df, col, max(min_periods, 1),
        {out_col or f"{col}_exp_q{q}": q},
        order_by, partition_by, min_periods,
        interpolation=interpolation, _frame=_EXPANDING_FRAME,
    )


def expanding_rank(
    df: DataFrame,
    col: str,
    order_by: Sequence[str],
    partition_by: Sequence[str] | None = None,
    min_periods: int = 1,
    out_col: str | None = None,
    method: str = "average",
    pct: bool = False,
) -> DataFrame:
    """pandas ``Expanding.rank`` — the rolling rank kernel on the
    unbounded-preceding frame (current row is the frame end)."""
    return rolling_rank(
        df, col, max(min_periods, 1), order_by, partition_by, min_periods,
        out_col=out_col or f"{col}_exp_rank", method=method, pct=pct,
        _frame=_EXPANDING_FRAME,
    )


def expanding_apply(
    df: DataFrame,
    col: str,
    func,
    order_by: Sequence[str],
    partition_by: Sequence[str],
    min_periods: int = 1,
    out_col: str | None = None,
    out_type: str = "double",
) -> DataFrame:
    """pandas ``Expanding.apply(raw=True)`` — same partition-wise Arrow
    shape as :func:`rolling_apply` with the expanding frame."""
    out_col = out_col or f"{col}_exp_apply"
    order_cols = list(order_by)
    part_cols = list(partition_by)
    schema = (
        f"{', '.join(f'{f.name} {f.dataType.simpleString()}' for f in df.schema.fields)},"
        f" {out_col} {out_type}"
    )

    def _apply_partition(batches):
        import pandas as pd

        buf = list(batches)
        if not buf:
            return
        pdf = pd.concat(buf, ignore_index=True)
        pdf[out_col] = (
            pdf.groupby(part_cols, sort=False, group_keys=False)[col]
            .expanding(min_periods=min_periods)
            .apply(func, raw=True)
            .to_numpy()
        )
        yield pdf

    return (
        df.repartition(*part_cols)
        .sortWithinPartitions(*part_cols, *order_cols)
        .mapInPandas(_apply_partition, schema=schema)
    )


# ---------------------------------------------------------------------------
# EWM — recursive, not frame-expressible: Arrow applyInPandas per group
# (reference ParallelEWM parallel_window.py:282-305; grouped variant
# parallel_window.py:216-255 runs one chunk per group — same shape here).
# ---------------------------------------------------------------------------


def ewm(
    df: DataFrame,
    cols: Sequence[str],
    order_by: Sequence[str],
    partition_by: Sequence[str],
    funcs: Sequence[str] = ("mean",),
    span: float | None = None,
    alpha: float | None = None,
    halflife=None,
    com: float | None = None,
    times_col: str | None = None,
    adjust: bool = True,
    min_periods: int = 0,
    ignore_na: bool = False,
) -> DataFrame:
    """Exponentially-weighted mean/sum/std/var per group.

    Accepts the full pandas decay parameterization — exactly one of
    ``span``/``alpha``/``halflife``/``com`` (reference ParallelEWM forwards
    the whole kwarg set, parallel_window.py:282-305). ``times_col`` names a
    datetime column for irregular-spacing decay (pandas ``times=``; requires
    ``halflife`` as a timedelta/str like ``"1h"``).

    Requires ``partition_by``: EWM is inherently sequential within a series,
    so the scalable unit is the group (each group fits one Arrow batch
    stream; groups run in parallel). A global EWM on 100 TB is a sequential
    scan no engine parallelizes — reject it rather than pretend.
    """
    decay = {"span": span, "alpha": alpha, "halflife": halflife, "com": com}
    kw = {k: v for k, v in decay.items() if v is not None}
    spec = dict(kw, funcs=funcs, adjust=adjust, times_col=times_col, suffix="",
                min_periods=min_periods, ignore_na=ignore_na)
    return ewm_multi(df, cols, order_by, partition_by, [spec])


def ewm_multi(
    df: DataFrame,
    cols: Sequence[str],
    order_by: Sequence[str],
    partition_by: Sequence[str],
    specs: Sequence[dict],
) -> DataFrame:
    """Several EWM parameterizations in ONE applyInPandas pass.

    Each spec is ``{span|alpha|halflife|com: v, funcs: (...), adjust: bool,
    times_col: str|None, suffix: str}``; output columns are
    ``{col}_ewm_{fn}{suffix}``. One pass matters: on the local rig each
    grouped-map pass costs ~4 s of fixed shuffle + per-group Arrow overhead
    for 1.5 k groups, and at cluster scale every extra pass is a full
    shuffle plus a join to recombine — fanning all variants out of a single
    sorted group frame is strictly cheaper than pass-per-variant.
    """
    if not partition_by:
        raise ValueError("ewm requires partition_by: per-group EWM is the scalable unit")
    import pandas as pd  # noqa: F401

    norm = []
    for s in specs:
        s = dict(s)
        fn_list = list(s.pop("funcs", ("mean",)))
        adjust = s.pop("adjust", True)
        times_col = s.pop("times_col", None)
        suffix = s.pop("suffix", "")
        # pandas ewm kwargs that are not decay parameters — forwarded
        # verbatim (reference ParallelEWM snapshots the whole ctor kwarg
        # set, parallel_window.py:282-305)
        min_periods = s.pop("min_periods", 0)
        ignore_na = s.pop("ignore_na", False)
        # reference p_ewm_ddof forwards bias= to std/var
        # (parallel_window.py:282-305); pandas default bias=False
        bias = s.pop("bias", False)
        spec_cols = s.pop("cols", None)  # per-spec column override
        kw = {k: v for k, v in s.items() if v is not None}
        if len(kw) != 1:
            raise ValueError(f"pass exactly one of span/alpha/halflife/com, got {sorted(kw)}")
        if times_col is not None and "halflife" not in kw:
            raise ValueError("times_col requires halflife= (timedelta or str)")
        kw = dict(kw, min_periods=int(min_periods or 0), ignore_na=bool(ignore_na))
        norm.append((kw, fn_list, adjust, times_col, suffix,
                     list(spec_cols) if spec_cols is not None else None, bias))

    order_cols = list(order_by)
    value_cols = list(cols)
    part_cols = list(partition_by)

    out_fields = ", ".join(
        f"{c}_ewm_{fn}{suffix} double"
        for (_, fn_list, _, _, suffix, spec_cols, _) in norm
        for c in (spec_cols if spec_cols is not None else value_cols)
        for fn in fn_list
    )
    schema = f"{', '.join(f'{f.name} {f.dataType.simpleString()}' for f in df.schema.fields)}, {out_fields}"

    if any(times_col is not None for (_, _, _, times_col, _, _, _) in norm):
        # irregular-spacing decay: per-group pandas ewm(times=) path
        def _ewm_group(pdf):
            pdf = pdf.sort_values(order_cols)
            for kw, fn_list, adjust, times_col, suffix, spec_cols, bias in norm:
                for c in (spec_cols if spec_cols is not None else value_cols):
                    if times_col is not None:
                        e = pdf[c].ewm(adjust=adjust, times=pdf[times_col], **kw)
                    else:
                        e = pdf[c].ewm(adjust=adjust, **kw)
                    for fn in fn_list:
                        akw = {"bias": bias} if fn in ("std", "var") else {}
                        pdf[f"{c}_ewm_{fn}{suffix}"] = getattr(e, fn)(**akw)
            return pdf

        return df.groupBy(*part_cols).applyInPandas(_ewm_group, schema=schema)

    # Fast path: pandas grouped EWM is cython-vectorized ACROSS groups, so
    # one pandas call per PARTITION beats one UDF call per group (Spark's
    # grouped-map dispatch costs ~1-2 ms/group; thousands of small series
    # per partition is the common shape). repartition on the keys
    # co-locates each series; sortWithinPartitions orders rows so groups
    # are contiguous and appearance-ordered — grouped-ewm output then
    # aligns positionally with the partition frame. Memory is one
    # partition per worker (sized by spark.sql.shuffle.partitions), the
    # same contract as any shuffle-sized pandas stage.
    def _ewm_partition(batches):
        import pandas as pd

        buf = list(batches)
        if not buf:
            return
        pdf = pd.concat(buf, ignore_index=True)
        gb = pdf.groupby(part_cols, sort=False, group_keys=False)
        for kw, fn_list, adjust, _times, suffix, spec_cols, bias in norm:
            for c in (spec_cols if spec_cols is not None else value_cols):
                e = gb[c].ewm(adjust=adjust, **kw)
                for fn in fn_list:
                    akw = {"bias": bias} if fn in ("std", "var") else {}
                    pdf[f"{c}_ewm_{fn}{suffix}"] = getattr(e, fn)(**akw).to_numpy()
        yield pdf

    return (
        df.repartition(*part_cols)
        .sortWithinPartitions(*part_cols, *order_cols)
        .mapInPandas(_ewm_partition, schema=schema)
    )


def win_type_weights(win_type: str, window: int, **params) -> list[float]:
    """Translate a scipy window-shape name into literal weights — the
    reference's ``win_type=`` surface (ParallelWindow,
    parallel_window.py:206-213) where scipy produces the weights; pandas
    calls ``scipy.signal.get_window(win_type, window, fftbins=False)``
    (symmetric). These are the closed forms of the symmetric windows, so
    no scipy dependency: feed the result straight into
    :func:`weighted_window`.

    Supported: gaussian (requires ``std=``), triang, bartlett, hamming,
    hann, blackman, blackmanharris, nuttall, flattop, bohman, parzen,
    kaiser (requires ``beta=``), boxcar, cosine, barthann, tukey
    (``alpha=``, default 0.5), exponential (``tau=``, default 1.0;
    symmetric center) — the full scipy symmetric-window catalog of
    closed-form shapes (scipy.signal.windows source; kaiser's I0 Bessel
    factor is evaluated by its power series, the same definition
    numpy.kaiser uses, so no scipy dependency). Unknown names raise
    ValueError naming the supported set.
    """
    import math

    M = int(window)
    if M < 1:
        raise ValueError("window must be >= 1")
    if win_type == "boxcar":
        return [1.0] * M
    if M == 1:
        return [1.0]
    if win_type == "gaussian":
        std = float(params["std"])
        c = (M - 1) / 2.0
        return [math.exp(-0.5 * ((i - c) / std) ** 2) for i in range(M)]
    _COS_TERMS = {
        # generalized-cosine family: w[i] = sum_k (-1)^k a_k cos(2πki/(M−1))
        "hamming": (0.54, 0.46),
        "hann": (0.5, 0.5),
        "blackman": (0.42, 0.5, 0.08),
        "blackmanharris": (0.35875, 0.48829, 0.14128, 0.01168),
        "nuttall": (0.3635819, 0.4891775, 0.1365995, 0.0106411),
        "flattop": (0.21557895, 0.41663158, 0.277263158, 0.083578947,
                    0.006947368),
    }
    coefs = _COS_TERMS.get(win_type)
    if win_type == "general_cosine":
        # scipy's general_cosine(M, a) evaluates Σ a_k cos(k·fac) over
        # fac = linspace(−π, π, M); cos(k(−π + 2πi/(M−1))) =
        # (−1)^k cos(2πki/(M−1)), i.e. the same alternating form with
        # the caller's coefficients
        coefs = [float(x) for x in params["a"]]
    elif win_type == "general_hamming":
        # general_hamming(M, alpha) = general_cosine(M, [alpha, 1−alpha])
        alpha = float(params["alpha"])
        coefs = (alpha, 1.0 - alpha)
    if coefs is not None:
        return [
            sum(
                (-1.0) ** k * a * math.cos(2.0 * math.pi * k * i / (M - 1))
                for k, a in enumerate(coefs)
            )
            for i in range(M)
        ]
    if win_type == "general_gaussian":
        # w(n) = exp(−0.5·|n/sig|^(2p)), n centered; p=1 is gaussian
        p = float(params["p"])
        sig = float(params["sig"])
        c = (M - 1) / 2.0
        return [math.exp(-0.5 * abs((i - c) / sig) ** (2.0 * p)) for i in range(M)]
    if win_type == "lanczos":
        # w(n) = sinc(2n/(M−1) − 1), sinc(x) = sin(πx)/(πx), sinc(0)=1
        def _sinc(x: float) -> float:
            return 1.0 if x == 0.0 else math.sin(math.pi * x) / (math.pi * x)

        return [_sinc(2.0 * i / (M - 1) - 1.0) for i in range(M)]
    if win_type == "bartlett":
        c = (M - 1) / 2.0
        return [1.0 - abs(i - c) / c for i in range(M)]
    if win_type == "triang":
        if M % 2:
            half = [2.0 * n / (M + 1) for n in range(1, (M + 1) // 2 + 1)]
            return half + half[-2::-1]
        half = [(2.0 * n - 1.0) / M for n in range(1, M // 2 + 1)]
        return half + half[::-1]
    if win_type == "bohman":
        # x = |linspace(-1, 1, M)|; w = (1−x)cos(πx) + sin(πx)/π
        out = []
        for i in range(M):
            x = abs(2.0 * i / (M - 1) - 1.0)
            out.append((1.0 - x) * math.cos(math.pi * x)
                       + math.sin(math.pi * x) / math.pi)
        return out
    if win_type == "parzen":
        # de la Vallée Poussin: piecewise cubic over n = i − (M−1)/2,
        # x = |n|/(M/2): 1 − 6x² + 6x³ for |n| ≤ (M−1)/4, else 2(1−x)³
        out = []
        for i in range(M):
            n = i - (M - 1) / 2.0
            x = abs(n) / (M / 2.0)
            if abs(n) <= (M - 1) / 4.0:
                out.append(1.0 - 6.0 * x * x + 6.0 * x * x * x)
            else:
                out.append(2.0 * (1.0 - x) ** 3)
        return out
    if win_type == "barthann":
        # modified Bartlett-Hann: 0.62 − 0.48·fac + 0.38·cos(2πfac),
        # fac = |i/(M−1) − 0.5|
        out = []
        for i in range(M):
            fac = abs(i / (M - 1) - 0.5)
            out.append(0.62 - 0.48 * fac + 0.38 * math.cos(2.0 * math.pi * fac))
        return out
    if win_type == "cosine":
        # half-period sine: sin(π(i + 0.5)/M)
        return [math.sin(math.pi / M * (i + 0.5)) for i in range(M)]
    if win_type == "tukey":
        # tapered cosine: flat middle, cosine-lobe edges of total width
        # alpha·(M−1); alpha<=0 degenerates to boxcar, >=1 to hann
        alpha = float(params.get("alpha", 0.5))
        if alpha <= 0:
            return [1.0] * M
        if alpha >= 1.0:
            return [
                0.5 * (1.0 - math.cos(2.0 * math.pi * i / (M - 1)))
                for i in range(M)
            ]
        width = int(alpha * (M - 1) / 2.0)
        out = []
        for i in range(M):
            if i <= width:
                out.append(
                    0.5 * (1.0 + math.cos(math.pi * (-1.0 + 2.0 * i / alpha / (M - 1))))
                )
            elif i < M - width - 1:
                out.append(1.0)
            else:
                out.append(
                    0.5
                    * (1.0 + math.cos(math.pi * (-2.0 / alpha + 1.0 + 2.0 * i / alpha / (M - 1))))
                )
        return out
    if win_type == "exponential":
        # symmetric Poisson window: exp(−|i − (M−1)/2| / tau); scipy
        # allows an explicit center only with sym=False, which pandas
        # never uses — the symmetric center is fixed here for the same
        # reason
        tau = float(params.get("tau", 1.0))
        c = (M - 1) / 2.0
        return [math.exp(-abs(i - c) / tau) for i in range(M)]
    if win_type == "kaiser":
        beta = float(params["beta"])

        def i0(x: float) -> float:
            # modified Bessel I0 power series: Σ ((x/2)^k / k!)² —
            # monotone positive terms, converges in <40 iterations for
            # any beta a window shape would use
            term, total, k = 1.0, 1.0, 0
            while True:
                k += 1
                term *= (x / 2.0 / k) ** 2
                total += term
                if term < total * 1e-16 or k > 500:
                    return total

        denom = i0(beta)
        return [
            i0(beta * math.sqrt(max(0.0, 1.0 - (2.0 * i / (M - 1) - 1.0) ** 2)))
            / denom
            for i in range(M)
        ]
    if win_type == "chebwin":
        # Dolph-Chebyshev (equiripple sidelobes at −at dB): sample the
        # order-(M−1) Chebyshev polynomial at beta·cos(πk/M) in the
        # frequency domain, inverse-transform (one real FFT — the
        # textbook construction), then normalize to max 1. All sidelobes
        # of the result's DTFT sit at EXACTLY −at dB — the defining
        # property, asserted independently in tests.
        import numpy as np

        at = float(params.get("at", 100.0))
        order = M - 1
        beta = math.cosh(math.acosh(10.0 ** (at / 20.0)) / order)

        def _cheb(x: float) -> float:
            if x > 1.0:
                return math.cosh(order * math.acosh(x))
            if x < -1.0:
                return (-1.0) ** (order % 2) * math.cosh(order * math.acosh(-x))
            return math.cos(order * math.acos(x))

        p = np.array([_cheb(beta * math.cos(math.pi * k / M)) for k in range(M)])
        if M % 2:
            w_ = np.real(np.fft.fft(p))
            half = (M + 1) // 2
            w_ = w_[:half]
            w_ = np.concatenate((w_[half - 1 : 0 : -1], w_))
        else:
            p = p * np.exp(1.0j * math.pi / M * np.arange(M))
            w_ = np.real(np.fft.fft(p))
            half = M // 2 + 1
            w_ = np.concatenate((w_[half - 1 : 0 : -1], w_[1:half]))
        return (w_ / w_.max()).tolist()
    if win_type == "taylor":
        # Taylor window (nbar near-constant sidelobes at −sll dB): the
        # classic Fm cosine-series construction; norm=True scales the
        # center sample to exactly 1
        nbar = int(params.get("nbar", 4))
        sll = float(params.get("sll", 30.0))
        norm = bool(params.get("norm", True))
        B = 10.0 ** (sll / 20.0)
        A = math.acosh(B) / math.pi
        s2 = nbar * nbar / (A * A + (nbar - 0.5) ** 2)
        ma = list(range(1, nbar))
        Fm = []
        for mi, m in enumerate(ma):
            numer = (-1.0) ** mi
            for j in ma:
                numer *= 1.0 - m * m / s2 / (A * A + (j - 0.5) ** 2)
            denom = 2.0
            for j in ma:
                if j != m:
                    denom *= 1.0 - (m * m) / (j * j)
            Fm.append(numer / denom)

        def _W(n: float) -> float:
            return 1.0 + 2.0 * sum(
                f * math.cos(2.0 * math.pi * m * (n - M / 2.0 + 0.5) / M)
                for f, m in zip(Fm, ma)
            )

        out = [_W(i) for i in range(M)]
        if norm:
            scale = 1.0 / _W((M - 1) / 2.0)
            out = [v * scale for v in out]
        return out
    if win_type == "dpss":
        # Slepian window: the first discrete prolate spheroidal sequence
        # — the eigenvector of the symmetric tridiagonal concentration
        # matrix (Percival & Walden eq. 378: diag ((M−1−2i)/2)²·cos(2πW),
        # off-diag i(M−i)/2) for the LARGEST eigenvalue; it maximizes
        # spectral energy concentration in [−W, W] over all length-M
        # sequences (the defining property, asserted in tests against
        # every other catalog shape). numpy's eigh handles the dense
        # solve — window lengths are tiny. Normalized to max 1 like the
        # other shapes (scipy's Kmax=None 'approximate' subsample-shift
        # correction is intentionally NOT applied; it rescales by a
        # constant ~1 and exists for spectrum estimation, not weighting —
        # documented divergence).
        import numpy as np

        NW = float(params["NW"])
        W = NW / M
        i = np.arange(M)
        diag = ((M - 1 - 2.0 * i) / 2.0) ** 2 * math.cos(2.0 * math.pi * W)
        off = i[1:] * (M - i[1:]) / 2.0
        T = np.diag(diag) + np.diag(off, 1) + np.diag(off, -1)
        vals, vecs = np.linalg.eigh(T)
        w_ = vecs[:, -1]  # eigenvector of the largest eigenvalue
        if w_.sum() < 0:
            w_ = -w_  # sign convention: positive lobe
        return (w_ / w_.max()).tolist()
    raise ValueError(
        f"unsupported win_type {win_type!r}; supported: boxcar, triang, "
        "bartlett, barthann, hamming, hann, blackman, blackmanharris, "
        "nuttall, flattop, bohman, parzen, cosine, tukey, exponential, "
        "lanczos, chebwin(at=), taylor(nbar=, sll=, norm=), gaussian(std=), "
        "kaiser(beta=), general_cosine(a=), general_hamming(alpha=), "
        "general_gaussian(p=, sig=), dpss(NW=)"
    )


def weighted_window(
    df: DataFrame,
    col: str,
    window: int,
    weights: Sequence[float],
    order_by: Sequence[str],
    partition_by: Sequence[str],
    func: str = "mean",
    out_col: str | None = None,
) -> DataFrame:
    """Weighted moving aggregate (reference ParallelWindow with
    ``win_type=`` scipy shapes, parallel_window.py:206-213). Implemented as
    an explicit dot product over a ``collect_list`` slice — stays JVM-side;
    the scipy window shape is materialized to literal weights by the caller.

    ``func``: 'mean', 'sum', 'var', 'std' — the same set pandas supports
    for weighted windows (everything else raises NotImplementedError in
    pandas too). var/std use pandas' debiased weighted formula
    (roll_weighted_var, ddof=1):  V = (Σwx² − (Σwx)²/Σw) · Σw/((Σw)²−Σw²),
    with Σw and Σw² compile-time literals.
    """
    if len(weights) != window:
        raise ValueError("len(weights) must equal window")
    if func not in ("mean", "sum", "var", "std"):
        raise NotImplementedError(
            f"weighted window supports mean/sum/var/std, not {func!r} "
            "(pandas raises NotImplementedError for these too)"
        )
    out_col = out_col or f"{col}_w{func}"
    w = _ordered_window(order_by, partition_by).rowsBetween(-(window - 1), 0)
    vals = F.collect_list(F.col(col)).over(w)  # frame-ordered values
    warr = F.array(*[F.lit(float(x)) for x in weights])
    dot = F.aggregate(
        F.zip_with(vals, warr, lambda v, wt: v * wt),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    wsum = F.lit(float(sum(weights)))
    if func in ("var", "std"):
        dot2 = F.aggregate(
            F.zip_with(vals, warr, lambda v, wt: v * wt * v),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        # debias factor Σw/((Σw)²−Σw²) precomputed in PYTHON and embedded
        # as ONE literal: leaving `wsum*wsum - wsum2` to the engine lets a
        # C++ engine contract it into FMA (1-ulp constant drift vs the
        # JVM's strict separate ops — r7 sf1 sweep finding); a single
        # plan-time double is the same bits everywhere
        ws = float(sum(weights))
        den = ws * ws - float(sum(x * x for x in weights))
        if den == 0.0:
            # (Σw)² == Σw² ⇒ effectively one observation ⇒ ddof=1
            # variance undefined — pandas yields NaN; NULL is this
            # engine's NaN encoding (previously reached lazily via the
            # non-ANSI x/0→NULL division)
            var = F.lit(None).cast("double")
        else:
            var = (dot2 - dot * dot / wsum) * F.lit(ws / den)
        expr = F.sqrt(var) if func == "std" else var
    elif func == "mean":
        expr = dot / wsum
    else:
        expr = dot
    expr = F.when(F.size(vals) >= window, expr)
    return df.withColumn(out_col, expr)


def rolling_apply(
    df: DataFrame,
    col: str,
    window: int,
    func,
    order_by: Sequence[str],
    partition_by: Sequence[str],
    min_periods: int | None = None,
    out_col: str | None = None,
    out_type: str = "double",
) -> DataFrame:
    """Arbitrary UDF over each rolling frame — reference
    ``rolling.p_apply(raw=)`` (parallel_window.py:140-203). The UDF sees a
    numpy array per frame, exactly pandas ``rolling.apply(raw=True)``
    semantics. Partition-wise like :func:`ewm_multi`: key-repartition +
    sortWithinPartitions, then pandas *grouped* rolling per partition —
    frame boundaries still respect the group keys, but Spark dispatches
    one UDF call per partition instead of per group."""
    out_col = out_col or f"{col}_roll_apply"
    order_cols = list(order_by)
    part_cols = list(partition_by)
    mp = window if min_periods is None else min_periods
    schema = (
        f"{', '.join(f'{f.name} {f.dataType.simpleString()}' for f in df.schema.fields)},"
        f" {out_col} {out_type}"
    )

    def _apply_partition(batches):
        import pandas as pd

        buf = list(batches)
        if not buf:
            return
        pdf = pd.concat(buf, ignore_index=True)
        pdf[out_col] = (
            pdf.groupby(part_cols, sort=False, group_keys=False)[col]
            .rolling(window, min_periods=mp)
            .apply(func, raw=True)
            .to_numpy()
        )
        yield pdf

    return (
        df.repartition(*part_cols)
        .sortWithinPartitions(*part_cols, *order_cols)
        .mapInPandas(_apply_partition, schema=schema)
    )
