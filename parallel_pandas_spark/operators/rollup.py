"""Incremental rollup maintenance: mergeable aggregate STATE that can be
persisted at a fine grain and re-aggregated to any coarser grain without
rescanning the raw data — the pattern a 100 TB pipeline uses to keep
daily/monthly/total rollups current (only new partitions are scanned to
produce new state; old state merges by pure integer addition).

Why this is exact (not approximately-equal-to-recompute): the state
holds det.py-style fixed-point power sums — each row quantizes with pure
IEEE double ops (``floor(x·10^s + 0.5)``, bit-identical in any engine)
and accumulates as DECIMAL(38,0) integers. Integer addition is
associative, so ANY merge tree over partial states produces the same
total integer as a single-pass aggregation — finalize() then computes
count/sum/mean/min/max/var/std as the SAME closed-form scalar
expressions det.py uses, giving doubles that are bit-identical to a
direct deterministic aggregation of the raw rows AND to the DuckDB
oracle built from det's ``*_sql`` twins. A float-sum state offers none
of this: its merge order changes the last ulp, so an incrementally
maintained rollup would silently drift from a recompute.

min/max merge exactly by construction. NaN rows drop out of sums and
counts together (det._nobs semantics = pandas skipna).

The reference (dubovikmaster/parallel-pandas) has no incremental or
storage layer — this module is extension-tier scale infrastructure,
like vecstore.py and cdc.py.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from parallel_pandas_spark.det import _nobs


def _qint(col: str, scale: int):
    """Per-row exact quantization to an integer grid — the identical
    expression shape as det.lsum's per-row term (floor of one IEEE
    multiply; NaN floors to NULL so sums and _nobs counts skip the same
    rows), accumulated as DECIMAL(38,0) so state merges never wrap."""
    c = F.col(col).cast("double")
    return (
        F.floor(c * F.lit(float(10**scale)) + F.lit(0.5))
        .cast("long")
        .cast("decimal(38,0)")
    )


def _extrema_aggs(col: str) -> list:
    """The state's min/max aggregates — nanvl(c, NULL) maps NaN -> NULL
    so min/max skip NaN like the sums and counts do (pandas skipna;
    Spark's bare min/max rank NaN GREATEST, which would poison every
    rollup containing one NaN row). Shared by :func:`agg_state` and the
    per-touched-group extrema recompute in incremental.refresh_extrema,
    so refreshed extrema are bit-identical to built ones."""
    cs = F.nanvl(
        F.col(col).cast("double"), F.lit(None).cast("double")
    )
    return [F.min(cs).alias(f"mn_{col}"), F.max(cs).alias(f"mx_{col}")]


def _state_cols(col: str, scale: int, sq_scale: int) -> list:
    c = F.col(col).cast("double")
    return [
        _nobs(col).alias(f"n_{col}"),
        F.sum(_qint(col, scale)).alias(f"s1_{col}"),
        F.sum(
            F.floor(c * c * F.lit(float(10**sq_scale)) + F.lit(0.5))
            .cast("long")
            .cast("decimal(38,0)")
        ).alias(f"s2_{col}"),
        *_extrema_aggs(col),
    ]


def agg_state(
    df: DataFrame,
    keys: Sequence[str],
    cols: dict[str, tuple[int, int]],
    distinct_cols: Sequence[str] = (),
    hll_lg_k: int = 12,
) -> DataFrame:
    """Build mergeable aggregate state at grain ``keys``.

    ``cols`` maps value column -> (scale, sq_scale) with the det.py
    contract ``max|x|·10^scale < 2^62`` and ``max|x|²·10^sq_scale <
    2^62`` (the per-ROW bound; the accumulator is DECIMAL(38,0) and
    never wraps). State columns per value column c: ``n_c`` (long count,
    NaN-skipping), ``s1_c``/``s2_c`` (exact integer power sums,
    DECIMAL(38,0)), ``mn_c``/``mx_c`` (double). One shuffle on the fine
    keys with map-side partial aggregation — at 100 TB only the state
    (|distinct fine keys| rows) ever leaves the scan stage.

    ``distinct_cols`` adds a mergeable Apache-DataSketches HLL sketch
    per listed column (``hll_<col>`` binary, Spark's hll_sketch_agg):
    sketch union is associative and idempotent, so approximate distinct
    counts survive any merge tree — the one statistic an exact integer
    state cannot carry incrementally (a distinct count is not a sum).
    Estimate precision is set by ``hll_lg_k`` (2^lg_k registers)."""
    aggs = []
    for col, (scale, sq_scale) in cols.items():
        aggs.extend(_state_cols(col, scale, sq_scale))
    for col in distinct_cols:
        aggs.append(_hll_agg(df, col, hll_lg_k))
    return df.groupBy(*keys).agg(*aggs)


def _hll_agg(df: DataFrame, col: str, hll_lg_k: int):
    """hll_sketch_agg accepts int/bigint/string/binary only — other
    types hash via their canonical string form (injective for the
    distinct-count purpose; NULLs are skipped by the sketch). Shared by
    :func:`agg_state` and incremental.refresh_extrema so refreshed
    sketches match built ones."""
    c = F.col(col)
    if df.schema[col].dataType.simpleString() not in (
        "int", "bigint", "string", "binary"
    ):
        c = c.cast("string")
    return F.hll_sketch_agg(c, F.lit(hll_lg_k)).alias(f"hll_{col}")


def merge_state(
    state: DataFrame,
    keys: Sequence[str],
    cols: Sequence[str],
    distinct_cols: Sequence[str] = (),
) -> DataFrame:
    """Re-aggregate persisted state to the coarser grain ``keys``
    (a subset of the state's grain). Pure integer/extremum merges —
    exactly the total a single-pass aggregation of the raw rows would
    produce, for any merge tree; HLL sketches union (associative and
    idempotent). The input is state-sized, so this never touches the
    raw corpus."""
    aggs = []
    for col in cols:
        aggs.extend([
            F.sum(F.col(f"n_{col}")).alias(f"n_{col}"),
            F.sum(F.col(f"s1_{col}")).alias(f"s1_{col}"),
            F.sum(F.col(f"s2_{col}")).alias(f"s2_{col}"),
            F.min(F.col(f"mn_{col}")).alias(f"mn_{col}"),
            F.max(F.col(f"mx_{col}")).alias(f"mx_{col}"),
        ])
    for col in distinct_cols:
        aggs.append(
            F.hll_union_agg(F.col(f"hll_{col}")).alias(f"hll_{col}")
        )
    return state.groupBy(*keys).agg(*aggs)


def negate_state(
    state: DataFrame, cols: Sequence[str], keys: Sequence[str] | None = None
) -> DataFrame:
    """Retraction: negate a state's count and power sums so merging it
    SUBTRACTS those rows — exact, because the state is integers (negation
    and addition of DECIMAL(38,0) are exact for any magnitude the state
    can hold), so ``merge(state, negate(state(removed)))`` is
    bit-identical to a state built without the removed rows. Extrema are
    NULLed: min/max do not retract (removing the max invalidates it) and
    F.min/F.max skip NULLs, so a later merge silently keeps the STALE
    extremum — finalize(extrema=False) is the honest read-out after any
    retraction (asserted here only by documentation; the incremental
    arm's oracle would catch a stale-extremum read-out immediately).
    HLL sketches do not retract either and are not carried through.
    State columns of value columns NOT listed in ``cols`` are dropped —
    a later unionByName with the standing state then fails loudly
    instead of silently merging an un-negated column.

    Pass ``keys`` explicitly when any grouping key's NAME starts with a
    state prefix (``n_``/``s1_``/``s2_``/``mn_``/``mx_``/``hll_`` — e.g.
    a key named ``n_region``): without it the prefix inference would
    silently drop that key, so inference RAISES when it detects a
    prefix-matching column that is not a state column of a known value
    column (r11 ADVICE, low)."""
    prefixes = ("n_", "s1_", "s2_", "mn_", "mx_", "hll_")
    if keys is not None:
        missing = [k for k in keys if k not in state.columns]
        if missing:
            raise ValueError(
                f"negate_state: keys {missing} not in state columns "
                f"{state.columns}"
            )
        out = [F.col(c) for c in keys]
    else:
        # inference path: a column matching a state prefix must decompose
        # as <prefix><value column> where that value column has the full
        # n_/s1_/s2_ triple — otherwise it is almost certainly a grouping
        # key whose name collides with a prefix; dropping it silently
        # would produce a keyless state and a confusing downstream failure
        have = set(state.columns)
        for c in state.columns:
            p = next((p for p in prefixes if c.startswith(p)), None)
            if p is None:
                continue
            base = c[len(p):]
            if p == "hll_":
                # an hll state column is always binary (hll_sketch_agg);
                # anything else under that prefix is a mis-named key
                if state.schema[c].dataType.simpleString() == "binary":
                    continue
            elif {f"n_{base}", f"s1_{base}", f"s2_{base}"} <= have:
                continue
            raise ValueError(
                f"negate_state: column {c!r} matches state prefix "
                f"{p!r} but is not a recognizable state column — if it "
                "is a grouping key, pass keys=[...] explicitly"
            )
        out = [
            F.col(c) for c in state.columns
            if not any(c.startswith(p) for p in prefixes)
        ]
    for col in cols:
        out.extend([
            (-F.col(f"n_{col}")).alias(f"n_{col}"),
            (-F.col(f"s1_{col}")).alias(f"s1_{col}"),
            (-F.col(f"s2_{col}")).alias(f"s2_{col}"),
            F.lit(None).cast("double").alias(f"mn_{col}"),
            F.lit(None).cast("double").alias(f"mx_{col}"),
        ])
    return state.select(*out)


def distinct_estimate(state: DataFrame, col: str) -> DataFrame:
    """Read the approximate distinct count out of a state's HLL sketch
    column as ``nunique_<col>`` (long)."""
    return state.withColumn(
        f"nunique_{col}", F.hll_sketch_estimate(F.col(f"hll_{col}"))
    )


def hist_state(
    df: DataFrame,
    keys: Sequence[str],
    col: str,
    lo: float,
    hi: float,
    bins: int = 128,
) -> DataFrame:
    """Mergeable quantile state: a fixed equi-width histogram of ``col``
    over the declared domain [lo, hi] as ``hist_<col>`` (array<long> of
    ``bins`` counts; values outside the domain clamp to the edge bins,
    NULL/NaN rows are skipped). Integer bin vectors merge EXACTLY under
    element-wise addition — see :func:`merge_hist` — so any merge tree
    yields the state a direct build produces, and
    :func:`quantile_estimate` reads quantiles with error bounded by one
    bin width. Shape: each row computes its single bin index JVM-side,
    a grouped count collapses (keys, bin) with map-side partials, and a
    map_from_entries lookup densifies the sparse counts into the fixed
    array — two narrow aggregations, no UDF. A key group with NO clean
    rows (all NULL/NaN) emits no state row at all, matching how such a
    group contributes nothing mergeable."""
    if not lo < hi:
        raise ValueError(
            f"hist_state requires lo < hi, got lo={lo!r} hi={hi!r}"
        )
    if bins < 1:
        raise ValueError(f"hist_state requires bins >= 1, got {bins!r}")
    b = F.col("__bin")
    # clamp as LONG BEFORE narrowing to int: a far-out-of-domain value
    # (or +inf) floors past 2^31 and an early int cast would wrap it
    # into an arbitrary low bin instead of the top edge bin the clamp
    # contract promises (self-review r10)
    idx = F.floor(
        (F.col(col).cast("double") - F.lit(lo))
        / F.lit((hi - lo) / bins)
    )
    idx = F.least(
        F.greatest(idx, F.lit(0).cast("long")), F.lit(bins - 1).cast("long")
    ).cast("int")
    clean = df.where(
        F.col(col).isNotNull() & ~F.isnan(F.col(col).cast("double"))
    ).withColumn("__bin", idx)
    counts = clean.groupBy(*keys, "__bin").agg(F.count("*").alias("__c"))
    # densify: map_from_entries of (bin -> count), then read 0..bins-1
    dense = counts.groupBy(*keys).agg(
        F.map_from_entries(F.collect_list(F.struct(b, F.col("__c")))).alias(
            "__m"
        )
    )
    arr = F.transform(
        F.sequence(F.lit(0), F.lit(bins - 1)),
        lambda i: F.coalesce(
            F.element_at(F.col("__m"), i), F.lit(0).cast("long")
        ),
    )
    return dense.select(*keys, arr.alias(f"hist_{col}"))


def negate_hist(state: DataFrame, col: str) -> DataFrame:
    """Retraction for histogram state: negate every bin count — exact
    integer vectors, so ``merge_hist(state ∪ negate_hist(state(removed)))``
    is bit-identical to a histogram built without the removed rows. The
    quantile read-out needs no caveat (unlike extrema): the retracted
    histogram IS the histogram of the surviving rows."""
    h = f"hist_{col}"
    return state.withColumn(h, F.transform(F.col(h), lambda x: -x))


def merge_hist(state: DataFrame, keys: Sequence[str], col: str) -> DataFrame:
    """Merge histogram states to a coarser grain: element-wise long
    addition via ``aggregate`` + ``zip_with`` — exact, associative,
    state-sized input."""
    h = f"hist_{col}"

    def _zadd(a, b):
        return F.zip_with(a, b, lambda x, y: x + y)

    return state.groupBy(*keys).agg(
        F.aggregate(
            F.collect_list(F.col(h)),
            F.expr("cast(array() as array<bigint>)"),
            lambda acc, x: F.when(F.size(acc) == 0, x).otherwise(
                _zadd(acc, x)
            ),
        ).alias(h)
    )


def quantile_estimate(
    state: DataFrame, col: str, qs: Sequence[float], lo: float, hi: float
) -> DataFrame:
    """Approximate quantiles from the histogram state: for each q, the
    left edge of the first bin whose cumulative count reaches q·n —
    error <= one bin width by construction (asserted in tests). Emits
    ``q_<col>`` as array<double> aligned with ``qs``."""
    h = F.col(f"hist_{col}")
    n = F.aggregate(h, F.lit(0).cast("bigint"), lambda a, x: a + x)
    bins = F.size(h)
    width = (F.lit(hi) - F.lit(lo)) / bins.cast("double")
    outs = []
    for q in qs:
        target = (n.cast("double") * F.lit(float(q)))
        # single O(bins) fold: carry (next bin index, running sum,
        # first index whose prefix sum reached the target) — a
        # per-index slice+re-sum would be O(bins²) per row per q
        # (self-review r10)
        acc0 = F.struct(
            F.lit(0).alias("i"),
            F.lit(0).cast("bigint").alias("cum"),
            F.lit(-1).alias("found"),
        )
        fold = F.aggregate(
            h,
            acc0,
            lambda a, x: F.struct(
                (a.getField("i") + 1).alias("i"),
                (a.getField("cum") + x).alias("cum"),
                F.when(a.getField("found") >= 0, a.getField("found"))
                .when(
                    (a.getField("cum") + x).cast("double") >= target,
                    a.getField("i"),
                )
                .otherwise(F.lit(-1))
                .alias("found"),
            ),
        )
        first = fold.getField("found")
        outs.append(
            (F.lit(lo) + first.cast("double") * width).alias(
                f"q{str(q).replace('.', '_')}_{col}"
            )
        )
    return state.select(*state.columns, *outs)


def finalize(
    state: DataFrame,
    keys: Sequence[str],
    cols: dict[str, tuple[int, int]],
    ddof: int = 1,
    extrema: bool = True,
) -> DataFrame:
    """Scalar statistics from state — the same closed forms as det.dsum/
    dmean/dvar/dstd evaluated on the (exact) merged power sums, so the
    doubles are bit-identical to a direct deterministic aggregation of
    the raw rows: sum = S1/10^s, mean = sum/n, var = (S2/10^s2 −
    sum²/n)/(n−ddof), std = sqrt(var). ``extrema=False`` omits min/max —
    required after any :func:`negate_state` retraction merge, where the
    merged extrema may be stale."""
    out: list = [F.col(k) for k in keys]
    for col, (scale, sq_scale) in cols.items():
        n = F.col(f"n_{col}")
        nd = n.cast("double")
        s1 = F.col(f"s1_{col}").cast("double") / F.lit(float(10**scale))
        s2 = F.col(f"s2_{col}").cast("double") / F.lit(float(10**sq_scale))
        var = (s2 - s1 * s1 / nd) / (nd - F.lit(float(ddof)))
        out.extend([
            n.alias(f"count_{col}"),
            s1.alias(f"sum_{col}"),
            (s1 / nd).alias(f"mean_{col}"),
        ])
        if extrema:
            out.extend([
                F.col(f"mn_{col}").alias(f"min_{col}"),
                F.col(f"mx_{col}").alias(f"max_{col}"),
            ])
        out.extend([
            var.alias(f"var_{col}"),
            F.sqrt(var).alias(f"std_{col}"),
        ])
    return state.select(*out)
