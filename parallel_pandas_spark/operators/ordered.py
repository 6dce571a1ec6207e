"""Ordered scans: cumulatives, rank, pct_change (SURVEY.md §2.4, ops #18-#20).

Every operator here takes explicit ordering column(s) — the engine's
replacement for the pandas implicit row index (SURVEY.md §1.4). The
reference parallelizes axis=0 scans *across columns* so each chunk needs no
carry (/root/reference/parallel_pandas/parallel_dataframe.py:864-916);
Spark's ``WindowExec`` computes all columns in one ordered pass instead and
handles partition-boundary frames itself.

Scale note: an un-partitioned ordered scan is a single-task sort — always
prefer ``partition_by`` (per-group scans parallelize perfectly). Global
scans are supported for parity but documented as the driver-bottleneck
shape, exactly like a global ``pandas.cumsum`` is single-core.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, WindowSpec
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .masks import is_floating, nan_safe_col


def _window(order_by: Sequence[str], partition_by: Sequence[str] | None) -> WindowSpec:
    w = Window.partitionBy(*partition_by) if partition_by else Window.partitionBy()
    return w.orderBy(*[F.col(c) for c in order_by])


def _cum_spec(order_by, partition_by):
    return _window(order_by, partition_by).rowsBetween(Window.unboundedPreceding, Window.currentRow)


def _cum(df, cols, order_by, partition_by, suffix, agg):
    # pandas cumulative skipna semantics: a missing row (NULL or TRUE NaN)
    # outputs NaN/NULL but does NOT enter the running state — later rows
    # continue unaffected. Spark's window aggregates skip NULLs natively;
    # NaN must be masked out of the input or one NaN poisons every later
    # accumulation (and NaN is exactly what parquet float columns carry).
    w = _cum_spec(order_by, partition_by)
    out = df
    for c in cols:
        col = F.col(c)
        floating = is_floating(df, c)
        src = nan_safe_col(col) if floating else col
        e = F.when(col.isNotNull(), agg(src).over(w))
        if floating:
            e = F.when(F.isnan(col), col).otherwise(e)  # NaN position stays NaN
        out = out.withColumn(f"{c}{suffix}", e)
    return out


def cumsum(df, cols, order_by, partition_by=None, suffix="_cumsum"):
    return _cum(df, cols, order_by, partition_by, suffix, F.sum)


def cummax(df, cols, order_by, partition_by=None, suffix="_cummax"):
    return _cum(df, cols, order_by, partition_by, suffix, F.max)


def cummin(df, cols, order_by, partition_by=None, suffix="_cummin"):
    return _cum(df, cols, order_by, partition_by, suffix, F.min)


def cumprod(df, cols, order_by, partition_by=None, suffix="_cumprod"):
    """Running product — no PRODUCT window primitive is needed:
    ``product`` is an aggregate in Spark >= 3.2 and aggregates compose with
    window frames, staying JVM-side (reference dispatches numpy ufuncs,
    parallel_dataframe.py:871-880)."""
    return _cum(df, cols, order_by, partition_by, suffix, F.product)


def rank(
    df: DataFrame,
    col: str,
    method: str = "average",
    ascending: bool = True,
    pct: bool = False,
    partition_by: Sequence[str] | None = None,
    out_col: str | None = None,
    tie_break: Sequence[str] | None = None,
    na_option: str = "keep",
) -> DataFrame:
    """pandas ``rank`` with all five methods (reference p_rank,
    parallel_dataframe.py:571-595).

    average -> avg(row_number) over equal values; min -> rank;
    max -> rank + count(equal) - 1; first -> row_number; dense -> dense_rank.
    ``pct`` divides by the count of ranked rows in the partition.

    ``na_option`` (pandas): 'keep' -> NULLs get NULL rank; 'top' -> NULLs
    are ranked first (lowest ranks); 'bottom' -> NULLs are ranked last.
    For 'top'/'bottom' the NULLs participate in ranking as one tied group
    (window ordering and partitioning both treat NULLs as peers, in Spark
    and in ANSI SQL alike), and the ``pct`` denominator includes them.

    EVERY na_option uses the same nulls-LAST window ordering, so mixed
    variants over one column share a single partition sort. 'top' is the
    exact rank-shift identity on the nulls-last ranks (k = non-null count,
    nn = null count per partition): NULL rows map v → v − k (their tied
    block slides from the tail to ranks 1..nn) and non-NULL rows map
    v → v + nn; dense is the special case (NULLs → 1, others +1 iff any
    NULL exists). No nulls-first re-sort is ever planned.

    ``tie_break``: extra ordering columns resolving equal values for
    ``method='first'`` — pandas uses appearance order, which an unordered
    engine replaces with an explicit key (SURVEY.md §1.4); without it,
    'first' ranks of tied values are nondeterministic.
    """
    out_col = out_col or f"{col}_rank"
    if na_option not in ("keep", "top", "bottom"):
        raise ValueError(f"na_option must be keep/top/bottom, got {na_option!r}")
    # pandas treats TRUE NaN as NA in rank (na_option applies to it);
    # Spark sorts NaN above every double as a VALUE — mask to NULL first
    temps = []
    if is_floating(df, col):
        df = df.withColumn("__rk_src", nan_safe_col(F.col(col)))
        col = "__rk_src"
        temps = ["__rk_src"]
    vorder = F.col(col).asc_nulls_last() if ascending else F.col(col).desc_nulls_last()
    # rank/dense_rank MUST order by value alone (ties share a rank); only
    # the row_number paths ('first', and the rn feeding 'average') take the
    # appearance tiebreak.
    base = Window.partitionBy(*(partition_by or [])).orderBy(vorder)
    first_w = Window.partitionBy(*(partition_by or [])).orderBy(
        vorder, *[F.col(t) for t in (tie_break or [])]
    )
    value_part = Window.partitionBy(*(partition_by or []), F.col(col))
    whole = Window.partitionBy(*(partition_by or []))

    rn = F.row_number().over(first_w)
    if method == "average":
        expr = F.avg(rn).over(value_part)
    elif method == "min":
        expr = F.rank().over(base).cast("double")
    elif method == "max":
        expr = (F.rank().over(base) + F.count("*").over(value_part) - 1).cast("double")
    elif method == "first":
        expr = rn.cast("double")
    elif method == "dense":
        expr = F.dense_rank().over(base).cast("double")
    else:
        raise ValueError(f"unknown rank method {method!r}")
    if na_option == "keep":
        expr = F.when(F.col(col).isNotNull(), expr)
    elif na_option == "top":
        k = F.count(col).over(whole).cast("double")
        nn = F.count(F.lit(1)).over(whole).cast("double") - k
        isnull = F.col(col).isNull()
        if method == "dense":
            expr = F.when(isnull, F.lit(1.0)).otherwise(expr + F.least(nn, F.lit(1.0)))
        else:
            expr = F.when(isnull, expr - k).otherwise(expr + nn)
    # 'bottom': the nulls-last ranks are already the bottom ranks
    if pct:
        if method == "dense":
            # pandas divides dense ranks by the number of DISTINCT ranked
            # values (incl. the NULL group under top/bottom) — which is
            # exactly the partition's maximum dense rank, never the row
            # count. Two window layers (max over the dense column), so
            # stage through a temp column.
            tmp = f"__{out_col}_dense"
            out = df.withColumn(tmp, expr)
            res = out.withColumn(
                out_col, F.col(tmp) / F.max(tmp).over(whole)
            ).drop(tmp)
            return res.drop(*temps)
        denom = F.count(col) if na_option == "keep" else F.count(F.lit(1))
        expr = expr / denom.over(whole)
    return df.withColumn(out_col, expr).drop(*temps)


def scan_multi(
    df: DataFrame,
    specs: Sequence[dict],
    order_by: Sequence[str],
    partition_by: Sequence[str] | None = None,
) -> DataFrame:
    """Several ordered-scan operators over ONE (partition, order)
    pipeline in the minimum number of WindowExec passes.

    ``specs``: [{'op': 'cumsum'|'cummax'|'cummin'|'shift'|'diff'|
    'pct_change', 'col': c, 'out': name, 'periods': p}, ...] — same
    per-entry semantics as the standalone kernels (pandas NaN-skip
    cumulatives, lead for negative periods, IEEE pct_change ratios).

    Why it exists (scale, SCALE.md window-pass discipline): the
    standalone kernels each wrap their window aggregate in a NaN/NULL
    guard, and that guard Project between Window nodes blocks
    CollapseWindow — a chain of k operators runs k buffered passes per
    partition even on one sort. Here phase 1 computes every RAW window
    primitive (cum aggregates, lags/leads — shared: shift/diff/
    pct_change over the same (col, periods) reuse ONE lag) in a single
    select = ONE Window node by construction; phase 2 applies the
    guards and ratios as a plain projection. k operators, 1 pass.
    """
    w = _cum_spec(order_by, partition_by)
    lagw = _window(order_by, partition_by)
    raw: dict[str, F.Column] = {}
    aggs = {"cumsum": F.sum, "cummax": F.max, "cummin": F.min, "cumprod": F.product}

    def _masked(c: str) -> F.Column:
        col = F.col(c)
        if is_floating(df, c):
            return nan_safe_col(col)
        return col

    for s in specs:
        op, c = s["op"], s["col"]
        p = s.get("periods", 1)
        if op in aggs:
            raw.setdefault(f"__sc_{op}_{c}", aggs[op](_masked(c)).over(w))
        elif op in ("shift", "diff", "pct_change"):
            key = f"__sc_lag_{c}_{p}"
            raw.setdefault(key, F.lag(c, p).over(lagw) if p >= 0
                           else F.lead(c, -p).over(lagw))
        elif op in ("ffill", "bfill"):
            # raw IS the fill: for a valid row last/first-IGNORE-NULLS
            # over the frame returns the row's own value, for a missing
            # row the nearest valid within limit — no guard layer needed
            lim = s.get("limit")
            if op == "ffill":
                wf = lagw.rowsBetween(-lim if lim else Window.unboundedPreceding, 0)
                raw[f"__sc_out_{s['out']}"] = F.last(
                    _masked(c), ignorenulls=True
                ).over(wf)
            else:
                wf = lagw.rowsBetween(0, lim if lim else Window.unboundedFollowing)
                raw[f"__sc_out_{s['out']}"] = F.first(
                    _masked(c), ignorenulls=True
                ).over(wf)
        else:
            raise ValueError(f"unknown scan op {op!r}")
    out = df.select("*", *[e.alias(n) for n, e in raw.items()])
    final = []
    for s in specs:
        op, c, name = s["op"], s["col"], s["out"]
        p = s.get("periods", 1)
        col = F.col(c)
        floating = isinstance(df.schema[c].dataType, (T.DoubleType, T.FloatType))
        if op in aggs:
            e = F.when(col.isNotNull(), F.col(f"__sc_{op}_{c}"))
            if floating:
                e = F.when(F.isnan(col), col).otherwise(e)
        elif op in ("ffill", "bfill"):
            e = F.col(f"__sc_out_{name}")
        else:
            lag = F.col(f"__sc_lag_{c}_{p}")
            if op == "shift":
                e = lag
            elif op == "diff":
                e = col - lag
            else:
                e = _ieee_ratio_m1(col.cast("double"), lag.cast("double"))
        final.append(e.alias(name))
    return out.select(*df.columns, *final)


def rank_multi(
    df: DataFrame,
    col: str,
    specs: Sequence[dict],
    ascending: bool = True,
    partition_by: Sequence[str] | None = None,
    tie_break: Sequence[str] | None = None,
    bucketed: "bool | str" = False,
) -> DataFrame:
    """Several pandas ``rank`` variants of ONE column in one fused plan.

    ``specs``: [{'method': ..., 'out_col': ..., 'pct': bool,
    'na_option': ...}, ...] — same semantics per entry as :func:`rank`.

    Why it exists (scale): independent :func:`rank` calls each mask NaN
    into a FRESH temp attribute, so their windows order by different
    attributes and every call re-sorts (measured r6: 8 variants = 12
    Sorts). Here all variants share one mask, one
    (keys, value-nulls-last, tie_break) sort, and the value/partition
    groupings that sort already satisfies — the whole family plans ONE
    Exchange + ONE Sort, and the derived methods (average/max/pct and
    the na_option='top' shift identities) are arithmetic on row_number /
    per-value-group aggregates, not extra orderings.

    ``bucketed=True`` (r16, guide §2.5): the one-sort plan serializes
    into ``n_groups`` tasks — the canonical skew killer when the key has
    few values (or none: a GLOBAL rank is ONE task). The bucketed path
    splits every key group into value-range buckets (the
    :func:`global_avg_rank` technique, generalized to all five methods ×
    na_option × pct): a per-(keys, bucket) parallel sort yields local
    row_number/rank/dense/cume, a metadata-sized per-bucket count frame
    rolls into offsets (broadcast back), and every output derives from
    offset + local — THE SAME integers the fused sort produces, through
    THE SAME derivation arithmetic (shared ``_apply_rank_specs``), so
    outputs are bit-identical under any bucket boundaries. Numeric value
    columns only (bucket boundaries come from an approxQuantile sketch);
    non-numeric input falls back to the fused single-sort path.
    """
    keys = list(partition_by or [])
    src = col
    temps = []
    if is_floating(df, col):
        df = df.withColumn("__rkm_src", nan_safe_col(F.col(col)))
        src = "__rkm_src"
        temps = ["__rkm_src"]
    if bucketed and isinstance(df.schema[src].dataType, T.NumericType):
        return _rank_multi_bucketed(
            df, src, specs, ascending, keys, tie_break, temps,
            skip_probe=(bucketed == "value"),
        )
    vorder = F.col(src).asc_nulls_last() if ascending else F.col(src).desc_nulls_last()
    first_w = Window.partitionBy(*keys).orderBy(
        vorder, *[F.col(t) for t in (tie_break or [])]
    )
    base = Window.partitionBy(*keys).orderBy(vorder)
    whole = Window.partitionBy(*keys)
    # Every window requirement here is a PREFIX of the one
    # (keys, value, tie_break) sort: rank/dense order by (keys, value);
    # the per-key aggregates order by (keys) alone. Peer-group (min/max/
    # avg-of-ties) aggregates deliberately avoid Window.partitionBy(keys,
    # value) — its required child ordering is value-NULLS-FIRST, which
    # clashes with the rank family's nulls-last sort and forces a re-sort
    # (measured: 2 extra Sorts). Instead: min-of-peers IS rank();
    # max-of-peers is count(*) over the RANGE frame up to the current
    # peer group (ties are frame peers under value ordering); average of
    # a consecutive integer run is (min+max)/2.
    cume = F.count(F.lit(1)).over(
        base.rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # row_number FIRST: its sort is the one physical Sort in the plan
    df = df.withColumn("__rkm_rn", F.row_number().over(first_w))
    temps.append("__rkm_rn")
    rn = F.col("__rkm_rn")
    prim = {
        "rn": rn,
        "rank": F.rank().over(base),
        "cume": cume,
        "dense": F.dense_rank().over(base),
        "k": F.count(src).over(whole),
        "nrows": F.count(F.lit(1)).over(whole),
        "dense_max": lambda na_option, tmp: F.max(tmp).over(whole),
    }
    return _apply_rank_specs(df, specs, src, tie_break, prim, temps)


def rank_multi_families(
    df: DataFrame,
    families: Sequence[dict],
    ascending: bool = True,
    partition_by: Sequence[str] | None = None,
    tie_break: Sequence[str] | None = None,
) -> DataFrame:
    """INTERNAL multi-family value-aggregate rank (r17, r16 verdict #4):
    several ``rank_multi(bucketed="value")`` calls over DIFFERENT source
    columns, fused onto one scan.

    Chained ``rank_multi`` calls re-derive every earlier family's
    broadcast join inside each later family's value aggregation — the
    later count subtree hangs below the earlier join, so the input is
    scanned (and the join replayed) once per family. Here every
    family's (keys, value) count frame comes out of ONE grouping-sets
    aggregate over the base scan (guide §2.4: two aggregations keyed
    over the same scan share one pass), and the metadata-sized offset
    tables broadcast-join above it.

    Outputs are bit-identical to the chained calls by construction:
    each family's offsets are THE SAME integers (same per-(keys, value)
    counts, same running-sum windows), fed through the same
    ``_apply_rank_specs`` arithmetic. ``families`` is
    ``[{"col": ..., "specs": [...]}]`` with shared
    ascending/partition_by/tie_break; the caller asserts low value
    cardinality per family (the ``bucketed="value"`` contract)."""
    keys = list(partition_by or [])
    work = df
    fam: list[tuple[str, Sequence[dict]]] = []
    temps: list[str] = []
    for i, f in enumerate(families):
        col, src = f["col"], f["col"]
        if is_floating(work, col):
            src = f"__rkmf_src{i}"
            work = work.withColumn(src, nan_safe_col(F.col(col)))
            temps.append(src)
        fam.append((src, f["specs"]))
    out_cols = [s["out_col"] for _, specs in fam for s in specs]
    want = list(df.columns) + out_cols

    def _nullsafe_bjoin(left, offs, left_on, offs_on, sfx):
        jcols = [f"__rkmf_j{sfx}_{i}" for i in range(len(offs_on))]
        offs = offs.select(
            *[F.col(k).alias(a) for k, a in zip(offs_on, jcols)],
            *[x for x in offs.columns if x not in offs_on],
        )
        cond = None
        for k, a in zip(left_on, jcols):
            e = F.col(k).eqNullSafe(F.col(a))
            cond = e if cond is None else (cond & e)
        return left.join(F.broadcast(offs), cond)

    srcs = [src for src, _ in fam]
    # lazily checkpointed: each family's offset table filters this frame,
    # and per-branch column pruning makes the two aggregate subtrees
    # non-canonical — without materialization Catalyst re-runs the scan +
    # grouping-sets pass once per family (measured: 2 Expand / 2 scans),
    # which is exactly the duplication this function exists to remove.
    # The frame is metadata-sized (Σ per-family value-group counts).
    gv_all = work.groupingSets(
        [[*keys, s] for s in srcs], *[F.col(c) for c in (*keys, *srcs)]
    ).agg(
        F.count(F.lit(1)).alias("__rkmf_cnt"),
        *[F.grouping(s).alias(f"__rkmf_g{i}") for i, s in enumerate(srcs)],
    ).localCheckpoint(eager=False)

    data = work
    plans = []
    for i, (src, specs) in enumerate(fam):
        cond = F.lit(True)
        for j in range(len(srcs)):
            cond = cond & (F.col(f"__rkmf_g{j}") == (0 if j == i else 1))
        bv, cnt = f"__rkmf_bv{i}", f"__rkmf_cnt{i}"
        gv = gv_all.where(cond).select(
            *keys,
            F.col(src).alias(bv),
            F.col("__rkmf_cnt").alias(cnt),
        )
        nn_flag = F.col(bv).isNotNull()
        bvorder = (
            F.col(bv).asc_nulls_last() if ascending
            else F.col(bv).desc_nulls_last()
        )
        woff = Window.partitionBy(*keys).orderBy(bvorder).rowsBetween(
            Window.unboundedPreceding, -1
        )
        wkey = Window.partitionBy(*keys)
        off, doff = f"__rkmf_off{i}", f"__rkmf_doff{i}"
        kc, nc, ddc = f"__rkmf_k{i}", f"__rkmf_n{i}", f"__rkmf_dd{i}"
        offs = gv.select(
            *keys,
            bv,
            cnt,
            F.coalesce(F.sum(cnt).over(woff), F.lit(0)).alias(off),
            F.coalesce(F.sum(nn_flag.cast("long")).over(woff), F.lit(0)).alias(doff),
            F.sum(F.when(nn_flag, F.col(cnt)).otherwise(F.lit(0)))
            .over(wkey)
            .alias(kc),
            F.sum(cnt).over(wkey).alias(nc),
            F.sum(nn_flag.cast("long")).over(wkey).alias(ddc),
        )
        data = _nullsafe_bjoin(data, offs, [*keys, src], [*keys, bv], sfx=i)
        prim = {
            "rank": F.col(off) + F.lit(1),
            "cume": F.col(off) + F.col(cnt),
            "dense": F.col(doff) + F.lit(1),
            "k": F.col(kc),
            "nrows": F.col(nc),
            "dense_max": _dense_max_closed(F.col(kc), F.col(nc), F.col(ddc)),
        }
        plans.append((src, specs, prim))
    for i, (src, specs, prim) in enumerate(plans):
        if any(s.get("method") == "first" for s in specs):
            vw = Window.partitionBy(*keys, F.col(src)).orderBy(
                *[F.col(t) for t in (tie_break or [])]
            )
            lrn = f"__rkmf_lrn{i}"
            data = data.withColumn(lrn, F.row_number().over(vw))
            prim["rn"] = F.col(f"__rkmf_off{i}") + F.col(lrn)
        data = _apply_rank_specs(data, specs, src, tie_break, prim, [])
    return data.select(*want)


def _apply_rank_specs(out, specs, src, tie_break, prim, temps):
    """Derive every spec's output column from the rank PRIMITIVES — the
    fused single-sort path and the bucketed two-phase path both feed this
    same arithmetic, so their outputs are bit-identical by construction.
    ``prim``: rn (row_number incl. tie_break), rank (min-of-peers), cume
    (max-of-peers), dense, k (non-null count per key group), nrows (row
    count per key group), dense_max(na_option, tmp_col) (the pct-dense
    denominator: max of the adjusted dense rank over the key group)."""
    for spec in specs:
        method = spec.get("method", "average")
        na_option = spec.get("na_option", "keep")
        pct = spec.get("pct", False)
        out_col = spec["out_col"]
        if method == "average":
            expr = (prim["rank"] + prim["cume"]) / F.lit(2.0)
        elif method == "min":
            expr = prim["rank"].cast("double")
        elif method == "max":
            expr = prim["cume"].cast("double")
        elif method == "first":
            if not tie_break:
                raise ValueError("method='first' needs tie_break for determinism")
            expr = prim["rn"].cast("double")
        elif method == "dense":
            expr = prim["dense"].cast("double")
        else:
            raise ValueError(f"unknown rank method {method!r}")
        if na_option == "keep":
            expr = F.when(F.col(src).isNotNull(), expr)
        elif na_option == "top":
            k = prim["k"].cast("double")
            nn = prim["nrows"].cast("double") - k
            isnull = F.col(src).isNull()
            if method == "dense":
                expr = F.when(isnull, F.lit(1.0)).otherwise(
                    expr + F.least(nn, F.lit(1.0))
                )
            else:
                expr = F.when(isnull, expr - k).otherwise(expr + nn)
        elif na_option != "bottom":
            raise ValueError(f"na_option must be keep/top/bottom, got {na_option!r}")
        if pct:
            if method == "dense":
                tmp = f"__{out_col}_dense"
                out = out.withColumn(tmp, expr)
                out = out.withColumn(
                    out_col, F.col(tmp) / prim["dense_max"](na_option, tmp)
                ).drop(tmp)
                continue
            denom = prim["k"] if na_option == "keep" else prim["nrows"]
            expr = expr / denom
        out = out.withColumn(out_col, expr)
    return out.drop(*temps)


def _dense_max_closed(k_l, n_l, dd):
    """pct-dense denominator — max over the key group of the na-adjusted
    dense rank — in closed form from the per-key aggregates (k non-null
    rows, n rows, dd distinct non-null values). The guards reproduce the
    fused path's NULL-on-empty window aggregates."""

    def dense_max(na_option, tmp):
        nnd = n_l.cast("double") - k_l.cast("double")
        ddd = dd.cast("double")
        if na_option == "keep":
            return F.when(k_l > 0, ddd)
        if na_option == "top":
            return F.when(k_l > 0, ddd + F.least(nnd, F.lit(1.0))).when(
                n_l > k_l, F.lit(1.0)
            )
        # bottom: nulls extend the dense chain by one peer group
        return F.when(n_l > k_l, ddd + F.lit(1.0)).when(k_l > 0, ddd)

    return dense_max


def _rank_multi_bucketed(
    df: DataFrame,
    src: str,
    specs: Sequence[dict],
    ascending: bool,
    keys: list,
    tie_break: Sequence[str] | None,
    temps: list,
    max_value_groups: int = 200_000,
    skip_probe: bool = False,
) -> DataFrame:
    """Two-phase parallel body of :func:`rank_multi` (bucketed=True) —
    guide §2.5/§8: decide with small rows, move big rows at most once.

    A cardinality probe (one HLL job; it only picks the ALGORITHM — both
    branches produce identical values) selects:

    **Value-aggregate path** (distinct values ≤ ``max_value_groups``):
    rank over repeated values needs NO data sort at all. A map-side
    per-(keys, value) count reduces the data to a metadata-sized frame
    whose running sums ARE the rank table — rank = rows before the value
    group + 1, max-of-peers = rows through it, dense = distinct values
    before + 1, per-key totals ride along — broadcast back onto the
    scan. Only ``method='first'`` touches row order, and its
    row_number-within-value-peers window hash-partitions by
    (keys, value): parallel regardless of key cardinality.

    **Quantile-bucket path** (near-unique values): the
    :func:`global_avg_rank` technique generalized to the full method ×
    na_option × pct surface — value-range buckets from an approxQuantile
    sketch (a pure function of the value, so ties never span buckets and
    the result is independent of the boundaries), one parallel sort per
    (keys, bucket), per-bucket counts reduced map-side and rolled into
    broadcast offsets; each global primitive = offset + local window.

    Both paths feed the SAME spec-derivation arithmetic
    (``_apply_rank_specs``) with integers equal to the fused sort's, so
    outputs are bit-identical. Offset joins are NULL-SAFE on the keys —
    window partitioning groups NULL keys, so the join must too."""
    c = F.col(src)
    methods = {s.get("method", "average") for s in specs}
    out_cols = [s["out_col"] for s in specs]
    want = [x for x in df.columns if x not in temps] + out_cols

    def _nullsafe_bjoin(left, offs, left_on, offs_on):
        """left ⋈ broadcast(offs) with NULL groups kept; returns the
        joined frame and the aliased right-side key temps to drop."""
        jcols = [f"__rkm_j{i}" for i in range(len(offs_on))]
        offs = offs.select(
            *[F.col(k).alias(a) for k, a in zip(offs_on, jcols)],
            *[x for x in offs.columns if x not in offs_on],
        )
        cond = None
        for k, a in zip(left_on, jcols):
            e = F.col(k).eqNullSafe(F.col(a))
            cond = e if cond is None else (cond & e)
        return left.join(F.broadcast(offs), cond), jcols

    # bucketed="value" asserts low value cardinality (caller knowledge)
    # and skips the probe job — the algorithm choice is the only thing
    # the probe decides, values are identical on every branch
    if skip_probe:
        n_values = 0
    else:
        n_values = df.select(F.approx_count_distinct(src).alias("n")).first()["n"]
    if n_values <= max_value_groups:
        gv = df.groupBy(*keys, c.alias("__rkm_bv")).agg(
            F.count(F.lit(1)).alias("__rkm_cnt")
        )
        nn_flag = F.col("__rkm_bv").isNotNull()
        bvorder = (
            F.col("__rkm_bv").asc_nulls_last()
            if ascending
            else F.col("__rkm_bv").desc_nulls_last()
        )
        woff = Window.partitionBy(*keys).orderBy(bvorder).rowsBetween(
            Window.unboundedPreceding, -1
        )
        wkey = Window.partitionBy(*keys)
        offs = gv.select(
            *keys,
            "__rkm_bv",
            "__rkm_cnt",
            F.coalesce(F.sum("__rkm_cnt").over(woff), F.lit(0)).alias("__rkm_off"),
            F.coalesce(F.sum(nn_flag.cast("long")).over(woff), F.lit(0)).alias(
                "__rkm_doff"
            ),
            F.sum(F.when(nn_flag, F.col("__rkm_cnt")).otherwise(F.lit(0)))
            .over(wkey)
            .alias("__rkm_k"),
            F.sum("__rkm_cnt").over(wkey).alias("__rkm_n"),
            F.sum(nn_flag.cast("long")).over(wkey).alias("__rkm_dd"),
        )
        data, jtemps = _nullsafe_bjoin(df, offs, [*keys, src], [*keys, "__rkm_bv"])
        vtemps = ["__rkm_cnt", "__rkm_off", "__rkm_doff", "__rkm_k", "__rkm_n",
                  "__rkm_dd", *jtemps]
        prim = {
            "rank": F.col("__rkm_off") + F.lit(1),
            "cume": F.col("__rkm_off") + F.col("__rkm_cnt"),
            "dense": F.col("__rkm_doff") + F.lit(1),
            "k": F.col("__rkm_k"),
            "nrows": F.col("__rkm_n"),
            "dense_max": _dense_max_closed(
                F.col("__rkm_k"), F.col("__rkm_n"), F.col("__rkm_dd")
            ),
        }
        if "first" in methods:
            vw = Window.partitionBy(*keys, c).orderBy(
                *[F.col(t) for t in (tie_break or [])]
            )
            data = data.withColumn("__rkm_lrn", F.row_number().over(vw))
            vtemps.append("__rkm_lrn")
            prim["rn"] = F.col("__rkm_off") + F.col("__rkm_lrn")
        out = _apply_rank_specs(data, specs, src, tie_break, prim, [*temps, *vtemps])
        return out.select(*want)

    spark = df.sparkSession
    p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    probs = [i / p for i in range(1, p)]
    bounds = sorted(
        {b for b in df.stat.approxQuantile(src, probs, 0.001) if b is not None}
    )
    if not ascending:
        bounds = bounds[::-1]
    bexpr = F.lit(0)
    for b in bounds:
        bexpr = bexpr + (c > F.lit(b) if ascending else c < F.lit(b)).cast("int")
    nullb = len(bounds) + 1  # nulls sort LAST in every na_option's base order
    dfb = df.withColumn(
        "__rkm_b", F.when(c.isNotNull(), bexpr).otherwise(F.lit(nullb))
    )

    # per-bucket counts BEFORE the data shuffle: a map-side partial
    # aggregation over the scan reduces to ≤ keys×(p+1) rows; broadcast
    # the rolled offsets onto the scan so the heavy rows see exactly ONE
    # exchange — the (keys, bucket) shuffle the parallel sort needs.
    g = dfb.groupBy(*keys, "__rkm_b").agg(
        F.count(F.lit(1)).alias("__rkm_cnt"),
        F.count(src).alias("__rkm_cnn"),
        F.countDistinct(src).alias("__rkm_dct"),
    )
    woff = Window.partitionBy(*keys).orderBy("__rkm_b").rowsBetween(
        Window.unboundedPreceding, -1
    )
    wkey = Window.partitionBy(*keys)
    offs = g.select(
        *keys,
        "__rkm_b",
        F.coalesce(F.sum("__rkm_cnt").over(woff), F.lit(0)).alias("__rkm_off"),
        F.coalesce(F.sum("__rkm_dct").over(woff), F.lit(0)).alias("__rkm_doff"),
        F.sum("__rkm_cnn").over(wkey).alias("__rkm_k"),
        F.sum("__rkm_cnt").over(wkey).alias("__rkm_n"),
        F.sum("__rkm_dct").over(wkey).alias("__rkm_dd"),
    )
    data, jtemps = _nullsafe_bjoin(
        dfb, offs, [*keys, "__rkm_b"], [*keys, "__rkm_b"]
    )
    rep = data.repartition(*[F.col(k) for k in keys], F.col("__rkm_b"))

    vorder = c.asc_nulls_last() if ascending else c.desc_nulls_last()
    lw_first = Window.partitionBy(*keys, "__rkm_b").orderBy(
        vorder, *[F.col(t) for t in (tie_break or [])]
    )
    lw_base = Window.partitionBy(*keys, "__rkm_b").orderBy(vorder)
    joined = (
        rep.withColumn("__rkm_lrn", F.row_number().over(lw_first))
        .withColumn("__rkm_lrank", F.rank().over(lw_base))
        .withColumn("__rkm_ldense", F.dense_rank().over(lw_base))
        .withColumn(
            "__rkm_lcume",
            F.count(F.lit(1)).over(
                lw_base.rangeBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    prim = {
        "rn": F.col("__rkm_off") + F.col("__rkm_lrn"),
        "rank": F.col("__rkm_off") + F.col("__rkm_lrank"),
        "cume": F.col("__rkm_off") + F.col("__rkm_lcume"),
        "dense": F.col("__rkm_doff") + F.col("__rkm_ldense"),
        "k": F.col("__rkm_k"),
        "nrows": F.col("__rkm_n"),
        "dense_max": _dense_max_closed(
            F.col("__rkm_k"), F.col("__rkm_n"), F.col("__rkm_dd")
        ),
    }
    bucket_temps = [
        "__rkm_b", "__rkm_lrn", "__rkm_lrank", "__rkm_ldense", "__rkm_lcume",
        "__rkm_off", "__rkm_doff", "__rkm_k", "__rkm_n", "__rkm_dd", *jtemps,
    ]
    out = _apply_rank_specs(
        joined, specs, src, tie_break, prim, [*temps, *bucket_temps]
    )
    return out.select(*want)


def global_avg_rank(
    df: DataFrame,
    col: str,
    out_col: str | None = None,
    ascending: bool = True,
    num_partitions: int | None = None,
) -> DataFrame:
    """GLOBAL pandas rank(method='average') without a single-task sort —
    the scale-safe replacement for ``Window.orderBy(col)`` with no
    partition (the canonical 100×-scale killer: every row funnels through
    one task).

    Mechanics: value-range buckets from an approxQuantile sketch (bucket
    assignment is a pure function of the value, so equal values share a
    bucket and every re-evaluation agrees), per-bucket parallel sort for
    local row numbers, per-bucket counts rolled into cumulative offsets
    (≤ num_partitions rows — trivial), broadcast back; global rank =
    offset + local rank. Average-of-ties is a window over the value — a
    hash exchange, fully parallel. Every stage distributes; nothing sorts
    globally.

    Result is independent of bucket boundaries (offsets + contiguous
    local ranks yield the same integers under any value split), so it is
    deterministic on any cluster layout.
    """
    out_col = out_col or f"{col}_rank"
    p = num_partitions or int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    # Bucket boundaries from an approx-quantile sketch (one extra action),
    # then bucket = a PURE FUNCTION of the value. This matters: the plan
    # below evaluates the bucketed frame twice (rank branch + offsets
    # branch), and repartitionByRange's sampled boundaries are not
    # guaranteed identical across evaluations — a value-deterministic
    # bucket function is, on any cluster layout.
    probs = [i / p for i in range(1, p)]
    bounds = sorted(set(df.stat.approxQuantile(col, probs, 0.001)))
    if not ascending:
        bounds = bounds[::-1]

    c = F.col(col)
    bucket = F.lit(0)
    for b in bounds:
        bucket = bucket + (c > F.lit(b) if ascending else c < F.lit(b)).cast("int")
    dfb = df.withColumn("__b", F.when(c.isNotNull(), bucket))

    order = c.asc_nulls_last() if ascending else c.desc_nulls_last()
    wloc = Window.partitionBy("__b").orderBy(order)
    dfb = dfb.withColumn("__lrn", F.row_number().over(wloc))

    counts = dfb.where(c.isNotNull()).groupBy("__b").agg(F.count("*").alias("__cnt"))
    # cumulative offsets over at most `p` bucket rows — trivially small
    woff = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "__b", F.coalesce(F.sum("__cnt").over(woff), F.lit(0)).alias("__off")
    )
    dfb = dfb.join(F.broadcast(offsets), "__b", "left")
    grn = (F.col("__off") + F.col("__lrn")).cast("double")
    wval = Window.partitionBy(c)
    out = dfb.withColumn(out_col, F.when(c.isNotNull(), F.avg(grn).over(wval)))
    return out.drop("__b", "__lrn", "__off")


def _ieee_ratio_m1(num, den):
    """``num/den − 1`` with IEEE zero-denominator semantics, as pandas
    pct_change produces them: x/0 → ±inf, 0/0 and NaN/0 → NaN. The
    session pins ANSI off (session.py), where Spark's ``/`` returns NULL
    for ANY zero denominator — but pandas distinguishes inf (a real
    ratio against a zero base) from missing, and silently folding both
    to NULL loses that. (−0.0 denominators take the +0.0 sign branch;
    pandas' 1/−0.0 = −inf edge is not reproduced.)"""
    inf, nan = F.lit(float("inf")), F.lit(float("nan"))
    return F.when(
        den == 0,
        F.when(num.isNull(), F.lit(None).cast("double"))
        .when(F.isnan(num) | (num == 0), nan)
        .when(num > 0, inf)
        .otherwise(-inf),
    ).otherwise(num / den - 1)


def pct_change(
    df: DataFrame,
    cols: Sequence[str],
    order_by: Sequence[str],
    periods: int = 1,
    partition_by: Sequence[str] | None = None,
    suffix: str = "_pct_change",
    fill_method: str | None = None,
    limit: int | None = None,
    freq_seconds: float | None = None,
) -> DataFrame:
    """Fractional change vs the row ``periods`` before (reference
    p_pct_change, parallel_dataframe.py:465-489 — the reference forwards
    ``fill_method``/``limit``/``freq`` straight to pandas).

    pandas semantics (pinned empirically, 2.2): the series is FILLED
    first ('pad'/'ffill' forward, 'bfill'/'backfill' backward, at most
    ``limit`` positions), then the ratio is taken between the filled
    value and the filled value ``periods`` rows back — so a gap inside a
    run of equal filled values yields 0.0, not NULL. Default
    ``fill_method=None`` (pandas' post-deprecation future default):
    NULL on either side of the ratio propagates.

    ``freq_seconds`` maps pandas ``freq=``: compare against the value at
    EXACTLY ``t − periods·freq`` on the first ``order_by`` column (a
    timestamp) — missing timestamps yield NULL. Implemented as an
    EQUAL-BOUND range window (``RANGE BETWEEN us PRECEDING AND us
    PRECEDING`` over epoch microseconds): the frame holds exactly the
    row at ``t − freq`` or nothing, so it is one shuffle + one sort on
    the partition keys with no gap-scan — and unlike the previous
    self-join form it evaluates the upstream plan ONCE (Spark gives a
    self-join no common-subtree reuse, so the join re-executed the whole
    input twice). Requires (keys, timestamp) unique, like pandas'
    unique-index requirement for ``shift(freq=)``."""
    if limit is not None and fill_method is None:
        raise ValueError("pct_change(limit=) requires fill_method")
    if fill_method not in (None, "pad", "ffill", "bfill", "backfill"):
        raise ValueError(f"fill_method must be pad/ffill/bfill/backfill/None, got {fill_method!r}")
    w = _window(order_by, partition_by)
    out = df
    tmp = []
    for c in cols:
        # TRUE NaN counts as missing for the fill, like pandas ffill/
        # bfill (last/first-IGNORE-NULLS alone skips only NULL — an
        # unmasked NaN would neither fill nor be filled, poisoning every
        # later filled position)
        src = F.col(c)
        if is_floating(df, c):
            src = nan_safe_col(src)
        if fill_method in ("pad", "ffill"):
            wf = w.rowsBetween(-limit if limit else Window.unboundedPreceding, 0)
            fc = F.last(src, ignorenulls=True).over(wf)
        elif fill_method in ("bfill", "backfill"):
            wf = w.rowsBetween(0, limit if limit else Window.unboundedFollowing)
            fc = F.first(src, ignorenulls=True).over(wf)
        else:
            fc = F.col(c).cast("double")
        out = out.withColumn(f"__f_{c}", fc)
        tmp.append(f"__f_{c}")

    if freq_seconds is None:
        for c in cols:
            out = out.withColumn(
                f"{c}{suffix}",
                _ieee_ratio_m1(F.col(f"__f_{c}"), F.lag(f"__f_{c}", periods).over(w)),
            )
        return out.drop(*tmp)

    ts = order_by[0]
    keys = list(partition_by or [])
    us = int(round(freq_seconds * 1_000_000)) * periods
    ep = F.unix_micros(F.col(ts).cast("timestamp"))
    out = out.withColumn("__ep", ep)
    # frame = exactly the row(s) at ep − us; with (keys, ts) unique that
    # is 0 or 1 row, so max() IS the shifted value (NULL when absent)
    wp = Window.partitionBy(*keys).orderBy("__ep").rangeBetween(-us, -us)
    for c in cols:
        out = out.withColumn(
            f"{c}{suffix}",
            _ieee_ratio_m1(F.col(f"__f_{c}"), F.max(f"__f_{c}").over(wp)),
        )
    return out.select(
        *df.columns,
        *[F.col(f"{c}{suffix}") for c in cols],
    )


def shift(df, cols, order_by, periods=1, partition_by=None, suffix="_shift"):
    w = _window(order_by, partition_by)
    out = df
    for c in cols:
        out = out.withColumn(f"{c}{suffix}", F.lag(c, periods).over(w))
    return out


def diff(df, cols, order_by, periods=1, partition_by=None, suffix="_diff"):
    """pandas ``diff(periods)``: x − x.shift(periods); negative ``periods``
    compares against the row |periods| AFTER (lead). Same single
    (partition, order) window as shift/cumsum — stacks onto their
    pipeline at zero extra Exchange/Sort."""
    w = _window(order_by, partition_by)
    lagged = (lambda c: F.lag(c, periods).over(w)) if periods >= 0 else (
        lambda c: F.lead(c, -periods).over(w)
    )
    out = df
    for c in cols:
        out = out.withColumn(f"{c}{suffix}", F.col(c) - lagged(c))
    return out


def interpolate(
    df: DataFrame,
    cols: Sequence[str],
    order_by: Sequence[str],
    partition_by: Sequence[str] | None = None,
    method: str = "linear",
    limit: int | None = None,
    suffix: str = "_interp",
) -> DataFrame:
    """pandas ``interpolate(method='linear'|'values', limit=,
    limit_direction='forward')`` as pure window expressions.

    pandas semantics reproduced exactly (twin-tested): interior gaps are
    linearly interpolated between the nearest non-missing neighbors;
    LEADING missing rows stay missing (forward direction); TRAILING
    missing rows take the last known value; ``limit=`` fills only the
    first ``limit`` rows of each gap. ``method='linear'`` treats rows as
    equally spaced (pandas' default ignores the index); ``method='values'``
    weights by the (single, numeric) ``order_by`` column's distance —
    pandas ``method='index'/'values'``. Missing means NULL or TRUE NaN.

    Plan: ONE (partition, order) window pipeline — four running
    expressions (last/next value and position, the next-* pair via the
    mirrored following frame) on one Sort, zero extra shuffles; stacks
    onto the cumsum/shift/diff pipeline when partition keys match.
    """
    if method not in ("linear", "values", "index"):
        raise NotImplementedError(f"interpolate method {method!r}; use 'linear' or 'values'")
    if method in ("values", "index") and len(order_by) != 1:
        raise ValueError("method='values' needs exactly one numeric order_by column")
    w = _window(order_by, partition_by)
    back = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    fwd = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    pos = (
        F.col(order_by[0]).cast("double")
        if method in ("values", "index")
        else F.row_number().over(w).cast("double")
    )
    out = df
    for c in cols:
        from .reductions import nan_safe

        v = nan_safe(df, c)
        obs = F.when(v.isNotNull(), F.struct(pos.alias("p"), v.alias("v")))
        prev = F.last(obs, ignorenulls=True).over(back)
        nxt = F.first(obs, ignorenulls=True).over(fwd)
        frac = (pos - prev["p"]) / (nxt["p"] - prev["p"])
        filled = (
            F.when(v.isNotNull(), v)
            .when(prev.isNull(), F.lit(None).cast("double"))  # leading gap
            .when(nxt.isNull(), prev["v"])  # trailing gap -> last value
            .otherwise(prev["v"] + (nxt["v"] - prev["v"]) * frac)
        )
        if limit is not None:
            # pandas limit: fill at most `limit` missing rows per gap,
            # counted from the gap's left edge — by ROW distance, in both
            # methods (pandas counts consecutive NaNs, not index distance)
            rn = F.row_number().over(w).cast("double")
            prev_rn = F.last(F.when(v.isNotNull(), rn), ignorenulls=True).over(back)
            filled = F.when(
                v.isNotNull() | (rn - prev_rn <= F.lit(float(limit))), filled
            )
        out = out.withColumn(f"{c}{suffix}", filled)
    return out


def top_k_per_group(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    k: int,
    descending: bool = True,
    tie_breaker: str | None = None,
) -> DataFrame:
    """Top-k rows per group — limit/top-k capability the reference lacks
    (SURVEY.md §2.8). row_number + filter: Spark pushes the rank filter into
    the window sort (WindowGroupLimit in the physical plan), so each group
    keeps only k rows during the sort — no full materialization."""
    order = [F.col(order_col).desc() if descending else F.col(order_col).asc()]
    if tie_breaker:
        order.append(F.col(tie_breaker).asc())
    w = Window.partitionBy(*keys).orderBy(*order)
    return df.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") <= k).drop("__rn")


def cum_axis1(df, cols, op, suffix=None):
    """Row-wise (pandas axis=1) cumulative across the column list —
    reference ``p_cumsum(axis=1)`` family (tests/test_dataframe_stats.py
    CUMULATIVE axis=1). Pure narrow expressions: output column i is the
    op-fold of columns [0..i] within the row; NULLs propagate like pandas
    skipna=True (null inputs contribute nothing, output null only until
    the first non-null). No shuffle, no window — this is embarrassingly
    parallel at any scale."""
    suffix = suffix or f"_cum{op}1"
    fold = {
        "sum": lambda a, b: a + b,
        "prod": lambda a, b: a * b,
        "max": F.greatest,
        "min": F.least,
    }[op]
    out = df
    acc = None
    for c in cols:
        cur = F.col(c).cast("double")
        # pandas skipna=True: a NaN cell OUTPUTS NaN but the running value
        # carries past it unchanged
        acc = cur if acc is None else (
            F.when(acc.isNull(), cur)
            .when(cur.isNull(), acc)
            .otherwise(fold(acc, cur))
        )
        out = out.withColumn(f"{c}{suffix}", F.when(cur.isNotNull(), acc))
    return out
