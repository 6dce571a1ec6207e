"""Grouped operators (SURVEY.md §2.5, reference ops #21-#25).

The reference's grouped path is: compute integer group codes, route each
group wholly into one chunk, run real pandas groupby per chunk
(/root/reference/parallel_pandas/parallel_groupby.py:96-257). That chunk
routing *is* a hash partition by key — Spark's shuffle — and the per-chunk
"final" aggregation is strictly weaker than Spark's partial+final
HashAggregate (map-side combine before the exchange), which is what
survives skew and 100 TB inputs.

NaN-key policy: pandas ``dropna=True`` (default) excludes NULL-key rows
(parallel_groupby.py:117-124 routes them to chunk -1); Spark groups NULLs,
so ``dropna=True`` adds an explicit NOT NULL filter.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .reductions import STAT_EXPRS, stat_expr


def _dropna_keys(df: DataFrame, keys: Sequence[str], dropna: bool) -> DataFrame:
    if not dropna:
        return df
    cond = None
    for k in keys:
        c = F.col(k).isNotNull()
        cond = c if cond is None else (cond & c)
    return df.where(cond)


def groupby_agg(
    df: DataFrame,
    keys: Sequence[str],
    spec: dict[str, Sequence[str] | str] | Sequence[Column],
    dropna: bool = True,
    sort: bool = True,
) -> DataFrame:
    """pandas ``groupby().agg(spec)`` for string/list/dict specs
    (reference p_agg, parallel_groupby.py:187-257).

    ``spec`` is either {col: stat | [stats]} (pandas dict spec) or a list of
    ready Column expressions (named-agg form). Output columns are
    ``<col>_<stat>``. ``sort=True`` orders by keys (pandas default);
    note Spark results are unordered multisets, the sort adds a final
    ordering stage only — skip it in pipelines.
    """
    df = _dropna_keys(df, keys, dropna)
    callables: dict[str, Callable] = {}
    if isinstance(spec, dict):
        exprs = []
        for c, stats in spec.items():
            if callable(stats) and not isinstance(stats, Column):
                # pandas dict-with-callable (reference test_agg_dict):
                # Series -> scalar, evaluated per group via Arrow
                callables[c] = stats
                continue
            if isinstance(stats, str):
                stats = [stats]
            exprs.extend(stat_expr(s, c, df).alias(f"{c}_{s}") for s in stats)
    else:
        exprs = list(spec)
    key_list = list(keys)
    if callables:
        items = sorted(callables.items())
        schema = ", ".join(
            f"{k} {t}" for k, t in
            [(k, dict(df.dtypes)[k]) for k in key_list]
            + [(f"{c}_agg", "double") for c, _ in items]
        )

        def _agg_group(pdf):
            import pandas as pd

            row = {k: [pdf[k].iloc[0]] for k in key_list}
            for c, fn in items:
                row[f"{c}_agg"] = [float(fn(pdf[c]))]
            return pd.DataFrame(row)

        cal = df.groupBy(*key_list).applyInPandas(_agg_group, schema=schema)
        out = cal if not exprs else df.groupBy(*key_list).agg(*exprs).join(cal, key_list)
    else:
        out = df.groupBy(*key_list).agg(*exprs)
    if sort:
        out = out.orderBy(*key_list)
    return out


def named_agg(df: DataFrame | None = None, **named: tuple[str, str]) -> list[Column]:
    """pandas named-agg form (reference test_agg_named):
    ``named_agg(df, mx=("x", "max"), sy=("y", "sum"))`` → aliased Columns
    for :func:`groupby_agg`'s expression-list spec. Pass ``df`` so
    floating columns get the NaN-skip mask every other aggregation path
    applies (stat_expr masks only when it can see the schema — without
    it a true-NaN observation poisons sums and inflates counts)."""
    return [stat_expr(s, c, df).alias(name) for name, (c, s) in named.items()]


def groupby_apply(
    df: DataFrame,
    keys: Sequence[str],
    func: Callable,
    schema,
    dropna: bool = True,
) -> DataFrame:
    """Arbitrary per-group pandas UDF — reference GroupBy.p_apply
    (parallel_groupby.py:28-93). Direct conceptual match:
    one task per group ↔ one chunk per group; Arrow batches replace dill
    pipes. ``func: pd.DataFrame -> pd.DataFrame``; ``schema`` is the output
    schema (explicit, since pandas output shape is arbitrary)."""
    df = _dropna_keys(df, keys, dropna)
    return df.groupBy(*keys).applyInPandas(func, schema=schema)


#: builtin transform names -> window aggregate (broadcast back to rows)
_TRANSFORM_FNS = {k: v for k, v in STAT_EXPRS.items()}


def groupby_transform(
    df: DataFrame,
    keys: Sequence[str],
    cols: Sequence[str],
    func: str | Callable,
    dropna: bool = True,
    schema=None,
    suffix: str | None = None,
) -> DataFrame:
    """Same-shape per-group transform — reference GroupBy.p_transform
    (parallel_groupby.py:96-184).

    Builtin string funcs ('mean','sum','max',...) become window aggregates
    over ``partitionBy(keys)`` — no applyInPandas, no shuffle beyond the one
    hash exchange, whole-stage codegen. NULL-key rows keep their row but get
    NULL output (pandas dropna=True semantics,
    test_groupby_transform.py:67-75). Callables drop to applyInPandas and
    must return input rows + transformed columns (requires ``schema``).
    """
    suffix = suffix if suffix is not None else (func if isinstance(func, str) else "t")
    if isinstance(func, str):
        w = Window.partitionBy(*[F.col(k) for k in keys])
        out = df
        keys_ok = None
        for k in keys:
            c = F.col(k).isNotNull()
            keys_ok = c if keys_ok is None else (keys_ok & c)
        from .reductions import MINCOUNT_IDENTITY

        for c in cols:
            from .reductions import nan_safe

            expr = _TRANSFORM_FNS[func](nan_safe(df, c)).over(w)
            if func in MINCOUNT_IDENTITY:
                # pandas min_count=0: an all-NULL group transforms to the
                # identity (0 for sum, 1 for prod) on every row
                expr = F.coalesce(expr, F.lit(MINCOUNT_IDENTITY[func]))
            if dropna:
                expr = F.when(keys_ok, expr)
            out = out.withColumn(f"{c}_{suffix}", expr)
        return out
    if schema is None:
        raise ValueError("callable transform requires explicit output schema")
    df2 = _dropna_keys(df, keys, dropna)
    return df2.groupBy(*keys).applyInPandas(func, schema=schema)


def _aggfunc_pairs(values: str, aggfunc, df: DataFrame | None = None) -> list[tuple[str, Column]]:
    """Normalize a pandas-style aggfunc spec into (suffix, expr) pairs.

    ``str`` → one unsuffixed agg over ``values``; ``list[str]`` → one agg
    per function; ``dict[col, fn | list[fn]]`` → per-column aggs. pandas'
    hierarchical result columns flatten to ``<pivotval>_<suffix>`` where
    suffix is ``<fn>`` (list) or ``<col>_<fn>`` (dict)."""
    if isinstance(aggfunc, str):
        return [("", stat_expr(aggfunc, values, df))]
    if isinstance(aggfunc, (list, tuple)):
        return [(fn, stat_expr(fn, values, df)) for fn in aggfunc]
    if isinstance(aggfunc, dict):
        pairs = []
        for c, fns in aggfunc.items():
            for fn in [fns] if isinstance(fns, str) else fns:
                pairs.append((f"{c}_{fn}", stat_expr(fn, c, df)))
        return pairs
    raise TypeError(f"aggfunc must be str/list/dict/callable, got {type(aggfunc)}")


def pivot_table(
    df: DataFrame,
    index: Sequence[str],
    columns: str,
    values: str,
    aggfunc="mean",
    fill_value=None,
    margins: bool = False,
    pivot_values: Sequence | None = None,
) -> DataFrame:
    """pandas ``pivot_table`` — reference p_pivot_table
    (parallel_dataframe.py:100-183; aggfunc as str/list/dict/callable is
    exercised by the reference's tests/test_pivot_table.py).

    Maps to ``groupBy(index).pivot(columns).agg(...)``. At scale, pass
    ``pivot_values`` explicitly: otherwise Spark runs an extra distinct-scan
    to discover the pivot domain. ``margins=True`` unions a grand-total row
    (the reference falls back to serial pandas for margins,
    parallel_dataframe.py:148-154 — here it's just one more tiny query).

    A callable aggfunc takes the applyInPandas fallback: one shuffled group
    per (index, columns) cell, callable applied to that cell's value Series
    — then the tiny cell frame pivots with ``first``. All named-stat specs
    stay JVM-side (partial+final HashAggregate).
    """
    pv = list(pivot_values) if pivot_values else None
    if callable(aggfunc):
        if margins:
            raise NotImplementedError(
                "margins=True with a callable aggfunc: compute margins with a "
                "named stat, or aggregate the pivoted result yourself"
            )
        keys = [*index, columns]
        key_schema = ", ".join(
            f"{f.name} {f.dataType.simpleString()}"
            for f in df.select(*keys).schema.fields
        )

        def _cell(key, pdf):
            import pandas as pd

            return pd.DataFrame([[*key, float(aggfunc(pdf[values]))]], columns=[*keys, "v"])

        cells = (
            df.select(*keys, values)
            .groupBy(*keys)
            .applyInPandas(_cell, schema=f"{key_schema}, v double")
        )
        out = cells.groupBy(*index).pivot(columns, pv).agg(F.first("v"))
    else:
        pairs = _aggfunc_pairs(values, aggfunc, df)
        single = len(pairs) == 1 and pairs[0][0] == ""
        aggs = [e.alias(s or "v") for s, e in pairs]
        out = df.groupBy(*index).pivot(columns, pv).agg(*aggs)
        if margins:
            m_names = ["All" if single else f"All_{s}" for s, _ in pairs]
            total = df.groupBy(*index).agg(
                *[e.alias(a) for (_, e), a in zip(pairs, m_names)]
            )
            out = out.join(total, list(index), "left")
            # grand-total row: margins across all index values
            pivot_cols = [c for c in out.columns if c not in index]
            grand = (
                df.groupBy()
                .pivot(columns, pv)
                .agg(*aggs)
                .crossJoin(df.agg(*[e.alias(a) for (_, e), a in zip(pairs, m_names)]))
            )
            for i, k in enumerate(index):
                grand = grand.withColumn(k, F.lit("All" if i == 0 else None))
            out = out.unionByName(grand.select(*index, *pivot_cols))
    if fill_value is not None:
        val_cols = [c for c in out.columns if c not in index]
        out = out.fillna(fill_value, subset=val_cols)
    return out


#: (partial builder, final builder) per supported stat for the salted
#: two-stage plan. partial runs on (keys, salt); final re-aggregates the
#: partials on keys alone.
_SALTED_STATS = {
    "sum": (lambda c: F.sum(c), lambda p: F.sum(p)),
    "count": (lambda c: F.count(c), lambda p: F.sum(p)),
    "min": (lambda c: F.min(c), lambda p: F.min(p)),
    "max": (lambda c: F.max(c), lambda p: F.max(p)),
}


def salted_groupby_agg(
    df: DataFrame,
    keys: Sequence[str],
    spec: dict[str, Sequence[str] | str],
    salt_buckets: int = 16,
    dropna: bool = True,
    mean_cols: Sequence[str] = (),
) -> DataFrame:
    """Skew-safe grouped aggregation: two-stage salted shuffle.

    A hot key (one group holding a large fraction of all rows) funnels its
    entire group through one reducer in a plain ``groupBy`` — the salted
    form first aggregates on ``(keys, salt)`` where salt spreads each
    group over ``salt_buckets`` reducers, then re-aggregates the (tiny)
    partials on the true keys. Decomposable stats only (sum/count/min/max;
    mean via sum+count — pass ``mean_cols``). AQE's skew handling covers
    JOIN skew; aggregation skew still needs explicit salting.

    The salt is ``pmod(hash of a uniform row expression, buckets)`` —
    deterministic per row, so results are identical to the unsalted plan.
    """
    df = _dropna_keys(df, keys, dropna)
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt_buckets))
    df = df.withColumn("__salt", salt)

    partials, finals = [], []
    for c, stats in spec.items():
        if isinstance(stats, str):
            stats = [stats]
        for s in stats:
            if s not in _SALTED_STATS:
                raise ValueError(
                    f"stat {s!r} is not decomposable for salting; "
                    f"supported: {sorted(_SALTED_STATS)} (+ mean via mean_cols)"
                )
            p_fn, f_fn = _SALTED_STATS[s]
            partials.append(p_fn(c).alias(f"__p_{c}_{s}"))
            finals.append(f_fn(F.col(f"__p_{c}_{s}")).alias(f"{c}_{s}"))
    for c in mean_cols:
        partials.append(F.sum(c).alias(f"__p_{c}_msum"))
        partials.append(F.count(c).alias(f"__p_{c}_mcnt"))
        finals.append(
            (F.sum(F.col(f"__p_{c}_msum")) / F.sum(F.col(f"__p_{c}_mcnt"))).alias(
                f"{c}_mean"
            )
        )

    stage1 = df.groupBy(*keys, "__salt").agg(*partials)
    return stage1.groupBy(*keys).agg(*finals)


def cube_agg(df: DataFrame, keys: Sequence[str], exprs: Sequence[Column]) -> DataFrame:
    """Grouping-sets capability the reference lacks (SURVEY.md §2.8)."""
    return df.cube(*keys).agg(*exprs)


def rollup_agg(df: DataFrame, keys: Sequence[str], exprs: Sequence[Column]) -> DataFrame:
    return df.rollup(*keys).agg(*exprs)
