"""Reshape & binning operators: melt, crosstab, get_dummies, cut, qcut.

pandas-completeness surface beyond the reference's own method list (the
reference accelerates whatever pandas exposes through its accessor, so a
user migrating from it expects the common reshape verbs to exist). Each
operator is a pure DataFrame plan:

- ``melt`` uses Spark's native ``unpivot`` (Expand node — one scan, no
  shuffle, row count multiplies by len(value_vars)).
- ``crosstab`` / ``get_dummies`` produce a schema whose WIDTH equals the
  pivot column's cardinality — exactly pandas' contract. The distinct
  value set is therefore metadata-sized by definition; collecting it on
  the driver (what Spark's own ``pivot``-without-values does) is bounded
  by ``spark.sql.pivotMaxValues`` and is not a scale hazard: if the value
  set doesn't fit on the driver, the output schema wouldn't fit anywhere.
- ``cut`` compiles literal bin edges into one CASE expression chain —
  whole-stage-codegen'd, narrow, zero shuffle.
- ``qcut`` computes exact quantile edges in ONE aggregation (metadata-
  sized collect: q+1 doubles, same contract as the IVF centroid fetch in
  similarity.py), then reuses ``cut``'s CASE chain. Equal-frequency
  binning at 100 TB is two passes: one tiny agg + one narrow projection.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .reductions import nan_safe


def melt(
    df: DataFrame,
    id_vars: Sequence[str],
    value_vars: Sequence[str],
    var_name: str = "variable",
    value_name: str = "value",
) -> DataFrame:
    """pandas ``melt`` — wide to long. Spark's native ``unpivot`` plans an
    Expand (each row emitted once per value column): one scan, no shuffle.
    Value columns are cast to their common supertype, as pandas concat
    would."""
    return df.unpivot(
        [F.col(c) for c in id_vars],
        [F.col(c) for c in value_vars],
        var_name,
        value_name,
    )


def crosstab(
    df: DataFrame,
    row_col: str,
    col_col: str,
    values: Sequence[str] | None = None,
    normalize: bool | str = False,
) -> DataFrame:
    """pandas ``crosstab(index, columns)`` — frequency table.

    ``groupBy(row).pivot(col).count()``: one shuffle on the row key with
    map-side partial counts. ``values=None`` lets Spark collect the
    distinct pivot values (driver metadata, bounded by
    ``spark.sql.pivotMaxValues`` — see module docstring); pass the value
    list explicitly in pipelines to keep the plan fully static.
    ``normalize``: False | 'index' (rows sum to 1) | 'all'. Denominators
    are pandas': the FULL row / grand total over every category in the
    data — carried as an extra count in the same aggregation — so an
    explicit ``values=`` SUBSET narrows the columns without inflating
    the fractions (pandas has no values-subset; dividing by only the
    listed columns would silently change every number).

    NULL keys on EITHER axis are dropped up front, matching pandas
    crosstab's NaN handling — otherwise Spark's pivot emits a ``null``
    column and groupBy keeps a null row key, and the normalize
    denominators (which exclude nulls) stop summing to 1.
    """
    df = df.where(F.col(row_col).isNotNull() & F.col(col_col).isNotNull())
    if values is not None:
        piv = df.groupBy(row_col).pivot(col_col, list(values))
    else:
        piv = df.groupBy(row_col).pivot(col_col)
    out = piv.count()
    data_cols = [c for c in out.columns if c != row_col]
    filled = out.select(
        row_col, *[F.coalesce(F.col(f"`{c}`"), F.lit(0)).alias(c) for c in data_cols]
    )
    if not normalize:
        return filled
    # pandas denominator: counts over ALL categories, not just `values`
    # (count(col_col): pandas crosstab drops NaN pairs before counting)
    row_tot = df.groupBy(row_col).agg(F.count(col_col).alias("__rowtot"))
    if normalize == "index":
        return filled.join(row_tot, row_col).select(
            row_col,
            *[(F.col(f"`{c}`") / F.col("__rowtot")).alias(c) for c in data_cols],
        )
    if normalize in (True, "all"):
        # one extra 1-row agg, recombined by broadcast cross join
        gtot = df.where(F.col(col_col).isNotNull()).agg(
            F.count(row_col).alias("__tot")
        )
        return filled.crossJoin(F.broadcast(gtot)).select(
            row_col,
            *[(F.col(f"`{c}`") / F.col("__tot")).alias(c) for c in data_cols],
        )
    raise ValueError(f"normalize must be False, 'index' or 'all', got {normalize!r}")


def get_dummies(
    df: DataFrame,
    cols: Sequence[str],
    prefix_sep: str = "_",
    dummy_na: bool = False,
    drop_source: bool = True,
    values: dict[str, Sequence] | None = None,
) -> DataFrame:
    """pandas ``get_dummies`` — one-hot indicator columns (int 0/1).

    Indicator expressions are pure CASE projections (narrow, codegen'd).
    The category set per column is either supplied via ``values`` (static
    plan — the right call in pipelines) or collected in ONE distinct
    aggregation across all requested columns (grouping-sets style union,
    driver metadata-sized: it IS the output schema). Categories are
    sorted for a deterministic column order, as pandas does.
    """
    catmap: dict[str, list] = {}
    need = [c for c in cols if not (values and c in values)]
    if values:
        for c, vs in values.items():
            catmap[c] = list(vs)
    if need:
        # one scan: per-column distinct via groupingSets over the columns
        gs = (
            df.groupingSets([[c] for c in need], *need)
            .agg(F.grouping_id().alias("gid"))
        )
        k = len(need)
        rows = gs.collect()
        for i, c in enumerate(need):
            gid_i = (2**k - 1) ^ (2 ** (k - 1 - i))
            vals = [r[c] for r in rows if r["gid"] == gid_i and r[c] is not None]
            catmap[c] = sorted(vals)
    exprs = []
    for c in cols:
        for v in catmap[c]:
            name = f"{c}{prefix_sep}{v}"
            exprs.append(
                F.when(F.col(c) == F.lit(v), 1).otherwise(0).alias(name)
            )
        if dummy_na:
            exprs.append(
                F.when(F.col(c).isNull(), 1).otherwise(0).alias(f"{c}{prefix_sep}nan")
            )
    keep = [c for c in df.columns if not (drop_source and c in set(cols))]
    return df.select(*keep, *exprs)


def pivot_wide(
    df: DataFrame,
    index: Sequence[str],
    columns: str,
    values: str,
    pivot_values: Sequence | None = None,
    check_duplicates: bool = True,
) -> DataFrame:
    """pandas ``pivot(index, columns, values)`` — NON-aggregating
    long-to-wide reshape. pandas raises on duplicate (index, columns)
    cells; here ``check_duplicates=True`` (default) plans the same
    groupBy with ``count`` alongside ``first`` and fails the job via an
    assertion expression if any cell holds >1 row — one pass, no extra
    action. Pass ``pivot_values`` to keep the plan fully static (else
    Spark collects the distinct pivot values, bounded by
    ``spark.sql.pivotMaxValues`` — metadata-sized: it IS the output
    schema width)."""
    idx = list(index)
    piv = (
        df.groupBy(*idx).pivot(columns, list(pivot_values))
        if pivot_values is not None
        else df.groupBy(*idx).pivot(columns)
    )
    if not check_duplicates:
        return piv.agg(F.first(values))
    out = piv.agg(
        F.first(values).alias("__v"), F.count(F.lit(1)).alias("__n")
    )
    data = [c[: -len("___v")] for c in out.columns if c.endswith("___v")]
    sel = [
        F.when(
            F.col(f"`{c}___n`") > 1,
            F.raise_error(F.lit(f"pivot_wide: duplicate entries for column {c!r}")),
        ).otherwise(F.col(f"`{c}___v`")).alias(c)
        for c in data
    ]
    return out.select(*idx, *sel)


def _cut_expr(col, edges: Sequence[float], labels, right: bool, include_lowest: bool):
    """CASE chain mapping a value to its bin label/code; NULL outside."""
    n = len(edges) - 1
    if labels is False:
        outs = [F.lit(i) for i in range(n)]
    elif labels is None:
        outs = [
            F.lit(f"({edges[i]:g}, {edges[i + 1]:g}]" if (right and not (include_lowest and i == 0))
                  else (f"[{edges[i]:g}, {edges[i + 1]:g}]" if right
                        else f"[{edges[i]:g}, {edges[i + 1]:g})"))
            for i in range(n)
        ]
    else:
        if len(labels) != n:
            raise ValueError(f"labels length {len(labels)} != number of bins {n}")
        outs = [F.lit(v) for v in labels]
    expr = F.lit(None)
    # build from last bin backwards so the first matching CASE wins
    chain = None
    for i in range(n):
        lo, hi = float(edges[i]), float(edges[i + 1])
        if right:
            lo_ok = (col >= lo) if (include_lowest and i == 0) else (col > lo)
            hi_ok = col <= hi
        else:
            # pandas: include_lowest is a NO-OP when right=False (bins are
            # already left-closed; the top edge stays open) — verified 2.2
            lo_ok = col >= lo
            hi_ok = col < hi
        cond = lo_ok & hi_ok
        chain = F.when(cond, outs[i]) if chain is None else chain.when(cond, outs[i])
    return chain if chain is not None else expr


def cut(
    df: DataFrame,
    col: str,
    bins: Sequence[float],
    labels=None,
    right: bool = True,
    include_lowest: bool = False,
    out_col: str | None = None,
) -> DataFrame:
    """pandas ``cut`` with explicit bin edges — one CASE-chain projection.

    ``labels=False`` yields integer bin codes (pandas' codes), ``labels=``
    a custom list, ``labels=None`` interval strings formatted ``%g`` (NOT
    pandas' precision-3 repr — documented divergence; use explicit labels
    for byte-identical strings). Out-of-range values map to NULL, as
    pandas maps them to NaN. True NaN input is treated as missing."""
    out_col = out_col or f"{col}_bin"
    src = nan_safe(df, col)
    return df.withColumn(out_col, _cut_expr(src, list(bins), labels, right, include_lowest))


def qcut(
    df: DataFrame,
    col: str,
    q,
    labels=False,
    duplicates: str = "raise",
    out_col: str | None = None,
) -> DataFrame:
    """pandas ``qcut`` — equal-frequency binning by exact quantile edges.

    Pass 1: the edges come from the bounded-memory exact order
    statistics (``orderstats.exact_quantile_values`` — linear
    interpolation bit-equal to ``percentile``, the pandas definition;
    r13: the percentile aggregate's unmanaged on-heap value→count map
    was the engine's one measured OOM and qcut was its last caller).
    The q+1 edge doubles are driver-held (metadata-sized: they
    parameterize the projection, same contract as similarity.py's
    centroid fetch). Pass 2: :func:`cut` with ``right=True,
    include_lowest=True`` — pandas' qcut bin topology. ``duplicates``:
    'raise' (pandas default) or 'drop' to merge equal edges.
    """
    from .orderstats import exact_quantile_values

    if isinstance(q, int):
        probs = [i / q for i in range(q + 1)]
    else:
        probs = [float(p) for p in q]
    counts, vals = exact_quantile_values(df, [col], probs)
    edges = vals[col]
    if counts[col] == 0 or any(e is None for e in edges):
        raise ValueError(
            f"qcut: column {col!r} has no non-NaN values — quantile "
            "edges are undefined"
        )
    if len(set(edges)) != len(edges):
        if duplicates == "raise":
            raise ValueError(f"bin edges are not unique: {edges}; pass duplicates='drop'")
        seen, dedup = set(), []
        for e in edges:
            if e not in seen:
                seen.add(e)
                dedup.append(e)
        edges = dedup
    return cut(
        df, col, edges, labels=labels, right=True, include_lowest=True,
        out_col=out_col or f"{col}_qbin",
    )
