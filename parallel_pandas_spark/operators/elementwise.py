"""Elementwise / per-row / per-chunk UDF surface (SURVEY.md §2.2, reference
ops #1-#5 — the most-used operators in the reference).

Reference mechanics: dill-ship the callable, run real pandas per chunk
(/root/reference/parallel_pandas/parallel_dataframe.py:40-97, 388-429;
parallel_series.py:22-68). Spark replaces the pool with Arrow-batched
Python workers; the per-row/per-cell semantics are preserved exactly, and
each wrapper documents its cost tier:

- ``map_batches``  — iterator ``mapInPandas``; the generic whole-chunk UDF
  (reference ``chunk_apply``). Constant memory, the FAST python path.
- ``apply_rows``   — pandas ``df.apply(func, axis=1)`` per batch
  (reference ``p_apply(axis=1)``). Row-at-a-time Python: the SLOW path,
  kept for API parity; prefer expressions or ``map_batches``.
- ``apply_columns``— ``p_apply(axis=0)``: the reference parallelizes
  *across columns* (each chunk holds whole columns); here each column
  becomes one ``applyInPandas`` group via an unpivot, so arbitrary
  whole-column callables still run distributed, one task per column.
- ``map_elements`` — ``Series.p_apply``/``p_map`` with a callable: scalar
  Arrow ``pandas_udf`` wrapping ``Series.map(func, na_action)``.
- ``map_dict``     — ``Series.p_map`` with a dict: a literal ``MAP``
  lookup, pure JVM (missing keys → NULL, as pandas yields NaN).
- ``applymap``     — elementwise over every cell (reference p_applymap):
  one vectorized UDF applied per column.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def map_batches(df: DataFrame, func: Callable, schema, concat_result: bool = True):
    """Whole-chunk UDF (reference ``chunk_apply``,
    parallel_dataframe.py:66-97): ``func: pd.DataFrame -> pd.DataFrame``
    applied to each Arrow batch, iterator form so a batch never needs to
    be held twice in memory.

    ``concat_result=False`` reproduces the reference's list-return arm
    (parallel_dataframe.py:92-95): a driver-side ``list[pd.DataFrame]``,
    one entry per chunk in deterministic (partition, batch) order. The
    reference holds every chunk result in driver memory too, so this is
    explicitly a small-result convenience — per-chunk results must be
    DataFrames matching ``schema`` (the engine cannot ship untyped
    scalars), and the distributed shape to prefer is ``concat_result=True``
    which never collects.

    Two documented divergences of the list arm from the reference:
    (1) "chunk" means one ARROW BATCH (sized by
    ``spark.sql.execution.arrow.maxRecordsPerBatch``, default 10k rows),
    not the reference's n_cpu row slices — the list length differs;
    (2) because each chunk round-trips through an Arrow frame carrying an
    all-NULL marker row, non-nullable dtypes in ``func``'s output come
    back nullable (int64 -> float64/object where the chunk held a NULL) —
    call ``.convert_dtypes()`` or cast per ``schema`` on the entries if
    exact dtypes matter."""

    def it_func(batches):
        for pdf in batches:
            yield func(pdf)

    if concat_result:
        return df.mapInPandas(it_func, schema=schema)

    from pyspark import TaskContext

    if isinstance(schema, str):
        tagged_schema = f"{schema}, __chunk_pid int, __chunk_seq int, __chunk_marker int"
    else:
        tagged_schema = (
            T.StructType(list(schema.fields))
            .add("__chunk_pid", T.IntegerType())
            .add("__chunk_seq", T.IntegerType())
            .add("__chunk_marker", T.IntegerType())
        )

    def it_tag(batches):
        pid = TaskContext.get().partitionId()
        for i, pdf in enumerate(batches):
            out = func(pdf).copy()
            out["__chunk_pid"] = pid
            out["__chunk_seq"] = i
            out["__chunk_marker"] = 0
            # one all-NULL marker row per chunk so an EMPTY func result
            # still yields a list entry (the reference returns one entry
            # per chunk, empties included — positional chunk alignment)
            marker = pd.DataFrame(
                {c: [None] for c in out.columns if not c.startswith("__chunk_")}
            )
            marker["__chunk_pid"] = pid
            marker["__chunk_seq"] = i
            marker["__chunk_marker"] = 1
            yield pd.concat([out, marker], ignore_index=True)

    local = df.mapInPandas(it_tag, schema=tagged_schema).toPandas()
    return [
        g[g["__chunk_marker"] == 0]
        .drop(columns=["__chunk_pid", "__chunk_seq", "__chunk_marker"])
        .reset_index(drop=True)
        for _, g in local.groupby(["__chunk_pid", "__chunk_seq"], sort=True)
    ]


def map_batches_split_by(
    df: DataFrame, key_col: str, func: Callable, schema
) -> DataFrame:
    """``chunk_apply(split_by_col=...)`` (reference
    parallel_dataframe.py:80-84): the whole-chunk UDF, but no value of
    ``key_col`` is ever split across two chunks.

    Spark shape: repartition on the key (one shuffle), sort within the
    partition so key runs are contiguous, then re-buffer Arrow batches at
    group boundaries — the iterator holds back the trailing (possibly
    incomplete) key run of each batch and prepends it to the next, so
    ``func`` always sees complete groups while memory stays bounded by one
    batch plus one group (NOT one partition). Distinct from
    ``grouped.groupby_apply``: a chunk here can hold MANY whole groups, so
    per-chunk fixed costs amortize — the reference's reason for offering it.
    """

    def it_func(batches):
        held: pd.DataFrame | None = None
        for pdf in batches:
            if held is not None:
                pdf = pd.concat([held, pdf], ignore_index=True)
                held = None
            if not len(pdf):
                continue
            last_key = pdf[key_col].iloc[-1]
            is_last = pdf[key_col] == last_key
            # keys are sorted within the partition, so the last key's run is
            # the batch's tail; everything before it is complete groups
            cut = int(is_last.idxmax())
            if cut > 0:
                yield func(pdf.iloc[:cut])
            held = pdf.iloc[cut:].reset_index(drop=True)
        if held is not None and len(held):
            yield func(held)

    # Python-boundary partition sizing (r16, guide §4): AQE prices
    # post-shuffle partitions by bytes, and the session's
    # parallelism-first floor (64k, session.py) keeps JVM compute-dense
    # shuffles on every core — but an Arrow/pandas chunk stage amortizes
    # per-task fixed cost (worker pickup, Arrow setup, per-chunk pandas
    # overhead) over its rows and wants ~1 MB+ chunks (measured at
    # sf0.1: 32 micro-chunks 1.3 s vs 6 chunky tasks 0.78 s). An
    # EXPLICIT partition count pins what AQE's default 1m floor would
    # choose — min(shuffle parallelism, est_bytes/1m), never below 1 —
    # and is inert at scale, where est_bytes/1m exceeds the configured
    # shuffle parallelism and the count equals it unchanged. Chunk
    # BOUNDARIES never affect results beyond the documented contract
    # (whole groups per chunk) — the count only sizes the chunks.
    spark = df.sparkSession
    try:
        est_bytes = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:  # stats unavailable -> fall back to AQE sizing
        est_bytes = None
    if est_bytes is not None:
        parallelism = int(spark.conf.get("spark.sql.shuffle.partitions"))
        # plan-stat sizes are column-pruned COMPRESSED scan bytes, ~2x
        # under the row-format shuffle bytes AQE prices — 512k of
        # estimate per chunk lands near AQE's 1m-of-shuffle sizing
        n = max(1, min(parallelism, est_bytes // (1 << 19) or 1))
        d = df.repartition(n, key_col).sortWithinPartitions(key_col)
    else:
        d = df.repartition(key_col).sortWithinPartitions(key_col)
    return d.mapInPandas(it_func, schema=schema)


def apply_rows(
    df: DataFrame,
    func: Callable,
    out_col: str,
    out_type: str = "double",
    cols: Sequence[str] | None = None,
) -> DataFrame:
    """Per-row UDF — reference ``DataFrame.p_apply(func, axis=1)``
    (parallel_dataframe.py:40-63). ``func`` receives each row as a pandas
    Series. Row-at-a-time Python: ~100x slower than expressions; exists
    for parity with arbitrary row callables."""
    use_cols = list(cols) if cols else df.columns
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + f", {out_col} {out_type}"

    def batch(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.copy()
        pdf[out_col] = pdf[use_cols].apply(func, axis=1)
        return pdf

    return map_batches(df, batch, schema)


def apply_columns(
    df: DataFrame,
    cols: Sequence[str],
    func: Callable,
    out_type: str = "double",
) -> DataFrame:
    """Whole-column UDF — reference ``p_apply(axis=0)`` where each pool
    chunk holds complete columns (tools.py:119-120). Unpivot to
    (column, value) rows, one ``applyInPandas`` group per column: the
    callable sees the full column as a Series, columns run in parallel.
    Output: one row per column — (column, value)."""
    n = len(cols)
    stack_args = ", ".join(f"'{c}', CAST(`{c}` AS DOUBLE)" for c in cols)
    long = df.selectExpr(f"stack({n}, {stack_args}) as (column, value)")

    def per_col(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"column": [pdf["column"].iloc[0]], "value": [func(pdf["value"])]}
        )

    return long.groupBy("column").applyInPandas(
        per_col, schema=f"column string, value {out_type}"
    )


def map_elements(
    df: DataFrame,
    col: str,
    func: Callable,
    out_col: str,
    out_type: str = "double",
    na_action: str | None = None,
) -> DataFrame:
    """Scalar callable over one column — reference ``Series.p_apply`` /
    ``p_map(callable)`` (parallel_series.py:22-68). Arrow-vectorized
    transport, per-element Python call, pandas na_action semantics."""
    spark_type = T._parse_datatype_string(out_type)

    @F.pandas_udf(spark_type)
    def udf(s: pd.Series) -> pd.Series:
        return s.map(func, na_action=na_action)

    return df.withColumn(out_col, udf(F.col(col)))


def map_dict(
    df: DataFrame,
    col: str,
    mapping: dict,
    out_col: str | None = None,
) -> DataFrame:
    """Dict lookup — reference ``Series.p_map(dict)``: a literal MAP
    expression, fully JVM-side (no Python). Missing keys → NULL, matching
    pandas' NaN for unmapped values."""
    items: list[Column] = []
    for k, v in mapping.items():
        items.append(F.lit(k))
        items.append(F.lit(v))
    m = F.create_map(*items)
    return df.withColumn(out_col or f"{col}_mapped", m[F.col(col)])


def _contains_maptype(dt) -> bool:
    """True when a type (or any nested part of it) is a MapType — the one
    Spark type family with no ordering, so min()-based deterministic
    survivor selection is undefined for it."""
    if isinstance(dt, T.MapType):
        return True
    if isinstance(dt, T.ArrayType):
        return _contains_maptype(dt.elementType)
    if isinstance(dt, T.StructType):
        return any(_contains_maptype(f.dataType) for f in dt.fields)
    return False


def map_series(
    df: DataFrame,
    col: str,
    lookup: DataFrame,
    key_col: str,
    value_col: str,
    out_col: str | None = None,
    broadcast: bool = True,
    strict: bool = False,
) -> DataFrame:
    """``Series.p_map`` with a *Series* argument (reference
    parallel_series.py:47-68 — ``arg`` may be callable/dict/Series). A
    Series is a key→value table, so map = left broadcast-hash-join lookup,
    fully JVM-side: unmatched or NULL keys → NULL, matching pandas' NaN.
    ``broadcast=False`` for a lookup too large to broadcast (sort-merge
    join on the key instead).

    A pre-existing ``out_col`` raises immediately (the join would
    otherwise produce a duplicate/ambiguous column). Duplicate lookup
    keys: pandas raises on a duplicate index; by default the smallest
    value survives (deterministic, documented) — for value types with no
    ordering (maps), the survivor falls back to ``dropDuplicates``
    (arbitrary but valid); ``strict=True`` fails the job at runtime like
    pandas via an ``assert_true`` guard on the per-key count."""
    out_col = out_col or f"{col}_mapped"
    if out_col in df.columns:
        raise ValueError(
            f"map_series: column {out_col!r} already exists in the input — "
            "pass out_col= to choose another name"
        )
    vtype = lookup.schema[value_col].dataType
    if not strict and _contains_maptype(vtype):
        lk = lookup.select(
            F.col(key_col).alias("__map_key"), F.col(value_col).alias(out_col)
        ).dropDuplicates(["__map_key"])
        if broadcast:
            lk = F.broadcast(lk)
        return df.join(lk, F.col(col) == F.col("__map_key"), "left").drop("__map_key")
    lk = lookup.groupBy(F.col(key_col).alias("__map_key")).agg(
        F.min(F.col(value_col)).alias("__map_val"),
        F.count("*").alias("__map_cnt"),
    )
    if strict:
        val = F.when(
            F.assert_true(
                F.col("__map_cnt") <= 1,
                F.concat(
                    F.lit("map_series(strict=True): duplicate lookup key "),
                    F.col("__map_key").cast("string"),
                ),
            ).isNull(),
            F.col("__map_val"),
        )
    else:
        val = F.col("__map_val")
    lk = lk.select("__map_key", val.alias(out_col))
    if broadcast:
        lk = F.broadcast(lk)
    return df.join(lk, F.col(col) == F.col("__map_key"), "left").drop("__map_key")


def applymap(
    df: DataFrame,
    func: Callable,
    cols: Sequence[str],
    out_type: str = "double",
    na_action: str | None = "ignore",
) -> DataFrame:
    """Elementwise UDF over every cell of the selected columns — reference
    ``p_applymap``/``p_map`` (parallel_dataframe.py:388-429). One
    vectorized pandas_udf instance reused across columns."""
    spark_type = T._parse_datatype_string(out_type)

    @F.pandas_udf(spark_type)
    def udf(s: pd.Series) -> pd.Series:
        return s.map(func, na_action=na_action)

    out = df
    for c in cols:
        out = out.withColumn(c, udf(F.col(c)))
    return out


def clip(df: DataFrame, cols: Sequence[str], lower=None, upper=None) -> DataFrame:
    """pandas ``clip(lower, upper)``: pure JVM least/greatest expressions —
    narrow, codegen'd, no shuffle. Missing values pass through like
    pandas: NULL stays NULL and TRUE NaN stays NaN (Spark's least()
    orders NaN as the greatest double, which would otherwise turn a NaN
    cell into the upper bound)."""
    out = df
    for c in cols:
        e = F.col(c)
        if lower is not None:
            e = F.greatest(e, F.lit(lower))
        if upper is not None:
            e = F.least(e, F.lit(upper))
        guard = F.when(F.col(c).isNull(), None)
        if isinstance(df.schema[c].dataType, (T.DoubleType, T.FloatType)):
            guard = guard.when(F.isnan(F.col(c)), F.col(c))
        out = out.withColumn(c, guard.otherwise(e))
    return out


def round_cols(df: DataFrame, cols: Sequence[str], decimals: int = 0) -> DataFrame:
    """pandas ``round(decimals)`` — HALF_UP like Spark's round (pandas uses
    banker's rounding on exact halves of binary doubles; the divergence
    only appears on exactly-representable .5 values)."""
    out = df
    for c in cols:
        out = out.withColumn(c, F.round(F.col(c), decimals))
    return out


def abs_cols(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    out = df
    for c in cols:
        out = out.withColumn(c, F.abs(F.col(c)))
    return out


def where_mask(
    df: DataFrame, cols: Sequence[str], cond, other=None, mask: bool = False
) -> DataFrame:
    """pandas ``where(cond, other)`` / ``mask(cond, other)``: keep the value
    where ``cond`` holds (``mask=True`` inverts, like pandas.mask),
    otherwise ``other`` (default NULL ↔ pandas NaN). ``cond`` is a Column
    or a SQL boolean string — one JVM CASE expression per column."""
    c = F.expr(cond) if isinstance(cond, str) else cond
    if mask:
        c = ~c
    out = df
    for col in cols:
        out = out.withColumn(
            col,
            F.when(c, F.col(col)).otherwise(
                F.lit(other) if other is not None else F.lit(None)
            ),
        )
    return out


def fillna(
    df: DataFrame,
    value=None,
    cols: Sequence[str] | None = None,
    method: str | None = None,
    limit: int | None = None,
    order_by: Sequence[str] | None = None,
    partition_by: Sequence[str] | None = None,
) -> DataFrame:
    """pandas ``fillna``: fill missing values (NULL and TRUE NaN both count
    as missing, like pandas) with a scalar, a per-column dict, or
    directionally ('ffill'/'bfill', at most ``limit`` positions).

    Directional fills need an explicit ``order_by`` (pandas fills by input
    position, which is undefined after a shuffle) and plan as one
    last/first-IGNORE-NULLS window over a bounded frame — one shuffle on
    the partition key, no Python. Scalar/dict fills are narrow codegen
    expressions."""
    from pyspark.sql import Window, types as T

    if (value is None) == (method is None):
        raise ValueError("fillna needs exactly one of value= or method=")
    targets = list(cols) if cols is not None else [
        f.name for f in df.schema.fields
        if not isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]

    from .masks import missing_cond

    def _missing(c: str):
        return missing_cond(df, c)

    out = df
    if method is not None:
        if method not in ("ffill", "pad", "bfill", "backfill"):
            raise ValueError(f"method must be ffill/pad/bfill/backfill, got {method!r}")
        if not order_by:
            raise ValueError(
                "fillna(method=) needs an explicit order_by: pandas fills by "
                "input position, which is not defined after a shuffle"
            )
        w = Window.partitionBy(*(partition_by or [])).orderBy(
            *[F.col(c) for c in order_by]
        )
        if method in ("ffill", "pad"):
            wf = w.rowsBetween(-limit if limit else Window.unboundedPreceding, 0)
            pick = lambda src: F.last(src, ignorenulls=True).over(wf)  # noqa: E731
        else:
            wf = w.rowsBetween(0, limit if limit else Window.unboundedFollowing)
            pick = lambda src: F.first(src, ignorenulls=True).over(wf)  # noqa: E731
        for c in targets:
            src = F.when(~_missing(c), F.col(c))
            out = out.withColumn(c, F.when(_missing(c), pick(src)).otherwise(F.col(c)))
        return out

    vals = value if isinstance(value, dict) else {c: value for c in targets}
    for c, v in vals.items():
        out = out.withColumn(c, F.when(_missing(c), F.lit(v)).otherwise(F.col(c)))
    return out


def dropna(
    df: DataFrame,
    cols: Sequence[str] | None = None,
    how: str = "any",
    thresh: int | None = None,
) -> DataFrame:
    """pandas ``dropna(subset, how, thresh)``: drop rows with missing
    values (NULL or TRUE NaN). Pure narrow filter — pushes toward the
    scan, no shuffle."""
    from pyspark.sql import types as T

    targets = list(cols) if cols is not None else [
        f.name for f in df.schema.fields
        if not isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]

    def _ok(c: str):
        cond = F.col(c).isNotNull()
        if isinstance(df.schema[c].dataType, (T.DoubleType, T.FloatType)):
            cond = cond & ~F.isnan(F.col(c))
        return cond

    n_ok = None
    for c in targets:
        term = _ok(c).cast("int")
        n_ok = term if n_ok is None else (n_ok + term)
    if thresh is not None:
        return df.where(n_ok >= thresh)
    if how == "any":
        return df.where(n_ok == len(targets))
    if how == "all":
        return df.where(n_ok > 0)
    raise ValueError(f"how must be 'any' or 'all', got {how!r}")


def idx_extreme_axis1(
    df: DataFrame,
    cols: Sequence[str],
    how: str = "max",
    out_col: str | None = None,
    skipna: bool = True,
) -> DataFrame:
    """pandas ``idxmax(axis=1)`` / ``idxmin(axis=1)``: the NAME of the
    column holding the row-wise extreme. Pure narrow CASE projection
    (codegen, zero shuffle). pandas tie-breaks by first column in order;
    missing (NULL/TRUE NaN) entries are skipped (``skipna=True``), an
    all-missing row yields NULL. ``skipna=False`` (pandas: NaN wins)
    yields NULL for any row containing a missing entry, matching pandas'
    NaN result."""
    if how not in ("max", "min"):
        raise ValueError(f"how must be 'max' or 'min', got {how!r}")
    out_col = out_col or f"idx{how}"

    def _m(c: str):
        col = F.col(c)
        from .masks import is_floating as _isf, nan_safe_col as _nsc
        if _isf(df, c):
            return _nsc(col)
        return col.cast("double")

    vals = [_m(c) for c in cols]
    if len(vals) == 1:  # greatest/least require >= 2 args
        cmp = vals[0]
    else:
        cmp = F.greatest(*vals) if how == "max" else F.least(*vals)
    expr = F.lit(None).cast("string")
    # first-column-wins tie-break: scan in order, pick the first equal
    chain = None
    for c, v in zip(cols, vals):
        cond = v.isNotNull() & (v == cmp)
        chain = F.when(cond, F.lit(c)) if chain is None else chain.when(cond, F.lit(c))
    expr = chain
    if not skipna:
        missing = None
        for c, v in zip(cols, vals):
            m = v.isNull()
            missing = m if missing is None else (missing | m)
        expr = F.when(~missing, expr)
    return df.withColumn(out_col, expr)
