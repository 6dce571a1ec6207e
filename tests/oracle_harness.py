"""Local replica of the driver's correctness gate: run each queries() entry
on Spark and its oracle_sql() on DuckDB over the same parquet, compare
row count, column names, and values order-insensitively.

Comparison is strict (exact equality after canonicalization) — stricter
than any tolerance-based hash — so passing here means the driver's
value-hash comparison passes too (data and engines are deterministic).
"""

from __future__ import annotations

import math
from decimal import Decimal

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _canon_cell(v):
    if v is None:
        return None
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return v
    if isinstance(v, (list, tuple)):
        return tuple(_canon_cell(x) for x in v)
    tn = type(v).__module__
    if tn == "numpy":  # duckdb returns list columns as numpy arrays/scalars
        import numpy as np

        if isinstance(v, np.ndarray):
            return tuple(_canon_cell(x) for x in v.tolist())
        return _canon_cell(v.item())
    return v


def canonicalize(pdf: pd.DataFrame) -> list[tuple]:
    cols = sorted(pdf.columns)
    rows = []
    for _, row in pdf[cols].iterrows():
        rows.append(tuple(_canon_cell(v) for v in row))
    rows.sort(key=lambda r: tuple((x is None, str(type(x)), x) for x in r))
    return rows


def compare(name: str, spark_df, con, sql: str) -> list[str]:
    """Return a list of mismatch descriptions (empty = pass)."""
    problems = []
    spdf = spark_df.toPandas()
    ddf = con.execute(sql).df()
    if sorted(map(str.lower, spdf.columns)) != sorted(map(str.lower, ddf.columns)):
        problems.append(
            f"{name}: columns differ spark={sorted(spdf.columns)} duck={sorted(ddf.columns)}"
        )
        return problems
    ddf.columns = [
        next(c for c in spdf.columns if c.lower() == dc.lower()) for dc in ddf.columns
    ]
    if len(spdf) != len(ddf):
        problems.append(f"{name}: rowcount spark={len(spdf)} duck={len(ddf)}")
        return problems
    a = canonicalize(spdf)
    b = canonicalize(ddf)
    n_bad = 0
    for i, (ra, rb) in enumerate(zip(a, b)):
        if ra != rb:
            n_bad += 1
            if n_bad <= 3:
                problems.append(f"{name}: row {i} spark={ra!r} duck={rb!r}")
    if n_bad > 3:
        problems.append(f"{name}: ... {n_bad} mismatched rows total of {len(a)}")
    return problems
