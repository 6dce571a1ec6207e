"""Bit-exact twin contract: every det.* builder must produce the SAME
double as its *_sql twin when DuckDB evaluates the SQL on the same data.
This is the guarantee the correctness gate relies on (det.py docstring);
the r01 failure was dkurt_sql drifting by one ulp from dkurt because the
emitted SQL used a different FP association order.
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parallel_pandas_spark import det  # noqa: E402

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]

# (name, spark Column builder, sql twin string) over lineitem columns
CASES = [
    ("dsum", lambda: det.dsum("l_quantity"), det.dsum_sql("l_quantity")),
    ("dmean", lambda: det.dmean("l_extendedprice"), det.dmean_sql("l_extendedprice")),
    ("dvar", lambda: det.dvar("l_quantity", 6, 6), det.dvar_sql("l_quantity", 6, 6)),
    ("dstd", lambda: det.dstd("l_extendedprice", 6, 4), det.dstd_sql("l_extendedprice", 6, 4)),
    ("dsem", lambda: det.dsem("l_quantity", 6, 6), det.dsem_sql("l_quantity", 6, 6)),
    ("dskew", lambda: det.dskew("l_discount", 12), det.dskew_sql("l_discount", 12)),
    ("dkurt", lambda: det.dkurt("l_discount", 12), det.dkurt_sql("l_discount", 12)),
    ("dkurt_qty", lambda: det.dkurt("l_quantity", 6), det.dkurt_sql("l_quantity", 6)),
    (
        "dcorr",
        lambda: det.dcorr("l_quantity", "l_discount", 6, 9, 8),
        det.dcorr_sql("l_quantity", "l_discount", 6, 9, 8),
    ),
]


@pytest.mark.parametrize("sf_dir", SF_DIRS)
@pytest.mark.parametrize("case", CASES, ids=[c[0] for c in CASES])
def test_twin_bit_exact(spark, sf_dir, case):
    name, col_builder, sql = case
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    spark_val = li.agg(col_builder().alias("v")).collect()[0]["v"]
    con = duckdb.connect()
    duck_val = con.execute(
        f"SELECT {sql} AS v FROM '{sf_dir}/lineitem.parquet'"
    ).fetchone()[0]
    con.close()
    assert spark_val == duck_val, (
        f"{name}@{sf_dir}: spark={spark_val!r} duck={duck_val!r} "
        f"ulp-drift={abs(spark_val - duck_val) if spark_val and duck_val else '?'}"
    )
    assert math.isfinite(spark_val)


def test_qsplit_negative_values_ground_truth(spark):
    """Regression (r2 ADVICE, det.py): _qsplit truncated toward zero, so the
    +0.5 offset mis-rounded negatives by up to 1.5*10^-s (x*10^s=-2.4 -> -1;
    even the grid point -2.0 -> -1). Both twins erred identically, so only a
    ground-truth check catches it: qsum must equal the exact Python
    floor(x*10^s + 0.5) sum, and match the floor-based lsum/fsum path."""
    import math as m

    import pandas as pd

    from parallel_pandas_spark.sources import from_pandas

    xs = [-2.4, -2.0, -2.5, -0.004, -123.456, 0.0, 2.4, 2.5, 7.125, -7.125]
    scale = 2
    exact = sum(m.floor(x * 10**scale + 0.5) for x in xs) / 10**scale
    sdf = from_pandas(spark, pd.DataFrame({"x": xs}))
    row = sdf.agg(
        det.qsum(sdf["x"].cast("double"), scale).alias("q"),
        det.fsum("x", scale).alias("f"),
        det.dsum("x", scale).alias("d"),
    ).collect()[0]
    assert row["q"] == exact, f"qsum {row['q']!r} != exact {exact!r}"
    assert row["f"] == exact
    assert row["d"] == exact
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"x": xs}))
    dq = con.execute(f"SELECT {det.qsum_sql('x', scale)} AS v FROM t").fetchone()[0]
    df_ = con.execute(f"SELECT {det.fsum_sql('x', scale)} AS v FROM t").fetchone()[0]
    con.close()
    assert dq == exact and df_ == exact
