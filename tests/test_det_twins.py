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
