"""Round-10 Z-order layout (operators/layout.py): Morton interleave as
JVM expressions, row-multiset preservation, and the actual data-skipping
win measured from parquet row-group min/max stats."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow.parquet as pq  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from parallel_pandas_spark.operators import layout  # noqa: E402


def _grid_df(spark, n=64):
    # n x n integer grid: x and y are independent, worst case for a 1-d sort
    rows = [(i % n, i // n, float(i)) for i in range(n * n)]
    return spark.createDataFrame(rows, "x int, y int, v double")


def test_zvalue_is_the_morton_interleave(spark):
    """Check against a literal python Morton encode on a small grid
    whose min/max are 0..15 so the grid transform is the identity."""
    df = spark.createDataFrame(
        [(x, y) for x in range(16) for y in range(16)], "x int, y int"
    )
    got = {(r.x, r.y): r["__z"] for r in layout.zvalue(df, ["x", "y"], bits=4).collect()}

    def morton(x, y):
        z = 0
        for i in range(4):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    for (x, y), z in got.items():
        assert z == morton(x, y), (x, y, z, morton(x, y))


def test_zorder_write_preserves_row_multiset(spark, tmp_path):
    df = _grid_df(spark)
    p = str(tmp_path / "z")
    layout.zorder_write(df, p, ["x", "y"], num_files=4, bits=8)
    back = spark.read.parquet(p)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))
    assert back.columns == df.columns  # helper column dropped


def _overlapping_row_groups(path: str, col_bounds: dict) -> tuple[int, int]:
    """(row groups overlapping ALL predicates, total row groups) from
    parquet footer min/max stats across every part file."""
    hit = total = 0
    for f in os.listdir(path):
        if not f.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, f)).metadata
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            total += 1
            ok = True
            stats = {}
            for ci in range(g.num_columns):
                c = g.column(ci)
                name = c.path_in_schema
                if name in col_bounds and c.statistics is not None:
                    stats[name] = (c.statistics.min, c.statistics.max)
            for name, (lo, hi) in col_bounds.items():
                mn, mx = stats[name]
                if mx < lo or mn > hi:
                    ok = False
            hit += ok
    return hit, total


def test_zorder_prunes_on_both_dimensions(spark, tmp_path):
    """The measurable claim: under a selective 2-d predicate, the
    z-ordered layout leaves strictly fewer live row groups than a
    layout sorted on x alone (which prunes only on x)."""
    df = _grid_df(spark)
    zp, xp = str(tmp_path / "z"), str(tmp_path / "x")
    layout.zorder_write(df, zp, ["x", "y"], num_files=8, bits=8)
    (
        df.repartitionByRange(8, "x").sortWithinPartitions("x")
        .write.mode("overwrite").parquet(xp)
    )
    # x-range spans HALF the x axis (so an x-sort must keep ~half its
    # files) while y adds the real selectivity — the case a 1-d sort
    # cannot prune and a z-order can
    bounds = {"x": (0, 31), "y": (0, 7)}
    z_hit, z_total = _overlapping_row_groups(zp, bounds)
    x_hit, x_total = _overlapping_row_groups(xp, bounds)
    assert z_total > 1 and x_total > 1
    assert z_hit < x_hit, (z_hit, z_total, x_hit, x_total)
    # and the pruned scan still returns the right rows
    got = (
        spark.read.parquet(zp)
        .where((F.col("x") <= 31) & (F.col("y") <= 7))
        .count()
    )
    assert got == 32 * 8


def test_zvalue_nulls_and_constant_columns(spark):
    df = spark.createDataFrame(
        [(None, 5), (3, 5), (9, 5)], "x int, y int"
    )
    rows = layout.zvalue(df, ["x", "y"], bits=4).collect()
    by_x = {r.x: r["__z"] for r in rows}
    assert by_x[None] == 0  # NULL pins to cell 0
    # constant y contributes zero bits; z is monotone in x alone
    assert by_x[3] < by_x[9]


def test_derived_file_count_measures_input_bytes(spark, tmp_path):
    """r11: the default output file count derives from the measured scan
    bytes (ceil(bytes/target)) — small inputs collapse to few files,
    larger inputs split at the target, unknown stats fall back safely."""
    df = spark.range(3000).selectExpr(
        "id AS x", "id % 97 AS y", "repeat('p', 64) AS pad")
    p = str(tmp_path / "src")
    df.write.mode("overwrite").parquet(p)
    src = spark.read.parquet(p)
    import glob
    import os
    nbytes = sum(os.path.getsize(f) for f in glob.glob(f"{p}/*.parquet"))
    got = layout.derived_file_count(src, target_file_bytes=nbytes // 3)
    assert 3 <= got <= 5  # ceil of measured/size-third, footer overhead slack
    assert layout.derived_file_count(src) == 1  # far below 128 MB target
    # zorder_write with the derived default still preserves the multiset
    zp = str(tmp_path / "z")
    layout.zorder_write(src.select("x", "y"), zp, ["x", "y"], bits=8)
    assert len(glob.glob(f"{zp}/part-*.parquet")) == 1
    a = sorted(map(tuple, spark.read.parquet(zp).collect()))
    b = sorted(map(tuple, src.select("x", "y").collect()))
    assert a == b
