"""UDF serialization parity with the reference's regression suite
(test_apply_globals.py: dill recurse=True so module-level globals survive
spawn — issue #13 there). PySpark ships closures via cloudpickle; these
tests pin that module globals, closures over locals, and imported-module
references all survive the driver → executor hop."""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: E402

from parallel_pandas_spark.operators import elementwise, grouped  # noqa: E402
from parallel_pandas_spark.sources import from_pandas  # noqa: E402

GLOBAL_FACTOR = 2.5  # module-level global captured by the UDFs below


def _module_helper(v: float) -> float:
    """Module-level function referenced from inside a shipped UDF."""
    return math.expm1(v) * GLOBAL_FACTOR


def test_map_elements_captures_globals(spark):
    df = from_pandas(spark, pd.DataFrame({"x": [0.0, 1.0, 2.0]}))
    out = elementwise.map_elements(df, "x", _module_helper, "y", "double")
    got = sorted(r["y"] for r in out.collect())
    want = sorted(_module_helper(v) for v in [0.0, 1.0, 2.0])
    assert got == want


def test_groupby_apply_captures_closure_and_global(spark):
    offset = 10.0  # enclosing-scope local

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"g": [pdf["g"].iloc[0]], "v": [pdf["x"].sum() * GLOBAL_FACTOR + offset]}
        )

    df = from_pandas(
        spark, pd.DataFrame({"g": [1, 1, 2], "x": [1.0, 2.0, 5.0]})
    )
    out = grouped.groupby_apply(df, ["g"], per_group, schema="g long, v double")
    got = {r["g"]: r["v"] for r in out.collect()}
    assert got == {1: 3.0 * GLOBAL_FACTOR + offset, 2: 5.0 * GLOBAL_FACTOR + offset}
