"""Differential test of every queries() entry against its DuckDB oracle —
the same comparison the driver runs at sf=0.01 (kept at sf0.01 here too;
set PPS_PARITY_SF=/root/testdata/sf0.001 for a fast iteration loop)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402

from .oracle_harness import compare, duck_connection  # noqa: E402

SF_DIR = os.environ.get("PPS_PARITY_SF", "/root/testdata/sf0.01")

_QUERIES = entrymod.queries()
_ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_parity(name, spark, duck):
    fn = _QUERIES[name]
    df = fn(spark, SF_DIR)
    if name not in _ORACLES:
        # rows-only check (non-SQL-expressible op): must run and be stable
        n = df.count()
        assert n >= 0
        return
    problems = compare(name, df, duck, _ORACLES[name])
    assert not problems, "\n".join(problems)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns
