"""Simulate the driver's t2 correctness gate: run every ``queries()`` entry
and compare with its ``oracle_sql()`` twin via DuckDB at sf0.01."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_ORACLE
from tests.oracle import compare

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, name):
    df = QUERIES[name](spark, SF_ORACLE)
    if name not in ORACLES:
        # non-SQL-expressible: rows-only check (mirrors driver's weak check)
        assert df.count() >= 0
        return
    compare(df, ORACLES[name], SF_ORACLE)


def test_every_oracle_has_query():
    assert set(ORACLES) <= set(QUERIES)
