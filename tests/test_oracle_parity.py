"""Differential tests: every registered query vs its DuckDB oracle at sf0.001.

This is the same contract the driver enforces at sf0.01
(row-count + column set + order-insensitive value hash).
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.oracle_utils import assert_oracle_match

_QUERIES = entrymod.queries()
_ORACLES = entrymod.oracle_sql()


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    sdf = _QUERIES[name](spark, sf_dir)
    if name not in _ORACLES:
        assert sdf.count() >= 0  # rows-only check for non-SQL-expressible ops
        return
    assert_oracle_match(sdf, duck, _ORACLES[name])


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert len(df.columns) > 0
