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


def test_r11_rotation_contract():
    """Round-11 rotation arithmetic (the two-round coverage contract):
    the gate head (first 50 registered queries) is EXACTLY the round-10
    tail, the registry shrank 100 → 99 by the semantic-dedup gate fold,
    and head ∪ r10-head covers every registered query except the new
    combined row (whose round-11 verification is the fold-feasibility
    pytest + the four-tier replica, with a driver row due in round 12)."""
    names = list(_QUERIES)
    assert len(names) == 99
    head = set(names[:50])
    assert head == set(entrymod._R10_TAIL_NOW_HEAD)
    assert "semantic_dedup_gate_combined" in set(names[50:])
    for retired in ("semantic_dedup_fitted", "semantic_dedup_capped"):
        assert retired not in names
