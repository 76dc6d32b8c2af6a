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


def test_r12_rotation_contract():
    """Round-12 rotation arithmetic (the two-round coverage contract):
    the gate head (first 50 registered queries) is EXACTLY the round-11
    tail plus the new ingest_dedup_incremental registration (the one
    free slot the round-11 gate fold opened), which puts
    semantic_dedup_gate_combined in the driver gate for the first time;
    the tail is exactly the round-11 head plus the round-12 tail
    registration (remove_boilerplate_lines — replica+pytest evidence
    this round, first driver row in r13, the fold-row precedent), so
    head ∪ r11-head covers every registered query except that one new
    tail row."""
    names = list(_QUERIES)
    assert len(names) == 101
    head = set(names[:50])
    assert head == set(entrymod._R11_TAIL_NOW_HEAD) | {
        "ingest_dedup_incremental"
    }
    assert "semantic_dedup_gate_combined" in head
    assert set(names[50:]) == set(entrymod._R10_TAIL_NOW_HEAD) | {
        "remove_boilerplate_lines"
    }
    for retired in ("semantic_dedup_fitted", "semantic_dedup_capped"):
        assert retired not in names
