"""Hostile-corpus differential: every document-consuming gated query must
stay Spark↔DuckDB hash-identical on degenerate text the shipped fixtures
never contain — NULL, empty, whitespace-only (incl. the vertical tab that
Java's \\s matches and RE2's does not), single-token, and repeated-token
documents.

This is the systematic form of the ``chunk_documents`` NULL-text finding
(round-4 ADVICE): with ANSI off, Spark's ``size(split(trim(NULL)))`` is -1
while DuckDB propagates NULL; with ANSI on, an empty doc turns a ratio
denominator into a DIVIDE_BY_ZERO crash. On first run this differential
caught 8 real latent divergences (two ANSI crashes, NULL-shingle
asymmetries in MinHash/Jaccard/CC, a nullable-INT float64 coercion in the
fingerprint oracle, a \\x0b class gap in the BPE token regex, NULL-content
media rows) — all fixed by coalescing NULL→'' at every tokenize/length
site on BOTH engines, ``try_divide`` (NULL on zero, exactly DuckDB's x/0),
and no-media-row-without-payload semantics.

The hostile rows are APPENDED to the real sf0.001 corpus so every query
keeps realistic strata/groups; all non-document tables are the sf0.001
originals. Fix semantics here are identity on NULL-free corpora, so the
driver gate hashes are unchanged.
"""

from __future__ import annotations

import shutil

import duckdb
import pytest

import __spark_entry__ as em
import tools.compare_oracle as co
from tests.oracle_utils import fetch_duck
from youtube_api_batch_process_with_analytics_spark.sources import TABLES

HOSTILE_ROWS = """
    (9000001, NULL, 'en', 'web', 0),
    (9000002, '', 'en', 'web', 0),
    (9000003, '   ', 'en', 'web', 3),
    (9000004, CAST(e'\\t\\n \\x0b' AS VARCHAR), 'de', 'web', 4),
    (9000005, 'single', 'de', 'books', 6),
    (9000006, 'two words', 'fr', 'web', 9),
    (9000007, CAST(e'a\\tb\\nc  d' AS VARCHAR), 'en', 'books', 8),
    (9000008, 'x x x x x x x x', 'en', 'web', 15),
    (9000100, NULL, 'en', 'web', 0),
    (9000200, '', 'de', 'books', 0)
"""


@pytest.fixture(scope="module")
def hostile_dir(sf_dir, tmp_path_factory):
    d = tmp_path_factory.mktemp("hostile")
    for t in TABLES:
        if t != "documents":
            shutil.copy(f"{sf_dir}/{t}.parquet", d / f"{t}.parquet")
    con = duckdb.connect()
    try:
        con.execute(
            f"""
COPY (
  SELECT * FROM '{sf_dir}/documents.parquet'
  UNION ALL
  SELECT * FROM (VALUES {HOSTILE_ROWS}
  ) t(doc_id, text, lang, source, n_chars)
) TO '{d}/documents.parquet' (FORMAT PARQUET)
"""
        )
    finally:
        con.close()
    return str(d)


def _doc_query_names():
    return [n for n, sql in em.oracle_sql().items() if "documents" in sql.lower()]


def test_hostile_corpus_full_differential(spark, hostile_dir):
    qs, oracles = em.queries(), em.oracle_sql()
    con = duckdb.connect()
    failures = []
    try:
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{hostile_dir}/{t}.parquet'"
            )
        for name in _doc_query_names():
            try:
                df = qs[name](spark, hostile_dir)
                rows = [tuple(r) for r in df.collect()]
                cols = df.columns
            except Exception as e:  # ANSI crashes are exactly what we hunt
                failures.append(f"{name}: SPARK_ERR {e!r}"[:200])
                continue
            dcols, drows = fetch_duck(con, oracles[name])
            if len(rows) != len(drows):
                failures.append(f"{name}: rows {len(rows)} != {len(drows)}")
            elif sorted(cols) != sorted(dcols):
                failures.append(f"{name}: cols {sorted(cols)} != {sorted(dcols)}")
            elif co.value_hash(rows, cols) != co.value_hash(drows, dcols):
                failures.append(f"{name}: value hash mismatch")
    finally:
        con.close()
    assert not failures, failures


def test_hostile_rows_actually_flow_through(spark, hostile_dir):
    """Guard against the differential silently passing because the hostile
    rows got filtered out everywhere: the fingerprint query must emit all
    of them, and NULL/'' docs must share the '' content group."""
    from youtube_api_batch_process_with_analytics_spark.operators.text_analysis import (
        doc_fingerprint,
    )

    rows = {
        r.doc_id: r
        for r in doc_fingerprint(spark, hostile_dir).collect()
        if r.doc_id >= 9000001
    }
    assert len(rows) == 10
    empty_fp = {rows[i].fingerprint for i in (9000001, 9000002, 9000003, 9000100)}
    assert len(empty_fp) == 1  # NULL ≡ '' ≡ whitespace-only after normalize
