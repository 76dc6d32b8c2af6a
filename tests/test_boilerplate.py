"""Planted-case tests for line-level boilerplate removal (the
C4/CCNet/RefinedWeb-family cleaning step). Gate parity vs the DuckDB twin
and hostile-corpus coverage come free from the registered-query suites
(test_oracle_parity / test_hostile_corpus); these pin the operator
semantics on a corpus where every rule arm is exercised deliberately."""

from __future__ import annotations

from pyspark.sql import functions as F

from youtube_api_batch_process_with_analytics_spark.operators.text_analysis import (
    remove_boilerplate_lines,
)

PLANTED = [
    (1, "COOKIE BANNER\nreal content one\n\nFOOTER"),
    (2, "COOKIE BANNER\nunique text two\nFOOTER"),
    (3, "COOKIE BANNER\nmore unique\nFOOTER"),
    (4, "COOKIE BANNER\nyet more\nFOOTER"),
    (5, None),
    (6, "  COOKIE BANNER  \ntrim test"),
]


def test_planted_boilerplate_is_removed_content_kept(spark):
    docs = spark.createDataFrame(PLANTED, "doc_id long, text string")
    got = {
        r.doc_id: (r.clean_text, r.n_removed)
        for r in remove_boilerplate_lines(docs, df_cap=3).collect()
    }
    # COOKIE BANNER recurs in 5 distinct docs (doc 6 via trim-normalized
    # key), FOOTER in 4 — both above cap=3, both removed everywhere; the
    # empty separator line in doc 1 is exempt structure and survives.
    assert got[1] == ("real content one\n", 2)
    assert got[2] == ("unique text two", 2)
    assert got[3] == ("more unique", 2)
    assert got[4] == ("yet more", 2)
    # NULL text behaves exactly like '': one empty (exempt) line, nothing
    # removed, clean_text ''.
    assert got[5] == ("", 0)
    # the padded '  COOKIE BANNER  ' matches the hot key after trim and is
    # removed; the doc's unique line survives.
    assert got[6] == ("trim test", 1)


def test_threshold_is_strictly_greater_than_cap(spark):
    # a line in EXACTLY cap distinct docs is kept (> cap, not >= cap), and
    # in-doc repetition does not inflate df (distinct-doc counting).
    rows = [
        (1, "EXACTLY3\nu1"),
        (2, "EXACTLY3\nu2"),
        (3, "EXACTLY3\nEXACTLY3\nEXACTLY3\nu3"),
        (4, "solo\nu4"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.clean_text, r.n_removed)
        for r in remove_boilerplate_lines(docs, df_cap=3).collect()
    }
    assert got[1] == ("EXACTLY3\nu1", 0)
    assert got[3] == ("EXACTLY3\nEXACTLY3\nEXACTLY3\nu3", 0)
    assert got[4] == ("solo\nu4", 0)


def test_every_doc_survives_even_if_fully_boilerplate(spark):
    # a doc consisting ONLY of hot lines must still appear in the output
    # with clean_text '' (the left join back to docs), not vanish.
    rows = [(i, "SAME") for i in range(1, 6)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = remove_boilerplate_lines(docs, df_cap=3)
    got = {r.doc_id: (r.clean_text, r.n_removed) for r in out.collect()}
    assert len(got) == 5
    assert all(v == ("", 1) for v in got.values())
