"""Differential tests for corpus-prep operators (chunk / split / pack)
against DuckDB twins — same row-count + column + value-hash contract as the
gated queries (these ops stay out of ``queries()`` only because the driver
checks a fixed-size head of that dict)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.oracle_utils import assert_oracle_match
from youtube_api_batch_process_with_analytics_spark.operators.chunking import (
    chunk_documents,
    oracle_chunk_documents,
    oracle_pack_sequences,
    oracle_split_by_hash,
    pack_sequences,
    split_by_hash,
)
from youtube_api_batch_process_with_analytics_spark.sources import load_table


def test_chunk_documents_matches_oracle(spark, duck, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = chunk_documents(docs).select(
        "doc_id", "chunk_idx", "chunk_text", "n_tokens"
    )
    assert_oracle_match(out, duck, oracle_chunk_documents())


def test_chunk_overlap_semantics(spark, sf_dir):
    """For every multi-chunk doc: consecutive chunks share exactly
    `overlap` tokens, and no chunk is contained in its predecessor (each
    one past the first contributes > overlap tokens — the duplicate-text
    guard)."""
    docs = load_table(spark, sf_dir, "documents")
    chunked = chunk_documents(docs, chunk_tokens=8, overlap=3).collect()
    by_doc: dict = {}
    for r in chunked:
        by_doc.setdefault(r.doc_id, []).append(r)
    multi = {d: rs for d, rs in by_doc.items() if len(rs) > 1}
    assert multi, "corpus has no doc long enough for 2 chunks"
    for rs in multi.values():
        rs.sort(key=lambda r: r.chunk_idx)
        for prev, cur in zip(rs, rs[1:]):
            assert cur.n_tokens > 3, "chunk contained in its predecessor"
            assert prev.chunk_text.split(" ")[-3:] == cur.chunk_text.split(" ")[:3]


def test_split_by_hash_matches_oracle(spark, duck, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    out = split_by_hash(docs).select("doc_id", "split_bucket", "split")
    assert_oracle_match(out, duck, oracle_split_by_hash())


def test_split_is_stable_and_near_fraction(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    a = {r.doc_id: r.split for r in split_by_hash(docs).collect()}
    b = {r.doc_id: r.split for r in split_by_hash(docs).collect()}
    assert a == b
    frac = sum(1 for v in a.values() if v == "val") / len(a)
    assert 0.03 <= frac <= 0.20, frac  # 10% target, small-corpus variance


def test_pack_sequences_matches_oracle(spark, duck, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    with_tokens = docs.select(
        "doc_id",
        "source",
        F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("n_tokens"),
    )
    out = pack_sequences(with_tokens)
    assert_oracle_match(out, duck, oracle_pack_sequences())


def test_pack_bins_respect_budget_boundaries(spark, sf_dir):
    """A document's bin equals completed-budgets-before-it; bins within a
    group are non-decreasing in doc order and offsets stay under budget."""
    docs = load_table(spark, sf_dir, "documents")
    with_tokens = docs.select(
        "doc_id",
        "source",
        F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("n_tokens"),
    )
    rows = pack_sequences(with_tokens, budget=100).collect()
    by_group: dict = {}
    for r in sorted(rows, key=lambda r: (r.source, r.doc_id)):
        assert 0 <= r.bin_offset < 100
        prev = by_group.get(r.source)
        if prev is not None:
            assert r.bin >= prev
        by_group[r.source] = r.bin


def test_redact_pii(spark):
    from youtube_api_batch_process_with_analytics_spark.operators.text_analysis import (
        redact_pii,
    )

    df = spark.createDataFrame(
        [
            ("reach me at bob.smith+x@mail.example.com or +1 (415) 555-0199",),
            ("no pii here, just 42 tokens",),
            ("two mails a@b.co c@d.io and 0800 123 4567",),
            ("call +44 7911 123456 today",),
            # precision guards: dates, times, IPs, decimals, year ranges
            # must survive destructive rewriting untouched
            ("meeting on 2024-03-07 08:30:00",),
            ("ip 192.168.0.1 and pi 3.14159265",),
            ("orders span 1992-2003",),
            (None,),
        ],
        "text string",
    )
    got = [r.out for r in df.select(redact_pii(F.col("text")).alias("out")).collect()]
    assert got[0] == "reach me at [EMAIL] or [PHONE]"
    assert got[1] == "no pii here, just 42 tokens"
    assert got[2] == "two mails [EMAIL] [EMAIL] and [PHONE]"
    assert got[3] == "call [PHONE] today"
    assert got[4] == "meeting on 2024-03-07 08:30:00"
    assert got[5] == "ip 192.168.0.1 and pi 3.14159265"
    assert got[6] == "orders span 1992-2003"
    assert got[7] is None


def _formatted_plan(df):
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_chunk_documents_is_shuffle_free(spark, sf_dir):
    """Chunking is pure row expansion — any Exchange in the plan means the
    map-only claim regressed."""
    docs = load_table(spark, sf_dir, "documents")
    plan = _formatted_plan(chunk_documents(docs))
    assert "Exchange" not in plan, plan


def test_pack_sequences_shuffles_once_on_group_key(spark, sf_dir):
    """Packing needs exactly one shuffle (the per-group window); a second
    Exchange would mean the window spec lost its partitioning."""
    docs = load_table(spark, sf_dir, "documents")
    with_tokens = docs.select(
        "doc_id",
        "source",
        F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("n_tokens"),
    )
    tree = _formatted_plan(pack_sequences(with_tokens)).split("\n\n")[0]
    assert tree.count("Exchange") == 1, tree


def test_chunk_documents_null_text_matches_oracle(spark, tmp_path):
    """NULL text is a latent cross-engine edge: with ANSI off Spark's
    size(NULL) is -1 (→ chunk rows with n_tokens=-1) while the DuckDB twin
    propagates NULL — both sides coalesce NULL→'' so a NULL-text doc yields
    exactly one empty chunk. The shipped fixtures carry no NULL text, so
    this builds a corpus that does and runs the full differential."""
    import duckdb

    rows = [
        (1, None, "en", "web", 0),
        (2, "alpha beta gamma delta epsilon zeta eta theta", "en", "web", 46),
        (3, "", "en", "web", 0),
        (4, None, "de", "books", 0),
    ]
    p = str(tmp_path / "documents.parquet")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(p)

    out = chunk_documents(
        spark.read.parquet(p), chunk_tokens=4, overlap=1
    ).select("doc_id", "chunk_idx", "chunk_text", "n_tokens")

    con = duckdb.connect()
    try:
        con.execute(f"CREATE VIEW documents AS SELECT * FROM '{p}/*.parquet'")
        assert_oracle_match(out, con, oracle_chunk_documents(4, 1))
    finally:
        con.close()
    # and the NULL docs really are present as single empty chunks
    got = {r.doc_id: r for r in out.collect() if r.doc_id in (1, 3, 4)}
    assert {r.chunk_idx for r in got.values()} == {0}
    assert all(r.chunk_text == "" for r in got.values())
