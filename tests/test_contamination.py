"""Differential test for benchmark decontamination (shared-shingle join)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.oracle_utils import assert_oracle_match
from youtube_api_batch_process_with_analytics_spark.operators.dedup import (
    ORACLE_BENCHMARK_CONTAMINATION,
    benchmark_contamination,
    benchmark_contamination_query,
)
from youtube_api_batch_process_with_analytics_spark.sources import load_table


def test_contamination_matches_oracle(spark, duck, sf_dir):
    out = benchmark_contamination_query(spark, sf_dir)
    assert_oracle_match(out, duck, ORACLE_BENCHMARK_CONTAMINATION)


def test_contamination_flags_every_benchmark_source(spark, sf_dir):
    """Each benchmark item is drawn from the corpus, so its own source doc
    must always be flagged (identical shingle sets)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    bench = docs.filter(F.col("doc_id") % 100 == 0).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    hits = {
        (r.doc_id, r.bench_id)
        for r in benchmark_contamination(docs, bench, min_shared=1).collect()
    }
    for bench_id in [r.bench_id for r in bench.select("bench_id").collect()]:
        assert (bench_id, bench_id) in hits


def test_ngram_block_capped_hot_shingle_guard(spark):
    """Stop-shingle guard invariants on a hostile block: one shingle
    shared by ALL K docs (ubiquitous — K² posting rows uncapped), plus
    one true near-dup pair sharing discriminative rare shingles.

    1. the hot shingle is dropped from candidate generation (pairs whose
       ONLY overlap is the hot shingle never appear),
    2. the near-dup pair survives and its jaccard equals the EXACT
       uncapped value (guard caps recall, never values)."""
    from pyspark.sql import Row

    from youtube_api_batch_process_with_analytics_spark.operators.dedup import (
        ngram_jaccard_block_capped,
        ngram_jaccard_pairs,
    )

    k = 20
    hot = "the quick brown"  # one 3-gram shared by everyone
    rows = []
    for i in range(k):
        # distinct filler so non-dup docs share ONLY the hot shingle
        filler = f"filler{i} alpha{i} beta{i} gamma{i} delta{i} eps{i}"
        rows.append(Row(doc_id=i, source="s", text=f"{hot} {filler}"))
    # docs 100/101: true near-dups sharing many rare shingles
    shared = "zebra yak xenon walrus vulture toucan seal raven"
    rows.append(Row(doc_id=100, source="s", text=f"{hot} {shared} end one"))
    rows.append(Row(doc_id=101, source="s", text=f"{hot} {shared} end two"))
    docs = spark.createDataFrame(rows)

    import youtube_api_batch_process_with_analytics_spark.operators.dedup as dd
    from youtube_api_batch_process_with_analytics_spark.operators import memo

    # monkeypatch-style swap with frame release (round-9 ADVICE: the
    # patched operators persist+track the synthetic shingle frames; they
    # must not outlive the test in the shared session)
    orig = dd.load_table
    dd.load_table = lambda s, d, name: docs
    try:
        capped = {
            (r.doc_id_a, r.doc_id_b): r.jaccard
            for r in ngram_jaccard_block_capped(spark, "ignored", df_cap=4).collect()
        }
        exact = {
            (r.doc_id_a, r.doc_id_b): r.jaccard
            for r in ngram_jaccard_pairs(spark, "ignored").collect()
        }
    finally:
        dd.load_table = orig
        memo.release_session_frames()
    # the near-dup pair survives with the exact value
    assert (100, 101) in capped
    assert capped[(100, 101)] == exact[(100, 101)]
    # no pair among the K hot-only docs materializes
    assert all(a >= 100 and b >= 100 for a, b in capped), capped
    # and every emitted pair's value matches the exact operator's
    assert all(exact.get(p) == j for p, j in capped.items())


def test_contamination_guard_matches_unguarded_on_fixture(spark, sf_dir):
    """Production default (df_cap=NGRAM_DF_CAP) is bit-identical to the
    unguarded posting join on the fixture — every corpus df is far below
    the cap, so the guard reshapes the plan but not the answer."""
    from youtube_api_batch_process_with_analytics_spark.operators import memo
    from youtube_api_batch_process_with_analytics_spark.operators.dedup import (
        benchmark_contamination,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    bench = docs.filter(F.col("doc_id") % 100 == 0).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    try:
        guarded = {
            (r.doc_id, r.bench_id): r.shared_shingles
            for r in benchmark_contamination(docs, bench).collect()
        }
        plain = {
            (r.doc_id, r.bench_id): r.shared_shingles
            for r in benchmark_contamination(docs, bench, df_cap=None).collect()
        }
    finally:
        memo.release_session_frames()
    assert guarded == plain and guarded


def test_contamination_hot_shingle_guard(spark):
    """Stop-shingle guard invariants on a hostile contamination corpus —
    the mirror of test_ngram_block_capped_hot_shingle_guard for the
    posting join against a benchmark side:

    1. a boilerplate shingle present in ALL K corpus docs AND in the
       benchmark is dropped from candidate generation, so docs that
       overlap the benchmark ONLY in boilerplate are never flagged;
    2. a genuinely contaminated doc (shares rare eval shingles) survives
       with shared_shingles equal to the EXACT unguarded count — the
       guard caps recall, never values."""
    from pyspark.sql import Row

    from youtube_api_batch_process_with_analytics_spark.operators import memo
    from youtube_api_batch_process_with_analytics_spark.operators.dedup import (
        benchmark_contamination,
    )

    k = 20
    hot = "subscribe like share"  # boilerplate 3-gram in every doc
    rows = []
    for i in range(k):
        filler = f"filler{i} alpha{i} beta{i} gamma{i} delta{i} eps{i}"
        rows.append(Row(doc_id=i, text=f"{hot} {filler}"))
    # doc 100 genuinely leaks the eval item's rare content
    leak = "zebra yak xenon walrus vulture toucan seal raven"
    rows.append(Row(doc_id=100, text=f"{hot} {leak} end one"))
    docs = spark.createDataFrame(rows)
    bench = spark.createDataFrame([Row(bench_id=0, text=f"{hot} {leak} tail")])

    try:
        guarded = {
            (r.doc_id, r.bench_id): r.shared_shingles
            for r in benchmark_contamination(
                docs, bench, min_shared=1, df_cap=4
            ).collect()
        }
        plain = {
            (r.doc_id, r.bench_id): r.shared_shingles
            for r in benchmark_contamination(
                docs, bench, min_shared=1, df_cap=None
            ).collect()
        }
    finally:
        memo.release_session_frames()
    # the boilerplate-only docs are flagged by the unguarded join but not
    # by the guarded one — that IS the declared recall trade
    assert all(d == 100 for d, _ in guarded), guarded
    # the real leak survives with the exact unguarded count
    assert guarded[(100, 0)] == plain[(100, 0)]
    assert plain[(100, 0)] > 1  # rare-shingle overlap, not just boilerplate


def test_stop_shingle_guard_is_broadcast_anti_join(spark, sf_dir):
    """Round-11 guard rework pin: the df guard must be the aggregate
    shape — a broadcast LEFT ANTI join of the dropped stop shingles —
    with NO window over the posting list (the round-10 shape pushed
    every posting row through one exchange with a per-partition sort;
    a skewed shingle serialized onto one task)."""
    import __spark_entry__ as entrymod

    for name in ("benchmark_contamination", "ngram_jaccard_block_capped"):
        df = entrymod.queries()[name](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "LeftAnti, BuildRight" in plan, f"{name}: no broadcast anti join"
        assert "Window" not in plan, f"{name}: posting-list window reappeared"
