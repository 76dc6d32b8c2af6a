"""Session-memo registry discipline (yt.operators.memo).

The round-6 verdict's storage finding: in-query ``persist()`` frames were
never unpersisted, so a long-lived session accumulated InMemoryRelations.
These tests pin the round-7 contract: repeated query invocations do not
grow executor storage, release drops everything the registry owns, and a
released session refits with identical results.
"""

from __future__ import annotations

import __spark_entry__ as entrymod
from youtube_api_batch_process_with_analytics_spark.operators import memo
from youtube_api_batch_process_with_analytics_spark.operators.ranking import (
    _LM_STATS_CACHE,
)

_QUERIES = entrymod.queries()


def _n_persistent(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def _force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def test_repeat_invocations_do_not_accumulate_storage(spark, sf_dir):
    """Running the memo-backed and persist-bearing queries repeatedly must
    not grow the persistent-RDD registry: the session memo hands every
    repeat the SAME materialized frames, and plan-identical persists
    dedup in the CacheManager."""
    memo.release_session_frames()
    names = ["tfidf_top_terms", "perplexity_buckets", "dedup_exact",
             "semantic_dedup", "curation_pipeline_v2"]
    for n in names:
        _force(_QUERIES[n](spark, sf_dir))
    after_first = _n_persistent(spark)
    for _ in range(2):
        for n in names:
            _force(_QUERIES[n](spark, sf_dir))
    # <= not ==: the contract is NO GROWTH; the asynchronous
    # ContextCleaner may reclaim a dereferenced checkpoint RDD mid-test
    # and legitimately SHRINK the registry under load.
    assert _n_persistent(spark) <= after_first
    memo.release_session_frames()


def test_release_unpersists_registry_frames(spark, sf_dir):
    """release_session_frames() must drop every persist-backed frame the
    registry owns (checkpointed frames are reference-dropped; explicit
    persists — the tf-df table, the LM cb/cu stats, dedup's shingle
    frame — must leave the persistent-RDD registry)."""
    memo.release_session_frames()
    base = _n_persistent(spark)
    _force(_QUERIES["tfidf_top_terms"](spark, sf_dir))
    _force(_QUERIES["bigram_lm_quality"](spark, sf_dir))
    _force(_QUERIES["dedup_exact"](spark, sf_dir))
    assert memo.n_session_frames() > 0
    assert len(_LM_STATS_CACHE) == 1
    grown = _n_persistent(spark)
    assert grown > base  # the fit actually pinned storage
    memo.release_session_frames()
    assert memo.n_session_frames() == 0
    assert len(_LM_STATS_CACHE) == 0
    # Only explicit persists count here: localCheckpoint blocks leave the
    # registry asynchronously (ContextCleaner after GC), so assert the
    # persist-backed delta specifically — dfreq + cb + cu + shingle = 4
    # explicit persists released; the count must fall back by at least
    # those, i.e. to no more than base + the checkpoint entries created.
    remaining = _n_persistent(spark)
    assert remaining < grown


def test_release_then_refit_matches(spark, sf_dir):
    """A released session must refit from scratch with identical results
    (unpersist of lineage-bearing frames is safe; nothing dangling)."""
    memo.release_session_frames()
    first = sorted(
        _QUERIES["perplexity_buckets"](spark, sf_dir).collect(),
        key=lambda r: (r["bucket"], r["lang"]),
    )
    memo.release_session_frames()
    second = sorted(
        _QUERIES["perplexity_buckets"](spark, sf_dir).collect(),
        key=lambda r: (r["bucket"], r["lang"]),
    )
    assert first == second
    memo.release_session_frames()


def test_memo_keyed_by_sf_dir(spark, sf_dir):
    """Two corpora must never share a fitted artifact: the registry key
    includes sf_dir, so a same-session query against a different corpus
    fits its own frames (and reads its own data, not the first corpus's
    memoized tables)."""
    memo.release_session_frames()
    df1 = _QUERIES["tfidf_top_terms"](spark, sf_dir)
    _force(df1)
    n_one_corpus = memo.n_session_frames()
    assert n_one_corpus > 0
    # every registry key carries the sf_dir it was fitted on
    with memo._LOCK:
        assert all(k[1] == sf_dir for k in memo._FRAMES)
    # same sf_dir → no new frames
    _force(_QUERIES["tfidf_top_terms"](spark, sf_dir))
    assert memo.n_session_frames() == n_one_corpus
    # a DIFFERENT corpus in the same session fits its OWN frames and
    # returns different data — a regression dropping sf_dir from the key
    # would fail both assertions
    other = (
        "/root/testdata/sf0.01"
        if sf_dir != "/root/testdata/sf0.01"
        else "/root/testdata/sf0.001"
    )
    df2 = _QUERIES["tfidf_top_terms"](spark, other)
    _force(df2)
    assert memo.n_session_frames() > n_one_corpus
    with memo._LOCK:
        dirs = {k[1] for k in memo._FRAMES}
    assert dirs == {sf_dir, other}
    rows1 = sorted(map(tuple, df1.collect()))
    rows2 = sorted(map(tuple, df2.collect()))
    assert rows1 != rows2  # different corpora -> different top terms
    memo.release_session_frames()


def test_score_micro_bound_holds(spark, sf_dir):
    """The perplexity histogram's bounded-window contract (ranking.py):
    score_micro = round(mean-probability · 1e6) must land in [0, 1e6], so
    the histogram can never exceed 1e6+1 rows regardless of corpus size."""
    from youtube_api_batch_process_with_analytics_spark.operators.ranking import (
        lm_scores_frame,
    )
    from pyspark.sql import functions as F

    memo.release_session_frames()
    row = (
        lm_scores_frame(spark, sf_dir)
        .select(F.round(F.col("lm_score") * 1e6).cast("long").alias("m"))
        .agg(F.min("m").alias("lo"), F.max("m").alias("hi"))
        .collect()[0]
    )
    assert 0 <= row["lo"] <= row["hi"] <= 1_000_000
    memo.release_session_frames()


def test_latch_source_release_defers_while_in_use(tmp_path):
    """ADVICE r7: a release must never rmtree a staged latch source out
    from under an active streaming run. With the dir marked in-use,
    release only unlinks it from the cache (doomed); the last reader's
    exit performs the physical delete. No Spark needed — the lifecycle
    functions are pure bookkeeping around the staged path."""
    import os

    from youtube_api_batch_process_with_analytics_spark.streaming import state as st

    staged = tmp_path / "latch_src_fake"
    staged.mkdir()
    (staged / "part-0.parquet").write_bytes(b"x")
    key = ("app-test", "sf-test")
    with st._LATCH_LOCK:
        st._LATCH_SRC_CACHE[key] = str(staged)
        st._LATCH_IN_USE[str(staged)] = 1  # simulate an active run

    st._release_latch_sources()
    assert os.path.isdir(staged)  # still on disk: reader active
    with st._LATCH_LOCK:
        assert key not in st._LATCH_SRC_CACHE  # but unlinked from cache
        assert str(staged) in st._LATCH_DOOMED

    st._latch_src_release(str(staged))  # last reader exits
    assert not os.path.exists(staged)
    with st._LATCH_LOCK:
        assert str(staged) not in st._LATCH_IN_USE
        assert str(staged) not in st._LATCH_DOOMED

    # idle dirs are deleted synchronously by release
    idle = tmp_path / "latch_src_idle"
    idle.mkdir()
    with st._LATCH_LOCK:
        st._LATCH_SRC_CACHE[key] = str(idle)
    st._release_latch_sources()
    assert not os.path.exists(idle)


def test_retention_root_release_defers_while_in_use(tmp_path):
    """ADVICE r10: the retention staged root reuses the latch's
    in-use/doomed discipline — release must never rmtree the post-drop
    layout out from under an executing retention_applied scan. Pure
    bookkeeping, no Spark needed."""
    import os

    from youtube_api_batch_process_with_analytics_spark.sources import (
        partitioned as pt,
    )

    staged = tmp_path / "retention_fake"
    staged.mkdir()
    (staged / "day=2026-01-01").mkdir()
    key = ("app-test", "sf-test", 7)
    with pt._RETENTION_LOCK:
        pt._RETENTION_CACHE[key] = str(staged)
        pt._RETENTION_IN_USE[str(staged)] = 1  # simulate an active scan

    pt._release_retention_roots()
    assert os.path.isdir(staged)  # still on disk: scan active
    with pt._RETENTION_LOCK:
        assert key not in pt._RETENTION_CACHE  # but unlinked from cache
        assert str(staged) in pt._RETENTION_DOOMED

    pt._retention_root_release(str(staged))  # last handle drops
    assert not os.path.exists(staged)
    with pt._RETENTION_LOCK:
        assert str(staged) not in pt._RETENTION_IN_USE
        assert str(staged) not in pt._RETENTION_DOOMED

    # idle roots are deleted synchronously by release
    idle = tmp_path / "retention_idle"
    idle.mkdir()
    with pt._RETENTION_LOCK:
        pt._RETENTION_CACHE[key] = str(idle)
    pt._release_retention_roots()
    assert not os.path.exists(idle)


def test_retention_applied_handle_pins_staged_root(spark, sf_dir):
    """The refcount brackets the HANDLE's lifetime: a release while a
    retention_applied frame is live defers the rmtree; the frame still
    collects correctly afterwards; dropping the last handle performs the
    deferred delete."""
    import gc
    import os

    from youtube_api_batch_process_with_analytics_spark.sources import (
        partitioned as pt,
    )

    memo.release_session_frames()
    out = pt.retention_applied(spark, sf_dir)
    key = (spark.sparkContext.applicationId, sf_dir, pt.RETENTION_DAYS)
    with pt._RETENTION_LOCK:
        root = pt._RETENTION_CACHE[key]
        assert pt._RETENTION_IN_USE.get(root) == 1

    memo.release_session_frames()  # races the live handle
    assert os.path.isdir(root)  # deferred: handle still live
    rows = out.collect()  # the scan the old code would have broken
    assert len(rows) > 0

    del out
    gc.collect()
    assert not os.path.exists(root)  # last handle performed the delete
    with pt._RETENTION_LOCK:
        assert root not in pt._RETENTION_IN_USE
        assert root not in pt._RETENTION_DOOMED
