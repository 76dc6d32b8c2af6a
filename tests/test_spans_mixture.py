"""Unit + plan tests for duplicate-span detection, temperature-mixture
sampling, and the global-shuffle shard planner.

Oracle-differential coverage lives in tests/test_oracle_parity.py (full
queries() dict); these pin what the hash compare cannot express — span
merge semantics on constructed corpora, the rate cap and monotonicity of
temperature sampling, shard density/determinism, and the real
repartition+sortWithinPartitions write path the window-based gate query
stands in for.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from youtube_api_batch_process_with_analytics_spark.operators import (
    sampling as sp,
)
from youtube_api_batch_process_with_analytics_spark.operators.spans import (
    SPAN_K,
    doc_novelty,
    duplicate_spans,
    remove_duplicate_spans,
    source_overlap_matrix,
)
from youtube_api_batch_process_with_analytics_spark.sources import load_table


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------- spans


def test_spans_shared_region_single_span(spark):
    """Two docs sharing one 12-token region, k=4: every window inside the
    region duplicates, and all windows merge into one maximal span."""
    shared = " ".join(f"tok{i}" for i in range(12))
    docs = _docs(
        spark,
        [
            (1, "alpha beta " + shared + " gamma"),
            (2, "one two three four five " + shared),
            (3, "completely different words entirely here now"),
        ],
    )
    got = {
        (r.doc_id, r.span_start, r.span_end, r.span_tokens, r.n_dup_grams)
        for r in duplicate_spans(docs, k=4).collect()
    }
    # doc 1: region starts at token 2; doc 2: at token 5. 12-token region,
    # k=4 → 9 windows each, merging into one 12-token span.
    assert got == {(1, 2, 13, 12, 9), (2, 5, 16, 12, 9)}


def test_spans_within_doc_repeat_not_flagged(spark):
    """A gram repeated only inside ONE document is not a cross-doc span
    (min(doc)=max(doc) filters it)."""
    rep = " ".join(f"w{i}" for i in range(6))
    docs = _docs(
        spark,
        [(1, rep + " filler " + rep), (2, "unrelated text goes here now yes")],
    )
    assert duplicate_spans(docs, k=4).count() == 0


def test_spans_disjoint_regions_stay_separate(spark):
    """Two shared regions separated by more than k unique tokens must
    yield two spans, not one merged span."""
    a = " ".join(f"a{i}" for i in range(6))
    b = " ".join(f"b{i}" for i in range(6))
    gap = " ".join(f"gap{i}" for i in range(10))
    docs = _docs(
        spark,
        [
            (1, a + " " + gap + " " + b),
            (2, a + " " + " ".join(f"x{i}" for i in range(8)) + " " + b),
        ],
    )
    got = duplicate_spans(docs, k=4)
    assert got.filter(F.col("doc_id") == 1).count() == 2
    spans = sorted(
        (r.span_start, r.span_end)
        for r in got.filter(F.col("doc_id") == 1).collect()
    )
    assert spans == [(0, 5), (16, 21)]


def test_spans_recall_floor_on_fixture(spark, sf_dir):
    """Every near-dup pair found by exact dedup must surface spans: exact
    duplicates share their full token stream, so any doc with an exact
    twin and ≥ SPAN_K tokens must appear in duplicate_spans output."""
    docs = load_table(spark, sf_dir, "documents")
    twins = (
        docs.groupBy(F.md5(F.coalesce(F.col("text"), F.lit(""))).alias("h"))
        .agg(
            F.count("*").alias("n"),
            F.collect_list("doc_id").alias("ids"),
            # count tokens the way the operator's _tokens() does: the
            # split can yield '' at the string edges, which must not
            # inflate the count (a doc with SPAN_K-1 real tokens would
            # otherwise pass the filter yet never produce a span)
            F.min(
                F.size(
                    F.filter(
                        F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
                        lambda t: t != "",
                    )
                )
            ).alias("min_toks"),
        )
        .filter((F.col("n") > 1) & (F.col("min_toks") >= SPAN_K))
    )
    twin_ids = {i for r in twins.collect() for i in r.ids}
    if not twin_ids:  # fixture-dependent; sf0.001 still has exact twins
        return
    flagged = {
        r.doc_id
        for r in duplicate_spans(docs).select("doc_id").distinct().collect()
    }
    assert twin_ids <= flagged


def test_remove_spans_keeps_canonical_occurrence(spark):
    """All-but-one policy: the canonical (min doc_id) document keeps the
    duplicated region; every other document loses exactly it."""
    shared = " ".join(f"tok{i}" for i in range(12))
    docs = _docs(
        spark,
        [
            (1, "alpha beta " + shared + " gamma"),
            (2, "one two three four five " + shared),
            (3, shared + " trailing words here"),
        ],
    )
    got = {r.doc_id: r for r in remove_duplicate_spans(docs, k=4).collect()}
    assert got[1].n_tokens_removed == 0
    assert got[1].cleaned_text == "alpha beta " + shared + " gamma"
    assert got[2].n_tokens_removed == 12
    assert got[2].cleaned_text == "one two three four five"
    assert got[3].n_tokens_removed == 12
    assert got[3].cleaned_text == "trailing words here"
    assert got[2].n_spans_removed == got[3].n_spans_removed == 1


def test_remove_spans_untouched_docs_pass_through(spark):
    docs = _docs(
        spark,
        [
            (1, "totally unique sentence number one right here"),
            (2, "another fully distinct sentence with different words"),
        ],
    )
    for r in remove_duplicate_spans(docs, k=4).collect():
        assert r.n_spans_removed == 0 and r.n_tokens_removed == 0
        assert len(r.cleaned_text.split()) == r.n_tokens


def test_remove_spans_token_accounting(spark, sf_dir):
    """cleaned token count + removed token count == original count, per
    doc, over the real fixture."""
    docs = load_table(spark, sf_dir, "documents")
    out = remove_duplicate_spans(docs)
    bad = out.filter(
        F.size(F.split("cleaned_text", " ")).cast("long")
        - F.when(F.col("cleaned_text") == "", 1).otherwise(0)  # split('')→['']
        + F.col("n_tokens_removed")
        != F.col("n_tokens")
    )
    assert bad.count() == 0


def test_novelty_first_doc_wins(spark):
    """Ingest-order semantics: the earliest doc_id holding a fingerprint
    scores it as novel; an identical later doc scores 0."""
    text = " ".join(f"tok{i}" for i in range(10))
    docs = _docs(spark, [(1, text), (2, text)])
    got = {r.doc_id: r for r in doc_novelty(docs, k=4).collect()}
    assert got[1].novelty_permille == 1000
    assert got[2].novelty_permille == 0
    assert got[1].n_windows == got[2].n_windows == 7


def test_novelty_truncating_permille(spark):
    """Integer DIV semantics: 2 novel of 3 windows → 666, not 667 —
    DuckDB CAST would round; the DIV path must truncate identically."""
    # doc1: 6 unique tokens → 3 windows (k=4), all novel.
    # doc2: shares doc1's first 4-token window only → 1 of its 3 stale.
    d1 = "a b c d e f"
    d2 = "a b c d x y"  # windows: (a b c d) stale, (b c d x), (c d x y) novel
    got = {
        r.doc_id: r for r in doc_novelty(_docs(spark, [(1, d1), (2, d2)]), k=4).collect()
    }
    assert (got[2].n_novel, got[2].n_windows) == (2, 3)
    assert got[2].novelty_permille == 666


def test_source_overlap_counts_distinct_shared_fps(spark):
    shared = " ".join(f"s{i}" for i in range(6))  # 3 windows at k=4
    docs = spark.createDataFrame(
        [
            (1, shared + " uniq1 uniq2", "A"),
            (2, shared + " other words", "B"),
            (3, "nothing in common here at all", "C"),
            (4, shared, "A"),  # same source repeat must not inflate counts
        ],
        "doc_id long, text string, source string",
    )
    rows = source_overlap_matrix(docs, k=4).collect()
    got = {(r.src_a, r.src_b): r.shared_fingerprints for r in rows}
    assert got == {("A", "B"): 3}


# -------------------------------------------------------------- mixture


def test_mixture_rate_cap_and_monotonicity(spark, sf_dir):
    """Thresholds: capped at 2^32 when C/sqrt(n) ≥ 1, and monotonically
    non-increasing in stratum size (bigger strata sample at lower rates —
    the temperature-flattening property)."""
    plan = {
        r.lang: (r.n_docs, r.mix_threshold)
        for r in sp.mixture_temperature_sample(spark, sf_dir)
        .select("lang", "mix_threshold")
        .join(
            load_table(spark, sf_dir, "documents")
            .groupBy("lang")
            .agg(F.count("*").alias("n_docs")),
            "lang",
        )
        .distinct()
        .collect()
    }
    by_size = sorted(plan.values())
    for (n1, t1), (n2, t2) in zip(by_size, by_size[1:]):
        assert n1 <= n2 and t1 >= t2
    for n, thr in plan.values():
        want = min(1.0, sp.MIX_C / math.sqrt(n))
        assert thr == math.floor(want * 4294967296.0)
        if sp.MIX_C / math.sqrt(n) >= 1.0:
            assert thr == 4294967296


def test_mixture_capped_stratum_keeps_every_row(spark):
    """A stratum small enough to hit the rate cap must keep ALL its rows —
    the tail-language guarantee — through the REAL operator core."""
    docs = spark.createDataFrame(
        [(i, "t", "tiny") for i in range(9)]
        + [(100 + i, "t", "big") for i in range(50000)],
        "doc_id long, text string, lang string",
    )
    kept = sp.temperature_sample(docs)
    assert kept.filter(F.col("lang") == "tiny").count() == 9
    big_kept = kept.filter(F.col("lang") == "big").count()
    # big stratum rate = 12/sqrt(50000) ≈ 5.37% → binomial ±6σ
    rate = sp.MIX_C / math.sqrt(50000)
    sigma = math.sqrt(50000 * rate * (1 - rate))
    assert abs(big_kept - rate * 50000) <= 6 * sigma


def test_waterfill_skewed_exact_budget(spark):
    """Skewed capacities: small sources fully funded, big sources clipped
    to a common level, total EXACTLY the budget (remainder distributed to
    lexicographically-smallest clipped sources)."""
    caps = spark.createDataFrame(
        [("a", 10), ("b", 1000), ("c", 1000), ("d", 50), ("e", 3)],
        "source string, capacity long",
    )
    rows = {r.source: r for r in sp.waterfill(caps, 500).collect()}
    total_cap = 2063
    budget = (total_cap * 500) // 1000  # 1031
    assert sum(r.allocation for r in rows.values()) == budget
    assert rows["a"].funded and rows["a"].allocation == 10
    assert rows["e"].funded and rows["e"].allocation == 3
    assert rows["d"].funded and rows["d"].allocation == 50
    assert not rows["b"].funded and not rows["c"].funded
    # level = (1031-63) DIV 2 = 484, remainder 0 → both clipped to 484
    assert rows["b"].allocation == 484 and rows["c"].allocation == 484


def test_waterfill_remainder_goes_to_smallest_clipped(spark):
    caps = spark.createDataFrame(
        [("x", 100), ("y", 100), ("z", 100)], "source string, capacity long"
    )
    rows = {r.source: r for r in sp.waterfill(caps, 500).collect()}
    # budget = 150; level = 50, remainder 0 → 50 each
    assert [rows[s].allocation for s in "xyz"] == [50, 50, 50]
    # NONZERO remainder: budget = 300*507//1000 = 152 = 3*50 + 2 → the
    # two lexicographically-smallest clipped sources get the extra token
    rows2 = {r.source: r for r in sp.waterfill(caps, 507).collect()}
    assert sum(r.allocation for r in rows2.values()) == 152
    assert (
        rows2["x"].allocation,
        rows2["y"].allocation,
        rows2["z"].allocation,
    ) == (51, 51, 50)


def test_waterfill_budget_exceeds_capacity(spark):
    caps = spark.createDataFrame(
        [("a", 5), ("b", 7)], "source string, capacity long"
    )
    rows = {r.source: r for r in sp.waterfill(caps, 1000).collect()}
    assert all(r.funded for r in rows.values())
    assert rows["a"].allocation == 5 and rows["b"].allocation == 7


# --------------------------------------------------------------- shards


def test_shards_partition_the_corpus_densely(spark, sf_dir):
    out = sp.global_shuffle_shards(spark, sf_dir)
    docs_n = load_table(spark, sf_dir, "documents").count()
    assert out.count() == docs_n
    assert out.select("doc_id").distinct().count() == docs_n
    # per-shard positions are dense 1..n_shard
    per = out.groupBy("shard_id").agg(
        F.count("*").alias("n"),
        F.max("shard_pos").alias("mx"),
        F.min("shard_pos").alias("mn"),
        F.countDistinct("shard_pos").alias("d"),
    )
    for r in per.collect():
        assert (r.mn, r.mx, r.d) == (1, r.n, r.n)


def test_shards_write_path_roundtrip(spark, sf_dir, tmp_path):
    """The production writer: ONE hash shuffle + per-partition sort, no
    global rank. Written shards must agree with the window-based plan on
    membership and relative order."""
    out = sp.global_shuffle_shards(spark, sf_dir)
    target = str(tmp_path / "shards")
    (
        out.select("doc_id", "shard_id", "shuffle_key")
        .repartition(sp.N_SHARDS, "shard_id")
        .sortWithinPartitions("shuffle_key", "doc_id")
        .write.partitionBy("shard_id")
        .mode("overwrite")
        .parquet(target)
    )
    back = spark.read.parquet(target)
    assert back.count() == out.count()
    # within each written shard file set, reading preserves the sort per
    # file; verify membership equality per shard against the planner
    plan = {
        (r.shard_id, r.doc_id) for r in out.select("shard_id", "doc_id").collect()
    }
    written = {
        (r.shard_id, r.doc_id) for r in back.select("shard_id", "doc_id").collect()
    }
    assert plan == written


def test_export_pipeline_manifest_reconciles(spark, sf_dir):
    """The (shard, lang) manifest must account for exactly the mixture
    selection, with token counts equal to the span-cleaned totals."""
    from youtube_api_batch_process_with_analytics_spark.operators.spans import (
        export_pipeline,
        remove_duplicate_spans,
    )

    manifest = export_pipeline(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    selected = sp.temperature_sample(docs)
    assert sum(r.n_docs for r in manifest) == selected.count()
    cleaned = {
        r.doc_id: r.n_tokens - r.n_tokens_removed
        for r in remove_duplicate_spans(docs).collect()
    }
    want_tokens = sum(cleaned[r.doc_id] for r in selected.select("doc_id").collect())
    assert sum(r.n_tokens for r in manifest) == want_tokens
    # the manifest's shard_id must be THE writer's assignment: regroup the
    # selection through global_shuffle_shards and compare per-cell counts
    shards = {
        r.doc_id: r.shard_id
        for r in sp.global_shuffle_shards(spark, sf_dir).collect()
    }
    from collections import Counter

    want_cells = Counter(
        (shards[r.doc_id], r.lang) for r in selected.collect()
    )
    got_cells = {(r.shard_id, r.lang): r.n_docs for r in manifest}
    assert got_cells == dict(want_cells)


def test_row_local_decisions_scale_invariant(spark):
    """THE 100-TB property of hash-based assignment: a document's split,
    sample bucket, and shard do not change when the corpus grows 10× —
    the testdata scales nest (sf0.001 ⊆ sf0.01), so the same doc_id must
    get byte-identical decisions at both scales."""
    from youtube_api_batch_process_with_analytics_spark.operators.chunking import (
        split_by_hash,
    )

    def decisions(sf):
        docs = load_table(spark, f"/root/testdata/sf{sf}", "documents")
        split = {
            r.doc_id: r.split for r in split_by_hash(docs.select("doc_id")).collect()
        }
        bucket = {
            r.doc_id: r.sample_bucket
            for r in sp.sample_corpus_hash(spark, f"/root/testdata/sf{sf}")
            .select("doc_id", "sample_bucket")
            .collect()
        }
        shard = {
            r.doc_id: r.shard_id
            for r in sp.global_shuffle_shards(spark, f"/root/testdata/sf{sf}")
            .select("doc_id", "shard_id")
            .collect()
        }
        return split, bucket, shard

    s_small, b_small, h_small = decisions("0.001")
    s_big, b_big, h_big = decisions("0.01")
    assert set(s_small) <= set(s_big)
    assert all(s_big[d] == v for d, v in s_small.items())
    # sample membership: a doc selected at one scale is selected at both
    assert all(b_big.get(d) == v for d, v in b_small.items() if d in b_big)
    assert set(b_small) == {d for d in b_big if d in s_small}
    assert all(h_big[d] == v for d, v in h_small.items())


def test_shards_deterministic_across_invocations(spark, sf_dir):
    a = sp.global_shuffle_shards(spark, sf_dir).collect()
    b = sp.global_shuffle_shards(spark, sf_dir).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
