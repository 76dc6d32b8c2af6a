"""Unit + plan tests for the sampling and ranking operators.

The oracle-differential coverage lives in tests/test_oracle_parity.py
(full queries() dict); these pin the semantic invariants the hash compare
cannot express — subset/exact-k properties, tie-break determinism, and
the 100-TB plan shapes (salted two-stage top-k, no distinct-expand).
"""

from __future__ import annotations

import math

from pyspark.sql import Window
from pyspark.sql import functions as F

from youtube_api_batch_process_with_analytics_spark.operators import (
    ranking as rk,
    sampling as sp,
)
from youtube_api_batch_process_with_analytics_spark.sources import load_table


def test_hash_sample_is_prefix_subset(spark, sf_dir):
    """Halving the threshold must select a strict subset of the same draw —
    the property that makes hash sampling composable across pipeline
    stages (re-sampling a sample never needs the original corpus)."""
    full = sp.sample_corpus_hash(spark, sf_dir)
    ids = {r.doc_id for r in full.collect()}
    tighter = {
        r.doc_id
        for r in full.filter(F.col("sample_bucket") < "20000000").collect()
    }
    assert tighter and tighter < ids


def test_hash_sample_rate_close_to_nominal(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    n, k = docs.count(), sp.sample_corpus_hash(spark, sf_dir).count()
    # md5 is uniform; at n=500 a 25% Bernoulli draw stays within ±6 sigma.
    sigma = math.sqrt(n * 0.25 * 0.75)
    assert abs(k - 0.25 * n) <= 6 * sigma


def test_stratified_exact_k_per_stratum(spark, sf_dir):
    got = (
        sp.stratified_sample(spark, sf_dir)
        .groupBy("lang")
        .agg(F.count("*").alias("k"), F.max("sample_rank").alias("max_rank"))
    )
    want = {
        r.lang: math.ceil(r.n * sp.STRAT_FRAC)
        for r in load_table(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    rows = got.collect()
    assert {r.lang: r.k for r in rows} == want
    assert all(r.max_rank == r.k for r in rows)


def test_stratified_two_stage_equals_single_window(spark, sf_dir):
    """The salted two-stage top-k must return exactly the single-window
    result (the oracle also recomputes it; this pins it Spark-side with
    the engine's own expressions)."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(
        F.ceil(F.count("*") * F.lit(sp.STRAT_FRAC)).alias("k")
    )
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.concat(F.lit(sp.STRAT_SALT), F.col("doc_id").cast("string"))),
        F.col("doc_id"),
    )
    ref = (
        docs.join(counts, "lang")
        .withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= F.col("k"))
    )
    got = {
        (r.lang, r.doc_id, r.sample_rank)
        for r in sp.stratified_sample(spark, sf_dir).collect()
    }
    assert got == {(r.lang, r.doc_id, r.r) for r in ref.collect()}


def test_stratified_stage1_is_salted(spark, sf_dir):
    """Plan pin: the first window must partition by (lang, salt), never by
    the stratum alone — the whole point of the two-stage shape is that no
    task ever sees a full stratum."""
    plan = sp.stratified_sample(spark, sf_dir)._jdf.queryExecution().toString()
    assert "_salt" in plan


def test_tfidf_rank_is_deterministic_and_bounded(spark, sf_dir):
    rows = rk.tfidf_top_terms(spark, sf_dir).collect()
    per_doc: dict[int, list] = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append(r)
    for doc_rows in per_doc.values():
        doc_rows.sort(key=lambda r: r.term_rank)
        assert [r.term_rank for r in doc_rows] == list(
            range(1, len(doc_rows) + 1)
        )
        assert len(doc_rows) <= rk.TOP_TERMS_PER_DOC
        # scores non-increasing; equal scores ordered by term ascending
        for a, b in zip(doc_rows, doc_rows[1:]):
            assert a.score > b.score or (
                a.score == b.score and a.term < b.term
            )


def test_tfidf_df_is_agg_of_agg_not_distinct(spark, sf_dir):
    """Document frequency must come from the already-aggregated (doc,term)
    frame — a COUNT(DISTINCT doc_id) over raw tokens would expand every
    token occurrence into the shuffle at 100 TB."""
    plan = (
        rk.tfidf_top_terms(spark, sf_dir)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "distinct" not in plan.lower()


def test_bm25_only_matching_docs_and_positive_scores(spark, sf_dir):
    rows = rk.bm25_search(spark, sf_dir).collect()
    assert 0 < len(rows) <= rk.BM25_TOP_K
    assert all(r.score > 0 for r in rows)
    assert all(1 <= r.n_terms_matched <= len(rk.BM25_QUERY_TERMS) for r in rows)
    # deterministic ordering: score desc, doc_id asc on ties
    for a, b in zip(rows, rows[1:]):
        assert a.score > b.score or (a.score == b.score and a.doc_id < b.doc_id)


def test_bm25_has_no_posting_list_explode(spark, sf_dir):
    """For a fixed small query set BM25 must compile to map-side array
    counters + one broadcast scalar aggregate — never a corpus-wide token
    explode feeding a posting-list join (that shape is tfidf_top_terms',
    where all terms are genuinely needed)."""
    plan = (
        rk.bm25_search(spark, sf_dir)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "Generate" not in plan, plan
    # exactly one join: the scalar corpus-constants broadcast
    assert plan.count("Join") == 1, plan


def test_bigram_lm_scores_are_probability_means(spark, sf_dir):
    """Each lm_score is a mean of Laplace-smoothed probabilities, so it
    must sit strictly inside (0, 1); n_bigrams must equal token_count - 1
    for every scored document."""
    rows = rk.bigram_lm_quality(spark, sf_dir).collect()
    assert rows
    assert all(0.0 < r.lm_score < 1.0 for r in rows)
    lens = {
        r.doc_id: r.n
        for r in load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.size(
                F.filter(
                    F.split(F.lower(F.col("text")), rk.TOKEN_SPLIT_RE),
                    lambda t: t != "",
                )
            ).alias("n"),
        )
        .collect()
    }
    assert all(r.n_bigrams == lens[r.doc_id] - 1 for r in rows)


def test_tokenizer_parity_spark_vs_duckdb(spark, duck):
    """The `[^a-z0-9]+` tokenizer is load-bearing for three gated queries
    (tfidf/bm25/bigram-LM): Spark's Java-regex split and DuckDB's RE2
    split must produce identical token arrays over adversarial ASCII —
    punctuation soup, digit runs, leading/trailing separators, empties."""
    from hypothesis import given, settings, strategies as st

    alphabet = st.characters(min_codepoint=32, max_codepoint=126)

    @settings(max_examples=6, deadline=None)
    @given(st.lists(st.text(alphabet=alphabet, max_size=40), min_size=1, max_size=24))
    def check(texts):
        sdf = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "i long, text string"
        )
        got = {
            r.i: r.toks
            for r in sdf.select(
                "i",
                F.filter(
                    F.split(F.lower(F.col("text")), rk.TOKEN_SPLIT_RE),
                    lambda t: t != "",
                ).alias("toks"),
            ).collect()
        }
        for i, t in enumerate(texts):
            want = duck.execute(
                "SELECT list_filter(regexp_split_to_array(lower(?), '[^a-z0-9]+'),"
                " t -> t <> '')",
                [t],
            ).fetchone()[0]
            assert got[i] == list(want), (t, got[i], want)

    check()


def test_tfidf_join_default_plain_salted_escape_hatch(spark, tmp_path):
    """Round 8: the DEFAULT tf ⋈ df join is a PLAIN equi-join — the df
    side is vocabulary-sized and AQE broadcasts it at runtime, which is
    skew-immune by construction (no reducer for a hot stopword to land
    on). The explicit salted form remains the escape hatch for the
    shuffle regime (vocabulary too large to broadcast, where AQE's
    OptimizeSkewedJoin provably never fires on aggregate-finalized
    inputs — operators/skew.py). Pin (a) the default plan carries NO
    salt, (b) the salted=True plan does, and (c) both produce identical
    rows on a hot-term fixture."""
    import random

    rng = random.Random(11)
    rows = [
        (
            i,
            "hotword " * 20
            + " ".join(
                rng.choice("qrstuvwxyz") + str(rng.randint(0, 9999))
                for _ in range(10)
            ),
            "en",
            "web",
            100,
        )
        for i in range(500)
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(2).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    out = rk.tfidf_top_terms(spark, str(tmp_path), memo=False)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "_salt" not in plan, plan[:3000]

    got = {(r.doc_id, r.term, r.tf, r.df, r.score, r.term_rank)
           for r in out.collect()}

    salted = rk.tfidf_top_terms(spark, str(tmp_path), salted=True, memo=False)
    salted_plan = salted._jdf.queryExecution().optimizedPlan().toString()
    assert "_salt" in salted_plan, salted_plan[:3000]
    got_salted = {
        (r.doc_id, r.term, r.tf, r.df, r.score, r.term_rank)
        for r in salted.collect()
    }
    assert got_salted == got
    # unsalted reference built from the same internals
    from youtube_api_batch_process_with_analytics_spark.sources import (
        load_table as lt,
    )

    docs = lt(spark, str(tmp_path), "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), rk.TOKEN_SPLIT_RE),
                lambda t: t != "",
            )
        ).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = docs.count()
    scored = tf.join(dfreq, "term").withColumn(
        "score",
        F.round(
            F.col("tf")
            * ((F.lit(n) - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))),
            6,
        ),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    ref = {
        (r.doc_id, r.term, r.tf, r.df, r.score, r.term_rank)
        for r in scored.withColumn("term_rank", F.row_number().over(w))
        .filter(F.col("term_rank") <= rk.TOP_TERMS_PER_DOC)
        .collect()
    }
    assert got == ref


def test_repetition_stats_flag_degenerate_docs(spark, tmp_path):
    """Gopher-style repetition ratios: a degenerate all-same-token doc
    maxes out every ratio; an all-unique doc zeroes the token/trigram
    ratios; ratios live in [0, 1]."""
    from youtube_api_batch_process_with_analytics_spark.operators.text_analysis import (
        doc_repetition_stats,
    )

    rows = [
        (1, "spam " * 50, "en", "web", 100),
        (2, " ".join(f"w{i}" for i in range(50)), "en", "web", 100),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {r.doc_id: r for r in doc_repetition_stats(spark, str(tmp_path)).collect()}
    spam, uniq = got[1], got[2]
    assert spam.token_dup_ratio == 0.98  # 1 - 1/50
    assert spam.trigram_dup_ratio > 0.97
    assert spam.mode_token_share == 1.0
    assert uniq.token_dup_ratio == 0.0
    assert uniq.trigram_dup_ratio == 0.0
    assert uniq.mode_token_share == 0.02  # 1/50


def test_ranking_ops_tolerate_null_text(spark, tmp_path):
    """NULL text must behave as zero tokens everywhere (coalesce at the
    tokenizer), never as size(NULL) = -1 poisoning dl/avgdl or dropping
    into NULL scores."""
    rows = [
        (1, "spark hash window spark", "en", "web", 100),
        (2, None, "en", "web", 0),
        (3, "plain words here", "en", "web", 100),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    top = rk.tfidf_top_terms(spark, str(tmp_path)).collect()
    assert {r.doc_id for r in top} == {1, 3}  # null doc yields no terms
    hits = rk.bm25_search(spark, str(tmp_path)).collect()
    assert [r.doc_id for r in hits] == [1] and all(
        r.score > 0 for r in hits
    )  # avgdl counted the null doc as dl=0, not -1
    lm = rk.bigram_lm_quality(spark, str(tmp_path)).collect()
    assert {r.doc_id for r in lm} == {1, 3}


def test_winnowing_shared_substring_shares_fingerprint(spark, tmp_path):
    """The winnowing guarantee: any common substring of length >= k+w-1
    chars must produce at least one common selected fingerprint between
    the two documents; disjoint texts share none."""
    from youtube_api_batch_process_with_analytics_spark.operators.text_analysis import (
        WINNOW_K,
        WINNOW_W,
        winnowing_fingerprints,
    )

    shared = "the quick brown fox jumps over the lazy dog again"
    assert len(shared) >= WINNOW_K + WINNOW_W - 1
    rows = [
        (1, "prefix one " + shared + " suffix alpha", "en", "web", 100),
        (2, "totally different lead " + shared + " tail omega", "en", "web", 100),
        (3, "zz qq xx vv kk jj ww yy uu ii oo pp mm nn bb cc dd", "en", "web", 100),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    # Python model of the same normalization + winnowing selection
    docs = spark.read.parquet(str(tmp_path / "documents.parquet"))
    norm = F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "))
    fps = {}
    for r in docs.select("doc_id", norm.alias("norm")).collect():
        hs = []
        s = r.norm
        import hashlib

        for i in range(len(s) - WINNOW_K + 1):
            hs.append(hashlib.md5(s[i : i + WINNOW_K].encode()).hexdigest())
        mins = {
            min(hs[j : j + WINNOW_W]) for j in range(len(hs) - WINNOW_W + 1)
        }
        fps[r.doc_id] = mins
    assert fps[1] & fps[2]
    assert not (fps[1] & fps[3]) and not (fps[2] & fps[3])
    # and the gated summary agrees with the Python model per doc
    got = {r.doc_id: r for r in winnowing_fingerprints(spark, str(tmp_path)).collect()}
    for d, mins in fps.items():
        assert got[d].n_fingerprints == len(mins)
        assert got[d].fp_min == min(mins) and got[d].fp_max == max(mins)


def test_aqe_skew_split_does_not_fire_on_agg_fed_join(spark):
    """Canary for the documented claim (README/skew.py): AQE's
    OptimizeSkewedJoin never fires when a join input derives from an
    aggregate, even with forced thresholds — the reason the tf ⋈ df
    joins salt explicitly. If a Spark upgrade makes this split (the
    assertion fails), revisit the salting docs and consider dropping the
    manual salt. Contrast test_scale_plans.py's LSH test, where the same
    configs DO split a scan-fed join."""
    import random

    rng = random.Random(3)
    data = [
        (i, "hot" if i % 2 == 0 else "c" + str(rng.randint(0, 2000)))
        for i in range(20000)
    ]
    base = spark.createDataFrame(data, "doc_id long, term string")
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.forceOptimizeSkewedJoin",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2KB"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1KB")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        tf = base.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
        dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
        j = tf.join(dfreq, "term")
        j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" not in plan, (
            "AQE now splits aggregate-fed joins — update the salting "
            "rationale in operators/skew.py, ranking.py, and README"
        )
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_normalization_parity_spark_vs_duckdb(spark, duck):
    """The trim + whitespace-collapse + lower normalization feeds both
    fingerprint operators (doc_fingerprint, winnowing_fingerprints);
    Spark's Java regexp_replace and DuckDB's RE2 'g'-flag replace must
    agree bytewise over adversarial ASCII whitespace soup. Java's \\s
    includes \\x0b, RE2's does NOT — this test found that divergence, so
    every oracle now spells the class out as [\\t\\n\\x0b\\f\\r ] (the
    exact Java set) instead of \\s."""
    from hypothesis import given, settings, strategies as st

    alphabet = st.characters(
        min_codepoint=32, max_codepoint=126, include_characters="\t\n\x0b\f\r"
    )

    @settings(max_examples=6, deadline=None)
    @given(st.lists(st.text(alphabet=alphabet, max_size=40), min_size=1, max_size=16))
    def check(texts):
        sdf = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "i long, text string"
        )
        got = {
            r.i: r.norm
            for r in sdf.select(
                "i",
                F.lower(
                    F.regexp_replace(F.trim(F.col("text")), r"\s+", " ")
                ).alias("norm"),
            ).collect()
        }
        for i, t in enumerate(texts):
            want = duck.execute(
                r"SELECT lower(regexp_replace(trim(?),"
                r" '[\t\n\x0b\f\r ]+', ' ', 'g'))",
                [t],
            ).fetchone()[0]
            assert got[i] == want, (repr(t), repr(got[i]), repr(want))

    check()


def test_vertical_tab_documents_hash_match_oracle(spark, tmp_path):
    """End-to-end pin of the Java-\\s vs RE2-\\s fix: documents containing
    vertical tabs (\\x0b — in Java's \\s but not RE2's) must fingerprint
    identically on both engines through the gated operator and its
    oracle."""
    import duckdb

    from tests.oracle_utils import assert_oracle_match
    from youtube_api_batch_process_with_analytics_spark.operators.text_analysis import (
        ORACLES,
        doc_fingerprint,
    )

    rows = [
        (1, "alpha\x0bbeta  gamma", "en", "web", 20),
        (2, "alpha beta gamma", "en", "web", 16),
        (3, "\x0b\x0bonly vtabs\x0b", "en", "web", 12),
    ]
    path = str(tmp_path / "documents.parquet")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(path)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{path}/*.parquet'")
    assert_oracle_match(
        doc_fingerprint(spark, str(tmp_path)), con, ORACLES["doc_fingerprint"]
    )
    # doc 1 and 2 normalize to the same content → same fingerprint
    fps = {r.doc_id: r.fingerprint for r in doc_fingerprint(spark, str(tmp_path)).collect()}
    assert fps[1] == fps[2]


def test_dsir_weights_match_pure_python_reference(spark, sf_dir):
    """DSIR importance weights vs an INDEPENDENT pure-Python reference
    (hashlib md5 + Counter arithmetic — no Spark, no DuckDB): tokenize,
    hash into 1024 buckets, fit raw/target counts, smooth, and fold the
    per-doc integer means exactly as the operator's contract states."""
    import hashlib
    import re as _re
    from collections import Counter

    import pyarrow.parquet as pq

    from youtube_api_batch_process_with_analytics_spark.operators import (
        sampling as S,
    )

    B, target = S.DSIR_BUCKETS, S.DSIR_TARGET_LANG
    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    ).to_pylist()
    doc_bucket: dict = {}
    cr: Counter = Counter()
    ct: Counter = Counter()
    for row in docs:
        toks = [
            t
            for t in _re.split(r"[^a-z0-9]+", (row["text"] or "").lower())
            if t
        ]
        for t in toks:
            h = hashlib.md5((S.DSIR_SALT + t).encode()).hexdigest()[:8]
            b = int(h, 16) % B
            doc_bucket.setdefault(row["doc_id"], Counter())[b] += 1
            cr[b] += 1
            if row["lang"] == target:
                ct[b] += 1
    nr, nt = sum(cr.values()), sum(ct.values())
    # HALF_UP like Spark's F.round / DuckDB's ROUND (Python round() is
    # banker's); all values positive
    ratio = {
        b: math.floor(
            (ct[b] + 1.0) * (nr + B) * 1e6 / ((cr[b] + 1.0) * (nt + B)) + 0.5
        )
        for b in cr
    }
    weights = {}
    for d, bc in doc_bucket.items():
        n = sum(bc.values())
        w = sum(c * ratio[b] for b, c in bc.items())
        weights[d] = (n, w // n)
    wmax = max(w for _, w in weights.values())
    expected = {}
    for d, (n, w) in weights.items():
        draw = int(
            hashlib.md5(
                (S.DSIR_DRAW_SALT + str(d)).encode()
            ).hexdigest()[:8],
            16,
        )
        expected[d] = (n, w, draw * wmax < w * S._DRAW_SPACE)

    got = {
        r["doc_id"]: (r["n_tokens"], r["avg_ratio_ppm"], r["selected"])
        for r in S.dsir_importance_weights(spark, sf_dir).collect()
    }
    assert got == expected
    # the argmax-weight doc is always kept; selection is non-trivial
    sel = [v[2] for v in got.values()]
    assert any(sel)
    assert all(v[2] for v in got.values() if v[1] == wmax)


def test_perplexity_bucket_invariants(spark, sf_dir):
    """Structural invariants of the CCNet-style split: buckets partition
    the corpus exactly; score ranges are strictly ordered tail < middle
    < head (ties fall to the LOWER bucket, so ranges never overlap); the
    tail holds at least ceil(n/3) scored docs; 'unscored' is exactly the
    <2-token documents."""
    from youtube_api_batch_process_with_analytics_spark.operators import (
        ranking as R,
    )

    rows = R.perplexity_buckets(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    assert sum(r.n_docs for r in rows) == docs.count()

    agg: dict = {}
    for r in rows:
        a = agg.setdefault(r.bucket, {"n": 0, "mn": None, "mx": None})
        a["n"] += r.n_docs
        # 'unscored' rows carry sentinel 0 aggregates (coalesced so the
        # output columns stay non-nullable) — exclude them from ranges
        if r.bucket != "unscored":
            a["mn"] = (
                r.min_score_micro
                if a["mn"] is None
                else min(a["mn"], r.min_score_micro)
            )
            a["mx"] = (
                r.max_score_micro
                if a["mx"] is None
                else max(a["mx"], r.max_score_micro)
            )
    if "tail" in agg and "middle" in agg:
        assert agg["tail"]["mx"] < agg["middle"]["mn"]
    if "middle" in agg and "head" in agg:
        assert agg["middle"]["mx"] < agg["head"]["mn"]

    n_scored = sum(v["n"] for k, v in agg.items() if k != "unscored")
    if n_scored >= 3:
        assert agg["tail"]["n"] >= (n_scored + 2) // 3

    n_short = docs.filter(
        F.size(
            F.filter(
                F.split(
                    F.lower(F.coalesce("text", F.lit(""))), "[^a-z0-9]+"
                ),
                lambda t: t != "",
            )
        )
        < 2
    ).count()
    assert agg.get("unscored", {"n": 0})["n"] == n_short


def test_new_ops_random_corpus_differential(spark, tmp_path):
    """Seeded-random corpus differential for the round-6 operators:
    beyond the fixed hostile classes, a deterministic RNG draws 300
    documents with adversarial shapes (empty/NULL/whitespace text,
    single-token docs, heavy token repetition, punctuation-boundary
    soup, NULL langs) and 300 embeddings including invalid rows
    (NULL / wrong-dim / all-zero vectors) — then perplexity_buckets,
    dsir_importance_weights, and cluster_balanced_sample must
    hash-match their DuckDB twins on that corpus."""
    import random

    import duckdb

    from tests.oracle_utils import assert_oracle_match
    from youtube_api_batch_process_with_analytics_spark.operators import (
        clustering as C,
    )
    from youtube_api_batch_process_with_analytics_spark.operators import (
        ranking as R,
    )
    from youtube_api_batch_process_with_analytics_spark.operators import (
        sampling as S,
    )

    rng = random.Random(20260815)
    vocab = (
        ["spark", "hash", "the", "a", "data", "x1", "42", "join"]
        + [f"w{i}" for i in range(40)]
    )
    seps = [" ", "  ", "-", ", ", ".", "\t"]
    langs = ["en", "de", "zh", None]

    docs = []
    for i in range(300):
        shape = rng.random()
        if shape < 0.05:
            text = None
        elif shape < 0.10:
            text = rng.choice(["", "   ", "...", "- -"])
        elif shape < 0.20:
            text = rng.choice(vocab)  # single token -> unscored by the LM
        elif shape < 0.30:
            text = (" " + rng.choice(vocab)) * rng.randint(2, 40)  # repetition
        else:
            n = rng.randint(2, 50)
            text = "".join(
                rng.choice(vocab) + rng.choice(seps) for _ in range(n)
            )
        docs.append(
            (i, text, rng.choice(langs), f"src{rng.randint(1, 5)}",
             len(text) if text else 0)
        )
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    dim = 64
    embs = []
    for i in range(300):
        shape = rng.random()
        if shape < 0.04:
            vec = None
        elif shape < 0.08:
            vec = [0.0] * dim  # zero vector -> dropped by valid_embeddings
        elif shape < 0.12:
            vec = [round(rng.uniform(-1, 1), 3)] * 7  # wrong dimension
        else:
            vec = [round(rng.uniform(-1, 1), 3) for _ in range(dim)]
        embs.append((i, vec, rng.randint(0, 7)))
    spark.createDataFrame(
        embs, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))

    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{tmp_path}/{t}.parquet/*.parquet'"
        )
    sf = str(tmp_path)
    assert_oracle_match(
        R.perplexity_buckets(spark, sf), con, R.ORACLE_PERPLEXITY_BUCKETS
    )
    assert_oracle_match(
        S.dsir_importance_weights(spark, sf),
        con,
        S.ORACLE_DSIR_IMPORTANCE_WEIGHTS,
    )
    assert_oracle_match(
        C.cluster_balanced_sample(spark, sf),
        con,
        C.oracle_cluster_balanced_sample(),
    )


def test_dsir_accept_expression_exact_at_extreme_weights(spark, duck):
    """The resampling accept/reject comparison must stay EXACT when the
    BIGINT product draw·wmax or weight·2^32 would overflow int64 (weights
    can reach ~1e17 ppm when the target domain is vanishingly rare at
    100 TB scale): Spark decimal(20,0) products vs DuckDB HUGEINT
    products must agree row-for-row, including the exact-boundary case
    draw·wmax == weight·2^32 (strict <, so NOT selected)."""
    rows = [
        # (draw, w, wmax) — draw in [0, 2^32)
        (0, 10**17, 10**17),              # smallest draw, huge equal weights
        (2**32 - 1, 10**17, 10**17),      # largest draw: 2^32-1 < 2^32 -> kept
        (2**31, 2**31, 2**32),            # exact boundary: equal -> NOT kept
        (2**31 - 1, 2**31, 2**32),        # one below boundary -> kept
        (123456789, 987654321987654321, 999999999999999999),
        (4294967295, 1, 10**17),          # tiny weight vs max draw -> dropped
    ]
    sdf = spark.createDataFrame(rows, "draw long, w long, wmax long")
    got = [
        tuple(r)
        for r in sdf.select(
            "draw",
            "w",
            "wmax",
            (
                F.col("draw").cast("decimal(20,0)")
                * F.col("wmax").cast("decimal(20,0)")
                < F.col("w").cast("decimal(20,0)")
                * F.lit(4294967296).cast("decimal(20,0)")
            ).alias("selected"),
        ).collect()
    ]
    want = [
        (d, w, m, d * m < w * 4294967296) for d, w, m in rows
    ]
    assert sorted(got) == sorted(want)
    for d, w, m, sel in want:
        dd = duck.execute(
            f"SELECT CAST({d} AS HUGEINT) * {m} < CAST({w} AS HUGEINT) * 4294967296"
        ).fetchone()[0]
        assert dd == sel, (d, w, m)


def test_dsir_weight_rollup_exact_beyond_int64(spark, duck):
    """The per-doc weight accumulator must stay exact where int64
    Σ cnt·ratio overflows: decimal products on Spark vs HUGEINT on
    DuckDB, identical means. doc 1's products sum to ~2.4e19 (> 2^63)."""
    from youtube_api_batch_process_with_analytics_spark.operators.sampling import (
        _dsir_weight_rollup,
    )

    rows = [
        (1, 120, 10**17),   # 1.2e19 alone — would wrap an int64 sum
        (1, 120, 10**17),
        (1, 3, 5),
        (2, 7, 10**6),      # ordinary magnitude: must equal the int64 path
    ]
    joined = spark.createDataFrame(
        rows, "doc_id long, cnt long, ratio_ppm long"
    )
    got = {
        r.doc_id: (r.n_tokens, r.avg_ratio_ppm)
        for r in _dsir_weight_rollup(joined).collect()
    }
    want = {}
    for d in {r[0] for r in rows}:
        n = sum(c for dd, c, _ in rows if dd == d)
        w = sum(c * p for dd, c, p in rows if dd == d)
        want[d] = (n, w // n)
    assert got == want
    for d, (n, avg) in want.items():
        dd = duck.execute(
            f"""SELECT CAST(SUM(CAST(cnt AS HUGEINT) * ratio_ppm) / 1 AS HUGEINT)
                       // SUM(cnt)
                FROM (VALUES {", ".join(f"({r[0]},{r[1]},{r[2]})" for r in rows if r[0] == d)})
                     t(doc_id, cnt, ratio_ppm)"""
        ).fetchone()[0]
        assert int(dd) == avg


def test_salted_topk_rejects_colliding_columns(spark):
    """Shared-infrastructure guard (round-6 advice): withColumn silently
    replaces same-named columns, so a caller frame already carrying a
    temp/rank name must fail loudly instead of ranking over corrupted
    data."""
    import pytest
    from pyspark.sql import functions as F

    from youtube_api_batch_process_with_analytics_spark.operators.sampling import (
        salted_two_stage_topk,
    )

    base = spark.range(10).selectExpr("id", "id % 2 AS g")
    for bad in ("_salt", "_r1", "sample_rank"):
        df = base.withColumn(bad, F.lit(0))
        with pytest.raises(ValueError, match=bad):
            salted_two_stage_topk(
                df, ["g"], F.lit(3), [F.col("id").asc()], F.col("id")
            )
    # a non-colliding rank_name on the same frame is fine
    out = salted_two_stage_topk(
        base, ["g"], F.lit(3), [F.col("id").asc()], F.col("id"),
        rank_name="rk",
    )
    assert out.count() == 6
