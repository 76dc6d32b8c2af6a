"""Text-analysis operators for training-data pipelines (SURVEY.md §7.1 M7).

Beyond the reference surface: language-ID (marker-word heuristic), quality
scoring (length/punct/stopword ratios), token counting (whitespace + a
BPE-ish regex), and document fingerprinting — all over ``documents``.

Everything is a native Column expression (regexp + array lambdas) — no
Python UDFs, so at 100 TB these run inside whole-stage codegen directly on
the parquet scan with zero shuffles (per-document map-only work). Oracles
use the same regex/list primitives in DuckDB with identical semantics
(note DuckDB ``regexp_replace`` needs the 'g' flag; Spark is global by
default).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table, spread
from .memo import session_frame

STOPWORDS = ("the", "a", "and", "of", "to", "in", "is")

# marker-word sets for the language-ID heuristic (deterministic argmax with
# fixed preference order en > es > de > fr on ties)
LANG_MARKERS = {
    "en": ("the", "a", "and", "of", "to"),
    "es": ("el", "la", "los", "de", "y", "que"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "les", "et", "est"),
}

PUNCT_CLASS = "[^.,!?;:]"
BPE_TOKEN_RE = r"\w+|[^\w\s]"
# DuckDB twin of BPE_TOKEN_RE: RE2's \s lacks \x0b (vertical tab), so the
# oracle spells out the exact Java \s class (same fix as the tokenizer split)
BPE_TOKEN_RE_DUCK = r"\w+|[^\w\t\n\x0b\f\r ]"


def _tokens(col: str = "text"):
    # coalesce first: NULL text must behave exactly like '' (split -> [''])
    # on BOTH engines; bare split(trim(NULL)) gives a NULL array whose
    # size() is -1 with ANSI off — the cross-engine divergence the hostile-
    # corpus differential (tests/test_hostile_corpus.py) exists to catch.
    return F.split(F.trim(F.coalesce(F.col(col), F.lit(""))), r"\s+")


def _marker_hits(lang: str):
    markers = ", ".join(f"'{m}'" for m in LANG_MARKERS[lang])
    return F.expr(
        f"size(filter(split(trim(coalesce(text, '')), '\\\\s+'),"
        f" t -> array_contains(array({markers}), t)))"
    ).cast("long")


def doc_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring + token counting per document.

    Token counts (whitespace + BPE-ish regex), punctuation ratio, stopword
    ratio, average token length, and a pure-arithmetic quality score
    (no transcendental functions — those differ across libms and would
    break oracle determinism).
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    stop = ", ".join(f"'{s}'" for s in STOPWORDS)
    n_tokens = F.size(_tokens()).cast("long")
    n_tokens_bpe = F.size(F.regexp_extract_all(F.coalesce(F.col("text"), F.lit("")), F.lit(BPE_TOKEN_RE), 0)).cast("long")
    n_chars = F.length(F.coalesce(F.col("text"), F.lit(""))).cast("long")
    punct_ratio = F.round(
        F.try_divide(
            F.length(F.regexp_replace(F.coalesce(F.col("text"), F.lit("")), PUNCT_CLASS, "")),
            n_chars,
        ), 6
    )
    stopword_hits = F.expr(
        f"size(filter(split(trim(coalesce(text, '')), '\\\\s+'),"
        f" t -> array_contains(array({stop}), t)))"
    ).cast("long")
    stopword_ratio = F.round(F.try_divide(stopword_hits, n_tokens), 6)
    avg_token_len = F.round(
        F.try_divide(
            F.length(F.regexp_replace(F.coalesce(F.col("text"), F.lit("")), r"\s+", "")),
            n_tokens,
        ), 6
    )
    quality = F.round(
        0.5 * F.least(n_tokens / F.lit(100.0), F.lit(1.0))
        + 0.3 * (1.0 - punct_ratio)
        + 0.2 * F.least(stopword_ratio * 5.0, F.lit(1.0)),
        6,
    )
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        n_tokens_bpe.alias("n_tokens_bpe"),
        n_chars.alias("n_chars_obs"),
        punct_ratio.alias("punct_ratio"),
        stopword_ratio.alias("stopword_ratio"),
        avg_token_len.alias("avg_token_len"),
        quality.alias("quality_score"),
    )


ORACLE_DOC_TEXT_STATS = f"""
WITH t AS (
  SELECT doc_id, coalesce(text, '') AS text,
         regexp_split_to_array(trim(coalesce(text, '')), '[\\t\\n\\x0b\\f\\r ]+') AS toks,
         LENGTH(coalesce(text, '')) AS n_chars_obs
  FROM documents
),
m AS (
  SELECT doc_id,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         CAST(len(regexp_extract_all(text, '{BPE_TOKEN_RE_DUCK}')) AS BIGINT)
           AS n_tokens_bpe,
         CAST(n_chars_obs AS BIGINT) AS n_chars_obs,
         ROUND(LENGTH(regexp_replace(text, '{PUNCT_CLASS}', '', 'g'))
               / n_chars_obs, 6) AS punct_ratio,
         ROUND(CAST(len(list_filter(toks,
                 t -> list_contains({list(STOPWORDS)}, t))) AS BIGINT)
               / len(toks), 6) AS stopword_ratio,
         ROUND(LENGTH(regexp_replace(text, '[\\t\\n\\x0b\\f\\r ]+', '', 'g')) / len(toks), 6)
           AS avg_token_len
  FROM t
)
SELECT doc_id, n_tokens, n_tokens_bpe, n_chars_obs, punct_ratio,
       stopword_ratio, avg_token_len,
       ROUND(0.5 * LEAST(n_tokens / 100.0, 1.0)
             + 0.3 * (1.0 - punct_ratio)
             + 0.2 * LEAST(stopword_ratio * 5.0, 1.0), 6) AS quality_score
FROM m ORDER BY doc_id
"""


def language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language-ID heuristic with a deterministic argmax.

    Per document: count marker-word hits for each candidate language,
    predict the argmax (preference order en > es > de > fr on ties,
    'unknown' when nothing matches), plus a confidence share.
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    s_en, s_es = _marker_hits("en"), _marker_hits("es")
    s_de, s_fr = _marker_hits("de"), _marker_hits("fr")
    total = s_en + s_es + s_de + s_fr
    predicted = (
        F.when(total == 0, F.lit("unknown"))
        .when((s_en >= s_es) & (s_en >= s_de) & (s_en >= s_fr), F.lit("en"))
        .when((s_es >= s_de) & (s_es >= s_fr), F.lit("es"))
        .when(s_de >= s_fr, F.lit("de"))
        .otherwise(F.lit("fr"))
    )
    best = F.greatest(s_en, s_es, s_de, s_fr)
    return docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        s_en.alias("score_en"),
        s_es.alias("score_es"),
        s_de.alias("score_de"),
        s_fr.alias("score_fr"),
        predicted.alias("predicted_lang"),
        F.when(total > 0, F.round(best / total * 100.0, 1))
        .otherwise(F.lit(0.0))
        .alias("confidence"),
    )


def _duck_markers(lang: str) -> str:
    return (
        f"CAST(len(list_filter(toks, t -> list_contains("
        f"{list(LANG_MARKERS[lang])}, t))) AS BIGINT)"
    )


ORACLE_LANGUAGE_ID = f"""
WITH t AS (
  SELECT doc_id, lang, regexp_split_to_array(trim(coalesce(text, '')), '[\\t\\n\\x0b\\f\\r ]+') AS toks
  FROM documents
),
s AS (
  SELECT doc_id, lang AS labeled_lang,
         {_duck_markers("en")} AS score_en,
         {_duck_markers("es")} AS score_es,
         {_duck_markers("de")} AS score_de,
         {_duck_markers("fr")} AS score_fr
  FROM t
)
SELECT doc_id, labeled_lang, score_en, score_es, score_de, score_fr,
       CASE WHEN score_en + score_es + score_de + score_fr = 0 THEN 'unknown'
            WHEN score_en >= score_es AND score_en >= score_de
                 AND score_en >= score_fr THEN 'en'
            WHEN score_es >= score_de AND score_es >= score_fr THEN 'es'
            WHEN score_de >= score_fr THEN 'de'
            ELSE 'fr' END AS predicted_lang,
       CASE WHEN score_en + score_es + score_de + score_fr > 0
            THEN ROUND(GREATEST(score_en, score_es, score_de, score_fr)
                       / (score_en + score_es + score_de + score_fr)
                       * 100.0, 1)
            ELSE 0.0 END AS confidence
FROM s ORDER BY doc_id
"""


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: md5 of whitespace-normalized lowercase text
    (content hash), plus a coarse 8-hex-char prefix usable as a routing/
    blocking key. Map-only; identical md5 on both engines.
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    normalized = F.lower(
        F.regexp_replace(F.trim(F.coalesce(F.col("text"), F.lit(""))), r"\s+", " ")
    )
    fp = F.md5(normalized)
    return docs.select(
        "doc_id",
        fp.alias("fingerprint"),
        F.substring(fp, 1, 8).alias("fingerprint_prefix"),
        F.length(normalized).cast("long").alias("normalized_len"),
    )


ORACLE_DOC_FINGERPRINT = """
WITH n AS (
  SELECT doc_id,
         md5(lower(regexp_replace(trim(coalesce(text, '')), '[\\t\\n\\x0b\\f\\r ]+', ' ', 'g'))) AS fingerprint,
         LENGTH(lower(regexp_replace(trim(coalesce(text, '')), '[\\t\\n\\x0b\\f\\r ]+', ' ', 'g'))) AS nl
  FROM documents
)
SELECT doc_id, fingerprint,
       substr(fingerprint, 1, 8) AS fingerprint_prefix,
       CAST(nl AS BIGINT) AS normalized_len
FROM n ORDER BY doc_id
"""


QUALITY_KEEP = 0.8
LANG_KEEP = ("en", "de", "fr")


def corpus_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end curation pipeline a training-data job runs, as one
    query: quality gate → language keep-list → exact dedup survivorship,
    with per-source funnel counts.

    Composition of the engine's own operators: the `doc_text_stats`
    quality score, the `lang` keep-list filter, and first-occurrence
    exact dedup (md5(text) window, lowest doc_id survives — the
    `dedup_exact` rule). Scale shape: one window shuffle on the content
    hash + one partial-aggregable groupBy(source); flags are conditional
    sums, so every stage count comes out of a single pass rather than
    re-scanning the corpus per stage (the usual funnel anti-pattern).
    (The fixture corpus contains no exact duplicate texts, so the dedup
    stage passes survivors through — the window is still computed and the
    oracle mirrors it, so the stage is verified, not skipped.)
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    n_tokens = F.size(_tokens()).cast("long")
    n_chars = F.length(F.coalesce(F.col("text"), F.lit(""))).cast("long")
    punct_ratio = F.round(
        F.try_divide(
            F.length(F.regexp_replace(F.coalesce(F.col("text"), F.lit("")), PUNCT_CLASS, "")),
            n_chars,
        ), 6
    )
    stop = ", ".join(f"'{s}'" for s in STOPWORDS)
    stopword_hits = F.expr(
        f"size(filter(split(trim(coalesce(text, '')), '\\\\s+'),"
        f" t -> array_contains(array({stop}), t)))"
    ).cast("long")
    stopword_ratio = F.round(F.try_divide(stopword_hits, n_tokens), 6)
    quality = F.round(
        0.5 * F.least(n_tokens / F.lit(100.0), F.lit(1.0))
        + 0.3 * (1.0 - punct_ratio)
        + 0.2 * F.least(stopword_ratio * 5.0, F.lit(1.0)),
        6,
    )
    w = Window.partitionBy(
        F.md5(F.coalesce(F.col("text"), F.lit("")))
    ).orderBy("doc_id")
    flagged = docs.select(
        "source",
        quality.alias("q"),
        F.col("lang"),
        (F.row_number().over(w) == 1).alias("is_first"),
    ).select(
        "source",
        (F.col("q") >= QUALITY_KEEP).alias("pass_q"),
        F.col("lang").isin(*LANG_KEEP).alias("pass_l"),
        "is_first",
    )
    c = lambda col: F.sum(F.when(col, 1).otherwise(0)).cast("long")  # noqa: E731
    return (
        flagged.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            c(F.col("pass_q")).alias("pass_quality"),
            c(F.col("pass_q") & F.col("pass_l")).alias("pass_quality_lang"),
            c(F.col("pass_q") & F.col("pass_l") & F.col("is_first")).alias(
                "kept"
            ),
        )
    )


ORACLE_CORPUS_CURATION_FUNNEL = f"""
WITH t AS (
  SELECT doc_id, coalesce(text, '') AS text, lang, source,
         regexp_split_to_array(trim(coalesce(text, '')), '[\\t\\n\\x0b\\f\\r ]+') AS toks,
         LENGTH(coalesce(text, '')) AS n_chars
  FROM documents
),
scored AS (
  SELECT source, lang, doc_id, text,
         ROUND(0.5 * LEAST(len(toks) / 100.0, 1.0)
               + 0.3 * (1.0 - ROUND(LENGTH(regexp_replace(text,
                     '{PUNCT_CLASS}', '', 'g')) / n_chars, 6))
               + 0.2 * LEAST(ROUND(CAST(len(list_filter(toks,
                     x -> list_contains({list(STOPWORDS)}, x))) AS BIGINT)
                     / len(toks), 6) * 5.0, 1.0), 6) AS q,
         row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1
           AS is_first
  FROM t
),
flagged AS (
  SELECT source,
         q >= {QUALITY_KEEP} AS pass_q,
         lang IN {LANG_KEEP} AS pass_l,
         is_first
  FROM scored
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN pass_q THEN 1 ELSE 0 END) AS BIGINT) AS pass_quality,
       CAST(SUM(CASE WHEN pass_q AND pass_l THEN 1 ELSE 0 END) AS BIGINT)
         AS pass_quality_lang,
       CAST(SUM(CASE WHEN pass_q AND pass_l AND is_first THEN 1 ELSE 0 END)
            AS BIGINT) AS kept
FROM flagged GROUP BY source ORDER BY source
"""


# PII patterns for redaction. Email reuses the extractor's pattern
# (functions/text.py EMAIL_PATTERN ← youtube_api_handler.py:854) so what the
# reference surfaces is exactly what the pipeline can scrub. Phone is tuned
# for precision over recall — destructive rewriting must not eat dates,
# IPs, decimals, or year ranges, so a match needs phone-shaped structure:
# a +country or (area) prefix, or ≥3 digit groups of 3-4 joined by space/
# dash. Two-group shapes without a prefix ('1992-2003') and short-group
# shapes ('2024-03-07', '192.168.0.1' — '.' is not a separator here) stay.
PII_PHONE_PATTERN = (
    r"(?:\+\d{1,3}[ -]?)?\(\d{1,4}\)[ -]?\d{3,4}[ -]?\d{3,6}"
    r"|\+\d{1,3}[ -]?\d{3,4}[ -]?\d{3,6}(?:[ -]\d{3,4})?"
    r"|\d{3,4}[ -]\d{3,4}[ -]\d{3,6}"
)


def redact_pii(
    text,
    email_token: str = "[EMAIL]",
    phone_token: str = "[PHONE]",
):
    """Scrub emails and phone-like digit runs from a text Column.

    The redaction twin of P6's extractor: pipelines that *surface* contact
    emails in analytics must also be able to *remove* them before text
    becomes training data. Pure regexp_replace — map-only, codegen'd, no
    UDF; order matters (emails first, or their digit runs half-match the
    phone pattern).
    """
    from ..functions.text import EMAIL_PATTERN

    cleaned = F.regexp_replace(text, EMAIL_PATTERN, email_token)
    return F.regexp_replace(cleaned, PII_PHONE_PATTERN, phone_token)


def redact_pii_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gated redaction run over ``documents``.

    The fixture corpus carries no organic PII, so a bare pass would attest
    a no-op; instead each document gets a deterministic doc_id-derived
    contact line appended (an email and a phone) before scrubbing — the
    gate then verifies the scrubber actually fires on every row AND leaves
    the real corpus text byte-identical. Same construction in the oracle.
    """
    docs = load_table(spark, sf_dir, "documents")
    seeded = F.concat(
        F.coalesce(F.col("text"), F.lit("")),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example.com or 415-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    return docs.select(
        "doc_id", redact_pii(seeded).alias("redacted_text")
    )


def _oracle_redact_pii() -> str:
    from ..functions.text import EMAIL_PATTERN

    return f"""
SELECT doc_id,
       regexp_replace(
         regexp_replace(
           coalesce(text, '') || ' contact user' || CAST(doc_id AS VARCHAR)
             || '@mail.example.com or 415-555-'
             || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'),
           '{EMAIL_PATTERN}', '[EMAIL]', 'g'),
         '{PII_PHONE_PATTERN}', '[PHONE]', 'g') AS redacted_text
FROM documents
ORDER BY doc_id
"""


def _mode_token_share():
    """round(modal-token count / n_tokens, 6) over a ``toks`` array column
    — shared by ``doc_repetition_stats`` and ``curation_pipeline_v2``.

    Computed as the longest equal-run in the SORTED token array (see
    ``_sorted_run_stats`` for the mechanism and history: round 10's
    per-distinct-token rescan was O(distinct·n) quadratic on prose;
    round 11's linear fold fixed the complexity; round 12 moved the fold
    onto the distinct-sized change array). The modal count is identical
    by definition (max frequency = longest sorted run), so gate hashes
    are unchanged at every tier.

    Contract (round-11 advice): identical to the rescan shape for
    NON-NULL token arrays only — a NULL element merges its run here
    where the old ``size(filter(toks, x -> x = t))`` counted it as 0 —
    unreachable from every in-repo caller (``_tokens()``/``split()``
    never yield NULL elements, pinned by the hostile-corpus suite), but
    callers passing hand-built arrays must pre-filter NULLs."""
    # CASE maps empty toks to NULL — the old array_max(empty) = NULL
    # semantics; 0/0 would otherwise throw under ANSI (callers like
    # curation_pipeline_v2 apply this to unfiltered toks, hostile
    # corpora included)
    return F.round(
        _sorted_run_stats().getField("mode_cnt")
        / F.size("toks").cast("long"),
        6,
    )


def _sorted_run_stats():
    """``struct(n_distinct, mode_cnt)`` from ONE ``array_sort(toks)``
    pass. The change positions of the sorted array (indices where the
    value differs from its predecessor) determine both statistics:
    distinct count = changes + 1, modal count = the widest gap between
    consecutive changes (array boundaries included). Round-12 rewrite of
    the round-11 fold: the per-element work drops from constructing a
    (string, long, long) struct to two array lookups + one compare
    (the integer fold then runs over the distinct-sized change array,
    not the full token array), and doc_repetition_stats gets its
    token-distinct count from the same pass instead of a separate
    ``array_distinct`` hash pass. Values are identical by definition
    (max frequency = longest sorted run; distinct values = runs), so
    gate hashes are unchanged at every tier.

    Same NULL-element contract as the round-11 fold (see
    ``_mode_token_share``): non-null token arrays only — a NULL element
    makes ``srt[i] != srt[i-1]`` NULL, dropping the change position and
    merging its run. Unreachable from every in-repo caller."""
    # binding trick: transform over a singleton array is the expression
    # language's `let` — srt (the sorted array) and chg (its change
    # positions) are each computed once, then referenced freely
    # the size<2 arms are load-bearing, not just fast paths: sequence(1,
    # size-1) with size<2 is a DESCENDING sequence ([1,0] for a 1-token
    # array), whose srt[1] lookup throws INVALID_ARRAY_INDEX under ANSI
    # (hostile single-token docs reach this through curation_pipeline_v2)
    return F.expr(
        "CASE WHEN size(toks) = 0 THEN"
        " named_struct('n_distinct', CAST(NULL AS BIGINT),"
        "              'mode_cnt', CAST(NULL AS BIGINT))"
        " WHEN size(toks) = 1 THEN"
        " named_struct('n_distinct', 1L, 'mode_cnt', 1L)"
        " ELSE transform(array(array_sort(toks)), srt ->"
        "   transform(array(filter(sequence(1, size(srt) - 1),"
        "                          i -> srt[i] != srt[i - 1])), chg ->"
        "     named_struct("
        "       'n_distinct', CAST(size(chg) + 1 AS BIGINT),"
        "       'mode_cnt', aggregate(chg,"
        "         named_struct('p', 0L, 'b', 0L),"
        "         (acc, i) -> named_struct('p', CAST(i AS BIGINT),"
        "                                  'b', GREATEST(acc.b, i - acc.p)),"
        "         acc -> GREATEST(acc.b, size(srt) - acc.p)))))[0][0]"
        " END"
    )


def doc_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition filters (the Gopher-rules quality family): per document,
    duplicate-token and duplicate-trigram ratios plus the modal token's
    frequency share. High values flag boilerplate, keyword stuffing, and
    degenerate generations — the standard cheap pre-LM corpus gate.

    Everything is per-document array lambdas inside whole-stage codegen —
    map-only, zero shuffles, no UDFs. The token-distinct count and the
    modal-token count come from ONE shared sorted pass
    (``_sorted_run_stats``: distinct values = sorted runs, mode = longest
    run), so the token array is sorted once and never rescanned
    per-distinct-token. DuckDB's ``list_*`` functions mirror each
    statistic exactly (the twin keeps the definitional ``list_distinct``
    / rescan forms — same integers by definition).
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    toks = F.filter(
        F.split(F.lower(F.col("text")), r"[^a-z0-9]+"), lambda t: t != ""
    )
    d = docs.select("doc_id", toks.alias("toks")).filter(F.size("toks") >= 3)
    # separate projection: _rs is expensive and referenced twice below,
    # so CollapseProject leaves the alias in place (SPARK-36718 — the
    # same guard bm25's shared toks alias relies on) and the sort runs
    # once per row
    d = d.select("doc_id", "toks", _sorted_run_stats().alias("_rs"))
    n = F.size("toks").cast("long")
    trigrams = F.expr(
        "transform(sequence(0, size(toks) - 3),"
        " i -> concat(toks[i], ' ', toks[i + 1], ' ', toks[i + 2]))"
    )
    return d.select(
        "doc_id",
        n.alias("n_tokens"),
        F.round(1.0 - F.col("_rs.n_distinct") / n, 6).alias(
            "token_dup_ratio"
        ),
        F.round(
            1.0 - F.size(F.array_distinct(trigrams)) / F.size(trigrams), 6
        ).alias("trigram_dup_ratio"),
        F.round(F.col("_rs.mode_cnt") / n, 6).alias("mode_token_share"),
    )


ORACLE_DOC_REPETITION_STATS = """
WITH t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(coalesce(text, '')), '[^a-z0-9]+'),
                     x -> x <> '') AS toks
  FROM documents
),
d AS (SELECT * FROM t WHERE len(toks) >= 3),
g AS (
  SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n,
         [toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]
          FOR i IN range(1, len(toks) - 1)] AS trigrams
  FROM d
)
SELECT doc_id,
       n AS n_tokens,
       ROUND(1.0 - len(list_distinct(toks)) / n, 6) AS token_dup_ratio,
       ROUND(1.0 - len(list_distinct(trigrams)) / len(trigrams), 6)
         AS trigram_dup_ratio,
       ROUND(CAST(list_max(list_transform(list_distinct(toks),
               t -> len(list_filter(toks, x -> x = t)))) AS BIGINT) / n, 6)
         AS mode_token_share
FROM g ORDER BY doc_id
"""


WINNOW_K = 8  # char k-gram width
WINNOW_W = 4  # winnowing window (guarantee: any match ≥ k+w-1 chars shares a fingerprint)


def winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprint selection (the MOSS scheme): hash every char
    k-gram of the normalized text, then keep the minimum hash of each
    sliding window of w consecutive k-gram hashes. The selected set is
    position-robust — any substring match of length ≥ k+w-1 between two
    documents is guaranteed to share a fingerprint — which is what makes
    it the standard rolling-hash fingerprint for partial-overlap/plagiarism
    detection, complementing ``doc_fingerprint``'s whole-content hash.

    Map-only array lambdas per document (no shuffle, no UDF); md5-hex
    min is taken lexicographically, identical across engines. Emitted as
    per-doc summary (count + min/max fingerprint) so the gate row stays
    compact; the exploded (doc_id, fingerprint) posting table is the same
    expression followed by ``explode``.
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    norm = F.lower(
        F.regexp_replace(F.trim(F.coalesce(F.col("text"), F.lit(""))), r"\s+", " ")
    )
    d = docs.select("doc_id", norm.alias("norm")).filter(
        F.length("norm") >= WINNOW_K + WINNOW_W - 1
    )
    kgram_hashes = F.expr(
        f"transform(sequence(1, length(norm) - {WINNOW_K} + 1),"
        f" i -> md5(substring(norm, i, {WINNOW_K})))"
    )
    h = d.select("doc_id", kgram_hashes.alias("h"))
    # Sliding-window min WITHOUT per-position allocation: the round-7
    # form materialized a fresh w-element slice() array per position and
    # array_min'd it — O(n·w) allocations per document, 2.4–3.0× its
    # DuckDB twin (whose ROWS-frame MIN is incremental). least() over w
    # element_at lookups is the same O(n·w) comparisons but zero
    # allocation and stays a single scalar expression per position —
    # map-only, no shuffle (the posexplode + frame-window alternative
    # pays a corpus-length shuffle for its O(n) aggregation; w here is a
    # small constant, so comparisons are not the bottleneck, allocation
    # was). For large w the two-pass block-min formulation would win.
    least_w = ", ".join(f"element_at(h, j + {i})" for i in range(WINNOW_W))
    mins = F.expr(
        f"transform(sequence(1, size(h) - {WINNOW_W} + 1),"
        f" j -> least({least_w}))"
    )
    return h.select(
        "doc_id",
        F.size("h").cast("long").alias("n_kgrams"),
        F.size(F.array_distinct(mins)).cast("long").alias("n_fingerprints"),
        F.array_min(mins).alias("fp_min"),
        F.array_max(mins).alias("fp_max"),
    )


# Linear-shape twin (the engine-side formulation): unnest k-gram positions
# and take the sliding w-window minimum with a frame window function —
# DuckDB evaluates ROWS-frame MIN incrementally, so the twin is O(n·k)
# like the Spark side instead of materializing a w-wide list_slice per
# position (the original list-comprehension twin thrashed allocation and
# excluded this query from the sf1 gate tier).
ORACLE_WINNOWING_FINGERPRINTS = f"""
WITH d AS (
  SELECT doc_id,
         lower(regexp_replace(trim(coalesce(text, '')), '[\\t\\n\\x0b\\f\\r ]+', ' ', 'g'))
           AS norm
  FROM documents
),
hx AS (
  SELECT doc_id, i, md5(substr(norm, i, {WINNOW_K})) AS v
  FROM d, LATERAL (
    SELECT unnest(range(1, length(norm) - {WINNOW_K} + 2)) AS i
  )
  WHERE length(norm) >= {WINNOW_K} + {WINNOW_W} - 1
),
mins AS (
  SELECT doc_id, i,
         MIN(v) OVER (PARTITION BY doc_id ORDER BY i
                      ROWS BETWEEN {WINNOW_W - 1} PRECEDING AND CURRENT ROW)
           AS mn
  FROM hx
)
SELECT doc_id,
       CAST(MAX(i) AS BIGINT) AS n_kgrams,
       CAST(COUNT(DISTINCT CASE WHEN i >= {WINNOW_W} THEN mn END) AS BIGINT)
         AS n_fingerprints,
       MIN(CASE WHEN i >= {WINNOW_W} THEN mn END) AS fp_min,
       MAX(CASE WHEN i >= {WINNOW_W} THEN mn END) AS fp_max
FROM mins GROUP BY doc_id ORDER BY doc_id
"""


FUNNEL2_LM_MIN = 0.0344  # ~corpus median bigram-LM score
FUNNEL2_MODE_SHARE_MAX = 0.09  # ~corpus median modal-token share


def curation_pipeline_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation with the statistical quality stack, one query:
    deterministic hash sample → bigram-LM + repetition quality gate →
    exact-dedup survivorship, with per-source funnel counts.

    Composes the gated operators: ``sampling.sample_corpus_hash``'s
    bucket, ``ranking.bigram_lm_quality``'s corpus-statistics score
    (stats fitted on the FULL corpus, gate applied after — the standard
    order, since a filter that feeds its own statistics drifts),
    ``doc_repetition_stats``' modal-token share, and ``dedup_exact``'s
    first-occurrence rule scoped to quality survivors. Stage counts are
    conditional sums in one aggregation; the only corpus-order shuffle
    beyond the LM stats is the dedup fingerprint window.
    """
    from .ranking import TOKEN_SPLIT_RE, lm_scores_frame
    from .sampling import SAMPLE_SALT, SAMPLE_THRESHOLD

    docs = spread(load_table(spark, sf_dir, "documents"))
    toks = F.filter(
        F.split(F.lower(F.coalesce(F.col("text"), F.lit(""))), TOKEN_SPLIT_RE),
        lambda t: t != "",
    )
    sampled = F.col("bucket") < SAMPLE_THRESHOLD
    # ONE tokenized pass over the corpus, shared by the LM leg and the
    # mode-share/fingerprint leg (the LM stage previously re-read and
    # re-tokenized the whole corpus as a sub-pipeline — a duplicate scan
    # plus spread exchange). Lazy localCheckpoint materializes it once
    # per SESSION, not once per run: the tokenization is deterministic
    # over the immutable corpus, so it is a fitted artifact under the
    # memo contract (yt.operators.memo) like the LM stats it feeds.
    toked = session_frame(
        spark,
        sf_dir,
        "curation_toked",
        lambda: docs.select(
            "doc_id",
            "source",
            F.md5(F.coalesce(F.col("text"), F.lit(""))).alias("fp"),
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(SAMPLE_SALT), F.col("doc_id").cast("string")
                    )
                ),
                1,
                8,
            ).alias("bucket"),
            toks.alias("toks"),
        ),
    )
    base = (
        # modal-token share is O(distinct·n) per doc; only sampled rows
        # can pass the quality conjunction, so skip the other 75%
        toked.withColumn("mode_share", F.when(sampled, _mode_token_share()))
        .join(
            # the session-memoized score table (ranking.lm_scores_frame):
            # the quality gate READS the fitted LM scores, it doesn't
            # re-run the scorer per invocation; on a cold fit the builder
            # reuses this query's tokenized checkpoint
            lm_scores_frame(
                spark, sf_dir, toked.select("doc_id", "toks")
            ).select("doc_id", "lm_score"),
            "doc_id",
            "left",
        )
    )
    flagged = base.select(
        "doc_id",
        "source",
        "fp",
        sampled.alias("sampled"),
        (
            sampled
            & (F.coalesce(F.col("lm_score"), F.lit(-1.0)) >= FUNNEL2_LM_MIN)
            & (F.col("mode_share") <= FUNNEL2_MODE_SHARE_MAX)
        ).alias("quality"),
    )
    # First-occurrence survivorship WITHOUT a self-join: partitioning the
    # window by (fp, quality) makes row 1 of the quality=true slice exactly
    # the lowest-doc_id quality row per fingerprint — the dedup_exact rule.
    # The previous filter→window→join-back shape referenced `flagged`
    # twice, which duplicated the whole LM sub-plan in the physical tree
    # (18 static exchanges); this is one window pass, LM leg planned once.
    surv_rn = F.row_number().over(
        Window.partitionBy("fp", "quality").orderBy(F.col("doc_id").asc())
    )
    return (
        flagged.withColumn("survivor", F.col("quality") & (surv_rn == 1))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("sampled").cast("long")).alias("n_sampled"),
            F.sum(F.col("quality").cast("long")).alias("n_quality"),
            F.sum(F.col("survivor").cast("long")).alias("n_survivors"),
        )
    )


def _oracle_curation_pipeline_v2() -> str:
    from .ranking import ORACLE_BIGRAM_LM_QUALITY, TOKEN_SPLIT_RE
    from .sampling import SAMPLE_SALT, SAMPLE_THRESHOLD

    return f"""
WITH lmq AS (
  SELECT doc_id, lm_score FROM ({ORACLE_BIGRAM_LM_QUALITY})
),
base AS (
  SELECT d.doc_id, d.source,
         md5(coalesce(d.text, '')) AS fp,
         substr(md5('{SAMPLE_SALT}' || CAST(d.doc_id AS VARCHAR)), 1, 8)
           AS bucket,
         list_filter(regexp_split_to_array(lower(coalesce(d.text, '')),
                     '{TOKEN_SPLIT_RE}'), x -> x <> '') AS toks,
         lmq.lm_score
  FROM documents d LEFT JOIN lmq ON lmq.doc_id = d.doc_id
),
flagged AS (
  SELECT doc_id, source, fp,
         bucket < '{SAMPLE_THRESHOLD}' AS sampled,
         bucket < '{SAMPLE_THRESHOLD}'
           AND coalesce(lm_score, -1.0) >= {FUNNEL2_LM_MIN}
           AND CASE WHEN bucket < '{SAMPLE_THRESHOLD}'
                 THEN ROUND(CAST(list_max(list_transform(list_distinct(toks),
                        t -> len(list_filter(toks, x -> x = t)))) AS BIGINT)
                        / CAST(len(toks) AS BIGINT), 6)
               END <= {FUNNEL2_MODE_SHARE_MAX} AS quality
  FROM base
),
surv AS (
  SELECT doc_id, TRUE AS survivor FROM (
    SELECT doc_id, ROW_NUMBER() OVER (
      PARTITION BY fp ORDER BY doc_id) AS rn
    FROM flagged WHERE quality
  ) WHERE rn = 1
)
SELECT f.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN f.sampled THEN 1 ELSE 0 END) AS BIGINT)
         AS n_sampled,
       CAST(SUM(CASE WHEN f.quality THEN 1 ELSE 0 END) AS BIGINT)
         AS n_quality,
       CAST(SUM(CASE WHEN coalesce(s.survivor, FALSE) THEN 1 ELSE 0 END)
         AS BIGINT) AS n_survivors
FROM flagged f LEFT JOIN surv s ON s.doc_id = f.doc_id
GROUP BY f.source ORDER BY f.source
"""


BOILERPLATE_DF_CAP = 3  # drop lines recurring in MORE than this many docs


def remove_boilerplate_lines(
    docs: DataFrame, text_col: str = "text", df_cap: int = BOILERPLATE_DF_CAP
) -> DataFrame:
    """Line-level boilerplate removal — the C4/CCNet/RefinedWeb-family
    cleaning step the span/doc dedup operators don't cover: drop every
    line whose TRIMMED form recurs in more than ``df_cap`` distinct
    documents (navigation bars, cookie banners, footers — the
    highest-frequency noise in web-crawl corpora), keeping document
    structure otherwise intact. Beyond the reference surface (SURVEY.md
    §7.1 M7); the reference has no corpus-level text hygiene at all — its
    closest analog is the per-string topic beautifier
    (youtube_api_handler.py:858-866), which is per-row only.

    Semantics (mirrored exactly by the DuckDB twin):
    - lines = split on literal newline; the matching KEY is ``trim(line)``
      so indentation/padding variants of the same boilerplate collapse;
    - lines whose key is '' are EXEMPT — blank separators are document
      structure, not boilerplate (and counting them would make every
      multi-paragraph doc share one giant "duplicate");
    - line df = count of DISTINCT docs containing the key (repeats inside
      one doc don't inflate it — that is repetition, priced by
      doc_repetition_stats, not boilerplate);
    - NULL text behaves exactly like '' (the corpus NULL contract).

    100-TB shape: one exploded-KEY aggregate (line text never rides a
    shuffle twice — only trimmed keys), the dropped side of the df guard
    broadcasts into the exploded keys to build a PER-DOC hot-key array
    (``collect_set``, ≤ a handful of keys per doc), and cleaning is then a
    map-side array filter against that array — the full document text is
    never exploded through a shuffle and never reassembled from rows. The
    hot side is structurally ≤ total_lines/df_cap by the same counting
    bound as the stop-shingle guard (dedup.py); at petabyte posting
    volume with a tiny df_cap that bound can still exceed the broadcast
    threshold, in which case drop the hint and let the hits join shuffle
    — the failure mode and fallback mirror benchmark_contamination's
    stop-table note.
    """
    arr = F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")
    keys = docs.select(
        "doc_id", F.explode(arr).alias("line")
    ).select("doc_id", F.trim("line").alias("key")).filter(F.col("key") != "")
    hot = (
        keys.groupBy("key")
        .agg(F.count_distinct("doc_id").alias("line_df"))
        .filter(F.col("line_df") > df_cap)
        .select("key")
    )
    hits = (
        keys.join(F.broadcast(hot), "key")
        .groupBy("doc_id")
        .agg(F.collect_set("key").alias("hot_keys"))
    )
    hk = F.coalesce("hot_keys", F.array().cast("array<string>"))
    kept = F.filter(arr, lambda x: (F.trim(x) == "") | ~F.array_contains(hk, F.trim(x)))
    return (
        docs.join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.concat_ws("\n", kept).alias("clean_text"),
            (F.size(arr) - F.size(kept)).cast("bigint").alias("n_removed"),
        )
    )


def remove_boilerplate_lines_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gated boilerplate removal over ``documents``.

    The fixture corpus is single-line with zero exact trimmed duplicates
    (measured: no key recurs at any shipped tier), so a bare pass would
    attest a no-op. Instead each document is framed with deterministic
    structure that exercises BOTH sides of the df threshold — same
    construction in the oracle:
    - ``QUAD <doc_id DIV 4>``: recurs in (up to) 4 distinct docs → df>cap
      → removed (tail groups with <4 members stay, exactly as the rule
      says — the hash pins that boundary too);
    - the organic text line: unique → kept (corpus text byte-identical);
    - ``PAIR <doc_id DIV 2>``: df ≤ 2 ≤ cap → kept — attests the
      threshold is > cap, not ≥ cap;
    - ``GLOBAL FOOTER``: corpus-wide → removed.
    """
    docs = load_table(spark, sf_dir, "documents")
    seeded = F.concat_ws(
        "\n",
        F.concat(F.lit("QUAD "), F.expr("CAST(doc_id AS BIGINT) DIV 4")),
        F.coalesce(F.col("text"), F.lit("")),
        F.concat(F.lit("PAIR "), F.expr("CAST(doc_id AS BIGINT) DIV 2")),
        F.lit("GLOBAL FOOTER"),
    )
    framed = docs.select("doc_id", seeded.alias("text"))
    return remove_boilerplate_lines(framed)


ORACLE_REMOVE_BOILERPLATE_LINES = f"""
WITH framed AS (
    SELECT doc_id,
           'QUAD ' || CAST(CAST(doc_id AS BIGINT) // 4 AS VARCHAR) || chr(10)
           || coalesce(text, '') || chr(10)
           || 'PAIR ' || CAST(CAST(doc_id AS BIGINT) // 2 AS VARCHAR) || chr(10)
           || 'GLOBAL FOOTER' AS text
    FROM documents
), lines AS (
    SELECT d.doc_id, trim(t.line) AS key
    FROM framed d, unnest(string_split(coalesce(d.text, ''), chr(10))) AS t(line)
    WHERE trim(t.line) <> ''
), hot_list AS (
    SELECT coalesce(list(key), []) AS ks FROM (
        SELECT key FROM lines GROUP BY key
        HAVING count(DISTINCT doc_id) > {BOILERPLATE_DF_CAP})
)
SELECT d.doc_id,
       array_to_string(list_filter(string_split(coalesce(d.text, ''), chr(10)),
            x -> trim(x) = '' OR NOT list_contains(h.ks, trim(x))), chr(10)) AS clean_text,
       CAST(len(string_split(coalesce(d.text, ''), chr(10)))
            - len(list_filter(string_split(coalesce(d.text, ''), chr(10)),
                  x -> trim(x) = '' OR NOT list_contains(h.ks, trim(x))))
            AS BIGINT) AS n_removed
FROM framed d, hot_list h
"""


QUERIES = {
    "corpus_curation_funnel": corpus_curation_funnel,
    "curation_pipeline_v2": curation_pipeline_v2,
    "doc_repetition_stats": doc_repetition_stats,
    "winnowing_fingerprints": winnowing_fingerprints,
    "doc_text_stats": doc_text_stats,
    "language_id": language_id,
    "doc_fingerprint": doc_fingerprint,
    "redact_pii": redact_pii_query,
    "remove_boilerplate_lines": remove_boilerplate_lines_query,
}

ORACLES = {
    "corpus_curation_funnel": ORACLE_CORPUS_CURATION_FUNNEL,
    "curation_pipeline_v2": _oracle_curation_pipeline_v2(),
    "doc_repetition_stats": ORACLE_DOC_REPETITION_STATS,
    "winnowing_fingerprints": ORACLE_WINNOWING_FINGERPRINTS,
    "doc_text_stats": ORACLE_DOC_TEXT_STATS,
    "language_id": ORACLE_LANGUAGE_ID,
    "doc_fingerprint": ORACLE_DOC_FINGERPRINT,
    "redact_pii": _oracle_redact_pii(),
    "remove_boilerplate_lines": ORACLE_REMOVE_BOILERPLATE_LINES,
}
