"""BPE vocabulary induction (byte-pair-encoding merge training).

Beyond the reference surface (SURVEY.md §7.1 M7 scale extensions):
tokenizer training is the step a 100-TB corpus pipeline runs right before
chunking/packing (``operators/chunking.py`` consumes its output in real
life). This is Sennrich et al. 2016 BPE, Spark-first:

- **Pass 1 — word counts.** One shuffle over the corpus (map-side partial
  aggregation). Everything after runs on the *vocabulary* table — the
  standard trick that makes BPE trainable at corpus scale: merge rounds
  never touch the corpus again, only the (word, count) frame, which is
  millions of rows at worst.
- **Per merge round**: adjacent symbol pairs weighted by word count (one
  vocabulary-sized aggregate), argmax with a total-order tie-break
  (count DESC, then pair lexicographic — deterministic across engines
  and partitionings, all-integer counts), then greedy left-to-right
  non-overlapping merge application as a fold over each word's symbol
  array. The chosen pair is collected to the driver per round — the same
  bounded-model contract as k-means centroids
  (``operators/clustering.py``) and Spark ML: rounds × 1 row.
- **Greedy fold equivalence**: appending-or-merging against the
  accumulator's last element implements the sequential i+=2 scan exactly,
  because a merged token ``a||b`` is strictly longer than ``a`` and so
  can never false-match as the left partner within the same pass.

The DuckDB oracle replays the identical rounds as generated chained CTEs
(the ``oracle_kmeans_cells`` pattern): pair stats → LIMIT-1 argmax →
``list_reduce`` string-accumulator fold (DuckDB 1.0's accumulator must be
scalar, so the symbol list threads through the fold joined by chr(30) —
tokens are [a-z0-9]-only, so the separator can't collide).

Reference parity anchor: none — the reference has no tokenizer machinery;
its only string segmentation is delimiter ``str.split()`` over language
codes and URLs (``youtube_api_handler.py:353,813-815``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table, spread
from .ranking import TOKEN_SPLIT_RE, _tokens

BPE_MERGES = 6
_SEP_SQL = "chr(30)"


def word_counts(docs: DataFrame) -> DataFrame:
    return (
        docs.select(F.explode(_tokens()).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("wcount"))
    )


def _apply_merge_expr(left: str, right: str) -> str:
    """Greedy left-to-right merge of (left, right) as an array fold.

    Tokens are [a-z0-9]-only (TOKEN_SPLIT_RE), so embedding the symbols
    as SQL literals needs no escaping.
    """
    merged = left + right
    return (
        "aggregate(syms, CAST(array() AS ARRAY<STRING>),"
        " (acc, s) -> IF(size(acc) > 0"
        f" AND element_at(acc, -1) = '{left}' AND s = '{right}',"
        f" concat(slice(acc, 1, size(acc) - 1), array('{merged}')),"
        " concat(acc, array(s))))"
    )


def bpe_train(docs: DataFrame, n_merges: int = BPE_MERGES) -> list[Row]:
    """Learn ``n_merges`` BPE merges; returns one Row per round.

    The vocabulary base frame persists across the rounds (same rationale
    as ``clustering._gate_kmeans``): every round's pair-stat job re-reads
    it, and without the cache each would redo the corpus scan + word
    aggregate. Unpersisted before returning — no storage stays pinned.
    """
    base = word_counts(docs).select(
        "word", "wcount", F.split("word", "").alias("syms")
    ).persist()
    try:
        return _train_rounds(base, n_merges)
    finally:
        base.unpersist()


def _train_rounds(syms: DataFrame, n_merges: int) -> list[Row]:
    merges: list[Row] = []
    for rnd in range(1, n_merges + 1):
        pairs = (
            syms.filter(F.size("syms") >= 2)
            .select(
                "wcount",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(syms) - 1),"
                        " i -> struct(syms[i - 1] AS l, syms[i] AS r))"
                    )
                ).alias("p"),
            )
            .groupBy("p.l", "p.r")
            .agg(F.sum("wcount").alias("cnt"))
        )
        best = pairs.orderBy(F.desc("cnt"), "l", "r").limit(1).collect()
        if not best:
            break
        b = best[0]
        merges.append(
            Row(
                merge_round=rnd,
                left_sym=b.l,
                right_sym=b.r,
                merged_sym=b.l + b.r,
                pair_count=b.cnt,
            )
        )
        syms = syms.withColumn(
            "syms", F.expr(_apply_merge_expr(b.l, b.r))
        )
    return merges


_BPE_MODEL_CACHE: dict[tuple, list[Row]] = {}
_BPE_CACHE_LOCK = __import__("threading").Lock()


def _fitted_merges(
    spark: SparkSession, sf_dir: str, n_merges: int = BPE_MERGES
) -> list[Row]:
    """Session-memoized merge list (the k-means fitted-model contract):
    the merges ARE the model — rounds × 1 row — so refitting for every
    consumer (bpe_merges, bpe_fertility) would redo n_merges corpus-side
    jobs for an identical deterministic result."""
    key = (spark.sparkContext.applicationId, sf_dir, n_merges)
    with _BPE_CACHE_LOCK:
        hit = _BPE_MODEL_CACHE.get(key)
    if hit is not None:
        return hit
    merges = bpe_train(
        spread(load_table(spark, sf_dir, "documents")), n_merges
    )
    with _BPE_CACHE_LOCK:
        _BPE_MODEL_CACHE[key] = merges
    return merges


def bpe_merges_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    merges = _fitted_merges(spark, sf_dir)
    return spark.createDataFrame(
        merges,
        "merge_round int, left_sym string, right_sym string,"
        " merged_sym string, pair_count long",
    )


def oracle_bpe_merges(n_merges: int = BPE_MERGES) -> str:
    sep = _SEP_SQL
    parts = [
        f"""WITH tok AS (
  SELECT unnest(list_filter(
           regexp_split_to_array(lower(coalesce(text, '')), '{TOKEN_SPLIT_RE}'),
           t -> t <> '')) AS word
  FROM documents
),
vocab AS (SELECT word, COUNT(*) AS wcount FROM tok GROUP BY word),
s0 AS (
  SELECT word, wcount,
         array_to_string(string_split_regex(word, ''), {sep}) AS symstr
  FROM vocab
)"""
    ]
    for r in range(1, n_merges + 1):
        p = r - 1
        parts.append(f""",
p{r} AS (
  SELECT sy[i] AS lft, sy[i + 1] AS rgt, CAST(SUM(wcount) AS BIGINT) AS cnt
  FROM (
    SELECT wcount, string_split(symstr, {sep}) AS sy,
           unnest(range(1, len(string_split(symstr, {sep})))) AS i
    FROM s{p}
  )
  GROUP BY sy[i], sy[i + 1]
),
b{r} AS (SELECT lft, rgt, cnt FROM p{r} ORDER BY cnt DESC, lft, rgt LIMIT 1),
s{r} AS (
  -- LEFT JOIN ON TRUE + pass-through: when the vocabulary exhausts
  -- before round {r} (b{r} empty), the chain must carry s{p} forward
  -- unchanged — the engine stops merging at that point too.
  SELECT word, wcount,
         CASE WHEN b.lft IS NULL THEN symstr ELSE
         list_reduce(string_split(symstr, {sep}),
           (acc, s) -> CASE
             WHEN (string_split(acc, {sep}))[-1] = b.lft AND s = b.rgt
             THEN array_to_string(
                    (string_split(acc, {sep}))
                      [1:len(string_split(acc, {sep})) - 1]
                      || [b.lft || b.rgt], {sep})
             ELSE acc || {sep} || s END) END AS symstr
  FROM s{p} LEFT JOIN b{r} b ON TRUE
)""")
    rounds_union = "\nUNION ALL\n".join(
        f"SELECT {r} AS merge_round, lft AS left_sym, rgt AS right_sym,"
        f" lft || rgt AS merged_sym, cnt AS pair_count FROM b{r}"
        for r in range(1, n_merges + 1)
    )
    parts.append(
        f"\nSELECT * FROM (\n{rounds_union}\n) ORDER BY merge_round"
    )
    return "".join(parts)


def bpe_fertility_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document fertility under the learned BPE vocabulary: how many
    BPE tokens each word-tokenized document becomes.

    The composition a tokenizer-aware pipeline runs before packing
    (``chunking.pack_sequences`` budgets by token count — this is where
    that count comes from). Segmentation is a *vocabulary-level* property:
    the merges apply once to the (word → symbols) table, and the corpus
    just joins its words against it — the corpus is never re-folded.

    Scale shape: vocabulary fold is merge-rounds × vocab rows; the
    corpus ⋈ vocab join shuffles on ``word``, whose stopword skew is the
    canonical hot key — salted (``skew.salted_join``), since the vocab
    side is aggregate-fed and AQE's skew split won't fire. Fertility
    ratio uses integer DIV permille, exact on both engines.
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    return bpe_fertility(docs, _fitted_merges(spark, sf_dir))


def bpe_fertility(docs: DataFrame, merges: list[Row]) -> DataFrame:
    """Core of ``bpe_fertility_query`` over any (doc_id, text) frame and
    learned merge list — see the query docstring for the scale shape."""
    from .skew import salted_join

    seg = word_counts(docs).select(
        "word", F.split("word", "").alias("syms")
    )
    for m in merges:
        seg = seg.withColumn(
            "syms", F.expr(_apply_merge_expr(m.left_sym, m.right_sym))
        )
    vocab_syms = seg.select("word", F.size("syms").cast("long").alias("n_syms"))
    corpus = docs.select(
        "doc_id", F.explode(_tokens()).alias("word")
    )
    return (
        salted_join(corpus, vocab_syms, "word", unique_col="doc_id")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("n_syms").alias("n_bpe_tokens"),
        )
        .select(
            "doc_id",
            "n_words",
            "n_bpe_tokens",
            F.expr("(1000 * n_bpe_tokens) DIV n_words").alias(
                "fertility_permille"
            ),
        )
    )


def oracle_bpe_fertility(n_merges: int = BPE_MERGES) -> str:
    # Reuse the merge-training CTE chain; segment lengths come from the
    # final round's symbol strings, joined back to per-doc words.
    base = oracle_bpe_merges(n_merges)
    chain = base[: base.rindex("\nSELECT * FROM (")]
    return f"""{chain},
vocab_syms AS (
  SELECT word,
         CAST(len(string_split(symstr, {_SEP_SQL})) AS BIGINT) AS n_syms
  FROM s{n_merges}
),
corpus AS (
  SELECT doc_id,
         unnest(list_filter(
           regexp_split_to_array(lower(coalesce(text, '')), '{TOKEN_SPLIT_RE}'),
           t -> t <> '')) AS word
  FROM documents
)
SELECT doc_id,
       COUNT(*) AS n_words,
       CAST(SUM(n_syms) AS BIGINT) AS n_bpe_tokens,
       CAST(1000 * SUM(n_syms) // COUNT(*) AS BIGINT) AS fertility_permille
FROM corpus JOIN vocab_syms USING (word)
GROUP BY doc_id
ORDER BY doc_id
"""


def pack_sequences_bpe_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing under the REAL token measure: bins budgeted by
    BPE token counts (``bpe_fertility``) instead of whitespace words.

    This is the composition a production data loader actually runs —
    whitespace counts under-budget by the fertility factor (~1.5-3×
    depending on vocabulary size), so packing by them overflows the
    context window. Reuses ``chunking.pack_sequences`` unchanged: the
    packing operator is measure-agnostic, only the ``n_tokens`` column
    changes. Documents with zero alphanumeric tokens have nothing to
    pack and are absent, same as the fertility table.
    """
    from .chunking import pack_sequences

    docs = spread(load_table(spark, sf_dir, "documents"))
    fert = bpe_fertility(docs, _fitted_merges(spark, sf_dir)).select(
        "doc_id", F.col("n_bpe_tokens").alias("n_tokens")
    )
    src = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return pack_sequences(src.join(fert, "doc_id"))


def oracle_pack_sequences_bpe(n_merges: int = BPE_MERGES) -> str:
    from .chunking import PACK_BUDGET

    return f"""
WITH fert AS (
  SELECT doc_id, n_bpe_tokens FROM ({oracle_bpe_fertility(n_merges)})
),
t AS (
  SELECT d.doc_id, d.source, CAST(f.n_bpe_tokens AS BIGINT) AS n_tokens
  FROM documents d JOIN fert f USING (doc_id)
),
c AS (
  SELECT *,
         SUM(n_tokens) OVER (
           PARTITION BY source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) - n_tokens AS start
  FROM t
)
SELECT doc_id, source, n_tokens,
       CAST(start // {PACK_BUDGET} AS BIGINT) AS bin,
       CAST(start % {PACK_BUDGET} AS BIGINT) AS bin_offset
FROM c ORDER BY doc_id
"""


QUERIES = {
    "bpe_merges": bpe_merges_query,
    "bpe_fertility": bpe_fertility_query,
    "pack_sequences_bpe": pack_sequences_bpe_query,
}

ORACLES = {
    "bpe_merges": oracle_bpe_merges(),
    "bpe_fertility": oracle_bpe_fertility(),
    "pack_sequences_bpe": oracle_pack_sequences_bpe(),
}
