"""Cross-document duplicate-span detection (substring-level dedup).

Beyond the reference surface (SURVEY.md §7.1 M7 scale extensions):
document-level dedup (``operators/dedup.py``) removes whole near-identical
documents, but web corpora also repeat long *sub*-sequences inside
otherwise-distinct documents — boilerplate headers, licence blocks, quoted
replies. Removing repeated spans (not whole docs) is the "ExactSubstr"
method of Lee et al. 2022, *Deduplicating Training Data Makes Language
Models Better*, there built on a suffix array. A suffix array is a
single-machine structure; the Spark-first reformulation is a fingerprint
posting list:

1. tokenize (shared ``ranking.TOKEN_SPLIT_RE`` tokenizer, so span
   positions line up with chunking/ranking token indices);
2. every ``SPAN_K``-token window becomes a fixed-width md5 fingerprint
   carrying its start position — map-side ``transform`` + ``posexplode``,
   no shuffle;
3. one aggregate over fingerprints keeps those appearing in more than one
   document (``min(doc_id) <> max(doc_id)`` — never a COUNT(DISTINCT)
   expand);
4. duplicated positions join back to the gram stream **salted**
   (``skew.salted_join``): a boilerplate fingerprint shared by millions
   of documents is the canonical hot key, and both join inputs derive
   from aggregates/generates where AQE's skew split does not fire (see
   ``operators/skew.py``);
5. per-document, overlapping duplicated windows merge into maximal spans
   with a gaps-and-islands window — partitioned by ``doc_id``, so state
   is bounded by document length, never corpus size.

Any two documents sharing ``SPAN_K`` consecutive tokens are guaranteed to
produce the same fingerprint at the shared window (exact match on the
token slice — no sampling, unlike winnowing's selected-fingerprint
subset), so recall for spans ≥ SPAN_K tokens is 1 by construction; md5
collisions are the only false-positive source (2^-128, ignorable).

Reference parity anchor: the reference has no substring machinery at all —
its closest text op is the description e-mail regex
(``youtube_api_handler.py:705-712``); this module exists for the
100-TB training-corpus mandate, not reference parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table, spread
from .ranking import TOKEN_SPLIT_RE, _tokens
from .skew import salted_join

SPAN_K = 8
SPAN_SALT = "span42:"


def duplicate_spans(docs: DataFrame, k: int = SPAN_K) -> DataFrame:
    """Maximal cross-document duplicated token spans.

    Input needs ``doc_id`` and ``text``. Output: one row per maximal span
    — ``doc_id, span_start, span_end`` (0-based token indices, inclusive),
    ``span_tokens`` (= end - start + 1), ``n_dup_grams`` (how many
    duplicated k-gram windows merged into the span).

    A span may merge windows duplicated against *different* partner
    documents — the semantics are "this region also occurs elsewhere in
    the corpus", which is exactly what span-removal needs.
    """
    toks = docs.select("doc_id", _tokens().alias("toks")).filter(
        F.size("toks") >= k
    )
    # Map-side k-gram windows with start positions. posexplode's ordinal
    # IS the 0-based start index of the slice.
    grams = toks.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, size(toks) - {k}),"
                f" i -> md5('{SPAN_SALT}' || array_join(slice(toks, i + 1, {k}), ' ')))"
            )
        ).alias("pos", "fp"),
    )
    dup_fps = (
        grams.groupBy("fp")
        .agg(F.min("doc_id").alias("_mn"), F.max("doc_id").alias("_mx"))
        .filter(F.col("_mn") != F.col("_mx"))
        .select("fp")
    )
    hits = salted_join(grams, dup_fps, "fp", unique_col="doc_id").select(
        "doc_id", "pos"
    )

    w = Window.partitionBy("doc_id").orderBy("pos")
    flagged = hits.withColumn(
        "_new_island",
        F.when(
            F.lag("pos").over(w).isNull()
            | ((F.col("pos") - F.lag("pos").over(w)) > k),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    islands = flagged.withColumn(
        "_island",
        F.sum("_new_island").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        islands.groupBy("doc_id", "_island")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") + F.lit(k - 1)).cast("long").alias("span_end"),
            F.count("*").alias("n_dup_grams"),
        )
        .select(
            "doc_id",
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias("span_tokens"),
            "n_dup_grams",
        )
    )


def duplicate_spans_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return duplicate_spans(spread(load_table(spark, sf_dir, "documents")))


ORACLE_DUPLICATE_SPANS = f"""
WITH toks_t AS (
  SELECT doc_id,
         list_filter(
           regexp_split_to_array(lower(coalesce(text, '')), '{TOKEN_SPLIT_RE}'),
           t -> t <> ''
         ) AS toks
  FROM documents
),
grams AS (
  SELECT doc_id,
         unnest(range(0, len(toks) - {SPAN_K} + 1)) AS pos,
         toks
  FROM toks_t WHERE len(toks) >= {SPAN_K}
),
g2 AS (
  SELECT doc_id, pos,
         md5('{SPAN_SALT}' ||
             array_to_string(toks[pos + 1 : pos + {SPAN_K}], ' ')) AS fp
  FROM grams
),
dup AS (
  SELECT fp FROM g2 GROUP BY fp HAVING MIN(doc_id) <> MAX(doc_id)
),
hits AS (SELECT g2.doc_id, g2.pos FROM g2 JOIN dup USING (fp)),
flagged AS (
  SELECT doc_id, pos,
         CASE WHEN LAG(pos) OVER w IS NULL
                   OR pos - LAG(pos) OVER w > {SPAN_K}
              THEN 1 ELSE 0 END AS new_island
  FROM hits
  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
islands AS (
  SELECT doc_id, pos,
         SUM(new_island) OVER (
           PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM flagged
)
SELECT doc_id,
       CAST(MIN(pos) AS BIGINT) AS span_start,
       CAST(MAX(pos) + {SPAN_K} - 1 AS BIGINT) AS span_end,
       CAST(MAX(pos) - MIN(pos) + {SPAN_K} AS BIGINT) AS span_tokens,
       COUNT(*) AS n_dup_grams
FROM islands
GROUP BY doc_id, island
ORDER BY doc_id, span_start
"""


QUERIES = {
    "duplicate_spans": duplicate_spans_query,
}

ORACLES = {
    "duplicate_spans": ORACLE_DUPLICATE_SPANS,
}
