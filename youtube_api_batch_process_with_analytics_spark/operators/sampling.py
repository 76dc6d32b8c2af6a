"""Deterministic corpus sampling for training-data pipelines.

Beyond the reference surface (SURVEY.md §7.1 M7 scale extensions): corpus
subsetting is a first-class step in any 100-TB data-prep DAG — ablation
subsets, per-language rebalancing, held-out carve-outs. The reference's
only "sampling" is its top-N video slice (``youtube_api_handler.py:536``),
which is rank-based; these operators add the two shapes an LLM pipeline
actually needs:

1. **Hash-threshold Bernoulli sampling** (``sample_corpus_hash``) —
   ``md5(salt || key)`` compared against a fixed-width hex threshold.
   Map-only, shuffle-free, reproducible across engines and runs (no RNG
   state), and composable: the same salt always selects the same rows, a
   different salt draws an independent sample. This is the only sampling
   primitive that survives 100 TB unchanged — every row decides its own
   fate inside whole-stage codegen on the scan.

2. **Exact-k stratified sampling** (``stratified_sample``) — per stratum
   (language), take exactly ``ceil(frac * n)`` rows: the k smallest
   ``md5`` draws. A naive ``row_number() OVER (PARTITION BY lang)`` puts
   an entire stratum in one task — at 100 TB a 20-TB stratum on one
   reducer. Instead the top-k runs in two stages: a salted partial top-k
   per ``(stratum, salt)`` cell (bounded spill per task), then the final
   top-k over the ≤ salt_buckets·k survivors. Identical result to the
   single-window form (each salt cell's contribution to the global top-k
   is at most k), which is exactly what the DuckDB oracle computes.

All hashes are md5 hex compared lexicographically — fixed-width lowercase
hex order equals numeric order, and Spark/DuckDB/Python agree bytewise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table, spread

SAMPLE_SALT = "s42:"
# 0.25 of the 32-bit hex space: md5 first 8 nibbles < 0x40000000.
SAMPLE_THRESHOLD = "40000000"
STRAT_SALT = "strat42:"
STRAT_FRAC = 0.2
STRAT_SALT_BUCKETS = 16


def _hash_key(salt: str, key):
    return F.md5(F.concat(F.lit(salt), key.cast("string")))


def sample_corpus_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~25% Bernoulli sample of ``documents``.

    Selection: ``substr(md5('s42:' || doc_id), 1, 8) < '40000000'``.
    The bucket column is kept in the output so downstream stages can
    sub-sample the sample (prefix property: a '20000000' threshold is a
    strict subset of this draw).
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    bucket = F.substring(_hash_key(SAMPLE_SALT, F.col("doc_id")), 1, 8)
    return (
        docs.withColumn("sample_bucket", bucket)
        .filter(F.col("sample_bucket") < SAMPLE_THRESHOLD)
        .select("doc_id", "lang", "source", "n_chars", "sample_bucket")
    )


ORACLE_SAMPLE_CORPUS_HASH = f"""
SELECT doc_id, lang, source, n_chars,
       substr(md5('{SAMPLE_SALT}' || CAST(doc_id AS VARCHAR)), 1, 8)
         AS sample_bucket
FROM documents
WHERE substr(md5('{SAMPLE_SALT}' || CAST(doc_id AS VARCHAR)), 1, 8)
      < '{SAMPLE_THRESHOLD}'
ORDER BY doc_id
"""


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ``ceil(0.2·n)`` rows per language stratum, by smallest md5 draw.

    Two-stage top-k (see module docstring): stage 1 ranks within
    ``(lang, doc_id % 16)`` salt cells, stage 2 ranks the surviving
    ≤ 16·k rows per stratum. ``sample_rank`` is the final per-stratum
    rank — deterministic via the (hash, doc_id) sort key.
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    counts = (
        load_table(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.ceil(F.count("*") * F.lit(STRAT_FRAC)).alias("strat_k"))
    )
    drawn = docs.select(
        "doc_id",
        "lang",
        _hash_key(STRAT_SALT, F.col("doc_id")).alias("strat_key"),
        F.pmod(F.col("doc_id"), F.lit(STRAT_SALT_BUCKETS)).alias("_salt"),
    ).join(F.broadcast(counts), "lang")

    order = [F.col("strat_key").asc(), F.col("doc_id").asc()]
    partial = Window.partitionBy("lang", "_salt").orderBy(*order)
    stage1 = drawn.withColumn("_r1", F.row_number().over(partial)).filter(
        F.col("_r1") <= F.col("strat_k")
    )
    final = Window.partitionBy("lang").orderBy(*order)
    return (
        stage1.withColumn("sample_rank", F.row_number().over(final))
        .filter(F.col("sample_rank") <= F.col("strat_k"))
        .select("doc_id", "lang", "strat_key", "sample_rank")
    )


ORACLE_STRATIFIED_SAMPLE = f"""
WITH k AS (
  SELECT lang, CAST(CEIL(COUNT(*) * {STRAT_FRAC}) AS BIGINT) AS strat_k
  FROM documents GROUP BY lang
),
drawn AS (
  SELECT d.doc_id, d.lang,
         md5('{STRAT_SALT}' || CAST(d.doc_id AS VARCHAR)) AS strat_key,
         k.strat_k
  FROM documents d JOIN k USING (lang)
),
ranked AS (
  SELECT doc_id, lang, strat_key, strat_k,
         ROW_NUMBER() OVER (
           PARTITION BY lang ORDER BY strat_key, doc_id) AS sample_rank
  FROM drawn
)
SELECT doc_id, lang, strat_key, sample_rank
FROM ranked WHERE sample_rank <= strat_k
ORDER BY lang, sample_rank
"""


QUERIES = {
    "corpus_sample_hash": sample_corpus_hash,
    "stratified_sample": stratified_sample,
}

ORACLES = {
    "corpus_sample_hash": ORACLE_SAMPLE_CORPUS_HASH,
    "stratified_sample": ORACLE_STRATIFIED_SAMPLE,
}
