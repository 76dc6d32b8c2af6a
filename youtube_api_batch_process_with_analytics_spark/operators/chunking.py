"""Corpus preparation operators: chunking, split assignment, packing.

The last mile of a training-data pipeline after dedup/quality/language
filtering (operators/dedup.py, operators/text_analysis.py): cut documents
into model-sized chunks, assign deterministic train/validation splits, and
pack variable-length pieces into fixed token budgets. All three are
map-only or single-window constructs — no driver loops, no UDFs — and each
is differentially tested against a DuckDB twin (tests/test_chunking.py)
AND gated: the QUERIES/ORACLES entries below feed the driver's
correctness gate directly.

Scale shapes:

- **chunk_documents** — pure row expansion in codegen (sequence →
  transform → posexplode). No shuffle at all; output rows ≈ tokens/stride.
- **split_by_hash** — one md5 per key, map-only. Stable across runs,
  machines, and engines (md5 is bit-identical in Spark/DuckDB/Python), so
  a document never migrates between train and validation when the corpus
  is re-processed — the property that matters for contamination control.
- **pack_sequences** — the streaming-pack approximation: within each
  (source) stream, documents in stable order accumulate token counts and
  a bin boundary falls wherever the running total crosses the budget.
  One window per group key (shuffle on source), no global sort. Exact
  first-fit-decreasing packing is inherently sequential; the streaming
  form is what large pipelines actually run, and its waste is bounded by
  one document per bin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table

CHUNK_TOKENS = 64
CHUNK_OVERLAP = 16
VAL_PERMILLE = 100  # 10.0% validation
PACK_BUDGET = 512


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = CHUNK_TOKENS,
    overlap: int = CHUNK_OVERLAP,
) -> DataFrame:
    """Cut ``text`` into whitespace-token windows of ``chunk_tokens`` with
    ``overlap`` tokens carried between consecutive chunks.

    Output: doc_id, chunk_idx (0-based), chunk_text, n_tokens. Chunks
    start every ``chunk_tokens - overlap`` tokens. A final short chunk is
    kept (training pipelines pad it) only when it contributes tokens
    beyond the carried overlap — a trailing chunk of ≤ ``overlap`` tokens
    is wholly contained in its predecessor and emitting it would inject
    exact-duplicate text into the corpus the dedup operators exist to
    clean, so starts stop at ``n - overlap - 1``.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    # NULL text coalesces to '' (one empty chunk) so the operator can't
    # emit size(NULL) = -1 token counts with ANSI mode off — and so the
    # DuckDB twin, where NULL propagates differently, stays bit-identical.
    toks = docs.select(
        "doc_id", F.split(F.trim(F.coalesce("text", F.lit(""))), r"\s+").alias("toks")
    ).withColumn("n", F.size("toks"))
    # Start offsets 0, stride, 2*stride, ... while start <= n - overlap - 1
    # (every chunk past the first must add > overlap-carried tokens).
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.lit(0), F.col("n") - F.lit(overlap + 1)),
        F.lit(stride),
    )
    chunks = toks.select(
        "doc_id",
        F.posexplode(
            F.transform(
                starts,
                lambda s: F.slice(F.col("toks"), s + 1, chunk_tokens),
            )
        ).alias("chunk_idx", "chunk_toks"),
    )
    return chunks.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.concat_ws(" ", "chunk_toks").alias("chunk_text"),
        F.size("chunk_toks").cast("long").alias("n_tokens"),
    )


def oracle_chunk_documents(
    chunk_tokens: int = CHUNK_TOKENS, overlap: int = CHUNK_OVERLAP
) -> str:
    stride = chunk_tokens - overlap
    return f"""
WITH toks_t AS (
  SELECT doc_id, regexp_split_to_array(trim(coalesce(text, '')), '[\\t\\n\\x0b\\f\\r ]+') AS toks
  FROM documents
),
starts AS (
  SELECT doc_id, toks,
         generate_subscripts(
           range(0, greatest(1, len(toks) - {overlap}), {stride}), 1
         ) - 1 AS chunk_idx,
         unnest(range(0, greatest(1, len(toks) - {overlap}), {stride}))
           AS start
  FROM toks_t
)
SELECT doc_id,
       CAST(chunk_idx AS BIGINT) AS chunk_idx,
       array_to_string(toks[start + 1 : start + {chunk_tokens}], ' ') AS chunk_text,
       CAST(len(toks[start + 1 : start + {chunk_tokens}]) AS BIGINT) AS n_tokens
FROM starts
ORDER BY doc_id, chunk_idx
"""


def split_by_hash(
    df: DataFrame, key_col: str = "doc_id", val_permille: int = VAL_PERMILLE
) -> DataFrame:
    """Deterministic train/validation assignment by stable content of
    ``key_col``: bucket = first 8 md5 hex digits mod 1000.

    md5 (not xxhash64/rand) so the split is reproducible bit-for-bit in
    Spark, DuckDB, and Python — re-runs and engine migrations never move a
    document across the split boundary.
    """
    bucket = (
        F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 1000
    )
    return df.withColumn("split_bucket", bucket).withColumn(
        "split",
        F.when(F.col("split_bucket") < val_permille, F.lit("val")).otherwise(
            F.lit("train")
        ),
    )


def oracle_split_by_hash(val_permille: int = VAL_PERMILLE) -> str:
    return f"""
WITH b AS (
  SELECT doc_id,
         list_reduce(
           list_transform(
             string_split_regex(substr(md5(CAST(doc_id AS VARCHAR)), 1, 8), ''),
             c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)
           ),
           (a, x) -> a * 16 + x
         ) % 1000 AS split_bucket
  FROM documents
)
SELECT doc_id, split_bucket,
       CASE WHEN split_bucket < {val_permille} THEN 'val' ELSE 'train' END AS split
FROM b ORDER BY doc_id
"""


def pack_sequences(
    docs_with_tokens: DataFrame,
    budget: int = PACK_BUDGET,
    group_col: str = "source",
) -> DataFrame:
    """Streaming sequence packing: within each ``group_col`` stream in
    stable doc_id order, assign bin = number of completed budgets before
    this document's tokens start.

    ``docs_with_tokens`` needs doc_id, ``group_col``, n_tokens. Output
    adds ``bin`` and ``bin_offset`` (token offset inside the bin). A
    document longer than the budget occupies its own bin(s) — offsets are
    exact, truncation policy is the trainer's call.
    """
    w = (
        Window.partitionBy(group_col)
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    start = (cum - F.col("n_tokens")).cast("long")
    return docs_with_tokens.select(
        "doc_id",
        group_col,
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.floor(start / budget).cast("long").alias("bin"),
        (start % budget).cast("long").alias("bin_offset"),
    )


def oracle_pack_sequences(budget: int = PACK_BUDGET) -> str:
    return f"""
WITH t AS (
  SELECT doc_id, source,
         CAST(len(regexp_split_to_array(trim(coalesce(text, '')), '[\\t\\n\\x0b\\f\\r ]+'))
              AS BIGINT) AS n_tokens
  FROM documents
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
       CAST(start // {budget} AS BIGINT) AS bin,
       CAST(start % {budget} AS BIGINT) AS bin_offset
FROM c ORDER BY doc_id
"""


# --- gated query wrappers -------------------------------------------------
# (spark, sf_dir) -> DataFrame closures over the documents table, feeding
# the driver's correctness gate with the module defaults.


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def chunk_documents_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return chunk_documents(_docs(spark, sf_dir))


def split_by_hash_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return split_by_hash(_docs(spark, sf_dir).select("doc_id")).select(
        "doc_id", "split_bucket", "split"
    )


def pack_sequences_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    with_tokens = _docs(spark, sf_dir).select(
        "doc_id",
        "source",
        F.size(F.split(F.trim(F.coalesce("text", F.lit(""))), r"\s+"))
        .cast("long")
        .alias("n_tokens"),
    )
    return pack_sequences(with_tokens)


QUERIES = {
    "chunk_documents": chunk_documents_query,
    "split_by_hash": split_by_hash_query,
    "pack_sequences": pack_sequences_query,
}

ORACLES = {
    "chunk_documents": oracle_chunk_documents(),
    "split_by_hash": oracle_split_by_hash(),
    "pack_sequences": oracle_pack_sequences(),
}


def pack_sequences_segmented(
    docs_with_tokens: DataFrame,
    budget: int = PACK_BUDGET,
    group_col: str = "source",
    segment_size: int = 100_000,
) -> DataFrame:
    """Skew-safe twin of ``pack_sequences`` — bit-identical output, but a
    dominant group no longer serializes through a single window partition.

    ``pack_sequences`` partitions its running-sum window by ``group_col``
    alone; at 100 TB one hot source (a crawl that is 40% of the corpus)
    would put its whole token stream on one executor, and AQE cannot split
    a window the way it splits a skewed join. The remedy is the standard
    two-pass prefix-sum decomposition:

    1. segment = floor(doc_id / segment_size) — contiguous doc_id ranges,
       so concatenating segments in order preserves the stream order the
       packer is defined over;
    2. the heavy running-sum window runs per (group, segment) — the hot
       group now spreads over ~max_doc_id/segment_size partitions;
    3. per-segment token totals (one tiny row per segment) get an
       exclusive prefix sum over segments within the group — a window
       over a frame that is orders of magnitude smaller than the data;
    4. global start = segment prefix + local running start, joined back
       on (group, segment). Integer sums throughout → exactly the bins
       and offsets the one-window form produces (pinned by test).
    """
    seg = (F.col("doc_id") / segment_size).cast("long").alias("_seg")
    local_w = (
        Window.partitionBy(group_col, "_seg")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = docs_with_tokens.select(
        "doc_id",
        group_col,
        F.col("n_tokens").cast("long").alias("n_tokens"),
        seg,
    ).withColumn(
        "_local_start", F.sum("n_tokens").over(local_w) - F.col("n_tokens")
    )
    seg_totals = local.groupBy(group_col, "_seg").agg(
        F.sum("n_tokens").alias("_seg_tokens")
    )
    seg_w = (
        Window.partitionBy(group_col)
        .orderBy("_seg")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    seg_offsets = seg_totals.withColumn(
        "_seg_offset", F.sum("_seg_tokens").over(seg_w) - F.col("_seg_tokens")
    ).select(group_col, "_seg", "_seg_offset")
    start = (F.col("_seg_offset") + F.col("_local_start")).cast("long")
    return (
        local.join(seg_offsets, [group_col, "_seg"])
        .select(
            "doc_id",
            group_col,
            "n_tokens",
            F.floor(start / budget).cast("long").alias("bin"),
            (start % budget).cast("long").alias("bin_offset"),
        )
    )
