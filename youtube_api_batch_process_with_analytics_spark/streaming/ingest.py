"""Incremental corpus ingest: dedup a document stream against history.

The production shape of exact dedup (operators/dedup.py ``dedup_exact``)
is incremental: new crawl shards arrive continuously and must be dropped
if their content already exists in the curated corpus. In Spark that is a
**stream-static left-anti join** on the content fingerprint:

- the static side (historical fingerprints) is a normal DataFrame — at
  100 TB a parquet/Delta fingerprint table, pruned to the single
  ``fingerprint`` column at the scan;
- stream-static equi-joins are **stateless**: each micro-batch joins
  against the static table and carries no streaming state, so state never
  grows with corpus size (unlike stream-stream joins);
- duplicates *within* the stream are a separate concern with event-time
  semantics — ``dropDuplicatesWithinWatermark`` (pinned in
  tests/test_streaming.py) — composable in front of this operator.

The reference has no streaming surface (SURVEY.md §2.9: its state is
quota/cache counters); this operator belongs to the LLM-pipeline
extension set, streaming twin of the batch dedup family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def content_fingerprint(text_col: str = "text"):
    """md5 of the raw text — the same fingerprint the batch ``dedup_exact``
    operator groups on, so batch-curated history and streaming ingest
    agree on identity."""
    return F.md5(F.coalesce(F.col(text_col), F.lit("")))


def incremental_dedup_stream(
    new_docs: DataFrame, history: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Drop streamed documents whose fingerprint already exists in
    ``history``. Emits surviving rows with their ``fingerprint`` attached
    (downstream appends them to the fingerprint table, making the next
    shard's history complete).
    """
    hist_fp = history.select(
        content_fingerprint(text_col).alias("fingerprint")
    ).distinct()
    return new_docs.withColumn(
        "fingerprint", content_fingerprint(text_col)
    ).join(hist_fp, "fingerprint", "left_anti")
