"""Differential test for benchmark decontamination (shared-shingle join)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.oracle_utils import assert_oracle_match
from youtube_api_batch_process_with_analytics_spark.operators.dedup import (
    benchmark_contamination,
)
from youtube_api_batch_process_with_analytics_spark.sources import load_table

_ORACLE = """
WITH dt AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
  FROM documents
),
ds AS (
  SELECT doc_id,
         list_distinct(CASE WHEN len(toks) >= 3
           THEN list_transform(generate_series(1, len(toks) - 2),
                i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
           ELSE [list_aggregate(toks, 'string_agg', ' ')] END) AS shingles
  FROM dt
),
d AS (SELECT doc_id, unnest(shingles) AS shingle FROM ds),
b AS (
  SELECT doc_id AS bench_id, shingle
  FROM (SELECT doc_id, unnest(shingles) AS shingle FROM ds)
  WHERE doc_id % 100 = 0
)
SELECT d.doc_id, b.bench_id, COUNT(*) AS shared_shingles
FROM d JOIN b USING (shingle)
GROUP BY d.doc_id, b.bench_id
HAVING COUNT(*) >= 3
ORDER BY doc_id, bench_id
"""


def test_contamination_matches_oracle(spark, duck, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    bench = docs.filter(F.col("doc_id") % 100 == 0).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    out = benchmark_contamination(docs, bench)
    assert_oracle_match(out, duck, _ORACLE)


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
