"""Differential test for benchmark decontamination (shared-shingle join)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.oracle_utils import assert_oracle_match
from youtube_api_batch_process_with_analytics_spark.operators.dedup import (
    ORACLE_BENCHMARK_CONTAMINATION,
    benchmark_contamination,
    benchmark_contamination_query,
)
from youtube_api_batch_process_with_analytics_spark.sources import load_table


def test_contamination_matches_oracle(spark, duck, sf_dir):
    out = benchmark_contamination_query(spark, sf_dir)
    assert_oracle_match(out, duck, ORACLE_BENCHMARK_CONTAMINATION)


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
