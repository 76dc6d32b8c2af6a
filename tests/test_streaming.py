"""Structured Streaming tests: feed the quota/level transforms from a file
stream of the events table and check the aggregates match the batch analog."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from youtube_api_batch_process_with_analytics_spark.sources import load_table
from youtube_api_batch_process_with_analytics_spark.streaming import (
    quota_usage_stream,
    watermarked_level_counts,
)


@pytest.fixture()
def event_stream(spark, sf_dir, tmp_path):
    batch = load_table(spark, sf_dir, "events")
    # file-source stream with the exact batch schema (ts already micros)
    path = str(tmp_path / "events_stream")
    batch.write.mode("overwrite").parquet(path)
    return spark.readStream.schema(batch.schema).parquet(path), batch


def _run_to_memory(df, name):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_quota_usage_stream_matches_batch(spark, event_stream):
    stream_df, batch = event_stream
    q = _run_to_memory(quota_usage_stream(stream_df), "quota_stream")
    try:
        got = {
            (r.key_id, r.window_start): (r.requests, r.failures, r.quota_warning)
            for r in spark.sql("select * from quota_stream").collect()
        }
        expected = {
            (r.user_id, r.ws): (r.requests, r.failures)
            for r in batch.groupBy(
                "user_id", F.date_trunc("hour", "ts").alias("ws")
            )
            .agg(
                F.count("*").alias("requests"),
                F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias(
                    "failures"
                ),
            )
            .collect()
        }
        assert len(got) == len(expected) > 0
        for k, (req, fail) in expected.items():
            assert got[k][0] == req and got[k][1] == fail
            assert got[k][2] is (req >= 900)
    finally:
        q.stop()


def test_watermarked_level_counts(spark, event_stream):
    stream_df, batch = event_stream
    q = _run_to_memory(watermarked_level_counts(stream_df), "level_stream")
    try:
        got = spark.sql("select sum(cnt) as n from level_stream").collect()[0].n
        assert got == batch.count()
    finally:
        q.stop()
