"""Interleaved A/B of events_in_order_window shapes (round-12 rewrite).

Shapes:
  bucket   — the round-9..11 bucket-explode pair join (orders exploded
             into week buckets, events probe, residual filter, per-order
             re-aggregation).
  bucket_sh— same, but with a SHUFFLE_HASH hint on the probe side
             (guide §3.1: avoid the sort-merge sorts at scale).
  profile  — the round-12 candidate-start inversion (events explode into
             ≤RANGE_DAYS midnight-aligned window starts, partial-agg to a
             (custkey, valid_from) profile, orders equi-join picks its
             cell).

Usage: python tools/ab_range_join.py <sf_dir> [reps]
Interleaved min-of-N with the bench's noop forcing.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from youtube_api_batch_process_with_analytics_spark.session import get_spark
from youtube_api_batch_process_with_analytics_spark.sources import load_table
from youtube_api_batch_process_with_analytics_spark.operators.temporal_joins import (
    RANGE_DAYS,
)


def _start():
    return F.to_timestamp(
        F.concat(
            F.lit("2024-01-"),
            F.lpad((F.dayofmonth("o_orderdate") % 28 + 1).cast("string"), 2, "0"),
        )
    )


def bucket(spark, sf_dir, shuffle_hash=False):
    events = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("custkey"), "ts", "event_id"
    )
    orders = load_table(spark, sf_dir, "orders")
    start = _start()
    intervals = orders.select(
        F.col("o_orderkey"),
        F.col("o_custkey").alias("custkey"),
        start.alias("valid_from"),
        (start + F.expr(f"INTERVAL {RANGE_DAYS} DAYS")).alias("valid_to"),
    )
    exploded = intervals.select(
        "o_orderkey",
        "custkey",
        "valid_from",
        "valid_to",
        F.explode(
            F.sequence(
                F.date_trunc("week", "valid_from"),
                F.date_trunc("week", "valid_to"),
                F.expr("INTERVAL 1 WEEK"),
            )
        ).alias("bucket"),
    )
    probes = events.withColumn("bucket", F.date_trunc("week", "ts"))
    if shuffle_hash:
        probes = probes.hint("shuffle_hash")
    joined = probes.join(exploded, ["custkey", "bucket"]).filter(
        (F.col("ts") >= F.col("valid_from")) & (F.col("ts") < F.col("valid_to"))
    )
    return joined.groupBy("o_orderkey").agg(
        F.count("*").alias("n_events_in_window"),
        F.min("ts").alias("first_event"),
    )


def profile(spark, sf_dir):
    events = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("custkey"), "ts"
    )
    orders = load_table(spark, sf_dir, "orders")
    intervals = orders.select(
        F.col("o_orderkey"),
        F.col("o_custkey").alias("custkey"),
        _start().alias("valid_from"),
    )
    candidates = events.select(
        "custkey",
        "ts",
        F.explode(
            F.sequence(
                F.date_trunc("day", F.col("ts"))
                - F.expr(f"INTERVAL {RANGE_DAYS - 1} DAYS"),
                F.date_trunc("day", F.col("ts")),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("valid_from"),
    )
    prof = candidates.groupBy("custkey", "valid_from").agg(
        F.count("*").alias("n_events_in_window"),
        F.min("ts").alias("first_event"),
    )
    return intervals.join(prof, ["custkey", "valid_from"]).select(
        "o_orderkey", "n_events_in_window", "first_event"
    )


def main():
    sf_dir = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark(app_name="ab_range_join")
    shapes = {
        "bucket": lambda: bucket(spark, sf_dir),
        "bucket_sh": lambda: bucket(spark, sf_dir, shuffle_hash=True),
        "profile": lambda: profile(spark, sf_dir),
    }
    times = {k: [] for k in shapes}
    for r in range(reps):
        for k, fn in shapes.items():
            spark.sparkContext.setJobDescription(f"ab_range_join {k} rep{r}")
            t0 = time.time()
            fn().write.format("noop").mode("overwrite").save()
            times[k].append(round(time.time() - t0, 3))
    for k, ts in times.items():
        print(f"{k:10s} min={min(ts):7.3f}  reps={ts}")
    spark.stop()


if __name__ == "__main__":
    main()
