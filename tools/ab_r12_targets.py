"""Single-session interleaved A/B of every round-12 operator rewrite.

Cross-process A/Bs flip winners on this box (documented ±10% drift, JIT
state, page cache); the credible protocol is one session, shapes
interleaved (A B A B ...), min per variant — this harness reconstructs
each query's BEFORE shape inline (verbatim from the b4ba06a HEAD) and
times it against the live operator.

Pairs:
  asof      — events_asof_latest_order: pre-dedup groupBy (before) vs
              window tie-break fold (after = live operator).
  in_order  — events_in_order_window: bucket-explode pair join (before)
              vs candidate-start profile (after = live operator).
  fms       — final_metrics_struct: matrix + pivot re-aggregate (before)
              vs single conditional aggregate (after = live operator).
  least_used / round_robin / seeded — the three rotation policies over
              the admission chain: two-exchange admission (before,
              inline) vs single-exchange admission (after = live).

Usage: python tools/ab_r12_targets.py <sf_dir> [reps] [pair ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from youtube_api_batch_process_with_analytics_spark.session import get_spark
from youtube_api_batch_process_with_analytics_spark.sources import load_table
from youtube_api_batch_process_with_analytics_spark.functions.ratios import (
    floor_div,
    safe_rate,
)
from youtube_api_batch_process_with_analytics_spark.operators import (
    temporal_joins as tj,
)
from youtube_api_batch_process_with_analytics_spark.operators import windows as wmod
from youtube_api_batch_process_with_analytics_spark.operators.memo import (
    release_session_frames,
)
from youtube_api_batch_process_with_analytics_spark.analytics import channel as ch


# ---------------------------------------------------------------- before shapes

def asof_before(spark, sf_dir):
    events = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("custkey"), F.col("ts"), "event_id"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderdate").alias("ts"),
        F.col("o_totalprice").alias("asof_price"),
        F.col("o_orderstatus").alias("asof_status"),
    )
    dedup = orders.groupBy("custkey", "ts").agg(
        F.max(F.struct("asof_price", "asof_status")).alias("v")
    ).select("custkey", "ts", "v.asof_price", "v.asof_status")
    out = tj.asof_join(
        dedup, events, key="custkey", time_col="ts",
        value_cols=["asof_price", "asof_status"],
    )
    return out.select("event_id", "custkey", "ts", "asof_price", "asof_status")


def in_order_before(spark, sf_dir):
    events = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("custkey"), "ts", "event_id"
    )
    orders = load_table(spark, sf_dir, "orders")
    start = F.to_timestamp(
        F.concat(
            F.lit("2024-01-"),
            F.lpad((F.dayofmonth("o_orderdate") % 28 + 1).cast("string"), 2, "0"),
        )
    )
    intervals = orders.select(
        F.col("o_orderkey"),
        F.col("o_custkey").alias("custkey"),
        start.alias("valid_from"),
        (start + F.expr(f"INTERVAL {tj.RANGE_DAYS} DAYS")).alias("valid_to"),
    )
    exploded = intervals.select(
        "o_orderkey", "custkey", "valid_from", "valid_to",
        F.explode(
            F.sequence(
                F.date_trunc("week", "valid_from"),
                F.date_trunc("week", "valid_to"),
                F.expr("INTERVAL 1 WEEK"),
            )
        ).alias("bucket"),
    )
    probes = events.withColumn("bucket", F.date_trunc("week", "ts"))
    joined = probes.join(exploded, ["custkey", "bucket"]).filter(
        (F.col("ts") >= F.col("valid_from")) & (F.col("ts") < F.col("valid_to"))
    )
    return joined.groupBy("o_orderkey").agg(
        F.count("*").alias("n_events_in_window"),
        F.min("ts").alias("first_event"),
    )


def fms_before(spark, sf_dir):
    flat = ch.channel_video_metrics(spark, sf_dir)

    def cell(t, w, col):
        return F.max(
            F.when((F.col("video_type") == t) & (F.col("window_n") == w), F.col(col))
        )

    def leaf(t, w):
        return F.struct(
            F.coalesce(cell(t, w, "video_count"), F.lit(0)).alias("video_count"),
            F.coalesce(cell(t, w, "avg_views"), F.lit(0).cast("long")).alias("avg_views"),
            F.coalesce(cell(t, w, "engagement_rate"), F.lit(0.0)).alias("er"),
        )

    def block(t):
        return F.struct(leaf(t, 6).alias("last_6"), leaf(t, 15).alias("last_15"))

    nested = flat.groupBy("channel_id").agg(
        block("O").alias("shorts_b"),
        block("F").alias("long_b"),
        block("overall").alias("overall_b"),
    ).select(
        "channel_id",
        F.struct(
            F.col("shorts_b").alias("shorts"),
            F.col("long_b").alias("long"),
            F.col("overall_b").alias("overall"),
        ).alias("final_metrics"),
    )
    cols = [F.col("channel_id")]
    for t, tag in (("shorts", "s"), ("long", "l"), ("overall", "o")):
        for w in (6, 15):
            for m in ("video_count", "avg_views", "er"):
                cols.append(
                    F.col(f"final_metrics.{t}.last_{w}.{m}").alias(f"{tag}{w}_{m}")
                )
    return nested.select(*cols)


def _admitted_pool_before(events: DataFrame) -> DataFrame:
    events = events.filter(F.col("user_id").isNotNull())
    hourly = events.groupBy(
        F.col("user_id").alias("key_id"),
        F.date_trunc("day", F.col("ts")).alias("day"),
        F.date_trunc("hour", F.col("ts")).alias("hour"),
    ).agg(F.count("*").alias("hour_cnt"))
    per_day = hourly.groupBy("key_id", "day").agg(
        F.sum("hour_cnt").alias("daily_cnt"),
        F.max("hour_cnt").alias("peak_hour_cnt"),
    )
    return per_day.filter(
        (F.col("daily_cnt") < wmod.DAILY_CAP)
        & (F.col("peak_hour_cnt") < wmod.HOURLY_CAP)
    )


def _with_admission(fn, admission):
    """Run a rotation query with the given admission implementation."""
    def run(spark, sf_dir):
        saved = wmod._admitted_pool
        wmod._admitted_pool = admission
        try:
            return fn(spark, sf_dir)
        finally:
            wmod._admitted_pool = saved
    return run


def main():
    sf_dir = sys.argv[1]
    rest = sys.argv[2:]
    reps = 4
    if rest and rest[0].isdigit():
        reps, rest = int(rest[0]), rest[1:]
    spark = get_spark(app_name="ab_r12_targets")
    pairs = {
        "asof": (asof_before, tj.events_asof_latest_order),
        "in_order": (in_order_before, tj.events_in_order_window),
        "fms": (fms_before, ch.final_metrics_struct),
        "least_used": (
            _with_admission(wmod.key_rotation_least_used, _admitted_pool_before),
            wmod.key_rotation_least_used,
        ),
        "round_robin": (
            _with_admission(wmod.key_rotation_round_robin, _admitted_pool_before),
            wmod.key_rotation_round_robin,
        ),
        "seeded": (
            _with_admission(wmod.key_rotation_seeded, _admitted_pool_before),
            wmod.key_rotation_seeded,
        ),
    }
    if rest:
        pairs = {k: v for k, v in pairs.items() if k in rest}
    times = {(k, s): [] for k in pairs for s in ("before", "after")}
    for r in range(reps):
        for k, (bf, af) in pairs.items():
            for side, fn in (("before", bf), ("after", af)):
                release_session_frames()
                spark.sparkContext.setJobDescription(f"ab {k} {side} rep{r}")
                t0 = time.time()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                times[(k, side)].append(round(time.time() - t0, 3))
    for k in pairs:
        b, a = times[(k, "before")], times[(k, "after")]
        print(
            f"{k:12s} before min={min(b):7.3f} after min={min(a):7.3f} "
            f"delta={100 * (min(a) - min(b)) / min(b):+6.1f}%  "
            f"reps_b={b} reps_a={a}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
