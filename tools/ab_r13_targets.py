"""Single-session interleaved A/B of the round-13 operator rewrites.

Cross-process A/Bs flip winners on this box (documented ±10% drift, and
this round's sandbox measured a 2x contended-vs-idle swing on the same
HEAD) — the credible protocol is one session, shapes interleaved
(A B A B ...), min per variant. BEFORE shapes are reconstructed inline
verbatim from the round-12 close HEAD (096cd51).

Pairs:
  seeded — key_rotation_seeded: persist raw admitted + separate slots
           window / pool groupBy (before) vs persist the WINDOWED
           slots+n_keys dim, pool = cache-side slot==0 filter (after =
           live operator).
  asof   — events_asof_latest_order: per-column last(ignorenulls) carry
           (before) vs single struct-atomic carry (after = live).

Usage: python tools/ab_r13_targets.py <sf_dir> [reps] [pair ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from youtube_api_batch_process_with_analytics_spark.session import get_spark
from youtube_api_batch_process_with_analytics_spark.sources import load_table
from youtube_api_batch_process_with_analytics_spark.operators import (
    temporal_joins as tj,
    windows as wn,
)
from youtube_api_batch_process_with_analytics_spark.operators.memo import (
    release_session_frames,
    track_persisted,
)


def seeded_before(spark, sf_dir) -> DataFrame:
    """Verbatim round-12 key_rotation_seeded (windows.py @ 096cd51)."""
    events = load_table(spark, sf_dir, "events")
    admitted = track_persisted(wn._admitted_pool(events).persist())
    slot_w = W.partitionBy("day").orderBy(F.col("key_id").asc())
    slots = admitted.select(
        "day", "key_id", (F.row_number().over(slot_w) - 1).alias("slot")
    )
    pool = admitted.groupBy("day").agg(F.count("*").alias("n_keys"))
    draw = F.conv(
        F.substring(
            F.md5(
                F.concat(F.lit(wn.ROT_SALT), F.col("event_id").cast("string"))
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    requests = events.select(
        F.date_trunc("day", F.col("ts")).alias("day"), "event_id"
    ).withColumn("_draw", draw)
    assigned = (
        requests.join(F.broadcast(pool), "day")
        .withColumn("slot", F.col("_draw") % F.col("n_keys"))
        .join(F.broadcast(slots), ["day", "slot"])
    )
    return (
        assigned.groupBy(F.col("day").cast("date").alias("day"), "key_id")
        .agg(
            F.count("*").alias("served_requests"),
            F.min("event_id").alias("first_event_id"),
        )
        .select("day", "key_id", "served_requests", "first_event_id")
    )


def asof_before(spark, sf_dir) -> DataFrame:
    """Verbatim round-12 events_asof_latest_order (per-column carry)."""
    events = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("custkey"), F.col("ts"), "event_id"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderdate").alias("ts"),
        F.col("o_totalprice").alias("asof_price"),
        F.col("o_orderstatus").alias("asof_status"),
    )
    left, right = orders, events
    key, time_col = "custkey", "ts"
    value_cols = ["asof_price", "asof_status"]
    passthrough = [c for c in right.columns if c not in (key, time_col)]
    lhs = left.select(
        F.col(key), F.col(time_col), F.lit(0).alias("_side"),
        *[F.col(c) for c in value_cols],
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(c)
            for c in passthrough
        ],
    )
    rhs = right.select(
        F.col(key), F.col(time_col), F.lit(1).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in value_cols],
        *[F.col(c) for c in passthrough],
    )
    unioned = lhs.unionByName(rhs)
    order = [F.col(time_col).asc(), F.col("_side").asc()]
    order += [F.col(c).asc() for c in value_cols]
    w = (
        W.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = unioned.select(
        key,
        time_col,
        "_side",
        *passthrough,
        *[
            F.last(F.col(c), ignorenulls=True).over(w).alias(c)
            for c in value_cols
        ],
    )
    out = filled.filter(F.col("_side") == 1).drop("_side")
    return out.select("event_id", "custkey", "ts", "asof_price", "asof_status")


PAIRS = {
    "seeded": (
        seeded_before,
        lambda s, d: wn.key_rotation_seeded(s, d),
    ),
    "asof": (
        asof_before,
        lambda s, d: tj.events_asof_latest_order(s, d),
    ),
}


def _force(df):
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    sf_dir = sys.argv[1]
    rest = sys.argv[2:]
    reps = 6
    if rest and rest[0].isdigit():
        reps, rest = int(rest[0]), rest[1:]
    names = rest or list(PAIRS)
    spark = get_spark(app_name="ab_r13_targets")
    _force(spark.range(1000).selectExpr("id", "id * 2 AS x"))
    results: dict[str, dict[str, float]] = {}
    for name in names:
        before_fn, after_fn = PAIRS[name]
        best = {"before": float("inf"), "after": float("inf")}
        for rep in range(reps):
            for tag, fn in (("before", before_fn), ("after", after_fn)):
                release_session_frames()
                spark.sparkContext.setJobDescription(f"ab13 {name}:{tag}")
                t0 = time.perf_counter()
                _force(fn(spark, sf_dir))
                best[tag] = min(best[tag], time.perf_counter() - t0)
        release_session_frames()
        results[name] = {k: round(v, 3) for k, v in best.items()}
        print(
            f"{name}: before={best['before']:.3f} after={best['after']:.3f} "
            f"speedup={best['before'] / best['after']:.2f}x",
            flush=True,
        )
    import json

    print(json.dumps({"sf_dir": sf_dir, "reps": reps, "results": results}))
    spark.stop()


if __name__ == "__main__":
    main()
