"""One-session A/B of benchmark_contamination guard shapes at a given
tier (host throughput drifts day-to-day on this box; only back-to-back
in-session ratios are trustworthy — see README's host-variance note). Variants:

  window   — round-9/10 shipped shape: count(*) OVER (PARTITION BY shingle)
  agg      — groupBy df table + broadcast anti-join of stop shingles
  prefilter— bench-relevant semi filter FIRST, then the agg guard on the
             slice (per-shingle filter, so retained dfs are unchanged)

Usage: python tools/ab_contamination.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql import Window

from youtube_api_batch_process_with_analytics_spark.operators import dedup as dd
from youtube_api_batch_process_with_analytics_spark.operators.memo import (
    release_session_frames,
    track_persisted,
)
from youtube_api_batch_process_with_analytics_spark.sources import spread
from youtube_api_batch_process_with_analytics_spark.session import get_spark
from youtube_api_batch_process_with_analytics_spark.sources import load_table


def build(spark, sf_dir, variant, df_cap=dd.NGRAM_DF_CAP,
          min_shared=dd.CONTAMINATION_MIN_SHARED):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    bench = docs.filter(F.col("doc_id") % 100 == 0).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    d_sh = track_persisted(
        spread(
            docs.selectExpr("doc_id", f"{dd._TOKS_SPARK} AS toks").selectExpr(
                "doc_id", f"{dd._SHINGLES_FROM_TOKS_SPARK} AS shingles"
            )
        ).persist()
    )
    posts = d_sh.select("doc_id", F.explode_outer("shingles").alias("shingle"))
    b_sh = track_persisted(
        spread(
            bench.selectExpr("bench_id", f"{dd._TOKS_SPARK} AS toks").selectExpr(
                "bench_id", f"{dd._SHINGLES_FROM_TOKS_SPARK} AS shingles"
            )
        ).persist()
    )
    b_posts = b_sh.select("bench_id", F.explode_outer("shingles").alias("shingle"))
    if variant == "window":
        keep = posts.withColumn(
            "_df", F.count("*").over(Window.partitionBy("shingle"))
        ).filter(F.col("_df") <= df_cap)
    elif variant == "agg":
        stop = (
            posts.groupBy("shingle").agg(F.count("*").alias("_df"))
            .filter(F.col("_df") > df_cap).select("shingle")
        )
        keep = posts.join(F.broadcast(stop), "shingle", "left_anti")
    elif variant == "prefilter":
        rel = posts.join(
            F.broadcast(b_posts.select("shingle")), "shingle", "left_semi"
        )
        stop = (
            rel.groupBy("shingle").agg(F.count("*").alias("_df"))
            .filter(F.col("_df") > df_cap).select("shingle")
        )
        keep = rel.join(F.broadcast(stop), "shingle", "left_anti")
    else:
        raise ValueError(variant)
    cand = (
        keep.join(F.broadcast(b_posts), "shingle")
        .select("doc_id", "bench_id")
        .distinct()
    )
    return (
        cand.join(d_sh, "doc_id")
        .join(F.broadcast(b_sh.select("bench_id", F.col("shingles").alias("b_sh"))),
              "bench_id")
        .select(
            "doc_id", "bench_id",
            F.size(F.array_intersect("shingles", "b_sh")).cast("long")
            .alias("shared_shingles"),
        )
        .filter(F.col("shared_shingles") >= min_shared)
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "testdata_sf3"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark(app_name="ab_contamination")
    variants = ["window", "agg", "prefilter"]

    def force(df):
        df.write.mode("overwrite").format("noop").save()

    # Materialize the shingle frames ONCE and keep them across all reps:
    # the fit is identical for every variant and otherwise swamps the
    # guard-stage difference this A/B exists to measure.
    for v in variants:  # warm-up + plan compile of each variant
        force(build(spark, sf_dir, v))
    times = {v: [] for v in variants}
    hashes = {}
    for r in range(reps):
        for v in variants:  # interleaved, not blocked
            t0 = time.time()
            force(build(spark, sf_dir, v))
            times[v].append(time.time() - t0)
    for v in variants:
        rows = sorted(map(tuple, build(spark, sf_dir, v).collect()))
        hashes[v] = (len(rows), hash(tuple(rows)))
    for v in variants:
        ts = ", ".join(f"{t:.2f}" for t in times[v])
        print(
            f"{v:10s} min={min(times[v]):6.2f} "
            f"med={sorted(times[v])[len(times[v]) // 2]:6.2f}  "
            f"reps=[{ts}]  out={hashes[v]}"
        )
    assert len({h for h in hashes.values()}) == 1, "variants disagree!"
    print("all variants produce identical output (warm guard stage only)")
    release_session_frames()
    spark.stop()


if __name__ == "__main__":
    main()
