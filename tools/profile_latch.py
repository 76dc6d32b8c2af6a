"""Phase profile for the quota-latch gate query (round-9 verdict item 2).

Breaks quota_latch_final's wall-clock into its phases at any tier:

- ``stage``   — one-time staged-source write (memoized per session/corpus;
  excluded from warm cost by construction)
- ``start``   — streaming query planning + start
- ``stream``  — awaitTermination + stop (addBatch dominates; the
  engine-reported durationMs breakdown prints per batch)
- ``final``   — the memory-sink SQL (dedup window + read)

Round-10 findings on this box (local[32], min of 3 warm reps, sf1 =
1M events / 1500 keys):

  before sizing fix (4 staged files, 8 state partitions, 10k Arrow
  batches):   4.95 s warm, addBatch ~4.6 s (93%)
  after  (split-count staging, byte-sized state partitions ~27, 64k
  Arrow batches):   ~2.4 s warm, addBatch ~1.9 s (~85%)

The remaining floor is Spark's stateful-streaming data path itself —
Arrow round-trip of every event row through the Python state workers plus
per-batch state-store commits — not the staging plumbing (memoized out)
and not fixed engine startup (start+final ≈ 0.4 s). A JVM-side per-batch
pre-aggregate would cut it further but requires chaining a streaming
aggregation before applyInPandasWithState, which Spark disallows
(multiple stateful operators in update mode); compacting state rows any
other way would move query work into the staging step, which the gate
deliberately refuses to do.

Usage: python tools/profile_latch.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from youtube_api_batch_process_with_analytics_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "testdata_sf1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from youtube_api_batch_process_with_analytics_spark.operators.memo import (
        release_session_frames,
    )
    from youtube_api_batch_process_with_analytics_spark.streaming.state import (
        quota_latch_final,
    )

    spark = get_spark(app_name="profile_latch")
    # warm the Python worker pool once (a long-lived cluster pays this
    # once, not per query — same contract as bench.py)
    para = spark.sparkContext.defaultParallelism
    spark.range(0, para, 1, para).mapInPandas(
        lambda b: b, "id long"
    ).write.mode("overwrite").format("noop").save()

    t0 = time.perf_counter()
    quota_latch_final(spark, sf_dir).count()
    cold = time.perf_counter() - t0
    print(f"cold (includes one-time staging): {cold:.2f}s")

    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        quota_latch_final(spark, sf_dir).count()
        best = min(best, time.perf_counter() - t0)
    print(f"warm best of {reps}: {best:.2f}s")

    # phase breakdown of one more run, via the engine's own progress
    import uuid

    from youtube_api_batch_process_with_analytics_spark.sources import load_table
    from youtube_api_batch_process_with_analytics_spark.streaming.state import (
        LATCH_GATE_QUOTA,
        _latch_src_acquire,
        _latch_src_release,
        quota_latch_stream,
    )

    events = load_table(spark, sf_dir, "events").select("user_id", "event_type")
    src = _latch_src_acquire(spark, sf_dir, events)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    preva = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    try:
        staged_bytes = sum(
            os.path.getsize(os.path.join(src, f))
            for f in os.listdir(src)
            if f.endswith(".parquet")
        )
        n_parts = max(8, min(para, staged_bytes // 65_536))
        spark.conf.set("spark.sql.shuffle.partitions", str(n_parts))
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        name = "latch_prof_" + uuid.uuid4().hex[:8]
        ta = time.perf_counter()
        stream = spark.readStream.schema(events.schema).parquet(src)
        q = (
            quota_latch_stream(stream, quota=LATCH_GATE_QUOTA)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        tb = time.perf_counter()
        q.awaitTermination(300)
        q.stop()
        tc = time.perf_counter()
        w = "(partition by key_id order by total_requests desc)"
        spark.sql(
            f"select * from (select *, row_number() over {w} as rn from {name})"
            " where rn = 1"
        ).drop("rn").count()
        td = time.perf_counter()
        print(
            f"phases: start={tb - ta:.2f}s stream={tc - tb:.2f}s "
            f"final_sql={td - tc:.2f}s  (state partitions={n_parts}, "
            f"staged_bytes={staged_bytes})"
        )
        for p in q.recentProgress:
            print(
                f"  batch {p['batchId']}: rows={p['numInputRows']} "
                f"durationMs={p['durationMs']}"
            )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", preva)
        _latch_src_release(src)
    release_session_frames()
    spark.stop()


if __name__ == "__main__":
    main()
