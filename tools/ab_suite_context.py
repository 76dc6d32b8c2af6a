"""Suite-context inflation probe (round-10 verdict item 1).

Round-10's committed sf1 numbers showed the UNCHANGED text/ranking
family 2-4× slower in-suite than isolated (winnowing 6.29s committed vs
2.45s isolated), suspected to be session pressure from the enlarged
clustering/retention families. This probe reproduces or falsifies the
mechanism INSIDE ONE SESSION (host drift makes cross-session deltas
meaningless):

  phase A — time the text family in a fresh session (bench policy:
            release between queries, min of 3 reps);
  phase B — run the heavy pressure block once (clustering fits, the
            retention staging, embedding dedup), exactly the queries
            that precede the text family alphabetically in bench.py's
            sorted order;
  phase C — re-time the text family (same policy);
  phase D — force python gc + JVM System.gc(), re-time once more.

A≈C: no in-session accumulation (committed deltas were host drift or
cross-session artifacts). C slow + D fast: reclaimable storage pressure
(checkpoint blocks awaiting ContextCleaner) — bench hygiene fix. C and
D both slow: genuine leak — find it.

Usage: python tools/ab_suite_context.py [sf_dir]
"""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from youtube_api_batch_process_with_analytics_spark.operators.memo import (
    release_session_frames,
)
from youtube_api_batch_process_with_analytics_spark.session import get_spark

TEXT_FAMILY = [
    "winnowing_fingerprints",
    "bm25_search",
    "doc_repetition_stats",
    "doc_text_stats",
    "approx_usage_sketch",
]
PRESSURE = [
    "semantic_dedup",
    "semantic_dedup_gate_combined",
    "ann_ivf_kmeans",
    "ivf_pq_topk",
    "dedup_embedding_cosine",
    "dedup_connected_components",
    "retention_applied",
    "duplicate_spans",
    "remove_duplicate_spans",
    "export_pipeline",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "testdata_sf1"
    spark = get_spark(app_name="ab_suite_context")
    qs = entrymod.queries()

    def force(df):
        df.write.mode("overwrite").format("noop").save()

    def time_family(label):
        out = {}
        for name in TEXT_FAMILY:
            release_session_frames()
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                force(qs[name](spark, sf_dir))
                best = min(best, time.perf_counter() - t0)
            out[name] = round(best, 2)
        release_session_frames()
        print(f"{label}: {out}  sum={round(sum(out.values()), 2)}")
        return out

    def storage():
        return spark.sparkContext._jsc.getPersistentRDDs().size()

    force(list(qs.values())[0](spark, sf_dir))  # session warm-up
    a = time_family("A fresh   ")
    print(f"  persistent RDDs before pressure: {storage()}")
    for name in PRESSURE:
        release_session_frames()
        force(qs[name](spark, sf_dir))
    release_session_frames()
    print(f"  persistent RDDs after pressure:  {storage()}")
    c = time_family("C post-heat")
    gc.collect()
    spark.sparkContext._jvm.System.gc()
    time.sleep(2)
    print(f"  persistent RDDs after gc:        {storage()}")
    d = time_family("D post-gc ")
    worst = max(c[n] / a[n] for n in TEXT_FAMILY if a[n] > 0.05)
    print(f"max C/A inflation: {worst:.2f}  "
          f"(>1.25 = in-session accumulation reproduced)")
    spark.stop()


if __name__ == "__main__":
    main()
