"""Spot-timer for a subset of registered queries, mirroring bench.py's
forcing and memo-release policy exactly (noop write, release between
queries, min of N reps). Usage:

    python tools/time_queries.py <sf_dir> [reps] query [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from youtube_api_batch_process_with_analytics_spark.operators.memo import (
    release_session_frames,
)
from youtube_api_batch_process_with_analytics_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1]
    if sys.argv[2].isdigit():
        reps, names = int(sys.argv[2]), sys.argv[3:]
    else:
        reps, names = 3, sys.argv[2:]
    spark = get_spark(app_name="time_queries")
    qs = entrymod.queries()

    def force(df):
        df.write.mode("overwrite").format("noop").save()

    force(list(qs.values())[0](spark, sf_dir))  # session warm-up
    para = spark.sparkContext.defaultParallelism
    force(
        spark.range(0, para, 1, para).mapInPandas(
            lambda batches: batches, "id long"
        )
    )
    for name in names:
        release_session_frames()
        samples = []
        for _ in range(reps):
            t0 = time.perf_counter()
            force(qs[name](spark, sf_dir))
            samples.append(round(time.perf_counter() - t0, 3))
        print(f"{name:32s} min={min(samples):7.3f}  reps={samples}", flush=True)
    release_session_frames()
    spark.stop()


if __name__ == "__main__":
    main()
