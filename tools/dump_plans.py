"""Dump ``explain("formatted")`` for named queries to plans/<tag>/.

The optimization rounds commit the physical plan of every touched query
before and after the change (plans/r12/<query>_before.txt / _after.txt)
so plan-shape claims in OPTIMIZATION_r12.md are checkable without a
Spark installation.

Usage:
    python tools/dump_plans.py <sf_dir> <suffix> <query> [query ...]
    python tools/dump_plans.py /root/testdata/sf0.01 after events_in_order_window

Writes plans/r12/<query>_<suffix>.txt relative to THIS repo checkout
(so running it from a worktree of an older commit captures that
commit's plans — used for the "before" side of inherited changes).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from youtube_api_batch_process_with_analytics_spark.session import get_spark


def main() -> None:
    sf_dir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    out_dir = os.environ.get(
        "SPARK_GRAFT_PLANS_DIR",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "plans",
            "r12",
        ),
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="dump_plans")
    qs = entrymod.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        text = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(text)
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
