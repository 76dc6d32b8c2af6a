"""Multi-dimensional grouping surface: ROLLUP / CUBE / PIVOT.

The reference's {type}×{window} metric matrix (youtube_api_handler.py:
569-595) is semantically a grouping-sets computation (SURVEY.md §2.5 A4 —
implemented one-pass in ``analytics/channel.py``); these operators expose
the general forms the engine gets from Catalyst for free. All three are
single-shuffle hash aggregates: rollup/cube expand grouping sets BEFORE
the shuffle (each input row fans out to its grouping-set combinations in
the partial aggregate), and pivot is a conditional aggregation — there is
no per-cell pass anywhere.

Money sums route through DECIMAL(18,2) (exact, order-independent) before
the final double cast, so hashes match the oracle at any parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table, spread

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP(l_returnflag, l_linestatus): per-cell, per-flag, and grand
    totals, with grouping_id distinguishing levels.

    Scale shape: a direct ``rollup`` fans every input row into all three
    grouping sets before the shuffle — 3× the map-side aggregation work
    and shuffle rows. Because count/sum are additive, the engine instead
    aggregates once at the finest grain (a few cells) and rollups over
    that tiny base: same answer, one pass over the fact table. At 100 TB
    this cuts shuffle volume 3×. No ``spread`` here: partial aggregation
    collapses each scan split to a handful of cells before any exchange,
    so repartitioning the full fact table first would shuffle every row
    to save nothing — wrong locally and catastrophically wrong at scale."""
    li = load_table(spark, sf_dir, "lineitem")
    base = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("q"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("p"),
    )
    return (
        base.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().alias("gid"),
            F.sum("n").alias("n_items"),
            F.sum("q").cast("double").alias("sum_qty"),
            F.sum("p").cast("double").alias("sum_price"),
        )
    )


ORACLE_REVENUE_ROLLUP = """
SELECT l_returnflag, l_linestatus,
       GROUPING(l_returnflag, l_linestatus) AS gid,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY gid, l_returnflag, l_linestatus
"""


def daily_event_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: one row per day, one count column per event type. Explicit
    pivot values keep the schema static (required for any production job —
    value discovery would need an extra pass and a nondeterministic
    schema); compiles to a conditional aggregation, one shuffle."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .pivot("event_type", EVENT_TYPES)
        .count()
        .na.fill(0, EVENT_TYPES)
        .select(
            "day", *[F.col(t).alias(f"n_{t}") for t in EVENT_TYPES]
        )
    )


# CAST: DuckDB SUM(BIGINT) returns HUGEINT, which an Arrow/pandas fetch
# coerces to float64 ("4.0" vs Spark's "4") and the value hash diverges.
_PIVOT_COLS = ",\n       ".join(
    f"CAST(SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT)"
    f" AS n_{t}"
    for t in EVENT_TYPES
)

ORACLE_DAILY_EVENT_PIVOT = f"""
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       {_PIVOT_COLS}
FROM events
GROUP BY CAST(date_trunc('day', ts) AS TIMESTAMP)
ORDER BY day
"""


QUERIES = {
    "revenue_rollup": revenue_rollup,
    "daily_event_pivot": daily_event_pivot,
}

ORACLES = {
    "revenue_rollup": ORACLE_REVENUE_ROLLUP,
    "daily_event_pivot": ORACLE_DAILY_EVENT_PIVOT,
}
