"""Approximate aggregates for the 100 TB design point (SURVEY.md §2.5 note).

The reference never needs approximation (thousands of rows); at 100 TB,
exact COUNT(DISTINCT) over a high-cardinality key costs a distinct-expand
shuffle of every key occurrence, while HyperLogLog++ merges fixed-size
sketches map-side — constant shuffle bytes per partition. Same trade for
exact percentiles vs t-digest-style ``percentile_approx``.

These are registered as rows-only gate entries (approximation is
inherently not hash-matchable against an exact SQL oracle); the unit
tests instead bound the error vs the exact answer, which is the correct
contract for a sketch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table

HLL_RSD = 0.02  # ~2% relative standard deviation


def approx_usage_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event_type: HLL++ distinct users and approximate value
    percentiles — the sketch twins of ``distinct_usage_stats``."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=HLL_RSD).alias(
                "approx_distinct_users"
            ),
            F.percentile_approx("value", [0.5, 0.95, 0.99], 10_000).alias(
                "value_pcts"
            ),
            F.count("*").alias("n_events"),
        )
        .select(
            "event_type",
            "approx_distinct_users",
            F.round(F.element_at("value_pcts", 1), 2).alias("p50"),
            F.round(F.element_at("value_pcts", 2), 2).alias("p95"),
            F.round(F.element_at("value_pcts", 3), 2).alias("p99"),
            "n_events",
        )
    )


QUERIES = {"approx_usage_sketch": approx_usage_sketch}
ORACLES: dict[str, str] = {}  # rows-only by design: sketches are not hash-matchable
