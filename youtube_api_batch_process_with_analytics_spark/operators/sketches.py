"""Approximate aggregates for the 100 TB design point (SURVEY.md §2.5 note).

The reference never needs approximation (thousands of rows); at 100 TB,
exact COUNT(DISTINCT) over a high-cardinality key costs a distinct-expand
shuffle of every key occurrence, while HyperLogLog++ merges fixed-size
sketches map-side — constant shuffle bytes per partition. Same trade for
exact percentiles vs t-digest-style ``percentile_approx``.

Sketch outputs are inherently not hash-matchable against an exact SQL
oracle, so the gated query verifies the sketch's *contract* instead: per
key it computes both the approximate and the exact answer in Spark and
emits deterministic within-bound booleans alongside the exact values; the
DuckDB oracle recomputes the exact side and asserts the bounds as
constants. A sketch whose error escapes its published bound turns the row
red. Raw sketch values stay covered by the error-bound unit tests
(tests/test_functions.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table

HLL_RSD = 0.02  # ~2% relative standard deviation
# Acceptance bound for the gate: 5σ. HLL++'s estimate is deterministic for
# fixed data, but the testdata is re-sampled between rounds, so the bound
# must hold for any draw — P(|err| > 5σ) ≈ 3e-7 per key.
HLL_BOUND = 5 * HLL_RSD
PCT_ACCURACY = 10_000  # percentile_approx rank error ≤ n/accuracy


def approx_usage_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event_type: exact distinct users + deterministic attestations
    that the HLL++ distinct-count and the approximate median respect their
    error bounds.

    ``hll_within_bound``: |approx − exact| / exact ≤ 5·rsd.
    ``p50_within_bound``: the rank of the approximate median among the
    group's values sits within the published rank-error guarantee
    (±1/accuracy, plus one-row discreteness slack) of 0.5 — checked via
    tie-aware ≤ / < counts, so value plateaus cannot fake a failure.
    """
    events = load_table(spark, sf_dir, "events")
    g = events.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("exact_distinct_users"),
        F.approx_count_distinct("user_id", rsd=HLL_RSD).alias("_approx_users"),
        F.percentile_approx("value", 0.5, PCT_ACCURACY).alias("_p50_approx"),
    )
    # Rank check needs one more pass over the values with the group's
    # approximate median attached. The join key is the event-type enum — a
    # bounded domain, so the broadcast is safe at any corpus size. The
    # join is NULL-SAFE: a NULL event_type is a real group out of the
    # aggregation, and a plain equi-join would silently drop it (found by
    # the hostile-events differential).
    p50 = g.select(
        F.col("event_type").alias("_et"), "_p50_approx"
    )
    j = events.select("event_type", "value").join(
        F.broadcast(p50), F.col("event_type").eqNullSafe(F.col("_et"))
    )
    ranks = j.groupBy("event_type").agg(
        (
            F.sum((F.col("value") <= F.col("_p50_approx")).cast("long"))
            / F.count("*")
        ).alias("_rank_le"),
        (
            F.sum((F.col("value") < F.col("_p50_approx")).cast("long"))
            / F.count("*")
        ).alias("_rank_lt"),
    )
    eps = F.lit(2.0 / PCT_ACCURACY) + 1.0 / F.col("n_events")
    ranks = ranks.withColumnRenamed("event_type", "_ret")
    return (
        g.join(ranks, F.col("event_type").eqNullSafe(F.col("_ret")))
        .select(
            "event_type",
            "n_events",
            "exact_distinct_users",
            (
                F.abs(F.col("_approx_users") - F.col("exact_distinct_users"))
                / F.col("exact_distinct_users")
                <= HLL_BOUND
            ).alias("hll_within_bound"),
            (
                (F.col("_rank_le") >= 0.5 - eps)
                & (F.col("_rank_lt") <= 0.5 + eps)
            ).alias("p50_within_bound"),
        )
    )


def usage_sketch_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw sketch values (HLL++ distinct, approximate p50/p95/p99) —
    consumed by the error-bound unit tests; the gated query above is the
    within-bound attestation of the same sketches."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=HLL_RSD).alias(
                "approx_distinct_users"
            ),
            F.percentile_approx("value", [0.5, 0.95, 0.99], PCT_ACCURACY).alias(
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


ORACLE_APPROX_USAGE_SKETCH = """
SELECT event_type,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS exact_distinct_users,
       TRUE AS hll_within_bound,
       TRUE AS p50_within_bound
FROM events
GROUP BY event_type
ORDER BY event_type
"""


QUERIES = {"approx_usage_sketch": approx_usage_sketch}
ORACLES = {"approx_usage_sketch": ORACLE_APPROX_USAGE_SKETCH}
