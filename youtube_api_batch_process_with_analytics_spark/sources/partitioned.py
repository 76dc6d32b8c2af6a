"""Date-partitioned table layout — the 100-TB deployment shape.

The fixture tiers ship flat parquet, so nothing in the gate exercises
Catalyst's PARTITION pruning — the mechanism every production events/logs
table actually lives on (`.../events/day=2026-08-14/part-*.parquet`).
This module is the layout's write/read pair:

* ``write_events_day_partitioned`` — land the events table partitioned by
  ``day = to_date(ts)``. At 100 TB this is the ingest sink's layout; it
  also makes S8-style retention a metadata drop of whole partitions
  instead of a rewrite (reference parity anchor: the retention DELETE in
  ``sqlite_logger.py`` — here old days disappear by partition, no row
  scan).
* ``read_events_day`` — scan the layout with an optional day-range
  predicate ON THE PARTITION COLUMN. Catalyst turns that predicate into
  ``PartitionFilters`` on the file scan: non-matching directories are
  never listed into the scan, so a one-day query over a 3-year table
  reads ~1/1000th of the files. ``tests/test_scale_plans.py`` pins the
  plan (PartitionFilters present, day absent from the data filters), and
  README's partition-pruning row records the measured pruned-vs-full
  scan cost at the sf1 tier.

The predicate must stay a plain comparison on the partition column —
wrapping it in an expression over ``ts`` (e.g. ``to_date(ts) = d``)
defeats pruning and rescans every partition; that is the classic
production regression this module's plan pin exists to catch.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_events_day_partitioned(events: DataFrame, out_dir: str) -> None:
    """Write ``events`` (needs a ``ts`` timestamp column) partitioned by
    calendar day. One directory per day; within a day, files inherit the
    upstream parallelism (a real ingest job would also size-target files
    via ``spark.sql.files.maxRecordsPerFile``)."""
    events.withColumn("day", F.to_date("ts")).write.mode(
        "overwrite"
    ).partitionBy("day").parquet(out_dir)


def read_events_day(
    spark: SparkSession,
    root: str,
    day: str | _dt.date | None = None,
    day_to: str | _dt.date | None = None,
) -> DataFrame:
    """Scan the day-partitioned layout, pruning to ``day`` (exact) or
    ``[day, day_to]`` (inclusive range) when given. The filter compares
    the PARTITION column directly, so it compiles to PartitionFilters —
    directory-level pruning before any file is opened."""
    df = spark.read.parquet(root)
    if day is not None and day_to is not None:
        return df.filter(
            (F.col("day") >= F.lit(day)) & (F.col("day") <= F.lit(day_to))
        )
    if day is not None:
        return df.filter(F.col("day") == F.lit(day))
    if day_to is not None:  # open-ended "everything up to X"
        return df.filter(F.col("day") <= F.lit(day_to))
    return df
