"""Parquet sources for the synthetic star schema (TESTDATA.md).

Models the reference's scan operators (SURVEY.md §2.1 S1-S7): where the
reference fetches JSON/XML/SQLite row-at-a-time over the network
(``youtube_api_handler.py:430-513``, ``sqlite_logger.py:121-255``), the
engine reads columnar parquet and lets Catalyst push filters and prune
columns into the scan — check ``df.explain`` for ``PushedFilters`` /
``ReadSchema``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table. Schema comes from parquet footers (explicit, fixed).

    ``events.ts`` is written as INT64 TIMESTAMP(NANOS), which Spark rejects
    natively; we read nanos as long (legacy conf) and rebuild a proper
    TimestampType column with exact integer division (``div 1000`` — no
    double roundtrip, nanos exceed 2^53). Micros truncation matches what
    DuckDB/Python produce for the same values.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        return df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000").cast("long"))
        )
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def spread(df: DataFrame) -> DataFrame:
    """Round-robin repartition to the session's default parallelism.

    The small test tables arrive as a single parquet split; expression-heavy
    map work (hashing, regex, array transforms) would otherwise serialize on
    one core. On a real cluster scans have many splits and callers skip this
    (or it is a cheap narrow shuffle of small rows).
    """
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for the SQL API."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
