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
    """Scan one table. Schema comes from parquet footers (explicit, fixed)."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for the SQL API."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
