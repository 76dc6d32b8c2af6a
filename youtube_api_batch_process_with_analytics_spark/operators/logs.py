"""Log-analytics engine (SURVEY.md §2 — S7/S8, F4-F8, A8-A10, T2/T5).

The reference's only true SQL path: ``SQLiteLogReader`` assembles a WHERE
clause from predicates, pages with ORDER BY timestamp DESC LIMIT/OFFSET,
and computes level/logger stats (``sqlite_logger.py:121-315``). The engine
expresses the same over the ``events`` table (event_type↔level,
user_id↔logger_name, ts↔timestamp) as declarative filters Catalyst pushes
into the parquet scan.

Determinism: the reference orders by timestamp only; ties are
nondeterministic under parallelism, so every ordering here appends the
unique ``event_id`` tie-break (SURVEY.md §7.5). Recency filters anchor on
``max(ts)`` instead of wall-clock ``now`` so results are reproducible
against the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table

PAGE_LIMIT_CEILING = 1000  # api_server.py:1481-1482 clamp


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


def log_page(
    spark: SparkSession,
    sf_dir: str,
    level: str | None = "ERROR",
    logger_contains: str | None = None,
    limit: int = 100,
    offset: int = 50,
) -> DataFrame:
    """T2 + F4/F6 — filtered page of the log, newest first.

    Mirrors ``get_logs`` (sqlite_logger.py:121-255): case-insensitive level
    equality (F4, sqlite_logger.py:163-165), substring logger filter (F6,
    179-181), ORDER BY ts DESC LIMIT/OFFSET with the 1000-row clamp.

    Scale: the predicates push into the scan; the page itself is a global
    top-(offset+limit) — Spark plans TakeOrderedAndProject, which is a
    per-partition heap + driver merge, NOT a full sort. OFFSET is applied
    after the bounded collect equivalent via a rank window over the
    already-limited set.
    """
    limit = min(limit, PAGE_LIMIT_CEILING)
    df = _events(spark, sf_dir)
    if level is not None:
        df = df.filter(F.upper(F.col("event_type")) == F.upper(F.lit(level)))
    if logger_contains is not None:
        df = df.filter(F.col("user_id").cast("string").contains(logger_contains))
    # Bounded top-k first (TakeOrderedAndProject), then offset within it.
    topk = df.orderBy(F.desc("ts"), F.asc("event_id")).limit(offset + limit)
    w = Window.orderBy(F.desc("ts"), F.asc("event_id"))
    return (
        topk.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") > offset) & (F.col("rn") <= offset + limit))
        .select("event_id", "ts", "user_id", "event_type", "value")
    )


ORACLE_LOG_PAGE = """
SELECT event_id, ts, user_id, event_type, value
FROM events
WHERE UPPER(event_type) = UPPER('ERROR')
ORDER BY ts DESC, event_id ASC
LIMIT 100 OFFSET 50
"""


def pagination_meta(
    spark: SparkSession,
    sf_dir: str,
    level: str | None = "ERROR",
    limit: int = 100,
    offset: int = 50,
) -> DataFrame:
    """A10 + T5 — total count alongside the page plus ``has_more``
    (sqlite_logger.py:189-190, 241)."""
    limit = min(limit, PAGE_LIMIT_CEILING)
    df = _events(spark, sf_dir)
    if level is not None:
        df = df.filter(F.upper(F.col("event_type")) == F.upper(F.lit(level)))
    return df.agg(F.count("*").alias("total_count")).select(
        "total_count",
        F.least(
            F.greatest(F.col("total_count") - offset, F.lit(0)), F.lit(limit)
        ).cast("long").alias("returned"),
        (F.col("total_count") > offset + limit).alias("has_more"),
    )


ORACLE_PAGINATION_META = """
WITH c AS (
  SELECT COUNT(*) AS total_count FROM events
  WHERE UPPER(event_type) = UPPER('ERROR')
)
SELECT total_count,
       CAST(LEAST(GREATEST(total_count - 50, 0), 100) AS BIGINT) AS returned,
       total_count > 150 AS has_more
FROM c
"""


def log_level_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 — counts per level, most frequent first
    (sqlite_logger.py:267-279)."""
    return (
        _events(spark, sf_dir)
        .groupBy(F.col("event_type").alias("level"))
        .agg(F.count("*").alias("cnt"))
    )


ORACLE_LOG_LEVEL_STATS = """
SELECT event_type AS level, COUNT(*) AS cnt
FROM events GROUP BY event_type ORDER BY cnt DESC, level ASC
"""


def top_loggers(spark: SparkSession, sf_dir: str, k: int = 10) -> DataFrame:
    """A9/T3 — top-k loggers by volume (sqlite_logger.py:283-292).
    Spark plans TakeOrderedAndProject: partial agg → per-partition heap —
    no global sort even with billions of loggers."""
    return (
        _events(spark, sf_dir)
        .groupBy(F.col("user_id").alias("logger"))
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("logger"))
        .limit(k)
    )


ORACLE_TOP_LOGGERS = """
SELECT user_id AS logger, COUNT(*) AS cnt
FROM events GROUP BY user_id ORDER BY cnt DESC, logger ASC LIMIT 10
"""


def recent_level_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7 + A8 — per-level counts over the trailing 24 h
    (sqlite_logger.py:295-304). Anchored on ``max(ts)`` (not wall clock)
    for reproducibility; the anchor is a scalar subquery → broadcast.
    """
    df = _events(spark, sf_dir)
    # NULL-ts rows have no age: excluded from retention accounting on both
    # engines (previously Spark dropped them silently — neither kept nor
    # deleted — while the oracle's CASE..ELSE counted them deleted).
    df = df.filter(F.col("ts").isNotNull())
    anchor = df.agg(F.max("ts").alias("max_ts"))
    return (
        df.crossJoin(F.broadcast(anchor))
        .filter(F.col("ts") > F.col("max_ts") - F.expr("INTERVAL 1 DAY"))
        .groupBy(F.col("event_type").alias("level"))
        .agg(F.count("*").alias("cnt"))
    )


ORACLE_RECENT_LEVEL_STATS = """
SELECT event_type AS level, COUNT(*) AS cnt
FROM events
WHERE ts > (SELECT MAX(ts) FROM events) - INTERVAL 1 DAY
GROUP BY event_type ORDER BY cnt DESC, level ASC
"""


def retention_cleanup(spark: SparkSession, sf_dir: str, days: int = 7) -> DataFrame:
    """S8/F8 — retention: rows surviving a delete of entries older than N
    days before the newest entry (``cleanup_old_logs``,
    sqlite_logger.py:317-350). Batch form returns the survivors' per-level
    counts plus deleted count; on a Delta/Iceberg table this is
    ``DELETE WHERE`` + compaction.
    """
    df = _events(spark, sf_dir)
    # NULL-ts rows have no age: excluded from retention accounting on both
    # engines (previously Spark dropped them silently — neither kept nor
    # deleted — while the oracle's CASE..ELSE counted them deleted).
    df = df.filter(F.col("ts").isNotNull())
    anchor = df.agg(F.max("ts").alias("max_ts"))
    flagged = df.crossJoin(F.broadcast(anchor)).withColumn(
        "kept", F.col("ts") >= F.col("max_ts") - F.expr(f"INTERVAL {days} DAYS")
    )
    return (
        flagged.groupBy(F.col("event_type").alias("level"))
        .agg(
            F.sum(F.when(F.col("kept"), 1).otherwise(0)).alias("kept_count"),
            F.sum(F.when(~F.col("kept"), 1).otherwise(0)).alias("deleted_count"),
        )
    )


ORACLE_RETENTION_CLEANUP = """
SELECT event_type AS level,
       CAST(SUM(CASE WHEN ts >= (SELECT MAX(ts) FROM events) - INTERVAL 7 DAY
                THEN 1 ELSE 0 END) AS BIGINT) AS kept_count,
       CAST(SUM(CASE WHEN ts >= (SELECT MAX(ts) FROM events) - INTERVAL 7 DAY
                THEN 0 ELSE 1 END) AS BIGINT) AS deleted_count
FROM events WHERE ts IS NOT NULL
GROUP BY event_type ORDER BY level
"""


from ..sources.partitioned import (  # noqa: E402 — avoids a sources/operators import cycle at module top
    ORACLE_RETENTION_APPLIED as _ORACLE_RETENTION_APPLIED,
    retention_applied as _retention_applied,
)

QUERIES = {
    "log_page": log_page,
    "pagination_meta": pagination_meta,
    "log_level_stats": log_level_stats,
    "top_loggers": top_loggers,
    "recent_level_stats": recent_level_stats,
    "retention_cleanup": retention_cleanup,
    "retention_applied": _retention_applied,
}

ORACLES = {
    "log_page": ORACLE_LOG_PAGE,
    "pagination_meta": ORACLE_PAGINATION_META,
    "log_level_stats": ORACLE_LOG_LEVEL_STATS,
    "top_loggers": ORACLE_TOP_LOGGERS,
    "recent_level_stats": ORACLE_RECENT_LEVEL_STATS,
    "retention_cleanup": ORACLE_RETENTION_CLEANUP,
    "retention_applied": _ORACLE_RETENTION_APPLIED,
}
