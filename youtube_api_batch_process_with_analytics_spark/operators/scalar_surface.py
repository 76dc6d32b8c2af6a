"""Scalar/derived-column surface as oracle-verified queries (SURVEY.md §2.2,
§2.5 A3/A12/A14, §2.7, §2.8).

The expression library in ``functions/`` models the reference's helpers
(email regex youtube_api_handler.py:848-860, topic beautifier 862-877,
video-type classifier 879-889, handle normalizer 437-441, ISO-8601
duration parse for the `contentDetails.duration` string README.md:313);
this module exposes each through a registered query so the driver's
DuckDB differential gate pins the semantics, not just unit tests.

Everything here is native Column expressions inside whole-stage codegen —
zero Python UDFs. Aggregates route through DECIMAL sums where doubles
feed the value-hash (order-independent at any partition count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import (
    EMAIL_PATTERN,
    beautify_topic_categories,
    extract_email,
    iso8601_duration_seconds,
    normalize_handle,
)
from ..sources import load_table, spread


def video_type_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 (youtube_api_handler.py:989-1014): shorts/long/unknown counts and
    percentage shares. Orders stand in for videos ('O'→shorts, 'F'→long,
    else unknown, per FIXTURES.md); share = count/total*100 via a window
    over the (3-row) aggregate — the window runs on post-aggregate data, so
    at 100 TB it moves 3 rows, not the fact table."""
    orders = load_table(spark, sf_dir, "orders")
    typed = orders.select(
        F.when(F.col("o_orderstatus") == "O", F.lit("shorts"))
        .when(F.col("o_orderstatus") == "F", F.lit("long"))
        .otherwise(F.lit("unknown"))
        .alias("video_type")
    )
    counts = typed.groupBy("video_type").agg(F.count("*").alias("n"))
    w = Window.partitionBy()
    return counts.select(
        "video_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(w) * 100, 1).alias("pct"),
    )


ORACLE_VIDEO_TYPE_DISTRIBUTION = """
WITH typed AS (
  SELECT CASE WHEN o_orderstatus = 'O' THEN 'shorts'
              WHEN o_orderstatus = 'F' THEN 'long'
              ELSE 'unknown' END AS video_type
  FROM orders
),
counts AS (
  SELECT video_type, COUNT(*) AS n FROM typed GROUP BY video_type
)
SELECT video_type, n,
       ROUND(CAST(n AS DOUBLE) / SUM(n) OVER () * 100, 1) AS pct
FROM counts ORDER BY video_type
"""


def email_topic_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6+P7+P9 in one projection over ``documents``: email extraction from
    a description (synthesized onto every 5th doc — the corpus has no
    emails, so the null path is exercised too), wiki-topic beautification
    over a categories array, and handle normalization. All regex/array
    lambda work stays JVM-side."""
    docs = load_table(spark, sf_dir, "documents")
    desc = F.when(
        F.col("doc_id") % 5 == 0,
        F.concat(
            F.lit("contact user"),
            F.col("doc_id"),
            F.lit("@example.com for info — "),
            F.col("text"),
        ),
    ).otherwise(F.col("text"))
    categories = F.array(
        F.concat(F.lit("https://en.wikipedia.org/wiki/Topic_"), F.col("source")),
        F.concat(F.lit("https://other.example.com/"), F.col("lang")),
        F.concat(
            F.lit("https://en.wikipedia.org/wiki/"),
            F.upper(F.col("lang")),
            F.lit("_(culture)"),
        ),
    )
    return docs.select(
        "doc_id",
        extract_email(desc).alias("email"),
        F.array_join(beautify_topic_categories(categories), ", ").alias("topics"),
        normalize_handle(F.concat(F.lit("@@"), F.col("source"))).alias("handle"),
    )


ORACLE_EMAIL_TOPIC_PROJECTION = f"""
WITH base AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0
              THEN 'contact user' || doc_id || '@example.com for info — ' || text
              ELSE text END AS description,
         ['https://en.wikipedia.org/wiki/Topic_' || source,
          'https://other.example.com/' || lang,
          'https://en.wikipedia.org/wiki/' || upper(lang) || '_(culture)'
         ] AS categories,
         source
  FROM documents
)
SELECT doc_id,
       nullif(regexp_extract(description, '{EMAIL_PATTERN}', 0), '') AS email,
       list_aggregate(
         list_transform(
           list_filter(categories, c -> contains(c, '/wiki/')),
           c -> regexp_replace(replace(split_part(c, '/wiki/', 2), '_', ' '),
                               '[()]', '', 'g')
         ), 'string_agg', ', ') AS topics,
       '@' || regexp_replace('@@' || source, '^@+', '') AS handle
FROM base ORDER BY doc_id
"""


def duration_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8: ISO-8601 duration strings ('PT1M47S' shapes, README.md:313) →
    seconds. Durations are synthesized deterministically from lineitem
    columns in three shapes (with days / minutes+seconds / seconds-only) so
    every branch of the parser is pinned. Pure regexp work — one narrow
    projection, deliberately NO spread(): a map-only parse must not buy
    fixture-file parallelism with a 600k-row shuffle (measured: shuffle
    0.5s > regex win). The ~0.8s bench entry at sf0.1 is scan parallelism
    (the fixture parquet has 3 row groups, so 3-way), not per-row cost
    (~1.3µs/row incl. 4 regex passes); production scans have thousands of
    splits and inherit full parallelism for free."""
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("int")
    dur = (
        F.when(
            F.col("l_linenumber") % 3 == 0,
            F.concat(F.lit("P"), F.col("l_linenumber"), F.lit("DT"), qty, F.lit("S")),
        )
        .when(
            F.col("l_linenumber") % 3 == 1,
            F.concat(
                F.lit("PT"), F.col("l_linenumber"), F.lit("M"), qty, F.lit("S")
            ),
        )
        .otherwise(F.concat(F.lit("PT"), qty, F.lit("S")))
    )
    return (
        li.select(
            "l_orderkey",
            F.col("l_linenumber").cast("long").alias("l_linenumber"),
            dur.alias("duration"),
        )
        .withColumn("duration_sec", iso8601_duration_seconds(F.col("duration")))
    )  # no orderBy: 600k-row output, the gate hash is order-insensitive


_DUCK_DUR_PART = (
    "COALESCE(CAST(nullif(regexp_extract(duration, '{pat}', 1), '') AS BIGINT), 0)"
)
_DUR_DAYS = _DUCK_DUR_PART.format(pat=r"P(?:(\d+)D)?")
_DUR_HOURS = _DUCK_DUR_PART.format(pat=r"T(?:(\d+)H)?")
_DUR_MINUTES = _DUCK_DUR_PART.format(pat=r"T(?:\d+H)?(?:(\d+)M)?")
_DUR_SECONDS = _DUCK_DUR_PART.format(pat=r"T(?:\d+H)?(?:\d+M)?(?:(\d+)S)?")

ORACLE_DURATION_PARSE = f"""
WITH base AS (
  SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
         CASE WHEN l_linenumber % 3 = 0
              THEN 'P' || l_linenumber || 'DT' || CAST(l_quantity AS INT) || 'S'
              WHEN l_linenumber % 3 = 1
              THEN 'PT' || l_linenumber || 'M' || CAST(l_quantity AS INT) || 'S'
              ELSE 'PT' || CAST(l_quantity AS INT) || 'S' END AS duration
  FROM lineitem
)
SELECT l_orderkey, l_linenumber, duration,
       {_DUR_DAYS} * 86400
     + {_DUR_HOURS} * 3600
     + {_DUR_MINUTES} * 60
     + {_DUR_SECONDS} AS duration_sec
FROM base
"""


def json_props_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12 + §2.8 json surface: request-metrics-by-endpoint analog over the
    events stream — JSON props parsed JVM-side (``get_json_object``), then
    one hash aggregate per event_type. At scale the JSON parse is per-row
    map work; the shuffle carries only the 5 aggregate rows."""
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("k").alias("k_sum"),
            F.floor(F.sum("k") / F.count("*")).alias("k_avg_floor"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
        )
    )


ORACLE_JSON_PROPS_METRICS = """
WITH parsed AS (
  SELECT event_type,
         CAST(CASE WHEN json_valid(props) THEN json_extract_string(props, '$.k') END AS BIGINT) AS k
  FROM events
)
SELECT event_type, COUNT(*) AS n_events,
       CAST(SUM(k) AS BIGINT) AS k_sum,
       CAST(FLOOR(CAST(SUM(k) AS DOUBLE) / COUNT(*)) AS BIGINT) AS k_avg_floor,
       MIN(k) AS k_min, MAX(k) AS k_max
FROM parsed GROUP BY event_type ORDER BY event_type
"""


def batch_union_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7 / §3.2: the heterogeneous-batch envelope. Each request type
    produces its own result shape; ``unionByName(allowMissingColumns=True)``
    is the keyed union the reference builds as a dict of per-request results
    (api_server.py:517-563). Missing columns null-fill, exactly like the
    reference's absent keys."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    a = customer.agg(
        F.count("*").alias("n"),
        F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_balance"),
    ).select(F.lit("customers_0").alias("request_id"), "n", "total_balance")
    b = orders.agg(
        F.count("*").alias("n"), F.max("o_totalprice").alias("max_price")
    ).select(F.lit("orders_1").alias("request_id"), "n", "max_price")
    return a.unionByName(b, allowMissingColumns=True)


ORACLE_BATCH_UNION_ENVELOPE = """
SELECT * FROM (
  SELECT 'customers_0' AS request_id, COUNT(*) AS n,
         CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_balance
  FROM customer
  UNION ALL BY NAME
  SELECT 'orders_1' AS request_id, COUNT(*) AS n, MAX(o_totalprice) AS max_price
  FROM orders
) ORDER BY request_id
"""


def cache_status_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A14 (youtube_api_handler.py:654-666): tri-state hit/partial/miss from
    all()/any() of sub-results — here per (user, day) cell over events:
    'hit' when every event succeeded, 'partial' when some did, 'miss' when
    none did. ``bool_and``/``bool_or`` are single-pass partial aggregates."""
    events = load_table(spark, sf_dir, "events")
    ok = F.col("event_type") != "error"
    per_cell = events.groupBy(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(
        F.count("*").alias("n_events"),
        F.bool_and(ok).alias("all_ok"),
        F.bool_or(ok).alias("any_ok"),
    )
    status = (
        F.when(F.col("all_ok"), F.lit("hit"))
        .when(F.col("any_ok"), F.lit("partial"))
        .otherwise(F.lit("miss"))
    )
    return per_cell.select(
        "user_id", "day", "n_events", status.alias("cache_status")
    )


ORACLE_CACHE_STATUS_ROLLUP = """
WITH per_cell AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, COUNT(*) AS n_events,
         bool_and(event_type <> 'error') AS all_ok,
         bool_or(event_type <> 'error') AS any_ok
  FROM events GROUP BY user_id, CAST(date_trunc('day', ts) AS TIMESTAMP)
)
SELECT user_id, day, n_events,
       CASE WHEN all_ok THEN 'hit'
            WHEN any_ok THEN 'partial'
            ELSE 'miss' END AS cache_status
FROM per_cell ORDER BY user_id, day
"""


def set_ops_user_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7 set-operation surface (absent from the reference, free in the
    engine): cohorts of event users vs error-event users — INTERSECT
    (users with both views and errors), EXCEPT (view-only users), UNION
    count check. Each compiles to a hash aggregate / left-anti shape over
    the keys — one shuffle per branch, no row-pair expansion.
    """
    events = load_table(spark, sf_dir, "events")
    viewers = events.filter(F.col("event_type") == "view").select("user_id")
    erroring = events.filter(F.col("event_type") == "error").select("user_id")
    both = viewers.intersect(erroring).select(
        F.col("user_id"), F.lit("view_and_error").alias("cohort")
    )
    only_view = viewers.subtract(erroring).select(
        F.col("user_id"), F.lit("view_only").alias("cohort")
    )
    return both.unionByName(only_view)


ORACLE_SET_OPS_USER_COHORTS = """
WITH viewers AS (SELECT user_id FROM events WHERE event_type = 'view'),
     erroring AS (SELECT user_id FROM events WHERE event_type = 'error')
SELECT user_id, 'view_and_error' AS cohort
FROM (SELECT user_id FROM viewers INTERSECT SELECT user_id FROM erroring)
UNION ALL
SELECT user_id, 'view_only' AS cohort
FROM (SELECT DISTINCT user_id FROM viewers
      WHERE user_id NOT IN (SELECT user_id FROM erroring))
ORDER BY cohort, user_id
"""


QUERIES = {
    "set_ops_user_cohorts": set_ops_user_cohorts,
    "video_type_distribution": video_type_distribution,
    "email_topic_projection": email_topic_projection,
    "duration_parse": duration_parse,
    "json_props_metrics": json_props_metrics,
    "batch_union_envelope": batch_union_envelope,
    "cache_status_rollup": cache_status_rollup,
}

ORACLES = {
    "set_ops_user_cohorts": ORACLE_SET_OPS_USER_COHORTS,
    "video_type_distribution": ORACLE_VIDEO_TYPE_DISTRIBUTION,
    "email_topic_projection": ORACLE_EMAIL_TOPIC_PROJECTION,
    "duration_parse": ORACLE_DURATION_PARSE,
    "json_props_metrics": ORACLE_JSON_PROPS_METRICS,
    "batch_union_envelope": ORACLE_BATCH_UNION_ENVELOPE,
    "cache_status_rollup": ORACLE_CACHE_STATUS_ROLLUP,
}
