"""RSS/Atom XML feed source (SURVEY.md §2.1 S4, §2.2 P4/P5).

The reference fetches per-channel Atom XML and parses each ``<entry>`` with
ElementTree (youtube_api_handler.py:504-513, parser 781-838: video id from
the ``/watch?v=``/``/shorts/`` URL, title, published/updated, views from
``media:statistics@views``). The engine's twin is Spark's native
``from_xml`` — the parse happens JVM-side per row, no Python, and scales
as plain map work over however many feed documents a crawl lands.

Gate strategy: XML entries are synthesized deterministically from
``orders`` columns, parsed back with ``from_xml``, and projected through
the real P4/P5 expressions. The DuckDB oracle computes the same fields
straight from the base columns — so a hash match proves the XML
round-trip (build → parse → extract) is lossless.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import classify_video_type, extract_video_id
from . import load_table, spread

ENTRY_SCHEMA = (
    "id STRING, title STRING, published STRING, "
    "link STRUCT<_href: STRING>, statistics STRUCT<_views: BIGINT>"
)


def build_entry_xml() -> F.Column:
    """Deterministic Atom-ish <entry> per order row (shorts URL for every
    third order, watch URL otherwise — exercising both P5 branches)."""
    vid = F.concat(F.lit("vid"), F.col("o_orderkey"))
    # '&' must be entity-escaped in well-formed XML; from_xml unescapes it
    # back, so the parsed href round-trips to the raw '&ab=1' URL.
    url = F.when(
        F.col("o_orderkey") % 3 == 0,
        F.concat(F.lit("https://www.youtube.com/shorts/"), vid, F.lit("?feature=share")),
    ).otherwise(
        F.concat(F.lit("https://www.youtube.com/watch?v="), vid, F.lit("&amp;ab=1"))
    )
    published = F.date_format("o_orderdate", "yyyy-MM-dd'T'HH:mm:ss'Z'")
    # A NULL field must OMIT its element (a real feed skips unknown tags),
    # not NULL the whole entry: bare concat propagates one NULL title/date/
    # stat into entry_xml = NULL, silently losing the row (found by the
    # hostile-relational differential). from_xml then yields NULL for the
    # missing field, exactly what the oracle computes from the base column.
    def _opt(*parts):
        return F.coalesce(F.concat(*parts), F.lit(""))

    return F.concat(
        F.lit("<entry><id>yt:video:"), vid, F.lit("</id>"),
        _opt(F.lit("<title>"), F.col("o_orderpriority"), F.lit("</title>")),
        _opt(F.lit("<published>"), published, F.lit("</published>")),
        F.lit("<link href='"), url, F.lit("'/>"),
        F.coalesce(
            F.concat(
                F.lit("<statistics views='"),
                F.col("o_totalprice").cast("bigint"),
                F.lit("'/>"),
            ),
            F.lit("<statistics/>"),
        ),
        F.lit("</entry>"),
    )


def parse_rss_entries(feed: DataFrame, xml_col: str = "entry_xml") -> DataFrame:
    """S4+P4: parse Atom entries and project the reference's flat RSS shape
    (video_id, title, published_at, url, video_type, views_from_rss)."""
    parsed = feed.withColumn("e", F.from_xml(xml_col, ENTRY_SCHEMA))
    url = F.col("e.link._href")
    return parsed.select(
        extract_video_id(url).alias("video_id"),
        F.col("e.title").alias("title"),
        F.col("e.published").alias("published_at"),
        url.alias("url"),
        classify_video_type(url).alias("video_type"),
        F.coalesce(F.col("e.statistics._views"), F.lit(0)).alias("views_from_rss"),
    )


def rss_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The gate query: orders → XML text → from_xml → P4/P5 projection."""
    orders = spread(load_table(spark, sf_dir, "orders"))
    feed = orders.select(
        "o_orderkey", build_entry_xml().alias("entry_xml")
    )
    # no presentation sort: gate hashes order-insensitively
    return parse_rss_entries(feed)


ORACLE_RSS_XML_ROUNDTRIP = """
WITH base AS (
  SELECT 'vid' || o_orderkey AS video_id,
         o_orderpriority AS title,
         strftime(o_orderdate, '%Y-%m-%dT%H:%M:%SZ') AS published_at,
         CASE WHEN o_orderkey % 3 = 0
              THEN 'https://www.youtube.com/shorts/vid' || o_orderkey || '?feature=share'
              ELSE 'https://www.youtube.com/watch?v=vid' || o_orderkey || '&ab=1'
         END AS url,
         CASE WHEN o_orderkey % 3 = 0 THEN 'shorts' ELSE 'long' END AS video_type,
         COALESCE(CAST(FLOOR(o_totalprice) AS BIGINT), 0) AS views_from_rss  -- Spark CAST truncates; DuckDB rounds
  FROM orders
)
SELECT video_id, title, published_at, url, video_type, views_from_rss
FROM base ORDER BY video_id
"""


QUERIES = {"rss_xml_roundtrip": rss_xml_roundtrip}
ORACLES = {"rss_xml_roundtrip": ORACLE_RSS_XML_ROUNDTRIP}
