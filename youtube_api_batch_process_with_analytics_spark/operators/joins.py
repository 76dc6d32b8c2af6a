"""Join operators (SURVEY.md §2.4 J1-J4).

The reference implements every join as a Python nested loop or dict lookup;
all are equi-joins. Here each is a declarative DataFrame join so Catalyst
picks the physical strategy — broadcast for the small dimension sides, and
shuffled hash / sort-merge with AQE skew handling for fact-fact joins at
scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table


def enrichment_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 — detail rows enriched from a header/feed side via LEFT join with
    an 'unknown' default for unmatched rows.

    Models ``youtube_api_handler.py:556-564``: each detailed video gets
    ``video_type``/``rss_url`` copied from its RSS entry, else 'unknown'.
    Analog: ``lineitem`` (detail) LEFT JOIN a filtered ``orders`` slice
    (the "feed" — restricted so the null side is actually exercised), with
    ``F.coalesce`` providing the default.

    Scale: lineitem⋈orders is a fact-fact equi-join on the natural key —
    at 100 TB both sides shuffle on l_orderkey/o_orderkey; with bucketed
    tables it would be shuffle-free. The filter on the orders side is pushed
    into the parquet scan by Catalyst.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    feed = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .select(
            F.col("o_orderkey"),
            F.col("o_orderstatus"),
            F.col("o_orderpriority").alias("feed_priority"),
        )
    )
    return (
        lineitem.join(feed, lineitem.l_orderkey == feed.o_orderkey, "left")
        .select(
            F.col("l_orderkey"),
            F.col("l_linenumber"),
            F.col("l_quantity"),
            F.coalesce(F.col("o_orderstatus"), F.lit("unknown")).alias("video_type"),
            F.col("feed_priority"),
        )
        # no presentation sort: a global range-sort of full join output is
        # pure waste at scale, and the correctness gate hashes
        # order-insensitively
    )


ORACLE_ENRICHMENT_JOIN = """
SELECT l.l_orderkey,
       l.l_linenumber,
       l.l_quantity,
       COALESCE(o.o_orderstatus, 'unknown') AS video_type,
       o.o_orderpriority AS feed_priority
FROM lineitem l
LEFT JOIN (SELECT * FROM orders
           WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')) o
  ON l.l_orderkey = o.o_orderkey
ORDER BY l.l_orderkey, l.l_linenumber
"""


def semi_join_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4/S2/S3 — batch lookup of resources by an id list as a LEFT SEMI
    join (the reference's ``channels.list?id=a,b,c`` chunked fetch,
    ``youtube_api_handler.py:452-502``).

    The requested-id set here is 'customers in the BUILDING segment'; at
    reference scale this list is ≤50 ids and broadcasts.
    """
    orders = load_table(spark, sf_dir, "orders")
    ids = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey"))
    )
    return (
        orders.join(
            F.broadcast(ids), orders.o_custkey == ids.c_custkey, "left_semi"
        )
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    )


ORACLE_SEMI_JOIN_LOOKUP = """
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer
                    WHERE c_mktsegment = 'BUILDING')
ORDER BY o_orderkey
"""


def dim_broadcast_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 — code→name dimension resolution as a chain of broadcast joins
    with a coalesce fallback (the language-name lookup,
    ``youtube_api_handler.py:336-359``, applied via broadcast join).

    Analog: customer → nation → region (both dims tiny → two
    BroadcastHashJoins, zero shuffles of the fact side).
    """
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        customer.join(
            F.broadcast(nation),
            customer.c_nationkey == nation.n_nationkey,
            "left",
        )
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey, "left")
        .select(
            F.col("c_custkey"),
            F.col("c_name"),
            F.coalesce(F.col("n_name"), F.lit("UNKNOWN")).alias("nation_name"),
            F.coalesce(F.col("r_name"), F.lit("UNKNOWN")).alias("region_name"),
        )
    )


ORACLE_DIM_BROADCAST_JOIN = """
SELECT c.c_custkey,
       c.c_name,
       COALESCE(n.n_name, 'UNKNOWN') AS nation_name,
       COALESCE(r.r_name, 'UNKNOWN') AS region_name
FROM customer c
LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
ORDER BY c.c_custkey
"""


ORACLES = {
    "enrichment_join": ORACLE_ENRICHMENT_JOIN,
    "semi_join_lookup": ORACLE_SEMI_JOIN_LOOKUP,
    "dim_broadcast_join": ORACLE_DIM_BROADCAST_JOIN,
}

QUERIES = {
    "enrichment_join": enrichment_join,
    "semi_join_lookup": semi_join_lookup,
    "dim_broadcast_join": dim_broadcast_join,
}
