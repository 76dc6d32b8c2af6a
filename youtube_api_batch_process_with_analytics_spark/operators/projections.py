"""Formatting projections (SURVEY.md §2.2 P1/P2/P4).

The reference formats raw API resources record-at-a-time with ``.get()``
chains; here each formatter is one wide ``select`` over the nested raw
schema — a pure projection Catalyst prunes to exactly the referenced
nested fields (check ``ReadSchema`` in the explain output).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.ratios import floor_div
from ..functions.text import (
    beautify_topic_categories,
    extract_email,
    extract_video_id,
    classify_video_type,
    iso8601_duration_seconds,
)
from ..functions.language import language_name_fallback


def _long(col: F.Column) -> F.Column:
    """int(x or 0) — API counts arrive as strings, missing → 0
    (youtube_api_handler.py:728-730, 770-772)."""
    return F.coalesce(col.try_cast("long"), F.lit(0))


def format_channels(raw: DataFrame, languages: DataFrame) -> DataFrame:
    """P1 — channel formatter (youtube_api_handler.py:688-748).

    Flattens snippet/statistics/status/contentDetails, casts counts,
    extracts the contact email (P6), beautifies topic categories (P7),
    resolves the default-language name via broadcast join (P8/J2), and
    assembles the verification/engagement structs (P3 floor-div ratios).
    """
    with_lang = language_name_fallback(
        raw.withColumn("_code", F.col("snippet.defaultLanguage")),
        languages,
        "_code",
        "_lang_name",
    )
    view_count = _long(F.col("statistics.viewCount"))
    sub_count = _long(F.col("statistics.subscriberCount"))
    video_count = _long(F.col("statistics.videoCount"))
    email = extract_email(F.col("snippet.description"))
    return with_lang.select(
        F.col("id"),
        F.col("snippet.title").alias("title"),
        F.col("snippet.description").alias("description"),
        F.col("snippet.customUrl").alias("custom_url"),
        F.to_timestamp("snippet.publishedAt").alias("published_at"),
        F.col("snippet.thumbnails").alias("thumbnails"),
        F.col("snippet.country").alias("country"),
        F.when(
            F.col("_code").isNotNull(),
            F.struct(
                F.col("_code").alias("code"), F.col("_lang_name").alias("name")
            ),
        ).alias("default_language"),
        view_count.alias("view_count"),
        sub_count.alias("subscriber_count"),
        video_count.alias("video_count"),
        F.col("status.privacyStatus").alias("privacy_status"),
        beautify_topic_categories(
            F.coalesce(
                F.col("topicDetails.topicCategories"),
                F.array().cast("array<string>"),
            )
        ).alias("categories"),
        F.coalesce(
            F.col("topicDetails.topicCategories"), F.array().cast("array<string>")
        ).alias("topic_categories"),
        F.col("contentDetails.relatedPlaylists.uploads").alias("uploads_playlist"),
        email.alias("email"),
        F.struct(
            email.isNotNull().alias("has_email"),
            F.col("snippet.customUrl").isNotNull().alias("has_custom_url"),
            (
                F.col("snippet.description").isNotNull()
                & (F.length("snippet.description") > 0)
            ).alias("has_description"),
            # is_verified heuristic: linked account (youtube_api_handler.py:739-741)
            F.coalesce(F.col("status.isLinked"), F.lit(False)).alias("is_verified"),
        ).alias("verification_status"),
        F.struct(
            floor_div(view_count, video_count).alias("avg_views_per_video"),
            floor_div(sub_count, video_count).alias("subscriber_to_video_ratio"),
        ).alias("engagement_data"),
    )


def format_videos(raw: DataFrame, languages: DataFrame) -> DataFrame:
    """P2 — video formatter (youtube_api_handler.py:750-779) with the
    derived ``duration_sec`` column (ISO-8601 parse, SURVEY §1.2)."""
    with_lang = language_name_fallback(
        raw.withColumn("_code", F.col("snippet.defaultAudioLanguage")),
        languages,
        "_code",
        "_lang_name",
    )
    return with_lang.select(
        F.col("id"),
        F.col("snippet.title").alias("title"),
        F.col("snippet.channelId").alias("channel_id"),
        F.col("snippet.channelTitle").alias("channel_title"),
        F.to_timestamp("snippet.publishedAt").alias("published_at"),
        F.col("snippet.categoryId").alias("category_id"),
        F.when(
            F.col("_code").isNotNull(),
            F.struct(
                F.col("_code").alias("code"), F.col("_lang_name").alias("name")
            ),
        ).alias("default_audio_language"),
        F.col("contentDetails.duration").alias("duration"),
        iso8601_duration_seconds(F.col("contentDetails.duration")).alias(
            "duration_sec"
        ),
        _long(F.col("statistics.viewCount")).alias("view_count"),
        _long(F.col("statistics.likeCount")).alias("like_count"),
        _long(F.col("statistics.commentCount")).alias("comment_count"),
        F.col("status.privacyStatus").alias("privacy_status"),
        F.coalesce(F.col("status.embeddable"), F.lit(False)).alias("embeddable"),
        F.coalesce(F.col("status.madeForKids"), F.lit(False)).alias("made_for_kids"),
        F.coalesce(
            F.col("topicDetails.topicCategories"), F.array().cast("array<string>")
        ).alias("topic_categories"),
        F.col("player.embedHtml").alias("embed_html"),
    )


def project_rss_entries(raw: DataFrame) -> DataFrame:
    """P4/P5 — RSS entry projection (youtube_api_handler.py:805-838):
    video id extracted from watch/shorts URLs, video-type classification,
    RSS view count with 0 default."""
    return raw.select(
        F.col("channel_id"),
        extract_video_id(F.col("url")).alias("video_id"),
        F.col("title"),
        F.to_timestamp("published_at").alias("published_at"),
        F.to_timestamp("updated_at").alias("updated_at"),
        F.col("url"),
        classify_video_type(F.col("url")).alias("video_type"),
        _long(F.col("views_from_rss")).alias("views_from_rss"),
    )


# ---------------------------------------------------------------------------
# Gate queries: drive the real formatter / fallback code paths end-to-end
# against synthesized nested inputs, verified by a DuckDB oracle that
# computes the same fields straight from the base columns.
# ---------------------------------------------------------------------------

from pyspark.sql import SparkSession  # noqa: E402

from ..sources import load_table  # noqa: E402


def _language_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """83-row-style language dimension synthesized from the corpus langs
    (S5: the languagelist.json load, youtube_api_handler.py:317-334)."""
    return (
        load_table(spark, sf_dir, "documents")
        .select(F.col("lang").alias("id"))
        .distinct()
        .select("id", F.concat(F.lit("name_"), F.col("id")).alias("name"))
    )


def language_fallback_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8/J2 gate: the 3-key fallback chain (exact → lower → base-before-'-'
    → upper(code)) plus the falsy→'Unknown' early return, over codes
    synthesized to hit every branch (incl. NULL and '')."""
    docs = load_table(spark, sf_dir, "documents")
    code = (
        F.when(F.col("doc_id") % 6 == 0, F.col("lang"))
        .when(F.col("doc_id") % 6 == 1, F.upper(F.col("lang")))
        .when(F.col("doc_id") % 6 == 2, F.concat(F.col("lang"), F.lit("-XX")))
        .when(F.col("doc_id") % 6 == 3, F.concat(F.lit("q"), (F.col("doc_id") % 7).cast("string")))
        .when(F.col("doc_id") % 6 == 4, F.lit(""))
        .otherwise(F.lit(None).cast("string"))
    )
    base = docs.select("doc_id", code.alias("code"))
    out = language_name_fallback(
        base, _language_dim(spark, sf_dir), "code", "language_name"
    )
    return out.select("doc_id", "code", "language_name")


ORACLE_LANGUAGE_FALLBACK_RESOLUTION = """
WITH dim AS (
  SELECT DISTINCT lang AS id, 'name_' || lang AS name FROM documents
),
base AS (
  SELECT doc_id,
         CASE WHEN doc_id % 6 = 0 THEN lang
              WHEN doc_id % 6 = 1 THEN upper(lang)
              WHEN doc_id % 6 = 2 THEN lang || '-XX'
              WHEN doc_id % 6 = 3 THEN 'q' || CAST(doc_id % 7 AS VARCHAR)
              WHEN doc_id % 6 = 4 THEN ''
              ELSE NULL END AS code
  FROM documents
)
SELECT b.doc_id, b.code,
       CASE WHEN b.code IS NULL OR b.code = '' THEN 'Unknown'
            ELSE COALESCE(ne.name, nl.name, nb.name, upper(b.code)) END
         AS language_name
FROM base b
LEFT JOIN dim ne ON b.code = ne.id
LEFT JOIN dim nl ON lower(b.code) = nl.id
LEFT JOIN dim nb ON split_part(lower(b.code), '-', 1) = nb.id
ORDER BY b.doc_id
"""


def _raw_channels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested channel resources synthesized deterministically from
    ``customer`` — the raw shape P1 consumes (snippet/statistics/status/
    topicDetails/contentDetails parts, config.py:77)."""
    c = load_table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    return c.select(
        k.cast("string").alias("id"),
        F.struct(
            F.col("c_name").alias("title"),
            F.when(
                k % 5 == 0,
                F.concat(F.lit("reach me at user"), k, F.lit("@example.com")),
            )
            .otherwise(F.concat(F.lit("channel of "), F.col("c_mktsegment")))
            .alias("description"),
            F.when(k % 3 == 0, F.concat(F.lit("@ch"), k)).alias("customUrl"),
            F.concat(
                F.lit("20"),
                F.lpad((k % 20).cast("string"), 2, "0"),
                F.lit("-03-07T08:30:00Z"),
            ).alias("publishedAt"),
            F.struct(
                F.struct(
                    F.concat(F.lit("https://i.example.com/"), k, F.lit(".jpg")).alias(
                        "url"
                    )
                ).alias("default")
            ).alias("thumbnails"),
            F.col("c_mktsegment").alias("country"),
            F.when(k % 5 == 0, F.lit("en"))
            .when(k % 5 == 1, F.lit("EN"))
            .when(k % 5 == 2, F.lit("fr-CA"))
            .when(k % 5 == 3, F.lit("zz"))
            .alias("defaultLanguage"),
        ).alias("snippet"),
        F.struct(
            F.when(k % 7 != 0, F.floor(F.col("c_acctbal") * 100).cast("string"))
            .alias("viewCount"),
            ((k * 13) % 100000).cast("string").alias("subscriberCount"),
            F.when(k % 11 == 0, F.lit("0"))
            .otherwise((k % 500).cast("string"))
            .alias("videoCount"),
        ).alias("statistics"),
        F.struct(
            F.when(k % 2 == 0, F.lit("public")).otherwise(F.lit("unlisted")).alias(
                "privacyStatus"
            ),
            (k % 4 == 0).alias("isLinked"),
        ).alias("status"),
        F.struct(
            F.when(
                k % 6 != 0,
                F.array(
                    F.lit("https://en.wikipedia.org/wiki/Music_(genre)"),
                    F.lit("https://other.example.com/x"),
                    F.concat(
                        F.lit("https://en.wikipedia.org/wiki/Seg_"),
                        F.col("c_mktsegment"),
                    ),
                ),
            ).alias("topicCategories")
        ).alias("topicDetails"),
        F.struct(
            F.struct(F.concat(F.lit("UU"), k).alias("uploads")).alias(
                "relatedPlaylists"
            )
        ).alias("contentDetails"),
    )


def channel_format_flat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 gate: the full channel formatter (P1+P3+P6+P7+P8) over synthesized
    nested resources, flattened for hash comparison."""
    raw = _raw_channels(spark, sf_dir)
    out = format_channels(raw, _language_dim(spark, sf_dir))
    return out.select(
        "id",
        "title",
        "custom_url",
        "published_at",
        "country",
        F.col("default_language.code").alias("dl_code"),
        F.col("default_language.name").alias("dl_name"),
        "view_count",
        "subscriber_count",
        "video_count",
        "privacy_status",
        F.array_join("categories", "; ").alias("categories_str"),
        "uploads_playlist",
        "email",
        F.col("verification_status.has_email").alias("vs_has_email"),
        F.col("verification_status.has_custom_url").alias("vs_has_custom_url"),
        F.col("verification_status.has_description").alias("vs_has_description"),
        F.col("verification_status.is_verified").alias("vs_is_verified"),
        F.col("engagement_data.avg_views_per_video").alias("avg_views_per_video"),
        F.col("engagement_data.subscriber_to_video_ratio").alias(
            "subscriber_to_video_ratio"
        ),
    )  # no presentation sort: gate hashes order-insensitively


ORACLE_CHANNEL_FORMAT_FLAT = """
WITH dim AS (
  SELECT DISTINCT lang AS id, 'name_' || lang AS name FROM documents
),
base AS (
  SELECT c_custkey AS k,
         CAST(c_custkey AS VARCHAR) AS id,
         c_name AS title,
         CASE WHEN c_custkey % 5 = 0
              THEN 'reach me at user' || c_custkey || '@example.com'
              ELSE 'channel of ' || c_mktsegment END AS description,
         CASE WHEN c_custkey % 3 = 0 THEN '@ch' || c_custkey END AS custom_url,
         '20' || lpad(CAST(c_custkey % 20 AS VARCHAR), 2, '0')
              || '-03-07T08:30:00Z' AS published_str,
         c_mktsegment AS country,
         CASE WHEN c_custkey % 5 = 0 THEN 'en'
              WHEN c_custkey % 5 = 1 THEN 'EN'
              WHEN c_custkey % 5 = 2 THEN 'fr-CA'
              WHEN c_custkey % 5 = 3 THEN 'zz' END AS dl_code,
         CASE WHEN c_custkey % 7 <> 0
              THEN CAST(CAST(FLOOR(c_acctbal * 100) AS BIGINT) AS VARCHAR) END
           AS view_count_str,
         CAST((c_custkey * 13) % 100000 AS VARCHAR) AS sub_count_str,
         CASE WHEN c_custkey % 11 = 0 THEN '0'
              ELSE CAST(c_custkey % 500 AS VARCHAR) END AS video_count_str,
         CASE WHEN c_custkey % 2 = 0 THEN 'public' ELSE 'unlisted' END
           AS privacy_status,
         c_custkey % 4 = 0 AS is_linked,
         c_custkey % 6 <> 0 AS has_topics,
         c_mktsegment AS seg
  FROM customer
),
counts AS (
  SELECT *,
         COALESCE(TRY_CAST(view_count_str AS BIGINT), 0) AS view_count,
         COALESCE(TRY_CAST(sub_count_str AS BIGINT), 0) AS subscriber_count,
         COALESCE(TRY_CAST(video_count_str AS BIGINT), 0) AS video_count,
         CASE WHEN k % 5 = 0 THEN 'user' || k || '@example.com' END AS email
  FROM base
)
SELECT counts.id, title, custom_url,
       CAST(strptime(published_str, '%Y-%m-%dT%H:%M:%SZ') AS TIMESTAMP)
         AS published_at,
       country,
       dl_code,
       CASE WHEN dl_code IS NULL THEN NULL
            ELSE COALESCE(ne.name, nl.name, nb.name, upper(dl_code)) END
         AS dl_name,
       view_count, subscriber_count, video_count, privacy_status,
       CASE WHEN has_topics
            THEN COALESCE('Music genre; Seg ' || seg, 'Music genre')
            ELSE '' END AS categories_str,
       'UU' || k AS uploads_playlist,
       email,
       email IS NOT NULL AS vs_has_email,
       custom_url IS NOT NULL AS vs_has_custom_url,
       (k % 5 = 0 OR seg IS NOT NULL) AS vs_has_description,
       is_linked AS vs_is_verified,
       CAST(FLOOR(CAST(view_count AS DOUBLE) / GREATEST(video_count, 1))
            AS BIGINT) AS avg_views_per_video,
       CAST(FLOOR(CAST(subscriber_count AS DOUBLE) / GREATEST(video_count, 1))
            AS BIGINT) AS subscriber_to_video_ratio
FROM counts
LEFT JOIN dim ne ON counts.dl_code = ne.id
LEFT JOIN dim nl ON lower(counts.dl_code) = nl.id
LEFT JOIN dim nb ON split_part(lower(counts.dl_code), '-', 1) = nb.id
ORDER BY k
"""


QUERIES = {
    "language_fallback_resolution": language_fallback_resolution,
    "channel_format_flat": channel_format_flat,
}

ORACLES = {
    "language_fallback_resolution": ORACLE_LANGUAGE_FALLBACK_RESOLUTION,
    "channel_format_flat": ORACLE_CHANNEL_FORMAT_FLAT,
}


def _raw_videos(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested video resources synthesized from ``orders`` — the raw shape
    P2 consumes (snippet/contentDetails/statistics/status/topicDetails/
    player parts, config.py:78).

    No ``spread`` here: measured locally, shuffling 150k nested rows
    costs exactly what the parallelized formatter saves (1.3s either
    way), and on a real cluster the scan arrives already split — keep
    the formatter pipelined into the scan with zero exchanges."""
    o = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    dur = (
        F.when(k % 3 == 0, F.concat(F.lit("PT"), (k % 60).cast("string"), F.lit("S")))
        .when(
            k % 3 == 1,
            F.concat(
                F.lit("PT"),
                (k % 90).cast("string"),
                F.lit("M"),
                (k % 60).cast("string"),
                F.lit("S"),
            ),
        )
        .otherwise(
            F.concat(F.lit("P"), (k % 3).cast("string"), F.lit("DT2H"))
        )
    )
    return o.select(
        F.concat(F.lit("v"), k).alias("id"),
        F.struct(
            F.concat(F.lit("video "), k).alias("title"),
            F.concat(F.lit("UC"), F.col("o_custkey")).alias("channelId"),
            F.concat(F.lit("channel "), F.col("o_custkey")).alias("channelTitle"),
            F.date_format("o_orderdate", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias(
                "publishedAt"
            ),
            (k % 44).cast("string").alias("categoryId"),
            F.when(k % 5 == 0, F.lit("en"))
            .when(k % 5 == 1, F.lit("ZH"))
            .when(k % 5 == 2, F.lit("es-MX"))
            .alias("defaultAudioLanguage"),
        ).alias("snippet"),
        F.struct(dur.alias("duration")).alias("contentDetails"),
        F.struct(
            F.floor(F.col("o_totalprice")).cast("string").alias("viewCount"),
            F.when(k % 9 != 0, ((k * 7) % 10000).cast("string")).alias("likeCount"),
            ((k * 3) % 1000).cast("string").alias("commentCount"),
        ).alias("statistics"),
        F.struct(
            F.when(F.col("o_orderstatus") == "O", F.lit("public"))
            .otherwise(F.lit("private"))
            .alias("privacyStatus"),
            (k % 2 == 0).alias("embeddable"),
            F.lit(None).cast("boolean").alias("madeForKids"),
        ).alias("status"),
        F.struct(
            F.when(
                k % 4 != 0,
                F.array(
                    F.concat(
                        F.lit("https://en.wikipedia.org/wiki/Pri_"),
                        F.col("o_orderpriority"),
                    )
                ),
            ).alias("topicCategories")
        ).alias("topicDetails"),
        F.struct(
            F.concat(F.lit("<iframe src='https://e/"), k, F.lit("'/>")).alias(
                "embedHtml"
            )
        ).alias("player"),
    )


def video_format_flat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 gate: the full video formatter (flatten + casts + ISO-8601
    duration parse + audio-language fallback) over synthesized nested
    resources, flattened for hash comparison."""
    raw = _raw_videos(spark, sf_dir)
    out = format_videos(raw, _language_dim(spark, sf_dir))
    return out.select(
        "id",
        "title",
        "channel_id",
        "channel_title",
        "published_at",
        "category_id",
        F.col("default_audio_language.code").alias("al_code"),
        F.col("default_audio_language.name").alias("al_name"),
        "duration",
        "duration_sec",
        "view_count",
        "like_count",
        "comment_count",
        "privacy_status",
        "embeddable",
        "made_for_kids",
        F.array_join("topic_categories", "; ").alias("topics_str"),
        "embed_html",
    )  # no presentation sort: gate hashes order-insensitively


ORACLE_VIDEO_FORMAT_FLAT = """
WITH dim AS (
  SELECT DISTINCT lang AS id, 'name_' || lang AS name FROM documents
),
base AS (
  SELECT o_orderkey AS k,
         'v' || o_orderkey AS id,
         'video ' || o_orderkey AS title,
         'UC' || o_custkey AS channel_id,
         'channel ' || o_custkey AS channel_title,
         o_orderdate AS published_at,
         CAST(o_orderkey % 44 AS VARCHAR) AS category_id,
         CASE WHEN o_orderkey % 5 = 0 THEN 'en'
              WHEN o_orderkey % 5 = 1 THEN 'ZH'
              WHEN o_orderkey % 5 = 2 THEN 'es-MX' END AS al_code,
         CASE WHEN o_orderkey % 3 = 0
              THEN 'PT' || CAST(o_orderkey % 60 AS VARCHAR) || 'S'
              WHEN o_orderkey % 3 = 1
              THEN 'PT' || CAST(o_orderkey % 90 AS VARCHAR) || 'M'
                        || CAST(o_orderkey % 60 AS VARCHAR) || 'S'
              ELSE 'P' || CAST(o_orderkey % 3 AS VARCHAR) || 'DT2H'
         END AS duration,
         CASE WHEN o_orderkey % 3 = 0 THEN o_orderkey % 60
              WHEN o_orderkey % 3 = 1
              THEN (o_orderkey % 90) * 60 + o_orderkey % 60
              ELSE (o_orderkey % 3) * 86400 + 7200
         END AS duration_sec,
         COALESCE(CAST(FLOOR(o_totalprice) AS BIGINT), 0) AS view_count,
         CASE WHEN o_orderkey % 9 <> 0 THEN (o_orderkey * 7) % 10000
              ELSE 0 END AS like_count,
         (o_orderkey * 3) % 1000 AS comment_count,
         CASE WHEN o_orderstatus = 'O' THEN 'public' ELSE 'private' END
           AS privacy_status,
         o_orderkey % 2 = 0 AS embeddable,
         FALSE AS made_for_kids,
         CASE WHEN o_orderkey % 4 <> 0
              THEN COALESCE('https://en.wikipedia.org/wiki/Pri_'
                            || o_orderpriority, '')
              ELSE '' END AS topics_str,
         '<iframe src=''https://e/' || o_orderkey || '''/>' AS embed_html
  FROM orders
)
SELECT base.id, title, channel_id, channel_title, published_at, category_id,
       al_code,
       CASE WHEN al_code IS NULL THEN NULL
            ELSE COALESCE(ne.name, nl.name, nb.name, upper(al_code)) END
         AS al_name,
       duration, CAST(duration_sec AS BIGINT) AS duration_sec,
       view_count, CAST(like_count AS BIGINT) AS like_count,
       CAST(comment_count AS BIGINT) AS comment_count,
       privacy_status, embeddable, made_for_kids, topics_str, embed_html
FROM base
LEFT JOIN dim ne ON base.al_code = ne.id
LEFT JOIN dim nl ON lower(base.al_code) = nl.id
LEFT JOIN dim nb ON split_part(lower(base.al_code), '-', 1) = nb.id
ORDER BY k
"""


QUERIES["video_format_flat"] = video_format_flat
ORACLES["video_format_flat"] = ORACLE_VIDEO_FORMAT_FLAT


def channel_by_handle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 point lookup: ``get_channel_by_handle`` (youtube_api_handler.py:
    430-450) — normalize the raw handle (P9, lstrip '@' then re-prefix,
    youtube_api_handler.py:437-441), match it against the channel
    ``customUrl``, and format the hit (P1).

    Scale shape: the handle list is a literal few-row frame, so the lookup
    compiles to a broadcast hash join against the channel scan — the same
    plan an id-list point lookup uses at any scale (no shuffle of the big
    side). Misses ('@nosuch') drop out, as in the reference's None return.
    """
    from ..functions.text import normalize_handle

    # literal VALUES relation, not createDataFrame: a LocalRelation stays
    # driver-local (no Python-RDD pickle round trip, trivial broadcast)
    raw_handles = spark.sql(
        "SELECT * FROM VALUES ('@@ch3'), ('ch6'), ('@ch9'), ('@ch12'),"
        " ('@nosuch') AS t(raw_handle)"
    ).select(normalize_handle(F.col("raw_handle")).alias("handle"))
    raw = _raw_channels(spark, sf_dir)
    hit = raw.join(
        F.broadcast(raw_handles),
        F.col("snippet.customUrl") == F.col("handle"),
        "inner",
    )
    out = format_channels(hit.drop("handle"), _language_dim(spark, sf_dir))
    return out.select(
        "id",
        "title",
        "custom_url",
        "country",
        "subscriber_count",
        "video_count",
        "privacy_status",
        "uploads_playlist",
    )


ORACLE_CHANNEL_BY_HANDLE = """
WITH handles AS (
  SELECT '@' || regexp_replace(raw_handle, '^@+', '') AS handle
  FROM (VALUES ('@@ch3'), ('ch6'), ('@ch9'), ('@ch12'), ('@nosuch'))
       AS t(raw_handle)
)
SELECT CAST(c_custkey AS VARCHAR) AS id,
       c_name AS title,
       '@ch' || c_custkey AS custom_url,
       c_mktsegment AS country,
       (c_custkey * 13) % 100000 AS subscriber_count,
       CASE WHEN c_custkey % 11 = 0 THEN 0 ELSE c_custkey % 500 END
         AS video_count,
       CASE WHEN c_custkey % 2 = 0 THEN 'public' ELSE 'unlisted' END
         AS privacy_status,
       'UU' || c_custkey AS uploads_playlist
FROM customer
JOIN handles ON c_custkey % 3 = 0 AND '@ch' || c_custkey = handle
ORDER BY c_custkey
"""


QUERIES["channel_by_handle"] = channel_by_handle
ORACLES["channel_by_handle"] = ORACLE_CHANNEL_BY_HANDLE
