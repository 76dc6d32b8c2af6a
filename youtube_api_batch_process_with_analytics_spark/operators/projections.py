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
