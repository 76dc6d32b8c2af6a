"""Explicit StructType schemas for the reference-domain tables.

The reference's schemas are implicit (dict ``.get()`` chains); the two
declared shapes are the SQLite DDL (sqlite_logger.py:29-46) and the OpenAPI
``ChannelData``/``VideoData`` components (api_server.py:660-704). These
StructTypes make them explicit, per FIXTURES.md §B.

``RAW_CHANNEL_SCHEMA``/``RAW_VIDEO_SCHEMA`` model the nested API resource
as fetched (parts per config.py:77-78, counts arriving as strings);
``CHANNEL_SCHEMA``/``VIDEO_SCHEMA`` are the formatted output shapes
(youtube_api_handler.py:688-779).
"""

from __future__ import annotations

from pyspark.sql import types as T


def _s(*fields: T.StructField) -> T.StructType:
    return T.StructType(list(fields))


def _f(name: str, dtype: T.DataType, nullable: bool = True) -> T.StructField:
    return T.StructField(name, dtype, nullable)


_LANG_STRUCT = _s(_f("code", T.StringType()), _f("name", T.StringType()))

# --- raw ingest shapes (API resource parts) --------------------------------

RAW_CHANNEL_SCHEMA = _s(
    _f("id", T.StringType(), False),
    _f(
        "snippet",
        _s(
            _f("title", T.StringType()),
            _f("description", T.StringType()),
            _f("customUrl", T.StringType()),
            _f("publishedAt", T.StringType()),  # ISO string at ingest
            _f("thumbnails", T.StringType()),  # opaque JSON passthrough
            _f("country", T.StringType()),
            _f("defaultLanguage", T.StringType()),
        ),
    ),
    _f(
        "statistics",
        _s(
            # counts arrive as STRINGS from the API (youtube_api_handler.py:728-730)
            _f("viewCount", T.StringType()),
            _f("subscriberCount", T.StringType()),
            _f("videoCount", T.StringType()),
        ),
    ),
    _f("status", _s(_f("privacyStatus", T.StringType()), _f("isLinked", T.BooleanType()))),
    _f("topicDetails", _s(_f("topicCategories", T.ArrayType(T.StringType())))),
    _f(
        "contentDetails",
        _s(_f("relatedPlaylists", _s(_f("uploads", T.StringType())))),
    ),
)

RAW_VIDEO_SCHEMA = _s(
    _f("id", T.StringType(), False),
    _f(
        "snippet",
        _s(
            _f("title", T.StringType()),
            _f("description", T.StringType()),
            _f("channelId", T.StringType()),
            _f("channelTitle", T.StringType()),
            _f("publishedAt", T.StringType()),
            _f("thumbnails", T.StringType()),
            _f("categoryId", T.StringType()),
            _f("defaultAudioLanguage", T.StringType()),
        ),
    ),
    _f("contentDetails", _s(_f("duration", T.StringType()))),
    _f(
        "statistics",
        _s(
            _f("viewCount", T.StringType()),
            _f("likeCount", T.StringType()),
            _f("commentCount", T.StringType()),
        ),
    ),
    _f(
        "status",
        _s(
            _f("privacyStatus", T.StringType()),
            _f("embeddable", T.BooleanType()),
            _f("madeForKids", T.BooleanType()),
        ),
    ),
    _f("topicDetails", _s(_f("topicCategories", T.ArrayType(T.StringType())))),
    _f("player", _s(_f("embedHtml", T.StringType()))),
)

# --- formatted output shapes (OpenAPI ChannelData/VideoData) ---------------

CHANNEL_SCHEMA = _s(
    _f("id", T.StringType(), False),
    _f("title", T.StringType()),
    _f("description", T.StringType()),
    _f("custom_url", T.StringType()),
    _f("published_at", T.TimestampType()),
    _f("thumbnails", T.StringType()),
    _f("country", T.StringType()),
    _f("default_language", _LANG_STRUCT),
    _f("view_count", T.LongType()),
    _f("subscriber_count", T.LongType()),
    _f("video_count", T.LongType()),
    _f("privacy_status", T.StringType()),
    _f("categories", T.ArrayType(T.StringType())),
    _f("topic_categories", T.ArrayType(T.StringType())),
    _f("uploads_playlist", T.StringType()),
    _f("email", T.StringType()),
    _f(
        "verification_status",
        _s(
            _f("has_email", T.BooleanType()),
            _f("has_custom_url", T.BooleanType()),
            _f("has_description", T.BooleanType()),
            _f("is_verified", T.BooleanType()),
        ),
    ),
    _f(
        "engagement_data",
        _s(
            _f("avg_views_per_video", T.LongType()),
            _f("subscriber_to_video_ratio", T.LongType()),
        ),
    ),
)

VIDEO_SCHEMA = _s(
    _f("id", T.StringType(), False),
    _f("title", T.StringType()),
    _f("channel_id", T.StringType()),
    _f("channel_title", T.StringType()),
    _f("published_at", T.TimestampType()),
    _f("category_id", T.StringType()),
    _f("default_audio_language", _LANG_STRUCT),
    _f("duration", T.StringType()),
    _f("duration_sec", T.LongType()),
    _f("view_count", T.LongType()),
    _f("like_count", T.LongType()),
    _f("comment_count", T.LongType()),
    _f("privacy_status", T.StringType()),
    _f("embeddable", T.BooleanType()),
    _f("made_for_kids", T.BooleanType()),
    _f("topic_categories", T.ArrayType(T.StringType())),
    _f("embed_html", T.StringType()),
)

RSS_ENTRY_SCHEMA = _s(
    _f("channel_id", T.StringType()),
    _f("video_id", T.StringType()),
    _f("title", T.StringType()),
    _f("published_at", T.TimestampType()),
    _f("updated_at", T.TimestampType()),
    _f("url", T.StringType()),
    _f("video_type", T.StringType()),
    _f("views_from_rss", T.LongType()),
)

LANGUAGE_SCHEMA = _s(_f("id", T.StringType(), False), _f("name", T.StringType()))

LOG_SCHEMA = _s(
    _f("id", T.LongType()),
    _f("timestamp", T.TimestampType()),
    _f("logger_name", T.StringType()),
    _f("level", T.StringType()),
    _f("level_no", T.IntegerType()),
    _f("message", T.StringType()),
    _f("pathname", T.StringType()),
    _f("filename", T.StringType()),
    _f("funcname", T.StringType()),
    _f("lineno", T.IntegerType()),
    _f("thread_id", T.LongType()),
    _f("thread_name", T.StringType()),
    _f("process_id", T.LongType()),
    _f("created_at", T.TimestampType()),
)
