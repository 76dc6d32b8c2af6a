"""String/array expressions modeling the reference's scalar helpers.

Each function cites the reference implementation it reproduces. All are
native Column expressions (regexp/transform/filter) — no Python UDFs, so
they stay inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# youtube_api_handler.py:854 — first email in description, else null.
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"

# youtube_api_handler.py:810-815 — video id from /watch?v=X&... or /shorts/X?...
VIDEO_ID_PATTERN = r"(?:/watch\?v=|/shorts/)([A-Za-z0-9_-]+)"


def extract_email(text: Column) -> Column:
    """First email-looking token, null when absent (youtube_api_handler.py:848-860)."""
    return F.nullif(F.regexp_extract(text, EMAIL_PATTERN, 0), F.lit(""))


def extract_video_id(url: Column) -> Column:
    """Video id from a watch/shorts URL (youtube_api_handler.py:805-815)."""
    return F.regexp_extract(url, VIDEO_ID_PATTERN, 1)


def classify_video_type(url: Column) -> Column:
    """'shorts' | 'long' | 'unknown' by URL shape (youtube_api_handler.py:879-889)."""
    return (
        F.when(url.contains("/shorts/"), F.lit("shorts"))
        .when(url.contains("/watch?v="), F.lit("long"))
        .otherwise(F.lit("unknown"))
    )


def beautify_topic_categories(categories: Column) -> Column:
    """Per Wikipedia URL: text after '/wiki/', '_'→space, strip parens; drop
    non-wiki URLs (youtube_api_handler.py:862-877). Array-native transform."""
    wiki_only = F.filter(categories, lambda c: c.contains("/wiki/"))
    return F.transform(
        wiki_only,
        lambda c: F.regexp_replace(
            F.regexp_replace(F.substring_index(c, "/wiki/", -1), "_", " "),
            r"[()]",
            "",
        ),
    )


def normalize_handle(handle: Column) -> Column:
    """Strip leading '@'s then re-prefix exactly one (youtube_api_handler.py:437-441)."""
    return F.concat(F.lit("@"), F.regexp_replace(handle, "^@+", ""))


def iso8601_duration_seconds(duration: Column) -> Column:
    """ISO-8601 duration string ('PT1M47S', 'P1DT2H') → seconds (BIGINT).

    The reference keeps the raw string (youtube_api_handler.py:769); the
    engine derives a numeric column so duration math is SQL-native.
    """
    def part(pattern: str) -> Column:
        # regexp_extract yields '' on no-match; ANSI mode forbids ''→long.
        extracted = F.nullif(F.regexp_extract(duration, pattern, 1), F.lit(""))
        return F.coalesce(extracted.cast("long"), F.lit(0))

    days = part(r"P(?:(\d+)D)?")
    hours = part(r"T(?:(\d+)H)?")
    minutes = part(r"T(?:\d+H)?(?:(\d+)M)?")
    seconds = part(r"T(?:\d+H)?(?:\d+M)?(?:(\d+)S)?")
    return (days * 86400 + hours * 3600 + minutes * 60 + seconds).cast("long")


def token_count(text: Column) -> Column:
    """Whitespace-token count (engine extension for the text-pipeline ops)."""
    trimmed = F.trim(text)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    ).cast("long")
