"""P1/P2/P4 formatter tests on literal reference-shaped fixtures
(FIXTURES.md §B generator constraints)."""

from __future__ import annotations

import pytest

from youtube_api_batch_process_with_analytics_spark.operators.projections import (
    format_channels,
    format_videos,
    project_rss_entries,
)
from youtube_api_batch_process_with_analytics_spark.sources.schemas import (
    RAW_CHANNEL_SCHEMA,
    RAW_VIDEO_SCHEMA,
)


@pytest.fixture(scope="module")
def languages(spark):
    return spark.createDataFrame(
        [("en", "English"), ("es", "Spanish")], "id string, name string"
    )


def _raw_channel(
    id="c1",
    description="Business: reach me at biz@example.com or alt@x.io",
    custom_url="@chan",
    view_count="1000",
    sub_count="50",
    video_count="7",
    lang="en-US",
    topics=(
        "https://en.wikipedia.org/wiki/Rock_music",
        "https://example.com/not-wiki",
    ),
    is_linked=True,
):
    return (
        id,
        (  # snippet
            "Title",
            description,
            custom_url,
            "2021-05-01T10:00:00Z",
            '{"default":{}}',
            "US",
            lang,
        ),
        (view_count, sub_count, video_count),
        ("public", is_linked),
        (list(topics),),
        ((("UUplaylist",),)),
    )


def test_format_channels(spark, languages):
    raw = spark.createDataFrame(
        [
            _raw_channel(),
            _raw_channel(
                id="c2",
                description="no contact info",
                video_count="0",  # zero-video guard (youtube_api_handler.py:743-744)
                lang="xx-YY",
                is_linked=False,
            ),
            _raw_channel(id="c3", view_count=None, sub_count=None, video_count=None),
        ],
        RAW_CHANNEL_SCHEMA,
    )
    out = {r["id"]: r for r in format_channels(raw, languages).collect()}

    c1 = out["c1"]
    assert c1["email"] == "biz@example.com"  # first match wins
    assert c1["view_count"] == 1000 and c1["video_count"] == 7
    assert c1["default_language"]["name"] == "English"  # en-US → en fallback
    assert c1["categories"] == ["Rock music"]  # non-wiki dropped
    assert c1["verification_status"]["has_email"] is True
    assert c1["verification_status"]["is_verified"] is True
    assert c1["engagement_data"]["avg_views_per_video"] == 1000 // 7

    c2 = out["c2"]
    assert c2["email"] is None
    assert c2["verification_status"]["has_email"] is False
    # zero-video guard → divide by max(1, n)
    assert c2["engagement_data"]["avg_views_per_video"] == 1000
    assert c2["default_language"]["name"] == "XX-YY"  # unknown → upper(code)

    c3 = out["c3"]
    assert c3["view_count"] == 0 and c3["subscriber_count"] == 0  # missing → 0


def _raw_video(id="v1", duration="PT1M47S", view_count="500", like_count=None):
    return (
        id,
        (
            "VTitle",
            "desc",
            "c1",
            "Chan",
            "2024-02-03T04:05:06Z",
            "{}",
            "22",
            "en",
        ),
        (duration,),
        (view_count, like_count, "3"),
        ("public", True, False),
        (["https://en.wikipedia.org/wiki/Pop_music"],),
        ("<iframe/>",),
    )


def test_format_videos(spark, languages):
    raw = spark.createDataFrame([_raw_video()], RAW_VIDEO_SCHEMA)
    v = format_videos(raw, languages).collect()[0]
    assert v["duration"] == "PT1M47S" and v["duration_sec"] == 107
    assert v["view_count"] == 500
    assert v["like_count"] == 0  # missing count → 0
    assert v["comment_count"] == 3
    assert v["default_audio_language"]["name"] == "English"
    assert v["embeddable"] is True and v["made_for_kids"] is False


def test_project_rss_entries(spark):
    raw = spark.createDataFrame(
        [
            ("c1", "t1", "2024-01-01T00:00:00Z", "2024-01-02T00:00:00Z",
             "https://www.youtube.com/watch?v=abc123&feature=x", "77"),
            ("c1", "t2", "2024-01-03T00:00:00Z", "2024-01-03T01:00:00Z",
             "https://www.youtube.com/shorts/sh0rt-1?si=y", None),
            ("c1", "t3", "2024-01-04T00:00:00Z", "2024-01-04T00:30:00Z",
             "https://example.com/broken", "5"),
        ],
        "channel_id string, title string, published_at string, "
        "updated_at string, url string, views_from_rss string",
    )
    rows = {r["url"]: r for r in project_rss_entries(raw).collect()}
    watch = rows["https://www.youtube.com/watch?v=abc123&feature=x"]
    short = rows["https://www.youtube.com/shorts/sh0rt-1?si=y"]
    broken = rows["https://example.com/broken"]
    assert watch["video_id"] == "abc123" and watch["video_type"] == "long"
    assert watch["views_from_rss"] == 77
    assert short["video_id"] == "sh0rt-1" and short["video_type"] == "shorts"
    assert short["views_from_rss"] == 0  # missing → 0
    assert broken["video_id"] == "" and broken["video_type"] == "unknown"
    assert watch["published_at"].year == 2024
