"""Multimodal plumbing tests: binary columns through Arrow-batched
mapInPandas with deterministic stub kernels."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from youtube_api_batch_process_with_analytics_spark.multimodal import (
    decode_and_featurize,
    frame_sample,
    make_media_frame,
    resize_images,
)
from youtube_api_batch_process_with_analytics_spark.sources import load_table


def _media(spark, sf_dir):
    return make_media_frame(spark, load_table(spark, sf_dir, "documents").limit(60))


def test_media_frame_schema(spark, sf_dir):
    media = _media(spark, sf_dir)
    row = media.first()
    assert isinstance(row.content, (bytes, bytearray))
    assert row.meta.n_bytes == len(row.content)
    assert media.select("media_type").distinct().count() == 3


def test_decode_and_featurize_deterministic(spark, sf_dir):
    media = _media(spark, sf_dir)
    feats = decode_and_featurize(media)
    rows = feats.orderBy("media_id").collect()
    assert len(rows) == 60
    src = {r.media_id: r.content for r in media.collect()}
    for r in rows[:5]:
        digest = hashlib.md5(src[r.media_id]).digest()
        assert r.width == 64 + digest[0] and r.height == 64 + digest[1]
        assert len(r.feature) == 8
        assert r.n_bytes == len(src[r.media_id])
    # repartitioned run yields identical results (no order/partition effects)
    again = decode_and_featurize(media.repartition(7)).orderBy("media_id").collect()
    assert [tuple(r) for r in again] == [tuple(r) for r in rows]


def test_resize_images_only_images(spark, sf_dir):
    media = _media(spark, sf_dir)
    out = resize_images(media)
    n_images = media.filter(F.col("media_type") == "image").count()
    assert out.count() == n_images > 0
    assert out.filter(F.col("target_width") != 224).count() == 0


def test_frame_sample_fanout(spark, sf_dir):
    media = _media(spark, sf_dir)
    frames = frame_sample(media)
    n_videos = media.filter(F.col("media_type") == "video").count()
    got = frames.groupBy("media_id").count().collect()
    assert len(got) == n_videos > 0
    assert all(1 <= r["count"] <= 4 for r in got)
    f0 = frames.filter(F.col("frame_idx") == 0).first()
    assert len(f0.frame) <= 64
