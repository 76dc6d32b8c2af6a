"""Multimodal (image/audio/video) column plumbing for training pipelines.

Media is carried as an opaque ``binary`` column plus a typed metadata
struct; per-item compute (decode, feature extraction, resize, frame
sampling) runs as Arrow-batched ``mapInPandas`` transforms — the idiomatic
Spark pattern for Python-library work that native expressions can't
express. Batches stream through the Python worker (no per-row pickling, no
driver collect), so the same plumbing holds at 100 TB: partitions of
binary blobs flow executor-side through Arrow.

The actual codec calls are STUBBED (``_decode_stub``) because no
image/audio libraries ship in this container: decode produces a
deterministic fake (dimensions/bytes derived from the blob content hash),
clearly marked. Swapping in Pillow/librosa/pyav is a one-function change —
the Spark-side schema, partitioning, UDF signature, and batch shape are
real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("n_bytes", T.LongType()),
                    T.StructField("source_uri", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def make_media_frame(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """Build a synthetic media table from ``documents`` (deterministic):
    the text bytes stand in for an encoded blob. Demonstrates the binary
    column + typed metadata layout."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.length(F.encode(F.col("text"), "UTF-8")).cast("long").alias("n_bytes"),
            F.concat(F.lit("synthetic://doc/"), F.col("doc_id")).alias("source_uri"),
        ).alias("meta"),
    )


def _decode_stub(content: bytes) -> dict:
    """STUB decoder — deterministic fake in place of a real codec.

    A real implementation would be e.g.::

        from PIL import Image; img = Image.open(io.BytesIO(content))
        return {"width": img.width, "height": img.height, ...}

    Here width/height/features derive from the content hash so results are
    reproducible and the full pipeline is exercisable without codecs.
    """
    if content is None:
        return {"width": None, "height": None, "feature": None}
    digest = hashlib.md5(content).digest()
    width = 64 + digest[0]
    height = 64 + digest[1]
    feature = [b / 255.0 for b in digest[:8]]
    return {"width": width, "height": height, "feature": feature}


def decode_and_featurize(media: DataFrame) -> DataFrame:
    """Decode + feature-extract via Arrow-batched ``mapInPandas``.

    The iterator-of-batches signature is the scale-critical part: one
    Python worker call per Arrow batch (not per row), constant memory per
    partition regardless of partition size.
    """

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_decode_stub(c) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "width": [d["width"] for d in decoded],
                    "height": [d["height"] for d in decoded],
                    "n_bytes": [
                        len(c) if c is not None else 0 for c in pdf["content"]
                    ],
                    "feature": [d["feature"] for d in decoded],
                }
            )

    return media.mapInPandas(process, FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("target_width", T.IntegerType()),
        T.StructField("target_height", T.IntegerType()),
        T.StructField("resized", T.BinaryType()),
    ]
)


def resize_images(media: DataFrame, width: int = 224, height: int = 224) -> DataFrame:
    """Resize stub: passes blobs through the same Arrow batch path a real
    resize kernel would use (real impl: PIL ``Image.resize`` per row)."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[pdf["media_type"] == "image"]
            yield pd.DataFrame(
                {
                    "media_id": out["media_id"],
                    "target_width": width,
                    "target_height": height,
                    # STUB: a real kernel emits re-encoded bytes; we
                    # truncate deterministically to keep plumbing honest.
                    "resized": [
                        c[: width * height // 1024] if c is not None else None
                        for c in out["content"]
                    ],
                }
            )

    return media.mapInPandas(process, RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def frame_sample(media: DataFrame, every_n_bytes: int = 64, max_frames: int = 4) -> DataFrame:
    """Frame-sampling stub for video blobs: emits up to ``max_frames``
    deterministic byte-slices per video (1→N fan-out through mapInPandas —
    the same shape a real pyav keyframe sampler produces)."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "frame_idx": [], "frame": []}
            vids = pdf[pdf["media_type"] == "video"]
            for mid, content in zip(vids["media_id"], vids["content"]):
                if content is None:
                    continue
                for i in range(min(max_frames, max(1, len(content) // every_n_bytes))):
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(i)
                    rows["frame"].append(
                        content[i * every_n_bytes : (i + 1) * every_n_bytes]
                    )
            yield pd.DataFrame(rows)

    return media.mapInPandas(process, FRAME_SCHEMA)
