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
    column + typed metadata layout.

    Docs with NULL text yield NO media row (a crawler emits nothing for a
    document with no payload) — the NULL-content alternative would force
    nullable INT metadata columns through the oracle's pandas fetch (the
    float64 coercion trap) and a decode path no real codec has.
    Mirrored by ``AND text IS NOT NULL`` in every media oracle."""
    return docs.filter(F.col("text").isNotNull()).select(
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


def media_metadata_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-metadata rollup over the binary media table: per media_type
    counts and byte volumes. The metadata struct (not the blob) drives the
    aggregate — at 100 TB the blobs never move, only the struct columns
    (Parquet column pruning drops `content` from the scan entirely)."""
    from ..sources import load_table

    media = make_media_frame(spark, load_table(spark, sf_dir, "documents"))
    return (
        media.groupBy("media_type")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(F.col("meta.n_bytes")).alias("total_bytes"),
            F.floor(F.sum(F.col("meta.n_bytes")) / F.count("*")).alias("avg_bytes"),
            F.max(F.col("meta.n_bytes")).alias("max_bytes"),
        )
    )


# doc_id % 3 → media_type (mirrors make_media_frame's element_at rotation)
_DUCK_MEDIA_TYPE = (
    "(['image','audio','video'])[CAST(doc_id % 3 + 1 AS INT)]"
)
_DUCK_NBYTES = "octet_length(encode(text))"

ORACLE_MEDIA_METADATA_STATS = f"""
WITH media AS (
  SELECT doc_id AS media_id, {_DUCK_MEDIA_TYPE} AS media_type,
         CAST({_DUCK_NBYTES} AS BIGINT) AS n_bytes
  FROM documents WHERE text IS NOT NULL
)
SELECT media_type, COUNT(*) AS n_items,
       CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
       CAST(FLOOR(CAST(SUM(n_bytes) AS DOUBLE) / COUNT(*)) AS BIGINT) AS avg_bytes,
       MAX(n_bytes) AS max_bytes
FROM media GROUP BY media_type ORDER BY media_type
"""


def media_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode+featurize through the Arrow ``mapInPandas`` path, projected to
    oracle-comparable scalars (first feature component as f0). The decode
    stub derives width/height/features from the md5 digest, so a SQL oracle
    can replay it digit-by-digit — proving the Python batch path computes
    exactly what it claims."""
    from ..sources import load_table, spread

    media = make_media_frame(spark, spread(load_table(spark, sf_dir, "documents")))
    feats = decode_and_featurize(media)
    return feats.select(
        "media_id",
        "media_type",
        "width",
        "height",
        "n_bytes",
        F.round(F.element_at("feature", 1).cast("double"), 6).alias("f0"),
    )


# hex-digit value without relying on from_hex/unhex availability
def _duck_hexval(expr: str) -> str:
    return f"(strpos('0123456789abcdef', {expr}) - 1)"


_DUCK_BYTE0 = (
    f"(16 * {_duck_hexval('substr(md5(text), 1, 1)')} "
    f"+ {_duck_hexval('substr(md5(text), 2, 1)')})"
)
_DUCK_BYTE1 = (
    f"(16 * {_duck_hexval('substr(md5(text), 3, 1)')} "
    f"+ {_duck_hexval('substr(md5(text), 4, 1)')})"
)

ORACLE_MEDIA_DECODE_FEATURES = f"""
SELECT doc_id AS media_id,
       {_DUCK_MEDIA_TYPE} AS media_type,
       CAST(64 + {_DUCK_BYTE0} AS INT) AS width,
       CAST(64 + {_DUCK_BYTE1} AS INT) AS height,
       CAST({_DUCK_NBYTES} AS BIGINT) AS n_bytes,
       ROUND(CAST(CAST(CAST({_DUCK_BYTE0} AS DOUBLE) / 255.0 AS REAL) AS DOUBLE), 6) AS f0
FROM documents WHERE text IS NOT NULL
ORDER BY media_id
"""


def media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize pass over image blobs (stub kernel), blob output projected to
    md5 + length so the byte stream is oracle-checkable."""
    from ..sources import load_table, spread

    media = make_media_frame(spark, spread(load_table(spark, sf_dir, "documents")))
    out = resize_images(media)
    return out.select(
        "media_id",
        "target_width",
        "target_height",
        F.md5("resized").alias("resized_md5"),
        F.length("resized").cast("long").alias("resized_bytes"),
    )


_RESIZE_SLICE = 224 * 224 // 1024  # 49 bytes

# DuckDB (this build) cannot slice BLOBs, so the oracles slice the VARCHAR
# and hash its UTF-8 bytes. The corpus is pure ASCII (verified at every SF:
# octet_length(encode(text)) == length(text) for all rows), so char slices
# and byte slices coincide exactly.
ORACLE_MEDIA_RESIZE = f"""
SELECT doc_id AS media_id, 224 AS target_width, 224 AS target_height,
       md5(text[1:{_RESIZE_SLICE}]) AS resized_md5,
       CAST(LEAST({_DUCK_NBYTES}, {_RESIZE_SLICE}) AS BIGINT) AS resized_bytes
FROM documents WHERE doc_id % 3 = 0 AND text IS NOT NULL
ORDER BY media_id
"""


def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling over video blobs (1→N fan-out through mapInPandas),
    frames projected to md5 + length for oracle comparison."""
    from ..sources import load_table, spread

    media = make_media_frame(spark, spread(load_table(spark, sf_dir, "documents")))
    frames = frame_sample(media)
    return frames.select(
        "media_id",
        "frame_idx",
        F.md5("frame").alias("frame_md5"),
        F.length("frame").cast("long").alias("frame_bytes"),
    )


ORACLE_MEDIA_FRAME_SAMPLE = f"""
WITH vids AS (
  SELECT doc_id AS media_id, text,
         LEAST(4, GREATEST(1, {_DUCK_NBYTES} // 64)) AS n_frames
  FROM documents WHERE doc_id % 3 = 2 AND text IS NOT NULL
),
idx AS (
  SELECT media_id, text, CAST(unnest(generate_series(0, n_frames - 1)) AS INT) AS frame_idx
  FROM vids
),
frames AS (
  SELECT media_id, frame_idx,
         text[frame_idx * 64 + 1 : (frame_idx + 1) * 64] AS frame
  FROM idx
)
SELECT media_id, frame_idx, md5(frame) AS frame_md5,
       CAST(length(frame) AS BIGINT) AS frame_bytes
FROM frames ORDER BY media_id, frame_idx
"""


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


QUERIES = {
    "media_metadata_stats": media_metadata_stats,
    "media_decode_features": media_decode_features,
    "media_resize": media_resize,
    "media_frame_sample": media_frame_sample,
}

ORACLES = {
    "media_metadata_stats": ORACLE_MEDIA_METADATA_STATS,
    "media_decode_features": ORACLE_MEDIA_DECODE_FEATURES,
    "media_resize": ORACLE_MEDIA_RESIZE,
    "media_frame_sample": ORACLE_MEDIA_FRAME_SAMPLE,
}
