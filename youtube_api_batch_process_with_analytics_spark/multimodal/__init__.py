from .binary_ops import (  # noqa: F401
    MEDIA_SCHEMA,
    decode_and_featurize,
    frame_sample,
    make_media_frame,
    resize_images,
)
