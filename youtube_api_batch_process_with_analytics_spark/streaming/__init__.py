from .quota import quota_usage_stream, watermarked_level_counts  # noqa: F401
