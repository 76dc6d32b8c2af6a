from .ratios import floor_div, pct_of, safe_rate  # noqa: F401
from .text import (  # noqa: F401
    beautify_topic_categories,
    classify_video_type,
    extract_email,
    extract_video_id,
    iso8601_duration_seconds,
    normalize_handle,
    token_count,
)
from .language import language_name_fallback  # noqa: F401
