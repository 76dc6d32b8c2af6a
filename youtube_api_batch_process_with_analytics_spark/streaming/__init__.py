from .quota import quota_usage_stream, watermarked_level_counts  # noqa: F401
from .sessions import user_sessions_stream  # noqa: F401
from .state import (  # noqa: F401
    quota_latch_stream,
    rate_limit_pacer_stream,
    ttl_cache_stream,
)
