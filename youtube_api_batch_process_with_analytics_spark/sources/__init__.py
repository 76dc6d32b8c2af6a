from .tables import (  # noqa: F401
    TABLES,
    load_table,
    load_tables,
    register_views,
    spread,
    spread_shuffled,
)
