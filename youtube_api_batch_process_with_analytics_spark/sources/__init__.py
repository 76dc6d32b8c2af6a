from .tables import TABLES, load_table, load_tables, register_views, spread  # noqa: F401
