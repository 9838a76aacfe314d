from .io import DEFAULT_SF_DIR, TABLES, load_table, register_views, table_path, write_parquet

__all__ = [
    "DEFAULT_SF_DIR",
    "TABLES",
    "load_table",
    "register_views",
    "table_path",
    "write_parquet",
]
