from .registry import TABLES, load_table, load_tables, register_views, get_spark

__all__ = ["TABLES", "load_table", "load_tables", "register_views", "get_spark"]
