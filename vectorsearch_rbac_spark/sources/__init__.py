from .registry import TABLES, load_table, load_tables, register_views, get_spark, literal_df
from .ingest import read_csv, read_jsonl, parse_vector, write_csv, write_jsonl

__all__ = [
    "TABLES",
    "load_table",
    "load_tables",
    "register_views",
    "get_spark",
    "read_csv",
    "read_jsonl",
    "parse_vector",
    "write_csv",
    "write_jsonl",
]
