from . import sinks, xlsx
from .readers import TABLES, normalize_timestamps, parquet_row_count, read_csv, read_jsonl, read_table, read_tables

__all__ = [
    "TABLES",
    "normalize_timestamps",
    "parquet_row_count",
    "read_table",
    "read_tables",
    "read_csv",
    "read_jsonl",
    "sinks",
    "xlsx",
]
