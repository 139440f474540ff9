from .readers import TABLES, read_table, read_tables

__all__ = ["TABLES", "read_table", "read_tables"]
