"""Batch sources/sinks + declarative loader (SURVEY.md §2.1)."""

from .io import export_data, query_table, read_any, write_any

__all__ = ["export_data", "query_table", "read_any", "write_any"]
