"""Batch sources/sinks + declarative loader (SURVEY.md §2.1)."""

from .io import (
    export_data,
    jdbc_driver_available,
    query_table,
    read_any,
    read_jdbc,
    write_any,
    write_jdbc,
)

__all__ = [
    "export_data",
    "jdbc_driver_available",
    "query_table",
    "read_any",
    "read_jdbc",
    "write_any",
    "write_jdbc",
]
