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
from .sqlitedb import read_sqlite, sqlite_path_from_url, write_sqlite
from .warc import (
    cdx_revisits,
    latest_captures,
    read_cdx,
    read_warc,
    read_warc_ranges,
    write_warc,
)

__all__ = [
    "export_data",
    "jdbc_driver_available",
    "latest_captures",
    "query_table",
    "read_any",
    "read_jdbc",
    "read_cdx",
    "cdx_revisits",
    "read_warc",
    "read_warc_ranges",
    "read_sqlite",
    "sqlite_path_from_url",
    "write_any",
    "write_jdbc",
    "write_sqlite",
    "write_warc",
]
