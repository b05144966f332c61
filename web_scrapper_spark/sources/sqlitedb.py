"""stdlib-sqlite database source/sink (S10's in-sandbox real leg).

The reference's database handler is SQLAlchemy with sqlite as the
default engine (``src/webscraper/storage/database_handler.py:34-115``
resolves the engine from the connection-string scheme; its example
configs use ``sqlite:///...``). Spark's own JDBC path needs a driver
jar this runtime doesn't ship — so ``db`` urls pointing at OTHER
engines fall back loudly — but sqlite itself is in the standard
library, so a ``sqlite:///`` url can be served for real:

- :func:`write_sqlite` — driver-sized by design, exactly like the
  xlsx and RSS sinks (``collect()`` then one transactional
  ``executemany``). The reference's own usage is a per-job local
  file, so this matches its scale envelope; a cluster-sized export
  belongs in ``write_jdbc`` with a jar.
- :func:`read_sqlite` — the inverse: one driver-side cursor →
  ``createDataFrame``. Pass ``query=`` for pushdown into sqlite.

Type mapping: integral/boolean → INTEGER, fractional → REAL, binary →
BLOB, everything else (strings, dates, timestamps) → TEXT via str();
arrays/structs/maps are stored as JSON text. Reading back infers from
sqlite's storage classes, so a write→read roundtrip preserves ints,
floats, text, blobs and NULLs (richer Spark types round-trip as their
text forms — documented, driver-sized convenience, not an archival
format).
"""

from __future__ import annotations

import json
import sqlite3
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def sqlite_path_from_url(url: str) -> Optional[str]:
    """File path from a sqlite connection url (``sqlite:///x.db``,
    ``sqlite:/x.db``, ``jdbc:sqlite:x.db``) or None for other engines.
    A bare ``*.db`` / ``*.sqlite`` / ``*.sqlite3`` path also counts —
    the reference's configs pass plain file paths."""
    u = url.strip()
    low = u.lower()
    if low.startswith("jdbc:sqlite:"):
        return u[len("jdbc:sqlite:"):]
    if low.startswith("sqlite:"):
        rest = u[len("sqlite:"):]
        if rest.startswith("////"):  # sqlite:////abs/path -> /abs/path
            return rest[3:]
        if rest.startswith("///"):   # sqlite:///rel/path  -> rel/path
            return rest[3:]
        return rest.lstrip("/") or None
    if low.endswith((".db", ".sqlite", ".sqlite3")):
        return u
    return None


def _sqlite_type(dt: T.DataType) -> str:
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
                       T.BooleanType)):
        return "INTEGER"
    if isinstance(dt, (T.FloatType, T.DoubleType, T.DecimalType)):
        return "REAL"
    if isinstance(dt, T.BinaryType):
        return "BLOB"
    return "TEXT"


def _to_cell(value, dt: T.DataType):
    if value is None:
        return None
    if isinstance(dt, (T.ArrayType, T.MapType, T.StructType)):
        return json.dumps(value.asDict(recursive=True)
                          if hasattr(value, "asDict") else value,
                          default=str, sort_keys=True)
    if isinstance(dt, T.BooleanType):
        return int(value)
    if isinstance(dt, T.BinaryType):
        return sqlite3.Binary(bytes(value))
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return int(value)
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return float(value)
    if isinstance(dt, T.DecimalType):
        return float(value)
    if isinstance(dt, (T.StringType,)):
        return value
    return str(value)


def write_sqlite(
    df: DataFrame, path: str, table: str, mode: str = "overwrite"
) -> int:
    """Driver-sized sqlite sink (see module docstring). ``mode``:
    ``overwrite`` drops and recreates the table, ``append`` adds rows
    (creating the table if absent). One transaction; returns the row
    count written."""
    if not table or not table.replace("_", "").isalnum():
        raise ValueError(f"bad sqlite table name: {table!r}")
    if mode not in ("overwrite", "append"):
        raise ValueError(f"mode must be overwrite|append, got {mode!r}")
    fields = df.schema.fields
    cols = ", ".join(
        f'"{f.name}" {_sqlite_type(f.dataType)}' for f in fields
    )
    rows = [
        tuple(_to_cell(row[f.name], f.dataType) for f in fields)
        for row in df.collect()
    ]
    con = sqlite3.connect(path)
    try:
        with con:
            if mode == "overwrite":
                con.execute(f'DROP TABLE IF EXISTS "{table}"')
            con.execute(f'CREATE TABLE IF NOT EXISTS "{table}" ({cols})')
            con.executemany(
                f'INSERT INTO "{table}" VALUES '
                f'({", ".join("?" for _ in fields)})',
                rows,
            )
    finally:
        con.close()
    return len(rows)


def read_sqlite(
    spark: SparkSession,
    path: str,
    table: Optional[str] = None,
    query: Optional[str] = None,
) -> DataFrame:
    """Driver-sized sqlite source: ``table`` or a pushdown ``query``
    (exactly one). Column types come from sqlite's storage classes
    across ALL returned rows — sqlite columns are dynamically typed,
    so a single column can mix INTEGER and TEXT values. Promotion:
    all-INTEGER→long, INTEGER/REAL mix→double, all-BLOB→binary,
    anything mixed with TEXT (or all NULLs)→string with values
    str()-converted (blobs utf-8-decoded with replacement), so
    createDataFrame never meets a row that violates the schema."""
    if bool(table) == bool(query):
        raise ValueError("pass exactly one of table= or query=")
    if table and not table.replace("_", "").isalnum():
        raise ValueError(f"bad sqlite table name: {table!r}")
    con = sqlite3.connect(path)
    try:
        cur = con.execute(query or f'SELECT * FROM "{table}"')
        names = [d[0] for d in cur.description]
        rows = cur.fetchall()
    finally:
        con.close()

    def col_type(i: int) -> T.DataType:
        # full-column scan, not first-non-null: a dynamically-typed
        # sqlite column mixing storage classes must promote, or rows
        # after the first would violate the inferred schema
        kinds = set()
        for r in rows:
            v = r[i]
            if v is None:
                continue
            if isinstance(v, (bool, int)):
                kinds.add("int")
            elif isinstance(v, float):
                kinds.add("float")
            elif isinstance(v, (bytes, memoryview)):
                kinds.add("blob")
            else:
                kinds.add("text")
        if kinds == {"int"}:
            return T.LongType()
        if kinds and kinds <= {"int", "float"}:
            return T.DoubleType()
        if kinds == {"blob"}:
            return T.BinaryType()
        return T.StringType()

    schema = T.StructType(
        [T.StructField(n, col_type(i), True) for i, n in enumerate(names)]
    )

    def converter(dt: T.DataType):
        if isinstance(dt, T.BinaryType):
            return lambda v: None if v is None else bytes(v)
        if isinstance(dt, T.DoubleType):
            return lambda v: None if v is None else float(v)
        if isinstance(dt, T.LongType):
            return lambda v: None if v is None else int(v)

        def to_str(v):
            if v is None:
                return None
            if isinstance(v, (bytes, memoryview)):
                return bytes(v).decode("utf-8", "replace")
            return str(v)

        return to_str

    conv = [converter(schema[i].dataType) for i in range(len(names))]
    data = [
        tuple(conv[i](r[i]) for i in range(len(names))) for r in rows
    ]
    return spark.createDataFrame(data, schema)


__all__ = ["read_sqlite", "write_sqlite", "sqlite_path_from_url"]
