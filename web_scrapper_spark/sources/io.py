"""Batch IO + the declarative query loader (SURVEY.md §2.1).

Covers the reference's storage handlers Spark-natively:

- S4/S5  CSV source/sink        → spark.read/write.csv
- S6/S7  JSON source/sink       → spark.read/write.json
- S10    table sink             → parquet/SnapshotStore (JDBC on a real
                                  cluster — no driver jar here)
- S11    query-pushdown loader  → select/where/orderBy/limit + OFFSET
                                  via a row_number window (the
                                  reference's only declarative surface,
                                  database_handler.py:117-208)
- S13    format-conversion ETL  → read_any → write_any one-liner
- S8/S9  Excel                  → stdlib xlsx reader/writer
                                  (sources/excel.py; openpyxl absent
                                  from this runtime). Driver-sized by
                                  nature — matches the reference's
                                  per-job local-file usage.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

_FORMAT_ALIASES = {
    "csv": "csv",
    "json": "json",
    "parquet": "parquet",
    "db": "parquet",
    "database": "parquet",
    "excel": "xlsx",
    "xlsx": "xlsx",
    "xls": "xlsx",
}


def _norm_format(fmt: str) -> str:
    try:
        return _FORMAT_ALIASES[fmt.lower()]
    except KeyError:
        raise ValueError(
            f"unsupported format {fmt!r}: one of {sorted(_FORMAT_ALIASES)}"
        ) from None


def read_any(spark: SparkSession, path: str, fmt: str, **options) -> DataFrame:
    """S4/S6/S8 + parquet. CSV defaults mirror the reference's pandas
    read_csv usage: header row + schema inference."""
    fmt = _norm_format(fmt)
    if fmt == "xlsx":
        from .excel import read_xlsx

        return read_xlsx(spark, path, sheet_name=options.get("sheet_name"))
    reader = spark.read
    if fmt == "csv":
        options.setdefault("header", True)
        options.setdefault("inferSchema", True)
    return reader.options(**options).format(fmt).load(path)


def write_any(df: DataFrame, path: str, fmt: str, mode: str = "overwrite", **options) -> None:
    """S5/S7/S9 + parquet sink."""
    fmt = _norm_format(fmt)
    if fmt == "xlsx":
        from .excel import write_xlsx

        write_xlsx(df, path, sheet_name=options.get("sheet_name", "Sheet1"))
        return
    writer = df.write.mode(mode)
    if fmt == "csv":
        options.setdefault("header", True)
    writer.options(**options).format(fmt).save(path)


def export_data(
    spark: SparkSession, in_path: str, in_fmt: str, out_path: str, out_fmt: str
) -> int:
    """S13: load any format → save any format (cli/main.py:275-334).
    Returns the row count moved."""
    df = read_any(spark, in_path, in_fmt)
    write_any(df, out_path, out_fmt)
    return df.count()


def query_table(
    df: DataFrame,
    columns: Optional[List[str]] = None,
    where: Optional[str] = None,
    order_by: Optional[str] = None,
    limit: Optional[int] = None,
    offset: Optional[int] = None,
) -> DataFrame:
    """S11 — the reference's SELECT-builder semantics
    (database_handler.py:176-194) as a declarative DataFrame pipeline.
    ``order_by`` accepts "col [ASC|DESC], col2 ..." SQL syntax. OFFSET
    is a row_number filter over the requested order (Spark has no
    native OFFSET pushdown pre-4.0 semantics here; the window keeps it
    deterministic)."""
    out = df
    if where:
        out = out.filter(where)
    sort_cols = []
    if order_by:
        for part in order_by.split(","):
            bits = part.strip().split()
            col = F.col(bits[0])
            if len(bits) > 1 and bits[1].upper() == "DESC":
                col = col.desc()
            sort_cols.append(col)
    if columns:
        keep = list(columns)
        order_refs = [p.strip().split()[0] for p in order_by.split(",")] if order_by else []
        extra = [c for c in order_refs if c not in keep]
        out = out.select(*(keep + extra))
    if offset:
        if not sort_cols:
            raise ValueError("offset requires order_by for deterministic results")
        win = Window.orderBy(*sort_cols)
        out = (
            out.withColumn("_rn", F.row_number().over(win))
            .filter(F.col("_rn") > offset)
            .drop("_rn")
        )
    if sort_cols:
        out = out.orderBy(*sort_cols)
    if limit is not None:
        out = out.limit(limit)
    if columns:
        out = out.select(*columns)
    return out
