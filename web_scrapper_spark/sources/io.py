"""Batch IO + the declarative query loader (SURVEY.md §2.1).

Covers the reference's storage handlers Spark-natively:

- S4/S5  CSV source/sink        → spark.read/write.csv
- S6/S7  JSON source/sink       → spark.read/write.json
- S10    database source/sink   → spark.read/write.jdbc behind a
                                  capability probe (jdbc_driver_available);
                                  sqlite urls (the reference's DEFAULT
                                  engine) are served FOR REAL via the
                                  stdlib (sources/sqlitedb.py,
                                  driver-sized like xlsx/RSS); other
                                  engines without a jar fall back to
                                  parquet WITH a loud warning — never
                                  silently
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
- S16    WARC                   → `warc` alias dispatches to
                                  sources/warc.py (Common-Crawl archive
                                  source/sink + CDX index; beyond the
                                  reference's format set).
"""

from __future__ import annotations

import warnings
from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

_FORMAT_ALIASES = {
    "csv": "csv",
    "json": "json",
    "parquet": "parquet",
    "db": "db",
    "database": "db",
    "sqlite": "sqlite",
    "excel": "xlsx",
    "xlsx": "xlsx",
    "xls": "xlsx",
    "warc": "warc",
    "wet": "wet",
    "wat": "wat",
}

#: JDBC driver classes probed (in order) when the caller asks for the
#: ``db`` format without naming a driver — the ones the reference's
#: SQLAlchemy handler resolves from its connection-string scheme
#: (database_handler.py:34-115).
DEFAULT_JDBC_DRIVERS = (
    "org.postgresql.Driver",
    "com.mysql.cj.jdbc.Driver",
    "org.sqlite.JDBC",
)


def jdbc_driver_available(spark: SparkSession, driver: Optional[str] = None) -> Optional[str]:
    """Capability probe (S10): the first JDBC driver class loadable in
    the session's JVM, or None. A cluster ships the jar via
    ``spark.jars``/``--packages``; this sandbox ships no SERVER-backed
    driver, so callers must branch rather than assume. (Embedded
    Apache Derby IS present — pyspark bundles it for the hive
    metastore — which is how the live spark.read/write.jdbc path is
    proven in-repo: ``test_live_jdbc_roundtrip_embedded_derby``. Derby
    is deliberately NOT in DEFAULT_JDBC_DRIVERS: its presence must not
    make a postgres-URL 'db' write skip the loud parquet fallback.)"""
    candidates = (driver,) if driver else DEFAULT_JDBC_DRIVERS
    jvm = spark.sparkContext._jvm
    for cls in candidates:
        try:
            jvm.java.lang.Class.forName(cls)
            return cls
        except Exception:
            continue
    return None


def read_jdbc(
    spark: SparkSession, url: str, table: str, driver: Optional[str] = None, **options
) -> DataFrame:
    """S10 source — ``spark.read.jdbc`` behind the capability probe.
    Declarative: pass a ``(SELECT ...) AS q`` dbtable for pushdown, or
    partitionColumn/lowerBound/upperBound/numPartitions for a
    parallel scan (the scale path — one JDBC cursor per partition)."""
    resolved = jdbc_driver_available(spark, driver)
    if resolved is None:
        raise RuntimeError(
            f"no JDBC driver on the classpath (tried {driver or DEFAULT_JDBC_DRIVERS}); "
            "add the jar via spark.jars / --packages"
        )
    return (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", resolved)
        .options(**options)
        .load()
    )


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    driver: Optional[str] = None,
    **options,
) -> None:
    """S10 sink — ``df.write.jdbc`` behind the capability probe
    (reference database_handler.py:34-115 save path). Each task opens
    its own connection and batch-inserts its partition; coalesce
    upstream if the target DB can't take one connection per task."""
    resolved = jdbc_driver_available(df.sparkSession, driver)
    if resolved is None:
        raise RuntimeError(
            f"no JDBC driver on the classpath (tried {driver or DEFAULT_JDBC_DRIVERS}); "
            "add the jar via spark.jars / --packages"
        )
    (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", resolved)
        .options(**options)
        .mode(mode)
        .save()
    )


def _norm_format(fmt: str) -> str:
    try:
        return _FORMAT_ALIASES[fmt.lower()]
    except KeyError:
        raise ValueError(
            f"unsupported format {fmt!r}: one of {sorted(_FORMAT_ALIASES)}"
        ) from None


def read_any(spark: SparkSession, path: str, fmt: str, **options) -> DataFrame:
    """S4/S6/S8 + parquet. CSV defaults mirror the reference's pandas
    read_csv usage: header row + schema inference.

    ``db`` format: ``path`` is the JDBC url and ``options['table']``
    the table name when a driver is on the classpath; otherwise a loud
    warning and ``path`` is read as parquet (the sandbox fallback)."""
    fmt = _norm_format(fmt)
    if fmt == "warc":
        from .warc import read_warc

        return read_warc(spark, path, **options)
    if fmt == "wet":
        from .warc import read_wet

        return read_wet(spark, path, **options)
    if fmt == "wat":
        from .warc import read_wat

        return read_wat(spark, path, **options)
    if fmt == "xlsx":
        from .excel import read_xlsx

        return read_xlsx(spark, path, sheet_name=options.get("sheet_name"))
    if fmt == "sqlite":
        from .sqlitedb import read_sqlite

        return read_sqlite(
            spark, path, table=options.get("table"),
            query=options.get("query"),
        )
    if fmt == "db":
        if jdbc_driver_available(spark, options.get("driver")) is not None:
            table = options.pop("table")
            return read_jdbc(spark, path, table, **options)
        from .sqlitedb import read_sqlite, sqlite_path_from_url

        sq = sqlite_path_from_url(path)
        if sq is not None:
            # sqlite needs no jar — stdlib serves the url FOR REAL
            # (driver-sized; the reference's own default engine)
            return read_sqlite(
                spark, sq, table=options.get("table"),
                query=options.get("query"),
            )
        warnings.warn(
            "format 'db' requested but no JDBC driver is on the classpath; "
            f"reading {path!r} as PARQUET instead. Ship the driver jar via "
            "spark.jars / --packages for a real database source (sqlite "
            "urls are served natively via the stdlib).",
            stacklevel=2,
        )
        options.pop("table", None)
        fmt = "parquet"
    reader = spark.read
    if fmt == "csv":
        options.setdefault("header", True)
        options.setdefault("inferSchema", True)
    return reader.options(**options).format(fmt).load(path)


def write_any(df: DataFrame, path: str, fmt: str, mode: str = "overwrite", **options) -> None:
    """S5/S7/S9 + parquet sink.

    ``db`` format: ``path`` is the JDBC url and ``options['table']``
    the target table when a driver is on the classpath; otherwise a
    loud warning and a parquet write at ``path`` (the sandbox
    fallback — data is never silently dropped)."""
    fmt = _norm_format(fmt)
    if fmt == "warc":
        from .warc import write_warc

        write_warc(df, path, **options)
        return
    if fmt == "wet":
        from .warc import write_wet

        write_wet(df, path, **options)
        return
    if fmt == "wat":
        from .warc import write_wat

        write_wat(df, path, **options)
        return
    if fmt == "xlsx":
        from .excel import write_xlsx

        write_xlsx(df, path, sheet_name=options.get("sheet_name", "Sheet1"))
        return
    if fmt == "sqlite":
        from .sqlitedb import write_sqlite

        table = options.get("table")
        if not table:
            raise ValueError("format 'sqlite' requires options['table']")
        write_sqlite(
            df, path, table,
            mode=mode if mode in ("overwrite", "append") else "overwrite",
        )
        return
    if fmt == "db":
        if jdbc_driver_available(df.sparkSession, options.get("driver")) is not None:
            table = options.pop("table", None)
            if not table:
                raise ValueError(
                    "format 'db' requires options['table'] (the JDBC "
                    "target table; set scraper.output.table in the "
                    "config) — refusing to guess after the crawl ran"
                )
            write_jdbc(df, path, table, mode=mode, **options)
            return
        from .sqlitedb import sqlite_path_from_url, write_sqlite

        sq = sqlite_path_from_url(path)
        if sq is not None:
            # sqlite needs no jar: the reference's DEFAULT engine is
            # served for real by the stdlib (driver-sized — the
            # reference's own per-job local-file usage).
            # BEHAVIOR CHANGE vs pre-round-3 builds: sqlite urls under
            # format 'db' used to take the loud parquet fallback (a
            # distributed write); they now collect() to the driver and
            # write a real sqlite file. Size accordingly — this sink
            # is for reference-parity result sets, not bulk corpus
            # tables (use parquet/warc for those).
            table = options.get("table")
            if not table:
                raise ValueError(
                    "format 'db' requires options['table'] (set "
                    "scraper.output.table in the config)"
                )
            write_sqlite(
                df, sq, table,
                mode=mode if mode in ("overwrite", "append")
                else "overwrite",
            )
            return
        warnings.warn(
            "format 'db' requested but no JDBC driver is on the classpath; "
            f"writing PARQUET to {path!r} instead. Ship the driver jar via "
            "spark.jars / --packages for a real database sink (sqlite "
            "urls are served natively via the stdlib).",
            stacklevel=2,
        )
        options.pop("table", None)
        fmt = "parquet"
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
    uses the native ``DataFrame.offset`` over the requested sort: the
    planner pushes a LocalLimit(limit+offset) below the final exchange,
    so each partition ships at most limit+offset rows instead of the
    whole table through one WindowExec partition (the pre-4.0
    row_number approach)."""
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
        out = out.orderBy(*sort_cols).offset(offset)
    elif sort_cols:
        out = out.orderBy(*sort_cols)
    if limit is not None:
        out = out.limit(limit)
    if columns:
        out = out.select(*columns)
    return out
