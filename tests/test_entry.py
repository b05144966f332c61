"""Driver-contract verification: mimics the driver's DuckDB oracle gate
locally — every ``queries()`` entry with an ``oracle_sql()`` twin must
match on row count, column names, and order-insensitive values."""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SF_DIR = os.path.join(TESTDATA, "sf0.001")  # fast tier; sf0.01 nightly
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _norm_cell(v):
    # driver-faithful: the driver hashes pandas string renderings, so a
    # DuckDB HUGEINT arriving as float64 ("3.0") must NOT compare equal
    # to Spark's long ("3") — repr-compare, never numeric-compare.
    if hasattr(v, "item") and not isinstance(v, (str, bytes)):
        try:
            v = v.item()
        except (ValueError, AttributeError):
            pass
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return repr(v)


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


ORACLES = entry_mod.oracle_sql()
QUERIES = entry_mod.queries()


def test_all_oracle_keys_have_queries():
    missing = set(ORACLES) - set(QUERIES)
    assert not missing, f"oracle_sql keys without queries(): {missing}"


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name, spark, duck):
    qdf = QUERIES[name](spark, SF_DIR)
    spark_cols = qdf.columns
    spark_rows = [tuple(r) for r in qdf.collect()]

    res = duck.execute(ORACLES[name])
    duck_cols = [d[0] for d in res.description]
    # fetch through pandas exactly like the driver does, so dtype drift
    # (HUGEINT -> float64) is caught here and not only in the driver gate
    pdf = res.df()
    duck_rows = [tuple(r) for r in pdf.itertuples(index=False, name=None)]

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: rowcount {len(spark_rows)} vs {len(duck_rows)}"
    )
    left = _normalize(spark_rows, spark_cols)
    right = _normalize(duck_rows, duck_cols)
    mismatches = [
        (l, r) for l, r in zip(left, right) if l != r
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"


@pytest.mark.parametrize(
    "name", sorted(set(QUERIES) - set(ORACLES))
)
def test_rows_only_queries_run(name, spark):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
    assert df.columns


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    # flagship invariant: every merged doc article is byte-identical
    merged = [r for r in rows if r["merge_kind"] == "merged"]
    assert merged
    assert all(r["content_byte_identical"] for r in merged)
