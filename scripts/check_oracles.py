"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry from ``__spark_entry__.py`` against the
matching ``oracle_sql()`` DuckDB statement at sf0.01 and compares:

- row count
- schema (sorted column names)
- value hash (columns sorted by name, rows sorted, cells stringified)

Queries without an oracle are run and reported rows-only, mirroring the
driver's weaker check.  Usage::

    python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _canon(df) -> tuple[list[str], str]:
    """(sorted column names, value hash) for a pandas frame."""
    cols = sorted(df.columns)
    out = df[cols]
    cells = [
        [("" if v is None else str(v)) for v in row]
        for row in out.itertuples(index=False, name=None)
    ]
    cells.sort()
    h = hashlib.md5()
    for row in cells:
        h.update("\x1f".join(row).encode("utf-8", "replace"))
        h.update(b"\x1e")
    return cols, h.hexdigest()


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as se

    args = list(sys.argv[1:])
    out_path = "/tmp/check_oracles.json"
    if "--out" in args:
        i = args.index("--out")
        out_path = args[i + 1]
        del args[i:i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        # engine sessions pin UTC (session.get_spark); without it,
        # toPandas renders timestamps in the machine's local zone and
        # the value hash spuriously diverges from DuckDB on non-UTC
        # hosts
        .config("spark.sql.session.timeZone", "UTC")
        .appName("check_oracles")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    qs = se.queries()
    oracles = se.oracle_sql()
    results: dict[str, dict] = {}
    n_red = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        row: dict = {
            "rows_match": None,
            "schema_match": None,
            "hash_match": None,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        try:
            sdf = fn(spark, sf_dir).toPandas()
            row["spark_rows"] = len(sdf)
            sql = oracles.get(name)
            if sql is None:
                row["err"] = "no_oracle"
            else:
                odf = con.execute(sql).fetchdf()
                row["oracle_rows"] = len(odf)
                scols, shash = _canon(sdf)
                ocols, ohash = _canon(odf)
                row["rows_match"] = len(sdf) == len(odf)
                row["schema_match"] = scols == ocols
                row["hash_match"] = shash == ohash
                if not row["schema_match"]:
                    row["err"] = f"cols spark={scols} oracle={ocols}"
        except Exception as e:  # pragma: no cover - diagnostic path
            row["err"] = f"{type(e).__name__}: {e}"[:300]
        results[name] = row
        flag = "OK " if row["hash_match"] else ("--- " if row["err"] == "no_oracle" else "RED")
        if row["hash_match"] is False or (row["err"] and row["err"] != "no_oracle"):
            n_red += 1
        print(
            f"{flag:4s} {name:28s} spark={row['spark_rows']} "
            f"oracle={row['oracle_rows']} err={row['err']}"
        )

    summary = {
        "sf_dir": sf_dir,
        "n_queries": len(results),
        "n_red": n_red,
        "n_no_oracle": sum(
            1 for r in results.values() if r["err"] == "no_oracle"
        ),
    }
    with open(out_path, "w") as f:
        json.dump({"summary": summary, "results": results}, f, indent=1)
    print(f"\n{n_red} red rows; full report at {out_path}")
    spark.stop()
    return 1 if n_red else 0


if __name__ == "__main__":
    raise SystemExit(main())
