"""Bucketed tables: pre-shuffled storage for co-located joins.

Every epoch anti-joins candidates against the seen set on ``url`` —
at 10^10 seen rows that shuffle is the single biggest recurring cost
a crawl pays. Spark's answer is BUCKETING: write the table hash-
partitioned into a fixed number of buckets on the join key, and every
later equality join/anti-join against another table bucketed the same
way runs with ZERO exchange on either side — the shuffle was paid
once, at write time, and amortizes over every epoch that reads it.

This module wraps the two-line incantation because it has sharp
edges worth centralizing:

- bucketed tables must go through ``saveAsTable`` (the bucket spec
  lives in the catalog, not the parquet footer); ``option("path", …)``
  keeps the data at an explicit external location instead of the
  session-default warehouse
- both sides must agree on (column, bucket count), and the join must
  not be planned as a broadcast (a broadcast join ignores bucketing —
  right for small sides, defeating the point for big ones)
- bucket count is a LAYOUT decision: pick ≥ the cluster's target
  parallelism at read time (buckets are the max scan parallelism)

Verified in tests/test_bucketed.py: the co-bucketed anti-join's plan
contains no Exchange at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed_table", "read_bucketed_table"]


def write_bucketed_table(
    df: DataFrame,
    name: str,
    path: str,
    bucket_col: str,
    n_buckets: int = 64,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as catalog table ``name`` at external ``path``,
    hash-bucketed (and sorted) on ``bucket_col`` into ``n_buckets``
    files per writing task's partition."""
    if n_buckets <= 0:
        raise ValueError("n_buckets must be positive")
    (
        df.write.bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .option("path", path)
        .mode(mode)
        .saveAsTable(name)
    )


def read_bucketed_table(spark: SparkSession, name: str) -> DataFrame:
    """Read a bucketed table back WITH its bucket spec (a plain
    ``spark.read.parquet`` of the same files would lose it — the spec
    lives in the catalog entry, which is why writes go through
    ``saveAsTable``)."""
    return spark.table(name)
