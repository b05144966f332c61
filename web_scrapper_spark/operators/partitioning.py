"""Parallelism guard for compute-heavy operators.

Small parquet inputs (one file, one row group — exactly what the sf0.01
/ sf0.1 test tables are) arrive as a SINGLE scan partition, so every
expression-heavy operator downstream (tokenize → shingle → md5 minhash,
Arrow extraction, cosine folds) runs on one core of the 32 available.
A single row group cannot be split by ``spark.sql.files.maxPartitionBytes``
— byte-range splits that don't contain the row-group midpoint read zero
rows — so the only remedy is an explicit round-robin repartition.

``fan_out`` applies that repartition ONLY when the input has fewer
partitions than the session's default parallelism. At production scale
(thousands of files / row groups per table) the input already has more
partitions than cores and the helper is an exact no-op — no shuffle is
added to the 100 TB plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition ``df`` round-robin up to the session's default
    parallelism iff its current plan yields fewer partitions.

    Used at the entry of CPU-bound operators (shingling, SimHash,
    fixture page rendering, embedding math) where per-row compute
    dominates and a one-partition scan would serialize the whole stage.
    """
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    try:
        current = df.rdd.getNumPartitions()
    except Exception:
        return df
    if current >= target:
        return df
    return df.repartition(target)
