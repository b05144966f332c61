"""SparkSession factory with scale-oriented defaults.

Single place where the engine's Spark tuning lives so tests, bench, and
the driver contract all run the same configuration:

- AQE on (runtime coalescing + skew-join splitting — the backstop for
  hot-host skew, SURVEY.md §4.1),
- Arrow on for pandas UDF exchange (the extraction path is Arrow-batched
  mapInPandas; input_hint mandates no per-row Python),
- shuffle partitions sized for the local core count (on a real cluster
  AQE coalesces the 2× over-provisioned shuffle partitions down).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "web_scrapper_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(8, 2 * cpus)
    builder = SparkSession.builder
    # under spark-submit the master comes from the launcher
    # (--master / cluster manager) — only default to local[cpus] when
    # nothing configured it, so the same code path serves both
    from pyspark import SparkConf

    if not SparkConf().contains("spark.master"):
        builder = builder.master(f"local[{cpus}]")
    builder = (
        builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
    )
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    return builder.getOrCreate()
