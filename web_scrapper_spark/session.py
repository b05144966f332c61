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


def _launcher_sets_master() -> bool:
    """True iff spark-submit / a cluster launcher provided the master.

    Evaluated ONCE at import: ``SparkConf()`` reads the JVM's system
    properties, and once any session has started in this process those
    properties contain the FIRST session's ``spark.master`` — so a
    per-call check would silently pin every later ``local[N]`` session
    to the first N (this exact bug made an in-process scaling sweep
    run all its parallelism levels at local[2]). At import time, before
    any session exists, the property is only present when the launcher
    set it.
    """
    from pyspark import SparkConf

    # Under spark-submit the py4j gateway env vars are exported to the
    # python process BEFORE user code runs, while SparkConf() at import
    # time is still a local (empty) dict — the JVM properties only
    # become readable after SparkContext._ensure_initialized. The env
    # check is therefore the reliable launcher signal; the SparkConf
    # probe still covers an embedding that pre-built the gateway.
    if "PYSPARK_GATEWAY_PORT" in os.environ:
        return True
    try:
        return SparkConf().contains("spark.master")
    except Exception:
        return False


_MASTER_FROM_LAUNCHER = _launcher_sets_master()


def get_spark(
    app_name: str = "web_scrapper_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if cpus <= 0:
        # 0 = "all cores" (the CLI's documented --cpus default);
        # local[0] is rejected by Spark outright
        cpus = os.cpu_count() or 8
    if shuffle_partitions is None:
        shuffle_partitions = max(8, 2 * cpus)
    builder = SparkSession.builder
    # under spark-submit the master comes from the launcher
    # (--master / cluster manager) — only default to local[cpus] when
    # nothing configured it, so the same code path serves both.
    # The launcher check is latched at import (see _launcher_sets_master)
    if not _MASTER_FROM_LAUNCHER:
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
        # heap scales with parallelism: at 32 local threads an 8g heap
        # GC-thrashes under multi-million-row shuffles (measured ~5%
        # throughput loss vs 24g at local[32]; neutral at local[8]) —
        # on a real cluster this is per-executor memory, set by the
        # launcher
        .config(
            "spark.driver.memory",
            os.environ.get(
                "SPARK_GRAFT_DRIVER_MEM", "24g" if cpus >= 16 else "8g"
            ),
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
    )
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    return builder.getOrCreate()
