"""Adaptive per-host politeness: crawl delay from observed behavior.

Static politeness (robots ``Crawl-delay`` or a global default — see
frontier/core.py ``politeness_budgets``) treats a 20 ms static host
and a 5 s overloaded origin identically. Real crawlers adapt: the
classic operating rule is *delay ≥ k × observed response time* (take
at most 1/k of the origin's capacity), with multiplicative backoff
when a host starts erroring — AIMD, the same control loop TCP uses.
The reference engine has a fixed per-job ``delay`` knob only
(``config/examples/ecommerce.yaml`` ``delay: 2``); this module is the
distributed, feedback-driven version of that knob.

Everything is INTEGER arithmetic (milliseconds, parts-per-million,
power-of-two-free rational EWMA) so results are bit-exact under any
partitioning and reproducible by a plain SQL oracle:

- per (host, epoch): ``mean_ms = floor(sum latency / n)`` and
  ``err_ppm = floor(1e6 · errors / n)``
- across epochs in order: ``ewma ← floor((ewma·(d−a) + mean·a) / d)``
  seeded with the first epoch's mean (alpha = a/d)
- ``delay_ms = clamp(ewma · latency_factor · backoff, min, max)``
  where ``backoff = backoff_mult`` iff the LATEST epoch's error rate
  is at or above ``err_backoff_ppm``, else 1.

Scale shape: one partial-aggregated shuffle to (host, epoch), one to
host; the per-host epoch sequence is bounded by the crawl's epoch
count (thousands at most — a ~KB array per host), folded with a
native higher-order ``aggregate`` — zero Python, zero window over the
raw observation stream, no shuffle keyed on anything wider than the
host string.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["adaptive_delays", "merge_adaptive_delays"]


def adaptive_delays(
    obs: DataFrame,
    *,
    alpha_num: int = 1,
    alpha_den: int = 4,
    latency_factor: int = 10,
    err_backoff_ppm: int = 200_000,
    backoff_mult: int = 4,
    min_delay_ms: int = 100,
    max_delay_ms: int = 30_000,
    host_col: str = "host",
    epoch_col: str = "epoch",
    latency_col: str = "latency_ms",
    err_col: str = "is_err",
) -> DataFrame:
    """Per-host politeness recommendation from fetch observations.

    ``obs`` rows are individual fetches: ``(host, epoch, latency_ms,
    is_err)`` — epoch is any monotone integer time bucket (crawl
    epoch, day index, …), ``is_err`` boolean/0-1.

    Returns one row per host::

      (host, n_epochs, ewma_latency_ms, last_err_ppm, delay_ms)

    ``delay_ms`` is the recommended inter-request gap for the NEXT
    epoch; feed it through :func:`merge_adaptive_delays` to combine
    with robots rules (robots always wins when more polite).
    """
    if not 0 < alpha_num <= alpha_den:
        raise ValueError("alpha must be a rational in (0, 1]")
    keep = alpha_den - alpha_num

    per = (
        obs.groupBy(host_col, epoch_col)
        .agg(
            F.count("*").alias("_n"),
            F.sum(F.col(latency_col).cast("long")).alias("_lat_sum"),
            F.sum(F.col(err_col).cast("int").cast("long")).alias("_n_err"),
        )
        .select(
            F.col(host_col).alias("host"),
            F.col(epoch_col).cast("long").alias("_ep"),
            F.floor(F.col("_lat_sum") / F.col("_n")).cast("long").alias("_mean_ms"),
            F.floor(F.col("_n_err") * 1_000_000 / F.col("_n"))
            .cast("long")
            .alias("_err_ppm"),
        )
    )

    # array_sort on a struct array orders by the FIRST field — _ep —
    # which is unique within a host after the aggregate above, so the
    # fold order is total and deterministic.
    agg = per.groupBy("host").agg(
        F.array_sort(
            F.collect_list(F.struct("_ep", "_mean_ms", "_err_ppm"))
        ).alias("_seq")
    )

    def _fold(acc: Column, x: Column) -> Column:
        return F.floor(
            (acc * F.lit(keep) + x["_mean_ms"] * F.lit(alpha_num))
            / F.lit(alpha_den)
        ).cast("long")

    ewma = F.aggregate(
        F.slice(F.col("_seq"), F.lit(2), F.greatest(F.size("_seq") - 1, F.lit(0))),
        F.element_at(F.col("_seq"), 1)["_mean_ms"].cast("long"),
        _fold,
    )
    last_err = F.element_at(F.col("_seq"), F.size("_seq"))["_err_ppm"]
    base = ewma * F.lit(latency_factor)
    backed = F.when(
        last_err >= F.lit(err_backoff_ppm), base * F.lit(backoff_mult)
    ).otherwise(base)
    delay = F.least(
        F.greatest(backed, F.lit(min_delay_ms)), F.lit(max_delay_ms)
    )
    return agg.select(
        "host",
        F.size("_seq").cast("long").alias("n_epochs"),
        ewma.alias("ewma_latency_ms"),
        last_err.cast("long").alias("last_err_ppm"),
        delay.cast("long").alias("delay_ms"),
    )


def merge_adaptive_delays(
    robots: Optional[DataFrame],
    delays: DataFrame,
    *,
    delay_ms_col: str = "delay_ms",
) -> DataFrame:
    """Fold adaptive recommendations into a robots-rules table.

    Output is robots-shaped — ``(host, disallow_prefixes,
    crawl_delay)`` — and drops straight into ``politeness_budgets`` /
    ``dequeue_ranked``. Per host the effective delay is
    ``greatest(robots crawl_delay, adaptive delay)``: adaptive
    feedback may only make the crawler MORE polite than the published
    rules, never less (robots is a floor, not a suggestion). Hosts
    present on one side only keep their one-sided delay; disallow
    prefixes pass through untouched.
    """
    d = delays.select(
        "host", (F.col(delay_ms_col) / 1000.0).alias("_adaptive_s")
    )
    if robots is None:
        return d.select(
            "host",
            F.lit(None).cast("array<string>").alias("disallow_prefixes"),
            F.col("_adaptive_s").alias("crawl_delay"),
        )
    return (
        robots.join(d, "host", "full_outer")
        .select(
            "host",
            "disallow_prefixes",
            F.greatest(
                F.coalesce(F.col("crawl_delay"), F.col("_adaptive_s")),
                F.coalesce(F.col("_adaptive_s"), F.col("crawl_delay")),
            ).alias("crawl_delay"),
        )
    )


def latency_quantiles(
    obs: DataFrame,
    bucket_ms: int = 50,
    quantiles_ppm: tuple[int, ...] = (500_000, 950_000, 990_000),
    host_col: str = "host",
    latency_col: str = "latency_ms",
) -> DataFrame:
    """Per-host latency percentiles from a mergeable integer histogram —
    the fetch-ops telemetry behind ``adaptive_delays``' EWMA: the EWMA
    smooths the center, the p95/p99 tail is what says a host is
    degrading before the error backoff fires.

    Exact-by-construction, never a float interpolation: observations
    bucket by ``latency_ms DIV bucket_ms``; the q-quantile is the
    UPPER EDGE of the smallest bucket whose cumulative count reaches
    ``k = ceil(q_ppm * n / 1e6)`` (the type-1/inverse-CDF quantile at
    bucket resolution). Every step is BIGINT, so any partitioning and
    the DuckDB oracle agree bit-for-bit.

    Scale shape: ONE map-side-combined (host, bucket) count is the only
    pass over the observation stream; the cumulative window runs on the
    histogram (hosts x occupied buckets — aggregate-sized), never on
    raw observations. The histogram itself is the mergeable cross-epoch
    state: counts SUM across epochs (persist (host, bucket, n) and add
    deltas — same fix-class as the sketch tables).

    Returns one row per host: ``host, n_obs, q<ppm>_ms...`` (e.g.
    ``q500000_ms`` = p50 upper edge).
    """
    if bucket_ms <= 0:
        raise ValueError("bucket_ms must be positive")
    if not quantiles_ppm or any(
        not 0 < q <= 1_000_000 for q in quantiles_ppm
    ):
        raise ValueError("quantiles_ppm must be in (0, 1e6]")
    hist = (
        obs.select(
            F.col(host_col).alias("host"),
            F.expr(f"CAST({latency_col} AS BIGINT) DIV {bucket_ms}").alias(
                "bucket"
            ),
        )
        .groupBy("host", "bucket")
        .agg(F.count("*").alias("n"))
    )
    w_cum = (
        Window.partitionBy("host")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = hist.withColumn("cum", F.sum("n").over(w_cum)).withColumn(
        "total", F.sum("n").over(Window.partitionBy("host"))
    )
    aggs = [F.max("total").alias("n_obs")]
    for q in quantiles_ppm:
        # k = ceil(q * n / 1e6); quantile = min bucket with cum >= k
        aggs.append(
            F.min(
                F.when(
                    F.col("cum")
                    >= F.expr(f"(total * {q} + 999999) DIV 1000000"),
                    (F.col("bucket") + 1) * bucket_ms,
                )
            ).alias(f"q{q}_ms")
        )
    return cum.groupBy("host").agg(*aggs)


def metric_anomalies(
    df: DataFrame,
    value_col: str,
    order_col: str,
    group_cols: tuple = (),
    k_ppm: int = 5_000_000,
) -> DataFrame:
    """Robust anomaly flags over a metric series — the crawl-ops read
    of the per-epoch lineage tables (`a4_run_report`'s metrics, fetch
    counts, latency medians): flag every observation whose deviation
    from the series MEDIAN exceeds ``k_ppm``·MAD (median absolute
    deviation) — the robust z-score, immune to the very outliers it
    hunts, unlike mean/stddev (one crashed epoch drags a mean; it
    cannot drag a median).

    Exact integer end-to-end (the latency_quantiles discipline):
    medians are type-1 lower medians (the ceil(n/2)-th smallest under
    the deterministic (value, order_col) order — a value FROM the
    series, never an interpolated float), MAD is the same median over
    |v − med|, and the flag is the cross-multiplied integer test
    ``|v − med| · 1e6 > k_ppm · MAD`` — no division, no floats, so
    the DuckDB twin replays it bit-exactly. MAD = 0 (a constant
    series) flags ANY deviation — the right semantics for "this
    counter never moves".

    Returns every input row + (med, mad, dev, anomaly). Three window
    passes per group over the series — metrics tables are epoch-grain
    (thousands of rows per group at most), so group-partitioned
    windows are the honest plan; nothing corpus-scale enters.
    """
    gcols = list(group_cols)
    part = [F.col(c) for c in gcols] if gcols else [F.lit(1)]
    v = F.col(value_col).cast("long")

    def _median_over(frame: DataFrame, col: Column, out: str) -> DataFrame:
        w_rank = Window.partitionBy(*part).orderBy(
            col.asc(), F.col(order_col).asc()
        )
        w_all = Window.partitionBy(*part)
        ranked = frame.withColumn("_mrn", F.row_number().over(w_rank))
        ranked = ranked.withColumn("_mn", F.count("*").over(w_all))
        med = F.max(
            F.when(
                F.col("_mrn") <= F.ceil(F.col("_mn") / 2).cast("int"),
                col,
            )
        ).over(w_all)
        return ranked.withColumn(out, med).drop("_mrn", "_mn")

    staged = _median_over(df, v, "med")
    staged = staged.withColumn("dev", F.abs(v - F.col("med")))
    staged = _median_over(staged, F.col("dev"), "mad")
    return staged.withColumn(
        "anomaly",
        F.col("dev") * F.lit(1_000_000) > F.lit(int(k_ppm)) * F.col("mad"),
    )
