"""Freshness-driven recrawl scheduling (sitemaps.org hints → frontier).

A one-shot crawler visits every URL once; a production crawl re-visits
pages at a rate matched to how often they change. The sitemap protocol
publishes exactly that signal per URL (``changefreq``/``lastmod`` —
parsed by ``frontier.sitemap``), and the seen table records when each
URL was last fetched (``fetched_epoch``, frontier/core.py SEEN_SCHEMA).
This module joins the two into the set of URLs DUE for refetch at a
given epoch.

Determinism contract (the repo-wide rule — no wall clock in any data
path): the crawl's clock is the epoch counter. ``changefreq`` maps to a
period in HOURS via a fixed integer table, converted to epochs with
integer ceiling division, so the schedule is reproducible and
oracle-exact. ``lastmod`` enters only through the optional
``modified_since`` cutoff the caller supplies (e.g. the date of the
previous crawl wave): entries modified on/after it are due regardless
of period — the "publisher says it changed" override.

Scale shape: one broadcast-able hint table joined once into the seen
set (the big side is never shuffled twice — the join key is ``url``,
the output feeds ``with_frontier_columns`` → the normal dequeue). All
arithmetic is native Catalyst expressions; no UDF.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["CHANGEFREQ_HOURS", "recrawl_due"]

#: sitemaps.org changefreq → refetch period in hours. ``always`` means
#: every epoch; ``never`` means only a lastmod change can trigger.
CHANGEFREQ_HOURS = {
    "always": 0,
    "hourly": 1,
    "daily": 24,
    "weekly": 168,
    "monthly": 720,
    "yearly": 8760,
    "never": -1,
}


def recrawl_due(
    seen: DataFrame,
    hints: DataFrame,
    current_epoch: int,
    epoch_hours: int = 24,
    default_hours: int = 168,
    modified_since: Optional[str] = None,
) -> DataFrame:
    """URLs due for refetch at ``current_epoch``.

    ``seen``: (url, fetched_epoch, …) — the crawl's append-only seen
    set (latest fetch per URL wins here).
    ``hints``: sitemap entries (url, lastmod, changefreq, priority_ppm)
    from ``sitemap_candidates``; URLs fetched but absent from any
    sitemap get ``default_hours``.

    Returns (url, fetched_epoch, due_epoch, priority_ppm, reason) with
    reason ∈ {'period', 'modified'} ('modified' wins when both hold).
    ``never`` rows are excluded from the period rule but still honor
    ``modified_since``.
    """
    last_fetch = seen.groupBy("url").agg(
        F.max("fetched_epoch").alias("fetched_epoch")
    )
    # duplicate hint rows for a URL collapse deterministically (min
    # struct = lexicographic over fields), not dropDuplicates' arbitrary
    # first-seen — the repo-wide partitioning-independence invariant
    h = (
        hints.select(
            "url",
            F.struct(
                F.lower(F.col("changefreq")).alias("_freq"),
                "lastmod",
                "priority_ppm",
            ).alias("_h"),
        )
        .groupBy("url")
        .agg(F.min("_h").alias("_h"))
        .select("url", "_h._freq", "_h.lastmod", "_h.priority_ppm")
    )
    j = last_fetch.join(h, "url", "left")

    freq_map = F.create_map(
        *[x for k, v in CHANGEFREQ_HOURS.items() for x in (F.lit(k), F.lit(v))]
    )
    hours = F.coalesce(freq_map[F.col("_freq")], F.lit(default_hours))
    # integer ceil(hours / epoch_hours), floored at 1 epoch; 'always'
    # (0 h) also lands on 1 — a URL is never due in its fetch epoch
    period = F.greatest(
        F.lit(1),
        ((hours + F.lit(epoch_hours) - 1) / F.lit(epoch_hours)).cast("int"),
    )
    due_epoch = F.when(hours >= 0, F.col("fetched_epoch") + period)
    modified = (
        (F.to_date("lastmod") >= F.to_date(F.lit(modified_since)))
        if modified_since is not None
        else F.lit(False)
    )
    period_due = due_epoch.isNotNull() & (due_epoch <= F.lit(current_epoch))
    return (
        j.withColumn("due_epoch", due_epoch)
        .withColumn(
            "reason",
            F.when(modified, F.lit("modified")).when(
                period_due, F.lit("period")
            ),
        )
        .filter(F.col("reason").isNotNull())
        .select("url", "fetched_epoch", "due_epoch", "priority_ppm", "reason")
    )
