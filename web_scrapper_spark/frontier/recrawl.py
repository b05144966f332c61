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

__all__ = [
    "CHANGEFREQ_HOURS",
    "recrawl_due",
    "host_volatility",
    "volatility_hints",
    "crawl_diff",
]

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

    An optional ``period_hours`` int column on ``hints`` overrides the
    changefreq vocabulary per url — the slot for OBSERVED evidence
    (:func:`volatility_hints`) rather than publisher claims; null
    falls through to changefreq, then ``default_hours``.
    """
    last_fetch = seen.groupBy("url").agg(
        F.max("fetched_epoch").alias("fetched_epoch")
    )
    has_period = "period_hours" in hints.columns
    # duplicate hint rows for a URL collapse deterministically (min
    # struct = lexicographic over fields), not dropDuplicates' arbitrary
    # first-seen — the repo-wide partitioning-independence invariant
    struct_fields = [
        F.lower(F.col("changefreq")).alias("_freq"),
        F.col("lastmod"),
        F.col("priority_ppm"),
    ]
    if has_period:
        struct_fields.append(F.col("period_hours"))
    out_fields = ["url", "_h._freq", "_h.lastmod", "_h.priority_ppm"]
    if has_period:
        out_fields.append("_h.period_hours")
    h = (
        hints.select("url", F.struct(*struct_fields).alias("_h"))
        .groupBy("url")
        .agg(F.min("_h").alias("_h"))
        .select(*out_fields)
    )
    j = last_fetch.join(h, "url", "left")

    freq_map = F.create_map(
        *[x for k, v in CHANGEFREQ_HOURS.items() for x in (F.lit(k), F.lit(v))]
    )
    hours = F.coalesce(freq_map[F.col("_freq")], F.lit(default_hours))
    if has_period:
        hours = F.coalesce(F.col("period_hours"), hours)
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


def host_volatility(
    captures: DataFrame,
    url_col: str = "url",
    ts_col: str = "ts",
    digest_col: str = "digest",
    host_col: str = "host",
) -> DataFrame:
    """Per-host content volatility from the capture log — the
    OBSERVED complement to ``recrawl_due``'s publisher hints: sitemap
    changefreq says what the publisher claims; this measures what the
    crawler actually saw, host by host, and recommends a recrawl
    interval from it (the Cho & Garcia-Molina "estimating frequency of
    change" tier, reduced to exact integer evidence).

    Per host over (url, ts, digest) captures:

    - ``n_captures`` / ``n_urls`` — total fetches, distinct pages;
    - ``revisits`` — captures after a url's first (the only ones that
      can witness change);
    - ``changes`` — revisits whose digest differs from the SAME url's
      previous capture (lag over (url, ts));
    - ``change_ppm`` — floor(1e6 * changes / revisits), -1 when the
      host has no revisits yet (unknown, not "stable");
    - ``mean_change_interval`` — floor(sum of (ts - prev_ts) over
      changed revisits / changes): the evidence-backed recrawl period
      in ts units, -1 when no change was ever observed. Feed it into
      the hint table as a synthetic changefreq: volatile hosts recrawl
      at their observed cadence, static archives fall to the floor.

    All integers; ties impossible while (url, ts) is unique (capture
    logs are). One window keyed on the url (the log's natural key) +
    one host aggregate — the log is shuffled once; no float crosses
    the output, so the DuckDB oracle hash-matches.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(url_col).orderBy(ts_col)
    lagged = captures.select(
        F.col(host_col).alias("host"),
        F.col(url_col).alias("_url"),
        F.col(ts_col).cast("long").alias("_ts"),
        F.col(digest_col).alias("_digest"),
    ).select(
        "host",
        "_url",
        "_ts",
        F.lag("_digest").over(
            Window.partitionBy("_url").orderBy("_ts")
        ).alias("_prev_digest"),
        F.lag("_ts").over(
            Window.partitionBy("_url").orderBy("_ts")
        ).alias("_prev_ts"),
        "_digest",
    )
    flagged = lagged.select(
        "host",
        "_url",
        F.col("_prev_digest").isNotNull().alias("_revisit"),
        (
            F.col("_prev_digest").isNotNull()
            & (F.col("_digest") != F.col("_prev_digest"))
        ).alias("_changed"),
        (F.col("_ts") - F.col("_prev_ts")).alias("_gap"),
    )
    agg = flagged.groupBy("host").agg(
        F.count("*").alias("n_captures"),
        F.countDistinct("_url").alias("n_urls"),
        F.sum(F.col("_revisit").cast("long")).alias("revisits"),
        F.sum(F.col("_changed").cast("long")).alias("changes"),
        F.sum(F.when(F.col("_changed"), F.col("_gap"))).alias("_change_gap"),
    )
    return agg.select(
        "host",
        F.col("n_captures").cast("long").alias("n_captures"),
        F.col("n_urls").cast("long").alias("n_urls"),
        F.col("revisits").cast("long").alias("revisits"),
        F.col("changes").cast("long").alias("changes"),
        F.expr(
            "CASE WHEN revisits > 0 THEN 1000000 * changes DIV revisits "
            "ELSE CAST(-1 AS BIGINT) END"
        ).alias("change_ppm"),
        F.expr(
            "CASE WHEN changes > 0 THEN _change_gap DIV changes "
            "ELSE CAST(-1 AS BIGINT) END"
        ).alias("mean_change_interval"),
    )


def volatility_hints(
    volatility: DataFrame,
    urls: DataFrame,
    ts_unit_hours: int = 1,
    min_hours: int = 1,
    max_hours: int = 8760,
    url_col: str = "url",
    host_col: str = "host",
) -> DataFrame:
    """Observed-evidence hint table for :func:`recrawl_due` — closes
    the Cho & Garcia-Molina adaptive loop: :func:`host_volatility`
    measures each host's change cadence from the capture log, this
    turns it into per-url ``period_hours`` hints, and
    ``CrawlEngine.enqueue_revisits`` schedules refetches at that
    cadence. Publisher claims (sitemap changefreq) and observed
    evidence compose in one hint table: ``period_hours`` overrides the
    vocabulary where evidence exists.

    Per url (from ``urls``: url + host, e.g. the seen set):

    - host observed changing (``mean_change_interval >= 0``) →
      ``period_hours = clamp(mean_change_interval * ts_unit_hours,
      min_hours, max_hours)``;
    - host revisited but NEVER seen changing → ``max_hours`` (back off
      to the floor cadence — evidence of stability IS evidence);
    - host with no revisits yet → no hint row (unknown ≠ stable; the
      caller's ``default_hours`` applies).

    All integer arithmetic; one broadcast-able host join (volatility is
    host-grain, ~3 orders smaller than urls).
    """
    hosts = volatility.select(
        F.col("host").alias("_vh"),
        F.when(
            F.col("mean_change_interval") >= 0,
            F.greatest(
                F.lit(min_hours),
                F.least(
                    F.lit(max_hours),
                    F.col("mean_change_interval") * F.lit(ts_unit_hours),
                ),
            ),
        )
        .when(F.col("revisits") > 0, F.lit(max_hours))
        .cast("int")
        .alias("period_hours"),
    ).filter(F.col("period_hours").isNotNull())
    return (
        urls.select(
            F.col(url_col).alias("url"), F.col(host_col).alias("_vh")
        )
        .distinct()
        .join(F.broadcast(hosts), "_vh")
        .select(
            "url",
            F.lit(None).cast("string").alias("lastmod"),
            F.lit(None).cast("string").alias("changefreq"),
            F.lit(None).cast("int").alias("priority_ppm"),
            "period_hours",
        )
    )


def crawl_diff(
    old: DataFrame,
    new: DataFrame,
    *,
    key_col: str = "url",
    digest_col: str = "digest",
) -> DataFrame:
    """Diff two crawl waves by content digest — the archive-grade
    "what changed since the last crawl" report (the cross-crawl
    complement to ``host_volatility``, which looks within one log, and
    to ``sources.warc`` revisit records, which dedup within a wave).

    One row per URL present in either wave::

      (key, old_digest, new_digest, status)

    ``status`` ∈ added (new wave only), removed (old only), changed
    (both, digests differ), unchanged. Presence is tracked with
    indicator columns, not digest nullability, so waves that recorded
    a null digest (e.g. fetch errors) still classify correctly.

    Scale shape: ONE full-outer sort-merge join on the key — the
    minimal possible data movement for a set diff; both sides shuffle
    exactly once, and if the waves were written with
    ``sources.bucketed`` on the key the exchange disappears entirely.
    Downstream recrawl tiers read the status column: changed hosts
    feed ``host_volatility``'s cadence, removed URLs become frontier
    tombstones, added URLs seed discovery checks.
    """
    o = old.select(
        F.col(key_col).alias("k"),
        F.col(digest_col).alias("old_digest"),
        F.lit(1).alias("_in_old"),
    )
    n = new.select(
        F.col(key_col).alias("k"),
        F.col(digest_col).alias("new_digest"),
        F.lit(1).alias("_in_new"),
    )
    j = o.join(n, "k", "full_outer")
    status = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(
            ~F.col("old_digest").eqNullSafe(F.col("new_digest")),
            F.lit("changed"),
        )
        .otherwise(F.lit("unchanged"))
    )
    return j.select(
        F.col("k").alias(key_col),
        "old_digest",
        "new_digest",
        status.alias("status"),
    )
