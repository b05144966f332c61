"""robots.txt ingestion (north rule J4: "per-host politeness scheduler
(token-bucket delay + robots cache broadcast)").

The reference never parses robots.txt (its ``delay`` config is declared
but unenforced — SURVEY.md §2.9 T8); this module closes the loop for a
real crawl: ``/robots.txt`` bodies already sitting in the pages table
become the broadcast rules table the dequeue/enqueue filters consume.

Parsing follows the de-facto robots.txt format (a practical subset of
RFC 9309): ``User-agent`` groups, ``Disallow`` path prefixes,
``Crawl-delay``; the ``*`` group applies when no specific group matches
the configured agent. ``Allow`` lines and wildcards inside paths are
ignored (prefix semantics only — matching the engine's
``robots_filter``, frontier/core.py). Empty ``Disallow:`` means
allow-all, per the original spec.
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ROBOTS_SCHEMA = (
    "host string, disallow_prefixes array<string>, "
    "allow_prefixes array<string>, crawl_delay double, "
    "sitemaps array<string>"
)


def parse_robots_txt(
    text: str, agent: str = "*", default_delay: Optional[float] = None
) -> Dict:
    """robots.txt body → {disallow_prefixes, allow_prefixes,
    crawl_delay, sitemaps}.

    Group selection: the longest ``User-agent`` token that is a
    case-insensitive prefix of ``agent`` wins; the ``*`` group is the
    fallback. Consecutive User-agent lines share one group.
    ``Sitemap:`` is a site-wide field (RFC 9309 §2.3 "other records" /
    sitemaps.org cross-submission): collected from anywhere in the
    file regardless of group, order preserved, exact duplicates
    dropped.
    """
    groups: Dict[str, Dict] = {}
    sitemaps: List[str] = []
    current: List[str] = []
    expecting_agents = True
    for raw_line in text.splitlines():
        line = raw_line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "sitemap":
            if value and value not in sitemaps:
                sitemaps.append(value)
            continue
        if field == "user-agent":
            token = value.lower()
            if not expecting_agents:
                current = []
            expecting_agents = True
            group = groups.setdefault(
                token, {"disallow": [], "allow": [], "crawl_delay": None}
            )
            current.append(token)
            continue
        if not current:
            continue
        expecting_agents = False
        if field == "disallow":
            if value:  # empty Disallow: = allow all
                for token in current:
                    groups[token]["disallow"].append(value)
        elif field == "allow":
            # RFC 9309 §2.2.2: Allow competes with Disallow by
            # LONGEST-MATCH precedence (applied in robots_filter)
            if value:
                for token in current:
                    groups[token]["allow"].append(value)
        elif field == "crawl-delay":
            try:
                delay = float(value)
            except ValueError:
                continue
            for token in current:
                groups[token]["crawl_delay"] = delay

    agent_l = agent.lower()
    chosen = None
    if agent_l != "*":
        matches = [
            t for t in groups if t != "*" and agent_l.startswith(t)
        ]
        if matches:
            chosen = groups[max(matches, key=len)]
    if chosen is None:
        chosen = groups.get(
            "*", {"disallow": [], "allow": [], "crawl_delay": None}
        )
    delay = chosen["crawl_delay"]
    return {
        "disallow_prefixes": list(chosen["disallow"]),
        "allow_prefixes": list(chosen.get("allow", [])),
        "crawl_delay": delay if delay is not None else default_delay,
        "sitemaps": sitemaps,
    }


def robots_from_pages(
    pages: DataFrame,
    agent: str = "*",
    default_delay: Optional[float] = None,
    text_col: str = "text",
) -> DataFrame:
    """Build the broadcast robots rules table from ``/robots.txt``
    pages already present in the pages table — an Arrow-batched pass
    over only those rows (the filter prunes the scan to robots URLs
    before any Python runs). Result schema = ROBOTS_SCHEMA, one row
    per host; joinable/broadcastable by ``robots_filter`` and
    ``politeness_budgets`` (frontier/core.py).

    One row per host is an invariant consumers rely on: the broadcast
    join in ``politeness_budgets`` is keyed on host, so a duplicate
    host row would fan out every frontier row for that host (double
    fetches, duplicate seen rows). http+https snapshots of the same
    host are therefore aggregated — disallow prefixes unioned, the
    largest (most polite) crawl delay kept — and only pages whose PATH
    is exactly ``/robots.txt`` qualify, not any URL that merely ends
    with the suffix."""
    robots_pages = pages.filter(
        F.try_parse_url("url", F.lit("PATH")) == "/robots.txt"
    ).select(
        F.lower(F.try_parse_url("url", F.lit("HOST"))).alias("host"),
        F.coalesce(
            F.col(text_col), F.decode(F.col("html"), "utf-8")
        ).alias("body"),
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for host, body in zip(pdf["host"], pdf["body"]):
                parsed = parse_robots_txt(
                    body or "", agent=agent, default_delay=default_delay
                )
                rows.append(
                    {
                        "host": host,
                        "disallow_prefixes": parsed["disallow_prefixes"],
                        "allow_prefixes": parsed["allow_prefixes"],
                        "crawl_delay": parsed["crawl_delay"],
                        "sitemaps": parsed["sitemaps"],
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "host", "disallow_prefixes", "allow_prefixes",
                    "crawl_delay", "sitemaps",
                ],
            )

    parsed = robots_pages.mapInPandas(run, schema=ROBOTS_SCHEMA)
    return parsed.groupBy("host").agg(
        F.array_sort(
            F.array_distinct(F.flatten(F.collect_list("disallow_prefixes")))
        ).alias("disallow_prefixes"),
        F.array_sort(
            F.array_distinct(F.flatten(F.collect_list("allow_prefixes")))
        ).alias("allow_prefixes"),
        F.max("crawl_delay").alias("crawl_delay"),
        F.array_sort(
            F.array_distinct(F.flatten(F.collect_list("sitemaps")))
        ).alias("sitemaps"),
    )


def discover_sitemaps(robots: DataFrame) -> DataFrame:
    """Robots rules table → (host, url) sitemap fetch candidates — the
    discovery loop's first hop (robots → sitemap → urlset entries via
    ``frontier.sitemap.sitemap_candidates``). One explode, no Python."""
    return robots.select(
        "host", F.explode("sitemaps").alias("url")
    ).distinct()


def robots_refresh_due(
    seen: DataFrame,
    hosts: DataFrame,
    current_epoch: int,
    ttl_epochs: int,
    *,
    host_col: str = "host",
    url_col: str = "url",
    epoch_col: str = "fetched_epoch",
) -> DataFrame:
    """Which hosts' robots.txt must be refetched this epoch — the
    cache-lifecycle rule every long-running crawler enforces (RFC 9309
    §2.4 allows caching "up to 24 hours"; Heritrix/Nutch refetch on a
    TTL): a host is due when its latest ``/robots.txt`` capture is
    older than ``ttl_epochs`` — or was never fetched at all (a crawl
    reaching a new host must fetch robots before anything else).

    ``hosts`` is the universe to audit (e.g. the live frontier's
    distinct hosts — host-grain, 3 orders smaller than URLs). Returns
    (host, last_robots_epoch, age_epochs, due) — never-fetched hosts
    carry the ``-1`` sentinel in BOTH columns (the host_volatility
    convention; sentinels, not NULLs, so engines/pandas never disagree
    on null rendering) and are always due.

    One filtered host-grain aggregate over the seen set (only rows
    whose path is exactly ``/robots.txt`` survive the scan filter) +
    one left join against the host universe. Composes with
    ``discover_sitemaps``/``robots_from_pages``: due hosts' fetches
    land in pages, the rules table rebuilds from there.
    """
    if ttl_epochs < 1:
        raise ValueError("ttl_epochs must be >= 1")
    # scheme match is case-insensitive ((?i: ) scoped to the scheme
    # only — RFC 3986 §3.1 schemes are case-insensitive, paths are
    # not): seen rows like HTTP://host/robots.txt must count, or the
    # host is wrongly reported never-fetched/always due
    robots_rows = seen.filter(
        F.col(url_col).rlike(
            r"^(?i:[a-z][a-z0-9+.-]*)://[^/]+/robots\.txt$"
        )
    )
    latest = robots_rows.groupBy(host_col).agg(
        F.max(F.col(epoch_col)).cast("long").alias("last_robots_epoch")
    )
    out = hosts.select(F.col(host_col)).distinct().join(
        latest, host_col, "left"
    )
    age = F.when(
        F.col("last_robots_epoch").isNotNull(),
        F.lit(int(current_epoch)) - F.col("last_robots_epoch"),
    ).otherwise(F.lit(-1))
    return out.select(
        host_col,
        F.coalesce(F.col("last_robots_epoch"), F.lit(-1))
        .cast("long")
        .alias("last_robots_epoch"),
        age.cast("long").alias("age_epochs"),
        (
            F.col("last_robots_epoch").isNull()
            | (age >= F.lit(int(ttl_epochs)))
        ).alias("due"),
    )
