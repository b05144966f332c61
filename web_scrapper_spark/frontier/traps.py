"""Crawl-trap detection over a URL table (frontier hygiene).

Real crawls die in traps, not in honest content: calendar pages that
link forever (``/2024/01/2024/01/…``), session ids and tracking
parameters that mint unbounded distinct URLs for one resource, and
infinitely deep generated paths. The reference engine never needed
this (it crawls a configured site list sequentially); an open-web
frontier at 10^10 URLs cannot survive without it — every trapped URL
costs a politeness slot, a fetch, and a frontier row.

Three standard heuristics (cf. the URL-normalization / spider-trap
sections of Heydon & Najork's *Mercator* paper and Apache Nutch's
``urlfilter-regex`` defaults), all as native Catalyst expressions:

- **depth**: more path segments than any hand-authored site uses;
- **looped path**: the same segment repeating within one path — the
  signature of relative-link expansion and calendar recursion;
- **query explosion**: one (host, path) minting at least ``query_k``
  distinct query strings — session ids, cart tokens, faceted-search
  permutations.

Per-URL columns come from one projection (zero shuffle); the query
explosion needs one aggregate over (host, path) plus a broadcast-able
join back. At 100 TB run the rollup with ``exact=False``
(``approx_count_distinct``, one shuffle, fixed-size HLL sketches per
group instead of a distinct expand) — the trap decision only needs
"roughly how many", the oracle path keeps exact counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["url_trap_signals", "url_shape_profile", "TRAP_REASONS"]

#: precedence order for the single reported reason (a URL can trip
#: several heuristics; the first one wins, ties never ambiguous).
TRAP_REASONS = ("depth", "loop", "query_explosion")


def url_trap_signals(
    urls: DataFrame,
    url_col: str = "url",
    max_depth: int = 8,
    dup_segment_min: int = 2,
    query_k: int = 20,
    exact: bool = True,
) -> DataFrame:
    """Classify every URL with trap signals.

    Returns one row per input row:

      (url, host, depth, dup_segments, path_queries, trap_reason)

    - ``depth``: number of non-empty path segments;
    - ``dup_segments``: segments minus distinct segments (how much of
      the path is repetition);
    - ``path_queries``: distinct query strings seen on this URL's
      (host, path) across the whole input (0 when no URL on the path
      carries a query);
    - ``trap_reason``: first tripped heuristic in :data:`TRAP_REASONS`
      order, NULL for clean URLs.

    ``exact=False`` swaps the distinct-query rollup for
    ``approx_count_distinct`` (±2% HLL) — the scale path; thresholds
    this coarse don't need exact cardinalities.
    """
    u = F.col(url_col)
    segs = F.filter(
        F.split(F.try_parse_url(u, F.lit("PATH")), "/"), lambda s: s != F.lit("")
    )
    # malformed URLs parse to NULL host/path; coalesce to '' so the
    # rollup join can't silently drop them (null keys never equi-join)
    base = urls.select(
        u.alias("url"),
        F.coalesce(F.try_parse_url(u, F.lit("HOST")), F.lit("")).alias("host"),
        F.coalesce(F.try_parse_url(u, F.lit("PATH")), F.lit("")).alias("path"),
        F.try_parse_url(u, F.lit("QUERY")).alias("query"),
        F.coalesce(F.size(segs), F.lit(0)).alias("depth"),
        F.coalesce(
            F.size(segs) - F.size(F.array_distinct(segs)), F.lit(0)
        ).alias("dup_segments"),
    )
    counter = (
        F.count_distinct(F.col("query"))
        if exact
        else F.approx_count_distinct("query")
    )
    rollup = base.groupBy("host", "path").agg(
        counter.cast("long").alias("path_queries")
    )
    out = base.join(rollup, ["host", "path"])
    reason = (
        F.when(F.col("depth") > max_depth, F.lit("depth"))
        .when(F.col("dup_segments") >= dup_segment_min, F.lit("loop"))
        .when(F.col("path_queries") >= query_k, F.lit("query_explosion"))
    )
    return out.select(
        "url", "host", "depth", "dup_segments", "path_queries",
        reason.alias("trap_reason"),
    )


def path_trap_filter(
    df: DataFrame,
    url_col: str = "url",
    max_depth: int = 12,
    dup_segment_min: int = 3,
) -> DataFrame:
    """Zero-shuffle inline trap guard — the subset of
    :func:`url_trap_signals` that is safe to run on every epoch's
    candidate links (depth + looped-segment checks are per-row native
    expressions; the query-explosion heuristic needs a (host, path)
    aggregate and belongs in the offline classification, whose
    verdicts feed back through robots ``disallow_prefixes``).

    Thresholds default LOOSER than the offline classifier's: an inline
    guard that eats legitimate URLs silently is worse than a trap that
    survives one extra epoch.
    """
    segs = F.filter(
        F.split(F.try_parse_url(F.col(url_col), F.lit("PATH")), "/"),
        lambda s: s != F.lit(""),
    )
    depth = F.coalesce(F.size(segs), F.lit(0))
    dups = F.coalesce(
        F.size(segs) - F.size(F.array_distinct(segs)), F.lit(0)
    )
    return df.filter((depth <= max_depth) & (dups < dup_segment_min))


def url_shape_profile(
    urls: DataFrame,
    url_col: str = "url",
    min_count: int = 1,
) -> DataFrame:
    """URL template mining: collapse every path to its SHAPE — digit
    runs → ``N``, long hex runs → ``H``, other segment text → ``s`` —
    and profile each (host, shape) family.

    Crawl-ops reads this to see a site's URL grammar at a glance:
    ``/blog/page/N`` (pagination family), ``/calendar/N/N/N`` (the
    classic infinite-calendar trap before it triggers the depth
    guard), ``/article/s-N`` (content). Complements the per-URL
    signals in :func:`url_trap_signals` — shapes aggregate the
    corpus-wide structure those per-row flags can't show.

      (host, shape, n_urls, example_url)

    ``example_url`` = lexicographic min of the family (deterministic).
    One projection + one map-side-combined aggregate; nothing but
    (host, shape, url) strings cross the exchange.
    """
    # segment-level classification (the standard template-mining
    # grain): an all-digit segment is N, a long-hex segment is H,
    # anything else non-empty is s — one transform over the split
    # path, no cross-segment regex subtleties
    path = F.try_parse_url(F.col(url_col), F.lit("PATH"))
    seg_shape = F.transform(
        F.split(path, "/"),
        lambda seg: F.when(seg == "", F.lit(""))
        .when(seg.rlike("^[0-9]+$"), F.lit("N"))
        .when(seg.rlike("^[0-9a-fA-F]{8,}$"), F.lit("H"))
        .otherwise(F.lit("s")),
    )
    shape = F.array_join(seg_shape, "/")
    return (
        urls.select(
            F.lower(F.try_parse_url(F.col(url_col), F.lit("HOST"))).alias("host"),
            shape.alias("shape"),
            F.col(url_col).alias("_u"),
        )
        .groupBy("host", "shape")
        .agg(
            F.count("*").cast("long").alias("n_urls"),
            F.min("_u").alias("example_url"),
        )
        .filter(F.col("n_urls") >= min_count)
    )


def templated_pages(
    pages: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    min_urls: int = 5,
) -> DataFrame:
    """Soft-404 / templated-page detection: the SAME body served at
    many distinct URLs of one host is an error or placeholder template
    ("page not found" behind HTTP 200, parked-domain landers, login
    walls) — pages a crawler must stop treating as content AND stop
    extracting links from (soft-404 link farms are a classic trap).
    Detection is structural (per-host body repetition), not phrase
    matching — it works in every language and for every template.

    Output: one row per input URL — (url, host, body_fp, n_urls,
    templated) with ``templated`` true iff the host serves the same
    normalized body at >= ``min_urls`` distinct URLs.

    Scale shape: the repetition count is one aggregate at (host,
    body-md5) grain — map-side combined, cardinality = distinct bodies
    per host, far below URL scale; the flag joins back on the same
    key, and AQE broadcasts the group table when it is small. Only
    32-byte hashes cross the shuffles, never bodies.
    """
    host = F.lower(F.try_parse_url(F.col(url_col), F.lit("HOST")))
    fp = F.md5(
        F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    )
    keyed = pages.select(
        F.col(url_col).alias("url"), host.alias("host"), fp.alias("body_fp")
    )
    groups = keyed.groupBy("host", "body_fp").agg(
        F.countDistinct("url").alias("n_urls")
    )
    return keyed.join(groups, ["host", "body_fp"]).select(
        "url",
        "host",
        "body_fp",
        "n_urls",
        (F.col("n_urls") >= min_urls).alias("templated"),
    )
