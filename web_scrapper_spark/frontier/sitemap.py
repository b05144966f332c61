"""Sitemap ingestion (sitemaps.org protocol) — frontier discovery from
``sitemap.xml`` documents.

The reference engine discovers URLs only by walking listing pages
(pagination heuristics, content.py:179-223); real crawls additionally
seed from the sitemap protocol: ``<urlset>`` leaves carrying per-URL
``lastmod``/``changefreq``/``priority`` hints and ``<sitemapindex>``
nodes pointing at child sitemaps. This module parses both forms with
stdlib ``xml.etree`` (namespace-tolerant, gzip-transparent) and exposes
the Spark surface that turns sitemap pages already fetched into the
pages table into frontier candidates.

Scale shape: sitemap pages are a vanishing fraction of a crawl
(one-per-host-ish), so ``sitemap_candidates`` filters the pages scan
down to path == /sitemap.xml rows FIRST (predicate-pushed), parses that
small set in one Arrow ``mapInPandas`` stage, and emits candidate rows
whose ``priority`` column slots into the dequeue's existing
priority-desc ordering — sitemap-prioritized URLs are fetched earlier
within their host's politeness window.
"""

from __future__ import annotations

import gzip
import os
import xml.etree.ElementTree as ET
import zlib
from typing import Iterator, List, Optional

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["parse_sitemap_xml", "sitemap_candidates", "sitemap_hints", "build_sitemap_xml", "write_sitemap", "SITEMAP_ENTRY_SCHEMA"]

#: Rows emitted per <url>/<sitemap> entry. kind: 'url' (urlset leaf) or
#: 'sitemap' (sitemapindex child — enqueue for fetching, not a page).
SITEMAP_ENTRY_SCHEMA = (
    "src_url string, url string, kind string, lastmod string, "
    "changefreq string, priority_ppm int, item_pos int"
)

_CHANGEFREQS = {
    "always", "hourly", "daily", "weekly", "monthly", "yearly", "never",
}


def _localname(tag: str) -> str:
    return tag.rsplit("}", 1)[-1].lower()


def _text(el) -> str:
    return (el.text or "").strip()


def parse_sitemap_xml(data: bytes, src_url: str = "") -> List[dict]:
    """Parse one sitemap document (urlset or sitemapindex; gzip
    transparent) into entry dicts. Malformed XML yields []; malformed
    single entries (no <loc>) are skipped — a crawl never fails on a
    bad sitemap. priority is scaled to integer ppm (0.5 → 500000) so it
    crosses engines without float formatting drift."""
    if data[:2] == b"\x1f\x8b":
        try:
            data = gzip.decompress(data)
        except (OSError, EOFError, zlib.error):
            # BadGzipFile, truncated member, corrupt deflate stream —
            # connection-cut artifacts a crawl skips, never dies on
            return []
    try:
        root = ET.fromstring(data)
    except ET.ParseError:
        return []
    root_kind = _localname(root.tag)
    if root_kind not in ("urlset", "sitemapindex"):
        return []
    kind = "url" if root_kind == "urlset" else "sitemap"
    out: List[dict] = []
    for child in root:
        if _localname(child.tag) not in ("url", "sitemap"):
            continue
        loc: Optional[str] = None
        lastmod = changefreq = None
        priority_ppm = None
        for field in child:
            name = _localname(field.tag)
            if name == "loc":
                loc = _text(field)
            elif name == "lastmod":
                lastmod = _text(field) or None
            elif name == "changefreq":
                v = _text(field).lower()
                changefreq = v if v in _CHANGEFREQS else None
            elif name == "priority":
                try:
                    p = float(_text(field))
                except ValueError:
                    continue
                if 0.0 <= p <= 1.0:
                    priority_ppm = int(round(p * 1_000_000))
        if not loc:
            continue
        out.append(
            {
                "src_url": src_url,
                "url": loc,
                "kind": kind,
                "lastmod": lastmod,
                "changefreq": changefreq,
                "priority_ppm": priority_ppm,
                "item_pos": len(out),
            }
        )
    return out


def sitemap_candidates(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    path_suffixes: tuple = ("/sitemap.xml", "/sitemap.xml.gz"),
    sitemap_urls: Optional[DataFrame] = None,
) -> DataFrame:
    """Sitemap pages already fetched into the pages table → one row per
    sitemap entry (SITEMAP_ENTRY_SCHEMA).

    The pages scan is pruned to (url, html) and filtered to sitemap
    paths BEFORE the parse stage, so the Arrow UDF sees only the
    handful of sitemap documents, never the corpus. ``kind='url'`` rows
    are frontier candidates (join their priority_ppm into
    with_frontier_columns upstream of dequeue); ``kind='sitemap'`` rows
    are child sitemaps to enqueue for fetching — index recursion is an
    epoch-over-epoch loop, the same way discovered links are.

    ``sitemap_urls`` (optional): a (url) DataFrame of sitemaps declared
    at non-default paths — ``discover_sitemaps`` output from robots
    ``Sitemap:`` lines, or child-sitemap rows from a previous pass. It
    is broadcast-semi-joined into the filter (one row per sitemap per
    site — always tiny next to the pages table)."""
    from pyspark.sql.functions import broadcast

    path = F.try_parse_url(F.col(url_col), F.lit("PATH"))
    src = pages.select(
        F.col(url_col).alias("src_url"), F.col(html_col).alias("_blob")
    ).filter(path.isin(*path_suffixes) if path_suffixes else F.lit(False))
    if sitemap_urls is not None:
        extra = pages.select(
            F.col(url_col).alias("src_url"), F.col(html_col).alias("_blob")
        ).join(
            broadcast(sitemap_urls.select(F.col("url").alias("src_url"))),
            "src_url",
            "left_semi",
        )
        src = src.unionByName(extra).dropDuplicates(["src_url"])

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "src_url", "url", "kind", "lastmod", "changefreq",
            "priority_ppm", "item_pos",
        ]
        for pdf in batches:
            out: List[dict] = []
            for src_url, blob in zip(pdf["src_url"], pdf["_blob"]):
                raw = (
                    bytes(blob)
                    if isinstance(blob, (bytes, bytearray, memoryview))
                    else str(blob).encode("utf-8", "replace")
                )
                out.extend(parse_sitemap_xml(raw, src_url=str(src_url)))
            yield pd.DataFrame(out, columns=cols)

    return src.mapInPandas(parse, schema=SITEMAP_ENTRY_SCHEMA)


def sitemap_hints(pages):
    """The recrawl hint table derived from in-corpus sitemaps: the
    ``kind='url'`` entries of :func:`sitemap_candidates` projected to
    the columns :func:`frontier.recrawl.recrawl_due` consumes — the
    single definition shared by the CLI ``revisit`` command and the
    scheduler's config-driven revisit path."""
    from pyspark.sql import functions as F

    return (
        sitemap_candidates(pages)
        .filter(F.col("kind") == "url")
        .select("url", "lastmod", "changefreq", "priority_ppm")
    )


def sitemap_coverage(
    entries: DataFrame, seen: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Per-host audit of sitemap-declared URLs against the crawl's
    seen set — the two operational questions a sitemap-driven crawl
    tracks: how much of what the publisher declared have we fetched
    (coverage), and how much of what we fetched the publisher never
    declared (discovery surplus — often calendar/filter pages worth a
    trap check). Returns

      (host, n_declared, n_declared_crawled, n_crawled_undeclared,
       coverage_ppm)

    with ``coverage_ppm`` an exact integer floor division (0 for hosts
    that declared nothing). One full-outer join on url + one host
    aggregate — both sides deduplicated first so multi-sitemap
    declarations and refetches count once.
    """
    d = entries.select(F.col(url_col).alias("url")).distinct().withColumn(
        "_d", F.lit(1)
    )
    s = seen.select(F.col(url_col).alias("url")).distinct().withColumn(
        "_s", F.lit(1)
    )
    j = d.join(s, "url", "full_outer").select(
        F.coalesce(
            F.try_parse_url(F.col("url"), F.lit("HOST")), F.lit("")
        ).alias("host"),
        F.coalesce(F.col("_d"), F.lit(0)).alias("_d"),
        F.coalesce(F.col("_s"), F.lit(0)).alias("_s"),
    )
    agg = j.groupBy("host").agg(
        F.sum("_d").alias("n_declared"),
        F.sum(F.col("_d") * F.col("_s")).alias("n_declared_crawled"),
        F.sum(F.when(F.col("_d") == 0, F.col("_s")).otherwise(F.lit(0))).alias(
            "n_crawled_undeclared"
        ),
    )
    return agg.select(
        "host",
        "n_declared",
        "n_declared_crawled",
        "n_crawled_undeclared",
        F.when(
            F.col("n_declared") > 0,
            F.expr("(n_declared_crawled * 1000000) div n_declared"),
        ).otherwise(F.lit(0)).cast("long").alias("coverage_ppm"),
    )


def build_sitemap_xml(
    entries: List[dict],
    kind: str = "url",
) -> bytes:
    """Serialize entry dicts (url + optional lastmod/changefreq/
    priority_ppm) into one sitemaps.org document — ``urlset`` for
    pages, ``sitemapindex`` for shard manifests. Inverse of
    :func:`parse_sitemap_xml` (roundtrip asserted in tests); priority
    rendered from integer ppm with no float formatting drift."""
    from xml.sax.saxutils import escape

    root = "urlset" if kind == "url" else "sitemapindex"
    child = "url" if kind == "url" else "sitemap"
    lines = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        f'<{root} xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">',
    ]
    for e in entries:
        lines.append(f"  <{child}>")
        lines.append(f"    <loc>{escape(str(e['url']))}</loc>")
        if e.get("lastmod"):
            lines.append(f"    <lastmod>{escape(str(e['lastmod']))}</lastmod>")
        if e.get("changefreq"):
            lines.append(
                f"    <changefreq>{escape(str(e['changefreq']))}</changefreq>"
            )
        p = e.get("priority_ppm")
        if p is not None:
            whole, frac = divmod(int(p), 1_000_000)
            lines.append(
                f"    <priority>{whole}.{frac:06d}</priority>"
            )
        lines.append(f"  </{child}>")
    lines.append(f"</{root}>")
    return "\n".join(lines).encode("utf-8")


def write_sitemap(
    urls: DataFrame,
    path: str,
    base_url: str,
    *,
    url_col: str = "url",
    max_per_file: int = 50_000,
) -> List[dict]:
    """Sitemap SINK: publish a crawled/curated URL set as
    sitemaps.org shards plus a ``sitemap_index.xml`` — the protocol
    caps a file at 50k entries, so big sets shard and the index lists
    the shards (exactly what the reference's RSS sink does for feeds,
    done for the crawl-native format; the existing parser reads these
    back byte-for-value).

    Optional columns picked up when present: ``lastmod``,
    ``changefreq``, ``priority_ppm``. Shard assignment is
    deterministic: entries sort by url and chunk in order, so reruns
    produce identical files. Each shard is written by the driver after
    a sorted collect of (url, tiny metadata) rows — sitemaps cap at
    50k entries/file, so this sink is driver-sized BY PROTOCOL; the
    100 TB corpus never flows through it, only the published URL list.
    Returns the per-file manifest (file, entries).
    """
    if max_per_file <= 0 or max_per_file > 50_000:
        raise ValueError("max_per_file must be in (0, 50000]")
    os.makedirs(path, exist_ok=True)
    cols = [url_col] + [
        c for c in ("lastmod", "changefreq", "priority_ppm")
        if c in urls.columns
    ]
    rows = [r.asDict() for r in urls.select(*cols).orderBy(url_col).collect()]
    for r in rows:
        r["url"] = r.pop(url_col)
    manifest: List[dict] = []
    shard_entries = []
    for i in range(0, max(len(rows), 1), max_per_file):
        chunk = rows[i : i + max_per_file]
        if not chunk and i > 0:
            break
        name = f"sitemap-{i // max_per_file:05d}.xml"
        with open(os.path.join(path, name), "wb") as fh:
            fh.write(build_sitemap_xml(chunk, kind="url"))
        manifest.append({"file": name, "entries": len(chunk)})
        shard_entries.append({"url": f"{base_url.rstrip('/')}/{name}"})
    with open(os.path.join(path, "sitemap_index.xml"), "wb") as fh:
        fh.write(build_sitemap_xml(shard_entries, kind="sitemap"))
    return manifest
