"""Structured-data extraction: schema.org JSON-LD blocks from HTML.

The reference extracts products/articles through per-site CSS selector
cascades (extract/*.py); the open web's OTHER metadata channel is
embedded ``<script type="application/ld+json">`` blocks, which sites
publish precisely so crawlers don't need site-specific selectors. At
100 TB this is the highest-precision extraction signal available and
it costs one regexp scan + JSON path reads per page — all native
expressions (``regexp_extract_all`` + ``get_json_object``), zero
Python, zero shuffle.

Complements, not replaces, the selector cascades: JSON-LD covers the
sites that publish it; the cascades cover the configured sites that
don't.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "JSONLD_BLOCK_RE",
    "jsonld_blocks",
    "jsonld_extract",
    "detect_charset",
    "page_meta",
    "meta_robots",
    "nofollow_links",
    "gate_noindex",
    "gate_nofollow_outlinks",
]

#: lazy, case-insensitive, dotall — script attributes in any order as
#: long as the type token appears before the closing '>'.
JSONLD_BLOCK_RE = (
    r"""(?is)<script[^>]*type=["']application/ld\+json["'][^>]*>(.*?)</script>"""
)

#: JSON paths pulled per block — the schema.org core every major
#: consumer (search engines, Common Crawl WAT) reads. Spark path
#: syntax; the DuckDB oracle uses the equivalent quoted form.
_FIELDS = {
    "jsonld_type": "$['@type']",
    "name": "$.name",
    "headline": "$.headline",
    "date_published": "$.datePublished",
    "author_name": "$.author.name",
    "price": "$.offers.price",
    "currency": "$.offers.priceCurrency",
}


def jsonld_blocks(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """One row per JSON-LD block: (url, block_pos, block). Pages
    without blocks emit nothing (posexplode of an empty array)."""
    return pages.select(
        F.col(url_col).alias("url"),
        F.posexplode(
            F.regexp_extract_all(
                F.col(html_col).cast("string"), F.lit(JSONLD_BLOCK_RE), 1
            )
        ).alias("block_pos", "block"),
    )


def jsonld_extract(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Typed schema.org fields per JSON-LD block:

      (url, block_pos, jsonld_type, name, headline, date_published,
       author_name, price, currency)

    Fields absent from a block are NULL (``get_json_object``
    semantics); malformed JSON yields NULLs rather than errors, the
    right behavior for crawled bytes. Whole pipeline is one Project
    per page — scan-shaped at any corpus size.
    """
    blocks = jsonld_blocks(pages, url_col, html_col)
    return blocks.select(
        "url",
        "block_pos",
        *[
            F.get_json_object(F.col("block"), path).alias(name)
            for name, path in _FIELDS.items()
        ],
    )


#: declaration-sniffing regexes — HTML5 <meta charset>, legacy
#: http-equiv Content-Type, and XML prolog encoding.
_META_CHARSET_RE = r"""(?i)<meta[^>]*charset\s*=\s*["']?([a-zA-Z0-9_\-]+)"""
_XML_ENCODING_RE = r"""(?i)<\?xml[^>]*encoding\s*=\s*["']([a-zA-Z0-9_\-]+)["']"""


def detect_charset(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    sniff_bytes: int = 1024,
) -> DataFrame:
    """Charset triage per page — the decode decision every crawler
    makes before any text processing (WHATWG encoding-sniffing order,
    the subset computable without a decoder): byte-order mark first
    (UTF-8 / UTF-16LE / UTF-16BE), then a ``<meta charset>`` /
    ``http-equiv`` / XML-prolog declaration inside the first
    ``sniff_bytes`` bytes, else the UTF-8 default. Returns

      (url, charset, charset_source)   source ∈ {bom, meta, default}

    Declared names are lowercased; the declaration scan is two native
    ``regexp_extract`` calls over a bounded prefix (constant work per
    page regardless of page size), the BOM check three binary-prefix
    equality tests — zero Python, zero shuffle.
    """
    raw = F.col(html_col).cast("binary")
    head = F.substring(raw, 1, sniff_bytes).cast("string")
    bom = (
        F.when(F.substring(raw, 1, 3) == F.lit(b"\xef\xbb\xbf"), "utf-8")
        .when(F.substring(raw, 1, 2) == F.lit(b"\xff\xfe"), "utf-16le")
        .when(F.substring(raw, 1, 2) == F.lit(b"\xfe\xff"), "utf-16be")
    )
    meta = F.lower(
        F.coalesce(
            F.nullif(F.regexp_extract(head, _META_CHARSET_RE, 1), F.lit("")),
            F.nullif(F.regexp_extract(head, _XML_ENCODING_RE, 1), F.lit("")),
        )
    )
    return pages.select(
        F.col(url_col).alias("url"),
        F.coalesce(bom, meta, F.lit("utf-8")).alias("charset"),
        F.when(bom.isNotNull(), F.lit("bom"))
        .when(meta.isNotNull(), F.lit("meta"))
        .otherwise(F.lit("default"))
        .alias("charset_source"),
    )


def _attr_pair_res(tag: str, key_attr: str, key: str, val_attr: str):
    """Two regexes matching <tag …key_attr=key …val_attr=(value)…> in
    either attribute order (the wild publishes both)."""
    k, v = key_attr, val_attr
    return (
        rf"""(?is)<{tag}[^>]*{k}\s*=\s*["']{key}["'][^>]*{v}\s*=\s*["']([^"']*)["']""",
        rf"""(?is)<{tag}[^>]*{v}\s*=\s*["']([^"']*)["'][^>]*{k}\s*=\s*["']{key}["']""",
    )


def page_meta(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Head-metadata extraction — the fields a WAT-style metadata
    record carries per page: ``<title>``, ``<meta name=description>``,
    and the OpenGraph title/image. Pure ``regexp_extract`` (both
    attribute orders matched, first hit wins), whitespace-collapsed,
    absent fields NULL. One Project per page, zero Python, zero
    shuffle — the selector-free metadata sweep that runs corpus-wide
    where the reference's configured selector cascades run per-site.

      (url, title, meta_description, og_title, og_image)
    """
    html = F.col(html_col).cast("string")

    def norm(c):
        return F.nullif(
            F.trim(F.regexp_replace(c, r"\s+", " ")), F.lit("")
        )

    def pair(tag, key_attr, key, val_attr="content"):
        a, b = _attr_pair_res(tag, key_attr, key, val_attr)
        return F.coalesce(
            norm(F.regexp_extract(html, a, 1)),
            norm(F.regexp_extract(html, b, 1)),
        )

    title = norm(F.regexp_extract(html, r"(?is)<title[^>]*>(.*?)</title>", 1))
    return pages.select(
        F.col(url_col).alias("url"),
        title.alias("title"),
        pair("meta", "name", "description").alias("meta_description"),
        pair("meta", "property", "og:title").alias("og_title"),
        pair("meta", "property", "og:image").alias("og_image"),
    )


# ---------------------------------------------------------------------------
# Robots meta directives — page-level crawl/index policy
# ---------------------------------------------------------------------------

#: <meta name=robots content=...> in either attribute order; all
#: matches collected (sites emit duplicates; union = most-restrictive).
_ROBOTS_META_NAME_FIRST = (
    r"""(?is)<meta[^>]*name\s*=\s*["']robots["'][^>]*content\s*=\s*["']([^"']*)["']"""
)
_ROBOTS_META_CONTENT_FIRST = (
    r"""(?is)<meta[^>]*content\s*=\s*["']([^"']*)["'][^>]*name\s*=\s*["']robots["']"""
)


def meta_robots(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Page-level robots meta directives — the in-band counterpart of
    robots.txt (REP robots meta tag: ``<meta name="robots"
    content="noindex, nofollow">``). robots.txt gates what gets
    FETCHED (frontier/robots.py); the meta tag gates what a fetched
    page may contribute: ``noindex`` pages must not enter the corpus,
    ``nofollow`` pages must not contribute outlinks. A 100 TB corpus
    that ignores it ships text its publishers opted out of.

    Returns ``(url, noindex, nofollow)``. Parsing per the spec's
    grammar: directives are comma-separated, case-insensitive,
    whitespace-tolerant; ``none`` ≡ ``noindex, nofollow``; ``all`` and
    unknown directives are no-ops; multiple robots meta tags union
    (most-restrictive wins). Both attribute orders matched. All native
    (``regexp_extract_all`` + higher-order array ops) — zero Python,
    zero shuffle, whole-stage codegen.
    """
    html = F.col(html_col).cast("string")
    contents = F.concat(
        F.regexp_extract_all(html, F.lit(_ROBOTS_META_NAME_FIRST), F.lit(1)),
        F.regexp_extract_all(html, F.lit(_ROBOTS_META_CONTENT_FIRST), F.lit(1)),
    )
    toks = F.flatten(
        F.transform(
            contents,
            # \s-strip, not trim(): trim removes only ' ' and the spec's
            # grammar is whitespace-tolerant across tabs/newlines too —
            # keep byte-for-byte with parse_meta_robots below
            lambda c: F.transform(
                F.split(c, ","),
                lambda t: F.lower(F.regexp_replace(t, r"^\s+|\s+$", "")),
            ),
        )
    )
    has = lambda *names: F.exists(  # noqa: E731
        toks, lambda t: t.isin(*names)
    )
    return pages.select(
        F.col(url_col).alias("url"),
        has("noindex", "none").alias("noindex"),
        has("nofollow", "none").alias("nofollow"),
    )


#: attributes pulled out of each collected <a ...> open tag.
_HREF_IN_TAG_RE = r"""(?is)href\s*=\s*["']([^"']*)["']"""
_REL_IN_TAG_RE = r"""(?is)rel\s*=\s*["']([^"']*)["']"""


def nofollow_links(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Link-level ``rel="nofollow"`` edges: ``(url, target)`` for every
    anchor whose ``rel`` attribute carries the ``nofollow`` token
    (space/comma-separated per the HTML link-types grammar; matching
    is case-insensitive and exact-token — ``rel="nofollowother"``
    does NOT match). Feed as an anti-join against discovered links so
    publisher-disavowed edges never enter the frontier or the link
    graph (every production crawler and PageRank pipeline drops them).

    Native end-to-end: one ``regexp_extract_all`` collecting anchor
    open-tags, per-tag href/rel pulls and token test inside array
    higher-order functions, one explode. Zero Python, zero shuffle.
    """
    html = F.col(html_col).cast("string")
    tags = F.regexp_extract_all(html, F.lit(r"(?is)<a\b[^>]*>"), F.lit(0))
    pairs = F.filter(
        F.transform(
            tags,
            lambda t: F.struct(
                F.regexp_extract(t, _HREF_IN_TAG_RE, 1).alias("href"),
                F.regexp_extract(t, _REL_IN_TAG_RE, 1).alias("rel"),
            ),
        ),
        lambda s: (s["href"] != F.lit(""))
        & F.exists(
            F.split(F.lower(s["rel"]), r"[\s,]+"),
            lambda tok: tok == F.lit("nofollow"),
        ),
    )
    return pages.select(
        F.col(url_col).alias("url"), F.explode(pairs).alias("_p")
    ).select("url", F.col("_p.href").alias("target"))


def gate_noindex(
    docs: DataFrame, flags: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Corpus gate: drop rows whose page declared ``noindex``. The
    flags side is pre-filtered to the (rare) true rows, so the
    anti-join broadcasts."""
    bad = flags.filter(F.col("noindex")).select(F.col("url").alias(url_col))
    return docs.join(F.broadcast(bad), url_col, "left_anti")


def gate_nofollow_outlinks(
    links: DataFrame, flags: DataFrame, src_col: str = "src_url"
) -> DataFrame:
    """Outlink gate: drop discovered links whose SOURCE page declared
    ``nofollow`` (page-level; combine with :func:`nofollow_links` for
    per-anchor rel gating). Anti-join on the rare true rows —
    broadcast-sized by construction."""
    bad = flags.filter(F.col("nofollow")).select(F.col("url").alias(src_col))
    return links.join(F.broadcast(bad), src_col, "left_anti")


#: python twin of :func:`meta_robots` for the sequential simulator /
#: driver-side callers — same regexes, same token grammar, so the two
#: engines agree byte-for-byte on every page.
import re as _re

_PY_ROBOTS_RES = (
    _re.compile(_ROBOTS_META_NAME_FIRST),  # inline (?is) flags
    _re.compile(_ROBOTS_META_CONTENT_FIRST),
)


def parse_meta_robots(html) -> tuple:
    """(noindex, nofollow) from raw html bytes/str — the sequential
    twin of :func:`meta_robots` (identical regexes and directive
    grammar; used by crawl/simulator.py for parity tests)."""
    if isinstance(html, (bytes, bytearray)):
        html = html.decode("utf-8", "replace")
    toks = set()
    for rx in _PY_ROBOTS_RES:
        for content in rx.findall(html or ""):
            # strip exactly Java's \s class — engine/twin byte parity
            toks.update(
                t.strip(" \t\n\x0b\f\r").lower() for t in content.split(",")
            )
    return (
        bool(toks & {"noindex", "none"}),
        bool(toks & {"nofollow", "none"}),
    )
