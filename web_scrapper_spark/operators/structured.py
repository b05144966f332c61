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

__all__ = ["JSONLD_BLOCK_RE", "jsonld_blocks", "jsonld_extract"]

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
