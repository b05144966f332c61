"""Selector-cascade extractors (SURVEY.md §2.2, P1-P35).

Pure Python over :mod:`web_scrapper_spark.minisoup`. The same functions
run in two places:

1. inside Arrow-batched ``mapInPandas`` UDFs on executors
   (operators/udfs.py) — the distributed path, and
2. in the sequential reference-semantics simulator (crawl/simulator.py)
   — the parity oracle.

This is what makes the "byte-identical extracted text per url"
invariant testable end-to-end: the tests compare the Spark path against
the sequential path over identical page bytes.
"""

from .ecommerce import EcommerceConfig, extract_products
from .business import BusinessConfig, extract_businesses
from .content import (
    ContentConfig,
    extract_articles,
    extract_outlinks,
    find_next_page,
    is_article_page,
)

__all__ = [
    "EcommerceConfig",
    "extract_products",
    "BusinessConfig",
    "extract_businesses",
    "ContentConfig",
    "extract_articles",
    "extract_outlinks",
    "find_next_page",
    "is_article_page",
]
