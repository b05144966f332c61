"""Arrow-batched extraction over the pages table (SURVEY.md §2.10 X1-X4).

The reference extracts row-at-a-time inside a sequential loop
(base.py:188, ecommerce.py:130-137). Here each extraction family is one
``mapInPandas`` pass: executors receive Arrow record batches of
``(url, html, ...)``, parse each page once with minisoup, and emit the
exploded item rows (the UDTF shape of X4 — 1 page : N items). No
row-at-a-time Python UDFs, no driver-side loops; the ``html`` binary
column is read only inside these functions and pruned everywhere else
(SURVEY.md §4.1 column-pruning note).

Schemas are fixed StructTypes (SURVEY.md §1.2): ad-hoc selector fields
land in an ``extra`` map so config extensions never change the schema.
"""

from __future__ import annotations

from typing import Iterator, Optional

from pyspark.sql import DataFrame

from ..extract.business import BusinessConfig, extract_businesses
from ..extract.content import (
    ContentConfig,
    extract_article_listing,
    extract_single_article,
    find_article_elements,
    find_next_page,
    is_article_page,
)
from ..extract.ecommerce import EcommerceConfig, extract_products
from .. import minisoup

PRODUCTS_SCHEMA = (
    "src_url string, item_pos int, name string, price double, currency string, "
    "url string, availability string, images array<string>, "
    "reviews struct<rating: double, count: int>, extra map<string,string>"
)
_PRODUCT_FIELDS = {
    "name", "price", "currency", "url", "availability", "images", "reviews",
}

BUSINESSES_SCHEMA = (
    "src_url string, item_pos int, name string, address string, phone string, "
    "email string, website string, social_media map<string,string>, "
    "categories array<string>, extra map<string,string>"
)
_BUSINESS_FIELDS = {
    "name", "address", "phone", "email", "website", "social_media", "categories",
}

# Combined content output: one parse per page yields listing rows, full
# article rows, AND outlinks (row_kind discriminates); callers filter+
# prune. This avoids parsing the same html twice for articles and links.
CONTENT_SCHEMA = (
    "src_url string, row_kind string, item_pos int, url string, title string, "
    "date string, author string, content string, excerpt string, image string, "
    "images array<string>, categories array<string>, "
    "metadata map<string,string>, keywords array<string>, link_kind string"
)


def _stringify_extra(value) -> Optional[str]:
    if value is None:
        return None
    return value if isinstance(value, str) else str(value)


def extract_products_df(pages: DataFrame, cfg: Optional[EcommerceConfig] = None) -> DataFrame:
    """P1-P11 as one Arrow pass: pages(url, html) → product rows."""
    cfg = cfg or EcommerceConfig()

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for url, html in zip(pdf["url"].tolist(), pdf["html"].tolist()):
                for pos, item in enumerate(extract_products(html, url, cfg)):
                    extra = {
                        k: _stringify_extra(v)
                        for k, v in item.items()
                        if k not in _PRODUCT_FIELDS
                    }
                    reviews = item.get("reviews")
                    rows.append(
                        {
                            "src_url": url,
                            "item_pos": pos,
                            "name": item.get("name"),
                            "price": item.get("price"),
                            "currency": item.get("currency"),
                            "url": item.get("url"),
                            "availability": item.get("availability"),
                            "images": item.get("images", []),
                            "reviews": (
                                {
                                    "rating": reviews.get("rating"),
                                    "count": reviews.get("count"),
                                }
                                if reviews
                                else None
                            ),
                            "extra": extra,
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "src_url", "item_pos", "name", "price", "currency", "url",
                    "availability", "images", "reviews", "extra",
                ],
            )

    return pages.select("url", "html").mapInPandas(run, schema=PRODUCTS_SCHEMA)


def extract_businesses_df(pages: DataFrame, cfg: Optional[BusinessConfig] = None) -> DataFrame:
    """P12-P19 as one Arrow pass."""
    cfg = cfg or BusinessConfig()

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for url, html in zip(pdf["url"].tolist(), pdf["html"].tolist()):
                for pos, item in enumerate(extract_businesses(html, url, cfg)):
                    extra = {
                        k: _stringify_extra(v)
                        for k, v in item.items()
                        if k not in _BUSINESS_FIELDS
                    }
                    rows.append(
                        {
                            "src_url": url,
                            "item_pos": pos,
                            "name": item.get("name"),
                            "address": item.get("address"),
                            "phone": item.get("phone"),
                            "email": item.get("email"),
                            "website": item.get("website"),
                            "social_media": item.get("social_media", {}),
                            "categories": item.get("categories", []),
                            "extra": extra,
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "src_url", "item_pos", "name", "address", "phone", "email",
                    "website", "social_media", "categories", "extra",
                ],
            )

    return pages.select("url", "html").mapInPandas(run, schema=BUSINESSES_SCHEMA)


def _link_row(src_url: str, pos: int, url: str, link_kind: str) -> dict:
    row = {c: None for c in _CONTENT_COLUMNS}
    row.update(
        {
            "src_url": src_url,
            "row_kind": "link",
            "item_pos": pos,
            "url": url,
            "link_kind": link_kind,
        }
    )
    return row


def _article_row(src_url: str, row_kind: str, pos: int, item: dict) -> dict:
    return {
        "src_url": src_url,
        "row_kind": row_kind,
        "item_pos": pos,
        "url": item.get("url"),
        "title": item.get("title"),
        "date": item.get("date"),
        "author": item.get("author"),
        "content": item.get("content"),
        "excerpt": item.get("excerpt"),
        "image": item.get("image"),
        "images": item.get("images"),
        "categories": item.get("categories"),
        "metadata": item.get("metadata"),
        "keywords": item.get("keywords"),
        "link_kind": None,
    }


_CONTENT_COLUMNS = [
    "src_url", "row_kind", "item_pos", "url", "title", "date", "author",
    "content", "excerpt", "image", "images", "categories", "metadata",
    "keywords", "link_kind",
]


def extract_content_df(pages: DataFrame, cfg: Optional[ContentConfig] = None) -> DataFrame:
    """P20-P33 + T6 in a single parse per page. Emits:

    - ``row_kind='full'``    — single-article projection (P23)
    - ``row_kind='listing'`` — listing projections (P22)
    - ``row_kind='link'``    — outlinks: fetch_full article URLs +
      next-page URL, with ``item_pos`` preserving on-page discovery
      order (the ordering-parity key, SURVEY.md §2.6 O4)
    """
    cfg = cfg or ContentConfig()

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for url, html in zip(pdf["url"].tolist(), pdf["html"].tolist()):
                root = minisoup.parse(html)
                if is_article_page(root):
                    item = extract_single_article(root, url, cfg)
                    if item:
                        rows.append(_article_row(url, "full", 0, item))
                    continue
                pos = 0
                for element in find_article_elements(root, cfg.selectors):
                    item = extract_article_listing(element, url, cfg)
                    if not item:
                        continue
                    fetch_full = item.pop("fetch_full", False)
                    rows.append(_article_row(url, "listing", pos, item))
                    if item.get("url") and fetch_full:
                        rows.append(_link_row(url, pos, item["url"], "article"))
                    pos += 1
                if cfg.follow_next_page and cfg.max_pages > 1 and pos > 0:
                    next_url = find_next_page(root, url)
                    if next_url:
                        rows.append(_link_row(url, pos, next_url, "next_page"))
            yield pd.DataFrame(rows, columns=_CONTENT_COLUMNS)

    return pages.select("url", "html").mapInPandas(run, schema=CONTENT_SCHEMA)
