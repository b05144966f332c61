"""Derive a crawlable synthetic site from the driver's ``documents``
table (TESTDATA.md) — used by ``__spark_entry__.entry`` so the flagship
crawl runs over testdata-derived pages with zero external data.

Layout: documents are sharded over ``n_hosts`` hosts by doc_id; each
host serves paginated blog listings (page size ``page_size``) whose
items link to one article page per document. The article body is the
document's text in a single ``entry-content`` paragraph, so the
engine's extracted ``content`` must equal ``clean_text(doc.text)`` —
the byte-identity invariant stated directly against testdata.
"""

from __future__ import annotations

import html as _html
import math
from datetime import timedelta
from typing import Iterator, List, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.partitioning import fan_out
from .sitegen import PAGES_COLUMNS, PAGES_SCHEMA, WARC_EPOCH


def _host(i: int, n_hosts: int) -> str:
    return f"docs{i % n_hosts}.example-crawl.org"


def _article_url(doc_id: int, n_hosts: int) -> str:
    return f"https://{_host(doc_id, n_hosts)}/blog/post-{doc_id}"


def article_html(doc_id: int, text: str) -> str:
    title = f"Doc {doc_id}"
    body = _html.escape(text or "")
    return (
        "<html><head>"
        f"<title>{title}</title>"
        '<meta property="og:type" content="article">'
        "</head><body>"
        f'<article class="post">'
        f'<header><h1 class="entry-title">{title}</h1></header>'
        f'<time datetime="2025-07-18">published</time>'
        f'<div class="entry-content"><p>{body}</p></div>'
        f"</article>"
        "</body></html>"
    )


def listing_html(host_idx: int, n_hosts: int, page: int, n_pages: int, doc_ids: List[int]) -> str:
    items = "".join(
        f'<article class="post-item">'
        f'<h2><a href="/blog/post-{d}">Doc {d}</a></h2>'
        f'<span class="date">2025-07-18</span>'
        f'<p class="excerpt">Listing excerpt for doc {d} long enough.</p>'
        f"</article>"
        for d in doc_ids
    )
    nav = (
        f'<a rel="next" href="/blog/page/{page + 1}/">older</a>'
        if page < n_pages
        else ""
    )
    return (
        "<html><head><title>Docs blog</title></head><body>"
        f'<div class="blog-list post-list">{items}</div>{nav}'
        "</body></html>"
    )


def docsite_pages(
    docs: DataFrame, n_hosts: int = 8, page_size: int = 20
) -> Tuple[DataFrame, List[Tuple[str, str]], List[dict]]:
    """documents → (pages_df, seeds, robots).

    Article pages are rendered distributed (mapInPandas over the
    documents scan); only the small listing pages are built on the
    driver (#listings = #docs / page_size).
    """
    spark = docs.sparkSession

    def render_articles(batches) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                doc_id = int(doc_id)
                html_text = article_html(doc_id, text)
                rows.append(
                    {
                        "url": _article_url(doc_id, n_hosts),
                        "warc_ts": WARC_EPOCH + timedelta(seconds=doc_id),
                        "html": html_text.encode("utf-8"),
                        "text": text,
                        "lang": "en",
                    }
                )
            yield pd.DataFrame(rows, columns=PAGES_COLUMNS)

    # fan_out: the sf* documents parquet is one row group → one scan
    # partition; without it article rendering AND every downstream
    # fetch-join/extraction over the persisted pages runs on one core
    article_pages = fan_out(docs.select("doc_id", "text")).mapInPandas(
        render_articles, schema=PAGES_SCHEMA
    )

    # listing pages: ids per host from the (small) doc_id column only
    ids = [int(r["doc_id"]) for r in docs.select("doc_id").collect()]
    by_host: dict = {}
    for d in sorted(ids):
        by_host.setdefault(d % n_hosts, []).append(d)
    listing_rows = []
    seeds: List[Tuple[str, str]] = []
    for h, host_ids in sorted(by_host.items()):
        n_pages = max(1, math.ceil(len(host_ids) / page_size))
        base = f"https://{_host(h, n_hosts)}"
        seeds.append((f"{base}/blog", "content"))
        for page in range(1, n_pages + 1):
            chunk = host_ids[(page - 1) * page_size : page * page_size]
            url = f"{base}/blog" if page == 1 else f"{base}/blog/page/{page}/"
            html_text = listing_html(h, n_hosts, page, n_pages, chunk)
            listing_rows.append(
                (
                    url,
                    WARC_EPOCH,
                    html_text.encode("utf-8"),
                    "",
                    "en",
                )
            )
    listing_pages = spark.createDataFrame(listing_rows, PAGES_SCHEMA)
    robots = [
        {"host": _host(h, n_hosts), "disallow_prefixes": [], "crawl_delay": 0.25}
        for h in sorted(by_host)
    ]
    return article_pages.unionByName(listing_pages), seeds, robots
