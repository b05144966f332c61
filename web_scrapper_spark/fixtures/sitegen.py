"""Deterministic synthetic Common-Crawl-style site generator.

Builds the ``pages`` table of BASELINE.json's ``input_hint``
(url, warc_ts, html binary, text, lang) with zero external data. Every
page's HTML is a pure function of its URL (randomness = murmur3 of the
URL, seed 42), so generation is embarrassingly parallel: at bench scale
the table is produced distributed via ``mapInPandas`` over a range of
page indices — no driver-side loop, no collected lists.

The site graph exercises every extraction-cascade branch in
SURVEY.md §2.2 (see FIXTURES.md §5): product listings with price/rating
format variants and heuristic-fallback pages, business directories with
phone/email/social variants, blog listings with all four pagination
styles, article pages with date/byline/meta variants, plus edge pages
(empty body, smart quotes/nbsp/control chars) and robots-disallowed
paths.

The hot-host skew of FIXTURES.md §1 (Zipf s≈1.2) is modeled by giving
host 0 half of all blog articles, host 1 a quarter, etc., so frontier
partitioning sees a genuinely skewed host distribution.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from datetime import datetime, timedelta, timezone
from typing import Dict, Iterator, List, Optional

from ..urlutils import murmur3_32

WARC_EPOCH = datetime(2025, 7, 18, 0, 0, 0, tzinfo=timezone.utc)

PAGES_COLUMNS = ["url", "warc_ts", "html", "text", "lang"]
# StructType built lazily (pyspark import kept out of pure-Python use)
PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"

_FIRST = ["Acme", "Globex", "Initech", "Umbrella", "Stark", "Wayne", "Hooli", "Vandelay"]
_SECOND = ["Widget", "Gadget", "Sprocket", "Flange", "Gizmo", "Doohickey", "Cog", "Lever"]
_AUTHORS = ["Jane Roe", "John Smith", "Ada Lovelace", "Alan Turing", "Grace Hopper"]
_CATEGORIES = ["Tech", "Science", "Business", "Culture", "Data"]
_CITIES = ["Springfield", "Riverton", "Lakeside", "Hillview", "Brookfield"]
_STATES = ["CA", "NY", "TX", "WA", "IL"]
_PARA_WORDS = [
    "analysis", "crawler", "frontier", "politeness", "dedup", "spark",
    "partition", "shuffle", "broadcast", "window", "bloom", "filter",
    "snapshot", "lineage", "epoch", "throughput", "scaling", "vector",
]


def _r(url: str, salt: str = "") -> int:
    """Deterministic non-negative pseudo-random from the URL."""
    return murmur3_32((salt + url).encode("utf-8")) & 0x7FFFFFFF


@dataclass(frozen=True)
class SiteSpec:
    """Sizing knobs. ``n_articles`` is the total article count across all
    hosts, split Zipf-style (host h gets ~ 1/(h+1)^1.2 of the mass)."""

    n_hosts: int = 4
    n_articles: int = 24
    products_pages_per_host: int = 2
    products_per_page: int = 6
    blog_page_size: int = 6
    seed: int = 42

    def host(self, h: int) -> str:
        return f"host{h}.example-crawl.org"

    def base(self, h: int) -> str:
        return f"https://{self.host(h)}"

    def articles_per_host(self) -> List[int]:
        weights = [1.0 / math.pow(h + 1, 1.2) for h in range(self.n_hosts)]
        total_w = sum(weights)
        counts = [max(2, int(round(self.n_articles * w / total_w))) for w in weights]
        return counts

    def blog_pages_per_host(self) -> List[int]:
        return [
            max(1, math.ceil(a / self.blog_page_size))
            for a in self.articles_per_host()
        ]


# ---------------------------------------------------------------------------
# URL enumeration
# ---------------------------------------------------------------------------


def iter_urls(spec: SiteSpec) -> Iterator[str]:
    arts = spec.articles_per_host()
    blog_pages = spec.blog_pages_per_host()
    for h in range(spec.n_hosts):
        base = spec.base(h)
        for p in range(1, spec.products_pages_per_host + 1):
            yield f"{base}/products" if p == 1 else f"{base}/products?page={p}"
        yield f"{base}/directory"
        for b in range(1, blog_pages[h] + 1):
            yield f"{base}/blog" if b == 1 else f"{base}/blog/page/{b}/"
        for a in range(arts[h]):
            yield f"{base}/blog/post-{a}"
        yield f"{base}/private/internal"


def all_urls(spec: SiteSpec) -> List[str]:
    return list(iter_urls(spec))


def seed_urls(spec: SiteSpec) -> List[str]:
    """Crawl seed list: first listing page of each section of each host
    (FIXTURES.md §2), in reference ``urls``-list order (base.py:188)."""
    seeds = []
    for h in range(spec.n_hosts):
        base = spec.base(h)
        seeds.extend([f"{base}/products", f"{base}/directory", f"{base}/blog"])
    return seeds


def robots_rules(spec: SiteSpec) -> List[Dict]:
    """FIXTURES.md §6: /private disallowed on every 5th host (and host 0
    so the default spec exercises the filter); hot host crawls faster."""
    rules = []
    for h in range(spec.n_hosts):
        rules.append(
            {
                "host": spec.host(h),
                "disallow_prefixes": ["/private"] if h % 5 == 0 else [],
                "crawl_delay": 0.5 if h == 0 else 2.0,
            }
        )
    return rules


# ---------------------------------------------------------------------------
# HTML builders (pure functions of the URL)
# ---------------------------------------------------------------------------


def _product_item(h: int, page: int, i: int, url: str) -> str:
    r = _r(url, f"prod{i}")
    name = f"{_FIRST[r % len(_FIRST)]} {_SECOND[(r >> 3) % len(_SECOND)]} {page}-{i}"
    price_style = r % 3
    cents = 10 + (r % 85)
    euros = 5 + (r >> 7) % 90
    if price_style == 0:
        price = f"${euros}.{cents}"
    elif price_style == 1:
        price = f"{euros},{cents} €"
    else:
        price = f"{euros + cents}"
    stock = ["In Stock", "Out of stock", "available now", "unavailable"][r % 4]
    rating_style = r % 4
    if rating_style == 0:
        rating = '<span class="rating">4.5</span>'
    elif rating_style == 1:
        rating = '<span class="rating">9/10</span>'
    elif rating_style == 2:
        rating = '<span class="rating">★★★☆☆</span>'
    else:
        rating = '<span class="stars" style="width: 80%"></span>'
    img_attr = "src" if r % 2 == 0 else "data-src"
    return (
        f'<div class="product-item">'
        f'<h3 class="product-title">{name}</h3>'
        f'<span class="price">{price}</span>'
        f'<span class="stock-status">{stock}</span>'
        f'<img {img_attr}="/img/p{page}_{i}.png">'
        f"{rating}"
        f'<span class="review-count">{r % 500} reviews</span>'
        f'<a href="/p/{page}-{i}">details</a>'
        f"</div>"
    )


def _products_html(spec: SiteSpec, h: int, page: int, url: str) -> str:
    r = _r(url)
    k = 3 + (r % (spec.products_per_page + 4))
    items = "\n".join(_product_item(h, page, i, url) for i in range(k))
    # Every 7th products page (by page hash) drops the known container
    # class to exercise the class-keyword heuristic (ecommerce.py:176-181).
    if r % 7 == 0:
        items = items.replace('class="product-item"', 'class="grid-cell itembox"')
    next_link = ""
    if page < spec.products_pages_per_host:
        next_link = f'<a class="next" href="/products?page={page + 1}">Next »</a>'
    return (
        "<html><head><title>Products</title></head><body>"
        f'<div class="catalog">{items}</div>'
        f'<div class="pagination">{next_link}</div>'
        "</body></html>"
    )


def _business_item(h: int, i: int, url: str) -> str:
    r = _r(url, f"biz{i}")
    name = f"{_FIRST[r % len(_FIRST)]} {_SECOND[(r >> 4) % len(_SECOND)]} Co {i}"
    phone_style = r % 3
    a, b, c = 200 + r % 700, 200 + (r >> 5) % 700, 1000 + (r >> 9) % 9000
    if phone_style == 0:
        phone = f"({a}) {b}-{c}"
    elif phone_style == 1:
        phone = f"{a}-{b}-{c}"
    else:
        phone = f"+1-{a}-{b}-{c}"
    email_domain = "example.com" if r % 5 == 0 else f"biz{i}.org"
    email = f"info{i}@{email_domain}"
    email_html = (
        f'<a class="email" href="mailto:{email}">contact</a>'
        if r % 2 == 0
        else f'<span class="email">{email}</span>'
    )
    city = _CITIES[r % len(_CITIES)]
    state = _STATES[(r >> 3) % len(_STATES)]
    website = f"http://www.{_SECOND[r % len(_SECOND)].lower()}{i}.com/?utm_source=dir#top"
    socials = [
        f'<a href="https://facebook.com/biz{i}">fb</a>',
        f'<a href="https://twitter.com/biz{i}">tw</a>',
        f'<a href="https://linkedin.com/company/biz{i}">li</a>',
        f'<a href="https://instagram.com/biz{i}">ig</a>',
        f'<a href="https://youtube.com/@biz{i}">yt</a>',
        f'<a href="https://pinterest.com/biz{i}">pin</a>',
        f'<a href="https://yelp.com/biz/biz{i}">yelp</a>',
    ]
    social_html = "".join(socials[: 2 + r % 5])
    return (
        f'<div class="business-listing">'
        f'<h3 class="business-name">{name}</h3>'
        f"<address>{100 + r % 899} Main St., {city}, {state} {10000 + r % 89999}</address>"
        f'<span class="phone">{phone}</span>'
        f"{email_html}"
        f'<a class="website" href="{website}">site</a>'
        f'<span class="category">{_CATEGORIES[r % len(_CATEGORIES)]}</span>'
        f"{social_html}"
        f"</div>"
    )


def _directory_html(spec: SiteSpec, h: int, url: str) -> str:
    r = _r(url)
    k = 3 + (r % 6)
    items = "\n".join(_business_item(h, i, url) for i in range(k))
    return (
        "<html><head><title>Directory</title></head><body>"
        f'<div class="directory">{items}</div>'
        "</body></html>"
    )


def _blog_listing_html(spec: SiteSpec, h: int, page: int, url: str) -> str:
    arts = spec.articles_per_host()[h]
    pages = spec.blog_pages_per_host()[h]
    start = (page - 1) * spec.blog_page_size
    end = min(start + spec.blog_page_size, arts)
    items = []
    for a in range(start, end):
        r = _r(url, f"art{a}")
        title = f"Post {a}: {_PARA_WORDS[r % len(_PARA_WORDS)]} notes"
        date = f"2025-0{1 + r % 7}-{10 + r % 18}"
        items.append(
            f'<article class="post-item">'
            f'<h2><a href="/blog/post-{a}">{title}</a></h2>'
            f'<span class="date">{date}</span>'
            f'<p class="excerpt">A short summary of post {a} long enough to keep.</p>'
            f"</article>"
        )
    if page == 1:
        # a listing item pointing into /private — robots-disallowed on
        # every 5th host (exercises the enqueue-time robots filter J4);
        # on allowed hosts it resolves to the private page.
        items.append(
            f'<article class="post-item">'
            f'<h2><a href="/private/internal">Private note {h}</a></h2>'
            f'<span class="date">2025-01-05</span>'
            f'<p class="excerpt">An internal note that robots should skip sometimes.</p>'
            f"</article>"
        )
    # Listing marker classes push the classifier to "listing"
    # (content.py:258-266) even for single-article pages.
    body = f'<div class="blog-list post-list">{"".join(items)}</div>'
    # Pagination style varies per host (content.py:351-456 branches).
    style = h % 4
    nav = ""
    if page < pages:
        if style == 0:
            nav = f'<a rel="next" href="/blog/page/{page + 1}/">older</a>'
        elif style == 1:
            nav = f'<div class="pagination"><a class="next" href="/blog/page/{page + 1}/">Next</a></div>'
        elif style == 2:
            # current-indicator + numbered links
            nav = (
                f'<div class="pagination"><span class="current">{page}</span>'
                f'<a href="/blog/page/{page + 1}/">{page + 1}</a></div>'
            )
        else:
            # bare /page/N/ links → URL-pattern branch (content.py:443-454)
            nav = f'<a href="/blog/page/{page + 1}/">page {page + 1}</a>'
    return (
        "<html><head><title>Blog</title></head><body>"
        f"{body}{nav}"
        "</body></html>"
    )


def _article_html(spec: SiteSpec, h: int, a: int, url: str) -> str:
    r = _r(url)
    title = f"Post {a}: {_PARA_WORDS[r % len(_PARA_WORDS)]} notes"
    author = _AUTHORS[r % len(_AUTHORS)]
    date_style = r % 4
    if date_style == 0:
        date_html = f'<time datetime="2025-0{1 + r % 7}-{10 + r % 18}T08:00:00Z">published</time>'
    elif date_style == 1:
        date_html = f'<span class="post-date">January {10 + r % 18}, 2025</span>'
    elif date_style == 2:
        date_html = f'<span class="post-date">{10 + r % 18} March 2025</span>'
    else:
        date_html = f'<span class="post-date">0{1 + r % 8}/{10 + r % 18}/2025</span>'
    byline = (
        f'<span class="byline">{author}</span>'
        if r % 2 == 0
        else f"<p>By {author}</p>"
    )
    n_paras = 3 + r % 4
    paras = []
    for p in range(n_paras):
        pr = _r(url, f"para{p}")
        words = [
            _PARA_WORDS[(pr + j * 7) % len(_PARA_WORDS)] for j in range(12 + pr % 18)
        ]
        text = " ".join(words)
        if p == 1 and r % 5 == 0:
            # smart quotes / nbsp / control chars → clean_text branches
            text = f"He said “{text}”\x07 and left’s note"
        paras.append(f"<p>{text}.</p>")
    cats = [
        _CATEGORIES[r % len(_CATEGORIES)],
        _CATEGORIES[(r >> 2) % len(_CATEGORIES)],
        _CATEGORIES[r % len(_CATEGORIES)],  # duplicate → dedup branch
    ]
    cat_html = "".join(f'<a class="tag">{c}</a>' for c in cats)
    if r % 13 == 0:
        # Edge page: no matching containers, nearly empty body.
        return "<html><head><title>empty</title></head><body><div>x</div></body></html>"
    return (
        "<html><head>"
        f"<title>{title}</title>"
        f'<meta property="og:title" content="{title}">'
        f'<meta property="og:type" content="article">'
        f'<meta property="article:tag" content="{cats[0]}">'
        f'<meta name="twitter:card" content="summary">'
        f'<meta name="description" content="Summary of post {a}">'
        "</head><body>"
        f'<article class="post">'
        f'<header><h1 class="entry-title">{title}</h1></header>'
        f"{date_html}{byline}"
        f'<div class="entry-content">{"".join(paras)}'
        f'<img src="/img/a{a}.png"><img src="/img/icon-a{a}.png"></div>'
        f'<div class="tags">{cat_html}</div>'
        f"</article>"
        "</body></html>"
    )


def _private_html(url: str) -> str:
    return (
        "<html><head><title>private</title></head><body>"
        "<p>robots-disallowed page; crawlers honoring robots.txt never fetch this.</p>"
        "</body></html>"
    )


def page_html(url: str, spec: Optional[SiteSpec] = None) -> str:
    """Pure URL → HTML. Raises on URLs outside the site graph."""
    spec = spec or SiteSpec()
    from urllib.parse import urlparse

    parsed = urlparse(url)
    h = int(parsed.netloc.split(".")[0].replace("host", ""))
    path, query = parsed.path, parsed.query
    if path == "/products":
        page = 1
        if "page=" in query:
            page = int(query.split("page=")[1].split("&")[0])
        return _products_html(spec, h, page, url)
    if path == "/directory":
        return _directory_html(spec, h, url)
    if path == "/blog":
        return _blog_listing_html(spec, h, 1, url)
    if path.startswith("/blog/page/"):
        page = int(path.rstrip("/").rsplit("/", 1)[1])
        return _blog_listing_html(spec, h, page, url)
    if path.startswith("/blog/post-"):
        a = int(path.rsplit("-", 1)[1])
        return _article_html(spec, h, a, url)
    if path.startswith("/private"):
        return _private_html(url)
    raise KeyError(f"URL outside synthetic site: {url}")


def expected_text(url: str, html: str) -> str:
    """The ``text`` column: the reference-semantics extracted text for
    article pages (the byte-identity target, content.py:829-862), else
    clean_html of the page."""
    from ..extract.content import ContentConfig, extract_articles
    from ..textutils import clean_html

    if "/blog/post-" in url:
        articles = extract_articles(html, url, ContentConfig(selectors={}))
        if articles and articles[0].get("content"):
            return articles[0]["content"]
    return clean_html(html)


def page_record(url: str, index: int, spec: Optional[SiteSpec] = None) -> Dict:
    spec = spec or SiteSpec()
    html = page_html(url, spec)
    lang = "en" if index % 20 < 19 else ("de" if index % 2 == 0 else "fr")
    return {
        "url": url,
        "warc_ts": WARC_EPOCH + timedelta(seconds=index),
        "html": html.encode("utf-8"),
        "text": expected_text(url, html),
        "lang": lang,
    }


# ---------------------------------------------------------------------------
# Spark builders
# ---------------------------------------------------------------------------


def pages_dataframe(spark, spec: Optional[SiteSpec] = None, num_partitions: int = 8):
    """Distributed pages-table generation: URLs are enumerated on the
    driver (cheap — strings only), parallelized, and HTML/text are
    rendered on executors via ``mapInPandas`` so bench-scale generation
    never funnels through the driver."""
    spec = spec or SiteSpec()
    urls = all_urls(spec)
    url_df = spark.createDataFrame(
        [(u, i) for i, u in enumerate(urls)], "url string, idx long"
    ).repartition(num_partitions, "url")

    def render(batches):
        import pandas as pd

        for pdf in batches:
            records = [
                page_record(u, int(i), spec)
                for u, i in zip(pdf["url"], pdf["idx"])
            ]
            yield pd.DataFrame(records, columns=PAGES_COLUMNS)

    return url_df.mapInPandas(render, schema=PAGES_SCHEMA)


def robots_dataframe(spark, spec: Optional[SiteSpec] = None):
    spec = spec or SiteSpec()
    return spark.createDataFrame(
        [(r["host"], r["disallow_prefixes"], r["crawl_delay"]) for r in robots_rules(spec)],
        "host string, disallow_prefixes array<string>, crawl_delay double",
    )
