"""Article/blog extraction cascades (SURVEY.md §2.2 P20-P33, §2.9 T6).

Reproduces the extraction semantics of the reference's ContentScraper
(/root/reference/src/webscraper/scrapers/content.py:110-1177) as pure
functions over minisoup DOMs:

- page classification (article vs listing, content.py:235-290)
- container discovery (content.py:292-349)
- next-page discovery — the frontier-growth operator (content.py:351-456)
- listing + full-article projections with the coalesce cascades
- the listing ⟕ full merge rule (content.py:160-165) as a pure function
  so the Spark join (J1) and the sequential oracle share it
- ``_extract_content`` → the byte-identical ``text`` invariant path

The sequential nested-fetch structure of the reference (listing page →
immediate article fetches → pagination loop) lives in
``crawl/simulator.py``; here are only the per-page pure parts, which the
Spark engine stages into epochs instead.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from datetime import datetime
from typing import Any, Dict, List, Optional
from urllib.parse import urljoin, urlparse

from .. import minisoup
from ..minisoup import Tag
from ..textutils import clean_text, extract_keywords, summarize_text

# Defaults from the reference's generated content config
# (/root/reference/src/webscraper/utils/config.py:355-364).
DEFAULT_SELECTORS = {
    "article_container": ".article",
    "title": ".article-title",
    "date": ".article-date",
    "author": ".article-author",
    "content": ".article-content",
    "excerpt": ".article-excerpt",
    "image": ".article-image img",
    "categories": ".article-category",
}


@dataclass
class ContentConfig:
    selectors: Dict[str, str] = field(default_factory=lambda: dict(DEFAULT_SELECTORS))
    extract_images: bool = True  # content.py:49-57 defaults
    extract_metadata: bool = True
    generate_summary: bool = True
    summary_length: int = 150
    extract_keywords: bool = True
    max_keywords: int = 5
    follow_next_page: bool = False
    max_pages: int = 1


# ---------------------------------------------------------------------------
# P20 — article vs listing classification (content.py:235-290)
# ---------------------------------------------------------------------------


def _text_len_exceeds(root: Tag, n: int) -> bool:
    """``len(root.get_text()) > n`` without materializing the join —
    O(1) on a fast-built document (text length tracked at parse time),
    early-exit iteration otherwise."""
    known = getattr(root, "text_len", None)
    if known is not None:
        return known > n
    total = 0
    for s in root.strings:
        total += len(s)
        if total > n:
            return True
    return False


def is_article_page(root: Tag) -> bool:
    """Article-vs-listing classifier (reference content.py heuristics,
    P20). The indicator set probes the classed-tag pool ~7 times; on an
    indexed tree all seven fuse into ONE pass over that pool (the
    classifier runs once per crawled page — at 10^10 pages this is a
    top-3 fixed cost). The un-indexed fallback keeps the original
    probe-per-indicator shape; both compute identical booleans."""
    doc = root.root
    idx = doc.index if doc is not None else None
    if idx is None or doc is not root:
        return _is_article_page_probes(root)

    # one pass over every classed tag, computing all class indicators
    art_article_cls = art_post_cls = art_title_heading = False
    listing_archive = listing_container = content_cls = False
    post_dash_count = 0
    for t in idx["attr"].get("class", ()):
        v = t.attrs.get("class")
        if not v:
            continue
        lv = v.lower()
        if "article" in v:
            art_article_cls = True
        if "post" in v and "post-list" not in v:
            art_post_cls = True
        if "post-" in v:
            post_dash_count += 1
        name = t.name
        if (
            not art_title_heading
            and name in ("h1", "h2")
            and ("title" in lv or "headline" in lv or "heading" in lv)
        ):
            art_title_heading = True
        if not listing_archive and (
            "archive" in lv or "listing" in lv or "index" in lv
            or "blog-list" in lv or "post-list" in lv
        ):
            listing_archive = True
        if (
            not listing_container
            and name in ("ul", "div")
            and ("posts" in lv or "articles" in lv or "entries" in lv)
        ):
            listing_container = True
        if (
            not content_cls
            and name in ("p", "div")
            and ("content" in lv or "body" in lv or "entry" in lv
                 or "article-text" in lv)
        ):
            content_cls = True

    articles = idx["name"].get("article", ())
    itemprops = idx["attr"].get("itemprop", ())
    article_score = sum(
        1
        for i in (
            bool(articles),
            art_article_cls,
            art_post_cls,
            art_title_heading,
            any(t.attrs.get("itemprop") == "headline" for t in itemprops),
            any(
                t.attrs.get("property") == "og:type"
                and t.attrs.get("content") == "article"
                for t in idx["attr"].get("property", ())
            ),
        )
        if i
    )
    listing_score = sum(
        1
        for i in (
            len(articles) > 1,
            post_dash_count > 3,
            listing_archive,
            listing_container,
        )
        if i
    )
    if listing_score > article_score:
        return False
    content_score = sum(
        1
        for i in (
            _text_len_exceeds(root, 2000),
            content_cls,
            any(t.attrs.get("itemprop") == "articleBody" for t in itemprops),
            len(idx["name"].get("p", ())) > 5,
        )
        if i
    )
    return content_score >= 2 or article_score > listing_score


def _is_article_page_probes(root: Tag) -> bool:
    """Probe-per-indicator classifier for un-indexed trees (subtree
    calls, index=None parses) — the original reference-shaped code."""
    article_indicators = [
        root.find("article"),
        root.find(class_=lambda x: x and "article" in x),
        root.find(class_=lambda x: x and "post" in x and "post-list" not in x),
        root.find(
            ["h1", "h2"],
            class_=lambda x: x
            and any(t in str(x).lower() for t in ("title", "headline", "heading")),
        ),
        root.find(attrs={"itemprop": "headline"}),
        root.find(attrs={"property": "og:type", "content": "article"}),
    ]
    listing_indicators = [
        len(root.find_all("article")) > 1,
        len(root.find_all(class_=lambda x: x and "post-" in x)) > 3,
        root.find(
            class_=lambda x: x
            and any(
                t in str(x).lower()
                for t in ("archive", "listing", "index", "blog-list", "post-list")
            )
        ),
        root.find(
            ["ul", "div"],
            class_=lambda x: x
            and any(t in str(x).lower() for t in ("posts", "articles", "entries")),
        ),
    ]
    article_score = sum(1 for i in article_indicators if i)
    listing_score = sum(1 for i in listing_indicators if i)
    if listing_score > article_score:
        return False
    content_indicators = [
        _text_len_exceeds(root, 2000),
        root.find(
            ["p", "div"],
            class_=lambda x: x
            and any(
                t in str(x).lower()
                for t in ("content", "body", "entry", "article-text")
            ),
        ),
        root.find(attrs={"itemprop": "articleBody"}),
        len(root.find_all("p")) > 5,
    ]
    content_score = sum(1 for i in content_indicators if i)
    return content_score >= 2 or article_score > listing_score


# ---------------------------------------------------------------------------
# P21 — listing container discovery (content.py:292-349)
# ---------------------------------------------------------------------------

_LISTING_KEYWORDS = ("post", "article", "entry", "item", "content")


def find_article_elements(root: Tag, selectors: Dict[str, str]) -> List[Tag]:
    doc = root.root
    idx = doc.index if doc is not None and doc is root else None
    if idx is not None:
        # indexed fast path: the 8 built-in container probes are plain
        # index lookups in the SAME cascade order (each select()'s
        # single-compound pool IS the index pool) — this runs once per
        # crawled page, so probe setup cost matters at 10^10 pages
        custom = selectors.get("article_container")
        if custom:
            elements = root.select(custom)
            if elements:
                return elements
        pool = idx["name"].get("article")
        if pool:
            return list(pool)
        for token in ("post", "entry", "article", "blog-post", "blog-entry"):
            pool = idx["class"].get(token)
            if pool:
                return list(pool)
        itemtyped = idx["attr"].get("itemtype", ())
        for sub in ("BlogPosting", "Article"):
            hits = [
                t for t in itemtyped if sub in t.attrs.get("itemtype", "")
            ]
            if hits:
                return hits
    else:
        for selector in (
            selectors.get("article_container"),
            "article",
            ".post",
            ".entry",
            ".article",
            ".blog-post",
            ".blog-entry",
            "[itemtype*='BlogPosting']",
            "[itemtype*='Article']",
        ):
            if not selector:
                continue
            elements = root.select(selector)
            if elements:
                return elements

    candidates = root.find_all(
        ["div", "li", "article"],
        class_=lambda x: x and any(k in str(x).lower() for k in _LISTING_KEYWORDS),
    )
    if candidates:
        return candidates

    possible = []
    for element in root.find_all(["div", "li", "article"]):
        has_title = element.find(["h1", "h2", "h3", "h4"]) or element.find(
            class_=lambda x: x and "title" in str(x).lower()
        )
        has_meta = (
            element.find(text=re.compile(r"\d{1,2}[/-]\d{1,2}[/-]\d{2,4}"))
            or element.find(
                class_=lambda x: x
                and any(t in str(x).lower() for t in ("date", "time", "author", "meta"))
            )
            or element.find("time")
        )
        has_excerpt = element.find(
            ["p", "div"],
            class_=lambda x: x
            and any(
                t in str(x).lower()
                for t in ("excerpt", "summary", "description", "intro")
            ),
        )
        if has_title and (has_meta or has_excerpt):
            possible.append(element)
    return possible


# ---------------------------------------------------------------------------
# T6 — next-page discovery (content.py:351-456)
# ---------------------------------------------------------------------------

_NEXT_SELECTORS = (
    ".next",
    ".next-page",
    ".pagination .next",
    "a[rel='next']",
    "a:contains('Next')",
    "a:contains('»')",
    "a.next",
    ".pagination a:contains('›')",
)
_NUM_RE = re.compile(r"\d+")


def _absolutize(base_url: str, url: str) -> str:
    if not url.startswith(("http://", "https://")):
        return urljoin(base_url, url)
    return url


def find_next_page(root: Tag, base_url: str) -> Optional[str]:
    for selector in _NEXT_SELECTORS:
        try:
            link = root.select_one(selector)
        except Exception:
            continue
        if link is not None and link.has_attr("href"):
            return _absolutize(base_url, link["href"])

    # Current-page indicator → next number / next sibling
    indicator = None
    for selector in (".current", ".active", ".selected", "[aria-current='page']"):
        indicator = root.select_one(selector)
        if indicator:
            break
    if indicator is not None:
        if indicator.name == "a" and indicator.has_attr("href"):
            try:
                current = int(_NUM_RE.search(indicator.get_text()).group())
                for link in root.find_all("a", href=True, text=_NUM_RE):
                    try:
                        if int(_NUM_RE.search(link.get_text()).group()) == current + 1:
                            return _absolutize(base_url, link["href"])
                    except Exception:
                        continue
            except Exception:
                pass
        else:
            if indicator.parent is not None:
                sib = indicator.find_next_sibling()
                if sib is not None and sib.name == "a" and sib.has_attr("href"):
                    return _absolutize(base_url, sib["href"])

    # URL-pattern pagination
    parsed = urlparse(base_url)
    path, query = parsed.path, parsed.query
    if "page=" in query:
        m = re.search(r"page=(\d+)", query)
        if m:
            nxt = int(m.group(1)) + 1
            next_query = re.sub(r"page=\d+", f"page={nxt}", query)
            return f"{parsed.scheme}://{parsed.netloc}{path}?{next_query}"
    m = re.search(r"/page/(\d+)/?$", path)
    if m:
        nxt = int(m.group(1)) + 1
        next_path = re.sub(r"/page/\d+/?$", f"/page/{nxt}/", path)
        return f"{parsed.scheme}://{parsed.netloc}{next_path}"
    if "/page/" not in path and root.find_all("a", href=re.compile(r"/page/\d+/?$")):
        return f"{parsed.scheme}://{parsed.netloc}{path.rstrip('/')}/page/2/"
    return None


# ---------------------------------------------------------------------------
# Field cascades (P24-P33)
# ---------------------------------------------------------------------------


def _extract_title(element: Tag, selectors: Dict[str, str]) -> Optional[str]:
    """P24 (content.py:562-599)."""
    if "title" in selectors:
        node = element.select_one(selectors["title"])
        if node:
            return node.get_text(strip=True)
    for selector in (
        "h1",
        "h1.entry-title", "h1.post-title", "h1.article-title",
        ".entry-title", ".post-title", ".article-title",
        "[itemprop='headline']",
        "header h1", "header h2",
        "h2.entry-title",
        ".title",
    ):
        node = element.select_one(selector)
        if node:
            return node.get_text(strip=True)
    meta = element.find("meta", property="og:title")
    if meta is not None and meta.has_attr("content"):
        return meta["content"]
    heading = element.find(["h1", "h2", "h3"])
    if heading:
        return heading.get_text(strip=True)
    return None


def _extract_url(element: Tag, base_url: str, selectors: Dict[str, str]) -> Optional[str]:
    """P25 (content.py:601-633)."""
    if "url" in selectors:
        node = element.select_one(selectors["url"])
        if node is not None and node.has_attr("href"):
            return _absolutize(base_url, node["href"])
    title_el = element.find(["h1", "h2", "h3", "h4"])
    if title_el:
        link = title_el.find("a", href=True)
        if link:
            return _absolutize(base_url, link["href"])
    link = element.find("a", href=True)
    if link:
        return _absolutize(base_url, link["href"])
    return None


_DATE_TEXT_PATTERNS = [
    r"\d{1,2}\s+(?:Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)[a-z]*\s+\d{4}",
    r"(?:Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)[a-z]*\s+\d{1,2},?\s+\d{4}",
    r"\d{4}-\d{2}-\d{2}",
    r"\d{2}/\d{2}/\d{4}",
    r"\d{1,2}/\d{1,2}/\d{2,4}",
]
_DATE_TEXT_RES = [re.compile(p) for p in _DATE_TEXT_PATTERNS]
_DATE_TEXT_FORMATS = ["%d %B %Y", "%B %d, %Y", "%B %d %Y", "%Y-%m-%d", "%m/%d/%Y", "%d/%m/%Y"]
_ISO_DATE_RE = re.compile(r"\d{4}-\d{2}-\d{2}$")
_PARSE_DATE_PATTERNS = [
    (re.compile(r"\d{1,2}\s+(?:Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)[a-z]*\s+\d{4}"), "%d %B %Y"),
    (re.compile(r"(?:Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)[a-z]*\s+\d{1,2},?\s+\d{4}"), "%B %d, %Y"),
    (re.compile(r"\d{4}-\d{2}-\d{2}"), "%Y-%m-%d"),
    (re.compile(r"\d{2}/\d{2}/\d{4}"), "%m/%d/%Y"),
]


def _iso_from_attr(date_str: str) -> Optional[str]:
    try:
        if "T" in date_str:
            return datetime.fromisoformat(date_str.replace("Z", "+00:00")).date().isoformat()
        return date_str.split("T")[0]
    except Exception:
        return None


def parse_date_node(element: Tag) -> Optional[str]:
    """P26 attr/text parse (content.py:694-750)."""
    if element.has_attr("datetime"):
        iso = _iso_from_attr(element["datetime"])
        if iso:
            return iso
    if element.has_attr("content"):
        iso = _iso_from_attr(element["content"])
        if iso:
            return iso
    date_text = element.get_text(strip=True)
    for rx, fmt in _PARSE_DATE_PATTERNS:
        m = rx.search(date_text)
        if m:
            date_str = m.group(0)
            try:
                if fmt == "%Y-%m-%d":
                    # fast path: strptime is ~20x the cost of a direct
                    # construct; identical result + identical ValueError
                    # behavior on out-of-range fields
                    y, mo, d = date_str.split("-")
                    return datetime(int(y), int(mo), int(d)).date().isoformat()
                return datetime.strptime(date_str, fmt).date().isoformat()
            except ValueError:
                if fmt == "%m/%d/%Y":
                    try:
                        return datetime.strptime(date_str, "%d/%m/%Y").date().isoformat()
                    except ValueError:
                        continue
                continue
    return None


def _extract_date(element: Tag, selectors: Dict[str, str]) -> Optional[str]:
    """P26 (content.py:635-692)."""
    if "date" in selectors:
        node = element.select_one(selectors["date"])
        if node:
            return parse_date_node(node)
    for selector in (
        "time",
        "[itemprop='datePublished']",
        "[property='article:published_time']",
        ".date",
        ".published",
        ".post-date",
        ".entry-date",
        ".article-date",
        ".meta-date",
        "meta[property='article:published_time']",
    ):
        node = element.select_one(selector)
        if node:
            return parse_date_node(node)
    for rx in _DATE_TEXT_RES:
        match = element.find(text=rx)
        if match:
            m = rx.search(match)
            if m:
                date_str = m.group(0)
                if _ISO_DATE_RE.match(date_str):
                    # fast path for the ISO shape: the first three
                    # formats always raise on it, the fourth parses it —
                    # construct directly with identical semantics
                    y, mo, d = date_str.split("-")
                    try:
                        return datetime(int(y), int(mo), int(d)).isoformat()[:10]
                    except ValueError:
                        continue
                for fmt in _DATE_TEXT_FORMATS:
                    try:
                        return datetime.strptime(date_str, fmt).isoformat()[:10]
                    except ValueError:
                        continue
    return None


_AUTHOR_TEXT_RES = [
    re.compile(r"By\s+([A-Z][a-z]+(?:\s+[A-Z][a-z]+){0,2})"),
    re.compile(r"Author[:\s]+([A-Z][a-z]+(?:\s+[A-Z][a-z]+){0,2})"),
]


def _extract_author(element: Tag, selectors: Dict[str, str]) -> Optional[str]:
    """P27 (content.py:752-792)."""
    if "author" in selectors:
        node = element.select_one(selectors["author"])
        if node:
            return node.get_text(strip=True)
    for selector in (
        "[itemprop='author']",
        "[rel='author']",
        ".author",
        ".byline",
        ".entry-author",
        ".post-author",
        "meta[name='author']",
        ".meta-author",
    ):
        node = element.select_one(selector)
        if node:
            if node.name == "meta" and node.has_attr("content"):
                return node["content"]
            return node.get_text(strip=True)
    for rx in _AUTHOR_TEXT_RES:
        match = element.find(text=rx)
        if match:
            m = rx.search(match)
            if m:
                return m.group(1)
    return None


def _extract_excerpt(element: Tag, selectors: Dict[str, str]) -> Optional[str]:
    """P28 (content.py:794-827)."""
    if "excerpt" in selectors:
        node = element.select_one(selectors["excerpt"])
        if node:
            return clean_text(node.get_text(strip=True))
    for selector in (
        "[itemprop='description']",
        "meta[name='description']",
        "meta[property='og:description']",
        ".excerpt",
        ".entry-summary",
        ".post-excerpt",
        ".summary",
        ".description",
        ".intro",
    ):
        node = element.select_one(selector)
        if node:
            if node.name == "meta" and node.has_attr("content"):
                return clean_text(node["content"])
            return clean_text(node.get_text(strip=True))
    first_p = element.find("p")
    if first_p:
        text = first_p.get_text(strip=True)
        if len(text) > 20:
            return clean_text(text)
    return None


CONTENT_SELECTORS = (
    "[itemprop='articleBody']",
    ".entry-content",
    ".post-content",
    ".article-content",
    ".content",
    "article",
    ".post-body",
    "#content",
)


def _extract_content(element: Tag, selectors: Dict[str, str]) -> Optional[str]:
    """P29 — THE byte-identity path (content.py:829-862)."""
    if "content" in selectors:
        node = element.select_one(selectors["content"])
        if node:
            return clean_text(node.get_text(strip=True))
    for selector in CONTENT_SELECTORS:
        node = element.select_one(selector)
        if node:
            if len(node.get_text(strip=True)) < 100:
                continue
            return clean_text(node.get_text(strip=True))
    paragraphs = element.find_all("p")
    if len(paragraphs) >= 3:
        content = " ".join(
            p.get_text(strip=True) for p in paragraphs if len(p.get_text(strip=True)) > 20
        )
        if content and len(content) > 200:
            return clean_text(content)
    return None


def _img_src(node: Tag, base_url: str) -> Optional[str]:
    if node.name == "img" and node.has_attr("src"):
        src = node["src"]
    elif node.name == "meta" and node.has_attr("content"):
        src = node["content"]
    else:
        return None
    if not src.startswith(("http://", "https://", "data:")):
        src = urljoin(base_url, src)
    return src


def _extract_featured_image(
    element: Tag, base_url: str, selectors: Dict[str, str]
) -> Optional[str]:
    """P30 (content.py:864-916)."""
    if "image" in selectors:
        node = element.select_one(selectors["image"])
        if node:
            src = _img_src(node, base_url)
            if src:
                return src
    for selector in (
        "meta[property='og:image']",
        "meta[name='twitter:image']",
        "[itemprop='image']",
        ".featured-image img",
        ".post-thumbnail img",
        ".entry-image img",
        "article img:first-of-type",
        ".wp-post-image",
    ):
        node = element.select_one(selector)
        if node:
            src = _img_src(node, base_url)
            if src:
                return src
    img = element.find("img", src=True)
    if img:
        src = img["src"]
        if not src.startswith(("http://", "https://", "data:")):
            src = urljoin(base_url, src)
        return src
    return None


def _collect_content_images(container: Tag, base_url: str) -> List[str]:
    images = []
    for img in container.find_all("img", src=True):
        src = img["src"]
        if src.startswith("data:") or "icon" in src.lower():
            continue
        if not src.startswith(("http://", "https://")):
            src = urljoin(base_url, src)
        images.append(src)
    return images


def _extract_content_images(
    element: Tag, base_url: str, selectors: Dict[str, str]
) -> List[str]:
    """P31 (content.py:918-970)."""
    if "content" in selectors:
        node = element.select_one(selectors["content"])
        if node:
            return _collect_content_images(node, base_url)
    for selector in (
        "[itemprop='articleBody']",
        ".entry-content",
        ".post-content",
        ".article-content",
        ".content",
        "article",
    ):
        node = element.select_one(selector)
        if node:
            return _collect_content_images(node, base_url)
    return _collect_content_images(element, base_url)


def _extract_categories(element: Tag, selectors: Dict[str, str]) -> List[str]:
    """P32 (content.py:972-1008) — configured selector short-circuits;
    conventional selectors dedup first-seen."""
    categories: List[str] = []
    if "categories" in selectors:
        cats = element.select(selectors["categories"])
        if cats:
            for cat in cats:
                text = cat.get_text(strip=True)
                if text:
                    categories.append(text)
            return categories
    for selector in (
        "[itemprop='keywords']",
        "[rel='category']",
        ".category",
        ".tag",
        ".categories",
        ".tags",
        ".post-category",
        ".post-tag",
        "meta[property='article:tag']",
    ):
        for cat in element.select(selector):
            if cat.name == "meta" and cat.has_attr("content"):
                text = cat["content"]
            else:
                text = cat.get_text(strip=True)
            if text and text not in categories:
                categories.append(text)
    return categories


def _extract_metadata(element: Tag, selectors: Dict[str, str]) -> Dict[str, str]:
    """P33 (content.py:1010-1053)."""
    metadata: Dict[str, str] = {}
    for meta in element.find_all("meta"):
        if meta.has_attr("property") and meta.has_attr("content"):
            prop = meta["property"]
            if prop.startswith("og:") or prop.startswith("article:"):
                metadata[prop.split(":")[-1]] = meta["content"]
        if meta.has_attr("name") and meta.has_attr("content"):
            name = meta["name"]
            if name.startswith("twitter:"):
                metadata[name.split(":")[-1]] = meta["content"]
            elif name in ("author", "description", "keywords"):
                metadata[name] = meta["content"]
    for selector in (".reading-time", ".read-time", "[itemprop='timeRequired']"):
        node = element.select_one(selector)
        if node:
            metadata["reading_time"] = node.get_text(strip=True)
            break
    if "content" in selectors:
        node = element.select_one(selectors["content"])
        if node:
            wc = len(node.get_text(strip=True).split())
            metadata["word_count"] = str(wc)
            if "reading_time" not in metadata:
                metadata["reading_time"] = f"{max(1, round(wc / 200))} min read"
    return metadata


# ---------------------------------------------------------------------------
# Projections (P22/P23) + merge rule (J1)
# ---------------------------------------------------------------------------


def extract_article_listing(
    element: Tag, base_url: str, cfg: ContentConfig
) -> Dict[str, Any]:
    """P22 (content.py:458-502)."""
    article: Dict[str, Any] = {"title": _extract_title(element, cfg.selectors)}
    if not article["title"]:
        return {}
    article["url"] = _extract_url(element, base_url, cfg.selectors)
    article["date"] = _extract_date(element, cfg.selectors)
    article["author"] = _extract_author(element, cfg.selectors)
    article["excerpt"] = _extract_excerpt(element, cfg.selectors)
    if cfg.extract_images:
        article["image"] = _extract_featured_image(element, base_url, cfg.selectors)
    article["categories"] = _extract_categories(element, cfg.selectors)
    article["fetch_full"] = bool(article.get("url") and not article.get("content"))
    return article


def extract_single_article(root: Tag, url: str, cfg: ContentConfig) -> Dict[str, Any]:
    """P23 (content.py:504-560)."""
    article: Dict[str, Any] = {"title": _extract_title(root, cfg.selectors)}
    if not article["title"]:
        return {}
    article["url"] = url
    article["date"] = _extract_date(root, cfg.selectors)
    article["author"] = _extract_author(root, cfg.selectors)
    article["content"] = _extract_content(root, cfg.selectors)
    if cfg.generate_summary and article["content"]:
        article["excerpt"] = summarize_text(article["content"], cfg.summary_length)
    else:
        article["excerpt"] = _extract_excerpt(root, cfg.selectors)
    if cfg.extract_images:
        article["image"] = _extract_featured_image(root, url, cfg.selectors)
        article["images"] = _extract_content_images(root, url, cfg.selectors)
    article["categories"] = _extract_categories(root, cfg.selectors)
    if cfg.extract_metadata:
        article["metadata"] = _extract_metadata(root, cfg.selectors)
    if cfg.extract_keywords and article["content"]:
        article["keywords"] = extract_keywords(article["content"], cfg.max_keywords)
    return article


def merge_listing_full(
    listing: Dict[str, Any], full: Dict[str, Any]
) -> Dict[str, Any]:
    """J1 merge: listing value wins when truthy (content.py:160-165)."""
    merged = dict(listing)
    merged.update({k: v for k, v in full.items() if k not in merged or not merged[k]})
    return merged


# ---------------------------------------------------------------------------
# Transform / validate (content.py:1074-1177)
# ---------------------------------------------------------------------------

_ISO_PREFIX_RE = re.compile(r"\d{4}-\d{2}-\d{2}")
_TRANSFORM_DATE_FORMATS = ["%d %B %Y", "%B %d, %Y", "%B %d %Y", "%Y/%m/%d", "%m/%d/%Y", "%d/%m/%Y"]


def normalize_date(date: Optional[str]) -> Optional[str]:
    """F18 (content.py:1103-1120)."""
    if not date:
        return date
    if _ISO_PREFIX_RE.match(date):
        return date
    for fmt in _TRANSFORM_DATE_FORMATS:
        try:
            return datetime.strptime(date, fmt).date().isoformat()
        except ValueError:
            continue
    return date


def transform_validate(
    articles: List[Dict[str, Any]], base_url: str, cfg: ContentConfig
) -> List[Dict[str, Any]]:
    """transform_data + validate_data (content.py:1087-1177), minus the
    wall-clock stamp."""
    out = []
    for article in articles:
        if not article or not article.get("title"):
            continue
        article["title"] = article["title"].strip()
        if not article.get("excerpt") and article.get("content"):
            article["excerpt"] = summarize_text(article["content"], cfg.summary_length)
        if article.get("date"):
            article["date"] = normalize_date(article["date"])
        if article.get("url") and not article["url"].startswith(("http://", "https://")):
            parsed = urlparse(base_url)
            article["url"] = urljoin(f"{parsed.scheme}://{parsed.netloc}", article["url"])
        # validate_data defaults (content.py:1153-1173)
        for key in ("url", "date", "author", "excerpt", "content", "image"):
            article.setdefault(key, None)
        article.setdefault("categories", [])
        out.append(article)
    return out


# ---------------------------------------------------------------------------
# Page-level entry points for the engine
# ---------------------------------------------------------------------------


def extract_articles(html, url: str, cfg: Optional[ContentConfig] = None) -> List[Dict[str, Any]]:
    """Single-page extraction: one full article if the page classifies
    as an article, else the listing projections (content.py:124-151,
    WITHOUT the nested full-article fetches/pagination — those are
    epoch-staged by the engine and replayed sequentially by the
    simulator)."""
    cfg = cfg or ContentConfig()
    root = minisoup.parse(html)
    if is_article_page(root):
        article = extract_single_article(root, url, cfg)
        return [article] if article else []
    articles = []
    for element in find_article_elements(root, cfg.selectors):
        item = extract_article_listing(element, url, cfg)
        if item:
            articles.append(item)
    return articles


def extract_outlinks(html, url: str, cfg: Optional[ContentConfig] = None) -> List[Dict[str, Any]]:
    """Frontier-growth links from a page: full-article URLs from listing
    items (content.py:151-156) and the next pagination page
    (content.py:177-186). Returns [{url, kind}] in discovery order —
    kind ∈ {'article', 'next_page'}."""
    cfg = cfg or ContentConfig()
    root = minisoup.parse(html)
    links: List[Dict[str, Any]] = []
    if not is_article_page(root):
        for element in find_article_elements(root, cfg.selectors):
            item = extract_article_listing(element, url, cfg)
            if item and item.get("url") and item.get("fetch_full"):
                links.append({"url": item["url"], "kind": "article"})
        if cfg.follow_next_page and cfg.max_pages > 1 and links:
            next_url = find_next_page(root, url)
            if next_url:
                links.append({"url": next_url, "kind": "next_page"})
    return links
