"""Sequential reference-semantics crawl simulator (SURVEY.md §5.2-2).

Replays the reference's strictly-sequential crawl (base.py:188 seed
loop; content.py:146-229 nested article fetches + pagination) over the
same in-memory page map the Spark engine crawls, parameterized by the
SAME policy spec (robots, max_depth, max_attempts — the reference's
`delay`/`max_concurrent` are declared-but-unenforced, SURVEY.md §2.9
T8, so politeness affects engine epoch composition but not ordering).

This is the parity oracle: the engine's seen-set must equal the
simulator's, the engine's ok-visit sequence sorted by ord_key must
equal the simulator's DFS visit order, and every extracted field —
including byte-identical article ``content`` — must match row-for-row.

Known scope (documented, exercised fixtures avoid it): when one URL is
discoverable via multiple pages, both sides visit it exactly once and
the seen SET matches, but the recorded discovery path may differ (the
engine keeps the earliest-epoch discovery, the sequential crawl the
DFS-first one).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Dict, List, Optional, Tuple

from ..extract.business import BusinessConfig, extract_businesses
from ..extract.content import (
    ContentConfig,
    extract_article_listing,
    extract_single_article,
    find_article_elements,
    find_next_page,
    is_article_page,
    merge_listing_full,
)
from ..extract.ecommerce import EcommerceConfig, extract_products
from .. import minisoup
from ..urlutils import canonicalize_url, host_of


@dataclass
class SimResult:
    visit_order: List[str] = dc_field(default_factory=list)  # ok fetches, DFS order
    ord_keys: Dict[str, str] = dc_field(default_factory=dict)
    seen: Dict[str, str] = dc_field(default_factory=dict)  # url → ok|failed
    depths: Dict[str, int] = dc_field(default_factory=dict)
    articles: List[Dict] = dc_field(default_factory=list)  # merged (J1) dicts
    products: List[Dict] = dc_field(default_factory=list)
    businesses: List[Dict] = dc_field(default_factory=list)


SEED_PAD = 5
POS_PAD = 5


def simulate_crawl(
    pages: Dict[str, bytes],
    seeds: List[Tuple[str, str]],
    robots: Optional[List[Dict]] = None,
    max_depth: int = 6,
    content_cfg: Optional[ContentConfig] = None,
    ecommerce_cfg: Optional[EcommerceConfig] = None,
    business_cfg: Optional[BusinessConfig] = None,
    respect_meta_robots: bool = False,
    max_outlinks_per_page=None,
) -> SimResult:
    content_cfg = content_cfg or ContentConfig(
        selectors={}, follow_next_page=True, max_pages=10**6
    )
    ecommerce_cfg = ecommerce_cfg or EcommerceConfig()
    business_cfg = business_cfg or BusinessConfig()
    disallow = {
        r["host"]: list(r.get("disallow_prefixes") or []) for r in (robots or [])
    }
    result = SimResult()

    def allowed(url: str) -> bool:
        from urllib.parse import urlparse

        prefixes = disallow.get(host_of(url), [])
        path = urlparse(url).path
        return not any(path.startswith(p) for p in prefixes)

    def visit(url: str, ord_key: str, depth: int, stype: str) -> None:
        url = canonicalize_url(url)
        if url in result.seen or depth > max_depth:
            return
        html = pages.get(url)
        if html is None:
            # reference: tenacity retries ×3 inside _fetch_page then the
            # URL lands in failed_urls (base.py:197-199); a static page
            # map fails identically every attempt.
            result.seen[url] = "failed"
            result.ord_keys[url] = ord_key
            result.depths[url] = depth
            return
        result.seen[url] = "ok"
        result.ord_keys[url] = ord_key
        result.depths[url] = depth
        result.visit_order.append(url)

        # REP robots meta (epoch.py respect_meta_robots twin): noindex
        # drops this page's extraction rows, nofollow drops its outlinks
        noindex = nofollow = False
        if respect_meta_robots:
            from ..operators.structured import parse_meta_robots

            noindex, nofollow = parse_meta_robots(html)

        if stype == "ecommerce":
            if not noindex:
                for pos, item in enumerate(
                    extract_products(html, url, ecommerce_cfg)
                ):
                    result.products.append(
                        {"src_url": url, "item_pos": pos, **item}
                    )
            return
        if stype == "business":
            if not noindex:
                for pos, item in enumerate(
                    extract_businesses(html, url, business_cfg)
                ):
                    result.businesses.append(
                        {"src_url": url, "item_pos": pos, **item}
                    )
            return

        # content: the reference's nested listing→article→pagination flow
        root = minisoup.parse(html)
        if is_article_page(root):
            item = extract_single_article(root, url, content_cfg)
            if item and not noindex:
                result.articles.append(
                    {"src_url": url, "item_pos": 0, "merge_kind": "full", **item}
                )
            return
        pos = 0
        listing_rows = []
        for element in find_article_elements(root, content_cfg.selectors):
            item = extract_article_listing(element, url, content_cfg)
            if not item:
                continue
            fetch_full = item.pop("fetch_full", False)
            listing_rows.append((pos, item, fetch_full))
            pos += 1
        next_pos = pos

        # fetch each article immediately after its listing row
        # (content.py:146-172), subject to the shared policy spec
        for pos, item, fetch_full in listing_rows:
            merged = dict(item)
            merge_kind = "listing"
            if (
                item.get("url")
                and fetch_full
                and not nofollow
                and (max_outlinks_per_page is None or pos < max_outlinks_per_page)
            ):
                child = canonicalize_url(item["url"])
                if allowed(child):
                    child_key = f"{ord_key}/{str(pos).zfill(POS_PAD)}"
                    visit(child, child_key, depth + 1, "content")
                    full = next(
                        (
                            a
                            for a in result.articles
                            if a.get("url") == child and a.get("merge_kind") == "full"
                        ),
                        None,
                    )
                    if full is not None:
                        payload = {
                            k: v
                            for k, v in full.items()
                            if k not in ("src_url", "item_pos", "merge_kind")
                        }
                        merged = merge_listing_full(item, payload)
                        merge_kind = "merged"
            if not noindex:
                result.articles.append(
                    {
                        "src_url": url,
                        "item_pos": pos,
                        "merge_kind": merge_kind,
                        **merged,
                    }
                )

        # pagination (content.py:177-229)
        if (
            content_cfg.follow_next_page
            and content_cfg.max_pages > 1
            and listing_rows
            and not nofollow
            and (max_outlinks_per_page is None or next_pos < max_outlinks_per_page)
        ):
            next_url = find_next_page(root, url)
            if next_url:
                child = canonicalize_url(next_url)
                if allowed(child):
                    child_key = f"{ord_key}/{str(next_pos).zfill(POS_PAD)}"
                    visit(child, child_key, depth + 1, "content")

    for i, (url, stype) in enumerate(seeds):
        visit(canonicalize_url(url), str(i).zfill(SEED_PAD), 0, stype)
    return result


def merged_articles(result: SimResult) -> List[Dict]:
    """The simulator's analog of crawl.epoch.merge_articles: merged rows
    replace their 'full' constituents; pure listing/full rows pass
    through. Keyed like the engine output for row-by-row comparison."""
    merged_urls = {
        a.get("url") for a in result.articles if a.get("merge_kind") == "merged"
    }
    out = []
    for a in result.articles:
        if a.get("merge_kind") == "full" and a.get("url") in merged_urls:
            continue  # absorbed into the merged row (engine join does this)
        out.append(a)
    return out
