"""Unit tests for the extraction cascades (SURVEY.md §2.2) over the
deterministic synthetic site (FIXTURES.md §5)."""

import pytest

from web_scrapper_spark import minisoup
from web_scrapper_spark.extract import (
    BusinessConfig,
    ContentConfig,
    EcommerceConfig,
    extract_articles,
    extract_businesses,
    extract_outlinks,
    extract_products,
    find_next_page,
    is_article_page,
)
from web_scrapper_spark.extract.business import format_phone, parse_phone
from web_scrapper_spark.extract.content import merge_listing_full, normalize_date
from web_scrapper_spark.extract.ecommerce import parse_price, parse_rating
from web_scrapper_spark.fixtures import SiteSpec, all_urls, page_html, seed_urls

SPEC = SiteSpec()


class TestPriceParse:
    """P4/F19 (ecommerce.py:307-327)."""

    @pytest.mark.parametrize(
        "text,expected",
        [
            ("$12.34", 12.34),
            ("12,34 €", 12.34),
            ("99", 99.0),
            ("Sale: 1.50 only", 1.50),
            ("no price", None),
            ("", None),
            (None, None),
        ],
    )
    def test_parse(self, text, expected):
        assert parse_price(text) == expected


class TestRatingParse:
    """P10 (ecommerce.py:492-528)."""

    @pytest.mark.parametrize(
        "text,expected",
        [
            ("4.5", 4.5),
            ("9", 4.5),       # >5 ≤10 halved
            ("9/10", 4.5),    # fraction → ×5
            ("★★★☆☆", 3.0),
            ("", None),
        ],
    )
    def test_parse(self, text, expected):
        assert parse_rating(text) == expected

    def test_float_branch_wins_over_fraction(self):
        # "4/5": float regex matches "4" first → 4.0 (reference order)
        assert parse_rating("4/5") == 4.0


class TestPhone:
    def test_parse_strips(self):
        cfg = BusinessConfig(validate_phones=False)
        assert parse_phone("(212) 867-5309", cfg) == "2128675309"

    @pytest.mark.parametrize(
        "digits,expected",
        [
            ("2128675309", "212-867-5309"),
            ("12128675309", "+1-212-867-5309"),
            ("+442071234567", "+442071234567"),
        ],
    )
    def test_format(self, digits, expected):
        assert format_phone(digits) == expected


class TestDateNormalize:
    @pytest.mark.parametrize(
        "raw,expected",
        [
            ("2025-07-18", "2025-07-18"),
            ("July 18, 2025", "2025-07-18"),
            ("18 July 2025", "2025-07-18"),
            ("07/18/2025", "2025-07-18"),
            ("gibberish", "gibberish"),  # kept on failure (content.py:1118-1120)
        ],
    )
    def test_normalize(self, raw, expected):
        assert normalize_date(raw) == expected


class TestMergeRule:
    """J1 (content.py:160-165): listing value wins when truthy."""

    def test_listing_wins_nonempty(self):
        merged = merge_listing_full(
            {"title": "L", "author": None, "excerpt": ""},
            {"title": "F", "author": "A", "excerpt": "E", "content": "C"},
        )
        assert merged == {"title": "L", "author": "A", "excerpt": "E", "content": "C"}


class TestProducts:
    def test_every_listing_page_extracts(self):
        for h in range(SPEC.n_hosts):
            for p in range(1, SPEC.products_pages_per_host + 1):
                url = (
                    f"{SPEC.base(h)}/products"
                    if p == 1
                    else f"{SPEC.base(h)}/products?page={p}"
                )
                products = extract_products(page_html(url, SPEC), url)
                assert len(products) >= 3, url
                for item in products:
                    assert item["name"]
                    assert item["availability"] != ""
                    assert isinstance(item["images"], list)

    def test_heuristic_fallback_page(self):
        # find a page whose container class was scrambled (r%7==0)
        from web_scrapper_spark.urlutils import murmur3_32

        fallback = [
            u
            for u in all_urls(SPEC)
            if "/products" in u and (murmur3_32(u.encode()) & 0x7FFFFFFF) % 7 == 0
        ]
        assert fallback, "spec too small to hit the fallback branch"
        for url in fallback:
            products = extract_products(page_html(url, SPEC), url)
            assert products, f"heuristic fallback failed on {url}"

    def test_prices_typed(self):
        url = f"{SPEC.base(0)}/products"
        for item in extract_products(page_html(url, SPEC), url):
            assert item["price"] is None or isinstance(item["price"], float)


class TestBusinesses:
    def test_extraction(self):
        url = f"{SPEC.base(1)}/directory"
        businesses = extract_businesses(page_html(url, SPEC), url)
        assert len(businesses) >= 3
        for b in businesses:
            assert b["name"]
            # blacklisted @example.com must have been nulled
            if b["email"]:
                assert not b["email"].endswith("@example.com")
            if b["phone"]:
                assert "-" in b["phone"] or b["phone"].startswith("+")
            assert "social_media" in b

    def test_website_tracking_stripped(self):
        url = f"{SPEC.base(2)}/directory"
        for b in extract_businesses(page_html(url, SPEC), url):
            if b["website"]:
                assert "?" not in b["website"] and "#" not in b["website"]


class TestContent:
    def test_listing_vs_article_classification(self):
        blog = f"{SPEC.base(0)}/blog"
        art = f"{SPEC.base(0)}/blog/post-1"
        assert not is_article_page(minisoup.parse(page_html(blog, SPEC)))
        assert is_article_page(minisoup.parse(page_html(art, SPEC)))

    def test_listing_extraction(self):
        url = f"{SPEC.base(0)}/blog"
        cfg = ContentConfig(selectors={})
        items = extract_articles(page_html(url, SPEC), url, cfg)
        # blog_page_size posts + the /private item injected on page 1
        assert len(items) == SPEC.blog_page_size + 1
        for item in items:
            assert item["title"].startswith(("Post ", "Private note"))
            assert item["url"].startswith(SPEC.base(0))
            assert item["fetch_full"] is True

    def test_article_extraction_full(self):
        url = f"{SPEC.base(0)}/blog/post-1"
        cfg = ContentConfig(selectors={})
        arts = extract_articles(page_html(url, SPEC), url, cfg)
        assert len(arts) == 1
        a = arts[0]
        assert a["content"] and len(a["content"]) > 200
        assert a["date"] and len(a["date"]) == 10
        assert a["author"]
        assert a["keywords"]
        assert a["metadata"]["type"] == "article"
        # duplicate category deduped first-seen (content.py:1005-1006)
        assert len(a["categories"]) == len(set(a["categories"]))
        # icon image excluded (content.py:929)
        assert all("icon" not in img for img in a["images"])

    def test_outlinks_and_pagination_styles(self):
        cfg = ContentConfig(selectors={}, follow_next_page=True, max_pages=99)
        for h in range(SPEC.n_hosts):
            url = f"{SPEC.base(h)}/blog"
            links = extract_outlinks(page_html(url, SPEC), url, cfg)
            kinds = [l["kind"] for l in links]
            assert kinds.count("article") >= 2
            if SPEC.blog_pages_per_host()[h] > 1:
                assert kinds[-1] == "next_page", f"pagination style {h % 4} failed"
                assert links[-1]["url"].endswith("/blog/page/2/")

    def test_next_page_query_style(self):
        url = f"{SPEC.base(0)}/products"
        root = minisoup.parse(page_html(url, SPEC))
        nxt = find_next_page(root, url)
        assert nxt == f"{SPEC.base(0)}/products?page=2"


class TestSiteGraph:
    def test_urls_unique(self):
        urls = all_urls(SPEC)
        assert len(urls) == len(set(urls))

    def test_seeds_subset_of_site(self):
        urls = set(all_urls(SPEC))
        assert all(s in urls for s in seed_urls(SPEC))

    def test_html_deterministic(self):
        url = f"{SPEC.base(0)}/blog/post-2"
        assert page_html(url, SPEC) == page_html(url, SPEC)
