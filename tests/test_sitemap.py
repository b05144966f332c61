"""Sitemap ingestion (frontier/sitemap.py)."""

import gzip

from pyspark.sql import functions as F

from web_scrapper_spark.frontier.sitemap import parse_sitemap_xml, sitemap_candidates

URLSET = b"""<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>https://h.org/a</loc><lastmod>2025-07-18</lastmod>
       <changefreq>daily</changefreq><priority>0.8</priority></url>
  <url><loc>https://h.org/b</loc><priority>1.5</priority></url>
  <url><lastmod>2025-01-01</lastmod></url>
  <url><loc>https://h.org/c</loc><changefreq>sometimes</changefreq></url>
</urlset>"""

INDEX = b"""<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>https://h.org/sitemap-1.xml</loc><lastmod>2025-07-01</lastmod></sitemap>
  <sitemap><loc>https://h.org/sitemap-2.xml</loc></sitemap>
</sitemapindex>"""


class TestParseSitemap:
    def test_urlset_fields_and_sanitation(self):
        rows = parse_sitemap_xml(URLSET, "https://h.org/sitemap.xml")
        assert [r["url"] for r in rows] == [
            "https://h.org/a", "https://h.org/b", "https://h.org/c",
        ]
        a = rows[0]
        assert a["kind"] == "url"
        assert a["lastmod"] == "2025-07-18"
        assert a["changefreq"] == "daily"
        assert a["priority_ppm"] == 800000
        # out-of-range priority and non-protocol changefreq are dropped
        assert rows[1]["priority_ppm"] is None
        assert rows[2]["changefreq"] is None
        # loc-less entry skipped; item_pos stays dense
        assert [r["item_pos"] for r in rows] == [0, 1, 2]

    def test_sitemapindex(self):
        rows = parse_sitemap_xml(INDEX)
        assert [(r["kind"], r["url"]) for r in rows] == [
            ("sitemap", "https://h.org/sitemap-1.xml"),
            ("sitemap", "https://h.org/sitemap-2.xml"),
        ]

    def test_gzip_transparent(self):
        assert parse_sitemap_xml(gzip.compress(URLSET))[0]["url"] == "https://h.org/a"

    def test_garbage_yields_empty(self):
        assert parse_sitemap_xml(b"not xml") == []
        assert parse_sitemap_xml(b"<html><body>nope</body></html>") == []
        assert parse_sitemap_xml(b"\x1f\x8btruncated-gzip") == []


class TestSitemapCandidates:
    def test_pages_table_to_candidates(self, spark):
        pages = spark.createDataFrame(
            [
                ("https://h.org/sitemap.xml", bytearray(URLSET)),
                ("https://i.org/sitemap.xml.gz", bytearray(gzip.compress(INDEX))),
                ("https://h.org/not-a-sitemap", bytearray(b"<html></html>")),
            ],
            "url string, html binary",
        )
        rows = sitemap_candidates(pages).orderBy("src_url", "item_pos").collect()
        # non-sitemap paths never reach the parser
        assert {r["src_url"] for r in rows} == {
            "https://h.org/sitemap.xml", "https://i.org/sitemap.xml.gz",
        }
        urls = [r["url"] for r in rows if r["kind"] == "url"]
        assert urls == ["https://h.org/a", "https://h.org/b", "https://h.org/c"]
        kids = [r["url"] for r in rows if r["kind"] == "sitemap"]
        assert kids == ["https://h.org/sitemap-1.xml", "https://h.org/sitemap-2.xml"]

    def test_priority_feeds_dequeue_order(self, spark):
        """Sitemap priority slots into the frontier's priority-desc
        window: higher-priority URLs win the host's politeness slots."""
        from web_scrapper_spark.frontier.core import (
            dequeue,
            with_frontier_columns,
        )

        entries = spark.createDataFrame(
            [
                (f"https://h.org/p{i}", "content", 1, str(i).zfill(5), i * 100000)
                for i in range(10)
            ],
            "url string, stype string, depth int, ord_key string, priority_ppm int",
        )
        frontier = with_frontier_columns(
            entries.select("url", "stype", "depth", "ord_key"), epoch=0
        ).drop("priority").join(
            entries.select(
                "url", (F.col("priority_ppm") / 1e6).alias("priority")
            ),
            "url",
        )
        robots = spark.createDataFrame(
            [("h.org", [], 2.0)],
            "host string, disallow_prefixes array<string>, crawl_delay double",
        )
        batch = dequeue(frontier, robots, epoch_seconds=8.0, default_delay=2.0)
        got = sorted(r["url"] for r in batch.collect())
        # budget 4 → the four highest sitemap priorities (p6..p9)
        assert got == [f"https://h.org/p{i}" for i in (6, 7, 8, 9)]


def test_discovered_urls_join_the_parse_set(spark):
    """Robots-declared sitemaps at non-default paths are parsed too."""
    from web_scrapper_spark.frontier.sitemap import sitemap_candidates

    sm = (
        '<?xml version="1.0"?><urlset xmlns="x">'
        "<url><loc>https://h.org/p1</loc></url></urlset>"
    )
    pages = spark.createDataFrame(
        [
            ("https://h.org/weird/path/news-map.xml", bytearray(sm.encode())),
            ("https://h.org/sitemap.xml", bytearray(sm.encode())),
            ("https://h.org/other", bytearray(b"<html></html>")),
        ],
        "url string, html binary",
    )
    urls = spark.createDataFrame(
        [("https://h.org/weird/path/news-map.xml",)], "url string"
    )
    got = sitemap_candidates(pages, sitemap_urls=urls)
    srcs = sorted(r["src_url"] for r in got.collect())
    assert srcs == [
        "https://h.org/sitemap.xml",
        "https://h.org/weird/path/news-map.xml",
    ]


class TestSitemapCoverage:
    def test_rollup(self, spark):
        from web_scrapper_spark.frontier.sitemap import sitemap_coverage

        entries = spark.createDataFrame(
            [(u,) for u in (
                "https://a.org/1", "https://a.org/1",  # dup declaration
                "https://a.org/2", "https://a.org/3", "https://b.org/1",
            )],
            "url string",
        )
        seen = spark.createDataFrame(
            [(u,) for u in (
                "https://a.org/1", "https://a.org/9", "https://c.org/1",
            )],
            "url string",
        )
        got = {r["host"]: r for r in sitemap_coverage(entries, seen).collect()}
        a = got["a.org"]
        assert (a["n_declared"], a["n_declared_crawled"]) == (3, 1)
        assert a["n_crawled_undeclared"] == 1
        assert a["coverage_ppm"] == 333333
        assert got["b.org"]["coverage_ppm"] == 0
        # host crawled but never declared anything
        c = got["c.org"]
        assert (c["n_declared"], c["n_crawled_undeclared"], c["coverage_ppm"]) == (0, 1, 0)
