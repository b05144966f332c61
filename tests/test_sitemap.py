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

    def test_truncated_gzip_member_yields_empty(self):
        # valid gzip header but the member is cut off mid-stream
        # (connection dropped mid-transfer) — raises EOFError from
        # gzip.decompress, which must be swallowed, not propagated
        # out of the Arrow parse task
        assert parse_sitemap_xml(gzip.compress(URLSET)[:-5]) == []


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


class TestSitemapWriter:
    """write_sitemap / build_sitemap_xml: publish shards + index, read
    back with the module's own parser (roundtrip)."""

    def test_roundtrip_with_sharding_and_index(self, spark, tmp_path):
        import os

        from web_scrapper_spark.frontier.sitemap import (
            parse_sitemap_xml, write_sitemap,
        )

        urls = spark.createDataFrame(
            [(f"https://a.org/p/{i:03d}",
              f"2025-07-{i % 28 + 1:02d}",
              "daily" if i % 2 else "weekly",
              (i % 10) * 100_000)
             for i in range(7)],
            "url string, lastmod string, changefreq string, priority_ppm int",
        )
        d = str(tmp_path / "sm")
        manifest = write_sitemap(urls, d, "https://a.org", max_per_file=3)
        assert [m["entries"] for m in manifest] == [3, 3, 1]

        # index lists every shard
        idx = parse_sitemap_xml(
            open(os.path.join(d, "sitemap_index.xml"), "rb").read()
        )
        assert [e["kind"] for e in idx] == ["sitemap"] * 3
        assert idx[0]["url"] == "https://a.org/sitemap-00000.xml"

        # shards parse back with every field intact, in url order
        got = []
        for m in manifest:
            got += parse_sitemap_xml(open(os.path.join(d, m["file"]), "rb").read())
        assert [e["url"] for e in got] == sorted(
            f"https://a.org/p/{i:03d}" for i in range(7)
        )
        assert got[1]["changefreq"] == "daily" and got[0]["changefreq"] == "weekly"
        assert got[3]["priority_ppm"] == 300_000
        assert got[5]["lastmod"] == "2025-07-06"

    def test_rerun_is_byte_identical(self, spark, tmp_path):
        import os

        from web_scrapper_spark.frontier.sitemap import write_sitemap

        urls = spark.createDataFrame(
            [(f"https://b.org/{i}",) for i in range(5)], "url string"
        ).repartition(3)
        d1, d2 = str(tmp_path / "x"), str(tmp_path / "y")
        write_sitemap(urls, d1, "https://b.org")
        write_sitemap(urls, d2, "https://b.org")
        for name in os.listdir(d1):
            assert (
                open(os.path.join(d1, name), "rb").read()
                == open(os.path.join(d2, name), "rb").read()
            )

    def test_bad_max_per_file(self, spark, tmp_path):
        import pytest as _pytest

        from web_scrapper_spark.frontier.sitemap import write_sitemap

        df = spark.createDataFrame([("https://x/",)], "url string")
        with _pytest.raises(ValueError):
            write_sitemap(df, str(tmp_path / "z"), "https://x", max_per_file=0)


class TestSitemapSeeding:
    """CrawlEngine.init_from_sitemaps — production cold-start path."""

    def _pages(self, spark):
        import datetime as dt

        from web_scrapper_spark.fixtures import SiteSpec, all_urls, page_html
        from web_scrapper_spark.fixtures.sitegen import PAGES_SCHEMA
        from web_scrapper_spark.frontier.sitemap import build_sitemap_xml

        spec = SiteSpec()
        pm = {u: page_html(u, spec).encode("utf-8") for u in all_urls(spec)}
        h0 = "https://host0.example-crawl.org"
        h1 = "https://host1.example-crawl.org"
        # host0: default-path sitemap INDEX → child at a non-default path
        pm[f"{h0}/sitemap.xml"] = build_sitemap_xml(
            [{"url": f"{h0}/maps/a.xml"}], kind="sitemap"
        )
        pm[f"{h0}/maps/a.xml"] = build_sitemap_xml(
            [
                {"url": f"{h0}/blog/post-1", "priority_ppm": 900_000},
                {"url": f"{h0}/blog/post-2", "priority_ppm": 100_000},
            ]
        )
        # host1: sitemap declared ONLY via robots Sitemap: line
        pm[f"{h1}/maps/m1.xml"] = build_sitemap_xml(
            [{"url": f"{h1}/blog/post-1"}]
        )
        rows = [
            (u, dt.datetime(2025, 1, 1), h, None, None) for u, h in pm.items()
        ]
        return spark.createDataFrame(rows, PAGES_SCHEMA), spec

    def _robots(self, spark, spec):
        from web_scrapper_spark.fixtures import robots_rules

        rows = [
            (
                r["host"],
                r["disallow_prefixes"],
                r["crawl_delay"],
                ["https://host1.example-crawl.org/maps/m1.xml"]
                if r["host"] == "host1.example-crawl.org"
                else [],
            )
            for r in robots_rules(spec)
        ]
        return spark.createDataFrame(
            rows,
            "host string, disallow_prefixes array<string>, "
            "crawl_delay double, sitemaps array<string>",
        )

    def test_seeds_entries_with_priority_order(self, spark, tmp_path):
        from web_scrapper_spark.crawl.epoch import CrawlConfig, CrawlEngine
        from web_scrapper_spark.frontier.store import SnapshotStore

        pages, spec = self._pages(spark)
        store = SnapshotStore(str(tmp_path / "sm-store"))
        engine = CrawlEngine(
            spark, store, pages, self._robots(spark, spec), CrawlConfig()
        )
        rounds = engine.init_from_sitemaps(
            extra_seeds=[("https://host2.example-crawl.org/blog", "content")]
        )
        assert rounds == 1  # one index recursion (host0 child)
        frontier = {
            r["url"]: r["ord_key"]
            for r in engine.frontier().select("url", "ord_key").collect()
        }
        h0 = "https://host0.example-crawl.org"
        h1 = "https://host1.example-crawl.org"
        assert f"{h0}/blog/post-1" in frontier
        assert f"{h0}/blog/post-2" in frontier
        assert f"{h1}/blog/post-1" in frontier
        assert "https://host2.example-crawl.org/blog" in frontier
        # priority 0.9 dequeues before default 0.5 before 0.1;
        # explicit extra seeds come last (z-prefixed)
        assert frontier[f"{h0}/blog/post-1"] < frontier[f"{h1}/blog/post-1"]
        assert frontier[f"{h1}/blog/post-1"] < frontier[f"{h0}/blog/post-2"]
        assert frontier[f"{h0}/blog/post-2"] < frontier[
            "https://host2.example-crawl.org/blog"
        ]
        # the crawl actually proceeds from sitemap seeds
        results = engine.run(max_epochs=30)
        assert results[-1]["done"]
        seen = {r["url"]: r["status"] for r in engine.seen().collect()}
        assert seen.get(f"{h0}/blog/post-1") == "ok"
        assert seen.get(f"{h1}/blog/post-1") == "ok"
        # sitemap documents themselves were never enqueued
        assert f"{h0}/sitemap.xml" not in seen
        assert f"{h0}/maps/a.xml" not in seen

    def test_cross_sitemap_duplicate_is_deterministic(self, spark, tmp_path):
        """A URL declared by TWO sitemaps (different priorities) seeds
        exactly once, with the min-ord_key (highest-priority) row —
        not a partition-order-dependent arbitrary pick."""
        import datetime as dt

        from web_scrapper_spark.crawl.epoch import CrawlConfig, CrawlEngine
        from web_scrapper_spark.fixtures.sitegen import PAGES_SCHEMA
        from web_scrapper_spark.frontier.sitemap import build_sitemap_xml
        from web_scrapper_spark.frontier.store import SnapshotStore

        h = "https://dup.example-crawl.org"
        pm = {
            f"{h}/sitemap.xml": build_sitemap_xml(
                [{"url": f"{h}/maps/a.xml"}, {"url": f"{h}/maps/b.xml"}],
                kind="sitemap",
            ),
            # same URL in both children, opposite priorities; each
            # child also pads the shared URL to a different item_pos
            f"{h}/maps/a.xml": build_sitemap_xml(
                [
                    {"url": f"{h}/page", "priority_ppm": 100_000},
                    {"url": f"{h}/only-a", "priority_ppm": 500_000},
                ]
            ),
            f"{h}/maps/b.xml": build_sitemap_xml(
                [
                    {"url": f"{h}/only-b", "priority_ppm": 500_000},
                    {"url": f"{h}/page", "priority_ppm": 900_000},
                ]
            ),
        }
        rows = [
            (u, dt.datetime(2025, 1, 1), blob, None, None)
            for u, blob in pm.items()
        ]
        pages = spark.createDataFrame(rows, PAGES_SCHEMA)
        expected_key = None
        for run in range(2):
            store = SnapshotStore(str(tmp_path / f"dup-store-{run}"))
            engine = CrawlEngine(spark, store, pages, None, CrawlConfig())
            engine.init_from_sitemaps()
            got = engine.frontier().filter(F.col("url") == f"{h}/page")
            keys = [r["ord_key"] for r in got.collect()]
            assert len(keys) == 1  # deduped
            # 0.9 beats 0.1: ord_key starts with 1e6-900000 = 100000
            assert keys[0].startswith("0100000/")
            if expected_key is None:
                expected_key = keys[0]
            else:
                assert keys[0] == expected_key  # rerun byte-stable
