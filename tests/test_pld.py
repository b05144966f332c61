"""Pay-level-domain (eTLD+1) politeness grain: frontier/pld.py."""

from pyspark.sql import functions as F

from web_scrapper_spark.frontier.pld import (
    PUBLIC_SUFFIXES,
    pld_budget_caps,
    registered_domain_col,
    registered_domains,
    subdomain_flood_report,
)

CASES = [
    ("www.example.co.uk", "example.co.uk"),
    ("a.b.example.com", "example.com"),
    ("example.com", "example.com"),
    ("foo.github.io", "foo.github.io"),
    ("deep.foo.github.io", "foo.github.io"),
    ("bucket.s3.amazonaws.com", "bucket.s3.amazonaws.com"),
    ("x.bucket.s3.amazonaws.com", "bucket.s3.amazonaws.com"),
    ("shop.example.com.au", "example.com.au"),
    # degenerate inputs: deterministic, never null
    ("com", "com"),
    ("co.uk", "co.uk"),
    ("localhost", "localhost"),
    ("sub.unknowntld.zz", "unknowntld.zz"),  # default "*" rule
]


class TestRegisteredDomain:
    def test_expression_path(self, spark):
        df = spark.createDataFrame([(h,) for h, _ in CASES], "host string")
        got = {
            r["host"]: r["pld"]
            for r in df.select(
                "host", registered_domain_col(F.col("host")).alias("pld")
            ).collect()
        }
        for host, want in CASES:
            assert got[host] == want, (host, got[host], want)

    def test_join_path_matches_expression(self, spark):
        """The full-PSL broadcast-join path and the literal-expression
        path implement the same algorithm — equal on every case."""
        df = spark.createDataFrame([(h,) for h, _ in CASES], "host string")
        got = {r["host"]: r["pld"] for r in registered_domains(df).collect()}
        for host, want in CASES:
            assert got[host] == want, (host, got[host], want)

    def test_longest_match_wins(self, spark):
        """s3.amazonaws.com (3 labels) must beat a hypothetical
        2-label match — exercised via the real list ordering."""
        assert "s3.amazonaws.com" in PUBLIC_SUFFIXES
        df = spark.createDataFrame([("b.s3.amazonaws.com",)], "host string")
        [r] = df.select(registered_domain_col(F.col("host")).alias("p")).collect()
        assert r["p"] == "b.s3.amazonaws.com"


class TestFloodAndCaps:
    def _frontier(self, spark):
        rows = []
        # spam PLD: 40 subdomains x 3 urls under flood.com
        for s in range(40):
            for u in range(3):
                rows.append(
                    (f"s{s}.flood.com", f"https://s{s}.flood.com/{u}",
                     1.0 - 0.001 * (s * 3 + u), 1, f"k{s:02d}{u}")
                )
        # healthy PLD: 2 subdomains x 5 urls
        for s in range(2):
            for u in range(5):
                rows.append(
                    (f"h{s}.ok.org", f"https://h{s}.ok.org/{u}",
                     0.5, 1, f"o{s}{u}")
                )
        return spark.createDataFrame(
            rows, "host string, url string, priority double, depth int, ord_key string"
        )

    def test_flood_report(self, spark):
        rep = {
            r["pld"]: r
            for r in subdomain_flood_report(
                self._frontier(spark), max_hosts_per_pld=32
            ).collect()
        }
        assert rep["flood.com"]["n_hosts"] == 40
        assert rep["flood.com"]["n_urls"] == 120
        assert rep["flood.com"]["flooded"] is True
        assert rep["ok.org"]["n_hosts"] == 2
        assert rep["ok.org"]["flooded"] is False

    def test_budget_caps_keep_top_priority(self, spark):
        capped = pld_budget_caps(self._frontier(spark), per_pld_budget=10)
        kept = capped.filter("pld_keep").groupBy("pld").count().collect()
        counts = {r["pld"]: r["count"] for r in kept}
        assert counts == {"flood.com": 10, "ok.org": 10}
        # the kept flood.com rows are exactly the 10 highest-priority
        top = (
            capped.filter("pld = 'flood.com' and pld_keep")
            .agg(F.min("priority").alias("mn"))
            .collect()[0]["mn"]
        )
        dropped_max = (
            capped.filter("pld = 'flood.com' and not pld_keep")
            .agg(F.max("priority").alias("mx"))
            .collect()[0]["mx"]
        )
        assert top > dropped_max


class TestEpochPldBudget:
    def test_pld_capped_crawl_converges_to_same_seen_set(self, spark, tmp_path):
        """CrawlConfig(pld_budget=k): the fixture site's three hosts all
        share one PLD (example-crawl.org), so every epoch fetches at
        most k URLs — and the crawl still drains to the identical final
        seen set, only over more epochs (pacing, not completeness)."""
        from web_scrapper_spark.crawl.epoch import CrawlConfig, CrawlEngine
        from web_scrapper_spark.fixtures import (
            SiteSpec,
            pages_dataframe,
            robots_dataframe,
            seed_urls,
        )
        from web_scrapper_spark.frontier.store import SnapshotStore

        spec = SiteSpec(n_hosts=2, n_articles=10, blog_page_size=5)
        pages = pages_dataframe(spark, spec)
        robots = robots_dataframe(spark, spec)
        seeds = [(u, "content") for u in seed_urls(spec) if u.endswith("/blog")]

        def run(cfg, name):
            store = SnapshotStore(str(tmp_path / name))
            eng = CrawlEngine(spark, store, pages, robots, cfg)
            eng.init(seeds)
            metrics = eng.run(max_epochs=60)
            seen = {r["url"]: r["status"] for r in eng.seen().collect()}
            return seen, metrics

        base_seen, base_metrics = run(CrawlConfig(), "base")
        cap_seen, cap_metrics = run(CrawlConfig(pld_budget=3), "capped")
        assert cap_seen == base_seen
        cap_epochs = [m for m in cap_metrics if m.get("epoch", -1) >= 0 and m.get("dequeued")]
        assert all(m["dequeued"] <= 3 for m in cap_epochs), cap_epochs
        base_epochs = [m for m in base_metrics if m.get("epoch", -1) >= 0 and m.get("dequeued")]
        assert len(cap_epochs) > len(base_epochs)
