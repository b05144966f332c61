"""S2/S3: session/header/proxy setup and UA rotation
(web_scrapper_spark/crawl/fetchpolicy.py; reference scrapers/base.py:
40-75, utils/user_agents.py:56-137)."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from web_scrapper_spark.config import ConfigError, bind_job
from web_scrapper_spark.crawl.fetchpolicy import (
    DEFAULT_USER_AGENTS,
    FetchPolicy,
    user_agent_col,
    with_fetch_metadata,
)


def _reqs(spark, n=64, hosts=4):
    df = spark.range(n).select(
        F.col("id").alias("rid"),
        F.concat(
            F.lit("https://h"), (F.col("id") % hosts).cast("string"),
            F.lit(".example.org/p/"), F.col("id").cast("string"),
        ).alias("url"),
        F.concat(
            F.lit("h"), (F.col("id") % hosts).cast("string"), F.lit(".example.org")
        ).alias("host"),
    )
    win = Window.partitionBy("host").orderBy("rid")
    return df.withColumn("host_rank", F.row_number().over(win))


class TestUserAgentRotation:
    def test_hash_mode_deterministic(self, spark):
        p = FetchPolicy()
        a = _reqs(spark).select("rid", user_agent_col(p, 3).alias("ua")).collect()
        b = _reqs(spark).select("rid", user_agent_col(p, 3).alias("ua")).collect()
        assert sorted(a) == sorted(b)
        assert all(r["ua"] in DEFAULT_USER_AGENTS for r in a)

    def test_hash_mode_spreads_over_pool(self, spark):
        p = FetchPolicy()
        rows = _reqs(spark, n=256).select(user_agent_col(p, 0).alias("ua")).collect()
        # 256 urls over a 12-entry pool: expect wide coverage
        assert len({r["ua"] for r in rows}) >= 8

    def test_hash_mode_varies_by_epoch(self, spark):
        p = FetchPolicy()
        df = _reqs(spark)
        both = df.select(
            user_agent_col(p, 1).alias("e1"), user_agent_col(p, 2).alias("e2")
        ).collect()
        assert any(r["e1"] != r["e2"] for r in both)

    def test_sequential_cycles_pool_per_host(self, spark):
        p = FetchPolicy(rotation="sequential")
        n = len(p.user_agents)
        rows = (
            _reqs(spark, n=n * 4, hosts=1)
            .select("host_rank", user_agent_col(p, 0, rank_col="host_rank").alias("ua"))
            .collect()
        )
        by_rank = {r["host_rank"]: r["ua"] for r in rows}
        # rank r gets pool[(r-1) % n]: full cycle then wrap
        for r, ua in by_rank.items():
            assert ua == p.user_agents[(r - 1) % n]

    def test_small_pool_and_validation(self, spark):
        p = FetchPolicy(user_agents=["only-ua"])
        rows = _reqs(spark, n=8).select(user_agent_col(p, 0).alias("ua")).collect()
        assert {r["ua"] for r in rows} == {"only-ua"}
        assert FetchPolicy(user_agents=[]).user_agents  # falls back, non-empty
        with pytest.raises(ValueError):
            FetchPolicy(rotation="roulette")


class TestSessionProxyHeaders:
    def test_session_per_host_epoch(self, spark):
        p = FetchPolicy()
        out = with_fetch_metadata(_reqs(spark), p, epoch=5)
        per_host = (
            out.groupBy("host")
            .agg(F.countDistinct("session_id").alias("n"))
            .collect()
        )
        assert all(r["n"] == 1 for r in per_host)
        out2 = with_fetch_metadata(_reqs(spark), p, epoch=6)
        s5 = {r["session_id"] for r in out.select("session_id").collect()}
        s6 = {r["session_id"] for r in out2.select("session_id").collect()}
        assert s5.isdisjoint(s6)

    def test_proxy_sticky_per_host(self, spark):
        p = FetchPolicy(proxies=["p1", "p2", "p3"])
        out = with_fetch_metadata(_reqs(spark), p, epoch=0)
        per_host = (
            out.groupBy("host").agg(F.countDistinct("proxy").alias("n")).collect()
        )
        assert all(r["n"] == 1 for r in per_host)

    def test_no_proxies_gives_null(self, spark):
        out = with_fetch_metadata(_reqs(spark, n=4), FetchPolicy(), epoch=0)
        assert all(r["proxy"] is None for r in out.select("proxy").collect())

    def test_header_line_renders_sorted_with_cookie_and_ua(self, spark):
        p = FetchPolicy(
            headers={"Accept": "text/html", "X-A": "1"},
            cookies={"b": "2", "a": "1"},
        )
        row = with_fetch_metadata(_reqs(spark, n=1), p, epoch=0).first()
        lines = row["header_line"].split("\r\n")
        assert lines[0] == "Accept: text/html"
        assert lines[1] == "Cookie: a=1; b=2"
        assert lines[2] == "X-A: 1"
        assert lines[3] == "User-Agent: " + row["user_agent"]


class TestConfigBinding:
    def _cfg(self, extra):
        scraper = {
            "type": "content",
            "urls": ["https://h0.example.org/blog"],
            "selectors": {"content": ".entry-content"},
            "output": {"format": "json", "path": "/tmp/out.json"},
        }
        scraper.update(extra)
        return {"scraper": scraper}

    def test_no_session_keys_means_no_policy(self):
        assert bind_job(self._cfg({})).fetch_policy is None

    def test_single_user_agent(self):
        job = bind_job(self._cfg({"user_agent": "my-bot/1.0"}))
        assert job.fetch_policy.user_agents == ["my-bot/1.0"]

    def test_pool_proxy_headers_cookies(self):
        job = bind_job(
            self._cfg(
                {
                    "user_agents": ["a", "b"],
                    "ua_rotation": "sequential",
                    "proxy": "http://egress:3128",
                    "headers": {"Accept": "text/html"},
                    "cookies": {"sid": "x"},
                }
            )
        )
        p = job.fetch_policy
        assert p.user_agents == ["a", "b"]
        assert p.rotation == "sequential"
        assert p.proxies == ["http://egress:3128"]
        assert p.headers == {"Accept": "text/html"}
        assert p.cookies == {"sid": "x"}
        assert job.crawl_config().fetch_policy is p

    def test_bad_rotation_rejected(self):
        with pytest.raises(ConfigError):
            bind_job(self._cfg({"ua_rotation": "nope"}))

    def test_bad_headers_rejected(self):
        with pytest.raises(ConfigError):
            bind_job(self._cfg({"headers": ["not-a-map"]}))


class TestEpochIntegration:
    def test_fetch_log_committed_with_rotated_uas(self, spark, tmp_path):
        import tempfile

        from web_scrapper_spark.crawl.epoch import CrawlConfig, CrawlEngine
        from web_scrapper_spark.extract.content import ContentConfig
        from web_scrapper_spark.fixtures import SiteSpec, pages_dataframe
        from web_scrapper_spark.frontier.store import SnapshotStore

        spec = SiteSpec(n_hosts=2, n_articles=40, blog_page_size=10)
        pages = pages_dataframe(spark, spec, num_partitions=4)
        seeds = [(f"{spec.base(h)}/blog", "content") for h in range(2)]
        cfg = CrawlConfig(
            epoch_seconds=8.0,
            default_delay=0.01,
            content=ContentConfig(
                selectors={"content": ".entry-content"}, follow_next_page=True,
                max_pages=100,
            ),
            fetch_policy=FetchPolicy(proxies=["p1", "p2"]),
        )
        store = SnapshotStore(str(tmp_path / "store"))
        engine = CrawlEngine(spark, store, pages, None, cfg)
        engine.init(seeds)
        engine.run(max_epochs=3)

        log = spark.read.parquet(
            str(tmp_path / "store" / "fetch_log" / "snap-*")
        )
        rows = log.collect()
        assert rows, "fetch_log table must have rows"
        assert {r["epoch"] for r in rows} >= {0}
        assert all(r["user_agent"] in DEFAULT_USER_AGENTS for r in rows)
        assert all(r["proxy"] in ("p1", "p2") for r in rows)
        # session ids change across epochs for the same host
        per_he = (
            log.groupBy("host", "epoch")
            .agg(F.countDistinct("session_id").alias("n"))
            .collect()
        )
        assert all(r["n"] == 1 for r in per_he)

    def test_no_policy_means_no_fetch_log(self, spark, tmp_path):
        from web_scrapper_spark.crawl.epoch import CrawlConfig, CrawlEngine
        from web_scrapper_spark.extract.content import ContentConfig
        from web_scrapper_spark.fixtures import SiteSpec, pages_dataframe
        from web_scrapper_spark.frontier.store import SnapshotStore

        spec = SiteSpec(n_hosts=1, n_articles=10, blog_page_size=10)
        pages = pages_dataframe(spark, spec, num_partitions=2)
        cfg = CrawlConfig(
            epoch_seconds=8.0, default_delay=0.01,
            content=ContentConfig(selectors={}, follow_next_page=False, max_pages=1),
        )
        store = SnapshotStore(str(tmp_path / "store"))
        engine = CrawlEngine(spark, store, pages, None, cfg)
        engine.init([(f"{spec.base(0)}/blog", "content")])
        engine.run(max_epochs=2)
        assert "fetch_log" not in store.manifest()["tables"]


class TestRevalidation:
    """Conditional refetch: validator headers + 304/200 classification
    (crawl/fetchpolicy.py revalidation_*)."""

    def _frames(self, spark):
        from datetime import datetime

        captures = spark.createDataFrame(
            [
                ("u1", datetime(2026, 1, 1, 6), "d1-old"),
                ("u1", datetime(2026, 1, 2, 6), "d1-new"),
                ("u2", datetime(2026, 1, 1, 7), "d2"),
                ("u3", datetime(2026, 1, 1, 8), "d3"),
            ],
            "url string, warc_ts timestamp, digest string",
        )
        due = spark.createDataFrame(
            [("u1",), ("u2",), ("u3",), ("u4",)], "url string"
        )
        return captures, due

    def test_headers_latest_capture_wins(self, spark):
        from web_scrapper_spark.crawl.fetchpolicy import revalidation_headers

        captures, due = self._frames(spark)
        hdr = {r["url"]: r for r in revalidation_headers(captures, due).collect()}
        assert hdr["u1"]["if_none_match"] == '"d1-new"'
        assert hdr["u1"]["if_modified_since"] == "Fri, 02 Jan 2026 06:00:00 GMT"
        assert hdr["u2"]["if_none_match"] == '"d2"'
        # no capture history -> unconditional fetch
        assert hdr["u4"]["if_none_match"] is None
        assert hdr["u4"]["if_modified_since"] is None

    def test_outcomes_304_and_byte_accounting(self, spark):
        from web_scrapper_spark.crawl.fetchpolicy import (
            revalidation_headers,
            revalidation_outcomes,
        )

        captures, due = self._frames(spark)
        hdr = revalidation_headers(captures, due)
        responses = spark.createDataFrame(
            [
                ("u1", "d1-new", 100),  # matches latest -> 304
                ("u2", "d2-changed", 70),  # changed -> 200
                ("u3", "d3", 50),  # unchanged -> 304
                ("u4", "d4", 30),  # no validator -> 200
            ],
            "url string, digest string, n_bytes long",
        )
        out = {
            r["url"]: r
            for r in revalidation_outcomes(hdr, responses).collect()
        }
        assert (out["u1"]["status"], out["u1"]["bytes_saved"]) == (304, 100)
        assert (out["u2"]["status"], out["u2"]["bytes_fetched"]) == (200, 70)
        assert (out["u3"]["status"], out["u3"]["bytes_saved"]) == (304, 50)
        assert (out["u4"]["status"], out["u4"]["bytes_fetched"]) == (200, 30)

    def test_report_rollup_ppm(self, spark):
        from web_scrapper_spark.crawl.fetchpolicy import revalidation_report

        outcomes = spark.createDataFrame(
            [
                ("ha", 304, 0, 75),
                ("ha", 200, 25, 0),
                ("hb", 200, 40, 0),
            ],
            "host string, status int, bytes_fetched long, bytes_saved long",
        )
        rep = {r["group"]: r for r in revalidation_report(outcomes).collect()}
        assert rep["ha"]["n_requests"] == 2
        assert rep["ha"]["n_not_modified"] == 1
        assert rep["ha"]["saved_ppm"] == 750_000  # 75 / (75+25)
        assert rep["hb"]["saved_ppm"] == 0
