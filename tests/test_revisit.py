"""CrawlEngine.enqueue_revisits — freshness-driven recrawl epochs.

The engine's continuous-crawl surface (Nutch adaptive-fetch-schedule
analog): after a wave drains, sitemap changefreq/lastmod hints decide
which seen urls are DUE and re-enter the frontier; the refetch appends
a second seen row (multi-capture history, like WARC revisit records).
"""

import tempfile

import pytest
from pyspark.sql import functions as F

from web_scrapper_spark.crawl.epoch import CrawlConfig, CrawlEngine
from web_scrapper_spark.fixtures.sitegen import PAGES_SCHEMA, SiteSpec, page_html
from web_scrapper_spark.frontier.store import SnapshotStore

HOST = "rv.example-crawl.org"
N_URLS = 12


def _urls():
    return [f"https://{HOST}/p{i:02d}" for i in range(N_URLS)]


def _pages(spark, urls=None):
    spec = SiteSpec()
    urls = urls if urls is not None else _urls()
    bodies = [
        page_html(
            f"https://host0.example-crawl.org/blog/post-{i % 5}", spec
        ).encode("utf-8")
        for i in range(len(urls))
    ]
    return spark.createDataFrame(
        [(u, None, b, None, None) for u, b in zip(urls, bodies)], PAGES_SCHEMA
    )


def _robots(spark):
    return spark.createDataFrame(
        [(HOST, [], 0.01)],
        "host string, disallow_prefixes array<string>, crawl_delay double",
    )


def _engine(spark, urls=None, pages=None):
    store = SnapshotStore(tempfile.mkdtemp(prefix="wss-rv-"))
    eng = CrawlEngine(
        spark,
        store,
        pages if pages is not None else _pages(spark, urls),
        _robots(spark),
        CrawlConfig(max_depth=0),
    )
    eng.init([(u, "content") for u in (urls if urls is not None else _urls())])
    return eng


def _hints(spark, rows):
    return spark.createDataFrame(
        rows, "url string, lastmod string, changefreq string, priority_ppm int"
    )


class TestEnqueueRevisits:
    def test_due_urls_refetched_with_multicapture_seen(self, spark):
        eng = _engine(spark)
        eng.run(max_epochs=5)
        hints = _hints(
            spark,
            [(u, None, "always", None) for i, u in enumerate(_urls()) if i % 3 == 0],
        )
        # non-hinted urls: default 168h / 24h = 7 epochs -> not due yet
        n = eng.enqueue_revisits(hints=hints)
        assert n == 4
        results = eng.run(max_epochs=5)
        assert [r["dequeued"] for r in results if not r.get("done")] == [4]
        seen = eng.seen().select("url", "status", "fetched_epoch").collect()
        per_url = {}
        for r in seen:
            per_url.setdefault(r["url"], []).append(
                (r["fetched_epoch"], r["status"])
            )
        for i, u in enumerate(_urls()):
            if i % 3 == 0:
                assert sorted(per_url[u]) == [(0, "ok"), (2, "ok")]
            else:
                assert per_url[u] == [(0, "ok")]
        eng.close()

    def test_nothing_due_is_a_noop(self, spark):
        eng = _engine(spark)
        eng.run(max_epochs=5)
        epoch_before = eng._epoch
        # default period (7 epochs) not reached, no hints
        assert eng.enqueue_revisits() == 0
        assert eng._epoch == epoch_before
        assert eng.run(max_epochs=2)[0].get("done")
        eng.close()

    def test_default_period_due_after_enough_epochs(self, spark):
        eng = _engine(spark)
        eng.run(max_epochs=5)
        # hint-less default: 168h at 1h per epoch = due 168 epochs after
        # fetch; with 24h epochs it's 7 — force due NOW via epoch_hours
        # large enough that period floors at 1
        n = eng.enqueue_revisits(epoch_hours=10_000)
        assert n == N_URLS
        eng.run(max_epochs=5)
        counts = (
            eng.seen().groupBy("url").count().select("count").distinct().collect()
        )
        assert [r["count"] for r in counts] == [2]
        eng.close()

    def test_failed_urls_stay_parked(self, spark):
        urls = _urls()
        # last url absent from pages -> fetch miss -> parked after
        # max_attempts
        eng = _engine(spark, urls=urls, pages=_pages(spark, urls[:-1]))
        eng.run(max_epochs=8)
        statuses = {
            r["url"]: r["status"]
            for r in eng.seen().select("url", "status").collect()
        }
        assert statuses[urls[-1]] == "failed"
        n = eng.enqueue_revisits(epoch_hours=10_000)
        assert n == N_URLS - 1  # failed url not revisit-eligible
        eng.run(max_epochs=5)
        failed_rows = (
            eng.seen().filter(F.col("url") == urls[-1]).count()
        )
        assert failed_rows == 1  # still exactly the parked row
        eng.close()

    def test_parked_after_success_is_terminal(self, spark):
        # a url whose LATEST row is a parked failure must not be
        # revisit-eligible just because an earlier capture succeeded —
        # otherwise every wave re-enqueues it with attempts reset and
        # burns max_attempts fetch slots on a dead url forever
        urls = _urls()
        eng = _engine(spark)
        eng.run(max_epochs=5)
        # refetch wave against a pages table missing the last url:
        # it fails and parks on top of its earlier ok row
        eng.pages = _pages(spark, urls[:-1])
        assert eng.enqueue_revisits(epoch_hours=10_000) == N_URLS
        eng.run(max_epochs=10)
        statuses = {
            (r["url"], r["fetched_epoch"]): r["status"]
            for r in eng.seen().collect()
        }
        assert "failed" in {
            s for (u, _), s in statuses.items() if u == urls[-1]
        }
        # next scheduling pass: the parked url is terminal
        n = eng.enqueue_revisits(epoch_hours=10_000)
        assert n == N_URLS - 1
        # explicit opt-in re-admits failures
        eng.run(max_epochs=10)
        n = eng.enqueue_revisits(
            epoch_hours=10_000, statuses=("ok", "dup", "failed")
        )
        assert n == N_URLS
        eng.close()

    def test_pending_urls_not_double_enqueued(self, spark):
        eng = _engine(spark)
        eng.run(max_epochs=5)
        hints = _hints(spark, [(u, None, "always", None) for u in _urls()])
        n1 = eng.enqueue_revisits(hints=hints)
        assert n1 == N_URLS
        # second scheduling pass BEFORE the refetch epoch: every due
        # url is already live in the frontier -> nothing re-enqueued
        assert eng.enqueue_revisits(hints=hints) == 0
        eng.close()

    def test_resume_after_revisit_commit(self, spark):
        eng = _engine(spark)
        eng.run(max_epochs=5)
        store = eng.store
        pages = eng.pages
        hints = _hints(
            spark,
            [(u, None, "always", None) for i, u in enumerate(_urls()) if i < 3],
        )
        assert eng.enqueue_revisits(hints=hints) == 3
        eng.close()
        # a fresh engine resumes from the manifest: the revisit delta is
        # committed state, so the refetch wave runs identically
        eng2 = CrawlEngine.resume(
            spark, store, pages, _robots(spark), CrawlConfig(max_depth=0)
        )
        results = eng2.run(max_epochs=5)
        assert [r["dequeued"] for r in results if not r.get("done")] == [3]
        assert (
            eng2.seen().filter(F.col("fetched_epoch") > 0).count() == 3
        )
        eng2.close()

    def test_modified_since_override(self, spark):
        eng = _engine(spark)
        eng.run(max_epochs=5)
        # 'never' changefreq: period rule can never fire; the lastmod
        # override still can
        hints = _hints(
            spark,
            [
                (u, "2025-07-15" if i % 2 == 0 else "2025-06-01", "never", None)
                for i, u in enumerate(_urls())
            ],
        )
        assert eng.enqueue_revisits(hints=hints) == 0
        assert eng.enqueue_revisits(hints=hints, modified_since="2025-07-01") == 6
        # the applied cutoff is recorded in the scheduling epoch's
        # metrics so run_now can apply a configured value once per
        # store instead of refetching the matching subset every firing
        last = eng.store.manifest()["epochs"][-1]
        assert last["metrics"]["modified_since"] == "2025-07-01"
        assert last["metrics"]["revisits"] == 6
        eng.close()


class TestRevisitCli:
    def test_scrape_revisit_schedule_loop(self, spark, tmp_path):
        """The continuous-crawl CLI loop: scrape (wave 1) → revisit
        (scheduling-only epoch) → schedule (fetch wave 2)."""
        import json

        import yaml
        from click.testing import CliRunner

        from web_scrapper_spark import cli as cli_mod

        pages_dir = str(tmp_path / "pages")
        _pages(spark).write.parquet(pages_dir)
        cfg_path = str(tmp_path / "job.yaml")
        with open(cfg_path, "w") as fh:
            yaml.safe_dump(
                {
                    "scraper": {
                        "type": "content",
                        "urls": _urls(),
                        "selectors": {},
                        "delay": 0.01,
                        "max_pages": 1,
                        "output": {"format": "json", "path": str(tmp_path / "out.json")},
                    }
                },
                fh,
            )
        store = str(tmp_path / "store")
        real_stop = spark.stop
        spark.stop = lambda: None
        try:
            cli_mod._spark = lambda cpus: spark
            runner = CliRunner()
            r = runner.invoke(
                cli_mod.scrape,
                ["-c", cfg_path, "-p", pages_dir, "-s", store,
                 "--max-epochs", "5"],
            )
            assert r.exit_code == 0, r.output
            assert json.loads(r.output)["urls_visited"] == N_URLS

            # nothing due yet on the 7-epoch default period
            r = runner.invoke(
                cli_mod.revisit,
                ["-c", cfg_path, "-p", pages_dir, "-s", store],
            )
            assert r.exit_code == 0, r.output
            assert json.loads(r.output)["revisits"] == 0

            # calibrate the epoch clock so the default period is due
            r = runner.invoke(
                cli_mod.revisit,
                ["-c", cfg_path, "-p", pages_dir, "-s", store,
                 "--epoch-hours", "10000"],
            )
            assert r.exit_code == 0, r.output
            assert json.loads(r.output)["revisits"] == N_URLS

            r = runner.invoke(
                cli_mod.schedule,
                ["-c", cfg_path, "-p", pages_dir, "-s", store,
                 "--epochs", "3"],
            )
            assert r.exit_code == 0, r.output
            waves = [json.loads(line) for line in r.output.splitlines()]
            assert sum(w.get("dequeued", 0) for w in waves) == N_URLS
        finally:
            spark.stop = real_stop


class TestJobRevisit:
    def test_run_now_drained_job_fetches_revisit_wave(self, spark, tmp_path):
        """scraper.revisit in the yaml: a drained job asks the
        freshness scheduler once per run_now firing and fetches the
        wave in the same invocation — the cron loop needs no extra
        command."""
        import yaml

        from web_scrapper_spark.schedulers import JobRegistry

        pages_dir = str(tmp_path / "pages")
        _pages(spark).write.parquet(pages_dir)
        cfg_path = str(tmp_path / "job.yaml")
        with open(cfg_path, "w") as fh:
            yaml.safe_dump(
                {
                    "scraper": {
                        "type": "content",
                        "urls": _urls(),
                        "selectors": {},
                        "delay": 0.01,
                        "max_pages": 1,
                        # epoch clock calibrated so the hint-less
                        # default period is due immediately
                        "revisit": {"epoch_hours": 10_000},
                        "output": {"format": "json", "path": str(tmp_path / "o.json")},
                    }
                },
                fh,
            )
        reg = JobRegistry(str(tmp_path / "jobs"))
        job_id = reg.create("rvjob", cfg_path, pages_dir)

        # first firing: initial wave + (after it drains) ONE revisit
        # wave in the same invocation
        r1 = reg.run_now(spark, job_id, epochs=10)
        assert sum(r.get("dequeued", 0) for r in r1) == 2 * N_URLS

        # every later cron firing fetches exactly one more revisit wave
        r2 = reg.run_now(spark, job_id, epochs=10)
        assert sum(r.get("dequeued", 0) for r in r2) == N_URLS
        # one revisit scheduling per invocation, then done
        assert r2[-1].get("done") is True

    def test_revisit_config_validation(self, tmp_path):
        import yaml

        from web_scrapper_spark.config import ConfigError, bind_job, load_config

        def cfg(revisit):
            p = tmp_path / "c.yaml"
            p.write_text(
                yaml.safe_dump(
                    {
                        "scraper": {
                            "type": "content",
                            "urls": ["https://a.org/"],
                            "revisit": revisit,
                            "output": {"format": "json", "path": str(tmp_path / "o.json")},
                        }
                    }
                )
            )
            return str(p)

        # true -> defaults
        job = bind_job(load_config(cfg(True)))
        assert job.revisit == {
            "epoch_hours": 24, "default_hours": 168,
            "hints": "none", "modified_since": None,
        }
        with pytest.raises(ConfigError, match="unknown scraper.revisit"):
            bind_job(load_config(cfg({"epoch_hrs": 1})))
        with pytest.raises(ConfigError, match=">= 1"):
            bind_job(load_config(cfg({"epoch_hours": 0})))
        with pytest.raises(ConfigError, match="hints"):
            bind_job(load_config(cfg({"hints": "sitemap"})))
        # absent -> one-shot
        assert bind_job(load_config(cfg(None))).revisit is None
