"""Tests for the config system (P36), RSS sink (S14), and CLI (§3)."""

import json
import os
from datetime import datetime, timezone

import pytest
import yaml

from web_scrapper_spark import config as cfg_mod
from web_scrapper_spark.sources.rss import generate_rss


def _write_config(tmp_path, overrides=None):
    config = {
        "scraper": {
            "type": "content",
            "urls": ["https://host0.example-crawl.org/blog"],
            "selectors": {"content": ".entry-content"},
            "delay": 0.5,
            "retries": 3,
            "follow_next_page": True,
            "max_pages": 10,
            "output": {"format": "json", "path": "./out.json"},
        }
    }
    if overrides:
        config["scraper"].update(overrides)
    path = tmp_path / "job.yaml"
    path.write_text(yaml.safe_dump(config))
    return str(path)


class TestConfig:
    def test_load_and_bind(self, tmp_path):
        job = cfg_mod.bind_job(cfg_mod.load_config(_write_config(tmp_path)))
        assert job.stype == "content"
        assert job.seeds == [("https://host0.example-crawl.org/blog", "content")]
        assert job.crawl_delay == 0.5
        assert job.content.follow_next_page is True
        assert job.content.selectors == {"content": ".entry-content"}
        assert job.output_format == "json"

    def test_seen_filter_binds_through_to_crawl_config(self, tmp_path):
        job = cfg_mod.bind_job(
            cfg_mod.load_config(
                _write_config(tmp_path, {"seen_filter": "cuckoo"})
            )
        )
        assert job.seen_filter == "cuckoo"
        assert job.crawl_config().seen_filter == "cuckoo"
        # default stays bloom
        job2 = cfg_mod.bind_job(cfg_mod.load_config(_write_config(tmp_path)))
        assert job2.crawl_config().seen_filter == "bloom"
        with pytest.raises(cfg_mod.ConfigError, match="seen_filter"):
            cfg_mod.bind_job(
                cfg_mod.load_config(
                    _write_config(tmp_path, {"seen_filter": "nope"})
                )
            )

    def test_scalar_user_agents_and_proxies_coerce(self, tmp_path):
        """A scalar string for the list-typed keys must become a
        one-element list, not explode into single characters."""
        job = cfg_mod.bind_job(
            cfg_mod.load_config(
                _write_config(
                    tmp_path,
                    {"user_agents": "Mozilla/5.0 Test",
                     "proxies": "http://p:8080"},
                )
            )
        )
        assert job.fetch_policy.user_agents == ["Mozilla/5.0 Test"]
        assert job.fetch_policy.proxies == ["http://p:8080"]

    def test_output_table_binds(self, tmp_path):
        job = cfg_mod.bind_job(
            cfg_mod.load_config(
                _write_config(
                    tmp_path,
                    {"output": {"format": "db",
                                "path": "jdbc:postgresql://h/d",
                                "table": "articles"}},
                )
            )
        )
        assert job.output_format == "db"
        assert job.output_table == "articles"

    def test_validation_errors(self, tmp_path):
        with pytest.raises(cfg_mod.ConfigError):
            cfg_mod.validate_config({})
        with pytest.raises(cfg_mod.ConfigError):
            cfg_mod.validate_config({"scraper": {"type": "nope", "urls": ["x"]}})
        with pytest.raises(cfg_mod.ConfigError):
            cfg_mod.validate_config({"scraper": {"type": "content", "urls": []}})
        with pytest.raises(cfg_mod.ConfigError):
            cfg_mod.validate_config(
                {"scraper": {"type": "content", "urls": ["x"],
                             "output": {"format": "tsv", "path": "p"}}}
            )

    def test_dot_paths(self):
        config = {"scraper": {"delay": 2}}
        assert cfg_mod.get_value(config, "scraper.delay") == 2
        assert cfg_mod.get_value(config, "scraper.nope", "dflt") == "dflt"
        cfg_mod.set_value(config, "scraper.output.format", "csv")
        assert config["scraper"]["output"]["format"] == "csv"

    def test_reference_example_configs_bind(self, tmp_path):
        """The reference's shipped example YAMLs load unchanged."""
        import shutil, os

        src = "/root/reference/config/examples"
        if not os.path.isdir(src):
            pytest.skip("reference examples unavailable")
        for name in ("ecommerce.yaml", "business.yaml", "content.yaml"):
            dst = tmp_path / name
            shutil.copy(os.path.join(src, name), dst)
            job = cfg_mod.bind_job(cfg_mod.load_config(str(dst)))
            assert job.seeds


class TestRss:
    def test_feed_shape_and_escaping(self):
        now = datetime(2025, 7, 18, tzinfo=timezone.utc)
        xml = generate_rss(
            [
                {
                    "title": "A & B",
                    "url": "https://x.org/a?b=1&c=2",
                    "date": "2025-01-05",
                    "author": "Jane",
                    "excerpt": "Exc",
                    "content": "Body <b>html</b>",
                    "categories": ["T1", "T2"],
                    "image": "https://x.org/i.png",
                },
                {"title": "", "url": "https://skip.me"},  # skipped: no title
            ],
            "Feed", "Desc", "https://x.org/feed", now=now,
        )
        assert xml.startswith('<?xml version="1.0"')
        assert "<title>A &amp; B</title>" in xml
        assert "<pubDate>Sun, 05 Jan 2025 00:00:00 +0000</pubDate>" in xml
        assert "<![CDATA[Body <b>html</b>]]>" in xml
        assert xml.count("<category>") == 2
        assert "skip.me" not in xml
        assert "<lastBuildDate>Fri, 18 Jul 2025 00:00:00 +0000</lastBuildDate>" in xml


class TestCli:
    def test_scrape_end_to_end(self, spark, tmp_path):
        """CLI scrape over a pages parquet written from the fixtures.
        Runs the command functions in-process (no subprocess JVM spinup);
        the CLI's spark factory is monkeypatched to the shared session."""
        from click.testing import CliRunner

        from web_scrapper_spark import cli as cli_mod
        from web_scrapper_spark.fixtures import SiteSpec, pages_dataframe

        pages_dir = str(tmp_path / "pages")
        pages_dataframe(spark, SiteSpec()).write.parquet(pages_dir)

        cfg_path = _write_config(
            tmp_path, {"urls": ["https://host1.example-crawl.org/blog"],
                       "selectors": {}}
        )
        out_path = str(tmp_path / "articles.json")
        store = str(tmp_path / "store")

        real_stop = spark.stop
        spark.stop = lambda: None  # keep the shared test session alive
        try:
            cli_mod._spark = lambda cpus: spark
            runner = CliRunner()
            result = runner.invoke(
                cli_mod.scrape,
                ["-c", cfg_path, "-p", pages_dir, "-s", store,
                 "-o", out_path, "-f", "json", "--max-epochs", "20"],
            )
            assert result.exit_code == 0, result.output
            report = json.loads(result.output)
            assert report["urls_visited"] > 3
            assert report["items_extracted"] > 3
            back = spark.read.json(out_path)
            assert back.count() == report["items_extracted"]

            # report command reads the lineage
            result2 = runner.invoke(cli_mod.report, ["-s", store])
            metrics = json.loads(result2.output)
            assert any(m.get("fetched_ok") for m in metrics)
        finally:
            spark.stop = real_stop

    def test_job_control_cli_pause_resume_delete(self, spark, tmp_path):
        """T3: the CLI drives create → pause (run refused) → resume →
        run-now → update → delete on a registry-backed job."""
        from click.testing import CliRunner

        from web_scrapper_spark import cli as cli_mod
        from web_scrapper_spark.fixtures import SiteSpec, pages_dataframe

        pages_dir = str(tmp_path / "pages")
        pages_dataframe(spark, SiteSpec()).write.parquet(pages_dir)
        cfg_path = _write_config(
            tmp_path, {"urls": ["https://host1.example-crawl.org/blog"],
                       "selectors": {}}
        )
        jobs_dir = str(tmp_path / "jobs")

        real_stop = spark.stop
        spark.stop = lambda: None
        try:
            cli_mod._spark = lambda cpus: spark
            runner = CliRunner()
            created = runner.invoke(
                cli_mod.cli,
                ["job", "create", "-j", jobs_dir, "-n", "blogjob",
                 "-c", cfg_path, "-p", pages_dir, "--cron", "0 3 * * *"],
            )
            assert created.exit_code == 0, created.output
            job_id = json.loads(created.output)["job_id"]

            paused = runner.invoke(cli_mod.cli, ["job", "pause", "-j", jobs_dir, job_id])
            assert json.loads(paused.output)["status"] == "paused"
            refused = runner.invoke(
                cli_mod.cli, ["job", "run-now", "-j", jobs_dir, job_id]
            )
            assert refused.exit_code == 2
            assert "paused" in refused.output

            resumed = runner.invoke(cli_mod.cli, ["job", "resume", "-j", jobs_dir, job_id])
            assert json.loads(resumed.output)["status"] == "active"
            ran = runner.invoke(
                cli_mod.cli,
                ["job", "run-now", "-j", jobs_dir, "--epochs", "3", job_id],
            )
            assert ran.exit_code == 0, ran.output
            epochs = [json.loads(line) for line in ran.output.splitlines()]
            assert sum(e.get("fetched_ok", 0) for e in epochs) > 0

            # status reflects run state from BOTH registry and store
            status = runner.invoke(cli_mod.cli, ["job", "status", "-j", jobs_dir, "blogjob"])
            row = json.loads(status.output)
            assert row["run_count"] == 1
            assert row["store_last_epoch"]["epoch"] >= 0

            # update re-validates; a bad config path is refused
            bad = runner.invoke(
                cli_mod.cli,
                ["job", "update", "-j", jobs_dir, "--config", "/nope.yaml", job_id],
            )
            assert bad.exit_code == 2
            renamed = runner.invoke(
                cli_mod.cli, ["job", "update", "-j", jobs_dir, "--name", "renamed", job_id]
            )
            assert json.loads(renamed.output)["name"] == "renamed"

            deleted = runner.invoke(
                cli_mod.cli, ["job", "delete", "-j", jobs_dir, "--remove-store", job_id]
            )
            assert deleted.exit_code == 0, deleted.output
            listing = runner.invoke(cli_mod.cli, ["job", "list", "-j", jobs_dir])
            assert json.loads(listing.output) == []
        finally:
            spark.stop = real_stop

    def test_job_registry_validation(self, tmp_path):
        from web_scrapper_spark.schedulers import JobError, JobRegistry

        reg = JobRegistry(str(tmp_path / "jobs"))
        with pytest.raises(JobError):
            reg.create("x", str(tmp_path / "missing.yaml"), "pages")
        with pytest.raises(cfg_mod.ConfigError):
            bad = tmp_path / "bad.yaml"
            bad.write_text(yaml.safe_dump({"scraper": {"type": "nope", "urls": ["u"]}}))
            reg.create("x", str(bad), "pages")
        job_id = reg.create("ok", _write_config(tmp_path), "pages")
        assert reg.get("ok")["job_id"] == job_id  # lookup by name too
        with pytest.raises(JobError):
            reg.update(job_id, nonsense_field=1)
        with pytest.raises(JobError):
            reg.get("ghost")

class TestNotifications:
    """T4: email/webhook notifications (reference job_scheduler.py:259-484)."""

    def _payload(self, status="success", **kw):
        from datetime import datetime, timezone

        from web_scrapper_spark.schedulers import build_payload

        return build_payload(
            "jid-1", "blogjob", status,
            now=datetime(2025, 7, 18, tzinfo=timezone.utc), **kw,
        )

    def test_payload_shapes(self):
        ok = self._payload(report={"urls_visited": 5}, results=[{"t": "x"}])
        assert ok["status"] == "success"
        assert ok["report"] == {"urls_visited": 5}
        assert ok["results"] == [{"t": "x"}]
        assert ok["timestamp"].startswith("2025-07-18")
        # oversize results elided with a summary (reference's 1 MB cap)
        big = self._payload(results=[{"t": "y" * 2_000_000}])
        assert "results" not in big
        assert big["results_summary"]["count"] == 1
        bad = self._payload(status="failure", error="boom")
        assert bad["error"] == "boom"
        assert "report" not in bad

    def test_email_builder_and_fake_smtp(self):
        from web_scrapper_spark.schedulers import EmailSender, build_payload

        sent = {}

        class FakeSMTP:
            def __init__(self, server, port):
                sent["endpoint"] = (server, port)

            def __enter__(self):
                return self

            def __exit__(self, *a):
                return False

            def starttls(self):
                sent["tls"] = True

            def login(self, u, p):
                sent["login"] = (u, p)

            def send_message(self, msg):
                sent["msg"] = msg

        sender = EmailSender(
            to="ops@example.org", server="smtp.local", port=2525,
            username="bot", password="pw", transport=FakeSMTP,
        )
        ok = self._payload(report={"items": 3})
        assert sender.send(ok) is True
        assert sent["endpoint"] == ("smtp.local", 2525)
        assert sent["tls"] and sent["login"] == ("bot", "pw")
        assert "Completed Successfully" in sent["msg"]["Subject"]
        body = sent["msg"].get_payload()[-1].get_payload()
        assert "<strong>items:</strong> 3" in body
        fail = self._payload(status="failure", error="boom")
        sender.send(fail)
        assert "Failed" in sent["msg"]["Subject"]
        assert "<pre>boom</pre>" in sent["msg"].get_payload()[-1].get_payload()

    def test_email_skipped_without_credentials(self, monkeypatch):
        from web_scrapper_spark.schedulers import EmailSender

        for var in ("WEBSCRAPER_SMTP_USERNAME", "WEBSCRAPER_SMTP_PASSWORD"):
            monkeypatch.delenv(var, raising=False)
        sender = EmailSender(to="ops@example.org", transport=None.__class__)
        assert sender.send(self._payload()) is False  # skip, never connect

    def test_webhook_sender_posts_json(self):
        import json as _json

        from web_scrapper_spark.schedulers import WebhookSender

        posts = {}

        class FakeResp:
            status = 204

            def __enter__(self):
                return self

            def __exit__(self, *a):
                return False

        def opener(req, timeout):
            posts["url"] = req.full_url
            posts["body"] = _json.loads(req.data)
            posts["ctype"] = req.get_header("Content-type")
            return FakeResp()

        sender = WebhookSender("https://hooks.example.org/x", opener=opener)
        assert sender.send(self._payload(report={"n": 1})) is True
        assert posts["url"] == "https://hooks.example.org/x"
        assert posts["body"]["job_name"] == "blogjob"
        assert posts["ctype"] == "application/json"

    def test_dispatch_logs_and_swallows_errors(self, tmp_path):
        from web_scrapper_spark.schedulers import NotificationLog, dispatch

        class Boom:
            kind = "webhook"

            def send(self, payload):
                raise OSError("network unreachable")

        class Ok:
            kind = "email"

            def send(self, payload):
                return True

        log = NotificationLog(str(tmp_path / "n.jsonl"))
        outcomes = dispatch(self._payload(), [Boom(), Ok()], log=log)
        assert outcomes["email"] == "sent"
        assert outcomes["webhook"].startswith("error:")
        rows = log.read()
        assert len(rows) == 1 and rows[0]["deliveries"] == outcomes

    def test_dispatch_same_kind_senders_both_audited(self, tmp_path):
        """Two webhooks must not overwrite each other's outcome — a
        failed delivery hidden by a later success defeats the audit."""
        from web_scrapper_spark.schedulers import NotificationLog, dispatch

        class Boom:
            kind = "webhook"

            def send(self, payload):
                raise OSError("down")

        class Ok:
            kind = "webhook"

            def send(self, payload):
                return True

        log = NotificationLog(str(tmp_path / "n2.jsonl"))
        outcomes = dispatch(self._payload(), [Boom(), Ok()], log=log)
        assert len(outcomes) == 2
        assert sorted(
            v if v == "sent" else "error" for v in
            (o.split(":")[0] for o in outcomes.values())
        ) == ["error", "sent"]

    def test_run_now_fires_notifications(self, spark, tmp_path):
        from web_scrapper_spark.fixtures import SiteSpec, pages_dataframe
        from web_scrapper_spark.schedulers import JobError, JobRegistry

        pages_dir = str(tmp_path / "pages")
        pages_dataframe(spark, SiteSpec()).write.parquet(pages_dir)
        cfg_path = _write_config(
            tmp_path, {"urls": ["https://host1.example-crawl.org/blog"],
                       "selectors": {}}
        )
        reg = JobRegistry(str(tmp_path / "jobs"))
        # invalid notify targets rejected at create time, like the reference
        with pytest.raises(JobError, match="invalid email"):
            reg.create("x", cfg_path, pages_dir, email="not-an-email")
        with pytest.raises(JobError, match="invalid webhook"):
            reg.create("x", cfg_path, pages_dir, webhook="nope")

        job_id = reg.create("blogjob", cfg_path, pages_dir)
        captured = []

        class Capture:
            kind = "webhook"

            def send(self, payload):
                captured.append(payload)
                return True

        reg.run_now(spark, job_id, epochs=2, senders=[Capture()])
        assert len(captured) == 1
        assert captured[0]["status"] == "success"
        assert captured[0]["report"]["urls_visited"] > 0
        rows = reg.notification_log().read()
        assert rows and rows[0]["deliveries"] == {"webhook": "sent"}

        # drain the frontier, then run once more: the drained-sentinel
        # result carries an epoch that never committed — last_epoch
        # must track the store manifest, not the sentinel
        from web_scrapper_spark.frontier.store import SnapshotStore

        reg.run_now(spark, job_id, epochs=50, senders=[Capture()])
        reg.run_now(spark, job_id, epochs=1, senders=[Capture()])
        job = reg.get(job_id)
        store = SnapshotStore(job["store_dir"])
        assert job["last_epoch"] == store.last_epoch()["epoch"]

    def test_create_config_roundtrip(self, tmp_path):
        from click.testing import CliRunner

        from web_scrapper_spark import cli as cli_mod

        out = str(tmp_path / "c.yaml")
        result = CliRunner().invoke(cli_mod.create_config, ["-t", "business", "-o", out])
        assert result.exit_code == 0
        job = cfg_mod.bind_job(cfg_mod.load_config(out))
        assert job.stype == "business"


class TestSparkSubmit:
    """scripts/submit_crawl.sh — the north rule's execution path:
    package the engine as a zip, ship via spark-submit --py-files,
    drive the identical CLI. One real subprocess JVM (~60s); proves
    the artifact is self-contained (no repo-cwd imports leak in)."""

    def test_submit_crawl_end_to_end(self, spark, tmp_path):
        import json
        import subprocess

        from web_scrapper_spark.fixtures import SiteSpec, pages_dataframe

        pages_dir = str(tmp_path / "pages")
        pages_dataframe(spark, SiteSpec(n_hosts=2, n_articles=40)).write.parquet(
            pages_dir
        )
        cfg_path = _write_config(
            tmp_path,
            {"urls": ["https://host0.example-crawl.org/blog",
                      "https://host1.example-crawl.org/blog"],
             "max_pages": 10_000},
        )
        store = str(tmp_path / "submit-store")
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env = dict(os.environ, WSS_BUILD_DIR=str(tmp_path / "build"))
        proc = subprocess.run(
            [os.path.join(repo, "scripts", "submit_crawl.sh"),
             "-c", cfg_path, "-p", pages_dir, "-s", store, "--cpus", "4"],
            capture_output=True, text=True, timeout=420, env=env, cwd=str(tmp_path),
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        report = json.loads("{" + proc.stdout.split("{", 1)[1])
        # the fixture site deliberately contains dangling links (retry
        # -> parked failed), so visited < total by design — same
        # expectations as the in-process CLI e2e test above
        assert report["urls_visited"] > 3
        assert report["items_extracted"] > 3
        assert report["epochs"] > 1


class TestAnalyzeCli:
    """The analyze group: corpus operators as a CLI surface."""

    def test_quality_and_dedup_and_funnel(self, spark, tmp_path):
        import json as _json

        from click.testing import CliRunner

        import web_scrapper_spark.cli as cli_mod

        docs = spark.createDataFrame(
            [(i, ("good text with several words here number %d. " % i) * 8
              + ("repeat me " * 30 if i % 5 == 0 else ""))
             for i in range(20)]
            + [(100, "dup body the same"), (101, "dup body the same")],
            "doc_id long, text string",
        )
        path = str(tmp_path / "docs.parquet")
        docs.write.parquet(path)

        runner = CliRunner()
        q = runner.invoke(
            cli_mod.cli, ["analyze", "quality", "-i", path, "--cpus", "4"]
        )
        assert q.exit_code == 0, q.output
        rep = _json.loads(q.output.strip().splitlines()[-1])
        assert rep["docs"] == 22 and rep["kept"] + rep["dropped"] == 22

        d = runner.invoke(
            cli_mod.cli,
            ["analyze", "dedup", "-i", path, "--method", "exact", "--cpus", "4"],
        )
        assert d.exit_code == 0, d.output
        rep = _json.loads(d.output.strip().splitlines()[-1])
        assert rep["duplicate_rows"] == 1  # 100/101 share a fingerprint

        f = runner.invoke(
            cli_mod.cli, ["analyze", "funnel", "-i", path, "--cpus", "4"]
        )
        assert f.exit_code == 0, f.output
        stages = _json.loads(f.output.strip()[f.output.index("[") :])
        assert stages[0]["stage"] == "input" and stages[0]["docs"] == 22
        assert stages[-1]["stage"] == "decontaminate"
        assert stages[-1]["docs"] <= stages[0]["docs"]

    def test_clean(self, spark, tmp_path):
        import json as _json

        from click.testing import CliRunner

        import web_scrapper_spark.cli as cli_mod

        docs = spark.createDataFrame(
            [
                (1, "the cat and the dog is here\nChrome line.\nChrome line."),
                (2, "der hund und die katze ist nicht mit ein haus"),
            ],
            "doc_id long, text string",
        )
        path = str(tmp_path / "cdocs.parquet")
        docs.write.parquet(path)
        out_path = str(tmp_path / "cleaned.parquet")

        runner = CliRunner()
        c = runner.invoke(
            cli_mod.cli,
            ["analyze", "clean", "-i", path, "-o", out_path,
             "--lang", "en", "--cpus", "4"],
        )
        assert c.exit_code == 0, c.output
        rep = _json.loads(c.output.strip().splitlines()[-1])
        assert rep["docs"] == 2
        assert rep["lines_dropped"] == 1      # the repeated chrome line
        # doc 1's surviving chrome line scores 'und' (no markers) and
        # doc 2's German text isn't English: one paragraph dropped each
        assert rep["paras_dropped"] == 2
        cleaned = {
            r["doc_id"]: r for r in spark.read.parquet(out_path).collect()
        }
        assert cleaned[1]["text"] == "the cat and the dog is here"
        assert cleaned[2]["text"] == "" and cleaned[2]["doc_lang"] == "de"


class TestShowVacuumCli:
    def test_own_spark_sees_cross_thread_host_session(self, spark):
        """A host session created in another thread must still be
        detected (getActiveSession is thread-local): owned must come
        back False or the command's finally would stop the host's
        session."""
        import threading

        import web_scrapper_spark.cli as cli_mod

        out = {}

        def probe():
            s, owned = cli_mod._own_spark(4)
            out["owned"] = owned
            out["same"] = s is spark

        t = threading.Thread(target=probe)
        t.start()
        t.join()
        assert out["owned"] is False
        assert out["same"] is True

    def test_show_and_vacuum_on_a_real_store(self, spark, tmp_path):
        import json as _json

        from click.testing import CliRunner

        import web_scrapper_spark.cli as cli_mod
        from web_scrapper_spark.crawl.epoch import CrawlConfig, CrawlEngine
        from web_scrapper_spark.fixtures import (
            SiteSpec,
            pages_dataframe,
            robots_dataframe,
            seed_urls,
        )
        from web_scrapper_spark.frontier.store import SnapshotStore

        spec = SiteSpec(n_hosts=2, n_articles=8, blog_page_size=4)
        store = SnapshotStore(str(tmp_path / "store"))
        eng = CrawlEngine(
            spark, store, pages_dataframe(spark, spec),
            robots_dataframe(spark, spec), CrawlConfig(),
        )
        eng.init([(u, "content") for u in seed_urls(spec) if u.endswith("/blog")])
        eng.run_epoch()
        eng.run_epoch()

        runner = CliRunner()
        full = runner.invoke(
            cli_mod.cli,
            ["show", "-s", str(tmp_path / "store"), "--table", "seen"],
        )
        assert full.exit_code == 0, full.output
        rep = _json.loads(full.output.strip().splitlines()[-1])
        early = runner.invoke(
            cli_mod.cli,
            ["show", "-s", str(tmp_path / "store"), "--table", "seen",
             "--as-of", "0"],
        )
        rep0 = _json.loads(early.output.strip().splitlines()[-1])
        assert 0 < rep0["rows"] <= rep["rows"]

        vac = runner.invoke(
            cli_mod.cli,
            ["vacuum", "-s", str(tmp_path / "store"),
             "--table", "frontier_base", "--keep", "1"],
        )
        assert vac.exit_code == 0, vac.output
        assert _json.loads(vac.output.strip().splitlines()[-1])["kept"] == 1


class TestMetaRobotsConfig:
    def test_yaml_key_binds_and_defaults_off(self):
        base = {"scraper": {"type": "content", "urls": ["https://x.org/a"]}}
        assert cfg_mod.bind_job(base).crawl_config().respect_meta_robots is False
        on = {
            "scraper": {
                "type": "content",
                "urls": ["https://x.org/a"],
                "respect_meta_robots": True,
            }
        }
        job = cfg_mod.bind_job(on)
        assert job.respect_meta_robots is True
        assert job.crawl_config().respect_meta_robots is True


class TestMaxOutlinksConfig:
    def test_yaml_key_binds_and_validates(self):
        on = {
            "scraper": {
                "type": "content",
                "urls": ["https://x.org/a"],
                "max_outlinks": 5,
            }
        }
        assert cfg_mod.bind_job(on).crawl_config().max_outlinks_per_page == 5
        base = {"scraper": {"type": "content", "urls": ["https://x.org/a"]}}
        assert cfg_mod.bind_job(base).crawl_config().max_outlinks_per_page is None
        bad = {
            "scraper": {
                "type": "content",
                "urls": ["https://x.org/a"],
                "max_outlinks": 0,
            }
        }
        import pytest as _pytest

        with _pytest.raises(cfg_mod.ConfigError):
            cfg_mod.bind_job(bad)


def test_get_spark_cpus_zero_means_all_cores():
    """--cpus 0 is the CLI's documented 'all cores' default: it must
    map to a positive local[N], never local[0] (which Spark rejects at
    session creation). Checked in a fresh process so no host session
    masks the master resolution."""
    import subprocess
    import sys

    code = (
        "from web_scrapper_spark.session import get_spark\n"
        "s = get_spark(app_name='cpus0-probe', cpus=0, "
        "extra_conf={'spark.ui.enabled': 'false'})\n"
        "print('MASTER=' + s.sparkContext.master)\n"
        "s.stop()\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=240, cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("MASTER=")][0]
    master = line.split("=", 1)[1]
    assert master.startswith("local[")
    assert master != "local[0]"


class TestSearchCli:
    """analyze search: BM25 / BM25F retrieval as a CLI surface."""

    def test_search_and_fielded_search(self, spark, tmp_path):
        import json as _json

        from click.testing import CliRunner

        import web_scrapper_spark.cli as cli_mod

        docs = spark.createDataFrame(
            [
                (1, "apple pie recipe with apple and sugar"),
                (2, "banana bread recipe for breakfast"),
                (3, "car engine manual and toolbox"),
            ],
            "doc_id long, text string",
        )
        dpath = str(tmp_path / "docs.parquet")
        docs.write.parquet(dpath)
        anchors = spark.createDataFrame(
            [(3, "apple apple apple"), (3, "apple site")],
            "doc_id long, text string",
        )
        apath = str(tmp_path / "anchors.parquet")
        anchors.write.parquet(apath)

        runner = CliRunner()
        r = runner.invoke(
            cli_mod.cli,
            ["analyze", "search", "-i", dpath, "-q", "apple recipe",
             "--topk", "2", "--cpus", "4"],
        )
        assert r.exit_code == 0, r.output
        rows = _json.loads(r.output.strip())
        assert rows[0]["doc_id"] == 1 and rows[0]["rank"] == 1
        assert rows[0]["n_terms"] == 2

        f = runner.invoke(
            cli_mod.cli,
            ["analyze", "search", "-i", dpath, "-q", "apple",
             "--anchors", apath, "--topk", "1", "--cpus", "4"],
        )
        assert f.exit_code == 0, f.output
        frows = _json.loads(f.output.strip())
        # the anchor field (w_anchor=2) outvotes doc 1's body tf
        assert frows[0]["doc_id"] == 3


class TestSearchCliLike:
    """analyze search --like: MLT as a CLI surface."""

    def test_like_and_usage_guards(self, spark, tmp_path):
        import json as _json

        from click.testing import CliRunner

        import web_scrapper_spark.cli as cli_mod

        docs = spark.createDataFrame(
            [
                (1, "quantum entanglement physics quantum"),
                (2, "quantum physics entanglement notes"),
                (3, "banana bread baking flour"),
            ],
            "doc_id long, text string",
        )
        dpath = str(tmp_path / "docs.parquet")
        docs.write.parquet(dpath)

        runner = CliRunner()
        r = runner.invoke(
            cli_mod.cli,
            ["analyze", "search", "-i", dpath, "--like", "1",
             "--topk", "1", "--cpus", "4"],
        )
        assert r.exit_code == 0, r.output
        rows = _json.loads(r.output.strip())
        assert rows[0]["like_doc"] == 1 and rows[0]["doc_id"] == 2

        bad = runner.invoke(
            cli_mod.cli, ["analyze", "search", "-i", dpath]
        )
        assert bad.exit_code != 0
        both = runner.invoke(
            cli_mod.cli,
            ["analyze", "search", "-i", dpath, "-q", "x", "--like", "1"],
        )
        assert both.exit_code != 0


class TestSearchFromStoreCli:
    """analyze search --from-store: mid-crawl retrieval from the
    incremental index (cfg.index_articles) without a rebuild."""

    def test_from_store_serves_queries(self, spark, tmp_path):
        import json as _json

        from click.testing import CliRunner

        from pyspark.sql import functions as F

        import web_scrapper_spark.cli as cli_mod
        from web_scrapper_spark.crawl.epoch import CrawlConfig, CrawlEngine
        from web_scrapper_spark.fixtures import (
            SiteSpec,
            pages_dataframe,
            robots_dataframe,
            seed_urls,
        )
        from web_scrapper_spark.frontier.store import SnapshotStore

        spec = SiteSpec(n_hosts=2, n_articles=24, blog_page_size=8)
        store_dir = str(tmp_path / "store")
        engine = CrawlEngine(
            spark, SnapshotStore(store_dir), pages_dataframe(spark, spec),
            robots_dataframe(spark, spec),
            CrawlConfig(index_articles=True),
        )
        engine.init([(u, "content") for u in seed_urls(spec)])
        engine.run(max_epochs=20)
        # query a term that provably exists: the index's highest-df term
        idx = engine.search_index()
        term = (
            idx["postings"].orderBy(F.desc("df"), "term").limit(1)
            .collect()[0]["term"]
        )

        real_stop = spark.stop
        spark.stop = lambda: None
        try:
            cli_mod._spark = lambda cpus: spark
            runner = CliRunner()
            r = runner.invoke(
                cli_mod.cli,
                ["analyze", "search", "--from-store", store_dir,
                 "-q", term, "--topk", "3", "--cpus", "4"],
            )
            assert r.exit_code == 0, r.output
            rows = _json.loads(r.output.strip())
            assert len(rows) == 3
            assert rows[0]["rank"] == 1 and rows[0]["score_u"] > 0

            # --like now serves from the live index too (round-4 fix:
            # MLT consumes the persisted postings, no re-tokenization)
            some_doc = int(
                idx["doc_lens"].limit(1).collect()[0]["doc_id"]
            )
            like_ok = runner.invoke(
                cli_mod.cli,
                ["analyze", "search", "--from-store", store_dir,
                 "--like", str(some_doc), "--topk", "3", "--cpus", "4"],
            )
            assert like_ok.exit_code == 0, like_ok.output
            like_rows = _json.loads(like_ok.output.strip())
            assert like_rows and like_rows[0]["like_doc"] == some_doc
            assert all(r["doc_id"] != some_doc for r in like_rows)

            # df-gated --like (round-5 advice fix): the CLI must load
            # the index UNGATED for query formation and gate only the
            # search side (Lucene MLT semantics) — pinned against the
            # programmatic ungated-index + merge-contract-view call
            from web_scrapper_spark.operators.textops import (
                merge_postings,
                more_like_this,
            )

            gates = dict(min_df=2, max_df_ppm=400_000)
            want = more_like_this(
                None, [some_doc], k=3, index=idx,
                search_postings=merge_postings(
                    [idx["postings"]], n_docs=idx["n_docs"], **gates
                ),
            ).orderBy("rank").collect()
            gated = runner.invoke(
                cli_mod.cli,
                ["analyze", "search", "--from-store", store_dir,
                 "--like", str(some_doc), "--topk", "3", "--cpus", "4",
                 "--min-df", "2", "--max-df-ppm", "400000"],
            )
            assert gated.exit_code == 0, gated.output
            got = _json.loads(gated.output.strip())
            assert [(r["doc_id"], r["score_u"]) for r in got] == [
                (r["doc_id"], r["score_u"]) for r in want]

            # usage guards: -i XOR --from-store; no --anchors
            both = runner.invoke(
                cli_mod.cli,
                ["analyze", "search", "-i", "x", "--from-store", store_dir,
                 "-q", "a"],
            )
            assert both.exit_code != 0
            anch = runner.invoke(
                cli_mod.cli,
                ["analyze", "search", "--from-store", store_dir,
                 "-q", "a", "--anchors", "x"],
            )
            assert anch.exit_code != 0

            # a store with no index refuses loudly
            bare = str(tmp_path / "bare")
            SnapshotStore(bare)
            none = runner.invoke(
                cli_mod.cli,
                ["analyze", "search", "--from-store", bare, "-q", "a",
                 "--cpus", "4"],
            )
            assert none.exit_code == 2
            assert "no incremental index" in none.output
        finally:
            spark.stop = real_stop


class TestAnalyzeMediaCli:
    def test_all_modes_over_mixed_parquet(self, spark, tmp_path):
        """`analyze media`: header triage, animation demux and both
        dedup grains over one mixed parquet — undecodable payloads
        cost a row, never the job."""
        import numpy as np
        from click.testing import CliRunner

        from web_scrapper_spark import cli as cli_mod
        from web_scrapper_spark.operators import multimodal as mm
        from web_scrapper_spark.operators import rasters as rs

        g = (np.arange(12 * 14).reshape(12, 14) % 5 * 50).astype(np.uint8)
        anim = [g, np.roll(g, 3, axis=1)]
        rows = [
            (1, bytearray(mm.build_png(g))),
            (2, bytearray(rs.build_gif(g))),
            (3, bytearray(mm.build_png(g, filters=[2]))),  # re-encode
            (4, bytearray(rs.build_gif_animation(anim))),
            (5, bytearray(mm.build_apng(anim))),
            (6, bytearray(b"garbage-not-a-media-file")),
        ]
        media_dir = str(tmp_path / "media")
        spark.createDataFrame(
            rows, "media_id long, payload binary"
        ).write.parquet(media_dir)

        real_stop = spark.stop
        spark.stop = lambda: None
        try:
            cli_mod._spark = lambda cpus: spark
            runner = CliRunner()

            sniff = runner.invoke(
                cli_mod.cli, ["analyze", "media", "-i", media_dir]
            )
            assert sniff.exit_code == 0, sniff.output
            rep = json.loads(sniff.output)
            fmt = {
                (r["format"], r["valid"]): r["count"]
                for r in rep["by_format"]
            }
            assert fmt[("png", True)] == 3  # stills + the APNG
            assert fmt[("gif", True)] == 2
            assert fmt[(None, False)] == 1  # garbage triaged, no crash

            frames = runner.invoke(
                cli_mod.cli,
                ["analyze", "media", "-i", media_dir, "--mode", "frames"],
            )
            rep = json.loads(frames.output)
            # both 2-frame animations + the 1-frame still GIF demux
            assert rep["animations"] == 3 and rep["frames"] == 5

            out_dir = str(tmp_path / "pairs")
            dedup = runner.invoke(
                cli_mod.cli,
                ["analyze", "media", "-i", media_dir, "--mode", "dedup",
                 "-o", out_dir],
            )
            rep = json.loads(dedup.output)
            assert rep["near_dup_pairs"] >= 1  # 1 and 3 share pixels
            pairs = {
                (r["id_a"], r["id_b"])
                for r in spark.read.parquet(out_dir).collect()
            }
            assert (1, 3) in pairs

            anim_d = runner.invoke(
                cli_mod.cli,
                ["analyze", "media", "-i", media_dir, "--mode",
                 "anim-dedup"],
            )
            rep = json.loads(anim_d.output)
            assert rep["near_dup_animation_pairs"] >= 1  # GIF≡APNG twin
        finally:
            spark.stop = real_stop


class TestSearchCliPhrase:
    """analyze search --phrase / --snippet-window: positional retrieval
    as a CLI surface."""

    def _docs_path(self, spark, tmp_path):
        docs = spark.createDataFrame(
            [
                (1, "machine learning with big data and machine learning"),
                (2, "learning machine tricks"),
                (3, "big data machine learning pipelines at scale"),
            ],
            "doc_id long, text string",
        )
        dpath = str(tmp_path / "docs.parquet")
        docs.write.parquet(dpath)
        return dpath

    def test_phrase_with_snippets(self, spark, tmp_path):
        import json as _json

        from click.testing import CliRunner

        import web_scrapper_spark.cli as cli_mod

        dpath = self._docs_path(spark, tmp_path)
        runner = CliRunner()
        r = runner.invoke(
            cli_mod.cli,
            ["analyze", "search", "-i", dpath, "--phrase",
             "machine learning", "--snippet-window", "4",
             "--topk", "5", "--cpus", "4"],
        )
        assert r.exit_code == 0, r.output
        rows = _json.loads(r.output.strip())
        # doc2 has the terms reversed — never a phrase match
        assert [(x["doc_id"], x["phrase_tf"]) for x in rows] == [
            (1, 2), (3, 1)
        ]
        assert rows[0]["first_pos"] == 0
        assert rows[0]["snippet"].startswith("machine learning")
        assert all("snippet" in x for x in rows)

    def test_query_snippets_attach_per_hit(self, spark, tmp_path):
        import json as _json

        from click.testing import CliRunner

        import web_scrapper_spark.cli as cli_mod

        dpath = self._docs_path(spark, tmp_path)
        runner = CliRunner()
        r = runner.invoke(
            cli_mod.cli,
            ["analyze", "search", "-i", dpath, "-q", "pipelines",
             "--snippet-window", "3", "--topk", "2", "--cpus", "4"],
        )
        assert r.exit_code == 0, r.output
        rows = _json.loads(r.output.strip())
        assert rows[0]["doc_id"] == 3
        assert "pipelines" in rows[0]["snippet"]

    def test_usage_guards(self, spark, tmp_path):
        from click.testing import CliRunner

        import web_scrapper_spark.cli as cli_mod

        dpath = self._docs_path(spark, tmp_path)
        runner = CliRunner()
        # --phrase with -q
        bad = runner.invoke(
            cli_mod.cli,
            ["analyze", "search", "-i", dpath, "-q", "x",
             "--phrase", "a b"],
        )
        assert bad.exit_code != 0
        # --phrase needs an input table, not a store
        bad2 = runner.invoke(
            cli_mod.cli,
            ["analyze", "search", "--from-store", str(tmp_path),
             "--phrase", "a b"],
        )
        assert bad2.exit_code != 0
        # snippets need text: refused with --like
        bad3 = runner.invoke(
            cli_mod.cli,
            ["analyze", "search", "-i", dpath, "--like", "1",
             "--snippet-window", "5"],
        )
        assert bad3.exit_code != 0


class TestSearchFromStorePhraseCli:
    """analyze search --phrase --from-store: phrase queries served from
    the crawl's positional index (cfg.index_positions)."""

    def test_from_store_phrase(self, spark, tmp_path):
        import json as _json

        from click.testing import CliRunner

        from pyspark.sql import functions as F

        import web_scrapper_spark.cli as cli_mod
        from web_scrapper_spark.crawl.epoch import CrawlConfig, CrawlEngine
        from web_scrapper_spark.fixtures import (
            SiteSpec,
            pages_dataframe,
            robots_dataframe,
            seed_urls,
        )
        from web_scrapper_spark.frontier.store import SnapshotStore
        from web_scrapper_spark.operators.textops import phrase_search

        spec = SiteSpec(n_hosts=2, n_articles=24, blog_page_size=8)
        store_dir = str(tmp_path / "store")
        engine = CrawlEngine(
            spark, SnapshotStore(store_dir), pages_dataframe(spark, spec),
            robots_dataframe(spark, spec),
            CrawlConfig(index_articles=True, index_positions=True),
        )
        engine.init([(u, "content") for u in seed_urls(spec)])
        engine.run(max_epochs=20)
        # a phrase that provably exists: first two tokens of a doc
        docs = (
            engine.articles(merged=False)
            .filter(F.col("row_kind") == "full")
            .select(
                F.xxhash64("src_url").alias("doc_id"),
                F.coalesce(F.col("content"), F.lit("")).alias("text"),
            )
            .dropDuplicates(["doc_id"])
        )
        sample = docs.filter(F.length("text") > 20).first()
        phrase = " ".join(sample["text"].lower().split()[:2])
        want = [
            (r["doc_id"], r["phrase_tf"], r["first_pos"])
            for r in phrase_search(docs, phrase, k=5).collect()
        ]

        real_stop = spark.stop
        spark.stop = lambda: None
        try:
            cli_mod._spark = lambda cpus: spark
            runner = CliRunner()
            r = runner.invoke(
                cli_mod.cli,
                ["analyze", "search", "--from-store", store_dir,
                 "--phrase", phrase, "--topk", "5", "--cpus", "4"],
            )
            assert r.exit_code == 0, r.output
            rows = _json.loads(r.output.strip())
            assert [
                (x["doc_id"], x["phrase_tf"], x["first_pos"]) for x in rows
            ] == want
            assert rows and rows[0]["phrase"] == phrase

            # df gates are refused with --phrase (silent term loss)
            gated = runner.invoke(
                cli_mod.cli,
                ["analyze", "search", "--from-store", store_dir,
                 "--phrase", phrase, "--min-df", "2", "--cpus", "4"],
            )
            assert gated.exit_code != 0

            # a store indexed WITHOUT positions refuses loudly
            store2 = str(tmp_path / "store2")
            e2 = CrawlEngine(
                spark, SnapshotStore(store2), pages_dataframe(spark, spec),
                robots_dataframe(spark, spec),
                CrawlConfig(index_articles=True),
            )
            e2.init([(u, "content") for u in seed_urls(spec)])
            e2.run(max_epochs=3)
            nopos = runner.invoke(
                cli_mod.cli,
                ["analyze", "search", "--from-store", store2,
                 "--phrase", phrase, "--cpus", "4"],
            )
            assert nopos.exit_code == 2
            assert "no positions" in nopos.output
        finally:
            spark.stop = real_stop

    def test_config_validation(self, tmp_path):
        import pytest as _pytest

        from web_scrapper_spark.config import ConfigError, bind_job

        cfg = {
            "scraper": {
                "type": "content",
                "urls": ["https://h0.example.org/blog"],
                "index_positions": True,
            },
            "output": {"format": "json", "path": str(tmp_path / "o.json")},
        }
        with _pytest.raises(ConfigError, match="index_articles"):
            bind_job(cfg)
        cfg["scraper"]["index_articles"] = True
        bind_job(cfg)  # no raise


class TestSearchCliBooleanRelated:
    """analyze search boolean mode + analyze related."""

    def _docs_path(self, spark, tmp_path):
        docs = spark.createDataFrame(
            [
                (1, "rust compiler borrow checker"),
                (2, "rust compiler tutorial"),
                (3, "python compiler tutorial"),
                (4, "rust game borrow"),
            ],
            "doc_id long, text string",
        )
        dpath = str(tmp_path / "docs.parquet")
        docs.write.parquet(dpath)
        return dpath

    def test_boolean_mode(self, spark, tmp_path):
        import json as _json

        from click.testing import CliRunner

        import web_scrapper_spark.cli as cli_mod

        dpath = self._docs_path(spark, tmp_path)
        runner = CliRunner()
        r = runner.invoke(
            cli_mod.cli,
            ["analyze", "search", "-i", dpath, "--must", "rust",
             "--should", "borrow", "--should", "checker",
             "--must-not", "game", "--topk", "5", "--cpus", "4"],
        )
        assert r.exit_code == 0, r.output
        rows = _json.loads(r.output.strip())
        # doc4 excluded by must_not, doc3 by must; doc1 outranks doc2
        assert [(x["doc_id"], x["n_should"]) for x in rows] == [
            (1, 2), (2, 0)
        ]

        # boolean and -q are exclusive; multi-token clause is a usage
        # error, not a traceback
        both = runner.invoke(
            cli_mod.cli,
            ["analyze", "search", "-i", dpath, "-q", "x", "--must", "y"],
        )
        assert both.exit_code != 0
        multi = runner.invoke(
            cli_mod.cli,
            ["analyze", "search", "-i", dpath, "--must", "two words",
             "--cpus", "4"],
        )
        assert multi.exit_code != 0
        assert "exactly one term" in multi.output

    def test_related(self, spark, tmp_path):
        import json as _json

        from click.testing import CliRunner

        import web_scrapper_spark.cli as cli_mod

        dpath = self._docs_path(spark, tmp_path)
        runner = CliRunner()
        r = runner.invoke(
            cli_mod.cli,
            ["analyze", "related", "-i", dpath, "-t", "rust",
             "--window", "3", "--topk", "3", "--min-pairs", "2",
             "--cpus", "4"],
        )
        assert r.exit_code == 0, r.output
        rows = _json.loads(r.output.strip())
        assert rows and all(x["seed"] == "rust" for x in rows)
        assert [x["rank"] for x in rows] == list(range(1, len(rows) + 1))
        # 'compiler' co-occurs with rust twice within the band
        assert "compiler" in {x["term"] for x in rows}

        bad = runner.invoke(
            cli_mod.cli,
            ["analyze", "related", "-i", dpath, "-t", "  ", "--cpus", "4"],
        )
        assert bad.exit_code != 0


class TestSearchCliSuggest:
    """analyze search --suggest: did-you-mean over corpus or store."""

    def test_suggest_docs_and_guards(self, spark, tmp_path):
        import json as _json

        from click.testing import CliRunner

        import web_scrapper_spark.cli as cli_mod

        docs = spark.createDataFrame(
            [(1, "kubernetes cluster deployment"),
             (2, "kubernetes cluster")],
            "doc_id long, text string",
        )
        dpath = str(tmp_path / "docs.parquet")
        docs.write.parquet(dpath)
        runner = CliRunner()
        r = runner.invoke(
            cli_mod.cli,
            ["analyze", "search", "-i", dpath, "--suggest", "kubernets",
             "--max-edit", "1", "--topk", "3", "--cpus", "4"],
        )
        assert r.exit_code == 0, r.output
        rows = _json.loads(r.output.strip())
        assert rows[0]["suggestion"] == "kubernetes"
        assert rows[0]["distance"] == 1

        both = runner.invoke(
            cli_mod.cli,
            ["analyze", "search", "-i", dpath, "-q", "x",
             "--suggest", "y"],
        )
        assert both.exit_code != 0
        bad_edit = runner.invoke(
            cli_mod.cli,
            ["analyze", "search", "-i", dpath, "--suggest", "x",
             "--max-edit", "3", "--cpus", "4"],
        )
        assert bad_edit.exit_code != 0


class TestSearchCliCompleteKwic:
    """analyze search --complete + analyze kwic."""

    def test_complete_and_kwic(self, spark, tmp_path):
        import json as _json

        from click.testing import CliRunner

        import web_scrapper_spark.cli as cli_mod

        docs = spark.createDataFrame(
            [(1, "graph graphics graphite chart"), (2, "graph chart")],
            "doc_id long, text string",
        )
        dpath = str(tmp_path / "docs.parquet")
        docs.write.parquet(dpath)
        runner = CliRunner()
        r = runner.invoke(
            cli_mod.cli,
            ["analyze", "search", "-i", dpath, "--complete", "graph",
             "--topk", "2", "--cpus", "4"],
        )
        assert r.exit_code == 0, r.output
        rows = _json.loads(r.output.strip())
        assert [(x["term"], x["rank"]) for x in rows] == [
            ("graph", 1), ("graphics", 2)
        ]
        both = runner.invoke(
            cli_mod.cli,
            ["analyze", "search", "-i", dpath, "--complete", "g",
             "--suggest", "x"],
        )
        assert both.exit_code != 0

        k = runner.invoke(
            cli_mod.cli,
            ["analyze", "kwic", "-i", dpath, "-t", "chart",
             "--context", "2", "--cpus", "4"],
        )
        assert k.exit_code == 0, k.output
        krows = _json.loads(k.output.strip())
        assert [(x["doc_id"], x["pos"]) for x in krows] == [(1, 3), (2, 1)]
        assert krows[0]["left"] == "graphics graphite"
        assert krows[1]["left"] == "graph" and krows[1]["right"] == ""


class TestSearchCliNear:
    def test_near_docs_and_guards(self, spark, tmp_path):
        import json as _json

        from click.testing import CliRunner

        import web_scrapper_spark.cli as cli_mod

        docs = spark.createDataFrame(
            [(1, "alpha x beta"), (2, "alpha x x x x x x x x x beta"),
             (3, "beta only")],
            "doc_id long, text string",
        )
        dpath = str(tmp_path / "docs.parquet")
        docs.write.parquet(dpath)
        runner = CliRunner()
        r = runner.invoke(
            cli_mod.cli,
            ["analyze", "search", "-i", dpath, "--near", "alpha beta",
             "--near-window", "4", "--topk", "5", "--cpus", "4"],
        )
        assert r.exit_code == 0, r.output
        rows = _json.loads(r.output.strip())
        assert [(x["doc_id"], x["n_windows"]) for x in rows] == [(1, 1)]
        both = runner.invoke(
            cli_mod.cli,
            ["analyze", "search", "-i", dpath, "--near", "a",
             "-q", "b"],
        )
        assert both.exit_code != 0
