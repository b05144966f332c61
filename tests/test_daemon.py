"""In-process scheduler daemon (schedulers/daemon.py — T1 parity with
the reference's BackgroundScheduler+CronTrigger+max_instances loop).

Everything runs on a FAKE clock: sleep() advances simulated time, so
two firings of an every-minute job take microseconds of real time and
the assertions are exact.
"""

import json
from datetime import datetime, timezone

import pytest

from web_scrapper_spark.schedulers import (
    JobDaemon,
    JobError,
    JobRegistry,
    cron_next,
    parse_cron,
)


def _ts(*args) -> float:
    return datetime(*args, tzinfo=timezone.utc).timestamp()


class FakeClock:
    def __init__(self, t0: float):
        self.t = t0

    def __call__(self) -> float:
        return self.t

    def sleep(self, seconds: float) -> None:
        assert seconds >= 0
        self.t += max(seconds, 0.001)


def _write_cfg(tmp_path) -> str:
    cfg = {
        "scraper": {
            "type": "content",
            "urls": ["https://host1.example-crawl.org/blog"],
            "selectors": {},
        }
    }
    path = tmp_path / "job.json"
    path.write_text(json.dumps(cfg))
    return str(path)


class TestCron:
    def test_next_firing_times(self):
        after = _ts(2026, 3, 4, 12, 7, 30)  # a Wednesday
        assert cron_next("*/15 * * * *", after) == _ts(2026, 3, 4, 12, 15)
        assert cron_next("* * * * *", after) == _ts(2026, 3, 4, 12, 8)
        assert cron_next("0 3 * * *", after) == _ts(2026, 3, 5, 3, 0)
        assert cron_next("5 12 * * *", after) == _ts(2026, 3, 5, 12, 5)
        # dow: next Monday (Sun=0, Mon=1); 7 folds to Sunday
        assert cron_next("0 0 * * 1", after) == _ts(2026, 3, 9, 0, 0)
        assert cron_next("0 0 * * 0", after) == cron_next(
            "0 0 * * 7", after
        ) == _ts(2026, 3, 8, 0, 0)
        # month skip + leap day
        assert cron_next("30 2 29 2 *", after) == _ts(2028, 2, 29, 2, 30)
        # dom/dow BOTH restricted -> OR (Vixie rule): the 13th or Friday
        assert cron_next("0 0 13 * 5", after) == _ts(2026, 3, 6, 0, 0)
        # lists and ranges
        assert cron_next("10,40 9-10 * * *", _ts(2026, 3, 4, 9, 41)) == _ts(
            2026, 3, 4, 10, 10
        )

    def test_firing_is_strictly_after(self):
        at = _ts(2026, 3, 4, 12, 0, 0)
        assert cron_next("0 12 * * *", at) == _ts(2026, 3, 5, 12, 0)

    def test_dow_ranges_ending_in_seven(self):
        """Review fix (round 4): '5-7' is valid Vixie cron for
        Fri,Sat,Sun — the 7→0 fold must apply to PRODUCED values, not
        to range endpoints (folding endpoints first turned 5-7 into
        the inverted 5-0 and rejected the schedule)."""
        assert parse_cron("* * * * 5-7")["dow"] == frozenset({5, 6, 0})
        assert parse_cron("* * * * 0-7")["dow"] == frozenset(range(7))
        assert parse_cron("* * * * 6-7")["dow"] == frozenset({6, 0})
        # stepped range through 7: 1-7/2 = {1,3,5,7} -> {1,3,5,0}
        assert parse_cron("* * * * 1-7/2")["dow"] == frozenset({1, 3, 5, 0})
        # single 7 still folds; plain ranges unchanged
        assert parse_cron("* * * * 7")["dow"] == frozenset({0})
        assert parse_cron("* * * * 1-5")["dow"] == frozenset({1, 2, 3, 4, 5})
        # next-firing walk agrees: Fri after a Wednesday
        after = _ts(2026, 3, 4, 12, 7, 30)  # Wednesday
        assert cron_next("0 0 * * 5-7", after) == _ts(2026, 3, 6, 0, 0)
        # out-of-range dow still rejected
        for bad in ("* * * * 8", "* * * * 5-9", "* * * * 7-5"):
            with pytest.raises(JobError):
                parse_cron(bad)

    def test_parse_errors(self):
        for bad in (
            "* * * *",            # 4 fields
            "61 * * * *",         # out of range
            "* * 0 * *",          # dom starts at 1
            "*/0 * * * *",        # zero step
            "a * * * *",          # garbage
            "5-1 * * * *",        # inverted range
        ):
            with pytest.raises(JobError):
                parse_cron(bad)

    def test_registry_validates_cron_at_create_and_update(self, tmp_path):
        reg = JobRegistry(str(tmp_path / "jobs"))
        cfg = _write_cfg(tmp_path)
        with pytest.raises(JobError):
            reg.create("j", cfg, "pages", cron_expression="not a cron")
        job_id = reg.create("j", cfg, "pages", cron_expression="* * * * *")
        with pytest.raises(JobError):
            reg.update(job_id, cron_expression="99 * * * *")


class TestJobDaemon:
    def _registry(self, tmp_path, cron="* * * * *"):
        reg = JobRegistry(str(tmp_path / "jobs"))
        job_id = reg.create(
            "everyminute", _write_cfg(tmp_path), "pages",
            cron_expression=cron,
        )
        return reg, job_id

    def test_two_firings_on_fake_clock(self, tmp_path):
        reg, job_id = self._registry(tmp_path)
        clock = FakeClock(_ts(2026, 3, 4, 12, 0, 30))
        calls = []
        daemon = JobDaemon(
            reg,
            runner=lambda job: calls.append(job["job_id"]) or {"ok": True},
            clock=clock,
            sleep=clock.sleep,
            spawn=lambda fn: fn(),
        )
        report = daemon.run(max_firings=2)
        assert report == {"fired": 2, "skipped": 0, "attempts": 2}
        assert calls == [job_id, job_id]
        assert [f["at"] for f in daemon.fired] == [
            _ts(2026, 3, 4, 12, 1), _ts(2026, 3, 4, 12, 2)
        ]

    def test_pause_respected_mid_schedule(self, tmp_path):
        reg, job_id = self._registry(tmp_path)
        clock = FakeClock(_ts(2026, 3, 4, 12, 0, 30))

        def runner(job):
            reg.pause(job["job_id"])  # pause AFTER the first run
            return {"ok": True}

        daemon = JobDaemon(
            reg, runner=runner, clock=clock, sleep=clock.sleep,
            spawn=lambda fn: fn(),
        )
        report = daemon.run(max_firings=2)
        assert report["fired"] == 1 and report["skipped"] == 1
        assert daemon.skipped[0]["reason"] == "paused"
        # resume puts it back on the live schedule
        reg.resume(job_id)
        report2 = JobDaemon(
            reg, runner=lambda j: {"ok": True}, clock=clock,
            sleep=clock.sleep, spawn=lambda fn: fn(),
        ).run(max_firings=1)
        assert report2["fired"] == 1

    def test_max_instances_guard(self, tmp_path):
        reg, job_id = self._registry(tmp_path)
        clock = FakeClock(_ts(2026, 3, 4, 12, 0, 30))
        pending = []  # spawned work held un-run: simulates slow crawls
        daemon = JobDaemon(
            reg,
            runner=lambda job: {"ok": True},
            clock=clock,
            sleep=clock.sleep,
            spawn=pending.append,
            max_instances=2,
        )
        report = daemon.run(max_firings=3, drain=False)
        # firings 1+2 spawned; firing 3 skipped: 2 instances still live
        assert len(pending) == 2
        assert report["skipped"] == 1
        assert daemon.skipped[0]["reason"] == "max_instances"
        for fn in pending:  # let them finish -> counters drain to zero
            fn()
        assert daemon._running[job_id] == 0
        assert len(daemon.fired) == 2

    def test_failed_run_does_not_kill_loop(self, tmp_path):
        reg, _job_id = self._registry(tmp_path)
        clock = FakeClock(_ts(2026, 3, 4, 12, 0, 30))
        boom = {"n": 0}

        def runner(job):
            boom["n"] += 1
            if boom["n"] == 1:
                raise RuntimeError("crawl exploded")
            return {"ok": True}

        daemon = JobDaemon(
            reg, runner=runner, clock=clock, sleep=clock.sleep,
            spawn=lambda fn: fn(),
        )
        report = daemon.run(max_firings=2)
        assert report["fired"] == 2
        assert "error" in daemon.fired[0]
        assert daemon.fired[1]["result"] == {"ok": True}

    def test_no_schedulable_jobs_exits(self, tmp_path):
        reg = JobRegistry(str(tmp_path / "jobs"))
        reg.create("uncronned", _write_cfg(tmp_path), "pages")
        daemon = JobDaemon(
            reg, runner=lambda j: {}, clock=FakeClock(0.0),
            sleep=lambda s: None, spawn=lambda fn: fn(),
        )
        assert daemon.run() == {"fired": 0, "skipped": 0, "attempts": 0}

    def test_until_ts_stops_before_next_firing(self, tmp_path):
        reg, _job_id = self._registry(tmp_path, cron="0 3 * * *")
        clock = FakeClock(_ts(2026, 3, 4, 12, 0, 30))
        daemon = JobDaemon(
            reg, runner=lambda j: {}, clock=clock, sleep=clock.sleep,
            spawn=lambda fn: fn(),
        )
        report = daemon.run(until_ts=_ts(2026, 3, 4, 13, 0))
        assert report["fired"] == 0
        assert clock() < _ts(2026, 3, 4, 13, 1)
