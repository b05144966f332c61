"""In-process scheduler daemon (SURVEY.md §2.9 T1).

The reference runs an APScheduler ``BackgroundScheduler`` with
``CronTrigger`` firings, a ThreadPool(20) executor and
``max_instances=3`` (``src/webscraper/schedulers/job_scheduler.py:
43-80,522-603``). On a Spark deployment the *durable* firing side
belongs to the cluster scheduler (cron + ``spark-submit``, Airflow) —
that path already exists as the ``schedule`` / ``job run-now`` CLI —
but a user who wants "start it and leave it running" gets this daemon:
a driver-side loop that

- parses each active job's 5-field cron expression
  (:func:`cron_next` — minute grain, ``* a a-b */n a,b-c/n`` forms,
  standard dom/dow OR rule),
- sleeps to the next firing across all jobs,
- fires via :meth:`JobRegistry.run_now` on a worker thread (so a slow
  crawl never blocks other jobs' firings — the ThreadPool analog),
- re-reads the registry row AT the firing, so ``pause`` wins
  mid-schedule exactly like APScheduler's ``pause_job``,
- refuses to stack more than ``max_instances`` concurrent runs of one
  job (skipped firings are reported, the reference's
  ``max_instances=3`` guard).

Everything time-shaped is injectable (``clock`` / ``sleep`` /
``spawn``) so tests drive firings deterministically with a fake clock;
the default wiring is real ``time.time``/``time.sleep`` and a daemon
thread per firing.

Cron times are evaluated in UTC (deterministic across hosts — a crawl
fleet should not fire differently per machine's /etc/localtime).
"""

from __future__ import annotations

import threading
import time
from datetime import datetime, timedelta, timezone
from typing import Callable, Dict, List, Optional

from .jobs import JobError, JobRegistry

_FIELDS = (
    ("minute", 0, 59),
    ("hour", 0, 23),
    ("dom", 1, 31),
    ("month", 1, 12),
    ("dow", 0, 6),
)


def _parse_field(spec: str, lo: int, hi: int, name: str) -> frozenset:
    """One cron field → the set of matching values. Supports ``*``,
    ``a``, ``a-b``, ``*/n``, ``a-b/n`` and comma lists; dow 7 folds to
    0 (both mean Sunday, as in Vixie cron)."""
    out: set = set()
    for part in spec.split(","):
        part = part.strip()
        step = 1
        if "/" in part:
            part, step_s = part.split("/", 1)
            if not step_s.isdigit() or int(step_s) < 1:
                raise JobError(f"bad cron step in {name!r}: {step_s!r}")
            step = int(step_s)
        if part == "*":
            a, b = lo, hi
        elif "-" in part:
            a_s, b_s = part.split("-", 1)
            if not (a_s.isdigit() and b_s.isdigit()):
                raise JobError(f"bad cron range in {name!r}: {part!r}")
            a, b = int(a_s), int(b_s)
        elif part.isdigit():
            a = b = int(part)
        else:
            raise JobError(f"bad cron field {name!r}: {part!r}")
        if name == "dow":
            # Vixie cron: 7 means Sunday too, INCLUDING as a range
            # endpoint ('5-7' = Fri,Sat,Sun). Validate and expand the
            # range with the raw endpoints (0..7), then fold each
            # produced value v%7 — folding the endpoints first would
            # turn '5-7' into 5-0 and reject a valid schedule.
            if not (0 <= a <= 7 and 0 <= b <= 7 and a <= b):
                raise JobError(
                    f"cron {name!r} value out of range [0,7]: {part!r}"
                )
            out.update(v % 7 for v in range(a, b + 1, step))
            continue
        if not (lo <= a <= hi and lo <= b <= hi and a <= b):
            raise JobError(
                f"cron {name!r} value out of range [{lo},{hi}]: {part!r}"
            )
        out.update(range(a, b + 1, step))
    return frozenset(out)


def parse_cron(expr: str) -> Dict[str, frozenset]:
    """5-field cron expression → per-field match sets. Raises
    :class:`JobError` on malformed input (checked at job create/update
    time too, so a daemon never meets an unparsable schedule cold)."""
    parts = (expr or "").split()
    if len(parts) != 5:
        raise JobError(
            f"cron expression must have 5 fields (minute hour dom month "
            f"dow): {expr!r}"
        )
    spec = {}
    for raw, (name, lo, hi) in zip(parts, _FIELDS):
        spec[name] = _parse_field(raw, lo, hi, name)
    return spec


def cron_matches(spec: Dict[str, frozenset], dt: datetime) -> bool:
    """Standard cron semantics: minute AND hour AND month always; dom
    and dow OR-combine when BOTH are restricted, AND otherwise (the
    Vixie rule). Python ``weekday()`` is Mon=0; cron dow is Sun=0."""
    if dt.minute not in spec["minute"] or dt.hour not in spec["hour"]:
        return False
    if dt.month not in spec["month"]:
        return False
    dom_any = len(spec["dom"]) == 31
    dow_any = len(spec["dow"]) == 7
    dom_ok = dt.day in spec["dom"]
    dow_ok = (dt.weekday() + 1) % 7 in spec["dow"]
    if not dom_any and not dow_any:
        return dom_ok or dow_ok
    return dom_ok and dow_ok


def cron_next(expr: str, after_ts: float) -> float:
    """Epoch seconds of the first firing STRICTLY after ``after_ts``
    (UTC, minute grain). Walks minute-by-minute with day/hour skips so
    the worst case (``0 0 29 2 *`` right after a leap day) stays a few
    thousand steps; a four-year fruitless scan raises."""
    spec = parse_cron(expr)
    dt = datetime.fromtimestamp(after_ts, tz=timezone.utc).replace(
        second=0, microsecond=0
    ) + timedelta(minutes=1)
    limit = dt + timedelta(days=4 * 366)
    dom_any = len(spec["dom"]) == 31
    dow_any = len(spec["dow"]) == 7
    while dt < limit:
        if dt.month not in spec["month"]:
            # jump to 00:00 on the 1st of the next month
            dt = (dt.replace(day=1, hour=0, minute=0)
                  + timedelta(days=32)).replace(day=1, hour=0, minute=0)
            continue
        dom_ok = dt.day in spec["dom"]
        dow_ok = (dt.weekday() + 1) % 7 in spec["dow"]
        day_ok = (
            (dom_ok or dow_ok)
            if (not dom_any and not dow_any)
            else (dom_ok and dow_ok)
        )
        if not day_ok:
            dt = dt.replace(hour=0, minute=0) + timedelta(days=1)
            continue
        if dt.hour not in spec["hour"]:
            dt = dt.replace(minute=0) + timedelta(hours=1)
            continue
        if dt.minute in spec["minute"]:
            return dt.timestamp()
        dt += timedelta(minutes=1)
    raise JobError(f"cron expression never fires: {expr!r}")


class JobDaemon:
    """The reference's BackgroundScheduler analog over the manifest-
    backed :class:`JobRegistry` — see module docstring. One instance
    owns one registry directory; ``run()`` blocks until ``stop()`` or
    a firing budget is reached."""

    def __init__(
        self,
        registry: JobRegistry,
        runner: Optional[Callable[[dict], dict]] = None,
        *,
        spark_factory: Optional[Callable] = None,
        max_instances: int = 3,
        clock: Callable[[], float] = time.time,
        sleep: Callable[[float], None] = time.sleep,
        spawn: Optional[Callable[[Callable[[], None]], None]] = None,
        epochs_per_firing: int = 1,
        max_sleep: float = 30.0,
    ):
        if max_instances < 1:
            raise JobError("max_instances must be >= 1")
        self.registry = registry
        self._runner = runner
        self._spark_factory = spark_factory
        self._spark = None
        self.max_instances = max_instances
        self.clock = clock
        self.sleep = sleep
        self.spawn = spawn or self._thread_spawn
        self.epochs_per_firing = epochs_per_firing
        self.max_sleep = max_sleep
        self._running: Dict[str, int] = {}
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self.fired: List[dict] = []
        self.skipped: List[dict] = []

    @staticmethod
    def _thread_spawn(fn: Callable[[], None]) -> None:
        threading.Thread(target=fn, daemon=True).start()

    def stop(self) -> None:
        self._stop.set()

    # -- firing ------------------------------------------------------------
    def _default_runner(self, job: dict) -> dict:
        if self._spark is None:
            if self._spark_factory is None:
                from ..session import get_spark

                self._spark_factory = get_spark
            self._spark = self._spark_factory()
        results = self.registry.run_now(
            self._spark, job["job_id"], epochs=self.epochs_per_firing
        )
        return {"results": len(results)}

    def _fire(self, job: dict, at_ts: float) -> None:
        """One scheduled firing. The registry row is RE-READ here so a
        pause committed after the schedule was computed still wins
        (APScheduler pause_job semantics); the max_instances counter is
        checked-and-bumped under the lock so overlapping firings of a
        slow job skip instead of stacking."""
        try:
            fresh = self.registry.get(job["job_id"])
        except JobError:
            self.skipped.append(
                {"job_id": job["job_id"], "at": at_ts, "reason": "deleted"}
            )
            return
        if fresh["status"] == "paused":
            self.skipped.append(
                {"job_id": fresh["job_id"], "at": at_ts, "reason": "paused"}
            )
            return
        with self._lock:
            if self._running.get(fresh["job_id"], 0) >= self.max_instances:
                self.skipped.append(
                    {
                        "job_id": fresh["job_id"],
                        "at": at_ts,
                        "reason": "max_instances",
                    }
                )
                return
            self._running[fresh["job_id"]] = (
                self._running.get(fresh["job_id"], 0) + 1
            )
        runner = self._runner or self._default_runner

        def work() -> None:
            try:
                out = runner(fresh)
                self.fired.append(
                    {"job_id": fresh["job_id"], "at": at_ts, "result": out}
                )
            except Exception as exc:  # a failed run must not kill the loop
                self.fired.append(
                    {"job_id": fresh["job_id"], "at": at_ts,
                     "error": str(exc)}
                )
            finally:
                with self._lock:
                    self._running[fresh["job_id"]] -= 1

        self.spawn(work)

    # -- the loop ----------------------------------------------------------
    def _schedule(self, now: float) -> List[tuple]:
        """(next_fire_ts, job_row) for every active-or-paused job with
        a cron expression, soonest first. Paused jobs stay ON the
        schedule (their firings are skipped at fire time) so a resume
        takes effect at the very next cron match, not a loop rebuild."""
        out = []
        for row in self.registry.list():
            if not row.get("cron_expression"):
                continue
            try:
                out.append((cron_next(row["cron_expression"], now), row))
            except JobError:
                self.skipped.append(
                    {"job_id": row["job_id"], "at": now, "reason": "bad_cron"}
                )
        out.sort(key=lambda t: (t[0], t[1]["job_id"]))
        return out

    def _busy(self) -> int:
        with self._lock:
            return sum(self._running.values())

    def run(
        self,
        max_firings: Optional[int] = None,
        until_ts: Optional[float] = None,
        drain: bool = True,
    ) -> dict:
        """Block and fire. ``max_firings`` counts fire ATTEMPTS
        (fired + skipped — a skip consumes the firing it replaced);
        ``until_ts`` is a wall-clock stop. ``drain`` waits for
        in-flight worker threads before returning (so a bounded run
        reports completed work; pass False to abandon stragglers).
        Returns a summary report."""
        attempts = 0
        while not self._stop.is_set():
            now = self.clock()
            if until_ts is not None and now >= until_ts:
                break
            schedule = self._schedule(now)
            if not schedule:
                break  # nothing schedulable: a daemon with no jobs exits
            next_ts, _ = schedule[0]
            if until_ts is not None and next_ts > until_ts:
                break
            while self.clock() < next_ts and not self._stop.is_set():
                self.sleep(min(self.max_sleep, next_ts - self.clock()))
            if self._stop.is_set():
                break
            # fire EVERY job due at this minute (deterministic id order)
            for ts, row in schedule:
                if ts != next_ts:
                    break
                self._fire(row, ts)
                attempts += 1
                if max_firings is not None and attempts >= max_firings:
                    self._stop.set()
                    break
        while drain and self._busy() > 0:
            self.sleep(0.05)
        return {
            "fired": len(self.fired),
            "skipped": len(self.skipped),
            "attempts": attempts,
        }


__all__ = ["JobDaemon", "cron_next", "cron_matches", "parse_cron"]
