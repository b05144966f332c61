"""Manifest-backed crawl-job registry (SURVEY.md §2.9 T1/T3/T5).

The reference's ``JobScheduler`` (job_scheduler.py:522-859) keeps job
metadata in sqlite and delegates firing to an in-process APScheduler:
schedule_job / get_jobs / get_job / run_job_now / pause_job /
resume_job / update_job / delete_job. On a Spark cluster the firing
side belongs to the cluster scheduler (cron + spark-submit, Airflow,
…), so this module keeps the *job-control* surface — the part users
drive — and stores it in an atomic JSON registry next to the snapshot
stores:

- a job binds a config to a pages table and a snapshot store; its
  durable execution state is the store's epoch manifest (T2), so
  ``run_now`` is always resume-or-init and a job can be paused mid
  crawl and picked up epochs later with no lost state;
- ``pause``/``resume`` flip a status flag that ``run_now`` (and the
  CLI ``schedule`` command) refuse to cross — the APScheduler
  pause_job/resume_job analog (job_scheduler.py:722-760);
- ``update`` re-validates the new config before committing, exactly
  like the reference's update_job (job_scheduler.py:762-859);
- ``delete`` removes the registry row and optionally the store dir
  (job_scheduler.py:661-694 removes metadata only; data removal is
  explicit here because stores are big).

The registry file is swapped atomically (write-temp + ``os.replace``)
like the snapshot manifest, so readers never see a torn registry, and
every read-modify-write holds an exclusive ``flock`` on a sidecar lock
file so concurrent CLI invocations cannot lose each other's updates
(load -> mutate -> replace without the lock would let the second
writer silently erase the first's mutation).
"""

from __future__ import annotations

import fcntl
import json
import os
import shutil
import time
import uuid
from contextlib import contextmanager
from typing import Any, Dict, List, Optional

from ..config import ConfigError, bind_job, load_config

REGISTRY = "_jobs.json"


class JobError(ValueError):
    """Raised for unknown job ids and invalid job mutations (the
    reference's SchedulingError analog)."""


class JobRegistry:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- persistence -------------------------------------------------------
    def _path(self) -> str:
        return os.path.join(self.root, REGISTRY)

    def _load(self) -> Dict[str, Dict[str, Any]]:
        if not os.path.exists(self._path()):
            return {}
        with open(self._path()) as fh:
            return json.load(fh)

    def _save(self, jobs: Dict[str, Dict[str, Any]]) -> None:
        tmp = self._path() + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(jobs, fh, indent=1, sort_keys=True)
        os.replace(tmp, self._path())

    @contextmanager
    def _locked(self):
        """Exclusive cross-process lock for load->mutate->save: two
        concurrent CLI mutations must serialize or the later _save
        silently erases the earlier one's change."""
        with open(self._path() + ".lock", "w") as fh:
            fcntl.flock(fh, fcntl.LOCK_EX)
            try:
                yield
            finally:
                fcntl.flock(fh, fcntl.LOCK_UN)

    # -- job control -------------------------------------------------------
    def create(
        self,
        name: str,
        config_path: str,
        pages_path: str,
        store_dir: Optional[str] = None,
        cron_expression: Optional[str] = None,
        metadata: Optional[Dict[str, Any]] = None,
        email: Optional[str] = None,
        webhook: Optional[str] = None,
    ) -> str:
        """Register a job (schedule_job analog). The config is bound
        NOW so a broken config fails at create time, not at first
        firing; email/webhook are validated like the reference's
        schedule_job (job_scheduler.py:556-569). Returns the job id."""
        if not os.path.exists(config_path):
            raise JobError(f"configuration file not found: {config_path}")
        bind_job(load_config(config_path))  # raises ConfigError if invalid
        self._validate_notify(email, webhook)
        if cron_expression is not None:
            from .daemon import parse_cron  # lazy: daemon imports jobs

            parse_cron(cron_expression)  # fail at create, not first firing
        job_id = str(uuid.uuid4())
        with self._locked():
            jobs = self._load()
            jobs[job_id] = {
                "job_id": job_id,
                "name": name,
                "config_path": os.path.abspath(config_path),
                "pages_path": pages_path,
                "store_dir": os.path.abspath(
                    store_dir or os.path.join(self.root, f"store-{job_id[:8]}")
                ),
                "cron_expression": cron_expression,
                "metadata": metadata or {},
                "email": email,
                "webhook": webhook,
                "status": "active",
                "created_at": time.time(),
                "updated_at": time.time(),
                "run_count": 0,
                "last_run_at": None,
                "last_epoch": None,
            }
            self._save(jobs)
        return job_id

    def get(self, job_id: str) -> Dict[str, Any]:
        jobs = self._load()
        job = jobs.get(job_id) or next(
            (j for j in jobs.values() if j["name"] == job_id), None
        )
        if job is None:
            raise JobError(f"no such job: {job_id}")
        return job

    def list(self) -> List[Dict[str, Any]]:
        return sorted(self._load().values(), key=lambda j: j["created_at"])

    def pause(self, job_id: str) -> Dict[str, Any]:
        return self._set_status(job_id, "paused")

    def resume(self, job_id: str) -> Dict[str, Any]:
        return self._set_status(job_id, "active")

    def _set_status(self, job_id: str, status: str) -> Dict[str, Any]:
        job = self.get(job_id)
        with self._locked():
            jobs = self._load()
            jobs[job["job_id"]]["status"] = status
            jobs[job["job_id"]]["updated_at"] = time.time()
            self._save(jobs)
        return jobs[job["job_id"]]

    def update(self, job_id: str, **changes) -> Dict[str, Any]:
        """update_job analog: only known fields, config re-validated
        before the registry is touched."""
        allowed = {
            "name", "config_path", "pages_path", "store_dir",
            "cron_expression", "metadata", "email", "webhook",
        }
        unknown = set(changes) - allowed
        if unknown:
            raise JobError(f"unknown job fields: {sorted(unknown)}")
        job = self.get(job_id)
        self._validate_notify(changes.get("email"), changes.get("webhook"))
        if changes.get("cron_expression") is not None:
            from .daemon import parse_cron

            parse_cron(changes["cron_expression"])
        if "config_path" in changes:
            if not os.path.exists(changes["config_path"]):
                raise JobError(
                    f"configuration file not found: {changes['config_path']}"
                )
            bind_job(load_config(changes["config_path"]))
            changes["config_path"] = os.path.abspath(changes["config_path"])
        with self._locked():
            jobs = self._load()
            jobs[job["job_id"]].update(changes)
            jobs[job["job_id"]]["updated_at"] = time.time()
            self._save(jobs)
        return jobs[job["job_id"]]

    @staticmethod
    def _validate_notify(email: Optional[str], webhook: Optional[str]) -> None:
        """Reference schedule_job validation (job_scheduler.py:556-569)."""
        from ..validators import is_valid_email, is_valid_url

        if email and not is_valid_email(email):
            raise JobError(f"invalid email address: {email}")
        if webhook and not is_valid_url(webhook):
            raise JobError(f"invalid webhook URL: {webhook}")

    def notification_log(self):
        from .notifications import NotificationLog

        return NotificationLog(os.path.join(self.root, "_notifications.jsonl"))

    def delete(self, job_id: str, remove_store: bool = False) -> None:
        """delete_job analog. ``remove_store`` additionally deletes the
        job's snapshot store — explicit, because unlike the reference's
        sqlite row the store holds the crawl data itself."""
        job = self.get(job_id)
        with self._locked():
            jobs = self._load()
            del jobs[job["job_id"]]
            self._save(jobs)
        if remove_store and os.path.isdir(job["store_dir"]):
            shutil.rmtree(job["store_dir"], ignore_errors=True)

    # -- execution ---------------------------------------------------------
    def run_now(
        self,
        spark,
        job_id: str,
        epochs: int = 1,
        epoch_seconds: float = 8.0,
        robots: str = "none",
        force: bool = False,
        senders: Optional[List] = None,
    ) -> List[Dict[str, Any]]:
        """run_job_now analog: run ``epochs`` more crawl epochs,
        resume-or-init from the job's store. Refuses paused jobs unless
        ``force`` (the reference fires paused jobs only through the
        explicit run_job_now path — ``force`` models that). After the
        run — success OR failure — the job's configured email/webhook
        notifications fire (T4); ``senders`` overrides them for tests.
        Notification failures never fail the run."""
        from ..crawl.epoch import CrawlEngine
        from ..frontier.store import SnapshotStore

        job = self.get(job_id)
        if job["status"] == "paused" and not force:
            raise JobError(f"job {job['job_id']} is paused; resume it or force")
        try:
            bound = bind_job(load_config(job["config_path"]))
            pages = spark.read.parquet(job["pages_path"])
            if robots == "from-pages":
                from ..frontier.robots import robots_from_pages

                # `delay: 0` is an explicit "no rate limit" (the
                # politeness path treats <=0 as unlimited) — only an
                # ABSENT delay falls back to the reference's 2 s default
                robots_df = robots_from_pages(
                    pages,
                    default_delay=(
                        2.0 if bound.crawl_delay is None else bound.crawl_delay
                    ),
                )
            elif robots and robots != "none":
                robots_df = spark.read.parquet(robots)
            else:
                robots_df = None
            store = SnapshotStore(job["store_dir"])
            cfg = bound.crawl_config(epoch_seconds)
            if store.last_epoch() is None:
                engine = CrawlEngine(spark, store, pages, robots_df, cfg)
                engine.init(bound.seeds)
            else:
                engine = CrawlEngine.resume(spark, store, pages, robots_df, cfg)
            results = []
            revisits = 0
            revisit_tried = False
            for _ in range(epochs):
                result = engine.run_epoch()
                if (
                    result.get("done")
                    and bound.revisit is not None
                    and not revisit_tried
                ):
                    # config-driven continuous crawl: a drained frontier
                    # asks the freshness scheduler for due urls ONCE per
                    # invocation; cron fires run_now, so each firing
                    # fetches at most one revisit wave
                    revisit_tried = True
                    rv = bound.revisit
                    hints_df = None
                    if rv["hints"] == "from-sitemaps":
                        from ..frontier.sitemap import sitemap_hints

                        hints_df = sitemap_hints(pages)
                    # a configured modified_since is applied ONCE per
                    # store: the rule compares publisher lastmod to the
                    # constant cutoff (no fetch-recency term exists in
                    # the epoch clock), so re-passing it every cron
                    # firing would refetch the matching subset forever
                    ms = rv["modified_since"]
                    if ms is not None and any(
                        e.get("metrics", {}).get("modified_since") == ms
                        for e in store.manifest()["epochs"]
                    ):
                        ms = None
                    revisits = engine.enqueue_revisits(
                        hints=hints_df,
                        epoch_hours=rv["epoch_hours"],
                        default_hours=rv["default_hours"],
                        modified_since=ms,
                    )
                    if revisits:
                        continue  # next iteration fetches the wave
                results.append(result)
                if result.get("done"):
                    break
        except Exception as exc:
            self._notify(job, "failure", error=str(exc), senders=senders)
            raise
        with self._locked():
            jobs = self._load()
            row = jobs[job["job_id"]]
            row["run_count"] += 1
            row["last_run_at"] = time.time()
            # the store manifest is authoritative: a drained-frontier
            # sentinel result carries epoch N+1 that never ran or
            # committed, so recording results[-1]["epoch"] would point
            # job metadata at a nonexistent epoch
            last = store.last_epoch()
            row["last_epoch"] = last["epoch"] if last else None
            self._save(jobs)
        report = {
            "epochs": len([r for r in results if not r.get("done")]),
            "revisits": revisits,
            "urls_total": sum(r.get("dequeued", 0) for r in results),
            "urls_visited": sum(r.get("fetched_ok", 0) for r in results),
            "urls_failed": sum(r.get("failed_parked", 0) for r in results),
            "duration_seconds": round(
                sum(r.get("duration_s", 0) for r in results), 3
            ),
        }
        self._notify(job, "success", report=report, senders=senders)
        return results

    def _notify(
        self,
        job: Dict[str, Any],
        status: str,
        report: Optional[Dict[str, Any]] = None,
        error: Optional[str] = None,
        senders: Optional[List] = None,
    ) -> None:
        """T4 dispatch (reference _send_notifications,
        job_scheduler.py:259-316): email + webhook when configured,
        every attempt logged, exceptions swallowed."""
        from .notifications import EmailSender, WebhookSender, build_payload, dispatch

        if senders is None:
            senders = []
            if job.get("email"):
                senders.append(EmailSender(to=job["email"]))
            if job.get("webhook"):
                senders.append(WebhookSender(job["webhook"]))
        if not senders:
            return
        payload = build_payload(
            job["job_id"], job["name"], status, report=report, error=error
        )
        dispatch(payload, senders, log=self.notification_log())


__all__ = ["JobError", "JobRegistry", "ConfigError"]
