"""Job-completion notifications (SURVEY.md §2.9 T4).

Spark-native analog of the reference's notification stack
(job_scheduler.py:259-484): after a job run, an email and/or a webhook
fires with the run report; failures to notify are logged, never fatal.

Design differences for the engine model:

- **Durable record.** Every notification attempt (payload + per-sender
  outcome) is appended to the registry's ``_notifications.jsonl`` — an
  operator auditing a crawl sees what fired and what failed regardless
  of SMTP health. The reference keeps no record of sends at all.
- **Injectable transports.** ``EmailSender``/``WebhookSender`` take a
  transport/opener factory so the senders are unit-testable and the
  sandbox (no outbound network) exercises the full path. The real
  defaults are stdlib ``smtplib.SMTP`` and ``urllib.request`` (the
  reference uses smtplib + requests: job_scheduler.py:423-426,473-477).
- **Deterministic timestamps.** ``now`` is injectable; data paths never
  call ``datetime.now()`` themselves (F20).

SMTP configuration mirrors the reference's env vars
(WEBSCRAPER_SMTP_SERVER/PORT/USERNAME/PASSWORD,
job_scheduler.py:340-343); missing credentials skip the email with a
warning exactly as the reference does (job_scheduler.py:345-347).
"""

from __future__ import annotations

import json
import logging
import os
import urllib.request
from datetime import datetime, timezone
from email.mime.multipart import MIMEMultipart
from email.mime.text import MIMEText
from typing import Any, Dict, List, Optional

logger = logging.getLogger(__name__)

#: webhook payloads embed results only below this size
#: (job_scheduler.py:460 — 1 MB limit)
WEBHOOK_RESULTS_LIMIT = 1024 * 1024


def build_payload(
    job_id: str,
    job_name: str,
    status: str,
    report: Optional[Dict[str, Any]] = None,
    results: Optional[List[Dict[str, Any]]] = None,
    error: Optional[str] = None,
    now: Optional[datetime] = None,
) -> Dict[str, Any]:
    """The notification body — identical shape to the reference's
    webhook JSON (job_scheduler.py:447-468): report+results on
    success (results elided over 1 MB), error on failure."""
    stamp = (now or datetime.now(timezone.utc)).isoformat()
    data: Dict[str, Any] = {
        "job_id": job_id,
        "job_name": job_name,
        "status": status,
        "timestamp": stamp,
    }
    if status == "success":
        data["report"] = report or {}
        if results is not None:
            if len(json.dumps(results)) <= WEBHOOK_RESULTS_LIMIT:
                data["results"] = results
            else:
                data["results_summary"] = {
                    "count": len(results),
                    "message": "Results too large to include in webhook notification",
                }
    else:
        data["error"] = error
    return data


def build_email(payload: Dict[str, Any], to: str, sender: str) -> MIMEMultipart:
    """Success/failure email matching the reference's subjects and HTML
    body structure (job_scheduler.py:353-420)."""
    msg = MIMEMultipart()
    msg["From"] = sender
    msg["To"] = to
    name = payload["job_name"]
    if payload["status"] == "success":
        msg["Subject"] = f"Web Scraper Job '{name}' Completed Successfully"
        rows = "".join(
            f"<li><strong>{k}:</strong> {v}</li>"
            for k, v in (payload.get("report") or {}).items()
        )
        body = (
            "<html><body><h2>Web Scraper Job Completed Successfully</h2>"
            f"<p><strong>Job ID:</strong> {payload['job_id']}</p>"
            f"<p><strong>Job Name:</strong> {name}</p>"
            f"<p><strong>Status:</strong> {payload['status']}</p>"
            f"<p><strong>Timestamp:</strong> {payload['timestamp']}</p>"
            f"<h3>Report</h3><ul>{rows}</ul></body></html>"
        )
        if "results" in payload:
            attachment = MIMEText(json.dumps(payload["results"], indent=2))
            attachment.add_header(
                "Content-Disposition", "attachment", filename="results.json"
            )
            msg.attach(attachment)
    else:
        msg["Subject"] = f"Web Scraper Job '{name}' Failed"
        body = (
            "<html><body><h2>Web Scraper Job Failed</h2>"
            f"<p><strong>Job ID:</strong> {payload['job_id']}</p>"
            f"<p><strong>Job Name:</strong> {name}</p>"
            f"<p><strong>Status:</strong> {payload['status']}</p>"
            f"<p><strong>Timestamp:</strong> {payload['timestamp']}</p>"
            f"<h3>Error</h3><pre>{payload.get('error')}</pre></body></html>"
        )
    msg.attach(MIMEText(body, "html"))
    return msg


class EmailSender:
    """SMTP sender; ``transport`` is a factory ``(server, port) ->
    context manager`` with starttls/login/send_message (defaults to
    smtplib.SMTP). Missing credentials → skip with a warning, exactly
    the reference's behavior."""

    def __init__(
        self,
        to: str,
        server: Optional[str] = None,
        port: Optional[int] = None,
        username: Optional[str] = None,
        password: Optional[str] = None,
        transport=None,
    ):
        self.to = to
        self.server = server or os.environ.get(
            "WEBSCRAPER_SMTP_SERVER", "smtp.gmail.com"
        )
        self.port = port or int(os.environ.get("WEBSCRAPER_SMTP_PORT", "587"))
        self.username = username or os.environ.get("WEBSCRAPER_SMTP_USERNAME")
        self.password = password or os.environ.get("WEBSCRAPER_SMTP_PASSWORD")
        if transport is None:
            import smtplib

            transport = smtplib.SMTP
        self.transport = transport

    kind = "email"

    def send(self, payload: Dict[str, Any]) -> bool:
        if not self.username or not self.password:
            logger.warning(
                "SMTP credentials not configured, skipping email notification"
            )
            return False
        msg = build_email(payload, to=self.to, sender=self.username)
        with self.transport(self.server, self.port) as server:
            server.starttls()
            server.login(self.username, self.password)
            server.send_message(msg)
        return True


class WebhookSender:
    """POSTs the payload as JSON; ``opener`` defaults to
    urllib.request.urlopen (the reference uses requests.post —
    job_scheduler.py:473-477). 2xx = delivered."""

    def __init__(self, url: str, opener=None, timeout: float = 10.0):
        self.url = url
        self.opener = opener or urllib.request.urlopen
        self.timeout = timeout

    kind = "webhook"

    def send(self, payload: Dict[str, Any]) -> bool:
        req = urllib.request.Request(
            self.url,
            data=json.dumps(payload).encode("utf-8"),
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        with self.opener(req, timeout=self.timeout) as resp:
            code = getattr(resp, "status", getattr(resp, "code", None))
        ok = code is not None and 200 <= code < 300
        if not ok:
            logger.warning("webhook notification failed: HTTP %s", code)
        return ok


class NotificationLog:
    """Append-only JSONL record of every notification attempt + its
    per-sender outcomes — the durable audit trail."""

    def __init__(self, path: str):
        self.path = path

    def append(self, payload: Dict[str, Any], outcomes: Dict[str, Any]) -> None:
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        with open(self.path, "a") as fh:
            fh.write(json.dumps({**payload, "deliveries": outcomes}) + "\n")

    def read(self) -> List[Dict[str, Any]]:
        if not os.path.exists(self.path):
            return []
        with open(self.path) as fh:
            return [json.loads(line) for line in fh if line.strip()]


def dispatch(
    payload: Dict[str, Any],
    senders: List,
    log: Optional[NotificationLog] = None,
) -> Dict[str, Any]:
    """Fire every sender; a sender's exception is recorded, never
    raised (the reference logs and continues,
    job_scheduler.py:288-316). Returns one outcome PER SENDER, keyed
    ``kind`` for the first sender of a kind and ``kind#i`` for
    repeats — two webhooks must not overwrite each other's outcome in
    the audit log."""
    outcomes: Dict[str, Any] = {}
    for i, sender in enumerate(senders):
        key = sender.kind if sender.kind not in outcomes else f"{sender.kind}#{i}"
        try:
            outcomes[key] = "sent" if sender.send(payload) else "skipped"
        except Exception as exc:  # noqa: BLE001 — notify must never kill the job
            logger.error("error sending %s notification: %s", sender.kind, exc)
            outcomes[key] = f"error: {exc}"
    if log is not None:
        log.append(payload, outcomes)
    return outcomes
