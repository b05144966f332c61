"""Job scheduling surface (SURVEY.md §2.9 T1–T5) + notifications (T4)."""

from .daemon import JobDaemon, cron_matches, cron_next, parse_cron
from .jobs import JobError, JobRegistry
from .notifications import (
    EmailSender,
    NotificationLog,
    WebhookSender,
    build_payload,
    dispatch,
)

__all__ = [
    "JobError",
    "JobRegistry",
    "JobDaemon",
    "cron_next",
    "cron_matches",
    "parse_cron",
    "EmailSender",
    "WebhookSender",
    "NotificationLog",
    "build_payload",
    "dispatch",
]
