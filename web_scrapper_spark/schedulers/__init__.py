"""Job scheduling surface (SURVEY.md §2.9 T1–T5) + notifications (T4)."""

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
    "EmailSender",
    "WebhookSender",
    "NotificationLog",
    "build_payload",
    "dispatch",
]
