"""Job scheduling surface (SURVEY.md §2.9 T1–T5)."""

from .jobs import JobError, JobRegistry

__all__ = ["JobError", "JobRegistry"]
