"""Checkpointed crawl epochs + the sequential parity oracle."""

from .epoch import CrawlConfig, CrawlEngine

__all__ = ["CrawlConfig", "CrawlEngine"]
