"""Deterministic synthetic web fixtures (FIXTURES.md §1-§6)."""

from .sitegen import (
    SiteSpec,
    all_urls,
    page_html,
    page_record,
    pages_dataframe,
    robots_rules,
    robots_dataframe,
    seed_urls,
    PAGES_SCHEMA,
)

__all__ = [
    "SiteSpec",
    "all_urls",
    "page_html",
    "page_record",
    "pages_dataframe",
    "robots_rules",
    "robots_dataframe",
    "seed_urls",
    "PAGES_SCHEMA",
]
