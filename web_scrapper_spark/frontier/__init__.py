"""URL frontier + seen-set engine (SURVEY.md §2.3 J3/J4, §2.5, §7 Phase 2)."""

from .store import SnapshotStore
from .bloom import PyBloom, build_bloom, bloom_prefilter
from .robots import parse_robots_txt, robots_from_pages, discover_sitemaps
from .sitemap import parse_sitemap_xml, sitemap_candidates
from .recrawl import recrawl_due
from .traps import url_trap_signals

__all__ = [
    "SnapshotStore",
    "PyBloom",
    "build_bloom",
    "bloom_prefilter",
    "parse_robots_txt",
    "robots_from_pages",
    "discover_sitemaps",
    "parse_sitemap_xml",
    "sitemap_candidates",
    "recrawl_due",
    "url_trap_signals",
]
