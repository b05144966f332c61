"""Structured Streaming surface (task brief; SURVEY.md §2.9).

The crawl loop itself is a checkpointed *batch* epoch driver by design
(T1: "batch-loop is simpler and matches resumable-from-any-snapshot");
this package covers the genuinely streaming surfaces: continuous page
ingest, windowed+watermarked fetch-rate metrics, stateful per-host
accounting, and a foreachBatch incremental-extraction runner.
"""

from .stream import (
    adaptive_delay_stream,
    animation_frames_stream,
    media_stream,
    dedup_pages_stream,
    extract_articles_stream,
    host_rate_metrics,
    host_state_stream,
    pages_stream,
    run_incremental_extraction,
    warc_pages_stream,
)

__all__ = [
    "pages_stream",
    "media_stream",
    "animation_frames_stream",
    "adaptive_delay_stream",
    "dedup_pages_stream",
    "extract_articles_stream",
    "host_rate_metrics",
    "host_state_stream",
    "run_incremental_extraction",
    "warc_pages_stream",
]
