"""Streaming operators over the pages table.

- ``pages_stream``          — file-source readStream of page parquet
                              (new files = newly crawled/ingested pages)
- ``extract_articles_stream`` — the same Arrow extraction UDF as batch,
                              applied per micro-batch (stateless)
- ``host_rate_metrics``     — windowed per-host page counts with a
                              watermark for late WARC timestamps
- ``host_state_stream``     — custom stateful operator
                              (applyInPandasWithState): cumulative
                              per-host totals + first/last seen ts
- ``run_incremental_extraction`` — foreachBatch runner appending
                              extracted articles per micro-batch with
                              checkpointed exactly-once file sink
- ``adaptive_delay_stream``   — stateful streaming twin of
                              frontier.adaptive.adaptive_delays: the
                              per-host EWMA politeness fold as live
                              applyInPandasWithState state
"""

from __future__ import annotations

import os
from typing import Iterator, Optional, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..extract.content import ContentConfig
from ..fixtures.sitegen import PAGES_SCHEMA
from ..operators.udfs import extract_content_df

HOST_STATE_SCHEMA = "host string, pages long, first_ts timestamp, last_ts timestamp"
_HOST_STATE_INTERNAL = "pages long, first_ts long, last_ts long"


def pages_stream(
    spark: SparkSession, pages_dir: str, max_files_per_trigger: int = 16
) -> DataFrame:
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(pages_dir)
    )


def warc_pages_stream(
    spark: SparkSession, warc_dir: str, max_files_per_trigger: int = 16
) -> DataFrame:
    """Streaming ingestion of WARC archives as the pages table:
    ``.warc.gz`` files landing in ``warc_dir`` (the Common Crawl / bulk
    fetcher handoff) flow straight into the SAME downstream streaming
    ops as parquet pages — extraction, host-rate windows, stateful host
    totals. Emits PAGES_SCHEMA columns (text/lang are NULL: archives
    carry raw payloads; text derivation is the extractor's job)."""
    from ..sources.warc import read_warc_stream

    recs = read_warc_stream(
        spark, warc_dir, max_files_per_trigger=max_files_per_trigger
    )
    return recs.select(
        "url",
        "warc_ts",
        "html",
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("lang"),
    )


def extract_articles_stream(
    pages: DataFrame, cfg: Optional[ContentConfig] = None
) -> DataFrame:
    """Stateless Arrow extraction on a streaming DF — identical code
    path to the batch engine (operators/udfs.py)."""
    return extract_content_df(pages, cfg or ContentConfig(selectors={}))


def host_rate_metrics(
    pages: DataFrame,
    window_duration: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Fetch-rate telemetry: per-host page counts in event-time windows
    of ``warc_ts``; the watermark bounds state for late pages."""
    host = F.lower(F.try_parse_url("url", F.lit("HOST"))).alias("host")
    return (
        pages.select("url", "warc_ts")
        .withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window_duration).alias("win"), host)
        .agg(F.count("*").alias("pages"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "host",
            "pages",
        )
    )


def _host_state_fn(
    key: Tuple[str], batches: Iterator, state: GroupState
) -> Iterator:
    """Cumulative per-host accounting across micro-batches."""
    import pandas as pd

    pages = 0
    first_us = None
    last_us = None
    if state.exists:
        pages, first_us, last_us = state.get
    for pdf in batches:
        if not len(pdf):
            continue
        ts = pd.to_datetime(pdf["warc_ts"])
        pages += len(pdf)
        batch_first = ts.min().value // 1000
        batch_last = ts.max().value // 1000
        first_us = batch_first if first_us is None else min(first_us, batch_first)
        last_us = batch_last if last_us is None else max(last_us, batch_last)
    state.update((pages, first_us, last_us))
    yield pd.DataFrame(
        {
            "host": [key[0]],
            "pages": [pages],
            # `is not None`, not truthiness: 0 is a real timestamp (the
            # 1970-01-01 sentinel warc.py assigns unparsable WARC-Dates)
            "first_ts": [
                pd.Timestamp(first_us * 1000) if first_us is not None else pd.NaT
            ],
            "last_ts": [
                pd.Timestamp(last_us * 1000) if last_us is not None else pd.NaT
            ],
        }
    )


def host_state_stream(pages: DataFrame) -> DataFrame:
    """Custom stateful operator: running per-host totals via
    applyInPandasWithState (the task brief's stateful-op surface)."""
    with_host = pages.select(
        F.lower(F.try_parse_url("url", F.lit("HOST"))).alias("host"), "warc_ts"
    )
    return with_host.groupBy("host").applyInPandasWithState(
        _host_state_fn,
        outputStructType=HOST_STATE_SCHEMA,
        stateStructType=_HOST_STATE_INTERNAL,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_incremental_extraction(
    spark: SparkSession,
    pages_dir: str,
    out_dir: str,
    checkpoint_dir: Optional[str] = None,
    cfg: Optional[ContentConfig] = None,
    available_now: bool = True,
):
    """foreachBatch runner: each micro-batch of new page files is
    extracted and appended to ``out_dir`` parquet. With
    ``Trigger.AvailableNow`` this is the streaming twin of one crawl
    epoch over newly-landed pages; the checkpoint gives exactly-once
    resumability (T2)."""
    checkpoint_dir = checkpoint_dir or os.path.join(out_dir, "_checkpoint")
    stream = pages_stream(spark, pages_dir)
    extraction_cfg = cfg or ContentConfig(selectors={})

    def process(batch_df: DataFrame, batch_id: int) -> None:
        out = extract_content_df(batch_df, extraction_cfg).filter(
            F.col("row_kind") != "link"
        )
        out.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
            os.path.join(out_dir, "articles")
        )

    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    query = writer.start()
    return query


def dedup_pages_stream(
    pages: DataFrame,
    watermark: str = "10 minutes",
    fingerprint_col: str = "html",
) -> DataFrame:
    """Streaming exact dedup: first capture of each content
    fingerprint wins, within a bounded state window.

    ``dropDuplicatesWithinWatermark`` keys state on the md5 content
    fingerprint and evicts entries once the ``warc_ts`` watermark
    passes them — the streaming twin of ``operators.dedup.dedup_exact``
    with the state-boundedness a 100 TB ingest stream requires
    (unbounded ``dropDuplicates`` state would grow with the corpus;
    the watermark makes state O(pages per watermark window), and
    WARC-level revisit dedup — ``sources.warc.cdx_revisits`` — handles
    the cross-window history at rest).

    Emits the input rows plus ``fingerprint``; duplicates arriving
    inside the watermark window are dropped exactly-once per sink
    checkpoint semantics.
    """
    fp = F.md5(F.col(fingerprint_col).cast("binary")).alias("fingerprint")
    return (
        pages.withColumn("fingerprint", fp)
        .withWatermark("warc_ts", watermark)
        .dropDuplicatesWithinWatermark(["fingerprint"])
    )


ADAPTIVE_OBS_SCHEMA = (
    "host string, epoch long, latency_ms long, is_err boolean"
)
ADAPTIVE_OUT_SCHEMA = (
    "host string, n_epochs long, ewma_latency_ms long, "
    "last_err_ppm long, delay_ms long"
)
_ADAPTIVE_STATE = "ewma long, last_err_ppm long, n_epochs long"


def _adaptive_state_fn(
    alpha_num: int,
    alpha_den: int,
    latency_factor: int,
    err_backoff_ppm: int,
    backoff_mult: int,
    min_delay_ms: int,
    max_delay_ms: int,
):
    keep = alpha_den - alpha_num

    def fn(key: Tuple[str], batches: Iterator, state: GroupState) -> Iterator:
        import pandas as pd

        ewma, last_err, n = (state.get if state.exists else (0, 0, 0))
        # per-epoch integer aggregates across this trigger's rows
        sums: dict = {}
        for pdf in batches:
            if not len(pdf):
                continue
            g = pdf.groupby("epoch").agg(
                lat=("latency_ms", "sum"),
                cnt=("latency_ms", "size"),
                err=("is_err", "sum"),
            )
            for ep, row in g.iterrows():
                s = sums.setdefault(int(ep), [0, 0, 0])
                s[0] += int(row["lat"])
                s[1] += int(row["cnt"])
                s[2] += int(row["err"])
        for ep in sorted(sums):
            lat, cnt, err = sums[ep]
            mean = lat // cnt
            err_ppm = err * 1_000_000 // cnt
            ewma = (
                mean if n == 0 else (ewma * keep + mean * alpha_num) // alpha_den
            )
            last_err = err_ppm
            n += 1
        state.update((int(ewma), int(last_err), int(n)))
        base = ewma * latency_factor
        if last_err >= err_backoff_ppm:
            base *= backoff_mult
        delay = min(max(base, min_delay_ms), max_delay_ms)
        yield pd.DataFrame(
            {
                "host": [key[0]],
                "n_epochs": [n],
                "ewma_latency_ms": [ewma],
                "last_err_ppm": [last_err],
                "delay_ms": [delay],
            }
        )

    return fn


def adaptive_delay_stream(
    obs: DataFrame,
    *,
    alpha_num: int = 1,
    alpha_den: int = 4,
    latency_factor: int = 10,
    err_backoff_ppm: int = 200_000,
    backoff_mult: int = 4,
    min_delay_ms: int = 100,
    max_delay_ms: int = 30_000,
) -> DataFrame:
    """Streaming twin of ``frontier.adaptive.adaptive_delays``: the
    per-host (ewma, last_err_ppm, n_epochs) fold lives in
    applyInPandasWithState state, updated as fetch-observation
    micro-batches arrive; every update emits the host's CURRENT delay
    recommendation — the live feedback loop a long-running crawl
    service runs, where the batch operator is the at-rest replay.

    Contract for batch-equivalence: one epoch's observations must not
    span triggers (the crawl emits its fetch log atomically per
    epoch); within a trigger any number of complete epochs may arrive
    and are folded in epoch order. Same integer recurrence as the
    batch operator, so the final state matches ``adaptive_delays``
    bit-exactly (asserted in tests).
    """
    return obs.groupBy("host").applyInPandasWithState(
        _adaptive_state_fn(
            alpha_num, alpha_den, latency_factor, err_backoff_ppm,
            backoff_mult, min_delay_ms, max_delay_ms,
        ),
        outputStructType=ADAPTIVE_OUT_SCHEMA,
        stateStructType=_ADAPTIVE_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming media demux (round 5): newly crawled media files demux to
# frame fingerprints per micro-batch — the incremental feed a
# continuously-updated frame-dedup table consumes.
# ---------------------------------------------------------------------------

MEDIA_STREAM_SCHEMA = "media_id long, payload binary"


def media_stream(
    spark: SparkSession, media_dir: str, max_files_per_trigger: int = 16
) -> DataFrame:
    """File-source readStream over a media parquet directory (new
    files = newly crawled payloads)."""
    return (
        spark.readStream.schema(MEDIA_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(media_dir)
    )


def animation_frames_stream(media: DataFrame) -> DataFrame:
    """STATELESS streaming twin of
    :func:`~web_scrapper_spark.operators.multimodal.animation_frames_df`:
    the same Arrow demux pass applied per micro-batch — GIF89a and
    APNG payloads render to per-frame luma stats + dHash rows as they
    arrive; a corrupt or non-animation payload costs a row, never the
    stream. Downstream, the emitted fingerprint rows append to the
    frame table the batch-side blocked Hamming join dedups."""
    from ..operators.multimodal import animation_frames_df

    return animation_frames_df(media, skip_errors=True)
