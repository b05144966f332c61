"""Structured Streaming surface tests (stream ingest, watermarked
windows, stateful op, foreachBatch incremental extraction)."""

import os
import time

import pytest

from web_scrapper_spark import streaming as st
from web_scrapper_spark.fixtures import SiteSpec, pages_dataframe


@pytest.fixture(scope="module")
def paged_dir(spark, tmp_path_factory):
    """Pages parquet split into two 'arrival' file batches."""
    base = tmp_path_factory.mktemp("stream")
    pages = pages_dataframe(spark, SiteSpec()).persist()
    first = pages.filter("pmod(hash(url), 2) = 0")
    second = pages.filter("pmod(hash(url), 2) = 1")
    d = str(base / "pages")
    first.coalesce(1).write.mode("append").parquet(d)
    second.coalesce(1).write.mode("append").parquet(d)
    pages.unpersist()
    return d


def _run_to_memory(df, name, mode="append", timeout=120):
    query = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(timeout)
    return query


class TestStreaming:
    def test_extraction_stream_matches_batch(self, spark, paged_dir):
        stream = st.pages_stream(spark, paged_dir, max_files_per_trigger=1)
        out = st.extract_articles_stream(stream)
        _run_to_memory(out.filter("row_kind = 'full'"), "arts")
        streamed = {
            r["url"] for r in spark.sql("select url from arts").collect()
        }
        batch = st.extract_articles_stream(spark.read.parquet(paged_dir))
        expected = {
            r["url"] for r in batch.filter("row_kind = 'full'").select("url").collect()
        }
        assert streamed == expected
        assert len(streamed) > 5

    def test_host_rate_metrics_windowed(self, spark, paged_dir):
        stream = st.pages_stream(spark, paged_dir)
        metrics = st.host_rate_metrics(stream, "1 minute", "2 minutes")
        _run_to_memory(metrics, "rates", mode="append")
        rows = spark.sql("select * from rates").collect()
        # append mode only emits watermark-closed windows; the fixture's
        # warc_ts span is short, so just assert the aggregation ran and
        # produced the right shape with per-host granularity
        batch_hosts = (
            spark.read.parquet(paged_dir)
            .selectExpr("lower(parse_url(url, 'HOST')) as host")
            .distinct()
            .count()
        )
        assert batch_hosts >= 4
        for r in rows:
            assert r["pages"] > 0 and r["host"]

    def test_host_state_stream_cumulative(self, spark, paged_dir):
        stream = st.pages_stream(spark, paged_dir, max_files_per_trigger=1)
        out = st.host_state_stream(stream)
        _run_to_memory(out, "hoststate", mode="update")
        rows = spark.sql(
            "select host, max(pages) as pages from hoststate group by host"
        ).collect()
        expected = {
            r["host"]: r["cnt"]
            for r in spark.read.parquet(paged_dir)
            .selectExpr("lower(parse_url(url, 'HOST')) as host")
            .groupBy("host")
            .count()
            .withColumnRenamed("count", "cnt")
            .collect()
        }
        got = {r["host"]: r["pages"] for r in rows}
        assert got == expected

    def test_host_state_epoch_zero_is_a_real_timestamp(self):
        """Timestamp 0 (the 1970-01-01 sentinel warc.py assigns to
        unparsable WARC-Dates) is falsy — the state fn must test
        `is not None`, not truthiness, or epoch-0 hosts emit NaT."""
        import pandas as pd

        from web_scrapper_spark.streaming.stream import _host_state_fn

        class _FakeState:
            def __init__(self):
                self._v = None

            @property
            def exists(self):
                return self._v is not None

            @property
            def get(self):
                return self._v

            def update(self, v):
                self._v = v

        pdf = pd.DataFrame(
            {"warc_ts": [pd.Timestamp("1970-01-01 00:00:00+00:00")]}
        )
        out = next(_host_state_fn(("h.org",), iter([pdf]), _FakeState()))
        assert out["pages"].iloc[0] == 1
        assert out["first_ts"].iloc[0] == pd.Timestamp(0)
        assert out["last_ts"].iloc[0] == pd.Timestamp(0)

    def test_incremental_extraction_checkpointed(self, spark, paged_dir, tmp_path):
        out_dir = str(tmp_path / "inc")
        query = st.run_incremental_extraction(spark, paged_dir, out_dir)
        query.awaitTermination(120)
        first = spark.read.parquet(os.path.join(out_dir, "articles"))
        n_first = first.count()
        assert n_first > 0
        # re-run with same checkpoint: no new files → no duplicates
        query2 = st.run_incremental_extraction(spark, paged_dir, out_dir)
        query2.awaitTermination(120)
        again = spark.read.parquet(os.path.join(out_dir, "articles"))
        assert again.count() == n_first


class TestWarcStreaming:
    def test_warc_archives_stream_as_pages(self, spark, tmp_path):
        """Archives landing incrementally are ingested exactly once and
        feed the same extraction path as parquet pages."""
        from web_scrapper_spark.sources.warc import write_warc

        pages = pages_dataframe(spark, SiteSpec(n_hosts=2, n_articles=8)).persist()
        d = str(tmp_path / "warc_in")
        # two 'arrival' batches of archives
        write_warc(pages.filter("pmod(hash(url), 2) = 0").repartition(2), d)
        first = st.warc_pages_stream(spark, d, max_files_per_trigger=1)
        _run_to_memory(first, "warc1")
        n1 = spark.sql("select count(*) c from warc1").first()["c"]
        assert n1 == pages.filter("pmod(hash(url), 2) = 0").count()

        # second batch arrives: a fresh availableNow pass over the dir
        # sees ALL files; counts must equal the full pages table
        import os as _os

        write_warc(
            pages.filter("pmod(hash(url), 2) = 1").repartition(2),
            str(tmp_path / "warc_in2"),
        )
        for f in _os.listdir(str(tmp_path / "warc_in2")):
            _os.rename(
                _os.path.join(str(tmp_path / "warc_in2"), f),
                _os.path.join(d, "b2-" + f),
            )
        full = st.warc_pages_stream(spark, d)
        _run_to_memory(full, "warc2")
        rows = spark.sql("select url, html from warc2").collect()
        assert len(rows) == pages.count()
        # payload bytes identical to the batch pages table
        left = {r["url"]: bytes(r["html"]) for r in pages.collect()}
        right = {r["url"]: bytes(r["html"]) for r in rows}
        assert left == right
        # schema matches the parquet pages stream contract
        assert [f.name for f in full.schema.fields] == [
            "url", "warc_ts", "html", "text", "lang",
        ]
        pages.unpersist()

    def test_warc_stream_feeds_extraction(self, spark, tmp_path):
        from web_scrapper_spark.sources.warc import write_warc

        pages = pages_dataframe(spark, SiteSpec(n_hosts=2, n_articles=8))
        d = str(tmp_path / "warc_ex")
        write_warc(pages.repartition(2), d)
        out = st.extract_articles_stream(st.warc_pages_stream(spark, d))
        _run_to_memory(out.filter("row_kind = 'full'"), "warc_arts")
        n = spark.sql("select count(*) c from warc_arts").first()["c"]
        assert n > 0


class TestStreamingDedup:
    def test_first_capture_wins_and_state_bounded(self, spark, tmp_path):
        """Duplicate html fingerprints inside the watermark window are
        dropped; the deduped stream equals batch dedup_exact's keeper
        set on the same input."""
        import pandas as pd

        from pyspark.sql import functions as F
        from web_scrapper_spark.streaming import dedup_pages_stream

        d = str(tmp_path / "dpages")
        rows = [
            ("https://a.org/1", "2025-01-01 00:00:00", "<p>same</p>"),
            ("https://a.org/2", "2025-01-01 00:00:30", "<p>same</p>"),
            ("https://a.org/3", "2025-01-01 00:01:00", "<p>other</p>"),
        ]
        df = spark.createDataFrame(
            pd.DataFrame(rows, columns=["url", "warc_ts", "html"])
        ).withColumn("warc_ts", F.to_timestamp("warc_ts"))
        df.coalesce(1).write.parquet(d)

        stream = (
            spark.readStream.schema("url string, warc_ts timestamp, html string")
            .parquet(d)
        )
        deduped = dedup_pages_stream(stream, watermark="10 minutes")
        q = _run_to_memory(deduped, "dedup_stream")
        got = {
            r["url"]
            for r in spark.sql("select url from dedup_stream").collect()
        }
        q.stop()
        # exactly one survivor per fingerprint
        assert len(got) == 2
        assert "https://a.org/3" in got
        assert len(got & {"https://a.org/1", "https://a.org/2"}) == 1


class TestAdaptiveDelayStream:
    """Streaming twin of frontier.adaptive.adaptive_delays: state fold
    across micro-batches must equal the batch operator bit-exactly."""

    OBS = [
        # host a: epochs 0-2 (fold: 100 -> (300+500)//4=200 -> (600+60)//4=165)
        ("a.org", 0, 80, False), ("a.org", 0, 120, False),
        ("a.org", 1, 500, False),
        ("a.org", 2, 60, False),
        # host b: clean epoch then 50% errors -> 4x backoff
        ("b.org", 0, 100, False),
        ("b.org", 2, 100, True), ("b.org", 2, 100, False),
    ]

    def _obs_dir(self, spark, tmp_path):
        d = str(tmp_path / "obs")
        df = spark.createDataFrame(self.OBS, st.stream.ADAPTIVE_OBS_SCHEMA)
        # one file per epoch = one trigger per epoch (the contract:
        # an epoch's observations never span triggers)
        for ep in (0, 1, 2):
            df.filter(f"epoch = {ep}").coalesce(1).write.mode("append").parquet(d)
        return d

    def test_stream_matches_batch_operator(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from web_scrapper_spark.frontier.adaptive import adaptive_delays

        obs = (
            spark.readStream.schema(st.stream.ADAPTIVE_OBS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(self._obs_dir(spark, tmp_path))
        )
        out = st.adaptive_delay_stream(obs)
        _run_to_memory(out, "adaptive", mode="update")
        # memory sink in update mode appends every update; the LAST row
        # per host is the live recommendation
        final = {
            r["host"]: (r["n_epochs"], r["ewma_latency_ms"],
                        r["last_err_ppm"], r["delay_ms"])
            for r in spark.sql(
                "select * from (select *, row_number() over "
                "(partition by host order by n_epochs desc) as rn "
                "from adaptive) where rn = 1"
            ).collect()
        }
        batch = {
            r["host"]: (r["n_epochs"], r["ewma_latency_ms"],
                        r["last_err_ppm"], r["delay_ms"])
            for r in adaptive_delays(
                spark.createDataFrame(self.OBS, st.stream.ADAPTIVE_OBS_SCHEMA)
            ).collect()
        }
        assert final == batch
        assert final["a.org"] == (3, 165, 0, 1650)
        assert final["b.org"][3] == 4000  # latest-epoch backoff


class TestMediaStream:
    def test_animation_frames_stream_matches_batch(self, spark, tmp_path):
        """Round-5 media twin: streaming demux of mixed GIF/APNG (+ a
        corrupt payload that must cost a row, not the stream) equals
        the batch operator row-for-row."""
        import numpy as np

        from web_scrapper_spark.operators import multimodal as mm
        from web_scrapper_spark.operators.rasters import (
            build_gif_animation,
        )

        g = (np.arange(10 * 12).reshape(10, 12) % 6 * 42).astype(np.uint8)
        anim = [g, np.roll(g, 2, axis=0), np.roll(g, 4, axis=0)]
        media_dir = str(tmp_path / "media_in")
        # two file waves -> at least two micro-batches
        spark.createDataFrame(
            [(1, bytearray(build_gif_animation(anim, delays_cs=[3, 5, 7])))],
            st.stream.MEDIA_STREAM_SCHEMA,
        ).write.mode("append").parquet(media_dir)
        spark.createDataFrame(
            [
                (2, bytearray(mm.build_apng(anim, delays=[3, 5, 7]))),
                (3, bytearray(b"corrupt-not-an-animation")),
            ],
            st.stream.MEDIA_STREAM_SCHEMA,
        ).write.mode("append").parquet(media_dir)

        stream = st.media_stream(spark, media_dir, max_files_per_trigger=1)
        out = st.animation_frames_stream(stream)
        _run_to_memory(out, "media_frames")
        streamed = {
            (r["media_id"], r["frame_idx"]): (r["delay_cs"], r["dhash"])
            for r in spark.sql("select * from media_frames").collect()
        }
        batch = {
            (r["media_id"], r["frame_idx"]): (r["delay_cs"], r["dhash"])
            for r in mm.animation_frames_df(
                spark.read.parquet(media_dir), skip_errors=True
            ).collect()
        }
        assert streamed == batch
        assert len(streamed) == 6  # 3 GIF + 3 APNG frames, corrupt dropped
        # the GIF and APNG twins fingerprint identically frame-by-frame
        for k in range(3):
            assert streamed[(1, k)] == streamed[(2, k)]
