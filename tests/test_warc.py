"""WARC source/sink (sources/warc.py) — roundtrip, format, edge cases."""

import gzip
import os
from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from web_scrapper_spark.sources.warc import (
    build_warc_bytes,
    parse_warc_bytes,
    read_warc,
    write_warc,
)
from web_scrapper_spark.sources import read_any, write_any

TS = datetime(2025, 7, 18, 12, 0, 0, tzinfo=timezone.utc)


def _rows():
    return [
        ("https://a.example.org/1", TS, b"<html><body>one</body></html>"),
        ("https://a.example.org/2", TS, b"<html>body with \r\n\r\n inside</html>"),
        ("https://b.example.org/é", TS, "<html>unicode — body</html>".encode("utf-8")),
        ("https://b.example.org/empty", TS, b""),
    ]


class TestWarcBytes:
    def test_roundtrip_pure_python(self):
        data = build_warc_bytes(_rows(), filename="t.warc.gz")
        recs = list(parse_warc_bytes(data, warc_file="t.warc.gz"))
        assert [r["warc_type"] for r in recs] == ["warcinfo"] + ["response"] * 4
        body = [r for r in recs if r["warc_type"] == "response"]
        assert [(r["url"], r["html"]) for r in body] == [
            (u, p) for u, _, p in _rows()
        ]
        assert all(r["http_status"] == 200 for r in body)
        assert all(r["warc_ts"] == TS for r in body)
        assert all(r["content_type"].startswith("text/html") for r in body)

    def test_one_gzip_member_per_record(self):
        data = build_warc_bytes(_rows(), filename="t.warc.gz")
        # 1 warcinfo + 4 responses = 5 gzip members = 5 magic headers
        assert data.count(b"\x1f\x8b\x08") == 5
        # each member independently decodable from its offset
        first = gzip.GzipFile(fileobj=__import__("io").BytesIO(data)).read()
        assert first.startswith(b"WARC/1.0")

    def test_uncompressed_variant(self):
        data = build_warc_bytes(_rows(), compress=False)
        assert data.startswith(b"WARC/1.0")
        recs = list(parse_warc_bytes(data))
        assert sum(r["warc_type"] == "response" for r in recs) == 4

    def test_deterministic_bytes(self):
        a = build_warc_bytes(_rows(), filename="t.warc.gz")
        b = build_warc_bytes(_rows(), filename="t.warc.gz")
        assert a == b

    def test_corrupt_bytes_never_raise(self):
        """A batch ingest skips bad archives instead of dying: truncated
        gzip members, unparsable/negative Content-Length headers."""
        data = build_warc_bytes(_rows(), filename="t.warc.gz")
        # truncated mid-member: whole-file decompress fails → no records
        assert list(parse_warc_bytes(data[:-9])) == []
        # non-numeric Content-Length: stop cleanly (cannot resync)
        bad = (
            b"WARC/1.0\r\nWARC-Type: response\r\n"
            b"Content-Length: xyz\r\n\r\nbody"
        )
        assert list(parse_warc_bytes(bad)) == []
        # negative Content-Length must not walk the cursor backwards
        neg = (
            b"WARC/1.0\r\nWARC-Type: response\r\n"
            b"Content-Length: -5\r\n\r\nbody"
        )
        assert list(parse_warc_bytes(neg)) == []

    def test_payload_never_scanned_for_delimiters(self):
        # A body containing the record separator sequence must survive
        # because parsing is Content-Length-driven.
        evil = b"x\r\n\r\nWARC/1.0\r\n\r\ny"
        data = build_warc_bytes([("https://e/1", TS, evil)])
        recs = [r for r in parse_warc_bytes(data) if r["warc_type"] == "response"]
        assert recs[0]["html"] == evil


class TestWarcSpark:
    def test_spark_roundtrip(self, spark, tmp_path):
        out = str(tmp_path / "warc")
        df = spark.createDataFrame(
            _rows(), "url string, warc_ts timestamp, html binary"
        ).repartition(3)
        manifest = write_warc(df, out)
        assert sum(m["records"] for m in manifest) == 4
        assert all(m["warc_file"].endswith(".warc.gz") for m in manifest)
        back = read_warc(spark, out)
        got = {(r["url"], bytes(r["html"])) for r in back.collect()}
        assert got == {(u, p) for u, _, p in _rows()}

    def test_factory_aliases(self, spark, tmp_path):
        out = str(tmp_path / "warc2")
        df = spark.createDataFrame(_rows(), "url string, warc_ts timestamp, html binary")
        write_any(df, out, "warc")
        back = read_any(spark, out, "warc")
        assert back.count() == 4
        assert {f.name for f in back.schema.fields} >= {"url", "warc_ts", "html"}

    def test_sink_is_rerun_stable(self, spark, tmp_path):
        df = spark.createDataFrame(
            _rows(), "url string, warc_ts timestamp, html binary"
        ).coalesce(1)
        d1, d2 = str(tmp_path / "w1"), str(tmp_path / "w2")
        write_warc(df, d1)
        write_warc(df, d2)
        f1 = open(os.path.join(d1, os.listdir(d1)[0]), "rb").read()
        f2 = open(os.path.join(d2, os.listdir(d2)[0]), "rb").read()
        assert f1 == f2

    def test_feeds_pages_pipeline(self, spark, tmp_path):
        # a WARC archive is directly usable as the crawl's pages table
        from web_scrapper_spark.fixtures import SiteSpec, pages_dataframe

        pages = pages_dataframe(spark, SiteSpec(n_hosts=2, n_articles=6)).select(
            "url", "warc_ts", "html"
        )
        out = str(tmp_path / "pages_warc")
        write_warc(pages.repartition(2), out)
        back = read_warc(spark, out).select("url", "warc_ts", "html")
        assert back.count() == pages.count()
        # payload bytes identical per url
        left = {r["url"]: bytes(r["html"]) for r in pages.collect()}
        right = {r["url"]: bytes(r["html"]) for r in back.collect()}
        assert left == right


class TestLatestCaptures:
    def test_newest_wins_with_deterministic_tiebreak(self, spark):
        from web_scrapper_spark.sources.warc import latest_captures

        rows = [
            # two captures, newest ts wins
            ("https://a.org/1", 100, "rec-old", b"v1"),
            ("https://a.org/1", 200, "rec-new", b"v2"),
            # ts tie: record_id desc breaks it
            ("https://a.org/2", 100, "rec-x", b"x"),
            ("https://a.org/2", 100, "rec-y", b"y"),
            # singleton passes through
            ("https://a.org/3", 50, "rec-s", b"s"),
        ]
        df = spark.createDataFrame(
            rows, "url string, warc_ts long, record_id string, html binary"
        )
        got = {
            r["url"]: (r["record_id"], bytes(r["html"]))
            for r in latest_captures(df).collect()
        }
        assert got == {
            "https://a.org/1": ("rec-new", b"v2"),
            "https://a.org/2": ("rec-y", b"y"),
            "https://a.org/3": ("rec-s", b"s"),
        }
        # partitioning-independent (deterministic dedup)
        again = latest_captures(df.repartition(7)).collect()
        assert {r["url"]: r["record_id"] for r in again} == {
            u: rid for u, (rid, _) in got.items()
        }


class TestCdx:
    def test_cdx_selective_fetch(self, spark, tmp_path):
        from web_scrapper_spark.sources.warc import read_cdx, read_warc_ranges

        out = str(tmp_path / "warc_cdx")
        df = spark.createDataFrame(
            _rows(), "url string, warc_ts timestamp, html binary"
        ).repartition(2)
        write_warc(df, out)
        cdx = read_cdx(spark, out)
        assert cdx.count() == 4
        # digest column is the payload md5
        import hashlib

        digs = {r["url"]: r["digest"] for r in cdx.collect()}
        for u, _, p in _rows():
            assert digs[u] == hashlib.md5(p).hexdigest()
        # fetch a subset by joining the index — archives never scanned
        want = cdx.filter(F.col("url").contains("b.example.org"))
        got = {
            (r["url"], bytes(r["html"])) for r in read_warc_ranges(want, out).collect()
        }
        assert got == {(u, p) for u, _, p in _rows() if "b.example.org" in u}

    def test_cdx_offsets_address_gzip_members(self, spark, tmp_path):
        import gzip as _gz
        import os as _os

        from web_scrapper_spark.sources.warc import read_cdx

        out = str(tmp_path / "warc_off")
        df = spark.createDataFrame(
            _rows(), "url string, warc_ts timestamp, html binary"
        ).coalesce(1)
        write_warc(df, out)
        cdx = read_cdx(spark, out).collect()
        for r in cdx:
            with open(_os.path.join(out, r["warc_file"]), "rb") as fh:
                fh.seek(r["offset"])
                member = fh.read(r["length"])
            rec = _gz.decompress(member)
            assert rec.startswith(b"WARC/1.0")
            assert ("WARC-Target-URI: " + r["url"]).encode("utf-8") in rec

    def test_cdx_disabled(self, spark, tmp_path):
        import os as _os

        out = str(tmp_path / "warc_nocdx")
        df = spark.createDataFrame(_rows(), "url string, warc_ts timestamp, html binary")
        write_warc(df, out, cdx=False)
        assert not [f for f in _os.listdir(out) if f.endswith(".cdx")]


class TestCdxRevisits:
    def test_classification(self, spark):
        from web_scrapper_spark.sources.warc import cdx_revisits

        rows = [
            # url A: first, unchanged revisit, change, revisit of change
            ("A", "t1", "d1"),
            ("A", "t2", "d1"),
            ("A", "t3", "d2"),
            ("A", "t4", "d2"),
            # url B: single capture
            ("B", "t1", "d1"),
            # url C: content flaps back to an OLD digest -> still a
            # revisit of the original capture
            ("C", "t1", "dx"),
            ("C", "t2", "dy"),
            ("C", "t3", "dx"),
        ]
        df = spark.createDataFrame(rows, "url string, ts string, digest string")
        got = {(r["url"], r["ts"]): r for r in cdx_revisits(df).collect()}
        assert got[("A", "t1")]["kind"] == "first"
        assert got[("A", "t2")]["kind"] == "revisit"
        assert got[("A", "t2")]["original_ts"] == "t1"
        assert got[("A", "t3")]["kind"] == "changed"
        assert got[("A", "t3")]["original_ts"] is None
        assert got[("A", "t4")]["kind"] == "revisit"
        assert got[("A", "t4")]["original_ts"] == "t3"
        assert got[("B", "t1")]["kind"] == "first"
        assert got[("C", "t3")]["kind"] == "revisit"
        assert got[("C", "t3")]["original_ts"] == "t1"


class TestWarcRevisitWrite:
    """dedupe_revisits=True: recaptures become identical-payload-digest
    revisit records; payload bytes are stored once per (url, digest)."""

    def _pages(self, spark):
        import hashlib as _h

        # incompressible body (md5 chain) so stored payload bytes
        # dominate the gzip members, as real page bodies do
        chain = [b"seed"]
        for _ in range(256):
            chain.append(_h.md5(chain[-1]).digest())
        body = b"<html><body>" + b"".join(chain) + b"</body></html>"
        t0 = datetime(2025, 1, 1, tzinfo=timezone.utc)
        t1 = datetime(2025, 2, 1, tzinfo=timezone.utc)
        t2 = datetime(2025, 3, 1, tzinfo=timezone.utc)
        rows = [
            ("https://a.org/stable", t0, body),       # original
            ("https://a.org/stable", t1, body),       # unchanged -> revisit
            ("https://a.org/stable", t2, body),       # unchanged -> revisit
            ("https://a.org/changed", t0, body),
            ("https://a.org/changed", t1, body + b"!"),  # new digest -> response
        ]
        return spark.createDataFrame(
            rows, "url string, warc_ts timestamp, html binary"
        ).coalesce(1)

    def test_revisits_shrink_archive_and_roundtrip(self, spark, tmp_path):
        from web_scrapper_spark.sources.warc import read_cdx, read_warc, write_warc

        plain_dir, dedup_dir = str(tmp_path / "plain"), str(tmp_path / "dedup")
        plain = write_warc(self._pages(spark), plain_dir)
        dedup = write_warc(
            self._pages(spark), dedup_dir, dedupe_revisits=True
        )
        assert sum(m["bytes"] for m in dedup) < sum(m["bytes"] for m in plain)

        responses = read_warc(spark, f"{dedup_dir}/*.warc.gz").collect()
        assert len(responses) == 3  # two originals + the changed capture
        revisits = read_warc(
            spark, f"{dedup_dir}/*.warc.gz", record_types=("revisit",)
        ).collect()
        assert len(revisits) == 2
        assert all(r["html"] == b"" for r in revisits)  # header-only block

        # expansion: the CDX digest is the global join key back to the
        # original's payload — reconstructs every capture byte-exactly
        cdx = read_cdx(spark, dedup_dir)
        resp_df = read_warc(spark, f"{dedup_dir}/*.warc.gz").select(
            F.col("url").alias("r_url"), F.md5("html").alias("digest"),
            F.col("html").alias("payload"),
        )
        expanded = (
            cdx.join(resp_df, ["digest"])
            .filter(F.col("url") == F.col("r_url"))
            .select("url", "ts", "payload")
        )
        got = {(r["url"], r["ts"]): bytes(r["payload"]) for r in expanded.collect()}
        want = {
            (r["url"], r["warc_ts"].strftime("%Y-%m-%dT%H:%M:%SZ")): bytes(r["html"])
            for r in self._pages(spark).collect()
        }
        assert got == want

    def test_revisit_headers_point_at_original(self, spark, tmp_path):
        from web_scrapper_spark.sources.warc import write_warc

        d = str(tmp_path / "hdrs")
        write_warc(self._pages(spark), d, dedupe_revisits=True, compress=False)
        raw = open(os.path.join(d, os.listdir(d)[0].replace(".cdx", ".warc")), "rb").read() \
            if False else open([os.path.join(d, f) for f in sorted(os.listdir(d)) if f.endswith(".warc")][0], "rb").read()
        assert raw.count(b"WARC-Type: revisit") == 2
        assert b"WARC-Profile: http://netpreserve.org/warc/1.0/revisit/identical-payload-digest" in raw
        assert b"WARC-Refers-To-Date: 2025-01-01T00:00:00Z" in raw
        assert b"WARC-Payload-Digest: md5:" in raw


class TestWet:
    """WET conversion-record sink/source (Common Crawl *.warc.wet.gz)."""

    def _texts(self):
        return [
            ("https://a.example.org/1", TS, "plain one"),
            ("https://a.example.org/2", TS, "text with \r\n\r\n inside"),
            ("https://b.example.org/é", TS, "unicode — text"),
            ("https://b.example.org/empty", TS, ""),
        ]

    def test_roundtrip_pure_python(self):
        from web_scrapper_spark.sources.warc import build_wet_bytes

        data = build_wet_bytes(
            [(u, ts, t.encode("utf-8")) for u, ts, t in self._texts()],
            filename="t.warc.wet.gz",
        )
        recs = list(parse_warc_bytes(data, warc_file="t.warc.wet.gz"))
        assert [r["warc_type"] for r in recs] == ["warcinfo"] + ["conversion"] * 4
        conv = [r for r in recs if r["warc_type"] == "conversion"]
        assert [bytes(r["html"]).decode("utf-8") for r in conv] == [
            t for _, _, t in self._texts()
        ]
        assert all(r["content_type"] == "text/plain" for r in conv)

    def test_refers_to_links_warc_response_record(self):
        from web_scrapper_spark.sources.warc import (
            _record_id,
            build_wet_bytes,
        )

        url, ts, text = self._texts()[0]
        data = build_wet_bytes([(url, ts, text.encode())], compress=False)
        blob = data.decode("utf-8", errors="replace")
        # the conversion record points at the response record a WARC
        # shard of the same capture would carry (deterministic ids)
        date = "2025-07-18T12:00:00Z"
        assert f"WARC-Refers-To: {_record_id(url, date)}" in blob
        # and its own id differs from the response record's
        assert _record_id(url, date) != _record_id(url, date + "|wet")

    def test_spark_roundtrip_sharded(self, spark, tmp_path):
        from web_scrapper_spark.sources.warc import read_wet, write_wet

        df = spark.createDataFrame(
            self._texts(), "url string, warc_ts timestamp, text string"
        )
        out = str(tmp_path / "wet")
        manifest = write_wet(df.repartition(2, "url"), out)
        assert sum(m["records"] for m in manifest) == 4
        assert all(m["warc_file"].endswith(".warc.wet.gz") for m in manifest)
        back = read_wet(spark, out)
        got = {
            r["url"]: bytes(r["html"]).decode("utf-8") for r in back.collect()
        }
        assert got == {u: t for u, _, t in self._texts()}

    def test_wet_and_warc_coexist_without_cross_reads(self, spark, tmp_path):
        from web_scrapper_spark.sources.warc import read_wet, write_wet

        d = str(tmp_path / "mixed")
        pages = spark.createDataFrame(
            [(u, ts, t.encode("utf-8")) for u, ts, t in self._texts()],
            "url string, warc_ts timestamp, html binary",
        )
        texts = spark.createDataFrame(
            self._texts(), "url string, warc_ts timestamp, text string"
        )
        write_warc(pages.repartition(1), d, cdx=False)
        write_wet(texts.repartition(1), d)
        # the response reader must not surface conversion records and
        # vice versa: the default globs exclude the sibling formats at
        # the FILE level (no wasted scan), record types filter the rest
        resp = read_warc(spark, d).select("warc_type").distinct().collect()
        assert [r["warc_type"] for r in resp] == ["response"]
        conv = read_wet(spark, d).select("warc_type").distinct().collect()
        assert [r["warc_type"] for r in conv] == ["conversion"]

    def test_rerun_byte_stable(self, spark, tmp_path):
        from web_scrapper_spark.sources.warc import write_wet

        df = spark.createDataFrame(
            self._texts(), "url string, warc_ts timestamp, text string"
        )
        a, b = str(tmp_path / "w1"), str(tmp_path / "w2")
        write_wet(df.repartition(1), a)
        write_wet(df.repartition(1), b)
        fa = sorted(os.listdir(a))[0]
        assert open(os.path.join(a, fa), "rb").read() == open(
            os.path.join(b, fa), "rb"
        ).read()

    def test_null_timestamp_roundtrips_as_epoch(self, spark, tmp_path):
        # null warc_ts reaches the Arrow batches as pandas NaT, not
        # None — regression for _warc_date; applies to WARC and WET
        from web_scrapper_spark.sources.warc import read_wet, write_wet

        df = spark.createDataFrame(
            [("https://n/1", None, "t")],
            "url string, warc_ts timestamp, text string",
        )
        out = str(tmp_path / "nullts")
        write_wet(df, out)
        rec = read_wet(spark, out).collect()[0]
        assert rec["warc_ts"].year == 1970

    def test_factory_alias(self, spark, tmp_path):
        df = spark.createDataFrame(
            self._texts(), "url string, warc_ts timestamp, text string"
        )
        out = str(tmp_path / "alias")
        write_any(df, out, "wet")
        back = read_any(spark, out, "wet")
        assert back.count() == 4


class TestWat:
    """WAT metadata-record sink/source (Common Crawl *.warc.wat.gz)."""

    def _rows(self):
        return [
            ("https://a.example.org/1", TS, "Page One",
             {"description": "d1", "robots": "index"},
             ["https://a.example.org/2", "https://b.example.org/"]),
            ("https://a.example.org/2", TS, None, {}, []),
        ]

    def _df(self, spark):
        return spark.createDataFrame(
            self._rows(),
            "url string, warc_ts timestamp, title string, "
            "metas map<string,string>, links array<string>",
        )

    def test_roundtrip_and_envelope_shape(self, spark, tmp_path):
        import json

        from web_scrapper_spark.sources.warc import read_wat, write_wat

        out = str(tmp_path / "wat")
        manifest = write_wat(self._df(spark).repartition(1), out)
        assert sum(m["records"] for m in manifest) == 2
        assert manifest[0]["warc_file"].endswith(".warc.wat.gz")
        recs = {
            r["url"]: json.loads(bytes(r["html"]).decode("utf-8"))
            for r in read_wat(spark, out).collect()
        }
        env = recs["https://a.example.org/1"]["Envelope"]
        assert env["WARC-Header-Metadata"]["WARC-Target-URI"] == (
            "https://a.example.org/1"
        )
        html_md = env["Payload-Metadata"]["HTTP-Response-Metadata"][
            "HTML-Metadata"
        ]
        assert html_md["Head"]["Title"] == "Page One"
        # metas name-sorted
        assert [m["name"] for m in html_md["Head"]["Metas"]] == [
            "description", "robots",
        ]
        # links keep on-page order with positions
        assert [(l["pos"], l["url"]) for l in html_md["Links"]] == [
            (0, "https://a.example.org/2"), (1, "https://b.example.org/"),
        ]
        # empty page: null title, no metas/links
        env2 = recs["https://a.example.org/2"]["Envelope"]
        md2 = env2["Payload-Metadata"]["HTTP-Response-Metadata"][
            "HTML-Metadata"
        ]
        assert md2["Head"]["Title"] is None
        assert md2["Head"]["Metas"] == [] and md2["Links"] == []

    def test_refers_to_and_rerun_stability(self, spark, tmp_path):
        from web_scrapper_spark.sources.warc import (
            _record_id,
            write_wat,
        )

        a, b = str(tmp_path / "a"), str(tmp_path / "b")
        write_wat(self._df(spark).repartition(1), a)
        write_wat(self._df(spark).repartition(1), b)
        fa = sorted(os.listdir(a))[0]
        raw_a = open(os.path.join(a, fa), "rb").read()
        assert raw_a == open(os.path.join(b, fa), "rb").read()
        blob = gzip.decompress(raw_a).decode("utf-8", errors="replace")
        date = "2025-07-18T12:00:00Z"
        assert (
            f"WARC-Refers-To: {_record_id('https://a.example.org/1', date)}"
            in blob
        )

    def test_warc_wet_wat_family_coexists(self, spark, tmp_path):
        from web_scrapper_spark.sources.warc import (
            read_wat,
            read_wet,
            write_wat,
            write_wet,
        )

        d = str(tmp_path / "family")
        pages = spark.createDataFrame(
            [("https://f/1", TS, b"<html>x</html>")],
            "url string, warc_ts timestamp, html binary",
        )
        texts = spark.createDataFrame(
            [("https://f/1", TS, "x")],
            "url string, warc_ts timestamp, text string",
        )
        write_warc(pages.repartition(1), d, cdx=True)
        write_wet(texts.repartition(1), d)
        write_wat(self._df(spark).repartition(1), d)
        assert read_warc(spark, d).count() == 1      # responses only
        assert read_wet(spark, d).count() == 1       # conversions only
        assert read_wat(spark, d).count() == 2       # metadata only

    def test_factory_alias(self, spark, tmp_path):
        out = str(tmp_path / "alias")
        write_any(self._df(spark), out, "wat")
        assert read_any(spark, out, "wat").count() == 2


class TestSurtCcIndex:
    """SURT keys + cc-index columnar layout (sources/warc.py
    surt_key_col / cc_index; python twin urlutils.surt)."""

    CASES = [
        "https://www.Example.com:443/A/b?x=1#f",
        "http://example.com",
        "http://sub.example.co.uk:8080/p",
        "https://user:pw@www2.example.org/x",
        "http://example.com?q=1",
        "http://example.com:80/",
        "http://www10.example.net/a#x#y",
        "https://example.com/CaseKept/Path?Q=Mixed",
    ]

    def test_native_equals_python_twin(self, spark):
        from pyspark.sql import functions as F

        from web_scrapper_spark.sources.warc import surt_key_col
        from web_scrapper_spark.urlutils import surt

        df = spark.createDataFrame([(c,) for c in self.CASES], "url string")
        for r in df.select(
            "url", surt_key_col(F.col("url")).alias("k")
        ).collect():
            assert r["k"] == surt(r["url"]), r["url"]

    def test_domain_and_subdomains_contiguous(self):
        from web_scrapper_spark.urlutils import surt

        keys = sorted(
            surt(u)
            for u in [
                "http://example.com/a",
                "http://sub.example.com/b",
                "http://deep.sub.example.com/c",
                "http://examplezz.com/d",
                "http://aaa.com/e",
                "http://zzz.org/f",
            ]
        )
        fam = [k for k in keys if k.startswith("com,example)") or k.startswith("com,example,")]
        lo, hi = keys.index(fam[0]), keys.index(fam[-1])
        # the whole example.com family (domain + subdomains) is one
        # contiguous run — examplezz.com does NOT interleave
        assert keys[lo : hi + 1] == fam
        assert "com,examplezz)/d" not in fam

    def test_cc_index_layout_sorted_and_disjoint(self, spark):
        from pyspark.sql import functions as F

        from web_scrapper_spark.sources.warc import cc_index

        rows = [
            (f"http://h{i % 13}.example.org/p/{i}", f"2026012{i % 10}")
            for i in range(200)
        ]
        cdx = spark.createDataFrame(rows, "url string, ts string")
        out = cc_index(cdx, n_shards=5)
        pdf = out.withColumn(
            "pid", F.spark_partition_id()
        ).toPandas()
        # sorted within every partition
        for _, grp in pdf.groupby("pid"):
            keys = list(zip(grp["surt_key"], grp["ts"]))
            assert keys == sorted(keys)
        # partition key-ranges are disjoint and ordered
        bounds = (
            pdf.groupby("pid")["surt_key"].agg(["min", "max"]).sort_index()
        )
        prev_max = None
        for _, b in bounds.iterrows():
            if prev_max is not None:
                assert b["min"] >= prev_max
            prev_max = b["max"]
        assert pdf["pid"].nunique() > 1
