"""Property-based tests (hypothesis) for the pure-Python core — these
functions run on every page on every executor, so fuzz them hard."""

import re
import string

from hypothesis import given, settings
from hypothesis import strategies as st

from web_scrapper_spark import minisoup, textutils as tu, urlutils as uu
from web_scrapper_spark.extract.ecommerce import parse_price, parse_rating

text_strategy = st.text(max_size=300)


class TestCleanTextProperties:
    """NOTE: the reference's clean_text removes control chars AFTER the
    whitespace collapse+strip (utils/text.py:29-42), so inputs like
    'a \\x1b b' legitimately yield 'a  b' — double spaces and edge
    spaces can reappear. We reproduce that faithfully, so the invariants
    here are exactly the reference's: no control chars, deterministic,
    and idempotent for control-free inputs."""

    @given(text_strategy)
    @settings(max_examples=200)
    def test_idempotent_when_control_free(self, s):
        s = re.sub(r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]", "", s)
        once = tu.clean_text(s)
        assert tu.clean_text(once) == once

    @given(text_strategy)
    def test_no_control_chars_and_deterministic(self, s):
        out = tu.clean_text(s)
        assert not re.search(r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]", out)
        assert tu.clean_text(s) == out


class TestSummarizeProperties:
    @given(text_strategy, st.integers(min_value=10, max_value=200))
    @settings(max_examples=100)
    def test_never_crashes_and_bounded(self, s, max_len):
        out = tu.summarize_text(s, max_len)
        cleaned = tu.clean_text(s)
        if len(cleaned) <= max_len:
            assert out == cleaned
        else:
            # sentence-fill keeps whole sentences ≤ max_len, or
            # word-boundary truncation adds "..." (≤ max_len + 3)
            assert len(out) <= max(max_len + 3, len(out.split(" ")[0]) + 3)


class TestMurmurProperties:
    @given(st.binary(max_size=64))
    @settings(max_examples=300)
    def test_signed_32bit_and_deterministic(self, b):
        h = uu.murmur3_32(b)
        assert -(2**31) <= h < 2**31
        assert h == uu.murmur3_32(b)


class TestCanonicalizeProperties:
    @given(
        st.text(alphabet=string.ascii_letters + string.digits, min_size=1, max_size=10),
        st.text(alphabet=string.ascii_letters + string.digits + "/", max_size=20),
    )
    def test_idempotent(self, host, path):
        url = f"https://{host}.org/{path}"
        once = uu.canonicalize_url(url)
        assert uu.canonicalize_url(once) == once

    @given(st.text(max_size=40))
    @settings(max_examples=100)
    def test_never_crashes(self, junk):
        try:
            uu.canonicalize_url(f"https://h.org/{junk}")
        except ValueError:
            pass  # urlparse rejects some junk (e.g. bad ports) — fine


class TestMinisoupProperties:
    @given(text_strategy)
    @settings(max_examples=150)
    def test_parse_never_crashes(self, s):
        root = minisoup.parse(s)
        root.get_text()
        root.find_all("a", href=True)
        root.select("div .x, a[href]")

    @given(st.lists(st.sampled_from(["<div>", "</div>", "<p>", "x", "<a href='u'>",
                                     "</a>", "<br>", "&amp;", "<!-- c -->"]),
                    max_size=30))
    def test_malformed_nesting_tolerated(self, parts):
        root = minisoup.parse("".join(parts))
        assert isinstance(root.get_text(), str)

    @given(text_strategy)
    def test_text_roundtrip_through_escaped_html(self, s):
        import html as h

        root = minisoup.parse(f"<p>{h.escape(s)}</p>")
        node = root.select_one("p")
        if node is not None:
            # convert_charrefs folds entities back; whitespace preserved
            assert node.get_text() == s

    # random nested docs: every indexed subtree probe (the bisect slice
    # over document-ordered pools) must equal the un-indexed tree walk
    _tags = st.sampled_from(["div", "p", "span", "a", "li"])
    _cls = st.sampled_from(["", "x", "y", "x y"])

    @st.composite
    def _doc(draw, depth=0):
        n = draw(st.integers(0, 3 if depth < 3 else 0))
        parts = []
        for _ in range(n):
            t = draw(TestMinisoupProperties._tags)
            c = draw(TestMinisoupProperties._cls)
            attr = f' class="{c}"' if c else ""
            parts.append(f"<{t}{attr}>{draw(TestMinisoupProperties._doc(depth + 1))}t</{t}>")
        return "".join(parts)

    @given(_doc(), st.integers(0, 30))
    @settings(max_examples=120)
    def test_subtree_probes_match_walk(self, doc_html, pick):
        doc = minisoup.parse(f"<html><body>{doc_html}</body></html>")
        tags = list(doc.iter_tags())
        scope = tags[pick % len(tags)]
        probes = [
            lambda el: el.select(".x"),
            lambda el: el.select("span"),
            lambda el: el.select_one("a"),
            lambda el: el.find_all("p"),
            lambda el: el.find_all(["a", "li"]),
            lambda el: el.find_all(class_="y"),
        ]
        indexed = [p(scope) for p in probes]
        doc.index = None
        walked = [p(scope) for p in probes]
        def key(r):
            if r is None:
                return None
            if isinstance(r, list):
                return [t.start for t in r]
            return r.start
        assert [key(r) for r in indexed] == [key(r) for r in walked]


class TestParsers:
    @given(text_strategy)
    def test_parse_price_never_crashes(self, s):
        out = parse_price(s)
        assert out is None or isinstance(out, float)

    @given(text_strategy)
    def test_parse_rating_bounded_types(self, s):
        out = parse_rating(s)
        assert out is None or isinstance(out, float)


class TestFastPathEquivalence:
    """The perf fast paths must be byte-equivalent to the reference
    pipeline they shortcut."""

    @given(text_strategy)
    @settings(max_examples=400)
    def test_clean_text_fast_path_equiv(self, s):
        # the reference pipeline, run unconditionally
        ref = tu._WS_RE.sub(" ", s).strip().replace("\xa0", " ")
        ref = ref.replace("“", '"').replace("”", '"')
        ref = ref.replace("‘", "'").replace("’", "'")
        ref = tu._CTRL_RE.sub("", ref)
        assert tu.clean_text(s) == ref

    @given(st.lists(st.sampled_from(
        ["spark", "crawl", "the", "dedup", "abc", "engine", "a", "of",
         "frontier", "epoch", "merge"]), max_size=120), st.integers(1, 8))
    @settings(max_examples=200)
    def test_keywords_counter_equiv(self, words, k):
        text = " ".join(words)
        # reference algorithm: plain dict count + stable sort by freq desc
        cleaned = tu.clean_text(text.lower())
        toks = tu._WORD_RE.findall(cleaned)
        filtered = [w for w in toks if w not in tu.STOP_WORDS and len(w) > 2]
        freq = {}
        for w in filtered:
            freq[w] = freq.get(w, 0) + 1
        ranked = sorted(freq.items(), key=lambda x: x[1], reverse=True)
        expected = [w for w, _ in ranked[:k]]
        assert tu.extract_keywords(text, max_keywords=k) == expected

    @given(st.integers(1990, 2030), st.integers(0, 13), st.integers(0, 32))
    @settings(max_examples=300)
    def test_iso_date_fast_path_equiv(self, y, m, d):
        from datetime import datetime
        from web_scrapper_spark.extract import content as C
        date_str = f"{y:04d}-{m:02d}-{d:02d}"
        try:
            expected = datetime.strptime(date_str, "%Y-%m-%d").date().isoformat()
        except ValueError:
            expected = None
        got = None
        if C._ISO_DATE_RE.match(date_str):
            yy, mm, dd = date_str.split("-")
            try:
                got = datetime(int(yy), int(mm), int(dd)).date().isoformat()
            except ValueError:
                got = None
        assert got == expected


class TestMediaHeaderProperties:
    """Container sniffing is pure Python over untrusted bytes — fuzz
    it directly (no Spark per example)."""

    @given(st.binary(max_size=128))
    @settings(max_examples=300)
    def test_never_raises_on_garbage(self, b):
        from web_scrapper_spark.operators.multimodal import parse_media_header

        fmt, w, h, sr, ch, ok = parse_media_header(b)
        assert isinstance(ok, bool)
        if ok:
            assert fmt in ("png", "gif", "jpeg", "wav")

    @given(
        st.integers(min_value=0, max_value=10**9),
        st.sampled_from(["png", "gif", "jpeg", "wav"]),
    )
    @settings(max_examples=200)
    def test_construct_parse_roundtrip(self, media_id, kind):
        from web_scrapper_spark.operators.multimodal import (
            build_container_payload,
            parse_media_header,
        )

        fmt, w, h, sr, ch, ok = parse_media_header(
            build_container_payload(kind, media_id)
        )
        assert ok and fmt == kind
        if kind in ("png", "gif", "jpeg"):
            assert w == media_id % 1000 + 1
            assert h == (media_id * 7) % 1000 + 1
        if kind == "wav":
            assert sr == 8000 + (media_id % 8) * 4000
            assert ch == media_id % 2 + 1

    @given(st.binary(max_size=64))
    @settings(max_examples=200)
    def test_truncation_never_raises(self, tail):
        from web_scrapper_spark.operators.multimodal import (
            build_container_payload,
            parse_media_header,
        )

        for kind in ("png", "gif", "jpeg", "wav"):
            full = build_container_payload(kind, 12345)
            for cut in (2, 6, 9, 13):
                parse_media_header(full[:cut] + tail)


class TestRobotsSitemapProperties:
    @given(st.lists(st.text(alphabet=string.printable, max_size=40), max_size=30))
    @settings(max_examples=150, deadline=None)
    def test_parse_robots_never_raises(self, lines):
        from web_scrapper_spark.frontier.robots import parse_robots_txt

        out = parse_robots_txt("\n".join(lines))
        assert isinstance(out["disallow_prefixes"], list)
        assert isinstance(out["sitemaps"], list)
        # sitemaps are unique, order preserved
        assert len(out["sitemaps"]) == len(set(out["sitemaps"]))


class TestDhashProperties:
    @given(st.integers(min_value=0, max_value=(1 << 64) - 1))
    @settings(max_examples=200, deadline=None)
    def test_bitmap_codec_inverts_dhash(self, h):
        """dhash64(bitmap_payload_decoder(h)) == h for EVERY 64-bit
        value — the codec is a right inverse of the hash."""
        from web_scrapper_spark.operators.multimodal import (
            bitmap_payload_decoder,
            dhash64,
        )

        grid = bitmap_payload_decoder(h.to_bytes(8, "big"), {})
        assert dhash64(grid) & ((1 << 64) - 1) == h

    @given(
        st.integers(min_value=0, max_value=(1 << 64) - 1),
        st.integers(min_value=1, max_value=4),
        st.integers(min_value=1, max_value=4),
    )
    @settings(max_examples=100, deadline=None)
    def test_integer_upscale_invariance(self, h, ky, kx):
        import numpy as np

        from web_scrapper_spark.operators.multimodal import (
            bitmap_payload_decoder,
            dhash64,
        )

        grid = bitmap_payload_decoder(h.to_bytes(8, "big"), {})
        up = np.kron(grid, np.ones((ky, kx)))
        assert dhash64(up) == dhash64(grid)

    @given(st.binary(min_size=0, max_size=24))
    @settings(max_examples=100, deadline=None)
    def test_decoder_never_crashes(self, payload):
        from web_scrapper_spark.operators.multimodal import (
            bitmap_payload_decoder,
            dhash64,
        )

        grid = bitmap_payload_decoder(payload, {})
        assert grid.shape == (8, 9)
        dhash64(grid)


class TestRasterCodecProperties:
    """Round-5 verdict task: property-fuzz the raster codecs. The
    mutation suite pins shared constants; these pin the SPEC CORNERS —
    odd dimensions, EOB-heavy blocks, LZW dictionary resets, 4:2:0
    edge MCUs, restart boundaries, interlace passes. Every example
    asserts the engine decoder and the INDEPENDENT oracle twin
    (__spark_entry__) agree bit-for-bit; GIF additionally asserts the
    exact-roundtrip contract against the source."""

    @staticmethod
    def _oracle():
        import __spark_entry__ as se

        return se

    @staticmethod
    def _pixels(h, w, seed, channels=0, levels=256):
        import numpy as np

        rng = np.random.default_rng(seed)
        shape = (h, w) if channels == 0 else (h, w, channels)
        px = rng.integers(0, levels, size=shape, dtype=np.int64)
        if levels < 256:
            px = px * (255 // max(1, levels - 1))
        return px.astype(np.uint8)

    @given(
        st.integers(min_value=1, max_value=33),
        st.integers(min_value=1, max_value=17),
        st.integers(min_value=1, max_value=100),
        st.integers(min_value=0, max_value=1),
        st.integers(min_value=0, max_value=3),
        st.integers(min_value=0, max_value=2**31 - 1),
    )
    @settings(max_examples=40, deadline=None)
    def test_jpeg_gray_engine_equals_oracle(self, h, w, q, pad, dri, seed):
        import numpy as np

        from web_scrapper_spark.operators import rasters as rs

        px = self._pixels(h, w, seed)
        payload = rs.build_jpeg(
            px, quality=q, huff_pad=pad, restart_interval=dri
        )
        eng = rs.jpeg_decode_pixels(payload)
        ora = np.array(self._oracle()._oracle_jpeg_decode(payload))
        assert eng.shape == (h, w)
        assert np.array_equal(eng.astype(np.int64), ora)

    @given(
        st.integers(min_value=1, max_value=33),
        st.integers(min_value=1, max_value=17),
        st.integers(min_value=1, max_value=100),
        st.sampled_from(["444", "420", "422", "440"]),
        st.integers(min_value=0, max_value=2),
        st.integers(min_value=0, max_value=2**31 - 1),
    )
    @settings(max_examples=40, deadline=None)
    def test_jpeg_rgb_engine_equals_oracle(self, h, w, q, sub, dri, seed):
        import numpy as np

        from web_scrapper_spark.operators import rasters as rs

        px = self._pixels(h, w, seed, channels=3)
        payload = rs.build_jpeg(
            px, quality=q, subsampling=sub, restart_interval=dri
        )
        eng = rs.jpeg_decode_pixels(payload)
        ora = np.array(self._oracle()._oracle_jpeg_decode(payload))
        assert eng.shape == (h, w)
        assert np.array_equal(eng.astype(np.int64), ora)
        if sub == "420":
            # the luma plane never depends on chroma layout
            d444 = rs.jpeg_decode_pixels(
                rs.build_jpeg(px, quality=q, restart_interval=dri)
            )
            assert np.array_equal(eng, d444)

    @given(
        st.integers(min_value=1, max_value=33),
        st.integers(min_value=1, max_value=17),
        st.integers(min_value=1, max_value=100),
        st.sampled_from([(0, "444"), (3, "444"), (3, "420"), (3, "422")]),
        st.integers(min_value=0, max_value=4),
        st.integers(min_value=0, max_value=2**31 - 1),
    )
    @settings(max_examples=30, deadline=None)
    def test_jpeg_progressive_equals_baseline_and_oracle(
        self, h, w, q, chan_sub, dri, seed
    ):
        # the SOF2 ladder carries the SAME quantized coefficients, so
        # progressive ≡ baseline pixels — with or without restart
        # intervals punctuating every scan — and the independent
        # oracle twin (sparse-store successive approximation, chunked
        # bit strings) agrees with the engine decoder bit-for-bit
        import numpy as np

        from web_scrapper_spark.operators import rasters as rs

        channels, sub = chan_sub
        px = self._pixels(h, w, seed, channels=channels)
        base = rs.jpeg_decode_pixels(
            rs.build_jpeg(px, quality=q, subsampling=sub)
        )
        pb = rs.build_jpeg(
            px, quality=q, subsampling=sub, progressive=True,
            restart_interval=dri,
        )
        prog = rs.jpeg_decode_pixels(pb)
        assert np.array_equal(base, prog)
        ora = np.array(self._oracle()._oracle_jpeg_decode(pb))
        assert np.array_equal(prog.astype(np.int64), ora)

    @given(
        st.integers(min_value=1, max_value=33),
        st.integers(min_value=1, max_value=17),
        st.integers(min_value=2, max_value=256),
        st.booleans(),
        st.integers(min_value=0, max_value=11),
        st.integers(min_value=0, max_value=2**31 - 1),
    )
    @settings(max_examples=60, deadline=None)
    def test_gif_gray_exact_roundtrip(self, h, w, levels, inter, rot, seed):
        import numpy as np

        from web_scrapper_spark.operators import rasters as rs

        px = self._pixels(h, w, seed, levels=levels)
        payload = rs.build_gif(px, palette_rot=rot, interlace=inter)
        eng = rs.gif_decode_pixels(payload)
        ora = np.array(self._oracle()._oracle_gif_decode(payload))
        assert np.array_equal(eng, px)  # gray GIF is lossless
        assert np.array_equal(eng.astype(np.int64), ora)

    @given(
        st.integers(min_value=40, max_value=90),
        st.integers(min_value=40, max_value=90),
        st.integers(min_value=0, max_value=2**31 - 1),
        st.booleans(),
    )
    @settings(max_examples=8, deadline=None)
    def test_gif_large_dict_reset_engine_equals_oracle(
        self, h, w, seed, inter
    ):
        # bigger grids force LZW code growth (and, with 256 levels,
        # dictionary resets) through BOTH implementations
        import numpy as np

        from web_scrapper_spark.operators import rasters as rs

        px = self._pixels(h, w, seed)
        payload = rs.build_gif(px, interlace=inter)
        eng = rs.gif_decode_pixels(payload)
        ora = np.array(self._oracle()._oracle_gif_decode(payload))
        assert np.array_equal(eng, px)
        assert np.array_equal(eng.astype(np.int64), ora)

    @given(
        st.integers(min_value=1, max_value=20),
        st.integers(min_value=1, max_value=14),
        st.integers(min_value=1, max_value=4),
        st.integers(min_value=0, max_value=3),
        st.integers(min_value=0, max_value=2**31 - 1),
    )
    @settings(max_examples=40, deadline=None)
    def test_gif_animation_engine_equals_oracle(
        self, h, w, n_frames, mode, seed
    ):
        # random animations across every encoder feature axis must
        # render identically through the engine compositor and the
        # independent oracle twin; plain full-frame mode additionally
        # round-trips the source screens exactly
        import numpy as np

        from web_scrapper_spark.operators import rasters as rs

        rng = np.random.default_rng(seed)
        frames = [
            (rng.integers(0, 5, size=(h, w)) * 51).astype(np.uint8)
            for _ in range(n_frames)
        ]
        delays = [int(rng.integers(0, 500)) for _ in range(n_frames)]
        kw = {"delays_cs": delays}
        if mode == 1:
            kw.update(delta_frames=True, transparency=True)
        elif mode == 2:
            kw.update(
                rects=[None]
                + [
                    (
                        int(rng.integers(0, w)),
                        int(rng.integers(0, h)),
                        0,  # patched below
                        0,
                    )
                    for _ in range(n_frames - 1)
                ],
                disposals=[1]
                + [int(rng.integers(0, 4)) for _ in range(n_frames - 1)],
            )
            kw["rects"] = [None] + [
                (
                    left,
                    top,
                    int(rng.integers(1, w - left + 1)),
                    int(rng.integers(1, h - top + 1)),
                )
                for (left, top, _z, _z2) in kw["rects"][1:]
            ]
        elif mode == 3:
            kw.update(
                local_palette_rot=[
                    int(rng.integers(0, 7)) for _ in range(n_frames)
                ],
                interlace_mask=int(rng.integers(0, 2 ** n_frames)),
                transparency=bool(rng.integers(0, 2)),
            )
        payload = rs.build_gif_animation(frames, **kw)
        eng = rs.gif_decode_frames(payload)
        ora = self._oracle()._oracle_gif_frames(payload)
        assert len(eng) == len(ora) == n_frames
        for fr, (delay, grid) in zip(eng, ora):
            assert fr["delay_cs"] == delay
            assert np.array_equal(
                fr["luma"].astype(np.int64), np.array(grid)
            )
        if mode in (0, 1):
            # full-frame and delta encodings composite back to the
            # exact source screens (gray GIF is lossless)
            for fr, src in zip(eng, frames):
                assert np.array_equal(fr["luma"], src)

    @given(
        st.integers(min_value=1, max_value=24),
        st.integers(min_value=1, max_value=18),
        st.integers(min_value=0, max_value=9),
        st.booleans(),
        st.integers(min_value=0, max_value=2**31 - 1),
    )
    @settings(max_examples=60, deadline=None)
    def test_png_shapes_engine_equals_oracle(
        self, h, w, shape, interlace, seed
    ):
        # every PNG shape x interlace through both decoders: the
        # engine (numpy strided passes) and the independent oracle
        # twin (byte lists + pass arithmetic) must agree bit-for-bit,
        # and lossless shapes must round-trip the source exactly
        import numpy as np

        from web_scrapper_spark.operators import multimodal as mm

        rng = np.random.default_rng(seed)
        kw = {}
        if shape == 0:  # 8-bit gray
            px = rng.integers(0, 256, (h, w), dtype=np.int64)
        elif shape == 1:  # RGB
            px = rng.integers(0, 256, (h, w, 3), dtype=np.int64)
        elif shape == 2:  # gray+alpha
            px = rng.integers(0, 256, (h, w, 2), dtype=np.int64)
        elif shape == 3:  # RGBA
            px = rng.integers(0, 256, (h, w, 4), dtype=np.int64)
        elif shape == 4:  # palette
            idx = rng.integers(0, 9, (h, w))
            px = np.stack(
                [(idx * m + c) % 256 for c, m in enumerate((37, 59, 17))],
                axis=2,
            )
            kw = {"palette": True, "palette_rot": int(rng.integers(0, 9))}
        elif shape == 5:  # 16-bit gray, raw uint16 source
            px = rng.integers(0, 65536, (h, w), dtype=np.int64)
            kw = {"depth": 16}
        elif shape == 6:  # 16-bit RGB
            px = rng.integers(0, 256, (h, w, 3), dtype=np.int64)
            kw = {"depth": 16}
        elif shape in (7, 8):  # packed 1/2/4-bit gray
            d = {7: 1, 8: 2}[shape] * (2 if bool(seed & 1) else 1)
            px = rng.integers(0, 1 << d, (h, w), dtype=np.int64)
            kw = {"depth": d}
        else:  # packed 4-bit palette
            idx = rng.integers(0, 16, (h, w))
            px = np.stack(
                [(idx * m + c) % 256 for c, m in enumerate((41, 23, 7))],
                axis=2,
            )
            kw = {"palette": True, "depth": 4}
        src = px.astype(np.uint16 if shape == 5 else np.uint8)
        payload = mm.build_png(
            src,
            interlace=interlace,
            filters=[int(rng.integers(0, 5)) for _ in range(3)],
            **kw,
        )
        eng = mm.png_decode_pixels(payload)
        ora = np.array(self._oracle()._oracle_png_decode(payload))
        assert np.array_equal(eng.astype(np.int64), ora)
        if shape == 0:
            assert np.array_equal(eng, src)
        elif shape == 5:
            assert np.array_equal(eng, (src >> 8).astype(np.uint8))
        elif shape in (7, 8):
            d = kw["depth"]
            rep = (src.astype(np.int64) * 255 // ((1 << d) - 1)).astype(
                np.uint8
            )
            assert np.array_equal(eng, rep)

    @given(
        st.integers(min_value=1, max_value=18),
        st.integers(min_value=1, max_value=14),
        st.integers(min_value=1, max_value=4),
        st.integers(min_value=0, max_value=2),
        st.integers(min_value=0, max_value=2**31 - 1),
    )
    @settings(max_examples=40, deadline=None)
    def test_apng_engine_equals_oracle(self, h, w, n_frames, kind, seed):
        # random APNG animations — gray/RGB/RGBA frames, random
        # dispose/blend ops and sub-rectangles — must render
        # identically through the numpy engine compositor and the
        # per-pixel pure-Python oracle twin (the premultiplied integer
        # contract is the only shared surface)
        import numpy as np

        from web_scrapper_spark.operators import multimodal as mm

        rng = np.random.default_rng(seed)
        ch = {0: 0, 1: 3, 2: 4}[kind]
        frames = []
        for _ in range(n_frames):
            shape = (h, w) if ch == 0 else (h, w, ch)
            frames.append(
                rng.integers(0, 256, shape, dtype=np.int64).astype(
                    np.uint8
                )
            )
        dispose = [0] + [
            int(rng.integers(0, 3)) for _ in range(n_frames - 1)
        ]
        blend = [0] + [
            int(rng.integers(0, 2)) for _ in range(n_frames - 1)
        ]
        rects = [None]
        for _ in range(n_frames - 1):
            if rng.integers(0, 2):
                left = int(rng.integers(0, w))
                top = int(rng.integers(0, h))
                rects.append(
                    (
                        left,
                        top,
                        int(rng.integers(1, w - left + 1)),
                        int(rng.integers(1, h - top + 1)),
                    )
                )
            else:
                rects.append(None)
        delays = [
            (int(rng.integers(0, 300)), int(rng.integers(0, 120)))
            for _ in range(n_frames)
        ]
        payload = mm.build_apng(
            frames, delays=delays, dispose=dispose, blend=blend,
            rects=rects,
        )
        eng = mm.apng_decode_frames(payload)
        ora = self._oracle()._oracle_apng_frames(payload)
        assert len(eng) == len(ora) == n_frames
        for fr, (dn, dd, grid) in zip(eng, ora):
            assert (fr["delay_num"], fr["delay_den"]) == (dn, dd)
            assert np.array_equal(
                fr["luma"].astype(np.int64), np.array(grid)
            )

    @given(
        st.integers(min_value=1, max_value=30),
        st.integers(min_value=1, max_value=22),
        st.integers(min_value=0, max_value=3),
        st.integers(min_value=0, max_value=2**31 - 1),
    )
    @settings(max_examples=40, deadline=None)
    def test_bmp_ico_engine_equals_oracle(self, h, w, kind, seed):
        # favicon family: gray/RGB BMP and DIB/PNG-entry ICO through
        # the engine and the independent byte-loop oracle twin
        import numpy as np

        from web_scrapper_spark.operators import multimodal as mm

        rng = np.random.default_rng(seed)
        if kind == 1:
            px = rng.integers(0, 256, (h, w, 3), dtype=np.int64).astype(
                np.uint8
            )
        else:
            px = rng.integers(0, 256, (h, w), dtype=np.int64).astype(
                np.uint8
            )
        if kind in (0, 1):
            payload = mm.build_bmp(px)
            eng = mm.bmp_decode_pixels(payload)
        else:
            # decoy only when the main entry is strictly larger —
            # largest-entry-wins keeps the FIRST entry on area ties
            # (documented), so a 1x1 main image must stand alone
            decoy = rng.integers(0, 256, (1, 1), dtype=np.int64).astype(
                np.uint8
            )
            entries = [decoy, px] if h * w > 1 else [px]
            main_bit = len(entries) - 1
            payload = mm.build_ico(
                entries,
                png_mask=(1 << main_bit) if kind == 3 else 0,
            )
            eng = mm.ico_decode_pixels(payload)
        ora = np.array(self._oracle()._oracle_favicon_decode(payload))
        assert np.array_equal(eng.astype(np.int64), ora)
        if kind in (0, 2, 3):
            assert np.array_equal(eng, px)  # gray BMP/ICO is lossless
