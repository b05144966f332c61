"""Unit tests for URL canonicalization + murmur3 (F14/F15/F21)."""

from web_scrapper_spark import urlutils as uu


class TestMurmur3:
    def test_known_values_stable(self):
        # regression anchors; Spark-parity is asserted in test_spark_core
        assert isinstance(uu.murmur3_32(b"abc"), int)
        assert uu.murmur3_32(b"") == uu.murmur3_32(b"")
        assert uu.murmur3_32(b"abc") != uu.murmur3_32(b"abd")

    def test_signed_range(self):
        for s in [b"", b"a", b"ab", b"abc", b"abcd", "é".encode("utf-8")]:
            h = uu.murmur3_32(s)
            assert -(2**31) <= h < 2**31


class TestCanonicalize:
    def test_lowercase_and_default_port(self):
        assert (
            uu.canonicalize_url("HTTP://Host0.Example.ORG:80/Path")
            == "http://host0.example.org/Path"
        )

    def test_fragment_stripped_query_kept(self):
        assert (
            uu.canonicalize_url("https://h.org/a?page=2#frag")
            == "https://h.org/a?page=2"
        )

    def test_empty_path(self):
        assert uu.canonicalize_url("https://h.org") == "https://h.org/"


class TestCleanUrl:
    def test_strip_tracking(self):
        assert uu.clean_url("http://x.org/a?utm=1#f") == "http://x.org/a"

    def test_scheme_default(self):
        assert uu.clean_url("www.x.org/a") == "http://www.x.org/a"


class TestHostAbsolutize:
    def test_host_of(self):
        assert uu.host_of("https://Host1.Example.org:8080/x") == "host1.example.org"

    def test_absolutize(self):
        assert uu.absolutize("https://h.org/blog/", "post-1") == "https://h.org/blog/post-1"
        assert uu.absolutize("https://h.org/blog/", "/p") == "https://h.org/p"
        assert uu.absolutize("https://h.org/b", "https://x.org/") == "https://x.org/"
