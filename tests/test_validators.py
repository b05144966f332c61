"""Unit tests for validators (SURVEY.md §2.8 F7-F13)."""

from web_scrapper_spark import validators as v


class TestEmail:
    def test_valid(self):
        assert v.is_valid_email("user.name+tag@real-domain.org")

    def test_invalid_shape(self):
        assert not v.is_valid_email("not-an-email")
        assert not v.is_valid_email("a@b")
        assert not v.is_valid_email("")
        assert not v.is_valid_email(None)

    def test_blacklist(self):
        assert not v.is_valid_email("x@example.com")
        assert not v.is_valid_email("x@TEST.COM")
        assert v.is_valid_email("x@example.org")  # only .com variants blocked


class TestPhone:
    def test_valid_formats(self):
        assert v.is_valid_phone("(212) 867-5309")
        assert v.is_valid_phone("+12128675309")

    def test_length_bounds(self):
        assert not v.is_valid_phone("123456")  # <7 digits
        assert not v.is_valid_phone("1" * 16)  # >15

    def test_fake_patterns(self):
        assert not v.is_valid_phone("0000000")
        assert not v.is_valid_phone("7777777777")
        assert not v.is_valid_phone("1234567890")  # sequential 12345...

    def test_country_code(self):
        assert v.is_valid_phone("+12128675309", "US")
        assert not v.is_valid_phone("+442071234567", "US")


class TestUrl:
    def test_valid(self):
        assert v.is_valid_url("https://example.org/path?q=1")
        assert v.is_valid_url("ftp://files.example.org")

    def test_invalid(self):
        assert not v.is_valid_url("notaurl")
        assert not v.is_valid_url("gopher://x.org")
        assert not v.is_valid_url("http://localhost/x")
        assert not v.is_valid_url("http://10.0.0.1/x")
        assert not v.is_valid_url("http://host.x/short-tld")


class TestDate:
    def test_formats(self):
        for s in ["2025-07-18", "07/18/2025", "Jul 18, 2025", "18 July 2025"]:
            assert v.is_valid_date(s), s

    def test_invalid(self):
        assert not v.is_valid_date("2025-13-45")
        assert not v.is_valid_date("whenever")


class TestIp:
    def test_v4(self):
        assert v.is_valid_ip("192.168.1.1")
        assert not v.is_valid_ip("256.1.1.1")

    def test_v6(self):
        assert v.is_valid_ip("2001:0db8:85a3:0000:0000:8a2e:0370:7334")
        assert not v.is_valid_ip("2001:db8")


class TestLuhn:
    def test_valid(self):
        assert v.is_valid_credit_card("4532015112830366")

    def test_invalid(self):
        assert not v.is_valid_credit_card("4532015112830367")
        assert not v.is_valid_credit_card("123")


class TestMisc:
    def test_text(self):
        assert v.is_valid_text("abc", min_length=2, max_length=5)
        assert not v.is_valid_text("abc", min_length=4)
        assert v.is_valid_text("abc", pattern=r"a.c")

    def test_json(self):
        assert v.is_valid_json('{"k": 1}')
        assert not v.is_valid_json("{k: 1}")

    def test_numeric(self):
        assert v.is_valid_numeric("3.5", 0, 10)
        assert not v.is_valid_numeric("11", 0, 10)
        assert not v.is_valid_numeric("abc")
