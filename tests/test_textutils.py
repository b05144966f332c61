"""Unit tests for textutils (SURVEY.md §2.8 F1-F6; §5.2-3)."""

from web_scrapper_spark import textutils as tu


class TestCleanText:
    def test_whitespace_collapse(self):
        assert tu.clean_text("a  b\t\nc") == "a b c"

    def test_strip(self):
        assert tu.clean_text("  hello  ") == "hello"

    def test_nbsp(self):
        # \xa0 is whitespace for \s, so it collapses with neighbors first
        assert tu.clean_text("a\xa0b") == "a b"

    def test_smart_quotes(self):
        assert tu.clean_text("“q” ‘s’") == "\"q\" 's'"

    def test_control_chars(self):
        assert tu.clean_text("a\x07b\x00c") == "abc"

    def test_empty(self):
        assert tu.clean_text("") == ""
        assert tu.clean_text(None) == ""


class TestCleanHtml:
    def test_tags_removed(self):
        assert tu.clean_html("<p>Hello <b>world</b></p>") == "Hello world"

    def test_entities(self):
        assert tu.clean_html("<p>a &amp; b</p>") == "a & b"


class TestSummarize:
    def test_short_passthrough(self):
        assert tu.summarize_text("Short.", 150) == "Short."

    def test_sentence_fill(self):
        text = "One sentence here. Two sentence here. " * 10
        out = tu.summarize_text(text, 50)
        assert out == "One sentence here. Two sentence here."

    def test_truncation_fallback(self):
        text = "word " * 100  # no sentence boundaries
        out = tu.summarize_text(text, 23)
        assert out.endswith("...")
        assert len(out) <= 27

    def test_no_sentences_fits_word_boundary(self):
        out = tu.summarize_text("abcdefghij klmnop qrstuv", 15, prefer_sentences=False)
        assert out == "abcdefghij..."


class TestKeywords:
    def test_basic(self):
        text = "spark spark spark crawl crawl the the the the frontier"
        assert tu.extract_keywords(text, 2) == ["spark", "crawl"]

    def test_stopwords_and_short(self):
        assert tu.extract_keywords("the is a to of in it we do", 5) == []

    def test_tie_order_first_seen(self):
        # equal freq → first-seen order (stable sort, text.py:198-201)
        assert tu.extract_keywords("zebra apple zebra apple", 2) == ["zebra", "apple"]


class TestEntities:
    def test_emails_urls_phones(self):
        ents = tu.extract_entities(
            "Mail a@b.org or see https://x.org/page call 555-123-4567"
        )
        assert ents["emails"] == ["a@b.org"]
        assert ents["urls"] == ["https://x.org/page"]
        assert "555-123-4567" in ents["phone_numbers"]

    def test_people_orgs(self):
        ents = tu.extract_entities("Dr. Jane Roe joined Acme Widget Inc in Springfield")
        assert ents["people"] == ["Dr. Jane Roe"]
        assert ents["organizations"] == ["Acme Widget Inc"]
        assert "Springfield" in ents["locations"]

    def test_ordered_dedup(self):
        ents = tu.extract_entities("a@b.org then a@b.org again")
        assert ents["emails"] == ["a@b.org"]


class TestCounts:
    def test_word_count(self):
        assert tu.word_count("one two three") == 3
        assert tu.word_count("") == 0

    def test_reading_time_floor_one(self):
        assert tu.estimate_reading_time("one two") == 1

    def test_reading_time_rounding(self):
        assert tu.estimate_reading_time("w " * 500) == 2  # round(500/200)=2
