"""Unit tests for the stdlib HTML DOM + CSS selector engine."""

import re

from web_scrapper_spark import minisoup as ms

HTML = """
<html><head>
<meta property="og:title" content="T"/>
<meta name="description" content="D">
</head><body>
<div id="main" class="wrap outer">
  <ul>
    <li class="item"><a href="/a">Alpha</a></li>
    <li class="item hot"><a href="/b">Beta</a></li>
  </ul>
  <div class="pagination"><span class="current">2</span><a href="/page/3/">3</a></div>
  <article><h1>Title</h1><p>Para one text here.</p><p>Para two text here.</p></article>
</div>
</body></html>
"""


def root():
    return ms.parse(HTML)


class TestParse:
    def test_nesting_and_text(self):
        r = root()
        assert r.select_one("h1").get_text() == "Title"

    def test_void_elements(self):
        r = ms.parse("<div><img src='x'><span>s</span></div>")
        img = r.select_one("img")
        assert img["src"] == "x"
        assert r.select_one("div span").get_text() == "s"

    def test_implicit_li_close(self):
        r = ms.parse("<ul><li>a<li>b</ul>")
        assert [li.get_text() for li in r.select("li")] == ["a", "b"]

    def test_bytes_input(self):
        assert ms.parse("<p>é</p>".encode("utf-8")).select_one("p").get_text() == "é"

    def test_entities(self):
        assert ms.parse("<p>a &amp; b</p>").select_one("p").get_text() == "a & b"

    def test_get_text_strip(self):
        r = ms.parse("<div> a <b> b </b> c </div>")
        assert r.select_one("div").get_text(strip=True) == "abc"
        assert r.select_one("div").get_text() == " a  b  c "


class TestSelect:
    def test_class_and_id(self):
        assert root().select_one("#main") is not None
        assert len(root().select(".item")) == 2
        assert len(root().select(".item.hot")) == 1

    def test_attr_selectors(self):
        r = root()
        assert r.select_one("meta[property='og:title']")["content"] == "T"
        assert r.select_one("a[href^='/page']")["href"] == "/page/3/"
        assert r.select_one("[href*='age']") is not None
        assert r.select_one("a[href$='/3/']") is not None

    def test_descendant_and_child(self):
        r = root()
        assert len(r.select("ul a")) == 2
        assert len(r.select("ul > li")) == 2
        assert r.select("ul > a") == []

    def test_group(self):
        assert len(root().select("h1, .current")) == 2

    def test_contains(self):
        assert root().select_one("a:contains('Beta')")["href"] == "/b"

    def test_first_of_type(self):
        r = ms.parse("<div><img src='1'><img src='2'></div>")
        assert r.select_one("div img:first-of-type")["src"] == "1"

    def test_document_order(self):
        hrefs = [a["href"] for a in root().select("a")]
        assert hrefs == ["/a", "/b", "/page/3/"]


class TestFind:
    def test_find_by_name_list(self):
        assert root().find(["h1", "h2"]).name == "h1"

    def test_find_class_callable(self):
        hits = root().find_all(
            ["li"], class_=lambda x: x and "hot" in str(x).lower()
        )
        assert len(hits) == 1

    def test_find_attr_true(self):
        assert root().find("a", href=True)["href"] == "/a"

    def test_find_attr_regex(self):
        assert root().find("a", href=re.compile(r"/page/\d+/$")) is not None

    def test_find_text_returns_string(self):
        hit = root().find(text=re.compile(r"Para one"))
        assert isinstance(hit, str)
        assert "Para one" in hit

    def test_find_kwarg_attr(self):
        assert root().find("meta", property="og:title")["content"] == "T"

    def test_find_name_and_text(self):
        link = root().find("a", href=True, text=re.compile(r"\d+"))
        assert link["href"] == "/page/3/"

    def test_next_sibling(self):
        cur = root().select_one(".current")
        assert cur.find_next_sibling()["href"] == "/page/3/"

    def test_string_property(self):
        assert root().select_one("h1").string == "Title"
        assert root().select_one("ul").string is None

    def test_find_all_multitoken_class_attr_matches_walk(self):
        # attrs={"class": "a b"} means EXACT attribute value (BS4
        # semantics); the token-keyed class index must not short-circuit
        # it to [] — regression: indexed parse returned [] while the
        # walk matched <li class="item hot">
        doc = root()
        indexed = doc.find_all("li", attrs={"class": "item hot"})
        doc.index = None
        walked = doc.find_all("li", attrs={"class": "item hot"})
        assert [t.attrs.get("class") for t in indexed] == ["item hot"]
        assert [t.start for t in indexed] == [t.start for t in walked]

    def test_find_all_empty_class_attr_matches_walk(self):
        doc = ms.parse('<p class="">x</p><p class="a">y</p>')
        indexed = doc.find_all("p", attrs={"class": ""})
        doc.index = None
        walked = doc.find_all("p", attrs={"class": ""})
        assert len(indexed) == len(walked) == 1
        assert indexed[0].get_text() == "x"

    def test_attrs_mutation_raises_not_corrupts(self):
        # _parse_attrs shares one mapping across all tags with identical
        # attribute blobs, process-wide; mutation must raise instead of
        # silently contaminating unrelated tags/documents
        import pytest

        a = ms.parse('<div class="shared-blob">1</div>').select_one("div")
        with pytest.raises(TypeError):
            a.attrs["class"] = "mutated"
        b = ms.parse('<div class="shared-blob">2</div>').select_one("div")
        assert b.attrs["class"] == "shared-blob"

    def test_text_len_counts_bare_lt_literals(self):
        # bare '<' becomes a literal text child; text_len's invariant
        # is == len(root.get_text()), so it must count those chars too
        doc = ms.parse('<div>a < b and i <3 u</div>')
        assert doc.text_len == len(doc.get_text()) == 16


class TestSubtreePoolSlicing:
    """The index pools answer subtree probes via a bisect slice on the
    document-ordered .start intervals; every result must equal the
    un-indexed tree walk (boundaries: first/last child, self-exclusion,
    sibling exclusion, empty range)."""

    DOC = (
        '<div id="a" class="zone"><p class="x">a1</p><p class="x">a2</p>'
        '<span data-k="1">s</span></div>'
        '<div id="b" class="zone"><p class="x">b1</p>'
        '<div class="zone inner"><p class="x">b2</p></div></div>'
        '<p class="x">tail</p>'
    )

    def both(self, scope_sel, probe):
        doc = ms.parse(self.DOC)
        indexed = probe(doc.select_one(scope_sel))
        doc.index = None
        walked = probe(doc.select_one(scope_sel))
        return indexed, walked

    def assert_same(self, scope_sel, probe):
        indexed, walked = self.both(scope_sel, probe)
        assert [t.start for t in indexed] == [t.start for t in walked]

    def test_select_scoped_to_first_and_second_sibling(self):
        self.assert_same("#a", lambda el: el.select(".x"))
        self.assert_same("#b", lambda el: el.select(".x"))

    def test_select_excludes_scope_element_itself(self):
        # scope has the probed class: only strict descendants match
        indexed, walked = self.both("#b", lambda el: el.select(".zone"))
        assert [t.attrs.get("class") for t in indexed] == ["zone inner"]
        assert [t.start for t in indexed] == [t.start for t in walked]

    def test_select_empty_range(self):
        indexed, walked = self.both("#a", lambda el: el.select(".nope"))
        assert indexed == [] and walked == []

    def test_find_all_scoped_by_name_and_multiname(self):
        self.assert_same("#a", lambda el: el.find_all("p"))
        self.assert_same("#b", lambda el: el.find_all(["p", "span"]))

    def test_find_all_scoped_by_attr_kwarg(self):
        indexed, walked = self.both("#a", lambda el: el.find_all(attrs={"data-k": "1"}))
        assert len(indexed) == 1
        assert [t.start for t in indexed] == [t.start for t in walked]

    def test_last_element_included_at_upper_bound(self):
        # b2's <p> is the last tag inside #b's inner div: start == end
        # boundary of the containment slice
        doc = ms.parse(self.DOC)
        inner = doc.select_one(".inner")
        hits = inner.select(".x")
        assert [t.get_text() for t in hits] == ["b2"]
