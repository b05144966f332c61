"""Differential test: the fast regex tokenizer vs the html.parser-backed
reference builder (minisoup.parse vs minisoup.parse_reference).

The fast path must produce identical trees on well-formed and mildly
messy HTML (the fixture generator's output class plus curated edge
cases). Pathological inputs (truncated tags mid-attribute, unterminated
comments) are allowed to diverge — html.parser's tolerant-mode recovery
there is an implementation accident, not a spec — and are excluded.
"""

import random

from web_scrapper_spark import minisoup


def _dump(node, out):
    if isinstance(node, str):
        out.append(("T", node))
        return
    # start/end intervals included: the fused index build must assign
    # the same document-order intervals as the two-pass reference path
    out.append(
        ("E", node.name, tuple(sorted(node.attrs.items())), node.start, node.end)
    )
    for c in node.children:
        _dump(c, out)
    out.append(("/", node.name))


def _same(html: str) -> bool:
    a, b = [], []
    _dump(minisoup.parse(html), a)
    _dump(minisoup.parse_reference(html), b)
    return a == b


CURATED = [
    "<html><body><p>x</p></body></html>",
    "<div class='a b'><p>hi &amp; bye</p><br><img src=x.png></div>",
    "<ul><li>one<li>two<li>three</ul>",
    "<p>a<p>b<p>c",
    "<script>if (a < b && c > d) { x(); }</script><p>after</p>",
    "<style>p > a { color: red; }</style>",
    "<!-- comment --><!DOCTYPE html><?pi ?><div>x</div>",
    "<a href=\"x?a=1&amp;b=2\" title='it&#39;s'>link</a>",
    "<div data-empty novalue attr=>text</div>",
    "<b>bold <i>both</b> italic?</i>",
    "<div class=\"q>uote\">tricky</div>",
    "text < notatag >more",
    "<SPAN CLASS='UP'>case</SPAN>",
    "<td><tr><table><td>misnest</td></table>",
    "<article><h1 class=\"post-title\">T</h1>"
    "<div class=\"entry-content\"><p>Body &gt; stuff</p></div></article>",
    "a &lt; b &amp;&amp; c &gt; d &nbsp; &hellip; &#x27;",
    "<input type=checkbox checked><hr/><meta charset=utf-8>",
    "<div><p>unclosed",
    "",
    "plain text only",
    "<div\nclass='ml'\nid=x>multi</div>",
    "<script>unterminated raw text",
]


def test_curated_cases_match():
    for html in CURATED:
        assert _same(html), html


def test_structured_fuzz_matches():
    rng = random.Random(7)
    tags = ["div", "p", "span", "a", "article", "section", "h1", "li", "ul"]

    def gen(depth=0):
        out = []
        for _ in range(rng.randint(0, 4)):
            r = rng.random()
            if r < 0.45 and depth < 5:
                t = rng.choice(tags)
                at = ""
                if rng.random() < 0.6:
                    at = f' class="{rng.choice(["post", "entry", "item spaced", "x-y"])}"'
                if rng.random() < 0.3:
                    at += f" id=i{rng.randint(0, 9)}"
                if rng.random() < 0.2:
                    at += f' href="/p?a=1&amp;b={rng.randint(0, 9)}"'
                out.append(f"<{t}{at}>{gen(depth + 1)}</{t}>")
            elif r < 0.6:
                out.append(rng.choice(["<br>", "<img src=x.png>", "<hr/>", "<input disabled>"]))
            elif r < 0.7:
                out.append(f"<!-- c{rng.randint(0, 99)} -->")
            elif r < 0.78:
                out.append("<script>var a = 1 < 2 && 3 > 2;</script>")
            else:
                out.append(rng.choice(
                    ["text one", "a &amp; b", "x &lt; y", "&nbsp;spaced", "it&#39;s"]
                ))
        return "".join(out)

    for _ in range(1500):
        html = gen()
        assert _same(html), html


def test_fixture_pages_match():
    import web_scrapper_spark.fixtures.sitegen as sg

    spec = sg.SiteSpec(n_hosts=3, n_articles=60, blog_page_size=10)
    for url in list(sg.all_urls(spec))[:120]:
        assert _same(sg.page_html(url, spec)), url
