"""RSS 2.0 sink (SURVEY.md §2.1 S14; reference content.py:1179-1249).

A driver-side post-step over a (small, already-aggregated) articles
DataFrame — feed generation is not a distributed op. Determinism: the
build/fallback timestamp is injected (``now`` parameter) instead of
wall-clock ``utcnow`` so tests are exact (SURVEY.md §2.8 F20).
"""

from __future__ import annotations

from datetime import datetime, timezone
from typing import Dict, Iterable, List, Optional
from xml.sax.saxutils import escape

from pyspark.sql import DataFrame

_RFC822 = "%a, %d %b %Y %H:%M:%S +0000"


def generate_rss(
    articles: Iterable[Dict],
    title: str,
    description: str,
    link: str,
    now: Optional[datetime] = None,
) -> str:
    """Article dicts → RSS 2.0 XML (same escaping/pubDate/enclosure
    semantics as the reference; rows without title+url are skipped)."""
    now = now or datetime.now(timezone.utc)
    now_str = now.strftime(_RFC822)
    rss: List[str] = [
        '<?xml version="1.0" encoding="UTF-8" ?>',
        '<rss version="2.0" xmlns:atom="http://www.w3.org/2005/Atom">',
        "<channel>",
        f"<title>{escape(title)}</title>",
        f"<description>{escape(description)}</description>",
        f"<link>{escape(link)}</link>",
        f'<atom:link href="{escape(link)}" rel="self" type="application/rss+xml" />',
        f"<lastBuildDate>{now_str}</lastBuildDate>",
    ]
    for article in articles:
        if not article.get("title") or not article.get("url"):
            continue
        pub_date = now_str
        if article.get("date"):
            try:
                pub_date = datetime.fromisoformat(article["date"]).strftime(_RFC822)
            except ValueError:
                pass
        rss.append("<item>")
        rss.append(f"<title>{escape(article['title'])}</title>")
        rss.append(f"<link>{escape(article['url'])}</link>")
        rss.append(f"<guid>{escape(article['url'])}</guid>")
        if article.get("author"):
            rss.append(f"<author>{escape(article['author'])}</author>")
        rss.append(f"<pubDate>{pub_date}</pubDate>")
        if article.get("excerpt"):
            rss.append(f"<description>{escape(article['excerpt'])}</description>")
        if article.get("content"):
            rss.append(
                f"<content:encoded><![CDATA[{article['content']}]]></content:encoded>"
            )
        for category in article.get("categories") or []:
            rss.append(f"<category>{escape(category)}</category>")
        if article.get("image"):
            rss.append(
                f'<enclosure url="{escape(article["image"])}" type="image/jpeg" />'
            )
        rss.append("</item>")
    rss.append("</channel>")
    rss.append("</rss>")
    return "\n".join(rss)


def rss_from_dataframe(
    articles: DataFrame,
    title: str,
    description: str,
    link: str,
    limit: int = 100,
    now: Optional[datetime] = None,
) -> str:
    """DataFrame → feed: deterministic top-N (newest date first, url
    tiebreak) collected to the driver, then the pure generator."""
    cols = [c for c in ("title", "url", "date", "author", "excerpt",
                        "content", "categories", "image") if c in articles.columns]
    rows = (
        articles.select(*cols)
        .orderBy(*[articles[c].desc_nulls_last() for c in ("date",) if c in cols],
                 "url")
        .limit(limit)
        .collect()
    )
    return generate_rss([r.asDict() for r in rows], title, description, link, now=now)
