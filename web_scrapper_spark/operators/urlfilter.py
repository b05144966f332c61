"""URL-level corpus filtering: blocklist-domain matching and weighted
soft-word URL scoring, the first gate of a web-scale training-data
pipeline (RefinedWeb §2.1 / CCNet-style URL filtering).

Two signals per URL, both computed without touching page bytes:

- **domain blocklist** — the URL's host matches a blocked registrable
  domain OR any parent suffix of it (``ads.tracker.example.com`` is
  blocked by ``tracker.example.com`` and by ``example.com``).  The
  host is exploded into its O(label-count) suffixes; membership is a
  literal-array probe for small lists, or a broadcast ``left_semi``
  join when the blocklist is a DataFrame (UT1-sized lists — millions
  of domains — must take the join path: a literal array would be
  re-shipped inside every task binary).
- **soft-word score** — each configured fragment found in the lowered
  URL adds its weight (integer centi-units so the score crosses the
  oracle hash gate exactly); the URL is flagged when the total
  reaches ``threshold_centi``.

Everything is per-row native expressions (split / transform /
arrays_overlap / aggregate) — zero shuffle in the literal path, one
broadcast in the DataFrame path; at 10^10 URLs the operator is
embarrassingly parallel map work.

Reference parity note: the reference scraper crawls a user-given seed
list and has no URL-reputation surface; this operator belongs to the
training-data layer (SURVEY.md §6).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .partitioning import fan_out

#: Default soft-word fragments → weight in centi-units (score of 100
#: == one "certain" word). Mirrors the shape (not the content) of the
#: RefinedWeb/UT1 adult+spam keyword lists.
DEFAULT_SOFT_WORDS: dict[str, int] = {
    "casino": 100,
    "poker": 80,
    "betting": 80,
    "viagra": 100,
    "pills": 60,
    "escort": 100,
    "webcam": 50,
    "torrent": 60,
    "warez": 100,
    "crack": 40,
}

DEFAULT_THRESHOLD_CENTI = 100


def host_col(url: Column) -> Column:
    """Lowered host part of the URL (scheme://host[:port]/...)."""
    return F.lower(F.try_parse_url(url, F.lit("HOST")))


def host_suffixes_col(host: Column) -> Column:
    """All dot-suffixes of the host with >= 2 labels, host-first:
    ``a.b.c.d -> [a.b.c.d, b.c.d, c.d]``. O(labels) per row."""
    parts = F.split(host, r"\.")
    n = F.size(parts)
    return F.when(n >= 2, F.transform(
        F.sequence(F.lit(0), n - 2),
        lambda i: F.array_join(F.slice(parts, i + 1, n - i), "."),
    )).otherwise(F.array(host))


def soft_word_score_col(
    url: Column, soft_words: Mapping[str, int] | None = None
) -> Column:
    """Sum of weights of soft-word fragments present in the lowered
    URL, in centi-units. A fold over a literal (fragment, weight)
    array — per-row, no shuffle."""
    words = dict(soft_words if soft_words is not None else DEFAULT_SOFT_WORDS)
    low = F.lower(url)
    pairs = F.array(
        *[
            F.struct(F.lit(w).alias("w"), F.lit(int(c)).alias("c"))
            for w, c in sorted(words.items())
        ]
    )
    return F.aggregate(
        pairs,
        F.lit(0).cast("long"),
        lambda acc, p: acc
        + F.when(low.contains(p["w"]), p["c"]).otherwise(F.lit(0)),
    )


def url_filter(
    df: DataFrame,
    blocklist: Sequence[str] | DataFrame = (),
    soft_words: Mapping[str, int] | None = None,
    threshold_centi: int = DEFAULT_THRESHOLD_CENTI,
    url_col: str = "url",
) -> DataFrame:
    """Attach URL-filter columns to ``df``:

    ``host, domain_blocked, word_score_centi, url_blocked``
    (``url_blocked`` = domain hit OR score >= threshold).

    ``blocklist`` may be a Python sequence of lowered domains (small
    lists — shipped as a literal array) or a one-column DataFrame
    ``domain`` (large lists — broadcast left_semi join against the
    exploded host suffixes, the only scale-safe shape for UT1-sized
    inputs).
    """
    out = fan_out(df).withColumn("host", host_col(F.col(url_col)))
    out = out.withColumn(
        "word_score_centi", soft_word_score_col(F.col(url_col), soft_words)
    )

    if isinstance(blocklist, DataFrame):
        hits = (
            out.select("host")
            .distinct()
            .withColumn("_sfx", F.explode(host_suffixes_col(F.col("host"))))
            .join(
                F.broadcast(blocklist.select(F.col("domain").alias("_sfx"))),
                "_sfx",
                "left_semi",
            )
            .select("host")
            .distinct()
            .withColumn("domain_blocked", F.lit(True))
        )
        out = out.join(F.broadcast(hits), "host", "left").withColumn(
            "domain_blocked", F.coalesce(F.col("domain_blocked"), F.lit(False))
        )
    else:
        blocked = F.array(*[F.lit(d.lower()) for d in sorted(set(blocklist))])
        out = out.withColumn(
            "domain_blocked",
            # coalesce: an unparseable URL (NULL host) makes
            # arrays_overlap three-value-NULL, which would poison
            # url_blocked and every downstream funnel gate — match the
            # DataFrame path's False
            F.coalesce(
                F.arrays_overlap(host_suffixes_col(F.col("host")), blocked),
                F.lit(False),
            )
            if blocklist
            else F.lit(False),
        )

    return out.withColumn(
        "url_blocked",
        F.col("domain_blocked")
        | (F.col("word_score_centi") >= F.lit(int(threshold_centi))),
    )
