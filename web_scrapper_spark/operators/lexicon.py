"""Lexicon gates: blocklist word-fraction scoring (Dolma/C4-style).

Web-scale corpora filter documents by the FRACTION of tokens drawn
from a curated lexicon — C4's "bad words" drop, Dolma's toxicity
taggers, RefinedWeb's URL blocklist scoring. The operator is not the
lexicon (tiny, curated, caller-supplied) but the scan: count lexicon
occurrences per document over 100 TB without moving anything.

Scale shape: the lexicon folds into the plan as ONE literal array
(broadcast-by-constant — no join, no shuffle); tokenization and the
occurrence count are per-row higher-order functions in whole-stage
codegen. Output is doc-grain; zero exchanges introduced.

Both surfaces are ANSI-SQL replayable (the oracles do):

- :func:`lexicon_stats` — per-doc token count, lexicon-hit count
  (occurrences, not distinct), hit fraction ppm, over/under flag.
- :func:`domain_blocklist_flags` — the URL-grain variant: flag a
  page when its registered host or any parent domain is listed
  (RefinedWeb §3.1 blocklist semantics: ``ads.evil.com`` matches a
  listed ``evil.com``).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["lexicon_stats", "domain_blocklist_flags"]

PPM = 1_000_000

#: word tokens: letter/digit runs, lowercased — the same RE2-safe shape
#: token_count_bpe uses, minus punctuation (lexicons list words)
_WORD_RE = "[a-z0-9]+"


def lexicon_stats(
    docs: DataFrame,
    lexicon: Sequence[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_frac_ppm: int = 10_000,
) -> DataFrame:
    """Per-document lexicon occurrence stats.

    ``lexicon``: the word list (lowercased single tokens; multi-word
    phrases are matched as their first token's run — normalize the
    list upstream). ``max_frac_ppm``: flag threshold — docs at or
    above it get ``flagged = true`` (C4 drops at ANY hit:
    ``max_frac_ppm=1``).

    Output: (id, n_tokens, n_hits, hit_frac_ppm, flagged). Counting is
    per-OCCURRENCE: a slur repeated 40 times scores 40, the signal a
    distinct-membership test would flatten.
    """
    lex = sorted({w.lower() for w in lexicon})
    if not lex:
        raise ValueError("lexicon must be non-empty")
    lex_arr = F.array(*[F.lit(w) for w in lex])
    toks = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit(_WORD_RE), 0
    )
    n_tokens = F.size(toks).cast("long")
    n_hits = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: acc
        + F.when(F.array_contains(lex_arr, t), 1).otherwise(0),
    )
    frac = F.when(n_tokens > 0, F.floor(n_hits * PPM / n_tokens)).otherwise(
        F.lit(0)
    ).cast("long")
    return docs.select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        n_hits.alias("n_hits"),
        frac.alias("hit_frac_ppm"),
        (frac >= int(max_frac_ppm)).alias("flagged"),
    )


def domain_blocklist_flags(
    pages: DataFrame,
    blocked_domains: Sequence[str],
    *,
    url_col: str = "url",
) -> DataFrame:
    """URL-grain blocklist flag with parent-domain semantics: a page is
    blocked when its host equals a listed domain OR ends with
    ``"." + domain`` (so listing ``evil.com`` blocks ``ads.evil.com``
    but not ``notevil.com``). The list folds into the plan as literal
    predicates — no join, no shuffle; output adds
    (host, blocked, blocked_by)."""
    doms = sorted({d.lower().lstrip(".") for d in blocked_domains if d})
    host = F.lower(F.try_parse_url(F.col(url_col), F.lit("HOST")))
    blocked_by = F.lit(None).cast("string")
    # fold right-to-left so the FIRST (sorted) match wins
    for d in reversed(doms):
        hit = (host == d) | host.endswith("." + d)
        blocked_by = F.when(hit, F.lit(d)).otherwise(blocked_by)
    return pages.withColumn("host", host).withColumn(
        "blocked_by", blocked_by
    ).withColumn("blocked", F.col("blocked_by").isNotNull())
