"""Text processing functions.

Re-implements the semantics of the reference's text module
(/root/reference/src/webscraper/utils/text.py:15-379) in pure stdlib
Python so the identical code path runs inside Arrow-batched pandas UDFs
on executors and in the sequential parity oracle on the driver.

Determinism notes vs the reference:
- ``extract_entities`` pins the regex fallback path (the reference only
  uses NLTK when importable; utils/text.py:257-334) so results are
  reproducible on any executor.
- Sort in ``extract_keywords`` matches the reference exactly: Python's
  stable ``sorted(..., key=freq, reverse=True)`` preserves first-seen
  order among equal frequencies (utils/text.py:198-201).
"""

from __future__ import annotations

import json
import re
from collections import Counter
from typing import Dict, List

_WS_RE = re.compile(r"\s+")
_CTRL_RE = re.compile(r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]")
# clean_text fast path: if none of these occur, the full pipeline is a
# no-op beyond strip() — run-of-whitespace (incl. any non-space \s),
# nbsp, curly quotes, control chars. Verified equivalent by a
# hypothesis property test (test_properties.py).
_NEEDS_CLEAN_RE = re.compile(r"[^\S ]|  |\xa0|[“”‘’\x00-\x08\x0B\x0C\x0E-\x1F\x7F]")
_WORD_RE = re.compile(r"\b\w+\b")
_TAG_RE = re.compile(r"<[^>]+>")
_ENT_NAME_RE = re.compile(r"&[a-zA-Z]+;")
_ENT_NUM_RE = re.compile(r"&#\d+;")
_SENT_SPLIT_RE = re.compile(r"(?<=[.!?])\s+")

# Stop-word set lifted verbatim from the reference
# (utils/text.py:167-184); duplicates in the original literal collapse
# in a set, so membership semantics are identical.
STOP_WORDS = frozenset(
    """a an the and or but if because as what which this that these those
    then just so than such both through about for is of while during to
    from in on by at with against between into before after above below
    up down out off over under again further once here there when where
    why how all any each few more most other some no nor not only own
    same too very s t can will don should now i me my myself we our ours
    ourselves you your yours yourself yourselves he him his himself she
    her hers herself it its itself they them their theirs themselves am
    are was were be been being have has had having do does did doing
    would could ought m re ve ll d""".split()
)


def clean_text(text: str) -> str:
    """Whitespace-collapse + quote/control-char normalize.

    Byte-exact port of utils/text.py:15-44 — this is the byte-identity
    invariant path for extracted article text (BASELINE.json input_hint).
    """
    if not text:
        return ""
    if _NEEDS_CLEAN_RE.search(text) is None:
        return text.strip()
    cleaned = _WS_RE.sub(" ", text)
    cleaned = cleaned.strip()
    cleaned = cleaned.replace("\xa0", " ")
    # Smart-quote normalization. The reference source contains the
    # curly-quote replace pairs (utils/text.py:38-39); the net effect is
    # mapping Unicode curly quotes to ASCII quotes.
    cleaned = cleaned.replace("“", '"').replace("”", '"')
    cleaned = cleaned.replace("‘", "'").replace("’", "'")
    cleaned = _CTRL_RE.sub("", cleaned)
    return cleaned


def clean_html(html_text: str) -> str:
    """Strip tags/entities then :func:`clean_text` (utils/text.py:47-78).

    Uses our minisoup DOM (same get_text semantics the engine uses in
    extraction UDFs) with the reference's regex fallback on parse errors.
    """
    if not html_text:
        return ""
    try:
        from . import minisoup

        return clean_text(minisoup.parse(html_text).get_text())
    except Exception:
        text = _TAG_RE.sub("", html_text)
        text = _ENT_NAME_RE.sub(" ", text)
        text = _ENT_NUM_RE.sub(" ", text)
        return clean_text(text)


def _truncate_on_word(cleaned_text: str, max_length: int) -> str:
    summary = cleaned_text[:max_length].rstrip()
    if (
        len(summary) < len(cleaned_text)
        and summary
        and summary[-1] != " "
        and cleaned_text[len(summary)] != " "
    ):
        last_space = summary.rfind(" ")
        if last_space > 0:
            summary = summary[:last_space]
    return summary + "..."


def summarize_text(text: str, max_length: int = 150, prefer_sentences: bool = True) -> str:
    """Greedy sentence-fill summary (utils/text.py:81-143)."""
    if not text:
        return ""
    cleaned_text = clean_text(text)
    if len(cleaned_text) <= max_length:
        return cleaned_text
    if prefer_sentences:
        sentences = _SENT_SPLIT_RE.split(cleaned_text)
        summary = ""
        for sentence in sentences:
            if len(summary) + len(sentence) + 1 <= max_length:
                summary += sentence + " "
            else:
                break
        summary = summary.strip()
        if not summary:
            return _truncate_on_word(cleaned_text, max_length)
        return summary
    return _truncate_on_word(cleaned_text, max_length)


def extract_keywords(text: str, max_keywords: int = 5) -> List[str]:
    """Top-K frequent non-stop-words (utils/text.py:146-203)."""
    if not text:
        return []
    cleaned_text = clean_text(text.lower())
    words = _WORD_RE.findall(cleaned_text)
    # Counter + most_common == the reference's dict-count + stable sort
    # by freq desc: both preserve first-encounter order among ties
    # (dict insertion order, stable sort).
    freq = Counter(
        w for w in words if w not in STOP_WORDS and len(w) > 2
    )
    return [w for w, _ in freq.most_common(max_keywords)]


_EMAIL_ENT_RE = re.compile(r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}")
_URL_ENT_RE = re.compile(r"https?://[^\s]+")
_PHONE_ENT_RE = re.compile(
    r"\b(?:\+\d{1,3}[-.\s]?)?(?:\(?\d{3}\)?[-.\s]?)?\d{3}[-.\s]?\d{4}\b"
)
_DATE_ENT_RES = [
    re.compile(r"\b\d{1,2}/\d{1,2}/\d{2,4}\b", re.IGNORECASE),
    re.compile(r"\b\d{4}-\d{1,2}-\d{1,2}\b", re.IGNORECASE),
    re.compile(
        r"\b(?:Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)[a-z]* \d{1,2},? \d{4}\b",
        re.IGNORECASE,
    ),
]
_PEOPLE_RES = [
    re.compile(p)
    for p in (
        r"Mr\.\s+[A-Z][a-z]+(?: [A-Z][a-z]+)*",
        r"Ms\.\s+[A-Z][a-z]+(?: [A-Z][a-z]+)*",
        r"Mrs\.\s+[A-Z][a-z]+(?: [A-Z][a-z]+)*",
        r"Dr\.\s+[A-Z][a-z]+(?: [A-Z][a-z]+)*",
        r"Prof\.\s+[A-Z][a-z]+(?: [A-Z][a-z]+)*",
    )
]
_ORG_RE = re.compile(
    r"(?:[A-Z][a-z]*\s+)+(?:Inc|Corp|Corporation|LLC|Company|Ltd|Limited|"
    r"Association|Foundation|Institute)"
)
_LOCATION_RES = [
    re.compile(p)
    for p in (
        r"in [A-Z][a-z]+(?:,\s+[A-Z][a-z]+)*",
        r"at [A-Z][a-z]+(?:,\s+[A-Z][a-z]+)*",
        r"from [A-Z][a-z]+(?:,\s+[A-Z][a-z]+)*",
        r"to [A-Z][a-z]+(?:,\s+[A-Z][a-z]+)*",
    )
]


def _ordered_dedup(items: List[str]) -> List[str]:
    seen = set()
    return [x for x in items if not (x in seen or seen.add(x))]


def extract_entities(text: str) -> Dict[str, List[str]]:
    """Regex entity extraction (utils/text.py:206-341, regex path pinned)."""
    if not text:
        return {}
    entities: Dict[str, List[str]] = {
        "people": [],
        "organizations": [],
        "locations": [],
        "dates": [],
        "emails": [],
        "urls": [],
        "phone_numbers": [],
    }
    entities["emails"] = _EMAIL_ENT_RE.findall(text)
    entities["urls"] = _URL_ENT_RE.findall(text)
    entities["phone_numbers"] = _PHONE_ENT_RE.findall(text)
    dates: List[str] = []
    for rx in _DATE_ENT_RES:
        dates.extend(rx.findall(text))
    entities["dates"] = dates
    for rx in _PEOPLE_RES:
        entities["people"].extend(rx.findall(text))
    entities["organizations"].extend(_ORG_RE.findall(text))
    for rx in _LOCATION_RES:
        for match in rx.findall(text):
            parts = match.split(" ", 1)
            if len(parts) > 1:
                entities["locations"].append(parts[1])
    for key in entities:
        entities[key] = _ordered_dedup(entities[key])
    return entities


def word_count(text: str) -> int:
    """Token count after clean_text (utils/text.py:344-363)."""
    if not text:
        return 0
    return len(_WORD_RE.findall(clean_text(text)))


def estimate_reading_time(text: str, words_per_minute: int = 200) -> int:
    """max(1, round(words/wpm)) (utils/text.py:366-379)."""
    return max(1, round(word_count(text) / words_per_minute))


def is_valid_json(json_str: str) -> bool:
    if not json_str or not isinstance(json_str, str):
        return False
    try:
        json.loads(json_str)
        return True
    except ValueError:
        return False
