"""URL canonicalization + hashing (SURVEY.md §2.8 F14/F15/F21).

The reference compares raw URL strings for seen-set membership
(/root/reference/src/webscraper/scrapers/base.py:195,199) and cleans
URLs by stripping tracking params and defaulting the scheme
(/root/reference/src/webscraper/scrapers/business.py:476-492). The
engine adds proper canonicalization and a murmur3 URL hash compatible
with Spark's built-in ``hash()`` expression (Murmur3_x86_32, seed 42)
so the driver-side sequential oracle and the executors agree bit-for-bit
on ``url_hash`` without ever shipping Python hashes through Spark.
"""

from __future__ import annotations

import re
from urllib.parse import urljoin, urlparse

_M = 0xFFFFFFFF
_C1 = 0xCC9E2D51
_C2 = 0x1B873593


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M


def _mix_k1(k1: int) -> int:
    k1 = (k1 * _C1) & _M
    k1 = _rotl32(k1, 15)
    return (k1 * _C2) & _M


def _mix_h1(h1: int, k1: int) -> int:
    h1 ^= k1
    h1 = _rotl32(h1, 13)
    return (h1 * 5 + 0xE6546B64) & _M


def _fmix(h1: int, length: int) -> int:
    h1 ^= length
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & _M
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & _M
    h1 ^= h1 >> 16
    return h1


def murmur3_32(data: bytes, seed: int = 42) -> int:
    """Murmur3_x86_32 over bytes, matching Spark's ``hash()`` for strings.

    Spark hashes string columns as UTF-8 bytes: 4-byte little-endian
    blocks through the standard mix, then each remaining tail byte is
    sign-extended and mixed as a full word (this tail handling is the
    Spark-specific variant). Returns a signed int32 like Spark.
    """
    h1 = seed & _M
    n_aligned = len(data) - len(data) % 4
    for i in range(0, n_aligned, 4):
        block = int.from_bytes(data[i : i + 4], "little")
        h1 = _mix_h1(h1, _mix_k1(block))
    for i in range(n_aligned, len(data)):
        byte = data[i]
        if byte > 127:  # sign-extend: Java bytes are signed
            byte -= 256
        h1 = _mix_h1(h1, _mix_k1(byte & _M))
    out = _fmix(h1, len(data))
    return out - (1 << 32) if out >= (1 << 31) else out


def url_hash(url: str) -> int:
    """Murmur3 of the canonical URL — equals Spark ``F.hash(url)``."""
    return murmur3_32(url.encode("utf-8"))


_TRACKING_STRIP_RE = re.compile(r"[?#].*$")
_DEFAULT_PORTS = {"http": ":80", "https": ":443", "ftp": ":21"}


def clean_url(url: str) -> str:
    """Reference-exact cleanup: strip ``[?#].*`` + default scheme
    (business.py:476-492, sans validity gate)."""
    if not url:
        return url
    url = _TRACKING_STRIP_RE.sub("", url)
    if not url.startswith(("http://", "https://")):
        url = "http://" + url
    return url


def canonicalize_url(url: str) -> str:
    """Engine-level canonical form (F21): lowercase scheme+host, strip
    default port and fragment, keep path+query (pagination uses
    ``page=`` queries — content.py:434-441 — so the query survives),
    normalize empty path to ``/``.
    """
    if not url:
        return url
    url = url.strip()
    parsed = urlparse(url)
    scheme = (parsed.scheme or "http").lower()
    netloc = parsed.netloc.lower()
    default = _DEFAULT_PORTS.get(scheme)
    if default and netloc.endswith(default):
        netloc = netloc[: -len(default)]
    path = parsed.path or "/"
    out = f"{scheme}://{netloc}{path}"
    if parsed.query:
        out += f"?{parsed.query}"
    return out


def host_of(url: str) -> str:
    """Lowercased netloc without port — the politeness/partition key."""
    netloc = urlparse(url).netloc.lower()
    return netloc.rsplit(":", 1)[0] if ":" in netloc else netloc


def absolutize(base_url: str, url: str) -> str:
    """urljoin unless already absolute (content.py:607-631 semantics)."""
    if url.startswith(("http://", "https://")):
        return url
    return urljoin(base_url, url)


_SCHEME_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.\-]*://")
_WWW_RE = re.compile(r"^www\d*\.")


def surt(url: str) -> str:
    """SURT — Sort-friendly URI Reordering Transform, the key the
    web-archive ecosystem sorts its indexes by (CDX servers, Wayback,
    the Common Crawl columnar index): host labels reversed so one
    domain's captures (and all its subdomains) are one contiguous key
    range. ``https://www.Example.com:443/A/b?x=1#f`` →
    ``com,example)/A/b?x=1``.

    Deterministic subset implemented (and replayed relationally by the
    ``cc_index_surt`` oracle): scheme dropped, host lowercased,
    userinfo dropped, default ports (80/443) stripped — other ports
    kept before the ``)``, leading ``www\\d*.`` stripped, fragment cut,
    empty path → ``/``, path+query verbatim (case preserved). Python
    twin of :func:`web_scrapper_spark.sources.warc.surt_key_col`.
    """
    s = _SCHEME_RE.sub("", (url or "").strip())
    s = s.split("#", 1)[0]
    m = re.match(r"^([^/?]*)(.*)$", s, re.S)
    auth, rest = m.group(1), m.group(2)
    auth = auth.lower()
    if "@" in auth:
        auth = auth.rsplit("@", 1)[1]
    host, port = auth, ""
    pm = re.match(r"^(.*?)(:\d+)$", auth)
    if pm:
        host, port = pm.group(1), pm.group(2)
        if port in (":80", ":443"):
            port = ""
    host = _WWW_RE.sub("", host)
    hostrev = ",".join(reversed(host.split("."))) if host else ""
    if not rest:
        rest = "/"
    elif rest.startswith("?"):
        rest = "/" + rest
    return f"{hostrev}{port}){rest}"
