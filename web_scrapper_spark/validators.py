"""Validation predicates.

Ports the semantics of the reference's validators module
(/root/reference/src/webscraper/utils/validators.py:16-376). Each
function is pure and deterministic; the Spark-native expressions for the
SQL-expressible ones live in ``operators.textops`` / ``__spark_entry__``
(SURVEY.md §2.8 F7-F13).
"""

from __future__ import annotations

import json
import re
from typing import Optional, Union
from urllib.parse import urlparse

_EMAIL_RE = re.compile(r"^[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}$")
_EMAIL_BLACKLIST = [
    re.compile(r"@example\.com$", re.IGNORECASE),
    re.compile(r"@test\.com$", re.IGNORECASE),
    re.compile(r"@sample\.com$", re.IGNORECASE),
    re.compile(r"@invalid\.com$", re.IGNORECASE),
]


def is_valid_email(email: str) -> bool:
    """validators.py:16-48 — regex + blacklisted demo domains."""
    if not email or not isinstance(email, str):
        return False
    if not _EMAIL_RE.match(email):
        return False
    return not any(rx.search(email) for rx in _EMAIL_BLACKLIST)


_NON_PHONE_RE = re.compile(r"[^\d+]")
_FAKE_PHONE_RES = [
    re.compile(r"^0{7,}$"),
    re.compile(r"^1{7,}$"),
    re.compile(r"^(.)\1{6,}$"),
    re.compile(r"^12345\d*$"),
]
_COUNTRY_CODES = {
    "US": ["+1", "1"],
    "UK": ["+44", "44"],
    "CA": ["+1", "1"],
    "AU": ["+61", "61"],
    "IN": ["+91", "91"],
    "DE": ["+49", "49"],
    "FR": ["+33", "33"],
    "JP": ["+81", "81"],
    "BR": ["+55", "55"],
    "RU": ["+7", "7"],
}


def is_valid_phone(
    phone: str,
    country_code: Optional[str] = None,
    min_length: int = 7,
    max_length: int = 15,
) -> bool:
    """validators.py:51-126 — digit-strip, length, intl, fake patterns."""
    if not phone or not isinstance(phone, str):
        return False
    digits = _NON_PHONE_RE.sub("", phone)
    if len(digits) < min_length or len(digits) > max_length:
        return False
    if digits.startswith("+") and len(digits) < 8:
        return False
    if country_code and country_code in _COUNTRY_CODES:
        valid = _COUNTRY_CODES[country_code]
        if digits.startswith("+"):
            if not any(digits.startswith(c) for c in valid if c.startswith("+")):
                return False
        else:
            if not any(digits.startswith(c) for c in valid if not c.startswith("+")):
                if len(digits) < min_length:
                    return False
    return not any(rx.match(digits) for rx in _FAKE_PHONE_RES)


_DOMAIN_RE = re.compile(
    r"^[a-zA-Z0-9]([a-zA-Z0-9\-]{0,61}[a-zA-Z0-9])?"
    r"(\.[a-zA-Z0-9]([a-zA-Z0-9\-]{0,61}[a-zA-Z0-9])?)*$"
)
_IPV4_SHAPE_RE = re.compile(r"^\d+\.\d+\.\d+\.\d+$")


def is_valid_url(url: str) -> bool:
    """validators.py:129-172 — scheme/domain shape, no localhost/IPs."""
    if not url or not isinstance(url, str):
        return False
    try:
        parsed = urlparse(url)
        if not parsed.scheme or not parsed.netloc:
            return False
        if parsed.scheme not in ("http", "https", "ftp"):
            return False
        domain = parsed.netloc
        if not _DOMAIN_RE.match(domain):
            return False
        if domain == "localhost" or _IPV4_SHAPE_RE.match(domain):
            return False
        return len(domain.split(".")[-1]) >= 2
    except Exception:
        return False


DATE_FORMATS = [
    "%Y-%m-%d",
    "%Y/%m/%d",
    "%m/%d/%Y",
    "%d/%m/%Y",
    "%m-%d-%Y",
    "%d-%m-%Y",
    "%b %d, %Y",
    "%d %b %Y",
    "%B %d, %Y",
    "%d %B %Y",
]


def is_valid_date(date_str: str, formats: Optional[list] = None) -> bool:
    """validators.py:175-212 — strptime over 10 formats."""
    if not date_str or not isinstance(date_str, str):
        return False
    from datetime import datetime

    for fmt in formats or DATE_FORMATS:
        try:
            datetime.strptime(date_str, fmt)
            return True
        except ValueError:
            continue
    return False


_IPV4_RE = re.compile(r"^(\d{1,3})\.(\d{1,3})\.(\d{1,3})\.(\d{1,3})$")
_IPV6_RE = re.compile(r"^([0-9a-fA-F]{1,4}:){7}[0-9a-fA-F]{1,4}$")


def is_valid_ip(ip: str) -> bool:
    """validators.py:215-244 — IPv4 octets + simple IPv6."""
    if not ip or not isinstance(ip, str):
        return False
    match = _IPV4_RE.match(ip)
    if match:
        return all(int(octet) <= 255 for octet in match.groups())
    return bool(_IPV6_RE.match(ip))


def is_valid_credit_card(card_number: str) -> bool:
    """validators.py:247-279 — Luhn checksum."""
    if not card_number or not isinstance(card_number, str):
        return False
    digits = re.sub(r"[^\d]", "", card_number)
    if len(digits) < 13 or len(digits) > 19:
        return False
    total = 0
    for i, digit in enumerate(digits[::-1]):
        n = int(digit)
        if i % 2 == 1:
            n *= 2
            if n > 9:
                n -= 9
        total += n
    return total % 10 == 0


def is_valid_text(
    text: str,
    min_length: int = 1,
    max_length: Optional[int] = None,
    pattern: Optional[str] = None,
) -> bool:
    """validators.py:282-314."""
    if not isinstance(text, str):
        return False
    if len(text) < min_length:
        return False
    if max_length is not None and len(text) > max_length:
        return False
    if pattern and not re.match(pattern, text):
        return False
    return True


def is_valid_json(json_str: str) -> bool:
    """validators.py:317-336."""
    if not json_str or not isinstance(json_str, str):
        return False
    try:
        json.loads(json_str)
        return True
    except ValueError:
        return False


def is_valid_numeric(
    value: Union[str, int, float],
    min_value: Optional[Union[int, float]] = None,
    max_value: Optional[Union[int, float]] = None,
) -> bool:
    """validators.py:339-376."""
    if isinstance(value, str):
        try:
            value = float(value) if "." in value else int(value)
        except ValueError:
            return False
    if not isinstance(value, (int, float)) or isinstance(value, bool):
        return False
    if min_value is not None and value < min_value:
        return False
    if max_value is not None and value > max_value:
        return False
    return True
