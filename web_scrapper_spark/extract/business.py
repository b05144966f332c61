"""Business-directory extraction cascades (SURVEY.md §2.2 P12-P19).

Reproduces the extraction semantics of the reference's BusinessScraper
(/root/reference/src/webscraper/scrapers/business.py:147-677) as pure
functions over minisoup DOMs.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

from .. import minisoup
from ..minisoup import Tag
from ..validators import is_valid_email, is_valid_phone, is_valid_url

# Defaults from the reference's generated business config
# (/root/reference/src/webscraper/utils/config.py:329-337).
DEFAULT_SELECTORS = {
    "business_container": ".business",
    "name": ".business-name",
    "address": ".address",
    "phone": ".phone",
    "email": ".email",
    "website": ".website",
    "categories": ".category",
}


@dataclass
class BusinessConfig:
    selectors: Dict[str, str] = field(default_factory=lambda: dict(DEFAULT_SELECTORS))
    extract_social_media: bool = True  # business.py:49
    validate_emails: bool = True
    validate_phones: bool = True
    validate_urls: bool = True
    country_code: str = "US"


_EMAIL_RE = re.compile(r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}")
_ADDR_RE = re.compile(
    r"\d+\s+[A-Za-z0-9\s\.,]+,\s+[A-Za-z\s]+,\s+[A-Z]{2}(\s+\d{5})?", re.IGNORECASE
)
_PHONE_RES = [
    re.compile(r"\(\d{3}\)\s*\d{3}[-.]?\d{4}"),
    re.compile(r"\d{3}[-.\s]?\d{3}[-.\s]?\d{4}"),
    re.compile(r"\+\d{1,3}[-.\s]?\d{3}[-.\s]?\d{3}[-.\s]?\d{4}"),
]
_NON_PHONE_RE = re.compile(r"[^\d+]")
_URL_STRIP_RE = re.compile(r"[?#].*$")
# Platform → URL patterns (business.py:499-507)
SOCIAL_PATTERNS = {
    "facebook": [r"facebook\.com", r"fb\.com"],
    "twitter": [r"twitter\.com", r"x\.com"],
    "linkedin": [r"linkedin\.com"],
    "instagram": [r"instagram\.com"],
    "youtube": [r"youtube\.com", r"youtu\.be"],
    "pinterest": [r"pinterest\.com"],
    "yelp": [r"yelp\.com"],
}
_SOCIAL_RES = {
    platform: [re.compile(p, re.IGNORECASE) for p in patterns]
    for platform, patterns in SOCIAL_PATTERNS.items()
}
_CONTAINER_KEYWORDS = ("business", "listing", "result", "vcard", "card")


def find_business_elements(root: Tag, selectors: Dict[str, str]) -> List[Tag]:
    """P12 container discovery (business.py:147-202)."""
    for selector in (
        selectors.get("business_container"),
        ".business",
        ".business-listing",
        ".listing",
        ".vcard",
        ".result",
        "[itemtype*='LocalBusiness']",
        ".business-card",
        ".directory-listing",
    ):
        if not selector:
            continue
        elements = root.select(selector)
        if elements:
            return elements

    candidates = root.find_all(
        ["div", "li"],
        class_=lambda x: x and any(k in str(x).lower() for k in _CONTAINER_KEYWORDS),
    )
    if candidates:
        return candidates

    possible = []
    for element in root.find_all(["div", "li", "article"]):
        has_name = element.find(["h1", "h2", "h3", "h4", "strong", "b"])
        has_contact = (
            element.find(text=re.compile(r"\(\d{3}\)\s*\d{3}-\d{4}"))
            or element.find(text=_EMAIL_RE)
            or element.find("address")
            or element.find(text=re.compile(r"\d+\s+[A-Za-z\s]+,\s+[A-Za-z\s]+,\s+[A-Z]{2}"))
        )
        if has_name and has_contact:
            possible.append(element)
    return possible


def _extract_name(element: Tag, selectors: Dict[str, str]) -> Optional[str]:
    """P14 (business.py:252-283)."""
    if "name" in selectors:
        node = element.select_one(selectors["name"])
        if node:
            return node.get_text(strip=True)
    for selector in (
        "h1", "h2", "h3",
        ".business-name", ".listing-name",
        "[itemprop='name']",
        ".name", ".title",
    ):
        node = element.select_one(selector)
        if node:
            return node.get_text(strip=True)
    link = element.find(
        "a",
        class_=lambda x: x
        and any(k in str(x).lower() for k in ("name", "title", "business")),
    )
    if link and link.get_text(strip=True):
        return link.get_text(strip=True)
    heading = element.find(["h1", "h2", "h3", "h4", "strong", "b"])
    if heading:
        return heading.get_text(strip=True)
    return None


def _extract_address(element: Tag, selectors: Dict[str, str]) -> Optional[str]:
    """P15 (business.py:285-315)."""
    if "address" in selectors:
        node = element.select_one(selectors["address"])
        if node:
            return node.get_text(strip=True)
    for selector in (
        "address",
        "[itemprop='address']",
        ".address",
        ".business-address",
        ".street-address",
    ):
        node = element.select_one(selector)
        if node:
            return node.get_text(strip=True)
    match = element.find(text=_ADDR_RE)
    if match:
        return match.strip()
    return None


def parse_phone(phone_text: Optional[str], cfg: BusinessConfig) -> Optional[str]:
    """business.py:357-372 — digit-strip + optional validity gate."""
    if not phone_text:
        return None
    digits = _NON_PHONE_RE.sub("", phone_text)
    if not digits:
        return None
    if cfg.validate_phones and not is_valid_phone(digits, cfg.country_code):
        return None
    return digits


def _extract_phone(element: Tag, cfg: BusinessConfig) -> Optional[str]:
    """P16 (business.py:317-355)."""
    selectors = cfg.selectors
    if "phone" in selectors:
        node = element.select_one(selectors["phone"])
        if node:
            return parse_phone(node.get_text(strip=True), cfg)
    for selector in (
        "[itemprop='telephone']",
        ".phone",
        ".tel",
        ".business-phone",
        ".phone-number",
    ):
        node = element.select_one(selector)
        if node:
            return parse_phone(node.get_text(strip=True), cfg)
    for rx in _PHONE_RES:
        match = element.find(text=rx)
        if match:
            m = rx.search(match)
            if m:
                return m.group(0)
    return None


def parse_email(email_text: Optional[str], cfg: BusinessConfig) -> Optional[str]:
    """business.py:415-431."""
    if not email_text:
        return None
    m = _EMAIL_RE.search(email_text)
    if not m:
        return None
    email = m.group(0)
    if cfg.validate_emails and not is_valid_email(email):
        return None
    return email


def _email_from_node(node: Tag, cfg: BusinessConfig) -> Optional[str]:
    if node.name == "a" and node.has_attr("href"):
        href = node["href"]
        if href.startswith("mailto:"):
            email = href[7:]
            return email if not cfg.validate_emails or is_valid_email(email) else None
    return parse_email(node.get_text(strip=True), cfg)


def _extract_email(element: Tag, cfg: BusinessConfig) -> Optional[str]:
    """P17 (business.py:374-413)."""
    selectors = cfg.selectors
    if "email" in selectors:
        node = element.select_one(selectors["email"])
        if node:
            return _email_from_node(node, cfg)
    for selector in (
        "[itemprop='email']",
        ".email",
        ".business-email",
        "a[href^='mailto:']",
    ):
        node = element.select_one(selector)
        if node:
            return _email_from_node(node, cfg)
    match = element.find(text=_EMAIL_RE)
    if match:
        m = _EMAIL_RE.search(match)
        if m:
            email = m.group(0)
            return email if not cfg.validate_emails or is_valid_email(email) else None
    return None


def clean_url(url: Optional[str], cfg: BusinessConfig) -> Optional[str]:
    """F15 (business.py:476-492)."""
    if not url:
        return None
    url = _URL_STRIP_RE.sub("", url)
    if not url.startswith(("http://", "https://")):
        url = "http://" + url
    if cfg.validate_urls and not is_valid_url(url):
        return None
    return url


def _extract_website(element: Tag, cfg: BusinessConfig) -> Optional[str]:
    """P18 (business.py:433-474)."""
    selectors = cfg.selectors
    if "website" in selectors:
        node = element.select_one(selectors["website"])
        if node and node.name == "a" and node.has_attr("href"):
            href = node["href"]
            if href.startswith(("mailto:", "tel:")):
                return None
            return clean_url(href, cfg)
    for selector in (
        "[itemprop='url']",
        ".website",
        ".url",
        ".business-website",
        ".web",
    ):
        node = element.select_one(selector)
        if node and node.name == "a" and node.has_attr("href"):
            href = node["href"]
            if href.startswith(("mailto:", "tel:")):
                continue
            return clean_url(href, cfg)
    for link in element.find_all("a", href=True):
        href = link["href"]
        if href.startswith(("mailto:", "tel:", "#", "/")):
            continue
        cleaned = clean_url(href, cfg)
        if cleaned:
            return cleaned
    return None


def extract_social_media(element: Tag) -> Dict[str, str]:
    """P19 (business.py:494-518); first match per link wins."""
    social: Dict[str, str] = {}
    for link in element.find_all("a", href=True):
        href = link["href"]
        for platform, patterns in _SOCIAL_RES.items():
            if any(rx.search(href) for rx in patterns):
                social[platform] = href
                break
    return social


def _extract_categories(element: Tag, selectors: Dict[str, str]) -> List[str]:
    """business.py:520-548 — note: configured selector result does NOT
    short-circuit; conventional selectors are appended after it."""
    categories: List[str] = []
    if "categories" in selectors:
        for cat in element.select(selectors["categories"]):
            text = cat.get_text(strip=True)
            if text:
                categories.append(text)
    for selector in (
        "[itemprop='category']",
        ".category",
        ".categories",
        ".business-category",
        ".tags",
    ):
        for cat in element.select(selector):
            text = cat.get_text(strip=True)
            if text:
                categories.append(text)
    return categories


def _extract_field(element: Tag, selector: str) -> Optional[str]:
    """P11-dup (business.py:550-567)."""
    if not selector or selector.startswith("/"):
        return None
    node = element.select_one(selector)
    if node:
        return node.get_text(strip=True)
    return None


def extract_business(element: Tag, cfg: BusinessConfig) -> Dict[str, Any]:
    """P13 item projection (business.py:204-250)."""
    business: Dict[str, Any] = {"name": _extract_name(element, cfg.selectors)}
    if not business["name"]:
        return {}
    business["address"] = _extract_address(element, cfg.selectors)
    business["phone"] = _extract_phone(element, cfg)
    business["email"] = _extract_email(element, cfg)
    business["website"] = _extract_website(element, cfg)
    if cfg.extract_social_media:
        business["social_media"] = extract_social_media(element)
    business["categories"] = _extract_categories(element, cfg.selectors)
    for fld, selector in cfg.selectors.items():
        if fld not in ("business_container",) and fld not in business:
            business[fld] = _extract_field(element, selector)
    return business


def format_phone(phone: str) -> str:
    """F16 (business.py:594-605)."""
    digits = _NON_PHONE_RE.sub("", phone)
    if len(digits) == 10:
        return f"{digits[:3]}-{digits[3:6]}-{digits[6:]}"
    if len(digits) > 10 and digits.startswith("+"):
        return digits
    if len(digits) == 11 and digits.startswith("1"):
        return f"+{digits[0]}-{digits[1:4]}-{digits[4:7]}-{digits[7:]}"
    return digits


def transform_validate(
    businesses: List[Dict[str, Any]], cfg: BusinessConfig
) -> List[Dict[str, Any]]:
    """transform_data + validate_data (business.py:569-677), without the
    wall-clock stamp (engine injects epoch ts)."""
    out: List[Dict[str, Any]] = []
    for business in businesses:
        if not business or not business.get("name"):
            continue
        business["name"] = business["name"].strip()
        if business.get("phone"):
            business["phone"] = format_phone(business["phone"])
        if business.get("website") and not business["website"].startswith(
            ("http://", "https://")
        ):
            business["website"] = "http://" + business["website"]
        if business.get("email"):
            business["email"] = business["email"].lower().strip()
        # validate_data (business.py:623-677)
        if business.get("email") and cfg.validate_emails and not is_valid_email(business["email"]):
            business["email"] = None
        if business.get("phone") and cfg.validate_phones and not is_valid_phone(
            business["phone"], cfg.country_code
        ):
            business["phone"] = None
        if business.get("website") and cfg.validate_urls and not is_valid_url(
            business["website"]
        ):
            business["website"] = None
        business.setdefault("address", None)
        business.setdefault("phone", None)
        business.setdefault("email", None)
        business.setdefault("website", None)
        business.setdefault("categories", [])
        out.append(business)
    return out


def extract_businesses(
    html, base_url: str, cfg: Optional[BusinessConfig] = None
) -> List[Dict[str, Any]]:
    """Full page → validated business dicts (business.py:107-145 +
    base.py:191-194)."""
    cfg = cfg or BusinessConfig()
    root = minisoup.parse(html)
    businesses = []
    for element in find_business_elements(root, cfg.selectors):
        item = extract_business(element, cfg)
        if item:
            businesses.append(item)
    return transform_validate(businesses, cfg)
