"""Product-page extraction cascades (SURVEY.md §2.2 P1-P11).

Reproduces the extraction semantics of the reference's EcommerceScraper
(/root/reference/src/webscraper/scrapers/ecommerce.py:104-629) as pure
functions over minisoup DOMs: container discovery → per-item projection
→ coalesce cascades (user selector → conventional selectors → regex
fallback) → transform/validate normalization. Runs unchanged inside
Arrow UDFs and in the sequential parity oracle.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional
from urllib.parse import urlparse

from .. import minisoup
from ..minisoup import Tag

# Default selectors from the reference's generated ecommerce config
# (/root/reference/src/webscraper/utils/config.py:304-312).
DEFAULT_SELECTORS = {
    "product_container": ".product",
    "name": ".product-title",
    "price": ".price",
    "availability": ".availability",
    "images": ".product-image img",
    "rating": ".rating",
    "review_count": ".review-count",
}


@dataclass
class EcommerceConfig:
    selectors: Dict[str, str] = field(default_factory=lambda: dict(DEFAULT_SELECTORS))
    currency_symbol: str = "$"  # ecommerce.py:49
    extract_reviews: bool = True
    extract_images: bool = True


_PRICE_TEXT_RE = re.compile(r"(\$|€|£)?\s*(\d+[.,]\d{2}|\d+)\s*(\$|€|£)?", re.IGNORECASE)
_PRICE_NUM_RE = re.compile(r"(\d+[.,]\d{2}|\d+)")
_CURRENCY_RE = re.compile(r"(\$|€|£|USD|EUR|GBP)")
_PCT_RE = re.compile(r"(\d+)%")
_INT_RE = re.compile(r"(\d+)")
_RATING_FLOAT_RE = re.compile(r"(\d+\.\d+|\d+)")
_RATING_FRACTION_RE = re.compile(r"(\d+)\s*/\s*(\d+)")
_CONTAINER_KEYWORDS = ("product", "item", "card")


def find_product_elements(root: Tag, selectors: Dict[str, str]) -> List[Tag]:
    """Container discovery (P1; ecommerce.py:144-197): configured
    selector, conventional selectors, class-keyword heuristic, then the
    price-and-heading fallback."""
    for selector in (
        selectors.get("product_container"),
        ".product",
        ".product-item",
        ".item",
        "[data-product-id]",
        ".product-card",
        ".product-grid-item",
    ):
        if not selector:
            continue
        elements = root.select(selector)
        if elements:
            return elements

    candidates = root.find_all(
        ["div", "li"],
        class_=lambda x: x
        and any(k in str(x).lower() for k in _CONTAINER_KEYWORDS),
    )
    if candidates:
        return candidates

    possible = []
    for element in root.find_all(["div", "li"]):
        has_price = element.find(text=re.compile(r"(\$|€|£)\s*\d+\.?\d*"))
        has_product = (
            element.find("h2") or element.find("h3") or element.find("a", href=True)
        )
        if has_price and has_product:
            possible.append(element)
    return possible


def parse_price(price_text: Optional[str]) -> Optional[float]:
    """P4/F19 (ecommerce.py:307-327): first numeric group, comma→dot."""
    if not price_text:
        return None
    m = _PRICE_NUM_RE.search(price_text)
    if not m:
        return None
    try:
        return float(m.group(0).replace(",", "."))
    except ValueError:
        return None


def parse_rating(rating_text: Optional[str]) -> Optional[float]:
    """P10 (ecommerce.py:492-528): float / halve >5≤10 / X÷Y×5 / ★ count."""
    if not rating_text:
        return None
    m = _RATING_FLOAT_RE.search(rating_text)
    if m:
        try:
            rating = float(m.group(1))
            if 5 < rating <= 10:
                rating /= 2
            return round(rating, 1)
        except ValueError:
            pass
    m = _RATING_FRACTION_RE.search(rating_text)
    if m:
        try:
            denominator = float(m.group(2))
            if denominator > 0:
                return round(float(m.group(1)) / denominator * 5, 1)
        except ValueError:
            pass
    stars = rating_text.count("★")
    if stars > 0:
        return float(stars)
    return None


def _extract_name(element: Tag, selectors: Dict[str, str]) -> Optional[str]:
    """P3 (ecommerce.py:248-272)."""
    if "name" in selectors:
        node = element.select_one(selectors["name"])
        if node:
            return node.get_text(strip=True)
    for selector in (
        "h1", "h2", "h3",
        ".product-name", ".product-title",
        "[itemprop='name']",
        ".title", ".name",
    ):
        node = element.select_one(selector)
        if node:
            return node.get_text(strip=True)
    link = element.find("a")
    if link and link.get_text(strip=True):
        return link.get_text(strip=True)
    return None


def _extract_price(element: Tag, selectors: Dict[str, str]) -> Optional[float]:
    """P4 (ecommerce.py:274-305)."""
    if "price" in selectors:
        node = element.select_one(selectors["price"])
        if node:
            return parse_price(node.get_text(strip=True))
    for selector in (
        ".price", ".product-price",
        "[itemprop='price']",
        ".price-current", ".price-new",
        ".current-price",
    ):
        node = element.select_one(selector)
        if node:
            return parse_price(node.get_text(strip=True))
    match = element.find(text=_PRICE_TEXT_RE)
    if match:
        return parse_price(match)
    return None


def _extract_currency(element: Tag, selectors: Dict[str, str], default: str) -> str:
    """P5 (ecommerce.py:329-355)."""
    if "currency" in selectors:
        node = element.select_one(selectors["currency"])
        if node:
            m = _CURRENCY_RE.search(node.get_text(strip=True))
            if m:
                return m.group(0)
    price_node = None
    if "price" in selectors:
        price_node = element.select_one(selectors["price"])
    if not price_node:
        price_node = element.select_one(".price, .product-price, [itemprop='price']")
    if price_node:
        m = _CURRENCY_RE.search(price_node.get_text(strip=True))
        if m:
            return m.group(0)
    return default


def _extract_url(element: Tag, selectors: Dict[str, str]) -> Optional[str]:
    """P6 (ecommerce.py:357-370)."""
    if "url" in selectors:
        node = element.select_one(selectors["url"])
        if node and node.has_attr("href"):
            return node["href"]
    link = element.find("a", href=True)
    if link:
        return link["href"]
    return None


_AVAIL_PATTERNS = [
    (re.compile(r"in\s*stock", re.IGNORECASE), "In Stock"),
    (re.compile(r"out\s*of\s*stock", re.IGNORECASE), "Out of Stock"),
    (re.compile(r"available", re.IGNORECASE), "Available"),
    (re.compile(r"unavailable", re.IGNORECASE), "Unavailable"),
]


def _extract_availability(element: Tag, selectors: Dict[str, str]) -> Optional[str]:
    """P7 (ecommerce.py:372-405)."""
    if "availability" in selectors:
        node = element.select_one(selectors["availability"])
        if node:
            return node.get_text(strip=True)
    for selector in (
        "[itemprop='availability']",
        ".availability",
        ".stock-status",
        ".in-stock",
        ".out-of-stock",
    ):
        node = element.select_one(selector)
        if node:
            return node.get_text(strip=True)
    for pattern, status in _AVAIL_PATTERNS:
        if element.find(text=pattern):
            return status
    return "Unknown"


def _extract_images(element: Tag, selectors: Dict[str, str]) -> List[str]:
    """P8 (ecommerce.py:407-435)."""
    images: List[str] = []
    if "images" in selectors:
        for img in element.select(selectors["images"]):
            if img.has_attr("src"):
                images.append(img["src"])
            elif img.has_attr("data-src"):
                images.append(img["data-src"])
    if not images:
        for img in element.select("img"):
            src = None
            for attr in ("src", "data-src", "data-lazy-src", "data-original"):
                if img.has_attr(attr):
                    src = img[attr]
                    break
            if src and not src.startswith("data:"):
                images.append(src)
    return images


def _extract_reviews(element: Tag, selectors: Dict[str, str]) -> Optional[Dict[str, Any]]:
    """P9 (ecommerce.py:437-490)."""
    reviews: Dict[str, Any] = {}
    if "rating" in selectors:
        node = element.select_one(selectors["rating"])
        if node:
            reviews["rating"] = parse_rating(node.get_text(strip=True))
    if "rating" not in reviews:
        for selector in (
            "[itemprop='ratingValue']",
            ".rating",
            ".stars",
            ".star-rating",
        ):
            node = element.select_one(selector)
            if node:
                if node.has_attr("style"):
                    m = _PCT_RE.search(node["style"])
                    if m:
                        reviews["rating"] = round((int(m.group(1)) / 100) * 5, 1)
                else:
                    reviews["rating"] = parse_rating(node.get_text(strip=True))
    if "review_count" in selectors:
        node = element.select_one(selectors["review_count"])
        if node:
            m = _INT_RE.search(node.get_text(strip=True))
            if m:
                reviews["count"] = int(m.group(1))
    if "count" not in reviews:
        for selector in (
            "[itemprop='reviewCount']",
            ".review-count",
            ".ratings-count",
        ):
            node = element.select_one(selector)
            if node:
                m = _INT_RE.search(node.get_text(strip=True))
                if m:
                    reviews["count"] = int(m.group(1))
    return reviews or None


def _extract_field(element: Tag, selector: str) -> Optional[str]:
    """P11 (ecommerce.py:530-547); XPath unsupported, as in reference."""
    if not selector or selector.startswith("/"):
        return None
    node = element.select_one(selector)
    if node:
        return node.get_text(strip=True)
    return None


def extract_product(element: Tag, cfg: EcommerceConfig) -> Dict[str, Any]:
    """P2 item projection (ecommerce.py:199-246)."""
    product: Dict[str, Any] = {"name": _extract_name(element, cfg.selectors)}
    if not product["name"]:
        return {}
    product["price"] = _extract_price(element, cfg.selectors)
    product["currency"] = _extract_currency(element, cfg.selectors, cfg.currency_symbol)
    product["url"] = _extract_url(element, cfg.selectors)
    product["availability"] = _extract_availability(element, cfg.selectors)
    if cfg.extract_images:
        product["images"] = _extract_images(element, cfg.selectors)
    if cfg.extract_reviews:
        product["reviews"] = _extract_reviews(element, cfg.selectors)
    for fld, selector in cfg.selectors.items():
        if fld not in ("product_container",) and fld not in product:
            product[fld] = _extract_field(element, selector)
    return product


def transform_validate(
    products: List[Dict[str, Any]], base_url: str, cfg: EcommerceConfig
) -> List[Dict[str, Any]]:
    """transform_data + validate_data (ecommerce.py:549-629), minus the
    wall-clock ``scraped_at`` stamp — the engine injects the epoch
    timestamp instead (SURVEY.md §2.8 F20 determinism note)."""
    out: List[Dict[str, Any]] = []
    for product in products:
        if not product or not product.get("name"):
            continue
        if isinstance(product.get("price"), str):
            product["price"] = parse_price(product["price"])
        product["name"] = product["name"].strip()
        url = product.get("url")
        if url and not url.startswith(("http://", "https://")) and url.startswith("/"):
            parsed = urlparse(base_url)
            product["url"] = f"{parsed.scheme}://{parsed.netloc}{url}"
        # validate_data defaults (ecommerce.py:614-625)
        product.setdefault("price", None)
        product.setdefault("currency", cfg.currency_symbol)
        product.setdefault("availability", "Unknown")
        product.setdefault("images", [])
        out.append(product)
    return out


def extract_products(
    html, base_url: str, cfg: Optional[EcommerceConfig] = None
) -> List[Dict[str, Any]]:
    """Full page → validated product dicts (extract_data → transform →
    validate; ecommerce.py:104-142 + base.py:191-194)."""
    cfg = cfg or EcommerceConfig()
    root = minisoup.parse(html)
    products = []
    for element in find_product_elements(root, cfg.selectors):
        item = extract_product(element, cfg)
        if item:
            products.append(item)
    return transform_validate(products, base_url, cfg)
