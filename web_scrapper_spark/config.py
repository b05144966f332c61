"""Engine configuration (SURVEY.md §2.2 P36, §3 step 1).

Loads the reference's YAML/JSON config documents
(/root/reference/src/webscraper/utils/config.py:41-217 semantics:
nested dict, dot-path get/set, fail-fast validation) and binds them to
the Spark engine's config objects — the analog of the reference's
``get_scraper(type, cfg)`` factory (scrapers/__init__.py:13-49).

A reference user's YAML runs unchanged: ``type``/``urls``/``selectors``
map onto seeds + extraction configs; ``delay`` becomes the politeness
crawl_delay the engine actually enforces (the reference declares it but
never sleeps — SURVEY.md §2.9 T8); ``retries`` caps fetch attempts;
``output`` maps onto sources.write_any.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

from .extract.business import BusinessConfig
from .extract.content import ContentConfig
from .extract.ecommerce import EcommerceConfig


class ConfigError(ValueError):
    pass


VALID_TYPES = ["ecommerce", "business", "content"]
VALID_FORMATS = [
    "csv", "json", "excel", "db", "database", "xlsx", "sqlite",
    "postgresql", "postgres", "mysql", "parquet",
]


def load_config(path: str) -> Dict[str, Any]:
    """YAML or JSON by extension (utils/config.py:41-89)."""
    if not os.path.exists(path):
        raise ConfigError(f"Configuration file not found: {path}")
    ext = os.path.splitext(path)[1].lower()
    with open(path) as fh:
        if ext in (".yaml", ".yml"):
            import yaml

            config = yaml.safe_load(fh)
        elif ext == ".json":
            config = json.load(fh)
        else:
            raise ConfigError(f"Unsupported configuration format: {ext}")
    validate_config(config)
    return config


def validate_config(config: Dict[str, Any]) -> None:
    """Fail-fast checks (utils/config.py:91-157)."""
    if not config:
        raise ConfigError("Configuration is empty")
    if "scraper" not in config:
        raise ConfigError("Missing required configuration section: scraper")
    scraper = config["scraper"]
    for fld in ("type", "urls"):
        if fld not in scraper:
            raise ConfigError(f"Missing required field in scraper configuration: {fld}")
    if scraper["type"] not in VALID_TYPES:
        raise ConfigError(
            f"Invalid scraper type: {scraper['type']}. Valid types: {VALID_TYPES}"
        )
    urls = scraper["urls"]
    if not isinstance(urls, list) or not urls:
        raise ConfigError("URLs must be a non-empty list")
    if "output" in scraper:
        output = scraper["output"]
        if "format" not in output:
            raise ConfigError("Missing required field in output configuration: format")
        if output["format"] not in VALID_FORMATS:
            raise ConfigError(
                f"Invalid output format: {output['format']}. "
                f"Valid formats: {VALID_FORMATS}"
            )
        if "path" not in output and output["format"] not in (
            "database", "db", "sqlite", "postgresql", "postgres", "mysql"
        ):
            raise ConfigError("Missing required field in output configuration: path")


def get_value(config: Dict[str, Any], key_path: str, default: Any = None) -> Any:
    """Dot-path get (utils/config.py:168-192)."""
    node = config
    for key in key_path.split("."):
        if not isinstance(node, dict) or key not in node:
            return default
        node = node[key]
    return node


def set_value(config: Dict[str, Any], key_path: str, value: Any) -> None:
    """Dot-path set, creating intermediate dicts (utils/config.py:194-217)."""
    keys = key_path.split(".")
    node = config
    for key in keys[:-1]:
        node = node.setdefault(key, {})
        if not isinstance(node, dict):
            raise ConfigError(f"Cannot set {key_path}: {key} is not a mapping")
    node[keys[-1]] = value


@dataclass
class BoundJob:
    """A reference config bound to engine objects — the analog of the
    configured-scraper 'physical plan' of SURVEY.md §3 step 2."""

    stype: str
    seeds: List[Tuple[str, str]]
    crawl_delay: float
    max_attempts: int
    max_depth: int
    content: ContentConfig = field(default_factory=lambda: ContentConfig(selectors={}))
    ecommerce: EcommerceConfig = field(default_factory=EcommerceConfig)
    business: BusinessConfig = field(default_factory=BusinessConfig)
    output_format: Optional[str] = None
    output_path: Optional[str] = None
    #: JDBC target table for ``output.format: db`` (yaml key
    #: ``scraper.output.table``)
    output_table: Optional[str] = None
    fetch_policy: Optional[object] = None  # crawl.fetchpolicy.FetchPolicy
    #: seen-set pre-filter flavor: "bloom" (default) or "cuckoo"
    #: (deletable — frontier/cuckoo.py); yaml key ``scraper.seen_filter``
    seen_filter: str = "bloom"
    #: per-epoch registered-domain (eTLD+1) fetch cap — subdomain-flood
    #: defense (frontier/pld.py); yaml key ``scraper.pld_budget``
    pld_budget: Optional[int] = None
    #: Heritrix-style byte-identical body dedup: later copies skip
    #: extraction, land in seen as "dup"; yaml key
    #: ``scraper.content_seen``
    content_seen: bool = False
    #: REP robots meta directives (noindex drops extraction rows,
    #: nofollow drops outlinks); yaml key ``scraper.respect_meta_robots``
    respect_meta_robots: bool = False
    #: Heritrix maxOutlinks position cap; yaml key ``scraper.max_outlinks``
    max_outlinks: Optional[int] = None
    #: incremental search-index maintenance: each epoch appends an
    #: ungated postings shard over its new full-article pages, served
    #: mid-crawl by ``analyze search --from-store``; yaml key
    #: ``scraper.index_articles``
    index_articles: bool = False
    #: focused crawling: anchor-text relevance terms; discovered links
    #: matching these dequeue first; yaml key ``scraper.focus_terms``
    focus_terms: Optional[List[str]] = None
    #: positional incremental index (requires index_articles): the
    #: epoch shard carries per-occurrence token offsets, enabling
    #: ``analyze search --phrase --from-store``; yaml key
    #: ``scraper.index_positions``
    index_positions: bool = False
    #: persist the ranked BM25 term-weight table at every indexing
    #: epoch (interactive ``--like`` query formation becomes a pure
    #: read); yaml key ``scraper.index_term_weights``
    index_term_weights: bool = False
    #: freshness-driven revisit scheduling (CrawlEngine.enqueue_revisits);
    #: yaml key ``scraper.revisit`` — a mapping with optional keys
    #: epoch_hours (int, default 24), default_hours (int, default 168),
    #: hints ('none' | 'from-sitemaps', default 'none'), modified_since
    #: (ISO date). None = one-shot crawl (reference parity).
    revisit: Optional[Dict[str, Any]] = None

    def crawl_config(self, epoch_seconds: float = 8.0):
        from .crawl.epoch import CrawlConfig

        return CrawlConfig(
            epoch_seconds=epoch_seconds,
            default_delay=self.crawl_delay,
            max_attempts=self.max_attempts,
            max_depth=self.max_depth,
            content=self.content,
            ecommerce=self.ecommerce,
            business=self.business,
            fetch_policy=self.fetch_policy,
            seen_filter=self.seen_filter,
            pld_budget=self.pld_budget,
            content_seen_filter=self.content_seen,
            respect_meta_robots=self.respect_meta_robots,
            max_outlinks_per_page=self.max_outlinks,
            index_articles=self.index_articles,
            focus_terms=self.focus_terms,
            index_positions=self.index_positions,
            index_term_weights=self.index_term_weights,
        )


def _bind_fetch_policy(scraper: Dict[str, Any]):
    """S2/S3 session keys (reference base.py:40-75): user_agent /
    user_agents + rotation, proxy / proxies, headers, cookies. Returns
    None when none are set — the engine then skips metadata columns."""
    keys = ("user_agent", "user_agents", "ua_rotation", "proxy", "proxies",
            "headers", "cookies")
    if not any(k in scraper for k in keys):
        return None
    from .crawl.fetchpolicy import DEFAULT_USER_AGENTS, FetchPolicy

    uas = scraper.get("user_agents")
    # a scalar string here would explode into single characters under
    # list() below — one-char User-Agents with no error; coerce to a
    # one-element list like the single-value keys
    if isinstance(uas, str):
        uas = [uas]
    if not uas:
        single = scraper.get("user_agent")
        uas = [single] if single else list(DEFAULT_USER_AGENTS)
    proxies = scraper.get("proxies")
    if isinstance(proxies, str):
        proxies = [proxies]
    if not proxies:
        single = scraper.get("proxy")
        proxies = [single] if single else []
    rotation = scraper.get("ua_rotation", "hash")
    if rotation not in ("hash", "sequential"):
        raise ConfigError(
            f"scraper.ua_rotation must be 'hash' or 'sequential', got {rotation!r}"
        )
    headers = scraper.get("headers") or {}
    cookies = scraper.get("cookies") or {}
    if not isinstance(headers, dict) or not isinstance(cookies, dict):
        raise ConfigError("scraper.headers and scraper.cookies must be mappings")
    return FetchPolicy(
        user_agents=list(uas), rotation=rotation, proxies=list(proxies),
        headers=dict(headers), cookies=dict(cookies),
    )


def _bind_revisit(scraper: Dict[str, Any]) -> Optional[Dict[str, Any]]:
    """``scraper.revisit`` → normalized enqueue_revisits parameters, or
    None when absent (one-shot crawl)."""
    raw = scraper.get("revisit")
    if raw is None or raw is False:
        return None
    if raw is True:
        raw = {}
    if not isinstance(raw, dict):
        raise ConfigError(
            "scraper.revisit must be a mapping (or true/false)"
        )
    unknown = set(raw) - {
        "epoch_hours", "default_hours", "hints", "modified_since"
    }
    if unknown:
        raise ConfigError(
            f"unknown scraper.revisit keys: {sorted(unknown)}"
        )
    try:
        out = {
            "epoch_hours": int(raw.get("epoch_hours", 24)),
            "default_hours": int(raw.get("default_hours", 168)),
            "hints": raw.get("hints", "none"),
            "modified_since": raw.get("modified_since"),
        }
    except (TypeError, ValueError) as exc:
        raise ConfigError(
            f"scraper.revisit epoch_hours/default_hours must be integers: {exc}"
        ) from None
    if out["epoch_hours"] < 1 or out["default_hours"] < 1:
        raise ConfigError(
            "scraper.revisit epoch_hours/default_hours must be >= 1"
        )
    if out["hints"] not in ("none", "from-sitemaps"):
        raise ConfigError(
            "scraper.revisit.hints must be 'none' or 'from-sitemaps'"
        )
    return out


def _bind_focus_terms(scraper: Dict[str, Any]):
    """yaml ``scraper.focus_terms``: list of non-empty strings or
    absent. A scalar string is accepted as a single-term list."""
    raw = scraper.get("focus_terms")
    if raw is None:
        return None
    if isinstance(raw, str):
        raw = [raw]
    if not isinstance(raw, (list, tuple)) or not raw or not all(
        isinstance(x, str) and x.strip() for x in raw
    ):
        raise ConfigError(
            "scraper.focus_terms must be a non-empty list of non-empty "
            "strings"
        )
    return [str(x) for x in raw]


def bind_job(config: Dict[str, Any]) -> BoundJob:
    """scraper config dict → engine configs (the get_scraper analog)."""
    validate_config(config)
    scraper = config["scraper"]
    if scraper.get("index_positions") and not scraper.get("index_articles"):
        raise ConfigError(
            "scraper.index_positions requires scraper.index_articles "
            "(the positional shard is the articles index's twin)"
        )
    stype = scraper["type"]
    selectors = scraper.get("selectors", {}) or {}
    seeds = [(url, stype) for url in scraper["urls"]]
    common = dict(
        stype=stype,
        seeds=seeds,
        crawl_delay=float(scraper.get("delay", 2.0)),  # base.py:34 default
        max_attempts=int(scraper.get("retries", 3)),
        max_depth=int(scraper.get("max_pages", 1)) + 5
        if scraper.get("follow_next_page")
        else 6,
        output_format=get_value(config, "scraper.output.format"),
        output_path=get_value(config, "scraper.output.path"),
        output_table=get_value(config, "scraper.output.table"),
        fetch_policy=_bind_fetch_policy(scraper),
        seen_filter=scraper.get("seen_filter", "bloom"),
        pld_budget=(
            int(scraper["pld_budget"])
            if scraper.get("pld_budget") is not None
            else None
        ),
        content_seen=bool(scraper.get("content_seen", False)),
        respect_meta_robots=bool(scraper.get("respect_meta_robots", False)),
        index_articles=bool(scraper.get("index_articles", False)),
        focus_terms=_bind_focus_terms(scraper),
        index_positions=bool(scraper.get("index_positions", False)),
        index_term_weights=bool(scraper.get("index_term_weights", False)),
        max_outlinks=(
            int(scraper["max_outlinks"])
            if scraper.get("max_outlinks") is not None
            else None
        ),
        revisit=_bind_revisit(scraper),
    )
    if common["seen_filter"] not in ("bloom", "cuckoo"):
        raise ConfigError(
            "scraper.seen_filter must be 'bloom' or 'cuckoo'"
        )
    if common["pld_budget"] is not None and common["pld_budget"] < 1:
        raise ConfigError("scraper.pld_budget must be a positive integer")
    if common["max_outlinks"] is not None and common["max_outlinks"] < 1:
        raise ConfigError("scraper.max_outlinks must be a positive integer")
    job = BoundJob(**common)
    if stype == "ecommerce":
        job.ecommerce = EcommerceConfig(
            selectors=selectors,
            currency_symbol=scraper.get("currency_symbol", "$"),
            extract_reviews=scraper.get("extract_reviews", True),
            extract_images=scraper.get("extract_images", True),
        )
    elif stype == "business":
        job.business = BusinessConfig(
            selectors=selectors,
            extract_social_media=scraper.get("extract_social_media", True),
            validate_emails=scraper.get("validate_emails", True),
            validate_phones=scraper.get("validate_phones", True),
            validate_urls=scraper.get("validate_urls", True),
            country_code=scraper.get("country_code", "US"),
        )
    else:
        job.content = ContentConfig(
            selectors=selectors,
            extract_images=scraper.get("extract_images", True),
            extract_metadata=scraper.get("extract_metadata", True),
            generate_summary=scraper.get("generate_summary", True),
            summary_length=int(scraper.get("summary_length", 150)),
            extract_keywords=scraper.get("extract_keywords", True),
            max_keywords=int(scraper.get("max_keywords", 5)),
            follow_next_page=scraper.get("follow_next_page", False),
            max_pages=int(scraper.get("max_pages", 1)),
        )
    return job
