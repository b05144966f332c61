"""Session / header / proxy setup and user-agent rotation (SURVEY.md
§2.1 S2/S3) re-expressed for a distributed synthetic-fetch engine.

The reference wires these into a per-scraper ``requests.Session``
(reference ``scrapers/base.py:40-75``) and rotates user agents through
a mutable pool with ``random.choice`` or a sequential cursor
(reference ``utils/user_agents.py:56-137``). Neither translates
directly to a 1000-executor engine: a driver-side cursor is a
serialization point, and RNG breaks the engine's determinism invariant
(F20 — byte-stable reruns). Instead the policy is attached as native
columns on the fetch batch:

- **UA rotation**: ``hash`` mode assigns ``pool[md5(url:epoch) mod n]``
  — i.i.d.-looking like the reference's ``random.choice`` but
  reproducible and executor-local; ``sequential`` mode assigns
  ``pool[(host_rank - 1 + epoch) mod n]`` — the distributed analog of
  the reference's rotating cursor, cycling the pool within each host's
  politeness window.
- **Session affinity**: one logical session per (host, epoch) —
  ``requests.Session`` per scraper run maps to per-host connection
  reuse inside an epoch. ``session_id = md5(host:epoch)[:16]``.
- **Proxy**: sticky per host (``proxies[md5(host) mod n]``) so a
  host's requests always exit the same egress — the property a
  session-bound proxy gives you, without driver coordination.
- **Headers/cookies**: static maps from config, merged with the
  rotated User-Agent per row.

Every expression is md5-arithmetic reproducible in DuckDB SQL, so the
assignment has an exact oracle (``__spark_entry__.oracle_sql``:
``s2_fetch_session`` / ``s3_ua_rotation``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# An original pool of common desktop/mobile browser UA strings (same
# shape as the reference's 22-entry pool, not copied from it).
DEFAULT_USER_AGENTS: List[str] = [
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36",
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/121.0.0.0 Safari/537.36",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/17.2 Safari/605.1.15",
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64; rv:121.0) Gecko/20100101 Firefox/121.0",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10.15; rv:121.0) Gecko/20100101 Firefox/121.0",
    "Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36",
    "Mozilla/5.0 (X11; Linux x86_64; rv:121.0) Gecko/20100101 Firefox/121.0",
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36 Edg/120.0.0.0",
    "Mozilla/5.0 (Linux; Android 14; Pixel 8) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.6099.144 Mobile Safari/537.36",
    "Mozilla/5.0 (iPhone; CPU iPhone OS 17_2 like Mac OS X) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/17.2 Mobile/15E148 Safari/604.1",
    "Mozilla/5.0 (iPad; CPU OS 17_2 like Mac OS X) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/17.2 Mobile/15E148 Safari/604.1",
]

MD5_MOD = 2147483647  # 2^31-1, same family as operators.dedup


@dataclass
class FetchPolicy:
    """Declarative request-metadata policy for the fetch phase.

    Mirrors the reference scraper's session knobs (user_agent, proxy,
    headers, cookies — ``base.py:40-75``) plus the UA-pool rotation
    strategy (``user_agents.py:64``: random vs sequential).
    """

    user_agents: List[str] = field(default_factory=lambda: list(DEFAULT_USER_AGENTS))
    rotation: str = "hash"  # "hash" (≈ random.choice) | "sequential"
    proxies: List[str] = field(default_factory=list)
    headers: Dict[str, str] = field(default_factory=dict)
    cookies: Dict[str, str] = field(default_factory=dict)

    def __post_init__(self) -> None:
        if not self.user_agents:
            # reference falls back to a single default UA with a warning
            self.user_agents = [DEFAULT_USER_AGENTS[0]]
        if self.rotation not in ("hash", "sequential"):
            raise ValueError(
                f"rotation must be 'hash' or 'sequential', got {self.rotation!r}"
            )


def md5_index_col(col: Column, n: int) -> Column:
    """Deterministic [0, n) index from a string column — first 60 bits
    of md5, mod 2^31-1, mod n. Bit-identical in DuckDB:
    ``('0x' || substr(md5(x),1,15))::BIGINT % 2147483647 % n``."""
    return F.pmod(
        F.pmod(
            F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long"),
            F.lit(MD5_MOD),
        ),
        F.lit(n),
    )


def _pick(pool: List[str], idx: Column) -> Column:
    return F.element_at(
        F.array(*[F.lit(u) for u in pool]), (idx + 1).cast("int")
    )


def user_agent_col(
    policy: FetchPolicy,
    epoch: int,
    url_col: str = "url",
    rank_col: Optional[str] = "host_rank",
) -> Column:
    """S3: the rotated User-Agent for each request row."""
    n = len(policy.user_agents)
    if policy.rotation == "sequential" and rank_col is not None:
        idx = F.pmod((F.col(rank_col) - 1 + F.lit(epoch)).cast("long"), F.lit(n))
    else:
        idx = md5_index_col(
            F.concat(F.col(url_col), F.lit(f":{epoch}")), n
        )
    return _pick(policy.user_agents, idx)


def with_fetch_metadata(
    batch: DataFrame,
    policy: FetchPolicy,
    epoch: int,
    url_col: str = "url",
    host_col: str = "host",
    rank_col: Optional[str] = "host_rank",
) -> DataFrame:
    """Attach (user_agent, session_id, proxy, header_line) to a fetch
    batch — all narrow codegen expressions, no shuffle, no RNG."""
    out = batch.withColumn(
        "user_agent", user_agent_col(policy, epoch, url_col, rank_col)
    ).withColumn(
        "session_id",
        F.substring(
            F.md5(F.concat(F.col(host_col), F.lit(f":{epoch}"))), 1, 16
        ),
    )
    if policy.proxies:
        out = out.withColumn(
            "proxy",
            _pick(policy.proxies, md5_index_col(F.col(host_col), len(policy.proxies))),
        )
    else:
        out = out.withColumn("proxy", F.lit(None).cast("string"))
    # static headers + cookies rendered once (driver-side, tiny) as a
    # canonical sorted header line; the per-row UA is concatenated in
    static = dict(policy.headers)
    if policy.cookies:
        static["Cookie"] = "; ".join(
            f"{k}={v}" for k, v in sorted(policy.cookies.items())
        )
    rendered = "\r\n".join(f"{k}: {v}" for k, v in sorted(static.items()))
    header_line = F.concat(
        F.lit(rendered + ("\r\n" if rendered else "")),
        F.lit("User-Agent: "),
        F.col("user_agent"),
    )
    return out.withColumn("header_line", header_line)


#: RFC 9110 IMF-fixdate pattern (java.time side); the DuckDB twin is
#: strftime('%a, %d %b %Y %H:%M:%S', ts) || ' GMT'. Sessions pin UTC
#: (session.get_spark), so the rendered wall time IS GMT.
_IMF_FIXDATE = "EEE, dd MMM yyyy HH:mm:ss"


def revalidation_headers(
    captures: DataFrame,
    due: DataFrame,
    *,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    digest_col: str = "digest",
) -> DataFrame:
    """Conditional-GET headers for a refetch wave (RFC 9110 §13): the
    link between the recrawl scheduler (which decides WHEN to revisit)
    and the fetch policy (which decides what the request looks like).
    Heritrix/Nutch both send validators from the stored capture so an
    unchanged page costs a 304 status line instead of a body — at
    Common Crawl scale that is 20-30%+ of refetch bytes.

    Per due URL, the LATEST prior capture (max (ts, digest) struct —
    deterministic under ties) supplies both validators:

    - ``if_none_match`` — the entity tag, the capture's payload digest
      quoted (the WARC-Payload-Digest IS the strong validator);
    - ``if_modified_since`` — the capture time as an IMF-fixdate
      (``Thu, 01 Jan 2026 07:00:00 GMT``).

    URLs with no prior capture keep NULL validators — an unconditional
    fetch. Returns (url, if_none_match, if_modified_since,
    last_digest, last_ts); ``last_digest`` feeds
    :func:`revalidation_outcomes`.

    Scale shape: one url-keyed aggregate over the capture log + one
    url-keyed left join — the same exchange class as the seen-set
    maintenance it rides next to; header strings are built per-row in
    codegen.
    """
    latest = (
        captures.groupBy(url_col)
        .agg(F.max(F.struct(ts_col, digest_col)).alias("_c"))
        .select(
            url_col,
            F.col(f"_c.{ts_col}").alias("last_ts"),
            F.col(f"_c.{digest_col}").alias("last_digest"),
        )
    )
    out = due.select(url_col).join(latest, url_col, "left")
    etag = F.when(
        F.col("last_digest").isNotNull(),
        F.concat(F.lit('"'), F.col("last_digest"), F.lit('"')),
    )
    ims = F.when(
        F.col("last_ts").isNotNull(),
        F.concat(
            F.date_format(F.col("last_ts"), _IMF_FIXDATE), F.lit(" GMT")
        ),
    )
    return out.select(
        url_col,
        etag.alias("if_none_match"),
        ims.alias("if_modified_since"),
        "last_digest",
        "last_ts",
    )


def revalidation_outcomes(
    headers: DataFrame,
    responses: DataFrame,
    *,
    url_col: str = "url",
    digest_col: str = "digest",
    bytes_col: str = "n_bytes",
) -> DataFrame:
    """Classify a refetch wave against its conditional headers: a
    response whose payload digest equals the stored validator is a
    **304 Not Modified** — the origin would have sent no body, so its
    bytes count as saved; anything else (changed digest, or no
    validator to send) is a full **200**. Returns one row per response:
    (url, status, bytes_fetched, bytes_saved).

    One url-keyed left join (responses ⋈ headers), everything else
    per-row codegen.
    """
    j = responses.join(
        headers.select(url_col, "last_digest"), url_col, "left"
    )
    not_modified = F.col("last_digest").isNotNull() & (
        F.col(digest_col) == F.col("last_digest")
    )
    status = F.when(not_modified, F.lit(304)).otherwise(F.lit(200))
    nbytes = F.col(bytes_col).cast("long")
    return j.select(
        url_col,
        status.alias("status"),
        F.when(not_modified, F.lit(0)).otherwise(nbytes).alias(
            "bytes_fetched"
        ),
        F.when(not_modified, nbytes).otherwise(F.lit(0)).alias(
            "bytes_saved"
        ),
    )


def revalidation_report(
    outcomes: DataFrame, group_col: str = "host"
) -> DataFrame:
    """Per-group rollup of :func:`revalidation_outcomes` — the crawl
    operator's view of how much the validator cache is worth:
    (group, n_requests, n_not_modified, bytes_fetched, bytes_saved,
    saved_ppm). ``saved_ppm`` is exact integer floor division (0 when
    nothing moved). One map-side-combined aggregate."""
    agg = outcomes.groupBy(F.col(group_col).alias("group")).agg(
        F.count("*").cast("long").alias("n_requests"),
        F.sum((F.col("status") == 304).cast("long"))
        .cast("long")
        .alias("n_not_modified"),
        F.sum("bytes_fetched").cast("long").alias("bytes_fetched"),
        F.sum("bytes_saved").cast("long").alias("bytes_saved"),
    )
    total = F.col("bytes_fetched") + F.col("bytes_saved")
    return agg.withColumn(
        "saved_ppm",
        F.when(total > 0, F.expr(
            "cast(bytes_saved as decimal(38,0)) * 1000000 div "
            "(cast(bytes_fetched as decimal(38,0)) + bytes_saved)"
        ).cast("long")).otherwise(F.lit(0).cast("long")),
    )
