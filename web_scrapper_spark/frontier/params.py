"""URL query-parameter relevance mining (canonicalization learning).

Large crawls drown in parameter noise: tracking tags (``utm_*``,
``fbclid``), session ids, and sort toggles mint unbounded distinct
URLs for one underlying resource. Static cleanup (``urlutils``
``clean_url`` / the reference's absolutize pass) can only strip a
hand-curated list; a web-scale frontier has to LEARN per-host which
parameters actually change content — the "URL parameter handling"
feature of production crawlers (cf. Dasgupta et al., *De-duping URLs
via rewrite rules*, WWW'08; Google Search Console's legacy parameter
tool).

Evidence model — pure digest counting, no content parsing:

- split every captured URL into ``(host, path, params)``;
- for each parameter ``k`` on a URL, its **residual** is the URL with
  ``k`` removed (path + the other params, sorted). URLs sharing a
  residual differ ONLY in ``k``;
- a residual group with ≥2 distinct ``k``-values is an *evidence
  group*: if every URL in it has the same content digest, ``k`` did
  not matter there;
- per ``(host, k)``: if all evidence groups are single-digest the
  parameter is content-irrelevant (action ``drop``), if any group
  shows >1 digest it is load-bearing (``keep``), and with no evidence
  groups at all the verdict is ``unknown``.

Scale shape: one narrow per-URL projection + a per-distinct-param
explode (bounded by params-per-URL, single digits on real URLs), then
ONE exchange keyed on ``(host, param, residual)`` — map-side combined;
the dual exact ``count(distinct)`` plans an Expand(×2) at that same
granularity, never corpus-wide. The verdict rollup and the rewrite
join are host×param sized — broadcastable. Nothing is quadratic in
URLs; parameter explosion on a trapped path inflates only that path's
group count, which is exactly what :mod:`traps` caps upstream.

Reference parity note: the reference engine has no equivalent (it
fetches a configured URL list; see ``scrapers/base_scraper.py`` —
URLs are inputs, never mined); this operator exists for the open-web
frontier this engine targets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["url_parts", "param_relevance", "apply_param_rules"]

#: component regexes shared (verbatim) with the DuckDB oracle —
#: regexp_extract returns '' on no-match in BOTH engines.
_HOST_RE = "^[a-z]+://([^/?#]+)"
_PATH_RE = "^[a-z]+://[^/?#]+([^?#]*)"
_QUERY_RE = r"\?([^#]*)"


def _key(kv: Column) -> Column:
    """Parameter name of a raw ``k=v`` token."""
    return F.substring_index(kv, "=", 1)


def url_parts(url: Column) -> tuple[Column, Column, Column]:
    """``(host, path, raw_params)`` — raw_params is the array of
    ``k=v`` tokens in URL order (empty array when no query)."""
    host = F.regexp_extract(url, _HOST_RE, 1)
    path = F.regexp_extract(url, _PATH_RE, 1)
    query = F.regexp_extract(url, _QUERY_RE, 1)
    raw = F.filter(F.split(query, "&"), lambda s: s != F.lit(""))
    return host, path, raw


def param_relevance(
    captures: DataFrame,
    url_col: str = "url",
    digest_col: str = "digest",
    drop_ppm: int = 1_000_000,
) -> DataFrame:
    """Learn per-(host, parameter) content relevance from captures.

    ``captures`` needs ``(url_col, digest_col)`` — one row per fetched
    page with its content digest. Returns one row per (host, param)
    ever seen in a query string::

      (host, param, n_groups, irrelevant_groups, irrelevant_ppm,
       action)

    - ``n_groups``: residual groups with ≥2 distinct values of the
      param (the only groups that carry evidence);
    - ``irrelevant_groups``: those whose URLs all share one digest;
    - ``irrelevant_ppm``: ``irrelevant_groups * 1e6 // n_groups``
      (-1 when no evidence);
    - ``action``: ``drop`` when evidence exists and ``irrelevant_ppm
      >= drop_ppm``, ``keep`` when evidence exists below the bar,
      ``unknown`` with no evidence groups.

    All counts are exact integers; the output is hash-stable across
    engines.
    """
    host, path, raw = url_parts(F.col(url_col))
    base = captures.select(
        host.alias("host"),
        path.alias("path"),
        raw.alias("raw"),
        F.col(digest_col).alias("digest"),
    )
    # one row per (URL, distinct param name on it)
    exploded = base.select(
        "host",
        "path",
        "raw",
        "digest",
        F.explode(F.array_distinct(F.transform("raw", _key))).alias("param"),
    )
    p = F.col("param")
    residual = F.concat(
        F.col("path"),
        F.lit("?"),
        F.concat_ws(
            "&",
            F.array_sort(F.filter("raw", lambda s: _key(s) != p)),
        ),
    )
    # the param's value signature on this URL (repeated keys join up)
    vsig = F.concat_ws(
        ",", F.array_sort(F.filter("raw", lambda s: _key(s) == p))
    )
    ev = (
        exploded.select(
            "host", "param", residual.alias("residual"),
            vsig.alias("vsig"), "digest",
        )
        .groupBy("host", "param", "residual")
        .agg(
            F.countDistinct("vsig").alias("n_vals"),
            F.countDistinct("digest").alias("n_digs"),
        )
        .filter(F.col("n_vals") >= 2)
        .groupBy("host", "param")
        .agg(
            F.count("*").alias("n_groups"),
            F.sum((F.col("n_digs") == 1).cast("long")).alias(
                "irrelevant_groups"
            ),
        )
    )
    seen = exploded.select("host", "param").distinct()
    out = seen.join(ev, ["host", "param"], "left").select(
        "host",
        "param",
        F.coalesce("n_groups", F.lit(0)).alias("n_groups"),
        F.coalesce("irrelevant_groups", F.lit(0)).alias("irrelevant_groups"),
    )
    # integer DIV, not float /: truncation must match the oracle's //
    ppm = F.when(
        F.col("n_groups") > 0,
        F.expr("irrelevant_groups * 1000000 div n_groups"),
    ).otherwise(F.lit(-1)).cast("long")
    out = out.withColumn("irrelevant_ppm", ppm)
    action = (
        F.when(F.col("n_groups") == 0, F.lit("unknown"))
        .when(F.col("irrelevant_ppm") >= drop_ppm, F.lit("drop"))
        .otherwise(F.lit("keep"))
    )
    return out.withColumn("action", action)


def apply_param_rules(
    urls: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Rewrite URLs with learned ``drop`` rules (the actionable half:
    the frontier canonicalizes BEFORE the seen-set probe, so every
    tracking variant collapses to one frontier row).

    ``rules`` is :func:`param_relevance` output (only ``action =
    'drop'`` rows are used). Per-host drop sets are tiny — they ride a
    broadcast join. Output adds ``canonical_url``: scheme+host+path
    with surviving params sorted (sorted order IS the canonical form;
    '?' is dropped when nothing survives). URLs on hosts with no rules
    pass through with only the param sort applied — the rewrite is
    idempotent and deterministic.
    """
    drops = (
        rules.filter(F.col("action") == "drop")
        .groupBy("host")
        .agg(F.collect_set("param").alias("drop_params"))
    )
    host, path, raw = url_parts(F.col(url_col))
    scheme = F.regexp_extract(F.col(url_col), "^([a-z]+)://", 1)
    base = urls.withColumn("host", host)
    joined = base.join(F.broadcast(drops), "host", "left")
    dp = F.coalesce(F.col("drop_params"), F.array().cast("array<string>"))
    kept = F.array_sort(
        F.filter(raw, lambda s: ~F.array_contains(dp, _key(s)))
    )
    q = F.concat_ws("&", kept)
    canonical = F.concat(
        scheme,
        F.lit("://"),
        F.col("host"),
        path,
        F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit("")),
    )
    return joined.withColumn("canonical_url", canonical).drop(
        "drop_params"
    )
