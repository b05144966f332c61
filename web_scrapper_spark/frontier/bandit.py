"""Adaptive crawl-budget allocation: hosts as a multi-armed bandit.

The politeness budget (frontier/core.py) caps how much a host MAY be
fetched; nothing yet decides how much a host SHOULD be fetched. At
10^10-URL scale the frontier always holds more eligible URLs than an
epoch can fetch, and spending the budget uniformly wastes it on hosts
that yield nothing — the budget-allocation problem IRLbot (§6) and
every production crawler solve with feedback from realized yield.

Classic framing: each host is a bandit arm; an epoch's fetches are
pulls; the reward is realized yield (extracted items, quality-passing
docs — any per-fetch payoff the caller aggregates). UCB1 (Auer et al.
2002) balances exploitation (high observed yield rate) against
exploration (hosts barely sampled)::

    score(h) = mean_yield(h) + c * sqrt( ln N / n(h) )

INTEGER determinism contract (the repo-wide rule — bit-identical
under any partitioning, and replayable in ANSI SQL): all terms are
fixed-point parts-per-million longs.

- ``mean_yield_ppm = yield * 10^6 / n``  (integer division)
- ``ln N`` → ``log2 N`` (floor) — any monotone log keeps UCB's
  regret shape; floor(log2) is exact integer math (bit length), no
  transcendental in either engine
- ``sqrt`` → exact integer square root of the ppm²-scaled radicand,
  via a float sqrt seeded Newton clamp (exact for inputs < 2^52 —
  asserted by bound checks), so Spark and the SQL oracle agree on
  every bit

Budget division is largest-remainder (Hamilton) apportionment over
the scores — deterministic, sums exactly to the requested total, no
float shares. Ties break on (remainder, score, host) descending.

Scale shape: everything is HOST-grain (the seen/yield aggregates are
map-side combined before the one host-keyed exchange); the largest-
remainder rank is a window over host-count rows, microscopic next to
the URL-grain tables. The scalar ``N`` (total pulls) is computed with
one tiny aggregate action and folded in as a literal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["host_yield_stats", "ucb_scores", "ucb_budgets"]

PPM = 1_000_000


def host_yield_stats(
    seen: DataFrame,
    items: DataFrame,
    *,
    host_col: str = "host",
    url_col: str = "url",
) -> DataFrame:
    """(host, n_fetched, n_yield) from the crawl's own tables: ``seen``
    rows are pulls (every fetch decision appended exactly once), item
    rows are rewards, joined host-grain — the URL-grain side collapses
    map-side before anything moves."""
    pulls = seen.groupBy(F.col(host_col).alias("host")).agg(
        F.count(F.lit(1)).alias("n_fetched")
    )
    rewards = (
        items.select(
            F.lower(F.try_parse_url(url_col, F.lit("HOST"))).alias("host")
        )
        .groupBy("host")
        .agg(F.count(F.lit(1)).alias("n_yield"))
    )
    return pulls.join(rewards, "host", "left").select(
        "host",
        "n_fetched",
        F.coalesce("n_yield", F.lit(0)).cast("long").alias("n_yield"),
    )


def _isqrt(x):
    """Exact floor(sqrt(x)) for long ``x`` in [0, 2^52): float sqrt,
    then a ±1 Newton clamp so a half-ulp rounding in either direction
    is corrected — bit-identical in any IEEE engine."""
    s = F.floor(F.sqrt(x.cast("double"))).cast("long")
    s = F.when((s + 1) * (s + 1) <= x, s + 1).otherwise(s)
    return F.when(s * s > x, s - 1).otherwise(s)


def ucb_scores(
    stats: DataFrame, *, c_ppm: int = 1_414_214, n_total: int | None = None
) -> DataFrame:
    """UCB1 score per host, fixed-point ppm.

    ``stats``: (host, n_fetched, n_yield); ``c_ppm``: exploration
    constant ×10^6 (default √2). ``n_total`` (total pulls) defaults to
    ``sum(n_fetched)`` — one scalar aggregate action.

    score_ppm = n_yield*PPM/n  +  c_ppm * isqrt(log2N * PPM² / n) / PPM

    Bound check: log2N ≤ 63 so the radicand ≤ 63·10^12 < 2^52 — the
    isqrt clamp's exactness precondition holds for any crawl size.
    """
    if n_total is None:
        n_total = int(
            stats.agg(F.sum("n_fetched")).collect()[0][0] or 0
        )
    log2n = max(int(n_total).bit_length() - 1, 0)  # floor(log2), 0 for N<2
    n = F.col("n_fetched").cast("long")
    mean_ppm = F.floor(F.col("n_yield") * PPM / n).cast("long")
    radicand = F.floor(F.lit(log2n).cast("long") * PPM * PPM / n).cast("long")
    explore_ppm = F.floor(F.lit(int(c_ppm)) * _isqrt(radicand) / PPM).cast(
        "long"
    )
    return stats.select(
        "host",
        "n_fetched",
        "n_yield",
        mean_ppm.alias("mean_yield_ppm"),
        explore_ppm.alias("explore_ppm"),
        (mean_ppm + explore_ppm).alias("ucb_ppm"),
    )


def ucb_budgets(
    scores: DataFrame, total_budget: int, *, min_score_ppm: int = 0
) -> DataFrame:
    """Split ``total_budget`` fetch slots across hosts proportionally
    to UCB score, largest-remainder apportionment: exact integer
    shares, Σbudget == total_budget, fully deterministic.

    Hosts below ``min_score_ppm`` are excluded (budget 0) — the
    starvation_report / flood-control hooks feed in here. Output:
    scores + ``budget``. Feed ``budget`` to ``dequeue_ranked``'s
    per-host cap for a yield-adaptive epoch.
    """
    if total_budget < 0:
        raise ValueError("total_budget must be non-negative")
    eligible = scores.filter(F.col("ucb_ppm") >= int(min_score_ppm))
    tot = eligible.agg(F.sum("ucb_ppm")).collect()[0][0]
    if not tot:
        return scores.withColumn("budget", F.lit(0).cast("long"))
    # exact shares in units of 1/tot: floor + rank of remainders
    raw = F.col("ucb_ppm") * int(total_budget)
    base = F.floor(raw / int(tot)).cast("long")
    rem = raw - base * int(tot)
    win = Window.orderBy(
        F.desc("rem"), F.desc("ucb_ppm"), F.asc("host")
    )
    with_base = eligible.withColumn("base", base).withColumn("rem", rem)
    shortfall = int(total_budget) - int(
        with_base.agg(F.sum("base")).collect()[0][0] or 0
    )
    topped = with_base.withColumn("rk", F.row_number().over(win)).select(
        "host",
        (
            F.col("base")
            + F.when(F.col("rk") <= shortfall, 1).otherwise(0)
        ).cast("long").alias("budget"),
    )
    return scores.join(topped, "host", "left").select(
        *scores.columns,
        F.coalesce("budget", F.lit(0)).cast("long").alias("budget"),
    )
