"""Max-min fair (water-filling) division of a global fetch budget.

``dequeue(global_budget=...)`` spends a capped epoch greedily — best
priority first — which is right when priorities mean something and
starvation is acceptable. When the cap exists for CLUSTER reasons
(downstream parse capacity, egress budget) the fair question is the
opposite: no host may crowd out the others. The classic answer is
max-min fairness — find the water level ``T`` such that giving every
host ``min(demand, T)`` spends the budget exactly; small hosts are
fully served, big hosts are capped at the same level. TCP fair
queuing, YARN/DRF schedulers and crawl-budget allocators all use this
shape; the reference engine has a single global ``max_pages`` knob
(``config.py``) with first-come-first-served semantics.

Everything is integer arithmetic, so the result is bit-exact under
any partitioning and replayable by a plain SQL oracle:

- the water level is found on the DEMAND-VALUE HISTOGRAM, not the
  host table: ``used(T) = mass_below(T) + hosts_ge(T) · T`` is
  piecewise linear with breakpoints only at distinct demand values,
  so one window pass over the (tiny) histogram finds the segment,
  and a floor division finds ``T`` within it
- the leftover ``r < |capped hosts|`` units go one each to the ``r``
  capped hosts ranked by (demand desc, host asc) — deterministic,
  no RNG

Scale shape: one partial-aggregated exchange to (host), one to
(demand value); the two global windows run over the distinct-demand
histogram and the capped-host set respectively — both orders of
magnitude smaller than the frontier, and the scalar (T, r) row joins
back as a broadcast. The frontier itself is never shuffled here.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["fair_share_budgets", "dequeue_fair"]


def fair_share_budgets(
    demands: DataFrame,
    budget: int,
    *,
    host_col: str = "host",
    demand_col: str = "demand",
    exact_remainder: bool = True,
) -> DataFrame:
    """Water-fill ``budget`` units across hosts.

    ``demands`` has one row per host: ``(host, demand)`` with
    demand ≥ 0. Returns ``(host, demand, alloc)`` where::

      alloc_i = min(demand_i, T) (+1 for the first r capped hosts)
      sum(alloc) = min(budget, sum(demand))

    and no host can gain allocation without a smaller-demand host
    losing some — the max-min property. With
    ``exact_remainder=False`` the +1 remainder pass (the only step
    needing a total order over the capped hosts) is skipped and the
    sum may undershoot the budget by up to |capped hosts| − 1 units.
    """
    d = demands.select(
        F.col(host_col).alias("host"),
        F.greatest(F.col(demand_col).cast("long"), F.lit(0)).alias("demand"),
    )
    # three consumers (histogram, uncapped branch, capped branch) —
    # materialize the host-grain table once instead of re-running the
    # upstream demand aggregate per branch (same pattern as
    # resolve_redirects' doubling rounds); host grain ≪ input grain
    d = d.localCheckpoint(eager=True)

    # --- histogram of distinct demand values -------------------------
    hist = d.groupBy("demand").agg(F.count("*").alias("n_at"))
    # virtual level 0 keeps the search total when even the smallest
    # demand level overshoots the budget (then every host is capped)
    zero = hist.sparkSession.createDataFrame(
        [(0, 0)], "demand long, n_at long"
    )
    hist = zero.unionByName(hist.filter(F.col("demand") > 0))

    w_prev = Window.orderBy("demand").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    lev = hist.select(
        "demand",
        "n_at",
        F.coalesce(F.sum(F.col("n_at") * F.col("demand")).over(w_prev), F.lit(0))
        .alias("below_mass"),
        F.coalesce(F.sum("n_at").over(w_prev), F.lit(0)).alias("hosts_below"),
        F.sum("n_at").over(w_all).alias("n_total"),
    ).withColumn(
        # budget spent if the water level sits exactly at this demand
        # value: everyone below is fully served, everyone at-or-above
        # pays the level
        "used",
        F.col("below_mass")
        + (F.col("n_total") - F.col("hosts_below")) * F.col("demand"),
    )

    b = F.lit(int(budget)).cast("long")
    dstar = (
        lev.filter(F.col("used") <= b)
        .orderBy(F.desc("demand"))
        .limit(1)
        .select(
            "demand",
            "used",
            (F.col("n_total") - F.col("hosts_below") - F.col("n_at")).alias(
                "hosts_gt"
            ),
        )
    )
    # extend the level into the segment above d*: used(T) grows by
    # hosts_gt per unit, and used(next level) > budget guarantees the
    # floor lands strictly inside the segment
    scal = dstar.select(
        F.when(
            F.col("hosts_gt") > 0,
            F.col("demand") + F.floor((b - F.col("used")) / F.col("hosts_gt")),
        )
        .otherwise(F.col("demand"))
        .cast("long")
        .alias("t_level"),
        F.when(
            F.col("hosts_gt") > 0,
            b
            - F.col("used")
            - F.col("hosts_gt")
            * F.floor((b - F.col("used")) / F.col("hosts_gt")),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("r_extra"),
    )

    # --- apply the level host-wise ------------------------------------
    out = d.crossJoin(F.broadcast(scal))
    base = out.select(
        "host",
        "demand",
        F.least(F.col("demand"), F.col("t_level")).cast("long").alias("alloc"),
        "t_level",
        "r_extra",
    )
    if not exact_remainder:
        # skip the remainder sort entirely: undershoots the budget by
        # r < |capped hosts| units — at most one epoch slot per capped
        # host, the price of avoiding a global order over the capped
        # set when that set itself is huge
        return base.select("host", "demand", "alloc")

    # leftover r units go one each to the first r capped hosts by
    # (demand desc, host asc) — the ranking window's input is the
    # CAPPED subset only, r < |capped| by construction
    capped = base.filter(F.col("demand") > F.col("t_level"))
    w_cap = Window.orderBy(F.desc("demand"), F.asc("host"))
    bumped = capped.withColumn("_rk", F.row_number().over(w_cap)).select(
        "host",
        "demand",
        (
            F.col("alloc")
            + F.when(F.col("_rk") <= F.col("r_extra"), 1).otherwise(0)
        )
        .cast("long")
        .alias("alloc"),
    )
    return (
        base.filter(F.col("demand") <= F.col("t_level"))
        .select("host", "demand", "alloc")
        .unionByName(bumped)
    )


def dequeue_fair(
    frontier: DataFrame,
    robots: Optional[DataFrame],
    *,
    epoch_seconds: float = 8.0,
    default_delay: float = 2.0,
    global_budget: int = 1_000_000,
) -> DataFrame:
    """Politeness-capped, max-min-fair epoch batch.

    Each host's demand is ``min(pending, politeness budget)`` — what
    it could legally fetch this epoch; the global budget is then
    water-filled across hosts and the batch takes each host's best
    ``alloc`` rows in the standard deterministic order (priority
    desc, depth asc, ord_key asc). The greedy alternative
    (``dequeue(global_budget=...)``) can spend the whole epoch on one
    hot host; this cannot.
    """
    from .core import dequeue_ranked

    ranked = dequeue_ranked(
        frontier, robots, epoch_seconds=epoch_seconds,
        default_delay=default_delay,
    )
    legal = ranked.filter(F.col("host_rank") <= F.col("budget"))
    demands = legal.groupBy("host").agg(F.count("*").alias("demand"))
    alloc = fair_share_budgets(demands, global_budget).select(
        "host", F.col("alloc").alias("_fair_alloc")
    )
    return (
        legal.join(F.broadcast(alloc), "host", "inner")
        .filter(F.col("host_rank") <= F.col("_fair_alloc"))
        .drop("_fair_alloc")
    )
