"""Frontier dataflow primitives (SURVEY.md §2.5, §2.7 U5, §4.1).

Key design decisions vs the reference's sequential loop (base.py:188):

**ord_key — distributed total order without a global shuffle.** The
reference's crawl order is DFS preorder: each listing's articles are
fetched immediately after it, then the next page (content.py:146-229).
We encode that order as a path string: seeds get ``zfill(seed_index)``,
a link discovered at position p on a page with key K gets ``K/ppppp``.
Lexicographic ord_key order IS the reference's sequential visit order,
computed per-row with zero coordination — no ``row_number`` over an
unpartitioned window, which would single-thread at 10^10 scale. Parity
tests sort by ord_key; the politeness scheduler decides *which epoch* a
URL is fetched in, never its ord_key.

**Salted host partitioning.** ``host_salt = host || '#' || pmod(hash(url), S)``
(north rule): repartitioning the frontier by host alone would put 50%
of a Zipf frontier in one task; the salt bounds any task's share to
~hot_share/S while keeping politeness groupable by ``host``.

**Politeness budget as a window.** The reference declares ``delay`` but
never sleeps (base.py:34,62; SURVEY.md §2.9 T8). We enforce it as batch
composition: an epoch spans ``epoch_seconds`` of crawl time, so host h
gets ``max(1, floor(epoch_seconds / crawl_delay(h)))`` fetch slots,
assigned by ``row_number() OVER (PARTITION BY host ORDER BY priority
DESC, ord_key)``.

**Dedup-merge.** First-discovery-wins (min ord_key) within the batch,
bloom pre-filter against the seen-set (frontier/bloom.py), then the
exact ``left_anti`` joins against seen and pending frontier.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

FRONTIER_SCHEMA = (
    "url string, url_hash int, host string, host_salt string, stype string, "
    "depth int, priority double, ord_key string, attempts int, "
    "discovered_epoch int"
)

SEEN_SCHEMA = (
    "url string, url_hash int, host string, stype string, status string, "
    "ord_key string, depth int, fetched_epoch int"
)

SEED_PAD = 5  # zero-pad width for seed indices
POS_PAD = 5  # zero-pad width for on-page link positions


def zfill_col(c, width: int):
    """``str.zfill`` semantics for a column: left-pad with zeros but
    NEVER truncate. ``F.lpad`` truncates overflow-width strings
    (lpad('123456', 5) == '12345'), which would make on-page position
    100000 collide with position 10000 in ord_key paths; zfill keeps
    overflow positions distinct (and matches the sequential simulator's
    ``str(pos).zfill(POS_PAD)`` byte-for-byte)."""
    s = c.cast("string")
    return F.when(F.length(s) >= width, s).otherwise(F.lpad(s, width, "0"))


def with_frontier_columns(
    candidates: DataFrame, epoch: int, salt_buckets: int = 8
) -> DataFrame:
    """candidates(url, stype, depth, ord_key, attempts?) → full frontier
    schema. URL must already be canonical (the extraction UDFs
    canonicalize at emission; seeds canonicalize on the driver)."""
    if "attempts" not in candidates.columns:
        candidates = candidates.withColumn("attempts", F.lit(0))
    return candidates.select(
        "url",
        F.hash("url").alias("url_hash"),
        F.lower(F.try_parse_url("url", F.lit("HOST"))).alias("host"),
        F.concat(
            F.lower(F.try_parse_url("url", F.lit("HOST"))),
            F.lit("#"),
            F.pmod(F.hash("url"), F.lit(salt_buckets)).cast("string"),
        ).alias("host_salt"),
        "stype",
        "depth",
        (F.lit(1.0) / (F.lit(1.0) + F.col("depth"))).alias("priority"),
        "ord_key",
        "attempts",
        F.lit(epoch).alias("discovered_epoch"),
    )


def seeds_frontier(spark, seeds, salt_buckets: int = 8) -> DataFrame:
    """seeds: list of (url, stype) in reference ``urls``-list order
    (base.py:188 — seed order drives ordering parity).

    Seeds carry ``discovered_epoch = -1``: the merge-on-read frontier
    treats a dequeue tombstone at epoch t as killing rows enqueued
    strictly before t, and seeds may be dequeued as early as epoch 0."""
    from ..urlutils import canonicalize_url

    rows = [
        (canonicalize_url(url), stype, 0, str(i).zfill(SEED_PAD))
        for i, (url, stype) in enumerate(seeds)
    ]
    df = spark.createDataFrame(
        rows, "url string, stype string, depth int, ord_key string"
    )
    return with_frontier_columns(df, epoch=-1, salt_buckets=salt_buckets)


# budget for hosts with no rate limit (Crawl-delay: 0 or unset policy):
# effectively "the whole frontier", still a finite int for the window
NO_LIMIT_BUDGET = 1_000_000_000


def _py_budget(epoch_seconds: float, delay: float) -> int:
    if delay <= 0:
        return NO_LIMIT_BUDGET
    return max(1, int(epoch_seconds // delay))


def politeness_budgets(robots: Optional[DataFrame], epoch_seconds: float, default_delay: float):
    """host → per-epoch fetch budget from crawl_delay (T8/J4).
    ``crawl_delay <= 0`` (robots.txt ``Crawl-delay: 0``) means
    unlimited — never a divide-by-zero under ANSI mode."""

    default_budget = _py_budget(epoch_seconds, default_delay)

    def attach(frontier: DataFrame) -> DataFrame:
        if robots is None:
            return frontier.withColumn("budget", F.lit(default_budget))
        delay = F.coalesce(F.col("crawl_delay"), F.lit(float(default_delay)))
        rb = robots.select(
            "host",
            F.when(
                delay > 0,
                F.greatest(F.lit(1), F.floor(F.lit(epoch_seconds) / delay)),
            )
            .otherwise(F.lit(NO_LIMIT_BUDGET))
            .cast("int")
            .alias("budget"),
        )
        joined = frontier.join(F.broadcast(rb), "host", "left")
        return joined.withColumn(
            "budget", F.coalesce(F.col("budget"), F.lit(default_budget))
        )

    return attach


def dequeue_ranked(
    frontier: DataFrame,
    robots: Optional[DataFrame],
    epoch_seconds: float = 8.0,
    default_delay: float = 2.0,
    skew_prerank: bool = False,
) -> DataFrame:
    """Rank the whole frontier for this epoch's politeness windows
    (SURVEY.md §2.5) WITHOUT splitting it: every row gets ``budget``,
    ``host_rank`` and ``fetch_slot`` columns. The caller derives both
    the fetch batch (``host_rank <= budget``) and the carried-over
    pending frontier (``host_rank > budget``) from ONE window pass —
    no frontier ⟕ batch anti-join (one full shuffle saved per epoch).

    ``skew_prerank``: at 10^10-URL scale a Zipf-hot host can put a
    double-digit share of the frontier into one window task. A first
    row_number over ``(host, salt-bucket)`` keeps only ``budget`` rows
    per salt bucket as batch *candidates* (host_rank ≤ budget implies
    salt_rank ≤ budget within that row's bucket), bounding the per-host
    window input to salt_buckets × budget rows; the rest go straight to
    pending. Costs an extra shuffle — worth it only on huge frontiers.
    """
    with_budget = politeness_budgets(robots, epoch_seconds, default_delay)(frontier)
    host_window = Window.partitionBy("host").orderBy(
        F.desc("priority"), F.asc("depth"), F.asc("ord_key")
    )
    if skew_prerank:
        salt_window = Window.partitionBy("host_salt").orderBy(
            F.desc("priority"), F.asc("depth"), F.asc("ord_key")
        )
        pre = with_budget.withColumn(
            "_salt_rank", F.row_number().over(salt_window)
        )
        contenders = pre.filter(F.col("_salt_rank") <= F.col("budget")).drop(
            "_salt_rank"
        )
        # rows pruned here can never make the batch: give them a rank
        # past any budget so they land in pending without a host window
        overflow = pre.filter(F.col("_salt_rank") > F.col("budget")).drop(
            "_salt_rank"
        ).withColumn("host_rank", F.col("budget") + F.lit(1_000_000_000))
        ranked = contenders.withColumn(
            "host_rank", F.row_number().over(host_window)
        ).unionByName(overflow)
    else:
        ranked = with_budget.withColumn("host_rank", F.row_number().over(host_window))
    return ranked.withColumn(
        # fetch slot inside the epoch: rank_in_host × crawl_delay —
        # the token-bucket schedule (north rule), carried as lineage
        "fetch_slot",
        (F.col("host_rank") - F.lit(1)).cast("double")
        * (F.lit(epoch_seconds) / F.col("budget").cast("double")),
    )


def dequeue(
    frontier: DataFrame,
    robots: Optional[DataFrame],
    epoch_seconds: float = 8.0,
    default_delay: float = 2.0,
    global_budget: Optional[int] = None,
    host_priority: Optional[DataFrame] = None,
) -> DataFrame:
    """Politeness-bounded dequeue (SURVEY.md §2.5): per-host fair slots
    by priority/ord_key; optional global cap keeps epochs bounded.

    ``host_priority`` (host, rank) — e.g. ``operators.graph.pagerank``
    over ``host_edges`` of the link graph — allocates a capped epoch's
    global budget to high-centrality hosts first (the OPIC/PageRank
    frontier-ordering tier). Per-host politeness fairness is untouched:
    centrality decides WHICH hosts' slots make a bounded epoch, never
    the within-host order (deterministic: rank desc, then depth,
    ord_key). Unranked hosts sort last at rank 0. The rank table is
    host-grained — broadcast-sized by construction."""
    ranked = dequeue_ranked(frontier, robots, epoch_seconds, default_delay)
    batch = ranked.filter(F.col("host_rank") <= F.col("budget")).drop("budget")
    if global_budget is not None:
        # bounded epochs: keep best-ranked rows; ties broken by ord_key.
        order = [F.asc("depth"), F.asc("ord_key")]
        if host_priority is not None:
            hp = host_priority.select(
                "host", F.col("rank").alias("_host_rank_fp")
            )
            batch = batch.join(F.broadcast(hp), "host", "left").withColumn(
                "_host_rank_fp", F.coalesce("_host_rank_fp", F.lit(0))
            )
            order = [F.desc("_host_rank_fp")] + order
        batch = batch.orderBy(*order).limit(global_budget)
        if host_priority is not None:
            batch = batch.drop("_host_rank_fp")
    return batch


def first_discovery_wins(candidates: DataFrame) -> DataFrame:
    """U5 dedup within a discovery batch: keep the occurrence with the
    smallest ord_key — the one the reference's sequential loop would
    have reached first."""
    return (
        candidates.groupBy("url")
        .agg(
            F.min(
                F.struct("ord_key", "depth", "stype")
            ).alias("first")
        )
        .select(
            "url",
            F.col("first.ord_key").alias("ord_key"),
            F.col("first.depth").alias("depth"),
            F.col("first.stype").alias("stype"),
        )
    )


def _longest_prefix_match(col_name: str, path_col: str = "_path"):
    """RFC 9309 §2.2.2 building block shared by ``robots_filter`` and
    ``robots_audit``: length of the longest prefix in the ``col_name``
    array matching ``path_col`` (0 when none match or the rules
    row/array is absent). One definition so the filter and the audit
    can never drift on what counts as blocked."""
    return F.coalesce(
        F.aggregate(
            F.col(col_name),
            F.lit(0),
            lambda acc, p: F.when(
                F.col(path_col).startswith(p) & (F.length(p) > acc),
                F.length(p),
            ).otherwise(acc),
        ),
        F.lit(0),
    )


def robots_filter(candidates: DataFrame, robots: Optional[DataFrame]) -> DataFrame:
    """J4: drop candidates whose path is blocked by their host's
    robots rules — broadcast map-side lookup, no shuffle.

    Implements RFC 9309 §2.2.2 longest-match precedence when the rules
    table carries an ``allow_prefixes`` column (robots.py
    ROBOTS_SCHEMA): among all matching Allow/Disallow prefixes the
    LONGEST wins, ties go to Allow. Rules tables without the column
    (older fixtures, hand-built tables) keep the disallow-only
    semantics unchanged.
    """
    if robots is None:
        return candidates
    has_allow = "allow_prefixes" in robots.columns
    cols = ["host", "disallow_prefixes"] + (
        ["allow_prefixes"] if has_allow else []
    )
    rules = robots.select(*cols)
    with_host = candidates.withColumn(
        "_host", F.lower(F.try_parse_url("url", F.lit("HOST")))
    ).withColumn("_path", F.try_parse_url("url", F.lit("PATH")))
    joined = with_host.join(
        F.broadcast(rules), with_host["_host"] == rules["host"], "left"
    )

    if has_allow:
        blocked = _longest_prefix_match(
            "disallow_prefixes"
        ) > _longest_prefix_match("allow_prefixes")
        allowed = joined.filter(~blocked)
        drop = ["host", "disallow_prefixes", "allow_prefixes", "_host", "_path"]
    else:
        allowed = joined.filter(
            F.col("disallow_prefixes").isNull()
            | ~F.exists(
                "disallow_prefixes",
                lambda p: F.col("_path").startswith(p),
            )
        )
        drop = ["host", "disallow_prefixes", "_host", "_path"]
    return allowed.drop(*drop)


def robots_audit(
    fetches: DataFrame, robots: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Compliance report: per host, how many ALREADY-FETCHED URLs the
    CURRENT rules would disallow. Violations appear when robots.txt
    changes after a fetch (rules drift between recrawls) or a crawler
    bug bypassed the enqueue-time filter — auditing for them is
    standard crawl-operations hygiene, and the set-oriented audit is
    one broadcast join + one aggregate regardless of corpus size.

    Same RFC 9309 longest-match semantics as ``robots_filter`` (Allow
    wins ties; rules tables without ``allow_prefixes`` keep
    disallow-only semantics). Returns one row per host present in
    ``fetches``::

      (host, n_fetched, n_violations, violation_ppm, first_violation)

    ``first_violation`` is the lexicographic-min violating URL (NULL
    when compliant) — a deterministic sample for the operator's
    incident report.
    """
    has_allow = "allow_prefixes" in robots.columns
    cols = ["host", "disallow_prefixes"] + (
        ["allow_prefixes"] if has_allow else []
    )
    rules = robots.select(*cols)
    with_host = fetches.select(F.col(url_col).alias("_url")).withColumn(
        "_host", F.lower(F.try_parse_url("_url", F.lit("HOST")))
    ).withColumn("_path", F.try_parse_url("_url", F.lit("PATH")))
    joined = with_host.join(
        F.broadcast(rules), with_host["_host"] == rules["host"], "left"
    )

    if has_allow:
        blocked = _longest_prefix_match(
            "disallow_prefixes"
        ) > _longest_prefix_match("allow_prefixes")
    else:
        blocked = _longest_prefix_match("disallow_prefixes") > 0
    return (
        joined.withColumn("_blocked", blocked)
        .groupBy(F.col("_host").alias("host"))
        .agg(
            F.count("*").cast("long").alias("n_fetched"),
            F.sum(F.col("_blocked").cast("long")).alias("n_violations"),
            F.min(F.when(F.col("_blocked"), F.col("_url"))).alias(
                "first_violation"
            ),
        )
        .withColumn(
            "violation_ppm",
            F.floor(F.col("n_violations") * 1_000_000 / F.col("n_fetched"))
            .cast("long"),
        )
        .select(
            "host", "n_fetched", "n_violations", "violation_ppm",
            "first_violation",
        )
    )


def drain_plan(
    frontier: DataFrame,
    robots: Optional[DataFrame] = None,
    epoch_seconds: float = 60.0,
    default_delay: float = 2.0,
    host_col: str = "host",
) -> DataFrame:
    """Capacity planning for the crawl: how many politeness-bounded
    epochs until each host's pending frontier drains.

    The reference declares ``delay`` per job but never plans with it;
    at 10^10 URLs the drain horizon IS the operational question (which
    hosts are months of work at their crawl-delay, where to spend
    spare budget). Same budget formula as ``politeness_budgets`` —
    ``max(1, floor(epoch_seconds / crawl_delay))`` slots per epoch,
    ``crawl_delay <= 0`` means unlimited — then an exact integer
    ceiling division:

      (host, pending, budget, epochs_to_drain)

    One map-side-combined count per host plus a broadcast join against
    the (hosts-sized) robots table; the frontier is never shuffled
    beyond the count's partial-aggregate exchange.
    """
    pending = frontier.groupBy(F.col(host_col).alias("host")).agg(
        F.count("*").alias("pending")
    )
    default_budget = _py_budget(epoch_seconds, default_delay)
    if robots is None:
        budgeted = pending.withColumn("budget", F.lit(default_budget))
    else:
        delay = F.coalesce(F.col("crawl_delay"), F.lit(float(default_delay)))
        rb = robots.select(
            "host",
            F.when(
                delay > 0,
                F.greatest(F.lit(1), F.floor(F.lit(epoch_seconds) / delay)),
            )
            .otherwise(F.lit(NO_LIMIT_BUDGET))
            .cast("int")
            .alias("budget"),
        )
        budgeted = pending.join(F.broadcast(rb), "host", "left").withColumn(
            "budget", F.coalesce(F.col("budget"), F.lit(default_budget))
        )
    return budgeted.select(
        "host",
        "pending",
        "budget",
        F.expr("(pending + budget - 1) div budget")
        .cast("int")
        .alias("epochs_to_drain"),
    )


def dequeue_by_ip(
    frontier: DataFrame,
    robots: Optional[DataFrame],
    host_ip: Optional[DataFrame],
    epoch_seconds: float = 8.0,
    default_delay: float = 2.0,
) -> DataFrame:
    """Server-grain politeness (Mercator / Heritrix "IP politeness"):
    hosts that resolve to the same address share ONE token bucket, so a
    vhost farm (thousands of hostnames, one box — shared hosting, CDN
    edges) cannot multiply its fetch budget by its hostname count the
    way the per-host window lets it.

    ``host_ip``: broadcast-sized (host, ip) lookup — the 100 TB corpus
    has millions of hosts but the resolver cache is a dimension table.
    Hosts missing from it form their own singleton group (unknown
    address = assume own server — the per-host behavior).

    Group policy is the MOST CONSERVATIVE member: the group's crawl
    delay is the max over member hosts' robots delays (a delay of 0 =
    unlimited loses to any positive limit), budget = epoch // delay as
    in ``politeness_budgets``, and one rank window per group orders by
    the same (priority desc, depth, ord_key) key as the per-host
    dequeue. ``slot_ms`` is the integer token-bucket schedule
    ((rank-1) x epoch_ms DIV budget) — exact, oracle-replayable, no
    float slots.

    Plan shape: two broadcast joins (resolver cache, per-group delay)
    + one window keyed on the group — same exchange count as the
    per-host dequeue; the group table is aggregate-sized.
    """
    epoch_ms = int(epoch_seconds * 1000)
    hosts = frontier.select("host").distinct()
    if host_ip is not None:
        hosts = hosts.join(F.broadcast(host_ip), "host", "left")
    else:
        hosts = hosts.withColumn("ip", F.lit(None).cast("string"))
    grouped = hosts.select(
        "host", F.coalesce(F.col("ip"), F.col("host")).alias("ip_group")
    )
    if robots is not None:
        delays = grouped.join(
            F.broadcast(robots.select("host", "crawl_delay")), "host", "left"
        )
    else:
        delays = grouped.withColumn(
            "crawl_delay", F.lit(None).cast("double")
        )
    delays = delays.withColumn(
        "_delay", F.coalesce(F.col("crawl_delay"), F.lit(float(default_delay)))
    )
    group_delay = delays.groupBy("ip_group").agg(
        F.max("_delay").alias("group_delay")
    )
    budgets = group_delay.select(
        "ip_group",
        F.when(
            F.col("group_delay") > 0,
            F.greatest(
                F.lit(1),
                F.floor(F.lit(epoch_seconds) / F.col("group_delay")),
            ),
        )
        .otherwise(F.lit(NO_LIMIT_BUDGET))
        .cast("int")
        .alias("budget"),
    )
    routed = frontier.join(
        F.broadcast(grouped.select("host", "ip_group")), "host", "left"
    ).join(F.broadcast(budgets), "ip_group", "left")
    win = Window.partitionBy("ip_group").orderBy(
        F.desc("priority"), F.asc("depth"), F.asc("ord_key")
    )
    return (
        routed.withColumn("ip_rank", F.row_number().over(win))
        .withColumn(
            "slot_ms",
            F.expr(
                f"CAST((ip_rank - 1) AS BIGINT) * {epoch_ms} DIV budget"
            ),
        )
    )


def starvation_report(
    frontier: DataFrame,
    seen: DataFrame,
    current_epoch: int,
    stale_epochs: int = 3,
) -> DataFrame:
    """Fairness diagnostics for budgeted crawls: politeness budgets and
    global caps can STARVE hosts — pending URLs that never win a slot
    (IRLbot §6 discusses exactly this failure under budget
    enforcement). A host is flagged ``starving`` when it still has
    pending frontier rows, its oldest pending row has waited at least
    ``stale_epochs`` epochs since discovery, and nothing was fetched
    from it within the last ``stale_epochs`` epochs (never-fetched
    hosts qualify). Feed the flagged hosts into
    ``dequeue(host_priority=...)`` or a fair-share budget to unstick
    them.

    Output per host with pending work: (host, n_pending, oldest_wait,
    last_fetch_epoch [null = never], starving).

    Scale shape: two host-grain map-side-combined aggregates and one
    host-keyed join between them — both sides collapse to host
    cardinality before any shuffle; nothing URL-scale moves.
    """
    pend = frontier.groupBy("host").agg(
        F.count("*").alias("n_pending"),
        (F.lit(current_epoch) - F.min("discovered_epoch")).cast("long").alias(
            "oldest_wait"
        ),
    )
    fetched = seen.groupBy("host").agg(
        F.max("fetched_epoch").cast("long").alias("last_fetch_epoch")
    )
    recent = F.col("last_fetch_epoch") > (current_epoch - stale_epochs)
    return pend.join(fetched, "host", "left").select(
        "host",
        "n_pending",
        "oldest_wait",
        "last_fetch_epoch",
        (
            (F.col("oldest_wait") >= stale_epochs)
            & ~F.coalesce(recent, F.lit(False))
        ).alias("starving"),
    )
