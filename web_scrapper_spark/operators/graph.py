"""Link-graph centrality for crawl prioritization (OPIC/PageRank tier).

A frontier at 100 TB cannot fetch everything next epoch; production
crawlers order hosts/URLs by link-graph importance (PageRank over the
host graph is the classic Common-Crawl-adjacent ranking). This module
provides:

- ``pagerank`` — power iteration over an edge DataFrame in FIXED-POINT
  INTEGER arithmetic: every rank is an integer number of 1e-12 units of
  probability mass, contributions are integer divisions, and damping is
  an integer multiply-divide. Integer sums are associative, so results
  are bit-identical under ANY partitioning/summation order — the same
  reason the DuckDB oracle can hash-match it exactly (float PageRank
  cannot cross the comparison; VERDICT round-1 design rule).
- ``host_edges`` — collapse URL→URL link edges to a weighted host
  graph (hosts are ~3 orders of magnitude fewer than URLs; ranking at
  host grain is what a politeness-budgeted dequeue can actually use:
  join the host rank into dequeue ordering as the cross-host priority).

Scale notes:
- The edge table is the big data: it is hash-partitioned by ``src``
  once and persisted (with per-src out-degree precomputed onto the edge
  row), so each iteration shuffles only the RANK table (one row per
  node) into the edges' existing partitioning, plus one groupBy(dst)
  aggregate with map-side partials.
- Each iteration ends in an eager ``localCheckpoint`` — the lineage
  stays O(1) like connected_components, not O(iterations).
- Dangling mass (nodes with no out-links) is dropped, the standard
  "remove dangling" simplification; ranks still order nodes correctly
  for prioritization, which is the crawl use.
"""

from __future__ import annotations

import math
from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "pagerank",
    "label_propagation",
    "host_edges",
    "resolve_redirects",
    "canonical_edges",
    "anchor_text_profile",
    "inlink_stats",
    "host_triangles",
    "trustrank",
    "spam_mass",
    "spam_mass_scores",
    "prepare_edges",
    "PAGERANK_SCALE",
]

#: 1.0 of probability mass in fixed-point units (1e-12 resolution).
PAGERANK_SCALE = 10**12


def prepare_edges(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """The shared pre-iteration edge build: out-degree denormalized
    onto the edge row, hash-partitioned by ``src`` once, persisted and
    materialized. Both :func:`pagerank` and :func:`trustrank` accept
    the result via ``prepared=`` so a composition like
    :func:`spam_mass_scores` pays the edge shuffle ONCE for both
    propagations. Caller owns the persist (unpersist when done)."""
    deg = edges.groupBy(src).agg(F.count("*").alias("_deg"))
    edeg = (
        edges.select(src, dst)
        .join(deg, src)
        .repartition(F.col(src))
        .persist()
    )
    edeg.count()
    return edeg


def host_edges(links: DataFrame, src_col: str = "src_url", dst_col: str = "url") -> DataFrame:
    """URL→URL link rows collapsed to a weighted host graph:
    (src, dst, weight) with self-host edges kept (intra-site links are
    real mass; drop them upstream if unwanted). One aggregate, map-side
    combined."""
    # try_parse_url: under ANSI mode plain parse_url THROWS on a
    # malformed URL (routine in real outlink data) instead of nulling —
    # the isNotNull filter below only works with the try_ variant
    host = lambda c: F.try_parse_url(F.col(c), F.lit("HOST"))  # noqa: E731
    return (
        links.select(host(src_col).alias("src"), host(dst_col).alias("dst"))
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count("*").alias("weight"))
    )


def pagerank(
    edges: DataFrame,
    num_iters: int = 10,
    damping_pct: int = 85,
    scale: int = PAGERANK_SCALE,
    src: str = "src",
    dst: str = "dst",
    checkpoint_interval: int = 4,
    prepared: Optional[DataFrame] = None,
) -> DataFrame:
    """Fixed-point integer PageRank. Returns (node, rank) where rank is
    in ``1/scale`` units of probability mass. ``prepared`` is an
    optional :func:`prepare_edges` result to share across propagations
    (the caller then owns its persist lifecycle).

    The exact recurrence (both engines implement it verbatim):

        r_0(v)     = scale // N
        c_i(v)     = Σ over in-edges (u→v) of  r_i(u) // out_deg(u)
        r_{i+1}(v) = ((100 - damping_pct) * (scale // N)) // 100
                     + (damping_pct * c_i(v)) // 100

    All ``//`` are integer floor divisions on non-negative values, all
    sums are integer sums — no float enters the computation, so the
    result is independent of partitioning, summation order, and engine.
    """
    nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()  # also materializes the persist
    if n == 0:
        return nodes.select("node", F.lit(0).cast("long").alias("rank"))
    r0 = scale // n
    base = ((100 - damping_pct) * r0) // 100
    # out-degree denormalized onto the edge row + partitioned by src
    # ONCE: iterations reuse this exchange, only ranks move.
    edeg = prepared if prepared is not None else prepare_edges(edges, src, dst)
    ranks = nodes.select("node", F.lit(r0).cast("long").alias("rank"))
    for it in range(num_iters):
        contrib = (
            edeg.join(ranks.withColumnRenamed("node", src), src)
            .select(F.col(dst).alias("node"), F.expr("rank div _deg").alias("_c"))
            .groupBy("node")
            .agg(F.sum("_c").alias("_s"))
        )
        ranks = nodes.join(contrib, "node", "left").select(
            "node",
            (
                F.lit(base)
                + F.expr(f"(coalesce(_s, 0L) * {damping_pct}) div 100")
            ).cast("long").alias("rank"),
        )
        # truncate lineage every few iterations (same pattern as
        # connected_components) so the plan stays O(interval) deep; an
        # eager checkpoint is a full job, so it's batched rather than
        # paid per iteration. The DAG between checkpoints is linear
        # (each rank table feeds exactly the next iteration), so lazy
        # chaining never recomputes work.
        if (it + 1) % checkpoint_interval == 0 and it + 1 < num_iters:
            ranks = ranks.localCheckpoint(eager=True)
    ranks = ranks.localCheckpoint(eager=True)
    if prepared is None:
        edeg.unpersist()
    nodes.unpersist()
    return ranks


def label_propagation(
    edges: DataFrame,
    num_iters: int = 4,
    src: str = "src",
    dst: str = "dst",
    checkpoint_interval: int = 4,
) -> DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007) over the
    UNDIRECTED host graph: community detection for link farms, mirror
    networks, and boosting rings — the cluster-shaped complement to
    :func:`host_triangles`' local density signal.

    Determinism contract (the repo-wide rule): classic LPA breaks ties
    randomly and updates asynchronously; here every node starts as its
    own label and each round adopts the most frequent label among its
    neighbors PLUS ITSELF (the self-vote damps the 2-cycles synchronous
    LPA is prone to), ties to the SMALLEST label, all nodes in lockstep
    for exactly ``num_iters`` rounds — a pure function of the edge
    set, bit-identical under any partitioning and replayable in SQL
    (the oracle unrolls the rounds). Remaining oscillations on
    pathological symmetric regions are a defined output (fixed round
    count); community cores stabilize within a few rounds.

    Scale shape: the symmetrized edge list is repartitioned on ``src``
    ONCE and persisted — each round pays one shuffle-free edge⋈label
    join on that layout, a map-side-combined (node, label) count, and
    a (node)-keyed argmin — label-table-sized exchanges only, the
    O(E) side never moves again. Eager ``localCheckpoint`` every
    ``checkpoint_interval`` rounds truncates lineage (the pagerank
    pattern). Output: (node, community).
    """
    und = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .union(edges.select(F.col(dst).alias("s"), F.col(src).alias("d")))
        .filter(F.col("s") != F.col("d"))
        .distinct()
    )
    adj = und.repartition(F.col("s")).persist()
    adj.count()
    labels = adj.select(F.col("s").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    for it in range(num_iters):
        incoming = adj.join(labels.withColumnRenamed("node", "s"), "s").select(
            F.col("d").alias("node"), "label"
        )
        counts = (
            incoming.unionByName(labels)  # self-vote
            .groupBy("node", "label")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        labels = (
            counts.groupBy("node")
            .agg(
                F.min(
                    F.struct(
                        (-F.col("cnt")).alias("neg_cnt"),
                        F.col("label").alias("l"),
                    )
                ).alias("best")
            )
            .select("node", F.col("best.l").alias("label"))
        )
        if (it + 1) % checkpoint_interval == 0 and it + 1 < num_iters:
            labels = labels.localCheckpoint(eager=True)
    labels = labels.localCheckpoint(eager=True)
    adj.unpersist()
    return labels.select("node", F.col("label").alias("community"))


def resolve_redirects(
    edges: DataFrame,
    max_hops: int = 32,
    src: str = "url",
    dst: str = "target",
) -> DataFrame:
    """Resolve redirect / rel=canonical chains to their terminal URL by
    POINTER DOUBLING: ``ceil(log2(max_hops))`` self-joins instead of one
    join per hop, so a 32-hop budget costs 5 shuffles, not 32 — the only
    way chain-following survives a 100 TB link table.

    Input: one pointer per URL (duplicate rows collapse to the
    lexicographic-min target, deterministically). Output one row per
    redirecting URL:

      (url, final_url, hops, resolved)

    ``resolved`` is true iff the chain reaches a non-redirecting URL in
    ≤ ``max_hops`` steps; ``final_url``/``hops`` are NULL otherwise
    (cycles — including self-loops — and over-long chains). Hop counts
    are exact: composition m∘m maps "node at distance h" to "node at
    distance h+h′", and a pointer row exists only while the cursor is
    still a redirect source, so doubling can never step past a terminal.

    The reference engine follows redirects one page at a time inside
    its fetch loop (implicit in requests' ``allow_redirects``); this is
    the set-oriented equivalent over an already-materialized redirect /
    canonical edge table.
    """
    m = (
        edges.groupBy(F.col(src).alias("url"))
        .agg(F.min(F.col(dst)).alias("nxt"))
        .withColumn("hops", F.lit(1).cast("int"))
        .localCheckpoint(eager=True)
    )
    iters = max(1, math.ceil(math.log2(max(2, max_hops))))
    for _ in range(iters):
        b = m.select(
            F.col("url").alias("_burl"),
            F.col("nxt").alias("_bnxt"),
            F.col("hops").alias("_bhops"),
        )
        # rows whose nxt is already terminal miss the join and pass
        # through unchanged — no done/active split needed, the join
        # itself is the fixpoint test
        m = (
            m.join(b, m["nxt"] == b["_burl"], "left")
            .select(
                "url",
                F.coalesce("_bnxt", "nxt").alias("nxt"),
                (F.col("hops") + F.coalesce("_bhops", F.lit(0))).alias("hops"),
            )
            .localCheckpoint(eager=True)  # O(1) lineage across doublings
        )
    srcs = m.select(F.col("url").alias("_s"))
    out = m.join(srcs, m["nxt"] == srcs["_s"], "left")
    ok = F.col("_s").isNull() & (F.col("hops") <= F.lit(max_hops))
    return out.select(
        "url",
        F.when(ok, F.col("nxt")).alias("final_url"),
        F.when(ok, F.col("hops")).cast("int").alias("hops"),
        ok.alias("resolved"),
    )


#: rel=canonical fast-path patterns (attribute order varies in the
#: wild; both orders matched, first hit wins).
_CANON_RE_REL_FIRST = r"""(?i)<link[^>]*rel=["']canonical["'][^>]*href=["']([^"']+)["']"""
_CANON_RE_HREF_FIRST = r"""(?i)<link[^>]*href=["']([^"']+)["'][^>]*rel=["']canonical["']"""


def canonical_edges(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """``<link rel="canonical" href=…>`` pointers as a (url, target)
    edge table — feed into :func:`resolve_redirects` to collapse
    canonical chains. Native ``regexp_extract`` (the standard crawler
    fast-path: one anchored scan, no DOM build, whole-stage codegen);
    self-pointers and pages without the tag are dropped."""
    html = F.col(html_col).cast("string")
    hit = F.coalesce(
        F.nullif(F.regexp_extract(html, _CANON_RE_REL_FIRST, 1), F.lit("")),
        F.nullif(F.regexp_extract(html, _CANON_RE_HREF_FIRST, 1), F.lit("")),
    )
    return (
        pages.select(F.col(url_col).alias("url"), hit.alias("target"))
        .filter(F.col("target").isNotNull() & (F.col("target") != F.col("url")))
    )


def anchor_text_profile(
    edges: DataFrame,
    target_col: str = "target",
    anchor_col: str = "anchor",
    k: int = 5,
) -> DataFrame:
    """Inbound anchor-text term profile per link target — the classic
    web-graph text feature (anchor terms describe the TARGET better
    than its own page does; every large-scale indexer aggregates them
    — Brin & Page 1998 §2.2 propagate anchor text to the linked page).

    Tokenization reuses the engine's keyword tokenizer (lower, split
    on non-word, drop stop words and len<=2) so anchor profiles and
    document keywords live in one vocabulary. Returns

      (target, word, freq, rank)

    with ``rank`` dense over (freq desc, word asc) per target, cut at
    ``k`` — deterministic under any partitioning.

    Scale shape: explode → two-phase hash aggregate on
    (target, word) → one rank window partitioned by target. Popular
    targets (the skew risk) are bounded by their distinct-anchor-term
    vocabulary, not their inlink count, because the aggregate
    map-side-combines before the shuffle.
    """
    from .textops import keyword_tokens_col

    words = edges.select(
        F.col(target_col).alias("target"),
        F.explode(keyword_tokens_col(F.col(anchor_col))).alias("word"),
    )
    counts = words.groupBy("target", "word").agg(F.count("*").alias("freq"))
    from pyspark.sql import Window

    # hot-target note (round-4 skew audit): the window input is the
    # AGGREGATED (target, word) grain — a popular page's partition is
    # bounded by its distinct anchor VOCABULARY, not its inlink count
    # (the map-side-combined groupBy above absorbed the instance skew)
    win = Window.partitionBy("target").orderBy(F.desc("freq"), F.asc("word"))
    return (
        counts.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
        .select("target", "word", "freq", "rank")
    )


def inlink_stats(
    edges: DataFrame,
    src_col: str = "src",
    target_col: str = "target",
    exact: bool = True,
) -> DataFrame:
    """Per-target inbound link counts: total inlinks, distinct source
    pages, distinct source HOSTS (the anti-spam signal — a thousand
    links from one host are one vote). One two-phase aggregate; at
    100 TB pass ``exact=False`` for HLL sketches instead of exact
    distinct expands."""
    host = F.try_parse_url(F.col(src_col), F.lit("HOST"))
    cd = (
        (lambda c: F.count_distinct(c))
        if exact
        else (lambda c: F.approx_count_distinct(c))
    )
    return edges.groupBy(F.col(target_col).alias("target")).agg(
        F.count("*").alias("n_inlinks"),
        cd(F.col(src_col)).cast("long").alias("n_src_pages"),
        cd(host).cast("long").alias("n_src_hosts"),
    )


def host_triangles(
    edges: DataFrame, src: str = "src_host", dst: str = "dst_host"
) -> DataFrame:
    """Triangle count + local clustering coefficient per host over the
    undirected host link graph: ``(host, degree, triangles, cc_ppm)``.

    Mutual-linking density separates organic web neighborhoods from
    link farms (spam rings are near-cliques: cc ~ 1; organic hosts sit
    far lower) — a crawl-prioritization signal alongside ``pagerank``
    and ``inlink_stats``.

    Algorithm: degree-ordered wedge closing (the "compact-forward" /
    Latapy 2008 shape). Edges canonicalize undirected (least, greatest,
    distinct, no self-loops); each edge orients from the (degree, host)
    -smaller endpoint to the larger; wedges join oriented edges on the
    middle vertex and close against the oriented edge set. Ordering by
    degree bounds the wedge count by O(m^1.5) regardless of skew — a
    hub of degree d generates ZERO wedges as a source unless its
    neighbors out-rank it, instead of d^2. Each triangle materializes
    exactly once, then explodes to its 3 corners for the per-host
    count. cc_ppm = 2 * triangles * 1e6 DIV (deg * (deg - 1)) — exact
    integer floor, DuckDB-replayable.

    Scale shape: two shuffles over the oriented edge list (wedge join +
    closing semi-join) and broadcast-sized degree/count tables back
    onto hosts; the URL-grain corpus never enters — collapse through
    ``host_edges`` first.
    """
    a = F.least(F.col(src), F.col(dst))
    b = F.greatest(F.col(src), F.col(dst))
    und = (
        edges.select(a.alias("a"), b.alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("v"))
        .unionByName(und.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("deg"))
    )
    # orient low → high in (deg, host) order
    ranked = (
        und.join(F.broadcast(deg).withColumnRenamed("v", "a"), "a")
        .withColumnRenamed("deg", "deg_a")
        .join(
            F.broadcast(deg).withColumnRenamed("v", "b"), "b"
        )
        .withColumnRenamed("deg", "deg_b")
    )
    fwd = ranked.select(
        F.when(
            (F.col("deg_a") < F.col("deg_b"))
            | ((F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))),
            F.struct(F.col("a").alias("u"), F.col("b").alias("w")),
        )
        .otherwise(F.struct(F.col("b").alias("u"), F.col("a").alias("w")))
        .alias("e")
    ).select("e.u", "e.w")
    # wedges u→v→w close iff u→w is an oriented edge
    e1 = fwd.select(F.col("u"), F.col("w").alias("v"))
    e2 = fwd.select(F.col("u").alias("v"), F.col("w"))
    wedges = e1.join(e2, "v")
    tris = wedges.join(fwd, ["u", "w"], "left_semi")  # (u, v, w) triangles
    corner = (
        tris.select(F.explode(F.array("u", "v", "w")).alias("v"))
        .groupBy("v")
        .agg(F.count("*").alias("triangles"))
    )
    return (
        deg.join(corner, "v", "left")
        .select(
            F.col("v").alias("host"),
            F.col("deg").cast("long").alias("degree"),
            F.coalesce(F.col("triangles"), F.lit(0)).cast("long").alias(
                "triangles"
            ),
        )
        .withColumn(
            "cc_ppm",
            F.expr(
                "CASE WHEN degree >= 2 THEN 2 * triangles * 1000000 "
                "DIV (degree * (degree - 1)) ELSE CAST(0 AS BIGINT) END"
            ),
        )
    )


# ---------------------------------------------------------------------------
# OPIC — Adaptive On-line Page Importance Computation
# ---------------------------------------------------------------------------

OPIC_SCALE = 10**12


def opic_epochs(
    edges: DataFrame,
    seeds: DataFrame,
    epochs: int = 3,
    scale: int = OPIC_SCALE,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
) -> DataFrame:
    """OPIC (Abiteboul, Preda & Cobena, WWW 2003): the ONLINE page-
    importance algorithm production crawlers use for frontier priority
    — unlike PageRank it needs no converged offline pass; importance
    accumulates as the crawl proceeds, so the frontier can be
    prioritized mid-crawl by each page's current cash.

    Batch-epoch variant (each epoch "fetches" every page holding
    cash, matching this engine's epoch model): a page's cash moves to
    its history and is split equally over its distinct outlinks
    (integer floor share; the remainder goes to the smallest outlink —
    deterministic and cash-conserving); dangling pages return their
    cash to the seed set (the paper's virtual-root page), split the
    same way. Total cash is EXACTLY ``scale`` after every epoch, all
    arithmetic is integer, so the run is bit-reproducible across
    partitionings and engines (the DuckDB oracle unrolls the same
    epochs relationally).

    Importance estimate after t epochs = history + cash.
    Returns (node, cash, history) for every node ever touched.

    Scale shape: out-degrees are denormalized onto the edge rows and
    partitioned by ``src`` ONCE (the PageRank trick — iterations move
    only the cash column through that exchange); per epoch there is
    one join + one aggregate keyed by dst; the dangling pool is a
    1-row aggregate cross-joined back (never collected); lineage is
    truncated per epoch with a localCheckpoint.
    """
    e = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d")).distinct()
    deg = e.groupBy("_s").agg(
        F.count("*").alias("_deg"), F.min("_d").alias("_first")
    )
    edeg = e.join(deg, "_s").repartition(F.col("_s")).persist()
    edeg.count()

    sd = seeds.select(F.col(node_col).alias("node")).distinct().persist()
    n_seeds = sd.count()
    if n_seeds == 0:
        raise ValueError("opic_epochs needs at least one seed")
    share = scale // n_seeds
    rem = scale % n_seeds
    min_seed = sd.agg(F.min("node")).collect()[0][0]
    state = sd.select(
        "node",
        (F.lit(share) + F.when(F.col("node") == min_seed, rem).otherwise(0))
        .cast("long")
        .alias("cash"),
        F.lit(0).cast("long").alias("history"),
    )

    for t in range(epochs):
        active = state.filter(F.col("cash") > 0)
        # cash flowing along edges: floor share per distinct outlink,
        # remainder to the smallest outlink (deterministic, conserving)
        flows = (
            active.join(edeg, active["node"] == edeg["_s"])
            .select(
                F.col("_d").alias("node"),
                (
                    F.expr("cash div _deg")
                    + F.when(
                        F.col("_d") == F.col("_first"), F.expr("cash % _deg")
                    ).otherwise(0)
                ).cast("long").alias("_in"),
            )
            .groupBy("node")
            .agg(F.sum("_in").alias("_in"))
        )
        # dangling pages: cash returns to the seeds (virtual root)
        pool = (
            active.join(edeg.select("_s").distinct(),
                        active["node"] == F.col("_s"), "left_anti")
            .agg(F.coalesce(F.sum("cash"), F.lit(0)).cast("long").alias("_pool"))
        )
        seed_in = sd.crossJoin(F.broadcast(pool)).select(
            "node",
            (
                F.expr(f"_pool div {n_seeds}")
                + F.when(
                    F.col("node") == min_seed, F.expr(f"_pool % {n_seeds}")
                ).otherwise(0)
            ).cast("long").alias("_in"),
        )
        inflow = flows.unionByName(seed_in).groupBy("node").agg(
            F.sum("_in").alias("_in")
        )
        state = (
            state.join(inflow, "node", "full_outer")
            .select(
                "node",
                F.coalesce(F.col("_in"), F.lit(0)).cast("long").alias("cash"),
                (
                    F.coalesce(F.col("history"), F.lit(0))
                    + F.coalesce(F.col("cash"), F.lit(0))
                ).cast("long").alias("history"),
            )
            .localCheckpoint(eager=True)
        )
    edeg.unpersist()
    sd.unpersist()
    return state


def opic_host_priors(state: DataFrame, url_hosts: DataFrame) -> DataFrame:
    """Roll OPIC importance (history + cash) up to host grain for the
    dequeue's ``host_priority`` interface
    (``frontier.core.dequeue(host_priority=...)``) — the same seam
    :func:`pagerank` host priors plug into, but refreshable EVERY
    epoch because OPIC importance is already online (no converged
    offline pass to wait for).

    ``url_hosts``: (node, host) mapping for the state's nodes.
    Returns (host, rank) with rank = Σ (history + cash), host-grained
    (broadcast-sized by construction)."""
    return (
        state.join(url_hosts, "node")
        .groupBy("host")
        .agg(F.sum(F.col("history") + F.col("cash")).alias("rank"))
    )


# ---------------------------------------------------------------------------
# HITS — hubs and authorities (integer fixed-point)
# ---------------------------------------------------------------------------

HITS_SCALE = 10**6


def hits(
    edges: DataFrame,
    num_iters: int = 5,
    scale: int = HITS_SCALE,
    src: str = "src",
    dst: str = "dst",
    checkpoint_interval: int = 1,
) -> DataFrame:
    """Kleinberg's HITS in exact integer arithmetic. Link farms score
    as mutually-reinforcing hub/authority near-cliques, which is why
    crawl-hygiene pipelines run it next to PageRank (a page farm can
    inflate in-degree but not authority backed by genuine hubs).

    The float algorithm L2-normalizes per iteration; here each half-
    step instead rescales by the CURRENT MAX (computed relationally as
    a 1-row aggregate, cross-joined back — the OPIC pool trick):

        a'(v) = Σ over (u→v) of h(u);   a(v) = a'(v)·scale // max(a')
        h'(u) = Σ over (u→v) of a(v);   h(u) = h'(u)·scale // max(h')

    Max-rescaling preserves the ranking and the fixed point up to
    floor rounding, keeps every value in [0, scale], and — unlike an
    L2 norm — is exactly representable in integer SQL, so the DuckDB
    oracle replays every iteration bit-for-bit. The rescale multiply
    needs max_in_degree × scale² < 2^63: with the default 10^6 scale
    that holds to ~9×10^6 in-links per node; beyond that, pre-divide
    the raw sums by (mx // scale + 1) instead (same ranking, one extra
    floor).

    Returns (node, hub, auth) for every node in the edge set.

    Scale shape: identical to :func:`pagerank` — edges partitioned
    once, each half-step is one join + one map-side-combined aggregate
    keyed on the receiving end; the max is a 1-row aggregate (never
    collected); lineage localCheckpoint-truncated every
    ``checkpoint_interval`` iterations. Default 1 (every iteration) is
    MEASURED right here, unlike pagerank's interval-4: each rescale's
    broadcast max re-evaluates the full state lineage, so skipping a
    checkpoint re-executes the prior iteration's two joins several
    times over (3× wall measured at interval 2 on sf0.1); values are
    identical at any interval.
    """
    e = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d")).distinct()
    e = e.repartition(F.col("_s")).persist()
    e.count()
    nodes = (
        e.select(F.col("_s").alias("node"))
        .union(e.select(F.col("_d").alias("node")))
        .distinct()
        .persist()
    )
    state = nodes.select(
        "node",
        F.lit(scale).cast("long").alias("hub"),
        F.lit(scale).cast("long").alias("auth"),
    )

    def _rescale(df, col):
        mx = df.agg(F.max(col).alias("_mx"))
        return (
            df.crossJoin(F.broadcast(mx))
            .withColumn(
                col,
                F.when(F.col("_mx") > 0, F.expr(f"{col} * {scale} div _mx"))
                .otherwise(F.lit(0))
                .cast("long"),
            )
            .drop("_mx")
        )

    for it in range(num_iters):
        # authority half-step: a'(v) = Σ h(u) over in-edges
        a = (
            e.join(state.select(F.col("node").alias("_s"), "hub"), "_s")
            .groupBy(F.col("_d").alias("node"))
            .agg(F.sum("hub").alias("auth_raw"))
        )
        state = (
            state.drop("auth")
            .join(a, "node", "left")
            .withColumn("auth", F.coalesce("auth_raw", F.lit(0)).cast("long"))
            .drop("auth_raw")
        )
        state = _rescale(state, "auth")
        # hub half-step: h'(u) = Σ a(v) over out-edges (the new auths)
        h = (
            e.join(state.select(F.col("node").alias("_d"), "auth"), "_d")
            .groupBy(F.col("_s").alias("node"))
            .agg(F.sum("auth").alias("hub_raw"))
        )
        state = (
            state.drop("hub")
            .join(h, "node", "left")
            .withColumn("hub", F.coalesce("hub_raw", F.lit(0)).cast("long"))
            .drop("hub_raw")
        )
        state = _rescale(state, "hub")
        if (it + 1) % checkpoint_interval == 0 or it == num_iters - 1:
            state = state.localCheckpoint(eager=True)
    e.unpersist()
    nodes.unpersist()
    return state.select("node", "hub", "auth")


# ---------------------------------------------------------------------------
# TrustRank — seed-personalized PageRank (integer fixed-point)
# ---------------------------------------------------------------------------


def trustrank(
    edges: DataFrame,
    seeds: DataFrame,
    num_iters: int = 10,
    damping_pct: int = 85,
    scale: int = PAGERANK_SCALE,
    src: str = "src",
    dst: str = "dst",
    seed_col: str = "node",
    checkpoint_interval: int = 4,
    prepared: Optional[DataFrame] = None,
) -> DataFrame:
    """TrustRank (Gyongyi, Garcia-Molina & Pedersen, VLDB 2004):
    PageRank with the teleport vector concentrated on a hand-vetted
    trusted seed set, the standard web-spam demotion signal — trust
    flows out of the seeds along links and decays with distance, so a
    link farm unreachable from any trusted page scores exactly 0 no
    matter how densely it links to itself (where plain PageRank still
    pays it the teleport floor). Crawl use: demote/deprioritize hosts
    whose trust/pagerank ratio is low (spam mass, paper §6).

    Same fixed-point integer arithmetic as :func:`pagerank` (1/scale
    probability units, floor divisions, integer sums — bit-identical
    under any partitioning, DuckDB-oracle-replayable):

        r_0(v)     = scale // |S|                        if v in S else 0
        c_i(v)     = sum over in-edges (u->v) of  r_i(u) // out_deg(u)
        r_{i+1}(v) = (v in S ? ((100-damping_pct)*(scale//|S|))//100 : 0)
                     + (damping_pct * c_i(v)) // 100

    ``seeds``: one ``seed_col`` row per trusted node (deduped here);
    seeds absent from the edge set still hold and emit no mass but
    count toward |S| and keep their teleport share — the paper's
    static trust vector. Dangling mass is dropped, matching
    :func:`pagerank`'s simplification (ordering-preserving).

    Scale shape identical to :func:`pagerank`: the edge table is
    partitioned by ``src`` once with out-degree denormalized on; each
    iteration moves only the rank table plus one map-side-combined
    groupBy(dst); the seed flag is a 0/1 column carried on the node
    table, so the per-iteration base term is a multiply, not a join;
    lineage is localCheckpoint-truncated every ``checkpoint_interval``.
    """
    sd = seeds.select(F.col(seed_col).alias("node")).distinct().persist()
    n_seeds = sd.count()
    nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .union(sd.select("node"))
        .distinct()
    )
    if n_seeds == 0:
        out = nodes.select("node", F.lit(0).cast("long").alias("rank"))
        sd.unpersist()
        return out
    r0 = scale // n_seeds
    base = ((100 - damping_pct) * r0) // 100
    flagged = (
        nodes.join(sd.withColumn("_seed", F.lit(1)), "node", "left")
        .select("node", F.coalesce(F.col("_seed"), F.lit(0)).alias("_seed"))
        .persist()
    )
    flagged.count()
    edeg = prepared if prepared is not None else prepare_edges(edges, src, dst)
    ranks = flagged.select(
        "node", (F.col("_seed") * F.lit(r0)).cast("long").alias("rank")
    )
    for it in range(num_iters):
        contrib = (
            edeg.join(ranks.withColumnRenamed("node", src), src)
            .select(F.col(dst).alias("node"), F.expr("rank div _deg").alias("_c"))
            .groupBy("node")
            .agg(F.sum("_c").alias("_s"))
        )
        ranks = flagged.join(contrib, "node", "left").select(
            "node",
            (
                F.col("_seed") * F.lit(base)
                + F.expr(f"(coalesce(_s, 0L) * {damping_pct}) div 100")
            ).cast("long").alias("rank"),
        )
        if (it + 1) % checkpoint_interval == 0 and it + 1 < num_iters:
            ranks = ranks.localCheckpoint(eager=True)
    ranks = ranks.localCheckpoint(eager=True)
    if prepared is None:
        edeg.unpersist()
    flagged.unpersist()
    sd.unpersist()
    return ranks


def spam_mass(
    pr: DataFrame, tr: DataFrame, scale: int = PAGERANK_SCALE
) -> DataFrame:
    """Relative spam mass (TrustRank paper §6): the fraction of a
    node's PageRank NOT accounted for by trust flowing from the seed
    set, in ppm — ``(pr - tr) * 1e6 // pr`` (clamped at 0 for nodes
    whose trust exceeds their rank share, which floor rounding and
    seed locality make possible). High spam-mass nodes are the crawl
    blocklist candidates. One broadcast-friendly equi-join on node;
    integer end-to-end."""
    p = pr.select("node", F.col("rank").alias("_pr"))
    t = tr.select("node", F.col("rank").alias("_tr"))
    return (
        p.join(t, "node", "left")
        .select(
            "node",
            F.col("_pr").alias("rank_fp"),
            F.coalesce(F.col("_tr"), F.lit(0)).cast("long").alias("trust_fp"),
            F.greatest(
                F.lit(0),
                F.expr("(_pr - coalesce(_tr, 0L)) * 1000000 div greatest(_pr, 1L)"),
            ).cast("long").alias("spam_mass_ppm"),
        )
    )


def spam_mass_scores(
    edges: DataFrame,
    seeds: DataFrame,
    num_iters: int = 10,
    damping_pct: int = 85,
    scale: int = PAGERANK_SCALE,
    src: str = "src",
    dst: str = "dst",
    seed_col: str = "node",
) -> DataFrame:
    """:func:`spam_mass` end-to-end: PageRank + TrustRank + the ppm
    join. The two propagations share ONE :func:`prepare_edges` build
    (one edge shuffle, one persisted partitioning instead of two) and
    run from two driver threads so their per-iteration jobs interleave
    on the cluster — each chain alone underuses the executors at the
    rank-table grain, and the integer fixed-point arithmetic makes the
    result bit-identical regardless of job interleaving. Both chains
    end eagerly materialized (localCheckpoint), so the shared edge
    cache is released before returning the lazy final join."""
    from concurrent.futures import ThreadPoolExecutor

    edeg = prepare_edges(edges, src, dst)
    try:
        with ThreadPoolExecutor(2) as pool:
            f_pr = pool.submit(
                pagerank, edges, num_iters, damping_pct, scale, src, dst,
                prepared=edeg,
            )
            f_tr = pool.submit(
                trustrank, edges, seeds, num_iters, damping_pct, scale,
                src, dst, seed_col, prepared=edeg,
            )
            pr, tr = f_pr.result(), f_tr.result()
    finally:
        edeg.unpersist()
    return spam_mass(pr, tr, scale)


def kcore(
    edges: DataFrame,
    k: int,
    num_rounds: int = 8,
    src: str = "src",
    dst: str = "dst",
    checkpoint_interval: int = 4,
) -> DataFrame:
    """k-core decomposition by iterated degree peeling (Seidman 1983;
    Batagelj–Zaveršnik is the sequential form) over the UNDIRECTED
    host graph: repeatedly delete every node whose surviving degree is
    < k until the graph stops shrinking. What remains is the k-core —
    the "everyone here has ≥ k interlinked neighbors" subgraph that
    link farms and boosting rings inhabit (a paid-links ring is a
    dense core; organic periphery peels away in the first rounds).
    The CORE-shaped complement to :func:`host_triangles` (local
    density) and :func:`label_propagation` (partition shape).

    Determinism: peeling is synchronous-lockstep (all sub-k nodes
    drop together each round), so the result is a pure function of
    the edge set — no ordering, no RNG — and the fixpoint is reached
    within ``num_rounds`` or the round-``num_rounds`` state is
    returned (defined output, LPA-style; the oracle unrolls the same
    rounds — once the fixpoint lands, extra rounds are identity, so
    early stop and a longer unroll agree).

    Returns (node, degree) for the surviving core — ``degree`` is the
    node's degree WITHIN the core (≥ k by construction).

    Scale shape: symmetrized distinct edges repartition on ``s`` once;
    each round is one map-side-combined degree aggregate + two
    node-keyed semi-joins restricting the edge list — node-table-sized
    exchanges; the O(E) list shrinks monotonically and is checkpointed
    every ``checkpoint_interval`` rounds (lineage O(1), dead rounds'
    blocks freed). Early convergence is detected from the count the
    round already pays, so a converged graph costs no extra job.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    und = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .union(edges.select(F.col(dst).alias("s"), F.col(src).alias("d")))
        .filter(F.col("s") != F.col("d"))
        .distinct()
    )
    cur = und.repartition(F.col("s")).localCheckpoint(eager=True)
    prev_nodes = -1
    for rnd in range(num_rounds):
        deg = cur.groupBy("s").agg(F.count("*").cast("long").alias("degree"))
        keep = deg.filter(F.col("degree") >= k).select("s")
        n_keep = keep.count()
        if n_keep == prev_nodes or n_keep == 0:
            break
        prev_nodes = n_keep
        cur = cur.join(keep, "s", "left_semi").join(
            keep.withColumnRenamed("s", "d"), "d", "left_semi"
        )
        if checkpoint_interval and (rnd + 1) % checkpoint_interval == 0:
            cur = cur.localCheckpoint(eager=True)
    final = cur.groupBy("s").agg(
        F.count("*").cast("long").alias("degree")
    )
    return final.filter(F.col("degree") >= k).select(
        F.col("s").alias("node"), "degree"
    )


def url_equivalence_classes(edges: DataFrame, src: str = "src_url",
                            dst: str = "dst_url") -> DataFrame:
    """One identity per page: the same document lives under many URLs
    — redirect hops (:func:`resolve_redirects`' edge list),
    ``rel=canonical`` declarations (:func:`canonical_edges`), learned
    tracking-param rewrites (``frontier.params.apply_param_rules``
    before/after pairs), mirror paths. Union that evidence and take
    the transitive closure: every URL in a class shares ONE canonical
    identity, so the frontier holds one row, politeness charges one
    budget, and dedup keys one document where a naive crawler fetches
    the whole alias set.

    Built on :func:`~..dedup.connected_components` (large-star/
    small-star, O(log n) rounds); the class representative is the
    component label itself — the lexicographically smallest URL
    reachable, deterministic under any partitioning. Returns
    (url, canonical_url, cluster_size); singleton URLs never enter
    (feed them back with a left join + coalesce — they are their own
    identity).

    Scale shape: everything is edge-list currency (pairs of URL
    strings); the component rounds pay node-table-sized exchanges and
    the size rollup is one aggregate + join at class grain.
    """
    from .dedup import connected_components

    e = edges.select(F.col(src).alias("id_a"), F.col(dst).alias("id_b"))
    comp = connected_components(e)
    sizes = comp.groupBy("component").agg(
        F.count("*").cast("long").alias("cluster_size")
    )
    return comp.join(sizes, "component").select(
        F.col("node").alias("url"),
        F.col("component").alias("canonical_url"),
        "cluster_size",
    )


def host_moves(
    redirects: DataFrame,
    src: str = "src_url",
    dst: str = "dst_url",
    min_pages: int = 5,
    min_share_ppm: int = 800_000,
) -> DataFrame:
    """Site-migration detection from redirect evidence: when most of a
    host's redirecting URLs point at ONE other host, the site moved
    (the mass-301 pattern of domain changes and HTTPS/CDN migrations).
    The crawl-ops consequences are concrete: rewrite seed lists, remap
    frontier rows through :func:`url_equivalence_classes`, transfer
    the politeness/volatility history, stop charging the old host's
    budget.

    Per source host: redirecting pages counted, the DOMINANT
    destination host picked deterministically (max count, ties to the
    lexicographically smallest host), and its exact integer share;
    ``moved`` requires ≥ ``min_pages`` evidence and share ≥
    ``min_share_ppm`` (default 80%) — a link-rot scatter of one-off
    redirects never qualifies. Same-host redirects (path shuffles,
    http→https on one host) are excluded up front.

    Returns (host, dst_host, n_pages, n_to_dst, share_ppm, moved).

    Scale shape: one projection to (src_host, dst_host) pairs, one
    map-side-combined pair count, one host-grain argmax struct — the
    URL grain collapses immediately; nothing bigger than host×host
    pairs ever shuffles.
    """
    # default ports stripped (the surt_key_col discipline): without it
    # http://h:80 -> https://h:443 passes the same-host exclusion as a
    # bogus cross-host "move", and explicit-port aliases split one
    # host's evidence across two keys. Only the SCHEME-MATCHED default
    # folds: http strips :80, https strips :443 — https://h:80 and
    # http://h:443 are genuinely non-default endpoints and must stay
    # distinct hosts (they are different origins, not aliases).
    def host_of(c):
        scheme = F.lower(
            F.regexp_extract(c, r"^([a-zA-Z][a-zA-Z0-9+.\-]*)://", 1)
        )
        hostport = F.regexp_replace(
            F.regexp_extract(
                c, r"^[a-zA-Z][a-zA-Z0-9+.\-]*://([^/?#]*)", 1
            ),
            r"^[^@]*@", "",
        )
        return (
            F.when(
                scheme == "http", F.regexp_replace(hostport, r":80$", "")
            )
            .when(
                scheme == "https",
                F.regexp_replace(hostport, r":443$", ""),
            )
            .otherwise(hostport)
        )
    pairs = redirects.select(
        F.lower(host_of(F.col(src))).alias("host"),
        F.lower(host_of(F.col(dst))).alias("dst_host"),
    ).filter(F.col("host") != F.col("dst_host"))
    counts = pairs.groupBy("host", "dst_host").agg(
        F.count("*").cast("long").alias("n_to_dst")
    )
    totals = counts.groupBy("host").agg(
        F.sum("n_to_dst").cast("long").alias("n_pages"),
        F.max(
            F.struct(
                F.col("n_to_dst"),
                # invert for "ties -> smallest host" under max()
                F.col("dst_host").alias("_h"),
            )
        ).alias("_top"),
    )
    # max(struct(n, host)) breaks count ties toward the LARGEST host;
    # re-pick deterministically with a min over the tied rows instead
    top = counts.join(
        totals.select(
            "host", "n_pages", F.col("_top.n_to_dst").alias("_max_n")
        ),
        "host",
    ).filter(F.col("n_to_dst") == F.col("_max_n"))
    best = top.groupBy("host", "n_pages", "n_to_dst").agg(
        F.min("dst_host").alias("dst_host")
    )
    share = F.expr(
        "cast(n_to_dst as decimal(38,0)) * 1000000 div n_pages"
    ).cast("long")
    return best.select(
        "host",
        "dst_host",
        "n_pages",
        "n_to_dst",
        share.alias("share_ppm"),
        (
            (F.col("n_pages") >= F.lit(int(min_pages)))
            & (share >= F.lit(int(min_share_ppm)))
        ).alias("moved"),
    )
