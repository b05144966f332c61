"""The crawl-epoch engine (north rule; SURVEY.md §3, §7 Phases 0/2/3).

Each epoch is one checkpointed Spark batch:

    frontier dequeue → politeness-bucketed fetch partitions →
    parse/extract (Arrow UDFs) → dedup-merge into seen + frontier
    snapshots

The reference's sequential loop (base.py:183-216) nests fetches inside
extraction (content.py:146-229); here discovery is staged — links found
in epoch N are fetched in epoch N+1 — with ordering preserved through
``ord_key`` (frontier/core.py). "Fetching" a URL is the lookup-join
against the pages table (SURVEY.md §2.3 J2): the politeness-dequeued
batch is broadcast against the (huge) pages scan, so the fetch is one
pass over pages with no shuffle of the big side. Fetch misses model the
reference's retry (T9, tenacity ×3): attempts+1 and re-enqueue next
epoch until ``max_attempts``, then parked as ``failed`` in the seen set
(base.py:197-199 semantics, minus wall-clock sleeps).

Every epoch commits frontier/seen snapshots plus append-snapshots of
the extracted tables, and records the epoch in the manifest only after
all its snapshots are durable — so a crash mid-epoch resumes from the
previous complete epoch with no partial state (resume test §5.2-5).

**Merge-on-read frontier (bounded write amplification).** The frontier
is NOT rewritten per epoch. It is three tables:

- ``frontier_base``  — full snapshots: the seed set at init, then one
  per compaction;
- ``frontier_delta`` — per-epoch appends: retry rows + newly
  discovered links (O(delta) per epoch);
- ``frontier_tomb``  — per-epoch appends of ``(url, tomb_epoch)``
  dequeue tombstones (O(batch) per epoch).

A delta row enqueued at epoch e (``discovered_epoch = e``) is dead iff
some tombstone for its url has ``tomb_epoch > e`` — a retry re-enqueued
in the same epoch its fetch failed survives its own dequeue tombstone,
while every earlier incarnation dies. Seeds carry
``discovered_epoch = -1`` so the epoch-0 tombstone kills them. The
live view is ``(base ∪ deltas) ⟕ max(tomb_epoch) per url`` — exactly
Iceberg's MERGE-ON-READ equality deletes, and on a real cluster these
three tables map onto one Iceberg table with positional/equality
delete files. Because every tombstone kills exactly one live row, the
live count is pure footer math: ``base + Σdelta − Σtomb`` — the
drained-frontier check costs zero Spark jobs.

Compaction (Iceberg's rewrite_data_files) folds deltas+tombstones into
a new base when tombstones exceed ``compact_ratio`` of the live rows:
per-epoch frontier bytes written scale with the DELTA, and the full
|frontier| write cost is paid only every ~1/ratio epochs, amortized.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..extract.business import BusinessConfig
from ..extract.content import ContentConfig
from ..extract.ecommerce import EcommerceConfig
from ..frontier.bloom import (
    PyBloom,
    ShardedBloom,
    bloom_prefilter,
    build_bloom,
    build_sharded_bloom,
    sharded_bloom_prefilter,
)
from ..frontier.core import (
    POS_PAD,
    SEED_PAD,
    SEEN_SCHEMA,
    dequeue_ranked,
    first_discovery_wins,
    robots_filter,
    seeds_frontier,
    with_frontier_columns,
    zfill_col,
)
from ..frontier.store import SnapshotStore
from ..urlutils import canonicalize_url
from .fetchpolicy import FetchPolicy, with_fetch_metadata
from ..operators.udfs import (
    extract_businesses_df,
    extract_content_df,
    extract_products_df,
)


@dataclass
class CrawlConfig:
    epoch_seconds: float = 8.0       # politeness window per epoch
    default_delay: float = 2.0       # reference's declared delay (base.py:34)
    max_depth: int = 6               # max_pages analog (content.py:57)
    max_attempts: int = 3            # tenacity stop_after_attempt(3)
    salt_buckets: int = 8            # hot-host skew defusal (north rule)
    global_budget: Optional[int] = None
    # with global_budget set: False = greedy (best (depth, ord_key)
    # rows corpus-wide — one hot host may take the whole cap), True =
    # max-min fair water-filling of the cap across hosts
    # (frontier/fairshare.py) — no host can crowd out the others
    fair_budget: bool = False
    # broadcast the fetch batch only while it's genuinely small; above
    # this the driver-side serialize is slower than a shuffled join and
    # AQE picks the strategy
    fetch_broadcast_max: int = 50_000
    bloom_fpp: float = 0.01
    bloom_min_seen: int = 50_000     # below this the exact anti-join is cheaper
    # >1 → shard the seen-set bloom by pmod(url_hash, S)
    # (frontier/bloom.ShardedBloom). At 10^10 seen URLs a flat bitmap
    # (~12 GB) can't broadcast; shards build in one grouped pass and
    # probe per-shard. 1 (default) = flat filter, right for ≤10^8.
    bloom_shards: int = 1
    # seen-set pre-filter flavor: "bloom" (default) or "cuckoo"
    # (frontier/cuckoo.ShardedCuckoo — same prefilter contract, plus
    # TRUE DELETION so recrawl-due URLs can be evicted to look new
    # again; always sharded, using max(bloom_shards, 1) shards)
    seen_filter: str = "bloom"
    # above this frontier size, pre-rank per (host, salt) before the
    # per-host politeness window so a Zipf-hot host can't put a huge
    # share of the frontier into one window task (core.dequeue_ranked)
    skew_prerank_rows: int = 20_000_000
    # Iceberg-style maintenance: keep this many frontier BASE
    # snapshots (one per compaction). None = never expire. Lineage
    # rows stay in the manifest; only data dirs beyond the last N are
    # removed, so resume (which reads the LAST committed epoch) is
    # unaffected. Seen/articles are append deltas and never expired.
    expire_frontier_keep: Optional[int] = 4
    # merge-on-read compaction trigger: fold deltas+tombstones into a
    # new frontier_base when accumulated tombstones exceed BOTH this
    # floor and compact_ratio × live rows. The floor keeps small crawls
    # from paying a full rewrite every few epochs; the ratio bounds
    # read amplification (a scan reads ≤ 1+ratio dead rows per live
    # row) and amortizes the O(live) compaction write to
    # O(delta / ratio) per epoch.
    compact_min_tombstones: int = 250_000
    compact_ratio: float = 0.5
    # per-partition lineage (north star): per-(host, status, epoch)
    # fetch counts, derived on read from the seen deltas (zero
    # per-epoch write cost); False disables the read surface
    partition_metrics: bool = True
    # inline crawl-trap guard (frontier/traps.path_trap_filter): drop
    # discovered candidates with pathological paths (over-deep or
    # looped segments) BEFORE they cost a frontier row, a politeness
    # slot and a fetch. Zero-shuffle per-row expressions; the
    # query-explosion heuristic stays offline (url_trap_signals) and
    # feeds back via robots disallow_prefixes. Off by default —
    # reference parity first.
    trap_guard: bool = False
    trap_path_depth_max: int = 12
    trap_dup_segment_min: int = 3
    # PLD-grain epoch budget (frontier/pld.pld_budget_caps): cap each
    # registered domain (eTLD+1) to this many fetch-batch rows per
    # epoch AFTER the host-grain politeness window — IRLbot's defense
    # against subdomain flooding (a spam network minting hosts farms
    # fresh per-host budgets; all its hosts drain one PLD budget here).
    # Rows past the cap return to pending with their priority intact.
    # None = off (reference parity — the reference has no PLD notion).
    pld_budget: Optional[int] = None
    # Heritrix-style content-seen filter: pages whose body
    # (md5 of html) is byte-identical to one already processed — a
    # mirror URL, a soft-duplicate CDN copy, a session-id alias that
    # slipped canonicalization — skip extraction AND link discovery
    # (their links were discovered from the first copy) and land in
    # the seen set with status "dup". The fingerprints accumulate in
    # an append-only ``content_seen`` table, committed per epoch with
    # the same crash-safety as seen. At web scale ~20-30% of fetched
    # bodies are duplicates, so this saves the extraction compute and
    # the downstream storage for that whole slice. Off by default —
    # reference parity first (the reference re-scrapes mirrors).
    content_seen_filter: bool = False
    # REP robots meta directives (operators/structured.meta_robots):
    # pages declaring ``noindex`` are fetched and their links followed,
    # but none of their extraction rows reach the corpus tables; pages
    # declaring ``nofollow`` contribute no outlinks to the frontier.
    # One native regexp scan over the fetch batch + broadcast
    # anti-joins on the (rare) flagged rows — no extra shuffle. Off by
    # default — reference parity first (the reference never reads the
    # tag). The sequential simulator implements the same semantics
    # behind the same flag, so parity is testable.
    respect_meta_robots: bool = False
    # Heritrix-style per-page outlink cap (maxOutlinks): drop any
    # discovered link whose on-page discovery position (item_pos) is
    # >= this cap. A link-farm page minting 10^5 anchors otherwise
    # floods the frontier with one fetch; position-cap semantics (not
    # "first K surviving links") keep the rule a zero-shuffle per-row
    # predicate — no window over src_url — and make it independent of
    # any other gate's outcome. None = off (reference parity).
    max_outlinks_per_page: Optional[int] = None
    # S2/S3: request-metadata policy (UA rotation, session affinity,
    # proxy stickiness, headers) attached to each fetch batch as
    # deterministic columns; None = no metadata columns
    fetch_policy: Optional["FetchPolicy"] = None
    # hot-state carry: keep the live frontier / seen set cached across
    # epochs (lineage truncated per epoch with an eager
    # localCheckpoint) so a normal epoch never re-reads the
    # base∪deltas∖tombstones parquet chain it just wrote. Commits are
    # untouched — the store remains the durability path and resume
    # reads it cold. Above this row count the carry is dropped and
    # every epoch scans the committed snapshots instead (at that scale
    # the read amortizes; the cap bounds executor cache memory).
    # None disables the carry entirely.
    hot_state_max_rows: Optional[int] = 20_000_000
    # target rows per committed file (Iceberg's
    # write.target-file-size-bytes, in rows): each delta commit is
    # coalesce()d — a narrow clamp, never a shuffle, never an
    # increase — down to ceil(est_rows / this) write tasks, using row
    # counts the epoch already knows (n_batch, n_links, cached
    # extraction counts). Small epochs stop writing one near-empty
    # file per upstream partition (the read-back union of per-epoch
    # deltas would otherwise accumulate O(epochs × partitions) tiny
    # files); big epochs keep their full write fan-out. None disables.
    write_rows_per_file: Optional[int] = 1_000_000
    # same clamp for the WIDE extraction tables (articles/products/
    # businesses carry full text bodies, so a row is ~2-3 orders of
    # magnitude fatter than a frontier row — Iceberg sizes files by
    # bytes; this is the row-count equivalent for fat rows)
    write_rows_per_file_wide: Optional[int] = 64_000
    # incremental search-index maintenance: after each articles commit,
    # build an UNGATED postings shard over the epoch's NEWLY-indexed
    # full-article pages (doc_id = xxhash64(src_url), text = the
    # byte-identical content column) and append it + its norms rows as
    # index_shards / index_doclens deltas. search_index() merges on
    # read with the global df gates — merge(build(A), build(B)) ==
    # build(A ∪ B) EXACTLY (the postings_merge contract), so a
    # mid-crawl index equals the from-scratch batch build without ever
    # re-tokenizing old epochs. Off by default (costs one tokenize
    # pass over each epoch's new articles).
    index_articles: bool = False
    index_block_size: int = 1024
    # focused (topical) crawling — Chakrabarti's focused-crawler
    # priority as an ord_key prefix: when set, every discovered link
    # is scored by its ANCHOR TEXT's overlap with these terms (the
    # listing row's title for the same url — anchors describe the
    # TARGET, the Brin & Page signal the ranker already uses) and the
    # frontier dequeues high-relevance links first. None (default)
    # leaves crawl ordering bit-identical to the unfocused engine —
    # the scoring join never enters the plan. Because the in-batch
    # first-discovery dedup keeps min(ord_key) AFTER scoring, a url
    # discovered from several pages keeps its MOST RELEVANT anchor's
    # priority. Pagination/anchor-less links score 0 (crawled last,
    # original order preserved among themselves).
    focus_terms: Optional[List[str]] = None
    # positional incremental index (requires index_articles): the
    # per-epoch shard is built POSITIONAL (per-occurrence token
    # offsets, the Lucene PositionsEnum layout) and committed as
    # index_positions deltas; the plain index_shards shard is DERIVED
    # from it by dropping position_lists — bit-identical to the
    # build_postings shard (tested contract), so ONE tokenization pays
    # for both shapes. Enables `analyze search --phrase --from-store`:
    # exact phrase queries mid-crawl with zero re-tokenization. Off by
    # default (position arrays cost index bytes ~ token count).
    index_positions: bool = False
    # merge-on-read compaction for the incremental index (the
    # frontier_base discipline applied to index_shards): when the
    # number of delta shards since the last compacted base reaches
    # this, fold base+deltas into a new UNGATED base shard — reads
    # stay O(base + recent deltas), not O(epochs). The merge contract
    # (merge(build(A), build(B)) == build(A ∪ B)) makes the fold
    # semantically invisible.
    index_compact_max_shards: int = 8
    # persist the ranked BM25 term-weight table (top_m keyword terms
    # per doc) alongside the index at every indexing epoch: interactive
    # More-Like-This query formation becomes a PURE READ of one
    # replace-mode table instead of a per-call postings derivation.
    # Costs an integer-grain pass over the merged index per epoch
    # (same inputs the compaction fold reads; no text). Off by default.
    index_term_weights: bool = False
    index_term_weights_top_m: int = 8
    content: ContentConfig = field(
        default_factory=lambda: ContentConfig(
            selectors={}, follow_next_page=True, max_pages=10**6
        )
    )
    ecommerce: EcommerceConfig = field(default_factory=EcommerceConfig)
    business: BusinessConfig = field(default_factory=BusinessConfig)


def _gather_index_parts(spark, store, base_table, delta_table, as_of_epoch):
    """Merge-on-read gather shared by every index-table family:
    ``(parts, base_entry)`` where parts = [compacted base?] + [deltas
    committed after it]. One place owns the after_epoch boundary (a
    fix to it applies to plain postings, norms, and positions alike).
    """
    base_entry = store.latest_committed(base_table, as_of_epoch)
    parts = []
    if base_entry is not None:
        parts.append(store.read(spark, base_table, base_entry["id"]))
    deltas = store.read_committed(
        spark, delta_table, as_of_epoch,
        after_epoch=base_entry["epoch"] if base_entry else None,
    )
    if deltas is not None:
        parts.append(deltas)
    return parts, base_entry


def load_search_index(
    spark: SparkSession,
    store: "SnapshotStore",
    *,
    min_df: int = 1,
    max_df_ppm: int = 1_000_000,
    block_size: Optional[int] = None,
    as_of_epoch: Optional[int] = None,
) -> Optional[Dict]:
    """Store-standalone search-index load: merge the per-epoch UNGATED
    ``index_shards`` deltas (written by ``cfg.index_articles`` crawls)
    with the global df gates applied at merge time. Used by
    :meth:`CrawlEngine.search_index` and by ``analyze search
    --from-store`` (query a crawl's index without an engine, without a
    rebuild). Returns ``{postings, doc_lens, n_docs, t_tokens}`` or
    None when the store has no indexed epochs. ``block_size`` must
    match the writing crawl's ``cfg.index_block_size`` — pass None
    (the default) to read the writer's value back from the shard
    snapshot metadata, so a store written with a non-default block
    size merges correctly without the caller knowing the number."""
    from ..operators.textops import merge_postings

    # merge-on-read with a compacted base (cfg.index_compact_max_shards
    # crawls): O(base + recent deltas) files, never O(epochs)
    parts, base_entry = _gather_index_parts(
        spark, store, "index_base", "index_shards", as_of_epoch
    )
    dl_parts, _dl_base = _gather_index_parts(
        spark, store, "index_dl_base", "index_doclens", as_of_epoch
    )
    if not parts or not dl_parts:
        return None
    dls = dl_parts[0]
    for p in dl_parts[1:]:
        # allowMissingColumns: a pre-kw_dl store's old deltas union
        # with nulls instead of refusing
        dls = dls.unionByName(p, allowMissingColumns=True)
    if block_size is None:
        # the writer stamps cfg.index_block_size on every shard/base
        # snapshot; honor it (pre-stamp stores fall back to the
        # historical default)
        stamped = [
            s["metrics"]["block_size"]
            for t in ("index_shards", "index_base")
            for s in store.snapshots(t)
            if s.get("metrics", {}).get("block_size")
        ]
        block_size = int(stamped[-1]) if stamped else 1024
    has_kw = "kw_dl" in dls.columns
    aggs = [F.count("*").alias("n"), F.sum("dl").alias("t")]
    if has_kw:
        # keyword-corpus scalars ride the same one-row aggregate —
        # more_like_this query formation needs them, and computing
        # them here costs nothing extra
        aggs += [
            F.count_if(F.col("kw_dl") > 0).alias("kn"),
            F.sum("kw_dl").alias("kt"),
            # a pre-kw_dl store's old deltas union in as nulls: the
            # candidate-grain MLT scalars would be WRONG, so their
            # presence demotes to the full-derivation path
            F.count_if(F.col("kw_dl").isNull()).alias("knull"),
        ]
    tot = dls.agg(*aggs).collect()[0]
    if has_kw and int(tot["knull"] or 0) > 0:
        has_kw = False
    n_docs, t_tokens = int(tot["n"] or 0), int(tot["t"] or 0)
    postings = merge_postings(
        parts,
        min_df=min_df,
        max_df_ppm=max_df_ppm,
        n_docs=n_docs,
        block_size=block_size,
    )
    out = {
        "postings": postings,
        "doc_lens": dls,
        "n_docs": n_docs,
        "t_tokens": t_tokens,
    }
    # positional index (cfg.index_positions crawls): merged on read
    # UNGATED — phrase queries must see every term; df gating stays a
    # search-side decision. Coverage = the epochs crawled with the
    # flag ON (a store that enabled it mid-crawl serves phrase over
    # the indexed suffix only — enable from the first epoch for full
    # coverage).
    p_parts, _p_base = _gather_index_parts(
        spark, store, "index_positions_base", "index_positions",
        as_of_epoch,
    )
    if p_parts:
        from ..operators.textops import merge_positional_postings

        out["positions"] = merge_positional_postings(
            p_parts, n_docs=n_docs, block_size=block_size
        )
    if has_kw:
        out["kw_doc_lens"] = dls.select("doc_id", "kw_dl")
        out["kw_n_docs"] = int(tot["kn"] or 0)
        out["kw_t_tokens"] = int(tot["kt"] or 0)
    # persisted ranked term weights (cfg.index_term_weights): consumed
    # ONLY when written at the newest indexed epoch in view — a store
    # whose crawl later disabled the flag (or an as_of cut past the
    # last refresh) silently falls back to per-call derivation rather
    # than serving weights computed against an older corpus
    tw_entry = store.latest_committed("index_term_weights", as_of_epoch)
    if tw_entry is not None:
        shard_ids = set(
            store.committed_ids(
                "index_shards", as_of_epoch,
                after_epoch=base_entry["epoch"] if base_entry else None,
            )
        )
        newest = base_entry["epoch"] if base_entry else None
        for s in store.snapshots("index_shards"):
            if s["id"] in shard_ids:
                newest = (
                    s["epoch"] if newest is None
                    else max(newest, s["epoch"])
                )
        if newest is not None and tw_entry["epoch"] >= newest:
            out["term_weights"] = store.read(
                spark, "index_term_weights", tw_entry["id"]
            )
            top_m = 0
            for s in store.snapshots("index_term_weights"):
                if s["id"] == tw_entry["id"]:
                    top_m = int(s.get("metrics", {}).get("top_m") or 0)
            out["term_weights_top_m"] = top_m
    return out


class CrawlEngine:
    """``pages`` contract: URL-UNIQUE. The fetch join is an inner join
    on url, so a pages table carrying multiple captures per URL (WARC
    archives with revisit records, stacked snapshots) would multiply
    every fetched row — duplicate extraction output and duplicate seen
    appends. Reduce multi-capture inputs first with
    ``sources.warc.latest_captures`` (newest capture per URL,
    deterministic tie-break)."""

    def __init__(
        self,
        spark: SparkSession,
        store: SnapshotStore,
        pages: DataFrame,
        robots: Optional[DataFrame] = None,
        cfg: Optional[CrawlConfig] = None,
    ):
        self.spark = spark
        self.store = store
        self.pages = pages
        self.robots = robots
        self.cfg = cfg or CrawlConfig()
        if self.cfg.seen_filter not in ("bloom", "cuckoo"):
            raise ValueError(
                f"seen_filter must be 'bloom' or 'cuckoo', "
                f"got {self.cfg.seen_filter!r}"
            )
        self._epoch: Optional[int] = None
        # incremental seen-set bloom: built once, delta-unioned per
        # epoch, persisted as a store blob (superset-safe on crash)
        self._bloom = None
        self._bloom_capacity = 0
        # incremental content-seen bloom (content_seen_filter): same
        # activation/doubling/delta discipline, in-session only — a
        # resume rebuilds it once at the next active epoch
        self._cs_bloom = None
        self._cs_bloom_capacity = 0
        # hot-state carry (cfg.hot_state_max_rows): the post-commit
        # live frontier / seen set of the previous epoch, lineage
        # truncated; None ⇒ cold read from the store
        self._hot_frontier: Optional[DataFrame] = None
        self._hot_seen: Optional[DataFrame] = None

    # ------------------------------------------------------------------
    def init(self, seeds: List[tuple]) -> None:
        """Seed the frontier (epoch 0 base state). seeds = [(url, stype)]
        in reference urls-list order."""
        frontier = seeds_frontier(self.spark, seeds, self.cfg.salt_buckets)
        # hash-partition on host_salt, partition COUNT chosen by AQE:
        # a huge seed list fans out to shuffle.partitions, a small one
        # coalesces to a single file instead of 32 near-empty ones
        frontier = frontier.repartition("host_salt")
        empty_seen = self.spark.createDataFrame([], SEEN_SCHEMA)
        fsnap = self.store.commit("frontier_base", frontier, epoch=-1)
        ssnap = self.store.commit("seen", empty_seen, epoch=-1, mode="append")
        self.store.commit_epoch(
            -1, {"frontier_base": fsnap, "seen": ssnap}, {"seeds": len(seeds)}
        )
        self._epoch = -1

    def init_from_df(self, seeds_df: DataFrame) -> None:
        """Distributed seeding for huge seed sets (the 10^10-frontier
        path — never materializes seeds on the driver). ``seeds_df``
        columns: url (pre-canonicalized), stype, depth, ord_key."""
        frontier = with_frontier_columns(
            seeds_df, epoch=-1, salt_buckets=self.cfg.salt_buckets
        ).repartition("host_salt")
        empty_seen = self.spark.createDataFrame([], SEEN_SCHEMA)
        fsnap = self.store.commit("frontier_base", frontier, epoch=-1)
        ssnap = self.store.commit("seen", empty_seen, epoch=-1, mode="append")
        self.store.commit_epoch(-1, {"frontier_base": fsnap, "seen": ssnap}, {})
        self._epoch = -1

    def init_from_sitemaps(
        self,
        stype: str = "content",
        max_index_rounds: int = 3,
        default_priority_ppm: int = 500_000,
        extra_seeds: Optional[List[tuple]] = None,
    ) -> int:
        """Sitemap-driven seeding (the production cold-start path —
        Google/Bing crawlers bootstrap from sitemaps, not link walks):

        1. sitemap locations = default paths (/sitemap.xml[.gz]) plus
           any ``Sitemap:`` declarations in the robots table
           (frontier/robots.discover_sitemaps);
        2. parse them with the Arrow sitemap stage
           (frontier/sitemap.sitemap_candidates) — ``kind='url'`` rows
           become seeds, ``kind='sitemap'`` rows (sitemap INDEXES)
           recurse for up to ``max_index_rounds``;
        3. seed the frontier fully distributed (init_from_df — entry
           urls never materialize on the driver; only the tiny child-
           sitemap lists do, bounded by sites × index fan-out).

        Dequeue order: sitemap ``priority`` first (descending, absent →
        ``default_priority_ppm``), then document position — encoded in
        ``ord_key`` so the existing deterministic dequeue needs no new
        machinery. ``extra_seeds`` = [(url, stype)] appended after all
        sitemap entries (ord_key-prefixed later), for mixed seeding.
        Returns the number of child-sitemap recursion rounds actually
        run (diagnostics).
        """
        from ..frontier.sitemap import sitemap_candidates

        declared = None
        if self.robots is not None and "sitemaps" in self.robots.columns:
            from ..frontier.robots import discover_sitemaps

            declared = discover_sitemaps(self.robots).select("url")
        # the recursion state (parsed sitemap set, pending children) is
        # kept DISTRIBUTED — at 10^8 hosts the sitemap lists are far too
        # big for the driver; the only driver-side values are counts.
        # sitemap_candidates broadcasts the child list into its pages
        # semi-join, which is bounded by hosts × index fan-out per
        # round, the same class as the robots broadcast.
        entries = sitemap_candidates(self.pages, sitemap_urls=declared).persist()
        to_unpersist = [entries]
        urls = entries.filter(F.col("kind") == "url")
        children = entries.filter(F.col("kind") == "sitemap").select("url").distinct()
        parsed = entries.select(F.col("src_url").alias("url")).distinct()
        rounds = 0
        prev_todo = None
        while rounds < max_index_rounds:
            todo = children.join(parsed, "url", "left_anti").persist()
            n_todo = todo.count()
            # that count is the first action over the previous round's
            # (lazily persisted) `more` — its cache is warm only now, so
            # the previous todo it broadcast-joins must stay persisted
            # until here; unpersisting it inside its own round would
            # recompute the whole anti-join lineage every round
            if prev_todo is not None:
                prev_todo.unpersist()
                prev_todo = None
            if n_todo == 0:
                todo.unpersist()
                break
            rounds += 1
            more = sitemap_candidates(
                self.pages, path_suffixes=(), sitemap_urls=todo
            ).persist()
            to_unpersist.append(more)
            parsed = parsed.unionByName(todo).distinct().localCheckpoint(eager=True)
            prev_todo = todo
            urls = urls.unionByName(more.filter(F.col("kind") == "url"))
            children = (
                more.filter(F.col("kind") == "sitemap").select("url").distinct()
            )
        if prev_todo is not None:
            # max-rounds exit: the last `more` is still unmaterialized —
            # release its todo input with everything else after seeding
            to_unpersist.append(prev_todo)
        seeds_df = urls.select(
            canonical_url_col("url").alias("url"),
            F.lit(stype).alias("stype"),
            F.lit(0).alias("depth"),
            F.concat(
                F.lpad(
                    (
                        F.lit(1_000_000)
                        - F.coalesce(
                            F.col("priority_ppm"), F.lit(default_priority_ppm)
                        )
                    ).cast("string"),
                    7,
                    "0",
                ),
                F.lit("/"),
                zfill_col(F.col("item_pos"), POS_PAD),
            ).alias("ord_key"),
        )
        if extra_seeds:
            extra_df = self.spark.createDataFrame(
                [
                    (canonicalize_url(u), st, 0, f"z{str(i).zfill(SEED_PAD)}")
                    for i, (u, st) in enumerate(extra_seeds)
                ],
                "url string, stype string, depth int, ord_key string",
            )
            seeds_df = seeds_df.unionByName(extra_df)
        # deterministic dedup: a URL declared by multiple sitemaps (or
        # by both a sitemap and an extra seed) keeps the min-ord_key
        # row — sitemap rows win over extra seeds (numeric ord_keys
        # sort before the 'z' seed prefix). dropDuplicates would keep
        # a partition-order-dependent row, breaking byte-stable rerun
        # determinism of the crawl order.
        self.init_from_df(first_discovery_wins(seeds_df))
        for df in to_unpersist:
            df.unpersist()
        return rounds

    @classmethod
    def resume(
        cls,
        spark: SparkSession,
        store: SnapshotStore,
        pages: DataFrame,
        robots: Optional[DataFrame] = None,
        cfg: Optional[CrawlConfig] = None,
    ) -> "CrawlEngine":
        """Resume from the last COMPLETE epoch in the manifest; snapshots
        written by a crashed epoch are ignored (never referenced)."""
        engine = cls(spark, store, pages, robots, cfg)
        last = store.last_epoch()
        if last is None:
            raise RuntimeError("nothing to resume: store has no committed epochs")
        engine._epoch = last["epoch"]
        # reuse the persisted bloom when it covers the resume epoch
        # (blob epoch >= resume epoch ⇒ superset of committed seen —
        # safe: extra keys only cause false positives, dropped by the
        # exact anti-join; an OLDER blob would have false NEGATIVES
        # (missed dedup ⇒ duplicate fetches) so it is ignored and the
        # filter is rebuilt on demand)
        blob = store.read_blob("seen_bloom")
        if blob is not None and blob["epoch"] >= engine._epoch:
            meta = blob["meta"]
            if meta.get("cuckoo"):
                from ..frontier.cuckoo import ShardedCuckoo

                engine._bloom = ShardedCuckoo.from_bytes(blob["data"])
            elif meta.get("sharded"):
                engine._bloom = ShardedBloom.from_bytes(blob["data"])
            else:
                engine._bloom = PyBloom.from_bytes(
                    meta["n_bits"], meta["k"], blob["data"]
                )
            engine._bloom_capacity = meta["capacity"]
        return engine

    # ------------------------------------------------------------------
    def _frontier_base_entry(self, as_of_epoch: Optional[int] = None) -> Dict:
        cap = self._epoch if as_of_epoch is None else as_of_epoch
        entry = self.store.latest_committed("frontier_base", cap)
        if entry is None:
            raise RuntimeError("store has no frontier_base — init() not run?")
        return entry

    def frontier(self, as_of_epoch: Optional[int] = None) -> DataFrame:
        """The LIVE frontier: merge-on-read over base ∪ deltas with the
        dequeue tombstones applied as equality deletes (a row enqueued
        at epoch e is dead iff a tombstone for its url has
        tomb_epoch > e). On Iceberg this whole method is one MERGE-ON-
        READ table scan. Within a run the hot carry (identical rows,
        checkpointed in memory at the previous epoch's commit) answers
        instead.

        ``as_of_epoch``: TIME TRAVEL — reconstruct the live frontier
        exactly as it stood after that epoch's commit (Iceberg
        snapshot-id read). Reaches back as far as snapshot retention
        (``expire_frontier_keep``) keeps bases — older as-of reads
        raise, precisely like time travel on an expired Iceberg
        snapshot."""
        if self._hot_frontier is not None and as_of_epoch is None:
            return self._hot_frontier
        cap = self._epoch if as_of_epoch is None else as_of_epoch
        base_entry = self._frontier_base_entry(as_of_epoch)
        try:
            rows = self.store.read(self.spark, "frontier_base", base_entry["id"])
        except KeyError as exc:
            raise RuntimeError(
                f"frontier time travel to epoch {cap} needs frontier_base "
                f"snapshot {base_entry['id']}, which retention expired: {exc}"
            ) from None
        deltas = self.store.read_committed(
            self.spark, "frontier_delta", cap,
            after_epoch=base_entry["epoch"],
        )
        if deltas is not None:
            rows = rows.unionByName(deltas)
        tombs = self.store.read_committed(
            self.spark, "frontier_tomb", cap,
            after_epoch=base_entry["epoch"],
        )
        if tombs is None:
            return rows
        dead = tombs.groupBy("url").agg(F.max("tomb_epoch").alias("_tomb_epoch"))
        return (
            rows.join(dead, "url", "left")
            .filter(
                F.col("_tomb_epoch").isNull()
                | (F.col("discovered_epoch") >= F.col("_tomb_epoch"))
            )
            .drop("_tomb_epoch")
        )

    def _frontier_live_rows(self) -> int:
        """Live frontier size from parquet footers alone (no Spark
        job): every tombstone kills exactly one enqueued row, so
        live = base + Σdeltas − Σtombstones."""
        base_entry = self._frontier_base_entry()
        base_rows = _snapshot_rows(self.store, "frontier_base", base_entry["id"])
        delta_rows = self.store.committed_rows(
            "frontier_delta", self._epoch, after_epoch=base_entry["epoch"]
        )
        tomb_rows = self.store.committed_rows(
            "frontier_tomb", self._epoch, after_epoch=base_entry["epoch"]
        )
        return base_rows + delta_rows - tomb_rows

    def seen(self, as_of_epoch: Optional[int] = None) -> DataFrame:
        """The URL-seen set: union of committed per-epoch APPEND deltas
        (dequeued URLs are never already in seen, so the dedup-merge is
        a pure append — O(batch) per epoch, not an O(|seen|) rewrite;
        on Iceberg this is the append commit). Hot carry as in
        :meth:`frontier`. ``as_of_epoch``: time-travel read — the seen
        set as of that epoch's commit (appends are never expired, so
        any committed epoch is reachable)."""
        if self._hot_seen is not None and as_of_epoch is None:
            return self._hot_seen
        cap = self._epoch if as_of_epoch is None else as_of_epoch
        return self.store.read_committed(self.spark, "seen", cap)

    def content_seen(self, as_of_epoch: Optional[int] = None) -> Optional[DataFrame]:
        """Body fingerprints already processed (content_seen_filter):
        one ``(body_fp, url, epoch)`` row per unique body, where url is
        the FIRST copy that was extracted. Append-only per-epoch
        deltas, same commit/resume discipline as :meth:`seen`."""
        cap = self._epoch if as_of_epoch is None else as_of_epoch
        return self.store.read_committed(self.spark, "content_seen", cap)

    def _build_fp_filter(self, df: DataFrame, expected: int):
        """Bloom over an int64 ``fp_hash`` column; sharded when
        cfg.bloom_shards > 1 (at 10^10 unique bodies a flat bitmap is
        driver-prohibitive — the sharded build mirrors the URL-seen
        filter's pmod-split bitmaps)."""
        if self.cfg.bloom_shards > 1:
            return build_sharded_bloom(
                df, "fp_hash", n_shards=self.cfg.bloom_shards,
                expected=expected, fpp=self.cfg.bloom_fpp,
            )
        return build_bloom(
            df, "fp_hash", expected=expected, fpp=self.cfg.bloom_fpp
        )

    def _fp_prefilter(self, df: DataFrame, keep_maybe_seen: bool) -> DataFrame:
        if isinstance(self._cs_bloom, ShardedBloom):
            return sharded_bloom_prefilter(
                df, "fp_hash", sharded=self._cs_bloom,
                keep_maybe_seen=keep_maybe_seen,
            )
        return bloom_prefilter(
            df, self._cs_bloom, "fp_hash", keep_maybe_seen=keep_maybe_seen
        )

    def articles(
        self, merged: bool = True, as_of_epoch: Optional[int] = None
    ) -> Optional[DataFrame]:
        cap = self._epoch if as_of_epoch is None else as_of_epoch
        raw = self.store.read_committed(self.spark, "articles", cap)
        if raw is None or not merged:
            return raw
        return merge_articles(raw)

    def products(self, as_of_epoch: Optional[int] = None) -> Optional[DataFrame]:
        cap = self._epoch if as_of_epoch is None else as_of_epoch
        return self.store.read_committed(self.spark, "products", cap)

    def businesses(self, as_of_epoch: Optional[int] = None) -> Optional[DataFrame]:
        cap = self._epoch if as_of_epoch is None else as_of_epoch
        return self.store.read_committed(self.spark, "businesses", cap)

    # -- incremental search index (cfg.index_articles) -----------------
    def _commit_index_shard(self, articles_out: DataFrame, epoch: int) -> Dict:
        """Append this epoch's UNGATED postings shard + norms rows.

        Doc grain = full-article pages (row_kind='full': one row per
        fetched single-article page; listing rows index when their
        article is fetched — how a crawler indexes), doc_id =
        xxhash64(src_url), text = the byte-identical ``content``
        column. Docs already in index_doclens (a revisit refetch) are
        anti-joined out so shard doc sets stay DISJOINT — the
        precondition of the merge ≡ batch-build contract. Only the
        delta pays tokenization; the anti-join trades at doc-id grain
        (16-byte rows), never text.
        """
        from ..operators.textops import build_postings, doc_lengths

        docs = (
            articles_out.filter(F.col("row_kind") == "full")
            .select(
                F.xxhash64("src_url").alias("doc_id"),
                F.coalesce(F.col("content"), F.lit("")).alias("text"),
            )
            .dropDuplicates(["doc_id"])
        )
        prev = self.store.read_committed(self.spark, "index_doclens")
        if prev is not None:
            docs = docs.join(prev.select("doc_id"), "doc_id", "left_anti")
        docs = docs.localCheckpoint(eager=True)  # count + 2 consumers
        n_new = docs.count()
        if not n_new:
            return {}
        pshard = None
        if self.cfg.index_positions:
            from ..operators.textops import build_positional_postings

            # ONE tokenization serves both index shapes: the plain
            # shard is the positional shard minus position_lists
            # (bit-identical to build_postings — tested contract)
            pshard = build_positional_postings(
                docs,
                n_docs=n_new,
                include_dls=True,
                block_size=self.cfg.index_block_size,
            ).localCheckpoint(eager=True)  # 2 consumers below
            shard = pshard.drop("position_lists")
        else:
            shard = build_postings(
                docs,
                n_docs=n_new,
                include_dls=True,
                block_size=self.cfg.index_block_size,
            )
        # kw_dl rides the norms table so MLT query formation is
        # candidate-grain at read time (no corpus aggregate per call)
        dls = doc_lengths(docs, include_kw=True)
        tables = {
            "index_shards": self.store.commit(
                "index_shards", shard, epoch=epoch, mode="append",
                # readers (load_search_index with block_size=None)
                # recover the writer's block size from this stamp
                metrics={"block_size": self.cfg.index_block_size},
            ),
            "index_doclens": self.store.commit(
                "index_doclens", dls, epoch=epoch, mode="append"
            ),
        }
        if pshard is not None:
            tables["index_positions"] = self.store.commit(
                "index_positions", pshard, epoch=epoch, mode="append",
                metrics={"block_size": self.cfg.index_block_size},
            )
        tables.update(
            self._maybe_compact_index(epoch, shard, dls, n_new, pshard)
        )
        tables.update(self._commit_term_weights(epoch, shard, n_new))
        return tables

    def _commit_term_weights(
        self, epoch: int, shard: DataFrame, n_new: int
    ) -> Dict:
        """Persist the ranked top-m BM25 term weights of the WHOLE
        index as of this epoch (cfg.index_term_weights): one
        replace-mode table, derived from the merged ungated postings
        via bm25_term_weights_from_postings — integer triples only,
        the corpus text is never read. Readers (load_search_index)
        consume it only when its epoch matches the newest indexed
        epoch in view, so a crawl that later turns the flag off can
        never serve stale weights."""
        if not self.cfg.index_term_weights:
            return {}
        from ..operators.textops import (
            bm25_term_weights_from_postings,
            merge_postings,
        )

        base_entry = self.store.latest_committed("index_base", self._epoch)
        after = base_entry["epoch"] if base_entry else None
        parts = []
        if base_entry is not None:
            parts.append(
                self.store.read(self.spark, "index_base", base_entry["id"])
            )
        prev_deltas = self.store.read_committed(
            self.spark, "index_shards", self._epoch, after_epoch=after
        )
        if prev_deltas is not None:
            parts.append(prev_deltas)
        parts.append(shard)
        n_total = self.store.committed_rows("index_doclens") + n_new
        merged = merge_postings(
            parts, n_docs=n_total, block_size=self.cfg.index_block_size
        )
        tw = bm25_term_weights_from_postings(
            merged, k=self.cfg.index_term_weights_top_m
        )
        return {
            "index_term_weights": self.store.commit(
                "index_term_weights", tw, epoch=epoch, mode="replace",
                metrics={"top_m": self.cfg.index_term_weights_top_m},
            )
        }

    def _maybe_compact_index(
        self, epoch: int, shard: DataFrame, dls: DataFrame, n_new: int,
        pshard: Optional[DataFrame] = None,
    ) -> Dict:
        """Ratio-triggered index compaction (the frontier_base
        discipline): when the delta shards accumulated since the last
        ``index_base`` reach ``cfg.index_compact_max_shards``, fold
        base + committed deltas + this epoch's shard into one new
        UNGATED base (min_df=1, max_df_ppm=10^6 — the gates stay a
        read-time decision), and likewise the keyword-norm deltas into
        ``index_dl_base``. Readers then union O(base + recent deltas)
        files instead of O(epochs). The fold is semantically invisible
        by the merge_postings contract; crash-safe because the base
        snapshots only become visible through this epoch's
        commit_epoch record."""
        from ..operators.textops import merge_postings

        cfg = self.cfg
        base_entry = self.store.latest_committed("index_base", self._epoch)
        after = base_entry["epoch"] if base_entry else None
        n_deltas = 1 + len(
            self.store.committed_ids(
                "index_shards", self._epoch, after_epoch=after
            )
        )
        if n_deltas < max(2, cfg.index_compact_max_shards):
            return {}
        parts, _ = _gather_index_parts(
            self.spark, self.store, "index_base", "index_shards",
            self._epoch,
        )
        parts.append(shard)
        n_total = self.store.committed_rows("index_doclens") + n_new
        folded = merge_postings(
            parts,
            min_df=1,
            max_df_ppm=1_000_000,
            n_docs=n_total,
            block_size=cfg.index_block_size,
        )
        dl_parts, _ = _gather_index_parts(
            self.spark, self.store, "index_dl_base", "index_doclens",
            self._epoch,
        )
        dl_parts = [dls] + dl_parts
        dl_folded = dl_parts[0]
        for p in dl_parts[1:]:
            dl_folded = dl_folded.unionByName(p, allowMissingColumns=True)
        out = {
            "index_base": self.store.commit(
                "index_base", folded, epoch=epoch,
                metrics={
                    "block_size": cfg.index_block_size,
                    "folded_shards": n_deltas,
                },
            ),
            "index_dl_base": self.store.commit(
                "index_dl_base", dl_folded, epoch=epoch
            ),
        }
        if pshard is not None:
            # fold the positional deltas the same way (the same merge
            # ≡ batch contract, positional flavor); ungated — gates
            # stay a read-time decision and phrase queries need every
            # term anyway
            from ..operators.textops import merge_positional_postings

            p_parts, _ = _gather_index_parts(
                self.spark, self.store, "index_positions_base",
                "index_positions", self._epoch,
            )
            p_parts.append(pshard)
            out["index_positions_base"] = self.store.commit(
                "index_positions_base",
                merge_positional_postings(
                    p_parts, n_docs=n_total,
                    block_size=cfg.index_block_size,
                ),
                epoch=epoch,
                metrics={"block_size": cfg.index_block_size},
            )
        return out

    def search_index(
        self,
        *,
        min_df: int = 1,
        max_df_ppm: int = 1_000_000,
        as_of_epoch: Optional[int] = None,
    ) -> Optional[Dict]:
        """The crawl's live search index, merged on read from the
        per-epoch ungated shards with the df gates applied HERE, where
        global document frequencies are finally known
        (operators/textops.merge_postings: merge(build(A), build(B)) ≡
        build(A ∪ B) exactly). Returns ``{postings, doc_lens, n_docs,
        t_tokens}`` — the bm25_search inputs — or None before the
        first indexed epoch. ``analyze search`` can serve queries
        mid-crawl from this without re-tokenizing a single old epoch."""
        cap = self._epoch if as_of_epoch is None else as_of_epoch
        return load_search_index(
            self.spark,
            self.store,
            min_df=min_df,
            max_df_ppm=max_df_ppm,
            block_size=self.cfg.index_block_size,
            as_of_epoch=cap,
        )

    def metrics(self) -> List[Dict]:
        return self.store.epoch_metrics()

    def partition_metrics(self) -> Optional[DataFrame]:
        """Per-partition lineage (north star): (host, status, urls,
        min_depth, max_depth, epoch) rows, one group per epoch.

        Derived from the committed seen table at read time — every
        seen delta already carries (host, status, depth,
        fetched_epoch), so a per-epoch materialized copy would be a
        redundant write job on the epoch's critical path. Computing it
        here keeps the rows bit-identical (each delta holds a single
        fetched_epoch) while the epoch pays nothing."""
        if not self.cfg.partition_metrics:
            return None
        seen = self.seen()
        if seen is None:
            return None
        return (
            seen.groupBy("host", "status", "fetched_epoch")
            .agg(
                F.count("*").alias("urls"),
                F.min("depth").alias("min_depth"),
                F.max("depth").alias("max_depth"),
            )
            .select(
                "host", "status", "urls", "min_depth", "max_depth",
                F.col("fetched_epoch").alias("epoch"),
            )
        )

    # ------------------------------------------------------------------
    def run_epoch(self) -> Dict:
        """One checkpointed batch. Returns the epoch's metrics (empty
        frontier → {'done': True})."""
        try:
            return self._run_epoch_impl()
        except BaseException:
            # deferred-manifest discipline: a failed epoch's snapshot
            # entries never reach disk (its parquet dirs stay orphans
            # resume ignores); without this, the next epoch's
            # begin_epoch_batch would refuse
            self.store.abort_epoch_batch()
            raise

    def _run_epoch_impl(self) -> Dict:
        cfg = self.cfg
        epoch = self._epoch + 1

        # drained frontier: known from footer-count arithmetic —
        # the terminal epoch costs zero Spark jobs
        n_frontier = self._frontier_live_rows()
        if n_frontier == 0:
            return {"epoch": epoch, "done": True, "dequeued": 0}

        # ONE durable manifest write per epoch (commit_epoch): every
        # table/blob commit below lands in the pending manifest only
        self.store.begin_epoch_batch()
        t0 = time.time()
        phases = {}

        def mark(name):
            now = time.time()
            phases[name] = round(now - mark.last, 3)
            mark.last = now

        mark.last = t0
        frontier = self.frontier()
        frontier_cols = frontier.columns
        seen = self.seen()
        to_unpersist = []

        # --- dequeue: ONE window pass yields both the fetch batch and
        # the carried-over pending frontier (host_rank vs budget) — no
        # frontier ⟕ batch anti-join shuffle (SURVEY.md §2.5)
        ranked = dequeue_ranked(
            frontier,
            self.robots,
            epoch_seconds=cfg.epoch_seconds,
            default_delay=cfg.default_delay,
            skew_prerank=n_frontier > cfg.skew_prerank_rows,
        ).persist()
        to_unpersist.append(ranked)
        batch = ranked.filter(F.col("host_rank") <= F.col("budget")).drop("budget")
        if cfg.global_budget is not None:
            if cfg.fair_budget:
                # water-fill the cap across hosts: each host's demand
                # is its politeness-legal row count; within a host the
                # standard (priority, depth, ord_key) ranking decides
                # which rows make the allocation
                from ..frontier.fairshare import fair_share_budgets

                demands = batch.groupBy("host").agg(
                    F.count("*").alias("demand")
                )
                alloc = fair_share_budgets(
                    demands, cfg.global_budget
                ).select("host", F.col("alloc").alias("_fair_alloc"))
                batch = (
                    batch.join(F.broadcast(alloc), "host")
                    .filter(F.col("host_rank") <= F.col("_fair_alloc"))
                    .drop("_fair_alloc")
                    .persist()
                )
            else:
                batch = (
                    batch.orderBy(F.asc("depth"), F.asc("ord_key"))
                    .limit(cfg.global_budget)
                    .persist()
                )
            to_unpersist.append(batch)
            pending_after = ranked.select(*frontier_cols).join(
                batch.select("url"), "url", "left_anti"
            )
        else:
            pending_after = ranked.filter(
                F.col("host_rank") > F.col("budget")
            ).select(*frontier_cols)

        if cfg.pld_budget is not None:
            # registered-domain cap on the batch (small: already
            # politeness-bounded); overflow rows rejoin pending with
            # priority/depth/ord_key intact, so they drain in later
            # epochs — completeness is preserved, only pacing changes
            from ..frontier.pld import pld_budget_caps

            capped = pld_budget_caps(batch, cfg.pld_budget).persist()
            to_unpersist.append(capped)
            batch = capped.filter(F.col("pld_keep")).drop("pld", "pld_keep")
            pending_after = pending_after.unionByName(
                capped.filter(~F.col("pld_keep")).select(*frontier_cols)
            )

        # one action gives the batch size AND the scraper types present
        stype_counts = {
            r["stype"]: r["cnt"]
            for r in batch.groupBy("stype").agg(F.count("*").alias("cnt")).collect()
        }
        n_batch = sum(stype_counts.values())
        mark("dequeue")
        if n_batch == 0:
            for df in to_unpersist:
                df.unpersist()
            # nothing committed this epoch — close the batch untouched
            self.store.abort_epoch_batch()
            return {"epoch": epoch, "done": True, "dequeued": 0}

        # S2/S3: rotate UA / assign session + proxy as columns on the
        # batch (narrow codegen projection — the broadcast carries a
        # few extra strings per row, nothing shuffles)
        if cfg.fetch_policy is not None:
            batch = with_fetch_metadata(batch, cfg.fetch_policy, epoch)

        # --- fetch = lookup join against pages (J2) --------------------
        # Small batch: broadcast inner join — the huge pages side is
        # never shuffled (one pruned url+html scan); misses via an
        # anti-join of two small cached sides. Large batch: ONE shuffled
        # left join yields hits and misses together (html null ⇒ miss) —
        # at real scale this path assumes pages bucketed by url (Iceberg
        # bucket partitioning) so only the batch side shuffles.
        if n_batch <= cfg.fetch_broadcast_max:
            # html-NULL pages rows are misses, same as the shuffled
            # path's `html null ⇒ miss` — without the filter the two
            # paths disagree and NULL bodies reach the extraction UDFs
            fetched = self.pages.select("url", "html").filter(
                F.col("html").isNotNull()
            ).join(
                F.broadcast(batch), "url", "inner"
            ).persist()
            to_unpersist.append(fetched)
            n_fetched = fetched.count()
            misses = batch.join(
                fetched.select("url"), "url", "left_anti"
            ).persist()
            to_unpersist.append(misses)
        else:
            enriched = batch.join(
                self.pages.select("url", "html"), "url", "left"
            ).persist()
            to_unpersist.append(enriched)
            fetched = enriched.filter(F.col("html").isNotNull())
            misses = enriched.filter(F.col("html").isNull()).drop("html")
            n_fetched = fetched.count()
        mark("fetch")

        # --- content-seen filter (Heritrix semantics, opt-in) ----------
        # A fetched page whose body fingerprint was already processed —
        # in a previous epoch (committed content_seen) or earlier in
        # crawl order within this batch — is a byte-duplicate: skip its
        # extraction and link discovery (the first copy already yielded
        # both) and record it in seen with status "dup". The batch side
        # shuffles once on body_fp (window) and once for the anti-join;
        # the big content_seen side is scanned, never rewritten. Once
        # the fingerprint set passes bloom_min_seen, a bloom over
        # xxhash64(body_fp) routes provably-new bodies around the exact
        # joins — only maybe-seen rows pay them — with the URL-seen
        # filter's incremental discipline (full builds at activation
        # and capacity doublings, O(delta) unions otherwise).
        dup_pages = None
        n_dup = 0
        content_seen_snap = None
        cs_bloom_active = False
        if cfg.content_seen_filter and n_fetched:
            from pyspark.sql import Window

            hashed = fetched.withColumn(
                "body_fp", F.md5(F.col("html").cast("binary"))
            )
            prior = self.content_seen()
            if prior is not None:
                prior_fps = prior.select("body_fp")
                n_cs_prev = self.store.committed_rows(
                    "content_seen", self._epoch
                )
                cs_bloom_active = n_cs_prev >= cfg.bloom_min_seen
                if cs_bloom_active:
                    if (
                        self._cs_bloom is None
                        or n_cs_prev > self._cs_bloom_capacity
                    ):
                        t_cs = time.time()
                        self._cs_bloom_capacity = max(
                            4 * cfg.bloom_min_seen, 2 * n_cs_prev
                        )
                        self._cs_bloom = self._build_fp_filter(
                            prior.select(
                                F.xxhash64("body_fp").alias("fp_hash")
                            ),
                            expected=self._cs_bloom_capacity,
                        )
                        phases["content_seen_bloom_build"] = round(
                            time.time() - t_cs, 3
                        )
                    fp_hashed = hashed.withColumn(
                        "fp_hash", F.xxhash64("body_fp")
                    )
                    definitely_new = self._fp_prefilter(
                        fp_hashed, keep_maybe_seen=False
                    ).drop("fp_hash")
                    maybe = self._fp_prefilter(
                        fp_hashed, keep_maybe_seen=True
                    ).drop("fp_hash")
                    dup_prior = maybe.join(prior_fps, "body_fp", "left_semi")
                    fresh = definitely_new.unionByName(
                        maybe.join(prior_fps, "body_fp", "left_anti")
                    )
                else:
                    dup_prior = hashed.join(
                        prior_fps, "body_fp", "left_semi"
                    )
                    fresh = hashed.join(prior_fps, "body_fp", "left_anti")
            else:
                dup_prior = None
                fresh = hashed
            # within-batch: the copy first in crawl order wins —
            # deterministic, matches the sequential reference's "first
            # visit processes" semantics. SKEW-PROOF (round 4): a
            # Window.partitionBy(body_fp) sorts a hot fingerprint's
            # ENTIRE copy set in one task — boilerplate bodies (error
            # pages, parked domains) have millions of byte-identical
            # copies at crawl scale (measured: 3M same-body pages
            # spent ~30 s in the old window). The winner per fp is
            # just argmin(ord_key, url) — a map-side-combinable
            # aggregate (combiners shrink every partition's
            # contribution to one row per fp, so the hot key never
            # concentrates), and the survivor/dup split joins back on
            # the FULL (body_fp, ord_key, url) key, which spreads the
            # hot fingerprint's rows uniformly. Identical winner to
            # the old row_number (lexicographic min), bit-exact.
            fresh = fresh.persist()
            to_unpersist.append(fresh)
            winners = (
                fresh.groupBy("body_fp")
                .agg(F.min(F.struct("ord_key", "url")).alias("_w"))
                .select(
                    "body_fp",
                    F.col("_w.ord_key").alias("ord_key"),
                    F.col("_w.url").alias("url"),
                )
            )
            keys = ["body_fp", "ord_key", "url"]
            survivors = fresh.join(winners, keys, "left_semi")
            dup_batch = fresh.join(winners, keys, "left_anti")
            dup_pages = (
                dup_batch if dup_prior is None
                else dup_batch.unionByName(dup_prior)
            ).drop("html", "body_fp").persist()
            to_unpersist.append(dup_pages)
            n_dup = dup_pages.count()
            if n_dup:
                fetched = survivors.drop("body_fp")
            else:
                dup_pages = None
            # commit this epoch's new fingerprints (survivors carry
            # exactly one row per unique new body); registered in the
            # epoch record below — read_committed only serves snapshots
            # referenced by a committed epoch (crash safety)
            content_seen_snap = self.store.commit(
                "content_seen",
                _coalesce_for_write(
                    survivors.select(
                        "body_fp", "url", F.lit(epoch).alias("epoch")
                    ),
                    n_fetched,
                    cfg.write_rows_per_file,
                ),
                epoch=epoch,
                mode="append",
            )
            if cs_bloom_active and self._cs_bloom is not None:
                # O(delta) maintenance: fold only this epoch's new
                # fingerprints into the filter (fixed geometry — union
                # is only defined for identical bit layouts)
                if isinstance(self._cs_bloom, ShardedBloom):
                    delta = build_sharded_bloom(
                        survivors.select(
                            F.xxhash64("body_fp").alias("fp_hash")
                        ),
                        "fp_hash",
                        n_shards=self._cs_bloom.n_shards, expected=1,
                        n_bits=self._cs_bloom.n_bits, k=self._cs_bloom.k,
                    )
                else:
                    delta = build_bloom(
                        survivors.select(
                            F.xxhash64("body_fp").alias("fp_hash")
                        ),
                        "fp_hash", expected=1,
                        n_bits=self._cs_bloom.n_bits, k=self._cs_bloom.k,
                    )
                self._cs_bloom = self._cs_bloom.union(delta)
            mark("content_seen")

        # --- robots meta directives (REP, opt-in) -----------------------
        # one native regexp scan over the fetch batch; the flagged url
        # lists are batch-bounded and almost always tiny, so the gates
        # below are broadcast anti-joins — extraction and link discovery
        # plans are untouched when the flag is off or nothing is flagged
        noindex_src = None
        nofollow_src = None
        n_noindex = n_nofollow = 0
        if cfg.respect_meta_robots and n_fetched:
            from ..operators.structured import meta_robots

            rb = meta_robots(fetched).persist()
            to_unpersist.append(rb)
            counts = rb.agg(
                F.sum(F.col("noindex").cast("long")).alias("ni"),
                F.sum(F.col("nofollow").cast("long")).alias("nf"),
            ).collect()[0]
            n_noindex = int(counts["ni"] or 0)
            n_nofollow = int(counts["nf"] or 0)
            if n_noindex:
                noindex_src = rb.filter(F.col("noindex")).select(
                    F.col("url").alias("src_url")
                )
            if n_nofollow:
                nofollow_src = rb.filter(F.col("nofollow")).select(
                    F.col("url").alias("src_url")
                )
            mark("meta_robots")

        # --- parse/extract (Arrow UDFs), routed by scraper type --------
        # only the extraction families present in this batch run — an
        # all-content epoch skips two UDF+write jobs entirely
        content_rows = None
        if stype_counts.get("content"):
            content_rows = extract_content_df(
                fetched.filter(F.col("stype") == "content"), cfg.content
            ).persist()
            to_unpersist.append(content_rows)
        product_rows = (
            extract_products_df(
                fetched.filter(F.col("stype") == "ecommerce"), cfg.ecommerce
            )
            if stype_counts.get("ecommerce")
            else None
        )
        business_rows = (
            extract_businesses_df(
                fetched.filter(F.col("stype") == "business"), cfg.business
            )
            if stype_counts.get("business")
            else None
        )

        # extraction tables commit ASYNC on the epoch's commit pool:
        # the count below still materializes (and caches) the Arrow
        # extraction exactly once — the frontier pipeline reuses the
        # cached link rows — but the parquet WRITES are independent
        # jobs over the cache, so they overlap the candidate/frontier
        # work and the seen/frontier commits instead of serializing
        # ahead of them (the store serializes manifest updates; the
        # futures resolve with the other commits below). At 32 cores
        # the epoch's serial driver fraction, not the parallel work,
        # bounds throughput — every job taken off the critical path
        # moves the N→4N efficiency directly.
        from concurrent.futures import ThreadPoolExecutor

        pool = ThreadPoolExecutor(6)
        try:
            async_commits: Dict[str, object] = {}
            tables = {}
            if content_seen_snap is not None:
                tables["content_seen"] = content_seen_snap
            n_links_pre = None
            if content_rows is not None:
                articles_out = content_rows.filter(F.col("row_kind") != "link").drop(
                    "link_kind"
                )
                if noindex_src is not None:
                    # REP noindex: extraction rows from flagged pages never
                    # reach the corpus (links still followed below)
                    articles_out = articles_out.join(
                        F.broadcast(noindex_src), "src_url", "left_anti"
                    )
                if (
                    noindex_src is None
                    and nofollow_src is None
                    and cfg.max_outlinks_per_page is None
                ):
                    # ONE action gives the article-row count AND the link
                    # count (and materializes the cache): on the common
                    # path (no REP flags, no outlink cap) the two counts
                    # are exactly the row_kind split of the cached rows, so
                    # the epoch pays one driver round-trip, not two
                    kind_counts = {
                        bool(r["is_link"]): r["cnt"]
                        for r in content_rows.groupBy(
                            (F.col("row_kind") == "link").alias("is_link")
                        )
                        .agg(F.count("*").alias("cnt"))
                        .collect()
                    }
                    n_article_rows = kind_counts.get(False, 0)
                    n_links_pre = kind_counts.get(True, 0)
                else:
                    # this count materializes the content_rows cache (the
                    # job the bare commit used to pay) and sizes the write
                    n_article_rows = articles_out.count()
                async_commits["articles"] = pool.submit(
                    self.store.commit,
                    "articles",
                    _coalesce_for_write(
                        articles_out, n_article_rows, cfg.write_rows_per_file_wide
                    ),
                    epoch,
                    mode="append",
                )
                if cfg.index_articles and n_article_rows:
                    async_commits["_index"] = pool.submit(
                        self._commit_index_shard, articles_out, epoch
                    )
            if product_rows is not None and noindex_src is not None:
                product_rows = product_rows.join(
                    F.broadcast(noindex_src), "src_url", "left_anti"
                )
            if business_rows is not None and noindex_src is not None:
                business_rows = business_rows.join(
                    F.broadcast(noindex_src), "src_url", "left_anti"
                )
            if product_rows is not None:
                # uncached: sizing uses an upper-bound estimate (items per
                # fetched page ≤ 64) instead of a count that would run the
                # extraction twice
                async_commits["products"] = pool.submit(
                    self.store.commit,
                    "products",
                    _coalesce_for_write(
                        product_rows, n_fetched * 64, cfg.write_rows_per_file_wide
                    ),
                    epoch,
                    mode="append",
                )
            if business_rows is not None:
                async_commits["businesses"] = pool.submit(
                    self.store.commit,
                    "businesses",
                    _coalesce_for_write(
                        business_rows, n_fetched * 64, cfg.write_rows_per_file_wide
                    ),
                    epoch,
                    mode="append",
                )
            mark("extract_commit")

            # --- discovered links → frontier candidates --------------------
            # counted on the cached extraction output (no recompute); a
            # link-free epoch skips the whole candidate pipeline INCLUDING
            # its shuffle of the seen set
            link_rows = (
                content_rows.filter(F.col("row_kind") == "link")
                if content_rows is not None
                else None
            )
            if link_rows is not None and nofollow_src is not None:
                # REP nofollow: flagged pages contribute no outlinks
                link_rows = link_rows.join(
                    F.broadcast(nofollow_src), "src_url", "left_anti"
                )
            if link_rows is not None and cfg.max_outlinks_per_page is not None:
                # Heritrix maxOutlinks: per-row position predicate, no window
                link_rows = link_rows.filter(
                    F.col("item_pos") < cfg.max_outlinks_per_page
                )
            n_links = (
                n_links_pre
                if n_links_pre is not None
                else (link_rows.count() if link_rows is not None else 0)
            )
            new_frontier_rows = None
            if n_links:
                links = link_rows.select(
                    "src_url", "url", "item_pos", "link_kind"
                )
                parents = batch.select(
                    F.col("url").alias("src_url"),
                    F.col("ord_key").alias("parent_key"),
                    F.col("depth").alias("parent_depth"),
                    F.col("stype").alias("parent_stype"),
                )
                candidates = (
                    links.join(parents, "src_url")  # links are small; AQE broadcasts
                    .select(
                        canonical_url_col("url").alias("url"),
                        F.concat(
                            F.col("parent_key"),
                            F.lit("/"),
                            zfill_col(F.col("item_pos"), POS_PAD),
                        ).alias("ord_key"),
                        (F.col("parent_depth") + 1).alias("depth"),
                        F.col("parent_stype").alias("stype"),
                    )
                    .filter(F.col("depth") <= cfg.max_depth)
                )
                if cfg.focus_terms and content_rows is not None:
                    # focused priority: anchor text = the listing row's
                    # title for the same target url (the parse already
                    # produced it — no second extraction); relevance =
                    # matched-term fraction in ppm, prepended to
                    # ord_key so the existing deterministic dequeue
                    # needs no new machinery (the sitemap-priority
                    # encoding, applied to every discovery)
                    from ..operators.textops import (
                        tokenize_query,
                        tokens_col,
                    )

                    f_terms = sorted({
                        t for s in cfg.focus_terms for t in tokenize_query(s)
                    })
                    if f_terms:
                        anchors = (
                            content_rows.filter(
                                (F.col("row_kind") == "listing")
                                & F.col("url").isNotNull()
                                & F.col("title").isNotNull()
                            )
                            .select(
                                canonical_url_col("url").alias("url"),
                                F.col("title").alias("_anchor"),
                            )
                            .groupBy("url")
                            .agg(F.max("_anchor").alias("_anchor"))
                        )
                        farr = F.array(*[F.lit(t) for t in f_terms])
                        rel = (
                            F.size(
                                F.array_intersect(
                                    tokens_col(
                                        F.coalesce(
                                            F.col("_anchor"), F.lit("")
                                        )
                                    ),
                                    farr,
                                )
                            )
                            * F.lit(1_000_000)
                            / F.lit(len(f_terms))
                        ).cast("int")
                        candidates = (
                            candidates.join(anchors, "url", "left")
                            .withColumn(
                                "_rel_ppm", F.coalesce(rel, F.lit(0))
                            )
                            .select(
                                "url",
                                F.concat(
                                    F.lpad(
                                        (
                                            F.lit(1_000_000)
                                            - F.col("_rel_ppm")
                                        ).cast("string"),
                                        7,
                                        "0",
                                    ),
                                    F.lit("/"),
                                    F.col("ord_key"),
                                ).alias("ord_key"),
                                "depth",
                                "stype",
                            )
                        )
                # robots first (broadcast lookup, narrow); the in-batch
                # first-discovery dedup runs AFTER the seen anti-join below
                # so both key on url and share ONE exchange — the groupBy
                # reuses the join's hash(url) partitioning instead of
                # paying its own shuffle. Equivalent either way: every
                # duplicate of a url gets the same bloom/anti-join verdict,
                # and min(ord_key) per url is order-independent.
                candidates = robots_filter(candidates, self.robots)
                if cfg.trap_guard:
                    from ..frontier.traps import path_trap_filter

                    candidates = path_trap_filter(
                        candidates,
                        max_depth=cfg.trap_path_depth_max,
                        dup_segment_min=cfg.trap_dup_segment_min,
                    )

                # bloom pre-filter: provably-unseen candidates skip the
                # exact seen anti-join; maybe-seen ones go through it.
                # Below the threshold the exact join alone is cheaper.
                # The filter is INCREMENTAL: full O(|seen|) builds happen
                # only at first activation and at geometric capacity
                # doublings (amortized O(1)/key over the crawl); every
                # other epoch pays only an O(delta) union (see the
                # seen_delta union below), not a rescan of the seen set.
                n_seen_prev = self.store.committed_rows("seen", self._epoch)
                bloom_active = n_seen_prev >= cfg.bloom_min_seen
                if bloom_active:
                    if self._bloom is None or n_seen_prev > self._bloom_capacity:
                        t_bloom = time.time()
                        self._bloom_capacity = max(
                            4 * cfg.bloom_min_seen, 2 * n_seen_prev
                        )
                        if cfg.seen_filter == "cuckoo":
                            from ..frontier.cuckoo import build_sharded_cuckoo

                            self._bloom = build_sharded_cuckoo(
                                seen.select("url_hash"), "url_hash",
                                n_shards=max(cfg.bloom_shards, 1),
                                expected=self._bloom_capacity,
                            )
                        elif cfg.bloom_shards > 1:
                            self._bloom = build_sharded_bloom(
                                seen.select("url_hash"), "url_hash",
                                n_shards=cfg.bloom_shards,
                                expected=self._bloom_capacity, fpp=cfg.bloom_fpp,
                            )
                        else:
                            self._bloom = build_bloom(
                                seen.select("url_hash"), "url_hash",
                                expected=self._bloom_capacity, fpp=cfg.bloom_fpp,
                            )
                        phases["bloom_full_build"] = round(time.time() - t_bloom, 3)
                    bloom = self._bloom
                    hashed = candidates.withColumn("url_hash", F.hash("url"))
                    from ..frontier.cuckoo import (
                        ShardedCuckoo,
                        sharded_cuckoo_prefilter,
                    )

                    if isinstance(bloom, ShardedCuckoo):
                        definitely_new = sharded_cuckoo_prefilter(
                            hashed, "url_hash", bloom, keep_maybe_seen=False
                        ).drop("url_hash")
                        maybe_seen = sharded_cuckoo_prefilter(
                            hashed, "url_hash", bloom, keep_maybe_seen=True
                        ).drop("url_hash")
                    elif isinstance(bloom, ShardedBloom):
                        definitely_new = sharded_bloom_prefilter(
                            hashed, "url_hash", sharded=bloom, keep_maybe_seen=False
                        ).drop("url_hash")
                        maybe_seen = sharded_bloom_prefilter(
                            hashed, "url_hash", sharded=bloom, keep_maybe_seen=True
                        ).drop("url_hash")
                    else:
                        definitely_new = bloom_prefilter(
                            hashed, bloom, "url_hash", keep_maybe_seen=False
                        ).drop("url_hash")
                        maybe_seen = bloom_prefilter(
                            hashed, bloom, "url_hash", keep_maybe_seen=True
                        ).drop("url_hash")
                # ranked IS the pre-dequeue live frontier (pending ∪ this
                # epoch's batch), so anti-joining it covers both the rows
                # still enqueued and the URLs fetched this very epoch —
                # without the batch side a link to a same-epoch-fetched URL
                # would re-enqueue it, re-fetch it next epoch, and append a
                # duplicate seen row, breaking the append-only seen
                # invariant the footer metrics rely on. Anti vs A then
                # anti vs B ≡ anti vs (A ∪ B), so both exclusion sets ride
                # ONE shuffle: seen ∪ ranked in the exact path, ranked
                # alone for bloom-cleared rows (the bloom already proved
                # them unseen).
                ranked_urls = ranked.select("url")
                if bloom_active:
                    survivors = maybe_seen.join(
                        seen.select("url").unionByName(ranked_urls),
                        "url",
                        "left_anti",
                    )
                    candidates = definitely_new.join(
                        ranked_urls, "url", "left_anti"
                    ).unionByName(survivors)
                else:
                    candidates = candidates.join(
                        seen.select("url").unionByName(ranked_urls),
                        "url",
                        "left_anti",
                    )
                candidates = first_discovery_wins(candidates)
                new_frontier_rows = with_frontier_columns(
                    candidates, epoch=epoch, salt_buckets=cfg.salt_buckets
                )

            # --- retry bookkeeping (T7/T9) ----------------------------------
            # a retry is RE-ENQUEUED at this epoch: discovered_epoch moves
            # to `epoch` so the row survives its own dequeue tombstone
            # (tombstones kill rows enqueued strictly before their epoch)
            retry = (
                misses.filter(F.col("attempts") + 1 < cfg.max_attempts)
                .withColumn("attempts", F.col("attempts") + 1)
                .withColumn("discovered_epoch", F.lit(epoch))
                .select(*frontier_cols)
            )
            parked = (
                misses.filter(F.col("attempts") + 1 >= cfg.max_attempts)
                .select(
                    "url", "url_hash", "host", "stype",
                    F.lit("failed").alias("status"),
                    "ord_key", "depth", F.lit(epoch).alias("fetched_epoch"),
                )
            )
            fetched_seen = fetched.select(
                "url", "url_hash", "host", "stype",
                F.lit("ok").alias("status"),
                "ord_key", "depth", F.lit(epoch).alias("fetched_epoch"),
            )
            if dup_pages is not None:
                # byte-duplicate bodies were fetched (they consumed a
                # politeness slot) but not processed — status "dup" keeps
                # them out of both ok and failed accounting
                fetched_seen = fetched_seen.unionByName(
                    dup_pages.select(
                        "url", "url_hash", "host", "stype",
                        F.lit("dup").alias("status"),
                        "ord_key", "depth", F.lit(epoch).alias("fetched_epoch"),
                    )
                )

            # --- dedup-merge commits ----------------------------------------
            # seen is APPEND-ONLY: every dequeued url is new to it by
            # construction (candidates were anti-joined against seen before
            # entering the frontier), so the epoch writes an O(batch) delta,
            # never an O(|seen|) rewrite — Iceberg's append commit.
            # The frontier is merge-on-read: a normal epoch appends ONLY the
            # O(delta) enqueue rows (retry + discovered) and the O(batch)
            # dequeue tombstones. Compaction epochs — triggered when
            # tombstones exceed compact_ratio × live — fold everything into
            # a fresh O(live) base instead (Iceberg rewrite_data_files).
            seen_delta = fetched_seen.unionByName(parked)
            frontier_delta = retry
            if new_frontier_rows is not None:
                frontier_delta = frontier_delta.unionByName(new_frontier_rows)

            base_entry = self._frontier_base_entry()
            tombs_since_base = (
                self.store.committed_rows(
                    "frontier_tomb", self._epoch, after_epoch=base_entry["epoch"]
                )
                + n_batch
            )
            compact = tombs_since_base >= max(
                cfg.compact_min_tombstones, cfg.compact_ratio * n_frontier
            )

            # commits are independent Spark jobs over different tables —
            # submit them from threads so their stages interleave (store
            # serializes the manifest updates). Same pool as the async
            # extraction commits above: everything resolves together here.
            if compact:
                # pending ∪ retry ∪ discovered IS the post-epoch live
                # frontier: committing it as the new base folds every
                # outstanding delta and tombstone in one O(live) write
                # partition count left to AQE: O(live) bases fan out,
                # near-drained ones coalesce instead of writing 32
                # near-empty files
                new_base = pending_after.unionByName(frontier_delta).repartition(
                    "host_salt"
                )
                f_futs = {
                    "frontier_base": pool.submit(
                        self.store.commit, "frontier_base", new_base, epoch
                    )
                }
            else:
                tomb_delta = batch.select(
                    "url", F.lit(epoch).alias("tomb_epoch")
                )
                f_futs = {
                    "frontier_delta": pool.submit(
                        self.store.commit,
                        "frontier_delta",
                        # written with whatever (AQE-coalesced)
                        # partitioning the candidate anti-joins left —
                        # a host_salt repartition here would be a whole
                        # extra Exchange per epoch for clustering the
                        # NEXT dequeue's window re-shuffles anyway;
                        # only the long-lived compacted base (below)
                        # pays for salt clustering. Retry rows ≤ batch
                        # and discovered rows ≤ links, so their sum
                        # upper-bounds the delta for write sizing.
                        _coalesce_for_write(
                            frontier_delta,
                            n_batch + n_links,
                            cfg.write_rows_per_file,
                        ),
                        epoch,
                        mode="append",
                    ),
                    "frontier_tomb": pool.submit(
                        self.store.commit,
                        "frontier_tomb",
                        _coalesce_for_write(
                            tomb_delta, n_batch, cfg.write_rows_per_file
                        ),
                        epoch,
                        mode="append",
                    ),
                }
            s_fut = pool.submit(
                self.store.commit,
                "seen",
                # seen delta = fetched ∪ parked ⊆ batch, exactly n_batch
                # rows at most
                _coalesce_for_write(seen_delta, n_batch, cfg.write_rows_per_file),
                epoch,
                mode="append",
            )
            fl_fut = None
            if cfg.fetch_policy is not None:
                # S2/S3 lineage: which UA/session/proxy each request
                # used this epoch — the distributed analog of the
                # reference's per-request session logging. Only
                # committed when a policy is configured (zero cost
                # otherwise).
                fetch_log = batch.select(
                    "url", "host", "user_agent", "session_id", "proxy",
                    F.lit(epoch).alias("epoch"),
                )
                fl_fut = pool.submit(
                    self.store.commit,
                    "fetch_log",
                    _coalesce_for_write(
                        fetch_log, n_batch, cfg.write_rows_per_file
                    ),
                    epoch,
                    mode="append",
                )
            # per-partition lineage (north star) is NOT committed per
            # epoch: partition_metrics() derives the identical (host,
            # status, urls, depth-range, epoch) rows from the seen
            # deltas on read, so the epoch skips one write job
            for name, fut in f_futs.items():
                tables[name] = fut.result()
            ssnap = s_fut.result()
            if fl_fut is not None:
                tables["fetch_log"] = fl_fut.result()
            for name, fut in async_commits.items():
                if name == "_index":
                    tables.update(fut.result())
                else:
                    tables[name] = fut.result()
        finally:
            # opened at pool creation (review fix): any exception in
            # the frontier pipeline between submit and result now
            # cancels queued commits and awaits running ones instead
            # of leaking the pool with background futures still
            # writing (their snapshots stay orphaned — commit_epoch
            # never runs on the failure path, so resume ignores them)
            pool.shutdown(wait=True, cancel_futures=True)
        mark("merge_commits")
        tables["seen"] = ssnap

        # --- incremental bloom maintenance -----------------------------
        # OR-in only this epoch's seen DELTA (O(delta), not O(|seen|))
        # and persist the bitmap; written BEFORE commit_epoch so a crash
        # leaves a blob whose epoch exceeds the committed one — a
        # superset, which resume accepts safely
        if self._bloom is not None:
            from ..frontier.cuckoo import ShardedCuckoo, add_delta_sharded

            if isinstance(self._bloom, ShardedCuckoo):
                # cuckoo delta: cogroup the epoch's seen delta against
                # only the touched shard blobs — O(delta + dirty
                # shards), the same class as the bloom's delta union
                self._bloom = add_delta_sharded(
                    self._bloom, seen_delta.select("url_hash"), "url_hash"
                )
                self.store.commit_blob(
                    "seen_bloom", self._bloom.to_bytes(), epoch,
                    {"cuckoo": True, "capacity": self._bloom_capacity},
                )
            else:
                if isinstance(self._bloom, ShardedBloom):
                    delta_bloom = build_sharded_bloom(
                        seen_delta.select("url_hash"), "url_hash",
                        n_shards=self._bloom.n_shards, expected=1,
                        n_bits=self._bloom.n_bits, k=self._bloom.k,
                    )
                    meta = {
                        "sharded": True, "capacity": self._bloom_capacity,
                    }
                else:
                    delta_bloom = build_bloom(
                        seen_delta.select("url_hash"), "url_hash",
                        expected=1, n_bits=self._bloom.n_bits, k=self._bloom.k,
                    )
                    meta = {
                        "n_bits": self._bloom.n_bits,
                        "k": self._bloom.k,
                        "capacity": self._bloom_capacity,
                    }
                self._bloom = self._bloom.union(delta_bloom)
                self.store.commit_blob(
                    "seen_bloom", self._bloom.to_bytes(), epoch, meta
                )
            mark("bloom_delta")

        delta_rows = _snapshot_rows(self.store, "seen", ssnap)
        seen_now = self.store.committed_rows("seen", self._epoch) + delta_rows
        # parked-failed count from footer math — no extra Spark action
        # (delta = ok + dup + parked; n_fetched counts ok + dup)
        n_failed = delta_rows - n_fetched
        # frontier accounting, all footer math: live = pending + rows
        # enqueued this epoch; the enqueued count falls out of the
        # delta snapshot (normal epoch) or base − pending (compaction)
        n_pending = n_frontier - n_batch
        if compact:
            base_rows = _snapshot_rows(
                self.store, "frontier_base", tables["frontier_base"]
            )
            enqueued_rows = base_rows - n_pending
            live_after = base_rows
            tombs_outstanding = 0
        else:
            enqueued_rows = _snapshot_rows(
                self.store, "frontier_delta", tables["frontier_delta"]
            )
            live_after = n_pending + enqueued_rows
            tombs_outstanding = tombs_since_base

        # --- hot-state carry ---------------------------------------------
        # Materialize the post-epoch live frontier / seen set in memory
        # so the next epoch never re-reads the base∪deltas∖tombstones
        # parquet chain it just wrote (the cold merge-on-read scan costs
        # O(committed deltas) per epoch — O(epochs²) over a long crawl).
        # Deltas are read back from the snapshots JUST written (no
        # recompute, bit-identical to a cold reader); localCheckpoint
        # truncates lineage so plans don't grow with the epoch count.
        # Checkpointed here (inside the timed epoch, before the
        # unpersist sweep — pending_after references the cached ranked)
        # but ASSIGNED only after commit_epoch below, so a crash leaves
        # the carry at the last committed epoch.
        hot_f_cp = hot_s_cp = None
        if (
            cfg.hot_state_max_rows is not None
            and live_after <= cfg.hot_state_max_rows
            and seen_now <= cfg.hot_state_max_rows
        ):
            if compact:
                hot_f = self.store.read(
                    self.spark, "frontier_base", tables["frontier_base"]
                )
            else:
                hot_f = pending_after
                if enqueued_rows:
                    hot_f = hot_f.unionByName(
                        self.store.read(
                            self.spark, "frontier_delta",
                            tables["frontier_delta"],
                        )
                    )
            hot_s = self.store.read(self.spark, "seen", ssnap)
            if seen is not None and seen_now > delta_rows:
                hot_s = seen.unionByName(hot_s)
            # two independent materialization jobs — interleave them
            with ThreadPoolExecutor(2) as cp:
                f_cp = cp.submit(hot_f.localCheckpoint, eager=True)
                s_cp = cp.submit(hot_s.localCheckpoint, eager=True)
                hot_f_cp = f_cp.result()
                hot_s_cp = s_cp.result()
            mark("hot_carry")

        duration = time.time() - t0
        metrics = {
            "dequeued": n_batch,
            "fetched_ok": n_fetched,
            "fetch_miss": n_batch - n_fetched,
            "dup_bodies": n_dup,
            "noindex_pages": n_noindex,
            "nofollow_pages": n_nofollow,
            "failed_parked": n_failed,
            "new_frontier_rows": enqueued_rows,
            "frontier_live": live_after,
            "frontier_tombstones": tombs_outstanding,
            "compacted": compact,
            "seen_total": seen_now,
            "articles_rows": _snapshot_rows(self.store, "articles", tables.get("articles")),
            "products_rows": _snapshot_rows(self.store, "products", tables.get("products")),
            "businesses_rows": _snapshot_rows(
                self.store, "businesses", tables.get("businesses")
            ),
            "duration_s": round(duration, 3),
            "urls_per_sec": round(n_batch / duration, 2) if duration > 0 else None,
            "phases": phases,
        }
        self.store.commit_epoch(epoch, tables, metrics)
        self._epoch = epoch
        if compact:
            # deltas/tombstones folded into the new base are dead for
            # every reader at or after this epoch — drop their dirs
            # (manifest lineage rows remain, paths nulled)
            # force: these append deltas are committed-referenced but
            # dead — every reader at or after this epoch uses the new
            # base + after_epoch, never their union
            self.store.expire_snapshots("frontier_delta", keep_last=0, force=True)
            self.store.expire_snapshots("frontier_tomb", keep_last=0, force=True)
        if cfg.expire_frontier_keep is not None:
            self.store.expire_snapshots(
                "frontier_base", keep_last=cfg.expire_frontier_keep
            )
        # bloom blobs are full bitmaps, one per epoch — only the
        # latest matters (it contains all earlier keys), so cleanup is
        # unconditional: gating it on frontier-base retention would
        # make expire_frontier_keep=None retain O(epochs x |seen|)
        # bitmap bytes forever
        self.store.expire_snapshots("seen_bloom", keep_last=2)

        # adopt the carry only once the epoch is committed; past the
        # cap both are None and readers fall back to the store's
        # merge-on-read scan. The REPLACED epoch's checkpoint blocks
        # are freed eagerly: ContextCleaner GC is lazy, and a
        # long-running driver (scheduler running many crawls per
        # session) would otherwise accumulate unevictable storage
        # blocks from every past epoch until the JVM collects them.
        old_f, old_s = self._hot_frontier, self._hot_seen
        self._hot_frontier = hot_f_cp
        self._hot_seen = hot_s_cp
        if old_f is not None and old_f is not hot_f_cp:
            _free_local_checkpoint(old_f)
        if old_s is not None and old_s is not hot_s_cp:
            _free_local_checkpoint(old_s)

        for df in to_unpersist:
            df.unpersist()
        return {"epoch": epoch, "done": False, **metrics}

    def run(self, max_epochs: int = 100) -> List[Dict]:
        """Run epochs until the frontier drains (T1's batch-loop model)."""
        results = []
        for _ in range(max_epochs):
            result = self.run_epoch()
            results.append(result)
            if result.get("done"):
                break
        return results

    def enqueue_revisits(
        self,
        hints: Optional[DataFrame] = None,
        epoch_hours: int = 24,
        default_hours: int = 168,
        modified_since: Optional[str] = None,
        statuses: Sequence[str] = ("ok", "dup"),
    ) -> int:
        """Freshness-driven re-enqueue (Nutch's adaptive fetch schedule;
        the continuous-crawl counterpart of the reference's one-shot
        ``urls`` loop). Joins the seen set against sitemap hints via
        :func:`frontier.recrawl.recrawl_due` and appends the DUE urls
        back into the frontier as a scheduling-only epoch:

        - ``hints``: sitemap entries (url, lastmod, changefreq,
          priority_ppm) from ``frontier.sitemap.sitemap_candidates``;
          None → every eligible url uses ``default_hours``.
        - Due urls re-enter with their ORIGINAL (stype, depth, ord_key)
          — taken from each url's latest seen row via a deterministic
          max-struct aggregate — so revisit dequeue order is as
          reproducible as first-visit order. ``attempts`` resets to 0.
        - Urls still live in the frontier (pending, or re-enqueued by
          an earlier revisit) are excluded by an anti-join: one url,
          one live frontier row, always.
        - The merge-on-read tombstone rule (dead iff a tombstone with
          ``tomb_epoch > discovered_epoch`` exists) already composes
          over enqueue/dequeue cycles, so revisit rows need no new
          frontier machinery; the refetch appends a SECOND seen row for
          the url (multi-capture history — downstream consumers that
          need one row per url take the latest, exactly like
          ``sources.warc.latest_captures``).
        - ``statuses``: which urls are revisit-eligible, judged by each
          url's LATEST seen row — a url whose most recent capture is a
          parked failure stays terminal by default even if an earlier
          capture succeeded (reference parity — its failed set is
          final); re-admit failures explicitly with
          ``statuses=("ok", "dup", "failed")``.

        Commits consume one manifest epoch with ``dequeued=0`` and a
        ``revisits`` count (crash-safe like any epoch: an un-committed
        delta is ignored on resume). Returns the number of re-enqueued
        urls; 0 leaves the store and epoch counter untouched. The
        frontier hot carry predates the new delta and is dropped; the
        seen carry is unchanged and kept.

        Scale shape: one groupBy(url) over seen + one broadcast-able
        hint join (recrawl_due) + one anti-join against the live
        frontier — all url-keyed, no new shuffle class; the delta write
        is O(due), never O(|frontier|).
        """
        from ..frontier.recrawl import recrawl_due

        epoch = self._epoch + 1
        if hints is None:
            hints = self.spark.createDataFrame(
                [],
                "url string, lastmod string, changefreq string, "
                "priority_ppm int",
            )
        # ONE url-keyed aggregate over seen: the max-struct picks each
        # url's latest row (fetched_epoch is unique per url, so the
        # result is deterministic under any partitioning) and carries
        # BOTH the eligibility status and the dequeue identity the
        # revisit reuses. Eligibility is judged on the LATEST row —
        # a url parked 'failed' after an earlier 'ok' is terminal, not
        # retried forever with attempts reset. recrawl_due's own
        # groupBy(url) then runs exchange-free on this already
        # url-partitioned, url-unique input.
        latest = (
            self.seen()
            .select(
                "url",
                F.struct(
                    "fetched_epoch", "status", "ord_key", "depth", "stype"
                ).alias("_s"),
            )
            .groupBy("url")
            .agg(F.max("_s").alias("_s"))
            .select(
                "url", "_s.fetched_epoch", "_s.status",
                "_s.stype", "_s.depth", "_s.ord_key",
            )
            .filter(F.col("status").isin(list(statuses)))
        )
        due = recrawl_due(
            latest,
            hints,
            current_epoch=epoch,
            epoch_hours=epoch_hours,
            default_hours=default_hours,
            modified_since=modified_since,
        ).select("url")
        cand = (
            due.join(latest.select("url", "stype", "depth", "ord_key"), "url")
            .join(self.frontier().select("url"), "url", "left_anti")
        )
        rows = with_frontier_columns(
            cand, epoch=epoch, salt_buckets=self.cfg.salt_buckets
        ).persist()
        n = rows.count()
        if n == 0:
            rows.unpersist()
            return 0
        snap = self.store.commit(
            "frontier_delta",
            _coalesce_for_write(rows, n, self.cfg.write_rows_per_file),
            epoch,
            mode="append",
        )
        metrics = {"revisits": n, "dequeued": 0}
        if modified_since is not None:
            # recorded so schedulers can apply a configured cutoff ONCE
            # per store: the modified rule compares publisher lastmod to
            # a constant, so re-passing the same cutoff would make the
            # matching urls due on every firing forever
            metrics["modified_since"] = modified_since
        self.store.commit_epoch(epoch, {"frontier_delta": snap}, metrics)
        self._epoch = epoch
        rows.unpersist()
        old_f = self._hot_frontier
        self._hot_frontier = None
        if old_f is not None:
            _free_local_checkpoint(old_f)
        return n

    def close(self) -> None:
        """Release driver-held state: the hot-carry checkpoint blocks.

        Everything the engine computed lives in the store's committed
        snapshots — close() loses nothing. A new engine over the same
        store resumes from the manifest (test_resume_equals_uninterrupted);
        only the in-memory fast path is dropped. Call when the crawl is
        finished in a session that keeps running (scheduler loops,
        benchmarks): checkpoint blocks are unevictable until the lazy
        ContextCleaner collects them, so back-to-back crawls would
        otherwise stack dead epochs' blocks in executor storage memory.
        """
        old_f, old_s = self._hot_frontier, self._hot_seen
        self._hot_frontier = None
        self._hot_seen = None
        if old_f is not None:
            _free_local_checkpoint(old_f)
        if old_s is not None:
            _free_local_checkpoint(old_s)


def _free_local_checkpoint(df: DataFrame) -> None:
    """Eagerly unpersist a ``localCheckpoint`` DataFrame's blocks.

    ``localCheckpoint`` materializes to storage blocks owned by the
    checkpointed internal RDD (the DataFrame's plan is a LogicalRDD
    over it); there is no public DataFrame-level unpersist for it, so
    reach the RDD through the analyzed plan. Best-effort: on Connect
    or a plan shape without ``rdd()`` the blocks are left to the
    ContextCleaner, which is the status quo."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass


def _coalesce_for_write(
    df: DataFrame, est_rows: Optional[int], rows_per_file: Optional[int]
) -> DataFrame:
    """Clamp a commit's write fan-out to ``ceil(est_rows /
    rows_per_file)`` tasks (CrawlConfig.write_rows_per_file).

    ``coalesce`` is a narrow dependency: it only ever REDUCES the task
    count (a target above the current partition count is a no-op), so
    large deltas keep their full parallel write and no shuffle is ever
    added. The estimates callers pass are upper bounds the epoch
    already computed (batch size, link count, cached extraction
    counts), so the clamp only bites when the delta is genuinely
    small — the case where one near-empty file per upstream partition
    would otherwise pile up in the per-epoch read-back union."""
    if rows_per_file is None or est_rows is None:
        return df
    return df.coalesce(max(1, -(-est_rows // rows_per_file)))


def canonical_url_col(col: str):
    """Engine canonicalization (F21) in native expressions, matching
    urlutils.canonicalize_url for http(s)/ftp URLs: lowercase
    scheme+netloc, strip the scheme's DEFAULT port only (a non-default
    port like :8080 is part of the URL's identity — parse_url's HOST
    would silently drop it and drift from the Python twin/simulator),
    strip fragment, keep path+query, '/' for empty path. JVM-side —
    no Python in this hot path."""
    scheme = F.lower(F.regexp_extract(F.col(col), r"^([A-Za-z][A-Za-z0-9+.-]*):", 1))
    scheme = F.when(scheme == "", F.lit("http")).otherwise(scheme)
    # AUTHORITY = userinfo@host:port — same as urlparse().netloc
    netloc = F.lower(F.try_parse_url(F.col(col), F.lit("AUTHORITY")))
    netloc = (
        F.when(scheme == "http", F.regexp_replace(netloc, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(netloc, ":443$", ""))
        .when(scheme == "ftp", F.regexp_replace(netloc, ":21$", ""))
        .otherwise(netloc)
    )
    path = F.try_parse_url(F.col(col), F.lit("PATH"))
    path = F.when(path.isNull() | (path == ""), F.lit("/")).otherwise(path)
    query = F.try_parse_url(F.col(col), F.lit("QUERY"))
    canon = F.concat(
        scheme, F.lit("://"), netloc, path,
        F.when(query.isNull() | (query == ""), F.lit("")).otherwise(
            F.concat(F.lit("?"), query)
        ),
    )
    # a URL Java's parser rejects (embedded space, bad scheme chars —
    # try_parse_url nulls the netloc) passes through RAW rather than
    # nulling out or killing the stage under ANSI mode; such URLs then
    # miss the fetch join and park as failed, which is the honest
    # outcome for garbage hrefs at crawl scale
    return F.when(netloc.isNull(), F.col(col)).otherwise(canon)


def merge_articles(raw: DataFrame) -> DataFrame:
    """J1 — the listing ⟕ full merge (content.py:160-165) as a
    DataFrame join: listing value wins when truthy ('' / [] / {} / NULL
    lose). Listing-only and full-only rows pass through (full outer)."""
    listing = raw.filter(F.col("row_kind") == "listing").alias("l")
    full = raw.filter(F.col("row_kind") == "full").alias("f")

    def prefer(col: str, empty_test):
        lcol, fcol = F.col(f"l.{col}"), F.col(f"f.{col}")
        return F.when(lcol.isNull() | empty_test(lcol), F.coalesce(fcol, lcol)).otherwise(lcol)

    str_empty = lambda c: c == ""  # noqa: E731
    arr_empty = lambda c: F.size(c) == 0  # noqa: E731

    joined = listing.join(full, F.col("l.url") == F.col("f.url"), "full_outer")
    url = F.coalesce(F.col("l.url"), F.col("f.url"))
    return joined.select(
        url.alias("url"),
        F.coalesce(F.col("l.src_url"), F.col("f.src_url")).alias("src_url"),
        prefer("title", str_empty).alias("title"),
        prefer("date", str_empty).alias("date"),
        prefer("author", str_empty).alias("author"),
        prefer("content", str_empty).alias("content"),
        prefer("excerpt", str_empty).alias("excerpt"),
        prefer("image", str_empty).alias("image"),
        prefer("images", arr_empty).alias("images"),
        prefer("categories", arr_empty).alias("categories"),
        prefer("metadata", lambda c: F.size(F.map_keys(c)) == 0).alias("metadata"),
        prefer("keywords", arr_empty).alias("keywords"),
        F.coalesce(F.col("l.item_pos"), F.col("f.item_pos")).alias("item_pos"),
        F.when(
            F.col("l.url").isNotNull() & F.col("f.url").isNotNull(), F.lit("merged")
        )
        .when(F.col("l.url").isNotNull(), F.lit("listing"))
        .otherwise(F.lit("full"))
        .alias("merge_kind"),
    )


def _snapshot_rows(store: SnapshotStore, table: str, snap_id: Optional[int]) -> int:
    for entry in store.snapshots(table):
        if entry["id"] == snap_id:
            return entry["rows"]
    return 0
