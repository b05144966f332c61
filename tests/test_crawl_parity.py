"""Crawl parity: the Spark epoch engine vs the sequential
reference-semantics simulator over the same synthetic site
(SURVEY.md §5.2-1/2; BASELINE.json invariants).

Asserts, under the same seed list + politeness/robots/depth policy:
- identical final URL-seen sets (url → ok|failed),
- identical crawl ordering (engine ok-visits sorted by ord_key ==
  simulator's sequential visit order),
- byte-identical extracted article ``content`` per url (and equality of
  every other extracted field) — the input_hint invariant,
- product/business row parity,
- resumability: interrupt after epoch k, resume, equal final state.
"""

import pytest

from web_scrapper_spark.crawl.epoch import CrawlConfig, CrawlEngine
from web_scrapper_spark.crawl.simulator import merged_articles, simulate_crawl
from web_scrapper_spark.fixtures import (
    SiteSpec,
    all_urls,
    page_html,
    pages_dataframe,
    robots_dataframe,
    robots_rules,
    seed_urls,
)
from web_scrapper_spark.fixtures.sitegen import PAGES_SCHEMA
from web_scrapper_spark.frontier.store import SnapshotStore

SPEC = SiteSpec()


def _seeds():
    def stype(url):
        if url.endswith("/products"):
            return "ecommerce"
        if url.endswith("/directory"):
            return "business"
        return "content"

    return [(u, stype(u)) for u in seed_urls(SPEC)] + [
        # a seed that exists nowhere in the pages table → retry ×3 → failed
        ("https://host0.example-crawl.org/gone", "content")
    ]


def _pages_map():
    return {u: page_html(u, SPEC).encode("utf-8") for u in all_urls(SPEC)}


@pytest.fixture(scope="module")
def engine_state(spark, tmp_path_factory):
    store = SnapshotStore(str(tmp_path_factory.mktemp("crawl") / "store"))
    pages = pages_dataframe(spark, SPEC).persist()
    engine = CrawlEngine(
        spark, store, pages, robots_dataframe(spark, SPEC), CrawlConfig()
    )
    engine.init(_seeds())
    results = engine.run(max_epochs=30)
    return engine, results


@pytest.fixture(scope="module")
def sim():
    return simulate_crawl(
        _pages_map(), _seeds(), robots_rules(SPEC), max_depth=CrawlConfig().max_depth
    )


def test_terminates(engine_state):
    engine, results = engine_state
    assert results[-1]["done"]
    assert len(results) > 2  # multi-epoch crawl, not a single batch


def test_seen_set_parity(engine_state, sim):
    engine, _ = engine_state
    engine_seen = {
        r["url"]: r["status"] for r in engine.seen().collect()
    }
    assert engine_seen == sim.seen


def test_failed_seed_parked(engine_state):
    engine, _ = engine_state
    failed = [r["url"] for r in engine.seen().filter("status = 'failed'").collect()]
    assert failed == ["https://host0.example-crawl.org/gone"]


def test_visit_order_parity(engine_state, sim):
    engine, _ = engine_state
    rows = (
        engine.seen().filter("status = 'ok'").select("url", "ord_key").collect()
    )
    engine_order = [r["url"] for r in sorted(rows, key=lambda r: r["ord_key"])]
    assert engine_order == sim.visit_order
    engine_keys = {r["url"]: r["ord_key"] for r in rows}
    assert engine_keys == {u: k for u, k in sim.ord_keys.items() if sim.seen[u] == "ok"}


def test_robots_respected(engine_state, sim):
    engine, _ = engine_state
    seen_urls = set(sim.seen)
    # host0 disallows /private → never fetched there; host1-3 allow it
    assert "https://host0.example-crawl.org/private/internal" not in seen_urls
    assert "https://host1.example-crawl.org/private/internal" in seen_urls
    engine_urls = {r["url"] for r in engine.seen().collect()}
    assert "https://host0.example-crawl.org/private/internal" not in engine_urls


def _article_key(row):
    return (row["src_url"], row["item_pos"])


def test_article_parity_byte_identical(engine_state, sim):
    engine, _ = engine_state
    engine_rows = {_article_key(r): r.asDict() for r in engine.articles().collect()}
    sim_rows = {_article_key(a): a for a in merged_articles(sim)}
    assert set(engine_rows) == set(sim_rows)
    for key, sim_row in sim_rows.items():
        eng = engine_rows[key]
        for field in (
            "url", "title", "date", "author", "content", "excerpt", "image",
            "images", "categories", "metadata", "keywords", "merge_kind",
        ):
            assert eng.get(field) == sim_row.get(field), (key, field)
        # the input_hint invariant, stated explicitly:
        if sim_row.get("content"):
            assert eng["content"].encode("utf-8") == sim_row["content"].encode("utf-8")


def test_content_matches_pages_text_column(engine_state):
    """Article content must equal the pages table's precomputed ``text``
    column (FIXTURES.md §1) — byte identity against stored truth."""
    engine, _ = engine_state
    arts = (
        engine.articles()
        .filter("merge_kind in ('merged','full') and content is not null")
        .select("url", "content")
    )
    pages = engine.pages.select("url", "text")
    diff = arts.join(pages, "url").filter("content <> text").count()
    assert diff == 0
    assert arts.count() > 10


def test_product_parity(engine_state, sim):
    engine, _ = engine_state
    engine_rows = {
        (r["src_url"], r["item_pos"]): r.asDict() for r in engine.products().collect()
    }
    sim_rows = {(p["src_url"], p["item_pos"]): p for p in sim.products}
    assert set(engine_rows) == set(sim_rows)
    for key, sim_row in sim_rows.items():
        eng = engine_rows[key]
        for field in ("name", "price", "currency", "url", "availability", "images"):
            assert eng[field] == sim_row.get(field), (key, field)
        sim_reviews = sim_row.get("reviews")
        eng_reviews = eng["reviews"].asDict() if eng["reviews"] else None
        if sim_reviews:
            assert eng_reviews == {
                "rating": sim_reviews.get("rating"),
                "count": sim_reviews.get("count"),
            }


def test_business_parity(engine_state, sim):
    engine, _ = engine_state
    engine_rows = {
        (r["src_url"], r["item_pos"]): r.asDict() for r in engine.businesses().collect()
    }
    sim_rows = {(b["src_url"], b["item_pos"]): b for b in sim.businesses}
    assert set(engine_rows) == set(sim_rows)
    for key, sim_row in sim_rows.items():
        eng = engine_rows[key]
        for field in ("name", "address", "phone", "email", "website", "categories"):
            assert eng[field] == sim_row.get(field), (key, field)
        assert eng["social_media"] == sim_row.get("social_media", {})


def test_metrics_lineage(engine_state):
    engine, _ = engine_state
    metrics = engine.metrics()
    crawl_epochs = [m for m in metrics if m["epoch"] >= 0]
    assert all("urls_per_sec" in m for m in crawl_epochs)
    assert sum(m["dequeued"] for m in crawl_epochs) >= len(_seeds())


def test_resume_equals_uninterrupted(spark, tmp_path, engine_state, sim):
    """§5.2-5: run 2 epochs, 'crash', resume from the manifest, finish;
    final seen-set equals the uninterrupted run's."""
    store = SnapshotStore(str(tmp_path / "resume-store"))
    pages = pages_dataframe(spark, SPEC)
    robots = robots_dataframe(spark, SPEC)
    engine = CrawlEngine(spark, store, pages, robots, CrawlConfig())
    engine.init(_seeds())
    engine.run_epoch()
    engine.run_epoch()
    del engine  # crash

    resumed = CrawlEngine.resume(spark, store, pages, robots, CrawlConfig())
    resumed.run(max_epochs=30)
    seen = {r["url"]: r["status"] for r in resumed.seen().collect()}
    assert seen == sim.seen
    full_engine, _ = engine_state
    assert seen == {r["url"]: r["status"] for r in full_engine.seen().collect()}


def test_close_frees_hot_state_and_keeps_store_resumable(
    spark, tmp_path, sim
):
    """close() drops the hot-carry localCheckpoint blocks (long-running
    drivers must not accumulate dead epochs' storage) while losing
    nothing durable: a fresh engine over the same store finishes the
    crawl to the simulator's exact seen-set."""
    store = SnapshotStore(str(tmp_path / "close-store"))
    pages = pages_dataframe(spark, SPEC)
    robots = robots_dataframe(spark, SPEC)
    engine = CrawlEngine(spark, store, pages, robots, CrawlConfig())
    engine.init(_seeds())
    engine.run_epoch()
    engine.run_epoch()

    jsc = spark.sparkContext._jsc.sc()
    before = len(jsc.getRDDStorageInfo())
    engine.close()
    after = len(jsc.getRDDStorageInfo())
    assert engine._hot_frontier is None and engine._hot_seen is None
    assert after < before  # the two hot-carry checkpoints are gone
    engine.close()  # idempotent

    resumed = CrawlEngine.resume(spark, store, pages, robots, CrawlConfig())
    resumed.run(max_epochs=30)
    seen = {r["url"]: r["status"] for r in resumed.seen().collect()}
    assert seen == sim.seen
    resumed.close()


def test_resume_ignores_orphan_snapshots(spark, tmp_path, engine_state, sim):
    """Crash MID-epoch: table snapshots written but commit_epoch never
    reached. Resume must treat the epoch as never having happened —
    orphan deltas invisible in seen()/articles() — and re-running must
    converge to the uninterrupted final state with no duplicates."""
    from pyspark.sql import functions as F

    store = SnapshotStore(str(tmp_path / "orphan-store"))
    pages = pages_dataframe(spark, SPEC)
    robots = robots_dataframe(spark, SPEC)
    engine = CrawlEngine(spark, store, pages, robots, CrawlConfig())
    engine.init(_seeds())
    engine.run_epoch()
    seen_after_0 = sorted(r["url"] for r in engine.seen().collect())

    # simulate a crash mid-epoch-1: seen/articles deltas durable,
    # epoch record absent (run_epoch commits snapshots before
    # commit_epoch, so this is exactly the partial state a kill leaves)
    orphan_seen = engine.seen().limit(3).withColumn(
        "fetched_epoch", F.lit(1)
    )
    store.commit("seen", orphan_seen, epoch=1)
    orphan_articles = spark.createDataFrame(
        [("https://x.org/a", "full")], "src_url string, row_kind string"
    )
    store.commit("articles", orphan_articles, epoch=1)

    resumed = CrawlEngine.resume(spark, store, pages, robots, CrawlConfig())
    # orphan rows invisible before any new epoch
    assert sorted(r["url"] for r in resumed.seen().collect()) == seen_after_0
    arts = resumed.articles(merged=False)
    if arts is not None:
        assert arts.filter(F.col("src_url") == "https://x.org/a").count() == 0

    resumed.run(max_epochs=30)
    seen = {r["url"]: r["status"] for r in resumed.seen().collect()}
    assert seen == sim.seen
    # no url appears twice (the re-run epoch 1 must not double-append)
    urls = [r["url"] for r in resumed.seen().collect()]
    assert len(urls) == len(set(urls))


def test_frontier_writes_scale_with_delta_not_frontier(spark, tmp_path):
    """Merge-on-read write-amplification bound: a normal epoch's
    frontier bytes are the enqueue delta + dequeue tombstones — NEVER a
    rewrite of the |frontier| pending rows (compaction disabled here
    via a huge tombstone floor)."""
    store = SnapshotStore(str(tmp_path / "wamp-store"))
    pages = pages_dataframe(spark, SPEC)
    robots = robots_dataframe(spark, SPEC)
    cfg = CrawlConfig(compact_min_tombstones=10**9)
    engine = CrawlEngine(spark, store, pages, robots, cfg)
    engine.init(_seeds())
    results = []
    for _ in range(6):
        result = engine.run_epoch()
        if result.get("done"):
            break
        results.append(result)

    for r in results:
        epoch = r["epoch"]
        if epoch == 0:
            continue  # no pending rows yet — nothing to prove
        delta_rows = sum(
            s["rows"] for s in store.snapshots("frontier_delta")
            if s["epoch"] == epoch
        )
        tomb_rows = sum(
            s["rows"] for s in store.snapshots("frontier_tomb")
            if s["epoch"] == epoch
        )
        # per-epoch write = enqueued + dequeued rows exactly; the
        # pending frontier (live - dequeued) is NOT rewritten
        assert delta_rows == r["new_frontier_rows"]
        assert tomb_rows == r["dequeued"]
        assert not store.snapshots("frontier")  # old rewrite table gone
        # base untouched after init: one snapshot, epoch -1
        assert [s["epoch"] for s in store.snapshots("frontier_base")] == [-1]
        # footer math agrees with the live count the engine reports
        assert r["frontier_live"] == engine._frontier_live_rows() or epoch != results[-1]["epoch"]


def test_small_delta_commits_write_one_file(spark, tmp_path):
    """Write sizing (CrawlConfig.write_rows_per_file): every per-epoch
    delta far below the rows-per-file target lands in exactly ONE data
    file instead of one near-empty file per upstream partition — the
    read-back union over a long crawl stays O(epochs) files. The clamp
    is narrow-only: a big estimate must leave partitioning untouched."""
    import glob
    import os

    from web_scrapper_spark.crawl.epoch import _coalesce_for_write

    # narrow-only clamp: estimate >> rows_per_file keeps the fan-out
    wide = spark.range(0, 1000, 1, 16)
    assert _coalesce_for_write(wide, 64_000_000, 1_000_000).rdd.getNumPartitions() == 16
    assert _coalesce_for_write(wide, 10, 1_000_000).rdd.getNumPartitions() == 1
    assert _coalesce_for_write(wide, None, 1_000_000) is wide
    assert _coalesce_for_write(wide, 10, None) is wide

    store = SnapshotStore(str(tmp_path / "sized-store"))
    pages = pages_dataframe(spark, SPEC)
    robots = robots_dataframe(spark, SPEC)
    engine = CrawlEngine(spark, store, pages, robots, CrawlConfig())
    engine.init(_seeds())
    engine.run(max_epochs=4)
    checked = 0
    for table in ("seen", "articles", "frontier_delta", "frontier_tomb"):
        for s in store.snapshots(table):
            if s["path"] is None or s["epoch"] < 0:
                continue
            files = glob.glob(
                os.path.join(store.root, s["path"], "*.parquet")
            )
            assert len(files) <= 1, (table, s["epoch"], files)
            checked += 1
    assert checked >= 6


def test_content_seen_filter_dedups_bodies(spark, tmp_path):
    """content_seen_filter (Heritrix semantics, opt-in): byte-identical
    bodies are extracted once — within a batch the copy earliest in
    crawl order wins, and across epochs the committed content_seen
    fingerprints mark later fetches 'dup'. Off by default (the whole
    parity suite runs with it off)."""
    body_x = page_html("https://host0.example-crawl.org/blog/post-0", SPEC)
    body_y = page_html("https://host0.example-crawl.org/blog/post-1", SPEC)
    a1 = "https://hosta.example-crawl.org/a1"
    a2 = "https://hosta.example-crawl.org/a2"
    b1 = "https://hostb.example-crawl.org/b1"
    b2 = "https://hostb.example-crawl.org/b2"
    c1 = "https://hostc.example-crawl.org/c1"
    rows = [
        (a1, body_x.encode()), (a2, body_x.encode()),
        (b1, body_x.encode()), (b2, body_x.encode()),
        (c1, body_y.encode()),
    ]
    pages = spark.createDataFrame(
        [(u, None, h, None, None) for u, h in rows], PAGES_SCHEMA
    )
    # hostb budget = 1 fetch/epoch (delay == epoch) → b2 lands in a
    # LATER epoch than the batch that first saw body X
    robots = spark.createDataFrame(
        [("hosta.example-crawl.org", [], 0.01),
         ("hostb.example-crawl.org", [], 8.0),
         ("hostc.example-crawl.org", [], 0.01)],
        "host string, disallow_prefixes array<string>, crawl_delay double",
    )
    store = SnapshotStore(str(tmp_path / "cseen-store"))
    cfg = CrawlConfig(max_depth=0, content_seen_filter=True)
    engine = CrawlEngine(spark, store, pages, robots, cfg)
    engine.init([(u, "content") for u, _ in rows])
    results = engine.run(max_epochs=10)

    seen = {r["url"]: r for r in engine.seen().collect()}
    assert seen[a1]["status"] == "ok"          # first copy of X wins
    assert seen[c1]["status"] == "ok"          # unique body Y
    for dup_url in (a2, b1, b2):
        assert seen[dup_url]["status"] == "dup"
    # b2 was deduped across epochs, against the COMMITTED fingerprints
    assert seen[b2]["fetched_epoch"] > seen[b1]["fetched_epoch"]

    cs = {r["body_fp"]: r for r in engine.content_seen().collect()}
    assert len(cs) == 2                        # one row per unique body
    assert {r["url"] for r in cs.values()} == {a1, c1}

    assert sum(r.get("dup_bodies", 0) for r in results) == 3
    arts = engine.articles(merged=False)
    if arts is not None:
        assert {r["src_url"] for r in arts.collect()} <= {a1, c1}


def test_content_seen_bloom_prefilter_equivalent(spark, tmp_path):
    """bloom_min_seen=1 activates the content-seen bloom from the first
    epoch with committed fingerprints; routing provably-new bodies
    around the exact joins must not change a single status, and the
    filter is maintained O(delta) — exactly one full build."""
    body_x = page_html("https://host0.example-crawl.org/blog/post-0", SPEC)
    body_y = page_html("https://host0.example-crawl.org/blog/post-1", SPEC)
    a1 = "https://hosta.example-crawl.org/a1"
    a2 = "https://hosta.example-crawl.org/a2"
    b1 = "https://hostb.example-crawl.org/b1"
    b2 = "https://hostb.example-crawl.org/b2"
    c1 = "https://hostc.example-crawl.org/c1"
    rows = [
        (a1, body_x.encode()), (a2, body_x.encode()),
        (b1, body_x.encode()), (b2, body_x.encode()),
        (c1, body_y.encode()),
    ]
    pages = spark.createDataFrame(
        [(u, None, h, None, None) for u, h in rows], PAGES_SCHEMA
    )
    robots = spark.createDataFrame(
        [("hosta.example-crawl.org", [], 0.01),
         ("hostb.example-crawl.org", [], 8.0),
         ("hostc.example-crawl.org", [], 0.01)],
        "host string, disallow_prefixes array<string>, crawl_delay double",
    )

    def run(bloom_min_seen, sub):
        store = SnapshotStore(str(tmp_path / sub))
        cfg = CrawlConfig(
            max_depth=0, content_seen_filter=True,
            bloom_min_seen=bloom_min_seen,
        )
        engine = CrawlEngine(spark, store, pages, robots, cfg)
        engine.init([(u, "content") for u, _ in rows])
        results = engine.run(max_epochs=10)
        seen = {
            r["url"]: r["status"] for r in engine.seen().collect()
        }
        cs = sorted(
            (r["body_fp"], r["url"])
            for r in engine.content_seen().collect()
        )
        return engine, results, seen, cs

    eng_b, res_b, seen_b, cs_b = run(1, "cs-bloom")
    eng_e, res_e, seen_e, cs_e = run(10**9, "cs-exact")

    assert seen_b == seen_e
    assert cs_b == cs_e
    assert eng_b._cs_bloom is not None       # bloom path actually ran
    assert eng_e._cs_bloom is None           # exact path never built one
    builds = [
        r for r in res_b
        if "content_seen_bloom_build" in r.get("phases", {})
    ]
    assert len(builds) == 1                  # activation only, then O(delta)
    assert sum(r.get("dup_bodies", 0) for r in res_b) == 3


@pytest.mark.parametrize("seed,bloom_min", [(7, 10**9), (23, 1)])
def test_content_seen_matches_sequential_replay(spark, tmp_path, seed, bloom_min):
    """Property: whatever the body assignment and politeness-induced
    epoch splits, content-seen statuses must equal a sequential md5-set
    replay over the engine's own crawl order (fetched_epoch, ord_key) —
    first copy 'ok', later copies 'dup' — and only 'ok' URLs may yield
    articles. Runs once on the exact path and once with the bloom
    pre-filter active from the first committed epoch."""
    import random

    rng = random.Random(seed)
    body_pool = [
        page_html(f"https://host0.example-crawl.org/blog/post-{i}", SPEC)
        for i in range(6)
    ]
    hosts = ["hx", "hy", "hz"]
    delays = {h: rng.choice([0.01, 8.0]) for h in hosts}
    rows = []
    for i in range(15):
        h = rng.choice(hosts)
        u = f"https://{h}.example-crawl.org/p{i:02d}"
        rows.append((u, rng.choice(body_pool).encode()))
    pages = spark.createDataFrame(
        [(u, None, b, None, None) for u, b in rows], PAGES_SCHEMA
    )
    robots = spark.createDataFrame(
        [(f"{h}.example-crawl.org", [], delays[h]) for h in hosts],
        "host string, disallow_prefixes array<string>, crawl_delay double",
    )
    store = SnapshotStore(str(tmp_path / f"cs-prop-{seed}"))
    cfg = CrawlConfig(
        max_depth=0, content_seen_filter=True, bloom_min_seen=bloom_min
    )
    engine = CrawlEngine(spark, store, pages, robots, cfg)
    engine.init([(u, "content") for u, _ in rows])
    engine.run(max_epochs=30)

    seen = sorted(
        engine.seen().collect(),
        key=lambda r: (r["fetched_epoch"], r["ord_key"]),
    )
    assert len(seen) == 15
    import hashlib

    fps = set()
    first_url = {}
    for r in seen:
        body = dict(rows)[r["url"]]
        fp = hashlib.md5(body).hexdigest()
        expected = "dup" if fp in fps else "ok"
        assert r["status"] == expected, (r["url"], r["status"], expected)
        if fp not in fps:
            first_url[fp] = r["url"]
        fps.add(fp)

    cs = {r["body_fp"]: r["url"] for r in engine.content_seen().collect()}
    assert cs == first_url                    # fp -> first processor, exact
    ok_urls = {r["url"] for r in seen if r["status"] == "ok"}
    arts = engine.articles(merged=False)
    if arts is not None:
        assert {r["src_url"] for r in arts.collect()} <= ok_urls
    if bloom_min == 1:
        assert engine._cs_bloom is not None   # the bloom path actually ran


def test_frontier_compaction_folds_and_expires(spark, tmp_path, sim):
    """Compaction: when tombstones pass the trigger, deltas+tombstones
    fold into a new frontier_base, their dirs are expired (lineage rows
    remain), and the crawl result is unchanged."""
    import os

    store = SnapshotStore(str(tmp_path / "compact-store"))
    pages = pages_dataframe(spark, SPEC)
    robots = robots_dataframe(spark, SPEC)
    # floor 1 → compact as soon as tombstones ≥ half the live rows
    cfg = CrawlConfig(compact_min_tombstones=1, expire_frontier_keep=2)
    engine = CrawlEngine(spark, store, pages, robots, cfg)
    engine.init(_seeds())
    results = engine.run(max_epochs=30)
    assert any(r.get("compacted") for r in results)

    # after the last compaction, folded delta/tomb dirs are gone from
    # disk but their lineage rows survive in the manifest
    last_base_epoch = max(s["epoch"] for s in store.snapshots("frontier_base"))
    for table in ("frontier_delta", "frontier_tomb"):
        for s in store.snapshots(table):
            if s["epoch"] <= last_base_epoch and s["path"] is None:
                continue  # expired: lineage kept, dir dropped
            if s["epoch"] <= last_base_epoch:
                assert not os.path.exists(os.path.join(store.root, s["path"]))

    # the aggressively-compacting crawl matches the reference exactly
    assert {r["url"]: r["status"] for r in engine.seen().collect()} == sim.seen


def test_sharded_bloom_crawl_matches_reference(spark, tmp_path, sim):
    """bloom_shards > 1 routes the seen-set pre-filter through the
    sharded filter (in-memory probe mode) — identical final crawl state,
    and resume restores the sharded filter from its blob."""
    store = SnapshotStore(str(tmp_path / "shardbloom-store"))
    pages = pages_dataframe(spark, SPEC)
    robots = robots_dataframe(spark, SPEC)
    cfg = CrawlConfig(bloom_min_seen=1, bloom_shards=4)
    engine = CrawlEngine(spark, store, pages, robots, cfg)
    engine.init(_seeds())
    engine.run_epoch()
    engine.run_epoch()

    resumed = CrawlEngine.resume(spark, store, pages, robots, cfg)
    from web_scrapper_spark.frontier.bloom import ShardedBloom

    if resumed._bloom is not None:  # blob written once the filter activates
        assert isinstance(resumed._bloom, ShardedBloom)
    resumed.run(max_epochs=30)
    assert {r["url"]: r["status"] for r in resumed.seen().collect()} == sim.seen


def test_frontier_expiry_keeps_resume_working(spark, tmp_path, sim):
    """Old frontier BASE snapshot dirs are expired as compactions
    supersede them; lineage rows survive and resume from the last
    committed epoch is unaffected."""
    store = SnapshotStore(str(tmp_path / "expire-store"))
    pages = pages_dataframe(spark, SPEC)
    robots = robots_dataframe(spark, SPEC)
    cfg = CrawlConfig(compact_min_tombstones=1, expire_frontier_keep=1)
    engine = CrawlEngine(spark, store, pages, robots, cfg)
    engine.init(_seeds())
    engine.run_epoch()
    engine.run_epoch()
    engine.run_epoch()

    snaps = store.snapshots("frontier_base")
    assert len(snaps) >= 2  # init base + ≥1 compaction, lineage retained
    live = [s for s in snaps if s.get("path")]
    assert len(live) == 1  # only the latest base dir on disk

    resumed = CrawlEngine.resume(spark, store, pages, robots, cfg)
    resumed.run(max_epochs=30)
    assert {r["url"]: r["status"] for r in resumed.seen().collect()} == sim.seen


def test_partition_metrics_lineage(spark, tmp_path):
    """Per-partition fetch metrics: one (host, status) row group per
    epoch, consistent with the epoch counters."""
    store = SnapshotStore(str(tmp_path / "pm-store"))
    pages = pages_dataframe(spark, SPEC)
    robots = robots_dataframe(spark, SPEC)
    engine = CrawlEngine(spark, store, pages, robots, CrawlConfig())
    engine.init(_seeds())
    r0 = engine.run_epoch()
    r1 = engine.run_epoch()
    pm = engine.partition_metrics()
    assert pm is not None
    rows = pm.collect()
    assert {r["epoch"] for r in rows} == {0, 1}
    for epoch, res in ((0, r0), (1, r1)):
        ok = sum(r["urls"] for r in rows if r["epoch"] == epoch and r["status"] == "ok")
        assert ok == res["fetched_ok"]


def test_same_epoch_discovery_not_reenqueued(spark, tmp_path):
    """A link discovered in epoch N that points at a URL fetched in the
    SAME epoch N must not be re-enqueued (it is in neither previous
    seen nor pending): seeding /blog and /blog/page/2/ together puts
    page 2 in the epoch-0 batch while page 1's pagination link
    discovers it — regression: page 2 was re-fetched in epoch 1 and
    seen got a duplicate row, breaking the append-only invariant."""
    from pyspark.sql import functions as F

    spec = SiteSpec(n_hosts=1, n_articles=25, blog_page_size=10)
    store = SnapshotStore(str(tmp_path / "dup-store"))
    engine = CrawlEngine(
        spark, store, pages_dataframe(spark, spec),
        robots_dataframe(spark, spec), CrawlConfig(),
    )
    base = "https://host0.example-crawl.org"
    engine.init([
        (f"{base}/blog", "content"),
        (f"{base}/blog/page/2/", "content"),
    ])
    engine.run(max_epochs=30)
    seen = engine.seen()
    dups = (
        seen.groupBy("url").agg(F.count("*").alias("n"))
        .filter(F.col("n") > 1)
        .collect()
    )
    assert dups == []
    # page 2 was fetched exactly once, as a seed
    p2 = seen.filter(F.col("url") == f"{base}/blog/page/2/").collect()
    assert len(p2) == 1 and p2[0]["status"] == "ok"


def test_incremental_bloom_odelta_and_parity(spark, tmp_path, sim):
    """With the bloom active (tiny activation threshold): the seen set
    still equals the simulator's (the bloom is an optimization, never a
    correctness dependency), full O(|seen|) builds happen only at
    activation + geometric capacity doublings, every other bloom-active
    epoch pays only an O(delta) union, and the bitmap blob is persisted
    so resume reuses it instead of rebuilding."""
    cfg = CrawlConfig(bloom_min_seen=5)
    store = SnapshotStore(str(tmp_path / "bloom-store"))
    pages = pages_dataframe(spark, SPEC)
    robots = robots_dataframe(spark, SPEC)
    engine = CrawlEngine(spark, store, pages, robots, cfg)
    engine.init(_seeds())
    results = engine.run(max_epochs=30)

    seen = {r["url"]: r["status"] for r in engine.seen().collect()}
    assert seen == sim.seen

    done = [r for r in results if not r.get("done")]
    fulls = [r for r in done if "bloom_full_build" in r.get("phases", {})]
    deltas = [r for r in done if "bloom_delta" in r.get("phases", {})]
    assert deltas, "bloom never activated — threshold too high for fixture"
    # activation + at most two capacity doublings over this tiny crawl;
    # NOT one full rebuild per epoch (the scale bug this guards against)
    assert 1 <= len(fulls) <= 3
    assert len(deltas) >= len(fulls)

    blob = store.read_blob("seen_bloom")
    assert blob is not None and blob["epoch"] == engine._epoch

    resumed = CrawlEngine.resume(spark, store, pages, robots, cfg)
    assert resumed._bloom is not None  # blob reused, no rebuild needed
    assert resumed._bloom_capacity == blob["meta"]["capacity"]
    assert resumed.run_epoch().get("done")


def test_hot_carry_matches_cold_store_view(spark, tmp_path):
    """The in-memory hot carry must be row-identical to the committed
    merge-on-read view a cold reader (resume) computes — frontier AND
    seen — after every epoch."""
    store = SnapshotStore(str(tmp_path / "hot-store"))
    pages = pages_dataframe(spark, SPEC)
    robots = robots_dataframe(spark, SPEC)
    engine = CrawlEngine(spark, store, pages, robots, CrawlConfig())
    engine.init(_seeds())
    for _ in range(3):
        result = engine.run_epoch()
        if result.get("done"):
            break
        assert engine._hot_frontier is not None
        cold = CrawlEngine.resume(spark, store, pages, robots, CrawlConfig())
        hot_f = {tuple(r) for r in engine.frontier().collect()}
        cold_f = {
            tuple(r)
            for r in cold.frontier().select(*engine.frontier().columns).collect()
        }
        assert hot_f == cold_f
        hot_s = {tuple(r) for r in engine.seen().collect()}
        cold_s = {
            tuple(r)
            for r in cold.seen().select(*engine.seen().columns).collect()
        }
        assert hot_s == cold_s


def test_hot_carry_cap_disables(spark, tmp_path):
    """hot_state_max_rows below the live row count ⇒ no carry is kept
    and every read goes to the store (and the crawl still finishes
    with the same seen set)."""
    cfg = CrawlConfig(hot_state_max_rows=0)
    store = SnapshotStore(str(tmp_path / "cap-store"))
    pages = pages_dataframe(spark, SPEC)
    engine = CrawlEngine(spark, store, pages, robots_dataframe(spark, SPEC), cfg)
    engine.init(_seeds())
    engine.run_epoch()
    assert engine._hot_frontier is None and engine._hot_seen is None
    engine.run(max_epochs=30)
    expected = simulate_crawl(
        _pages_map(), _seeds(), robots_rules(SPEC), max_depth=cfg.max_depth
    )
    assert {r["url"]: r["status"] for r in engine.seen().collect()} == expected.seen


def test_trap_guard_drops_pathological_links(spark, tmp_path):
    """cfg.trap_guard: discovered links with looped/over-deep paths
    never enter the frontier; with the guard off they crawl normally
    (reference parity is the default)."""
    import datetime

    trap = "https://host9.example-crawl.org/cal/2024/01/2024/01/2024/01/p"
    clean = "https://host9.example-crawl.org/articles/ok"
    seed = "https://host9.example-crawl.org/blog"
    html = (
        '<html><body><div class="blog-list post-list">'
        f'<article class="post-item"><h2><a href="{clean}">Fine article'
        '</a></h2><span class="date">2025-01-10</span>'
        '<p class="excerpt">A summary long enough to keep.</p></article>'
        f'<article class="post-item"><h2><a href="{trap}">Calendar trap'
        '</a></h2><span class="date">2025-01-11</span>'
        '<p class="excerpt">Another summary long enough to keep.</p></article>'
        "</div></body></html>"
    )
    art = (
        '<html><body><article class="article">'
        "<h1 class='article-title'>T</h1>"
        "<div class='article-content'><p>Body text long enough to "
        "count as content for the extractor.</p></div>"
        "</article></body></html>"
    )
    ts = datetime.datetime(2025, 1, 1)
    rows = [
        (seed, ts, html.encode(), "", "en"),
        (clean, ts, art.encode(), "", "en"),
        (trap, ts, art.encode(), "", "en"),
    ]
    pages = spark.createDataFrame(rows, PAGES_SCHEMA)
    robots = spark.createDataFrame(
        [], "host string, disallow_prefixes array<string>, crawl_delay double"
    )

    def crawl(guard):
        store = SnapshotStore(str(tmp_path / f"trap-{guard}"))
        cfg = CrawlConfig(
            trap_guard=guard, trap_path_depth_max=5, trap_dup_segment_min=2
        )
        engine = CrawlEngine(spark, store, pages, robots, cfg)
        engine.init([(seed, "content")])
        engine.run(max_epochs=10)
        return {r["url"] for r in engine.seen().collect()}

    unguarded = crawl(False)
    assert {seed, clean, trap} <= unguarded
    guarded = crawl(True)
    assert clean in guarded and seed in guarded
    assert trap not in guarded


def test_cuckoo_seen_filter_matches_reference(spark, tmp_path, sim):
    """seen_filter='cuckoo' routes the pre-filter through the deletable
    sharded cuckoo filter — identical final crawl state (the filter is
    an optimization, never an authority), the blob persists with the
    cuckoo tag, and resume restores a ShardedCuckoo."""
    store = SnapshotStore(str(tmp_path / "cuckoo-store"))
    pages = pages_dataframe(spark, SPEC)
    robots = robots_dataframe(spark, SPEC)
    cfg = CrawlConfig(bloom_min_seen=1, bloom_shards=4, seen_filter="cuckoo")
    engine = CrawlEngine(spark, store, pages, robots, cfg)
    engine.init(_seeds())
    engine.run_epoch()
    engine.run_epoch()

    resumed = CrawlEngine.resume(spark, store, pages, robots, cfg)
    from web_scrapper_spark.frontier.cuckoo import ShardedCuckoo

    if resumed._bloom is not None:  # blob written once the filter activates
        assert isinstance(resumed._bloom, ShardedCuckoo)
    resumed.run(max_epochs=30)
    assert {r["url"]: r["status"] for r in resumed.seen().collect()} == sim.seen


def test_seen_filter_validation():
    with pytest.raises(ValueError, match="seen_filter"):
        CrawlEngine(None, None, None, None, CrawlConfig(seen_filter="bogus"))


class TestTimeTravel:
    """Iceberg-style as-of reads: seen/frontier/articles reconstructed
    exactly as they stood after any committed epoch."""

    def test_as_of_reads_match_live_history(self, spark, tmp_path):
        from pyspark.sql import functions as F

        store = SnapshotStore(str(tmp_path / "tt-store"))
        pages = pages_dataframe(spark, SPEC)
        robots = robots_dataframe(spark, SPEC)
        engine = CrawlEngine(spark, store, pages, robots, CrawlConfig())
        engine.init(_seeds())

        seen_hist, frontier_hist = {}, {}
        for epoch in range(3):
            m = engine.run_epoch()
            if m.get("done"):
                break
            seen_hist[epoch] = sorted(
                (r["url"], r["status"]) for r in engine.seen().collect()
            )
            frontier_hist[epoch] = sorted(
                r["url"] for r in engine.frontier().collect()
            )
        engine.run(max_epochs=30)  # drain fully past the recorded epochs

        for epoch, want in seen_hist.items():
            got = sorted(
                (r["url"], r["status"])
                for r in engine.seen(as_of_epoch=epoch).collect()
            )
            assert got == want, f"seen as-of epoch {epoch} drifted"
        for epoch, want in frontier_hist.items():
            got = sorted(
                r["url"] for r in engine.frontier(as_of_epoch=epoch).collect()
            )
            assert got == want, f"frontier as-of epoch {epoch} drifted"
        # articles as-of an early epoch is a strict subset of the final
        early = engine.articles(as_of_epoch=0)
        final = engine.articles()
        n_early = 0 if early is None else early.count()
        assert n_early <= final.count()

    def test_expired_base_raises(self, spark, tmp_path):
        import pytest

        store = SnapshotStore(str(tmp_path / "tt-exp"))
        pages = pages_dataframe(spark, SPEC)
        robots = robots_dataframe(spark, SPEC)
        # force a compaction every epoch and keep only the newest base
        cfg = CrawlConfig(
            compact_min_tombstones=1, compact_ratio=0.0, expire_frontier_keep=1
        )
        engine = CrawlEngine(spark, store, pages, robots, cfg)
        engine.init(_seeds())
        for _ in range(3):
            if engine.run_epoch().get("done"):
                break
        # the epoch-0 base is expired: as-of epoch 0 must refuse loudly
        with pytest.raises(RuntimeError, match="retention|expired"):
            engine.frontier(as_of_epoch=0).collect()
        # but the seen set (append-only, never expired) still time-travels
        assert engine.seen(as_of_epoch=0).count() > 0


def test_meta_robots_parity(spark, tmp_path):
    """respect_meta_robots (REP robots meta tag): noindex pages are
    fetched and followed but contribute no extraction rows; nofollow
    pages contribute no outlinks. The Spark epoch and the sequential
    simulator implement the semantics behind the same flag — final
    seen set, visit order, and merged articles must stay identical."""
    import datetime as dt

    from pyspark.sql import functions as F

    noindex = {
        u for u in all_urls(SPEC) if u.endswith("/blog/post-1")
    } | {"https://host1.example-crawl.org/blog"}
    nofollow = {"https://host2.example-crawl.org/blog"}

    def inject(u, h):
        tag = b""
        if u in noindex:
            tag += b'<meta name="robots" content="noindex">'
        if u in nofollow:
            tag += b'<meta content="NOFOLLOW" name="robots">'
        return tag + h

    pm = {u: inject(u, page_html(u, SPEC).encode("utf-8")) for u in all_urls(SPEC)}
    rows = [(u, dt.datetime(2025, 1, 1), h, None, None) for u, h in pm.items()]
    pages = spark.createDataFrame(rows, PAGES_SCHEMA)
    cfg = CrawlConfig(respect_meta_robots=True)
    store = SnapshotStore(str(tmp_path / "rm-store"))
    engine = CrawlEngine(spark, store, pages, robots_dataframe(spark, SPEC), cfg)
    engine.init(_seeds())
    results = engine.run(max_epochs=30)
    sim_r = simulate_crawl(
        pm,
        _seeds(),
        robots_rules(SPEC),
        max_depth=cfg.max_depth,
        respect_meta_robots=True,
    )

    engine_seen = {r["url"]: r["status"] for r in engine.seen().collect()}
    assert engine_seen == sim_r.seen
    # nofollow listing: fetched itself, but none of its posts were
    assert "https://host2.example-crawl.org/blog" in engine_seen
    assert not any(
        u.startswith("https://host2.example-crawl.org/blog/post")
        for u in engine_seen
    )
    # noindex pages: fetched (seen ok) yet zero extraction rows
    assert "https://host1.example-crawl.org/blog" in engine_seen
    arts = engine.articles()
    assert arts.filter(F.col("src_url").isin(list(noindex))).count() == 0
    # full article-row parity against the simulator
    engine_rows = {
        (r["src_url"], r["item_pos"]): r.asDict() for r in arts.collect()
    }
    sim_rows = {(a["src_url"], a["item_pos"]): a for a in merged_articles(sim_r)}
    assert set(engine_rows) == set(sim_rows)
    for key, srow in sim_rows.items():
        assert engine_rows[key].get("content") == srow.get("content"), key
    # metrics surfaced the flag counts
    crawl_epochs = [m for m in results if m.get("dequeued")]
    assert sum(m.get("noindex_pages", 0) for m in crawl_epochs) == len(
        [u for u in noindex if engine_seen.get(u) == "ok"]
    )
    assert sum(m.get("nofollow_pages", 0) for m in crawl_epochs) == 1


def test_max_outlinks_cap_parity(spark, tmp_path):
    """Heritrix-style maxOutlinks: links at on-page discovery position
    >= cap never enter the frontier. Engine and simulator implement the
    same position-cap rule — seen sets must match, and fewer pages are
    visited than an uncapped crawl."""
    cap = 3
    cfg = CrawlConfig(max_outlinks_per_page=cap)
    store = SnapshotStore(str(tmp_path / "cap-store"))
    pages = pages_dataframe(spark, SPEC)
    engine = CrawlEngine(spark, store, pages, robots_dataframe(spark, SPEC), cfg)
    engine.init(_seeds())
    engine.run(max_epochs=30)
    sim_r = simulate_crawl(
        _pages_map(),
        _seeds(),
        robots_rules(SPEC),
        max_depth=cfg.max_depth,
        max_outlinks_per_page=cap,
    )
    engine_seen = {r["url"]: r["status"] for r in engine.seen().collect()}
    assert engine_seen == sim_r.seen
    # the cap actually bit: an uncapped crawl sees strictly more urls
    uncapped = simulate_crawl(
        _pages_map(), _seeds(), robots_rules(SPEC), max_depth=cfg.max_depth
    )
    assert len(sim_r.seen) < len(uncapped.seen)
    # and ordering parity still holds under the cap
    rows = engine.seen().filter("status = 'ok'").select("url", "ord_key").collect()
    engine_order = [r["url"] for r in sorted(rows, key=lambda r: r["ord_key"])]
    assert engine_order == sim_r.visit_order


def test_null_html_page_is_a_miss_in_both_fetch_paths(spark, tmp_path):
    """A pages row with url present but html NULL (empty-payload WARC
    capture) must classify as a fetch MISS in the broadcast path
    exactly as in the shuffled path — never reach the extraction UDFs
    as a NULL body."""
    import datetime as dt

    h = "https://nullhtml.example-crawl.org"
    ok_html = (
        "<html><body><div class='article'>"
        "<h2 class='article-title'>T</h2>"
        "<div class='article-content'>hello world</div>"
        "</div></body></html>"
    ).encode()
    rows = [
        (f"{h}/blog", dt.datetime(2025, 1, 1), ok_html, None, None),
        (f"{h}/broken", dt.datetime(2025, 1, 1), None, None, None),
    ]
    pages = spark.createDataFrame(rows, PAGES_SCHEMA)
    store = SnapshotStore(str(tmp_path / "nh-store"))
    cfg = CrawlConfig(max_attempts=1)
    engine = CrawlEngine(spark, store, pages, None, cfg)
    engine.init([(f"{h}/blog", "content"), (f"{h}/broken", "content")])
    results = engine.run(max_epochs=10)
    assert results[-1]["done"]
    seen = {r["url"]: r["status"] for r in engine.seen().collect()}
    assert seen[f"{h}/blog"] == "ok"
    assert seen[f"{h}/broken"] == "failed"


def test_canonical_url_col_matches_python_twin_on_ports(spark):
    """Engine canonicalization must agree byte-for-byte with
    urlutils.canonicalize_url: default ports strip, NON-default ports
    survive (parse_url's HOST drops them — the old bug made the fetch
    join miss every :8080-style URL and drift from the simulator)."""
    from pyspark.sql import functions as F

    from web_scrapper_spark.crawl.epoch import canonical_url_col
    from web_scrapper_spark.urlutils import canonicalize_url

    urls = [
        "http://example.com:8080/a?x=1",
        "http://Example.COM:80/a#frag",
        "https://h.org:443/",
        "https://h.org:8443/p",
        "HTTP://H.ORG/P?Q=1#z",
        "http://user:pw@h.org:80/p",
        "http://h.org",
        "ftp://h.org:21/f",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = [
        r["c"] for r in df.select(canonical_url_col("url").alias("c")).collect()
    ]
    assert got == [canonicalize_url(u) for u in urls]


def test_canonical_url_col_garbage_passes_through_raw(spark):
    """A URL Java's parser rejects (embedded space) must pass through
    RAW — nulling it (or throwing under ANSI mode, which plain
    parse_url does) would kill the candidate stage on one dirty href."""
    from pyspark.sql import functions as F

    from web_scrapper_spark.crawl.epoch import canonical_url_col

    df = spark.createDataFrame(
        [("http://h.org/sp ace",), ("http://OK.org/a",)], "url string"
    )
    got = {
        r["url"]: r["c"]
        for r in df.select(
            "url", canonical_url_col("url").alias("c")
        ).collect()
    }
    assert got["http://h.org/sp ace"] == "http://h.org/sp ace"  # raw
    assert got["http://OK.org/a"] == "http://ok.org/a"


def test_incremental_index_equals_batch_build(spark, tmp_path):
    """cfg.index_articles: after k epochs of run_epoch, the merged-on-
    read search index is IDENTICAL to a from-scratch batch build over
    the same docs — the postings_merge contract (merge(build(A),
    build(B)) == build(A ∪ B)) exercised end-to-end through the crawl
    loop, plus a live BM25 query served mid-crawl from the index."""
    from pyspark.sql import functions as F

    from web_scrapper_spark.operators.textops import (
        bm25_search,
        build_postings,
    )

    store = SnapshotStore(str(tmp_path / "store"))
    cfg = CrawlConfig(index_articles=True)
    engine = CrawlEngine(
        spark, store, pages_dataframe(spark, SPEC),
        robots_dataframe(spark, SPEC), cfg,
    )
    engine.init(_seeds())
    results = engine.run(max_epochs=30)
    assert results[-1]["done"]
    # shards were appended across MULTIPLE epochs (else this tests
    # nothing incremental)
    n_shards = len(store.committed_ids("index_shards"))
    assert n_shards >= 2

    idx = engine.search_index()
    assert idx is not None

    docs = (
        engine.articles(merged=False)
        .filter(F.col("row_kind") == "full")
        .select(
            F.xxhash64("src_url").alias("doc_id"),
            F.coalesce(F.col("content"), F.lit("")).alias("text"),
        )
        .dropDuplicates(["doc_id"])
        .localCheckpoint(eager=True)
    )
    n = docs.count()
    assert n > 10
    assert idx["n_docs"] == n
    batch = build_postings(
        docs, n_docs=n, include_dls=True, block_size=cfg.index_block_size
    )

    def canon(df):
        return sorted(
            (
                r["term"], r["df"], r["block"],
                tuple(r["doc_ids"]), tuple(r["tfs"]), tuple(r["dls"]),
            )
            for r in df.collect()
        )

    assert canon(idx["postings"]) == canon(batch)

    # the index actually serves queries mid-crawl
    queries = spark.createDataFrame(
        [(1, "the and a")], "query_id long, text string"
    )
    hits = bm25_search(
        idx["postings"], queries, idx["n_docs"], idx["t_tokens"], k=5
    ).collect()
    assert len(hits) > 0

    # plan pin: the merged-on-read index NEVER re-tokenizes — no
    # Python stage, no text column read; only the shard parquet
    # (term/doc_ids/tfs/dls columns) enters the plan
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        engine.search_index()["postings"].explain("formatted")
    plan = buf.getvalue()
    assert "MapInPandas" not in plan and "ArrowEvalPython" not in plan
    for line in plan.splitlines():
        if "ReadSchema" in line:
            assert "text" not in line and "html" not in line, line


def test_commit_pool_shutdown_on_midpipeline_failure(spark, tmp_path, monkeypatch):
    """Review fix (round 4): the epoch's async-commit pool is opened
    inside a try/finally at creation, so an exception anywhere in the
    frontier pipeline — AFTER extraction commits were submitted but
    BEFORE their .result() — still shuts the pool down (queued futures
    cancelled, running ones awaited) instead of leaking background
    threads mid-write."""
    import concurrent.futures as cf

    from web_scrapper_spark.crawl import epoch as epoch_mod

    created = []
    real_pool = cf.ThreadPoolExecutor

    class RecordingPool(real_pool):
        def __init__(self, *a, **kw):
            super().__init__(*a, **kw)
            created.append(self)

    monkeypatch.setattr(cf, "ThreadPoolExecutor", RecordingPool)

    def boom(*a, **kw):
        raise RuntimeError("injected mid-pipeline failure")

    # robots_filter runs in the candidate pipeline ~150 lines after the
    # first pool.submit — exactly the window the old code left uncovered
    monkeypatch.setattr(epoch_mod, "robots_filter", boom)

    store = SnapshotStore(str(tmp_path / "store"))
    pages = pages_dataframe(spark, SPEC)
    engine = CrawlEngine(
        spark, store, pages, robots_dataframe(spark, SPEC), CrawlConfig()
    )
    engine.init(_seeds())
    with pytest.raises(RuntimeError, match="injected mid-pipeline"):
        engine.run(max_epochs=2)
    assert created, "commit pool never constructed — injection point moved?"
    assert all(p._shutdown for p in created), "pool leaked on failure path"


def test_from_store_index_recovers_writer_block_size(spark, tmp_path):
    """Review fix (round 4): load_search_index(block_size=None) reads
    the writing crawl's index_block_size back from the shard snapshot
    metadata — a store written with a non-default block size merges
    correctly without the reader knowing the number (the old CLI
    hard-coded 1024 and violated load_search_index's own contract)."""
    from web_scrapper_spark.crawl.epoch import load_search_index
    from web_scrapper_spark.operators.textops import build_postings

    store = SnapshotStore(str(tmp_path / "store"))
    cfg = CrawlConfig(index_articles=True, index_block_size=4)
    engine = CrawlEngine(
        spark, store, pages_dataframe(spark, SPEC),
        robots_dataframe(spark, SPEC), cfg,
    )
    engine.init(_seeds())
    engine.run(max_epochs=30)

    # the stamp round-trips through the manifest
    stamped = {
        s["metrics"].get("block_size")
        for s in store.snapshots("index_shards")
    }
    assert stamped == {4}

    auto = load_search_index(spark, store)          # no block_size arg
    explicit = load_search_index(spark, store, block_size=4)
    assert auto is not None and explicit is not None

    def canon(idx):
        return sorted(
            (
                r["term"], r["df"], r["block"],
                tuple(r["doc_ids"]), tuple(r["tfs"]), tuple(r["dls"]),
            )
            for r in idx["postings"].collect()
        )

    got = canon(auto)
    assert got == canon(explicit)
    # the writer's size actually shaped the blocks: with block_size=4
    # a common term spans multiple blocks, which the default-1024
    # merge would have collapsed
    assert any(row[2] > 0 for row in got), (
        "no multi-block term — fixture too small to distinguish "
        "block sizes"
    )
    wrong = load_search_index(spark, store, block_size=1024)
    assert canon(wrong) != got


def test_mlt_from_live_index_matches_self_built(spark, tmp_path):
    """Round-4 verdict fix: more_like_this against the crawl's live
    index (search_index() output with persisted keyword norms) equals
    the self-built MLT over the same corpus — and the from-index plan
    is candidate-grain: it never reads text and never re-tokenizes."""
    from pyspark.sql import functions as F

    from web_scrapper_spark.operators.textops import more_like_this

    store = SnapshotStore(str(tmp_path / "store"))
    cfg = CrawlConfig(index_articles=True)
    engine = CrawlEngine(
        spark, store, pages_dataframe(spark, SPEC),
        robots_dataframe(spark, SPEC), cfg,
    )
    engine.init(_seeds())
    engine.run(max_epochs=30)

    idx = engine.search_index()
    assert idx is not None
    # the keyword norms were persisted and the scalars recovered
    assert "kw_dl" in idx["doc_lens"].columns
    assert idx["kw_n_docs"] > 0 and idx["kw_t_tokens"] > 0

    # the same corpus as the index sees it (doc_id = xxhash64(url)):
    # the RAW committed articles table still carries row_kind (the
    # merged engine.articles() view folds it away)
    docs = (
        store.read_committed(spark, "articles")
        .filter(F.col("row_kind") == "full")
        .select(
            F.xxhash64("src_url").alias("doc_id"),
            F.coalesce(F.col("content"), F.lit("")).alias("text"),
        )
        .dropDuplicates(["doc_id"])
    )
    src = [
        int(r["doc_id"])
        for r in docs.orderBy("doc_id").limit(3).collect()
    ]
    self_built = more_like_this(docs, src, k=4, m_terms=3)
    from_idx = more_like_this(None, src, k=4, m_terms=3, index=idx)

    def canon(df):
        return sorted(map(tuple, df.collect()))

    assert canon(from_idx) == canon(self_built)

    # candidate-grain plan pin: no Python stage, no text/html read
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        from_idx.explain("formatted")
    plan = buf.getvalue()
    assert "MapInPandas" not in plan and "ArrowEvalPython" not in plan
    for line in plan.splitlines():
        if "ReadSchema" in line:
            assert "text" not in line and "html" not in line, line


def test_persisted_term_weights_serve_mlt(spark, tmp_path):
    """Round-5 verdict task: cfg.index_term_weights persists the
    ranked top-m BM25 weight table at every indexing epoch (one
    replace-mode store table, derived from the merged postings — no
    text pass). load_search_index attaches it only when FRESH and
    more_like_this consumes it automatically, so interactive MLT
    query formation is a pure read. Pins: persisted ≡ derived; a
    corrupted table CHANGES the output (the path really consumes it);
    a resume with the flag off makes the table stale and the loader
    falls back to derivation."""
    from pyspark.sql import functions as F

    from pyspark.sql import Window

    from web_scrapper_spark.crawl.epoch import load_search_index
    from web_scrapper_spark.operators.textops import more_like_this

    store = SnapshotStore(str(tmp_path / "store"))
    cfg = CrawlConfig(index_articles=True, index_term_weights=True)
    pages = pages_dataframe(spark, SPEC)
    robots = robots_dataframe(spark, SPEC)
    engine = CrawlEngine(spark, store, pages, robots, cfg)
    engine.init(_seeds())
    engine.run_epoch()
    engine.run_epoch()

    idx = engine.search_index()
    assert idx is not None and idx.get("term_weights") is not None
    assert idx["term_weights_top_m"] == cfg.index_term_weights_top_m

    src = [
        int(r["doc_id"])
        for r in idx["doc_lens"].orderBy("doc_id").limit(3).collect()
    ]

    def canon(df):
        return sorted(map(tuple, df.collect()))

    derived_idx = {
        k: v for k, v in idx.items()
        if k not in ("term_weights", "term_weights_top_m")
    }
    persisted = more_like_this(None, src, k=4, m_terms=3, index=idx)
    derived = more_like_this(None, src, k=4, m_terms=3, index=derived_idx)
    assert canon(persisted) == canon(derived)

    # non-tautological: reversing the persisted ranks (weakest terms
    # first) must CHANGE the result — proof the path consumes the
    # table rather than silently re-deriving
    wmax = Window.partitionBy("doc_id")
    bad_tw = idx["term_weights"].withColumn(
        "rank", F.max("rank").over(wmax) + 1 - F.col("rank")
    )
    bad_idx = dict(idx)
    bad_idx["term_weights"] = bad_tw
    bad = more_like_this(None, src, k=4, m_terms=3, index=bad_idx)
    assert canon(bad) != canon(derived)

    # a table ranked shallower than m_terms is ignored (derivation)
    shallow_idx = dict(idx)
    shallow_idx["term_weights_top_m"] = 2
    shallow = more_like_this(None, src, k=4, m_terms=3, index=shallow_idx)
    assert canon(shallow) == canon(derived)

    # staleness guard: resume the crawl with the flag OFF — new shards
    # commit without a weights refresh, so the loader must not attach
    # the old table (weights computed against an older corpus)
    engine.close()
    resumed = CrawlEngine.resume(
        spark, store, pages, robots,
        CrawlConfig(index_articles=True, index_term_weights=False),
    )
    resumed.run(max_epochs=30)
    idx2 = load_search_index(spark, store)
    assert idx2 is not None
    assert idx2.get("term_weights") is None
    # ...and MLT still answers (derivation fallback), matching a fresh
    # self-derivation over the final index
    final = more_like_this(None, src, k=4, m_terms=3, index=idx2)
    assert len(canon(final)) > 0


def test_index_compaction_folds_and_reads_scale_with_delta(spark, tmp_path):
    """Round-4 verdict fix: cfg.index_articles used to append one
    shard per epoch forever, and every read re-merged all of them.
    With index_compact_max_shards the accumulated deltas fold into an
    UNGATED index_base (the frontier_base merge-on-read discipline):
    reads union O(base + recent deltas) files, and the fold is
    semantically invisible (merged ≡ batch build, bit-exact)."""
    from pyspark.sql import functions as F

    from web_scrapper_spark.operators.textops import (
        bm25_search,
        build_postings,
    )

    store = SnapshotStore(str(tmp_path / "store"))
    cfg = CrawlConfig(index_articles=True, index_compact_max_shards=2)
    engine = CrawlEngine(
        spark, store, pages_dataframe(spark, SPEC),
        robots_dataframe(spark, SPEC), cfg,
    )
    engine.init(_seeds())
    results = engine.run(max_epochs=30)
    assert results[-1]["done"]

    # compaction actually fired (multiple bases: every 2nd shard folds)
    bases = store.committed_ids("index_base")
    assert bases, "no index_base committed — compaction never fired"
    n_shards_total = len(store.committed_ids("index_shards"))
    assert n_shards_total >= 2

    # the read-side scale pin: deltas visible past the newest base are
    # bounded by the compaction knob, NOT by the number of epochs
    base_entry = store.latest_committed("index_base")
    open_deltas = store.committed_ids(
        "index_shards", after_epoch=base_entry["epoch"]
    )
    assert len(open_deltas) < cfg.index_compact_max_shards
    assert len(open_deltas) < n_shards_total

    # the fold is invisible: merged-on-read (base + deltas) == batch
    idx = engine.search_index()
    docs = (
        store.read_committed(spark, "articles")
        .filter(F.col("row_kind") == "full")
        .select(
            F.xxhash64("src_url").alias("doc_id"),
            F.coalesce(F.col("content"), F.lit("")).alias("text"),
        )
        .dropDuplicates(["doc_id"])
    )
    n = docs.count()
    assert idx["n_docs"] == n
    batch = build_postings(
        docs, n_docs=n, include_dls=True, block_size=cfg.index_block_size
    )

    def canon(df):
        return sorted(
            (
                r["term"], r["df"], r["block"],
                tuple(r["doc_ids"]), tuple(r["tfs"]), tuple(r["dls"]),
            )
            for r in df.collect()
        )

    assert canon(idx["postings"]) == canon(batch)

    # doclens folded too, kw norms intact, and the index still serves
    assert len(
        store.committed_ids(
            "index_doclens",
            after_epoch=store.latest_committed("index_dl_base")["epoch"],
        )
    ) < cfg.index_compact_max_shards
    assert idx["doc_lens"].count() == n
    assert idx["kw_n_docs"] > 0
    hits = bm25_search(
        idx["postings"],
        spark.createDataFrame([(1, "the and a")], "query_id long, text string"),
        idx["n_docs"], idx["t_tokens"], k=5,
    )
    assert hits.count() > 0


def test_one_manifest_write_per_epoch(spark, tmp_path, monkeypatch):
    """Round-4 verdict fix (commit chain): every table/blob commit in
    an epoch lands in the pending manifest; the epoch makes exactly
    ONE durable manifest write (commit_epoch) — not one per table.
    A failed epoch leaves the on-disk manifest untouched."""
    from web_scrapper_spark.frontier.store import SnapshotStore as SS

    store = SnapshotStore(str(tmp_path / "store"))
    engine = CrawlEngine(
        spark, store, pages_dataframe(spark, SPEC),
        robots_dataframe(spark, SPEC),
        CrawlConfig(index_articles=True, expire_frontier_keep=None),
    )
    engine.init(_seeds())

    writes = []
    real_write = SS._write_manifest

    def counting_write(self, manifest):
        writes.append(len(manifest["epochs"]))
        return real_write(self, manifest)

    monkeypatch.setattr(SS, "_write_manifest", counting_write)
    engine.run_epoch()
    n_first = len(writes)
    assert n_first == 1, (
        f"epoch 0 made {n_first} manifest writes — the batch leaked"
    )
    engine.run_epoch()
    assert len(writes) == 2

    # failure path: manifest on disk identical before and after
    manifest_before = store.manifest()
    from web_scrapper_spark.crawl import epoch as epoch_mod

    def boom(*a, **kw):
        raise RuntimeError("injected")

    # dequeue_ranked runs unconditionally after the batch opens
    monkeypatch.setattr(epoch_mod, "dequeue_ranked", boom)
    with pytest.raises(RuntimeError, match="injected"):
        engine.run_epoch()
    monkeypatch.undo()
    assert store.manifest() == manifest_before
    # and the store is not wedged: the next epoch begins a fresh batch
    store2 = SnapshotStore(store.root)
    assert store2.manifest() == manifest_before


def test_positional_index_from_crawl_serves_phrase(spark, tmp_path):
    """cfg.index_positions: positional shards appended per epoch merge
    on read into an index IDENTICAL to a from-scratch positional batch
    build; the DERIVED plain shards still satisfy the plain merge ≡
    batch contract (one tokenization, two index shapes); phrase
    queries served from the store equal phrase queries over the
    re-read text; and the from-store phrase plan never touches text
    or Python."""
    from pyspark.sql import functions as F

    from web_scrapper_spark.operators.textops import (
        build_positional_postings,
        build_postings,
        phrase_search,
    )

    store = SnapshotStore(str(tmp_path / "store"))
    cfg = CrawlConfig(index_articles=True, index_positions=True)
    engine = CrawlEngine(
        spark, store, pages_dataframe(spark, SPEC),
        robots_dataframe(spark, SPEC), cfg,
    )
    engine.init(_seeds())
    results = engine.run(max_epochs=30)
    assert results[-1]["done"]
    assert len(store.committed_ids("index_positions")) >= 2

    idx = engine.search_index()
    assert idx is not None and "positions" in idx

    docs = (
        engine.articles(merged=False)
        .filter(F.col("row_kind") == "full")
        .select(
            F.xxhash64("src_url").alias("doc_id"),
            F.coalesce(F.col("content"), F.lit("")).alias("text"),
        )
        .dropDuplicates(["doc_id"])
        .localCheckpoint(eager=True)
    )
    n = docs.count()
    assert idx["n_docs"] == n

    def canon_pos(df):
        return sorted(
            (
                r["term"], r["df"], r["block"], tuple(r["doc_ids"]),
                tuple(r["tfs"]), tuple(r["dls"]),
                tuple(tuple(p) for p in r["position_lists"]),
            )
            for r in df.collect()
        )

    batch_pos = build_positional_postings(
        docs, n_docs=n, include_dls=True, block_size=cfg.index_block_size
    )
    assert canon_pos(idx["positions"]) == canon_pos(batch_pos)

    # the DERIVED plain shards still equal the plain batch build
    def canon(df):
        return sorted(
            (
                r["term"], r["df"], r["block"],
                tuple(r["doc_ids"]), tuple(r["tfs"]), tuple(r["dls"]),
            )
            for r in df.collect()
        )

    batch_plain = build_postings(
        docs, n_docs=n, include_dls=True, block_size=cfg.index_block_size
    )
    assert canon(idx["postings"]) == canon(batch_plain)

    # phrase from store == phrase from text (pick a phrase that occurs:
    # take the first two tokens of some doc's content)
    sample = docs.filter(F.length("text") > 20).first()
    phrase = " ".join(sample["text"].lower().split()[:2])
    from_store = phrase_search(
        phrase=phrase, index=idx["positions"], k=50
    ).collect()
    from_text = phrase_search(docs, phrase, k=50).collect()
    assert [tuple(r) for r in from_store] == [tuple(r) for r in from_text]
    assert len(from_store) >= 1

    # plan pin: from-store phrase reads shard parquet only
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        phrase_search(
            phrase=phrase, index=engine.search_index()["positions"], k=5
        ).explain("formatted")
    plan = buf.getvalue()
    assert "MapInPandas" not in plan and "ArrowEvalPython" not in plan
    for line in plan.splitlines():
        if "ReadSchema" in line:
            assert "text" not in line and "html" not in line, line


def test_positional_index_compaction_fold(spark, tmp_path):
    """index_compact_max_shards folds positional deltas into
    index_positions_base exactly like the plain index — reads stay
    O(base + recent deltas) and the merged view is unchanged."""
    from pyspark.sql import functions as F

    from web_scrapper_spark.operators.textops import (
        build_positional_postings,
    )

    store = SnapshotStore(str(tmp_path / "store"))
    cfg = CrawlConfig(
        index_articles=True, index_positions=True,
        index_compact_max_shards=2,
    )
    engine = CrawlEngine(
        spark, store, pages_dataframe(spark, SPEC),
        robots_dataframe(spark, SPEC), cfg,
    )
    engine.init(_seeds())
    results = engine.run(max_epochs=30)
    assert results[-1]["done"]
    # the fold actually fired
    assert len(store.committed_ids("index_positions_base")) >= 1

    idx = engine.search_index()
    docs = (
        engine.articles(merged=False)
        .filter(F.col("row_kind") == "full")
        .select(
            F.xxhash64("src_url").alias("doc_id"),
            F.coalesce(F.col("content"), F.lit("")).alias("text"),
        )
        .dropDuplicates(["doc_id"])
        .localCheckpoint(eager=True)
    )
    n = docs.count()
    batch = build_positional_postings(
        docs, n_docs=n, include_dls=True, block_size=cfg.index_block_size
    )

    def canon_pos(df):
        return sorted(
            (
                r["term"], r["df"], r["block"], tuple(r["doc_ids"]),
                tuple(r["tfs"]), tuple(r["dls"]),
                tuple(tuple(p) for p in r["position_lists"]),
            )
            for r in df.collect()
        )

    assert canon_pos(idx["positions"]) == canon_pos(batch)


def test_focused_crawl_prioritizes_relevant_anchors(spark, tmp_path):
    """cfg.focus_terms: links whose anchor text (listing title) matches
    the topic dequeue BEFORE irrelevant ones under the same politeness
    budget — the focused-crawler rule, encoded as an ord_key prefix.
    With focus_terms=None the scoring join must never enter the plan
    (crawl ordering bit-identical, pinned by the existing
    test_visit_order_parity)."""
    from pyspark.sql import functions as F

    spec = SiteSpec(n_hosts=2, n_articles=24, blog_page_size=8)

    def crawl(focus):
        store = SnapshotStore(str(tmp_path / f"store_{bool(focus)}"))
        engine = CrawlEngine(
            spark, store, pages_dataframe(spark, spec),
            robots_dataframe(spark, spec),
            CrawlConfig(focus_terms=focus),
        )
        engine.init(_seeds())
        engine.run(max_epochs=30)
        return engine

    focused = crawl(["spark", "frontier"])
    seen = (
        focused.seen()
        .filter(F.col("url").contains("/blog/post-"))
        .select("url", "fetched_epoch")
        .collect()
    )
    # recover each article's title word from the fixture's own rule
    from web_scrapper_spark.fixtures.sitegen import _PARA_WORDS, _r

    def is_relevant(url):
        a = int(url.rsplit("-", 1)[1])
        host = url.split("/")[2]
        base = f"https://{host}"
        # listing pages enumerate titles with _r(listing_url, f"art{a}")
        for page in range(10):
            u = f"{base}/blog" if page == 0 else f"{base}/blog/page/{page + 1}"
            r = _r(u, f"art{a}")
            w = _PARA_WORDS[r % len(_PARA_WORDS)]
            if spec.blog_page_size * page <= a < spec.blog_page_size * (page + 1):
                return w in ("spark", "frontier")
        return False

    rel_epochs = [e for (u, e) in seen if is_relevant(u)]
    irr_epochs = [e for (u, e) in seen if not is_relevant(u)]
    assert rel_epochs and irr_epochs
    # relevance must buy priority: relevant articles are fetched no
    # later than the irrelevant population on average, and the FIRST
    # article fetched after the listings is a relevant one
    assert sum(rel_epochs) / len(rel_epochs) \
        <= sum(irr_epochs) / len(irr_epochs)
    first_epoch = min(min(rel_epochs), min(irr_epochs))
    firsts = [u for (u, e) in seen if e == first_epoch]
    assert any(is_relevant(u) for u in firsts)

    # unfocused twin on the same fixture still completes identically
    # in COVERAGE (same seen set, different order)
    plain = crawl(None)
    assert sorted(r["url"] for r in plain.seen().collect()) == sorted(
        r["url"] for r in focused.seen().collect()
    )
