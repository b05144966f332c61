"""Unit tests for the snapshot store, bloom filter, and frontier ops."""

import numpy as np
import pytest

from web_scrapper_spark.frontier.bloom import (
    PyBloom,
    ShardedBloom,
    bloom_prefilter,
    build_bloom,
    build_sharded_bloom,
    sharded_bloom_prefilter,
)
from web_scrapper_spark.frontier.core import (
    dequeue,
    dequeue_ranked,
    first_discovery_wins,
    robots_filter,
    seeds_frontier,
)
from web_scrapper_spark.frontier.store import SnapshotStore


class TestPyBloom:
    def test_no_false_negatives(self):
        bloom = PyBloom.sized(1000, 0.01)
        keys = np.arange(1000, dtype=np.int64) * 7919 - 500
        bloom.add_many(keys)
        assert bloom.might_contain_many(keys).all()

    def test_fpp_bounded(self):
        bloom = PyBloom.sized(5000, 0.01)
        bloom.add_many(np.arange(5000, dtype=np.int64))
        probe = np.arange(100_000, 200_000, dtype=np.int64)
        fp = bloom.might_contain_many(probe).mean()
        assert fp < 0.05

    def test_union(self):
        a, b = PyBloom.sized(100, 0.01), PyBloom.sized(100, 0.01)
        a.add_many(np.array([1, 2, 3], dtype=np.int64))
        b.add_many(np.array([100, 200], dtype=np.int64))
        u = a.union(b)
        assert u.might_contain_many(np.array([1, 200], dtype=np.int64)).all()

    def test_roundtrip_bytes(self):
        a = PyBloom.sized(100, 0.01)
        a.add_many(np.array([42], dtype=np.int64))
        b = PyBloom.from_bytes(a.n_bits, a.k, a.to_bytes())
        assert b.might_contain_many(np.array([42], dtype=np.int64)).all()


class TestBloomSpark:
    def test_build_and_prefilter(self, spark):
        seen = spark.range(0, 2000).selectExpr("cast(id as int) as url_hash")
        bloom = build_bloom(seen, "url_hash", expected=2000, fpp=0.01)
        cand = spark.range(1500, 2500).selectExpr("cast(id as int) as url_hash")
        new = bloom_prefilter(cand, bloom, "url_hash", keep_maybe_seen=False)
        maybe = bloom_prefilter(cand, bloom, "url_hash", keep_maybe_seen=True)
        n_new, n_maybe = new.count(), maybe.count()
        assert n_new + n_maybe == 1000
        # all 500 truly-seen keys must be flagged maybe-seen (no false negatives)
        truly_seen_cleared = new.filter("url_hash < 2000").count()
        assert truly_seen_cleared == 0
        assert n_maybe >= 500


class TestShardedBloom:
    """The 10^10-key seen-set path: pmod-sharded bitmaps, built in one
    grouped pass, probed in-memory or from per-shard files on disk."""

    def test_no_false_negatives_and_sparse_shards(self):
        sb = ShardedBloom(8, 1 << 12, 4)
        keys = (np.arange(500, dtype=np.int64) * 7919) - 1000  # negatives too
        sb.add_many(keys)
        assert sb.might_contain_many(keys).all()
        # a key whose shard never saw data is definitely absent
        empty_shard_keys = np.array(
            [s for s in range(10_000, 10_100)], dtype=np.int64
        )
        present = {int(k) for k in keys}
        fresh = np.array(
            [k for k in empty_shard_keys if k not in present], dtype=np.int64
        )
        assert sb.might_contain_many(fresh).mean() < 0.2

    def test_union_and_blob_roundtrip(self):
        a = ShardedBloom(4, 1 << 10, 3)
        b = ShardedBloom(4, 1 << 10, 3)
        a.add_many(np.array([1, 2, 3], dtype=np.int64))
        b.add_many(np.array([101, -7], dtype=np.int64))
        u = a.union(b)
        back = ShardedBloom.from_bytes(u.to_bytes())
        assert (back.n_shards, back.n_bits, back.k) == (4, 1 << 10, 3)
        assert back.might_contain_many(
            np.array([1, 2, 3, 101, -7], dtype=np.int64)
        ).all()

    def test_union_result_owns_its_bitmaps(self):
        """Shards present in only one operand must be COPIED into the
        union — aliasing them lets add_many on the union silently
        mutate the supposedly-frozen operand filters."""
        base = ShardedBloom(4, 1 << 10, 3)
        delta = ShardedBloom(4, 1 << 10, 3)
        base.add_many(np.array([4], dtype=np.int64))      # shard 0 only
        delta.add_many(np.array([5], dtype=np.int64))     # shard 1 only
        total = base.union(delta)
        probe = np.array([8, 9], dtype=np.int64)          # shards 0, 1
        assert not base.might_contain_many(probe).any()
        assert not delta.might_contain_many(probe).any()
        total.add_many(probe)
        assert total.might_contain_many(probe).all()
        # operands unchanged
        assert not base.might_contain_many(probe).any()
        assert not delta.might_contain_many(probe).any()

    def test_shard_routing_matches_spark_pmod(self, spark):
        keys = np.array([-5, -1, 0, 7, 123456789, -987654], dtype=np.int64)
        sb = ShardedBloom(8, 1 << 10, 3)
        ours = sb.shard_of(keys)
        rows = spark.createDataFrame(
            [(int(k),) for k in keys], "url_hash long"
        ).selectExpr("pmod(url_hash, 8) as s").collect()
        assert list(ours) == [r["s"] for r in rows]

    def test_distributed_build_and_both_probe_modes(self, spark, tmp_path):
        seen = spark.range(0, 2000).selectExpr("cast(id as int) as url_hash")
        sb = build_sharded_bloom(seen, "url_hash", n_shards=8, expected=2000)
        cand = spark.range(1500, 2500).selectExpr("cast(id as int) as url_hash")

        new_mem = sharded_bloom_prefilter(
            cand, "url_hash", sharded=sb, keep_maybe_seen=False
        )
        maybe_mem = sharded_bloom_prefilter(
            cand, "url_hash", sharded=sb, keep_maybe_seen=True
        )
        assert new_mem.count() + maybe_mem.count() == 1000
        assert new_mem.filter("url_hash < 2000").count() == 0  # no false negs

        # disk-backed mode: per-shard files, no filter broadcast
        shard_dir = str(tmp_path / "bloomshards")
        sb.save_dir(shard_dir)
        new_disk = sharded_bloom_prefilter(
            cand, "url_hash", dir_path=shard_dir, keep_maybe_seen=False
        )
        assert sorted(r["url_hash"] for r in new_disk.collect()) == sorted(
            r["url_hash"] for r in new_mem.collect()
        )

    def test_matches_flat_filter_semantics(self, spark):
        # same expected/fpp: the sharded filter must flag every truly
        # seen key exactly like the flat one (both no-false-negative)
        seen = spark.range(0, 3000).selectExpr("cast(id as int) as url_hash")
        flat = build_bloom(seen, "url_hash", expected=3000)
        sb = build_sharded_bloom(seen, "url_hash", n_shards=4, expected=3000)
        probe = np.arange(0, 3000, dtype=np.int64)
        assert sb.might_contain_many(probe).all()
        assert flat.might_contain_many(probe).all()


class TestSnapshotStore:
    def test_commit_read_time_travel(self, spark, tmp_path):
        store = SnapshotStore(str(tmp_path / "store"))
        df1 = spark.range(5).selectExpr("id as n")
        df2 = spark.range(9).selectExpr("id as n")
        s1 = store.commit("t", df1, epoch=0)
        s2 = store.commit("t", df2, epoch=1)
        assert store.read(spark, "t").count() == 9
        assert store.read(spark, "t", s1).count() == 5
        assert store.latest_id("t") == s2
        assert store.snapshots("t")[1]["parent"] == s1

    def test_read_union_append_semantics(self, spark, tmp_path):
        store = SnapshotStore(str(tmp_path / "store"))
        store.commit("a", spark.range(3), epoch=0)
        store.commit("a", spark.range(4), epoch=1)
        assert store.read_union(spark, "a").count() == 7
        assert store.read_union(spark, "a", up_to_epoch=0).count() == 3

    def test_epoch_manifest(self, spark, tmp_path):
        store = SnapshotStore(str(tmp_path / "store"))
        s = store.commit("t", spark.range(2), epoch=0)
        store.commit_epoch(0, {"t": s}, {"rows": 2})
        assert store.last_epoch()["epoch"] == 0
        assert store.epoch_metrics() == [{"epoch": 0, "rows": 2}]

    def test_expire_snapshots(self, spark, tmp_path):
        store = SnapshotStore(str(tmp_path / "store"))
        for e in range(4):
            store.commit("t", spark.range(e + 1), epoch=e)
        removed = store.expire_snapshots("t", keep_last=2)
        assert removed == 2
        assert store.read(spark, "t").count() == 4  # latest still readable

    def test_expire_refuses_committed_append_deltas(self, spark, tmp_path):
        """Append-table snapshots referenced by committed epochs are
        LIVE (the table is their union): vacuuming them must refuse
        without force, and a forced expiry must make read_committed
        fail loudly instead of silently serving a truncated union."""
        store = SnapshotStore(str(tmp_path / "store"))
        for e in range(3):
            s = store.commit("seen", spark.range(e + 1), epoch=e, mode="append")
            store.commit_epoch(e, {"seen": s}, {})
        with pytest.raises(ValueError, match="live data"):
            store.expire_snapshots("seen", keep_last=1)
        assert store.read_committed(spark, "seen").count() == 6
        # orphan append snapshot (no committing epoch) is expirable
        store.commit("orphan", spark.range(1), epoch=9, mode="append")
        store.commit("orphan", spark.range(1), epoch=10, mode="append")
        assert store.expire_snapshots("orphan", keep_last=1) == 1
        # forced expiry: committed readers refuse loudly...
        store.expire_snapshots("seen", keep_last=1, force=True)
        with pytest.raises(KeyError, match="truncated"):
            store.read_committed(spark, "seen")
        # ...unless narrowed past the expired range
        assert store.read_committed(spark, "seen", after_epoch=1).count() == 3

    def test_expire_refuses_inside_open_epoch_batch(self, spark, tmp_path):
        """Regression (round-5 advice): expire_snapshots during an open
        epoch batch would _write_manifest the PENDING manifest —
        flushing uncommitted-epoch snapshot rows to disk and breaking
        begin_epoch_batch's invariant that the on-disk manifest stays
        untouched until commit_epoch. Must refuse; after commit it runs."""
        import json as _json

        store = SnapshotStore(str(tmp_path / "store"))
        for e in range(3):
            s = store.commit("t", spark.range(e + 1), epoch=e)
            store.commit_epoch(e, {"t": s}, {})
        on_disk = open(store._manifest_path()).read()
        store.begin_epoch_batch()
        store.commit("t", spark.range(9), epoch=3)
        with pytest.raises(RuntimeError, match="open epoch batch"):
            store.expire_snapshots("t", keep_last=1)
        # the refusal left the on-disk manifest byte-identical
        assert open(store._manifest_path()).read() == on_disk
        store.abort_epoch_batch()
        assert _json.loads(on_disk) == store.manifest()
        # outside a batch, maintenance works as before
        assert store.expire_snapshots("t", keep_last=1) == 2

    def test_blob_commit_read_expire(self, tmp_path):
        store = SnapshotStore(str(tmp_path / "store"))
        assert store.read_blob("x") is None
        store.commit_blob("x", b"abc", epoch=3, meta={"k": 1})
        store.commit_blob("x", b"abcd", epoch=4, meta={"k": 2})
        blob = store.read_blob("x")
        assert blob["epoch"] == 4
        assert blob["data"] == b"abcd"
        assert blob["meta"]["k"] == 2
        store.expire_snapshots("x", keep_last=1)
        assert store.read_blob("x")["data"] == b"abcd"


class TestFrontierOps:
    def test_seeds_ordering_and_salt(self, spark):
        seeds = [("https://A.org/x", "content"), ("https://b.org/y", "ecommerce")]
        df = seeds_frontier(spark, seeds, salt_buckets=4).orderBy("ord_key")
        rows = df.collect()
        assert rows[0]["ord_key"] == "00000" and rows[0]["host"] == "a.org"
        assert rows[1]["stype"] == "ecommerce"
        assert all("#" in r["host_salt"] for r in rows)
        assert all(r["priority"] == 1.0 for r in rows)

    def test_zfill_col_never_truncates(self, spark):
        """str.zfill semantics: lpad would truncate position 100000 to
        '10000' — colliding with real position 10000 in ord_key paths."""
        from pyspark.sql import functions as F

        from web_scrapper_spark.frontier.core import zfill_col

        r = (
            spark.range(1)
            .select(
                zfill_col(F.lit(123456), 5).alias("wide"),
                zfill_col(F.lit(42), 5).alias("narrow"),
                zfill_col(F.lit(99999), 5).alias("exact"),
            )
            .collect()[0]
        )
        assert (r["wide"], r["narrow"], r["exact"]) == (
            "123456", "00042", "99999",
        )

    def test_first_discovery_wins(self, spark):
        df = spark.createDataFrame(
            [
                ("u1", "00001/00002", 2, "content"),
                ("u1", "00000/00001", 2, "content"),
                ("u2", "00003", 1, "content"),
            ],
            "url string, ord_key string, depth int, stype string",
        )
        rows = {r["url"]: r["ord_key"] for r in first_discovery_wins(df).collect()}
        assert rows == {"u1": "00000/00001", "u2": "00003"}

    def test_robots_filter(self, spark):
        cand = spark.createDataFrame(
            [
                ("https://h0.org/private/x", "k1", 1, "content"),
                ("https://h0.org/blog/a", "k2", 1, "content"),
                ("https://h1.org/private/x", "k3", 1, "content"),
            ],
            "url string, ord_key string, depth int, stype string",
        )
        robots = spark.createDataFrame(
            [("h0.org", ["/private"], 2.0), ("h1.org", [], 2.0)],
            "host string, disallow_prefixes array<string>, crawl_delay double",
        )
        kept = sorted(r["url"] for r in robots_filter(cand, robots).collect())
        assert kept == ["https://h0.org/blog/a", "https://h1.org/private/x"]

    def test_dequeue_politeness_budget(self, spark):
        # 10 urls on one host, delay 2.0, epoch 8s → budget 4
        seeds = [(f"https://h.org/p{i}", "content") for i in range(10)]
        frontier = seeds_frontier(spark, seeds)
        robots = spark.createDataFrame(
            [("h.org", [], 2.0)],
            "host string, disallow_prefixes array<string>, crawl_delay double",
        )
        batch = dequeue(frontier, robots, epoch_seconds=8.0, default_delay=2.0)
        rows = batch.orderBy("ord_key").collect()
        assert len(rows) == 4
        # earliest ord_keys picked; fetch slots spaced by delay
        assert [r["ord_key"] for r in rows] == ["00000", "00001", "00002", "00003"]
        assert [r["fetch_slot"] for r in rows] == [0.0, 2.0, 4.0, 6.0]

    def test_dequeue_hot_host_fairness(self, spark):
        seeds = [(f"https://hot.org/p{i}", "content") for i in range(20)] + [
            ("https://cold.org/x", "content")
        ]
        frontier = seeds_frontier(spark, seeds)
        robots = spark.createDataFrame(
            [("hot.org", [], 0.5), ("cold.org", [], 2.0)],
            "host string, disallow_prefixes array<string>, crawl_delay double",
        )
        batch = dequeue(frontier, robots, epoch_seconds=4.0, default_delay=2.0)
        by_host = {
            r["host"]: r["cnt"]
            for r in batch.groupBy("host").count().withColumnRenamed("count", "cnt").collect()
        }
        assert by_host == {"hot.org": 8, "cold.org": 1}

    def test_dequeue_ranked_split_equals_dequeue(self, spark):
        """batch (rank<=budget) from dequeue_ranked must equal dequeue();
        batch + pending must partition the frontier exactly."""
        from pyspark.sql import functions as F

        seeds = [(f"https://h{i % 3}.org/p{i}", "content") for i in range(30)]
        frontier = seeds_frontier(spark, seeds)
        robots = spark.createDataFrame(
            [("h0.org", [], 1.0), ("h1.org", [], 4.0), ("h2.org", [], 8.0)],
            "host string, disallow_prefixes array<string>, crawl_delay double",
        )
        ranked = dequeue_ranked(frontier, robots, epoch_seconds=8.0)
        batch = ranked.filter(F.col("host_rank") <= F.col("budget"))
        pending = ranked.filter(F.col("host_rank") > F.col("budget"))
        via_dequeue = dequeue(frontier, robots, epoch_seconds=8.0)
        assert sorted(r["url"] for r in batch.collect()) == sorted(
            r["url"] for r in via_dequeue.collect()
        )
        b_urls = {r["url"] for r in batch.collect()}
        p_urls = {r["url"] for r in pending.collect()}
        assert not (b_urls & p_urls)
        assert b_urls | p_urls == {u for u, _ in seeds}

    def test_dequeue_skew_prerank_same_batch(self, spark):
        """The per-(host,salt) pre-rank must select the identical batch
        and route every pruned row to pending (host_rank > budget)."""
        from pyspark.sql import functions as F

        seeds = [(f"https://hot.org/p{i:03d}", "content") for i in range(40)] + [
            (f"https://cold{i}.org/x", "content") for i in range(5)
        ]
        frontier = seeds_frontier(spark, seeds)
        robots = spark.createDataFrame(
            [("hot.org", [], 1.0)]
            + [(f"cold{i}.org", [], 2.0) for i in range(5)],
            "host string, disallow_prefixes array<string>, crawl_delay double",
        )
        plain = dequeue_ranked(frontier, robots, epoch_seconds=8.0)
        skewed = dequeue_ranked(
            frontier, robots, epoch_seconds=8.0, skew_prerank=True
        )

        def split(df):
            b = sorted(
                r["url"]
                for r in df.filter(F.col("host_rank") <= F.col("budget")).collect()
            )
            p = sorted(
                r["url"]
                for r in df.filter(F.col("host_rank") > F.col("budget")).collect()
            )
            return b, p

        b1, p1 = split(plain)
        b2, p2 = split(skewed)
        assert b1 == b2
        assert p1 == p2
        # hot host got exactly its budget (8s / 1s delay = 8 slots)
        assert sum(1 for u in b2 if "hot.org" in u) == 8

    def test_salted_partitioning_bounds_hot_host(self, spark):
        """SURVEY §5.2-6 skew smoke: one host holds ~50% of the
        frontier; repartitioning by host_salt must spread it so no
        partition holds more than ~hot_share/S (+slack), and the salt
        must not change WHICH rows exist."""
        from pyspark.sql import functions as F

        hot = [(f"https://hot.org/p{i}", "content") for i in range(500)]
        cold = [(f"https://c{i % 50}.org/p{i}", "content") for i in range(500)]
        salted = seeds_frontier(spark, hot + cold, salt_buckets=8)
        n_part = 16
        parts = (
            salted.repartition(n_part, "host_salt")
            .withColumn("pid", F.spark_partition_id())
            .groupBy("pid")
            .count()
            .collect()
        )
        max_share = max(r["count"] for r in parts) / 1000.0
        # unsalted, the hot host would put 0.5 in one partition; with
        # S=8 the hot host's per-bucket share is ~0.0625
        assert max_share < 0.30, f"hot host not spread: {max_share}"
        # salting changes layout only, never membership
        unsalted = seeds_frontier(spark, hot + cold, salt_buckets=1)
        assert sorted(r["url"] for r in salted.collect()) == sorted(
            r["url"] for r in unsalted.collect()
        )


class TestRobotsTxt:
    BODY = """
# example robots file
User-agent: *
Disallow: /private
Disallow: /tmp/
Crawl-delay: 2

User-agent: wss-crawler
User-agent: otherbot
Disallow: /internal
Crawl-delay: 0.5

User-agent: greedybot
Disallow:
"""

    def test_parse_star_group(self):
        from web_scrapper_spark.frontier.robots import parse_robots_txt

        r = parse_robots_txt(self.BODY)
        assert r["disallow_prefixes"] == ["/private", "/tmp/"]
        assert r["crawl_delay"] == 2.0

    def test_parse_specific_agent_longest_prefix(self):
        from web_scrapper_spark.frontier.robots import parse_robots_txt

        r = parse_robots_txt(self.BODY, agent="WSS-Crawler/1.0")
        assert r["disallow_prefixes"] == ["/internal"]
        assert r["crawl_delay"] == 0.5

    def test_parse_empty_disallow_and_defaults(self):
        from web_scrapper_spark.frontier.robots import parse_robots_txt

        r = parse_robots_txt(self.BODY, agent="greedybot")
        assert r["disallow_prefixes"] == []
        assert r["crawl_delay"] is None
        r2 = parse_robots_txt("", default_delay=1.5)
        assert r2 == {
            "disallow_prefixes": [],
            "allow_prefixes": [],
            "crawl_delay": 1.5,
            "sitemaps": [],
        }

    def test_sitemap_lines_site_wide(self):
        from web_scrapper_spark.frontier.robots import parse_robots_txt

        body = (
            "Sitemap: https://a.org/sitemap.xml\n" + self.BODY +
            "\nSitemap: https://a.org/news.xml.gz"
            "\nSitemap: https://a.org/sitemap.xml\n"  # dup dropped
        )
        for agent in ("*", "greedybot"):
            r = parse_robots_txt(body, agent=agent)
            assert r["sitemaps"] == [
                "https://a.org/sitemap.xml", "https://a.org/news.xml.gz",
            ]

    def test_robots_from_pages_roundtrip(self, spark):
        from web_scrapper_spark.frontier.robots import robots_from_pages
        from web_scrapper_spark.frontier.core import robots_filter

        pages = spark.createDataFrame(
            [
                ("https://a.org/robots.txt", None,
                 "User-agent: *\nDisallow: /private\nCrawl-delay: 1", "en"),
                ("https://b.org/robots.txt",
                 b"User-agent: *\nCrawl-delay: 4", None, "en"),
                ("https://a.org/page", b"<html></html>", "x", "en"),
            ],
            "url string, html binary, text string, lang string",
        )
        rules = robots_from_pages(pages, default_delay=2.0)
        rows = {r["host"]: r for r in rules.collect()}
        assert set(rows) == {"a.org", "b.org"}
        assert rows["a.org"]["disallow_prefixes"] == ["/private"]
        assert rows["a.org"]["crawl_delay"] == 1.0
        assert rows["b.org"]["crawl_delay"] == 4.0
        # pipes straight into the enqueue-time robots filter
        cand = spark.createDataFrame(
            [
                ("https://a.org/private/x", "k1", 1, "content"),
                ("https://a.org/blog", "k2", 1, "content"),
            ],
            "url string, ord_key string, depth int, stype string",
        )
        kept = [r["url"] for r in robots_filter(cand, rules).collect()]
        assert kept == ["https://a.org/blog"]

    def test_zero_crawl_delay_means_unlimited(self, spark):
        """robots.txt 'Crawl-delay: 0' must mean no rate limit, not a
        divide-by-zero (ANSI mode) — the whole host dequeues at once."""
        seeds = [(f"https://h.org/p{i}", "content") for i in range(5)]
        frontier = seeds_frontier(spark, seeds)
        robots = spark.createDataFrame(
            [("h.org", [], 0.0)],
            "host string, disallow_prefixes array<string>, crawl_delay double",
        )
        batch = dequeue(frontier, robots, epoch_seconds=8.0)
        assert batch.count() == 5

    def test_robots_from_pages_one_row_per_host(self, spark):
        """http+https (or multiple snapshots) of one host must collapse
        to ONE rules row — a duplicate host row would fan out every
        frontier row for that host through the politeness broadcast
        join (double fetches, duplicate seen rows). Also: only pages
        whose PATH is exactly /robots.txt qualify."""
        from web_scrapper_spark.frontier.robots import robots_from_pages

        pages = spark.createDataFrame(
            [
                ("http://a.org/robots.txt", None,
                 "User-agent: *\nDisallow: /x\nCrawl-delay: 1", "en"),
                ("https://a.org/robots.txt", None,
                 "User-agent: *\nDisallow: /y\nCrawl-delay: 3", "en"),
                # path is /blog/robots.txt — not a robots file
                ("https://a.org/blog/robots.txt", None,
                 "User-agent: *\nDisallow: /", "en"),
            ],
            "url string, html binary, text string, lang string",
        )
        rows = robots_from_pages(pages).collect()
        assert len(rows) == 1
        row = rows[0]
        assert row["host"] == "a.org"
        assert row["disallow_prefixes"] == ["/x", "/y"]  # unioned, sorted
        assert row["crawl_delay"] == 3.0  # most polite wins


class TestHostPriorityDequeue:
    """Opt-in link-centrality allocation of a capped epoch's budget."""

    def _frontier(self, spark):
        seeds = [(f"https://big.org/p{i}", "content") for i in range(4)] + [
            (f"https://small.org/p{i}", "content") for i in range(4)
        ] + [(f"https://unranked.org/p{i}", "content") for i in range(2)]
        return seeds_frontier(spark, seeds)

    def test_high_centrality_host_wins_capped_budget(self, spark):
        frontier = self._frontier(spark)
        hp = spark.createDataFrame(
            [("small.org", 900), ("big.org", 100)], "host string, rank long"
        )
        batch = dequeue(
            frontier, None, epoch_seconds=8.0, default_delay=2.0,
            global_budget=5, host_priority=hp,
        )
        by_host = {
            r["host"]: r["cnt"]
            for r in batch.groupBy("host").count()
            .withColumnRenamed("count", "cnt").collect()
        }
        # all 4 politeness slots of the top-ranked host first, then the
        # next host fills the remainder; unranked (rank 0) sorts last
        assert by_host == {"small.org": 4, "big.org": 1}
        assert "_host_rank_fp" not in batch.columns

    def test_without_priority_order_unchanged(self, spark):
        frontier = self._frontier(spark)
        plain = dequeue(
            frontier, None, epoch_seconds=8.0, default_delay=2.0, global_budget=5
        )
        # default is the deterministic (depth, ord_key) order: seeds
        # 00000..00004 regardless of host
        assert sorted(r["ord_key"] for r in plain.collect()) == [
            "00000", "00001", "00002", "00003", "00004"
        ]

    def test_pagerank_feeds_dequeue(self, spark):
        """End-to-end: link edges → host graph → pagerank → dequeue."""
        from web_scrapper_spark.operators.graph import host_edges, pagerank

        links = spark.createDataFrame(
            # everyone links to hub.org; hub splits its authority over
            # two spokes (a single out-link would hand a spoke MORE
            # rank than the hub — correct PageRank, wrong test graph)
            [(f"https://s{i}.org/p", "https://hub.org/x") for i in range(6)]
            + [("https://hub.org/x", "https://spoke.org/y"),
               ("https://hub.org/x", "https://s0.org/p")],
            "src_url string, url string",
        )
        ranks = pagerank(host_edges(links), num_iters=20).withColumnRenamed(
            "node", "host"
        )
        seeds = [("https://hub.org/a", "content"), ("https://spoke.org/b", "content"),
                 ("https://s0.org/c", "content")]
        frontier = seeds_frontier(spark, seeds)
        batch = dequeue(
            frontier, None, epoch_seconds=8.0, default_delay=2.0,
            global_budget=1, host_priority=ranks,
        )
        assert [r["host"] for r in batch.collect()] == ["hub.org"]

    def test_trustrank_feeds_dequeue_demoting_spam(self, spark):
        """End-to-end spam demotion: a link farm unreachable from the
        trusted seeds holds trust 0, so a capped epoch's budget goes to
        the trusted side of the graph — the TrustRank paper's crawl
        use, through the same host_priority seam as pagerank."""
        from web_scrapper_spark.operators.graph import host_edges, trustrank

        links = spark.createDataFrame(
            # trusted.org → good.org; farm{0,1}.org link only each other
            [("https://trusted.org/x", "https://good.org/y"),
             ("https://farm0.org/a", "https://farm1.org/b"),
             ("https://farm1.org/b", "https://farm0.org/a"),
             ("https://farm0.org/a", "https://farm0.org/c")],
            "src_url string, url string",
        )
        seeds_df = spark.createDataFrame([("trusted.org",)], "node string")
        ranks = trustrank(
            host_edges(links), seeds_df, num_iters=10
        ).withColumnRenamed("node", "host")
        trust = {r["host"]: r["rank"] for r in ranks.collect()}
        assert trust["farm0.org"] == 0 and trust["farm1.org"] == 0
        assert trust["good.org"] > 0
        seeds = [
            ("https://farm0.org/p", "content"),
            ("https://farm1.org/p", "content"),
            ("https://good.org/p", "content"),
            ("https://trusted.org/p", "content"),
        ]
        frontier = seeds_frontier(spark, seeds)
        batch = dequeue(
            frontier, None, epoch_seconds=8.0, default_delay=2.0,
            global_budget=2, host_priority=ranks,
        )
        assert sorted(r["host"] for r in batch.collect()) == [
            "good.org", "trusted.org"
        ]


class TestSitemapDiscoveryAndRecrawl:
    def test_discover_sitemaps_explodes_rules(self, spark):
        from web_scrapper_spark.frontier.robots import (
            discover_sitemaps, robots_from_pages,
        )

        pages = spark.createDataFrame(
            [
                ("https://a.org/robots.txt", None,
                 "Sitemap: https://a.org/s1.xml\nSitemap: https://a.org/s2.xml",
                 "en"),
                ("http://a.org/robots.txt", None,
                 "Sitemap: https://a.org/s1.xml", "en"),  # dup via http twin
                ("https://b.org/robots.txt", None, "User-agent: *", "en"),
            ],
            "url string, html binary, text string, lang string",
        )
        got = {
            (r["host"], r["url"])
            for r in discover_sitemaps(robots_from_pages(pages)).collect()
        }
        assert got == {
            ("a.org", "https://a.org/s1.xml"),
            ("a.org", "https://a.org/s2.xml"),
        }

    def _due(self, spark, seen, hints, **kw):
        from web_scrapper_spark.frontier.recrawl import recrawl_due

        seen_df = spark.createDataFrame(seen, "url string, fetched_epoch int")
        hints_df = spark.createDataFrame(
            hints,
            "url string, lastmod string, changefreq string, priority_ppm int",
        )
        return {
            r["url"]: (r["due_epoch"], r["reason"])
            for r in recrawl_due(seen_df, hints_df, **kw).collect()
        }

    def test_period_math_per_changefreq(self, spark):
        seen = [(f"u{f}", 0) for f in range(7)]
        freqs = ["always", "hourly", "daily", "weekly",
                 "monthly", "yearly", "never"]
        hints = [(f"u{i}", None, f, 0) for i, f in enumerate(freqs)]
        got = self._due(spark, seen, hints, current_epoch=7)
        # epoch_hours=24: always/hourly/daily → due at 1, weekly → 7;
        # monthly (30) / yearly (365) not yet due; never → excluded
        assert got == {"u0": (1, "period"), "u1": (1, "period"),
                       "u2": (1, "period"), "u3": (7, "period")}

    def test_hintless_url_gets_default_period(self, spark):
        got = self._due(spark, [("u", 1)], [], current_epoch=8)
        assert got == {"u": (8, "period")}  # 168h/24 = 7 epochs after 1
        assert self._due(spark, [("u", 2)], [], current_epoch=8) == {}

    def test_modified_since_overrides_period(self, spark):
        hints = [("u", "2025-07-30", "never", 5),
                 ("v", "2025-07-01", "never", 5)]
        got = self._due(
            spark, [("u", 0), ("v", 0)], hints,
            current_epoch=1, modified_since="2025-07-25",
        )
        assert got == {"u": (None, "modified")}

    def test_latest_fetch_wins_and_hint_dedup_deterministic(self, spark):
        hints = [("u", None, "daily", 1), ("u", None, "always", 2)]
        got = self._due(
            spark, [("u", 0), ("u", 6)], hints, current_epoch=7
        )
        assert got == {"u": (7, "period")}  # max(fetched)=6, min-struct hint


class TestHostPriorsDequeue:
    def test_keep_ppm_allocates_capped_budget(self, spark):
        """host_priors → dequeue(host_priority=…): a capped epoch's
        slots go to the host whose documents pass quality gates."""
        from web_scrapper_spark.frontier.core import (
            dequeue,
            with_frontier_columns,
        )
        from web_scrapper_spark.operators.quality import host_priors

        docs = spark.createDataFrame(
            [("good.org", True, "en")] * 6 + [("spam.org", False, "en")] * 6,
            "host string, keep boolean, lang string",
        )
        from pyspark.sql import functions as F

        ranks = host_priors(docs).select(
            "host", F.col("keep_ppm").alias("rank")
        )
        urls = [
            (f"https://{h}/p/{i}", "content", 0, f"{h}/{i}")
            for h in ("good.org", "spam.org")
            for i in range(4)
        ]
        frontier = with_frontier_columns(
            spark.createDataFrame(
                urls, "url string, stype string, depth int, ord_key string"
            ),
            epoch=0,
        )
        batch = dequeue(
            frontier, None, epoch_seconds=60.0, default_delay=2.0,
            global_budget=4, host_priority=ranks,
        )
        hosts = [r["host"] for r in batch.collect()]
        assert len(hosts) == 4 and set(hosts) == {"good.org"}


class TestRobotsAllow:
    """RFC 9309 §2.2.2 longest-match Allow/Disallow precedence."""

    def _filter(self, spark, urls, dis, alw=None):
        from pyspark.sql import functions as F  # noqa: F401

        from web_scrapper_spark.frontier.core import robots_filter

        cand = spark.createDataFrame([(u,) for u in urls], "url string")
        if alw is None:
            robots = spark.createDataFrame(
                [("h.org", dis)], "host string, disallow_prefixes array<string>"
            )
        else:
            robots = spark.createDataFrame(
                [("h.org", dis, alw)],
                "host string, disallow_prefixes array<string>, "
                "allow_prefixes array<string>",
            )
        return {r["url"] for r in robots_filter(cand, robots).collect()}

    def test_allow_overrides_shorter_disallow(self, spark):
        urls = [
            "https://h.org/private/x",
            "https://h.org/private/pub/x",
            "https://h.org/open",
        ]
        kept = self._filter(spark, urls, ["/private"], ["/private/pub"])
        assert kept == {"https://h.org/private/pub/x", "https://h.org/open"}

    def test_longer_disallow_wins(self, spark):
        urls = ["https://h.org/a/b/c", "https://h.org/a/x"]
        kept = self._filter(spark, urls, ["/a/b"], ["/a"])
        assert kept == {"https://h.org/a/x"}

    def test_tie_goes_to_allow(self, spark):
        kept = self._filter(spark, ["https://h.org/dup/x"], ["/dup"], ["/dup"])
        assert kept == {"https://h.org/dup/x"}

    def test_no_allow_column_keeps_old_semantics(self, spark):
        kept = self._filter(
            spark, ["https://h.org/private/x", "https://h.org/ok"], ["/private"]
        )
        assert kept == {"https://h.org/ok"}

    def test_parse_and_aggregate_carry_allow(self, spark):
        from web_scrapper_spark.frontier.robots import parse_robots_txt

        r = parse_robots_txt(
            "User-agent: *\nDisallow: /p\nAllow: /p/ok\nAllow: /q\n"
        )
        assert r["allow_prefixes"] == ["/p/ok", "/q"]


class TestAdaptiveDelays:
    """Feedback-driven politeness: integer EWMA + AIMD backoff
    (frontier/adaptive.py). All expectations are hand-computed from
    the documented integer recurrence."""

    def _obs(self, spark, rows):
        return spark.createDataFrame(
            rows, "host string, epoch long, latency_ms long, is_err boolean"
        )

    def test_single_epoch_seeds_ewma(self, spark):
        from web_scrapper_spark.frontier.adaptive import adaptive_delays

        out = adaptive_delays(
            self._obs(spark, [("a.org", 0, 200, False), ("a.org", 0, 101, False)])
        ).collect()[0]
        # mean = floor(301/2) = 150; one epoch -> ewma = seed
        assert out["ewma_latency_ms"] == 150
        assert out["n_epochs"] == 1
        assert out["last_err_ppm"] == 0
        assert out["delay_ms"] == 1500  # 150 * latency_factor(10)

    def test_ewma_fold_order_and_value(self, spark):
        from web_scrapper_spark.frontier.adaptive import adaptive_delays

        # epochs arrive out of order; fold must sort by epoch:
        # seed=100, then (100*3 + 500)/4 = 200, then (200*3 + 60)/4 = 165
        rows = [("a.org", 2, 60, False), ("a.org", 0, 100, False),
                ("a.org", 1, 500, False)]
        out = adaptive_delays(self._obs(spark, rows)).collect()[0]
        assert out["n_epochs"] == 3
        assert out["ewma_latency_ms"] == 165
        assert out["delay_ms"] == 1650

    def test_error_backoff_uses_latest_epoch_only(self, spark):
        from web_scrapper_spark.frontier.adaptive import adaptive_delays

        # epoch 0 all errors, epoch 1 clean -> NO backoff (latest wins)
        calm = adaptive_delays(self._obs(spark, [
            ("a.org", 0, 100, True), ("a.org", 1, 100, False),
        ])).collect()[0]
        assert calm["last_err_ppm"] == 0
        assert calm["delay_ms"] == 1000
        # epoch 1 erroring at 50% >= 20% threshold -> 4x backoff
        hot = adaptive_delays(self._obs(spark, [
            ("a.org", 0, 100, False),
            ("a.org", 1, 100, True), ("a.org", 1, 100, False),
        ])).collect()[0]
        assert hot["last_err_ppm"] == 500000
        assert hot["delay_ms"] == 4000

    def test_clamping_both_ends(self, spark):
        from web_scrapper_spark.frontier.adaptive import adaptive_delays

        out = {
            r["host"]: r["delay_ms"]
            for r in adaptive_delays(self._obs(spark, [
                ("fast.org", 0, 3, False),      # 3*10=30 -> clamps up to 100
                ("slow.org", 0, 9000, True),    # 9000*10*4 -> clamps to 30000
            ])).collect()
        }
        assert out == {"fast.org": 100, "slow.org": 30000}

    def test_merge_robots_is_a_floor(self, spark):
        from web_scrapper_spark.frontier.adaptive import (
            adaptive_delays, merge_adaptive_delays,
        )

        delays = adaptive_delays(self._obs(spark, [
            ("polite.org", 0, 500, False),   # adaptive 5s > robots 1s
            ("strict.org", 0, 10, False),    # adaptive 0.1s < robots 8s
        ]))
        robots = spark.createDataFrame(
            [("polite.org", ["/x"], 1.0), ("strict.org", [], 8.0),
             ("robots-only.org", [], 2.0)],
            "host string, disallow_prefixes array<string>, crawl_delay double",
        )
        merged = {
            r["host"]: (r["crawl_delay"], r["disallow_prefixes"])
            for r in merge_adaptive_delays(robots, delays).collect()
        }
        assert merged["polite.org"] == (5.0, ["/x"])   # adaptive slower wins
        assert merged["strict.org"] == (8.0, [])       # robots floor holds
        assert merged["robots-only.org"] == (2.0, [])  # one-sided passthrough

    def test_merged_delays_drive_dequeue_budget(self, spark):
        """End-to-end: observations -> merged rules -> politeness
        budget. slow.org's adaptive 4s delay caps it to 2 fetches of
        an 8s epoch; fast.org keeps the 8-slot default budget."""
        from web_scrapper_spark.frontier.adaptive import (
            adaptive_delays, merge_adaptive_delays,
        )

        delays = adaptive_delays(self._obs(
            spark, [("slow.org", 0, 400, False), ("fast.org", 0, 100, False)]
        ))
        rules = merge_adaptive_delays(None, delays)
        seeds = [(f"https://slow.org/p{i}", "content") for i in range(4)] + [
            (f"https://fast.org/p{i}", "content") for i in range(4)
        ]
        batch = dequeue(
            seeds_frontier(spark, seeds), rules,
            epoch_seconds=8.0, default_delay=1.0,
        )
        by_host = {
            r["host"]: r["cnt"]
            for r in batch.groupBy("host").count()
            .withColumnRenamed("count", "cnt").collect()
        }
        assert by_host == {"slow.org": 2, "fast.org": 4}


class TestFairShare:
    """Max-min fair budget water-filling (frontier/fairshare.py).
    Expectations hand-computed from the piecewise-linear used(T)."""

    def _alloc(self, spark, rows, budget, **kw):
        from web_scrapper_spark.frontier.fairshare import fair_share_budgets

        df = spark.createDataFrame(rows, "host string, demand long")
        return {
            r["host"]: r["alloc"]
            for r in fair_share_budgets(df, budget, **kw).collect()
        }

    def test_budget_covers_all_demand(self, spark):
        rows = [("a", 1), ("b", 2), ("c", 3), ("d", 4)]
        assert self._alloc(spark, rows, 100) == {"a": 1, "b": 2, "c": 3, "d": 4}

    def test_water_level_caps_big_hosts(self, spark):
        # demands [10,10,3,1], B=12: level 3 uses 1+3*3=10, level 10
        # overshoots; T = 3 + floor(2/2) = 4, no remainder
        rows = [("a", 10), ("b", 10), ("c", 3), ("d", 1)]
        assert self._alloc(spark, rows, 12) == {"a": 4, "b": 4, "c": 3, "d": 1}

    def test_remainder_goes_to_first_capped_host(self, spark):
        # same demands, B=13: T=4 spends 12, r=1 -> host a (demand
        # desc, host asc among the capped pair) gets the extra unit
        rows = [("a", 10), ("b", 10), ("c", 3), ("d", 1)]
        assert self._alloc(spark, rows, 13) == {"a": 5, "b": 4, "c": 3, "d": 1}

    def test_every_host_capped_via_virtual_zero_level(self, spark):
        # [5,5,5], B=7: even level 5 overshoots -> d*=0 (virtual),
        # T=floor(7/3)=2, r=1 -> first capped host gets 3
        rows = [("a", 5), ("b", 5), ("c", 5)]
        assert self._alloc(spark, rows, 7) == {"a": 3, "b": 2, "c": 2}

    def test_inexact_remainder_undershoots_at_most_capped(self, spark):
        rows = [("a", 10), ("b", 10), ("c", 3), ("d", 1)]
        out = self._alloc(spark, rows, 13, exact_remainder=False)
        assert out == {"a": 4, "b": 4, "c": 3, "d": 1}  # sum 12 = B - r

    def test_zero_demand_host(self, spark):
        rows = [("a", 0), ("b", 6)]
        assert self._alloc(spark, rows, 4) == {"a": 0, "b": 4}

    def test_dequeue_fair_respects_politeness_then_fairness(self, spark):
        """Two hosts, politeness caps 4 and 8 of an 8s epoch; global
        budget 9 water-fills the capped demands [4, 8] -> [4, 5]."""
        from web_scrapper_spark.frontier.fairshare import dequeue_fair

        seeds = [(f"https://capped.org/p{i}", "content") for i in range(10)] + [
            (f"https://roomy.org/p{i}", "content") for i in range(10)
        ]
        robots = spark.createDataFrame(
            [("capped.org", [], 2.0), ("roomy.org", [], 1.0)],
            "host string, disallow_prefixes array<string>, crawl_delay double",
        )
        batch = dequeue_fair(
            seeds_frontier(spark, seeds), robots,
            epoch_seconds=8.0, default_delay=2.0, global_budget=9,
        )
        by_host = {
            r["host"]: r["cnt"]
            for r in batch.groupBy("host").count()
            .withColumnRenamed("count", "cnt").collect()
        }
        assert by_host == {"capped.org": 4, "roomy.org": 5}
        from pyspark.sql import functions as F

        # fair batch keeps the deterministic within-host order
        got = [r["ord_key"] for r in batch.filter(
            F.col("host") == "roomy.org").orderBy("ord_key").collect()]
        assert got == sorted(got)[:5]


class TestFairBudgetEpoch:
    """CrawlConfig.fair_budget: the epoch's capped dequeue water-fills
    across hosts instead of greedy corpus-wide (depth, ord_key)."""

    def _run_epoch0(self, spark, tmp_path, fair):
        import datetime

        from web_scrapper_spark.crawl.epoch import CrawlConfig, CrawlEngine
        from web_scrapper_spark.fixtures.sitegen import PAGES_SCHEMA

        ts = datetime.datetime(2025, 1, 1)
        html = b"<html><body><p>page</p></body></html>"
        urls = [f"https://a.org/p{i}" for i in range(6)] + [
            f"https://b.org/p{i}" for i in range(6)
        ]
        pages = spark.createDataFrame(
            [(u, ts, html, "", "en") for u in urls], PAGES_SCHEMA
        )
        robots = spark.createDataFrame(
            [], "host string, disallow_prefixes array<string>, crawl_delay double"
        )
        cfg = CrawlConfig(
            epoch_seconds=8.0, default_delay=1.0,
            global_budget=6, fair_budget=fair,
        )
        store = SnapshotStore(str(tmp_path / f"fair-{fair}"))
        engine = CrawlEngine(spark, store, pages, robots, cfg)
        # a.org seeds sort first in (depth, ord_key) — greedy takes all
        engine.init([(u, "content") for u in urls])
        engine.run(max_epochs=1)
        seen = engine.seen().collect()
        by_host = {}
        for r in seen:
            by_host[r["host"]] = by_host.get(r["host"], 0) + 1
        return by_host

    def test_greedy_starves_second_host(self, spark, tmp_path):
        assert self._run_epoch0(spark, tmp_path, fair=False) == {"a.org": 6}

    def test_fair_splits_the_cap(self, spark, tmp_path):
        assert self._run_epoch0(spark, tmp_path, fair=True) == {
            "a.org": 3, "b.org": 3
        }


class TestFairShareDifferential:
    """fair_share_budgets vs an independent brute force: binary-search
    the water level, then hand out the remainder — different algorithm,
    must produce identical allocations."""

    def _brute(self, demands, budget):
        total = sum(d for _, d in demands)
        if total <= budget:
            return {h: d for h, d in demands}
        lo, hi = 0, max(d for _, d in demands)
        while lo < hi:  # largest T with sum(min(d, T)) <= budget
            mid = (lo + hi + 1) // 2
            if sum(min(d, mid) for _, d in demands) <= budget:
                lo = mid
            else:
                hi = mid - 1
        t = lo
        alloc = {h: min(d, t) for h, d in demands}
        r = budget - sum(alloc.values())
        capped = sorted(
            [(h, d) for h, d in demands if d > t], key=lambda x: (-x[1], x[0])
        )
        for h, _ in capped[:r]:
            alloc[h] += 1
        return alloc

    def test_random_scenarios_match(self, spark):
        import random

        from web_scrapper_spark.frontier.fairshare import fair_share_budgets

        rng = random.Random(42)
        for case in range(5):
            n = rng.randint(1, 40)
            demands = [
                (f"h{i:02d}", rng.choice([0, 1, 2, 3, 7, 50, 51, 1000]))
                for i in range(n)
            ]
            total = sum(d for _, d in demands)
            budget = rng.randint(0, max(total + 3, 1))
            got = {
                r["host"]: r["alloc"]
                for r in fair_share_budgets(
                    spark.createDataFrame(demands, "host string, demand long"),
                    budget,
                ).collect()
            }
            want = self._brute(demands, budget)
            assert got == want, (case, budget, demands)
            assert sum(got.values()) == min(budget, total)


class TestRobotsAudit:
    """Compliance audit (core.robots_audit): current rules replayed
    against already-fetched URLs."""

    def test_violations_overrides_and_sample(self, spark):
        from web_scrapper_spark.frontier.core import robots_audit

        fetches = spark.createDataFrame(
            [("https://a.org/private/ok1",),   # allow override -> clean
             ("https://a.org/private/x",),     # violation
             ("https://a.org/private/a",),     # violation (min sample)
             ("https://a.org/pub",),
             ("https://b.org/private/ok1",),   # no allow on b -> violation
             ("https://c.org/anything",)],     # host without rules row
            "url string",
        )
        rules = spark.createDataFrame(
            [("a.org", ["/private"], ["/private/ok"]),
             ("b.org", ["/private"], [])],
            "host string, disallow_prefixes array<string>, "
            "allow_prefixes array<string>",
        )
        got = {r["host"]: r for r in robots_audit(fetches, rules).collect()}
        a = got["a.org"]
        assert (a["n_fetched"], a["n_violations"]) == (4, 2)
        assert a["violation_ppm"] == 500000
        assert a["first_violation"] == "https://a.org/private/a"
        assert got["b.org"]["n_violations"] == 1
        c = got["c.org"]
        assert (c["n_violations"], c["first_violation"]) == (0, None)

    def test_disallow_only_rules_table(self, spark):
        from web_scrapper_spark.frontier.core import robots_audit

        fetches = spark.createDataFrame(
            [("https://a.org/private/x",), ("https://a.org/pub",)],
            "url string",
        )
        rules = spark.createDataFrame(
            [("a.org", ["/private"])],
            "host string, disallow_prefixes array<string>",
        )
        r = robots_audit(fetches, rules).collect()[0]
        assert (r["n_fetched"], r["n_violations"]) == (2, 1)


class TestUrlShapeProfile:
    """URL template mining (traps.url_shape_profile): segment-level
    shapes aggregate a site's URL grammar."""

    def test_shapes_counts_and_examples(self, spark):
        from web_scrapper_spark.frontier.traps import url_shape_profile

        urls = spark.createDataFrame(
            [("https://a.org/blog/page/12",),
             ("https://a.org/blog/page/999",),
             ("https://a.org/cal/2024/01/05",),
             ("https://a.org/d/deadbeef12345678",),
             ("https://a.org/article/why-spark-2",),  # mixed word -> s
             ("https://a.org/",)],
            "url string",
        )
        got = {
            r["shape"]: (r["n_urls"], r["example_url"])
            for r in url_shape_profile(urls).collect()
        }
        assert got["/s/s/N"] == (2, "https://a.org/blog/page/12")
        assert got["/s/N/N/N"][0] == 1
        assert got["/s/H"][0] == 1
        assert got["/s/s"] == (1, "https://a.org/article/why-spark-2")
        assert got["/"][0] == 1

    def test_min_count_prunes_singletons(self, spark):
        from web_scrapper_spark.frontier.traps import url_shape_profile

        urls = spark.createDataFrame(
            [("https://a.org/p/1",), ("https://a.org/p/2",),
             ("https://a.org/one-off",)],
            "url string",
        )
        got = {r["shape"] for r in url_shape_profile(urls, min_count=2).collect()}
        assert got == {"/s/N"}

    def test_short_hex_is_not_H(self, spark):
        from web_scrapper_spark.frontier.traps import url_shape_profile

        urls = spark.createDataFrame(
            [("https://a.org/d/beef",)], "url string"  # 4 hex chars < 8
        )
        assert url_shape_profile(urls).collect()[0]["shape"] == "/s/s"


class TestDequeueByIp:
    """Server-grain politeness: hosts sharing an IP share one bucket."""

    def _frontier(self, spark, per_host, hosts):
        from web_scrapper_spark.frontier.core import seeds_frontier

        seeds = [
            (f"https://{h}/p{i}", "content")
            for h in hosts
            for i in range(per_host)
        ]
        return seeds_frontier(spark, seeds)

    def _robots(self, spark, rows):
        return spark.createDataFrame(
            [(h, [], d) for h, d in rows],
            "host string, disallow_prefixes array<string>, crawl_delay double",
        )

    def test_vhost_farm_shares_one_budget(self, spark):
        from web_scrapper_spark.frontier.core import dequeue_by_ip

        hosts = ["a.org", "b.org", "c.org"]
        frontier = self._frontier(spark, 5, hosts)
        robots = self._robots(spark, [(h, 2.0) for h in hosts])
        host_ip = spark.createDataFrame(
            [(h, "10.0.0.1") for h in hosts], "host string, ip string"
        )
        out = dequeue_by_ip(frontier, robots, host_ip, epoch_seconds=8.0)
        batch = out.filter("ip_rank <= budget").collect()
        # budget 4 for the whole farm, not 4 x 3 hosts
        assert len(batch) == 4
        assert all(r["ip_group"] == "10.0.0.1" for r in batch)
        assert sorted(r["slot_ms"] for r in batch) == [0, 2000, 4000, 6000]

    def test_unknown_host_is_own_group(self, spark):
        from web_scrapper_spark.frontier.core import dequeue_by_ip

        frontier = self._frontier(spark, 3, ["known.org", "mystery.org"])
        robots = self._robots(spark, [("known.org", 4.0), ("mystery.org", 4.0)])
        host_ip = spark.createDataFrame(
            [("known.org", "10.0.0.9")], "host string, ip string"
        )
        out = dequeue_by_ip(frontier, robots, host_ip, epoch_seconds=8.0)
        groups = {
            r["host"]: r["ip_group"] for r in out.select("host", "ip_group").distinct().collect()
        }
        assert groups == {"known.org": "10.0.0.9", "mystery.org": "mystery.org"}
        batch = out.filter("ip_rank <= budget")
        per_group = {
            r["ip_group"]: r["n"]
            for r in batch.groupBy("ip_group").count()
            .withColumnRenamed("count", "n").collect()
        }
        assert per_group == {"10.0.0.9": 2, "mystery.org": 2}

    def test_group_delay_is_most_conservative(self, spark):
        from web_scrapper_spark.frontier.core import dequeue_by_ip

        hosts = ["fast.org", "slow.org", "open.org"]
        frontier = self._frontier(spark, 10, hosts)
        # open.org has delay 0 (unlimited) — the shared box still binds
        # at slow.org's 4s
        robots = self._robots(
            spark, [("fast.org", 1.0), ("slow.org", 4.0), ("open.org", 0.0)]
        )
        host_ip = spark.createDataFrame(
            [(h, "10.1.1.1") for h in hosts], "host string, ip string"
        )
        out = dequeue_by_ip(frontier, robots, host_ip, epoch_seconds=8.0)
        assert out.select("budget").distinct().collect()[0]["budget"] == 2

    def test_none_maps_degenerate_to_per_host(self, spark):
        from web_scrapper_spark.frontier.core import dequeue_by_ip

        frontier = self._frontier(spark, 6, ["x.org", "y.org"])
        out = dequeue_by_ip(frontier, None, None, epoch_seconds=8.0,
                            default_delay=2.0)
        batch = out.filter("ip_rank <= budget")
        counts = {
            r["ip_group"]: r["n"]
            for r in batch.groupBy("ip_group").count()
            .withColumnRenamed("count", "n").collect()
        }
        assert counts == {"x.org": 4, "y.org": 4}

    def test_partitioning_independence(self, spark):
        from web_scrapper_spark.frontier.core import dequeue_by_ip

        hosts = [f"h{i}.org" for i in range(6)]
        frontier = self._frontier(spark, 7, hosts)
        robots = self._robots(spark, [(h, 2.0) for h in hosts])
        host_ip = spark.createDataFrame(
            [(h, f"10.0.0.{i % 2}") for i, h in enumerate(hosts)],
            "host string, ip string",
        )
        key = lambda r: (r["url"], r["ip_group"], r["ip_rank"], r["slot_ms"])
        a = dequeue_by_ip(frontier.repartition(1), robots, host_ip)
        b = dequeue_by_ip(frontier.repartition(13, "url"), robots, host_ip)
        assert sorted(map(key, a.collect())) == sorted(map(key, b.collect()))


class TestLatencyQuantiles:
    def _obs(self, spark, rows):
        return spark.createDataFrame(rows, "host string, latency_ms long")

    def test_matches_python_replay(self, spark):
        from web_scrapper_spark.frontier.adaptive import latency_quantiles

        rows = [("h0", (i * 37) % 1000) for i in range(200)] + [
            ("h1", (i * i) % 3000) for i in range(75)
        ]
        out = {
            r["host"]: r.asDict()
            for r in latency_quantiles(self._obs(spark, rows), 50).collect()
        }

        def replay(vals, q_ppm, bucket=50):
            from collections import Counter

            hist = Counter(v // bucket for v in vals)
            n = len(vals)
            k = (n * q_ppm + 999_999) // 1_000_000
            cum = 0
            for b in sorted(hist):
                cum += hist[b]
                if cum >= k:
                    return (b + 1) * bucket
            raise AssertionError

        for host in ("h0", "h1"):
            vals = [v for h, v in rows if h == host]
            assert out[host]["n_obs"] == len(vals)
            for q in (500_000, 950_000, 990_000):
                assert out[host][f"q{q}_ms"] == replay(vals, q)

    def test_single_bucket_degenerate(self, spark):
        from web_scrapper_spark.frontier.adaptive import latency_quantiles

        out = latency_quantiles(
            self._obs(spark, [("h", 10), ("h", 20), ("h", 49)]), 50
        ).collect()[0]
        assert (out["q500000_ms"], out["q990000_ms"]) == (50, 50)

    def test_p100_is_max_bucket_edge(self, spark):
        from web_scrapper_spark.frontier.adaptive import latency_quantiles

        out = latency_quantiles(
            self._obs(spark, [("h", 0), ("h", 975)]), 50,
            quantiles_ppm=(1_000_000,),
        ).collect()[0]
        assert out["q1000000_ms"] == 1000

    def test_histogram_merge_across_epochs(self, spark):
        """Quantiles over the union == quantiles over summed histograms
        (the persisted cross-epoch shape)."""
        from web_scrapper_spark.frontier.adaptive import latency_quantiles

        a = [("h", (i * 13) % 400) for i in range(60)]
        b = [("h", (i * 29) % 900) for i in range(40)]
        whole = latency_quantiles(self._obs(spark, a + b), 50).collect()[0]
        merged = latency_quantiles(
            self._obs(spark, a).unionByName(self._obs(spark, b)), 50
        ).collect()[0]
        assert whole.asDict() == merged.asDict()

    def test_validation(self, spark):
        from web_scrapper_spark.frontier.adaptive import latency_quantiles

        df = self._obs(spark, [("h", 1)])
        with pytest.raises(ValueError):
            latency_quantiles(df, 0)
        with pytest.raises(ValueError):
            latency_quantiles(df, 50, quantiles_ppm=(0,))


class TestHostVolatility:
    def _log(self, spark, rows):
        return spark.createDataFrame(
            rows, "host string, url string, ts long, digest string"
        )

    def test_handcrafted_change_history(self, spark):
        from web_scrapper_spark.frontier.recrawl import host_volatility

        rows = [
            ("a.org", "u1", 1, "d1"),
            ("a.org", "u1", 5, "d1"),   # revisit, unchanged
            ("a.org", "u1", 9, "d2"),   # changed, gap 4
            ("a.org", "u1", 12, "d3"),  # changed, gap 3
            ("a.org", "u2", 2, "x"),    # single capture
        ]
        out = host_volatility(self._log(spark, rows)).collect()[0]
        assert (
            out["n_captures"], out["n_urls"], out["revisits"], out["changes"]
        ) == (5, 2, 3, 2)
        assert out["change_ppm"] == 1_000_000 * 2 // 3
        assert out["mean_change_interval"] == (4 + 3) // 2

    def test_no_revisits_is_unknown_not_stable(self, spark):
        from web_scrapper_spark.frontier.recrawl import host_volatility

        out = host_volatility(
            self._log(spark, [("b.org", "u1", 1, "d"), ("b.org", "u2", 2, "e")])
        ).collect()[0]
        assert out["revisits"] == 0
        assert out["change_ppm"] == -1
        assert out["mean_change_interval"] == -1

    def test_revisits_without_change(self, spark):
        from web_scrapper_spark.frontier.recrawl import host_volatility

        out = host_volatility(
            self._log(
                spark,
                [("c.org", "u", 1, "d"), ("c.org", "u", 5, "d"),
                 ("c.org", "u", 9, "d")],
            )
        ).collect()[0]
        assert (out["revisits"], out["changes"]) == (2, 0)
        assert out["change_ppm"] == 0
        assert out["mean_change_interval"] == -1

    def test_partitioning_independence(self, spark):
        from web_scrapper_spark.frontier.recrawl import host_volatility

        rows = [
            (f"h{i % 4}.org", f"u{i % 20}", t, f"d{(i * t) % 3}")
            for i in range(40)
            for t in (i, i + 100, i + 250)
        ]
        df = self._log(spark, rows)
        a = sorted(map(tuple, host_volatility(df.repartition(1)).collect()))
        b = sorted(
            map(tuple, host_volatility(df.repartition(11, "url")).collect())
        )
        assert a == b


class TestVolatilityHints:
    """volatility_hints + recrawl_due's period_hours override — the
    observed-evidence (Cho & Garcia-Molina) adaptive recrawl loop."""

    def _vol(self, spark, rows):
        return spark.createDataFrame(
            rows,
            "host string, n_captures long, n_urls long, revisits long, "
            "changes long, change_ppm long, mean_change_interval long",
        )

    def _urls(self, spark, rows):
        return spark.createDataFrame(rows, "url string, host string")

    def test_period_mapping_and_eligibility(self, spark):
        from web_scrapper_spark.frontier.recrawl import volatility_hints

        vol = self._vol(
            spark,
            [
                ("fast.org", 10, 2, 8, 4, 500_000, 6),     # changes every 6h
                ("stable.org", 10, 2, 8, 0, 0, -1),        # revisited, never changed
                ("unknown.org", 2, 2, 0, 0, -1, -1),       # no revisits yet
            ],
        )
        urls = self._urls(
            spark,
            [("https://fast.org/a", "fast.org"),
             ("https://stable.org/a", "stable.org"),
             ("https://unknown.org/a", "unknown.org")],
        )
        got = {
            r["url"]: r["period_hours"]
            for r in volatility_hints(vol, urls, max_hours=8760).collect()
        }
        assert got == {
            "https://fast.org/a": 6,
            "https://stable.org/a": 8760,  # stability evidence -> floor cadence
            # unknown.org absent: no evidence, caller default applies
        }

    def test_clamping_and_ts_unit(self, spark):
        from web_scrapper_spark.frontier.recrawl import volatility_hints

        vol = self._vol(
            spark,
            [("a.org", 5, 1, 4, 4, 1_000_000, 0),       # interval 0 -> min
             ("b.org", 5, 1, 4, 1, 250_000, 100_000)],  # huge -> max
        )
        urls = self._urls(
            spark, [("https://a.org/", "a.org"), ("https://b.org/", "b.org")]
        )
        got = {
            r["url"]: r["period_hours"]
            for r in volatility_hints(
                vol, urls, ts_unit_hours=2, min_hours=3, max_hours=48
            ).collect()
        }
        assert got == {"https://a.org/": 3, "https://b.org/": 48}

    def test_recrawl_due_period_hours_overrides_changefreq(self, spark):
        from web_scrapper_spark.frontier.recrawl import recrawl_due

        seen = spark.createDataFrame(
            [("u1", 0), ("u2", 0), ("u3", 0)], "url string, fetched_epoch int"
        )
        hints = spark.createDataFrame(
            [
                # period 24h overrides the 'yearly' claim -> due at epoch 1
                ("u1", None, "yearly", None, 24),
                # null period falls through to changefreq 'yearly' -> not due
                ("u2", None, "yearly", None, None),
                # null period + null changefreq -> default 168h -> not due
                ("u3", None, None, None, None),
            ],
            "url string, lastmod string, changefreq string, "
            "priority_ppm int, period_hours int",
        )
        due = recrawl_due(seen, hints, current_epoch=1, epoch_hours=24)
        assert [r["url"] for r in due.collect()] == ["u1"]

    def test_engine_loop_with_observed_evidence(self, spark):
        """captures -> host_volatility -> volatility_hints ->
        enqueue_revisits: the volatile host's urls are refetched, the
        stable host's are not."""
        import tempfile

        from web_scrapper_spark.crawl.epoch import CrawlConfig, CrawlEngine
        from web_scrapper_spark.fixtures.sitegen import (
            PAGES_SCHEMA,
            SiteSpec,
            page_html,
        )
        from web_scrapper_spark.frontier.recrawl import (
            host_volatility,
            volatility_hints,
        )
        from web_scrapper_spark.frontier.store import SnapshotStore

        spec = SiteSpec()
        hosts = ["hot.example-crawl.org", "cold.example-crawl.org"]
        urls = [f"https://{h}/p{i}" for h in hosts for i in range(3)]
        bodies = [
            page_html(
                f"https://host0.example-crawl.org/blog/post-{i % 5}", spec
            ).encode("utf-8")
            for i in range(len(urls))
        ]
        pages = spark.createDataFrame(
            [(u, None, b, None, None) for u, b in zip(urls, bodies)],
            PAGES_SCHEMA,
        )
        robots = spark.createDataFrame(
            [(h, [], 0.01) for h in hosts],
            "host string, disallow_prefixes array<string>, crawl_delay double",
        )
        store = SnapshotStore(tempfile.mkdtemp(prefix="wss-vh-"))
        eng = CrawlEngine(spark, store, pages, robots, CrawlConfig(max_depth=0))
        eng.init([(u, "content") for u in urls])
        eng.run(max_epochs=5)
        # capture log: hot.example-crawl.org changed every revisit
        # (interval 1h); cold never changed across revisits
        log = spark.createDataFrame(
            [("hot.example-crawl.org", "u", 0, "d0"),
             ("hot.example-crawl.org", "u", 1, "d1"),
             ("hot.example-crawl.org", "u", 2, "d2"),
             ("cold.example-crawl.org", "v", 0, "e"),
             ("cold.example-crawl.org", "v", 1, "e")],
            "host string, url string, ts long, digest string",
        )
        hints = volatility_hints(
            host_volatility(log),
            eng.seen().select("url", "host"),
        )
        n = eng.enqueue_revisits(hints=hints, epoch_hours=1)
        assert n == 3  # hot host's urls only (period 1h = 1 epoch)
        eng.run(max_epochs=5)
        refetched = {
            r["url"]
            for r in eng.seen().filter("fetched_epoch > 0").collect()
        }
        assert refetched == {u for u in urls if u.startswith("https://hot.")}
        eng.close()


class TestCrawlDiff:
    def _wave(self, spark, rows):
        return spark.createDataFrame(rows, "url string, digest string")

    def test_all_four_statuses(self, spark):
        from web_scrapper_spark.frontier.recrawl import crawl_diff

        old = self._wave(
            spark,
            [("u1", "d1"), ("u2", "d2"), ("u3", "d3")],
        )
        new = self._wave(
            spark,
            [("u2", "d2"), ("u3", "d3x"), ("u4", "d4")],
        )
        out = {r["url"]: r["status"] for r in crawl_diff(old, new).collect()}
        assert out == {
            "u1": "removed",
            "u2": "unchanged",
            "u3": "changed",
            "u4": "added",
        }

    def test_null_digest_presence_still_classifies(self, spark):
        from web_scrapper_spark.frontier.recrawl import crawl_diff

        old = self._wave(spark, [("u1", None), ("u2", None)])
        new = self._wave(spark, [("u1", None), ("u2", "d")])
        out = {r["url"]: r["status"] for r in crawl_diff(old, new).collect()}
        # null == null is "unchanged" under eqNullSafe; null -> value
        # is a change, and neither row may be mistaken for added/removed
        assert out == {"u1": "unchanged", "u2": "changed"}

    def test_digest_columns_carried(self, spark):
        from web_scrapper_spark.frontier.recrawl import crawl_diff

        old = self._wave(spark, [("u1", "a")])
        new = self._wave(spark, [("u1", "b")])
        row = crawl_diff(old, new).first()
        assert (row["old_digest"], row["new_digest"]) == ("a", "b")


class TestParamRelevance:
    @staticmethod
    def _caps(spark, rows):
        return spark.createDataFrame(rows, "url string, digest string")

    def test_tracking_param_dropped_id_kept(self, spark):
        from web_scrapper_spark.frontier.params import param_relevance

        caps = self._caps(
            spark,
            [
                # same id, two utm values, identical content
                ("https://s.org/p?id=1&utm=a", "d1"),
                ("https://s.org/p?id=1&utm=b", "d1"),
                # id changes content at fixed utm
                ("https://s.org/p?id=2&utm=a", "d2"),
            ],
        )
        out = {r["param"]: r for r in param_relevance(caps).collect()}
        assert out["utm"]["action"] == "drop"
        assert (out["utm"]["n_groups"], out["utm"]["irrelevant_groups"]) == (1, 1)
        assert out["id"]["action"] == "keep"
        assert out["id"]["irrelevant_ppm"] == 0

    def test_no_evidence_is_unknown(self, spark):
        from web_scrapper_spark.frontier.params import param_relevance

        caps = self._caps(
            spark,
            [
                ("https://s.org/p?sess=abc", "d1"),
                ("https://s.org/q?sess=def", "d2"),  # different residual
            ],
        )
        row = param_relevance(caps).first()
        assert (row["param"], row["action"]) == ("sess", "unknown")
        assert (row["n_groups"], row["irrelevant_ppm"]) == (0, -1)

    def test_per_host_verdicts_independent(self, spark):
        from web_scrapper_spark.frontier.params import param_relevance

        caps = self._caps(
            spark,
            [
                ("https://a.org/p?x=1", "d1"),
                ("https://a.org/p?x=2", "d1"),   # x irrelevant on a.org
                ("https://b.org/p?x=1", "d1"),
                ("https://b.org/p?x=2", "d2"),   # x relevant on b.org
            ],
        )
        out = {
            (r["host"], r["param"]): r["action"]
            for r in param_relevance(caps).collect()
        }
        assert out == {("a.org", "x"): "drop", ("b.org", "x"): "keep"}

    def test_mixed_evidence_ppm(self, spark):
        from web_scrapper_spark.frontier.params import param_relevance

        caps = self._caps(
            spark,
            [
                # group 1 (residual /p?): single digest
                ("https://s.org/p?v=1", "d1"),
                ("https://s.org/p?v=2", "d1"),
                # group 2 (residual /q?): two digests
                ("https://s.org/q?v=1", "d2"),
                ("https://s.org/q?v=2", "d3"),
            ],
        )
        row = param_relevance(caps, drop_ppm=400_000).first()
        assert (row["n_groups"], row["irrelevant_groups"]) == (2, 1)
        assert row["irrelevant_ppm"] == 500_000
        assert row["action"] == "drop"  # 500k >= 400k bar

    def test_queryless_urls_contribute_nothing(self, spark):
        from web_scrapper_spark.frontier.params import param_relevance

        caps = self._caps(
            spark,
            [("https://s.org/p", "d1"), ("https://s.org/p/", "d2")],
        )
        assert param_relevance(caps).count() == 0

    def test_repeated_key_value_signature(self, spark):
        from web_scrapper_spark.frontier.params import param_relevance

        # t=1&t=2 vs t=2&t=1 is the SAME value signature (sorted);
        # with identical digests there is no multi-value evidence
        caps = self._caps(
            spark,
            [
                ("https://s.org/p?t=1&t=2", "d1"),
                ("https://s.org/p?t=2&t=1", "d1"),
            ],
        )
        row = param_relevance(caps).first()
        assert (row["n_groups"], row["action"]) == (0, "unknown")


class TestApplyParamRules:
    def test_rewrite_drops_and_sorts(self, spark):
        from web_scrapper_spark.frontier.params import (
            apply_param_rules,
            param_relevance,
        )

        caps = spark.createDataFrame(
            [
                ("https://s.org/p?id=1&utm=a", "d1"),
                ("https://s.org/p?id=1&utm=b", "d1"),
                ("https://s.org/p?id=2&utm=a", "d2"),
            ],
            "url string, digest string",
        )
        rules = param_relevance(caps)
        out = {
            r["url"]: r["canonical_url"]
            for r in apply_param_rules(caps, rules).collect()
        }
        assert out["https://s.org/p?id=1&utm=a"] == "https://s.org/p?id=1"
        assert out["https://s.org/p?id=1&utm=b"] == "https://s.org/p?id=1"
        # variants now collapse: 3 urls -> 2 canonical forms
        assert len(set(out.values())) == 2

    def test_unruled_host_passthrough_sorted(self, spark):
        from web_scrapper_spark.frontier.params import apply_param_rules

        urls = spark.createDataFrame(
            [("https://z.org/p?b=2&a=1",)], "url string"
        )
        rules = spark.createDataFrame(
            [("s.org", "utm", 1, 1, 1_000_000, "drop")],
            "host string, param string, n_groups long, "
            "irrelevant_groups long, irrelevant_ppm long, action string",
        )
        row = apply_param_rules(urls, rules).first()
        assert row["canonical_url"] == "https://z.org/p?a=1&b=2"

    def test_all_params_dropped_loses_question_mark(self, spark):
        from web_scrapper_spark.frontier.params import apply_param_rules

        urls = spark.createDataFrame(
            [("https://s.org/p?utm=a",)], "url string"
        )
        rules = spark.createDataFrame(
            [("s.org", "utm", 1, 1, 1_000_000, "drop")],
            "host string, param string, n_groups long, "
            "irrelevant_groups long, irrelevant_ppm long, action string",
        )
        row = apply_param_rules(urls, rules).first()
        assert row["canonical_url"] == "https://s.org/p"


class TestOpic:
    """OPIC online page importance (operators/graph.opic_epochs)."""

    def _fixture(self, spark):
        edges = spark.createDataFrame(
            [(0, 1), (0, 2), (1, 2), (2, 0), (3, 0)], "src long, dst long"
        )
        seeds = spark.createDataFrame([(0,), (3,)], "node long")
        return edges, seeds

    def test_hand_computed_epochs(self, spark):
        from web_scrapper_spark.operators.graph import opic_epochs

        edges, seeds = self._fixture(spark)
        got = sorted(
            (r["node"], r["cash"], r["history"])
            for r in opic_epochs(edges, seeds, epochs=3, scale=1000).collect()
        )
        # worked by hand: epoch1 0,3 spend; epoch2 0,1,2; epoch3 0,1,2
        assert got == [
            (0, 500, 1250),
            (1, 125, 500),
            (2, 375, 750),
            (3, 0, 500),
        ]

    def test_cash_conserved_every_epoch(self, spark):
        from pyspark.sql import functions as F

        from web_scrapper_spark.operators.graph import opic_epochs

        edges, seeds = self._fixture(spark)
        for ep in (1, 2, 4):
            total = (
                opic_epochs(edges, seeds, epochs=ep, scale=999_983)
                .agg(F.sum("cash"))
                .collect()[0][0]
            )
            assert total == 999_983, ep

    def test_dangling_cash_returns_to_seeds(self, spark):
        """A sink node (no outlinks) must hand its cash back to the
        seed set, not destroy it."""
        from pyspark.sql import functions as F

        from web_scrapper_spark.operators.graph import opic_epochs

        edges = spark.createDataFrame([(0, 9)], "src long, dst long")  # 9 is a sink
        seeds = spark.createDataFrame([(0,)], "node long")
        st = {r["node"]: r for r in opic_epochs(edges, seeds, epochs=2, scale=100).collect()}
        # epoch1: 0 spends 100 -> 9. epoch2: 9 dangles -> back to seed 0.
        assert st[9]["cash"] == 0 and st[9]["history"] == 100
        assert st[0]["cash"] == 100 and st[0]["history"] == 100

    def test_requires_seeds(self, spark):
        import pytest

        from web_scrapper_spark.operators.graph import opic_epochs

        edges = spark.createDataFrame([(0, 1)], "src long, dst long")
        empty = spark.createDataFrame([], "node long")
        with pytest.raises(ValueError):
            opic_epochs(edges, empty, epochs=1)

    def test_opic_feeds_dequeue(self, spark):
        """End-to-end: OPIC cash flow → host priors → capped dequeue
        picks the high-importance host first — the online refresh of
        the same seam pagerank priors use."""
        from pyspark.sql import functions as F

        from web_scrapper_spark.operators.graph import opic_epochs, opic_host_priors

        # node ids stand for urls: hub (0) is every spoke's target
        edges = spark.createDataFrame(
            [(i, 0) for i in range(1, 6)] + [(0, 1)], "src long, dst long"
        )
        seeds_df = spark.createDataFrame([(i,) for i in range(6)], "node long")
        state = opic_epochs(edges, seeds_df, epochs=3, scale=10**6)
        url_hosts = spark.createDataFrame(
            [(0, "hub.org")] + [(i, f"s{i}.org") for i in range(1, 6)],
            "node long, host string",
        )
        priors = opic_host_priors(state, url_hosts)
        top = priors.orderBy(F.desc("rank")).first()["host"]
        assert top == "hub.org"

        seeds = [("https://hub.org/a", "content"), ("https://s1.org/b", "content")]
        frontier = seeds_frontier(spark, seeds)
        batch = dequeue(
            frontier, None, epoch_seconds=8.0, default_delay=2.0,
            global_budget=1, host_priority=priors,
        )
        assert [r["host"] for r in batch.collect()] == ["hub.org"]


class TestHits:
    def test_hub_and_authority_structure(self, spark):
        """Bipartite core: directories 10..12 each point at both
        authorities (0, 1); page 20 points only at 0. Directories are
        the top hubs, 0 the top authority, and the single-link page 20
        scores strictly below the full directories."""
        from web_scrapper_spark.operators.graph import HITS_SCALE, hits

        edges = spark.createDataFrame(
            [(h, a) for h in (10, 11, 12) for a in (0, 1)] + [(20, 0)],
            "src long, dst long",
        )
        got = {r["node"]: r for r in hits(edges, num_iters=5).collect()}
        top_auth = max(got.values(), key=lambda r: (r["auth"], -r["node"]))
        assert top_auth["node"] == 0 and top_auth["auth"] == HITS_SCALE
        assert got[10]["hub"] == got[11]["hub"] == got[12]["hub"] == HITS_SCALE
        assert got[20]["hub"] < got[10]["hub"]
        assert got[1]["auth"] < got[0]["auth"]
        # 0 has no outlinks -> zero hub; 10 has no inlinks -> zero auth
        assert got[0]["hub"] == 0 and got[10]["auth"] == 0

    def test_partitioning_independence(self, spark):
        from web_scrapper_spark.operators.graph import hits

        edges = spark.createDataFrame(
            [(i, (i * 7) % 13) for i in range(40)], "src long, dst long"
        )
        a = {(r["node"], r["hub"], r["auth"]) for r in hits(edges, 4).collect()}
        b = {
            (r["node"], r["hub"], r["auth"])
            for r in hits(edges.repartition(11), 4).collect()
        }
        assert a == b


class TestTemplatedPages:
    def test_soft404_flagged_structurally(self, spark):
        from web_scrapper_spark.frontier.traps import templated_pages

        rows = (
            # one host serving the same error body (whitespace-varied)
            # at 6 distinct paths
            [(f"https://a.org/x/{i}", "Page   Not\tFound ") for i in range(3)]
            + [(f"https://a.org/y/{i}", "  page not found") for i in range(3)]
            # same body on ANOTHER host, below threshold there
            + [("https://b.org/only", "page not found")]
            # genuine distinct content on a.org
            + [(f"https://a.org/real/{i}", f"real article {i}") for i in range(4)]
        )
        pages = spark.createDataFrame(rows, "url string, text string")
        got = {r["url"]: r for r in templated_pages(pages, min_urls=5).collect()}
        assert all(
            got[f"https://a.org/x/{i}"]["templated"] for i in range(3)
        )
        # case/whitespace variants normalize to one fingerprint
        assert got["https://a.org/x/0"]["n_urls"] == 6
        assert got["https://b.org/only"]["templated"] is False  # per-host count
        assert not any(
            got[f"https://a.org/real/{i}"]["templated"] for i in range(4)
        )
        assert len(got) == len(rows)


class TestStarvationReport:
    def test_flags_match_definition(self, spark):
        from web_scrapper_spark.frontier.core import starvation_report

        frontier = spark.createDataFrame(
            [
                ("old-never.org", 1),   # waited 9 epochs, never fetched
                ("old-never.org", 4),
                ("old-recent.org", 2),  # old pending, but fetched at 9
                ("fresh.org", 9),       # just discovered
                ("old-stale.org", 3),   # old pending, last fetch long ago
            ],
            "host string, discovered_epoch long",
        )
        seen = spark.createDataFrame(
            [("old-recent.org", 9), ("old-stale.org", 2)],
            "host string, fetched_epoch long",
        )
        got = {
            r["host"]: r
            for r in starvation_report(
                frontier, seen, current_epoch=10, stale_epochs=3
            ).collect()
        }
        assert got["old-never.org"]["starving"] is True
        assert got["old-never.org"]["n_pending"] == 2
        assert got["old-never.org"]["oldest_wait"] == 9
        assert got["old-never.org"]["last_fetch_epoch"] is None
        assert got["old-recent.org"]["starving"] is False
        assert got["fresh.org"]["starving"] is False
        assert got["old-stale.org"]["starving"] is True


class TestMetricAnomalies:
    """Robust median/MAD anomaly flags (adaptive.metric_anomalies)."""

    def _run(self, spark, rows, **kw):
        from web_scrapper_spark.frontier.adaptive import metric_anomalies

        df = spark.createDataFrame(rows, "grp string, slot long, v long")
        return {
            (r["grp"], r["slot"]): r
            for r in metric_anomalies(df, "v", "slot", ("grp",), **kw).collect()
        }

    @staticmethod
    def _python_replay(rows, k_ppm):
        out = {}
        by_grp: dict = {}
        for g, s, v in rows:
            by_grp.setdefault(g, []).append((s, v))
        for g, sv in by_grp.items():
            vals = sorted((v, s) for s, v in sv)
            n = len(vals)
            med = vals[(n + 1) // 2 - 1][0]
            devs = sorted((abs(v - med), s) for s, v in sv)
            mad = devs[(n + 1) // 2 - 1][0]
            for s, v in sv:
                dev = abs(v - med)
                out[(g, s)] = (med, mad, dev, dev * 1_000_000 > k_ppm * mad)
        return out

    def test_matches_python_replay(self, spark):
        rows = [("a", s, 100 + (s * 7) % 13) for s in range(11)] + [
            ("a", 11, 4000),
            ("b", 0, 9),
            ("b", 1, 9),
            ("b", 2, 9),
            ("b", 3, 12),
        ]
        got = {
            key: (r["med"], r["mad"], r["dev"], r["anomaly"])
            for key, r in self._run(spark, rows).items()
        }
        assert got == self._python_replay(rows, 5_000_000)

    def test_spike_flags_steady_band_does_not(self, spark):
        rows = [("h", s, 200 + s % 3) for s in range(20)] + [("h", 20, 90000)]
        out = self._run(spark, rows)
        assert out[("h", 20)]["anomaly"] is True
        assert all(
            not out[("h", s)]["anomaly"] for s in range(20)
        )

    def test_constant_series_mad_zero_flags_any_move(self, spark):
        rows = [("c", s, 7) for s in range(6)] + [("c", 6, 8)]
        out = self._run(spark, rows)
        assert out[("c", 6)]["mad"] == 0
        assert out[("c", 6)]["anomaly"] is True
        assert out[("c", 0)]["anomaly"] is False

    def test_outlier_cannot_drag_median(self, spark):
        # mean/stddev would be dominated by the 1e9 point; median/MAD
        # still centers on the band
        rows = [("z", s, 50) for s in range(9)] + [("z", 9, 10**9)]
        out = self._run(spark, rows)
        assert out[("z", 0)]["med"] == 50
        assert out[("z", 9)]["anomaly"] is True


class TestRobotsRefreshDue:
    """robots.txt TTL refresh scheduling (robots.robots_refresh_due)."""

    def _run(self, spark, seen_rows, host_rows, epoch, ttl):
        from web_scrapper_spark.frontier.robots import robots_refresh_due

        seen = spark.createDataFrame(
            seen_rows, "host string, url string, fetched_epoch long"
        )
        hosts = spark.createDataFrame(host_rows, "host string")
        return {
            r["host"]: r
            for r in robots_refresh_due(seen, hosts, epoch, ttl).collect()
        }

    def test_stale_fresh_and_never_fetched(self, spark):
        out = self._run(
            spark,
            [
                ("h1", "https://h1/robots.txt", 2),
                ("h1", "https://h1/robots.txt", 5),
                ("h2", "https://h2/robots.txt", 9),
            ],
            [("h1",), ("h2",), ("h3",)],
            epoch=10,
            ttl=4,
        )
        assert out["h1"]["due"] is True and out["h1"]["last_robots_epoch"] == 5
        assert out["h2"]["due"] is False and out["h2"]["age_epochs"] == 1
        assert out["h3"]["due"] is True and out["h3"]["age_epochs"] == -1
        assert out["h3"]["last_robots_epoch"] == -1

    def test_nested_robots_path_does_not_count(self, spark):
        out = self._run(
            spark,
            [("h1", "https://h1/sub/robots.txt", 9),
             ("h1", "https://h1/robots.txt.html", 9)],
            [("h1",)],
            epoch=10,
            ttl=4,
        )
        assert out["h1"]["last_robots_epoch"] == -1
        assert out["h1"]["due"] is True

    def test_uppercase_scheme_counts(self, spark):
        # schemes are case-insensitive (RFC 3986 §3.1): an
        # HTTPS://host/robots.txt capture must count, but the PATH
        # stays case-sensitive — /ROBOTS.TXT is a different path
        out = self._run(
            spark,
            [("h1", "HTTPS://h1/robots.txt", 9),
             ("h2", "https://h2/ROBOTS.TXT", 9)],
            [("h1",), ("h2",)],
            epoch=10,
            ttl=4,
        )
        assert out["h1"]["last_robots_epoch"] == 9
        assert out["h1"]["due"] is False
        assert out["h2"]["last_robots_epoch"] == -1
        assert out["h2"]["due"] is True

    def test_exact_ttl_boundary_is_due(self, spark):
        out = self._run(
            spark,
            [("h1", "https://h1/robots.txt", 6)],
            [("h1",)],
            epoch=10,
            ttl=4,
        )
        assert out["h1"]["age_epochs"] == 4 and out["h1"]["due"] is True

    def test_bad_ttl(self, spark):
        import pytest as _pytest

        from web_scrapper_spark.frontier.robots import robots_refresh_due

        seen = spark.createDataFrame([], "host string, url string, fetched_epoch long")
        with _pytest.raises(ValueError):
            robots_refresh_due(seen, seen.select("host"), 1, 0)
