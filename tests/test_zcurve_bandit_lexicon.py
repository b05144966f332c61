"""Round-2 additions: z-order layout, UCB budget allocation, lexicon
gates. Each operator's scale shape is pinned in tests/test_plans.py
via its queries() entry; here: semantics."""

import pytest
from pyspark.sql import functions as F

from web_scrapper_spark.frontier.bandit import (
    host_yield_stats,
    ucb_budgets,
    ucb_scores,
)
from web_scrapper_spark.operators.lexicon import (
    domain_blocklist_flags,
    lexicon_stats,
)
from web_scrapper_spark.operators.zcurve import (
    file_skip_stats,
    zorder_key,
    zorder_layout,
)


def _morton2(x: int, y: int, bits: int = 16) -> int:
    out = 0
    for i in range(bits):
        out |= ((x >> i) & 1) << (2 * i)
        out |= ((y >> i) & 1) << (2 * i + 1)
    return out


class TestZOrder:
    def test_key_matches_python_morton(self, spark):
        rows = [(i, (i * 7) % 64, (i * 13) % 64) for i in range(200)]
        df = spark.createDataFrame(rows, "uid long, x long, y long")
        got = {
            r["uid"]: r["z"]
            for r in df.select(
                "uid", zorder_key([F.col("x"), F.col("y")], bits=6).alias("z")
            ).collect()
        }
        for uid, x, y in rows:
            assert got[uid] == _morton2(x, y, 6), (uid, x, y)

    def test_key_masks_out_of_range(self, spark):
        df = spark.createDataFrame([(1, 1 << 20, -1)], "uid long, x long, y long")
        z = df.select(
            zorder_key([F.col("x"), F.col("y")], bits=4).alias("z")
        ).collect()[0]["z"]
        # x masked to 0, y masked to 0b1111 -> odd interleave bits set
        assert z == _morton2(0, 15, 4)

    def test_validation(self, spark):
        with pytest.raises(ValueError):
            zorder_key([F.col("x")], bits=4)
        with pytest.raises(ValueError):
            zorder_key([F.col("x"), F.col("y")], bits=32)

    def test_tie_assignment_deterministic_without_known_id(self, spark):
        """Rows tied on zkey in a frame with NO doc_id/uid/url column:
        the fallback total order (all map-free columns) must make the
        zfile split of the tie group partitioning-independent."""
        from web_scrapper_spark.operators.zcurve import zorder_layout

        # 64 rows, only 4 distinct (x, y) combos -> heavy zkey ties
        rows = [(i, (i % 2) * 3, (i % 4) // 2) for i in range(64)]
        df = spark.createDataFrame(rows, "rid long, x long, y long")
        dims = [F.col("x"), F.col("y")]
        a = {
            r["rid"]: r["zfile"]
            for r in zorder_layout(df.repartition(1), dims, n_files=8).collect()
        }
        b = {
            r["rid"]: r["zfile"]
            for r in zorder_layout(
                df.repartition(9, "rid"), dims, n_files=8
            ).collect()
        }
        assert a == b
        # explicit tiebreak: same guarantee
        c = {
            r["rid"]: r["zfile"]
            for r in zorder_layout(
                df.repartition(5), dims, n_files=8, tiebreak=["rid"]
            ).collect()
        }
        assert a == c

    def test_both_dims_skip_under_zorder(self, spark):
        # 32x32 grid, one row per cell: under z-order into 16 files a
        # point predicate on EITHER dim may scan only files whose
        # min/max straddle it; under an x-only sort, y never skips.
        grid = [(x * 32 + y, x, y) for x in range(32) for y in range(32)]
        df = spark.createDataFrame(grid, "uid long, x long, y long")
        laid = zorder_layout(df, [F.col("x"), F.col("y")], n_files=16, bits=5)
        stats = file_skip_stats(laid, ["x", "y"]).collect()
        assert len(stats) == 16 and all(s["n_rows"] == 64 for s in stats)

        def files_scanned(stats, dim, v):
            return sum(
                1 for s in stats if s[f"min_{dim}"] <= v <= s[f"max_{dim}"]
            )

        # every probe value on both dims scans at most half the files
        for v in (0, 7, 15, 23, 31):
            assert files_scanned(stats, "x", v) <= 8
            assert files_scanned(stats, "y", v) <= 8

        # contrast: x-sorted layout never skips on y
        xsorted = df.withColumn("zkey", F.col("x"))
        from pyspark.sql import Window

        win = Window.orderBy("zkey", "uid")
        xsorted = xsorted.withColumn(
            "zfile", (F.ntile(16).over(win) - 1).cast("long")
        )
        xstats = file_skip_stats(xsorted, ["x", "y"]).collect()
        assert files_scanned(xstats, "y", 15) == 16  # no pruning at all


class TestUcb:
    def test_scores_fixed_point(self, spark):
        stats = spark.createDataFrame(
            [("a", 64, 32), ("b", 4, 4), ("c", 4, 0)],
            "host string, n_fetched long, n_yield long",
        )
        out = {r["host"]: r for r in ucb_scores(stats).collect()}
        # N=72 -> floor(log2)=6; radicand a = 6e12/64 = 93_750_000_000
        import math

        def expect(n, y):
            mean = y * 10**6 // n
            rad = 6 * 10**12 // n
            s = math.isqrt(rad)
            return mean, 1_414_214 * s // 10**6, mean + 1_414_214 * s // 10**6

        for host, n, y in (("a", 64, 32), ("b", 4, 4), ("c", 4, 0)):
            m, e, u = expect(n, y)
            r = out[host]
            assert (r["mean_yield_ppm"], r["explore_ppm"], r["ucb_ppm"]) == (
                m,
                e,
                u,
            ), host
        # exploration favors the under-sampled arm at equal yield rate
        assert out["b"]["explore_ppm"] > out["a"]["explore_ppm"]

    def test_budgets_sum_exactly_and_follow_scores(self, spark):
        stats = spark.createDataFrame(
            [("a", 100, 90), ("b", 100, 50), ("c", 100, 10), ("d", 100, 0)],
            "host string, n_fetched long, n_yield long",
        )
        out = ucb_budgets(ucb_scores(stats), total_budget=1000)
        rows = {r["host"]: r for r in out.collect()}
        assert sum(r["budget"] for r in rows.values()) == 1000
        assert (
            rows["a"]["budget"]
            > rows["b"]["budget"]
            > rows["c"]["budget"]
            > rows["d"]["budget"]
            > 0  # exploration keeps the zero-yield arm alive
        )

    def test_budget_min_score_gate_and_zero_total(self, spark):
        stats = spark.createDataFrame(
            [("a", 10, 10), ("b", 10, 0)],
            "host string, n_fetched long, n_yield long",
        )
        scored = ucb_scores(stats)
        gated = ucb_budgets(
            scored, total_budget=10, min_score_ppm=1_000_000
        ).collect()
        g = {r["host"]: r["budget"] for r in gated}
        assert g["b"] == 0 and g["a"] == 10
        allzero = ucb_budgets(scored.filter("host = 'nope'"), 10)
        assert allzero.count() == 0

    def test_host_yield_stats(self, spark):
        seen = spark.createDataFrame(
            [("h1", "u1"), ("h1", "u2"), ("h2", "u3")], "host string, url string"
        )
        items = spark.createDataFrame(
            [("https://h1/x",), ("https://h1/y",), ("https://h1/z",)],
            "src_url string",
        )
        out = {
            r["host"]: r
            for r in host_yield_stats(seen, items, url_col="src_url").collect()
        }
        assert (out["h1"]["n_fetched"], out["h1"]["n_yield"]) == (2, 3)
        assert (out["h2"]["n_fetched"], out["h2"]["n_yield"]) == (1, 0)


class TestLexicon:
    def test_stats_per_occurrence(self, spark):
        docs = spark.createDataFrame(
            [
                (1, "spam and SPAM and eggs"),   # 2 hits of 5 tokens
                (2, "clean text here"),
                (3, ""),
            ],
            "doc_id long, text string",
        )
        out = {
            r["doc_id"]: r
            for r in lexicon_stats(
                docs, ["spam", "junk"], max_frac_ppm=300_000
            ).collect()
        }
        assert (out[1]["n_tokens"], out[1]["n_hits"]) == (5, 2)
        assert out[1]["hit_frac_ppm"] == 400_000 and out[1]["flagged"]
        assert out[2]["n_hits"] == 0 and not out[2]["flagged"]
        assert (out[3]["n_tokens"], out[3]["hit_frac_ppm"]) == (0, 0)

    def test_stats_rejects_empty_lexicon(self, spark):
        docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        with pytest.raises(ValueError):
            lexicon_stats(docs, [])

    def test_domain_blocklist_parent_semantics(self, spark):
        pages = spark.createDataFrame(
            [
                ("https://evil.com/a",),
                ("https://ads.evil.com/b",),
                ("https://notevil.com/c",),
                ("https://fine.org/d",),
            ],
            "url string",
        )
        out = {
            r["url"]: r
            for r in domain_blocklist_flags(pages, ["evil.com"]).collect()
        }
        assert out["https://evil.com/a"]["blocked"]
        assert out["https://ads.evil.com/b"]["blocked_by"] == "evil.com"
        assert not out["https://notevil.com/c"]["blocked"]
        assert not out["https://fine.org/d"]["blocked"]
