"""Tests for sequence packing, URL filtering, and stratified sampling
(training-data pipeline layer)."""

import hashlib
import re

import pytest
from pyspark.sql import functions as F

from web_scrapper_spark.operators import packing as pk
from web_scrapper_spark.operators import sampling as sp
from web_scrapper_spark.operators import urlfilter as uf


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").persist()


def _py_bpe_count(text):
    return len(re.findall(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]", text))


class TestPacking:
    def test_pack_matches_sequential_simulation(self, spark, docs):
        """Concatenate-then-chunk per bin, simulated in plain Python."""
        budget, n_bins = 64, 4
        out = {
            r["doc_id"]: r
            for r in pk.pack_sequences(
                docs, budget=budget, n_bins=n_bins
            ).collect()
        }
        rows = docs.select("doc_id", "text").collect()
        import hashlib

        bins = {}
        for r in sorted(rows, key=lambda r: r["doc_id"]):
            h = int(hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:15], 16)
            bins.setdefault(h % n_bins, []).append(r)
        checked = 0
        for bin_id, members in bins.items():
            cum = 0
            for r in members:
                n = _py_bpe_count(r["text"])
                got = out[r["doc_id"]]
                assert got["bin_id"] == bin_id
                assert got["n_tok"] == n
                assert got["shard_id"] == cum // budget
                assert got["shard_offset"] == cum % budget
                assert got["spans_boundary"] == (cum % budget + n > budget)
                cum += n
                checked += 1
        assert checked == len(rows) == len(out)

    def test_every_token_assigned_exactly_once(self, spark, docs):
        """Within a bin the shards tile the token stream: doc k's
        start = doc k-1's start + n_tok (no gaps, no overlap)."""
        out = pk.pack_sequences(docs, budget=100, n_bins=2).collect()
        bins = {}
        for r in sorted(out, key=lambda r: r["doc_id"]):
            bins.setdefault(r["bin_id"], []).append(r)
        for members in bins.values():
            pos = 0
            for r in members:
                assert r["shard_id"] * 100 + r["shard_offset"] == pos
                pos += r["n_tok"]

    def test_manifest_rollup(self, spark, docs):
        budget = 128
        packed = pk.pack_sequences(docs, budget=budget, n_bins=4).persist()
        man = pk.shard_manifest(packed, budget=budget).collect()
        by_key = {(r["bin_id"], r["shard_id"]): r for r in man}
        agg = (
            packed.groupBy("bin_id", "shard_id")
            .agg(F.count("*").alias("n"), F.sum("n_tok").alias("t"))
            .collect()
        )
        assert len(by_key) == len(agg)
        for r in agg:
            m = by_key[(r["bin_id"], r["shard_id"])]
            assert m["n_docs"] == r["n"]
            assert m["docs_tok"] == r["t"]
            assert m["tok_begin"] == r["shard_id"] * budget
        # tok_begin/tok_end tile each bin's stream with no gaps or
        # overlap; non-last spans are whole multiples of `budget` (a
        # >1 multiple only when a spilling doc swallowed a shard), and
        # the last shard ends at the bin's total stream length
        bins = {}
        for r in man:
            bins.setdefault(r["bin_id"], []).append(r)
        totals = {
            r["bin_id"]: r["tot"]
            for r in packed.groupBy("bin_id")
            .agg(F.sum("n_tok").alias("tot"))
            .collect()
        }
        for bin_id, shards in bins.items():
            shards.sort(key=lambda r: r["shard_id"])
            pos = shards[0]["tok_begin"]
            for i, r in enumerate(shards):
                assert r["tok_begin"] == pos
                if i < len(shards) - 1:
                    span = r["tok_end"] - r["tok_begin"]
                    assert span >= budget and span % budget == 0
                pos = r["tok_end"]
            assert shards[-1]["tok_end"] == totals[bin_id]
        packed.unpersist()

    def test_tok_col_passthrough(self, spark):
        df = spark.createDataFrame(
            [(1, 10), (2, 20), (3, 30), (4, 40)], ["doc_id", "nt"]
        )
        out = pk.pack_sequences(
            df, budget=25, n_bins=1, tok_col="nt"
        ).collect()
        got = {r["doc_id"]: (r["shard_id"], r["shard_offset"]) for r in out}
        # order by doc_id: excl cumsums 0,10,30,60
        assert got == {1: (0, 0), 2: (0, 10), 3: (1, 5), 4: (2, 10)}

    def test_bad_args(self, spark, docs):
        with pytest.raises(ValueError):
            pk.pack_sequences(docs, budget=0)
        with pytest.raises(ValueError):
            pk.pack_sequences(docs, budget=10, n_bins=0)

    def test_no_single_partition_window(self, spark, docs):
        """The plan must never sort globally: the window partitions by
        bin_id, so no Exchange SinglePartition appears."""
        plan = pk.pack_sequences(
            docs, budget=64, n_bins=8
        )._jdf.queryExecution().executedPlan().toString()
        assert "SinglePartition" not in plan


class TestUrlFilter:
    def _df(self, spark):
        rows = [
            (1, "https://news.example.org/a"),
            (2, "https://ads.tracker.example.com/x?id=1"),
            (3, "https://tracker.example.com/y"),
            (4, "https://example.com/clean"),
            (5, "https://safe.org/casino-reviews"),
            (6, "https://safe.org/poker-and-pills"),
            (7, "https://CASINO.safe.org/ok"),
            (8, "https://localhost/z"),
        ]
        return spark.createDataFrame(rows, ["doc_id", "url"])

    def test_suffix_blocking(self, spark):
        out = {
            r["doc_id"]: r
            for r in uf.url_filter(
                self._df(spark), blocklist=["tracker.example.com"]
            ).collect()
        }
        assert out[2]["domain_blocked"] and out[2]["url_blocked"]
        assert out[3]["domain_blocked"]
        assert not out[4]["domain_blocked"]  # sibling, not parent
        assert not out[1]["domain_blocked"]

    def test_unparseable_url_is_false_not_null(self, spark):
        """NULL host (mailto:, relative paths) must yield False flags —
        a NULL url_blocked would poison every downstream funnel gate
        into three-value-logic limbo."""
        df = spark.createDataFrame(
            [(1, "mailto:x@y.org"), (2, "/relative/path")],
            ["doc_id", "url"],
        )
        for r in uf.url_filter(df, blocklist=["tracker.example.com"]).collect():
            assert r["domain_blocked"] is False
            assert r["url_blocked"] is False

    def test_parent_domain_blocks_children_only(self, spark):
        out = {
            r["doc_id"]: r["domain_blocked"]
            for r in uf.url_filter(
                self._df(spark), blocklist=["example.com"]
            ).collect()
        }
        assert out[2] and out[3] and out[4]
        assert not out[1] and not out[5]

    def test_soft_word_scoring(self, spark):
        out = {
            r["doc_id"]: r
            for r in uf.url_filter(self._df(spark)).collect()
        }
        assert out[5]["word_score_centi"] == 100  # casino
        assert out[5]["url_blocked"]
        assert out[6]["word_score_centi"] == 140  # poker+pills
        assert out[6]["url_blocked"]
        assert out[7]["word_score_centi"] == 100  # case-folded host hit
        assert out[4]["word_score_centi"] == 0
        assert not out[4]["url_blocked"]

    def test_dataframe_blocklist_matches_literal(self, spark):
        df = self._df(spark)
        bl = ["tracker.example.com", "safe.org"]
        lit = {
            (r["doc_id"], r["domain_blocked"], r["url_blocked"])
            for r in uf.url_filter(df, blocklist=bl).collect()
        }
        bdf = spark.createDataFrame([(d,) for d in bl], ["domain"])
        viadf = {
            (r["doc_id"], r["domain_blocked"], r["url_blocked"])
            for r in uf.url_filter(df, blocklist=bdf).collect()
        }
        assert lit == viadf

    def test_single_label_host(self, spark):
        out = {
            r["doc_id"]: r["domain_blocked"]
            for r in uf.url_filter(
                self._df(spark), blocklist=["localhost"]
            ).collect()
        }
        assert out[8]


def _h60(x):
    return int(hashlib.md5(str(x).encode()).hexdigest()[:15], 16)


class TestSampling:
    def test_hash_fraction_deterministic_and_close(self, docs):
        out = sp.hash_fraction_sample(docs, 0.25)
        ids = {r["doc_id"] for r in out.select("doc_id").collect()}
        expected = {
            r["doc_id"]
            for r in docs.select("doc_id").collect()
            if _h60(r["doc_id"]) < int(0.25 * sp.HASH_SPACE)
        }
        assert ids == expected
        n = docs.count()
        assert abs(len(ids) / n - 0.25) < 0.1

    def test_stratified_exact_quotas(self, docs):
        quotas = {"src0": 7, "src1": 3}
        out = sp.stratified_sample(docs, quotas).persist()
        counts = {
            r["source"]: r["n"]
            for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
        }
        assert counts == quotas
        # selected = smallest (h, id) per stratum, recomputed in python
        rows = docs.select("doc_id", "source").collect()
        for s, q in quotas.items():
            member = sorted(
                (r["doc_id"] for r in rows if r["source"] == s),
                key=lambda i: (_h60(i), i),
            )[:q]
            got = sorted(
                r["doc_id"] for r in out.filter(F.col("source") == s).collect()
            )
            assert got == sorted(member)
        out.unpersist()

    def test_quota_larger_than_stratum_keeps_all(self, spark):
        df = spark.createDataFrame(
            [(i, "a") for i in range(5)], ["doc_id", "source"]
        )
        out = sp.stratified_sample(df, {"a": 100})
        assert out.count() == 5

    def test_prefilter_same_selection(self, docs):
        quotas = {"src0": 5, "src1": 5}
        counts = {
            r["source"]: r["n"]
            for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
        }
        exact = {
            r["doc_id"]
            for r in sp.stratified_sample(docs, quotas).collect()
        }
        pre = {
            r["doc_id"]
            for r in sp.stratified_sample(
                docs, quotas, prefilter_margin=8.0, stratum_counts=counts
            ).collect()
        }
        assert exact == pre

    def test_prefilter_shortfall_falls_back_to_exact(self, docs):
        """A margin too small to keep quota survivors must NOT silently
        under-fill: the shortfall check routes those strata through the
        exact path, so the selection equals the unfiltered one."""
        quotas = {"src0": 5, "src1": 5}
        counts = {
            r["source"]: r["n"]
            for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
        }
        exact = {
            r["doc_id"] for r in sp.stratified_sample(docs, quotas).collect()
        }
        # margin 0.01: the hash prefilter keeps ~0 rows per stratum —
        # without the fallback the quotas would come back near-empty
        starved = sp.stratified_sample(
            docs, quotas, prefilter_margin=0.01, stratum_counts=counts
        ).collect()
        assert {r["doc_id"] for r in starved} == exact

    def test_null_weight_raises(self, spark):
        df = spark.createDataFrame(
            [(1, 5), (2, None)], "doc_id long, weight long"
        )
        with pytest.raises(Exception, match="priority_sample"):
            sp.priority_sample(df, 1).collect()

    def test_domain_mix_rounding(self, spark):
        df = spark.createDataFrame(
            [(i, "a" if i % 3 else "b") for i in range(300)],
            ["doc_id", "source"],
        )
        out = sp.domain_mix(df, {"a": 2, "b": 1}, total=100)
        counts = {
            r["source"]: r["n"]
            for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
        }
        assert sum(counts.values()) == 100
        assert counts["a"] == 67 and counts["b"] == 33

    def test_quota_rounding_sums_to_total(self):
        q = sp._quotas_from_weights({"a": 1, "b": 1, "c": 1}, 100)
        assert sum(q.values()) == 100 and sorted(q.values()) == [33, 33, 34]

    def test_bad_args(self, spark, docs):
        with pytest.raises(ValueError):
            sp.hash_fraction_sample(docs, 1.5)
        with pytest.raises(ValueError):
            sp.stratified_sample(docs, {})
        with pytest.raises(ValueError):
            sp.stratified_sample(docs, {"a": 1}, prefilter_margin=2.0)
        with pytest.raises(ValueError):
            sp.domain_mix(docs, {"a": 0.0}, total=10)


class TestCorpusFunnel:
    """End-to-end pipeline funnel (operators/pipeline.py): one
    handcrafted document per stage so every gate's drop is exact."""

    BASE = (
        "This guide explains how the crawler schedules polite fetches and "
        "why the frontier keeps one ordered queue per host so that every "
        "request lands inside its window while extraction of articles and "
        "products continues in parallel across the cluster with bounded "
        "memory and steady throughput for each epoch under load today"
    )
    NEAR = (
        "This guide explains how the crawler schedules polite fetches and "
        "why the frontier keeps one ordered queue per host so that every "
        "request lands inside its window while extraction of articles and "
        "products continues in parallel across the cluster with bounded "
        "memory and careful accounting of several worker partitions done overnight"
    )
    BENCHED = (
        "Results of the held out evaluation suite are reported with exact "
        "match scoring and the aggregate table lists every task alongside "
        "its split size so that reviewers can audit which documents from "
        "the training corpus shared any overlapping passage with a test "
        "item and decide whether removal of those pages is warranted now"
    )
    FRENCH = (
        "le rapport est dans la salle et les membres sont pour une "
        "lecture dans le calme et la mesure pour une semaine et le vote "
        "est dans les regles pour le groupe et la charte est une base "
        "pour les statuts et le compte est dans la marge pour une annee "
        "et le plan est dans les temps pour la suite et le bilan"
    )

    @pytest.fixture(scope="class")
    def funnel(self, spark):
        from web_scrapper_spark.operators.pipeline import corpus_funnel

        rows = [
            (0, self.BASE, "https://news.example.org/a"),
            (1, self.BASE, "https://ads.tracker.example.com/b"),   # blocked domain
            (2, self.BASE, "https://clean.example.net/c?ref=casino"),  # soft word
            (3, self.FRENCH, "https://news.example.org/d"),        # lang != en
            (4, "too short to pass the gopher minimum word count",
             "https://news.example.org/e"),                        # gopher
            (5, self.BASE, "https://blog.example.org/f"),          # exact dup of 0
            (6, self.NEAR, "https://blog.example.org/g"),          # near dup of 0
            (7, self.BENCHED, "https://news.example.org/h"),       # contaminated
        ]
        docs = spark.createDataFrame(rows, ["doc_id", "text", "url"])
        bench = spark.createDataFrame([(100, self.BENCHED)], ["doc_id", "text"])
        out = corpus_funnel(docs, bench, blocklist=["tracker.example.com"])
        return {r["stage"]: r.asDict() for r in out.collect()}

    def test_stage_docs(self, funnel):
        assert funnel["input"]["docs"] == 8
        assert funnel["url_filter"]["docs"] == 6
        assert funnel["lang_en"]["docs"] == 5
        assert funnel["gopher"]["docs"] == 4
        assert funnel["exact_dedup"]["docs"] == 3
        assert funnel["near_dedup"]["docs"] == 2
        assert funnel["decontaminate"]["docs"] == 1

    def test_tokens_monotone_and_exact(self, funnel):
        toks = [funnel[s]["tokens"] for s in (
            "input", "url_filter", "lang_en", "gopher",
            "exact_dedup", "near_dedup", "decontaminate")]
        assert toks == sorted(toks, reverse=True)
        # the lone survivor is doc 0 (BASE)
        assert funnel["decontaminate"]["tokens"] == _py_bpe_count(self.BASE)

    def test_stage_order(self, funnel):
        assert [funnel[s]["stage_ord"] for s in (
            "input", "url_filter", "lang_en", "gopher",
            "exact_dedup", "near_dedup", "decontaminate")] == list(range(7))

    def test_null_text_doc_stays_counted(self, spark):
        """Regression (round-5 advice): md5(NULL) is NULL and NULL join
        keys never match, so a null-text doc silently vanished from the
        whole funnel at the stage-4 fingerprint join — 'input' itself
        undercounted. The sentinel fingerprint keeps the row; null and
        EMPTY texts must stay in distinct fp groups (old window
        semantics), so an empty-text doc isn't deduped against nulls."""
        from web_scrapper_spark.operators.pipeline import (
            corpus_funnel,
            funnel_flags,
        )

        rows = [
            (0, self.BASE, "https://news.example.org/a"),
            (1, None, "https://news.example.org/nulltext"),
            (2, self.BASE, "https://blog.example.org/f"),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string, url string")
        bench = spark.createDataFrame([(100, self.BENCHED)], ["doc_id", "text"])
        out = {r["stage"]: r.asDict()
               for r in corpus_funnel(docs, bench).collect()}
        assert out["input"]["docs"] == 3          # was 2 before the fix
        assert out["exact_dedup"]["docs"] == 1    # doc 2 deduped vs 0

        # null vs empty text: different fingerprint groups
        rows2 = rows + [(3, "", "https://news.example.org/empty"),
                        (4, None, "https://news.example.org/null2")]
        docs2 = spark.createDataFrame(
            rows2, "doc_id long, text string, url string")
        flags = funnel_flags(docs2, bench)
        fps = {r["doc_id"]: r["_fp"]
               for r in flags.select("doc_id", "_fp").collect()}
        assert fps[1] == fps[4]       # both null-text docs share a group
        assert fps[1] != fps[3]       # ...distinct from the empty-text doc


class TestTokenBudgetSelect:
    """Quality-greedy token-budget selection (sampling.py
    token_budget_select). Expectations hand-computed from the global
    (quality desc, id asc) prefix rule the histogram path must equal."""

    ROWS = [(1, 900, 10), (2, 800, 10), (3, 800, 5), (4, 700, 10)]

    def _sel(self, spark, budget, rows=None, **kw):
        from web_scrapper_spark.operators.sampling import token_budget_select

        df = spark.createDataFrame(
            rows or self.ROWS, "doc_id long, quality_ppm long, n_tokens long"
        )
        out = token_budget_select(df, budget, **kw).collect()
        return {r["doc_id"] for r in out if r["selected"]}, len(out)

    def test_boundary_level_fills_in_id_order(self, spark):
        sel, n = self._sel(spark, 22)
        # 900 fits (10), boundary=800 with 12 left: doc2 (10) fits,
        # doc3 would reach 15 -> out; doc4 below boundary
        assert sel == {1, 2} and n == 4

    def test_whole_corpus_fits(self, spark):
        sel, n = self._sel(spark, 100)
        assert sel == {1, 2, 3, 4} and n == 4

    def test_zero_budget_selects_nothing(self, spark):
        sel, _ = self._sel(spark, 0)
        assert sel == set()

    def test_inexact_skips_boundary_level(self, spark):
        sel, n = self._sel(spark, 22, boundary_exact=False)
        assert sel == {1} and n == 4

    def test_null_quality_sorts_worst_and_rows_survive(self, spark):
        """NULL quality ranks below every real level (filled last) and
        its rows stay in the output — raw NULL comparisons would
        three-value-NULL the flag and silently drop them."""
        rows = [(1, 900, 10), (2, None, 10), (3, None, 10), (4, 100, 10)]
        # budget 25: 900 (10), then 100 (10), then NULLs fill last —
        # doc2 would reach 30 > 25, out
        sel, n = self._sel(spark, 25, rows=rows)
        assert n == 4  # every input row present with a flag
        assert sel == {1, 4}
        # budget covering one NULL doc: id order within the NULL level
        sel, n = self._sel(spark, 30, rows=rows)
        assert n == 4 and sel == {1, 4, 2}

    def test_matches_global_prefix_rule(self, spark):
        """Differential: histogram path == global cumulative-sum rule
        on a larger deterministic corpus."""
        import hashlib

        rows = [
            (i,
             int(hashlib.md5(f"q{i}".encode()).hexdigest()[:4], 16) % 50 * 1000,
             int(hashlib.md5(f"t{i}".encode()).hexdigest()[:4], 16) % 200 + 1)
            for i in range(300)
        ]
        budget = sum(r[2] for r in rows) * 6 // 10
        sel, _ = self._sel(spark, budget, rows=rows)
        ordered = sorted(rows, key=lambda r: (-r[1], r[0]))
        cum, expect = 0, set()
        for i, q, t in ordered:
            cum += t
            if cum <= budget:
                expect.add(i)
        assert sel == expect


class TestFunnelReasons:
    def test_each_handcrafted_doc_gets_its_exact_reason(self, spark):
        """Same one-doc-per-stage corpus as TestCorpusFunnel; the
        per-doc audit must name the precise gate for every row."""
        from web_scrapper_spark.operators.pipeline import funnel_reasons

        tc = TestCorpusFunnel
        rows = [
            (0, tc.BASE, "https://news.example.org/a"),
            (1, tc.BASE, "https://ads.tracker.example.com/b"),
            (2, tc.BASE, "https://clean.example.net/c?ref=casino"),
            (3, tc.FRENCH, "https://news.example.org/d"),
            (4, "too short to pass the gopher minimum word count",
             "https://news.example.org/e"),
            (5, tc.BASE, "https://blog.example.org/f"),
            (6, tc.NEAR, "https://blog.example.org/g"),
            (7, tc.BENCHED, "https://news.example.org/h"),
        ]
        docs = spark.createDataFrame(rows, ["doc_id", "text", "url"])
        bench = spark.createDataFrame([(100, tc.BENCHED)], ["doc_id", "text"])
        got = {
            r["doc_id"]: (r["dropped_at"], r["kept"])
            for r in funnel_reasons(
                docs, bench, blocklist=["tracker.example.com"]
            ).collect()
        }
        assert got == {
            0: ("kept", True),
            1: ("url_filter", False),
            2: ("url_filter", False),
            3: ("lang_en", False),
            4: ("gopher", False),
            5: ("exact_dedup", False),
            6: ("near_dedup", False),
            7: ("decontaminate", False),
        }


class TestPrioritySample:
    """Duffield–Lund–Thorup priority sampling (sampling.priority_sample)."""

    def _h40(self, i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:10], 16)

    def _replay(self, rows, k):
        """Pure-python DLT replay: (selected ids, tau, w_est per id)."""
        scored = [
            (w * sp.PRIORITY_HASH_SPACE // (self._h40(i) + 1), self._h40(i), i, w)
            for i, w in rows
        ]
        order = sorted(scored, key=lambda t: (-t[0], t[1], t[2]))
        tau = order[k][0] if len(order) > k else 0
        sel = order[:k]
        return {i for _, _, i, _ in sel}, tau, {
            i: max(w, tau) for _, _, i, w in sel
        }

    def _weighted(self, spark, n=300):
        rows = [(i, (i * i) % 997 + 1) for i in range(n)]
        return rows, spark.createDataFrame(rows, ["doc_id", "weight"])

    def test_matches_python_replay(self, spark):
        rows, df = self._weighted(spark)
        out = sp.priority_sample(df, 25).collect()
        ids, tau, west = self._replay(rows, 25)
        assert {r["doc_id"] for r in out} == ids
        assert all(r["tau"] == tau for r in out)
        assert {r["doc_id"]: r["w_est"] for r in out} == west
        # priorities are the exact integer floor-division
        for r in out:
            assert r["priority"] == (
                r["weight"] * sp.PRIORITY_HASH_SPACE // (self._h40(r["doc_id"]) + 1)
            )

    def test_partitioning_independence(self, spark):
        _, df = self._weighted(spark, 200)
        a = sp.priority_sample(df.repartition(1), 17).collect()
        b = sp.priority_sample(df.repartition(13, "weight"), 17).collect()
        key = lambda r: (r["doc_id"], r["priority"], r["tau"], r["w_est"])
        assert sorted(map(key, a)) == sorted(map(key, b))

    def test_small_corpus_all_selected_tau_zero(self, spark):
        df = spark.createDataFrame(
            [(1, 10), (2, 20), (3, 30)], ["doc_id", "weight"]
        )
        out = sp.priority_sample(df, 5).collect()
        assert len(out) == 3
        assert all(r["tau"] == 0 for r in out)
        assert all(r["w_est"] == r["weight"] for r in out)

    def test_merge_distributive(self, spark):
        """top-k over the union == top-k over the per-half samples
        (the cross-epoch merge shape)."""
        rows, df = self._weighted(spark, 240)
        half_a = df.filter(F.col("doc_id") < 120)
        half_b = df.filter(F.col("doc_id") >= 120)
        merged = sp.priority_sample(
            sp.priority_sample(half_a, 19)
            .select("doc_id", "weight")
            .unionByName(sp.priority_sample(half_b, 19).select("doc_id", "weight")),
            19,
        )
        full = sp.priority_sample(df, 19)
        assert {r["doc_id"] for r in merged.collect()} == {
            r["doc_id"] for r in full.collect()
        }

    def test_weight_out_of_range_raises(self, spark):
        df = spark.createDataFrame([(1, 0), (2, 5)], ["doc_id", "weight"])
        with pytest.raises(Exception, match="priority_sample"):
            sp.priority_sample(df, 1).collect()
        df2 = spark.createDataFrame(
            [(1, sp.MAX_PRIORITY_WEIGHT + 1)], ["doc_id", "weight"]
        )
        with pytest.raises(Exception, match="priority_sample"):
            sp.priority_sample(df2, 1).collect()

    def test_k_validation(self, spark):
        df = spark.createDataFrame([(1, 1)], ["doc_id", "weight"])
        with pytest.raises(ValueError):
            sp.priority_sample(df, 0)


class TestPassageChunks:
    def _run(self, spark, text, chunk=8, overlap=3):
        from web_scrapper_spark.operators.packing import passage_chunks

        docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
        return sorted(
            passage_chunks(
                docs, chunk_tokens=chunk, overlap=overlap
            ).collect(),
            key=lambda r: r["chunk_id"],
        )

    def test_short_doc_is_one_chunk(self, spark):
        out = self._run(spark, "a b c")
        assert len(out) == 1
        assert out[0]["chunk_text"] == "a b c"
        assert out[0]["n_tokens"] == 3
        assert out[0]["start_tok"] == 0

    def test_windows_overlap_and_cover(self, spark):
        words = [f"w{i}" for i in range(12)]
        out = self._run(spark, " ".join(words), chunk=8, overlap=3)
        # step 5: starts 0, 5 -> windows [0:8], [5:12]
        assert [(r["start_tok"], r["n_tokens"]) for r in out] == [(0, 8), (5, 7)]
        assert out[1]["chunk_text"] == " ".join(words[5:12])
        # every token covered
        covered = set()
        for r in out:
            covered.update(range(r["start_tok"], r["start_tok"] + r["n_tokens"]))
        assert covered == set(range(12))

    def test_exact_boundary_no_empty_tail(self, spark):
        # n == chunk + k*step lands the last window flush on the end
        words = [f"w{i}" for i in range(8 + 2 * 5)]
        out = self._run(spark, " ".join(words), chunk=8, overlap=3)
        assert [(r["start_tok"], r["n_tokens"]) for r in out] == [
            (0, 8), (5, 8), (10, 8),
        ]

    def test_empty_doc_yields_no_rows(self, spark):
        assert self._run(spark, "   ") == []

    def test_rejects_bad_overlap(self, spark):
        from web_scrapper_spark.operators.packing import passage_chunks

        docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        import pytest as _pytest

        with _pytest.raises(ValueError):
            passage_chunks(docs, chunk_tokens=4, overlap=4)


class TestHostSplit:
    """operators/sampling.py — leakage-safe host-grain splits."""

    def _df(self, spark, n=300, hosts=40):
        rows = [(i, f"h{i % hosts}.example.org") for i in range(n)]
        return spark.createDataFrame(rows, "doc_id long, host string")

    def test_matches_md5_replay(self, spark):
        import hashlib

        from web_scrapper_spark.operators.sampling import host_split

        got = host_split(self._df(spark), val_ppm=100_000, test_ppm=50_000).collect()
        for r in got:
            h = hashlib.md5(f"split-v1|{r['host']}".encode()).hexdigest()
            bucket = int(h[:15], 16) % 1_000_000
            assert r["split_bucket_ppm"] == bucket
            want = (
                "test" if bucket < 50_000
                else "val" if bucket < 150_000
                else "train"
            )
            assert r["split"] == want

    def test_host_disjoint(self, spark):
        from web_scrapper_spark.operators.sampling import host_split

        got = host_split(self._df(spark), val_ppm=300_000, test_ppm=300_000)
        per_host = (
            got.groupBy("host").agg(F.countDistinct("split").alias("n")).collect()
        )
        assert all(r["n"] == 1 for r in per_host)

    def test_salt_redraws(self, spark):
        from web_scrapper_spark.operators.sampling import host_split

        a = host_split(self._df(spark), salt="v1").select("host", "split_bucket_ppm")
        b = host_split(self._df(spark), salt="v2").select("host", "split_bucket_ppm")
        diff = a.join(b.withColumnRenamed("split_bucket_ppm", "b2"), "host").filter(
            "split_bucket_ppm != b2"
        )
        assert diff.count() > 0

    def test_stable_across_partitionings(self, spark):
        from web_scrapper_spark.operators.sampling import host_split

        base = self._df(spark)
        a = {
            (r["doc_id"], r["split"])
            for r in host_split(base.repartition(1)).collect()
        }
        b = {
            (r["doc_id"], r["split"])
            for r in host_split(base.repartition(16)).collect()
        }
        assert a == b

    def test_bad_ppm_rejected(self, spark):
        import pytest

        from web_scrapper_spark.operators.sampling import host_split

        with pytest.raises(ValueError):
            host_split(self._df(spark), val_ppm=900_000, test_ppm=200_000)
