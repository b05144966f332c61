"""Plan-shape regression tests: the properties docs/PLANS.md documents
are pinned here so a refactor can't silently trade a broadcast for a
cartesian product or push a vector column through an exchange. All
assertions run on the INITIAL physical plan (no job execution) at
sf0.001."""

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(autouse=True)
def _uncached(spark):
    """Other modules persist() the raw table scans (module fixtures);
    Spark's cache manager would then substitute InMemoryRelation into
    these plans and hide the scan we assert on. Cache is a hint —
    clearing it only costs recomputation elsewhere."""
    spark.catalog.clearCache()
    yield


def _plan(spark, name):
    import __spark_entry__ as em

    df = em.queries()[name](spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


#: pair-generating operators must NEVER plan an all-pairs join
_NO_ALLPAIRS = [
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "sim_ivf_topk",
    "sim_srp_topk",
    "semdedup",
    "winnow_overlap_pairs",
]


class TestPlanShapes:
    @pytest.mark.parametrize("name", _NO_ALLPAIRS)
    def test_no_cartesian_or_nested_loop(self, spark, name):
        plan = _plan(spark, name)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name

    def test_lookup_join_broadcasts_dimension(self, spark):
        # J2: part is the small side and is explicitly broadcast
        assert "BroadcastHashJoin" in _plan(spark, "j2_lookup_join")

    def test_filter_pushdown_reaches_parquet_scan(self, spark):
        # tpch_q1ish's shipdate predicate must land in PushedFilters
        plan = _plan(spark, "tpch_q1ish")
        assert "PushedFilters: [" in plan
        assert "l_shipdate" in plan.split("PushedFilters:", 1)[1][:200]

    def test_column_pruning_reaches_parquet_scan(self, spark):
        # a2_doc_stats touches doc_id/text only — the scan must not
        # read the unused source/lang/n_chars columns
        plan = _plan(spark, "a2_doc_stats")
        read = plan.split("ReadSchema:", 1)[1].split("\n", 1)[0]
        assert "text" in read
        assert "source" not in read and "n_chars" not in read

    @pytest.mark.parametrize("name", ["sim_ivf_topk", "semdedup", "sim_srp_topk"])
    def test_no_exchange_keyed_on_vectors(self, spark, name):
        # the round-1 IVF scale-killer: an Exchange hash-partitioned on
        # the embedding array. Must never come back.
        plan = _plan(spark, name)
        for line in plan.splitlines():
            if "Exchange hashpartitioning" in line:
                assert "embedding" not in line and "vec#" not in line, (
                    name, line.strip()[:160])

    def test_adaptive_delay_is_two_exchange_aggregate(self, spark):
        # (host, epoch) partial agg -> (host) agg; the EWMA fold is a
        # projection, not a window over the raw stream
        plan = _plan(spark, "adaptive_delay")
        assert plan.count("Exchange hashpartitioning") == 2
        assert "Window" not in plan

    def test_postings_blocking_window_is_bounded(self, spark):
        # the blocking window partitions by term (bounded by the max-df
        # gate) — never a global sort
        plan = _plan(spark, "postings")
        assert "SinglePartition" not in plan


class TestJoinOperatorPlans:
    def test_asof_join_is_one_keyed_exchange_no_pairs(self, spark):
        plan = _plan(spark, "asof_join")
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        # the union-marker sort: a window over the key, never a join
        assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan

    def test_range_join_avoids_nested_loop(self, spark):
        plan = _plan(spark, "range_join")
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan

    def test_priority_sample_is_takeordered(self, spark):
        # DLT top-k must plan as per-partition heaps (TakeOrdered),
        # never a global Sort + Limit over the corpus
        plan = _plan(spark, "priority_sample")
        assert "TakeOrderedAndProject" in plan

    def test_host_triangles_broadcasts_degrees(self, spark):
        # degree tables join back by broadcast; wedge closing must not
        # degenerate to a nested-loop/cartesian pair join
        plan = _plan(spark, "host_triangles")
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "BroadcastHashJoin" in plan

    def test_sketches_are_single_hash_aggregates(self, spark):
        # registers/cells come from hash aggregates with map-side
        # partials (partial_ prefix in the aggregate expressions)
        for name in ("hll_host_distinct", "cms_hot_hosts"):
            plan = _plan(spark, name)
            assert "HashAggregate" in plan, name
            assert "SortAggregate" not in plan, name

    def test_latency_quantiles_window_on_histogram(self, spark):
        # the cumsum window keys on host AFTER the (host, bucket)
        # aggregate — no window over the raw observation stream and no
        # single-partition exchange
        plan = _plan(spark, "latency_quantiles")
        assert "Exchange SinglePartition" not in plan
        assert "HashAggregate" in plan


class TestRound2LayoutPlans:
    def test_mix_sources_is_pure_projection(self, spark):
        # rate map folds into CASE; no shuffle, no join anywhere
        plan = _plan(spark, "mix_sources")
        assert "Exchange" not in plan
        assert "Join" not in plan

    def test_training_shuffle_single_exchange(self, spark):
        # one hash exchange (by shard) feeding the per-shard sort; a
        # second exchange would mean the rank window repartitioned again
        plan = _plan(spark, "training_shuffle")
        assert plan.count("Exchange hashpartitioning") == 1

    def test_crawl_diff_is_one_full_outer_join(self, spark):
        plan = _plan(spark, "crawl_diff")
        assert plan.count("SortMergeJoin") == 1
        assert "FullOuter" in plan
        assert "CartesianProduct" not in plan

    def test_bpe_encode_is_single_arrow_stage(self, spark):
        # encoding is one mapInPandas over the scan: no shuffle of the
        # corpus, no join
        plan = _plan(spark, "bpe_encode")
        assert "MapInPandas" in plan
        assert "Exchange hashpartitioning" not in plan

    def test_passage_chunks_no_shuffle(self, spark):
        # projection + posexplode only: the corpus never exchanges
        plan = _plan(spark, "passage_chunks")
        assert "Exchange" not in plan
        assert "Join" not in plan

    def test_param_rewrite_broadcasts_rules(self, spark):
        # the learned drop rules are host×param sized — they must ride
        # a broadcast join onto the URL table, never shuffle it
        plan = _plan(spark, "url_param_rewrite")
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan

    def test_param_mining_no_allpairs(self, spark):
        # evidence is aggregation-only: no join until the tiny verdict
        # rollup, never a cartesian
        plan = _plan(spark, "url_param_mining")
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestRound2SessionPlans:
    """Plan pins for the mirror/dhash/pld/perceptron/opic/hits/
    soft404/excerpt additions (docs/PLANS.md §16+)."""

    @pytest.mark.parametrize(
        "name",
        ["mirror_hosts", "dhash_pairs", "excerpt_pairs", "soft404_templated",
         "audio_pairs"],
    )
    def test_pair_generators_never_all_pairs(self, spark, name):
        plan = _plan(spark, name)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name

    def test_registered_domain_is_pure_projection(self, spark):
        # the bundled-subset eTLD+1 path: no Exchange, no Join
        plan = _plan(spark, "registered_domain")
        assert "Exchange" not in plan
        assert "Join" not in plan

    def test_pld_flood_single_aggregate_grain(self, spark):
        # one PLD-grain aggregate; the count-distinct Expand is the
        # only width increase — still no join anywhere
        plan = _plan(spark, "pld_flood")
        assert "Join" not in plan

    def test_embed_decontam_broadcasts_the_eval_set(self, spark):
        # the ONLY join shapes are the broadcast score pass (nested
        # loop over the broadcast eval set, by design) and the id-keyed
        # left join back — never a shuffled pair join on vectors
        plan = _plan(spark, "embed_decontam")
        assert "CartesianProduct" not in plan
        assert "BroadcastExchange" in plan

    def test_perceptron_scoring_has_no_weight_join(self, spark):
        # the trained model is folded in as a literal array: scoring is
        # aggregate+projection, no join against a weights table
        plan = _plan(spark, "perceptron_gate")
        assert "Join" not in plan


class TestRound2TextOpsPlans:
    """Plan pins for the paragraph-lang split and intra-doc line dedup
    (docs/PLANS.md §17)."""

    def test_line_dedup_zero_shuffle(self, spark):
        # the HOF fold runs per-row in codegen: no Exchange, no Join,
        # no Window anywhere in the plan
        plan = _plan(spark, "line_dedup")
        assert "Exchange" not in plan
        assert "Join" not in plan
        assert "Window" not in plan

    def test_paragraph_lang_single_doc_exchange(self, spark):
        # one doc-keyed hash exchange (the reassembly aggregate); the
        # guarded fan_out round-robin is the only other exchange
        plan = _plan(spark, "paragraph_lang")
        assert plan.count("Exchange hashpartitioning") == 1
        assert "Join" not in plan
        assert "Window" not in plan


class TestRound2BanditLexiconZorderPlans:
    """Plan pins for the UCB budget allocator, lexicon gates, and the
    z-order layout (docs/PLANS.md §18)."""

    def test_lexicon_gate_zero_shuffle(self, spark):
        # the lexicon is a literal array folded into a per-row HOF:
        # pure projection — no Exchange, no Join, no Window
        plan = _plan(spark, "lexicon_gate")
        assert "Exchange" not in plan
        assert "Join" not in plan
        assert "Window" not in plan

    def test_domain_blocklist_zero_shuffle(self, spark):
        # blocklist folds to literal predicates: pure projection
        plan = _plan(spark, "domain_blocklist")
        assert "Exchange" not in plan
        assert "Join" not in plan
        assert "Window" not in plan

    def test_ucb_budget_host_grain_only(self, spark):
        # URL-grain data collapses in ONE map-side-combined host
        # aggregate; everything after (scores, apportionment window,
        # the scores⋈budget join) runs on host-count rows. The window
        # is single-partition by design — bounded by host count, and
        # the largest-remainder rank needs a global order.
        plan = _plan(spark, "ucb_budget")
        assert "partial_count" in plan or "partial" in plan.lower()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_zorder_skip_stats_shape(self, spark):
        # the Morton key is per-row bit arithmetic (no UDF); the only
        # wide moves are the layout's rank window + the file-grain
        # aggregate. No joins at all.
        plan = _plan(spark, "zorder_skip")
        assert "Join" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    def test_cdc_chunks_zero_shuffle_no_udf(self, spark):
        # the candidate scan / cut list / chunk split are per-row HOFs
        # + one narrow posexplode: no Exchange, no Join, no Python
        plan = _plan(spark, "cdc_chunks")
        assert "Join" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        # the only allowed exchange is fan_out's round-robin guard
        for line in plan.splitlines():
            if "Exchange" in line:
                assert "roundrobin" in line.lower(), line.strip()[:160]

    def test_cdc_dedup_single_hash_aggregate(self, spark):
        # dedup accounting = ONE map-side-combined exchange on the
        # chunk hash + a scalar rollup
        plan = _plan(spark, "cdc_dedup")
        assert plan.count("Exchange hashpartitioning") == 1
        assert "partial" in plan.lower()

    def test_meta_robots_zero_shuffle_no_udf(self, spark):
        # directive parsing is regexp_extract_all + array HOFs folded
        # into one projection: no Exchange, no Join, no Python
        plan = _plan(spark, "meta_robots")
        assert "Exchange" not in plan
        assert "Join" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    def test_nofollow_links_zero_join_no_udf(self, spark):
        # anchor collection + per-tag href/rel pulls are HOFs over one
        # regexp_extract_all; the only wide op is the output ordering
        plan = _plan(spark, "nofollow_links")
        assert "Join" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    def test_host_split_zero_shuffle(self, spark):
        # the split is a pure function of the host string: projection
        # only — no Exchange, no Join, no Window, no Python
        plan = _plan(spark, "host_split")
        assert "Exchange" not in plan
        assert "Join" not in plan
        assert "Window" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    def test_trustrank_seed_flag_is_column_not_join(self, spark):
        # the per-iteration teleport base is a multiply on the carried
        # 0/1 seed flag — after the one-time flag build there must be
        # exactly `iters` rank-contribution joins plus the single flag
        # join, never a per-iteration seeds join (2×iters would betray
        # a join-per-iteration regression); no all-pairs anywhere
        plan = _plan(spark, "link_trustrank")
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_latest_captures_one_exchange_no_udf(self, spark):
        # newest-capture-per-url is exactly one hash Exchange on url
        # (the window partition) and its window — no join, no Python;
        # payloads move once
        plan = _plan(spark, "warc_latest_capture")
        assert plan.count("Exchange hashpartitioning") == 1
        assert "Join" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    def test_set_joins_never_all_pairs(self, spark):
        # candidates come from posting-list probes (rarest token /
        # prefix filter) — the quadratic membership test must never
        # appear as a physical plan
        for name in ("set_containment", "set_overlap"):
            plan = _plan(spark, name)
            assert "CartesianProduct" not in plan, name
            assert "BroadcastNestedLoopJoin" not in plan, name


class TestRound2SearchCrawlOpsPlans:
    """Plan pins for the round-2 additions (docs/PLANS.md §23-28):
    BM25 search, HTTP revalidation, SURT/cc-index, script profile,
    heavy hitters, gap encoding."""

    def test_script_profile_zero_shuffle(self, spark):
        # seven regexp count columns + argmax CASE: pure projection
        plan = _plan(spark, "script_profile")
        assert "Join" not in plan
        assert "Window" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        assert "Exchange" not in plan

    def test_cc_index_surt_projection_only(self, spark):
        # the SURT key is a regexp/array expression chain: no joins,
        # no Python, no wide move beyond the scan
        plan = _plan(spark, "cc_index_surt")
        assert "Join" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        assert "Exchange" not in plan

    def test_postings_gaps_no_extra_exchange(self, spark):
        # gap encoding adds ONLY a projection over the postings plan:
        # the exchanges present are the index build's own (tf, df,
        # blocking window) — no join appears for the encoding
        import __spark_entry__ as em

        base = em.queries()["postings"](spark, SF)
        enc = em.queries()["postings_gaps"](spark, SF)
        bp = base._jdf.queryExecution().executedPlan().toString()
        ep = enc._jdf.queryExecution().executedPlan().toString()
        assert ep.count("Exchange") == bp.count("Exchange")
        assert "BatchEvalPython" not in ep and "ArrowEvalPython" not in ep

    def test_heavy_hitters_broadcast_estimates(self, spark):
        # per-row estimates ride broadcast joins; the only hash
        # exchange before the candidate aggregate is the sketch
        # build's own cell aggregate (checkpointed away) — the stream
        # itself is never hash-exchanged until after the filter
        plan = _plan(spark, "heavy_hitters")
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_revalidation_no_python_no_nested_loop(self, spark):
        # header rendering + 304 classification are codegen; the two
        # url joins are equi-joins
        plan = _plan(spark, "http_revalidate")
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_bm25_search_broadcasts_query_terms(self, spark):
        # the postings scan is probed by a broadcast of the tiny
        # query-terms table; no shuffle keyed on the corpus text
        plan = _plan(spark, "bm25_search")
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestPositionalSearchPlans:
    """Round-5 positional family: from-index query paths must read
    shard columns only (never text/html) and stay JVM-side; the
    query-sized tables must broadcast."""

    def _build_index(self, spark):
        from pyspark.sql import functions as F

        from web_scrapper_spark.operators.textops import (
            build_positional_postings,
        )

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        idx = build_positional_postings(docs, 500, block_size=64)
        # persist as parquet so the plan shows a real scan, like a
        # crawl store serving the index
        import tempfile

        d = tempfile.mkdtemp(prefix="posidx_")
        idx.write.mode("overwrite").parquet(d)
        return spark.read.parquet(d)

    def _assert_index_only(self, plan):
        assert "MapInPandas" not in plan
        assert "ArrowEvalPython" not in plan
        assert "BatchEvalPython" not in plan
        for line in plan.splitlines():
            if "ReadSchema" in line:
                assert "text" not in line and "html" not in line, line

    def test_phrase_from_index_reads_index_only(self, spark):
        from web_scrapper_spark.operators.textops import phrase_search

        idx = self._build_index(spark)
        df = phrase_search(phrase="value table", index=idx, k=10)
        plan = df._jdf.queryExecution().executedPlan().toString()
        self._assert_index_only(plan)
        # the slots table is query-sized: must broadcast, and the
        # final ranking is a TakeOrdered, not a global sort
        assert "BroadcastHashJoin" in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan
        assert "TakeOrderedAndProject" in plan

    def test_proximity_from_index_reads_index_only(self, spark):
        from web_scrapper_spark.operators.textops import proximity_search

        idx = self._build_index(spark)
        df = proximity_search(query="value table", index=idx, window=8, k=10)
        plan = df._jdf.queryExecution().executedPlan().toString()
        self._assert_index_only(plan)
        assert "TakeOrderedAndProject" in plan

    def test_boolean_from_index_reads_index_only(self, spark):
        from web_scrapper_spark.operators.textops import boolean_search

        idx = self._build_index(spark)
        df = boolean_search(index=idx, must=("value",), should=("table",))
        plan = df._jdf.queryExecution().executedPlan().toString()
        self._assert_index_only(plan)
        assert "TakeOrderedAndProject" in plan

    def test_vocab_services_from_index_read_index_only(self, spark):
        from web_scrapper_spark.operators.textops import (
            prefix_suggest,
            spell_correct,
        )

        idx = self._build_index(spark)
        for df in (
            spell_correct(queries=["valu"], index=idx, max_edit=1),
            prefix_suggest(prefixes=["va"], index=idx, k=3),
        ):
            plan = df._jdf.queryExecution().executedPlan().toString()
            self._assert_index_only(plan)
