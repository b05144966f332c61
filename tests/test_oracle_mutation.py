"""Mutation tests for the correctness gate (anti-tautology guard).

Several oracles share constants/helpers with the Spark side (the
entry module imports ``minhash_params``, tokenizers, etc. to build its
DuckDB SQL), so a silent bug in a shared constant could in principle
pass both sides. These tests prove the gate actually PINS those
constants: the oracle SQL is frozen FIRST (exactly what the driver
snapshots), then one shared constant/helper is perturbed via
monkeypatch — simulating the bug — and the identical gate compare
(the real ``scripts/check_oracles.py`` canonicalizer) must go RED.

Families covered (the judge's minimum): minhash, BM25, graph
fixed-point, winnow — plus a comparator canary proving a single
changed cell flips the value hash.
"""

import importlib.util
import os

import duckdb
import pytest

import __spark_entry__ as se

SF_DIR = "/root/testdata/sf0.001"


def _load_gate():
    """Import the REAL gate canonicalizer (no copy drift)."""
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts", "check_oracles.py",
    )
    spec = importlib.util.spec_from_file_location("check_oracles", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


GATE = _load_gate()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in GATE.TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    yield con
    con.close()


@pytest.fixture(scope="module")
def frozen_oracles():
    """The oracle SQL snapshot, taken BEFORE any mutation — the
    driver's view of the contract."""
    return dict(se.oracle_sql())


def _compare(spark, duck, frozen_oracles, name):
    """The gate compare: (rows_match, hash_match)."""
    sdf = se.queries()[name](spark, SF_DIR).toPandas()
    odf = duck.execute(frozen_oracles[name]).fetchdf()
    _, shash = GATE._canon(sdf)
    _, ohash = GATE._canon(odf)
    return len(sdf) == len(odf), shash == ohash


def _assert_pins(spark, duck, frozen_oracles, name, mutate, monkeypatch):
    """Green unmutated; RED (rows or hash) once the shared constant is
    perturbed. A mutation that stays green would mean the oracle does
    not constrain that constant — the tautology this guards against."""
    rows_ok, hash_ok = _compare(spark, duck, frozen_oracles, name)
    assert rows_ok and hash_ok, f"{name} not green unmutated at sf0.001"
    mutate(monkeypatch)
    rows_ok, hash_ok = _compare(spark, duck, frozen_oracles, name)
    assert not (rows_ok and hash_ok), (
        f"{name}: gate stayed GREEN under mutation — oracle does not pin "
        "the shared constant (tautology)"
    )


class TestOracleMutation:
    def test_minhash_family_pins_shingle_tokenizer(
        self, spark, duck, frozen_oracles, monkeypatch
    ):
        # NOTE the constant that is NOT pinnable here: perturbing the
        # (a_i, b_i) hash params only moves LSH candidates, and the
        # exact-Jaccard verification makes the OUTPUT robust to them
        # by design. The family's real shared helper is the tokenizer the
        # shingles build on — a bug there must move inter/union/jaccard
        # and go RED.
        from pyspark.sql import functions as F

        from web_scrapper_spark.operators import dedup

        real = dedup.tokens_col

        def mutate(mp):
            mp.setattr(
                dedup,
                "tokens_col",
                lambda c: real(F.concat(c, F.lit(" zzmutant"))),
            )

        _assert_pins(
            spark, duck, frozen_oracles, "dedup_minhash_lsh", mutate,
            monkeypatch,
        )

    def test_bm25_family_pins_tokenizer(
        self, spark, duck, frozen_oracles, monkeypatch
    ):
        from pyspark.sql import functions as F

        from web_scrapper_spark.operators import textops

        real = textops.tokens_col

        def mutate(mp):
            # a tokenizer bug that mints one extra token per doc/query:
            # changes dl, t_tokens, idf — scores must drift off-oracle
            mp.setattr(
                textops,
                "tokens_col",
                lambda c: real(F.concat(c, F.lit(" zzmutant"))),
            )

        _assert_pins(
            spark, duck, frozen_oracles, "bm25_search", mutate, monkeypatch,
        )

    def test_graph_fixed_point_pins_damping(
        self, spark, duck, frozen_oracles, monkeypatch
    ):
        from web_scrapper_spark.operators import graph

        real = graph.pagerank

        def mutate(mp):
            mp.setattr(
                graph,
                "pagerank",
                lambda *a, **kw: real(
                    *a, **{**kw, "damping_pct": 84}
                ),
            )

        _assert_pins(
            spark, duck, frozen_oracles, "link_pagerank", mutate,
            monkeypatch,
        )

    def test_winnow_family_pins_window(
        self, spark, duck, frozen_oracles, monkeypatch
    ):
        from web_scrapper_spark.operators import textops

        real = textops.winnow_fingerprints

        def mutate(mp):
            mp.setattr(
                textops,
                "winnow_fingerprints",
                lambda docs, **kw: real(docs, **{**kw, "w": 5}),
            )

        _assert_pins(
            spark, duck, frozen_oracles, "fingerprint_winnow", mutate,
            monkeypatch,
        )

    def test_cdc_family_pins_rolling_hash(
        self, spark, duck, frozen_oracles, monkeypatch
    ):
        from web_scrapper_spark.operators import cdc

        real = cdc._hash60

        def mutate(mp):
            # a rolling-hash bug shifts every content-defined cut point
            mp.setattr(cdc, "_hash60", lambda s: real(s) + 1)

        _assert_pins(
            spark, duck, frozen_oracles, "cdc_chunks", mutate, monkeypatch,
        )

    def test_bpe_family_pins_merge_selection(
        self, spark, duck, frozen_oracles, monkeypatch
    ):
        from pyspark.sql import functions as F

        from web_scrapper_spark.operators import bpe

        real = bpe._pair_counts

        def mutate(mp):
            # a pair-count bug biasing one symbol changes the argmax
            # merge order, which cascades through the whole vocabulary
            mp.setattr(
                bpe,
                "_pair_counts",
                lambda wf: real(wf).withColumn(
                    "freq",
                    F.when(
                        F.col("left") == "e", F.col("freq") + 5
                    ).otherwise(F.col("freq")),
                ),
            )

        _assert_pins(
            spark, duck, frozen_oracles, "bpe_learn", mutate, monkeypatch,
        )

    def test_raster_family_pins_encoder_quantization(
        self, spark, duck, frozen_oracles, monkeypatch
    ):
        # round-4 family: the jpeg_decode gate compares engine-decoded
        # pixels against VALUES frozen from the independent oracle
        # decoder over the SHARED planted fixture. A bug in the shared
        # encoder path (here: the quality-scaled quantization table
        # that both the fixture and any re-freeze would use) must move
        # the decoded luma sums and go RED against the frozen VALUES.
        from web_scrapper_spark.operators import rasters

        real = rasters.scaled_quant_table

        def mutate(mp):
            mp.setattr(
                rasters,
                "scaled_quant_table",
                lambda base, quality: real(base, max(1, quality - 20)),
            )

        _assert_pins(
            spark, duck, frozen_oracles, "jpeg_decode", mutate, monkeypatch,
        )

    def test_bm25_tokenizer_also_pins_mlt_from_index(
        self, spark, duck, frozen_oracles, monkeypatch
    ):
        # round-4 family: mlt_from_index glues weights-from-postings
        # onto the search replay; the shared tokenizer is load-bearing
        # through BOTH stages (postings tf/dl, N/T scalars, search
        # scores), so the same one-extra-token bug must red it too.
        from pyspark.sql import functions as F

        from web_scrapper_spark.operators import textops

        real = textops.tokens_col

        def mutate(mp):
            mp.setattr(
                textops,
                "tokens_col",
                lambda c: real(F.concat(c, F.lit(" zzmutant"))),
            )

        _assert_pins(
            spark, duck, frozen_oracles, "mlt_from_index", mutate,
            monkeypatch,
        )

    def test_persisted_weights_rank_pins_mlt(
        self, spark, duck, frozen_oracles, monkeypatch
    ):
        # round-5 family: mlt_persisted_weights consumes a PRE-RANKED
        # weight table (the cfg.index_term_weights store table) — a
        # rank-maintenance bug in the writer (every rank off by one,
        # silently dropping the last query term) must red the gate,
        # proving the query really reads the persisted ranks rather
        # than re-deriving them
        from pyspark.sql import functions as F

        from web_scrapper_spark.operators import textops

        real = textops.bm25_term_weights_from_postings

        def mutate(mp):
            def shifted(postings, k=0, **kw):
                out = real(postings, k=k, **kw)
                return out.withColumn("rank", F.col("rank") + 1)

            mp.setattr(
                textops, "bm25_term_weights_from_postings", shifted
            )

        _assert_pins(
            spark, duck, frozen_oracles, "mlt_persisted_weights", mutate,
            monkeypatch,
        )

    def test_animation_family_pins_disposal_chain(
        self, spark, duck, frozen_oracles, monkeypatch
    ):
        # round-5 family: the gif_frames gate compares engine-rendered
        # animation frames against VALUES frozen from the independent
        # compositor over the SHARED planted fixture. A bug in the
        # shared encoder's GCE emission (here: disposal methods
        # silently collapsed to 1 = leave-in-place) changes what the
        # disposal-2/3 fixtures render and must go RED against the
        # frozen VALUES — proving the gate pins the whole
        # encode→composite disposal chain, not just byte equality.
        from web_scrapper_spark.operators import rasters

        real = rasters.build_gif_animation

        def flattened(frames, *args, **kwargs):
            if kwargs.get("disposals") is not None:
                kwargs = dict(kwargs, disposals=[1] * len(frames))
            return real(frames, *args, **kwargs)

        def mutate(mp):
            mp.setattr(rasters, "build_gif_animation", flattened)

        _assert_pins(
            spark, duck, frozen_oracles, "gif_frames", mutate, monkeypatch,
        )

    def test_favicon_family_pins_row_order(
        self, spark, duck, frozen_oracles, monkeypatch
    ):
        # round-5 family: favicon_decode compares engine-decoded
        # BMP/ICO pixels against VALUES frozen from the independent
        # byte-loop oracle over the SHARED planted fixture. A bug in
        # the shared encoder's bottom-up row emission (here: rows
        # written top-down while the header still claims bottom-up)
        # flips every image vertically — luma SUMS are unchanged, so
        # only the dHash columns can catch it; the gate must go RED.
        from web_scrapper_spark.operators import multimodal as mmod

        real = mmod.build_bmp

        def flipped(pixels):
            import numpy as np

            return real(np.asarray(pixels)[::-1])

        def mutate(mp):
            mp.setattr(mmod, "build_bmp", flipped)

        _assert_pins(
            spark, duck, frozen_oracles, "favicon_decode", mutate,
            monkeypatch,
        )

    def test_phrase_family_pins_token_offsets(
        self, spark, duck, frozen_oracles, monkeypatch
    ):
        """A tokenizer bug that PREPENDS one token shifts every 0-based
        offset by one — first_pos, position lists and snippet spans all
        drift off-oracle (appending, the other families' trick, would
        leave existing offsets untouched and prove nothing here)."""
        from pyspark.sql import functions as F

        from web_scrapper_spark.operators import textops

        real = textops.tokens_col

        def mutate(mp):
            mp.setattr(
                textops,
                "tokens_col",
                lambda c: real(F.concat(F.lit("zzmutant "), c)),
            )

        for name in ("phrase_search", "phrase_from_index", "snippets",
                     "positional_postings"):
            _assert_pins(
                spark, duck, frozen_oracles, name, mutate, monkeypatch,
            )
            monkeypatch.undo()

    def test_spell_family_pins_candidate_generation(
        self, spark, duck, frozen_oracles, monkeypatch
    ):
        """The spell_correct oracle does NO pruning (brute-force
        query x vocab Levenshtein), so a candidate-generation bug —
        here: deletion variants silently empty, leaving only exact-
        match keys — MUST surface as missing suggestions and turn the
        gate red. This is the completeness contract made executable."""
        from pyspark.sql import functions as F

        from web_scrapper_spark.operators import textops

        def mutate(mp):
            mp.setattr(
                textops,
                "_deletion_variants",
                lambda col: F.array().cast("array<string>"),
            )

        _assert_pins(
            spark, duck, frozen_oracles, "spell_correct", mutate,
            monkeypatch,
        )

    def test_comparator_canary_single_cell(self):
        """One changed cell in one row must flip the value hash — the
        comparator itself is not order/format-forgiving."""
        import pandas as pd

        a = pd.DataFrame({"id": [1, 2, 3], "v": [10, 20, 30]})
        b = a.copy()
        b.loc[1, "v"] = 21
        _, ha = GATE._canon(a)
        _, hb = GATE._canon(b)
        assert ha != hb
        # column order must not matter; row order must not matter
        c = a[["v", "id"]].iloc[::-1].reset_index(drop=True)
        _, hc = GATE._canon(c)
        assert hc == ha
