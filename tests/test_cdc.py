"""Content-defined chunking: boundary rule, byte-exact reassembly,
the shift-robustness property fixed-size chunking lacks, and the
dedup accounting rollup."""

import hashlib

import pytest
from pyspark.sql import functions as F

from web_scrapper_spark.operators.cdc import cdc_chunks, cdc_dedup_stats


def _hash60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_chunks(text: str, k: int, avg: int) -> list[str]:
    """Sequential reference replay of the pure hash-boundary rule."""
    n = len(text)
    if n == 0:
        return []
    cuts = [
        i + k - 1
        for i in range(1, n - k + 2)
        if _hash60(text[i - 1 : i - 1 + k]) % avg == 0 and i + k - 1 < n
    ]
    bounds = [0] + cuts + [n]
    return [text[a:b] for a, b in zip(bounds, bounds[1:])]


WORDS = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa "
    "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi psi "
).split()


def _doc(seed: int, n_words: int = 120) -> str:
    """Every token embeds (seed, position): two docs never share a
    16-char window, so cross-doc dedup only happens where the fixture
    plants it (the linear word-cycle alone would make doc(s2) a pure
    shift of doc(s1) — accidental CDC hits)."""
    return " ".join(
        f"{WORDS[(seed * 7 + j * 13) % len(WORDS)]}{seed}q{j}"
        for j in range(n_words)
    )


def _boiler(n_words: int = 150) -> str:
    """Shared chrome with no seed/position salt — the planted dedup."""
    return " ".join(WORDS[(j * 5) % len(WORDS)] for j in range(n_words))


class TestCdcChunks:
    def test_matches_sequential_replay(self, spark):
        rows = [(i, _doc(i)) for i in range(12)] + [(99, ""), (98, "tiny")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = (
            cdc_chunks(df, k=16, avg_size=48)
            .orderBy("doc_id", "chunk_idx")
            .collect()
        )
        by_doc: dict[int, list] = {}
        for r in got:
            by_doc.setdefault(r["doc_id"], []).append(r)
        for doc_id, text in rows:
            want = _py_chunks(text, 16, 48)
            have = by_doc.get(doc_id, [])
            assert len(have) == len(want), doc_id
            pos = 0
            for r, w in zip(have, want):
                assert r["start_pos"] == pos and r["n_chars"] == len(w)
                assert r["chunk_md5"] == hashlib.md5(w.encode()).hexdigest()
                pos += len(w)

    def test_reassembly_is_byte_exact(self, spark):
        rows = [(i, _doc(i, 200)) for i in range(6)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        chunks = cdc_chunks(df, k=16, avg_size=32)
        # spans tile [0, n) exactly: sum of lengths == doc length and
        # each start is the previous end
        agg = (
            chunks.groupBy("doc_id")
            .agg(
                F.sum("n_chars").alias("total"),
                F.max(F.col("start_pos") + F.col("n_chars")).alias("end"),
            )
            .collect()
        )
        lens = dict(rows)
        for r in agg:
            assert r["total"] == len(lens[r["doc_id"]])
            assert r["end"] == len(lens[r["doc_id"]])

    def test_shift_robustness(self, spark):
        # THE property: a prefix edit re-chunks only the head; every
        # chunk after the first surviving cut is byte-identical.
        base = _doc(3, 300)
        edited = "BREAKING UPDATE :: " + base
        df = spark.createDataFrame(
            [(1, base), (2, edited)], "doc_id long, text string"
        )
        out = cdc_chunks(df, k=16, avg_size=32).collect()
        a = [r["chunk_md5"] for r in out if r["doc_id"] == 1]
        b = {r["chunk_md5"] for r in out if r["doc_id"] == 2}
        assert len(a) >= 4  # fixture long enough to cut several times
        # all of base's chunks except (at most) its head chunk reappear
        missing = [h for h in a[1:] if h not in b]
        assert missing == []

    def test_short_and_triggerless_docs_one_chunk(self, spark):
        df = spark.createDataFrame(
            [(1, "short"), (2, "x" * 15)], "doc_id long, text string"
        )
        out = cdc_chunks(df, k=16, avg_size=8).collect()
        assert {(r["doc_id"], r["chunk_idx"]) for r in out} == {(1, 0), (2, 0)}

    def test_validation(self, spark):
        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        with pytest.raises(ValueError):
            cdc_chunks(df, k=0)
        with pytest.raises(ValueError):
            cdc_chunks(df, avg_size=0)


class TestCdcDedupStats:
    def test_boilerplate_dedups(self, spark):
        boiler = _boiler(150)
        rows = [(i, _doc(i + 1, 80) + " " + boiler) for i in range(8)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        stats = cdc_dedup_stats(cdc_chunks(df, k=16, avg_size=32)).collect()[0]
        assert stats["total_chunks"] > stats["distinct_chunks"]
        assert stats["stored_chars"] < stats["total_chars"]
        assert stats["stored_ppm"] < 1_000_000
        # replay the rollup sequentially
        chunks = [
            c for _, t in rows for c in _py_chunks(t, 16, 32)
        ]
        uniq = {}
        for c in chunks:
            uniq.setdefault(hashlib.md5(c.encode()).hexdigest(), len(c))
        assert stats["total_chunks"] == len(chunks)
        assert stats["distinct_chunks"] == len(uniq)
        assert stats["total_chars"] == sum(len(c) for c in chunks)
        assert stats["stored_chars"] == sum(uniq.values())

    def test_all_unique_corpus_stores_everything(self, spark):
        df = spark.createDataFrame(
            [(i, _doc(i * 5 + 1, 60)) for i in range(4)],
            "doc_id long, text string",
        )
        stats = cdc_dedup_stats(cdc_chunks(df, k=16, avg_size=64)).collect()[0]
        assert stats["stored_ppm"] == 1_000_000
