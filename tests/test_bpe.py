"""Distributed BPE merge learning vs the sequential reference twin."""

from pyspark.sql import functions as F

from web_scrapper_spark.operators import bpe


def _rows(df):
    return [tuple(r) for r in df.orderBy("rank").collect()]


class TestApplyMerge:
    def _fold(self, spark, syms, left, right):
        df = spark.createDataFrame([(syms,)], "syms array<string>")
        return df.select(
            bpe.apply_merge_col(F.col("syms"), left, right).alias("out")
        ).first()["out"]

    def test_basic_merge(self, spark):
        assert self._fold(spark, ["l", "o", "w", "</w>"], "l", "o") == [
            "lo", "w", "</w>",
        ]

    def test_overlapping_pair_left_to_right(self, spark):
        # (a, a) over aaa merges non-overlapping left-to-right: [aa, a]
        assert self._fold(spark, ["a", "a", "a"], "a", "a") == ["aa", "a"]
        assert self._fold(spark, ["a", "a", "a", "a"], "a", "a") == ["aa", "aa"]

    def test_merged_token_does_not_rematch(self, spark):
        # after [x,y]->xy the fresh token must not chain-merge with a
        # following y in the same pass
        assert self._fold(spark, ["x", "y", "y"], "x", "y") == ["xy", "y"]

    def test_no_occurrence_is_identity(self, spark):
        assert self._fold(spark, ["n", "e", "w", "</w>"], "l", "o") == [
            "n", "e", "w", "</w>",
        ]


class TestLearn:
    def test_matches_sequential_reference_on_fixture(self, spark):
        docs = bpe.fixture_docs(spark)
        got = _rows(bpe.bpe_learn(docs, n_merges=16))
        want = bpe.learn_bpe_sequential(bpe.fixture_word_freqs(), 16)
        assert got == want

    def test_first_merge_is_global_argmax(self, spark):
        # 5x "low", 2x "new": best first pair is (l,o) freq 5 ... but
        # (o,w) and (w,</w>) also hit 5 on "low" alone; w</w> appears in
        # new too -> freq 7 wins
        docs = spark.createDataFrame(
            [(0, "low low low low low new new")], "doc_id long, text string"
        )
        got = _rows(bpe.bpe_learn(docs, n_merges=1))
        assert got == [(1, "w", "</w>", "w</w>", 7)]

    def test_early_stop_when_pairs_exhausted(self, spark):
        docs = spark.createDataFrame([(0, "ab ab")], "doc_id long, text string")
        # word "ab" -> [a,b,</w>]: merges (a,b)?(b,</w>) then one more,
        # then the word is a single token and training must stop early
        out = _rows(bpe.bpe_learn(docs, n_merges=10))
        assert len(out) == 2
        assert out == bpe.learn_bpe_sequential({"ab": 2}, 10)

    def test_zipf_head_word_fully_merges(self, spark):
        # with enough merges the most frequent word collapses into a
        # single token ending in </w> — the canonical BPE trajectory
        merges = bpe.learn_bpe_sequential(bpe.fixture_word_freqs(), 24)
        merged_tokens = {m[3] for m in merges}
        assert "low</w>" in merged_tokens

    def test_checkpoint_cadence_does_not_change_result(self, spark):
        docs = bpe.fixture_docs(spark)
        a = _rows(bpe.bpe_learn(docs, n_merges=9, checkpoint_every=2))
        b = _rows(bpe.bpe_learn(docs, n_merges=9, checkpoint_every=100))
        assert a == b


class TestEncode:
    def test_rank_order_fold_equals_minrank_reference(self, spark):
        from web_scrapper_spark.operators.bpe import (
            bpe_encode,
            encode_word_minrank,
            fixture_docs,
            fixture_word_freqs,
            learn_bpe_sequential,
        )
        import hashlib
        import re

        merges = learn_bpe_sequential(fixture_word_freqs(), 20)
        ranks = {(m[1], m[2]): m[0] for m in merges}
        docs = fixture_docs(spark)
        got = {
            r["doc_id"]: (r["n_words"], r["n_subwords"], r["subword_fingerprint"])
            for r in bpe_encode(docs, merges).collect()
        }
        for doc_id, text in docs.collect():
            words = [w for w in re.split(r"[^a-z0-9_]+", text.lower()) if w]
            stream = []
            for w in words:
                stream.extend(encode_word_minrank(w, ranks))
            fp = hashlib.md5(" ".join(stream).encode()).hexdigest()
            assert got[doc_id] == (len(words), len(stream), fp)

    def test_no_merges_yields_chars_plus_marker(self, spark):
        from web_scrapper_spark.operators.bpe import bpe_encode

        docs = spark.createDataFrame([(0, "ab cd!")], "doc_id long, text string")
        row = bpe_encode(docs, []).first()
        # a b </w> c d </w> -> 6 subwords, 2 words
        assert (row["n_words"], row["n_subwords"]) == (2, 6)

    def test_fully_merged_word_is_one_token(self, spark):
        from web_scrapper_spark.operators.bpe import bpe_encode

        merges = [(1, "a", "b", "ab", 9), (2, "ab", "</w>", "ab</w>", 9)]
        docs = spark.createDataFrame([(0, "ab ab")], "doc_id long, text string")
        row = bpe_encode(docs, merges).first()
        assert (row["n_words"], row["n_subwords"]) == (2, 2)
