"""Corpus export layout (operators/layout.py): bucket edges, ceil
sharding, md5 determinism, and the physical partitionBy write."""

import glob
import os

import pytest

from pyspark.sql import functions as F

from web_scrapper_spark.operators.layout import corpus_layout, write_corpus


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, lang string, quality_ppm long"
    )


class TestCorpusLayout:
    def test_bucket_edges_are_lower_bounds(self, spark):
        rows = [(1, "en", 0), (2, "en", 249_999), (3, "en", 250_000),
                (4, "en", 750_000), (5, "en", 1_000_000)]
        out = {
            r["doc_id"]: r["bucket"]
            for r in corpus_layout(_docs(spark, rows)).collect()
        }
        assert out == {1: "q0", 2: "q0", 3: "q1", 4: "q3", 5: "q3"}

    def test_shard_count_is_ceiling_division(self, spark):
        rows = [(i, "en", 900_000) for i in range(7)]
        out = corpus_layout(
            _docs(spark, rows), rows_per_shard=3
        ).collect()
        assert all(r["n_shards"] == 3 for r in out)  # ceil(7/3)
        assert all(0 <= r["shard"] < 3 for r in out)

    def test_shard_is_partitioning_independent(self, spark):
        rows = [(i, "en" if i % 2 else "de", 600_000) for i in range(40)]
        a = corpus_layout(_docs(spark, rows), rows_per_shard=8)
        b = corpus_layout(
            _docs(spark, rows).repartition(13), rows_per_shard=8
        )
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

    def test_bad_rows_per_shard_raises(self, spark):
        with pytest.raises(ValueError):
            corpus_layout(_docs(spark, [(1, "en", 0)]), rows_per_shard=0)


class TestWriteCorpus:
    def test_hive_layout_and_roundtrip(self, spark, tmp_path):
        docs = spark.createDataFrame(
            [(i, "en" if i % 3 else "de", "t" + str(i),
              1_000_000 if i % 2 else 0) for i in range(30)],
            "doc_id long, lang string, text string, quality_ppm long",
        )
        path = str(tmp_path / "corpus")
        write_corpus(docs, path, rows_per_shard=4)

        dirs = {
            os.path.relpath(p, path)
            for p in glob.glob(f"{path}/lang=*/bucket=*")
        }
        assert dirs == {
            "lang=en/bucket=q0", "lang=en/bucket=q3",
            "lang=de/bucket=q0", "lang=de/bucket=q3",
        }
        back = spark.read.parquet(path)
        assert back.count() == 30
        # partition columns recovered; text intact; per-dir file count
        # bounded by that partition's shard count (ceil(rows/4))
        got = {
            (r["doc_id"], r["lang"], str(r["bucket"]), r["text"])
            for r in back.collect()
        }
        assert (0, "de", "q0", "t0") in got
        lay = corpus_layout(docs, rows_per_shard=4)
        for d in dirs:
            lang = d.split("/")[0].split("=")[1]
            bucket = d.split("=")[2]
            n_shards = lay.filter(
                (F.col("lang") == lang) & (F.col("bucket") == bucket)
            ).agg(F.max("n_shards")).collect()[0][0]
            files = glob.glob(f"{path}/{d}/*.parquet")
            assert 1 <= len(files) <= n_shards

    def test_partition_pruning_reads_one_directory(self, spark, tmp_path):
        docs = spark.createDataFrame(
            [(i, "en" if i % 2 else "de", "x", 999_999) for i in range(20)],
            "doc_id long, lang string, text string, quality_ppm long",
        )
        path = str(tmp_path / "corpus2")
        write_corpus(docs, path, rows_per_shard=100)
        pruned = spark.read.parquet(path).filter(
            (F.col("lang") == "en") & (F.col("bucket") == "q3")
        )
        assert pruned.count() == 10
        plan = pruned._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan


class TestTrainingShuffle:
    def _docs(self, spark, n=60):
        return spark.createDataFrame(
            [(i, f"src{i % 3}") for i in range(n)], "doc_id long, source string"
        )

    def test_positions_are_dense_per_shard(self, spark):
        from web_scrapper_spark.operators.layout import training_shuffle

        out = training_shuffle(
            self._docs(spark), seed="s", n_shards=4
        ).collect()
        by_shard = {}
        for r in out:
            by_shard.setdefault(r["shard"], []).append(r["pos"])
        assert set(by_shard) <= set(range(4))
        for positions in by_shard.values():
            assert sorted(positions) == list(range(1, len(positions) + 1))

    def test_deterministic_and_seed_sensitive(self, spark):
        from web_scrapper_spark.operators.layout import training_shuffle

        docs = self._docs(spark)
        a = {(r["doc_id"], r["shard"], r["pos"])
             for r in training_shuffle(docs, seed="s", n_shards=4).collect()}
        b = {(r["doc_id"], r["shard"], r["pos"])
             for r in training_shuffle(docs, seed="s", n_shards=4).collect()}
        c = {(r["doc_id"], r["shard"], r["pos"])
             for r in training_shuffle(docs, seed="t", n_shards=4).collect()}
        assert a == b
        assert a != c  # a different seed is a different permutation

    def test_shuffle_breaks_source_runs(self, spark):
        # crawl order has all of one source back-to-back; after the
        # shuffle, shard-concatenated order must interleave sources
        from web_scrapper_spark.operators.layout import training_shuffle

        docs = spark.createDataFrame(
            [(i, "a" if i < 50 else "b") for i in range(100)],
            "doc_id long, source string",
        )
        out = training_shuffle(docs, seed="s", n_shards=1).collect()
        order = [r["doc_id"] < 50 for r in sorted(out, key=lambda r: r["pos"])]
        runs = 1 + sum(1 for x, y in zip(order, order[1:]) if x != y)
        assert runs > 10  # ~50 expected; crawl order would be 2

    def test_rejects_nonpositive_shards(self, spark):
        from web_scrapper_spark.operators.layout import training_shuffle

        with pytest.raises(ValueError):
            training_shuffle(self._docs(spark), n_shards=0)


class TestMixSources:
    def _docs(self, spark, n=300):
        return spark.createDataFrame(
            [(i, f"src{i % 3}") for i in range(n)], "doc_id long, source string"
        )

    def test_integer_epochs_exact(self, spark):
        from web_scrapper_spark.operators.layout import mix_sources

        out = mix_sources(
            self._docs(spark), {"src0": 3_000_000, "src1": 0}, seed="m"
        ).collect()
        for r in out:
            if r["source"] == "src0":
                assert r["n_repeats"] == 3
            elif r["source"] == "src1":
                assert r["n_repeats"] == 0
            else:
                assert r["n_repeats"] == 1  # default 1.0 epoch

    def test_fractional_rate_hits_expectation(self, spark):
        from web_scrapper_spark.operators.layout import mix_sources

        out = mix_sources(
            self._docs(spark, n=3000), {"src0": 2_500_000}, seed="m"
        ).collect()
        src0 = [r["n_repeats"] for r in out if r["source"] == "src0"]
        assert set(src0) <= {2, 3}
        mean = sum(src0) / len(src0)
        assert 2.35 <= mean <= 2.65  # E = 2.5, n = 1000

    def test_apply_mix_materializes_copies(self, spark):
        from web_scrapper_spark.operators.layout import apply_mix, mix_sources

        docs = self._docs(spark, n=30)
        mix = mix_sources(docs, {"src0": 2_000_000, "src1": 0}, seed="m")
        out = apply_mix(docs, mix).collect()
        per_doc = {}
        for r in out:
            per_doc[r["doc_id"]] = per_doc.get(r["doc_id"], 0) + 1
        expected = {r["doc_id"]: r["n_repeats"] for r in mix.collect()}
        assert per_doc == {k: v for k, v in expected.items() if v > 0}
        # copies are distinguishable
        idx = {(r["doc_id"], r["repeat_idx"]) for r in out}
        assert len(idx) == len(out)
