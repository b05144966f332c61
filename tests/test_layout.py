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
