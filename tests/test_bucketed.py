"""Bucketed co-located joins (sources/bucketed.py): the epoch's
seen-set anti-join with the shuffle paid once at write time."""

import pytest

from pyspark.sql import functions as F

from web_scrapper_spark.sources.bucketed import (
    read_bucketed_table,
    write_bucketed_table,
)


@pytest.fixture()
def no_broadcast(spark):
    """Force the sort-merge path: a broadcast join ignores bucketing
    (correct for genuinely small sides — here both sides model big
    tables)."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


class TestBucketedAntiJoin:
    def test_cobucketed_anti_join_has_zero_exchange(
        self, spark, tmp_path, no_broadcast
    ):
        seen = spark.range(10_000).select(
            F.concat(F.lit("u"), F.col("id").cast("string")).alias("url")
        )
        cand = spark.range(5_000).select(
            F.concat(F.lit("u"), (F.col("id") * 3).cast("string")).alias("url")
        )
        write_bucketed_table(
            seen, "t_seen_bkt", str(tmp_path / "seen"), "url", 16
        )
        write_bucketed_table(
            cand, "t_cand_bkt", str(tmp_path / "cand"), "url", 16
        )
        try:
            j = read_bucketed_table(spark, "t_cand_bkt").join(
                read_bucketed_table(spark, "t_seen_bkt"), "url", "left_anti"
            )
            plan = j._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan  # the write paid the shuffle
            # ids*3 <= 9999 are seen; 5000 - 3334 survive
            assert j.count() == 1666
        finally:
            spark.sql("DROP TABLE IF EXISTS t_seen_bkt")
            spark.sql("DROP TABLE IF EXISTS t_cand_bkt")

    def test_mismatched_buckets_fall_back_gracefully(
        self, spark, tmp_path, no_broadcast
    ):
        a = spark.range(100).select(F.col("id").cast("string").alias("url"))
        write_bucketed_table(a, "t_bkt_a", str(tmp_path / "a"), "url", 8)
        write_bucketed_table(a, "t_bkt_b", str(tmp_path / "b"), "url", 4)
        try:
            j = read_bucketed_table(spark, "t_bkt_a").join(
                read_bucketed_table(spark, "t_bkt_b"), "url"
            )
            # different bucket counts: still correct, just re-shuffles
            # (at most one side when counts divide)
            assert j.count() == 100
        finally:
            spark.sql("DROP TABLE IF EXISTS t_bkt_a")
            spark.sql("DROP TABLE IF EXISTS t_bkt_b")

    def test_bad_bucket_count_raises(self, spark, tmp_path):
        df = spark.range(1).select(F.col("id").cast("string").alias("url"))
        with pytest.raises(ValueError):
            write_bucketed_table(df, "t_bad", str(tmp_path / "x"), "url", 0)
