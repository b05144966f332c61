"""Mergeable sketches (operators/sketch.py): HLL registers, count-min."""

import hashlib

import pytest
from pyspark.sql import functions as F

from web_scrapper_spark.operators import sketch as sk


def _h40(s: str) -> int:
    return int(hashlib.md5(str(s).encode()).hexdigest()[:10], 16)


def _py_registers(values, p):
    """Pure-python HLL register replay."""
    suffix_bits = sk.SKETCH_HASH_BITS - p
    regs = {}
    for v in values:
        h = _h40(v)
        bucket, suffix = h >> suffix_bits, h % (1 << suffix_bits)
        rho = suffix_bits + 1 if suffix == 0 else suffix_bits - suffix.bit_length() + 1
        regs[bucket] = max(regs.get(bucket, 0), rho)
    return regs


def _py_estimate(regs, p):
    m = 1 << p
    k = sk.SKETCH_HASH_BITS - p + 1
    s = (m - len(regs)) * (1 << k) + sum(1 << (k - r) for r in regs.values())
    return sk.hll_alpha_ppm(p) * m * m * (1 << k) // (1_000_000 * s)


class TestHll:
    P = 9

    def _df(self, spark, n=4000, dups=4):
        # n rows over n//dups distinct values, two host keys
        return spark.createDataFrame(
            [(f"h{i % 2}", f"url-{(i // dups) * 2 + (i % 2)}") for i in range(n)],
            ["host", "url"],
        )

    def test_registers_match_python(self, spark):
        df = self._df(spark, 800)
        regs = sk.hll_registers(df, ["host"], "url", self.P).collect()
        for host in ("h0", "h1"):
            vals = {r["url"] for r in df.filter(F.col("host") == host).collect()}
            expected = _py_registers(vals, self.P)
            got = {r["bucket"]: r["r"] for r in regs if r["host"] == host}
            assert got == expected

    def test_null_values_carry_no_information(self, spark):
        """NULL values must not create a phantom (bucket=NULL, r=NULL)
        register row — it would count in `present` while adding nothing
        to the harmonic sum, biasing the estimate high (and nulling the
        estimate for all-NULL keys)."""
        base = self._df(spark, 400)
        with_nulls = base.unionByName(
            spark.createDataFrame(
                [("h0", None), ("h2", None)], "host string, url string"
            )
        )
        regs_base = sk.hll_registers(base, ["host"], "url", self.P)
        regs_nulls = sk.hll_registers(with_nulls, ["host"], "url", self.P)
        a = {(r["host"], r["bucket"]): r["r"] for r in regs_base.collect()}
        b = {(r["host"], r["bucket"]): r["r"] for r in regs_nulls.collect()}
        assert a == b  # NULLs changed nothing; all-NULL h2 absent

    def test_estimate_accuracy(self, spark):
        df = self._df(spark, 8000, dups=4)
        est = sk.hll_estimate(
            sk.hll_registers(df, ["host"], "url", self.P), ["host"], self.P
        ).collect()
        for r in est:
            true = (
                df.filter(F.col("host") == r["host"])
                .select("url")
                .distinct()
                .count()
            )
            # sigma ~ 1.04/sqrt(512) ~ 4.6%; allow 3 sigma
            assert abs(r["est"] - true) / true < 0.15

    def test_merge_equals_whole(self, spark):
        df = self._df(spark, 2000)
        a = df.filter(F.col("url").substr(-1, 1).isin("0", "2", "4"))
        b = df.subtract(a)
        merged = sk.hll_merge(
            sk.hll_registers(a, ["host"], "url", self.P),
            sk.hll_registers(b, ["host"], "url", self.P),
            ["host"],
        )
        whole = sk.hll_registers(df, ["host"], "url", self.P)
        key = lambda r: (r["host"], r["bucket"], r["r"])
        assert sorted(map(key, merged.collect())) == sorted(
            map(key, whole.collect())
        )

    def test_partitioning_independence(self, spark):
        df = self._df(spark, 1000)
        a = sk.hll_registers(df.repartition(1), ["host"], "url", self.P)
        b = sk.hll_registers(df.repartition(7, "url"), ["host"], "url", self.P)
        key = lambda r: (r["host"], r["bucket"], r["r"])
        assert sorted(map(key, a.collect())) == sorted(map(key, b.collect()))

    def test_corrected_small_range(self, spark):
        df = spark.createDataFrame(
            [("h", f"u{i}") for i in range(10)], ["host", "url"]
        )
        out = sk.hll_corrected(
            sk.hll_estimate(
                sk.hll_registers(df, ["host"], "url", self.P), ["host"], self.P
            ),
            self.P,
        ).collect()[0]
        # linear counting at tiny cardinality: within 20% of truth
        assert abs(out["est_corrected"] - 10) <= 2

    def test_p_validation(self, spark):
        df = spark.createDataFrame([("h", "u")], ["host", "url"])
        with pytest.raises(ValueError):
            sk.hll_registers(df, ["host"], "url", 2)


class TestCms:
    W, D = 64, 4

    def _py_cell(self, d, key):
        return _h40(f"{d}:{key}") % self.W

    def _stream(self, spark, n=3000):
        # zipf-ish: host j appears ~ n/(j+1) times
        rows = []
        for i in range(n):
            j = 0
            k = i
            while k % 2 == 1 and j < 9:
                j, k = j + 1, k // 2
            rows.append((f"host-{j}",))
        return spark.createDataFrame(rows, ["host"]), rows

    def test_sketch_matches_python(self, spark):
        df, rows = self._stream(spark, 500)
        got = {
            (r["d"], r["cell"]): r["cnt"]
            for r in sk.cms_build(df, "host", self.W, self.D).collect()
        }
        expected = {}
        for (h,) in rows:
            for d in range(self.D):
                c = (d, self._py_cell(d, h))
                expected[c] = expected.get(c, 0) + 1
        assert got == expected

    def test_estimate_overestimates_never_under(self, spark):
        df, rows = self._stream(spark)
        sketch = sk.cms_build(df, "host", self.W, self.D)
        keys = df.select("host").distinct()
        est = {
            r["host"]: r["est"]
            for r in sk.cms_estimate(sketch, keys, "host", self.W, self.D).collect()
        }
        true = {}
        for (h,) in rows:
            true[h] = true.get(h, 0) + 1
        for h, t in true.items():
            assert est[h] >= t
            assert est[h] <= t + len(rows) // 8  # loose e/W bound

    def test_merge_equals_whole(self, spark):
        df, _ = self._stream(spark, 1000)
        # split each row to exactly one side; merged sketch must equal whole
        df_i = df.withColumn("_i", F.monotonically_increasing_id())
        a = df_i.filter(F.col("_i") % 2 == 0).select("host")
        b = df_i.filter(F.col("_i") % 2 == 1).select("host")
        merged = sk.cms_merge(
            sk.cms_build(a, "host", self.W, self.D),
            sk.cms_build(b, "host", self.W, self.D),
        )
        whole = sk.cms_build(df, "host", self.W, self.D)
        key = lambda r: (r["d"], r["cell"], r["cnt"])
        assert sorted(map(key, merged.collect())) == sorted(
            map(key, whole.collect())
        )

    def test_weighted_counts(self, spark):
        df = spark.createDataFrame(
            [("a", 10), ("a", 5), ("b", 1)], ["host", "bytes"]
        )
        sketch = sk.cms_build(df, "host", self.W, self.D, weight_col="bytes")
        est = {
            r["host"]: r["est"]
            for r in sk.cms_estimate(
                sketch, df.select("host").distinct(), "host", self.W, self.D
            ).collect()
        }
        assert est["a"] >= 15 and est["b"] >= 1

    def test_validation(self, spark):
        df = spark.createDataFrame([("a",)], ["host"])
        with pytest.raises(ValueError):
            sk.cms_build(df, "host", 0)


class TestHeavyHitters:
    """Exact sketch-then-verify heavy hitters (sketch.heavy_hitters)."""

    def _stream(self, spark, counts):
        rows = [(k,) for k, n in counts.items() for _ in range(n)]
        return spark.createDataFrame(rows, "host string")

    def test_exact_counts_and_threshold(self, spark):
        from web_scrapper_spark.operators.sketch import heavy_hitters

        counts = {"a": 50, "b": 30, "c": 15, "d": 4, "e": 1}
        df = self._stream(spark, counts)  # N = 100
        out = {
            r["host"]: r
            for r in heavy_hitters(df, "host", 150_000, width=128).collect()
        }
        # threshold = 15: a, b, c survive with exact counts
        assert set(out) == {"a", "b", "c"}
        for k in out:
            assert out[k]["n"] == counts[k]
            assert out[k]["est"] >= out[k]["n"]
            assert out[k]["threshold"] == 15
            assert out[k]["share_ppm"] == counts[k] * 10_000

    def test_complete_under_tiny_width(self, spark):
        """Collision-heavy sketch (width=2): over-counts admit extra
        candidates, the exact pass discards them — output unchanged."""
        from web_scrapper_spark.operators.sketch import heavy_hitters

        counts = {f"k{i}": 3 + (7 if i < 2 else 0) for i in range(12)}
        df = self._stream(spark, counts)
        wide = {
            (r["host"], r["n"])
            for r in heavy_hitters(df, "host", 120_000, width=4096).collect()
        }
        narrow = {
            (r["host"], r["n"])
            for r in heavy_hitters(df, "host", 120_000, width=2).collect()
        }
        assert narrow == wide == {("k0", 10), ("k1", 10)}

    def test_phi_bounds(self, spark):
        import pytest as _pytest

        from web_scrapper_spark.operators.sketch import heavy_hitters

        df = self._stream(spark, {"a": 1})
        with _pytest.raises(ValueError):
            heavy_hitters(df, "host", 0, width=8)
        with _pytest.raises(ValueError):
            heavy_hitters(df, "host", 1_000_001, width=8)

    def test_empty_stream(self, spark):
        from web_scrapper_spark.operators.sketch import heavy_hitters

        df = spark.createDataFrame([], "host string")
        assert heavy_hitters(df, "host", 10_000, width=8).count() == 0
