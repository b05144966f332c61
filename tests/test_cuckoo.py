"""Cuckoo filter (frontier/cuckoo.py): deletable URL-seen pre-filter."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from web_scrapper_spark.frontier import cuckoo as ck


def _keys(n, seed=7, lo=-(2**62), hi=2**62):
    rng = np.random.default_rng(seed)
    return np.unique(rng.integers(lo, hi, size=n, dtype=np.int64))


class TestPyCuckoo:
    def test_no_false_negatives(self):
        keys = _keys(5000)
        filt = ck.PyCuckoo.sized(len(keys))
        filt.add_many(keys)
        assert filt.might_contain_many(keys).all()

    def test_false_positive_rate_sane(self):
        keys = _keys(5000)
        filt = ck.PyCuckoo.sized(len(keys))
        filt.add_many(keys)
        probes = _keys(20000, seed=11)
        probes = np.setdiff1d(probes, keys)
        fp_rate = filt.might_contain_many(probes).mean()
        assert fp_rate < 0.05  # 16-bit fingerprints: expect ~2^-13 x load

    def test_delete_then_absent(self):
        keys = _keys(2000)
        filt = ck.PyCuckoo.sized(len(keys))
        filt.add_many(keys)
        victims = keys[::5]
        removed = filt.delete_many(victims)
        assert removed.all()
        survivors = np.setdiff1d(keys, victims)
        assert filt.might_contain_many(survivors).all()
        # victims now (almost surely) absent; allow the rare fp-collision
        assert filt.might_contain_many(victims).mean() < 0.02

    def test_stash_overflow_no_false_negatives(self):
        keys = _keys(60)
        filt = ck.PyCuckoo(2)  # 8 slots for 60 keys: must stash
        filt.add_many(keys)
        assert len(filt.stash) > 0
        assert filt.might_contain_many(keys).all()
        # delete a stashed key: removed from the stash, exactly once
        n_stash = len(filt.stash)
        stashed = np.array([sorted(filt.stash)[0]], dtype=np.int64)
        assert filt.delete_many(stashed).all()
        assert len(filt.stash) == n_stash - 1

    def test_layout_pure_function_of_key_set(self):
        keys = _keys(3000)
        a = ck.PyCuckoo.sized(len(keys))
        a.add_many(keys)
        b = ck.PyCuckoo.sized(len(keys))
        rng = np.random.default_rng(3)
        shuffled = keys.copy()
        rng.shuffle(shuffled)
        b.add_many(shuffled)
        assert a.to_bytes() == b.to_bytes()

    def test_roundtrip(self):
        keys = _keys(500)
        filt = ck.PyCuckoo(2)  # force a stash
        filt.add_many(keys)
        back = ck.PyCuckoo.from_bytes(filt.to_bytes())
        assert back.to_bytes() == filt.to_bytes()
        assert back.might_contain_many(keys).all()

    def test_pow2_validation(self):
        with pytest.raises(ValueError):
            ck.PyCuckoo(3)


class TestShardedCuckoo:
    def _df(self, spark, keys):
        return spark.createDataFrame(
            [(int(k),) for k in keys], "url_hash long"
        )

    def test_build_deterministic_across_partitionings(self, spark):
        keys = _keys(4000)
        df = self._df(spark, keys)
        a = ck.build_sharded_cuckoo(df.repartition(1), "url_hash", 8, len(keys))
        b = ck.build_sharded_cuckoo(
            df.repartition(17, "url_hash"), "url_hash", 8, len(keys)
        )
        assert a.to_bytes() == b.to_bytes()
        assert a.might_contain_many(keys).all()

    def test_prefilter_directions(self, spark):
        keys = _keys(2000)
        seen, new = keys[:1500], keys[1500:]
        filt = ck.build_sharded_cuckoo(
            self._df(spark, seen), "url_hash", 4, len(seen)
        )
        cand = self._df(spark, keys)
        kept = ck.sharded_cuckoo_prefilter(cand, "url_hash", filt)
        kept_keys = {r["url_hash"] for r in kept.collect()}
        # definitely-new direction: no seen key survives
        assert kept_keys.isdisjoint(set(seen.tolist()))
        maybe = ck.sharded_cuckoo_prefilter(
            cand, "url_hash", filt, keep_maybe_seen=True
        )
        maybe_keys = {r["url_hash"] for r in maybe.collect()}
        assert set(seen.tolist()) <= maybe_keys  # no false negatives
        assert kept_keys | maybe_keys == set(keys.tolist())

    def test_add_delta_incremental(self, spark):
        base_keys = _keys(3000)
        delta_keys = _keys(1000, seed=23)
        filt = ck.build_sharded_cuckoo(
            self._df(spark, base_keys), "url_hash", 8, 4000
        )
        untouched_before = {
            s: f.to_bytes() for s, f in filt.shards.items()
        }
        out = ck.add_delta_sharded(filt, self._df(spark, delta_keys), "url_hash")
        both = np.union1d(base_keys, delta_keys)
        assert out.might_contain_many(both).all()
        # shards with no delta keys are the same object bytes
        delta_shards = set(
            np.mod(delta_keys, filt.n_shards).tolist()
        )
        for s, raw in untouched_before.items():
            if s not in delta_shards:
                assert out.shards[s].to_bytes() == raw

    def test_delta_fp_collision_then_delete_keeps_base_key(self, spark):
        """Delta inserts must be UNCONDITIONAL: keys 13 and 39906 share
        a fingerprint and bucket pair in an 8-bucket table, so a
        might_contain pre-check would skip inserting 39906 (false
        positive from 13's copy). Deleting 39906 later — it IS in the
        seen set, satisfying the eviction contract — would then strip
        13's only fingerprint and manufacture a false negative."""
        a, b = 13, 39906
        filt = ck.build_sharded_cuckoo(
            self._df(spark, np.array([a])), "url_hash", 1, 1, n_buckets=8
        )
        # sanity: the pair really collides (b probes true before insert)
        assert filt.might_contain_many(np.array([b])).all()
        filt = ck.add_delta_sharded(filt, self._df(spark, np.array([b])), "url_hash")
        filt.delete_many(np.array([b]))
        # the base key keeps its own copy — no false negative; (b may
        # still probe true through a's surviving copy: false positives
        # are allowed, false negatives never)
        assert filt.might_contain_many(np.array([a])).all()

    def test_delete_readmits_urls(self, spark):
        keys = _keys(2000)
        filt = ck.build_sharded_cuckoo(
            self._df(spark, keys), "url_hash", 4, len(keys)
        )
        due = keys[::7]
        filt.delete_many(due)
        cand = self._df(spark, due)
        readmitted = ck.sharded_cuckoo_prefilter(cand, "url_hash", filt)
        # the evicted URLs look brand-new again (rare fp collisions aside)
        assert readmitted.count() >= int(0.98 * len(due))
        survivors = np.setdiff1d(keys, due)
        assert filt.might_contain_many(survivors).all()

    def test_sharded_roundtrip(self, spark):
        keys = _keys(1000)
        filt = ck.build_sharded_cuckoo(
            self._df(spark, keys), "url_hash", 4, len(keys)
        )
        back = ck.ShardedCuckoo.from_bytes(filt.to_bytes())
        assert back.to_bytes() == filt.to_bytes()
        assert back.might_contain_many(keys).all()
