"""Partitioned bloom filter for the URL-seen set (north rule; SURVEY.md
§4.2-3).

The reference keeps an in-memory Python set (base.py:68-69). At
10^10-URL scale the exact seen-set lives in the snapshot table and
membership is decided by an anti-join; this bloom filter is the cheap
broadcast PRE-filter that keeps already-seen URLs (the overwhelming
majority of discovered links in a mature crawl) out of that shuffle.

Correctness never depends on it: candidates that pass the bloom still
go through the exact ``left_anti`` join (false positives are dropped
there; false negatives are impossible for keys that were added).

Implementation: a numpy bitmap + k-fold double hashing over the 64-bit
split of the murmur3 url_hash. Built distributedly — each partition
produces a partial bitmap via ``mapInPandas`` (vectorized numpy, no
per-row Python), partials are OR-reduced, and the result is broadcast.
Bitmap partials are capped by sizing n_bits from the expected count, so
a 10^7-key filter at 1% fpp is ~12 MB — well under broadcast limits.

At 10^10 keys a single bitmap (~12 GB at 1% fpp) cannot be broadcast
or held in one numpy array safely — that is what ``ShardedBloom`` is
for: the key space splits into S shards by ``pmod(url_hash, S)``, each
shard is an independently-sized bitmap built in ONE distributed pass
(groupBy shard → one bitmap per shard), and membership probes route by
the same pmod. Two probe modes:

- in-memory (sandbox / ≤10^8 keys): the shard dict broadcasts like the
  flat filter;
- disk-backed (the 10^10 path): shards persist as one file each on
  shared storage, candidates are repartitioned by shard, and each task
  lazily loads ONLY the shard files its partition touches — no
  broadcast of the full filter anywhere.
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
from pyspark.sql import DataFrame

#: executor-side cache for the in-memory probe: broadcast id → filter
#: (one entry — a new epoch's broadcast evicts the previous filter).
_BLOOM_PROBE_CACHE: dict = {}


class PyBloom:
    def __init__(self, n_bits: int, k: int, bits: np.ndarray | None = None):
        self.n_bits = n_bits
        self.k = k
        self.words = (n_bits + 63) // 64
        self.bits = bits if bits is not None else np.zeros(self.words, dtype=np.uint64)

    @classmethod
    def sized(cls, expected: int, fpp: float = 0.01) -> "PyBloom":
        expected = max(expected, 1)
        n_bits = max(64, int(-expected * math.log(fpp) / (math.log(2) ** 2)))
        k = max(1, int(round(n_bits / expected * math.log(2))))
        return cls(n_bits, min(k, 8))

    # -- vectorized hashing: double hashing h1 + i*h2 over int64 keys ----
    def _positions(self, keys: np.ndarray, i: int) -> np.ndarray:
        k64 = keys.astype(np.uint64)
        h1 = (k64 * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(17)
        h2 = (k64 * np.uint64(0xC2B2AE3D27D4EB4F)) >> np.uint64(13) | np.uint64(1)
        return ((h1 + np.uint64(i) * h2) % np.uint64(self.n_bits)).astype(np.uint64)

    def add_many(self, keys: np.ndarray) -> None:
        for i in range(self.k):
            pos = self._positions(keys, i)
            np.bitwise_or.at(
                self.bits, (pos >> np.uint64(6)).astype(np.int64),
                np.uint64(1) << (pos & np.uint64(63)),
            )

    def might_contain_many(self, keys: np.ndarray) -> np.ndarray:
        out = np.ones(len(keys), dtype=bool)
        for i in range(self.k):
            pos = self._positions(keys, i)
            word = self.bits[(pos >> np.uint64(6)).astype(np.int64)]
            out &= (word >> (pos & np.uint64(63))) & np.uint64(1) != 0
        return out

    def union(self, other: "PyBloom") -> "PyBloom":
        assert self.n_bits == other.n_bits and self.k == other.k
        return PyBloom(self.n_bits, self.k, self.bits | other.bits)

    def to_bytes(self) -> bytes:
        return self.bits.tobytes()

    @classmethod
    def from_bytes(cls, n_bits: int, k: int, raw: bytes) -> "PyBloom":
        return cls(n_bits, k, np.frombuffer(raw, dtype=np.uint64).copy())


def build_bloom(
    df: DataFrame,
    col: str,
    expected: int,
    fpp: float = 0.01,
    n_bits: int | None = None,
    k: int | None = None,
) -> PyBloom:
    """Distributed build: per-partition partial bitmaps OR-reduced.

    One binary row per input partition flows back (bitmap-sized, not
    data-sized); the OR-reduce is associative so at cluster scale this
    is a treeAggregate-shaped combine.

    Pass ``n_bits``/``k`` to build with a FIXED geometry — required when
    the result will be unioned into an existing filter (incremental
    delta maintenance): union is only defined for identical geometry.
    """
    if n_bits is None or k is None:
        proto = PyBloom.sized(expected, fpp)
        n_bits, k = proto.n_bits, proto.k

    def partial(batches: Iterator) -> Iterator:
        import pandas as pd

        bloom = PyBloom(n_bits, k)
        saw = False
        for pdf in batches:
            if len(pdf):
                saw = True
                bloom.add_many(pdf[col].to_numpy(dtype=np.int64))
        if saw:
            yield pd.DataFrame({"bits": [bloom.to_bytes()]})
        else:
            yield pd.DataFrame({"bits": pd.Series([], dtype=object)})

    partials_df = df.select(col).mapInPandas(partial, schema="bits binary")

    if n_bits // 8 >= 4 * 1024 * 1024:
        # big bitmap: one partial per input partition would ship
        # partitions × bitmap bytes to the driver. Insert a tree level
        # that OR-combines partials executor-side down to ≤8 rows first
        # (treeAggregate shape).
        def combine(batches: Iterator) -> Iterator:
            import pandas as pd

            acc = PyBloom(n_bits, k)
            saw = False
            for pdf in batches:
                for raw in pdf["bits"]:
                    if raw is not None:
                        saw = True
                        acc.bits |= np.frombuffer(raw, dtype=np.uint64)
            if saw:
                yield pd.DataFrame({"bits": [acc.to_bytes()]})
            else:
                yield pd.DataFrame({"bits": pd.Series([], dtype=object)})

        partials_df = partials_df.repartition(8).mapInPandas(
            combine, schema="bits binary"
        )

    partials = partials_df.collect()
    bloom = PyBloom(n_bits, k)
    for row in partials:
        if row["bits"] is not None:
            bloom = bloom.union(PyBloom.from_bytes(n_bits, k, row["bits"]))
    return bloom


def bloom_prefilter(
    candidates: DataFrame, bloom: PyBloom, col: str, keep_maybe_seen: bool = False
) -> DataFrame:
    """Filter candidates by bloom membership (vectorized pandas UDF over
    the broadcast bitmap). ``keep_maybe_seen=False`` keeps DEFINITELY-NEW
    rows (bloom says absent) — the safe direction for enqueue pre-dedup
    is the opposite: rows the bloom flags as maybe-seen still need the
    exact anti-join, rows it clears are provably unseen and can skip it.
    """
    spark = candidates.sparkSession
    bc = spark.sparkContext.broadcast((bloom.n_bits, bloom.k, bloom.to_bytes()))

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("boolean")
    def maybe_seen(keys):
        import pandas as pd

        n_bits, k, raw = bc.value
        filt = PyBloom.from_bytes(n_bits, k, raw)
        return pd.Series(filt.might_contain_many(keys.to_numpy(dtype=np.int64)))

    flag = maybe_seen(candidates[col])
    return candidates.filter(flag if keep_maybe_seen else ~flag)


class ShardedBloom:
    """S independent bloom shards; ``shard(key) = pmod(key, S)`` on the
    int64 murmur3 key — the same modulus is computable JVM-side
    (``F.pmod``) for repartition routing. All shards share one
    (n_bits, k) geometry so per-shard unions (incremental delta
    maintenance) stay well-defined. The dict is sparse: a shard with no
    keys has no bitmap and probes as definitely-absent."""

    def __init__(self, n_shards: int, n_bits: int, k: int, shards=None):
        self.n_shards = n_shards
        self.n_bits = n_bits
        self.k = k
        self.shards: dict[int, PyBloom] = shards or {}

    def shard_of(self, keys: np.ndarray) -> np.ndarray:
        # numpy/Python floor-mod == Spark pmod for negative ints
        return np.mod(keys.astype(np.int64), self.n_shards)

    def add_many(self, keys: np.ndarray) -> None:
        keys = keys.astype(np.int64)
        sh = self.shard_of(keys)
        for s in np.unique(sh):
            filt = self.shards.setdefault(int(s), PyBloom(self.n_bits, self.k))
            filt.add_many(keys[sh == s])

    def might_contain_many(self, keys: np.ndarray) -> np.ndarray:
        keys = keys.astype(np.int64)
        out = np.zeros(len(keys), dtype=bool)
        sh = self.shard_of(keys)
        for s in np.unique(sh):
            filt = self.shards.get(int(s))
            if filt is not None:
                mask = sh == s
                out[mask] = filt.might_contain_many(keys[mask])
        return out

    def union(self, other: "ShardedBloom") -> "ShardedBloom":
        assert (self.n_shards, self.n_bits, self.k) == (
            other.n_shards, other.n_bits, other.k,
        )
        # every shard of the result owns its OWN bitmap: shards present
        # in only one operand must be copied, not aliased — otherwise
        # add_many on the union silently mutates the operand filters
        # (epoch-isolated base filters would gain the delta's bits)
        merged = {}
        for s, filt in self.shards.items():
            merged[s] = (
                filt.union(other.shards[s])
                if s in other.shards
                else PyBloom(self.n_bits, self.k, filt.bits.copy())
            )
        for s, filt in other.shards.items():
            if s not in merged:
                merged[s] = PyBloom(self.n_bits, self.k, filt.bits.copy())
        return ShardedBloom(self.n_shards, self.n_bits, self.k, merged)

    # -- single-blob serialization (sandbox persistence path) -----------
    def to_bytes(self) -> bytes:
        import json
        import struct

        header = json.dumps(
            {
                "n_shards": self.n_shards,
                "n_bits": self.n_bits,
                "k": self.k,
                "shards": sorted(self.shards),
            }
        ).encode()
        parts = [struct.pack("<I", len(header)), header]
        for s in sorted(self.shards):
            parts.append(self.shards[s].to_bytes())
        return b"".join(parts)

    @classmethod
    def from_bytes(cls, raw: bytes) -> "ShardedBloom":
        import json
        import struct

        (hlen,) = struct.unpack("<I", raw[:4])
        meta = json.loads(raw[4 : 4 + hlen].decode())
        out = cls(meta["n_shards"], meta["n_bits"], meta["k"])
        span = ((meta["n_bits"] + 63) // 64) * 8
        off = 4 + hlen
        for s in meta["shards"]:
            out.shards[s] = PyBloom.from_bytes(
                meta["n_bits"], meta["k"], raw[off : off + span]
            )
            off += span
        return out

    # -- per-shard files (the 10^10 shared-storage path) ----------------
    def save_dir(self, dir_path: str) -> None:
        import json
        import os

        os.makedirs(dir_path, exist_ok=True)
        for s, filt in self.shards.items():
            with open(os.path.join(dir_path, f"shard-{s:05d}.bin"), "wb") as fh:
                fh.write(filt.to_bytes())
        with open(os.path.join(dir_path, "_meta.json"), "w") as fh:
            json.dump(
                {"n_shards": self.n_shards, "n_bits": self.n_bits, "k": self.k},
                fh,
            )

    @staticmethod
    def read_meta(dir_path: str) -> dict:
        import json
        import os

        with open(os.path.join(dir_path, "_meta.json")) as fh:
            return json.load(fh)


def build_sharded_bloom(
    df: DataFrame,
    col: str,
    n_shards: int,
    expected: int,
    fpp: float = 0.01,
    n_bits: int | None = None,
    k: int | None = None,
) -> ShardedBloom:
    """One distributed pass: keys group by ``pmod(key, S)`` and each
    group builds its own bitmap (``applyInPandas``), so a shard's
    bitmap is produced exactly once at its final size — no
    partials × shards blow-up — and the driver collects S bitmap rows.
    Geometry is sized for the PER-SHARD expected count (uniform by
    murmur3), so total bits match the flat filter while no single
    array exceeds a shard's slice."""
    from pyspark.sql import functions as F

    if n_bits is None or k is None:
        proto = PyBloom.sized(max(1, expected // n_shards), fpp)
        n_bits, k = proto.n_bits, proto.k

    def build_group(pdf):
        import pandas as pd

        bloom = PyBloom(n_bits, k)
        bloom.add_many(pdf[col].to_numpy(dtype=np.int64))
        return pd.DataFrame(
            {"shard": [int(pdf["_shard"].iloc[0])], "bits": [bloom.to_bytes()]}
        )

    rows = (
        df.select(F.col(col), F.pmod(F.col(col), F.lit(n_shards)).alias("_shard"))
        .groupBy("_shard")
        .applyInPandas(build_group, schema="shard int, bits binary")
        .collect()
    )
    shards = {
        r["shard"]: PyBloom.from_bytes(n_bits, k, r["bits"]) for r in rows
    }
    return ShardedBloom(n_shards, n_bits, k, shards)


def sharded_bloom_prefilter(
    candidates: DataFrame,
    col: str,
    sharded: ShardedBloom | None = None,
    dir_path: str | None = None,
    keep_maybe_seen: bool = False,
) -> DataFrame:
    """Membership pre-filter against a sharded filter.

    ``sharded``: in-memory mode — the shard dict broadcasts (fine while
    the filter fits executor memory). ``dir_path``: disk-backed mode —
    candidates repartition by ``pmod(key, S)`` so each task's partition
    touches ~1 shard, and the task lazily loads ONLY those shard files
    from (shared) storage. Nothing filter-sized is broadcast: this is
    the 10^10-key path.
    """
    from pyspark.sql import functions as F

    if (sharded is None) == (dir_path is None):
        raise ValueError("pass exactly one of sharded= or dir_path=")
    schema = candidates.schema

    if sharded is not None:
        spark = candidates.sparkSession
        bc = spark.sparkContext.broadcast(sharded.to_bytes())
        # worker-side Broadcast objects carry no id — capture the JVM
        # broadcast id on the driver as a plain int for the cache key
        bc_token = bc._jbroadcast.id()

        from pyspark.sql.functions import pandas_udf

        @pandas_udf("boolean")
        def maybe_seen(keys):
            import pandas as pd

            # deserialize ONCE per worker process, not per Arrow batch:
            # a 10^8-key sharded filter is ~100 MB of memcpy, and the
            # UDF body runs per ~2048-row batch — cache on broadcast id
            # (invalidated naturally when a new epoch broadcasts a new
            # filter under a new id)
            filt = _BLOOM_PROBE_CACHE.get(bc_token)
            if filt is None:
                filt = ShardedBloom.from_bytes(bc.value)
                _BLOOM_PROBE_CACHE.clear()
                _BLOOM_PROBE_CACHE[bc_token] = filt
            return pd.Series(
                filt.might_contain_many(keys.to_numpy(dtype=np.int64))
            )

        flag = maybe_seen(candidates[col])
        return candidates.filter(flag if keep_maybe_seen else ~flag)

    meta = ShardedBloom.read_meta(dir_path)
    n_shards, n_bits, k = meta["n_shards"], meta["n_bits"], meta["k"]

    def prefilter_part(batches: Iterator) -> Iterator:
        import os

        cache: dict[int, PyBloom | None] = {}
        for pdf in batches:
            if not len(pdf):
                continue
            keys = pdf[col].to_numpy(dtype=np.int64)
            sh = np.mod(keys, n_shards)
            flags = np.zeros(len(keys), dtype=bool)
            for s in np.unique(sh):
                s = int(s)
                if s not in cache:
                    path = os.path.join(dir_path, f"shard-{s:05d}.bin")
                    if os.path.exists(path):
                        with open(path, "rb") as fh:
                            cache[s] = PyBloom.from_bytes(n_bits, k, fh.read())
                    else:  # shard never saw a key: definitely absent
                        cache[s] = None
                filt = cache[s]
                if filt is not None:
                    mask = sh == s
                    flags[mask] = filt.might_contain_many(keys[mask])
            yield pdf[flags if keep_maybe_seen else ~flags]

    routed = candidates.repartition(
        n_shards, F.pmod(F.col(col), F.lit(n_shards))
    )
    return routed.mapInPandas(prefilter_part, schema=schema)
