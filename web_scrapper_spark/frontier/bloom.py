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
a 10^7-key filter at 1% fpp is ~12 MB — well under broadcast limits;
at 10^10 keys one would shard the filter by host bucket (the same
salted-host partitioning the frontier uses) and broadcast per-bucket.
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
from pyspark.sql import DataFrame


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
