"""Partitioned cuckoo filter for the URL-seen set — the deletable
alternative the north rule names alongside bloom ("bloom/cuckoo-filter
URL-seen set").

Why a second filter when ``bloom.py`` already pre-filters the seen
anti-join: a bloom bit can never be UNSET, so once a URL is seen it is
seen forever — but a living crawl re-admits URLs (``cdx_revisits`` /
``recrawl_due`` schedule re-fetches when content goes stale). With a
bloom, every re-admitted URL costs the exact anti-join's shuffle for
the rest of the crawl's life; a cuckoo filter supports true deletion
(Fan et al., CoNEXT 2014): evict the due URLs from the filter and they
look brand-new to the cheap pre-filter again.

Same contract as the bloom: correctness NEVER depends on the filter.
No false negatives for inserted keys (the stash absorbs table
overflow), so "filter says absent" safely skips the exact anti-join;
"maybe present" still goes through it. Deleting a key that was never
inserted can manufacture a false negative for a colliding key — so
eviction is only ever driven from the seen set itself.

Determinism: each shard inserts its keys in SORTED order, so the table
layout — and therefore every probe answer, including false positives —
is a pure function of the key SET, independent of partitioning and
insert scheduling. That is what lets the driver's oracle gate
hash-match filter output across engines and runs.

Scale shape mirrors ``ShardedBloom``: keys split by ``pmod(key, S)``;
each shard's table is built executor-side in ONE place (groupBy shard →
``applyInPandas``), the driver collects S blobs (a 16-bit-fp shard at
95% load is ~2.1 bytes/key — 10^7 keys ≈ 21 MB total, broadcastable;
at 10^10 keys shards live as files on shared storage exactly like
``ShardedBloom.save_dir``). Incremental per-epoch maintenance is
``add_delta_sharded``: the epoch's seen DELTA cogroups with the
existing shard blobs, so only touched shards rewrite — O(delta +
touched shard bytes), the same fix-class as the incremental bloom.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame

#: executor-side cache for the membership probe: broadcast id → filter
#: (one entry — a new epoch's broadcast evicts the previous filter).
_CUCKOO_PROBE_CACHE: dict = {}

#: slots per bucket (standard (2,4)-cuckoo: two buckets, four slots).
SLOTS = 4
#: fingerprints are uint16 with 0 reserved as the empty sentinel.
FP_MASK = 0xFFFF
#: bounded eviction walk before a key overflows to the stash.
MAX_KICKS = 500

_C1 = 0x9E3779B97F4A7C15
_C2 = 0xC2B2AE3D27D4EB4F
_FP_MIX = 0x5BD1E995


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p <<= 1
    return p


class PyCuckoo:
    """One cuckoo-filter table: ``n_buckets`` (power of two) x SLOTS
    uint16 fingerprints + an overflow stash (key-exact, tiny)."""

    def __init__(self, n_buckets: int, table: np.ndarray | None = None,
                 stash: set[int] | None = None):
        if n_buckets & (n_buckets - 1):
            raise ValueError("n_buckets must be a power of two")
        self.n_buckets = n_buckets
        self.table = (
            table
            if table is not None
            else np.zeros((n_buckets, SLOTS), dtype=np.uint16)
        )
        self.stash: set[int] = stash if stash is not None else set()

    @classmethod
    def sized(cls, expected: int, load: float = 0.95) -> "PyCuckoo":
        expected = max(expected, 1)
        return cls(_next_pow2(max(1, int(expected / (SLOTS * load)))))

    # -- hashing ---------------------------------------------------------
    def _fp(self, keys: np.ndarray) -> np.ndarray:
        k64 = keys.astype(np.uint64)
        fp = ((k64 * np.uint64(_C2)) >> np.uint64(29)) & np.uint64(FP_MASK)
        return (fp % np.uint64(FP_MASK) + np.uint64(1)).astype(np.uint16)

    def _b1(self, keys: np.ndarray) -> np.ndarray:
        k64 = keys.astype(np.uint64)
        return (
            ((k64 * np.uint64(_C1)) >> np.uint64(17))
            % np.uint64(self.n_buckets)
        ).astype(np.int64)

    def _alt(self, bucket: np.ndarray, fp: np.ndarray) -> np.ndarray:
        """Partial-key alt bucket: b XOR h(fp) — involutive, so either
        bucket recovers the other without the key."""
        mix = (fp.astype(np.uint64) * np.uint64(_FP_MIX)) & np.uint64(
            self.n_buckets - 1
        )
        return (bucket.astype(np.uint64) ^ mix).astype(np.int64)

    # -- inserts (sequential: eviction chains; keys sorted by caller) ----
    def _insert_one(self, b1: int, fp: int, key: int) -> None:
        for b in (b1, int(self._alt(np.array([b1]), np.array([fp], dtype=np.uint16))[0])):
            row = self.table[b]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = fp
                return
        # evict: deterministic victim slot derived from the fingerprint
        b, cur = b1, fp
        trail: list[tuple[int, int]] = []
        for _ in range(MAX_KICKS):
            slot = cur % SLOTS
            trail.append((b, slot))
            cur, self.table[b, slot] = int(self.table[b, slot]), cur
            b = int(self._alt(np.array([b]), np.array([cur], dtype=np.uint16))[0])
            row = self.table[b]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = cur
                return
        # Saturated: the homeless fingerprint `cur` belongs to some
        # OTHER key we cannot stash by key. Unwind the whole eviction
        # chain (restores the table exactly) and stash the incoming
        # key instead — no fingerprint is ever dropped, so false
        # negatives stay impossible.
        carry = cur
        for tb, tslot in reversed(trail):
            carry, self.table[tb, tslot] = int(self.table[tb, tslot]), carry
        assert carry == fp  # the original came back out
        self.stash.add(int(key))

    def add_many(self, keys: np.ndarray) -> None:
        """Insert keys in SORTED order (layout determinism — see module
        docstring). Duplicates within/across calls insert multiple
        copies, matching delete-one semantics; callers dedupe."""
        keys = np.sort(keys.astype(np.int64))
        fps = self._fp(keys)
        b1s = self._b1(keys)
        for key, b1, fp in zip(keys.tolist(), b1s.tolist(), fps.tolist()):
            self._insert_one(int(b1), int(fp), int(key))

    # -- probes (vectorized) ---------------------------------------------
    def might_contain_many(self, keys: np.ndarray) -> np.ndarray:
        keys = keys.astype(np.int64)
        fps = self._fp(keys)
        b1 = self._b1(keys)
        b2 = self._alt(b1, fps)
        hit1 = (self.table[b1] == fps[:, None]).any(axis=1)
        hit2 = (self.table[b2] == fps[:, None]).any(axis=1)
        out = hit1 | hit2
        if self.stash:
            out |= np.isin(keys, np.fromiter(self.stash, dtype=np.int64))
        return out

    # -- deletion (the whole point) ---------------------------------------
    def delete_many(self, keys: np.ndarray) -> np.ndarray:
        """Remove one fingerprint copy per key (sorted for determinism).
        Returns a bool array: True where something was removed. Only
        delete keys known to have been inserted — deleting a stranger
        can strip a colliding key's fingerprint (standard cuckoo-filter
        contract)."""
        order = np.argsort(keys.astype(np.int64), kind="stable")
        keys_sorted = keys.astype(np.int64)[order]
        removed_sorted = np.zeros(len(keys_sorted), dtype=bool)
        fps = self._fp(keys_sorted)
        b1s = self._b1(keys_sorted)
        b2s = self._alt(b1s, fps)
        for i, (key, fp, b1, b2) in enumerate(
            zip(keys_sorted.tolist(), fps.tolist(), b1s.tolist(), b2s.tolist())
        ):
            if key in self.stash:
                self.stash.discard(key)
                removed_sorted[i] = True
                continue
            done = False
            for b in (b1, b2):
                row = self.table[b]
                hits = np.nonzero(row == fp)[0]
                if len(hits):
                    row[hits[0]] = 0
                    done = True
                    break
            removed_sorted[i] = done
        removed = np.zeros(len(keys_sorted), dtype=bool)
        removed[order] = removed_sorted
        return removed

    # -- serialization -----------------------------------------------------
    def to_bytes(self) -> bytes:
        import struct

        stash = np.fromiter(sorted(self.stash), dtype=np.int64)
        return (
            struct.pack("<QQ", self.n_buckets, len(stash))
            + self.table.tobytes()
            + stash.tobytes()
        )

    @classmethod
    def from_bytes(cls, raw: bytes) -> "PyCuckoo":
        import struct

        n_buckets, n_stash = struct.unpack("<QQ", raw[:16])
        span = n_buckets * SLOTS * 2
        table = (
            np.frombuffer(raw[16 : 16 + span], dtype=np.uint16)
            .reshape(int(n_buckets), SLOTS)
            .copy()
        )
        stash = set(
            np.frombuffer(raw[16 + span : 16 + span + int(n_stash) * 8],
                          dtype=np.int64).tolist()
        )
        return cls(int(n_buckets), table, stash)


class ShardedCuckoo:
    """S independent cuckoo shards keyed by ``pmod(key, S)`` — the same
    routing modulus as ``ShardedBloom`` so both filters are drop-in for
    the epoch's pre-filter seam."""

    def __init__(self, n_shards: int, n_buckets: int, shards=None):
        self.n_shards = n_shards
        self.n_buckets = n_buckets
        self.shards: dict[int, PyCuckoo] = shards or {}

    def shard_of(self, keys: np.ndarray) -> np.ndarray:
        return np.mod(keys.astype(np.int64), self.n_shards)

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

    def delete_many(self, keys: np.ndarray) -> np.ndarray:
        """Driver-side eviction (the due set is politeness-budget-sized
        per epoch, never corpus-sized)."""
        keys = keys.astype(np.int64)
        out = np.zeros(len(keys), dtype=bool)
        sh = self.shard_of(keys)
        for s in np.unique(sh):
            filt = self.shards.get(int(s))
            if filt is not None:
                mask = sh == s
                out[mask] = filt.delete_many(keys[mask])
        return out

    def to_bytes(self) -> bytes:
        import json
        import struct

        blobs = {s: f.to_bytes() for s, f in sorted(self.shards.items())}
        header = json.dumps(
            {
                "n_shards": self.n_shards,
                "n_buckets": self.n_buckets,
                "sizes": [[s, len(b)] for s, b in blobs.items()],
            }
        ).encode()
        return b"".join(
            [struct.pack("<I", len(header)), header, *blobs.values()]
        )

    @classmethod
    def from_bytes(cls, raw: bytes) -> "ShardedCuckoo":
        import json
        import struct

        (hlen,) = struct.unpack("<I", raw[:4])
        meta = json.loads(raw[4 : 4 + hlen].decode())
        out = cls(meta["n_shards"], meta["n_buckets"])
        off = 4 + hlen
        for s, size in meta["sizes"]:
            out.shards[s] = PyCuckoo.from_bytes(raw[off : off + size])
            off += size
        return out


def build_sharded_cuckoo(
    df: DataFrame,
    col: str,
    n_shards: int,
    expected: int,
    n_buckets: int | None = None,
) -> ShardedCuckoo:
    """One distributed pass: keys group by ``pmod(key, S)``, each shard
    dedupes + sorts + inserts its keys executor-side and ships one blob
    back. Layout (and so every probe answer) is a pure function of the
    key set."""
    from pyspark.sql import functions as F

    if n_buckets is None:
        n_buckets = PyCuckoo.sized(max(1, expected // n_shards)).n_buckets

    def build_group(pdf):
        import pandas as pd

        filt = PyCuckoo(n_buckets)
        keys = np.unique(pdf[col].to_numpy(dtype=np.int64))
        filt.add_many(keys)
        return pd.DataFrame(
            {"shard": [int(pdf["_shard"].iloc[0])], "bits": [filt.to_bytes()]}
        )

    rows = (
        df.select(F.col(col), F.pmod(F.col(col), F.lit(n_shards)).alias("_shard"))
        .groupBy("_shard")
        .applyInPandas(build_group, schema="shard int, bits binary")
        .collect()
    )
    shards = {r["shard"]: PyCuckoo.from_bytes(r["bits"]) for r in rows}
    return ShardedCuckoo(n_shards, n_buckets, shards)


def add_delta_sharded(
    sharded: ShardedCuckoo, delta: DataFrame, col: str
) -> ShardedCuckoo:
    """Per-epoch incremental maintenance: cogroup the seen DELTA with
    the existing shard blobs so only TOUCHED shards deserialize, insert
    (sorted), and rewrite — O(delta + touched shard bytes) per epoch,
    never a corpus-wide rebuild. Untouched shards pass through by
    reference."""
    from pyspark.sql import functions as F

    spark = delta.sparkSession
    blob_rows = [
        (s, f.to_bytes()) for s, f in sorted(sharded.shards.items())
    ]
    keyed = delta.select(
        F.col(col), F.pmod(F.col(col), F.lit(sharded.n_shards)).alias("_shard")
    )
    blobs = (
        spark.createDataFrame(
            blob_rows or [(None, None)], "shard int, bits binary"
        )
        .filter(F.col("shard").isNotNull())
        # only TOUCHED shards enter the cogroup; the rest pass through
        # by reference in the returned object
        .join(
            keyed.select(F.col("_shard").alias("shard")).distinct(),
            "shard",
            "left_semi",
        )
    )
    n_buckets = sharded.n_buckets

    def merge_group(kdf, bdf):
        import pandas as pd

        if len(bdf) and bdf["bits"].iloc[0] is not None:
            filt = PyCuckoo.from_bytes(bytes(bdf["bits"].iloc[0]))
            shard = int(bdf["shard"].iloc[0])
        else:
            filt = PyCuckoo(n_buckets)
            shard = int(kdf["_shard"].iloc[0])
        if len(kdf):
            # ALWAYS insert — never skip keys might_contain already
            # reports. Skipping on a fingerprint false positive would
            # leave a genuinely-seen key with no stored copy of its
            # own, so a later delete of that key (recrawl eviction)
            # would strip the COLLIDING key's only fingerprint and
            # manufacture a false negative. The epoch's append-only
            # seen contract keeps deltas disjoint from prior inserts,
            # so unconditional insert adds no duplicate copies.
            filt.add_many(np.unique(kdf[col].to_numpy(dtype=np.int64)))
        return pd.DataFrame({"shard": [shard], "bits": [filt.to_bytes()]})

    merged_rows = (
        keyed.groupBy("_shard")
        .cogroup(blobs.groupBy("shard"))
        .applyInPandas(merge_group, schema="shard int, bits binary")
        .collect()
    )
    out = ShardedCuckoo(sharded.n_shards, n_buckets, dict(sharded.shards))
    for r in merged_rows:
        out.shards[r["shard"]] = PyCuckoo.from_bytes(r["bits"])
    return out


def cuckoo_membership(
    candidates: DataFrame,
    col: str,
    sharded: ShardedCuckoo,
    out_col: str = "maybe_seen",
) -> DataFrame:
    """Attach the filter's verdict as a boolean column (vectorized
    pandas UDF over the broadcast blob). The audit/query surface; the
    epoch seam is :func:`sharded_cuckoo_prefilter`."""
    spark = candidates.sparkSession
    bc = spark.sparkContext.broadcast(sharded.to_bytes())
    # worker-side Broadcast objects carry no id — capture the JVM
    # broadcast id on the driver as a plain int for the cache key
    bc_token = bc._jbroadcast.id()

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("boolean")
    def maybe_seen(keys):
        import pandas as pd

        # deserialize once per worker, not per Arrow batch (same
        # executor-side cache discipline as the bloom probe)
        filt = _CUCKOO_PROBE_CACHE.get(bc_token)
        if filt is None:
            filt = ShardedCuckoo.from_bytes(bc.value)
            _CUCKOO_PROBE_CACHE.clear()
            _CUCKOO_PROBE_CACHE[bc_token] = filt
        return pd.Series(
            filt.might_contain_many(keys.to_numpy(dtype=np.int64))
        )

    return candidates.withColumn(out_col, maybe_seen(candidates[col]))


def sharded_cuckoo_prefilter(
    candidates: DataFrame,
    col: str,
    sharded: ShardedCuckoo,
    keep_maybe_seen: bool = False,
) -> DataFrame:
    """Membership pre-filter, bloom-compatible semantics: default keeps
    DEFINITELY-NEW rows; ``keep_maybe_seen=True`` keeps the rows that
    still need the exact anti-join."""
    flagged = cuckoo_membership(candidates, col, sharded, "_maybe_seen")
    flag = flagged["_maybe_seen"]
    return flagged.filter(flag if keep_maybe_seen else ~flag).drop(
        "_maybe_seen"
    )
