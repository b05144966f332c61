"""Z-order (Morton-curve) clustering for multi-dimension data skipping.

A 100 TB corpus is read through predicates on MORE than one column —
``host = X`` for recrawl audits, ``fetch window`` for incremental
consumers, ``quality band`` for training export. A single sort key
skips beautifully on its leading column and not at all on the others;
Hive partitioning multiplies directories. The warehouse answer
(Delta ``OPTIMIZE ZORDER BY``, Iceberg's sort-order rewrite) is a
space-filling curve: interleave the bits of the dimension keys so
rows close in EVERY dimension land in the same files, and parquet
min/max footers prune on each dimension independently.

This module is that layout step as testable data:

- :func:`zorder_key` — the Morton interleave itself, pure integer
  bit arithmetic (native Catalyst expressions, zero shuffle), exactly
  replayable in ANSI SQL (the oracle does).
- :func:`zorder_layout` — key + file assignment by z-range
  (``repartitionByRange`` on the key = one range exchange, the same
  physical move a sorted write pays anyway).
- :func:`file_skip_stats` — the proof: per-file min/max of each
  dimension (what a parquet footer stores), and the fraction of files
  a single-dimension predicate can skip. The test pins that BOTH
  dimensions skip under z-order while a single-column sort skips only
  its leading one.

Determinism contract: dimension values must already be non-negative
integers below ``2**bits`` (callers bucket/scale first — rank, hash,
or unit scaling; :func:`dim_bucket` gives the md5-derived variant).
The interleave is then a pure function of the inputs.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["dim_bucket", "zorder_key", "zorder_layout", "file_skip_stats"]


def dim_bucket(col: Column, bits: int, seed: str = "z") -> Column:
    """Map an arbitrary column to a ``bits``-wide NON-order-preserving
    integer dimension via the repo's md5/60-bit hash (use for categorical
    dimensions — host, source, lang — where only equality predicates
    skip; scale numeric range dimensions yourself to keep order)."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(seed), F.lit(":"), col.cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    return F.pmod(h, F.lit(1 << bits)).cast("long")


def zorder_key(dims: Sequence[Column], bits: int = 16) -> Column:
    """Morton interleave of ``len(dims)`` integer columns, ``bits``
    bits each: output bit ``i*len(dims)+d`` is bit ``i`` of dim ``d``.

    ``len(dims) * bits`` must fit a signed long (≤ 62). Inputs outside
    ``[0, 2**bits)`` are masked to their low ``bits`` bits — garbage in,
    bounded garbage out, never an overflow.

    Scale shape: a per-row expression tree of shifts/ANDs/ORs — no
    shuffle, no UDF, whole-stage codegen; the cost is paid exactly once
    at layout time.
    """
    n = len(dims)
    if n < 2:
        raise ValueError("zorder needs at least 2 dimensions")
    if n * bits > 62:
        raise ValueError("n_dims * bits must be <= 62")
    key = F.lit(0).cast("long")
    for d, col in enumerate(dims):
        masked = col.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
        for i in range(bits):
            bit = F.shiftright(masked, i).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, i * n + d))
    return key


def zorder_layout(
    df: DataFrame,
    dims: Sequence[Column],
    *,
    n_files: int = 16,
    bits: int = 16,
    tiebreak: Sequence[str] | None = None,
) -> DataFrame:
    """``df`` plus ``(zkey, zfile)``: the Morton key and the file the
    row lands in when the frame is written ``repartitionByRange(n_files,
    zkey)`` (the assignment here is the deterministic rank-range twin —
    ``zfile = floor(rank_by_zkey * n_files / rows)`` — so tests and the
    oracle see the exact boundaries a range write would draw).

    Scale shape: the key is per-row arithmetic; the assignment is ONE
    range exchange + per-partition rank (the sort a clustered write
    pays anyway). Write with::

        out.repartitionByRange(n_files, "zkey", "uid") \\
           .sortWithinPartitions("zkey").write...
    """
    if n_files <= 0:
        raise ValueError("n_files must be positive")
    keyed = df.withColumn("zkey", zorder_key(dims, bits=bits))
    # deterministic global file assignment: ntile over the z-order.
    # ntile's window is unpartitioned — fine for the TEST-SIDE twin
    # (bounded fixtures); the production write path is
    # repartitionByRange, which samples boundaries instead of ranking.
    # Ties on zkey MUST have a total order or the split of a tie group
    # across file boundaries is partition-order-dependent: callers pass
    # ``tiebreak``; otherwise the known id columns are used, falling
    # back to every map-free column (maps are unorderable).
    from pyspark.sql import Window
    from pyspark.sql.types import MapType

    if tiebreak is None:
        tiebreak = [c for c in ("doc_id", "uid", "url") if c in df.columns]
        if not tiebreak:
            tiebreak = [
                f.name
                for f in df.schema.fields
                if not isinstance(f.dataType, MapType)
            ]
    win = Window.orderBy("zkey", *tiebreak)
    return keyed.withColumn(
        "zfile", (F.ntile(n_files).over(win) - 1).cast("long")
    )


def file_skip_stats(laid_out: DataFrame, dim_cols: Sequence[str]) -> DataFrame:
    """Per-file min/max of each dimension — the parquet footer stats a
    reader prunes with. One file-grain aggregate; output is file-count
    sized. A predicate ``dim = v`` must scan only files with
    ``min <= v <= max``; the z-order test asserts that fraction is
    bounded for EVERY dimension simultaneously."""
    aggs = []
    for c in dim_cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    return laid_out.groupBy("zfile").agg(
        F.count(F.lit(1)).alias("n_rows"), *aggs
    )
