"""Distributed as-of join — the temporal lookup Spark has no native
operator for.

The crawl-native question: "which capture of this URL was current at
time T?" — CDX time travel, freshness accounting against a snapshot
date, joining fetch observations to the robots rules in force at the
time. Generally: for each left row, the single right row with the
largest ``right_ts <= left_ts`` per key (the "backward" as-of of
kdb/pandas/DuckDB).

A naive range join (``l.key = r.key AND r.ts <= l.ts`` + max) explodes
to O(|captures per key| × |queries per key|) pairs before pruning.
This implementation is the standard distributed shape instead — the
UNION-MARKER SORT: both sides interleave into one (key, ts)-ordered
stream, a running ``last(..., ignorenulls)`` carries each right row's
payload forward to the left rows that follow it, and the left rows
are then filtered back out. Cost: ONE exchange keyed on the join key
and a per-key sort — no pair blowup, no secondary aggregate.

Ties (``right_ts == left_ts``) match — the right row sorts first via
the side marker. Left rows with no earlier right row keep NULLs
(left-outer semantics). Per-key window input is that key's full
history; a pathologically hot key concentrates in one task — the
same skew caveat as any keyed window, salt upstream if a key's
history exceeds a task.
"""

from __future__ import annotations

from typing import List, Sequence, Union

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "range_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Union[str, Sequence[str]],
    *,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_prefix: str = "asof_",
) -> DataFrame:
    """Backward as-of join: every ``left`` row picks up the latest
    ``right`` row with ``right_ts <= left_ts`` for its key.

    Returns all ``left`` columns plus every non-key ``right`` column
    renamed ``{right_prefix}{name}`` (including the matched
    ``{right_prefix}{right_ts}``), NULL when no right row precedes.
    """
    from pyspark.sql.types import ArrayType, MapType, StructField, StructType

    def _has_map(dt) -> bool:  # maps are unorderable at any nesting depth
        if isinstance(dt, MapType):
            return True
        if isinstance(dt, StructType):
            return any(_has_map(f.dataType) for f in dt.fields)
        if isinstance(dt, ArrayType):
            return _has_map(dt.elementType)
        return False

    keys: List[str] = [on] if isinstance(on, str) else list(on)
    payload = [c for c in right.columns if c not in keys]
    if not payload:
        raise ValueError("right side has no payload columns")
    left_cols = [c for c in left.columns]
    for c in left_cols:
        if c.startswith(right_prefix):
            raise ValueError(f"left column {c!r} collides with right_prefix")

    # the matched right row's payload is carried as ONE struct — per-
    # column last(ignorenulls) would fill a matched row's legitimate
    # NULL field from an OLDER right row, fabricating a merged row
    # that never existed
    pay_type = StructType(
        [StructField(c, right.schema[c].dataType, True) for c in payload]
    )
    r = right.select(
        *keys,
        F.col(right_ts).alias("_ats"),
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c) for c in payload]).alias("_rpay"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}")
          for c in left_cols],
    )
    l = left.select(
        *keys,
        F.col(left_ts).alias("_ats"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(pay_type).alias("_rpay"),
        *[F.col(c).alias(f"_l_{c}") for c in left_cols],
    )
    # right rows sort before left rows at equal ts (side 0 < 1), so
    # right_ts == left_ts matches — inclusive backward as-of. Right
    # rows TIED on (key, ts) additionally order by the payload struct
    # itself (ascending ⇒ the running last() picks the max), so the
    # carried row is a pure function of the data, independent of
    # partitioning — unless the payload contains a map (unorderable),
    # in which case ties stay input-order-dependent.
    order = [F.asc("_ats"), F.asc("_side")]
    if not _has_map(pay_type):
        order.append(F.asc_nulls_first("_rpay"))
    w = Window.partitionBy(*keys).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, 0
    )
    carried = r.unionByName(l).select(
        "_side",
        *[F.col(f"_l_{c}") for c in left_cols],
        F.last("_rpay", ignorenulls=True).over(w).alias("_rpay"),
    )
    return carried.filter(F.col("_side") == 1).select(
        *[F.col(f"_l_{c}").alias(c) for c in left_cols],
        *[F.col(f"_rpay.{c}").alias(f"{right_prefix}{c}") for c in payload],
    )


def range_join(
    points: DataFrame,
    ranges: DataFrame,
    *,
    value: str = "v",
    lo: str = "lo",
    hi: str = "hi",
    bucket_span: int = 1 << 20,
    range_prefix: str = "range_",
) -> DataFrame:
    """Distributed range join: each point row picks up every range row
    with ``lo <= value <= hi`` — the interval-lookup Spark would
    otherwise plan as a BroadcastNestedLoopJoin (fine for a tiny dim
    table, quadratic death for a big one).

    EXPLODED BUCKETING: ranges replicate to every ``bucket_span``-wide
    bucket they overlap, points hash to their single bucket, and the
    join becomes plain bucket-key equality + a residual bounds filter.
    Replication factor = range width / bucket_span (+1), so pick the
    span near the typical range width: a CIDR table's /16s with a 2^16
    span replicate ~2×, and every point meets only the handful of
    ranges sharing its bucket — one equality-keyed exchange, no pair
    blowup, overlapping ranges supported (a point emits one row per
    matching range; inclusive bounds).

    Crawl-native uses: IP block → ASN/geo attribution of hosts,
    byte-offset → archive member, time-slot → maintenance window.

    Returns all point columns plus every range column prefixed
    ``range_`` (inner semantics: points matching no range are absent).
    """
    if bucket_span <= 0:
        raise ValueError("bucket_span must be positive")
    payload = [c for c in ranges.columns]
    r = ranges.select(
        F.explode(
            F.sequence(
                F.floor(F.col(lo) / bucket_span).cast("long"),
                F.floor(F.col(hi) / bucket_span).cast("long"),
            )
        ).alias("_bucket"),
        *[F.col(c).alias(f"{range_prefix}{c}") for c in payload],
    )
    p = points.withColumn(
        "_bucket", F.floor(F.col(value) / bucket_span).cast("long")
    )
    return (
        p.join(r, "_bucket")
        .filter(
            (F.col(value) >= F.col(f"{range_prefix}{lo}"))
            & (F.col(value) <= F.col(f"{range_prefix}{hi}"))
        )
        .drop("_bucket")
    )
