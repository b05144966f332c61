"""Training-corpus export layout: partition + shard assignment.

The last step of a 100 TB training-data pipeline is not a query — it
is the LAYOUT of the output: consumers read "English, top quality
band" as a directory, not as a filter over everything, and they read
it with bounded-size files that stream into a tokenizer. That means
Hive-style partitioning by (lang, quality bucket) and deterministic,
size-aware sharding inside each partition.

``corpus_layout`` computes the assignment as data — ``(id, lang,
bucket, n_shards, shard)`` — so it is testable and SQL-replayable;
``write_corpus`` applies it with ``partitionBy``. Assignment rules:

- ``bucket`` = how many of the (integer, ppm) quality edges the doc's
  score clears: ``q0`` (worst) … ``q{len(edges)}`` (best)
- ``n_shards`` = ceil(partition rows / rows_per_shard) — shard count
  grows with the partition, file sizes stay bounded
- ``shard`` = first 60 bits of md5(id) mod n_shards — deterministic
  under any partitioning, uniform by construction (no hot shard), and
  reproducible outside Spark (the oracle replays it)

Scale shape: one (lang, bucket) count aggregate (map-side combined),
broadcast back; the corpus itself is shuffled exactly once — by the
writer's (lang, bucket, shard) clustering — which is the unavoidable
physical move that creates the layout.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["corpus_layout", "write_corpus"]

#: default quality-band edges, parts-per-million
DEFAULT_EDGES_PPM = (250_000, 500_000, 750_000)


def corpus_layout(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    lang_col: str = "lang",
    quality_ppm_col: str = "quality_ppm",
    bucket_edges_ppm: Sequence[int] = DEFAULT_EDGES_PPM,
    rows_per_shard: int = 100_000,
) -> DataFrame:
    """Assign every doc its export partition and shard.

    ``docs`` needs ``(id, lang, quality_ppm)`` — quality as an integer
    ppm score (any upstream gate: gopher, ccnet bucket, alpha ratio).
    Returns ``(id, lang, bucket, n_shards, shard)``.
    """
    if rows_per_shard <= 0:
        raise ValueError("rows_per_shard must be positive")
    edges = sorted(int(e) for e in bucket_edges_ppm)

    bucket_ord = sum(
        (F.when(F.col(quality_ppm_col) >= e, 1).otherwise(0) for e in edges),
        start=F.lit(0),
    )
    bucketed = docs.select(
        F.col(id_col),
        F.col(lang_col).alias("lang"),
        F.concat(F.lit("q"), bucket_ord.cast("string")).alias("bucket"),
    )

    sizes = bucketed.groupBy("lang", "bucket").agg(
        F.floor((F.count("*") + rows_per_shard - 1) / rows_per_shard)
        .cast("long")
        .alias("n_shards")
    )

    # md5 → first 60 bits → mod: the same engine-reproducible hash the
    # pagerank / LSH oracles replay; uniform, so no shard runs hot
    hash60 = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    return (
        bucketed.join(F.broadcast(sizes), ["lang", "bucket"])
        .select(
            id_col,
            "lang",
            "bucket",
            "n_shards",
            (hash60 % F.col("n_shards")).cast("long").alias("shard"),
        )
    )


def write_corpus(
    docs: DataFrame,
    path: str,
    *,
    layout: Optional[DataFrame] = None,
    id_col: str = "doc_id",
    fmt: str = "parquet",
    mode: str = "overwrite",
    **layout_kw,
) -> DataFrame:
    """Write ``docs`` Hive-partitioned by (lang, bucket), sharded.

    ``layout`` defaults to :func:`corpus_layout` over ``docs`` (pass
    kwargs through). The corpus is clustered by (lang, bucket, shard)
    before the write, so each partition directory receives at most
    ``n_shards`` files regardless of upstream partitioning. Returns
    the laid-out frame (sans shard column) for chaining/inspection.
    """
    lay = layout if layout is not None else corpus_layout(docs, id_col=id_col, **layout_kw)
    data_cols = [c for c in docs.columns if c != "lang"]
    out = docs.select(*data_cols).join(lay, id_col)
    (
        # n_shards is derivable from the directory listing — don't
        # burn a per-row column on it at corpus scale
        out.drop("n_shards")
        .repartition("lang", "bucket", "shard")
        .write.mode(mode)
        .partitionBy("lang", "bucket")
        .format(fmt)
        .save(path)
    )
    return out.drop("shard")
