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

from typing import Mapping, Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "corpus_layout",
    "write_corpus",
    "training_shuffle",
    "mix_sources",
    "apply_mix",
]

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


def _hash60(seed: str, id_col: str):
    """First 60 bits of md5(seed:id) as a non-negative long — the
    engine-reproducible uniform hash every layout op keys on (DuckDB
    replays it as ``('0x' || substr(md5(...), 1, 15))::BIGINT``)."""
    return F.conv(
        F.substring(
            F.md5(F.concat(F.lit(seed), F.lit(":"), F.col(id_col).cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")


def training_shuffle(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    seed: str = "0",
    n_shards: int = 16,
) -> DataFrame:
    """Deterministic global corpus shuffle for training export.

    Training runs want the corpus in an i.i.d.-ish order — NOT crawl
    order (one host's documents back-to-back) — and the order must be
    reproducible from a seed so a run can be resumed or replayed.
    A seeded hash gives both: ``shard = h % n_shards`` spreads docs
    uniformly, ``pos`` = rank of ``h`` within the shard fixes the read
    order. Consuming shards round-robin (or shard-concatenated) yields
    a permutation that is a pure function of (seed, ids).

    Returns ``(id, shard, pos)``.

    Scale shape: ONE hash-partitioned exchange (by ``shard``) + a sort
    within each shard — exactly the physical
    ``repartition(shard).sortWithinPartitions(h)`` an export writer
    would do anyway; no global sort, no driver state. Pick ``n_shards``
    so a shard is a few hundred MB (100 TB → ~10^5 shards); the
    rank window is per-shard, so its sort never exceeds shard size.
    """
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    h = _hash60(seed, id_col)
    keyed = docs.select(F.col(id_col), h.alias("h"))
    win = Window.partitionBy("shard").orderBy("h", id_col)
    return (
        keyed.withColumn("shard", (F.col("h") % n_shards).cast("long"))
        .withColumn("pos", F.row_number().over(win).cast("long"))
        .select(id_col, "shard", "pos")
    )


def mix_sources(
    docs: DataFrame,
    rates_ppm: Mapping[str, int],
    *,
    id_col: str = "doc_id",
    source_col: str = "source",
    seed: str = "0",
    default_ppm: int = 1_000_000,
) -> DataFrame:
    """Deterministic source mixing (up/down-sampling to a target mix).

    LLM corpora are trained at per-source rates, not natural
    proportions — e.g. books at 2.3 epochs, raw web at 0.6 (the
    Pile / Dolma recipe). ``rates_ppm[source]`` is that rate in parts
    per million (2_300_000 = 2.3 epochs); unlisted sources get
    ``default_ppm``. Each doc receives::

      n_repeats = rate // 1e6  +  (1 if h % 1e6 < rate % 1e6 else 0)

    so expected copies equal the rate exactly, the decision is a pure
    function of (seed, id) — reproducible, no RNG state — and the
    fractional part is carried by an independent uniform per doc (no
    systematic head/tail bias as with rank-based truncation).

    Returns ``(id, source, rate_ppm, n_repeats)``; feed it to
    :func:`apply_mix` to materialize the copies. Scale shape: pure
    per-row projection — no shuffle, no broadcast table (the rate map
    folds into a CASE expression), codegen all the way.
    """
    rate = F.lit(int(default_ppm))
    for src, ppm in sorted(rates_ppm.items()):
        rate = F.when(F.col(source_col) == src, int(ppm)).otherwise(rate)
    u = _hash60(seed, id_col) % 1_000_000
    rate = rate.cast("long")
    n = (rate / 1_000_000).cast("long") + F.when(
        u < rate % 1_000_000, 1
    ).otherwise(0)
    return docs.select(
        F.col(id_col),
        F.col(source_col).alias("source"),
        rate.alias("rate_ppm"),
        n.cast("long").alias("n_repeats"),
    )


def apply_mix(
    docs: DataFrame, mix: DataFrame, *, id_col: str = "doc_id"
) -> DataFrame:
    """Materialize :func:`mix_sources` copies: one output row per
    (doc, repeat_idx), repeat_idx in [0, n_repeats). Zero-repeat docs
    drop out (downsampling). The explode is a narrow op; give the
    copies distinct shuffle identity downstream by keying on
    (id, repeat_idx) — e.g. ``training_shuffle`` with
    ``concat(id, '#', repeat_idx)`` as the id."""
    plan = mix.select(id_col, "n_repeats").filter(F.col("n_repeats") > 0)
    exploded = plan.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(0), F.col("n_repeats") - 1)).alias(
            "repeat_idx"
        ),
    )
    return docs.join(exploded, id_col)
