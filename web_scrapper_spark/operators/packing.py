"""Sequence packing: assign documents to fixed token-budget training
shards, the last mile of an LLM data pipeline (tokenized corpus →
contiguous shards a trainer can memory-map).

Semantics are GPT-style concatenate-then-chunk: within a bin, documents
are laid end-to-end in a deterministic order and the byte stream is
chopped every ``budget`` tokens.  A document therefore starts in shard
``floor(exclusive_cumsum / budget)`` at offset
``exclusive_cumsum % budget``; a document that crosses a boundary is
split across consecutive shards at training time (standard packing —
no padding, no discarded tail).

Scale design: a global concatenation order would need a single-
partition window (the classic cumsum scale-killer).  Instead documents
are first routed to ``n_bins`` independent bins by a hash of their id
— bins are packed in parallel, each with its own window — so the only
shuffle is an Exchange on ``bin_id`` and the per-bin sort, both
embarrassingly parallel across bins.  At 100 TB pick ``n_bins`` ≈
shard-writer parallelism (thousands); each bin's window then sorts
|corpus|/n_bins rows.  Determinism: bin routing and in-bin order
depend only on ``doc_id``, never on partitioning or timing.

Reference parity note: the reference scraper has no training-shard
surface; this operator belongs to the training-data pipeline layer
(SURVEY.md §6) alongside dedup/quality/DSIR.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .partitioning import fan_out
from .textops import BPE_TOKEN_REGEX


def bpe_token_count_col(text: Column) -> Column:
    """Token count under the engine's BPE-ish regex (textops
    ``token_count_bpe``), as a composable column."""
    return F.size(
        F.filter(
            F.regexp_extract_all(text, F.lit(BPE_TOKEN_REGEX), 0),
            lambda t: t != F.lit(""),
        )
    ).cast("long")


def pack_bin_col(id_col: Column, n_bins: int) -> Column:
    """Deterministic bin router: first 15 md5 hex chars (60 bits) mod
    n_bins — bit-identical in DuckDB (``('0x'||substr(md5(..),1,15))``)
    and uniform enough that bins stay balanced at any corpus size."""
    return (
        F.conv(F.substring(F.md5(id_col.cast("string")), 1, 15), 16, 10)
        .cast("long")
        % n_bins
    )


def pack_sequences(
    docs: DataFrame,
    budget: int,
    n_bins: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
    tok_col: str | None = None,
) -> DataFrame:
    """Assign every document a (bin_id, shard_id, shard_offset) under
    concatenate-then-chunk packing with ``budget`` tokens per shard.

    Returns one row per document:
      ``doc_id, bin_id, n_tok, shard_id, shard_offset, spans_boundary``
    where ``shard_id`` is the bin-local shard the document STARTS in,
    ``shard_offset`` its token offset inside that shard, and
    ``spans_boundary`` whether it crosses into the next shard(s).
    All outputs are integers/booleans (oracle hash-stable).

    ``tok_col``: use an existing token-count column instead of
    re-tokenizing ``text_col``.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    if n_bins <= 0:
        raise ValueError("n_bins must be positive")

    n_tok = (
        F.col(tok_col).cast("long")
        if tok_col
        else bpe_token_count_col(F.col(text_col))
    )
    staged = fan_out(docs).select(
        F.col(id_col).alias("doc_id"),
        pack_bin_col(F.col(id_col), n_bins).alias("bin_id"),
        n_tok.alias("n_tok"),
    )
    win = (
        Window.partitionBy("bin_id")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    excl = F.coalesce(F.sum("n_tok").over(win), F.lit(0))
    return (
        staged.withColumn("_excl", excl)
        .select(
            "doc_id",
            "bin_id",
            "n_tok",
            (F.col("_excl") / budget).cast("long").alias("shard_id"),
            (F.col("_excl") % budget).alias("shard_offset"),
            (
                (F.col("_excl") % budget) + F.col("n_tok") > budget
            ).alias("spans_boundary"),
        )
    )


def shard_manifest(
    packed: DataFrame,
    budget: int,
) -> DataFrame:
    """Roll a ``pack_sequences`` output up to one row per (bin_id,
    shard_id): the shard a trainer actually reads.

    ``n_docs`` counts documents STARTING in the shard; ``tok_begin``/
    ``tok_end`` tile the bin's token stream with no gaps or overlap:
    ``tok_end`` is the NEXT manifest shard's ``tok_begin`` (a doc
    spilling past a shard boundary keeps its tail in the shard it
    started in, so a fully-spilled-over shard is absent from the
    manifest and its range belongs to the spiller), and the bin's last
    shard ends at the bin's total stream length. Pure groupBy on
    (bin_id, shard_id) + two windows over the (shard-count sized)
    rollup: map-side combine, one small shuffle.
    """
    rolled = packed.groupBy("bin_id", "shard_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").alias("docs_tok"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
        # stream position where the shard's last-starting doc ends —
        # the bin's max over shards is the bin's total stream length
        F.max(
            F.col("shard_id") * budget + F.col("shard_offset") + F.col("n_tok")
        ).alias("_docs_end"),
    )
    w_bin = Window.partitionBy("bin_id")
    w_seq = w_bin.orderBy("shard_id")
    tok_begin = F.col("shard_id") * budget
    tok_end = F.coalesce(
        F.lead(tok_begin).over(w_seq), F.max("_docs_end").over(w_bin)
    )
    return rolled.select(
        "bin_id",
        "shard_id",
        "n_docs",
        "docs_tok",
        tok_begin.alias("tok_begin"),
        tok_end.alias("tok_end"),
        "first_doc",
        "last_doc",
    )


def passage_chunks(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Sliding-window passage extraction — the retrieval-side sibling
    of :func:`pack_sequences`: where packing lays docs end-to-end for a
    trainer, chunking cuts each doc into overlapping fixed-size windows
    for an embedding/RAG index (a doc is too coarse a retrieval unit;
    a window of ``chunk_tokens`` whitespace tokens with ``overlap``
    carried across cuts is the standard one).

    One row per (doc, window)::

      (id, chunk_id, start_tok, n_tokens, chunk_text)

    Window starts step by ``chunk_tokens - overlap``; the final window
    may be short (never empty — empty docs yield no rows). Chunk count
    is ``1 + ceil(max(n - chunk_tokens, 0) / step)`` so every token is
    covered and the last window begins before the previous one ends.

    Scale shape: pure per-row projection + a narrow ``posexplode`` —
    the corpus never shuffles, and the split/slice/join-back all run
    as JVM higher-order functions (no UDF, no Python). Chunk identity
    is (id, chunk_id) — deterministic under any partitioning.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    step = chunk_tokens - overlap
    toks = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda t: t != F.lit("")
    )
    n = F.size("_toks")
    extra = F.greatest(n - chunk_tokens, F.lit(0))
    n_chunks = (F.lit(1) + (extra + step - 1).cast("long") / step).cast("long")
    starts = F.transform(
        F.sequence(F.lit(0), n_chunks.cast("int") - 1), lambda i: i * step
    )
    exploded = (
        docs.select(F.col(id_col), toks.alias("_toks"))
        .select(id_col, "_toks", F.posexplode(starts).alias("chunk_id", "_start"))
    )
    chunk = F.slice(F.col("_toks"), F.col("_start") + 1, chunk_tokens)
    return (
        exploded.select(
            id_col,
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.col("_start").cast("long").alias("start_tok"),
            F.size(chunk).cast("long").alias("n_tokens"),
            F.concat_ws(" ", chunk).alias("chunk_text"),
        )
        .filter(F.col("n_tokens") > 0)
    )
