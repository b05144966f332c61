"""Content-defined chunking (CDC) — shift-robust payload dedup.

A crawl re-fetches the same page bodies with small edits (timestamps,
rotating ads, injected banners). Fixed-size chunking dedups NONE of
that — one inserted byte shifts every later block boundary. CDC
(Muthitacharoen et al., LBFS SOSP'01; the rsync block rule; FastCDC,
USENIX ATC'16) cuts where a rolling hash of the content itself fires,
so boundaries travel WITH the bytes: an edit disturbs only the chunks
it touches and everything downstream still dedups chunk-for-chunk.
This is the storage layer's complement to the document-grain dedup
family (exact / MinHash / SimHash work at retrieval grain; CDC works
at byte-storage grain — WARC revisit records dedup whole payloads,
CDC dedups the shared 90% of two *different* payloads).

Determinism contract: the boundary hash is the engine's standard
``md5(window) → first 60 bits → long`` (bit-identical in DuckDB, so
the oracle replays every cut). A cut fires after character
``i + k - 1`` when ``hash(text[i : i + k]) % avg_size == 0`` —
expected chunk length ``avg_size``. No min/max clamp: the pure hash
rule keeps the operator exactly SQL-replayable; the clamped FastCDC
variant changes only the candidate filter, not the plan shape.

Scale shape: everything is a per-row higher-order expression — the
candidate scan, the cut list, the chunk split — followed by one
narrow ``posexplode``. ZERO exchanges introduced; ``cdc_dedup_stats``
adds the single map-side-combined hash aggregate any dedup must pay.
The md5-per-window cost is the local-mode price of engine-exact
determinism; on a cluster the same plan swaps in a Gear/Rabin rolling
hash (O(1) per byte) as a pandas UDF without touching the chunk
algebra.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .partitioning import fan_out

__all__ = ["cdc_chunks", "cdc_dedup_stats"]

PPM = 1_000_000


def _hash60(s):
    """md5 → first 15 hex chars → long: the repo's shared 60-bit hash
    (non-negative, so ``%`` and ``pmod`` agree with the SQL oracle)."""
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def cdc_chunks(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 16,
    avg_size: int = 64,
) -> DataFrame:
    """Split every document into content-defined chunks.

    ``k``: rolling-window width (chars); ``avg_size``: boundary
    modulus = expected chunk length. Output one row per chunk:
    ``(id, chunk_idx, start_pos, n_chars, chunk_md5)`` —
    ``start_pos`` 0-based, chunks concatenate back to the document
    byte-exactly (tested). Documents shorter than ``k`` (or with no
    firing window) become one whole-document chunk; empty documents
    produce no rows.
    """
    if k < 1 or avg_size < 1:
        raise ValueError("k and avg_size must be positive")
    text = F.col(text_col)
    n = F.length(text)
    # candidate cut positions: window [i, i+k-1] fires -> cut after
    # its last char. sequence(1, m) is DESCENDING for m < 1, so guard.
    cand = F.when(
        n >= k,
        F.filter(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: _hash60(text.substr(i, F.lit(k))) % avg_size == 0,
        ),
    ).otherwise(F.array().cast("array<int>"))
    # a cut at exactly n would open an empty tail chunk — drop it
    cuts = F.filter(
        F.transform(cand, lambda i: i + (k - 1)), lambda c: c < n
    )
    with_cuts = fan_out(docs).select(
        F.col(id_col), text.alias("_t"), n.alias("_n"), cuts.alias("_c")
    )
    starts = F.concat(F.array(F.lit(0)), F.col("_c"))
    ends = F.concat(F.col("_c"), F.array(F.col("_n")))
    spans = F.when(
        F.col("_n") > 0,
        F.zip_with(
            starts,
            ends,
            lambda s, e: F.struct(
                s.cast("long").alias("start"), (e - s).cast("long").alias("len")
            ),
        ),
    ).otherwise(F.array().cast("array<struct<start:long,len:long>>"))
    exploded = with_cuts.select(
        F.col(id_col), F.col("_t"), F.posexplode(spans).alias("chunk_idx", "sp")
    )
    chunk = F.col("_t").substr(
        (F.col("sp.start") + 1).cast("int"), F.col("sp.len").cast("int")
    )
    return exploded.select(
        F.col(id_col),
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.col("sp.start").alias("start_pos"),
        F.col("sp.len").alias("n_chars"),
        F.md5(chunk).alias("chunk_md5"),
    )


def cdc_dedup_stats(chunks: DataFrame) -> DataFrame:
    """Corpus-level storage-dedup accounting over a :func:`cdc_chunks`
    table: total vs distinct chunk counts and characters, plus
    ``stored_ppm`` = what fraction of the corpus bytes a
    dedup-by-chunk store actually keeps (1e6 = nothing dedups).

    One map-side-combined aggregate keyed on ``chunk_md5`` (identical
    hashes imply identical lengths), then a single scalar rollup —
    output is ONE row at any corpus size.
    """
    per_hash = chunks.groupBy("chunk_md5").agg(
        F.count(F.lit(1)).alias("copies"),
        F.first("n_chars").alias("n_chars"),
    )
    return per_hash.agg(
        F.sum("copies").cast("long").alias("total_chunks"),
        F.count(F.lit(1)).cast("long").alias("distinct_chunks"),
        F.sum(F.col("copies") * F.col("n_chars")).cast("long").alias("total_chars"),
        F.sum("n_chars").cast("long").alias("stored_chars"),
    ).select(
        "total_chunks",
        "distinct_chunks",
        "total_chars",
        "stored_chars",
        F.floor(F.col("stored_chars") * PPM / F.col("total_chars"))
        .cast("long")
        .alias("stored_ppm"),
    )
