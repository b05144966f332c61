"""Distributed BPE tokenizer training (merge learning).

:func:`bpe_pair_counts` (textops.py) computes ONE step of BPE training
— the corpus-wide pair histogram whose argmax is the next merge. This
module runs the whole loop (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units"): learn the first
``n_merges`` merge rules from a document corpus.

Scale shape — the reason this works at 100 TB:

- The corpus is read ONCE, to build the word-frequency table
  (explode → groupBy(word), map-side combined). Classic BPE trains on
  ``(word, freq)``, never the raw text; by Zipf the distinct-word
  table is orders of magnitude smaller than the corpus (≈10^7-10^8
  rows for a web-scale crawl — a few GB), so every subsequent
  iteration is independent of corpus size.
- Each iteration is two narrow jobs over that small table: a pair
  aggregate (groupBy(left,right), map-side partials) whose top-1 is a
  TakeOrdered — only ONE row ever reaches the driver — and a per-row
  symbol-array fold (``aggregate`` higher-order function, pure JVM
  codegen, no shuffle) applying the winning merge.
- Words whose symbol sequence collapses to a single token are retired
  from the working set (they can never contribute a pair again), so
  the active table SHRINKS as training progresses.
- Lineage is truncated with ``localCheckpoint`` every
  ``checkpoint_every`` merges so the plan stays bounded; on a real
  cluster use ``spark.sparkContext.setCheckpointDir`` + ``checkpoint``
  for fault tolerance instead.

Symbols use the standard ``</w>`` end-of-word marker, matching
``bpe_pair_counts``. Ties break on (freq desc, left asc, right asc) so
the learned merge table is total-order deterministic — the property
the sequential oracle twin (:func:`learn_bpe_sequential`) relies on.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .partitioning import fan_out
from .textops import tokens_col

__all__ = [
    "fixture_doc_texts",
    "bpe_learn",
    "bpe_encode",
    "learn_bpe_sequential",
    "encode_word_minrank",
    "word_symbol_table",
    "apply_merge_col",
    "fixture_word_freqs",
    "fixture_docs",
]

# Deterministic fixture corpus for the oracle / tests: a stem+suffix
# vocabulary (the Sennrich paper's low/lower/lowest shape, plus crawl
# domain terms) under a Zipf-ish frequency law, so the learned merges
# exercise both shared-suffix and shared-prefix structure.
_FIXTURE_WORDS = [
    "low", "lower", "lowest", "new", "newer", "newest",
    "wide", "wider", "widest", "deep", "deeper", "deepest",
    "crawl", "crawler", "crawling", "fetch", "fetched", "fetching",
    "parse", "parser", "parsing", "token", "tokens", "subword",
    "corpus", "quality", "filter", "dedup", "shard", "engine",
]


def fixture_word_freqs() -> dict[str, int]:
    """Zipf-ish deterministic frequencies over the fixture vocabulary."""
    return {w: 600 // (i + 2) + 1 for i, w in enumerate(_FIXTURE_WORDS)}


def fixture_doc_texts(words_per_doc: int = 40) -> list[tuple[int, str]]:
    """The fixture word histogram rendered back into ``(doc_id, text)``
    rows — a coprime-stride permutation interleaves the token stream so
    documents are mixed, then it is chunked. Exactly reproduces
    :func:`fixture_word_freqs` under ``tokens_col``. Plain Python so
    the oracle can replay it without Spark."""
    import math

    stream: list[str] = []
    for w, f in fixture_word_freqs().items():
        stream.extend([w] * f)
    n = len(stream)
    step = 7
    while math.gcd(step, n) != 1:
        step += 2
    toks = [stream[(i * step) % n] for i in range(n)]
    return [
        (i // words_per_doc, " ".join(toks[i : i + words_per_doc]))
        for i in range(0, n, words_per_doc)
    ]


def fixture_docs(spark, words_per_doc: int = 40) -> DataFrame:
    """:func:`fixture_doc_texts` as a DataFrame."""
    return spark.createDataFrame(
        fixture_doc_texts(words_per_doc), "doc_id long, text string"
    )


def word_symbol_table(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """One corpus pass → ``(syms: array<string>, freq: long)``.

    ``syms`` is the word's character sequence plus the ``</w>``
    marker. This is the ONLY job that touches the (potentially 100 TB)
    corpus; everything after runs on the Zipf-compressed word table.
    """
    words = fan_out(docs).select(
        F.explode(tokens_col(F.col(text_col))).alias("word")
    )
    wf = words.groupBy("word").agg(F.count("*").alias("freq"))
    syms = F.concat(
        F.transform(
            F.sequence(F.lit(1), F.length("word")),
            lambda i: F.col("word").substr(i, F.lit(1)),
        ),
        F.array(F.lit("</w>")),
    )
    return wf.select(syms.alias("syms"), "freq")


def apply_merge_col(syms: Column, left: str, right: str) -> Column:
    """Replace every adjacent (left, right) in ``syms`` with the merged
    token, left-to-right non-overlapping — BPE's merge application as a
    single JVM-side ``aggregate`` fold (no UDF, no shuffle).

    The fold is exactly greedy left-to-right: after a merge the
    accumulator's last element becomes ``left+right``, which can never
    equal ``left`` again (both are non-empty), so a freshly merged
    token never re-matches within the same pass — e.g. pair (a, a)
    over [a,a,a] folds to [aa, a], as the sequential algorithm does.
    """
    merged = left + right
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (s == F.lit(right)),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1),
                F.array(F.lit(merged)),
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def _pair_counts(wf: DataFrame) -> DataFrame:
    """(left, right, freq) over the current symbol table — zip_with of
    the two shifted slices, exploded, one map-side-combined aggregate."""
    n = F.size("syms")
    pairs = F.zip_with(
        F.slice(F.col("syms"), F.lit(1), n - 1),
        F.slice(F.col("syms"), F.lit(2), n - 1),
        lambda a, b: F.struct(a.alias("left"), b.alias("right")),
    )
    return (
        wf.select(F.explode(pairs).alias("p"), "freq")
        .groupBy(F.col("p.left").alias("left"), F.col("p.right").alias("right"))
        .agg(F.sum("freq").alias("freq"))
    )


def bpe_learn(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    checkpoint_every: int = 5,
) -> DataFrame:
    """Learn the first ``n_merges`` BPE merge rules from ``docs``.

    Returns a DataFrame ``(rank, lhs, rhs, merged, freq)`` — the merge
    table in training order (``lhs``/``rhs``, not left/right: those are
    ANSI keywords and the oracle SQL would have to quote them), ``freq``
    being the corpus-wide pair frequency at the time the merge was
    chosen. Stops early if the working set runs out of pairs.

    The driver loop holds only the argmax row per iteration; all pair
    statistics and merge applications stay distributed.
    """
    spark = docs.sparkSession
    wf = word_symbol_table(docs, text_col=text_col).localCheckpoint()
    merges: list[tuple[int, str, str, str, int]] = []
    for r in range(1, n_merges + 1):
        best = (
            _pair_counts(wf)
            .orderBy(F.desc("freq"), F.asc("left"), F.asc("right"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        left, right, freq = best[0]["left"], best[0]["right"], best[0]["freq"]
        merges.append((r, left, right, left + right, freq))
        wf = wf.withColumn(
            "syms", apply_merge_col(F.col("syms"), left, right)
        ).filter(F.size("syms") > 1)
        if r % checkpoint_every == 0:
            wf = wf.localCheckpoint()
    return spark.createDataFrame(
        merges, "rank int, lhs string, rhs string, merged string, freq long"
    )


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a learned merge table (``bpe_learn`` output rows, or the
    sequential twin's tuples) to encode documents into subword units —
    the inference half of the tokenizer.

    Returns ``(id, n_words, n_subwords, subword_fingerprint)`` where
    the fingerprint is md5 over the space-joined subword stream in
    document order — a strong order-sensitive equality check that
    stays a scalar (no array column crosses the oracle compare).

    Encoding is inherently per-document sequential work, so this is
    the Arrow path by design: ``mapInPandas`` with the (tiny, ≤ vocab
    budget) merge table shipped in the closure, never a row-at-a-time
    UDF. Within each batch, distinct words are encoded once and
    memoized — by Zipf the hit rate approaches 1, so per-row cost is a
    dict lookup (the same distinct-word economics ``bpe_learn`` uses;
    an explode→encode-distinct→join-back variant would shuffle the
    corpus twice for no win).

    Merges are applied in rank order (one fold per rule). For a table
    produced by BPE TRAINING this is exactly the classic min-rank-pair
    encoder: a rule consuming a merged token is always learned after
    the rule producing it, and merging a pair never creates adjacency
    between two tokens that both predate the rule — the oracle twin
    implements the min-rank loop independently and the two must agree.
    """
    import hashlib
    import re as _re

    rules = [(m[1], m[2]) for m in merges]
    token_re = _re.compile(r"[^a-z0-9_]+")

    def encode_batches(batches):
        import pandas as pd

        memo: dict[str, list[str]] = {}

        def encode_word(word: str) -> list[str]:
            got = memo.get(word)
            if got is None:
                syms = list(word) + ["</w>"]
                for left, right in rules:
                    out: list[str] = []
                    i = 0
                    while i < len(syms):
                        if (
                            i + 1 < len(syms)
                            and syms[i] == left
                            and syms[i + 1] == right
                        ):
                            out.append(left + right)
                            i += 2
                        else:
                            out.append(syms[i])
                            i += 1
                    syms = out
                got = memo[word] = syms
            return got

        for pdf in batches:
            ids, n_words, n_subwords, fps = [], [], [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                words = [
                    w for w in token_re.split((text or "").lower()) if w
                ]
                stream: list[str] = []
                for w in words:
                    stream.extend(encode_word(w))
                ids.append(doc_id)
                n_words.append(len(words))
                n_subwords.append(len(stream))
                fps.append(
                    hashlib.md5(" ".join(stream).encode("utf-8")).hexdigest()
                )
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "n_words": n_words,
                    "n_subwords": n_subwords,
                    "subword_fingerprint": fps,
                }
            )

    return fan_out(docs.select(id_col, text_col)).mapInPandas(
        encode_batches,
        schema=(
            f"{id_col} long, n_words long, n_subwords long, "
            "subword_fingerprint string"
        ),
    )


def encode_word_minrank(
    word: str, ranks: dict[tuple[str, str], int]
) -> list[str]:
    """Sequential reference encoder (the oracle twin of the fold inside
    :func:`bpe_encode`): classic min-rank-pair loop — repeatedly merge
    the present pair with the lowest training rank until none applies."""
    syms = list(word) + ["</w>"]
    while len(syms) > 1:
        best_rank, best_i = None, None
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        syms = (
            syms[:best_i]
            + [syms[best_i] + syms[best_i + 1]]
            + syms[best_i + 2 :]
        )
    return syms


def learn_bpe_sequential(
    word_freqs: dict[str, int], n_merges: int
) -> list[tuple[int, str, str, str, int]]:
    """Sequential reference twin of :func:`bpe_learn` (the oracle):
    plain-Python BPE over a ``{word: freq}`` table with the same
    ``</w>`` convention and the same (freq desc, left asc, right asc)
    tie-break. Independent control flow (explicit while-scan merge
    application) so it cross-checks the distributed fold."""
    vocab: dict[tuple[str, ...], int] = {}
    for w, f in word_freqs.items():
        key = tuple(list(w) + ["</w>"])
        vocab[key] = vocab.get(key, 0) + f
    merges: list[tuple[int, str, str, str, int]] = []
    for r in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for syms, f in vocab.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        (left, right), freq = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0])
        )
        merges.append((r, left, right, left + right, freq))
        nxt: dict[tuple[str, ...], int] = {}
        for syms, f in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            if len(out) > 1:
                key = tuple(out)
                nxt[key] = nxt.get(key, 0) + f
        vocab = nxt
    return merges
