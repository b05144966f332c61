"""End-to-end training-data pipeline composition: the corpus funnel.

``corpus_funnel`` chains the individual LLM-data operators this
package ships — URL filtering, language ID, Gopher quality, exact
dedup, MinHash/LSH near-dedup with duplicate-cluster transitive
closure, and benchmark n-gram decontamination — into ONE declarative
DataFrame plan (the RefinedWeb / FineWeb / Dolma pipeline shape) and
reports the funnel: documents and BPE tokens surviving after each
stage.

Stage order (each gate applies to the survivors of the previous one,
exactly as a production pipeline would):

====  =============  ====================================================
ord   stage          keep condition
====  =============  ====================================================
0     input          —
1     url_filter     NOT url_blocked (suffix blocklist + soft-word score)
2     lang_<l>       language_id prediction == target lang
3     gopher         every Gopher repetition/shape threshold passes
4     exact_dedup    doc_id == min(doc_id) among same-fingerprint survivors
5     near_dedup     doc is its MinHash duplicate-cluster's canonical
6     decontaminate  no word n-gram shared with the benchmark corpus
====  =============  ====================================================

Scale shape: stages 1–3 are per-row column expressions chained through
``keep_cols`` pass-through (no joins back on the id — the corpus is
scanned once up to the first wide op, then checkpointed so the flag
chain is evaluated exactly once). Stage 4 is a map-side-combined
per-fingerprint winner aggregate plus a keep join back on the UNIQUE
doc id (skew-proof: a boilerplate fingerprint's copy set meets only
the partial aggregate, and the join key has no hot values at all);
the flags+keep frame is materialized once for every downstream
consumer (main aggregate, pair generation, decontamination). Stage 5
reuses the bucketed LSH self-join (never all-pairs) and the
large-star/small-star closure; stage 6 broadcasts the benchmark gram
set. The final report is ONE aggregation producing
a 7-row funnel via ``stack`` — no per-stage actions, no driver loops.

Reference parity note: the reference scraper has no corpus-pipeline
surface; this operator belongs to the training-data layer
(SURVEY.md §6) and composes operators that each carry their own
DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import dedup_components, minhash_lsh_pairs
from .quality import decontaminate, gopher_quality
from .textops import language_id, tokens_col
from .urlfilter import url_filter

#: (ord, label-template) for the funnel rows; lang stage label is
#: filled with the target language.
FUNNEL_STAGES = (
    "input",
    "url_filter",
    "lang_{lang}",
    "gopher",
    "exact_dedup",
    "near_dedup",
    "decontaminate",
)


def funnel_flags(
    docs: DataFrame,
    benchmark: DataFrame,
    blocklist: Sequence[str] | DataFrame = (),
    soft_words: Mapping[str, int] | None = None,
    lang: str = "en",
    contam_n: int = 5,
    num_hashes: int = 4,
    band_size: int = 1,
    shingle_n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    url_col: str = "url",
) -> DataFrame:
    """The funnel's per-document cumulative gate flags ``_c1.._c6``
    (plus ``_bpe`` token counts) as one plan — the shared core both
    :func:`corpus_funnel` (aggregate view) and :func:`funnel_reasons`
    (per-doc audit view) project from.

    ``benchmark`` is the evaluation corpus to decontaminate against
    (external by construction — it is NOT filtered by the funnel).
    Near-dup pairs use the integer-exact 0.4-Jaccard gate
    (5·|A∩B| ≥ 2·|A∪B|) shared with the ``dedup_minhash_lsh`` oracle.
    """
    # --- stages 1-3: per-row flags, chained without id joins ---------
    cur = url_filter(
        docs.select(id_col, text_col, url_col),
        blocklist=blocklist,
        soft_words=soft_words,
    ).select(id_col, text_col, (~F.col("url_blocked")).alias("_c1"))
    cur = language_id(cur, id_col=id_col, text_col=text_col,
                      keep_cols=(text_col, "_c1"))
    cur = cur.select(
        id_col, text_col, "_c1",
        (F.col("_c1") & (F.col("lang_pred") == lang)).alias("_c2"),
    )
    cur = gopher_quality(cur, id_col=id_col, text_col=text_col,
                         keep_cols=(text_col, "_c1", "_c2"))
    normalized = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    # NULL-safe fingerprint: md5(NULL) is NULL and NULL join keys never
    # match, so a null-text doc would vanish from the funnel at the
    # stage-4 join (undercounting even the 'input' stage). The sentinel
    # reproduces the old window's null semantics — all null-text docs
    # share one group, DISTINCT from empty-text docs (md5("")).
    cur = cur.select(
        id_col, text_col, "_c1", "_c2",
        (F.col("_c2") & F.col("gopher_keep")).alias("_c3"),
        F.md5(F.coalesce(normalized, F.lit("\x00<null-text>"))).alias("_fp"),
        F.size(
            F.regexp_extract_all(
                F.col(text_col), F.lit(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"), F.lit(0)
            )
        ).cast("long").alias("_bpe"),
    )

    # --- stage 4: exact dedup among survivors (the argmin picks the
    # same keeper dedup_exact would). SKEW-PROOF (round 4) and
    # SINGLE-EVAL (round 5): the flag chain (two tokenizations) is
    # checkpointed BEFORE stage 4 so the winner aggregate and the keep
    # join both read materialized rows instead of each re-evaluating
    # the chain (reclaimed ~1 s of the round-4 reshape's sf0.1 cost);
    # a hot fingerprint (boilerplate body) meets only the map-side-
    # combined aggregate, and the keep flag joins back on the UNIQUE
    # doc id (winner-membership semi-form: zero skew by construction,
    # winners-only build side AQE-broadcastable) — equivalent to the
    # fp-equality form because ids are globally unique --------------
    cur = cur.localCheckpoint(eager=True)
    keepers = (
        cur.groupBy("_fp")
        .agg(F.min(F.when(F.col("_c3"), F.col(id_col))).alias(id_col))
        .where(F.col(id_col).isNotNull())
        .select(id_col)
        .withColumn("_keep4", F.lit(True))
    )
    f4 = cur.join(keepers, id_col, "left").withColumn(
        "_c4", F.col("_c3") & F.coalesce(F.col("_keep4"), F.lit(False))
    ).drop("_keep4")
    # Materialize the flags+keep ONCE: four downstream consumers (the
    # final aggregate, pair generation, the components join,
    # decontamination) would otherwise each re-run the winner agg and
    # keep join — measured slower (V4 experiment) than the second
    # materialization even at sf0.1, and 4 wide exchanges at scale.
    # localCheckpoint (eager): blocks free with the returned frame —
    # persist() leaked the corpus-wide flag cache for the session's
    # life; eager because inside one job tree the branches race on a
    # cold cache and each recompute the chain
    f4 = f4.localCheckpoint(eager=True)

    # --- stage 5: near-dedup over stage-4 survivors ------------------
    s4 = f4.filter("_c4").select(id_col, text_col).filter(
        F.size(tokens_col(F.col(text_col))) > 0
    )
    pairs = minhash_lsh_pairs(
        s4,
        num_hashes=num_hashes,
        band_size=band_size,
        shingle_n=shingle_n,
        jaccard_threshold=0.0,
        id_col=id_col,
        text_col=text_col,
    ).filter(F.col("inter_size") * 5 >= F.col("union_size") * 2)
    comps = dedup_components(
        f4.filter("_c4").select(id_col),
        pairs.select("id_a", "id_b"),
        id_col=id_col,
    ).select(id_col, F.col("is_canonical").alias("_canon"))
    f5 = f4.join(comps, id_col, "left").withColumn(
        "_c5", F.col("_c4") & F.coalesce(F.col("_canon"), F.lit(True))
    )

    # --- stage 6: decontaminate stage-5 survivors vs the benchmark ---
    dec = decontaminate(
        f5.filter("_c5").select(id_col, text_col),
        benchmark,
        n=contam_n,
        id_col=id_col,
        text_col=text_col,
    ).select(id_col, "contam_keep")
    f6 = f5.join(dec, id_col, "left").withColumn(
        "_c6", F.col("_c5") & F.coalesce(F.col("contam_keep"), F.lit(True))
    )
    return f6


def corpus_funnel(
    docs: DataFrame,
    benchmark: DataFrame,
    lang: str = "en",
    id_col: str = "doc_id",
    text_col: str = "text",
    **flag_kw,
) -> DataFrame:
    """Run the full pipeline over ``docs`` (``id, text, url``) and
    return the funnel report ``(stage, stage_ord, docs, tokens)`` —
    survivors and their total BPE token count after each stage."""
    f6 = funnel_flags(
        docs, benchmark, lang=lang, id_col=id_col, text_col=text_col,
        **flag_kw,
    )

    # --- the funnel: ONE aggregation, unpivoted via stack ------------
    def _d(cond):
        return F.count(F.when(cond, F.lit(1))).cast("long")

    def _t(cond):
        return F.coalesce(F.sum(F.when(cond, F.col("_bpe"))), F.lit(0)).cast("long")

    agg = f6.agg(
        F.count(F.lit(1)).cast("long").alias("d0"),
        F.coalesce(F.sum("_bpe"), F.lit(0)).cast("long").alias("t0"),
        *[
            c.alias(n)
            for i in range(1, 7)
            for c, n in (
                (_d(F.col(f"_c{i}")), f"d{i}"),
                (_t(F.col(f"_c{i}")), f"t{i}"),
            )
        ],
    )
    labels = [s.format(lang=lang) for s in FUNNEL_STAGES]
    stack = ", ".join(
        f"'{label}', {i}, d{i}, t{i}" for i, label in enumerate(labels)
    )
    return agg.select(
        F.expr(
            f"stack(7, {stack}) AS (stage, stage_ord, docs, tokens)"
        )
    )


def funnel_reasons(
    docs: DataFrame,
    benchmark: DataFrame,
    lang: str = "en",
    id_col: str = "doc_id",
    **flag_kw,
) -> DataFrame:
    """Per-document funnel audit: which gate dropped each doc.

    The operational complement of :func:`corpus_funnel`'s aggregate
    view — "why did MY document disappear?" is the first question a
    pipeline user asks, and the first-failing-stage label answers it
    without re-running anything stage by stage. Same plan as the
    funnel (the flags are computed once), different projection::

      (id, dropped_at, kept, n_tokens)

    ``dropped_at`` = the FIRST stage whose gate failed ('kept' for
    survivors); ``kept`` mirrors the final ``_c6`` flag.
    """
    f6 = funnel_flags(docs, benchmark, lang=lang, id_col=id_col, **flag_kw)
    labels = [s.format(lang=lang) for s in FUNNEL_STAGES]
    reason = F.when(~F.col("_c1"), F.lit(labels[1]))
    for i in range(2, 7):
        reason = reason.when(~F.col(f"_c{i}"), F.lit(labels[i]))
    return f6.select(
        F.col(id_col),
        reason.otherwise(F.lit("kept")).alias("dropped_at"),
        F.col("_c6").alias("kept"),
        F.col("_bpe").cast("long").alias("n_tokens"),
    )
