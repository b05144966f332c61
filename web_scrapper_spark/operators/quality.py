"""Corpus quality filtering for web text: Gopher repetition metrics
and C4 cleaning rules.

Implements the document-quality heuristics published in "Scaling
Language Models: Methods, Analysis & Insights from Training Gopher"
(Rae et al. 2021, Table A1) — the standard pre-training corpus filter
set: duplicate-line fractions, most-common-n-gram character fractions,
duplicate-n-gram character fraction, bullet/ellipsis line shape,
symbol-to-word ratio, and alphabetic-word fraction.

Everything is computed PER ROW with native higher-order functions
(``transform`` / ``filter`` / ``aggregate`` over token arrays) — zero
shuffles, zero Python (HOF lambdas evaluate JVM-side outside the
codegen spans; the only Exchange in the plan is the fan_out guard,
a no-op at production scale).  The modal
n-gram is found by sorting the row's n-gram array and folding a
longest-run struct over it (O(m log m) per document) instead of an
explode → groupBy(doc, gram) shuffle, so the operator's cost scales
linearly with corpus bytes and is embarrassingly parallel at 100 TB.

The DuckDB oracle twin (``__spark_entry__.oracle_sql``) re-derives the
same numbers independently via ``unnest`` + ``GROUP BY`` — same
answers, different algorithm — so the fold is cross-checked against
plain SQL semantics at sf0.01.

Reference parity note: the reference scraper has no corpus-quality
surface; this operator is part of the training-data pipeline layer
(SURVEY.md §6) alongside dedup/similarity/fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .partitioning import fan_out
from .textops import tokens_col

# Published Gopher thresholds (Rae et al. 2021, Table A1), expressed in
# parts-per-million so every ratio crossing the oracle hash gate is an
# integer (house rule: no raw float columns in compared outputs).
GOPHER_THRESHOLDS_PPM = {
    "min_words": 50,
    "max_words": 100_000,
    "min_mean_word_len_ppm": 3_000_000,
    "max_mean_word_len_ppm": 10_000_000,
    "max_dup_line_ppm": 300_000,
    "max_dup_line_char_ppm": 200_000,
    "max_top2_char_ppm": 200_000,
    "max_top3_char_ppm": 180_000,
    "max_top4_char_ppm": 160_000,
    "max_dup5_char_ppm": 150_000,
    "max_ellipsis_line_ppm": 300_000,
    "max_bullet_line_ppm": 900_000,
    "min_alpha_word_ppm": 800_000,
    "max_symbol_word_ppm": 100_000,
}

_BULLETS = ("•", "-", "*")


def _ngrams_col(toks: Column, n: int) -> Column:
    """Space-joined word n-grams; empty array when the doc is shorter
    than n tokens.

    ``toks`` MUST be an attribute (a staged column), never an inline
    expression chain: the lambda below references ``toks`` per
    element, and interpreted HOFs re-evaluate the captured subtree on
    every access — an inline ``tokens_col(text)`` here re-tokenizes
    the document once PER GRAM, O(m²) per doc (measured 15.3 s → 0.9 s
    on sf0.1 bigrams when staged)."""
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _mode_run_fold(sorted_grams: Column, joiner_chars: int) -> Column:
    """Fold a longest-run tracker over a SORTED gram array.

    Returns struct(bn, bl, dup): ``bn`` = occurrences of the modal
    gram, ``bl`` = its character length excluding the ``joiner_chars``
    joining spaces, ``dup`` = total characters in occurrences beyond
    the first of every duplicated gram ((count-1) * len summed).

    Ties on count break by longer gram, then lexicographically
    smaller gram — mirrored exactly in the SQL oracle's arg-max.
    """
    init = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("bn"),
        F.lit(0).alias("bl"),
        F.lit("").alias("bg"),
        F.lit(0).alias("dup"),
    )

    def step(acc, x):
        nr = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        gl = F.length(x) - F.lit(joiner_chars)
        better = (nr > acc["bn"]) | (
            (nr == acc["bn"])
            & ((gl > acc["bl"]) | ((gl == acc["bl"]) & (x < acc["bg"])))
        )
        return F.struct(
            x.alias("prev"),
            nr.alias("run"),
            F.when(better, nr).otherwise(acc["bn"]).alias("bn"),
            F.when(better, gl).otherwise(acc["bl"]).alias("bl"),
            F.when(better, x).otherwise(acc["bg"]).alias("bg"),
            (acc["dup"] + F.when(nr > 1, gl).otherwise(F.lit(0))).alias("dup"),
        )

    return F.aggregate(
        sorted_grams,
        init,
        step,
        lambda acc: F.struct(
            acc["bn"].alias("bn"), acc["bl"].alias("bl"), acc["dup"].alias("dup")
        ),
    )


_TERMINAL_RE = '[.!?"]$'


def c4_clean(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_sentences: int = 5,
) -> DataFrame:
    """C4 cleaning heuristics (Raffel et al. 2020, §2.2) per document.

    Line level (first matching rule wins, counted separately):
    lines with <3 whitespace words are dropped as ``short``; surviving
    lines not ending in terminal punctuation (. ! ? \") are dropped as
    ``nopunct``; surviving lines containing "javascript" are dropped
    as ``js``.  Page level: ``c4_keep`` is false when the page
    contains "lorem ipsum" or a curly brace, or the cleaned text has
    fewer than ``min_sentences`` terminal punctuation marks.

    Entirely per-row native expressions — zero shuffle, zero Python.
    The cleaned text crosses the oracle gate as an md5 so no multi-KB
    strings enter the value hash.
    """
    def words(l: Column) -> Column:
        return F.size(F.filter(F.split(l, r"\s+"), lambda w: w != F.lit("")))

    def is_short(l: Column) -> Column:
        return words(l) < 3

    def no_punct(l: Column) -> Column:
        return ~l.rlike(_TERMINAL_RE)

    def has_js(l: Column) -> Column:
        return F.lower(l).contains("javascript")

    # Staged like gopher_quality: HOFs are CodegenFallback with no
    # subexpression elimination, so `lines` (6 refs) and `cleaned`
    # (3 refs) are aliased once per Project and referenced by
    # attribute downstream instead of being re-evaluated per use.
    staged = fan_out(docs).select(
        F.col(id_col),
        F.col(text_col).alias("_text"),
        F.transform(F.split(F.col(text_col), "\n"), F.trim).alias("_lines"),
    )
    lines = F.col("_lines")
    staged = staged.select(
        F.col(id_col),
        "_text",
        "_lines",
        F.array_join(
            F.filter(lines, lambda l: ~is_short(l) & ~no_punct(l) & ~has_js(l)),
            "\n",
        ).alias("_cleaned"),
    )
    text = F.col("_text")
    cleaned = F.col("_cleaned")
    sentence_count = F.length(cleaned) - F.length(
        F.regexp_replace(cleaned, r"[.!?]", "")
    )

    out = staged.select(
        F.col(id_col),
        F.size(lines).alias("line_count"),
        F.size(
            F.filter(lines, lambda l: ~is_short(l) & ~no_punct(l) & ~has_js(l))
        ).alias("kept_line_count"),
        F.size(F.filter(lines, is_short)).alias("short_dropped"),
        F.size(F.filter(lines, lambda l: ~is_short(l) & no_punct(l))).alias(
            "nopunct_dropped"
        ),
        F.size(
            F.filter(lines, lambda l: ~is_short(l) & ~no_punct(l) & has_js(l))
        ).alias("js_dropped"),
        sentence_count.alias("sentence_count"),
        F.lower(text).contains("lorem ipsum").alias("has_lorem"),
        text.contains("{").alias("has_brace"),
        F.md5(cleaned).alias("cleaned_md5"),
    )
    return out.withColumn(
        "c4_keep",
        ~F.col("has_lorem")
        & ~F.col("has_brace")
        & (F.col("sentence_count") >= min_sentences),
    )


def _ppm(num: Column, den: Column) -> Column:
    """round(num * 1e6 / den) as a long — both engines compute the
    IEEE-754 division on identical integers and round half away from
    zero, so the result is bit-deterministic cross-engine."""
    return F.round(num.cast("double") * F.lit(1_000_000.0) / den).cast("long")


def gopher_quality(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_cols: tuple = (),
) -> DataFrame:
    """Per-document Gopher repetition/quality metrics + keep flag.

    Output: one row per document with integer ppm repetition ratios,
    shape heuristics, and ``gopher_keep`` — true iff the document
    passes every published threshold in
    :data:`GOPHER_THRESHOLDS_PPM`.  ``keep_cols`` names input columns
    carried through unchanged (lets pipeline composition chain the
    flag onto a wider frame without a join back on the id).
    """
    # Staged evaluation, deliberately: higher-order functions are
    # CodegenFallback (interpreted — no whole-stage codegen, no
    # runtime subexpression elimination), so any HOF expression
    # referenced twice in one projection is EVALUATED twice. Each
    # heavy expression below is aliased exactly once per Project and
    # only its attribute is referenced downstream; CollapseProject
    # keeps the stages apart because the aliases are non-cheap and
    # multiply referenced. Measured 68x on sf0.1 documents (52.8 s →
    # 0.78 s full materialization) with byte-identical output.
    text = F.col("_text")
    toks = F.col("_toks")
    lines = F.col("_lines")
    staged = fan_out(docs).select(
        F.col(id_col),
        *keep_cols,
        F.col(text_col).alias("_text"),
        tokens_col(F.col(text_col)).alias("_toks"),
        F.filter(
            F.transform(F.split(F.col(text_col), "\n"), F.trim),
            lambda l: l != F.lit(""),
        ).alias("_lines"),
    )
    staged = staged.select(
        F.col(id_col),
        *keep_cols,
        "_text",
        "_toks",
        "_lines",
        F.array_distinct(lines).alias("_dlines"),
        F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t)).alias("_wchars"),
        F.aggregate(lines, F.lit(0), lambda a, l: a + F.length(l)).alias("_lchars"),
        _mode_run_fold(F.array_sort(_ngrams_col(toks, 2)), 1).alias("_m2"),
        _mode_run_fold(F.array_sort(_ngrams_col(toks, 3)), 2).alias("_m3"),
        _mode_run_fold(F.array_sort(_ngrams_col(toks, 4)), 3).alias("_m4"),
        _mode_run_fold(F.array_sort(_ngrams_col(toks, 5)), 4).alias("_m5"),
    )

    n_words = F.size(toks)
    wchars = F.col("_wchars")
    d_words = F.greatest(n_words, F.lit(1)).cast("double")
    d_wchars = F.greatest(wchars, F.lit(1)).cast("double")
    n_lines = F.size(lines)
    d_lines = F.greatest(n_lines, F.lit(1)).cast("double")
    lchars = F.col("_lchars")
    dlchars = F.aggregate(
        F.col("_dlines"), F.lit(0), lambda a, l: a + F.length(l)
    )

    ell_lines = F.size(
        F.filter(lines, lambda l: l.endswith("...") | l.endswith("…"))
    )
    bullet_lines = F.size(
        F.filter(
            lines,
            lambda l: F.substring(l, 1, 1).isin(*_BULLETS),
        )
    )
    alpha_words = F.size(F.filter(toks, lambda t: t.rlike("[a-z]")))
    hash_count = F.length(text) - F.length(F.regexp_replace(text, "#", ""))
    # '...' removals strip exactly 3 chars each, so the diff/3 below is
    # an exact integer-valued double
    ell_count = (
        F.length(text) - F.length(F.regexp_replace(text, r"\.\.\.", ""))
    ) / F.lit(3)

    mode2, mode3, mode4, mode5 = (
        F.col("_m2"), F.col("_m3"), F.col("_m4"), F.col("_m5")
    )

    out = staged.select(
        F.col(id_col),
        *keep_cols,
        n_words.alias("word_count"),
        _ppm(wchars, d_words).alias("mean_word_len_ppm"),
        n_lines.alias("line_count"),
        _ppm(n_lines - F.size("_dlines"), d_lines).alias("dup_line_ppm"),
        _ppm(lchars - dlchars, F.greatest(lchars, F.lit(1))).alias(
            "dup_line_char_ppm"
        ),
        _ppm(mode2["bn"] * mode2["bl"], d_wchars).alias("top2_char_ppm"),
        _ppm(mode3["bn"] * mode3["bl"], d_wchars).alias("top3_char_ppm"),
        _ppm(mode4["bn"] * mode4["bl"], d_wchars).alias("top4_char_ppm"),
        _ppm(mode5["dup"], d_wchars).alias("dup5_char_ppm"),
        _ppm(ell_lines, d_lines).alias("ellipsis_line_ppm"),
        _ppm(bullet_lines, d_lines).alias("bullet_line_ppm"),
        _ppm(alpha_words, d_words).alias("alpha_word_ppm"),
        _ppm(hash_count + ell_count, d_words).alias("symbol_word_ppm"),
    )
    t = GOPHER_THRESHOLDS_PPM
    keep = (
        F.col("word_count").between(t["min_words"], t["max_words"])
        & F.col("mean_word_len_ppm").between(
            t["min_mean_word_len_ppm"], t["max_mean_word_len_ppm"]
        )
        & (F.col("dup_line_ppm") <= t["max_dup_line_ppm"])
        & (F.col("dup_line_char_ppm") <= t["max_dup_line_char_ppm"])
        & (F.col("top2_char_ppm") <= t["max_top2_char_ppm"])
        & (F.col("top3_char_ppm") <= t["max_top3_char_ppm"])
        & (F.col("top4_char_ppm") <= t["max_top4_char_ppm"])
        & (F.col("dup5_char_ppm") <= t["max_dup5_char_ppm"])
        & (F.col("ellipsis_line_ppm") <= t["max_ellipsis_line_ppm"])
        & (F.col("bullet_line_ppm") <= t["max_bullet_line_ppm"])
        & (F.col("alpha_word_ppm") >= t["min_alpha_word_ppm"])
        & (F.col("symbol_word_ppm") <= t["max_symbol_word_ppm"])
    )
    return out.withColumn("gopher_keep", keep)


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
) -> DataFrame:
    """Benchmark n-gram decontamination (the GPT-3 appendix-C / PaLM
    pre-training hygiene pass): flag every training document that
    shares a word ``n``-gram with an evaluation/benchmark corpus, so
    eval examples can be scrubbed from the training set.

    Scale shape: the benchmark side is SMALL by construction (an eval
    set, not a corpus) — its distinct grams broadcast, so the corpus
    scan is shuffle-free up to the hit aggregation, and that shuffle
    carries only (doc_id, gram) HITS (rare), never the corpus's full
    gram stream. Grams are distinct-per-document, so
    ``contaminated_ngrams`` counts distinct shared grams.

    Output: ``(id_col, contaminated_ngrams, contam_keep)`` — one row
    per input document; ``contam_keep`` is true iff no benchmark gram
    occurs in the document.
    """
    bench_grams = (
        fan_out(benchmark)
        .select(tokens_col(F.col(bench_text_col)).alias("_toks"))
        .select(
            F.explode(
                F.array_distinct(_ngrams_col(F.col("_toks"), n))
            ).alias("gram")
        )
        .distinct()
    )
    doc_grams = (
        fan_out(docs)
        .select(F.col(id_col), tokens_col(F.col(text_col)).alias("_toks"))
        .select(
            F.col(id_col),
            F.explode(
                F.array_distinct(_ngrams_col(F.col("_toks"), n))
            ).alias("gram"),
        )
    )
    hits = (
        doc_grams.join(F.broadcast(bench_grams), "gram", "left_semi")
        .groupBy(id_col)
        .agg(F.count("*").alias("contaminated_ngrams"))
    )
    out = docs.select(id_col).join(hits, id_col, "left")
    contaminated = F.coalesce(F.col("contaminated_ngrams"), F.lit(0))
    return out.select(
        F.col(id_col),
        contaminated.alias("contaminated_ngrams"),
        (contaminated == 0).alias("contam_keep"),
    )


def _bucket_col(gram: Column, buckets: int) -> Column:
    """Hash a gram into [0, buckets) via the engine's md5→long scheme
    (first 60 bits of md5) — reproducible verbatim in DuckDB SQL and
    Python hashlib, so the oracle and the fit stage agree bit-for-bit."""
    return F.pmod(
        F.conv(F.substring(F.md5(gram), 1, 15), 16, 10).cast("long"),
        F.lit(buckets),
    )


def dsir_bucket_counts(
    corpus: DataFrame,
    n: int = 2,
    buckets: int = 1024,
    text_col: str = "text",
) -> DataFrame:
    """Hashed n-gram bucket histogram of a corpus — the sufficient
    statistic DSIR fits. One explode + ONE aggregate keyed by bucket:
    map-side partial combine collapses every partition to ≤``buckets``
    rows before the shuffle, so the exchange carries O(buckets ×
    partitions) rows no matter how many petabytes were scanned."""
    staged = fan_out(corpus).select(
        tokens_col(F.col(text_col)).alias("_toks")
    )
    return (
        staged.select(F.explode(_ngrams_col(F.col("_toks"), n)).alias("gram"))
        .select(_bucket_col(F.col("gram"), buckets).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("cnt"))
    )


def dsir_weights(
    docs: DataFrame,
    target: DataFrame,
    n: int = 2,
    buckets: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
    target_text_col: str = "text",
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every raw
    document by the log-likelihood ratio of its hashed n-gram features
    under the TARGET distribution vs the RAW distribution, with add-1
    smoothing. Positive score ⇒ the document looks more like the
    target domain than the average raw document.

    Scale shape: the fit is two bucket histograms (map-side-combined
    aggregates — the shuffle carries buckets, not grams); the two
    ≤``buckets``-row tables are collected (they would broadcast
    anyway), the per-bucket log-ratios become ONE literal array, and
    scoring is a narrow per-row projection — ``element_at`` lookups
    folded over the gram array, no join, no shuffle, nothing keyed.

    Output: ``(id_col, gram_count, score_ppm, dsir_keep)`` with
    ``score_ppm = round(score × 1e6)`` as a BIGINT (cross-engine
    hash-stable) and ``dsir_keep = score_ppm > 0``.
    """
    import math

    raw_rows = dsir_bucket_counts(docs, n, buckets, text_col).collect()
    tgt_rows = dsir_bucket_counts(target, n, buckets, target_text_col).collect()
    rc = {r["bucket"]: r["cnt"] for r in raw_rows}
    tc = {r["bucket"]: r["cnt"] for r in tgt_rows}
    R = sum(rc.values())
    T = sum(tc.values())
    # ln((tc+1)(R+B) / ((rc+1)(T+B))): one libm log per bucket, done
    # driver-side on exact integer counts — DuckDB's ln reproduces it
    ratios = [
        math.log(
            (tc.get(b, 0) + 1.0) * (R + buckets)
            / ((rc.get(b, 0) + 1.0) * (T + buckets))
        )
        for b in range(buckets)
    ]
    ratio_arr = F.array(*[F.lit(r) for r in ratios])

    staged = fan_out(docs).select(
        F.col(id_col),
        tokens_col(F.col(text_col)).alias("_toks"),
    )
    staged = staged.select(
        F.col(id_col), _ngrams_col(F.col("_toks"), n).alias("_grams")
    )
    grams = F.col("_grams")
    score = F.aggregate(
        F.transform(
            grams,
            lambda g: F.element_at(
                ratio_arr, (_bucket_col(g, buckets) + 1).cast("int")
            ),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    out = staged.select(
        F.col(id_col),
        F.size(grams).alias("gram_count"),
        F.round(score * F.lit(1_000_000.0)).cast("long").alias("score_ppm"),
    )
    return out.withColumn("dsir_keep", F.col("score_ppm") > 0)


def ccnet_ppl_buckets(
    docs: DataFrame,
    reference: DataFrame,
    bigram_buckets: int = 4096,
    context_buckets: int = 512,
    head_ppm: int = 4_000_000,
    tail_ppm: int = 6_000_000,
    id_col: str = "doc_id",
    text_col: str = "text",
    ref_text_col: str = "text",
) -> DataFrame:
    """CCNet-style language-model quality gate (Wenzek et al. 2020):
    score every document by its perplexity under an LM fit on a clean
    REFERENCE corpus (CCNet uses a Wikipedia KenLM; here a hashed
    bigram model with add-1 smoothing — the sandbox has no KenLM, and
    a hashed LM keeps the fit a pair of map-side-combined histograms)
    and bucket the corpus into CCNet's ``head`` / ``middle`` /
    ``tail`` by fixed negative-log-likelihood cutoffs in ppm
    (``head`` = most reference-like). Cutoffs are parameters, not
    computed percentiles: cross-engine percentile interpolation is not
    hash-stable, and CCNet itself reuses frozen per-language cutoffs
    across shards.

    Model: ``P(w2 | w1) = (c(h2(w1 w2)) + 1) / (c(h1(w1)) + B2)`` with
    bigram/context counts hashed into ``bigram_buckets`` / and
    ``context_buckets``; a document's score is the mean negative log
    probability over its bigrams (natural log, ppm-scaled BIGINT).

    Scale shape mirrors ``dsir_weights``: the fit shuffles only bucket
    ids (≤B rows per partition after partial combine); both count
    tables become literal arrays; scoring is a per-row fold —
    ``element_at`` lookups, no join, no shuffle. Documents with no
    bigram get ``nll_ppm NULL`` and bucket ``'short'``.

    Output: ``(id_col, bigram_count, nll_ppm, ppl_bucket)``.
    """
    import math

    if not 0 < head_ppm <= tail_ppm:
        raise ValueError("need 0 < head_ppm <= tail_ppm")

    big_rows = dsir_bucket_counts(
        reference, 2, bigram_buckets, ref_text_col
    ).collect()
    ctx_rows = dsir_bucket_counts(
        reference, 1, context_buckets, ref_text_col
    ).collect()
    bc = {r["bucket"]: r["cnt"] for r in big_rows}
    cc = {r["bucket"]: r["cnt"] for r in ctx_rows}
    # -ln P per bucket pair is separable: nll(b2, b1) =
    # ln(c1(b1) + B2) - ln(c2(b2) + 1) — two literal arrays, one
    # element_at each per gram
    big_arr = F.array(
        *[F.lit(math.log(bc.get(b, 0) + 1.0)) for b in range(bigram_buckets)]
    )
    ctx_arr = F.array(
        *[
            F.lit(math.log(cc.get(b, 0) + float(bigram_buckets)))
            for b in range(context_buckets)
        ]
    )

    staged = fan_out(docs).select(
        F.col(id_col), tokens_col(F.col(text_col)).alias("_toks")
    )
    staged = staged.select(
        F.col(id_col),
        _ngrams_col(F.col("_toks"), 2).alias("_bi"),
        F.col("_toks").alias("_uni"),
    )
    # context unigram of bigram i is token i — slice the unigram array
    # to align (len(bi) = len(uni) - 1)
    nll_sum = F.aggregate(
        F.zip_with(
            F.col("_bi"),
            F.slice(F.col("_uni"), 1, F.greatest(F.size(F.col("_bi")), F.lit(0))),
            lambda b2, w1: F.element_at(
                ctx_arr, (_bucket_col(w1, context_buckets) + 1).cast("int")
            )
            - F.element_at(
                big_arr, (_bucket_col(b2, bigram_buckets) + 1).cast("int")
            ),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    n_bi = F.size(F.col("_bi"))
    nll_ppm = F.when(
        n_bi > 0, F.round(nll_sum / n_bi * F.lit(1_000_000.0)).cast("long")
    )
    out = staged.select(
        F.col(id_col),
        n_bi.alias("bigram_count"),
        nll_ppm.alias("nll_ppm"),
    )
    return out.withColumn(
        "ppl_bucket",
        F.when(F.col("nll_ppm").isNull(), F.lit("short"))
        .when(F.col("nll_ppm") <= head_ppm, F.lit("head"))
        .when(F.col("nll_ppm") <= tail_ppm, F.lit("middle"))
        .otherwise(F.lit("tail")),
    )


#: block-level tags whose open/close delimits a text block; inline
#: markup (a, span, em, strong, img, …) stays inside its block so link
#: density can be measured per block.
_BLOCK_SPLIT_RE = (
    r"(?i)</?(?:p|div|h[1-6]|li|ul|ol|dl|dt|dd|section|article|header|"
    r"footer|nav|aside|main|table|thead|tbody|tr|td|th|blockquote|pre|"
    r"form|fieldset|figure|figcaption|hr|br|body|html|head|title)\b[^>]*>"
)
_TAG_RE = r"<[^>]*>"
_ANCHOR_RE = r"(?is)<a\b[^>]*>(.*?)</a>"


def main_content(
    pages: DataFrame,
    id_col: str = "doc_id",
    html_col: str = "html",
    min_chars: int = 25,
    max_link_density_ppm: int = 500_000,
) -> DataFrame:
    """Boilerplate removal via block-level link-density classification —
    the shallow pass of jusText (Pomikálek 2011) / the geometry behind
    readability-style extractors, as pure Catalyst expressions.

    The page is split into text blocks at block-level tag boundaries
    (``_BLOCK_SPLIT_RE``); inline tags stay inside their block. A block
    survives iff its tag-stripped, whitespace-collapsed text has at
    least ``min_chars`` characters AND at most ``max_link_density_ppm``
    of those characters came from inside ``<a>`` elements (integer ppm,
    floor division — navigation, footers, tag clouds and pagination
    are mostly anchor text; body prose is not).

    Zero shuffle, zero Python — one Project per page regardless of
    block count. Emits per-page block counts plus the retained text's
    md5/length (full text never enters the oracle value hash).

    This complements the reference-parity selector cascades
    (extract/content.py, reference content.py:829-862): those target
    configured sites; this is the selector-free bulk path a 100 TB
    crawl runs when no site config exists.
    """
    def norm(b: Column) -> Column:
        return F.trim(
            F.regexp_replace(
                F.regexp_replace(b, _TAG_RE, " "), r"\s+", " "
            )
        )

    def anchor_len(b: Column) -> Column:
        return F.aggregate(
            F.regexp_extract_all(b, F.lit(_ANCHOR_RE), 1),
            F.lit(0),
            lambda acc, a: acc + F.length(norm(a)),
        )

    staged = fan_out(pages).select(
        F.col(id_col),
        F.split(F.col(html_col).cast("string"), _BLOCK_SPLIT_RE).alias("_raw"),
    )
    staged = staged.select(
        F.col(id_col),
        F.filter(
            F.transform(
                F.col("_raw"),
                lambda b: F.struct(
                    norm(b).alias("txt"), anchor_len(b).alias("alen")
                ),
            ),
            lambda s: s["txt"] != F.lit(""),
        ).alias("_blocks"),
    )
    blocks = F.col("_blocks")

    def linky(s: Column) -> Column:
        # link density in integer ppm, floor-divided (the double
        # division is exact-then-truncated: ints ≤ 1e15 are exact in
        # a double and the remainder term 1/len dwarfs double spacing
        # at 1e6 magnitudes, so cast-to-long == floor == DuckDB `//`)
        return (
            (s["alen"].cast("long") * 1_000_000) / F.length(s["txt"])
        ).cast("long") > max_link_density_ppm

    def keep(s: Column) -> Column:
        return (F.length(s["txt"]) >= min_chars) & ~linky(s)

    kept = F.filter(blocks, keep)
    content = F.array_join(F.transform(kept, lambda s: s["txt"]), "\n")
    return staged.select(
        F.col(id_col),
        F.size(blocks).alias("n_blocks"),
        F.size(kept).alias("kept_blocks"),
        F.size(
            F.filter(blocks, lambda s: F.length(s["txt"]) < min_chars)
        ).alias("dropped_short"),
        F.size(
            F.filter(
                blocks,
                lambda s: (F.length(s["txt"]) >= min_chars) & linky(s),
            )
        ).alias("dropped_linky"),
        F.length(content).alias("content_len"),
        F.md5(content).alias("content_md5"),
    )


def host_priors(
    docs: DataFrame,
    host_col: str = "host",
    keep_col: str = "keep",
    lang_col: str = "lang",
) -> DataFrame:
    """Host-level quality priors from per-document verdicts — the
    aggregation that turns any row-level gate (``gopher_keep``,
    ``c4_clean``, a classifier score) into a FRONTIER signal: hosts
    whose existing documents mostly fail quality gates should stop
    winning dequeue slots (feed this into
    ``frontier.core.dequeue(host_priority=...)`` exactly like the
    PageRank table; spam farms are cheaper to stop fetching than to
    filter after fetching).

    Returns one row per host:

      (host, n_docs, n_kept, keep_ppm, top_lang)

    ``keep_ppm`` is an exact integer floor division (kept·10^6 div
    n_docs); ``top_lang`` is the modal language with ties broken
    lexicographically — both deterministic under any partitioning.

    Scale shape: one (host, lang) aggregate, then one host aggregate
    with a max-struct modal pick — two map-side-combined exchanges,
    no window over the corpus.
    """
    per_lang = docs.groupBy(
        F.col(host_col).alias("host"), F.col(lang_col).alias("_lang")
    ).agg(
        F.count("*").alias("_n"),
        F.sum(F.col(keep_col).cast("long")).alias("_kept"),
    )
    # modal language: min over (-count, lang) structs — the smallest
    # negated count is the largest count, ties fall through to the
    # lexicographically smallest language code
    picked = per_lang.groupBy("host").agg(
        F.sum("_n").alias("n_docs"),
        F.sum("_kept").alias("n_kept"),
        F.min(F.struct((-F.col("_n")).alias("_neg"), F.col("_lang"))).alias(
            "_top"
        ),
    ).withColumn("top_lang", F.col("_top._lang"))
    return picked.select(
        "host",
        "n_docs",
        "n_kept",
        F.expr("(n_kept * 1000000) div n_docs").cast("long").alias("keep_ppm"),
        "top_lang",
    )


def host_boilerplate(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    min_pages: int = 5,
    frac_threshold_ppm: int = 500_000,
) -> DataFrame:
    """Statistical per-host boilerplate detection — the cross-page
    complement of :func:`main_content`'s per-page geometry: a text
    block that appears on most of a host's pages is chrome
    (navigation, footers, cookie banners) no matter how prose-like it
    reads. This is the CCNet/host-level variant of paragraph dedup:
    classify once per (host, block), then strip corpus-wide by md5
    join.

    Blocks are the same tag-boundary units as ``main_content``
    (``_BLOCK_SPLIT_RE``), normalized and deduplicated WITHIN a page
    (a sidebar repeated twice on one page counts once). Returns one
    row per (host, block):

      (host, block_md5, block_pages, host_pages, frac_ppm,
       is_boilerplate)

    with ``frac_ppm`` an exact integer floor division and the verdict
    requiring ``host_pages >= min_pages`` (a 2-page host proves
    nothing).

    Scale shape: one (host, block_md5) aggregate + one host-count
    aggregate joined back on host — both map-side combined; the pages
    table is scanned once and html never shuffles (only md5s do).
    """
    def norm(b: Column) -> Column:
        return F.trim(
            F.regexp_replace(F.regexp_replace(b, _TAG_RE, " "), r"\s+", " ")
        )

    host = F.coalesce(
        F.try_parse_url(F.col(url_col), F.lit("HOST")), F.lit("")
    )
    blocks = fan_out(pages).select(
        host.alias("host"),
        F.col(url_col).alias("_url"),
        F.array_distinct(
            F.filter(
                F.transform(
                    F.split(F.col(html_col).cast("string"), _BLOCK_SPLIT_RE),
                    lambda b: F.md5(norm(b)),
                ),
                lambda h: h != F.md5(F.lit("")),
            )
        ).alias("_hashes"),
    )
    exploded = blocks.select(
        "host", "_url", F.explode("_hashes").alias("block_md5")
    )
    per_block = exploded.groupBy("host", "block_md5").agg(
        F.count("*").alias("block_pages")
    )
    per_host = blocks.groupBy("host").agg(F.count("*").alias("host_pages"))
    out = per_block.join(per_host, "host")
    frac = F.expr("(block_pages * 1000000) div host_pages").cast("long")
    return out.select(
        "host",
        "block_md5",
        "block_pages",
        "host_pages",
        frac.alias("frac_ppm"),
        (
            (F.col("host_pages") >= min_pages)
            & (frac >= frac_threshold_ppm)
        ).alias("is_boilerplate"),
    )


def distribution_drift(
    df: DataFrame,
    group_col: str,
    bucket_col: str,
    ref_group,
) -> DataFrame:
    """Corpus-mix drift monitor: how far each group's bucket
    distribution has moved from a reference group's, as an exact
    integer total-variation distance in ppm.

    The production question this answers: "did this crawl epoch's
    quality/language/source mix shift against the baseline?" — the
    dashboard stat C4/RefinedWeb-style pipelines watch before letting
    a new snapshot into the training mix. Total variation (half the
    L1 distance between the two share vectors) is used instead of
    PSI/KL because it needs no logarithm: with shares floored to ppm
    the whole statistic stays in integers, so the result is bit-exact
    under any partitioning and SQL-replayable.

    Output: one row per (group, bucket) over the FULL grid (absent
    combinations count 0, so a vanished bucket shows as drift)::

      (group, bucket, n, share_ppm, ref_share_ppm, abs_diff_ppm,
       tv_ppm)

    ``tv_ppm`` repeats per group: floor(Σ_buckets |Δshare| / 2) —
    0 = identical mix, 1_000_000 = disjoint support.

    Scale shape: one (group, bucket) count aggregate (map-side
    combined) is the only pass over the data; the grid, shares, and
    reference join all run on aggregate-sized tables (groups ×
    buckets), broadcast back.
    """
    counts = df.groupBy(
        F.col(group_col).alias("group"), F.col(bucket_col).alias("bucket")
    ).agg(F.count("*").cast("long").alias("n"))

    grid = counts.select("group").distinct().crossJoin(
        counts.select("bucket").distinct()
    )
    full = grid.join(counts, ["group", "bucket"], "left").fillna(0, ["n"])
    totals = full.groupBy("group").agg(F.sum("n").alias("_total"))
    shares = full.join(F.broadcast(totals), "group").select(
        "group",
        "bucket",
        "n",
        F.floor(F.col("n") * 1_000_000 / F.greatest(F.col("_total"), F.lit(1)))
        .cast("long")
        .alias("share_ppm"),
    )
    ref = shares.filter(F.col("group") == F.lit(ref_group)).select(
        "bucket", F.col("share_ppm").alias("ref_share_ppm")
    )
    j = shares.join(F.broadcast(ref), "bucket").withColumn(
        "abs_diff_ppm",
        F.abs(F.col("share_ppm") - F.col("ref_share_ppm")).cast("long"),
    )
    tv = j.groupBy("group").agg(
        F.floor(F.sum("abs_diff_ppm") / 2).cast("long").alias("tv_ppm")
    )
    return j.join(F.broadcast(tv), "group").select(
        "group", "bucket", "n", "share_ppm", "ref_share_ppm",
        "abs_diff_ppm", "tv_ppm",
    )


def compression_ratio(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    level: int = 6,
    min_ratio_ppm: int = 250_000,
    max_ratio_ppm: int = 1_000_000,
) -> DataFrame:
    """zlib compression ratio as a quality signal — the cheap
    model-free complement to :func:`gopher_quality`'s explicit
    repetition counters and :func:`ccnet_ppl_buckets`'s LM: machine-
    generated/templated spam compresses far below natural prose, byte
    junk compresses above it (RedPajama-v2 ships this same signal).

    Per doc::

      (id, raw_len, comp_len, ratio_ppm, keep_compress)

    ``ratio_ppm = comp_len * 1e6 // raw_len`` (empty docs: -1, never
    NULL — ints stay ints across the oracle boundary) and
    ``keep_compress`` gates on [min_ratio_ppm, max_ratio_ppm].

    Python is justified here the same way NFC was for
    ``unicode_clean``: Spark has no zlib expression, so this is ONE
    Arrow ``mapInPandas`` projection (no shuffle, fixed ``level`` so
    output is a pure function of the bytes). DEFLATE output is defined
    by the zlib algorithm at a fixed level — the sequential oracle
    twin recomputes it with the same stdlib.
    """
    import zlib

    schema = (
        f"{id_col} long, raw_len long, comp_len long, "
        "ratio_ppm long, keep_compress boolean"
    )

    def run(batches):
        import pandas as pd

        for pdf in batches:
            ids, raws, comps, ratios, keeps = [], [], [], [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                raw = (text or "").encode("utf-8")
                comp = zlib.compress(raw, level)
                ratio = (
                    len(comp) * 1_000_000 // len(raw) if raw else -1
                )
                ids.append(doc_id)
                raws.append(len(raw))
                comps.append(len(comp))
                ratios.append(ratio)
                keeps.append(min_ratio_ppm <= ratio <= max_ratio_ppm)
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "raw_len": raws,
                    "comp_len": comps,
                    "ratio_ppm": ratios,
                    "keep_compress": keeps,
                }
            )

    from .partitioning import fan_out

    return fan_out(docs.select(id_col, text_col)).mapInPandas(
        run, schema=schema
    )


def corpus_card(
    docs: DataFrame,
    *,
    group_cols: tuple = ("lang", "source"),
    text_col: str = "text",
) -> DataFrame:
    """Corpus datasheet — the per-(lang, source) summary a dataset
    card publishes and a mixing recipe (``layout.mix_sources``) is
    tuned against::

      (group..., n_docs, total_chars, total_tokens,
       max_tokens, median_tokens)

    All integer (median = LOW median: smallest token count whose
    cumulative doc count reaches ceil(n/2)), so the report is
    hash-exact across engines.

    Scale shape — the token-budget histogram trick again: docs reduce
    to a (group, token_count) HISTOGRAM in one map-side-combined
    aggregate, and everything else (totals, max, the median's
    cumulative window) runs on histogram rows — distinct-value sized,
    never corpus sized. No corpus-wide window, no skew exposure on
    hot groups.
    """
    gc = list(group_cols)
    tok = F.size(
        F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != F.lit(""))
    ).cast("long")
    base = docs.select(
        *gc, tok.alias("tok"), F.length(text_col).cast("long").alias("chars")
    )
    hist = base.groupBy(*gc, "tok").agg(
        F.count("*").alias("c"), F.sum("chars").alias("ch")
    )
    agg = hist.groupBy(*gc).agg(
        F.sum("c").alias("n_docs"),
        F.sum("ch").alias("total_chars"),
        F.sum(F.col("c") * F.col("tok")).alias("total_tokens"),
        F.max("tok").alias("max_tokens"),
    )
    w = (
        Window.partitionBy(*gc)
        .orderBy("tok")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.withColumn("cum", F.sum("c").over(w))
    med = (
        cum.join(agg.select(*gc, "n_docs"), gc)
        .filter(F.col("cum") * 2 >= F.col("n_docs"))
        .groupBy(*gc)
        .agg(F.min("tok").alias("median_tokens"))
    )
    return agg.join(med, gc).select(
        *gc,
        "n_docs",
        "total_chars",
        "total_tokens",
        "max_tokens",
        "median_tokens",
    )


def embedding_decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bench_vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-space benchmark decontamination — the semantic
    complement of the word-n-gram :func:`decontaminate`: flag every
    training item whose embedding is cosine-close to ANY evaluation
    vector (paraphrased or reformatted eval leakage that shares no
    exact n-gram still lands near the eval point in embedding space —
    the contamination mode n-gram matching misses).

    Scale shape: the benchmark side is an eval set (thousands of rows,
    not a corpus) — it BROADCASTS; the corpus is scanned exactly once
    through a broadcast nested-loop scoring pass (O(N·B) multiply-adds
    map-side, the same arithmetic an ANN pre-filter would do), and the
    only shuffle carries (id, hit) rows for the RARE above-threshold
    matches. No pair materialization at corpus scale.

    Output: (id_col, n_bench_hits, contam_keep) — one row per doc;
    ``contam_keep`` is true iff no benchmark vector clears the
    threshold.
    """
    from .dedup import cosine_col

    bench = benchmark.select(F.col(bench_vec_col).alias("_bvec"))
    scored = (
        fan_out(docs)
        .select(F.col(id_col), F.col(vec_col).alias("_cvec"))
        .join(F.broadcast(bench))
        .select(
            id_col,
            cosine_col(F.col("_cvec"), F.col("_bvec")).alias("_cos"),
        )
    )
    hits = (
        scored.filter(F.col("_cos") >= threshold)
        .groupBy(id_col)
        .agg(F.count("*").alias("n_bench_hits"))
    )
    return docs.select(id_col).join(hits, id_col, "left").select(
        id_col,
        F.coalesce(F.col("n_bench_hits"), F.lit(0)).cast("long").alias(
            "n_bench_hits"
        ),
        F.col("n_bench_hits").isNull().alias("contam_keep"),
    )


def perceptron_doc_features(
    docs: DataFrame,
    label_col: str,
    buckets: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Doc-grain hashed bag-of-words for the batch perceptron: one row
    per document with ``y`` (+1/-1 from the boolean/int ``label_col``)
    and ``feats`` = array<struct<bucket,x>> of hashed-unigram counts,
    plus a constant bias feature at bucket index ``buckets``. The
    engine's md5→long bucket scheme (:func:`_bucket_col`) keeps the
    hashing bit-identical to the DuckDB oracle."""
    staged = fan_out(docs).select(
        F.col(id_col),
        F.when(F.col(label_col).cast("boolean"), F.lit(1))
        .otherwise(F.lit(-1))
        .cast("long")
        .alias("y"),
        tokens_col(F.col(text_col)).alias("_toks"),
    )
    counted = (
        staged.select(id_col, "y", F.explode("_toks").alias("gram"))
        .select(id_col, "y", _bucket_col(F.col("gram"), buckets).alias("bucket"))
        .groupBy(id_col, "y", "bucket")
        .agg(F.count("*").cast("long").alias("x"))
    )
    return counted.groupBy(id_col, "y").agg(
        F.array_append(
            F.collect_list(F.struct(F.col("bucket"), F.col("x"))),
            F.struct(
                F.lit(buckets).cast("long").alias("bucket"),
                F.lit(1).cast("long").alias("x"),
            ),
        ).alias("feats")
    )


def perceptron_train(
    docs: DataFrame,
    label_col: str,
    iters: int = 3,
    buckets: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict:
    """Train a quality-gate text classifier IN Spark: the batch
    perceptron over hashed bag-of-words — the distributed, exactly
    reproducible cousin of the fastText/FineWeb-Edu-style linear
    quality classifiers used to curate web corpora. Per iteration
    every currently misclassified document (y·margin ≤ 0) contributes
    y·x to the weights: order-independent (unlike the classic online
    perceptron) and pure INTEGER arithmetic end to end, so training is
    bit-reproducible across engines, partitionings and cluster sizes —
    the property that lets a DuckDB oracle replay it exactly.

    Scale shape: features are built once and cached at doc grain; each
    iteration is (1) a narrow projection scoring every doc against the
    weight vector as a LITERAL array (≤ buckets+1 longs — no join, no
    shuffle, stays in codegen exactly like DSIR's ratio lookup), and
    (2) one explode + map-side-combined aggregate over misclassified
    docs whose shuffle carries ≤ buckets+1 rows per partition. Driver
    holds only the model (buckets+1 longs), never data — the same
    driver-side-coefficients pattern MLlib's own LBFGS uses.

    Returns {"w": [long]*(buckets+1), "iters": iters, "buckets":
    buckets, "mistakes": [per-iteration misclassified counts]} — index
    ``buckets`` is the bias weight.
    """
    feats = perceptron_doc_features(
        docs, label_col, buckets=buckets, id_col=id_col, text_col=text_col
    ).persist()
    w = [0] * (buckets + 1)
    mistakes = []
    try:
        for _ in range(iters):
            warr = F.array(*[F.lit(int(v)).cast("long") for v in w])
            margin = F.aggregate(
                "feats",
                F.lit(0).cast("long"),
                lambda acc, f: acc + F.get(warr, f["bucket"]) * f["x"],
            )
            mis = feats.withColumn("_margin", margin).filter(
                F.col("y") * F.col("_margin") <= 0
            )
            delta = (
                mis.select("y", F.explode("feats").alias("f"))
                .groupBy(F.col("f.bucket").alias("bucket"))
                .agg(
                    F.sum(F.col("y") * F.col("f.x")).alias("dw"),
                    # bias bucket rows appear once per misclassified doc
                    F.sum(
                        F.when(F.col("f.bucket") == buckets, 1).otherwise(0)
                    ).alias("n"),
                )
                .collect()
            )
            n_mis = sum(r["n"] for r in delta)
            mistakes.append(int(n_mis))
            if n_mis == 0:
                break
            for r in delta:
                w[int(r["bucket"])] += int(r["dw"])
    finally:
        feats.unpersist()
    return {"w": w, "iters": iters, "buckets": buckets, "mistakes": mistakes}


def perceptron_score(
    docs: DataFrame,
    model: dict,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score documents with a trained perceptron model: integer margin
    per doc and ``perc_keep = margin > 0`` (the quality gate). A pure
    literal-array projection after the one feature aggregate — no
    join, no weight shuffle. Documents with zero tokens have no
    feature row and drop out (same contract as the feature builder)."""
    buckets = model["buckets"]
    tmp = docs.withColumn("_lbl", F.lit(True))
    feats = perceptron_doc_features(
        tmp, "_lbl", buckets=buckets, id_col=id_col, text_col=text_col
    )
    warr = F.array(*[F.lit(int(v)).cast("long") for v in model["w"]])
    margin = F.aggregate(
        "feats",
        F.lit(0).cast("long"),
        lambda acc, f: acc + F.get(warr, f["bucket"]) * f["x"],
    )
    return feats.select(
        F.col(id_col),
        margin.alias("margin"),
        (margin > 0).alias("perc_keep"),
    )
