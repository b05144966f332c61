"""Distributed text analytics (SURVEY.md §2.4 A1-A3, §2.8 F1-F13, plus
the training-data text ops the 100 TB pipeline needs: language-ID,
quality scoring, token counting, fingerprinting).

Everything here is built from native ``pyspark.sql.functions`` so the
whole stage stays inside whole-stage codegen — no Python in these hot
paths. Each op has an ANSI-SQL twin in ``__spark_entry__.oracle_sql``
checked against DuckDB at sf0.01.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..textutils import STOP_WORDS
from .partitioning import fan_out

# Stable, sorted stop-word list shared with the SQL oracles.
STOP_WORDS_SORTED = sorted(STOP_WORDS)

# Tiny per-language marker lexicons for the n-gram/stopword language-ID
# heuristic. Deterministic and SQL-expressible; precedence order breaks
# ties (en > de > fr > es).
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein"],
    "fr": ["le", "la", "les", "et", "est", "dans", "une", "pour"],
    "es": ["el", "la", "los", "y", "es", "en", "una", "para"],
}
LANG_ORDER = ["en", "de", "fr", "es"]

TOKEN_SPLIT_REGEX = r"[^a-z0-9_]+"
# BPE-ish token regex: word pieces OR single non-space punctuation
BPE_TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"


def clean_text_col(col: Column) -> Column:
    """F1 as native expressions (the distributed twin of
    textutils.clean_text; the byte-exact Python version runs inside
    extraction UDFs — this one serves SQL analytics)."""
    cleaned = F.regexp_replace(col, r"\s+", " ")
    cleaned = F.trim(cleaned)
    cleaned = F.regexp_replace(cleaned, "\u00A0", " ")
    cleaned = F.translate(cleaned, "“”‘’", "\"\"''")
    return F.regexp_replace(cleaned, r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]", "")


def tokens_col(text: Column) -> Column:
    """lower → split on non-word — A1's tokenizer (text.py:187)."""
    return F.filter(
        F.split(F.lower(text), TOKEN_SPLIT_REGEX), lambda t: t != F.lit("")
    )


def keyword_tokens_col(text: Column) -> Column:
    """A1's filter: drop stop words and len<=2 (text.py:190)."""
    stop = F.array(*[F.lit(w) for w in STOP_WORDS_SORTED])
    return F.filter(
        tokens_col(text),
        lambda t: (F.length(t) > 2) & ~F.array_contains(stop, t),
    )


def corpus_keywords_topk(docs: DataFrame, text_col: str = "text", k: int = 20) -> DataFrame:
    """A1 distributed: corpus-wide top-K keyword frequencies.

    explode → groupBy(word).count() gets a map-side partial aggregate
    from Catalyst; the final top-K is an orderBy+limit (TakeOrdered —
    no full sort shuffle). Ties break on word ascending so results are
    total-order deterministic.
    """
    words = fan_out(docs).select(
        F.explode(keyword_tokens_col(F.col(text_col))).alias("word")
    )
    counts = words.groupBy("word").agg(F.count("*").alias("freq"))
    return counts.orderBy(F.desc("freq"), F.asc("word")).limit(k)


def doc_keywords_topk(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 5
) -> DataFrame:
    """Per-document top-K keywords via a rank window (the reference
    computes this per document inside extraction, text.py:146-203)."""
    words = fan_out(docs).select(
        F.col(id_col),
        F.explode(keyword_tokens_col(F.col(text_col))).alias("word"),
    )
    counts = words.groupBy(id_col, "word").agg(F.count("*").alias("freq"))
    win = Window.partitionBy(id_col).orderBy(F.desc("freq"), F.asc("word"))
    return (
        counts.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
        .select(id_col, "word", "freq", "rank")
    )


def doc_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """A2/A3 + quality features: word count, reading time, char length,
    punctuation ratio, stop-word ratio, mean word length, and a
    composite quality score in [0,1]."""
    # tokenize ONCE into an attribute: tokens_col is a HOF chain
    # (CodegenFallback, no subexpression elimination) and is referenced
    # by three downstream aggregates — inline it and it runs 3x per row
    staged = fan_out(docs).select(
        F.col(id_col),
        F.col(text_col).alias("_text"),
        tokens_col(F.col(text_col)).alias("_toks"),
    )
    text = F.col("_text")
    toks = F.col("_toks")
    stop = F.array(*[F.lit(w) for w in STOP_WORDS_SORTED])
    n_words = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))
    n_chars = F.length(text)
    n_punct = n_chars - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    words_len = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    out = staged.select(
        F.col(id_col),
        n_words.alias("word_count"),
        F.greatest(
            F.lit(1), F.round(n_words.cast("double") / F.lit(200.0)).cast("int")
        ).alias("reading_time_min"),
        n_chars.alias("char_count"),
        F.round(n_punct.cast("double") / F.greatest(n_chars, F.lit(1)), 6).alias(
            "punct_ratio"
        ),
        F.round(
            n_stop.cast("double") / F.greatest(n_words, F.lit(1)), 6
        ).alias("stopword_ratio"),
        F.round(
            words_len.cast("double") / F.greatest(n_words, F.lit(1)), 6
        ).alias("mean_word_len"),
    )
    quality = (
        F.least(F.col("word_count").cast("double") / F.lit(100.0), F.lit(1.0)) * 0.4
        + (F.lit(1.0) - F.least(F.col("punct_ratio") * 5, F.lit(1.0))) * 0.3
        + F.least(F.col("stopword_ratio") * 3, F.lit(1.0)) * 0.3
    )
    return out.withColumn("quality_score", F.round(quality, 6))


def language_id(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_cols: tuple = (),
) -> DataFrame:
    """Marker-lexicon language ID: argmax of per-language marker hits
    with fixed precedence on ties.  ``keep_cols`` names input columns
    carried through unchanged (pipeline composition)."""
    # tokenize ONCE (see doc_stats): inlining tokens_col here would
    # re-split the text once per language in the marker loop
    staged = fan_out(docs).select(
        F.col(id_col), *keep_cols, tokens_col(F.col(text_col)).alias("_toks")
    )
    toks = F.col("_toks")

    def marker_hits(lang):
        markers = F.array(*[F.lit(w) for w in LANG_MARKERS[lang]])
        return F.size(F.filter(toks, lambda t: F.array_contains(markers, t)))

    scores = [marker_hits(lang).alias(f"score_{lang}") for lang in LANG_ORDER]
    scored = staged.select(F.col(id_col), *keep_cols, *scores)
    best = F.greatest(*[F.col(f"score_{lang}") for lang in LANG_ORDER])
    pred = F.when(best == 0, F.lit("und"))
    for lang in LANG_ORDER:
        pred = pred.when(F.col(f"score_{lang}") == best, F.lit(lang))
    return scored.select(
        id_col,
        *keep_cols,
        *[f"score_{lang}" for lang in LANG_ORDER],
        pred.alias("lang_pred"),
    )


def paragraph_language_id(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_lang: str = "en",
) -> DataFrame:
    """CCNet-style paragraph-grain language split (Wenzek et al. 2020
    §3.2 run LID below document grain, so a multilingual page
    contributes its target-language paragraphs instead of being kept
    or dropped wholesale — document-grain :func:`language_id` can't
    express that).

    Explodes newline paragraphs (:func:`~..dedup.paragraph_dedup`'s
    grain), scores each with the marker lexicon (language_id's argmax
    + LANG_ORDER tie precedence, 'und' when no marker hits), and
    reassembles per doc: ``text_kept`` is the ``keep_lang`` paragraphs
    re-joined by newline in document order ('' when none survive).
    ``doc_lang`` is the majority paragraph language (argmax over
    paragraph counts with the same precedence; 'und' when no paragraph
    scored).

    Output: (doc_id, n_paras, n_kept, n_en, n_de, n_fr, n_es,
    doc_lang, text_kept).

    Scale: one explode, per-paragraph scoring entirely in codegen (no
    Python), ONE doc-keyed exchange for the reassembly aggregate.
    Paragraph text crosses that exchange once (unavoidable — the
    output contains it); scores cross as longs. No window, no join.
    """
    paras = (
        fan_out(docs)
        .select(
            F.col(id_col),
            F.posexplode(F.split(F.col(text_col), "\n")).alias(
                "para_idx", "para"
            ),
        )
        .withColumn("para", F.trim(F.col("para")))
        .filter(F.col("para") != "")
    )
    toks = tokens_col(F.col("para"))

    def marker_hits(lang):
        markers = F.array(*[F.lit(w) for w in LANG_MARKERS[lang]])
        return F.size(F.filter(toks, lambda t: F.array_contains(markers, t)))

    scored = paras.select(
        F.col(id_col), "para_idx", "para",
        *[marker_hits(lang).alias(f"s_{lang}") for lang in LANG_ORDER],
    )
    best = F.greatest(*[F.col(f"s_{lang}") for lang in LANG_ORDER])
    pred = F.when(best == 0, F.lit("und"))
    for lang in LANG_ORDER:
        pred = pred.when(F.col(f"s_{lang}") == best, F.lit(lang))
    tagged = scored.withColumn("para_lang", pred)

    kept_struct = F.when(
        F.col("para_lang") == keep_lang, F.struct("para_idx", "para")
    )
    agg = tagged.groupBy(id_col).agg(
        F.count("*").alias("n_paras"),
        F.sum((F.col("para_lang") == keep_lang).cast("long")).alias("n_kept"),
        *[
            F.sum((F.col("para_lang") == lang).cast("long")).alias(f"n_{lang}")
            for lang in LANG_ORDER
        ],
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(F.collect_list(kept_struct)),
                lambda s: s["para"],
            ),
        ).alias("text_kept"),
    )
    doc_best = F.greatest(*[F.col(f"n_{lang}") for lang in LANG_ORDER])
    doc_lang = F.when(doc_best == 0, F.lit("und"))
    for lang in LANG_ORDER:
        doc_lang = doc_lang.when(F.col(f"n_{lang}") == doc_best, F.lit(lang))
    return agg.select(
        id_col, "n_paras", "n_kept",
        *[f"n_{lang}" for lang in LANG_ORDER],
        doc_lang.alias("doc_lang"),
        "text_kept",
    )


def intra_doc_line_dedup(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """RefinedWeb-style line-wise correction (Penedo et al. 2023 §3.3
    run it after their filters): strip lines REPEATED WITHIN the same
    document — headers re-rendered between sections, pagination chrome,
    repeated CTAs — keeping each line's first occurrence in document
    order. Distinct from cross-corpus :func:`~..dedup.paragraph_dedup`
    (this never compares across documents) and from C4's rule drops
    (which don't look at repetition).

    Lines are trimmed; blanks drop; the dedup key is the lowercase
    whitespace-normalized line, the KEPT line is the original trimmed
    bytes of its first occurrence.

    Output: (doc_id, n_lines, n_dropped, text_fixed).

    Scale: ZERO shuffles — one projection, per-row higher-order-
    function fold (seen-keys + kept-lines accumulator; membership is
    array_contains over a doc's distinct keys, O(L·D) per doc with
    both bounded by document size). No explode, no window, no join;
    whole-stage codegen end to end.
    """
    lines = F.filter(
        F.transform(
            F.split(F.col(text_col), "\n"), lambda raw: F.trim(raw)
        ),
        lambda l: l != F.lit(""),
    )
    norm = (
        lambda l: F.trim(F.regexp_replace(F.lower(l), r"\s+", " "))
    )
    empty_str = F.array().cast("array<string>")
    # stage the split/trim/filter chain once and pre-normalize each
    # line once — inlining `lines` into both n_lines and the fold (and
    # norm(l) into both fold branches) re-runs the whole text pass
    # per use inside one projection
    pairs = F.transform(
        F.col("_lines"),
        lambda l: F.struct(l.alias("raw"), norm(l).alias("key")),
    )
    folded = F.aggregate(
        pairs,
        F.struct(
            empty_str.alias("seen"), empty_str.alias("out")
        ),
        lambda acc, p: F.when(
            F.array_contains(acc["seen"], p["key"]),
            acc,
        ).otherwise(
            F.struct(
                F.concat(acc["seen"], F.array(p["key"])).alias("seen"),
                F.concat(acc["out"], F.array(p["raw"])).alias("out"),
            )
        ),
    )
    return docs.select(
        F.col(id_col), lines.alias("_lines")
    ).select(
        F.col(id_col),
        F.size("_lines").cast("long").alias("n_lines"),
        folded.alias("_f"),
    ).select(
        id_col,
        "n_lines",
        (F.col("n_lines") - F.size("_f.out")).cast("long").alias("n_dropped"),
        F.concat_ws("\n", F.col("_f.out")).alias("text_fixed"),
    )


def token_count_bpe(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """BPE-ish token counting: words + digit runs + punctuation marks.
    Uses regexp_extract_all with an RE2-safe pattern (no lookarounds) so
    the DuckDB oracle is expression-identical."""
    return fan_out(docs).select(
        F.col(id_col),
        F.size(
            F.regexp_extract_all(F.col(text_col), F.lit(BPE_TOKEN_REGEX), 0)
        ).alias("bpe_token_count"),
        F.size(tokens_col(F.col(text_col))).alias("word_token_count"),
    )


def fingerprint(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 of the whitespace/case-normalized text
    (md5 is bit-identical in Spark and DuckDB → exact SQL oracle)."""
    normalized = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    return fan_out(docs).select(
        F.col(id_col), F.md5(normalized).alias("fingerprint")
    )


WINNOW_MOD = 2147483647  # 2^31-1, the engine's shared md5→long modulus


def winnow_fingerprints(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    w: int = 4,
) -> DataFrame:
    """Local document fingerprints by winnowing (Schleimer, Wilkerson,
    Aiken, SIGMOD'03 — the MOSS algorithm): hash every k-gram (word
    shingle), slide a window of ``w`` consecutive hashes, keep each
    window's minimum. Guarantees any shared run of ≥ w+k-1 tokens
    between two documents yields at least one shared fingerprint —
    the partial-overlap detector that a whole-document digest can't be.

    All native expressions: the shingle hash is the engine's standard
    ``md5 → first 60 bits → mod 2^31-1`` (bit-identical in DuckDB for
    the exact SQL oracle), the window minima come from
    ``transform(sequence(...)) → array_min(slice(...))`` — O(m·w) per
    doc with w small, no shuffle, whole-stage codegen. Output: one row
    per distinct fingerprint, (id, fp) — the set form used for
    overlap joins (docs sharing a fp are plagiarism/near-dup
    candidates via a plain equality self-join, never a cross join).
    """
    from .dedup import ordered_shingles_col

    hash_expr = F.transform(
        ordered_shingles_col(text_col, k),
        lambda s: F.pmod(
            F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long"),
            F.lit(WINNOW_MOD),
        ),
    )
    # Materialize the hash array in its own projection: every window's
    # array_min(slice(...)) references it, and an inlined expression
    # would recompute all m md5s per window — O(m²) per doc. As a
    # non-cheap alias with multiple references, CollapseProject keeps
    # the projection, so the md5 pass runs once per row.
    hashed = fan_out(docs).select(F.col(id_col), hash_expr.alias("_h"))
    hashes = F.col("_h")
    m = F.size(hashes)
    # windows exist only when m >= w; shorter docs contribute their
    # global minimum (the standard degenerate case)
    mins = F.when(
        m >= w,
        F.transform(
            F.sequence(F.lit(1), m - (w - 1)),
            lambda i: F.array_min(F.slice(hashes, i, w)),
        ),
    ).otherwise(
        F.when(m > 0, F.array(F.array_min(hashes))).otherwise(
            F.array().cast("array<bigint>")
        )
    )
    return hashed.select(
        F.col(id_col), F.explode(F.array_distinct(mins)).alias("fp")
    )


def winnow_overlap_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    w: int = 4,
    min_shared: int = 2,
    max_df: int = 50,
) -> DataFrame:
    """Partial-overlap candidate pairs from winnowing fingerprints:
    docs sharing ≥ ``min_shared`` fingerprints copied a run of text
    from each other (MOSS's pair report). An equality self-join on
    ``fp`` — never a cross join; the shuffle key is the fingerprint,
    so cost is Σ df(fp)² over fingerprints, bounded by dropping fps
    present in more than ``max_df`` docs (boilerplate n-grams — chrome,
    footers — carry no plagiarism signal and would otherwise make one
    hot fp a quadratic straggler at 100 TB).

    Returns (id_a, id_b, shared_fps), id_a < id_b.
    """
    fps = winnow_fingerprints(docs, id_col, text_col, k, w)
    rare = (
        fps.groupBy("fp")
        .agg(F.count("*").alias("_df"))
        .filter(F.col("_df") <= max_df)
        .select("fp")
    )
    fps = fps.join(rare, "fp")
    a = fps.select(F.col("fp"), F.col(id_col).alias("id_a"))
    b = fps.select(F.col("fp"), F.col(id_col).alias("id_b"))
    return (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").cast("long").alias("shared_fps"))
        .filter(F.col("shared_fps") >= min_shared)
    )


def excerpt_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    w: int = 4,
    containment_centi: int = 80,
    min_fps: int = 3,
    max_df: int = 50,
) -> DataFrame:
    """ASYMMETRIC containment on winnow fingerprints: doc E is an
    excerpt of doc S when (nearly) all of E's fingerprints also occur
    in S. Jaccard-style near-dup misses this case entirely — a 100-word
    quote inside a 10,000-word page has tiny symmetric similarity but
    ~100 containment — and training pipelines care: excerpts double-
    count the quoted passage, and quote+commentary pages shouldn't be
    collapsed as "duplicates" of their source (so this is a separate
    signal from MinHash, not a replacement).

    Containment = shared / |fps(E)| over the df-GATED fingerprint set
    (boilerplate fps a hot gate removed can't be required of the
    source either), scaled to integer centi. Directional output:
    (excerpt_id, source_id, shared_fps, n_fps_excerpt,
    containment_centi); mutual near-dups appear in both directions.

    Scale shape: identical to :func:`winnow_overlap_pairs` — one
    fp-keyed equality self-join bounded by the ``max_df`` gate, one
    map-side-combined pair aggregate, plus one join against the
    doc-grained size table (AQE broadcasts it when small).
    """
    # winnow_fingerprints already emits one row per distinct (id, fp)
    # — no dedup aggregate needed (winnow_overlap_pairs relies on the
    # same producer contract)
    fps = winnow_fingerprints(docs, id_col, text_col, k, w)
    rare = (
        fps.groupBy("fp")
        .agg(F.count("*").alias("_df"))
        .filter(F.col("_df") <= max_df)
        .select("fp")
    )
    gated = fps.join(rare, "fp")
    sizes = gated.groupBy(id_col).agg(F.count("*").alias("n_fps_excerpt"))
    a = gated.select("fp", F.col(id_col).alias("excerpt_id"))
    b = gated.select("fp", F.col(id_col).alias("source_id"))
    shared = (
        a.join(b, "fp")
        .filter(F.col("excerpt_id") != F.col("source_id"))
        .groupBy("excerpt_id", "source_id")
        .agg(F.count("*").cast("long").alias("shared_fps"))
    )
    return (
        shared.join(
            sizes.select(
                F.col(id_col).alias("excerpt_id"), "n_fps_excerpt"
            ),
            "excerpt_id",
        )
        .withColumn(
            "containment_centi",
            F.floor(
                F.col("shared_fps") * 100 / F.col("n_fps_excerpt")
            ).cast("long"),
        )
        .filter(
            (F.col("n_fps_excerpt") >= min_fps)
            & (F.col("containment_centi") >= containment_centi)
        )
        .select(
            "excerpt_id",
            "source_id",
            "shared_fps",
            "n_fps_excerpt",
            "containment_centi",
        )
    )


# ---------------------------------------------------------------------------
# PII redaction — the scrub stage every web-text training pipeline runs
# before tokenization. Patterns are RE2-safe (no lookaround, no
# backrefs) so Spark's java.util.regex and DuckDB's RE2 agree exactly,
# giving this op a hash-exact SQL oracle. Precedence chain matters and
# is part of the contract: email → credit-card → ip → phone (the CC
# pattern would otherwise be eaten group-wise by the phone pattern, and
# IP octets by phone digit runs).
# ---------------------------------------------------------------------------

PII_STAGES = (
    # (name, pattern, replacement) — applied IN ORDER, each stage
    # counting matches on the text as left by the previous stage
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("cc", r"\b\d{4}[ -]\d{4}[ -]\d{4}[ -]\d{4}\b", "<CC>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\(\d{3}\) ?\d{3}-\d{4}|\+\d{1,2}[ -]\d{3}[ -]\d{3}[ -]\d{4}\b", "<PHONE>"),
)


def pii_redact(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Redact emails / credit cards / IPv4s / phone numbers to typed
    placeholders and count each kind — one narrow projection, all
    native ``regexp_count``/``regexp_replace`` (whole-stage codegen; at
    100 TB this runs as a map-only stage with zero shuffle).

    Returns (id, redacted, n_email, n_cc, n_ip, n_phone).
    """
    cur: Column = F.col(text_col)
    counts = []
    for name, pat, tag in PII_STAGES:
        counts.append(F.regexp_count(cur, F.lit(pat)).cast("long").alias(f"n_{name}"))
        cur = F.regexp_replace(cur, pat, tag)
    return fan_out(docs).select(
        F.col(id_col), cur.alias("redacted"), *counts
    )


# ---------------------------------------------------------------------------
# Validator predicates as native Column expressions (F7-F13)
# ---------------------------------------------------------------------------

EMAIL_REGEX = r"^[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}$"
EMAIL_BLACKLIST_REGEX = r"(?i)@(example|test|sample|invalid)\.com$"
IPV4_REGEX = r"^(\d{1,3})\.(\d{1,3})\.(\d{1,3})\.(\d{1,3})$"


def email_valid_col(col: Column) -> Column:
    """F7 (validators.py:16-48) as predicates."""
    return col.rlike(EMAIL_REGEX) & ~col.rlike(EMAIL_BLACKLIST_REGEX)


def phone_digits_col(col: Column) -> Column:
    """F8 digit-strip (validators.py:73)."""
    return F.regexp_replace(col, r"[^\d+]", "")


def phone_valid_col(col: Column) -> Column:
    """F8 core rules (length, intl, fake patterns) as predicates."""
    digits = phone_digits_col(col)
    n = F.length(digits)
    fake = (
        digits.rlike(r"^0{7,}$")
        | digits.rlike(r"^1{7,}$")
        | digits.rlike(r"^(.)\1{6,}$")
        | digits.rlike(r"^12345\d*$")
    )
    intl_short = digits.startswith("+") & (n < 8)
    return (n >= 7) & (n <= 15) & ~intl_short & ~fake


def url_valid_col(col: Column) -> Column:
    """F9 simplified to the pure-regex subset (scheme + domain shape +
    no localhost/IP + TLD>=2); the full urlparse port lives in
    validators.is_valid_url for UDF contexts."""
    scheme_ok = col.rlike(r"^(https?|ftp)://")
    host = F.lower(F.try_parse_url(col, F.lit("HOST")))
    domain_ok = host.rlike(
        r"^[a-z0-9]([a-z0-9\-]{0,61}[a-z0-9])?(\.[a-z0-9]([a-z0-9\-]{0,61}[a-z0-9])?)*$"
    )
    not_local = (host != "localhost") & ~host.rlike(r"^\d+\.\d+\.\d+\.\d+$")
    tld_ok = F.length(F.element_at(F.split(host, r"\."), -1)) >= 2
    return scheme_ok & domain_ok & not_local & tld_ok


def ip_valid_col(col: Column) -> Column:
    """F11 IPv4 (octet check) + simple IPv6."""
    octets_ok = (
        col.rlike(IPV4_REGEX)
        & (F.regexp_extract(col, IPV4_REGEX, 1).cast("int") <= 255)
        & (F.regexp_extract(col, IPV4_REGEX, 2).cast("int") <= 255)
        & (F.regexp_extract(col, IPV4_REGEX, 3).cast("int") <= 255)
        & (F.regexp_extract(col, IPV4_REGEX, 4).cast("int") <= 255)
    )
    ipv6 = col.rlike(r"^([0-9a-fA-F]{1,4}:){7}[0-9a-fA-F]{1,4}$")
    return octets_ok | ipv6


def date_valid_col(col: Column) -> Column:
    """F10: any of the reference's strptime formats parses
    (validators.py:190-201) via try-parse coalesce."""
    attempts = [
        F.try_to_timestamp(col, F.lit(fmt))
        for fmt in (
            "yyyy-MM-dd", "yyyy/MM/dd", "MM/dd/yyyy", "dd/MM/yyyy",
            "MM-dd-yyyy", "dd-MM-yyyy", "MMM d, yyyy", "d MMM yyyy",
            "MMMM d, yyyy", "d MMMM yyyy",
        )
    ]
    return F.coalesce(*attempts).isNotNull()


def price_parse_col(col: Column) -> Column:
    """F19/P4: first numeric group, comma→dot, cast double
    (ecommerce.py:307-327)."""
    num = F.regexp_extract(col, r"(\d+[.,]\d{2}|\d+)", 1)
    return F.when(num == "", None).otherwise(
        F.regexp_replace(num, ",", ".").cast("double")
    )


def availability_normalize_col(col: Column) -> Column:
    """P7 text patterns → canonical labels (ecommerce.py:393-405)."""
    low = F.lower(col)
    # NOTE: reference order checks "available" before "unavailable"
    # (ecommerce.py:393-398), so "unavailable" normalizes to "Available"
    # — we reproduce that faithfully.
    return (
        F.when(low.rlike(r"in\s*stock"), "In Stock")
        .when(low.rlike(r"out\s*of\s*stock"), "Out of Stock")
        .when(low.rlike(r"available"), "Available")
        .when(low.rlike(r"unavailable"), "Unavailable")
        .otherwise("Unknown")
    )


def bm25_term_weights(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 0,
) -> DataFrame:
    """Corpus-level BM25 term weights (Robertson/Spärck Jones, the
    Okapi BM25 ranking function) in EXACT integer arithmetic — the
    index-building twin of the per-document keyword extraction the
    reference ships (its keyword scores are per-page counts; BM25 is
    what the same signal looks like once a 100 TB corpus gives you
    real document frequencies).

    Standard BM25 with k1 = 6/5 (1.2) and b = 3/4 (0.75):

        idf(w)      = ln((N - df + 1/2) / (df + 1/2) + 1)
                    = ln(2(N+1) / (2·df + 1))        — exact rational
        score(d, w) = idf · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))

    Clearing denominators with avgdl = T/N (T = total corpus tokens)
    turns the tf normalization into a ratio of integers:

        score = idf_ppm · 44·tf·T  div  (20·tf·T + 6·T + 18·dl·N)

    ``idf_ppm`` is the only transcendental: both engines round the
    SAME IEEE double (one correctly-rounded division of two integers,
    then ln) to integer micro-units, after which everything is integer
    multiply/divide in DECIMAL(38,0) — bit-identical under any
    partitioning, summation order, or engine, the same fixed-point
    discipline as ``graph.pagerank``.

    Returns (doc_id, word, tf, df, dl, score_u[, rank]) over the
    keyword vocabulary (stop words and len<=2 dropped); ``k > 0`` adds
    a per-doc rank window over (score_u desc, word asc) and keeps the
    top k terms per document — the bounded-output shape an index
    pipeline ships.

    Scale shape: the corpus is TOKENIZED EXACTLY ONCE — the (doc,
    word, dl) tf aggregate is locally checkpointed, and df, N, and T
    all derive from it (without the checkpoint, Catalyst re-runs the
    tokenize + explode chain for every consumer — measured 3× the
    corpus work; a persist() would do the same but leak the cache for
    the session's life).
    tf/df are two-phase map-side-combined aggregates; N and T are two
    scalars inlined as literals (no crossjoin of a singleton frame
    into the big side).
    """
    toks = keyword_tokens_col(F.col(text_col))
    base = fan_out(docs).select(
        F.col(id_col), toks.alias("_toks")
    ).filter(F.size("_toks") > 0)
    base = base.select(
        F.col(id_col), "_toks", F.size("_toks").alias("dl")
    )
    # localCheckpoint, not persist: materialized once (the totals
    # collect below), lineage cut so every consumer reads the
    # checkpoint instead of re-tokenizing, and the blocks free with
    # the DataFrame — persist() here leaked one corpus-sized cache
    # per call for the life of the session
    tf = (
        base.select(F.col(id_col), "dl", F.explode("_toks").alias("word"))
        .groupBy(id_col, "word", "dl")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=True)
    )
    totals = (
        tf.groupBy(id_col).agg(F.max("dl").alias("dl"))
        .agg(F.count("*").alias("n"), F.sum("dl").alias("t"))
        .collect()[0]
    )
    n_docs, t_tokens = int(totals["n"] or 0), int(totals["t"] or 0)
    if n_docs == 0:
        empty = tf.select(
            F.col(id_col), F.lit("").alias("word"),
            F.lit(0).alias("tf"), F.lit(0).alias("df"),
            F.lit(0).alias("dl"), F.lit(0).cast("long").alias("score_u"),
        )
        return empty.withColumn("rank", F.lit(0)) if k else empty

    df_tbl = tf.groupBy("word").agg(F.count("*").alias("df"))
    idf_ppm = F.floor(
        F.log(F.lit(float(2 * (n_docs + 1))) / (2 * F.col("df") + 1))
        * 1_000_000
        + F.lit(0.5)
    ).cast("long")
    joined = tf.join(df_tbl.withColumn("idf_ppm", idf_ppm), "word")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    num = dec(F.col("idf_ppm")) * 44 * dec(F.col("tf")) * F.lit(t_tokens)
    den = (
        dec(F.lit(20 * t_tokens)) * dec(F.col("tf"))
        + dec(F.lit(6 * t_tokens))
        + dec(F.lit(18 * n_docs)) * dec(F.col("dl"))
    )
    # IntegralDivide (`div`) truncates exactly on decimals — for the
    # non-negative operands here that is floor, matching DuckDB `//`
    out = joined.withColumns({"_num": num, "_den": den}).select(
        F.col(id_col), "word", "tf", "df", "dl",
        F.expr("_num div _den").cast("long").alias("score_u"),
    )
    if k:
        win = Window.partitionBy(id_col).orderBy(
            F.desc("score_u"), F.asc("word")
        )
        out = out.withColumn("rank", F.row_number().over(win)).filter(
            F.col("rank") <= k
        )
    return out


#: common UTF-8-decoded-as-Latin-1 mojibake, longest keys first so the
#: 3-char â€* punctuation sequences never get half-eaten by a 2-char
#: rule. A fixed table (not byte-level re-decoding) keeps the fix
#: deterministic and SQL-replayable; full ftfy-style reinterpretation
#: would need encode/decode round-trips no SQL oracle can express.
MOJIBAKE_FIXES = (
    ("â€™", "’"),  # â€™ → ’
    ("â€œ", "“"),  # â€œ → “
    ("â€“", "–"),  # â€“ → –
    ("â€”", "—"),  # â€” → —
    ("Ã©", "é"),  # Ã© → é
    ("Ã¨", "è"),  # Ã¨ → è
    ("Ã¡", "á"),  # Ã¡ → á
    ("Ã³", "ó"),  # Ã³ → ó
    ("Ãº", "ú"),  # Ãº → ú
    ("Ã±", "ñ"),  # Ã± → ñ
    ("Ã§", "ç"),  # Ã§ → ç
    ("Ã¤", "ä"),  # Ã¤ → ä
    ("Ã¶", "ö"),  # Ã¶ → ö
    ("Ã¼", "ü"),  # Ã¼ → ü
    ("Â«", "«"),  # Â« → «
    ("Â»", "»"),  # Â» → »
)

#: C0/C1-ish controls stripped by unicode_clean; \t \n survive, \r is
#: handled by the newline rules first.
_CONTROL_STRIP_RE = "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]"


def unicode_clean(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Unicode hygiene for crawled text — the cleanup every web corpus
    needs before tokenization: fix common mojibake
    (:data:`MOJIBAKE_FIXES`, applied in table order), NFC-normalize
    (combining sequences → precomposed), normalize CRLF/CR to LF, and
    strip C0 controls (keeping tab/newline).

    This is a deliberate Python (Arrow ``mapInPandas``) stage: Spark
    has no NFC builtin, and ``unicodedata.normalize`` is the reference
    implementation — the batch-columnar path keeps it one pass per
    Arrow batch with zero shuffle. The DuckDB oracle replays the same
    replace chain and ``nfc_normalize``.

    Returns (id, text, changed).
    """
    import re as _re
    import unicodedata

    import pandas as pd

    ctrl = _re.compile(_CONTROL_STRIP_RE)
    schema = f"{id_col} long, {text_col} string, changed boolean"

    def run(batches):
        def clean_one(s):
            if s is None:
                return None
            out = s
            for bad, good in MOJIBAKE_FIXES:
                out = out.replace(bad, good)
            out = unicodedata.normalize("NFC", out)
            out = out.replace("\r\n", "\n").replace("\r", "\n")
            return ctrl.sub("", out)

        for pdf in batches:
            cleaned = pdf[text_col].map(clean_one)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    text_col: cleaned,
                    "changed": cleaned.ne(pdf[text_col]),
                }
            )

    return fan_out(docs).select(id_col, text_col).mapInPandas(run, schema=schema)


def bpe_pair_counts(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 30,
) -> DataFrame:
    """The inner statistic of BPE tokenizer training (Sennrich et al.
    2016): corpus-wide adjacent-symbol pair frequencies — the pair
    with the max count is the next merge. The distributed shape is the
    point: ONE corpus pass builds the word-frequency table (classic
    BPE trains on (word, freq), never the raw corpus), then all pair
    work happens on the vocabulary, which is orders of magnitude
    smaller than 100 TB of text. Symbols here are the initial
    character alphabet plus the standard ``</w>`` end-of-word marker
    (single-character words still contribute their final pair).

    Returns the top-``k`` merge candidates:

      (pair, freq, rank)   — rank over (freq desc, pair asc)

    Scale shape: explode→count for the word table (two-phase,
    map-side combined), a per-word HOF projection for pairs (no
    shuffle), one pair aggregate, and a TakeOrdered top-k — the final
    rank window runs on k rows only.
    """
    words = fan_out(docs).select(
        F.explode(tokens_col(F.col(text_col))).alias("word")
    )
    wf = words.groupBy("word").agg(F.count("*").alias("freq"))
    # adjacent pairs substr(i,1)||' '||substr(i+1,1), then the
    # word-final '</w>' pair. NB: Spark's sequence(1, 0) yields a
    # DESCENDING [1, 0] (DuckDB's generate_series yields empty), so
    # single-character words must be guarded explicitly
    inner_pairs = F.when(
        F.length("word") > 1,
        F.transform(
            F.sequence(F.lit(1), F.length("word") - 1),
            lambda i: F.concat(
                F.col("word").substr(i, F.lit(1)),
                F.lit(" "),
                F.col("word").substr(i + 1, F.lit(1)),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    pair_list = F.concat(
        inner_pairs,
        F.array(
            F.concat(
                F.col("word").substr(F.length("word"), F.lit(1)),
                F.lit(" </w>"),
            )
        ),
    )
    pairs = wf.select(F.explode(pair_list).alias("pair"), "freq")
    counts = pairs.groupBy("pair").agg(F.sum("freq").alias("freq"))
    top = counts.orderBy(F.desc("freq"), F.asc("pair")).limit(k)
    win = Window.orderBy(F.desc("freq"), F.asc("pair"))
    return top.withColumn("rank", F.row_number().over(win)).select(
        "pair", "freq", "rank"
    )


def build_postings(
    docs: DataFrame,
    n_docs: int,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
    max_df_ppm: int = 1_000_000,
    block_size: int = 1024,
    include_dls: bool = False,
) -> DataFrame:
    """Blocked inverted index — the index-time twin of
    :func:`bm25_term_weights` (which scores; this MATERIALIZES the
    posting lists a search/dedup service would serve).

    One row per (term, block)::

      (term, df, block, doc_ids: array<long>, tfs: array<long>)

    ``include_dls=True`` appends an aligned ``dls`` array (per-doc
    token counts — the norms) so :func:`bm25_search` can score without
    ever joining a corpus-sized lengths table.

    - posting entries are (doc_id asc) within and across blocks —
      ``block = floor(rank/block_size)`` — so lists stream in merge
      order and block k of a term can be fetched without block k+1
      (the skip-list access pattern); aligned primitive arrays are the
      standard columnar posting layout
    - ``min_df`` / ``max_df_ppm`` implement stop-word elimination by
      document frequency — the same cutoff real indexes use — which
      also BOUNDS the per-term window partition: after the max-df
      gate no term's postings exceed ``max_df_ppm`` of the corpus, so
      the blocking window cannot see a corpus-sized partition
    - ``n_docs`` is the corpus size (driver scalar, same pattern as
      the pagerank node count)

    Scale shape: one (term, doc) partial-aggregated exchange for tf,
    one (term) aggregate for df (both map-side combined), the bounded
    blocking window, and one (term, block) aggregate for the arrays.
    Text never shuffles — only (term, doc_id, tf) triples do.
    """
    if block_size <= 0:
        raise ValueError("block_size must be positive")
    max_df = (max_df_ppm * int(n_docs)) // 1_000_000

    # tokenize ONCE into a staged array column (the doc_stats
    # discipline: HOF chains are CodegenFallback with no subexpression
    # elimination — explode(toks) + size(toks) inlined would tokenize
    # every doc twice, measured 2.7x the build)
    staged = fan_out(docs).select(
        F.col(id_col).alias("doc_id"),
        tokens_col(F.col(text_col)).alias("_toks"),
    )
    proj = [F.col("doc_id"), F.explode("_toks").alias("term")]
    group_keys = ["term", "doc_id"]
    if include_dls:
        # norms-in-postings layout (Lucene stores per-doc norms next
        # to the postings for exactly this reason): dl rides the tf
        # aggregate as a grouping key — constant per (term, doc) — so
        # search never joins a corpus-sized lengths table
        proj.append(F.size("_toks").cast("long").alias("dl"))
        group_keys.append("dl")
    tf = (
        staged.select(*proj)
        .groupBy(*group_keys)
        .agg(F.count("*").cast("long").alias("tf"))
    )
    return _assemble_postings(tf, max_df, min_df, block_size, include_dls)


def _assemble_postings(
    tf: DataFrame,
    max_df: int,
    min_df: int,
    block_size: int,
    include_dls: bool,
) -> DataFrame:
    """Shared index-assembly tail: df aggregate, stop-word gates, the
    bounded blocking window, aligned arrays. ``tf`` is (doc_id, term,
    tf[, dl]) rows — from a fresh tokenization (:func:`build_postings`)
    or from exploding already-built shard indexes
    (:func:`merge_postings`)."""
    df_t = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    kept = tf.join(
        df_t.filter(
            (F.col("df") >= min_df) & (F.col("df") <= F.lit(max_df))
        ),
        "term",
    )
    # SKEW-PROOF per-term ranking (round 4): a plain
    # Window.partitionBy(term) puts a hot term's ENTIRE posting list
    # in one partition — fine after a max-df gate, but UNGATED shard
    # builds (the incremental-index path, gates applied at merge) meet
    # stopword-class terms whose lists are O(corpus): one executor
    # would sort millions of rows serially (measured: a 3M-doc
    # single-term epoch spent ~30 s in this window). Instead: bucket
    # by the doc_id's top byte — ORDER-PRESERVING (arithmetic shift on
    # two's-complement longs) and uniform for hashed ids (the crawl
    # index keys docs by xxhash64(url)) — rank locally within
    # (term, bucket), and add the per-term prefix count of earlier
    # buckets. Exact same rank for ANY doc_id distribution (skewed
    # ids just degrade back to fewer effective buckets), so the
    # blocking — and every oracle — is bit-identical.
    #
    # Type contract: the top-byte bucket needs an INTEGRAL doc_id
    # (shiftright). Non-integral ids (string ids are valid for every
    # other postings consumer) degrade to a constant bucket — exactly
    # the pre-round-4 plain window, same ranks — instead of failing
    # analysis with a raw cast error. Skew protection therefore
    # requires long ids (the crawl index keys docs by xxhash64(url)).
    _id_type = dict(tf.dtypes).get("doc_id", "")
    if _id_type in ("tinyint", "smallint", "int", "bigint"):
        kept = kept.withColumn("_bkt", F.shiftright(F.col("doc_id"), 56))
    else:
        kept = kept.withColumn("_bkt", F.lit(0))
    w_local = Window.partitionBy("term", "_bkt").orderBy(F.asc("doc_id"))
    w_pfx = (
        Window.partitionBy("term")
        .orderBy(F.asc("_bkt"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pfx = (
        kept.groupBy("term", "_bkt")
        .agg(F.count("*").alias("_c"))
        .withColumn(
            "_pfx", F.coalesce(F.sum("_c").over(w_pfx), F.lit(0))
        )
        .drop("_c")
    )
    blocked = (
        kept.withColumn("_lr", F.row_number().over(w_local))
        .join(pfx, ["term", "_bkt"])
        .withColumn(
            "block",
            F.floor(
                (F.col("_pfx") + F.col("_lr") - 1) / block_size
            ).cast("long"),
        )
        .drop("_bkt", "_lr", "_pfx")
    )
    entry_cols = ["doc_id", "tf"] + (["dl"] if include_dls else [])
    include_positions = "positions" in tf.columns
    if include_positions:
        # per-entry payload: the sorted token-offset array rides the
        # struct unchanged (doc_id leads and is unique, so array_sort's
        # lexicographic struct order never inspects the array field)
        entry_cols.append("positions")
    entries = F.array_sort(F.collect_list(F.struct(*entry_cols)))
    out_cols = [
        F.col("term"),
        F.col("df"),
        F.col("block"),
        F.transform("_e", lambda x: x["doc_id"]).alias("doc_ids"),
        F.transform("_e", lambda x: x["tf"]).alias("tfs"),
    ]
    if include_dls:
        out_cols.append(F.transform("_e", lambda x: x["dl"]).alias("dls"))
    if include_positions:
        out_cols.append(
            F.transform("_e", lambda x: x["positions"]).alias("position_lists")
        )
    return (
        blocked.groupBy("term", "df", "block")
        .agg(entries.alias("_e"))
        .select(*out_cols)
    )


def merge_postings(
    parts: list,
    *,
    min_df: int = 1,
    max_df_ppm: int = 1_000_000,
    n_docs: int = 0,
    block_size: int = 1024,
) -> DataFrame:
    """Incremental index maintenance — the per-epoch shape (the
    ``minhash_lsh_incremental`` fix-class applied to search): shard
    indexes built UNGATED over disjoint doc sets (e.g. yesterday's
    corpus and today's delta — only the DELTA pays tokenization, the
    expensive text scan) merge into one index with the df gates
    applied at merge time, where global document frequencies are
    finally known. ``merge(build(A), build(B)) ≡ build(A ∪ B)``
    EXACTLY — the tested and oracle-checked contract (gating shards
    individually would lose terms a shard-local df gate drops, which
    is why shards stay ungated until merge).

    ``parts`` are :func:`build_postings` outputs over DISJOINT doc
    sets (same tokenizer); ``n_docs`` is the merged corpus size for
    the max-df gate. dls propagate when every part carries them.

    Scale shape: each part explodes back to (doc_id, term, tf[, dl])
    rows — 16-byte currency, never text — then the shared assembly
    tail runs exactly as a batch build: one df aggregate, the bounded
    blocking window, one array aggregate.
    """
    if not parts:
        raise ValueError("parts must be non-empty")
    include_dls = all("dls" in p.columns for p in parts)
    max_df = (max_df_ppm * int(n_docs)) // 1_000_000 if n_docs else 0
    if not n_docs:
        raise ValueError("n_docs (merged corpus size) is required")
    rows = None
    for p in parts:
        zipped = (
            F.arrays_zip("doc_ids", "tfs", "dls")
            if include_dls
            else F.arrays_zip("doc_ids", "tfs")
        )
        cols = [
            F.col("_e.doc_ids").alias("doc_id"),
            F.col("term"),
            F.col("_e.tfs").alias("tf"),
        ]
        if include_dls:
            cols.append(F.col("_e.dls").alias("dl"))
        r = p.select("term", F.explode(zipped).alias("_e")).select(*cols)
        rows = r if rows is None else rows.unionByName(r)
    return _assemble_postings(rows, max_df, min_df, block_size, include_dls)


def tokenize_query(text: str) -> list:
    """Driver-side twin of :func:`tokens_col` for query strings —
    lower → split on ``TOKEN_SPLIT_REGEX`` → drop empties. The phrase
    and snippet operators tokenize their (tiny) query argument with
    this so query terms and indexed terms come from the SAME
    vocabulary (reference tokenizer: utils/text.py:187)."""
    import re as _re

    return [t for t in _re.split(TOKEN_SPLIT_REGEX, str(text).lower()) if t]


def build_positional_postings(
    docs: DataFrame,
    n_docs: int,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
    max_df_ppm: int = 1_000_000,
    block_size: int = 1024,
    include_dls: bool = False,
) -> DataFrame:
    """Positional inverted index — :func:`build_postings` plus the
    per-occurrence token offsets phrase and proximity queries need
    (the Lucene ``PositionsEnum`` layout: positions live NEXT to the
    posting entry, so a phrase query never re-reads text).

    One row per (term, block)::

      (term, df, block, doc_ids: array<long>, tfs: array<long>,
       [dls: array<long>,] position_lists: array<array<long>>)

    ``position_lists[i]`` holds the ascending 0-based token offsets of
    ``term`` in ``doc_ids[i]``; ``size(position_lists[i]) == tfs[i]``
    by construction. Blocking, df gates and skew shape are shared with
    :func:`build_postings` via the same assembly tail — the only
    addition is the per-(term, doc) sorted offset array, aggregated
    map-side from the SAME posexplode that produces tf (no second
    tokenization, no extra exchange). With ``include_dls=True`` the
    output MINUS ``position_lists`` is bit-identical to
    ``build_postings(include_dls=True)`` — one tokenization serves
    both index shapes (how the crawl's ``index_positions`` shard
    derives its plain twin for free).

    Scale shape: identical to build_postings — (term, doc_id) rows
    carry one extra array column whose total size is the token count
    of the corpus; text itself never shuffles.
    """
    if block_size <= 0:
        raise ValueError("block_size must be positive")
    max_df = (max_df_ppm * int(n_docs)) // 1_000_000
    staged = fan_out(docs).select(
        F.col(id_col).alias("doc_id"),
        tokens_col(F.col(text_col)).alias("_toks"),
    )
    proj = ["doc_id", F.posexplode("_toks").alias("p", "term")]
    group_keys = ["term", "doc_id"]
    if include_dls:
        proj.append(F.size("_toks").cast("long").alias("dl"))
        group_keys.append("dl")
    tf = (
        staged.select(*proj)
        .groupBy(*group_keys)
        .agg(
            F.count("*").cast("long").alias("tf"),
            F.array_sort(
                F.collect_list(F.col("p").cast("long"))
            ).alias("positions"),
        )
    )
    return _assemble_postings(tf, max_df, min_df, block_size, include_dls)


def merge_positional_postings(
    parts: list,
    *,
    n_docs: int,
    min_df: int = 1,
    max_df_ppm: int = 1_000_000,
    block_size: int = 1024,
) -> DataFrame:
    """:func:`merge_postings` for positional shards — per-epoch
    positional-index maintenance with the identical contract:
    ``merge(build(A), build(B)) ≡ build(A ∪ B)`` EXACTLY for shards
    over DISJOINT doc sets. Position lists are per-doc payloads, so
    disjointness means no list ever merges — entries just re-block
    under global df. Defaults stay ungated: phrase queries must see
    every term (a df gate silently losing a phrase's rare term is the
    gated-index contract, not a default).

    Scale shape: explode back to (term, doc_id, tf, positions[, dl])
    rows — position arrays move, text never does — then the shared
    assembly tail: one df aggregate, the bounded blocking window, one
    array aggregate.
    """
    if not parts:
        raise ValueError("parts must be non-empty")
    if not n_docs:
        raise ValueError("n_docs (merged corpus size) is required")
    include_dls = all("dls" in p.columns for p in parts)
    max_df = (max_df_ppm * int(n_docs)) // 1_000_000
    rows = None
    for p in parts:
        arrays = ["doc_ids", "tfs", "position_lists"] + (
            ["dls"] if include_dls else []
        )
        cols = [
            F.col("_e.doc_ids").alias("doc_id"),
            F.col("term"),
            F.col("_e.tfs").alias("tf"),
            F.col("_e.position_lists").alias("positions"),
        ]
        if include_dls:
            cols.append(F.col("_e.dls").alias("dl"))
        r = p.select(
            "term", F.explode(F.arrays_zip(*arrays)).alias("_e")
        ).select(*cols)
        rows = r if rows is None else rows.unionByName(r)
    return _assemble_postings(rows, max_df, min_df, block_size, include_dls)


def phrase_search(
    docs: Optional[DataFrame] = None,
    phrase: str = "",
    *,
    index: Optional[DataFrame] = None,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact phrase query — every doc containing the query tokens as a
    CONSECUTIVE run, ranked by occurrence count (Lucene
    ``PhraseQuery`` with slop=0).

    Returns ``(doc_id, phrase_tf, first_pos)`` — top-``k`` by
    (phrase_tf desc, doc_id asc), ``first_pos`` the earliest match
    offset (the snippet anchor).

    Algorithm (the classic positional-intersection reshaped as
    relational ops): tokenize the phrase into slots ``(term_i, i)``;
    every occurrence of ``term_i`` at offset ``p`` votes for alignment
    base ``p - i``; a base where ALL slots voted is a phrase match.
    Duplicate phrase terms need no special case — each slot checks its
    own offset independently ("table table" demands positions p and
    p+1 both hold "table").

    Sources: ``docs`` (tokenize once, filter to query terms BEFORE any
    aggregation) or ``index=`` (a :func:`build_positional_postings`
    frame — only the query terms' blocks are read; build it UNGATED or
    ensure the phrase terms survive the df gates, else matches are
    silently lost — same contract as any gated index).

    Scale shape: the slots table is query-sized and broadcast; only
    the query terms' occurrence rows survive the join, and both
    aggregates are map-side combined on (doc_id, base) / (doc_id).
    Final ranking is orderBy+limit = TakeOrdered, no full sort.
    """
    terms = tokenize_query(phrase)
    if not terms:
        raise ValueError("phrase must contain at least one token")
    if (docs is None) == (index is None):
        raise ValueError("exactly one of docs / index is required")
    src = docs if docs is not None else index
    spark = src.sparkSession
    slots = spark.createDataFrame(
        [(t, i) for i, t in enumerate(terms)], "term string, slot long"
    )
    if docs is not None:
        occ = fan_out(docs).select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(tokens_col(F.col(text_col))).alias("p", "term"),
        ).select("doc_id", F.col("p").cast("long").alias("p"), "term")
    else:
        occ = (
            index.where(F.col("term").isin(terms))
            .select(
                "term",
                F.explode(
                    F.arrays_zip("doc_ids", "position_lists")
                ).alias("_e"),
            )
            .select(
                "term",
                F.col("_e.doc_ids").alias("doc_id"),
                F.explode("_e.position_lists").alias("p"),
            )
        )
    hits = (
        occ.join(F.broadcast(slots), "term")
        .select(
            "doc_id", "slot", (F.col("p") - F.col("slot")).alias("base")
        )
        .where(F.col("base") >= 0)
    )
    starts = (
        hits.groupBy("doc_id", "base")
        .agg(F.countDistinct("slot").alias("_n"))
        .where(F.col("_n") == len(terms))
    )
    return (
        starts.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("phrase_tf"),
            F.min("base").cast("long").alias("first_pos"),
        )
        .orderBy(F.desc("phrase_tf"), F.asc("doc_id"))
        .limit(k)
    )


def _deletion_variants(col: Column) -> Column:
    """All single-character deletions of a term (plus nothing else) —
    the SymSpell dictionary key generator, as one native ``transform``
    over the character positions (no Python, no explode yet)."""
    return F.transform(
        F.sequence(F.lit(1), F.length(col)),
        lambda i: F.concat(
            col.substr(F.lit(1), i - 1),
            col.substr(i + 1, F.length(col) - i),
        ),
    )


def spell_correct(
    docs: Optional[DataFrame] = None,
    queries: list = (),
    *,
    index: Optional[DataFrame] = None,
    max_edit: int = 1,
    k: int = 5,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """"Did you mean" — SymSpell-style spell correction against the
    corpus vocabulary (Garbe's symmetric-deletion algorithm: both the
    vocab term and the query generate ≤``max_edit`` character
    deletions; a shared deletion key is a candidate, verified with
    true Levenshtein — complete for plain edit distance ≤ max_edit,
    never a vocabulary scan per query).

    Returns ``(query, suggestion, distance, cnt, rank)`` top-``k`` per
    query by (distance asc, cnt desc, suggestion asc); ``cnt`` is the
    corpus frequency prior (misspellings below ``min_count`` never
    become suggestions). Exact vocabulary hits rank first at
    distance 0. ``max_edit`` ∈ {1, 2}.

    Sources: ``docs`` (vocabulary from one tokenization) or ``index=``
    (any :func:`build_postings`-family frame — the vocabulary IS the
    index's term dictionary, ``cnt`` the summed tfs, so a crawl store
    serves "did you mean" with zero re-tokenization; build it ungated
    or gated terms can't be suggested).

    Scale shape: the deletion dictionary is vocab-sized × term length
    (built from the one map-side-combined term-count aggregate — text
    never shuffles); the query side is query-sized and BROADCAST into
    the key join; verification is the built-in ``levenshtein`` on
    candidate pairs only. A 100 TB corpus's VOCABULARY is what this
    scales in — millions of rows, not the corpus.
    """
    if max_edit not in (1, 2):
        raise ValueError("max_edit must be 1 or 2")
    if k <= 0:
        raise ValueError("k must be positive")
    if (docs is None) == (index is None):
        raise ValueError("exactly one of docs / index is required")
    q_terms = []
    for q in queries:
        toks = tokenize_query(q)
        if len(toks) != 1:
            raise ValueError(
                f"query {q!r} must tokenize to exactly one term"
            )
        q_terms.append(toks[0])
    if not q_terms:
        raise ValueError("queries must be non-empty")
    if docs is not None:
        spark = docs.sparkSession
        vocab = (
            fan_out(docs).select(
                F.explode(tokens_col(F.col(text_col))).alias("term")
            )
            .groupBy("term")
            .agg(F.count("*").cast("long").alias("cnt"))
            .where(F.col("cnt") >= min_count)
        )
    else:
        spark = index.sparkSession
        # cnt = total term frequency summed across the term's blocks —
        # identical to the from-docs count by the postings tf contract
        vocab = (
            index.select(
                "term",
                F.aggregate(
                    "tfs", F.lit(0).cast("long"), lambda acc, x: acc + x
                ).alias("_tf"),
            )
            .groupBy("term")
            .agg(F.sum("_tf").cast("long").alias("cnt"))
            .where(F.col("cnt") >= min_count)
        )

    def keys_of(frame, col_name):
        """(col, key) rows: the term itself plus deletions to depth
        max_edit, deduped — the symmetric half of the join."""
        base = frame.select(
            F.col(col_name),
            F.array_union(
                F.array(F.col(col_name)),
                _deletion_variants(F.col(col_name)),
            ).alias("_d1"),
        )
        if max_edit == 2:
            keyed = base.select(
                col_name,
                F.explode(
                    F.array_distinct(
                        F.flatten(
                            F.transform(
                                "_d1",
                                lambda d: F.array_union(
                                    F.array(d), _deletion_variants(d)
                                ),
                            )
                        )
                    )
                ).alias("key"),
            )
        else:
            keyed = base.select(
                col_name, F.explode(F.array_distinct("_d1")).alias("key")
            )
        return keyed

    vkeys = keys_of(vocab, "term")
    qdf = spark.createDataFrame([(t,) for t in sorted(set(q_terms))],
                                "query string")
    qkeys = keys_of(qdf, "query")
    cands = (
        vkeys.join(F.broadcast(qkeys), "key")
        .select("query", "term")
        .distinct()
        .withColumn(
            "distance",
            F.levenshtein(F.col("query"), F.col("term")).cast("long"),
        )
        .where(F.col("distance") <= max_edit)
        .join(vocab, "term")
    )
    w_rank = Window.partitionBy("query").orderBy(
        F.asc("distance"), F.desc("cnt"), F.asc("term")
    )
    return (
        cands.withColumn("rank", F.row_number().over(w_rank))
        .where(F.col("rank") <= k)
        .select(
            "query",
            F.col("term").alias("suggestion"),
            "distance",
            "cnt",
            F.col("rank").cast("long").alias("rank"),
        )
    )


def prefix_suggest(
    docs: Optional[DataFrame] = None,
    prefixes: list = (),
    *,
    index: Optional[DataFrame] = None,
    k: int = 5,
    min_count: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Autocomplete — top-``k`` vocabulary completions per prefix by
    corpus frequency (the Lucene suggester's popularity rule,
    deterministic): ``(prefix, term, cnt, rank)`` ranked (cnt desc,
    term asc). Prefixes are lowercased; a term equal to the prefix is
    itself a completion. Vocabulary from one tokenization (``docs``)
    or any postings index's term dictionary (``index=``, cnt = summed
    tfs — the crawl store serves autocomplete with zero
    re-tokenization).

    Scale shape: one map-side-combined vocab aggregate; the prefix
    table is query-sized and BROADCAST; ``startswith`` filters at the
    join; per-prefix ranking windows are k-bounded.
    """
    if k <= 0:
        raise ValueError("k must be positive")
    pfx = sorted({str(p).strip().lower() for p in prefixes if str(p).strip()})
    if not pfx:
        raise ValueError("prefixes must be non-empty")
    if (docs is None) == (index is None):
        raise ValueError("exactly one of docs / index is required")
    if docs is not None:
        spark = docs.sparkSession
        vocab = (
            fan_out(docs).select(
                F.explode(tokens_col(F.col(text_col))).alias("term")
            )
            .groupBy("term")
            .agg(F.count("*").cast("long").alias("cnt"))
        )
    else:
        spark = index.sparkSession
        vocab = (
            index.select(
                "term",
                F.aggregate(
                    "tfs", F.lit(0).cast("long"), lambda acc, x: acc + x
                ).alias("_tf"),
            )
            .groupBy("term")
            .agg(F.sum("_tf").cast("long").alias("cnt"))
        )
    vocab = vocab.where(F.col("cnt") >= min_count)
    pdf = spark.createDataFrame([(p,) for p in pfx], "prefix string")
    w_rank = Window.partitionBy("prefix").orderBy(
        F.desc("cnt"), F.asc("term")
    )
    return (
        vocab.join(
            F.broadcast(pdf), F.col("term").startswith(F.col("prefix"))
        )
        .withColumn("rank", F.row_number().over(w_rank))
        .where(F.col("rank") <= k)
        .select(
            "prefix", "term", "cnt",
            F.col("rank").cast("long").alias("rank"),
        )
    )


def concordance(
    docs: DataFrame,
    term: str,
    *,
    context: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Keyword-in-context (KWIC) concordance — every occurrence of
    ``term`` with its ±``context`` surrounding tokens, the classic
    corpus-linguistics view (and the debugging lens for every other
    positional operator): ``(doc_id, pos, left, match, right)``, left/
    right space-joined token spans clipped at doc edges.

    Scale shape: occurrences are term-filtered from ONE tokenization
    before anything wide; context rendering is a doc-grain join back
    to the staged token arrays plus two native ``slice`` calls — no
    window, no self-join, nothing beyond the matching docs moves.
    """
    toks = tokenize_query(term)
    if len(toks) != 1:
        raise ValueError("term must tokenize to exactly one token")
    if context <= 0:
        raise ValueError("context must be positive")
    t = toks[0]
    staged = fan_out(docs).select(
        F.col(id_col).alias("doc_id"),
        tokens_col(F.col(text_col)).alias("_toks"),
    )
    matches = staged.select(
        "doc_id", F.posexplode("_toks").alias("p", "term")
    ).where(F.col("term") == t).select(
        "doc_id", F.col("p").cast("long").alias("pos")
    )
    left_start = F.greatest(F.lit(0), F.col("pos") - context)
    return matches.join(staged, "doc_id").select(
        "doc_id",
        "pos",
        F.array_join(
            F.slice(
                F.col("_toks"),
                (left_start + 1).cast("int"),
                (F.col("pos") - left_start).cast("int"),
            ),
            " ",
        ).alias("left"),
        F.lit(t).alias("match"),
        F.array_join(
            F.slice(
                F.col("_toks"), (F.col("pos") + 2).cast("int"), context
            ),
            " ",
        ).alias("right"),
    )


def boolean_search(
    docs: Optional[DataFrame] = None,
    *,
    must: tuple = (),
    should: tuple = (),
    must_not: tuple = (),
    index: Optional[DataFrame] = None,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Boolean retrieval — Lucene's ``BooleanQuery`` clause semantics
    over the same index family BM25 ranks with:

    - ``must``: every term present (AND)
    - ``should``: optional terms; the count present is the score (OR
      clauses contribute ranking, not eligibility — unless ``must`` is
      empty, in which case ≥1 should-term is required, the Lucene rule)
    - ``must_not``: no term present (NOT)

    Returns ``(doc_id, n_should)`` top-``k`` by (n_should desc,
    doc_id asc). Each clause entry must tokenize to exactly one term
    (multi-token needs :func:`phrase_search`).

    Sources: ``docs`` (tokenize once, filter to clause terms before
    aggregation) or ``index=`` (a :func:`build_postings` /
    :func:`build_positional_postings` frame — clause terms' blocks
    only; build it ungated or ensure clause terms survive the gates).

    Scale shape: occurrence rows are clause-term-filtered before the
    one (doc_id) aggregate (conditional count_distinct — map-side
    combined); eligibility is a HAVING on that aggregate; ranking is
    TakeOrdered. Nothing corpus-wide shuffles but the clause terms'
    postings.
    """
    def _one(term: str, clause: str) -> str:
        toks = tokenize_query(term)
        if len(toks) != 1:
            raise ValueError(
                f"{clause} entry {term!r} must tokenize to exactly one "
                "term (use phrase_search for multi-token)"
            )
        return toks[0]

    must_t = sorted({_one(t, "must") for t in must})
    should_t = sorted({_one(t, "should") for t in should})
    not_t = sorted({_one(t, "must_not") for t in must_not})
    if not must_t and not should_t:
        raise ValueError("at least one must or should term is required")
    overlap = set(must_t) & set(not_t)
    if overlap:
        raise ValueError(f"terms both must and must_not: {sorted(overlap)}")
    all_terms = sorted(set(must_t) | set(should_t) | set(not_t))
    if (docs is None) == (index is None):
        raise ValueError("exactly one of docs / index is required")
    if docs is not None:
        occ = fan_out(docs).select(
            F.col(id_col).alias("doc_id"),
            F.explode(tokens_col(F.col(text_col))).alias("term"),
        ).where(F.col("term").isin(all_terms))
    else:
        occ = (
            index.where(F.col("term").isin(all_terms))
            .select("term", F.explode("doc_ids").alias("doc_id"))
        )
    must_arr = F.array(*[F.lit(t) for t in must_t]) if must_t else None
    should_arr = (
        F.array(*[F.lit(t) for t in should_t]) if should_t else None
    )
    not_arr = F.array(*[F.lit(t) for t in not_t]) if not_t else None
    aggs = []
    aggs.append(
        (
            F.count_distinct(
                F.when(F.array_contains(must_arr, F.col("term")), F.col("term"))
            ) if must_t else F.lit(0)
        ).alias("_n_must")
    )
    aggs.append(
        (
            F.count_distinct(
                F.when(
                    F.array_contains(should_arr, F.col("term")), F.col("term")
                )
            ) if should_t else F.lit(0)
        ).cast("long").alias("n_should")
    )
    aggs.append(
        (
            F.count_distinct(
                F.when(F.array_contains(not_arr, F.col("term")), F.col("term"))
            ) if not_t else F.lit(0)
        ).alias("_n_not")
    )
    grouped = occ.groupBy("doc_id").agg(*aggs)
    cond = F.col("_n_not") == 0
    if must_t:
        cond = cond & (F.col("_n_must") == len(must_t))
    else:
        cond = cond & (F.col("n_should") > 0)
    return (
        grouped.where(cond)
        .select("doc_id", "n_should")
        .orderBy(F.desc("n_should"), F.asc("doc_id"))
        .limit(k)
    )


def term_cooccurrence(
    docs: DataFrame,
    seeds: list,
    *,
    window: int = 5,
    k: int = 10,
    min_pairs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Distributional "related terms" — for each seed term, the
    neighbor terms most over-represented inside ``±window`` token
    offsets, ranked by integer LIFT (the PMI ratio without the log —
    identical ranking per seed, no cross-engine float)::

      lift_ppm = pairs · T · 10⁶ // (cnt_seed · cnt_neighbor)

    where ``pairs`` counts (seed occurrence, neighbor occurrence)
    position pairs with ``|Δp| ≤ window`` and neighbor ≠ seed (a seed
    is never its own related term), ``cnt_·`` are corpus
    term frequencies and ``T`` the corpus token count (Church & Hanks
    1990's word-association ratio, integer-exact). Returns
    ``(seed, term, pairs, lift_ppm)`` top-``k`` per seed by
    (lift_ppm desc, term asc); ``min_pairs`` drops the unstable
    hapax-pair tail.

    Scale shape: the corpus tokenizes ONCE; seed occurrences (tiny
    after the seed filter) join neighbor occurrences doc-locally —
    an equi-join on doc_id with the offset band as a residual
    predicate, bounded by doc length, never cross-doc; term totals are
    one map-side-combined aggregate; the DECIMAL(38,0) lift division
    avoids long overflow at 100 TB token counts (the bm25 fixed-point
    discipline); per-seed ranking windows are k-bounded.
    """
    seed_t = sorted({t for s in seeds for t in tokenize_query(s)})
    if not seed_t:
        raise ValueError("seeds must contain at least one token")
    if window <= 0:
        raise ValueError("window must be positive")
    staged = fan_out(docs).select(
        F.col(id_col).alias("doc_id"),
        tokens_col(F.col(text_col)).alias("_toks"),
    )
    occ = staged.select(
        "doc_id", F.posexplode("_toks").alias("p", "term")
    )
    occ = occ.localCheckpoint(eager=False)  # 3 consumers, 1 tokenization
    totals = occ.groupBy("term").agg(F.count("*").cast("long").alias("cnt"))
    t_tokens = occ.count()
    seed_occ = occ.where(F.col("term").isin(seed_t)).select(
        "doc_id", F.col("p").alias("sp"), F.col("term").alias("seed")
    )
    pairs = (
        seed_occ.join(occ, "doc_id")
        .where(
            (F.abs(F.col("p") - F.col("sp")) <= window)
            # a seed is not its own "related term": seed-seed pairs
            # would be counted from BOTH occurrences (2x other
            # neighbors' scale) and crowd a real neighbor out of k
            & (F.col("term") != F.col("seed"))
        )
        .groupBy("seed", "term")
        .agg(F.count("*").cast("long").alias("pairs"))
        .where(F.col("pairs") >= min_pairs)
    )
    # seed counts only — broadcasting the unfiltered vocabulary would
    # ship (and driver-collect) millions of rows at corpus scale
    seed_cnt = totals.where(F.col("term").isin(seed_t)).select(
        F.col("term").alias("seed"), F.col("cnt").alias("seed_cnt")
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    scored = (
        pairs.join(F.broadcast(seed_cnt), "seed")
        .join(totals, "term")
        .withColumn(
            "_num",
            dec(F.col("pairs")) * dec(F.lit(int(t_tokens)))
            * dec(F.lit(1_000_000)),
        )
        .withColumn("_den", dec(F.col("seed_cnt")) * dec(F.col("cnt")))
        # IntegralDivide truncates exactly on decimals — floor for the
        # non-negative operands here, matching DuckDB `//` (the bm25
        # fixed-point discipline)
        .select(
            "seed",
            "term",
            "pairs",
            F.expr("_num div _den").cast("long").alias("lift_ppm"),
        )
    )
    w_rank = Window.partitionBy("seed").orderBy(
        F.desc("lift_ppm"), F.asc("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w_rank))
        .where(F.col("rank") <= k)
        .select(
            "seed", "term", "pairs", "lift_ppm",
            F.col("rank").cast("long").alias("rank"),
        )
    )


def proximity_search(
    docs: Optional[DataFrame] = None,
    query: str = "",
    *,
    index: Optional[DataFrame] = None,
    window: int = 12,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Unordered proximity query — docs where ALL query terms co-occur
    inside a ``window``-token span, ranked by how often (the
    middle ground between a bag-of-words AND query and a slop=0
    :func:`phrase_search`; Lucene's unordered SpanNearQuery).

    Returns ``(doc_id, n_windows, best_start)`` top-``k`` by
    (n_windows desc, doc_id asc): ``n_windows`` counts match offsets
    whose span ``[p, p+window)`` covers every distinct query term,
    ``best_start`` is the earliest such offset (the snippet anchor —
    feed it to :func:`snippet_extract`'s window for rendering).

    Sources: ``docs`` (tokenize once, query-term filter first) or
    ``index=`` (a :func:`build_positional_postings` frame — only the
    query terms' blocks are read, the same contract as
    :func:`phrase_search`).

    Scale shape: identical to :func:`snippet_extract` — matches
    filtered to query terms before anything wide, one per-doc
    range-frame window scores spans, map-side-combined (doc) aggregate,
    TakeOrdered ranking. No self-join, no skew surface beyond doc
    length.
    """
    q_terms = sorted(set(tokenize_query(query)))
    if not q_terms:
        raise ValueError("query must contain at least one token")
    if window <= 0:
        raise ValueError("window must be positive")
    if (docs is None) == (index is None):
        raise ValueError("exactly one of docs / index is required")
    if docs is not None:
        matches = fan_out(docs).select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(tokens_col(F.col(text_col))).alias("p", "term"),
        ).where(F.col("term").isin(q_terms))
    else:
        matches = (
            index.where(F.col("term").isin(q_terms))
            .select(
                "term",
                F.explode(
                    F.arrays_zip("doc_ids", "position_lists")
                ).alias("_e"),
            )
            .select(
                "term",
                F.col("_e.doc_ids").alias("doc_id"),
                F.explode("_e.position_lists").alias("p"),
            )
        )
    w_span = (
        Window.partitionBy("doc_id")
        .orderBy(F.asc("p"))
        .rangeBetween(0, window - 1)
    )
    covered = matches.select(
        "doc_id",
        F.col("p").cast("long").alias("p"),
        F.size(
            F.array_distinct(F.collect_list("term").over(w_span))
        ).alias("_hits"),
    ).where(F.col("_hits") == len(q_terms))
    return (
        covered.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_windows"),
            F.min("p").cast("long").alias("best_start"),
        )
        .orderBy(F.desc("n_windows"), F.asc("doc_id"))
        .limit(k)
    )


def snippet_extract(
    docs: DataFrame,
    query: str,
    *,
    window: int = 12,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Deterministic search-result snippets — for every doc matching
    ≥1 query term, the ``window``-token span covering the MOST
    DISTINCT query terms (ties → earliest span), rendered as text
    (the Lucene highlighter's best-fragment rule, made total-order
    deterministic).

    Returns ``(doc_id, start, n_terms, snippet)``: 0-based token
    offset of the span, distinct query terms inside it, and the span's
    tokens joined by single spaces (tokenized rendering — byte-offset
    highlighting would need the raw text anyway; this is the ranking
    primitive).

    Scale shape: spans are scored with ONE per-doc range-frame window
    (``range [p, p+window-1]`` over match offsets — O(matches×window)
    scan, partitioned by doc so no cross-doc skew is possible), the
    winner picked with a map-side-combinable min(struct) aggregate,
    and the text re-joined ONCE at doc grain for rendering. Only docs
    with matches flow past the first filter.
    """
    q_terms = sorted(set(tokenize_query(query)))
    if not q_terms:
        raise ValueError("query must contain at least one token")
    if window <= 0:
        raise ValueError("window must be positive")
    staged = fan_out(docs).select(
        F.col(id_col).alias("doc_id"),
        tokens_col(F.col(text_col)).alias("_toks"),
    )
    matches = staged.select(
        "doc_id", F.posexplode("_toks").alias("p", "term")
    ).where(F.col("term").isin(q_terms))
    w_span = (
        Window.partitionBy("doc_id")
        .orderBy(F.asc("p"))
        .rangeBetween(0, window - 1)
    )
    scored = matches.select(
        "doc_id",
        F.col("p").cast("long").alias("p"),
        F.size(
            F.array_distinct(F.collect_list("term").over(w_span))
        ).cast("long").alias("hits"),
    )
    winners = scored.groupBy("doc_id").agg(
        F.min(
            F.struct(
                (-F.col("hits")).alias("_neg"), F.col("p").alias("start")
            )
        ).alias("_w")
    ).select(
        "doc_id",
        F.col("_w.start").alias("start"),
        (-F.col("_w._neg")).alias("n_terms"),
    )
    return winners.join(staged, "doc_id").select(
        "doc_id",
        "start",
        "n_terms",
        F.array_join(
            F.slice(F.col("_toks"), F.col("start") + 1, window), " "
        ).alias("snippet"),
    )


def doc_lengths(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    include_kw: bool = False,
) -> DataFrame:
    """The norms table a search index serves next to its postings:
    (doc_id, dl) token counts under the SAME tokenizer as
    :func:`build_postings`. Docs with no tokens keep a dl=0 row — they
    still count toward N and avgdl. Pure projection, zero shuffle.

    ``include_kw=True`` adds ``kw_dl``, the KEYWORD-vocabulary token
    count (stop words and len<=2 dropped) — the norm
    :func:`more_like_this` query formation needs, persisted next to
    the index so an MLT call never aggregates the corpus for it. One
    staged tokenization feeds both counts (HOF chains get no
    subexpression elimination — inlining both size() calls would
    tokenize every doc twice)."""
    if not include_kw:
        return docs.select(
            F.col(id_col).alias("doc_id"),
            F.size(tokens_col(F.col(text_col))).cast("long").alias("dl"),
        )
    stop = F.array(*[F.lit(w) for w in STOP_WORDS_SORTED])
    return docs.select(
        F.col(id_col).alias("doc_id"),
        tokens_col(F.col(text_col)).alias("_toks"),
    ).select(
        "doc_id",
        F.size("_toks").cast("long").alias("dl"),
        F.size(
            F.filter(
                "_toks",
                lambda t: (F.length(t) > 2) & ~F.array_contains(stop, t),
            )
        ).cast("long").alias("kw_dl"),
    )


def bm25_search(
    postings: DataFrame,
    queries: DataFrame,
    n_docs: int,
    t_tokens: int,
    *,
    doc_lens: DataFrame | None = None,
    k: int = 10,
    query_id_col: str = "query_id",
    query_text_col: str = "text",
) -> DataFrame:
    """Query-time BM25 retrieval over the blocked inverted index — the
    DAAT (document-at-a-time) executor that completes the search
    story: :func:`build_postings` materializes the lists,
    :func:`bm25_term_weights` defines the scoring, this runs queries.

    Per query: tokenize (index tokenizer, duplicate terms collapsed —
    web-search bag-of-words), fetch ONLY the posting rows of the
    query's terms (broadcast the tiny query-terms table into the
    postings scan: on a term-bucketed index this is the k-list fetch,
    never an index scan), explode the per-block arrays to candidate
    (query, doc) pairs, score each pair with the EXACT integer BM25 of
    :func:`bm25_term_weights` (idf_ppm·44·tf·T div (20·tf·T + 6·T +
    18·dl·N) — bit-identical under any partitioning or engine), sum
    per doc, rank (score desc, doc_id asc), keep the top ``k``.

    ``dl`` comes from the postings themselves when the index was built
    with ``include_dls=True`` (the norms-in-postings layout — zero
    extra joins); otherwise ``doc_lens`` (from :func:`doc_lengths`) is
    joined at CANDIDATE grain — one keyed exchange over the hit rows,
    never the corpus (bucket both sides on doc_id on a real deployment
    and even that exchange vanishes).

    ``n_docs`` / ``t_tokens`` are the corpus scalars (N, total tokens)
    — driver literals like the pagerank node count, so no singleton
    crossjoin pollutes the plan.

    Returns (query_id, doc_id, score_u, n_terms, rank) — ``n_terms``
    is how many query terms hit the doc (the AND-ness diagnostic).

    Scale shape: one broadcast join against the postings scan, one
    narrow posexplode, (query, doc) partial aggregation map-side, and
    a rank window partitioned by query_id (rows per partition bounded
    by the candidate union of the query's df-gated posting lists).
    The corpus text never participates.
    """
    if n_docs <= 0:
        raise ValueError("n_docs must be positive")
    if t_tokens <= 0:
        raise ValueError("t_tokens must be positive")
    # distinct() on the exploded pairs: duplicate query_id rows in the
    # queries table must not re-emit the same terms (the per-row
    # array_distinct only dedups WITHIN a row) — without it score_u
    # and n_terms double-count
    qterms = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.explode(
            F.array_distinct(tokens_col(F.col(query_text_col)))
        ).alias("term"),
    ).distinct()
    hits = postings.join(F.broadcast(qterms), "term")
    has_dls = "dls" in postings.columns
    zipped = (
        F.arrays_zip("doc_ids", "tfs", "dls")
        if has_dls
        else F.arrays_zip("doc_ids", "tfs")
    )
    pairs = hits.select(
        "query_id", "term", "df", F.explode(zipped).alias("_e")
    ).select(
        "query_id",
        "term",
        "df",
        F.col("_e.doc_ids").alias("doc_id"),
        F.col("_e.tfs").alias("tf"),
        *([F.col("_e.dls").alias("dl")] if has_dls else []),
    )
    if not has_dls:
        if doc_lens is None:
            raise ValueError(
                "postings carry no dls column — pass doc_lens "
                "(or build the index with include_dls=True)"
            )
        pairs = pairs.join(doc_lens, "doc_id")
    # identical fixed-point scoring to bm25_term_weights
    idf_ppm = F.floor(
        F.log(F.lit(float(2 * (n_docs + 1))) / (2 * F.col("df") + 1))
        * 1_000_000
        + F.lit(0.5)
    ).cast("long")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    num = dec(idf_ppm) * 44 * dec(F.col("tf")) * F.lit(int(t_tokens))
    den = (
        dec(F.lit(20 * int(t_tokens))) * dec(F.col("tf"))
        + dec(F.lit(6 * int(t_tokens)))
        + dec(F.lit(18 * int(n_docs))) * dec(F.col("dl"))
    )
    scored = pairs.withColumns({"_num": num, "_den": den}).select(
        "query_id",
        "doc_id",
        F.expr("_num div _den").cast("long").alias("score_u"),
    )
    agg = scored.groupBy("query_id", "doc_id").agg(
        F.sum("score_u").cast("long").alias("score_u"),
        F.count("*").cast("long").alias("n_terms"),
    )
    win = Window.partitionBy("query_id").orderBy(
        F.desc("score_u"), F.asc("doc_id")
    )
    return agg.withColumn("rank", F.row_number().over(win)).filter(
        F.col("rank") <= k
    )


#: Unicode script ranges as explicit codepoint classes — \x{...} is
#: the ONE range syntax both Java regex (Spark) and RE2 (DuckDB)
#: accept verbatim, so the oracle replays these patterns untouched.
#: Order is the tie-break precedence (the LANG_ORDER discipline).
SCRIPT_RANGES: tuple = (
    ("latin", "A-Za-z\\x{00C0}-\\x{024F}"),
    ("cyrillic", "\\x{0400}-\\x{04FF}"),
    ("greek", "\\x{0370}-\\x{03FF}"),
    ("arabic", "\\x{0600}-\\x{06FF}"),
    ("hebrew", "\\x{0590}-\\x{05FF}"),
    ("devanagari", "\\x{0900}-\\x{097F}"),
    ("cjk", "\\x{4E00}-\\x{9FFF}\\x{3040}-\\x{30FF}\\x{AC00}-\\x{D7AF}"),
)


def script_profile(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Unicode-script character profile — the SCRIPT-level complement
    to the marker-lexicon :func:`language_id` (CCNet/fastText LID
    models key on script first; a crawler needs it cheaper): per-doc
    character counts for seven script ranges, the dominant script
    (max count, ties to :data:`SCRIPT_RANGES` order, ``none`` when no
    scripted character), and ``mix_ppm`` — the fraction of scripted
    characters OUTSIDE the dominant script. High mix is the homoglyph
    signal (Cyrillic letters spliced into Latin words — phishing/spam
    cloaking) and the multilingual-page signal that routes a doc to
    :func:`paragraph_language_id`.

    Counting is ``length(text) − length(regexp_replace(text, [range],
    ''))`` per script — one regex pass each, pure projection: zero
    shuffle, zero Python, codegen end-to-end; exact integer ppm.
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    names = [n for n, _ in SCRIPT_RANGES]
    counts = {
        f"n_{name}": (
            F.length(t)
            - F.length(F.regexp_replace(t, f"[{rng}]", ""))
        ).cast("long")
        for name, rng in SCRIPT_RANGES
    }
    staged = docs.select(
        F.col(id_col),
        F.length(t).cast("long").alias("n_chars"),
        *[c.alias(k) for k, c in counts.items()],
    )
    best = F.greatest(*[F.col(f"n_{n}") for n in names])
    pred = F.when(best == 0, F.lit("none"))
    for n in names:
        pred = pred.when(F.col(f"n_{n}") == best, F.lit(n))
    scripted = None
    for n in names:
        scripted = F.col(f"n_{n}") if scripted is None else scripted + F.col(f"n_{n}")
    mix = F.expr(
        "cast(({s} - {b}) as decimal(38,0)) * 1000000 div "
        "greatest(cast({s} as decimal(38,0)), 1)".format(
            s=" + ".join(f"n_{n}" for n in names),
            b="greatest(" + ", ".join(f"n_{n}" for n in names) + ")",
        )
    ).cast("long")
    return staged.select(
        id_col,
        "n_chars",
        *[f"n_{n}" for n in names],
        pred.alias("script_pred"),
        mix.alias("mix_ppm"),
    )


def delta_encode_postings(postings: DataFrame) -> DataFrame:
    """Gap-encode posting blocks — the layout every real index
    compresses into (Lucene/PforDelta family): within a block the
    doc_ids are ascending, so each entry stores the GAP from its
    predecessor (first entry keeps the absolute id). Gaps are small
    where lists are dense, which is what makes varint/PFor bytes
    shrink; here the gap table itself is the deliverable (Parquet's
    own bit-packing does the byte-level work on a gap column far
    better than on raw 64-bit ids).

    Pure ``transform`` projection over the aligned arrays — zero
    shuffle, zero Python; inverse-exact: ``doc_ids[i] = first_doc +
    cumsum(gaps[1:i])`` (roundtrip asserted in tests). Input is
    :func:`build_postings` output; all other columns pass through.
    """
    if "doc_ids" not in postings.columns:
        raise ValueError("expected build_postings output (doc_ids column)")
    gaps = F.transform(
        F.col("doc_ids"),
        lambda x, i: F.when(i == 0, x).otherwise(
            x - F.element_at(F.col("doc_ids"), i)
        ),
    )
    keep = [c for c in postings.columns if c != "doc_ids"]
    return postings.select(
        *keep,
        F.element_at("doc_ids", 1).alias("first_doc"),
        gaps.alias("doc_gaps"),
    )


def delta_decode_postings(encoded: DataFrame) -> DataFrame:
    """Inverse of :func:`delta_encode_postings`: rebuild absolute
    doc_ids from (first_doc, doc_gaps) with a per-row prefix-sum fold.
    Zero shuffle; ``decode(encode(x)) == x`` is the tested contract."""
    # single running fold carrying (acc, ids): linear per block — the
    # previous slice(1..i)+aggregate form re-summed every prefix
    # (O(block²) work and array copies per posting row)
    init = F.struct(
        F.lit(0).cast("long").alias("acc"),
        F.expr("cast(array() as array<bigint>)").alias("ids"),
    )
    ids = F.aggregate(
        F.col("doc_gaps"),
        init,
        lambda st, g: F.struct(
            (st["acc"] + g).alias("acc"),
            F.concat(st["ids"], F.array(st["acc"] + g)).alias("ids"),
        ),
        lambda st: st["ids"],
    )
    keep = [
        c for c in encoded.columns if c not in ("first_doc", "doc_gaps")
    ]
    return encoded.select(*keep, ids.alias("doc_ids"))


def delta_encode_positions(postings: DataFrame) -> DataFrame:
    """Gap-encode the POSITION lists of a positional index — the same
    compression layout :func:`delta_encode_postings` gives doc ids,
    applied at offset grain (Lucene's proximity data is stored exactly
    this way: positions are ascending within a (term, doc) entry, so
    each stores the gap from its predecessor; the first keeps the
    absolute offset). Within-document offsets are dense for frequent
    terms, so the gap column bit-packs far better than raw offsets.

    Pure nested ``transform`` — zero shuffle, zero Python; all other
    columns pass through. Input is :func:`build_positional_postings`
    output; inverse is :func:`delta_decode_positions` (roundtrip
    asserted in tests).
    """
    if "position_lists" not in postings.columns:
        raise ValueError(
            "expected build_positional_postings output "
            "(position_lists column)"
        )
    gaps = F.transform(
        F.col("position_lists"),
        lambda pl: F.transform(
            pl,
            lambda x, i: F.when(i == 0, x).otherwise(
                x - F.element_at(pl, i)
            ),
        ),
    )
    keep = [c for c in postings.columns if c != "position_lists"]
    return postings.select(*keep, gaps.alias("position_gaps"))


def delta_decode_positions(encoded: DataFrame) -> DataFrame:
    """Inverse of :func:`delta_encode_positions`: rebuild absolute
    offsets with a per-list prefix-sum fold. Zero shuffle;
    ``decode(encode(x)) == x`` is the tested contract."""
    init = F.struct(
        F.lit(0).cast("long").alias("acc"),
        F.expr("cast(array() as array<bigint>)").alias("ps"),
    )
    lists = F.transform(
        F.col("position_gaps"),
        lambda pg: F.aggregate(
            pg,
            init,
            lambda st, g: F.struct(
                (st["acc"] + g).alias("acc"),
                F.concat(st["ps"], F.array(st["acc"] + g)).alias("ps"),
            ),
            lambda st: st["ps"],
        ),
    )
    keep = [c for c in encoded.columns if c != "position_gaps"]
    return encoded.select(*keep, lists.alias("position_lists"))


def bm25f_search(
    docs: DataFrame,
    anchors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    anchor_id_col: str = "doc_id",
    anchor_text_col: str = "text",
    query_id_col: str = "query_id",
    query_text_col: str = "text",
    w_body: int = 1,
    w_anchor: int = 2,
) -> DataFrame:
    """Fielded BM25 (BM25F, Robertson/Zaragoza) over body + anchor
    text — the classic web-ranking insight (Brin & Page §2.2: what
    OTHER pages say in their links is a stronger signal than the page
    itself; Bing/Google-era ranking is fielded for exactly this
    reason). The anchor field is what :func:`~.graph.anchor_text_profile`
    aggregates; this operator RANKS with it.

    The weighted-field-concatenation form (integer weights, exact):

        tf′(d,w) = w_body·tf_body + w_anchor·tf_anchor
        dl′(d)   = w_body·dl_body + w_anchor·dl_anchor
        score    = idf_ppm·44·tf′·T′ div (20·tf′·T′ + 6·T′ + 18·dl′·N)

    with T′ = Σ dl′ and df(w) = #docs containing w in EITHER field —
    the same ppm-rounded idf and fixed-point discipline as
    :func:`bm25_term_weights`, so the oracle replays it bit-exactly.
    Multiple anchor rows per target concatenate (their token counts
    sum). Anchors pointing outside the corpus are dropped; docs with
    no anchors rank with dl_anchor = 0.

    Returns (query_id, doc_id, score_u, n_terms, rank) — ``n_terms``
    counts query terms hitting either field.

    Scale shape: each field tokenizes once (staged arrays); the
    DISTINCT query-term set broadcast-filters both tf tables BEFORE
    any wide join, so the (doc, term) combine, the df aggregate, the
    dl′ lookup and the rank window all run at candidate grain — the
    corpus-wide work is two tf aggregates and one dl′ aggregate, the
    same exchanges an index build pays anyway.
    """
    if w_body < 0 or w_anchor < 0 or w_body + w_anchor == 0:
        raise ValueError("field weights must be non-negative, not both 0")
    # localCheckpoint: each field tokenizes EXACTLY once — without the
    # lineage cut Catalyst re-runs tokenize+explode for every consumer
    # branch (tf, dl, the totals collect, the final scored plan), the
    # same re-tokenization bm25_term_weights/build_postings guard
    # against with the identical discipline
    body = fan_out(docs).select(
        F.col(id_col).alias("doc_id"),
        tokens_col(F.col(text_col)).alias("_toks"),
    ).localCheckpoint(eager=True)
    anch = anchors.select(
        F.col(anchor_id_col).alias("doc_id"),
        tokens_col(F.col(anchor_text_col)).alias("_toks"),
    ).localCheckpoint(eager=True)
    tf_b = (
        body.select("doc_id", F.explode("_toks").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("long").alias("tf_b"))
    )
    tf_a = (
        anch.select("doc_id", F.explode("_toks").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("long").alias("tf_a"))
    )
    dl_b = body.select(
        "doc_id", F.size("_toks").cast("long").alias("dl_b")
    )
    dl_a = anch.groupBy("doc_id").agg(
        F.sum(F.size("_toks")).cast("long").alias("dl_a")
    )
    # dl' over the corpus (body defines membership; anchors to unknown
    # docs drop via the left join)
    dlf = dl_b.join(dl_a, "doc_id", "left").select(
        "doc_id",
        (
            F.lit(w_body) * F.col("dl_b")
            + F.lit(w_anchor) * F.coalesce(F.col("dl_a"), F.lit(0))
        ).cast("long").alias("dlf"),
    ).localCheckpoint(eager=True)
    tot = dlf.agg(
        F.count("*").alias("n"), F.sum("dlf").alias("t")
    ).collect()[0]
    n_docs, t_tokens = int(tot["n"] or 0), int(tot["t"] or 0)
    if n_docs == 0 or t_tokens == 0:
        return docs.sparkSession.createDataFrame(
            [],
            "query_id long, doc_id long, score_u long, n_terms long, "
            "rank int",
        )
    # distinct() on the exploded pairs — duplicate query_id rows must
    # not double-count score_u/n_terms (same fix as bm25_search)
    qterms = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.explode(
            F.array_distinct(tokens_col(F.col(query_text_col)))
        ).alias("term"),
    ).distinct()
    terms = qterms.select("term").distinct()
    cand_b = tf_b.join(F.broadcast(terms), "term")
    cand_a = tf_a.join(F.broadcast(terms), "term").join(
        dl_b.select("doc_id"), "doc_id", "left_semi"
    )
    tfp = (
        cand_b.join(cand_a, ["doc_id", "term"], "full_outer")
        .select(
            "doc_id",
            "term",
            (
                F.lit(w_body) * F.coalesce(F.col("tf_b"), F.lit(0))
                + F.lit(w_anchor) * F.coalesce(F.col("tf_a"), F.lit(0))
            ).cast("long").alias("tfp"),
        )
        .filter(F.col("tfp") > 0)
    )
    df_t = tfp.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    idf_ppm = F.floor(
        F.log(F.lit(float(2 * (n_docs + 1))) / (2 * F.col("df") + 1))
        * 1_000_000
        + F.lit(0.5)
    ).cast("long")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    scored = (
        tfp.join(df_t, "term")
        .join(dlf, "doc_id")
        .join(F.broadcast(qterms), "term")
    )
    num = dec(idf_ppm) * 44 * dec(F.col("tfp")) * F.lit(t_tokens)
    den = (
        dec(F.lit(20 * t_tokens)) * dec(F.col("tfp"))
        + dec(F.lit(6 * t_tokens))
        + dec(F.lit(18 * n_docs)) * dec(F.col("dlf"))
    )
    contrib = scored.withColumns({"_num": num, "_den": den}).select(
        "query_id",
        "doc_id",
        F.expr("_num div _den").cast("long").alias("score_u"),
    )
    agg = contrib.groupBy("query_id", "doc_id").agg(
        F.sum("score_u").cast("long").alias("score_u"),
        F.count("*").cast("long").alias("n_terms"),
    )
    win = Window.partitionBy("query_id").orderBy(
        F.desc("score_u"), F.asc("doc_id")
    )
    return agg.withColumn("rank", F.row_number().over(win)).filter(
        F.col("rank") <= k
    )


def _dcg_discounts_u(k: int) -> list:
    """Frozen integer DCG discount table: floor(1e6/log2(rank+1)+0.5)
    for rank 1..k, computed ONCE in Python and embedded as literals in
    both engines — no cross-engine float ever enters the metric."""
    import math

    return [
        int(math.floor(1_000_000 / math.log2(r + 1) + 0.5))
        for r in range(1, k + 1)
    ]


def retrieval_metrics(
    run: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    *,
    query_id_col: str = "query_id",
    doc_id_col: str = "doc_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
) -> DataFrame:
    """TREC-style retrieval evaluation over a run table (the output
    shape of :func:`bm25_search` / :func:`bm25f_search`) against
    graded relevance judgments — the eval harness that closes the
    search story: build (postings), score (bm25), rank (search),
    MEASURE (this).

    Exact integer end-to-end: DCG uses the frozen discount table
    :func:`_dcg_discounts_u` (micro-units, same literals in both
    engines), IDCG re-ranks each query's judgments by (rel desc,
    doc_id asc) — deterministic ideal ordering — and every ratio is a
    floor division in ppm. Per query:

      (query_id, dcg_u, idcg_u, ndcg_ppm, rr_ppm, hits, n_rel,
       recall_ppm)

    - ``ndcg_ppm`` = dcg·1e6 div idcg (0 when the query has no
      positive judgments);
    - ``rr_ppm`` = 1e6 div (first relevant rank) — integer MRR;
    - ``recall_ppm`` = hits·1e6 div n_rel.

    Scale shape: one (query, doc) equi-join against the judgments,
    query-grain aggregates and one qrels-side rank window — runs and
    qrels are result-sized (queries × k), never corpus-sized; the
    discount lookup is a literal array element_at.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    disc = F.array(*[F.lit(w) for w in _dcg_discounts_u(k)])
    r = run.select(
        F.col(query_id_col).alias("query_id"),
        F.col(doc_id_col).alias("doc_id"),
        F.col(rank_col).cast("int").alias("rank"),
    ).filter(F.col("rank") <= k)
    j = qrels.select(
        F.col(query_id_col).alias("query_id"),
        F.col(doc_id_col).alias("doc_id"),
        F.col(rel_col).cast("long").alias("rel"),
    )
    joined = r.join(j, ["query_id", "doc_id"], "left").withColumn(
        "rel", F.coalesce(F.col("rel"), F.lit(0))
    )
    gains = joined.withColumn(
        "gain_u", F.col("rel") * F.element_at(disc, F.col("rank"))
    )
    per_run = gains.groupBy("query_id").agg(
        F.sum("gain_u").cast("long").alias("dcg_u"),
        F.sum((F.col("rel") > 0).cast("long")).cast("long").alias("hits"),
        F.min(F.when(F.col("rel") > 0, F.col("rank"))).alias("_first_rel"),
    )
    iwin = Window.partitionBy("query_id").orderBy(
        F.desc("rel"), F.asc("doc_id")
    )
    ideal = (
        j.filter(F.col("rel") > 0)
        .withColumn("_irank", F.row_number().over(iwin))
        .groupBy("query_id")
        .agg(
            F.sum(
                F.when(
                    F.col("_irank") <= k,
                    F.col("rel") * F.element_at(disc, F.col("_irank")),
                ).otherwise(F.lit(0))
            ).cast("long").alias("idcg_u"),
            F.count("*").cast("long").alias("n_rel"),
        )
    )
    out = per_run.join(ideal, "query_id", "left").select(
        "query_id",
        "dcg_u",
        F.coalesce(F.col("idcg_u"), F.lit(0)).alias("idcg_u"),
        "hits",
        F.coalesce(F.col("n_rel"), F.lit(0)).alias("n_rel"),
        "_first_rel",
    )
    return out.select(
        "query_id",
        "dcg_u",
        "idcg_u",
        F.when(
            F.col("idcg_u") > 0,
            F.expr("cast(dcg_u as decimal(38,0)) * 1000000 div idcg_u"),
        ).otherwise(F.lit(0)).cast("long").alias("ndcg_ppm"),
        F.when(
            F.col("_first_rel").isNotNull(),
            F.expr("1000000 div _first_rel").cast("long"),
        ).otherwise(F.lit(0)).alias("rr_ppm"),
        "hits",
        "n_rel",
        F.when(
            F.col("n_rel") > 0,
            F.expr("cast(hits as decimal(38,0)) * 1000000 div n_rel"),
        ).otherwise(F.lit(0)).cast("long").alias("recall_ppm"),
    )


def bm25_term_weights_from_postings(
    postings: DataFrame,
    k: int = 0,
    *,
    id_col: str = "doc_id",
) -> DataFrame:
    """:func:`bm25_term_weights` served from an already-built index —
    ZERO re-tokenization, the text column never participates.

    The keyword vocabulary is a pure FILTER of the index tokenizer
    (``keyword_tokens_col`` = ``tokens_col`` minus stop words and
    len<=2), so every input of the weight formula is recoverable from
    the postings alone: per-(doc, word) tf is the posting entry's tf,
    keyword dl is the per-doc SUM of kept-term tfs, df is the
    posting's own df column, and the keyword N/T scalars fall out of
    the dl aggregate. The integer formula is then bit-identical to the
    from-text build (parity-tested).

    Exactness requires an UNGATED index (min_df=1, max_df_ppm=10^6 —
    the defaults everywhere an index is persisted): a df-gated index
    has already dropped terms the from-text twin would weight.

    Scale shape: one filter+explode over the posting arrays back to
    (doc, word, tf) integer triples (checkpointed once — the dl
    aggregate, the N/T scalars and the weight join all read the
    materialized triples, and when ``postings`` is itself a lazy
    merge-on-read plan this stops each consumer re-running the
    merge), one doc-grain sum, one distinct over (term, df). Nothing
    wider than 24-byte rows shuffles; the corpus text is never read.
    """
    stop = F.array(*[F.lit(w) for w in STOP_WORDS_SORTED])
    kept = postings.filter(
        (F.length("term") > 2) & ~F.array_contains(stop, F.col("term"))
    )
    rows = (
        kept.select(
            "term", F.explode(F.arrays_zip("doc_ids", "tfs")).alias("_e")
        )
        .select(
            F.col("_e.doc_ids").alias(id_col),
            F.col("term").alias("word"),
            F.col("_e.tfs").cast("long").alias("tf"),
        )
        .localCheckpoint(eager=True)
    )
    dls = rows.groupBy(id_col).agg(F.sum("tf").cast("long").alias("dl"))
    tot = dls.agg(F.count("*").alias("n"), F.sum("dl").alias("t")).collect()[0]
    n_docs, t_tokens = int(tot["n"] or 0), int(tot["t"] or 0)
    if n_docs == 0:
        empty = rows.select(
            F.col(id_col), F.lit("").alias("word"),
            F.lit(0).alias("tf"), F.lit(0).alias("df"),
            F.lit(0).alias("dl"), F.lit(0).cast("long").alias("score_u"),
        )
        return empty.withColumn("rank", F.lit(0)) if k else empty
    # df is already materialized per term in the index (constant
    # across a term's blocks) — no second corpus-grain aggregate
    df_tbl = kept.select(F.col("term").alias("word"), "df").distinct()
    idf_ppm = F.floor(
        F.log(F.lit(float(2 * (n_docs + 1))) / (2 * F.col("df") + 1))
        * 1_000_000
        + F.lit(0.5)
    ).cast("long")
    joined = rows.join(df_tbl.withColumn("idf_ppm", idf_ppm), "word").join(
        dls, id_col
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    num = dec(F.col("idf_ppm")) * 44 * dec(F.col("tf")) * F.lit(t_tokens)
    den = (
        dec(F.lit(20 * t_tokens)) * dec(F.col("tf"))
        + dec(F.lit(6 * t_tokens))
        + dec(F.lit(18 * n_docs)) * dec(F.col("dl"))
    )
    out = joined.withColumns({"_num": num, "_den": den}).select(
        F.col(id_col), "word", "tf", "df", "dl",
        F.expr("_num div _den").cast("long").alias("score_u"),
    )
    if k:
        win = Window.partitionBy(id_col).orderBy(
            F.desc("score_u"), F.asc("word")
        )
        out = out.withColumn("rank", F.row_number().over(win)).filter(
            F.col("rank") <= k
        )
    return out


def _source_term_weights(
    postings: DataFrame,
    kw_doc_lens: DataFrame,
    n_docs: int,
    t_tokens: int,
    source_ids: list,
    id_col: str,
) -> DataFrame:
    """Candidate-grain :func:`bm25_term_weights` for the SOURCE docs
    only — the shape an interactive MLT call pays against a live
    index that persisted keyword norms (``doc_lengths(include_kw=
    True)``): the keyword N/T scalars arrive precomputed, df is the
    posting's own column, and the only work is one postings scan
    whose ``arrays_overlap`` filter drops every block not containing
    a source doc BEFORE any explode. Nothing corpus-grain runs —
    no aggregate, no checkpoint, no shuffle wider than the source
    docs' own posting rows."""
    stop = F.array(*[F.lit(w) for w in STOP_WORDS_SORTED])
    ids = [int(i) for i in source_ids]
    src_arr = F.array(*[F.lit(i).cast("long") for i in ids])
    kept = postings.filter(
        (F.length("term") > 2) & ~F.array_contains(stop, F.col("term"))
    )
    rows = (
        kept.filter(F.arrays_overlap("doc_ids", src_arr))
        .select(
            "term", "df",
            F.explode(F.arrays_zip("doc_ids", "tfs")).alias("_e"),
        )
        .select(
            F.col("_e.doc_ids").alias(id_col),
            F.col("term").alias("word"),
            F.col("_e.tfs").cast("long").alias("tf"),
            F.col("df"),
        )
        .filter(F.col(id_col).isin(ids))
    )
    dls = kw_doc_lens.filter(F.col("doc_id").isin(ids)).select(
        F.col("doc_id").alias(id_col), F.col("kw_dl").alias("dl")
    )
    joined = rows.join(F.broadcast(dls), id_col)
    idf_ppm = F.floor(
        F.log(F.lit(float(2 * (n_docs + 1))) / (2 * F.col("df") + 1))
        * 1_000_000
        + F.lit(0.5)
    ).cast("long")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    num = dec(idf_ppm) * 44 * dec(F.col("tf")) * F.lit(int(t_tokens))
    den = (
        dec(F.lit(20 * int(t_tokens))) * dec(F.col("tf"))
        + dec(F.lit(6 * int(t_tokens)))
        + dec(F.lit(18 * int(n_docs))) * dec(F.col("dl"))
    )
    return joined.withColumns({"_num": num, "_den": den}).select(
        F.col(id_col), "word", "tf", "df", "dl",
        F.expr("_num div _den").cast("long").alias("score_u"),
    )


def more_like_this(
    docs: Optional[DataFrame],
    source_ids: list,
    k: int = 10,
    m_terms: int = 5,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
    max_df_ppm: int = 1_000_000,
    index: Optional[dict] = None,
    term_weights: Optional[DataFrame] = None,
    search_postings: Optional[DataFrame] = None,
) -> DataFrame:
    """Lucene-style More-Like-This: find the documents most similar to
    a given one by querying the index with the source's most
    DISTINCTIVE terms — its top-``m_terms`` BM25 term weights
    (:func:`bm25_term_weights`, the keyword vocabulary: stop words and
    short tokens never pollute the query), ranked DAAT through
    :func:`bm25_search`. The lexical complement to the embedding
    similarity family (``sim_cosine_topk`` finds semantic neighbors;
    this finds vocabulary neighbors, explainably — the query terms ARE
    the explanation).

    The source document itself is excluded and ranks are re-densified,
    so rank 1 is the best OTHER document. Returns (query_id = source
    doc_id, doc_id, score_u, n_terms, rank).

    ``index`` is the interactive-use path (round-3 verdict fix): pass
    a prebuilt ``{postings, doc_lens, n_docs, t_tokens}`` — the
    :func:`~web_scrapper_spark.crawl.epoch.load_search_index` /
    ``CrawlEngine.search_index()`` output — and the call pays
    index-grain work only: query terms come from
    :func:`bm25_term_weights_from_postings` (integer triples, zero
    re-tokenization) and the search streams the same postings. The
    corpus TEXT is never read. ``term_weights`` optionally skips even
    that derivation with a persisted :func:`bm25_term_weights` table
    (ranked or unranked; ranked tables must have been built with
    ``k >= m_terms``) — an ``index`` dict carrying a persisted table
    as ``term_weights``/``term_weights_top_m`` keys (what
    ``load_search_index`` attaches for ``cfg.index_term_weights``
    crawls) is consumed automatically when ranked deep enough.
    ``search_postings`` (with ``index``) serves the
    Lucene df-gate semantics for a prebuilt index: query weights come
    from ``index`` (pass it UNGATED) while the DAAT search streams the
    gated view — mirroring what the self-build path does internally
    when ``min_df``/``max_df_ppm`` are non-default.

    Without ``index``, the self-build fallback constructs the index
    from ``docs`` (two text passes: the N/T norms projection and the
    postings build — the postings are checkpointed and then serve
    BOTH query formation and search, one tokenization fewer than
    building weights and postings independently).

    Scale shape: query formation is restricted to the source ids
    (driver-sized list, filter pushed to the triples scan); search is
    the bm25_search plan (broadcast query terms, candidate-grain
    everything). Exact integer end-to-end — the oracle replays BOTH
    stages glued, and from-index ≡ self-built ≡ oracle (parity- and
    hash-tested).
    """
    if not source_ids:
        raise ValueError("source_ids must be non-empty")
    ungated = (min_df, max_df_ppm) == (1, 1_000_000)
    if search_postings is not None and index is None:
        raise ValueError("search_postings requires index=")
    if index is not None:
        n_docs, t_tokens = int(index["n_docs"]), int(index["t_tokens"])
        if term_weights is None and index.get("term_weights") is not None:
            # the index carries a PERSISTED ranked weight table
            # (cfg.index_term_weights — load_search_index attaches it
            # only when fresh): query formation is a pure read. A
            # table ranked shallower than m_terms can't serve the
            # query and falls through to derivation.
            if int(index.get("term_weights_top_m") or 0) >= m_terms:
                term_weights = index["term_weights"]
        if term_weights is None:
            # query formation ALWAYS reads index["postings"] (pass it
            # ungated — Lucene MLT: a doc's distinctive terms don't
            # change because the search index elides stop terms);
            # search_postings, when given, gates only the search side
            if index.get("kw_doc_lens") is not None and index.get(
                "kw_n_docs"
            ):
                # the fast path: the index persisted keyword norms
                # (load_search_index over an index_articles crawl) —
                # query formation is candidate-grain, no corpus pass
                term_weights = _source_term_weights(
                    index["postings"],
                    index["kw_doc_lens"],
                    int(index["kw_n_docs"]),
                    int(index["kw_t_tokens"]),
                    source_ids,
                    id_col,
                )
            else:
                term_weights = bm25_term_weights_from_postings(
                    index["postings"], id_col=id_col
                )
        postings = (
            search_postings if search_postings is not None
            else index["postings"]
        )
    else:
        if docs is None:
            raise ValueError("pass docs= or index=")
        dls = doc_lengths(docs, id_col, text_col)
        tot = dls.agg(
            F.count("*").alias("n"), F.sum("dl").alias("t")
        ).collect()[0]
        n_docs, t_tokens = int(tot["n"] or 0), int(tot["t"] or 0)
        if term_weights is not None or ungated:
            # one tokenization: the (possibly trivially-gated) index
            postings = build_postings(
                docs, n_docs, id_col=id_col, text_col=text_col,
                min_df=min_df, max_df_ppm=max_df_ppm, include_dls=True,
            ).localCheckpoint(eager=True)
            if term_weights is None:
                term_weights = bm25_term_weights_from_postings(
                    postings, id_col=id_col
                )
        else:
            # df-gated search over self-built index: query weights are
            # ALWAYS ungated (a doc's distinctive terms don't change
            # because the search index elides stop terms — Lucene MLT
            # semantics). Build the UNGATED index once (the only text
            # pass besides the norms projection), derive the weights
            # from it, then gate a search view via the merge contract
            # (merge([build_ungated(A)], gates) ≡ build_gated(A))
            base = build_postings(
                docs, n_docs, id_col=id_col, text_col=text_col,
                include_dls=True,
            ).localCheckpoint(eager=True)
            term_weights = bm25_term_weights_from_postings(
                base, id_col=id_col
            )
            postings = merge_postings(
                [base], min_df=min_df, max_df_ppm=max_df_ppm,
                n_docs=n_docs,
            )
    src = term_weights.filter(
        F.col(id_col).isin([int(i) for i in source_ids])
    )
    if "rank" not in src.columns:
        twin = Window.partitionBy(id_col).orderBy(
            F.desc("score_u"), F.asc("word")
        )
        src = src.withColumn("rank", F.row_number().over(twin))
    src = src.filter(F.col("rank") <= m_terms)
    qdf = src.groupBy(F.col(id_col).alias("query_id")).agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("rank", "word"))),
                lambda x: x["word"],
            ),
        ).alias("text")
    )
    res = bm25_search(postings, qdf, n_docs, t_tokens, k=k + 1)
    others = res.filter(F.col("doc_id") != F.col("query_id"))
    win = Window.partitionBy("query_id").orderBy(
        F.desc("score_u"), F.asc("doc_id")
    )
    return (
        others.drop("rank")
        .withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
    )
