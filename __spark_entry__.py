"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship crawl epoch pipeline over a site
derived from sf0.001 ``documents``; ``queries()``/``oracle_sql()``
expose the SQL-expressible operator surface of SURVEY.md §2 (plus the
training-data ops) for the DuckDB correctness gate at sf0.01.

Design rules for oracle stability (driver compares order-insensitive
value-hashes after sorting columns by name):
- no raw float columns cross the comparison: money is integer cents,
  ratios are integer-scaled, similarity outputs emit ids/ranks or
  integer set sizes — so cross-engine float summation order can never
  flip a hash;
- shared hash functions are md5 (bit-identical in Spark and DuckDB);
- every aggregate/computed column is aliased identically on both sides.

Every query has an oracle. The ones DuckDB cannot recompute from the
parquet tables alone are oracled differently but no less strictly:
- ``crawl_epoch_seen`` — the pure-Python sequential reference
  simulator (crawl/simulator.py) runs inside ``oracle_sql()`` (no
  Spark) and its seen set is frozen into a VALUES table;
- ``multimodal_features`` — the deterministic fake decoder's expected
  features are recomputed in plain numpy and frozen into VALUES;
- ``dedup_simhash`` — the 64-bit bit-majority vote is expressed
  directly in DuckDB SQL (unnest → per-bit signed counts → bit sum);
- ``sim_ivf_topk`` — runs under a deterministic medoid quantizer so
  the full assign/probe/search pipeline is SQL-reproducible.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from web_scrapper_spark.operators import dedup as _dd
from web_scrapper_spark.operators import quality as _qual
from web_scrapper_spark.operators import similarity as _sim
from web_scrapper_spark.operators import textops as _tx
from web_scrapper_spark.sources import query_table as _query_table

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _read(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


_STOPLIST_SQL = ", ".join(f"'{w}'" for w in _tx.STOP_WORDS_SORTED)

# MinHash universal-hash constants shared verbatim with the Spark side
# (operators/dedup.py minhash_params) so both engines compute identical
# signatures.
_MH_P = _dd.MINHASH_PRIME


def _mh_sql_cols(num_hashes: int) -> str:
    return ",\n                     ".join(
        f"list_min(list_transform(h, x -> (x * {a} + {b}) % {_MH_P})) AS mh{i}"
        for i, (a, b) in enumerate(_dd.minhash_params(num_hashes))
    )

_TOKS_SQL = (
    "list_filter(string_split_regex(lower(text), '[^a-z0-9_]+'), x -> x <> '')"
)

# Winnowing fingerprint pipeline (k=3, w=4) as a DuckDB CTE chain —
# shared by the fingerprint_winnow and winnow_overlap_pairs oracles.
# Hash matches the engine's md5 → first 60 bits → mod 2^31-1 exactly.
_WINNOW_FPS_CTE = f"""sh AS (
              SELECT doc_id,
                     list_filter(
                       CASE WHEN len({_TOKS_SQL}) < 3
                            THEN [array_to_string({_TOKS_SQL}, ' ')]
                            ELSE list_transform(
                                   generate_series(1, len({_TOKS_SQL}) - 2),
                                   i -> array_to_string(({_TOKS_SQL})[i:i+2], ' '))
                       END, x -> x <> '') AS grams
              FROM documents
            ), hashed AS (
              SELECT doc_id,
                     list_transform(grams,
                       s -> ('0x' || substr(md5(s), 1, 15))::BIGINT % 2147483647
                     ) AS h
              FROM sh
            ), fps AS (
              SELECT doc_id,
                     CASE WHEN len(h) >= 4
                          THEN list_transform(generate_series(1, len(h) - 3),
                                              i -> list_min(h[i:i+3]))
                          WHEN len(h) > 0 THEN [list_min(h)]
                          ELSE [] END AS mins
              FROM hashed
            )"""


def _gopher_oracle_sql(src: str = "documents") -> str:
    """DuckDB twin of operators/quality.gopher_quality.

    Re-derives the modal-n-gram counts via unnest + GROUP BY +
    row_number (vs the engine's per-row sorted-run fold) — same
    answers, independent algorithm. All ratios are ppm BIGINTs built
    as round(num * 1e6 / den) with operand order matching the Spark
    side exactly, so the IEEE division is bit-identical.
    """
    t = _qual.GOPHER_THRESHOLDS_PPM

    def gram_ctes(n: int) -> str:
        return f"""g{n} AS (
              SELECT doc_id,
                     unnest(CASE WHEN len(t) >= {n}
                                 THEN list_transform(
                                        generate_series(1, len(t) - {n - 1}),
                                        i -> array_to_string(t[i:i+{n - 1}], ' '))
                                 ELSE [] END) AS g
              FROM feat
            ), c{n} AS (
              SELECT doc_id, g, count(*) AS c, len(g) - {n - 1} AS gl
              FROM g{n} GROUP BY doc_id, g
            )"""

    mode_cte = """m{n} AS (
              SELECT doc_id, c * gl AS chars{n}
              FROM (SELECT doc_id, c, gl,
                           row_number() OVER (
                             PARTITION BY doc_id
                             ORDER BY c DESC, gl DESC, g ASC) AS rn
                    FROM c{n})
              WHERE rn = 1
            )"""
    return f"""
            WITH base AS (
              SELECT doc_id, text, {_TOKS_SQL} AS t,
                     list_filter(
                       list_transform(string_split(text, chr(10)), x -> trim(x)),
                       x -> x <> '') AS lines
              FROM {src}
            ), feat AS (
              SELECT doc_id, t,
                     len(t) AS word_count,
                     COALESCE(list_sum(list_transform(t, x -> len(x))), 0) AS wchars,
                     len(lines) AS line_count,
                     len(lines) - len(list_distinct(lines)) AS dup_lines,
                     COALESCE(list_sum(list_transform(lines, x -> len(x))), 0) AS lchars,
                     COALESCE(list_sum(list_transform(list_distinct(lines), x -> len(x))), 0) AS dlchars,
                     len(list_filter(lines, l -> l LIKE '%...' OR l LIKE '%…')) AS ell_lines,
                     len(list_filter(lines, l -> substr(l, 1, 1) IN ('•', '-', '*'))) AS bullet_lines,
                     len(list_filter(t, x -> regexp_matches(x, '[a-z]'))) AS alpha_words,
                     len(text) - len(replace(text, '#', '')) AS hash_count,
                     (len(text) - len(replace(text, '...', ''))) / 3 AS ell_count
              FROM base
            ), {gram_ctes(2)}, {mode_cte.format(n=2)},
            {gram_ctes(3)}, {mode_cte.format(n=3)},
            {gram_ctes(4)}, {mode_cte.format(n=4)},
            {gram_ctes(5)}, d5 AS (
              SELECT doc_id, SUM((c - 1) * gl) AS dup5
              FROM c5 GROUP BY doc_id
            ), ppm AS (
              SELECT f.doc_id,
                     f.word_count,
                     CAST(round(f.wchars * 1000000.0 / greatest(f.word_count, 1)) AS BIGINT) AS mean_word_len_ppm,
                     f.line_count,
                     CAST(round(f.dup_lines * 1000000.0 / greatest(f.line_count, 1)) AS BIGINT) AS dup_line_ppm,
                     CAST(round((f.lchars - f.dlchars) * 1000000.0 / greatest(f.lchars, 1)) AS BIGINT) AS dup_line_char_ppm,
                     CAST(round(COALESCE(m2.chars2, 0) * 1000000.0 / greatest(f.wchars, 1)) AS BIGINT) AS top2_char_ppm,
                     CAST(round(COALESCE(m3.chars3, 0) * 1000000.0 / greatest(f.wchars, 1)) AS BIGINT) AS top3_char_ppm,
                     CAST(round(COALESCE(m4.chars4, 0) * 1000000.0 / greatest(f.wchars, 1)) AS BIGINT) AS top4_char_ppm,
                     CAST(round(COALESCE(d5.dup5, 0) * 1000000.0 / greatest(f.wchars, 1)) AS BIGINT) AS dup5_char_ppm,
                     CAST(round(f.ell_lines * 1000000.0 / greatest(f.line_count, 1)) AS BIGINT) AS ellipsis_line_ppm,
                     CAST(round(f.bullet_lines * 1000000.0 / greatest(f.line_count, 1)) AS BIGINT) AS bullet_line_ppm,
                     CAST(round(f.alpha_words * 1000000.0 / greatest(f.word_count, 1)) AS BIGINT) AS alpha_word_ppm,
                     CAST(round((f.hash_count + f.ell_count) * 1000000.0 / greatest(f.word_count, 1)) AS BIGINT) AS symbol_word_ppm
              FROM feat f
              LEFT JOIN m2 ON f.doc_id = m2.doc_id
              LEFT JOIN m3 ON f.doc_id = m3.doc_id
              LEFT JOIN m4 ON f.doc_id = m4.doc_id
              LEFT JOIN d5 ON f.doc_id = d5.doc_id
            )
            SELECT *,
                   (word_count BETWEEN {t["min_words"]} AND {t["max_words"]}
                    AND mean_word_len_ppm BETWEEN {t["min_mean_word_len_ppm"]} AND {t["max_mean_word_len_ppm"]}
                    AND dup_line_ppm <= {t["max_dup_line_ppm"]}
                    AND dup_line_char_ppm <= {t["max_dup_line_char_ppm"]}
                    AND top2_char_ppm <= {t["max_top2_char_ppm"]}
                    AND top3_char_ppm <= {t["max_top3_char_ppm"]}
                    AND top4_char_ppm <= {t["max_top4_char_ppm"]}
                    AND dup5_char_ppm <= {t["max_dup5_char_ppm"]}
                    AND ellipsis_line_ppm <= {t["max_ellipsis_line_ppm"]}
                    AND bullet_line_ppm <= {t["max_bullet_line_ppm"]}
                    AND alpha_word_ppm >= {t["min_alpha_word_ppm"]}
                    AND symbol_word_ppm <= {t["max_symbol_word_ppm"]}) AS gopher_keep
            FROM ppm
        """


def _cents(col):
    return F.round(col * 100).cast("long")


# ---------------------------------------------------------------------------
# entry — flagship crawl over a documents-derived site
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """One full crawl (multi-epoch) over a synthetic site derived from
    sf0.001 documents: frontier dequeue → politeness-bucketed fetch join
    → Arrow extraction → dedup-merge snapshots; returns the merged
    article rows joined back to documents with the byte-identity flag.
    """
    import tempfile

    from web_scrapper_spark.crawl.epoch import CrawlConfig, CrawlEngine
    from web_scrapper_spark.fixtures.docsite import docsite_pages
    from web_scrapper_spark.frontier.store import SnapshotStore
    from web_scrapper_spark.operators.textops import clean_text_col

    docs = _read(spark, "/root/testdata/sf0.001", "documents")
    pages, seeds, robots = docsite_pages(docs, n_hosts=8, page_size=20)
    robots_df = spark.createDataFrame(
        [(r["host"], r["disallow_prefixes"], r["crawl_delay"]) for r in robots],
        "host string, disallow_prefixes array<string>, crawl_delay double",
    )
    store = SnapshotStore(tempfile.mkdtemp(prefix="wss-entry-"))
    from web_scrapper_spark.extract.content import ContentConfig

    # configured content selector — like the reference's YAML config, it
    # bypasses the conventional-cascade length gate (content.py:832-835)
    # so short documents extract byte-identically too
    cfg = CrawlConfig(
        epoch_seconds=16.0,
        content=ContentConfig(
            selectors={"content": ".entry-content"},
            follow_next_page=True,
            max_pages=10**6,
        ),
    )
    engine = CrawlEngine(spark, store, pages.persist(), robots_df, cfg)
    engine.init(seeds)
    engine.run(max_epochs=20)
    articles = engine.articles()
    joined = articles.join(
        docs.select(
            F.concat(F.lit("Doc "), F.col("doc_id").cast("string")).alias("title"),
            clean_text_col(F.col("text")).alias("expected_content"),
        ),
        "title",
        "left",
    )
    return joined.select(
        "url",
        "title",
        "date",
        "content",
        "merge_kind",
        (F.col("content") == F.col("expected_content")).alias("content_byte_identical"),
    )


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def _q_a1_keywords_topk(spark, sf_dir):
    docs = _read(spark, sf_dir, "documents")
    return _tx.corpus_keywords_topk(docs, k=20)


def _q_a1_doc_keywords(spark, sf_dir):
    docs = _read(spark, sf_dir, "documents")
    return _tx.doc_keywords_topk(docs, k=3)


def _q_a2_doc_stats(spark, sf_dir):
    from web_scrapper_spark.operators.partitioning import fan_out

    docs = fan_out(_read(spark, sf_dir, "documents"))
    text = F.col("text")
    toks = _tx.tokens_col(text)
    stop = F.array(*[F.lit(w) for w in _tx.STOP_WORDS_SORTED])
    return docs.select(
        "doc_id",
        F.size(toks).alias("word_count"),
        F.length(text).alias("char_count"),
        (
            F.length(text) - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
        ).alias("punct_count"),
        F.size(F.filter(toks, lambda t: F.array_contains(stop, t))).alias("stop_hits"),
        F.greatest(
            F.lit(1), F.round(F.size(toks).cast("double") / F.lit(200.0)).cast("int")
        ).alias("reading_time_min"),
    )


def _q_lang_id(spark, sf_dir):
    docs = _read(spark, sf_dir, "documents")
    return _tx.language_id(docs)


def _q_paragraph_lang(spark, sf_dir):
    """CCNet-style paragraph-grain LID + target-language split
    (operators/textops.py paragraph_language_id). Every doc is salted
    with one German and one French marker paragraph so the split has
    non-keep paragraphs to drop on every row; text_kept must
    reassemble the surviving paragraphs byte-exactly in document
    order."""
    docs = _read(spark, sf_dir, "documents")
    salted = docs.select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.col("text"),
            F.lit(_PARA_LANG_SALT_DE),
            F.lit(_PARA_LANG_SALT_FR),
        ).alias("text"),
    )
    return _tx.paragraph_language_id(salted)


_PARA_LANG_SALT_DE = "der hund ist nicht mit das und ein haus"
_PARA_LANG_SALT_FR = "le chat est dans la maison pour une les"


def _q_line_dedup(spark, sf_dir):
    """Intra-doc repeated-line removal (operators/textops.py
    intra_doc_line_dedup — RefinedWeb line-wise correction). Docs are
    salted with one exact repeat of their own body plus a chrome line
    in two case/whitespace variants, so every doc drops exactly the
    repeated bytes and keeps first occurrences byte-exactly."""
    docs = _read(spark, sf_dir, "documents")
    salted = docs.select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.col("text"),
            F.lit("Repeated chrome line."),
            F.lit("REPEATED  chrome LINE."),
            F.col("text"),
        ).alias("text"),
    )
    return _tx.intra_doc_line_dedup(salted)


def _q_tok_bpe(spark, sf_dir):
    docs = _read(spark, sf_dir, "documents")
    return _tx.token_count_bpe(docs)


def _q_fingerprint(spark, sf_dir):
    docs = _read(spark, sf_dir, "documents")
    return _tx.fingerprint(docs)


def _q_dedup_exact(spark, sf_dir):
    docs = _read(spark, sf_dir, "documents")
    return _dd.dedup_exact(docs)


def _minhash_pair_candidates(spark, sf_dir):
    from web_scrapper_spark.operators.partitioning import fan_out

    # integer-exact output: set sizes instead of the float ratio; the
    # 0.4 jaccard threshold becomes the rational 5*inter >= 2*union.
    # fan_out BEFORE the tokenizing filter: the one-row-group scan
    # would otherwise run the whole tokenize pass on a single core.
    docs = fan_out(_read(spark, sf_dir, "documents")).filter(
        F.size(_tx.tokens_col(F.col("text"))) > 0
    )
    pairs = _dd.minhash_lsh_pairs(
        docs, num_hashes=4, band_size=1, shingle_n=3, jaccard_threshold=0.0
    )
    return pairs.filter(F.col("inter_size") * 5 >= F.col("union_size") * 2)


def _q_dedup_minhash(spark, sf_dir):
    return _minhash_pair_candidates(spark, sf_dir).select(
        "id_a", "id_b", "inter_size", "union_size"
    )


def _q_dedup_minhash_incr(spark, sf_dir):
    """Incremental MinHash/LSH (operators/dedup.py
    minhash_lsh_incremental): docs split into an indexed corpus
    (doc_id % 4 ≠ 0) and an arriving delta (doc_id % 4 = 0); the delta
    is deduped against the persisted band/shingle index plus itself.
    The oracle is the BATCH pair computation restricted to pairs with
    ≥1 delta doc — incremental must find exactly the batch answer."""
    from web_scrapper_spark.operators.partitioning import fan_out

    docs = fan_out(_read(spark, sf_dir, "documents")).filter(
        F.size(_tx.tokens_col(F.col("text"))) > 0
    )
    new = docs.filter(F.col("doc_id") % 4 == 0)
    old = docs.filter(F.col("doc_id") % 4 != 0)
    # the index is PERSISTED state in real usage (bands/shingles live
    # in the store); persist here so the shingle chain isn't re-run by
    # every consumer (band join + semi-join fetch) — measured ~2x
    index_sh = _dd.shingled_docs(old, shingle_n=3).persist()
    index_bands = _dd.minhash_bands(
        old, num_hashes=4, band_size=1, shingle_n=3, shingled=index_sh
    ).persist()
    pairs, _, _ = _dd.minhash_lsh_incremental(
        new, index_bands, index_sh,
        num_hashes=4, band_size=1, shingle_n=3, jaccard_threshold=0.0,
    )
    return pairs.filter(
        F.col("inter_size") * 5 >= F.col("union_size") * 2
    ).select("id_a", "id_b", "inter_size", "union_size", "pair_kind")


def _q_dedup_components(spark, sf_dir):
    """Duplicate-cluster transitive closure over the MinHash/LSH pair
    graph (alternating large-star/small-star, operators/dedup.py) —
    one canonical document per near-dup CLUSTER, not per pair."""
    docs = _read(spark, sf_dir, "documents")
    pairs = _minhash_pair_candidates(spark, sf_dir).select("id_a", "id_b")
    return _dd.dedup_components(docs, pairs)


def _q_dsir_weights(spark, sf_dir):
    """DSIR importance weights (operators/quality.py): target domain =
    the deterministic doc_id % 10 == 0 slice; bigram features hashed
    into 512 buckets; ln computed on exact integer counts driver-side
    and reproduced by DuckDB's ln in the oracle."""
    docs = _read(spark, sf_dir, "documents")
    target = docs.filter(F.col("doc_id") % 10 == 0)
    return _qual.dsir_weights(docs, target, n=2, buckets=512)


def _q_decontaminate(spark, sf_dir):
    """Benchmark n-gram decontamination (operators/quality.py): the
    'eval set' is the deterministic doc_id % 50 == 0 slice, so hits are
    self-contamination plus genuine cross-document 5-gram shares."""
    docs = _read(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    return _qual.decontaminate(docs, bench, n=5)


def _q_dedup_embedding(spark, sf_dir):
    # threshold 0.3: the synthetic embeddings top out at ~0.47 within-label
    # cosine, so 0.8 matched zero pairs and the check was vacuous; 0.3
    # yields ~100 pairs at sf0.01 and actually exercises the cosine path
    emb = _read(spark, sf_dir, "embeddings")
    return _dd.embedding_near_pairs(emb, threshold=0.3).select("id_a", "id_b")


def _q_sim_topk(spark, sf_dir):
    emb = _read(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return _sim.cosine_topk(queries, emb, k=5).select("query_id", "rank", "vec_id")


def _q_srp_topk(spark, sf_dir):
    """SRP-LSH ANN (operators/similarity.py srp_topk — Charikar
    random-hyperplane signatures with exact integer fixed-point dot
    products): same 8 queries as sim_cosine_topk, 16 planes in 4
    bands, candidates from band equality, exact cosine verify. The
    oracle rebuilds the identical md5-derived sign matrix and replays
    the full block-then-verify pipeline."""
    emb = _read(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return _sim.srp_topk(queries, emb, k=5).select("query_id", "rank", "vec_id")


def _srp_oracle_sql() -> str:
    """DuckDB twin of srp_topk: the 16 plane bits unrolled, the same
    quantization casts, band keys, OR-of-bands candidate join, cosine
    rank."""
    def bit(p: int) -> str:
        sign = (
            "CASE WHEN strpos('02468ace', substr(md5('srp:" + str(p)
            + ":' || CAST(j - 1 AS VARCHAR)), 1, 1)) > 0 THEN 1 ELSE -1 END"
        )
        return (
            "CASE WHEN list_sum(list_transform(generate_series(1, len(embedding)), "
            f"j -> CAST(round(CAST(embedding[j] AS DOUBLE) * 1000000.0) AS BIGINT) * ({sign})"
            f")) > 0 THEN '1' ELSE '0' END AS b{p}"
        )

    bits = ",\n                     ".join(bit(p) for p in range(16))
    keys = ", ".join(
        f"(b{b * 4} || b{b * 4 + 1} || b{b * 4 + 2} || b{b * 4 + 3}) AS k{b}"
        for b in range(4)
    )
    on = " OR ".join(f"q.k{b} = c.k{b}" for b in range(4))
    return f"""
        WITH sig AS (
          SELECT vec_id, embedding,
                     {bits}
          FROM embeddings
        ), keyed AS (
          SELECT vec_id, embedding, {keys} FROM sig
        ), cand AS (
          SELECT q.vec_id AS query_id, c.vec_id,
                 q.embedding AS qv, c.embedding AS cv
          FROM keyed q JOIN keyed c ON ({on})
          WHERE q.vec_id < 8
        ), scored AS (
          SELECT DISTINCT query_id, vec_id, qv, cv FROM cand
        )
        SELECT query_id,
               row_number() OVER (
                 PARTITION BY query_id
                 ORDER BY list_cosine_similarity(qv, cv) DESC, vec_id ASC
               ) AS rank,
               vec_id
        FROM scored QUALIFY rank <= 5
    """


def _q_bpe_pairs(spark, sf_dir):
    """BPE merge-pair statistics (operators/textops.py
    bpe_pair_counts): corpus-wide adjacent-symbol pair frequencies
    over the word-frequency table with the </w> end marker — the
    next-merge candidates of tokenizer training. Top-30 by (freq desc,
    pair asc); the oracle replays the word table, per-word pair
    expansion, and the global rank."""
    docs = _read(spark, sf_dir, "documents")
    return _tx.bpe_pair_counts(docs, k=30)


def _q_bpe_learn(spark, sf_dir):
    """Full iterative BPE tokenizer training (operators/bpe.py
    bpe_learn): learn the first 24 merge rules. One corpus pass builds
    the Zipf-compressed word-frequency table; each merge is a pair
    aggregate (top-1 TakeOrdered — one row to the driver) plus a
    JVM-side fold applying the merge, with the active word set
    shrinking as words collapse. Runs on the deterministic fixture
    corpus (the oracle is the sequential reference twin frozen into a
    VALUES table, the crawl_epoch_seen pattern)."""
    from web_scrapper_spark.operators import bpe

    docs = bpe.fixture_docs(spark)
    return bpe.bpe_learn(docs, n_merges=24)


def _bpe_learn_oracle_sql() -> str:
    """Expected merge table from the sequential reference BPE
    (operators/bpe.py learn_bpe_sequential) over the same fixture
    word histogram — plain Python, frozen into VALUES."""
    if "bpe_learn" not in _ORACLE_CACHE:
        from web_scrapper_spark.operators.bpe import (
            fixture_word_freqs,
            learn_bpe_sequential,
        )

        merges = learn_bpe_sequential(fixture_word_freqs(), 24)
        rows = ",\n              ".join(
            f"({r}, '{l}', '{rt}', '{m}', {f})" for r, l, rt, m, f in merges
        )
        _ORACLE_CACHE["bpe_learn"] = (
            f"SELECT * FROM (VALUES {rows}) AS t(rank, lhs, rhs, merged, freq)"
        )
    return _ORACLE_CACHE["bpe_learn"]


def _q_bpe_encode(spark, sf_dir):
    """Tokenizer inference (operators/bpe.py bpe_encode): apply the
    24-rule learned merge table to the fixture corpus via Arrow
    mapInPandas with per-batch distinct-word memoization. The merge
    table comes from the sequential trainer (identical to bpe_learn's
    output — asserted by the bpe_learn oracle); the oracle re-encodes
    every document with the independent min-rank-pair encoder."""
    from web_scrapper_spark.operators import bpe

    merges = bpe.learn_bpe_sequential(bpe.fixture_word_freqs(), 24)
    docs = bpe.fixture_docs(spark)
    return bpe.bpe_encode(docs, merges)


def _bpe_encode_oracle_sql() -> str:
    """Expected per-doc encodings from the min-rank reference encoder
    (operators/bpe.py encode_word_minrank) — frozen into VALUES."""
    if "bpe_encode" not in _ORACLE_CACHE:
        import hashlib
        import re as _re

        from web_scrapper_spark.operators.bpe import (
            encode_word_minrank,
            fixture_doc_texts,
            fixture_word_freqs,
            learn_bpe_sequential,
        )

        merges = learn_bpe_sequential(fixture_word_freqs(), 24)
        ranks = {(m[1], m[2]): m[0] for m in merges}
        values = []
        tok_re = _re.compile(r"[^a-z0-9_]+")
        for doc_id, text in fixture_doc_texts():
            words = [w for w in tok_re.split(text.lower()) if w]
            subs: list[str] = []
            for w in words:
                subs.extend(encode_word_minrank(w, ranks))
            fp = hashlib.md5(" ".join(subs).encode("utf-8")).hexdigest()
            values.append(f"({doc_id}, {len(words)}, {len(subs)}, '{fp}')")
        rows = ",\n              ".join(values)
        _ORACLE_CACHE["bpe_encode"] = (
            f"SELECT * FROM (VALUES {rows}) "
            "AS t(doc_id, n_words, n_subwords, subword_fingerprint)"
        )
    return _ORACLE_CACHE["bpe_encode"]


def _q_s11_query_loader(spark, sf_dir):
    orders = _read(spark, sf_dir, "orders")
    out = _query_table(
        orders,
        columns=["o_orderkey", "o_totalprice"],
        where="o_totalprice > 100",
        order_by="o_totalprice DESC, o_orderkey",
        limit=50,
        offset=10,
    )
    return out.select("o_orderkey", _cents(F.col("o_totalprice")).alias("price_cents"))


def _q_o2_topk(spark, sf_dir):
    orders = _read(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
        .select("o_orderkey", _cents(F.col("o_totalprice")).alias("price_cents"))
    )


def _q_tpch_q1ish(spark, sf_dir):
    li = _read(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
            F.sum(_cents(F.col("l_extendedprice"))).alias("sum_base_cents"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def _q_j2_lookup_join(spark, sf_dir):
    li = _read(spark, sf_dir, "lineitem")
    part = _read(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
        )
        .orderBy("p_brand")
    )


def _q_j3_seen_antijoin(spark, sf_dir):
    orders = _read(spark, sf_dir, "orders")
    customer = _read(spark, sf_dir, "customer")
    seen = customer.filter(F.col("c_acctbal") > 0).select(
        F.col("c_custkey").alias("o_custkey")
    )
    return (
        orders.join(seen, "o_custkey", "left_anti")
        .select("o_orderkey", "o_custkey")
    )


def _q_j1_coalesce_merge(spark, sf_dir):
    customer = _read(spark, sf_dir, "customer")
    listing = customer.select(
        "c_custkey",
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg_listing"),
    )
    full = customer.select("c_custkey", F.col("c_mktsegment").alias("seg_full"))
    merged = listing.join(full, "c_custkey", "full_outer")
    return merged.select(
        "c_custkey",
        F.when(
            F.col("seg_listing").isNull() | (F.col("seg_listing") == ""),
            F.coalesce("seg_full", "seg_listing"),
        )
        .otherwise(F.col("seg_listing"))
        .alias("segment"),
    )


def _q_w1_perhost_rank(spark, sf_dir):
    from pyspark.sql import Window

    events = _read(spark, sf_dir, "events")
    win = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    return (
        events.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= 3)
        .select("user_id", "rank", "event_id")
    )


def _q_t_sessionize(spark, sf_dir):
    from pyspark.sql import Window

    events = _read(spark, sf_dir, "events")
    w_user = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    epoch = F.unix_timestamp("ts")
    gapped = events.withColumn(
        "new_session",
        (
            (epoch - F.lag(epoch, 1).over(w_user)) > 1800
        ).cast("int"),
    ).withColumn(
        "session_id",
        F.sum(F.coalesce(F.col("new_session"), F.lit(0))).over(
            w_user.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return (
        gapped.groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("event_id").alias("first_event"),
            F.max("event_id").alias("last_event"),
        )
    )


def _q_a4_run_report(spark, sf_dir):
    events = _read(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(_cents(F.col("value"))).alias("value_cents"),
        )
        .orderBy("event_type")
    )


def _q_u1_union_dedup(spark, sf_dir):
    events = _read(spark, sf_dir, "events")
    a = events.filter(F.col("event_type") == "purchase").select("event_id", "user_id")
    b = events.filter(F.col("value") > 150).select("event_id", "user_id")
    return a.unionByName(b).distinct()


def _q_f7_email_valid(spark, sf_dir):
    customer = _read(spark, sf_dir, "customer")
    email = F.concat(
        F.lit("user"),
        F.col("c_custkey").cast("string"),
        F.lit("@"),
        F.when(F.col("c_custkey") % 4 == 0, F.lit("example.com"))
        .when(F.col("c_custkey") % 4 == 1, F.lit("TEST.com"))
        .when(F.col("c_custkey") % 4 == 2, F.lit("real-domain.org"))
        .otherwise(F.lit("bad_domain")),
    )
    return customer.select(
        "c_custkey",
        email.alias("email"),
        _tx.email_valid_col(email).alias("email_valid"),
    )


def _q_f8_phone_valid(spark, sf_dir):
    customer = _read(spark, sf_dir, "customer")
    phone = F.when(
        F.col("c_custkey") % 3 == 0,
        F.concat(
            F.lit("("),
            F.lpad((F.col("c_custkey") % 700 + 200).cast("string"), 3, "0"),
            F.lit(") 867-"),
            F.lpad((F.col("c_custkey") % 9000 + 1000).cast("string"), 4, "0"),
        ),
    ).when(F.col("c_custkey") % 3 == 1, F.lit("12345678")).otherwise(F.lit("555"))
    return customer.select(
        "c_custkey",
        phone.alias("phone"),
        _tx.phone_valid_col(phone).alias("phone_valid"),
    )


def _q_f9_url_valid(spark, sf_dir):
    part = _read(spark, sf_dir, "part")
    url = F.when(
        F.col("p_partkey") % 3 == 0,
        F.concat(F.lit("https://shop.example.org/p/"), F.col("p_partkey").cast("string")),
    ).when(F.col("p_partkey") % 3 == 1, F.lit("http://localhost/x")).otherwise(
        F.lit("gopher://nope.org/")
    )
    return part.select(
        "p_partkey", url.alias("url"), _tx.url_valid_col(url).alias("url_valid")
    )


def _q_f10_date_valid(spark, sf_dir):
    orders = _read(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    datestr = (
        F.when(F.col("o_orderkey") % 3 == 0, F.date_format(d, "yyyy-MM-dd"))
        .when(F.col("o_orderkey") % 3 == 1, F.date_format(d, "MM/dd/yyyy"))
        .otherwise(F.lit("not a date"))
    )
    return orders.select(
        "o_orderkey",
        datestr.alias("datestr"),
        _tx.date_valid_col(datestr).alias("date_valid"),
    )


def _q_f11_ip_valid(spark, sf_dir):
    customer = _read(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    ip = F.concat_ws(
        ".",
        (k % 300).cast("string"),
        (k % 256).cast("string"),
        ((k * 7) % 256).cast("string"),
        ((k * 13) % 256).cast("string"),
    )
    return customer.select(
        "c_custkey", ip.alias("ip"), _tx.ip_valid_col(ip).alias("ip_valid")
    )


def _q_f13_json_extract(spark, sf_dir):
    events = _read(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_value"),
    )


def _q_f18_date_normalize(spark, sf_dir):
    orders = _read(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    raw = F.when(F.col("o_orderkey") % 2 == 0, F.date_format(d, "MM/dd/yyyy")).otherwise(
        F.date_format(d, "yyyy/MM/dd")
    )
    normalized = F.coalesce(
        F.try_to_timestamp(raw, F.lit("MM/dd/yyyy")),
        F.try_to_timestamp(raw, F.lit("yyyy/MM/dd")),
    )
    return orders.select(
        "o_orderkey",
        raw.alias("raw_date"),
        F.date_format(normalized, "yyyy-MM-dd").alias("iso_date"),
    )


def _q_f19_price_parse(spark, sf_dir):
    part = _read(spark, sf_dir, "part")
    cents = _cents(F.col("p_retailprice"))
    price_text = F.concat(
        F.lit("Sale: $"),
        (cents / 100).cast("long").cast("string"),
        F.lit("."),
        F.lpad((cents % 100).cast("string"), 2, "0"),
        F.lit(" only"),
    )
    return part.select(
        "p_partkey",
        price_text.alias("price_text"),
        _cents(_tx.price_parse_col(price_text)).alias("parsed_cents"),
    )


def _q_f1_clean_text(spark, sf_dir):
    customer = _read(spark, sf_dir, "customer")
    messy = F.concat(
        F.lit("  “"),
        F.col("c_name"),
        F.lit("”\t has   balance\x07 stuff  "),
    )
    return customer.select(
        "c_custkey", _tx.clean_text_col(messy).alias("cleaned")
    )


def _q_p7_availability(spark, sf_dir):
    part = _read(spark, sf_dir, "part")
    raw = (
        F.when(F.col("p_partkey") % 5 == 0, F.lit("Currently In  Stock!"))
        .when(F.col("p_partkey") % 5 == 1, F.lit("OUT of stock"))
        .when(F.col("p_partkey") % 5 == 2, F.lit("available next week"))
        .when(F.col("p_partkey") % 5 == 3, F.lit("item unavailable"))
        .otherwise(F.lit("ships whenever"))
    )
    return part.select(
        "p_partkey",
        raw.alias("raw_status"),
        _tx.availability_normalize_col(raw).alias("availability"),
    )


def _q_f21_canonicalize(spark, sf_dir):
    from web_scrapper_spark.crawl.epoch import canonical_url_col

    docs = _read(spark, sf_dir, "documents")
    # doc_id%3 picks the port flavor: none / default :443 (stripped) /
    # non-default :8443 (KEPT — the port is part of the URL identity)
    raw = F.concat(
        F.lit("HTTPS://Docs"),
        (F.col("doc_id") % 5).cast("string"),
        F.lit(".Example.ORG"),
        F.when(F.col("doc_id") % 3 == 1, F.lit(":443"))
        .when(F.col("doc_id") % 3 == 2, F.lit(":8443"))
        .otherwise(F.lit("")),
        F.lit("/view"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("?page=2#frag")).otherwise(F.lit("#top")),
    )
    return docs.select(
        "doc_id",
        raw.alias("raw_url"),
        canonical_url_col("raw_url").alias("canonical_url"),
    ).select("doc_id", "raw_url", "canonical_url")


# -- rows-only entries (non-SQL-expressible; strong checks in tests/) -------


def _q_crawl_epoch_seen(spark, sf_dir):
    import tempfile

    from web_scrapper_spark.crawl.epoch import CrawlConfig, CrawlEngine
    from web_scrapper_spark.fixtures import (
        SiteSpec,
        pages_dataframe,
        robots_dataframe,
        seed_urls,
    )
    from web_scrapper_spark.frontier.store import SnapshotStore

    spec = SiteSpec()
    store = SnapshotStore(tempfile.mkdtemp(prefix="wss-q-"))
    engine = CrawlEngine(
        spark, store, pages_dataframe(spark, spec), robots_dataframe(spark, spec),
        CrawlConfig(),
    )
    seeds = [
        (u, "ecommerce" if u.endswith("/products") else
         "business" if u.endswith("/directory") else "content")
        for u in seed_urls(spec)
    ]
    engine.init(seeds)
    engine.run(max_epochs=30)
    return engine.seen().select("url", "status", "ord_key", "depth")


def _q_crawl_content_seen(spark, sf_dir):
    """Content-seen filter (crawl/epoch.py content_seen_filter —
    Heritrix's content-seen dedup): 12 single-host seeds whose bodies
    replay 5 unique fixture pages. The first copy of each body in
    crawl order is processed ("ok"); every later byte-identical body
    skips extraction and lands in seen as "dup". Single host + one
    epoch, so engine crawl order == seed order and the plain-Python
    oracle replay is exact."""
    import tempfile

    from web_scrapper_spark.crawl.epoch import CrawlConfig, CrawlEngine
    from web_scrapper_spark.fixtures.sitegen import (
        PAGES_SCHEMA,
        SiteSpec,
        page_html,
    )
    from web_scrapper_spark.frontier.store import SnapshotStore

    spec = SiteSpec()
    urls = [f"https://hosta.example-crawl.org/p{i:02d}" for i in range(12)]
    bodies = [
        page_html(
            f"https://host0.example-crawl.org/blog/post-{i % 5}", spec
        ).encode("utf-8")
        for i in range(12)
    ]
    pages = spark.createDataFrame(
        [(u, None, b, None, None) for u, b in zip(urls, bodies)], PAGES_SCHEMA
    )
    robots = spark.createDataFrame(
        [("hosta.example-crawl.org", [], 0.01)],
        "host string, disallow_prefixes array<string>, crawl_delay double",
    )
    store = SnapshotStore(tempfile.mkdtemp(prefix="wss-cs-"))
    engine = CrawlEngine(
        spark, store, pages, robots,
        CrawlConfig(max_depth=0, content_seen_filter=True),
    )
    engine.init([(u, "content") for u in urls])
    engine.run(max_epochs=3)
    return engine.seen().select("url", "status")


def _q_crawl_revisit(spark, sf_dir):
    """Freshness-driven revisit epochs (crawl/epoch.py
    enqueue_revisits — Nutch's adaptive fetch schedule over sitemap
    changefreq hints): 12 single-host seeds all fetched in epoch 0;
    urls with doc index % 3 == 0 carry an ``always`` changefreq hint,
    so they are DUE one epoch after fetch and get refetched in the
    next crawl wave (epoch 2 — epoch 1 is the scheduling-only revisit
    commit). The others sit on the hint-less default period (7 epochs)
    and are NOT due. The seen set becomes multi-capture: one (epoch 0)
    row per url plus a second (epoch 2) row for exactly the hinted
    subset — the oracle derives the same set from the index arithmetic
    alone, so a hash match proves the due-rule join, the frontier
    re-enqueue, and the second fetch wave end-to-end."""
    import tempfile

    from web_scrapper_spark.crawl.epoch import CrawlConfig, CrawlEngine
    from web_scrapper_spark.fixtures.sitegen import (
        PAGES_SCHEMA,
        SiteSpec,
        page_html,
    )
    from web_scrapper_spark.frontier.store import SnapshotStore

    spec = SiteSpec()
    urls = [f"https://rv.example-crawl.org/p{i:02d}" for i in range(12)]
    bodies = [
        page_html(
            f"https://host0.example-crawl.org/blog/post-{i % 5}", spec
        ).encode("utf-8")
        for i in range(12)
    ]
    pages = spark.createDataFrame(
        [(u, None, b, None, None) for u, b in zip(urls, bodies)], PAGES_SCHEMA
    )
    robots = spark.createDataFrame(
        [("rv.example-crawl.org", [], 0.01)],
        "host string, disallow_prefixes array<string>, crawl_delay double",
    )
    store = SnapshotStore(tempfile.mkdtemp(prefix="wss-rv-"))
    engine = CrawlEngine(spark, store, pages, robots, CrawlConfig(max_depth=0))
    engine.init([(u, "content") for u in urls])
    engine.run(max_epochs=5)
    hints = spark.createDataFrame(
        [(u, None, "always", None) for i, u in enumerate(urls) if i % 3 == 0],
        "url string, lastmod string, changefreq string, priority_ppm int",
    )
    engine.enqueue_revisits(hints=hints)
    engine.run(max_epochs=5)
    # close() first: it drops the hot-carry checkpoint blocks, so the
    # returned view must be the cold merge-on-read scan of the store,
    # not a reference to freed blocks
    engine.close()
    return engine.seen().select("url", "status", "fetched_epoch")


def _q_volatility_revisit(spark, sf_dir):
    """Observed-evidence adaptive recrawl, composed end-to-end
    (frontier/recrawl.py host_volatility → volatility_hints →
    recrawl_due, the Cho & Garcia-Molina loop): documents become a
    synthetic capture log — 3 captures per url at ts 0/P/2P with
    P = host index + 1; EVEN-indexed hosts change digest every revisit
    (observed cadence P hours), ODD hosts never change (stability
    evidence → max_hours backoff). volatility_hints turns the measured
    cadence into per-url period_hours, which override the (absent)
    changefreq vocabulary inside recrawl_due. At epoch 10 with 1-hour
    epochs exactly the even hosts with P <= 10 are due — the oracle
    derives the same set from the index arithmetic alone, so a hash
    match proves the lag/aggregate evidence chain, the clamped period
    mapping, and the override precedence."""
    from web_scrapper_spark.frontier.recrawl import (
        host_volatility,
        recrawl_due,
        volatility_hints,
    )

    docs = _read(spark, sf_dir, "documents")
    h = (F.col("doc_id") % 20).cast("int")
    host = F.concat(F.lit("h"), h.cast("string"), F.lit(".example.org"))
    url = F.concat(
        F.lit("https://"), host, F.lit("/d"), F.col("doc_id").cast("string")
    )
    base = docs.select(
        url.alias("url"), host.alias("host"), h.alias("_h")
    )
    P = (F.col("_h") + 1).cast("long")
    changed = F.col("_h") % 2 == 0
    caps = base.select(
        "host",
        "url",
        F.explode(
            F.array(
                F.struct(
                    F.lit(0).cast("long").alias("ts"),
                    F.lit("d0").alias("digest"),
                ),
                F.struct(
                    P.alias("ts"),
                    F.when(changed, F.lit("d1")).otherwise(F.lit("d0")).alias(
                        "digest"
                    ),
                ),
                F.struct(
                    (P * 2).alias("ts"),
                    F.when(changed, F.lit("d2")).otherwise(F.lit("d0")).alias(
                        "digest"
                    ),
                ),
            )
        ).alias("c"),
    ).select("host", "url", "c.ts", "c.digest")
    hints = volatility_hints(host_volatility(caps), base.select("url", "host"))
    seen = base.select("url", F.lit(0).cast("int").alias("fetched_epoch"))
    due = recrawl_due(seen, hints, current_epoch=10, epoch_hours=1)
    return due.select(
        "url",
        "fetched_epoch",
        "due_epoch",
        F.coalesce("priority_ppm", F.lit(-1)).alias("priority_ppm"),
        "reason",
    )


def _q_dedup_simhash(spark, sf_dir):
    docs = _read(spark, sf_dir, "documents")
    return _dd.simhash_df(docs)


def _q_mirror_hosts(spark, sf_dir):
    """Mirror-host detection (dedup.mirror_host_pairs): documents are
    laid out over 8 origin hosts h0..h7, and every doc_id % 3 == 0 page
    is replayed at the same path on a mirror domain m0..m7 — each
    mirror carries a subset of its origin, so containment is 100 and
    all 8 (hK, mK) pairs must be reported, nothing else."""
    docs = _read(spark, sf_dir, "documents")
    base = docs.select(
        F.concat(F.lit("h"), (F.col("doc_id") % 8).cast("string")).alias("host"),
        F.concat(F.lit("/d/"), F.col("doc_id").cast("string")).alias("path"),
        "text",
    )
    mirror = docs.filter(F.col("doc_id") % 3 == 0).select(
        F.concat(F.lit("m"), (F.col("doc_id") % 8).cast("string")).alias("host"),
        F.concat(F.lit("/d/"), F.col("doc_id").cast("string")).alias("path"),
        "text",
    )
    pages = base.unionByName(mirror)
    return _dd.mirror_host_pairs(
        pages, min_shared=3, containment_centi=80, max_hosts_per_key=64
    )


def _q_dhash_pairs(spark, sf_dir):
    """Perceptual image dedup (multimodal.dhash_near_pairs): 64 bitmap
    images, the last 16 replaying the first 16 with the lowest i%4 bits
    flipped — near-dup pairs planted at Hamming 0..3. The oracle brute-
    forces all C(64,2) pairs in plain numpy; the Spark side must find
    exactly that set via the pigeonhole chunk blocking."""
    from web_scrapper_spark.operators import multimodal as mm

    mm.register_decoder("image", mm.bitmap_payload_decoder)
    media = spark.createDataFrame(
        mm.planted_bitmap_media_rows(n=64, period=48), mm.MEDIA_SCHEMA
    )
    return mm.dhash_near_pairs(media, max_hamming=3, n_chunks=8)


def _q_png_decode(spark, sf_dir):
    """REAL compressed-raster decode (multimodal.png_decode_pixels):
    56 genuine PNGs (stdlib-zlib IDAT, all five scanline filters)
    covering the web's shapes — 8/16-bit gray, gray+alpha, RGB, RGBA,
    indexed-palette, packed 1/2/4-bit favicon depths, sequential and
    Adam7-interlaced — decoded to pixels inside the Arrow pass; output
    is exact integer luma statistics + the decoded-pixel dHash. The
    oracle re-decodes every payload with an INDEPENDENT pure-Python
    implementation (byte-list scanline recurrences, its own pass-grid
    arithmetic, no numpy) and freezes the expected rows into VALUES —
    same zlib stream, two decoders, hash-exact agreement."""
    from web_scrapper_spark.operators import multimodal as mm

    mm.register_decoder("image", mm.compressed_raster_decoder)
    media = spark.createDataFrame(
        mm.planted_png_media_rows(), mm.MEDIA_SCHEMA
    )
    stats = mm.image_luma_stats_df(media)
    hashes = mm.image_dhash_df(media)
    return stats.join(hashes, "media_id").select(
        "media_id", "width", "height", "luma_sum", "n_px", "dhash"
    )


def _q_png_dhash_pairs(spark, sf_dir):
    """Decoded-pixel image dedup over REAL PNGs
    (multimodal.dhash_near_pairs ∘ png_decode_pixels): ids 32..39 are
    byte-different RE-ENCODES of 0..7 (different filter regime, same
    pixels — must land at Hamming 0: the re-encode dedup claim); ids
    40..47 perturb sampled pixels of 8..15 (small nonzero Hamming);
    ids 48..55 are packed 1/2/4-bit favicon shapes. The oracle
    brute-forces all C(56,2) pairs with the independent pure-Python
    decoder + an independently-written dHash."""
    from web_scrapper_spark.operators import multimodal as mm

    mm.register_decoder("image", mm.compressed_raster_decoder)
    media = spark.createDataFrame(
        mm.planted_png_media_rows(), mm.MEDIA_SCHEMA
    )
    return mm.dhash_near_pairs(media, max_hamming=3, n_chunks=8)


def _q_jpeg_decode(spark, sf_dir):
    """REAL baseline-JPEG decode (operators/rasters.jpeg_decode_pixels
    behind multimodal.compressed_raster_decoder): 48 genuine JPEGs
    (quality-scaled Annex-K quantization, canonical Huffman DHT, gray
    + YCbCr 4:4:4) decoded to Y-plane pixels inside the Arrow pass via
    the spec'd fixed-point integer IDCT. The oracle re-decodes every
    payload with an INDEPENDENT pure-Python implementation (its own
    bit reader, Huffman walk and integer IDCT loops — no numpy, no
    shared code) and freezes the expected rows into VALUES — same
    entropy stream, two decoders, hash-exact agreement."""
    from web_scrapper_spark.operators import multimodal as mm

    mm.register_decoder("image", mm.compressed_raster_decoder)
    media = spark.createDataFrame(
        mm.planted_jpeg_media_rows(), mm.MEDIA_SCHEMA
    )
    stats = mm.image_luma_stats_df(media)
    hashes = mm.image_dhash_df(media)
    return stats.join(hashes, "media_id").select(
        "media_id", "width", "height", "luma_sum", "n_px", "dhash"
    )


def _q_jpeg_dhash_pairs(spark, sf_dir):
    """Decoded-pixel image dedup over REAL JPEGs: ids 32..39 are
    byte-different RE-ENCODES of 0..7 (wider Huffman codes, identical
    quantized coefficients — decoded pixels identical, Hamming 0: the
    lossless re-encode dedup claim); ids 40..47 perturb source pixels
    of 8..15 before encoding. The oracle brute-forces all C(48,2)
    pairs with the independent pure-Python decoder + the independently
    written dHash."""
    from web_scrapper_spark.operators import multimodal as mm

    mm.register_decoder("image", mm.compressed_raster_decoder)
    media = spark.createDataFrame(
        mm.planted_jpeg_media_rows(), mm.MEDIA_SCHEMA
    )
    return mm.dhash_near_pairs(media, max_hamming=3, n_chunks=8)


def _q_gif_decode(spark, sf_dir):
    """REAL GIF decode (operators/rasters.gif_decode_pixels behind
    multimodal.compressed_raster_decoder): 48 genuine GIF89a payloads
    (variable-width LZW, palette-mapped, gray + small-palette RGB)
    decoded inside the Arrow pass — all-integer, engine-exact. The
    oracle re-decodes every payload with an INDEPENDENT pure-Python
    LZW + palette walk and freezes the rows into VALUES."""
    from web_scrapper_spark.operators import multimodal as mm

    mm.register_decoder("image", mm.compressed_raster_decoder)
    media = spark.createDataFrame(
        mm.planted_gif_media_rows(), mm.MEDIA_SCHEMA
    )
    stats = mm.image_luma_stats_df(media)
    hashes = mm.image_dhash_df(media)
    return stats.join(hashes, "media_id").select(
        "media_id", "width", "height", "luma_sum", "n_px", "dhash"
    )


def _q_gif_dhash_pairs(spark, sf_dir):
    """Decoded-pixel image dedup over REAL GIFs: ids 32..39 re-encode
    0..7 with a rotated palette (byte-different color table + index
    stream, identical decoded pixels — Hamming 0); ids 40..47 perturb
    pixels of 8..15. Oracle = brute force over the independent
    decoder, frozen to VALUES."""
    from web_scrapper_spark.operators import multimodal as mm

    mm.register_decoder("image", mm.compressed_raster_decoder)
    media = spark.createDataFrame(
        mm.planted_gif_media_rows(), mm.MEDIA_SCHEMA
    )
    return mm.dhash_near_pairs(media, max_hamming=3, n_chunks=8)


def _q_gif_frames(spark, sf_dir):
    """REAL animated-GIF demux (rasters.gif_decode_frames behind
    multimodal.animation_frames_df): 24 genuine multi-frame GIF89a
    payloads (GCE delays/disposal, delta sub-rectangles with
    transparency, explicit rects with disposal 2/3, local palettes,
    interlaced frames, NETSCAPE loop blocks) rendered frame-by-frame
    on the logical screen inside the Arrow pass. Output is one row per
    COMPOSITED frame: delay + integer luma stats + frame dHash. The
    oracle re-renders every animation with an INDEPENDENT pure-Python
    compositor (big-int LZW, list-of-list screens, closed-form
    de-interlace — no numpy, no shared code) and freezes the rows into
    VALUES — same bytes, two compositors, hash-exact agreement."""
    from web_scrapper_spark.operators import multimodal as mm

    media = spark.createDataFrame(
        mm.planted_gif_animation_rows(), mm.MEDIA_SCHEMA
    )
    return mm.animation_frames_df(media)


def _q_gif_frame_dedup(spark, sf_dir):
    """Animation-grain near-dedup over rendered frames
    (multimodal.animation_near_pairs): ids 16..19 re-encode 0..3 with
    a different byte layout (delta ↔ full frames, flipped interlace,
    rotated local palettes) — identical rendered frames, Hamming 0 on
    every frame pair; ids 20..23 perturb frame 0 of 4..7 (distances
    1/1/0/3). Candidates come from the pigeonhole-blocked Hamming
    self-join at frame grain (never a cross join), re-aggregated to
    animation grain. Oracle = brute force over the independent
    compositor's frames, frozen to VALUES."""
    from web_scrapper_spark.operators import multimodal as mm

    media = spark.createDataFrame(
        mm.planted_gif_animation_rows(), mm.MEDIA_SCHEMA
    )
    return mm.animation_near_pairs(media, max_hamming=3, n_chunks=8)


def _q_jpeg_exif(spark, sf_dir):
    """EXIF provenance extraction (rasters.jpeg_exif_fields behind
    multimodal.image_exif_df): documents become real JPEGs with APP1
    Exif segments spliced in — make/model/software/datetime/
    orientation derived from doc_id, byte order alternating II/MM,
    short-inline and offset-addressed ASCII both exercised, and every
    fifth id carrying NO Exif (NULL columns). The oracle recomputes
    the field formulas in pure SQL (construct→parse roundtrip)."""
    from web_scrapper_spark.operators.multimodal import image_exif_df
    from web_scrapper_spark.operators.rasters import (
        build_jpeg,
        insert_exif,
    )

    docs = _read(spark, sf_dir, "documents").select("doc_id")

    def build(batches):
        import numpy as np
        import pandas as pd

        g = (np.arange(64).reshape(8, 8) % 11 * 23).astype(np.uint8)
        base = build_jpeg(g)
        for pdf in batches:
            payloads = []
            for i in pdf["doc_id"]:
                i = int(i)
                if i % 5 == 4:
                    payloads.append(base)
                    continue
                fields = {
                    "make": f"cam{i % 7}",
                    "model": f"M{i % 13}",
                    "software": f"scraper/{i % 5}",
                    "datetime": (
                        f"{2020 + i % 6:04d}:{i % 12 + 1:02d}:"
                        f"{i % 28 + 1:02d} {i % 24:02d}:"
                        f"{i * 7 % 60:02d}:{i * 13 % 60:02d}"
                    ),
                    "orientation": i % 8 + 1,
                }
                payloads.append(
                    insert_exif(
                        base, fields, "II" if i % 2 == 0 else "MM"
                    )
                )
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"], "payload": payloads}
            )

    media = docs.mapInPandas(build, schema="media_id long, payload binary")
    res = image_exif_df(media)
    # NULL ints coalesce to -1 for the pandas dtype boundary (the
    # repo convention media_sniff established)
    return res.withColumn(
        "orientation",
        F.coalesce(F.col("orientation"), F.lit(-1)).cast("int"),
    )


def _q_favicon_decode(spark, sf_dir):
    """REAL BMP + ICO (favicon) decode
    (multimodal.compressed_raster_decoder): 40 genuine payloads —
    paletted/truecolor BI_RGB BMPs and ICO containers wrapping DIB or
    PNG entries (largest-entry-wins, decoy entries planted) — decoded
    inside the Arrow pass. Container-flip re-encodes (BMP ↔ ICO,
    PNG-entry ↔ DIB-entry) carry identical luma. The oracle re-decodes
    every payload with an INDEPENDENT pure-Python header walk + byte
    loops and freezes the rows into VALUES."""
    from web_scrapper_spark.operators import multimodal as mm

    mm.register_decoder("image", mm.compressed_raster_decoder)
    media = spark.createDataFrame(
        mm.planted_favicon_media_rows(), mm.MEDIA_SCHEMA
    )
    stats = mm.image_luma_stats_df(media)
    hashes = mm.image_dhash_df(media)
    return stats.join(hashes, "media_id").select(
        "media_id", "width", "height", "luma_sum", "n_px", "dhash"
    )


def _q_favicon_dhash_pairs(spark, sf_dir):
    """Favicon dedup across CONTAINERS: ids 28..33 re-encode 0..5 in a
    different container (byte-disjoint files, identical pixels —
    Hamming 0); ids 34..39 perturb 6..11. Oracle = brute force over
    the independent decoder, frozen to VALUES."""
    from web_scrapper_spark.operators import multimodal as mm

    mm.register_decoder("image", mm.compressed_raster_decoder)
    media = spark.createDataFrame(
        mm.planted_favicon_media_rows(), mm.MEDIA_SCHEMA
    )
    return mm.dhash_near_pairs(media, max_hamming=3, n_chunks=8)


def _q_anim_frames_mixed(spark, sf_dir):
    """Container-independent animation demux
    (multimodal.animation_frames_df over animation_demux): a mixed
    fixture of GIF89a and APNG payloads — six content animations each
    encoded in BOTH containers, plus APNG-only feature shapes
    (semi-transparent Porter-Duff blend-over, dispose-to-background,
    dispose-to-previous sub-rectangles) — rendered frame-by-frame in
    one Arrow pass. The oracle re-renders everything with the two
    INDEPENDENT pure-Python compositors (per-pixel premultiplied
    integer loops for APNG) and freezes the rows into VALUES."""
    from web_scrapper_spark.operators import multimodal as mm

    media = spark.createDataFrame(
        mm.planted_anim_mixed_rows(), mm.MEDIA_SCHEMA
    )
    return mm.animation_frames_df(media)


def _q_anim_cross_dedup(spark, sf_dir):
    """Cross-CONTAINER animation dedup (multimodal.animation_near_pairs
    over the mixed fixture): the same frames encoded as GIF and as
    APNG must pair at min_hamming 0 for every content animation —
    byte-disjoint files, identical rendered frames: the
    container-independent dedup claim a 100 TB media corpus needs.
    Oracle = brute force over the independent compositors' frames."""
    from web_scrapper_spark.operators import multimodal as mm

    media = spark.createDataFrame(
        mm.planted_anim_mixed_rows(), mm.MEDIA_SCHEMA
    )
    return mm.animation_near_pairs(media, max_hamming=3, n_chunks=8)


def _pld_host(doc_id):
    """Six host shapes covering every branch of the eTLD+1 algorithm:
    2-label ccTLD registry, deep subdomain, private platform suffix,
    another registry, a 3-label suffix (longest-match), default rule."""
    k = (doc_id % 20).cast("string")
    return (
        F.when(doc_id % 6 == 0, F.concat(F.lit("www.h"), k, F.lit(".co.uk")))
        .when(doc_id % 6 == 1, F.concat(F.lit("a.b.h"), k, F.lit(".com")))
        .when(doc_id % 6 == 2, F.concat(F.lit("h"), k, F.lit(".github.io")))
        .when(doc_id % 6 == 3, F.concat(F.lit("shop.h"), k, F.lit(".com.au")))
        .when(doc_id % 6 == 4, F.concat(F.lit("b"), k, F.lit(".s3.amazonaws.com")))
        .otherwise(F.concat(F.lit("h"), k, F.lit(".org")))
    )


def _q_registered_domain(spark, sf_dir):
    """eTLD+1 extraction (frontier/pld.registered_domain_col): the
    codegen longest-public-suffix match over six host shapes; the
    oracle re-implements longest-match relationally in DuckDB."""
    from web_scrapper_spark.frontier.pld import registered_domain_col

    docs = _read(spark, sf_dir, "documents")
    hosts = docs.select("doc_id", _pld_host(F.col("doc_id")).alias("host"))
    return hosts.select(
        "doc_id", "host", registered_domain_col(F.col("host")).alias("pld")
    )


def _q_pld_flood(spark, sf_dir):
    """Subdomain-flood report (frontier/pld.subdomain_flood_report):
    one registered domain fanned out over 50 subdomains must flag
    flooded; the healthy PLD must not."""
    from web_scrapper_spark.frontier.pld import subdomain_flood_report

    docs = _read(spark, sf_dir, "documents")
    host = F.when(
        F.col("doc_id") % 2 == 0,
        F.concat(F.lit("s"), (F.col("doc_id") % 50).cast("string"), F.lit(".flood.com")),
    ).otherwise(
        F.concat(F.lit("h"), (F.col("doc_id") % 10).cast("string"), F.lit(".ok.org"))
    )
    frontier = docs.select(host.alias("host"))
    return subdomain_flood_report(frontier, max_hosts_per_pld=32)


def _q_embed_decontam(spark, sf_dir):
    """Embedding-space eval decontamination
    (quality.embedding_decontaminate): the first 16 embedding rows
    stand in for a leaked eval set; every corpus vector cosine-close
    to any of them is flagged. Threshold 0.35 so near-neighbors (not
    just the identity leaks) exercise the hit counting."""
    emb = _read(spark, sf_dir, "embeddings")
    bench = emb.filter(F.col("vec_id") < 16)
    return _qual.embedding_decontaminate(emb, bench, threshold=0.35)


def _q_perceptron_gate(spark, sf_dir):
    """Trained quality classifier (quality.perceptron_train/score):
    batch perceptron over hashed bag-of-words, 3 iterations, 128
    buckets, labels y=+1 iff lang='en'. Pure integer arithmetic and
    order-independent updates make the TRAINING itself bit-reproducible
    — the oracle replays all three iterations in DuckDB CTEs and must
    land on identical margins for every document."""
    docs = _read(spark, sf_dir, "documents")
    labeled = docs.withColumn("_lbl", F.col("lang") == F.lit("en"))
    model = _qual.perceptron_train(labeled, "_lbl", iters=3, buckets=128)
    return _qual.perceptron_score(docs, model)


_OPIC = {"epochs": 3, "fanout": 3, "n_seeds": 8}
_HITS = {"iters": 3, "fanout": 3}


def _q_hits(spark, sf_dir):
    """Integer fixed-point HITS (graph.hits) over the md5 citation
    graph — hubs/authorities for link-farm analysis; max-rescaled
    half-steps keep everything integer so the oracle replays all
    iterations exactly."""
    from web_scrapper_spark.operators.graph import hits

    docs = _read(spark, sf_dir, "documents")
    n = docs.count()
    dsts = [
        (
            F.conv(
                F.substring(F.md5(F.concat_ws("|", F.col("doc_id"), F.lit(j))), 1, 15),
                16,
                10,
            ).cast("long")
            % n
        )
        for j in range(_HITS["fanout"])
    ]
    edges = docs.select(
        F.col("doc_id").alias("src"), F.explode(F.array(*dsts)).alias("dst")
    )
    return hits(edges, num_iters=_HITS["iters"])


def _q_soft404(spark, sf_dir):
    """Soft-404 / templated-page detection (frontier/traps.
    templated_pages): every doc_id % 4 == 0 URL serves the same 'not
    found' body on its host — those must flag templated; genuine
    articles must not."""
    from web_scrapper_spark.frontier.traps import templated_pages

    docs = _read(spark, sf_dir, "documents")
    pages = docs.select(
        F.concat(
            F.lit("https://h"),
            (F.col("doc_id") % 8).cast("string"),
            F.lit(".example.org/p/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        F.when(
            F.col("doc_id") % 4 == 0, F.lit("  Page Not\tFound — error 404 ")
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return templated_pages(pages, min_urls=5)


def _q_excerpt_pairs(spark, sf_dir):
    """Excerpt/containment detection (textops.excerpt_pairs): every
    doc_id % 10 == 0 document gets a planted excerpt (its first 200
    chars, id + 100000); the directional containment must recover
    (excerpt → source) pairs Jaccard similarity would miss."""
    docs = _read(spark, sf_dir, "documents")
    excerpts = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.substring("text", 1, 200).alias("text"),
    )
    corpus = docs.select("doc_id", "text").unionByName(excerpts)
    return _tx.excerpt_pairs(corpus, containment_centi=80, min_fps=3)


def _q_audio_pairs(spark, sf_dir):
    """Audio near-dup pairs (multimodal.audio_near_pairs): 64 real PCM
    WAVs, ids 48..55 volume-doubled replays of 0..7 (energy-delta hash
    identical — volume invariance), ids 56..63 truncated replays that
    must NOT pair. Oracle brute-forces all C(64,2) distances."""
    from web_scrapper_spark.operators import multimodal as mm

    media = spark.createDataFrame(
        mm.planted_wav_media_rows(n=64), mm.MEDIA_SCHEMA
    )
    return mm.audio_near_pairs(media, max_hamming=7, n_chunks=8)


def _q_starvation(spark, sf_dir):
    """Frontier starvation report (frontier/core.starvation_report) at
    epoch 10: hosts h0..h7 hold pending rows discovered at epoch
    doc_id % 12 - 1; seen rows exist only for even hosts, last fetched
    at epoch doc_id % 11. Odd hosts with old pending rows must flag
    starving; recently-fetched hosts must not."""
    from web_scrapper_spark.frontier.core import starvation_report

    docs = _read(spark, sf_dir, "documents")
    frontier = docs.select(
        F.concat(F.lit("h"), (F.col("doc_id") % 8).cast("string")).alias("host"),
        ((F.col("doc_id") % 12) - 1).cast("long").alias("discovered_epoch"),
    )
    seen = docs.filter(F.col("doc_id") % 2 == 0).select(
        F.concat(F.lit("h"), (F.col("doc_id") % 8).cast("string")).alias("host"),
        (F.col("doc_id") % 11).cast("long").alias("fetched_epoch"),
    )
    rep = starvation_report(frontier, seen, current_epoch=10, stale_epochs=3)
    # Gate-output hygiene: last_fetch_epoch is NULL for never-fetched
    # hosts, and a nullable int column turns float64 through the
    # driver's pandas fetch ("10.0" vs "10" hash drift). Coalesce to a
    # -1 sentinel on BOTH sides; the operator itself stays nullable.
    return rep.withColumn(
        "last_fetch_epoch",
        F.coalesce(F.col("last_fetch_epoch"), F.lit(-1)).cast("long"),
    )


def _q_opic(spark, sf_dir):
    """OPIC online page importance (graph.opic_epochs) over the
    md5-derived citation graph. The dst space is n+20 wide, so ~20
    link targets are NOT documents (no outlinks) — exercising the
    dangling-cash → virtual-root → seeds path. Every value is integer
    and cash is exactly conserved; the oracle replays all 3 epochs."""
    from web_scrapper_spark.operators.graph import opic_epochs

    docs = _read(spark, sf_dir, "documents")
    n = docs.count()
    dsts = [
        (
            F.conv(
                F.substring(F.md5(F.concat_ws("|", F.col("doc_id"), F.lit(j))), 1, 15),
                16,
                10,
            ).cast("long")
            % (n + 20)
        )
        for j in range(_OPIC["fanout"])
    ]
    edges = docs.select(
        F.col("doc_id").alias("src"), F.explode(F.array(*dsts)).alias("dst")
    )
    seeds = docs.filter(F.col("doc_id") < _OPIC["n_seeds"]).select(
        F.col("doc_id").alias("node")
    )
    return opic_epochs(edges, seeds, epochs=_OPIC["epochs"]).select(
        F.col("node").alias("doc_id"), "cash", "history"
    )


def _q_sim_ivf_topk(spark, sf_dir):
    """IVF probe/search path under a deterministic medoid quantizer
    (centroid = the min-vec_id member of each label cell). Medoids are
    exact in both engines — no FP-averaging order to drift — so the
    whole assign → probe → candidate-join → rank pipeline is fully
    SQL-oracle-able. (Lloyd-refined centroids stay the operator default;
    they are covered by the recall property tests in tests/.)"""
    from pyspark.sql import Window

    emb = _read(spark, sf_dir, "embeddings")
    w = Window.partitionBy("label").orderBy("vec_id")
    medoids = (
        emb.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            F.col("label").alias("cell_id"),
            F.transform("embedding", lambda x: x.cast("double")).alias("centroid"),
        )
    )
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return _sim.ivf_topk(queries, emb, k=5, n_probe=3, centroids=medoids).select(
        "query_id", "rank", "vec_id"
    )


def _q_multimodal_features(spark, sf_dir):
    from web_scrapper_spark.operators import multimodal as mm

    mm.register_decoder("image", mm.deterministic_fake_decoder)
    media = mm.synthetic_media_df(spark, n=64)
    out = mm.image_features_df(media, resize_to=4)
    return out.select(
        "media_id",
        "width",
        "height",
        F.size("feature").alias("feat_dim"),
        # integer-scaled luma so no raw float crosses the oracle compare;
        # floor (not round) — Python round() is banker's, Spark's is
        # HALF_UP, floor is identical in both
        F.floor(F.col("mean_luma") * 1000000).cast("long").alias("luma_micro"),
    )


def _q_fingerprint_winnow(spark, sf_dir):
    """Winnowing (rolling-hash) local fingerprints — MOSS algorithm
    over 3-word shingles, window 4 (operators/textops.py
    winnow_fingerprints)."""
    docs = _read(spark, sf_dir, "documents")
    return _tx.winnow_fingerprints(docs, k=3, w=4)


def _q_winnow_overlap(spark, sf_dir):
    """MOSS pair report: docs sharing >=2 winnow fingerprints, hot
    (boilerplate) fps capped at df<=50 (textops.winnow_overlap_pairs)."""
    docs = _read(spark, sf_dir, "documents")
    return _tx.winnow_overlap_pairs(docs, k=3, w=4, min_shared=2, max_df=50)


def _q_pii_redact(spark, sf_dir):
    """PII scrub over documents.text salted with deterministic
    synthetic PII (email + phone + IP derived from doc_id) so every
    pattern class is exercised (operators/textops.py pii_redact)."""
    docs = _read(spark, sf_dir, "documents")
    salted = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" Contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@mail.example.org or (555) 867-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit(" from 10."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".0."),
            (F.col("doc_id") % 100).cast("string"),
            F.lit(" card 4111 1111 1111 "),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ).alias("text"),
    )
    return _tx.pii_redact(salted)


def _q_c4_clean(spark, sf_dir):
    """C4 cleaning heuristics (Raffel et al. 2020 §2.2) over documents
    — line-level terminal-punctuation / <3-word / javascript drops
    with per-rule counters, page-level lorem-ipsum / brace / sentence
    gates; cleaned text crosses the gate as md5
    (operators/quality.py c4_clean).

    The synthetic corpus is single-line unpunctuated prose, so the raw
    table would exercise no rule; the doc is salted deterministically
    with one line per rule class (kept / short / nopunct / js) and
    doc_id-modular lorem and brace lines so every counter and both
    keep outcomes appear in the gate."""
    docs = _read(spark, sf_dir, "documents")
    did = F.col("doc_id")
    salted = docs.select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.col("text"),
            F.lit("Short line"),
            F.concat(
                F.lit("This sentence number "),
                did.cast("string"),
                F.lit(" is properly terminated."),
            ),
            F.lit("Beware javascript code here today."),
            F.lit("Another good sentence follows here!"),
            F.lit("The quick brown fox jumps over the lazy dog."),
            F.when(did % 7 == 0, F.lit("lorem ipsum dolor sit amet."))
            .otherwise(F.lit("A clean closing line comes here?")),
            F.when(did % 11 == 0, F.lit("code { block }"))
            .otherwise(F.lit("The final sentence stands well.")),
        ).alias("text"),
    )
    return _qual.c4_clean(salted)


def _q_paragraph_dedup(spark, sf_dir):
    """CCNet-style cross-corpus paragraph dedup — first occurrence
    wins by (doc_id, para_idx) (operators/dedup.py paragraph_dedup).

    Docs are salted with two boilerplate paragraphs appended to every
    page so the corpus-wide dedup path (one keeper, 499 dups) is
    actually exercised; each doc's own text stays a unique para."""
    docs = _read(spark, sf_dir, "documents")
    salted = docs.select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.col("text"),
            F.lit("Subscribe to our newsletter for updates today."),
            F.lit("All rights reserved by the example site."),
        ).alias("text"),
    )
    return _dd.paragraph_dedup(salted)


def _q_gopher_quality(spark, sf_dir):
    """Gopher repetition/quality filter (Rae et al. 2021, Table A1)
    over documents — duplicate-line fractions, modal-n-gram char
    fractions via a zero-shuffle sorted-run fold, shape heuristics,
    and the composite keep flag (operators/quality.py)."""
    docs = _read(spark, sf_dir, "documents")
    return _qual.gopher_quality(docs)


def _q_s3_ua_rotation(spark, sf_dir):
    """S3: deterministic UA rotation over a synthetic request frame
    derived from documents — hash mode (≈ random.choice, reproducible)
    and sequential mode (the reference's rotating cursor) side by side
    (web_scrapper_spark/crawl/fetchpolicy.py; reference
    utils/user_agents.py:56-137)."""
    from pyspark.sql import Window

    from web_scrapper_spark.crawl.fetchpolicy import FetchPolicy, user_agent_col

    policy = FetchPolicy()
    docs = _read(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("https://h"), (F.col("doc_id") % 8).cast("string"),
            F.lit(".example.org/p/"), F.col("doc_id").cast("string"),
        ).alias("url"),
        F.concat(
            F.lit("h"), (F.col("doc_id") % 8).cast("string"), F.lit(".example.org")
        ).alias("host"),
    )
    win = Window.partitionBy("host").orderBy("doc_id")
    reqs = docs.withColumn("host_rank", F.row_number().over(win))
    seq_policy = FetchPolicy(rotation="sequential")
    return reqs.select(
        "doc_id",
        user_agent_col(policy, epoch=3, url_col="url").alias("ua_hash"),
        user_agent_col(
            seq_policy, epoch=3, url_col="url", rank_col="host_rank"
        ).alias("ua_seq"),
    )


def _q_http_revalidate(spark, sf_dir):
    """Conditional refetch (crawl/fetchpolicy.py revalidation_headers
    + revalidation_outcomes): validators from the LATEST stored
    capture (multi-capture urls carry a changed v1 digest, so the
    older original must lose), IMF-fixdate If-Modified-Since + quoted
    payload-digest ETag, then a refetch wave classified 304/200 with
    byte accounting. Due urls with no capture history fetch
    unconditionally (NULL validators). The oracle replays capture
    aggregation, header rendering (strftime twin), and the digest
    comparison end-to-end."""
    from web_scrapper_spark.crawl.fetchpolicy import (
        revalidation_headers,
        revalidation_outcomes,
    )

    docs = _read(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://h"), (F.col("doc_id") % 23).cast("string"),
        F.lit(".example.org/p/"), F.col("doc_id").cast("string"),
    )
    fresh_url = F.concat(
        F.lit("https://h"), (F.col("doc_id") % 23).cast("string"),
        F.lit(".example.org/fresh/"), F.col("doc_id").cast("string"),
    )
    ts_a = F.expr(
        "timestamp'2026-01-01 00:00:00' "
        "+ make_interval(0, 0, 0, 0, cast(doc_id % 48 as int), 0, 0)"
    )
    ts_b = F.expr(
        "timestamp'2026-01-01 00:00:00' "
        "+ make_interval(0, 0, 0, 0, cast(doc_id % 48 as int) + 100, 0, 0)"
    )
    captures = docs.select(
        url.alias("url"), ts_a.alias("warc_ts"), F.md5("text").alias("digest")
    ).unionByName(
        docs.filter(F.col("doc_id") % 4 == 0).select(
            url.alias("url"),
            ts_b.alias("warc_ts"),
            F.md5(F.concat(F.col("text"), F.lit("v1"))).alias("digest"),
        )
    )
    due = docs.filter(F.col("doc_id") % 2 == 0).select(
        url.alias("url")
    ).unionByName(
        docs.filter(F.col("doc_id") % 5 == 0).select(fresh_url.alias("url"))
    )
    resp_digest = F.when(
        F.col("doc_id") % 3 == 0, F.md5(F.concat(F.col("text"), F.lit("v2")))
    ).otherwise(F.md5("text"))
    responses = docs.filter(F.col("doc_id") % 2 == 0).select(
        url.alias("url"),
        resp_digest.alias("digest"),
        F.col("n_chars").cast("long").alias("n_bytes"),
    ).unionByName(
        docs.filter(F.col("doc_id") % 5 == 0).select(
            fresh_url.alias("url"),
            F.md5(F.concat(F.col("text"), F.lit("f"))).alias("digest"),
            F.col("n_chars").cast("long").alias("n_bytes"),
        )
    )
    hdr = revalidation_headers(captures, due)
    out = revalidation_outcomes(hdr, responses)
    return out.join(
        hdr.select("url", "if_none_match", "if_modified_since"), "url"
    )


def _q_s2_fetch_session(spark, sf_dir):
    """S2: session affinity + sticky proxy + rendered header line
    (web_scrapper_spark/crawl/fetchpolicy.py; reference
    scrapers/base.py:40-75)."""
    from web_scrapper_spark.crawl.fetchpolicy import (
        FetchPolicy,
        with_fetch_metadata,
    )

    policy = FetchPolicy(
        proxies=["http://egress-a:3128", "http://egress-b:3128", "http://egress-c:3128"],
        headers={"Accept": "text/html", "Accept-Language": "en"},
        cookies={"sid": "abc", "region": "eu"},
    )
    docs = _read(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("https://h"), (F.col("doc_id") % 8).cast("string"),
            F.lit(".example.org/p/"), F.col("doc_id").cast("string"),
        ).alias("url"),
        F.concat(
            F.lit("h"), (F.col("doc_id") % 8).cast("string"), F.lit(".example.org")
        ).alias("host"),
    )
    out = with_fetch_metadata(docs, policy, epoch=5, rank_col=None)
    return out.select("doc_id", "session_id", "proxy", "header_line")


def _ccnet_ppl_oracle_sql() -> str:
    """DuckDB twin of _q_ccnet_ppl. The per-bigram NLL terms are built
    as an ordered diff list and folded sequentially (list_reduce with a
    0.0 prepend) so the FP accumulation order matches Spark's
    zip_with + aggregate exactly; the two smoothed-log arrays come from
    range() LEFT JOINs over the same hashed counts."""
    c = _CCNET
    return f"""
            WITH toks AS (
              SELECT doc_id, {_TOKS_SQL} AS t FROM documents
            ), ref AS (
              SELECT t FROM toks WHERE doc_id % {c["ref_mod"]} = {c["ref_rem"]}
            ), rbi AS (
              SELECT unnest(CASE WHEN len(t) >= 2
                            THEN list_transform(generate_series(1, len(t) - 1),
                                   i -> array_to_string(t[i:i+1], ' '))
                            ELSE [] END) AS g
              FROM ref
            ), rbc AS (
              SELECT ('0x' || substr(md5(g), 1, 15))::BIGINT % {c["b2"]} AS bk,
                     count(*) AS cnt
              FROM rbi GROUP BY bk
            ), runi AS (
              SELECT unnest(t) AS g FROM ref
            ), rcc AS (
              SELECT ('0x' || substr(md5(g), 1, 15))::BIGINT % {c["b1"]} AS bk,
                     count(*) AS cnt
              FROM runi GROUP BY bk
            ), barr AS (
              SELECT list(ln(COALESCE(cnt, 0) + 1.0) ORDER BY r.range) AS arr
              FROM range({c["b2"]}) r LEFT JOIN rbc ON rbc.bk = r.range
            ), carr AS (
              SELECT list(ln(COALESCE(cnt, 0) + {c["b2"]}.0) ORDER BY r.range) AS arr
              FROM range({c["b1"]}) r LEFT JOIN rcc ON rcc.bk = r.range
            ), db AS (
              SELECT doc_id,
                     CASE WHEN len(t) >= 2
                          THEN list_transform(generate_series(1, len(t) - 1),
                                 i -> ('0x' || substr(md5(
                                   array_to_string(t[i:i+1], ' ')), 1, 15))::BIGINT
                                   % {c["b2"]})
                          ELSE [] END AS bi,
                     CASE WHEN len(t) >= 2
                          THEN list_transform(t[1:len(t) - 1],
                                 w -> ('0x' || substr(md5(w), 1, 15))::BIGINT
                                   % {c["b1"]})
                          ELSE [] END AS ctx
              FROM toks
            ), scored AS (
              SELECT db.doc_id,
                     CAST(len(bi) AS INT) AS bigram_count,
                     CASE WHEN len(bi) > 0 THEN
                       CAST(round(list_reduce(
                         list_prepend(0.0::DOUBLE,
                           list_transform(generate_series(1, len(bi)),
                             i -> carr.arr[ctx[i] + 1] - barr.arr[bi[i] + 1])),
                         (a, x) -> a + x) / len(bi) * 1000000.0) AS BIGINT)
                     END AS nll_ppm
              FROM db CROSS JOIN barr CROSS JOIN carr
            )
            SELECT doc_id, bigram_count, nll_ppm,
                   CASE WHEN nll_ppm IS NULL THEN 'short'
                        WHEN nll_ppm <= {c["head_ppm"]} THEN 'head'
                        WHEN nll_ppm <= {c["tail_ppm"]} THEN 'middle'
                        ELSE 'tail' END AS ppl_bucket
            FROM scored
        """


def _url_filter_oracle_sql() -> str:
    """DuckDB twin of _q_url_filter: same derived URLs, host via regex
    (vs Spark's parse_url), suffix list via 1-based list slices, the
    soft-word fold unrolled into a CASE sum — all from the shared
    DEFAULT_SOFT_WORDS / _UF_* constants."""
    from web_scrapper_spark.operators.urlfilter import DEFAULT_SOFT_WORDS

    hosts_sql = ", ".join(f"'{h}'" for h in _UF_HOSTS)
    block_sql = ", ".join(f"'{d}'" for d in _UF_BLOCKLIST)
    score = " + ".join(
        f"CASE WHEN contains(lower(url), '{w}') THEN {c} ELSE 0 END"
        for w, c in sorted(DEFAULT_SOFT_WORDS.items())
    )
    return f"""
            WITH u AS (
              SELECT doc_id,
                     'https://' || [{hosts_sql}][CAST(doc_id % 4 AS INT) + 1]
                     || '/' || source || '/page' || CAST(doc_id AS VARCHAR)
                     || CASE WHEN doc_id % 5 = 0 THEN '?ref=casino'
                             WHEN doc_id % 7 = 0 THEN '?ref=poker-pills'
                             ELSE '' END AS url
              FROM documents
            ), hh AS (
              SELECT doc_id, url,
                     lower(regexp_extract(url, '^[a-z]+://([^/:?#]+)', 1)) AS host
              FROM u
            ), fx AS (
              SELECT doc_id, url, host,
                     CASE WHEN len(string_split(host, '.')) >= 2
                          THEN list_transform(
                                 generate_series(
                                   1, len(string_split(host, '.')) - 1),
                                 i -> array_to_string(
                                   string_split(host, '.')[i:], '.'))
                          ELSE [host] END AS sfx
              FROM hh
            )
            SELECT doc_id, url, host,
                   list_has_any(sfx, [{block_sql}]) AS domain_blocked,
                   CAST({score} AS BIGINT) AS word_score_centi,
                   list_has_any(sfx, [{block_sql}])
                     OR ({score}) >= 100 AS url_blocked
            FROM fx
        """


def _funnel_mh_pair_ctes(src: str) -> str:
    """MinHash/LSH pair CTE chain over ``src`` (same parameters and
    integer-exact 0.4-Jaccard gate as the dedup_minhash_lsh oracle)."""
    mh_cols = ",\n                     ".join(
        f"list_min(list_transform(h, x -> (x * {a} + {b}) % {_MH_P})) AS mh{i}"
        for i, (a, b) in enumerate(_dd.minhash_params(4))
    )
    shingles = f"""list_sort(list_distinct(list_filter(
        CASE WHEN len({_TOKS_SQL}) < 3 THEN [array_to_string({_TOKS_SQL}, ' ')]
             ELSE list_transform(generate_series(1, len({_TOKS_SQL}) - 2),
                                 i -> array_to_string(({_TOKS_SQL})[i:i+2], ' ')) END,
        x -> x <> '')))"""
    return f"""fsh AS (
              SELECT doc_id, {shingles} AS s FROM {src}
              WHERE len({_TOKS_SQL}) > 0
            ), fhb AS (
              SELECT doc_id, s,
                     list_transform(
                       s, x -> ('0x' || substr(md5(x), 1, 15))::BIGINT % {_MH_P}
                     ) AS h
              FROM fsh
            ), fsig AS (
              SELECT doc_id, s,
                     {mh_cols}
              FROM fhb
            ), fcand AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.s AS sa, b.s AS sb
              FROM fsig a JOIN fsig b ON a.doc_id < b.doc_id
               AND (a.mh0 = b.mh0 OR a.mh1 = b.mh1 OR a.mh2 = b.mh2 OR a.mh3 = b.mh3)
            ), fpairs AS (
              SELECT id_a, id_b FROM fcand
              WHERE len(list_intersect(sa, sb)) * 5 >= len(list_distinct(sa || sb)) * 2
            )"""


def _funnel_grams_sql(src: str, extra: str = "") -> str:
    """Distinct 5-gram rows (doc_id, gram) over ``src`` — the
    decontaminate oracle's gram expansion, parameterized on source."""
    return f"""
              SELECT doc_id, unnest(list_distinct(
                CASE WHEN len({_TOKS_SQL}) >= 5
                     THEN list_transform(generate_series(1, len({_TOKS_SQL}) - 4),
                                         i -> array_to_string(({_TOKS_SQL})[i:i+4], ' '))
                     ELSE [] END)) AS gram
              FROM {src} {extra}"""


def _corpus_funnel_oracle_sql(per_doc: bool = False) -> str:
    """DuckDB twin of _q_corpus_funnel: the same boilerplate-salted
    corpus and derived URLs, each stage's gate composed from the
    already-proven per-operator oracle SQL (url_filter / lang_id /
    gopher / dedup_exact window / minhash+recursive components /
    decontaminate), cumulative flags c1..c6, and the same one-pass
    conditional aggregation unpivoted to 7 funnel rows."""
    from web_scrapper_spark.operators.urlfilter import DEFAULT_SOFT_WORDS

    hosts_sql = ", ".join(f"'{h}'" for h in _FUNNEL_HOSTS)
    block_sql = ", ".join(f"'{d}'" for d in _UF_BLOCKLIST)
    score = " + ".join(
        f"CASE WHEN contains(lower(url), '{w}') THEN {c} ELSE 0 END"
        for w, c in sorted(DEFAULT_SOFT_WORDS.items())
    )
    lang_sub = _lang_id_sql("fcorpus")
    gopher_sub = _gopher_oracle_sql("fcorpus")
    stages = [
        ("input", "TRUE"), ("url_filter", "c1"), ("lang_en", "c2"),
        ("gopher", "c3"), ("exact_dedup", "c4"), ("near_dedup", "c5"),
        ("decontaminate", "c6"),
    ]
    rows = "\n              UNION ALL ".join(
        f"""SELECT '{label}' AS stage, {i} AS stage_ord,
                     CAST(count(*) FILTER ({cond}) AS BIGINT) AS docs,
                     CAST(COALESCE(sum(bpe) FILTER ({cond}), 0) AS BIGINT) AS tokens
              FROM f6"""
        for i, (label, cond) in enumerate(stages)
    )
    base = f"""
            WITH RECURSIVE fcorpus AS (
              SELECT doc_id, source,
                     CASE WHEN doc_id % 41 = 1 THEN '{_FUNNEL_BOILER}'
                          ELSE text END AS text
              FROM documents
            ), furl AS (
              SELECT doc_id,
                     'https://' || [{hosts_sql}][CAST(doc_id % 8 AS INT) + 1]
                     || '/' || source || '/page' || CAST(doc_id AS VARCHAR)
                     || CASE WHEN doc_id % 13 = 0 THEN '?ref=casino'
                             WHEN doc_id % 17 = 0 THEN '?ref=poker-pills'
                             ELSE '' END AS url
              FROM fcorpus
            ), fufl AS (
              SELECT doc_id,
                     NOT (list_has_any(
                            CASE WHEN len(string_split(h, '.')) >= 2
                                 THEN list_transform(
                                        generate_series(1, len(string_split(h, '.')) - 1),
                                        i -> array_to_string(string_split(h, '.')[i:], '.'))
                                 ELSE [h] END, [{block_sql}])
                          OR ({score}) >= 100) AS url_ok
              FROM (SELECT doc_id, url,
                           lower(regexp_extract(url, '^[a-z]+://([^/:?#]+)', 1)) AS h
                    FROM furl)
            ), flp AS (
              SELECT doc_id, lang_pred FROM ({lang_sub})
            ), fgk AS (
              SELECT doc_id, gopher_keep FROM ({gopher_sub})
            ), fflags AS (
              SELECT d.doc_id, d.text,
                     len(regexp_extract_all(d.text,
                         '[A-Za-z]+|[0-9]+|[^\\sA-Za-z0-9]')) AS bpe,
                     md5(trim(regexp_replace(lower(d.text), '\\s+', ' ', 'g'))) AS fp,
                     fufl.url_ok AS c1,
                     fufl.url_ok AND flp.lang_pred = 'en' AS c2,
                     fufl.url_ok AND flp.lang_pred = 'en' AND fgk.gopher_keep AS c3
              FROM fcorpus d
              JOIN fufl USING (doc_id) JOIN flp USING (doc_id) JOIN fgk USING (doc_id)
            ), f4 AS (
              SELECT *, c3 AND doc_id = min(CASE WHEN c3 THEN doc_id END)
                                 OVER (PARTITION BY fp) AS c4
              FROM fflags
            ), fsrc4 AS (
              SELECT doc_id, text FROM f4 WHERE c4
            ), {_funnel_mh_pair_ctes("fsrc4")}, fe AS (
              SELECT id_a AS src, id_b AS dst FROM fpairs
              UNION SELECT id_b, id_a FROM fpairs
            ), fwalk(node, lbl) AS (
              SELECT doc_id, doc_id FROM fsrc4
              UNION
              SELECT fe.dst, w.lbl FROM fwalk w JOIN fe ON fe.src = w.node
            ), fcomp AS (
              SELECT node AS doc_id, min(lbl) AS component FROM fwalk GROUP BY node
            ), f5 AS (
              SELECT f4.*, f4.c4 AND COALESCE(fcomp.component = f4.doc_id, TRUE) AS c5
              FROM f4 LEFT JOIN fcomp USING (doc_id)
            ), fbench AS (
              SELECT DISTINCT gram FROM ({_funnel_grams_sql("fcorpus", "WHERE doc_id % 50 = 3")})
            ), fdg AS (
              {_funnel_grams_sql("(SELECT doc_id, text FROM f5 WHERE c5) fsrc5")}
            ), fcontam AS (
              SELECT DISTINCT fdg.doc_id FROM fdg JOIN fbench USING (gram)
            ), f6 AS (
              SELECT f5.*, f5.c5 AND fcontam.doc_id IS NULL AS c6
              FROM f5 LEFT JOIN fcontam USING (doc_id)
            )
    """
    if not per_doc:
        return base + f"""
            SELECT stage, stage_ord, docs, tokens FROM (
              {rows}
            ) ORDER BY stage_ord
        """
    return base + """
            SELECT doc_id,
                   CASE WHEN NOT c1 THEN 'url_filter'
                        WHEN NOT c2 THEN 'lang_en'
                        WHEN NOT c3 THEN 'gopher'
                        WHEN NOT c4 THEN 'exact_dedup'
                        WHEN NOT c5 THEN 'near_dedup'
                        WHEN NOT c6 THEN 'decontaminate'
                        ELSE 'kept' END AS dropped_at,
                   c6 AS kept,
                   CAST(bpe AS BIGINT) AS n_tokens
            FROM f6
        """


def _stratified_sample_oracle_sql() -> str:
    """DuckDB twin of _q_stratified_sample: same md5-60-bit rank."""
    in_sql = ", ".join(f"'{k}'" for k in sorted(_STRAT_QUOTAS))
    case_sql = " ".join(
        f"WHEN '{k}' THEN {q}" for k, q in sorted(_STRAT_QUOTAS.items())
    )
    return f"""
            WITH h AS (
              SELECT doc_id, source,
                     ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                       AS hh
              FROM documents
              WHERE source IN ({in_sql})
            ), r AS (
              SELECT doc_id, source,
                     row_number() OVER (
                       PARTITION BY source ORDER BY hh, doc_id) AS rk
              FROM h
            )
            SELECT doc_id, source FROM r
            WHERE rk <= CASE source {case_sql} END
        """


def _q_priority_sample(spark, sf_dir):
    """Weighted sampling without replacement (sampling.priority_sample,
    Duffield–Lund–Thorup 2007): top-30 by integer priority
    w * 2^40 DIV (h40 + 1) with a quality-style weight derived from
    doc_id; the oracle re-ranks the whole corpus in DuckDB and must
    reproduce the selected set, every priority, tau, and the w_est
    estimator bit-exactly."""
    from web_scrapper_spark.operators import sampling as _sp

    docs = _read(spark, sf_dir, "documents")
    weighted = docs.select(
        "doc_id",
        ((F.col("doc_id") * F.col("doc_id")) % 997 + 1)
        .cast("long")
        .alias("weight"),
    )
    return _sp.priority_sample(weighted, 30).select(
        "doc_id", "weight", "priority", "tau", "w_est"
    )


_PRIORITY_SAMPLE_ORACLE = """
        WITH scored AS (
          SELECT doc_id,
                 CAST((doc_id * doc_id) % 997 + 1 AS BIGINT) AS weight,
                 ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 10))::BIGINT
                   AS h
          FROM documents
        ), pri AS (
          SELECT doc_id, weight, h,
                 CAST(weight * 1099511627776 // (h + 1) AS BIGINT) AS priority
          FROM scored
        ), ranked AS (
          SELECT doc_id, weight, h, priority,
                 row_number() OVER (ORDER BY priority DESC, h, doc_id) AS rnk
          FROM pri
        ), tau AS (
          SELECT CASE WHEN (SELECT count(*) FROM ranked) >= 31
                      THEN (SELECT priority FROM ranked WHERE rnk = 31)
                      ELSE 0 END AS tau
        )
        SELECT r.doc_id, r.weight, r.priority,
               CAST(t.tau AS BIGINT) AS tau,
               CAST(greatest(r.weight, t.tau) AS BIGINT) AS w_est
        FROM ranked r CROSS JOIN tau t
        WHERE r.rnk <= 30
    """


def _q_hll_host_distinct(spark, sf_dir):
    """Mergeable HLL registers (operators/sketch.py): per-host distinct
    URL estimate over a synthetic (host, url) stream with planted
    duplicates; the oracle rebuilds buckets, rho via binary-string
    length, the exact harmonic denominator S and the integer estimate
    in DuckDB HUGEINT — registers AND estimate hash-match."""
    from web_scrapper_spark.operators import sketch as _sk

    docs = _read(spark, sf_dir, "documents")
    stream = docs.select(
        F.concat(F.lit("h"), (F.col("doc_id") % 7).cast("string")).alias(
            "host"
        ),
        F.concat(F.lit("u"), (F.col("doc_id") % 293).cast("string")).alias(
            "url"
        ),
    )
    regs = _sk.hll_registers(stream, ["host"], "url", p=9)
    return _sk.hll_estimate(regs, ["host"], p=9).select(
        "host", "present", "v_zero", "s", "est"
    )


def _hll_oracle_sql() -> str:
    from web_scrapper_spark.operators import sketch as _sk

    alpha = _sk.hll_alpha_ppm(9)
    # p=9: suffix_bits=31, k_max=32, m=512
    return f"""
        WITH vals AS (
          SELECT 'h' || CAST(doc_id % 7 AS VARCHAR) AS host,
                 'u' || CAST(doc_id % 293 AS VARCHAR) AS url
          FROM documents
        ), hashed AS (
          SELECT host,
                 ('0x' || substr(md5(url), 1, 10))::BIGINT AS hv
          FROM vals
        ), reg AS (
          SELECT host, hv // 2147483648 AS bucket,
                 max(CASE WHEN hv % 2147483648 = 0 THEN 32
                     ELSE 31 - length(bin(hv % 2147483648)) + 1 END) AS r
          FROM hashed GROUP BY host, hv // 2147483648
        ), agg AS (
          SELECT host, count(*) AS present,
                 sum((1::BIGINT << (32 - r))::BIGINT) AS s_present
          FROM reg GROUP BY host
        )
        SELECT host,
               CAST(present AS BIGINT) AS present,
               CAST(512 - present AS BIGINT) AS v_zero,
               CAST((512 - present) * 4294967296 + s_present AS BIGINT) AS s,
               CAST({alpha}::HUGEINT * 512 * 512 * 4294967296
                    // (1000000 * ((512 - present) * 4294967296 + s_present))
                    AS BIGINT) AS est
        FROM agg
    """


def _q_cms_hot_hosts(spark, sf_dir):
    """Count-min sketch (operators/sketch.py): depth-4 x width-64
    frequency sketch over a skewed synthetic host stream, point
    estimates for every host joined against the exact counts — the
    over-estimate-never-under invariant is part of the hashed output."""
    from web_scrapper_spark.operators import sketch as _sk

    docs = _read(spark, sf_dir, "documents")
    stream = docs.select(
        F.concat(
            F.lit("h"), ((F.col("doc_id") * F.col("doc_id")) % 37).cast("string")
        ).alias("host")
    )
    sketch = _sk.cms_build(stream, "host", width=64, depth=4)
    est = _sk.cms_estimate(
        sketch, stream.distinct(), "host", width=64, depth=4
    )
    exact = stream.groupBy("host").agg(F.count("*").alias("exact"))
    return est.join(exact, "host").select(
        "host",
        F.col("est").cast("long").alias("est"),
        F.col("exact").cast("long").alias("exact"),
        (F.col("est") >= F.col("exact")).alias("never_under"),
    )


_CMS_ORACLE = """
        WITH stream AS (
          SELECT 'h' || CAST((doc_id * doc_id) % 37 AS VARCHAR) AS host
          FROM documents
        ), cells AS (
          SELECT d.d, ('0x' || substr(md5(CAST(d.d AS VARCHAR) || ':' || host),
                       1, 10))::BIGINT % 64 AS cell,
                 count(*) AS cnt
          FROM stream, (SELECT unnest(generate_series(0, 3)) AS d) d
          GROUP BY d.d, cell
        ), probes AS (
          SELECT DISTINCT s.host, d.d,
                 ('0x' || substr(md5(CAST(d.d AS VARCHAR) || ':' || s.host),
                  1, 10))::BIGINT % 64 AS cell
          FROM stream s, (SELECT unnest(generate_series(0, 3)) AS d) d
        ), est AS (
          SELECT p.host, min(coalesce(c.cnt, 0)) AS est
          FROM probes p LEFT JOIN cells c ON p.d = c.d AND p.cell = c.cell
          GROUP BY p.host
        ), exact AS (
          SELECT host, count(*) AS exact FROM stream GROUP BY host
        )
        SELECT e.host, CAST(e.est AS BIGINT) AS est,
               CAST(x.exact AS BIGINT) AS exact,
               e.est >= x.exact AS never_under
        FROM est e JOIN exact x ON e.host = x.host
    """


def _q_cuckoo_seen(spark, sf_dir):
    """Deletable URL-seen filter (frontier/cuckoo.py): build a sharded
    cuckoo filter over the 'seen' keys (doc_id % 3 != 0), evict the
    recrawl-due subset (doc_id % 9 == 1), then probe every inserted
    key. The filter's contract is exactly checkable: retained keys MUST
    probe true (no false negatives), evicted keys MUST probe false
    (exact deletion; the fixture is collision-free at every test SF —
    deterministic forever because sorted inserts make the table layout
    a pure function of the key set). The oracle states that contract
    relationally."""
    from web_scrapper_spark.frontier import cuckoo as _ck

    docs = _read(spark, sf_dir, "documents")
    seen = docs.filter(F.col("doc_id") % 3 != 0).select(
        F.col("doc_id").cast("long").alias("url_hash")
    )
    filt = _ck.build_sharded_cuckoo(seen, "url_hash", 4, 40_000)
    due = docs.filter(F.col("doc_id") % 9 == 1).select(
        F.col("doc_id").cast("long")
    )
    import numpy as _np

    filt.delete_many(
        _np.array([r["doc_id"] for r in due.collect()], dtype=_np.int64)
    )
    return (
        _ck.cuckoo_membership(seen, "url_hash", filt, "in_filter")
        .select(F.col("url_hash").alias("doc_id"), "in_filter")
    )


_CUCKOO_ORACLE = """
        SELECT CAST(doc_id AS BIGINT) AS doc_id,
               (doc_id % 9 != 1) AS in_filter
        FROM documents
        WHERE doc_id % 3 != 0
    """


def _q_host_triangles(spark, sf_dir):
    """Host-graph triangle counting (operators/graph.py host_triangles,
    degree-ordered compact-forward): 20 hosts linked by three affine
    residue families (44 undirected edges, 32 triangles at every SF).
    The oracle closes triangles by the INDEPENDENT lexicographic a<b<c
    triple join — two different algorithms must agree on degree,
    per-host triangle count, and the integer clustering coefficient."""
    from web_scrapper_spark.operators.graph import host_triangles

    docs = _read(spark, sf_dir, "documents")
    h = lambda c: F.concat(F.lit("h"), (c % 20).cast("string"))  # noqa: E731
    d = F.col("doc_id")
    raw = (
        docs.select(h(d).alias("src_host"), h(d * 7 + 3).alias("dst_host"))
        .unionByName(
            docs.select(h(d).alias("src_host"), h(d * 3 + 1).alias("dst_host"))
        )
        .unionByName(
            docs.select(h(d).alias("src_host"), h(d * 9 + 4).alias("dst_host"))
        )
    )
    return host_triangles(raw)


_TRIANGLES_ORACLE = """
        WITH raw AS (
          SELECT 'h' || CAST(doc_id % 20 AS VARCHAR) AS s,
                 'h' || CAST((doc_id * 7 + 3) % 20 AS VARCHAR) AS d
          FROM documents
          UNION ALL
          SELECT 'h' || CAST(doc_id % 20 AS VARCHAR),
                 'h' || CAST((doc_id * 3 + 1) % 20 AS VARCHAR)
          FROM documents
          UNION ALL
          SELECT 'h' || CAST(doc_id % 20 AS VARCHAR),
                 'h' || CAST((doc_id * 9 + 4) % 20 AS VARCHAR)
          FROM documents
        ), und AS (
          SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b
          FROM raw WHERE s <> d
        ), deg AS (
          SELECT v, count(*) AS deg FROM (
            SELECT a AS v FROM und UNION ALL SELECT b AS v FROM und
          ) GROUP BY v
        ), tri AS (
          SELECT e1.a AS x, e1.b AS y, e2.b AS z
          FROM und e1
          JOIN und e2 ON e1.b = e2.a
          JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
        ), corner AS (
          SELECT v, count(*) AS triangles FROM (
            SELECT x AS v FROM tri UNION ALL SELECT y AS v FROM tri
            UNION ALL SELECT z AS v FROM tri
          ) GROUP BY v
        )
        SELECT d.v AS host,
               CAST(d.deg AS BIGINT) AS degree,
               CAST(coalesce(c.triangles, 0) AS BIGINT) AS triangles,
               CAST(CASE WHEN d.deg >= 2
                    THEN 2 * coalesce(c.triangles, 0) * 1000000
                         // (d.deg * (d.deg - 1))
                    ELSE 0 END AS BIGINT) AS cc_ppm
        FROM deg d LEFT JOIN corner c ON d.v = c.v
    """


def _q_ip_politeness(spark, sf_dir):
    """Server-grain politeness (frontier/core.py dequeue_by_ip): 20
    hosts, 14 of them collapsing onto 5 shared IPs (vhost farm), per-
    host robots delays 0-3s with the group binding at the most
    conservative member; the oracle replays grouping, max-delay budget,
    the rank window and the integer slot schedule relationally."""
    from web_scrapper_spark.frontier.core import dequeue_by_ip

    docs = _read(spark, sf_dir, "documents")
    d = F.col("doc_id")
    n = (d % 20).cast("int")
    host = F.concat(F.lit("h"), n.cast("string"), F.lit(".org"))
    frontier = docs.select(
        F.concat(
            F.lit("https://"), host, F.lit("/p"), d.cast("string")
        ).alias("url"),
        host.alias("host"),
        (d % 13).cast("double").alias("priority"),
        (d % 5).cast("int").alias("depth"),
        F.lpad(d.cast("string"), 8, "0").alias("ord_key"),
    )
    hosts = docs.select(
        host.alias("host"), n.alias("n")
    ).distinct()
    robots = hosts.select(
        "host", (F.col("n") % 4).cast("double").alias("crawl_delay")
    )
    host_ip = hosts.filter(F.col("n") < 14).select(
        "host",
        F.concat(F.lit("ip"), (F.col("n") % 5).cast("string")).alias("ip"),
    )
    out = dequeue_by_ip(frontier, robots, host_ip, epoch_seconds=8.0)
    return out.select(
        "url",
        "ip_group",
        F.col("budget").cast("long").alias("budget"),
        F.col("ip_rank").cast("long").alias("ip_rank"),
        F.col("slot_ms").cast("long").alias("slot_ms"),
    )


_IP_POLITENESS_ORACLE = """
        WITH f AS (
          SELECT doc_id,
                 'h' || CAST(doc_id % 20 AS VARCHAR) || '.org' AS host,
                 CAST(doc_id % 20 AS INT) AS n,
                 'https://h' || CAST(doc_id % 20 AS VARCHAR) || '.org/p'
                   || CAST(doc_id AS VARCHAR) AS url,
                 CAST(doc_id % 13 AS DOUBLE) AS priority,
                 CAST(doc_id % 5 AS INT) AS depth,
                 lpad(CAST(doc_id AS VARCHAR), 8, '0') AS ord_key
          FROM documents
        ), hosts AS (
          SELECT DISTINCT host, n FROM f
        ), grouped AS (
          SELECT host,
                 coalesce(CASE WHEN n < 14
                               THEN 'ip' || CAST(n % 5 AS VARCHAR) END,
                          host) AS ip_group,
                 CAST(n % 4 AS DOUBLE) AS delay
          FROM hosts
        ), gb AS (
          SELECT ip_group,
                 CASE WHEN max(delay) > 0
                      THEN greatest(1, CAST(floor(8.0 / max(delay)) AS BIGINT))
                      ELSE 1000000000 END AS budget
          FROM grouped GROUP BY ip_group
        ), routed AS (
          SELECT f.url, g.ip_group, gb.budget,
                 row_number() OVER (
                   PARTITION BY g.ip_group
                   ORDER BY f.priority DESC, f.depth, f.ord_key
                 ) AS ip_rank
          FROM f
          JOIN grouped g ON f.host = g.host
          JOIN gb ON g.ip_group = gb.ip_group
        )
        SELECT url, ip_group,
               CAST(budget AS BIGINT) AS budget,
               CAST(ip_rank AS BIGINT) AS ip_rank,
               CAST((ip_rank - 1) * 8000 // budget AS BIGINT) AS slot_ms
        FROM routed
    """


def _q_latency_quantiles(spark, sf_dir):
    """Integer-exact latency percentiles (frontier/adaptive.py
    latency_quantiles): p50/p95/p99 per host from a 50ms-bucket
    histogram — the q-quantile is the upper edge of the smallest bucket
    reaching ceil(q*n/1e6) cumulative count, never a float
    interpolation; the oracle replays histogram, cumsum and edge pick
    relationally."""
    from web_scrapper_spark.frontier.adaptive import latency_quantiles

    docs = _read(spark, sf_dir, "documents")
    obs = docs.select(
        F.concat(F.lit("h"), (F.col("doc_id") % 9).cast("string")).alias(
            "host"
        ),
        ((F.col("doc_id") * 31) % 2500).cast("long").alias("latency_ms"),
    )
    return latency_quantiles(obs, 50)


_LATENCY_Q_ORACLE = """
        WITH obs AS (
          SELECT 'h' || CAST(doc_id % 9 AS VARCHAR) AS host,
                 (doc_id * 31) % 2500 AS lat
          FROM documents
        ), hist AS (
          SELECT host, lat // 50 AS bucket, count(*) AS n
          FROM obs GROUP BY host, bucket
        ), cum AS (
          SELECT host, bucket,
                 sum(n) OVER (PARTITION BY host ORDER BY bucket) AS cum,
                 sum(n) OVER (PARTITION BY host) AS total
          FROM hist
        )
        SELECT host,
               CAST(max(total) AS BIGINT) AS n_obs,
               CAST(min(CASE WHEN cum >= (total * 500000 + 999999) // 1000000
                        THEN (bucket + 1) * 50 END) AS BIGINT) AS q500000_ms,
               CAST(min(CASE WHEN cum >= (total * 950000 + 999999) // 1000000
                        THEN (bucket + 1) * 50 END) AS BIGINT) AS q950000_ms,
               CAST(min(CASE WHEN cum >= (total * 990000 + 999999) // 1000000
                        THEN (bucket + 1) * 50 END) AS BIGINT) AS q990000_ms
        FROM cum GROUP BY host
    """


def _q_host_volatility(spark, sf_dir):
    """Observed content volatility per host (frontier/recrawl.py
    host_volatility): every doc captures 3 times; odd doc_ids change
    digest at every revisit, even ones never do — hosts aggregate a
    deterministic mix. The oracle replays the lag-over-(url, ts) change
    detection and both integer rates relationally."""
    from web_scrapper_spark.frontier.recrawl import host_volatility

    docs = _read(spark, sf_dir, "documents")
    d = F.col("doc_id")
    host = F.concat(F.lit("h"), (d % 6).cast("string"))
    url = F.concat(F.lit("u"), d.cast("string"))

    def cap(off, shift):
        return docs.select(
            host.alias("host"),
            url.alias("url"),
            (d * 10 + off).cast("long").alias("ts"),
            F.concat(
                F.lit("d"), ((d + shift * (d % 2)) % 3).cast("string")
            ).alias("digest"),
        )

    log = cap(0, 0).unionByName(cap(3, 1)).unionByName(cap(7, 2))
    return host_volatility(log)


_VOLATILITY_ORACLE = """
        WITH log AS (
          SELECT 'h' || CAST(doc_id % 6 AS VARCHAR) AS host,
                 'u' || CAST(doc_id AS VARCHAR) AS url,
                 doc_id * 10 + 0 AS ts,
                 'd' || CAST(doc_id % 3 AS VARCHAR) AS digest
          FROM documents
          UNION ALL
          SELECT 'h' || CAST(doc_id % 6 AS VARCHAR),
                 'u' || CAST(doc_id AS VARCHAR),
                 doc_id * 10 + 3,
                 'd' || CAST((doc_id + 1 * (doc_id % 2)) % 3 AS VARCHAR)
          FROM documents
          UNION ALL
          SELECT 'h' || CAST(doc_id % 6 AS VARCHAR),
                 'u' || CAST(doc_id AS VARCHAR),
                 doc_id * 10 + 7,
                 'd' || CAST((doc_id + 2 * (doc_id % 2)) % 3 AS VARCHAR)
          FROM documents
        ), lagged AS (
          SELECT host, url, ts,
                 lag(digest) OVER (PARTITION BY url ORDER BY ts) AS pd,
                 lag(ts) OVER (PARTITION BY url ORDER BY ts) AS pts,
                 digest
          FROM log
        ), flagged AS (
          SELECT host,
                 url,
                 (pd IS NOT NULL) AS revisit,
                 (pd IS NOT NULL AND digest <> pd) AS changed,
                 ts - pts AS gap
          FROM lagged
        ), agg AS (
          SELECT host,
                 count(*) AS n_captures,
                 count(DISTINCT url) AS n_urls,
                 sum(CASE WHEN revisit THEN 1 ELSE 0 END) AS revisits,
                 sum(CASE WHEN changed THEN 1 ELSE 0 END) AS changes,
                 sum(CASE WHEN changed THEN gap END) AS change_gap
          FROM flagged GROUP BY host
        )
        SELECT host,
               CAST(n_captures AS BIGINT) AS n_captures,
               CAST(n_urls AS BIGINT) AS n_urls,
               CAST(revisits AS BIGINT) AS revisits,
               CAST(changes AS BIGINT) AS changes,
               CAST(CASE WHEN revisits > 0
                    THEN 1000000 * changes // revisits
                    ELSE -1 END AS BIGINT) AS change_ppm,
               CAST(CASE WHEN changes > 0 THEN change_gap // changes
                    ELSE -1 END AS BIGINT) AS mean_change_interval
        FROM agg
    """


#: url_filter query fixture: host cycle + query-string soft words, all
#: derived from doc_id so Spark and DuckDB construct identical URLs.
_UF_HOSTS = [
    "news.example.org",
    "ads.tracker.example.com",
    "tracker.example.com",
    "clean.example.net",
]
_UF_BLOCKLIST = ["tracker.example.com"]


def _q_url_filter(spark, sf_dir):
    """URL filtering (operators/urlfilter.py): suffix blocklist +
    soft-word centi-score over deterministically derived URLs."""
    from web_scrapper_spark.operators import urlfilter as _uf

    docs = _read(spark, sf_dir, "documents")
    host = F.element_at(
        F.array(*[F.lit(h) for h in _UF_HOSTS]),
        (F.col("doc_id") % 4 + 1).cast("int"),
    )
    url = F.concat(
        F.lit("https://"),
        host,
        F.lit("/"),
        F.col("source"),
        F.lit("/page"),
        F.col("doc_id").cast("string"),
        F.when(F.col("doc_id") % 5 == 0, F.lit("?ref=casino"))
        .when(F.col("doc_id") % 7 == 0, F.lit("?ref=poker-pills"))
        .otherwise(F.lit("")),
    )
    out = _uf.url_filter(
        docs.select("doc_id", url.alias("url")), blocklist=_UF_BLOCKLIST
    )
    return out.select(
        "doc_id", "url", "host", "domain_blocked", "word_score_centi", "url_blocked"
    )


#: corpus_funnel fixture: 8-host URL cycle (one blocked suffix),
#: milder soft-word salting than url_filter's (%13/%17 vs %5/%7) so
#: every later funnel stage still sees a meaningful survivor pool, a
#: boilerplate text shared by doc_id % 41 == 1 (exact-dup stage), and
#: an eval slice doc_id % 50 == 3 (coprime with the URL salting, so
#: eval docs actually reach — and are removed by — decontamination).
_FUNNEL_HOSTS = [
    "news.example.org",
    "blog.example.org",
    "tracker.example.com",
    "media.example.net",
    "shop.example.org",
    "docs.example.net",
    "forum.example.org",
    "clean.example.net",
]
_FUNNEL_BOILER = (
    "This page offers the standard legal notice and privacy policy for every "
    "visitor of the site and explains in plain language how cookies work, why "
    "consent matters, which data we keep, when records expire, and where any "
    "question about the terms can be sent by mail or through our public contact "
    "form during normal office hours each week."
)


def _funnel_corpus_urls(docs):
    """(corpus, urls) shared by _q_corpus_funnel: boilerplate-salted
    text + deterministic doc_id-derived URLs."""
    did = F.col("doc_id")
    corpus = docs.select(
        "doc_id",
        "source",
        F.when(did % 41 == 1, F.lit(_FUNNEL_BOILER))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    host = F.element_at(
        F.array(*[F.lit(h) for h in _FUNNEL_HOSTS]),
        (did % 8 + 1).cast("int"),
    )
    url = F.concat(
        F.lit("https://"), host, F.lit("/"), F.col("source"),
        F.lit("/page"), did.cast("string"),
        F.when(did % 13 == 0, F.lit("?ref=casino"))
        .when(did % 17 == 0, F.lit("?ref=poker-pills"))
        .otherwise(F.lit("")),
    )
    return corpus.select("doc_id", "text", url.alias("url"))


def _q_corpus_funnel(spark, sf_dir):
    """The full training-data pipeline as ONE plan
    (operators/pipeline.py corpus_funnel): URL filter → language ID →
    Gopher quality → exact dedup → MinHash near-dedup with cluster
    closure → benchmark decontamination, reported as the per-stage
    (docs, tokens) funnel. Every stage drops documents at sf0.01."""
    from web_scrapper_spark.operators.pipeline import corpus_funnel

    docs = _read(spark, sf_dir, "documents")
    corpus = _funnel_corpus_urls(docs)
    bench = corpus.filter(F.col("doc_id") % 50 == 3).select("doc_id", "text")
    return corpus_funnel(corpus, bench, blocklist=_UF_BLOCKLIST)


def _q_funnel_reasons(spark, sf_dir):
    """Per-document funnel audit (operators/pipeline.py
    funnel_reasons): the FIRST gate that dropped each doc ('kept' for
    survivors) over the same boilerplate-salted fixture as
    corpus_funnel. The oracle is the funnel oracle's identical CTE
    chain with a per-doc final SELECT — proving the aggregate and the
    audit are two projections of one correct flag computation."""
    from web_scrapper_spark.operators.pipeline import funnel_reasons

    docs = _read(spark, sf_dir, "documents")
    corpus = _funnel_corpus_urls(docs)
    bench = corpus.filter(F.col("doc_id") % 50 == 3).select("doc_id", "text")
    return funnel_reasons(corpus, bench, blocklist=_UF_BLOCKLIST)


#: stratified_sample query fixture: exact quotas for 4 strata (others
#: dropped), exercising both quota < stratum and quota > stratum.
_STRAT_QUOTAS = {"src0": 10, "src1": 5, "src2": 40, "src3": 1}


def _q_stratified_sample(spark, sf_dir):
    """Deterministic quota sampling (operators/sampling.py): smallest
    (md5, id) rows per stratum; src2's quota exceeds the sf0.01
    stratum size so the whole stratum survives."""
    from web_scrapper_spark.operators import sampling as _sp

    docs = _read(spark, sf_dir, "documents")
    return _sp.stratified_sample(docs, _STRAT_QUOTAS).select("doc_id", "source")


#: ccnet query fixture: reference slice + hashed-LM sizes + frozen
#: ppm cutoffs (chosen so sf0.01 populates head/middle/tail).
_CCNET = {"ref_mod": 7, "ref_rem": 3, "b2": 512, "b1": 128,
          "head_ppm": 4_066_000, "tail_ppm": 4_148_000}


def _q_ccnet_ppl(spark, sf_dir):
    """CCNet perplexity buckets (operators/quality.py): hashed bigram
    LM fit on the doc_id % 7 == 3 reference slice, mean NLL in ppm,
    head/middle/tail by frozen cutoffs."""
    docs = _read(spark, sf_dir, "documents")
    ref = docs.filter(F.col("doc_id") % _CCNET["ref_mod"] == _CCNET["ref_rem"])
    return _qual.ccnet_ppl_buckets(
        docs,
        ref,
        bigram_buckets=_CCNET["b2"],
        context_buckets=_CCNET["b1"],
        head_ppm=_CCNET["head_ppm"],
        tail_ppm=_CCNET["tail_ppm"],
    )


def _q_semdedup(spark, sf_dir):
    """SemDeDup (operators/dedup.py): medoid quantizer (min-vec_id per
    label — deterministic, SQL-reproducible), eps=0.7 so sf0.01 yields
    real duplicate groups; keeper = least-centroid-similar member."""
    from pyspark.sql import Window

    emb = _read(spark, sf_dir, "embeddings")
    w = Window.partitionBy("label").orderBy("vec_id")
    medoids = (
        emb.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            F.col("label").alias("cell_id"),
            F.transform("embedding", lambda x: x.cast("double")).alias("centroid"),
        )
    )
    return _dd.semdedup(emb, medoids, eps=0.7).select(
        "vec_id", "cell_id", "component", "is_kept"
    )


def _q_pack_sequences(spark, sf_dir):
    """Sequence packing (operators/packing.py): concatenate-then-chunk
    documents into 512-token shards across 8 parallel hash bins. The
    oracle recomputes the same window arithmetic in DuckDB SQL."""
    from web_scrapper_spark.operators import packing as _pk

    docs = _read(spark, sf_dir, "documents")
    return _pk.pack_sequences(docs, budget=512, n_bins=8)


#: ExactSubstr query params: Lee-et-al. k=50 window, block=10 two-level
#: hash (k/block sub-block md5s re-hashed — identical content ⇔
#: identical hash, string work O(L·(b + k/b)) not O(L·k)).
_XSUB = {"k": 50, "block": 10}


def _q_exact_substring(spark, sf_dir):
    """Exact-substring (duplicate-span) dedup, Lee et al. 2021
    (operators/dedup.py exact_substring_dedup): every ≥50-token span
    appearing twice+ corpus-wide is cut from every document. Output is
    per-doc token/span/removal counts plus the md5 of the surviving
    text; the DuckDB oracle recomputes the full two-level-hash →
    dup-count → island-merge → span-removal pipeline independently
    (window functions vs the engine's aggregate fold)."""
    docs = _read(spark, sf_dir, "documents")
    return _dd.exact_substring_dedup(docs, **_XSUB).select(
        "doc_id", "n_tokens", "n_spans", "n_removed", "kept_md5"
    )


def _exact_substring_oracle_sql() -> str:
    k, b = _XSUB["k"], _XSUB["block"]
    strides = " || ".join(f"h[i+{j * b}]" for j in range(k // b))
    return f"""
        WITH tok AS (SELECT doc_id, {_TOKS_SQL} AS t FROM documents),
        blk AS (
          SELECT doc_id, t,
                 CASE WHEN len(t) >= {b}
                      THEN list_transform(generate_series(1, len(t) - {b - 1}),
                                          i -> md5(array_to_string(t[i:i+{b - 1}], ' ')))
                      ELSE [] END AS h
          FROM tok),
        win AS (
          SELECT doc_id,
                 CASE WHEN len(h) >= {k - b + 1}
                      THEN list_transform(generate_series(1, len(h) - {k - b}),
                                          i -> md5({strides}))
                      ELSE [] END AS w
          FROM blk),
        gr AS (SELECT doc_id, i - 1 AS pos, w[i] AS wh
               FROM win, unnest(generate_series(1, len(w))) u(i)),
        dup AS (SELECT wh FROM gr GROUP BY wh HAVING count(*) >= 2),
        hits AS (SELECT doc_id, pos FROM gr JOIN dup USING (wh)),
        isl AS (SELECT doc_id, pos,
                       CASE WHEN pos <= lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + {k}
                            THEN 0 ELSE 1 END AS brk
                FROM hits),
        grp AS (SELECT doc_id, pos,
                       sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS g
                FROM isl),
        spans AS (SELECT doc_id, g, min(pos) AS s, max(pos) + {k} AS e
                  FROM grp GROUP BY doc_id, g),
        spanlist AS (SELECT doc_id, list(struct_pack(s := s, e := e)) AS sl,
                            count(*) AS n_spans, sum(e - s) AS n_removed
                     FROM spans GROUP BY doc_id),
        kept AS (
          SELECT tok.doc_id,
                 -- array_to_string([]) is NULL in DuckDB, '' in Spark
                 coalesce(CASE WHEN sl IS NULL THEN array_to_string(t, ' ')
                      ELSE array_to_string(
                             list_transform(
                               list_filter(generate_series(1, len(t)),
                                 i -> len(list_filter(sl,
                                        sp -> i - 1 >= sp.s AND i - 1 < sp.e)) = 0),
                               i -> t[i]),
                             ' ')
                 END, '') AS kept_text,
                 len(t) AS n_tokens, coalesce(n_spans, 0) AS n_spans,
                 coalesce(n_removed, 0) AS n_removed
          FROM tok LEFT JOIN spanlist USING (doc_id))
        SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST(n_spans AS BIGINT) AS n_spans,
               CAST(n_removed AS BIGINT) AS n_removed,
               md5(kept_text) AS kept_md5
        FROM kept
    """


#: PageRank query params: 5 power iterations, 3 out-edges per doc from
#: an md5-derived deterministic citation graph, damping 85/100 in
#: synthetic chrome wrapped around each document's text so the
#: boilerplate classifier has real nav/footer blocks to reject — built
#: identically by the Spark query and the DuckDB oracle.
_MC_NAV = (
    '<div class="nav"><a href="/">Home</a> <a href="/a">About</a> '
    '<a href="/b">Blog archive</a> <a href="/s">Site map</a></div>'
)
_MC_FOOTER = (
    '<footer><a href="/c">Contact us now</a> | '
    '<a href="/p">Privacy policy page</a></footer>'
)


def _q_main_content(spark, sf_dir):
    """Boilerplate removal (operators/quality.py main_content — jusText
    shallow pass as pure Catalyst HOFs): documents are wrapped in nav +
    footer chrome whose blocks are nearly-all anchor text, then split
    at block-tag boundaries and classified by length + integer-ppm link
    density. The oracle rebuilds the same page and re-classifies with
    DuckDB list lambdas — block counts, retained length, and the
    retained text's md5 must all hash-match."""
    from web_scrapper_spark.operators.quality import main_content

    docs = _read(spark, sf_dir, "documents")
    html = F.concat(
        F.lit("<html><body>" + _MC_NAV + "<p>"),
        F.regexp_replace(F.col("text"), "\n", "</p><p>"),
        F.lit("</p>" + _MC_FOOTER + "</body></html>"),
    )
    return main_content(docs.select("doc_id", html.alias("html")))


def _main_content_oracle_sql() -> str:
    """DuckDB twin of main_content: same split/normalize/link-density
    rules via list lambdas (regexes imported from the operator module
    so the twins cannot drift)."""
    from web_scrapper_spark.operators.quality import (
        _ANCHOR_RE, _BLOCK_SPLIT_RE, _TAG_RE,
    )

    norm = (
        "trim(regexp_replace(regexp_replace({x}, '" + _TAG_RE
        + r"', ' ', 'g'), '\s+', ' ', 'g'))"
    )
    return f"""
        WITH pages AS (
          SELECT doc_id,
                 '<html><body>{_MC_NAV}<p>'
                 || replace(text, chr(10), '</p><p>')
                 || '</p>{_MC_FOOTER}</body></html>' AS html
          FROM documents
        ),
        b0 AS (
          SELECT doc_id,
                 string_split_regex(html, '{_BLOCK_SPLIT_RE}') AS raw
          FROM pages
        ),
        b1 AS (
          SELECT doc_id,
                 list_filter(
                   list_transform(raw, b -> struct_pack(
                     txt := {norm.format(x='b')},
                     alen := CAST(coalesce(list_sum(list_transform(
                       regexp_extract_all(b, '{_ANCHOR_RE}', 1),
                       a -> length({norm.format(x='a')})
                     )), 0) AS BIGINT)
                   )),
                   s -> s.txt <> ''
                 ) AS blocks
          FROM b0
        )
        SELECT doc_id,
               len(blocks) AS n_blocks,
               len(list_filter(blocks, s -> length(s.txt) >= 25
                   AND (s.alen * 1000000) // length(s.txt) <= 500000))
                 AS kept_blocks,
               len(list_filter(blocks, s -> length(s.txt) < 25))
                 AS dropped_short,
               len(list_filter(blocks, s -> length(s.txt) >= 25
                   AND (s.alen * 1000000) // length(s.txt) > 500000))
                 AS dropped_linky,
               length(array_to_string(list_transform(
                 list_filter(blocks, s -> length(s.txt) >= 25
                   AND (s.alen * 1000000) // length(s.txt) <= 500000),
                 s -> s.txt), chr(10))) AS content_len,
               md5(array_to_string(list_transform(
                 list_filter(blocks, s -> length(s.txt) >= 25
                   AND (s.alen * 1000000) // length(s.txt) <= 500000),
                 s -> s.txt), chr(10))) AS content_md5
        FROM b1
    """


def _q_jsonld(spark, sf_dir):
    """schema.org JSON-LD extraction (operators/structured.py):
    documents become pages carrying 1-2 ld+json blocks (Article
    always; Product when doc_id%3=0; %5=0 docs get a malformed block
    that must yield NULLs, not errors). Fields are doc_id-derived so
    no raw text needs JSON escaping; the oracle re-reads the same
    blocks with DuckDB json_extract_string."""
    from web_scrapper_spark.operators.structured import jsonld_extract

    docs = _read(spark, sf_dir, "documents")
    d = F.col("doc_id")
    article = F.concat(
        F.lit('{"@type":"Article","headline":"Doc '), d.cast("string"),
        F.lit('","datePublished":"2025-07-'),
        F.lpad((d % 28 + 1).cast("string"), 2, "0"),
        F.lit('","author":{"name":"Author '), (d % 11).cast("string"),
        F.lit('"}}'),
    )
    product = F.concat(
        F.lit('{"@type":"Product","name":"Item '), d.cast("string"),
        F.lit('","offers":{"price":'), (d % 900 + 1).cast("string"),
        F.lit('.5,"priceCurrency":"USD"}}'),
    )
    wrap = lambda j: F.concat(  # noqa: E731
        F.lit('<script type="application/ld+json">'), j, F.lit("</script>")
    )
    html = F.concat(
        F.lit("<html><head>"),
        wrap(article),
        F.when(d % 3 == 0, wrap(product)).otherwise(F.lit("")),
        F.when(d % 5 == 0, wrap(F.lit('{"@type":'))).otherwise(F.lit("")),
        F.lit("</head><body>ok</body></html>"),
    )
    pages = docs.select(
        F.concat(F.lit("https://ld.example.org/p/"), d.cast("string")).alias("url"),
        html.alias("html"),
    )
    return jsonld_extract(pages)


def _q_host_boilerplate(spark, sf_dir):
    """Per-host statistical boilerplate (operators/quality.py
    host_boilerplate): documents become 9 hosts' pages wrapped in the
    same nav/footer chrome as main_content's fixture — chrome blocks
    appear on every page of a host (frac 100%) and must classify as
    boilerplate; body paragraphs don't. Oracle re-derives block md5s
    and both aggregates with DuckDB list ops."""
    from web_scrapper_spark.operators.quality import host_boilerplate

    docs = _read(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://b"), (F.col("doc_id") % 9).cast("string"),
        F.lit(".example.org/p/"), F.col("doc_id").cast("string"),
    )
    html = F.concat(
        F.lit("<html><body>" + _MC_NAV + "<p>"),
        F.regexp_replace(F.col("text"), "\n", "</p><p>"),
        F.lit("</p>" + _MC_FOOTER + "</body></html>"),
    )
    return host_boilerplate(
        docs.select(url.alias("url"), html.alias("html"))
    )


def _jsonld_oracle_sql() -> str:
    """DuckDB twin of jsonld_extract over the same synthesized pages:
    same block regex (imported — the twins cannot drift), 0-based
    block positions, json_valid-guarded field reads (Spark's
    get_json_object yields NULL on malformed JSON; DuckDB would
    error)."""
    from web_scrapper_spark.operators.structured import JSONLD_BLOCK_RE

    rx = JSONLD_BLOCK_RE.replace("'", "''")
    fields = {
        "jsonld_type": '$."@type"',
        "name": "$.name",
        "headline": "$.headline",
        "date_published": "$.datePublished",
        "author_name": "$.author.name",
        "price": "$.offers.price",
        "currency": "$.offers.priceCurrency",
    }
    reads = ",\n               ".join(
        "CASE WHEN json_valid(s.block) THEN "
        f"json_extract_string(s.block, '{path}') END AS {name}"
        for name, path in fields.items()
    )
    return f"""
        WITH pages AS (
          SELECT 'https://ld.example.org/p/' || doc_id AS url,
                 '<html><head>'
                 || '<script type="application/ld+json">'
                 || '{{"@type":"Article","headline":"Doc ' || doc_id
                 || '","datePublished":"2025-07-'
                 || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0')
                 || '","author":{{"name":"Author ' || (doc_id % 11)
                 || '"}}}}' || '</script>'
                 || CASE WHEN doc_id % 3 = 0 THEN
                      '<script type="application/ld+json">'
                      || '{{"@type":"Product","name":"Item ' || doc_id
                      || '","offers":{{"price":' || (doc_id % 900 + 1)
                      || '.5,"priceCurrency":"USD"}}}}' || '</script>'
                    ELSE '' END
                 || CASE WHEN doc_id % 5 = 0 THEN
                      '<script type="application/ld+json">{{"@type":</script>'
                    ELSE '' END
                 || '</head><body>ok</body></html>' AS html
          FROM documents
        ),
        b AS (
          SELECT url, regexp_extract_all(html, '{rx}', 1) AS blocks
          FROM pages
        ),
        ex AS (
          SELECT url,
                 unnest(list_transform(
                   generate_series(1, len(blocks)),
                   i -> struct_pack(block_pos := i - 1, block := blocks[i])
                 )) AS s
          FROM b
        )
        SELECT url, CAST(s.block_pos AS INT) AS block_pos,
               {reads}
        FROM ex
    """


def _host_boilerplate_oracle_sql() -> str:
    from web_scrapper_spark.operators.quality import (
        _BLOCK_SPLIT_RE, _TAG_RE,
    )

    norm = (
        "trim(regexp_replace(regexp_replace({x}, '" + _TAG_RE
        + r"', ' ', 'g'), '\s+', ' ', 'g'))"
    )
    return f"""
        WITH pages AS (
          SELECT 'b' || (doc_id % 9) || '.example.org' AS host,
                 '<html><body>{_MC_NAV}<p>'
                 || replace(text, chr(10), '</p><p>')
                 || '</p>{_MC_FOOTER}</body></html>' AS html
          FROM documents
        ),
        b0 AS (
          SELECT host,
                 list_distinct(list_filter(
                   list_transform(
                     string_split_regex(html, '{_BLOCK_SPLIT_RE}'),
                     b -> md5({norm.format(x='b')})
                   ),
                   h -> h <> md5('')
                 )) AS hashes
          FROM pages
        ),
        ex AS (SELECT host, unnest(hashes) AS block_md5 FROM b0),
        pb AS (
          SELECT host, block_md5, count(*) AS block_pages
          FROM ex GROUP BY host, block_md5
        ),
        ph AS (SELECT host, count(*) AS host_pages FROM b0 GROUP BY host)
        SELECT p.host, p.block_md5, p.block_pages, h.host_pages,
               CAST((p.block_pages * 1000000) // h.host_pages AS BIGINT)
                 AS frac_ppm,
               (h.host_pages >= 5
                AND (p.block_pages * 1000000) // h.host_pages >= 500000)
                 AS is_boilerplate
        FROM pb p JOIN ph h USING (host)
    """


def _q_recrawl_due(spark, sf_dir):
    """Freshness-driven recrawl scheduling (frontier/recrawl.py):
    documents become a sitemap hint table (changefreq cycling through
    all 7 protocol values, lastmod spread over July, every 3rd URL
    hint-less → default period) plus a seen set fetched at epochs 0-4.
    recrawl_due computes which URLs are due at epoch 8 under integer
    period math plus the modified-since override. The oracle recomputes
    the schedule relationally — period table, ceiling division, and
    override precedence must all match. NULL due_epoch/priority (never-
    rows, hint-less rows) are coalesced to -1 so no NULL-int crosses
    the pandas dtype boundary."""
    from web_scrapper_spark.frontier.recrawl import recrawl_due

    docs = _read(spark, sf_dir, "documents")
    u = F.concat(F.lit("https://rc.example.org/p/"), F.col("doc_id").cast("string"))
    freqs = F.array(
        *[F.lit(x) for x in (
            "always", "hourly", "daily", "weekly", "monthly", "yearly", "never"
        )]
    )
    hints = docs.filter(F.col("doc_id") % 3 != 0).select(
        u.alias("url"),
        F.element_at(freqs, (F.col("doc_id") % 7 + 1).cast("int")).alias("changefreq"),
        F.concat(
            F.lit("2025-07-"),
            F.lpad((F.col("doc_id") % 28 + 1).cast("string"), 2, "0"),
        ).alias("lastmod"),
        ((F.col("doc_id") % 10) * 100000).cast("int").alias("priority_ppm"),
    )
    seen = docs.select(
        u.alias("url"), (F.col("doc_id") % 5).cast("int").alias("fetched_epoch")
    )
    res = recrawl_due(seen, hints, current_epoch=8, modified_since="2025-07-25")
    return res.select(
        "url",
        "fetched_epoch",
        F.coalesce(F.col("due_epoch"), F.lit(-1)).cast("int").alias("due_epoch"),
        F.coalesce(F.col("priority_ppm"), F.lit(-1)).cast("int").alias("priority_ppm"),
        "reason",
    )


def _q_adaptive_delay(spark, sf_dir):
    """Adaptive per-host politeness (frontier/adaptive.py): events
    become deterministic fetch observations — host = user_id mod 37,
    epoch = UTC day index, latency_ms derived from the value column's
    cents, error events flagged — and ``adaptive_delays`` folds them
    into an integer EWMA (alpha=1/4) with AIMD backoff (4x when the
    latest epoch's error rate ≥ 20%) clamped to [100ms, 30s]. The
    oracle re-walks the per-host fold with a recursive CTE — every
    step is integer floor arithmetic, so delays match bit-exactly."""
    from web_scrapper_spark.frontier.adaptive import adaptive_delays

    ev = _read(spark, sf_dir, "events")
    obs = ev.select(
        F.concat(F.lit("h"), (F.col("user_id") % 37).cast("string")).alias(
            "host"
        ),
        F.floor(F.unix_timestamp("ts") / 86400).cast("long").alias("epoch"),
        (F.lit(50) + _cents(F.col("value")) % 2000).alias("latency_ms"),
        (F.col("event_type") == "error").alias("is_err"),
    )
    return adaptive_delays(obs)


def _q_asof_join(spark, sf_dir):
    """Distributed backward as-of join (operators/asof.py) — CDX time
    travel: for each (url, query-time) find the capture current at
    that time. Captures are documents (url_id = doc_id mod 97, capture
    ts = doc_id, digest from md5); queries probe ±5 around their own
    doc_id so matches land before, at (inclusive tie), and after
    capture times, including the no-earlier-capture NULL case. The
    oracle is DuckDB's NATIVE ASOF LEFT JOIN — an independent
    first-class implementation of the same semantics, the strongest
    oracle a custom operator can have. No-match NULLs are coalesced to
    sentinels (-1 / '') on BOTH sides so no NULL-int crosses the
    pandas dtype boundary (the recrawl_due pattern)."""
    from web_scrapper_spark.operators.asof import asof_join

    docs = _read(spark, sf_dir, "documents")
    captures = docs.select(
        (F.col("doc_id") % 97).alias("url_id"),
        F.col("doc_id").alias("cts"),
        F.md5(F.col("doc_id").cast("string")).alias("digest"),
    )
    queries = docs.select(
        (F.col("doc_id") % 97).alias("url_id"),
        (F.col("doc_id") + F.col("doc_id") % 11 - 5).alias("qts"),
    )
    out = asof_join(
        queries, captures, "url_id", left_ts="qts", right_ts="cts"
    )
    return out.select(
        "url_id",
        "qts",
        F.coalesce(F.col("asof_cts"), F.lit(-1)).alias("asof_cts"),
        F.coalesce(F.col("asof_digest"), F.lit("")).alias("asof_digest"),
    )


def _q_url_shapes(spark, sf_dir):
    """URL template mining (frontier/traps.py url_shape_profile):
    documents become URLs over 23 hosts cycling through five path
    grammars — calendar (/s/N/N/N), pagination (/s/s/N), hex ids
    (/s/H), mixed-word articles (/s/s), and a static page. The oracle
    re-derives the segment-level shape with list_transform and
    re-aggregates; families, counts, and the min-URL examples must
    match exactly."""
    from web_scrapper_spark.frontier.traps import url_shape_profile

    docs = _read(spark, sf_dir, "documents")
    d = F.col("doc_id")
    path = (
        F.when(
            d % 5 == 0,
            F.concat(
                F.lit("/cal/"), (2000 + d % 30).cast("string"),
                F.lit("/"), (d % 12 + 1).cast("string"),
                F.lit("/"), (d % 28 + 1).cast("string"),
            ),
        )
        .when(d % 5 == 1, F.concat(F.lit("/blog/page/"), d.cast("string")))
        .when(d % 5 == 2, F.concat(F.lit("/d/"), F.md5(d.cast("string"))))
        .when(
            d % 5 == 3,
            F.concat(F.lit("/article/item-"), d.cast("string")),
        )
        .otherwise(F.lit("/about"))
    )
    urls = docs.select(
        F.concat(
            F.lit("https://h"), (d % 23).cast("string"), F.lit(".org"), path
        ).alias("url")
    )
    return url_shape_profile(urls)


def _q_range_join(spark, sf_dir):
    """Distributed range join (operators/asof.py range_join) — IP
    block → ASN attribution: host "IPs" are md5-derived 32-bit ints,
    the ASN table is 97 non-overlapping /25-ish blocks tiling part of
    the space (points outside any block drop — inner semantics, a
    bucket boundary never leaks a row). Exploded bucketing with a
    2^20 span; the oracle is the plain BETWEEN join DuckDB can afford
    at this scale."""
    from web_scrapper_spark.operators.asof import range_join

    docs = _read(spark, sf_dir, "documents")
    ip = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("long")
        % (1 << 32)
    )
    points = docs.select(F.col("doc_id").alias("pid"), ip.alias("v"))
    blocks = spark.range(97).select(
        F.concat(F.lit("AS"), F.col("id").cast("string")).alias("asn"),
        (F.col("id") * ((1 << 32) // 97)).alias("lo"),
        (F.col("id") * ((1 << 32) // 97) + ((1 << 32) // 97) * 3 // 4 - 1)
        .alias("hi"),
    )
    return range_join(points, blocks, bucket_span=1 << 20).select(
        "pid", "v", "range_asn", "range_lo", "range_hi"
    )


def _q_quality_drift(spark, sf_dir):
    """Corpus-mix drift (operators/quality.py distribution_drift):
    documents split into 5 synthetic crawl epochs (doc_id mod 5),
    bucketed by the alpha-ratio quality bands, each epoch's mix
    compared to epoch 0 as an exact integer total-variation ppm. The
    oracle replays the grid (absent buckets count 0), the floored
    shares, and the halved L1 sum."""
    from web_scrapper_spark.operators.quality import distribution_drift

    docs = _read(spark, sf_dir, "documents")
    q = F.floor(
        F.length(F.regexp_replace("text", "[^A-Za-z]", "")) * 1_000_000
        / F.greatest(F.length("text"), F.lit(1))
    )
    # edges placed inside the synthetic corpus's alpha-ratio range
    # (794k-855k ppm) so every band is populated and the grid's
    # zero-fill is exercised by genuinely uneven epochs
    bucket = F.concat(
        F.lit("q"),
        (
            F.when(q >= 815_000, 1).otherwise(0)
            + F.when(q >= 822_000, 1).otherwise(0)
            + F.when(q >= 828_000, 1).otherwise(0)
        ).cast("string"),
    )
    base = docs.select(
        (F.col("doc_id") % 5).cast("long").alias("epoch"),
        bucket.alias("bucket"),
    )
    return distribution_drift(base, "epoch", "bucket", 0)


def _q_robots_audit(spark, sf_dir):
    """Robots compliance audit (frontier/core.py robots_audit):
    documents become fetched URLs over 13 hosts — paths cycle through
    /private/ok… (Allow-overridden on even hosts), /private/… (always
    disallowed), and /pub/… (clean) — with one disallow + one
    conditional allow rule per host. Exercises longest-match override,
    violation counting, the ppm floor division, and the deterministic
    min-violating-URL sample. The oracle recomputes the expected
    verdict per path class relationally (the general longest-match
    fold itself is oracle-verified by `robots_allow`)."""
    from web_scrapper_spark.frontier.core import robots_audit

    docs = _read(spark, sf_dir, "documents")
    hidx = F.col("doc_id") % 13
    path = (
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(F.lit("/private/ok"), F.col("doc_id").cast("string")),
        )
        .when(
            F.col("doc_id") % 4 == 1,
            F.concat(F.lit("/private/"), F.col("doc_id").cast("string")),
        )
        .otherwise(F.concat(F.lit("/pub/"), F.col("doc_id").cast("string")))
    )
    fetches = docs.select(
        F.concat(
            F.lit("https://h"), hidx.cast("string"), F.lit(".org"), path
        ).alias("url")
    )
    rules = spark.createDataFrame(
        [
            (
                f"h{h}.org",
                ["/private"],
                ["/private/ok"] if h % 2 == 0 else [],
            )
            for h in range(13)
        ],
        "host string, disallow_prefixes array<string>, "
        "allow_prefixes array<string>",
    )
    return robots_audit(fetches, rules)


def _q_corpus_layout(spark, sf_dir):
    """Training-corpus export layout (operators/layout.py): quality is
    the alpha-character ratio in ppm (integer floor), buckets are the
    default 25/50/75% edges, shards are ceil(partition/16) with
    md5-mod placement. The oracle replays bucket ordinals, the ceiling
    division, and the 60-bit md5 shard hash — the same engine-
    reproducible hash idiom the pagerank/LSH oracles already verify."""
    from web_scrapper_spark.operators.layout import corpus_layout

    docs = _read(spark, sf_dir, "documents")
    q = docs.select(
        "doc_id",
        "lang",
        F.floor(
            F.length(F.regexp_replace("text", "[^A-Za-z]", "")) * 1_000_000
            / F.greatest(F.length("text"), F.lit(1))
        )
        .cast("long")
        .alias("quality_ppm"),
    )
    return corpus_layout(q, rows_per_shard=16)


def _q_embedding_quantize(spark, sf_dir):
    """Per-dimension int8 scalar quantization (operators/similarity.py
    quantize_embeddings): corpus-wide lo/hi per dimension (one
    map-side-combined aggregate, broadcast back as literals), then a
    pure integer projection. Floats enter through the floor(x*1e6)
    micro-int gate, so the oracle replays every code exactly."""
    from web_scrapper_spark.operators.similarity import quantize_embeddings

    vecs = _read(spark, sf_dir, "embeddings")
    qv = quantize_embeddings(vecs)
    return qv.select(
        "vec_id", F.posexplode("qvec").alias("dim", "q")
    ).select(
        "vec_id",
        F.col("dim").cast("long").alias("dim"),
        F.col("q").cast("long").alias("q"),
    )


def _q_corpus_card(spark, sf_dir):
    """Corpus datasheet (operators/quality.py corpus_card): per
    (lang, source) doc/char/token totals + exact integer low-median
    token count via the (group, token_count) histogram — no
    corpus-wide window. Oracle replays the histogram, the cumulative
    window over distinct values, and the 2*cum >= n median rule."""
    from web_scrapper_spark.operators.quality import corpus_card

    docs = _read(spark, sf_dir, "documents")
    return corpus_card(docs)


def _q_compression_ratio(spark, sf_dir):
    """zlib compression-ratio quality gate (operators/quality.py
    compression_ratio): one Arrow mapInPandas projection over the
    deterministic fixture corpus; gates at [120000, 1000000] ppm split
    the fixture non-vacuously (ratios span ~81k-325k). Oracle = the
    same stdlib zlib in the driver's oracle process, frozen to VALUES
    (DEFLATE at a fixed level is a pure function of the bytes)."""
    from web_scrapper_spark.operators.bpe import fixture_docs
    from web_scrapper_spark.operators.quality import compression_ratio

    docs = fixture_docs(spark)
    return compression_ratio(docs, min_ratio_ppm=120_000)


def _compression_ratio_oracle_sql() -> str:
    """Expected per-doc zlib stats recomputed sequentially."""
    if "compression_ratio" not in _ORACLE_CACHE:
        import zlib

        from web_scrapper_spark.operators.bpe import fixture_doc_texts

        values = []
        for doc_id, text in fixture_doc_texts():
            raw = text.encode("utf-8")
            comp = zlib.compress(raw, 6)
            ratio = len(comp) * 1_000_000 // len(raw) if raw else -1
            keep = "true" if 120_000 <= ratio <= 1_000_000 else "false"
            values.append(
                f"({doc_id}, {len(raw)}, {len(comp)}, {ratio}, {keep})"
            )
        rows = ",\n              ".join(values)
        _ORACLE_CACHE["compression_ratio"] = (
            f"SELECT * FROM (VALUES {rows}) "
            "AS t(doc_id, raw_len, comp_len, ratio_ppm, keep_compress)"
        )
    return _ORACLE_CACHE["compression_ratio"]


def _q_sim_sq_topk(spark, sf_dir):
    """Quantized top-k search (operators/similarity.py sq_topk):
    symmetric int8-code dot product, queries = first 8 vectors,
    corpus scanned once with the queries broadcast — no float enters
    the ranking, so the oracle replay is bit-exact, not epsilon."""
    from web_scrapper_spark.operators.similarity import (
        quantize_embeddings,
        sq_topk,
    )

    vecs = _read(spark, sf_dir, "embeddings")
    qv = quantize_embeddings(vecs)
    queries = qv.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "qvec"
    )
    return sq_topk(queries, qv, k=5)


def _q_host_moves(spark, sf_dir):
    """Site-migration detection (operators/graph.py host_moves):
    seven m*.old.org hosts redirect ~80% of their pages to their
    .new.org twins (the mass-301 move) with a 20% CDN scatter, plus
    two sc*.org hosts whose redirects scatter across 13 destinations
    (never a move); mixed-case schemes/hosts and userinfo exercise
    the host extraction. The oracle replays parsing, pair counts, the
    tie-broken dominant destination, and the exact share/moved rule."""
    from web_scrapper_spark.operators.graph import host_moves

    docs = _read(spark, sf_dir, "documents")
    d = F.col("doc_id")
    scheme = F.when(d % 4 == 0, F.lit("HTTP://")).otherwise(
        F.lit("http://")
    )
    user = F.when(d % 6 == 0, F.lit("u:p@")).otherwise(F.lit(""))
    m = (d % 7).cast("string")
    # explicit default ports on a slice of rows: :80/:443 must fold
    # into the portless host (the surt discipline) or the evidence
    # splits and the move share drops below threshold
    sport = F.when(d % 8 == 0, F.lit(":80")).otherwise(F.lit(""))
    dport = F.when(d % 9 == 0, F.lit(":443")).otherwise(F.lit(""))
    src_move = F.concat(
        scheme, user, F.lit("M"), m, F.lit(".old.org"), sport,
        F.lit("/p/"), d.cast("string"),
    )
    dst_move = F.when(
        d % 5 == 0,
        F.concat(
            F.lit("https://cdn"), (d % 3).cast("string"),
            F.lit(".other.org/p/"), d.cast("string"),
        ),
    ).otherwise(
        F.concat(
            F.lit("https://m"), m, F.lit(".new.org"), dport,
            F.lit("/p/"), d.cast("string"),
        )
    )
    moves = docs.select(src_move.alias("src_url"), dst_move.alias("dst_url"))
    scatter = docs.select(
        F.concat(
            F.lit("http://sc"), (d % 2).cast("string"),
            F.lit(".org/p/"), d.cast("string"),
        ).alias("src_url"),
        F.concat(
            F.lit("http://z"), (d % 13).cast("string"),
            F.lit(".org/"),
        ).alias("dst_url"),
    )
    # scheme-MISmatched "default" ports are genuinely non-default
    # endpoints: https://q*.org:80 and http://q*.new.org:443 must keep
    # their ports as distinct hosts (the round-3 review fix) — the
    # ported host names land verbatim in the output rows, so a
    # regression back to blanket :80/:443 stripping hash-reds here
    ported = docs.filter(d % 11 == 0).select(
        F.concat(
            F.lit("https://q"), (d % 3).cast("string"),
            F.lit(".org:80/p/"), d.cast("string"),
        ).alias("src_url"),
        F.concat(
            F.lit("http://q"), (d % 3).cast("string"),
            F.lit(".new.org:443/p/"), d.cast("string"),
        ).alias("dst_url"),
    )
    return host_moves(moves.unionByName(scatter).unionByName(ported))


def _q_postings_merge(spark, sf_dir):
    """Incremental index maintenance (operators/textops.py
    merge_postings): the corpus splits into mod-2 shards, each built
    UNGATED with norms (only a delta pays tokenization in production),
    then merged with the standard df gates applied at merge time —
    and the output must equal the batch `postings` build bit-for-bit,
    so the oracle IS the batch replay (the strongest incremental
    contract this suite states). dls dropped before flattening to
    match the batch oracle's shape."""
    from web_scrapper_spark.operators.textops import (
        build_postings,
        merge_postings,
    )

    docs = _read(spark, sf_dir, "documents")
    n = docs.count()
    shard_a = build_postings(
        docs.filter(F.col("doc_id") % 2 == 0), n, block_size=64,
        include_dls=True,
    )
    shard_b = build_postings(
        docs.filter(F.col("doc_id") % 2 == 1), n, block_size=64,
        include_dls=True,
    )
    merged = merge_postings(
        [shard_a, shard_b], min_df=2, max_df_ppm=800_000, n_docs=n,
        block_size=64,
    )
    return merged.select(
        "term",
        "df",
        "block",
        F.posexplode(F.arrays_zip("doc_ids", "tfs")).alias("pos", "entry"),
    ).select(
        "term",
        "df",
        "block",
        F.col("pos").cast("long").alias("pos"),
        F.col("entry.doc_ids").alias("doc_id"),
        F.col("entry.tfs").alias("tf"),
    )


def _q_more_like_this(spark, sf_dir):
    """Lucene-style More-Like-This (operators/textops.py
    more_like_this): every 97th doc queries the index with its own
    top-3 BM25 keyword weights, DAAT-ranked, self excluded, ranks
    re-densified. The oracle GLUES the two proven chains — the
    bm25_topk keyword-weight replay (restricted to source docs, df/N/T
    global) feeding the bm25_search index replay — and must match
    every score bit-exactly across both stages."""
    from web_scrapper_spark.operators.textops import more_like_this

    docs = _read(spark, sf_dir, "documents")
    src = [
        int(r["doc_id"])
        for r in docs.filter(F.col("doc_id") % 97 == 0)
        .select("doc_id")
        .collect()
    ]
    return more_like_this(
        docs, src, k=4, m_terms=3, min_df=2, max_df_ppm=800_000
    )


def _q_mlt_from_index(spark, sf_dir):
    """More-Like-This served from a PREBUILT index (operators/
    textops.py more_like_this with index=): the interactive path a
    live crawl uses — query terms derived from the persisted postings
    via bm25_term_weights_from_postings (integer triples, zero corpus
    re-tokenization) and the search streaming the same postings. The
    oracle replays the identical glued arithmetic from the raw text,
    proving from-index ≡ from-text bit-exactly."""
    from web_scrapper_spark.operators.textops import (
        build_postings,
        doc_lengths,
        more_like_this,
    )

    docs = _read(spark, sf_dir, "documents")
    dls = doc_lengths(docs)
    tot = dls.agg(F.count("*").alias("n"), F.sum("dl").alias("t")).collect()[0]
    n_docs, t_tokens = int(tot["n"]), int(tot["t"])
    idx = {
        "postings": build_postings(
            docs, n_docs, include_dls=True
        ).localCheckpoint(eager=True),
        "doc_lens": dls,
        "n_docs": n_docs,
        "t_tokens": t_tokens,
    }
    src = [
        int(r["doc_id"])
        for r in docs.filter(F.col("doc_id") % 89 == 0)
        .select("doc_id")
        .collect()
    ]
    return more_like_this(None, src, k=5, m_terms=4, index=idx)


def _q_mlt_persisted_weights(spark, sf_dir):
    """More-Like-This through the PERSISTED term-weight table
    (crawl/epoch.py cfg.index_term_weights → load_search_index
    attaches it; operators/textops.py more_like_this consumes
    index['term_weights'] automatically): query formation is a pure
    read of the ranked top-m table — no per-call postings derivation.
    Built here exactly as the epoch commit builds it
    (bm25_term_weights_from_postings(merged, k=top_m)); the oracle is
    the SAME from-index replay, proving persisted ≡ derived ≡
    from-text bit-exactly."""
    from web_scrapper_spark.operators.textops import (
        bm25_term_weights_from_postings,
        build_postings,
        doc_lengths,
        more_like_this,
    )

    docs = _read(spark, sf_dir, "documents")
    dls = doc_lengths(docs)
    tot = dls.agg(F.count("*").alias("n"), F.sum("dl").alias("t")).collect()[0]
    n_docs, t_tokens = int(tot["n"]), int(tot["t"])
    postings = build_postings(
        docs, n_docs, include_dls=True
    ).localCheckpoint(eager=True)
    idx = {
        "postings": postings,
        "doc_lens": dls,
        "n_docs": n_docs,
        "t_tokens": t_tokens,
        # the persisted table, exactly as _commit_term_weights writes it
        "term_weights": bm25_term_weights_from_postings(
            postings, k=6
        ).localCheckpoint(eager=True),
        "term_weights_top_m": 6,
    }
    src = [
        int(r["doc_id"])
        for r in docs.filter(F.col("doc_id") % 89 == 0)
        .select("doc_id")
        .collect()
    ]
    return more_like_this(None, src, k=5, m_terms=4, index=idx)


def _q_robots_refresh(spark, sf_dir):
    """robots.txt TTL refresh scheduling (frontier/robots.py
    robots_refresh_due): a synthetic seen set where every 6th doc is a
    root robots capture (epochs mod 12), audited against a WIDER host
    universe (mod 23 > mod 19) so stale, fresh, and never-fetched
    hosts all appear; nested /sub/robots.txt paths must NOT count.
    The oracle replays the root-path regex filter, the latest-capture
    aggregate, and the TTL arithmetic."""
    from web_scrapper_spark.frontier.robots import robots_refresh_due

    docs = _read(spark, sf_dir, "documents")
    d = F.col("doc_id")
    h19 = F.concat(F.lit("h"), (d % 19).cast("string"), F.lit(".ex.org"))
    # every 4th robots capture uses an UPPERCASE scheme — schemes are
    # case-insensitive (RFC 3986 §3.1); these rows must still count
    rscheme = F.when(d % 24 == 0, F.lit("HTTPS://")).otherwise(
        F.lit("https://")
    )
    url = F.when(
        d % 6 == 0, F.concat(rscheme, h19, F.lit("/robots.txt"))
    ).when(
        d % 6 == 3,
        F.concat(F.lit("https://"), h19, F.lit("/sub/robots.txt")),
    ).otherwise(
        F.concat(F.lit("https://"), h19, F.lit("/p/"), d.cast("string"))
    )
    seen = docs.select(
        h19.alias("host"), url.alias("url"),
        (d % 12).cast("long").alias("fetched_epoch"),
    )
    hosts = docs.select(
        F.concat(
            F.lit("h"), (d % 23).cast("string"), F.lit(".ex.org")
        ).alias("host")
    )
    return robots_refresh_due(seen, hosts, current_epoch=15, ttl_epochs=5)


def _q_url_equivalence(spark, sf_dir):
    """URL equivalence classes (operators/graph.py
    url_equivalence_classes): redirect-hop evidence (chains to the
    mod-3 base URL) unioned with rel=canonical evidence (utm variants
    of even docs) → transitive closure → one lexicographic canonical
    identity + class size per URL. The oracle re-walks the closure
    with a recursive min-label CTE over the identical edge
    construction."""
    from web_scrapper_spark.operators.graph import url_equivalence_classes

    docs = _read(spark, sf_dir, "documents")
    d = F.col("doc_id")

    def u(e):
        return F.concat(
            F.lit("http://h"), (e % 13).cast("string"),
            F.lit(".ex.org/r/"), e.cast("string"),
        )

    base = d - d % 3
    redirects = docs.filter(d % 3 != 0).select(
        u(d).alias("src_url"), u(base).alias("dst_url")
    )
    canon = docs.filter(d % 2 == 0).select(
        F.concat(u(d), F.lit("?utm="), d.cast("string")).alias("src_url"),
        u(d).alias("dst_url"),
    )
    return url_equivalence_classes(redirects.unionByName(canon))


def _q_retrieval_eval(spark, sf_dir):
    """TREC-style retrieval evaluation (operators/textops.py
    retrieval_metrics): a deterministic 3-query run (doc_id ≡ q mod
    29, rank by id, top-8) scored against graded judgments with
    retrieved-and-relevant, retrieved-but-unjudged, and
    relevant-but-unretrieved docs all present (mod-31 off-run pool →
    recall < 1). DCG discounts are a frozen integer table embedded
    identically in both engines; nDCG/MRR/recall are ppm floor
    divisions — bit-exact."""
    from web_scrapper_spark.operators.textops import retrieval_metrics

    docs = _read(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("query_id"),
    )
    d, q = F.col("doc_id"), F.col("query_id")
    qrels = base.withColumn(
        "rel",
        F.when((d % 29 == q) & (d % 2 == 0), F.lit(2))
        .when((d % 29 == q) & (d % 4 == 1), F.lit(1))
        .when(d % 31 == q, F.lit(1)),
    ).filter(F.col("rel").isNotNull())
    from pyspark.sql import Window

    rwin = Window.partitionBy("query_id").orderBy(F.asc("doc_id"))
    run = (
        base.filter(d % 29 == q)
        .withColumn("rank", F.row_number().over(rwin))
        .filter(F.col("rank") <= 8)
    )
    return retrieval_metrics(run, qrels, k=8)


def _q_metric_anomalies(spark, sf_dir):
    """Robust crawl-ops anomaly flags (frontier/adaptive.py
    metric_anomalies): integer median/MAD outlier test over planted
    per-group metric series (steady 100..118 band + a 5000 spike
    every 97th slot). Type-1 lower medians under the deterministic
    (value, slot) order and the cross-multiplied |v−med|·1e6 >
    k·MAD test make the whole thing float-free; the oracle replays
    both median windows and the flag bit-exactly."""
    from web_scrapper_spark.frontier.adaptive import metric_anomalies

    docs = _read(spark, sf_dir, "documents")
    d = F.col("doc_id")
    series = docs.select(
        F.concat(F.lit("g"), (d % 5).cast("string")).alias("grp"),
        d.alias("slot"),
        (
            F.lit(100)
            + (d % 7) * 3
            + F.when(d % 97 == 0, F.lit(5000)).otherwise(F.lit(0))
        ).cast("long").alias("value"),
    )
    return metric_anomalies(series, "value", "slot", ("grp",))


def _q_bm25f_search(spark, sf_dir):
    """Fielded BM25F retrieval (operators/textops.py bm25f_search):
    body + anchor-text ranking with w_anchor=3 — the Brin & Page
    anchor signal as a RANKER. Anchors are a deterministic citation
    map ((doc_id·7+3) mod N targets, 60-char source snippets as link
    text), queries the top-4 corpus keywords dealt into two 2-term
    queries. The oracle replays both field tokenizations, the
    weighted tf'/dl' combine, either-field df, the exact integer
    formula, and the top-5 rank end-to-end."""
    from pyspark.sql import Window

    from web_scrapper_spark.operators.textops import (
        bm25f_search,
        corpus_keywords_topk,
    )

    docs = _read(spark, sf_dir, "documents")
    n = docs.count()
    anchors = docs.select(
        ((F.col("doc_id") * 7 + 3) % n).alias("doc_id"),
        F.substring("text", 1, 60).alias("text"),
    )
    win = Window.orderBy(F.desc("freq"), F.asc("word"))
    ranked = corpus_keywords_topk(docs, k=4).withColumn(
        "r", F.row_number().over(win)
    )
    qdf = ranked.groupBy(
        ((F.col("r") - 1) % 2 + 1).cast("long").alias("query_id")
    ).agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("r", "word"))),
                lambda x: x["word"],
            ),
        ).alias("text")
    )
    return bm25f_search(docs, anchors, qdf, k=5, w_body=1, w_anchor=3)


def _q_postings_gaps(spark, sf_dir):
    """Gap-encoded posting blocks (operators/textops.py
    delta_encode_postings over the same index as `postings`): the
    compression layout real indexes store — within-block doc_ids
    become gaps (first entry absolute). Flattened with posexplode so
    the hash validates every gap at its position; the oracle rebuilds
    gaps relationally with lag() over the proven (term → doc_id)
    blocking window. The decode inverse is property-tested in
    tests/test_operators.py."""
    from web_scrapper_spark.operators.textops import (
        build_postings,
        delta_encode_postings,
    )

    docs = _read(spark, sf_dir, "documents")
    idx = build_postings(
        docs, docs.count(), min_df=2, max_df_ppm=800_000, block_size=64
    )
    enc = delta_encode_postings(idx)
    return enc.select(
        "term",
        "df",
        "block",
        "first_doc",
        F.posexplode(F.arrays_zip("doc_gaps", "tfs")).alias("pos", "e"),
    ).select(
        "term",
        "df",
        "block",
        "first_doc",
        F.col("pos").cast("long").alias("pos"),
        F.col("e.doc_gaps").alias("gap"),
        F.col("e.tfs").alias("tf"),
    )


def _q_kcore(spark, sf_dir):
    """k-core peeling (operators/graph.py kcore, k=3, 3 lockstep
    rounds): a 9-node dense ring-of-generators core ('c*', three
    invertible affine maps mod 9 → degree ≥ 3 everywhere), a chain
    periphery ('p*', degree ≤ 2 — dies in round 1) and bridge edges
    (every 25th doc links its chain node into the core — those chain
    nodes reach degree 3, survive round 1, and die in round 2 when
    their chain neighbors vanish: the multi-round case). The oracle
    unrolls the identical three peel rounds + the trailing degree
    select."""
    from web_scrapper_spark.operators.graph import kcore

    docs = _read(spark, sf_dir, "documents")
    d = F.col("doc_id")
    c = lambda e: F.concat(F.lit("c"), (e % 9).cast("string"))  # noqa: E731
    p = lambda e: F.concat(F.lit("p"), e.cast("string"))  # noqa: E731
    dense = (
        docs.select(c(d).alias("src"), c(d * 4 + 1).alias("dst"))
        .unionByName(docs.select(c(d).alias("src"), c(d * 2 + 3).alias("dst")))
        .unionByName(docs.select(c(d).alias("src"), c(d * 5 + 2).alias("dst")))
    )
    chain = docs.select(p(d).alias("src"), p(d + 1).alias("dst"))
    bridges = docs.filter(d % 25 == 0).select(
        c(d).alias("src"), p(d).alias("dst")
    )
    edges = dense.unionByName(chain).unionByName(bridges)
    return kcore(edges, k=3, num_rounds=3)


def _q_heavy_hitters(spark, sf_dir):
    """Exact φ-heavy hitters by sketch-then-verify
    (operators/sketch.py heavy_hitters): φ=4% over a Zipf-ish key
    stream derived from events (key = u % ((u%7)+1) — residue 0 takes
    ~37% of mass, residue 6 ~2%, so both sides of the gate are
    non-vacuous). CMS never under-counts, so the candidate gate is
    provably complete and n/threshold/share are sketch-independent;
    the est column IS sketch-dependent, so the oracle replays the
    depth-4 × width-64 cell grid md5-exactly (the cms_hot_hosts
    idiom) alongside the plain GROUP BY/HAVING truth."""
    from web_scrapper_spark.operators.sketch import heavy_hitters

    ev = _read(spark, sf_dir, "events")
    keyed = ev.select(
        F.concat(
            F.lit("u"),
            (F.col("user_id") % ((F.col("user_id") % 7) + 1)).cast("string"),
        ).alias("host")
    )
    return heavy_hitters(keyed, "host", 40_000, width=64)


def _q_script_profile(spark, sf_dir):
    """Unicode-script character profile (operators/textops.py
    script_profile): documents salted with Cyrillic / CJK+Hangul /
    Latin-with-Cyrillic-homoglyph suffixes by doc_id%4 so dominant-
    script, none, and the homoglyph mix_ppm branches are all
    non-vacuous; \\x{...} ranges are the one syntax Java regex and
    RE2 share, so the oracle replays the exact patterns."""
    from web_scrapper_spark.operators.textops import script_profile

    docs = _read(spark, sf_dir, "documents")
    d = F.col("doc_id")
    salted = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(d % 4 == 1, F.lit(" привет мир как дела"))
            .when(d % 4 == 2, F.lit(" 漢字かなカナ 한글 테스트"))
            .when(d % 4 == 3, F.lit(" paypаl sеcurity chеck"))
            .otherwise(F.lit("")),
        ).alias("text"),
    )
    return script_profile(salted)


def _q_cc_index_surt(spark, sf_dir):
    """SURT keys (sources/warc.py surt_key_col — the sort key of the
    cc-index columnar layout): six URL shapes per documents row
    (www-strip, non-default port kept, default ports stripped,
    fragment cut, userinfo dropped, query-only path, whitespace +
    mixed-case path) mapped through the native expression; the oracle
    replays every rule relationally. The python twin
    (urlutils.surt) is asserted identical in tests/test_warc.py."""
    from web_scrapper_spark.sources.warc import surt_key_col

    docs = _read(spark, sf_dir, "documents")
    d = F.col("doc_id")
    h = (d % 23).cast("string")
    ds = d.cast("string")
    url = (
        F.when(d % 6 == 0, F.concat(
            F.lit("https://www.h"), h, F.lit(".example.com/p/"), ds))
        .when(d % 6 == 1, F.concat(
            F.lit("http://h"), h, F.lit(".example.co.uk:8080/a/b?page="),
            (d % 7).cast("string")))
        .when(d % 6 == 2, F.concat(
            F.lit("https://h"), h, F.lit(".example.com:443/x#frag")))
        .when(d % 6 == 3, F.concat(
            F.lit("http://user@h"), h, F.lit(".example.org")))
        .when(d % 6 == 4, F.concat(
            F.lit("https://sub.h"), h, F.lit(".example.com?q="), ds))
        .otherwise(F.concat(
            F.lit(" http://www3.h"), h, F.lit(".example.com:80/UPPER/"),
            ds, F.lit(" ")))
    )
    return docs.select(
        "doc_id", url.alias("url"), surt_key_col(url).alias("surt_key")
    )


def _q_kcenter(spark, sf_dir):
    """Greedy k-center diversity selection (operators/similarity.py
    kcenter_select): min-id seed, 3 farthest-point rounds (max
    min-distance, ties to min id), exact integer squared-L2 after the
    micro-int gate. The oracle unrolls all four rounds as correlated
    CTE blocks (the pagerank-oracle discipline) and replays the final
    nearest-center assignment with the same (dist, rank) tie-break —
    bit-exact, every row."""
    from web_scrapper_spark.operators.similarity import kcenter_select

    return kcenter_select(_read(spark, sf_dir, "embeddings"), 4)


def _q_passage_chunks(spark, sf_dir):
    """Sliding-window passage extraction (operators/packing.py
    passage_chunks): 24-token windows, 8-token overlap, over the
    documents table — the embedding/RAG indexing unit. Pure HOF
    projection + posexplode; the oracle replays the split, the chunk
    count rule, and every window's slice + join-back."""
    from web_scrapper_spark.operators.packing import passage_chunks

    docs = _read(spark, sf_dir, "documents")
    return passage_chunks(docs, chunk_tokens=24, overlap=8)


def _q_crawl_diff(spark, sf_dir):
    """Cross-crawl snapshot diff (frontier/recrawl.py crawl_diff):
    two synthetic waves carved from documents — wave A drops
    doc_id%10==7, wave B drops doc_id%9==4 and rewrites every
    doc_id%5==0 body — then one full-outer join classifies each URL
    added/removed/changed/unchanged by md5 digest. The oracle replays
    the carve and the FULL JOIN."""
    from web_scrapper_spark.frontier.recrawl import crawl_diff

    docs = _read(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://h"),
        (F.col("doc_id") % 23).cast("string"),
        F.lit(".org/d/"),
        F.col("doc_id").cast("string"),
    )
    base = docs.select(url.alias("url"), "doc_id", "text")
    old = base.filter(F.col("doc_id") % 10 != 7).select(
        "url", F.md5("text").alias("digest")
    )
    new = base.filter(F.col("doc_id") % 9 != 4).select(
        "url",
        F.md5(
            F.when(
                F.col("doc_id") % 5 == 0, F.concat(F.col("text"), F.lit("#v2"))
            ).otherwise(F.col("text"))
        ).alias("digest"),
    )
    return crawl_diff(old, new)


def _q_warc_latest_capture(spark, sf_dir):
    """Multi-capture archive dedup (sources/warc.py latest_captures):
    each document contributes 1–3 synthetic captures of its URL at
    distinct integer timestamps; the operator keeps the newest per URL
    (one hash shuffle on url). Required before WARC records feed the
    crawl engine, whose fetch join treats pages as url-unique. The
    oracle replays the capture synthesis and the window dedup."""
    from web_scrapper_spark.sources.warc import latest_captures

    docs = _read(spark, sf_dir, "documents").select("doc_id")
    caps = docs.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.col("doc_id") % 3)).alias("k"),
    ).select(
        F.concat(
            F.lit("https://h"),
            (F.col("doc_id") % 7).cast("string"),
            F.lit(".org/p/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        (
            F.lit(1_700_000_000)
            + (F.col("doc_id") % 5) * 86_400
            + F.col("k") * 3_600
        ).cast("long").alias("ts_unix"),
        F.concat(
            F.lit("rec-"),
            F.col("doc_id").cast("string"),
            F.lit("-"),
            F.col("k").cast("string"),
        ).alias("record_id"),
    )
    return latest_captures(caps, ts_col="ts_unix")


def _q_training_shuffle(spark, sf_dir):
    """Deterministic global training-order shuffle (operators/layout.py
    training_shuffle): seeded 60-bit md5 hash → shard (mod 8) + rank
    within shard. One hash-partitioned exchange + per-shard sort — the
    export writer's physical plan. The oracle replays the hash and the
    per-shard row_number."""
    from web_scrapper_spark.operators.layout import training_shuffle

    docs = _read(spark, sf_dir, "documents")
    return training_shuffle(docs, seed="r2", n_shards=8)


def _q_mix_sources(spark, sf_dir):
    """Deterministic source mixing (operators/layout.py mix_sources):
    per-source training rates in ppm — src0 at 2.3 epochs, src1
    downsampled to 0.4, src2 dropped, everything else 1.0 — with the
    fractional epoch carried by an independent per-doc uniform
    (seeded md5), so expected copies equal the rate exactly. Pure
    projection: no shuffle, no RNG state. The oracle replays the CASE
    rate map and the hash threshold."""
    from web_scrapper_spark.operators.layout import mix_sources

    docs = _read(spark, sf_dir, "documents")
    return mix_sources(
        docs,
        {"src0": 2_300_000, "src1": 400_000, "src2": 0},
        seed="mix-r2",
    )


def _q_postings(spark, sf_dir):
    """Blocked inverted index (operators/textops.py build_postings):
    min_df=2, max_df=80% stop-word elimination (the synthetic corpus
    vocabulary is templated — most terms sit at 50-80% df, so the 80%
    gate keeps ~30 terms and still exercises the cutoff), 64-entry
    blocks (~5 blocks/term). The query flattens the aligned posting
    arrays with posexplode so the hash validates WITHIN-BLOCK ORDER,
    not just membership; the oracle re-derives (term, df, block, pos,
    doc_id, tf) relationally with the proven _TOKS_SQL tokenizer."""
    from web_scrapper_spark.operators.textops import build_postings

    docs = _read(spark, sf_dir, "documents")
    idx = build_postings(
        docs, docs.count(), min_df=2, max_df_ppm=800_000, block_size=64
    )
    return idx.select(
        "term",
        "df",
        "block",
        F.posexplode(F.arrays_zip("doc_ids", "tfs")).alias("pos", "entry"),
    ).select(
        "term",
        "df",
        "block",
        F.col("pos").cast("long").alias("pos"),
        F.col("entry.doc_ids").alias("doc_id"),
        F.col("entry.tfs").alias("tf"),
    )


def _q_positional_postings(spark, sf_dir):
    """Positional inverted index (operators/textops.py
    build_positional_postings): the `postings` query plus per-
    occurrence token offsets (the Lucene PositionsEnum layout phrase
    queries intersect). Same df gates/blocking as `postings`; the
    flatten explodes BOTH grains — posting entries within blocks AND
    offsets within entries — so the hash validates within-block order
    and within-list offset order. The oracle re-derives every offset
    relationally (generate_subscripts over the proven tokenizer)."""
    from web_scrapper_spark.operators.textops import (
        build_positional_postings,
    )

    docs = _read(spark, sf_dir, "documents")
    idx = build_positional_postings(
        docs, docs.count(), min_df=2, max_df_ppm=800_000, block_size=64
    )
    flat = idx.select(
        "term",
        "df",
        "block",
        F.posexplode(
            F.arrays_zip("doc_ids", "tfs", "position_lists")
        ).alias("pos", "entry"),
    ).select(
        "term",
        "df",
        "block",
        F.col("pos").cast("long").alias("pos"),
        F.col("entry.doc_ids").alias("doc_id"),
        F.col("entry.tfs").alias("tf"),
        F.col("entry.position_lists").alias("_pl"),
    )
    return flat.select(
        "term",
        "df",
        "block",
        "pos",
        "doc_id",
        "tf",
        F.posexplode("_pl").alias("pidx", "position"),
    ).select(
        "term",
        "df",
        "block",
        "pos",
        "doc_id",
        "tf",
        F.col("pidx").cast("long").alias("pidx"),
        F.col("position").cast("long").alias("position"),
    )


def _q_phrase_search(spark, sf_dir):
    """Exact phrase query (operators/textops.py phrase_search):
    slop=0 PhraseQuery for "value table" over the documents corpus,
    top-20 by (occurrences desc, doc_id asc). The oracle replays the
    slot-alignment rule relationally — every offset of term_i votes
    for base p-i, a base all slots voted is a match — so the hash
    pins tokenization, alignment, dedup of bases AND the ranking."""
    from web_scrapper_spark.operators.textops import phrase_search

    docs = _read(spark, sf_dir, "documents")
    return phrase_search(docs, "value table", k=20)


def _q_snippets(spark, sf_dir):
    """Search-result snippets (operators/textops.py snippet_extract):
    for each doc matching >=1 of {query, spark, window}, the 12-token
    span covering the most distinct query terms (ties -> earliest),
    rendered as space-joined tokens. Engine scores spans with a
    per-doc range-frame window; the oracle re-derives them with a
    bounded positional SELF-JOIN — different formulation, same rule —
    then slices the token list for the rendering."""
    from web_scrapper_spark.operators.textops import snippet_extract

    docs = _read(spark, sf_dir, "documents")
    return snippet_extract(docs, "query spark window", window=12)


def _q_proximity_search(spark, sf_dir):
    """Unordered proximity query (operators/textops.py
    proximity_search): docs where {query, spark, window} all co-occur
    inside a 12-token span, ranked by span count — Lucene's unordered
    SpanNearQuery between a bag-of-words AND and slop=0 phrase. The
    engine scores spans with the snippet range-frame window; the
    oracle replays them with a bounded positional self-join and a
    full-coverage HAVING — different formulation, same rule."""
    from web_scrapper_spark.operators.textops import proximity_search

    docs = _read(spark, sf_dir, "documents")
    return proximity_search(docs, "query spark window", window=12, k=25)


def _q_phrase_from_index(spark, sf_dir):
    """Phrase query served from a PERSISTED positional index
    (operators/textops.py phrase_search(index=)): build the positional
    index ungated, then answer "value table" reading ONLY the two query
    terms' posting blocks — never the text. The oracle is the SAME
    relational phrase replay as `phrase_search`, so a hash match proves
    from-index ≡ from-text exactly (the mlt_from_index discipline
    applied to phrase retrieval)."""
    from web_scrapper_spark.operators.textops import (
        build_positional_postings,
        phrase_search,
    )

    docs = _read(spark, sf_dir, "documents")
    idx = build_positional_postings(docs, docs.count(), block_size=64)
    return phrase_search(phrase="value table", index=idx, k=20)


def _q_boolean_search(spark, sf_dir):
    """Boolean retrieval (operators/textops.py boolean_search): the
    Lucene BooleanQuery clause semantics — must=[table] AND
    must_not=[vector] gate eligibility, n_should over {query, spark,
    window} ranks. The oracle replays the conditional distinct counts
    and the HAVING gates relationally."""
    from web_scrapper_spark.operators.textops import boolean_search

    docs = _read(spark, sf_dir, "documents")
    return boolean_search(
        docs, must=("table",), should=("query", "spark", "window"),
        must_not=("vector",), k=30,
    )


def _q_term_cooccurrence(spark, sf_dir):
    """Distributional related terms (operators/textops.py
    term_cooccurrence): for seed "spark", neighbors within ±5 tokens
    ranked by the integer PMI lift pairs·T·10⁶ // (cnt_a·cnt_b)
    (Church & Hanks association ratio, DECIMAL-exact). The oracle
    replays the banded positional join, totals and HUGEINT floor
    division."""
    from web_scrapper_spark.operators.textops import term_cooccurrence

    docs = _read(spark, sf_dir, "documents")
    return term_cooccurrence(docs, ["spark"], window=5, k=15, min_pairs=2)


def _q_spell_correct(spark, sf_dir):
    """SymSpell spell correction (operators/textops.py spell_correct):
    symmetric-deletion candidate join to depth 2, verified with true
    Levenshtein, ranked (distance asc, corpus-count desc, term asc).
    The oracle is the BRUTE-FORCE rule the algorithm must equal —
    query x full-vocab Levenshtein <= 2 — so a hash match proves the
    deletion-dictionary candidate generation is COMPLETE, not just
    precise (the strongest contract a candidate-pruning algorithm can
    state)."""
    from web_scrapper_spark.operators.textops import spell_correct

    docs = _read(spark, sf_dir, "documents")
    return spell_correct(
        docs, ["tabel", "sprk", "window", "qury", "scann"],
        max_edit=2, k=5, min_count=2,
    )


def _q_concordance(spark, sf_dir):
    """KWIC concordance (operators/textops.py concordance): every
    occurrence of 'spark' with ±4 context tokens, clipped at doc
    edges. The oracle re-slices the token lists relationally, so the
    hash pins position derivation AND both context renderings."""
    from web_scrapper_spark.operators.textops import concordance

    docs = _read(spark, sf_dir, "documents")
    return concordance(docs, "spark", context=4)


def _q_prefix_suggest(spark, sf_dir):
    """Autocomplete (operators/textops.py prefix_suggest): top-5
    completions per prefix by corpus frequency (cnt desc, term asc),
    prefixes {s, c, b, w, zz} — zz proves empty prefixes vanish rather
    than erroring."""
    from web_scrapper_spark.operators.textops import prefix_suggest

    docs = _read(spark, sf_dir, "documents")
    return prefix_suggest(docs, ["s", "c", "b", "w", "zz"], k=5)


def _q_position_gaps(spark, sf_dir):
    """Position-list gap encoding (operators/textops.py
    delta_encode_positions): the postings_gaps layout at offset grain
    — within a (term, doc) entry each position stores the gap from its
    predecessor, first absolute. The oracle replays every gap with a
    lag() window over the proven positional chain; the decode inverse
    is pinned by the roundtrip unit test."""
    from web_scrapper_spark.operators.textops import (
        build_positional_postings,
        delta_encode_positions,
    )

    docs = _read(spark, sf_dir, "documents")
    idx = build_positional_postings(
        docs, docs.count(), min_df=2, max_df_ppm=800_000, block_size=64
    )
    enc = delta_encode_positions(idx)
    flat = enc.select(
        "term",
        "df",
        "block",
        F.posexplode(
            F.arrays_zip("doc_ids", "tfs", "position_gaps")
        ).alias("pos", "entry"),
    ).select(
        "term",
        "df",
        "block",
        F.col("pos").cast("long").alias("pos"),
        F.col("entry.doc_ids").alias("doc_id"),
        F.col("entry.tfs").alias("tf"),
        F.col("entry.position_gaps").alias("_pg"),
    )
    return flat.select(
        "term",
        "df",
        "block",
        "pos",
        "doc_id",
        "tf",
        F.posexplode("_pg").alias("pidx", "gap"),
    ).select(
        "term",
        "df",
        "block",
        "pos",
        "doc_id",
        "tf",
        F.col("pidx").cast("long").alias("pidx"),
        F.col("gap").cast("long").alias("gap"),
    )


def _q_token_budget(spark, sf_dir):
    """Token-budget corpus selection (operators/sampling.py
    token_budget_select): quality is the alpha-ratio ppm, tokens the
    BPE-ish regex count, the budget 60% of the corpus's total tokens.
    The operator finds the boundary on the quality histogram and fills
    it in id order; the oracle is the rule it must equal — ONE global
    cumulative-sum window over (quality desc, id asc). Matching hashes
    prove the histogram path IS the prefix rule."""
    from web_scrapper_spark.operators.sampling import token_budget_select
    from web_scrapper_spark.operators.textops import BPE_TOKEN_REGEX

    docs = _read(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        F.floor(
            F.length(F.regexp_replace("text", "[^A-Za-z]", "")) * 1_000_000
            / F.greatest(F.length("text"), F.lit(1))
        )
        .cast("long")
        .alias("quality_ppm"),
        F.size(
            F.regexp_extract_all(F.col("text"), F.lit(BPE_TOKEN_REGEX), 0)
        )
        .cast("long")
        .alias("n_tokens"),
    )
    budget = base.agg(F.sum("n_tokens")).collect()[0][0] * 6 // 10
    return token_budget_select(base, budget)


def _q_fair_share(spark, sf_dir):
    """Max-min fair global-budget water-filling
    (frontier/fairshare.py): per-host demands are event counts (host =
    user_id mod 37), the global budget is 60% of total demand — so the
    water level always lands strictly inside the demand range and the
    remainder pass is exercised. The oracle replays the histogram
    search (piecewise-linear used(T) over distinct demand values), the
    in-segment floor division, and the (demand desc, host asc)
    remainder ranking; every step is integer, so allocations match
    bit-exactly. The budget scalar is a driver-side count — the same
    defensible pattern as the pagerank query's node count."""
    from web_scrapper_spark.frontier.fairshare import fair_share_budgets

    ev = _read(spark, sf_dir, "events")
    demands = ev.groupBy(
        F.concat(F.lit("h"), (F.col("user_id") % 37).cast("string")).alias(
            "host"
        )
    ).agg(F.count("*").alias("demand"))
    budget = ev.count() * 6 // 10
    return fair_share_budgets(demands, budget)


def _q_redirect_resolve(spark, sf_dir):
    """Redirect/canonical chain resolution (operators/graph.py
    resolve_redirects — pointer doubling, 5 self-joins for a 32-hop
    budget). Documents become a deterministic redirect table: within
    each 64-id block, ids step DOWN (i → i-1) toward the block's
    16-multiples; 16-multiples are terminal except the block head
    (i % 64 == 0), which points UP 3 ids, closing a 4-cycle that the
    0..15 sub-block drains into. The oracle re-follows every chain
    with a hop-bounded recursive CTE — terminals, exact hop counts,
    and cycle/unresolved rows must all hash-match. Unresolved rows
    carry hops = -1 so no NULL-int crosses the pandas dtype boundary."""
    from web_scrapper_spark.operators.graph import resolve_redirects

    docs = _read(spark, sf_dir, "documents")
    u = lambda c: F.concat(F.lit("https://r.example.org/p/"), c.cast("string"))  # noqa: E731
    edges = docs.filter(
        (F.col("doc_id") % 16 != 0) | (F.col("doc_id") % 64 == 0)
    ).select(
        u(F.col("doc_id")).alias("url"),
        u(
            F.when(F.col("doc_id") % 64 == 0, F.col("doc_id") + 3).otherwise(
                F.col("doc_id") - 1
            )
        ).alias("target"),
    )
    res = resolve_redirects(edges, max_hops=32)
    return res.select(
        "url",
        "final_url",
        F.coalesce(F.col("hops"), F.lit(-1)).cast("int").alias("hops"),
        "resolved",
    )


def _q_drain_plan(spark, sf_dir):
    """Crawl capacity planning (frontier/core.py drain_plan): a
    synthetic frontier over 30 hosts, robots crawl-delays cycling
    {0.5, 2, 10, unlimited, 30} s for the first 20 hosts (the rest
    fall to the 2 s default). epochs_to_drain = exact integer ceiling
    of pending/budget with budget = max(1, floor(60/delay)). The
    oracle replays the same arithmetic relationally."""
    from web_scrapper_spark.frontier.core import drain_plan

    docs = _read(spark, sf_dir, "documents")
    host = F.concat(F.lit("h"), (F.col("doc_id") % 30).cast("string"))
    frontier = docs.select(host.alias("host"))
    idx = F.col("doc_id") % 30
    delay = (
        F.when(idx % 5 == 0, 0.5)
        .when(idx % 5 == 1, 2.0)
        .when(idx % 5 == 2, 10.0)
        .when(idx % 5 == 3, 0.0)
        .otherwise(30.0)
    )
    robots = (
        docs.filter(idx < 20)
        .select(host.alias("host"), delay.alias("crawl_delay"))
        .distinct()
    )
    return drain_plan(frontier, robots, epoch_seconds=60.0, default_delay=2.0)


def _q_host_priors(spark, sf_dir):
    """Host quality priors (operators/quality.py host_priors):
    documents spread over 13 hosts, keep = n_chars >= 400, modal lang
    per host with lexicographic tie-break, exact integer keep_ppm.
    The oracle recomputes the rollup with window + floor division."""
    from web_scrapper_spark.operators.quality import host_priors

    docs = _read(spark, sf_dir, "documents").select(
        F.concat(F.lit("q"), (F.col("doc_id") % 13).cast("string")).alias("host"),
        (F.col("n_chars") >= 400).alias("keep"),
        "lang",
    )
    return host_priors(docs)


def _q_unicode_clean(spark, sf_dir):
    """Unicode hygiene (operators/textops.py unicode_clean): documents
    get a planted suffix carrying mojibake pairs, a combining-acute
    'cafe'+U+0301 (NFC must precompose), a C0 control, and a CRLF.
    The DuckDB oracle replays the identical replace chain +
    nfc_normalize + newline/control rules; full cleaned text crosses
    the hash gate."""
    docs = _read(spark, sf_dir, "documents")
    suffix = _UC_SUFFIX
    return _tx.unicode_clean(
        docs.select("doc_id", F.concat(F.col("text"), F.lit(suffix)).alias("text"))
    )


#: planted unicode_clean suffix: mojibake pairs, a combining
#: acute (NFC precomposes), a C0 control, CRLF. Shared verbatim
#: by the Spark query and the DuckDB oracle.
_UC_SUFFIX = (
    " \u00c3\u00a9cole \u00e2\u20ac\u0153q \u00e2\u20ac\u2122s"
    " \u00e2\u20ac\u201dd cafe\u0301 x\x01\r\nend"
)


def _sql_str(s: str) -> str:
    """A DuckDB string expression for ``s`` with every non-ASCII or
    control character built via chr() — immune to source-encoding
    drift between the Python literal and the SQL literal."""
    parts: list[str] = []
    run: list[str] = []

    def flush():
        if run:
            parts.append("'" + "".join(run).replace("'", "''") + "'")
            run.clear()

    for ch in s:
        if 32 <= ord(ch) < 127:
            run.append(ch)
        else:
            flush()
            parts.append(f"chr({ord(ch)})")
    flush()
    return " || ".join(parts) if parts else "''"


def _unicode_clean_oracle_sql() -> str:
    """DuckDB twin of operators/textops.unicode_clean over the same
    planted suffix: identical replace chain (MOJIBAKE_FIXES order),
    nfc_normalize, CRLF/CR → LF, C0-control strip."""
    suffix = _UC_SUFFIX
    expr = f"text || {_sql_str(suffix)}"
    raw = expr
    for bad, good in _tx.MOJIBAKE_FIXES:
        expr = f"replace({expr}, {_sql_str(bad)}, {_sql_str(good)})"
    expr = f"nfc_normalize({expr})"
    expr = f"replace({expr}, chr(13) || chr(10), chr(10))"
    expr = f"replace({expr}, chr(13), chr(10))"
    expr = (
        f"regexp_replace({expr}, "
        "'[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]', '', 'g')"
    )
    return f"""
        SELECT doc_id,
               {expr} AS text,
               ({expr}) <> ({raw}) AS changed
        FROM documents
    """


def _q_media_sniff(spark, sf_dir):
    """Container-header triage (operators/multimodal.py
    sniff_media_headers — REAL byte parsing, no codec stubs):
    documents become binary payloads cycling every major web media
    container — png/gif/jpeg/wav plus (round 5) webp (VP8X canvas
    dims), mp3 (ID3v2 skip + MPEG-1 Layer III frame header), ogg
    (Vorbis identification packet), mp4/avif (ftyp brands) and
    garbage — with header fields derived from doc_id; the sniffer
    must invert the construction exactly (construct→parse roundtrip
    oracle). NULL ints coalesce to -1 for the pandas dtype
    boundary."""
    from web_scrapper_spark.operators.multimodal import (
        build_container_payload,
        sniff_media_headers,
    )

    docs = _read(spark, sf_dir, "documents").select("doc_id")
    kinds = ["png", "gif", "jpeg", "wav", "webp", "mp3", "ogg", "mp4",
             "avif", "garbage"]

    def build(batches):
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "payload": [
                        build_container_payload(
                            kinds[int(i) % 10], int(i)
                        )
                        for i in pdf["doc_id"]
                    ],
                }
            )

    media = docs.mapInPandas(build, schema="media_id long, payload binary")
    res = sniff_media_headers(media)
    return res.select(
        "media_id",
        "format",
        F.coalesce(F.col("width"), F.lit(-1)).cast("int").alias("width"),
        F.coalesce(F.col("height"), F.lit(-1)).cast("int").alias("height"),
        F.coalesce(F.col("sample_rate"), F.lit(-1)).cast("int").alias("sample_rate"),
        F.coalesce(F.col("channels"), F.lit(-1)).cast("int").alias("channels"),
        "valid",
    )


def _q_cdx_revisits(spark, sf_dir):
    """WARC/CDX revisit classification (sources/warc.py cdx_revisits):
    documents become a capture log — 40 URLs, captures ordered by a
    14-digit ts, payload digest changing every 2nd capture — so every
    URL alternates first/changed captures with digest-repeat revisits.
    The oracle re-derives the two min-aggregates relationally."""
    from web_scrapper_spark.sources.warc import cdx_revisits

    docs = _read(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://w.example.org/p/"), (F.col("doc_id") % 40).cast("string")
    )
    cdx = docs.select(
        url.alias("url"),
        F.lpad(F.col("doc_id").cast("string"), 14, "0").alias("ts"),
        F.md5(
            F.concat(url, F.lit("#"), F.expr("(doc_id div 40) div 2").cast("string"))
        ).alias("digest"),
    )
    return cdx_revisits(cdx)


def _q_page_meta(spark, sf_dir):
    """Head-metadata extraction (operators/structured.py page_meta):
    pages built from doc_id with a messy multi-line title always, a
    description for id%2=0, an og:title in REVERSED attribute order
    for id%3=0, an og:image for id%4=0 — the extractor must normalize
    whitespace, match both attribute orders, and NULL absent fields
    (construct→parse roundtrip oracle)."""
    from web_scrapper_spark.operators.structured import page_meta

    docs = _read(spark, sf_dir, "documents")
    d = F.col("doc_id")
    html = F.concat(
        F.lit("<html><head><title> Doc\n  "), d.cast("string"), F.lit(" </title>"),
        F.when(d % 2 == 0, F.concat(
            F.lit("<meta name='description' content='About doc "),
            d.cast("string"), F.lit(".'>"))).otherwise(F.lit("")),
        F.when(d % 3 == 0, F.concat(
            F.lit("<meta content='OG "), d.cast("string"),
            F.lit("' property='og:title'>"))).otherwise(F.lit("")),
        F.when(d % 4 == 0, F.concat(
            F.lit("<meta property='og:image' content='https://img/"),
            d.cast("string"), F.lit(".png'>"))).otherwise(F.lit("")),
        F.lit("</head><body>x</body></html>"),
    )
    pages = docs.select(
        F.concat(F.lit("https://m.example.org/p/"), d.cast("string")).alias("url"),
        html.alias("html"),
    )
    return page_meta(pages)


def _q_charset_detect(spark, sf_dir):
    """Charset triage (operators/structured.py detect_charset):
    documents become binary payloads cycling the three BOMs, a meta
    declaration, an XML prolog, and a declaration-free page; the
    sniffer must invert the construction (construct→parse roundtrip
    oracle from doc_id arithmetic)."""
    from web_scrapper_spark.operators.structured import detect_charset

    docs = _read(spark, sf_dir, "documents")
    d = F.col("doc_id")
    k = (d % 6).cast("int")
    body = F.concat(F.lit("<html><body>page "), d.cast("string"), F.lit("</body></html>"))
    payload = (
        F.when(k == 0, F.concat(F.lit(b"\xef\xbb\xbf"), body.cast("binary")))
        .when(k == 1, F.concat(F.lit(b"\xff\xfe"), body.cast("binary")))
        .when(k == 2, F.concat(F.lit(b"\xfe\xff"), body.cast("binary")))
        .when(k == 3, F.concat(
            F.lit("<html><meta charset='ISO-8859-1'>"), body
        ).cast("binary"))
        .when(k == 4, F.concat(
            F.lit('<?xml version="1.0" encoding="Windows-1252"?>'), body
        ).cast("binary"))
        .otherwise(body.cast("binary"))
    )
    pages = docs.select(
        F.concat(F.lit("https://cs.example.org/p/"), d.cast("string")).alias("url"),
        payload.alias("html"),
    )
    return detect_charset(pages)


def _q_sitemap_coverage(spark, sf_dir):
    """Sitemap-vs-crawl audit (frontier/sitemap.py sitemap_coverage):
    documents mint URLs over 7 hosts; doc_id%3≠0 are sitemap-declared,
    doc_id%2=0 are crawled — so every host has covered, uncovered, and
    surplus URLs. The oracle recomputes the per-host rollup and the
    exact coverage_ppm floor division."""
    from web_scrapper_spark.frontier.sitemap import sitemap_coverage

    docs = _read(spark, sf_dir, "documents")
    d = F.col("doc_id")
    url = F.concat(
        F.lit("https://sc"), (d % 7).cast("string"),
        F.lit(".example.org/p/"), d.cast("string"),
    )
    entries = docs.filter(d % 3 != 0).select(url.alias("url"))
    seen = docs.filter(d % 2 == 0).select(url.alias("url"))
    return sitemap_coverage(entries, seen)


def _q_robots_allow(spark, sf_dir):
    """RFC 9309 longest-match Allow/Disallow (frontier/core.py
    robots_filter): documents mint URLs over 6 hosts with paths
    cycling private / private-but-allowed / open / tmp; hosts 0-3
    carry rules (even hosts also an Allow override), hosts 4-5 are
    ruleless. Output = the surviving URLs; the oracle replays the
    longest-match fold relationally."""
    from web_scrapper_spark.frontier.core import robots_filter

    docs = _read(spark, sf_dir, "documents")
    d = F.col("doc_id")
    host = F.concat(F.lit("r"), (d % 6).cast("string"), F.lit(".example.org"))
    path = (
        F.when(d % 4 == 0, F.concat(F.lit("/private/doc/"), d.cast("string")))
        .when(d % 4 == 1, F.concat(F.lit("/private/pub/"), d.cast("string")))
        .when(d % 4 == 2, F.concat(F.lit("/open/"), d.cast("string")))
        .otherwise(F.concat(F.lit("/tmp/"), d.cast("string")))
    )
    cand = docs.select(F.concat(F.lit("https://"), host, path).alias("url"))
    hosts = docs.filter(d % 6 < 4).select(
        (d % 6).alias("_h"), host.alias("host")
    ).distinct()
    robots = hosts.select(
        "host",
        F.array(F.lit("/private"), F.lit("/tmp")).alias("disallow_prefixes"),
        F.when(
            F.col("_h") % 2 == 0, F.array(F.lit("/private/pub"))
        ).otherwise(F.array().cast("array<string>")).alias("allow_prefixes"),
    )
    return robots_filter(cand, robots)


def _q_trap_detect(spark, sf_dir):
    """Crawl-trap detection (frontier/traps.py url_trap_signals):
    documents mint a URL table with three planted pathologies — looped
    calendar paths (doc_id%10 < 2), over-deep generated paths (%10 in
    2..3), and session-id query explosion on shared paths (even %10 ≥
    4); odd %10 ≥ 4 URLs are clean. The oracle re-derives depth /
    duplicate-segment / distinct-query signals relationally and must
    match reason-for-reason."""
    from web_scrapper_spark.frontier.traps import url_trap_signals

    docs = _read(spark, sf_dir, "documents")
    d, m = F.col("doc_id"), F.col("doc_id") % 10
    host = F.concat(F.lit("https://h"), (d % 5).cast("string"), F.lit(".example.org"))
    url = (
        F.when(m < 2, F.concat(
            host, F.lit("/cal/2024/01/2024/01/p"), (d % 4).cast("string")))
        .when(m < 4, F.concat(
            host, F.lit("/a/b/c/d/e/f/g/h/i/"), d.cast("string")))
        .when(m % 2 == 0, F.concat(
            host, F.lit("/p/"), m.cast("string"),
            F.lit("?sid="), d.cast("string")))
        .otherwise(F.concat(host, F.lit("/q/"), (d % 50).cast("string")))
    )
    return url_trap_signals(docs.select(url.alias("url")))


def _param_captures(docs):
    """Synthetic (url, digest) captures for the param-mining queries:
    7 shop hosts, three URL variants per doc — same id under utm=a/b
    (content identical) plus an id+1 probe (content differs); hosts
    shop5/shop6 append a unique per-URL session token, which destroys
    residual evidence exactly the way real session ids do. The digest
    is a function of (host, path, id) ONLY."""
    d = F.col("doc_id")
    host = F.concat(F.lit("shop"), (d % 7).cast("string"), F.lit(".org"))
    path = F.concat(F.lit("/item/"), (d % 211).cast("string"))
    idv = (d % 50).cast("long")
    variants = F.array(
        F.struct(idv.alias("id"), F.lit("a").alias("utm"), F.lit(1).alias("vn")),
        F.struct(idv.alias("id"), F.lit("b").alias("utm"), F.lit(2).alias("vn")),
        F.struct(
            (idv + 1).alias("id"), F.lit("a").alias("utm"), F.lit(3).alias("vn")
        ),
    )
    v = docs.select(
        d.alias("doc_id"),
        host.alias("host"),
        path.alias("path"),
        F.explode(variants).alias("s"),
    )
    sess = F.when(
        F.col("host").isin("shop5.org", "shop6.org"),
        F.concat(
            F.lit("&sess="),
            F.substring(
                F.md5(
                    F.concat(
                        F.col("doc_id").cast("string"),
                        F.lit("-"),
                        F.col("s.vn").cast("string"),
                    )
                ),
                1,
                8,
            ),
        ),
    ).otherwise(F.lit(""))
    url = F.concat(
        F.lit("https://"),
        F.col("host"),
        F.col("path"),
        F.lit("?id="),
        F.col("s.id").cast("string"),
        F.lit("&utm="),
        F.col("s.utm"),
        sess,
    )
    digest = F.md5(
        F.concat(
            F.col("host"), F.col("path"), F.lit(":"), F.col("s.id").cast("string")
        )
    )
    return v.select(url.alias("url"), digest.alias("digest"))


def _q_url_param_mining(spark, sf_dir):
    """URL query-parameter relevance mining (frontier/params.py
    param_relevance): per-(host, param) digest-evidence verdicts —
    utm must come out `drop` on evidence hosts, id `keep`, and the
    session-token hosts degrade both to `unknown` (unique sess values
    shatter every residual group). Oracle replays the residual-group
    evidence model relationally with DuckDB list lambdas."""
    from web_scrapper_spark.frontier.params import param_relevance

    docs = _read(spark, sf_dir, "documents")
    return param_relevance(_param_captures(docs))


def _q_url_param_rewrite(spark, sf_dir):
    """Learned canonicalization applied (frontier/params.py
    apply_param_rules): the mined `drop` rules rewrite each distinct
    capture URL — tracking params removed, survivors sorted, '?'
    dropped when nothing survives; tracking variants collapse to one
    canonical frontier row. Oracle replays mining + rewrite."""
    from web_scrapper_spark.frontier.params import (
        apply_param_rules,
        param_relevance,
    )

    docs = _read(spark, sf_dir, "documents")
    caps = _param_captures(docs)
    urls = caps.select("url").distinct()
    return apply_param_rules(urls, param_relevance(caps)).select(
        "url", "canonical_url"
    )


def _q_anchor_profile(spark, sf_dir):
    """Inbound anchor-text aggregation (operators/graph.py
    anchor_text_profile): each document contributes one link whose
    anchor is its text's first 80 chars, targets fan in over
    doc_id%37. Top-3 anchor terms per target by (freq desc, word asc),
    the engine's keyword tokenizer on both sides."""
    from web_scrapper_spark.operators.graph import anchor_text_profile

    docs = _read(spark, sf_dir, "documents")
    edges = docs.select(
        F.concat(
            F.lit("https://t.example.org/d/"), (F.col("doc_id") % 37).cast("string")
        ).alias("target"),
        F.substring(F.col("text"), 1, 80).alias("anchor"),
    )
    return anchor_text_profile(edges, k=3)


def _q_inlink_stats(spark, sf_dir):
    """Per-target inlink rollup (operators/graph.py inlink_stats):
    total inlinks, distinct source pages, distinct source hosts — the
    anti-spam grain (1000 links from one host are one vote). Sources
    spread over 11 hosts, targets fan in over doc_id%37."""
    from web_scrapper_spark.operators.graph import inlink_stats

    docs = _read(spark, sf_dir, "documents")
    edges = docs.select(
        F.concat(
            F.lit("https://s"), (F.col("doc_id") % 11).cast("string"),
            F.lit(".example.org/a/"), (F.col("doc_id") % 200).cast("string"),
        ).alias("src"),
        F.concat(
            F.lit("https://t.example.org/d/"), (F.col("doc_id") % 37).cast("string")
        ).alias("target"),
    )
    return inlink_stats(edges)


def _q_bm25(spark, sf_dir):
    """Corpus BM25 term weights (operators/textops.py
    bm25_term_weights): exact integer/decimal arithmetic after one
    ppm-rounded idf — k1=1.2, b=0.75 cleared to the integer form
    idf_ppm·44·tf·T div (20·tf·T + 6·T + 18·dl·N). Top-3 terms per
    document. The oracle recomputes tf/df/dl/N/T relationally and
    replays the same fixed-point formula in HUGEINT."""
    docs = _read(spark, sf_dir, "documents")
    return _tx.bm25_term_weights(docs, k=3)


def _q_bm25_search(spark, sf_dir):
    """Query-time BM25 retrieval (operators/textops.py bm25_search):
    the DAAT executor over the blocked inverted index built with
    norms-in-postings (include_dls=True — scoring never joins a
    corpus-sized lengths table). Queries are SELF-CONTAINED: the 6
    highest-df gated terms (df desc, term asc), dealt round-robin into
    3 two-term queries — both engines derive the identical query set
    from tokenization alone, so the oracle replays index build, query
    formation, the exact integer BM25 sum, and the per-query top-5
    rank end-to-end."""
    from pyspark.sql import Window

    from web_scrapper_spark.operators.textops import (
        bm25_search,
        build_postings,
        doc_lengths,
    )

    docs = _read(spark, sf_dir, "documents")
    dls = doc_lengths(docs)
    tot = dls.agg(F.count("*").alias("n"), F.sum("dl").alias("t")).collect()[0]
    n_docs, t_tokens = int(tot["n"]), int(tot["t"])
    # materialize the index ONCE: both the query-formation branch and
    # the search probe read it (without this the whole
    # tokenize→tf→window subtree runs twice in one job)
    idx = build_postings(
        docs, n_docs, min_df=2, max_df_ppm=800_000, block_size=64,
        include_dls=True,
    ).localCheckpoint(eager=True)
    win = Window.orderBy(F.desc("df"), F.asc("term"))
    ranked = (
        idx.select("term", "df").distinct()
        .orderBy(F.desc("df"), F.asc("term")).limit(6)
        .withColumn("r", F.row_number().over(win))
    )
    qdf = ranked.groupBy(
        ((F.col("r") - 1) % 3 + 1).cast("long").alias("query_id")
    ).agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("r", "term"))),
                lambda x: x["term"],
            ),
        ).alias("text")
    )
    return bm25_search(idx, qdf, n_docs, t_tokens, k=5)


def _q_cluster_reps(spark, sf_dir):
    """Quality-aware duplicate-cluster survivor selection
    (operators/dedup.py cluster_representatives): MinHash/LSH pair
    graph → connected components → keep the max-n_chars doc per
    cluster (ties to min doc_id); singletons keep themselves. The
    oracle re-walks the closure with a recursive CTE and re-picks
    representatives with a window."""
    docs = _read(spark, sf_dir, "documents")
    pairs = _minhash_pair_candidates(spark, sf_dir).select("id_a", "id_b")
    return _dd.cluster_representatives(docs, pairs, quality_col="n_chars")


#: fixed-point 1e-12 integer units (operators/graph.py).
_PRANK = {"iters": 5, "fanout": 3}


def _q_link_pagerank(spark, sf_dir):
    """Integer fixed-point PageRank (operators/graph.py) over a
    deterministic md5-derived citation graph on documents — the crawl
    frontier-prioritization ranking. Every arithmetic step is integer
    (floor divisions, integer sums), so the DuckDB oracle's unrolled
    iteration CTEs reproduce the ranks bit-exactly — no float ever
    crosses the comparison."""
    from web_scrapper_spark.operators.graph import pagerank

    docs = _read(spark, sf_dir, "documents")
    n = docs.count()
    dsts = [
        (
            F.conv(
                F.substring(F.md5(F.concat_ws("|", F.col("doc_id"), F.lit(j))), 1, 15),
                16,
                10,
            ).cast("long")
            % n
        )
        for j in range(_PRANK["fanout"])
    ]
    edges = docs.select(
        F.col("doc_id").alias("src"), F.explode(F.array(*dsts)).alias("dst")
    )
    return pagerank(edges, num_iters=_PRANK["iters"]).select(
        F.col("node").alias("doc_id"), F.col("rank").alias("rank_fp")
    )


def _pagerank_oracle_sql() -> str:
    from web_scrapper_spark.operators.graph import PAGERANK_SCALE as S

    iters, fanout = _PRANK["iters"], _PRANK["fanout"]
    js = ", ".join(str(j) for j in range(fanout))
    sql = f"""
        WITH params AS (SELECT count(*) AS n FROM documents),
        edges AS (
          SELECT doc_id AS src,
                 ('0x' || substr(md5(doc_id || '|' || j), 1, 15))::BIGINT
                   % (SELECT n FROM params) AS dst
          FROM documents, unnest([{js}]) AS t(j)
        ),
        deg AS (SELECT src, count(*) AS odeg FROM edges GROUP BY src),
        r0 AS (SELECT doc_id AS node,
                      CAST({S} // (SELECT n FROM params) AS BIGINT) AS rank_fp
               FROM documents)"""
    prev = "r0"
    for i in range(iters):
        sql += f""",
        c{i} AS (
          SELECT e.dst AS node, sum(r.rank_fp // d.odeg) AS s
          FROM edges e JOIN {prev} r ON e.src = r.node
                       JOIN deg d ON e.src = d.src
          GROUP BY e.dst
        ),
        r{i + 1} AS (
          SELECT n0.node,
                 CAST((15 * ({S} // (SELECT n FROM params))) // 100
                      + (coalesce(c.s, 0) * 85) // 100 AS BIGINT) AS rank_fp
          FROM r0 n0 LEFT JOIN c{i} c USING (node)
        )"""
        prev = f"r{i + 1}"
    return sql + f"\n        SELECT node AS doc_id, rank_fp FROM {prev}"


#: every doc_id divisible by this is a trusted seed (deterministic).
_TRUST_SEED_MOD = 17


def _trust_edges(spark, sf_dir):
    docs = _read(spark, sf_dir, "documents")
    n = docs.count()
    dsts = [
        (
            F.conv(
                F.substring(F.md5(F.concat_ws("|", F.col("doc_id"), F.lit(j))), 1, 15),
                16,
                10,
            ).cast("long")
            % n
        )
        for j in range(_PRANK["fanout"])
    ]
    edges = docs.select(
        F.col("doc_id").alias("src"), F.explode(F.array(*dsts)).alias("dst")
    )
    seeds = docs.filter(F.col("doc_id") % _TRUST_SEED_MOD == 0).select(
        F.col("doc_id").alias("node")
    )
    return edges, seeds


def _q_link_trustrank(spark, sf_dir):
    """Integer fixed-point TrustRank (operators/graph.py trustrank —
    Gyongyi et al. 2004): PageRank with the teleport vector
    concentrated on a trusted seed set (doc_id % 17 == 0 here), the
    web-spam demotion ranking a crawl frontier runs next to PageRank.
    Same md5-derived citation graph as link_pagerank; all arithmetic
    is integer (floor divisions, integer sums), so the DuckDB oracle's
    unrolled iteration CTEs reproduce the trust scores bit-exactly."""
    from web_scrapper_spark.operators.graph import trustrank

    edges, seeds = _trust_edges(spark, sf_dir)
    return trustrank(edges, seeds, num_iters=_PRANK["iters"]).select(
        F.col("node").alias("doc_id"), F.col("rank").alias("trust_fp")
    )


def _trustrank_cte_sql(prefix: str = "t") -> str:
    """Unrolled TrustRank iteration CTEs (same pattern as the pagerank
    oracle; seeds = doc_id % mod == 0, teleport mass only to seeds)."""
    from web_scrapper_spark.operators.graph import PAGERANK_SCALE as S

    iters, mod = _PRANK["iters"], _TRUST_SEED_MOD
    sql = f""",
        seeds AS (SELECT count(*) AS ns FROM documents WHERE doc_id % {mod} = 0),
        {prefix}0 AS (
          SELECT doc_id AS node,
                 CASE WHEN doc_id % {mod} = 0
                      THEN CAST({S} // (SELECT ns FROM seeds) AS BIGINT)
                      ELSE CAST(0 AS BIGINT) END AS trust_fp
          FROM documents)"""
    prev = f"{prefix}0"
    for i in range(iters):
        sql += f""",
        {prefix}c{i} AS (
          SELECT e.dst AS node, sum(r.trust_fp // d.odeg) AS s
          FROM edges e JOIN {prev} r ON e.src = r.node
                       JOIN deg d ON e.src = d.src
          GROUP BY e.dst
        ),
        {prefix}{i + 1} AS (
          SELECT n0.node,
                 CAST(CASE WHEN n0.node % {mod} = 0
                           THEN (15 * ({S} // (SELECT ns FROM seeds))) // 100
                           ELSE 0 END
                      + (coalesce(c.s, 0) * 85) // 100 AS BIGINT) AS trust_fp
          FROM {prefix}0 n0 LEFT JOIN {prefix}c{i} c USING (node)
        )"""
        prev = f"{prefix}{i + 1}"
    return sql


def _trustrank_oracle_sql() -> str:
    fanout = _PRANK["fanout"]
    js = ", ".join(str(j) for j in range(fanout))
    head = f"""
        WITH params AS (SELECT count(*) AS n FROM documents),
        edges AS (
          SELECT doc_id AS src,
                 ('0x' || substr(md5(doc_id || '|' || j), 1, 15))::BIGINT
                   % (SELECT n FROM params) AS dst
          FROM documents, unnest([{js}]) AS t(j)
        ),
        deg AS (SELECT src, count(*) AS odeg FROM edges GROUP BY src)"""
    prev = f"t{_PRANK['iters']}"
    return (
        head
        + _trustrank_cte_sql("t")
        + f"\n        SELECT node AS doc_id, trust_fp FROM {prev}"
    )


def _q_link_spam_mass(spark, sf_dir):
    """Relative spam mass (operators/graph.py spam_mass — TrustRank
    paper §6): the ppm fraction of each node's PageRank NOT backed by
    trust from the seed set — the crawl-blocklist ranking. Composes
    the two integer fixed-point propagations and one equi-join; the
    oracle replays both unrolled iteration chains and the same integer
    ppm expression."""
    from web_scrapper_spark.operators.graph import spam_mass_scores

    edges, seeds = _trust_edges(spark, sf_dir)
    return spam_mass_scores(edges, seeds, num_iters=_PRANK["iters"]).select(
        F.col("node").alias("doc_id"), "rank_fp", "trust_fp", "spam_mass_ppm"
    )


def _spam_mass_oracle_sql() -> str:
    from web_scrapper_spark.operators.graph import PAGERANK_SCALE as S

    iters, fanout = _PRANK["iters"], _PRANK["fanout"]
    js = ", ".join(str(j) for j in range(fanout))
    sql = f"""
        WITH params AS (SELECT count(*) AS n FROM documents),
        edges AS (
          SELECT doc_id AS src,
                 ('0x' || substr(md5(doc_id || '|' || j), 1, 15))::BIGINT
                   % (SELECT n FROM params) AS dst
          FROM documents, unnest([{js}]) AS t(j)
        ),
        deg AS (SELECT src, count(*) AS odeg FROM edges GROUP BY src),
        r0 AS (SELECT doc_id AS node,
                      CAST({S} // (SELECT n FROM params) AS BIGINT) AS rank_fp
               FROM documents)"""
    prev = "r0"
    for i in range(iters):
        sql += f""",
        c{i} AS (
          SELECT e.dst AS node, sum(r.rank_fp // d.odeg) AS s
          FROM edges e JOIN {prev} r ON e.src = r.node
                       JOIN deg d ON e.src = d.src
          GROUP BY e.dst
        ),
        r{i + 1} AS (
          SELECT n0.node,
                 CAST((15 * ({S} // (SELECT n FROM params))) // 100
                      + (coalesce(c.s, 0) * 85) // 100 AS BIGINT) AS rank_fp
          FROM r0 n0 LEFT JOIN c{i} c USING (node)
        )"""
        prev = f"r{i + 1}"
    sql += _trustrank_cte_sql("t")
    return sql + f"""
        SELECT p.node AS doc_id,
               p.rank_fp,
               CAST(coalesce(t.trust_fp, 0) AS BIGINT) AS trust_fp,
               CAST(greatest(0, (p.rank_fp - coalesce(t.trust_fp, 0)) * 1000000
                                // greatest(p.rank_fp, 1)) AS BIGINT)
                 AS spam_mass_ppm
        FROM {prev} p LEFT JOIN t{_PRANK["iters"]} t USING (node)"""


def _q_meta_robots(spark, sf_dir):
    """Robots meta directives (operators/structured.py meta_robots):
    pages carry deterministic <meta name=robots> variants chosen by
    doc_id % 8 — no tag, noindex, reversed attribute order, combined,
    NONE, all, mixed-case + unknown directives, and two tags whose
    union must win. The Spark side PARSES the generated html; the
    DuckDB oracle derives the expected flags independently from the
    case index, so a hash match proves the parser implements the REP
    grammar (comma splits, trim, case-fold, none≡noindex+nofollow,
    unknown directives ignored, multi-tag union)."""
    from web_scrapper_spark.operators.structured import meta_robots

    docs = _read(spark, sf_dir, "documents")
    case = F.col("doc_id") % 8
    tag = (
        F.when(case == 0, F.lit(""))
        .when(case == 1, F.lit('<meta name="robots" content="noindex">'))
        .when(case == 2, F.lit('<meta content="nofollow" name="robots">'))
        .when(case == 3, F.lit('<meta name="robots" content="noindex, nofollow">'))
        .when(case == 4, F.lit("<meta name='robots' content='NONE'>"))
        .when(case == 5, F.lit('<meta name="robots" content="all">'))
        .when(case == 6, F.lit('<META NAME="ROBOTS" CONTENT=" NoIndex , ARCHIVE ">'))
        .otherwise(
            F.lit(
                '<meta name="robots" content="noindex">'
                '<meta name="robots" content="nofollow">'
            )
        )
    )
    pages = docs.select(
        F.col("doc_id"),
        F.concat(
            F.lit("<html><head>"), tag, F.lit("</head><body>x</body></html>")
        ).alias("html"),
    )
    flags = meta_robots(pages, url_col="doc_id")
    return flags.select(
        F.col("url").alias("doc_id"), "noindex", "nofollow"
    )


_META_ROBOTS_ORACLE = """
    SELECT doc_id,
           (doc_id % 8) IN (1, 3, 4, 6, 7) AS noindex,
           (doc_id % 8) IN (2, 3, 4, 7) AS nofollow
    FROM documents
"""


def _q_nofollow_links(spark, sf_dir):
    """rel=nofollow anchor extraction (operators/structured.py
    nofollow_links): each page carries three generated anchors whose
    rel attribute cycles through nofollow / 'ugc nofollow' /
    'nofollowother' (a non-token superstring that must NOT match) /
    no-rel / 'NOFOLLOW,sponsored' by (doc_id*3+j) % 5. Spark parses
    the html; the oracle regenerates the expected (url, target) edge
    set relationally from the same case arithmetic — token-exact,
    case-insensitive, comma/space-separated rel grammar proven by the
    hash match."""
    from web_scrapper_spark.operators.structured import nofollow_links

    docs = _read(spark, sf_dir, "documents")
    anchors = []
    for j in range(3):
        rel_case = (F.col("doc_id") * 3 + F.lit(j)) % 5
        rel_attr = (
            F.when(rel_case == 0, F.lit(' rel="nofollow"'))
            .when(rel_case == 1, F.lit(" rel='ugc nofollow'"))
            .when(rel_case == 2, F.lit(' rel="nofollowother"'))
            .when(rel_case == 3, F.lit(""))
            .otherwise(F.lit(' rel="NOFOLLOW,sponsored"'))
        )
        anchors.append(
            F.concat(
                F.lit("<a"),
                rel_attr,
                F.lit(' href="/d'),
                F.col("doc_id").cast("string"),
                F.lit(f"/l{j}"),
                F.lit('">x</a>'),
            )
        )
    pages = docs.select(
        F.concat(F.lit("page:"), F.col("doc_id").cast("string")).alias("url"),
        F.concat(F.lit("<html><body>"), *anchors, F.lit("</body></html>")).alias(
            "html"
        ),
    )
    return nofollow_links(pages).orderBy("url", "target")


_NOFOLLOW_LINKS_ORACLE = """
    SELECT 'page:' || doc_id AS url,
           '/d' || doc_id || '/l' || j AS target
    FROM documents, unnest([0, 1, 2]) AS t(j)
    WHERE (doc_id * 3 + j) % 5 IN (0, 1, 4)
    ORDER BY url, target
"""


def _set_join_inputs(spark, sf_dir):
    """Shared fixture for the set joins: corpus token sets = sorted
    distinct A1 tokens per document; query sets = the 3 alphabetically
    smallest tokens of every doc_id % 100 == 0 document."""
    docs = _read(spark, sf_dir, "documents")
    toks = F.array_sort(F.array_distinct(_tx.tokens_col(F.col("text"))))
    corpus = docs.select("doc_id", toks.alias("tokens"))
    queries = corpus.filter(F.col("doc_id") % 100 == 0).select(
        F.col("doc_id").alias("query_id"), F.slice("tokens", 1, 3).alias("tokens")
    )
    return queries, corpus


def _q_set_containment(spark, sf_dir):
    """Set-containment join (operators/setjoin.py — LCJoin ICDE 2019
    least-frequent-element rule): candidates come from ONE inverted
    list per query (its globally rarest token), verification is a
    native forall/array_contains over candidates only — never the
    all-pairs membership test. The oracle re-walks the relation as the
    direct quadratic containment predicate in DuckDB, so the hash
    match proves the probe+verify plan exactly equals the naive
    semantics."""
    from web_scrapper_spark.operators.setjoin import set_containment_join

    queries, corpus = _set_join_inputs(spark, sf_dir)
    return set_containment_join(queries, corpus).orderBy("query_id", "doc_id")


_SET_CONTAINMENT_ORACLE = f"""
    WITH toks AS (
      SELECT doc_id, list_sort(list_distinct({_TOKS_SQL})) AS ts
      FROM documents
    ),
    q AS (
      SELECT doc_id AS query_id, ts[1:3] AS qs
      FROM toks WHERE doc_id % 100 = 0
    )
    SELECT q.query_id, t.doc_id
    FROM q, toks t
    WHERE len(q.qs) > 0
      AND len(list_filter(q.qs, x -> NOT list_contains(t.ts, x))) = 0
    ORDER BY query_id, doc_id
"""


def _q_set_overlap(spark, sf_dir):
    """Set-overlap join (operators/setjoin.py — PPJoin-family prefix
    filter): order tokens by global (df, token); a doc missing ALL of
    a query's first |q|−t+1 tokens in that order cannot reach overlap
    t, so only those posting lists are probed; the exact overlap is a
    native array_intersect on candidates. Oracle = the quadratic
    intersection predicate in DuckDB."""
    from web_scrapper_spark.operators.setjoin import set_overlap_join

    queries, corpus = _set_join_inputs(spark, sf_dir)
    return set_overlap_join(queries, corpus, min_overlap=2).orderBy(
        "query_id", "doc_id"
    )


_SET_OVERLAP_ORACLE = f"""
    WITH toks AS (
      SELECT doc_id, list_sort(list_distinct({_TOKS_SQL})) AS ts
      FROM documents
    ),
    q AS (
      SELECT doc_id AS query_id, ts[1:3] AS qs
      FROM toks WHERE doc_id % 100 = 0
    )
    SELECT q.query_id, t.doc_id,
           CAST(len(list_intersect(q.qs, t.ts)) AS INT) AS overlap
    FROM q, toks t
    WHERE len(list_intersect(q.qs, t.ts)) >= 2
    ORDER BY query_id, doc_id
"""


def _q_host_split(spark, sf_dir):
    """Leakage-safe host-grain train/val/test split (operators/
    sampling.py host_split): every row of a host lands in one split by
    construction — the assignment is md5(salt|host) % 1e6 mapped to
    test/val/train ppm ranges, a pure function of the host string
    (stable across epochs/snapshots, engine-independent). The oracle
    recomputes the same bucket arithmetic in DuckDB — bit-exact."""
    from web_scrapper_spark.operators.sampling import host_split

    docs = _read(spark, sf_dir, "documents")
    hosted = docs.select(
        "doc_id",
        F.concat(
            F.lit("h"), (F.col("doc_id") % 97).cast("string"), F.lit(".example.org")
        ).alias("host"),
    )
    return host_split(hosted, val_ppm=100_000, test_ppm=50_000).select(
        "doc_id", "host", "split_bucket_ppm", "split"
    )


_HOST_SPLIT_ORACLE = """
    WITH hosted AS (
      SELECT doc_id, 'h' || (doc_id % 97) || '.example.org' AS host
      FROM documents
    ),
    b AS (
      SELECT doc_id, host,
             ('0x' || substr(md5('split-v1|' || host), 1, 15))::BIGINT
               % 1000000 AS split_bucket_ppm
      FROM hosted
    )
    SELECT doc_id, host, split_bucket_ppm,
           CASE WHEN split_bucket_ppm < 50000 THEN 'test'
                WHEN split_bucket_ppm < 150000 THEN 'val'
                ELSE 'train' END AS split
    FROM b
"""


def _q_warc_roundtrip(spark, sf_dir):
    """WARC sink→source roundtrip (sources/warc.py): documents are
    wrapped as HTML pages, written as a sharded .warc.gz archive
    (4 files, one per partition), and read back via the binaryFile +
    mapInPandas source. The projection (url, status, byte length, md5
    of the payload) is oracled by DuckDB recomputing the same values
    straight from the parquet — so the oracle checks that the full
    serialize→gzip→parse→unwrap path is byte-lossless."""
    import tempfile

    from web_scrapper_spark.fixtures.sitegen import WARC_EPOCH
    from web_scrapper_spark.sources.warc import read_warc, write_warc

    docs = _read(spark, sf_dir, "documents")
    pages = docs.select(
        F.concat(F.lit("https://warc.example.org/doc/"), F.col("doc_id")).alias("url"),
        F.lit(WARC_EPOCH).alias("warc_ts"),
        F.encode(
            F.concat(F.lit("<html><body>"), F.col("text"), F.lit("</body></html>")),
            "utf-8",
        ).alias("html"),
    )
    out = tempfile.mkdtemp(prefix="wss_warc_oracle_")
    write_warc(pages.repartition(4, "url"), out)
    return read_warc(spark, out).select(
        "url",
        F.col("http_status").alias("status"),
        F.length("html").cast("long").alias("n_bytes"),
        F.md5("html").alias("payload_md5"),
    )


def _q_wet_roundtrip(spark, sf_dir):
    """WET sink→source roundtrip (sources/warc.py write_wet/read_wet —
    Common Crawl's extracted-text *.warc.wet.gz sibling of the WARC
    shards): documents' text is written as sharded conversion records
    and read back through the same binaryFile + mapInPandas parse. The
    oracle recomputes (url, record type, byte length, md5 of the text)
    from the parquet — a hash match proves the conversion-record
    serialize→gzip→parse path byte-lossless, and the record-id check
    rides the md5 (ids are the deterministic md5(url|date) uuids that
    cross-link WET conversions to their WARC responses)."""
    import tempfile

    from web_scrapper_spark.fixtures.sitegen import WARC_EPOCH
    from web_scrapper_spark.sources.warc import read_wet, write_wet

    docs = _read(spark, sf_dir, "documents")
    rows = docs.select(
        F.concat(F.lit("https://wet.example.org/doc/"), F.col("doc_id")).alias("url"),
        F.lit(WARC_EPOCH).alias("warc_ts"),
        F.col("text"),
    )
    out = tempfile.mkdtemp(prefix="wss_wet_oracle_")
    write_wet(rows.repartition(4, "url"), out)
    return read_wet(spark, out).select(
        "url",
        F.col("warc_type").alias("rec_type"),
        F.length("html").cast("long").alias("n_bytes"),
        F.md5("html").alias("text_md5"),
    )


def _q_wat_export(spark, sf_dir):
    """WAT sink→source roundtrip (sources/warc.py write_wat/read_wat —
    Common Crawl's per-page metadata *.warc.wat.gz sibling): documents
    become (title, metas map, links array) rows, serialized as
    name-sorted deterministic JSON envelopes in metadata records, read
    back, and unpacked with Catalyst-native get_json_object. The
    oracle recomputes (url, title, description meta, second link) from
    the index arithmetic — a hash match proves envelope construction,
    record serialize→gzip→parse, and the JSON-path unpack lossless."""
    import tempfile

    from web_scrapper_spark.fixtures.sitegen import WARC_EPOCH
    from web_scrapper_spark.sources.warc import read_wat, write_wat

    docs = _read(spark, sf_dir, "documents")
    u = lambda c: F.concat(F.lit("https://wat.example.org/doc/"), c.cast("string"))  # noqa: E731
    rows = docs.select(
        u(F.col("doc_id")).alias("url"),
        F.lit(WARC_EPOCH).alias("warc_ts"),
        F.concat(F.lit("Doc "), F.col("doc_id").cast("string")).alias("title"),
        F.create_map(
            F.lit("description"),
            F.concat(F.lit("desc-"), F.col("doc_id").cast("string")),
            F.lit("robots"),
            F.when(F.col("doc_id") % 2 == 0, F.lit("index")).otherwise(
                F.lit("noindex")
            ),
        ).alias("metas"),
        F.array(
            u(F.col("doc_id") + 1), u(F.col("doc_id") * 2 + 3)
        ).alias("links"),
    )
    out = tempfile.mkdtemp(prefix="wss_wat_oracle_")
    write_wat(rows.repartition(4, "url"), out)
    env = F.col("html").cast("string")
    md = "$['Envelope']['Payload-Metadata']['HTTP-Response-Metadata']['HTML-Metadata']"
    return read_wat(spark, out).select(
        "url",
        F.get_json_object(env, md + "['Head']['Title']").alias("title"),
        F.get_json_object(env, md + "['Head']['Metas'][0]['content']").alias(
            "description"
        ),
        F.get_json_object(env, md + "['Links'][1]['url']").alias("second_link"),
    )


def _q_sitemap_parse(spark, sf_dir):
    """Sitemap ingestion (frontier/sitemap.py): documents are grouped
    into 8 hosts, serialized as sitemaps.org <urlset> XML (lastmod /
    changefreq / priority per entry), and fed through the
    sitemap_candidates Arrow parse stage. The oracle regenerates the
    expected entries relationally — a hash match proves the XML writer
    → namespace-tolerant parser → entry emission path lossless,
    including priority's float→ppm integer scaling."""
    from web_scrapper_spark.frontier.sitemap import sitemap_candidates

    docs = _read(spark, sf_dir, "documents")
    freq = F.element_at(
        F.array(F.lit("daily"), F.lit("weekly"), F.lit("monthly"), F.lit("never")),
        (F.col("doc_id") % 4 + 1).cast("int"),
    )
    frag = F.concat(
        F.lit("<url><loc>https://sm"), F.col("doc_id") % 8,
        F.lit(".example.org/doc/"), F.col("doc_id"),
        F.lit("</loc><lastmod>2025-07-"),
        F.lpad((F.col("doc_id") % 28 + 1).cast("string"), 2, "0"),
        F.lit("</lastmod><changefreq>"), freq,
        F.lit("</changefreq><priority>0."), F.col("doc_id") % 10,
        F.lit("</priority></url>"),
    )
    sitemaps = (
        docs.select((F.col("doc_id") % 8).alias("h"), F.struct("doc_id", frag.alias("f")).alias("e"))
        .groupBy("h")
        .agg(
            F.array_join(
                F.transform(F.array_sort(F.collect_list("e")), lambda x: x["f"]), ""
            ).alias("body")
        )
        .select(
            F.concat(F.lit("https://sm"), F.col("h"), F.lit(".example.org/sitemap.xml")).alias("url"),
            F.encode(
                F.concat(
                    F.lit('<?xml version="1.0" encoding="UTF-8"?>'
                          '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'),
                    F.col("body"),
                    F.lit("</urlset>"),
                ),
                "utf-8",
            ).alias("html"),
        )
    )
    return sitemap_candidates(sitemaps)


def _q_warc_cdx_fetch(spark, sf_dir):
    """CDX random access (sources/warc.py): the documents are archived
    as sharded .warc.gz with CDXJ sidecars, then ONE IN TEN records
    (doc_id % 10 = 3) is fetched back via index-driven gzip-member
    range reads — the archives are never scanned. The oracle recomputes
    the selected payload md5s straight from parquet: a hash match
    proves the index offsets/lengths address exactly the right bytes."""
    import tempfile

    from web_scrapper_spark.fixtures.sitegen import WARC_EPOCH
    from web_scrapper_spark.sources.warc import read_cdx, read_warc_ranges, write_warc

    docs = _read(spark, sf_dir, "documents")
    pages = docs.select(
        F.concat(F.lit("https://warc.example.org/doc/"), F.col("doc_id")).alias("url"),
        F.lit(WARC_EPOCH).alias("warc_ts"),
        F.encode(
            F.concat(F.lit("<html><body>"), F.col("text"), F.lit("</body></html>")),
            "utf-8",
        ).alias("html"),
    )
    out = tempfile.mkdtemp(prefix="wss_cdx_oracle_")
    write_warc(pages.repartition(4, "url"), out)
    cdx = read_cdx(spark, out)
    want = cdx.filter(
        F.regexp_extract("url", r"/doc/(\d+)$", 1).cast("long") % 10 == 3
    )
    return read_warc_ranges(want, out).select(
        "url",
        F.length("html").cast("long").alias("n_bytes"),
        F.md5("html").alias("payload_md5"),
    )


_LEXICON = ("data", "join", "slow", "spark")
_LEX_IN_SQL = ", ".join(f"'{w}'" for w in _LEXICON)
_LEX_FLAG_PPM = 120_000

_BLOCKED_DOMAINS = ("evil.com", "tracker.net")


def _q_lexicon_gate(spark, sf_dir):
    """Blocklist word-fraction gate (operators/lexicon.py
    lexicon_stats — C4/Dolma-style lexicon scoring). The lexicon folds
    into the plan as one literal array; per-occurrence counting and the
    ppm fraction are higher-order functions — zero exchanges. The
    corpus vocabulary guarantees hits, so flagged is non-vacuous both
    ways at the 12% threshold."""
    from web_scrapper_spark.operators.lexicon import lexicon_stats

    docs = _read(spark, sf_dir, "documents")
    return lexicon_stats(docs, list(_LEXICON), max_frac_ppm=_LEX_FLAG_PPM)


def _q_domain_blocklist(spark, sf_dir):
    """URL-grain domain blocklist (operators/lexicon.py
    domain_blocklist_flags — RefinedWeb §3.1 parent-domain semantics).
    Hosts are derived five ways so every branch fires: exact match,
    subdomain match, a near-miss ('notevil.com' must NOT match
    'evil.com'), a second listed domain, and clean hosts."""
    from web_scrapper_spark.operators.lexicon import domain_blocklist_flags

    docs = _read(spark, sf_dir, "documents")
    host = (
        F.when(F.col("doc_id") % 5 == 0, F.lit("evil.com"))
        .when(F.col("doc_id") % 5 == 1, F.lit("ads.evil.com"))
        .when(F.col("doc_id") % 5 == 2, F.lit("notevil.com"))
        .when(F.col("doc_id") % 5 == 3, F.lit("cdn.tracker.net"))
        .otherwise(
            F.concat(F.lit("h"), (F.col("doc_id") % 7).cast("string"), F.lit(".org"))
        )
    )
    pages = docs.select(
        "doc_id",
        F.concat(
            F.lit("https://"), host, F.lit("/p/"), F.col("doc_id").cast("string")
        ).alias("url"),
    )
    return domain_blocklist_flags(pages, list(_BLOCKED_DOMAINS))


def _q_ucb_budget(spark, sf_dir):
    """Yield-adaptive crawl budgets (frontier/bandit.py ucb_scores +
    ucb_budgets — UCB1 over hosts as arms, fixed-point ppm, largest-
    remainder apportionment). Pulls/rewards derive deterministically
    from documents (host = doc_id mod 13; a doc yields iff
    n_chars mod 3 = 0), so hosts get distinct yield rates and the
    1000-slot split exercises both the floor shares and the remainder
    top-up. All transcendentals are integer-exact (floor(log2) via bit
    length, isqrt via Newton clamp) so the SQL oracle replays every
    bit."""
    from web_scrapper_spark.frontier.bandit import ucb_budgets, ucb_scores

    docs = _read(spark, sf_dir, "documents")
    stats = docs.groupBy(
        F.concat(F.lit("h"), (F.col("doc_id") % 13).cast("string")).alias("host")
    ).agg(
        F.count(F.lit(1)).alias("n_fetched"),
        F.sum(F.when(F.col("n_chars") % 3 == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_yield"),
    )
    return ucb_budgets(ucb_scores(stats), total_budget=1000)


_CDC_BOILER = (
    "subscribe to the newsletter follow us on social media all rights "
    "reserved copyright terms of service privacy policy cookie settings "
    "back to top related articles most read trending now site map contact"
)


def _cdc_salted(spark, sf_dir):
    """documents with a shared chrome suffix so chunks dedup across
    docs — the storage win CDC exists for."""
    docs = _read(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.concat(F.col("text"), F.lit(" "), F.lit(_CDC_BOILER)).alias("text"),
    )


def _q_cdc_chunks(spark, sf_dir):
    """Content-defined chunking (operators/cdc.py cdc_chunks — LBFS/
    rsync hash-boundary rule, FastCDC's ancestor). Chunks are cut
    where md5(16-char window) % 64 == 0, so the shared chrome suffix
    yields byte-identical chunks in every document; the oracle replays
    every cut and chunk digest."""
    from web_scrapper_spark.operators.cdc import cdc_chunks

    return cdc_chunks(_cdc_salted(spark, sf_dir), k=16, avg_size=64)


def _q_cdc_dedup(spark, sf_dir):
    """Storage-dedup accounting over the CDC chunk table (operators/
    cdc.py cdc_dedup_stats): one hash aggregate + scalar rollup;
    stored_ppm < 1e6 proves the planted chrome actually dedups."""
    from web_scrapper_spark.operators.cdc import cdc_chunks, cdc_dedup_stats

    return cdc_dedup_stats(cdc_chunks(_cdc_salted(spark, sf_dir), k=16, avg_size=64))


_LPA_ITERS = 4


def _q_host_communities(spark, sf_dir):
    """Synchronous label-propagation communities (operators/graph.py
    label_propagation — Raghavan et al. 2007, made deterministic:
    lockstep rounds, max-count/min-label votes). The fixture plants 3
    host communities of 8 (intra-community ring+chord edges) plus
    sparse cross links (doc_id % 31), so the detected communities are
    non-trivial; the oracle unrolls all 4 rounds relationally."""
    from web_scrapper_spark.operators.graph import label_propagation

    docs = _read(spark, sf_dir, "documents")
    c = F.col("doc_id") % 3
    i = F.expr("doc_id div 3") % 8
    j = (i + 1 + F.col("doc_id") % 4) % 8
    mk = lambda cc, nn: F.concat(  # noqa: E731
        F.lit("c"), cc.cast("string"), F.lit("n"), nn.cast("string")
    )
    cross = (F.col("doc_id") % 31) == 0
    edges = docs.select(
        F.when(cross, mk(c, F.lit(0))).otherwise(mk(c, i)).alias("src"),
        F.when(cross, mk((c + 1) % 3, F.lit(0)))
        .otherwise(mk(c, j))
        .alias("dst"),
    )
    return label_propagation(edges, num_iters=_LPA_ITERS).select(
        F.col("node").alias("host"), "community"
    )


def _lpa_oracle_sql(num_iters: int = _LPA_ITERS) -> str:
    """Unrolled-round replay of the deterministic LPA recurrence (the
    pagerank-oracle pattern: one CTE pair per round)."""
    ctes = [
        """e0 AS (
              SELECT CASE WHEN doc_id % 31 = 0
                          THEN 'c' || CAST(doc_id % 3 AS VARCHAR) || 'n0'
                          ELSE 'c' || CAST(doc_id % 3 AS VARCHAR)
                             || 'n' || CAST((doc_id // 3) % 8 AS VARCHAR)
                     END AS s,
                     CASE WHEN doc_id % 31 = 0
                          THEN 'c' || CAST((doc_id % 3 + 1) % 3 AS VARCHAR) || 'n0'
                          ELSE 'c' || CAST(doc_id % 3 AS VARCHAR) || 'n' ||
                               CAST(((doc_id // 3) % 8 + 1 + doc_id % 4) % 8
                                    AS VARCHAR)
                     END AS d
              FROM documents
            ), und AS (
              SELECT DISTINCT s, d FROM (
                SELECT s, d FROM e0
                UNION ALL SELECT d AS s, s AS d FROM e0
              ) WHERE s <> d
            ), l0 AS (
              SELECT DISTINCT s AS node, s AS label FROM und
            )"""
    ]
    for i in range(num_iters):
        ctes.append(
            f"""cnt{i} AS (
              SELECT node, label, count(*) AS cnt FROM (
                SELECT u.d AS node, l.label
                FROM und u JOIN l{i} l ON l.node = u.s
                UNION ALL
                SELECT node, label FROM l{i}
              ) GROUP BY 1, 2
            ), l{i + 1} AS (
              SELECT node, label FROM (
                SELECT node, label,
                       row_number() OVER (PARTITION BY node
                                          ORDER BY cnt DESC, label ASC) AS rn
                FROM cnt{i}) WHERE rn = 1
            )"""
        )
    return (
        "WITH "
        + ",\n            ".join(ctes)
        + f"\n            SELECT node AS host, label AS community FROM l{num_iters}"
    )


def _q_zorder_skip(spark, sf_dir):
    """Z-order (Morton) layout + data-skipping proof (operators/
    zcurve.py zorder_layout + file_skip_stats — the Delta OPTIMIZE
    ZORDER BY / Iceberg sort-order-rewrite primitive). Dims are the
    low/high halves of doc_id over a 32x32 grid; output is the per-file
    min/max footer stats a reader prunes with — file-count sized, so
    the oracle checks the exact layout boundaries the range write
    would draw."""
    from web_scrapper_spark.operators.zcurve import file_skip_stats, zorder_layout

    docs = _read(spark, sf_dir, "documents")
    dims = docs.select(
        "doc_id",
        (F.col("doc_id") % 32).cast("long").alias("x"),
        F.floor(F.col("doc_id") / 32).cast("long").bitwiseAND(F.lit(31)).alias("y"),
    )
    laid = zorder_layout(dims, [F.col("x"), F.col("y")], n_files=16, bits=5)
    return file_skip_stats(laid, ["x", "y"])


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # aggregations / text analytics (A1-A4, training-data ops)
        "a1_keywords_topk": _q_a1_keywords_topk,
        "a1_doc_keywords_topk": _q_a1_doc_keywords,
        "a2_doc_stats": _q_a2_doc_stats,
        "lang_id": _q_lang_id,
        "paragraph_lang": _q_paragraph_lang,
        "line_dedup": _q_line_dedup,
        "tok_bpe": _q_tok_bpe,
        "bpe_pairs": _q_bpe_pairs,
        "bpe_learn": _q_bpe_learn,
        "bpe_encode": _q_bpe_encode,
        "fingerprint_md5": _q_fingerprint,
        "fingerprint_winnow": _q_fingerprint_winnow,
        "pii_redact": _q_pii_redact,
        "winnow_overlap_pairs": _q_winnow_overlap,
        "gopher_quality": _q_gopher_quality,
        "lexicon_gate": _q_lexicon_gate,
        "domain_blocklist": _q_domain_blocklist,
        "cdc_chunks": _q_cdc_chunks,
        "cdc_dedup": _q_cdc_dedup,
        "host_communities": _q_host_communities,
        "compression_ratio": _q_compression_ratio,
        "corpus_card": _q_corpus_card,
        "c4_clean": _q_c4_clean,
        "decontaminate": _q_decontaminate,
        "dsir_weights": _q_dsir_weights,
        "pack_sequences": _q_pack_sequences,
        "passage_chunks": _q_passage_chunks,
        "url_filter": _q_url_filter,
        "corpus_funnel": _q_corpus_funnel,
        "funnel_reasons": _q_funnel_reasons,
        "stratified_sample": _q_stratified_sample,
        "priority_sample": _q_priority_sample,
        "hll_host_distinct": _q_hll_host_distinct,
        "cms_hot_hosts": _q_cms_hot_hosts,
        "cuckoo_seen": _q_cuckoo_seen,
        "host_triangles": _q_host_triangles,
        "ip_politeness": _q_ip_politeness,
        "latency_quantiles": _q_latency_quantiles,
        "host_volatility": _q_host_volatility,
        # dedup family
        "dedup_exact": _q_dedup_exact,
        "exact_substring": _q_exact_substring,
        "paragraph_dedup": _q_paragraph_dedup,
        "dedup_minhash_lsh": _q_dedup_minhash,
        "dedup_minhash_incr": _q_dedup_minhash_incr,
        "dedup_components": _q_dedup_components,
        "dedup_embedding_cosine": _q_dedup_embedding,
        "dedup_simhash": _q_dedup_simhash,
        "mirror_hosts": _q_mirror_hosts,
        "dhash_pairs": _q_dhash_pairs,
        "png_decode": _q_png_decode,
        "png_dhash_pairs": _q_png_dhash_pairs,
        "jpeg_decode": _q_jpeg_decode,
        "jpeg_dhash_pairs": _q_jpeg_dhash_pairs,
        "gif_decode": _q_gif_decode,
        "gif_dhash_pairs": _q_gif_dhash_pairs,
        "gif_frames": _q_gif_frames,
        "gif_frame_dedup": _q_gif_frame_dedup,
        "anim_frames_mixed": _q_anim_frames_mixed,
        "anim_cross_dedup": _q_anim_cross_dedup,
        "favicon_decode": _q_favicon_decode,
        "favicon_dhash_pairs": _q_favicon_dhash_pairs,
        "jpeg_exif": _q_jpeg_exif,
        "registered_domain": _q_registered_domain,
        "pld_flood": _q_pld_flood,
        "embed_decontam": _q_embed_decontam,
        "perceptron_gate": _q_perceptron_gate,
        "opic_importance": _q_opic,
        "hits_scores": _q_hits,
        "soft404_templated": _q_soft404,
        "excerpt_pairs": _q_excerpt_pairs,
        "starvation_report": _q_starvation,
        "audio_pairs": _q_audio_pairs,
        "semdedup": _q_semdedup,
        "ccnet_ppl": _q_ccnet_ppl,
        # link-graph centrality (crawl frontier prioritization)
        "link_pagerank": _q_link_pagerank,
        "link_trustrank": _q_link_trustrank,
        "link_spam_mass": _q_link_spam_mass,
        "meta_robots": _q_meta_robots,
        "nofollow_links": _q_nofollow_links,
        "host_split": _q_host_split,
        "set_containment": _q_set_containment,
        "set_overlap": _q_set_overlap,
        "redirect_resolve": _q_redirect_resolve,
        "recrawl_due": _q_recrawl_due,
        "crawl_diff": _q_crawl_diff,
        "warc_latest_capture": _q_warc_latest_capture,
        "adaptive_delay": _q_adaptive_delay,
        "fair_share": _q_fair_share,
        "ucb_budget": _q_ucb_budget,
        "corpus_layout": _q_corpus_layout,
        "zorder_skip": _q_zorder_skip,
        "training_shuffle": _q_training_shuffle,
        "mix_sources": _q_mix_sources,
        "token_budget": _q_token_budget,
        "postings": _q_postings,
        "positional_postings": _q_positional_postings,
        "position_gaps": _q_position_gaps,
        "phrase_search": _q_phrase_search,
        "phrase_from_index": _q_phrase_from_index,
        "proximity_search": _q_proximity_search,
        "boolean_search": _q_boolean_search,
        "term_cooccurrence": _q_term_cooccurrence,
        "spell_correct": _q_spell_correct,
        "concordance": _q_concordance,
        "prefix_suggest": _q_prefix_suggest,
        "snippets": _q_snippets,
        "robots_audit": _q_robots_audit,
        "quality_drift": _q_quality_drift,
        "asof_join": _q_asof_join,
        "range_join": _q_range_join,
        "url_shapes": _q_url_shapes,
        "url_param_mining": _q_url_param_mining,
        "url_param_rewrite": _q_url_param_rewrite,
        "main_content": _q_main_content,
        "host_boilerplate": _q_host_boilerplate,
        "jsonld_extract": _q_jsonld,
        "cdx_revisits": _q_cdx_revisits,
        "media_sniff": _q_media_sniff,
        "trap_detect": _q_trap_detect,
        "robots_allow": _q_robots_allow,
        "page_meta": _q_page_meta,
        "charset_detect": _q_charset_detect,
        "sitemap_coverage": _q_sitemap_coverage,
        "drain_plan": _q_drain_plan,
        "host_priors": _q_host_priors,
        "unicode_clean": _q_unicode_clean,
        "anchor_profile": _q_anchor_profile,
        "inlink_stats": _q_inlink_stats,
        "bm25_topk": _q_bm25,
        "bm25_search": _q_bm25_search,
        "cluster_reps": _q_cluster_reps,
        # similarity search
        "sim_cosine_topk": _q_sim_topk,
        "sim_ivf_topk": _q_sim_ivf_topk,
        "sim_srp_topk": _q_srp_topk,
        "embedding_quantize": _q_embedding_quantize,
        "sim_sq_topk": _q_sim_sq_topk,
        "kcenter_select": _q_kcenter,
        "cc_index_surt": _q_cc_index_surt,
        "script_profile": _q_script_profile,
        "heavy_hitters": _q_heavy_hitters,
        "kcore": _q_kcore,
        "postings_gaps": _q_postings_gaps,
        "bm25f_search": _q_bm25f_search,
        "metric_anomalies": _q_metric_anomalies,
        "retrieval_eval": _q_retrieval_eval,
        "url_equivalence": _q_url_equivalence,
        "robots_refresh": _q_robots_refresh,
        "more_like_this": _q_more_like_this,
        "mlt_from_index": _q_mlt_from_index,
        "mlt_persisted_weights": _q_mlt_persisted_weights,
        "postings_merge": _q_postings_merge,
        "host_moves": _q_host_moves,
        # sources / declarative loader / sorts / limits (S11, O1-O3)
        "s11_query_loader": _q_s11_query_loader,
        "warc_roundtrip": _q_warc_roundtrip,
        "wet_roundtrip": _q_wet_roundtrip,
        "wat_export": _q_wat_export,
        "warc_cdx_fetch": _q_warc_cdx_fetch,
        "sitemap_parse": _q_sitemap_parse,
        # session/header/proxy + UA rotation (S2/S3)
        "s2_fetch_session": _q_s2_fetch_session,
        "s3_ua_rotation": _q_s3_ua_rotation,
        "http_revalidate": _q_http_revalidate,
        "o2_topk": _q_o2_topk,
        # joins (J1-J3)
        "j1_coalesce_merge": _q_j1_coalesce_merge,
        "j2_lookup_join": _q_j2_lookup_join,
        "j3_seen_antijoin": _q_j3_seen_antijoin,
        # aggregations / windows / sets
        "tpch_q1ish": _q_tpch_q1ish,
        "w1_perhost_rank": _q_w1_perhost_rank,
        "t_sessionize": _q_t_sessionize,
        "a4_run_report": _q_a4_run_report,
        "u1_union_dedup": _q_u1_union_dedup,
        # scalar functions / validators (F1-F21, P4, P7)
        "f1_clean_text": _q_f1_clean_text,
        "f7_email_valid": _q_f7_email_valid,
        "f8_phone_valid": _q_f8_phone_valid,
        "f9_url_valid": _q_f9_url_valid,
        "f10_date_valid": _q_f10_date_valid,
        "f11_ip_valid": _q_f11_ip_valid,
        "f13_json_extract": _q_f13_json_extract,
        "f18_date_normalize": _q_f18_date_normalize,
        "f19_price_parse": _q_f19_price_parse,
        "p7_availability": _q_p7_availability,
        "f21_canonicalize": _q_f21_canonicalize,
        # crawl engine (oracled against the sequential simulator; full
        # parity also tested in tests/)
        "crawl_epoch_seen": _q_crawl_epoch_seen,
        "crawl_content_seen": _q_crawl_content_seen,
        "crawl_revisit": _q_crawl_revisit,
        "volatility_revisit": _q_volatility_revisit,
        # multimodal plumbing (oracled against numpy-recomputed features)
        "multimodal_features": _q_multimodal_features,
    }


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB dialect, ANSI-leaning)
# ---------------------------------------------------------------------------

_ORACLE_CACHE: dict[str, str] = {}


def _crawl_seen_oracle_sql() -> str:
    """Expected seen table from the pure-Python sequential reference
    simulator (SURVEY.md §5.2-2) over the same deterministic fixture
    site `_q_crawl_epoch_seen` crawls — frozen into a VALUES table.
    No Spark involved: page rendering and the crawl replay are plain
    Python, so this runs in the driver's oracle process."""
    if "crawl_seen" not in _ORACLE_CACHE:
        from web_scrapper_spark.crawl.epoch import CrawlConfig
        from web_scrapper_spark.crawl.simulator import simulate_crawl
        from web_scrapper_spark.fixtures.sitegen import (
            SiteSpec,
            all_urls,
            page_html,
            robots_rules,
            seed_urls,
        )

        spec = SiteSpec()
        pages = {u: page_html(u, spec).encode("utf-8") for u in all_urls(spec)}
        seeds = [
            (u, "ecommerce" if u.endswith("/products") else
             "business" if u.endswith("/directory") else "content")
            for u in seed_urls(spec)
        ]
        sim = simulate_crawl(
            pages, seeds, robots_rules(spec), max_depth=CrawlConfig().max_depth
        )
        rows = ",\n              ".join(
            f"('{u}', '{sim.seen[u]}', '{sim.ord_keys[u]}', {sim.depths[u]})"
            for u in sorted(sim.seen)
        )
        _ORACLE_CACHE["crawl_seen"] = (
            f"SELECT * FROM (VALUES {rows}) AS t(url, status, ord_key, depth)"
        )
    return _ORACLE_CACHE["crawl_seen"]


def _content_seen_oracle_sql() -> str:
    """Expected seen statuses for the content-seen query: a plain-
    Python replay of the same 12 seeds in crawl order with an md5 set
    (first copy of a body "ok", later copies "dup"), frozen into a
    VALUES table."""
    if "content_seen" not in _ORACLE_CACHE:
        import hashlib

        from web_scrapper_spark.fixtures.sitegen import SiteSpec, page_html

        spec = SiteSpec()
        fps = set()
        rows = []
        for i in range(12):
            url = f"https://hosta.example-crawl.org/p{i:02d}"
            body = page_html(
                f"https://host0.example-crawl.org/blog/post-{i % 5}", spec
            ).encode("utf-8")
            fp = hashlib.md5(body).hexdigest()
            rows.append(f"('{url}', '{'dup' if fp in fps else 'ok'}')")
            fps.add(fp)
        _ORACLE_CACHE["content_seen"] = (
            "SELECT * FROM (VALUES "
            + ", ".join(rows)
            + ") AS t(url, status)"
        )
    return _ORACLE_CACHE["content_seen"]


def _multimodal_oracle_sql() -> str:
    """Expected image features recomputed in plain numpy (decode via
    the shared deterministic fake decoder — it defines the fixture's
    semantics — then an independent mean/shape derivation), frozen
    into a VALUES table."""
    if "multimodal" not in _ORACLE_CACHE:
        import math

        import numpy as np

        from web_scrapper_spark.operators.multimodal import (
            deterministic_fake_decoder,
            synthetic_media_rows,
        )

        values = []
        for media_id, kind, payload, meta in synthetic_media_rows(n=64):
            grid = deterministic_fake_decoder(payload, meta).astype(np.float64)
            height, width = grid.shape
            luma_micro = math.floor(float(grid.mean()) * 1000000)
            feat_dim = 4 * 4  # resize_to=4 pooled grid, flattened
            values.append(
                f"({media_id}, {width}, {height}, {feat_dim}, {luma_micro})"
            )
        rows = ",\n              ".join(values)
        _ORACLE_CACHE["multimodal"] = (
            f"SELECT * FROM (VALUES {rows}) "
            "AS t(media_id, width, height, feat_dim, luma_micro)"
        )
    return _ORACLE_CACHE["multimodal"]


def _dhash_oracle_sql() -> str:
    """Expected dHash near-pairs by BRUTE FORCE over all C(64,2) pairs
    in plain Python (decode via the shared bitmap codec, hash via the
    shared pure dhash64, Hamming via int bit-count) — independent of
    the pigeonhole blocking under test, frozen into a VALUES table."""
    if "dhash" not in _ORACLE_CACHE:
        from web_scrapper_spark.operators.multimodal import (
            bitmap_payload_decoder,
            dhash64,
            planted_bitmap_media_rows,
        )

        mask = (1 << 64) - 1
        hashes = [
            (media_id, dhash64(bitmap_payload_decoder(payload, meta)) & mask)
            for media_id, _kind, payload, meta in planted_bitmap_media_rows(
                n=64, period=48
            )
        ]
        values = []
        for ai in range(len(hashes)):
            for bi in range(ai + 1, len(hashes)):
                id_a, h_a = hashes[ai]
                id_b, h_b = hashes[bi]
                d = bin(h_a ^ h_b).count("1")
                if d <= 3:
                    values.append(f"({id_a}, {id_b}, {d})")
        rows = ",\n              ".join(values)
        _ORACLE_CACHE["dhash"] = (
            f"SELECT * FROM (VALUES {rows}) AS t(id_a, id_b, hamming)"
        )
    return _ORACLE_CACHE["dhash"]


def _oracle_png_decode(b: bytes) -> list:
    """INDEPENDENT pure-Python PNG decode for the oracle side: byte
    lists and the spec's scanline recurrences written directly (no
    numpy, no code shared with multimodal.png_decode_pixels beyond the
    stdlib zlib call both must make). Covers the engine's full shape
    set — 8/16-bit gray / gray+alpha / RGB / RGBA, 8-bit palette, and
    Adam7 interlace via its own pass-grid arithmetic (per-pass row
    consumption + start/step placement, not the engine's strided
    slicing). Returns the luma grid as a list of row lists."""
    import struct
    import zlib

    assert b[:8] == b"\x89PNG\r\n\x1a\n", "oracle: not a PNG"
    pos, hdr, idat, plte = 8, None, b"", None
    while pos + 12 <= len(b):
        (clen,) = struct.unpack(">I", b[pos:pos + 4])
        tag = b[pos + 4:pos + 8]
        data = b[pos + 8:pos + 8 + clen]
        if tag == b"IHDR":
            hdr = struct.unpack(">IIBBBBB", data)
        elif tag == b"IDAT":
            idat += data
        elif tag == b"PLTE":
            plte = [
                (data[3 * j], data[3 * j + 1], data[3 * j + 2])
                for j in range(len(data) // 3)
            ]
        elif tag == b"IEND":
            break
        pos += 12 + clen
    w, h, depth, color, _c, _f, inter = hdr
    assert depth in (1, 2, 4, 8, 16) and color in (0, 2, 3, 4, 6)
    assert depth >= 8 or color in (0, 3), "oracle: packed non-gray"
    ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color]
    sb = depth // 8
    bpp = ch * sb if depth >= 8 else 1
    raw = zlib.decompress(idat)

    def unfilter(rows, stride, at):
        """rows scanlines of `stride` bytes starting at raw[at] →
        (list of recovered byte rows, next offset)."""
        prev = [0] * stride
        out = []
        for _r in range(rows):
            ft = raw[at]
            cur = raw[at + 1:at + 1 + stride]
            at += 1 + stride
            rec = [0] * stride
            for i in range(stride):
                a = rec[i - bpp] if i >= bpp else 0
                up = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                x = cur[i]
                if ft == 0:
                    v = x
                elif ft == 1:
                    v = x + a
                elif ft == 2:
                    v = x + up
                elif ft == 3:
                    v = x + (a + up) // 2
                else:
                    pp = a + up - c
                    pa, pb, pc = abs(pp - a), abs(pp - up), abs(pp - c)
                    pred = a if (pa <= pb and pa <= pc) else (
                        up if pb <= pc else c
                    )
                    v = x + pred
                rec[i] = v & 0xFF
            prev = rec
            out.append(rec)
        return out, at

    # sample grid: h x w lists of ch-tuples (16-bit keeps byte 0 =
    # the big-endian high byte, the spec's 16→8 scaling)
    samples = [[None] * w for _ in range(h)]

    def place(rec_rows, xs, ys, xstep, ystep, pw):
        for n, rec in enumerate(rec_rows):
            y = ys + n * ystep
            if depth < 8:
                # packed samples, MSB-first: sample j sits at bit
                # offset j*depth of the row's byte vector
                for j in range(pw):
                    off = j * depth
                    byte = rec[off // 8]
                    shift = 8 - depth - (off % 8)
                    samples[y][xs + j * xstep] = (
                        (byte >> shift) & ((1 << depth) - 1),
                    )
                continue
            for cidx in range(pw):
                samples[y][xs + cidx * xstep] = tuple(
                    rec[cidx * bpp + k * sb] for k in range(ch)
                )

    def stride_of(pw):
        return (pw * depth + 7) // 8 if depth < 8 else pw * bpp

    if inter == 0:
        rows, _at = unfilter(h, stride_of(w), 0)
        place(rows, 0, 0, 1, 1, w)
    else:
        at = 0
        for xs, ys, xstep, ystep in (
            (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
            (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
        ):
            pw = (w - xs + xstep - 1) // xstep if w > xs else 0
            ph = (h - ys + ystep - 1) // ystep if h > ys else 0
            if pw == 0 or ph == 0:
                continue
            rows, at = unfilter(ph, stride_of(pw), at)
            place(rows, xs, ys, xstep, ystep, pw)

    grid = []
    for r in range(h):
        row = []
        for c in range(w):
            s = samples[r][c]
            if color == 3:
                pr, pg, pb2 = plte[s[0]]
                row.append((299 * pr + 587 * pg + 114 * pb2) // 1000)
            elif color == 0 and depth < 8:
                row.append(s[0] * 255 // ((1 << depth) - 1))
            elif color in (0, 4):
                row.append(s[0])
            else:
                row.append(
                    (299 * s[0] + 587 * s[1] + 114 * s[2]) // 1000
                )
        grid.append(row)
    return grid


def _oracle_dhash(grid: list) -> int:
    """Independently-written dHash over a list-of-lists luma grid:
    bit k (LSB-first) = sampled(row k//8, col k%8 + 1) > sampled(row
    k//8, col k%8), floor-index sampling — the documented bit layout
    of multimodal.dhash64, re-derived without numpy. Returns the
    UNSIGNED 64-bit value."""
    h, w = len(grid), len(grid[0])
    ri = [(r * h) // 8 for r in range(8)]
    ci = [(c * w) // 9 for c in range(9)]
    val = 0
    for r in range(8):
        for c in range(8):
            if grid[ri[r]][ci[c + 1]] > grid[ri[r]][ci[c]]:
                val |= 1 << (r * 8 + c)
    return val


def _png_oracle_rows() -> list:
    """(media_id, w, h, luma_sum, n_px, dhash_unsigned) for every
    planted PNG, via the independent decoder + independent dHash."""
    if "png_rows" not in _ORACLE_CACHE:
        from web_scrapper_spark.operators.multimodal import (
            planted_png_media_rows,
        )

        out = []
        for media_id, _kind, payload, _meta in planted_png_media_rows():
            grid = _oracle_png_decode(bytes(payload))
            h, w = len(grid), len(grid[0])
            out.append(
                (
                    media_id,
                    w,
                    h,
                    sum(sum(row) for row in grid),
                    h * w,
                    _oracle_dhash(grid),
                )
            )
        _ORACLE_CACHE["png_rows"] = out
    return _ORACLE_CACHE["png_rows"]


def _png_decode_oracle_sql() -> str:
    rows = ",\n              ".join(
        f"({mid}, {w}, {h}, {ls}, {npx}, "
        f"{dh - (1 << 64) if dh >= (1 << 63) else dh})"
        for mid, w, h, ls, npx, dh in _png_oracle_rows()
    )
    return (
        f"SELECT * FROM (VALUES {rows}) "
        "AS t(media_id, width, height, luma_sum, n_px, dhash)"
    )


def _png_dhash_oracle_sql() -> str:
    hashes = [(mid, dh) for mid, _w, _h, _ls, _npx, dh in _png_oracle_rows()]
    values = []
    for ai in range(len(hashes)):
        for bi in range(ai + 1, len(hashes)):
            id_a, h_a = hashes[ai]
            id_b, h_b = hashes[bi]
            d = bin(h_a ^ h_b).count("1")
            if d <= 3:
                values.append(f"({id_a}, {id_b}, {d})")
    rows = ",\n              ".join(values)
    return f"SELECT * FROM (VALUES {rows}) AS t(id_a, id_b, hamming)"


def _oracle_jpeg_progressive(fw, fh, comps, qt, scans, basis, zz,
                             dri=0) -> list:
    """INDEPENDENT progressive (SOF2) reconstruction for the oracle
    side: a SPARSE dict coefficient store keyed (component, padded
    block index, zigzag k), per-scan bit-string readers over table
    snapshots, and the Annex-G successive-approximation control flow
    written with its own loop structure (no code shared with
    rasters._prog_decode_scan). Restart intervals hop to the next
    RSTn-delimited bit string every ``dri`` MCUs (interleaved DC
    scans) or blocks (non-interleaved scans), resetting predictors
    and checking the 0-7 marker cycle. Returns the luma grid as row
    lists."""
    hmax = max(h for _c, h, _v, _t in comps)
    vmax = max(v for _c, _h, v, _t in comps)
    mcux = -(-fw // (8 * hmax))
    mcuy = -(-fh // (8 * vmax))
    fac = {cid: (h, v) for cid, h, v, _t in comps}
    tqof = {cid: t for cid, _h, _v, t in comps}
    pbx = {cid: mcux * h for cid, h, _v, _t in comps}
    adim = {}
    for cid, h, v, _t in comps:
        cw = -(-fw * h // hmax)
        ch = -(-fh * v // vmax)
        adim[cid] = (-(-ch // 8), -(-cw // 8))
    coefs: dict = {}  # (cid, block_index, k) -> accumulated value

    for scan, ss, se, ah, al, chunk_list, tabs in scans:
        st = {"ci": 0, "at": 0}

        def hop(n_hops):
            # restart boundary: check the marker cycle, move to the
            # next byte-aligned bit string
            assert st["ci"] + 1 < len(chunk_list), "oracle: missing RST"
            assert chunk_list[st["ci"]][1] == (n_hops - 1) % 8, (
                "oracle: RST sequence error"
            )
            st["ci"] += 1
            st["at"] = 0

        def bit():
            v = chunk_list[st["ci"]][0][st["at"]]
            st["at"] += 1
            return v == "1"

        def nbits(n):
            if n == 0:
                return 0
            s_ = chunk_list[st["ci"]][0]
            v = int(s_[st["at"]:st["at"] + n], 2)
            st["at"] += n
            return v

        def hread(codes):
            run = ""
            s_ = chunk_list[st["ci"]][0]
            while True:
                run += s_[st["at"]]
                st["at"] += 1
                if run in codes:
                    return codes[run]

        def extend(v, s):
            if s == 0:
                return 0
            return v if v >= (1 << (s - 1)) else v - (1 << s) + 1

        p1 = 1 << al

        def refine_one(cid, bi, k):
            cur = coefs.get((cid, bi, k), 0)
            if cur:
                if bit() and not (abs(cur) & p1):
                    coefs[(cid, bi, k)] = cur + (p1 if cur > 0 else -p1)
            return cur

        if se == 0:  # DC scan
            # order carries each block's unit ordinal (MCU index for
            # interleaved scans, block index otherwise) so the restart
            # hop fires once per dri units
            if len(scan) > 1:  # interleaved over the PADDED grids
                order = []
                for mcu in range(mcuy * mcux):
                    my, mx = mcu // mcux, mcu % mcux
                    for cid, dct, _a in scan:
                        h, v = fac[cid]
                        for bi2 in range(h * v):
                            order.append((
                                mcu, cid, dct,
                                (my * v + bi2 // h) * pbx[cid]
                                + mx * h + bi2 % h,
                            ))
            else:
                cid, dct, _a = scan[0]
                aby, abx = adim[cid]
                order = [
                    (r * abx + c, cid, dct, r * pbx[cid] + c)
                    for r in range(aby) for c in range(abx)
                ]
            if ah == 0:
                p0 = {cid: 0 for cid, _d, _a in scan}
                last_unit = 0
                for unit, cid, dct, bi in order:
                    if dri and unit != last_unit and unit % dri == 0:
                        hop(unit // dri)
                        p0 = {c2: 0 for c2, _d, _a in scan}
                    last_unit = unit
                    s = hread(tabs[(0, dct)])
                    p0[cid] += extend(nbits(s), s)
                    coefs[(cid, bi, 0)] = p0[cid] << al
            else:
                last_unit = 0
                for unit, cid, _dct, bi in order:
                    if dri and unit != last_unit and unit % dri == 0:
                        hop(unit // dri)
                    last_unit = unit
                    if bit():
                        coefs[(cid, bi, 0)] = (
                            coefs.get((cid, bi, 0), 0) | p1
                        )
            continue
        # AC scan: one component, raster over ACTUAL blocks
        assert len(scan) == 1, "oracle: interleaved AC scan"
        cid, _dct, act = scan[0]
        codes = tabs[(1, act)]
        aby, abx = adim[cid]
        eobrun = 0
        for r_ in range(aby):
            for c_ in range(abx):
                bi = r_ * pbx[cid] + c_
                unit = r_ * abx + c_
                if dri and unit and unit % dri == 0:
                    assert eobrun == 0, (
                        "oracle: EOB run crosses restart boundary"
                    )
                    hop(unit // dri)
                if ah == 0:  # first pass of this band
                    if eobrun:
                        eobrun -= 1
                        continue
                    k = ss
                    while k <= se:
                        rs = hread(codes)
                        rr, s = rs >> 4, rs & 15
                        if s == 0:
                            if rr == 15:
                                k += 16
                                continue
                            eobrun = (1 << rr) - 1 + nbits(rr)
                            break
                        k += rr
                        assert k <= se, "oracle: AC run past band"
                        coefs[(cid, bi, k)] = extend(nbits(s), s) << al
                        k += 1
                    continue
                # refinement pass
                if eobrun:
                    for k in range(ss, se + 1):
                        refine_one(cid, bi, k)
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = hread(codes)
                    rr, s = rs >> 4, rs & 15
                    newv = 0
                    if s == 0:
                        if rr != 15:
                            eobrun = (1 << rr) - 1 + nbits(rr)
                            for k2 in range(k, se + 1):
                                refine_one(cid, bi, k2)
                            break
                        # rr == 15: ZRL — skip 16 zero-history slots
                    else:
                        assert s == 1, "oracle: bad refinement symbol"
                        newv = p1 if bit() else -p1
                    while k <= se:
                        if refine_one(cid, bi, k) == 0:
                            if rr == 0:
                                break
                            rr -= 1
                        k += 1
                    if newv and k <= se:
                        coefs[(cid, bi, k)] = newv
                    k += 1

    luma_cid = comps[0][0]
    lh, lv = fac[luma_cid]
    assert (lh, lv) == (hmax, vmax), "oracle: luma not full-res"
    q = qt[tqof[luma_cid]]
    nby, nbx = mcuy * lv, mcux * lh
    grid = [[0] * (nbx * 8) for _ in range(nby * 8)]
    for by in range(nby):
        for bx in range(nbx):
            bi = by * pbx[luma_cid] + bx
            coef = [[0] * 8 for _ in range(8)]
            for k in range(64):
                v = coefs.get((luma_cid, bi, k), 0)
                if v:
                    r, c = zz[k]
                    coef[r][c] = v * q[r][c]
            tmp = [
                [
                    (
                        sum(coef[u][v2] * basis[v2][x] for v2 in range(8))
                        + 4096
                    )
                    >> 13
                    for x in range(8)
                ]
                for u in range(8)
            ]
            for y in range(8):
                for x in range(8):
                    px = (
                        (
                            sum(tmp[u][x] * basis[u][y] for u in range(8))
                            + 4096
                        )
                        >> 13
                    ) + 128
                    grid[by * 8 + y][bx * 8 + x] = min(255, max(0, px))
    return [row[:fw] for row in grid[:fh]]


def _oracle_jpeg_decode(b: bytes) -> list:
    """INDEPENDENT pure-Python baseline-JPEG decode for the oracle
    side: its own zigzag derivation, bit reader, canonical Huffman
    walk and integer-IDCT loops — no numpy, no code shared with
    rasters.jpeg_decode_pixels. Handles interleaved sampling factors
    1-2 (4:4:4 and 4:2:0 fixtures) and DRI/RSTn restart intervals
    (bit strings per restart segment, DC predictors reset). The only
    shared contract is the spec'd fixed-point basis formula
    round(8192 * a(v) * cos((2x+1)v pi/16)) and the (acc+4096)>>13
    two-pass rounding. Returns the Y-plane luma grid as a list of
    row lists."""
    import math as _math
    import struct as _struct

    basis = [
        [
            round(
                8192
                * (_math.sqrt(1.0 / 8.0) if v == 0 else 0.5)
                * _math.cos((2 * x + 1) * v * _math.pi / 16.0)
            )
            for x in range(8)
        ]
        for v in range(8)
    ]
    # independent zigzag derivation: diagonals ordered by sum, even
    # sums walk bottom-up, odd sums top-down
    zz = sorted(
        ((r, c) for r in range(8) for c in range(8)),
        key=lambda rc: (
            rc[0] + rc[1],
            rc[0] if (rc[0] + rc[1]) % 2 else rc[1],
        ),
    )
    assert b[:2] == b"\xff\xd8", "oracle: not a JPEG"
    pos, qt, huff, frame, scan = 2, {}, {}, None, None
    chunks = None  # [(entropy_bytes, rst_no_or_None), ...]
    dri = 0
    prog = False
    prog_scans = []  # (scan, ss, se, ah, al, bitstring, tables snapshot)
    while pos + 4 <= len(b):
        marker = b[pos + 1]
        if marker == 0xD9:
            break
        (ln,) = _struct.unpack(">H", b[pos + 2:pos + 4])
        seg = b[pos + 4:pos + 2 + ln]
        if marker == 0xDB:
            i = 0
            while i < len(seg):
                tq = seg[i] & 0x0F
                tab = [[0] * 8 for _ in range(8)]
                for k in range(64):
                    r, c = zz[k]
                    tab[r][c] = seg[i + 1 + k]
                qt[tq] = tab
                i += 65
        elif marker == 0xC4:
            i = 0
            while i < len(seg):
                cls, tid = seg[i] >> 4, seg[i] & 0x0F
                counts = list(seg[i + 1:i + 17])
                nv = sum(counts)
                vals = list(seg[i + 17:i + 17 + nv])
                # canonical codes as BIT STRINGS (a structurally
                # different reconstruction than the engine's)
                codes = {}
                code, vi = 0, 0
                for clen in range(1, 17):
                    for _ in range(counts[clen - 1]):
                        codes[format(code, "0{}b".format(clen))] = vals[vi]
                        code += 1
                        vi += 1
                    code <<= 1
                huff[(cls, tid)] = codes
                i += 17 + nv
        elif marker in (0xC0, 0xC1, 0xC2):
            fh, fw = _struct.unpack(">HH", seg[1:5])
            nc = seg[5]
            comps = [
                (seg[6 + 3 * ci], seg[7 + 3 * ci] >> 4,
                 seg[7 + 3 * ci] & 0x0F, seg[8 + 3 * ci])
                for ci in range(nc)
            ]
            frame = (fw, fh, comps)
            prog = marker == 0xC2
        elif marker == 0xDD:
            (dri,) = _struct.unpack(">H", seg[:2])
        elif marker == 0xDA:
            ns = seg[0]
            scan = [
                (seg[1 + 2 * ci], seg[2 + 2 * ci] >> 4,
                 seg[2 + 2 * ci] & 0x0F)
                for ci in range(ns)
            ]
            start = pos + 2 + ln
            chunks = []
            end = cstart = start
            while end + 1 < len(b):
                if b[end] == 0xFF and b[end + 1] != 0x00:
                    if 0xD0 <= b[end + 1] <= 0xD7:
                        chunks.append(
                            (b[cstart:end].replace(b"\xff\x00", b"\xff"),
                             b[end + 1] - 0xD0)
                        )
                        end = cstart = end + 2
                        continue
                    break
                end += 1
            chunks.append(
                (b[cstart:end].replace(b"\xff\x00", b"\xff"), None)
            )
            if prog:
                assert len(chunks) == 1 or dri, (
                    "oracle: RST in progressive without DRI"
                )
                prog_scans.append((
                    scan,
                    seg[1 + 2 * ns], seg[2 + 2 * ns],
                    seg[3 + 2 * ns] >> 4, seg[3 + 2 * ns] & 0x0F,
                    [
                        ("".join(format(x, "08b") for x in ent), m)
                        for ent, m in chunks
                    ],
                    dict(huff),  # tables as of THIS scan
                ))
            pos = end
            continue
        pos += 2 + ln
    fw, fh, comps = frame
    if prog:
        return _oracle_jpeg_progressive(
            fw, fh, comps, qt, prog_scans, basis, zz, dri
        )
    chunk_bits = [
        "".join(format(byte, "08b") for byte in ent) for ent, _m in chunks
    ]
    state = {"bits": chunk_bits[0], "at": 0, "chunk": 0}

    def next_chunk(expect_rst):
        # restart boundary: the previous chunk ended with RSTn — check
        # the 0-7 cycle and realign on the next chunk's bit string
        assert state["chunk"] + 1 < len(chunk_bits), "oracle: missing RST"
        assert chunks[state["chunk"]][1] == expect_rst % 8, (
            "oracle: RST sequence error"
        )
        state["chunk"] += 1
        state["bits"] = chunk_bits[state["chunk"]]
        state["at"] = 0

    def read_huff(codes):
        run = ""
        while True:
            run += state["bits"][state["at"]]
            state["at"] += 1
            if run in codes:
                return codes[run]

    def read_bits(n):
        if n == 0:
            return 0
        v = int(state["bits"][state["at"]:state["at"] + n], 2)
        state["at"] += n
        return v

    def extend(v, size):
        if size == 0:
            return 0
        return v if v >= (1 << (size - 1)) else v - (1 << size) + 1

    qt_of = {cid: tq for cid, _h, _v, tq in comps}
    fac_of = {cid: (ch, cv) for cid, ch, cv, _tq in comps}
    hmax = max(ch for _cid, ch, _cv, _tq in comps)
    vmax = max(cv for _cid, _ch, cv, _tq in comps)
    luma_cid = comps[0][0]
    assert fac_of[luma_cid] == (hmax, vmax), "oracle: luma not full-res"
    mcux = -(-fw // (8 * hmax))
    mcuy = -(-fh // (8 * vmax))
    pred = {cid: 0 for cid, _h, _v, _tq in comps}
    grid = [[0] * (mcux * hmax * 8) for _ in range(mcuy * vmax * 8)]
    for mcu in range(mcuy * mcux):
        if dri and mcu and mcu % dri == 0:
            next_chunk(mcu // dri - 1)
            for cid in pred:
                pred[cid] = 0
        my, mx = mcu // mcux, mcu % mcux
        for cid, dct, act in scan:
            q = qt[qt_of[cid]]
            ch, cv = fac_of[cid]
            for bi in range(ch * cv):
                coef = [[0] * 8 for _ in range(8)]
                s = read_huff(huff[(0, dct)])
                pred[cid] += extend(read_bits(s), s)
                r0, c0 = zz[0]
                coef[r0][c0] = pred[cid] * q[r0][c0]
                k = 1
                while k < 64:
                    rs = read_huff(huff[(1, act)])
                    if rs == 0x00:
                        break
                    if rs == 0xF0:
                        k += 16
                        continue
                    k += rs >> 4
                    size = rs & 0x0F
                    v = extend(read_bits(size), size)
                    r, c = zz[k]
                    coef[r][c] = v * q[r][c]
                    k += 1
                if cid != luma_cid:
                    continue
                tmp = [
                    [
                        (
                            sum(coef[u][v] * basis[v][x] for v in range(8))
                            + 4096
                        )
                        >> 13
                        for x in range(8)
                    ]
                    for u in range(8)
                ]
                by = my * vmax + bi // ch
                bx = mx * hmax + bi % ch
                for y in range(8):
                    for x in range(8):
                        px = (
                            (
                                sum(
                                    tmp[u][x] * basis[u][y]
                                    for u in range(8)
                                )
                                + 4096
                            )
                            >> 13
                        ) + 128
                        grid[by * 8 + y][bx * 8 + x] = min(255, max(0, px))
    return [row[:fw] for row in grid[:fh]]


def _oracle_gif_decode(b: bytes) -> list:
    """INDEPENDENT pure-Python GIF decode for the oracle side: its own
    LZW (dict of code -> byte list, deferred width bump written
    differently), palette walk, integer luma, and a closed-form
    4-pass de-interlace (cumulative pass sizes + per-pass arithmetic,
    not the engine's order-list build) — no numpy, no shared code
    with rasters.gif_decode_pixels beyond the format itself."""
    import struct as _struct

    assert b[:6] in (b"GIF87a", b"GIF89a"), "oracle: not a GIF"
    flags = b[10]
    pos = 13
    gct = []
    if flags & 0x80:
        glen = 2 << (flags & 0x07)
        for j in range(glen):
            gct.append(
                (b[pos + 3 * j], b[pos + 3 * j + 1], b[pos + 3 * j + 2])
            )
        pos += 3 * glen
    while b[pos] == 0x21:  # extensions
        pos += 2
        while b[pos] != 0:
            pos += 1 + b[pos]
        pos += 1
    assert b[pos] == 0x2C, "oracle: no image descriptor"
    _l, _t, w, h = _struct.unpack("<HHHH", b[pos + 1:pos + 9])
    iflags = b[pos + 9]
    pos += 10
    pal = gct
    if iflags & 0x80:
        plen = 2 << (iflags & 0x07)
        pal = [
            (b[pos + 3 * j], b[pos + 3 * j + 1], b[pos + 3 * j + 2])
            for j in range(plen)
        ]
        pos += 3 * plen
    mcs = b[pos]
    pos += 1
    data = bytearray()
    while b[pos] != 0:
        ln = b[pos]
        data += b[pos + 1:pos + 1 + ln]
        pos += 1 + ln
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    # bit stream LSB-first as one big int (structurally different from
    # the engine's accumulator reader)
    big = int.from_bytes(bytes(data), "little")
    nbits_total = 8 * len(data)
    at = 0
    width = mcs + 1
    table = {i: [i] for i in range(clear)}
    nxt = eoi + 1
    out: list = []
    prev = None
    while len(out) < w * h and at + width <= nbits_total:
        code = (big >> at) & ((1 << width) - 1)
        at += width
        if code == clear:
            table = {i: [i] for i in range(clear)}
            nxt = eoi + 1
            width = mcs + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table[code]
        elif code in table:
            entry = table[code]
            table[nxt] = prev + [entry[0]]
            nxt += 1
        else:
            entry = prev + [prev[0]]
            table[nxt] = entry
            nxt += 1
        out.extend(entry)
        prev = entry
        if nxt >= (1 << width) and width < 12:
            # nxt counts literals + the two reserved codes + added
            # entries — the decoder-visible table size
            width += 1
    if iflags & 0x40:
        # closed-form de-interlace: stored row n falls in the pass
        # whose cumulative size first exceeds n, then start + step *
        # offset (starts 0/4/2/1, steps 8/8/4/2)
        def screen_row(n):
            for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
                size = (h - start + step - 1) // step if h > start else 0
                if n < size:
                    return start + step * n
                n -= size
            raise AssertionError("oracle: interlace row out of range")
    else:
        def screen_row(n):
            return n
    grid = [[0] * w for _ in range(h)]
    for r in range(h):
        row = grid[screen_row(r)]
        for c in range(w):
            cr, cg, cb = pal[out[r * w + c]]
            row[c] = (299 * cr + 587 * cg + 114 * cb) // 1000
    return grid


def _raster_oracle_rows(fmt: str) -> list:
    """(media_id, w, h, luma_sum, n_px, dhash_unsigned) for every
    planted JPEG or GIF, via the independent decoders + independent
    dHash."""
    key = f"{fmt}_rows"
    if key not in _ORACLE_CACHE:
        from web_scrapper_spark.operators.multimodal import (
            planted_gif_media_rows,
            planted_jpeg_media_rows,
        )

        rows = (
            planted_jpeg_media_rows()
            if fmt == "jpeg"
            else planted_gif_media_rows()
        )
        dec = _oracle_jpeg_decode if fmt == "jpeg" else _oracle_gif_decode
        out = []
        for media_id, _kind, payload, _meta in rows:
            grid = dec(bytes(payload))
            h, w = len(grid), len(grid[0])
            out.append(
                (
                    media_id,
                    w,
                    h,
                    sum(sum(row) for row in grid),
                    h * w,
                    _oracle_dhash(grid),
                )
            )
        _ORACLE_CACHE[key] = out
    return _ORACLE_CACHE[key]


def _raster_decode_oracle_sql(fmt: str) -> str:
    rows = ",\n              ".join(
        f"({mid}, {w}, {h}, {ls}, {npx}, "
        f"{dh - (1 << 64) if dh >= (1 << 63) else dh})"
        for mid, w, h, ls, npx, dh in _raster_oracle_rows(fmt)
    )
    return (
        f"SELECT * FROM (VALUES {rows}) "
        "AS t(media_id, width, height, luma_sum, n_px, dhash)"
    )


def _raster_dhash_oracle_sql(fmt: str) -> str:
    hashes = [
        (mid, dh) for mid, _w, _h, _ls, _npx, dh in _raster_oracle_rows(fmt)
    ]
    values = []
    for ai in range(len(hashes)):
        for bi in range(ai + 1, len(hashes)):
            id_a, h_a = hashes[ai]
            id_b, h_b = hashes[bi]
            d = bin(h_a ^ h_b).count("1")
            if d <= 3:
                values.append(f"({id_a}, {id_b}, {d})")
    rows = ",\n              ".join(values)
    return f"SELECT * FROM (VALUES {rows}) AS t(id_a, id_b, hamming)"


def _oracle_gif_frames(b: bytes) -> list:
    """INDEPENDENT pure-Python animated-GIF compositor for the oracle
    side: its own block walk (GCE state machine written as a dict),
    big-int LZW reader, list-of-list RGB screens, closed-form 4-pass
    de-interlace and per-pixel compositing loops — no numpy, no code
    shared with rasters.gif_decode_frames beyond the format itself.
    Returns ``[(delay_cs, luma_grid_rows), ...]`` per rendered
    frame."""
    import struct as _struct

    assert b[:6] in (b"GIF87a", b"GIF89a"), "oracle: not a GIF"
    sw, sh = _struct.unpack("<HH", b[6:10])
    flags, bg_idx = b[10], b[11]
    pos = 13
    gct = None
    if flags & 0x80:
        glen = 2 << (flags & 0x07)
        gct = [
            (b[pos + 3 * j], b[pos + 3 * j + 1], b[pos + 3 * j + 2])
            for j in range(glen)
        ]
        pos += 3 * glen
    bg = gct[bg_idx] if gct is not None and bg_idx < len(gct) else (0, 0, 0)
    screen = [[bg for _ in range(sw)] for _ in range(sh)]
    gce = {"delay": 0, "disposal": 0, "transparent": None}
    frames = []

    def lzw(data, mcs, npx):
        clear, eoi = 1 << mcs, (1 << mcs) + 1
        big = int.from_bytes(bytes(data), "little")
        total, at, width = 8 * len(data), 0, mcs + 1
        table = {i: [i] for i in range(clear)}
        nxt, out, prev = eoi + 1, [], None
        while len(out) < npx and at + width <= total:
            code = (big >> at) & ((1 << width) - 1)
            at += width
            if code == clear:
                table = {i: [i] for i in range(clear)}
                nxt, width, prev = eoi + 1, mcs + 1, None
                continue
            if code == eoi:
                break
            if prev is None:
                entry = table[code]
            elif code in table:
                entry = table[code]
                table[nxt] = prev + [entry[0]]
                nxt += 1
            else:
                entry = prev + [prev[0]]
                table[nxt] = entry
                nxt += 1
            out.extend(entry)
            prev = entry
            if nxt >= (1 << width) and width < 12:
                width += 1
        assert len(out) >= npx, "oracle: LZW under-run"
        return out[:npx]

    def screen_row(n, fh, interlaced):
        if not interlaced:
            return n
        for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
            size = (fh - start + step - 1) // step if fh > start else 0
            if n < size:
                return start + step * n
            n -= size
        raise AssertionError("oracle: interlace row out of range")

    while pos < len(b):
        block = b[pos]
        if block == 0x3B:
            assert frames, "oracle: no image data"
            return frames
        if block == 0x21:
            label = b[pos + 1]
            pos += 2
            if label == 0xF9:
                gflags = b[pos + 1]
                gce = {
                    "delay": _struct.unpack("<H", b[pos + 2:pos + 4])[0],
                    "disposal": (gflags >> 2) & 0x07,
                    "transparent": b[pos + 4] if gflags & 0x01 else None,
                }
            while b[pos] != 0:
                pos += 1 + b[pos]
            pos += 1
            continue
        assert block == 0x2C, f"oracle: unexpected block 0x{block:02x}"
        left, top, fw, fh = _struct.unpack("<HHHH", b[pos + 1:pos + 9])
        iflags = b[pos + 9]
        pos += 10
        pal = gct
        if iflags & 0x80:
            plen = 2 << (iflags & 0x07)
            pal = [
                (b[pos + 3 * j], b[pos + 3 * j + 1], b[pos + 3 * j + 2])
                for j in range(plen)
            ]
            pos += 3 * plen
        mcs = b[pos]
        pos += 1
        data = bytearray()
        while b[pos] != 0:
            ln = b[pos]
            data += b[pos + 1:pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = lzw(data, mcs, fw * fh)
        saved = (
            [row[left:left + fw] for row in screen[top:top + fh]]
            if gce["disposal"] == 3
            else None
        )
        inter = bool(iflags & 0x40)
        for n in range(fh):
            r = top + screen_row(n, fh, inter)
            for c in range(fw):
                v = idx[n * fw + c]
                if v == gce["transparent"]:
                    continue
                screen[r][left + c] = pal[v]
        luma = [
            [(299 * p[0] + 587 * p[1] + 114 * p[2]) // 1000 for p in row]
            for row in screen
        ]
        frames.append((gce["delay"], luma))
        if gce["disposal"] == 2:
            for r in range(top, top + fh):
                for c in range(left, left + fw):
                    screen[r][c] = bg
        elif gce["disposal"] == 3:
            for n, row in enumerate(saved):
                screen[top + n][left:left + fw] = row
        gce = {"delay": 0, "disposal": 0, "transparent": None}
    raise AssertionError("oracle: truncated GIF (no trailer)")


def _anim_oracle_rows() -> list:
    """(media_id, frame_idx, delay_cs, w, h, luma_sum, n_px,
    dhash_unsigned) per rendered frame of every planted animation, via
    the independent compositor + independent dHash."""
    if "anim_rows" not in _ORACLE_CACHE:
        from web_scrapper_spark.operators.multimodal import (
            planted_gif_animation_rows,
        )

        out = []
        for media_id, _kind, payload, _meta in planted_gif_animation_rows():
            for fi, (delay, grid) in enumerate(
                _oracle_gif_frames(bytes(payload))
            ):
                h, w = len(grid), len(grid[0])
                out.append(
                    (
                        media_id,
                        fi,
                        delay,
                        w,
                        h,
                        sum(sum(row) for row in grid),
                        h * w,
                        _oracle_dhash(grid),
                    )
                )
        _ORACLE_CACHE["anim_rows"] = out
    return _ORACLE_CACHE["anim_rows"]


def _gif_frames_oracle_sql() -> str:
    rows = ",\n              ".join(
        f"({mid}, {fi}, {dl}, {w}, {h}, {ls}, {npx}, "
        f"{dh - (1 << 64) if dh >= (1 << 63) else dh})"
        for mid, fi, dl, w, h, ls, npx, dh in _anim_oracle_rows()
    )
    return (
        f"SELECT * FROM (VALUES {rows}) AS t(media_id, frame_idx, "
        "delay_cs, width, height, luma_sum, n_px, dhash)"
    )


def _gif_frame_dedup_oracle_sql() -> str:
    """Brute force over the independent compositor's frames: for every
    animation pair a < b, count frame pairs within Hamming 3 and take
    the minimum distance — the engine's blocked self-join must produce
    exactly these animation-grain rows."""
    rows = _anim_oracle_rows()
    agg: dict = {}
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            a, b = rows[i], rows[j]
            if a[0] == b[0]:
                continue
            d = bin(a[7] ^ b[7]).count("1")
            if d > 3:
                continue
            key = (min(a[0], b[0]), max(a[0], b[0]))
            cnt, mn = agg.get(key, (0, 99))
            agg[key] = (cnt + 1, min(mn, d))
    values = ",\n              ".join(
        f"({ma}, {mb}, {cnt}, {mn})"
        for (ma, mb), (cnt, mn) in sorted(agg.items())
    )
    return (
        f"SELECT * FROM (VALUES {values}) "
        "AS t(media_a, media_b, frames_matched, min_hamming)"
    )


def _oracle_apng_frames(b: bytes) -> list:
    """INDEPENDENT pure-Python APNG compositor for the oracle side:
    its own chunk walk, byte-list unfilter and per-pixel premultiplied
    Porter-Duff loops (no numpy, no code shared with
    multimodal.apng_decode_frames beyond stdlib zlib and the module's
    documented integer compositing contract). Returns
    ``[(delay_num, delay_den, luma_grid_rows), ...]``."""
    import struct as _struct
    import zlib as _zlib

    assert b[:8] == b"\x89PNG\r\n\x1a\n", "oracle: not a PNG"
    pos, hdr, actl = 8, None, None
    fctls = []
    default_in_anim = False
    while pos + 12 <= len(b):
        (clen,) = _struct.unpack(">I", b[pos:pos + 4])
        tag = b[pos + 4:pos + 8]
        data = b[pos + 8:pos + 8 + clen]
        if tag == b"IHDR":
            hdr = _struct.unpack(">IIBBBBB", data)
        elif tag == b"acTL":
            actl = _struct.unpack(">II", data)
        elif tag == b"fcTL":
            fctls.append([_struct.unpack(">IIIIIHHBB", data), b""])
        elif tag == b"IDAT":
            if fctls:
                default_in_anim = True
                fctls[0][1] += data
        elif tag == b"fdAT":
            fctls[-1][1] += data[4:]
        elif tag == b"IEND":
            break
        pos += 12 + clen
    w, h, depth, color, _c, _f, inter = hdr
    assert actl is not None and default_in_anim, "oracle: not an APNG"
    assert depth == 8 and color == 6 and inter == 0
    assert len(fctls) == actl[0], "oracle: frame count mismatch"

    # canvas: premultiplied (Pr, Pg, Pb, a) per pixel
    canvas = [[(0, 0, 0, 0)] * w for _ in range(h)]
    frames = []
    for idx, (f, blob) in enumerate(fctls):
        _sq, fw, fh, left, top, dnum, dden, dop, bop = f
        if idx == 0 and dop == 2:
            dop = 1
        raw = _zlib.decompress(blob)
        stride = fw * 4
        # unfilter (byte lists, bpp = 4)
        prev = [0] * stride
        rows = []
        at = 0
        for _r in range(fh):
            ft = raw[at]
            cur = raw[at + 1:at + 1 + stride]
            at += 1 + stride
            rec = [0] * stride
            for i in range(stride):
                a_ = rec[i - 4] if i >= 4 else 0
                up = prev[i]
                c_ = prev[i - 4] if i >= 4 else 0
                x = cur[i]
                if ft == 0:
                    v = x
                elif ft == 1:
                    v = x + a_
                elif ft == 2:
                    v = x + up
                elif ft == 3:
                    v = x + (a_ + up) // 2
                else:
                    pp = a_ + up - c_
                    pa, pb, pc = abs(pp - a_), abs(pp - up), abs(pp - c_)
                    pred = a_ if (pa <= pb and pa <= pc) else (
                        up if pb <= pc else c_
                    )
                    v = x + pred
                rec[i] = v & 0xFF
            prev = rec
            rows.append(rec)
        saved = None
        if dop == 2:
            saved = [
                canvas[top + r][left:left + fw] for r in range(fh)
            ]
        for r in range(fh):
            rec = rows[r]
            crow = canvas[top + r]
            for c in range(fw):
                sr, sg, sb2, sa = rec[4 * c:4 * c + 4]
                if bop == 0:
                    crow[left + c] = (sr * sa, sg * sa, sb2 * sa, sa)
                else:
                    pr, pg, pb2, da = crow[left + c]
                    inv = 255 - sa
                    crow[left + c] = (
                        sr * sa + pr * inv // 255,
                        sg * sa + pg * inv // 255,
                        sb2 * sa + pb2 * inv // 255,
                        sa + da * inv // 255,
                    )
        luma = [
            [
                (299 * p[0] + 587 * p[1] + 114 * p[2]) // 255000
                for p in row
            ]
            for row in canvas
        ]
        frames.append((dnum, dden, luma))
        if dop == 1:
            for r in range(fh):
                canvas[top + r][left:left + fw] = [(0, 0, 0, 0)] * fw
        elif dop == 2:
            for r in range(fh):
                canvas[top + r][left:left + fw] = saved[r]
    return frames


def _anim_mixed_oracle_rows() -> list:
    """(media_id, frame_idx, delay_cs, w, h, luma_sum, n_px,
    dhash_unsigned) per rendered frame of the mixed GIF/APNG fixture,
    via the independent compositors (+ the same delay normalization
    the engine documents: num*100//den, den 0 → 100)."""
    if "anim_mixed_rows" not in _ORACLE_CACHE:
        from web_scrapper_spark.operators.multimodal import (
            planted_anim_mixed_rows,
        )

        out = []
        for media_id, _kind, payload, _meta in planted_anim_mixed_rows():
            payload = bytes(payload)
            if payload[:6] in (b"GIF87a", b"GIF89a"):
                frames = [
                    (d, g) for d, g in _oracle_gif_frames(payload)
                ]
            else:
                frames = [
                    (num * 100 // (den or 100), g)
                    for num, den, g in _oracle_apng_frames(payload)
                ]
            for fi, (delay, grid) in enumerate(frames):
                h, w = len(grid), len(grid[0])
                out.append(
                    (
                        media_id,
                        fi,
                        delay,
                        w,
                        h,
                        sum(sum(row) for row in grid),
                        h * w,
                        _oracle_dhash(grid),
                    )
                )
        _ORACLE_CACHE["anim_mixed_rows"] = out
    return _ORACLE_CACHE["anim_mixed_rows"]


def _anim_mixed_frames_oracle_sql() -> str:
    rows = ",\n              ".join(
        f"({mid}, {fi}, {dl}, {w}, {h}, {ls}, {npx}, "
        f"{dh - (1 << 64) if dh >= (1 << 63) else dh})"
        for mid, fi, dl, w, h, ls, npx, dh in _anim_mixed_oracle_rows()
    )
    return (
        f"SELECT * FROM (VALUES {rows}) AS t(media_id, frame_idx, "
        "delay_cs, width, height, luma_sum, n_px, dhash)"
    )


def _anim_cross_dedup_oracle_sql() -> str:
    """Brute force over the mixed-container frames: animation pairs
    a < b with any frame pair within Hamming 3 — every GIF must pair
    with its APNG twin at min_hamming 0."""
    rows = _anim_mixed_oracle_rows()
    agg: dict = {}
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            a, b = rows[i], rows[j]
            if a[0] == b[0]:
                continue
            d = bin(a[7] ^ b[7]).count("1")
            if d > 3:
                continue
            key = (min(a[0], b[0]), max(a[0], b[0]))
            cnt, mn = agg.get(key, (0, 99))
            agg[key] = (cnt + 1, min(mn, d))
    values = ",\n              ".join(
        f"({ma}, {mb}, {cnt}, {mn})"
        for (ma, mb), (cnt, mn) in sorted(agg.items())
    )
    return (
        f"SELECT * FROM (VALUES {values}) "
        "AS t(media_a, media_b, frames_matched, min_hamming)"
    )


def _oracle_favicon_decode(b: bytes) -> list:
    """INDEPENDENT pure-Python BMP/ICO decode for the oracle side:
    its own header walks, per-pixel bit extraction for packed paletted
    rows and bottom-up row arithmetic written with byte loops — no
    numpy, no code shared with multimodal's BMP/ICO decoders. ICO
    entries that are PNGs route to the (also independent)
    _oracle_png_decode. Returns the luma grid as row lists."""
    import struct as _struct

    def dib(data: bytes, ico: bool) -> list:
        (hsize, w, h, _pl, bpp, comp, _isz, _xp, _yp, used, _imp) = (
            _struct.unpack("<IiiHHIIiiII", data[:40])
        )
        assert hsize >= 40 and comp == 0, "oracle: unsupported DIB"
        if ico:
            h //= 2
        top_down = h < 0
        h = abs(h)
        at = hsize
        pal = None
        if bpp <= 8:
            np_ = used or (1 << bpp)
            pal = [
                (data[at + 4 * j + 2], data[at + 4 * j + 1],
                 data[at + 4 * j])
                for j in range(np_)
            ]
            at += 4 * np_
        stride = ((w * bpp + 31) // 32) * 4
        grid = []
        for rr in range(h):
            src = rr if top_down else h - 1 - rr
            row_bytes = data[at + src * stride:at + (src + 1) * stride]
            row = []
            for c in range(w):
                if bpp in (24, 32):
                    nb = bpp // 8
                    b_ = row_bytes[c * nb]
                    g_ = row_bytes[c * nb + 1]
                    r_ = row_bytes[c * nb + 2]
                else:
                    off = c * bpp
                    byte = row_bytes[off // 8]
                    shift = 8 - bpp - (off % 8)
                    r_, g_, b_ = pal[(byte >> shift) & ((1 << bpp) - 1)]
                row.append((299 * r_ + 587 * g_ + 114 * b_) // 1000)
            grid.append(row)
        return grid

    if b[:2] == b"BM":
        return dib(b[14:], ico=False)
    assert b[:4] == b"\x00\x00\x01\x00", "oracle: not BMP/ICO"
    count = _struct.unpack("<H", b[4:6])[0]
    best = None
    for k in range(count):
        at = 6 + 16 * k
        w, h = b[at] or 256, b[at + 1] or 256
        size, off = _struct.unpack("<II", b[at + 8:at + 16])
        if best is None or w * h > best[0]:
            best = (w * h, off, size)
    blob = b[best[1]:best[1] + best[2]]
    if blob[:8] == b"\x89PNG\r\n\x1a\n":
        return _oracle_png_decode(blob)
    return dib(blob, ico=True)


def _favicon_oracle_rows() -> list:
    """(media_id, w, h, luma_sum, n_px, dhash_unsigned) for every
    planted BMP/ICO payload, via the independent decoder."""
    if "favicon_rows" not in _ORACLE_CACHE:
        from web_scrapper_spark.operators.multimodal import (
            planted_favicon_media_rows,
        )

        out = []
        for media_id, _kind, payload, _meta in planted_favicon_media_rows():
            grid = _oracle_favicon_decode(bytes(payload))
            h, w = len(grid), len(grid[0])
            out.append(
                (
                    media_id,
                    w,
                    h,
                    sum(sum(row) for row in grid),
                    h * w,
                    _oracle_dhash(grid),
                )
            )
        _ORACLE_CACHE["favicon_rows"] = out
    return _ORACLE_CACHE["favicon_rows"]


def _favicon_decode_oracle_sql() -> str:
    rows = ",\n              ".join(
        f"({mid}, {w}, {h}, {ls}, {npx}, "
        f"{dh - (1 << 64) if dh >= (1 << 63) else dh})"
        for mid, w, h, ls, npx, dh in _favicon_oracle_rows()
    )
    return (
        f"SELECT * FROM (VALUES {rows}) "
        "AS t(media_id, width, height, luma_sum, n_px, dhash)"
    )


def _favicon_dhash_oracle_sql() -> str:
    hashes = [
        (mid, dh) for mid, _w, _h, _ls, _npx, dh in _favicon_oracle_rows()
    ]
    values = []
    for ai in range(len(hashes)):
        for bi in range(ai + 1, len(hashes)):
            id_a, h_a = hashes[ai]
            id_b, h_b = hashes[bi]
            d = bin(h_a ^ h_b).count("1")
            if d <= 3:
                values.append(f"({id_a}, {id_b}, {d})")
    rows = ",\n              ".join(values)
    return f"SELECT * FROM (VALUES {rows}) AS t(id_a, id_b, hamming)"


def _psl_values_sql() -> str:
    from web_scrapper_spark.frontier.pld import PUBLIC_SUFFIXES

    return ", ".join(f"('{s}')" for s in PUBLIC_SUFFIXES)


_PLD_HOST_SQL = """CASE doc_id % 6
              WHEN 0 THEN 'www.h' || (doc_id % 20) || '.co.uk'
              WHEN 1 THEN 'a.b.h' || (doc_id % 20) || '.com'
              WHEN 2 THEN 'h' || (doc_id % 20) || '.github.io'
              WHEN 3 THEN 'shop.h' || (doc_id % 20) || '.com.au'
              WHEN 4 THEN 'b' || (doc_id % 20) || '.s3.amazonaws.com'
              ELSE 'h' || (doc_id % 20) || '.org' END"""


def _registered_domain_oracle_sql() -> str:
    """DuckDB twin of frontier/pld.registered_domain_col: longest
    listed public suffix strictly shorter than the host (relational
    arg-max over the same PUBLIC_SUFFIXES list), default rule m=1,
    degenerate hosts fall back to themselves."""
    return f"""
        WITH hosts AS (
          SELECT doc_id, {_PLD_HOST_SQL} AS host FROM documents
        ), psl(suffix) AS (
          VALUES {_psl_values_sql()}
        ), t AS (
          SELECT doc_id, host, string_split(host, '.') AS parts,
                 len(string_split(host, '.')) AS n
          FROM hosts
        ), m AS (
          SELECT t.doc_id,
                 max(len(string_split(p.suffix, '.'))) AS m
          FROM t JOIN psl p
            ON len(string_split(p.suffix, '.')) < t.n
           AND p.suffix = array_to_string(
                 t.parts[t.n - len(string_split(p.suffix, '.')) + 1 : t.n], '.')
          GROUP BY t.doc_id
        )
        SELECT t.doc_id, t.host,
               CASE WHEN t.n >= coalesce(m.m, 1) + 1
                    THEN array_to_string(
                      t.parts[t.n - coalesce(m.m, 1) : t.n], '.')
                    ELSE t.host END AS pld
        FROM t LEFT JOIN m ON m.doc_id = t.doc_id
    """


def _perceptron_oracle_sql(iters: int = 3, buckets: int = 128) -> str:
    """DuckDB replay of quality.perceptron_train + perceptron_score:
    the same hashed features (md5-bucket twin), the same y·margin ≤ 0
    update rule, the same integer arithmetic, unrolled as one CTE
    chain per iteration. The batch perceptron is order-independent, so
    engine-side parallel training and this sequential relational
    replay MUST agree bit-for-bit — that equality is the test."""
    head = f"""
        WITH toks AS (
          SELECT doc_id,
                 CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS y,
                 {_TOKS_SQL} AS t
          FROM documents
        ), bucketed AS (
          SELECT doc_id, y,
                 unnest(list_transform(
                   t, x -> ('0x' || substr(md5(x), 1, 15))::BIGINT % {buckets}
                 )) AS bucket
          FROM toks
        ), counted AS (
          SELECT doc_id, y, bucket, CAST(count(*) AS BIGINT) AS x
          FROM bucketed GROUP BY doc_id, y, bucket
        ), feats AS (
          SELECT * FROM counted
          UNION ALL
          SELECT DISTINCT doc_id, y,
                 CAST({buckets} AS BIGINT) AS bucket, CAST(1 AS BIGINT) AS x
          FROM counted
        ), w0 AS (
          SELECT CAST(NULL AS BIGINT) AS bucket, CAST(NULL AS BIGINT) AS w
          WHERE false
        )"""
    body = ""
    for t in range(1, iters + 1):
        body += f""", m{t} AS (
          SELECT f.doc_id, f.y,
                 CAST(coalesce(sum(w.w * f.x), 0) AS BIGINT) AS margin
          FROM feats f LEFT JOIN w{t - 1} w ON w.bucket = f.bucket
          GROUP BY f.doc_id, f.y
        ), d{t} AS (
          SELECT f.bucket, CAST(sum(f.y * f.x) AS BIGINT) AS dw
          FROM feats f JOIN m{t} m
            ON m.doc_id = f.doc_id AND m.y * m.margin <= 0
          GROUP BY f.bucket
        ), w{t} AS (
          SELECT coalesce(w.bucket, d.bucket) AS bucket,
                 CAST(coalesce(w.w, 0) + coalesce(d.dw, 0) AS BIGINT) AS w
          FROM w{t - 1} w FULL OUTER JOIN d{t} d ON w.bucket = d.bucket
        )"""
    tail = f"""
        SELECT f.doc_id,
               CAST(coalesce(sum(w.w * f.x), 0) AS BIGINT) AS margin,
               coalesce(sum(w.w * f.x), 0) > 0 AS perc_keep
        FROM feats f LEFT JOIN w{iters} w ON w.bucket = f.bucket
        GROUP BY f.doc_id
    """
    return head + body + tail


def _opic_oracle_sql() -> str:
    """DuckDB replay of graph.opic_epochs: identical integer cash
    mechanics (floor share, remainder to smallest outlink, dangling
    pool back to the seeds), unrolled one CTE block per epoch."""
    from web_scrapper_spark.operators.graph import OPIC_SCALE as S

    epochs, fanout, k = _OPIC["epochs"], _OPIC["fanout"], _OPIC["n_seeds"]
    js = ", ".join(str(j) for j in range(fanout))
    sql = f"""
        WITH params AS (SELECT count(*) + 20 AS n FROM documents),
        edges AS (
          SELECT DISTINCT doc_id AS _s,
                 ('0x' || substr(md5(doc_id || '|' || j), 1, 15))::BIGINT
                   % (SELECT n FROM params) AS _d
          FROM documents, unnest([{js}]) AS t(j)
        ),
        edeg AS (
          SELECT _s, _d,
                 count(*) OVER (PARTITION BY _s) AS _deg,
                 min(_d) OVER (PARTITION BY _s) AS _first
          FROM edges
        ),
        srcs AS (SELECT DISTINCT _s FROM edges),
        seedt AS (SELECT doc_id AS node FROM documents WHERE doc_id < {k}),
        s0 AS (
          SELECT node,
                 CAST({S} // {k}
                   + CASE WHEN node = 0 THEN {S} % {k} ELSE 0 END AS BIGINT)
                   AS cash,
                 CAST(0 AS BIGINT) AS history
          FROM seedt
        )"""
    for t in range(1, epochs + 1):
        sql += f""",
        a{t} AS (SELECT * FROM s{t - 1} WHERE cash > 0),
        f{t} AS (
          SELECT e._d AS node,
                 CAST(sum(a.cash // e._deg
                     + CASE WHEN e._d = e._first
                            THEN a.cash % e._deg ELSE 0 END) AS BIGINT) AS _in
          FROM a{t} a JOIN edeg e ON e._s = a.node
          GROUP BY e._d
        ),
        p{t} AS (
          SELECT CAST(coalesce(sum(cash), 0) AS BIGINT) AS pool
          FROM a{t} WHERE node NOT IN (SELECT _s FROM srcs)
        ),
        si{t} AS (
          SELECT s.node,
                 CAST(p.pool // {k}
                   + CASE WHEN s.node = 0 THEN p.pool % {k} ELSE 0 END
                   AS BIGINT) AS _in
          FROM seedt s CROSS JOIN p{t} p
        ),
        i{t} AS (
          SELECT node, CAST(sum(_in) AS BIGINT) AS _in
          FROM (SELECT * FROM f{t} UNION ALL SELECT * FROM si{t})
          GROUP BY node
        ),
        s{t} AS (
          SELECT coalesce(s.node, i.node) AS node,
                 CAST(coalesce(i._in, 0) AS BIGINT) AS cash,
                 CAST(coalesce(s.history, 0) + coalesce(s.cash, 0) AS BIGINT)
                   AS history
          FROM s{t - 1} s FULL OUTER JOIN i{t} i ON i.node = s.node
        )"""
    return sql + f"""
        SELECT node AS doc_id, cash, history FROM s{epochs}"""


def _hits_oracle_sql() -> str:
    """DuckDB replay of graph.hits: same distinct edges, same integer
    half-steps, same max-rescale (window max stands in for the 1-row
    cross join), unrolled per iteration."""
    from web_scrapper_spark.operators.graph import HITS_SCALE as S

    iters, fanout = _HITS["iters"], _HITS["fanout"]
    js = ", ".join(str(j) for j in range(fanout))
    sql = f"""
        WITH params AS (SELECT count(*) AS n FROM documents),
        edges AS (
          SELECT DISTINCT doc_id AS _s,
                 ('0x' || substr(md5(doc_id || '|' || j), 1, 15))::BIGINT
                   % (SELECT n FROM params) AS _d
          FROM documents, unnest([{js}]) AS t(j)
        ),
        nodes AS (
          SELECT _s AS node FROM edges UNION SELECT _d FROM edges
        ),
        s0 AS (
          SELECT node, CAST({S} AS BIGINT) AS hub, CAST({S} AS BIGINT) AS auth
          FROM nodes
        )"""
    prev = "s0"
    for t in range(1, iters + 1):
        sql += f""",
        ar{t} AS (
          SELECT e._d AS node, CAST(sum(s.hub) AS BIGINT) AS raw
          FROM edges e JOIN {prev} s ON s.node = e._s
          GROUP BY e._d
        ),
        sa{t} AS (
          SELECT node, hub,
                 CAST(CASE WHEN mx > 0 THEN raw * {S} // mx ELSE 0 END AS BIGINT)
                   AS auth
          FROM (
            SELECT s.node, s.hub, coalesce(a.raw, 0) AS raw,
                   max(coalesce(a.raw, 0)) OVER () AS mx
            FROM {prev} s LEFT JOIN ar{t} a ON a.node = s.node
          )
        ),
        hr{t} AS (
          SELECT e._s AS node, CAST(sum(s.auth) AS BIGINT) AS raw
          FROM edges e JOIN sa{t} s ON s.node = e._d
          GROUP BY e._s
        ),
        s{t} AS (
          SELECT node,
                 CAST(CASE WHEN mx > 0 THEN raw * {S} // mx ELSE 0 END AS BIGINT)
                   AS hub,
                 auth
          FROM (
            SELECT s.node, s.auth, coalesce(h.raw, 0) AS raw,
                   max(coalesce(h.raw, 0)) OVER () AS mx
            FROM sa{t} s LEFT JOIN hr{t} h ON h.node = s.node
          )
        )"""
        prev = f"s{t}"
    return sql + f"""
        SELECT node, hub, auth FROM {prev}"""


def _excerpt_oracle_sql() -> str:
    """DuckDB twin of textops.excerpt_pairs over the planted corpus:
    the shared winnow CTE chain re-pointed at documents ∪ planted
    excerpts, then df gate, directional fp join, and the containment
    arg in the same integer centi."""
    cte = _WINNOW_FPS_CTE.replace(
        "FROM documents",
        """FROM (
                SELECT doc_id, text FROM documents
                UNION ALL
                SELECT doc_id + 100000 AS doc_id, substr(text, 1, 200) AS text
                FROM documents WHERE doc_id % 10 = 0
              )""",
    )
    return f"""
        WITH {cte}, fpd AS (
          SELECT DISTINCT doc_id, unnest(mins) AS fp FROM fps
        ), rare AS (
          SELECT fp FROM fpd GROUP BY fp HAVING count(*) <= 50
        ), gated AS (
          SELECT fpd.doc_id, fpd.fp FROM fpd JOIN rare USING (fp)
        ), sizes AS (
          SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fps_excerpt
          FROM gated GROUP BY doc_id
        ), shared AS (
          SELECT a.doc_id AS excerpt_id, b.doc_id AS source_id,
                 CAST(count(*) AS BIGINT) AS shared_fps
          FROM gated a JOIN gated b
            ON a.fp = b.fp AND a.doc_id <> b.doc_id
          GROUP BY 1, 2
        )
        SELECT s.excerpt_id, s.source_id, s.shared_fps, z.n_fps_excerpt,
               CAST(s.shared_fps * 100 // z.n_fps_excerpt AS BIGINT)
                 AS containment_centi
        FROM shared s JOIN sizes z ON z.doc_id = s.excerpt_id
        WHERE z.n_fps_excerpt >= 3
          AND s.shared_fps * 100 // z.n_fps_excerpt >= 80
    """


def _audio_oracle_sql() -> str:
    """Brute-force expected audio near-pairs (shared pure fixture +
    hash, plain int Hamming, independent of the pigeonhole blocking),
    frozen into a VALUES table."""
    if "audio" not in _ORACLE_CACHE:
        from web_scrapper_spark.operators.multimodal import (
            planted_wav_media_rows,
            wav_energy_hash64,
        )

        mask = (1 << 64) - 1
        hashes = [
            (media_id, wav_energy_hash64(payload) & mask)
            for media_id, _k, payload, _m in planted_wav_media_rows(n=64)
        ]
        values = []
        for ai in range(len(hashes)):
            for bi in range(ai + 1, len(hashes)):
                id_a, h_a = hashes[ai]
                id_b, h_b = hashes[bi]
                d = bin(h_a ^ h_b).count("1")
                if d <= 7:
                    values.append(f"({id_a}, {id_b}, {d})")
        rows = ",\n              ".join(values)
        _ORACLE_CACHE["audio"] = (
            f"SELECT * FROM (VALUES {rows}) AS t(id_a, id_b, hamming)"
        )
    return _ORACLE_CACHE["audio"]


def _ua_pool_sql() -> str:
    from web_scrapper_spark.crawl.fetchpolicy import DEFAULT_USER_AGENTS

    quoted = ", ".join("'" + u.replace("'", "''") + "'" for u in DEFAULT_USER_AGENTS)
    return f"[{quoted}]"


_MD5_IDX_SQL = "(('0x' || substr(md5({x}), 1, 15))::BIGINT % 2147483647) % {n}"


def _s3_ua_rotation_sql() -> str:
    """DuckDB twin of crawl/fetchpolicy.user_agent_col (hash and
    sequential modes, epoch=3, 12-entry default pool)."""
    idx = _MD5_IDX_SQL.format(x="url || ':3'", n=12)
    return f"""
        WITH reqs AS (
          SELECT doc_id,
                 'https://h' || (doc_id % 8) || '.example.org/p/' || doc_id AS url,
                 'h' || (doc_id % 8) || '.example.org' AS host
          FROM documents
        ), ranked AS (
          SELECT doc_id, url, host,
                 row_number() OVER (PARTITION BY host ORDER BY doc_id) AS host_rank
          FROM reqs
        )
        SELECT doc_id,
               list_extract({_ua_pool_sql()}, CAST({idx} AS INT) + 1) AS ua_hash,
               list_extract({_ua_pool_sql()}, CAST((host_rank - 1 + 3) % 12 AS INT) + 1) AS ua_seq
        FROM ranked
    """


def _s2_fetch_session_sql() -> str:
    """DuckDB twin of crawl/fetchpolicy.with_fetch_metadata (epoch=5,
    3-proxy pool, Accept/Accept-Language headers + 2 cookies)."""
    ua_idx = _MD5_IDX_SQL.format(x="url || ':5'", n=12)
    proxy_idx = _MD5_IDX_SQL.format(x="host", n=3)
    crlf = "chr(13) || chr(10)"
    return f"""
        WITH reqs AS (
          SELECT doc_id,
                 'https://h' || (doc_id % 8) || '.example.org/p/' || doc_id AS url,
                 'h' || (doc_id % 8) || '.example.org' AS host
          FROM documents
        )
        SELECT doc_id,
               substr(md5(host || ':5'), 1, 16) AS session_id,
               list_extract(['http://egress-a:3128', 'http://egress-b:3128',
                             'http://egress-c:3128'],
                            CAST({proxy_idx} AS INT) + 1) AS proxy,
               'Accept: text/html' || {crlf} ||
               'Accept-Language: en' || {crlf} ||
               'Cookie: region=eu; sid=abc' || {crlf} ||
               'User-Agent: ' ||
               list_extract({_ua_pool_sql()}, CAST({ua_idx} AS INT) + 1) AS header_line
        FROM reqs
    """


# CDC chunk CTE chain shared by the cdc_chunks / cdc_dedup oracles:
# the LBFS hash-boundary rule (cut after a 16-char window whose
# 60-bit md5 hash ≡ 0 mod 64) replayed cut-for-cut.
_CDC_CHUNK_CTES = f"""salted AS (
              SELECT doc_id, text || ' ' || '{_CDC_BOILER}' AS text
              FROM documents
            ), t AS (
              SELECT doc_id, text, length(text) AS n FROM salted
            ), cand AS (
              SELECT doc_id, text, n,
                     CASE WHEN n >= 16 THEN
                       list_filter(generate_series(1, n - 15),
                         i -> ('0x' || substr(md5(substr(text, i, 16)), 1, 15))::BIGINT
                              % 64 = 0)
                     ELSE [] END AS cand
              FROM t
            ), cutsq AS (
              SELECT doc_id, text, n,
                     list_filter(list_transform(cand, i -> i + 15),
                                 c -> c < n) AS cuts
              FROM cand
            ), spans AS (
              SELECT doc_id, text,
                     [0] || cuts AS starts, cuts || [n] AS ends
              FROM cutsq WHERE n > 0
            ), ex AS (
              SELECT doc_id, text,
                     unnest(list_transform(generate_series(1, len(starts)),
                       j -> struct_pack(idx := j - 1,
                                        s := starts[j],
                                        e := ends[j]))) AS u
              FROM spans
            ), chunkq AS (
              SELECT doc_id,
                     CAST(u.idx AS BIGINT) AS chunk_idx,
                     CAST(u.s AS BIGINT) AS start_pos,
                     CAST(u.e - u.s AS BIGINT) AS n_chars,
                     md5(substr(text, u.s + 1, u.e - u.s)) AS chunk_md5
              FROM ex
            )"""


def oracle_sql() -> dict[str, str]:
    # 3-word shingles matching dedup.shingles_col(text, 3)
    shingles1 = f"""list_sort(list_distinct(list_filter(
        CASE WHEN len({_TOKS_SQL}) < 3 THEN [array_to_string({_TOKS_SQL}, ' ')]
             ELSE list_transform(generate_series(1, len({_TOKS_SQL}) - 2),
                                 i -> array_to_string(({_TOKS_SQL})[i:i+2], ' ')) END,
        x -> x <> '')))"""
    # MinHash/LSH candidate-pair CTE chain shared by the
    # dedup_minhash_lsh and dedup_components oracles (mh_pairs yields
    # id_a, id_b, inter_size, union_size at the 0.4-Jaccard gate).
    mh_pair_ctes = f"""sh AS (
              SELECT doc_id, {shingles1} AS s FROM documents
              WHERE len({_TOKS_SQL}) > 0
            ), hb AS (
              SELECT doc_id, s,
                     list_transform(
                       s, x -> ('0x' || substr(md5(x), 1, 15))::BIGINT % {_MH_P}
                     ) AS h
              FROM sh
            ), sig AS (
              SELECT doc_id, s,
                     {_mh_sql_cols(4)}
              FROM hb
            ), cand AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.s AS sa, b.s AS sb
              FROM sig a JOIN sig b ON a.doc_id < b.doc_id
               AND (a.mh0 = b.mh0 OR a.mh1 = b.mh1 OR a.mh2 = b.mh2 OR a.mh3 = b.mh3)
            ), mh_pairs AS (
              SELECT id_a, id_b,
                     len(list_intersect(sa, sb)) AS inter_size,
                     len(list_distinct(sa || sb)) AS union_size
              FROM cand
              WHERE len(list_intersect(sa, sb)) * 5 >= len(list_distinct(sa || sb)) * 2
            )"""
    out = {
        "a1_keywords_topk": f"""
            WITH words AS (
              SELECT unnest({_TOKS_SQL}) AS word FROM documents
            )
            SELECT word, count(*) AS freq FROM words
            WHERE length(word) > 2 AND word NOT IN ({_STOPLIST_SQL})
            GROUP BY word ORDER BY freq DESC, word ASC LIMIT 20
        """,
        "a1_doc_keywords_topk": f"""
            WITH words AS (
              SELECT doc_id, unnest({_TOKS_SQL}) AS word FROM documents
            ), counts AS (
              SELECT doc_id, word, count(*) AS freq FROM words
              WHERE length(word) > 2 AND word NOT IN ({_STOPLIST_SQL})
              GROUP BY doc_id, word
            )
            SELECT doc_id, word, freq,
                   row_number() OVER (PARTITION BY doc_id ORDER BY freq DESC, word ASC) AS rank
            FROM counts QUALIFY rank <= 3
        """,
        "a2_doc_stats": f"""
            SELECT doc_id,
                   len({_TOKS_SQL}) AS word_count,
                   length(text) AS char_count,
                   length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS punct_count,
                   len(list_filter({_TOKS_SQL}, x -> x IN ({_STOPLIST_SQL}))) AS stop_hits,
                   greatest(1, CAST(round(len({_TOKS_SQL}) / 200.0) AS INT)) AS reading_time_min
            FROM documents
        """,
        "lang_id": _lang_id_sql(),
        "paragraph_lang": _paragraph_lang_sql(),
        "line_dedup": """
            WITH salted AS (
              SELECT doc_id,
                     text || chr(10) || 'Repeated chrome line.'
                          || chr(10) || 'REPEATED  chrome LINE.'
                          || chr(10) || text AS text
              FROM documents
            ), split AS (
              SELECT doc_id, string_split(text, chr(10)) AS l FROM salted
            ), paras AS (
              SELECT doc_id,
                     unnest(list_transform(generate_series(1, len(l)),
                                           i -> struct_pack(idx := i, p := l[i]))) AS u
              FROM split
            ), lines AS (
              SELECT doc_id, u.idx AS idx, trim(u.p) AS line
              FROM paras WHERE trim(u.p) <> ''
            ), keyed AS (
              SELECT doc_id, idx, line,
                     trim(regexp_replace(lower(line), '\\s+', ' ', 'g')) AS k
              FROM lines
            ), ranked AS (
              SELECT doc_id, idx, line,
                     row_number() OVER (PARTITION BY doc_id, k
                                        ORDER BY idx) AS rn
              FROM keyed
            )
            SELECT doc_id,
                   CAST(count(*) AS BIGINT) AS n_lines,
                   CAST(count(*) -
                        sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_dropped,
                   coalesce(string_agg(CASE WHEN rn = 1 THEN line END,
                                       chr(10) ORDER BY idx), '') AS text_fixed
            FROM ranked GROUP BY doc_id
        """,
        "tok_bpe": f"""
            SELECT doc_id,
                   len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^\\sA-Za-z0-9]')) AS bpe_token_count,
                   len({_TOKS_SQL}) AS word_token_count
            FROM documents
        """,
        "fingerprint_md5": """
            SELECT doc_id, md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint
            FROM documents
        """,
        "fingerprint_winnow": f"""
            WITH {_WINNOW_FPS_CTE}
            SELECT doc_id, unnest(list_distinct(mins)) AS fp FROM fps
        """,
        "winnow_overlap_pairs": f"""
            WITH {_WINNOW_FPS_CTE},
            fpx AS (
              SELECT doc_id, unnest(list_distinct(mins)) AS fp FROM fps
            ), rare AS (
              SELECT fp FROM fpx GROUP BY fp HAVING count(*) <= 50
            ), fpr AS (
              SELECT fpx.doc_id, fpx.fp FROM fpx JOIN rare USING (fp)
            )
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   CAST(count(*) AS BIGINT) AS shared_fps
            FROM fpr a JOIN fpr b USING (fp)
            WHERE a.doc_id < b.doc_id
            GROUP BY 1, 2
            HAVING count(*) >= 2
        """,
        "pii_redact": """
            WITH salted AS (
              SELECT doc_id,
                     text || ' Contact user' || CAST(doc_id AS VARCHAR) ||
                     '@mail.example.org or (555) 867-' ||
                     lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
                     ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.' ||
                     CAST(doc_id % 100 AS VARCHAR) ||
                     ' card 4111 1111 1111 ' ||
                     lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t0
              FROM documents
            ), s1 AS (
              SELECT doc_id, t0,
                     CAST(len(regexp_extract_all(t0, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
                     regexp_replace(t0, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t1
              FROM salted
            ), s2 AS (
              SELECT doc_id, n_email,
                     CAST(len(regexp_extract_all(t1, '\\b\\d{4}[ -]\\d{4}[ -]\\d{4}[ -]\\d{4}\\b')) AS BIGINT) AS n_cc,
                     regexp_replace(t1, '\\b\\d{4}[ -]\\d{4}[ -]\\d{4}[ -]\\d{4}\\b', '<CC>', 'g') AS t2
              FROM s1
            ), s3 AS (
              SELECT doc_id, n_email, n_cc,
                     CAST(len(regexp_extract_all(t2, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS BIGINT) AS n_ip,
                     regexp_replace(t2, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IP>', 'g') AS t3
              FROM s2
            )
            SELECT doc_id,
                   regexp_replace(t3, '\\(\\d{3}\\) ?\\d{3}-\\d{4}|\\+\\d{1,2}[ -]\\d{3}[ -]\\d{3}[ -]\\d{4}\\b', '<PHONE>', 'g') AS redacted,
                   n_email, n_cc, n_ip,
                   CAST(len(regexp_extract_all(t3, '\\(\\d{3}\\) ?\\d{3}-\\d{4}|\\+\\d{1,2}[ -]\\d{3}[ -]\\d{3}[ -]\\d{4}\\b')) AS BIGINT) AS n_phone
            FROM s3
        """,
        "gopher_quality": _gopher_oracle_sql(),
        "lexicon_gate": f"""
            WITH t AS (
              SELECT doc_id,
                     regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
              FROM documents
            ), c AS (
              SELECT doc_id,
                     CAST(len(toks) AS BIGINT) AS n_tokens,
                     CAST(len(list_filter(toks,
                          x -> x IN ({_LEX_IN_SQL}))) AS BIGINT) AS n_hits
              FROM t
            ), f AS (
              SELECT doc_id, n_tokens, n_hits,
                     CAST(CASE WHEN n_tokens > 0
                          THEN floor(n_hits * 1000000.0 / n_tokens)
                          ELSE 0 END AS BIGINT) AS hit_frac_ppm
              FROM c
            )
            SELECT doc_id, n_tokens, n_hits, hit_frac_ppm,
                   hit_frac_ppm >= {_LEX_FLAG_PPM} AS flagged
            FROM f
        """,
        "domain_blocklist": """
            WITH pages AS (
              SELECT doc_id,
                     CASE doc_id % 5
                       WHEN 0 THEN 'evil.com'
                       WHEN 1 THEN 'ads.evil.com'
                       WHEN 2 THEN 'notevil.com'
                       WHEN 3 THEN 'cdn.tracker.net'
                       ELSE 'h' || CAST(doc_id % 7 AS VARCHAR) || '.org'
                     END AS host
              FROM documents
            ), flagged AS (
              SELECT doc_id, host,
                     CASE WHEN host = 'evil.com'
                               OR host LIKE '%.evil.com' THEN 'evil.com'
                          WHEN host = 'tracker.net'
                               OR host LIKE '%.tracker.net' THEN 'tracker.net'
                     END AS blocked_by
              FROM pages
            )
            SELECT doc_id,
                   'https://' || host || '/p/' || CAST(doc_id AS VARCHAR) AS url,
                   host, blocked_by,
                   blocked_by IS NOT NULL AS blocked
            FROM flagged
        """,
        "ucb_budget": """
            WITH stats AS (
              SELECT 'h' || CAST(doc_id % 13 AS VARCHAR) AS host,
                     CAST(count(*) AS BIGINT) AS n_fetched,
                     CAST(sum(CASE WHEN n_chars % 3 = 0 THEN 1 ELSE 0 END)
                          AS BIGINT) AS n_yield
              FROM documents GROUP BY 1
            ), tot AS (
              SELECT CAST(sum(n_fetched) AS BIGINT) AS n_total FROM stats
            ), r0 AS (
              -- floor(log2 N) via bit length; radicand exact in BIGINT
              -- before the (double) division, mirroring the Spark fold
              SELECT host, n_fetched, n_yield,
                     CAST(floor(n_yield * 1000000.0 / n_fetched)
                          AS BIGINT) AS mean_yield_ppm,
                     CAST(floor(
                       (length(to_base((SELECT n_total FROM tot), 2)) - 1)
                       * 1000000000000 * 1.0 / n_fetched)
                          AS BIGINT) AS radicand
              FROM stats
            ), i1 AS (
              SELECT *, CAST(floor(sqrt(CAST(radicand AS DOUBLE)))
                             AS BIGINT) AS s0
              FROM r0
            ), i2 AS (
              SELECT *, CASE WHEN (s0 + 1) * (s0 + 1) <= radicand
                             THEN s0 + 1 ELSE s0 END AS s1
              FROM i1
            ), i3 AS (
              SELECT *, CASE WHEN s1 * s1 > radicand
                             THEN s1 - 1 ELSE s1 END AS s
              FROM i2
            ), scored AS (
              SELECT host, n_fetched, n_yield, mean_yield_ppm,
                     CAST(floor(1414214 * s * 1.0 / 1000000)
                          AS BIGINT) AS explore_ppm,
                     mean_yield_ppm
                       + CAST(floor(1414214 * s * 1.0 / 1000000)
                              AS BIGINT) AS ucb_ppm
              FROM i3
            ), t2 AS (
              SELECT CAST(sum(ucb_ppm) AS BIGINT) AS tot FROM scored
            ), wb AS (
              SELECT *, ucb_ppm * 1000 AS raw,
                     CAST(floor(ucb_ppm * 1000 * 1.0
                                / (SELECT tot FROM t2)) AS BIGINT) AS base
              FROM scored
            ), wr AS (
              SELECT *, raw - base * (SELECT tot FROM t2) AS rem FROM wb
            ), sf AS (
              SELECT 1000 - CAST(sum(base) AS BIGINT) AS shortfall FROM wr
            ), rk AS (
              SELECT *, row_number() OVER (
                ORDER BY rem DESC, ucb_ppm DESC, host ASC) AS rk
              FROM wr
            )
            SELECT host, n_fetched, n_yield, mean_yield_ppm, explore_ppm,
                   ucb_ppm,
                   CAST(base + CASE WHEN rk <= (SELECT shortfall FROM sf)
                                    THEN 1 ELSE 0 END AS BIGINT) AS budget
            FROM rk
        """,
        "host_communities": _lpa_oracle_sql(),
        "cdc_chunks": f"""
            WITH {_CDC_CHUNK_CTES}
            SELECT doc_id, chunk_idx, start_pos, n_chars, chunk_md5
            FROM chunkq
        """,
        "cdc_dedup": f"""
            WITH {_CDC_CHUNK_CTES},
            per AS (
              SELECT chunk_md5,
                     CAST(count(*) AS BIGINT) AS copies,
                     CAST(min(n_chars) AS BIGINT) AS n_chars
              FROM chunkq GROUP BY 1
            )
            SELECT CAST(sum(copies) AS BIGINT) AS total_chunks,
                   CAST(count(*) AS BIGINT) AS distinct_chunks,
                   CAST(sum(copies * n_chars) AS BIGINT) AS total_chars,
                   CAST(sum(n_chars) AS BIGINT) AS stored_chars,
                   CAST(floor(sum(n_chars) * 1000000.0
                              / sum(copies * n_chars)) AS BIGINT) AS stored_ppm
            FROM per
        """,
        "zorder_skip": """
            WITH dims AS (
              SELECT doc_id,
                     CAST(doc_id % 32 AS BIGINT) AS x,
                     CAST(floor(doc_id / 32.0) AS BIGINT) & 31 AS y
              FROM documents
            ), keyed AS (
              SELECT *,
                     list_sum(list_transform(generate_series(0, 4),
                       i -> (((x >> i) & 1) << (2 * i))
                          + (((y >> i) & 1) << (2 * i + 1)))) AS zkey
              FROM dims
            ), filed AS (
              SELECT *, ntile(16) OVER (ORDER BY zkey, doc_id) - 1 AS zfile
              FROM keyed
            )
            SELECT CAST(zfile AS BIGINT) AS zfile,
                   CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(min(x) AS BIGINT) AS min_x,
                   CAST(max(x) AS BIGINT) AS max_x,
                   CAST(min(y) AS BIGINT) AS min_y,
                   CAST(max(y) AS BIGINT) AS max_y
            FROM filed GROUP BY 1
        """,
        # plain (non-f) string: literal '{' below must not interpolate
        "c4_clean": """
            WITH salted AS (
              SELECT doc_id,
                     text || chr(10) || 'Short line' || chr(10) ||
                     'This sentence number ' || CAST(doc_id AS VARCHAR) ||
                     ' is properly terminated.' || chr(10) ||
                     'Beware javascript code here today.' || chr(10) ||
                     'Another good sentence follows here!' || chr(10) ||
                     'The quick brown fox jumps over the lazy dog.' || chr(10) ||
                     CASE WHEN doc_id % 7 = 0 THEN 'lorem ipsum dolor sit amet.'
                          ELSE 'A clean closing line comes here?' END || chr(10) ||
                     CASE WHEN doc_id % 11 = 0 THEN 'code ' || chr(123) || ' block ' || chr(125)
                          ELSE 'The final sentence stands well.' END AS text
              FROM documents
            ), base AS (
              SELECT doc_id, text,
                     list_transform(string_split(text, chr(10)), x -> trim(x)) AS lines
              FROM salted
            ), feat AS (
              SELECT doc_id, text, lines,
                     list_filter(lines, l ->
                       len(list_filter(string_split_regex(l, '\\s+'), w -> w <> '')) >= 3
                       AND regexp_matches(l, '[.!?"]$')
                       AND NOT contains(lower(l), 'javascript')) AS kept
              FROM base
            ), agg AS (
              SELECT doc_id, text,
                     len(lines) AS line_count,
                     len(kept) AS kept_line_count,
                     len(list_filter(lines, l ->
                       len(list_filter(string_split_regex(l, '\\s+'), w -> w <> '')) < 3)) AS short_dropped,
                     len(list_filter(lines, l ->
                       len(list_filter(string_split_regex(l, '\\s+'), w -> w <> '')) >= 3
                       AND NOT regexp_matches(l, '[.!?"]$'))) AS nopunct_dropped,
                     len(list_filter(lines, l ->
                       len(list_filter(string_split_regex(l, '\\s+'), w -> w <> '')) >= 3
                       AND regexp_matches(l, '[.!?"]$')
                       AND contains(lower(l), 'javascript'))) AS js_dropped,
                     COALESCE(array_to_string(kept, chr(10)), '') AS cleaned
              FROM feat
            )
            SELECT doc_id, line_count, kept_line_count, short_dropped,
                   nopunct_dropped, js_dropped,
                   len(cleaned) - len(regexp_replace(cleaned, '[.!?]', '', 'g')) AS sentence_count,
                   contains(lower(text), 'lorem ipsum') AS has_lorem,
                   contains(text, chr(123)) AS has_brace,
                   md5(cleaned) AS cleaned_md5,
                   (NOT contains(lower(text), 'lorem ipsum')
                    AND NOT contains(text, chr(123))
                    AND len(cleaned) - len(regexp_replace(cleaned, '[.!?]', '', 'g')) >= 5) AS c4_keep
            FROM agg
        """,
        "dedup_exact": """
            SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp,
                   min(doc_id) AS keep_id, count(*) AS dup_count
            FROM documents GROUP BY fp
        """,
        "exact_substring": _exact_substring_oracle_sql(),
        "link_pagerank": _pagerank_oracle_sql(),
        "link_trustrank": _trustrank_oracle_sql(),
        "link_spam_mass": _spam_mass_oracle_sql(),
        "meta_robots": _META_ROBOTS_ORACLE,
        "nofollow_links": _NOFOLLOW_LINKS_ORACLE,
        "host_split": _HOST_SPLIT_ORACLE,
        "set_containment": _SET_CONTAINMENT_ORACLE,
        "set_overlap": _SET_OVERLAP_ORACLE,
        "main_content": _main_content_oracle_sql(),
        "host_boilerplate": _host_boilerplate_oracle_sql(),
        "jsonld_extract": _jsonld_oracle_sql(),
        "adaptive_delay": """
            -- recursive-CTE re-walk of the integer EWMA politeness
            -- fold: per (host, day) means, alpha=1/4 fold in day
            -- order, 4x AIMD backoff at >=20% latest-day error rate,
            -- clamp to [100ms, 30s]. Every step is integer floor
            -- arithmetic; outer CASTs keep DuckDB HUGEINT out of the
            -- pandas bridge.
            WITH RECURSIVE obs AS (
              SELECT 'h' || CAST(user_id % 37 AS VARCHAR) AS host,
                     CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS ep,
                     50 + (CAST(round(value * 100) AS BIGINT) % 2000) AS lat,
                     CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS err
              FROM events
            ), per AS (
              SELECT host, ep,
                     CAST(sum(lat) // count(*) AS BIGINT) AS mean_ms,
                     CAST((sum(err) * 1000000) // count(*) AS BIGINT) AS err_ppm
              FROM obs GROUP BY host, ep
            ), ord AS (
              SELECT host, ep, mean_ms, err_ppm,
                     row_number() OVER (PARTITION BY host ORDER BY ep) AS rn,
                     count(*) OVER (PARTITION BY host) AS n_eps
              FROM per
            ), fold AS (
              SELECT host, rn, n_eps, err_ppm, mean_ms AS ewma
              FROM ord WHERE rn = 1
              UNION ALL
              SELECT o.host, o.rn, o.n_eps, o.err_ppm,
                     CAST((f.ewma * 3 + o.mean_ms * 1) // 4 AS BIGINT)
              FROM fold f JOIN ord o ON o.host = f.host AND o.rn = f.rn + 1
            )
            SELECT host,
                   CAST(n_eps AS BIGINT) AS n_epochs,
                   CAST(ewma AS BIGINT) AS ewma_latency_ms,
                   CAST(err_ppm AS BIGINT) AS last_err_ppm,
                   CAST(least(greatest(
                     CASE WHEN err_ppm >= 200000 THEN ewma * 10 * 4
                          ELSE ewma * 10 END, 100), 30000) AS BIGINT)
                     AS delay_ms
            FROM fold WHERE rn = n_eps
        """,
        "corpus_layout": """
            -- export-layout replay: alpha-ratio ppm, bucket ordinal
            -- (count of cleared edges), ceil(rows/16) shard count per
            -- (lang, bucket), 60-bit md5 shard placement. All integer.
            WITH q AS (
              SELECT doc_id, lang,
                     CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                          * 1000000 // greatest(length(text), 1) AS BIGINT)
                       AS quality_ppm
              FROM documents
            ), b AS (
              SELECT doc_id, lang,
                     'q' || CAST(
                       (CASE WHEN quality_ppm >= 250000 THEN 1 ELSE 0 END)
                       + (CASE WHEN quality_ppm >= 500000 THEN 1 ELSE 0 END)
                       + (CASE WHEN quality_ppm >= 750000 THEN 1 ELSE 0 END)
                       AS VARCHAR) AS bucket
              FROM q
            ), g AS (
              SELECT lang, bucket,
                     CAST((count(*) + 15) // 16 AS BIGINT) AS n_shards
              FROM b GROUP BY lang, bucket
            )
            SELECT b.doc_id, b.lang, b.bucket, g.n_shards,
                   CAST(('0x' || substr(md5(CAST(b.doc_id AS VARCHAR)), 1, 15))::BIGINT
                        % g.n_shards AS BIGINT) AS shard
            FROM b JOIN g USING (lang, bucket)
        """,
        "embedding_quantize": """
            -- scalar-quantization replay: micro-int gate, per-dim
            -- lo/hi, integer affine code ('//' is floor division,
            -- operands non-negative -> matches Spark's trunc cast)
            WITH m AS (
              SELECT vec_id,
                     list_transform(embedding,
                       x -> CAST(floor(CAST(x AS DOUBLE) * 1000000)
                                 AS BIGINT)) AS vm
              FROM embeddings
            ), e AS (
              SELECT vec_id, CAST(i AS BIGINT) AS dim, vm[i + 1] AS v
              FROM m, UNNEST(generate_series(0, len(vm) - 1)) AS u(i)
            ), s AS (
              SELECT dim, min(v) AS lo, max(v) AS hi FROM e GROUP BY dim
            )
            SELECT e.vec_id, e.dim,
                   CAST(((v - lo) * 255) // (hi - lo + 1) AS BIGINT) AS q
            FROM e JOIN s USING (dim)
        """,
        "corpus_card": """
            -- datasheet replay: (lang, source, tok) histogram, totals
            -- from histogram rows, low median via cumulative window
            -- (2*cum >= n; sums are HUGEINT -> CAST)
            WITH base AS (
              SELECT lang, source,
                     len(list_filter(regexp_split_to_array(text, '\\s+'),
                                     x -> x <> '')) AS tok,
                     length(text) AS chars
              FROM documents
            ), hist AS (
              SELECT lang, source, tok, count(*) AS c,
                     CAST(sum(chars) AS BIGINT) AS ch
              FROM base GROUP BY 1, 2, 3
            ), agg AS (
              SELECT lang, source,
                     CAST(sum(c) AS BIGINT) AS n_docs,
                     CAST(sum(ch) AS BIGINT) AS total_chars,
                     CAST(sum(c * tok) AS BIGINT) AS total_tokens,
                     CAST(max(tok) AS BIGINT) AS max_tokens
              FROM hist GROUP BY 1, 2
            ), cum AS (
              SELECT lang, source, tok,
                     sum(c) OVER (
                       PARTITION BY lang, source ORDER BY tok
                       ROWS UNBOUNDED PRECEDING
                     ) AS cum
              FROM hist
            ), med AS (
              SELECT cum.lang, cum.source,
                     CAST(min(tok) AS BIGINT) AS median_tokens
              FROM cum JOIN agg USING (lang, source)
              WHERE cum * 2 >= n_docs
              GROUP BY 1, 2
            )
            SELECT agg.lang, agg.source, n_docs, total_chars,
                   total_tokens, max_tokens, median_tokens
            FROM agg JOIN med USING (lang, source)
        """,
        "host_moves": """
            -- site-move replay: host extraction (scheme-agnostic,
            -- userinfo stripped, lowercased), same-host exclusion,
            -- pair counts, dominant destination (ties -> min host),
            -- exact share and the moved rule
            WITH edges AS (
              SELECT CASE WHEN doc_id % 4 = 0 THEN 'HTTP://'
                          ELSE 'http://' END
                     || CASE WHEN doc_id % 6 = 0 THEN 'u:p@' ELSE '' END
                     || 'M' || CAST(doc_id % 7 AS VARCHAR)
                     || '.old.org'
                     || CASE WHEN doc_id % 8 = 0 THEN ':80' ELSE '' END
                     || '/p/' || CAST(doc_id AS VARCHAR) AS src_url,
                     CASE WHEN doc_id % 5 = 0 THEN
                       'https://cdn' || CAST(doc_id % 3 AS VARCHAR)
                         || '.other.org/p/' || CAST(doc_id AS VARCHAR)
                     ELSE
                       'https://m' || CAST(doc_id % 7 AS VARCHAR)
                         || '.new.org'
                         || CASE WHEN doc_id % 9 = 0 THEN ':443'
                            ELSE '' END
                         || '/p/' || CAST(doc_id AS VARCHAR)
                     END AS dst_url
              FROM documents
              UNION ALL
              SELECT 'http://sc' || CAST(doc_id % 2 AS VARCHAR)
                       || '.org/p/' || CAST(doc_id AS VARCHAR),
                     'http://z' || CAST(doc_id % 13 AS VARCHAR) || '.org/'
              FROM documents
              UNION ALL
              SELECT 'https://q' || CAST(doc_id % 3 AS VARCHAR)
                       || '.org:80/p/' || CAST(doc_id AS VARCHAR),
                     'http://q' || CAST(doc_id % 3 AS VARCHAR)
                       || '.new.org:443/p/' || CAST(doc_id AS VARCHAR)
              FROM documents WHERE doc_id % 11 = 0
            ), hp AS (
              -- scheme-matched default-port strip: http drops :80,
              -- https drops :443; a mismatched "default" port is a
              -- real endpoint and survives
              SELECT lower(regexp_extract(src_url,
                       '^([a-zA-Z][a-zA-Z0-9+.\\-]*)://', 1)) AS s_scheme,
                     regexp_replace(regexp_extract(src_url,
                       '^[a-zA-Z][a-zA-Z0-9+.\\-]*://([^/?#]*)', 1),
                       '^[^@]*@', '') AS s_hp,
                     lower(regexp_extract(dst_url,
                       '^([a-zA-Z][a-zA-Z0-9+.\\-]*)://', 1)) AS d_scheme,
                     regexp_replace(regexp_extract(dst_url,
                       '^[a-zA-Z][a-zA-Z0-9+.\\-]*://([^/?#]*)', 1),
                       '^[^@]*@', '') AS d_hp
              FROM edges
            ), pairs AS (
              SELECT lower(CASE
                       WHEN s_scheme = 'http'
                         THEN regexp_replace(s_hp, ':80$', '')
                       WHEN s_scheme = 'https'
                         THEN regexp_replace(s_hp, ':443$', '')
                       ELSE s_hp END) AS host,
                     lower(CASE
                       WHEN d_scheme = 'http'
                         THEN regexp_replace(d_hp, ':80$', '')
                       WHEN d_scheme = 'https'
                         THEN regexp_replace(d_hp, ':443$', '')
                       ELSE d_hp END) AS dst_host
              FROM hp
            ), counts AS (
              SELECT host, dst_host, CAST(count(*) AS BIGINT) AS n_to_dst
              FROM pairs WHERE host <> dst_host
              GROUP BY host, dst_host
            ), totals AS (
              SELECT host, CAST(sum(n_to_dst) AS BIGINT) AS n_pages,
                     max(n_to_dst) AS max_n
              FROM counts GROUP BY host
            ), best AS (
              SELECT c.host, t.n_pages, c.n_to_dst,
                     min(c.dst_host) AS dst_host
              FROM counts c JOIN totals t
                ON c.host = t.host AND c.n_to_dst = t.max_n
              GROUP BY c.host, t.n_pages, c.n_to_dst
            )
            SELECT host, dst_host, n_pages, n_to_dst,
                   CAST(n_to_dst * 1000000 // n_pages AS BIGINT)
                     AS share_ppm,
                   (n_pages >= 5 AND
                    n_to_dst * 1000000 // n_pages >= 800000) AS moved
            FROM best
        """,
        "more_like_this": f"""
            -- two proven chains glued: keyword BM25 weights (global
            -- df/N/T, source docs ranked top-3) form the queries; the
            -- index-side search replay ranks them; self excluded,
            -- ranks re-densified
            WITH kwords AS (
              SELECT doc_id, unnest({_TOKS_SQL}) AS word FROM documents
            ), kkept AS (
              SELECT doc_id, word FROM kwords
              WHERE length(word) > 2 AND word NOT IN ({_STOPLIST_SQL})
            ), kdls AS (
              SELECT doc_id, count(*) AS dl FROM kkept GROUP BY doc_id
            ), ktfs AS (
              SELECT doc_id, word, count(*) AS tf
              FROM kkept GROUP BY doc_id, word
            ), kdfs AS (
              SELECT word, count(*) AS df FROM ktfs GROUP BY word
            ), knt AS (
              SELECT count(*) AS n, CAST(sum(dl) AS BIGINT) AS t FROM kdls
            ), kscored AS (
              SELECT ktfs.doc_id, ktfs.word,
                     CAST((CAST(floor(ln(CAST(2 * (knt.n + 1) AS DOUBLE)
                                  / (2 * kdfs.df + 1)) * 1000000 + 0.5)
                            AS HUGEINT)
                           * 44 * ktfs.tf * knt.t)
                          // (CAST(20 AS HUGEINT) * ktfs.tf * knt.t
                              + 6 * knt.t + 18 * kdls.dl * knt.n)
                          AS BIGINT) AS score_u
              FROM ktfs
              JOIN kdfs USING (word)
              JOIN kdls USING (doc_id)
              CROSS JOIN knt
              WHERE ktfs.doc_id % 97 = 0
            ), qterms AS (
              SELECT doc_id AS query_id, word AS term
              FROM (
                SELECT doc_id, word,
                       row_number() OVER (
                         PARTITION BY doc_id
                         ORDER BY score_u DESC, word ASC
                       ) AS rnk
                FROM kscored
              ) WHERE rnk <= 3
            ), dl0 AS (
              SELECT doc_id, CAST(len({_TOKS_SQL}) AS BIGINT) AS dl
              FROM documents
            ), nt AS (
              SELECT CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(dl) AS BIGINT) AS t
              FROM dl0
            ), tf AS (
              SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
              FROM (SELECT doc_id, unnest({_TOKS_SQL}) AS term
                    FROM documents)
              GROUP BY term, doc_id
            ), dft AS (
              SELECT term, CAST(count(*) AS BIGINT) AS df
              FROM tf GROUP BY term
            ), kept AS (
              SELECT tf.term, tf.doc_id, tf.tf, dft.df
              FROM tf JOIN dft USING (term)
              WHERE dft.df >= 2
                AND dft.df <= (SELECT count(*) * 800000 // 1000000
                               FROM documents)
            ), hits AS (
              SELECT q.query_id, kpt.doc_id, kpt.tf, kpt.df, d.dl
              FROM qterms q
              JOIN kept kpt USING (term)
              JOIN dl0 d USING (doc_id)
            ), scored AS (
              SELECT query_id, doc_id,
                     CAST((CAST(floor(ln(CAST(2 * (nt.n + 1) AS DOUBLE)
                                  / (2 * hits.df + 1)) * 1000000 + 0.5)
                            AS HUGEINT)
                           * 44 * hits.tf * nt.t)
                          // (CAST(20 AS HUGEINT) * hits.tf * nt.t
                              + 6 * nt.t + 18 * hits.dl * nt.n)
                          AS BIGINT) AS score_u
              FROM hits CROSS JOIN nt
            ), agg AS (
              SELECT query_id, doc_id,
                     CAST(sum(score_u) AS BIGINT) AS score_u,
                     CAST(count(*) AS BIGINT) AS n_terms
              FROM scored GROUP BY query_id, doc_id
            )
            SELECT query_id, doc_id, score_u, n_terms,
                   row_number() OVER (
                     PARTITION BY query_id
                     ORDER BY score_u DESC, doc_id ASC
                   ) AS rank
            FROM agg WHERE doc_id <> query_id
            QUALIFY rank <= 4
        """,
        "mlt_from_index": f"""
            -- from-index MLT replay: identical glued arithmetic to
            -- more_like_this but UNGATED (the persisted-index
            -- defaults), sources %89, top-4 query terms, top-5 hits —
            -- proves the postings-derived weights and the streamed
            -- search match the from-text build bit-exactly
            WITH kwords AS (
              SELECT doc_id, unnest({_TOKS_SQL}) AS word FROM documents
            ), kkept AS (
              SELECT doc_id, word FROM kwords
              WHERE length(word) > 2 AND word NOT IN ({_STOPLIST_SQL})
            ), kdls AS (
              SELECT doc_id, count(*) AS dl FROM kkept GROUP BY doc_id
            ), ktfs AS (
              SELECT doc_id, word, count(*) AS tf
              FROM kkept GROUP BY doc_id, word
            ), kdfs AS (
              SELECT word, count(*) AS df FROM ktfs GROUP BY word
            ), knt AS (
              SELECT count(*) AS n, CAST(sum(dl) AS BIGINT) AS t FROM kdls
            ), kscored AS (
              SELECT ktfs.doc_id, ktfs.word,
                     CAST((CAST(floor(ln(CAST(2 * (knt.n + 1) AS DOUBLE)
                                  / (2 * kdfs.df + 1)) * 1000000 + 0.5)
                            AS HUGEINT)
                           * 44 * ktfs.tf * knt.t)
                          // (CAST(20 AS HUGEINT) * ktfs.tf * knt.t
                              + 6 * knt.t + 18 * kdls.dl * knt.n)
                          AS BIGINT) AS score_u
              FROM ktfs
              JOIN kdfs USING (word)
              JOIN kdls USING (doc_id)
              CROSS JOIN knt
              WHERE ktfs.doc_id % 89 = 0
            ), qterms AS (
              SELECT doc_id AS query_id, word AS term
              FROM (
                SELECT doc_id, word,
                       row_number() OVER (
                         PARTITION BY doc_id
                         ORDER BY score_u DESC, word ASC
                       ) AS rnk
                FROM kscored
              ) WHERE rnk <= 4
            ), dl0 AS (
              SELECT doc_id, CAST(len({_TOKS_SQL}) AS BIGINT) AS dl
              FROM documents
            ), nt AS (
              SELECT CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(dl) AS BIGINT) AS t
              FROM dl0
            ), tf AS (
              SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
              FROM (SELECT doc_id, unnest({_TOKS_SQL}) AS term
                    FROM documents)
              GROUP BY term, doc_id
            ), dft AS (
              SELECT term, CAST(count(*) AS BIGINT) AS df
              FROM tf GROUP BY term
            ), hits AS (
              SELECT q.query_id, tf.doc_id, tf.tf, dft.df, d.dl
              FROM qterms q
              JOIN tf USING (term)
              JOIN dft ON tf.term = dft.term
              JOIN dl0 d ON tf.doc_id = d.doc_id
            ), scored AS (
              SELECT query_id, doc_id,
                     CAST((CAST(floor(ln(CAST(2 * (nt.n + 1) AS DOUBLE)
                                  / (2 * hits.df + 1)) * 1000000 + 0.5)
                            AS HUGEINT)
                           * 44 * hits.tf * nt.t)
                          // (CAST(20 AS HUGEINT) * hits.tf * nt.t
                              + 6 * nt.t + 18 * hits.dl * nt.n)
                          AS BIGINT) AS score_u
              FROM hits CROSS JOIN nt
            ), agg AS (
              SELECT query_id, doc_id,
                     CAST(sum(score_u) AS BIGINT) AS score_u,
                     CAST(count(*) AS BIGINT) AS n_terms
              FROM scored GROUP BY query_id, doc_id
            )
            SELECT query_id, doc_id, score_u, n_terms,
                   row_number() OVER (
                     PARTITION BY query_id
                     ORDER BY score_u DESC, doc_id ASC
                   ) AS rank
            FROM agg WHERE doc_id <> query_id
            QUALIFY rank <= 5
        """,
        "robots_refresh": """
            -- TTL replay: root-robots regex filter (nested paths
            -- excluded), max capture epoch per host, left join to the
            -- wider universe, age + due arithmetic
            WITH seen AS (
              SELECT 'h' || CAST(doc_id % 19 AS VARCHAR) || '.ex.org'
                       AS host,
                     CASE
                       WHEN doc_id % 6 = 0 THEN
                         CASE WHEN doc_id % 24 = 0 THEN 'HTTPS://'
                              ELSE 'https://' END
                           || 'h' || CAST(doc_id % 19 AS VARCHAR)
                           || '.ex.org/robots.txt'
                       WHEN doc_id % 6 = 3 THEN
                         'https://h' || CAST(doc_id % 19 AS VARCHAR)
                           || '.ex.org/sub/robots.txt'
                       ELSE
                         'https://h' || CAST(doc_id % 19 AS VARCHAR)
                           || '.ex.org/p/' || CAST(doc_id AS VARCHAR)
                     END AS url,
                     CAST(doc_id % 12 AS BIGINT) AS fetched_epoch
              FROM documents
            ), latest AS (
              SELECT host,
                     CAST(max(fetched_epoch) AS BIGINT)
                       AS last_robots_epoch
              FROM seen
              WHERE regexp_matches(url,
                '^(?i:[a-z][a-z0-9+.-]*)://[^/]+/robots\\.txt$')
              GROUP BY host
            ), universe AS (
              SELECT DISTINCT 'h' || CAST(doc_id % 23 AS VARCHAR)
                       || '.ex.org' AS host
              FROM documents
            )
            SELECT u.host,
                   CAST(coalesce(l.last_robots_epoch, -1) AS BIGINT)
                     AS last_robots_epoch,
                   CAST(CASE WHEN l.last_robots_epoch IS NOT NULL
                        THEN 15 - l.last_robots_epoch
                        ELSE -1 END AS BIGINT) AS age_epochs,
                   (l.last_robots_epoch IS NULL
                    OR 15 - l.last_robots_epoch >= 5) AS due
            FROM universe u LEFT JOIN latest l USING (host)
        """,
        "url_equivalence": """
            -- equivalence-class replay: identical redirect + canonical
            -- edge construction, symmetrized, recursive min-label
            -- closure, class sizes
            WITH RECURSIVE e0 AS (
              SELECT 'http://h' || CAST(doc_id % 13 AS VARCHAR)
                       || '.ex.org/r/' || CAST(doc_id AS VARCHAR) AS a,
                     'http://h' || CAST((doc_id - doc_id % 3) % 13
                       AS VARCHAR) || '.ex.org/r/'
                       || CAST(doc_id - doc_id % 3 AS VARCHAR) AS b
              FROM documents WHERE doc_id % 3 <> 0
              UNION ALL
              SELECT 'http://h' || CAST(doc_id % 13 AS VARCHAR)
                       || '.ex.org/r/' || CAST(doc_id AS VARCHAR)
                       || '?utm=' || CAST(doc_id AS VARCHAR),
                     'http://h' || CAST(doc_id % 13 AS VARCHAR)
                       || '.ex.org/r/' || CAST(doc_id AS VARCHAR)
              FROM documents WHERE doc_id % 2 = 0
            ), und AS (
              SELECT a, b FROM e0 UNION SELECT b AS a, a AS b FROM e0
            ), nodes AS (
              SELECT DISTINCT a AS n FROM und
            ), walk(n, l) AS (
              SELECT n, n FROM nodes
              UNION
              SELECT u.b, w.l FROM walk w JOIN und u ON u.a = w.n
            ), comp AS (
              SELECT n AS url, min(l) AS canonical_url
              FROM walk GROUP BY n
            ), sizes AS (
              SELECT canonical_url,
                     CAST(count(*) AS BIGINT) AS cluster_size
              FROM comp GROUP BY canonical_url
            )
            SELECT c.url, c.canonical_url, s.cluster_size
            FROM comp c JOIN sizes s USING (canonical_url)
        """,
        "retrieval_eval": f"""
            -- retrieval-eval replay: the same run/qrels construction,
            -- the FROZEN integer discount table (identical literals),
            -- ideal re-rank for IDCG, ppm floor divisions throughout
            WITH qs AS (
              SELECT unnest([1, 2, 3]) AS query_id
            ), pairs AS (
              SELECT q.query_id, d.doc_id FROM documents d CROSS JOIN qs q
            ), qrels AS (
              SELECT * FROM (
                SELECT query_id, doc_id,
                       CASE
                         WHEN doc_id % 29 = query_id AND doc_id % 2 = 0
                           THEN 2
                         WHEN doc_id % 29 = query_id AND doc_id % 4 = 1
                           THEN 1
                         WHEN doc_id % 31 = query_id THEN 1
                       END AS rel
                FROM pairs
              ) WHERE rel IS NOT NULL
            ), run AS (
              SELECT query_id, doc_id,
                     row_number() OVER (
                       PARTITION BY query_id ORDER BY doc_id ASC
                     ) AS rank
              FROM pairs WHERE doc_id % 29 = query_id
              QUALIFY rank <= 8
            ), disc AS (
              SELECT * FROM (VALUES {', '.join('(%d, %d)' % (i + 1, w) for i, w in enumerate(_tx._dcg_discounts_u(8)))}) AS t(rank, w)
            ), joined AS (
              SELECT r.query_id, r.rank, coalesce(q.rel, 0) AS rel
              FROM run r LEFT JOIN qrels q USING (query_id, doc_id)
            ), per_run AS (
              SELECT j.query_id,
                     CAST(sum(j.rel * d.w) AS BIGINT) AS dcg_u,
                     CAST(sum(CASE WHEN j.rel > 0 THEN 1 ELSE 0 END)
                          AS BIGINT) AS hits,
                     min(CASE WHEN j.rel > 0 THEN j.rank END) AS first_rel
              FROM joined j JOIN disc d USING (rank)
              GROUP BY j.query_id
            ), ideal AS (
              SELECT i.query_id,
                     CAST(sum(CASE WHEN i.irank <= 8 THEN i.rel * d.w
                              ELSE 0 END) AS BIGINT) AS idcg_u,
                     CAST(count(*) AS BIGINT) AS n_rel
              FROM (
                SELECT query_id, doc_id, rel,
                       row_number() OVER (
                         PARTITION BY query_id
                         ORDER BY rel DESC, doc_id ASC
                       ) AS irank
                FROM qrels WHERE rel > 0
              ) i LEFT JOIN disc d ON d.rank = i.irank
              GROUP BY i.query_id
            )
            SELECT p.query_id, p.dcg_u,
                   coalesce(i.idcg_u, 0) AS idcg_u,
                   CASE WHEN coalesce(i.idcg_u, 0) > 0
                        THEN CAST(p.dcg_u * 1000000 // i.idcg_u AS BIGINT)
                        ELSE 0 END AS ndcg_ppm,
                   CASE WHEN p.first_rel IS NOT NULL
                        THEN CAST(1000000 // p.first_rel AS BIGINT)
                        ELSE 0 END AS rr_ppm,
                   p.hits,
                   coalesce(i.n_rel, 0) AS n_rel,
                   CASE WHEN coalesce(i.n_rel, 0) > 0
                        THEN CAST(p.hits * 1000000 // i.n_rel AS BIGINT)
                        ELSE 0 END AS recall_ppm
            FROM per_run p LEFT JOIN ideal i USING (query_id)
        """,
        "metric_anomalies": """
            -- median/MAD replay: type-1 lower medians via
            -- (value, slot)-ordered rank windows, |v-med| MAD the
            -- same way, cross-multiplied integer flag
            WITH s AS (
              SELECT 'g' || CAST(doc_id % 5 AS VARCHAR) AS grp,
                     doc_id AS slot,
                     CAST(100 + (doc_id % 7) * 3
                          + CASE WHEN doc_id % 97 = 0 THEN 5000
                                 ELSE 0 END AS BIGINT) AS value
              FROM documents
            ), r1 AS (
              SELECT *, row_number() OVER (
                       PARTITION BY grp ORDER BY value ASC, slot ASC
                     ) AS mrn,
                     count(*) OVER (PARTITION BY grp) AS mn
              FROM s
            ), m1 AS (
              SELECT grp, slot, value,
                     max(CASE WHEN mrn <= (mn + 1) // 2 THEN value END)
                       OVER (PARTITION BY grp) AS med
              FROM r1
            ), d1 AS (
              SELECT *, abs(value - med) AS dev FROM m1
            ), r2 AS (
              SELECT *, row_number() OVER (
                       PARTITION BY grp ORDER BY dev ASC, slot ASC
                     ) AS mrn,
                     count(*) OVER (PARTITION BY grp) AS mn
              FROM d1
            ), m2 AS (
              SELECT grp, slot, value, med, dev,
                     max(CASE WHEN mrn <= (mn + 1) // 2 THEN dev END)
                       OVER (PARTITION BY grp) AS mad
              FROM r2
            )
            SELECT grp, slot, value,
                   CAST(med AS BIGINT) AS med,
                   CAST(dev AS BIGINT) AS dev,
                   CAST(mad AS BIGINT) AS mad,
                   dev * 1000000 > 5000000 * mad AS anomaly
            FROM m2
        """,
        "bm25f_search": f"""
            -- BM25F replay: both field tokenizations, anchor map
            -- (doc_id*7+3 mod N, 60-char snippets), keyword queries
            -- (top-4, dealt mod 2), weighted tf'/dl', either-field
            -- df, the exact integer formula in HUGEINT, top-5 rank
            WITH nd AS (
              SELECT count(*) AS n FROM documents
            ), bodytoks AS (
              SELECT doc_id, {_TOKS_SQL} AS toks FROM documents
            ), anchsrc AS (
              SELECT (doc_id * 7 + 3) % (SELECT n FROM nd) AS doc_id,
                     substr(text, 1, 60) AS text
              FROM documents
            ), anchtoks AS (
              SELECT doc_id,
                     list_filter(string_split_regex(lower(text),
                       '[^a-z0-9_]+'), x -> x <> '') AS toks
              FROM anchsrc
            ), kw AS (
              SELECT word, count(*) AS freq
              FROM (SELECT unnest(toks) AS word FROM bodytoks)
              WHERE length(word) > 2 AND word NOT IN ({_STOPLIST_SQL})
              GROUP BY word ORDER BY freq DESC, word ASC LIMIT 4
            ), ranked AS (
              SELECT word,
                     row_number() OVER (ORDER BY freq DESC, word ASC) AS r
              FROM kw
            ), qterms AS (
              SELECT CAST(((r - 1) % 2) + 1 AS BIGINT) AS query_id,
                     word AS term
              FROM ranked
            ), terms AS (
              SELECT DISTINCT term FROM qterms
            ), tf_b AS (
              SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf_b
              FROM (SELECT doc_id, unnest(toks) AS term FROM bodytoks)
              WHERE term IN (SELECT term FROM terms)
              GROUP BY doc_id, term
            ), tf_a AS (
              SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf_a
              FROM (SELECT doc_id, unnest(toks) AS term FROM anchtoks)
              WHERE term IN (SELECT term FROM terms)
              GROUP BY doc_id, term
            ), dl_b AS (
              SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl_b
              FROM bodytoks
            ), dl_a AS (
              SELECT doc_id, CAST(sum(len(toks)) AS BIGINT) AS dl_a
              FROM anchtoks GROUP BY doc_id
            ), dlf AS (
              SELECT b.doc_id,
                     CAST(1 * b.dl_b + 3 * coalesce(a.dl_a, 0) AS BIGINT)
                       AS dlf
              FROM dl_b b LEFT JOIN dl_a a USING (doc_id)
            ), nt AS (
              SELECT CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(dlf) AS BIGINT) AS t
              FROM dlf
            ), tfp AS (
              SELECT coalesce(b.doc_id, a.doc_id) AS doc_id,
                     coalesce(b.term, a.term) AS term,
                     CAST(1 * coalesce(b.tf_b, 0)
                          + 3 * coalesce(a.tf_a, 0) AS BIGINT) AS tfp
              FROM tf_b b
              FULL JOIN tf_a a
                ON b.doc_id = a.doc_id AND b.term = a.term
            ), dft AS (
              SELECT term, CAST(count(*) AS BIGINT) AS df
              FROM tfp WHERE tfp > 0 GROUP BY term
            ), contrib AS (
              SELECT q.query_id, p.doc_id,
                     CAST((CAST(floor(ln(CAST(2 * (nt.n + 1) AS DOUBLE)
                                  / (2 * dft.df + 1)) * 1000000 + 0.5)
                            AS HUGEINT)
                           * 44 * p.tfp * nt.t)
                          // (CAST(20 AS HUGEINT) * p.tfp * nt.t
                              + 6 * nt.t + 18 * d.dlf * nt.n)
                          AS BIGINT) AS score_u
              FROM tfp p
              JOIN dft USING (term)
              JOIN dlf d ON d.doc_id = p.doc_id
              JOIN qterms q ON q.term = p.term
              CROSS JOIN nt
              WHERE p.tfp > 0
            ), agg AS (
              SELECT query_id, doc_id,
                     CAST(sum(score_u) AS BIGINT) AS score_u,
                     CAST(count(*) AS BIGINT) AS n_terms
              FROM contrib GROUP BY query_id, doc_id
            )
            SELECT query_id, doc_id, score_u, n_terms,
                   row_number() OVER (
                     PARTITION BY query_id
                     ORDER BY score_u DESC, doc_id ASC
                   ) AS rank
            FROM agg QUALIFY rank <= 5
        """,
        "postings_gaps": f"""
            -- gap-encoding replay: the proven postings window, then
            -- per-(term, block) lag gaps (pos 0 keeps the absolute
            -- id) and the block's first_doc
            WITH tf AS (
              SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
              FROM (SELECT doc_id, unnest({_TOKS_SQL}) AS term FROM documents)
              GROUP BY term, doc_id
            ), dft AS (
              SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term
            ), kept AS (
              SELECT tf.term, tf.doc_id, tf.tf, dft.df
              FROM tf JOIN dft USING (term)
              WHERE dft.df >= 2
                AND dft.df <= (SELECT count(*) * 800000 // 1000000
                               FROM documents)
            ), blocked AS (
              SELECT term, df, doc_id, tf,
                     CAST((row_number() OVER w - 1) // 64 AS BIGINT) AS block,
                     CAST((row_number() OVER w - 1) % 64 AS BIGINT) AS pos
              FROM kept
              WINDOW w AS (PARTITION BY term ORDER BY doc_id ASC)
            )
            SELECT term, df, block,
                   CAST(first_value(doc_id) OVER b AS BIGINT) AS first_doc,
                   pos,
                   CAST(CASE WHEN pos = 0 THEN doc_id
                        ELSE doc_id - lag(doc_id) OVER b END AS BIGINT)
                     AS gap,
                   tf
            FROM blocked
            WINDOW b AS (PARTITION BY term, block ORDER BY doc_id ASC)
        """,
        "kcore": """
            -- k-core replay: identical edge construction, symmetrize
            -- + distinct + self-loop drop, three lockstep peel rounds
            -- (degree >= 3 survivors restrict both endpoints), then
            -- the trailing core-degree select
            WITH raw AS (
              SELECT 'c' || CAST(doc_id % 9 AS VARCHAR) AS s,
                     'c' || CAST((doc_id * 4 + 1) % 9 AS VARCHAR) AS d
              FROM documents
              UNION ALL
              SELECT 'c' || CAST(doc_id % 9 AS VARCHAR),
                     'c' || CAST((doc_id * 2 + 3) % 9 AS VARCHAR)
              FROM documents
              UNION ALL
              SELECT 'c' || CAST(doc_id % 9 AS VARCHAR),
                     'c' || CAST((doc_id * 5 + 2) % 9 AS VARCHAR)
              FROM documents
              UNION ALL
              SELECT 'p' || CAST(doc_id AS VARCHAR),
                     'p' || CAST(doc_id + 1 AS VARCHAR)
              FROM documents
              UNION ALL
              SELECT 'c' || CAST(doc_id % 9 AS VARCHAR),
                     'p' || CAST(doc_id AS VARCHAR)
              FROM documents WHERE doc_id % 25 = 0
            ), e0 AS (
              SELECT DISTINCT s, d FROM (
                SELECT s, d FROM raw UNION ALL SELECT d AS s, s AS d FROM raw
              ) WHERE s <> d
            ), k1 AS (
              SELECT s FROM e0 GROUP BY s HAVING count(*) >= 3
            ), e1 AS (
              SELECT e.s, e.d FROM e0 e
              JOIN k1 a ON e.s = a.s JOIN k1 b ON e.d = b.s
            ), k2 AS (
              SELECT s FROM e1 GROUP BY s HAVING count(*) >= 3
            ), e2 AS (
              SELECT e.s, e.d FROM e1 e
              JOIN k2 a ON e.s = a.s JOIN k2 b ON e.d = b.s
            ), k3 AS (
              SELECT s FROM e2 GROUP BY s HAVING count(*) >= 3
            ), e3 AS (
              SELECT e.s, e.d FROM e2 e
              JOIN k3 a ON e.s = a.s JOIN k3 b ON e.d = b.s
            )
            SELECT s AS node, CAST(count(*) AS BIGINT) AS degree
            FROM e3 GROUP BY s HAVING count(*) >= 3
        """,
        "heavy_hitters": """
            -- sketch-then-verify replay: n/threshold/share from the
            -- plain GROUP BY truth (the completeness guarantee makes
            -- them sketch-independent); est from the md5-exact
            -- depth-4 x width-64 cell grid
            WITH s AS (
              SELECT 'u' || CAST(user_id % ((user_id % 7) + 1) AS VARCHAR)
                AS host
              FROM events
            ), nt AS (
              SELECT CAST(count(*) AS BIGINT) AS total FROM s
            ), thr AS (
              SELECT greatest(1, 40000 * total // 1000000) AS t FROM nt
            ), cells AS (
              SELECT d.d, ('0x' || substr(md5(CAST(d.d AS VARCHAR) || ':'
                           || host), 1, 10))::BIGINT % 64 AS cell,
                     count(*) AS cnt
              FROM s, (SELECT unnest(generate_series(0, 3)) AS d) d
              GROUP BY d.d, cell
            ), probes AS (
              SELECT DISTINCT s.host, d.d,
                     ('0x' || substr(md5(CAST(d.d AS VARCHAR) || ':'
                      || s.host), 1, 10))::BIGINT % 64 AS cell
              FROM s, (SELECT unnest(generate_series(0, 3)) AS d) d
            ), est AS (
              SELECT p.host, CAST(min(coalesce(c.cnt, 0)) AS BIGINT) AS est
              FROM probes p
              LEFT JOIN cells c ON p.d = c.d AND p.cell = c.cell
              GROUP BY p.host
            ), exact AS (
              SELECT host, CAST(count(*) AS BIGINT) AS n
              FROM s GROUP BY host
            )
            SELECT x.host, x.n, e.est,
                   CAST((SELECT t FROM thr) AS BIGINT) AS threshold,
                   CAST(x.n * 1000000 // (SELECT total FROM nt)
                        AS BIGINT) AS share_ppm
            FROM exact x JOIN est e USING (host)
            WHERE x.n >= (SELECT t FROM thr)
        """,
        "script_profile": """
            -- script-range replay: identical \\x{...} classes (RE2 ≡
            -- Java regex), per-range char counts via global
            -- regexp_replace deletion, precedence-ordered argmax,
            -- exact integer homoglyph mix_ppm
            WITH s AS (
              SELECT doc_id,
                     text || CASE doc_id % 4
                       WHEN 1 THEN ' привет мир как дела'
                       WHEN 2 THEN ' 漢字かなカナ 한글 테스트'
                       WHEN 3 THEN ' paypаl sеcurity chеck'
                       ELSE '' END AS t
              FROM documents
            ), c AS (
              SELECT doc_id, CAST(length(t) AS BIGINT) AS n_chars,
                CAST(length(t) - length(regexp_replace(t,
                  '[A-Za-z\\x{00C0}-\\x{024F}]', '', 'g')) AS BIGINT)
                  AS n_latin,
                CAST(length(t) - length(regexp_replace(t,
                  '[\\x{0400}-\\x{04FF}]', '', 'g')) AS BIGINT)
                  AS n_cyrillic,
                CAST(length(t) - length(regexp_replace(t,
                  '[\\x{0370}-\\x{03FF}]', '', 'g')) AS BIGINT)
                  AS n_greek,
                CAST(length(t) - length(regexp_replace(t,
                  '[\\x{0600}-\\x{06FF}]', '', 'g')) AS BIGINT)
                  AS n_arabic,
                CAST(length(t) - length(regexp_replace(t,
                  '[\\x{0590}-\\x{05FF}]', '', 'g')) AS BIGINT)
                  AS n_hebrew,
                CAST(length(t) - length(regexp_replace(t,
                  '[\\x{0900}-\\x{097F}]', '', 'g')) AS BIGINT)
                  AS n_devanagari,
                CAST(length(t) - length(regexp_replace(t,
                  '[\\x{4E00}-\\x{9FFF}\\x{3040}-\\x{30FF}\\x{AC00}-\\x{D7AF}]',
                  '', 'g')) AS BIGINT) AS n_cjk
              FROM s
            )
            SELECT doc_id, n_chars, n_latin, n_cyrillic, n_greek,
                   n_arabic, n_hebrew, n_devanagari, n_cjk,
                   CASE
                     WHEN greatest(n_latin, n_cyrillic, n_greek,
                                   n_arabic, n_hebrew, n_devanagari,
                                   n_cjk) = 0 THEN 'none'
                     WHEN n_latin = greatest(n_latin, n_cyrillic,
                       n_greek, n_arabic, n_hebrew, n_devanagari,
                       n_cjk) THEN 'latin'
                     WHEN n_cyrillic = greatest(n_latin, n_cyrillic,
                       n_greek, n_arabic, n_hebrew, n_devanagari,
                       n_cjk) THEN 'cyrillic'
                     WHEN n_greek = greatest(n_latin, n_cyrillic,
                       n_greek, n_arabic, n_hebrew, n_devanagari,
                       n_cjk) THEN 'greek'
                     WHEN n_arabic = greatest(n_latin, n_cyrillic,
                       n_greek, n_arabic, n_hebrew, n_devanagari,
                       n_cjk) THEN 'arabic'
                     WHEN n_hebrew = greatest(n_latin, n_cyrillic,
                       n_greek, n_arabic, n_hebrew, n_devanagari,
                       n_cjk) THEN 'hebrew'
                     WHEN n_devanagari = greatest(n_latin, n_cyrillic,
                       n_greek, n_arabic, n_hebrew, n_devanagari,
                       n_cjk) THEN 'devanagari'
                     ELSE 'cjk'
                   END AS script_pred,
                   CAST((n_latin + n_cyrillic + n_greek + n_arabic
                         + n_hebrew + n_devanagari + n_cjk
                         - greatest(n_latin, n_cyrillic, n_greek,
                                    n_arabic, n_hebrew, n_devanagari,
                                    n_cjk)) * 1000000
                        // greatest(n_latin + n_cyrillic + n_greek
                                    + n_arabic + n_hebrew
                                    + n_devanagari + n_cjk, 1)
                        AS BIGINT) AS mix_ppm
            FROM c
        """,
        "cc_index_surt": """
            -- SURT replay: the same url construction, then every
            -- canonicalization rule relationally — trim, scheme drop,
            -- fragment cut, userinfo drop (greedy ^.*@ = after LAST
            -- @), lowercase host, default-port strip, www-strip,
            -- label reversal, query-only path normalization
            WITH u AS (
              SELECT doc_id,
                     CASE doc_id % 6
                       WHEN 0 THEN 'https://www.h' || (doc_id % 23)
                         || '.example.com/p/' || doc_id
                       WHEN 1 THEN 'http://h' || (doc_id % 23)
                         || '.example.co.uk:8080/a/b?page=' || (doc_id % 7)
                       WHEN 2 THEN 'https://h' || (doc_id % 23)
                         || '.example.com:443/x#frag'
                       WHEN 3 THEN 'http://user@h' || (doc_id % 23)
                         || '.example.org'
                       WHEN 4 THEN 'https://sub.h' || (doc_id % 23)
                         || '.example.com?q=' || doc_id
                       ELSE ' http://www3.h' || (doc_id % 23)
                         || '.example.com:80/UPPER/' || doc_id || ' '
                     END AS url
              FROM documents
            ), s1 AS (
              SELECT doc_id, url,
                     regexp_replace(
                       regexp_replace(trim(url),
                         '^[a-zA-Z][a-zA-Z0-9+.\\-]*://', ''),
                       '#.*$', '') AS s
              FROM u
            ), s2 AS (
              SELECT doc_id, url,
                     regexp_replace(
                       lower(regexp_extract(s, '^([^/?]*)', 1)),
                       '^.*@', '') AS auth,
                     regexp_replace(s, '^[^/?]*', '') AS rest
              FROM s1
            ), s3 AS (
              SELECT doc_id, url, rest,
                     regexp_replace(
                       regexp_replace(auth, ':[0-9]+$', ''),
                       '^www[0-9]*\\.', '') AS host,
                     CASE WHEN regexp_extract(auth, '(:[0-9]+)$', 1)
                               IN (':80', ':443') THEN ''
                          ELSE regexp_extract(auth, '(:[0-9]+)$', 1)
                     END AS port
              FROM s2
            )
            SELECT doc_id, url,
                   (CASE WHEN host = '' THEN ''
                         ELSE array_to_string(
                           list_reverse(string_split(host, '.')), ',')
                    END)
                   || port || ')'
                   || (CASE WHEN rest = '' THEN '/'
                            WHEN rest LIKE '?%' THEN '/' || rest
                            ELSE rest END) AS surt_key
            FROM s3
        """,
        "kcenter_select": """
            -- greedy k-center replay: 4 selection rounds unrolled as
            -- correlated CTEs (seed = min id; then argmax of the
            -- carried min-distance, ties to min id), exact integer
            -- squared L2 on micro-int components, final
            -- nearest-center assignment with the (dist, rank)
            -- tie-break
            WITH m AS (
              SELECT vec_id,
                     list_transform(embedding,
                       x -> CAST(floor(CAST(x AS DOUBLE) * 1000000)
                                 AS BIGINT)) AS vm
              FROM embeddings
            ), e AS (
              SELECT vec_id, CAST(i AS BIGINT) AS dim, vm[i + 1] AS v
              FROM m, UNNEST(generate_series(0, len(vm) - 1)) AS u(i)
            ), c1 AS (
              SELECT min(vec_id) AS cid FROM m
            ), d1 AS (
              SELECT e.vec_id,
                     CAST(sum((e.v - c.v) * (e.v - c.v)) AS BIGINT) AS md
              FROM e JOIN (SELECT dim, v FROM e
                           WHERE vec_id = (SELECT cid FROM c1)) c
                USING (dim)
              GROUP BY e.vec_id
            ), c2 AS (
              SELECT vec_id AS cid, md FROM d1
              WHERE vec_id <> (SELECT cid FROM c1)
              ORDER BY md DESC, vec_id ASC LIMIT 1
            ), n2 AS (
              SELECT e.vec_id,
                     CAST(sum((e.v - c.v) * (e.v - c.v)) AS BIGINT) AS nd
              FROM e JOIN (SELECT dim, v FROM e
                           WHERE vec_id = (SELECT cid FROM c2)) c
                USING (dim)
              GROUP BY e.vec_id
            ), m2 AS (
              SELECT d1.vec_id, least(d1.md, n2.nd) AS md
              FROM d1 JOIN n2 USING (vec_id)
            ), c3 AS (
              SELECT vec_id AS cid, md FROM m2
              WHERE vec_id NOT IN (SELECT cid FROM c1
                                   UNION ALL SELECT cid FROM c2)
              ORDER BY md DESC, vec_id ASC LIMIT 1
            ), n3 AS (
              SELECT e.vec_id,
                     CAST(sum((e.v - c.v) * (e.v - c.v)) AS BIGINT) AS nd
              FROM e JOIN (SELECT dim, v FROM e
                           WHERE vec_id = (SELECT cid FROM c3)) c
                USING (dim)
              GROUP BY e.vec_id
            ), m3 AS (
              SELECT m2.vec_id, least(m2.md, n3.nd) AS md
              FROM m2 JOIN n3 USING (vec_id)
            ), c4 AS (
              SELECT vec_id AS cid, md FROM m3
              WHERE vec_id NOT IN (SELECT cid FROM c1
                                   UNION ALL SELECT cid FROM c2
                                   UNION ALL SELECT cid FROM c3)
              ORDER BY md DESC, vec_id ASC LIMIT 1
            ), centers AS (
              SELECT 1 AS rnk, (SELECT cid FROM c1) AS cid
              UNION ALL SELECT 2, (SELECT cid FROM c2)
              UNION ALL SELECT 3, (SELECT cid FROM c3)
              UNION ALL SELECT 4, (SELECT cid FROM c4)
            ), cdims AS (
              SELECT ctr.rnk, e.dim, e.v
              FROM centers ctr JOIN e ON e.vec_id = ctr.cid
            ), alld AS (
              SELECT e.vec_id, c.rnk,
                     CAST(sum((e.v - c.v) * (e.v - c.v)) AS BIGINT) AS d
              FROM e JOIN cdims c USING (dim)
              GROUP BY e.vec_id, c.rnk
            ), best AS (
              SELECT vec_id, rnk, d,
                     row_number() OVER (
                       PARTITION BY vec_id ORDER BY d ASC, rnk ASC
                     ) AS rn
              FROM alld
            )
            SELECT b.vec_id, ctr.cid AS center_id,
                   CAST(b.rnk AS BIGINT) AS center_rank, b.d AS dist_u
            FROM best b JOIN centers ctr USING (rnk)
            WHERE b.rn = 1
        """,
        "sim_sq_topk": """
            -- quantized search replay: same SQ codes, integer dot
            -- product via a dim-key join, per-query rank
            WITH m AS (
              SELECT vec_id,
                     list_transform(embedding,
                       x -> CAST(floor(CAST(x AS DOUBLE) * 1000000)
                                 AS BIGINT)) AS vm
              FROM embeddings
            ), e AS (
              SELECT vec_id, CAST(i AS BIGINT) AS dim, vm[i + 1] AS v
              FROM m, UNNEST(generate_series(0, len(vm) - 1)) AS u(i)
            ), s AS (
              SELECT dim, min(v) AS lo, max(v) AS hi FROM e GROUP BY dim
            ), code AS (
              SELECT e.vec_id, e.dim,
                     CAST(((v - lo) * 255) // (hi - lo + 1) AS BIGINT) AS q
              FROM e JOIN s USING (dim)
            ), pair AS (
              SELECT a.vec_id AS query_id, b.vec_id AS vec_id,
                     CAST(sum(a.q * b.q) AS BIGINT) AS score
              FROM code a JOIN code b USING (dim)
              WHERE a.vec_id < 8
              GROUP BY 1, 2
            )
            SELECT query_id,
                   row_number() OVER (
                     PARTITION BY query_id
                     ORDER BY score DESC, vec_id ASC
                   ) AS rank,
                   vec_id, score
            FROM pair QUALIFY rank <= 5
        """,
        "passage_chunks": """
            -- sliding-window replay: whitespace split, chunk count =
            -- 1 + ceil(max(n-24,0)/16), per-window list_slice +
            -- array_to_string ('//' is HUGEINT -> CAST)
            WITH t AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(text, '\\s+'),
                                 x -> x <> '') AS toks
              FROM documents
            ), c AS (
              SELECT doc_id, toks, len(toks) AS n,
                     CAST(1 + (greatest(len(toks) - 24, 0) + 15) // 16
                       AS BIGINT) AS n_chunks
              FROM t
            )
            SELECT doc_id,
                   CAST(i AS BIGINT) AS chunk_id,
                   CAST(i * 16 AS BIGINT) AS start_tok,
                   CAST(len(toks[i*16 + 1 : i*16 + 24]) AS BIGINT)
                     AS n_tokens,
                   array_to_string(toks[i*16 + 1 : i*16 + 24], ' ')
                     AS chunk_text
            FROM c, UNNEST(generate_series(0, n_chunks - 1)) AS u(i)
            WHERE len(toks[i*16 + 1 : i*16 + 24]) > 0
        """,
        "warc_latest_capture": """
            -- replay the capture synthesis, then newest-per-url via
            -- the same (ts desc, record_id desc) window rank
            WITH caps AS (
              SELECT 'https://h' || CAST(doc_id % 7 AS VARCHAR)
                       || '.org/p/' || CAST(doc_id AS VARCHAR) AS url,
                     CAST(1700000000 + (doc_id % 5) * 86400
                          + k * 3600 AS BIGINT) AS ts_unix,
                     'rec-' || CAST(doc_id AS VARCHAR) || '-'
                       || CAST(k AS VARCHAR) AS record_id
              FROM documents
              CROSS JOIN UNNEST(range(0, doc_id % 3 + 1)) AS t(k)
            )
            SELECT url, ts_unix, record_id FROM caps
            QUALIFY row_number() OVER (
              PARTITION BY url ORDER BY ts_unix DESC, record_id DESC
            ) = 1
        """,
        "crawl_diff": """
            -- two-wave diff replay: same carve rules, FULL JOIN,
            -- status by presence indicators + digest inequality
            WITH base AS (
              SELECT 'https://h' || CAST(doc_id % 23 AS VARCHAR)
                       || '.org/d/' || CAST(doc_id AS VARCHAR) AS url,
                     doc_id, text
              FROM documents
            ), o AS (
              SELECT url, md5(text) AS old_digest, 1 AS in_old
              FROM base WHERE doc_id % 10 <> 7
            ), n AS (
              SELECT url,
                     md5(CASE WHEN doc_id % 5 = 0 THEN text || '#v2'
                         ELSE text END) AS new_digest,
                     1 AS in_new
              FROM base WHERE doc_id % 9 <> 4
            )
            SELECT coalesce(o.url, n.url) AS url, old_digest, new_digest,
                   CASE WHEN in_old IS NULL THEN 'added'
                        WHEN in_new IS NULL THEN 'removed'
                        WHEN old_digest IS DISTINCT FROM new_digest
                          THEN 'changed'
                        ELSE 'unchanged' END AS status
            FROM o FULL JOIN n ON o.url = n.url
        """,
        "training_shuffle": """
            -- seeded-hash global shuffle replay: 60-bit md5, shard =
            -- h % 8, pos = per-shard rank of (h, doc_id)
            WITH h AS (
              SELECT doc_id,
                     ('0x' || substr(md5('r2:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h
              FROM documents
            )
            SELECT doc_id, CAST(h % 8 AS BIGINT) AS shard,
                   CAST(row_number() OVER (
                     PARTITION BY h % 8 ORDER BY h, doc_id
                   ) AS BIGINT) AS pos
            FROM h
        """,
        "mix_sources": """
            -- source-mixing replay: CASE rate map + seeded-hash
            -- fractional-epoch threshold; integer ppm arithmetic only
            -- (// is HUGEINT in DuckDB -> outer CAST)
            WITH r AS (
              SELECT doc_id, source,
                     CAST(CASE source WHEN 'src0' THEN 2300000
                          WHEN 'src1' THEN 400000 WHEN 'src2' THEN 0
                          ELSE 1000000 END AS BIGINT) AS rate_ppm,
                     ('0x' || substr(md5('mix-r2:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                       % 1000000 AS u
              FROM documents
            )
            SELECT doc_id, source, rate_ppm,
                   CAST(rate_ppm // 1000000
                        + (CASE WHEN u < rate_ppm % 1000000 THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_repeats
            FROM r
        """,
        "url_shapes": """
            -- segment-level shape replay: all-digit -> N, long-hex ->
            -- H, else s; same five synthetic path grammars.
            WITH u AS (
              SELECT 'h' || CAST(doc_id % 23 AS VARCHAR) || '.org' AS host,
                     CASE
                       WHEN doc_id % 5 = 0 THEN
                         '/cal/' || CAST(2000 + doc_id % 30 AS VARCHAR)
                         || '/' || CAST(doc_id % 12 + 1 AS VARCHAR)
                         || '/' || CAST(doc_id % 28 + 1 AS VARCHAR)
                       WHEN doc_id % 5 = 1 THEN
                         '/blog/page/' || CAST(doc_id AS VARCHAR)
                       WHEN doc_id % 5 = 2 THEN
                         '/d/' || md5(CAST(doc_id AS VARCHAR))
                       WHEN doc_id % 5 = 3 THEN
                         '/article/item-' || CAST(doc_id AS VARCHAR)
                       ELSE '/about' END AS path
              FROM documents
            ), shaped AS (
              SELECT host,
                     array_to_string(list_transform(
                       string_split(path, '/'),
                       seg -> CASE WHEN seg = '' THEN ''
                                   WHEN regexp_matches(seg, '^[0-9]+$') THEN 'N'
                                   WHEN regexp_matches(seg, '^[0-9a-fA-F]{8,}$') THEN 'H'
                                   ELSE 's' END), '/') AS shape,
                     'https://' || host || path AS url
              FROM u
            )
            SELECT host, shape, CAST(count(*) AS BIGINT) AS n_urls,
                   min(url) AS example_url
            FROM shaped GROUP BY host, shape
        """,
        "url_param_mining": """
            -- residual-group evidence replay: same synthetic captures,
            -- per-(host,param) groups that differ only in the param,
            -- digest-distinct counts, ppm verdict
            WITH v AS (
              SELECT doc_id,
                     'shop' || CAST(doc_id % 7 AS VARCHAR) || '.org' AS host,
                     '/item/' || CAST(doc_id % 211 AS VARCHAR) AS path,
                     unnest([
                       struct_pack(id := doc_id % 50, utm := 'a', vn := 1),
                       struct_pack(id := doc_id % 50, utm := 'b', vn := 2),
                       struct_pack(id := doc_id % 50 + 1, utm := 'a', vn := 3)
                     ]) AS s
              FROM documents
            ), caps AS (
              SELECT 'https://' || host || path
                       || '?id=' || CAST(s.id AS VARCHAR)
                       || '&utm=' || s.utm
                       || CASE WHEN host IN ('shop5.org', 'shop6.org')
                            THEN '&sess=' || substr(md5(
                              CAST(doc_id AS VARCHAR) || '-'
                              || CAST(s.vn AS VARCHAR)), 1, 8)
                            ELSE '' END AS url,
                     md5(host || path || ':'
                         || CAST(s.id AS VARCHAR)) AS digest
              FROM v
            ), parts AS (
              SELECT regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
                     regexp_extract(url,
                       '^[a-z]+://[^/?#]+([^?#]*)', 1) AS path,
                     list_filter(string_split(
                       regexp_extract(url, '\\?([^#]*)', 1), '&'),
                       s -> s <> '') AS raw,
                     digest
              FROM caps
            ), expl AS (
              SELECT host, path, raw, digest,
                     unnest(list_distinct(list_transform(raw,
                       s -> string_split(s, '=')[1]))) AS param
              FROM parts
            ), ev0 AS (
              SELECT host, param,
                     path || '?' || array_to_string(list_sort(
                       list_filter(raw,
                         s -> string_split(s, '=')[1] <> param)),
                       '&') AS residual,
                     array_to_string(list_sort(list_filter(raw,
                       s -> string_split(s, '=')[1] = param)),
                       ',') AS vsig,
                     digest
              FROM expl
            ), ev AS (
              SELECT host, param, residual,
                     count(DISTINCT vsig) AS n_vals,
                     count(DISTINCT digest) AS n_digs
              FROM ev0 GROUP BY 1, 2, 3
            ), agg AS (
              SELECT host, param, CAST(count(*) AS BIGINT) AS n_groups,
                     CAST(sum(CASE WHEN n_digs = 1 THEN 1 ELSE 0 END)
                          AS BIGINT) AS irrelevant_groups
              FROM ev WHERE n_vals >= 2 GROUP BY 1, 2
            ), seen AS (SELECT DISTINCT host, param FROM expl)
            SELECT seen.host, seen.param,
                   COALESCE(n_groups, 0) AS n_groups,
                   COALESCE(irrelevant_groups, 0) AS irrelevant_groups,
                   CAST(CASE WHEN COALESCE(n_groups, 0) > 0
                     THEN irrelevant_groups * 1000000 // n_groups
                     ELSE -1 END AS BIGINT) AS irrelevant_ppm,
                   CASE WHEN COALESCE(n_groups, 0) = 0 THEN 'unknown'
                        WHEN irrelevant_groups * 1000000 // n_groups
                             >= 1000000 THEN 'drop'
                        ELSE 'keep' END AS action
            FROM seen LEFT JOIN agg USING (host, param)
        """,
        "url_param_rewrite": """
            -- mining replay (as url_param_mining) + the rewrite: drop
            -- set per host, survivors sorted, '?' dropped when empty
            WITH v AS (
              SELECT doc_id,
                     'shop' || CAST(doc_id % 7 AS VARCHAR) || '.org' AS host,
                     '/item/' || CAST(doc_id % 211 AS VARCHAR) AS path,
                     unnest([
                       struct_pack(id := doc_id % 50, utm := 'a', vn := 1),
                       struct_pack(id := doc_id % 50, utm := 'b', vn := 2),
                       struct_pack(id := doc_id % 50 + 1, utm := 'a', vn := 3)
                     ]) AS s
              FROM documents
            ), caps AS (
              SELECT 'https://' || host || path
                       || '?id=' || CAST(s.id AS VARCHAR)
                       || '&utm=' || s.utm
                       || CASE WHEN host IN ('shop5.org', 'shop6.org')
                            THEN '&sess=' || substr(md5(
                              CAST(doc_id AS VARCHAR) || '-'
                              || CAST(s.vn AS VARCHAR)), 1, 8)
                            ELSE '' END AS url,
                     md5(host || path || ':'
                         || CAST(s.id AS VARCHAR)) AS digest
              FROM v
            ), parts AS (
              SELECT regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
                     regexp_extract(url,
                       '^[a-z]+://[^/?#]+([^?#]*)', 1) AS path,
                     list_filter(string_split(
                       regexp_extract(url, '\\?([^#]*)', 1), '&'),
                       s -> s <> '') AS raw,
                     digest
              FROM caps
            ), expl AS (
              SELECT host, path, raw, digest,
                     unnest(list_distinct(list_transform(raw,
                       s -> string_split(s, '=')[1]))) AS param
              FROM parts
            ), ev0 AS (
              SELECT host, param,
                     path || '?' || array_to_string(list_sort(
                       list_filter(raw,
                         s -> string_split(s, '=')[1] <> param)),
                       '&') AS residual,
                     array_to_string(list_sort(list_filter(raw,
                       s -> string_split(s, '=')[1] = param)),
                       ',') AS vsig,
                     digest
              FROM expl
            ), ev AS (
              SELECT host, param, residual,
                     count(DISTINCT vsig) AS n_vals,
                     count(DISTINCT digest) AS n_digs
              FROM ev0 GROUP BY 1, 2, 3
            ), agg AS (
              SELECT host, param, count(*) AS n_groups,
                     sum(CASE WHEN n_digs = 1 THEN 1 ELSE 0 END)
                       AS irrelevant_groups
              FROM ev WHERE n_vals >= 2 GROUP BY 1, 2
            ), dropsets AS (
              SELECT host, list(param) AS dps
              FROM agg
              WHERE irrelevant_groups * 1000000 // n_groups >= 1000000
              GROUP BY host
            ), urls AS (SELECT DISTINCT url FROM caps),
            uparts AS (
              SELECT url,
                     regexp_extract(url, '^([a-z]+)://', 1) AS scheme,
                     regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
                     regexp_extract(url,
                       '^[a-z]+://[^/?#]+([^?#]*)', 1) AS path,
                     list_filter(string_split(
                       regexp_extract(url, '\\?([^#]*)', 1), '&'),
                       s -> s <> '') AS raw
              FROM urls
            ), kept AS (
              SELECT url, scheme, uparts.host AS host, path,
                     list_sort(list_filter(raw,
                       s -> NOT list_contains(
                         COALESCE(dps, CAST([] AS VARCHAR[])),
                         string_split(s, '=')[1]))) AS keep
              FROM uparts LEFT JOIN dropsets
                ON uparts.host = dropsets.host
            )
            SELECT url,
                   scheme || '://' || host || path ||
                   CASE WHEN len(keep) > 0
                     THEN '?' || array_to_string(keep, '&')
                     ELSE '' END AS canonical_url
            FROM kept
        """,
        "range_join": """
            -- the BETWEEN join DuckDB can afford at this scale is the
            -- oracle for the exploded-bucketing equality join.
            WITH points AS (
              SELECT doc_id AS pid,
                     ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                       % 4294967296 AS v
              FROM documents
            ), blocks AS (
              SELECT 'AS' || CAST(i AS VARCHAR) AS asn,
                     i * (4294967296 // 97) AS lo,
                     i * (4294967296 // 97)
                       + (4294967296 // 97) * 3 // 4 - 1 AS hi
              FROM generate_series(0, 96) t(i)
            )
            SELECT p.pid, p.v, b.asn AS range_asn,
                   CAST(b.lo AS BIGINT) AS range_lo,
                   CAST(b.hi AS BIGINT) AS range_hi
            FROM points p JOIN blocks b ON p.v BETWEEN b.lo AND b.hi
        """,
        "asof_join": """
            -- DuckDB's native ASOF LEFT JOIN is the oracle: an
            -- independent engine's first-class implementation of the
            -- same backward-inclusive temporal-lookup semantics.
            WITH captures AS (
              SELECT doc_id % 97 AS url_id, doc_id AS cts,
                     md5(CAST(doc_id AS VARCHAR)) AS digest
              FROM documents
            ), queries AS (
              SELECT doc_id % 97 AS url_id,
                     doc_id + doc_id % 11 - 5 AS qts
              FROM documents
            )
            SELECT q.url_id, q.qts,
                   CAST(coalesce(c.cts, -1) AS BIGINT) AS asof_cts,
                   coalesce(c.digest, '') AS asof_digest
            FROM queries q ASOF LEFT JOIN captures c
              ON q.url_id = c.url_id AND q.qts >= c.cts
        """,
        "quality_drift": """
            -- drift replay: (epoch, bucket) counts over the full grid
            -- (absent combos = 0), ppm shares floored against each
            -- epoch's total, |delta| vs epoch 0, tv = floor(sum/2).
            WITH base AS (
              SELECT doc_id % 5 AS grp,
                     'q' || CAST(
                       (CASE WHEN q >= 815000 THEN 1 ELSE 0 END)
                       + (CASE WHEN q >= 822000 THEN 1 ELSE 0 END)
                       + (CASE WHEN q >= 828000 THEN 1 ELSE 0 END)
                       AS VARCHAR) AS bucket
              FROM (
                SELECT doc_id,
                       length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                         * 1000000 // greatest(length(text), 1) AS q
                FROM documents)
            ), counts AS (
              SELECT grp, bucket, CAST(count(*) AS BIGINT) AS n
              FROM base GROUP BY grp, bucket
            ), grid AS (
              SELECT g.grp, b.bucket
              FROM (SELECT DISTINCT grp FROM counts) g,
                   (SELECT DISTINCT bucket FROM counts) b
            ), full_grid AS (
              SELECT grid.grp, grid.bucket, coalesce(counts.n, 0) AS n
              FROM grid LEFT JOIN counts USING (grp, bucket)
            ), shares AS (
              SELECT grp, bucket, n,
                     CAST(n * 1000000 // greatest(
                       sum(n) OVER (PARTITION BY grp), 1) AS BIGINT)
                       AS share_ppm
              FROM full_grid
            ), joined AS (
              SELECT s.grp, s.bucket, s.n, s.share_ppm,
                     r.share_ppm AS ref_share_ppm,
                     CAST(abs(s.share_ppm - r.share_ppm) AS BIGINT)
                       AS abs_diff_ppm
              FROM shares s
              JOIN (SELECT bucket, share_ppm FROM shares WHERE grp = 0) r
                USING (bucket)
            )
            SELECT CAST(grp AS BIGINT) AS "group", bucket, n, share_ppm,
                   ref_share_ppm, abs_diff_ppm,
                   CAST(sum(abs_diff_ppm) OVER (PARTITION BY grp) // 2
                     AS BIGINT) AS tv_ppm
            FROM joined
        """,
        "robots_audit": """
            -- expected verdict per path class: /private/okN allowed
            -- on even hosts (longest-match Allow) and a violation on
            -- odd hosts; /privateN always a violation; /pubN clean.
            WITH fetches AS (
              SELECT doc_id % 13 AS h,
                     'https://h' || CAST(doc_id % 13 AS VARCHAR) || '.org' ||
                     CASE WHEN doc_id % 4 = 0
                          THEN '/private/ok' || CAST(doc_id AS VARCHAR)
                          WHEN doc_id % 4 = 1
                          THEN '/private/' || CAST(doc_id AS VARCHAR)
                          ELSE '/pub/' || CAST(doc_id AS VARCHAR) END AS url,
                     CASE WHEN doc_id % 4 = 0 THEN (doc_id % 13) % 2 <> 0
                          WHEN doc_id % 4 = 1 THEN TRUE
                          ELSE FALSE END AS blocked
              FROM documents
            )
            SELECT 'h' || CAST(h AS VARCHAR) || '.org' AS host,
                   CAST(count(*) AS BIGINT) AS n_fetched,
                   CAST(sum(CASE WHEN blocked THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_violations,
                   CAST(sum(CASE WHEN blocked THEN 1 ELSE 0 END) * 1000000
                        // count(*) AS BIGINT) AS violation_ppm,
                   min(CASE WHEN blocked THEN url END) AS first_violation
            FROM fetches GROUP BY h
        """,
        "postings": f"""
            -- inverted-index replay: tf per (term, doc), df gate
            -- (min 2, max 80% of corpus), 64-entry blocks with
            -- within-block positions from the same (doc_id asc) rank.
            WITH tf AS (
              SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
              FROM (SELECT doc_id, unnest({_TOKS_SQL}) AS term FROM documents)
              GROUP BY term, doc_id
            ), dft AS (
              SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term
            ), kept AS (
              SELECT tf.term, tf.doc_id, tf.tf, dft.df
              FROM tf JOIN dft USING (term)
              WHERE dft.df >= 2
                AND dft.df <= (SELECT count(*) * 800000 // 1000000
                               FROM documents)
            )
            SELECT term, df,
                   CAST((row_number() OVER w - 1) // 64 AS BIGINT) AS block,
                   CAST((row_number() OVER w - 1) % 64 AS BIGINT) AS pos,
                   doc_id, tf
            FROM kept
            WINDOW w AS (PARTITION BY term ORDER BY doc_id ASC)
        """,
        "positional_postings": f"""
            -- positional-index replay: the postings oracle plus every
            -- 0-based token offset, re-derived with generate_subscripts
            -- over the same tokenizer and exploded at offset grain so
            -- within-list order is hashed too.
            WITH toks AS (
              SELECT doc_id, {_TOKS_SQL} AS t FROM documents
            ), occ AS (
              SELECT doc_id, unnest(t) AS term,
                     CAST(generate_subscripts(t, 1) - 1 AS BIGINT) AS p
              FROM toks
            ), ptf AS (
              SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf,
                     list_sort(list(p)) AS positions
              FROM occ GROUP BY term, doc_id
            ), dft AS (
              SELECT term, CAST(count(*) AS BIGINT) AS df
              FROM ptf GROUP BY term
            ), kept AS (
              SELECT ptf.term, ptf.doc_id, ptf.tf, ptf.positions, dft.df
              FROM ptf JOIN dft USING (term)
              WHERE dft.df >= 2
                AND dft.df <= (SELECT count(*) * 800000 // 1000000
                               FROM documents)
            ), blocked AS (
              SELECT term, df,
                     CAST((row_number() OVER w - 1) // 64 AS BIGINT) AS block,
                     CAST((row_number() OVER w - 1) % 64 AS BIGINT) AS pos,
                     doc_id, tf, positions
              FROM kept
              WINDOW w AS (PARTITION BY term ORDER BY doc_id ASC)
            )
            SELECT term, df, block, pos, doc_id, tf,
                   CAST(generate_subscripts(positions, 1) - 1 AS BIGINT)
                     AS pidx,
                   CAST(unnest(positions) AS BIGINT) AS position
            FROM blocked
        """,
        "position_gaps": f"""
            -- positional gap replay: the positional-postings chain,
            -- then gap = position - lag(position) per (term, doc),
            -- first offset absolute.
            WITH toks AS (
              SELECT doc_id, {_TOKS_SQL} AS t FROM documents
            ), occ AS (
              SELECT doc_id, unnest(t) AS term,
                     CAST(generate_subscripts(t, 1) - 1 AS BIGINT) AS p
              FROM toks
            ), ptf AS (
              SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf,
                     list_sort(list(p)) AS positions
              FROM occ GROUP BY term, doc_id
            ), dft AS (
              SELECT term, CAST(count(*) AS BIGINT) AS df
              FROM ptf GROUP BY term
            ), kept AS (
              SELECT ptf.term, ptf.doc_id, ptf.tf, ptf.positions, dft.df
              FROM ptf JOIN dft USING (term)
              WHERE dft.df >= 2
                AND dft.df <= (SELECT count(*) * 800000 // 1000000
                               FROM documents)
            ), blocked AS (
              SELECT term, df,
                     CAST((row_number() OVER w - 1) // 64 AS BIGINT) AS block,
                     CAST((row_number() OVER w - 1) % 64 AS BIGINT) AS pos,
                     doc_id, tf, positions
              FROM kept
              WINDOW w AS (PARTITION BY term ORDER BY doc_id ASC)
            ), flat AS (
              SELECT term, df, block, pos, doc_id, tf,
                     CAST(generate_subscripts(positions, 1) - 1 AS BIGINT)
                       AS pidx,
                     CAST(unnest(positions) AS BIGINT) AS position
              FROM blocked
            )
            SELECT term, df, block, pos, doc_id, tf, pidx,
                   CAST(CASE WHEN pidx = 0 THEN position
                        ELSE position - lag(position) OVER w2 END
                     AS BIGINT) AS gap
            FROM flat
            WINDOW w2 AS (PARTITION BY term, doc_id ORDER BY pidx ASC)
        """,
        "phrase_search": f"""
            -- slot-alignment phrase replay for "value table": term_i
            -- at offset p votes for base p-i; a base with ALL slots is
            -- one phrase occurrence; rank (count desc, doc asc) top-20.
            WITH toks AS (
              SELECT doc_id, {_TOKS_SQL} AS t FROM documents
            ), occ AS (
              SELECT doc_id, unnest(t) AS term,
                     CAST(generate_subscripts(t, 1) - 1 AS BIGINT) AS p
              FROM toks
            ), slots(term, slot) AS (
              VALUES ('value', CAST(0 AS BIGINT)),
                     ('table', CAST(1 AS BIGINT))
            ), hits AS (
              SELECT occ.doc_id, occ.p - slots.slot AS base, slots.slot
              FROM occ JOIN slots USING (term)
              WHERE occ.p - slots.slot >= 0
            ), starts AS (
              SELECT doc_id, base FROM hits
              GROUP BY doc_id, base
              HAVING count(DISTINCT slot) = 2
            )
            SELECT doc_id,
                   CAST(count(*) AS BIGINT) AS phrase_tf,
                   CAST(min(base) AS BIGINT) AS first_pos
            FROM starts GROUP BY doc_id
            ORDER BY phrase_tf DESC, doc_id ASC LIMIT 20
        """,
        "proximity_search": f"""
            -- unordered-SpanNear replay for {{query, spark, window}},
            -- 12 tokens: a match offset whose span [p, p+11] covers
            -- ALL THREE terms is one window; count per doc, earliest
            -- kept, rank (count desc, doc asc) top-25.
            WITH toks AS (
              SELECT doc_id, {_TOKS_SQL} AS t FROM documents
            ), occ AS (
              SELECT doc_id, term, p FROM (
                SELECT doc_id, unnest(t) AS term,
                       CAST(generate_subscripts(t, 1) - 1 AS BIGINT) AS p
                FROM toks
              ) WHERE term IN ('query', 'spark', 'window')
            ), full_cover AS (
              SELECT m1.doc_id, m1.p AS start
              FROM occ m1 JOIN occ m2
                ON m1.doc_id = m2.doc_id
               AND m2.p >= m1.p AND m2.p < m1.p + 12
              GROUP BY m1.doc_id, m1.p
              HAVING count(DISTINCT m2.term) = 3
            )
            SELECT doc_id,
                   CAST(count(*) AS BIGINT) AS n_windows,
                   CAST(min(start) AS BIGINT) AS best_start
            FROM full_cover GROUP BY doc_id
            ORDER BY n_windows DESC, doc_id ASC LIMIT 25
        """,
        "boolean_search": f"""
            -- BooleanQuery replay: conditional DISTINCT clause counts
            -- per doc; must=1/1 and not=0 gate, n_should ranks.
            WITH toks AS (
              SELECT doc_id, {_TOKS_SQL} AS t FROM documents
            ), occ AS (
              SELECT doc_id, term FROM (
                SELECT doc_id, unnest(t) AS term FROM toks
              ) WHERE term IN ('table', 'query', 'spark', 'window',
                               'vector')
            ), g AS (
              SELECT doc_id,
                     count(DISTINCT CASE WHEN term IN ('table')
                                         THEN term END) AS n_must,
                     CAST(count(DISTINCT CASE WHEN term IN
                       ('query', 'spark', 'window') THEN term END)
                       AS BIGINT) AS n_should,
                     count(DISTINCT CASE WHEN term IN ('vector')
                                         THEN term END) AS n_not
              FROM occ GROUP BY doc_id
            )
            SELECT doc_id, n_should FROM g
            WHERE n_must = 1 AND n_not = 0
            ORDER BY n_should DESC, doc_id ASC LIMIT 30
        """,
        "term_cooccurrence": f"""
            -- association-ratio replay for seed 'spark': banded
            -- positional join (|dp| <= 5, neighbor <> seed), pairs >= 2,
            -- lift = pairs*T*1e6 // (cnt_seed*cnt_term) in HUGEINT
            -- floor division, top-15 per seed (lift desc, term asc).
            WITH toks AS (
              SELECT doc_id, {_TOKS_SQL} AS t FROM documents
            ), occ AS (
              SELECT doc_id, unnest(t) AS term,
                     CAST(generate_subscripts(t, 1) - 1 AS BIGINT) AS p
              FROM toks
            ), tot AS (
              SELECT term, CAST(count(*) AS BIGINT) AS cnt
              FROM occ GROUP BY term
            ), tt AS (
              SELECT CAST(count(*) AS BIGINT) AS t FROM occ
            ), so AS (
              SELECT doc_id, p AS sp, term AS seed FROM occ
              WHERE term IN ('spark')
            ), pr AS (
              SELECT so.seed, o.term, CAST(count(*) AS BIGINT) AS pairs
              FROM so JOIN occ o
                ON so.doc_id = o.doc_id
               AND abs(o.p - so.sp) <= 5 AND o.term <> so.seed
              GROUP BY so.seed, o.term
              HAVING count(*) >= 2
            ), sc AS (
              SELECT pr.seed, pr.term, pr.pairs,
                     CAST(CAST(pr.pairs AS HUGEINT)
                          * (SELECT t FROM tt) * 1000000
                          // (CAST(cs.cnt AS HUGEINT) * ct.cnt)
                       AS BIGINT) AS lift_ppm
              FROM pr
              JOIN tot cs ON cs.term = pr.seed
              JOIN tot ct ON ct.term = pr.term
            )
            SELECT seed, term, pairs, lift_ppm,
                   CAST(row_number() OVER (
                     PARTITION BY seed
                     ORDER BY lift_ppm DESC, term ASC) AS BIGINT) AS rank
            FROM sc
            QUALIFY rank <= 15
        """,
        "spell_correct": f"""
            -- brute-force completeness rule: query x FULL VOCAB
            -- Levenshtein <= 2 (no candidate pruning on the oracle
            -- side), rank (distance, cnt desc, term). The engine's
            -- deletion-dictionary join must find every one of these.
            WITH toks AS (
              SELECT doc_id, {_TOKS_SQL} AS t FROM documents
            ), vocab AS (
              SELECT term, CAST(count(*) AS BIGINT) AS cnt FROM (
                SELECT unnest(t) AS term FROM toks
              ) GROUP BY term HAVING count(*) >= 2
            ), q(query) AS (
              VALUES ('tabel'), ('sprk'), ('window'), ('qury'),
                     ('scann')
            ), c AS (
              SELECT q.query, v.term,
                     CAST(levenshtein(q.query, v.term) AS BIGINT)
                       AS distance,
                     v.cnt
              FROM q CROSS JOIN vocab v
              WHERE levenshtein(q.query, v.term) <= 2
            )
            SELECT query, term AS suggestion, distance, cnt,
                   CAST(row_number() OVER (
                     PARTITION BY query
                     ORDER BY distance ASC, cnt DESC, term ASC)
                     AS BIGINT) AS rank
            FROM c
            QUALIFY rank <= 5
        """,
        "concordance": f"""
            -- KWIC replay: 0-based occurrence positions of 'spark',
            -- left = tokens [max(0,p-4), p-1], right = [p+1, p+4],
            -- re-sliced 1-based and clipped by DuckDB list slicing.
            WITH toks AS (
              SELECT doc_id, {_TOKS_SQL} AS t FROM documents
            ), m AS (
              SELECT doc_id, p FROM (
                SELECT doc_id, unnest(t) AS term,
                       CAST(generate_subscripts(t, 1) - 1 AS BIGINT) AS p
                FROM toks
              ) WHERE term = 'spark'
            )
            -- DuckDB list slicing yields NULL (not []) when the
            -- bounds fall outside the list; the engine's array_join
            -- renders '' — coalesce to state the same rule.
            SELECT m.doc_id, m.p AS pos,
                   coalesce(array_to_string(
                     t.t[CAST(greatest(0, m.p - 4) + 1 AS BIGINT)
                         : CAST(m.p AS BIGINT)], ' '), '') AS "left",
                   'spark' AS match,
                   coalesce(array_to_string(
                     t.t[CAST(m.p + 2 AS BIGINT)
                         : CAST(m.p + 5 AS BIGINT)], ' '), '') AS "right"
            FROM m JOIN toks t USING (doc_id)
        """,
        "prefix_suggest": f"""
            -- autocomplete replay: vocab counts, starts_with join,
            -- (cnt desc, term asc) top-5 per prefix.
            WITH toks AS (
              SELECT doc_id, {_TOKS_SQL} AS t FROM documents
            ), vocab AS (
              SELECT term, CAST(count(*) AS BIGINT) AS cnt FROM (
                SELECT unnest(t) AS term FROM toks
              ) GROUP BY term
            ), p(prefix) AS (
              VALUES ('s'), ('c'), ('b'), ('w'), ('zz')
            )
            SELECT prefix, term, cnt,
                   CAST(row_number() OVER (
                     PARTITION BY prefix
                     ORDER BY cnt DESC, term ASC) AS BIGINT) AS rank
            FROM vocab JOIN p ON starts_with(term, prefix)
            QUALIFY rank <= 5
        """,
        "snippets": f"""
            -- best-fragment replay for {{query, spark, window}}, 12
            -- tokens: score every match offset by DISTINCT query terms
            -- inside [p, p+11] via a positional self-join (the engine
            -- uses a range-frame window — different formulation, same
            -- rule), pick (score desc, offset asc), slice the token
            -- list for the rendering.
            WITH toks AS (
              SELECT doc_id, {_TOKS_SQL} AS t FROM documents
            ), occ AS (
              SELECT doc_id, term, p FROM (
                SELECT doc_id, unnest(t) AS term,
                       CAST(generate_subscripts(t, 1) - 1 AS BIGINT) AS p
                FROM toks
              ) WHERE term IN ('query', 'spark', 'window')
            ), sc AS (
              SELECT m1.doc_id, m1.p AS start,
                     CAST(count(DISTINCT m2.term) AS BIGINT) AS n_terms
              FROM occ m1 JOIN occ m2
                ON m1.doc_id = m2.doc_id
               AND m2.p >= m1.p AND m2.p < m1.p + 12
              GROUP BY m1.doc_id, m1.p
            ), win AS (
              SELECT doc_id, start, n_terms,
                     row_number() OVER (
                       PARTITION BY doc_id
                       ORDER BY n_terms DESC, start ASC) AS rn
              FROM sc
            )
            SELECT w.doc_id, CAST(w.start AS BIGINT) AS start, w.n_terms,
                   array_to_string(
                     t.t[w.start + 1 : w.start + 12], ' ') AS snippet
            FROM win w JOIN toks t USING (doc_id) WHERE w.rn = 1
        """,
        "token_budget": """
            -- the rule the histogram path must equal: one global
            -- cumulative-sum window over (quality desc, id asc),
            -- selected while the running total stays within 60% of
            -- the corpus's tokens. All integer.
            WITH base AS (
              SELECT doc_id,
                     CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                          * 1000000 // greatest(length(text), 1) AS BIGINT)
                       AS quality_ppm,
                     CAST(len(regexp_extract_all(
                       text, '[A-Za-z]+|[0-9]+|[^\\sA-Za-z0-9]')) AS BIGINT)
                       AS n_tokens
              FROM documents
            ), b AS (
              SELECT CAST(sum(n_tokens) * 6 // 10 AS BIGINT) AS budget FROM base
            )
            SELECT doc_id, quality_ppm, n_tokens,
                   CAST(sum(n_tokens) OVER (
                     ORDER BY quality_ppm DESC, doc_id ASC
                     ROWS UNBOUNDED PRECEDING) AS BIGINT)
                     <= (SELECT budget FROM b) AS selected
            FROM base
        """,
        "fair_share": """
            -- water-filling replay: histogram of distinct demand
            -- values, piecewise-linear used(T) to find the segment,
            -- in-segment floor division for the level, (demand desc,
            -- host asc) ranking for the r leftover units. All integer.
            WITH d AS (
              SELECT 'h' || CAST(user_id % 37 AS VARCHAR) AS host,
                     CAST(count(*) AS BIGINT) AS demand
              FROM events GROUP BY 1
            ), b AS (
              SELECT CAST(count(*) * 6 // 10 AS BIGINT) AS budget FROM events
            ), hist AS (
              SELECT demand, CAST(count(*) AS BIGINT) AS n_at FROM d GROUP BY demand
              UNION ALL SELECT 0, 0
            ), lev AS (
              SELECT demand, n_at,
                     CAST(coalesce(sum(n_at * demand) OVER
                       (ORDER BY demand ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING), 0) AS BIGINT) AS below_mass,
                     CAST(coalesce(sum(n_at) OVER
                       (ORDER BY demand ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING), 0) AS BIGINT) AS hosts_below,
                     CAST(sum(n_at) OVER () AS BIGINT) AS n_total
              FROM hist
            ), usage AS (
              SELECT demand, n_at, hosts_below, n_total,
                     below_mass + (n_total - hosts_below) * demand AS used
              FROM lev
            ), dstar AS (
              SELECT demand, used, n_total - hosts_below - n_at AS hosts_gt
              FROM usage, b WHERE used <= budget
              ORDER BY demand DESC LIMIT 1
            ), scal AS (
              SELECT CAST(CASE WHEN hosts_gt > 0
                          THEN demand + (budget - used) // hosts_gt
                          ELSE demand END AS BIGINT) AS t_level,
                     CAST(CASE WHEN hosts_gt > 0
                          THEN budget - used
                               - hosts_gt * ((budget - used) // hosts_gt)
                          ELSE 0 END AS BIGINT) AS r_extra
              FROM dstar, b
            ), ranked AS (
              SELECT d.host, d.demand, s.t_level, s.r_extra,
                     row_number() OVER (
                       PARTITION BY (d.demand > s.t_level)
                       ORDER BY d.demand DESC, d.host ASC) AS rk,
                     d.demand > s.t_level AS capped
              FROM d, scal s
            )
            SELECT host, demand,
                   CAST(least(demand, t_level)
                        + CASE WHEN capped AND rk <= r_extra THEN 1 ELSE 0 END
                     AS BIGINT) AS alloc
            FROM ranked
        """,
        "recrawl_due": """
            -- relational recomputation of the recrawl schedule: period
            -- table, integer ceiling division, modified-since override
            WITH hints AS (
              SELECT 'https://rc.example.org/p/' || doc_id AS url,
                     (['always','hourly','daily','weekly','monthly','yearly','never'])
                       [CAST(doc_id % 7 AS INT) + 1] AS freq,
                     '2025-07-' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0')
                       AS lastmod,
                     CAST((doc_id % 10) * 100000 AS INT) AS priority_ppm
              FROM documents WHERE doc_id % 3 <> 0
            ),
            seen AS (
              SELECT 'https://rc.example.org/p/' || doc_id AS url,
                     CAST(doc_id % 5 AS INT) AS fetched_epoch
              FROM documents
            ),
            j AS (
              SELECT s.url, s.fetched_epoch, h.lastmod, h.priority_ppm,
                     CASE h.freq
                       WHEN 'always' THEN 0 WHEN 'hourly' THEN 1
                       WHEN 'daily' THEN 24 WHEN 'weekly' THEN 168
                       WHEN 'monthly' THEN 720 WHEN 'yearly' THEN 8760
                       WHEN 'never' THEN -1 ELSE 168 END AS hours
              FROM seen s LEFT JOIN hints h USING (url)
            ),
            sched AS (
              SELECT url, fetched_epoch, priority_ppm,
                     CASE WHEN hours >= 0 THEN fetched_epoch
                          + greatest(1, (hours + 23) // 24) END AS due_epoch,
                     CASE WHEN lastmod IS NOT NULL
                               AND CAST(lastmod AS DATE) >= DATE '2025-07-25'
                          THEN 'modified'
                          WHEN hours >= 0 AND fetched_epoch
                               + greatest(1, (hours + 23) // 24) <= 8
                          THEN 'period' END AS reason
              FROM j
            )
            SELECT url, fetched_epoch,
                   CAST(COALESCE(due_epoch, -1) AS INT) AS due_epoch,
                   CAST(COALESCE(priority_ppm, -1) AS INT) AS priority_ppm,
                   reason
            FROM sched WHERE reason IS NOT NULL
        """,
        "redirect_resolve": """
            -- hop-bounded recursive re-walk of the same redirect table;
            -- terminal rows, exact hop counts, and cycle rows must all
            -- match the pointer-doubling resolution
            WITH RECURSIVE redirects AS (
              SELECT 'https://r.example.org/p/' || doc_id AS url,
                     'https://r.example.org/p/' ||
                       (CASE WHEN doc_id % 64 = 0 THEN doc_id + 3
                             ELSE doc_id - 1 END) AS target
              FROM documents
              WHERE doc_id % 16 <> 0 OR doc_id % 64 = 0
            ),
            walk AS (
              SELECT url AS src, target AS cur, 1 AS hops FROM redirects
              UNION ALL
              SELECT w.src, r.target, w.hops + 1
              FROM walk w JOIN redirects r ON w.cur = r.url
              WHERE w.hops < 32
            ),
            last AS (
              SELECT src, cur, hops,
                     row_number() OVER (PARTITION BY src ORDER BY hops DESC) AS rn
              FROM walk
            ),
            srcs AS (SELECT DISTINCT url FROM redirects)
            SELECT l.src AS url,
                   CASE WHEN s.url IS NULL THEN l.cur END AS final_url,
                   CAST(COALESCE(CASE WHEN s.url IS NULL THEN l.hops END, -1)
                        AS INT) AS hops,
                   (s.url IS NULL) AS resolved
            FROM last l
            LEFT JOIN srcs s ON l.cur = s.url
            WHERE l.rn = 1
        """,
        "drain_plan": """
            -- budget = max(1, floor(60/delay)), delay<=0 unlimited,
            -- hostless default 2s; exact integer ceiling division
            WITH f AS (
              SELECT 'h' || (doc_id % 30) AS host FROM documents
            ),
            pend AS (
              SELECT host, count(*) AS pending FROM f GROUP BY host
            ),
            rb AS (
              SELECT DISTINCT 'h' || (doc_id % 30) AS host,
                     CASE (doc_id % 30) % 5
                       WHEN 0 THEN 0.5 WHEN 1 THEN 2.0 WHEN 2 THEN 10.0
                       WHEN 3 THEN 0.0 ELSE 30.0 END AS delay
              FROM documents WHERE doc_id % 30 < 20
            ),
            b AS (
              SELECT p.host, p.pending,
                     CAST(COALESCE(
                       CASE WHEN r.delay > 0
                              THEN greatest(1, floor(60.0 / r.delay))
                            WHEN r.delay IS NOT NULL THEN 1000000000
                       END, 30) AS INT) AS budget
              FROM pend p LEFT JOIN rb r USING (host)
            )
            SELECT host, CAST(pending AS BIGINT) AS pending, budget,
                   CAST((pending + budget - 1) // budget AS INT)
                     AS epochs_to_drain
            FROM b
        """,
        "host_priors": """
            WITH d AS (
              SELECT 'q' || (doc_id % 13) AS host,
                     (n_chars >= 400) AS keep, lang
              FROM documents
            ),
            per AS (
              SELECT host, lang, count(*) AS n,
                     sum(CASE WHEN keep THEN 1 ELSE 0 END) AS kept
              FROM d GROUP BY host, lang
            ),
            ranked AS (
              SELECT host, lang,
                     row_number() OVER (
                       PARTITION BY host ORDER BY n DESC, lang ASC
                     ) AS rn
              FROM per
            ),
            agg AS (
              SELECT host, CAST(sum(n) AS BIGINT) AS n_docs,
                     CAST(sum(kept) AS BIGINT) AS n_kept
              FROM per GROUP BY host
            )
            SELECT a.host, a.n_docs, a.n_kept,
                   CAST((a.n_kept * 1000000) // a.n_docs AS BIGINT)
                     AS keep_ppm,
                   r.lang AS top_lang
            FROM agg a JOIN ranked r ON a.host = r.host AND r.rn = 1
        """,
        "unicode_clean": _unicode_clean_oracle_sql(),
        "media_sniff": """
            -- construct->parse roundtrip: the sniffer must recover
            -- exactly the header fields the builder derived from
            -- doc_id (png/gif/jpeg/webp carry dimensions, wav/ogg
            -- carry sample_rate/channels, mp3's rate comes from the
            -- MPEG-1 index table, mp4/avif are format-only, garbage
            -- is invalid)
            WITH m AS (
              SELECT doc_id, CAST(doc_id % 10 AS INT) AS k FROM documents
            )
            SELECT doc_id AS media_id,
                   CASE WHEN k = 0 THEN 'png' WHEN k = 1 THEN 'gif'
                        WHEN k = 2 THEN 'jpeg' WHEN k = 3 THEN 'wav'
                        WHEN k = 4 THEN 'webp' WHEN k = 5 THEN 'mp3'
                        WHEN k = 6 THEN 'ogg' WHEN k = 7 THEN 'mp4'
                        WHEN k = 8 THEN 'avif'
                   END AS format,
                   CAST(CASE WHEN k <= 2 OR k = 4 THEN doc_id % 1000 + 1
                             ELSE -1 END AS INT) AS width,
                   CAST(CASE WHEN k <= 2 OR k = 4
                             THEN (doc_id * 7) % 1000 + 1
                             ELSE -1 END AS INT) AS height,
                   CAST(CASE WHEN k = 3 OR k = 6
                             THEN 8000 + (doc_id % 8) * 4000
                             WHEN k = 5 THEN CASE doc_id % 3
                               WHEN 0 THEN 44100 WHEN 1 THEN 48000
                               ELSE 32000 END
                             ELSE -1 END AS INT) AS sample_rate,
                   CAST(CASE WHEN k IN (3, 5, 6) THEN doc_id % 2 + 1
                             ELSE -1 END AS INT) AS channels,
                   (k <= 8) AS valid
            FROM m
        """,
        "cdx_revisits": """
            -- the same capture log; revisit = digest's first ts per
            -- (url, digest) precedes this ts, first/changed split on
            -- the url's overall first capture
            WITH cdx AS (
              SELECT 'https://w.example.org/p/' || (doc_id % 40) AS url,
                     lpad(CAST(doc_id AS VARCHAR), 14, '0') AS ts,
                     md5('https://w.example.org/p/' || (doc_id % 40)
                         || '#' || ((doc_id // 40) // 2)) AS digest
              FROM documents
            ),
            orig AS (
              SELECT url, digest, min(ts) AS orig_ts
              FROM cdx GROUP BY url, digest
            ),
            firsts AS (
              SELECT url, min(ts) AS url_first_ts FROM cdx GROUP BY url
            )
            SELECT c.url, c.ts, c.digest,
                   CASE WHEN c.ts > o.orig_ts THEN 'revisit'
                        WHEN c.ts = f.url_first_ts THEN 'first'
                        ELSE 'changed' END AS kind,
                   CASE WHEN c.ts > o.orig_ts THEN o.orig_ts END
                     AS original_ts
            FROM cdx c
            JOIN orig o USING (url, digest)
            JOIN firsts f USING (url)
        """,
        "page_meta": """
            SELECT 'https://m.example.org/p/' || doc_id AS url,
                   'Doc ' || doc_id AS title,
                   CASE WHEN doc_id % 2 = 0
                        THEN 'About doc ' || doc_id || '.' END
                     AS meta_description,
                   CASE WHEN doc_id % 3 = 0 THEN 'OG ' || doc_id END
                     AS og_title,
                   CASE WHEN doc_id % 4 = 0
                        THEN 'https://img/' || doc_id || '.png' END
                     AS og_image
            FROM documents
        """,
        "charset_detect": """
            -- construct->parse roundtrip from doc_id arithmetic
            SELECT 'https://cs.example.org/p/' || doc_id AS url,
                   CASE CAST(doc_id % 6 AS INT)
                     WHEN 0 THEN 'utf-8' WHEN 1 THEN 'utf-16le'
                     WHEN 2 THEN 'utf-16be' WHEN 3 THEN 'iso-8859-1'
                     WHEN 4 THEN 'windows-1252' ELSE 'utf-8' END AS charset,
                   CASE WHEN doc_id % 6 <= 2 THEN 'bom'
                        WHEN doc_id % 6 <= 4 THEN 'meta'
                        ELSE 'default' END AS charset_source
            FROM documents
        """,
        "sitemap_coverage": """
            WITH u AS (
              SELECT 'sc' || (doc_id % 7) || '.example.org' AS host,
                     (doc_id % 3 <> 0) AS d, (doc_id % 2 = 0) AS s
              FROM documents
            )
            SELECT host,
                   CAST(sum(CASE WHEN d THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_declared,
                   CAST(sum(CASE WHEN d AND s THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_declared_crawled,
                   CAST(sum(CASE WHEN NOT d AND s THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_crawled_undeclared,
                   CAST(CASE WHEN sum(CASE WHEN d THEN 1 ELSE 0 END) > 0
                        THEN (sum(CASE WHEN d AND s THEN 1 ELSE 0 END)
                              * 1000000)
                             // sum(CASE WHEN d THEN 1 ELSE 0 END)
                        ELSE 0 END AS BIGINT) AS coverage_ppm
            FROM u WHERE d OR s GROUP BY host
        """,
        "robots_allow": """
            -- longest-match precedence replayed relationally: blocked
            -- iff the longest matching Disallow beats the longest
            -- matching Allow; ruleless hosts keep everything
            WITH urls AS (
              SELECT 'https://r' || (doc_id % 6) || '.example.org' ||
                     CASE CAST(doc_id % 4 AS INT)
                       WHEN 0 THEN '/private/doc/' || doc_id
                       WHEN 1 THEN '/private/pub/' || doc_id
                       WHEN 2 THEN '/open/' || doc_id
                       ELSE '/tmp/' || doc_id END AS url,
                     CAST(doc_id % 6 AS INT) AS h,
                     CASE CAST(doc_id % 4 AS INT)
                       WHEN 0 THEN '/private/doc/' || doc_id
                       WHEN 1 THEN '/private/pub/' || doc_id
                       WHEN 2 THEN '/open/' || doc_id
                       ELSE '/tmp/' || doc_id END AS path
              FROM documents
            ),
            scored AS (
              SELECT url, h,
                     CASE WHEN h < 4 THEN
                       coalesce(list_max(list_transform(
                         ['/private', '/tmp'],
                         p -> CASE WHEN starts_with(path, p)
                                   THEN length(p) ELSE 0 END)), 0)
                     ELSE 0 END AS dis_len,
                     CASE WHEN h < 4 AND h % 2 = 0 THEN
                       coalesce(list_max(list_transform(
                         ['/private/pub'],
                         p -> CASE WHEN starts_with(path, p)
                                   THEN length(p) ELSE 0 END)), 0)
                     ELSE 0 END AS alw_len
              FROM urls
            )
            SELECT url FROM scored WHERE dis_len <= alw_len
        """,
        "trap_detect": """
            -- relational re-derivation of the trap signals: depth,
            -- duplicate path segments, distinct-query rollup per
            -- (host, path), reason precedence depth > loop > explosion
            WITH urls AS (
              SELECT CASE
                WHEN doc_id % 10 < 2 THEN
                  'https://h' || (doc_id % 5) || '.example.org' ||
                  '/cal/2024/01/2024/01/p' || (doc_id % 4)
                WHEN doc_id % 10 < 4 THEN
                  'https://h' || (doc_id % 5) || '.example.org' ||
                  '/a/b/c/d/e/f/g/h/i/' || doc_id
                WHEN (doc_id % 10) % 2 = 0 THEN
                  'https://h' || (doc_id % 5) || '.example.org' ||
                  '/p/' || (doc_id % 10) || '?sid=' || doc_id
                ELSE
                  'https://h' || (doc_id % 5) || '.example.org' ||
                  '/q/' || (doc_id % 50)
              END AS url
              FROM documents
            ),
            sig AS (
              SELECT url,
                     regexp_extract(url, '^https://([^/]+)', 1) AS host,
                     regexp_extract(url, '^https://[^/]+([^?]*)', 1) AS path,
                     nullif(regexp_extract(url, '\\?(.*)$', 1), '') AS query,
                     list_filter(string_split(
                       regexp_extract(url, '^https://[^/]+([^?]*)', 1), '/'),
                       s -> s <> '') AS segs
              FROM urls
            ),
            roll AS (
              SELECT host, path, count(DISTINCT query) AS path_queries
              FROM sig GROUP BY host, path
            )
            SELECT s.url, s.host,
                   len(s.segs) AS depth,
                   len(s.segs) - len(list_distinct(s.segs)) AS dup_segments,
                   r.path_queries,
                   CASE WHEN len(s.segs) > 8 THEN 'depth'
                        WHEN len(s.segs) - len(list_distinct(s.segs)) >= 2
                          THEN 'loop'
                        WHEN r.path_queries >= 20 THEN 'query_explosion'
                   END AS trap_reason
            FROM sig s JOIN roll r USING (host, path)
        """,
        "anchor_profile": f"""
            -- inbound anchor-term aggregation: the engine's keyword
            -- tokenizer over each link's anchor, top-3 per target
            WITH edges AS (
              SELECT 'https://t.example.org/d/' || (doc_id % 37) AS target,
                     substr(text, 1, 80) AS anchor
              FROM documents
            ), words AS (
              SELECT target,
                     unnest(list_filter(string_split_regex(lower(anchor),
                       '[^a-z0-9_]+'), x -> x <> '')) AS word
              FROM edges
            ), counts AS (
              SELECT target, word, count(*) AS freq FROM words
              WHERE length(word) > 2 AND word NOT IN ({_STOPLIST_SQL})
              GROUP BY target, word
            )
            SELECT target, word, freq,
                   row_number() OVER (
                     PARTITION BY target ORDER BY freq DESC, word ASC
                   ) AS rank
            FROM counts QUALIFY rank <= 3
        """,
        "inlink_stats": """
            WITH edges AS (
              SELECT 'https://s' || (doc_id % 11) || '.example.org/a/' ||
                       (doc_id % 200) AS src,
                     'https://t.example.org/d/' || (doc_id % 37) AS target
              FROM documents
            )
            SELECT target, count(*) AS n_inlinks,
                   count(DISTINCT src) AS n_src_pages,
                   count(DISTINCT regexp_extract(src, '^https://([^/]+)', 1))
                     AS n_src_hosts
            FROM edges GROUP BY target
        """,
        "bm25_topk": f"""
            -- BM25 fixed-point replay: tf/df/dl/N/T recomputed
            -- relationally, the same ppm-rounded idf, then the exact
            -- integer formula in HUGEINT with // floor division
            WITH words AS (
              SELECT doc_id, unnest({_TOKS_SQL}) AS word FROM documents
            ), kept AS (
              SELECT doc_id, word FROM words
              WHERE length(word) > 2 AND word NOT IN ({_STOPLIST_SQL})
            ), dls AS (
              SELECT doc_id, count(*) AS dl FROM kept GROUP BY doc_id
            ), tfs AS (
              SELECT doc_id, word, count(*) AS tf
              FROM kept GROUP BY doc_id, word
            ), dfs AS (
              SELECT word, count(*) AS df FROM tfs GROUP BY word
            ), nt AS (
              SELECT count(*) AS n, CAST(sum(dl) AS BIGINT) AS t FROM dls
            ), scored AS (
              SELECT tfs.doc_id, tfs.word, tfs.tf, dfs.df, dls.dl,
                     CAST((CAST(floor(ln(CAST(2 * (nt.n + 1) AS DOUBLE)
                                  / (2 * dfs.df + 1)) * 1000000 + 0.5)
                            AS HUGEINT)
                           * 44 * tfs.tf * nt.t)
                          // (CAST(20 AS HUGEINT) * tfs.tf * nt.t
                              + 6 * nt.t + 18 * dls.dl * nt.n)
                          AS BIGINT) AS score_u
              FROM tfs
              JOIN dfs USING (word)
              JOIN dls USING (doc_id)
              CROSS JOIN nt
            )
            SELECT doc_id, word, tf, df, dl, score_u,
                   row_number() OVER (
                     PARTITION BY doc_id ORDER BY score_u DESC, word ASC
                   ) AS rank
            FROM scored QUALIFY rank <= 3
        """,
        "bm25_search": f"""
            -- DAAT retrieval replay: index build (tf/df, min_df=2 /
            -- 80% gates), query formation (top-6 df terms dealt into
            -- 3 queries), the same ppm-rounded idf + exact integer
            -- per-pair score in HUGEINT //, per-doc sum, top-5 rank
            WITH words AS (
              SELECT doc_id, unnest({_TOKS_SQL}) AS term FROM documents
            ), dl0 AS (
              SELECT doc_id, CAST(len({_TOKS_SQL}) AS BIGINT) AS dl
              FROM documents
            ), nt AS (
              SELECT CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(dl) AS BIGINT) AS t
              FROM dl0
            ), tf AS (
              SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
              FROM words GROUP BY term, doc_id
            ), dft AS (
              SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term
            ), kept AS (
              SELECT tf.term, tf.doc_id, tf.tf, dft.df
              FROM tf JOIN dft USING (term)
              WHERE dft.df >= 2
                AND dft.df <= (SELECT count(*) * 800000 // 1000000
                               FROM documents)
            ), ranked AS (
              SELECT term,
                     row_number() OVER (ORDER BY df DESC, term ASC) AS r
              FROM (SELECT DISTINCT term, df FROM kept)
              QUALIFY r <= 6
            ), qterms AS (
              SELECT CAST(((r - 1) % 3) + 1 AS BIGINT) AS query_id, term
              FROM ranked
            ), hits AS (
              SELECT q.query_id, k.doc_id, k.tf, k.df, d.dl
              FROM qterms q
              JOIN kept k USING (term)
              JOIN dl0 d USING (doc_id)
            ), scored AS (
              SELECT query_id, doc_id,
                     CAST((CAST(floor(ln(CAST(2 * (nt.n + 1) AS DOUBLE)
                                  / (2 * hits.df + 1)) * 1000000 + 0.5)
                            AS HUGEINT)
                           * 44 * hits.tf * nt.t)
                          // (CAST(20 AS HUGEINT) * hits.tf * nt.t
                              + 6 * nt.t + 18 * hits.dl * nt.n)
                          AS BIGINT) AS score_u
              FROM hits CROSS JOIN nt
            ), agg AS (
              SELECT query_id, doc_id,
                     CAST(sum(score_u) AS BIGINT) AS score_u,
                     CAST(count(*) AS BIGINT) AS n_terms
              FROM scored GROUP BY query_id, doc_id
            )
            SELECT query_id, doc_id, score_u, n_terms,
                   row_number() OVER (
                     PARTITION BY query_id
                     ORDER BY score_u DESC, doc_id ASC
                   ) AS rank
            FROM agg QUALIFY rank <= 5
        """,
        "cluster_reps": f"""
            -- recursive-CTE closure over the same MinHash pair graph,
            -- then one window per component: keep = argmax
            -- (n_chars desc, doc_id asc), singletons keep themselves
            WITH RECURSIVE {{mh_pair_ctes}}, e AS (
              SELECT id_a AS src, id_b AS dst FROM mh_pairs
              UNION
              SELECT id_b, id_a FROM mh_pairs
            ), walk(node, lbl) AS (
              SELECT doc_id, doc_id FROM documents
              UNION
              SELECT e.dst, w.lbl FROM walk w JOIN e ON e.src = w.node
            ), comp AS (
              SELECT node AS doc_id, min(lbl) AS component
              FROM walk GROUP BY node
            ), members AS (
              SELECT c.doc_id, c.component, d.n_chars
              FROM comp c JOIN documents d USING (doc_id)
            ), ranked AS (
              SELECT doc_id, component,
                     row_number() OVER (
                       PARTITION BY component
                       ORDER BY n_chars DESC, doc_id ASC
                     ) AS rn,
                     count(*) OVER (PARTITION BY component) AS cluster_size
              FROM members
            )
            SELECT doc_id, component, (rn = 1) AS keep, cluster_size
            FROM ranked
        """.format(mh_pair_ctes=mh_pair_ctes),
        "paragraph_dedup": """
            WITH salted AS (
              SELECT doc_id,
                     text || chr(10) ||
                     'Subscribe to our newsletter for updates today.' || chr(10) ||
                     'All rights reserved by the example site.' AS text
              FROM documents
            ), split AS (
              SELECT doc_id, string_split(text, chr(10)) AS l FROM salted
            ), paras AS (
              SELECT doc_id,
                     unnest(list_transform(generate_series(1, len(l)),
                                           i -> struct_pack(idx := i, p := l[i]))) AS u
              FROM split
            ), clean AS (
              SELECT doc_id, u.idx - 1 AS para_idx, trim(u.p) AS para
              FROM paras
              WHERE trim(u.p) <> ''
            ), hashed AS (
              SELECT doc_id, para_idx,
                     md5(trim(regexp_replace(lower(para), '\\s+', ' ', 'g'))) AS para_md5,
                     len(list_filter(string_split_regex(para, '\\s+'), w -> w <> '')) AS n_words
              FROM clean
            )
            SELECT doc_id, para_idx, para_md5, n_words,
                   count(*) OVER (PARTITION BY para_md5) AS dup_count,
                   (row_number() OVER (PARTITION BY para_md5
                                       ORDER BY doc_id, para_idx) = 1) AS keep
            FROM hashed
        """,
        "dedup_minhash_lsh": f"""
            WITH {mh_pair_ctes}
            SELECT id_a, id_b, inter_size, union_size FROM mh_pairs
        """,
        "dedup_minhash_incr": f"""
            -- the batch pair set restricted to pairs touching the
            -- delta (doc_id % 4 = 0): exactly what incremental
            -- delta-vs-index + delta-vs-delta must produce
            WITH {mh_pair_ctes}
            SELECT id_a, id_b, inter_size, union_size,
                   CASE WHEN id_a % 4 = 0 AND id_b % 4 = 0
                        THEN 'delta_delta' ELSE 'delta_index' END AS pair_kind
            FROM mh_pairs
            WHERE id_a % 4 = 0 OR id_b % 4 = 0
        """,
        "dedup_components": f"""
            WITH RECURSIVE {mh_pair_ctes}, e AS (
              SELECT id_a AS src, id_b AS dst FROM mh_pairs
              UNION
              SELECT id_b, id_a FROM mh_pairs
            ), walk(node, lbl) AS (
              SELECT doc_id, doc_id FROM documents
              UNION
              SELECT e.dst, w.lbl FROM walk w JOIN e ON e.src = w.node
            )
            SELECT node AS doc_id,
                   min(lbl) AS component,
                   min(lbl) = node AS is_canonical
            FROM walk GROUP BY node
        """,
        "url_filter": _url_filter_oracle_sql(),
        "corpus_funnel": _corpus_funnel_oracle_sql(),
        "funnel_reasons": _corpus_funnel_oracle_sql(per_doc=True),
        "stratified_sample": _stratified_sample_oracle_sql(),
        "priority_sample": _PRIORITY_SAMPLE_ORACLE,
        "hll_host_distinct": _hll_oracle_sql(),
        "cms_hot_hosts": _CMS_ORACLE,
        "cuckoo_seen": _CUCKOO_ORACLE,
        "host_triangles": _TRIANGLES_ORACLE,
        "ip_politeness": _IP_POLITENESS_ORACLE,
        "latency_quantiles": _LATENCY_Q_ORACLE,
        "host_volatility": _VOLATILITY_ORACLE,
        "ccnet_ppl": _ccnet_ppl_oracle_sql(),
        "semdedup": """
            WITH RECURSIVE med AS (
              SELECT label AS cell_id, embedding::DOUBLE[] AS centroid
              FROM embeddings
              QUALIFY row_number() OVER (PARTITION BY label ORDER BY vec_id ASC) = 1
            ), assign AS (
              SELECT vec_id, embedding, cell_id, ccos FROM (
                SELECT e.vec_id, e.embedding, m.cell_id,
                       COALESCE(list_cosine_similarity(
                         e.embedding::DOUBLE[], m.centroid), -2.0) AS ccos,
                       row_number() OVER (
                         PARTITION BY e.vec_id
                         ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], m.centroid)
                                  DESC NULLS LAST, m.cell_id ASC) AS rn
                FROM embeddings e CROSS JOIN med m
              ) WHERE rn = 1
            ), pairs AS (
              SELECT a.vec_id AS id_a, b.vec_id AS id_b
              FROM assign a JOIN assign b
                ON a.cell_id = b.cell_id AND a.vec_id < b.vec_id
              WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
                      >= 0.3
            ), e AS (
              SELECT id_a AS src, id_b AS dst FROM pairs
              UNION
              SELECT id_b, id_a FROM pairs
            ), walk(node, lbl) AS (
              SELECT vec_id, vec_id FROM embeddings
              UNION
              SELECT e.dst, w.lbl FROM walk w JOIN e ON e.src = w.node
            ), comp AS (
              SELECT node AS vec_id, min(lbl) AS component FROM walk GROUP BY node
            ), ranked AS (
              SELECT a.vec_id, c.component,
                     row_number() OVER (
                       PARTITION BY c.component
                       ORDER BY a.ccos ASC, a.vec_id ASC) AS krn,
                     count(*) OVER (PARTITION BY c.component) AS csize
              FROM assign a JOIN comp c USING (vec_id)
            )
            SELECT a.vec_id, a.cell_id, r.component,
                   (r.csize = 1 OR r.krn = 1) AS is_kept
            FROM assign a JOIN ranked r USING (vec_id)
        """,
        "pack_sequences": r"""
            WITH toks AS (
              SELECT doc_id,
                     ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                       % 8 AS bin_id,
                     CAST(len(regexp_extract_all(
                       text, '[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]')) AS BIGINT)
                       AS n_tok
              FROM documents
            ), cum AS (
              SELECT doc_id, bin_id, n_tok,
                     COALESCE(SUM(n_tok) OVER (
                       PARTITION BY bin_id ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                     ), 0) AS excl
              FROM toks
            )
            SELECT doc_id, bin_id, n_tok,
                   CAST(excl // 512 AS BIGINT) AS shard_id,
                   CAST(excl % 512 AS BIGINT) AS shard_offset,
                   (excl % 512) + n_tok > 512 AS spans_boundary
            FROM cum
        """,
        "dsir_weights": f"""
            WITH toks AS (
              SELECT doc_id, {_TOKS_SQL} AS t FROM documents
            ), grams AS (
              SELECT doc_id,
                     CASE WHEN len(t) >= 2
                          THEN list_transform(
                                 generate_series(1, len(t) - 1),
                                 i -> array_to_string(t[i:i+1], ' '))
                          ELSE [] END AS g
              FROM toks
            ), gb AS (
              SELECT doc_id,
                     list_transform(
                       g, x -> ('0x' || substr(md5(x), 1, 15))::BIGINT % 512
                     ) AS b
              FROM grams
            ), rawx AS (
              SELECT unnest(b) AS bk, doc_id FROM gb
            ), rawc AS (
              SELECT bk, count(*) AS rc FROM rawx GROUP BY bk
            ), tgtc AS (
              SELECT bk, count(*) AS tc FROM rawx WHERE doc_id % 10 = 0 GROUP BY bk
            ), tot AS (
              SELECT (SELECT count(*) FROM rawx) AS R,
                     (SELECT count(*) FROM rawx WHERE doc_id % 10 = 0) AS T
            ), ratio AS (
              SELECT r.range AS bk,
                     ln((COALESCE(tc, 0) + 1.0) * (tot.R + 512)
                        / ((COALESCE(rc, 0) + 1.0) * (tot.T + 512))) AS lr
              FROM range(512) r
              LEFT JOIN rawc ON rawc.bk = r.range
              LEFT JOIN tgtc ON tgtc.bk = r.range
              CROSS JOIN tot
            ), rarr AS (
              SELECT list(lr ORDER BY bk) AS arr FROM ratio
            )
            SELECT gb.doc_id,
                   CAST(len(gb.b) AS INT) AS gram_count,
                   CAST(round(list_reduce(
                       list_prepend(0.0::DOUBLE,
                                    list_transform(gb.b, x -> rarr.arr[x + 1])),
                       (a, c) -> a + c) * 1000000.0) AS BIGINT) AS score_ppm,
                   CAST(round(list_reduce(
                       list_prepend(0.0::DOUBLE,
                                    list_transform(gb.b, x -> rarr.arr[x + 1])),
                       (a, c) -> a + c) * 1000000.0) AS BIGINT) > 0 AS dsir_keep
            FROM gb CROSS JOIN rarr
        """,
        "decontaminate": f"""
            WITH toks AS (
              SELECT doc_id, {_TOKS_SQL} AS t FROM documents
            ), dg AS (
              SELECT doc_id,
                     unnest(list_distinct(
                       CASE WHEN len(t) >= 5
                            THEN list_transform(
                                   generate_series(1, len(t) - 4),
                                   i -> array_to_string(t[i:i+4], ' '))
                            ELSE [] END)) AS gram
              FROM toks
            ), bench AS (
              SELECT DISTINCT gram FROM dg WHERE doc_id % 50 = 0
            ), hits AS (
              SELECT dg.doc_id, count(*) AS c
              FROM dg JOIN bench USING (gram) GROUP BY dg.doc_id
            )
            SELECT d.doc_id,
                   CAST(COALESCE(h.c, 0) AS BIGINT) AS contaminated_ngrams,
                   COALESCE(h.c, 0) = 0 AS contam_keep
            FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
        """,
        "dedup_embedding_cosine": """
            SELECT a.vec_id AS id_a, b.vec_id AS id_b
            FROM embeddings a JOIN embeddings b
              ON a.label = b.label AND a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.3
        """,
        "bpe_pairs": f"""
            WITH words AS (
              SELECT unnest({_TOKS_SQL}) AS word FROM documents
            ), wf AS (
              SELECT word, count(*) AS freq FROM words GROUP BY word
            ), pairs AS (
              SELECT unnest(list_concat(
                       list_transform(
                         generate_series(1, length(word) - 1),
                         i -> substr(word, i, 1) || ' ' || substr(word, i + 1, 1)
                       ),
                       [substr(word, length(word), 1) || ' </w>']
                     )) AS pair,
                     freq
              FROM wf
            ), counts AS (
              SELECT pair, CAST(sum(freq) AS BIGINT) AS freq
              FROM pairs GROUP BY pair
            )
            SELECT pair, freq,
                   row_number() OVER (ORDER BY freq DESC, pair ASC) AS rank
            FROM counts ORDER BY rank LIMIT 30
        """,
        "sim_srp_topk": _srp_oracle_sql(),
        "sim_cosine_topk": """
            WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 8),
            scored AS (
              SELECT q.query_id, c.vec_id,
                     list_cosine_similarity(q.qv, c.embedding) AS cos
              FROM q CROSS JOIN embeddings c
            )
            SELECT query_id,
                   row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id ASC) AS rank,
                   vec_id
            FROM scored QUALIFY rank <= 5
        """,
        "s11_query_loader": """
            SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
            FROM orders WHERE o_totalprice > 100
            ORDER BY o_totalprice DESC, o_orderkey
            LIMIT 50 OFFSET 10
        """,
        "warc_roundtrip": """
            -- recomputes the WARC payload straight from the parquet: a
            -- hash match proves serialize→gzip→parse→unwrap is lossless
            SELECT 'https://warc.example.org/doc/' || doc_id AS url,
                   200 AS status,
                   CAST(octet_length(encode('<html><body>' || text || '</body></html>')) AS BIGINT)
                     AS n_bytes,
                   md5('<html><body>' || text || '</body></html>') AS payload_md5
            FROM documents
        """,
        "wet_roundtrip": """
            -- recomputes the WET conversion payload straight from the
            -- parquet: serialize→gzip→parse must be byte-lossless
            SELECT 'https://wet.example.org/doc/' || doc_id AS url,
                   'conversion' AS rec_type,
                   CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
                   md5(text) AS text_md5
            FROM documents
        """,
        "wat_export": """
            -- relational recomputation of the WAT envelope fields the
            -- JSON roundtrip must reproduce (metas are name-sorted, so
            -- Metas[0] is always 'description')
            SELECT 'https://wat.example.org/doc/' || doc_id AS url,
                   'Doc ' || doc_id AS title,
                   'desc-' || doc_id AS description,
                   'https://wat.example.org/doc/' || (doc_id * 2 + 3)
                     AS second_link
            FROM documents
        """,
        "sitemap_parse": """
            -- relational regeneration of the sitemap entries the XML
            -- writer+parser roundtrip must reproduce exactly
            SELECT 'https://sm' || (doc_id % 8) || '.example.org/sitemap.xml' AS src_url,
                   'https://sm' || (doc_id % 8) || '.example.org/doc/' || doc_id AS url,
                   'url' AS kind,
                   '2025-07-' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0') AS lastmod,
                   (['daily','weekly','monthly','never'])[CAST(doc_id % 4 AS INT) + 1]
                     AS changefreq,
                   CAST((doc_id % 10) * 100000 AS INT) AS priority_ppm,
                   CAST(row_number() OVER (PARTITION BY doc_id % 8 ORDER BY doc_id) - 1
                        AS INT) AS item_pos
            FROM documents
        """,
        "warc_cdx_fetch": """
            -- the 1-in-10 selection fetched via CDX range reads must
            -- byte-match the parquet-recomputed payloads
            SELECT 'https://warc.example.org/doc/' || doc_id AS url,
                   CAST(octet_length(encode('<html><body>' || text || '</body></html>')) AS BIGINT)
                     AS n_bytes,
                   md5('<html><body>' || text || '</body></html>') AS payload_md5
            FROM documents
            WHERE doc_id % 10 = 3
        """,
        "s3_ua_rotation": _s3_ua_rotation_sql(),
        "s2_fetch_session": _s2_fetch_session_sql(),
        "http_revalidate": """
            -- conditional-refetch replay: latest capture per url
            -- (warc_ts desc, digest desc), quoted-digest ETag +
            -- IMF-fixdate If-Modified-Since, 304 when the refetch
            -- digest equals the stored validator, byte accounting
            WITH u AS (
              SELECT doc_id, text, n_chars,
                     'https://h' || CAST(doc_id % 23 AS VARCHAR)
                       || '.example.org/p/' || CAST(doc_id AS VARCHAR)
                       AS url,
                     'https://h' || CAST(doc_id % 23 AS VARCHAR)
                       || '.example.org/fresh/' || CAST(doc_id AS VARCHAR)
                       AS furl,
                     TIMESTAMP '2026-01-01 00:00:00'
                       + (doc_id % 48) * INTERVAL 1 HOUR AS ts_a
              FROM documents
            ), captures AS (
              SELECT url, ts_a AS warc_ts, md5(text) AS digest FROM u
              UNION ALL
              SELECT url, ts_a + 100 * INTERVAL 1 HOUR, md5(text || 'v1')
              FROM u WHERE doc_id % 4 = 0
            ), latest AS (
              SELECT url, warc_ts AS last_ts, digest AS last_digest
              FROM (
                SELECT url, warc_ts, digest,
                       row_number() OVER (
                         PARTITION BY url
                         ORDER BY warc_ts DESC, digest DESC
                       ) AS rn
                FROM captures
              ) WHERE rn = 1
            ), due AS (
              SELECT url FROM u WHERE doc_id % 2 = 0
              UNION ALL
              SELECT furl FROM u WHERE doc_id % 5 = 0
            ), hdr AS (
              SELECT d.url,
                     CASE WHEN l.last_digest IS NOT NULL
                          THEN '"' || l.last_digest || '"' END
                       AS if_none_match,
                     CASE WHEN l.last_ts IS NOT NULL
                          THEN strftime(l.last_ts,
                                        '%a, %d %b %Y %H:%M:%S') || ' GMT'
                          END AS if_modified_since,
                     l.last_digest
              FROM due d LEFT JOIN latest l USING (url)
            ), responses AS (
              SELECT url,
                     CASE WHEN doc_id % 3 = 0 THEN md5(text || 'v2')
                          ELSE md5(text) END AS digest,
                     CAST(n_chars AS BIGINT) AS n_bytes
              FROM u WHERE doc_id % 2 = 0
              UNION ALL
              SELECT furl, md5(text || 'f'), CAST(n_chars AS BIGINT)
              FROM u WHERE doc_id % 5 = 0
            )
            SELECT r.url,
                   CASE WHEN h.last_digest IS NOT NULL
                             AND r.digest = h.last_digest
                        THEN 304 ELSE 200 END AS status,
                   CASE WHEN h.last_digest IS NOT NULL
                             AND r.digest = h.last_digest
                        THEN 0 ELSE r.n_bytes END AS bytes_fetched,
                   CASE WHEN h.last_digest IS NOT NULL
                             AND r.digest = h.last_digest
                        THEN r.n_bytes ELSE 0 END AS bytes_saved,
                   h.if_none_match, h.if_modified_since
            FROM responses r JOIN hdr h USING (url)
        """,
        "o2_topk": """
            SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
            FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20
        """,
        "j1_coalesce_merge": """
            WITH listing AS (
              SELECT c_custkey, nullif(c_mktsegment, 'BUILDING') AS seg_listing FROM customer
            ), fullt AS (
              SELECT c_custkey, c_mktsegment AS seg_full FROM customer
            )
            SELECT COALESCE(l.c_custkey, f.c_custkey) AS c_custkey,
                   CASE WHEN l.seg_listing IS NULL OR l.seg_listing = ''
                        THEN COALESCE(f.seg_full, l.seg_listing)
                        ELSE l.seg_listing END AS segment
            FROM listing l FULL OUTER JOIN fullt f ON l.c_custkey = f.c_custkey
        """,
        "j2_lookup_join": """
            -- outer CAST: DuckDB sum(BIGINT) yields HUGEINT -> pandas float64,
            -- which would hash-mismatch Spark's long
            SELECT p_brand, count(*) AS n_items,
                   CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY p_brand ORDER BY p_brand
        """,
        "j3_seen_antijoin": """
            SELECT o_orderkey, o_custkey FROM orders o
            WHERE NOT EXISTS (
              SELECT 1 FROM customer c WHERE c.c_acctbal > 0 AND c.c_custkey = o.o_custkey
            )
        """,
        "tpch_q1ish": """
            SELECT l_returnflag, l_linestatus,
                   CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
                   CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "w1_perhost_rank": """
            SELECT user_id,
                   row_number() OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS rank,
                   event_id
            FROM events QUALIFY rank <= 3
        """,
        "t_sessionize": """
            -- session_id CAST: sum(INT) OVER yields HUGEINT -> pandas float64;
            -- cumulative window ordered by (ts, event_id) to match the Spark side
            WITH gapped AS (
              SELECT user_id, ts, event_id,
                     CASE WHEN epoch(ts) - lag(epoch(ts)) OVER w > 1800 THEN 1 ELSE 0 END AS new_session
              FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
            ), sessions AS (
              SELECT user_id, event_id,
                     CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
              FROM gapped
            )
            SELECT user_id, session_id, count(*) AS n_events,
                   min(event_id) AS first_event, max(event_id) AS last_event
            FROM sessions GROUP BY user_id, session_id
        """,
        "a4_run_report": """
            SELECT event_type, count(*) AS n, count(DISTINCT user_id) AS n_users,
                   CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        "u1_union_dedup": """
            SELECT DISTINCT event_id, user_id FROM (
              SELECT event_id, user_id FROM events WHERE event_type = 'purchase'
              UNION ALL
              SELECT event_id, user_id FROM events WHERE value > 150
            )
        """,
        "f1_clean_text": """
            SELECT c_custkey,
                   regexp_replace(
                     replace(replace(replace(replace(replace(
                       trim(regexp_replace('  “' || c_name || '”\t has ' || chr(160) || ' balance' || chr(7) || ' stuff  ',
                                           '\\s+', ' ', 'g')),
                       chr(160), ' '), '“', '"'), '”', '"'), '‘', ''''), '’', ''''),
                     '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]', '', 'g') AS cleaned
            FROM customer
        """,
        "f7_email_valid": """
            WITH t AS (
              SELECT c_custkey,
                     'user' || CAST(c_custkey AS VARCHAR) || '@' ||
                     CASE c_custkey % 4 WHEN 0 THEN 'example.com' WHEN 1 THEN 'TEST.com'
                          WHEN 2 THEN 'real-domain.org' ELSE 'bad_domain' END AS email
              FROM customer
            )
            SELECT c_custkey, email,
                   regexp_matches(email, '^[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}$')
                   AND NOT regexp_matches(lower(email), '@(example|test|sample|invalid)\\.com$') AS email_valid
            FROM t
        """,
        "f8_phone_valid": """
            WITH t AS (
              SELECT c_custkey,
                     CASE WHEN c_custkey % 3 = 0 THEN
                       '(' || lpad(CAST(c_custkey % 700 + 200 AS VARCHAR), 3, '0') || ') 867-' ||
                       lpad(CAST(c_custkey % 9000 + 1000 AS VARCHAR), 4, '0')
                     WHEN c_custkey % 3 = 1 THEN '12345678' ELSE '555' END AS phone
              FROM customer
            ), d AS (
              SELECT c_custkey, phone, regexp_replace(phone, '[^\\d+]', '', 'g') AS digits FROM t
            )
            SELECT c_custkey, phone,
                   length(digits) BETWEEN 7 AND 15
                   AND NOT (starts_with(digits, '+') AND length(digits) < 8)
                   AND NOT regexp_matches(digits, '^0{7,}$')
                   AND NOT regexp_matches(digits, '^1{7,}$')
                   -- RE2 has no backreferences: same-char-repeated check
                   -- ('^(.)\\1{6,}$' in the reference) via repeat()
                   AND NOT (length(digits) >= 7 AND digits = repeat(digits[1:1], length(digits)))
                   AND NOT regexp_matches(digits, '^12345\\d*$') AS phone_valid
            FROM d
        """,
        "f9_url_valid": """
            WITH t AS (
              SELECT p_partkey,
                     CASE WHEN p_partkey % 3 = 0 THEN 'https://shop.example.org/p/' || CAST(p_partkey AS VARCHAR)
                          WHEN p_partkey % 3 = 1 THEN 'http://localhost/x'
                          ELSE 'gopher://nope.org/' END AS url
              FROM part
            ), h AS (
              SELECT p_partkey, url,
                     lower(regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/]+)', 1)) AS host
              FROM t
            )
            SELECT p_partkey, url,
                   regexp_matches(url, '^(https?|ftp)://')
                   AND regexp_matches(host, '^[a-z0-9]([a-z0-9\\-]{0,61}[a-z0-9])?(\\.[a-z0-9]([a-z0-9\\-]{0,61}[a-z0-9])?)*$')
                   AND host <> 'localhost'
                   AND NOT regexp_matches(host, '^\\d+\\.\\d+\\.\\d+\\.\\d+$')
                   AND length(string_split(host, '.')[-1]) >= 2 AS url_valid
            FROM h
        """,
        "f10_date_valid": """
            WITH t AS (
              SELECT o_orderkey,
                     CASE o_orderkey % 3
                       WHEN 0 THEN strftime(o_orderdate, '%Y-%m-%d')
                       WHEN 1 THEN strftime(o_orderdate, '%m/%d/%Y')
                       ELSE 'not a date' END AS datestr
              FROM orders
            )
            SELECT o_orderkey, datestr,
                   COALESCE(try_strptime(datestr, '%Y-%m-%d'), try_strptime(datestr, '%Y/%m/%d'),
                            try_strptime(datestr, '%m/%d/%Y'), try_strptime(datestr, '%d/%m/%Y'),
                            try_strptime(datestr, '%m-%d-%Y'), try_strptime(datestr, '%d-%m-%Y'))
                   IS NOT NULL AS date_valid
            FROM t
        """,
        "f11_ip_valid": """
            WITH t AS (
              SELECT c_custkey,
                     CAST(c_custkey % 300 AS VARCHAR) || '.' || CAST(c_custkey % 256 AS VARCHAR) || '.' ||
                     CAST((c_custkey * 7) % 256 AS VARCHAR) || '.' || CAST((c_custkey * 13) % 256 AS VARCHAR) AS ip
              FROM customer
            )
            SELECT c_custkey, ip,
                   (regexp_matches(ip, '^(\\d{1,3})\\.(\\d{1,3})\\.(\\d{1,3})\\.(\\d{1,3})$')
                    AND CAST(regexp_extract(ip, '^(\\d{1,3})\\.(\\d{1,3})\\.(\\d{1,3})\\.(\\d{1,3})$', 1) AS INT) <= 255
                    AND CAST(regexp_extract(ip, '^(\\d{1,3})\\.(\\d{1,3})\\.(\\d{1,3})\\.(\\d{1,3})$', 2) AS INT) <= 255
                    AND CAST(regexp_extract(ip, '^(\\d{1,3})\\.(\\d{1,3})\\.(\\d{1,3})\\.(\\d{1,3})$', 3) AS INT) <= 255
                    AND CAST(regexp_extract(ip, '^(\\d{1,3})\\.(\\d{1,3})\\.(\\d{1,3})\\.(\\d{1,3})$', 4) AS INT) <= 255)
                   OR regexp_matches(ip, '^([0-9a-fA-F]{1,4}:){7}[0-9a-fA-F]{1,4}$') AS ip_valid
            FROM t
        """,
        "f13_json_extract": """
            SELECT event_id, CAST(json_extract(props, '$.k') AS INT) AS k_value FROM events
        """,
        "f18_date_normalize": """
            WITH t AS (
              SELECT o_orderkey,
                     CASE WHEN o_orderkey % 2 = 0 THEN strftime(o_orderdate, '%m/%d/%Y')
                          ELSE strftime(o_orderdate, '%Y/%m/%d') END AS raw_date
              FROM orders
            )
            SELECT o_orderkey, raw_date,
                   strftime(COALESCE(try_strptime(raw_date, '%m/%d/%Y'),
                                     try_strptime(raw_date, '%Y/%m/%d')), '%Y-%m-%d') AS iso_date
            FROM t
        """,
        "f19_price_parse": """
            WITH t AS (
              SELECT p_partkey, CAST(round(p_retailprice * 100) AS BIGINT) AS cents FROM part
            ), s AS (
              SELECT p_partkey,
                     'Sale: $' || CAST(cents // 100 AS VARCHAR) || '.' ||
                     lpad(CAST(cents % 100 AS VARCHAR), 2, '0') || ' only' AS price_text
              FROM t
            )
            SELECT p_partkey, price_text,
                   CAST(round(CAST(replace(regexp_extract(price_text, '(\\d+[.,]\\d{2}|\\d+)', 1), ',', '.') AS DOUBLE) * 100) AS BIGINT) AS parsed_cents
            FROM s
        """,
        "p7_availability": """
            WITH t AS (
              SELECT p_partkey,
                     CASE p_partkey % 5 WHEN 0 THEN 'Currently In  Stock!' WHEN 1 THEN 'OUT of stock'
                          WHEN 2 THEN 'available next week' WHEN 3 THEN 'item unavailable'
                          ELSE 'ships whenever' END AS raw_status
              FROM part
            )
            SELECT p_partkey, raw_status,
                   CASE WHEN regexp_matches(lower(raw_status), 'in\\s*stock') THEN 'In Stock'
                        WHEN regexp_matches(lower(raw_status), 'out\\s*of\\s*stock') THEN 'Out of Stock'
                        WHEN regexp_matches(lower(raw_status), 'available') THEN 'Available'
                        WHEN regexp_matches(lower(raw_status), 'unavailable') THEN 'Unavailable'
                        ELSE 'Unknown' END AS availability
            FROM t
        """,
        "f21_canonicalize": """
            -- default port :443 strips, non-default :8443 survives
            WITH t AS (
              SELECT doc_id,
                     'HTTPS://Docs' || CAST(doc_id % 5 AS VARCHAR) || '.Example.ORG' ||
                     CASE WHEN doc_id % 3 = 1 THEN ':443'
                          WHEN doc_id % 3 = 2 THEN ':8443' ELSE '' END || '/view' ||
                     CASE WHEN doc_id % 2 = 0 THEN '?page=2#frag' ELSE '#top' END AS raw_url
              FROM documents
            )
            SELECT doc_id, raw_url,
                   'https://docs' || CAST(doc_id % 5 AS VARCHAR) || '.example.org' ||
                   CASE WHEN doc_id % 3 = 2 THEN ':8443' ELSE '' END || '/view' ||
                   CASE WHEN doc_id % 2 = 0 THEN '?page=2' ELSE '' END AS canonical_url
            FROM t
        """,
        # 64-bit SimHash bit-majority in SQL: per-token md5 → first 8
        # bytes big-endian as UBIGINT → per-bit signed vote → bit sum;
        # HUGEINT intermediate folded back to signed 64-bit like the
        # Python simhash64 does. Empty token lists → 0 via the left join.
        "mirror_hosts": """
            WITH pages AS (
              SELECT 'h' || (doc_id % 8) AS host,
                     '/d/' || doc_id AS path, text FROM documents
              UNION ALL
              SELECT 'm' || (doc_id % 8) AS host,
                     '/d/' || doc_id AS path, text FROM documents
              WHERE doc_id % 3 = 0
            ), hk AS (
              SELECT DISTINCT host, md5(md5(path) || md5(text)) AS key FROM pages
            ), gate AS (
              SELECT key FROM hk GROUP BY key HAVING count(*) <= 64
            ), gated AS (
              SELECT hk.host, hk.key FROM hk JOIN gate USING (key)
            ), sizes AS (
              -- gated universe: same keys as the pair numerator
              SELECT host, count(*) AS n_keys FROM gated GROUP BY host
            ), pairs AS (
              SELECT a.host AS host_a, b.host AS host_b,
                     CAST(count(*) AS BIGINT) AS shared
              FROM gated a JOIN gated b ON a.key = b.key AND a.host < b.host
              GROUP BY 1, 2
            )
            SELECT host_a, host_b, shared,
                   CAST(sa.n_keys AS BIGINT) AS n_a,
                   CAST(sb.n_keys AS BIGINT) AS n_b,
                   CAST(shared * 100 // least(sa.n_keys, sb.n_keys) AS BIGINT)
                     AS containment_centi
            FROM pairs
            JOIN sizes sa ON sa.host = pairs.host_a
            JOIN sizes sb ON sb.host = pairs.host_b
            WHERE shared >= 3
              AND shared * 100 // least(sa.n_keys, sb.n_keys) >= 80
        """,
        "dhash_pairs": _dhash_oracle_sql(),
        "png_decode": _png_decode_oracle_sql(),
        "png_dhash_pairs": _png_dhash_oracle_sql(),
        "jpeg_decode": _raster_decode_oracle_sql("jpeg"),
        "jpeg_dhash_pairs": _raster_dhash_oracle_sql("jpeg"),
        "gif_decode": _raster_decode_oracle_sql("gif"),
        "gif_dhash_pairs": _raster_dhash_oracle_sql("gif"),
        "gif_frames": _gif_frames_oracle_sql(),
        "gif_frame_dedup": _gif_frame_dedup_oracle_sql(),
        "anim_frames_mixed": _anim_mixed_frames_oracle_sql(),
        "anim_cross_dedup": _anim_cross_dedup_oracle_sql(),
        "favicon_decode": _favicon_decode_oracle_sql(),
        "favicon_dhash_pairs": _favicon_dhash_oracle_sql(),
        "jpeg_exif": """
            -- construct->parse roundtrip: the extractor must recover
            -- exactly the Exif fields the builder derived from
            -- doc_id; every fifth id carries no APP1 -> NULL columns
            SELECT doc_id AS media_id,
                   CASE WHEN doc_id % 5 = 4 THEN NULL
                        ELSE 'cam' || (doc_id % 7) END AS make,
                   CASE WHEN doc_id % 5 = 4 THEN NULL
                        ELSE 'M' || (doc_id % 13) END AS model,
                   CASE WHEN doc_id % 5 = 4 THEN NULL
                        ELSE 'scraper/' || (doc_id % 5) END AS software,
                   CASE WHEN doc_id % 5 = 4 THEN NULL
                        ELSE lpad(CAST(2020 + doc_id % 6 AS VARCHAR), 4, '0')
                             || ':' ||
                             lpad(CAST(doc_id % 12 + 1 AS VARCHAR), 2, '0')
                             || ':' ||
                             lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0')
                             || ' ' ||
                             lpad(CAST(doc_id % 24 AS VARCHAR), 2, '0')
                             || ':' ||
                             lpad(CAST((doc_id * 7) % 60 AS VARCHAR), 2, '0')
                             || ':' ||
                             lpad(CAST((doc_id * 13) % 60 AS VARCHAR), 2, '0')
                        END AS datetime,
                   CAST(CASE WHEN doc_id % 5 = 4 THEN -1
                        ELSE doc_id % 8 + 1 END AS INT) AS orientation
            FROM documents
        """,
        "registered_domain": _registered_domain_oracle_sql(),
        "perceptron_gate": _perceptron_oracle_sql(iters=3, buckets=128),
        "opic_importance": _opic_oracle_sql(),
        "hits_scores": _hits_oracle_sql(),
        "excerpt_pairs": _excerpt_oracle_sql(),
        "audio_pairs": _audio_oracle_sql(),
        "starvation_report": """
            WITH frontier AS (
              SELECT 'h' || (doc_id % 8) AS host,
                     CAST(doc_id % 12 - 1 AS BIGINT) AS discovered_epoch
              FROM documents
            ), seen AS (
              SELECT 'h' || (doc_id % 8) AS host,
                     CAST(doc_id % 11 AS BIGINT) AS fetched_epoch
              FROM documents WHERE doc_id % 2 = 0
            ), pend AS (
              SELECT host, CAST(count(*) AS BIGINT) AS n_pending,
                     CAST(10 - min(discovered_epoch) AS BIGINT) AS oldest_wait
              FROM frontier GROUP BY host
            ), fetched AS (
              SELECT host, CAST(max(fetched_epoch) AS BIGINT) AS last_fetch_epoch
              FROM seen GROUP BY host
            )
            SELECT p.host, p.n_pending, p.oldest_wait,
                   CAST(coalesce(f.last_fetch_epoch, -1) AS BIGINT)
                     AS last_fetch_epoch,
                   (p.oldest_wait >= 3)
                   AND NOT coalesce(f.last_fetch_epoch > 10 - 3, false)
                     AS starving
            FROM pend p LEFT JOIN fetched f ON f.host = p.host
        """,
        "soft404_templated": """
            WITH pages AS (
              SELECT 'https://h' || (doc_id % 8) || '.example.org/p/' || doc_id
                       AS url,
                     CASE WHEN doc_id % 4 = 0
                          THEN '  Page Not' || chr(9) || 'Found — error 404 '
                          ELSE text END AS text
              FROM documents
            ), keyed AS (
              SELECT url,
                     lower(string_split(string_split(url, '//')[2], '/')[1])
                       AS host,
                     md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
                       AS body_fp
              FROM pages
            ), groups AS (
              SELECT host, body_fp,
                     CAST(count(DISTINCT url) AS BIGINT) AS n_urls
              FROM keyed GROUP BY host, body_fp
            )
            SELECT k.url, k.host, k.body_fp, g.n_urls, g.n_urls >= 5 AS templated
            FROM keyed k JOIN groups g USING (host, body_fp)
        """,
        "embed_decontam": """
            WITH bench AS (
              SELECT embedding FROM embeddings WHERE vec_id < 16
            ), hits AS (
              SELECT c.vec_id, CAST(count(*) AS BIGINT) AS n
              FROM embeddings c JOIN bench b
                ON list_cosine_similarity(
                     c.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.35
              GROUP BY c.vec_id
            )
            SELECT e.vec_id,
                   CAST(coalesce(h.n, 0) AS BIGINT) AS n_bench_hits,
                   h.n IS NULL AS contam_keep
            FROM embeddings e LEFT JOIN hits h ON h.vec_id = e.vec_id
        """,
        "pld_flood": """
            WITH fr AS (
              SELECT CASE WHEN doc_id % 2 = 0
                          THEN 's' || (doc_id % 50) || '.flood.com'
                          ELSE 'h' || (doc_id % 10) || '.ok.org' END AS host
              FROM documents
            ), t AS (
              SELECT host, string_split(host, '.') AS p FROM fr
            ), w AS (
              SELECT array_to_string(p[len(p) - 1 : len(p)], '.') AS pld, host
              FROM t
            )
            SELECT pld,
                   CAST(count(DISTINCT host) AS BIGINT) AS n_hosts,
                   CAST(count(*) AS BIGINT) AS n_urls,
                   count(DISTINCT host) > 32 AS flooded
            FROM w GROUP BY pld
        """,
        "dedup_simhash": f"""
            WITH toks AS (
              SELECT doc_id, unnest({_TOKS_SQL}) AS tok FROM documents
            ), h AS (
              SELECT doc_id, ('0x' || substr(md5(tok), 1, 16))::UBIGINT AS hv FROM toks
            ), bits AS (
              SELECT doc_id, b.b AS b,
                     sum(CASE WHEN (hv >> b.b) & 1 = 1 THEN 1 ELSE -1 END) AS cnt
              FROM h CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS b) b
              GROUP BY doc_id, b.b
            ), sh AS (
              SELECT doc_id,
                     sum(CASE WHEN cnt > 0 THEN (1::UBIGINT << b)::HUGEINT
                              ELSE 0::HUGEINT END) AS u
              FROM bits GROUP BY doc_id
            )
            SELECT d.doc_id,
                   CAST(CASE WHEN COALESCE(sh.u, 0) >= 9223372036854775808::HUGEINT
                             THEN COALESCE(sh.u, 0) - 18446744073709551616::HUGEINT
                             ELSE COALESCE(sh.u, 0) END AS BIGINT) AS simhash
            FROM documents d LEFT JOIN sh ON d.doc_id = sh.doc_id
        """,
        # IVF under the deterministic medoid quantizer (see
        # _q_sim_ivf_topk): corpus assigned to its nearest cell
        # (n_probe=1), queries probe 3 cells, exact cosine within
        # candidates, rank ties on vec_id. All cosines in DOUBLE.
        "sim_ivf_topk": """
            WITH med AS (
              SELECT label AS cell_id, embedding::DOUBLE[] AS centroid
              FROM embeddings
              QUALIFY row_number() OVER (PARTITION BY label ORDER BY vec_id ASC) = 1
            ), corpus_assign AS (
              SELECT vec_id, embedding, cell_id FROM (
                SELECT e.vec_id, e.embedding, m.cell_id,
                       row_number() OVER (
                         PARTITION BY e.vec_id
                         ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], m.centroid)
                                  DESC NULLS LAST, m.cell_id ASC) AS rn
                FROM embeddings e CROSS JOIN med m
              ) WHERE rn = 1
            ), query_assign AS (
              SELECT vec_id AS query_id, embedding AS qv, cell_id FROM (
                SELECT e.vec_id, e.embedding, m.cell_id,
                       row_number() OVER (
                         PARTITION BY e.vec_id
                         ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], m.centroid)
                                  DESC NULLS LAST, m.cell_id ASC) AS rn
                FROM embeddings e CROSS JOIN med m
                WHERE e.vec_id < 8
              ) WHERE rn <= 3
            ), cand AS (
              SELECT q.query_id, c.vec_id,
                     list_cosine_similarity(q.qv::DOUBLE[], c.embedding::DOUBLE[]) AS cos
              FROM corpus_assign c JOIN query_assign q USING (cell_id)
            )
            SELECT query_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY cos DESC NULLS LAST, vec_id ASC) AS rank,
                   vec_id
            FROM cand QUALIFY rank <= 5
        """,
        "bpe_learn": _bpe_learn_oracle_sql(),
        "bpe_encode": _bpe_encode_oracle_sql(),
        "compression_ratio": _compression_ratio_oracle_sql(),
        "crawl_epoch_seen": _crawl_seen_oracle_sql(),
        "crawl_content_seen": _content_seen_oracle_sql(),
        # revisit: every url fetched in epoch 0; the always-hinted
        # subset (i % 3 == 0) is due at epoch 1 and refetched in the
        # epoch-2 wave — derived purely from the index arithmetic
        "crawl_revisit": """
            WITH i AS (SELECT unnest(range(12)) AS i),
            u AS (SELECT i,
                         'https://rv.example-crawl.org/p'
                           || lpad(CAST(i AS VARCHAR), 2, '0') AS url
                  FROM i)
            SELECT url, 'ok' AS status, CAST(0 AS INTEGER) AS fetched_epoch
            FROM u
            UNION ALL
            SELECT url, 'ok' AS status, CAST(2 AS INTEGER) AS fetched_epoch
            FROM u WHERE i % 3 = 0
        """,
        # observed-evidence adaptive recrawl: even-indexed hosts change
        # every P = h+1 hours -> due at epoch 10 iff P <= 10; odd hosts
        # are stable -> max_hours backoff, never due here
        "volatility_revisit": """
            SELECT 'https://h' || CAST(doc_id % 20 AS VARCHAR)
                     || '.example.org/d' || CAST(doc_id AS VARCHAR) AS url,
                   CAST(0 AS INTEGER) AS fetched_epoch,
                   CAST(doc_id % 20 + 1 AS INTEGER) AS due_epoch,
                   CAST(-1 AS INTEGER) AS priority_ppm,
                   'period' AS reason
            FROM documents
            WHERE (doc_id % 20) % 2 = 0 AND doc_id % 20 + 1 <= 10
        """,
        "multimodal_features": _multimodal_oracle_sql(),
    }
    # the postings_merge contract is merge(build(A), build(B)) ≡ the
    # BATCH build bit-for-bit — so its oracle IS the batch replay
    out["postings_merge"] = out["postings"]
    # the persisted-weights MLT path must return EXACTLY what the
    # from-index derivation returns — its oracle IS the same replay
    out["mlt_persisted_weights"] = out["mlt_from_index"]
    # phrase served from the positional index must equal phrase over
    # re-read text — its oracle IS the same slot-alignment replay
    out["phrase_from_index"] = out["phrase_search"]
    return out


def _paragraph_lang_sql() -> str:
    """paragraph_language_id replayed relationally: the same salt, the
    same paragraph explode as the paragraph_dedup oracle, the marker
    argmax per paragraph, then a doc rollup with ordered string_agg
    for the byte-exact reassembly (coalesced to '' — Spark's
    concat_ws of an empty array)."""
    score_parts = []
    for lang in _tx.LANG_ORDER:
        markers = ", ".join(f"'{w}'" for w in _tx.LANG_MARKERS[lang])
        score_parts.append(
            "len(list_filter(list_filter(string_split_regex(lower(para),"
            f" '[^a-z0-9_]+'), x -> x <> ''), x -> x IN ({markers})))"
            f" AS s_{lang}"
        )
    scores = ",\n                     ".join(score_parts)
    langs = _tx.LANG_ORDER
    pbest = "greatest(" + ", ".join(f"s_{l}" for l in langs) + ")"
    pcase = f"CASE WHEN {pbest} = 0 THEN 'und'"
    for lang in langs:
        pcase += f"\n                 WHEN s_{lang} = {pbest} THEN '{lang}'"
    pcase += " END"
    counts = ",\n                     ".join(
        f"CAST(coalesce(sum(CASE WHEN para_lang = '{lang}' THEN 1 END), 0)"
        f" AS BIGINT) AS n_{lang}"
        for lang in langs
    )
    dbest = "greatest(" + ", ".join(f"n_{l}" for l in langs) + ")"
    dcase = f"CASE WHEN {dbest} = 0 THEN 'und'"
    for lang in langs:
        dcase += f"\n               WHEN n_{lang} = {dbest} THEN '{lang}'"
    dcase += " END"
    return f"""
        WITH salted AS (
          SELECT doc_id,
                 text || chr(10) || '{_PARA_LANG_SALT_DE}'
                      || chr(10) || '{_PARA_LANG_SALT_FR}' AS text
          FROM documents
        ), split AS (
          SELECT doc_id, string_split(text, chr(10)) AS l FROM salted
        ), paras AS (
          SELECT doc_id,
                 unnest(list_transform(generate_series(1, len(l)),
                                       i -> struct_pack(idx := i, p := l[i]))) AS u
          FROM split
        ), clean AS (
          SELECT doc_id, u.idx - 1 AS para_idx, trim(u.p) AS para
          FROM paras WHERE trim(u.p) <> ''
        ), scored AS (
          SELECT doc_id, para_idx, para,
                     {scores}
          FROM clean
        ), tagged AS (
          SELECT doc_id, para_idx, para, {pcase} AS para_lang
          FROM scored
        ), agg AS (
          SELECT doc_id,
                     CAST(count(*) AS BIGINT) AS n_paras,
                     {counts},
                     coalesce(string_agg(
                       CASE WHEN para_lang = 'en' THEN para END,
                       chr(10) ORDER BY para_idx), '') AS text_kept
          FROM tagged GROUP BY doc_id
        )
        SELECT doc_id, n_paras, n_en AS n_kept, n_en, n_de, n_fr, n_es,
               {dcase} AS doc_lang,
               text_kept
        FROM agg
    """


def _lang_id_sql(src: str = "documents") -> str:
    parts = []
    for lang in _tx.LANG_ORDER:
        markers = ", ".join(f"'{w}'" for w in _tx.LANG_MARKERS[lang])
        parts.append(
            f"len(list_filter({_TOKS_SQL}, x -> x IN ({markers}))) AS score_{lang}"
        )
    scores = ",\n                   ".join(parts)
    langs = _tx.LANG_ORDER
    best = f"greatest(score_{langs[0]}, score_{langs[1]}, score_{langs[2]}, score_{langs[3]})"
    case = f"""CASE WHEN {best} = 0 THEN 'und'
                    WHEN score_{langs[0]} = {best} THEN '{langs[0]}'
                    WHEN score_{langs[1]} = {best} THEN '{langs[1]}'
                    WHEN score_{langs[2]} = {best} THEN '{langs[2]}'
                    ELSE '{langs[3]}' END"""
    return f"""
        WITH t AS (
          SELECT doc_id,
                 {scores}
          FROM {src}
        )
        SELECT doc_id, score_en, score_de, score_fr, score_es,
               {case} AS lang_pred
        FROM t
    """
