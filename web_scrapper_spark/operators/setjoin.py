"""Set joins over token sets — containment and overlap (SIGMOD/ICDE
set-join literature, Spark-first).

Webtext uses: boolean AND search ("every query term present"), lexicon
containment ("pages carrying a full phrase vocabulary"), and shared-
vocabulary pairing (near-dup candidate generation at token grain). The
naive plan is the all-pairs membership test — O(|Q|·|C|) and dead at
corpus scale. The literature's fix (LCJoin ICDE 2019, the PPJoin
prefix-filter family, HERO SIGMOD 2024) is the same idea in different
clothes: candidates come from INVERTED LISTS of the query's globally
rarest elements, and only candidates pay verification.

- :func:`set_containment_join` — pairs (q, d) with q.set ⊆ d.set.
  Candidate generation probes ONE posting list per query: the query's
  rarest token (global document frequency ascending, token ascending —
  deterministic). Any superset of q must contain that token, so the
  candidate set is exact-complete, and its size is bounded by the
  rarest token's df — the smallest bound any single-list probe can
  give (LCJoin's least-frequent-element rule). Verification is a
  native ``forall``/``array_contains`` over the candidate pairs only.

- :func:`set_overlap_join` — pairs with |q.set ∩ d.set| ≥ t, plus the
  exact overlap. Prefix filter: order tokens by (df, token) globally;
  if d misses ALL of q's first |q|−t+1 tokens in that order, overlap
  ≤ t−1 — so probing those lists is exact-complete. Verification is a
  native ``array_intersect`` size.

Scale shape (both): postings = one explode of the corpus token sets
(O(corpus tokens), the same class as any tokenize pass) + one
map-side-combined df aggregate; the query side pays one window over
query tokens (query-count sized); candidates shuffle on token — the
skew cap is exactly why the RAREST tokens probe the lists, a hot stop
word never becomes a join key unless a query is all stop words.
Verification joins carry the full arrays only for candidate rows.
Queries are assumed the small side (broadcast into verification);
corpus-×-corpus self-joins should go through the MinHash/SimHash
operators instead (operators/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["set_containment_join", "set_overlap_join"]


def _postings(corpus: DataFrame, c_id: str, c_set: str):
    """(token, doc) inverted list + global document frequencies."""
    posts = corpus.select(
        F.col(c_id).alias("_cid"),
        F.explode(F.array_distinct(F.col(c_set))).alias("_tok"),
    )
    df = posts.groupBy("_tok").agg(F.count("*").alias("_df"))
    return posts, df


def _query_tokens_ranked(queries: DataFrame, q_id: str, q_set: str, df: DataFrame):
    """Query tokens ranked by (global df asc, token asc); absent tokens
    rank first at df 0 (their posting list is empty — a correct, free
    early exit for unsatisfiable queries)."""
    qtok = queries.select(
        F.col(q_id).alias("_qid"),
        F.explode(F.array_distinct(F.col(q_set))).alias("_tok"),
    )
    ranked = qtok.join(df, "_tok", "left").fillna({"_df": 0})
    w = Window.partitionBy("_qid").orderBy(F.asc("_df"), F.asc("_tok"))
    return ranked.withColumn("_rn", F.row_number().over(w))


def set_containment_join(
    queries: DataFrame,
    corpus: DataFrame,
    q_id: str = "query_id",
    q_set: str = "tokens",
    c_id: str = "doc_id",
    c_set: str = "tokens",
) -> DataFrame:
    """All (q_id, c_id) with set(q) ⊆ set(d). Empty/absent-token query
    sets emit nothing (an empty set has no rarest token to probe; the
    degenerate "∅ ⊆ everything" answer is never useful at corpus
    scale — filter empties upstream if you want them)."""
    posts, df = _postings(corpus, c_id, c_set)
    rare = (
        _query_tokens_ranked(queries, q_id, q_set, df)
        .filter(F.col("_rn") == 1)
        .select("_qid", "_tok")
    )
    cand = rare.join(posts, "_tok").select("_qid", "_cid")
    ver = cand.join(
        corpus.select(F.col(c_id).alias("_cid"), F.col(c_set).alias("_cs")),
        "_cid",
    ).join(
        F.broadcast(
            queries.select(F.col(q_id).alias("_qid"), F.col(q_set).alias("_qs"))
        ),
        "_qid",
    )
    kept = ver.filter(
        F.forall(F.col("_qs"), lambda t: F.array_contains(F.col("_cs"), t))
    )
    return kept.select(F.col("_qid").alias(q_id), F.col("_cid").alias(c_id))


def set_overlap_join(
    queries: DataFrame,
    corpus: DataFrame,
    min_overlap: int = 2,
    q_id: str = "query_id",
    q_set: str = "tokens",
    c_id: str = "doc_id",
    c_set: str = "tokens",
) -> DataFrame:
    """All (q_id, c_id, overlap) with overlap = |set(q) ∩ set(d)| ≥
    ``min_overlap``. Queries with fewer than ``min_overlap`` distinct
    tokens emit nothing (prefix length ≤ 0 ⇒ the threshold is
    unreachable)."""
    if min_overlap < 1:
        raise ValueError("min_overlap must be >= 1")
    posts, df = _postings(corpus, c_id, c_set)
    ranked = _query_tokens_ranked(queries, q_id, q_set, df)
    qsize = ranked.groupBy("_qid").agg(F.count("*").alias("_qn"))
    prefix = (
        ranked.join(qsize, "_qid")
        .filter(F.col("_rn") <= F.col("_qn") - F.lit(min_overlap) + F.lit(1))
        .select("_qid", "_tok")
    )
    cand = prefix.join(posts, "_tok").select("_qid", "_cid").distinct()
    ver = cand.join(
        corpus.select(F.col(c_id).alias("_cid"), F.col(c_set).alias("_cs")),
        "_cid",
    ).join(
        F.broadcast(
            queries.select(F.col(q_id).alias("_qid"), F.col(q_set).alias("_qs"))
        ),
        "_qid",
    )
    scored = ver.withColumn(
        "overlap",
        F.size(F.array_intersect(F.array_distinct("_qs"), F.array_distinct("_cs"))),
    )
    return scored.filter(F.col("overlap") >= min_overlap).select(
        F.col("_qid").alias(q_id), F.col("_cid").alias(c_id), "overlap"
    )
