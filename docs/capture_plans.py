"""Regenerate docs/plans_raw.txt — `.explain("formatted")` dumps of the
hot-path physical plans audited in docs/PLANS.md.

Run from the repo root: python docs/capture_plans.py
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from web_scrapper_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def _explain(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    spark = get_spark(app_name="capture-plans", cpus=8)
    from web_scrapper_spark.fixtures.docsite import docsite_pages
    from web_scrapper_spark.frontier.core import (
        dequeue_ranked,
        seeds_frontier,
    )
    from web_scrapper_spark.operators import textops as tx

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    pages, seeds, robots = docsite_pages(docs, n_hosts=8, page_size=20)
    pages_path = "/tmp/wss-plan-pages.parquet"
    pages.write.mode("overwrite").parquet(pages_path)
    pages = spark.read.parquet(pages_path)
    robots_df = spark.createDataFrame(
        [(r["host"], r["disallow_prefixes"], r["crawl_delay"]) for r in robots],
        "host string, disallow_prefixes array<string>, crawl_delay double",
    )
    frontier = seeds_frontier(spark, seeds)
    ranked = dequeue_ranked(frontier, robots_df, epoch_seconds=8.0)
    batch = ranked.filter(F.col("host_rank") <= F.col("budget")).drop("budget")

    sections = []

    # 1a. small-batch fetch: broadcast inner join, pages never shuffled
    fetched_small = pages.select("url", "html").join(F.broadcast(batch), "url", "inner")
    sections.append(
        ("FETCH JOIN small batch (broadcast inner; pruned pages scan)",
         _explain(fetched_small))
    )

    # 1b. large-batch fetch: ONE shuffled left join (html NULL = miss)
    enriched = batch.join(pages.select("url", "html"), "url", "left")
    sections.append(
        ("FETCH JOIN large batch (single shuffled left join, misses = html IS NULL)",
         _explain(enriched))
    )

    # 2. dequeue split: one window pass feeds batch AND pending
    pending = ranked.filter(F.col("host_rank") > F.col("budget"))
    sections.append(
        ("DEQUEUE WINDOW (one pass -> batch + pending; no anti-join)",
         _explain(pending))
    )

    # 3. seen-set anti-join
    seen = spark.createDataFrame([], "url string, url_hash int")
    cands = frontier.select("url")
    sections.append(
        ("SEEN ANTI-JOIN (candidates left_anti seen)",
         _explain(cands.join(seen.select("url"), "url", "left_anti")))
    )

    # 4. corpus keyword top-K
    sections.append(
        ("CORPUS KEYWORD TOP-K (partial agg + TakeOrdered)",
         _explain(tx.corpus_keywords_topk(docs, k=20)))
    )

    # 5. TPC-H-style aggregate
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    q1 = (
        lineitem.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.sum("l_quantity").alias("sum_qty"), F.count("*").alias("cnt"))
    )
    sections.append(("TPC-H-STYLE AGG (pruned scan + partial agg)", _explain(q1)))

    # 6. exact-substring dedup (Lee et al. span removal)
    from web_scrapper_spark.operators.dedup import exact_substring_dedup

    xs = exact_substring_dedup(docs, k=50, block=10).select(
        "doc_id", "n_tokens", "n_spans", "n_removed", "kept_md5"
    )
    sections.append(
        ("EXACT-SUBSTRING DEDUP (cached window table, AQE-broadcast joins)",
         _explain(xs))
    )

    with open(os.path.join(os.path.dirname(__file__), "plans_raw.txt"), "w") as fh:
        for title, text in sections:
            fh.write(f"===== {title} =====\n{text}\n")
    print(f"wrote {len(sections)} plan dumps to docs/plans_raw.txt")
    spark.stop()


if __name__ == "__main__":
    main()
