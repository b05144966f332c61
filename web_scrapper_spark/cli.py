"""Command-line interface (SURVEY.md §3; reference cli/main.py).

Mirrors the reference's commands on the Spark engine:

- ``scrape``      — run a crawl job from a YAML/JSON config over a
                    pages parquet table (the engine's fetch source per
                    BASELINE.json input_hint; live HTTP is out of scope
                    by design — "fetching" is the pages lookup join)
- ``schedule``    — the epoch loop with checkpoint/resume (the analog
                    of the reference's cron scheduler: each run
                    continues from the last committed epoch)
- ``export-data`` — format-conversion ETL (S13)
- ``create-config`` — emit a default config (utils/config.py:280-380)
- ``report``      — per-epoch lineage metrics from a store manifest

Beyond the reference's surface:

- ``job``         — create/pause/resume/update/delete/run-now (T3/T5)
- ``show``        — inspect any store table, ``--as-of`` time travel
- ``vacuum``      — Iceberg-style snapshot GC for a store table
- ``analyze``     — funnel / dedup / quality over any parquet corpus
"""

from __future__ import annotations

import json
import sys

import click

from .config import ConfigError, bind_job, load_config


@click.group()
def cli() -> None:
    """web_scrapper_spark — PySpark-native crawl/extraction engine."""


def _spark(cpus: int):
    from .session import get_spark

    return get_spark(app_name="wss-cli", cpus=cpus)


def _own_spark(cpus: int):
    """(spark, owned): reuse the thread's active session when one
    exists (CLI invoked from a host process — tests, notebooks,
    orchestration code — must NOT stop the host's session on exit);
    otherwise create one we own and may stop."""
    from pyspark.sql import SparkSession

    # getActiveSession is THREAD-LOCAL: a host session created in
    # another thread would be invisible here, yet getOrCreate() below
    # would return that same default session with owned=True and the
    # finally block would stop the host's session — check the
    # process-wide default too.
    existing = SparkSession.getActiveSession() or getattr(
        SparkSession, "_instantiatedSession", None
    )
    if existing is not None:
        return existing, False
    return _spark(cpus), True


def _engine_from_config(
    spark, config_path, pages_path, store_dir, epoch_seconds, robots="none"
):
    from .crawl.epoch import CrawlEngine
    from .frontier.store import SnapshotStore

    config = load_config(config_path)
    job = bind_job(config)
    pages = spark.read.parquet(pages_path)
    if robots == "from-pages":
        # honor /robots.txt bodies already in the pages table (J4);
        # delay falls back to the config's declared per-request delay
        from .frontier.robots import robots_from_pages

        robots_df = robots_from_pages(
            pages, default_delay=job.crawl_delay or 2.0
        )
    elif robots and robots != "none":
        robots_df = spark.read.parquet(robots)
    else:
        robots_df = None
    store = SnapshotStore(store_dir)
    engine = CrawlEngine(
        spark, store, pages, robots=robots_df, cfg=job.crawl_config(epoch_seconds)
    )
    return engine, job


@cli.command()
@click.option("--config", "-c", "config_path", required=True, type=str)
@click.option("--pages", "-p", "pages_path", required=True, type=str,
              help="parquet dir of (url, warc_ts, html, text, lang)")
@click.option("--store", "-s", "store_dir", required=True, type=str,
              help="snapshot store directory (crawl state + outputs)")
@click.option("--output", "-o", "output_path", type=str, default=None,
              help="override scraper.output.path")
@click.option("--format", "-f", "output_format", type=str, default=None,
              help="override scraper.output.format")
@click.option("--max-epochs", type=int, default=100)
@click.option("--epoch-seconds", type=float, default=8.0)
@click.option("--cpus", type=int, default=8)
@click.option("--robots", type=str, default="none",
              help="'none', 'from-pages' (parse /robots.txt bodies in the "
                   "pages table), or a parquet path of rules")
@click.option("--seed-sitemaps", is_flag=True, default=False,
              help="cold-start from sitemap.xml pages in the pages table "
                   "(plus robots Sitemap: declarations); config urls are "
                   "appended as extra seeds")
def scrape(config_path, pages_path, store_dir, output_path, output_format,
           max_epochs, epoch_seconds, cpus, robots, seed_sitemaps) -> None:
    """Run a crawl job to completion and write the extracted items."""
    from .sources import write_any

    spark, _owned = _own_spark(cpus)
    try:
        engine, job = _engine_from_config(
            spark, config_path, pages_path, store_dir, epoch_seconds, robots
        )
        if seed_sitemaps:
            engine.init_from_sitemaps(
                stype=job.stype, extra_seeds=job.seeds
            )
        else:
            engine.init(job.seeds)
        results = engine.run(max_epochs=max_epochs)
        out_df = {
            "content": engine.articles,
            "ecommerce": engine.products,
            "business": engine.businesses,
        }[job.stype]()
        fmt = output_format or job.output_format or "json"
        path = output_path or job.output_path
        if out_df is not None and path:
            # 'db' goes through write_any's JDBC capability probe and
            # warns loudly on the parquet fallback (S10); the target
            # table comes from scraper.output.table
            opts = {"table": job.output_table} if job.output_table else {}
            write_any(out_df, path, fmt, **opts)
        report = {
            "epochs": len([r for r in results if not r.get("done")]),
            "urls_total": sum(r.get("dequeued", 0) for r in results),
            "urls_visited": sum(r.get("fetched_ok", 0) for r in results),
            "urls_failed": sum(r.get("failed_parked", 0) for r in results),
            "items_extracted": 0 if out_df is None else out_df.count(),
            "duration_seconds": sum(r.get("duration_s", 0) for r in results),
        }
        engine.close()
        click.echo(json.dumps(report, indent=2))
    except ConfigError as err:
        click.echo(f"config error: {err}", err=True)
        sys.exit(2)
    finally:
        if _owned:
            spark.stop()


@cli.command()
@click.option("--config", "-c", "config_path", required=True, type=str)
@click.option("--pages", "-p", "pages_path", required=True, type=str)
@click.option("--store", "-s", "store_dir", required=True, type=str)
@click.option("--epochs", type=int, default=1, help="epochs per invocation")
@click.option("--epoch-seconds", type=float, default=8.0)
@click.option("--cpus", type=int, default=8)
@click.option("--robots", type=str, default="none",
              help="'none', 'from-pages', or a parquet path of rules")
def schedule(config_path, pages_path, store_dir, epochs, epoch_seconds, cpus, robots) -> None:
    """Run N more epochs, resuming from the store's last committed
    epoch — invoke from cron for the reference's scheduled-job flow
    (job persistence = the snapshot manifest, T1/T2)."""
    from .crawl.epoch import CrawlEngine

    spark, _owned = _own_spark(cpus)
    try:
        engine, job = _engine_from_config(
            spark, config_path, pages_path, store_dir, epoch_seconds, robots
        )
        if engine.store.last_epoch() is None:
            engine.init(job.seeds)
        else:
            engine = CrawlEngine.resume(
                spark, engine.store, engine.pages, engine.robots, engine.cfg
            )
        for _ in range(epochs):
            result = engine.run_epoch()
            click.echo(json.dumps(result))
            if result.get("done"):
                break
        engine.close()
    finally:
        if _owned:
            spark.stop()


@cli.command()
@click.option("--config", "-c", "config_path", required=True, type=str)
@click.option("--pages", "-p", "pages_path", required=True, type=str)
@click.option("--store", "-s", "store_dir", required=True, type=str)
@click.option("--hints", type=str, default=None,
              help="parquet of sitemap hints (url, lastmod, changefreq, "
                   "priority_ppm); 'from-sitemaps' derives them from the "
                   "pages table's sitemap files; default: none (every "
                   "seen url uses --default-hours)")
@click.option("--epoch-hours", type=int, default=24, show_default=True,
              help="crawl-clock calibration: hours one epoch represents")
@click.option("--default-hours", type=int, default=168, show_default=True,
              help="refetch period for urls without a changefreq hint")
@click.option("--modified-since", type=str, default=None,
              help="ISO date: hints with lastmod >= this are due "
                   "regardless of period")
@click.option("--cpus", type=int, default=8)
@click.option("--robots", type=str, default="none",
              help="'none', 'from-pages', or a parquet path of rules")
def revisit(config_path, pages_path, store_dir, hints, epoch_hours,
            default_hours, modified_since, cpus, robots) -> None:
    """Re-enqueue seen urls that are DUE for refetch (sitemap
    changefreq/lastmod freshness rules) as a scheduling-only epoch,
    then let `schedule` fetch them — the continuous-crawl loop:
    scrape → revisit → schedule → revisit → …"""
    from .crawl.epoch import CrawlEngine

    spark, _owned = _own_spark(cpus)
    try:
        engine, _job = _engine_from_config(
            spark, config_path, pages_path, store_dir, 8.0, robots
        )
        if engine.store.last_epoch() is None:
            raise click.ClickException(
                "store has no committed epochs — run `scrape` first"
            )
        engine = CrawlEngine.resume(
            spark, engine.store, engine.pages, engine.robots, engine.cfg
        )
        hints_df = None
        if hints == "from-sitemaps":
            from .frontier.sitemap import sitemap_hints

            hints_df = sitemap_hints(engine.pages)
        elif hints is not None:
            hints_df = spark.read.parquet(hints)
        n = engine.enqueue_revisits(
            hints=hints_df,
            epoch_hours=epoch_hours,
            default_hours=default_hours,
            modified_since=modified_since,
        )
        engine.close()
        click.echo(json.dumps({"revisits": n, "epoch": engine._epoch}))
    finally:
        if _owned:
            spark.stop()


@cli.command("export-data")
@click.option("--input", "-i", "in_path", required=True, type=str)
@click.option("--input-format", "in_fmt", type=str, default=None)
@click.option("--output", "-o", "out_path", required=True, type=str)
@click.option("--output-format", "out_fmt", type=str, default=None)
@click.option("--cpus", type=int, default=4)
def export_data_cmd(in_path, in_fmt, out_path, out_fmt, cpus) -> None:
    """Convert data between formats (cli/main.py:275-334); formats are
    inferred from extensions when omitted."""
    from .sources import export_data

    def infer(path):
        ext = path.rstrip("/").rsplit(".", 1)[-1].lower()
        return {
            "csv": "csv", "json": "json", "parquet": "parquet",
            "xlsx": "xlsx", "xls": "xlsx",
        }.get(ext, "parquet")

    spark, _owned = _own_spark(cpus)
    try:
        n = export_data(
            spark, in_path, in_fmt or infer(in_path), out_path, out_fmt or infer(out_path)
        )
        click.echo(json.dumps({"rows_exported": n}))
    finally:
        if _owned:
            spark.stop()


@cli.command("create-config")
@click.option("--type", "-t", "stype", type=click.Choice(["ecommerce", "business", "content"]),
              default="ecommerce")
@click.option("--output", "-o", "out_path", required=True, type=str)
def create_config(stype, out_path) -> None:
    """Emit a default config for a scraper type."""
    import yaml

    selectors = {
        "ecommerce": {
            "product_container": ".product", "name": ".product-title",
            "price": ".price", "availability": ".availability",
            "images": ".product-image img", "rating": ".rating",
            "review_count": ".review-count",
        },
        "business": {
            "business_container": ".business", "name": ".business-name",
            "address": ".address", "phone": ".phone", "email": ".email",
            "website": ".website", "categories": ".category",
        },
        "content": {
            "article_container": ".article", "title": ".article-title",
            "date": ".article-date", "author": ".article-author",
            "content": ".article-content", "excerpt": ".article-excerpt",
            "image": ".article-image img", "categories": ".article-category",
        },
    }[stype]
    config = {
        "scraper": {
            "type": stype,
            "urls": [f"https://example.org/{stype}"],
            "selectors": selectors,
            "delay": 2,
            "retries": 3,
            "output": {"format": "json", "path": f"./data/{stype}.json"},
        }
    }
    with open(out_path, "w") as fh:
        yaml.safe_dump(config, fh, sort_keys=False)
    click.echo(f"wrote {out_path}")


@cli.command("vacuum")
@click.option("--store", "-s", "store_dir", required=True, type=str)
@click.option("--table", default="frontier_base", show_default=True)
@click.option("--keep", default=4, show_default=True,
              help="snapshots to retain (newest first)")
@click.option("--force", is_flag=True, default=False,
              help="expire committed append-table deltas anyway "
                   "(TRUNCATES the table for every committed read)")
def vacuum(store_dir, table, keep, force) -> None:
    """Iceberg-style snapshot maintenance: drop old snapshot data dirs
    of a store table, keeping manifest lineage (paths nulled). Time
    travel past the retention window then refuses loudly. Append
    tables (seen/articles/...) are the union of their committed
    deltas, so vacuuming them is refused without --force."""
    from .frontier.store import SnapshotStore

    store = SnapshotStore(store_dir)
    try:
        removed = store.expire_snapshots(table, keep_last=keep, force=force)
    except ValueError as exc:
        raise click.ClickException(str(exc))
    click.echo(json.dumps({"table": table, "removed": removed, "kept": keep}))


@cli.command("show")
@click.option("--store", "-s", "store_dir", required=True, type=str)
@click.option("--table", default="seen", show_default=True,
              help="append table: seen/articles/products/businesses/"
                   "frontier_delta/frontier_tomb")
@click.option("--as-of", "as_of", type=int, default=None,
              help="time travel: committed state as of this epoch")
@click.option("--limit", default=5, show_default=True)
@click.option("--cpus", default=4, show_default=True)
def show(store_dir, table, as_of, limit, cpus) -> None:
    """Inspect a store table (optionally time-traveled): row count and
    a sample, as JSON."""
    from .frontier.store import SnapshotStore

    spark, _owned = _own_spark(cpus)
    try:
        store = SnapshotStore(store_dir)
        df = store.read_committed(spark, table, up_to_epoch=as_of)
        if df is None:
            click.echo(json.dumps({"table": table, "rows": 0, "sample": []}))
            return
        sample = [
            {k: (v if isinstance(v, (int, float, str, bool, type(None)))
                 else str(v))
             for k, v in r.asDict().items()}
            for r in df.limit(limit).collect()
        ]
        click.echo(json.dumps(
            {"table": table, "as_of": as_of, "rows": df.count(),
             "sample": sample}
        ))
    finally:
        if _owned:
            spark.stop()


@cli.group()
def analyze() -> None:
    """Training-data corpus analysis over a parquet documents table
    (columns: an id, a text column; names overridable): the quality
    funnel, dedup families, and per-doc quality scoring — the
    operators/ layer as a command-line surface."""


def _emit_json_rows(rows, fields) -> None:
    """Shared JSON renderer for the row-shaped analyze modes — one
    place to change the output contract instead of one per branch."""
    click.echo(json.dumps(
        [{f: r[f] for f in fields} for r in rows], indent=2
    ))


def _analyze_docs(spark, in_path, id_col, text_col):
    df = spark.read.parquet(in_path)
    out = df
    if id_col != "doc_id":
        out = out.withColumnRenamed(id_col, "doc_id")
    if text_col != "text":
        out = out.withColumnRenamed(text_col, "text")
    return out


_ANALYZE_IO = [
    click.option("--input", "-i", "in_path", required=True, type=str,
                 help="parquet documents table"),
    click.option("--id-col", default="doc_id", show_default=True),
    click.option("--text-col", default="text", show_default=True),
    click.option("--cpus", default=0, type=int,
                 help="cores (default: all)"),
]


def _with_io(fn):
    for opt in reversed(_ANALYZE_IO):
        fn = opt(fn)
    return fn


@analyze.command("funnel")
@_with_io
@click.option("--benchmark", "bench_path", default=None, type=str,
              help="parquet eval corpus for decontamination (optional)")
@click.option("--lang", default="en", show_default=True)
def analyze_funnel(in_path, id_col, text_col, cpus, bench_path, lang) -> None:
    """The full corpus funnel (URL → lang → Gopher → exact dedup →
    near dedup → decontaminate) as ONE plan; prints the per-stage
    survivor report."""
    from pyspark.sql import functions as F

    from .operators.pipeline import corpus_funnel

    spark, _owned = _own_spark(cpus)
    try:
        docs = _analyze_docs(spark, in_path, id_col, text_col)
        if "url" not in docs.columns:
            docs = docs.withColumn(
                "url",
                F.concat(F.lit("https://corpus.local/doc/"), F.col("doc_id")),
            )
        bench = (
            spark.read.parquet(bench_path)
            if bench_path
            else spark.createDataFrame([], "text string")
        )
        rows = corpus_funnel(docs, bench, lang=lang).collect()
        click.echo(json.dumps(
            [
                {"stage": r["stage"], "docs": r["docs"], "tokens": r["tokens"]}
                for r in sorted(rows, key=lambda r: r["stage_ord"])
            ],
            indent=2,
        ))
    finally:
        if _owned:
            spark.stop()


@analyze.command("dedup")
@_with_io
@click.option("--method", type=click.Choice(["exact", "minhash", "simhash"]),
              default="exact", show_default=True)
@click.option("--output", "-o", "out_path", default=None, type=str,
              help="write the result table as parquet")
def analyze_dedup(in_path, id_col, text_col, cpus, method, out_path) -> None:
    """Dedup report: exact (fingerprint groups) or near-dup pairs
    (MinHash-LSH / SimHash)."""
    from pyspark.sql import functions as F

    from .operators import dedup as dd

    spark, _owned = _own_spark(cpus)
    try:
        docs = _analyze_docs(spark, in_path, id_col, text_col)
        if method == "exact":
            out = dd.dedup_exact(docs)
            summary = {
                "groups": out.count(),
                "duplicate_rows": out.filter("dup_count > 1")
                .agg(F.coalesce(F.sum(F.col("dup_count") - 1), F.lit(0)))
                .collect()[0][0],
            }
        elif method == "minhash":
            out = dd.minhash_lsh_pairs(docs)
            summary = {"near_dup_pairs": out.count()}
        else:
            out = dd.simhash_near_pairs(docs)
            summary = {"near_dup_pairs": out.count()}
        if out_path:
            out.write.mode("overwrite").parquet(out_path)
            summary["output"] = out_path
        summary["method"] = method
        click.echo(json.dumps(summary))
    finally:
        if _owned:
            spark.stop()


@analyze.command("quality")
@_with_io
@click.option("--output", "-o", "out_path", default=None, type=str,
              help="write per-doc scores as parquet")
def analyze_quality(in_path, id_col, text_col, cpus, out_path) -> None:
    """Per-document Gopher quality flags + basic doc stats; prints the
    keep/drop summary."""
    from pyspark.sql import functions as F

    from .operators.quality import gopher_quality

    spark, _owned = _own_spark(cpus)
    try:
        docs = _analyze_docs(spark, in_path, id_col, text_col)
        scored = gopher_quality(docs)
        if out_path:
            scored.write.mode("overwrite").parquet(out_path)
        agg = scored.agg(
            F.count(F.lit(1)).alias("docs"),
            F.count(F.when(F.col("gopher_keep"), 1)).alias("kept"),
        ).collect()[0]
        summary = {"docs": agg["docs"], "kept": agg["kept"],
                   "dropped": agg["docs"] - agg["kept"]}
        if out_path:
            summary["output"] = out_path
        click.echo(json.dumps(summary))
    finally:
        if _owned:
            spark.stop()


@analyze.command("media")
@click.option("--input", "-i", "in_path", required=True, type=str,
              help="parquet media table (an id column + binary payloads)")
@click.option("--id-col", default="media_id", show_default=True)
@click.option("--payload-col", default="payload", show_default=True)
@click.option("--cpus", default=0, type=int, help="cores (default: all)")
@click.option("--mode",
              type=click.Choice(["sniff", "frames", "dedup", "anim-dedup"]),
              default="sniff", show_default=True,
              help="sniff: header triage report; frames: demux GIF/APNG "
                   "animations to per-frame stats; dedup: still-image "
                   "near-dup pairs over decoded pixels; anim-dedup: "
                   "animation-grain near-dup pairs over rendered frames")
@click.option("--max-hamming", default=3, show_default=True, type=int)
@click.option("--output", "-o", "out_path", default=None, type=str,
              help="write the result table as parquet")
def analyze_media(in_path, id_col, payload_col, cpus, mode, max_hamming,
                  out_path) -> None:
    """Media-corpus analysis over a parquet table of binary payloads:
    byte-level header triage, real animation demux (GIF89a/APNG), and
    decoded-pixel near-dup at image or animation grain — the
    multimodal operators as a command-line surface. Undecodable
    payloads cost a row, never the job."""
    from pyspark.sql import functions as F

    from .operators import multimodal as mm

    spark, _owned = _own_spark(cpus)
    try:
        df = spark.read.parquet(in_path)
        media = df.select(
            F.col(id_col).alias("media_id"),
            F.col(payload_col).alias("payload"),
        )
        if mode == "sniff":
            out = mm.sniff_media_headers(media)

            def summarize(df):
                rows = (
                    df.groupBy("format", "valid").count()
                    .orderBy("format", "valid").collect()
                )
                return {
                    "by_format": [
                        {"format": r["format"], "valid": r["valid"],
                         "count": r["count"]}
                        for r in rows
                    ],
                }
        else:
            full = media.select(
                "media_id",
                F.lit("image").alias("kind"),
                "payload",
                F.lit(None).cast(
                    "struct<width:int,height:int,sample_rate:int,"
                    "n_frames:int,codec:string>"
                ).alias("meta"),
            )
            if mode == "frames":
                out = mm.animation_frames_df(full, skip_errors=True)

                def summarize(df):
                    agg = df.agg(
                        F.countDistinct("media_id").alias("animations"),
                        F.count(F.lit(1)).alias("frames"),
                    ).collect()[0]
                    return {"animations": agg["animations"],
                            "frames": agg["frames"]}
            elif mode == "dedup":
                mm.register_decoder("image", mm.compressed_raster_decoder)
                out = mm.dhash_near_pairs(
                    full, max_hamming=max_hamming, skip_errors=True
                )

                def summarize(df):
                    return {"near_dup_pairs": df.count()}
            else:  # anim-dedup
                out = mm.animation_near_pairs(
                    full, max_hamming=max_hamming, skip_errors=True
                )

                def summarize(df):
                    return {"near_dup_animation_pairs": df.count()}
        if out_path:
            # write FIRST and summarize from the sink: the decode/join
            # pipeline executes once, not once per consumer
            out.write.mode("overwrite").parquet(out_path)
            out = spark.read.parquet(out_path)
        summary = summarize(out)
        if out_path:
            summary["output"] = out_path
        summary["mode"] = mode
        click.echo(json.dumps(summary))
    finally:
        if _owned:
            spark.stop()


@analyze.command("clean")
@_with_io
@click.option("--output", "-o", "out_path", default=None, type=str,
              help="write the corrected corpus as parquet")
@click.option("--lang", default=None, type=str,
              help="also keep only this language's paragraphs "
                   "(CCNet paragraph-grain LID split)")
def analyze_clean(in_path, id_col, text_col, cpus, out_path, lang) -> None:
    """Line-wise corrections: strip lines repeated within each document
    (RefinedWeb §3.3), optionally followed by the paragraph-grain
    language split; prints lines/paragraphs dropped."""
    from pyspark.sql import functions as F

    from .operators.textops import intra_doc_line_dedup, paragraph_language_id

    spark, _owned = _own_spark(cpus)
    try:
        docs = _analyze_docs(spark, in_path, id_col, text_col)
        fixed = intra_doc_line_dedup(docs)
        out = fixed.select(
            "doc_id", "n_lines", "n_dropped",
            F.col("text_fixed").alias("text"),
        )
        if lang:
            split = paragraph_language_id(out, keep_lang=lang)
            out = split.select(
                "doc_id", "n_paras", "n_kept", "doc_lang",
                F.col("text_kept").alias("text"),
            ).join(out.select("doc_id", "n_lines", "n_dropped"), "doc_id")
        if out_path:
            out.write.mode("overwrite").parquet(out_path)
        aggs = [
            F.count(F.lit(1)).alias("docs"),
            F.sum("n_dropped").alias("lines_dropped"),
        ]
        if lang:
            aggs.append(
                F.sum(F.col("n_paras") - F.col("n_kept")).alias(
                    "paras_dropped"
                )
            )
        row = out.agg(*aggs).collect()[0]
        summary = {k: row[k] for k in row.asDict()}
        if out_path:
            summary["output"] = out_path
        click.echo(json.dumps(summary))
    finally:
        if _owned:
            spark.stop()


@cli.group()
def job() -> None:
    """Job control (T3/T5; reference job_scheduler.py:522-859):
    create/list/status/pause/resume/update/delete/run-now over a
    manifest-backed job registry."""


def _registry(jobs_dir):
    from .schedulers import JobRegistry

    return JobRegistry(jobs_dir)


@job.command("create")
@click.option("--jobs-dir", "-j", required=True, type=str,
              help="registry directory (holds _jobs.json + default stores)")
@click.option("--name", "-n", required=True, type=str)
@click.option("--config", "-c", "config_path", required=True, type=str)
@click.option("--pages", "-p", "pages_path", required=True, type=str)
@click.option("--store", "-s", "store_dir", type=str, default=None)
@click.option("--cron", "cron_expression", type=str, default=None,
              help="informational cron spec; firing is the cluster "
                   "scheduler's job (cron + spark-submit)")
@click.option("--email", type=str, default=None,
              help="notify this address after each run (T4)")
@click.option("--webhook", type=str, default=None,
              help="POST the run report to this URL after each run (T4)")
def job_create(jobs_dir, name, config_path, pages_path, store_dir,
               cron_expression, email, webhook) -> None:
    """Register a job; the config is validated now, not at first run."""
    from .schedulers import JobError

    try:
        job_id = _registry(jobs_dir).create(
            name, config_path, pages_path, store_dir, cron_expression,
            email=email, webhook=webhook,
        )
        click.echo(json.dumps({"job_id": job_id}))
    except (JobError, ConfigError) as err:
        click.echo(f"job error: {err}", err=True)
        sys.exit(2)


@job.command("list")
@click.option("--jobs-dir", "-j", required=True, type=str)
def job_list(jobs_dir) -> None:
    click.echo(json.dumps(_registry(jobs_dir).list(), indent=2))


@job.command("status")
@click.option("--jobs-dir", "-j", required=True, type=str)
@click.argument("job_id")
def job_status(jobs_dir, job_id) -> None:
    """Job row + its store's last committed epoch."""
    from .frontier.store import SnapshotStore
    from .schedulers import JobError

    try:
        row = _registry(jobs_dir).get(job_id)
    except JobError as err:
        click.echo(f"job error: {err}", err=True)
        sys.exit(2)
    last = SnapshotStore(row["store_dir"]).last_epoch()
    click.echo(json.dumps({**row, "store_last_epoch": last}, indent=2))


@job.command("pause")
@click.option("--jobs-dir", "-j", required=True, type=str)
@click.argument("job_id")
def job_pause(jobs_dir, job_id) -> None:
    _job_mutate(jobs_dir, job_id, "pause")


@job.command("resume")
@click.option("--jobs-dir", "-j", required=True, type=str)
@click.argument("job_id")
def job_resume(jobs_dir, job_id) -> None:
    _job_mutate(jobs_dir, job_id, "resume")


def _job_mutate(jobs_dir, job_id, op) -> None:
    from .schedulers import JobError

    try:
        row = getattr(_registry(jobs_dir), op)(job_id)
        click.echo(json.dumps({"job_id": row["job_id"], "status": row["status"]}))
    except JobError as err:
        click.echo(f"job error: {err}", err=True)
        sys.exit(2)


@job.command("update")
@click.option("--jobs-dir", "-j", required=True, type=str)
@click.option("--name", type=str, default=None)
@click.option("--config", "config_path", type=str, default=None)
@click.option("--pages", "pages_path", type=str, default=None)
@click.option("--cron", "cron_expression", type=str, default=None)
@click.option("--email", type=str, default=None)
@click.option("--webhook", type=str, default=None)
@click.argument("job_id")
def job_update(jobs_dir, job_id, name, config_path, pages_path,
               cron_expression, email, webhook) -> None:
    """Update job fields; a new config is re-validated before commit."""
    from .schedulers import JobError

    changes = {
        k: v
        for k, v in {
            "name": name, "config_path": config_path,
            "pages_path": pages_path, "cron_expression": cron_expression,
            "email": email, "webhook": webhook,
        }.items()
        if v is not None
    }
    try:
        row = _registry(jobs_dir).update(job_id, **changes)
        click.echo(json.dumps(row, indent=2))
    except (JobError, ConfigError) as err:
        click.echo(f"job error: {err}", err=True)
        sys.exit(2)


@job.command("delete")
@click.option("--jobs-dir", "-j", required=True, type=str)
@click.option("--remove-store", is_flag=True, default=False,
              help="also delete the job's snapshot store (crawl data)")
@click.argument("job_id")
def job_delete(jobs_dir, job_id, remove_store) -> None:
    from .schedulers import JobError

    try:
        _registry(jobs_dir).delete(job_id, remove_store=remove_store)
        click.echo(json.dumps({"deleted": job_id}))
    except JobError as err:
        click.echo(f"job error: {err}", err=True)
        sys.exit(2)


@job.command("notifications")
@click.option("--jobs-dir", "-j", required=True, type=str)
def job_notifications(jobs_dir) -> None:
    """The registry's notification audit log (T4): every payload sent
    (or attempted) with per-sender outcomes."""
    click.echo(json.dumps(_registry(jobs_dir).notification_log().read(), indent=2))


@job.command("run-now")
@click.option("--jobs-dir", "-j", required=True, type=str)
@click.option("--epochs", type=int, default=1)
@click.option("--epoch-seconds", type=float, default=8.0)
@click.option("--cpus", type=int, default=8)
@click.option("--robots", type=str, default="none")
@click.option("--force", is_flag=True, default=False,
              help="run even if the job is paused")
@click.argument("job_id")
def job_run_now(jobs_dir, job_id, epochs, epoch_seconds, cpus, robots, force) -> None:
    """Run N more epochs of the job, resume-or-init (run_job_now)."""
    from .schedulers import JobError

    spark, _owned = _own_spark(cpus)
    try:
        results = _registry(jobs_dir).run_now(
            spark, job_id, epochs=epochs, epoch_seconds=epoch_seconds,
            robots=robots, force=force,
        )
        for result in results:
            click.echo(json.dumps(result))
    except JobError as err:
        click.echo(f"job error: {err}", err=True)
        sys.exit(2)
    finally:
        if _owned:
            spark.stop()


@job.command("daemon")
@click.option("--jobs-dir", "-j", required=True, type=str)
@click.option("--cpus", type=int, default=8)
@click.option("--epochs-per-firing", type=int, default=1)
@click.option("--max-instances", type=int, default=3,
              help="concurrent runs of ONE job before firings skip")
@click.option("--max-firings", type=int, default=None,
              help="exit after this many firing attempts (default: run "
                   "until interrupted)")
@click.option("--for-seconds", type=float, default=None,
              help="exit after this much wall-clock")
def job_daemon(jobs_dir, cpus, epochs_per_firing, max_instances,
               max_firings, for_seconds) -> None:
    """Start-and-leave-running scheduler loop (T1; the reference's
    BackgroundScheduler+CronTrigger): sleeps to each active job's next
    cron firing, fires run_now on a worker thread, honors pause at
    fire time, skips past max-instances stacking. Ctrl-C exits."""
    import time as _time

    from .schedulers import JobError
    from .schedulers.daemon import JobDaemon

    spark, _owned = _own_spark(cpus)
    try:
        daemon = JobDaemon(
            _registry(jobs_dir),
            spark_factory=lambda: spark,
            max_instances=max_instances,
            epochs_per_firing=epochs_per_firing,
        )
        until = (
            _time.time() + for_seconds if for_seconds is not None else None
        )
        try:
            report = daemon.run(max_firings=max_firings, until_ts=until)
        except KeyboardInterrupt:
            daemon.stop()
            report = {
                "fired": len(daemon.fired),
                "skipped": len(daemon.skipped),
                "interrupted": True,
            }
        click.echo(json.dumps(report))
    except JobError as err:
        click.echo(f"job error: {err}", err=True)
        sys.exit(2)
    finally:
        if _owned:
            spark.stop()


@cli.command()
@click.option("--store", "-s", "store_dir", required=True, type=str)
def report(store_dir) -> None:
    """Per-epoch lineage metrics (the reference's run report, A4)."""
    from .frontier.store import SnapshotStore

    click.echo(json.dumps(SnapshotStore(store_dir).epoch_metrics(), indent=2))


if __name__ == "__main__":
    cli()


@analyze.command("search")
@click.option("--input", "-i", "in_path", default=None, type=str,
              help="parquet documents table (builds the index fresh)")
@click.option("--from-store", "store_dir", default=None, type=str,
              help="serve from a crawl store's INCREMENTAL index "
                   "(cfg.index_articles crawls) — no rebuild, no "
                   "re-tokenization; doc_id = xxhash64(page url)")
@click.option("--id-col", default="doc_id", show_default=True)
@click.option("--text-col", default="text", show_default=True)
@click.option("--cpus", default=0, type=int, help="cores (default: all)")
@click.option("--query", "-q", "query_strs", multiple=True,
              help="query string (repeatable)")
@click.option("--like", "like_ids", multiple=True, type=int,
              help="More-Like-This: find docs similar to this doc_id "
                   "(repeatable; mutually exclusive with -q/--anchors)")
@click.option("--phrase", "phrase_str", default=None, type=str,
              help="exact phrase query (slop=0; consecutive tokens) — "
                   "mutually exclusive with -q/--like/--anchors; with "
                   "--from-store, serves from the crawl's positional "
                   "index (index_positions crawls) with zero "
                   "re-tokenization")
@click.option("--snippet-window", default=0, show_default=True, type=int,
              help="attach a best-fragment snippet of this many tokens "
                   "to every hit (requires -i/--input)")
@click.option("--must", "must_terms", multiple=True,
              help="boolean mode: term that MUST be present (repeatable)")
@click.option("--should", "should_terms", multiple=True,
              help="boolean mode: optional term; the count present "
                   "ranks (repeatable)")
@click.option("--must-not", "must_not_terms", multiple=True,
              help="boolean mode: term that must NOT be present "
                   "(repeatable)")
@click.option("--suggest", "suggest_terms", multiple=True,
              help="spell-correct mode: \"did you mean\" suggestions "
                   "for this term against the corpus/index vocabulary "
                   "(repeatable)")
@click.option("--max-edit", default=1, show_default=True, type=int,
              help="suggest mode: maximum Levenshtein distance (1 or 2)")
@click.option("--complete", "complete_prefixes", multiple=True,
              help="autocomplete mode: top completions for this prefix "
                   "by corpus frequency (repeatable)")
@click.option("--near", "near_str", default=None, type=str,
              help="proximity mode: docs where ALL these terms co-occur "
                   "inside --near-window tokens (unordered SpanNear); "
                   "with --from-store, serves from the positional index")
@click.option("--near-window", default=12, show_default=True, type=int)
@click.option("--topk", default=10, show_default=True, type=int)
@click.option("--anchors", "anchors_path", default=None, type=str,
              help="parquet anchor table (doc_id, text) -> BM25F "
                   "fielded ranking (w_anchor=2)")
@click.option("--min-df", default=1, show_default=True, type=int)
@click.option("--max-df-ppm", default=1_000_000, show_default=True, type=int)
@click.option("--block-size", default=None, type=int,
              help="postings block size for --from-store (default: the "
                   "writing crawl's index_block_size, read back from "
                   "the store's shard metadata)")
def analyze_search(in_path, store_dir, id_col, text_col, cpus, query_strs,
                   like_ids, phrase_str, snippet_window, must_terms,
                   should_terms, must_not_terms, suggest_terms, max_edit,
                   complete_prefixes, near_str, near_window, topk,
                   anchors_path, min_df, max_df_ppm, block_size) -> None:
    """BM25 retrieval over the corpus: builds the blocked postings
    index (norms-in-postings) and runs the queries DAAT; with
    --anchors, ranks fielded BM25F (body + anchor text); with --like,
    More-Like-This document similarity; with --from-store, serves
    mid-crawl from a store's incremental index."""
    from pyspark.sql import functions as F

    from .operators.textops import (
        bm25_search,
        bm25f_search,
        build_postings,
        doc_lengths,
        more_like_this,
    )

    if bool(in_path) == bool(store_dir):
        raise click.UsageError("pass exactly one of -i/--input or --from-store")
    boolean_mode = bool(must_terms or should_terms or must_not_terms)
    n_modes = sum(map(bool, (query_strs, like_ids, phrase_str, boolean_mode,
                             suggest_terms, complete_prefixes, near_str)))
    if n_modes != 1:
        raise click.UsageError("pass exactly one of -q/--query, --like, "
                               "--phrase, --must/--should/--must-not, "
                               "--suggest, --complete, --near")
    if (boolean_mode or suggest_terms or complete_prefixes or near_str) \
            and (anchors_path or snippet_window):
        raise click.UsageError("boolean/suggest mode does not combine with "
                               "--anchors/--snippet-window")
    if phrase_str and anchors_path:
        raise click.UsageError("--phrase does not combine with --anchors "
                               "(phrase matching is positional, not fielded)")
    if snippet_window < 0:
        raise click.UsageError("--snippet-window must be >= 0")
    if snippet_window and (store_dir or like_ids):
        raise click.UsageError("--snippet-window requires -i/--input with "
                               "-q or --phrase (snippets re-read text)")
    if (phrase_str or boolean_mode or suggest_terms or complete_prefixes
            or near_str) and (min_df, max_df_ppm) != (1, 1_000_000):
        raise click.UsageError("--phrase/boolean/suggest/complete ignores "
                               "df gates (a gate silently losing a clause "
                               "term flips matches) — drop "
                               "--min-df/--max-df-ppm")
    if like_ids and anchors_path:
        raise click.UsageError("--like does not combine with --anchors")
    if store_dir and anchors_path:
        raise click.UsageError(
            "--from-store does not combine with --anchors (anchor text "
            "is not in the index)"
        )
    spark, _owned = _own_spark(cpus)
    try:
        if store_dir:
            from .crawl.epoch import load_search_index
            from .frontier.store import SnapshotStore

            gated = (min_df, max_df_ppm) != (1, 1_000_000)
            # --like: load the index UNGATED — Lucene MLT derives query
            # weights from the full vocabulary regardless of search-side
            # df gates (the self-build path's documented semantics); the
            # gates are applied to a merged search view below
            idx = load_search_index(
                spark, SnapshotStore(store_dir),
                min_df=1 if like_ids else min_df,
                max_df_ppm=1_000_000 if like_ids else max_df_ppm,
                block_size=block_size,  # None -> writer's stamped value
            )
            if idx is None:
                click.echo(
                    "store has no incremental index (crawl with "
                    "index_articles enabled first)", err=True,
                )
                sys.exit(2)
            if complete_prefixes:
                from .operators.textops import prefix_suggest

                try:
                    out = prefix_suggest(
                        prefixes=list(complete_prefixes),
                        index=idx["postings"], k=topk,
                    )
                except ValueError as err:
                    raise click.UsageError(str(err)) from None
                _emit_json_rows(
                    out.orderBy("prefix", "rank").collect(),
                    ("prefix", "rank", "term", "cnt"),
                )
                return
            if suggest_terms:
                from .operators.textops import spell_correct

                try:
                    out = spell_correct(
                        queries=list(suggest_terms),
                        index=idx["postings"], max_edit=max_edit, k=topk,
                    )
                except ValueError as err:
                    raise click.UsageError(str(err)) from None
                _emit_json_rows(
                    out.orderBy("query", "rank").collect(),
                    ("query", "rank", "suggestion", "distance", "cnt"),
                )
                return
            if boolean_mode:
                from .operators.textops import boolean_search

                try:
                    out = boolean_search(
                        index=idx["postings"], must=must_terms,
                        should=should_terms, must_not=must_not_terms,
                        k=topk,
                    )
                except ValueError as err:
                    raise click.UsageError(str(err)) from None
                _emit_json_rows(out.collect(), ("doc_id", "n_should"))
                return
            if near_str:
                from .operators.textops import proximity_search

                if "positions" not in idx:
                    click.echo(
                        "store index has no positions (crawl with "
                        "index_positions enabled first)", err=True,
                    )
                    sys.exit(2)
                try:
                    out = proximity_search(
                        query=near_str, index=idx["positions"],
                        window=near_window, k=topk,
                    )
                except ValueError as err:
                    raise click.UsageError(str(err)) from None
                _emit_json_rows(
                    out.collect(), ("doc_id", "n_windows", "best_start")
                )
                return
            if phrase_str:
                from .operators.textops import phrase_search

                if "positions" not in idx:
                    click.echo(
                        "store index has no positions (crawl with "
                        "index_positions enabled first)", err=True,
                    )
                    sys.exit(2)
                try:
                    out = phrase_search(
                        phrase=phrase_str, index=idx["positions"], k=topk
                    )
                except ValueError as err:
                    raise click.UsageError(str(err)) from None
                click.echo(json.dumps(
                    [
                        {
                            "phrase": phrase_str,
                            "doc_id": r["doc_id"],
                            "phrase_tf": r["phrase_tf"],
                            "first_pos": r["first_pos"],
                        }
                        for r in out.collect()
                    ],
                    indent=2,
                ))
                return
            if like_ids:
                search_view = None
                if gated:
                    from .operators.textops import merge_postings

                    # merge contract: merge([ungated], gates) ≡
                    # build_gated — from-store MLT now matches the
                    # from-text path for any df-gate settings
                    search_view = merge_postings(
                        [idx["postings"]], min_df=min_df,
                        max_df_ppm=max_df_ppm, n_docs=idx["n_docs"],
                    )
                # MLT against the LIVE index: query terms derived from
                # the persisted postings, zero corpus re-tokenization
                out = more_like_this(
                    None, list(like_ids), k=topk, index=idx,
                    search_postings=search_view,
                )
                rows = out.orderBy("query_id", "rank").collect()
                click.echo(json.dumps(
                    [
                        {
                            "like_doc": r["query_id"],
                            "rank": r["rank"],
                            "doc_id": r["doc_id"],
                            "score_u": r["score_u"],
                            "n_terms": r["n_terms"],
                        }
                        for r in rows
                    ],
                    indent=2,
                ))
                return
            qdf = spark.createDataFrame(
                [(i + 1, q) for i, q in enumerate(query_strs)],
                "query_id long, text string",
            )
            out = bm25_search(
                idx["postings"], qdf, idx["n_docs"], idx["t_tokens"], k=topk
            )
            rows = out.orderBy("query_id", "rank").collect()
            queries_by_id = {i + 1: q for i, q in enumerate(query_strs)}
            click.echo(json.dumps(
                [
                    {
                        "query": queries_by_id[r["query_id"]],
                        "rank": r["rank"],
                        "doc_id": r["doc_id"],
                        "score_u": r["score_u"],
                        "n_terms": r["n_terms"],
                    }
                    for r in rows
                ],
                indent=2,
            ))
            return
        docs = _analyze_docs(spark, in_path, id_col, text_col)
        if complete_prefixes:
            from .operators.textops import prefix_suggest

            try:
                out = prefix_suggest(
                    docs, list(complete_prefixes), k=topk,
                )
            except ValueError as err:
                raise click.UsageError(str(err)) from None
            _emit_json_rows(
                out.orderBy("prefix", "rank").collect(),
                ("prefix", "rank", "term", "cnt"),
            )
            return
        if suggest_terms:
            from .operators.textops import spell_correct

            try:
                out = spell_correct(
                    docs, list(suggest_terms), max_edit=max_edit, k=topk,
                )
            except ValueError as err:
                raise click.UsageError(str(err)) from None
            _emit_json_rows(
                out.orderBy("query", "rank").collect(),
                ("query", "rank", "suggestion", "distance", "cnt"),
            )
            return
        if boolean_mode:
            from .operators.textops import boolean_search

            try:
                out = boolean_search(
                    docs, must=must_terms, should=should_terms,
                    must_not=must_not_terms, k=topk,
                )
            except ValueError as err:
                raise click.UsageError(str(err)) from None
            _emit_json_rows(out.collect(), ("doc_id", "n_should"))
            return
        if near_str:
            from .operators.textops import proximity_search

            try:
                out = proximity_search(
                    docs, near_str, window=near_window, k=topk
                )
            except ValueError as err:
                raise click.UsageError(str(err)) from None
            _emit_json_rows(
                out.collect(), ("doc_id", "n_windows", "best_start")
            )
            return
        if phrase_str:
            from .operators.textops import phrase_search, snippet_extract

            try:
                out = phrase_search(docs, phrase_str, k=topk)
            except ValueError as err:
                raise click.UsageError(str(err)) from None
            rows = out.collect()
            snippets = {}
            if snippet_window and rows:
                hit_ids = [r["doc_id"] for r in rows]
                snippets = {
                    r["doc_id"]: r["snippet"]
                    for r in snippet_extract(
                        docs.where(F.col("doc_id").isin(hit_ids)),
                        phrase_str, window=snippet_window,
                    ).collect()
                }
            click.echo(json.dumps(
                [
                    {
                        "phrase": phrase_str,
                        "doc_id": r["doc_id"],
                        "phrase_tf": r["phrase_tf"],
                        "first_pos": r["first_pos"],
                        **(
                            {"snippet": snippets.get(r["doc_id"])}
                            if snippet_window else {}
                        ),
                    }
                    for r in rows
                ],
                indent=2,
            ))
            return
        if like_ids:
            out = more_like_this(
                docs, list(like_ids), k=topk, min_df=min_df,
                max_df_ppm=max_df_ppm,
            )
            rows = out.orderBy("query_id", "rank").collect()
            click.echo(json.dumps(
                [
                    {
                        "like_doc": r["query_id"],
                        "rank": r["rank"],
                        "doc_id": r["doc_id"],
                        "score_u": r["score_u"],
                        "n_terms": r["n_terms"],
                    }
                    for r in rows
                ],
                indent=2,
            ))
            return
        qdf = spark.createDataFrame(
            [(i + 1, q) for i, q in enumerate(query_strs)],
            "query_id long, text string",
        )
        if anchors_path:
            anchors = spark.read.parquet(anchors_path)
            out = bm25f_search(docs, anchors, qdf, k=topk)
        else:
            dls = doc_lengths(docs)
            tot = dls.agg(
                F.count("*").alias("n"), F.sum("dl").alias("t")
            ).collect()[0]
            idx = build_postings(
                docs, int(tot["n"]), min_df=min_df,
                max_df_ppm=max_df_ppm, include_dls=True,
            )
            out = bm25_search(idx, qdf, int(tot["n"]), int(tot["t"]), k=topk)
        rows = out.orderBy("query_id", "rank").collect()
        queries_by_id = {i + 1: q for i, q in enumerate(query_strs)}
        snippets = {}
        if snippet_window and rows:
            from .operators.textops import snippet_extract

            # one bounded snippet pass per query, over its hits only
            for qid, q in queries_by_id.items():
                hit_ids = [r["doc_id"] for r in rows if r["query_id"] == qid]
                if not hit_ids:
                    continue
                for r in snippet_extract(
                    docs.where(F.col("doc_id").isin(hit_ids)),
                    q, window=snippet_window,
                ).collect():
                    snippets[(qid, r["doc_id"])] = r["snippet"]
        click.echo(json.dumps(
            [
                {
                    "query": queries_by_id[r["query_id"]],
                    "rank": r["rank"],
                    "doc_id": r["doc_id"],
                    "score_u": r["score_u"],
                    "n_terms": r["n_terms"],
                    **(
                        {
                            "snippet": snippets.get(
                                (r["query_id"], r["doc_id"])
                            )
                        }
                        if snippet_window else {}
                    ),
                }
                for r in rows
            ],
            indent=2,
        ))
    finally:
        if _owned:
            spark.stop()


@analyze.command("related")
@click.option("--input", "-i", "in_path", required=True, type=str,
              help="parquet documents table")
@click.option("--seed", "-t", "seed_strs", multiple=True, required=True,
              help="seed term (repeatable)")
@click.option("--id-col", default="doc_id", show_default=True)
@click.option("--text-col", default="text", show_default=True)
@click.option("--window", default=5, show_default=True, type=int,
              help="co-occurrence band: neighbors within ±window tokens")
@click.option("--topk", default=10, show_default=True, type=int)
@click.option("--min-pairs", default=2, show_default=True, type=int,
              help="drop neighbor terms with fewer co-occurrence pairs")
@click.option("--cpus", default=0, type=int, help="cores (default: all)")
def analyze_related(in_path, seed_strs, id_col, text_col, window, topk,
                    min_pairs, cpus) -> None:
    """Distributional related terms: for each seed, the neighbors most
    over-represented within ±window tokens, ranked by the integer PMI
    lift pairs·T·10⁶ // (cnt_seed·cnt_term)."""
    from .operators.textops import term_cooccurrence

    spark, _owned = _own_spark(cpus)
    try:
        docs = _analyze_docs(spark, in_path, id_col, text_col)
        try:
            out = term_cooccurrence(
                docs, list(seed_strs), window=window, k=topk,
                min_pairs=min_pairs,
            )
        except ValueError as err:
            raise click.UsageError(str(err)) from None
        _emit_json_rows(
            out.orderBy("seed", "rank").collect(),
            ("seed", "rank", "term", "pairs", "lift_ppm"),
        )
    finally:
        if _owned:
            spark.stop()


@analyze.command("kwic")
@click.option("--input", "-i", "in_path", required=True, type=str,
              help="parquet documents table")
@click.option("--term", "-t", "term", required=True, type=str)
@click.option("--id-col", default="doc_id", show_default=True)
@click.option("--text-col", default="text", show_default=True)
@click.option("--context", default=5, show_default=True, type=int)
@click.option("--limit", "limit_n", default=50, show_default=True, type=int,
              help="print at most this many occurrences (doc_id, pos order)")
@click.option("--cpus", default=0, type=int, help="cores (default: all)")
def analyze_kwic(in_path, term, id_col, text_col, context, limit_n,
                 cpus) -> None:
    """Keyword-in-context concordance: every occurrence of TERM with
    its ±context surrounding tokens."""
    from .operators.textops import concordance

    spark, _owned = _own_spark(cpus)
    try:
        docs = _analyze_docs(spark, in_path, id_col, text_col)
        try:
            out = concordance(docs, term, context=context)
        except ValueError as err:
            raise click.UsageError(str(err)) from None
        rows = out.orderBy("doc_id", "pos").limit(limit_n).collect()
        _emit_json_rows(rows, ("doc_id", "pos", "left", "match", "right"))
    finally:
        if _owned:
            spark.stop()
