"""Features-ON scaling adjudication (round-5 verdict task 3).

The round-4 sweep priced the combined-feature epoch (index_articles +
meta-robots + content_seen_filter + trap_guard) at every level and
found 8->32 efficiency 0.381 vs the plain leg's 0.555 — but the
"co-tenant memory bus" explanation was INHERITED from the plain leg's
controls rather than demonstrated for this configuration. This script
earns the features-on leg its own adjudication:

1. three INTERLEAVED sweeps of the identical features-on frontier job
   at local[2]/local[8]/local[32] (band, not a point sample), with the
   per-phase wall captured — which phase holds the 8->32 residual;
2. a no-Spark control for the feature-specific CPU work (pure-Python
   tokenization of page bodies across a multiprocessing.Pool at
   2/8/32 procs) — does the added per-page compute hit the same
   memory-bus ceiling the parse control hit;
3. a bare Spark shuffle control (groupBy over 20M rows) in the same
   session — the ceiling of the exchange-bound fraction (the postings
   build and content-dedup body-hash exchange the features add).

Writes BENCH/features_ceiling.json; the md template cites it.

Usage: python scripts/features_ceiling.py  (~25 min)
Env: FC_URLS (default 9000000), FC_REPS (default 3), FC_LEVELS.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (the harness: make_spark, run_frontier_bench)


def tokenize_control(levels, n_docs=240_000, reps=2) -> dict:
    """No-Spark control: the feature set's added per-page CPU work is
    dominated by tokenization (index shard build) and body hashing.
    Pure-Python replica over synthetic bodies via multiprocessing —
    same discipline as the round-3 minisoup parse control."""
    import hashlib
    import multiprocessing as mp

    bodies = [
        ("word%d the quick brown fox jumps over host%d page body "
         "tokens scale test corpus entry %d " % (i % 997, i % 64, i)) * 6
        for i in range(n_docs)
    ]

    out = {}
    for procs in levels:
        best = None
        for _ in range(reps):
            with mp.Pool(procs) as pool:
                t0 = time.time()
                pool.map(_tok_one, bodies, chunksize=max(1, n_docs // (procs * 8)))
                dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        out[procs] = round(best, 3)
    return out


def _tok_one(body: str) -> int:
    import hashlib

    toks = [w for w in re.split(r"[^a-z0-9_]+", body.lower()) if w]
    h = hashlib.md5(body.encode()).digest()
    return len(toks) + h[0]


def shuffle_control(levels, n_rows=20_000_000, reps=2) -> dict:
    """Bare Spark groupBy — the exchange-bound ceiling, same session
    class as the timed legs."""
    from pyspark.sql import functions as F

    out = {}
    for procs in levels:
        spark = bench.make_spark(procs)
        # warmup
        spark.range(0, 1_000_000, 1, procs * 2).groupBy(
            (F.col("id") % 1000).alias("k")
        ).count().write.format("noop").mode("overwrite").save()
        best = None
        for _ in range(reps):
            t0 = time.time()
            spark.range(0, n_rows, 1, procs * 2).groupBy(
                (F.col("id") % 1_000_000).alias("k")
            ).agg(F.sum("id"), F.count("*")).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        spark.stop()
        out[procs] = round(best, 3)
    return out


def main() -> None:
    n_urls = int(os.environ.get("FC_URLS", "9000000"))
    reps = int(os.environ.get("FC_REPS", "3"))
    levels = tuple(
        int(c) for c in os.environ.get("FC_LEVELS", "2,8,32").split(",")
    )

    sweeps: dict = {c: [] for c in levels}
    for rep in range(reps):
        for cpus in levels:
            spark = bench.make_spark(cpus)
            # warmup (JIT/codegen/worker spawn + allocator ramp)
            bench.run_frontier_bench(spark, n_urls=60_000, n_hosts=64,
                                     features_on=True)
            bench.run_frontier_bench(spark, n_urls=1_000_000,
                                     features_on=True)
            r = bench.run_frontier_bench(spark, n_urls=n_urls,
                                         features_on=True)
            spark.stop()
            sweeps[cpus].append(r)
            print(f"rep {rep} local[{cpus}]: {r['urls_per_sec']} URLs/s "
                  f"phases={r['phases']}", flush=True)

    best = {c: max(rs, key=lambda r: r["urls_per_sec"]) for c, rs in sweeps.items()}

    def eff(lo, hi):
        su = best[hi]["urls_per_sec"] / best[lo]["urls_per_sec"]
        return {"speedup": round(su, 3),
                "scaling_efficiency": round(su / (hi / lo), 3)}

    def band(lo, hi):
        es = []
        for a, b in zip(sweeps[lo], sweeps[hi]):
            es.append(round(
                (b["urls_per_sec"] / a["urls_per_sec"]) / (hi / lo), 3))
        return es

    report = {
        "n_urls": n_urls,
        "reps": reps,
        "per_level_best": best,
        "per_level_all": {
            c: [r["urls_per_sec"] for r in rs] for c, rs in sweeps.items()
        },
        "eff_2_to_8": eff(2, 8) if 2 in best and 8 in best else None,
        "eff_8_to_32": eff(8, 32) if 8 in best and 32 in best else None,
        "eff_band_2_to_8": band(2, 8) if 2 in best and 8 in best else None,
        "eff_band_8_to_32": band(8, 32) if 8 in best and 32 in best else None,
        "phase_speedup_8_to_32": {
            k: round(best[8]["phases"].get(k, 0.0) /
                     max(best[32]["phases"].get(k, 1e-9), 1e-9), 2)
            for k in best[8]["phases"]
        } if 8 in best and 32 in best else None,
        "controls": {
            "tokenize_pool_secs": tokenize_control(levels),
            "shuffle_groupby_secs": shuffle_control([8, 32]),
        },
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/features_ceiling.json", "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
