"""Mergeable cardinality/frequency sketches: HyperLogLog registers and
count-min, as plain DataFrames of integers.

Why sketch tables (and not ``approx_count_distinct``) for a crawl that
never stops: the built-in HLL aggregate answers one query over one
scan — its state dies with the job.  A 100 TB crawl needs the
*registers themselves* as a persisted, mergeable table:

- **per-epoch delta discipline** — epoch N sketches only its delta and
  merges into the stored registers (``max`` per bucket) / counters
  (``sum`` per cell): O(delta) per epoch, the same fix-class as the
  incremental bloom and the MinHash band index;
- **bounded state** — |keys| x 2^p register rows / depth x width
  counter cells, regardless of corpus size; the 100 TB question
  ("distinct URLs per host, ever" / "how hot is this host") reduces to
  an aggregate-sized table;
- **exact integers end to end** — bucket, rho, and the estimator are
  BIGINT/DECIMAL expressions (rho via binary-string length, never a
  float log2; the HLL estimate via one integer floor-division with an
  alpha_ppm literal), so any partitioning and DuckDB produce
  bit-identical outputs.  The classic small-range linear-counting
  correction needs ln() — IEEE last-ulp differs across engines — so
  ``hll_estimate`` emits the exact ingredients (``v_zero``, ``s``)
  alongside the raw estimate and leaves the correction to the caller
  (``hll_corrected`` provides it, documented as float-bearing).

Hash granularity is 40 bits (first 10 hex digits of md5), matching
``sampling.priority_hash_col``: small enough that every intermediate
stays in BIGINT, large enough that collision effects sit far below the
sketches' own error bounds (HLL sigma ~ 1.04/sqrt(m); CMS epsilon ~
e/width).

Reference parity note: the reference scraper has no sketch surface;
training-data / crawl-ops layer (SURVEY.md §6).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: 40-bit hash space (first 10 hex digits of md5) — DuckDB twin:
#: ``('0x' || substr(md5(x), 1, 10))::BIGINT``.
SKETCH_HASH_BITS = 40

DEFAULT_HLL_P = 12
CMS_DEPTH = 4


def _hash40(col: Column) -> Column:
    return F.conv(F.substring(F.md5(col), 1, 10), 16, 10).cast("long")


def hll_alpha_ppm(p: int) -> int:
    """HLL bias constant for m = 2^p buckets, frozen to ppm so both
    engines use the same integer literal (Flajolet et al. 2007)."""
    m = 1 << p
    if m >= 128:
        alpha = 0.7213 / (1 + 1.079 / m)
    elif m == 64:
        alpha = 0.709
    elif m == 32:
        alpha = 0.697
    else:
        alpha = 0.673
    return round(alpha * 1_000_000)


def hll_registers(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    p: int = DEFAULT_HLL_P,
) -> DataFrame:
    """Per-key HLL registers: ``key_cols... , bucket, r``.

    bucket = top p bits of the 40-bit md5 of the value; r = position of
    the first set bit in the remaining (40-p)-bit suffix (1-based, so
    r in [1, 41-p]; an all-zero suffix takes the max).  rho comes from
    the length of the suffix's binary-string form — an exact integer in
    both engines, never a float log2.

    One hash-aggregate with map-side combine; output is at most
    |keys| x 2^p rows however big ``df`` is.  Merge epochs/shards with
    :func:`hll_merge` (max per bucket — associative, idempotent).
    """
    if not 4 <= p <= 18:
        raise ValueError("p must be in [4, 18]")
    suffix_bits = SKETCH_HASH_BITS - p
    h = _hash40(F.col(value_col).cast("string"))
    bucket = F.shiftright(h, suffix_bits).cast("long")
    suffix = h % (1 << suffix_bits)
    rho = F.when(suffix == 0, F.lit(suffix_bits + 1)).otherwise(
        suffix_bits - F.length(F.conv(suffix.cast("string"), 10, 2)) + 1
    )
    return (
        # NULL values carry no distinct-count information, but without
        # the filter md5(NULL) lands as a (key, bucket=NULL, r=NULL)
        # row that hll_estimate counts in `present` while contributing
        # nothing to the harmonic sum — deflating S and biasing the
        # estimate high (and nulling it for all-NULL keys)
        df.filter(F.col(value_col).isNotNull())
        .select(
            *key_cols,
            bucket.alias("bucket"),
            rho.cast("int").alias("rho"),
        )
        .groupBy(*key_cols, "bucket")
        .agg(F.max("rho").alias("r"))
    )


def hll_merge(a: DataFrame, b: DataFrame, key_cols: list[str]) -> DataFrame:
    """Union two register tables of identical (p, key) geometry: max
    per (key, bucket). The cross-epoch / cross-shard combine."""
    return (
        a.unionByName(b)
        .groupBy(*key_cols, "bucket")
        .agg(F.max("r").alias("r"))
    )


def hll_estimate(
    registers: DataFrame, key_cols: list[str], p: int = DEFAULT_HLL_P
) -> DataFrame:
    """Raw HLL estimate per key, exactly:

    est = alpha_ppm * m^2 * 2^K  DIV  (1e6 * S),
    S = (m - present) * 2^K + sum(2^(K - r)),  K = 41 - p (max rho).

    S is the harmonic-mean denominator scaled by 2^K — an exact BIGINT
    (every term 2^(K-r) >= 1 is integral). The single floor-division
    runs in DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) and lands back in
    BIGINT. Emits the correction ingredients too: ``present`` buckets,
    ``v_zero`` empty buckets, and ``s`` itself.
    """
    m = 1 << p
    k_max = SKETCH_HASH_BITS - p + 1
    alpha = hll_alpha_ppm(p)
    two_k = 1 << k_max
    agg = registers.groupBy(*key_cols).agg(
        F.count("*").alias("present"),
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {k_max} - r)")
        ).alias("_s_present"),
    )
    return agg.select(
        *key_cols,
        "present",
        (F.lit(m) - F.col("present")).cast("long").alias("v_zero"),
        (
            (F.lit(m).cast("long") - F.col("present")) * F.lit(two_k)
            + F.col("_s_present")
        ).alias("s"),
    ).withColumn(
        "est",
        F.expr(
            f"CAST(CAST({alpha} AS DECIMAL(38,0)) * {m} * {m} * {two_k} "
            f"DIV (1000000 * s) AS BIGINT)"
        ),
    )


def hll_corrected(est_df: DataFrame, p: int = DEFAULT_HLL_P) -> DataFrame:
    """Apply the standard small-range correction: when est <= 2.5m and
    empty buckets exist, linear counting m * ln(m / v_zero).

    Float-bearing (ln) — fine for operational use, excluded from the
    cross-engine oracle on purpose.
    """
    m = 1 << p
    lc = (F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("v_zero"))).cast(
        "long"
    )
    return est_df.withColumn(
        "est_corrected",
        F.when(
            (F.col("est") <= int(2.5 * m)) & (F.col("v_zero") > 0), lc
        ).otherwise(F.col("est")),
    )


# ---------------------------------------------------------------------------
# count-min sketch
# ---------------------------------------------------------------------------


def _cms_col(key: Column, d: Column, width: int) -> Column:
    """Row-d hash cell for a key: 40-bit md5 of 'd:key' mod width."""
    return (
        _hash40(F.concat(d.cast("string"), F.lit(":"), key.cast("string")))
        % width
    ).cast("long")


def cms_build(
    df: DataFrame,
    key_col: str,
    width: int,
    depth: int = CMS_DEPTH,
    weight_col: str | None = None,
) -> DataFrame:
    """Count-min sketch of a key stream: ``(d, cell, cnt)`` — depth x
    width counter cells (Cormode & Muthukrishnan 2005).

    Each row lands in one cell per depth; the aggregate map-side
    combines, so the shuffle carries at most depth x width cells per
    task however large the stream. Cells are additive: merge epochs
    with :func:`cms_merge` (sum). ``weight_col`` counts weighted items
    (e.g. bytes per host) instead of rows.
    """
    if depth < 1 or width < 1:
        raise ValueError("depth and width must be positive")
    d = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("d")
    w = (
        F.col(weight_col).cast("long")
        if weight_col
        else F.lit(1).cast("long")
    )
    return (
        df.select(F.col(key_col).alias("_k"), w.alias("_w"))
        .select("_k", "_w", d)
        .select("d", _cms_col(F.col("_k"), F.col("d"), width).alias("cell"), "_w")
        .groupBy("d", "cell")
        .agg(F.sum("_w").alias("cnt"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Sum two sketches of identical (depth, width) geometry."""
    return a.unionByName(b).groupBy("d", "cell").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame, keys: DataFrame, key_col: str, width: int,
    depth: int = CMS_DEPTH,
) -> DataFrame:
    """Point estimates for ``keys``: min over depths of the key's cell
    counts (>= true count always; overestimate bounded by e/width x
    total mass w.p. 1 - e^-depth).

    The sketch is depth x width rows — broadcast it; the keys side
    explodes to depth rows per key, joins, and min-aggregates back.
    """
    d = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("d")
    probes = keys.select(F.col(key_col)).distinct().select(
        key_col, d
    ).select(
        key_col, "d", _cms_col(F.col(key_col), F.col("d"), width).alias("cell")
    )
    joined = probes.join(F.broadcast(sketch), ["d", "cell"], "left")
    return joined.groupBy(key_col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est")
    )


def heavy_hitters(
    df: DataFrame,
    key_col: str,
    phi_ppm: int,
    width: int,
    depth: int = CMS_DEPTH,
) -> DataFrame:
    """EXACT φ-heavy hitters by sketch-then-verify — every key whose
    true count ≥ φ·N, with its exact count, found WITHOUT ever
    shuffling the full (key, count) table.

    The two-pass scheme rides the count-min guarantee: CMS never
    under-counts, so "estimate ≥ threshold" is a PROVABLY COMPLETE
    candidate gate (a true heavy hitter cannot slip below it; over-
    counts only admit extra candidates, and the exact second pass
    discards those). That makes the output independent of sketch
    geometry — the oracle is a plain ``GROUP BY … HAVING``.

    Plan shape at 10^10 rows: pass 1 is ``cms_build`` (shuffle carries
    ≤ depth×width cells per task); N comes from the sketch itself
    (``sum(cnt)`` at d=0 — every row lands exactly once per depth, so
    no extra count job). Pass 2 tags each STREAM row with its estimate
    via ``depth`` BROADCAST joins against the tiny per-depth cell
    tables (no shuffle, no per-key distinct), filters to candidate
    rows, and only THEN aggregates — the one keyed exchange carries
    candidate mass only (≤ 1/φ keys + the CMS false positives, each
    with ≥ φ·N rows... bounded by construction), never the key space.

    Returns (key, n, est, threshold, share_ppm): ``n`` exact,
    ``est ≥ n`` always, ``share_ppm`` exact integer floor.
    """
    if not (0 < phi_ppm <= 1_000_000):
        raise ValueError("phi_ppm must be in (0, 1e6]")
    # tiny (≤ depth×width rows); materialize once — three consumers
    sketch = cms_build(df, key_col, width, depth).localCheckpoint(
        eager=True
    )
    total_row = (
        sketch.filter(F.col("d") == 0).agg(F.sum("cnt").alias("n")).collect()
    )
    total = int(total_row[0]["n"] or 0)
    threshold = max(1, (phi_ppm * total) // 1_000_000)
    cur = df.select(F.col(key_col))
    ests = []
    for i in range(depth):
        sk_i = sketch.filter(F.col("d") == i).select(
            F.col("cell").alias(f"_c{i}"), F.col("cnt").alias(f"_n{i}")
        )
        cur = cur.withColumn(
            f"_c{i}", _cms_col(F.col(key_col), F.lit(i), width)
        ).join(F.broadcast(sk_i), f"_c{i}", "left")
        ests.append(F.coalesce(F.col(f"_n{i}"), F.lit(0)))
    est = F.least(*ests) if depth > 1 else ests[0]
    cands = cur.withColumn("_est", est.cast("long")).filter(
        F.col("_est") >= threshold
    )
    out = (
        cands.groupBy(key_col)
        .agg(
            F.count("*").cast("long").alias("n"),
            F.min("_est").alias("est"),
        )
        .filter(F.col("n") >= threshold)
    )
    return out.select(
        key_col,
        "n",
        "est",
        F.lit(threshold).cast("long").alias("threshold"),
        F.expr(
            f"cast(n as decimal(38,0)) * 1000000 div {max(total, 1)}"
        ).cast("long").alias("share_ppm"),
    )
