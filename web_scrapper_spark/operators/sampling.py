"""Deterministic corpus sampling and domain mixing: pick a reproducible
subset of a 100 TB corpus with per-stratum quotas (the Pile/Dolma-style
"mixing weights" step) without ever using a random number generator.

Two primitives, both keyed on md5 of the document id so any two runs —
any partitioning, any cluster size — select the same rows:

- ``hash_fraction_sample`` — keep a row iff its 60-bit md5 value falls
  under ``fraction`` of the hash space.  Pure per-row filter: zero
  shuffle, the scale path when an approximate per-stratum rate is
  enough (law of large numbers makes realized rates exact to ~1/sqrt(n)).
- ``stratified_sample`` — EXACT per-stratum quotas: rank rows inside
  each stratum by (md5, id) and keep ``rank <= quota``.  One Exchange
  on the stratum key + a per-stratum sort.  For skewed strata at 10^10
  rows, ``prefilter_margin`` first applies the zero-shuffle hash
  filter at ``margin × quota/stratum_count`` to bound the sorted data
  (the exact rank then runs over the surviving sliver), so the window
  never sorts a full hot stratum — same selected set as long as the
  margin keeps >= quota survivors (asserted at runtime by comparing
  counts; quotas larger than the stratum keep the whole stratum).

``domain_mix`` turns fractional mixing weights over a stratum column
into integer quotas (largest-remainder rounding so quotas sum exactly
to ``total``) and delegates to ``stratified_sample``.

Reference parity note: no sampling surface exists in the reference
scraper; training-data layer (SURVEY.md §6).
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .partitioning import fan_out

#: 60 bits of md5 — shared with DuckDB oracles via
#: ``('0x' || substr(md5(x), 1, 15))::BIGINT``.
HASH_SPACE = 1 << 60


def sample_hash_col(id_col: Column) -> Column:
    """Deterministic uniform 60-bit hash of the id's decimal string."""
    return F.conv(
        F.substring(F.md5(id_col.cast("string")), 1, 15), 16, 10
    ).cast("long")


def hash_fraction_sample(
    df: DataFrame, fraction: float, id_col: str = "doc_id"
) -> DataFrame:
    """Zero-shuffle deterministic ~``fraction`` sample: keep rows whose
    hash < fraction × 2^60. Scale path for approximate rates."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    bound = int(fraction * HASH_SPACE)
    return fan_out(df).filter(sample_hash_col(F.col(id_col)) < F.lit(bound))


def _quotas_from_weights(weights: Mapping[str, float], total: int) -> dict[str, int]:
    """Largest-remainder (Hamilton) rounding: integer quotas summing to
    exactly ``total``, ties broken by stratum name for determinism."""
    wsum = float(sum(weights.values()))
    if wsum <= 0:
        raise ValueError("weights must sum to a positive value")
    raw = {k: total * (w / wsum) for k, w in weights.items()}
    base = {k: int(v) for k, v in raw.items()}
    left = total - sum(base.values())
    order = sorted(raw, key=lambda k: (-(raw[k] - base[k]), k))
    for k in order[:left]:
        base[k] += 1
    return base


def stratified_sample(
    df: DataFrame,
    quotas: Mapping[str, int],
    stratum_col: str = "source",
    id_col: str = "doc_id",
    prefilter_margin: float | None = None,
    stratum_counts: Mapping[str, int] | None = None,
) -> DataFrame:
    """Exact deterministic quota sample: within each stratum keep the
    ``quota`` rows with the smallest (md5, id) keys. Strata absent
    from ``quotas`` are dropped; quotas >= stratum size keep the whole
    stratum.

    ``prefilter_margin`` (with ``stratum_counts``, e.g. from a prior
    cheap ``groupBy().count()``): apply the zero-shuffle hash filter
    at rate ``margin × quota / count`` per stratum before ranking, so
    the window sorts O(margin × quota) rows instead of the full
    stratum — the skew-safe shape for hot domains at 10^10 rows.
    Selected set is identical whenever the margin keeps >= quota rows
    (a margin >= 1 guarantees this in expectation; use >= 1.5 in
    production and fall back to the exact path on shortfall).
    """
    if not quotas:
        raise ValueError("quotas must be non-empty")
    qpairs = F.create_map(
        *[x for k, q in sorted(quotas.items()) for x in (F.lit(k), F.lit(int(q)))]
    )
    staged = fan_out(df).withColumn(
        "_h", sample_hash_col(F.col(id_col))
    ).withColumn("_q", qpairs[F.col(stratum_col)]).filter(F.col("_q").isNotNull())

    if prefilter_margin is not None:
        if stratum_counts is None:
            raise ValueError("prefilter_margin requires stratum_counts")
        bounds = {
            k: min(
                HASH_SPACE,
                int(
                    prefilter_margin
                    * quotas.get(k, 0)
                    / max(1, stratum_counts.get(k, 1))
                    * HASH_SPACE
                ),
            )
            for k in quotas
        }
        bmap = F.create_map(
            *[x for k, b in sorted(bounds.items()) for x in (F.lit(k), F.lit(b))]
        )
        pre = staged.filter(F.col("_h") < bmap[F.col(stratum_col)])
        # the documented shortfall check: a stratum whose prefilter
        # kept fewer than min(quota, stratum size) rows would silently
        # under-fill its quota — those strata fall back to the exact
        # (unfiltered) path. One count aggregate over the surviving
        # sliver; strata are domain-grain, so the collect is tiny.
        survivors = {
            r["_k"]: r["_n"]
            for r in pre.groupBy(F.col(stratum_col).alias("_k"))
            .agg(F.count("*").alias("_n"))
            .collect()
        }
        short = [
            k
            for k in quotas
            if survivors.get(k, 0)
            < min(int(quotas[k]), int(stratum_counts.get(k, 0)))
        ]
        if short:
            staged = pre.filter(~F.col(stratum_col).isin(short)).unionByName(
                staged.filter(F.col(stratum_col).isin(short))
            )
        else:
            staged = pre

    # hot-stratum note (round-4 skew audit): with prefilter_margin set
    # (the production path), the window's per-stratum input is already
    # hash-bounded to ~margin x quota rows — a corpus-sized stratum
    # never reaches this sort. The unfiltered path is the small-data /
    # fallback branch and keeps the simple exact rank.
    win = Window.partitionBy(stratum_col).orderBy("_h", id_col)
    return (
        staged.withColumn("_rank", F.row_number().over(win))
        .filter(F.col("_rank") <= F.col("_q"))
        .drop("_h", "_q", "_rank")
    )


def domain_mix(
    df: DataFrame,
    weights: Mapping[str, float],
    total: int,
    stratum_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Select ``total`` rows matching the mixing ``weights`` over
    ``stratum_col`` (exact integer quotas via largest-remainder
    rounding), deterministically."""
    if total < 0:
        raise ValueError("total must be >= 0")
    return stratified_sample(
        df,
        _quotas_from_weights(weights, total),
        stratum_col=stratum_col,
        id_col=id_col,
    )


def token_budget_select(
    docs: DataFrame,
    budget_tokens: int,
    *,
    id_col: str = "doc_id",
    quality_col: str = "quality_ppm",
    tokens_col: str = "n_tokens",
    boundary_exact: bool = True,
) -> DataFrame:
    """Fill a token budget with the best-quality documents.

    The "select 1T tokens" step: order docs by (quality desc, id asc)
    and keep the prefix whose cumulative token count stays within
    ``budget_tokens``. Computed WITHOUT a global sort over the corpus:

    - aggregate tokens per distinct quality value (map-side combined),
      one small window over that histogram finds the BOUNDARY level —
      the highest quality whose full inclusion overflows the budget
    - every doc strictly above the boundary is selected outright (a
      broadcast threshold comparison, scan-shaped)
    - docs AT the boundary level fill the remaining budget in id order
      — a distributed two-phase prefix sum over that single level
      (range-partition by id, per-partition offsets via the driver,
      within-partition running sums), never a global window

    ``boundary_exact=False`` skips the boundary window (selects none
    of the boundary level) for the degenerate corpus where one quality
    value dominates; the undershoot is then bounded by that level's
    token mass. Same exact/inexact pattern as
    ``frontier.fairshare.fair_share_budgets``.

    Returns all input rows plus a ``selected`` flag (so the funnel's
    rejected complement is one filter away)::

      (id, quality_ppm, n_tokens, selected)
    """
    if budget_tokens < 0:
        raise ValueError("budget_tokens must be non-negative")
    # NULL quality sorts as WORST (below every real level, filled
    # last): comparisons on a raw NULL would three-value-NULL the
    # selected flag and silently drop the row from the output, so the
    # internal level column coalesces to a sentinel floor
    _Q_FLOOR = -(1 << 62)
    d = docs.select(
        F.col(id_col),
        F.col(quality_col).cast("long").alias("quality_ppm"),
        F.greatest(F.col(tokens_col).cast("long"), F.lit(0)).alias("n_tokens"),
        F.coalesce(F.col(quality_col).cast("long"), F.lit(_Q_FLOOR)).alias(
            "_q"
        ),
    ).localCheckpoint(eager=True)

    b = F.lit(int(budget_tokens)).cast("long")
    hist = d.groupBy("_q").agg(F.sum("n_tokens").alias("mass"))
    w_above = Window.orderBy(F.desc("_q")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    lev = hist.select(
        "_q",
        "mass",
        F.coalesce(F.sum("mass").over(w_above), F.lit(0)).alias("mass_above"),
    )
    # boundary = the highest level whose FULL inclusion overflows;
    # if nothing overflows the whole corpus fits (virtual boundary
    # below every level, remaining budget irrelevant)
    boundary = (
        lev.filter(F.col("mass_above") + F.col("mass") > b)
        .orderBy(F.desc("_q"))
        .limit(1)
        .select(
            F.col("_q").alias("b_level"),
            (b - F.col("mass_above")).alias("b_remaining"),
        )
    )
    scal = boundary.unionByName(
        d.sparkSession.range(1).select(
            F.lit(None).cast("long").alias("b_level"),
            F.lit(None).cast("long").alias("b_remaining"),
        )
    ).orderBy(F.col("b_level").desc_nulls_last()).limit(1)

    out = d.crossJoin(F.broadcast(scal))
    above = F.col("b_level").isNull() | (F.col("_q") > F.col("b_level"))
    if not boundary_exact:
        return out.select(
            id_col, "quality_ppm", "n_tokens", above.alias("selected")
        )

    # running token sum over the boundary level only, id order — a
    # DISTRIBUTED prefix sum, not a single-partition global window: the
    # boundary level is usually a sliver, but with a coarse quality
    # signal (few distinct levels) it can be a constant fraction of the
    # corpus, and WindowExec with no partition key would funnel all of
    # it through one task. Classic two-phase scan instead:
    #   1. range-partition the level by id (order-preserving across
    #      partitions), freeze the assignment with a localCheckpoint
    #      so both passes see identical partition ids
    #   2. per-partition token totals -> driver (one row per partition)
    #      -> exclusive cumulative offsets, broadcast back
    #   3. running sum WITHIN each partition (+ its offset) — every
    #      partition scans concurrently
    at_boundary = out.filter(F.col("_q") == F.col("b_level"))
    npart = d.sparkSession.sparkContext.defaultParallelism
    ab = (
        at_boundary.repartitionByRange(npart, F.asc(id_col))
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    ptotals = sorted(
        (r["_pid"], r["pmass"])
        for r in ab.groupBy("_pid").agg(F.sum("n_tokens").alias("pmass")).collect()
    )
    offsets, acc = [], 0
    for pid, pmass in ptotals:
        offsets.append((pid, acc))
        acc += pmass
    if offsets:
        off_df = d.sparkSession.createDataFrame(
            offsets, "_pid int, _poff long"
        )
        ab = ab.join(F.broadcast(off_df), "_pid", "left")
    else:
        ab = ab.withColumn("_poff", F.lit(0).cast("long"))
    w_run = (
        Window.partitionBy("_pid")
        .orderBy(F.asc(id_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    bounded = ab.select(
        id_col,
        "quality_ppm",
        "n_tokens",
        (
            F.col("_poff") + F.sum("n_tokens").over(w_run)
            <= F.col("b_remaining")
        ).alias("selected"),
    )
    return (
        out.filter(above | (F.col("_q") != F.col("b_level")))
        .select(id_col, "quality_ppm", "n_tokens", above.alias("selected"))
        .unionByName(bounded)
    )


# ---------------------------------------------------------------------------
# weighted sampling: Duffield–Lund–Thorup priority sampling
# ---------------------------------------------------------------------------

#: 40-bit hash granularity for priorities. Narrower than HASH_SPACE on
#: purpose: with u drawn from 2^40 values and weights <= 2^20, the
#: priority w * 2^40 DIV (h + 1) stays inside BIGINT (max 2^60) in both
#: engines — every comparison is exact integer, never a float pow/log.
PRIORITY_HASH_SPACE = 1 << 40

#: weight ceiling that keeps w * PRIORITY_HASH_SPACE inside BIGINT.
MAX_PRIORITY_WEIGHT = 1 << 20


def priority_hash_col(id_col: Column) -> Column:
    """Deterministic uniform 40-bit hash (first 10 hex digits of md5 of
    the id's decimal string) — DuckDB twin:
    ``('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 10))::BIGINT``."""
    return F.conv(
        F.substring(F.md5(id_col.cast("string")), 1, 10), 16, 10
    ).cast("long")


def priority_sample(
    df: DataFrame,
    k: int,
    weight_col: str = "weight",
    id_col: str = "doc_id",
) -> DataFrame:
    """Weighted sampling without replacement: Duffield–Lund–Thorup
    priority sampling (JACM 2007), determinized.

    Each row draws u = (h + 1) / 2^40 from its id's md5 and gets
    priority q = floor(w * 2^40 / (h + 1)); the sample is the k rows
    with the largest (q, -h, -id) and tau is the (k+1)-th priority.
    ``w_est = max(w, tau)`` is the DLT unbiased estimator for
    subset-sum queries over the sample.

    Why this scheme at 100 TB:

    - **top-k is distributive**: Spark plans the ORDER BY + LIMIT as
      TakeOrderedAndProject — per-partition top-(k+1) heaps merged on
      the driver, never a global sort and never a full shuffle; the
      cross-epoch merge is "union the samples, re-take top-k", so
      per-epoch samples compose without touching history (same
      fix-class as the bloom delta and the incremental MinHash index);
    - **exact integers end to end**: u has 2^40 granularity and weights
      are capped at 2^20, so q = w * 2^40 DIV (h+1) is one BIGINT
      floor-division — bit-identical under any partitioning and
      replayable in DuckDB HUGEINT (`//`) for the oracle; a float
      u^(1/w) key (the A-ES formulation) could flip ranks between
      engines in the last ulp;
    - the only single-partition work is the rank/tau window over the
      k+1 surviving rows — bounded by k, not the corpus.

    Weights must be integers in [1, 2^20] (a quality_ppm-style score);
    the cap is asserted at runtime.

    Returns the selected rows: original columns + ``priority``,
    ``tau`` (0 when the corpus has <= k rows: everything selected,
    estimator exact) and ``w_est``.
    """
    if k <= 0:
        raise ValueError("k must be positive")
    w = F.col(weight_col).cast("long")
    # the range check lives INSIDE the priority expression so Catalyst
    # can never prune it away (a dropped checker column would be).
    scored = fan_out(df).withColumn(
        "_ph", priority_hash_col(F.col(id_col))
    ).withColumn(
        "priority",
        F.expr(
            f"CASE WHEN {weight_col} IS NULL OR {weight_col} < 1 "
            f"OR {weight_col} > {MAX_PRIORITY_WEIGHT} "
            f"THEN CAST(raise_error('priority_sample: {weight_col} "
            f"outside [1, {MAX_PRIORITY_WEIGHT}]') AS BIGINT) "
            f"ELSE CAST({weight_col} AS BIGINT) * {PRIORITY_HASH_SPACE} "
            "DIV (_ph + 1) END"
        ),
    )
    # TakeOrderedAndProject: per-partition heaps, no global sort.
    order = [F.desc("priority"), F.asc("_ph"), F.asc(id_col)]
    top = scored.orderBy(*order).limit(k + 1)
    win = Window.orderBy(*order)  # k+1 rows: bounded single partition
    ranked = (
        top.withColumn("_rank", F.row_number().over(win))
        .withColumn("_n", F.count("*").over(Window.partitionBy()))
        .withColumn("_minq", F.min("priority").over(Window.partitionBy()))
    )
    out = (
        ranked.filter(F.col("_rank") <= k)
        .withColumn(
            "tau",
            F.when(F.col("_n") == k + 1, F.col("_minq")).otherwise(
                F.lit(0).cast("long")
            ),
        )
        .withColumn("w_est", F.greatest(w, F.col("tau")))
    )
    return out.drop("_rank", "_n", "_minq", "_ph")


# ---------------------------------------------------------------------------
# Leakage-safe corpus splits — host-disjoint train/val/test
# ---------------------------------------------------------------------------

#: split buckets live in [0, 1e6) ppm space.
SPLIT_PPM_SPACE = 1_000_000


def split_bucket_col(group_col: Column, salt: str = "split-v1") -> Column:
    """Deterministic ppm bucket of a group key: first 15 hex digits of
    ``md5(salt || '|' || key)`` mod 1e6 — DuckDB twin:
    ``('0x' || substr(md5(salt || '|' || key), 1, 15))::BIGINT % 1000000``."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("|", F.lit(salt), group_col.cast("string"))), 1, 15
            ),
            16,
            10,
        ).cast("long")
        % SPLIT_PPM_SPACE
    )


def host_split(
    df: DataFrame,
    host_col: str = "host",
    val_ppm: int = 5_000,
    test_ppm: int = 5_000,
    salt: str = "split-v1",
) -> DataFrame:
    """Leakage-safe train/val/test assignment at HOST grain.

    Splitting web text by row is wrong at any scale: a site's pages are
    near-duplicates of each other (templates, boilerplate, syndication),
    so row-level splits leak train text into eval. The standard fix is
    to split on the site key — every row of a host lands in the same
    split BY CONSTRUCTION because the assignment is a pure function of
    the host string, never of the row.

    Deterministic, engine-independent, and cheap: one md5 per row, no
    shuffle, no global state — a new crawl epoch's rows join the same
    split their host always had (stable across snapshots, the property
    eval pipelines need). ``salt`` versions the assignment: bumping it
    redraws every host (use when an eval set must be provably disjoint
    from anything seen under the old salt).

    Returns ``df`` plus ``split_bucket_ppm`` (the host's point in
    [0, 1e6)) and ``split`` ∈ {'test', 'val', 'train'}: test takes
    ``[0, test_ppm)``, val ``[test_ppm, test_ppm + val_ppm)``, train
    the rest. Fractions are exact in expectation over the md5's
    uniformity; actual shares vary with host-size skew — measure with
    a groupBy, don't assume (hot hosts move whole ppm at once; that is
    the price of disjointness, not a bug).

    For cross-host duplicate leakage (mirrors, syndication), compose
    with dedup: run ``mirror_hosts`` / ``dedup_components`` first and
    split on the CLUSTER representative's host instead.
    """
    if val_ppm < 0 or test_ppm < 0 or val_ppm + test_ppm > SPLIT_PPM_SPACE:
        raise ValueError("val_ppm/test_ppm must be >= 0 and sum <= 1e6")
    bucket = split_bucket_col(F.col(host_col), salt)
    return df.withColumn("split_bucket_ppm", bucket).withColumn(
        "split",
        F.when(F.col("split_bucket_ppm") < test_ppm, F.lit("test"))
        .when(F.col("split_bucket_ppm") < test_ppm + val_ppm, F.lit("val"))
        .otherwise(F.lit("train")),
    )
