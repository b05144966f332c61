"""Similarity search over embedding columns (task brief: brute-force
cosine top-k baseline + an IVF-bucketed scale path).

- ``cosine_topk``: exact baseline — queries × corpus join with a
  per-query rank window. Correct at any scale but O(|Q|·|C|); used as
  the recall oracle and for small query sets (broadcast the queries, so
  the corpus is scanned once with no shuffle of the big side).
- ``ivf_topk``: the scale path — k-means-style coarse centroids (here
  seeded from the data's block labels, Lloyd-refined), queries probe
  the ``n_probe`` nearest cells, candidates come from an equality join
  on cell id. At 100 TB the corpus is partitioned by cell; a query
  touches n_probe/n_cells of the data instead of all of it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import cosine_col
from .partitioning import fan_out


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query by cosine similarity.

    Output: (query_id, rank, vec_id, cos). Ties break on corpus id so
    results are totally ordered and oracle-comparable.
    """
    q = queries.select(
        F.col(query_id), F.col(vec_col).alias("_qvec")
    )
    c = fan_out(corpus).select(F.col(corpus_id), F.col(vec_col).alias("_cvec"))
    scored = c.join(F.broadcast(q)).select(
        query_id,
        corpus_id,
        cosine_col(F.col("_qvec"), F.col("_cvec")).alias("cos"),
    )
    win = Window.partitionBy(query_id).orderBy(F.desc("cos"), F.asc(corpus_id))
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
        .select(query_id, "rank", corpus_id, F.round("cos", 6).alias("cos"))
    )


def train_centroids(
    corpus: DataFrame,
    vec_col: str = "embedding",
    seed_col: str = "label",
    iterations: int = 2,
) -> DataFrame:
    """IVF coarse quantizer: centroids seeded by averaging per
    ``seed_col`` cell, then Lloyd-refined ``iterations`` times. All
    native aggregates (posexplode → mean per position → collect back),
    deterministic — no RNG.

    Returns (cell_id, centroid array<double>).
    """
    def mean_vectors(df: DataFrame, group_col: str) -> DataFrame:
        pos = df.select(
            F.col(group_col).alias("cell_id"),
            F.posexplode(vec_col).alias("pos", "val"),
        )
        return (
            pos.groupBy("cell_id", "pos")
            .agg(F.avg(F.col("val").cast("double")).alias("mean"))
            .groupBy("cell_id")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "mean"))).alias("pm"))
            .select(
                "cell_id",
                F.transform("pm", lambda s: s["mean"]).alias("centroid"),
            )
        )

    centroids = mean_vectors(
        corpus.select(F.col(seed_col), F.col(vec_col)), seed_col
    )
    for _ in range(iterations):
        assigned = assign_cells(corpus, centroids, vec_col=vec_col, n_probe=1).select(
            F.col("cell_id").alias("assigned_cell"), vec_col
        )
        centroids = mean_vectors(
            assigned.select(F.col("assigned_cell"), F.col(vec_col)), "assigned_cell"
        )
    return centroids


def _collect_centroid_matrix(centroids: DataFrame) -> tuple:
    """Collect the (tiny relative to the corpus) centroid table into
    ``(cell_ids, matrix, cell_id_type)`` — ids sorted ascending, the
    matrix a C×D float64 numpy array aligned with the id order. This
    is the ONE driver-side materialization of the quantizer; it is
    what gets sparkContext-broadcast to executors (torrent-distributed
    once per job, never serialized into the query plan)."""
    import numpy as np

    id_type = centroids.schema["cell_id"].dataType
    rows = sorted(centroids.collect(), key=lambda r: r["cell_id"])
    if not rows:
        raise ValueError("centroids table is empty")
    dims = {len(r["centroid"]) for r in rows}
    if len(dims) != 1:
        raise ValueError("centroid vectors have mixed dimensions")
    cell_ids = [r["cell_id"] for r in rows]
    mat = np.asarray(
        [list(r["centroid"]) for r in rows], dtype=np.float64
    )
    return cell_ids, mat, id_type


def assign_cells(
    vectors: DataFrame,
    centroids,
    vec_col: str = "embedding",
    n_probe: int = 1,
) -> DataFrame:
    """Attach the n_probe nearest centroid cell_ids to each vector row.

    Scale path: the centroid matrix is ``sparkContext.broadcast`` as a
    numpy C×D array and each Arrow batch computes one vectorized
    ``V @ Mᵀ`` argmax inside ``mapInPandas`` — a narrow map stage. No
    join, no window, no Exchange: the corpus side never shuffles, the
    N×C candidate space never materializes, and (unlike the previous
    literal-embedded form) the PLAN stays O(1) in C — at real IVF cell
    counts (10⁴–10⁵ cells × 100+ dims) per-centroid literals would be
    millions of Catalyst expression nodes and the plan compile, not
    the data, becomes the bottleneck.

    Semantics (unchanged): top ``n_probe`` cells by cosine descending,
    exact ties break on cell_id ascending (columns are laid out in
    ascending cell_id order, so a stable argsort on -cos IS the
    tie-break); NULL / zero / dimension-mismatched vectors score -2
    against every centroid and deterministically land in the lowest
    cell_ids. ``centroids`` is the (cell_id, centroid) DataFrame or a
    precollected :func:`_collect_centroid_matrix` triple (so callers
    assigning both corpus and queries collect the quantizer once).
    """
    import numpy as np
    from pyspark.sql.types import StructField, StructType

    if n_probe < 1:
        raise ValueError("n_probe must be >= 1")
    if isinstance(centroids, tuple):
        cell_ids, mat, id_type = centroids
    else:
        cell_ids, mat, id_type = _collect_centroid_matrix(centroids)
    k = min(int(n_probe), len(cell_ids))
    base = fan_out(vectors)
    out_schema = StructType(
        list(base.schema.fields) + [StructField("cell_id", id_type, True)]
    )
    bc = vectors.sparkSession.sparkContext.broadcast(
        (list(cell_ids), mat)
    )

    def _assign(batches):
        ids, m = bc.value
        ids_arr = np.asarray(ids)
        d = m.shape[1]
        m_norm = np.sqrt((m * m).sum(axis=1))
        for pdf in batches:
            vecs = pdf[vec_col].tolist()
            v = np.zeros((len(vecs), d), dtype=np.float64)
            ok = np.zeros(len(vecs), dtype=bool)
            for i, row in enumerate(vecs):
                if row is not None and len(row) == d:
                    v[i] = row
                    ok[i] = True
            dots = v @ m.T
            v_norm = np.sqrt((v * v).sum(axis=1))
            denom = v_norm[:, None] * m_norm[None, :]
            safe = (denom > 0) & ok[:, None]
            cos = np.where(safe, dots / np.where(denom > 0, denom, 1.0), -2.0)
            order = np.argsort(-cos, axis=1, kind="stable")[:, :k]
            rep = pdf.loc[pdf.index.repeat(k)].reset_index(drop=True)
            rep["cell_id"] = ids_arr[order].ravel()
            yield rep

    return base.mapInPandas(_assign, schema=out_schema)


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    n_probe: int = 2,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    seed_col: str = "label",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """Approximate top-k: probe the n_probe nearest IVF cells, exact
    cosine within candidates. Same output shape as cosine_topk."""
    if centroids is None:
        centroids = train_centroids(corpus, vec_col=vec_col, seed_col=seed_col)
    # collect the quantizer ONCE (collecting a lazy plan twice would
    # re-run the whole Lloyd training job for each assignment call)
    cents = _collect_centroid_matrix(centroids)
    corpus_cells = assign_cells(
        corpus.select(corpus_id, vec_col), cents, vec_col, n_probe=1
    )
    query_cells = assign_cells(
        queries.select(query_id, vec_col), cents, vec_col, n_probe=n_probe
    ).select(query_id, F.col(vec_col).alias("_qvec"), "cell_id")
    # dedup candidate ids BEFORE the cosine so multi-probe duplicates
    # never pay the O(dim) fold twice (duplicate rows carry identical
    # vectors, so keeping an arbitrary survivor is exact)
    cand = (
        corpus_cells.join(query_cells, "cell_id")
        .select(query_id, corpus_id, "_qvec", vec_col)
        .dropDuplicates([query_id, corpus_id])
        .select(
            query_id,
            corpus_id,
            cosine_col(F.col("_qvec"), F.col(vec_col)).alias("cos"),
        )
    )
    win = Window.partitionBy(query_id).orderBy(F.desc("cos"), F.asc(corpus_id))
    return (
        cand.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
        .select(query_id, "rank", corpus_id, F.round("cos", 6).alias("cos"))
    )


def recall_at_k(approx: DataFrame, exact: DataFrame, query_id: str = "query_id", corpus_id: str = "vec_id") -> float:
    """Fraction of exact top-k neighbors recovered by the approximate
    search (the standard ANN quality metric)."""
    hits = approx.select(query_id, corpus_id).intersect(
        exact.select(query_id, corpus_id)
    )
    total = exact.count()
    return hits.count() / total if total else 1.0


def srp_signs(n_planes: int = 16, dim: int = 16) -> list:
    """Deterministic random-hyperplane sign matrix: ±1 per (plane,
    component) from md5 parity of a fixed salt — reproducible on any
    engine (the DuckDB oracle rebuilds the identical matrix from the
    same md5 calls), no RNG state to ship."""
    import hashlib

    return [
        [
            1
            if hashlib.md5(f"srp:{p}:{i}".encode()).hexdigest()[0] in "02468ace"
            else -1
            for i in range(dim)
        ]
        for p in range(n_planes)
    ]


def srp_bands(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    signs: list,
    band_size: int = 4,
) -> DataFrame:
    """Signed-random-projection LSH banding (Charikar 2002 simhash for
    real vectors): each plane's bit is the SIGN of an exact integer
    dot product — components quantized to 1e-6 fixed point first, so
    the signature is bit-identical under any partitioning/engine (a
    float fold could flip a near-zero bit between summation orders).
    Bits group into ``len(signs)/band_size`` band keys; two vectors
    within a small angle collide on ≥1 band with high probability.

    One Project + one posexplode — zero shuffle; emits
    (id, band_id, band_key)."""
    # explicit double math: float32 components promote exactly, the
    # product is one correctly-rounded IEEE op, and round() is
    # half-away-from-zero on both engines — the SQL twin mirrors every
    # cast (float*int would stay FLOAT on one engine and not the other)
    qv = F.transform(
        F.col(vec_col),
        lambda v: F.round(v.cast("double") * F.lit(1000000.0)).cast("long"),
    )
    staged = df.select(F.col(id_col), qv.alias("_qv"))
    bits = []
    for row in signs:
        sarr = F.array(*[F.lit(x) for x in row])
        dot = F.aggregate(
            F.zip_with(F.col("_qv"), sarr, lambda a, b: a * b),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(dot > 0, F.lit("1")).otherwise(F.lit("0")))
    n_bands = len(signs) // band_size
    bands = F.array(
        *[
            F.concat(*bits[b * band_size:(b + 1) * band_size])
            for b in range(n_bands)
        ]
    )
    return staged.select(
        F.col(id_col), F.posexplode(bands).alias("band_id", "band_key")
    )


def srp_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    n_planes: int = 16,
    band_size: int = 4,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """ANN top-k via SRP-LSH banding — the third similarity path
    (exact ``cosine_topk`` / cell-probed ``ivf_topk`` / this): corpus
    banded once (persist the band table in production — it is the
    index), queries banded the same way, candidates from a band-key
    equality join (never all-pairs), exact cosine only on candidates.
    Recall < 1 by construction; measure with ``recall_at_k`` against
    ``cosine_topk``.

    Scale shape: the corpus band table is 4 short rows per vector —
    join-bucketable by band_key; a hot band (near-duplicate pile-up)
    is exactly a near-dup cluster and bounded by upstream dedup.
    """
    if dim is None:
        dim = len(corpus.select(vec_col).head()[0])
    signs = srp_signs(n_planes, dim)
    qb = srp_bands(queries, query_id, vec_col, signs, band_size)
    cb = srp_bands(corpus, corpus_id, vec_col, signs, band_size)
    cand = (
        qb.join(cb, ["band_id", "band_key"])
        .select(query_id, corpus_id)
        .distinct()
    )
    q = queries.select(F.col(query_id), F.col(vec_col).alias("_qvec"))
    c = corpus.select(F.col(corpus_id), F.col(vec_col).alias("_cvec"))
    scored = cand.join(F.broadcast(q), query_id).join(c, corpus_id).select(
        query_id,
        corpus_id,
        cosine_col(F.col("_qvec"), F.col("_cvec")).alias("cos"),
    )
    win = Window.partitionBy(query_id).orderBy(F.desc("cos"), F.asc(corpus_id))
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
        .select(query_id, "rank", corpus_id, F.round("cos", 6).alias("cos"))
    )


def quantize_embeddings(
    vectors: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 8,
) -> DataFrame:
    """Per-dimension scalar quantization — the memory-scale path for a
    100 TB embedding store: a 64-dim float32 vector (256 B) becomes 64
    uint8 codes (64 B), served from a quarter of the RAM with the
    corpus-wide per-dimension range as the codebook (the classic
    IVF+SQ layout; this is the SQ half, ``ivf_topk`` is the IVF half).

    Two-step, both shuffle-light:

    1. Per-dimension lo/hi over the corpus — ONE map-side-combined
       aggregate over a ``posexplode`` (the partial state is dim-count
       sized, never corpus sized), collected driver-side (64 rows) and
       folded back in as literal arrays — the ``assign_cells``
       broadcast discipline.
    2. ``q[j] = (v[j] - lo[j]) * (2^bits - 1) DIV (hi[j] - lo[j] + 1)``
       as a pure ``transform`` projection.

    Determinism: floats enter through ONE micro-int gate
    (``floor(x * 1e6)`` — floor, not round: identical in Spark, DuckDB
    and Python) and everything after is EXACT integer arithmetic: the
    floor division is ``(n - pmod(n, d)) / d`` — the subtraction makes
    the numerator an exact multiple of ``d`` in long space, so the
    final division is exact — never a rounded double quotient, which
    near an integer boundary can round UP where integer ``//``
    truncates. Exactness needs ``n < 2^53``, so components are gated
    to ``|x| <= ~1.7e7`` (micro-ints within 2^44 — raise_error beyond;
    real embedding components are O(1)). Returns ``(id, qvec)`` with
    codes in ``[0, 2^bits - 1)`` — the ``+1`` on the span that guards
    constant dimensions costs the top code (a constant dimension codes
    to 0).
    """
    levels = (1 << bits) - 1
    gate = 1 << 44  # keeps (v - lo) * levels < 2^53: exact end-to-end

    def micro(x):
        m = F.floor(x.cast("double") * 1_000_000).cast("long")
        return F.when(
            F.abs(m) > gate,
            F.raise_error(
                F.lit(
                    "quantize_embeddings: component outside the "
                    "exact-arithmetic domain (|x| <= ~1.7e7)"
                )
            ).cast("long"),
        ).otherwise(m)

    vm = F.transform(F.col(vec_col), micro)
    base = vectors.select(F.col(id_col), vm.alias("_vm"))
    stats = (
        base.select(F.posexplode("_vm").alias("dim", "v"))
        .groupBy("dim")
        .agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
    )
    rows = sorted(stats.collect(), key=lambda r: r["dim"])
    los = F.array(*[F.lit(int(r["lo"])) for r in rows])
    his = F.array(*[F.lit(int(r["hi"])) for r in rows])

    def code(v, i):
        n = (v - F.element_at(los, i + 1)) * levels
        d = F.element_at(his, i + 1) - F.element_at(los, i + 1) + 1
        return ((n - F.pmod(n, d)) / d).cast("long").cast("int")

    return base.select(id_col, F.transform(F.col("_vm"), code).alias("qvec"))


def sq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    qvec_col: str = "qvec",
) -> DataFrame:
    """Exact top-k by symmetric quantized dot product — the search
    half of :func:`quantize_embeddings`: both sides carry int8 codes,
    the score is a pure-integer dot product, so scan bandwidth drops
    4x vs float32 and NO float ever enters the ranking (ties and
    ordering are engine-exact, not epsilon-exact).

    Output: (query_id, rank, corpus_id, score) with ties broken on the
    corpus id. Same plan shape as ``cosine_topk`` — queries broadcast,
    corpus scanned once, per-query rank window over the scored rows —
    so the 100 TB side never shuffles; only the top-k survive to the
    window. Recall vs exact float cosine is bounded by quantization
    error (asserted in tests), which is the SQ trade: cheaper scans,
    re-rank the short list with floats if exactness matters.
    """
    q = queries.select(F.col(query_id), F.col(qvec_col).alias("_q"))
    c = fan_out(corpus).select(F.col(corpus_id), F.col(qvec_col).alias("_c"))
    dot = F.aggregate(
        F.zip_with(
            F.col("_q"), F.col("_c"), lambda a, b: a.cast("long") * b
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = c.join(F.broadcast(q)).select(
        query_id, corpus_id, dot.alias("score")
    )
    win = Window.partitionBy(query_id).orderBy(
        F.desc("score"), F.asc(corpus_id)
    )
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
        .select(query_id, "rank", corpus_id, "score")
    )


def kcenter_select(
    vectors: DataFrame,
    k: int,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    checkpoint_every: int = 4,
) -> DataFrame:
    """Greedy k-center / farthest-point selection (Gonzalez 1985) —
    the DIVERSITY complement to the dedup family: near-dup operators
    remove what is too close; this PICKS a maximally-spread subset
    (coreset seeds, eval-set carving, "cover the embedding space with
    k exemplars" — the 2-approximation of the k-center objective).

    Round 1 seeds with the min-id vector (deterministic, no RNG);
    each later round picks the point FARTHEST from the chosen set
    (max min-distance, ties to min id) — the classic greedy whose
    cover radius is within 2x of optimal.

    Determinism: components pass the ``floor(x·1e6)`` micro-int gate
    once, distances are exact-integer squared L2 (sum over dims of
    (a−b)², long arithmetic) — selection and assignment are pure
    functions of the vector set, bit-identical under any partitioning
    or engine, so the DuckDB oracle unrolls the rounds relationally.

    Returns the per-point ASSIGNMENT: (vec_id, center_id,
    center_rank, dist_u) — nearest chosen center (ties: lower
    center_rank), dist_u the exact squared distance in micro² units.
    Centers assign to themselves at dist 0.

    Scale shape: each round is one narrow projection (``least`` of the
    carried min-distance and the distance to the NEWEST center — a
    zip_with/aggregate fold against a broadcast literal, no join, no
    shuffle) plus one TakeOrdered argmax (per-partition heaps, one row
    to the driver). k rounds = k scans, the O(nk) greedy — with
    lineage truncated every ``checkpoint_every`` rounds so the plan
    never deepens past a constant. The final assignment is a single
    projection against all k centers as literals. Only ids and
    distances ever cross an exchange boundary.
    """
    if k <= 0:
        raise ValueError("k must be positive")
    micro = lambda x: F.floor(x.cast("double") * 1_000_000).cast("long")  # noqa: E731
    base = vectors.select(
        F.col(id_col).cast("long").alias("vec_id"),
        F.transform(F.col(vec_col), micro).alias("v"),
    )

    def sqdist_to(vec):
        lit = F.array(*[F.lit(int(c)).cast("long") for c in vec])
        return F.aggregate(
            F.zip_with(F.col("v"), lit, lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    seed_rows = base.orderBy(F.asc("vec_id")).limit(1).collect()
    schema = (
        "vec_id long, center_id long, center_rank long, dist_u long"
    )
    if not seed_rows:
        return vectors.sparkSession.createDataFrame([], schema)
    seed = seed_rows[0]
    chosen = [(int(seed["vec_id"]), list(seed["v"]))]
    cur = base.withColumn("min_d", sqdist_to(seed["v"]))
    for rnd in range(1, k):
        if checkpoint_every and rnd % checkpoint_every == 0:
            cur = cur.localCheckpoint(eager=True)
        ids = [c[0] for c in chosen]
        nxt = (
            cur.filter(~F.col("vec_id").isin(ids))
            .orderBy(F.desc("min_d"), F.asc("vec_id"))
            .limit(1)
            .collect()
        )
        if not nxt:
            break  # fewer distinct points than k
        r = nxt[0]
        chosen.append((int(r["vec_id"]), list(r["v"])))
        cur = cur.withColumn(
            "min_d", F.least(F.col("min_d"), sqdist_to(r["v"]))
        )
    cands = F.array(
        *[
            F.struct(
                sqdist_to(vec).alias("dist_u"),
                F.lit(rank).cast("long").alias("center_rank"),
                F.lit(cid).cast("long").alias("center_id"),
            )
            for rank, (cid, vec) in enumerate(chosen, start=1)
        ]
    )
    best = F.array_sort(cands).getItem(0)
    return base.select(
        "vec_id",
        best["center_id"].alias("center_id"),
        best["center_rank"].alias("center_rank"),
        best["dist_u"].alias("dist_u"),
    )
