"""Approximate-nearest-neighbor similarity search over embedding columns.

No analogue exists in the reference (it has no vector data); this is part of
the training-data-pipeline surface. Two strategies:

* :func:`cosine_topk` — exact brute force: broadcast the (small) query set,
  score every corpus vector with a columnar ``zip_with`` dot product, take
  top-k per query with a window. Correctness baseline; O(|corpus|·|queries|)
  but embarrassingly parallel and shuffle-light (only the top-k reduction
  shuffles, and partial top-k happens map-side via the window-on-repartition).
* :func:`lsh_topk` — random-hyperplane LSH: each vector gets a ``bits``-bit
  signature (sign of dot with deterministic pseudo-random planes derived from
  xxhash — no driver-side randomness, replay-safe); candidates share a band;
  exact re-scoring only within buckets. The scale path: shuffle is bounded by
  bucket sizes instead of |corpus|.
* :func:`ivf_topk` — inverted-file index: corpus partitioned into coarse
  k-means cells (deterministic seeding + columnar Lloyd iterations), queries
  probe only their ``nprobe`` nearest cells. The other standard ANN scale
  path (FAISS-style IVF-Flat): at 100 TB the cell assignment is a bounded
  broadcast join and search cost drops by ~n_centroids/nprobe.
* :func:`near_dup_pairs` — embedding-cosine near-duplicate detection: all
  pairs above a cosine threshold (the semantic-dedup primitive for training
  corpora).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# numpy/pandas are imported lazily inside the one Arrow-batched kernel that
# needs them (_hyperplane_sig_udf) — the rest of this module is pure pyspark
# expressions and must stay importable without them.

#: largest corpus ``near_dup_pairs(method="brute")`` will cross-join without
#: an explicit ``allow_quadratic=True`` — the all-pairs plan is O(n^2) and a
#: raw call on an unscoped table must fail loudly, not run for a week.
BRUTE_MAX_ROWS = 20_000


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    # try_divide: zero-norm vectors score 0.0 instead of raising under ANSI
    d = l2_norm(a) * l2_norm(b)
    return F.coalesce(F.try_divide(dot(a, b), d), F.lit(0.0))


def cosine_topk(
    corpus: DataFrame, queries: DataFrame,
    id_col: str = "vec_id", vec_col: str = "embedding", k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors per query (query ids excluded from their
    own result). Queries are broadcast — the J1 broadcast-lookup pattern
    (reference loader.py:850-895) applied to vectors."""
    c = corpus.select(F.col(id_col).alias("n_id"),
                      F.col(vec_col).cast("array<double>").alias("n_vec"))
    q = queries.select(F.col(id_col).alias("q_id"),
                       F.col(vec_col).cast("array<double>").alias("q_vec"))
    scored = (c.join(F.broadcast(q), F.col("n_id") != F.col("q_id"))
               .withColumn("cos", cosine(F.col("q_vec"), F.col("n_vec"))))
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id"))
    return (scored.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k)
            .select("q_id", F.col("n_id").alias("neighbor_id"),
                    F.round("cos", 6).alias("cos"), "rk"))


def _assign_cells(df: DataFrame, centroids: DataFrame, id_col: str,
                  vec_col: str, nprobe: int) -> DataFrame:
    """Nearest-``nprobe`` centroid cells per vector (broadcast argmax join)."""
    v = F.col(vec_col).cast("array<double>")
    scored = (df.select(F.col(id_col).alias("_id"), v.alias("_vec"))
              .join(F.broadcast(centroids), how="cross")
              .withColumn("_sim", cosine(F.col("_vec"), F.col("_cvec"))))
    w = Window.partitionBy("_id").orderBy(F.col("_sim").desc(), F.col("_cell"))
    return (scored.withColumn("_crk", F.row_number().over(w))
            .filter(F.col("_crk") <= nprobe)
            .select("_id", "_vec", "_cell"))


def ivf_centroids(
    corpus: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
    n_centroids: int = 16, lloyd_iters: int = 1,
) -> DataFrame:
    """Coarse quantizer for IVF: random-partition init (cell = hash(id) mod C
    — deterministic, no RNG state, no global sort) + ``lloyd_iters`` rounds
    of Lloyd's k-means, fully columnar — assignment is a broadcast argmax
    join and the centroid update averages per (cell, dimension) via
    posexplode. Every step is a distributed aggregation; replayable at any
    scale."""
    v = F.col(vec_col).cast("array<double>")

    def mean_vecs(assigned: DataFrame) -> DataFrame:
        return (assigned
                .select("_cell", F.posexplode("_vec").alias("_pos", "_x"))
                .groupBy("_cell", "_pos").agg(F.avg("_x").alias("_m"))
                .groupBy("_cell")
                .agg(F.array_sort(F.collect_list(F.struct("_pos", "_m")))
                     .alias("_pm"))
                .select("_cell", F.transform(F.col("_pm"), lambda s: s["_m"])
                        .alias("_cvec")))

    cents = mean_vecs(corpus.select(
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_centroids)).cast("int")
        .alias("_cell"), v.alias("_vec")))
    for _ in range(lloyd_iters):
        assigned = _assign_cells(corpus, cents, id_col, vec_col, nprobe=1)
        cents = mean_vecs(assigned)
    return cents


def ivf_topk(
    corpus: DataFrame, queries: DataFrame,
    id_col: str = "vec_id", vec_col: str = "embedding",
    k: int = 5, n_centroids: int = 16, nprobe: int = 4, lloyd_iters: int = 1,
) -> DataFrame:
    """IVF-Flat ANN: exact rescoring restricted to the query's ``nprobe``
    nearest cells. Recall < 1 when a true neighbor lives in an unprobed cell;
    tune n_centroids (cell granularity) and nprobe (recall/cost)."""
    cents = ivf_centroids(corpus, id_col, vec_col, n_centroids, lloyd_iters)
    cb = _assign_cells(corpus, cents, id_col, vec_col, nprobe=1)
    qb = _assign_cells(queries, cents, id_col, vec_col, nprobe=nprobe)
    cand = (cb.withColumnRenamed("_id", "n_id").withColumnRenamed("_vec", "n_vec")
            .join(qb.withColumnRenamed("_id", "q_id")
                    .withColumnRenamed("_vec", "q_vec"), on="_cell")
            .filter(F.col("n_id") != F.col("q_id"))
            .dropDuplicates(["q_id", "n_id"])
            .withColumn("cos", cosine(F.col("q_vec"), F.col("n_vec"))))
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id"))
    return (cand.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k)
            .select("q_id", F.col("n_id").alias("neighbor_id"),
                    F.round("cos", 6).alias("cos"), "rk"))


def near_dup_pairs(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
    threshold: float = 0.95, method: str = "lsh",
    bits: int = 128, bands: int = 8, dim: int | None = None, seed: int = 42,
    allow_quadratic: bool = False,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cos >= threshold)
    — the semantic-dedup primitive.

    ``method="lsh"`` (default, the scale path): block by random-hyperplane
    band buckets, exact-cosine verify only within blocks. Bucket-bounded
    shuffle REQUIRES wide band chunks: with chunk = bits//bands bits per
    band there are 2^chunk buckets per band, so expected candidate volume is
    ≈ bands · n²/2^chunk for uncorrelated vectors — sub-quadratic only when
    2^chunk ≫ bands. chunk=1 (round-2's 16/16 default) degenerates to ~4n²
    candidates, WORSE than the brute cartesian; chunk < 2 is therefore
    rejected with ValueError. Expected recall per pair at cosine c is
    1-(1-p^chunk)^bands with p = 1-acos(c)/π. The defaults (128 bits, 8
    bands, chunk=16) suit production thresholds ≥ 0.95: per-pair recall
    ≈ 0.80 at c=0.95, ≈ 0.994 at c=0.99, and exactly 1 for duplicates at
    c=1 (identical vectors ⇒ identical signatures — deterministic, not
    probabilistic); raise bands for higher recall at the margin. LOW
    thresholds (≲ 0.5) are NOT LSH-friendly: p ≈ 0.61 at
    c=0.35 would need chunk ≥ 8 AND ~900 bands for recall ≈ 1 — for those,
    use ``method="brute"`` on a scoped corpus; the blocked path cannot beat
    all-pairs there.

    ``method="brute"``: the all-pairs comparison — O(n²) but shuffle-free
    (broadcast nested-loop on the smaller projection); the correct plan for
    low thresholds and for small-sf oracle verification.

    ``dim``: pass explicitly at scale — inferring it costs one driver-side
    ``first()`` sync point.

    ``allow_quadratic``: the brute path refuses corpora above
    ``BRUTE_MAX_ROWS`` (the guard costs one ``count()``) unless the caller
    states the O(n^2) cost is intended — the same fail-loud spirit as the
    LSH path's chunk<2 ``ValueError``. Scoped oracle corpora pass
    ``allow_quadratic=True`` and skip the count.
    """
    a = emb.select(F.col(id_col).alias("id_a"),
                   F.col(vec_col).cast("array<double>").alias("va"))
    b = emb.select(F.col(id_col).alias("id_b"),
                   F.col(vec_col).cast("array<double>").alias("vb"))
    if method == "brute":
        if not allow_quadratic:
            n = emb.count()
            if n > BRUTE_MAX_ROWS:
                raise ValueError(
                    f"near_dup_pairs(method='brute') on {n} rows would "
                    f"cross-join ~{n * (n - 1) // 2:,} pairs (guard bound "
                    f"{BRUTE_MAX_ROWS}). Scope the corpus, use "
                    f"method='lsh' at a blockable threshold, or pass "
                    f"allow_quadratic=True if O(n^2) is intended.")
        pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    elif method == "lsh":
        pairs = near_dup_candidates(emb, id_col=id_col, vec_col=vec_col,
                                    bits=bits, bands=bands, dim=dim,
                                    seed=seed)
    else:
        raise ValueError(f"unknown method {method!r}")
    return (pairs
            .withColumn("cos", cosine(F.col("va"), F.col("vb")))
            .filter(F.col("cos") >= threshold)
            .select("id_a", "id_b", F.round("cos", 4).alias("cos_r")))


def near_dup_candidates(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
    bits: int = 128, bands: int = 8, dim: int | None = None, seed: int = 42,
) -> DataFrame:
    """The LSH blocking stage of :func:`near_dup_pairs`, exposed so callers
    (and the bench) can COUNT the pre-verify candidate set directly — the
    sub-quadratic claim (≈ bands · n²/2^chunk candidates, not n²/2) is then
    a measured number, not an asymptotic argument. Returns
    ``(id_a, va, id_b, vb)`` distinct unordered pairs sharing ≥1 band."""
    if dim is None:
        dim = len(emb.select(vec_col).first()[0])
    chunk = bits // bands
    if chunk < 2:
        raise ValueError(
            f"degenerate LSH banding: bits={bits}, bands={bands} gives "
            f"chunk={chunk} (<2 bits/band -> <=2 buckets/band, candidate "
            f"volume ~bands*n^2). Use bits >= 2*bands, e.g. bits=128 "
            f"bands=8, or method='brute' for low thresholds.")
    sig_udf = _hyperplane_sig_udf(emb.sparkSession, bits, dim, seed)
    # NULL / wrong-length vectors are dropped BEFORE the kernel (matching the
    # pre-r3 Catalyst expression's graceful degradation: a null vector never
    # produced a qualifying pair anyway, since its cosine is null->filtered);
    # the kernel itself raises descriptively on anything that slips through.
    valid = emb.filter(F.col(vec_col).isNotNull()
                       & (F.size(vec_col) == dim))
    # the UDF column must be materialized in its own projection: Spark
    # forbids Python UDFs inside higher-order-function lambdas
    sigd = valid.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_vec"),
        sig_udf(F.col(vec_col).cast("array<double>")).alias("_sig"))
    banded = sigd.select(
        "_id", "_vec",
        F.posexplode(F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda bd: F.substring(F.col("_sig"), bd * chunk + 1, chunk),
        )).alias("_band", "_chunk"))
    ba = banded.select(F.col("_id").alias("id_a"),
                       F.col("_vec").alias("va"), "_band", "_chunk")
    bb = banded.select(F.col("_id").alias("id_b"),
                       F.col("_vec").alias("vb"), "_band", "_chunk")
    return (ba.join(bb, on=["_band", "_chunk"])
            .filter(F.col("id_a") < F.col("id_b"))
            .dropDuplicates(["id_a", "id_b"])
            .select("id_a", "va", "id_b", "vb"))


#: plane matrices cached per (bits, dim, seed) for the life of the process —
#: the values are deterministic, so the cache never goes stale.
_PLANES_CACHE: dict[tuple[int, int, int], list] = {}


def _plane_matrix(spark, bits: int, dim: int, seed: int) -> list:
    """The ``bits × dim`` hyperplane matrix: component (b, j) =
    ``pmod(xxhash64(b, j, seed), 1000)/1000 - 0.5`` — centered hash in
    [-0.5, 0.5), deterministic, no RNG state. Evaluated ONCE per process via
    a 1-row Spark job (so the values are Spark's own xxhash64, bit-exact
    with what an in-plan evaluation would produce) and embedded downstream
    as array literals. Building the signature from per-row hash expressions
    instead (the previous form) made the expression tree O(bits·dim) ≈ 50k
    nodes — tens of seconds of Catalyst compile per query — and recomputed
    all bits·dim hashes for every input row; as constants the tree is
    O(bits) and the per-row work is just the dot products."""
    key = (bits, dim, seed)
    if key not in _PLANES_CACHE:
        # ONE sql() round trip — composing the same matrix from pyspark
        # Column objects costs ~6 py4j round trips per component (≈50k for
        # 128×64 ≈ tens of seconds of driver-serial time)
        _PLANES_CACHE[key] = spark.sql(
            f"SELECT transform(sequence(0, {bits - 1}), b -> "
            f"transform(sequence(0, {dim - 1}), j -> "
            f"pmod(xxhash64(b, j, {seed}), 1000) / 1000 - 0.5)) AS p"
        ).first()["p"]
    return _PLANES_CACHE[key]


def _hyperplane_sig_udf(spark, bits: int, dim: int, seed: int):
    """Arrow-vectorized signature kernel: one numpy matmul per batch against
    the constant plane matrix. This is the documented columnar-UDF exception:
    expressing ``bits`` plane dot products as Catalyst HOF expressions makes
    an O(bits·dim) tree (built per component over py4j, folded repeatedly by
    the optimizer, interpreted per element at runtime) — measured at tens of
    seconds of driver-serial compile for 128×64 — while the batch matmul is
    a single BLAS call with a 64 KB closure. Sign rule (``>= 0 → '1'``) and
    plane values match :func:`_plane_matrix` exactly.

    Input contract: every vector non-NULL with exactly ``dim`` components
    (callers pre-filter; see near_dup_candidates / lsh_topk). A ragged or
    NULL element raises a descriptive error instead of an opaque np.stack
    crash. NaN components follow numpy sign semantics (NaN >= 0 is False,
    where a Catalyst comparison would yield true) — internally consistent,
    since both sides of a candidate pair go through this same kernel."""
    import numpy as np
    import pandas as pd

    # pandas_udf resolves the (PEP-563 stringified) `pd.Series` annotations
    # through this module's globals — publish the deferred import there so
    # the annotation lookup works on first use
    globals()["pd"], globals()["np"] = pd, np

    planes_t = np.array(_plane_matrix(spark, bits, dim, seed),
                        dtype="float64").T  # dim × bits

    @F.pandas_udf("string")
    def sig(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype="object")
        bad = [i for i, x in enumerate(v) if x is None or len(x) != dim]
        if bad:
            x = v.iloc[bad[0]]
            raise ValueError(
                f"hyperplane signature kernel: vector at batch offset "
                f"{bad[0]} is {'NULL' if x is None else f'length {len(x)}'} "
                f"but dim={dim}; filter NULL/ragged embeddings upstream or "
                f"pass the correct dim=")
        m = np.stack([np.asarray(x, dtype="float64") for x in v])
        codes = ((m @ planes_t >= 0).astype(np.uint8) + 48).astype(np.uint8)
        return pd.Series([bytes(row).decode("ascii") for row in codes])

    return sig


def lsh_topk(
    corpus: DataFrame, queries: DataFrame,
    id_col: str = "vec_id", vec_col: str = "embedding",
    k: int = 5, bits: int = 16, bands: int = 4, dim: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """ANN top-k: random-hyperplane LSH bucketing + exact rescoring within
    buckets. Recall < 1 by construction; tune bits/bands.

    ``dim``: pass explicitly at scale — inferring it costs one tiny
    driver-side metadata action (``first()`` on the pruned vector column),
    fine interactively but an avoidable sync point inside pipelines."""
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    chunk = bits // bands

    sig_udf = _hyperplane_sig_udf(corpus.sparkSession, bits, dim, seed)

    def banded(df, prefix):
        v = F.col(vec_col).cast("array<double>")
        # NULL/ragged vectors dropped before the kernel (see
        # _hyperplane_sig_udf's input contract)
        df = df.filter(F.col(vec_col).isNotNull() & (F.size(vec_col) == dim))
        # UDF materialized in its own projection (not legal inside the HOF)
        sigd = df.select(F.col(id_col).alias(f"{prefix}_id"),
                         v.alias(f"{prefix}_vec"), sig_udf(v).alias("_sig"))
        return sigd.select(
            f"{prefix}_id", f"{prefix}_vec",
            F.posexplode(F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.substring(F.col("_sig"), b * chunk + 1, chunk),
            )).alias("_band", "_chunk"))

    cb, qb = banded(corpus, "n"), banded(queries, "q")
    cand = (cb.join(qb, on=["_band", "_chunk"])
              .filter(F.col("n_id") != F.col("q_id"))
              .dropDuplicates(["q_id", "n_id"])
              .withColumn("cos", cosine(F.col("q_vec"), F.col("n_vec"))))
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id"))
    return (cand.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k)
            .select("q_id", F.col("n_id").alias("neighbor_id"),
                    F.round("cos", 6).alias("cos"), "rk"))
