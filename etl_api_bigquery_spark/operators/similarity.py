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
    """
    a = emb.select(F.col(id_col).alias("id_a"),
                   F.col(vec_col).cast("array<double>").alias("va"))
    b = emb.select(F.col(id_col).alias("id_b"),
                   F.col(vec_col).cast("array<double>").alias("vb"))
    if method == "brute":
        pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    elif method == "lsh":
        if dim is None:
            dim = len(emb.select(vec_col).first()[0])
        chunk = bits // bands
        if chunk < 2:
            raise ValueError(
                f"degenerate LSH banding: bits={bits}, bands={bands} gives "
                f"chunk={chunk} (<2 bits/band -> <=2 buckets/band, candidate "
                f"volume ~bands*n^2). Use bits >= 2*bands, e.g. bits=128 "
                f"bands=8, or method='brute' for low thresholds.")
        sig = _hyperplane_sig(F.col(vec_col).cast("array<double>"), bits, dim,
                              seed)
        banded = emb.select(
            F.col(id_col).alias("_id"),
            F.col(vec_col).cast("array<double>").alias("_vec"),
            F.posexplode(F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda bd: F.substring(sig, bd * chunk + 1, chunk),
            )).alias("_band", "_chunk"))
        ba = banded.select(F.col("_id").alias("id_a"),
                           F.col("_vec").alias("va"), "_band", "_chunk")
        bb = banded.select(F.col("_id").alias("id_b"),
                           F.col("_vec").alias("vb"), "_band", "_chunk")
        pairs = (ba.join(bb, on=["_band", "_chunk"])
                 .filter(F.col("id_a") < F.col("id_b"))
                 .dropDuplicates(["id_a", "id_b"])
                 .select("id_a", "va", "id_b", "vb"))
    else:
        raise ValueError(f"unknown method {method!r}")
    return (pairs
            .withColumn("cos", cosine(F.col("va"), F.col("vb")))
            .filter(F.col("cos") >= threshold)
            .select("id_a", "id_b", F.round("cos", 4).alias("cos_r")))


def _plane_component(b: int, seed: int):
    """One-arg transform lambda for plane ``b``'s j-th component. Built via a
    factory, NOT a ``lambda j, b=b:`` default-arg closure — a two-parameter
    callable is bound by PySpark's higher-order-function layer as the
    (element, index) form, which silently replaced the plane index with the
    array position and made every hyperplane identical (round-1 latent bug:
    all signatures collapsed to two buckets)."""
    def fn(j):
        return (F.pmod(F.xxhash64(F.lit(b), j, F.lit(seed)),
                       F.lit(1000)) / 1000.0) - 0.5
    return fn


def _hyperplane_sig(vec: Column, bits: int, dim: int, seed: int) -> Column:
    """Sign signature against ``bits`` pseudo-random hyperplanes. Plane (b, j)
    component = centered hash in [-0.5, 0.5) — deterministic, no RNG state."""
    def plane_dot(b):
        return F.aggregate(
            F.zip_with(
                vec,
                F.transform(F.sequence(F.lit(0), F.lit(dim - 1)),
                            _plane_component(b, seed)),
                lambda x, p: x * p),
            F.lit(0.0), lambda acc, v: acc + v)
    return F.concat_ws("", *[
        F.when(plane_dot(b) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for b in range(bits)
    ])


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

    def banded(df, prefix):
        v = F.col(vec_col).cast("array<double>")
        sig = _hyperplane_sig(v, bits, dim, seed)
        return df.select(
            F.col(id_col).alias(f"{prefix}_id"), v.alias(f"{prefix}_vec"),
            F.posexplode(F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.substring(sig, b * chunk + 1, chunk),
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
