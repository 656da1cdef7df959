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
    d = l2_norm(a) * l2_norm(b)
    return F.when(d > 0, dot(a, b) / d).otherwise(F.lit(0.0))


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


def _hyperplane_sig(vec: Column, bits: int, dim: int, seed: int) -> Column:
    """Sign signature against ``bits`` pseudo-random hyperplanes. Plane (b, j)
    component = centered hash in [-0.5, 0.5) — deterministic, no RNG state."""
    def plane_dot(b):
        return F.aggregate(
            F.zip_with(
                vec,
                F.transform(F.sequence(F.lit(0), F.lit(dim - 1)),
                            lambda j, b=b: (F.pmod(F.xxhash64(F.lit(b), j, F.lit(seed)),
                                                   F.lit(1000)) / 1000.0) - 0.5),
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
    buckets. Recall < 1 by construction; tune bits/bands."""
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
