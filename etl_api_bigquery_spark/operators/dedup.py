"""Deduplication operators for large-scale corpora — exact and near-dup.

Extends the reference's duplicate handling (exact key dups via
GROUP BY ... HAVING COUNT(*)>1 + ROW_NUMBER keep-latest,
src/scripts/check_duplicates.py:44-64 / remove_duplicates.py:47-63) to the
content-level dedup a training-data pipeline needs: exact content hash,
MinHash+LSH, SimHash, n-gram Jaccard. All stages are DataFrame-native:

* signatures are computed with higher-order functions over token arrays
  (JVM columnar, no Python);
* candidate generation is a band-bucket shuffle (``explode`` bands ->
  ``groupBy`` bucket), never an all-pairs cross join — the O(n^2) step is
  confined to within-bucket pairs, which is what makes this viable at 10^9
  documents;
* verification (true Jaccard) runs only on candidate pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import content_sha256, tokens


# --------------------------------------------------------------- exact dedup

def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep one representative (min id) per exact content hash."""
    h = df.withColumn("_h", content_sha256(text_col))
    w = Window.partitionBy("_h").orderBy(F.col(id_col))
    return (h.withColumn("_rn", F.row_number().over(w))
             .filter(F.col("_rn") == 1)
             .drop("_h", "_rn"))


def lww_keep_latest(df: DataFrame, key_cols: list[str], ts_col: str) -> DataFrame:
    """ROW_NUMBER keep-latest — the reference's core dedup rule
    (remove_duplicates.py:55: PARTITION BY id ORDER BY extraction_timestamp
    DESC, rn=1)."""
    w = Window.partitionBy(*key_cols).orderBy(F.col(ts_col).desc())
    return (df.withColumn("_rn", F.row_number().over(w))
              .filter(F.col("_rn") == 1).drop("_rn"))


# ----------------------------------------------------------------- shingles

def shingles(col: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles as a distinct string array (columnar)."""
    toks = tokens(col)
    k = F.size(toks) - (n - 1)
    return F.array_distinct(
        F.when(k > 0, F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        )).otherwise(F.array()))


def ngram_jaccard(a: Column, b: Column) -> Column:
    """True Jaccard similarity of two shingle arrays. ``try_divide`` so two
    empty shingle sets yield 0.0 under any session config (ANSI included)."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.coalesce(F.try_divide(inter.cast("double"), union), F.lit(0.0))


# ------------------------------------------------------------------ MinHash

def _hash_fn(i: int, seed: int):
    """One-arg transform lambda closing over hash-function index ``i``.

    MUST be built via a factory: a ``lambda s, i=i:`` default-arg closure has
    TWO parameters, which PySpark's higher-order-function binder interprets
    as the (element, index) form — silently binding ``i`` to the array
    position instead of the hash index, collapsing every hash function into
    one (round-1 latent bug, caught by the plane-correlation probe)."""
    def fn(s):
        return F.xxhash64(s, F.lit(i), F.lit(seed))
    return fn


def minhash_signature(shingle_col: Column | str, num_hashes: int = 64,
                      seed: int = 42) -> Column:
    """num_hashes-wide MinHash signature: for each hash fn i,
    min over shingles of xxhash64(shingle, i, seed). Pure array expressions."""
    sh = F.col(shingle_col) if isinstance(shingle_col, str) else shingle_col
    mins = [F.array_min(F.transform(sh, _hash_fn(i, seed)))
            for i in range(num_hashes)]
    return F.array(*mins)


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    min_jaccard: float = 0.5,
) -> DataFrame:
    """Near-duplicate pairs via MinHash + banded LSH, verified by true Jaccard.

    Pipeline: shingle -> minhash -> split signature into ``bands`` bands ->
    hash each band -> shuffle on (band, band_hash) -> within-bucket self-join
    for candidate pairs -> verify with exact Jaccard on shingle sets.
    Returns (id_a, id_b, jaccard) with id_a < id_b, deduplicated across bands.
    """
    rows_per_band = num_hashes // bands
    sig = (df.select(F.col(id_col).alias("_id"),
                     shingles(text_col, shingle_n).alias("_sh"))
             .filter(F.size("_sh") > 0)
             .withColumn("_sig", minhash_signature("_sh", num_hashes)))
    # The band self-join carries ONLY (_id, _band, _bh) — 24 bytes/row —
    # through the explode x bands shuffle; the full shingle arrays (the
    # dominant payload at 10^9 docs) are re-joined afterwards for just the
    # surviving candidate ids.
    banded = sig.select(
        "_id",
        F.posexplode(F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda b: F.xxhash64(
                F.concat_ws(",", F.transform(
                    F.slice(F.col("_sig"), b * rows_per_band + 1, rows_per_band),
                    lambda x: x.cast("string"))),
            ),
        )).alias("_band", "_bh"),
    )
    a = banded.select(F.col("_id").alias("id_a"), "_band", "_bh")
    b = banded.select(F.col("_id").alias("id_b"), "_band", "_bh")
    # pairs is referenced twice below (survivor-id broadcast build + final
    # verify join); persist so the shingle+minhash+band pipeline runs ONCE.
    # The pair set is small by LSH design (that is the point of banding), so
    # the cache is a few longs per surviving candidate, disk-spillable.
    pairs = (a.join(b, on=["_band", "_bh"])
              .filter(F.col("id_a") < F.col("id_b"))
              .select("id_a", "id_b")
              .dropDuplicates(["id_a", "id_b"])
              .persist())
    # Re-shingle ONLY the surviving candidate docs: broadcast the (small)
    # survivor-id set and semi-join it against the source BEFORE the shingle
    # projection, so the second shingle pass is O(candidates), not O(corpus).
    # (Filtering sig itself would not help — whole-stage codegen evaluates
    # the projection before the join probe, shingling every row again.)
    cand_ids = (pairs.select(F.col("id_a").alias("_id"))
                .union(pairs.select(F.col("id_b").alias("_id")))
                .distinct())
    payload = (df.join(F.broadcast(cand_ids),
                       F.col(id_col) == F.col("_id"), "left_semi")
                 .select(F.col(id_col).alias("_id"),
                         shingles(text_col, shingle_n).alias("_sh")))
    enriched = (pairs
                .join(payload.select(F.col("_id").alias("id_a"),
                                     F.col("_sh").alias("_sha")), on="id_a")
                .join(payload.select(F.col("_id").alias("id_b"),
                                     F.col("_sh").alias("_shb")), on="id_b"))
    return (enriched
            .withColumn("jaccard", F.round(ngram_jaccard(F.col("_sha"),
                                                         F.col("_shb")), 4))
            .filter(F.col("jaccard") >= min_jaccard)
            .select("id_a", "id_b", "jaccard"))


def minhash_dedup(df: DataFrame, id_col: str, text_col: str,
                  min_jaccard: float = 0.8, **kw) -> DataFrame:
    """Drop near-duplicates: for every candidate pair above threshold, the
    higher id is removed (connected-component-free greedy rule, deterministic)."""
    pairs = minhash_lsh_candidates(df, id_col, text_col,
                                   min_jaccard=min_jaccard, **kw)
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(losers, on=id_col, how="left_anti")


# ------------------------------------------------------------------ SimHash

def simhash_bits(col: Column | str, bits: int = 64,
                 token_hash: str = "xxhash64") -> Column:
    """SimHash over tokens as a bit-sign vector, returned as a ``bits``-char
    '0'/'1' string. aggregate+zip_with keeps it fully columnar.

    ``token_hash``:

    * ``"xxhash64"`` (default) — cheapest JVM hash; the production path.
    * ``"sha256"`` — bit j taken from hex digit j//4 of sha2(token, 256)
      (bits <= 64). Byte-identical to what any ANSI-SQL engine with a
      sha256() can compute, so the DuckDB oracle can recompute the WHOLE
      signature independently — this is the cross-engine-verifiable path.
    """
    toks = tokens(col)

    if token_hash == "xxhash64":
        def contrib(t):
            return F.transform(
                F.sequence(F.lit(0), F.lit(bits - 1)),
                lambda j: F.when(F.bit_get(F.xxhash64(t), j) == 1,
                                 F.lit(1)).otherwise(F.lit(-1)))
    elif token_hash == "sha256":
        if bits > 64:
            raise ValueError("sha256 token hash supports bits <= 64")

        def contrib(t):
            hx = F.sha2(t, 256)
            # j//4, j%4 unrolled in PYTHON (literal positions/shifts) — the
            # whole bit expression stays a static Catalyst tree
            return F.array(*[
                (F.shiftright(
                    F.conv(F.substring(hx, j // 4 + 1, 1), 16, 10).cast("int"),
                    j % 4).bitwiseAND(F.lit(1)) * 2 - 1)
                for j in range(bits)
            ])
    else:
        raise ValueError(f"unknown token_hash {token_hash!r}")

    acc = F.aggregate(
        toks,
        F.array_repeat(F.lit(0), bits),
        lambda acc, t: F.zip_with(acc, contrib(t), lambda a, b: a + b),
    )
    return F.concat_ws("", F.transform(
        acc, lambda v: F.when(v > 0, F.lit("1")).otherwise(F.lit("0"))))


def simhash_hamming(a: Column, b: Column) -> Column:
    """Hamming distance between two simhash bit strings."""
    return F.size(F.filter(
        F.zip_with(F.split(a, ""), F.split(b, ""), lambda x, y: x != y),
        lambda z: z))


def simhash_candidates(df: DataFrame, id_col: str, text_col: str,
                       bits: int = 64, bands: int = 4,
                       max_hamming: int = 3,
                       token_hash: str = "xxhash64") -> DataFrame:
    """Near-dup pairs by SimHash: band the bit string into ``bands`` chunks;
    docs sharing any exact chunk are candidates; verify by Hamming distance.

    Completeness guarantee (pigeonhole): when ``max_hamming < bands`` and
    ``bands`` divides ``bits``, a pair within ``max_hamming`` differs in
    fewer bits than there are bands, so at least one band is identical —
    the result is then EXACTLY "all pairs with hamming <= max_hamming", not
    an approximation. The banded shuffle only bounds the candidate join.
    Rows with zero tokens are excluded (their all-zero signature would pair
    every empty doc with every other)."""
    chunk = bits // bands
    sh = (df.select(F.col(id_col).alias("_id"),
                    F.size(tokens(text_col)).alias("_nt"),
                    simhash_bits(text_col, bits, token_hash).alias("_sim"))
          .filter(F.col("_nt") > 0).drop("_nt"))
    banded = sh.select("_id", "_sim", F.posexplode(F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.substring(F.col("_sim"), b * chunk + 1, chunk),
    )).alias("_band", "_chunk"))
    a = banded.select(F.col("_id").alias("id_a"), F.col("_sim").alias("_sa"),
                      "_band", "_chunk")
    b = banded.select(F.col("_id").alias("id_b"), F.col("_sim").alias("_sb"),
                      "_band", "_chunk")
    return (a.join(b, on=["_band", "_chunk"])
             .filter(F.col("id_a") < F.col("id_b"))
             .dropDuplicates(["id_a", "id_b"])
             .withColumn("hamming", simhash_hamming(F.col("_sa"), F.col("_sb")))
             .filter(F.col("hamming") <= max_hamming)
             .select("id_a", "id_b", "hamming"))
