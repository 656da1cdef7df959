"""Unit tests for the training-data-pipeline operators: text analysis,
exact/near dedup (MinHash-LSH, SimHash, Jaccard), similarity search."""

from pyspark.sql import functions as F

from etl_api_bigquery_spark.functions.text import (
    fingerprint, lang_id, quality_score, token_count)
from etl_api_bigquery_spark.operators.dedup import (
    exact_dedup, minhash_dedup, minhash_lsh_candidates, ngram_jaccard,
    shingles, simhash_candidates, simhash_hamming, simhash_bits)
from etl_api_bigquery_spark.operators.quality import (
    duplicate_keys, quality_report)
from etl_api_bigquery_spark.operators.similarity import cosine_topk, lsh_topk

SF = "/root/testdata/sf0.001"


def docs(spark):
    base = ("the quick brown fox jumps over the lazy dog and runs into the "
            "green forest looking for food and water in the morning light")
    near = base.replace("morning", "evening")
    far = "der hund ist nicht mit der katze auf das feld gegangen und die"
    return spark.createDataFrame(
        [(0, base), (1, base), (2, near), (3, far),
         (4, "completely unrelated text about spark query engines and joins")],
        ["doc_id", "text"])


def test_token_count_and_fingerprint(spark):
    df = spark.createDataFrame([("Hello,  World! 42",), ("  hello world 42 ",)],
                               ["text"])
    out = df.select(token_count("text").alias("n"),
                    fingerprint("text").alias("fp")).collect()
    assert out[0].n == 3
    # fingerprint normalizes case/whitespace but keeps punctuation distinction
    assert out[0].fp != out[1].fp
    df2 = spark.createDataFrame([("a  b",), ("A B ",)], ["text"])
    fps = df2.select(fingerprint("text").alias("fp")).collect()
    assert fps[0].fp == fps[1].fp


def test_lang_id_votes(spark):
    out = {r.doc_id: r.g for r in
           docs(spark).select("doc_id", lang_id("text").alias("g")).collect()}
    assert out[0] == "en" and out[3] == "de"


def test_quality_score_bounds(spark):
    out = docs(spark).select(quality_score("text").alias("s")).collect()
    assert all(0.0 <= r.s <= 1.0 for r in out)


def test_exact_dedup_keeps_min_id(spark):
    kept = exact_dedup(docs(spark), "text", "doc_id")
    ids = sorted(r.doc_id for r in kept.collect())
    assert ids == [0, 2, 3, 4]  # doc 1 is an exact dup of 0


def test_minhash_lsh_finds_near_dup(spark):
    pairs = minhash_lsh_candidates(docs(spark), "doc_id", "text",
                                   num_hashes=32, bands=16, min_jaccard=0.5)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (0, 1) in got          # exact dup always caught
    assert (0, 2) in got          # one-word-diff near dup
    assert all(p not in got for p in [(0, 3), (0, 4), (3, 4)])


def test_minhash_dedup_drops_higher_id(spark):
    kept = minhash_dedup(docs(spark), "doc_id", "text", min_jaccard=0.5,
                         num_hashes=32, bands=16)
    ids = sorted(r.doc_id for r in kept.collect())
    assert 0 in ids and 1 not in ids and 2 not in ids
    assert 3 in ids and 4 in ids


def test_simhash_identical_and_near(spark):
    d = docs(spark)
    sh = d.select("doc_id", simhash_bits("text", 32).alias("s")).collect()
    m = {r.doc_id: r.s for r in sh}
    assert m[0] == m[1] and len(m[0]) == 32
    pairs = simhash_candidates(d, "doc_id", "text", bits=32, bands=4,
                               max_hamming=6)
    got = {(r.id_a, r.id_b): r.hamming for r in pairs.collect()}
    assert got[(0, 1)] == 0
    assert (0, 2) in got


def test_ngram_jaccard_values(spark):
    d = docs(spark).select("doc_id", shingles("text", 1).alias("sh"))
    a = d.filter("doc_id = 0").select(F.col("sh").alias("a"))
    b = d.filter("doc_id = 1").select(F.col("sh").alias("b"))
    j = a.crossJoin(b).select(ngram_jaccard(F.col("a"), F.col("b")).alias("j"))
    assert j.collect()[0].j == 1.0


def test_cosine_topk_exact_vs_lsh_recall(spark):
    import math
    vecs = [(i, [math.cos(i * 0.3 + d * 0.01) for d in range(16)]) for i in range(50)]
    df = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    exact = cosine_topk(df, df.filter("vec_id < 3"), k=3)
    rows = exact.collect()
    assert len(rows) == 9
    assert all(r.cos <= 1.000001 for r in rows)
    # LSH returns a subset ranking; top-1 recall should be decent on smooth data
    approx = lsh_topk(df, df.filter("vec_id < 3"), k=3, bits=8, bands=4, dim=16)
    assert approx.count() >= 3


def test_ivf_topk_recall_and_determinism(spark):
    import math
    from etl_api_bigquery_spark.operators.similarity import ivf_topk
    vecs = [(i, [math.cos(i * 0.3 + d * 0.01) for d in range(16)]) for i in range(60)]
    df = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    q = df.filter("vec_id < 3")
    exact_top1 = {r.q_id: r.neighbor_id
                  for r in cosine_topk(df, q, k=1).collect()}
    approx = ivf_topk(df, q, k=3, n_centroids=4, nprobe=2, lloyd_iters=1)
    rows = approx.collect()
    assert len(rows) >= 3 and all(r.cos <= 1.000001 for r in rows)
    # nprobe=2/4 cells on smooth data: top-1 should mostly survive probing
    top1 = {r.q_id: r.neighbor_id for r in rows if r.rk == 1}
    hits = sum(1 for k, v in top1.items() if exact_top1.get(k) == v)
    assert hits >= 2
    # deterministic: same input -> identical result set (replay-safe k-means)
    again = ivf_topk(df, q, k=3, n_centroids=4, nprobe=2, lloyd_iters=1)
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again.collect()))


def test_near_dup_pairs_threshold_and_orientation(spark):
    from etl_api_bigquery_spark.operators.similarity import near_dup_pairs
    vecs = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0]),   # near-dup of 1
        (3, [0.0, 1.0, 0.0]),      # orthogonal
    ]
    df = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    rows = near_dup_pairs(df, threshold=0.95).collect()
    assert [(r.id_a, r.id_b) for r in rows] == [(1, 2)]
    assert rows[0].cos_r > 0.99


def test_quality_report_and_dup_keys(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, None), (3, "c")], ["k", "v"])
    rep = quality_report(df, required_cols=["v"], key_cols=["k"])
    assert rep.total_rows == 4
    assert abs(rep.null_rates["v"] - 0.25) < 1e-9
    assert abs(rep.dup_rate - 0.25) < 1e-9
    assert not rep.passed()
    dups = duplicate_keys(df, ["k"]).collect()
    assert len(dups) == 1 and dups[0].dup_count == 2


def test_hyperplanes_are_distinct(spark):
    """Regression: round-1's in-plan hash expressions collapsed every
    hyperplane into the same vector (two buckets total). The plane matrix —
    now evaluated once and embedded as literals — must stay pairwise
    non-identical AND bit-exact with Spark's own xxhash64 formula."""
    from etl_api_bigquery_spark.operators.similarity import _plane_matrix
    planes = _plane_matrix(spark, bits=4, dim=16, seed=42)
    for i in range(4):
        for k in range(i + 1, 4):
            assert planes[i] != planes[k], f"plane {i} == plane {k}"
    # component (b=0, j=0) recomputed independently in-plan
    want = spark.range(1).select(
        (F.pmod(F.xxhash64(F.lit(0), F.lit(0), F.lit(42)),
                F.lit(1000)) / 1000.0 - 0.5).alias("c")).first()["c"]
    assert planes[0][0] == want


def test_minhash_functions_are_distinct(spark):
    """Same regression for minhash: each hash fn i must differ."""
    from etl_api_bigquery_spark.operators.dedup import minhash_signature
    df = spark.createDataFrame([(["a", "b", "c"],)], ["sh"])
    sig = df.select(minhash_signature("sh", num_hashes=16).alias("s")).first()[0]
    assert len(set(sig)) > 8  # 16 independent hash fns -> mostly distinct mins


def test_simhash_sha256_variant_bits(spark):
    """sha256 token-hash simhash: deterministic, bit j = bit (j%4) of hex
    digit (j//4) — cross-checked against hashlib."""
    import hashlib
    from etl_api_bigquery_spark.operators.dedup import simhash_bits
    df = spark.createDataFrame([("hello",)], ["text"])
    got = df.select(simhash_bits("text", 64, token_hash="sha256")
                    .alias("s")).first()[0]
    hx = hashlib.sha256(b"hello").hexdigest()
    want = "".join(
        "1" if ((int(hx[j // 4], 16) >> (j % 4)) & 1) * 2 - 1 > 0 else "0"
        for j in range(64))
    assert got == want


def test_simhash_band_guarantee_exact(spark):
    """bands > max_hamming: banded candidates verified by hamming must EQUAL
    the all-pairs hamming result (pigeonhole completeness)."""
    from etl_api_bigquery_spark.operators.dedup import (simhash_bits,
                                                        simhash_candidates,
                                                        simhash_hamming)
    d = spark.read.parquet(SF + "/documents.parquet").filter("doc_id < 60")
    got = {(r.id_a, r.id_b) for r in
           simhash_candidates(d, "doc_id", "text", bits=64, bands=8,
                              max_hamming=6, token_hash="sha256").collect()}
    sh = d.select("doc_id", simhash_bits("text", 64, "sha256").alias("s"))
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("s").alias("sa"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("s").alias("sb"))
    want = {(r.id_a, r.id_b) for r in
            a.crossJoin(b).filter("id_a < id_b")
            .withColumn("hd", simhash_hamming(F.col("sa"), F.col("sb")))
            .filter("hd <= 6").collect()}
    assert got == want


def test_near_dup_pairs_lsh_equals_brute(spark):
    """At a blockable threshold (0.99, planted exact duplicates) banded LSH
    must equal brute force — identical vectors share identical signatures,
    so recall is 1 by construction, not probabilistically."""
    from pyspark.sql import functions as F
    from etl_api_bigquery_spark.operators.similarity import near_dup_pairs
    emb = (spark.read.parquet(SF + "/embeddings.parquet")
           .filter("vec_id < 200").select("vec_id", "embedding"))
    planted = emb.filter("vec_id < 50").select(
        (F.col("vec_id") + 10000).alias("vec_id"), "embedding")
    corpus = emb.unionByName(planted)
    brute = {(r.id_a, r.id_b) for r in
             near_dup_pairs(corpus, threshold=0.99, method="brute").collect()}
    lsh = {(r.id_a, r.id_b) for r in
           near_dup_pairs(corpus, threshold=0.99, method="lsh",
                          bits=128, bands=8, dim=64).collect()}
    assert brute == lsh and len(brute) == 50


def test_near_dup_candidates_subquadratic(spark):
    """The exposed blocking stage must emit far fewer pre-verify candidates
    than all-pairs on an uncorrelated corpus — the measured form of the
    bands·n²/2^chunk claim (chunk=16 ⇒ 65536 buckets/band), and the number
    bench.py records as `lsh_blocking`."""
    from pyspark.sql import functions as F
    from etl_api_bigquery_spark.operators.similarity import (
        near_dup_candidates)
    emb = (spark.read.parquet(SF + "/embeddings.parquet")
           .filter("vec_id < 200").select("vec_id", "embedding"))
    planted = emb.filter("vec_id < 50").select(
        (F.col("vec_id") + 10000).alias("vec_id"), "embedding")
    corpus = emb.unionByName(planted)
    n = corpus.count()
    n_cand = near_dup_candidates(corpus, bits=128, bands=8, dim=64).count()
    allpairs = n * (n - 1) // 2
    # 50 planted duplicate pairs MUST collide (identical signatures); random
    # collisions add a few more — but nothing near the quadratic 31k
    assert 50 <= n_cand < allpairs * 0.05, (n_cand, allpairs)


def test_near_dup_pairs_rejects_degenerate_chunks(spark):
    import pytest
    from etl_api_bigquery_spark.operators.similarity import near_dup_pairs
    emb = spark.read.parquet(SF + "/embeddings.parquet").filter("vec_id < 10")
    with pytest.raises(ValueError, match="degenerate LSH banding"):
        near_dup_pairs(emb, method="lsh", bits=16, bands=16, dim=64)


def test_near_dup_pairs_brute_guard(spark, monkeypatch):
    """An unscoped brute call above the documented row bound must raise
    instead of silently running O(n^2); allow_quadratic=True opts in."""
    import pytest
    from etl_api_bigquery_spark.operators import similarity
    emb = (spark.read.parquet(SF + "/embeddings.parquet")
           .filter("vec_id < 50").select("vec_id", "embedding"))
    monkeypatch.setattr(similarity, "BRUTE_MAX_ROWS", 10)
    with pytest.raises(ValueError, match="allow_quadratic"):
        similarity.near_dup_pairs(emb, threshold=0.99, method="brute")
    assert similarity.near_dup_pairs(
        emb, threshold=0.99, method="brute",
        allow_quadratic=True).count() == 0


def test_near_dup_lsh_tolerates_null_and_ragged_vectors(spark):
    """NULL and wrong-length embeddings are filtered before the signature
    kernel (the pre-r3 Catalyst expression degraded the same way: a null
    vector never produced a qualifying pair) instead of crashing np.stack."""
    from pyspark.sql import functions as F
    from etl_api_bigquery_spark.operators.similarity import (
        lsh_topk, near_dup_pairs)
    emb = (spark.read.parquet(SF + "/embeddings.parquet")
           .filter("vec_id < 60").select("vec_id", "embedding"))
    dirty = emb.unionByName(spark.createDataFrame(
        [(9001, None), (9002, [1.0, 2.0])],
        "vec_id long, embedding array<double>"))
    planted = emb.filter("vec_id < 20").select(
        (F.col("vec_id") + 10000).alias("vec_id"), "embedding")
    got = {(r.id_a, r.id_b) for r in near_dup_pairs(
        dirty.unionByName(planted), threshold=0.99, method="lsh",
        bits=128, bands=8, dim=64).collect()}
    assert len(got) == 20 and all(a < 9000 for a, _ in got)
    top = lsh_topk(dirty, dirty.filter("vec_id = 0"), k=3,
                   bits=16, bands=8, dim=64).collect()
    assert all(r.neighbor_id not in (9001, 9002) for r in top)


def test_full_quality_report_and_validate_coerce(spark):
    from etl_api_bigquery_spark.operators.quality import (full_quality_report,
                                                          validate_coerce)
    df = spark.createDataFrame(
        [("1", "a", 10), ("2", None, 20), ("x", "c", 30), ("4", "d", None)],
        ["id_str", "name", "v"])
    rep = full_quality_report(df, required_cols=["name"], key_cols=["id_str"],
                              type_specs={"id_str": "int"}).collect()[0]
    assert rep.total_rows == 4
    assert abs(rep.null_rate_name - 0.25) < 1e-9
    assert rep.dup_rate == 0.0
    assert abs(rep.type_correctness - 0.75) < 1e-9   # 'x' fails int
    assert rep.checks_passed == 1                     # only dup check passes
    assert abs(rep.score - 33.33) < 0.01
    ok = validate_coerce(df, required={"id_str": "int"},
                         optional={"v": "long"}).collect()
    assert {r.id_str for r in ok} == {1, 2, 4}        # 'x' row dropped
    assert all(isinstance(r.id_str, int) for r in ok)  # coerced
    names = {r.id_str: r.name for r in ok}
    assert names[2] is None                            # extras pass through


def test_validate_coerce_missing_columns(spark):
    """Required column absent -> every record invalid (empty result, stable
    schema); typo'd optional key -> ValueError, not silent ignore."""
    import pytest
    from etl_api_bigquery_spark.operators.quality import validate_coerce
    df = spark.createDataFrame([("1", 10), ("2", 20)], ["id_str", "v"])
    out = validate_coerce(df, required={"nope": "int", "id_str": "int"})
    assert out.count() == 0
    assert "nope" in out.columns                      # typed NULL pad
    with pytest.raises(ValueError, match="optional columns not in"):
        validate_coerce(df, required={"id_str": "int"},
                        optional={"typo": "long"})
