"""Deterministic synthetic CDC change feed over a source-code corpus.

The sandbox has no real binlog/WAL, so the feed is generated (SURVEY.md §7.4)
— fully columnar (``spark.range`` + hash expressions, zero Python UDFs), seeded
and reproducible: the same (n_events, n_keys, seed) always yields byte-identical
events, which is what makes full-replay verification possible
(BASELINE.json: "replay-to-reference sha256 match rate = 100%").

Envelope shape per FIXTURES.md §2:
``(lsn, epoch, op, repo, path, commit, lang, content, event_ts)`` — an
update-stream of full-record images plus delete events, keyed ``(repo, path)``,
LWW by monotonic ``lsn``. The reference's analogue is the updatedAtFrom/To
polling of full bill records (src/features/nhanh/bills/components/
extractor.py:55-84); we add the delete envelopes its feed lacks.

Skew: keys are drawn from a power-law (Zipf-ish via inverse-CDF u^alpha), and
key 0's repo receives a constant extra share, so one repo dominates — the
hot-repo skew BASELINE.json requires the engine to handle explicitly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

LANGS = ["py", "rs", "go", "md", "java", "ts", "c", "rb"]


def feed_schema() -> T.StructType:
    return T.StructType([
        T.StructField("lsn", T.LongType(), False),
        T.StructField("epoch", T.LongType(), False),
        T.StructField("op", T.StringType(), False),
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("commit", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("content", T.StringType(), True),
        T.StructField("event_ts", T.TimestampType(), False),
    ])


def _u01(*cols) -> F.Column:
    """Deterministic uniform(0,1) from columns via xxhash64."""
    return (F.pmod(F.xxhash64(*cols), F.lit(1_000_000)) / F.lit(1_000_000.0))


def change_feed(
    spark: SparkSession,
    n_events: int,
    n_keys: int,
    n_repos: int = 50,
    n_epochs: int = 10,
    seed: int = 42,
    delete_frac: float = 0.08,
    skew_alpha: float = 2.5,
    hot_repo_share: float = 0.3,
    content_tokens: int = 24,
) -> DataFrame:
    """Generate n_events CDC envelopes. Pure column expressions; distributed.

    * key draw: ``key_id = floor(n_keys * u^alpha)`` (power law, key 0 hot)
      and with prob ``hot_repo_share`` the event is forced onto repo_0's key
      range — ~30% of all events hit one repo (FIXTURES.md §2 skew test).
    * op: first epoch is all inserts; later epochs are U with a delete_frac
      slice of D (and subsequent epochs may re-insert the key: the
      delete-then-reinsert case).
    * content: 64–512 chars of hex tokens derived from (key, lsn) — enough
      entropy that sha256(content) is a meaningful per-row invariant.
    """
    # Over-partition the lsn range: epochs are CONTIGUOUS lsn slices, so with
    # only defaultParallelism range partitions an `epoch == k` filter (e.g.
    # write_feed_as_epoch_files staging one epoch at a time) collapses to a
    # single task on a narrow driver — one partition holds the whole epoch.
    # Generation is pure column expressions, so extra splits are free, and
    # values are partitioning-independent (everything derives from lsn).
    n_parts = max(spark.sparkContext.defaultParallelism,
                  min(128, 1 + n_events // 500_000))
    df = (spark.range(0, n_events, 1, numPartitions=n_parts)
          .withColumnRenamed("id", "lsn"))
    s = F.lit(seed)

    u_key = _u01(F.col("lsn"), s, F.lit(1))
    base_key = F.floor(F.pow(u_key, F.lit(skew_alpha)) * F.lit(n_keys)).cast("long")
    # clamp (pow can hit exactly n_keys at u=1)
    base_key = F.least(base_key, F.lit(n_keys - 1))

    # force a share of events onto the hot repo's key range [0, n_keys/n_repos)
    keys_per_repo = max(1, n_keys // n_repos)
    u_hot = _u01(F.col("lsn"), s, F.lit(2))
    hot_key = F.pmod(F.xxhash64(F.col("lsn"), s, F.lit(3)), F.lit(keys_per_repo))
    key_id = F.when(u_hot < F.lit(hot_repo_share), hot_key).otherwise(base_key)

    repo_id = (key_id / F.lit(keys_per_repo)).cast("long")
    repo_id = F.least(repo_id, F.lit(n_repos - 1))

    epoch = F.floor(F.col("lsn") * F.lit(n_epochs) / F.lit(n_events)).cast("long")
    u_op = _u01(F.col("lsn"), s, F.lit(4))
    op = (
        F.when(epoch == 0, F.lit("I"))
        .when(u_op < F.lit(delete_frac), F.lit("D"))
        .otherwise(F.lit("U"))
    )

    # content: variable-length deterministic hex token stream
    n_tok = (F.pmod(F.xxhash64(key_id, F.col("lsn"), s), F.lit(content_tokens))
             + F.lit(4)).cast("int")
    content = F.array_join(
        F.transform(
            F.sequence(F.lit(0), n_tok),
            lambda i: F.lower(F.hex(F.xxhash64(key_id, F.col("lsn"), i, s))),
        ),
        " ",
    )
    commit = F.substring(F.sha2(F.concat_ws("|", key_id.cast("string"),
                                            F.col("lsn").cast("string")), 256), 1, 40)
    lang_arr = F.array(*[F.lit(x) for x in LANGS])
    lang = F.element_at(lang_arr, (F.pmod(key_id, F.lit(len(LANGS))) + 1).cast("int"))

    is_del = op == F.lit("D")
    out = df.select(
        F.col("lsn"),
        epoch.alias("epoch"),
        op.alias("op"),
        F.concat(F.lit("repo_"), repo_id.cast("string")).alias("repo"),
        F.concat(F.lit("src/f"), F.pmod(key_id, F.lit(keys_per_repo)).cast("string"),
                 F.lit("."), lang).alias("path"),
        F.when(is_del, F.lit(None).cast("string")).otherwise(commit).alias("commit"),
        F.when(is_del, F.lit(None).cast("string")).otherwise(lang).alias("lang"),
        F.when(is_del, F.lit(None).cast("string")).otherwise(content).alias("content"),
        F.timestamp_seconds(F.lit(1735689600) + F.col("lsn")).alias("event_ts"),
    )
    return out


def write_feed_as_epoch_files(feed: DataFrame, out_dir: str,
                              files_per_epoch: int = 1) -> list[int]:
    """Materialize the feed as ``files_per_epoch`` flat parquet files per
    epoch (``epoch_00000_p00.parquet``, ...) so the Structured Streaming file
    source with maxFilesPerTrigger=files_per_epoch replays one epoch per
    micro-batch.

    files_per_epoch > 1 matters for scan parallelism: a single coalesced file
    is one parquet row group, so its scan runs as ONE task no matter how many
    executor cores exist — splitting the epoch keeps the batch scan parallel
    (measured 2.5x on the dedup stage at 800k events/epoch)."""
    import glob as _glob
    import os
    import shutil

    os.makedirs(out_dir, exist_ok=True)
    epochs = [r[0] for r in feed.select("epoch").distinct().orderBy("epoch").collect()]
    for e in epochs:
        tmp = os.path.join(out_dir, f"_tmp_epoch_{e:05d}")
        (feed.filter(F.col("epoch") == e)
             .repartition(files_per_epoch)
             .write.mode("overwrite")
             .parquet(tmp))
        for i, part in enumerate(sorted(_glob.glob(os.path.join(tmp, "part-*.parquet")))):
            os.replace(part, os.path.join(out_dir, f"epoch_{e:05d}_p{i:02d}.parquet"))
        shutil.rmtree(tmp)
    return epochs
