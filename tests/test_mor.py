"""Merge-on-read specifics: delta accumulation, read resolution, compaction
equivalence, auto-compaction trigger, COW/MOR interop, time travel."""

import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_api_bigquery_spark.cdc import change_feed, expected_final_state
from etl_api_bigquery_spark.cdc.oracle import assert_replay_match
from etl_api_bigquery_spark.lake import LakeTable
from etl_api_bigquery_spark.lake.merge import merge_cdc_batch

SILVER = T.StructType([
    T.StructField("repo", T.StringType()),
    T.StructField("path", T.StringType()),
    T.StructField("commit", T.StringType()),
    T.StructField("lang", T.StringType()),
    T.StructField("content", T.StringType()),
])


def make_table(spark, d, buckets=4):
    return LakeTable.create(spark, os.path.join(d, "mor"), SILVER,
                            key_cols=["repo", "path"], num_buckets=buckets)


def test_mor_accumulates_deltas_then_compacts_equal_state(spark, tmp_table_dir):
    t = make_table(spark, tmp_table_dir)
    feed = change_feed(spark, n_events=8000, n_keys=300, n_epochs=4).cache()
    for e in range(4):
        merge_cdc_batch(t, feed.filter(F.col("epoch") == e), e, "mor",
                        mode="mor", auto_compact_deltas=1000)
    assert sum(t.delta_file_counts().values()) > 0
    before = t.read()
    expected = expected_final_state(feed)
    assert_replay_match(before, expected)

    # compaction must be state-preserving and clear the deltas
    v = t.compact_deltas(max_delta_files=1)
    assert v is not None
    assert t.delta_file_counts() == {}
    assert_replay_match(t.read(), expected)
    feed.unpersist()


def test_mor_auto_compaction_triggers(spark, tmp_table_dir):
    t = make_table(spark, tmp_table_dir, buckets=2)
    feed = change_feed(spark, n_events=4000, n_keys=100, n_epochs=8).cache()
    for e in range(8):
        merge_cdc_batch(t, feed.filter(F.col("epoch") == e), e, "mor",
                        mode="mor", auto_compact_deltas=3)
    # auto-compaction kept per-bucket delta count below the threshold
    assert all(c < 3 for c in t.delta_file_counts().values())
    assert_replay_match(t.read(), expected_final_state(feed))
    feed.unpersist()


def test_cow_after_mor_interop(spark, tmp_table_dir):
    """A COW batch on a table with outstanding deltas must resolve them."""
    t = make_table(spark, tmp_table_dir)
    feed = change_feed(spark, n_events=6000, n_keys=200, n_epochs=3).cache()
    merge_cdc_batch(t, feed.filter("epoch = 0"), 0, "mix", mode="mor",
                    auto_compact_deltas=1000)
    merge_cdc_batch(t, feed.filter("epoch = 1"), 1, "mix", mode="mor",
                    auto_compact_deltas=1000)
    merge_cdc_batch(t, feed.filter("epoch = 2"), 2, "mix", mode="cow")
    assert_replay_match(t.read(), expected_final_state(feed))
    feed.unpersist()


def test_mor_time_travel(spark, tmp_table_dir):
    t = make_table(spark, tmp_table_dir)
    b0 = spark.createDataFrame([(1, 0, "I", "r", "p", "c", "py", "v1")],
                               ["lsn", "epoch", "op", "repo", "path",
                                "commit", "lang", "content"])
    b1 = spark.createDataFrame([(2, 1, "U", "r", "p", "c", "py", "v2")],
                               b0.schema)
    merge_cdc_batch(t, b0, 0, "tt", mode="mor")
    v1 = t.current_version()
    merge_cdc_batch(t, b1, 1, "tt", mode="mor")
    assert t.read(version=v1).collect()[0].content == "v1"
    assert t.read().collect()[0].content == "v2"


def test_raw_append_then_full_compaction(spark, tmp_table_dir):
    """raw mode: zero-shuffle appends (mixed-bucket files), correct reads via
    LWW resolution, and full L0 fold on compaction."""
    from etl_api_bigquery_spark.lake.table import MIXED_BUCKET
    t = make_table(spark, tmp_table_dir)
    feed = change_feed(spark, n_events=6000, n_keys=200, n_epochs=3).cache()
    for e in range(3):
        merge_cdc_batch(t, feed.filter(F.col("epoch") == e), e, "raw",
                        mode="raw", auto_compact_deltas=10**6)
    assert any(e.bucket == MIXED_BUCKET for e in t.snapshot().files.values())
    expected = expected_final_state(feed)
    assert_replay_match(t.read(), expected)
    t.compact_deltas(buckets=[0])  # mixed victims -> full fold
    assert t.delta_file_counts() == {}
    assert all(e.bucket != MIXED_BUCKET for e in t.snapshot().files.values())
    assert_replay_match(t.read(), expected)
    feed.unpersist()


def test_cow_after_raw_full_rewrite_no_dupes(spark, tmp_table_dir):
    t = make_table(spark, tmp_table_dir)
    feed = change_feed(spark, n_events=4000, n_keys=150, n_epochs=2).cache()
    merge_cdc_batch(t, feed.filter("epoch = 0"), 0, "x", mode="raw",
                    auto_compact_deltas=10**6)
    merge_cdc_batch(t, feed.filter("epoch = 1"), 1, "x", mode="cow")
    df = t.read()
    assert df.groupBy("repo", "path").count().filter("count > 1").isEmpty()
    assert_replay_match(df, expected_final_state(feed))
    feed.unpersist()


def test_mor_write_cost_independent_of_table_size(spark, tmp_table_dir):
    """The point of MOR: a 1-key batch adds O(1) files and reads 0 target
    rows even on a populated table."""
    t = make_table(spark, tmp_table_dir, buckets=8)
    feed = change_feed(spark, n_events=20000, n_keys=2000, n_epochs=1)
    merge_cdc_batch(t, feed, 0, "sz", mode="mor")
    t.compact_deltas(max_delta_files=1)
    one = spark.createDataFrame([(99999, 1, "U", "repo_1", "x", "c", "py", "nv")],
                                ["lsn", "epoch", "op", "repo", "path",
                                 "commit", "lang", "content"])
    m = merge_cdc_batch(t, one, 1, "sz", mode="mor")
    assert m.target_rows_read == 0
    assert m.buckets_touched == 1
    got = t.read().filter("repo = 'repo_1' and path = 'x'").collect()
    assert len(got) == 1 and got[0].content == "nv"


def test_raw_bucket_pure_l0_compacts_per_bucket(spark, tmp_table_dir):
    """l0_groups=num_buckets: raw L0 files are bucket-PURE (labeled with real
    bucket ids via footer stats, no shuffle added), so compaction folds ONLY
    the hot buckets instead of the full L0 — MOR-grade locality on the
    zero-shuffle ingest path."""
    from etl_api_bigquery_spark.lake.table import MIXED_BUCKET
    t = make_table(spark, tmp_table_dir)
    feed = change_feed(spark, n_events=6000, n_keys=200, n_epochs=3).cache()
    for e in range(3):
        merge_cdc_batch(t, feed.filter(F.col("epoch") == e), e, "rawp",
                        mode="raw", auto_compact_deltas=10**6, l0_groups=4)
    assert all(e.bucket != MIXED_BUCKET for e in t.snapshot().files.values())
    expected = expected_final_state(feed)
    assert_replay_match(t.read(), expected)
    amp_before = t.bucket_read_amplification()
    assert amp_before[0] >= 3
    survivors_other = [e.path for e in t.snapshot().files.values()
                       if e.kind == "delta" and e.bucket != 0]
    t.compact_deltas(buckets=[0])          # folds bucket 0 ONLY
    after = t.snapshot()
    assert t.bucket_read_amplification().get(0) is None
    # the other buckets' L0 files were not touched by the partial fold
    assert all(p in after.files for p in survivors_other)
    assert_replay_match(t.read(), expected)
    feed.unpersist()


def test_raw_grouped_l0_closure_bounded_fold(spark, tmp_table_dir):
    """l0_groups=2 on a 4-bucket table: L0 files span one contiguous 2-bucket
    range each; compacting bucket 0 expands to its GROUP's closure {0,1} and
    leaves the other group's L0 intact (no full-table fold)."""
    from etl_api_bigquery_spark.lake.table import MIXED_BUCKET
    t = make_table(spark, tmp_table_dir)
    feed = change_feed(spark, n_events=6000, n_keys=200, n_epochs=3).cache()
    for e in range(3):
        merge_cdc_batch(t, feed.filter(F.col("epoch") == e), e, "rawg",
                        mode="raw", auto_compact_deltas=10**6, l0_groups=2)
    snap = t.snapshot()
    spans = {t._entry_bucket_range(e) for e in snap.files.values()
             if e.bucket == MIXED_BUCKET and e.kind == "delta"}
    assert spans and all(hi - lo <= 1 for lo, hi in spans)
    assert t.expand_bucket_closure(snap, [0]) == [0, 1]
    expected = expected_final_state(feed)
    other_group = [e.path for e in snap.files.values()
                   if e.kind == "delta" and t._entry_bucket_range(e)[0] >= 2]
    assert other_group
    t.compact_deltas(buckets=[0])
    after = t.snapshot()
    assert all(p in after.files for p in other_group)
    amp = t.bucket_read_amplification()
    assert amp.get(0) is None and amp.get(1) is None
    assert_replay_match(t.read(), expected)
    feed.unpersist()


def test_async_compaction_overlaps_and_survives_commit_race(spark, tmp_table_dir):
    """compact_async: the fold runs on a background thread while the next
    batch appends deltas concurrently — the lost commit race is retried, LWW
    keeps post-snapshot deltas winning over the compacted base, and the final
    state still matches the batch oracle."""
    t = make_table(spark, tmp_table_dir)
    feed = change_feed(spark, n_events=8000, n_keys=300, n_epochs=4).cache()
    # threshold low enough that compaction is scheduled mid-stream
    for e in range(4):
        merge_cdc_batch(t, feed.filter(F.col("epoch") == e), e, "async",
                        mode="raw", auto_compact_deltas=2, l0_groups=4,
                        compact_async=True)
    t.join_maintenance()
    assert any(h["action"] == "compact_deltas" for h in t.history())
    assert_replay_match(t.read(), expected_final_state(feed))
    feed.unpersist()


def test_cow_after_grouped_raw_partial_rewrite(spark, tmp_table_dir):
    """A COW batch over grouped-L0 deltas widens its rewrite to the groups'
    closure (not the full table) and produces no duplicates."""
    t = make_table(spark, tmp_table_dir)
    feed = change_feed(spark, n_events=4000, n_keys=150, n_epochs=2).cache()
    merge_cdc_batch(t, feed.filter("epoch = 0"), 0, "x", mode="raw",
                    auto_compact_deltas=10**6, l0_groups=4)
    merge_cdc_batch(t, feed.filter("epoch = 1"), 1, "x", mode="cow")
    df = t.read()
    assert df.groupBy("repo", "path").count().filter("count > 1").isEmpty()
    assert_replay_match(df, expected_final_state(feed))
    feed.unpersist()


def test_l0_groups_sizing_rule():
    """_l0_groups_for: largest G keeping expected L0 file size >= the floor,
    clamped to [1, num_buckets]."""
    from etl_api_bigquery_spark.lake.merge import _l0_groups_for
    MB = 1 << 20
    # production-scale per-task volume: saturates at full bucket purity
    assert _l0_groups_for(128 * 1024 * MB, 64, 0.35, 32, 16 * MB) == 32
    # bench-scale: 12M-event campaign shape (3.8 GB, 64 tasks, ~0.35
    # survival) must NOT produce 2 MB files — G collapses toward 1
    assert _l0_groups_for(3800 * MB, 64, 0.35, 32, 16 * MB) == 1
    # mid regime: G scales with per-task bytes
    assert _l0_groups_for(3800 * MB, 8, 1.0, 32, 16 * MB) == 29
    # degenerate inputs: conservative full purity
    assert _l0_groups_for(0, 8, 1.0, 32, 16 * MB) == 32
    assert _l0_groups_for(100, 0, 1.0, 32, 16 * MB) == 32


def test_raw_auto_l0_groups_end_to_end(spark, tmp_table_dir, tmp_path):
    """l0_groups="auto" on a file-backed batch: resolves to a concrete G
    (recorded in commit properties), keeps the replay sha-green, and updates
    the trailing out/in ratio used by the next batch."""
    t = make_table(spark, tmp_table_dir)
    feed = change_feed(spark, n_events=6000, n_keys=200, n_epochs=2)
    fdir = str(tmp_path / "feed_auto")
    feed.write.mode("overwrite").parquet(fdir)
    batch = spark.read.parquet(fdir)
    m = merge_cdc_batch(t, batch, 0, "auto1", mode="raw",
                        auto_compact_deltas=10**6, l0_groups="auto")
    assert m.version >= 0
    hist = [h for h in t.history() if h.get("properties", {})
            .get("txn_batch") == 0]
    g = hist[-1]["properties"]["l0_groups"]
    assert 1 <= g <= t.num_buckets      # tiny batch -> coarse grouping
    assert 0 < t.l0_out_ratio           # trailing ratio now measured
    assert_replay_match(t.read(), expected_final_state(feed))
