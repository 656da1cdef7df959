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
