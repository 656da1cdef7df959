"""Bloom prefilter strategy: parity with the exact broadcast strategy.

The bloom winner-set filter may only err by letting EXTRA rows through
(false positives), which downstream LWW (read-side in raw mode, lww_dedup
in cow/mor) folds — so the observable contract is: identical final table
state, and a survivor set that is a superset of the exact strategy's.
"""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_api_bigquery_spark.cdc import change_feed, expected_final_state
from etl_api_bigquery_spark.lake import LakeTable
from etl_api_bigquery_spark.lake.merge import (
    _bloom_handles, lww_dedup, lww_prefilter, merge_cdc_batch)

SILVER = T.StructType([
    T.StructField("repo", T.StringType()),
    T.StructField("path", T.StringType()),
    T.StructField("commit", T.StringType()),
    T.StructField("lang", T.StringType()),
    T.StructField("content", T.StringType()),
])


def test_bloom_capability_present(spark):
    assert _bloom_handles(spark) is not None


def test_bloom_superset_and_dedup_parity(spark):
    ev = change_feed(spark, n_events=20_000, n_keys=2_000, n_epochs=1,
                     seed=11).drop("event_ts")
    exact = lww_prefilter(ev, ["repo", "path"], "lsn", strategy="broadcast")
    bloom = lww_prefilter(ev, ["repo", "path"], "lsn", strategy="bloom",
                          expected_winners=2_000)
    n_exact, n_bloom = exact.count(), bloom.count()
    assert n_bloom >= n_exact
    # missing rows would be a correctness loss: exact minus bloom is empty
    assert exact.exceptAll(bloom).count() == 0
    # after the exact LWW fold both survivor sets resolve identically
    a = lww_dedup(exact, ["repo", "path"], "lsn").orderBy("repo", "path")
    b = lww_dedup(bloom, ["repo", "path"], "lsn").orderBy("repo", "path")
    assert a.collect() == b.collect()


@pytest.mark.parametrize("mode", ["raw", "mor"])
def test_bloom_merge_final_state_parity(spark, tmp_table_dir, mode):
    feed = change_feed(spark, n_events=30_000, n_keys=3_000, n_epochs=3,
                       seed=7)
    tabs = {}
    for strat in ("broadcast", "bloom"):
        d = f"{tmp_table_dir}/{mode}_{strat}"
        t = LakeTable.create(spark, d, SILVER, key_cols=["repo", "path"],
                             num_buckets=8)
        for e in range(3):
            merge_cdc_batch(t, feed.filter(F.col("epoch") == e),
                            batch_id=e, mode=mode, prefilter=True,
                            prefilter_strategy=strat)
        tabs[strat] = t.read().orderBy("repo", "path")
    assert tabs["broadcast"].collect() == tabs["bloom"].collect()
    cols = [f.name for f in SILVER.fields]
    exp = expected_final_state(feed).select(*cols).orderBy("repo", "path")
    got = tabs["bloom"].select(*cols).orderBy("repo", "path")
    # engine state matches the batch oracle too (same check the elastic
    # protocol's sha gate runs)
    assert got.collect() == exp.collect()


def test_bloom_fallback_on_missing_handles(spark):
    from etl_api_bigquery_spark.lake.table import session_expr_cache
    cache = session_expr_cache(spark)
    saved = cache.get(("bloom_handles",), False)
    cache[("bloom_handles",)] = None  # simulate capability probe failure
    try:
        ev = change_feed(spark, n_events=5_000, n_keys=500, n_epochs=1,
                         seed=3).drop("event_ts")
        out = lww_prefilter(ev, ["repo", "path"], "lsn", strategy="bloom")
        exact = lww_prefilter(ev, ["repo", "path"], "lsn",
                              strategy="broadcast")
        # downgraded path is the exact semi-join: same rows, no superset
        assert out.count() == exact.count()
    finally:
        if saved is False:
            cache.pop(("bloom_handles",), None)
        else:
            cache[("bloom_handles",)] = saved


def test_bloom_drops_null_lsn(spark):
    rows = [(None, 0, "U", "r1", "p1", "c", "py", "x"),
            (5, 0, "U", "r1", "p1", "c", "py", "y")]
    sch = T.StructType([
        T.StructField("lsn", T.LongType()),
        T.StructField("epoch", T.LongType()),
        T.StructField("op", T.StringType()),
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("commit", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("content", T.StringType()),
    ])
    ev = spark.createDataFrame(rows, schema=sch)
    out = lww_prefilter(ev, ["repo", "path"], "lsn", strategy="bloom")
    got = out.collect()
    assert len(got) == 1 and got[0]["lsn"] == 5
