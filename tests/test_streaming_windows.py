"""Watermarked tumbling-window aggregation over the streaming change feed."""

import os

from pyspark.sql import functions as F

from etl_api_bigquery_spark.cdc import change_feed
from etl_api_bigquery_spark.cdc.generator import (feed_schema,
                                                  write_feed_as_epoch_files)
from etl_api_bigquery_spark.streaming.windows import windowed_event_counts


def test_windowed_counts_match_batch(spark, tmp_table_dir):
    feed = change_feed(spark, n_events=7200, n_keys=300, n_epochs=2).cache()
    feed_dir = os.path.join(tmp_table_dir, "wfeed")
    write_feed_as_epoch_files(feed, feed_dir)

    stream = (spark.readStream.schema(feed_schema())
              .option("maxFilesPerTrigger", 1).parquet(feed_dir))
    windows = windowed_event_counts(stream, window_duration="30 minutes",
                                    watermark_delay="5 minutes",
                                    group_cols=["op"])
    q = (windows.writeStream.format("memory").queryName("win_counts")
         .outputMode("append")
         .option("checkpointLocation", os.path.join(tmp_table_dir, "wck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(300)
    got = spark.table("win_counts")

    # batch ground truth (feed is in-order so no rows were late-dropped;
    # only windows closed by the final watermark are emitted in append mode)
    truth = (feed.groupBy(F.window("event_ts", "30 minutes").alias("w"), "op")
             .agg(F.count("*").alias("n_events"))
             .select(F.col("w.start").alias("window_start"), "op", "n_events"))
    j = got.join(truth, ["window_start", "op"], "inner")
    assert j.count() == got.count()  # every emitted window matches batch truth
    assert got.count() > 0
    mism = j.filter(got["n_events"] != truth["n_events"]).count()
    assert mism == 0
    feed.unpersist()
