"""Custom stateful streaming (applyInPandasWithState) vs batch recomputation:
state must accumulate ACROSS micro-batches (two input files → two batches
with Trigger.AvailableNow + maxFilesPerTrigger=1)."""

from __future__ import annotations

import datetime as dt

from dig_entity_resolution_spark.streaming.stateful import crawl_url_state


def test_crawl_url_state_accumulates_across_batches(spark, tmp_path):
    base = dt.datetime(2024, 1, 1, 10, 0, 0)
    batch1 = [
        ("u1", base),
        ("u2", base + dt.timedelta(hours=1)),
    ]
    batch2 = [
        ("u1", base + dt.timedelta(days=2)),  # re-crawl of u1
        ("u3", base + dt.timedelta(hours=5)),
    ]
    src = tmp_path / "in"
    src.mkdir()
    schema = "url string, warc_ts timestamp"
    spark.createDataFrame(batch1, schema).coalesce(1).write.parquet(
        str(src / "b1")
    )
    spark.createDataFrame(batch2, schema).coalesce(1).write.parquet(
        str(src / "b2")
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = (
        crawl_url_state(stream)
        .writeStream.format("memory")
        .queryName("url_state")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("select * from url_state").collect()
    # update mode: take the LAST emission per url
    final = {}
    for r in rows:
        final[r.url] = r
    assert final["u1"].n_crawls == 2
    assert final["u1"].first_ts == base
    assert final["u1"].last_ts == base + dt.timedelta(days=2)
    assert final["u2"].n_crawls == 1
    assert final["u3"].n_crawls == 1
