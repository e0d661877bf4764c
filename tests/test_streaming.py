"""Streaming surface: file-source → memory-sink with Trigger.AvailableNow;
sessionized counts must equal the batch oracle query on the same data."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dig_entity_resolution_spark.streaming.incremental import (
    run_available_now,
    sessionized_counts,
    windowed_event_counts,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_stream(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("stream_src")
    # watermarks require TIMESTAMP (tz-aware); the fixture is TIMESTAMP_NTZ
    batch = spark.read.parquet(f"{SF}/events.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    batch.write.mode("overwrite").parquet(str(d / "in"))
    schema = batch.schema
    return spark.readStream.schema(schema).parquet(str(d / "in")), batch


def test_windowed_counts_stream_equals_batch(spark, events_stream):
    stream, batch = events_stream
    got = run_available_now(windowed_event_counts(stream), "win_counts")
    expect = (
        batch.groupBy("event_type", F.window("ts", "10 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select("event_type", F.col("w.start").alias("w_start"), "n")
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, expect))


def test_stateful_url_dedup(spark, tmp_path):
    """G5: re-crawls of the same url within the watermark are dropped."""
    import datetime as dt

    from dig_entity_resolution_spark.streaming.incremental import (
        dedup_recrawled_urls,
    )

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        ("u1", base),
        ("u1", base + dt.timedelta(minutes=5)),  # re-crawl within watermark
        ("u2", base + dt.timedelta(minutes=1)),
        ("u2", base + dt.timedelta(minutes=2)),  # re-crawl
        ("u3", base),
    ]
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp")
    src = str(tmp_path / "pages_in")
    df.write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    got = run_available_now(
        dedup_recrawled_urls(stream, "1 hour"), "url_dedup", output_mode="append"
    )
    urls = sorted(r.url for r in got)
    assert urls == ["u1", "u2", "u3"]


def test_sessionized_stream_equals_batch_query(spark, events_stream):
    import __spark_entry__ as entrymod

    stream, _ = events_stream
    got = run_available_now(sessionized_counts(stream), "sess_counts")
    expect = entrymod.queries()["events_sessionize"](spark, SF).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, expect))
