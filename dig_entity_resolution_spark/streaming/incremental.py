"""Structured-Streaming surface (SURVEY.md §2.G — optional, not metric-bearing).

The reference has no streaming; the contract's north rule is batch-with-
resume. This module layers the incremental-ingest story on top: new crawl
batches arrive as files → stateful URL dedup within a watermark → windowed /
session aggregations. Batch twins of each transform exist in queries.py
(events_sessionize), so the streaming path is verified by running the same
logic through a file-source stream into a memory sink (tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_pages_stream(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """Incremental ingest of crawl batches dropped as parquet files."""
    return spark.readStream.schema(schema).parquet(path)


def dedup_recrawled_urls(pages: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """G5: drop re-crawls of the same url arriving within the watermark."""
    return pages.withWatermark("warc_ts", watermark).dropDuplicatesWithinWatermark(
        ["url"]
    )


def windowed_event_counts(
    events: DataFrame, window: str = "10 minutes", slide: str | None = None
) -> DataFrame:
    """G2: tumbling/sliding event counts with late-data watermark."""
    w = (
        F.window("ts", window)
        if slide is None
        else F.window("ts", window, slide)
    )
    return (
        events.withWatermark("ts", "30 minutes")
        .groupBy(F.col("event_type"), w.alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select("event_type", F.col("w.start").alias("w_start"), "n")
    )


def sessionized_counts(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """G3: session-window counts (same semantics as the batch oracle query
    events_sessionize)."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id", F.unix_timestamp(F.col("w.start")).alias("session_start"),
            "n_events",
        )
    )


def run_available_now(
    stream_df: DataFrame, query_name: str, output_mode: str = "complete"
) -> list:
    """Drain everything currently available into a memory sink and return
    the rows — the batch-increment execution mode (Trigger.AvailableNow).

    output_mode="complete" re-emits every aggregation group including windows
    the watermark has not finalized (append mode would withhold the trailing
    window); use "append" for non-aggregating streams (dedup etc.).
    """
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    spark = stream_df.sparkSession
    return spark.sql(f"select * from {query_name}").collect()
