"""Bucketed physical layout (SURVEY.md §4): co-located joins without a
shuffle.

At 10^12 documents the hydrate join (pairs ⋈ records on record_id) is the
hottest repeated shuffle. Writing `records` (and resume-relevant pair
tables) bucketed by the join key lets every later join read co-located
buckets: Catalyst plans a SortMergeJoin with NO Exchange on the bucketed
side(s). tests/test_bucketing.py asserts the Exchange really disappears.

Uses the session catalog's saveAsTable (works with the default in-memory
catalog + spark.sql.warehouse.dir; on a cluster the same code targets the
metastore/Iceberg catalog).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    n_buckets: int = 64,
    sort: bool = True,
) -> None:
    spark = df.sparkSession
    # a previous session may have left the managed location on disk after the
    # in-memory catalog forgot the table — clear both
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    loc = os.path.join(warehouse.removeprefix("file:"), table.lower())
    shutil.rmtree(loc, ignore_errors=True)
    writer = df.write.format("parquet").mode("overwrite").bucketBy(
        n_buckets, *keys
    )
    if sort:
        writer = writer.sortBy(*keys)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def plan_has_shuffle(df: DataFrame) -> bool:
    """True when the physical plan contains a shuffle Exchange."""
    import io
    from contextlib import redirect_stdout

    import re

    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    # formatted output names the node "(n) Exchange" with the partitioning on
    # the Arguments line; \b excludes BroadcastExchange (not a shuffle)
    return re.search(r"\bExchange\b", plan) is not None
