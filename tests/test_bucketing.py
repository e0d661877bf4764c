"""Bucketed co-located joins: the join of two tables bucketed on the key
must plan WITHOUT a shuffle Exchange (SURVEY.md §4 physical layout)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dig_entity_resolution_spark.plans.bucketing import (
    plan_has_shuffle,
    read_table,
    write_bucketed,
)


def test_bucketed_join_has_no_shuffle(spark):
    left = spark.range(0, 10000).select(
        F.col("id").alias("record_id"), (F.col("id") % 7).alias("v")
    )
    right = spark.range(0, 10000, 2).select(
        F.col("id").alias("record_id"), (F.col("id") % 5).alias("w")
    )
    write_bucketed(left, "bkt_left", ["record_id"], n_buckets=8)
    write_bucketed(right, "bkt_right", ["record_id"], n_buckets=8)
    # disable auto-broadcast: at real scale neither side broadcasts — the
    # point of bucketing is the shuffle-free SortMergeJoin
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        l, r = read_table(spark, "bkt_left"), read_table(spark, "bkt_right")
        joined = l.join(r, "record_id")
        assert not plan_has_shuffle(joined), "bucketed join must not shuffle"
        assert joined.count() == 5000
        # control: the same join on plain (non-bucketed) frames DOES shuffle
        plain = left.join(right, "record_id")
        assert plan_has_shuffle(plain)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
