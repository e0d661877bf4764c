"""As-of join (operators/asof.py): backward point-in-time semantics,
inclusive ties, left-join NULLs, tolerance, duplicate-right guard."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from dig_entity_resolution_spark.operators.asof import asof_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture()
def tables(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-05 00:00:00")),  # after both snapshots
            (2, 10, _ts("2024-01-02 00:00:00")),  # exactly at snap B (tie)
            (3, 10, _ts("2023-12-01 00:00:00")),  # before any snapshot
            (4, 20, _ts("2024-06-01 00:00:00")),  # other key
            (5, 30, _ts("2024-06-01 00:00:00")),  # key with no right rows
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2024-01-01 00:00:00"), "A"),
            (10, _ts("2024-01-02 00:00:00"), "B"),
            (20, _ts("2024-01-01 00:00:00"), "C"),
        ],
        "user_id long, snap_ts timestamp, state string",
    )
    return left, right


def test_asof_backward_inclusive_and_left_nulls(spark, tables):
    left, right = tables
    out = {
        r.event_id: r.state
        for r in asof_join(
            left, right, "user_id", "ts", "snap_ts", ("state",)
        ).collect()
    }
    assert out == {1: "B", 2: "B", 3: None, 4: "C", 5: None}


def test_asof_tolerance_nulls_stale_matches(spark, tables):
    left, right = tables
    out = {
        r.event_id: r.state
        for r in asof_join(
            left, right, "user_id", "ts", "snap_ts", ("state",),
            tolerance_seconds=7 * 86400,
        ).collect()
    }
    # event 1 is 3 days after snap B (fresh); event 4 is ~5 months after C
    assert out == {1: "B", 2: "B", 3: None, 4: None, 5: None}


def test_asof_rejects_duplicate_right_timestamps(spark, tables):
    left, right = tables
    dup = right.unionByName(
        spark.createDataFrame(
            [(10, _ts("2024-01-02 00:00:00"), "B2")],
            "user_id long, snap_ts timestamp, state string",
        )
    )
    with pytest.raises(Exception, match="duplicate"):
        asof_join(left, dup, "user_id", "ts", "snap_ts", ("state",)).collect()


def test_asof_preserves_every_left_row(spark, tables):
    left, right = tables
    out = asof_join(left, right, "user_id", "ts", "snap_ts", ("state",))
    assert out.count() == left.count()
    assert set(out.columns) == {"event_id", "user_id", "ts", "state"}


def test_asof_rejects_colliding_column_names(spark, tables):
    left, right = tables
    with pytest.raises(ValueError, match="collide"):
        asof_join(
            left, right.withColumnRenamed("state", "ts"),
            "user_id", "ts", "snap_ts", ("ts",),
        )
    with pytest.raises(ValueError, match="reserved"):
        asof_join(
            left.withColumnRenamed("event_id", "_k"),
            right, "user_id", "ts", "snap_ts", ("state",),
        )


def test_asof_drops_null_right_timestamps(spark, tables):
    """ADVICE r3: a right row with NULL right_ts must never match — under
    nulls-first ascending sort it would otherwise act as a -infinity
    snapshot carried into every left row."""
    left, right = tables
    poisoned = right.unionByName(
        spark.createDataFrame(
            [(30, None, "POISON")], "user_id long, snap_ts timestamp, state string"
        )
    )
    out = {
        r.event_id: r.state
        for r in asof_join(
            left, poisoned, "user_id", "ts", "snap_ts", ("state",)
        ).collect()
    }
    # key 30 (event 5) has only the NULL-ts snapshot → still no match;
    # event 3 (before any snapshot) must not inherit the NULL-ts row either
    assert out == {1: "B", 2: "B", 3: None, 4: "C", 5: None}


def test_asof_null_left_ts_gets_null_payload(spark, tables):
    _, right = tables
    left = spark.createDataFrame(
        [(9, 10, None)], "event_id long, user_id long, ts timestamp"
    )
    rows = asof_join(left, right, "user_id", "ts", "snap_ts", ("state",)).collect()
    assert len(rows) == 1 and rows[0].state is None
