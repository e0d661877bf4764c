from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dig_entity_resolution_spark.operators.blocking import (
    exclude_pairs,
    restrict_pairs,
)
from dig_entity_resolution_spark.plans.checkpoint import (
    IcebergCheckpoint,
    ParquetCheckpoint,
)


def test_exclude_and_restrict(spark):
    cand = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (4, 5)], ["id1", "id2"]
    )
    done = spark.createDataFrame([(1, 2), (4, 5)], ["id1", "id2"])
    rest = {(r.id1, r.id2) for r in exclude_pairs(cand, done).collect()}
    assert rest == {(1, 3), (2, 3)}
    want = spark.createDataFrame([(2, 3), (9, 9)], ["id1", "id2"])
    kept = {(r.id1, r.id2) for r in restrict_pairs(cand, want).collect()}
    assert kept == {(2, 3)}


def test_checkpoint_lineage_counts(spark, tmp_path):
    ck = ParquetCheckpoint(spark, str(tmp_path), "r1")
    df = spark.range(100).withColumnRenamed("id", "record_id").repartition(4)
    ck.write("stage_a", df)
    assert ck.is_complete("stage_a")
    lin = ck.lineage("stage_a")
    rows = lin.agg(F.sum("rows_out")).collect()[0][0]
    assert rows == 100
    assert lin.count() >= 1  # one row per written file
    assert ck.counters() == {"stage_a": 100}


def test_checkpoint_incomplete_after_meta_wipe(spark, tmp_path):
    ck = ParquetCheckpoint(spark, str(tmp_path), "r2")
    ck.write("s", spark.range(10))
    import shutil

    shutil.rmtree(ck.meta_path("s"))
    assert not ck.is_complete("s")  # torn write → stage recomputed on resume


def test_iceberg_checkpoint_requires_catalog(spark):
    with pytest.raises(RuntimeError, match="no Spark catalog"):
        IcebergCheckpoint(spark, "icecat", "er", "r1")


def test_empty_stage_is_complete(spark, tmp_path):
    """A legitimately EMPTY stage (e.g. edges when nothing matched) must
    count as complete — sum(rows_out) over empty lineage is NULL, and the
    r1 NULL != 0 comparison forced every downstream stage to recompute on
    each resume (ADVICE r1)."""
    ck = ParquetCheckpoint(spark, str(tmp_path), "r3")
    empty = spark.range(1).filter(F.col("id") < 0).withColumnRenamed("id", "record_id")
    ck.write("edges", empty)
    assert ck.read("edges").count() == 0
    assert ck.is_complete("edges")
