from __future__ import annotations

import pytest

from dig_entity_resolution_spark.operators.calibrate import calibrate_threshold


def test_calibrate_separable(spark):
    # positives score ≥0.8, negatives ≤0.4 → any τ in (0.4,0.8] gives F1=1
    scored = spark.createDataFrame(
        [(1, 2, 0.95), (3, 4, 0.85), (5, 6, 0.30), (7, 8, 0.40)],
        ["id1", "id2", "score"],
    )
    labels = spark.createDataFrame(
        [(1, 2, True), (3, 4, True), (5, 6, False), (7, 8, False)],
        ["id1", "id2", "label"],
    )
    tau, f1 = calibrate_threshold(scored, labels)
    assert f1 == pytest.approx(1.0)
    assert 0.40 < tau <= 0.85


def test_calibrate_missing_pairs_count_as_nonmatch(spark):
    scored = spark.createDataFrame([(1, 2, 0.9)], ["id1", "id2", "score"])
    labels = spark.createDataFrame(
        [(1, 2, True), (9, 10, False)], ["id1", "id2", "label"]
    )
    tau, f1 = calibrate_threshold(scored, labels)
    assert f1 == pytest.approx(1.0)  # missing negative pair is a correct reject


def test_calibrate_prefers_recall_precision_balance(spark):
    # one positive at 0.6, one negative at 0.7: perfect separation impossible
    scored = spark.createDataFrame(
        [(1, 2, 0.6), (3, 4, 0.7)], ["id1", "id2", "score"]
    )
    labels = spark.createDataFrame(
        [(1, 2, True), (3, 4, False)], ["id1", "id2", "label"]
    )
    tau, f1 = calibrate_threshold(scored, labels)
    assert f1 == pytest.approx(2 / 3)  # keep both (tp=1, fp=1) beats dropping both
