"""B-cubed / ARI clustering metrics (operators/evaluate.py
clustering_metrics). Expected values hand-computed from the
contingency-cell definitions."""

import pytest
from pyspark.sql import functions as F

from dig_entity_resolution_spark.operators.evaluate import clustering_metrics


def _df(spark, assign):
    return spark.createDataFrame(
        [(i, c) for i, c in assign], "record_id long, cluster_id long"
    )


def _truth(spark, assign):
    return spark.createDataFrame(
        [(i, c) for i, c in assign], "record_id long, label_id long"
    )


def _one(df):
    return df.collect()[0]


def test_hand_computed_example(spark):
    # truth {1,2,3},{4,5},{6}; pred {1,2},{3,4,5},{6}
    pred = _df(spark, [(1, 1), (2, 1), (3, 3), (4, 3), (5, 3), (6, 6)])
    truth = _truth(spark, [(1, 1), (2, 1), (3, 1), (4, 4), (5, 4), (6, 6)])
    r = _one(clustering_metrics(pred, truth))
    assert r.n == 6
    assert r.n_pred_clusters == 3 and r.n_true_clusters == 3
    # sum nij^2/ai = 4/2 + 1/3 + 4/3 + 1 = 14/3 -> /6 = 7/9
    assert r.bcubed_p == pytest.approx(0.777778, abs=1e-6)
    assert r.bcubed_r == pytest.approx(0.777778, abs=1e-6)
    assert r.bcubed_f1 == pytest.approx(0.777778, abs=1e-6)
    # sij=2 sa=4 sb=4 tot=15: (2 - 16/15) / (4 - 16/15) = 0.318182
    assert r.ari == pytest.approx(0.318182, abs=1e-6)


def test_identical_partitions_perfect(spark):
    assign = [(i, i // 3) for i in range(12)]
    r = _one(clustering_metrics(_df(spark, assign), _truth(spark, assign)))
    assert (r.bcubed_p, r.bcubed_r, r.bcubed_f1, r.ari) == (1.0, 1.0, 1.0, 1.0)


def test_all_singletons_vs_one_cluster(spark):
    n = 8
    pred = _df(spark, [(i, i) for i in range(n)])
    truth = _truth(spark, [(i, 0) for i in range(n)])
    r = _one(clustering_metrics(pred, truth))
    assert r.bcubed_p == 1.0
    assert r.bcubed_r == pytest.approx(1 / n, abs=1e-6)
    assert r.ari == 0.0  # sij = 0 and expected index = 0


def test_both_singletons_ari_defined(spark):
    pred = _df(spark, [(i, i) for i in range(5)])
    truth = _truth(spark, [(i, i + 100) for i in range(5)])
    r = _one(clustering_metrics(pred, truth))
    # identical (all-singleton) partitions: denominator 0 -> defined as 1
    assert (r.bcubed_p, r.bcubed_r, r.ari) == (1.0, 1.0, 1.0)


def test_missing_records_inner_join(spark):
    pred = _df(spark, [(1, 1), (2, 1), (3, 3)])
    truth = _truth(spark, [(1, 1), (2, 1), (9, 9)])
    r = _one(clustering_metrics(pred, truth))
    assert r.n == 2
    assert r.bcubed_r == 1.0  # both surviving records share both clusters


def test_plan_native(spark):
    assign = [(i, i // 3) for i in range(12)]
    plan = (
        clustering_metrics(_df(spark, assign), _truth(spark, assign))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for bad in ("ArrowEvalPython", "BatchEvalPython", "CartesianProduct"):
        assert bad not in plan, bad
