"""DSIR importance resampling (functions/dsir.py).

Pins: serial == distributed raw-pool fit; Spark scorer == pure-Python
twin (hash collisions included); prose docs outrank boilerplate under
the default target; Gumbel resampling is a pure function of (corpus,
salt); NULL text raises in-plan.
"""

from __future__ import annotations

import pytest

from dig_entity_resolution_spark.functions.dsir import (
    DIM,
    DsirWeights,
    _counts_py,
    default_target_texts,
    dsir_resample_gumbel,
    dsir_score_docs,
    dsir_score_py,
    dsir_select_frac,
    dsir_select_topk,
    fit_dsir_weights,
    raw_counts_distributed,
    raw_counts_serial,
)

COLS = ["doc_id", "text"]


# the session-scoped `spark` fixture comes from tests/conftest.py — a
# module-local fixture calling s.stop() would kill the getOrCreate-shared
# session for every module after this one (r6 review: exactly that took
# down 134 later tests in the full-suite run while each module passed
# alone)


@pytest.fixture(scope="module")
def weights():
    raw = raw_counts_serial("/root/testdata/sf0.001/documents.parquet")
    return fit_dsir_weights(_counts_py(default_target_texts(), DIM), raw)


def test_distributed_fit_equals_serial(spark):
    path = "/root/testdata/sf0.001/documents.parquet"
    serial = raw_counts_serial(path)
    dist = raw_counts_distributed(spark.read.parquet(path))
    assert dist == serial


def test_spark_scorer_equals_python_twin(spark, weights):
    rows = [
        (1, "the market research report and the climate study"),
        (2, "login register cart checkout buy now free shipping"),
        (3, "a b c a b c a b c"),
        (4, ""),
        (5, "single"),
    ]
    got = {
        r["doc_id"]: (r["n_grams"], r["logratio_micro"])
        for r in dsir_score_docs(
            spark.createDataFrame(rows, COLS), weights
        ).collect()
    }
    for doc_id, text in rows:
        assert got[doc_id] == dsir_score_py(text, weights), doc_id


def test_prose_outranks_boilerplate(spark, weights):
    prose = [
        (i, "the climate research report and the market study with evidence")
        for i in range(10)
    ]
    boiler = [
        (i + 100, "login register cart checkout privacy terms click here buy")
        for i in range(10)
    ]
    df = spark.createDataFrame(prose + boiler, COLS)
    picked = {r["doc_id"] for r in dsir_select_topk(df, weights, 10).collect()}
    assert picked == {i for i in range(10)}


def test_gumbel_resample_deterministic_and_salt_sensitive(spark, weights):
    rows = [(i, f"market research study {i} evidence report theory") for i in range(60)]
    df = spark.createDataFrame(rows, COLS)
    a1 = [r["doc_id"] for r in dsir_resample_gumbel(df, weights, 20, salt="s1").collect()]
    a2 = [r["doc_id"] for r in dsir_resample_gumbel(df, weights, 20, salt="s1").collect()]
    b = [r["doc_id"] for r in dsir_resample_gumbel(df, weights, 20, salt="s2").collect()]
    assert a1 == a2
    assert len(a1) == 20
    assert set(a1) != set(b)


def test_gumbel_temperature_zero_limit_matches_greedy(spark, weights):
    # distinct weights dominate the noise at tiny temperature
    rows = [
        (1, "the market research report and the climate study with evidence"),
        (2, "market research climate"),
        (3, "login register cart checkout"),
        (4, "privacy terms click here buy now"),
    ]
    df = spark.createDataFrame(rows, COLS)
    greedy = {r["doc_id"] for r in dsir_select_topk(df, weights, 2).collect()}
    cold = {
        r["doc_id"]
        for r in dsir_resample_gumbel(df, weights, 2, temperature=1e-6).collect()
    }
    assert cold == greedy


def test_gumbel_rejects_nonpositive_temperature(spark, weights):
    df = spark.createDataFrame([(1, "a")], COLS)
    with pytest.raises(ValueError, match="temperature"):
        dsir_resample_gumbel(df, weights, 1, temperature=0.0)


def test_null_text_raises(spark, weights):
    df = spark.createDataFrame([(1, None)], "doc_id: bigint, text: string")
    with pytest.raises(Exception, match="NULL text"):
        dsir_score_docs(df, weights).collect()


def test_empty_doc_scores_zero(spark, weights):
    got = dsir_score_docs(
        spark.createDataFrame([(1, "")], COLS), weights
    ).collect()[0]
    assert (got["n_grams"], got["logratio_micro"]) == (0, 0)


def test_weights_are_micro_log_ratios():
    wt = fit_dsir_weights([3, 0], [0, 3], dim=2)
    assert isinstance(wt, DsirWeights)
    # bucket 0: target-heavy => positive; bucket 1: raw-heavy => negative
    assert wt.w[0] > 0 > wt.w[1]
    # symmetric counts => symmetric weights
    assert wt.w[0] == -wt.w[1]


def test_select_frac_thresholds_without_sort(spark, weights):
    # varied lengths -> distinct scores; a constant text would tie every
    # doc and the >= threshold would (correctly) keep the whole plateau
    rows = [
        (i, "market " * (i % 7 + 1) + f"research study {i} evidence report")
        for i in range(50)
    ]
    df = spark.createDataFrame(rows, COLS)
    out = dsir_select_frac(df, weights, 0.4)
    got = out.collect()
    # ~40% kept, within approx-quantile rank tolerance + residual ties
    assert 10 <= len(got) <= 32
    # every kept score >= every dropped score (threshold semantics)
    kept = {r["doc_id"] for r in got}
    scores = {
        r["doc_id"]: r["logratio_micro"]
        for r in dsir_score_docs(df, weights).collect()
    }
    lo_kept = min(scores[i] for i in kept)
    hi_drop = max(
        (scores[i] for i in scores if i not in kept), default=lo_kept
    )
    assert lo_kept >= hi_drop
    # no Sort / TakeOrdered in the selection plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrdered" not in plan and "Sort" not in plan
    # full-keep passthrough
    assert dsir_select_frac(df, weights, 1.0).count() == 50
    with pytest.raises(ValueError, match="keep_frac"):
        dsir_select_frac(df, weights, 0.0)


def test_weights_for_falls_back_when_fixture_unreadable(monkeypatch, spark):
    """ADVICE r6 #3: when the oracle fixture is unreadable `_dsir_weights()`
    is None (rows-only mode); `_dsir_weights_for` must fit on sf_dir docs
    instead, so q_dsir_select still runs rather than crashing on None.w."""
    from dig_entity_resolution_spark import queries

    monkeypatch.setattr(queries, "_dsir_weights", lambda: None)
    sf_dir = "/root/testdata/sf0.001"
    wt = queries._dsir_weights_for(sf_dir)
    assert isinstance(wt, DsirWeights) and wt.dim == DIM
    rows = queries.q_dsir_select(spark, sf_dir).limit(5).collect()
    assert len(rows) == 5 and all(r.record_id is not None for r in rows)
