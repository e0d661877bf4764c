"""Column-tree memoization (functions/colcache.py, r7): pinned-artifact
expression trees are rebuilt at most once per (artifact identity, input
expression) — the recurring-batch constant VERDICT r6 #1 charged to
re-construction — and never served across artifact identities."""

from __future__ import annotations

from pyspark.sql import functions as F

from dig_entity_resolution_spark.functions import colcache
from dig_entity_resolution_spark.functions.colcache import cached_col


def test_same_key_returns_same_tree(spark):
    art = ("artifact",)
    calls = []

    def build():
        calls.append(1)
        return F.lit(1) + F.lit(2)

    c1 = cached_col("t", (art,), ("x",), build)
    c2 = cached_col("t", (art,), ("x",), build)
    assert c1 is c2 and len(calls) == 1
    # different extra → rebuild
    c3 = cached_col("t", (art,), ("y",), build)
    assert c3 is not c1 and len(calls) == 2


def test_identity_keyed_not_value_keyed(spark):
    a1, a2 = [1, 2, 3], [1, 2, 3]  # equal values, distinct objects
    c1 = cached_col("t2", (a1,), (), lambda: F.lit(1))
    c2 = cached_col("t2", (a2,), (), lambda: F.lit(1))
    assert c1 is not c2


def test_lm_and_dsir_columns_memoized(spark):
    from dig_entity_resolution_spark.functions.dsir import (
        DIM,
        _counts_py,
        dsir_logratio_micro,
        default_target_texts,
        fit_dsir_weights,
        raw_counts_serial,
    )
    from dig_entity_resolution_spark.functions.lm import (
        fit_stupid_backoff,
        lm_logprob_micro,
    )

    lm = fit_stupid_backoff("/root/testdata/sf0.001/documents.parquet")
    assert lm_logprob_micro("text", lm) is lm_logprob_micro("text", lm)
    wt = fit_dsir_weights(
        _counts_py(default_target_texts(), DIM),
        raw_counts_serial("/root/testdata/sf0.001/documents.parquet"),
    )
    assert dsir_logratio_micro("text", wt) is dsir_logratio_micro("text", wt)
    # the cached tree evaluates correctly when reused across DataFrames
    d1 = spark.createDataFrame([("alpha beta gamma",)], "text string")
    d2 = spark.createDataFrame([("alpha beta gamma",)], "text string")
    s = lm_logprob_micro("text", lm)
    r1 = d1.select(s["logp_micro"].alias("v")).collect()[0].v
    r2 = d2.select(s["logp_micro"].alias("v")).collect()[0].v
    assert r1 == r2


def test_cache_bounded(spark):
    colcache._CACHE.clear()
    sentinels = [object() for _ in range(colcache._MAX + 5)]
    for i, s in enumerate(sentinels):
        cached_col("bound", (s,), (i,), lambda: F.lit(1))
    assert len(colcache._CACHE) <= colcache._MAX


def test_bound_columns_never_cached(spark):
    """A DataFrame-bound column carries resolved attribute ids legal only
    against its own DataFrame — caching one would poison later same-named
    unresolved callers with a MISSING_ATTRIBUTES failure. Bound inputs
    must bypass the cache entirely."""
    from dig_entity_resolution_spark.functions.lm import (
        fit_stupid_backoff,
        lm_logprob_micro,
    )

    lm = fit_stupid_backoff("/root/testdata/sf0.001/documents.parquet")
    d1 = spark.createDataFrame([("alpha beta",)], "text string")
    d2 = spark.createDataFrame([("alpha beta",)], "text string")
    bound = lm_logprob_micro(d1["text"], lm)  # bound input: no cache entry
    named = lm_logprob_micro("text", lm)
    assert bound is not named
    # the name-keyed tree still works on BOTH DataFrames afterwards
    v1 = d1.select(named["logp_micro"].alias("v")).collect()[0].v
    v2 = d2.select(named["logp_micro"].alias("v")).collect()[0].v
    assert v1 == v2
