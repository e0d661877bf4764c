"""Meta-blocking (Papadakis et al. TKDE 2014) and survivorship /
golden-record consolidation — hand-checkable graphs, pruning semantics,
tie determinism, and rule behavior."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from dig_entity_resolution_spark.operators.meta_blocking import (
    blocking_graph,
    cnp,
    meta_blocked_pairs,
    wep,
    wnp,
)
from dig_entity_resolution_spark.operators.survivorship import golden_records


def _blocks(spark):
    """Hand graph: records 1,2 share 3 blocks (strong); 1,3 and 2,3 share
    1 block each (weak); 4 only ever co-occurs with 3 (1 block)."""
    rows = [
        ("a", 1), ("a", 2),
        ("b", 1), ("b", 2),
        ("c", 1), ("c", 2), ("c", 3),
        ("d", 3), ("d", 4),
    ]
    return spark.createDataFrame(rows, "block_key string, record_id long")


def _edges(df):
    return {(r.id1, r.id2): r.w for r in df.collect()}


def test_blocking_graph_cbs(spark):
    w = _edges(blocking_graph(_blocks(spark), "cbs"))
    assert w == {(1, 2): 3, (1, 3): 1, (2, 3): 1, (3, 4): 1}


def test_blocking_graph_js(spark):
    # |B1|=3 |B2|=3 |B3|=2 |B4|=1
    w = _edges(blocking_graph(_blocks(spark), "js"))
    assert w[(1, 2)] == pytest.approx(3 / (3 + 3 - 3))
    assert w[(1, 3)] == pytest.approx(1 / (3 + 2 - 1))
    assert w[(3, 4)] == pytest.approx(1 / (2 + 1 - 1))


def test_blocking_graph_ecbs(spark):
    # 4 distinct blocks total
    w = _edges(blocking_graph(_blocks(spark), "ecbs"))
    assert w[(1, 2)] == pytest.approx(3 * math.log10(4 / 3) ** 2)
    assert w[(3, 4)] == pytest.approx(
        math.log10(4 / 2) * math.log10(4 / 1)
    )


def test_blocking_graph_rejects_unknown_scheme(spark):
    with pytest.raises(ValueError, match="scheme"):
        blocking_graph(_blocks(spark), "tfidf")


def test_wep_keeps_at_or_above_mean(spark):
    # weights 3,1,1,1 → mean 1.5: only (1,2) survives
    kept = _edges(wep(blocking_graph(_blocks(spark), "cbs")))
    assert kept == {(1, 2): 3}


def test_wep_mean_boundary_is_kept(spark):
    # all-equal weights: every edge sits exactly ON the mean — all kept
    rows = [("a", 1), ("a", 2), ("b", 3), ("b", 4)]
    blocks = spark.createDataFrame(rows, "block_key string, record_id long")
    kept = _edges(wep(blocking_graph(blocks, "cbs")))
    assert kept == {(1, 2): 1, (3, 4): 1}


def test_wnp_is_redundancy_positive(spark):
    # node means: 1:(3+1)/2=2, 2:2, 3:(1+1+1)/3=1, 4:1.
    # (1,2) w=3 ≥ both means → kept. (1,3) w=1 < 2 at node 1 but = 1 at
    # node 3 → kept through node 3 (the redundancy-positive OR).
    kept = _edges(wnp(blocking_graph(_blocks(spark), "cbs")))
    assert set(kept) == {(1, 2), (1, 3), (2, 3), (3, 4)}


def test_cnp_top_k_either_endpoint(spark):
    # k=1: node 1 keeps (1,2); node 3's best is (1,3) by the v-asc
    # tie-break over {(1,3),(2,3),(3,4)} all w=1; node 4 keeps (3,4).
    kept = _edges(cnp(blocking_graph(_blocks(spark), "cbs"), k=1))
    assert set(kept) == {(1, 2), (1, 3), (3, 4)}


def test_cnp_rejects_bad_k(spark):
    with pytest.raises(ValueError, match="k must be"):
        cnp(blocking_graph(_blocks(spark), "cbs"), k=0)


def test_meta_blocked_pairs_prunes_weak_evidence(spark):
    got = {
        (r.id1, r.id2)
        for r in meta_blocked_pairs(_blocks(spark), "cbs", "wep").collect()
    }
    assert got == {(1, 2)}
    with pytest.raises(ValueError, match="pruning"):
        meta_blocked_pairs(_blocks(spark), "cbs", "prune-harder")


# -- survivorship -------------------------------------------------------------


def _members(spark):
    rows = [
        # cluster 10: majority lang 'en' (2 vs 1), longest name 'charlie'
        (1, "en", "alice", 5),
        (2, "en", "charlie", 3),
        (3, "fr", "bob", 9),
        # cluster 20: lang tie en/fr 1-1 → 'en' by value asc;
        # name-length tie bob/eve → 'bob' by value asc
        (4, "fr", "bob", 7),
        (5, "en", "eve", 2),
        # cluster 30: singleton with NULL lang
        (6, None, "solo", 4),
    ]
    recs = spark.createDataFrame(
        rows, "record_id long, lang string, name string, score long"
    )
    assign = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 10), (4, 20), (5, 20), (6, 30)],
        "record_id long, cluster_id long",
    )
    return recs, assign


def test_golden_records_rules(spark):
    recs, assign = _members(spark)
    out = {
        r.cluster_id: r
        for r in golden_records(
            recs,
            assign,
            rules={"lang": "majority", "name": "longest", "score": "max"},
        ).collect()
    }
    g10, g20, g30 = out[10], out[20], out[30]
    assert (g10.n_members, g10.rep_id) == (3, 1)
    assert (g10.lang, g10.name, g10.score) == ("en", "charlie", 9)
    # ties break by value ascending on both engines' windows
    assert (g20.lang, g20.name) == ("en", "bob")
    # all-NULL majority column stays NULL; singleton keeps its own values
    assert g30.lang is None and g30.name == "solo" and g30.n_members == 1


def test_golden_records_rejects_bad_rules(spark):
    recs, assign = _members(spark)
    with pytest.raises(ValueError, match="unknown survivorship rule"):
        golden_records(recs, assign, rules={"lang": "mode"})
    with pytest.raises(ValueError, match="id_col"):
        golden_records(recs, assign, rules={"record_id": "min"})


def test_golden_records_no_python_in_plan(spark):
    recs, assign = _members(spark)
    plan = golden_records(
        recs, assign, rules={"lang": "majority", "name": "longest"}
    )._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
