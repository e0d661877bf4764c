"""Connected components vs a pure-Python union-find oracle on random graphs."""

from __future__ import annotations

import random

import pytest

from dig_entity_resolution_spark.operators.cluster import (
    cc_propagate,
    connected_components,
)


def _union_find(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # normalize: every node → min node of component
    comp = {}
    for n in nodes:
        comp.setdefault(find(n), []).append(n)
    return {n: min(members) for r, members in comp.items() for n in members}


def _random_graph(seed, n_nodes=60, n_edges=50):
    rng = random.Random(seed)
    nodes = rng.sample(range(1, 10_000), n_nodes)
    edges = []
    for _ in range(n_edges):
        a, b = rng.sample(nodes, 2)
        edges.append((a, b))
    return nodes, edges


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_connected_components_matches_union_find(spark, seed):
    nodes, edges = _random_graph(seed)
    edf = spark.createDataFrame(edges, ["src", "dst"])
    got = {
        r.record_id: r.cluster_id for r in connected_components(edf).collect()
    }
    touched = sorted({x for e in edges for x in e})
    expect = _union_find(edges, touched)
    assert got == {n: expect[n] for n in touched}


def test_cc_propagate_agrees(spark):
    nodes, edges = _random_graph(9, n_nodes=40, n_edges=35)
    edf = spark.createDataFrame(edges, ["src", "dst"])
    a = {r.record_id: r.cluster_id for r in connected_components(edf).collect()}
    b = {r.record_id: r.cluster_id for r in cc_propagate(edf).collect()}
    assert a == b


def test_cc_chain_and_selfloop(spark):
    # long chain (worst case for propagation) + self loop + duplicate edges
    edges = [(i, i + 1) for i in range(1, 15)] + [(5, 5), (1, 2), (2, 1)]
    edf = spark.createDataFrame(edges, ["src", "dst"])
    got = {r.record_id: r.cluster_id for r in connected_components(edf).collect()}
    assert set(got.values()) == {1}
    assert set(got) == set(range(1, 16))


def test_cc_empty(spark):
    edf = spark.createDataFrame([], "src long, dst long")
    assert connected_components(edf).count() == 0


def test_cc_durable_checkpoint_resumes_mid_closure(spark, tmp_path):
    """VERDICT r1 item 8: with a durable checkpoint, a crash between CC
    rounds resumes at the last finished round. Simulated by running the
    closure with max_rounds=1 (writes cc_init + cc_round0, returns
    unconverged), then resuming to convergence — the resumed result must
    equal the single-shot result, and round0's files must not be
    rewritten."""
    import os

    from dig_entity_resolution_spark.plans.checkpoint import ParquetCheckpoint

    edges = [(i, i + 1) for i in range(1, 20)] + [(100, 101), (101, 102)]
    edf = spark.createDataFrame(edges, ["src", "dst"])
    expect = {
        r.record_id: r.cluster_id for r in connected_components(edf).collect()
    }

    ck = ParquetCheckpoint(spark, str(tmp_path), "ccrun")
    connected_components(edf, max_rounds=1, ckpt=ck).collect()  # "crash" here
    r0 = ck.table_path("cc_round0")
    assert os.path.exists(os.path.join(r0, "_SUCCESS"))
    before = {f: os.path.getmtime(os.path.join(r0, f)) for f in os.listdir(r0)}

    resumed = connected_components(edf, ckpt=ck, resume=True)
    got = {r.record_id: r.cluster_id for r in resumed.collect()}
    assert got == expect
    after = {f: os.path.getmtime(os.path.join(r0, f)) for f in os.listdir(r0)}
    assert before == after, "round0 was recomputed on resume"
    # later rounds were written durably during the resumed run
    assert ck.is_complete("cc_round1")


def test_cc_durable_fresh_run_wipes_stale_rounds(spark, tmp_path):
    """A prior run under the same run_id may have converged LATER than the
    current edge set does; its leftover cc_round tables must not be
    fast-forwarded over by a later resume (r2 review: that silently
    returned clusters from the OLD edge set)."""
    from dig_entity_resolution_spark.plans.checkpoint import ParquetCheckpoint

    ck = ParquetCheckpoint(spark, str(tmp_path), "cc_stale")
    # run A: long chain → converges after several rounds
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 25)], ["src", "dst"]
    )
    connected_components(chain, ckpt=ck).collect()
    assert ck.is_complete("cc_round1")  # multiple rounds were written
    # run B (fresh, same run_id): tiny disjoint edge set, converges round 0
    tiny = spark.createDataFrame([(100, 101)], ["src", "dst"])
    got_b = {
        r.record_id: r.cluster_id
        for r in connected_components(tiny, ckpt=ck).collect()
    }
    assert got_b == {100: 100, 101: 100}
    # resume must reproduce run B, not fast-forward into run A's leftovers
    resumed = {
        r.record_id: r.cluster_id
        for r in connected_components(tiny, ckpt=ck, resume=True).collect()
    }
    assert resumed == got_b


def test_cc_durable_equals_local_checkpoint(spark, tmp_path):
    from dig_entity_resolution_spark.plans.checkpoint import ParquetCheckpoint

    nodes, edges = _random_graph(4)
    edf = spark.createDataFrame(edges, ["src", "dst"])
    local = {r.record_id: r.cluster_id for r in connected_components(edf).collect()}
    ck = ParquetCheckpoint(spark, str(tmp_path), "ccd")
    durable = {
        r.record_id: r.cluster_id
        for r in connected_components(edf, ckpt=ck).collect()
    }
    assert local == durable


def test_cc_durable_wipes_rounds_beyond_smaller_budget(spark, tmp_path):
    """ADVICE r2: a prior run with a LARGER max_rounds leaves round tables
    that this run's range(max_rounds) never visits. The fresh-run wipe must
    go by LISTING the disk — otherwise an unconverged small-budget run
    followed by resume=True could fast-forward contiguously across the
    budget boundary into complete round tables from the OLD edge set."""
    from dig_entity_resolution_spark.plans.checkpoint import ParquetCheckpoint

    ck = ParquetCheckpoint(spark, str(tmp_path), "cc_budget")
    # plant a stale round table far beyond the next run's budget
    stale = spark.createDataFrame([(999, 1000)], ["src", "dst"])
    ck.write("cc_round7", stale)
    assert ck.is_complete("cc_round7")
    tiny = spark.createDataFrame([(1, 2)], ["src", "dst"])
    got = {
        r.record_id: r.cluster_id
        for r in connected_components(tiny, ckpt=ck, max_rounds=3).collect()
    }
    assert got == {1: 1, 2: 1}
    assert "cc_round7" not in ck.list_stages("cc_round")
    assert not ck.is_complete("cc_round7")


def test_cc_warm_start_from_star_edges_converges_faster(spark):
    """The incremental pipeline warm-starts CC from the base run's
    converged star edges ∪ new edges (VERDICT r2 item 2). Components must
    be identical to running over the raw old ∪ new edge list, in strictly
    fewer rounds — the measured round-count drop on a long chain whose
    from-scratch closure needs O(log n) rounds."""
    old = [(i, i + 1) for i in range(1, 40)]
    new = [(40, 41)]
    scratch_stats: dict = {}
    scratch = {
        r.record_id: r.cluster_id
        for r in connected_components(
            spark.createDataFrame(old + new, ["src", "dst"]),
            stats=scratch_stats,
        ).collect()
    }
    star = [(1, i) for i in range(2, 41)]  # the converged base closure
    warm_stats: dict = {}
    warm = {
        r.record_id: r.cluster_id
        for r in connected_components(
            spark.createDataFrame(star + new, ["src", "dst"]),
            stats=warm_stats,
        ).collect()
    }
    assert warm == scratch
    assert warm_stats["rounds"] < scratch_stats["rounds"], (
        warm_stats,
        scratch_stats,
    )
