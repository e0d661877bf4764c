"""bench.py stdout contract (VERDICT r5 #3 / r6 #1): the driver captures
only the last 2,000 chars of stdout, so the ONE line bench prints must be
a self-contained ≤1,900-byte JSON summary; full detail goes to
BENCH_detail_latest.json."""

from __future__ import annotations

import importlib.util
import json
import os

import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def bench():
    spec = importlib.util.spec_from_file_location(
        "bench_mod", os.path.join(_ROOT, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _fake_result(n_queries=80, sections=True):
    r = {
        "metric": "er_pipeline_and_operator_bench",
        "value": 1234.5,
        "unit": "sec",
        "sf": "0.1",
        "queries": {f"query_with_a_long_name_{i:03d}": i * 1.5 for i in range(n_queries)},
        "queries_control_rate": 400000.0,
        "er": {
            "n_pairs": 4018570,
            "pairs_per_sec_32": 105395.3,
            "pairs_per_sec_8": 26582.0,
            "scaling_efficiency": 0.917,
            "control_efficiency": 0.76,
            "efficiency_vs_cpu_control": 1.214,
            "windows": [{"scaling_efficiency": 0.9}] * 2,
        },
    }
    if sections:
        for sec in ("incr_near_dup", "curation", "incr_curation"):
            r[sec] = {f"{sec}_field_{i}": i * 0.333 for i in range(12)}
    return r


def test_summary_fits_budget_and_parses(bench):
    for n in (0, 10, 80, 300):
        line = bench._summary_line(_fake_result(n_queries=n))
        assert len(line) <= bench._SUMMARY_BUDGET
        parsed = json.loads(line)
        assert parsed["metric"] == "er_pipeline_and_operator_bench"
        assert parsed["er"]["efficiency_vs_cpu_control"] == 1.214
        assert "windows" not in parsed["er"]  # headline only on stdout
        assert parsed["queries_n"] == n


def test_summary_on_recorded_r6_artifacts(bench):
    for f in ("BENCH_r06_local5.json", "BENCH_r06_local4.json"):
        path = os.path.join(_ROOT, f)
        if not os.path.exists(path):
            pytest.skip(f"{f} not present")
        line = bench._summary_line(json.load(open(path)))
        assert len(line) <= bench._SUMMARY_BUDGET
        parsed = json.loads(line)
        assert "efficiency_vs_cpu_control" in parsed["er"]
        assert parsed["queries_total_sec"] > 0


def test_summary_degrades_by_dropping_sections_not_er(bench):
    r = _fake_result()
    # blow up the sections so queries alone can't save it
    r["incr_curation"] = {f"k{i}": 1.0 for i in range(400)}
    line = bench._summary_line(r)
    assert len(line) <= bench._SUMMARY_BUDGET
    parsed = json.loads(line)
    assert "er" in parsed and parsed["er"]["n_pairs"] == 4018570


def test_corpus_replicas_distinct_bijections(bench, spark):
    """r7 review find: the 10x-scale replica transform must be a
    NON-IDENTITY letter bijection for every i ≥ 1 (the r6 7-char vowel
    alphabet made i∈{7,8,9} the identity — 30 % of the '10x' corpus was
    byte-identical to replica 0, inflating exact-dup density)."""
    n = len(bench._REPLICA_SUBST)
    assert n >= 10, "need at least 10 distinct rotations"
    assert len(set(bench._REPLICA_SUBST)) == n, "alphabet letters must be distinct"
    docs = spark.createDataFrame(
        [(1, "the quick onshore dilutions chatter")], "doc_id long, text string"
    )
    texts = [
        bench._corpus_replica(docs, i).collect()[0].text for i in range(10)
    ]
    assert texts[0] == "the quick onshore dilutions chatter"  # i=0 identity
    assert len(set(texts)) == 10, "every replica must be pairwise distinct"
