"""Prefix-filtered set-similarity join (operators/ssjoin.py).

The load-bearing property is COMPLETENESS — the prefix filter must drop
no pair with Jaccard >= t — so every test compares against a plain
brute-force O(n²) reference over the same sets. Random corpora are
generated with small vocabularies on purpose: heavy set overlap is the
regime where a buggy prefix length actually loses pairs."""

from __future__ import annotations

import itertools
import random

import pytest

from dig_entity_resolution_spark.operators.ssjoin import ssjoin_jaccard


def brute_force(sets: dict[int, set], t: float) -> dict[tuple[int, int], float]:
    out = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        sa, sb = sets[a], sets[b]
        if not sa or not sb:
            continue
        jac = len(sa & sb) / len(sa | sb)
        if jac >= t:
            out[(a, b)] = round(jac, 6)
    return out


def _run(spark, sets: dict[int, set], t: float) -> dict[tuple[int, int], float]:
    df = spark.createDataFrame(
        [(i, sorted(s)) for i, s in sets.items()],
        "record_id long, tokens array<string>",
    )
    rows = ssjoin_jaccard(df, t).collect()
    return {(r.id1, r.id2): r.jaccard for r in rows}


@pytest.mark.parametrize("seed,t", [(0, 0.5), (1, 0.3), (2, 0.7), (3, 0.9)])
def test_matches_brute_force_random(spark, seed, t):
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(40)]  # small vocab → dense overlap
    sets = {
        i: set(rng.sample(vocab, rng.randint(1, 15))) for i in range(60)
    }
    assert _run(spark, sets, t) == brute_force(sets, t)


def test_zipf_vocab_matches_brute_force(spark):
    """Zipf-weighted draws: hot tokens everywhere — the regime the
    rarity-ordered prefix is designed for. Same answer required."""
    rng = random.Random(99)
    vocab = [f"w{i}" for i in range(100)]
    weights = [1.0 / (i + 1) for i in range(100)]
    sets = {
        i: set(rng.choices(vocab, weights=weights, k=rng.randint(2, 20)))
        for i in range(80)
    }
    t = 0.4
    assert _run(spark, sets, t) == brute_force(sets, t)


def test_threshold_one_is_exact_duplicates(spark):
    sets = {
        1: {"a", "b", "c"},
        2: {"a", "b", "c"},
        3: {"a", "b"},
        4: {"x"},
        5: {"x"},
    }
    got = _run(spark, sets, 1.0)
    assert got == {(1, 2): 1.0, (4, 5): 1.0}


def test_duplicate_tokens_and_empty_sets(spark):
    df = spark.createDataFrame(
        [(1, ["a", "a", "b"]), (2, ["b", "a"]), (3, [])],
        "record_id long, tokens array<string>",
    )
    rows = ssjoin_jaccard(df, 0.5).collect()
    assert {(r.id1, r.id2): r.jaccard for r in rows} == {(1, 2): 1.0}


def test_boundary_threshold_inclusive(spark):
    # |{a,b} ∩ {b,c}| / |{a,b,c}| = 1/3; J({a,b},{b}) = 1/2
    sets = {1: {"a", "b"}, 2: {"b"}}
    assert _run(spark, sets, 0.5) == {(1, 2): 0.5}
    assert _run(spark, sets, 0.5001) == {}


def test_prefix_length_float_boundary(spark):
    """ADVICE r7 (high): floor((1-t)*sz) under 0.8/0.9 thresholds sits one
    short of the exact sz - ceil(t*sz) for sz a multiple of 5 (resp. 10)
    because 1-t has no exact float representation — the short prefix
    silently dropped qualifying pairs. x of size 5 vs x minus its rarest
    token has J exactly 0.8 and MUST pair at t=0.8 (and the sz=10 twin at
    t=0.9)."""
    sets = {1: {"a", "b", "c", "d", "e"}, 2: {"b", "c", "d", "e"}}
    assert _run(spark, sets, 0.8) == {(1, 2): 0.8}
    sets10 = {1: {f"t{i}" for i in range(10)}, 2: {f"t{i}" for i in range(1, 10)}}
    assert _run(spark, sets10, 0.9) == {(1, 2): 0.9}


def test_invalid_threshold_raises(spark):
    df = spark.createDataFrame([(1, ["a"])], "record_id long, tokens array<string>")
    for bad in (0.0, -0.1, 1.5):
        with pytest.raises(ValueError, match="threshold"):
            ssjoin_jaccard(df, bad)


def test_plan_has_no_python_and_two_scans(spark):
    """The whole operator must stay JVM-side: no BatchEvalPython /
    ArrowEvalPython / mapInPandas nodes anywhere in the plan."""
    df = spark.createDataFrame(
        [(i, [f"w{j}" for j in range(i % 5 + 1)]) for i in range(20)],
        "record_id long, tokens array<string>",
    )
    plan = ssjoin_jaccard(df, 0.5)._jdf.queryExecution().executedPlan().toString()
    for bad in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert bad not in plan, plan


# ---------------------------------------------------------------------------
# delta-restricted form + "similarity_join" pipeline strategy
# ---------------------------------------------------------------------------


def test_touching_equals_brute_force_restriction(spark):
    from dig_entity_resolution_spark.operators.ssjoin import (
        ssjoin_jaccard_touching,
    )

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(30)]
    sets = {i: set(rng.sample(vocab, rng.randint(1, 12))) for i in range(50)}
    delta = {i for i in sets if i % 5 == 0}
    df = spark.createDataFrame(
        [(i, sorted(s)) for i, s in sets.items()],
        "record_id long, tokens array<string>",
    )
    ddf = spark.createDataFrame([(i,) for i in delta], "record_id long")
    t = 0.4
    rows = ssjoin_jaccard_touching(df, ddf, t).collect()
    got = {(r.id1, r.id2): r.jaccard for r in rows}
    want = {
        p: j for p, j in brute_force(sets, t).items()
        if p[0] in delta or p[1] in delta
    }
    assert got == want


def test_e2e_f1_with_similarity_join_only(spark, tmp_path):
    """similarity_join as the SOLE strategy: exact shingle-Jaccard recall
    must reconstruct the planted clusters (F1 == 1.0) — candidate pairs
    come only from the prefix-filtered join, no inverted index at all."""
    from dig_entity_resolution_spark.plans.pipeline import ERConfig, ERPipeline
    from dig_entity_resolution_spark.synth import generate_corpus

    paths = generate_corpus(
        str(tmp_path / "corpus"), n_clusters=12, cluster_size=3,
        n_singletons=40, seed=11,
    )
    pages = spark.read.parquet(paths["pages"])
    cfg = ERConfig(strategies=("similarity_join",), ssjoin_t=0.3)
    pipe = ERPipeline(spark, str(tmp_path / "wh"), "sj", cfg)
    clusters = pipe.run(pages)
    labels = spark.read.parquet(paths["labels"])
    prf = pipe.evaluate(clusters, labels).collect()[0]
    assert prf.f1 >= 0.99, prf.asDict()


def test_incremental_similarity_join_equals_batch(spark, tmp_path):
    """The order-invariance claim, checked end-to-end: split the corpus,
    run base + incremental with similarity_join enabled, and require
    cluster-identical output vs the from-scratch run over everything."""
    from pyspark.sql import functions as F
    from dig_entity_resolution_spark.plans.pipeline import ERConfig, ERPipeline
    from dig_entity_resolution_spark.synth import generate_corpus

    paths = generate_corpus(
        str(tmp_path / "corpus"), n_clusters=10, cluster_size=3,
        n_singletons=30, seed=13,
    )
    pages = spark.read.parquet(paths["pages"])
    cfg = ERConfig(strategies=("token", "similarity_join"), ssjoin_t=0.3)
    wh = str(tmp_path / "wh")

    full = ERPipeline(spark, wh, "full", cfg).run(pages)
    full_rows = sorted((r.record_id, r.cluster_id) for r in full.collect())

    part_a = pages.filter(F.pmod(F.xxhash64("url"), F.lit(2)) == 0)
    part_b = pages.filter(F.pmod(F.xxhash64("url"), F.lit(2)) == 1)
    ERPipeline(spark, wh, "base", cfg).run(part_a)
    incr = ERPipeline(spark, wh, "incr", cfg)
    merged = incr.run_incremental(part_b, "base")
    got = sorted((r.record_id, r.cluster_id) for r in merged.collect())
    assert got == full_rows


# ---------------------------------------------------------------------------
# exact all-pairs cosine join
# ---------------------------------------------------------------------------


def cos_brute(vecs: dict[int, dict[str, float]], t: float):
    import math

    out = {}
    for a, b in itertools.combinations(sorted(vecs), 2):
        va, vb = vecs[a], vecs[b]
        na = math.sqrt(sum(x * x for x in va.values()))
        nb = math.sqrt(sum(x * x for x in vb.values()))
        if na == 0 or nb == 0:
            continue
        dot = sum(va[k] * vb.get(k, 0.0) for k in va) / (na * nb)
        if dot >= t:
            out[(a, b)] = round(dot, 6)
    return out


def _run_cos(spark, vecs, t):
    from dig_entity_resolution_spark.operators.ssjoin import cosine_ssjoin

    rows = [(i, k, w) for i, v in vecs.items() for k, w in v.items()]
    df = spark.createDataFrame(
        rows, "record_id long, term string, weight double"
    )
    got = cosine_ssjoin(df, t).collect()
    return {(r.id1, r.id2): r.cosine for r in got}


@pytest.mark.parametrize("seed,t", [(0, 0.8), (1, 0.5), (2, 0.95)])
def test_cosine_matches_brute_force_random(spark, seed, t):
    rng = random.Random(seed)
    vocab = [f"d{i}" for i in range(25)]
    vecs = {
        i: {k: rng.uniform(0.1, 3.0)
            for k in rng.sample(vocab, rng.randint(1, 10))}
        for i in range(60)
    }
    assert _run_cos(spark, vecs, t) == cos_brute(vecs, t)


def test_cosine_negative_weights_still_complete(spark):
    """The Cauchy-Schwarz bound is sign-agnostic; completeness must hold
    with mixed-sign weights too."""
    rng = random.Random(5)
    vocab = [f"d{i}" for i in range(15)]
    vecs = {
        i: {k: rng.uniform(-2.0, 3.0)
            for k in rng.sample(vocab, rng.randint(1, 8))}
        for i in range(40)
    }
    t = 0.6
    assert _run_cos(spark, vecs, t) == cos_brute(vecs, t)


def test_cosine_identical_vectors_and_zero_norm(spark):
    vecs = {1: {"a": 2.0, "b": 1.0}, 2: {"a": 4.0, "b": 2.0},
            3: {"c": 0.0}, 4: {"c": 0.0}}
    got = _run_cos(spark, vecs, 0.9)
    assert got == {(1, 2): 1.0}  # colinear → cos 1; zero-norm never pairs


def test_cosine_orthogonal_never_pair(spark):
    vecs = {1: {"a": 1.0}, 2: {"b": 1.0}}
    assert _run_cos(spark, vecs, 0.1) == {}


# ---------------------------------------------------------------------------
# hypothesis property tests (adversarial set shapes)
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    data=st.lists(
        st.lists(st.sampled_from("abcdefgh"), min_size=0, max_size=6),
        min_size=2,
        max_size=14,
    ),
    t=st.sampled_from([0.25, 0.5, 0.75, 1.0]),
)
def test_jaccard_property_matches_brute_force(spark, data, t):
    """Tiny alphabet + tiny sets: maximal overlap density, every boundary
    (identical sets, singletons, empties, subset chains) reachable."""
    sets = {i: set(s) for i, s in enumerate(data)}
    assert _run(spark, sets, t) == brute_force(sets, t)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    data=st.lists(
        st.dictionaries(
            st.sampled_from("abcde"),
            st.floats(
                min_value=-2.0, max_value=4.0,
                allow_nan=False, allow_infinity=False,
            ),
            min_size=0,
            max_size=4,
        ),
        min_size=2,
        max_size=10,
    ),
    t=st.sampled_from([0.3, 0.8]),
)
def test_cosine_property_matches_brute_force(spark, data, t):
    vecs = {i: v for i, v in enumerate(data)}
    assert _run_cos(spark, vecs, t) == cos_brute(vecs, t)
