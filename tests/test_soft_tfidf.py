"""Soft-TFIDF comparator (operators/scoring.soft_tfidf_scores).

Reference: a plain Python double loop implementing Cohen et al.'s
definition directly (argmax per S-word, L2-normalized TF-IDF weights),
with Jaro-Winkler delegated to DuckDB's jaro_winkler_similarity — the
same scalar the D3 kernel is bit-exact against — so the test checks the
OPERATOR's join/window/aggregation plumbing, not the string kernel."""

from __future__ import annotations

import math
import random
from collections import Counter

import duckdb
import pytest

from dig_entity_resolution_spark.operators.scoring import soft_tfidf_scores

_JW_CACHE: dict[tuple[str, str], float] = {}
_CON = duckdb.connect()


def _jw(a: str, b: str) -> float:
    key = (a, b)
    if key not in _JW_CACHE:
        _JW_CACHE[key] = _CON.execute(
            "SELECT jaro_winkler_similarity(?, ?)", [a, b]
        ).fetchone()[0]
    return _JW_CACHE[key]


def soft_ref(
    recs: dict[int, list[str]],
    pairs: list[tuple[int, int]],
    theta: float,
) -> dict[tuple[int, int], float]:
    n = len(recs)
    tf = {i: Counter(ws) for i, ws in recs.items()}
    df: Counter = Counter()
    for i in tf:
        for w in tf[i]:
            df[w] += 1

    def weight(i: int, w: str) -> float:
        return tf[i][w] * (math.log((n + 1) / (df[w] + 1)) + 1.0)

    def norm(i: int) -> float:
        return math.sqrt(sum(weight(i, w) ** 2 for w in tf[i]))

    out = {}
    for a, b in pairs:
        na, nb = norm(a), norm(b)
        s = 0.0
        if na > 0 and nb > 0:
            for w in sorted(tf[a]):
                best_jw, best_u = 0.0, None
                # iterate u ascending; strict > keeps the SMALLEST u at
                # the max jw — the operator's (jw desc, t2 asc) tie-break
                for u in sorted(tf[b]):
                    jw = _jw(w, u)
                    if jw > theta and jw > best_jw:
                        best_jw, best_u = jw, u
                if best_u is not None:
                    s += (weight(a, w) / na) * (weight(b, best_u) / nb) * best_jw
        out[(a, b)] = round(s, 6)
    return out


def _run(spark, recs, pairs, theta):
    rdf = spark.createDataFrame(
        [(i, ws) for i, ws in recs.items()],
        "record_id long, tokens array<string>",
    )
    pdf = spark.createDataFrame(pairs, "id1 long, id2 long")
    rows = soft_tfidf_scores(pdf, rdf, theta).collect()
    return {(r.id1, r.id2): round(r.soft_tfidf, 6) for r in rows}


def test_identical_records_score_one(spark):
    recs = {1: ["anna", "maria", "lopez"], 2: ["anna", "maria", "lopez"],
            3: ["zzz"]}
    got = _run(spark, recs, [(1, 2)], 0.9)
    assert got == {(1, 2): 1.0}


def test_no_close_words_scores_zero(spark):
    recs = {1: ["alpha"], 2: ["omega"]}
    assert _run(spark, recs, [(1, 2)], 0.9) == {(1, 2): 0.0}


def test_typo_scores_above_plain_cosine(spark):
    """'jon smith' vs 'john smith': exact cosine only credits 'smith';
    soft-TFIDF also credits jon≈john at jw≈0.93."""
    recs = {1: ["jon", "smith"], 2: ["john", "smith"], 3: ["ada", "king"]}
    got = _run(spark, recs, [(1, 2)], 0.9)
    ref = soft_ref(recs, [(1, 2)], 0.9)
    assert got == ref
    assert got[(1, 2)] > 0.9  # both words matched, near-full credit


@pytest.mark.parametrize("seed,theta", [(0, 0.9), (1, 0.85), (2, 0.95)])
def test_matches_reference_random(spark, seed, theta):
    rng = random.Random(seed)
    base = ["anderson", "andersen", "jonson", "johnson", "smith", "smyth",
            "garcia", "garcias", "chen", "cheng", "miller", "muller",
            "lopez", "lopes", "brown", "braun", "lee", "li"]
    recs = {
        i: rng.sample(base, rng.randint(1, 4)) for i in range(30)
    }
    pairs = [(a, b) for a in range(30) for b in range(a + 1, 30)
             if rng.random() < 0.2]
    assert _run(spark, recs, pairs, theta) == soft_ref(recs, pairs, theta)


def test_repeated_tokens_use_tf(spark):
    """tf matters: a word repeated in S carries more weight than once."""
    recs = {1: ["bob", "bob", "cat"], 2: ["bob", "dog"], 3: ["cat"]}
    got = _run(spark, recs, [(1, 2)], 0.9)
    assert got == soft_ref(recs, [(1, 2)], 0.9)


def test_pair_with_empty_side_scores_zero(spark):
    rdf = spark.createDataFrame(
        [(1, ["a"]), (2, [])], "record_id long, tokens array<string>"
    )
    pdf = spark.createDataFrame([(1, 2)], "id1 long, id2 long")
    rows = soft_tfidf_scores(pdf, rdf, 0.9).collect()
    assert [(r.id1, r.id2, r.soft_tfidf) for r in rows] == [(1, 2, 0.0)]


# ---------------------------------------------------------------------------
# Monge-Elkan (same reference infrastructure)
# ---------------------------------------------------------------------------


def me_ref(
    recs: dict[int, list[str]],
    pairs: list[tuple[int, int]],
) -> dict[tuple[int, int], float]:
    out = {}
    for a, b in pairs:
        sa, sb = sorted(set(recs[a])), sorted(set(recs[b]))
        if not sa or not sb:
            out[(a, b)] = 0.0
            continue
        s = sum(max(_jw(w, u) for u in sb) for w in sa) / len(sa)
        out[(a, b)] = round(s, 6)
    return out


def _run_me(spark, recs, pairs):
    from dig_entity_resolution_spark.operators.scoring import (
        monge_elkan_scores,
    )

    rdf = spark.createDataFrame(
        [(i, ws) for i, ws in recs.items()],
        "record_id long, tokens array<string>",
    )
    pdf = spark.createDataFrame(pairs, "id1 long, id2 long")
    rows = monge_elkan_scores(pdf, rdf).collect()
    return {(r.id1, r.id2): round(r.monge_elkan, 6) for r in rows}


def test_monge_elkan_identical_is_one(spark):
    recs = {1: ["anna", "lopez"], 2: ["anna", "lopez"]}
    assert _run_me(spark, recs, [(1, 2)]) == {(1, 2): 1.0}


def test_monge_elkan_asymmetric_direction(spark):
    """S ⊂ T gives ME(S,T) = 1.0 (every S-word matches exactly) while
    T's extra word would dilute the reverse direction — pin the S=id1
    convention by checking the containment case scores 1.0."""
    recs = {1: ["anna"], 2: ["anna", "zzz"]}
    assert _run_me(spark, recs, [(1, 2)]) == {(1, 2): 1.0}


@pytest.mark.parametrize("seed", [0, 1])
def test_monge_elkan_matches_reference_random(spark, seed):
    rng = random.Random(seed)
    base = ["anderson", "andersen", "jonson", "johnson", "smith", "smyth",
            "garcia", "chen", "cheng", "miller", "muller", "lopez",
            "lopes", "brown", "braun", "lee", "li", "kim"]
    recs = {i: rng.sample(base, rng.randint(1, 4)) for i in range(25)}
    pairs = [(a, b) for a in range(25) for b in range(a + 1, 25)
             if rng.random() < 0.25]
    assert _run_me(spark, recs, pairs) == me_ref(recs, pairs)


def test_monge_elkan_empty_side_scores_zero(spark):
    from dig_entity_resolution_spark.operators.scoring import (
        monge_elkan_scores,
    )

    rdf = spark.createDataFrame(
        [(1, ["a"]), (2, [])], "record_id long, tokens array<string>"
    )
    pdf = spark.createDataFrame([(1, 2)], "id1 long, id2 long")
    rows = monge_elkan_scores(pdf, rdf).collect()
    assert [(r.id1, r.id2, r.monge_elkan) for r in rows] == [(1, 2, 0.0)]
