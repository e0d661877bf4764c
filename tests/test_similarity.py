"""Similarity kernels vs DuckDB scalar oracles (SURVEY.md §5.2)."""

from __future__ import annotations

import random

import duckdb
import numpy as np
import pandas as pd
import pytest

from dig_entity_resolution_spark.functions.similarity import (
    cosine_batch,
    jaro_winkler_batch,
)


def _random_pairs(n: int, seed: int = 7) -> list[tuple[str, str]]:
    rng = random.Random(seed)
    alph = "abcdefg "
    pairs = []
    for _ in range(n):
        la, lb = rng.randint(0, 14), rng.randint(0, 14)
        a = "".join(rng.choice(alph) for _ in range(la))
        b = "".join(rng.choice(alph) for _ in range(lb))
        if rng.random() < 0.3:
            b = a[: max(0, la - 2)] + b[:2]
        pairs.append((a, b))
    return pairs


KNOWN = [
    ("martha", "marhta"),
    ("dixon", "dicksonx"),
    ("jellyfish", "smellyfish"),
    ("a", "a"),
    ("", ""),
    ("", "abc"),
    ("ab", "ba"),
    ("duane", "dwayne"),
    ("prefix_same_long", "prefix_same_lonk"),
    ("ab", "abzzzzzzzzzz"),  # boost applies (jaro > 0.7)
    ("abqqqqqq", "abzzzzzz"),  # boost must NOT apply (jaro = 0.5)
]


def test_jaro_winkler_matches_duckdb_exactly():
    pairs = _random_pairs(2000) + KNOWN
    df = pd.DataFrame(pairs, columns=["a", "b"])
    ours = jaro_winkler_batch(df.a, df.b)
    con = duckdb.connect()
    theirs = np.array(
        [
            con.execute("select jaro_winkler_similarity(?, ?)", [a, b]).fetchone()[0]
            for a, b in pairs
        ]
    )
    assert np.abs(ours - theirs).max() <= 1e-12


def test_jaro_winkler_bounds_and_identity():
    pairs = _random_pairs(500, seed=11)
    df = pd.DataFrame(pairs, columns=["a", "b"])
    vals = jaro_winkler_batch(df.a, df.b)
    assert ((vals >= 0) & (vals <= 1)).all()
    same = pd.Series([p[0] for p in pairs if p[0]])
    assert (jaro_winkler_batch(same, same) == 1.0).all()


def _jw_reference(s1: str, s2: str) -> float:
    """Pure-Python codepoint Jaro-Winkler (Winkler 1990), the kernel's spec.

    (DuckDB computes over UTF-8 bytes, so it is only an oracle for ASCII.)
    """
    if not s1 or not s2:
        return 0.0
    l1, l2 = len(s1), len(s2)
    w = max(max(l1, l2) // 2 - 1, 0)
    m2 = [False] * l2
    matched1 = []
    for i, c in enumerate(s1):
        lo, hi = max(0, i - w), min(l2 - 1, i + w)
        for j in range(lo, hi + 1):
            if not m2[j] and s2[j] == c:
                m2[j] = True
                matched1.append(c)
                break
    m = len(matched1)
    if m == 0:
        return 0.0
    matched2 = [s2[j] for j in range(l2) if m2[j]]
    t = sum(a != b for a, b in zip(matched1, matched2)) // 2
    jaro = (m / l1 + m / l2 + (m - t) / m) / 3
    p = 0
    for a, b in zip(s1[:4], s2[:4]):
        if a != b:
            break
        p += 1
    return jaro + p * 0.1 * (1 - jaro) if jaro > 0.7 else jaro


def test_jaro_winkler_unicode_codepoint_semantics():
    pairs = [
        ("héllo wörld", "héllo wörld"),
        ("日本語のテキスト", "日本語のテクスト"),
        ("naïve", "naive"),
        ("ß", "ss"),
        ("emoji 😀 test", "emoji 😀 tset"),
    ]
    a = pd.Series([p[0] for p in pairs])
    b = pd.Series([p[1] for p in pairs])
    vals = jaro_winkler_batch(a, b)
    expect = np.array([_jw_reference(x, y) for x, y in pairs])
    assert np.abs(vals - expect).max() <= 1e-12


def test_jw_reference_agrees_with_kernel_on_random():
    pairs = _random_pairs(300, seed=23)
    df = pd.DataFrame(pairs, columns=["a", "b"])
    vals = jaro_winkler_batch(df.a, df.b)
    expect = np.array([_jw_reference(x, y) for x, y in pairs])
    assert np.abs(vals - expect).max() <= 1e-12


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    # tiny alphabets force dense match windows + transpositions (the JW
    # hard cases); the mixed strategy adds unicode and empties
    _jw_text = st.one_of(
        st.text(alphabet="ab", max_size=12),
        st.text(alphabet="abc ", max_size=30),
        st.text(max_size=20),  # arbitrary unicode incl. astral
        st.just(""),
    )

    @settings(max_examples=150, deadline=None)
    @given(st.lists(st.tuples(_jw_text, _jw_text), min_size=1, max_size=40))
    def test_jw_kernel_property_vs_reference(pairs):
        a = pd.Series([p[0] for p in pairs])
        b = pd.Series([p[1] for p in pairs])
        vals = jaro_winkler_batch(a, b)
        expect = np.array([_jw_reference(x, y) for x, y in pairs])
        assert np.abs(vals - expect).max() <= 1e-12

except ImportError:  # hypothesis not installed — random tests above still run
    pass


def test_cosine_batch_matches_numpy():
    rng = np.random.default_rng(3)
    va = rng.normal(size=(300, 32))
    vb = rng.normal(size=(300, 32))
    ours = cosine_batch(pd.Series(list(va)), pd.Series(list(vb)))
    expect = (va * vb).sum(1) / (
        np.linalg.norm(va, axis=1) * np.linalg.norm(vb, axis=1)
    )
    assert np.abs(ours - expect).max() < 1e-12


def test_cosine_zero_vector():
    a = pd.Series([[0.0, 0.0], [1.0, 0.0]])
    b = pd.Series([[1.0, 1.0], [1.0, 0.0]])
    out = cosine_batch(a, b)
    assert out[0] == 0.0 and out[1] == pytest.approx(1.0)


def test_native_similarities_on_spark(spark):
    from pyspark.sql import functions as F

    from dig_entity_resolution_spark.functions.similarity import (
        cosine_native,
        jaro_winkler,
        lev_similarity,
        token_jaccard,
    )

    df = spark.createDataFrame(
        [("kitten", "sitting", ["a", "b"], ["b", "c"], [1.0, 2.0], [2.0, 4.0])],
        ["s1", "s2", "t1", "t2", "v1", "v2"],
    )
    row = df.select(
        lev_similarity("s1", "s2").alias("lev"),
        token_jaccard("t1", "t2").alias("jac"),
        cosine_native("v1", "v2").alias("cos"),
        jaro_winkler("s1", "s2").alias("jw"),
    ).collect()[0]
    assert row.lev == pytest.approx(1 - 3 / 7)
    assert row.jac == pytest.approx(1 / 3)
    assert row.cos == pytest.approx(1.0)
    con = duckdb.connect()
    expect_jw = con.execute(
        "select jaro_winkler_similarity('kitten','sitting')"
    ).fetchone()[0]
    assert row.jw == pytest.approx(expect_jw, abs=1e-12)


# ---------------------------------------------------------------------------
# r8 bit-parallel kernels: exact-equivalence pins vs their reference twins
# ---------------------------------------------------------------------------


def _rand_cases(seed: int, n: int, alph: str, lo: int, hi: int):
    rng = random.Random(seed)
    return [
        (
            "".join(rng.choice(alph) for _ in range(rng.randint(lo, hi))),
            "".join(rng.choice(alph) for _ in range(rng.randint(lo, hi))),
        )
        for _ in range(n)
    ]


def test_levenshtein_batch_matches_reference_dp():
    """Myers bit-parallel distances == the classic cell DP, including
    multi-block (>64 and >128 char) patterns, empties, and unicode."""
    from dig_entity_resolution_spark.functions.similarity import (
        levenshtein_batch,
    )

    def ref(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i in range(1, len(a) + 1):
            cur = [i] + [0] * len(b)
            for j in range(1, len(b) + 1):
                cur[j] = min(
                    prev[j] + 1,
                    cur[j - 1] + 1,
                    prev[j - 1] + (a[i - 1] != b[j - 1]),
                )
            prev = cur
        return prev[len(b)]

    cases = [("", ""), ("", "abc"), ("abc", ""), ("kitten", "sitting"),
             ("héllo wörld", "hello world"), ("日本語テキスト", "日本語のテキスト")]
    cases += _rand_cases(1, 120, "ab", 0, 12)           # dense overlap
    cases += _rand_cases(2, 60, "abcdefgh 0123", 40, 200)  # multi-block
    got = levenshtein_batch(
        pd.Series([c[0] for c in cases]), pd.Series([c[1] for c in cases])
    )
    want = [ref(a, b) for a, b in cases]
    assert got.tolist() == want


def test_jw_bit_parallel_matches_matrix_reference():
    """The bit-parallel greedy matcher must reproduce the matrix-scan
    matcher bit-for-bit (same lowest-unused-in-window semantics)."""
    from dig_entity_resolution_spark.functions.similarity import (
        _jw_chunk,
        _jw_chunk_matrix,
    )

    cases = [("", ""), ("", "abc"), ("abc", ""), ("martha", "marhta"),
             ("dixon", "dicksonx"), ("𝄞music", "music𝄞")]
    cases += _rand_cases(3, 150, "ab", 0, 12)
    cases += _rand_cases(4, 80, "abcdefghij 01", 40, 200)
    a = pd.Series([c[0] for c in cases])
    b = pd.Series([c[1] for c in cases])
    new = _jw_chunk(a, b)
    old = _jw_chunk_matrix(a, b)
    assert (new == old).all()
