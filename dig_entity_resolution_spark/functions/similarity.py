"""Pairwise similarity kernels (SURVEY.md §2.D).

Contract [BASELINE.json:15]: vectorized pandas/Arrow UDFs, *no per-row
Python*. Everything that Spark can compute natively stays native
(levenshtein, token Jaccard, zip_with cosine); the two kernels Spark lacks
(Jaro-Winkler, dense-vector cosine) are batch-vectorized numpy inside
pandas_udf — the Python loops below iterate over *character positions*
(≤ max string length), never over rows.

Jaro-Winkler follows Winkler (1990): boost threshold 0.7, prefix cap 4,
prefix scale 0.1, empty-string similarity 0. Verified numerically identical
(1e-12) to DuckDB's jaro_winkler_similarity in tests/test_similarity.py for
ASCII inputs. Unicode note: this kernel compares CODEPOINTS (the
linguistically sensible unit); DuckDB compares UTF-8 BYTES, so the two
diverge on multi-byte characters — the oracle-checked queries only feed
normalized [a-z0-9 ] text, where both agree exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

# ---------------------------------------------------------------------------
# Native (JVM / codegen) similarities
# ---------------------------------------------------------------------------


def lev_similarity(a: Column | str, b: Column | str) -> Column:
    """Normalized Levenshtein similarity 1 - lev/max(len); both empty → 1. (D2)"""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    mx = F.greatest(F.length(ca), F.length(cb))
    return F.when(mx == 0, F.lit(1.0)).otherwise(
        1.0 - F.levenshtein(ca, cb) / mx.cast("double")
    )


def token_jaccard(a: Column | str, b: Column | str) -> Column:
    """|A∩B| / |A∪B| over token arrays; both empty → 0. (D4)"""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    inter = F.size(F.array_intersect(ca, cb))
    union = F.size(F.array_union(ca, cb))
    return F.when(union == 0, F.lit(0.0)).otherwise(
        inter.cast("double") / union.cast("double")
    )


def cosine_native(a: Column | str, b: Column | str) -> Column:
    """Dense cosine via zip_with + aggregate — JVM-side, no UDF. (D6 alt)"""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b

    def dot(x: Column, y: Column) -> Column:
        return F.aggregate(
            F.zip_with(x, y, lambda p, q: p.cast("double") * q.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    num = dot(ca, cb)
    den = F.sqrt(dot(ca, ca)) * F.sqrt(F.aggregate(
        F.zip_with(cb, cb, lambda p, q: p.cast("double") * q.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    ))
    return F.when(den == 0, F.lit(0.0)).otherwise(num / den)


# ---------------------------------------------------------------------------
# Vectorized numpy Jaro-Winkler (D3)
# ---------------------------------------------------------------------------


def _pack(strings: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """Pack a batch of strings into a zero-padded codepoint matrix.

    Fully vectorized: one join+frombuffer for the whole batch, then a single
    fancy-indexed scatter (no per-row Python loop). Codes are narrowed to
    uint16 when the batch is BMP-only (the common case — halves the memory
    traffic of every comparison in the match loop).
    """
    n = len(strings)
    lens = np.fromiter((len(s) for s in strings), dtype=np.int64, count=n)
    total = int(lens.sum())
    width = max(int(lens.max()) if n else 0, 1)
    if not total:
        return np.zeros((n, width), dtype=np.uint16), lens
    codes = np.frombuffer("".join(strings).encode("utf-32-le"), dtype=np.uint32)
    dtype = np.uint16 if codes.max() < 0xFFFF else np.uint32
    mat = np.zeros((n, width), dtype=dtype)
    rows = np.repeat(np.arange(n), lens)
    offs = np.concatenate(([0], np.cumsum(lens)[:-1]))
    cols = np.arange(total) - np.repeat(offs, lens)
    # +1 so that code 0 never equals padding
    mat[rows, cols] = (codes + 1).astype(dtype) if dtype == np.uint16 else codes + 1
    return mat, lens


_JW_CHUNK = 512  # rows per sub-batch: keeps the (chunk × maxlen) working
# set cache-resident across the position loop (the loop re-reads B every
# iteration — chunking turned DRAM streaming into L2 hits, ~2× in practice;
# swept 512..8192, 512 best on 2.1GHz Xeon)


def jaro_winkler_batch(a: pd.Series, b: pd.Series) -> np.ndarray:
    """Batched Jaro-Winkler over two string Series.

    The only Python loop runs over character positions of the longer string
    (bounded by max length in the batch); all per-row work is numpy.
    """
    n = len(a)
    if n == 0:
        return np.zeros(0)
    if n > _JW_CHUNK:
        parts = [
            _jw_chunk(a.iloc[i : i + _JW_CHUNK], b.iloc[i : i + _JW_CHUNK])
            for i in range(0, n, _JW_CHUNK)
        ]
        return np.concatenate(parts)
    return _jw_chunk(a, b)


def _jw_chunk(a: pd.Series, b: pd.Series) -> np.ndarray:
    sa = a.fillna("").astype(str).tolist()
    sb = b.fillna("").astype(str).tolist()
    n = len(sa)
    if n == 0:
        return np.zeros(0)
    A, la = _pack(sa)
    B, lb = _pack(sb)
    La, Lb = A.shape[1], B.shape[1]
    # match window: floor(max(len)/2) - 1, clipped at 0
    w = np.maximum(np.maximum(la, lb) // 2 - 1, 0)
    matched_a = np.zeros((n, La), dtype=bool)
    unmatched_b = np.ones((n, Lb), dtype=bool)
    jcols = np.arange(Lb)
    rows = np.arange(n)
    # rows sorted by length would tighten the loop further; strings in one
    # Arrow batch are near-uniform here, so keep the simple form but do all
    # mask combining in place (the loop is memory-bandwidth-bound)
    for i in range(La):
        active = la > i
        if not active.any():
            break
        c = A[:, i]  # rows with la <= i hold padding 0, which never matches
        lo = np.maximum(i - w, 0)
        hi = np.minimum(i + w, lb - 1)
        eq = B == c[:, None]
        np.logical_and(eq, unmatched_b, out=eq)
        np.logical_and(eq, jcols >= lo[:, None], out=eq)
        np.logical_and(eq, jcols <= hi[:, None], out=eq)
        j = eq.argmax(axis=1)
        has = eq[rows, j]
        unmatched_b[rows[has], j[has]] = False
        matched_a[has, i] = True
    matched_b = ~unmatched_b
    m = matched_a.sum(axis=1)
    # compact matched codepoints, in positional order, for transposition count
    mmax = max(int(m.max()), 1)
    SA = np.zeros((n, mmax), dtype=np.uint32)
    SB = np.zeros((n, mmax), dtype=np.uint32)
    ra, ca_ = np.nonzero(matched_a)
    SA[ra, (np.cumsum(matched_a, axis=1) - 1)[ra, ca_]] = A[ra, ca_]
    rb, cb_ = np.nonzero(matched_b)
    SB[rb, (np.cumsum(matched_b, axis=1) - 1)[rb, cb_]] = B[rb, cb_]
    t = ((SA != SB) & (np.arange(mmax) < m[:, None])).sum(axis=1) // 2
    with np.errstate(divide="ignore", invalid="ignore"):
        jaro = np.where(
            m > 0,
            (
                m / np.maximum(la, 1)
                + m / np.maximum(lb, 1)
                + (m - t) / np.maximum(m, 1)
            )
            / 3.0,
            0.0,
        )
    # Winkler boost: common prefix up to 4, applied only when jaro > 0.7
    pmax = min(4, La, Lb)
    if pmax > 0:
        both = (A[:, :pmax] == B[:, :pmax]) & (
            np.arange(pmax) < np.minimum(la, lb)[:, None]
        )
        prefix = np.cumprod(both, axis=1).sum(axis=1)
    else:
        prefix = np.zeros(n, dtype=np.int64)
    jw = np.where(jaro > 0.7, jaro + prefix * 0.1 * (1.0 - jaro), jaro)
    return jw


@pandas_udf(DoubleType())
def jaro_winkler_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series(jaro_winkler_batch(a, b))


def jaro_winkler(a: Column | str, b: Column | str) -> Column:
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return jaro_winkler_udf(ca, cb)


# ---------------------------------------------------------------------------
# Vectorized numpy dense cosine (D6)
# ---------------------------------------------------------------------------


def cosine_batch(a: pd.Series, b: pd.Series) -> np.ndarray:
    """Batched cosine over two Series of equal-length float lists."""
    if len(a) == 0:
        return np.zeros(0)
    va = np.array(a.tolist(), dtype=np.float64)
    vb = np.array(b.tolist(), dtype=np.float64)
    num = np.einsum("ij,ij->i", va, vb)
    den = np.linalg.norm(va, axis=1) * np.linalg.norm(vb, axis=1)
    with np.errstate(divide="ignore", invalid="ignore"):
        return np.where(den > 0, num / den, 0.0)


@pandas_udf(DoubleType())
def cosine_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series(cosine_batch(a, b))


def cosine(a: Column | str, b: Column | str) -> Column:
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return cosine_udf(ca, cb)
