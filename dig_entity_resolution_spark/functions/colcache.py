"""Memoized unresolved Column trees for pinned artifacts (VERDICT r6
next-round #1).

An unresolved Column is an immutable expression tree — it binds to no
DataFrame until analysis, so the SAME tree is legal in any number of
queries. The expensive artifact-bearing trees (the LM's three score-array
literals, the BPE merges/vocab literals and their nested fold, the DSIR
weight array) are pure functions of the artifact objects plus the input
column's textual form, and IncrementalCuration feeds the SAME pinned
artifact objects to every batch — yet each delta() re-parsed and re-built
the trees from scratch, ~9 s of the measured ~30 s per-batch wall at the
5k-doc bench (profiled this round; the literal builds were already
one-parse `F.expr`s after notes #46, so the residue is tree assembly +
py4j round-trips, which only a cache removes).

Keys use artifact IDENTITY with a strong reference held in the value, so
a dead id() can never be revived by the allocator; the active py4j
gateway is part of the key, so a restarted JVM (new gateway) can never be
served a stale JavaObject. The cache is a small bounded dict — artifacts
are few and long-lived by construction."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column

_CACHE: dict = {}
_MAX = 64


def _jvm_token() -> int | None:
    from pyspark import SparkContext

    sc = SparkContext._active_spark_context
    return id(sc._gateway) if sc is not None else None


def cached_col(
    tag: str, artifacts: tuple, extra: tuple, builder: Callable[[], Column]
) -> Column:
    """`builder()` memoized by (tag, identity of each artifact, extra,
    live JVM). `extra` carries the non-artifact degrees of freedom (the
    input column's string form, flags); it must be hashable."""
    token = _jvm_token()
    if token is None:  # no JVM yet — nothing safe to cache against
        return builder()
    key = (tag, tuple(id(a) for a in artifacts), extra, token)
    hit = _CACHE.get(key)
    if hit is not None and all(a is b for a, b in zip(hit[0], artifacts)):
        return hit[1]
    col = builder()
    if len(_CACHE) >= _MAX:
        _CACHE.clear()
    _CACHE[key] = (artifacts, col)
    return col
