"""Driver-contract smoke: entry() returns rows; every oracle key has a query;
a fast subset of queries runs at sf0.001."""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF), reason="driver testdata not present"
)


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


def test_oracle_keys_subset_of_queries():
    q = set(entrymod.queries())
    o = set(entrymod.oracle_sql())
    assert o <= q
    assert len(o) >= 25  # broad oracle coverage is the point


FAST = [
    "normalize_tokenize",
    "candidate_pairs",
    "minhash_signatures",
    "simhash_fingerprints",
    "embedding_ann_lsh",
    "lang_id",
    "tpch_q1_agg",
    "events_sessionize",
]


@pytest.mark.parametrize("name", FAST)
def test_query_runs(spark, name):
    fn = entrymod.queries()[name]
    df = fn(spark, SF)
    assert df.columns  # has a schema
    df.limit(5).collect()  # executes


def test_rows_only_queries_register_last():
    """The driver gate recorded exactly the first 50 registry entries at
    r3 — hash-checkable queries must occupy the prefix so a coverage cap
    only ever drops rows-only-by-design configs. Ordered by REGISTRATION
    intent (registry sql is None), not by resolved oracle_sql(): a lazy
    oracle builder legitimately resolves to None when its fixture is
    absent, which degrades that entry to rows-only without being a
    registration-order regression (r4 review)."""
    from dig_entity_resolution_spark import queries as Q

    names = list(entrymod.queries())
    seen_rows_only = False
    for n in names:
        if Q._REGISTRY[n][1] is None:
            seen_rows_only = True
        else:
            assert not seen_rows_only, f"oracle-backed {n} after a rows-only entry"
    assert sum(Q._REGISTRY[n][1] is not None for n in names) >= 50
