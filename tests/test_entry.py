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
