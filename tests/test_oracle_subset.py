"""In-pytest slice of the driver's correctness gate: a representative subset
of queries() compared against oracle_sql() in DuckDB at sf0.001 (fast).
The full 35-query gate runs via tools/check_oracles.py at sf0.01.
"""

from __future__ import annotations

import os

import duckdb
import pytest

import __spark_entry__ as entrymod
from tools.check_oracles import TABLES, canon

SF = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF), reason="driver testdata not present"
)

SUBSET = [
    "normalize_tokenize",
    "candidate_pairs",
    "pairs_jaro_winkler",
    "minhash_signatures",
    "simhash_fingerprints",
    "connected_components",
    "tpch_q1_agg",
    "events_sessionize",
    "lineitem_pivot",
    "quality_report",
    "sorted_neighborhood",
    "events_last_order_asof",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(spark, duck, name):
    sdf = entrymod.queries()[name](spark, SF).toPandas()
    odf = duck.execute(entrymod.oracle_sql()[name]).fetchdf()
    assert len(sdf) == len(odf)
    assert sorted(sdf.columns) == sorted(odf.columns)
    a, b = canon(sdf), canon(odf)
    assert a.equals(b), f"value mismatch in {name}"
