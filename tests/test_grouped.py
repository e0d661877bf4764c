from __future__ import annotations

import duckdb
import pytest

from dig_entity_resolution_spark.operators.grouped import block_profile


def test_block_profile(spark):
    rows = [
        ("b1", 1, "alpha beta"),
        ("b1", 2, "alpha betz"),
        ("b1", 3, "alpha beta"),
        ("b2", 4, "solo record"),  # <2 records → no profile row
        ("b3", 5, "x y"),
        ("b3", 6, "x z"),
    ]
    df = spark.createDataFrame(rows, ["block_key", "record_id", "norm_text"])
    out = {r.block_key: r for r in block_profile(df).collect()}
    assert set(out) == {"b1", "b3"}
    assert out["b1"].n_records == 3 and out["b1"].n_pairs == 3
    assert out["b1"].jw_max == pytest.approx(1.0)  # rows 1,3 identical
    con = duckdb.connect()
    expect = con.execute(
        "select jaro_winkler_similarity('alpha beta','alpha betz')"
    ).fetchone()[0]
    # mean of {jw(1,2), jw(1,3)=1, jw(2,3)} = (expect + 1 + expect)/3
    assert out["b1"].jw_mean == pytest.approx(
        round((2 * expect + 1.0) / 3, 6), abs=1e-6
    )
