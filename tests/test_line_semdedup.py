"""Line-level dedup (CCNet/RefinedWeb paragraph stage) and SemDeDup
(Abbas et al. 2023) — planted-boilerplate / planted-semantic-group
recovery, contract edges, and keep-policy behavior."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dig_entity_resolution_spark.operators.line_dedup import (
    common_lines,
    line_dedup,
)
from dig_entity_resolution_spark.operators.semdedup import (
    semdedup_corpus,
    semdedup_pairs,
    synth_semantic_corpus,
)

BANNER = "Accept all cookies"
FOOTER = "(c) 2025 Example Site - All rights reserved"


def _docs(spark):
    rows = [
        (1, f"{BANNER}\nunique prose about rivers\n{FOOTER}"),
        (2, f"{BANNER}\ndifferent words on mountains\n\n{FOOTER}"),
        (3, f"  {BANNER}  \nthird page entirely its own\n{FOOTER}"),
        (4, f"{BANNER}\n{FOOTER}"),  # pure boilerplate page
        (5, "a page with no boilerplate at all"),
        (6, ""),  # empty doc survives as empty
        (7, f"self repeated line\nself repeated line\n{BANNER}"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_common_lines_counts_distinct_docs(spark):
    common = {r.key: r.n_docs for r in common_lines(_docs(spark)).collect()}
    assert common[BANNER] == 7 - 2  # docs 1,2,3,4,7 (trimmed match)
    assert common[FOOTER] == 4
    # doc 7 repeats its own line — 1 distinct doc, NOT common
    assert "self repeated line" not in common


def test_line_dedup_strips_boilerplate_preserves_order(spark):
    out = {r.doc_id: r.text for r in line_dedup(_docs(spark)).collect()}
    assert out[1] == "unique prose about rivers"
    # empty line is structure: kept
    assert out[2] == "different words on mountains\n"
    assert out[3] == "third page entirely its own"
    assert out[4] == ""  # pure boilerplate → empty, row survives
    assert out[5] == "a page with no boilerplate at all"
    assert out[6] == ""
    assert out[7] == "self repeated line\nself repeated line"
    assert len(out) == 7  # schema-stable: one row per input


def test_line_dedup_matches_duckdb_twin(spark):
    """The exact contract (trim-keyed counting, distinct docs, empties
    kept, untrimmed output, order preserved) pinned cross-engine."""
    import duckdb

    docs = _docs(spark)
    got = {(r.doc_id, r.text) for r in line_dedup(docs).collect()}
    pdf = docs.toPandas()
    con = duckdb.connect()
    con.register("documents", pdf)
    want = set(
        map(
            tuple,
            con.execute(
                """
WITH l AS (
  SELECT doc_id, list_extract(ls, i) AS line, i AS pos
  FROM (SELECT doc_id, string_split(text, chr(10)) AS ls FROM documents) t,
       unnest(range(1, len(ls) + 1)) AS u(i)
),
k AS (SELECT DISTINCT doc_id, trim(line) AS key FROM l WHERE trim(line) <> ''),
c AS (SELECT key FROM k GROUP BY key HAVING count(*) >= 2),
kept AS (
  SELECT doc_id, pos, line FROM l
  WHERE trim(line) = '' OR trim(line) NOT IN (SELECT key FROM c)
)
SELECT d.doc_id, coalesce(string_agg(kept.line, chr(10) ORDER BY kept.pos), '')
FROM documents d LEFT JOIN kept USING (doc_id)
GROUP BY d.doc_id
"""
            ).fetchall(),
        )
    )
    assert got == want


# -- SemDeDup -----------------------------------------------------------------


def test_semdedup_planted_groups(spark):
    vecs = synth_semantic_corpus(spark)
    pairs = semdedup_pairs(vecs, threshold=0.97, k=8).collect()
    got = {(r.id1, r.id2) for r in pairs}
    assert got, "no semantic-dup pairs found"
    assert all(a // 1000 == b // 1000 and a < 900000 for a, b in got)
    groups = {g: set() for g in range(6)}
    for a, b in got:
        groups[a // 1000].update({a, b})
    for g, members in groups.items():
        assert members == {g * 1000 + v for v in range(3)}, (g, members)


def test_semdedup_corpus_keeps_one_per_group(spark):
    vecs = synth_semantic_corpus(spark)
    kept = {r.vec_id for r in semdedup_corpus(vecs, threshold=0.97, k=8).collect()}
    # min_id policy: group canonical is g*1000
    for g in range(6):
        assert g * 1000 in kept
        assert g * 1000 + 1 not in kept and g * 1000 + 2 not in kept
    # all distinct rows intact
    assert all(900000 + i in kept for i in range(30))


def test_semdedup_far_from_centroid_policy(spark):
    vecs = synth_semantic_corpus(spark)
    kept = {
        r.vec_id
        for r in semdedup_corpus(
            vecs, threshold=0.97, k=8, keep="far_from_centroid"
        ).collect()
    }
    # exactly one survivor per planted group, every distinct row intact
    for g in range(6):
        assert len(kept & {g * 1000 + v for v in range(3)}) == 1
    assert all(900000 + i in kept for i in range(30))
    with pytest.raises(ValueError, match="keep policy"):
        semdedup_corpus(vecs, keep="bogus")


def test_semdedup_overcap_cell_subsplit_still_finds_pairs(spark):
    """A giant semantic blob (every vector in one cell) must still dedup:
    over-cap cells sub-split by sign-LSH, and near-identical vectors
    share the sub-bucket."""
    vecs = synth_semantic_corpus(spark, n_groups=4, n_distinct=8)
    pairs = semdedup_pairs(vecs, threshold=0.97, k=1, max_cell=10).collect()
    got = {(r.id1, r.id2) for r in pairs}
    # every planted pair recovered despite the forced sub-split
    for g in range(4):
        assert (g * 1000, g * 1000 + 1) in got, got


def test_line_dedup_null_text_normalizes_to_empty(spark):
    docs = spark.createDataFrame(
        [(1, None), (2, "real line")], "doc_id long, text string"
    )
    out = {r.doc_id: r.text for r in line_dedup(docs).collect()}
    assert out == {1: "", 2: "real line"}


def test_line_dedup_materialized_lines_identical(spark):
    """The `lines=` fast path (pass a materialized line_rows table so the
    count pass and strip pass share one explode) must be result-identical
    to the two-pass default."""
    from dig_entity_resolution_spark.operators.line_dedup import line_rows

    docs = spark.createDataFrame(
        [
            (1, "Accept all cookies\nreal prose one\nfooter"),
            (2, "Accept all cookies\nreal prose two\nfooter"),
            (3, "unique page\n\n  Accept all cookies  "),
        ],
        "doc_id long, text string",
    )
    base = {(r.doc_id, r.text) for r in line_dedup(docs).collect()}
    mat = line_rows(docs).localCheckpoint(eager=True)
    fast = {(r.doc_id, r.text) for r in line_dedup(docs, lines=mat).collect()}
    assert fast == base
    assert base == {
        (1, "real prose one"),
        (2, "real prose two"),
        (3, "unique page\n"),
    }
