from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dig_entity_resolution_spark.operators.dedup import (
    embedding_dup_pairs,
    exact_dup_groups,
    minhash_lsh_dup_pairs,
    ngram_jaccard_dup_pairs,
    simhash_dup_pairs,
)


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    rows = [
        (1, base),
        (2, base),  # exact dup of 1 (after normalization)
        (3, base.replace("quick", "quikc")),  # near dup
        (4, "completely different content about spark query engines and shuffles"),
        (5, "another unrelated document mentioning entity resolution pipelines"),
        (6, base + "!"),  # exact dup after normalization strips punctuation
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_dedup(docs):
    out = exact_dup_groups(docs, "doc_id", "text")
    rows = {r.doc_id: (r.group_size, r.is_canonical) for r in out.collect()}
    assert rows[1] == (3, True)
    assert rows[2] == (3, False)
    assert rows[6] == (3, False)
    assert rows[4] == (1, True)


def test_minhash_lsh_finds_near_dups(docs):
    pairs = {
        (r.id1, r.id2)
        for r in minhash_lsh_dup_pairs(
            docs, "doc_id", "text", jaccard_threshold=0.4
        ).collect()
    }
    assert (1, 2) in pairs and (1, 6) in pairs
    assert (1, 3) in pairs  # near-dup within jaccard radius
    assert not any({4, 5} & {a, b} for a, b in pairs)


def test_simhash_dup_pairs(docs):
    pairs = {
        (r.id1, r.id2)
        for r in simhash_dup_pairs(docs, "doc_id", "text", max_hamming=8).collect()
    }
    assert (1, 2) in pairs and (1, 6) in pairs


def test_ngram_jaccard(docs):
    pairs = {
        (r.id1, r.id2)
        for r in ngram_jaccard_dup_pairs(
            docs, "doc_id", "text", threshold=0.6, prefix_block=4
        ).collect()
    }
    assert (1, 2) in pairs and (1, 3) in pairs


def test_embedding_dup_pairs(spark):
    rows = [
        (1, [1.0, 0.5, -0.2, 0.8]),
        (2, [1.0, 0.5, -0.2, 0.8]),  # identical
        (3, [0.99, 0.51, -0.19, 0.82]),  # near
        (4, [-1.0, 0.5, 0.2, -0.8]),  # far (different sign bucket)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = {
        (r.id1, r.id2)
        for r in embedding_dup_pairs(
            df, "vec_id", "embedding", threshold=0.99, n_sign_bits=4
        ).collect()
    }
    assert (1, 2) in pairs and (1, 3) in pairs and (2, 3) in pairs
    assert not any(4 in p for p in pairs)
