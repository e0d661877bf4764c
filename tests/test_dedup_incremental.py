"""Incremental near-dup corpus maintenance (VERDICT r5 item 4): exact
equality with the batch operator across append-only crawl batches,
including the one edge-retraction case (a bucket crossing the hot cap),
and the delta-proportional touched-cluster upsert contract."""

from __future__ import annotations

import pytest

from dig_entity_resolution_spark.operators.dedup import (
    near_dup_corpus,
    release_caches,
)
from dig_entity_resolution_spark.operators.dedup_incremental import (
    NearDupConfig,
    near_dup_delta,
    near_dup_emit,
    near_dup_init,
)

T = "the quick brown fox jumps over the lazy dog near the river bank today"
T2 = "the quick brown fox jumps over the lazy dog near the river bank tonight"
COLS = ["doc_id", "text", "lang"]


def _docs():
    rows = [(i, T, "en") for i in range(4)]
    rows += [(i, T2, "en") for i in range(4, 8)]
    rows += [
        (i, f"unique document number {i} with totally different content about topic {i * 7}", "en")
        for i in range(8, 30)
    ]
    return rows


def _emit_rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(scope="module")
def cfg():
    # max_bucket = 7: batch 1 holds 7 of the 8 near-identical docs (cold,
    # fully clustered); the delta's 8th copy pushes every band bucket the
    # two variants SHARE over the cap — the retraction path — while the
    # variant-specific buckets (4 members) stay cold, splitting the
    # 8-cluster into two 4-clusters.
    return NearDupConfig(max_bucket=7, jaccard_threshold=0.5)


def test_incremental_near_dup_equals_batch(spark, cfg):
    rows = _docs()
    batch1 = spark.createDataFrame(rows[:7] + rows[8:20], COLS)
    delta1 = spark.createDataFrame([rows[7]] + rows[20:25], COLS)
    delta2 = spark.createDataFrame(rows[25:], COLS)

    st = near_dup_init(batch1, cfg=cfg)
    got1 = _emit_rows(near_dup_emit(st))
    exp1 = _emit_rows(
        near_dup_corpus(batch1, max_bucket=cfg.max_bucket,
                        jaccard_threshold=cfg.jaccard_threshold)
    )
    assert got1 == exp1

    st = near_dup_delta(st, delta1, check_new_ids=True)
    got2 = _emit_rows(near_dup_emit(st))
    exp2 = _emit_rows(
        near_dup_corpus(
            spark.createDataFrame(rows[:25], COLS),
            max_bucket=cfg.max_bucket,
            jaccard_threshold=cfg.jaccard_threshold,
        )
    )
    assert got2 == exp2

    # the retraction actually fired: batch 1 had ONE 7-doc cluster
    # (survivor 0, n_merged 7); the crossing split it into two 4-clusters
    near8_1 = {r[0]: r[-1] for r in got1 if r[0] < 8}
    near8_2 = {r[0]: r[-1] for r in got2 if r[0] < 8}
    assert near8_1 == {0: 7}
    assert near8_2 == {0: 4, 4: 4}

    st = near_dup_delta(st, delta2, check_new_ids=True)
    got3 = _emit_rows(near_dup_emit(st))
    exp3 = _emit_rows(
        near_dup_corpus(
            spark.createDataFrame(rows, COLS),
            max_bucket=cfg.max_bucket,
            jaccard_threshold=cfg.jaccard_threshold,
        )
    )
    assert got3 == exp3
    release_caches()


def test_touched_cluster_upsert_reconstructs_full_emission(spark, cfg):
    """Applying the delta's only_touched rows as an upsert (delete touched
    clusters' old rows, insert the new rows) over the previous full
    emission must equal the new full emission — i.e. touched_clusters is a
    complete change set and untouched clusters' rows are bit-identical."""
    rows = _docs()
    batch1 = spark.createDataFrame(rows[:7] + rows[8:20], COLS)
    delta1 = spark.createDataFrame([rows[7]] + rows[20:], COLS)

    st = near_dup_init(batch1, cfg=cfg)
    full_before = _emit_rows(near_dup_emit(st))
    st2 = near_dup_delta(st, delta1)
    full_after = _emit_rows(near_dup_emit(st2))

    touched = {r.cluster_id for r in st2.touched_clusters.collect()}
    upsert = _emit_rows(near_dup_emit(st2, only_touched=True))
    kept = [r for r in full_before if r[-2] not in touched]
    assert sorted(kept + upsert) == full_after
    # and the upsert is a strict subset — the delta-proportional write
    assert len(upsert) < len(full_after)
    release_caches()


def test_compact_preserves_emission(spark, cfg):
    """compact() folds the segment stacks into single leaves without
    changing any table's contents — emission identical, deltas still
    apply on top of a compacted state."""
    rows = _docs()
    st = near_dup_init(spark.createDataFrame(rows[:20], COLS), cfg=cfg)
    st = near_dup_delta(st, spark.createDataFrame(rows[20:25], COLS))
    before = _emit_rows(near_dup_emit(st))
    stc = st.compact()
    assert _emit_rows(near_dup_emit(stc)) == before
    a = _emit_rows(near_dup_emit(near_dup_delta(st, spark.createDataFrame(rows[25:], COLS))))
    b = _emit_rows(near_dup_emit(near_dup_delta(stc, spark.createDataFrame(rows[25:], COLS))))
    assert a == b
    release_caches()


def test_emit_only_touched_requires_a_delta(spark, cfg):
    """Straight after init the change set is the whole corpus — including
    implicit singletons, which have no cluster row to enumerate — so
    only_touched=True must raise instead of silently dropping them."""
    rows = _docs()
    st = near_dup_init(spark.createDataFrame(rows[:10], COLS), cfg=cfg)
    with pytest.raises(ValueError, match="only_touched"):
        near_dup_emit(st, only_touched=True)
    release_caches()


def test_delta_rejects_existing_ids(spark, cfg):
    rows = _docs()
    st = near_dup_init(spark.createDataFrame(rows[:10], COLS), cfg=cfg)
    dup = spark.createDataFrame([rows[3]], COLS)
    with pytest.raises(ValueError, match="append-only"):
        near_dup_delta(st, dup, check_new_ids=True)
    release_caches()
