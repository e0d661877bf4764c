"""Incremental curation (plans/curation_incremental.py).

Planted-outcome tests: batch equality under pinned artifacts, the
merge-removal → tombstone → repack path with EXACT token-coverage
verification, fixed-threshold ppl buckets reproducing the init ntiles,
and config/state guards.

NOTE: uses conftest's session-scoped `spark` fixture — never a
module-local fixture that stops the shared session (r6 landmine).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dig_entity_resolution_spark.functions.bpe import bpe_encode_ids
from dig_entity_resolution_spark.operators.dedup import (
    exact_dup_groups,
    near_dup_corpus,
)
from dig_entity_resolution_spark.plans.curation import (
    CurationConfig,
    hygiene_stage,
    quality_audit,
)
from dig_entity_resolution_spark.plans.curation_incremental import (
    IncrementalCuration,
    derive_ppl_thresholds,
    fixed_ppl_buckets,
)

CFG = dict(
    redact_pii=False,
    min_ws_tokens=3,
    max_punct_ratio=0.9,
    use_classifier=False,
    keep_ppl_buckets=(),
    shingle_k=5,
    num_perm=16,
    bands=8,
    jaccard_threshold=0.25,
    max_bucket=50,
    bpe_merges=8,
    seq_len=8,
)

# two long, shingle-disjoint "families" plus filler docs; ids increase
# across batches (the batch-equality precondition for first-seen ==
# min-id exact dedup)
_A = "alpha brown quick fox jumps over the lazy river bank today again"
_B = "zulu winter storms gather beyond frozen mountain ridges every night"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string, lang string")


def _init_rows():
    return [
        ("d001", _A, "en"),                       # near-dup family A canonical
        ("d002", _A + " x", "en"),                # absorbed into d001
        ("d003", _B, "en"),                       # singleton survivor
        ("d004", "tiny", "en"),                   # fails min_ws_tokens
        ("d005", "some unrelated medium length document body", "en"),
        ("d006", "some unrelated medium length document body", "en"),  # exact dup of d005
    ]


def test_delta_matches_batch_when_no_removals(spark, tmp_path):
    cfg = CurationConfig(**CFG)
    inc = IncrementalCuration(spark, str(tmp_path), "eq", cfg)
    init = _docs(spark, _init_rows())
    delta = _docs(
        spark,
        [
            ("d101", "fresh content about gardens and orchards in spring", "en"),
            ("d102", _A + " y", "en"),  # absorbed into existing d001 cluster
            ("d103", "tiny", "en"),     # quality-failed
            ("d104", "some unrelated medium length document body", "en"),  # exact dup
        ],
    )
    inc.init(init)
    out = inc.delta(delta, check_new_ids=True)
    assert [r.doc_id for r in out["removals"].collect()] == []

    # batch expectation with the SAME per-doc gates over init ∪ delta
    full = init.unionByName(delta)
    kept = (
        quality_audit(
            hygiene_stage(full, cfg), cfg, None, lambda df: df
        )
        .filter(F.col("keep"))
        .select("doc_id", "text", "lang")
    )
    groups = exact_dup_groups(kept, "doc_id", "text")
    surv = kept.join(
        groups.filter(~F.col("is_canonical")).select("doc_id"),
        "doc_id",
        "left_anti",
    )
    expected = near_dup_corpus(
        surv,
        id_col="doc_id",
        text_col="text",
        shingle_k=cfg.shingle_k,
        num_perm=cfg.num_perm,
        bands=cfg.bands,
        jaccard_threshold=cfg.jaccard_threshold,
        max_bucket=cfg.max_bucket,
    )
    exp_ids = sorted(r.doc_id for r in expected.select("doc_id").collect())
    got_ids = sorted(r.doc_id for r in inc.state.shipped.collect())
    assert got_ids == exp_ids
    # additions = expected minus what init shipped
    init_ids = {"d001", "d003", "d005"}
    assert sorted(
        r.doc_id for r in out["additions"].select("doc_id").collect()
    ) == sorted(set(exp_ids) - init_ids)


def _reconstruct(inc):
    """doc_id -> token list, sliced out of LIVE chunks via the chunk map."""
    cap = inc.cfg.seq_len
    chunks = {
        (r.batch, r.chunk_id): list(r.token_ids)
        for r in inc.live_chunks().collect()
    }
    out = {}
    for r in inc.state.chunk_map.collect():
        flat = []
        for c in range(r.first_chunk, r.last_chunk + 1):
            flat.extend(chunks[(r.batch, c)])
        off = r.global_start - r.first_chunk * cap
        out[r.doc_id] = flat[off : off + r.n_tokens]
    return out


def test_chunk_coverage_after_merge_removal(spark, tmp_path):
    cfg = CurationConfig(**CFG)
    inc = IncrementalCuration(spark, str(tmp_path), "rm", cfg)
    inc.init(_docs(spark, _init_rows()))
    assert sorted(r.doc_id for r in inc.state.shipped.collect()) == [
        "d001",
        "d003",
        "d005",
    ]
    # bridge doc: half A, half B — merges d001's cluster with d003;
    # canonical of the merged cluster is min id d001, so d003 (previously
    # shipped) is REMOVED
    bridge = " ".join(_A.split()[:6] + _B.split()[:6])
    out = inc.delta(_docs(spark, [("d201", bridge, "en")]))
    assert [r.doc_id for r in out["removals"].collect()] == ["d003"]
    assert [r.doc_id for r in out["additions"].select("doc_id").collect()] == []
    # d003's chunks are tombstoned
    tombs = {(r.batch, r.chunk_id) for r in out["tombstones"].collect()}
    assert tombs and all(b == 0 for b, _ in tombs)
    live = {
        (r.batch, r.chunk_id)
        for r in inc.live_chunks().select("batch", "chunk_id").collect()
    }
    assert not (tombs & live)

    # EXACT coverage: every shipped doc's ids appear exactly once across
    # live chunks, equal to a fresh encode under the pinned artifacts
    shipped = sorted(r.doc_id for r in inc.state.shipped.collect())
    assert shipped == ["d001", "d005"]
    recon = _reconstruct(inc)
    assert sorted(recon) == shipped
    art = inc.state.art
    texts = inc.state.nd.docs.join(
        inc.state.shipped, "doc_id", "left_semi"
    ).select("doc_id", "text")
    expected = {
        r.doc_id: list(r.token_ids)
        for r in bpe_encode_ids(
            texts, "doc_id", "text", art.bpe_merges, art.bpe_vocab
        ).collect()
    }
    assert recon == expected
    # no token of a live chunk is orphaned: total live tokens == sum of
    # shipped docs' token counts
    total_live = sum(
        len(ids)
        for (b, c), ids in {
            (r.batch, r.chunk_id): r.token_ids
            for r in inc.live_chunks().collect()
        }.items()
    )
    assert total_live == sum(len(v) for v in expected.values())


def test_repack_reemits_coresident_docs(spark, tmp_path):
    """group_hex=0 forces ONE packing stream and seq_len=8 packs several
    docs per chunk, so removing one doc tombstones the whole group's
    chunks — the repair must repack every co-resident into the new batch
    stream, keeping coverage exact."""
    cfg = CurationConfig(**CFG)
    inc = IncrementalCuration(spark, str(tmp_path), "co", cfg, group_hex=0)
    # shingle-disjoint small docs (distinct letter families, so none of
    # them near-dup each other) that pack several-per-chunk at seq_len=8
    rows = [
        (
            "d%03d" % i,
            " ".join(chr(ord("a") + i) * 4 + s for s in ("x", "y", "z", "w")),
            "en",
        )
        for i in range(1, 9)
    ]
    rows += [("d101", _A, "en"), ("d102", _B, "en")]
    inc.init(_docs(spark, rows))
    bridge = " ".join(_A.split()[:6] + _B.split()[:6])
    out = inc.delta(_docs(spark, [("d201", bridge, "en")]))
    assert [r.doc_id for r in out["removals"].collect()] == ["d102"]
    # single-group layout: EVERY batch-0 chunk is tombstoned and every
    # live batch-0 doc re-packs into the batch-1 stream
    assert {r.batch for r in out["tombstones"].collect()} == {0}
    assert all(
        r.batch == 1 for r in inc.state.chunk_map.select("batch").collect()
    )
    recon = _reconstruct(inc)
    assert sorted(recon) == sorted(
        r.doc_id for r in inc.state.shipped.collect()
    )
    art = inc.state.art
    texts = inc.state.nd.docs.join(
        inc.state.shipped, "doc_id", "left_semi"
    ).select("doc_id", "text")
    expected = {
        r.doc_id: list(r.token_ids)
        for r in bpe_encode_ids(
            texts, "doc_id", "text", art.bpe_merges, art.bpe_vocab
        ).collect()
    }
    assert recon == expected


def test_fixed_thresholds_reproduce_init_ntiles(spark, tmp_path):
    cfg = CurationConfig(**{**CFG, "keep_ppl_buckets": ("head", "middle")})
    inc = IncrementalCuration(spark, str(tmp_path), "ppl", cfg)
    rows = [
        ("d%03d" % i, " ".join(["common word stream"] * (i + 2)) + f" tail{i}", "en")
        for i in range(9)
    ]
    inc.init(_docs(spark, rows))
    quality = inc.ckpt.read("b0000_quality")
    scores = [r.avg_logp10 for r in quality.select("avg_logp10").collect()]
    assert len(scores) == len(set(scores)), "test corpus must have distinct scores"
    thr = inc.state.art.ppl_thresholds
    assert thr == derive_ppl_thresholds(quality)
    refixed = fixed_ppl_buckets(thr)(
        quality.select("doc_id", "lang", "avg_logp10")
    )
    joined = quality.select(
        "doc_id", F.col("ppl_bucket").alias("want")
    ).join(refixed.select("doc_id", "ppl_bucket"), "doc_id")
    assert joined.filter(F.col("want") != F.col("ppl_bucket")).count() == 0
    # unseen language routes to the neutral middle bucket
    probe = spark.createDataFrame(
        [("x", "xx", -1.0)], "doc_id string, lang string, avg_logp10 double"
    )
    assert fixed_ppl_buckets(thr)(probe).collect()[0].ppl_bucket == "middle"


def test_pinned_dsir_threshold_gates_delta(spark, tmp_path):
    cfg = CurationConfig(
        **{**CFG, "select_frac": 0.5,
           "dsir_target_texts": ("gardens orchards blossom spring meadows",)}
    )
    inc = IncrementalCuration(spark, str(tmp_path), "dsir", cfg)
    inc.init(_docs(spark, _init_rows()))
    thr = inc.state.art.dsir_thr_micro
    assert thr is not None
    out = inc.delta(
        _docs(
            spark,
            [
                ("d301", "gardens orchards blossom spring meadows flourish", "en"),
                ("d302", "entirely off-target legal boilerplate clause text", "en"),
            ],
        )
    )
    adds = out["additions"].collect()
    assert all(r.logratio_micro >= thr for r in adds)
    # shipped additions carry through to state
    got = {r.doc_id for r in inc.state.shipped.collect()}
    assert {r.doc_id for r in adds} <= got


def test_guards(spark, tmp_path):
    with pytest.raises(ValueError, match="select_k"):
        IncrementalCuration(
            spark, str(tmp_path), "g0", CurationConfig(**{**CFG, "select_k": 3})
        )
    inc = IncrementalCuration(spark, str(tmp_path), "g1", CurationConfig(**CFG))
    with pytest.raises(ValueError, match="init"):
        inc.delta(_docs(spark, [("d1", "a b c d", "en")]))
    inc.init(_docs(spark, _init_rows()))
    with pytest.raises(ValueError, match="already ran"):
        inc.init(_docs(spark, _init_rows()))
    # append-only id contract surfaces through near_dup_delta's check
    with pytest.raises(ValueError, match="append-only"):
        inc.delta(
            _docs(spark, [("d001", "different text but a reused id four", "en")]),
            check_new_ids=True,
        )


def test_lean_vs_audit_trail_checkpoints(spark, tmp_path):
    """r7 (VERDICT r6 #1): the lean default durably writes only
    b{n}_chunks per delta — the one artifact live_chunks() reads back —
    while audit_trail=True restores the full six-stage trail. Both modes
    must produce identical delta outputs (materialization strategy is not
    semantics)."""
    import os

    cfg = CurationConfig(**CFG)
    init = _docs(spark, _init_rows())
    delta = _docs(
        spark,
        [("d101", "fresh content about gardens and orchards in spring", "en")],
    )

    results = {}
    for mode, audit in (("lean", False), ("audit", True)):
        wh = str(tmp_path / mode)
        inc = IncrementalCuration(spark, wh, "m", cfg, audit_trail=audit)
        inc.init(init)
        out = inc.delta(delta)
        results[mode] = {
            k: sorted(r.doc_id for r in out[k].collect())
            for k in ("additions", "removals")
        }
        stages = {
            d.split("b0001_", 1)[1]
            for d in os.listdir(os.path.join(wh, "m"))
            if d.startswith("b0001_") and not d.endswith("_meta")
        }
        if audit:
            assert stages == {
                "hygiene", "quality", "dedup", "decontam", "selected", "chunks"
            }
        else:
            assert stages == {"chunks"}
        # init always writes its full trail (derive_ppl_thresholds audits)
        init_stages = {
            d for d in os.listdir(os.path.join(wh, "m"))
            if d.startswith("b0000_") and not d.endswith("_meta")
        }
        assert "b0000_quality" in init_stages
        # live_chunks still composes across batches in both modes
        assert inc.live_chunks().count() > 0
    assert results["lean"] == results["audit"]
