"""Product-quantization ANN (operators/pq.py): the ADC identity, recall on
a planted near-dup corpus, compression shape, determinism, guards."""

from __future__ import annotations

import numpy as np
import pytest

from dig_entity_resolution_spark.operators.pq import (
    pq_adc_topk,
    pq_decode,
    pq_encode,
    pq_fit,
)


@pytest.fixture(scope="module")
def planted(spark):
    """40 base unit vectors × 4 near-copies (cos≈0.97) + 120 decoys."""
    rng = np.random.default_rng(23)
    dim = 64
    base = rng.standard_normal((40, dim))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows, truth = [], set()
    vid = 0
    for b in range(40):
        bid = vid
        rows.append((vid, base[b].tolist()))
        vid += 1
        for _ in range(4):
            v = base[b] + 0.03 * rng.standard_normal(dim)
            v /= np.linalg.norm(v)
            rows.append((vid, v.tolist()))
            truth.add((bid, vid))
            vid += 1
    for _ in range(120):
        v = rng.standard_normal(dim)
        rows.append((vid, (v / np.linalg.norm(v)).tolist()))
        vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    mat = np.array([r[1] for r in rows])
    return df, truth, mat


def test_adc_score_equals_decoded_dot(spark, planted):
    """THE invariant ADC promises (Jégou et al. §III): the LUT-gathered
    score is exactly the dot product of the (normalized) query against the
    RECONSTRUCTED corpus vector."""
    df, _, mat = planted
    books = pq_fit(mat, m=8, k_codes=32)
    codes_df = pq_encode(df, "vec_id", "embedding", books)
    codes = {r.vec_id: np.array(r.codes) for r in codes_df.collect()}
    out = pq_adc_topk(df.limit(20), codes_df, books, k=5).collect()
    norm = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    for r in out[:50]:
        recon = pq_decode(codes[r.neighbor_id][None, :], books)[0]
        assert abs(r.adc - float(norm[r.query_id] @ recon)) < 1e-9


def test_pq_recall_on_planted(spark, planted):
    """Planted copies sit at cos≈0.97 — far above quantization noise at
    m=8×32 codes, so ADC top-10 must recover nearly all of them."""
    df, truth, mat = planted
    books = pq_fit(mat, m=8, k_codes=32)
    codes_df = pq_encode(df, "vec_id", "embedding", books)
    got = {
        (r.query_id, r.neighbor_id)
        for r in pq_adc_topk(df, codes_df, books, k=10).collect()
    }
    recall = sum((a, b) in got for a, b in truth) / len(truth)
    assert recall >= 0.9, f"PQ ADC recall {recall:.3f}"


def test_pq_codes_shape_and_partition_invariance(spark, planted):
    df, _, mat = planted
    books = pq_fit(mat, m=8, k_codes=32)
    codes_df = pq_encode(df, "vec_id", "embedding", books)
    one = {r.vec_id: tuple(r.codes) for r in codes_df.collect()}
    many = {
        r.vec_id: tuple(r.codes)
        for r in pq_encode(
            df.repartition(13), "vec_id", "embedding", books
        ).collect()
    }
    assert one == many  # codes are a pure function of the vector
    assert all(len(c) == 8 and all(0 <= x < 32 for x in c) for c in one.values())


def test_pq_fit_guards(planted):
    _, _, mat = planted
    with pytest.raises(ValueError, match="not divisible"):
        pq_fit(mat, m=7)
    with pytest.raises(ValueError, match="cannot fit"):
        pq_fit(mat[:10], m=8, k_codes=32)


def test_pq_adc_query_guard(spark, planted):
    df, _, mat = planted
    books = pq_fit(mat, m=8, k_codes=32)
    codes_df = pq_encode(df, "vec_id", "embedding", books)
    with pytest.raises(ValueError, match="max_queries"):
        pq_adc_topk(df, codes_df, books, k=3, max_queries=10)


def test_ivfadc_topk_recall_and_adc_consistency(spark, planted):
    """The composed IVFADC layout: cells prune, codes score. Fully
    distributed (no driver query collect). Recall stays high on the
    planted corpus because copies share cells AND quantize to nearby
    codes; the adc values must agree with the pure-PQ path for pairs both
    return (same codebooks → same reconstruction)."""
    from dig_entity_resolution_spark.operators.ivf import kmeans_fit
    from dig_entity_resolution_spark.operators.pq import ivfadc_topk

    df, truth, mat = planted
    cents = kmeans_fit(df, "vec_id", "embedding", k=8, iters=5, seed=7)
    books = pq_fit(mat, m=8, k_codes=32)
    out = ivfadc_topk(df, df, cents, books, k=10, nprobe=2)
    rows = out.collect()
    got = {(r.query_id, r.neighbor_id) for r in rows}
    recall = sum((a, b) in got for a, b in truth) / len(truth)
    assert recall >= 0.85, f"IVFADC recall {recall:.3f}"
    # adc agreement with the pure-PQ (LUT-gather-in-numpy) path
    codes_df = pq_encode(df, "vec_id", "embedding", books)
    pq_rows = {
        (r.query_id, r.neighbor_id): r.adc
        for r in pq_adc_topk(df, codes_df, books, k=10).collect()
    }
    both = [(r, pq_rows[(r.query_id, r.neighbor_id)]) for r in rows
            if (r.query_id, r.neighbor_id) in pq_rows]
    assert len(both) > 100
    assert all(abs(r.adc - v) < 1e-9 for r, v in both)


def test_native_encode_agrees_with_blas_encode(spark, planted):
    """pq_encode_native (sequential-fold expressions, the oracle path) and
    pq_encode (BLAS argmin, the production path) must pick the same
    codewords away from exact ties — on this corpus, all of them."""
    from dig_entity_resolution_spark.operators.pq import pq_encode_native

    df, _, mat = planted
    books = pq_fit(mat, m=8, k_codes=32)
    blas = {r.vec_id: tuple(r.codes) for r in pq_encode(df, "vec_id", "embedding", books).collect()}
    native = {
        r.vec_id: tuple(r.codes)
        for r in pq_encode_native(df, "vec_id", "embedding", books).collect()
    }
    assert native.keys() == blas.keys()
    agree = sum(native[k] == blas[k] for k in native)
    # identical distances in double precision: any disagreement would be a
    # real bug, not a near-tie (fold vs BLAS differ only in the last ulp)
    assert agree == len(native)


def test_native_adc_matches_lut_adc(spark, planted):
    """pq_adc_topk_native and pq_adc_topk score the same (query, neighbor)
    pairs to within float tolerance and return the same top-k sets."""
    from dig_entity_resolution_spark.operators.pq import pq_adc_topk_native

    df, _, mat = planted
    books = pq_fit(mat, m=8, k_codes=32)
    codes_df = pq_encode(df, "vec_id", "embedding", books)
    q = df.limit(15)
    lut = {(r.query_id, r.neighbor_id): r.adc for r in pq_adc_topk(q, codes_df, books, k=5).collect()}
    nat = {
        (r.query_id, r.neighbor_id): r.adc
        for r in pq_adc_topk_native(q, codes_df, books, k=5).collect()
    }
    assert set(nat) == set(lut)
    for k_ in nat:
        assert abs(nat[k_] - lut[k_]) < 1e-9


def test_ivfadc_native_matches_production(spark, planted):
    """ivfadc_topk_native (all-native folds) and ivfadc_topk (Arrow
    assignment + LUT gather) agree on neighbors and scores on the planted
    corpus — the two configs implement one layout."""
    from dig_entity_resolution_spark.operators.ivf import fit_centroids_local  # noqa: F401
    from dig_entity_resolution_spark.operators.ivf import kmeans_fit
    from dig_entity_resolution_spark.operators.pq import (
        ivfadc_topk,
        ivfadc_topk_native,
    )

    df, _, mat = planted
    books = pq_fit(mat, m=8, k_codes=32)
    cents = kmeans_fit(df, "vec_id", "embedding", k=8, iters=5, seed=7)
    q = df.limit(15)
    prod = {
        (r.query_id, r.neighbor_id): r.adc
        for r in ivfadc_topk(q, df, cents, books, k=5, nprobe=2).collect()
    }
    nat = {
        (r.query_id, r.neighbor_id): r.adc
        for r in ivfadc_topk_native(q, df, cents, books, k=5, nprobe=2).collect()
    }
    assert set(nat) == set(prod)
    for k_ in nat:
        assert abs(nat[k_] - prod[k_]) < 1e-9
