"""ANN operator tests: driver-collect bound + hyperplane-LSH recall.

VERDICT r1 items 3+4. The recall measurement uses a PLANTED near-neighbor
corpus (copies at cos≈0.97) rather than the driver's embeddings fixture:
the fixture's true top-10 neighbors sit at cos 0.25-0.43 (measured — no
near-neighbor structure), where any sublinear ANN has low recall by
information-theoretic necessity. LSH's contract is near-dup search, which
is what the planted corpus exercises. Everything is seeded → the recall
numbers below are exact, not flaky.
"""

from __future__ import annotations

import numpy as np
import pytest

from dig_entity_resolution_spark.operators.ann import brute_force_topk, lsh_topk


@pytest.fixture(scope="module")
def planted(spark):
    """60 base unit vectors × 4 near-copies (cos≈0.97) + 200 decoys.

    Returns (df, truth) where truth = {(base_id, copy_id)}."""
    rng = np.random.default_rng(11)
    dim = 64
    base = rng.standard_normal((60, dim))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows, truth = [], set()
    vid = 0
    for b in range(60):
        bid = vid
        rows.append((vid, base[b].tolist()))
        vid += 1
        for _ in range(4):
            v = base[b] + 0.03 * rng.standard_normal(dim)
            v /= np.linalg.norm(v)
            rows.append((vid, v.tolist()))
            truth.add((bid, vid))
            vid += 1
    for _ in range(200):
        v = rng.standard_normal(dim)
        rows.append((vid, (v / np.linalg.norm(v)).tolist()))
        vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    return df, truth


def _query_recall(ann_df, truth) -> float:
    got = {(r.query_id, r.neighbor_id) for r in ann_df.collect()}
    return sum((a, b) in got for a, b in truth) / len(truth)


def test_hyperplane_recall_at_defaults(planted):
    df, truth = planted
    ann = lsh_topk(df, df, "vec_id", "embedding", k=10, family="hyperplane")
    rec = _query_recall(ann, truth)
    assert rec >= 0.9, f"hyperplane recall {rec:.3f} < 0.9 at default bits"


def test_multi_table_raises_recall(planted):
    df, truth = planted
    one = _query_recall(
        lsh_topk(df, df, "vec_id", "embedding", k=10, family="hyperplane"), truth
    )
    two = _query_recall(
        lsh_topk(
            df, df, "vec_id", "embedding", k=10, family="hyperplane", n_tables=2
        ),
        truth,
    )
    assert two >= one
    assert two >= 0.97, f"2-table recall {two:.3f}"


def test_hyperplane_beats_axis_aligned_on_planted(planted):
    """The r1 axis-aligned family has unquantified recall on correlated
    embeddings; on the planted corpus the Gaussian family must not lose."""
    df, truth = planted
    sign = _query_recall(
        lsh_topk(df, df, "vec_id", "embedding", k=10, family="sign"), truth
    )
    hyper = _query_recall(
        lsh_topk(df, df, "vec_id", "embedding", k=10, family="hyperplane"), truth
    )
    assert hyper >= sign - 0.05  # allow noise-level inversion, not collapse


def test_ivf_recall_on_planted(planted):
    """Distributed k-means fit + nprobe cell search: planted copies sit at
    cos≈0.97 from their base, so base and copy share a cell w.h.p. and
    recall should approach brute force."""
    from dig_entity_resolution_spark.operators.ivf import ivf_topk, kmeans_fit

    df, truth = planted
    cents = kmeans_fit(df, "vec_id", "embedding", k=8, iters=5, seed=7)
    assert cents.shape == (8, 64)
    ann = ivf_topk(df, df, cents, "vec_id", "embedding", k=10, nprobe=2)
    rec = _query_recall(ann, truth)
    assert rec >= 0.9, f"IVF recall {rec:.3f} < 0.9"


def test_kmeans_fit_partition_invariant(planted):
    """The distributed Lloyd assignment/update must not depend on input
    partitioning (deterministic init + exact per-(cell,dim) sums)."""
    from dig_entity_resolution_spark.operators.ivf import assign_cells, kmeans_fit

    df, _ = planted
    c1 = kmeans_fit(df, "vec_id", "embedding", k=4, iters=3, seed=5)
    c2 = kmeans_fit(df.repartition(11), "vec_id", "embedding", k=4, iters=3, seed=5)
    # float-sum order may differ per partitioning; cells must still agree
    a1 = {r.vec_id: r.cell for r in assign_cells(df, "vec_id", "embedding", c1).collect()}
    a2 = {r.vec_id: r.cell for r in assign_cells(df, "vec_id", "embedding", c2).collect()}
    assert a1 == a2


def test_ivf_arrow_assignment_agrees_with_native(planted):
    """The BLAS-matmul production assignment must produce the same probe
    cells (and thus the same top-k pairs) as the native-expression oracle
    twin — ordering ties resolve identically (stable argsort, cell asc)."""
    from dig_entity_resolution_spark.operators.ivf import ivf_topk, kmeans_fit

    df, _ = planted
    cents = kmeans_fit(df, "vec_id", "embedding", k=8, iters=3, seed=7)
    nat = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in ivf_topk(df, df, cents, "vec_id", "embedding", k=5).collect()
    }
    arr = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in ivf_topk(
            df, df, cents, "vec_id", "embedding", k=5, method="arrow"
        ).collect()
    }
    assert nat == arr


def test_multi_table_requires_seeded_family(planted):
    """n_tables>1 with the unseeded 'sign' family would be L identical
    tables (L× cost, zero recall) — must refuse (r2 review)."""
    df, _ = planted
    with pytest.raises(ValueError, match="seeded"):
        lsh_topk(df, df, "vec_id", "embedding", n_tables=4)  # family='sign'


def test_hyperplane_dim_mismatch_fails_loudly(spark):
    """A wrong dim would NULL every dot product and collapse all rows into
    one bucket (silent O(n²) join) — must raise instead (r2 review)."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import SparkRuntimeException

    df = spark.createDataFrame(
        [(1, [1.0] * 16), (2, [0.5] * 16)], "vec_id long, embedding array<double>"
    )
    with pytest.raises((SparkRuntimeException, Py4JJavaError)) as e:
        lsh_topk(
            df, df, "vec_id", "embedding", family="hyperplane", dim=64
        ).collect()
    assert "pass dim= explicitly" in str(e.value)


def test_kmeans_fit_non_default_dim(spark):
    """kmeans_fit derives width from the data (r2 review: a dim=64 default
    crashed the accumulator on any other width)."""
    from dig_entity_resolution_spark.operators.ivf import ivf_topk, kmeans_fit

    rng = np.random.default_rng(3)
    rows = [(i, rng.standard_normal(16).tolist()) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = kmeans_fit(df, "vec_id", "embedding", k=4, iters=2, seed=1)
    assert cents.shape == (4, 16)
    out = ivf_topk(df, df, cents, "vec_id", "embedding", k=3, nprobe=2)
    assert out.count() > 0


def test_brute_force_refuses_oversized_query_side(planted):
    df, _ = planted
    with pytest.raises(ValueError, match="max_queries"):
        brute_force_topk(df, df, "vec_id", "embedding", k=5, max_queries=100)


def test_brute_force_exact_on_planted(planted):
    """Every planted copy must appear in its base's exact top-4."""
    df, truth = planted
    out = brute_force_topk(df, df, "vec_id", "embedding", k=4)
    got = {(r.query_id, r.neighbor_id) for r in out.collect()}
    assert all((a, b) in got for a, b in truth)


def test_lsh_multiprobe_evaluates_bucket_once_per_table(planted):
    """VERDICT r2 "what's wrong" #2: multiprobe flips must operate on a
    MATERIALIZED bucket string, not re-inline the hyperplane expression per
    flip (worst case O(bits²·dim) interpreted fold ops per row). With the
    projection barrier the optimized plan carries each dot-product fold
    once per (table, side): ~2·bits zip_with folds plus the cosine terms —
    the inlined form would show bits·(bits+1) on the query side alone."""
    import io
    from contextlib import redirect_stdout

    df, _ = planted
    bits = 8
    out = lsh_topk(
        df, df, "vec_id", "embedding",
        k=5, bits=bits, family="hyperplane", multiprobe=True,
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("formatted")
    n_folds = buf.getvalue().count("zip_with")
    assert 0 < n_folds <= 3 * bits, (
        f"{n_folds} zip_with folds in the plan — bucket expression is "
        f"being re-inlined into the multiprobe flips"
    )


def test_kmeans_fit_arrow_matches_native(planted):
    """VERDICT r2 "what's wrong" #3: the fit loop now assigns via the BLAS
    Arrow path by default. Same memberships → bit-identical mean updates
    (the update reduction is the same Spark sum either way)."""
    from dig_entity_resolution_spark.operators.ivf import kmeans_fit

    df, _ = planted
    ca = kmeans_fit(df, "vec_id", "embedding", k=6, iters=4, seed=9, method="arrow")
    cn = kmeans_fit(df, "vec_id", "embedding", k=6, iters=4, seed=9, method="native")
    assert np.allclose(ca, cn, atol=1e-9)


def test_kmeans_fit_clamps_k_to_input_rows(spark):
    """ADVICE r2: inputs with fewer than k rows crashed the accumulator
    with a numpy boolean-index shape mismatch; clamp instead, and raise a
    clear error on empty input."""
    from dig_entity_resolution_spark.operators.ivf import kmeans_fit

    df = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(3)],
        "vec_id long, embedding array<double>",
    )
    cents = kmeans_fit(df, "vec_id", "embedding", k=8, iters=2)
    assert cents.shape == (3, 2)
    with pytest.raises(ValueError, match="no rows"):
        kmeans_fit(df.filter("vec_id < 0"), "vec_id", "embedding", k=4)


def test_ivf_oracle_lazy_and_fixture_gated(monkeypatch):
    """ADVICE r2: the IVF oracle must resolve lazily (no import-time work)
    and only a MISSING fixture may disable it — audibly, via a warning —
    so a real fit bug can never silently downgrade to rows-only checking."""
    from dig_entity_resolution_spark import queries as Q

    assert callable(Q._REGISTRY["embedding_ivf_topk"][1])
    assert "cents" in Q.oracle_queries()["embedding_ivf_topk"]
    monkeypatch.setattr(Q, "_IVF_ORACLE_DIR", "/nonexistent_dir_xyz")
    monkeypatch.delattr(Q._ivf_cents, "_cache", raising=False)
    with pytest.warns(UserWarning, match="IVF oracle disabled"):
        out = Q.oracle_queries()
    assert "embedding_ivf_topk" not in out
