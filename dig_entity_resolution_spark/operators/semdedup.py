"""SemDeDup — semantic dedup via embedding clustering (Abbas et al. 2023,
"SemDeDup: Data-efficient learning at web-scale through semantic
deduplication", arXiv:2303.09540 — public method).

Fills the gap between lexical near-dup (MinHash/SimHash: same WORDS) and
pairwise embedding LSH (`dedup.embedding_dup_pairs`: near-identical
vectors): SemDeDup finds *semantic* duplicates — rephrasings, boilerplate
variants, translations-of-the-same-page — by clustering embeddings with
k-means and comparing pairs ONLY within a cluster. The cluster
assignment is the blocking step, so the corpus never goes all-pairs:
cost is Σ|cell|² over cells, bounded below by the k-means granularity
and above by the `max_cell` sub-split.

Composition over existing oracle-proven parts:
  * k-means fit/assign: `operators/ivf.py` (`kmeans_fit`,
    `assign_cells_arrow` — one BLAS matmul per Arrow batch);
  * within-cell cosine: `functions.similarity.cosine_native` (JVM
    zip_with fold, no Python);
  * keep-one-per-group: `operators/cluster.py connected_components`
    (large-star/small-star), canonical = min id — the same relaxation
    `near_dup_clusters` uses. The paper keeps the member with LOWEST
    cosine to its centroid; `keep="far_from_centroid"` implements that
    tie-broken by id, `keep="min_id"` (default) is the deterministic
    oracle-friendly choice.

Over-cap cells (a giant semantic blob — boilerplate is routine in web
corpora) are NOT dropped (that is where the duplicate mass lives); they
are SUB-SPLIT by `n_bands` INDEPENDENT sign-LSH buckets
(`operators.ann.bucket_expr`, one seed per band) and a pair is a
candidate if ANY band agrees — the standard OR-of-bands construction.
One 8-bit band alone misses a cos≈0.99 pair with probability
1−(1−θ/π)^8 ≈ 31 % (measured: a planted pair straddled a hyperplane in
the first test run); four independent bands push that to ≈1 %, at 4×
key fan-out confined to over-cap cells only. The cap keeps the
within-key join bounded by max_cell² per band (documented trade, same
posture as the hot-bucket caps elsewhere).

100 TB posture: fit ships k×dim floats per iteration (never the corpus);
assignment is Arrow-batched; the pair join shuffles on the cell key;
CC is the affected-edges subgraph only. No driver collect beyond the
centroid accumulator.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.similarity import cosine_native
from .ann import bucket_expr
from .cluster import connected_components
from .ivf import assign_cells_arrow, kmeans_fit


def semdedup_pairs(
    vecs: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 16,
    threshold: float = 0.97,
    iters: int = 4,
    seed: int = 7,
    max_cell: int = 2000,
    centroids: np.ndarray | None = None,
    n_bands: int = 4,
) -> DataFrame:
    """(id1, id2, cos) semantic-duplicate pairs: same k-means cell (or,
    for over-cap cells, ANY of `n_bands` independent sign-LSH sub-buckets
    agreeing) and cosine ≥ threshold. Pass `centroids` to reuse a fit
    (the IVF-at-ingest pattern)."""
    if centroids is None:
        centroids = kmeans_fit(
            vecs, id_col, vec_col, k=k, iters=iters, seed=seed
        )
    assigned = assign_cells_arrow(vecs, id_col, vec_col, centroids).select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("v"), "cell"
    )
    counts = assigned.groupBy("cell").agg(F.count(F.lit(1)).alias("_n"))
    dim = int(centroids.shape[1])
    bands = F.array(
        *[
            F.concat_ws(
                ":",
                F.lit(str(b)),
                F.col("cell").cast("string"),
                bucket_expr("v", 8, "hyperplane", dim, seed + 1000 * b),
            )
            for b in range(n_bands)
        ]
    )
    keyed = assigned.join(F.broadcast(counts), "cell").select(
        "vid",
        "v",
        F.explode(
            F.when(F.col("_n") > max_cell, bands).otherwise(
                F.array(F.col("cell").cast("string"))
            )
        ).alias("bkey"),
    )
    l = keyed.select("bkey", F.col("vid").alias("id1"), F.col("v").alias("v1"))
    r = keyed.select("bkey", F.col("vid").alias("id2"), F.col("v").alias("v2"))
    cand = (
        l.join(r, "bkey")
        .filter(F.col("id1") < F.col("id2"))
        .dropDuplicates(["id1", "id2"])
    )
    return cand.select(
        "id1", "id2", cosine_native("v1", "v2").alias("cos")
    ).filter(F.col("cos") >= F.lit(threshold))


def semdedup_corpus(
    vecs: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 16,
    threshold: float = 0.97,
    iters: int = 4,
    seed: int = 7,
    max_cell: int = 2000,
    centroids: np.ndarray | None = None,
    keep: str = "min_id",
) -> DataFrame:
    """The KEPT corpus: one representative per semantic-duplicate group
    (connected component of the ≥threshold graph), all other rows intact.

    keep="min_id": deterministic canonical (the repo-wide convention).
    keep="far_from_centroid": the paper's choice — within each group keep
    the member with the LOWEST cosine to its own centroid (the most
    "extreme" exemplar preserves data diversity), ties broken by id.
    """
    if keep not in ("min_id", "far_from_centroid"):
        raise ValueError(f"semdedup_corpus: unknown keep policy {keep!r}")
    if centroids is None:
        centroids = kmeans_fit(
            vecs, id_col, vec_col, k=k, iters=iters, seed=seed
        )
    pairs = semdedup_pairs(
        vecs, id_col, vec_col, k, threshold, iters, seed, max_cell, centroids
    )
    comp = connected_components(
        pairs.select(F.col("id1").alias("src"), F.col("id2").alias("dst"))
    ).select(F.col("record_id").alias("vid"), "cluster_id")
    if keep == "min_id":
        # cluster_id IS the component's min id (the CC contract) — its
        # row is the canonical; every other member drops
        drop = comp.filter(F.col("vid") != F.col("cluster_id")).select("vid")
    else:
        # assign ONLY component members (r7 review find): re-running the
        # Arrow matmul assignment over the whole corpus to score what is
        # typically <1 % of rows doubles the most expensive stage, and
        # MapInPandas blocks semi-join pushdown — so restrict the INPUT
        # before the assignment, not the output after it
        members = vecs.join(
            comp.select(F.col("vid").alias(id_col)), id_col
        )
        cent = assign_cells_arrow(members, id_col, vec_col, centroids).select(
            F.col(id_col).alias("vid"), F.col(vec_col).alias("v"), "cell"
        )
        # cosine to own centroid: one array-of-arrays literal indexed by
        # the (0-based) cell — k×dim floats broadcast by value
        cent_lit = F.array(
            *[F.array(*[F.lit(float(x)) for x in c]) for c in centroids]
        )
        scored = comp.join(cent, "vid").select(
            "vid",
            "cluster_id",
            cosine_native(
                F.col("v"), F.element_at(cent_lit, F.col("cell") + 1)
            ).alias("_c2c"),
        )
        from pyspark.sql import Window

        w = Window.partitionBy("cluster_id").orderBy(
            F.col("_c2c").asc(), F.col("vid").asc()
        )
        drop = (
            scored.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") > 1)
            .select("vid")
        )
    return vecs.join(
        drop.withColumnRenamed("vid", id_col), id_col, "left_anti"
    )


def synth_semantic_corpus(
    spark,
    n_groups: int = 6,
    group_size: int = 3,
    n_distinct: int = 30,
    dim: int = 32,
    seed: int = 13,
) -> DataFrame:
    """Deterministic planted semantic-dup fixture: n_groups base unit
    vectors each re-emitted group_size times with small angular noise
    (σ=0.02 per dim → noise norm ≈ 0.02·√dim ≈ 0.11, in-group cosine
    ≈ 0.985–0.995; σ=0.05 was measured to push pairs BELOW a 0.97
    threshold — cos ≈ 1/√(1+0.28²) ≈ 0.96), plus n_distinct
    well-separated vectors (random 32-dim unit pairs: |cos| ≪ 0.5
    w.h.p.). vec_id = group * 1000 + variant / 900000+i — the
    synth_*_corpus layout contract."""
    rng = np.random.default_rng(seed)

    def unit(v):
        return (v / np.linalg.norm(v)).astype(float)

    rows = []
    for g in range(n_groups):
        base = unit(rng.standard_normal(dim))
        for v in range(group_size):
            x = base if v == 0 else unit(base + 0.02 * rng.standard_normal(dim))
            rows.append((g * 1000 + v, [float(t) for t in x]))
    for i in range(n_distinct):
        rows.append(
            (900000 + i, [float(t) for t in unit(rng.standard_normal(dim))])
        )
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")
