"""Product-quantization ANN: compressed codes + asymmetric-distance search
(Jégou, Douze, Schmid, "Product Quantization for Nearest Neighbor Search",
IEEE TPAMI 2011 — the PQ half; operators/ivf.py implements the IVF half).

Why this matters at 100 TB: a 64-dim float64 embedding is 512 bytes; its
PQ code is `m` small integers (m bytes once packed) — a 64× smaller corpus
that fits executor memory where raw vectors spill. Search is ASYMMETRIC
(ADC): the query stays exact, only the corpus is quantized — per query a
tiny (m × k_codes) lookup table of subspace dot products is built once,
and scoring a corpus vector is m table lookups + adds, no float math on
the corpus side.

Spark-first layout:
  * pq_fit_local — deterministic serial codebook fit on a driver-side
    SAMPLE (the standard practice: codebooks are a model artifact fit on
    ~10^5-10^6 sampled vectors, never on the full corpus).
  * pq_encode — mapInPandas: per Arrow batch, one argmin per subspace via
    BLAS; emits (id, codes array<int>). Run once at ingest, persist the
    codes table; it is the thing that scales, at m bytes/vector.
  * pq_adc_topk — queries driver-collected under the same max_queries
    contract as brute_force_topk (operators/ann.py); corpus codes stream
    through mapInPandas, scored via LUT gather; per-partition top-k then a
    global window top-k. Combine with IVF cells (assign_cells_arrow) for
    the full IVFADC layout when even the code scan needs pruning.

No DuckDB oracle by design (same reason as embedding_ivf_production: BLAS
argmin near ties can't be bit-matched against a sequential SQL fold);
instead pytest pins the exact invariant ADC promises — the ADC score
EQUALS the dot product against the decoded (reconstructed) vector — plus
recall on the planted near-dup corpus and partition invariance.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .ann import MAX_BRUTE_FORCE_QUERIES


def _seeded_sample_rows(ids: np.ndarray, mat: np.ndarray, n: int, seed: int):
    """Deterministic sample: rows with the smallest md5 hash of (seed, id)
    — the shared rule in functions.hashing.md5_sample_order (also behind
    ivf.fit_centroids_local's init)."""
    from ..functions.hashing import md5_sample_order

    if len(mat) <= n:
        return mat
    return mat[md5_sample_order(ids, seed)[:n]]


def pq_fit(
    sample: np.ndarray, m: int = 8, k_codes: int = 32, iters: int = 10, seed: int = 7
) -> np.ndarray:
    """Fit per-subspace codebooks on a sample matrix (n, dim) → codebooks
    of shape (m, k_codes, dim//m). Vectors are L2-normalized first (the
    engine's similarity is cosine, so ADC uses inner products on the unit
    sphere). Plain seeded Lloyd per subspace — deterministic."""
    n, dim = sample.shape
    if dim % m != 0:
        raise ValueError(f"dim={dim} not divisible by m={m} subspaces")
    if n < k_codes:
        raise ValueError(f"sample of {n} rows cannot fit {k_codes} codes")
    dsub = dim // m
    x = sample / np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    books = np.empty((m, k_codes, dsub))
    for j in range(m):
        sub = x[:, j * dsub : (j + 1) * dsub]
        cents = sub[rng.choice(n, size=k_codes, replace=False)].copy()
        for _ in range(iters):
            # ||x-c||² argmin via the BLAS form (drop the constant ||x||²):
            # O(n·k) memory — the broadcast-difference tensor would be
            # n·k·dsub floats, GBs at the documented sample sizes (r3 review)
            d = -2.0 * (sub @ cents.T) + (cents**2).sum(axis=1)
            codes = d.argmin(axis=1)
            new = cents.copy()
            for c in range(k_codes):
                members = sub[codes == c]
                if len(members):
                    new[c] = members.mean(axis=0)
            if np.allclose(new, cents, atol=1e-12):
                break
            cents = new
        books[j] = cents
    return books


def pq_fit_local(
    parquet_path: str,
    vec_col: str = "embedding",
    m: int = 8,
    k_codes: int = 32,
    iters: int = 10,
    seed: int = 7,
    max_sample: int = 100_000,
    id_col: str = "vec_id",
) -> np.ndarray:
    """Codebooks from a deterministic sample of a parquet fixture — the
    driver-side model-fit step (codebooks are k_codes·dim floats; the
    corpus never leaves executors)."""
    import pyarrow.parquet as pq_

    tbl = pq_.read_table(parquet_path, columns=[id_col, vec_col])
    ids = np.array(tbl.column(id_col).to_pylist())
    mat = np.array(tbl.column(vec_col).to_pylist(), dtype=np.float64)
    return pq_fit(_seeded_sample_rows(ids, mat, max_sample, seed), m, k_codes, iters, seed)


def pq_encode(
    df: DataFrame, id_col: str, vec_col: str, codebooks: np.ndarray
) -> DataFrame:
    """(id, codes array<int>): per-subspace nearest codeword, one BLAS
    argmin per subspace per Arrow batch. The ingest-time compression step —
    persist/bucket the output; at m≈8-16 it is ~50-100× smaller than the
    raw vector column."""
    import pandas as pd

    m, k_codes, dsub = codebooks.shape

    def run(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            v = np.stack([np.asarray(x, dtype=np.float64) for x in pdf["_v"]])
            v = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
            codes = np.empty((len(v), m), dtype=np.int64)
            for j in range(m):
                sub = v[:, j * dsub : (j + 1) * dsub]
                # ||x-c||² = ||x||² - 2x·c + ||c||²; argmin over c drops ||x||²
                d = -2.0 * (sub @ codebooks[j].T) + (codebooks[j] ** 2).sum(axis=1)
                codes[:, j] = d.argmin(axis=1)
            yield pd.DataFrame({"_id": pdf["_id"], "codes": list(codes)})

    out = df.select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")
    ).mapInPandas(run, "_id long, codes array<long>")
    return out.select(F.col("_id").alias(id_col), "codes")


def pq_decode(codes: np.ndarray, codebooks: np.ndarray) -> np.ndarray:
    """Reconstruct (n, dim) vectors from (n, m) codes — the quantized
    corpus points ADC implicitly scores against."""
    m, _k, dsub = codebooks.shape
    return np.concatenate(
        [codebooks[j][codes[:, j]] for j in range(m)], axis=1
    )


def pq_adc_topk(
    queries: DataFrame,
    corpus_codes: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    max_queries: int = MAX_BRUTE_FORCE_QUERIES,
) -> DataFrame:
    """Asymmetric-distance top-k: exact (normalized) queries against the
    PQ-compressed corpus. Per query one (m × k_codes) inner-product LUT;
    per corpus row the score is m gathers + adds — sum_j q_j·c_{j,code_j},
    exactly dot(q, decode(codes)). Returns (query_id, neighbor_id, adc,
    rank); `adc` approximates cosine with reconstruction bias ≤ the
    quantization error (Jégou et al. §III). Same driver-collect contract
    and guard as brute_force_topk."""
    import pandas as pd

    m, k_codes, dsub = codebooks.shape
    n_queries = queries.limit(max_queries + 1).count()
    if n_queries > max_queries:
        raise ValueError(
            f"pq_adc_topk query side exceeds max_queries={max_queries}; "
            "the per-query LUTs are driver-built by contract. Shard the "
            "query set, or prune with IVF cells first."
        )
    qpd = queries.select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("qv")
    ).toPandas()
    qids = qpd["qid"].to_numpy()
    qmat = np.array(qpd["qv"].tolist(), dtype=np.float64)
    qmat = qmat / np.maximum(np.linalg.norm(qmat, axis=1, keepdims=True), 1e-12)
    # LUT[q, j, c] = q's j-th subvector · codeword c  → (nq, m, k_codes)
    lut = np.einsum(
        "qjd,jcd->qjc", qmat.reshape(len(qmat), m, dsub), codebooks
    )

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            cids = pdf["_cid"].to_numpy()
            codes = np.stack([np.asarray(c, dtype=np.int64) for c in pdf["codes"]])
            sims = np.zeros((len(lut), len(codes)))
            for j in range(m):
                sims += lut[:, j, codes[:, j]]
            sims[cids[None, :] == qids[:, None]] = -np.inf  # self-match
            kk = min(k, sims.shape[1])
            top = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            qcol = np.repeat(np.arange(len(lut)), kk)
            rows = top.ravel()
            vals = sims[qcol, rows]
            keep = np.isfinite(vals)
            yield pd.DataFrame(
                {
                    "query_id": qids[qcol[keep]],
                    "neighbor_id": cids[rows[keep]],
                    "adc": vals[keep],
                }
            )

    cand = corpus_codes.select(
        F.col(id_col).alias("_cid"), F.col("codes")
    ).mapInPandas(score, "query_id long, neighbor_id long, adc double")
    w = Window.partitionBy("query_id").orderBy(F.col("adc").desc(), F.col("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "adc", "rank")
    )


def ivfadc_topk(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    nprobe: int = 2,
) -> DataFrame:
    """The full IVFADC layout (Jégou et al. 2011 §IV): IVF cells prune the
    candidate set to nprobe/k_cells of the corpus, PQ codes make scoring a
    candidate m LUT gathers. Fully distributed — no driver query collect:
    the (cell, code)-keyed corpus joins the (cell, LUT-slice)-keyed probes
    on the cell id, and the ADC score is a native aggregate over the
    zipped (code, per-subspace-LUT-row) arrays.

    At 10^12 vectors this is the shape that works: the corpus state is
    (cell int, codes m×int) — persist/bucket it by cell at ingest; a query
    ships only its nprobe cell probes and an m×k_codes LUT.

    Scoring stays JVM-native: the per-query LUT is exploded into the probe
    rows as array<array<double>> and the gather is
    aggregate(zip_with(codes, lut, (c, row) -> row[c])) — interpreted
    expression, but per CANDIDATE (already cell-pruned), not per corpus
    row. Returns (query_id, neighbor_id, adc, rank)."""
    from .ivf import assign_cells_arrow

    m, k_codes, dsub = codebooks.shape
    # cells and codes are two INDEPENDENT Arrow passes over the corpus
    # scan, joined by id — feeding assign_cells_arrow's output into
    # pq_encode would re-run the assignment pass inside the encode lineage
    # (unpersisted-branch duplication, ENGINEERING_NOTES #17). At ingest
    # both are persisted tables bucketed by cell anyway.
    cells = assign_cells_arrow(corpus, id_col, vec_col, centroids, 1).select(
        F.col(id_col), "cell"
    )
    c_codes = (
        pq_encode(corpus, id_col, vec_col, codebooks)
        .join(cells, id_col)
        .select(F.col(id_col).alias("neighbor_id"), "codes", "cell")
    )

    q = assign_cells_arrow(queries, id_col, vec_col, centroids, nprobe)

    # per-query LUT rows, built executor-side in the same Arrow pass that
    # normalizes the query (pure function of the vector — no driver state)
    import pandas as pd

    def lutify(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            v = np.stack([np.asarray(x, dtype=np.float64) for x in pdf["_v"]])
            v = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
            lut = np.einsum("qjd,jcd->qjc", v.reshape(len(v), m, dsub), codebooks)
            yield pd.DataFrame(
                {
                    "query_id": pdf["_id"],
                    "cell": pdf["cell"],
                    "lut": [x for x in lut.tolist()],
                }
            )

    q_lut = q.select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"), "cell"
    ).mapInPandas(
        lutify, "query_id long, cell int, lut array<array<double>>"
    )

    adc = F.aggregate(
        F.zip_with(
            "codes", "lut", lambda code, row: F.element_at(row, code.cast("int") + 1)
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = (
        q_lut.join(c_codes, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", adc.alias("adc"))
        # no dedup: corpus cells are nprobe=1 (one cell per vector) and a
        # query's probe cells are distinct — (query, neighbor) is unique
        # by construction; dropDuplicates was a pure extra shuffle
    )
    w = Window.partitionBy("query_id").orderBy(F.col("adc").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "adc", "rank")
    )


# ---------------------------------------------------------------------------
# Native-expression twins (oracle-grade, VERDICT r3 gap #2)
# ---------------------------------------------------------------------------
#
# The BLAS paths above are the production configs; their summation order
# can't be bit-matched against a sequential SQL fold. These twins compute
# the SAME quantities with Spark native expressions whose evaluation order
# (left-to-right fold via F.aggregate/zip_with, tie-break on code index)
# is identical to DuckDB's list_inner_product + row_number — the trick that
# earned embedding_ivf_topk its oracle (operators/ivf.py assign_cells).
# Interpreted expressions, so per-row cost is m·k_codes·dsub multiplies —
# use them for correctness checking and modest query sets; the LUT/BLAS
# paths are the 100 TB throughput configs.


def _vec_norm(v):
    """greatest(sqrt(Σ v_i²), 1e-12) as a sequential native fold — matches
    DuckDB's greatest(sqrt(list_inner_product(v, v)), 1e-12) bit-for-bit."""
    return F.greatest(
        F.sqrt(
            F.aggregate(
                F.zip_with(v, v, lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        ),
        F.lit(1e-12),
    )


def _sub_dot_lit(v, j: int, dsub: int, codeword: np.ndarray):
    """dot(v[j·dsub+1 .. j·dsub+dsub], codeword) — sequential fold, same
    order as DuckDB lip over the same 1-based inclusive slice."""
    sub = F.slice(v, j * dsub + 1, dsub)
    lit = F.array(*[F.lit(float(x)) for x in codeword])
    return F.aggregate(
        F.zip_with(sub, lit, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pq_encode_native(
    df: DataFrame, id_col: str, vec_col: str, codebooks: np.ndarray
) -> DataFrame:
    """(id, codes array<int>) via native expressions: per subspace j the
    codeword is argmin_c(||c||² − 2·(v_subj·c / ‖v‖)), evaluated as an
    array_min over (score, code) structs — lexicographic struct ordering
    gives min score with ties to the LOWER code index, the same order the
    SQL twin's `row_number() OVER (ORDER BY score, c)` produces. ||c||² is
    a Python-computed literal inlined identically into both engines, so
    only the dot-product fold order matters — and both are sequential."""
    m, k_codes, dsub = codebooks.shape
    v = F.col(vec_col).cast("array<double>")
    nrm = _vec_norm(v)
    code_cols = []
    for j in range(m):
        structs = []
        for c in range(k_codes):
            c2 = float((codebooks[j, c] ** 2).sum())
            score = F.lit(c2) - F.lit(2.0) * (_sub_dot_lit(v, j, dsub, codebooks[j, c]) / nrm)
            structs.append(F.struct(score.alias("s"), F.lit(c).alias("c")))
        code_cols.append(F.array_min(F.array(*structs))["c"])
    return df.select(
        F.col(id_col),
        F.array(*code_cols).cast("array<int>").alias("codes"),
    )


def _adc_native(qv, qn, codes, codebooks: np.ndarray):
    """ADC score as one native expression: Σ_j dot(q_subj, B_j[code_j]),
    divided by ‖q‖ once at the end — a left-associated + chain, matching
    the SQL twin's (l0 + l1 + … + l_{m-1})/nrm exactly."""
    m, k_codes, dsub = codebooks.shape
    total = None
    for j in range(m):
        bj = F.array(
            *[
                F.array(*[F.lit(float(x)) for x in codebooks[j, c]])
                for c in range(k_codes)
            ]
        )
        cw = F.element_at(bj, F.element_at(codes, j + 1).cast("int") + 1)
        dot = F.aggregate(
            F.zip_with(F.slice(qv, j * dsub + 1, dsub), cw, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        total = dot if total is None else total + dot
    return total / qn


def pq_adc_topk_native(
    queries: DataFrame,
    corpus_codes: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exhaustive ADC top-k with native expressions — fully distributed
    (plain cross join, no driver query collect, no LUT state), bit-
    matchable against the DuckDB twin. Same semantics as pq_adc_topk;
    use that (LUT gathers per Arrow batch) when throughput matters."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("_qv"),
    ).withColumn("_qn", _vec_norm(F.col("_qv")))
    c = corpus_codes.select(F.col(id_col).alias("neighbor_id"), "codes")
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            _adc_native(F.col("_qv"), F.col("_qn"), F.col("codes"), codebooks).alias(
                "adc"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("adc").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "adc", "rank")
    )


def ivfadc_topk_native(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    nprobe: int = 2,
) -> DataFrame:
    """IVFADC with every float step native: cell assignment via the same
    literal-centroid fold assign_cells uses (the IVF oracle path), codes
    via pq_encode_native, ADC via _adc_native — the whole composition is
    bit-matchable against one DuckDB query. ivfadc_topk (Arrow assignment
    + LUT-gather scoring) is the production config."""
    from .ivf import _cell_ranks, assign_cells

    cells = assign_cells(corpus, id_col, vec_col, centroids).select(
        F.col(id_col), "cell"
    )
    codes = (
        pq_encode_native(corpus, id_col, vec_col, codebooks)
        .join(cells, id_col)
        .select(F.col(id_col).alias("neighbor_id"), "codes", "cell")
    )
    probes = (
        _cell_ranks(queries, id_col, vec_col, centroids)
        .filter(F.col("rank") <= nprobe)
        .select(
            F.col("_id").alias("query_id"),
            F.col("_v").cast("array<double>").alias("_qv"),
            "cell",
        )
        .withColumn("_qn", _vec_norm(F.col("_qv")))
    )
    scored = (
        probes.join(codes, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            _adc_native(F.col("_qv"), F.col("_qn"), F.col("codes"), codebooks).alias(
                "adc"
            ),
        )
        # no dedup needed: each corpus vector lives in exactly ONE cell
        # (rank==1) and a query's probed cells are distinct, so a
        # (query, neighbor) pair occurs at most once — a dropDuplicates
        # here would be a pure extra shuffle (r4 review)
    )
    w = Window.partitionBy("query_id").orderBy(F.col("adc").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "adc", "rank")
    )
