"""Meta-blocking: graph-based block-collection refinement
(Papadakis, Koutrika, Palpanas, Nejdl, "Meta-Blocking: Taking Entity
Resolution to the Next Level", TKDE 2014; pruning-scheme taxonomy from
Papadakis et al., "Comparative Analysis of Approximate Blocking
Techniques for Entity Resolution", VLDB 2016).

Where C2/C3 (operators/blocking.py) bound blocks by SIZE, meta-blocking
prunes by SIGNAL: it weights every co-occurring record pair by how much
blocking evidence supports it, then drops low-weight edges before the
expensive pairwise-scoring stage ever sees them. The classic pipeline is

    blocks → blocking graph (edge = pair, weight = co-occurrence stat)
           → edge/node pruning → surviving candidate pairs

Weighting schemes (``blocking_graph``):
  * ``cbs``  — Common Blocks Scheme: # blocks the pair shares (integer).
  * ``js``   — Jaccard Scheme: |Bi ∩ Bj| / (|Bi| + |Bj| − |Bi ∩ Bj|).
  * ``ecbs`` — Enhanced CBS: CBS · log10(|B|/|Bi|) · log10(|B|/|Bj|).

Pruning schemes:
  * ``wep`` — Weight Edge Pruning: keep edges with weight ≥ the global
    mean weight (edge-centric, threshold-based).
  * ``wnp`` — Weighted Node Pruning: keep an edge if its weight ≥ the
    local mean of EITHER endpoint's incident edges (the
    redundancy-positive variant of the paper).
  * ``cnp`` — Cardinality Node Pruning: keep an edge if it ranks in the
    top-k incident edges of either endpoint (rank by weight desc,
    neighbor id asc — deterministic under ties).

Scale design (the whole point — this runs BEFORE scoring at 10^12 docs):
  * The blocking graph is built from a block table that has already been
    through stop-key suppression / per-block caps (C2/C3), so the
    per-block self-join is bounded exactly like candidate_pairs.
  * Edge weights are one groupBy on the pair key — partial-aggregated
    map-side (a pair co-occurring in k blocks combines to one row per
    map task before the shuffle).
  * WEP's global mean is a single 1-row aggregate broadcast back with a
    crossJoin (the evaluate.py:77 pattern) — no second shuffle of the
    edge table. The comparison is ``w · n ≥ Σw`` (multiply-through,
    never divide), which is EXACT integer arithmetic for CBS weights:
    w ≤ blocks-per-record (bounded small), n ≤ 10^15 edges still fits
    int64 with headroom.
  * WNP/CNP group/window by node id; node degree is bounded by
    (blocks-per-record × block-cap) thanks to C2/C3, so no per-node
    partition can blow up regardless of corpus-level skew.

Everything is native DataFrame ops — no Python in the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def blocking_graph(blocks: DataFrame, scheme: str = "cbs") -> DataFrame:
    """(id1, id2, w) weighted edges from a (block_key, record_id) table.

    ``cbs`` yields an integer (long) weight; ``js``/``ecbs`` yield doubles.
    Input must already be size-bounded (suppress_stop_keys / cap_block_size)
    — this function will happily emit O(block²) rows from an unbounded hot
    block, exactly like candidate_pairs.
    """
    a = blocks.select("block_key", F.col("record_id").alias("id1"))
    b = blocks.select("block_key", F.col("record_id").alias("id2"))
    cbs = (
        a.join(b, "block_key")
        .filter(F.col("id1") < F.col("id2"))
        .groupBy("id1", "id2")
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )
    if scheme == "cbs":
        return cbs
    # |Bi| per record — a groupBy on record_id, small result, broadcast.
    sizes = blocks.groupBy(F.col("record_id")).agg(
        F.count(F.lit(1)).cast("long").alias("nb")
    )
    s1 = sizes.select(F.col("record_id").alias("id1"), F.col("nb").alias("b1"))
    s2 = sizes.select(F.col("record_id").alias("id2"), F.col("nb").alias("b2"))
    joined = cbs.join(s1, "id1").join(s2, "id2")
    if scheme == "js":
        return joined.select(
            "id1",
            "id2",
            (
                F.col("w").cast("double")
                / (F.col("b1") + F.col("b2") - F.col("w")).cast("double")
            ).alias("w"),
        )
    if scheme == "ecbs":
        # |B| = total distinct blocks; 1-row broadcast.
        nblocks = blocks.agg(
            F.count_distinct("block_key").cast("double").alias("nb_total")
        )
        return (
            joined.crossJoin(F.broadcast(nblocks))
            .select(
                "id1",
                "id2",
                (
                    F.col("w").cast("double")
                    * F.log10(F.col("nb_total") / F.col("b1"))
                    * F.log10(F.col("nb_total") / F.col("b2"))
                ).alias("w"),
            )
        )
    raise ValueError(f"unknown weighting scheme: {scheme!r}")


def wep(edges: DataFrame, weight_col: str = "w") -> DataFrame:
    """Weight Edge Pruning: keep edges with weight ≥ global mean weight.

    Multiply-through comparison (w·n ≥ Σw) so integer CBS weights prune
    with EXACT integer arithmetic — no float mean, no boundary ambiguity,
    and a DuckDB oracle twin can bit-match the kept set.
    """
    w = F.col(weight_col)
    tot = edges.agg(
        F.count(F.lit(1)).alias("_n_edges"), F.sum(w).alias("_sum_w")
    )
    return (
        edges.crossJoin(F.broadcast(tot))
        .filter(w * F.col("_n_edges") >= F.col("_sum_w"))
        .drop("_n_edges", "_sum_w")
    )


def _symmetric(edges: DataFrame, weight_col: str) -> DataFrame:
    """(u, v, w) with both orientations of every canonical edge."""
    return edges.select(
        F.col("id1").alias("u"), F.col("id2").alias("v"), F.col(weight_col)
    ).unionByName(
        edges.select(
            F.col("id2").alias("u"), F.col("id1").alias("v"), F.col(weight_col)
        )
    )


def wnp(edges: DataFrame, weight_col: str = "w") -> DataFrame:
    """Weighted Node Pruning (redundancy-positive): keep an edge iff its
    weight ≥ the mean incident-edge weight of at least one endpoint.

    Node means use the same multiply-through form as wep() — exact for
    integer weights. One groupBy on node id (degree bounded by C2/C3),
    two broadcast-friendly joins back onto the canonical edge table.
    """
    w = F.col(weight_col)
    sym = _symmetric(edges, weight_col)
    node_tot = sym.groupBy("u").agg(
        F.count(F.lit(1)).alias("_deg"), F.sum(weight_col).alias("_sw")
    )
    t1 = node_tot.select(
        F.col("u").alias("id1"),
        F.col("_deg").alias("_deg1"),
        F.col("_sw").alias("_sw1"),
    )
    t2 = node_tot.select(
        F.col("u").alias("id2"),
        F.col("_deg").alias("_deg2"),
        F.col("_sw").alias("_sw2"),
    )
    return (
        edges.join(t1, "id1")
        .join(t2, "id2")
        .filter(
            (w * F.col("_deg1") >= F.col("_sw1"))
            | (w * F.col("_deg2") >= F.col("_sw2"))
        )
        .drop("_deg1", "_sw1", "_deg2", "_sw2")
    )


def cnp(edges: DataFrame, k: int = 3, weight_col: str = "w") -> DataFrame:
    """Cardinality Node Pruning (redundancy-positive): keep an edge iff it
    is one of the top-k incident edges of either endpoint.

    Rank by (weight desc, neighbor id asc) — fully deterministic under
    weight ties, so the kept set is reproducible and oracle-checkable.
    """
    if k < 1:
        raise ValueError(f"cnp: k must be >= 1, got {k}")
    sym = _symmetric(edges, weight_col)
    win = Window.partitionBy("u").orderBy(F.col(weight_col).desc(), F.col("v"))
    kept = (
        sym.withColumn("_rn", F.row_number().over(win))
        .filter(F.col("_rn") <= k)
        .select(
            F.least("u", "v").alias("id1"), F.greatest("u", "v").alias("id2")
        )
        .dropDuplicates(["id1", "id2"])
    )
    return edges.join(kept, ["id1", "id2"], "left_semi")


def meta_blocked_pairs(
    blocks: DataFrame,
    scheme: str = "cbs",
    pruning: str = "wep",
    k: int = 3,
) -> DataFrame:
    """blocks → pruned candidate pairs, the full meta-blocking pipeline.

    Drop-in upgrade for candidate_pairs(): same (id1, id2) output shape
    (weights dropped), strictly fewer pairs, each backed by above-average
    blocking evidence instead of mere co-occurrence.
    """
    edges = blocking_graph(blocks, scheme)
    if pruning == "wep":
        pruned = wep(edges)
    elif pruning == "wnp":
        pruned = wnp(edges)
    elif pruning == "cnp":
        pruned = cnp(edges, k)
    else:
        raise ValueError(f"unknown pruning scheme: {pruning!r}")
    return pruned.select("id1", "id2")
