"""Pairwise precision/recall/F1 against labeled pairs (SURVEY.md §2.F F9).

The headline acceptance metric [BASELINE.json:2]: pairwise F1 ≥ 0.99 on
labeled pairs. Predictions are evaluated ONLY on labeled pairs (the standard
record-linkage protocol — Christen 2012 ch.7): a labeled pair is a true/false
positive according to is_match, and a positive label missing from the
predicted matches is a false negative.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canon(df: DataFrame) -> DataFrame:
    return df.select(
        F.least("id1", "id2").alias("id1"),
        F.greatest("id1", "id2").alias("id2"),
        *[c for c in df.columns if c not in ("id1", "id2")],
    )


def pairwise_prf(matches: DataFrame, labels: DataFrame) -> DataFrame:
    """One-row DataFrame: tp, fp, fn, precision, recall, f1.

    `matches` — predicted match pairs (id1,id2), canonicalized here.
    `labels`  — (id1, id2, label:boolean) ground truth pairs.
    """
    pred = _canon(matches).select("id1", "id2").withColumn("pred", F.lit(True))
    lab = _canon(labels).select("id1", "id2", "label")
    joined = lab.join(pred, ["id1", "id2"], "left").select(
        "label", F.coalesce("pred", F.lit(False)).alias("pred")
    )
    agg = joined.agg(
        F.sum((F.col("label") & F.col("pred")).cast("long")).alias("tp"),
        F.sum((~F.col("label") & F.col("pred")).cast("long")).alias("fp"),
        F.sum((F.col("label") & ~F.col("pred")).cast("long")).alias("fn"),
    )
    return agg.select(
        "tp",
        "fp",
        "fn",
        (F.col("tp") / F.greatest(F.col("tp") + F.col("fp"), F.lit(1))).alias(
            "precision"
        ),
        (F.col("tp") / F.greatest(F.col("tp") + F.col("fn"), F.lit(1))).alias(
            "recall"
        ),
        (
            2
            * F.col("tp")
            / F.greatest(2 * F.col("tp") + F.col("fp") + F.col("fn"), F.lit(1))
        ).alias("f1"),
    )


def blocking_quality(
    cand_pairs: DataFrame, labels: DataFrame, n_records: int
) -> DataFrame:
    """Standard blocking evaluation (Christen 2012 ch.7 §7.3): one row of

      pair_completeness  = |true pairs ∩ candidates| / |true pairs|
                           (blocking recall ceiling — a true pair not in
                           any shared block can never be matched)
      pair_quality       = |true pairs ∩ candidates| / |candidates|
                           (candidate precision — how much scoring work
                           the blocks waste on non-matches)
      reduction_ratio    = 1 - |candidates| / C(n_records, 2)
                           (how much of the quadratic pair space blocking
                           pruned)

    The PC/RR trade-off is THE blocking tuning signal: stop-key caps push
    RR up and can push PC down; this operator makes the trade measurable
    per config. Distributed: one semi-join + two counts.
    """
    cand = _canon(cand_pairs).select("id1", "id2")
    true_pairs = _canon(labels.filter(F.col("label"))).select("id1", "id2")
    covered = true_pairs.join(cand, ["id1", "id2"], "left_semi")
    stats = true_pairs.agg(F.count(F.lit(1)).alias("n_true")).crossJoin(
        covered.agg(F.count(F.lit(1)).alias("n_covered"))
    ).crossJoin(cand.agg(F.count(F.lit(1)).alias("n_cand")))
    total_pairs = n_records * (n_records - 1) / 2.0
    return stats.select(
        "n_true",
        "n_covered",
        "n_cand",
        (F.col("n_covered") / F.greatest(F.col("n_true"), F.lit(1))).alias(
            "pair_completeness"
        ),
        (F.col("n_covered") / F.greatest(F.col("n_cand"), F.lit(1))).alias(
            "pair_quality"
        ),
        (1.0 - F.col("n_cand") / F.lit(max(total_pairs, 1.0))).alias(
            "reduction_ratio"
        ),
    )


def clustering_metrics(
    pred: DataFrame,
    truth: DataFrame,
    id_col: str = "record_id",
    pred_col: str = "cluster_id",
    truth_col: str = "label_id",
) -> DataFrame:
    """Partition-level clustering quality: B-cubed precision/recall/F1
    (Bagga & Baldwin 1998 — the standard ER clustering metric; unlike
    pairwise F1 it weights every RECORD equally, so one giant wrong
    cluster can't drown the small ones) and the Adjusted Rand Index
    (Hubert & Arabie 1985 — pair-counting agreement corrected for
    chance, 1 = identical partitions, ~0 = random).

    `pred` (id, pred_col) and `truth` (id, truth_col) are full
    partitions — every record carries exactly one id on each side
    (singletons use their own record id). Records missing from either
    side are ignored (inner join).

    Both metrics need only the CONTINGENCY CELLS n_ij = |pred cluster i
    ∩ truth cluster j|: every record in cell (i,j) has B³ precision
    n_ij/|i| and recall n_ij/|j|, so the per-record average collapses to
    Σ n_ij²/a_i / n — no per-record pass. Scale shape: one groupBy on
    (pred, truth) keys with map-side combine, two size re-aggregations
    of the CELL table (≤ cells rows, never the corpus), and a 1-row
    fold. ARI sums are pure BIGINT (C(n_ij,2) etc. — no float fold-order
    hazard); the B³ rational sums are double but fold to one row before
    any rounding. Output: one row (n, n_pred_clusters, n_true_clusters,
    bcubed_p/r/f1, ari; ratios rounded to 6).
    """
    j = pred.select(F.col(id_col).alias("_id"), F.col(pred_col).alias("_p")).join(
        truth.select(F.col(id_col).alias("_id"), F.col(truth_col).alias("_t")),
        "_id",
    )
    cells = j.groupBy("_p", "_t").agg(F.count(F.lit(1)).alias("nij"))
    ai = cells.groupBy("_p").agg(F.sum("nij").alias("ai"))
    bj = cells.groupBy("_t").agg(F.sum("nij").alias("bj"))
    t = cells.join(ai, "_p").join(bj, "_t")
    c2 = lambda c: (F.col(c) * (F.col(c) - 1) / 2).cast("long")  # noqa: E731
    # a_i/b_j repeat once per contingency cell of their cluster, so the
    # C(size,2) sums come from the SIZE tables, not the joined cells
    # (exact BIGINT sums either way — no float fold-order hazard)
    sa = ai.agg(F.sum(c2("ai")).cast("long").alias("_sa"))
    sb = bj.agg(F.sum(c2("bj")).cast("long").alias("_sb"))
    agg = (
        t.agg(
            F.sum("nij").cast("long").alias("n"),
            F.countDistinct("_p").cast("long").alias("n_pred_clusters"),
            F.countDistinct("_t").cast("long").alias("n_true_clusters"),
            F.sum(F.col("nij") * F.col("nij") / F.col("ai")).alias("_sp"),
            F.sum(F.col("nij") * F.col("nij") / F.col("bj")).alias("_sr"),
            F.sum(c2("nij")).cast("long").alias("_sij"),
        )
        .crossJoin(F.broadcast(sa))
        .crossJoin(F.broadcast(sb))
    )
    nn = F.greatest(F.col("n"), F.lit(1))
    bp = F.col("_sp") / nn
    br = F.col("_sr") / nn
    # ARI scalar formula in double: _sa * _sb is ~n⁴-scale and would
    # overflow BIGINT (ANSI throw) for corpora past ~50k records — the
    # component sums stay exact BIGINT, only this 1-row fold is float
    tot = (F.col("n").cast("double") * (F.col("n") - 1)) / 2.0
    exp = F.col("_sa").cast("double") * F.col("_sb") / F.greatest(tot, F.lit(1.0))
    denom = (F.col("_sa").cast("double") + F.col("_sb")) / 2.0 - exp
    ari = F.when(
        denom == 0, F.lit(1.0)  # both partitions all-singleton or one-cluster
    ).otherwise((F.col("_sij") - exp) / denom)
    return agg.select(
        "n",
        "n_pred_clusters",
        "n_true_clusters",
        F.round(bp, 6).alias("bcubed_p"),
        F.round(br, 6).alias("bcubed_r"),
        F.round(2 * bp * br / F.greatest(bp + br, F.lit(1e-12)), 6).alias(
            "bcubed_f1"
        ),
        F.round(ari, 6).alias("ari"),
    )


def cluster_pairs(clusters: DataFrame) -> DataFrame:
    """All intra-cluster pairs implied by a (record_id, cluster_id) table —
    lets F1 be computed from final clusters rather than raw match edges
    (transitive closure adds pairs the scorer never saw)."""
    a = clusters.select(F.col("cluster_id"), F.col("record_id").alias("id1"))
    b = clusters.select(F.col("cluster_id"), F.col("record_id").alias("id2"))
    return (
        a.join(b, "cluster_id")
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2")
    )
