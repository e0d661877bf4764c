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
