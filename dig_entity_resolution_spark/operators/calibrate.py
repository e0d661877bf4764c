"""Match-threshold calibration against labeled pairs (SURVEY.md §7 M6).

Sweeps τ over the observed score distribution in ONE distributed pass:
for a grid of candidate thresholds, count TP/FP/FN per τ via a single
groupBy over (bucketed score × label) and pick the τ maximizing pairwise F1.
No per-τ jobs, no driver-side score collection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def calibrate_threshold(
    scored: DataFrame,
    labels: DataFrame,
    grid: int = 100,
) -> tuple[float, float]:
    """Returns (best_tau, best_f1).

    scored — (id1, id2, score); labels — (id1, id2, label:boolean).
    Pairs in `labels` missing from `scored` count as score 0 (blocking
    missed them → predicted non-match at every τ).
    """
    joined = (
        labels.join(
            scored.select("id1", "id2", "score"), ["id1", "id2"], "left"
        )
        .select(
            "label", F.coalesce("score", F.lit(0.0)).alias("score")
        )
        .withColumn("bucket", F.least(F.floor(F.col("score") * grid), F.lit(grid)))
    )
    hist = (
        joined.groupBy("bucket", "label")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    pos = {}
    neg = {}
    for r in hist:
        (pos if r["label"] else neg)[int(r["bucket"])] = r["n"]
    total_pos = sum(pos.values())
    best_tau, best_f1 = 0.5, -1.0
    # τ = b/grid predicts match iff score >= τ  ⟺  bucket >= b
    tp = total_pos
    fp = sum(neg.values())
    for b in range(0, grid + 2):
        denom = 2 * tp + fp + (total_pos - tp)
        f1 = (2 * tp / denom) if denom else 0.0
        if f1 > best_f1:
            best_f1, best_tau = f1, b / grid
        tp -= pos.get(b, 0)
        fp -= neg.get(b, 0)
    return best_tau, best_f1
