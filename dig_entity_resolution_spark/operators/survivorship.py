"""Survivorship / golden-record consolidation (SURVEY.md §2.E end
product): after transitive closure assigns every record to a cluster,
merge each cluster into ONE canonical record by per-attribute rules.

This is the classic last stage of an ER pipeline (data-fusion
"conflict resolution" in the Bleiholder & Naumann survey, ACM CS 2008):
clustering says WHICH records co-refer; survivorship decides what the
merged entity LOOKS like. Rules implemented, each fully deterministic:

  * ``majority`` — most frequent non-null value; ties break by value
    ascending (Bleiholder & Naumann's "vote" with a total order).
  * ``longest``  — longest non-null string; ties by value asc.
  * ``min`` / ``max`` — extremal value (e.g. earliest created_at).

Scale design: one groupBy per ``min``/``max`` attribute and one
(groupBy + window) per ``majority``/``longest`` attribute — all keyed on
cluster_id, so partial aggregation bounds the shuffle by the number of
CLUSTERS, not records, for the agg rules; the window rules shuffle the
record table once per attribute but the per-cluster partitions are
cluster-sized (bounded by the dedup cap upstream, never corpus-sized).
Attribute winners join back on cluster_id — broadcast-eligible when the
cluster count is small, AQE-decided otherwise. No Python in the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

Rule = str
_RULES = ("majority", "longest", "min", "max")


def _majority_winner(base: DataFrame, col: str) -> DataFrame:
    """(cluster_id, col) most frequent non-null value, ties by value asc."""
    counts = (
        base.filter(F.col(col).isNotNull())
        .groupBy("cluster_id", col)
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    win = Window.partitionBy("cluster_id").orderBy(
        F.col("_n").desc(), F.col(col)
    )
    return (
        counts.withColumn("_rn", F.row_number().over(win))
        .filter(F.col("_rn") == 1)
        .select("cluster_id", col)
    )


def _longest_winner(base: DataFrame, col: str) -> DataFrame:
    """(cluster_id, col) longest non-null value, ties by value asc."""
    win = Window.partitionBy("cluster_id").orderBy(
        F.length(col).desc(), F.col(col)
    )
    return (
        base.filter(F.col(col).isNotNull())
        .select("cluster_id", col)
        .withColumn("_rn", F.row_number().over(win))
        .filter(F.col("_rn") == 1)
        .select("cluster_id", col)
    )


def golden_records(
    records: DataFrame,
    assign: DataFrame,
    rules: dict[str, Rule],
    id_col: str = "record_id",
) -> DataFrame:
    """One canonical row per cluster.

    ``records``: the attribute table (must contain ``id_col`` and every
    rule column). ``assign``: (id_col, cluster_id) from
    connected_components / near-dup clustering — every record id must
    appear (singletons carry their own id as cluster_id, the upstream
    convention). Output: cluster_id, n_members, rep_id (min record id —
    the stable cluster representative), then one column per rule, named
    after the source column.

    A cluster whose values for a ``majority``/``longest`` column are all
    NULL keeps NULL for that column (left join from the spine).
    """
    for col, rule in rules.items():
        if rule not in _RULES:
            raise ValueError(f"unknown survivorship rule {rule!r} for {col!r}")
        if col == id_col:
            raise ValueError("id_col cannot carry a survivorship rule")
    base = records.join(assign, id_col)
    # spine: every cluster, its size, and the deterministic representative
    agg_exprs = [
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.min(id_col).alias("rep_id"),
    ]
    # min/max rules piggyback on the spine groupBy — zero extra shuffles
    for col, rule in rules.items():
        if rule == "min":
            agg_exprs.append(F.min(col).alias(col))
        elif rule == "max":
            agg_exprs.append(F.max(col).alias(col))
    out = base.groupBy("cluster_id").agg(*agg_exprs)
    for col, rule in rules.items():
        if rule == "majority":
            out = out.join(_majority_winner(base, col), "cluster_id", "left")
        elif rule == "longest":
            out = out.join(_longest_winner(base, col), "cluster_id", "left")
    return out
