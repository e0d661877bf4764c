"""Canopy clustering (McCallum, Nigam, Ungar, "Efficient Clustering of
High-Dimensional Data Sets with Application to Reference Matching",
KDD 2000) — the classic cheap-distance blocking step: overlapping
canopies from a cheap similarity, so the expensive pairwise scoring only
runs inside canopies.

The paper's algorithm is sequential: repeatedly pick a remaining point
as a center, put every remaining point within the LOOSE threshold into
its canopy, and delete every point within the TIGHT threshold from the
remaining list (tight ⊆ loose). We fix the pick order to ascending
record id, which makes the whole construction deterministic and gives it
a closed parallel form:

  * The center set is exactly the lexicographically-first maximal
    independent set (LFMIS) of the TIGHT graph: a point is a center iff
    no smaller center is tight to it. Computed distributedly by iterated
    local-minima rounds — round r selects every remaining point with no
    smaller remaining tight neighbor, then deletes the selected centers
    and their tight neighbors (the standard parallel greedy-MIS
    schedule, which reproduces the sequential greedy MIS exactly; same
    family as assignment.py's locally-dominant matching).
  * Membership then needs no iteration at all: a point x was deleted
    from the remaining list at its smallest tight center's turn (its own
    turn if x is itself a center — for a center, every tight center is
    larger, else it would have been deleted first), so with

        t(x) = min( {x} if x is a center else {} ∪ {tight centers of x} )

    x ∈ canopy(c)  ⟺  c is a center, c ≤ t(x), and loose(c, x) or c = x.

    That is one groupBy + one join over the loose edges — the sequential
    scan order fully collapses into the t(x) bound.

Scale design: the cheap-similarity table is the already-capped blocking
graph (meta_blocking.blocking_graph over C2/C3-bounded blocks), so tight
and loose edge sets are degree-bounded; each MIS round is two
AQE-decided anti-joins plus one join on the (bounded) tight edges with
localCheckpoint lineage truncation; membership is a single join. No
Python in any plan.

Every point lands in ≥ 1 canopy: centers carry themselves, and a
non-center is tight-adjacent to some center (MIS maximality), whose
canopy it joins (tight ⊆ loose). Canopies OVERLAP by design — that is
what makes canopy blocking recall-safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sym(edges: DataFrame) -> DataFrame:
    """(id1, id2) → symmetric (a, b), self-pairs dropped."""
    e = edges.filter(F.col("id1") != F.col("id2"))
    return e.select(F.col("id1").alias("a"), F.col("id2").alias("b")).unionByName(
        e.select(F.col("id2").alias("a"), F.col("id1").alias("b"))
    )


def canopy_centers(
    points: DataFrame,
    tight: DataFrame,
    rounds: int | None = None,
    max_rounds: int = 64,
    stats: dict | None = None,
) -> DataFrame:
    """LFMIS of the tight graph under ascending id: the canopy centers.

    `points` is one column `n` (every record, so tight-isolated points
    become singleton centers); `tight` is canonical (id1, id2) pairs.
    `rounds=K` runs exactly K selection rounds (the oracle-twin
    semantics); `rounds=None` runs to the empty fixpoint. Every round
    deletes at least the globally smallest remaining point, so the loop
    terminates; `stats` receives {"rounds", "converged"} when passed.
    """
    te = _sym(tight).localCheckpoint(eager=True)
    remaining = points.select("n").localCheckpoint(eager=True)
    centers: list[DataFrame] = []
    converged = False
    ran = 0
    n_rounds = rounds if rounds is not None else max_rounds
    for _ in range(n_rounds):
        if remaining.isEmpty():
            converged = True
            break
        ran += 1
        # a remaining point is blocked this round if a SMALLER remaining
        # point is tight to it
        live = (
            te.join(remaining.withColumnRenamed("n", "a"), "a")
            .join(remaining.withColumnRenamed("n", "b"), "b")
            .filter(F.col("a") < F.col("b"))
        )
        # no distinct on the blocked set (r8): left_anti semantics are
        # unaffected by duplicate keys on the right side, and the dedup
        # was one pure-overhead Exchange+aggregate per MIS round
        blocked = live.select(F.col("b").alias("n"))
        cur = remaining.join(blocked, "n", "left_anti").localCheckpoint(eager=True)
        centers.append(cur)
        # the new centers leave (picked), their tight neighbors leave
        # (deleted by the paper's T2 rule)
        deleted = te.join(cur.withColumnRenamed("n", "a"), "a").select(
            F.col("b").alias("n")
        )
        remaining = (
            remaining.join(cur, "n", "left_anti")
            .join(deleted, "n", "left_anti")
            .localCheckpoint(eager=True)
        )
    else:
        converged = remaining.isEmpty()
    if stats is not None:
        stats["rounds"] = ran
        stats["converged"] = bool(converged)
    if rounds is None and not converged:
        raise RuntimeError(
            f"canopy_centers did not converge within max_rounds={max_rounds}"
        )
    if not centers:
        return points.select("n").filter(F.lit(False))
    out = centers[0]
    for c in centers[1:]:
        out = out.unionByName(c)
    return out


def canopy_clusters(
    points: DataFrame,
    sims: DataFrame,
    w_loose,
    w_tight,
    rounds: int | None = None,
    max_rounds: int = 64,
    stats: dict | None = None,
) -> DataFrame:
    """(center_id, record_id) canopy membership.

    `points`: one column `record_id` (the full point set). `sims`:
    canonical (id1, id2, w) cheap-similarity pairs — HIGHER w = closer,
    so the loose canopy-join bar is w ≥ w_loose and the tight delete bar
    is w ≥ w_tight, with w_tight ≥ w_loose (the threshold inversion vs
    the paper's distances; validated here).
    """
    if w_tight < w_loose:
        raise ValueError(
            f"w_tight ({w_tight}) must be >= w_loose ({w_loose}): the tight "
            "(delete) bar is the stricter similarity"
        )
    pts = points.select(F.col("record_id").alias("n"))
    tight = sims.filter(F.col("w") >= F.lit(w_tight)).select("id1", "id2")
    s = canopy_centers(
        pts, tight, rounds=rounds, max_rounds=max_rounds, stats=stats
    ).localCheckpoint(eager=True)
    # t(x): the turn at which x left the remaining list — its smallest
    # tight center, or itself if it is a center (a center's tight centers
    # are all larger, so min() folds both cases with one union)
    tsym = _sym(tight)
    tmin = (
        tsym.join(s.withColumnRenamed("n", "a"), "a")
        .select(F.col("b").alias("n"), F.col("a").alias("tc"))
        .unionByName(s.select("n", F.col("n").alias("tc")))
        .groupBy("n")
        .agg(F.min("tc").alias("tc"))
    )
    loose = _sym(sims.filter(F.col("w") >= F.lit(w_loose)).select("id1", "id2"))
    members = (
        loose.join(s.withColumnRenamed("n", "a"), "a")
        .join(tmin.withColumnRenamed("n", "b"), "b", "left")
        .filter(F.col("tc").isNull() | (F.col("a") <= F.col("tc")))
        .select(F.col("a").alias("center_id"), F.col("b").alias("record_id"))
    )
    self_rows = s.select(
        F.col("n").alias("center_id"), F.col("n").alias("record_id")
    )
    return members.unionByName(self_rows)


def canopy_candidate_pairs(members: DataFrame) -> DataFrame:
    """Canopy blocking's end product: distinct record pairs sharing at
    least one canopy — the bounded input to pairwise scoring."""
    a = members.select("center_id", F.col("record_id").alias("id1"))
    b = members.select("center_id", F.col("record_id").alias("id2"))
    return (
        a.join(b, "center_id")
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2")
        .distinct()
    )
