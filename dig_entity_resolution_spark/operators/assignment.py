"""One-to-one record linkage: greedy weight-descending assignment via
iterated locally-dominant edge selection.

Transitive closure (operators/cluster.py) answers "which records refer
to the same entity" with an unconstrained partition — fine for dedup,
wrong for classic two-source record linkage, where each record of source
A matches AT MOST ONE record of source B (Christen, "Data Matching",
Springer 2012, ch. 6: the assignment / one-to-one restriction step that
follows pairwise classification). The textbook solution is the greedy
matching: process scored pairs in a total order

    (w DESC, id1 ASC, id2 ASC)

and accept a pair iff neither record is already matched. That loop is
inherently serial, so at 10^12 pairs we run the parallel formulation
that provably computes the SAME matching: a pair is *locally dominant*
when it is the first pair, under the total order, incident to BOTH of
its records (Preis, STACS 1999; Manne & Bisseling, "A parallel
approximation algorithm for the weighted maximum matching problem",
PPAM 2007 — the local-max matching, a 1/2-approximation of maximum
weight matching that under a total edge order equals the sequential
greedy matching exactly). Each round selects every locally dominant
pair at once, removes the matched records, and repeats; the globally
first remaining pair is always dominant, so every round makes progress
and the loop terminates.

Scale design:
  * One round = one shuffle on the record key (the per-node best-pair
    window) + one partial-aggregated groupBy on the pair key (a pair is
    dominant iff it is the best pair of exactly 2 endpoints) + two
    anti-joins against THIS round's matched records (delta-sized; join
    strategy left to AQE, never forced broadcast — a first round over a
    dense graph can match O(n) records).
  * Node degree is bounded upstream by the blocking caps (C2/C3 /
    meta-blocking), so no per-record window partition blows up on a
    skewed corpus.
  * Rounds needed: O(log n) expected for random weights; the adversarial
    worst case is a weight-decreasing path (n/2 rounds — see the pytest
    that pins it). Lineage is localCheckpoint-truncated per round, the
    operators/cluster.py discipline.
  * Everything is native DataFrame ops — no Python in the plan
    (asserted by tests/test_assignment.py).

The `rounds=` mode exists for the cross-engine oracle: "exactly K
rounds of locally-dominant selection" is a deterministic function that
an unrolled K-stage SQL twin reproduces hash-exactly, convergence or
not; a separate pytest pins that K rounds reach the fixpoint on the
registry fixture, so there the query IS the full greedy matching.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def locally_dominant(pairs: DataFrame) -> DataFrame:
    """One selection round: the pairs that are the best incident pair of
    BOTH their records under the total order (w DESC, id1 ASC, id2 ASC).

    Input must be one row per unordered pair (canonical id1 < id2 is the
    usual shape, but any orientation works — the order key uses the
    columns as given). Self-pairs (id1 == id2) are ignored: a record
    cannot link to itself, and counting one twice would fake dominance.
    """
    pairs = pairs.filter(F.col("id1") != F.col("id2"))
    w = Window.partitionBy("u").orderBy(
        F.col("w").desc(), F.col("id1").asc(), F.col("id2").asc()
    )
    best = (
        pairs.select(F.col("id1").alias("u"), "id1", "id2", "w")
        .unionByName(pairs.select(F.col("id2").alias("u"), "id1", "id2", "w"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    # a pair can be the best of at most its two endpoints; best-of-both
    # <=> it appears twice. groupBy on the pair key partial-aggregates
    # map-side, and reattaching w via the pairs join keeps the weight
    # column's exact type (no need to carry it through the count).
    dom_keys = (
        best.groupBy("id1", "id2")
        .agg(F.count(F.lit(1)).alias("n_best"))
        .filter(F.col("n_best") == 2)
        .select("id1", "id2")
    )
    return pairs.join(dom_keys, ["id1", "id2"])


def one_to_one_match(
    pairs: DataFrame,
    rounds: int | None = None,
    max_rounds: int = 64,
    stats: dict | None = None,
) -> DataFrame:
    """Greedy one-to-one matching over scored pairs (id1, id2, w).

    Returns the matched subset of `pairs` (same columns). Each record id
    appears in at most one output row. With `rounds=None` (production)
    the loop runs to the empty fixpoint and raises if `max_rounds` is
    exhausted first; with `rounds=K` it runs exactly K selection rounds
    and stops — the oracle-twin semantics (deterministic regardless of
    convergence; equal to the full greedy matching whenever the fixpoint
    is reached within K, which the registry pytest pins for the fixture).

    Input contract: one row per unordered pair — duplicate (id1, id2)
    rows would fake dominance counts, and a pair present in both
    orientations is two conflicting edges. Callers produce canonical
    id1 < id2 pairs (candidate_pairs / blocking_graph do).

    When `stats` (a dict) is passed it is filled with {"rounds": rounds
    actually run, "converged": whether the edge set emptied}.
    """
    n_rounds = rounds if rounds is not None else max_rounds
    remaining = pairs.filter(F.col("id1") != F.col("id2")).localCheckpoint(
        eager=True
    )
    matched: list[DataFrame] = []
    converged = False
    ran = 0
    for _ in range(n_rounds):
        if remaining.isEmpty():
            converged = True
            break
        ran += 1
        dom = locally_dominant(remaining).localCheckpoint(eager=True)
        matched.append(dom)
        # only THIS round's matched records need removing — earlier
        # rounds' records already left `remaining`.
        nodes = dom.select(F.col("id1").alias("n")).unionByName(
            dom.select(F.col("id2").alias("n"))
        )
        remaining = (
            remaining.join(nodes, remaining["id1"] == nodes["n"], "left_anti")
            .join(nodes, remaining["id2"] == nodes["n"], "left_anti")
            .localCheckpoint(eager=True)
        )
    else:
        converged = remaining.isEmpty()
    if stats is not None:
        stats["rounds"] = ran
        stats["converged"] = bool(converged)
    if rounds is None and not converged:
        raise RuntimeError(
            f"one_to_one_match did not converge within max_rounds={max_rounds}"
        )
    if not matched:
        return pairs.filter(F.lit(False))
    out = matched[0]
    for m in matched[1:]:
        out = out.unionByName(m)
    return out
