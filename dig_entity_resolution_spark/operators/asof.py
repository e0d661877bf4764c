"""As-of (point-in-time) join — the time-series join Spark lacks natively.

For each left row, attach the single most recent right row with
right_ts <= left_ts within the same key ("backward" direction; the
ASOF JOIN of DuckDB/kdb/pandas.merge_asof). The classic use here: enrich
a crawl/click event with the latest prior state snapshot of its entity.

Spark-first implementation — union + ordered window, NOT a range join:
tag both sides, sort each key's timeline once, and carry the last
non-null right payload forward:

    union(key, ts, side, payload) → Window.partitionBy(key)
      .orderBy(ts, side).rowsBetween(unboundedPreceding, current)
      → last(payload, ignorenulls=True) → keep left rows

One shuffle on the key and a per-key sort — O(n log n) per key, versus a
range-join's O(left × right-per-key) candidate explosion, and AQE-safe
(no driver state, no broadcast requirement). Right rows sort BEFORE left
rows at equal timestamps, giving inclusive (<=) semantics.

At 100 TB: the shuffle key is the join key — the same partitioning the
surrounding pipeline already uses for per-entity work; a skewed key means
a skewed timeline sort, bounded by that key's row count (sorting, not
pairing, so no quadratic blow-up).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload_cols: tuple[str, ...],
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Backward as-of left join. Returns every `left` row plus
    `payload_cols` from the latest `right` row with right_ts <= left_ts
    for the same `on` key (NULLs when no prior right row exists, or when
    the match is older than `tolerance_seconds`).

    `right` must be unique per (on, right_ts) — with duplicates the
    carried payload would depend on shuffle order; pre-aggregate (e.g.
    max_by) to one row per timestamp first. Checked lazily: duplicate
    (key, ts) right rows raise at execution time rather than returning
    order-dependent results.

    NULL timestamps (ADVICE r3): right rows with a NULL `right_ts` are
    dropped before the union — under Spark's nulls-first ascending sort
    they would otherwise act as a "-infinity" snapshot matching every
    left row, which diverges from DuckDB/pandas ASOF semantics where an
    inequality against NULL never matches. Left rows with a NULL
    `left_ts` sort before every (non-NULL) right row and therefore carry
    a NULL payload — the same "no match" result merge_asof gives NaT.
    """
    clash = set(payload_cols) & set(left.columns)
    if clash:
        raise ValueError(
            f"asof_join: payload columns {sorted(clash)} collide with left "
            "columns — alias the right side's payload first"
        )
    reserved = {"_k", "_ts", "_p", "_side", "_l", "_m", "_rts"}
    bad = reserved & (set(left.columns) | set(payload_cols))
    if bad:
        raise ValueError(f"asof_join: column names {sorted(bad)} are reserved")
    key = F.col(on)
    # lazy uniqueness guard: a window count is one pass over the already-
    # shuffled right side; raise_error keeps the check inside the plan
    # (no extra action) — it fires only if a duplicate actually exists
    wdup = Window.partitionBy(on, right_ts)
    right = right.filter(F.col(right_ts).isNotNull())
    r = right.select(
        key.alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.when(
            F.count(F.lit(1)).over(wdup) > 1,
            F.raise_error(
                F.concat(
                    F.lit("asof_join: right side has duplicate (key, ts) at key="),
                    key.cast("string"),
                )
            ),
        ).otherwise(
            F.struct(*[F.col(c) for c in payload_cols], F.col(right_ts).alias("_rts"))
        ).alias("_p"),
        F.lit(0).alias("_side"),
    )
    l = left.select(
        key.alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(None).cast(r.schema["_p"].dataType).alias("_p"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
    )
    r = r.withColumn("_l", F.lit(None).cast(l.schema["_l"].dataType))
    timeline = r.unionByName(l)
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = timeline.withColumn("_m", F.last("_p", ignorenulls=True).over(w))
    out = carried.filter(F.col("_side") == 1)
    if tolerance_seconds is not None:
        fresh = (
            F.col("_ts").cast("long") - F.col("_m._rts").cast("long")
        ) <= tolerance_seconds
        out = out.withColumn("_m", F.when(fresh, F.col("_m")))
    return out.select(
        *[F.col(f"_l.{c}").alias(c) for c in left.columns],
        *[F.col(f"_m.{c}").alias(c) for c in payload_cols],
    )
