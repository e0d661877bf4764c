"""Test-set decontamination — n-gram overlap of a training corpus against
a held-out evaluation set (VERDICT r3 gap #4; the GPT-3 appendix-C /
Lee et al. hygiene step every LLM data pipeline runs before training).

A training doc is CONTAMINATED when it shares at least `min_hits`
length-`n` token windows with any holdout doc. The check is a semi-join
of the corpus's n-gram keys against the holdout's distinct key set.

Scale shape (100 TB corpus): the asymmetry is the whole design — eval
sets are tiny (thousands of docs, MBs of n-gram keys) while the corpus is
the 100 TB side. The holdout key set is therefore BROADCAST: the corpus
n-gram stream joins it map-side with no shuffle, and only the (rare)
hits reach the per-doc aggregation. The corpus is never shuffled on the
gram key. n-gram keys are md5 of the space-joined window (byte-parity
with the DuckDB twin); swap md5_long/xxhash64 in production if the hash
cost shows up — the semantics don't change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _gram_keys(docs: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(id, gkey): md5 keys of every length-`n` token window, de-duplicated
    WITHIN each doc by a row-local array_distinct — never a global
    .distinct(), which would shuffle the whole corpus gram stream on the
    gram key (caught by the plan check: an Exchange on the 100 TB side).
    Single-space tokenization, same as repeated_substring_spans."""
    toks = docs.select(
        F.col(id_col).alias("_doc"), F.split(F.col(text_col), " ").alias("_toks")
    )
    sz = F.size("_toks")
    return toks.filter(sz >= n).select(
        "_doc",
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(0), sz - n, F.lit(1)),
                    lambda i: F.md5(F.array_join(F.slice("_toks", i + 1, n), " ")),
                )
            )
        ).alias("gkey"),
    )


def decontaminate(
    corpus: DataFrame,
    holdout: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_hits: int = 1,
    assume_unique_ids: bool = True,
) -> DataFrame:
    """(id, n_overlap, contaminated) for EVERY corpus doc: n_overlap is
    the number of distinct length-`n` windows the doc shares with the
    holdout set; contaminated = n_overlap >= min_hits. Filter the corpus
    on ~contaminated to get the train-safe subset.

    PRECONDITION (ADVICE r4): `id_col` must be unique in `corpus` — a
    duplicated id fans out in the final left join (duplicated output rows)
    and double-counts its grams in n_overlap. The default trusts the
    caller (the id projection stays shuffle-free, the 100 TB shape); pass
    assume_unique_ids=False to pay one dropDuplicates shuffle on the id
    projection and get exactly one output row per id (n_overlap then sums
    over all copies of that id)."""
    hk = F.broadcast(
        _gram_keys(holdout, id_col, text_col, n).select("gkey").distinct()
    )
    hits = (
        _gram_keys(corpus, id_col, text_col, n)
        .join(hk, "gkey")
        .groupBy("_doc")
        .agg(F.count(F.lit(1)).cast("long").alias("n_overlap"))
    )
    ids = corpus.select(F.col(id_col))
    if not assume_unique_ids:
        ids = ids.dropDuplicates([id_col])
    return (
        ids.join(hits.withColumnRenamed("_doc", id_col), id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_overlap", F.lit(0)).cast("long").alias("n_overlap"),
            (F.coalesce("n_overlap", F.lit(0)) >= min_hits).alias("contaminated"),
        )
    )


def decontaminate_provenance(
    corpus: DataFrame,
    holdout: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_hits: int = 1,
) -> DataFrame:
    """Audit trail for flagged docs (VERDICT r4 stretch #8): for every
    contaminated corpus doc, WHICH holdout doc contaminates it most.

    Emits (id, top_holdout_id, n_shared_top, n_holdout_docs): the holdout
    doc sharing the most distinct length-`n` windows with this corpus doc
    (ties → smallest holdout id), that count, and how many distinct
    holdout docs share at least one window. Contaminated docs only —
    filter-side audit, not the full report (`decontaminate` is that).
    Pass the SAME `min_hits` as the `decontaminate` call being audited
    (r5 review): "contaminated" here means total distinct shared windows
    (matching ANY holdout doc — `decontaminate`'s n_overlap) >= min_hits,
    so the audit set never lists docs the filter deliberately retained.

    Scale shape: identical to `decontaminate` — the holdout (gkey,
    holdout_id) pairs are BROADCAST (eval sets are tiny), the corpus gram
    stream joins map-side, and only the rare hit pairs reach the
    per-(corpus_doc, holdout_doc) aggregation and the per-doc argmax
    window (partitioned by corpus doc over hit rows only — never the
    corpus). Same unique-id precondition as `decontaminate`.
    """
    hk = F.broadcast(
        _gram_keys(holdout, id_col, text_col, n).withColumnRenamed(
            "_doc", "h_doc"
        )
    )
    hitrows = _gram_keys(corpus, id_col, text_col, n).join(hk, "gkey")
    pair = hitrows.groupBy("_doc", "h_doc").agg(
        F.count(F.lit(1)).cast("long").alias("n_shared")
    )
    if min_hits > 1:
        # doc-level contamination bar, aligned with decontaminate's
        # n_overlap: DISTINCT shared windows across all holdout docs (the
        # per-(doc, h_doc) counts double-count a window shared with
        # several holdout docs). Aggregates hit rows only — still
        # delta-proportional to contamination, never the corpus.
        flagged = (
            hitrows.groupBy("_doc")
            .agg(F.countDistinct("gkey").alias("_tot"))
            .filter(F.col("_tot") >= min_hits)
            .select("_doc")
        )
        pair = pair.join(flagged, "_doc", "left_semi")
    w = Window.partitionBy("_doc")
    wo = w.orderBy(F.col("n_shared").desc(), F.col("h_doc").asc())
    return (
        pair.withColumn("rn", F.row_number().over(wo))
        .withColumn(
            "n_holdout_docs", F.count(F.lit(1)).over(w).cast("long")
        )
        .filter(F.col("rn") == 1)
        .select(
            F.col("_doc").alias(id_col),
            F.col("h_doc").alias("top_holdout_id"),
            F.col("n_shared").alias("n_shared_top"),
            "n_holdout_docs",
        )
    )
