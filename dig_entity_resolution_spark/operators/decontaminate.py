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

from pyspark.sql import DataFrame
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
) -> DataFrame:
    """(id, n_overlap, contaminated) for EVERY corpus doc: n_overlap is
    the number of distinct length-`n` windows the doc shares with the
    holdout set; contaminated = n_overlap >= min_hits. Filter the corpus
    on ~contaminated to get the train-safe subset."""
    hk = F.broadcast(
        _gram_keys(holdout, id_col, text_col, n).select("gkey").distinct()
    )
    hits = (
        _gram_keys(corpus, id_col, text_col, n)
        .join(hk, "gkey")
        .groupBy("_doc")
        .agg(F.count(F.lit(1)).cast("long").alias("n_overlap"))
    )
    return (
        corpus.select(F.col(id_col))
        .join(hits.withColumnRenamed("_doc", id_col), id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_overlap", F.lit(0)).cast("long").alias("n_overlap"),
            (F.coalesce("n_overlap", F.lit(0)) >= min_hits).alias("contaminated"),
        )
    )
