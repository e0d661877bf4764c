"""Line-level dedup — the CCNet / RefinedWeb paragraph-hash stage
(Wenzek et al. 2020 §3.1 "deduplicating paragraphs"; Penedo et al. 2023
RefinedWeb line-wise filtering — public methods).

Web pages share LINES, not whole documents: navigation bars, cookie
banners, footers, licence boilerplate. Document-level dedup (exact /
MinHash / SimHash) never sees them — two pages that are 90 % distinct
prose still both carry "Accept all cookies". The fix is corpus-wide
line-level removal: hash every line, count DISTINCT documents per line,
and strip lines that occur in ≥ `min_docs` documents, preserving each
document's remaining line order.

Contract (pinned by the DuckDB twin, so every clause is deliberate):
  * a line is a '\\n'-separated segment of `text` (split preserves empty
    trailing segments — both engines agree);
  * counting is by the TRIMMED line (leading/trailing spaces don't make
    a banner unique) over DISTINCT documents (a page repeating its own
    nav bar 5× contributes 1);
  * empty-after-trim lines are structure, not content: never counted,
    always kept;
  * the OUTPUT keeps the original (untrimmed) line text, rejoined with
    '\\n'; a document whose every line was boilerplate keeps an empty
    string (the row survives — downstream length filters decide).

100 TB shape: one explode (linear in corpus lines), one groupBy on the
trimmed-line key with map-side partial aggregation (the same Zipf-skew
posture as token blocking — the head key "Accept all cookies" partially
aggregates per partition, never materializing its full posting list),
one join back, one order-preserving reassembly groupBy. No Python, no
driver collect; the common-lines set is corpus-dependent so the join is
AQE-decided (broadcast when small, shuffle when not).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def line_rows(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, pos, line): one row per '\\n'-separated line, 1-based pos."""
    return docs.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.split(F.col(text_col), "\n", -1)).alias("_p0", "line"),
    ).select("_id", (F.col("_p0") + 1).alias("pos"), "line")


def common_lines(
    docs: DataFrame,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(key, n_docs): trimmed non-empty lines occurring in ≥ min_docs
    DISTINCT documents — the corpus-wide boilerplate table."""
    keys = (
        line_rows(docs, id_col, text_col)
        .select("_id", F.trim(F.col("line")).alias("key"))
        .filter(F.col("key") != "")
        .dropDuplicates(["_id", "key"])
    )
    return (
        keys.groupBy("key")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= F.lit(min_docs))
    )


def line_dedup(
    docs: DataFrame,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, text): every document with its corpus-common lines removed,
    remaining lines rejoined in original order. Schema-stable: exactly
    one output row per input row, empty string when nothing survives.
    NULL text is treated as an empty document (splits to no rows → ''):
    this operator is a CLEANER, so it normalizes rather than raising —
    unlike the tokenize/score stages, where a silently-empty doc would
    corrupt downstream statistics (their raise_error contract stands)."""
    lines = line_rows(docs, id_col, text_col)
    common = common_lines(docs, min_docs, id_col, text_col).select("key")
    kept = lines.withColumn("_k", F.trim(F.col("line"))).join(
        common.withColumnRenamed("key", "_k"), "_k", "left_anti"
    )
    rebuilt = kept.groupBy("_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda x: x["line"],
            ),
            "\n",
        ).alias("_text")
    )
    return (
        docs.select(F.col(id_col).alias("_id"))
        .join(rebuilt, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce("_text", F.lit("")).alias(text_col),
        )
    )
