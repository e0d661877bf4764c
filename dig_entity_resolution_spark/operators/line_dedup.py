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

100 TB shape: TWO linear explode passes over the corpus — the CCNet
shape exactly (pass 1 counts line hashes, pass 2 strips) — because
Spark does not share subplans across the count branch and the keep
branch of one query. Each pass is one groupBy on the trimmed-line key
with map-side partial aggregation (the same Zipf-skew posture as token
blocking — the head key "Accept all cookies" partially aggregates per
partition, never materializing its full posting list), then one join
back and one order-preserving reassembly groupBy. No Python, no driver
collect; the common-lines set is corpus-dependent so the join is
AQE-decided (broadcast when small, shuffle when not). When the double
extract cost matters at scale, materialize ``line_rows(docs)`` to
parquet ONCE and pass it as ``lines=`` to both `common_lines` and
`line_dedup` — then each pass reads the line table instead of
re-exploding the raw corpus.
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
    lines: DataFrame | None = None,
) -> DataFrame:
    """(key, n_docs): trimmed non-empty lines occurring in ≥ min_docs
    DISTINCT documents — the corpus-wide boilerplate table. Pass a
    materialized ``line_rows`` table as ``lines=`` to skip the explode."""
    rows = lines if lines is not None else line_rows(docs, id_col, text_col)
    keys = (
        rows
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
    lines: DataFrame | None = None,
) -> DataFrame:
    """(id, text): every document with its corpus-common lines removed,
    remaining lines rejoined in original order. Schema-stable: exactly
    one output row per input row, empty string when nothing survives.
    NULL text is treated as an empty document (splits to no rows → ''):
    this operator is a CLEANER, so it normalizes rather than raising —
    unlike the tokenize/score stages, where a silently-empty doc would
    corrupt downstream statistics (their raise_error contract stands).

    ``lines=``: a pre-materialized ``line_rows(docs)`` table; both the
    count pass and the strip pass then read it instead of re-exploding
    the corpus (the 100 TB posture — see module docstring)."""
    if lines is None:
        lines = line_rows(docs, id_col, text_col)
    common = common_lines(
        docs, min_docs, id_col, text_col, lines=lines
    ).select("key")
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
