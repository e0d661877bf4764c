"""Deterministic sampling for training-data pipelines.

Spark's native sample()/sampleBy() are seeded-RNG based and NOT
reproducible across engines, partitionings, or retries. Training-data
curation needs sampling that is a pure FUNCTION of the row key — stable
under recomputation, checkpoint/resume, and auditable from SQL. These
operators bucket each row by md5 of (salt, id) into [0, 10000) and keep
rows below fraction·10000; the same expression is computable in any
engine with md5 (the DuckDB oracle twins in queries.py prove it).

At 100 TB each is a single codegen'd filter over the scan — no shuffle,
no RNG state, trivially pushed past column pruning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_long

BUCKETS = 10_000  # 0.01% rate resolution


def sample_bucket(id_col: Column | str, salt: str = "s0") -> Column:
    """Deterministic bucket in [0, BUCKETS) from (salt, id). Different
    salts give independent sampling decisions over the same ids (e.g. one
    salt for subsampling, another for the train/val split)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.pmod(
        md5_long(F.concat(F.lit(f"{salt}:"), c.cast("string"))), F.lit(BUCKETS)
    )


def hash_sample(
    df: DataFrame, id_col: str, fraction: float, salt: str = "s0"
) -> DataFrame:
    """Keep a deterministic `fraction` of rows, keyed on id_col."""
    return df.filter(sample_bucket(id_col, salt) < int(round(fraction * BUCKETS)))


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "s0",
) -> DataFrame:
    """Per-stratum deterministic rates — the training-mixture weighting
    primitive (e.g. upweight curated sources, downweight boilerplate
    domains). `fractions` maps stratum value → keep fraction; strata not
    listed fall back to default_fraction.

    The rate table compiles to a CASE expression (fine for the usual
    dozens-of-sources case; for very large dictionaries join a broadcast
    rate table instead — same semantics, one broadcast)."""
    thresh: Column = F.lit(int(round(default_fraction * BUCKETS)))
    for value, frac in sorted(fractions.items()):
        thresh = F.when(
            F.col(strata_col) == value, F.lit(int(round(frac * BUCKETS)))
        ).otherwise(thresh)
    return df.filter(sample_bucket(id_col, salt) < thresh)


def train_val_split(
    df: DataFrame, id_col: str, val_fraction: float = 0.01, salt: str = "split"
) -> DataFrame:
    """Add a deterministic `split` column ('train'/'val'). Keyed on the id
    so the assignment survives recomputation and is consistent across
    derived tables that carry the same ids — the property that prevents
    train/val leakage through joins."""
    is_val = sample_bucket(id_col, salt) < int(round(val_fraction * BUCKETS))
    return df.withColumn(
        "split", F.when(is_val, F.lit("val")).otherwise(F.lit("train"))
    )


def quality_stratified_sample(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_rate_good: float = 1.0,
    keep_rate_bad: float = 0.1,
    salt: str = "q0",
) -> DataFrame:
    """Model-scored quality curation (r5 — wires the hashed-ngram linear
    classifier into the sampling keep_rate, VERDICT r4 item 3): docs the
    classifier labels prose-like keep at `keep_rate_good`, boilerplate-like
    at `keep_rate_bad`. The classifier logit is a pure per-row expression
    (weights inlined — functions/quality_model.py) and the sampler is the
    same md5-bucket pure function as stratified_sample: no shuffle, no RNG
    state, resume-safe, identical decisions on re-run."""
    from ..functions.quality_model import (
        quality_logit_micro,
        quality_model_cached,
    )

    weights, bias = quality_model_cached()
    band = F.when(
        quality_logit_micro(text_col, weights, bias) > 0, F.lit("good")
    ).otherwise(F.lit("bad"))
    return stratified_sample(
        docs.withColumn("_qband", band),
        id_col,
        "_qband",
        {"good": keep_rate_good, "bad": keep_rate_bad},
        salt=salt,
    ).drop("_qband")
