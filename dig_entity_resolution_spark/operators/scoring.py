"""Pairwise scoring: hydration, TF-IDF, feature blend, threshold
(SURVEY.md §2.D D1/D5/D7).

Scale notes: pair hydration is two hash joins on record_id (records side
bucketable; Catalyst broadcasts when small). TF-IDF is the explicit
DataFrame formulation (explode → doc-freq agg → broadcast IDF join) rather
than pyspark.ml HashingTF so the oracle can reproduce it exactly; the pair
cosine is a relational sparse dot product (join on term), which scales
linearly in shared terms instead of materializing dense vectors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.similarity import jaro_winkler, lev_similarity, token_jaccard


def hydrate_pairs(pairs: DataFrame, records: DataFrame) -> DataFrame:
    """D1: attach both records' text/tokens to each pair."""
    r1 = records.select(
        F.col("record_id").alias("id1"),
        F.col("norm_text").alias("text1"),
        F.col("tokens").alias("tokens1"),
    )
    r2 = records.select(
        F.col("record_id").alias("id2"),
        F.col("norm_text").alias("text2"),
        F.col("tokens").alias("tokens2"),
    )
    return pairs.join(r1, "id1").join(r2, "id2")


def tfidf_terms(records: DataFrame) -> DataFrame:
    """D5: (record_id, term, weight) — smoothed-idf TF-IDF, L2-unnormalized.

    tf = in-doc term count; idf = ln((N+1)/(df+1)) + 1 (sklearn smoothing —
    exactly reproducible in SQL). Doc-frequency table is tiny after the agg
    and gets broadcast back onto the exploded terms.
    """
    terms = records.select("record_id", F.explode("tokens").alias("term"))
    tf = terms.groupBy("record_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_tbl = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = records.agg(F.countDistinct("record_id").alias("n_docs"))
    weighted = (
        tf.join(F.broadcast(df_tbl), "term")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "weight",
            F.col("tf")
            * (
                F.log((F.col("n_docs") + 1).cast("double") / (F.col("df") + 1))
                + F.lit(1.0)
            ),
        )
        .select("record_id", "term", "weight")
    )
    return weighted


def tfidf_norms(tfidf: DataFrame) -> DataFrame:
    """Per-record L2 norm of the TF-IDF vector."""
    return tfidf.groupBy("record_id").agg(
        F.sqrt(F.sum(F.col("weight") * F.col("weight"))).alias("norm")
    )


def pair_tfidf_cosine(pairs: DataFrame, tfidf: DataFrame) -> DataFrame:
    """D5/D6: sparse cosine per candidate pair via a term-equi-join.

    dot(id1,id2) = Σ_term w1·w2 — computed by joining both sides' TF-IDF
    rows on term; pairs sharing no term get cosine 0 (left join + coalesce).
    """
    t1 = tfidf.select(
        F.col("record_id").alias("id1"),
        "term",
        F.col("weight").alias("w1"),
    )
    t2 = tfidf.select(
        F.col("record_id").alias("id2"),
        "term",
        F.col("weight").alias("w2"),
    )
    dots = (
        pairs.join(t1, "id1")
        .join(t2, ["id2", "term"])
        .groupBy("id1", "id2")
        .agg(F.sum(F.col("w1") * F.col("w2")).alias("dot"))
    )
    norms = tfidf_norms(tfidf)
    n1 = norms.select(F.col("record_id").alias("id1"), F.col("norm").alias("norm1"))
    n2 = norms.select(F.col("record_id").alias("id2"), F.col("norm").alias("norm2"))
    return (
        pairs.join(dots, ["id1", "id2"], "left")
        .join(n1, "id1")
        .join(n2, "id2")
        .select(
            "id1",
            "id2",
            F.when(
                (F.col("norm1") > 0) & (F.col("norm2") > 0),
                F.coalesce(F.col("dot"), F.lit(0.0))
                / (F.col("norm1") * F.col("norm2")),
            )
            .otherwise(F.lit(0.0))
            .alias("tfidf_cos"),
        )
    )


DEFAULT_WEIGHTS = {"jw": 0.35, "lev_sim": 0.25, "tfidf_cos": 0.4}


def score_pairs(
    pairs: DataFrame,
    records: DataFrame,
    weights: dict[str, float] | None = None,
    threshold: float = 0.80,
    with_tfidf: bool = True,
) -> DataFrame:
    """D1–D7: hydrate, compute jw / lev_sim / (tfidf_cos), blend, threshold.

    jw runs as the Arrow-vectorized numpy kernel; lev/jaccard are native.
    Returns the SCORED_PAIRS schema.
    """
    w = dict(DEFAULT_WEIGHTS if weights is None else weights)
    hydrated = hydrate_pairs(pairs, records)
    feat = hydrated.select(
        "id1",
        "id2",
        jaro_winkler("text1", "text2").alias("jw"),
        lev_similarity("text1", "text2").alias("lev_sim"),
        token_jaccard("tokens1", "tokens2").alias("jaccard"),
    )
    if with_tfidf:
        tfidf = tfidf_terms(records)
        cos = pair_tfidf_cosine(pairs, tfidf)
        feat = feat.join(cos, ["id1", "id2"])
    else:
        w["tfidf_cos"] = 0.0
        feat = feat.withColumn("tfidf_cos", F.lit(0.0))
    total = sum(w.values()) or 1.0
    score = (
        F.col("jw") * (w.get("jw", 0) / total)
        + F.col("lev_sim") * (w.get("lev_sim", 0) / total)
        + F.col("tfidf_cos") * (w.get("tfidf_cos", 0) / total)
    )
    return feat.select(
        "id1",
        "id2",
        "jw",
        "lev_sim",
        "tfidf_cos",
        score.alias("score"),
        (score >= F.lit(threshold)).alias("is_match"),
    )
