"""Benchmark harness. Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "er": {"n_pairs": N, "pairs_per_sec_8": ..., "pairs_per_sec_32": ...,
          "scaling_efficiency": ...}, ...}

Two parts:
  1. representative operator queries at $SPARK_GRAFT_SF_DIR (default sf0.1),
     executed to completion via the noop sink (count() would let Catalyst
     prune the expensive columns — noop consumes every column);
  2. the ER headline: candidate-pairs-scored/sec on a synthetic planted
     corpus, measured at local[8] and local[32] on the SAME input — the
     sandbox substitution for the N vs 4N executor scaling criterion
     (no real cluster here), efficiency = (p32/p8)/4.

Set SPARK_GRAFT_BENCH_FAST=1 to skip the scaling re-run (CI smoke).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
FAST = os.environ.get("SPARK_GRAFT_BENCH_FAST") == "1"
CORPUS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".data", "bench_corpus")

BENCH_QUERIES = [
    "normalize_tokenize",
    "candidate_pairs",
    "pairs_jaro_winkler",
    "pairs_levenshtein",
    "pairs_tfidf_cosine",
    "minhash_lsh_dup_pairs",
    "simhash_fingerprints",
    "embedding_topk",
    "embedding_ann_lsh",
    "connected_components",
    "tpch_q1_agg",
    "events_sessionize",
    "quality_scores",
]


def _noop_run(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def _bench_queries(spark) -> dict[str, float]:
    from dig_entity_resolution_spark import queries as Q

    reg = Q.spark_queries()
    out = {}
    for name in BENCH_QUERIES:
        try:
            out[name] = round(_noop_run(reg[name](spark, SF_DIR)), 3)
        except Exception as e:  # keep the bench alive; report the failure
            out[name] = -1.0
            print(f"bench query {name} failed: {e}", file=sys.stderr)
    return out


def _ensure_corpus() -> str:
    from dig_entity_resolution_spark.synth import generate_corpus

    marker = os.path.join(CORPUS_DIR, "pages.parquet")
    if not os.path.exists(marker):
        generate_corpus(
            CORPUS_DIR,
            n_clusters=2500,
            cluster_size=4,
            n_singletons=10000,
            seed=42,
        )
    return CORPUS_DIR


def _er_scoring_throughput(cpus: int, corpus: str) -> tuple[int, float]:
    """Pairs scored per second at the given parallelism: build the pipeline
    up to cand_pairs (cached), then time the vectorized scoring stage."""
    from pyspark.sql import SparkSession

    from dig_entity_resolution_spark.operators.blocking import (
        all_blocks,
        candidate_pairs,
        cap_block_size,
        salt_blocks,
        suppress_stop_keys,
    )
    from dig_entity_resolution_spark.operators.scoring import score_pairs
    from dig_entity_resolution_spark.plans.pipeline import ERConfig
    from dig_entity_resolution_spark.session import build_session
    from dig_entity_resolution_spark.functions.hashing import record_id_from_url
    from dig_entity_resolution_spark.functions.normalize import (
        normalize_text,
        tokenize,
    )
    from pyspark.sql import functions as F

    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
    spark = build_session(
        app_name=f"er-bench-{cpus}", cpus=cpus, shuffle_partitions=cpus
    )
    cfg = ERConfig()
    pages = spark.read.parquet(os.path.join(corpus, "pages.parquet"))
    records = (
        pages.select(
            record_id_from_url("url").alias("record_id"), "url", "text", "lang"
        )
        .withColumn("norm_text", normalize_text("text"))
        .withColumn("tokens", tokenize("norm_text"))
    )
    blocks = salt_blocks(
        cap_block_size(
            suppress_stop_keys(
                all_blocks(records, strategies=cfg.strategies),
                cfg.max_block_size,
            ),
            cfg.block_top_n,
        ),
        cfg.n_salts,
    )
    pairs = candidate_pairs(blocks).cache()
    n_pairs = pairs.count()
    records = records.cache()
    records.count()
    scored = score_pairs(
        pairs, records, threshold=cfg.threshold, with_tfidf=cfg.with_tfidf
    )
    dt = _noop_run(scored)
    spark.stop()
    return n_pairs, dt


def main() -> None:
    from dig_entity_resolution_spark.session import build_session

    result: dict = {
        "metric": "er_pipeline_and_operator_bench",
        "unit": "sec",
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
    }
    t_total0 = time.time()

    spark = build_session(app_name="bench-queries", cpus=CPUS, shuffle_partitions=CPUS)
    result["queries"] = _bench_queries(spark)
    spark.stop()

    corpus = _ensure_corpus()
    er: dict = {}
    n32, dt32 = _er_scoring_throughput(32, corpus)
    er["n_pairs"] = n32
    er["pairs_per_sec_32"] = round(n32 / dt32, 1)
    er["scoring_sec_32"] = round(dt32, 3)
    if not FAST:
        n8, dt8 = _er_scoring_throughput(8, corpus)
        er["pairs_per_sec_8"] = round(n8 / dt8, 1)
        er["scoring_sec_8"] = round(dt8, 3)
        er["scaling_efficiency"] = round((n32 / dt32) / (n8 / dt8) / 4.0, 3)
    result["er"] = er
    result["value"] = round(time.time() - t_total0, 3)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
