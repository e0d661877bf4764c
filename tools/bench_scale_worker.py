"""Subprocess worker for the scaling benchmark: one parallelism level per
process (Spark local-mode sessions can't be cleanly resized inside one JVM —
same-process restarts contaminate timings).

Usage: python tools/bench_scale_worker.py <cpus> <corpus_dir>
Prints one JSON line {"cpus":., "sec":., "pairs_per_sec":., "n":.}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cpus = int(sys.argv[1])
    corpus = sys.argv[2]

    from pyspark.sql import functions as F  # noqa: F401

    from dig_entity_resolution_spark.functions.hashing import record_id_from_url
    from dig_entity_resolution_spark.functions.normalize import (
        normalize_text,
        tokenize,
    )
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

    spark = build_session(
        app_name=f"er-scale-{cpus}",
        cpus=cpus,
        shuffle_partitions=cpus,
        extra_conf={"spark.sql.execution.arrow.maxRecordsPerBatch": "4096"},
    )
    cfg = ERConfig()
    pages = spark.read.parquet(os.path.join(corpus, "pages.parquet"))
    records = (
        pages.select(
            record_id_from_url("url").alias("record_id"), "url", "text", "lang"
        )
        .repartition(cpus * 2, "record_id")
        .withColumn("norm_text", normalize_text("text"))
        .withColumn("tokens", tokenize("norm_text"))
    ).cache()
    records.count()
    blocks = salt_blocks(
        cap_block_size(
            suppress_stop_keys(
                all_blocks(records, strategies=cfg.strategies), cfg.max_block_size
            ),
            cfg.block_top_n,
        ),
        cfg.n_salts,
    )
    pairs = candidate_pairs(blocks).repartition(cpus * 3).cache()
    n = pairs.count()
    scored = score_pairs(
        pairs, records, threshold=cfg.threshold, with_tfidf=cfg.with_tfidf
    )
    # warm-up: spawn+import the Python UDF workers once (a real cluster's
    # long-running executors pay this once per job, not per measurement) —
    # the timed run below measures sustained throughput
    scored.write.format("noop").mode("overwrite").save()
    t0 = time.time()
    scored.write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    print(
        json.dumps(
            {
                "cpus": cpus,
                "sec": round(dt, 2),
                "pairs_per_sec": round(n / dt, 1),
                "n": n,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
