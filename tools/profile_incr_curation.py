"""Per-stage breakdown of one IncrementalCuration delta batch at a 1x
and 10x corpus — the same workload bench.py's incr_curation section
times, but printing IncrementalCuration.last_delta_timings so the
corpus-proportional stage (if any) is visible by name.

Usage: python tools/profile_incr_curation.py [scales ...] (default 1 10)
Run on an IDLE box.
"""

from __future__ import annotations

import functools
import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")


def main() -> int:
    scales = [int(a) for a in sys.argv[1:]] or [1, 10]
    import os

    import bench
    from pyspark.sql import DataFrame as _DF

    from dig_entity_resolution_spark.operators.dedup import release_caches
    from dig_entity_resolution_spark.plans.curation import CurationConfig
    from dig_entity_resolution_spark.plans.curation_incremental import (
        IncrementalCuration,
    )
    from dig_entity_resolution_spark.session import build_session

    spark = build_session(
        app_name="profile-incr-curation", cpus=bench.CPUS,
        shuffle_partitions=bench.CPUS,
    )
    docs = spark.read.parquet(
        os.path.join(bench.SF_DIR, "documents.parquet")
    ).select("doc_id", "text")
    cfg = CurationConfig(seq_len=128, bpe_merges=40)
    out: dict = {}
    for k in scales:
        reps = [bench._corpus_replica(docs, i) for i in range(k)]
        all_docs = functools.reduce(_DF.unionByName, reps).localCheckpoint(
            eager=True
        )
        delta = all_docs.orderBy("doc_id").limit(100).localCheckpoint(
            eager=True
        )
        base = all_docs.join(
            delta.select("doc_id"), "doc_id", "left_anti"
        ).localCheckpoint(eager=True)
        wh = tempfile.mkdtemp(prefix="prof_icur_")
        try:
            inc = IncrementalCuration(spark, wh, "prof", cfg)
            t0 = time.time()
            inc.init(base)
            init_wall = round(time.time() - t0, 3)
            t0 = time.time()
            res = inc.delta(delta)
            counts = {
                key: res[key].count()
                for key in ("additions", "removals", "tombstones")
            }
            delta_wall = round(time.time() - t0, 3)
            out[f"corpus_{k}x"] = {
                "n_docs": all_docs.count(),
                "state_init_sec": init_wall,
                "delta_100docs_sec": delta_wall,
                "delta_stages": inc.last_delta_timings,
                "delta_counts": counts,
            }
            release_caches()
        finally:
            shutil.rmtree(wh, ignore_errors=True)
    print(json.dumps(out, indent=1))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
