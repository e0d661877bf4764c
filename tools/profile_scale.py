"""Component-level 8-vs-32 scaling profile of the scoring stage.

VERDICT r1 item 1: raw scaling efficiency 0.527 vs CPU control 0.796 —
~17% unexplained. This script isolates WHERE the non-scaling time goes by
running each scoring component alone (fresh subprocess per measurement,
same hydrated input as bench_scale_worker) and pulling stage metrics
(executorRunTime, jvmGcTime, executorCpuTime) from the Spark REST API.

Usage:
  python tools/profile_scale.py worker <cpus> <component> <hydrated_dir>
  python tools/profile_scale.py run    <hydrated_dir>    # orchestrates all
Components: scan, jw, lev, jaccard, cosine, full.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

COMPONENTS = ["scan", "jw", "lev", "jaccard", "cosine", "full"]


def _component_df(df, name):
    from pyspark.sql import functions as F

    from dig_entity_resolution_spark.functions.similarity import (
        jaro_winkler,
        lev_similarity,
        token_jaccard,
    )
    from dig_entity_resolution_spark.operators.scoring import map_cosine

    if name == "scan":
        return df
    if name == "jw":
        return df.select("id1", "id2", jaro_winkler("text1", "text2").alias("jw"))
    if name == "lev":
        return df.select(
            "id1", "id2", lev_similarity("text1", "text2").alias("lev_sim")
        )
    if name == "jaccard":
        return df.select(
            "id1", "id2", token_jaccard("tokens1", "tokens2").alias("jac")
        )
    if name == "cosine":
        return df.select(
            "id1",
            "id2",
            map_cosine(
                F.col("tfidf1"), F.col("tfidf2"), F.col("norm1"), F.col("norm2")
            ).alias("cos"),
        )
    if name == "full":
        from tools.bench_scale_worker import _score_expr

        return _score_expr(df)
    raise ValueError(name)


def _stage_metrics(ui_port: int) -> dict:
    """Aggregate stage metrics over all completed stages via the REST API."""
    base = f"http://localhost:{ui_port}/api/v1/applications"
    try:
        apps = json.load(urllib.request.urlopen(base, timeout=5))
        app_id = apps[0]["id"]
        stages = json.load(
            urllib.request.urlopen(f"{base}/{app_id}/stages?status=complete", timeout=5)
        )
    except Exception as e:  # UI disabled or port differs
        return {"err": str(e)}
    tot = {"executorRunTime": 0, "jvmGcTime": 0, "executorCpuTime": 0, "tasks": 0}
    for st in stages:
        tot["executorRunTime"] += st.get("executorRunTime", 0)
        tot["jvmGcTime"] += st.get("jvmGcTime", 0)
        tot["executorCpuTime"] += st.get("executorCpuTime", 0) // 1_000_000
        tot["tasks"] += st.get("numCompleteTasks", 0)
    return tot


def worker(cpus: int, component: str, hydrated_dir: str) -> None:
    from dig_entity_resolution_spark.session import build_session

    spark = build_session(
        app_name=f"profile-{component}-{cpus}",
        cpus=cpus,
        shuffle_partitions=cpus,
        extra_conf={
            "spark.sql.execution.arrow.maxRecordsPerBatch": "4096",
            "spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024),
            "spark.ui.enabled": "true",
        },
    )
    df = spark.read.parquet(hydrated_dir)
    target = _component_df(df, component)
    # warm-up on a 5% sample (worker spawn + JIT), same as bench_scale_worker
    _component_df(df.sample(0.05, seed=1), component).write.format("noop").mode(
        "overwrite"
    ).save()
    n = df.count()
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        target.write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    metrics = _stage_metrics(4040)
    print(
        json.dumps(
            {
                "component": component,
                "cpus": cpus,
                "sec": round(best, 2),
                "rows_per_sec": round(n / best, 1),
                "metrics": metrics,
            }
        )
    )
    spark.stop()


def run(hydrated_dir: str) -> None:
    results = {}
    for comp in COMPONENTS:
        for cpus in (8, 32):
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "worker", str(cpus),
                 comp, hydrated_dir],
                capture_output=True,
                text=True,
                timeout=1200,
            )
            lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
            if not lines:
                results[f"{comp}_{cpus}"] = {"err": out.stderr[-500:]}
                continue
            results[f"{comp}_{cpus}"] = json.loads(lines[-1])
            print(lines[-1], file=sys.stderr, flush=True)
    for comp in COMPONENTS:
        a, b = results.get(f"{comp}_8"), results.get(f"{comp}_32")
        if a and b and "rows_per_sec" in a and "rows_per_sec" in b:
            eff = b["rows_per_sec"] / a["rows_per_sec"] / 4.0
            results[f"{comp}_efficiency"] = round(eff, 3)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    if sys.argv[1] == "worker":
        worker(int(sys.argv[2]), sys.argv[3], sys.argv[4])
    else:
        run(sys.argv[2])
