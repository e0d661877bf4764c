"""Round-8 optimization harness (bench.py is FROZEN for measurement —
this file exists so per-query isolation, plan capture and stage-level
profiling never touch it; see the r8 brief).

Usage:
  python bench_extra.py time <query> [query ...]   # best-of-2 noop walls
  python bench_extra.py plan <tag> <query> [...]   # plans/r08/<q>_<tag>.txt
  python bench_extra.py all                        # full BENCH_QUERIES sweep

Methodology identical to bench.py part 1: construct and execute timed as
separate walls via the noop sink, dedup caches released between reps.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))


def _noop_run(build):
    t0 = time.time()
    df = build()
    t1 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return t1 - t0, time.time() - t1


def main() -> None:
    from dig_entity_resolution_spark import queries as Q
    from dig_entity_resolution_spark.operators.dedup import release_caches
    from dig_entity_resolution_spark.session import build_session

    mode = sys.argv[1]
    spark = build_session(
        app_name="bench-extra", cpus=CPUS, shuffle_partitions=CPUS
    )
    reg = Q.spark_queries()

    if mode == "plan":
        tag = sys.argv[2]
        names = sys.argv[3:]
        os.makedirs("plans/r08", exist_ok=True)
        for name in names:
            df = reg[name](spark, SF_DIR)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            path = f"plans/r08/{name}_{tag}.txt"
            with open(path, "w") as fh:
                fh.write(txt)
            release_caches()
            print(f"wrote {path} ({len(txt)} bytes)")
        spark.stop()
        return

    if mode == "all":
        import bench as B

        names = B.BENCH_QUERIES
    else:
        names = sys.argv[2:]
    out = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        reps = []
        for _ in range(REPS):
            reps.append(_noop_run(lambda: reg[name](spark, SF_DIR)))
            release_caches()
        c, e = min(reps, key=sum)
        out[name] = {
            "total": round(c + e, 3),
            "construct": round(c, 3),
            "exec": round(e, 3),
            "reps_total": [round(a + b, 3) for a, b in reps],
        }
        print(json.dumps({name: out[name]}), flush=True)
    print("SUMMARY " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
