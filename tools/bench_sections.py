"""Re-measure just the incremental 1x/10x sweep sections of bench.py
(incr_near_dup + incr_curation) without paying the full query/ER bench.

Usage: python tools/bench_sections.py [out.json]

Run on an IDLE box (ENGINEERING_NOTES: any concurrent pytest/sweep
corrupts walls). Writes the same section shapes bench.py emits so
BASELINE.md tables can cite either artifact.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_sections_latest.json"
    import bench
    from dig_entity_resolution_spark.session import build_session

    spark = build_session(
        app_name="bench-sections", cpus=bench.CPUS,
        shuffle_partitions=bench.CPUS,
    )
    t0 = time.time()
    result = {
        "sf": bench.SF_DIR.rstrip("/").split("sf")[-1],
        "note": "section re-measure (tools/bench_sections.py)",
        "incr_near_dup": bench._bench_incremental_near_dup(spark),
        "incr_curation": bench._bench_incremental_curation(spark),
    }
    result["total_sec"] = round(time.time() - t0, 1)
    spark.stop()
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
