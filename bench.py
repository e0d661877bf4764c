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
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
FAST = os.environ.get("SPARK_GRAFT_BENCH_FAST") == "1"
# 140k docs → ~3.8M candidate pairs (r5, VERDICT r4 item 1: a larger
# workload amortizes fixed stage overhead out of the scaling ratio — the
# r4 2.18M-pair runs spent ~10% of the 32-core wall on ramp)
CORPUS_N_CLUSTERS = 17500
CORPUS_SINGLETONS = 70000
CORPUS_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".data", "bench_corpus_140k"
)

BENCH_QUERIES = [
    "normalize_tokenize",
    "candidate_pairs",
    "pairs_jaro_winkler",
    "pairs_levenshtein",
    "pairs_tfidf_cosine",
    "minhash_lsh_dup_pairs",
    "minhash_dedup_production",
    "simhash_fingerprints",
    "embedding_topk",
    "embedding_ann_lsh",
    "embedding_ann_hyperplane",
    "embedding_ivf_production",
    # the production (BLAS/LUT) PQ configs — the *_topk twins are the
    # interpreted sequential-fold oracle paths, correctness not throughput
    "embedding_pq_production",
    "embedding_ivfadc_production",
    "repeated_substring_dedup",
    "decontamination",
    "sorted_neighborhood",
    "events_last_order_asof",
    "connected_components",
    "tpch_q1_agg",
    "events_sessionize",
    "quality_scores",
    # r5 additions
    "token_counts_bpe",
    "quality_classifier",
    "near_dup_corpus",
    "decontamination_provenance",
    "sequence_packing",
    # r6 additions
    "packed_chunk_ids",
    "lm_perplexity",
    # r7 additions
    "line_dedup",
    "semdedup",
    "audio_near_dup",
    "video_near_dup",
    "meta_blocking_wep",
    "meta_blocking_cnp",
    "golden_record",
    "blocking_quality",
    "fellegi_sunter",
    "fellegi_sunter_tf",
    "cluster_metrics",
    "bpe_decode_roundtrip",
    "one_to_one_match",
    "canopy_blocking",
    # late-r7 additions
    "phonetic_blocks",
    "ssjoin_jaccard",
    "pairs_soft_tfidf",
    "pairs_monge_elkan",
    "cosine_allpairs",
]


def _noop_run(build) -> tuple[float, float]:
    """Time BUILD and EXECUTE as SEPARATE walls (VERDICT r5 item 1: r5
    folded construction into one wall — honest, because CC-composed
    operators execute Spark jobs while the plan is built — but it broke
    cross-round per-query comparability with r1-r4's execute-only series.
    Recording both restores the regression signal: `total` is the honest
    end-to-end number, `exec` is the cross-round-comparable one).
    `build` is a thunk returning the DataFrame."""
    t0 = time.time()
    df = build()
    t1 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return t1 - t0, time.time() - t1


def _bench_queries(spark) -> tuple[dict, dict, dict]:
    from dig_entity_resolution_spark import queries as Q
    from dig_entity_resolution_spark.operators.dedup import release_caches

    reg = Q.spark_queries()
    total, construct, execute = {}, {}, {}
    for name in BENCH_QUERIES:
        try:
            # best-of-2 (VERDICT r2: single-shot walls couldn't separate
            # shared-VM contention from real regressions). Each rep builds
            # the DataFrame fresh and releases the dedup operators' caches
            # so rep 2 measures the same cold work as rep 1, not a
            # persisted-intermediate hit. The reported split is the
            # MIN-TOTAL rep's (construct + exec == total for that rep;
            # independent mins could come from different reps and not sum).
            reps = []
            for _ in range(2):
                reps.append(_noop_run(lambda: reg[name](spark, SF_DIR)))
                release_caches()
            c, e = min(reps, key=sum)
            total[name] = round(c + e, 3)
            construct[name] = round(c, 3)
            execute[name] = round(e, 3)
        except Exception as e:  # keep the bench alive; report the failure
            total[name] = -1.0
            print(f"bench query {name} failed: {e}", file=sys.stderr)
        finally:
            # a failed rep must not leak rep 1's persisted intermediates
            # into every later query's wall (r3 review)
            release_caches()
    return total, construct, execute


#: substitution alphabet for synthetic corpus replicas — 13 DISTINCT
#: letters so rotations 1..12 are all non-identity bijections. (r7 review
#: find: the r6 7-char vowel alphabet made rotations i∈{7,8,9} the
#: identity, so 3 of the 10x replicas were byte-identical to replica 0 —
#: ~30 % exact dups that the 1x corpus didn't have, breaking the
#: constant-dup-density methodology the sweep claims.)
_REPLICA_SUBST = "etaoinshrdluc"


def _corpus_replica(docs, i: int):
    """Replica i of a (doc_id, text) corpus: ids offset, text passed
    through a per-replica letter bijection (rotation of _REPLICA_SUBST).
    A bijection preserves each replica's INTERNAL dup structure exactly
    (shingles map 1:1) while making replicas mutually non-near-dup, so
    dup density is constant across 1x/10x scales. i=0 is the identity."""
    from pyspark.sql import functions as F

    assert 0 <= i < len(_REPLICA_SUBST)
    rot = _REPLICA_SUBST[i:] + _REPLICA_SUBST[:i]
    return docs.select(
        (F.col("doc_id") + F.lit(i * 100_000_000)).alias("doc_id"),
        F.translate("text", _REPLICA_SUBST, rot).alias("text"),
    )


def _bench_incremental_near_dup(spark) -> dict:
    """VERDICT r5 item 4 evidence: resolving a FIXED-SIZE crawl batch
    against the kept corpus must cost ~the delta, not the corpus. Measured
    as: same 100-doc delta against a 1x corpus (sf0.1 documents) and a 10x
    corpus (10 letter-bijection replicas — see _corpus_replica: constant
    dup density across scales). Batch = re-running near_dup_corpus
    over everything, the cost a non-incremental pipeline pays per batch."""
    import functools

    from pyspark.sql import DataFrame as _DF
    from pyspark.sql import functions as F

    from dig_entity_resolution_spark.operators.dedup import (
        near_dup_corpus,
        release_caches,
    )
    from dig_entity_resolution_spark.operators.dedup_incremental import (
        near_dup_delta,
        near_dup_emit,
        near_dup_init,
    )

    docs = (
        spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
        .select("doc_id", "text")
    )
    # warmup: absorb codegen/first-shuffle session costs so corpus_1x
    # (measured first) isn't charged for them
    warm = docs.limit(60)
    near_dup_corpus(warm).write.format("noop").mode("overwrite").save()
    release_caches()
    near_dup_delta(near_dup_init(warm), docs.limit(80).join(
        warm.select("doc_id"), "doc_id", "left_anti"))
    release_caches()
    out: dict = {}
    for label, k in (("corpus_1x", 1), ("corpus_10x", 10)):
        reps = [_corpus_replica(docs, i) for i in range(k)]
        # Materialize the synthetic corpus ONCE (r6 run-1 lesson: leaving
        # these as lazy translate-union plans meant every state scan inside
        # near_dup_delta re-derived the 10x corpus from scratch — the
        # measured "delta cost" was dominated by harness recompute, not the
        # operator; delta_scaleup read 6.37. A real pipeline's state.docs
        # is parquet on disk — localCheckpoint is the in-session analogue).
        all_docs = functools.reduce(_DF.unionByName, reps).localCheckpoint(
            eager=True
        )
        delta = all_docs.orderBy("doc_id").limit(100).localCheckpoint(eager=True)
        corpus = all_docs.join(
            delta.select("doc_id"), "doc_id", "left_anti"
        ).localCheckpoint(eager=True)
        t0 = time.time()
        near_dup_corpus(all_docs).write.format("noop").mode("overwrite").save()
        batch_wall = time.time() - t0
        release_caches()
        t0 = time.time()
        st = near_dup_init(corpus)  # eager localCheckpoint — wall is real
        init_wall = time.time() - t0
        t0 = time.time()
        st2 = near_dup_delta(st, delta)
        delta_wall = time.time() - t0
        t0 = time.time()
        near_dup_emit(st2, only_touched=True).write.format("noop").mode(
            "overwrite"
        ).save()
        upsert_wall = time.time() - t0
        release_caches()
        out[label] = {
            "n_docs": all_docs.count(),
            "batch_rededup_sec": round(batch_wall, 3),
            "state_init_sec": round(init_wall, 3),
            "delta_100docs_sec": round(delta_wall, 3),
            "upsert_emit_sec": round(upsert_wall, 3),
        }
    b1, b10 = out["corpus_1x"], out["corpus_10x"]
    out["batch_scaleup"] = round(
        b10["batch_rededup_sec"] / b1["batch_rededup_sec"], 2
    )
    out["delta_scaleup"] = round(
        b10["delta_100docs_sec"] / b1["delta_100docs_sec"], 2
    )
    return out


def _bench_curation(spark) -> dict:
    """End-to-end CurationPipeline wall over the sf documents table (r6):
    per-stage walls from one run — the number a training-data pipeline
    operator actually schedules around. LM gate ON (distributed fit +
    per-lang ntile), classifier ON, pack ON; no holdout (decontam
    passthrough is free and its operator cost is benched separately via
    `decontamination`)."""
    import shutil
    import tempfile

    from dig_entity_resolution_spark.operators.dedup import release_caches
    from dig_entity_resolution_spark.plans.curation import (
        CurationConfig,
        CurationPipeline,
    )

    wh = tempfile.mkdtemp(prefix="bench_curation_")
    try:
        pipe = CurationPipeline(
            spark, wh, "bench", CurationConfig(seq_len=128, bpe_merges=40)
        )
        docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
        stage_walls: dict = {}
        orig = pipe.ckpt.write

        def timed_write(stage, df, partition_by=None):
            t0 = time.time()
            out = orig(stage, df, partition_by)
            stage_walls[stage] = round(time.time() - t0, 3)
            return out

        pipe.ckpt.write = timed_write
        t0 = time.time()
        chunks = pipe.run(docs)
        n_chunks = chunks.count()
        total = time.time() - t0
        release_caches()
        return {
            "n_docs": docs.count(),
            "n_chunks": n_chunks,
            "total_sec": round(total, 3),
            "stages_sec": stage_walls,
            "counters": pipe.report(),
        }
    finally:
        shutil.rmtree(wh, ignore_errors=True)


def _bench_incremental_curation(spark) -> dict:
    """The r6 second-pass end product, with the r7 scale evidence VERDICT
    r6 #1 asked for: one recurring-crawl step of the FULL curation DAG
    (pinned artifacts, incremental exact+LSH dedup, group-bounded chunk
    repair) vs the batch pipeline's rerun over the same final corpus — at
    a 1x AND a 10x corpus (vowel-permuted replicas, the incr_near_dup
    methodology: constant dup density across scales). The claim under
    test: batch rerun grows with the corpus while the fixed-size delta
    stays ~flat (delta_scaleup ~ 1) and well under the rerun
    (delta_vs_batch <= 0.5 at 1x — the r7 'Done' bar)."""
    import functools
    import shutil
    import tempfile

    from pyspark.sql import DataFrame as _DF
    from pyspark.sql import functions as F

    from dig_entity_resolution_spark.operators.dedup import release_caches
    from dig_entity_resolution_spark.plans.curation import (
        CurationConfig,
        CurationPipeline,
    )
    from dig_entity_resolution_spark.plans.curation_incremental import (
        IncrementalCuration,
    )

    docs = spark.read.parquet(
        os.path.join(SF_DIR, "documents.parquet")
    ).select("doc_id", "text")
    cfg = CurationConfig(seq_len=128, bpe_merges=40)
    out: dict = {}
    for label, k in (("corpus_1x", 1), ("corpus_10x", 10)):
        reps = [_corpus_replica(docs, i) for i in range(k)]
        all_docs = functools.reduce(_DF.unionByName, reps).localCheckpoint(
            eager=True
        )
        delta = all_docs.orderBy("doc_id").limit(100).localCheckpoint(
            eager=True
        )
        base = all_docs.join(
            delta.select("doc_id"), "doc_id", "left_anti"
        ).localCheckpoint(eager=True)
        wh1, wh2 = (
            tempfile.mkdtemp(prefix="bench_icur_"),
            tempfile.mkdtemp(prefix="bench_bcur_"),
        )
        try:
            t0 = time.time()
            bpipe = CurationPipeline(spark, wh2, "bench", cfg)
            bpipe.run(all_docs).write.format("noop").mode("overwrite").save()
            batch_wall = time.time() - t0
            release_caches()
            inc = IncrementalCuration(spark, wh1, "bench", cfg)
            t0 = time.time()
            inc.init(base)
            init_wall = time.time() - t0
            t0 = time.time()
            res = inc.delta(delta)
            counts = {
                key: res[key].count()
                for key in ("additions", "removals", "tombstones")
            }
            delta_wall = time.time() - t0
            release_caches()
            out[label] = {
                "n_docs": all_docs.count(),
                "batch_rerun_sec": round(batch_wall, 3),
                "state_init_sec": round(init_wall, 3),
                "delta_100docs_sec": round(delta_wall, 3),
                "delta_counts": counts,
            }
        finally:
            shutil.rmtree(wh1, ignore_errors=True)
            shutil.rmtree(wh2, ignore_errors=True)
    b1, b10 = out["corpus_1x"], out["corpus_10x"]
    out["batch_scaleup"] = round(
        b10["batch_rerun_sec"] / b1["batch_rerun_sec"], 2
    )
    out["delta_scaleup"] = round(
        b10["delta_100docs_sec"] / b1["delta_100docs_sec"], 2
    )
    out["delta_vs_batch_1x"] = round(
        b1["delta_100docs_sec"] / b1["batch_rerun_sec"], 2
    )
    return out

def _ensure_corpus() -> str:
    from dig_entity_resolution_spark.synth import generate_corpus

    marker = os.path.join(CORPUS_DIR, "pages.parquet")
    if not os.path.exists(marker):
        generate_corpus(
            CORPUS_DIR,
            n_clusters=CORPUS_N_CLUSTERS,
            cluster_size=4,
            n_singletons=CORPUS_SINGLETONS,
            seed=42,
        )
    return CORPUS_DIR


def _scale_worker(*args: str, pin_cpus: int | None = None) -> dict:
    """Run one bench_scale_worker mode in a FRESH subprocess — same-process
    session restarts contaminate timings (the old JVM lingers).

    pin_cpus pins the WHOLE process tree (JVM task threads + forked Python
    UDF workers) to that many cores via taskset. Without the pin, a
    local[8] run's 8 Python workers land on 8 EXTRA cores of this 32-core
    box — the "N-core" measurement borrows up to 2N cores and the 8→32
    efficiency reads ~20% low (r1's headline red number). A real N-core
    executor confines JVM and Python to the same N cores, which is what
    the pin reproduces."""
    import shutil
    import subprocess

    worker = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "tools", "bench_scale_worker.py"
    )
    cmd = [sys.executable, worker, *args]
    if pin_cpus and shutil.which("taskset") and pin_cpus <= (os.cpu_count() or 1):
        cmd = ["taskset", "-c", f"0-{pin_cpus - 1}"] + cmd
    out = subprocess.run(
        cmd,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def _cpu_control_rate(nproc: int) -> float:
    """Pure-CPU control at ONE parallelism level: the same JW kernel under
    multiprocessing, no Spark, pinned to nproc cores (symmetric with the
    tasksetted Spark measurements). On this single box, raising occupancy
    8→32 drops the sustained clock (turbo), capping ANY perfectly-parallel
    job's efficiency at what the control measures — a real cluster adds
    executors at constant clock and does not pay this. Spark efficiency is
    therefore also reported relative to the control.

    Called right AFTER the Spark measurement at the same level so each
    (spark, control) pair samples the same minutes of shared-VM noise —
    the ratio-of-ratios then cancels slow drift of the box."""
    import random
    from multiprocessing import Pool

    import pandas as pd

    global _CTRL_A, _CTRL_B
    if _CTRL_A is None:
        rng = random.Random(1)
        vocab = [f"tok{i}" for i in range(30)] + ["anchor0001q"]
        mk = lambda: " ".join(rng.choice(vocab) for _ in range(18))  # noqa: E731
        pairs = [(mk(), mk()) for _ in range(10000)]
        _CTRL_A = pd.Series([p[0] for p in pairs])
        _CTRL_B = pd.Series([p[1] for p in pairs])

    try:
        os.sched_setaffinity(0, range(nproc))
    except (AttributeError, OSError):
        pass
    try:
        best = 0.0
        with Pool(nproc) as p:  # fork: children inherit _CTRL_A/_CTRL_B
            p.map(_ctrl_work, range(nproc))  # warm numpy/pandas imports
            for _ in range(3):  # best-of-3, mirroring the Spark side
                # 4 waves of ~1s tasks: a ≥4s timed region — the control
                # was the noisiest term in the efficiency ratio at 2 waves
                t0 = time.time()
                p.map(_ctrl_work, range(nproc * 4))
                best = max(best, 10000 * nproc * 4 / (time.time() - t0))
        return best
    finally:
        try:
            os.sched_setaffinity(0, range(os.cpu_count() or 1))
        except (AttributeError, OSError):
            pass


_CTRL_A = None
_CTRL_B = None


def _ctrl_work(_):
    from dig_entity_resolution_spark.functions.similarity import (
        jaro_winkler_batch,
    )

    jaro_winkler_batch(_CTRL_A, _CTRL_B)
    return 0


def main() -> None:
    from dig_entity_resolution_spark.session import build_session

    result: dict = {
        "metric": "er_pipeline_and_operator_bench",
        "unit": "sec",
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
    }
    t_total0 = time.time()

    spark = build_session(app_name="bench-queries", cpus=CPUS, shuffle_partitions=CPUS)
    total, construct, execute = _bench_queries(spark)
    result["queries"] = total  # honest end-to-end wall (r5 convention)
    result["queries_construct"] = construct
    result["queries_exec"] = execute  # cross-round-comparable series
    if not FAST:
        result["incr_near_dup"] = _bench_incremental_near_dup(spark)
        result["curation"] = _bench_curation(spark)
        result["incr_curation"] = _bench_incremental_curation(spark)
    spark.stop()
    # CPU-control sample taken in the same minutes as part 1: cross-round
    # part-1 comparisons divide by this to cancel shared-VM drift (the r2
    # heavy-query deltas were indistinguishable from box noise without it)
    result["queries_control_rate"] = round(_cpu_control_rate(CPUS), 1)
    # Long methodology prose lives in BASELINE.md ("Reading the bench
    # JSON"), not here: the r5 driver capture tail-truncated the JSON line
    # (VERDICT r5 what's-wrong #3) — keep the artifact short and parseable.
    result["notes"] = "see BASELINE.md 'Reading the bench JSON'"

    corpus = _ensure_corpus()
    # _v2: full (unsampled) pair set + pinned measurements — regenerated
    # when the r1-era sampled table is what's on disk
    hydrated = os.path.join(os.path.dirname(CORPUS_DIR), "bench_hydrated_140k_v1")
    if not os.path.exists(os.path.join(hydrated, "_SUCCESS")):
        _scale_worker("prep", corpus, hydrated)
    er: dict = {}
    # Methodology (r2 review + r3 hardening):
    #  * interleave (spark, control) per level so each pair samples the
    #    same minutes of shared-VM noise;
    #  * symmetric rep counts at both levels (asymmetry biases one wall);
    #  * TWO temporally separated measurement windows (ABAB): a single
    #    window is one sample of box weather — an r3 re-run saw the
    #    no-Spark CPU control itself drop 18% inside one window, dragging
    #    every ratio with it. Each window's ratios stay COHERENT (all four
    #    terms from the same minutes — never mixing a good window's
    #    32-core wall with a bad window's 8-core wall). Headline split
    #    (r4, ADVICE r3): THROUGHPUT fields (pairs_per_sec_*, walls)
    #    report the best window — the best-of-N convention every part-1
    #    query uses; EFFICIENCY ratios report the MEDIAN across windows
    #    (max-of-ratios is upward-biased), with the best window's ratios
    #    kept under best_window_* labels. Both windows are recorded.
    if FAST:
        r32 = _scale_worker("measure", "32", hydrated, "2", pin_cpus=32)
        er["n_pairs"] = r32["n"]
        er["pairs_per_sec_32"] = r32["pairs_per_sec"]
        er["scoring_sec_32"] = r32["sec"]
    else:
        windows = []
        # best-of-2 per level per window (a 1-rep trim was measured and is
        # too fragile: one co-tenant burst inside the single 32-core rep
        # sank a window's raw efficiency to 0.41 while the numpy control —
        # less sensitive to scheduler steal than 32 JVM threads + 32
        # Python workers — stayed flat)
        for _ in range(2):
            r32 = _scale_worker("measure", "32", hydrated, "2", pin_cpus=32)
            c32 = _cpu_control_rate(32)
            r8 = _scale_worker("measure", "8", hydrated, "2", pin_cpus=8)
            c8 = _cpu_control_rate(8)
            w = {
                "n_pairs": r32["n"],
                "pairs_per_sec_32": r32["pairs_per_sec"],
                "scoring_sec_32": r32["sec"],
                "pairs_per_sec_8": r8["pairs_per_sec"],
                "scoring_sec_8": r8["sec"],
                "scaling_efficiency": round(
                    r32["pairs_per_sec"] / r8["pairs_per_sec"] / 4.0, 3
                ),
                "control_pairs_per_sec_8": round(c8, 1),
                "control_pairs_per_sec_32": round(c32, 1),
                "control_efficiency": round(c32 / c8 / 4.0, 3),
            }
            if w["control_efficiency"] > 0:
                w["efficiency_vs_cpu_control"] = round(
                    w["scaling_efficiency"] / w["control_efficiency"], 3
                )
            windows.append(w)
        # Headline = MEDIAN across windows (ADVICE r3: max-of-windows is an
        # upward-biased estimator). Per-window values stay in er["windows"];
        # the best window is still reported, but under an honest label.
        best = max(windows, key=lambda w: w["scaling_efficiency"])
        er.update(best)
        med = statistics.median
        for k in (
            "scaling_efficiency",
            "control_efficiency",
            "efficiency_vs_cpu_control",
        ):
            vals = [w[k] for w in windows if k in w]
            if vals:
                er["best_window_" + k] = best.get(k)
                er[k] = round(med(vals), 3)
        er["windows"] = [
            {
                k: w[k]
                for k in (
                    "scaling_efficiency",
                    "control_efficiency",
                    "efficiency_vs_cpu_control",
                    "pairs_per_sec_32",
                )
                if k in w
            }
            for w in windows
        ]
    # Fellegi–Sunter scorer on the SAME hydrated pair table (late r7):
    # all-native gamma + micro-weight CASEs inside whole-stage codegen —
    # no Python workers — vs the blend path's Arrow JW kernel. One
    # pinned local[32] sample; not part of the binding scaling metric.
    rfs = _scale_worker("measure_fs", "32", hydrated, "2", pin_cpus=32)
    result["er_fs"] = {
        "pairs_per_sec_32": rfs["pairs_per_sec"],
        "scoring_sec_32": rfs["sec"],
        "fit_sec": rfs["fit_sec"],
        "vs_blend": round(
            rfs["pairs_per_sec"] / max(er.get("pairs_per_sec_32", 1), 1), 2
        ),
    }
    result["er"] = er
    result["value"] = round(time.time() - t_total0, 3)
    _emit(result)


#: driver stdout-capture window is 2,000 chars (VERDICT r5 #3 / r6 #1:
#: the ~4 KB full JSON got tail-truncated to unparseable in BOTH rounds)
#: — budget the one stdout line well under it
_SUMMARY_BUDGET = 1900


def _summary_line(result: dict) -> str:
    """The ≤1,900-byte single-line digest of `result` — er headline +
    section aggregates + the slowest queries, shrunk until it fits."""
    s = {
        k: result[k]
        for k in ("metric", "value", "unit", "sf", "queries_control_rate")
        if k in result
    }
    s["detail_file"] = "BENCH_detail_latest.json"
    er = result.get("er", {})
    s["er"] = {
        k: er[k]
        for k in (
            "n_pairs",
            "pairs_per_sec_32",
            "pairs_per_sec_8",
            "scoring_sec_32",
            "scoring_sec_8",
            "scaling_efficiency",
            "control_efficiency",
            "efficiency_vs_cpu_control",
            "best_window_efficiency_vs_cpu_control",
        )
        if k in er
    }
    for section in ("er_fs", "incr_near_dup", "curation", "incr_curation"):
        if section in result:
            s[section] = result[section]
    qs = result.get("queries", {})
    s["queries_total_sec"] = round(sum(qs.values()), 3)
    s["queries_n"] = len(qs)
    # shrink until it fits: slowest-queries count first, then whole
    # sections (never the er headline — that's the binding metric)
    ranked = sorted(qs.items(), key=lambda kv: -kv[1])
    for drop_sections in range(5):
        for sec in ("er_fs", "incr_near_dup", "curation", "incr_curation")[
            : drop_sections
        ]:
            s.pop(sec, None)
        for keep in range(min(12, len(ranked)), -1, -1):
            s["queries"] = dict(sorted(ranked[:keep]))
            line = json.dumps(s, separators=(",", ":"))
            if len(line) <= _SUMMARY_BUDGET:
                return line
    # last resort: er headline only
    return json.dumps(
        {k: s[k] for k in ("metric", "value", "unit", "sf", "er") if k in s},
        separators=(",", ":"),
    )


def _emit(result: dict) -> None:
    """Full detail goes ONLY to a repo-local file; stdout carries a single
    summary line sized to survive the driver's tail capture."""
    detail = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_detail_latest.json"
    )
    with open(detail, "w") as fh:
        json.dump(result, fh, separators=(",", ":"))
        fh.write("\n")
    print(_summary_line(result))


if __name__ == "__main__":
    main()
