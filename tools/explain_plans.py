"""Dump formatted physical plans for the headline queries into PLANS.md and
sanity-check the plan properties that matter at 100 TB:

  * filters reach the parquet scan (PushedFilters),
  * scans read only needed columns (ReadSchema),
  * no CartesianProduct anywhere,
  * dictionary joins broadcast; hydrate joins shuffle (scale path),
  * native expressions stay inside WholeStageCodegen,
  * exactly one ArrowEvalPython per scoring projection (no duplicated UDFs).

Usage: python tools/explain_plans.py [sf_dir]
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout

sys.path.insert(0, ".")

CHECKS = {
    "tpch_q1_agg": {
        "must": ["PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"],
        "must_not": ["CartesianProduct"],
    },
    "candidate_pairs": {
        "must": ["BroadcastHashJoin"],  # stop-key dictionary join
        "must_not": ["CartesianProduct"],
    },
    "pairs_jaro_winkler": {
        "must": ["ArrowEvalPython"],
        "must_not": ["CartesianProduct", "BatchEvalPython"],  # no row-UDFs
    },
    "embedding_ann_lsh": {
        "must": [],
        "must_not": ["CartesianProduct"],
    },
    "pairs_tfidf_cosine": {
        # relational sparse dot product: the df/idf dictionary joins
        # broadcast; the per-pair term equi-join shuffles on (id, term) —
        # the scale path. All-native expressions, no Python. (r6: added
        # while exonerating the r5 wall drift — pins the shape so a future
        # regression is structural, not inferred from walls.)
        "must": ["BroadcastHashJoin"],
        "must_not": ["CartesianProduct", "ArrowEvalPython", "BatchEvalPython"],
    },
    "connected_components": {
        "must": [],
        "must_not": ["CartesianProduct"],
    },
    "embedding_ann_hyperplane": {
        # Gaussian-LSH buckets must be a native expression join, no Python
        "must": [],
        "must_not": ["CartesianProduct", "BatchEvalPython", "ArrowEvalPython"],
    },
    "url_canonicalize": {
        # pure string expressions → ONE projection over the scan, no
        # shuffle, no Python. (Not WholeStageCodegen: the higher-order
        # filter() lambda keeps the projection in interpreted expression
        # mode — still JVM-native and partition-local.)
        "must": ["Project"],
        "must_not": ["CartesianProduct", "Exchange", "ArrowEvalPython"],
    },
    "pii_redaction": {
        "must": ["Project"],
        "must_not": ["CartesianProduct", "Exchange", "ArrowEvalPython"],
    },
    "repetition_stats": {
        "must": [],
        "must_not": ["CartesianProduct", "ArrowEvalPython"],
    },
    "embedding_ivf_topk": {
        # oracle twin: everything native, no Python anywhere
        "must": [],
        "must_not": ["CartesianProduct", "BatchEvalPython", "ArrowEvalPython"],
    },
    "embedding_ivf_production": {
        # Arrow matmul assignment: MapInPandas, never row-wise Python
        "must": ["MapInPandas"],
        "must_not": ["CartesianProduct", "BatchEvalPython"],
    },
    "quality_report": {
        # grouping sets lower to ONE Expand + hash aggregate — not one
        # scan/agg per grouping set; all quality features native
        "must": ["Expand", "HashAggregate"],
        "must_not": ["CartesianProduct", "ArrowEvalPython", "BatchEvalPython"],
    },
    "events_last_order_asof": {
        # union + ordered window, not a range join: one shuffle on the
        # key, a per-key sort, no join explosion and no Python
        "must": ["Window", "Union"],
        "must_not": ["CartesianProduct", "ArrowEvalPython", "BatchEvalPython"],
    },
    "repeated_substring_dedup": {
        # gram explode + groupBy + islands window + HOF reconstruction —
        # all native expressions, no Python, no all-pairs join
        "must": ["HashAggregate", "Window"],
        "must_not": ["CartesianProduct", "ArrowEvalPython", "BatchEvalPython"],
    },
    "decontamination": {
        # the holdout gram-key set must BROADCAST — the corpus side is
        # never shuffled on the gram key at 100 TB
        "must": ["BroadcastHashJoin"],
        "must_not": ["CartesianProduct", "ArrowEvalPython", "BatchEvalPython"],
    },
    "embedding_pq_topk": {
        # native sequential-fold oracle twin: the exhaustive ADC scan is a
        # deliberate broadcast nested-loop (small query side), but there
        # must be NO Python anywhere
        "must": [],
        "must_not": ["ArrowEvalPython", "BatchEvalPython"],
    },
    "embedding_pq_production": {
        # BLAS encode + LUT scoring: MapInPandas, never row-wise Python
        "must": ["MapInPandas"],
        "must_not": ["CartesianProduct", "BatchEvalPython"],
    },
    "sequence_packing": {
        # two-phase prefix sum: per-BUCKET window (parallel) + broadcast
        # bucket offsets — never an unpartitioned global window, no Python
        "must": ["Window", "BroadcastHashJoin"],
        "must_not": ["CartesianProduct", "ArrowEvalPython", "BatchEvalPython"],
    },
    "token_counts_bpe": {
        # distinct-word shape (r5): the nested-fold runs per VOCABULARY
        # entry, counts join back per doc — shuffles are expected (vocab
        # distinct + per-doc sum); still zero Python anywhere
        "must": ["HashAggregate"],
        "must_not": ["CartesianProduct", "ArrowEvalPython", "BatchEvalPython"],
    },
    "quality_classifier": {
        # hashed-ngram linear scorer: weights inlined as a literal array —
        # per-row expression only, no weight-table join, no Python
        "must": ["Project"],
        "must_not": [
            "CartesianProduct", "Exchange", "ArrowEvalPython", "BatchEvalPython",
        ],
    },
    "lm_perplexity": {
        # stupid-backoff LM scorer: score tables inlined as literal
        # arrays (broadcast by value) — one native projection over the
        # scan, no model join, no shuffle, no Python
        "must": ["Project"],
        "must_not": [
            "CartesianProduct", "Exchange", "ArrowEvalPython", "BatchEvalPython",
        ],
    },
    "decontamination_provenance": {
        # same broadcast-holdout shape as decontamination: the corpus gram
        # stream must never shuffle on the gram key
        "must": ["BroadcastHashJoin"],
        "must_not": ["CartesianProduct", "ArrowEvalPython", "BatchEvalPython"],
    },
    "near_dup_corpus": {
        # production end product. The LSH hot-bucket broadcast anti-join
        # is asserted on minhash_lsh_dup_pairs' own plan — here the CC
        # checkpoint truncates lineage, so only the final drop/canon joins
        # remain, which deliberately carry NO broadcast hint (web dedup
        # can drop 30-50% of a corpus; AQE decides from measured sizes).
        # Assert the no-Python / no-all-pairs invariants.
        "must": [],
        "must_not": ["CartesianProduct", "ArrowEvalPython", "BatchEvalPython"],
    },
    "stratified_sample": {
        # pure function of (salt, id): ONE codegen'd filter directly over
        # the scan (the projection prunes into the scan) — no shuffle, no
        # RNG state, resume-safe
        "must": ["Filter"],
        "must_not": ["CartesianProduct", "Exchange", "ArrowEvalPython"],
    },
    "line_dedup": {
        # r7 CCNet/RefinedWeb line stage: explode → trim-key groupBy
        # (map-side partial agg) → anti-join → order-preserving
        # reassembly. All native string/array expressions — no Python
        # anywhere, no all-pairs. The common-lines join deliberately
        # carries no broadcast hint (corpus-dependent size; AQE decides).
        "must": ["HashAggregate"],
        "must_not": ["CartesianProduct", "ArrowEvalPython", "BatchEvalPython"],
    },
    "semdedup": {
        # r7 SemDeDup: the ONLY Python is the Arrow-batched k-means cell
        # assignment (MapInPandas, one BLAS matmul per batch) — but the
        # CC keep-one localCheckpoints, so the FINAL plan's lineage is
        # truncated to scan + anti-join (the near_dup_corpus situation):
        # assert the no-row-Python / no-all-pairs invariants on what
        # remains.
        "must": [],
        "must_not": ["CartesianProduct", "BatchEvalPython"],
    },
    "meta_blocking_wep": {
        # r7 meta-blocking WEP: pair-key groupBy (map-side partial agg)
        # for CBS weights; the global-mean threshold is a 1-row aggregate
        # crossJoined back as a BroadcastNestedLoopJoin (the evaluate.py
        # pattern — NOT a CartesianProduct); all native, no Python.
        "must": ["HashAggregate", "BroadcastNestedLoopJoin"],
        "must_not": ["CartesianProduct", "ArrowEvalPython", "BatchEvalPython"],
    },
    "meta_blocking_cnp": {
        # r7 meta-blocking CNP: per-node top-k is a row_number Window over
        # the symmetrized edges (node-degree-bounded partitions thanks to
        # the upstream block caps); kept-pair semi-join; no Python.
        "must": ["Window"],
        "must_not": ["CartesianProduct", "ArrowEvalPython", "BatchEvalPython"],
    },
    "golden_record": {
        # r7 survivorship: CC assignment localCheckpoints (truncated
        # lineage, the near_dup_corpus situation); the consolidation
        # itself is spine groupBy + majority/longest row_number Windows
        # keyed on cluster_id — native, no Python, no all-pairs.
        "must": ["Window", "HashAggregate"],
        "must_not": ["CartesianProduct", "ArrowEvalPython", "BatchEvalPython"],
    },
    "bpe_decode_roundtrip": {
        # r7 ids→text decode: vocab-array literal + one transform per
        # doc — native end-to-end, no Python
        "must": ["Project"],
        "must_not": ["CartesianProduct", "ArrowEvalPython", "BatchEvalPython"],
    },
    "cluster_metrics": {
        # r7 B-cubed/ARI: contingency-cell aggregation — hash aggregates
        # and the 1-row broadcast folds; all native
        "must": ["HashAggregate", "BroadcastNestedLoopJoin"],
        "must_not": ["CartesianProduct", "ArrowEvalPython", "BatchEvalPython"],
    },
    "fellegi_sunter": {
        # r7 FS scoring: the weight/probability attach must be pure
        # projection — no Python eval anywhere, no cartesian; the only
        # joins are the pair-hydration equi-joins.
        "must": ["Project"],
        "must_not": ["CartesianProduct", "ArrowEvalPython", "BatchEvalPython"],
    },
    "fellegi_sunter_tf": {
        # r7 TF adjustment: one extra equi-join onto the value-frequency
        # table; still fully native
        "must": ["Project", "HashAggregate"],
        "must_not": ["CartesianProduct", "ArrowEvalPython", "BatchEvalPython"],
    },
    "blocking_quality": {
        # r7 blocking-evaluation triple: truth/covered/candidate counts
        # are 1-row aggregates composed by broadcast nested-loop joins
        # (never a CartesianProduct of data tables); all native.
        "must": ["BroadcastNestedLoopJoin"],
        "must_not": ["CartesianProduct", "ArrowEvalPython", "BatchEvalPython"],
    },
    "phonetic_blocks": {
        # late r7: Soundex/NYSIIS rule cascades are pure string
        # expressions — explode + project over the scan, zero Python
        "must": ["Project"],
        "must_not": ["CartesianProduct", "ArrowEvalPython", "BatchEvalPython"],
    },
    "ssjoin_jaccard": {
        # late r7: prefix-filtered similarity join — the token-df
        # dictionary broadcasts back onto the exploded tokens; verify is
        # native array_intersect, no Python anywhere
        "must": ["BroadcastHashJoin"],
        "must_not": ["CartesianProduct", "ArrowEvalPython", "BatchEvalPython"],
    },
    "pairs_soft_tfidf": {
        # late r7: exactly one Arrow-batched JW kernel over the
        # length-band-filtered word-pair stream; the argmax window and
        # TF-IDF joins are native
        "must": ["ArrowEvalPython"],
        "must_not": ["CartesianProduct", "BatchEvalPython"],
    },
    "pairs_monge_elkan": {
        # late r7: one Arrow JW kernel; max/avg aggregates native
        "must": ["ArrowEvalPython"],
        "must_not": ["CartesianProduct", "BatchEvalPython"],
    },
    "cosine_allpairs": {
        # late r7: residual-norm prefix join + map_zip_with verify —
        # window running sums, native map ops, zero Python
        "must": ["Window"],
        "must_not": ["CartesianProduct", "ArrowEvalPython", "BatchEvalPython"],
    },
}


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from dig_entity_resolution_spark import queries as Q
    from dig_entity_resolution_spark.session import build_session

    spark = build_session(cpus=8)
    reg = Q.spark_queries()
    failures = []
    out = ["# Physical plans (generated by tools/explain_plans.py)\n"]
    for name, checks in CHECKS.items():
        plan = plan_of(reg[name](spark, sf_dir))
        out.append(f"\n## {name}\n\n```\n{plan}\n```\n")
        for needle in checks["must"]:
            if needle not in plan:
                failures.append(f"{name}: MISSING {needle!r}")
        for needle in checks["must_not"]:
            if needle in plan:
                failures.append(f"{name}: FORBIDDEN {needle!r} present")
        n_codegen = plan.count("WholeStageCodegen")
        out.append(f"WholeStageCodegen spans: {n_codegen}\n")
    with open("PLANS.md", "w") as f:
        f.write("".join(out))
    if failures:
        print("PLAN CHECK FAILURES:")
        for x in failures:
            print(" ", x)
    else:
        print("all plan checks passed; PLANS.md written")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
