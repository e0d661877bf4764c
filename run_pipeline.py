"""spark-submit entry point for the ER pipeline.

Cluster launch (the contract's submission mode [BASELINE.json:6]):

    zip -r er_engine.zip dig_entity_resolution_spark
    spark-submit --py-files er_engine.zip run_pipeline.py \
        --input /path/pages_parquet --warehouse /path/wh --run-id R1 \
        [--resume] [--labels /path/labels.parquet] [--use-extractor]

Local sandbox run uses the same file (master defaults to local[*]).
"""

from __future__ import annotations

import argparse
import json
import sys

from dig_entity_resolution_spark.plans.pipeline import ERConfig, ERPipeline
from dig_entity_resolution_spark.session import build_session


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="pages parquet path/table")
    p.add_argument("--warehouse", required=True)
    p.add_argument("--run-id", default="run0")
    p.add_argument("--resume", action="store_true")
    p.add_argument(
        "--incremental-from",
        help="base run-id in the same warehouse: resolve --input as a NEW "
        "batch against that already-resolved corpus (delta-proportional "
        "incremental ER; only unscored pairs are scored)",
    )
    p.add_argument(
        "--recrawl-mode",
        choices=["append_only", "latest_wins"],
        default="append_only",
        help="with --incremental-from: append_only keeps the first-seen "
        "snapshot per url (warm-started CC); latest_wins retracts and "
        "rescores urls recrawled with a strictly newer warc_ts",
    )
    p.add_argument(
        "--id-bits",
        type=int,
        choices=[64, 128],
        default=64,
        help="record-id width: 64 = xxhash64(url); 128 = struct<hi,lo> "
        "(collision-safe at 10^12 docs)",
    )
    p.add_argument(
        "--check-id-collisions",
        action="store_true",
        help="fail fast if distinct urls share a record id (the signal to "
        "switch to --id-bits 128)",
    )
    p.add_argument("--labels", help="url-keyed labels parquet for F1 report")
    p.add_argument("--calibrate", action="store_true",
                   help="sweep the match threshold on --labels and report best (tau, F1)")
    p.add_argument("--use-extractor", action="store_true",
                   help="derive text from html (byte-identical extractor)")
    p.add_argument("--threshold", type=float, default=0.80)
    p.add_argument("--max-block-size", type=int, default=100)
    p.add_argument("--block-top-n", type=int, default=50)
    p.add_argument("--n-salts", type=int, default=16)
    p.add_argument(
        "--strategies",
        default="token,prefix,minhash_lsh",
        help="comma list of blocking strategies: token, prefix, "
        "minhash_lsh, phonetic (r7; Soundex+NYSIIS token codes), "
        "similarity_join (r7; pair-producing exact shingle-Jaccard "
        "ssjoin, guaranteed recall at ssjoin_t), "
        "sorted_neighborhood (r5; pair-producing — see "
        "ERConfig)",
    )
    p.add_argument("--sn-window", type=int, default=4)
    p.add_argument(
        "--sn-bucket-chars", type=int, default=4,
        help="SN bucket prefix length — size to the corpus (see "
        "sorted_neighborhood_pairs docstring)",
    )
    p.add_argument(
        "--ssjoin-t", type=float, default=0.5,
        help="similarity_join strategy: exact shingle-Jaccard threshold",
    )
    p.add_argument(
        "--ssjoin-shingle-k", type=int, default=5,
        help="similarity_join strategy: char-shingle width",
    )
    p.add_argument(
        "--phonetic-encoders", default="soundex,nysiis",
        help="phonetic strategy: comma list from {soundex, nysiis}",
    )
    p.add_argument(
        "--scorer", default="blend", choices=("blend", "fellegi_sunter"),
        help="pair scorer: the weighted feature blend (default) or the "
        "EM-fitted Fellegi-Sunter model (operators/fellegi_sunter.py; "
        "the fitted model persists as fs_model.json in the warehouse — "
        "incremental runs recover the base run's pinned weights "
        "automatically)",
    )
    args = p.parse_args(argv)

    spark = build_session(app_name=f"er-pipeline-{args.run_id}")
    cfg = ERConfig(
        strategies=tuple(
            s.strip() for s in args.strategies.split(",") if s.strip()
        ),
        threshold=args.threshold,
        max_block_size=args.max_block_size,
        block_top_n=args.block_top_n,
        n_salts=args.n_salts,
        sn_window=args.sn_window,
        sn_bucket_chars=args.sn_bucket_chars,
        ssjoin_t=args.ssjoin_t,
        ssjoin_shingle_k=args.ssjoin_shingle_k,
        phonetic_encoders=tuple(
            s.strip() for s in args.phonetic_encoders.split(",") if s.strip()
        ),
        use_extractor=args.use_extractor,
        id_bits=args.id_bits,
        check_id_collisions=args.check_id_collisions,
        scorer=args.scorer,
    )
    pipe = ERPipeline(spark, args.warehouse, args.run_id, cfg)
    pages = spark.read.parquet(args.input)
    if args.incremental_from:
        clusters = pipe.run_incremental(
            pages, args.incremental_from, mode=args.recrawl_mode
        )
    else:
        clusters = pipe.run(pages, resume=args.resume)
    report = {
        "run_id": args.run_id,
        "resumed": args.resume,
        "incremental_from": args.incremental_from,
        "computed_stages": pipe.computed_stages,
        "counters": pipe.ckpt.counters(),
        "n_clusters": clusters.select("cluster_id").distinct().count(),
    }
    if args.labels:
        labels = spark.read.parquet(args.labels)
        prf = pipe.evaluate(clusters, labels).collect()[0]
        report["eval"] = {k: float(prf[k]) for k in ("precision", "recall", "f1")}
        report["eval"].update({k: int(prf[k]) for k in ("tp", "fp", "fn")})
        if args.calibrate:
            tau, f1 = pipe.calibrate(labels)
            report["calibration"] = {"best_tau": tau, "best_f1": round(f1, 6)}
    print(json.dumps(report))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
