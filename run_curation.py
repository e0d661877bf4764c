"""spark-submit entry point for the training-data CURATION pipeline —
the webtext twin of run_pipeline.py (same launch contract):

    zip -r er_engine.zip dig_entity_resolution_spark
    spark-submit --py-files er_engine.zip run_curation.py \
        --input /path/documents_parquet --warehouse /path/wh --run-id C1 \
        [--holdout /path/eval_parquet] [--select-k N] [--resume] [--no-pack] \
        [--deltas /path/crawl_b1,/path/crawl_b2]   # incremental mode

Local sandbox run uses the same file (master defaults to local[*]).
Prints a one-line JSON report: per-stage counters, survivor/chunk counts,
and the stages this invocation actually computed (resume visibility).
"""

from __future__ import annotations

import argparse
import json
import sys

from dig_entity_resolution_spark.plans.curation import (
    CurationConfig,
    CurationPipeline,
)
from dig_entity_resolution_spark.session import build_session


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="documents parquet path")
    p.add_argument("--warehouse", required=True)
    p.add_argument("--run-id", default="cur0")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--holdout", help="eval-set parquet for decontamination")
    p.add_argument("--min-ws-tokens", type=int, default=5)
    p.add_argument("--max-punct-ratio", type=float, default=0.5)
    p.add_argument(
        "--no-classifier", action="store_true",
        help="disable the hashed-ngram quality classifier gate",
    )
    p.add_argument(
        "--keep-ppl-buckets", default="head,middle",
        help="comma list of CCNet perplexity buckets to keep "
        "(head/middle/tail); empty string disables the LM gate",
    )
    p.add_argument("--jaccard-threshold", type=float, default=0.5)
    p.add_argument("--max-bucket", type=int, default=200)
    p.add_argument("--decontam-n", type=int, default=8)
    p.add_argument(
        "--select-k", type=int, default=None,
        help="DSIR importance selection: keep the top-k docs by importance "
        "weight (omit to keep everything)",
    )
    p.add_argument(
        "--select-frac", type=float, default=None,
        help="DSIR selection as a keep FRACTION via approx-quantile "
        "threshold (the at-scale alternative to --select-k)",
    )
    p.add_argument("--no-pack", action="store_true",
                   help="stop after selection; skip BPE packing")
    p.add_argument("--bpe-merges", type=int, default=40)
    p.add_argument("--seq-len", type=int, default=128)
    p.add_argument(
        "--deltas", default=None,
        help="comma list of delta parquet paths: run the INCREMENTAL "
        "pipeline — init on --input, then apply each delta batch in "
        "order (plans/curation_incremental.py); reports per-batch "
        "additions/removals/tombstones. Incompatible with --resume and "
        "--select-k (use --select-frac)",
    )
    p.add_argument(
        "--group-hex", type=int, default=None,
        help="incremental packing stream granularity (16^n groups); "
        "default auto-sizes per batch so groups hold ~64 docs (the "
        "repair unit stays constant as the corpus grows)",
    )
    p.add_argument(
        "--audit-trail", action="store_true",
        help="incremental mode: durably checkpoint every intermediate "
        "delta stage (b{n}_hygiene/quality/dedup/decontam/selected) "
        "instead of the lean default (chunks only) — ~4.5s extra per "
        "batch of audit value",
    )
    args = p.parse_args(argv)
    if args.deltas:  # validate BEFORE the session spins up
        if args.resume:
            p.error("--deltas is incompatible with --resume")
        if args.select_k is not None:
            p.error(
                "--deltas is incompatible with --select-k (global top-k is "
                "not an incremental decision; use --select-frac)"
            )
        if args.no_pack:
            p.error(
                "--deltas requires packing (the chunk map is incremental "
                "state); drop --no-pack"
            )

    cfg = CurationConfig(
        min_ws_tokens=args.min_ws_tokens,
        max_punct_ratio=args.max_punct_ratio,
        use_classifier=not args.no_classifier,
        keep_ppl_buckets=tuple(
            b.strip() for b in args.keep_ppl_buckets.split(",") if b.strip()
        ),
        jaccard_threshold=args.jaccard_threshold,
        max_bucket=args.max_bucket,
        decontam_n=args.decontam_n,
        select_k=args.select_k,
        select_frac=args.select_frac,
        pack=not args.no_pack,
        bpe_merges=args.bpe_merges,
        seq_len=args.seq_len,
    )
    spark = build_session(app_name=f"curation-{args.run_id}")
    docs = spark.read.parquet(args.input)
    holdout = spark.read.parquet(args.holdout) if args.holdout else None
    if args.deltas:
        from dig_entity_resolution_spark.plans.curation_incremental import (
            IncrementalCuration,
        )

        inc = IncrementalCuration(
            spark, args.warehouse, args.run_id, cfg,
            group_hex=args.group_hex, audit_trail=args.audit_trail,
        )
        chunks = inc.init(docs, holdout=holdout)
        batches = []
        for path in (s.strip() for s in args.deltas.split(",")):
            if not path:
                continue
            out = inc.delta(spark.read.parquet(path), holdout=holdout)
            batches.append(
                {
                    "delta": path,
                    "additions": out["additions"].count(),
                    "removals": out["removals"].count(),
                    "tombstones": out["tombstones"].count(),
                    "new_chunks": out["chunks"].count(),
                }
            )
        report = {
            "run_id": args.run_id,
            "mode": "incremental",
            "init_chunks": chunks.count(),
            "batches": batches,
            "live_chunks": inc.live_chunks().count(),
            "counters": inc.ckpt.counters(),
        }
    else:
        pipe = CurationPipeline(spark, args.warehouse, args.run_id, cfg)
        out = pipe.run(docs, holdout=holdout, resume=args.resume)
        report = {
            "run_id": args.run_id,
            "resumed": args.resume,
            "computed_stages": pipe.computed_stages,
            "counters": pipe.report(),
            "rows_out": out.count(),
        }
    print(json.dumps(report))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
