"""Incremental curation — the recurring-crawl form of plans/curation.py.

The batch CurationPipeline re-derives the world per run: artifacts are
refit, the corpus re-deduplicates, every chunk repacks. A recurring
crawl instead processes each new batch against STATE, with cost
proportional to the delta and what it touches:

  hygiene / quality   per-doc with PINNED artifacts: the LM, the CCNet
                      per-language perplexity-tertile THRESHOLDS (derived
                      once from the init corpus's ntile table — the
                      production CCNet posture: fixed thresholds, not
                      corpus-relative tiles), the hashed-ngram classifier
                      (already a fixed model), the DSIR weights and
                      selection threshold, and the BPE merges/vocab.
                      Pinning is what makes a doc's verdict a pure
                      function of its text — the property every
                      downstream delta computation relies on.
  exact dedup         a (content_key, canonical_id) state table;
                      first-seen-wins (the only canonical rule an
                      append-only stream can honor — batch min-id
                      equality holds when ids increase across batches).
  near-dup            operators/dedup_incremental (delta-keyed LSH
                      buckets, affected-subgraph CC); the upsert is
                      near_dup_emit(only_touched=True).
  decontam/selection  per-doc filters over the ADDITIONS only (fixed
                      holdout n-gram keys; pinned DSIR threshold —
                      select_k is global-top-k and therefore not an
                      incremental decision: init() rejects it).
  packing             each batch packs its additions into its OWN
                      chunk stream (salt keyed by batch). Self-contained
                      streams are what bound removal repair: a removal
                      never perturbs another batch's chunks.

Removals and chunk repair (the part batch pipelines get for free):
adding docs can MERGE old clusters (a previously-kept canonical is
absorbed → leaves the corpus) and cap-crossing buckets can retract
edges and SPLIT clusters (previously-dropped docs re-emerge). A removed
doc's tokens sit in packed chunks, and chunk boundaries don't align
with doc boundaries — in a single concat-and-chunk stream the
shares-a-chunk component of one removed doc is typically the WHOLE
stream (every boundary is crossed by some doc), so exact repair would
repack everything. The incremental packer therefore uses
pack_chunk_map_grouped: each batch packs into 16^group_hex independent
md5-group streams, so the repair unit is the GROUP — tombstone the
removed docs' groups' chunks, re-emit those groups' still-live docs in
the current batch's new stream. One join, no closure loop, repair cost
≤ (#removed groups) × (batch docs / 16^group_hex). group_hex is sized
PER BATCH (auto_group_hex, r7): a fixed group count makes the repair
unit corpus-proportional — the measured 10× sweep tombstoned 15× the
chunks for the same removals — so groups track ~target_group_docs docs
regardless of batch size. Token coverage
stays EXACT: every live doc's ids appear exactly once across live
chunks (pinned by test_chunk_coverage_after_merge_removal).

Like NearDupState, the state is session-lifetime (lazy unions of
localCheckpoint'd segments; new rows snap per batch, `compact()` folds
periodically). init()'s stage outputs and every batch's chunk stream
land in the ParquetCheckpoint (`b{n:04d}_<stage>`); `audit_trail=True`
extends that to every intermediate delta stage — the LEAN default skips
those durable writes because nothing reads them back and they were
~4.5 s of scale-independent wall per batch (r7, VERDICT r6 #1); at
100 TB the state tables live in parquet bucketed by their join keys
(content_key / bucket / cluster_id / doc_id) and each batch MERGEs only
touched partitions — the dedup_incremental module's shape.
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass, replace

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.bpe import (
    bpe_encode_ids,
    bpe_word_freqs_distributed,
    build_vocab,
    fit_bpe_merges,
)
from ..functions.dsir import (
    DIM,
    _counts_py,
    dsir_score_docs,
    fit_dsir_weights,
    raw_counts_distributed,
)
from ..functions.lm import StupidBackoffLM, fit_stupid_backoff_distributed
from ..functions.normalize import normalize_text
from ..operators.decontaminate import decontaminate
from ..operators.dedup import exact_dup_groups
from ..operators.dedup_incremental import (
    NearDupConfig,
    NearDupState,
    _snap,
    near_dup_delta,
    near_dup_emit,
    near_dup_init,
)
from ..operators.packing import (
    auto_group_hex,
    chunks_from_map,
    pack_chunk_map_grouped,
)
from .checkpoint import ParquetCheckpoint
from .curation import (
    CurationConfig,
    hygiene_stage,
    ntile_ppl_buckets,
    quality_audit,
)

#: the pipeline's canonical doc projection — the ONE schema every state
#: table and cross-batch union sees, whatever passthrough columns a
#: given crawl batch carries.
_DOC_COLS = ("doc_id", "text", "lang")


@dataclass(frozen=True)
class CurationArtifacts:
    """Everything fit ONCE (on the init corpus, or injected) and pinned
    for every later batch. ppl_thresholds rows are (lang, head_min,
    middle_min): bucket = head if avg_logp10 >= head_min, else middle if
    >= middle_min, else tail; a lang with no middle tier at init stores
    +inf (below-head scores land in tail); a lang UNSEEN at init maps to
    'middle' (neutral — it passes the default head+middle gate without
    claiming head quality)."""

    lm: StupidBackoffLM | None
    ppl_thresholds: tuple[tuple[str, float, float], ...]
    dsir_wt: object | None
    dsir_thr_micro: int | None
    bpe_merges: tuple
    bpe_vocab: dict


def fixed_ppl_buckets(thresholds: tuple[tuple[str, float, float], ...]):
    """quality_audit bucket builder using pinned per-language thresholds
    (see CurationArtifacts). The incremental twin of ntile_ppl_buckets."""

    def build(scored: DataFrame) -> DataFrame:
        if not thresholds:
            return scored.withColumn("ppl_bucket", F.lit("middle"))
        head = F.create_map(
            *itertools.chain.from_iterable(
                (F.lit(lang), F.lit(h)) for lang, h, _ in thresholds
            )
        )
        mid = F.create_map(
            *itertools.chain.from_iterable(
                (F.lit(lang), F.lit(m)) for lang, _, m in thresholds
            )
        )
        h = head[F.col("lang")]
        m = mid[F.col("lang")]
        s = F.col("avg_logp10")
        return scored.withColumn(
            "ppl_bucket",
            F.when(h.isNull(), F.lit("middle"))
            .when(s >= h, F.lit("head"))
            .when(s >= m, F.lit("middle"))
            .otherwise(F.lit("tail")),
        )

    return build


def derive_ppl_thresholds(
    quality: DataFrame,
) -> tuple[tuple[str, float, float], ...]:
    """Pin per-language thresholds from a batch (ntile) quality table:
    head_min = the lowest score ntile placed in head, middle_min likewise.
    Tiny driver collect — one row per language."""
    rows = (
        quality.groupBy("lang")
        .agg(
            F.min(
                F.when(F.col("ppl_bucket") == "head", F.col("avg_logp10"))
            ).alias("h"),
            F.min(
                F.when(F.col("ppl_bucket") == "middle", F.col("avg_logp10"))
            ).alias("m"),
        )
        .collect()
    )
    return tuple(
        sorted(
            (
                r["lang"],
                float(r["h"]),
                float(r["m"]) if r["m"] is not None else float("inf"),
            )
            for r in rows
        )
    )


@dataclass
class CurationState:
    art: CurationArtifacts
    nd: NearDupState
    #: (content_key, doc_id) — first-seen canonical per exact-dup key
    content_keys: DataFrame
    #: (doc_id,) — docs currently live in the packed stream
    shipped: DataFrame
    #: pack_chunk_map_grouped rows + batch column, LIVE docs only:
    #: (doc_id, n_tokens, global_start, first_chunk, last_chunk,
    #:  n_chunks, pack_group, batch)
    chunk_map: DataFrame
    batch_no: int

    def compact(self) -> "CurationState":
        """Fold segment stacks into single checkpointed leaves (LSM
        posture — O(corpus), run periodically, not per batch)."""
        return replace(
            self,
            nd=self.nd.compact(),
            content_keys=_snap(self.content_keys),
            shipped=_snap(self.shipped),
            chunk_map=_snap(self.chunk_map),
        )


def _chunk_membership(chunk_map: DataFrame) -> DataFrame:
    """(batch, chunk_id, doc_id) incidence rows from the interval map —
    a doc contributes ≤ n_tokens/capacity + 1 rows."""
    return chunk_map.select(
        "batch",
        F.explode(F.sequence("first_chunk", "last_chunk")).alias("chunk_id"),
        "doc_id",
    )


class IncrementalCuration:
    """init() once, then delta() per crawl batch. init checkpoints every
    stage under b0000_<stage>; delta durably writes b{n:04d}_chunks (and,
    with audit_trail=True, every intermediate stage). Returns per-batch
    additions, removals and chunk tombstones — the upsert a downstream
    consumer applies."""

    def __init__(
        self,
        spark: SparkSession,
        warehouse: str,
        run_id: str = "cur_incr0",
        config: CurationConfig | None = None,
        group_hex: int | None = None,
        audit_trail: bool = False,
        target_group_docs: int = 64,
    ):
        """`group_hex=None` (default) sizes the packing-group count per
        batch with auto_group_hex so each group holds ~target_group_docs
        docs — the repair unit stays constant as the corpus grows. Pass
        an int to pin a fixed group count (tests; group_hex=0 = one
        stream).

        `audit_trail=True` durably checkpoints every intermediate delta
        stage (b{n}_hygiene/quality/dedup/decontam/selected) like r6 did.
        The default is LEAN (r7, VERDICT r6 #1): only `b{n}_chunks` — the
        one artifact live_chunks() reads back — is written per batch;
        intermediates are localCheckpoint-materialized (still computed
        exactly once) but not persisted. The six durable writes were
        ~4.5 s of scale-independent wall on EVERY batch at the 5k bench,
        paid for audit value nothing consumed. init() always writes its
        full trail — it is one-time and derive_ppl_thresholds audits
        read b0000_quality."""
        self.spark = spark
        self.cfg = config or CurationConfig()
        self.group_hex = group_hex
        self.target_group_docs = target_group_docs
        self.audit_trail = audit_trail
        if self.cfg.select_k is not None:
            raise ValueError(
                "incremental curation needs select_frac or no selection: "
                "select_k is a global top-k — a per-batch decision cannot "
                "honor it (a later batch's doc can evict an earlier pick)"
            )
        self.ckpt = ParquetCheckpoint(spark, warehouse, run_id)
        self.state: CurationState | None = None
        #: per-stage wall of the most recent delta() — profiling hook
        self.last_delta_timings: dict[str, float] = {}

    # -- shared per-doc stages -------------------------------------------

    def _decontam_filter(
        self, docs: DataFrame, holdout: DataFrame | None
    ) -> DataFrame:
        if holdout is None:
            return docs
        verdict = decontaminate(
            docs,
            holdout,
            id_col="doc_id",
            text_col="text",
            n=self.cfg.decontam_n,
            min_hits=self.cfg.decontam_min_hits,
        )
        return docs.join(
            verdict.filter(F.col("contaminated")).select("doc_id"),
            "doc_id",
            "left_anti",
        )

    def _nd_cfg(self) -> NearDupConfig:
        c = self.cfg
        return NearDupConfig(
            shingle_k=c.shingle_k,
            num_perm=c.num_perm,
            bands=c.bands,
            jaccard_threshold=c.jaccard_threshold,
            max_bucket=c.max_bucket,
        )

    def _pack(self, docs: DataFrame, batch: int):
        """Encode with the pinned BPE artifacts and pack into THIS
        batch's self-contained stream. Returns (chunks, map_rows,
        packed_ids); zero-token docs are excluded (they cannot occupy
        the packed stream — the pack_sequences contract)."""
        art = self.state.art if self.state else None
        merges, vocab = (
            (art.bpe_merges, art.bpe_vocab)
            if art is not None
            else (self._merges, self._vocab)
        )
        ids = _snap(
            bpe_encode_ids(docs, "doc_id", "text", merges, vocab).filter(
                F.size("token_ids") > 0
            )
        )
        # per-batch group sizing: the repair unit must stay ~constant as
        # corpora grow (fixed 16^g groups made it corpus-proportional —
        # r7 10× sweep). ids is already snapped, so the count is one
        # cheap metadata-ish job over the materialized segment.
        g = (
            self.group_hex
            if self.group_hex is not None
            else auto_group_hex(
                ids.count(), self.cfg.seq_len, self.target_group_docs
            )
        )
        salt = f"pack:b{batch:04d}"
        m = _snap(
            pack_chunk_map_grouped(
                ids,
                capacity=self.cfg.seq_len,
                salt=salt,
                group_hex=g,
            ).withColumn("batch", F.lit(batch))
        )
        chunks = chunks_from_map(
            m.drop("batch"), ids, capacity=self.cfg.seq_len
        ).withColumn("batch", F.lit(batch))
        return chunks, m, ids.select("doc_id")

    # -- init --------------------------------------------------------------

    def init(
        self, docs: DataFrame, holdout: DataFrame | None = None
    ) -> DataFrame:
        """Batch-build state from the initial corpus (the b0000 run);
        returns the packed-chunk table."""
        if self.state is not None:
            raise ValueError("init() already ran — use delta() for new batches")
        cfg, ck = self.cfg, self.ckpt
        hygiene = ck.write("b0000_hygiene", hygiene_stage(docs, cfg))
        lm = None
        if cfg.keep_ppl_buckets:
            lm = cfg.lm or fit_stupid_backoff_distributed(hygiene)
        quality = ck.write(
            "b0000_quality", quality_audit(hygiene, cfg, lm, ntile_ppl_buckets)
        )
        thresholds = (
            derive_ppl_thresholds(quality) if cfg.keep_ppl_buckets else ()
        )
        kept = quality.filter(F.col("keep")).select(*_DOC_COLS)
        # snap the NARROW group table once (late-r8): content_keys,
        # survivors and near_dup_init's shingle/docs materializations all
        # sit above `groups`, and left lazy each of those actions re-ran
        # the exact-dedup chain (normalize regex + md5 + group agg over
        # the full corpus) from the quality checkpoint — ~3 recomputes
        # per init at the 10x bench corpus.
        groups = _snap(exact_dup_groups(kept, "doc_id", "text"))
        survivors = kept.join(
            groups.filter(~F.col("is_canonical")).select("doc_id"),
            "doc_id",
            "left_anti",
        )
        content_keys = _snap(
            groups.filter(F.col("is_canonical")).select("content_key", "doc_id")
        )
        nd = near_dup_init(survivors, "doc_id", "text", self._nd_cfg())
        corpus = ck.write("b0000_dedup", near_dup_emit(nd))
        decon = ck.write(
            "b0000_decontam", self._decontam_filter(corpus, holdout)
        )
        dsir_wt = dsir_thr = None
        selected = decon
        if cfg.select_frac is not None:
            dsir_wt = fit_dsir_weights(
                _counts_py(list(cfg.dsir_target_texts), DIM),
                raw_counts_distributed(decon),
            )
            scored = dsir_score_docs(decon, dsir_wt)
            if cfg.select_frac < 1.0:
                dsir_thr = int(
                    scored.approxQuantile(
                        "logratio_micro", [1.0 - cfg.select_frac], 0.001
                    )[0]
                )
            else:
                dsir_thr = None
            top = scored.select("doc_id", "logratio_micro")
            if dsir_thr is not None:
                top = top.filter(F.col("logratio_micro") >= F.lit(dsir_thr))
            selected = decon.join(top, "doc_id").select(
                *[F.col(c) for c in decon.columns], "logratio_micro"
            )
        selected = ck.write("b0000_selected", selected)
        # BPE artifacts fit on the shipped corpus (the batch-pipeline rule)
        freqs = bpe_word_freqs_distributed(selected)
        self._merges = fit_bpe_merges(freqs, cfg.bpe_merges)
        self._vocab = build_vocab(self._merges, {ch for w in freqs for ch in w})
        chunks, chunk_map, shipped = self._pack(
            selected.select("doc_id", "text"), batch=0
        )
        chunks = ck.write("b0000_chunks", chunks)
        self.state = CurationState(
            art=CurationArtifacts(
                lm=lm,
                ppl_thresholds=thresholds,
                dsir_wt=dsir_wt,
                dsir_thr_micro=dsir_thr,
                bpe_merges=self._merges,
                bpe_vocab=self._vocab,
            ),
            nd=nd,
            content_keys=content_keys,
            shipped=_snap(shipped),
            chunk_map=chunk_map,
            batch_no=1,
        )
        return chunks

    # -- delta --------------------------------------------------------------

    def delta(
        self,
        delta_docs: DataFrame,
        holdout: DataFrame | None = None,
        check_new_ids: bool = False,
    ) -> dict[str, DataFrame]:
        """Process one new crawl batch. Returns the consumer's upsert:
        additions (new shipped docs), removals (doc ids leaving the
        corpus), tombstones (batch, chunk_id pairs a consumer deletes)
        and chunks (this batch's new stream, which also re-packs live
        docs displaced by tombstoned chunks)."""
        if self.state is None:
            raise ValueError("run init() before delta()")
        st, cfg, ck = self.state, self.cfg, self.ckpt
        art = st.art
        n = st.batch_no
        tag = f"b{n:04d}"

        # per-stage wall clock of the eager materializations, for
        # profiling/observability (each _snap/ck.write below is an
        # action; everything between two marks is one stage's work)
        import time as _time

        _tm: dict[str, float] = {}
        _t0 = _time.time()

        def _mark(stage: str) -> None:
            nonlocal _t0
            now = _time.time()
            _tm[stage] = round(now - _t0, 3)
            _t0 = now

        # lean default: materialize (compute-once) without the durable
        # write — see __init__. hygiene is consumed only by quality, so
        # lean mode never materializes it separately at all.
        def dur(stage: str, df: DataFrame) -> DataFrame:
            return ck.write(stage, df) if self.audit_trail else _snap(df)

        hyg = hygiene_stage(delta_docs, cfg)
        if self.audit_trail:
            hyg = ck.write(f"{tag}_hygiene", hyg)
        qual = dur(
            f"{tag}_quality",
            quality_audit(
                hyg, cfg, art.lm, fixed_ppl_buckets(art.ppl_thresholds)
            ),
        )
        kept = qual.filter(F.col("keep")).select(*_DOC_COLS)
        _mark("quality")

        # exact dedup vs state: first-seen-wins. Delta-keyed, and in the
        # scan-not-shuffle form: an anti-join with the corpus-sized state
        # on the RIGHT would shuffle the state per delta; instead the
        # state is SCANNED with a delta-bounded probe (AQE broadcasts the
        # small side), and the anti-join's right side is the delta-sized
        # intersection.
        keyed = kept.withColumn(
            "content_key", F.md5(normalize_text("text"))
        )
        hit_keys = st.content_keys.join(
            keyed.select("content_key").dropDuplicates(["content_key"]),
            "content_key",
            "left_semi",
        ).select("content_key")
        # SNAP fresh (delta-bounded) so the corpus-sized content_keys
        # probe runs ONCE: fresh's plan embeds that scan, and leaving it
        # lazy meant every downstream materialization — new_keys here,
        # plus each snapped segment inside near_dup_delta via survivors —
        # re-ran it (the notes-#52 lazy-input class; measured at the 10x
        # sweep as the near_dup stage growing 6.7→15.6s while the
        # standalone incr_near_dup delta stayed flat). survivors is
        # snapped too so near_dup_delta's internal actions replay a
        # 100-row leaf, not a groupBy.
        fresh = _snap(keyed.join(hit_keys, "content_key", "left_anti"))
        canon = fresh.groupBy("content_key").agg(
            F.min("doc_id").alias("doc_id")
        )
        survivors = _snap(
            fresh.join(canon, ["content_key", "doc_id"], "left_semi").select(
                *_DOC_COLS
            )
        )
        new_keys = _snap(canon.select("content_key", "doc_id"))
        _mark("exact_dedup")

        nd2 = near_dup_delta(st.nd, survivors, check_new_ids=check_new_ids)
        upsert = _snap(near_dup_emit(nd2, only_touched=True))
        _mark("near_dup")
        if self.audit_trail:
            ck.write(f"{tag}_dedup", upsert)

        # removals: previously shipped docs in a touched cluster that are
        # no longer survivors (absorbed by a merge). Touched membership =
        # clustered members of touched clusters + the touched ids
        # themselves (singletons have no assign row).
        touched = nd2.touched_clusters
        touched_members = (
            nd2.assign.join(F.broadcast(touched), "cluster_id", "left_semi")
            .select("doc_id")
            .unionByName(touched.withColumnRenamed("cluster_id", "doc_id"))
            .dropDuplicates(["doc_id"])
        )
        upsert_ids = upsert.select("doc_id")
        removals = _snap(
            st.shipped.join(touched_members, "doc_id", "left_semi").join(
                upsert_ids, "doc_id", "left_anti"
            )
        )
        _mark("removals")

        # additions: upsert survivors not already shipped, through the
        # pinned decontam + DSIR gates. Same scan-not-shuffle shape: probe
        # the corpus-sized shipped set with the (touched-cluster-bounded)
        # upsert ids, anti-join against the small intersection.
        already = st.shipped.join(upsert_ids, "doc_id", "left_semi")
        additions_raw = upsert.join(already, "doc_id", "left_anti")
        decon = dur(
            f"{tag}_decontam", self._decontam_filter(additions_raw, holdout)
        )
        add = decon
        if art.dsir_wt is not None:
            scored = dsir_score_docs(decon, art.dsir_wt)
            if art.dsir_thr_micro is not None:
                scored = scored.filter(
                    F.col("logratio_micro") >= F.lit(art.dsir_thr_micro)
                )
            add = decon.join(
                scored.select("doc_id", "logratio_micro"), "doc_id"
            ).select(*[F.col(c) for c in decon.columns], "logratio_micro")
        add = dur(f"{tag}_selected", add)
        _mark("decontam_select")

        # chunk repair, group-bounded by the pack layout: a removed doc
        # invalidates its (batch, pack_group) streams; every live doc of
        # those groups re-packs into this batch's new stream. One join,
        # no closure loop — removed_groups is bounded by the removals, so
        # the broadcast is delta-sized (the notes-#34 rule satisfied).
        removed_groups = (
            st.chunk_map.join(removals, "doc_id", "left_semi")
            .select("batch", "pack_group")
            .dropDuplicates(["batch", "pack_group"])
        )
        affected_rows = st.chunk_map.join(
            F.broadcast(removed_groups), ["batch", "pack_group"], "left_semi"
        )
        affected = _snap(
            affected_rows.select("doc_id").dropDuplicates(["doc_id"])
        )
        tombstones = _snap(
            _chunk_membership(affected_rows)
            .select("batch", "chunk_id")
            .dropDuplicates(["batch", "chunk_id"])
        )
        _mark("chunk_repair")

        # re-emit: affected docs that are still live get their FULL token
        # arrays repacked into this batch's stream (their old chunks are
        # tombstoned above)
        reemit_ids = affected.join(removals, "doc_id", "left_anti")
        reemit_docs = (
            nd2.docs.join(reemit_ids, "doc_id", "left_semi")
            .select("doc_id", "text")
        )
        # SNAP before _pack's BPE encode: left lazy, the optimizer can
        # push the encode's size(token_ids)>0 filter — with the whole
        # token-id expression inlined — below this corpus-sized semi-join
        # (the notes-#52 pushdown class), encoding every state doc
        # instead of the ~group-sized re-emit set. The snap is
        # delta-bounded: additions + affected-group survivors.
        pack_in = _snap(
            add.select("doc_id", "text").unionByName(reemit_docs)
        )
        chunks, new_map, packed_ids = self._pack(pack_in, batch=n)
        chunks = ck.write(f"{tag}_chunks", chunks)
        _mark("pack")

        new_add_ids = _snap(packed_ids.join(reemit_ids, "doc_id", "left_anti"))
        self.state = CurationState(
            art=art,
            nd=nd2,
            content_keys=st.content_keys.unionByName(new_keys),
            shipped=st.shipped.join(removals, "doc_id", "left_anti").unionByName(
                new_add_ids
            ),
            chunk_map=st.chunk_map.join(
                affected, "doc_id", "left_anti"
            ).unionByName(new_map),
            batch_no=n + 1,
        )
        _mark("state_update")
        self.last_delta_timings = dict(_tm)
        return {
            "upsert": upsert,
            "additions": add.join(new_add_ids, "doc_id", "left_semi"),
            "removals": removals,
            "tombstones": tombstones,
            "chunks": chunks,
        }

    # -- consumers ----------------------------------------------------------

    def live_chunks(self) -> DataFrame:
        """Every non-tombstoned chunk across all batch streams — the
        current training set. A chunk is live iff the chunk map still
        references it (repair re-packs every doc of a tombstoned chunk,
        so live chunks contain only live docs)."""
        if self.state is None:
            raise ValueError("run init() first")
        all_chunks = None
        for b in range(self.state.batch_no):
            t = self.ckpt.read(f"b{b:04d}_chunks")
            all_chunks = t if all_chunks is None else all_chunks.unionByName(t)
        live = _chunk_membership(self.state.chunk_map).dropDuplicates(
            ["batch", "chunk_id"]
        )
        return all_chunks.join(live, ["batch", "chunk_id"], "left_semi")
