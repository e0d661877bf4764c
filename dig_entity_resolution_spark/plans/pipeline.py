"""The end-to-end ER pipeline DAG with checkpoint/resume (SURVEY.md §3).

pages → records → blocks → cand_pairs → scored_pairs → edges → clusters

Each stage reads the previous stage's checkpoint table and appends its own,
so a killed run resumes from the last complete stage ([BASELINE.json:14]).
Launchable via `spark-submit --py-files er_engine.zip run_pipeline.py`.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import schemas
from ..extract import extract_text_col
from ..functions.hashing import record_id_from_url
from ..functions.normalize import normalize_text, tokenize
from ..operators.blocking import (
    all_blocks,
    candidate_pairs,
    cap_block_size,
    salt_blocks,
    suppress_stop_keys,
)
from ..operators.cluster import (
    canonical_edges,
    clusters_with_singletons,
    connected_components,
)
from ..operators.evaluate import cluster_pairs, pairwise_prf
from ..operators.scoring import score_pairs
from .checkpoint import ParquetCheckpoint

STAGES = ["records", "blocks", "cand_pairs", "scored_pairs", "edges", "clusters"]


@dataclass
class ERConfig:
    strategies: tuple[str, ...] = ("token", "prefix", "minhash_lsh")
    min_token_len: int = 3
    prefix_n: int = 8
    shingle_k: int = 5
    num_perm: int = 32
    bands: int = 8
    max_block_size: int = 100
    block_top_n: int = 50
    n_salts: int = 16
    threshold: float = 0.80
    with_tfidf: bool = True
    weights: dict = field(
        default_factory=lambda: {"jw": 0.35, "lev_sim": 0.25, "tfidf_cos": 0.4}
    )
    use_extractor: bool = False  # True when text must be derived from html
    # durable_cc: truncate connected-components lineage through checkpoint
    # stage tables (cc_round{i}) instead of localCheckpoint — fault-tolerant
    # and resumable mid-closure; the right setting on a real cluster where
    # executor loss would kill localCheckpoint'ed lineage
    durable_cc: bool = False


class ERPipeline:
    def __init__(
        self,
        spark: SparkSession,
        warehouse: str,
        run_id: str = "run0",
        config: ERConfig | None = None,
    ):
        self.spark = spark
        self.cfg = config or ERConfig()
        self.ckpt = ParquetCheckpoint(spark, warehouse, run_id)
        self.computed_stages: list[str] = []

    # -- stage functions -------------------------------------------------
    def _records(self, pages: DataFrame) -> DataFrame:
        # Recrawls: the same url can appear under several warc_ts snapshots.
        # Keep only the latest per url (deterministic hash tiebreak) —
        # duplicate record_ids would duplicate scored pairs and cluster
        # edges and inflate tp/fp/fn in pairwise_prf (ADVICE r1). The
        # streaming path already dedupes recrawls; this is the batch twin.
        # One shuffle on url, inherent to recrawl dedup; at 10^12 docs this
        # rides the same partitioning the record_id repartition needs anyway.
        payload = [c for c in ("text", "html") if c in pages.columns]
        if "warc_ts" in pages.columns:
            w = Window.partitionBy("url").orderBy(
                F.col("warc_ts").desc(), F.xxhash64(*payload)
            )
            pages = (
                pages.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .drop("_rn")
            )
        else:
            pages = pages.dropDuplicates(["url"])
        text = (
            extract_text_col("html") if self.cfg.use_extractor else F.col("text")
        )
        rec = pages.select(
            record_id_from_url("url").alias("record_id"),
            "url",
            text.alias("text"),
            "lang",
        ).withColumn("norm_text", normalize_text("text"))
        return rec.select(
            "record_id", "url", "text", "norm_text",
            tokenize("norm_text").alias("tokens"), "lang",
        )

    def _blocks(self, records: DataFrame) -> DataFrame:
        blocks = all_blocks(
            records,
            strategies=self.cfg.strategies,
            min_token_len=self.cfg.min_token_len,
            prefix_n=self.cfg.prefix_n,
            shingle_k=self.cfg.shingle_k,
            num_perm=self.cfg.num_perm,
            bands=self.cfg.bands,
        )
        blocks = suppress_stop_keys(blocks, self.cfg.max_block_size)
        blocks = cap_block_size(blocks, self.cfg.block_top_n)
        return salt_blocks(blocks, self.cfg.n_salts)

    def _cand_pairs(self, blocks: DataFrame) -> DataFrame:
        return candidate_pairs(blocks)

    def _scored_pairs(self, pairs: DataFrame, records: DataFrame) -> DataFrame:
        return score_pairs(
            pairs,
            records,
            weights=self.cfg.weights,
            threshold=self.cfg.threshold,
            with_tfidf=self.cfg.with_tfidf,
        )

    def _edges(self, scored: DataFrame) -> DataFrame:
        return canonical_edges(scored.filter(F.col("is_match")))

    def _clusters(
        self, edges: DataFrame, records: DataFrame, resume: bool = False
    ) -> DataFrame:
        assign = connected_components(
            edges,
            ckpt=self.ckpt if self.cfg.durable_cc else None,
            resume=resume,
        )
        return clusters_with_singletons(assign, records)

    # -- orchestration ----------------------------------------------------
    def run(self, pages: DataFrame, resume: bool = False) -> DataFrame:
        """Run (or resume) the full pipeline; returns the clusters table."""
        ck = self.ckpt
        self.computed_stages = []

        def stage(name: str, build) -> DataFrame:
            if resume and ck.is_complete(name):
                return ck.read(name)
            df = build()
            self.computed_stages.append(name)
            return ck.write(name, df)

        records = stage("records", lambda: self._records(pages))
        schemas.validate_schema(records, schemas.RECORDS, "records")
        blocks = stage("blocks", lambda: self._blocks(records))
        pairs = stage("cand_pairs", lambda: self._cand_pairs(blocks))
        scored = stage("scored_pairs", lambda: self._scored_pairs(pairs, records))
        edges = stage("edges", lambda: self._edges(scored))
        clusters = stage(
            "clusters", lambda: self._clusters(edges, records, resume=resume)
        )
        return clusters

    def calibrate(self, labels_by_url: DataFrame, grid: int = 100) -> tuple[float, float]:
        """Sweep the match threshold against url-keyed labels using the
        checkpointed scored_pairs table; returns (best_tau, best_f1).
        One distributed histogram pass — see operators.calibrate."""
        from ..operators.calibrate import calibrate_threshold

        records = self.ckpt.read("records").select("record_id", "url")
        l1 = records.select(F.col("url").alias("url1"), F.col("record_id").alias("id1"))
        l2 = records.select(F.col("url").alias("url2"), F.col("record_id").alias("id2"))
        labels = labels_by_url.join(l1, "url1").join(l2, "url2").select(
            F.least("id1", "id2").alias("id1"),
            F.greatest("id1", "id2").alias("id2"),
            "label",
        )
        scored = self.ckpt.read("scored_pairs")
        return calibrate_threshold(scored, labels, grid)

    def evaluate(self, clusters: DataFrame, labels_by_url: DataFrame) -> DataFrame:
        """F1 on url-keyed labels (url1, url2, label): map urls → record ids
        via the records table, predictions = all intra-cluster pairs."""
        records = self.ckpt.read("records").select("record_id", "url")
        l1 = records.select(
            F.col("url").alias("url1"), F.col("record_id").alias("id1")
        )
        l2 = records.select(
            F.col("url").alias("url2"), F.col("record_id").alias("id2")
        )
        labels = labels_by_url.join(l1, "url1").join(l2, "url2").select(
            "id1", "id2", "label"
        )
        return pairwise_prf(cluster_pairs(clusters), labels)
