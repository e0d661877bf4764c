"""Streaming ER: micro-batches through foreachBatch must resolve to the
same clusters as one batch run over everything (the incremental-ER
equivalence, lifted to Structured Streaming)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dig_entity_resolution_spark.plans.pipeline import ERConfig, ERPipeline
from dig_entity_resolution_spark.streaming.streaming_er import (
    PAGES_SCHEMA,
    StreamingER,
)
from dig_entity_resolution_spark.synth import generate_corpus


def _drain(spark, in_dir, ckpt_dir, ser):
    q = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
        .writeStream.foreachBatch(ser)
        .option("checkpointLocation", ckpt_dir)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "stream did not drain within 300s"


def test_streaming_er_equals_batch(spark, tmp_path):
    paths = generate_corpus(
        str(tmp_path / "corpus"), n_clusters=12, cluster_size=3, n_singletons=40
    )
    pages = spark.read.parquet(paths["pages"])

    # the from-scratch reference over everything
    full = ERPipeline(spark, str(tmp_path / "whf"), "full", ERConfig())
    expect = sorted(
        (r.record_id, r.cluster_id) for r in full.run(pages).collect()
    )

    # crawl batches land as parquet files in the streamed directory —
    # split by url hash so planted clusters straddle the micro-batches
    in_dir = str(tmp_path / "stream_in")
    ckpt = str(tmp_path / "ckpt")
    split = F.pmod(F.xxhash64("url"), F.lit(2)) == 0
    pages.filter(split).coalesce(1).write.mode("append").parquet(in_dir)

    ser = StreamingER(spark, str(tmp_path / "whs"), ERConfig())
    _drain(spark, in_dir, ckpt, ser)
    first_run = ser.latest_run_id
    assert first_run is not None

    # the next crawl batch arrives later → a fresh availableNow drain
    # (the scheduled-ingest-tick pattern); stream offsets resume from ckpt
    pages.filter(~split).coalesce(1).write.mode("append").parquet(in_dir)
    _drain(spark, in_dir, ckpt, ser)
    assert ser.latest_run_id != first_run  # a second micro-batch ran

    got = sorted(
        (r.record_id, r.cluster_id) for r in ser.clusters().collect()
    )
    assert got == expect


def test_streaming_er_replay_is_idempotent(spark, tmp_path):
    """Structured Streaming re-delivers the last uncommitted micro-batch
    after a crash; a replayed batch whose run already completed must be
    skipped, not recomputed against itself."""
    paths = generate_corpus(
        str(tmp_path / "corpus"), n_clusters=5, cluster_size=3, n_singletons=10
    )
    pages = spark.read.parquet(paths["pages"])
    ser = StreamingER(spark, str(tmp_path / "whr"), ERConfig())
    ser(pages, 0)
    before = sorted(
        (r.record_id, r.cluster_id) for r in ser.clusters().collect()
    )
    ser(pages, 0)  # replay of the same batch id
    after = sorted(
        (r.record_id, r.cluster_id) for r in ser.clusters().collect()
    )
    assert before == after
    # restart recovery: a FRESH sink (post-crash) finds the newest complete
    # run on disk even though no micro-batch has fired in this process
    ser2 = StreamingER(spark, str(tmp_path / "whr"), ERConfig())
    recovered = sorted(
        (r.record_id, r.cluster_id) for r in ser2.clusters().collect()
    )
    assert recovered == before


def test_streaming_er_latest_wins_recrawls(spark, tmp_path):
    """A standing stream that RECRAWLS urls: with mode="latest_wins" the
    final clusters equal a from-scratch batch run over the union (which
    keeps the latest warc_ts snapshot per url)."""
    paths = generate_corpus(
        str(tmp_path / "corpus"), n_clusters=8, cluster_size=3, n_singletons=20
    )
    pages = spark.read.parquet(paths["pages"])
    labels = spark.read.parquet(paths["labels"])
    victim = labels.filter(F.col("label")).select("url1").orderBy("url1").first().url1
    recrawl = (
        pages.filter(F.col("url") == victim)
        .withColumn("warc_ts", F.col("warc_ts") + F.expr("INTERVAL 30 DAYS"))
        .withColumn("text", F.lit("xqzzyk replacement snapshot"))
    )
    full = ERPipeline(spark, str(tmp_path / "whf"), "full", ERConfig())
    expect = sorted(
        (r.record_id, r.cluster_id)
        for r in full.run(pages.unionByName(recrawl)).collect()
    )
    ser = StreamingER(
        spark, str(tmp_path / "whlw"), ERConfig(), mode="latest_wins"
    )
    ser(pages, 0)  # first crawl sweep
    ser(recrawl, 1)  # recrawl micro-batch
    got = sorted(
        (r.record_id, r.cluster_id) for r in ser.clusters().collect()
    )
    assert got == expect


def test_streaming_er_with_sorted_neighborhood(spark, tmp_path):
    """r5: the SN strategy composes through the streaming path — the
    foreachBatch sink chains run_incremental, whose SN delta semantics
    must keep stream == batch equality with SN enabled."""
    cfg_kw = dict(
        strategies=("token", "prefix", "sorted_neighborhood"),
        sn_window=4,
        sn_bucket_chars=1,
    )
    paths = generate_corpus(
        str(tmp_path / "corpus"), n_clusters=8, cluster_size=3, n_singletons=30
    )
    pages = spark.read.parquet(paths["pages"])
    full = ERPipeline(spark, str(tmp_path / "whf"), "full", ERConfig(**cfg_kw))
    expect = sorted(
        (r.record_id, r.cluster_id) for r in full.run(pages).collect()
    )
    in_dir = str(tmp_path / "stream_in")
    split = F.pmod(F.xxhash64("url"), F.lit(2)) == 0
    pages.filter(split).coalesce(1).write.mode("append").parquet(in_dir)
    pages.filter(~split).coalesce(1).write.mode("append").parquet(in_dir)
    ser = StreamingER(spark, str(tmp_path / "whs"), ERConfig(**cfg_kw))
    _drain(spark, in_dir, str(tmp_path / "ckpt"), ser)
    got = sorted(
        (r.record_id, r.cluster_id) for r in ser.clusters().collect()
    )
    assert got == expect
