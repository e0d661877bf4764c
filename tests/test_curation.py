"""CurationPipeline (plans/curation.py) — the end-to-end training-data
DAG: hygiene → quality → dedup → decontam → selected → chunks, with
checkpoint/resume and per-stage counters (the ERPipeline contract)."""

from __future__ import annotations

import tempfile

import pytest

from dig_entity_resolution_spark.plans.curation import (
    CurationConfig,
    CurationPipeline,
)

COLS = ["doc_id", "url", "text", "lang"]

PROSE = (
    "the market research report and the climate science study with "
    "evidence for the energy policy and the history of the river economy"
)
PHRASE = "the mountain village story author report study theory design"

PROSE2 = (
    "a theory of the culture industry and the design evidence with the "
    "policy report for the village health energy travel science study"
)


def _corpus():
    rows = [
        # 3 exact duplicates (normalized-identical) -> one survivor (id 1)
        (1, "http://a.com/x", PROSE, "en"),
        (2, "http://b.com/x", PROSE, "en"),
        (3, "http://c.com/x", PROSE, "en"),
        # 2 near-duplicates (one char appended) -> one survivor (id 4)
        (4, "http://d.com", PROSE2 + " extra", "en"),
        (5, "http://e.com", PROSE2 + " extrb", "en"),
        # boilerplate -> classifier gate drops
        (
            6,
            "http://f.com",
            "login register cart checkout privacy terms click here buy "
            "now free shipping subscribe newsletter menu search sitemap",
            "en",
        ),
        # too short -> min_ws_tokens gate drops
        (7, "http://g.com", "the market", "en"),
        # whitespace-only -> hygiene drops
        (8, "http://h.com", "   ", "en"),
        # contaminated: contains the holdout phrase verbatim
        (9, "http://i.com", f"the economy {PHRASE} and the culture", "en"),
        # clean distinct prose survivors
        (10, "http://j.com", "the garden history and the music culture report with evidence", "en"),
        (11, "http://k.com", "a story of the mountain economy and the travel industry study", "en"),
    ]
    return rows


# the session-scoped `spark` fixture comes from tests/conftest.py (a
# module-local stop() would kill the shared session for later modules —
# r6 review); only the dedup operator caches need module-level cleanup
@pytest.fixture(scope="module", autouse=True)
def _release_dedup_caches():
    yield
    from dig_entity_resolution_spark.operators.dedup import release_caches

    release_caches()


def _cfg(**kw):
    base = dict(
        keep_ppl_buckets=(),  # LM gate off for planted-outcome tests
        decontam_n=5,
        seq_len=16,
        bpe_merges=10,
    )
    base.update(kw)
    return CurationConfig(**base)


def _holdout(spark):
    return spark.createDataFrame(
        [(900, f"an unrelated sentence {PHRASE} inside the eval set")],
        ["doc_id", "text"],
    )


def test_pipeline_end_to_end(spark):
    tmp = tempfile.mkdtemp()
    pipe = CurationPipeline(spark, tmp, "e2e", _cfg())
    docs = spark.createDataFrame(_corpus(), COLS)
    chunks = pipe.run(docs, holdout=_holdout(spark)).collect()

    survivors = {
        r["doc_id"] for r in pipe.ckpt.read("selected").select("doc_id").collect()
    }
    # 1 of {1,2,3}; 4 of {4,5}; 6/7/8/9 dropped; 10, 11 kept
    assert survivors == {1, 4, 10, 11}

    # lineage: the exact-dup survivor absorbed nothing at the NEAR-dup
    # stage (exact pass already collapsed 2,3); 4 absorbed 5
    dedup = {
        r["doc_id"]: r["n_merged"] for r in pipe.ckpt.read("dedup").collect()
    }
    assert dedup[4] == 2

    # audit table keeps every hygiene row with an explicit keep flag
    q = {r["doc_id"]: r["keep"] for r in pipe.ckpt.read("quality").collect()}
    assert q[6] is False and q[7] is False
    assert q[1] is True and q[10] is True
    assert 8 not in q  # hygiene dropped before quality

    # packed chunks: every chunk except the last is exactly seq_len ids
    assert chunks, "expected at least one packed chunk"
    last = max(r["chunk_id"] for r in chunks)
    for r in chunks:
        if r["chunk_id"] != last:
            assert r["n_tokens"] == 16
        assert len(r["token_ids"]) == r["n_tokens"]

    # counters recorded for every stage
    assert set(pipe.report()) >= {
        "hygiene", "quality", "dedup", "decontam", "selected", "chunks",
    }


def test_resume_recomputes_only_missing_stages(spark):
    tmp = tempfile.mkdtemp()
    docs = spark.createDataFrame(_corpus(), COLS)
    pipe = CurationPipeline(spark, tmp, "r1", _cfg())
    first = {
        (r["chunk_id"], tuple(r["token_ids"]))
        for r in pipe.run(docs, holdout=_holdout(spark)).collect()
    }
    pipe.ckpt.invalidate("selected")
    pipe.ckpt.invalidate("chunks")
    pipe2 = CurationPipeline(spark, tmp, "r1", _cfg())
    again = {
        (r["chunk_id"], tuple(r["token_ids"]))
        for r in pipe2.run(docs, holdout=_holdout(spark), resume=True).collect()
    }
    assert pipe2.computed_stages == ["selected", "chunks"]
    assert again == first


def test_dsir_selection_caps_corpus(spark):
    tmp = tempfile.mkdtemp()
    pipe = CurationPipeline(
        spark, tmp, "sel", _cfg(select_k=2, pack=False)
    )
    out = pipe.run(spark.createDataFrame(_corpus(), COLS)).collect()
    assert len(out) == 2
    assert all(r["logratio_micro"] is not None for r in out)


def test_ppl_tail_gate_drops_worst_tertile(spark):
    tmp = tempfile.mkdtemp()
    pipe = CurationPipeline(
        spark, tmp, "ppl", _cfg(keep_ppl_buckets=("head", "middle"))
    )
    rows = [
        (i, f"http://u{i}.com", f"{PROSE} token{i}", "en") for i in range(9)
    ]
    pipe.run(spark.createDataFrame(rows, COLS))
    q = pipe.ckpt.read("quality").collect()
    buckets = {r["ppl_bucket"] for r in q}
    assert buckets == {"head", "middle", "tail"}
    for r in q:
        if r["ppl_bucket"] == "tail":
            assert r["keep"] is False


def test_missing_columns_raise(spark):
    tmp = tempfile.mkdtemp()
    pipe = CurationPipeline(spark, tmp, "bad", _cfg())
    with pytest.raises(ValueError, match="doc_id and text"):
        pipe.run(spark.createDataFrame([(1,)], ["doc_id"]))


def test_bad_config_rejected():
    with pytest.raises(ValueError, match="ppl buckets"):
        CurationConfig(keep_ppl_buckets=("best",))
    with pytest.raises(ValueError, match="select_k"):
        CurationConfig(select_k=0)


def test_distributed_word_freqs_equal_local(spark):
    from dig_entity_resolution_spark.functions.bpe import (
        bpe_word_freqs_distributed,
        bpe_word_freqs_local,
    )

    path = "/root/testdata/sf0.001/documents.parquet"
    assert bpe_word_freqs_distributed(spark.read.parquet(path)) == (
        bpe_word_freqs_local(path)
    )


def test_empty_input_runs_clean(spark):
    """0-row input must flow through every stage (ERPipeline's
    empty-input contract): an empty corpus fits zero BPE merges, and the
    empty merges/vocab literals must stay correctly typed (r6 review —
    VOID-typed empty F.array() literals killed analysis)."""
    from pyspark.sql import types as T

    tmp = tempfile.mkdtemp()
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
        ]
    )
    pipe = CurationPipeline(spark, tmp, "empty", _cfg())
    out = pipe.run(spark.createDataFrame([], schema))
    assert out.count() == 0
    assert pipe.computed_stages == [
        "hygiene", "quality", "dedup", "decontam", "selected", "chunks",
    ]


def test_select_frac_production_path(spark):
    tmp = tempfile.mkdtemp()
    pipe = CurationPipeline(
        spark, tmp, "frac", _cfg(select_frac=0.5, pack=False)
    )
    out = pipe.run(spark.createDataFrame(_corpus(), COLS)).collect()
    assert 1 <= len(out) <= 4  # of the 4 post-dedup survivors
    assert all(r["logratio_micro"] is not None for r in out)
    with pytest.raises(ValueError, match="not both"):
        CurationConfig(select_k=3, select_frac=0.5)
    with pytest.raises(ValueError, match="select_frac"):
        CurationConfig(select_frac=1.5)
