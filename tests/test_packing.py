"""Sequence packing (operators/packing.py): two-phase prefix sum equals
the naive global window, partition invariance, chunk-fill exactness."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from dig_entity_resolution_spark.operators.packing import (
    GROUP_STRIDE,
    auto_group_hex,
    pack_chunk_stats,
    pack_sequences,
)


def test_auto_group_hex_tracks_batch_size():
    # groups hold <= target docs until the int64 coordinate bound bites
    assert auto_group_hex(50, 2048, target_group_docs=64) == 0
    assert auto_group_hex(100, 2048, target_group_docs=64) == 1
    assert auto_group_hex(50_000, 2048, target_group_docs=64) == 3
    assert auto_group_hex(500_000, 2048, target_group_docs=64) == 4
    # 100M docs wants 16^6 but capacity 2048 admits at most group_hex 5
    assert auto_group_hex(100_000_000, 2048, target_group_docs=64) == 5
    # smaller capacity frees coordinate bits: group_hex 6 is admissible
    assert auto_group_hex(10**9, 64, target_group_docs=16) == 6
    with pytest.raises(ValueError, match="target_group_docs"):
        auto_group_hex(100, 2048, target_group_docs=0)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, " ".join(f"w{i}_{j}" for j in range(3 + (i * 7) % 40)))
        for i in range(200)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_two_phase_cumsum_equals_global_window(spark, docs):
    """The bucketed prefix sum must produce EXACTLY the global-window
    answer (the bucket key is a prefix of the order key, so bucket-major
    order is global order)."""
    got = {
        r.doc_id: (r.global_start, r.first_chunk, r.last_chunk)
        for r in pack_sequences(docs, capacity=64).collect()
    }
    ord_key = F.md5(F.concat(F.lit("pack:"), F.col("doc_id").cast("string")))
    naive = docs.select(
        "doc_id",
        ord_key.alias("o"),
        F.size(F.split("text", " ")).cast("long").alias("n"),
    ).withColumn(
        "gend",
        F.sum("n").over(
            Window.orderBy("o", "doc_id").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        ),
    )
    for r in naive.collect():
        gs = r.gend - r.n
        assert got[r.doc_id] == (gs, gs // 64, (r.gend - 1) // 64)


def test_packing_partition_invariance(spark, docs):
    a = {tuple(r) for r in pack_sequences(docs, capacity=64).collect()}
    b = {tuple(r) for r in pack_sequences(docs.repartition(13), capacity=64).collect()}
    assert a == b


def test_chunk_stats_full_chunks(spark, docs):
    """Every chunk except the last holds exactly `capacity` tokens, the
    last holds the remainder, and totals reconcile with the corpus."""
    packed = pack_sequences(docs, capacity=64)
    stats = {r.chunk_id: r for r in pack_chunk_stats(packed, 64).collect()}
    total = sum(r.n_tokens for r in packed.collect())
    last = max(stats)
    assert set(stats) == set(range(last + 1))  # no gaps
    for cid, r in stats.items():
        if cid < last:
            assert r.n_tokens == 64
    assert stats[last].n_tokens == total - 64 * last
    assert sum(r.n_tokens for r in stats.values()) == total


def test_doc_spanning_many_chunks(spark):
    big = spark.createDataFrame(
        [(1, " ".join(["x"] * 300)), (2, "a b"), (3, "c d e")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in pack_sequences(big, capacity=64).collect()}
    assert out[1].n_chunks >= 5  # 300 tokens across 64-token chunks
    assert out[2].n_chunks in (1, 2)


def test_capacity_guard(spark, docs):
    with pytest.raises(ValueError):
        pack_sequences(docs, capacity=0)


def test_pack_sequences_is_lazy_and_guards(spark, docs):
    """Constructing the packing DataFrame must run NO Spark job (r4
    review: an eager offsets collect made every .explain() a full corpus
    pass), and the guards reject degenerate bucket_hex and NULL ids."""
    tracker = spark.sparkContext.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    df = pack_sequences(docs, capacity=64)
    df.explain()  # plan-only
    after = tracker.getJobIdsForGroup(None)
    assert len(after) == len(before), "construction/explain ran a Spark job"
    with pytest.raises(ValueError):
        pack_sequences(docs, capacity=64, bucket_hex=0)
    with pytest.raises(ValueError):
        pack_sequences(docs, capacity=64, bucket_hex=9)
    bad = spark.createDataFrame([(None, "a b c")], "doc_id long, text string")
    with pytest.raises(Exception, match="NULL doc_id"):
        pack_sequences(bad, capacity=64).collect()


def test_pack_null_text_and_reserved_id_guards(spark):
    """r4 review: NULL text must fail loudly (it previously produced an
    all-NULL span that pack_chunk_stats silently dropped), and a reserved
    id_col name must be rejected instead of silently overwritten."""
    bad = spark.createDataFrame([(1, None)], "doc_id long, text string")
    with pytest.raises(Exception, match="NULL text"):
        pack_sequences(bad, capacity=64).collect()
    ok = spark.createDataFrame([(1, "a b")], "_bkt long, text string")
    with pytest.raises(ValueError, match="reserved"):
        pack_sequences(ok, id_col="_bkt", capacity=64)


def test_chunk_stats_capacity_mismatch_raises(spark, docs):
    """r4 review: a capacity that disagrees with the packed map produced
    silently-garbage (even negative) token counts; now it raises."""
    packed = pack_sequences(docs, capacity=256)
    with pytest.raises(Exception, match="capacity does not match"):
        pack_chunk_stats(packed, 16).collect()


try:
    from hashlib import md5 as _md5

    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=12, deadline=None)
    @given(
        st.lists(
            st.integers(min_value=1, max_value=60),
            min_size=1,
            max_size=30,
            unique=False,
        ),
        st.integers(min_value=1, max_value=100),
        st.integers(min_value=1, max_value=3),
    )
    def test_packing_partitions_corpus_property(n_tokens_list, capacity, bucket_hex):
        """Property: the packing map is EXACTLY the md5-ordered partition
        of [0, total_tokens) — contiguous, disjoint, chunk ids by integer
        division — for any doc sizes, capacity, and bucket width."""
        spark = test_packing_partitions_corpus_property._spark
        rows = [
            (i, " ".join(["w"] * n)) for i, n in enumerate(n_tokens_list)
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r.doc_id: r
            for r in pack_sequences(
                docs, capacity=capacity, bucket_hex=bucket_hex
            ).collect()
        }
        order = sorted(
            range(len(n_tokens_list)),
            key=lambda i: (_md5(f"pack:{i}".encode()).hexdigest(), i),
        )
        pos = 0
        for i in order:
            r = got[i]
            assert r.global_start == pos
            assert r.n_tokens == n_tokens_list[i]
            assert r.first_chunk == pos // capacity
            assert r.last_chunk == (pos + n_tokens_list[i] - 1) // capacity
            pos += n_tokens_list[i]
        assert pos == sum(n_tokens_list)

    @pytest.fixture(autouse=True)
    def _bind_spark_for_property(spark):
        test_packing_partitions_corpus_property._spark = spark

except ImportError:  # hypothesis not installed — deterministic tests remain
    pass


def test_pack_sequences_with_bpe_token_counter(spark):
    """r5 composition: packing budgeted in REAL BPE tokens — the counter
    plugs in as the budget unit, chunk arithmetic stays integer-exact,
    and totals match the pure-Python tokenizer."""
    from dig_entity_resolution_spark.functions.bpe import (
        apply_bpe_word,
        bpe_fit_local,
        bpe_token_count,
    )
    from dig_entity_resolution_spark.operators.packing import pack_sequences

    merges = bpe_fit_local(
        "/root/testdata/sf0.001/documents.parquet", n_merges=20
    )
    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(40)
    packed = pack_sequences(
        d, "doc_id", "text", capacity=128, salt="bpe",
        token_count=lambda c: bpe_token_count(c, merges),
    ).collect()
    texts = {r.doc_id: r.text for r in d.collect()}
    # n_tokens is the real BPE count per doc
    for r in packed:
        expect = sum(
            len(apply_bpe_word(w, merges))
            for w in texts[r.doc_id].split(" ") if w
        )
        assert r.n_tokens == expect
    # spans tile the concatenation exactly: sorted starts are contiguous
    spans = sorted((r.global_start, r.n_tokens) for r in packed)
    pos = 0
    for start, n in spans:
        assert start == pos
        pos += n


def test_pack_chunks_materialized_stream_exact(spark):
    """pack_chunks (VERDICT r5 item 3): the concatenation of the emitted
    chunk arrays must equal the concatenation of the docs' id arrays in
    md5(salt:id) order; every chunk except the last holds exactly
    `capacity` ids; chunk_ids are dense from 0."""
    import hashlib

    from dig_entity_resolution_spark.operators.packing import pack_chunks

    rows = [(i, list(range(i * 100, i * 100 + 3 + (i * 7) % 50))) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, token_ids array<int>")
    cap = 64
    chunks = {
        r.chunk_id: list(r.token_ids)
        for r in pack_chunks(df, "doc_id", "token_ids", capacity=cap, salt="s").collect()
    }
    assert sorted(chunks) == list(range(len(chunks)))
    for cid in sorted(chunks)[:-1]:
        assert len(chunks[cid]) == cap
    got_stream = [x for cid in sorted(chunks) for x in chunks[cid]]
    order = sorted(
        rows, key=lambda r: (hashlib.md5(f"s:{r[0]}".encode()).hexdigest(), r[0])
    )
    exp_stream = [x for _, ids in order for x in ids]
    assert got_stream == exp_stream


def test_pack_chunks_rejects_empty_arrays(spark):
    from dig_entity_resolution_spark.operators.packing import pack_chunks

    df = spark.createDataFrame(
        [(1, [1, 2]), (2, [])], "doc_id long, token_ids array<int>"
    )
    with pytest.raises(Exception) as ei:
        pack_chunks(df, "doc_id", "token_ids", capacity=8).collect()
    assert "non-positive token count" in str(ei.value)


# -- grouped packing streams (r6: removability-friendly layout) ---------------


@pytest.fixture(scope="module")
def ids_df(spark):
    rows = [(i, list(range(i % 7 + 1))) for i in range(60)]
    return spark.createDataFrame(rows, "doc_id long, token_ids array<int>")


def test_grouped_map_group_hex_zero_equals_global_map(spark, ids_df):
    """One group (group_hex=0) must reproduce pack_chunk_map exactly:
    same order key, same prefix sum, base offset zero."""
    from dig_entity_resolution_spark.operators.packing import (
        pack_chunk_map,
        pack_chunk_map_grouped,
    )

    want = {
        r.doc_id: (r.global_start, r.first_chunk, r.last_chunk, r.n_chunks)
        for r in pack_chunk_map(ids_df, capacity=8).collect()
    }
    got_rows = pack_chunk_map_grouped(ids_df, capacity=8, group_hex=0).collect()
    got = {
        r.doc_id: (r.global_start, r.first_chunk, r.last_chunk, r.n_chunks)
        for r in got_rows
    }
    assert got == want
    assert all(r.pack_group == 0 for r in got_rows)


def test_grouped_map_streams_are_independent_and_exact(spark, ids_df):
    """Per group: md5-ordered docs occupy a contiguous token stream from
    position 0; chunks never cross groups; chunks_from_map reassembles
    every doc's ids exactly from the virtual coordinates."""
    from dig_entity_resolution_spark.operators.packing import (
        chunks_from_map,
        pack_chunk_map_grouped,
    )

    cap = 8
    m = pack_chunk_map_grouped(ids_df, capacity=cap, group_hex=2)
    stride = GROUP_STRIDE
    rows = m.collect()
    base = {r.doc_id: r for r in rows}
    by_group: dict = {}
    for r in rows:
        assert r.first_chunk // stride == r.pack_group
        assert r.last_chunk // stride == r.pack_group
        assert r.global_start // cap >= r.pack_group * stride
        by_group.setdefault(r.pack_group, []).append(r)
    for g, rs in by_group.items():
        starts = sorted(r.global_start for r in rs)
        # contiguous: starts begin at the group base and stack n_tokens
        pos = g * stride * cap
        for s, r in zip(starts, sorted(rs, key=lambda r: r.global_start)):
            assert s == pos
            pos += r.n_tokens
    chunks = {
        r.chunk_id: list(r.token_ids)
        for r in chunks_from_map(m, ids_df, capacity=cap).collect()
    }
    want = {r.doc_id: list(r.token_ids) for r in ids_df.collect()}
    for doc_id, r in base.items():
        flat = []
        for c in range(r.first_chunk, r.last_chunk + 1):
            flat.extend(chunks[c])
        off = r.global_start - r.first_chunk * cap
        assert flat[off : off + r.n_tokens] == want[doc_id], doc_id
    # every chunk except each group's tail chunk is exactly full
    tails = {max(r.last_chunk for r in rs) for rs in by_group.values()}
    for cid, ids in chunks.items():
        if cid not in tails:
            assert len(ids) == cap


def test_grouped_map_plan_and_guards(spark, ids_df):
    """The grouped map is ONE group-partitioned window — no bucket-offset
    broadcast join, no Python, and construction runs no job. Guards:
    group_hex range, NULL id/ids, zero-token docs."""
    import io
    from contextlib import redirect_stdout

    from dig_entity_resolution_spark.operators.packing import (
        pack_chunk_map_grouped,
    )

    tracker = spark.sparkContext.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    df = pack_chunk_map_grouped(ids_df, capacity=8)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    after = tracker.getJobIdsForGroup(None)
    assert len(after) == len(before), "construction/explain ran a Spark job"
    assert "Window" in plan
    for bad in ("BroadcastHashJoin", "CartesianProduct",
                "ArrowEvalPython", "BatchEvalPython"):
        assert bad not in plan, bad
    with pytest.raises(ValueError, match=r"\[0, 6\]"):
        pack_chunk_map_grouped(ids_df, capacity=8, group_hex=7)
    # int64 coordinate bound: 4g + GROUP_CHUNK_BITS + log2(cap) > 62
    with pytest.raises(ValueError, match="overflows"):
        pack_chunk_map_grouped(ids_df, capacity=2048, group_hex=6)
    with pytest.raises(ValueError):
        pack_chunk_map_grouped(ids_df, capacity=0)
    bad_id = spark.createDataFrame(
        [(None, [1])], "doc_id long, token_ids array<int>"
    )
    with pytest.raises(Exception, match="NULL doc_id"):
        pack_chunk_map_grouped(bad_id, capacity=8).collect()
    empty = spark.createDataFrame(
        [(1, [])], "doc_id long, token_ids array<int>"
    )
    with pytest.raises(Exception, match="non-positive token count"):
        pack_chunk_map_grouped(empty, capacity=8).collect()


def test_epoch_shuffle_deterministic_and_epoch_varying(spark):
    """r7 epoch_shuffle: a pure function of (corpus, salt, epoch) — same
    inputs reproduce the exact order, different epochs produce a
    different one, ranks are a dense 1..N permutation, and mid-epoch
    resume is a rank filter."""
    from dig_entity_resolution_spark.operators.packing import epoch_shuffle

    chunks = spark.createDataFrame(
        [(i,) for i in range(40)], "chunk_id long"
    )
    e1 = [r.chunk_id for r in epoch_shuffle(chunks, 1).orderBy("shuffle_rank").collect()]
    e1b = [r.chunk_id for r in epoch_shuffle(chunks, 1).orderBy("shuffle_rank").collect()]
    e2 = [r.chunk_id for r in epoch_shuffle(chunks, 2).orderBy("shuffle_rank").collect()]
    assert e1 == e1b
    assert e1 != e2
    assert sorted(e1) == list(range(40)) == sorted(e2)
    ranks = [r.shuffle_rank for r in epoch_shuffle(chunks, 1).collect()]
    assert sorted(ranks) == list(range(1, 41))
    # resume: consuming past rank 25 is a plain filter, same order tail
    tail = [
        r.chunk_id
        for r in epoch_shuffle(chunks, 1)
        .filter("shuffle_rank > 25")
        .orderBy("shuffle_rank")
        .collect()
    ]
    assert tail == e1[25:]
