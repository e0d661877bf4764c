"""Sequence packing — map each document into fixed-capacity training
examples (the GPT-style concat-and-chunk layout: all corpus tokens are
concatenated in a deterministic order and sliced into `capacity`-token
chunks; a document's tokens land in chunks floor(start/C)..floor((end-1)/C)).

The whole computation is one GLOBAL RUNNING SUM of per-doc token counts —
and the naive `Window.orderBy(key)` with no partitionBy is a scale
killer: Spark executes an unpartitioned window in a SINGLE task, so the
100 TB corpus would funnel through one core. The scalable shape is the
classic two-phase prefix sum:

  1. bucket by a short prefix of the deterministic order key (md5, same
     salt-hash rule as operators/sampling.py) — the prefix preserves the
     global sort order across buckets;
  2. per-BUCKET running sum via an ordinary partitioned window (each
     bucket is a parallel task);
  3. per-bucket totals (16^bucket_hex rows — tiny) are prefix-summed by
     an unpartitioned window over THAT tiny aggregate (single task over
     ≤64Ki rows is fine; it is the corpus-sized unpartitioned window
     that is not) and broadcast back as the bucket's global offset —
     fully LAZY: constructing the DataFrame runs no job (r4 review: a
     driver-side collect here made every .explain() a full corpus pass).

global_end(doc) = bucket_offset + within_bucket_running_sum — identical
to the single-window answer (the order key's prefix IS the bucket, so
bucket-major order equals global order), with parallelism = #buckets.
All arithmetic is integer (token counts, `div`), so the DuckDB twin is
exact with no float-fold caveats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    capacity: int = 2048,
    salt: str = "pack",
    bucket_hex: int = 2,
    token_count=None,
) -> DataFrame:
    """(id, n_tokens, global_start, first_chunk, last_chunk, n_chunks):
    the packing map — where each doc's tokens land after the corpus is
    concatenated in md5(salt:id) order and sliced into `capacity`-token
    chunks. Deterministic (no RNG state), resume-safe, and stable under
    any input partitioning. Tokenization is single-space split, the same
    rule as repeated_substring_spans/decontaminate — unless `token_count`
    is given: a callable text-Column → bigint-Column that supplies the
    budget unit instead (r5: pass
    `lambda c: bpe_token_count(c, merges)` to pack by REAL tokenizer
    counts — the unit a training run actually budgets). NULL text always
    raises loudly (same as the default path), and the counter must return
    >= 1 for every non-null doc: a zero-token doc has no place in the
    packed stream (its zero-width span corrupts the chunk arithmetic), so
    it too raises in-plan — filter empty docs out before packing (r5
    review; the default whitespace counter can't return 0 because
    split('') yields [''])."""
    if capacity <= 0:
        raise ValueError(f"capacity must be positive, got {capacity}")
    if not 1 <= bucket_hex <= 8:
        # 0 silently degenerates to the one-task global window; large
        # values explode the bucket aggregate toward one row per doc
        raise ValueError(f"bucket_hex must be in [1, 8], got {bucket_hex}")
    reserved = {
        "_ord", "_bkt", "_within_end", "_off", "_gend",
        "n_tokens", "global_start", "first_chunk", "last_chunk", "n_chunks",
    }
    if id_col in reserved:
        # same reserved-name class asof_join guards: a colliding id would
        # be silently overwritten by an internal/output column
        raise ValueError(f"pack_sequences: id_col {id_col!r} is reserved")
    # a NULL id would produce a NULL order key (Spark's nulls-first window
    # order diverges from the DuckDB twin's nulls-last); a NULL text would
    # silently produce an all-NULL span that pack_chunk_stats then DROPS.
    # Fail loudly inside the plan for both (r4 review).
    ord_key = F.when(
        F.col(id_col).isNull(),
        F.raise_error(F.lit(f"pack_sequences: NULL {id_col}")),
    ).otherwise(
        F.md5(F.concat(F.lit(salt), F.lit(":"), F.col(id_col).cast("string")))
    )
    counter = (
        token_count
        if token_count is not None
        else (lambda c: F.size(F.split(c, " ")).cast("long"))
    )
    counted = F.when(
        F.col(text_col).isNull(),
        F.raise_error(F.lit(f"pack_sequences: NULL {text_col}")),
    ).otherwise(counter(F.col(text_col)).cast("long"))
    n_tok = F.when(
        counted <= 0,
        F.raise_error(
            F.lit(
                "pack_sequences: non-positive token count — filter "
                "zero-token docs out before packing (a zero-width span "
                "corrupts the chunk arithmetic)"
            )
        ).cast("long"),
    ).otherwise(counted)
    base = docs.select(
        F.col(id_col),
        ord_key.alias("_ord"),
        n_tok.alias("n_tokens"),
    ).withColumn("_bkt", F.substring("_ord", 1, bucket_hex))

    # phase 2: per-bucket running sum (parallel across buckets)
    w = (
        Window.partitionBy("_bkt")
        .orderBy("_ord", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = base.withColumn("_within_end", F.sum("n_tokens").over(w))

    # phase 3: bucket offsets, LAZILY — exclusive prefix over the tiny
    # bucket-totals aggregate (unpartitioned window over ≤16^bucket_hex
    # rows), broadcast into the join
    w_off = (
        Window.orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off_df = F.broadcast(
        base.groupBy("_bkt")
        .agg(F.sum("n_tokens").alias("_t"))
        .select("_bkt", F.coalesce(F.sum("_t").over(w_off), F.lit(0)).alias("_off"))
    )

    out = (
        within.join(off_df, "_bkt")
        .withColumn("_gend", F.col("_off") + F.col("_within_end"))
        .withColumn("global_start", F.col("_gend") - F.col("n_tokens"))
    )
    return out.select(
        F.col(id_col),
        "n_tokens",
        "global_start",
        F.expr(f"global_start div {capacity}").alias("first_chunk"),
        F.expr(f"(_gend - 1) div {capacity}").alias("last_chunk"),
    ).withColumn("n_chunks", F.col("last_chunk") - F.col("first_chunk") + F.lit(1))


def pack_chunks(
    ids_df: DataFrame,
    id_col: str = "doc_id",
    ids_col: str = "token_ids",
    capacity: int = 2048,
    salt: str = "pack",
    bucket_hex: int = 2,
) -> DataFrame:
    """(chunk_id, n_tokens, token_ids): the MATERIALIZED training examples
    (VERDICT r5 item 3 — the artifact a training-data pipeline ships).
    Input is the encoded corpus (doc id + token-id array, e.g. from
    bpe_encode_ids); the packing map is built FROM that table with
    token_count = size(ids), so the budget is by construction the array
    being sliced — no counter/encoder drift possible. Every chunk except
    the last holds exactly `capacity` ids.

    Shape at 100 TB: the map is the two-phase prefix sum (never a global
    window); each doc then explodes into its ≤ n_tokens/capacity + 1
    chunk rows carrying only the SLICE of its array that lands in that
    chunk (F.slice before the shuffle — a doc's ids cross the wire once,
    split across its chunks, not duplicated per chunk), and per-chunk
    reassembly is a groupBy whose per-group payload is exactly `capacity`
    ints. Deterministic: slices order by global_start inside array_sort.

    Zero-length docs have no place in the packed stream; pack_sequences
    raises on them in-plan — filter size(ids) > 0 first.
    """
    packed = pack_chunk_map(
        ids_df, id_col=id_col, ids_col=ids_col, capacity=capacity,
        salt=salt, bucket_hex=bucket_hex,
    )
    return chunks_from_map(packed, ids_df, id_col, ids_col, capacity)


def pack_chunk_map(
    ids_df: DataFrame,
    id_col: str = "doc_id",
    ids_col: str = "token_ids",
    capacity: int = 2048,
    salt: str = "pack",
    bucket_hex: int = 2,
) -> DataFrame:
    """The doc→chunk placement map for an encoded corpus — pack_sequences
    with token_count = size(ids) (the same map pack_chunks builds
    internally). Exposed so a pipeline can CHECKPOINT the map (e.g. the
    incremental curation chunk_map, which later batches consult for
    tombstone closure) and assemble the chunk payloads from it with
    chunks_from_map without recomputing the prefix sum."""
    return pack_sequences(
        ids_df.select(id_col, ids_col),
        id_col=id_col,
        text_col=ids_col,
        capacity=capacity,
        salt=salt,
        bucket_hex=bucket_hex,
        token_count=lambda c: F.size(c).cast("long"),
    )


#: Per-group local chunk-index width: each packing group owns 2^28 chunk
#: slots (≈550 B tokens per group at capacity 2048 — far past any sane
#: group). r7: was 2^40, which at capacity 2048 capped group_hex at 2 =
#: 256 groups per batch, making the repair unit (one group) CORPUS-
#: proportional — the measured 10× incr-curation sweep tombstoned 15×
#: the chunks for the same removal count. 28 bits frees the headroom:
#: 4·group_hex + GROUP_CHUNK_BITS + log2(capacity) ≤ 62 admits
#: group_hex 5 (1M groups) at capacity 2048.
GROUP_CHUNK_BITS = 28
GROUP_STRIDE = 1 << GROUP_CHUNK_BITS


def auto_group_hex(
    n_docs: int, capacity: int, target_group_docs: int = 64
) -> int:
    """Smallest group_hex whose expected group holds ≤ target_group_docs
    docs, clamped to the int64 virtual-coordinate bound. Keeps the
    incremental-repair unit (one group) roughly CONSTANT as the corpus
    grows, instead of corpus/16^fixed — the target trades repair cost
    (smaller groups repack less) against padding waste (one underfilled
    tail chunk per non-empty group)."""
    if target_group_docs < 1:
        raise ValueError(
            f"target_group_docs must be >= 1, got {target_group_docs}"
        )
    g = 0
    while g < 6 and n_docs > target_group_docs * (16**g):
        g += 1
    while g > 0 and (
        (1 << (4 * g)) * GROUP_STRIDE * capacity > (1 << 62)
    ):
        g -= 1
    return g


def pack_chunk_map_grouped(
    ids_df: DataFrame,
    id_col: str = "doc_id",
    ids_col: str = "token_ids",
    capacity: int = 2048,
    salt: str = "pack",
    group_hex: int = 2,
) -> DataFrame:
    """pack_chunk_map, but docs are md5-bucketed into 16^group_hex
    INDEPENDENT packing streams: chunk numbering restarts per group
    (chunk_id = group * 2^GROUP_CHUNK_BITS + local index, with
    global_start in the same virtual coordinates, so chunks_from_map's
    slice arithmetic works verbatim) and a chunk NEVER crosses groups.

    This is the removability-friendly layout the incremental curation
    pipeline packs with: in a single concat-and-chunk stream every chunk
    boundary is typically crossed by some doc, so the shares-a-chunk
    component of one removed doc is the WHOLE stream and exact repair
    means repacking everything. Grouped streams bound that component by
    construction — removing a doc invalidates at most its group's
    chunks (docs/16^group_hex of the batch) — at the price of one
    underfilled tail chunk per group, negligible once groups hold many
    docs. It is also the better 100 TB shape: the running sum is an
    ordinary window partitioned by group (no cross-group offset join at
    all), parallelism = #groups. Size group_hex to the batch
    (auto_group_hex) so the repair unit stays constant as corpora grow.

    group_hex=0 degenerates to ONE stream (pack_chunk_map's layout with
    per-group repair semantics) — a test/debug shape. The virtual
    coordinate space is (16^group_hex) * 2^GROUP_CHUNK_BITS * capacity,
    validated against int64 below (capacity 2048 admits group_hex <= 5);
    a group overflowing its 2^GROUP_CHUNK_BITS chunk slots raises loudly
    in-plan rather than silently colliding with the next group.
    """
    if capacity <= 0:
        raise ValueError(f"capacity must be positive, got {capacity}")
    if not 0 <= group_hex <= 6:
        raise ValueError(f"group_hex must be in [0, 6], got {group_hex}")
    # virtual coordinates reach (16^group_hex) * 2^bits * capacity — that
    # product must stay inside int64 or ANSI mode throws mid-job (and a
    # non-ANSI engine would silently wrap; review r6: an over-wide config
    # must be rejected at construction, not discovered mid-job)
    if (1 << (4 * group_hex)) * GROUP_STRIDE * capacity > (1 << 62):
        raise ValueError(
            f"group_hex={group_hex} with capacity={capacity} overflows the "
            "virtual chunk coordinates (need 16^group_hex * "
            f"2^{GROUP_CHUNK_BITS} * capacity <= 2^62) — lower group_hex "
            "or capacity"
        )
    ord_key = F.when(
        F.col(id_col).isNull(),
        F.raise_error(F.lit(f"pack_chunk_map_grouped: NULL {id_col}")),
    ).otherwise(
        F.md5(F.concat(F.lit(salt), F.lit(":"), F.col(id_col).cast("string")))
    )
    counted = F.when(
        F.col(ids_col).isNull(),
        F.raise_error(F.lit(f"pack_chunk_map_grouped: NULL {ids_col}")),
    ).otherwise(F.size(F.col(ids_col)).cast("long"))
    n_tok = F.when(
        counted <= 0,
        F.raise_error(
            F.lit(
                "pack_chunk_map_grouped: non-positive token count — filter "
                "zero-token docs out before packing"
            )
        ).cast("long"),
    ).otherwise(counted)
    grp = (
        F.conv(F.substring("_ord", 1, group_hex), 16, 10).cast("long")
        if group_hex > 0
        else F.lit(0).cast("long")
    )
    base = ids_df.select(
        F.col(id_col), ord_key.alias("_ord"), n_tok.alias("n_tokens")
    ).withColumn("pack_group", grp)
    w = (
        Window.partitionBy("pack_group")
        .orderBy("_ord", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    base_chunk = F.col("pack_group") * F.lit(GROUP_STRIDE)
    local_last = F.expr(f"(_lend - 1) div {capacity}")
    guarded_last = F.when(
        local_last >= F.lit(GROUP_STRIDE),
        F.raise_error(
            F.lit(
                "pack_chunk_map_grouped: a group overflowed its "
                f"2^{GROUP_CHUNK_BITS} chunk slots — raise group_hex "
                "(more, smaller groups)"
            )
        ).cast("long"),
    ).otherwise(local_last)
    out = (
        base.withColumn("_lend", F.sum("n_tokens").over(w))
        .withColumn("_lstart", F.col("_lend") - F.col("n_tokens"))
        .withColumn(
            "global_start", base_chunk * F.lit(capacity) + F.col("_lstart")
        )
        .withColumn(
            "first_chunk", base_chunk + F.expr(f"_lstart div {capacity}")
        )
        .withColumn("last_chunk", base_chunk + guarded_last)
    )
    return out.select(
        F.col(id_col),
        "n_tokens",
        "global_start",
        "first_chunk",
        "last_chunk",
        (F.col("last_chunk") - F.col("first_chunk") + F.lit(1)).alias(
            "n_chunks"
        ),
        "pack_group",
    )


def chunks_from_map(
    packed: DataFrame,
    ids_df: DataFrame,
    id_col: str = "doc_id",
    ids_col: str = "token_ids",
    capacity: int = 2048,
) -> DataFrame:
    """Assemble (chunk_id, n_tokens, token_ids) from a pack_chunk_map map
    and the encoded corpus. `capacity` must be the capacity the map was
    built with (the pack_chunk_stats contract)."""
    c = F.lit(capacity)
    per = packed.join(ids_df.select(id_col, ids_col), id_col).select(
        "global_start",
        (F.col("global_start") + F.col("n_tokens")).alias("_gend"),
        F.explode(F.sequence("first_chunk", "last_chunk")).alias("chunk_id"),
        F.col(ids_col).alias("_ids"),
    )
    lo = F.greatest(F.col("global_start"), F.col("chunk_id") * c)
    hi = F.least(F.col("_gend"), (F.col("chunk_id") + 1) * c)
    sliced = per.select(
        "chunk_id",
        "global_start",
        F.slice(
            "_ids",
            (lo - F.col("global_start") + 1).cast("int"),
            (hi - lo).cast("int"),
        ).alias("_piece"),
    )
    return (
        sliced.groupBy("chunk_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("global_start", "_piece"))
                    ),
                    lambda x: x["_piece"],
                )
            ).alias("token_ids")
        )
        .select(
            "chunk_id",
            F.size("token_ids").cast("long").alias("n_tokens"),
            "token_ids",
        )
    )


def pack_chunk_stats(packed: DataFrame, capacity: int) -> DataFrame:
    """(chunk_id, n_docs, n_tokens): per-training-example occupancy from a
    pack_sequences map. A doc spanning k chunks contributes a row to each
    via a bounded sequence explode (k ≤ n_tokens/capacity + 1); token
    allocation per chunk is the span intersection — integer-exact.

    `capacity` must be the capacity the map was BUILT with: with a
    mismatched value the span-chunk intersection goes empty or negative,
    which the in-plan guard below turns into a loud error instead of
    silently-garbage token counts (r4 review)."""
    c = F.lit(capacity)
    per = packed.select(
        "global_start",
        (F.col("global_start") + F.col("n_tokens")).alias("_gend"),
        F.explode(F.sequence("first_chunk", "last_chunk")).alias("chunk_id"),
    )
    lo = F.greatest(F.col("global_start"), F.col("chunk_id") * c)
    hi = F.least(F.col("_gend"), (F.col("chunk_id") + 1) * c)
    alloc = F.when(
        hi - lo <= 0,
        F.raise_error(
            F.lit(
                "pack_chunk_stats: empty span/chunk intersection — "
                "capacity does not match the packed map"
            )
        ),
    ).otherwise(hi - lo)
    return (
        per.withColumn("_alloc", alloc)
        .groupBy("chunk_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("_alloc").cast("long").alias("n_tokens"),
        )
    )


def epoch_shuffle(
    chunks: DataFrame,
    epoch: int,
    id_col: str = "chunk_id",
    salt: str = "shuffle",
) -> DataFrame:
    """Deterministic global training-order shuffle of packed chunks:
    shuffle_rank = dense position of md5(salt:epoch:chunk_id), ties (md5
    collisions) broken by id. A pure function of (corpus, salt, epoch) —
    per-epoch reshuffles are just `epoch=n`, resumable mid-epoch by
    filtering `shuffle_rank > already_consumed`, no RNG state anywhere
    (the md5-bucket sampling discipline applied to ordering; Lee et al.
    2022 observe train-order shuffling matters after dedup).

    Scale: row_number over a single ordered window is a global sort —
    at 10¹² chunks a consumer would range-partition on the hash key
    instead and take rank within partition + partition offsets (the
    two-phase prefix-sum trick pack_sequences already uses); the global
    window keeps the oracle-exact form, and the hash ORDER is identical
    either way."""
    from pyspark.sql import Window

    from ..functions.hashing import md5_long

    key = md5_long(
        F.concat_ws(":", F.lit(salt), F.lit(str(epoch)),
                    F.col(id_col).cast("string"))
    )
    w = Window.orderBy(F.col("_skey").asc(), F.col(id_col).asc())
    return (
        chunks.withColumn("_skey", key)
        .withColumn("shuffle_rank", F.row_number().over(w))
        .drop("_skey")
    )
