"""Registry gate-prefix invariant — needs NO testdata or Spark session
(deliberately outside test_entry.py's skipif so the ordering regression
test cannot silently skip on machines without /root/testdata)."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_rows_only_queries_register_last():
    """The driver gate recorded exactly the first 50 registry entries at
    r3 — hash-checkable queries must occupy the prefix so a coverage cap
    only ever drops rows-only-by-design configs. Ordered by REGISTRATION
    intent (registry sql is None), not by resolved oracle_sql(): a lazy
    oracle builder legitimately resolves to None when its fixture is
    absent, which degrades that entry to rows-only without being a
    registration-order regression (r4 review)."""
    from dig_entity_resolution_spark import queries as Q

    names = list(entrymod.queries())
    seen_rows_only = False
    for n in names:
        if Q._REGISTRY[n][1] is None:
            seen_rows_only = True
        else:
            assert not seen_rows_only, f"oracle-backed {n} after a rows-only entry"
    # ADVICE r4: pin the EXACT gate-prefix composition, not just >=50 — a
    # future oracle-backed query registered after a rows-only entry (or a
    # covered-set edit) must fail here, not silently drop out of the gate.
    oracle_backed = [n for n in names if Q._REGISTRY[n][1] is not None]
    standalone = [
        n
        for n in oracle_backed
        if n not in Q._INGREDIENT_QUERIES and n not in Q._DEFERRED_QUERIES
    ]
    assert len(standalone) == 50, (
        f"gate prefix must be exactly the 50 standalone oracle-backed "
        f"queries, got {len(standalone)}"
    )
    assert len(oracle_backed) == 79
    # r6: +image_near_dup, +media_stream_info, +video_frame_samples,
    # +dsir_resample_production, +curation_incremental (all rows-only);
    # +lm_perplexity (gated, slot freed by demoting tfidf_top_terms to
    # covered); +dsir_select, +ccnet_buckets (oracle-backed DEFERRED —
    # the gate cap is full, they sort right after the prefix and verify
    # via check_oracles). r7 rotation (VERDICT r6 #5): dsir_select and
    # ccnet_buckets swap INTO the gate for a driver-verified round,
    # displacing tpch_q1_agg/docs_cube (pure-SQL rows, no custom operator
    # code, stable since r1/r4) into the deferred tier.
    # r7: +audio_near_dup, +video_near_dup, +semdedup (rows-only);
    # +line_dedup, +url_filter, +chunk_shuffle, +meta_blocking_wep,
    # +meta_blocking_cnp, +golden_record, +blocking_quality,
    # +fellegi_sunter(+_tf), +cluster_metrics, +bpe_decode_roundtrip
    # (hash-exact, deferred tier) → 87 = 50 gate + 13 deferred + 9
    # covered + 15 rows-only
    # late r7: +one_to_one_match (hash-exact deferred: greedy one-to-one
    # linkage with an unrolled K-round SQL twin) and +canopy_blocking
    # (hash-exact deferred: KDD-2000 canopies via unrolled MIS rounds)
    # → 89 = 50 + 15 + 9 + 15
    # late r7: +phonetic_blocks (hash-exact deferred: Soundex + NYSIIS
    # keys, shared rule cascade rendered per engine) and +ssjoin_jaccard
    # (hash-exact deferred: prefix-filtered exact similarity join vs a
    # brute-force O(n²) oracle) → 91 = 50 + 17 + 9 + 15
    # late r7: +pairs_soft_tfidf (hash-exact deferred: Cohen et al.
    # hybrid comparator) and +pairs_monge_elkan (hash-exact deferred:
    # the 1996 mean-best-match comparator) → 93 = 50 + 19 + 9 + 15
    # late r7: +cosine_allpairs (hash-exact deferred: exact sparse-cosine
    # all-pairs join vs brute-force oracle) → 94 = 50 + 20 + 9 + 15
    assert len(names) == 94
    # every standalone entry sits inside the suspected 50-row gate window
    assert names[:50] == standalone
    assert "dsir_select" in names[:50] and "ccnet_buckets" in names[:50]
    # deferred standalone entries come directly after the gate prefix
    assert Q._DEFERRED_QUERIES == {
        "tpch_q1_agg", "docs_cube", "line_dedup", "url_filter",
        "chunk_shuffle", "meta_blocking_wep", "meta_blocking_cnp",
        "golden_record", "blocking_quality", "fellegi_sunter",
        "fellegi_sunter_tf", "cluster_metrics", "bpe_decode_roundtrip",
        "one_to_one_match", "canopy_blocking", "phonetic_blocks",
        "ssjoin_jaccard", "pairs_soft_tfidf", "pairs_monge_elkan",
        "cosine_allpairs",
    }
    assert set(names[50:70]) == Q._DEFERRED_QUERIES
    # and every covered entry's consumer is itself gated
    consumers = {
        "char_shingles": "normalize_tokenize",  # shingle CTE chain root
        "minhash_signatures": "near_dup_clusters",
        "lsh_band_buckets": "near_dup_clusters",
        "minhash_lsh_dup_pairs": "near_dup_clusters",
        "simhash_fingerprints": "simhash_hamming_pairs",
        "embedding_pq_topk": "embedding_ivfadc_topk",
        # r6 demotions (slots for bpe_encode_ids / packed_chunk_ids):
        "sequence_packing": "pack_chunk_stats",
        "connected_components": "near_dup_clusters",
        # r6 second pass (slot for lm_perplexity): the tfidf weight table
        # is hash-verified through the pair cosine; the ranking window is
        # separately gated (orders_topn_window, block_topn_cap)
        "tfidf_top_terms": "pairs_tfidf_cosine",
    }
    assert set(consumers) == set(Q._INGREDIENT_QUERIES)
    for covered, consumer in consumers.items():
        assert consumer in names[:50], (covered, consumer)
