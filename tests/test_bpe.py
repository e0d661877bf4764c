"""BPE tokenization (r5, VERDICT r4 gap #1): serial fit determinism, the
three synchronized application paths (pure-Python spec / native nested
fold / pandas_udf memo twin), and the wrapped-separator SQL encoding that
makes the DuckDB twin exact."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from dig_entity_resolution_spark.functions.bpe import (
    SEP,
    apply_bpe_word,
    bpe_fit_local,
    bpe_merges_literal,
    bpe_token_count,
    bpe_tokenize_pandas,
    bpe_tokens_word,
    fit_bpe_merges,
)


def test_fit_deterministic_and_learns_frequent_pairs():
    freqs = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    m1 = fit_bpe_merges(freqs, n_merges=10)
    m2 = fit_bpe_merges(dict(freqs), n_merges=10)
    assert m1 == m2
    # 'est' appears 9x weighted — its pairs must be learned early
    assert ("e", "s") in m1 or ("s", "t") in m1
    # applying the learned merges compresses the training words
    for w in freqs:
        assert len(apply_bpe_word(w, m1)) < len(w)


def test_fit_refuses_separator():
    with pytest.raises(ValueError, match="separator"):
        fit_bpe_merges({f"a{SEP}b": 1})


def test_greedy_pass_is_left_to_right_nonoverlapping():
    # the 'aaaaa' case that distinguishes the spec from naive encodings
    assert apply_bpe_word("aaaaa", [("a", "a")]) == ["aa", "aa", "a"]
    assert apply_bpe_word("aaaaa", [("a", "a"), ("aa", "aa")]) == ["aaaa", "a"]
    assert apply_bpe_word("hello", [("l", "l"), ("ll", "o")]) == ["h", "e", "llo"]


def test_native_fold_matches_python_reference(spark):
    rng = random.Random(5)
    corpus = {
        "".join(rng.choice("abol") for _ in range(rng.randint(1, 10))): rng.randint(1, 5)
        for _ in range(80)
    }
    merges = fit_bpe_merges(corpus, n_merges=12)
    words = sorted(corpus) + ["aaaaa", "ababab", "zzz"]
    df = spark.createDataFrame([(w,) for w in words], ["w"])
    got = {
        r["w"]: r["toks"]
        for r in df.select(
            "w", bpe_tokens_word(F.col("w"), bpe_merges_literal(merges)).alias("toks")
        ).collect()
    }
    for w in words:
        assert got[w] == apply_bpe_word(w, merges), w


def test_pandas_udf_matches_native(spark):
    merges = fit_bpe_merges({"the cat": 1, "that hat": 1, "batch": 2}, 8)
    texts = ["the cat sat", "batch that hat", "", "  ", "cathatch"]
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    tok = bpe_tokenize_pandas(merges)
    rows = df.select(
        "text",
        tok(F.col("text")).alias("pd_toks"),
        F.flatten(
            F.transform(
                F.filter(F.split("text", " "), lambda w: w != F.lit("")),
                lambda w: bpe_tokens_word(w, bpe_merges_literal(merges)),
            )
        ).alias("native_toks"),
    ).collect()
    for r in rows:
        assert r["pd_toks"] == r["native_toks"], r["text"]


def test_sql_wrapped_separator_encoding_matches_fold():
    """The DuckDB twin applies each merge as one replace() over tokens
    wrapped in their OWN separator pair. Pin that encoding against the
    Python fold on randomized words — the naive single-separator join
    demonstrably diverges (e.g. 'aaaaa')."""
    duckdb = pytest.importorskip("duckdb")
    rng = random.Random(17)
    corpus = {
        "".join(rng.choice("ab") for _ in range(rng.randint(1, 9))): 1
        for _ in range(60)
    }
    merges = fit_bpe_merges(corpus, n_merges=8)
    words = sorted(set(list(corpus) + ["aaaaa", "aaa", "abab", "bbbb"]))
    mvals = ", ".join(
        f"({i + 1}, chr(31)||'{a}'||chr(31)||chr(31)||'{b}'||chr(31), "
        f"chr(31)||'{a + b}'||chr(31))"
        for i, (a, b) in enumerate(merges)
    )
    wvals = ", ".join(f"('{w}')" for w in words)
    sql = f"""
    WITH RECURSIVE merges(rank, pat, rep) AS (VALUES {mvals}),
    words(w) AS (VALUES {wvals}),
    init AS (
      SELECT w, list_aggregate(list_transform(string_split(w,''),
               t -> chr(31)||t||chr(31)), 'string_agg', '') AS s, 1 AS rank
      FROM words
    ),
    bpe AS (
      SELECT * FROM init
      UNION ALL
      SELECT b.w, replace(b.s, m.pat, m.rep), b.rank + 1
      FROM bpe b JOIN merges m ON m.rank = b.rank
    )
    SELECT w, list_transform(string_split(s, chr(31)||chr(31)),
                             x -> trim(x, chr(31))) AS toks
    FROM bpe WHERE rank = {len(merges)} + 1
    """
    for w, toks in duckdb.connect().execute(sql).fetchall():
        assert toks == apply_bpe_word(w, merges), w


def test_token_count_and_fixture_fit(spark):
    merges = bpe_fit_local("/root/testdata/sf0.001/documents.parquet", n_merges=20)
    assert merges == bpe_fit_local(
        "/root/testdata/sf0.001/documents.parquet", n_merges=20
    )
    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(30)
    rows = d.select(
        "text", bpe_token_count("text", merges).alias("n")
    ).collect()
    for r in rows:
        expect = sum(
            len(apply_bpe_word(w, merges)) for w in r["text"].split(" ") if w
        )
        assert r["n"] == expect
        # BPE can never exceed character count nor undercut word count
        n_words = len([w for w in r["text"].split(" ") if w])
        assert n_words <= r["n"]


def test_distinct_word_counts_match_per_occurrence(spark):
    """The gate query's distinct-word shape must be value-identical to the
    direct per-occurrence fold (tokenization is a pure per-word function)."""
    from dig_entity_resolution_spark.functions.bpe import bpe_token_counts

    merges = bpe_fit_local("/root/testdata/sf0.001/documents.parquet", n_merges=20)
    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    via_vocab = {
        r.doc_id: (r.n_words, r.n_tokens_bpe)
        for r in bpe_token_counts(d, "doc_id", "text", merges).collect()
    }
    direct = {
        r.doc_id: (r.n_words, r.n)
        for r in d.select(
            "doc_id",
            F.size(
                F.filter(F.split("text", " "), lambda w: w != F.lit(""))
            ).cast("long").alias("n_words"),
            bpe_token_count("text", merges).alias("n"),
        ).collect()
    }
    assert via_vocab == direct


def test_unicode_codepoint_split_cross_engine(spark):
    """Char splitting must be per-CODEPOINT in all three engines — a
    byte-level split would shred multibyte UTF-8 and the SQL twin would
    diverge. Pin Spark split('') and DuckDB string_split('','') against
    Python list() on accented/CJK words."""
    duckdb = pytest.importorskip("duckdb")
    words = ["héllo", "naïve", "日本語", "emoji🙂end", "ß"]
    merges = [("h", "é"), ("日", "本")]
    # Spark native fold
    df = spark.createDataFrame([(w,) for w in words], ["w"])
    spark_toks = {
        r["w"]: r["t"]
        for r in df.select(
            "w", bpe_tokens_word(F.col("w"), bpe_merges_literal(merges)).alias("t")
        ).collect()
    }
    # DuckDB split
    duck = {
        w: duckdb.connect().execute(
            "select string_split(?, '')", [w]
        ).fetchone()[0]
        for w in words
    }
    for w in words:
        assert spark_toks[w] == apply_bpe_word(w, merges), w
        assert duck[w] == list(w), w


def test_bpe_properties_random_corpora():
    """Property pins on the pure-Python spec (hypothesis-style randomized
    sweep, seeded): for any trained merges and any word — (1) the token
    concatenation reconstructs the word exactly; (2) 1 <= #tokens <=
    #chars; (3) application is idempotent on its own output vocabulary
    order (re-applying merges to already-merged tokens changes nothing);
    (4) training words compress at least as well as unseen words of the
    same letters on average."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(
        st.dictionaries(
            st.text(alphabet="abcde", min_size=1, max_size=8),
            st.integers(min_value=1, max_value=9),
            min_size=1,
            max_size=20,
        ),
        st.text(alphabet="abcde", min_size=1, max_size=12),
    )
    def check(freqs, word):
        merges = fit_bpe_merges(freqs, n_merges=10)
        toks = apply_bpe_word(word, merges)
        assert "".join(toks) == word
        assert 1 <= len(toks) <= len(word)
        # idempotence: one more pass over the merged tokens is a no-op
        # (every merge already applied exhaustively in rank order)
        again = list(toks)
        for a, b in merges:
            out = []
            for t in again:
                if out and out[-1] == a and t == b:
                    out[-1] = a + b
                else:
                    out.append(t)
            again = out
        assert again == toks

    check()


def test_token_counts_null_text_raises(spark):
    """r6 advice: NULL-text docs must fail loudly in bpe_token_counts (the
    pack_sequences contract) — a silently-zero doc would pass token
    budgeting unnoticed. Empty text stays a legitimate 0/0 row."""
    from pyspark.sql.utils import AnalysisException

    from dig_entity_resolution_spark.functions.bpe import bpe_token_counts

    merges = fit_bpe_merges({"ab": 3, "abc": 2}, n_merges=4)
    ok = spark.createDataFrame(
        [(1, "ab abc"), (2, "")], ["doc_id", "text"]
    )
    got = {
        r.doc_id: (r.n_words, r.n_tokens_bpe)
        for r in bpe_token_counts(ok, "doc_id", "text", merges).collect()
    }
    assert got[2] == (0, 0)  # empty text is a real 0-token doc
    bad = spark.createDataFrame(
        [(1, "ab"), (2, None)], ["doc_id", "text"]
    )
    with pytest.raises(Exception) as ei:
        bpe_token_counts(bad, "doc_id", "text", merges).collect()
    assert "NULL text" in str(ei.value)


def test_build_vocab_deterministic_and_dedups():
    from dig_entity_resolution_spark.functions.bpe import SEP_ID, build_vocab

    merges = [("a", "b"), ("ab", "c"), ("a", "bc"), ("b", "c")]
    vocab = build_vocab(merges, {"a", "b", "c", " "})
    assert vocab[SEP_ID] == " "  # id 0 is the word separator
    assert vocab[1:4] == ["a", "b", "c"]  # sorted base chars (space excluded)
    # ("ab","c") and ("a","bc") both produce "abc" — first occurrence wins
    assert vocab[4:] == ["ab", "abc", "bc"]
    assert len(vocab) == len(set(vocab))


def test_encode_ids_roundtrip_and_matches_reference(spark):
    """VERDICT r5 item 3 roundtrip: text → ids (Spark distinct-word fold)
    → tokens → text. Spark output must equal the pure-Python reference
    per doc, and decode must reconstruct the (space-normalized) text."""
    from dig_entity_resolution_spark.functions.bpe import (
        UNK_ID,
        bpe_encode_ids,
        build_vocab,
        decode_bpe_ids,
        encode_bpe_text,
    )

    rng = random.Random(7)
    vocab_words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    texts = [
        " ".join(rng.choice(vocab_words) for _ in range(rng.randint(1, 12)))
        for _ in range(30)
    ]
    texts += ["", "  ", "alpha  beta", " alpha"]  # whitespace edge cases
    freqs: dict[str, int] = {}
    for t in texts:
        for w in t.split(" "):
            if w:
                freqs[w] = freqs.get(w, 0) + 1
    merges = fit_bpe_merges(freqs, n_merges=25)
    vocab = build_vocab(merges, {c for w in freqs for c in w})

    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = {
        r.doc_id: list(r.token_ids)
        for r in bpe_encode_ids(df, "doc_id", "text", merges, vocab).collect()
    }
    for i, t in enumerate(texts):
        exp = encode_bpe_text(t, merges, vocab)
        assert got[i] == exp, (i, t)
        assert UNK_ID not in exp
        normalized = " ".join(w for w in t.split(" ") if w)
        assert decode_bpe_ids(exp, vocab) == normalized


def test_encode_ids_unknown_char_maps_to_unk(spark):
    from dig_entity_resolution_spark.functions.bpe import (
        UNK_ID,
        bpe_encode_ids,
        build_vocab,
        decode_bpe_ids,
        encode_bpe_text,
    )

    merges = fit_bpe_merges({"ab": 3}, n_merges=2)
    vocab = build_vocab(merges, {"a", "b"})
    df = spark.createDataFrame([(1, "ab zq")], ["doc_id", "text"])
    [row] = bpe_encode_ids(df, "doc_id", "text", merges, vocab).collect()
    exp = encode_bpe_text("ab zq", merges, vocab)
    assert list(row.token_ids) == exp
    assert exp.count(UNK_ID) == 2  # 'z' and 'q' unseen at fit time
    with pytest.raises(ValueError, match="UNK"):
        decode_bpe_ids(exp, vocab)


def test_native_decode_matches_python_and_raises_on_unk(spark):
    """bpe_decode_ids_col (distributed) ≡ decode_bpe_ids (driver), and
    the UNK/out-of-range contract raises in-plan too."""
    import random

    from pyspark.sql import functions as F

    from dig_entity_resolution_spark.functions.bpe import (
        bpe_decode_ids_col,
        bpe_encode_ids,
        build_vocab,
        decode_bpe_ids,
        encode_bpe_text,
    )

    rng = random.Random(11)
    words = ["kappa", "lambda", "mu", "nu"]
    texts = [
        " ".join(rng.choice(words) for _ in range(rng.randint(1, 8)))
        for _ in range(12)
    ] + ["", "kappa  mu"]
    freqs: dict[str, int] = {}
    for t in texts:
        for w in t.split(" "):
            if w:
                freqs[w] = freqs.get(w, 0) + 1
    merges = fit_bpe_merges(freqs, n_merges=10)
    vocab = build_vocab(merges, {c for w in freqs for c in w})
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    enc = bpe_encode_ids(df, "doc_id", "text", merges, vocab)
    got = {
        r.doc_id: r.decoded
        for r in enc.select(
            "doc_id", bpe_decode_ids_col("token_ids", vocab).alias("decoded")
        ).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == decode_bpe_ids(encode_bpe_text(t, merges, vocab), vocab)
    # UNK raises in-plan, same contract as the driver decode
    bad = spark.createDataFrame([(1, [0, -1])], "doc_id long, token_ids array<int>")
    with pytest.raises(Exception, match="UNK is not"):
        bad.select(bpe_decode_ids_col("token_ids", vocab)).collect()
    # out-of-range id raises too
    bad2 = spark.createDataFrame(
        [(1, [len(vocab)])], "doc_id long, token_ids array<int>"
    )
    with pytest.raises(Exception, match="UNK is not"):
        bad2.select(bpe_decode_ids_col("token_ids", vocab)).collect()
