"""Phonetic blocking keys (functions/phonetic.py).

Verification strategy (three independent layers):
  1. INDEPENDENT sequential references, written here from the classic
     algorithm statements (Russell/Odell American Soundex; Taft NYSIIS
     as a left-to-right scan) — NOT from the module's rule cascade.
     Soundex must agree on ALL inputs (the module claims exactness);
     NYSIIS must agree on every input outside the documented divergent
     class (interacting W/H chains), which we over-approximate by
     excluding any name containing both W and H.
  2. Known vectors from the published literature (ASHCRAFT→A261 is the
     H/W-transparency acid test; TYMCZAK→T522 the vowel-separation one).
  3. Cross-engine identity: the Spark rendering (Java regex) and the
     DuckDB rendering (RE2) must emit byte-identical keys over a real
     surname corpus and arbitrary generated strings — this is the same
     property the driver's oracle gate checks at query level.
"""

from __future__ import annotations

import re

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from dig_entity_resolution_spark.functions.phonetic import (
    nysiis_key,
    nysiis_sql,
    soundex_key,
    soundex_sql,
)

VOWELS = "AEIOU"

# A realistic mixed-origin surname corpus (census-common names chosen to
# hit every rule: MAC/KN/K/PH/PF/SCH prefixes, EE/IE/DT/RT/RD/NT/ND
# suffixes, H/W transparency, doubled letters, Q/Z/M translations).
SURNAMES = [
    "SMITH", "JOHNSON", "WILLIAMS", "BROWN", "JONES", "GARCIA", "MILLER",
    "DAVIS", "RODRIGUEZ", "MARTINEZ", "HERNANDEZ", "LOPEZ", "GONZALEZ",
    "WILSON", "ANDERSON", "THOMAS", "TAYLOR", "MOORE", "JACKSON",
    "MARTIN", "LEE", "PEREZ", "THOMPSON", "WHITE", "HARRIS", "SANCHEZ",
    "CLARK", "RAMIREZ", "LEWIS", "ROBINSON", "WALKER", "YOUNG", "ALLEN",
    "KING", "WRIGHT", "SCOTT", "TORRES", "NGUYEN", "HILL", "FLORES",
    "GREEN", "ADAMS", "NELSON", "BAKER", "HALL", "RIVERA", "CAMPBELL",
    "MITCHELL", "CARTER", "ROBERTS", "GOMEZ", "PHILLIPS", "EVANS",
    "TURNER", "DIAZ", "PARKER", "CRUZ", "EDWARDS", "COLLINS", "REYES",
    "STEWART", "MORRIS", "MORALES", "MURPHY", "COOK", "ROGERS",
    "GUTIERREZ", "ORTIZ", "MORGAN", "COOPER", "PETERSON", "BAILEY",
    "REED", "KELLY", "HOWARD", "RAMOS", "KIM", "COX", "WARD",
    "RICHARDSON", "WATSON", "BROOKS", "CHAVEZ", "WOOD", "JAMES",
    "BENNETT", "GRAY", "MENDOZA", "RUIZ", "HUGHES", "PRICE", "ALVAREZ",
    "CASTILLO", "SANDERS", "PATEL", "MYERS", "LONG", "ROSS", "FOSTER",
    "JIMENEZ", "SCHMIDT", "SCHNEIDER", "MACDONALD", "MCCARTHY",
    "O'BRIEN", "O'CONNOR", "KNIGHT", "KNOWLES", "PFEIFFER", "PFISTER",
    "PHELPS", "ASHCRAFT", "ASHCROFT", "TYMCZAK", "HONEYMAN", "ROBERT",
    "RUPERT", "CROWHURST", "WASHINGTON", "SCHWARTZ", "ZIMMERMAN",
    "QUINN", "VASQUEZ", "SZYMANSKI", "WHEELER", "SHEEHAN", "MCGEE",
    "LLOYD", "Eames", "Yee", "Aho", "Hwang", "Chu", "Ng",
]

_SDX_CODE = {}
for _grp, _d in [("BFPV", "1"), ("CGJKQSXZ", "2"), ("DT", "3"),
                 ("L", "4"), ("MN", "5"), ("R", "6")]:
    for _c in _grp:
        _SDX_CODE[_c] = _d


def soundex_seq(name: str) -> str:
    """American Soundex, classic sequential statement: keep the first
    letter; code the rest; equal codes adjacent OR separated only by
    H/W collapse; a vowel (or Y) between equal codes keeps both; pad/
    truncate to 4."""
    s = re.sub("[^A-Z]", "", name.upper())
    if not s:
        return ""
    out = s[0]
    prev = _SDX_CODE.get(s[0], "")
    for ch in s[1:]:
        if ch in "HW":
            continue  # transparent: prev survives across H/W
        code = _SDX_CODE.get(ch, "")
        if code == "":
            prev = ""  # vowel/Y separator
            continue
        if code != prev:
            out += code
        prev = code
    return (out + "000")[:4]


def nysiis_seq(name: str, max_len: int = 6) -> str:
    """NYSIIS as a strictly sequential left-to-right scan (Taft 1970):
    each H/W resolution reads the PREVIOUSLY TRANSLATED character.
    Phases A/B/D/F/G match the module's pinned cascade; only the phase-E
    evaluation order differs, which is exactly the documented divergent
    class."""
    s = re.sub("[^A-Z]", "", name.upper())
    if not s:
        return ""
    for pat, rep in [("MAC", "MCC"), ("KN", "NN"), ("K", "C"),
                     ("PH", "FF"), ("PF", "FF"), ("SCH", "SSS")]:
        if s.startswith(pat):
            s = rep + s[len(pat):]
            break
    if s.endswith(("EE", "IE")):
        s = s[:-2] + "Y"
    elif s.endswith(("DT", "RT", "RD", "NT", "ND")):
        s = s[:-2] + "D"
    key = s[0]
    last = s[0]  # previously TRANSLATED character
    i = 1
    while i < len(s):
        step = 1
        if s[i:i + 3] == "SCH":
            cur, step = "SSS", 3
        elif s[i:i + 2] == "PH":
            cur, step = "FF", 2
        elif s[i:i + 2] == "EV":
            cur, step = "AF", 2
        elif s[i:i + 2] == "KN":
            cur, step = "N", 2
        elif s[i] == "K":
            cur = "C"
        elif s[i] in VOWELS:
            cur = "A"
        elif s[i] == "Q":
            cur = "G"
        elif s[i] == "Z":
            cur = "S"
        elif s[i] == "M":
            cur = "N"
        elif s[i] == "H":
            nxt = s[i + 1] if i + 1 < len(s) else ""
            vowel_prev = last in VOWELS
            # NB: bool() guard — "" is a substring of VOWELS in Python
            vowel_next = bool(nxt) and nxt in VOWELS
            cur = "H" if (vowel_prev and vowel_next) else last
        elif s[i] == "W":
            cur = last if last in VOWELS else "W"
        else:
            cur = s[i]
        for c in cur:
            if c != key[-1]:
                key += c
            last = c
        i += step
    if len(key) > 1 and key.endswith("S"):
        key = key[:-1]
    if key.endswith("AY"):
        key = key[:-2] + "Y"
    if len(key) > 1 and key.endswith("A"):
        key = key[:-1]
    return key[:max_len] if max_len else key


def _duck_keys(names: list[str]) -> list[tuple]:
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE TABLE t AS SELECT * FROM (VALUES "
            + ",".join("(?)" for _ in names) + ") v(nm)",
            names,
        )
        q = (f"SELECT {soundex_sql('nm', 'duckdb')} AS sdx, "
             f"{nysiis_sql('nm', 'duckdb')} AS nys FROM t")
        return con.execute(q).fetchall()
    finally:
        con.close()


# ---------------------------------------------------------------------------
# known vectors
# ---------------------------------------------------------------------------

SOUNDEX_VECTORS = {
    # the canonical published acid tests
    "ASHCRAFT": "A261",   # H-transparency: S,C merge across H
    "ASHCROFT": "A261",
    "TYMCZAK": "T522",    # vowel separation: C,Z merge; Z,K split by A
    "PFISTER": "P236",    # first-letter code merge: F folds into P
    "ROBERT": "R163",
    "RUPERT": "R163",
    "HONEYMAN": "H555",
    "WASHINGTON": "W252",
    "JACKSON": "J250",
    "GUTIERREZ": "G362",
    "LEE": "L000",
    "O'BRIEN": "O165",
}

NYSIIS_VECTORS = {
    "KNIGHT": "NAGT",
    "SCHMIDT": "SNAD",
    "MACDONALD": "MCDANA",
    "BROWN": "BRAN",
    "LEE": "LY",
    "PHILLIPS": "FALAP",
    "WASHINGTON": "WASANG",
    "MITCHELL": "MATCAL",
    # regression pin for the divergent class (see test below)
    "CROWHURST": "CRAWAR",
}


def test_soundex_known_vectors():
    for name, want in SOUNDEX_VECTORS.items():
        assert soundex_seq(name) == want, f"reference wrong for {name}"
    got = _duck_keys(list(SOUNDEX_VECTORS))
    for (name, want), (sdx, _) in zip(SOUNDEX_VECTORS.items(), got):
        assert sdx == want, f"cascade {name}: {sdx} != {want}"


def test_nysiis_known_vectors():
    got = _duck_keys(list(NYSIIS_VECTORS))
    for (name, want), (_, nys) in zip(NYSIIS_VECTORS.items(), got):
        assert nys == want, f"cascade {name}: {nys} != {want}"


def test_nysiis_divergent_class_documented():
    """CROWHURST hits the vowel→W→H interaction: the cascade resolves H
    before W (CRAWAR); the strict sequential scan resolves the W into
    the previous vowel first, changing what the H sees (CRAWAS... →
    CRAAR → CRAR after dedup). Pin BOTH so any drift in either side is
    loud."""
    assert nysiis_seq("CROWHURST") != "CRAWAR"
    (_, nys), = _duck_keys(["CROWHURST"])
    assert nys == "CRAWAR"


# ---------------------------------------------------------------------------
# property tests vs the sequential references
# ---------------------------------------------------------------------------


def test_soundex_matches_sequential_on_surnames():
    got = _duck_keys(SURNAMES)
    for name, (sdx, _) in zip(SURNAMES, got):
        assert sdx == soundex_seq(name), name


def test_nysiis_matches_sequential_on_surnames():
    eligible = [n for n in SURNAMES
                if not ("W" in n.upper() and "H" in n.upper())]
    got = _duck_keys(eligible)
    for name, (_, nys) in zip(eligible, got):
        assert nys == nysiis_seq(name), name


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet=st.characters(min_codepoint=ord("A"),
                                      max_codepoint=ord("Z")),
               min_size=1, max_size=12))
def test_soundex_matches_sequential_on_arbitrary(name):
    (sdx, _), = _duck_keys([name])
    assert sdx == soundex_seq(name)


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet="ABCEHKMNOPSTWZ", min_size=1, max_size=10))
def test_nysiis_matches_sequential_on_arbitrary(name):
    if "W" in name and "H" in name:
        return  # documented divergent class (interacting W/H chains)
    (_, nys), = _duck_keys([name])
    assert nys == nysiis_seq(name)


# ---------------------------------------------------------------------------
# contracts + cross-engine identity
# ---------------------------------------------------------------------------


def test_null_and_empty_contract():
    rows = _duck_keys(["", "123 456!", "A"])
    assert rows[0] == ("", "")
    assert rows[1] == ("", "")   # no ASCII letters → empty key
    assert rows[2] == ("A000", "A")
    con = duckdb.connect()
    try:
        r = con.execute(
            f"SELECT {soundex_sql('nm', 'duckdb')}, "
            f"{nysiis_sql('nm', 'duckdb')} "
            "FROM (SELECT CAST(NULL AS VARCHAR) AS nm)"
        ).fetchone()
        assert r == (None, None)
    finally:
        con.close()


@pytest.mark.usefixtures("spark")
def test_spark_duckdb_identical(spark):
    import random

    rng = random.Random(1234)
    extra = ["".join(rng.choice("ABCDEFGHIJKLMNOPQRSTUVWXYZ")
                     for _ in range(rng.randint(1, 12)))
             for _ in range(400)]
    names = SURNAMES + extra + ["", "a b c", "Van der Berg", "nunez"]
    df = spark.createDataFrame([(n,) for n in names], "nm string")
    got = (
        df.select(soundex_key("nm").alias("sdx"),
                  nysiis_key("nm").alias("nys"))
        .collect()
    )
    want = _duck_keys(names)
    for name, row, (sdx, nys) in zip(names, got, want):
        assert row.sdx == sdx, f"soundex dialect drift on {name!r}"
        assert row.nys == nys, f"nysiis dialect drift on {name!r}"


@pytest.mark.usefixtures("spark")
def test_spark_null_contract(spark):
    df = spark.createDataFrame([(None,), ("Smith",)], "nm string")
    rows = df.select(soundex_key("nm").alias("s"),
                     nysiis_key("nm").alias("n")).collect()
    assert (rows[0].s, rows[0].n) == (None, None)
    assert (rows[1].s, rows[1].n) == ("S530", "SNAT")


# ---------------------------------------------------------------------------
# pipeline integration: "phonetic" blocking strategy
# ---------------------------------------------------------------------------


def _mk_records(spark, rows):
    from dig_entity_resolution_spark.functions.normalize import (
        normalize_text,
        tokenize,
    )

    df = spark.createDataFrame(rows, "record_id long, text string")
    return df.withColumn("norm_text", normalize_text("text")).withColumn(
        "tokens", tokenize("norm_text")
    )


def test_phonetic_strategy_recovers_spelling_variants(spark):
    """Two records sharing NO exact token (and distinct prefixes) must
    still pair through a shared Soundex/NYSIIS code — the recall case
    exact token blocking structurally cannot produce."""
    from dig_entity_resolution_spark.operators.blocking import (
        all_blocks,
        candidate_pairs,
        phonetic_token_blocks,
        token_blocks,
    )

    recs = _mk_records(
        spark,
        [(1, "jon smyth dayton"), (2, "john smith daiton"), (3, "zzq vexing")],
    )
    tok_pairs = candidate_pairs(token_blocks(recs))
    assert tok_pairs.count() == 0  # no exact token overlap anywhere
    pairs = candidate_pairs(phonetic_token_blocks(recs)).collect()
    assert {(r.id1, r.id2) for r in pairs} == {(1, 2)}
    # the union path namespaces keys per strategy and encoder
    blocks = all_blocks(recs, strategies=("token", "phonetic"))
    keys = {r.block_key for r in blocks.collect()}
    assert any(k.startswith("phonetic|soundex:") for k in keys)
    assert any(k.startswith("phonetic|nysiis:") for k in keys)


def test_phonetic_strategy_rejects_unknown_encoder(spark):
    from dig_entity_resolution_spark.operators.blocking import (
        phonetic_token_blocks,
    )

    recs = _mk_records(spark, [(1, "abc def")])
    with pytest.raises(ValueError, match="unknown phonetic encoders"):
        phonetic_token_blocks(recs, encoders=("metaphone",)).collect()


def test_e2e_f1_with_phonetic_strategy(spark, tmp_path):
    """Adding phonetic keys must not COST correctness: the synthetic
    corpus stays F1 == 1.0 with the strategy enabled (extra candidates
    are filtered by scoring; head phonetic keys by the stop-key armor)."""
    from dig_entity_resolution_spark.plans.pipeline import ERConfig, ERPipeline
    from dig_entity_resolution_spark.synth import generate_corpus

    paths = generate_corpus(
        str(tmp_path / "corpus"), n_clusters=12, cluster_size=3,
        n_singletons=40, seed=7,
    )
    pages = spark.read.parquet(paths["pages"])
    cfg = ERConfig(strategies=("token", "prefix", "minhash_lsh", "phonetic"))
    pipe = ERPipeline(spark, str(tmp_path / "wh"), "pho", cfg)
    clusters = pipe.run(pages)
    labels = spark.read.parquet(paths["labels"])
    prf = pipe.evaluate(clusters, labels).collect()[0]
    assert prf.f1 >= 0.99, prf.asDict()


def test_pipeline_rejects_bad_phonetic_encoder(spark, tmp_path):
    from dig_entity_resolution_spark.plans.pipeline import ERConfig, ERPipeline

    for enc in ((), ("metaphone",)):
        cfg = ERConfig(strategies=("token", "phonetic"), phonetic_encoders=enc)
        with pytest.raises(ValueError, match="phonetic strategy requires"):
            ERPipeline(spark, str(tmp_path / "wh"), "bad", cfg)
