"""Phonetic encodings for ER blocking (SURVEY.md §2.C; Christen 2012 ch.4).

Soundex (Russell & Odell, US patents 1918/1922, the American-Soundex
variant with the H/W transparency rule) and NYSIIS (Taft 1970, the New
York State Identification and Intelligence System code) as blocking-key
functions. Phonetic keys are the classic cheap blocking family Christen
ranks alongside prefix and q-gram keys: names that sound alike land in
the same block regardless of spelling variation, at the cost of one
string expression per record — no shuffle, no UDF, nothing that would
not survive 100 TB.

Architecture: each encoder is ONE ordered rule cascade (anchored
regex replaces + translates over a small uppercase alphabet) rendered
from a single generator into
  * a Spark SQL expression (Java regex; `$1` replacement refs) — fully
    native, whole-stage-codegen, zero Python at execution time;
  * a DuckDB SQL expression (RE2 — so the cascade uses NO pattern
    backreferences and NO lookarounds anywhere; where the classic
    description says "collapse equal adjacent codes" the generator
    emits one literal rule per digit/letter instead).
The two renderings differ only in regexp_replace dialect (global flag,
replacement-ref syntax); tests/test_phonetic.py pins both against
independent sequential references written from the classic algorithm
statements (hypothesis over arbitrary A–Z strings + a 130-surname
census corpus) and checks Spark↔DuckDB byte-identity directly.

Exactness contracts (stated, not hand-waved):
  * Soundex: the cascade implements the full American-Soundex algorithm
    including H/W transparency (same-coded letters separated by H or W
    collapse; ASHCRAFT → A261 not A226) and vowel separation (TYMCZAK →
    T522). This is exact — every rule is position-preserving for the
    first letter, so the classic algorithm and the cascade coincide on
    ALL inputs (argued rule-by-rule in _soundex_steps).
  * NYSIIS: Taft's scan is sequential — the H/W rules read the
    *previously translated* character — and published implementations
    already disagree in minor details (jellyfish vs Febrl vs dropby).
    This module pins the cascade below as its spec. On names without
    interacting W/H resolution chains (e.g. "CROWHURST", where a W that
    would sequentially resolve into its preceding vowel changes what a
    later H sees) it equals the strict sequential scan — property-tested
    over generated names and a census-surname corpus, conservatively
    excluding names containing both W and H; the divergent class is
    regression-pinned in tests/test_phonetic.py. For a BLOCKING key the
    binding requirement is determinism + cross-engine identity, which
    the shared cascade gives by construction.

NULL/empty contract: NULL in → NULL out (both dialects guard
explicitly; DuckDB's concat would otherwise swallow NULLs). Input with
no ASCII letters → '' (empty key; callers drop empty keys before
blocking, same as prefix_blocks).

Unicode: encodings are defined over A–Z after stripping everything
else; accented names should pass through normalize.normalize_text
first (which folds to ASCII-ish lowercase) — same preprocessing both
engines see, so the oracle check stays meaningful.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_VOWELS = "AEIOU"


def _rx(e: str, pat: str, rep: str, dialect: str) -> str:
    """One global regexp_replace in the given SQL dialect.

    `rep` uses neutral backreference syntax \\1..\\9 (group refs in the
    REPLACEMENT only — patterns themselves are backreference-free so
    RE2 can run them)."""
    if dialect == "spark":
        rep_s = rep.replace("\\", "$")
        return f"regexp_replace({e}, '{pat}', '{rep_s}')"
    if dialect == "duckdb":
        return f"regexp_replace({e}, '{pat}', '{rep}', 'g')"
    raise ValueError(f"unknown dialect {dialect!r}")


def _tr(e: str, src: str, dst: str) -> str:
    return f"translate({e}, '{src}', '{dst}')"


# ---------------------------------------------------------------------------
# Soundex
# ---------------------------------------------------------------------------

# letter → digit; vowels+Y → 0 (separators), H/W → 9 (transparent)
_SDX_SRC = "BFPVCGJKQSXZDTLMNRAEIOUYHW"
_SDX_DST = "11112222222233455600000099"


def _soundex_clean(inp: str, dialect: str) -> str:
    return _rx(f"upper({inp})", "[^A-Z]", "", dialect)


def _soundex_steps(clean: str, dialect: str) -> str:
    """The coded tail of the soundex key, given the cleaned (upper,
    A–Z-only, non-empty) name expression.

    Position-preservation argument for exactness: every collapse rule
    below retains the FIRST character of each matched run in place, and
    index 0 is always a run start — so after both collapses the char at
    index 0 is still the first letter's code, and `substr(.., 2)` drops
    exactly the first letter's contribution (with any immediately
    following same-code letters already merged into it, per the
    standard: PFISTER → P236)."""
    code = _tr(clean, _SDX_SRC, _SDX_DST)
    # H/W transparency: equal digits separated by 9-runs merge. One
    # literal rule per digit (RE2: no pattern backrefs).
    for d in "123456":
        code = _rx(code, f"{d}(9+{d})+", d, dialect)
    # adjacent equal digits collapse (includes collapsing into the
    # first letter's own code)
    for d in "123456":
        code = _rx(code, f"{d}{d}+", d, dialect)
    # drop the first letter's code position, then separators/markers
    tail = _rx(f"substr({code}, 2)", "[09]", "", dialect)
    return tail


def soundex_sql(inp: str, dialect: str) -> str:
    """American Soundex of the expression `inp`, as a SQL string."""
    clean = _soundex_clean(inp, dialect)
    tail = _soundex_steps(clean, dialect)
    key = f"substr(substr({clean}, 1, 1) || {tail} || '000', 1, 4)"
    return (
        f"CASE WHEN {inp} IS NULL THEN NULL "
        f"WHEN {clean} = '' THEN '' ELSE {key} END"
    )


def soundex_key(col: str) -> Column:
    """Soundex as a native Spark Column (col = column name or SQL expr)."""
    return F.expr(soundex_sql(col, "spark"))


# ---------------------------------------------------------------------------
# NYSIIS
# ---------------------------------------------------------------------------


def _nysiis_rules_d() -> list[tuple[str, str]]:
    """Phase D: context-free translations of the tail (order matters —
    multi-char patterns must see the ORIGINAL alphabet: SCH before Z→S
    would otherwise never fire on 'ZCH'; KN before M→N so 'KM' does not
    become a false 'KN')."""
    return [
        ("SCH", "SSS"),
        ("PH", "FF"),
        ("EV", "AF"),
        ("KN", "N"),
        ("K", "C"),
    ]


def nysiis_sql(inp: str, dialect: str, max_len: int = 6) -> str:
    """NYSIIS code of the expression `inp`, as a SQL string.

    max_len=6 is Taft's original truncation; 0 disables it."""
    v = _VOWELS
    nv = f"[^{v}]"
    s = _rx(f"upper({inp})", "[^A-Z]", "", dialect)
    # phase A: prefix transforms (anchored; at most one fires)
    for pat, rep in [
        ("^MAC", "MCC"),
        ("^KN", "NN"),
        ("^K", "C"),
        ("^PH", "FF"),
        ("^PF", "FF"),
        ("^SCH", "SSS"),
    ]:
        s = _rx(s, pat, rep, dialect)
    # phase B: suffix transforms
    s = _rx(s, "(EE|IE)$", "Y", dialect)
    s = _rx(s, "(DT|RT|RD|NT|ND)$", "D", dialect)
    # split: key head = first char (never translated); tail gets phase D
    head = f"substr({s}, 1, 1)"
    tail = f"substr({s}, 2)"
    # collapse H-runs / W-runs first (final keys are provably unchanged:
    # every resolution of the 2nd+ H/W in a run duplicates its
    # neighbour's resolution, and duplicates collapse in phase F)
    tail = _rx(tail, "HH+", "H", dialect)
    tail = _rx(tail, "WW+", "W", dialect)
    for pat, rep in _nysiis_rules_d():
        tail = _rx(tail, pat, rep, dialect)
    tail = _tr(tail, "QZM", "GSN")
    tail = _tr(tail, "EIOU", "AAAA")
    # phase E: contextual H/W over head||tail (the head char is
    # untranslated, so the vowel class here is the full AEIOU)
    # H rules BEFORE the W rule: a vowel-H-W triple resolves the H first
    # sequentially (H → prev vowel, then W sees a vowel prev); W-before-H
    # is the documented divergence class (module docstring).
    t = f"({head} || {tail})"
    t = _rx(t, f"({nv})H", "\\1\\1", dialect)  # H after non-vowel → prev
    t = _rx(t, f"([{v}])H({nv})", "\\1\\1\\2", dialect)  # vowel-H-nonvowel
    t = _rx(t, f"([{v}])H$", "\\1\\1", dialect)  # trailing H → prev
    t = _rx(t, f"([{v}])W", "\\1\\1", dialect)  # W after vowel → vowel
    # phase F: collapse adjacent duplicates — one literal rule per
    # letter, over the FULL alphabet: tail vowels are all A by now, but
    # the untranslated HEAD char (any letter, incl. E/I/O/U/M/Q/Z) can
    # be duplicated into position 1 by the phase-E H/W resolution
    # ("EH" → "EE", "MH" → "MM") and must collapse too
    for c in "ABCDEFGHIJKLMNOPQRSTUVWXYZ":
        t = _rx(t, f"{c}{c}+", c, dialect)
    # phase G: suffix cleanup (guards keep 1-char keys intact)
    t = _rx(t, "(.)S$", "\\1", dialect)
    t = _rx(t, "AY$", "Y", dialect)
    t = _rx(t, "(.)A$", "\\1", dialect)
    if max_len:
        t = f"substr({t}, 1, {max_len})"
    return f"CASE WHEN {inp} IS NULL THEN NULL WHEN {s} = '' THEN '' ELSE {t} END"


def nysiis_key(col: str, max_len: int = 6) -> Column:
    """NYSIIS as a native Spark Column (col = column name or SQL expr)."""
    return F.expr(nysiis_sql(col, "spark", max_len))
