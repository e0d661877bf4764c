"""Fellegi–Sunter probabilistic record linkage (Fellegi & Sunter, JASA
1969; EM parameter estimation per Winkler 1988 / Larsen & Rubin 2001 —
the model Splink popularized on Spark; all public knowledge).

Each candidate pair is summarized by a *gamma vector*: one discrete
agreement level per comparison (exact-match, token-Jaccard band,
edit-distance band, ...). The model is a two-class latent mixture with
conditional independence across comparisons:

    P(match | gamma) ∝ lambda      * prod_i m_i[gamma_i]
    P(nonmatch | g)  ∝ (1-lambda)  * prod_i u_i[gamma_i]

where m_i[l] = P(level l | match) and u_i[l] = P(level l | non-match).
Scoring is the classic log2 Bayes-factor sum: prior weight
log2(lambda/(1-lambda)) plus one weight log2(m/u) per comparison level.

Spark-first shape (this module is native end-to-end):

* Gamma levels are integer CASE expressions over the hydrated pair
  columns. Thresholds on ratios (Jaccard >= 0.8, lev/len <= 0.1) are
  CROSS-MULTIPLIED into pure-integer comparisons (5*inter >= 4*uni), so
  level assignment can never drift between engines or platforms.
* The EM fit needs only the gamma PATTERN COUNTS — a groupBy over a
  space of prod_i(n_levels_i) patterns (18 for the default comparisons).
  Map-side combine means the shuffle carries <= that many rows per task;
  the driver collect is a bounded contract (pattern-space-sized, never
  corpus-sized). EM itself is pure Python float64 with a fixed iteration
  count and Laplace smoothing — bit-deterministic given the counts.
* Scoring attaches integer-MICRO weights (round(1e6 * log2(m/u))) via a
  literal CASE per comparison and sums them as BIGINT — one native
  Project over the pairs, zero extra shuffle, zero Python, no
  float-fold-order hazard (the quality_model.py discipline).

100 TB posture: the fit's shuffle is pattern-space-sized regardless of
corpus; scoring touches each pair exactly once inside whole-stage
codegen. Skewed blocks are the *blocking* layer's problem (stop-keys /
caps, operators/blocking.py) — by the time pairs reach this module the
work is per-pair flat.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "Comparison",
    "FSModel",
    "default_comparisons",
    "gamma_levels",
    "pattern_counts",
    "em_fit",
    "fit_fs_spark",
    "score_fs",
    "score_pairs_fs",
    "decision_thresholds",
    "classify_fs",
    "tf_adjust",
]


@dataclass(frozen=True)
class Comparison:
    """One field comparison: a name, its level arity, and the native
    expression producing an integer level in [0, n_levels) — higher
    level = stronger agreement."""

    name: str
    n_levels: int
    level: Column

    @property
    def col(self) -> str:
        return f"g_{self.name}"


def default_comparisons(
    t1: str = "t1", t2: str = "t2", tk1: str = "tk1", tk2: str = "tk2"
) -> list[Comparison]:
    """Comparisons over a hydrated pair shape (two normalized-text and
    two token-array columns; the registry query uses t1/t2/tk1/tk2, the
    ER pipeline's hydrate_pairs shape is text1/text2/tokens1/tokens2).
    All integer arithmetic — see module docstring."""
    inter = F.size(F.array_intersect(F.array_distinct(tk1), F.array_distinct(tk2)))
    uni = F.size(F.array_distinct(F.concat(tk1, tk2)))
    jac = (
        # 5*inter >= 4*uni  <=>  jaccard >= 0.8 ; >= 2*uni <=> 0.4
        F.when(inter * 5 >= uni * 4, F.lit(2))
        .when(inter * 5 >= uni * 2, F.lit(1))
        .otherwise(F.lit(0))
    )
    lev = F.levenshtein(t1, t2)
    mx = F.greatest(F.length(t1), F.length(t2), F.lit(1))
    lev_band = (
        # lev/mx <= 0.1 <=> 10*lev <= mx ; <= 0.3 <=> 10*lev <= 3*mx
        F.when(lev * 10 <= mx, F.lit(2))
        .when(lev * 10 <= mx * 3, F.lit(1))
        .otherwise(F.lit(0))
    )
    return [
        Comparison("exact", 2, F.when(F.col(t1) == F.col(t2), 1).otherwise(0)),
        Comparison("jaccard", 3, jac),
        Comparison("lev", 3, lev_band),
    ]


def gamma_levels(pairs: DataFrame, comparisons: Sequence[Comparison]) -> DataFrame:
    """Attach one integer g_<name> column per comparison."""
    out = pairs
    for c in comparisons:
        out = out.withColumn(c.col, c.level.cast("int"))
    return out


def pattern_counts(
    gammas: DataFrame, comparisons: Sequence[Comparison]
) -> list[tuple[tuple[int, ...], int]]:
    """Gamma-pattern histogram, sorted by pattern for determinism.
    BOUNDED DRIVER COLLECT: <= prod_i(n_levels_i) rows (18 for the
    defaults) regardless of corpus size — map-side combine does the
    heavy lifting."""
    cols = [c.col for c in comparisons]
    rows = gammas.groupBy(*cols).agg(F.count(F.lit(1)).alias("n")).collect()
    out = [(tuple(int(r[c]) for c in cols), int(r["n"])) for r in rows]
    out.sort()
    return out


def em_fit(
    counts: Sequence[tuple[tuple[int, ...], int]],
    n_levels: Sequence[int],
    iters: int = 40,
    lam0: float = 0.1,
    eps: float = 1e-6,
) -> tuple[float, list[list[float]], list[list[float]]]:
    """Pure-Python EM over the pattern histogram. Deterministic: fixed
    iteration count, float64, inputs pre-sorted by the caller
    (pattern_counts), Laplace-smoothed M-step (no zero probabilities).

    Init breaks the label symmetry the standard way: m favors high
    agreement levels (∝ 4^l), u favors low (∝ 4^(max-l)).

    Returns (lambda, m, u) with m[i][l] = P(level l | match).
    """
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    k = len(n_levels)
    if any(n < 2 for n in n_levels):
        raise ValueError(f"every comparison needs >= 2 levels, got {n_levels}")
    total = sum(n for _, n in counts)
    if total == 0:
        raise ValueError("em_fit needs a non-empty pattern histogram")
    for g, _ in counts:
        if len(g) != k or any(not 0 <= g[i] < n_levels[i] for i in range(k)):
            raise ValueError(f"pattern {g} outside level space {n_levels}")

    def norm(v: list[float]) -> list[float]:
        s = sum(v)
        return [x / s for x in v]

    m = [norm([4.0**l for l in range(n)]) for n in n_levels]
    u = [norm([4.0 ** (n - 1 - l) for l in range(n)]) for n in n_levels]
    lam = lam0
    for _ in range(iters):
        # E-step: responsibility per observed pattern
        num_lam = 0.0
        m_num = [[eps] * n for n in n_levels]
        u_num = [[eps] * n for n in n_levels]
        for g, n in counts:
            pm = lam
            pu = 1.0 - lam
            for i, l in enumerate(g):
                pm *= m[i][l]
                pu *= u[i][l]
            p = pm / (pm + pu)
            num_lam += n * p
            for i, l in enumerate(g):
                m_num[i][l] += n * p
                u_num[i][l] += n * (1.0 - p)
        # M-step (Laplace eps prevents degenerate zeros)
        lam = min(max(num_lam / total, eps), 1.0 - eps)
        m = [norm(v) for v in m_num]
        u = [norm(v) for v in u_num]
    return lam, m, u


@dataclass(frozen=True)
class FSModel:
    """Fitted model, frozen to integer-micro log2 Bayes-factor weights
    so Spark and any SQL twin score with EXACT integer arithmetic."""

    names: tuple[str, ...]
    n_levels: tuple[int, ...]
    lam: float
    m: tuple[tuple[float, ...], ...]
    u: tuple[tuple[float, ...], ...]

    @property
    def prior_micro(self) -> int:
        return round(1e6 * math.log2(self.lam / (1.0 - self.lam)))

    def weight_micro(self, i: int, level: int) -> int:
        return round(1e6 * math.log2(self.m[i][level] / self.u[i][level]))

    def weights_micro(self) -> list[list[int]]:
        return [
            [self.weight_micro(i, l) for l in range(n)]
            for i, n in enumerate(self.n_levels)
        ]

    def to_json(self) -> str:
        """Round-trippable artifact (the ER pipeline persists this beside
        its checkpoints so resume / chained-incremental runs score under
        the SAME weights the base corpus did)."""
        import json

        return json.dumps(
            {
                "names": list(self.names),
                "n_levels": list(self.n_levels),
                "lam": self.lam,
                "m": [list(v) for v in self.m],
                "u": [list(v) for v in self.u],
            }
        )

    @classmethod
    def from_json(cls, s: str) -> "FSModel":
        import json

        d = json.loads(s)
        return cls(
            names=tuple(d["names"]),
            n_levels=tuple(int(n) for n in d["n_levels"]),
            lam=float(d["lam"]),
            m=tuple(tuple(float(x) for x in v) for v in d["m"]),
            u=tuple(tuple(float(x) for x in v) for v in d["u"]),
        )


def fit_fs_spark(
    pairs: DataFrame,
    comparisons: Sequence[Comparison],
    iters: int = 40,
    lam0: float = 0.1,
) -> FSModel:
    """Distributed fit: pattern histogram on the cluster (bounded
    collect), EM on the driver."""
    counts = pattern_counts(gamma_levels(pairs, comparisons), comparisons)
    n_levels = [c.n_levels for c in comparisons]
    lam, m, u = em_fit(counts, n_levels, iters=iters, lam0=lam0)
    return FSModel(
        names=tuple(c.name for c in comparisons),
        n_levels=tuple(n_levels),
        lam=lam,
        m=tuple(tuple(v) for v in m),
        u=tuple(tuple(v) for v in u),
    )


def score_fs(
    pairs: DataFrame,
    comparisons: Sequence[Comparison],
    model: FSModel,
    explain: bool = False,
) -> DataFrame:
    """Attach gamma levels, the integer-micro match weight, and the
    match probability. One native Project — the weight CASEs fold into
    whole-stage codegen; probability = 1/(1 + 2^(-w/1e6)) rounded to 6
    (the registry's R6 discipline).

    `explain=True` additionally emits one `w_<name>_micro` column per
    comparison (its exact weight contribution; the prior is the
    remaining summand) — the per-pair evidence breakdown a reviewer
    reads to see WHY a pair matched (the Splink waterfall-chart data).
    Still literals-only: the explain columns are the same CASEs the sum
    folds, so the cost is one extra projection column each."""
    if tuple(c.name for c in comparisons) != model.names or (
        tuple(c.n_levels for c in comparisons) != model.n_levels
    ):
        raise ValueError(
            f"comparisons {[(c.name, c.n_levels) for c in comparisons]} do "
            f"not match the fitted model {list(zip(model.names, model.n_levels))}"
        )
    out = gamma_levels(pairs, comparisons)
    w: Column = F.lit(model.prior_micro).cast("long")
    for i, c in enumerate(comparisons):
        expr = F.lit(model.weight_micro(i, c.n_levels - 1)).cast("long")
        for l in range(c.n_levels - 1):
            expr = F.when(
                F.col(c.col) == l, F.lit(model.weight_micro(i, l)).cast("long")
            ).otherwise(expr)
        if explain:
            out = out.withColumn(f"w_{c.name}_micro", expr)
            expr = F.col(f"w_{c.name}_micro")
        w = w + expr
    out = out.withColumn("match_weight_micro", w)
    return out.withColumn(
        "match_probability",
        F.round(
            F.lit(1.0)
            / (F.lit(1.0) + F.pow(F.lit(2.0), -F.col("match_weight_micro") / F.lit(1e6))),
            6,
        ),
    )


def tf_adjust(
    scored: DataFrame,
    records: DataFrame,
    model: FSModel,
    comparison: str = "exact",
    value_col: str = "norm_text",
    pair_value_col: str = "t1",
) -> DataFrame:
    """Winkler term-frequency adjustment (Winkler 1988; the 'TF
    adjustments' Splink popularized): agreement on a RARE value is
    stronger evidence than agreement on boilerplate. For pairs agreeing
    at `comparison`'s top level, the model's generic u is replaced by
    the value's own collision share u_v = f_v / N, shifting the match
    weight by log2(u / u_v) = log2(u · N / f_v) — positive for rare
    values, negative for values more common than the average collision.

    `scored` is a score_fs output that still carries the hydrated pair
    value column (`pair_value_col`); `records` is the corpus the
    frequencies come from. Adds `value_freq` (N/A pairs: NULL),
    `tf_adj_micro` (0 for non-agreeing pairs) and
    `match_weight_tf_micro`.

    Scale shape: one groupBy over the records for the frequency table,
    one equi-join onto the agreeing pairs (AQE broadcasts a small freq
    table; at web scale both sides shuffle on the value — the same key
    the blocking already hashed). N is a single count job (a scalar,
    not a collect). The adjustment stays a native expression."""
    i = model.names.index(comparison)
    top = model.n_levels[i] - 1
    u_top = model.u[i][top]
    g_col = f"g_{comparison}"
    n = records.count()
    freq = records.groupBy(F.col(value_col).alias("_v")).agg(
        F.count(F.lit(1)).cast("long").alias("value_freq")
    )
    out = scored.join(
        freq, scored[pair_value_col] == freq["_v"], "left"
    ).drop("_v")
    adj = F.when(
        (F.col(g_col) == top) & F.col("value_freq").isNotNull(),
        F.round(
            F.lit(1000000.0)
            * F.log2(F.lit(u_top) * F.lit(n) / F.col("value_freq"))
        ).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    out = out.withColumn("tf_adj_micro", adj)
    return out.withColumn(
        "match_weight_tf_micro",
        F.col("match_weight_micro") + F.col("tf_adj_micro"),
    )


def decision_thresholds(
    model: FSModel, mu: float = 0.001, lam: float = 0.001
) -> tuple[int, int]:
    """The optimal Fellegi–Sunter decision rule (Theorem 1 of the 1969
    paper): enumerate the FULL gamma pattern space (prod(n_levels)
    patterns — enumerable by construction), order by match weight, take
    the largest prefix whose cumulative false-match mass Σ P(γ|U) stays
    ≤ mu as auto-MATCH and the largest suffix whose cumulative
    false-non-match mass Σ P(γ|M) stays ≤ lam as auto-NON-MATCH; the
    patterns between the cutoffs are the clerical-review band.

    Returns (upper_micro, lower_micro) thresholds on the SAME
    match_weight_micro scale score_fs emits (prior included — a constant
    shift on both sides of the ratio test): weight ≥ upper → match,
    weight ≤ lower → non-match, else possible. Patterns sharing one
    weight are admitted all-or-nothing (a threshold cannot split a tie).
    When even the best pattern exceeds a budget the band is empty on
    that side (upper = best+1 / lower = worst−1, unreachable). If
    generous budgets make the bands cross, upper is clamped to
    lower + 1 — the review band vanishes but match never undercuts
    non-match. Driver-side and deterministic; cost O(pattern space)."""
    import itertools

    if not (0.0 < mu < 1.0 and 0.0 < lam < 1.0):
        raise ValueError(f"mu and lam must be in (0, 1), got {mu}, {lam}")
    pats = []
    for g in itertools.product(*[range(n) for n in model.n_levels]):
        pm = 1.0
        pu = 1.0
        w = model.prior_micro
        for i, l in enumerate(g):
            pm *= model.m[i][l]
            pu *= model.u[i][l]
            w += model.weight_micro(i, l)
        pats.append((w, g, pm, pu))
    pats.sort(key=lambda t: (-t[0], t[1]))
    # group ties by weight (all-or-nothing admission)
    groups: list[tuple[int, float, float]] = []
    for w, _, pm, pu in pats:
        if groups and groups[-1][0] == w:
            pw, ppm, ppu = groups[-1]
            groups[-1] = (pw, ppm + pm, ppu + pu)
        else:
            groups.append((w, pm, pu))
    upper = groups[0][0] + 1  # unreachable until a group fits
    acc = 0.0
    for w, _, pu in groups:
        if acc + pu > mu:
            break
        acc += pu
        upper = w
    lower = groups[-1][0] - 1
    acc = 0.0
    for w, pm, _ in reversed(groups):
        if acc + pm > lam:
            break
        acc += pm
        lower = w
    if upper <= lower:
        upper = lower + 1
    return upper, lower


def classify_fs(
    scored: DataFrame, upper_micro: int, lower_micro: int
) -> DataFrame:
    """Attach the three-way FS decision to a score_fs output (native
    CASE on the exact integer weight)."""
    if upper_micro <= lower_micro:
        raise ValueError(
            f"upper_micro ({upper_micro}) must exceed lower_micro "
            f"({lower_micro})"
        )
    return scored.withColumn(
        "decision",
        F.when(F.col("match_weight_micro") >= upper_micro, F.lit("match"))
        .when(F.col("match_weight_micro") <= lower_micro, F.lit("non_match"))
        .otherwise(F.lit("possible")),
    )


def score_pairs_fs(
    pairs: DataFrame,
    records: DataFrame,
    model: FSModel | None = None,
    threshold: float = 0.8,
    iters: int = 40,
) -> tuple[DataFrame, FSModel]:
    """The ER pipeline's Fellegi–Sunter scorer — a drop-in alternative
    to operators/scoring.score_pairs (same SCORED_PAIRS schema; the
    blend features jw/lev_sim/tfidf_cos are NULL, score = the FS match
    probability). When `model` is None it is EM-fit on THESE candidate
    pairs (the unsupervised batch posture); pass a fitted model to PIN
    weights — required for incremental runs, where refitting per batch
    would score later pairs under a different model than earlier ones
    (the pinned-artifact discipline of plans/curation_incremental).

    Returns (scored, model) so a caller can pin the fitted model."""
    from .scoring import hydrate_pairs

    hydrated = hydrate_pairs(pairs, records)
    comps = default_comparisons(
        t1="text1", t2="text2", tk1="tokens1", tk2="tokens2"
    )
    if model is None:
        model = fit_fs_spark(hydrated, comps, iters=iters)
    scored = score_fs(hydrated, comps, model)
    null_d = F.lit(None).cast("double")
    return (
        scored.select(
            "id1",
            "id2",
            null_d.alias("jw"),
            null_d.alias("lev_sim"),
            null_d.alias("tfidf_cos"),
            F.col("match_probability").alias("score"),
            (F.col("match_probability") >= F.lit(threshold)).alias("is_match"),
        ),
        model,
    )
