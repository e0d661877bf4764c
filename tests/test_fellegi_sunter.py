"""Fellegi–Sunter EM linkage model (operators/fellegi_sunter.py)."""

import math

import pytest
from pyspark.sql import functions as F

from dig_entity_resolution_spark.operators.fellegi_sunter import (
    Comparison,
    default_comparisons,
    em_fit,
    fit_fs_spark,
    gamma_levels,
    pattern_counts,
    score_fs,
)


def _planted_counts():
    """Two comparisons x 2/3 levels; 100 matches agreeing hard, 900
    non-matches disagreeing hard, a little noise either side."""
    return [
        ((0, 0), 850),  # clean non-matches
        ((0, 1), 40),
        ((1, 0), 10),
        ((1, 1), 15),  # noisy middle
        ((1, 2), 85),  # clean matches (exact + high jaccard)
        ((0, 2), 0),
    ]


def test_em_fit_recovers_planted_mixture():
    lam, m, u = em_fit(_planted_counts(), [2, 3])
    # ~10% of pairs are matches
    assert 0.05 < lam < 0.2
    # matches agree: P(level max | match) >> P(level max | non-match)
    assert m[0][1] > 0.7 and u[0][1] < 0.1
    assert m[1][2] > 0.6 and u[1][2] < 0.1
    # weights are monotone in agreement level for the 3-level comparison
    w = [math.log2(m[1][l] / u[1][l]) for l in range(3)]
    assert w[0] < w[1] < w[2]


def test_em_fit_deterministic_and_validates():
    a = em_fit(_planted_counts(), [2, 3])
    b = em_fit(_planted_counts(), [2, 3])
    assert a == b  # bit-identical float64
    with pytest.raises(ValueError, match="non-empty"):
        em_fit([], [2, 2])
    with pytest.raises(ValueError, match="level space"):
        em_fit([((2, 0), 5)], [2, 3])
    with pytest.raises(ValueError, match=">= 2 levels"):
        em_fit([((0,), 5)], [1])
    with pytest.raises(ValueError, match="iters"):
        em_fit(_planted_counts(), [2, 3], iters=0)


@pytest.fixture(scope="module")
def pairs(spark):
    rows = []
    # 60 matching pairs: identical or near-identical text
    for i in range(60):
        t = f"alpha beta gamma delta {i}"
        t2 = t if i % 2 == 0 else t + " x"
        rows.append((2 * i, 2 * i + 1, t, t2, t.split(" "), t2.split(" ")))
    # 540 non-matching pairs: disjoint token sets
    for i in range(540):
        a = f"red green blue {i}"
        b = f"cyan magenta yellow {i + 1000} zz"
        rows.append((9000 + 2 * i, 9001 + 2 * i, a, b, a.split(" "), b.split(" ")))
    return spark.createDataFrame(
        rows, "id1 long, id2 long, t1 string, t2 string, tk1 array<string>, tk2 array<string>"
    )


def test_fit_and_score_separate_planted_classes(spark, pairs):
    comps = default_comparisons()
    model = fit_fs_spark(pairs, comps)
    assert 0.05 < model.lam < 0.25
    scored = score_fs(pairs, comps, model).collect()
    match_p = [r.match_probability for r in scored if r.id1 < 9000]
    non_p = [r.match_probability for r in scored if r.id1 >= 9000]
    assert min(match_p) > 0.9
    assert max(non_p) < 0.1
    # weight is the exact integer micro sum: prior + per-level weights
    wm = model.weights_micro()
    by_id = {r.id1: r for r in scored}
    r = by_id[0]  # exact duplicate: all comparisons at max level
    assert r.g_exact == 1 and r.g_jaccard == 2 and r.g_lev == 2
    assert r.match_weight_micro == (
        model.prior_micro + wm[0][1] + wm[1][2] + wm[2][2]
    )


def test_gamma_levels_integer_thresholds(spark):
    df = spark.createDataFrame(
        [
            # jaccard exactly 0.8 (4 of 5) -> level 2 boundary inclusive
            (1, 2, "a b c d", "a b c d e",
             ["a", "b", "c", "d"], ["a", "b", "c", "d", "e"]),
            # jaccard exactly 0.4 (2 of 5) -> level 1 boundary inclusive
            (3, 4, "a b x y", "a b z", ["a", "b", "x", "y"], ["a", "b", "z"]),
            # disjoint -> level 0; lev band 0
            (5, 6, "aaaa", "zzzz", ["aaaa"], ["zzzz"]),
        ],
        "id1 long, id2 long, t1 string, t2 string, tk1 array<string>, tk2 array<string>",
    )
    got = {
        r.id1: (r.g_exact, r.g_jaccard, r.g_lev)
        for r in gamma_levels(df, default_comparisons()).collect()
    }
    # lev=2 over maxlen 9: 20 <= 9 false, 20 <= 27 true -> band 1
    assert got[1] == (0, 2, 1)
    assert got[3][1] == 1
    assert got[5] == (0, 0, 0)


def test_pattern_counts_bounded_and_sorted(spark, pairs):
    comps = default_comparisons()
    counts = pattern_counts(gamma_levels(pairs, comps), comps)
    assert len(counts) <= 2 * 3 * 3
    assert counts == sorted(counts)
    assert sum(n for _, n in counts) == pairs.count()


def test_score_plan_native_no_extra_shuffle(spark, pairs):
    comps = default_comparisons()
    model = fit_fs_spark(pairs, comps)
    plan = score_fs(pairs, comps, model)._jdf.queryExecution().executedPlan().toString()
    for bad in ("ArrowEvalPython", "BatchEvalPython", "Exchange", "CartesianProduct"):
        assert bad not in plan, bad


def test_score_rejects_mismatched_model(spark, pairs):
    comps = default_comparisons()
    model = fit_fs_spark(pairs, comps)
    with pytest.raises(ValueError, match="do not match"):
        score_fs(pairs, comps[:2], model)
    other = [Comparison("other", 2, F.lit(0))] + comps[1:]
    with pytest.raises(ValueError, match="do not match"):
        score_fs(pairs, other, model)


def test_score_fs_explain_breakdown(spark, pairs):
    from dig_entity_resolution_spark.operators.fellegi_sunter import (
        default_comparisons,
        fit_fs_spark,
        score_fs,
    )

    comps = default_comparisons()
    model = fit_fs_spark(pairs, comps)
    rows = score_fs(pairs, comps, model, explain=True).collect()
    wm = model.weights_micro()
    for r in rows[:50]:
        assert r.w_exact_micro == wm[0][r.g_exact]
        assert r.w_jaccard_micro == wm[1][r.g_jaccard]
        assert r.w_lev_micro == wm[2][r.g_lev]
        # the breakdown sums exactly to the total (prior = remainder)
        assert (
            model.prior_micro
            + r.w_exact_micro
            + r.w_jaccard_micro
            + r.w_lev_micro
            == r.match_weight_micro
        )


# -- term-frequency adjustment (Winkler 1988) --------------------------------


def test_tf_adjust_rare_vs_common(spark, pairs):
    import math

    from dig_entity_resolution_spark.operators.fellegi_sunter import (
        default_comparisons,
        fit_fs_spark,
        score_fs,
        tf_adjust,
    )

    comps = default_comparisons()
    model = fit_fs_spark(pairs, comps)
    scored = score_fs(pairs, comps, model)
    # records: one rare value (the exact-dup pair at ids 0/1) and a
    # boilerplate value repeated 50x
    rows = [(0, "alpha beta gamma delta 0"), (1, "alpha beta gamma delta 0")]
    rows += [(100 + i, "common boilerplate line") for i in range(50)]
    recs = spark.createDataFrame(rows, "record_id long, norm_text string")
    out = tf_adjust(scored, recs, model)
    r = {x.id1: x for x in out.filter(F.col("g_exact") == 1).collect()}[0]
    n = len(rows)
    u_top = model.u[0][1]
    expect = round(1e6 * math.log2(u_top * n / 2))
    assert r.value_freq == 2
    assert abs(r.tf_adj_micro - expect) <= 1  # rounding-mode slack
    assert r.match_weight_tf_micro == r.match_weight_micro + r.tf_adj_micro
    # non-agreeing pairs carry zero adjustment and an untouched weight
    z = out.filter(F.col("g_exact") == 0).limit(1).collect()[0]
    assert z.tf_adj_micro == 0
    assert z.match_weight_tf_micro == z.match_weight_micro
    # an agreeing pair whose value is absent from the frequency table:
    # NULL freq, zero adjustment (the other exact pairs' texts are not
    # in recs)
    miss = (
        out.filter((F.col("g_exact") == 1) & F.col("value_freq").isNull())
        .limit(1)
        .collect()
    )
    assert miss and miss[0].tf_adj_micro == 0


def test_tf_adjust_monotone_in_frequency(spark, pairs):
    import math

    from dig_entity_resolution_spark.operators.fellegi_sunter import (
        default_comparisons,
        fit_fs_spark,
        score_fs,
        tf_adjust,
    )

    comps = default_comparisons()
    model = fit_fs_spark(pairs, comps)
    scored = score_fs(pairs, comps, model)
    # ONE frequency table with a rare and a common value: freq 1 vs 16
    rows = [(0, "alpha beta gamma delta 0")]
    rows += [(200 + i, "alpha beta gamma delta 4") for i in range(16)]
    recs = spark.createDataFrame(rows, "record_id long, norm_text string")
    got = {
        r.id1: r.tf_adj_micro
        for r in tf_adjust(scored, recs, model)
        .filter(F.col("value_freq").isNotNull() & (F.col("g_exact") == 1))
        .collect()
    }
    # pair (0,1) agreed on the rare value, pair (8,9) on the common one:
    # 16x the frequency costs log2(16) = 4 weight units (float/rounding
    # slack of a couple micro)
    assert abs(got[0] - got[8] - round(1e6 * math.log2(16))) <= 2


# -- decision rule (FS 1969 Theorem 1) ---------------------------------------


def _model1():
    from dig_entity_resolution_spark.operators.fellegi_sunter import FSModel

    return FSModel(
        names=("c",), n_levels=(3,), lam=0.2,
        m=((0.05, 0.15, 0.8),), u=((0.7, 0.25, 0.05),),
    )


def test_decision_thresholds_hand_computed():
    from dig_entity_resolution_spark.operators.fellegi_sunter import (
        decision_thresholds,
    )

    m = _model1()
    w = m.weights_micro()[0]
    top, mid, bot = (m.prior_micro + w[2], m.prior_micro + w[1],
                     m.prior_micro + w[0])
    # mu=0.06 admits the top pattern (P(g2|U)=0.05); lam=0.1 admits only
    # the bottom (P(g0|M)=0.05; adding g1 would reach 0.20)
    assert decision_thresholds(m, mu=0.06, lam=0.1) == (top, bot)
    # tighter mu: even the best pattern exceeds the budget -> empty band
    up, lo = decision_thresholds(m, mu=0.04, lam=0.1)
    assert up == top + 1 and lo == bot
    # generous lam admits the middle pattern too
    assert decision_thresholds(m, mu=0.06, lam=0.25)[1] == mid
    # crossing bands clamp to an empty review band, match above non-match
    up, lo = decision_thresholds(m, mu=0.99, lam=0.99)
    assert up == lo + 1
    with pytest.raises(ValueError, match="in \\(0, 1\\)"):
        decision_thresholds(m, mu=0.0)


def test_decision_thresholds_tied_patterns_all_or_nothing():
    from dig_entity_resolution_spark.operators.fellegi_sunter import (
        FSModel,
        decision_thresholds,
    )

    m = FSModel(
        names=("a", "b"), n_levels=(2, 2), lam=0.5,
        m=((0.2, 0.8), (0.2, 0.8)), u=((0.8, 0.2), (0.8, 0.2)),
    )
    w = m.weights_micro()
    w11 = m.prior_micro + w[0][1] + w[1][1]
    # P((1,1)|U)=0.04 fits mu=0.2; the tied (0,1)/(1,0) group adds 0.32
    # and must be admitted whole — half of it (0.16) would fit, but a
    # weight threshold cannot split a tie
    up, _ = decision_thresholds(m, mu=0.2, lam=0.01)
    assert up == w11


def test_classify_fs(spark):
    from dig_entity_resolution_spark.operators.fellegi_sunter import classify_fs

    df = spark.createDataFrame(
        [(1, 5_000_000), (2, 0), (3, -5_000_000)],
        "id long, match_weight_micro long",
    )
    got = {
        r.id: r.decision
        for r in classify_fs(df, 4_000_000, -4_000_000).collect()
    }
    assert got == {1: "match", 2: "possible", 3: "non_match"}
    with pytest.raises(ValueError, match="must exceed"):
        classify_fs(df, 0, 0)


# -- pipeline integration (ERConfig(scorer="fellegi_sunter")) ----------------


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    from dig_entity_resolution_spark.synth import generate_corpus

    d = tmp_path_factory.mktemp("fs_corpus")
    return generate_corpus(
        str(d), n_clusters=20, cluster_size=3, n_singletons=80, seed=7
    )


def test_pipeline_fs_scorer_e2e(spark, corpus, tmp_path):
    from dig_entity_resolution_spark.plans.pipeline import ERConfig, ERPipeline

    pages = spark.read.parquet(corpus["pages"])
    pipe = ERPipeline(
        spark, str(tmp_path / "wh"), "fs", ERConfig(scorer="fellegi_sunter")
    )
    clusters = pipe.run(pages)
    labels = spark.read.parquet(corpus["labels"])
    prf = pipe.evaluate(clusters, labels).collect()[0]
    assert prf.f1 >= 0.99, prf.asDict()
    assert pipe.fs_model is not None  # the batch fit got pinned
    # SCORED_PAIRS schema holds: blend features NULL, score = probability
    sp = pipe.ckpt.read("scored_pairs")
    assert sp.filter(F.col("jw").isNotNull()).count() == 0
    lo = sp.filter(F.col("is_match")).agg(F.min("score").alias("m")).collect()[0]
    assert lo.m >= pipe.cfg.threshold


def test_pipeline_fs_incremental_pinned_model(spark, corpus, tmp_path):
    from dig_entity_resolution_spark.plans.pipeline import ERConfig, ERPipeline

    pages = spark.read.parquet(corpus["pages"])
    wh = str(tmp_path / "wh")
    split = F.pmod(F.xxhash64("url"), F.lit(2)) == 0
    batch_a, batch_b = pages.filter(split), pages.filter(~split)
    base = ERPipeline(spark, wh, "fsbase", ERConfig(scorer="fellegi_sunter"))
    base.run(batch_a)
    model = base.fs_model
    # FS incremental over a blend base refuses loudly...
    blend_base = ERPipeline(spark, wh, "blbase", ERConfig())
    blend_base.run(batch_a)
    bad = ERPipeline(spark, wh, "fsbad", ERConfig(scorer="fellegi_sunter"))
    with pytest.raises(ValueError, match="no fs_model.json"):
        bad.run_incremental(batch_b, base_run_id="blbase")
    # ...even with an injected model (the base's scores are blend scores)
    bad2 = ERPipeline(
        spark, wh, "fsbad2",
        ERConfig(scorer="fellegi_sunter", fs_model=model),
    )
    with pytest.raises(ValueError, match="no fs_model.json"):
        bad2.run_incremental(batch_b, base_run_id="blbase")
    # ...and a blend incremental over an FS base refuses in reverse
    bad3 = ERPipeline(spark, wh, "blbad", ERConfig())
    with pytest.raises(ValueError, match="scored with\n?\\s*fellegi_sunter"):
        bad3.run_incremental(batch_b, base_run_id="fsbase")
    # ...but over an FS base it recovers the persisted weights on its own
    incr = ERPipeline(spark, wh, "fsincr", ERConfig(scorer="fellegi_sunter"))
    got = sorted(
        (r.record_id, r.cluster_id)
        for r in incr.run_incremental(batch_b, base_run_id="fsbase").collect()
    )
    # the recovered model is the base's fit, bit-exact through JSON
    assert incr.fs_model.weights_micro() == model.weights_micro()
    assert incr.fs_model.prior_micro == model.prior_micro
    # and the incremental warehouse is itself a chainable FS base
    import os

    assert os.path.exists(incr._fs_model_path())
    # rerunning a run_id with a DIFFERENT injected model must overwrite
    # the persisted artifact, not leave the stale fit for chained runs
    import dataclasses

    m2 = dataclasses.replace(model, lam=0.33)
    rerun = ERPipeline(
        spark, wh, "fsbase", ERConfig(scorer="fellegi_sunter", fs_model=m2)
    )
    rerun.run(batch_a)
    assert rerun._load_fs_model().lam == 0.33
    full = ERPipeline(
        spark, wh, "fsfull",
        ERConfig(scorer="fellegi_sunter", fs_model=model),
    )
    expect = sorted(
        (r.record_id, r.cluster_id) for r in full.run(pages).collect()
    )
    assert got == expect


def test_unknown_scorer_rejected(spark, tmp_path):
    from dig_entity_resolution_spark.plans.pipeline import ERConfig, ERPipeline

    with pytest.raises(ValueError, match="unknown scorer"):
        ERPipeline(spark, str(tmp_path / "wh"), "x", ERConfig(scorer="typo"))


def test_empty_pairs_fit_raises_score_empty(spark, pairs):
    comps = default_comparisons()
    empty = pairs.filter(F.lit(False))
    with pytest.raises(ValueError, match="non-empty"):
        fit_fs_spark(empty, comps)
    model = fit_fs_spark(pairs, comps)
    assert score_fs(empty, comps, model).count() == 0
