"""Property tests (hypothesis) for the Fellegi–Sunter EM fit and the
Theorem-1 decision rule: the error-mass bounds and band ordering must
hold for ARBITRARY valid models and budgets, not just the hand-built
fixtures."""

import itertools

from hypothesis import given, settings
from hypothesis import strategies as st

from dig_entity_resolution_spark.operators.fellegi_sunter import (
    FSModel,
    decision_thresholds,
    em_fit,
)

pytestmark = []  # pure-Python module: no spark fixture needed


def _norm(v):
    s = sum(v)
    return tuple(x / s for x in v)


@st.composite
def models(draw):
    k = draw(st.integers(min_value=1, max_value=3))
    n_levels = [draw(st.integers(min_value=2, max_value=4)) for _ in range(k)]
    pos = st.floats(min_value=1e-3, max_value=1.0)
    m = tuple(_norm([draw(pos) for _ in range(n)]) for n in n_levels)
    u = tuple(_norm([draw(pos) for _ in range(n)]) for n in n_levels)
    lam = draw(st.floats(min_value=1e-3, max_value=1 - 1e-3))
    return FSModel(
        names=tuple(f"c{i}" for i in range(k)),
        n_levels=tuple(n_levels),
        lam=lam,
        m=m,
        u=u,
    )


@settings(max_examples=120, deadline=None)
@given(
    models(),
    st.floats(min_value=1e-4, max_value=0.999),
    st.floats(min_value=1e-4, max_value=0.999),
)
def test_decision_rule_invariants(model, mu, lam):
    up, lo = decision_thresholds(model, mu=mu, lam=lam)
    # bands never cross
    assert up > lo
    # error-mass bounds hold over the full pattern space: the auto-match
    # band's false-match mass <= mu, the auto-non-match band's
    # false-non-match mass <= lam (the clamp only ever SHRINKS the match
    # band, so both survive it)
    u_mass = m_mass = 0.0
    for g in itertools.product(*[range(n) for n in model.n_levels]):
        pm = pu = 1.0
        w = model.prior_micro
        for i, l in enumerate(g):
            pm *= model.m[i][l]
            pu *= model.u[i][l]
            w += model.weight_micro(i, l)
        if w >= up:
            u_mass += pu
        if w <= lo:
            m_mass += pm
    assert u_mass <= mu + 1e-9
    assert m_mass <= lam + 1e-9


@st.composite
def histograms(draw):
    k = draw(st.integers(min_value=1, max_value=3))
    n_levels = [draw(st.integers(min_value=2, max_value=3)) for _ in range(k)]
    space = list(itertools.product(*[range(n) for n in n_levels]))
    counts = [
        (g, draw(st.integers(min_value=0, max_value=1000))) for g in space
    ]
    counts = [(g, n) for g, n in counts if n > 0]
    return counts, n_levels


@settings(max_examples=120, deadline=None)
@given(histograms(), st.integers(min_value=1, max_value=30))
def test_em_fit_always_valid_and_deterministic(hist, iters):
    counts, n_levels = hist
    if not counts:
        return  # empty histograms raise (covered by the unit tests)
    lam, m, u = em_fit(counts, n_levels, iters=iters)
    assert 0.0 < lam < 1.0
    for rows in (m, u):
        for v in rows:
            assert abs(sum(v) - 1.0) < 1e-9
            assert all(x > 0 for x in v)  # Laplace smoothing: no zeros
    assert em_fit(counts, n_levels, iters=iters) == (lam, m, u)
