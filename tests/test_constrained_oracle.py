"""Constrained grpnet vs the INDEPENDENT trust-constr oracle.

VERDICT r3 #7: the constrained paths were certified by self-written FISTA
+ KKT certificates only.  Here every constraint type x {gaussian,
logistic} is checked against ``tests/oracle_constrained.py`` — scipy's
interior-point/SQP solver on the smoothed primal, sharing no code with
``adelie_tpu.constraint`` — with the reference's two-tier criterion
(reference tests/test_solver.py:408-466): coefficients match at 1e-6, or
our exact objective is <= oracle * (1 + 1e-7) while feasible.
"""

import numpy as np
import pytest

import adelie_tpu as ad
from adelie_tpu import constraint as ct

from oracle_constrained import (
    max_constraint_violation,
    objective_constrained,
    solve_constrained_oracle,
)

Q = 3          # group size
G = 6          # groups
N = 150


def _problem(seed, loss):
    rng = np.random.default_rng(seed)
    p = G * Q
    X = rng.standard_normal((N, p))
    beta_true = np.zeros(p)
    beta_true[:2 * Q] = rng.standard_normal(2 * Q)
    eta = X @ beta_true
    if loss == "gaussian":
        y = eta + 0.2 * rng.standard_normal(N)
    else:
        y = (eta + 0.5 * rng.standard_normal(N) > 0).astype(float)
    groups = np.arange(0, p, Q)
    return X, y, groups


def _make_constraints(kind, rng):
    """(adelie constraint objects, oracle specs) — constrained on the odd
    groups, unconstrained (None) on the even ones."""
    cons, specs = [], []
    tight = {"tol": 1e-12, "max_iters": 20000}
    for g in range(G):
        if g % 2 == 0:
            cons.append(None)
            specs.append(None)
            continue
        if kind == "box":
            lo = -0.25 * (1 + rng.uniform(size=Q))
            hi = 0.2 * (1 + rng.uniform(size=Q))
            cons.append(ct.box(lo, hi, configs=tight))
            specs.append(("box", lo, hi))
        elif kind == "lower":
            b = -0.15 * (1 + rng.uniform(size=Q))
            cons.append(ct.lower(b, configs=tight))
            specs.append(("one_sided", -np.ones(Q), -b))
        elif kind == "upper":
            b = 0.15 * (1 + rng.uniform(size=Q))
            cons.append(ct.upper(b, configs=tight))
            specs.append(("one_sided", np.ones(Q), b))
        elif kind == "one_sided":
            sgn = rng.choice([-1.0, 1.0], size=Q)
            b = 0.2 * (1 + rng.uniform(size=Q))
            cons.append(ct.one_sided(sgn, b, configs=tight))
            specs.append(("one_sided", sgn, b))
        elif kind == "linear":
            A = rng.standard_normal((2, Q))
            lo = -0.3 * (1 + rng.uniform(size=2))
            hi = 0.3 * (1 + rng.uniform(size=2))
            cons.append(ct.linear(A, lo, hi, configs=tight))
            specs.append(("linear", A, lo, hi))
        else:
            raise AssertionError(kind)
    return cons, specs


def _check_against_oracle(state, X, y, specs, groups, loss, alpha,
                          lmda_idx, *, atol=1e-6, obj_rtol=1e-7):
    w = np.full(N, 1.0 / N)
    penalty = np.sqrt(np.full(G, Q, float))
    group_sizes = np.full(G, Q, int)
    B = np.asarray(state.betas.todense())
    for li in lmda_idx:
        lmda = float(state.lmdas[li])
        beta_o, b0_o = solve_constrained_oracle(
            X, y, w, lmda, alpha, penalty, groups, group_sizes, specs,
            loss=loss, intercept=True, x0=B[li],
        )
        ours, b0_ours = B[li], float(state.intercepts[li])
        if np.allclose(ours, beta_o, atol=atol) and \
                np.isclose(b0_ours, b0_o, atol=atol):
            continue
        # reference fallback: objective dominance + feasibility
        obj_ours = objective_constrained(
            X, y, w, lmda, alpha, penalty, groups, group_sizes,
            ours, b0_ours, loss=loss)
        obj_orac = objective_constrained(
            X, y, w, lmda, alpha, penalty, groups, group_sizes,
            beta_o, b0_o, loss=loss)
        viol = max_constraint_violation(specs, groups, group_sizes, ours)
        assert viol < 1e-8, (li, viol)
        assert obj_ours <= obj_orac * (1 + obj_rtol) + 1e-14, (
            li, obj_ours, obj_orac,
            np.abs(ours - beta_o).max(),
        )


@pytest.mark.parametrize("loss", ["gaussian", "logistic"])
@pytest.mark.parametrize("kind", ["box", "lower", "upper", "one_sided",
                                  "linear"])
def test_constrained_grpnet_vs_independent_oracle(kind, loss):
    X, y, groups = _problem(7, loss)
    cons, specs = _make_constraints(kind, np.random.default_rng(21))
    glm = ad.glm.gaussian(y) if loss == "gaussian" else ad.glm.binomial(y)
    state = ad.grpnet(
        X, glm, groups=groups, constraints=cons,
        lmda_path_size=8, min_ratio=0.05, tol=1e-10, irls_tol=1e-10,
        progress_bar=False, early_exit=False,
    )
    assert state.error == "", state.error
    # spot-check early, middle, and end of the path
    idx = [1, len(state.lmdas) // 2, len(state.lmdas) - 1]
    _check_against_oracle(state, X, y, specs, groups, loss, 1.0, idx)


@pytest.mark.parametrize("loss", ["gaussian", "logistic"])
def test_constrained_elastic_net_vs_independent_oracle(loss):
    """alpha < 1 exercises the l2 term through the constrained solves."""
    X, y, groups = _problem(11, loss)
    cons, specs = _make_constraints("box", np.random.default_rng(33))
    glm = ad.glm.gaussian(y) if loss == "gaussian" else ad.glm.binomial(y)
    state = ad.grpnet(
        X, glm, groups=groups, constraints=cons, alpha=0.7,
        lmda_path_size=6, min_ratio=0.05, tol=1e-10, irls_tol=1e-10,
        progress_bar=False, early_exit=False,
    )
    assert state.error == "", state.error
    idx = [1, len(state.lmdas) - 1]
    _check_against_oracle(state, X, y, specs, groups, loss, 0.7, idx)
