"""Pallas lasso pin kernel vs the XLA reference path (interpret mode on
CPU; the real-TPU path is exercised by bench.py and the verify drives)."""

import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

# pallas interpret mode traces deeply-nested loop bodies; the default
# recursion limit is too small under pytest's already-deep call stack
sys.setrecursionlimit(100000)

from adelie_tpu.solver.pin import pin_cov_solve, screen_eigh
from adelie_tpu.solver.pin_pallas import pin_lasso_solve_pallas


def _problem(n, S, n_invalid, seed, lmda, alpha=1.0):
    rng = np.random.default_rng(seed)
    X = rng.standard_normal((n, S))
    A = jnp.asarray(X.T @ X / n, jnp.float32)
    y = X[:, 0] - X[:, min(5, S - 1)] + 0.1 * rng.standard_normal(n)
    grad = jnp.asarray(X.T @ y / n, jnp.float32)
    slot_begin = jnp.arange(S, dtype=jnp.int32)
    slot_size = jnp.ones(S, jnp.int32)
    if n_invalid:
        slot_size = slot_size.at[-n_invalid:].set(0)
    eigvals, eigvecs = screen_eigh(A, slot_begin, slot_size, 1)
    pen = jnp.asarray(rng.uniform(0.5, 1.5, S), jnp.float32)
    return A, grad, slot_begin, slot_size, eigvals, eigvecs, pen


@pytest.mark.parametrize("S,n_invalid,lmda,alpha", [
    (32, 0, 0.05, 1.0),
    (64, 5, 0.02, 1.0),
    (48, 3, 0.05, 0.7),
])
def test_pallas_matches_xla(S, n_invalid, lmda, alpha):
    n = 300
    A, grad, slot_begin, slot_size, eigvals, eigvecs, pen = _problem(
        n, S, n_invalid, S, lmda, alpha
    )
    beta0 = jnp.zeros(S, jnp.float32)
    act = jnp.zeros(S, bool)
    f = jnp.float32
    common = (f(lmda), f(alpha), f(1e-9), f(1e-12))

    out_x = pin_cov_solve(
        A, grad, beta0, slot_begin, slot_size, eigvals, eigvecs, pen, act,
        *common[:2], *common[2:], f(1e-12), jnp.int32(1000),
        jnp.int32(100000), f(0.0),
    )
    valid = slot_size > 0
    out_p = pin_lasso_solve_pallas(
        A, grad, beta0, eigvals[:, 0], valid, act, pen,
        *common, f(100000), f(0.0), interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out_x[0]), np.asarray(out_p[0]),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(out_x[1]), np.asarray(out_p[1]),
                               atol=2e-5)
    assert np.isclose(float(out_x[3]), float(out_p[3]), atol=1e-4)
    assert bool(out_p[5])
    # invalid slots never activate or move
    if n_invalid:
        assert np.all(np.asarray(out_p[0])[-n_invalid:] == 0)
        assert not np.any(np.asarray(out_p[2])[-n_invalid:])


def _group_problem(n, G, qmax, seed, ragged=True):
    """Random grouped screen problem with ragged group sizes <= qmax and
    trailing invalid slots."""
    rng = np.random.default_rng(seed)
    sizes = rng.integers(1, qmax + 1, G) if ragged else np.full(G, qmax)
    begins = np.concatenate([[0], np.cumsum(sizes)])[:-1]
    S_val = int(begins[-1] + sizes[-1])
    S = S_val + qmax  # pad capacity like ScreenCache (S_cap >= S_val + qmax)
    X = rng.standard_normal((n, S_val))
    A = np.zeros((S, S), np.float32)
    A[:S_val, :S_val] = (X.T @ X / n).astype(np.float32)
    y = X @ (rng.standard_normal(S_val) * (rng.random(S_val) < 0.3))
    y = y + 0.1 * rng.standard_normal(n)
    grad = np.zeros(S, np.float32)
    grad[:S_val] = (X.T @ y / n).astype(np.float32)

    G_cap = G + 2  # trailing invalid slots
    slot_begin = np.zeros(G_cap, np.int32)
    slot_size = np.zeros(G_cap, np.int32)
    slot_begin[:G] = begins
    slot_size[:G] = sizes
    pen = np.ones(G_cap, np.float32)
    pen[:G] = np.sqrt(sizes)
    eigvals, eigvecs = screen_eigh(
        jnp.asarray(A), jnp.asarray(slot_begin), jnp.asarray(slot_size), qmax
    )
    return (jnp.asarray(A), jnp.asarray(grad), jnp.asarray(slot_begin),
            jnp.asarray(slot_size), eigvals, eigvecs, jnp.asarray(pen),
            S, G_cap)


# (r5) the grouped-kernel tests that lived here were removed with the
# grouped whole-solve Pallas kernel itself — see solver/pin_pallas.py
# tombstone note; grouped solves are covered by pin.py XLA-loop tests.


def test_pallas_warm_start():
    """Warm-started solve from a previous lambda matches XLA."""
    n, S = 200, 32
    A, grad, slot_begin, slot_size, eigvals, eigvecs, pen = _problem(
        n, S, 0, 3, 0.05
    )
    f = jnp.float32
    beta0 = jnp.zeros(S, jnp.float32)
    act = jnp.zeros(S, bool)
    args0 = (A, grad, beta0, slot_begin, slot_size, eigvals, eigvecs, pen,
             act, f(0.05), f(1.0), f(1e-9), f(1e-12), f(1e-12),
             jnp.int32(1000), jnp.int32(100000), f(0.0))
    b1, g1, a1, r1, _, _ = pin_cov_solve(*args0)
    # continue to a smaller lambda from the warm state
    out_x = pin_cov_solve(A, g1, b1, slot_begin, slot_size, eigvals, eigvecs,
                          pen, a1, f(0.01), f(1.0), f(1e-9), f(1e-12),
                          f(1e-12), jnp.int32(1000), jnp.int32(100000), r1)
    valid = slot_size > 0
    out_p = pin_lasso_solve_pallas(
        A, g1, b1, eigvals[:, 0], valid, a1, pen,
        f(0.01), f(1.0), f(1e-9), f(1e-12), f(100000), r1, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out_x[0]), np.asarray(out_p[0]),
                               atol=2e-5)
    assert np.isclose(float(out_x[3]), float(out_p[3]), atol=1e-4)


def test_cd_sweep_rows_matches_numpy_gs():
    """The big-S row-DMA sweep kernel (interpret mode) reproduces a
    numpy Gauss-Seidel pass over the listed coordinates exactly,
    including the moved flags and the rsq/convg bookkeeping."""
    import jax.numpy as jnp

    from adelie_tpu.solver.pin_pallas import cd_sweep_rows_pallas

    rng = np.random.default_rng(0)
    S, C = 128, 40
    B = rng.standard_normal((100, S)).astype(np.float32) / 10
    A = (B.T @ B + np.eye(S, dtype=np.float32)).astype(np.float32)
    beta = rng.standard_normal(S).astype(np.float32) * 0.1
    grad = rng.standard_normal(S).astype(np.float32)
    pos = (np.arange(C) * 3 % S).astype(np.int32)
    n = 25
    akk = A[pos, pos].copy()
    pk = np.ones(C, np.float32)
    l1, l2, rsq0 = np.float32(0.3), np.float32(0.1), np.float32(0.25)

    b2, g2, moved, convg, rsq = cd_sweep_rows_pallas(
        jnp.asarray(A), jnp.asarray(beta), jnp.asarray(grad),
        jnp.asarray(pos), jnp.asarray(akk), jnp.asarray(pk),
        jnp.asarray(n, jnp.int32), jnp.asarray(l1), jnp.asarray(l2),
        jnp.asarray(rsq0), interpret=True)

    bn, gn, rq, cg = beta.copy(), grad.copy(), float(rsq0), 0.0
    mv = np.zeros(C, np.float32)
    for k in range(n):
        p = pos[k]
        u = gn[p] + akk[k] * bn[p]
        mag = max(abs(u) - l1 * pk[k], 0.0)
        den = akk[k] + l2 * pk[k]
        bnew = np.sign(u) * mag / den if den > 0 else bn[p]
        d = bnew - bn[p]
        rq += d * (2 * gn[p] - d * akk[k])
        gn = gn - d * A[p]
        bn[p] = bnew
        if d != 0:
            mv[k] = 1
        cg = max(cg, akk[k] * d * d)

    np.testing.assert_allclose(np.asarray(b2), bn, atol=2e-5)
    np.testing.assert_allclose(np.asarray(g2), gn, atol=2e-4)
    np.testing.assert_array_equal(np.asarray(moved), mv)
    assert np.isclose(float(convg), cg, rtol=1e-4)
    assert np.isclose(float(rsq), rq, rtol=1e-4)


def test_big_s_filtered_full_sweep_solution():
    """S past MAX_PALLAS_S switches pin_cov_solve's full screen sweeps to
    the filtered (vectorized-selection) formulation; the solution must
    still match the small-S exact-Gauss-Seidel solve at solver tol."""
    import jax.numpy as jnp

    from adelie_tpu.solver.pin import pin_cov_solve
    from adelie_tpu.solver.pin_pallas import MAX_PALLAS_S

    rng = np.random.default_rng(5)
    p = 96
    B = rng.standard_normal((200, p)).astype(np.float32) / 14
    A_small = (B.T @ B + 0.5 * np.eye(p, dtype=np.float32))
    grad = rng.standard_normal(p).astype(np.float32)

    def solve(S_cap):
        A = np.zeros((S_cap, S_cap), np.float32)
        A[:p, :p] = A_small
        g = np.zeros(S_cap, np.float32)
        g[:p] = grad
        f = jnp.float32
        sb = jnp.arange(S_cap, dtype=jnp.int32)
        ssz = jnp.asarray((np.arange(S_cap) < p).astype(np.int32))
        ev = jnp.asarray(
            np.where(np.arange(S_cap) < p, np.diag(A), 1.0)
            [:, None].astype(np.float32))
        evec = jnp.ones((S_cap, 1, 1), jnp.float32)
        pen = jnp.ones((S_cap,), jnp.float32)
        out = pin_cov_solve(
            jnp.asarray(A), jnp.asarray(g), jnp.zeros(S_cap, jnp.float32),
            sb, ssz, ev, evec, pen, jnp.zeros(S_cap, bool),
            f(0.2), f(1.0), f(1e-10), f(1e-14), f(1e-12),
            jnp.int32(1000), jnp.int32(100000), f(0.0))
        assert bool(out[5]), "pin solve must converge"
        return np.asarray(out[0])[:p]

    b_small = solve(128)                     # exact GS full sweeps
    b_big = solve(MAX_PALLAS_S + 1024)       # filtered full sweeps
    np.testing.assert_allclose(b_small, b_big, atol=5e-5)
