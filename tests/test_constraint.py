"""Constraint tests (reference tests/test_constraint.py).

The reference checks `solve` against cvxpy; here optimality is verified
directly through the KKT conditions of

    min 1/2 x' diag(quad) x - v'x + l1 ||x|| + l2/2 ||x||^2
    s.t.  lo <= A Q x <= hi

which exactly characterize the optimum (convex problem):
 * primal feasibility, dual sign feasibility, complementary slackness,
 * stationarity: diag(quad) x - v + l2 x + l1 s + (AQ)' mu = 0 with
   s = x/||x|| if x != 0, else ||v - (AQ)'mu|| <= l1.
"""

import numpy as np
import pytest

import adelie_tpu as ad
from adelie_tpu import constraint as ct


def _rand_block(d, seed, l1_scale=1.0):
    rng = np.random.default_rng(seed)
    quad = rng.uniform(0.5, 2.0, d)
    Q, _ = np.linalg.qr(rng.standard_normal((d, d)))
    v = rng.standard_normal(d)
    l1 = l1_scale * rng.uniform(0.1, 0.5)
    l2 = rng.uniform(0.0, 0.3)
    return quad, Q, v, l1, l2


def _check_kkt(cons, x, mu, quad, v, l1, l2, Q, tol=5e-6):
    A = np.asarray(cons.A_dense(), np.float64)
    lo, hi = cons.zbounds()
    P = A @ Q
    z = P @ x
    # primal feasibility
    assert np.all(z >= lo - tol), (z, lo)
    assert np.all(z <= hi + tol)
    # stationarity
    r = quad * x - v + l2 * x + P.T @ mu
    xn = np.linalg.norm(x)
    if xn > 1e-10:
        r = r + l1 * x / xn
        assert np.linalg.norm(r) <= tol * max(1.0, np.linalg.norm(v)), r
    else:
        assert np.linalg.norm(v - P.T @ mu) <= l1 + tol
    # dual feasibility + complementary slackness
    for i in range(len(mu)):
        if mu[i] > tol:
            assert z[i] >= hi[i] - 1e-4, (i, z[i], hi[i], mu[i])
        elif mu[i] < -tol:
            assert z[i] <= lo[i] + 1e-4, (i, z[i], lo[i], mu[i])


@pytest.mark.parametrize("d", [1, 2, 5])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_box_solve_kkt(d, seed):
    rng = np.random.default_rng(100 + seed)
    quad, Q, v, l1, l2 = _rand_block(d, seed)
    lower = -rng.uniform(0.01, 0.5, d)
    upper = rng.uniform(0.01, 0.5, d)
    cons = ct.box(lower, upper, configs={"tol": 1e-10})
    x, mu = cons.solve(np.zeros(d), quad, v, l1, l2, Q)
    _check_kkt(cons, x, mu, quad, v, l1, l2, Q)


@pytest.mark.parametrize("d", [2, 4])
@pytest.mark.parametrize("seed", [0, 1])
def test_one_sided_solve_kkt(d, seed):
    rng = np.random.default_rng(200 + seed)
    quad, Q, v, l1, l2 = _rand_block(d, seed)
    sgn = rng.choice([-1.0, 1.0], d)
    b = rng.uniform(0.0, 0.5, d)
    cons = ct.one_sided(sgn, b, configs={"tol": 1e-10})
    x, mu = cons.solve(np.zeros(d), quad, v, l1, l2, Q)
    A = np.asarray(cons.A_dense())
    z = A @ (Q @ x)
    assert np.all(z <= b + 5e-6)
    # one-sided: mu >= 0
    assert np.all(mu >= -5e-7)
    _check_kkt(cons, x, mu, quad, v, l1, l2, Q)


@pytest.mark.parametrize("m,d", [(3, 4), (6, 3)])
@pytest.mark.parametrize("seed", [0, 1])
def test_linear_solve_kkt(m, d, seed):
    rng = np.random.default_rng(300 + seed)
    quad, Q, v, l1, l2 = _rand_block(d, seed)
    A = rng.standard_normal((m, d))
    lower = -rng.uniform(0.05, 0.5, m)
    upper = rng.uniform(0.05, 0.5, m)
    cons = ct.linear(A, lower, upper, configs={"tol": 1e-10})
    x, mu = cons.solve(np.zeros(d), quad, v, l1, l2, Q)
    _check_kkt(cons, x, mu, quad, v, l1, l2, Q, tol=2e-5)


def test_solve_zero_box():
    d = 5
    rng = np.random.default_rng(0)
    v = rng.standard_normal(d)
    # zero bounds on some coordinates let duals absorb them
    lower = np.where(np.arange(d) % 2 == 0, 0.0, -1.0)
    upper = np.where(np.arange(d) % 2 == 0, 0.0, 1.0)
    cons = ct.box(lower, upper)
    norm = cons.solve_zero(v)
    # coordinates with zero box absorb v fully; others keep v
    expected = np.linalg.norm(v[np.arange(d) % 2 == 1])
    assert np.isclose(norm, expected), (norm, expected)


def test_solve_zero_linear_matches_box():
    """linear(A=I) must agree with box."""
    d = 4
    rng = np.random.default_rng(1)
    v = rng.standard_normal(d)
    lower = np.full(d, 0.0)
    upper = np.full(d, 0.0)
    c_box = ct.box(lower, upper)
    c_lin = ct.linear(np.eye(d), lower, upper)
    assert np.isclose(c_box.solve_zero(v), 0.0, atol=1e-10)
    assert np.isclose(c_lin.solve_zero(v), 0.0, atol=1e-7)

    lower2 = np.full(d, -1e-3)  # nearly-pinned box
    c_lin2 = ct.linear(np.eye(d), lower2, np.zeros(d))
    n2 = c_lin2.solve_zero(v)
    c_box2 = ct.box(lower2, np.zeros(d))
    n1 = c_box2.solve_zero(v)
    assert np.isclose(n1, n2, atol=1e-6)


def test_unconstrained_limit():
    """Huge box == unconstrained Newton solution."""
    from adelie_tpu.bcd import newton_solver
    import jax.numpy as jnp

    d = 4
    quad, Q, v, l1, l2 = _rand_block(d, 7)
    cons = ct.box(np.full(d, -1e5), np.full(d, 1e5), configs={"tol": 1e-12})
    x, mu = cons.solve(np.zeros(d), quad, v, l1, l2, Q)
    x_ref, _ = newton_solver(jnp.asarray(quad), jnp.asarray(v), l1, l2)
    assert np.allclose(x, np.asarray(x_ref), atol=1e-7)
    assert np.allclose(mu, 0.0, atol=1e-7)


def test_project():
    d = 3
    cons = ct.box(np.full(d, -0.5), np.full(d, 0.25))
    x = np.array([-1.0, 0.1, 2.0])
    assert np.allclose(cons.project(x), [-0.5, 0.1, 0.25])
    c2 = ct.upper(np.full(d, 0.3))
    assert np.allclose(c2.project(x), [-1.0, 0.1, 0.3])
