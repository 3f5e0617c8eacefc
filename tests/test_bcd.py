"""BCD block-update solver tests (reference tests/test_bcd.py patterns:
root bounds bracket the root, root_function at solution ~ 0, solver
variants agree with brute force)."""

import numpy as np
import pytest

import adelie_tpu as ad
from adelie_tpu import bcd


def _make_problem(p, seed, l1_scale=0.5):
    rng = np.random.default_rng(seed)
    quad = np.abs(rng.standard_normal(p)) + 0.1
    linear = rng.standard_normal(p) * 2
    l1 = l1_scale * np.linalg.norm(linear)
    return quad, linear, l1


@pytest.mark.parametrize("p", [1, 3, 10, 50])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_root_bounds_bracket(p, seed):
    quad, linear, l1 = _make_problem(p, seed)
    lower = bcd.root_lower_bound(quad=quad, linear=linear, l1=l1)
    upper = bcd.root_upper_bound(quad=quad, linear=linear, l1=l1)
    assert lower >= 0
    assert bcd.root_function(lower, quad=quad, linear=linear, l1=l1) >= -1e-10
    if upper > lower:
        assert bcd.root_function(upper, quad=quad, linear=linear, l1=l1) <= 1e-10


@pytest.mark.parametrize("p", [1, 2, 7, 30])
@pytest.mark.parametrize("seed", [0, 3])
@pytest.mark.parametrize("l2", [0.0, 0.4])
def test_solve_kkt(p, seed, l2):
    """Solution satisfies the exact stationarity condition."""
    quad, linear, l1 = _make_problem(p, seed)
    out = bcd.solve(quad=quad, linear=linear, l1=l1, l2=l2)
    x = out["beta"]
    nrm = np.linalg.norm(x)
    assert nrm > 0  # ||v|| > l1 by construction
    # stationarity: (quad + l2 + l1/||x||) x = linear
    resid = (quad + l2 + l1 / nrm) * x - linear
    assert np.abs(resid).max() < 1e-7 * max(1.0, np.abs(linear).max())


def test_solve_zero():
    quad = np.array([1.0, 2.0])
    linear = np.array([0.1, -0.1])
    out = bcd.solve(quad=quad, linear=linear, l1=10.0, l2=0.0)
    assert np.all(out["beta"] == 0)


def test_solve_ridge_closed_form():
    quad = np.array([1.0, 2.0, 3.0])
    linear = np.array([1.0, -2.0, 0.5])
    out = bcd.solve(quad=quad, linear=linear, l1=0.0, l2=0.5)
    np.testing.assert_allclose(out["beta"], linear / (quad + 0.5), rtol=1e-12)


def test_soft_threshold_scalar():
    """q=1 reduces to soft thresholding."""
    out = bcd.solve(quad=np.array([2.0]), linear=np.array([3.0]), l1=1.0, l2=0.5)
    np.testing.assert_allclose(out["beta"], [(3.0 - 1.0) / 2.5], rtol=1e-9)


@pytest.mark.parametrize("seed", range(5))
def test_objective_dominance_vs_grid(seed):
    """Objective at solution beats a dense grid of candidates."""
    quad, linear, l1 = _make_problem(5, seed)
    l2 = 0.3
    out = bcd.solve(quad=quad, linear=linear, l1=l1, l2=l2)
    obj_star = bcd.objective(out["beta"], quad=quad, linear=linear, l1=l1, l2=l2)
    rng = np.random.default_rng(seed + 100)
    for _ in range(200):
        cand = out["beta"] + 0.1 * rng.standard_normal(5)
        obj_c = bcd.objective(cand, quad=quad, linear=linear, l1=l1, l2=l2)
        assert obj_star <= obj_c + 1e-10


@pytest.mark.parametrize("seed", range(8))
def test_solver_variants_agree(seed):
    """newton / newton_abs / newton_brent / brent are DISTINCT root
    strategies (reference newton.hpp:124,213,155; brent.hpp:11) that must
    agree on the solution and satisfy the root-function identity."""
    rng = np.random.default_rng(seed)
    q = int(rng.integers(1, 10))
    quad = np.abs(rng.standard_normal(q)) * rng.choice([0, 1, 1, 1], q)
    linear = rng.standard_normal(q)
    l1 = abs(rng.standard_normal()) * 0.5
    l2 = abs(rng.standard_normal()) * 0.1
    sols = {}
    for m in ["newton", "newton_abs", "newton_brent", "brent"]:
        out = bcd.solve(quad=quad, linear=linear, l1=l1, l2=l2,
                        tol=1e-14, max_iters=10000, solver=m)
        sols[m] = out["beta"]
        h = np.linalg.norm(out["beta"])
        if h > 0:
            phi = bcd.root_function(h, quad=quad + l2, linear=linear, l1=l1)
            assert abs(phi) < 1e-6, (m, phi)
    ref = sols["newton_abs"]
    for m, x in sols.items():
        np.testing.assert_allclose(x, ref, atol=1e-7, err_msg=m)


def test_optimization_brent_scalar():
    """optimization.brent/bisect mirrors reference bisect.hpp:12-103."""
    from adelie_tpu import optimization as opt

    sol, iters = opt.brent(lambda x: x**3 - 2.0, 0.0, 2.0)
    assert abs(sol - 2.0 ** (1.0 / 3.0)) < 1e-9
    assert iters < 100
    sol2, _ = opt.bisect(lambda x: np.cos(x) - x, 0.0, 1.0)
    assert abs(np.cos(sol2) - sol2) < 1e-9
