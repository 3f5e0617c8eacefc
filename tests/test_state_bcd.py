"""State factories + BCD solver-variant tests (reference tests/test_state.py
and test_bcd.py solver coverage)."""

import numpy as np
import pytest

import adelie_tpu as ad
from adelie_tpu import bcd, state


def _data(n=80, p=10, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.standard_normal((n, p))
    y = X[:, 0] - 0.5 * X[:, 3] + 0.1 * rng.standard_normal(n)
    return X, y


def test_state_gaussian_naive():
    X, y = _data()
    st = state.gaussian_naive(X=X, y=y, lmda_path_size=8, min_ratio=0.1)
    result = st.solve()
    assert result.error == ""
    assert len(result.lmdas) >= 3
    # invariant audit passes
    assert state.check_state(result, method="log") == []


def test_state_glm_naive():
    X, y = _data(seed=1)
    ybin = (y > 0).astype(float)
    st = state.glm_naive(X=X, glm=ad.glm.binomial(ybin), lmda_path_size=6,
                         min_ratio=0.1)
    result = st.solve()
    assert result.error == ""
    assert state.check_state(result, method="log") == []


def test_state_gaussian_cov():
    X, y = _data(seed=2)
    Xc = X - X.mean(0)
    yc = y - y.mean()
    n = len(y)
    st = state.gaussian_cov(A=Xc.T @ Xc / n, v=Xc.T @ yc / n,
                            lmda_path_size=6)
    result = st.solve()
    assert result.error == ""


def test_check_state_catches_corruption():
    X, y = _data(seed=3)
    result = state.gaussian_naive(X=X, y=y, lmda_path_size=5,
                                  min_ratio=0.1).solve()
    result.screen_begins = np.asarray(result.screen_begins) + 1
    with pytest.raises(AssertionError):
        state.check_state(result)


@pytest.mark.parametrize("solver", [
    "newton", "newton_abs", "newton_brent", "brent",
    "ista", "fista", "fista_adares",
])
def test_bcd_solver_variants(solver):
    rng = np.random.default_rng(4)
    q = 6
    quad = rng.uniform(0.5, 2.0, q)
    linear = rng.standard_normal(q)
    l1, l2 = 0.3, 0.1
    out = bcd.solve(quad=quad, linear=linear, l1=l1, l2=l2, solver=solver,
                    tol=1e-14, max_iters=100000)
    beta = out["beta"]
    # verify against the objective: compare with the newton reference
    ref = bcd.solve(quad=quad, linear=linear, l1=l1, l2=l2,
                    solver="newton_abs")["beta"]
    obj = lambda b: bcd.objective(b, quad=quad, linear=linear, l1=l1, l2=l2)
    assert np.allclose(beta, ref, atol=1e-5) or obj(beta) <= obj(ref) + 1e-9


def test_bcd_unknown_solver():
    with pytest.raises(ValueError):
        bcd.solve(quad=np.ones(2), linear=np.ones(2), l1=0.1, l2=0.0,
                  solver="bogus")


def test_save_load_warm_start(tmp_path):
    """Checkpoint to disk, resume the path in a 'new process' state."""
    X, y = _data(n=100, p=12, seed=9)
    st = ad.grpnet(X, ad.glm.gaussian(y), lmda_path_size=6, min_ratio=0.2,
                   progress_bar=False, early_exit=False)
    f = str(tmp_path / "ckpt.npz")
    state.save_state(st, f)

    ws = state.load_warm_start(f)
    ext = st.lmdas[-1] * np.array([0.5, 0.25])
    st2 = ad.grpnet(X, ad.glm.gaussian(y), warm_start=ws, lmda_path=ext,
                    progress_bar=False, early_exit=False)
    assert st2.error == ""
    # continuing from scratch down the concatenated path must agree
    full = np.concatenate([st.lmdas, ext])
    st3 = ad.grpnet(X, ad.glm.gaussian(y), lmda_path=full,
                    progress_bar=False, early_exit=False)
    B2 = np.asarray(st2.betas.todense())
    B3 = np.asarray(st3.betas.todense())[-2:]
    np.testing.assert_allclose(B2, B3, atol=1e-8)


class TestPinStates:
    """Real pin-solver states over FIXED screen sets (VERDICT r1 #7;
    reference state.py:1677 gaussian_pin_naive, StateGaussianPinCov)."""

    def _data(self):
        rng = np.random.default_rng(0)
        n, p = 200, 30
        X = rng.standard_normal((n, p))
        y = X[:, :4] @ [1.0, -1.0, 0.5, 0.3] + 0.1 * rng.standard_normal(n)
        return X, y

    def test_pin_naive_matches_full_fit(self):
        X, y = self._data()
        full = ad.grpnet(X, ad.glm.gaussian(y), lmda_path_size=8,
                         min_ratio=0.1, progress_bar=False, tol=1e-12,
                         early_exit=False)
        B_full = np.asarray(full.betas.todense())

        # all-groups pin == path solve
        ps = ad.state.gaussian_pin_naive(
            X=X, y=y, lmda_path=np.asarray(full.lmdas), tol=1e-12
        )
        out = ps.solve()
        np.testing.assert_allclose(
            np.asarray(out.betas.todense()), B_full, atol=1e-8
        )
        np.testing.assert_allclose(out.intercepts, full.intercepts,
                                   atol=1e-8)

        # arbitrary FIXED superset of the support == path solve, and the
        # off-screen columns stay exactly zero
        support = np.unique(np.nonzero(B_full)[1])
        screen = np.unique(np.concatenate([support, [14, 20]]))
        ps2 = ad.state.gaussian_pin_naive(
            X=X, y=y, screen_set=screen,
            lmda_path=np.asarray(full.lmdas), tol=1e-12,
        )
        out2 = ps2.solve()
        ad.state.check_state(out2)
        np.testing.assert_allclose(
            np.asarray(out2.betas.todense()), B_full, atol=1e-8
        )

    def test_pin_naive_warm_resid_input(self):
        """The pin state accepts an arbitrary warm (resid, screen_beta)
        pair whose invariant the caller maintains."""
        X, y = self._data()
        n = X.shape[0]
        lmda_path = np.array([0.5, 0.2, 0.1])
        cold = ad.state.gaussian_pin_naive(
            X=X, y=y, screen_set=np.arange(10), lmda_path=lmda_path,
            tol=1e-12,
        ).solve()

        # warm: start from the cold fit's first solution
        beta0 = np.asarray(cold.betas.todense())[0, :10]
        yc = y - y.mean()
        resid = yc - X[:, :10] @ beta0
        warm = ad.state.gaussian_pin_naive(
            X=X, y=y, screen_set=np.arange(10), lmda_path=lmda_path,
            screen_beta=beta0, resid=resid, tol=1e-12,
        ).solve()
        np.testing.assert_allclose(
            np.asarray(warm.betas.todense()),
            np.asarray(cold.betas.todense()), atol=1e-8,
        )

    def test_pin_cov_matches_pin_naive(self):
        X, y = self._data()
        n = X.shape[0]
        Xc = X - X.mean(0)
        yc = y - y.mean()
        lmda_path = np.array([0.3, 0.1, 0.05])
        A = Xc.T @ Xc / n
        v = Xc.T @ yc / n
        outc = ad.state.gaussian_pin_cov(
            A=A, v=v, lmda_path=lmda_path, tol=1e-12
        ).solve()
        outn = ad.state.gaussian_pin_naive(
            X=Xc, y=yc, lmda_path=lmda_path, tol=1e-12, intercept=False
        ).solve()
        np.testing.assert_allclose(
            np.asarray(outc.betas.todense()),
            np.asarray(outn.betas.todense()), atol=1e-7,
        )


def test_check_state_before_and_after_solve():
    """check() runs on warm-start states before and after solves
    (reference tests/test_solver.py:474-480 pattern)."""
    rng = np.random.default_rng(5)
    n, p = 150, 20
    X = rng.standard_normal((n, p))
    y = X[:, 0] - X[:, 1] + 0.1 * rng.standard_normal(n)

    st = ad.grpnet(X, ad.glm.gaussian(y), lmda_path_size=6, min_ratio=0.2,
                   progress_bar=False)
    assert ad.state.check_state(st) == []
    # warm-start continuation re-checks cleanly
    st2 = ad.grpnet(X, ad.glm.gaussian(y),
                    lmda_path=np.asarray(st.lmdas) * 0.5, warm_start=st,
                    progress_bar=False)
    assert ad.state.check_state(st2) == []

    # a corrupted state is caught
    st2.screen_begins = st2.screen_begins + 1
    import pytest as _pytest

    with _pytest.raises(AssertionError, match="screen_begins"):
        ad.state.check_state(st2)


def test_check_state_catches_corruptions():
    rng = np.random.default_rng(6)
    X = rng.standard_normal((80, 10))
    y = X[:, 0] + 0.1 * rng.standard_normal(80)
    st = ad.grpnet(X, ad.glm.gaussian(y), lmda_path_size=4, min_ratio=0.3,
                   progress_bar=False)

    import copy
    import pytest as _pytest

    for field, bad, msg in [
        ("penalty", -np.ones(10), "penalty"),
        ("alpha", 1.5, "alpha"),
        ("screen_beta", np.full_like(st.screen_beta, np.nan), "finite"),
        ("abs_grad", np.full(10, -1.0), "abs_grad"),
    ]:
        st_bad = copy.copy(st)
        setattr(st_bad, field, bad)
        with _pytest.raises(AssertionError, match=msg):
            ad.state.check_state(st_bad)


def test_abs_grad_kernel_padded_slot_does_not_race_column0():
    """Padded screen slots (cols_padded == -1) must be DROPPED, not clamped
    to column 0: with a real slot mapping to column 0 and alpha < 1, a
    clamped scatter makes the padding race column 0's beta (XLA scatter
    order with duplicate indices is undefined)."""
    import jax.numpy as jnp

    from adelie_tpu.solver.state_core import abs_grad_kernel

    p, G = 6, 3
    grad = np.arange(1.0, p + 1.0)
    group_ids = np.repeat(np.arange(G), 2)
    penalty_cols = np.ones(p)
    l2 = 0.4  # (1 - alpha) * lmda
    # screen slots: col 0 (beta=2.0) and col 3 (beta=-1.0) + 2 padded slots
    cols_padded = np.array([0, 3, -1, -1], np.int32)
    beta_padded = np.array([2.0, -1.0, 123.0, -456.0])  # garbage in padding

    got = np.asarray(abs_grad_kernel(
        jnp.asarray(grad), jnp.asarray(cols_padded),
        jnp.asarray(beta_padded), jnp.asarray(penalty_cols),
        jnp.asarray(group_ids), jnp.asarray(l2), G,
    ))

    beta_full = np.zeros(p)
    beta_full[0] = 2.0
    beta_full[3] = -1.0
    gadj = grad - l2 * penalty_cols * beta_full
    want = np.sqrt(np.add.reduceat(gadj * gadj, [0, 2, 4]))
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_check_state_catches_corruption_in_every_factory():
    """VERDICT r3 #9 'done' bar: a deliberately corrupted state from each
    of the 10 public state factories is caught by check_state."""
    import copy

    import pytest as _pytest

    rng = np.random.default_rng(9)
    n, p = 120, 12
    X = rng.standard_normal((n, p))
    y = X[:, 0] - 0.5 * X[:, 1] + 0.1 * rng.standard_normal(n)
    Y = np.stack([y, -0.5 * y], axis=1)
    yb = (y > 0).astype(float)
    kw = dict(lmda_path_size=4, min_ratio=0.3)

    def corrupt(st, field, val):
        bad = copy.copy(st)
        setattr(bad, field, val)
        return bad

    cases = []

    st = ad.state.gaussian_naive(X=X, y=y, **kw).solve()
    cases.append((corrupt(st, "alpha", 2.0), "alpha"))

    st = ad.state.glm_naive(X=X, glm=ad.glm.binomial(yb), **kw).solve()
    cases.append((corrupt(st, "screen_begins",
                          np.asarray(st.screen_begins) + 1),
                  "screen_begins"))

    A = X.T @ (X / n)
    v = X.T @ (y / n)
    st = ad.state.gaussian_cov(A=A, v=v, **kw).solve()
    cases.append((corrupt(st, "penalty", -np.ones(len(st.penalty))),
                  "penalty"))

    st = ad.state.multigaussian_naive(X=X, y=Y, **kw).solve()
    n_sols = len(st.lmdas)
    cases.append((corrupt(st, "devs",
                          np.linspace(0.9, 0.1, n_sols)),
                  "nondecreasing"))

    st = ad.state.multiglm_naive(
        X=X, glm=ad.glm.multinomial(np.stack([yb, 1 - yb], axis=1)),
        **kw).solve()
    cases.append((corrupt(st, "lmdas", np.sort(np.asarray(st.lmdas))),
                  "decreasing"))

    lo, hi = np.full(p, -0.5), np.full(p, 0.5)
    st = ad.state.bvls(X=X, y=y, lower=lo, upper=hi).solve()
    cases.append((corrupt(st, "beta", np.full(p, 2.0)), "bounds"))

    m, d = 6, 5
    Am = rng.standard_normal((m, d))
    B = rng.standard_normal((d, 2 * d))
    S = B @ B.T / (2 * d)
    st = ad.state.pinball(A=Am, S=S, v=rng.standard_normal(d),
                          penalty_neg=np.full(m, 0.3),
                          penalty_pos=np.full(m, 0.3)).solve()
    cases.append((corrupt(st, "grad", np.full_like(st.grad, np.nan)),
                  "finite"))

    st = ad.state.css_cov(S=S, subset_size=2).solve()
    cases.append((corrupt(st, "subset",
                          np.zeros(len(st.subset), int)),
                  "unique"))

    full = ad.grpnet(X, ad.glm.gaussian(y), **kw)
    ps = ad.state.gaussian_pin_naive(
        X=X, y=y, lmda_path=np.asarray(full.lmdas))
    st = ps.solve()
    cases.append((corrupt(st, "screen_beta",
                          np.full_like(st.screen_beta, np.nan)),
                  "finite"))

    ps = ad.state.gaussian_pin_cov(
        A=A, v=v, lmda_path=np.asarray(full.lmdas))
    st = ps.solve()
    # nonzero coefficients with the active flags wiped: the
    # screen/active consistency audit must fire
    assert np.any(np.asarray(st.screen_beta) != 0)
    cases.append((corrupt(st, "screen_is_active",
                          np.zeros(len(st.screen_is_active), bool)),
                  "active"))

    assert len(cases) == 10
    for bad, match in cases:
        with _pytest.raises(AssertionError, match=match):
            ad.state.check_state(bad)


def test_check_state_new_audits_pass_and_fire():
    """The round-4 audits (duals, benchmark shapes, screen_sizes
    monotonicity) accept a real constrained fit and catch corruption."""
    import copy

    import pytest as _pytest

    from adelie_tpu import constraint as ct

    rng = np.random.default_rng(10)
    n, p, q = 150, 12, 3
    X = rng.standard_normal((n, p))
    y = X[:, 0] - X[:, 1] + 0.1 * rng.standard_normal(n)
    groups = np.arange(0, p, q)
    cons = [ct.box(np.full(q, -0.2), np.full(q, 0.2)) for _ in groups]
    st = ad.grpnet(X, ad.glm.gaussian(y), groups=groups, constraints=cons,
                   lmda_path_size=5, min_ratio=0.1, progress_bar=False)
    assert st.error == ""
    assert ad.state.check_state(st) == []

    bad = copy.copy(st)
    bad.duals = st.duals[:-1]
    with _pytest.raises(AssertionError, match="duals"):
        ad.state.check_state(bad)

    bad = copy.copy(st)
    bad.duals = [{**d, 0: np.zeros(7)} for d in st.duals]
    with _pytest.raises(AssertionError, match="dual"):
        ad.state.check_state(bad)

    bad = copy.copy(st)
    bad.screen_sizes = list(st.screen_sizes)[::-1] \
        if len(set(st.screen_sizes)) > 1 else [3] + [1] * (len(st.lmdas) - 1)
    with _pytest.raises(AssertionError, match="screen_sizes"):
        ad.state.check_state(bad)

    bad = copy.copy(st)
    bad.benchmark = dict(st.benchmark)
    bad.benchmark["kkt"] = [-1.0]
    with _pytest.raises(AssertionError, match="benchmark"):
        ad.state.check_state(bad)
