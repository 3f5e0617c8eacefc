"""Central option/enum layer (reference util/types.hpp:12-100): string knobs
fail fast at entry with the full valid list, not deep inside a solve."""

import numpy as np
import pytest

import adelie_tpu as ad
from adelie_tpu.utils import types


def test_option_basic():
    assert types.screen_rule("pivot") == "pivot"
    assert "strong" in types.screen_rule
    assert sorted(types.screen_rule) == ["pivot", "strong"]
    with pytest.raises(ValueError, match=r"screen_rule must be one of.*pivto"):
        types.screen_rule("pivto")
    with pytest.raises(ValueError, match="screen_rule must be one of"):
        types.screen_rule(None)


def test_read_mode_alias():
    assert types.read_mode("auto") == "mmap"
    assert types.read_mode("file") == "file"


def _toy():
    rng = np.random.default_rng(0)
    X = rng.standard_normal((40, 8))
    y = X @ rng.standard_normal(8)
    return X, y


def test_grpnet_rejects_bad_screen_rule_at_entry():
    X, y = _toy()
    with pytest.raises(ValueError, match="screen_rule must be one of"):
        ad.grpnet(X, ad.glm.gaussian(y), screen_rule="pivo", progress_bar=False)


def test_gaussian_cov_rejects_bad_screen_rule():
    X, y = _toy()
    A = X.T @ X
    v = X.T @ y
    with pytest.raises(ValueError, match="screen_rule must be one of"):
        ad.solver.gaussian_cov(
            ad.matrix.dense(A, method="cov"), v, screen_rule="pivo",
        )


def test_bcd_solver_rejects_unknown():
    with pytest.raises(ValueError, match="solver must be one of"):
        ad.bcd.solve(quad=np.ones(3), linear=np.ones(3), l1=0.1, l2=0.0,
                     solver="nwton")


def test_cox_tie_method_rejects_unknown():
    with pytest.raises(ValueError, match="tie_method must be one of"):
        ad.glm.cox(
            start=np.zeros(4), stop=np.arange(1.0, 5.0),
            status=np.ones(4), tie_method="effron",
        )


def test_binomial_link_rejects_unknown():
    with pytest.raises(ValueError, match="link must be one of"):
        ad.glm.binomial(np.zeros(4), link="cloglog")


def test_constraint_method_rejects_unknown():
    with pytest.raises(ValueError, match="method must be one of"):
        ad.constraint.box(lower=-np.ones(2), upper=np.ones(2), method="pn")


def test_css_rejects_unknown_loss_and_method():
    S = np.eye(4)
    with pytest.raises(ValueError, match="loss must be one of"):
        ad.solver.css_cov(S, subset_size=2, loss="leastsq")
    with pytest.raises(ValueError, match="method must be one of"):
        ad.solver.css_cov(S, subset_size=2, method="gredy")


def test_matrix_method_rejects_unknown():
    with pytest.raises(ValueError, match="method must be one of"):
        ad.matrix.dense(np.eye(3), method="navie")
