"""Public-API name parity with the reference package.

Every public name a reference user can reach (``adelie.<mod>.<name>``)
must resolve on ``adelie_tpu.<mod>`` too, so switching frameworks is a
package-name change.  Also exercises the numpy-style matrix sugar the
reference layers on its Python bases (reference matrix.py:40-196).
"""

import ast
import os

import numpy as np
import pytest

import adelie_tpu as ad

REF_DIR = "/root/reference/adelie"

MODULES = [
    "bcd", "configs", "constraint", "cv", "data", "diagnostic", "glm",
    "io", "matrix", "optimization", "sklearn", "solver", "state",
]


def _public_defs(path):
    tree = ast.parse(open(path).read())
    names = set()
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.ClassDef)) \
                and not node.name.startswith("_"):
            names.add(node.name)
        elif isinstance(node, ast.Assign):
            for t in node.targets:
                if isinstance(t, ast.Name) and not t.id.startswith("_"):
                    names.add(t.id)
    return names


@pytest.mark.skipif(not os.path.isdir(REF_DIR),
                    reason="reference checkout not present")
@pytest.mark.parametrize("mod", MODULES + ["__init__"])
def test_every_reference_public_name_resolves(mod):
    path = os.path.join(REF_DIR, f"{mod}.py")
    target = ad if mod == "__init__" else getattr(ad, mod)
    missing = sorted(n for n in _public_defs(path) if not hasattr(target, n))
    assert not missing, f"adelie_tpu.{mod} missing reference names: {missing}"


def test_matrix_transpose_view():
    rng = np.random.default_rng(0)
    X = rng.standard_normal((30, 9))
    M = ad.matrix.dense(X, dtype=np.float64)
    v = rng.standard_normal(30)
    V = rng.standard_normal((30, 4))
    np.testing.assert_allclose(M.T @ v, X.T @ v, atol=1e-10)
    np.testing.assert_allclose(M.T @ V, X.T @ V, atol=1e-10)
    assert M.T.shape == (9, 30)
    assert M.T.T is M
    with pytest.raises(ValueError):
        M.T @ rng.standard_normal((2, 2, 2))


def test_state_render_helpers():
    import adelie_tpu.constraint as ct

    box = ct.box(lower=-np.ones(2), upper=np.ones(2))
    cons = ad.state.render_constraints(4, [box, None])
    assert len(cons) == 4 and cons[:2] == [None, None] and cons[2] is box
    with pytest.raises(ValueError):
        ad.state.render_constraints(1, [box, None])

    dg = ad.state.render_dual_groups([None, box, None, box])
    np.testing.assert_array_equal(dg, [0, 0, box.duals(), box.duals()])

    cons2, begins = ad.state.deduce_states(
        constraints=[box, None],
        group_sizes=np.array([2, 3]),
        screen_set=np.array([1, 0]),
    )
    np.testing.assert_array_equal(begins, [0, 3])
    assert cons2[0] is box and cons2[1] is None


def test_reference_alias_names():
    assert ad.glm.glm_base is ad.glm.GlmBase
    assert ad.glm.multiglm_base is ad.glm.GlmMultiBase
    assert ad.matrix.PyMatrixNaiveBase is ad.matrix.MatrixNaiveBase
    assert ad.state.base is ad.state.gaussian_naive_base


def test_data_simulators_reference_kwargs():
    d = ad.data.snp_unphased(60, 25, K=3, glm="multinomial",
                             zero_penalty=0.2, seed=1)
    assert d["glm"].is_multi and d["beta"].shape == (25, 3)
    assert (d["penalty"] == 0).sum() >= 1
    np.testing.assert_allclose(np.linalg.norm(d["penalty"]) ** 2, 25, rtol=1e-9)

    d2 = ad.data.snp_unphased(60, 25, glm="binomial", seed=2)
    assert set(np.unique(d2["y"])) <= {0.0, 1.0}

    d3 = ad.data.snp_phased_ancestry(40, 10, 3, K=2, glm="multigaussian",
                                     zero_penalty=0.3, seed=3)
    assert d3["glm"].is_multi
    np.testing.assert_array_equal(d3["groups"], np.arange(10) * 3)

    d4 = ad.data.snp_unphased(50, 20, glm="cox", seed=4)
    assert d4["glm"].name.startswith("cox")

    # copy kwarg accepted everywhere the reference accepts it
    X = np.random.default_rng(0).standard_normal((10, 4))
    ad.matrix.dense(X, copy=True)
    ad.matrix.lazy_cov(X.T @ X, copy=True)
    ad.matrix.kronecker_eye(X, 2, copy=True)
