"""Matrix classes vs dense numpy ground truth (reference tests/test_matrix.py:
for each class, build the equivalent dense ndarray and check every interface
method)."""

import numpy as np
import pytest

import adelie_tpu as ad
from adelie_tpu import matrix as mx

ATOL = 1e-9


def run_suite(m, dense, seed=0):
    """Check mul/gather/tmul/sq_mul/cmul/bmul/btmul/cov/mean/var/sp_tmul
    against the dense equivalent."""
    rng = np.random.default_rng(seed)
    n, p = dense.shape
    assert (m.rows(), m.cols()) == (n, p)
    v = rng.standard_normal(n)
    w = np.abs(rng.standard_normal(n)) + 0.01
    w /= w.sum()
    beta = rng.standard_normal(p)

    np.testing.assert_allclose(np.asarray(m.mul(v, w)), dense.T @ (w * v), atol=ATOL)
    idx = rng.choice(p, min(p, 7), replace=False).astype(np.int32)
    np.testing.assert_allclose(np.asarray(m.gather(idx)), dense[:, idx], atol=ATOL)
    np.testing.assert_allclose(np.asarray(m.tmul(beta)), dense @ beta, atol=ATOL)
    np.testing.assert_allclose(
        np.asarray(m.sq_mul(w)), (dense * dense).T @ w, atol=ATOL
    )
    j = int(rng.integers(p))
    np.testing.assert_allclose(
        float(m.cmul(j, v, w)), dense[:, j] @ (w * v), atol=ATOL
    )
    q = int(rng.integers(1, min(p - j, 4) + 1))
    np.testing.assert_allclose(
        np.asarray(m.bmul(j, q, v, w)), dense[:, j:j + q].T @ (w * v), atol=ATOL
    )
    vq = rng.standard_normal(q)
    np.testing.assert_allclose(
        np.asarray(m.btmul(j, q, vq)), dense[:, j:j + q] @ vq, atol=ATOL
    )
    sw = np.sqrt(w)
    blk = dense[:, j:j + q] * sw[:, None]
    np.testing.assert_allclose(np.asarray(m.cov(j, q, sw)), blk.T @ blk, atol=ATOL)
    np.testing.assert_allclose(np.asarray(m.mean(w)), dense.T @ w, atol=ATOL)
    centers = dense.T @ w
    np.testing.assert_allclose(
        np.asarray(m.var(centers, w)),
        ((dense - centers) ** 2).T @ w,
        atol=1e-8,
    )
    # sp_tmul
    import scipy.sparse as sp

    B = rng.standard_normal((3, p)) * (rng.uniform(size=(3, p)) < 0.3)
    np.testing.assert_allclose(
        np.asarray(m.sp_tmul(sp.csr_matrix(B))), B @ dense.T, atol=ATOL
    )


@pytest.mark.parametrize("n,p", [(20, 8), (37, 17)])
def test_dense(n, p):
    rng = np.random.default_rng(0)
    Z = rng.standard_normal((n, p))
    run_suite(mx.dense(Z), Z)


def test_standardize():
    rng = np.random.default_rng(1)
    Z = rng.standard_normal((30, 9)) * 3 + 1
    m = mx.standardize(Z)
    c = Z.mean(axis=0)
    s = np.sqrt(((Z - c) ** 2).mean(axis=0))
    run_suite(m, (Z - c) / s)


def test_standardize_custom():
    rng = np.random.default_rng(2)
    Z = rng.standard_normal((25, 6))
    c = rng.standard_normal(6)
    s = np.abs(rng.standard_normal(6)) + 0.5
    m = mx.standardize(Z, centers=c, scales=s)
    run_suite(m, (Z - c) / s)


def test_subset_cols():
    rng = np.random.default_rng(3)
    Z = rng.standard_normal((22, 11))
    idx = np.array([3, 1, 7, 7, 0])
    run_suite(mx.subset(Z, idx, axis=1), Z[:, idx])


def test_subset_rows():
    rng = np.random.default_rng(4)
    Z = rng.standard_normal((25, 7))
    idx = np.array([2, 5, 19, 11, 3, 0, 7, 8])
    run_suite(mx.subset(Z, idx, axis=0), Z[idx])


def test_concatenate_cols():
    rng = np.random.default_rng(5)
    Zs = [rng.standard_normal((18, k)) for k in (3, 5, 2)]
    run_suite(mx.concatenate(Zs, axis=1), np.concatenate(Zs, axis=1))


def test_concatenate_rows():
    rng = np.random.default_rng(6)
    Zs = [rng.standard_normal((k, 6)) for k in (5, 9, 4)]
    run_suite(mx.concatenate(Zs, axis=0), np.concatenate(Zs, axis=0))


def test_block_diag():
    rng = np.random.default_rng(7)
    Zs = [rng.standard_normal((5, 3)), rng.standard_normal((7, 4)),
          rng.standard_normal((4, 2))]
    import scipy.linalg

    run_suite(mx.block_diag(Zs), scipy.linalg.block_diag(*Zs))


def test_kronecker_eye():
    rng = np.random.default_rng(8)
    Z = rng.standard_normal((9, 4))
    K = 3
    run_suite(mx.kronecker_eye(Z, K), np.kron(Z, np.eye(K)))


def test_nested_composition():
    rng = np.random.default_rng(9)
    Z = rng.standard_normal((14, 5))
    m = mx.standardize(mx.subset(Z, np.array([4, 2, 0]), axis=1))
    sub = Z[:, [4, 2, 0]]
    c = sub.mean(axis=0)
    s = np.sqrt(((sub - c) ** 2).mean(axis=0))
    run_suite(m, (sub - c) / s)


def test_cov_dense_and_lazy():
    rng = np.random.default_rng(10)
    X = rng.standard_normal((30, 8))
    A = X.T @ X
    for m in (mx.dense(A, method="cov"), mx.lazy_cov(X)):
        r = np.array([1, 3, 5])
        c = np.array([0, 2])
        np.testing.assert_allclose(
            np.asarray(m.block(r, c)), A[np.ix_(r, c)], atol=1e-8
        )
        vals = rng.standard_normal(2)
        np.testing.assert_allclose(
            np.asarray(m.mul(c, vals)), A[:, c] @ vals, atol=1e-8
        )


def test_cov_block_diag():
    rng = np.random.default_rng(11)
    As = [rng.standard_normal((k, k)) for k in (3, 4, 2)]
    As = [a @ a.T for a in As]
    import scipy.linalg

    A = scipy.linalg.block_diag(*As)
    m = mx.block_diag([mx.dense(a, method="cov") for a in As], method="cov")
    r = np.array([0, 2, 4, 7])
    np.testing.assert_allclose(np.asarray(m.block(r, r)), A[np.ix_(r, r)], atol=1e-9)
    # mul with indices within one block
    idx = np.array([3, 4])
    v = rng.standard_normal(2)
    np.testing.assert_allclose(np.asarray(m.mul(idx, v)), A[:, idx] @ v, atol=1e-9)
