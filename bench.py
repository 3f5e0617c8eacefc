"""Headline benchmark: full lambda-path gaussian lasso fit (BASELINE.json
config 1 scaled up), run on whatever accelerator jax.devices() offers.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

``vs_baseline`` compares against a single-thread numpy coordinate-descent
reference timing measured in-process (a stand-in for adelie's C++ CD at
one thread; the reference repo publishes no absolute numbers — see
BASELINE.md), so >1 means faster than the CPU baseline.
"""

import json
import time

import numpy as np


def _numpy_cd_lasso_path(X, y, lmdas, tol=1e-7, max_iters=100000):
    """Simple dense numpy coordinate descent (baseline stand-in)."""
    n, p = X.shape
    w = 1.0 / n
    beta = np.zeros(p)
    ym = y.mean()
    yc = y - ym
    resid = yc.copy()
    col_sq = (X * X).sum(axis=0) * w
    t0 = time.perf_counter()
    iters = 0
    for lmda in lmdas:
        for it in range(max_iters):
            max_delta = 0.0
            for j in range(p):
                gj = X[:, j] @ resid * w + col_sq[j] * beta[j]
                bj = np.sign(gj) * max(abs(gj) - lmda, 0.0) / col_sq[j]
                d = bj - beta[j]
                if d != 0.0:
                    resid -= d * X[:, j]
                    beta[j] = bj
                    max_delta = max(max_delta, col_sq[j] * d * d)
            iters += 1
            if max_delta < tol:
                break
    return time.perf_counter() - t0, iters


def main():
    import adelie_tpu as ad

    n, p = 2000, 500
    rng = np.random.default_rng(0)
    X = rng.standard_normal((n, p)).astype(np.float32)
    beta = np.zeros(p)
    nz = rng.choice(p, 20, replace=False)
    beta[nz] = rng.standard_normal(20)
    y = (X @ beta + 0.5 * rng.standard_normal(n)).astype(np.float32)

    glm = ad.glm.gaussian(y)

    # warm-up (compile): identical path so the timed run is steady-state
    ad.grpnet(X, glm, lmda_path_size=100, min_ratio=1e-2, progress_bar=False)

    t0 = time.perf_counter()
    state = ad.grpnet(X, glm, lmda_path_size=100, min_ratio=1e-2,
                      progress_bar=False)
    ours = time.perf_counter() - t0
    assert state.error == "", state.error
    n_sols = len(state.lmdas)

    # numpy single-thread CD baseline on the same resolved path
    base_time, base_iters = _numpy_cd_lasso_path(
        X.astype(np.float64), y.astype(np.float64), state.lmdas
    )

    print(json.dumps({
        "metric": f"gaussian lasso full-path fit n={n} p={p} ({n_sols} lambdas)",
        "value": round(ours, 4),
        "unit": "s",
        "vs_baseline": round(base_time / ours, 3),
    }))


if __name__ == "__main__":
    main()
