"""Probe: where do screen_gram's cycles go on the real chip?

(Supersedes the r3 question-script probe_gram.py, folded here in r5:
the experiment matrix below is its question list plus the measured
answers.)

Measured v5e results (r4, this script), n=50000 S=1024, 105 GFLOP:

    gram_HIGHEST          2.92 ms   35.9 TF/s   (pure contraction)
    gram_DEFAULT          1.59 ms   66.2 TF/s   (1 bf16 pass)
    gram_X3               2.00 ms   52.3 TF/s   (3-pass algorithm)
    gram_X6               3.27 ms   32.1 TF/s   (6-pass algorithm)
    gram_wscale_HIGHEST   3.34 ms               (+ the Xs*w intermediate)
    screen_gram_xla_full  3.49 ms   30.1 TF/s   (+ means + outer)
    acc HIGHEST rel 3.3e-7 vs f64;  X3 rel 1.2e-5;  DEFAULT ~3e-4

Conclusions (VERDICT r3 #6 analysis):
1. ``Precision.HIGHEST`` lowers to the ~6-pass rate on this shape, so the
   true HIGHEST roof is 197/6 = 32.8 TF/s and screen_gram runs at ~92% of
   it — the old 44.6% figure divided by an unachievable 3-pass ceiling.
2. The accuracy-preserving headroom is the ~0.57 ms of w-scale/means HBM
   overhead (16% end-to-end).  A fused Pallas Gram kernel was built and
   validated (interpret mode) but Mosaic rejects ``precision=HIGHEST``
   inside ``dot_general`` (remote compile error; default precision is
   1-pass bf16, numerically unacceptable), and a manual in-kernel 6-pass
   split just re-pays the X6 compute XLA already achieves — so the kernel
   was dropped (git history: solver/_gram_pallas.py).
3. The real 1.7x lever is the X3 algorithm at 1.2e-5 relative error —
   exposed as ``configs.matmul_precision = "x3"`` (opt-in; the default
   stays "highest" for the solver's f64-calibrated tolerances).

Run on the real TPU:

    python -u benchmark/gram_probe.py
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _force(out):
    """Real d2h fetch: jax.block_until_ready returns early on the axon
    tunnel transport (see bench.py _force), so timings must gate on a
    device_get."""
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0])).ravel()[:1]


def _timeit(fn, reps=50, rounds=3):
    out = fn()
    _force(out)
    rtt = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        _force(fn())
        rtt = min(rtt, time.perf_counter() - t0)
    best = np.inf
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        _force(out)
        el = time.perf_counter() - t0
        best = min(best, max(el - rtt, 0.5 * el) / reps)
    return best


def _report(name, t, flops):
    print(f"{name:34s} {t * 1e3:8.3f} ms  {flops / t / 1e12:7.2f} TF/s",
          flush=True)


def main():
    rng = np.random.default_rng(1)
    n, S = 50_000, 1024
    print(f"gram probe n={n} S={S} on {jax.devices()[0].device_kind}",
          flush=True)
    X = jnp.asarray(rng.standard_normal((n, S)).astype(np.float32))
    w = jnp.full((n,), 1.0 / n, jnp.float32)
    flops = 2.0 * n * S * S
    P = jax.lax.Precision

    # (b) pure gram, no w-scale, per precision/algorithm
    for name, prec in [("HIGHEST", P.HIGHEST), ("DEFAULT", P.DEFAULT),
                       ("X3", "BF16_BF16_F32_X3"),
                       ("X6", "BF16_BF16_F32_X6")]:
        try:
            f = jax.jit(lambda A, p=prec: jax.lax.dot_general(
                A, A, (((0,), (0,)), ((), ())), precision=p))
            _report(f"gram_{name}", _timeit(lambda: f(X)), flops)
        except Exception as e:  # noqa: BLE001
            print(f"gram_{name} ERR {str(e)[:100]}", flush=True)

    # (a) with the w-scale (current screen_gram form), HIGHEST
    f = jax.jit(lambda A, v: jax.lax.dot_general(
        A, A * v[:, None], (((0,), (0,)), ((), ())), precision=P.HIGHEST))
    _report("gram_wscale_HIGHEST", _timeit(lambda: f(X, w)), flops)

    # the full current screen_gram (w-scale + means + outer)
    from adelie_tpu.solver.pin import screen_gram
    f = jax.jit(lambda A, v: screen_gram(A, v, True)[0])
    _report("screen_gram_xla_full", _timeit(lambda: f(X, w)), flops)

    # (c) the x3 opt-in through the public config knob
    from adelie_tpu.configs import set_configs
    set_configs("matmul_precision", "x3")
    jax.clear_caches()   # precision is baked at trace time (configs contract)
    try:
        f = jax.jit(lambda A, v: screen_gram(A, v, True)[0])
        _report("screen_gram_x3_full", _timeit(lambda: f(X, w)), flops)
    finally:
        set_configs("matmul_precision", None)
        jax.clear_caches()

    # square yardstick: the shape the '3-pass measured 47 TF/s' claim used
    M = jnp.asarray(rng.standard_normal((4096, 4096)).astype(np.float32))
    f = jax.jit(lambda A: jnp.matmul(A, A, precision=P.HIGHEST))
    _report("square4k_HIGHEST", _timeit(lambda: f(M), reps=20),
            2.0 * 4096 ** 3)

    # X3 accuracy at a host-checkable size (f64 truth on host)
    n2 = 8192
    X2 = np.asarray(rng.standard_normal((n2, S)).astype(np.float32))
    truth = (X2.astype(np.float64).T @ X2.astype(np.float64))
    Xd = jnp.asarray(X2)
    for name, prec in [("HIGHEST", P.HIGHEST), ("X3", "BF16_BF16_F32_X3")]:
        f = jax.jit(lambda A, p=prec: jax.lax.dot_general(
            A, A, (((0,), (0,)), ((), ())), precision=p))
        err = float(np.max(np.abs(np.asarray(f(Xd)) - truth)))
        print(f"acc_{name}: max|A-A_f64|={err:.3e} "
              f"(rel {err / np.max(np.abs(truth)):.3e})", flush=True)


if __name__ == "__main__":
    main()
