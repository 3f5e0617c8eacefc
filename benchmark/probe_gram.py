"""screen_gram roofline probe (VERDICT r3 #6).

Question: screen_gram measured 43-45% of the assumed f32-HIGHEST MXU
peak (197/3 TFLOP/s).  Is the gap (a) fusion overhead in our einsum,
(b) the w-scaling pass, or (c) a wrong roofline constant (HIGHEST f32
may be a 6-pass bf16 decomposition on v5e, ceiling 197/6 = 32.8)?

Times, on the same (n=50k, S=1024) shape:
  1. raw jnp.matmul at HIGHEST / float32 / bfloat16 input+default
  2. our screen_gram (einsum with fused w)
  3. two-step: Y = sqrt(w)*X materialized, then Y^T Y at HIGHEST
  4. rank-blocked pallas-free syrk alternative: (upper-triangle via
     jnp: skipped — XLA has no syrk; documented instead)
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main(n=50_000, S=1024):
    import jax
    import jax.numpy as jnp

    from bench import _timeit
    from adelie_tpu.solver.pin import screen_gram

    rng = np.random.default_rng(1)
    X = jnp.asarray(rng.standard_normal((n, S)).astype(np.float32))
    w = jnp.full((n,), 1.0 / n, jnp.float32)
    flops = 2.0 * n * S * S

    def report(name, t):
        print(f"{name:34s} {t*1e3:8.3f} ms  {flops/t/1e12:6.2f} TFLOP/s",
              flush=True)

    mm_h = jax.jit(lambda X: jnp.matmul(
        X.T, X, precision=jax.lax.Precision.HIGHEST))
    report("matmul X^T X HIGHEST", _timeit(lambda: mm_h(X)))

    mm_f = jax.jit(lambda X: jnp.matmul(
        X.T, X, precision=jax.lax.Precision.HIGH))
    report("matmul X^T X HIGH (3-pass)", _timeit(lambda: mm_f(X)))

    mm_d = jax.jit(lambda X: jnp.matmul(X.T, X))
    report("matmul X^T X DEFAULT", _timeit(lambda: mm_d(X)))

    Xb = X.astype(jnp.bfloat16)
    mm_b = jax.jit(lambda X: jnp.matmul(X.T, X,
                                        preferred_element_type=jnp.float32))
    report("matmul bf16 in, f32 out", _timeit(lambda: mm_b(Xb)))

    sg = jax.jit(lambda X, w: screen_gram(X, w, True)[0])
    report("screen_gram (fused w einsum)", _timeit(lambda: sg(X, w)))

    two = jax.jit(lambda X, w: jnp.matmul(
        (X * jnp.sqrt(w)[:, None]).T, X * jnp.sqrt(w)[:, None],
        precision=jax.lax.Precision.HIGHEST))
    report("two-step sqrt(w)X then matmul", _timeit(lambda: two(X, w)))

    # one-sided scaling: G = (w X)^T X — same result, half the scaling
    one = jax.jit(lambda X, w: jnp.matmul(
        (X * w[:, None]).T, X, precision=jax.lax.Precision.HIGHEST))
    report("one-sided (wX)^T X HIGHEST", _timeit(lambda: one(X, w)))


if __name__ == "__main__":
    t0 = time.time()
    main()
    print(f"total {time.time()-t0:.0f}s")
