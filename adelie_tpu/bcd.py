"""Block-coordinate-descent group-update solvers.

Solves the (eigenbasis-rotated) group elastic-net block update

    minimize_x  1/2 x' diag(L) x - v' x + l1 ||x||_2 + l2/2 ||x||_2^2

with ``L >= 0`` diagonal.  This is a TPU-native (pure-JAX, jittable,
mask-safe) re-implementation of the math in the reference's
``adelie/src/include/adelie_core/bcd/unconstrained/newton.hpp`` (solution
structure at :44-111) and ``bcd/utils.hpp`` (root function and bounds):

* ``x = 0`` iff ``||v||_2 <= l1``.
* If ``l1 == 0``: closed form ``x = v / (L + l2)``.
* Otherwise ``x_i = h * v_i / ((L_i + l2) h + l1)`` where ``h = ||x||_2``
  is the root of ``phi(h) = sum_i v_i^2 / ((L_i + l2) h + l1)^2 - 1``.

The root is found by adaptive bisection to land at ``phi(h) >= 0`` followed
by guarded Newton (the reference's default "newton_abs" strategy,
newton.hpp:213-260).  ``phi`` is convex and decreasing on ``h >= 0`` so
Newton from the left converges monotonically.

All functions are shape-polymorphic over a trailing group dimension and are
safe on masked/padded lanes (entries with ``v_i == 0`` and ``L_i == 0``
contribute nothing and produce ``x_i == 0``).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "root_function",
    "root_lower_bound",
    "root_upper_bound",
    "objective",
    "root",
    "solve",
    "newton_solver",
]


def _root_function(h, quad, linear, l1):
    return jnp.sum(linear**2 / (quad * h + l1) ** 2) - 1.0


def _root_lower_bound(buf1, v, l1):
    """Largest h with phi(h) >= 0 guaranteed, from the quadratic minorant.

    Reference: bcd/utils.hpp root_lower_bound — solves
    a h^2 + 2 b h + c <= 0 with a = ||b1||^2, b = l1 * sum(b1),
    c = l1^2 p - ||v||_1^2.
    """
    b = l1 * jnp.sum(buf1)
    a = jnp.sum(buf1 * buf1)
    v_l1 = jnp.sum(jnp.abs(v))
    c = l1 * l1 * _masked_size(v) - v_l1 * v_l1
    discr = b * b - a * c
    h_min = jnp.where(
        discr > -1e-12,
        (-b + jnp.sqrt(jnp.maximum(discr, 0.0))) / jnp.maximum(a, _tiny(a.dtype)),
        0.0,
    )
    return jnp.maximum(h_min, 0.0)


def _masked_size(v):
    # Number of "real" lanes.  For padded lanes both v and L are zero; the
    # reference uses the vector length p in the lower bound, which is only a
    # bound, so counting nonzero-v lanes keeps it a valid (tighter) bound.
    return jnp.maximum(jnp.sum((v != 0).astype(v.dtype)), 1.0)


def _tiny(dtype):
    return jnp.asarray(np.finfo(np.dtype(dtype)).tiny * 1e8, dtype)


def _root_upper_bound(buf1, v, l1, zero_tol=1e-14):
    """h_max with phi(h_max) <= 0 (approximately, when zero eigenvalues).

    Reference: bcd/utils.hpp root_upper_bound.  Returns (h_max, min nonzero
    entry of buf1).
    """
    is_nonzero = buf1 > zero_tol
    safe = jnp.where(is_nonzero, buf1, 1.0)
    vi2 = v * v
    h_max_zero_path = jnp.sum(jnp.where(is_nonzero, vi2 / (safe * safe), 0.0))
    v_S = jnp.sum(jnp.where(buf1 <= 0, vi2, 0.0))
    denom = 1.0 - v_S / (l1 * l1)
    h_max_zero_path = jnp.sqrt(
        jnp.maximum(h_max_zero_path / jnp.where(denom > 0, denom, 1.0), 0.0)
    )
    min_nnz = jnp.min(jnp.where(is_nonzero, buf1, jnp.inf))
    min_nnz = jnp.where(jnp.isfinite(min_nnz), min_nnz, 1.0)
    return h_max_zero_path, min_nnz


def _newton_abs_root(buf1, v, l1, tol, max_iters):
    """Adaptive-bisection + Newton root find for phi (newton.hpp:213-260).

    Returns (h, iters).  Assumes ||v|| > l1 > 0.  Jittable; scalar h.
    """
    dtype = v.dtype
    h_min = _root_lower_bound(buf1, v, l1)
    h_max, min_nnz = _root_upper_bound(buf1, v, l1)

    # --- adaptive bisection from h_max toward h_min until phi(h) >= 0 ---
    def ada_cond(carry):
        h_cand, fh, it = carry
        return (fh < 0) & (jnp.abs(fh) > tol) & (it < 100)

    def ada_body(carry):
        h_cand, _, it = carry
        w = jnp.maximum(l1 / (min_nnz * h_cand + l1), 0.05)
        h_new = w * h_min + (1 - w) * h_cand
        return h_new, _root_function(h_new, buf1, v, l1), it + 1

    small_range = (h_max - h_min) <= 1e-1

    def init_small():
        return h_min

    def init_ada():
        h0 = jnp.maximum(h_max, h_min)
        w = jnp.maximum(l1 / (min_nnz * h0 + l1), 0.05)
        h1 = w * h_min + (1 - w) * h0
        f1 = _root_function(h1, buf1, v, l1)
        h, _, _ = jax.lax.while_loop(ada_cond, ada_body, (h1, f1, jnp.int32(1)))
        return h

    h = jax.lax.cond(small_range, init_small, init_ada)

    # --- guarded Newton (newton.hpp newton_solver_base step_f) ---
    def step(h):
        inv = 1.0 / (buf1 * h + l1)
        sq = (v * inv) ** 2
        t = jnp.sum(sq)
        sqrt_t = jnp.sqrt(t)
        fh = t - 1.0
        dfh = -jnp.sum(sq * buf1 * inv) * (1 + sqrt_t) / jnp.maximum(t, _tiny(dtype))
        return fh, dfh

    def newton_cond(carry):
        h, fh, dfh, it = carry
        return (jnp.abs(fh) > tol) & (it < max_iters)

    def newton_body(carry):
        h, fh, dfh, it = carry
        h = jnp.maximum(h - fh / dfh, 0.0)
        fh, dfh = step(h)
        return h, fh, dfh, it + 1

    fh0, dfh0 = step(h)
    h, fh, dfh, iters = jax.lax.while_loop(
        newton_cond, newton_body, (h, fh0, dfh0, jnp.int32(0))
    )
    return h, iters


def newton_solver(L, v, l1, l2, tol=1e-12, max_iters=1000):
    """Solve the block update; returns (x, iters).

    Jittable.  ``L``/``v`` are (q,) arrays; padded lanes must have
    ``L == 0`` and ``v == 0`` and then get ``x == 0``.
    """
    L = jnp.asarray(L)
    v = jnp.asarray(v)
    dtype = v.dtype
    l1 = jnp.asarray(l1, dtype)
    l2 = jnp.asarray(l2, dtype)
    buf1 = L + l2
    v_norm = jnp.sqrt(jnp.sum(v * v))

    def zero_case():
        return jnp.zeros_like(v), jnp.int32(0)

    def ridge_case():
        # l1 == 0 closed form; guard 0/0 on padded or degenerate lanes.
        x = jnp.where(v != 0, v / jnp.where(buf1 != 0, buf1, 1.0), 0.0)
        return x, jnp.int32(0)

    def general_case():
        h, iters = _newton_abs_root(buf1, v, l1, tol, max_iters)
        x = h * v / (buf1 * h + l1)
        return x, iters

    return jax.lax.cond(
        v_norm <= l1,
        zero_case,
        lambda: jax.lax.cond(l1 <= 0, ridge_case, general_case),
    )


# ----------------------------------------------------------------------------
# Public API mirroring adelie.bcd (reference adelie/bcd.py)
# ----------------------------------------------------------------------------


def root_function(h, *, quad, linear, l1):
    """phi(h) = sum v_i^2 / (Sigma_ii h + l1)^2 - 1 (reference bcd.py:81)."""
    quad = jnp.asarray(quad)
    return float(
        _root_function(
            jnp.asarray(h, quad.dtype), quad, jnp.asarray(linear), jnp.asarray(l1)
        )
    )


def root_lower_bound(*, quad, linear, l1):
    """Lower bound on the root of phi (reference bcd.py:5)."""
    quad = jnp.asarray(quad)
    return float(_root_lower_bound(quad, jnp.asarray(linear), jnp.asarray(l1)))


def root_upper_bound(*, quad, linear, l1, zero_tol=1e-14):
    """Upper bound on the root of phi (reference bcd.py:40)."""
    h, _ = _root_upper_bound(
        jnp.asarray(quad), jnp.asarray(linear), jnp.asarray(l1), zero_tol
    )
    return float(h)


def objective(beta, *, quad, linear, l1, l2):
    """1/2 b'Sb - v'b + l1||b|| + l2/2||b||^2 (reference bcd.py:123)."""
    beta = jnp.asarray(beta)
    quad = jnp.asarray(quad)
    linear = jnp.asarray(linear)
    norm = jnp.sqrt(jnp.sum(beta * beta))
    return float(
        0.5 * jnp.sum(quad * beta * beta)
        - jnp.sum(linear * beta)
        + l1 * norm
        + 0.5 * l2 * jnp.sum(beta * beta)
    )


@functools.partial(jax.jit, static_argnames=("max_iters",))
def _solve_jit(quad, linear, l1, l2, tol, max_iters):
    return newton_solver(quad, linear, l1, l2, tol, max_iters)


def root(*, quad, linear, l1, l2=0.0, tol=1e-12, max_iters=1000):
    """Root ||x||_2 of the solved block update (reference bcd.py:264)."""
    x, _ = _solve_jit(
        jnp.asarray(quad), jnp.asarray(linear), l1, l2, tol, int(max_iters)
    )
    return float(jnp.sqrt(jnp.sum(x * x)))


@functools.partial(jax.jit, static_argnames=("max_iters", "accel", "adares"))
def _ista_jit(quad, linear, l1, l2, tol, max_iters, accel, adares):
    """(F)ISTA on the block update (reference bcd/unconstrained/ista.hpp:
    10-94): proximal gradient with step 1/L, L = max(quad) + l2; the prox of
    l1||.||_2 is the group soft-threshold.  ``accel`` adds Nesterov
    momentum; ``adares`` adds adaptive restart (momentum reset when the
    update opposes the velocity)."""
    q = quad + l2
    L = jnp.maximum(jnp.max(q), 1e-30)
    t = 1.0 / L

    def prox(u):
        nrm = jnp.sqrt(jnp.sum(u * u))
        scale = jnp.maximum(1.0 - t * l1 / jnp.maximum(nrm, 1e-300), 0.0)
        return scale * u

    def body(carry):
        x, z, s, it, _ = carry
        g = q * z - linear
        x_new = prox(z - t * g)
        s_new = 0.5 * (1 + jnp.sqrt(1 + 4 * s * s)) if accel else s
        mom = ((s - 1) / s_new) if accel else 0.0
        if adares:
            restart = jnp.sum((z - x_new) * (x_new - x)) > 0
            mom = jnp.where(restart, 0.0, mom)
            s_new = jnp.where(restart, 1.0, s_new)
        z_new = x_new + mom * (x_new - x) if accel else x_new
        diff = jnp.max(jnp.abs(x_new - x))
        return x_new, z_new, s_new, it + 1, diff

    def cond(carry):
        _, _, _, it, diff = carry
        return (diff > tol) & (it < max_iters)

    x0 = jnp.zeros_like(linear)
    init = (x0, x0, jnp.asarray(1.0, linear.dtype), jnp.int32(0),
            jnp.asarray(jnp.inf, linear.dtype))
    x, _, _, iters, _ = jax.lax.while_loop(cond, body, init)
    return x, iters


def solve(
    *,
    quad,
    linear,
    l1,
    l2,
    tol: float = 1e-12,
    max_iters: int = 1000,
    solver: str = "newton_abs",
):
    """Solve the BCD update (reference bcd.py:182, solver list :40-49).

    Strategies: the Newton family (``newton``, ``newton_abs``,
    ``newton_brent``, ``brent`` — all guarded 1-D root finds, served by the
    bracketing+Newton solver) and the proximal-gradient family (``ista``,
    ``fista``, ``fista_adares``).

    Returns a dict with ``beta``, ``iters``.
    """
    quad = jnp.asarray(quad)
    linear = jnp.asarray(linear)
    if solver in ("ista", "fista", "fista_adares"):
        x, iters = _ista_jit(
            quad, linear,
            jnp.asarray(l1, linear.dtype), jnp.asarray(l2, linear.dtype),
            jnp.asarray(tol, linear.dtype), int(max_iters),
            solver != "ista", solver == "fista_adares",
        )
    elif solver in ("newton", "newton_abs", "newton_brent", "brent"):
        x, iters = _solve_jit(quad, linear, l1, l2, tol, int(max_iters))
    else:
        raise ValueError(f"Unknown solver: {solver}")
    return {"beta": np.asarray(x), "iters": int(iters)}
