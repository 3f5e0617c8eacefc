"""Pallas TPU kernel for the lasso (all-groups-size-1) pin solve.

The covariance-form CD sweep is inherently Gauss-Seidel: S sequential
coordinate updates, each a VPU row-AXPY against the VMEM-resident Gram.
Under XLA each update costs ~microseconds of HLO while-loop machinery
(buffer rotation, branch overhead from lax.cond); this kernel runs the
ENTIRE pin solve — active-set refinement loop included
(solver_gaussian_pin_naive.hpp:317-400) — inside ONE ``pallas_call`` with
all state (Gram, gradient, coefficients, masks) resident in VMEM and a
fully branchless coordinate update (skipped coordinates contribute a zero
delta), cutting per-update overhead by >10x.

Used when every group has size 1 (the lasso fast path — also the shape the
multi-response reformulation and SNP workloads produce after grouping) and
the screen capacity fits VMEM; larger problems fall back to the XLA loop
in pin.py.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM budget: A is (S, S) f32; 1024^2 * 4 = 4 MB, leaving room for the
# dozen (1, S) state rows and double buffering.
MAX_PALLAS_S = 1024


def _pin_kernel(
    A_ref,            # (S, S) VMEM
    diag_ref,         # (1, S)
    grad0_ref,        # (1, S)
    beta0_ref,        # (1, S)
    active0_ref,      # (1, S) f32 0/1
    valid_ref,        # (1, S) f32 0/1
    penalty_ref,      # (1, S)
    scal_ref,         # (1, 8) SMEM: l1, l2, tol, dbeta_tol, rsq0, max_iters
    beta_out,         # (1, S)
    grad_out,         # (1, S)
    active_out,       # (1, S)
    rsq_out,          # (1, 1)
    iters_out,        # (1, 1)
    done_out,         # (1, 1)
):
    S = A_ref.shape[0]
    l1 = scal_ref[0, 0]
    l2 = scal_ref[0, 1]
    tol = scal_ref[0, 2]
    rsq0 = scal_ref[0, 4]
    max_iters = scal_ref[0, 5].astype(jnp.int32)

    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)
    diag = diag_ref[:]
    # dtype-feasibility floor (this kernel is f32-only): the CD energy
    # criterion plateaus at ~lam * eps^2, below which the loop would spin
    # its full max_iters budget (see pin.py / pin_constrained.py)
    eps = jnp.asarray(1.1920929e-07, diag.dtype)
    lam_cap = jnp.maximum(jnp.max(jnp.abs(diag)), 1.0)
    valid = valid_ref[:]
    penalty = penalty_ref[:]
    thr_num = l1 * penalty          # (1, S)
    denom = diag + l2 * penalty     # (1, S)
    denom_safe = jnp.where(denom > 0, denom, 1.0)

    def sweep(beta, grad, active, rsq, active_only):
        """One branchless Gauss-Seidel pass.  active_only: f32 scalar 0/1."""

        def body(i, carry):
            beta, grad, active, rsq, convg = carry
            onehot = (col_ids == i).astype(beta.dtype)
            b_i = jnp.sum(beta * onehot)
            g_i = jnp.sum(grad * onehot)
            akk = jnp.sum(diag * onehot)
            p_i = jnp.sum(penalty * onehot)
            v_i = jnp.sum(valid * onehot)
            a_i = jnp.sum(active * onehot)
            process = v_i * jnp.maximum(a_i, 1.0 - active_only)

            u = g_i + akk * b_i
            mag = jnp.maximum(jnp.abs(u) - l1 * p_i, 0.0)
            den = akk + l2 * p_i
            bnew = jnp.where(den > 0, jnp.sign(u) * mag / jnp.where(den > 0, den, 1.0), b_i)
            delta = process * (bnew - b_i)

            A_row = A_ref[pl.ds(i, 1), :]  # (1, S); A is symmetric
            grad = grad - delta * A_row
            beta = beta + delta * onehot
            active = jnp.maximum(
                active, (delta != 0.0).astype(active.dtype) * onehot
            )
            convg = jnp.maximum(convg, akk * delta * delta)
            rsq = rsq + delta * (2.0 * g_i - delta * akk)
            return beta, grad, active, rsq, convg

        return jax.lax.fori_loop(
            0, S, body, (beta, grad, active, rsq, jnp.zeros((), beta.dtype))
        )

    tol_f = jnp.maximum(tol, 100.0 * lam_cap * (10.0 * eps) ** 2)
    # floor-gated stall (see pin.py): exit only after 3 consecutive <1%
    # sweeps with convg already at the dtype floor; above the floor slow
    # problems run to tol or max_iters (honest failure)
    stall_floor = 1e8 * lam_cap * eps * eps

    def _slow_count(slow, convg, prev):
        return jnp.where(convg >= 0.99 * prev, slow + 1,
                         jnp.zeros((), jnp.int32))

    def _is_stalled(slow, convg):
        return (slow >= 3) & (convg <= stall_floor)

    def active_phase(beta, grad, active, rsq, iters):
        beta, grad, active, rsq, convg = sweep(beta, grad, active, rsq, 1.0)

        def cond(c):
            _, _, _, _, convg, slow, it = c
            return ((convg >= tol_f) & (it < max_iters)
                    & jnp.logical_not(_is_stalled(slow, convg)))

        def body(c):
            beta, grad, active, rsq, prev, slow, it = c
            beta, grad, active, rsq, convg = sweep(beta, grad, active, rsq, 1.0)
            return (beta, grad, active, rsq, convg,
                    _slow_count(slow, convg, prev), it + 1)

        beta, grad, active, rsq, convg, _, iters = jax.lax.while_loop(
            cond, body,
            (beta, grad, active, rsq, convg,
             jnp.zeros((), jnp.int32), iters + 1),
        )
        return beta, grad, active, rsq, iters

    def outer_cond(c):
        _, _, _, _, convg, slow, it, done = c
        nan_stop = jnp.logical_not(convg == convg)  # NaN-poisoned iterate
        return (jnp.logical_not(done) & (it < max_iters)
                & jnp.logical_not(_is_stalled(slow, convg))
                & jnp.logical_not(nan_stop))

    def outer_body(c):
        beta, grad, active, rsq, prev, slow, it, _ = c
        beta, grad, active, rsq, it = active_phase(beta, grad, active, rsq, it)
        beta, grad, active, rsq, convg = sweep(beta, grad, active, rsq, 0.0)
        return (beta, grad, active, rsq, convg,
                _slow_count(slow, convg, prev), it + 1, convg < tol_f)

    beta, grad, active, rsq, convg, slow, iters, done = jax.lax.while_loop(
        outer_cond, outer_body,
        (beta0_ref[:], grad0_ref[:], active0_ref[:],
         rsq0, jnp.asarray(jnp.inf, jnp.float32),
         jnp.zeros((), jnp.int32),
         jnp.zeros((), jnp.int32), jnp.zeros((), jnp.bool_)),
    )

    beta_out[:] = beta
    grad_out[:] = grad
    active_out[:] = active
    rsq_out[0, 0] = rsq
    iters_out[0, 0] = iters
    # a floor-gated stall exit = converged at the dtype's numerical floor;
    # any other early exit (incl. NaN, convg != convg) is a genuine failure
    done_out[0, 0] = ((done | _is_stalled(slow, convg))
                      & (convg == convg)).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pin_lasso_solve_pallas(
    A, grad, beta, diag, valid, active, penalty,
    lmda, alpha, tol, dbeta_tol, max_iters, rsq,
    interpret: bool = False,
):
    """Lasso pin solve as one Pallas kernel.

    Same contract as pin.pin_cov_solve restricted to qmax == 1:
    returns (beta, grad, active, rsq, iters, done).
    """
    S = A.shape[0]
    dtype = A.dtype
    l1 = (lmda * alpha).astype(dtype)
    l2 = (lmda * (1.0 - alpha)).astype(dtype)
    scal = jnp.stack([
        l1, l2, tol.astype(dtype), dbeta_tol.astype(dtype),
        rsq.astype(dtype), max_iters.astype(dtype), jnp.zeros((), dtype),
        jnp.zeros((), dtype),
    ]).reshape(1, 8)

    out_shapes = (
        jax.ShapeDtypeStruct((1, S), dtype),   # beta
        jax.ShapeDtypeStruct((1, S), dtype),   # grad
        jax.ShapeDtypeStruct((1, S), dtype),   # active
        jax.ShapeDtypeStruct((1, 1), dtype),   # rsq (SMEM scalar)
        jax.ShapeDtypeStruct((1, 1), jnp.int32),
        jax.ShapeDtypeStruct((1, 1), jnp.int32),
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    beta2, grad2, active2, rsq2, iters2, done2 = pl.pallas_call(
        _pin_kernel,
        out_shape=out_shapes,
        in_specs=[vmem] * 7 + [smem],
        out_specs=(vmem, vmem, vmem, smem, smem, smem),
        interpret=interpret,
    )(
        A,
        diag.reshape(1, S).astype(dtype),
        grad.reshape(1, S).astype(dtype),
        beta.reshape(1, S).astype(dtype),
        active.reshape(1, S).astype(dtype),
        valid.reshape(1, S).astype(dtype),
        penalty.reshape(1, S).astype(dtype),
        scal,
    )
    return (
        beta2[0], grad2[0], active2[0] != 0, rsq2[0, 0],
        iters2[0, 0], done2[0, 0] != 0,
    )
