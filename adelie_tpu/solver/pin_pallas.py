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


# --------------------------------------------------------------------------- #
# NOTE (r5): the grouped (qmax > 1) whole-solve kernel that lived here
# (_newton_abs_block / _pin_group_kernel / pin_group_solve_pallas) was
# REMOVED after losing its fixed-methodology A/B twice on v5e
# (BENCH_r04.grouped_pin pallas_speedup 0.6, BENCH_r4_inround 0.8): a
# Gauss-Seidel pass over eigenbasis group solves is serial per group and
# gains nothing over the XLA fori_loop it duplicated, unlike the q = 1
# row-DMA sweep kernel below which wins 20x by keeping the Gram in HBM
# and hiding the row fetch behind a depth-3 prefetch.  Grouped (q > 1)
# pin solves use the XLA loop path (solver/pin.py pin_cov_solve).
# Removed in r5 per VERDICT r4 #8; see git history for the kernel.
# --------------------------------------------------------------------------- #


def _cd_sweep_rows_kernel(
    pos_ref,          # (C/128, 128) VMEM int32 — position per update
    akk_ref,          # (C/128, 128) VMEM f32   — quadratic diag per update
    pk_ref,           # (C/128, 128) VMEM f32   — penalty per update
    n_ref,            # (1, 1) SMEM int32 — number of listed updates
    scal_ref,         # (1, 4) SMEM f32   — l1, l2, rsq0
    A_ref,            # (S, S) ANY (HBM)  — screen Gram, rows DMA'd on demand
    beta_ref,         # (S/128, 128) VMEM
    grad_ref,         # (1, S) VMEM
    beta_out,         # (S/128, 128) — working buffer, read-modify-write
    grad_out,         # (1, S)
    moved_out,        # (C/128, 128) f32 0/1 per listed update
    convg_out,        # (1, 1) SMEM
    rsq_out,          # (1, 1) SMEM
    rowbuf,           # (NBUF, 8, S) VMEM scratch
    sem,              # (NBUF,) DMA semaphores
):
    """One Gauss-Seidel CD pass over the listed coordinates with the Gram
    HBM-resident (big-S regime: S > MAX_PALLAS_S, where the (S, S) Gram
    cannot live in ~16 MB VMEM).

    The XLA lax.fori_loop formulation of the same sweep costs ~200 us per
    sequential coordinate update in while-loop machinery (BENCH_r04 EUR
    probe: 72 ms for a 320-update sweep).  Here the only O(S) work per
    update is the gradient row-AXPY plus one onehot gradient read; every
    other scalar (position, diagonal, penalty, coefficient) lives in a
    (rows, 128)-tiled buffer so its read/write touches ONE tile — the
    first kernel version kept them (1, C) lane-major and burned ~25 us
    per update on 128-tile onehot reductions.  Row addresses are all
    known up front (the update list is fixed for the sweep), so a
    depth-NBUF-1 prefetch pipeline hides the HBM row DMA latency behind
    the serial update chain.  HBM slices must be 8-sublane aligned: each
    fetch grabs the aligned (8, S) block and selects the row in VMEM.

    Measured A/B (v5e, S=16384, 320-update sweep): this formulation runs
    3.5 ms/sweep.  A variant that also tiled the GRADIENT to
    (S/128, 128) — making g_i a one-tile read, with the row DMA landing
    directly in that layout via a (S, S/128, 128) Gram — measured
    5.8 ms/sweep: the per-update full-gradient read-modify-write through
    a VMEM ref costs more than the lane-major carry + onehot read it
    saves.  Keep grad a loop CARRY in (1, S) lane-major form."""
    S = grad_ref.shape[1]
    NBUF = rowbuf.shape[0]
    l1 = scal_ref[0, 0]
    l2 = scal_ref[0, 1]
    rsq0 = scal_ref[0, 2]
    n = n_ref[0, 0]

    col_s = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    def tile_get(ref, j, zero):
        row = ref[pl.ds(j // 128, 1), :]
        return jnp.sum(jnp.where(lane == j % 128, row, zero))

    def pos_at(k):
        return tile_get(pos_ref, k, 0)

    def row_dma(k):
        p8 = (pos_at(k) // 8) * 8
        return pltpu.make_async_copy(
            A_ref.at[pl.ds(p8, 8), :],
            rowbuf.at[k % NBUF],
            sem.at[k % NBUF],
        )

    # working copies into the output refs (they double as state)
    beta_out[:] = beta_ref[:]
    moved_out[:] = jnp.zeros_like(moved_out)

    # prime the pipeline (NBUF - 1 rows in flight)
    for d in range(NBUF - 1):
        @pl.when(d < n)
        def _(d=d):
            row_dma(d).start()

    def body(k, carry):
        grad, convg, rsq = carry
        slot = k % NBUF
        p = pos_at(k)
        akk = tile_get(akk_ref, k, 0.0)
        pk = tile_get(pk_ref, k, 0.0)

        # wait for row-block k (same triple as the start's copy)
        row_dma(k).wait()

        brow = beta_out[pl.ds(p // 128, 1), :]
        onelane = lane == p % 128
        b_i = jnp.sum(jnp.where(onelane, brow, 0.0))
        g_i = jnp.sum(jnp.where(col_s == p, grad, 0.0))
        u = g_i + akk * b_i
        mag = jnp.maximum(jnp.abs(u) - l1 * pk, 0.0)
        den = akk + l2 * pk
        bnew = jnp.where(den > 0,
                         jnp.sign(u) * mag / jnp.where(den > 0, den, 1.0),
                         b_i)
        delta = bnew - b_i

        row = rowbuf[slot, pl.ds(p % 8, 1), :]
        grad = grad - delta * row
        beta_out[pl.ds(p // 128, 1), :] = jnp.where(onelane, bnew, brow)
        did = (delta != 0.0).astype(grad.dtype)
        mrow = moved_out[pl.ds(k // 128, 1), :]
        moved_out[pl.ds(k // 128, 1), :] = jnp.where(
            lane == k % 128, did, mrow)
        convg = jnp.maximum(convg, akk * delta * delta)
        rsq = rsq + delta * (2.0 * g_i - delta * akk)

        # refill the slot we just consumed with row k + NBUF - 1
        @pl.when(k + NBUF - 1 < n)
        def _():
            row_dma(k + NBUF - 1).start()

        return grad, convg, rsq

    grad, convg, rsq = jax.lax.fori_loop(
        0, n, body,
        (grad_ref[:], jnp.zeros((), grad_ref.dtype), rsq0),
    )
    grad_out[:] = grad
    convg_out[0, 0] = convg
    rsq_out[0, 0] = rsq


@functools.partial(jax.jit, static_argnames=("interpret",))
def cd_sweep_rows_pallas(
    A, beta, grad, pos, akk, pk, n, l1, l2, rsq, interpret: bool = False,
):
    """One compacted CD sweep with the Gram in HBM (q == 1 slots).

    pos/akk/pk list the updates in sweep order (padded past ``n``).
    Returns (beta, grad, moved, convg, rsq) — ``moved[k]`` says whether
    listed update k changed its coordinate (the caller scatters it back
    into slot-level active flags)."""
    S = A.shape[0]
    C = pos.shape[0]
    dtype = beta.dtype
    NBUF = 4
    assert S % 128 == 0, S
    Cp = -(-C // 128) * 128  # pad the update list to whole 128-lane tiles
    if Cp != C:
        pad = Cp - C
        pos = jnp.concatenate([pos, jnp.zeros(pad, pos.dtype)])
        akk = jnp.concatenate([akk, jnp.zeros(pad, akk.dtype)])
        pk = jnp.concatenate([pk, jnp.zeros(pad, pk.dtype)])
    scal = jnp.stack([
        l1.astype(dtype), l2.astype(dtype), rsq.astype(dtype),
        jnp.zeros((), dtype),
    ]).reshape(1, 4)
    out_shapes = (
        jax.ShapeDtypeStruct((S // 128, 128), dtype),   # beta
        jax.ShapeDtypeStruct((1, S), dtype),            # grad
        jax.ShapeDtypeStruct((Cp // 128, 128), dtype),  # moved
        jax.ShapeDtypeStruct((1, 1), dtype),            # convg
        jax.ShapeDtypeStruct((1, 1), dtype),            # rsq
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    anym = pl.BlockSpec(memory_space=pl.ANY)
    beta2, grad2, moved, convg, rsq2 = pl.pallas_call(
        _cd_sweep_rows_kernel,
        out_shape=out_shapes,
        in_specs=[vmem, vmem, vmem, smem, smem, anym, vmem, vmem],
        out_specs=(vmem, vmem, vmem, smem, smem),
        scratch_shapes=[
            pltpu.VMEM((NBUF, 8, S), dtype),
            pltpu.SemaphoreType.DMA((NBUF,)),
        ],
        interpret=interpret,
    )(
        pos.reshape(Cp // 128, 128).astype(jnp.int32),
        akk.reshape(Cp // 128, 128).astype(dtype),
        pk.reshape(Cp // 128, 128).astype(dtype),
        n.reshape(1, 1).astype(jnp.int32),
        scal,
        A,
        beta.reshape(S // 128, 128).astype(dtype),
        grad.reshape(1, S).astype(dtype),
    )
    return (beta2.reshape(S), grad2[0], moved.reshape(Cp)[:C],
            convg[0, 0], rsq2[0, 0])


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
