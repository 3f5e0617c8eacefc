"""Pallas fused 2-bit-decode x matmul for SNP matrices.

The XLA path materializes each decoded (n, chunk) f32 block in HBM before
the matmul — 16x the packed traffic.  This kernel unpacks each packed tile
in VMEM and reduces against the weighted residual tile in-register, so HBM
sees only the 2-bit bytes + the (n,) vector.

The op is VPU-decode-bound, not HBM-bound (~18-22 VPU ops per packed
byte), so the kernel minimizes decode ops: plane 0 needs no shift and
plane 3 no mask (bytes are zero-extended), the four plane products fold
into ONE fused multiply-add tree with a single lane reduction, and tiles
are (1024, 1024) to amortize loop overhead.  Measured v5e: 120 GB/s of
packed bytes = 1.9 TB/s of effective f32 matrix traffic, 2.3x the HBM
bound of an unpacked f32 design (kernel sweep in
benchmark/bench_kernels.py).  The NA-free variant (phased-ancestry
matrices never code 3) skips the imputation select.

Grid: (p_tiles, n_tiles) with n innermost; the (TP, 1) output block is
revisited across n_tiles and accumulated (zeroed at the first n-tile).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TP = 1024    # SNP columns per tile
TNB = 1024   # packed bytes per tile (= TN/4 samples)
TN = 4 * TNB


def _planes(raw):
    """Four 2-bit planes of zero-extended bytes with minimal shift/mask ops
    (plane 0: mask only; plane 3: shift only)."""
    return (raw & 3, (raw >> 2) & 3, (raw >> 4) & 3, raw >> 6)


def _snp_mul_kernel(packed_ref, u_ref, impute_ref, out_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    raw = packed_ref[:].astype(jnp.int32)   # u8->f32 casts are unsupported
    imp = impute_ref[:]                     # in Mosaic: widen via i32
    acc = jnp.zeros_like(out_ref[:])
    # NA (code 3) -> per-column impute value
    # (reference matrix_naive_snp_unphased.ipp decode)
    for k, c in enumerate(_planes(raw)):
        cf = c.astype(jnp.float32)
        cf = jnp.where(c == 3, imp, cf)
        acc += jnp.sum(cf * u_ref[k, :][None, :], axis=1, keepdims=True)
    out_ref[:] += acc


def _snp_mul_kernel_no_na(packed_ref, u_ref, out_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    raw = packed_ref[:].astype(jnp.int32)
    c0, c1, c2, c3 = _planes(raw)
    us = [u_ref[k, :][None, :] for k in range(4)]
    t = (c0.astype(jnp.float32) * us[0] + c1.astype(jnp.float32) * us[1]
         + c2.astype(jnp.float32) * us[2] + c3.astype(jnp.float32) * us[3])
    out_ref[:] += jnp.sum(t, axis=1, keepdims=True)


def _u_planes(u, nb, dtype):
    """Zero-pad u to the tile multiple and split into the four 2-bit-plane
    streams (plane k holds samples i with i % 4 == k).  Padding the big
    packed array would cost a full HBM copy; only the small (n,) vector is
    padded — Mosaic masks the partial edge tiles of ``packed`` itself."""
    nb_pad = ((nb + TNB - 1) // TNB) * TNB
    u_pad = jnp.zeros((4 * nb_pad,), dtype).at[: u.shape[0]].set(u)
    return u_pad.reshape(nb_pad, 4).T, nb_pad


@functools.partial(jax.jit, static_argnames=("interpret",))
def snp_mul_pallas(packed, u, impute, interpret: bool = False):
    """out[j] = sum_i decode(packed[j], i) * u[i] for all p SNPs.

    ``packed``: (p, nb) uint8 column-major 2-bit codes (3 = NA);
    ``u``: (n,) f32 (already weight-multiplied); ``impute``: (p,) f32.
    Edge tiles are masked (u is zero-padded so out-of-range byte lanes
    contribute 0); the packed array itself is never copied.
    """
    p, nb = packed.shape
    dtype = u.dtype
    u_planes, nb_pad = _u_planes(u, nb, dtype)
    grid = ((p + TP - 1) // TP, nb_pad // TNB)
    out = pl.pallas_call(
        _snp_mul_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TP, TNB), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, TNB), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TP, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TP, 1), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p, 1), dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        ),
        interpret=interpret,
    )(packed, u_planes, impute.reshape(p, 1))
    return out[:, 0]


def _snp_mul_many_kernel(packed_ref, u_ref, impute_ref, out_ref, *, C):
    """Multi-residual decode-matmul tile: out (TP, C) += decode(packed)^T-
    style reduction against C residual streams at once.

    The C-residual contraction turns the per-plane broadcast-reduce of the
    single-residual kernel into an MXU matmul (TP, TNB) x (TNB, C), so the
    KKT gradients of a whole lambda chunk ride ONE pass over the packed
    bytes — the decode (VPU) cost is amortized C ways.
    """
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    raw = packed_ref[:].astype(jnp.int32)
    imp = impute_ref[:]
    acc = jnp.zeros_like(out_ref[:])
    for k, c in enumerate(_planes(raw)):
        cf = c.astype(jnp.float32)
        cf = jnp.where(c == 3, imp, cf)
        uk = u_ref[:, k * C:(k + 1) * C]          # (TNB, C): plane k streams
        acc += jnp.dot(cf, uk, preferred_element_type=jnp.float32)
    out_ref[:] += acc


def _u_planes_many(U, nb, dtype):
    """(C, n) residual block -> (nb_pad, 4*C) plane-major streams: column
    k*C + c holds plane k (samples i = 4*b + k) of residual c."""
    C = U.shape[0]
    nb_pad = ((nb + TNB - 1) // TNB) * TNB
    up = jnp.zeros((C, 4 * nb_pad), dtype).at[:, : U.shape[1]].set(U)
    # (C, nb_pad, 4) -> (nb_pad, 4, C) -> (nb_pad, 4*C)
    return up.reshape(C, nb_pad, 4).transpose(1, 2, 0).reshape(nb_pad, 4 * C)


@functools.partial(jax.jit, static_argnames=("interpret",))
def snp_mul_many_pallas(packed, U, impute, interpret: bool = False):
    """out[j, c] = sum_i decode(packed[j], i) * U[c, i] — C residuals in one
    pass over the packed bytes (the streamed-KKT workhorse).

    ``packed``: (p, nb) uint8; ``U``: (C, n) f32 (already weight-multiplied);
    ``impute``: (p,) f32.  Returns (p, C) f32.
    """
    p, nb = packed.shape
    C = U.shape[0]
    dtype = U.dtype
    u_planes = _u_planes_many(U, nb, dtype)
    nb_pad = u_planes.shape[0]
    grid = ((p + TP - 1) // TP, nb_pad // TNB)
    out = pl.pallas_call(
        functools.partial(_snp_mul_many_kernel, C=C),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TP, TNB), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TNB, 4 * C), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TP, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TP, C), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p, C), dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        ),
        interpret=interpret,
    )(packed, u_planes, impute.reshape(p, 1))
    return out


@functools.partial(jax.jit, static_argnames=("interpret",))
def snp_mul_pallas_no_na(packed, u, interpret: bool = False):
    """NA-free decode-matmul (phased-ancestry: codes 0..2 only)."""
    p, nb = packed.shape
    dtype = u.dtype
    u_planes, nb_pad = _u_planes(u, nb, dtype)
    grid = ((p + TP - 1) // TP, nb_pad // TNB)
    out = pl.pallas_call(
        _snp_mul_kernel_no_na,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TP, TNB), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, TNB), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TP, 1), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p, 1), dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        ),
        interpret=interpret,
    )(packed, u_planes)
    return out[:, 0]
