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
