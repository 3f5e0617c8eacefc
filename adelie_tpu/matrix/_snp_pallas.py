"""Pallas fused 2-bit-decode x matmul for SNP matrices.

The XLA path materializes each decoded (n, chunk) f32 block in HBM before
the matmul — 16x the packed traffic (measured ~45 ms for the full
p=100k x n=50k gradient on v5e).  This kernel unpacks each packed tile in
VMEM and reduces against the weighted residual tile in-register, so HBM
sees only the 2-bit bytes + the (n,) vector: the gradient becomes truly
bandwidth-of-the-packed-data bound.

Grid: (p_tiles, n_tiles) with n innermost; the (TP, 1) output block is
revisited across n_tiles and accumulated (zeroed at the first n-tile).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# tile sizes: packed tile (TP, TNB) = 128 KB uint8; decoded (TP, TN) f32
# = 2 MB VMEM; u tile 8 KB
TP = 256     # SNP columns per tile
TNB = 512    # packed bytes per tile (= TN/4 samples)
TN = 4 * TNB


def _snp_mul_kernel(packed_ref, u_ref, impute_ref, out_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    raw = packed_ref[:].astype(jnp.int32)    # (TP, TNB); u8->f32 casts are
    imp = impute_ref[:]                      # unsupported in Mosaic: via i32

    # process the four 2-bit planes separately (Mosaic cannot shape-cast
    # (TP, TNB, 4) -> (TP, TN)); u arrives pre-split as (4, TNB) planes
    # with u_planes[k, b] = u[4*b + k]
    acc = jnp.zeros_like(out_ref[:])
    for k in range(4):
        codes = (raw >> (2 * k)) & 3                         # (TP, TNB)
        vals = codes.astype(acc.dtype)
        vals = jnp.where(codes == 3, imp, vals)              # NA -> impute
        u_k = u_ref[k, :][None, :]                           # (1, TNB)
        acc = acc + jnp.sum(vals * u_k, axis=1, keepdims=True)

    out_ref[:] += acc


@functools.partial(jax.jit, static_argnames=("interpret",))
def snp_mul_pallas(packed, u, impute, interpret: bool = False):
    """out[j] = sum_i decode(packed[j], i) * u[i] for all p SNPs.

    ``packed``: (p, nb) uint8 column-major 2-bit codes (3 = NA);
    ``u``: (n,) f32 (already weight-multiplied); ``impute``: (p,) f32.
    Pads p to TP and n to TN multiples internally.
    """
    p, nb = packed.shape
    n = u.shape[0]
    dtype = u.dtype

    p_pad = ((p + TP - 1) // TP) * TP
    nb_pad = ((nb + TNB - 1) // TNB) * TNB
    n_pad = 4 * nb_pad
    if p_pad != p or nb_pad != nb:
        packed = jnp.pad(packed, ((0, p_pad - p), (0, nb_pad - nb)))
        impute = jnp.pad(impute, (0, p_pad - p))
    u_pad = jnp.zeros((n_pad,), dtype).at[:n].set(u)
    # padding bytes decode to code 0 -> contribute 0 with u=0 lanes anyway

    grid = (p_pad // TP, nb_pad // TNB)
    u_planes = u_pad.reshape(nb_pad, 4).T    # (4, nb_pad); plane k = i%4==k
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
        out_shape=jax.ShapeDtypeStruct((p_pad, 1), dtype),
        interpret=interpret,
    )(packed, u_planes, impute.reshape(p_pad, 1))
    return out[:p, 0]
