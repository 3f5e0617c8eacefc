"""Device-mesh scaling utilities.

The reference's parallel substrate is OpenMP threads over row/column blocks
(matrix/utils.hpp, SURVEY.md section 2.2/2.12).  The TPU-native replacement:

* **n-sharding** (data-parallel reductions): the observation dimension of
  ``X``, ``resid``, ``weights`` is sharded over the mesh axis ``"n"``; the
  three large per-lambda contractions (full gradient ``X^T(w r)``, screen
  Gram, residual reconstruction) then run as local matmuls + XLA
  ``psum``-style reductions inserted automatically from sharding
  annotations, riding ICI.
* The small covariance-form CD state (A, screen beta/grad) is replicated —
  it is O(S^2) and latency-bound, so replication is the right layout.

``shard_rows(x, mesh)`` places an (n, ...) array row-sharded;
``replicate(x, mesh)`` fully replicates.  With no mesh (single chip),
everything is a no-op, so solvers are mesh-agnostic.
"""

from contextlib import contextmanager

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_active_mesh = None


def make_mesh(n_devices=None, axis_name="n", devices=None):
    """Create a 1-D device mesh over the observation axis."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


@contextmanager
def use_mesh(mesh):
    """Context manager: solvers constructed inside shard over ``mesh``."""
    global _active_mesh
    old = _active_mesh
    _active_mesh = mesh
    try:
        yield mesh
    finally:
        _active_mesh = old


def active_mesh():
    return _active_mesh


def shard_rows(x, mesh=None):
    """Shard the leading (observation) axis of ``x`` over the mesh.

    If the leading dim does not divide the mesh size (explicit device_put
    requires divisibility), the array is left as-is — inside jit, GSPMD
    still partitions it to match the sharded operands it meets.
    """
    mesh = mesh or _active_mesh
    if mesh is None:
        return x
    n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    if x.shape[0] % n_dev != 0:
        return x
    spec = P(mesh.axis_names[0], *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def replicate(x, mesh=None):
    mesh = mesh or _active_mesh
    if mesh is None:
        return x
    return jax.device_put(x, NamedSharding(mesh, P()))


def pad_rows_to_multiple(arr, multiple, fill=0.0):
    """Pad the leading axis so it divides evenly across devices."""
    n = arr.shape[0]
    rem = (-n) % multiple
    if rem == 0:
        return arr, n
    pad_width = [(0, rem)] + [(0, 0)] * (arr.ndim - 1)
    return np.pad(arr, pad_width, constant_values=fill), n
