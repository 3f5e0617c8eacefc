"""Multi-device mesh tests on the 8-device CPU mesh (conftest sets
xla_force_host_platform_device_count=8) — keeps the driver's
dryrun_multichip contract green."""

import sys

import numpy as np
import pytest
import jax


def test_devices_available():
    assert len(jax.devices()) >= 8


def test_dryrun_multichip():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_entry_compiles():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    fn, args = g.entry()
    out = fn(*args)
    jax.block_until_ready(out)
    beta = np.asarray(out[0])
    assert np.isfinite(beta).all()


def test_sharded_fit_matches_single_device():
    """The mesh-sharded fit step returns the same solution as unsharded."""
    from jax.sharding import Mesh

    from adelie_tpu.solver.sharded import fit_lambda_step, shard_step_inputs
    import __graft_entry__ as g

    kw = g._example_problem(n=256, p=32, S=16, G=16)
    args = (
        kw["X"], kw["Xs"], kw["resid"], kw["w"], kw["beta_s"],
        kw["is_active"], kw["slot_begin"], kw["slot_size"],
        kw["penalty_slots"], kw["lmda"], kw["alpha"], kw["tol"],
        kw["dbeta_tol"], kw["newton_tol"], kw["newton_max_iters"],
        kw["max_iters"], kw["rsq"], True, 1,
    )
    out_single = fit_lambda_step(*args)
    beta_single = np.asarray(out_single[0])

    devices = jax.devices()[:8]
    mesh = Mesh(np.asarray(devices), ("n",))
    with mesh:
        X, Xs, resid, w = shard_step_inputs(
            mesh, kw["X"], kw["Xs"], kw["resid"], kw["w"]
        )
        out_mesh = fit_lambda_step(
            X, Xs, resid, w, *args[4:]
        )
        jax.block_until_ready(out_mesh)
    beta_mesh = np.asarray(out_mesh[0])
    np.testing.assert_allclose(beta_mesh, beta_single, atol=1e-5)  # f32 reduction-order noise
