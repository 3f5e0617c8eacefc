"""Real multi-process jax.distributed test (VERDICT r2 §2.12: the DCN
backend had "never run with num_processes > 1" — this runs it).

Spawns two OS processes that join a coordinator, form an 8-device
global mesh (4 virtual CPU devices each), and exercise
``parallel.distributed_init``, ``parallel.scenario_map`` (striping +
DCN all-gather), and a cross-process global-mesh reduction.  See
tests/_distributed_worker.py for the worker body.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "_distributed_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_distributed_backend():
    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)          # worker forces cpu in-process
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(port), str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-4000:]}"
        assert f"DIST_OK {i}" in out, f"proc {i} missing OK:\n{out[-4000:]}"
