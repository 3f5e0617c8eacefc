"""bench.py subprocess-isolation harness (no device needed)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def test_run_isolated_roundtrip():
    assert bench._run_isolated("_selftest_bench", 120) == {"ok": True}


def test_run_isolated_child_error():
    res = bench._run_isolated("_objective", 120)
    assert "error" in res and "rc=1" in res["error"]


def test_run_isolated_inproc_fallback_reports_both():
    # _objective needs args: the child fails AND the in-process fallback
    # fails -> both errors surface rather than a silent dict
    res = bench._run_isolated("_objective", 120, fallback_inproc=True)
    assert "error" in res and "inproc_error" in res
