"""Resilient full-suite runner (what CI runs; use this over bare pytest).

XLA:CPU's compiler segfaults NONDETERMINISTICALLY after many hundreds of
compiles in one process on low-core hosts (observed rounds 3-5 with the
persistent cache on, off, and freshly purged — the crash stack always
ends inside jax's compile flow: ``backend_compile_and_load`` /
``put_executable_and_time`` / ``get_executable_and_time``).  A monolithic
``pytest tests/`` run can therefore die mid-suite through no fault of
the tests.  This runner splits the suite into process shards (bounding
per-process compile volume) and retries a crashed shard (signal exits
only — assertion failures, rc > 0, are never retried).  conftest keeps
the persistent compile cache ON in a suite-private dir precisely so the
retries converge: everything compiled before a crash is served from
disk on the next attempt.

    python tests/run_all.py            # 4 shards, 2 crash-retries (CI default)
    python tests/run_all.py --shards 6 --retries 3
"""

import argparse
import glob
import os
import subprocess
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shards", type=int, default=4)
    ap.add_argument("--retries", type=int, default=2)
    args = ap.parse_args()
    here = os.path.dirname(os.path.abspath(__file__))
    files = sorted(glob.glob(os.path.join(here, "test_*.py")))
    n = max(1, args.shards)
    rc = 0
    t0 = time.time()
    for i in range(n):
        shard = files[i::n]
        if not shard:
            continue
        print(f"--- shard {i + 1}/{n}: {len(shard)} files", flush=True)
        r = subprocess.run([sys.executable, "-m", "pytest", "-q", *shard])
        for attempt in range(args.retries):
            if r.returncode >= 0:
                break
            # signal exit = the stochastic XLA:CPU compiler/serialization
            # crash, not a test failure.  With the persistent cache on,
            # retries converge: pre-crash compiles are served from disk.
            print(f"--- shard {i + 1} crashed (signal {-r.returncode}); "
                  f"retry {attempt + 1}/{args.retries}", flush=True)
            r = subprocess.run([sys.executable, "-m", "pytest", "-q", *shard])
        rc = rc or r.returncode
        print(f"--- shard {i + 1} rc={r.returncode} "
              f"at {time.time() - t0:.0f}s", flush=True)
    print(f"TOTAL rc={rc} in {time.time() - t0:.0f}s", flush=True)
    sys.exit(rc)


if __name__ == "__main__":
    main()
