"""Test config: run on CPU with 8 fake devices (multi-chip sharding tests)
and enable x64 so oracles can be checked at reference tolerances
(SURVEY.md section 4: dense-numpy equivalence + objective dominance)."""

import os

# the image's shell env pre-sets JAX_PLATFORMS=axon (the TPU plugin), so a
# setdefault would NOT stick — force the CPU backend outright for tests
os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# a pytest plugin may import jax before this conftest runs, so the env vars
# above can be too late — the config update below works as long as no
# backend has been initialized yet
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# Persistent compile cache: ON by default in a SUITE-PRIVATE dir.
# XLA:CPU compile AND executable (de)serialization segfault
# stochastically on the big 8-device SPMD programs, with probability
# growing in the number of live compiles a process performs (r5
# measured: 4/4 no-cache shard-3 attempts crashed; warm-cache attempts
# mostly pass).  The cache makes tests/run_all.py's crash-retries
# CONVERGE: everything compiled before a crash is served from disk on
# the retry, so each attempt faces strictly less compile volume.
# ADELIE_TPU_TEST_NO_CACHE=1 opts out (e.g. when chasing cache bugs).
if os.environ.get("ADELIE_TPU_TEST_NO_CACHE"):
    # also stop the package import from enabling its production cache
    # inside test processes
    os.environ["ADELIE_TPU_NO_CACHE"] = "1"
else:
    # A SUITE-PRIVATE cache dir (r5): the old shared /tmp/jax_cache_adelie_tpu
    # was poisoned by ad-hoc scripts that set jax_compilation_cache_dir
    # without jax_persistent_cache_enable_xla_caches="none" — their entries
    # embed host-CPU-feature-pinned XLA:CPU AOT blobs whose DESERIALIZATION
    # segfaults (this was the "flaky mid-suite segfault" of rounds 3-5:
    # crash stack ends in compilation_cache.get_executable_and_time).
    # A private dir only ever written under the settings below cannot
    # contain such entries.
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/jax_cache_adelie_tpu_suite")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
    # keep XLA:CPU AOT blobs (which pin host CPU feature flags and log
    # SIGILL warnings on reload) out of the cache — the HLO entry is the win
    jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
