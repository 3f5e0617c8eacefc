"""Test config: run on CPU with 8 fake devices (multi-chip sharding tests)
and enable x64 so oracles can be checked at reference tolerances
(SURVEY.md section 4: dense-numpy equivalence + objective dominance)."""

import os

# note: the axon TPU plugin in this image overrides JAX_PLATFORMS; the
# PLATFORM_NAME variable is honored and forces the host CPU backend.
os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
# persistent compile cache: the suite is compile-bound (many bucketed shapes)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_adelie_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
