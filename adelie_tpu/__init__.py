"""adelie_tpu — a TPU-native group elastic net framework.

A from-scratch JAX/XLA/Pallas re-design with the capability surface of the
reference ``adelie`` package (group lasso / elastic net path solver with
BASIL screening, GLM proximal Newton, structured matrices, constraints,
CV, diagnostics), built TPU-first:

* the screen-set inner solver runs in covariance form against an
  MXU-computed Gram (see ``adelie_tpu/solver/pin.py``),
* all O(n)/O(p) work is a handful of large sharded matmuls per lambda,
* dynamic screen/active sets are fixed-capacity masked device buffers,
* scaling is via ``jax.sharding`` meshes (see ``adelie_tpu/parallel``),
  not threads.
"""

__version__ = "0.1.0"

import os as _os

# XLA compile times on TPU are large for the control-flow-heavy pin solver;
# a persistent compile cache makes warm starts ~free across processes
# (the analog of the reference setting OpenMP env defaults at import,
# adelie/__init__.py:11-19).
if not _os.environ.get("ADELIE_TPU_NO_CACHE"):
    try:
        import jax as _jax

        if _jax.config.jax_compilation_cache_dir is None:
            _jax.config.update(
                "jax_compilation_cache_dir",
                _os.path.expanduser("~/.cache/adelie_tpu_xla"),
            )
            # 0.1 not the default 1.0: the pin/BASIL drivers compile ~19
            # executables per fit signature and the sub-second ones
            # (scatter, convert, broadcast glue) otherwise re-compile in
            # every fresh process (r5 cold-start probe: 8 of 19 misses)
            _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
            # XLA:CPU AOT results embed host CPU feature flags; reusing
            # them across machines (or sandbox feature-detection changes)
            # logs loud SIGILL warnings.  The cache win is the HLO-level
            # entry, so keep the XLA-internal caches out of it.
            _jax.config.update("jax_persistent_cache_enable_xla_caches",
                               "none")
    except Exception:  # pragma: no cover
        pass

from . import bcd
from . import configs as _configs_mod
from . import glm
from . import matrix
from .configs import set_configs
from .logger import logger, logger_level

# imported lazily by users that need them; kept as namespaces here
from . import data  # noqa: E402
from . import solver  # noqa: E402
from .solver import grpnet, gaussian_cov  # noqa: E402


def __getattr__(name):
    # lazy subpackages to keep import light
    if name == "prewarm":
        from ._prewarm import prewarm

        globals()["prewarm"] = prewarm
        return prewarm
    if name in ("constraint", "cv", "diagnostic", "io", "optimization",
                "sklearn", "state", "parallel"):
        import importlib

        mod = importlib.import_module(f".{name}", __name__)
        globals()[name] = mod
        return mod
    if name == "cv_grpnet":
        from .cv import cv_grpnet

        return cv_grpnet
    if name in ("bvls", "pinball", "css_cov"):
        from . import solver as _s

        return getattr(_s, name)
    if name in ("GroupElasticNet", "CSSModelSelection"):
        from . import sklearn as _sk

        return getattr(_sk, name)
    raise AttributeError(f"module 'adelie_tpu' has no attribute {name!r}")
