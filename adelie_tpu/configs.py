"""Global configuration for adelie_tpu.

TPU-native re-design of the reference's process-wide ``Configs`` statics
(reference: adelie/src/include/adelie_core/configs.hpp:6-21 and
adelie/configs.py:4-27).  Unlike the reference (mutable C++ statics), this is a
plain Python dataclass singleton; solver entry points read it once at call
time, so values are baked into each jitted fit as compile-time constants.
"""

from dataclasses import dataclass, fields


@dataclass
class Configs:
    # Proximal-Newton hessian floor (reference configs.hpp: hessian_min=1e-24).
    # Kept dtype-aware at use sites: f32 paths floor at ``hessian_min_f32``.
    hessian_min: float = 1e-24
    hessian_min_f32: float = 1e-12
    # Skip coordinate updates with ||dbeta|| <= dbeta_tol * sqrt(q)
    # (reference configs.hpp: dbeta_tol=1e-12).
    dbeta_tol: float = 1e-12
    # Below this many bytes the reference disables threading; here it gates
    # whether device ops are worth dispatching vs. running on host numpy.
    min_bytes: int = 1 << 17
    # Progress-bar symbol (reference: penguin).
    pb_symbol: str = "\U0001F427"
    # Cap on solver values to detect divergence (reference: 1e100).
    max_solver_value: float = 1e100
    # --- TPU-specific knobs (no reference equivalent) ---
    # Capacity buckets for screen-set buffers: round capacities up to the next
    # bucket to bound XLA recompilations.
    screen_cap_min: int = 64
    group_cap_min: int = 64
    # When the FULL problem fits the VMEM-resident pin kernel (total value
    # size below this), screen every group up front: screening exists to
    # bound the working set, but below this size the whole Gram is cheaper
    # than a single BASIL retry round trip (tunneled-TPU RTT ~26ms).
    screen_all_max: int = 1024
    # Matmul precision for the large MXU contractions ("default" | "float32" |
    # "highest" | "x3").  CD inner loops always run in the solver dtype.
    # Measured v5e (benchmark/gram_probe.py, n=50k S=1024 screen Gram):
    # "highest" lowers to ~6 bf16 passes (35.9 TF/s, max rel err 3.3e-7 vs
    # f64), "x3" to 3 passes (52.3 TF/s, 1.7x faster, rel err 1.2e-5),
    # "default" to 1 pass (66.2 TF/s, bf16-grade error ~3e-4).  The default
    # stays "highest": the solver's KKT certificates and stall-honesty
    # tolerances are calibrated for f32-grade Grams.  "x3" is the right
    # opt-in when Gram time dominates and ~1e-5 relative is acceptable.
    # Read at trace time: flips after a path has compiled do not retrace.
    matmul_precision: str = "highest"
    # Cooperative interrupt/watchdog guard: total CD sweeps a single fused
    # lambda-chunk device program may spend before freezing and returning
    # control to the host (which resumes at the next un-accepted lambda).
    # Bounds every device call's duration so user interrupts land between
    # chunks and a pathological fit exits with a valid partial state
    # instead of tripping the platform watchdog (the reference polls
    # PyErr_CheckSignals every CD iteration, py_state.cpp:70-74).
    chunk_sweep_budget: int = 1_000_000
    # Compensated f32 reductions (utils/compensated.py): chunked-Kahan
    # accumulation for the gradient / screen-Gram contractions, cutting the
    # O(n) accumulation error to ~O(compensated_chunk) so f32 device paths
    # approach the reference's f64-calibrated tolerances.  Off by default
    # (costs one extra scan + partial buffers on the hot contractions).
    compensated_reductions: bool = False
    compensated_chunk: int = 4096
    # HBM byte budget for device-resident packed SNP matrices; above it the
    # snp factories pick the host-streaming matrix (tiles swept through the
    # device per full-p product, matrix/_snp_stream.py).  Default leaves
    # ~8 GB of a v5e's 16 GB for solver state, per-lambda gradient stacks
    # and streaming double-buffers.
    snp_hbm_budget: int = 8 << 30
    # Overlap streamed H2D tile copies with the decode-matmul (double
    # buffering, matrix/_snp_stream.py).  True is right on real hardware
    # (PCIe DMA runs concurrently with compute).  Some transports — e.g.
    # a tunneled/relayed device where host-side serialization shares one
    # CPU core with the relay — degrade ~3x when a second device_put is
    # dispatched before the first completes; set False there to serialize
    # each tile copy (put -> force -> compute).  bench.py probes the live
    # transport and sets this before the streamed blocks.
    stream_h2d_overlap: bool = True
    # On a streamed-KKT chunk failure, union ALL groups violating at any
    # converged lambda of the chunk into the screen set (not just the
    # first failure's violators): the speculative gradient stack is
    # already paid for by the chunk's single full-p pass, and each
    # avoided retry saves a whole host->HBM sweep (25 GB at north-star
    # scale).  Solutions remain KKT-certified but can differ from the
    # in-HBM driver's within solver tolerance (the screen trajectory
    # changes); set False to reproduce the in-HBM path bit-for-bit.
    stream_speculative_union: bool = True
    # Run state.check_state after every certified chunk of the streamed
    # drivers (reference-style always-on state audits; costs host time
    # at each chunk boundary).  Debug aid for north-star-scale runs.
    debug_check_state: bool = False
    # (the grouped-pin Pallas flag that lived here was removed in r5
    # along with its kernel: 0.6-0.8x the XLA loop in two rounds of
    # fixed-methodology A/Bs; see solver/pin_pallas.py tombstone)


_default = Configs()
configs = Configs()

# jax.lax precision objects are only importable with jax; map lazily.
_PRECISION_STRINGS = {
    "default": "DEFAULT",
    "float32": "HIGHEST",
    "highest": "HIGHEST",
    # 3-pass bf16 split: jax accepts the DotAlgorithmPreset name directly.
    "x3": "BF16_BF16_F32_X3",
}


def matmul_precision_value():
    """The ``precision=`` argument encoding ``configs.matmul_precision``."""
    name = configs.matmul_precision
    try:
        key = _PRECISION_STRINGS[name]
    except KeyError:
        raise ValueError(
            f"Unknown matmul_precision: {name!r}. "
            f"Valid: {sorted(_PRECISION_STRINGS)}"
        ) from None
    if key.startswith("BF16"):
        return key
    import jax

    return getattr(jax.lax.Precision, key)


def set_configs(name: str, value=None):
    """Set a global configuration value.

    Mirrors ``adelie.configs.set_configs`` (reference adelie/configs.py:4-27):
    ``value=None`` resets the field to its default.
    """
    names = {f.name for f in fields(Configs)}
    if name not in names:
        raise ValueError(f"Unknown config: {name!r}. Valid: {sorted(names)}")
    if value is None:
        value = getattr(_default, name)
    setattr(configs, name, value)
    return value
