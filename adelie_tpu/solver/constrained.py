"""Constraint support hooks for grpnet (reference: per-group constraint
objects plugged into the pin solver, solver_gaussian_pin_naive.hpp:420-459).

Round-1 status: the constraint classes live in ``adelie_tpu.constraint``;
wiring them into the jitted pin solver lands with the constrained CD kernel.
"""


def check_constraints_supported(constraints):
    raise NotImplementedError(
        "Per-group constraints are not wired into grpnet yet in adelie_tpu; "
        "see adelie_tpu.constraint for the standalone constraint solvers."
    )
