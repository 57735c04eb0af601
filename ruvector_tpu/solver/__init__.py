from ruvector_tpu.solver.iterative import (
    SolverResult,
    neumann_solve,
    cg_solve,
    estimate_spectral_radius,
    jacobi_solve,
)
from ruvector_tpu.solver.push import (
    forward_push_ppr,
    backward_push_ppr,
    ppr_power_iteration,
    random_walk_ppr,
)

__all__ = [
    "SolverResult",
    "neumann_solve",
    "cg_solve",
    "estimate_spectral_radius",
    "jacobi_solve",
    "forward_push_ppr",
    "backward_push_ppr",
    "ppr_power_iteration",
    "random_walk_ppr",
]
