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
from ruvector_tpu.solver.bmssp import BmsspSolver
from ruvector_tpu.solver.true_solver import TrueSolver
from ruvector_tpu.solver.router import (
    RouterConfig,
    SparsityProfile,
    SolverRouter,
    SolverOrchestrator,
    analyze_sparsity,
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
    "BmsspSolver",
    "TrueSolver",
    "RouterConfig",
    "SparsityProfile",
    "SolverRouter",
    "SolverOrchestrator",
    "analyze_sparsity",
]
