"""Solver router: sparsity profiling + algorithm selection + fallback.

Reference: ruvector-solver/src/router.rs — RouterConfig thresholds
(neumann spectral radius 0.95, CG condition 100, sublinear density 5%,
TRUE batch 100, push graph size 1000; :99-110), select_algorithm rule
order (:164-254), SolverOrchestrator solve_with_fallback (:351) and
analyze_sparsity (:480).

Routing rules are host-side control flow (they choose WHICH jitted
program runs, so they live outside jit by design). Spectral-radius and
condition estimates run on device via power iteration.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ruvector_tpu.graph.csr import CSRGraph
from ruvector_tpu.solver.iterative import (
    SolverResult,
    cg_solve,
    estimate_spectral_radius,
    neumann_solve,
)


@dataclasses.dataclass(frozen=True)
class RouterConfig:
    """Defaults per router.rs:99-110."""

    neumann_spectral_radius_threshold: float = 0.95
    cg_condition_threshold: float = 100.0
    sparsity_sublinear_threshold: float = 0.05
    true_batch_threshold: int = 100
    push_graph_size_threshold: int = 1_000


@dataclasses.dataclass
class SparsityProfile:
    rows: int
    nnz: int
    density: float
    is_diag_dominant: bool
    estimated_spectral_radius: float
    estimated_condition: float


def analyze_sparsity(matrix: CSRGraph) -> SparsityProfile:
    """Profile the matrix (router.rs:480): density, diagonal dominance,
    spectral radius (power iteration), crude condition estimate."""
    n = matrix.num_nodes
    rows = np.asarray(matrix.row_ids())
    cols = np.asarray(matrix.col_idx)
    vals = np.asarray(matrix.values)
    nnz = len(vals)

    diag = np.zeros(n)
    dm = rows == cols
    diag[rows[dm]] = vals[dm]
    offsum = np.zeros(n)
    np.add.at(offsum, rows[~dm], np.abs(vals[~dm]))
    diag_dom = bool(np.all(np.abs(diag) >= offsum - 1e-12))

    rho = float(estimate_spectral_radius(matrix))
    # crude condition estimate via Gershgorin bounds on an SPD-like matrix
    hi = np.max(np.abs(diag) + offsum)
    lo = max(np.min(np.abs(diag) - offsum), 1e-12)
    return SparsityProfile(
        rows=n, nnz=nnz, density=nnz / max(n * n, 1),
        is_diag_dominant=diag_dom, estimated_spectral_radius=rho,
        estimated_condition=float(hi / lo),
    )


class SolverRouter:
    def __init__(self, config: RouterConfig | None = None):
        self.config = config or RouterConfig()

    def select_algorithm(self, profile: SparsityProfile,
                         query: str = "linear_system",
                         batch_size: int = 1) -> str:
        """Rule order mirrors router.rs:164-254."""
        c = self.config
        if query == "pagerank_single":
            return "forward_push"
        if query == "pagerank_pairwise":
            return ("hybrid_random_walk"
                    if profile.rows > c.push_graph_size_threshold
                    else "forward_push")
        if query == "spectral_filter":
            return "neumann"
        if query == "batch_linear_system":
            return "true" if batch_size > c.true_batch_threshold else "cg"
        # linear_system: Neumann > CG > BMSSP
        if (profile.is_diag_dominant
                and profile.density < c.sparsity_sublinear_threshold
                and profile.estimated_spectral_radius
                < c.neumann_spectral_radius_threshold):
            return "neumann"
        if profile.estimated_condition < c.cg_condition_threshold:
            return "cg"
        return "bmssp"


class SolverOrchestrator:
    """Route then solve, with CG fallback on non-convergence
    (router.rs:351 solve_with_fallback)."""

    def __init__(self, config: RouterConfig | None = None):
        self.router = SolverRouter(config)

    def solve(self, matrix: CSRGraph, b, query: str = "linear_system",
              tolerance: float = 1e-6) -> tuple[SolverResult, str]:
        profile = analyze_sparsity(matrix)
        algo = self.router.select_algorithm(profile, query)
        result = self._dispatch(algo, matrix, b, tolerance)
        if not result.converged and algo != "cg":
            fallback = self._dispatch("cg", matrix, b, tolerance)
            if fallback.converged:
                return fallback, "cg"
        return result, algo

    def _dispatch(self, algo: str, matrix: CSRGraph, b,
                  tolerance: float) -> SolverResult:
        if algo == "neumann":
            return neumann_solve(matrix, b, tolerance=tolerance)
        if algo == "cg":
            return cg_solve(matrix, b, tolerance=tolerance)
        if algo == "bmssp":
            from ruvector_tpu.solver.bmssp import BmsspSolver

            rows = np.asarray(matrix.row_ids())
            solver = BmsspSolver(tolerance=tolerance).setup(
                rows, np.asarray(matrix.col_idx), np.asarray(matrix.values),
                matrix.num_nodes)
            x, rnorm, iters = solver.solve(np.asarray(b))
            bnorm = float(np.linalg.norm(np.asarray(b))) + 1e-30
            return SolverResult(x=x, residual_norm=rnorm, iterations=iters,
                                converged=rnorm / bnorm <= tolerance * 10)
        if algo == "true":
            from ruvector_tpu.solver.true_solver import TrueSolver

            x = TrueSolver().solve(matrix, b)
            return SolverResult(x=x, residual_norm=float("nan"),
                                iterations=1, converged=True)
        raise ValueError(f"unknown algorithm {algo}")
