"""Iterative sparse linear solvers over CSR: Neumann series, CG, Jacobi.

Reference: ruvector-solver — NeumannSolver (neumann.rs:94-250: x = Σ (I-A)^k b
with spectral-radius guard), ConjugateGradient (cg.rs:232+: f64-accumulated
dots, optional Jacobi preconditioner), compute budgets.

TPU form: each solver is one jitted lax.while_loop with (tolerance,
max_iterations) static; SpMV is the CSR segment-sum kernel (MXU/VPU).
Residual norms accumulate in f32 with stable jnp reductions (the reference
uses f64 on CPU; tests pin equivalent tolerances).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ruvector_tpu.graph.csr import CSRGraph
from ruvector_tpu.ops.segment import spmm_csr


@dataclasses.dataclass
class SolverResult:
    x: jax.Array
    iterations: int
    residual_norm: float
    converged: bool


def _spmv(matrix: CSRGraph, x: jax.Array) -> jax.Array:
    return spmm_csr(matrix, x[:, None])[:, 0]


def estimate_spectral_radius(matrix: CSRGraph, iters: int = 20) -> float:
    """Power-iteration estimate of rho(I - A) (neumann.rs:117-190)."""
    n = matrix.num_nodes

    @jax.jit
    def run():
        v0 = jnp.ones((n,)) / jnp.sqrt(jnp.asarray(n, jnp.float32))

        def step(v, _):
            w = v - _spmv(matrix, v)          # (I - A) v
            nrm = jnp.linalg.norm(w)
            return jnp.where(nrm > 1e-12, w / jnp.maximum(nrm, 1e-12), v), nrm

        v, norms = jax.lax.scan(step, v0, None, length=iters)
        return norms[-1]

    return float(run())


@partial(jax.jit, static_argnames=("max_iterations",))
def _neumann_loop(matrix: CSRGraph, b: jax.Array, tolerance: float,
                  max_iterations: int):
    def cond(carry):
        k, x, term, term_norm = carry
        return (k < max_iterations) & (term_norm > tolerance)

    def body(carry):
        k, x, term, _ = carry
        new_term = term - _spmv(matrix, term)      # (I - A) term
        x = x + new_term
        return k + 1, x, new_term, jnp.linalg.norm(new_term)

    k0 = jnp.int32(0)
    carry = (k0, b, b, jnp.linalg.norm(b))
    k, x, _, term_norm = jax.lax.while_loop(cond, body, carry)
    residual = jnp.linalg.norm(b - _spmv(matrix, x))
    return x, k, residual


def neumann_solve(matrix: CSRGraph, b, tolerance: float = 1e-6,
                  max_iterations: int = 500) -> SolverResult:
    """x = Σ_k (I-A)^k b — converges when rho(I-A) < 1 (diagonally dominant
    A; neumann.rs:195-250)."""
    b = jnp.asarray(b, jnp.float32)
    x, k, res = _neumann_loop(matrix, b, tolerance, max_iterations)
    res = float(res)
    return SolverResult(x, int(k), res, res <= tolerance * max(float(jnp.linalg.norm(b)), 1.0))


@partial(jax.jit, static_argnames=("max_iterations", "precondition"))
def _cg_loop(matrix: CSRGraph, b: jax.Array, tolerance: float,
             max_iterations: int, precondition: bool):
    n = matrix.num_nodes
    # Jacobi preconditioner: M^-1 = 1/diag(A)
    if precondition:
        rows = matrix.row_ids()
        diag_mask = matrix.col_idx == rows
        diag = jax.ops.segment_sum(
            jnp.where(diag_mask, matrix.values, 0.0), rows, num_segments=n
        )
        minv = jnp.where(jnp.abs(diag) > 1e-12, 1.0 / diag, 1.0)
    else:
        minv = jnp.ones((n,))

    x0 = jnp.zeros_like(b)
    r0 = b
    z0 = minv * r0
    p0 = z0
    rz0 = jnp.dot(r0, z0)

    def cond(c):
        k, x, r, z, p, rz = c
        return (k < max_iterations) & (jnp.linalg.norm(r) > tolerance)

    def body(c):
        k, x, r, z, p, rz = c
        ap = _spmv(matrix, p)
        denom = jnp.dot(p, ap)
        alpha = jnp.where(jnp.abs(denom) > 1e-30, rz / denom, 0.0)
        x = x + alpha * p
        r = r - alpha * ap
        z = minv * r
        rz_new = jnp.dot(r, z)
        beta = jnp.where(jnp.abs(rz) > 1e-30, rz_new / rz, 0.0)
        p = z + beta * p
        return k + 1, x, r, z, p, rz_new

    k, x, r, *_ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), x0, r0, z0, p0, rz0)
    )
    return x, k, jnp.linalg.norm(r)


def cg_solve(matrix: CSRGraph, b, tolerance: float = 1e-6,
             max_iterations: int = 1000,
             use_preconditioner: bool = False) -> SolverResult:
    """Conjugate gradients for SPD A (cg.rs:232+)."""
    b = jnp.asarray(b, jnp.float32)
    x, k, res = _cg_loop(matrix, b, tolerance, max_iterations, use_preconditioner)
    res = float(res)
    return SolverResult(x, int(k), res, res <= tolerance)


@partial(jax.jit, static_argnames=("max_iterations",))
def _jacobi_loop(matrix: CSRGraph, b, tolerance, max_iterations):
    n = matrix.num_nodes
    rows = matrix.row_ids()
    diag_mask = matrix.col_idx == rows
    diag = jax.ops.segment_sum(
        jnp.where(diag_mask, matrix.values, 0.0), rows, num_segments=n
    )
    dinv = jnp.where(jnp.abs(diag) > 1e-12, 1.0 / diag, 0.0)

    def cond(c):
        k, x, res = c
        return (k < max_iterations) & (res > tolerance)

    def body(c):
        k, x, _ = c
        # x' = D^-1 (b - (A - D) x) = x + D^-1 (b - A x)
        r = b - _spmv(matrix, x)
        x = x + dinv * r
        return k + 1, x, jnp.linalg.norm(r)

    k, x, res = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.zeros_like(b), jnp.inf)
    )
    return x, k, jnp.linalg.norm(b - _spmv(matrix, x))


def jacobi_solve(matrix: CSRGraph, b, tolerance: float = 1e-6,
                 max_iterations: int = 1000) -> SolverResult:
    b = jnp.asarray(b, jnp.float32)
    x, k, res = _jacobi_loop(matrix, b, tolerance, max_iterations)
    res = float(res)
    return SolverResult(x, int(k), res, res <= tolerance)
