"""TRUE solver: sketched solve via Johnson-Lindenstrauss projection.

Reference: ruvector-solver/src/true_solver.rs — three-phase pipeline
(JL projection to k = O(log n / eps^2), spectral sparsification, Neumann
solve on the sketch, back-projection), eps split eps/3 per phase, cached
preprocessing for repeated right-hand sides, deterministic seed.

TPU re-design: the sketch S is a dense sign matrix [k, n] (k is tiny), so
S A S^T collapses to two MXU matmuls after one sparse-dense product —
exactly the op mix the MXU is built for. The k x k sketched system is then
solved directly (dense Cholesky-class solve beats a Neumann loop at this
size). Sparsification is unnecessary on TPU — the sketch is already dense
and small — so phase 2 is folded into phase 1, which only tightens the
error budget. Preprocessing (S and the factorized sketch) is cached for
repeated right-hand sides as in the reference.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ruvector_tpu.graph.csr import CSRGraph


class TrueSolver:
    """Approximate solve x ~= S^T (S A S^T)^-1 S b with JL sketch S."""

    def __init__(self, tolerance: float = 0.1, jl_dimension: int = 0,
                 seed: int = 42, ridge: float = 1e-6):
        if not (0.0 < tolerance < 1.0):
            raise ValueError("tolerance must be in (0, 1)")
        self.tolerance = tolerance
        self.jl_dimension = jl_dimension
        self.seed = seed
        self.ridge = ridge
        self._prep = None       # (S [k,n], sketched A [k,k]) cached

    def _dimension(self, n: int) -> int:
        if self.jl_dimension:
            return min(self.jl_dimension, n)
        eps = self.tolerance / 3.0
        return min(n, max(8, int(math.ceil(4.0 * math.log(max(n, 2)) / eps**2 / 100))))

    def preprocess(self, matrix: CSRGraph):
        """Build and cache the sketch (true_solver.rs TruePreprocessing)."""
        n = matrix.num_nodes
        k = self._dimension(n)
        key = jax.random.key(self.seed)
        s = jax.random.rademacher(key, (k, n), dtype=jnp.float32) / jnp.sqrt(k)
        rows = matrix.row_ids()

        @jax.jit
        def sketch(s):
            # A S^T: one segment-sum sparse product, then S (A S^T) on MXU
            ast = jax.ops.segment_sum(
                matrix.values[:, None] * s.T[matrix.col_idx], rows,
                num_segments=n)                       # [n, k]
            return s @ ast                            # [k, k]

        a_k = sketch(s) + self.ridge * jnp.eye(k)
        self._prep = (s, a_k)
        return self

    def solve(self, matrix: CSRGraph, b) -> np.ndarray:
        if self._prep is None:
            self.preprocess(matrix)
        s, a_k = self._prep
        b = jnp.asarray(b, jnp.float32)

        @jax.jit
        def run(b):
            bk = s @ b
            xk = jnp.linalg.solve(a_k, bk)
            return s.T @ xk

        return np.asarray(run(b))
