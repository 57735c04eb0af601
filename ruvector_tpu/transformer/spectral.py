"""Spectral position encoding from min-cut boundary structure.

Reference: ruvector-mincut-gated-transformer/src/spectral.rs — SparseCSR
(:27-80), Laplacian from boundary edges (:222-290), power iteration
(:453-556), Lanczos (:557-750), SpectralPositionEncoder (:188-450).

TPU: SpMV is the padded spmm; iterations are lax.scan-driven and
deterministic (fixed iteration counts, fixed start vector).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ruvector_tpu.graph.csr import CSRGraph
from ruvector_tpu.ops.segment import spmm_csr


@dataclasses.dataclass(frozen=True)
class SpectralPEConfig:
    num_eigenvectors: int = 4
    max_iters: int = 32
    normalized: bool = True


def laplacian_from_edges(boundary_edges: list[tuple[int, int]], n: int,
                         normalized: bool = False) -> np.ndarray:
    """Dense (normalized) graph Laplacian L = D - A from undirected edges
    (spectral.rs:222-290)."""
    a = np.zeros((n, n), np.float32)
    for (i, j) in boundary_edges:
        if i < n and j < n and i != j:
            a[i, j] = 1.0
            a[j, i] = 1.0
    d = a.sum(axis=1)
    lap = np.diag(d) - a
    if normalized:
        dinv = np.where(d > 0, 1.0 / np.sqrt(np.maximum(d, 1e-12)), 0.0)
        lap = dinv[:, None] * lap * dinv[None, :]
    return lap


def power_iteration(matrix: jax.Array, num_iters: int = 32) -> jax.Array:
    """Dominant eigenvector via deterministic power iteration
    (spectral.rs:453-500). Start vector = normalized ones."""
    n = matrix.shape[0]
    v0 = jnp.ones((n,)) / jnp.sqrt(jnp.asarray(n, jnp.float32))

    def step(v, _):
        w = matrix @ v
        norm = jnp.linalg.norm(w)
        v = jnp.where(norm > 1e-12, w / jnp.maximum(norm, 1e-12), v)
        return v, None

    v, _ = jax.lax.scan(step, v0, None, length=num_iters)
    return v


def power_iteration_sparse(csr: CSRGraph, num_iters: int = 32) -> jax.Array:
    """Sparse variant using CSR SpMV (spectral.rs:503-556)."""
    n = csr.num_nodes
    v0 = jnp.ones((n, 1)) / jnp.sqrt(jnp.asarray(n, jnp.float32))

    def step(v, _):
        w = spmm_csr(csr, v)
        norm = jnp.linalg.norm(w)
        v = jnp.where(norm > 1e-12, w / jnp.maximum(norm, 1e-12), v)
        return v, None

    v, _ = jax.lax.scan(step, v0, None, length=num_iters)
    return v[:, 0]


def lanczos(matrix: jax.Array, k: int, max_iters: int = 32
            ) -> tuple[np.ndarray, np.ndarray]:
    """Smallest-k eigenpairs via Lanczos tridiagonalization
    (spectral.rs:557-750). Returns (eigenvalues [k], eigenvectors [n, k]).

    Deterministic: fixed start vector, full reorthogonalization.
    """
    mat = np.asarray(matrix, np.float64)
    n = mat.shape[0]
    m = min(max_iters, n)
    q = np.zeros((n, m + 1))
    alpha = np.zeros(m)
    beta = np.zeros(m + 1)
    # deterministic seeded start: a uniform start has zero overlap with
    # antisymmetric eigenvectors on symmetric graphs and the Krylov space
    # never finds them — seeded noise breaks the symmetry reproducibly.
    v0 = np.random.default_rng(42).normal(size=n)
    q[:, 0] = v0 / np.linalg.norm(v0)
    for j in range(m):
        w = mat @ q[:, j]
        alpha[j] = q[:, j] @ w
        w = w - alpha[j] * q[:, j] - (beta[j] * q[:, j - 1] if j > 0 else 0)
        # full reorthogonalization for stability
        w -= q[:, : j + 1] @ (q[:, : j + 1].T @ w)
        beta[j + 1] = np.linalg.norm(w)
        if beta[j + 1] < 1e-10:
            m = j + 1
            break
        q[:, j + 1] = w / beta[j + 1]
    t = np.diag(alpha[:m]) + np.diag(beta[1:m], 1) + np.diag(beta[1:m], -1)
    evals, evecs = np.linalg.eigh(t)
    k = min(k, m)
    ritz = q[:, :m] @ evecs[:, :k]
    return evals[:k].astype(np.float32), ritz.astype(np.float32)


class SpectralPositionEncoder:
    """Positions from Laplacian eigenvectors (spectral.rs:188-450)."""

    def __init__(self, config: SpectralPEConfig = SpectralPEConfig()):
        self.config = config

    def encode_from_edges(
        self, boundary_edges: list[tuple[int, int]], n: int
    ) -> np.ndarray:
        """[n, num_eigenvectors] spectral PE. Skips the trivial 0-eigenvector."""
        if n == 0:
            return np.zeros((0, self.config.num_eigenvectors), np.float32)
        lap = laplacian_from_edges(boundary_edges, n, self.config.normalized)
        evals, evecs = lanczos(jnp.asarray(lap), self.config.num_eigenvectors + 1,
                               self.config.max_iters)
        pe = evecs[:, 1 : self.config.num_eigenvectors + 1]
        if pe.shape[1] < self.config.num_eigenvectors:
            pe = np.pad(pe, ((0, 0), (0, self.config.num_eigenvectors - pe.shape[1])))
        return pe

    def spectral_distance(self, pe: np.ndarray, i: int, j: int) -> float:
        return float(np.linalg.norm(pe[i] - pe[j]))

    def add_to_embeddings(self, embeddings: jax.Array, pe: np.ndarray,
                          scale: float = 1.0) -> jax.Array:
        """Project PE into the embedding (broadcast-add first PE dims)."""
        d = embeddings.shape[-1]
        k = pe.shape[1]
        pad = jnp.zeros((pe.shape[0], d - k)) if d > k else None
        pe_full = jnp.concatenate([jnp.asarray(pe[:, :d]), pad], axis=-1) \
            if pad is not None else jnp.asarray(pe[:, :d])
        return embeddings + scale * pe_full
