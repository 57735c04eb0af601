"""BMSSP: algebraic-multigrid V-cycle solver for SPD / Laplacian systems.

Reference: ruvector-solver/src/bmssp.rs — aggregation-based coarsening
(strong-connection threshold 0.25, target aggregate size 4), V-cycles with
3 smoothing sweeps, dense direct solve at the coarsest level (<=100),
O(nnz log n) per solve.

TPU re-design: the reference smooths with Gauss-Seidel, which is a
sequential dependence chain — hostile to SPMD. We smooth with weighted
Jacobi (omega=2/3), the classical parallel AMG smoother with the same
V-cycle convergence class. Coarsening runs once on host (greedy
aggregation over CSR); the hierarchy's restriction is a segment_sum by
aggregate id and prolongation a gather — both native TPU ops — so the
whole V-cycle jits as a static unrolled program per hierarchy.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

STRONG_THRESHOLD = 0.25
SMOOTH_STEPS = 3
COARSEST_DIRECT_LIMIT = 100
TARGET_AGGREGATE_SIZE = 4


@dataclasses.dataclass
class _Level:
    """One grid level: CSR of A plus the aggregate map to the next level."""

    row: np.ndarray          # COO rows of A at this level
    col: np.ndarray
    val: np.ndarray
    n: int
    diag: np.ndarray
    agg: np.ndarray | None   # [n] aggregate id into the coarser level


def _coarsen(row, col, val, n) -> np.ndarray:
    """Greedy aggregation (bmssp.rs setup): each unaggregated node seeds an
    aggregate with its strong neighbors; leftovers join a strong neighbor's
    aggregate."""
    # strength: |a_ij| >= theta * sqrt(|a_ii a_jj|)
    diag = np.zeros(n)
    dmask = row == col
    diag[row[dmask]] = val[dmask]
    off = ~dmask
    strong = np.abs(val[off]) >= STRONG_THRESHOLD * np.sqrt(
        np.abs(diag[row[off]] * diag[col[off]]) + 1e-30)
    sr, sc = row[off][strong], col[off][strong]

    nbrs: list[list[int]] = [[] for _ in range(n)]
    for a, b in zip(sr, sc):
        nbrs[a].append(int(b))

    agg = np.full(n, -1, np.int64)
    next_agg = 0
    for i in range(n):
        if agg[i] >= 0:
            continue
        members = [i] + [j for j in nbrs[i] if agg[j] < 0]
        members = members[:TARGET_AGGREGATE_SIZE]
        for j in members:
            agg[j] = next_agg
        next_agg += 1
    # attach stragglers (none with the loop above, but keep the guard)
    for i in range(n):
        if agg[i] < 0:
            agg[i] = next_agg
            next_agg += 1
    return agg


def _galerkin(row, col, val, agg, nc):
    """Coarse operator A_c = P^T A P with piecewise-constant P (host)."""
    cr, cc = agg[row], agg[col]
    # sum duplicates
    key = cr * nc + cc
    order = np.argsort(key, kind="stable")
    key, cr, cc, v = key[order], cr[order], cc[order], val[order]
    uniq, start = np.unique(key, return_index=True)
    sums = np.add.reduceat(v, start)
    return uniq // nc, uniq % nc, sums


class BmsspSolver:
    """AMG hierarchy; setup on host, V-cycle jitted on device."""

    def __init__(self, tolerance: float = 1e-8, max_cycles: int = 200,
                 omega: float = 2.0 / 3.0):
        self.tolerance = tolerance
        self.max_cycles = max_cycles
        self.omega = omega
        self._levels: list[_Level] = []
        self._coarse_dense: np.ndarray | None = None

    def setup(self, row, col, val, n: int) -> "BmsspSolver":
        row, col, val = (np.asarray(row), np.asarray(col),
                         np.asarray(val, np.float64))
        self._levels = []
        while n > COARSEST_DIRECT_LIMIT and len(self._levels) < 20:
            diag = np.zeros(n)
            dm = row == col
            diag[row[dm]] = val[dm]
            agg = _coarsen(row, col, val, n)
            nc = int(agg.max()) + 1
            if nc >= n:        # coarsening stalled
                break
            self._levels.append(_Level(row, col, val, n, diag, agg))
            row, col, val = _galerkin(row, col, val, agg, nc)
            n = nc
        diag = np.zeros(n)
        dm = row == col
        diag[row[dm]] = val[dm]
        self._levels.append(_Level(row, col, val, n, diag, None))
        dense = np.zeros((n, n))
        dense[row, col] = val
        self._coarse_dense = dense
        return self

    def _device_args(self):
        out = []
        for lv in self._levels:
            out.append((jnp.asarray(lv.row), jnp.asarray(lv.col),
                        jnp.asarray(lv.val, jnp.float32), lv.n,
                        jnp.asarray(np.where(lv.diag == 0, 1.0, lv.diag),
                                    jnp.float32),
                        None if lv.agg is None else jnp.asarray(lv.agg)))
        return out, jnp.asarray(self._coarse_dense, jnp.float32)

    def solve(self, b, x0=None):
        """Run V-cycles until ||r|| < tol * ||b|| or max_cycles."""
        levels, coarse = self._device_args()
        b = jnp.asarray(b, jnp.float32)
        x = jnp.zeros_like(b) if x0 is None else jnp.asarray(x0, jnp.float32)
        omega = self.omega

        def spmv(lv, v):
            row, col, val, n, _, _ = lv
            return jax.ops.segment_sum(val * v[col], row, num_segments=n)

        def smooth(lv, x, rhs):
            _, _, _, _, diag, _ = lv
            for _ in range(SMOOTH_STEPS):
                x = x + omega * (rhs - spmv(lv, x)) / diag
            return x

        def vcycle(i, rhs):
            lv = levels[i]
            x = smooth(lv, jnp.zeros_like(rhs), rhs)
            if lv[5] is None:                     # coarsest
                return jnp.linalg.solve(
                    coarse + 1e-6 * jnp.eye(coarse.shape[0]), rhs)
            r = rhs - spmv(lv, x)
            nc = levels[i + 1][3]
            rc = jax.ops.segment_sum(r, lv[5], num_segments=nc)   # P^T r
            ec = vcycle(i + 1, rc)
            x = x + ec[lv[5]]                     # P e_c
            return smooth(lv, x, rhs)

        @jax.jit
        def run(b, x):
            bnorm = jnp.linalg.norm(b) + 1e-30

            def cond(c):
                k, x = c
                r = b - spmv(levels[0], x)
                return (k < self.max_cycles) & (
                    jnp.linalg.norm(r) / bnorm > self.tolerance)

            def body(c):
                k, x = c
                r = b - spmv(levels[0], x)
                return k + 1, x + vcycle(0, r)

            k, x = jax.lax.while_loop(cond, body, (jnp.int32(0), x))
            r = b - spmv(levels[0], x)
            return x, jnp.linalg.norm(r), k

        x, rnorm, k = run(b, x)
        return np.asarray(x), float(rnorm), int(k)
