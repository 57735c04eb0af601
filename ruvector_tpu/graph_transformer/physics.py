"""Physics-informed graph networks: Hamiltonian dynamics + conservative PDE.

Reference: ruvector-graph-transformer/src/physics.rs —
HamiltonianGraphNet (:38, init_state :102, step :133, forward :155):
symplectic integration of node states (q, p) under a learned graph
Hamiltonian, reporting energy drift; ConservativePdeAttention (:640):
mass-conserving diffusion attention.

TPU re-design: the reference hand-codes dH/dq and dH/dp; here the force
IS `jax.grad` of a scalar Hamiltonian function, so any energy form stays
symplectic by construction. Leapfrog runs as a `lax.scan` — one fused
program for the whole trajectory.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ruvector_tpu.graph.neighbors import NeighborGraph


@dataclasses.dataclass(frozen=True)
class PhysicsConfig:
    dt: float = 0.01
    coupling: float = 0.1       # strength of the graph potential
    mass: float = 1.0


def hamiltonian(q, p, graph: NeighborGraph, cfg: PhysicsConfig):
    """H = kinetic + on-site quartic + graph coupling (spring energy over
    edges). Scalar — forces come from jax.grad."""
    kinetic = 0.5 * jnp.sum(p * p) / cfg.mass
    onsite = jnp.sum(0.25 * q ** 4)
    nbr_q = q[graph.nbr_idx]                                # [n, m, d]
    spring = graph.nbr_mask[..., None] * (q[:, None, :] - nbr_q) ** 2
    coupling = 0.25 * cfg.coupling * jnp.sum(spring)        # each edge twice
    return kinetic + onsite + coupling


class HamiltonianGraphNet:
    """Leapfrog (Stormer-Verlet) integrator over the graph Hamiltonian."""

    def __init__(self, config: PhysicsConfig = PhysicsConfig()):
        self.config = config

    def init_state(self, node_features):
        """q = features, p = 0 (physics.rs:102)."""
        q = jnp.asarray(node_features, jnp.float32)
        return q, jnp.zeros_like(q)

    @partial(jax.jit, static_argnames=("self", "steps"))
    def forward(self, q, p, graph: NeighborGraph, steps: int = 10):
        """Integrate `steps` leapfrog steps; returns (q, p, energy_trace).

        Symplectic: H is conserved to O(dt^2) — the energy trace is the
        drift certificate (physics.rs HamiltonianStepResult)."""
        cfg = self.config
        dH_dq = jax.grad(hamiltonian, argnums=0)
        dH_dp = jax.grad(hamiltonian, argnums=1)

        def leapfrog(carry, _):
            q, p = carry
            p = p - 0.5 * cfg.dt * dH_dq(q, p, graph, cfg)
            q = q + cfg.dt * dH_dp(q, p, graph, cfg)
            p = p - 0.5 * cfg.dt * dH_dq(q, p, graph, cfg)
            return (q, p), hamiltonian(q, p, graph, cfg)

        (q, p), energies = jax.lax.scan(leapfrog, (q, p), None, length=steps)
        return q, p, energies


@partial(jax.jit, static_argnames=("steps",))
def conservative_pde_attention(x, graph: NeighborGraph, diffusion: float = 0.1,
                               dt: float = 0.1, steps: int = 5):
    """Mass-conserving graph diffusion (physics.rs:640-688): explicit Euler
    on dx/dt = -D L x with symmetric edge weights — sum(x) is invariant
    because L has zero row+column sums on the symmetrized graph.

    Returns (x_out, mass_drift) where mass_drift should be ~0."""
    mass0 = jnp.sum(x)

    deg = jnp.sum(graph.nbr_mask, axis=1, keepdims=True)

    def step(x, _):
        nbr = jnp.sum(graph.nbr_mask[..., None] * x[graph.nbr_idx], axis=1)
        lap = deg * x - nbr
        return x - dt * diffusion * lap, None

    x, _ = jax.lax.scan(step, x, None, length=steps)
    return x, jnp.sum(x) - mass0
