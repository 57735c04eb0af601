"""Economic graph attention: Shapley attribution + Nash-style equilibria.

Reference: ruvector-graph-transformer/src/economic.rs —
ShapleyAttention (:269, compute :310): Monte-Carlo permutation Shapley
values attributing the attention output's quality to individual nodes;
GameTheoreticAttention (:31): iterated best-response to a Nash-like
attention allocation; IncentiveAlignedMPNN (:440): stake-weighted message
passing with slashing.

TPU notes: all permutations evaluate as one batched `vmap` over
prefix-coalition masks — the value function is a masked attention readout,
so the whole Monte-Carlo estimate is a single compiled program. PRNG is
explicit (jax.random) and deterministic per seed."""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp


def _coalition_value(x, query, mask):
    """Value of a coalition = how well masked attention over member nodes
    reconstructs the query's target read-out (cosine to the full read)."""
    d = x.shape[-1]
    scores = (x @ query) / jnp.sqrt(jnp.asarray(d, jnp.float32))
    scores = jnp.where(mask > 0, scores, -jnp.inf)
    w = jax.nn.softmax(scores)
    w = jnp.where(jnp.any(mask > 0), w, jnp.zeros_like(w))
    read = w @ x
    return jnp.dot(read, query) / (
        jnp.linalg.norm(read) * jnp.linalg.norm(query) + 1e-9)


@partial(jax.jit, static_argnames=("num_permutations",))
def shapley_attention(x, query, key, num_permutations: int = 32):
    """Monte-Carlo Shapley values phi [n] (economic.rs:310): for random
    permutations, phi_i averages the marginal value of adding node i to
    the prefix coalition. Efficiency holds in expectation:
    sum(phi) ~= v(all) - v(empty)."""
    n = x.shape[0]
    perms = jax.vmap(
        lambda k: jax.random.permutation(k, n))(
        jax.random.split(key, num_permutations))          # [P, n]

    def one_perm(perm):
        # prefix masks: mask[j] includes perm[:j]
        pos = jnp.argsort(perm)                           # node -> position
        def marginal(j):
            before = (pos < j).astype(jnp.float32)
            after = (pos <= j).astype(jnp.float32)
            return (_coalition_value(x, query, after)
                    - _coalition_value(x, query, before))
        margins = jax.vmap(marginal)(jnp.arange(n))       # by position
        return jnp.zeros(n).at[perm].set(margins)

    return jnp.mean(jax.vmap(one_perm)(perms), axis=0)


@partial(jax.jit, static_argnames=("iters",))
def nash_attention(x, stakes, temperature: float = 1.0, iters: int = 20):
    """Iterated best-response (economic.rs:31-71): each node allocates
    attention to maximize payoff = affinity - congestion, where congestion
    grows with total attention a target receives. Fixed point ~= Nash
    equilibrium of the congestion game. Returns (allocation [n, n],
    payoffs [n])."""
    n, d = x.shape
    affinity = (x @ x.T) / jnp.sqrt(jnp.asarray(d, jnp.float32))
    affinity = affinity * stakes[None, :]

    def step(alloc, _):
        congestion = jnp.sum(alloc, axis=0, keepdims=True)   # demand per target
        payoff = affinity - congestion
        best = jax.nn.softmax(payoff / temperature, axis=-1)
        return 0.5 * alloc + 0.5 * best, None                # damped response

    alloc0 = jnp.full((n, n), 1.0 / n)
    alloc, _ = jax.lax.scan(step, alloc0, None, length=iters)
    payoffs = jnp.sum(alloc * (affinity - jnp.sum(alloc, 0, keepdims=True)),
                      axis=1)
    return alloc, payoffs


@dataclasses.dataclass
class IncentiveState:
    stakes: jax.Array        # [n] >= 0


def incentive_aligned_step(x, graph_nbr_idx, graph_nbr_mask,
                           state: IncentiveState, min_stake: float = 0.1,
                           slash_fraction: float = 0.5):
    """Stake-weighted message passing with slashing (economic.rs:440-487):
    nodes whose messages diverge from the neighborhood consensus are
    slashed; stakes below min_stake stop contributing."""
    stakes = state.stakes
    active = (stakes >= min_stake).astype(jnp.float32)
    w = graph_nbr_mask * active[graph_nbr_idx] * stakes[graph_nbr_idx]
    denom = jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1e-9)
    consensus = jnp.sum(w[..., None] * x[graph_nbr_idx], axis=1) / denom
    # deviation of each node's own message from the consensus of its peers
    dev = jnp.linalg.norm(x - consensus, axis=-1)
    slashed = dev > jnp.mean(dev) + 2.0 * jnp.std(dev)
    new_stakes = jnp.where(slashed, stakes * (1.0 - slash_fraction), stakes)
    return consensus, IncentiveState(stakes=new_stakes), slashed
