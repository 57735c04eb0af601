"""Biological graph attention: spiking dynamics, STDP, Hebbian learning.

Reference: ruvector-graph-transformer/src/biological.rs —
SpikingGraphAttention (:848): LIF membrane potentials gate attention;
lateral inhibition strategies (:133 InhibitionStrategy, k-winners apply
:167); StdpEdgeUpdater (:468, update_weights :512): pre/post spike-timing
weight updates; HebbianRule (:344, compute_update :377) with
HebbianNormBound projection (:263).

TPU re-design: spike generation is a hard threshold — non-differentiable
— so training uses the straight-through surrogate (sigmoid derivative),
the standard SNN-on-accelerator trick. LIF dynamics, STDP traces, and
Hebbian updates are all elementwise/outer-product ops that fuse into one
XLA program; the time loop is `lax.scan`.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ruvector_tpu.graph.neighbors import NeighborGraph


@dataclasses.dataclass(frozen=True)
class BiologicalConfig:
    threshold: float = 1.0
    leak: float = 0.9              # membrane decay per step
    refractory_drop: float = 1.0   # potential reset after spike
    k_winners: int = 0             # 0 = no lateral inhibition
    surrogate_slope: float = 4.0


def _spike(v, threshold, slope):
    """Heaviside spike with sigmoid surrogate gradient (straight-through)."""
    soft = jax.nn.sigmoid(slope * (v - threshold))
    hard = (v >= threshold).astype(v.dtype)
    return soft + jax.lax.stop_gradient(hard - soft)


def k_winners_take_all(v, spikes, k: int):
    """Lateral inhibition (biological.rs:167): only the k most-depolarized
    spiking nodes keep their spikes."""
    if k <= 0:
        return spikes
    masked = jnp.where(spikes > 0.5, v, -jnp.inf)
    kth = jnp.sort(masked)[-k]
    keep = (masked >= kth).astype(spikes.dtype)
    return spikes * keep


class SpikingGraphAttention:
    """LIF neurons on graph nodes; spikes gate neighbor aggregation."""

    def __init__(self, config: BiologicalConfig = BiologicalConfig()):
        self.config = config

    @partial(jax.jit, static_argnames=("self", "steps"))
    def forward(self, x, graph: NeighborGraph, steps: int = 8):
        """Returns (aggregated [n,d], spike_counts [n], final potentials).

        Each step: potentials integrate input drive + spiking-neighbor
        messages, spike, reset, and (optionally) laterally inhibit."""
        cfg = self.config
        n, d = x.shape
        drive = jnp.linalg.norm(x, axis=-1) / jnp.sqrt(d)

        def step(carry, _):
            v, agg = carry
            nbr_spk = _spike(v, cfg.threshold, cfg.surrogate_slope)
            nbr_spk = k_winners_take_all(v, nbr_spk, cfg.k_winners)
            # spiking neighbors deliver their features
            msg = jnp.sum(
                graph.nbr_mask[..., None] * nbr_spk[graph.nbr_idx][..., None]
                * x[graph.nbr_idx], axis=1)
            v_new = cfg.leak * v + drive + 0.1 * jnp.linalg.norm(msg, axis=-1)
            v_new = v_new - nbr_spk * cfg.refractory_drop
            return (v_new, agg + nbr_spk[:, None] * msg), nbr_spk

        v0 = jnp.zeros((n,))
        (v, agg), spikes = jax.lax.scan(
            step, (v0, jnp.zeros_like(x)), None, length=steps)
        counts = jnp.sum(spikes, axis=0)
        return agg / jnp.maximum(counts[:, None], 1.0), counts, v


@dataclasses.dataclass(frozen=True)
class StdpConfig:
    a_plus: float = 0.01
    a_minus: float = 0.012
    tau_plus: float = 20.0
    tau_minus: float = 20.0
    w_min: float = 0.0
    w_max: float = 1.0


@partial(jax.jit, static_argnames=())
def stdp_update(edge_weight, pre_trace, post_trace, pre_spikes, post_spikes,
                graph: NeighborGraph, cfg: StdpConfig = StdpConfig()):
    """One STDP step (biological.rs:512): exponential eligibility traces;
    pre-before-post potentiates (+A+ * pre_trace at post spike),
    post-before-pre depresses (-A- * post_trace at pre spike).

    edge_weight: [n, m] padded; pre = neighbor j, post = center i.
    Returns (new_weights, new_pre_trace, new_post_trace)."""
    pre_trace = pre_trace * jnp.exp(-1.0 / cfg.tau_plus) + pre_spikes
    post_trace = post_trace * jnp.exp(-1.0 / cfg.tau_minus) + post_spikes

    pre_t = pre_trace[graph.nbr_idx]        # [n, m] trace of each neighbor
    pre_s = pre_spikes[graph.nbr_idx]
    dw = (cfg.a_plus * pre_t * post_spikes[:, None]      # post fired now
          - cfg.a_minus * post_trace[:, None] * pre_s)   # pre fired now
    w = jnp.clip(edge_weight + graph.nbr_mask * dw, cfg.w_min, cfg.w_max)
    return w, pre_trace, post_trace


def hebbian_update(w, pre, post, rule: str = "oja", lr: float = 0.01,
                   norm_bound: float | None = None):
    """Hebbian/Oja update (biological.rs:344-424): hebbian dw = lr*post*pre;
    oja adds the decay -lr*post^2*w that bounds the norm. Optional hard
    norm-bound projection (HebbianNormBound:263-309)."""
    outer = post[:, None] * pre[None, :]
    if rule == "hebbian":
        w = w + lr * outer
    elif rule == "oja":
        w = w + lr * (outer - (post ** 2)[:, None] * w)
    else:
        raise ValueError(rule)
    if norm_bound is not None:
        nrm = jnp.linalg.norm(w)
        w = jnp.where(nrm > norm_bound, w * (norm_bound / nrm), w)
    return w
