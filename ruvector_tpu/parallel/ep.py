"""Expert parallelism: MoE FFN with experts sharded over the mesh.

The reference's MoE (ruvector-attention/src/moe/) routes on a single
node; at scale experts must live on different chips. This is dense-
dispatch expert parallelism (Switch/Mesh-TF style): a one-hot dispatch
einsum builds per-expert token buckets, each device runs ONLY its own
experts' FFNs as local dense matmuls (MXU), and one psum reassembles the
combined output. In the replicated-activation (serving) regime this needs
no all_to_all at all; with token-sharded activations the same dispatch
becomes the classic two-all_to_all layout.

Dense dispatch materializes [E, T, D] — the right tradeoff when T fits
HBM comfortably (serving/medium batches). Capacity-factor dropping is
deliberately omitted: no token is ever dropped, so parity with the
unsharded oracle is exact.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class EpConfig:
    hidden: int
    ffn: int
    num_experts: int          # must be a multiple of the mesh axis size


def ep_init(key, cfg: EpConfig) -> dict:
    """Router + per-expert FFN weights (stacked on a leading expert axis)."""
    ks = jax.random.split(key, 3)
    scale1 = jnp.sqrt(2.0 / (cfg.hidden + cfg.ffn))
    return {
        "router": jax.random.normal(ks[0], (cfg.hidden, cfg.num_experts))
        * jnp.sqrt(1.0 / cfg.hidden),
        "w1": jax.random.normal(ks[1], (cfg.num_experts, cfg.hidden, cfg.ffn))
        * scale1,
        "w2": jax.random.normal(ks[2], (cfg.num_experts, cfg.ffn, cfg.hidden))
        * scale1,
    }


def _expert_ffn(w1, w2, x):
    return jax.nn.gelu(x @ w1) @ w2


def make_ep_forward(cfg: EpConfig, mesh: Mesh, axis_name: str = "nodes"):
    """Jitted forward(params, x [T, D]) -> [T, D]: top-1 routing, experts
    sharded over the mesh, two all_to_alls per layer."""
    n_dev = mesh.shape[axis_name]
    assert cfg.num_experts % n_dev == 0
    le = cfg.num_experts // n_dev            # experts per device

    def block(router, w1, w2, x):
        # x and router replicated; w1/w2 local [le, D, F] / [le, F, D].
        # Because activations are replicated, each device SLICES the token
        # buckets for its own experts directly from the dispatch einsum —
        # the only interconnect traffic is the final psum combine. (With
        # activations sharded over tokens this becomes the two-all_to_all
        # layout; the replicated regime is the serving shape.)
        logits = x @ router
        assign = jnp.argmax(logits, axis=-1)             # top-1 routing
        gate = jax.nn.softmax(logits, axis=-1)
        gate_val = jnp.take_along_axis(gate, assign[:, None], axis=1)[:, 0]

        onehot = jax.nn.one_hot(assign, cfg.num_experts, dtype=x.dtype)
        dispatched = jnp.einsum("te,td->etd", onehot, x)    # [E, T, D]
        dev = jax.lax.axis_index(axis_name)
        mine = jax.lax.dynamic_slice_in_dim(dispatched, dev * le, le, axis=0)
        out_local = jax.vmap(_expert_ffn)(w1, w2, mine)     # [le, T, D]
        local_oh = jax.lax.dynamic_slice_in_dim(onehot, dev * le, le, axis=1)
        combined = jnp.einsum("etd,te->td", out_local, local_oh)
        out = jax.lax.psum(combined, axis_name)             # reassemble
        return out * gate_val[:, None]

    sharded = shard_map(
        block, mesh=mesh,
        in_specs=(P(), P(axis_name), P(axis_name), P()),
        out_specs=P(),
        check_vma=False,
    )

    @jax.jit
    def forward(params, x):
        return sharded(params["router"], params["w1"], params["w2"], x)

    return forward


def reference_ep_forward(params, cfg: EpConfig, x):
    """Unsharded oracle: same top-1 routing + gated expert FFN."""
    logits = x @ params["router"]
    assign = jnp.argmax(logits, axis=-1)
    gate = jax.nn.softmax(logits, axis=-1)
    gate_val = jnp.take_along_axis(gate, assign[:, None], axis=1)[:, 0]
    outs = jax.vmap(_expert_ffn)(params["w1"], params["w2"],
                                 jnp.broadcast_to(x, (cfg.num_experts,
                                                      *x.shape)))
    onehot = jax.nn.one_hot(assign, cfg.num_experts, dtype=x.dtype)
    return jnp.einsum("etd,te->td", outs, onehot) * gate_val[:, None]
