"""Tensor parallelism for transformer layers: Megatron-style sharding.

The reference is single-node inference (SURVEY §2.2: no LLM-style TP/PP);
this module exists because a TPU framework must scale the transformer the
TPU way: attention heads and FFN hidden units column/row-sharded over the
mesh, with ONE psum per block (the Megatron-LM decomposition) riding ICI.

Layout:
- wq/wk/wv [D, H*hd] column-sharded (each device owns H/n_dev heads)
- wo [H*hd, D] row-sharded (matching the head split) -> psum
- FFN w1 [D, F] column-sharded, w2 [F, D] row-sharded -> psum
LayerNorms and activations are replicated — the standard TP pattern where
activations stay [S, D] on every device and only the two psums touch the
interconnect.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


@dataclasses.dataclass(frozen=True)
class TpLayerConfig:
    hidden: int
    heads: int
    head_dim: int
    ffn: int
    causal: bool = True
    eps: float = 1e-5


def tp_layer_init(key, cfg: TpLayerConfig) -> dict:
    """Unsharded parameter pytree; shard with shard_params/jax.device_put."""
    d, hds, f = cfg.hidden, cfg.heads * cfg.head_dim, cfg.ffn
    ks = jax.random.split(key, 6)

    def init(k, i, o):
        return jax.random.normal(k, (i, o)) * jnp.sqrt(2.0 / (i + o))

    return {
        "wq": init(ks[0], d, hds), "wk": init(ks[1], d, hds),
        "wv": init(ks[2], d, hds), "wo": init(ks[3], hds, d),
        "w1": init(ks[4], d, f), "w2": init(ks[5], f, d),
        "ln1": {"gamma": jnp.ones(d), "beta": jnp.zeros(d)},
        "ln2": {"gamma": jnp.ones(d), "beta": jnp.zeros(d)},
    }


def tp_param_specs(axis_name: str = "nodes") -> dict:
    """PartitionSpec per parameter (column/row split per Megatron)."""
    col, row = P(None, axis_name), P(axis_name, None)
    return {
        "wq": col, "wk": col, "wv": col, "wo": row,
        "w1": col, "w2": row,
        "ln1": {"gamma": P(), "beta": P()},
        "ln2": {"gamma": P(), "beta": P()},
    }


def _ln(p, x, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["gamma"] + p["beta"]


def make_tp_layer_forward(cfg: TpLayerConfig, mesh: Mesh,
                          axis_name: str = "nodes"):
    """Jitted forward(params, x [S, D]) -> [S, D] with heads + FFN sharded
    over the mesh. Exactly two psums per layer."""
    n_dev = mesh.shape[axis_name]
    assert cfg.heads % n_dev == 0, "heads must divide the mesh axis"
    lh = cfg.heads // n_dev
    hd = cfg.head_dim

    def block(params, x):
        # local shards: wq [D, lh*hd], wo [lh*hd, D], w1 [D, F/n], w2 [F/n, D]
        h = _ln(params["ln1"], x, cfg.eps)
        s = x.shape[0]
        q = (h @ params["wq"]).reshape(s, lh, hd)
        k = (h @ params["wk"]).reshape(s, lh, hd)
        v = (h @ params["wv"]).reshape(s, lh, hd)
        scores = jnp.einsum("qhd,khd->hqk", q, k) / jnp.sqrt(
            jnp.asarray(hd, jnp.float32))
        if cfg.causal:
            causal = jnp.tril(jnp.ones((s, s)))
            scores = jnp.where(causal[None] > 0, scores, -jnp.inf)
        w = jax.nn.softmax(scores, axis=-1)
        attn = jnp.einsum("hqk,khd->qhd", w, v).reshape(s, lh * hd)
        # row-sharded output projection: partial sums -> ONE psum
        x = x + jax.lax.psum(attn @ params["wo"], axis_name)

        h = _ln(params["ln2"], x, cfg.eps)
        inner = jax.nn.gelu(h @ params["w1"])          # [S, F/n] local
        x = x + jax.lax.psum(inner @ params["w2"], axis_name)  # psum #2
        return x

    specs = tp_param_specs(axis_name)
    sharded = shard_map(
        block, mesh=mesh,
        in_specs=(specs, P()), out_specs=P(),
        check_vma=False,
    )
    return jax.jit(sharded)


def reference_tp_layer_forward(params, cfg: TpLayerConfig, x):
    """Single-device oracle with identical math (for parity tests)."""
    h = _ln(params["ln1"], x, cfg.eps)
    s = x.shape[0]
    q = (h @ params["wq"]).reshape(s, cfg.heads, cfg.head_dim)
    k = (h @ params["wk"]).reshape(s, cfg.heads, cfg.head_dim)
    v = (h @ params["wv"]).reshape(s, cfg.heads, cfg.head_dim)
    scores = jnp.einsum("qhd,khd->hqk", q, k) / jnp.sqrt(
        jnp.asarray(cfg.head_dim, jnp.float32))
    if cfg.causal:
        causal = jnp.tril(jnp.ones((s, s)))
        scores = jnp.where(causal[None] > 0, scores, -jnp.inf)
    w = jax.nn.softmax(scores, axis=-1)
    attn = jnp.einsum("hqk,khd->qhd", w, v).reshape(s, -1)
    x = x + attn @ params["wo"]
    h = _ln(params["ln2"], x, cfg.eps)
    return x + jax.nn.gelu(h @ params["w1"]) @ params["w2"]
