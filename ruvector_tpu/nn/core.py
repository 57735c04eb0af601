"""Functional neural building blocks: Linear, LayerNorm, MHA, GRUCell.

Pure (init, apply) pairs over pytree params — the TPU-native replacement for
the reference's per-vector structs (ruvector-gnn/src/layer.rs: Linear :14,
LayerNorm :51, MultiHeadAttention :86, GRUCell :215). Everything is batched
over a leading node axis and an optional neighbor axis so XLA maps the GEMMs
onto the MXU.

Initialization matches the reference: Xavier/Glorot normal with
scale = sqrt(2 / (in + out)) (layer.rs:24-29), zero bias.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ruvector_tpu.ops.segment import masked_softmax


def xavier_normal(key, in_dim: int, out_dim: int, dtype=jnp.float32) -> jax.Array:
    """Glorot-normal [in, out] kernel: std = sqrt(2/(in+out)) (layer.rs:24-26)."""
    scale = (2.0 / (in_dim + out_dim)) ** 0.5
    return scale * jax.random.normal(key, (in_dim, out_dim), dtype=dtype)


def he_normal(key, in_dim: int, out_dim: int, dtype=jnp.float32) -> jax.Array:
    """He-normal init (tensor.rs:370): std = sqrt(2/in)."""
    scale = (2.0 / in_dim) ** 0.5
    return scale * jax.random.normal(key, (in_dim, out_dim), dtype=dtype)


# --- Linear -----------------------------------------------------------------

def linear_init(key, in_dim: int, out_dim: int, dtype=jnp.float32) -> dict:
    return {
        "kernel": xavier_normal(key, in_dim, out_dim, dtype),
        "bias": jnp.zeros((out_dim,), dtype=dtype),
    }


def linear_apply(params: dict, x: jax.Array) -> jax.Array:
    """y = x @ W + b over any leading batch dims (layer.rs:37-41)."""
    return jnp.dot(x, params["kernel"], preferred_element_type=jnp.float32) + params["bias"]


# --- LayerNorm --------------------------------------------------------------

def layer_norm_init(dim: int, dtype=jnp.float32) -> dict:
    return {"gamma": jnp.ones((dim,), dtype=dtype), "beta": jnp.zeros((dim,), dtype=dtype)}


def layer_norm_apply(params: dict, x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """Normalize over the last axis (layer.rs:68-81): (x-mu)/sqrt(var+eps)*g+b."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    normed = (x - mean) * jax.lax.rsqrt(var + eps)
    return normed * params["gamma"] + params["beta"]


# --- Multi-head attention over neighbors ------------------------------------

def mha_init(key, embed_dim: int, num_heads: int, dtype=jnp.float32) -> dict:
    if embed_dim % num_heads != 0:
        raise ValueError(
            f"embed_dim ({embed_dim}) must be divisible by num_heads ({num_heads})"
        )
    kq, kk, kv, ko = jax.random.split(key, 4)
    return {
        "q": linear_init(kq, embed_dim, embed_dim, dtype),
        "k": linear_init(kk, embed_dim, embed_dim, dtype),
        "v": linear_init(kv, embed_dim, embed_dim, dtype),
        "out": linear_init(ko, embed_dim, embed_dim, dtype),
    }


def mha_apply(
    params: dict,
    query: jax.Array,       # [N, D]
    keys: jax.Array,        # [N, M, D]
    values: jax.Array,      # [N, M, D]
    mask: jax.Array,        # [N, M]
    num_heads: int,
) -> jax.Array:
    """Batched neighbor MHA (layer.rs:129-210).

    One query per node attends over its M (masked) neighbors. Scores are
    scaled by sqrt(head_dim); softmax uses the epsilon-guarded masked form.
    Returns [N, D].
    """
    n, m, d = keys.shape
    hd = d // num_heads
    q = linear_apply(params["q"], query).reshape(n, num_heads, hd)
    k = linear_apply(params["k"], keys).reshape(n, m, num_heads, hd)
    v = linear_apply(params["v"], values).reshape(n, m, num_heads, hd)

    scale = 1.0 / (hd ** 0.5)
    scores = jnp.einsum("nhd,nmhd->nhm", q, k) * scale           # [N, H, M]
    attn = masked_softmax(scores, mask[:, None, :], axis=-1)     # [N, H, M]
    out = jnp.einsum("nhm,nmhd->nhd", attn, v).reshape(n, d)
    return linear_apply(params["out"], out)


# --- GRU cell ---------------------------------------------------------------

def gru_init(key, input_dim: int, hidden_dim: int, dtype=jnp.float32) -> dict:
    keys = jax.random.split(key, 6)
    return {
        "w_z": linear_init(keys[0], input_dim, hidden_dim, dtype),
        "u_z": linear_init(keys[1], hidden_dim, hidden_dim, dtype),
        "w_r": linear_init(keys[2], input_dim, hidden_dim, dtype),
        "u_r": linear_init(keys[3], hidden_dim, hidden_dim, dtype),
        "w_h": linear_init(keys[4], input_dim, hidden_dim, dtype),
        "u_h": linear_init(keys[5], hidden_dim, hidden_dim, dtype),
    }


def gru_apply(params: dict, x: jax.Array, h: jax.Array) -> jax.Array:
    """GRU update (layer.rs:255-275):

    z = sigmoid(W_z x + U_z h); r = sigmoid(W_r x + U_r h)
    h~ = tanh(W_h x + U_h (r * h)); h' = (1-z)*h + z*h~

    The six GEMVs fuse into three GEMMs via column-concatenated kernels
    (exact same math; the concats are loop-invariant on params and hoist).
    """
    hd = h.shape[-1]
    w3 = jnp.concatenate(
        [params["w_z"]["kernel"], params["w_r"]["kernel"],
         params["w_h"]["kernel"]], axis=1,
    )
    b3 = jnp.concatenate(
        [params["w_z"]["bias"], params["w_r"]["bias"], params["w_h"]["bias"]]
    )
    u2 = jnp.concatenate(
        [params["u_z"]["kernel"], params["u_r"]["kernel"]], axis=1,
    )
    ub2 = jnp.concatenate([params["u_z"]["bias"], params["u_r"]["bias"]])

    wx = jnp.dot(x, w3, preferred_element_type=jnp.float32) + b3   # [.., 3H]
    uh = jnp.dot(h, u2, preferred_element_type=jnp.float32) + ub2  # [.., 2H]

    z = jax.nn.sigmoid(wx[..., :hd] + uh[..., :hd])
    r = jax.nn.sigmoid(wx[..., hd:2 * hd] + uh[..., hd:])
    h_tilde = jnp.tanh(
        wx[..., 2 * hd:] + linear_apply(params["u_h"], r * h)
    )
    return (1.0 - z) * h + z * h_tilde
