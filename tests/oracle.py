"""Pure-NumPy oracle for the reference RuvectorLayer forward semantics.

Independent scalar-style implementation of the math described in
ruvector-gnn/src/layer.rs (Linear :37, LayerNorm :68, MHA :129-210,
GRUCell :255-275, RuvectorLayer::forward :379-418). Used by the allclose
harness to pin the batched TPU implementation to the reference behavior.

Weights are passed in as the same pytrees the JAX layers use
(kernel [in, out], bias [out]).
"""

from __future__ import annotations

import numpy as np


def linear(p, x):
    return np.asarray(x, np.float32) @ np.asarray(p["kernel"]) + np.asarray(p["bias"])


def layer_norm(p, x, eps=1e-5):
    x = np.asarray(x, np.float32)
    mean = x.mean()
    var = ((x - mean) ** 2).mean()
    normed = (x - mean) / np.sqrt(var + eps)
    return normed * np.asarray(p["gamma"]) + np.asarray(p["beta"])


def _softmax_guarded(scores):
    m = np.max(scores)
    e = np.exp(scores - m)
    s = max(e.sum(), 1e-10)
    return e / s


def mha_forward(p, num_heads, query, keys, values):
    """query [D]; keys/values list of [D]. Returns [D]."""
    if len(keys) == 0:
        return np.asarray(query, np.float32)
    d = len(query)
    hd = d // num_heads
    q = linear(p["q"], query)
    k = np.stack([linear(p["k"], kk) for kk in keys])
    v = np.stack([linear(p["v"], vv) for vv in values])
    head_outs = []
    for h in range(num_heads):
        sl = slice(h * hd, (h + 1) * hd)
        qh, kh, vh = q[sl], k[:, sl], v[:, sl]
        scores = kh @ qh / np.sqrt(hd)
        w = _softmax_guarded(scores)
        head_outs.append(w @ vh)
    concat = np.concatenate(head_outs)
    return linear(p["out"], concat)


def gru_forward(p, x, h):
    def sigmoid(v):
        return 1.0 / (1.0 + np.exp(-v))

    z = sigmoid(linear(p["w_z"], x) + linear(p["u_z"], h))
    r = sigmoid(linear(p["w_r"], x) + linear(p["u_r"], h))
    h_tilde = np.tanh(linear(p["w_h"], x) + linear(p["u_h"], r * h))
    return (1.0 - z) * h + z * h_tilde


def aggregate_messages(messages, weights):
    """Edge-weight-normalized mean (layer.rs:421-445)."""
    if len(messages) == 0:
        return None
    w = np.asarray(weights, np.float32)
    wsum = w.sum()
    if wsum > 0:
        wn = w / wsum
    else:
        wn = np.full(len(w), 1.0 / len(w), np.float32)
    return (wn[:, None] * np.stack(messages)).sum(axis=0)


def ruvector_layer_forward(params, heads, dropout, node_emb, neighbor_embs, edge_weights):
    """Single-node forward: node [Din], neighbors list of [Din], weights [M]."""
    if len(neighbor_embs) == 0:
        projected = linear(params["w_msg"], node_emb)
        return layer_norm(params["norm"], projected)

    node_msg = linear(params["w_msg"], node_emb)
    nbr_msgs = [linear(params["w_msg"], n) for n in neighbor_embs]

    attn_out = mha_forward(params["attn"], heads, node_msg, nbr_msgs, nbr_msgs)
    weighted = aggregate_messages(nbr_msgs, edge_weights)
    combined = attn_out + weighted
    aggregated = linear(params["w_agg"], combined)
    updated = gru_forward(params["gru"], aggregated, node_msg)
    dropped = updated * (1.0 - dropout)
    return layer_norm(params["norm"], dropped)


def to_numpy_params(params):
    """Convert a JAX param pytree to numpy recursively."""
    if isinstance(params, dict):
        return {k: to_numpy_params(v) for k, v in params.items()}
    return np.asarray(params)
