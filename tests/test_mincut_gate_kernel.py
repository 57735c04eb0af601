"""VMEM-resident push-relabel gate kernel (ops/pallas/mincut_gate_block).

The kernel must reproduce the XLA gate chain EXACTLY:
pack_keep(vmap(mincut_gate_device)(_pooled_from_x(h, pad, A_sig))) —
the max-flow value and the canonical minimal-source-side cut are unique,
so masks are bitwise-equal (uint32 compare) despite the kernel's
different push ordering (log-tree prefix sum vs sequential cumsum).
Reference semantics: ruvector-attn-mincut/src/mincut.rs:163-221.
"""

import numpy as np
import jax
import jax.numpy as jnp

from ruvector_tpu.attention.mincut_device import mincut_gate_device
from ruvector_tpu.graph_transformer.gated import _pooled_from_x, pack_keep
from ruvector_tpu.ops.pallas.mincut_gate_block import (
    mincut_gate_block_from_x,
)

LAM, EPS = 0.5, 0.01


def _ref_masks(h, pad, A):
    sub = _pooled_from_x(h, pad, A)
    keep, cost = jax.vmap(
        lambda m: mincut_gate_device(m, LAM, EPS))(sub)
    return pack_keep(keep), cost


def test_gate_kernel_mask_parity_random():
    rng = np.random.default_rng(1)
    K, B, D = 4, 64, 32
    x = jnp.asarray(rng.normal(size=(K, B, D)).astype(np.float32))
    pad = jnp.asarray((rng.uniform(size=(K, B)) > 0.05)
                      .astype(np.float32))
    A = jnp.asarray((rng.normal(size=(D, D)) * 0.15).astype(np.float32))
    kp, stats = mincut_gate_block_from_x(x, pad, A, lam=LAM, eps=EPS)
    kp_ref, cost_ref = _ref_masks(x, pad, A)
    np.testing.assert_array_equal(np.asarray(kp), np.asarray(kp_ref))
    np.testing.assert_allclose(np.asarray(stats[:, 0, 0]),
                               np.asarray(cost_ref), atol=1e-4)


def test_gate_kernel_nonzero_applied_cut():
    """A nearly-isolated sink forces flow < threshold: the cut APPLIES
    with nonzero cost, exercising the full push-relabel + canonical-cut
    path (not just the stop_above early exit)."""
    rng = np.random.default_rng(0)
    K, B, D = 3, 64, 32
    base = rng.normal(size=(K, 1, D)).astype(np.float32)
    xn = (base + 0.3 * rng.normal(size=(K, B, D))).astype(np.float32)
    xn[:, -1] = 0.006 * xn[:, 0]
    x = jnp.asarray(xn)
    pad = jnp.ones((K, B), np.float32)
    A = jnp.asarray((np.eye(D) * 0.1).astype(np.float32))
    kp, stats = mincut_gate_block_from_x(x, pad, A, lam=LAM, eps=EPS)
    kp_ref, cost_ref = _ref_masks(x, pad, A)
    assert float(np.asarray(cost_ref).max()) > 0, "cut must fire"
    assert float(np.asarray(stats[:, 2, 0]).min()) == 1.0
    np.testing.assert_array_equal(np.asarray(kp), np.asarray(kp_ref))
    np.testing.assert_allclose(np.asarray(stats[:, 0, 0]),
                               np.asarray(cost_ref), rtol=2e-3)


def test_gate_kernel_ln_folding_matches_xla_ln():
    """ln=(gamma, beta) folds LN1 in-kernel: must equal the XLA chain
    LN -> astype(compute dtype) -> pooled logits -> gate, in both f32
    and bf16 rounding modes."""
    from ruvector_tpu.nn.core import layer_norm_apply

    rng = np.random.default_rng(3)
    K, B, D = 3, 32, 32
    x = jnp.asarray(rng.normal(size=(K, B, D)).astype(np.float32) * 2.0)
    pad = jnp.ones((K, B), np.float32)
    A = jnp.asarray((rng.normal(size=(D, D)) * 0.1).astype(np.float32))
    gamma = jnp.asarray(rng.uniform(0.5, 1.5, D).astype(np.float32))
    beta = jnp.asarray(rng.normal(size=D).astype(np.float32) * 0.1)
    ln = {"gamma": gamma, "beta": beta}

    for cbf in (False, True):
        kp, _ = mincut_gate_block_from_x(
            x, pad, A, lam=LAM, eps=EPS, ln=(gamma, beta),
            compute_bf16=cbf)
        h = layer_norm_apply(ln, x)
        if cbf:
            h = h.astype(jnp.bfloat16)
        kp_ref, _ = _ref_masks(h, pad, A)
        np.testing.assert_array_equal(np.asarray(kp), np.asarray(kp_ref),
                                      err_msg=f"compute_bf16={cbf}")


def test_gate_state_init_kernel_path_matches_xla_path(monkeypatch):
    """gate_state_init under the fused gate kernel must produce the
    same masks and signatures as... itself run through the kernel at a
    different batch split is trivial; the load-bearing check is that
    the STEP's re-solve (same kernel, gathered subset) reproduces init
    masks — pinned by the existing temporal-reuse tests. Here: the
    kernel path's init masks equal the XLA vmap path's masks (the two
    gate implementations agree through the whole init)."""
    import dataclasses

    import ruvector_tpu.graph_transformer.gated as g
    from ruvector_tpu.graph.block_dense import build_block_dense

    n, d, block = 128, 32, 32
    rng = np.random.default_rng(5)
    idx = rng.integers(0, n, (n, 8)).astype(np.int32)
    mask = np.ones((n, 8), np.float32)
    ew = rng.uniform(0.1, 1.0, (n, 8)).astype(np.float32)
    bdg = build_block_dense(idx, mask, ew, block=block, table_pad=8)
    cfg = g.GatedGraphTransformerConfig(
        dim=d, num_heads=4, num_layers=2, gate_chunk=2,
        fused_gate_attn="always")
    params = g.gated_graph_transformer_init(jax.random.key(0), cfg)
    feats = rng.normal(size=(n, d)).astype(np.float32)
    fpad = bdg.pad_features(jnp.asarray(feats))

    st_kernel = g.gate_state_init(params, cfg, fpad, bdg)

    # force the XLA vmap gate path (kernel disabled) — signatures use a
    # different reduction order, so only the masks must match exactly
    real = g._use_fused_attn
    monkeypatch.setattr(
        g, "_use_fused_attn",
        lambda cfg, b, dd: False)
    cfg_x = dataclasses.replace(cfg, fused_gate_attn="never")
    st_xla = g.gate_state_init(params, cfg_x, fpad, bdg)
    monkeypatch.setattr(g, "_use_fused_attn", real)
    np.testing.assert_array_equal(np.asarray(st_kernel["keep"]),
                                  np.asarray(st_xla["keep"]))
