"""Batched device min-cut gate — push-relabel entirely in VMEM.

The gated-GT drift path's cost is the gate solve (CONFIG5_PROFILE_r04:
10.6 ms/layer at 61 partitions — 4x the fused attention). The XLA
formulation (attention/mincut_device.mincut_gate_device under vmap) has
two structural costs this kernel removes:

  1. every push-relabel round streams the [K, S, S] residual matrix
     (64 MB at K=244, S=256) through HBM — while_loop carries live in
     HBM between XLA ops, so each round pays ~6 full-tensor HBM passes;
  2. vmap lock-steps all K partitions: the loop runs until the SLOWEST
     partition converges, and every round pays full-K traffic.

Here each grid program solves ONE partition with the residual [S, S],
excess and heights resident in VMEM for the whole while_loop (256 KB at
S=256), and exits as soon as ITS flow converges (or the stop_above
early-exit fires) — total work is sum(rounds_k), not max(rounds_k) * K,
and the only HBM traffic is the [B, D] feature block in and the packed
mask out. The pooled logits are computed IN-kernel from the pre-norm
features ((X A_sig) X^T — graph_transformer/gated.py _pooled_from_x),
so the [K, S, S] logit tensor never exists in HBM either, and the keep
mask leaves the kernel already bit-packed (pack_keep layout).

Algorithm and semantics are identical to mincut_gate_device (phase-
separated synchronous push-relabel + periodic exact global relabel +
stop_above early exit + canonical minimal-source-side cut;
ruvector-attn-mincut/src/mincut.rs:163-221): the max-flow value and the
s-reachability cut are unique, so masks match the XLA gate exactly up
to float-boundary ties (the in-kernel prefix sum is a log-tree, not a
sequential scan, so individual push amounts may differ in ulps while
the converged cut does not).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ruvector_tpu.ops.pallas.gated_block_attn import keep_words

_RELABEL_EVERY = 8


def _make_gate_kernel(b: int, d: int, lam: float, eps: float,
                      with_ln: bool, compute_bf16: bool):
    n = b
    w = keep_words(b)
    f32 = jnp.float32
    i32 = jnp.int32
    inf = 4 * n          # python ints: iotas must be built IN-kernel
    two_n = 2 * n
    t = n - 1
    rounds_cap = 4 * n * n + 8

    def cumsum_lanes(m):
        """Inclusive prefix sum along lanes via log-tree shifts (Mosaic
        has no cumsum). Association differs from jnp.cumsum — push
        amounts may differ in ulps; the converged cut does not."""
        acc = m
        sh = 1
        while sh < n:
            acc = acc + jnp.concatenate(
                [jnp.zeros((n, sh), f32), acc[:, :n - sh]], axis=1)
            sh *= 2
        return acc

    def kernel(x_ref, pad_ref, A_ref, *rest):
        if with_ln:
            g_ref, b_ref, keep_ref, stats_ref = rest
        else:
            keep_ref, stats_ref = rest
        col = jax.lax.broadcasted_iota(i32, (1, n), 1)   # [1, n]
        rowm = jax.lax.broadcasted_iota(i32, (n, n), 0)
        colm = jax.lax.broadcasted_iota(i32, (n, n), 1)

        def global_relabel(r, h):
            """Exact distance labels via dense backward BFS (row-vector
            form of mincut_device._global_relabel)."""
            adj = r > 1e-12

            def bfs(target_col):
                d0 = jnp.where(col == target_col, 0, inf).astype(i32)

                def bcond(st):
                    return st[1]

                def bbody(st):
                    dd, _ = st
                    via = jnp.min(jnp.where(adj, dd, inf), axis=1,
                                  keepdims=True).T      # [1, n]
                    new = jnp.minimum(dd, 1 + via)
                    return new, jnp.any(new < dd)

                dd, _ = jax.lax.while_loop(bcond, bbody,
                                           (d0, jnp.bool_(True)))
                return dd

            dist_t = bfs(t)
            dist_s = bfs(0)
            h_new = jnp.where(dist_t < inf, dist_t,
                              n + jnp.minimum(dist_s, jnp.int32(n)))
            h_new = jnp.where(col == 0, n, h_new)
            return jnp.maximum(h, h_new)

        X = x_ref[0].astype(f32)                         # [B, D]
        if with_ln:
            # fold the pre-norm LN1 in: h = LN(x).astype(compute dtype)
            # (gated.py computed a full [nB, B, D] h in HBM purely to
            # feed drift detection + solves). bf16 mode rounds through
            # bf16 exactly like the XLA path's .astype(dt).
            mu = jnp.mean(X, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(X - mu), axis=-1, keepdims=True)
            X = (X - mu) * jax.lax.rsqrt(var + 1e-5) * g_ref[0] + b_ref[0]
            if compute_bf16:
                X = X.astype(jnp.bfloat16).astype(f32)
        pad_row = pad_ref[0].astype(f32)                 # [1, B]
        valid = pad_row.T * pad_row
        qs = jax.lax.dot_general(
            X, A_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=f32)                  # [B, D]
        lg = jax.lax.dot_general(
            qs, X, (((1,), (1,)), ((), ())),
            preferred_element_type=f32)                  # [B, B]
        clamped = jnp.where((valid > 0) & (lg > eps), lg, 0.0)
        pos = clamped > 0
        npos = jnp.sum(pos.astype(f32))
        mean_w = jnp.sum(clamped) / jnp.maximum(npos, 1.0)
        threshold = lam * mean_w

        # init: saturate source (s=0) edges
        h = jnp.where(col == 0, n, 0).astype(i32)        # [1, n]
        push0 = clamped[0:1, :]                          # [1, n] cap[s]
        r = jnp.where(rowm == 0, 0.0, clamped)
        r = r + jnp.where(colm == 0, push0.T, 0.0)
        e = jnp.where(col == 0, 0.0, push0)              # [1, n]
        h = global_relabel(r, h)

        def active(e, h):
            return (e > 1e-12) & (col != 0) & (col != t) & (h < two_n)

        def cond(st):
            r, e, h, i = st
            return (jnp.any(active(e, h)) & (i < rounds_cap)
                    & (e[0, t] <= threshold))

        def body(st):
            r, e, h, i = st
            act = active(e, h)
            # Mosaic cannot transpose i1 vectors: bool columns go
            # through an f32 transpose
            act_col = act.astype(f32).T > 0
            # --- push phase (heights frozen) ---
            adm = (r > 1e-12) & (h.T == h + 1) & act_col
            ra = jnp.where(adm, r, 0.0)
            cums = cumsum_lanes(ra)
            push = jnp.clip(e.T - (cums - ra), 0.0, ra)
            r = r - push + push.T
            e = (e - jnp.sum(push, axis=1, keepdims=True).T
                 + jnp.sum(push, axis=0, keepdims=True))
            # --- relabel phase (updated residual) ---
            act = active(e, h)
            resid = r > 1e-12
            has_adm = jnp.sum(adm_of(resid, h).astype(f32), axis=1,
                              keepdims=True).T > 0
            nbr_h = jnp.where(resid, h, two_n + 1)
            lift = 1 + jnp.min(nbr_h, axis=1, keepdims=True).T
            h = jnp.where(act & ~has_adm, jnp.maximum(h, lift), h)
            h = jax.lax.cond(
                (i + 1) % _RELABEL_EVERY == 0,
                lambda rh: global_relabel(*rh), lambda rh: rh[1], (r, h))
            return r, e, h, i + 1

        def adm_of(resid, h):
            return resid & (h.T == h + 1)

        r, e, h, i = jax.lax.while_loop(
            cond, body, (r, e, h, jnp.zeros((), i32)))
        flow = e[0, t]
        capped = jnp.any(active(e, h)) & (flow <= threshold)

        # canonical minimal-source-side cut: s-reachability in residual
        adj = r > 1e-12

        # reach carried as f32 (Mosaic mislays i1 vector loop carries)
        def rcond(st):
            return st[1]

        def rbody(st):
            reachf, _ = st
            grow = jnp.sum(jnp.where(adj, reachf.T, 0.0), axis=0,
                           keepdims=True)
            new = jnp.where((reachf > 0) | (grow > 0), 1.0, 0.0)
            return new, jnp.any(new != reachf)

        reachf, _ = jax.lax.while_loop(
            rcond, rbody, (jnp.where(col == 0, 1.0, 0.0),
                           jnp.bool_(True)))
        reach = reachf > 0
        crossing = (reachf.T > 0) & ~reach & pos
        cut_cost = jnp.sum(jnp.where(crossing, clamped, 0.0))
        apply_cut = (flow <= threshold) & (npos > 0) & ~capped
        # keep computed in f32 (Mosaic rejects selects over i1 vectors)
        posf = pos.astype(f32)
        keep_f = jnp.where(apply_cut,
                           jnp.where(crossing, 0.0, posf), posf)
        keep_f = jnp.where(npos > 0, keep_f, jnp.zeros_like(keep_f))
        keep = keep_f > 0

        # pack rows 32/word along sublanes (pack_keep layout). The sum
        # runs in int32 (Mosaic has no unsigned reductions): each word
        # position sums 32 DISJOINT bits, so no carries — the bit
        # pattern is exact and the final cast to uint32 is value-
        # preserving mod 2^32.
        bits = keep.reshape(w, 32, n)
        shifts = jax.lax.broadcasted_iota(jnp.int32, (w, 32, n), 1)
        packed = jnp.sum(bits.astype(jnp.int32) << shifts, axis=1,
                         dtype=jnp.int32)
        keep_ref[0] = packed.astype(jnp.uint32)
        stats_ref[0] = jnp.concatenate([
            jnp.full((1, n), jnp.where(apply_cut, cut_cost, 0.0), f32),
            jnp.full((1, n), flow, f32),
            jnp.full((1, n), jnp.where(apply_cut, 1.0, 0.0), f32),
            jnp.full((1, n), i.astype(f32), f32),
            jnp.zeros((4, n), f32)], axis=0)

    return kernel


@functools.partial(jax.jit, static_argnames=("lam", "eps", "compute_bf16"))
def mincut_gate_block_from_x(x, pad, A_sig, *, lam: float, eps: float,
                             ln=None, compute_bf16: bool = False):
    """Solve K partitions' pooled-logit min-cut gates on device.

    x:     [K, B, D] features (f32 or bf16; math is f32)
    pad:   [K, B]    1 for real nodes
    A_sig: [D, D]    Wq Wk^T / (sqrt(dh) * H) (gated.py _fold_sig_params)
    ln:    optional (gamma [D], beta [D]) — folds the pre-norm LN1 into
           the kernel so x is the RESIDUAL stream and the [nB, B, D]
           normalized tensor never exists in HBM (compute_bf16 rounds
           the normalized features through bf16 like the XLA path's
           .astype(dt) before the logit matmuls).
    Returns (keep_packed [K, ceil(B/32), B] uint32, stats [K, 8, B] f32)
    with stats rows 0=cut_cost (0 if cut not applied), 1=flow,
    2=applied flag, 3=push-relabel rounds.

    B must be a multiple of 32 (the packed-row word layout). Semantics ==
    pack_keep(vmap(mincut_gate_device)(_pooled_from_x(h, pad, A_sig)))
    with h = LN(x) when ln is given, h = x otherwise.
    """
    k, b, d = x.shape
    if b % 32 != 0:
        raise ValueError(f"block size {b} must be a multiple of 32")
    w = keep_words(b)
    blk = lambda i: (i, 0, 0)        # noqa: E731
    cst2 = lambda i: (0, 0)          # noqa: E731
    in_specs = [
        pl.BlockSpec((1, b, d), blk, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, b), blk, memory_space=pltpu.VMEM),
        pl.BlockSpec((d, d), cst2, memory_space=pltpu.VMEM),
    ]
    args = [x, pad[:, None, :], A_sig.astype(jnp.float32)]
    if ln is not None:
        in_specs += [pl.BlockSpec((1, d), cst2, memory_space=pltpu.VMEM)] * 2
        args += [ln[0].reshape(1, d).astype(jnp.float32),
                 ln[1].reshape(1, d).astype(jnp.float32)]
    out_specs = [
        pl.BlockSpec((1, w, b), blk, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 8, b), blk, memory_space=pltpu.VMEM),
    ]
    keep, stats = pl.pallas_call(
        _make_gate_kernel(b, d, float(lam), float(eps), ln is not None,
                          compute_bf16),
        grid=(k,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((k, w, b), jnp.uint32),
            jax.ShapeDtypeStruct((k, 8, b), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            # logits + ~40 push-relabel rounds of [B, B] VPU passes
            flops=2 * k * b * d * (b + d) + 40 * 10 * k * b * b,
            bytes_accessed=x.size * x.dtype.itemsize + k * (w + 8) * b * 4,
            transcendentals=0),
        interpret=jax.default_backend() != "tpu",
    )(*args)
    return keep, stats
