"""Honest device timing for the remote (axon) TPU runtime.

`jax.block_until_ready` on this runtime acknowledges enqueue, not
execution: a chained python loop of 137-GFLOP matmuls "timed" at
0.024 ms/iter that way (≈250 PFLOP/s — 1000x the chip). The only wait
the runtime honors is a value fetch (float()/np.asarray), and a fetch
costs a full relay round trip, so per-iteration syncing drowns
microsecond kernels.

`device_time(f, *args)` therefore times TWO jitted scans of the same
body (`short` and `long` iterations) with one value sync each and
returns (t_long - t_short) / (long - short): the round trip, dispatch,
and compile-cache constants cancel, leaving per-iteration device time.

The scan body feeds a scalar derived from each iteration's output back
into the next iteration's input (x + sum*0), so iterations are
data-dependent: XLA cannot hoist the computation out of the loop or
dead-code-eliminate it, and the added elementwise op is one add over
one input leaf — noise next to anything worth benchmarking.
"""

from __future__ import annotations

import time


def _perturbable_index(leaves):
    """First float leaf (any numeric leaf as fallback): the carry is
    folded into it to chain iterations."""
    import jax.numpy as jnp

    fallback = None
    for i, x in enumerate(leaves):
        if hasattr(x, "dtype"):
            if jnp.issubdtype(x.dtype, jnp.floating):
                return i
            if fallback is None and jnp.issubdtype(x.dtype, jnp.integer):
                fallback = i
    if fallback is None:
        raise ValueError("device_time needs at least one numeric array arg")
    return fallback


def _make_loop(f, args, n_iters):
    import jax
    import jax.numpy as jnp

    leaves, treedef = jax.tree_util.tree_flatten(args)
    pi = _perturbable_index(leaves)

    @jax.jit
    def loop(*flat):
        def body(carry, _):
            cur = list(flat)
            cur[pi] = cur[pi] + carry.astype(cur[pi].dtype)
            out = f(*jax.tree_util.tree_unflatten(treedef, cur))
            leaf = jax.tree_util.tree_leaves(out)[0]
            # 1e-38-scaled: numerically nil (vanishes in f32 rounding when
            # added to any normal-scale input) but NOT algebraically
            # foldable — this toolchain compiles with
            # --xla_allow_excess_precision, under which a *0.0 chain gets
            # simplified away and the whole body DCE'd (measured: the
            # scale sweep read 0.0 ms/layer)
            return jnp.sum(leaf.astype(jnp.float32)) * 1e-38, None

        out, _ = jax.lax.scan(
            body, jnp.zeros((), jnp.float32), None, length=n_iters)
        return out

    return lambda: float(loop(*leaves))


def device_time(f, *args, short=3, long=23):
    """Per-iteration device seconds for f(*args), overhead-cancelled.

    f must be a jit-compatible pure function of array pytrees.
    """
    f_s = _make_loop(f, args, short)
    f_l = _make_loop(f, args, long)
    f_s()   # compile + warm
    f_l()
    t0 = time.perf_counter()
    f_s()
    t_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    f_l()
    t_l = time.perf_counter() - t0
    return max(t_l - t_s, 1e-9) / (long - short)
