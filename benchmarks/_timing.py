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

Making the scan body un-hoistable (round-3 finding, measured on the
100k fused layer; ground truth = an activation-carry loop at 1.10 ms):

  * Perturbing ONE input leaf is not enough: the original helper bumped
    the FIRST float leaf, which for the fused layer is a fold-eliminated
    attention bias — a DEAD input. The body was loop-invariant, XLA
    hoisted it, and the sweep read 0.000 ms/iter (3e17 "edges/s").
    The perturbation must hit every leaf that might feed the output, so
    the body now bumps EVERY small float leaf.
  * The bump must not be algebraically foldable: `* 0.0` is simplified
    away under --xla_allow_excess_precision; `* 1e-38` survives (it is
    numerically nil against normal-scale inputs but not provably zero).
  * The carry must be derived from ALL float output leaves, not just the
    first — a partial dependence lets XLA dead-code the unused outputs'
    compute (pallas_call bodies are opaque, but pure-XLA functions are
    sliceable).
  * Big leaves (features, edge tables) are NOT bumped: a [10M, 128]
    elementwise add per iteration costs an extra HBM pass comparable to
    the kernel under test, and doubling a 2.6 GB buffer in the carry
    OOMs the 10M row. Params-sized leaves (<= 1M elements) are bumped;
    if none exist, the smallest float leaf is used regardless of size.
"""

from __future__ import annotations

import time

_SMALL = 1_000_000  # elements; leaves above this are never perturbed


def _perturb_indices(leaves, no_perturb=()):
    """Indices of the float leaves to fold the carry into: every float
    leaf with <= _SMALL elements, else the single smallest float leaf,
    else the smallest integer leaf (tokens-only functions).

    CONSTRAINT: perturbation adds ~1e-33 to every selected leaf, so a
    leaf consumed through exact-zero comparisons (mask == 0, gate > 0)
    would flip branches and the harness would time DIFFERENT compute.
    Callers pass such leaves' flat indices in `no_perturb`.
    """
    import jax.numpy as jnp

    floats = [i for i, x in enumerate(leaves)
              if hasattr(x, "dtype")
              and jnp.issubdtype(x.dtype, jnp.floating)
              and i not in no_perturb]
    small = [i for i in floats if leaves[i].size <= _SMALL]
    if small:
        return small
    if floats:
        return [min(floats, key=lambda i: leaves[i].size)]
    ints = [i for i, x in enumerate(leaves)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.integer)]
    if ints:
        return [min(ints, key=lambda i: leaves[i].size)]
    raise ValueError("device_time needs at least one numeric array arg")


def _make_loop(f, args, n_iters, no_perturb=()):
    import jax
    import jax.numpy as jnp

    leaves, treedef = jax.tree_util.tree_flatten(args)
    pis = _perturb_indices(leaves, no_perturb)

    @jax.jit
    def loop(*flat):
        def body(carry, _):
            cur = list(flat)
            for i in pis:
                cur[i] = cur[i] + carry.astype(cur[i].dtype)
            out = f(*jax.tree_util.tree_unflatten(treedef, cur))
            out_leaves = [leaf for leaf in jax.tree_util.tree_leaves(out)
                          if hasattr(leaf, "dtype")]
            inexact = [leaf for leaf in out_leaves
                       if jnp.issubdtype(leaf.dtype, jnp.inexact)]
            s = jnp.zeros((), jnp.float32)
            for leaf in inexact:
                s = s + jnp.sum(leaf.astype(jnp.float32))
            if not inexact:
                # All-integer outputs (e.g. tokens-only): a zero carry is
                # provably constant and XLA hoists/DCEs the body — the
                # exact 0.000 ms failure mode. Chain through the integers.
                if not out_leaves:
                    raise ValueError(
                        "device_time: benched function returned no array "
                        "leaves; the scan body would be dead code")
                for leaf in out_leaves:
                    s = s + jnp.sum(leaf.astype(jnp.float32))
            return carry + s * 1e-38, None

        out, _ = jax.lax.scan(
            body, jnp.zeros((), jnp.float32), None, length=n_iters)
        return out

    return lambda: float(loop(*leaves))


def device_time(f, *args, short=10, long=110, repeats=3, no_perturb=()):
    """Per-iteration device seconds for f(*args), overhead-cancelled.

    f must be a jit-compatible pure function of array pytrees.
    `no_perturb`: flat-leaf indices of args that must NOT receive the
    chaining perturbation (mask-like leaves consumed via exact-zero
    comparisons — see _perturb_indices).

    Median of `repeats` (t_long - t_short) pairs: a single 20-iteration
    difference sits inside the tunnel's multi-ms fetch jitter (measured
    spread 0.54-1.26 ms/iter on a 1.1 ms kernel); 100 iterations of
    signal x median-of-3 pins it.
    """
    f_s = _make_loop(f, args, short, no_perturb)
    f_l = _make_loop(f, args, long, no_perturb)
    f_s()   # compile + warm
    f_l()
    diffs = []
    for _ in range(max(1, repeats)):
        t0 = time.perf_counter()
        f_s()
        t_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        f_l()
        t_l = time.perf_counter() - t0
        diffs.append(t_l - t_s)
    diffs.sort()
    med = diffs[len(diffs) // 2]
    return max(med, 1e-9) / (long - short)
