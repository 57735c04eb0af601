"""Device-resident min-cut gate: synchronous push-relabel in pure XLA.

Replaces the per-call device->host logit fetch + host Dinic of
attention/mincut.py (measured 33ms/call through the dev tunnel — 300x the
reference's latency budget, benches/attention_latency.rs:1-58) with an
exact s-t max-flow computed ON DEVICE, so min-cut gated attention is one
jitted program with zero host round trips.

Algorithm: phase-separated synchronous push-relabel (the standard
GPU/SIMD formulation of Goldberg-Tarjan):
  - push phase: every active node pushes its excess along ALL admissible
    edges (height exactly one lower) with heights frozen — simultaneous
    pushes cannot conflict because u->v and v->u admissibility is
    mutually exclusive; per-row allocation is a vectorized prefix fill.
  - relabel phase: active nodes with no admissible edge in the UPDATED
    residual graph lift to 1 + min residual-neighbor height.
Phase separation preserves the height invariant (new reverse edges from
pushes always satisfy h[v] <= h[u] + 1), so the fixpoint is an exact
max flow. The gate then takes the CANONICAL minimal-source-side min cut
(s-reachability in the residual graph — identical for every max flow),
which is exactly what the Dinic reference computes (attention/mincut.py,
ruvector-attn-mincut/src/mincut.rs:163-221): results are bit-equal masks.

Everything is [S, S] dense VPU work inside lax.while_loop — at gate
scale (S <= a few hundred) each round is microseconds, and the whole
gate vmaps over heads/queries for batched serving.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ruvector_tpu.ops.segment import masked_softmax


def _global_relabel(r: jax.Array, h: jax.Array, s: int, t: int) -> jax.Array:
    """Exact distance labels via dense backward BFS (the global-relabeling
    heuristic — Cherkassky-Goldberg): h[v] = dist(v -> t) over residual
    edges, or n + dist(v -> s) for nodes cut off from t (they can only
    return excess to the source). Exact labels are valid and dominate any
    current valid labeling, so monotonicity is preserved; on dense
    attention graphs the BFS converges in ~graph-diameter (tiny) rounds
    and collapses the round count from O(n^2) to O(n)."""
    n = r.shape[0]
    inf = jnp.int32(4 * n)
    adj = r > 1e-12                                  # residual edge u -> v

    def bfs_to(target):
        d0 = jnp.full((n,), inf, jnp.int32).at[target].set(0)

        def cond(state):
            d, changed = state
            return changed

        def body(state):
            d, _ = state
            via = jnp.min(jnp.where(adj, d[None, :], inf), axis=1)
            new = jnp.minimum(d, 1 + via)
            return new, jnp.any(new < d)

        d, _ = jax.lax.while_loop(cond, body, (d0, jnp.bool_(True)))
        return d

    dist_t = bfs_to(t)
    dist_s = bfs_to(s)
    h_new = jnp.where(dist_t < inf, dist_t,
                      n + jnp.minimum(dist_s, jnp.int32(n)))
    h_new = h_new.at[s].set(n)
    return jnp.maximum(h, h_new)


def _push_relabel_maxflow(cap: jax.Array, s: int, t: int,
                          max_rounds: int,
                          stop_above: jax.Array | None = None,
                          relabel_every: int = 8,
                          ) -> tuple[jax.Array, jax.Array]:
    """Exact max flow on a dense capacity matrix. Returns (residual, flow).

    cap: [n, n] float32, cap[i, j] = capacity of edge i->j (0 = absent).
    stop_above: optional scalar — stop as soon as the arrived flow e[t]
        exceeds it (callers that only compare the flow VALUE against a
        threshold get an exact decision without running to convergence;
        the residual is then NOT a max-flow residual).
    """
    n = cap.shape[0]
    idx = jnp.arange(n)
    not_st = (idx != s) & (idx != t)
    two_n = 2 * n

    # init: saturate source edges
    h = jnp.zeros((n,), jnp.int32).at[s].set(n)
    push0 = cap[s]
    r = cap.at[s, :].set(0.0)
    r = r.at[:, s].add(push0)
    # e[v] = cap[s, v] for v != s; e[t] accumulates arrived flow
    e = push0.at[s].set(0.0)
    h = _global_relabel(r, h, s, t)

    def active(e, h):
        return (e > 1e-12) & not_st & (h < two_n)

    def cond(state):
        r, e, h, i = state
        go = jnp.any(active(e, h)) & (i < max_rounds)
        if stop_above is not None:
            go = go & (e[t] <= stop_above)
        return go

    def body(state):
        r, e, h, i = state
        act = active(e, h)
        # --- push phase (heights frozen) ---
        adm = (r > 1e-12) & (h[:, None] == h[None, :] + 1) & act[:, None]
        ra = jnp.where(adm, r, 0.0)
        cums = jnp.cumsum(ra, axis=1)
        push = jnp.clip(e[:, None] - (cums - ra), 0.0, ra)
        r = r - push + push.T
        e = e - jnp.sum(push, axis=1) + jnp.sum(push, axis=0)
        # --- relabel phase (updated residual) ---
        act = active(e, h)
        has_adm = jnp.any(
            (r > 1e-12) & (h[:, None] == h[None, :] + 1), axis=1)
        nbr_h = jnp.where(r > 1e-12, h[None, :], two_n + 1)
        lift = 1 + jnp.min(nbr_h, axis=1)
        h = jnp.where(act & ~has_adm, jnp.maximum(h, lift), h)
        h = jax.lax.cond(
            (i + 1) % relabel_every == 0,
            lambda: _global_relabel(r, h, s, t),
            lambda: h)
        return r, e, h, i + 1

    r, e, h, _ = jax.lax.while_loop(
        cond, body, (r, e, h, jnp.zeros((), jnp.int32)))
    # capped: the loop stopped with active nodes remaining (max_rounds hit
    # rather than convergence or an exact stop_above early exit) — the
    # residual is then NOT a max-flow residual and callers must not derive
    # a cut from it.
    capped = jnp.any(active(e, h))
    if stop_above is not None:
        capped = capped & (e[t] <= stop_above)
    return r, e[t], capped


def _reachable_from(r: jax.Array, s: int) -> jax.Array:
    """[n] bool — reachability from s over residual edges (r > 0)."""
    n = r.shape[0]
    adj = r > 1e-12
    reach0 = jnp.zeros((n,), jnp.bool_).at[s].set(True)

    def cond(state):
        reach, changed = state
        return changed

    def body(state):
        reach, _ = state
        new = reach | jnp.any(adj & reach[:, None], axis=0)
        return new, jnp.any(new != reach)

    reach, _ = jax.lax.while_loop(cond, body, (reach0, jnp.bool_(True)))
    return reach


@functools.partial(jax.jit, static_argnames=("max_rounds",))
def mincut_gate_device(
    logits: jax.Array,      # [S, S]
    lam: float | jax.Array = 0.5,
    eps: float | jax.Array = 0.01,
    max_rounds: int = 0,
) -> tuple[jax.Array, jax.Array]:
    """Device-side dynamic_min_cut (mincut.rs:163-221 semantics).

    Returns (keep [S, S] bool, cut_cost scalar). Bit-equal to the host
    Dinic gate: edges = clamped positive logits, s=0, t=S-1; the cut is
    applied only when its cost <= lam * mean positive weight.
    """
    sq = logits.shape[0]
    if sq < 2:
        return (jnp.zeros((sq, sq), jnp.bool_), jnp.zeros((), jnp.float32))
    clamped = jnp.where(logits > eps, logits, 0.0)
    pos = clamped > 0
    npos = jnp.sum(pos)
    mean_w = jnp.sum(clamped) / jnp.maximum(npos, 1)
    threshold = lam * mean_w

    rounds = max_rounds or (4 * sq * sq + 8)
    # stop_above=threshold: the moment arrived flow exceeds the gate
    # threshold the cut is provably not applied (max-flow >= e[t]), so
    # the loop exits with an exact decision — the common no-cut case
    # costs only a few rounds instead of full convergence.
    resid, flow, capped = _push_relabel_maxflow(
        clamped, 0, sq - 1, rounds,
        stop_above=jnp.asarray(threshold, jnp.float32))
    reach = _reachable_from(resid, 0)
    crossing = reach[:, None] & ~reach[None, :] & pos
    cut_cost = jnp.sum(jnp.where(crossing, clamped, 0.0))

    # If the round cap was hit before convergence the residual-derived
    # cut is unreliable — fall back to keep=pos (no gating) rather than
    # silently applying a possibly non-minimal cut.
    apply_cut = (flow <= threshold) & (npos > 0) & (sq >= 2) & ~capped
    keep = jnp.where(apply_cut, pos & ~crossing, pos)
    keep = jnp.where(npos > 0, keep, jnp.zeros_like(pos))
    total_cut = jnp.where(apply_cut, cut_cost, 0.0)
    return keep, total_cut


@jax.jit
def attn_mincut_device(q, k, v, lam=0.5, eps=0.01):
    """Min-cut gated attention as ONE device program (gating.rs:70-102):
    SDDMM logits -> push-relabel gate -> masked softmax -> SpMM. No host
    round trip; vmap over leading batch axes for heads/queries."""
    d = q.shape[-1]
    logits = jnp.dot(q, k.T, preferred_element_type=jnp.float32) / (d ** 0.5)
    keep, cut = mincut_gate_device(logits, lam, eps)
    attn = masked_softmax(logits, keep.astype(jnp.float32), axis=-1)
    return jnp.dot(attn, v, preferred_element_type=jnp.float32), keep, cut


attn_mincut_device_batched = jax.jit(
    jax.vmap(attn_mincut_device, in_axes=(0, 0, 0, None, None)),
    static_argnums=(),
)
