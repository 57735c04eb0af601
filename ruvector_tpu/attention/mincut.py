"""Min-cut gated attention.

Reference: ruvector-attn-mincut — pipeline (gating.rs:70-102):
  1. logits = Q K^T / sqrt(d)                    (SDDMM, on device)
  2. dynamic min-cut gate over positive logits   (mincut.rs:163-221)
  3. gated entries -> -inf mask                  (on device)
  4. row softmax (fully-gated rows -> 0)         (on device)
  5. weights @ V                                 (SpMM, on device)
plus temporal hysteresis of the gate mask (hysteresis.rs:1-99).

TPU split: steps 1/3/4/5 are one jitted masked attention; step 2 — an exact
s-t max-flow (Dinic) — is inherently sequential pointer-chasing, so it runs
on host over the (tiny, per-query) logit graph, exactly like the reference
runs it on CPU per sequence. The host gate produces a [S, S] mask that feeds
the jitted kernel. Hysteresis is a pure functional state update and works
both on host and under jit.
"""

from __future__ import annotations

import dataclasses
from collections import deque

import jax
import jax.numpy as jnp
import numpy as np

from ruvector_tpu.attention.base import AttentionMechanism, register_attention
from ruvector_tpu.ops.segment import masked_softmax


@dataclasses.dataclass(frozen=True)
class MincutGateConfig:
    lam: float = 0.5        # cut-cost acceptance threshold multiplier (lambda)
    tau: int = 2            # hysteresis persistence steps
    eps: float = 0.01       # logit clamp for graph construction


@dataclasses.dataclass
class GatingResult:
    keep_mask: np.ndarray   # [S*S] bool
    cut_cost: float
    edges_kept: int
    edges_total: int


# ---------------------------------------------------------------------------
# Host-side exact min-cut (Dinic) over the logit graph
# ---------------------------------------------------------------------------

class _Dinic:
    """Dinic max-flow on a small dense-logit graph (mincut.rs:27-160)."""

    def __init__(self, n: int):
        self.n = n
        self.to: list[list[int]] = [[] for _ in range(n)]
        self.cap: list[list[float]] = [[] for _ in range(n)]
        self.rev: list[list[int]] = [[] for _ in range(n)]

    def add_edge(self, u: int, v: int, c: float):
        self.rev[u].append(len(self.to[v]))
        self.rev[v].append(len(self.to[u]))
        self.to[u].append(v)
        self.cap[u].append(c)
        self.to[v].append(u)
        self.cap[v].append(0.0)

    def bfs(self, s: int) -> list[int]:
        level = [-1] * self.n
        level[s] = 0
        q = deque([s])
        while q:
            u = q.popleft()
            for i, v in enumerate(self.to[u]):
                if self.cap[u][i] > 0 and level[v] < 0:
                    level[v] = level[u] + 1
                    q.append(v)
        return level

    def dfs(self, u: int, t: int, f: float, level, it) -> float:
        if u == t:
            return f
        while it[u] < len(self.to[u]):
            i = it[u]
            v = self.to[u][i]
            if self.cap[u][i] > 0 and level[u] < level[v]:
                d = self.dfs(v, t, min(f, self.cap[u][i]), level, it)
                if d > 0:
                    self.cap[u][i] -= d
                    self.cap[v][self.rev[u][i]] += d
                    return d
            it[u] += 1
        return 0.0

    def max_flow(self, s: int, t: int) -> float:
        flow = 0.0
        while True:
            level = self.bfs(s)
            if level[t] < 0:
                return flow
            it = [0] * self.n
            while True:
                f = self.dfs(s, t, float("inf"), level, it)
                if f <= 0:
                    break
                flow += f

    def reachable(self, s: int) -> np.ndarray:
        level = self.bfs(s)
        return np.asarray([l >= 0 for l in level])


def dynamic_min_cut(
    logits: np.ndarray, seq_len: int, lam: float, tau: int, eps: float
) -> GatingResult:
    """Gate edges of the logit graph via s-t min-cut (mincut.rs:163-221).

    Edges = positive clamped logits; s=0, t=seq_len-1. The cut is applied
    only when its cost <= lam * mean positive weight; non-positive logits
    are always gated off. Uses the native C++ Dinic when available.
    """
    logits = np.asarray(logits, dtype=np.float32).reshape(seq_len, seq_len)

    from ruvector_tpu import native

    if native.available:
        keep, cost = native.dinic_mincut_gate(logits, lam, eps)
        n = seq_len * seq_len
        return GatingResult(keep.reshape(-1), cost, int(keep.sum()), n)
    clamped = np.where(logits > eps, logits, 0.0)
    n = seq_len * seq_len
    pos = clamped > 0
    if pos.sum() == 0 or seq_len < 2:
        return GatingResult(np.zeros(n, bool), 0.0, 0, n)

    mean_w = float(clamped[pos].mean())
    threshold = lam * mean_w

    dinic = _Dinic(seq_len)
    edge_list = []
    for i in range(seq_len):
        for j in range(seq_len):
            if clamped[i, j] > 0:
                edge_list.append((i, j))
                dinic.add_edge(i, j, float(clamped[i, j]))

    cut_cost = dinic.max_flow(0, seq_len - 1)
    keep = pos.copy()
    total_cut = 0.0
    if cut_cost <= threshold:
        reach = dinic.reachable(0)
        for (i, j) in edge_list:
            if reach[i] and not reach[j]:
                keep[i, j] = False
                total_cut += float(clamped[i, j])

    kept = int(keep.sum())
    return GatingResult(keep.reshape(-1), total_cut, kept, n)


# ---------------------------------------------------------------------------
# Hysteresis (functional port of hysteresis.rs)
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HysteresisState:
    mask: jax.Array     # stabilized bool mask (as int8/bool array)
    counts: jax.Array   # consecutive-disagreement counters
    step: jax.Array     # scalar int32


def hysteresis_init(shape) -> HysteresisState:
    return HysteresisState(
        mask=jnp.zeros(shape, dtype=jnp.bool_),
        counts=jnp.zeros(shape, dtype=jnp.int32),
        step=jnp.zeros((), dtype=jnp.int32),
    )


def hysteresis_apply(
    state: HysteresisState, raw: jax.Array, tau: int
) -> tuple[HysteresisState, jax.Array]:
    """An edge flips only after `tau` consecutive disagreeing steps
    (hysteresis.rs:22-56). First call passes `raw` through unchanged."""
    first = state.step == 0
    disagree = raw != state.mask
    counts = jnp.where(disagree, state.counts + 1, 0)
    flip = counts >= tau
    result = jnp.where(flip, raw, state.mask)
    counts = jnp.where(flip, 0, counts)
    result = jnp.where(first, raw, result)
    counts = jnp.where(first, jnp.zeros_like(counts), counts)
    new_state = HysteresisState(mask=result, counts=counts, step=state.step + 1)
    return new_state, result


# ---------------------------------------------------------------------------
# Full gated attention
# ---------------------------------------------------------------------------

@jax.jit
def _masked_self_attention(q, k, v, keep_mask):
    """Steps 1,3,4,5 on device: [S,D]x[S,D]x[S,Dv], keep_mask [S,S]."""
    d = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, jnp.float32))
    logits = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
    attn = masked_softmax(logits, keep_mask.astype(jnp.float32), axis=-1)
    return jnp.dot(attn, v, preferred_element_type=jnp.float32)


def compute_logits(q, k) -> jax.Array:
    """Raw scaled logits Q K^T / sqrt(d) (gating.rs:11-23)."""
    d = q.shape[-1]
    return jnp.dot(q, k.T, preferred_element_type=jnp.float32) / (d ** 0.5)


def attn_mincut(
    q: jax.Array,          # [S, D]
    k: jax.Array,          # [S, D]
    v: jax.Array,          # [S, Dv]
    cfg: MincutGateConfig = MincutGateConfig(),
    witness_log=None,      # optional utils.witness.WitnessLog
) -> tuple[jax.Array, GatingResult]:
    """Min-cut gated attention (gating.rs:70-102). Returns (output, gating).

    When a witness log is provided, every gate decision is recorded as a
    SHA-256 tensor witness (the reference's audit log, witness.rs).
    """
    s = q.shape[0]
    logits = np.asarray(compute_logits(q, k))
    gating = dynamic_min_cut(logits, s, cfg.lam, cfg.tau, cfg.eps)
    keep = jnp.asarray(gating.keep_mask.reshape(s, s))
    out = _masked_self_attention(q, k, v, keep)
    if witness_log is not None:
        witness_log.record(
            "attn_mincut", np.asarray(out), gating.keep_mask,
            cut_cost=gating.cut_cost, edges_kept=gating.edges_kept,
            edges_total=gating.edges_total, lam=cfg.lam,
        )
    return out, gating


def attn_softmax(q, k, v) -> jax.Array:
    """Ungated baseline (gating.rs:59-66)."""
    s = q.shape[0]
    return _masked_self_attention(q, k, v, jnp.ones((s, s), jnp.bool_))


def _apply_device(params, cfg, q, k, v, mask=None, **kw):
    # production path: device-resident push-relabel gate — one jitted
    # program, no host round trip (mincut_device.py); bit-equal to the
    # host Dinic path (attn_mincut), which remains the oracle.
    from ruvector_tpu.attention.mincut_device import attn_mincut_device

    c = cfg or MincutGateConfig()
    return attn_mincut_device(q, k, v, c.lam, c.eps)[0]


register_attention(
    AttentionMechanism(name="mincut", init=None,
                       apply=_apply_device,
                       default_config=MincutGateConfig())
)
