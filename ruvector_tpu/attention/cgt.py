"""Coherence-Gated Transformer (CGT) — the full sheaf-attention stack.

Reference: ruvector-attention/src/sheaf/ (ADR-015, ~3.3k LoC):
- router.rs:25-80       ComputeLane (Reflex/Standard/Deep/Escalate)
- router.rs:87-433      TokenRouter: threshold routing, lane statistics,
                        latency estimate, feedback threshold tuning
- sparse.rs:25-545      SparseResidualAttention: residual-threshold masks
                        with min-connections / local-window / self keep,
                        CSR export, sparsity statistics
- early_exit.rs:26-376  energy-based early exit: EMA smoothing, patience,
                        min/max layers, ExitReason, statistics
- attention.rs          the sheaf attention core (attention/sheaf.py here)

TPU form: routing is a device-side int lane per token; lane dispatch is
mask modulation of ONE dense [S, S] attention pass (each row's pair mask
is selected by its lane), not ragged per-token branches — the MXU cost of
the masked-out entries is cheaper than any gather/scatter regrouping at
gate scale. Early exit runs inside jax.lax.while_loop with EMA + patience
carried as scalars.
"""

from __future__ import annotations

import dataclasses
import enum

import jax
import jax.numpy as jnp
import numpy as np

from ruvector_tpu.attention.sheaf import (
    SheafAttentionConfig,
    edge_energies,
    sheaf_init,
)
from ruvector_tpu.nn.core import linear_apply, linear_init
from ruvector_tpu.ops.segment import masked_softmax


# --------------------------------------------------------------------------
# Compute lanes + token router (router.rs)
# --------------------------------------------------------------------------

class ComputeLane(enum.IntEnum):
    REFLEX = 0      # minimal compute: local attention, no FFN
    STANDARD = 1    # sparse sheaf attention
    DEEP = 2        # full sheaf + FFN
    ESCALATE = 3    # irreconcilable incoherence: passthrough + flag

    @property
    def description(self) -> str:
        return {
            ComputeLane.REFLEX: "minimal compute: local attention",
            ComputeLane.STANDARD: "standard: sparse sheaf attention",
            ComputeLane.DEEP: "deep: full sheaf + FFN",
            ComputeLane.ESCALATE: "escalate: return uncertainty",
        }[self]

    @property
    def typical_latency_ms(self) -> float:
        # router.rs:55-63 nominal lane costs
        return {0: 0.1, 1: 1.0, 2: 5.0, 3: 0.05}[int(self)]


@dataclasses.dataclass(frozen=True)
class TokenRouterConfig:
    """Energy thresholds (router.rs:87-188): lane boundaries must be
    strictly increasing."""

    theta_reflex: float = 0.1
    theta_standard: float = 1.0
    theta_deep: float = 10.0
    use_average_energy: bool = True   # normalize by context size
    min_context_size: int = 1

    def validate(self) -> None:
        if not (0 < self.theta_reflex < self.theta_standard
                < self.theta_deep):
            raise ValueError(
                "thresholds must satisfy 0 < reflex < standard < deep")


def route_by_energy(token_energy: jax.Array, cfg: TokenRouterConfig,
                    context_size: int | None = None) -> jax.Array:
    """[S] energies -> [S] int32 lanes, on device (router.rs:266-338)."""
    e = token_energy
    if cfg.use_average_energy:
        denom = max(context_size or e.shape[0], cfg.min_context_size)
        e = e / denom
    return (
        (e > cfg.theta_reflex).astype(jnp.int32)
        + (e > cfg.theta_standard).astype(jnp.int32)
        + (e > cfg.theta_deep).astype(jnp.int32)
    )


@dataclasses.dataclass
class LaneStatistics:
    reflex_count: int = 0
    standard_count: int = 0
    deep_count: int = 0
    escalate_count: int = 0

    @property
    def total_tokens(self) -> int:
        return (self.reflex_count + self.standard_count + self.deep_count
                + self.escalate_count)

    def ratio(self, lane: ComputeLane) -> float:
        t = self.total_tokens
        c = [self.reflex_count, self.standard_count, self.deep_count,
             self.escalate_count][int(lane)]
        return c / t if t else 0.0

    @property
    def reflex_ratio(self) -> float:
        return self.ratio(ComputeLane.REFLEX)

    @property
    def standard_ratio(self) -> float:
        return self.ratio(ComputeLane.STANDARD)

    @property
    def deep_ratio(self) -> float:
        return self.ratio(ComputeLane.DEEP)

    def estimate_latency_ms(self) -> float:
        """router.rs:395-400 — sum of nominal lane costs."""
        return (self.reflex_count * 0.1 + self.standard_count * 1.0
                + self.deep_count * 5.0 + self.escalate_count * 0.05)


def lane_statistics(lanes) -> LaneStatistics:
    l = np.asarray(lanes)
    return LaneStatistics(
        reflex_count=int((l == 0).sum()),
        standard_count=int((l == 1).sum()),
        deep_count=int((l == 2).sum()),
        escalate_count=int((l == 3).sum()),
    )


def tune_thresholds(cfg: TokenRouterConfig, stats: LaneStatistics,
                    target_reflex_ratio: float,
                    target_standard_ratio: float) -> TokenRouterConfig:
    """Feedback controller (router.rs:402-433): nudge thresholds 10% of
    the ratio error per call, clamped to preserve ordering."""
    total = stats.total_tokens
    if total == 0:
        return cfg
    reflex_adj = (target_reflex_ratio - stats.reflex_ratio) * 0.1
    std_adj = (target_standard_ratio - stats.standard_ratio) * 0.1
    theta_reflex = min(max(cfg.theta_reflex * (1.0 + reflex_adj), 1e-3),
                       cfg.theta_standard * 0.9)
    theta_standard = min(max(cfg.theta_standard * (1.0 + std_adj),
                             theta_reflex * 1.1),
                         cfg.theta_deep * 0.9)
    return dataclasses.replace(cfg, theta_reflex=theta_reflex,
                               theta_standard=theta_standard)


# --------------------------------------------------------------------------
# Residual-sparse attention masks (sparse.rs)
# --------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class SparseResidualConfig:
    residual_threshold: float = 1.0   # keep pairs with energy ABOVE this
    max_sparsity: float = 0.99        # never drop below (1-max)·S per row
    min_connections: int = 2          # top-k energy fallback per query
    include_self: bool = True
    local_window: int | None = None

    def validate(self) -> None:
        if not 0.0 <= self.max_sparsity <= 1.0:
            raise ValueError("max_sparsity in [0, 1]")
        if self.residual_threshold < 0:
            raise ValueError("residual_threshold >= 0")


def residual_sparse_mask(energies: jax.Array,
                         cfg: SparseResidualConfig) -> jax.Array:
    """[S, S] energies -> [S, S] bool keep-mask (sparse.rs:298-386).

    Keeps high-residual (incoherent) pairs — coherent pairs carry no new
    information. Guarantees min_connections per query via per-row top-k
    and caps sparsity at max_sparsity; optional local window and self
    connections are always kept.
    """
    s = energies.shape[0]
    e = jnp.where(jnp.isfinite(energies), energies, -jnp.inf)
    keep = e >= cfg.residual_threshold

    # per-row floor: max(min_connections, (1-max_sparsity)·S) top-energy
    k_floor = max(int(cfg.min_connections),
                  int(np.ceil((1.0 - cfg.max_sparsity) * s)))
    k_floor = min(max(k_floor, 1), s)
    kth = jnp.sort(e, axis=-1)[:, s - k_floor][:, None]   # k-th largest
    keep = keep | (e >= kth)

    if cfg.local_window is not None:
        idx = jnp.arange(s)
        band = jnp.abs(idx[:, None] - idx[None, :]) <= cfg.local_window
        keep = keep | band
    if cfg.include_self:
        keep = keep | jnp.eye(s, dtype=bool)
    return keep


@dataclasses.dataclass
class SparsityStatistics:
    n_queries: int
    n_keys: int
    nnz: int

    @property
    def total_pairs(self) -> int:
        return self.n_queries * self.n_keys

    @property
    def sparsity(self) -> float:
        return 1.0 - self.nnz / self.total_pairs if self.total_pairs else 0.0

    @property
    def estimated_speedup(self) -> float:
        """sparse.rs:538-544 — dense/sparse work ratio."""
        return self.total_pairs / max(self.nnz, 1)


def sparsity_statistics(mask) -> SparsityStatistics:
    m = np.asarray(mask)
    return SparsityStatistics(n_queries=m.shape[0], n_keys=m.shape[1],
                              nnz=int(m.sum()))


def mask_to_csr(mask) -> tuple[np.ndarray, np.ndarray]:
    """sparse.rs:197-222: (row_ptr [S+1], col_idx [nnz])."""
    m = np.asarray(mask)
    rows, cols = np.nonzero(m)
    row_ptr = np.zeros(m.shape[0] + 1, np.int64)
    np.add.at(row_ptr, rows + 1, 1)
    return np.cumsum(row_ptr), cols.astype(np.int64)


# --------------------------------------------------------------------------
# Energy-based early exit (early_exit.rs)
# --------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class EarlyExitConfig:
    epsilon: float = 1e-3       # relative energy-delta threshold
    min_layers: int = 1
    max_layers: int = 12
    patience: int = 2           # consecutive converged steps required
    ema_alpha: float = 0.3      # energy smoothing (1.0 = no smoothing)

    def validate(self) -> None:
        if self.epsilon <= 0:
            raise ValueError("epsilon > 0")
        if not 0 < self.min_layers <= self.max_layers:
            raise ValueError("0 < min_layers <= max_layers")
        if not 0.0 < self.ema_alpha <= 1.0:
            raise ValueError("ema_alpha in (0, 1]")


class ExitReason(enum.Enum):
    ENERGY_CONVERGED = "Energy converged below threshold"
    MAX_LAYERS_REACHED = "Reached maximum layer count"
    PERFECT_COHERENCE = "Achieved perfect coherence (zero energy)"


@dataclasses.dataclass
class EarlyExitResult:
    layers_used: int
    final_energy: float
    energy_delta: float
    converged_steps: int
    exit_reason: ExitReason

    @property
    def layers_saved(self) -> int:
        return 0  # filled by statistics()


@dataclasses.dataclass
class EarlyExitStatistics:
    layers_used: int
    max_layers: int
    energy_reduction: float
    final_energy: float

    @property
    def layers_saved(self) -> int:
        return self.max_layers - self.layers_used

    @property
    def speedup_ratio(self) -> float:
        return self.max_layers / max(self.layers_used, 1)


def run_with_early_exit(layer_fn, x: jax.Array, energy_fn,
                        cfg: EarlyExitConfig):
    """Iterate x -> layer_fn(x) until the EMA-smoothed total energy
    converges (early_exit.rs:378-470), entirely on device.

    layer_fn: x -> x_next; energy_fn: x -> scalar energy.
    Returns (x_final, layers_used i32, final_energy, delta, converged,
    first_energy) as device scalars — wrap with early_exit_result() on
    host for the ExitReason view.
    """
    cfg.validate()
    e0 = energy_fn(x)

    def cond(state):
        i, x, ema, conv, done = state
        return (i < cfg.max_layers) & ~done

    def body(state):
        i, x, ema, conv, done = state
        x2 = layer_fn(x)
        e = energy_fn(x2)
        ema2 = cfg.ema_alpha * e + (1.0 - cfg.ema_alpha) * ema
        delta = jnp.abs(ema - ema2) / jnp.maximum(jnp.abs(ema), 1e-8)
        conv2 = jnp.where(delta < cfg.epsilon, conv + 1, 0)
        done2 = ((i + 1 >= cfg.min_layers)
                 & ((conv2 >= cfg.patience) | (e <= 0.0)))
        return i + 1, x2, ema2, conv2, done2

    i, xf, ema, conv, done = jax.lax.while_loop(
        cond, body, (jnp.int32(0), x, e0, jnp.int32(0), jnp.bool_(False)))
    return xf, i, ema, conv, e0


def early_exit_result(layers_used, final_energy, converged_steps,
                      cfg: EarlyExitConfig,
                      first_energy=None) -> tuple[EarlyExitResult,
                                                  EarlyExitStatistics]:
    n = int(layers_used)
    e = float(final_energy)
    conv = int(converged_steps)
    if e <= 0:
        reason = ExitReason.PERFECT_COHERENCE
    elif n >= cfg.max_layers and conv < cfg.patience:
        reason = ExitReason.MAX_LAYERS_REACHED
    else:
        reason = ExitReason.ENERGY_CONVERGED
    e0 = float(first_energy) if first_energy is not None else e
    red = (e0 - e) / max(abs(e0), 1e-8)
    return (
        EarlyExitResult(layers_used=n, final_energy=e, energy_delta=0.0,
                        converged_steps=conv, exit_reason=reason),
        EarlyExitStatistics(layers_used=n, max_layers=cfg.max_layers,
                            energy_reduction=red, final_energy=e),
    )


# --------------------------------------------------------------------------
# The CGT block: lane-modulated sheaf attention (attention.rs + router.rs)
# --------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class CgtConfig:
    dim: int = 64
    sheaf: SheafAttentionConfig = dataclasses.field(
        default_factory=SheafAttentionConfig)
    router: TokenRouterConfig = dataclasses.field(
        default_factory=TokenRouterConfig)
    sparse: SparseResidualConfig = dataclasses.field(
        default_factory=SparseResidualConfig)
    reflex_window: int = 4      # local-attention half-width for lane 0
    ffn_mult: int = 4


def cgt_init(key, cfg: CgtConfig) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "sheaf": sheaf_init(k1, dataclasses.replace(
            cfg.sheaf, dim=cfg.dim, restriction_dim=cfg.dim)),
        "ffn_in": linear_init(k2, cfg.dim, cfg.dim * cfg.ffn_mult),
        "ffn_out": linear_init(k3, cfg.dim * cfg.ffn_mult, cfg.dim),
    }


def cgt_block_apply(params: dict, cfg: CgtConfig, x: jax.Array):
    """One lane-modulated CGT layer over [S, D] token states.

    Per-row pair mask by lane: reflex rows see a local band, standard
    rows the residual-sparse pairs, deep rows everything; escalate rows
    attend nothing (passthrough). The FFN applies to deep rows only.
    Returns (x_out, lanes [S] i32, token_energy [S]).
    """
    s = x.shape[0]
    e = edge_energies(params["sheaf"], x)                    # [S, S]
    token_energy = jnp.sum(jnp.where(jnp.isfinite(e), e, 0.0), axis=-1)
    lanes = route_by_energy(token_energy, cfg.router, context_size=s)

    idx = jnp.arange(s)
    band = (jnp.abs(idx[:, None] - idx[None, :])
            <= cfg.reflex_window)                            # [S, S]
    sparse = residual_sparse_mask(e, cfg.sparse)
    full = jnp.ones((s, s), bool)
    none = jnp.eye(s, dtype=bool)                            # self only
    lane_masks = jnp.stack([band, sparse, full, none])       # [4, S, S]
    pair_mask = jnp.take_along_axis(
        lane_masks, lanes[None, :, None], axis=0)[0]         # [S, S]

    scores = -cfg.sheaf.beta * jnp.where(jnp.isfinite(e), e, 1e30)
    attn = masked_softmax(scores, pair_mask.astype(x.dtype), axis=-1)
    v = x @ params["sheaf"]["rho_v"]
    out = jnp.dot(attn, v, preferred_element_type=jnp.float32)
    # escalate rows: passthrough (uncertainty flagged via the lane output)
    out = jnp.where((lanes == 3)[:, None], 0.0, out)
    x = x + out

    ffn = linear_apply(params["ffn_out"],
                       jax.nn.gelu(linear_apply(params["ffn_in"], x)))
    x = x + jnp.where((lanes == 2)[:, None], ffn, 0.0)
    return x, lanes, token_energy


def cgt_forward(params: dict, cfg: CgtConfig, x: jax.Array,
                exit_cfg: EarlyExitConfig | None = None):
    """Full CGT: lane-modulated layers under energy early exit.

    Returns (x_final, layers_used, final_energy, first_energy, lanes) —
    all device values; feed the scalars to early_exit_result().
    """
    exit_cfg = exit_cfg or EarlyExitConfig()

    def layer(xx):
        return cgt_block_apply(params, cfg, xx)[0]

    def energy(xx):
        e = edge_energies(params["sheaf"], xx)
        return jnp.sum(jnp.where(jnp.isfinite(e), e, 0.0))

    xf, layers_used, ema, conv, e0 = run_with_early_exit(
        layer, x, energy, exit_cfg)
    _, lanes, _ = cgt_block_apply(params, cfg, xf)
    return xf, layers_used, ema, conv, e0, lanes
