"""Two-tier LoRA adapters: MicroLoRA (rank 1-2) and BaseLoRA (rank 4-16).

Reference: sona/src/lora.rs — MicroLoRA (:23-260: deterministic golden-ratio
down init, zero up init, scale 1/sqrt(rank), accumulate-then-apply with
flush threshold) and BaseLoRA per-layer adapters.

TPU: forward is one jitted fused op y = x + scale·(x@down)@up — batched over
any leading dims so the instant path amortizes over concurrent queries.
Accumulation is plain numpy (control plane, O(rank·hidden) per signal).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ruvector_tpu.sona.types import LearningSignal


@partial(jax.jit, static_argnames=())
def _lora_forward(x, down, up, scale):
    return x + scale * jnp.einsum(
        "...d,dr,rh->...h", x, down, up, preferred_element_type=jnp.float32
    )


def _golden_init(hidden_dim: int, rank: int) -> np.ndarray:
    """Deterministic low-discrepancy init (lora.rs:62-68)."""
    i = np.arange(hidden_dim * rank, dtype=np.float32)
    x = (i * 0.618_034) % 1.0
    return ((x - 0.5) * 0.02).reshape(hidden_dim, rank)


class MicroLoRA:
    """Rank-1/2 instant adapter with gradient accumulation."""

    def __init__(self, hidden_dim: int, rank: int = 2):
        if not 1 <= rank <= 2:
            raise ValueError(f"MicroLoRA rank must be 1-2, got {rank}")
        self.hidden_dim = hidden_dim
        self.rank = rank
        self.scale = 1.0 / (rank ** 0.5)
        self.down = _golden_init(hidden_dim, rank)        # [H, r]
        self.up = np.zeros((rank, hidden_dim), np.float32)
        self.grad_up = np.zeros_like(self.up)
        self.update_count = 0

    def forward(self, x) -> jax.Array:
        """y = x + scale·(x@down)@up over any leading batch dims."""
        return _lora_forward(jnp.asarray(x), jnp.asarray(self.down),
                             jnp.asarray(self.up), self.scale)

    def accumulate_gradient(self, signal: LearningSignal):
        """grad_up[r] += gradient_estimate * quality (lora.rs:192-210)."""
        g = np.asarray(signal.gradient_estimate, np.float32)
        if g.shape[0] != self.hidden_dim:
            return
        self.grad_up += g[None, :] * signal.quality_score
        self.update_count += 1

    def apply_accumulated(self, learning_rate: float):
        """up += lr/count · grad_up; reset accumulators (lora.rs:213-230)."""
        if self.update_count == 0:
            return
        self.up += self.grad_up * (learning_rate / self.update_count)
        self.grad_up.fill(0.0)
        self.update_count = 0

    def reset(self):
        self.up.fill(0.0)
        self.grad_up.fill(0.0)
        self.update_count = 0

    @property
    def param_count(self) -> int:
        return self.down.size + self.up.size


class BaseLoRA:
    """Per-layer rank-16 background adapters (lora.rs BaseLoRA)."""

    def __init__(self, hidden_dim: int, num_layers: int, rank: int = 16):
        self.hidden_dim = hidden_dim
        self.rank = rank
        self.num_layers = num_layers
        self.scale = 1.0 / (rank ** 0.5)
        self.down = [
            _golden_init(hidden_dim, rank) for _ in range(num_layers)
        ]
        self.up = [
            np.zeros((rank, hidden_dim), np.float32) for _ in range(num_layers)
        ]

    def forward_layer(self, layer_idx: int, x) -> jax.Array:
        return _lora_forward(
            jnp.asarray(x),
            jnp.asarray(self.down[layer_idx]),
            jnp.asarray(self.up[layer_idx]),
            self.scale,
        )

    def update_from_pattern(self, layer_idx: int, centroid: np.ndarray,
                            quality: float, lr: float):
        """Background consolidation: nudge the layer adapter toward
        reproducing the pattern direction (rank-1 update on `up`)."""
        c = np.asarray(centroid, np.float32)
        if c.shape[0] != self.hidden_dim:
            return
        norm = np.linalg.norm(c)
        if norm < 1e-8:
            return
        d = c / norm
        proj = self.down[layer_idx].T @ d            # [r]
        self.up[layer_idx] += lr * quality * np.outer(proj, d)

    def apply_gradients(self, layer_idx: int, grad_up: np.ndarray, lr: float):
        self.up[layer_idx] += lr * grad_up

    @property
    def param_count(self) -> int:
        return sum(d.size for d in self.down) + sum(u.size for u in self.up)
