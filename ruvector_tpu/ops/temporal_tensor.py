"""Temporal tensor store: access-pattern-driven tiered bit-width storage.

Reference: ruvector-temporal-tensor — TierPolicy (tier_policy.rs:1-49):
score = access_count * 1024 / (now - last_access + 1); hot (>=512) keeps
8 bits, warm (>=64) 7 or 5 bits, cold 3 bits; group-wise quantization
(group_len 64) with drift-tolerance re-quantization (store.rs/tiering.rs).

TPU mapping: arbitrary-bit quantize/dequantize is vectorized device math
(scale per group of 64, uint32 word packing); the policy and migration
bookkeeping are host-side. Dequantized reads come back as ready-to-use
device arrays, so the store plugs directly into the feature path.
"""

from __future__ import annotations

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class TierPolicy:
    """Defaults per tier_policy.rs:22-30."""

    hot_min_score: int = 512
    warm_min_score: int = 64
    warm_bits: int = 7
    drift_pct_q8: int = 26
    group_len: int = 64

    def select_bits(self, access_count: int, last_access_ts: int,
                    now_ts: int) -> int:
        age = max(now_ts - last_access_ts, 0) + 1
        score = access_count * 1024 // age
        if score >= self.hot_min_score:
            return 8
        if score >= self.warm_min_score:
            return self.warm_bits
        return 3

    def drift_factor(self) -> float:
        return 1.0 + self.drift_pct_q8 / 256.0


def quantize_bits(x: np.ndarray, bits: int, group_len: int = 64):
    """Group-wise symmetric quantization to `bits` bits, packed into
    uint32 words. Returns (packed [G, W], scales [G], orig_len)."""
    x = np.asarray(x, np.float32).ravel()
    n = len(x)
    pad = (-n) % group_len
    xp = np.pad(x, (0, pad)).reshape(-1, group_len)
    qmax = (1 << (bits - 1)) - 1
    scales = np.maximum(np.abs(xp).max(axis=1), 1e-12) / qmax
    q = np.clip(np.round(xp / scales[:, None]), -qmax - 1, qmax)
    u = (q + (1 << (bits - 1))).astype(np.uint64)     # offset-binary
    # pack group_len values of `bits` bits into uint32 words
    vals_per_word = 32 // bits if 32 % bits == 0 else 0
    if vals_per_word:
        pad_vals = (-group_len) % vals_per_word
        u2 = np.pad(u, ((0, 0), (0, pad_vals))).reshape(
            u.shape[0], -1, vals_per_word)
        shifts = (np.arange(vals_per_word) * bits).astype(np.uint64)
        packed = (u2 << shifts[None, None, :]).sum(axis=2).astype(np.uint32)
    else:
        # bit widths not dividing 32 (3,5,7): pack via a big bit buffer
        packed = []
        for row in u:
            buf, nbits, words = 0, 0, []
            for v in row:
                buf |= int(v) << nbits
                nbits += bits
                while nbits >= 32:
                    words.append(buf & 0xFFFFFFFF)
                    buf >>= 32
                    nbits -= 32
            if nbits:
                words.append(buf & 0xFFFFFFFF)
            packed.append(words)
        packed = np.asarray(packed, np.uint32)
    return packed, scales.astype(np.float32), n


def dequantize_bits(packed: np.ndarray, scales: np.ndarray, bits: int,
                    orig_len: int, group_len: int = 64) -> np.ndarray:
    g = packed.shape[0]
    vals_per_word = 32 // bits if 32 % bits == 0 else 0
    if vals_per_word:
        shifts = (np.arange(vals_per_word) * bits).astype(np.uint64)
        u = ((packed[..., None].astype(np.uint64) >> shifts)
             & ((1 << bits) - 1)).reshape(g, -1)[:, :group_len]
    else:
        u = np.zeros((g, group_len), np.uint64)
        for gi, row in enumerate(packed):
            buf, nbits, out_i = 0, 0, 0
            for w in row:
                buf |= int(w) << nbits
                nbits += 32
                while nbits >= bits and out_i < group_len:
                    u[gi, out_i] = buf & ((1 << bits) - 1)
                    buf >>= bits
                    nbits -= bits
                    out_i += 1
    q = u.astype(np.float32) - (1 << (bits - 1))
    return (q * scales[:, None]).ravel()[:orig_len]


@dataclasses.dataclass
class _Slot:
    packed: np.ndarray
    scales: np.ndarray
    bits: int
    n: int
    shape: tuple
    access_count: int = 0
    last_access_ts: int = 0
    max_abs: float = 0.0


class TemporalTensorStore:
    """Tiered store: writes land at 8 bits; a migration sweep re-packs each
    tensor at the tier its access score earns (tiering.rs semantics).
    Re-quantization is skipped when the value range drifted less than the
    policy's drift factor (store.rs drift check)."""

    def __init__(self, policy: TierPolicy = TierPolicy()):
        self.policy = policy
        self._slots: dict = {}
        self._clock = 0

    def _now(self) -> int:
        self._clock += 1
        return self._clock

    def write(self, key, value: np.ndarray):
        v = np.asarray(value, np.float32)
        packed, scales, n = quantize_bits(v, 8, self.policy.group_len)
        now = self._now()
        prev = self._slots.get(key)
        self._slots[key] = _Slot(
            packed=packed, scales=scales, bits=8, n=n, shape=v.shape,
            access_count=(prev.access_count + 1) if prev else 1,
            last_access_ts=now, max_abs=float(np.abs(v).max(initial=0.0)))

    def read(self, key) -> jnp.ndarray:
        s = self._slots[key]
        s.access_count += 1
        s.last_access_ts = self._now()
        flat = dequantize_bits(s.packed, s.scales, s.bits, s.n,
                               self.policy.group_len)
        return jnp.asarray(flat.reshape(s.shape))

    def migrate(self) -> dict:
        """Re-tier every tensor by its current access score; returns
        {key: bits} for tensors that moved."""
        now = self._clock
        moved = {}
        for key, s in self._slots.items():
            bits = self.policy.select_bits(s.access_count,
                                           s.last_access_ts, now)
            if bits != s.bits:
                flat = dequantize_bits(s.packed, s.scales, s.bits, s.n,
                                       self.policy.group_len)
                s.packed, s.scales, _ = quantize_bits(
                    flat, bits, self.policy.group_len)
                s.bits = bits
                moved[key] = bits
        return moved

    def tier_of(self, key) -> int:
        return self._slots[key].bits

    def compression_ratio(self, key) -> float:
        s = self._slots[key]
        return (s.n * 4) / (s.packed.nbytes + s.scales.nbytes)
