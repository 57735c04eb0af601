"""Temporal tiered tensor store — bit-width by access recency/frequency.

Reference: ruvector-temporal-tensor (tier_policy.rs:1-49): hot chunks keep
8-bit, warm decay to 7-5 bit, cold to 3-bit, driven by an access score that
decays over time; targets >100k writes/s, <1ms reads, 4-32x compression
(README.md:1929).

TPU mapping: tiers store int8 / int4 / binary codes (our quantization
primitives — the hardware-relevant bit widths); the access-score policy and
promotion/demotion machinery match the reference's temporal design. Reads
dequantize on device; writes land in the hot tier and demote lazily.
"""

from __future__ import annotations

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from ruvector_tpu.ops.quantization import (
    int4_dequantize,
    int4_quantize,
    scalar_dequantize,
    scalar_quantize,
)


@dataclasses.dataclass(frozen=True)
class TierPolicyConfig:
    """tier_policy.rs thresholds: score = hits * exp(-decay * age)."""

    hot_threshold: float = 0.5     # score above -> 8-bit
    warm_threshold: float = 0.05   # score above -> 4-bit; below -> binary
    decay_per_second: float = 0.1
    demote_interval_s: float = 1.0


class TemporalTensorStore:
    """Chunked tensor store with per-chunk temporal tiering.

    API: write(chunk_id, array) / read(chunk_id) / tick() (demotion sweep).
    """

    def __init__(self, dim: int, policy: TierPolicyConfig = TierPolicyConfig(),
                 clock=time.monotonic):
        self.dim = dim
        self.policy = policy
        self.clock = clock
        self._chunks: dict[int, dict] = {}
        self._last_sweep = clock()

    # -- access scoring ------------------------------------------------------

    def _score(self, meta: dict) -> float:
        age = self.clock() - meta["last_access"]
        return meta["hits"] * np.exp(-self.policy.decay_per_second * age)

    def _touch(self, meta: dict):
        meta["hits"] = meta["hits"] * 0.9 + 1.0
        meta["last_access"] = self.clock()

    # -- API -----------------------------------------------------------------

    def write(self, chunk_id: int, array) -> None:
        x = jnp.asarray(array, jnp.float32)
        assert x.shape[-1] == self.dim
        self._chunks[chunk_id] = {
            "tier": "hot",
            "data": scalar_quantize(x),       # hot = 8-bit
            "shape": x.shape,
            "hits": 1.0,
            "last_access": self.clock(),
        }

    def read(self, chunk_id: int) -> jax.Array:
        meta = self._chunks[chunk_id]
        self._touch(meta)
        if meta["tier"] == "hot":
            return scalar_dequantize(meta["data"])
        if meta["tier"] == "warm":
            return int4_dequantize(meta["data"])
        # cold: 3-bit-equivalent — int4 codes further rounded to 8 levels
        return int4_dequantize(meta["data"])

    def tier_of(self, chunk_id: int) -> str:
        return self._chunks[chunk_id]["tier"]

    def tick(self, force: bool = False):
        """Demotion/promotion sweep (the background tier policy)."""
        now = self.clock()
        if not force and now - self._last_sweep < self.policy.demote_interval_s:
            return
        self._last_sweep = now
        for meta in self._chunks.values():
            score = self._score(meta)
            target = (
                "hot" if score >= self.policy.hot_threshold
                else "warm" if score >= self.policy.warm_threshold
                else "cold"
            )
            if target != meta["tier"]:
                self._retier(meta, target)

    def _retier(self, meta: dict, target: str):
        full = (
            scalar_dequantize(meta["data"]) if meta["tier"] == "hot"
            else int4_dequantize(meta["data"])
        )
        if target == "hot":
            meta["data"] = scalar_quantize(full)
        elif target == "warm":
            meta["data"] = int4_quantize(full)
        else:  # cold: quantize coarsely (3-bit levels inside int4 container)
            q = int4_quantize(full)
            coarse = (q.packed & 0xEE)  # drop the LSB of each nibble
            meta["data"] = dataclasses.replace(q, packed=jnp.asarray(coarse))
        meta["tier"] = target

    def stats(self) -> dict:
        tiers = {"hot": 0, "warm": 0, "cold": 0}
        bytes_used = 0
        bytes_full = 0
        for meta in self._chunks.values():
            tiers[meta["tier"]] += 1
            n = int(np.prod(meta["shape"][:-1]))
            bytes_full += n * self.dim * 4
            if meta["tier"] == "hot":
                bytes_used += n * self.dim
            else:
                bytes_used += n * ((self.dim + 1) // 2)
        return {
            **tiers,
            "compression_ratio": bytes_full / max(bytes_used, 1),
        }
